package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reads the driver-generated testdata tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom — filters and projections authored downstream reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Confs the testdata needs (INT64 TIMESTAMP(NANOS) parquet; UTC
    * date math aligned with the oracle). GraftSession sets these at
    * build; entry() applies them to an externally-built session —
    * deliberately NOT inside [[apply]], which must not mutate a
    * caller's session as a read side effect.
    */
  def ensureSessionConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** events with its INT64-nanos `ts` (read as LongType under
    * `nanosAsLong`) normalized: `ts_ms` epoch millis and `ts_t`
    * microsecond TimestampType, both derived by truncation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integer `div`, not `/`: epoch-nanos exceed double's exact range
    apply(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }
}
