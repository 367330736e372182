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

  /** events with `ts` normalized to `ts_ms` epoch millis and `ts_t`
    * microsecond TimestampType, schema-adaptively: the driver has
    * shipped the column both as parquet INT64 TIMESTAMP(NANOS) (read
    * as LongType under `nanosAsLong`) and as plain TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ under Spark 4's NTZ inference). Both
    * normalize to the same UTC instant the DuckDB oracle sees
    * (`epoch_ms(ts)` on a naive timestamp; session TZ pinned UTC).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: epoch-nanos exceed double's exact range
        raw.withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // NTZ wall clock == UTC instant here: session TZ is UTC, and
        // the oracle's epoch_ms() makes the identical naive-as-UTC read
        val t = col("ts").cast("timestamp")
        raw.withColumn("ts_ms", unix_millis(t))
          .withColumn("ts_t", t)
    }
  }
}
