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
}
