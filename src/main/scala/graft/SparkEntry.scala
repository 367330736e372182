package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a Spark-first implementation of one
  * operator from SURVEY.md §2 (or a north-star training-data op); the
  * matching [[oracleSql]] entry is the same computation in ANSI SQL for
  * the driver's DuckDB compare. Column names and row order are aligned
  * on both sides (the driver sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship: the reference's full pipeline — protobuf-decode → type
    * filter → route → grok → enrichment broadcast-join → computed
    * columns → date-partitioned documents — over envelope records
    * synthesized from the sf0.001 events table, with the customer→
    * nation→region chain standing in for the app→space→org dimension.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"

    // codegen'd twin of SyntheticSource.guid — no UDF
    def guid(c: org.apache.spark.sql.Column) =
      format_string("%08d-0000-4000-8000-%012d", c, c)
    val records = SyntheticSource.records(spark, dir)

    val apps = Tables(spark, dir, "customer").select(
      guid(col("c_custkey")).as("app_guid"),
      col("c_name").as("name"),
      guid(col("c_nationkey").cast("long")).as("space_guid"))
    val spaces = Tables(spark, dir, "nation").select(
      guid(col("n_nationkey").cast("long")).as("space_guid"),
      col("n_name").as("name"),
      guid(col("n_regionkey").cast("long")).as("org_guid"))
    val orgs = Tables(spark, dir, "region").select(
      guid(col("r_regionkey").cast("long")).as("org_guid"),
      col("r_name").as("name"))
    val dims = Enrich.resolveDims(apps, spaces, orgs)

    Pipeline.assemble(records, dims)
      .select(col("es_index"), col("timestamp"), col("file_path"),
        col("`@cf.env`"), col("`@cf.app`"), col("`@cf.space`"), col("`@cf.org`"),
        col("captures").getItem("log_event").as("log_event"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] =
    Queries.oracles
}
