package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    Tables.ensureSessionConfs(spark) // entry receives the caller's session
    QueriesRelational.flagship(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] =
    Queries.oracles
}
