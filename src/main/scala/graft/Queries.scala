package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query battery: one entry per implemented operator from
  * SURVEY.md §2 plus the training-data ops (dedup / similarity / text /
  * multimodal). Each query has a DuckDB-oracle SQL twin in [[oracles]].
  *
  * Determinism rules (driver hashes values after sorting columns by
  * name): every query ends in an explicit ORDER BY on its full key, and
  * every computed column is aliased identically on both sides.
  */
object Queries {

  private type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped aggregation (pricing summary) over lineitem.
    * Scale notes: single shuffle on the 2 low-cardinality grouping keys
    * with map-side partial aggregation; scan reads only the 7 needed
    * columns (verified via explain ReadSchema).
    */
  private val q1Agg: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Grok extraction (SURVEY §2 row 5) over the events stream table:
    * typed capture (`:int`) from the raw payload via the native
    * GrokExtract expression — stays inside WholeStageCodegen.
    */
  private val qGrok: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.select(col("event_id"),
        graft.functions.grok_extract(col("props"), """\{"k": %{INT:k_val:int}\}""").as("g"))
      .select(col("event_id"), col("g.k_val").as("k_val"))
      .orderBy("event_id")
  }

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q12_grok" -> qGrok
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q12_grok" ->
      """SELECT event_id,
        |  coalesce(try_cast(regexp_extract(props, '\{"k": ([+-]?(?:[0-9]+))\}', 1) AS BIGINT), 0) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin
  )
}
