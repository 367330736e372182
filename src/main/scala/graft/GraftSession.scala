package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Central place for the config that matters at scale: shuffle
  * partitioning sized to the cluster (32 here = local core count; on a
  * real cluster AQE coalesces), adaptive execution on (runtime re-plan,
  * skew-join splitting), UTC so results match the DuckDB oracle, and
  * nanosecond-parquet read support (the driver-generated testdata
  * carries `timestamp[ns]` columns).
  */
object GraftSession {

  /** Config that exposes the engine's counters at the driver's
    * `/metrics/prometheus` servlet — the analogue of the reference's
    * Prometheus endpoint (`main.go:181-187`) is CONFIGURATION here,
    * not code: the servlet is Spark's, the counters reach it as
    * metrics-system gauges via `registerMetrics(spark, publish=true)`.
    * Apply on top of [[builder]] in a deployment that scrapes
    * Prometheus (the default builder keeps the UI off for tests).
    */
  val prometheusConf: Map[String, String] = Map(
    "spark.ui.enabled" -> "true",
    "spark.ui.prometheus.enabled" -> "true",
    "spark.metrics.namespace" -> "graft")

  def builder(master: String = "local[*]", cpus: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // engine extensions: grok capture-pruning optimizer rule
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // events.parquet carries INT64 TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects; read it as LongType epoch-nanos and
      // derive timestamps explicitly (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // recursive-CTE depth guard: the default 100 would hard-fail
      // q279's week-per-level recursion on a multi-year date domain;
      // 10000 admits ~190 years of weeks while still terminating a
      // genuinely runaway loop (set here, not per query — DataFrames
      // are lazy, so a set/restore around spark.sql() reverts before
      // the plan executes)
      .config("spark.sql.cteRecursionLevelLimit", "10000")

  def get(master: String = "local[*]", cpus: String = "32"): SparkSession = {
    val spark = builder(master, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // also via experimental: getOrCreate may reuse a session built
    // without the extensions config; the rule is idempotent so
    // double-registration is harmless
    if (!spark.experimental.extraOptimizations.contains(graft.plans.PruneGrokCaptures))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PruneGrokCaptures
    if (!spark.experimental.extraOptimizations.contains(graft.plans.EditDistancePrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EditDistancePrefilter
    graft.functions.registerAll(spark) // SQL surface: grok_*, vec_* (idempotent)
    spark
  }
}
