package graft

/** Headline benchmark: times each battery query at SPARK_GRAFT_SF_DIR
  * and prints ONE machine-parsable JSON line.
  *
  * Trustworthiness (judge round-2 finding: best-of-2 can't tell a real
  * 1.5× regression from machine noise):
  *  - median-of-3 per query — the middle run is robust to a single
  *    slow outlier in either direction;
  *  - per-query failure tracking: a crashing query records its max
  *    elapsed (never improves the total) and is listed in "failed",
  *    so fast-crash is distinguishable from fast-success.
  *
  * Two evaluation modes, BOTH reported (round-6 harness fix):
  *  - honest (headline "value"/"queries"): executes each query's
  *    DECLARED plan via `queryExecution.toRdd` — `df.count()` would
  *    wrap the query in Aggregate(count(1)) and let Catalyst prune
  *    every output column, so a projection-shaped query (q35, q69, …)
  *    benches as a bare scan count, never paying its parse / decode /
  *    sort;
  *  - legacy ("legacy_value"/"legacy_queries"): the pre-round-6
  *    `df.count()` semantics, kept in the SAME output line so
  *    cross-round ratios against r1–r5 baselines stay apples-to-apples
  *    without rerunning (see BASELINE.md §c).
  *
  * Optional args narrow the run to the named queries (local iteration:
  * `runMain graft.Bench q31_dedup_groups`). SPARK_GRAFT_BENCH_LEGACY=1
  * skips the honest pass and reports legacy-only (old behavior).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]", cpus)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}; " +
      s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val selected = (if (args.nonEmpty) SparkEntry.queries.filter { case (n, _) => args.contains(n) }
      else SparkEntry.queries).toSeq.sortBy(_._1)
    // SPARK_GRAFT_BENCH_MODE: dual (default) | honest | legacy.
    // SPARK_GRAFT_BENCH_LEGACY=1 is the older spelling of legacy-only.
    val mode = sys.env.get("SPARK_GRAFT_BENCH_MODE")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_LEGACY").filter(_ == "1").map(_ => "legacy"))
      .getOrElse("dual")
    require(Set("dual", "honest", "legacy")(mode), s"bad bench mode: $mode")

    def execute(df: org.apache.spark.sql.DataFrame, legacy: Boolean): Unit = {
      if (legacy) df.count(): Unit
      else df.queryExecution.toRdd.count(): Unit
    }

    val runs = 3
    /** (name, medianSec, ok) per query under one evaluation mode. */
    def battery(legacy: Boolean): Seq[(String, Double, Boolean)] = {
      // warm the JVM/codegen once on the smallest scale so the measured
      // numbers reflect steady-state execution, not first-query JIT.
      selected.foreach { case (_, fn) =>
        try execute(fn(spark, "/root/testdata/sf0.001"), legacy)
        catch { case _: Throwable => () }
      }
      selected.map { case (name, fn) =>
        val rs = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { execute(fn(spark, sfDir), legacy); true }
            catch { case _: Throwable => false }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val ok = rs.forall(_._2)
        val t = if (ok) rs.map(_._1).sorted.apply(runs / 2) else rs.map(_._1).max
        (name, t, ok)
      }
    }
    def json(results: Seq[(String, Double, Boolean)]): String =
      results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    // honest FIRST: the headline numbers must not inherit JIT/page-
    // cache warmth from a prior full battery (the comparison pass may)
    val honest = if (mode == "legacy") Seq.empty else battery(legacy = false)
    val legacyResults = if (mode == "honest") Seq.empty else battery(legacy = true)
    val head = if (mode == "legacy") legacyResults else honest
    // a crash in EITHER evaluation mode is a failure — a legacy-only
    // crash would otherwise corrupt legacy_value invisibly
    val failed = (honest ++ legacyResults).collect { case (k, _, false) => "\"" + k + "\"" }
      .distinct.mkString("[", ",", "]")
    val legacyFields =
      if (legacyResults.isEmpty) ""
      else s""","legacy_value":${legacyResults.map(_._2).sum}""" +
        s""","legacy_queries":${json(legacyResults)}"""
    println(s"""{"metric":"total","value":${head.map(_._2).sum},"unit":"sec"""" +
      s""","mode":"$mode","queries":${json(head)},"failed":$failed""" +
      legacyFields + s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
