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
  * Optional args narrow the run to the named queries (local iteration:
  * `runMain graft.Bench q31_dedup_groups`).
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
    // Execute the DECLARED plan and discard rows. `df.count()` would
    // wrap the query in Aggregate(count(1)) and let Catalyst prune
    // every output column — a projection-shaped query (q35, q69, ...)
    // then benches as a bare scan count, never paying its parse /
    // decode / sort. toRdd runs the query's own executed plan
    // (including AQE) to completion — the null-sink measure.
    // SPARK_GRAFT_BENCH_LEGACY=1 restores the pre-round-6 count()
    // semantics for cross-round comparisons (see BASELINE.md §c).
    val legacy = sys.env.get("SPARK_GRAFT_BENCH_LEGACY").contains("1")
    def execute(df: org.apache.spark.sql.DataFrame): Unit = {
      if (legacy) df.count(): Unit
      else df.queryExecution.toRdd.count(): Unit
    }
    // warm the JVM/codegen once on the smallest scale so the measured
    // numbers reflect steady-state execution, not first-query JIT.
    selected.foreach { case (_, fn) =>
      try execute(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { execute(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val runs = 3
    val results = selected.map { case (name, fn) =>
      val rs = (1 to runs).map(_ => timeOnce(fn))
      val ok = rs.forall(_._2)
      val t = if (ok) rs.map(_._1).sorted.apply(runs / 2) else rs.map(_._1).max
      (name, t, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
