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
  *  - legacy ("legacy_value"): the pre-round-6 `df.count()` semantics,
  *    kept so cross-round ratios against r1–r5 baselines stay
  *    apples-to-apples without rerunning (see BASELINE.md §c).
  *
  * Output (round-7 harness fix — the round-6 line overflowed the
  * driver's tail capture and parsed as null): the stdout line is
  * TOTALS-ONLY (~250 bytes — both modes' totals, failure list, query
  * count); the FULL dual-mode detail (both per-query maps, 4
  * decimals) is written to SPARK_GRAFT_BENCH_OUT (default
  * ./BENCH_FULL.json), named in the line's "detail" field.
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
    // Fixed-width decimals: the round-6 line carried 2×76 values at
    // full double precision and overflowed the driver's tail capture
    // ("parsed": null — the honest headline was lost). Locale.ROOT:
    // a default-locale format would emit comma decimal separators on
    // a de_DE/fr_FR JVM — invalid JSON, the same failure again.
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def json(results: Seq[(String, Double, Boolean)], dp: Int): String =
      results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")

    // honest FIRST: the headline numbers must not inherit JIT/page-
    // cache warmth from a prior full battery (the comparison pass may)
    val honest = if (mode == "legacy") Seq.empty else battery(legacy = false)
    val legacyResults = if (mode == "honest") Seq.empty else battery(legacy = true)
    val head = if (mode == "legacy") legacyResults else honest
    // a crash in EITHER evaluation mode is a failure — a legacy-only
    // crash would otherwise corrupt legacy_value invisibly
    val failed = (honest ++ legacyResults).collect { case (k, _, false) => "\"" + k + "\"" }
      .distinct.mkString("[", ",", "]")
    // Full dual-mode detail goes to a FILE the driver/judge can read
    // whole; the stdout line stays small enough to survive tail capture.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // legacy totals ride the headline line ONLY in dual mode — in a
    // single-mode run each number appears exactly once (value), with
    // `mode` saying what it measured.
    val legacyTotal =
      if (mode == "dual" && legacyResults.nonEmpty)
        s""","legacy_value":${fmt(legacyResults.map(_._2).sum, 4)}"""
      else ""
    val fileFields = (
      Seq(s""""metric":"total"""", s""""value":${fmt(head.map(_._2).sum, 4)}""",
        s""""unit":"sec"""", s""""mode":"$mode"""",
        s""""queries":${json(head, 4)}""", s""""failed":$failed""") ++
      (if (mode == "dual" && legacyResults.nonEmpty)
        Seq(s""""legacy_value":${fmt(legacyResults.map(_._2).sum, 4)}""",
          s""""legacy_queries":${json(legacyResults, 4)}""")
      else Seq.empty) ++
      Seq(s""""sf":"$sfDir"""")
    ).mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fileFields + "\n").getBytes("UTF-8")): Unit
    // totals-only on stdout: the round-6 tail capture kept only ~2 KB,
    // so even a rounded 76-entry map risks truncating the line into
    // invalid JSON. Per-query maps live in the detail file.
    println(s"""{"metric":"total","value":${fmt(head.map(_._2).sum, 4)},"unit":"sec"""" +
      s""","mode":"$mode","n_queries":${head.size},"failed":$failed""" +
      legacyTotal + s""","detail":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
