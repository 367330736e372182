package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: times battery queries at SPARK_GRAFT_SF_DIR and
  * prints ONE machine-parsable JSON line.
  *
  * Scope (round-9 harness fix — BENCH_r08 was rc=124/parsed-null: the
  * battery grew 90 → 276 queries while the harness still ran dual-mode
  * × median-of-3 × warm over ALL of them, ≈ 35+ min wall, past the
  * driver's kill window; a green gate nobody can see is not a green
  * gate):
  *  - no args (the driver's invocation) → HEADLINE scope: the 34-query
  *    round-1 shared subset (the 2×-gate's own definition, BASELINE.md
  *    §c) dual-mode median-of-3, plus the audited heavy tail
  *    ([[tailQueries]]) honest-only median-of-3 (round-10: the r9
  *    cold-×1 tail was 3–7× off same-session isolated runs — pure
  *    noise as a regression baseline; medians made affordable by the
  *    r10 AllPairs prefix-materialization fix). Completes in ~6 min.
  *  - SPARK_GRAFT_BENCH_FULL=1 → the full battery (dual, median-of-3,
  *    subject to the wall budget below — expect truncation).
  *  - explicit query-name args → just those (local iteration:
  *    `runMain graft.Bench q31_dedup_groups`).
  *
  * Wall budget (round-9): SPARK_GRAFT_BENCH_BUDGET_SEC (default 720
  * since round-14, sized from the r13 record's measured ~540 s need).
  * Past the soft deadline, remaining queries run ONCE instead of 3×
  * (and remaining sf0.001 warms are skipped); the line still prints,
  * with the affected queries listed in "truncated". The battery grows
  * every round — the harness degrades instead of getting killed.
  * Round-10 slicing, extended to FULL scope in round-11: in any dual
  * run (headline or full) the budget is SPLIT per battery — honest may
  * consume at most 40%, honest+legacy at most 80% — so a slow honest
  * pass degrades ITSELF, never the legacy pass the 2× gate is actually
  * judged on, and the headline tail keeps its slice (the protected-
  * mode rule; r10's full point let honest exhaust the budget and
  * single-ran ~124 legacy queries).
  *
  * Forensics (round-11): the detail file carries per-query RAW run
  * arrays (`runs_sec` etc. — medians with tight arrays are trustworthy,
  * wide spread = loaded box), and a cheap canary query is timed at the
  * start and end of the record with the end/start ratio on the stdout
  * line — a record taken on a box whose load changed mid-run
  * self-identifies instead of requiring a judge re-bench. Round-12
  * closes the canary's blind spot (load arriving mid-battery and
  * leaving before the end probe — both r10 and r11 driver tails): the
  * stdout line carries a per-query `"suspect"` list ([[suspectsOf]] —
  * raw-run spread > 2× within one median group), the tail keeps a
  * PROTECTED 20% budget slice measured from its own start so it
  * degrades to flagged-suspect medians rather than silent cold ×1
  * runs, and a full-scope record prints `"budget_needed_sec"` (3× both
  * batteries' medians + observed overhead) so an under-budgeted full
  * record names its own shortfall.
  *
  * GC fence (round-9): between queries the session cache and all
  * persistent RDDs (localCheckpoint leftovers) are dropped and a GC is
  * requested — 276 queries' worth of pinned checkpoint blocks were
  * inflating in-battery tails 3–5× over isolated runs (BASELINE §l).
  * Round-10: the fence GCs twice with a short settle pause (finalizer
  * + ContextCleaner drain) — one pass left in-battery numbers ~2× over
  * isolated for the dedup family (VERDICT r9 item 3).
  *
  * Trustworthiness (judge round-2 finding: best-of-2 can't tell a real
  * 1.5× regression from machine noise): median-of-3 per query; a
  * crashing query records its max elapsed (never improves the total)
  * and is listed in "failed", so fast-crash ≠ fast-success.
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
  * Output: the stdout line is TOTALS-ONLY (~300 bytes — the round-6
  * per-query line overflowed the driver's tail capture and parsed as
  * null); full per-query dual-mode detail (4 decimals, runs counts)
  * goes to SPARK_GRAFT_BENCH_OUT (default ./BENCH_FULL_<scope>.json —
  * scope-qualified since round-14 so a headline run can never clobber
  * the round's full-battery record), named in the line's "detail"
  * field.
  */
object Bench {

  /** The round-1 shared gate subset — BENCH_r01.json's exact query
    * list. The driver's 2× gate is judged on this subset's legacy
    * total vs r1's 17.95 s (BASELINE.md §c). Do not grow this list;
    * new queries join [[tailQueries]] or the FULL scope.
    */
  val gateQueries: Seq[String] = Seq(
    "q1_agg", "q2_join_topk", "q3_join_agg", "q4_window_fn",
    "q5_sessionize", "q6_window_agg", "q7_salted_distinct", "q8_setops",
    "q9_pipeline_etl", "q10_decode", "q11_route", "q12_grok",
    "q13_enrich", "q14_computed", "q15_retention", "q16_text_tokens",
    "q17_text_quality", "q18_text_langid", "q19_text_fingerprint",
    "q20_dedup_exact", "q21_dedup_minhash", "q22_dedup_ngram",
    "q23_dedup_simhash", "q24_dedup_embed", "q25_knn_brute",
    "q26_knn_lsh", "q27_multimodal", "q28_frames", "q29_knn_ivf",
    "q30_ngram_topk", "q31_dedup_groups", "q32_stats", "q33_rollup",
    "q34_pivot")

  /** The audited expensive tail (BASELINE §l top-15 + the iterative
    * graph/ER/exact-all-pairs families) — benched honest-only
    * median-of-3 in headline scope so every round leaves a
    * driver-recorded, regression-comparable number for the queries
    * whose regressions actually matter at scale.
    *
    * ORDERED by regression-sensitivity, not name: when the wall budget
    * degrades the tail, queries past the deadline drop to single runs
    * in list order — so the exact-all-pairs family (the one family
    * with a recent real regression) and the iterative graph loops
    * keep their medians, and the cheap stable entries absorb the
    * degradation. A 1.5× slower box turns ~5 entries single-run
    * (observed r10); alphabetical order handed q239 the ×1 slot.
    */
  val tailQueries: Seq[String] = Seq(
    "q91_allpairs", "q239_lsh_recall", "q136_cluster_coeff",
    "q63_pagerank", "q150_pagerank_dangling", "q168_hits",
    "q126_entity_resolution", "q109_cluster_rep", "q122_bpe_merges",
    "q257_coreset_coverage", "q243_isotonic", "q108_bm25",
    // round-12 additions, least regression-sensitive last (budget
    // truncation eats from the end): the index-lifecycle family's two
    // heaviest members (double assignment pass / Lloyd chain + assign)
    "q290_index_churn", "q288_ivf_audit",
    // round-13: the banded decontam chain (the q293 scale path) —
    // cheap and stable, so it sits last
    "q297_embed_decontam_banded",
    // round-14: the tight-threshold production twin (derived bands,
    // planted-leak eval) — cheapest, so it absorbs truncation first
    "q299_decontam_tight",
    // round-15: the decontam TVF at the same operating point (the SQL
    // twin of q299 — tracks the in-text recipe against the operator)
    "q303_decontam_tvf")

  /** One query's measurement under one evaluation mode. `sec` is the
    * reported median; `secs` keeps every raw run (round-10 forensics:
    * the r10 driver tail recorded a loaded-box 6× outlier that needed
    * a judge re-bench to diagnose — with the per-run array in the
    * detail file, a contaminated record self-identifies: honest
    * medians have tight arrays, a loaded box shows 3× spread).
    */
  final case class QR(name: String, sec: Double, ok: Boolean, runs: Int,
                      secs: Seq[Double] = Seq.empty)

  /** Contamination threshold for [[suspectsOf]]: within one query's
    * raw run array, max/min spread beyond this factor means load
    * arrived or left mid-measurement.
    */
  val SuspectSpread = 2.0

  /** Round-12 (VERDICT r11 item 1a): queries whose raw run arrays
    * self-identify as load-contaminated — spread beyond
    * [[SuspectSpread]] within one median group. This makes the r10/r11
    * driver-tail problem MECHANICALLY decidable per query: the r11
    * record's q239 `[13.48, 22.66, 55.17]` flags itself, where the
    * whole-record canary (0.50, in-band) was blind to load that
    * arrived mid-battery and left before the end probe. A flagged
    * median is NOT comparable as a regression baseline — re-measure
    * isolated instead of adjudicating. Single runs can't self-identify
    * (that's what "truncated" already marks).
    *
    * Round-13 (VERDICT r12 item 4): with ≥ 3 runs the spread is taken
    * over runs 2..n — the FIRST run of a median group carries residual
    * JIT/codegen cost in small named-scope invocations (the judge's
    * quiet-box re-bench flagged q288 `[1.44, 0.66, 0.69]` as suspect on
    * a healthy box purely from run 1), and a flag that cries wolf in
    * the isolated-iteration tool trains readers to ignore it. Run 1
    * stays visible in `runs_sec` for forensics; a genuine mid-group
    * spike (`[0.7, 2.1, 0.7]`) still flags on runs 2..n. Two-run
    * groups keep the whole-array spread (nothing to amortize into).
    */
  def suspectsOf(results: Seq[QR]): Seq[String] =
    results.filter { r =>
      val window = if (r.secs.size >= 3) r.secs.drop(1) else r.secs
      window.size >= 2 && window.min > 0 &&
        window.max / window.min > SuspectSpread
    }.map(_.name)

  /** Drop session cache + persistent RDDs (localCheckpoint leftovers)
    * and request a GC — the inter-query fence.
    */
  def fence(spark: SparkSession): Unit = {
    spark.sqlContext.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // double GC with a settle pause: the first pass queues checkpoint
    // RDDs for the ContextCleaner, the pause lets it drain, the second
    // pass reclaims the freed blocks — one pass left in-battery numbers
    // ~2× over isolated for checkpoint-heavy queries (VERDICT r9 #3)
    System.gc()
    Thread.sleep(200)
    System.gc()
  }

  private def execute(df: org.apache.spark.sql.DataFrame, legacy: Boolean): Unit = {
    if (legacy) df.count(): Unit
    else df.queryExecution.toRdd.count(): Unit
  }

  /** Time `selected` under one evaluation mode: up to `runs` runs per
    * query (median reported), degrading to 1 run per query once
    * `deadlineNanos` passes. Warm pass at sf0.001 first (JIT/codegen),
    * also skipped past the deadline. GC fence between queries.
    */
  def battery(spark: SparkSession, sfDir: String,
              selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
              legacy: Boolean, runs: Int, deadlineNanos: Long): Seq[QR] = {
    selected.foreach { case (_, fn) =>
      if (System.nanoTime() < deadlineNanos)
        try execute(fn(spark, "/root/testdata/sf0.001"), legacy)
        catch { case _: Throwable => () }
    }
    fence(spark)
    selected.map { case (name, fn) =>
      val n = if (System.nanoTime() < deadlineNanos) runs else 1
      val rs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { execute(fn(spark, sfDir), legacy); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      fence(spark)
      val ok = rs.forall(_._2)
      val t = if (ok) rs.map(_._1).sorted.apply(rs.size / 2) else rs.map(_._1).max
      QR(name, t, ok, n, rs.map(_._1))
    }
  }

  /** The load canary: one cheap battery query timed (honest mode,
    * warmed, fenced) at the START and END of the run — ALWAYS at the
    * sf0.001 warm-up fixture, never at the measured SF dir: the start
    * canary runs BEFORE the honest battery, and timing it at the
    * record's own SF would pre-warm a gate query's page cache at the
    * measured scale (round-11 review — the exact like-with-like
    * protocol error the r10 gate rule exists to prevent; the battery
    * has always warmed every query at sf0.001 first, so the canary's
    * sf0.001 executions add nothing the protocol didn't already do).
    * On a quiet box the ratio sits in ~0.4–1.0 (the end canary runs
    * in a fully C2-compiled JVM; below 1 is the healthy direction —
    * see BASELINE §c's canary read rule); a ratio ≳ 1.5 means load
    * arrived mid-run and the record's absolute numbers are
    * contaminated (the r10 driver tail: q91 recorded 6.4× its anchor
    * purely from box load — the canary makes such a record
    * self-identify instead of needing a judge re-bench). Returns a
    * NEGATIVE value when the canary itself failed to execute — the
    * line then carries `"canary_ratio":null` and the detail file
    * `"canary_ok":false`, so a broken canary can neither bless nor
    * damn a record (a swallowed failure would report time-to-exception
    * as a measurement).
    */
  val CanaryQuery = "q1_agg"
  val CanarySfDir = "/root/testdata/sf0.001"

  def canary(spark: SparkSession): Double = {
    val fn = SparkEntry.queries(CanaryQuery)
    // warm TWICE: the start-of-record call is the very first query the
    // JVM runs, and a single warm execution still carries enough
    // JIT/codegen cold cost to skew the ratio ~2× on a quiet box
    val warmed = (1 to 2).forall { _ =>
      try { execute(fn(spark, CanarySfDir), legacy = false); true }
      catch { case _: Throwable => false }
    }
    fence(spark)
    val t0 = System.nanoTime()
    val ok = try { execute(fn(spark, CanarySfDir), legacy = false); true }
      catch { case _: Throwable => false }
    if (warmed && ok) (System.nanoTime() - t0) / 1e9 else -1.0
  }

  // Fixed-width decimals; Locale.ROOT so a de_DE/fr_FR JVM can't emit
  // comma decimal separators (invalid JSON — the round-6 class of bug).
  def fmt(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  /** JSON string escape for env-provided values (paths): backslashes,
    * quotes, and control chars — an outPath containing `"` must not
    * yield the parsed-null failure class this harness exists to
    * prevent.
    */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def qjson(results: Seq[QR], dp: Int): String =
    results.map(r => "\"" + r.name + "\":" + fmt(r.sec, dp))
      .mkString("{", ",", "}")

  private def rjson(results: Seq[QR]): String =
    results.map(r => "\"" + r.name + "\":" + r.runs)
      .mkString("{", ",", "}")

  private def rsecjson(results: Seq[QR], dp: Int): String =
    results.map(r => "\"" + r.name + "\":" +
        r.secs.map(fmt(_, dp)).mkString("[", ",", "]"))
      .mkString("{", ",", "}")

  private def names(xs: Seq[String]): String =
    xs.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** Render the totals-only stdout line + the full detail body.
    * Returns (stdoutLine, detailBody). All three groups (honest,
    * legacy, tail) run median-of-`runs`, so all three count toward
    * "truncated" when the budget degrades them; the detail body
    * carries per-query seconds, per-query runs counts, AND per-query
    * raw run arrays (`*_runs_sec`) — the forensics that let a reader
    * distinguish a loaded box (wide spread) from a real regression
    * (tight spread at a new level). `canary` = (startSec, endSec) of
    * the load canary; its RATIO rides the stdout line so a
    * contaminated record self-identifies at a glance.
    */
  def render(mode: String, scope: String, head: Seq[QR], legacyR: Seq[QR],
             tail: Seq[QR], runs: Int, outPath: String, sfDir: String,
             canary: Option[(Double, Double)] = None,
             budgetNeededSec: Option[Double] = None): (String, String) = {
    val failed = names((head ++ legacyR ++ tail).filter(!_.ok).map(_.name))
    val truncated = names((head ++ legacyR ++ tail).filter(_.runs < runs).map(_.name))
    val suspect = names(suspectsOf(head ++ legacyR ++ tail))
    val budgetNeeded = budgetNeededSec
      .map(v => s""","budget_needed_sec":${fmt(v, 1)}""").getOrElse("")
    val legacyTotal =
      if (legacyR.nonEmpty) s""","legacy_value":${fmt(legacyR.map(_.sec).sum, 4)}"""
      else ""
    val tailFields =
      if (tail.nonEmpty)
        s""","tail_value":${fmt(tail.map(_.sec).sum, 4)},"n_tail":${tail.size}""" +
          s""","tail_mode":"median-of-$runs""""
      else ""
    // negative canary seconds = the canary failed to execute: the
    // ratio renders as null (neither blesses nor damns the record)
    // and canary_ok marks the failure in the detail file
    def ratioJson(s: Double, e: Double): String =
      if (s > 0 && e > 0) fmt(e / s, 2) else "null"
    val canaryRatio = canary.map { case (s, e) =>
      s""","canary_ratio":${ratioJson(s, e)}""" }.getOrElse("")
    val canaryDetail = canary.map { case (s, e) =>
      Seq(s""""canary_query":"$CanaryQuery"""",
        s""""canary_start_sec":${fmt(s, 4)}""", s""""canary_end_sec":${fmt(e, 4)}""",
        s""""canary_ratio":${ratioJson(s, e)}""",
        s""""canary_ok":${s > 0 && e > 0}""") }.getOrElse(Seq.empty)
    val line = s"""{"metric":"total","value":${fmt(head.map(_.sec).sum, 4)},"unit":"sec"""" +
      s""","mode":"$mode","scope":"$scope","n_queries":${head.size},"failed":$failed""" +
      s""","truncated":$truncated,"suspect":$suspect""" + legacyTotal + tailFields +
      canaryRatio + budgetNeeded +
      s""","detail":${jstr(outPath)},"sf":${jstr(sfDir)}}"""
    val detail = (
      Seq(s""""metric":"total"""", s""""value":${fmt(head.map(_.sec).sum, 4)}""",
        s""""unit":"sec"""", s""""mode":"$mode"""", s""""scope":"$scope"""",
        s""""queries":${qjson(head, 4)}""", s""""runs":${rjson(head)}""",
        s""""runs_sec":${rsecjson(head, 4)}""",
        s""""failed":$failed""", s""""truncated":$truncated""",
        s""""suspect":$suspect""") ++
      budgetNeededSec.map(v => s""""budget_needed_sec":${fmt(v, 1)}""").toSeq ++
      (if (legacyR.nonEmpty)
        Seq(s""""legacy_value":${fmt(legacyR.map(_.sec).sum, 4)}""",
          s""""legacy_queries":${qjson(legacyR, 4)}""",
          s""""legacy_runs":${rjson(legacyR)}""",
          s""""legacy_runs_sec":${rsecjson(legacyR, 4)}""")
      else Seq.empty) ++
      (if (tail.nonEmpty)
        Seq(s""""tail_value":${fmt(tail.map(_.sec).sum, 4)}""",
          s""""tail_queries":${qjson(tail, 4)}""",
          s""""tail_runs":${rjson(tail)}""",
          s""""tail_runs_sec":${rsecjson(tail, 4)}""",
          s""""tail_mode":"median-of-$runs"""")
      else Seq.empty) ++
      canaryDetail ++
      Seq(s""""sf":${jstr(sfDir)}""")
    ).mkString("{", ",", "}")
    (line, detail)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]", cpus)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}; " +
      s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    // SPARK_GRAFT_BENCH_MODE: dual (default) | honest | legacy.
    // SPARK_GRAFT_BENCH_LEGACY=1 is the older spelling of legacy-only.
    val mode = sys.env.get("SPARK_GRAFT_BENCH_MODE")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_LEGACY").filter(_ == "1").map(_ => "legacy"))
      .getOrElse("dual")
    require(Set("dual", "honest", "legacy")(mode), s"bad bench mode: $mode")
    val full = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
    // default budget sized from measured need (round-14, VERDICT r13
    // item 4): the r13 driver record needed ~540 s on a healthy box
    // (8/15 tail entries degraded to flagged cold x1 under the old
    // 480 s default) and the battery keeps growing — 720 s covers the
    // measured need with headroom; the record still prints its own
    // budget_needed_sec so the next resize is data, not a guess
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "720").toDouble
    val t0 = System.nanoTime()
    val deadline = t0 + (budgetSec * 1e9).toLong
    val runs = 3

    // the gate and tail lists must resolve COMPLETELY — a silently
    // filtered rename would shrink the 34-query gate total and flatter
    // the 2× comparison against r1 (mirrors the unknown-args require)
    val unresolvedFixed = (gateQueries ++ tailQueries).filterNot(SparkEntry.queries.contains)
    require(unresolvedFixed.isEmpty,
      s"gate/tail query name(s) missing from the battery: ${unresolvedFixed.mkString(", ")}")
    val (scope, selectedNames, tailNames) =
      if (args.nonEmpty) ("named", args.toSeq.sorted, Seq.empty[String])
      else if (full) ("full", SparkEntry.queries.keys.toSeq.sorted, Seq.empty[String])
      else ("headline", gateQueries.sorted, tailQueries)
    def resolve(ns: Seq[String]) = ns.map(n => n -> SparkEntry.queries(n))

    // Budget slices (dual mode, headline AND full — round-11: the r10
    // full-battery point let the honest pass exhaust the whole budget
    // and degraded ~124 legacy queries to single runs): the honest
    // pass may consume at most 40% of the budget and honest+legacy at
    // most 80% — a slow honest pass degrades ITSELF to single runs,
    // never the legacy pass the 2× gate is judged on, and the
    // headline tail keeps a slice. This is the PROTECTED-MODE RULE:
    // in any dual run each mode owns its slice of the wall budget.
    val slicing = mode == "dual" && args.isEmpty
    def slice(frac: Double): Long =
      if (slicing) t0 + (budgetSec * frac * 1e9).toLong else deadline

    // The tail's PROTECTED slice (round-12, VERDICT r11 item 1b): the
    // audited tail keeps at least 20% of the wall budget measured from
    // its OWN start, even when a slow box let the head passes overrun
    // theirs — r10/r11 both silently degraded 7/12 tail entries to
    // cold ×1 runs, which 3–7× overstate and are unusable as a
    // regression baseline. Worst-case wall grows by ≤ 0.2×budget; the
    // sensitivity ordering of [[tailQueries]] still decides who keeps
    // medians if even the protected slice runs out.
    def tailDeadlineOf(nowNanos: Long): Long =
      math.max(deadline, nowNanos + (budgetSec * 0.20 * 1e9).toLong)

    // load canary at both ends of the record (see [[canary]])
    val canaryStart = canary(spark)

    // honest FIRST: the headline numbers must not inherit JIT/page-
    // cache warmth from a prior full battery (the comparison pass may).
    val honest = if (mode == "legacy") Seq.empty[QR]
      else battery(spark, sfDir, resolve(selectedNames), legacy = false, runs, slice(0.40))
    val legacyR = if (mode == "honest") Seq.empty[QR]
      else battery(spark, sfDir, resolve(selectedNames), legacy = true, runs, slice(0.80))
    // audited heavy tail: honest declared-plan, median-of-3 — the r9
    // cold-×1 record was 3–7× off isolated runs and unusable as a
    // regression baseline; degradation past the deadline is recorded
    // in "truncated" like any other group.
    val tail = if (tailNames.isEmpty) Seq.empty[QR]
      else battery(spark, sfDir, resolve(tailNames), legacy = false, runs,
        tailDeadlineOf(System.nanoTime()))
    val head = if (mode == "legacy") legacyR else honest

    // Full-battery budget arithmetic (round-12, VERDICT r11 item 6):
    // BASELINE records that both-modes-full-medians needs ≈ 4500 s
    // while the default budget is 480 s — print what THIS record would
    // have needed (3× each query's median for both batteries, plus the
    // observed warm/fence overhead) so an under-budgeted full record
    // self-describes instead of silently truncating half the battery.
    // ... printed for EVERY scope since round-14 (item 4's other half):
    // headline records under-budget the same way full ones did, and the
    // number is free to compute
    val budgetNeeded = {
      val all = honest ++ legacyR ++ tail
      val runsSum = all.map(_.secs.sum).sum
      val elapsed = (System.nanoTime() - t0) / 1e9
      Some(3.0 * all.map(_.sec).sum + math.max(0.0, elapsed - runsSum))
    }

    val canaryEnd = canary(spark)
    // scope-qualified default detail path (round-14, VERDICT r13 item
    // 3): a single mutable BENCH_FULL.json slot let a later headline
    // run clobber the round's full-battery per-query record — the only
    // full-medians detail for 298 queries existed nowhere afterwards.
    // Explicit SPARK_GRAFT_BENCH_OUT still wins (the way a round-named
    // full record is taken: BENCH_FULL_full_r14.json).
    // CPU-qualified since round-17 (ADVICE r16 medium): the driver's
    // 8-CPU scaling run reuses this harness with SPARK_GRAFT_CPUS=8 and
    // clobbered the round-16 32-CPU headline detail — the exact failure
    // class the scope qualifier fixed for full-vs-headline. Any core
    // count other than the canonical 32 now writes its own
    // `_c<cpus>` file; the stdout line's "detail" field names it.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (cpus == "32") s"BENCH_FULL_$scope.json"
      else s"BENCH_FULL_${scope}_c$cpus.json")
    val (line, detail) = render(mode, scope, head,
      if (mode == "dual") legacyR else Seq.empty, tail, runs, outPath, sfDir,
      canary = Some((canaryStart, canaryEnd)), budgetNeededSec = budgetNeeded)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (detail + "\n").getBytes("UTF-8")): Unit
    println(line)
    spark.stop()
  }
}
