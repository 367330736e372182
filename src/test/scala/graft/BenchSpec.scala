package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 harness guarantees for `graft.Bench`: the driver's no-args
  * invocation must ALWAYS produce a parseable totals line, even when
  * the wall budget forces degradation (BENCH_r08 was rc=124/parsed
  * null — the battery outgrew the kill window and left the round with
  * no recorded bench).
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val sf = "/root/testdata/sf0.001"

  private def pick(ns: String*) = ns.map(n => n -> SparkEntry.queries(n))

  test("forced-small deadline: queries degrade to 1 run and the line still parses") {
    // deadline already in the past → warms skipped, every query runs once
    val past = System.nanoTime() - 1L
    val head = Bench.battery(spark, sf, pick("q1_agg", "q11_route"),
      legacy = false, runs = 3, deadlineNanos = past)
    assert(head.forall(_.runs == 1), s"expected degraded single runs, got $head")
    assert(head.forall(_.ok), s"queries must still succeed under degradation: $head")
    val tail = Bench.battery(spark, sf, pick("q12_grok"),
      legacy = false, runs = 3, deadlineNanos = past)
    val (line, detail) = Bench.render("honest", "headline", head, Seq.empty,
      tail, runs = 3, outPath = "BENCH_FULL.json", sfDir = sf)
    // both outputs must be valid JSON — parse with Spark's JSON reader
    import spark.implicits._
    for (js <- Seq(line, detail)) {
      val parsed = spark.read.json(Seq(js).toDS)
      assert(!parsed.columns.contains("_corrupt_record"), s"invalid JSON: $js")
      assert(parsed.columns.contains("value"))
    }
    // truncated lists EVERY degraded median-of-3 group — round-10: the
    // tail runs median-of-3 too, so its degradation is visible, not a
    // silent cold-x1 masquerading as a baseline
    assert(line.contains(""""truncated":["q1_agg","q11_route","q12_grok"]"""), line)
    assert(line.contains(""""tail_mode":"median-of-3""""), line)
    assert(line.contains(""""scope":"headline""""))
    assert(line.contains(""""n_queries":2"""))
    // detail carries per-query runs counts (the doc's promise)
    assert(detail.contains(""""runs":{"q1_agg":1,"q11_route":1}"""), detail)
    assert(detail.contains(""""tail_runs":{"q12_grok":1}"""), detail)
    // round-11 forensics: the RAW per-run arrays ride the detail file
    // (here single runs → one-element arrays)
    assert(head.forall(_.secs.size == 1), head.toString)
    assert(detail.contains(""""runs_sec":{"q1_agg":["""), detail)
    assert(detail.contains(""""tail_runs_sec":{"q12_grok":["""), detail)
  }

  test("canary fields: ratio on the stdout line, start/end in the detail file") {
    val s = Bench.canary(spark)
    val e = Bench.canary(spark)
    assert(s > 0 && e > 0, s"canary must time a real execution: start=$s end=$e")
    val head = Seq(Bench.QR("q1_agg", 1.0, ok = true, runs = 3, secs = Seq(0.9, 1.0, 1.2)))
    val (line, detail) = Bench.render("dual", "full", head, head, Seq.empty,
      runs = 3, outPath = "BENCH_FULL.json", sfDir = sf, canary = Some((s, e)))
    assert(line.contains(""""canary_ratio":"""), line)
    assert(detail.contains(""""canary_start_sec":""") &&
      detail.contains(""""canary_end_sec":""") &&
      detail.contains(""""canary_ok":true""") &&
      detail.contains(s""""canary_query":"${Bench.CanaryQuery}""""), detail)
    assert(detail.contains(""""runs_sec":{"q1_agg":[0.9000,1.0000,1.2000]}"""), detail)
    assert(detail.contains(""""legacy_runs_sec":{"q1_agg":[0.9000,1.0000,1.2000]}"""), detail)
    import spark.implicits._
    for (js <- Seq(line, detail))
      assert(!spark.read.json(Seq(js).toDS).columns.contains("_corrupt_record"), js)
    // a FAILED canary (negative sentinel) must render null, not a
    // time-to-exception masquerading as a measurement
    val (fline, fdetail) = Bench.render("dual", "full", head, head, Seq.empty,
      runs = 3, outPath = "BENCH_FULL.json", sfDir = sf, canary = Some((-1.0, e)))
    assert(fline.contains(""""canary_ratio":null"""), fline)
    assert(fdetail.contains(""""canary_ok":false"""), fdetail)
    for (js <- Seq(fline, fdetail))
      assert(!spark.read.json(Seq(js).toDS).columns.contains("_corrupt_record"), js)
  }

  test("env-provided paths with quotes/backslashes still render valid JSON") {
    val head = Seq(Bench.QR("q1_agg", 1.0, ok = true, runs = 3))
    val (line, detail) = Bench.render("honest", "named", head, Seq.empty, Seq.empty,
      runs = 3, outPath = """/tmp/we"ird\path.json""", sfDir = """/data/sf"0.1""")
    import spark.implicits._
    for (js <- Seq(line, detail)) {
      val parsed = spark.read.json(Seq(js).toDS)
      assert(!parsed.columns.contains("_corrupt_record"), s"invalid JSON: $js")
    }
    assert(line.contains("""\"ird\\path"""), line)
  }

  test("generous deadline: median-of-3 runs, nothing truncated, dual totals render") {
    val far = System.nanoTime() + 600L * 1000 * 1000 * 1000
    val head = Bench.battery(spark, sf, pick("q1_agg"),
      legacy = false, runs = 3, deadlineNanos = far)
    assert(head.forall(_.runs == 3))
    val leg = Bench.battery(spark, sf, pick("q1_agg"),
      legacy = true, runs = 3, deadlineNanos = far)
    val (line, _) = Bench.render("dual", "headline", head, leg, Seq.empty,
      runs = 3, outPath = "BENCH_FULL.json", sfDir = sf)
    assert(line.contains(""""truncated":[]"""), line)
    assert(line.contains(""""legacy_value":"""), line)
    import spark.implicits._
    assert(!spark.read.json(Seq(line).toDS).columns.contains("_corrupt_record"))
  }

  test("suspect flag: injected-variance runs self-identify; tight arrays stay clean") {
    // the r11 driver-tail contamination, verbatim: q239's raw array
    // [13.48, 22.66, 55.17] has 4x internal spread — the whole-record
    // canary missed it (0.50, in-band); the per-query flag must not
    val loaded = Bench.QR("q239_lsh_recall", 22.66, ok = true, runs = 3,
      secs = Seq(13.48, 22.66, 55.17))
    val tight = Bench.QR("q91_allpairs", 3.53, ok = true, runs = 3,
      secs = Seq(4.68, 3.53, 3.19))
    val single = Bench.QR("q1_agg", 1.0, ok = true, runs = 1, secs = Seq(1.0))
    assert(Bench.suspectsOf(Seq(loaded, tight, single)) == Seq("q239_lsh_recall"))
    // round-13 (VERDICT r12 item 4): a JIT-cold FIRST run must not flag
    // the group — the judge's quiet-box named-scope re-bench saw q288
    // run [1.44, 0.66, 0.69] (max/min 2.2) on a perfectly healthy box;
    // with ≥3 runs the spread is computed over runs 2..n only
    val jitCold = Bench.QR("q288_ivf_audit", 0.69, ok = true, runs = 3,
      secs = Seq(1.44, 0.66, 0.69))
    assert(Bench.suspectsOf(Seq(jitCold)).isEmpty)
    // ... while a genuine mid-group spike (load arrived during run 2)
    // still self-identifies on the runs-2..n window
    val midSpike = Bench.QR("q63_pagerank", 0.7, ok = true, runs = 3,
      secs = Seq(0.7, 2.1, 0.7))
    assert(Bench.suspectsOf(Seq(midSpike)) == Seq("q63_pagerank"))
    // two-run groups keep the whole-array spread (no run to amortize)
    val twoWide = Bench.QR("q6_window_agg", 1.0, ok = true, runs = 2,
      secs = Seq(0.4, 1.0))
    assert(Bench.suspectsOf(Seq(twoWide)) == Seq("q6_window_agg"))
    val (line, detail) = Bench.render("honest", "headline",
      Seq(tight, single), Seq.empty, Seq(loaded), runs = 3,
      outPath = "BENCH_FULL.json", sfDir = sf)
    assert(line.contains(""""suspect":["q239_lsh_recall"]"""), line)
    assert(detail.contains(""""suspect":["q239_lsh_recall"]"""), detail)
    // a clean record renders an EMPTY list (field always present — its
    // absence must never be confusable with "not checked")
    val (clean, _) = Bench.render("honest", "headline", Seq(tight), Seq.empty,
      Seq.empty, runs = 3, outPath = "BENCH_FULL.json", sfDir = sf)
    assert(clean.contains(""""suspect":[]"""), clean)
    import spark.implicits._
    for (js <- Seq(line, detail, clean))
      assert(!spark.read.json(Seq(js).toDS).columns.contains("_corrupt_record"), js)
  }

  test("tail keeps median-of-3 under its protected slice even when the head exhausted the budget") {
    // the r10/r11 failure: head passes consumed the whole wall budget,
    // the tail silently degraded to cold x1 — with the protected slice
    // the tail's deadline is AT LEAST now + 20% of budget, so the
    // sensitivity-ordered head of tailQueries keeps its medians
    val exhausted = System.nanoTime() - 1L
    val budgetSec = 480.0
    val protectedDeadline = math.max(exhausted,
      System.nanoTime() + (budgetSec * 0.20 * 1e9).toLong)
    assert(protectedDeadline > System.nanoTime(),
      "protected slice must extend past an exhausted overall deadline")
    val tail = Bench.battery(spark, sf, pick("q12_grok"),
      legacy = false, runs = 3, deadlineNanos = protectedDeadline)
    assert(tail.forall(_.runs == 3),
      s"tail must keep median-of-3 under the protected slice: $tail")
  }

  test("budget_needed_sec rides the full-mode line and parses") {
    val head = Seq(Bench.QR("q1_agg", 1.0, ok = true, runs = 3,
      secs = Seq(0.9, 1.0, 1.2)))
    val (line, detail) = Bench.render("dual", "full", head, head, Seq.empty,
      runs = 3, outPath = "BENCH_FULL.json", sfDir = sf,
      budgetNeededSec = Some(4512.3))
    assert(line.contains(""""budget_needed_sec":4512.3"""), line)
    assert(detail.contains(""""budget_needed_sec":4512.3"""), detail)
    // headline scope omits it (the headline budget is already sized)
    val (hl, _) = Bench.render("dual", "headline", head, head, Seq.empty,
      runs = 3, outPath = "BENCH_FULL.json", sfDir = sf)
    assert(!hl.contains("budget_needed_sec"), hl)
    import spark.implicits._
    for (js <- Seq(line, detail, hl))
      assert(!spark.read.json(Seq(js).toDS).columns.contains("_corrupt_record"), js)
  }

  test("gate subset is exactly the 34 round-1 queries and all still exist") {
    assert(Bench.gateQueries.size == 34)
    assert(Bench.gateQueries.distinct.size == 34)
    val missing = Bench.gateQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"gate queries dropped from the battery: $missing")
    val missingTail = Bench.tailQueries.filterNot(SparkEntry.queries.contains)
    assert(missingTail.isEmpty, s"tail queries dropped from the battery: $missingTail")
  }
}
