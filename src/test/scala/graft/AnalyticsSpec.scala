package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-6 analytics queries that the DuckDB oracle
  * cannot express (determinism under repartitioning, conservation
  * laws) — the oracle already pins the exact values.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  test("q61 split assignment is a pure row function: stable under repartitioning") {
    val docs = Tables(spark, dir, "documents")
    val split = QueriesAnalytics.splitAssignment(col("doc_id"))
    val a = docs.select(col("doc_id"), split.as("split"))
    val b = docs.repartition(13).select(col("doc_id"), split.as("split"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // partition: every doc lands in exactly one split
    assert(a.count() === docs.count())
    // ratios in sane bands (md5 prefix is uniform: 205/26/25 of 256)
    val bysplit = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(bysplit("train") / n > 0.7 && bysplit("train") / n < 0.9)
    assert(bysplit("val") / n > 0.03 && bysplit("val") / n < 0.2)
    assert(bysplit("test") / n > 0.03 && bysplit("test") / n < 0.2)
  }

  test("q63 pagerank conserves rank mass each sweep (sum pr == node count)") {
    // symmetrized graph, no dangling mass: Σ pr stays exactly N through
    // every iteration — a wrong join key, lost nodes, or a dropped
    // degree normalization all break this immediately.
    val df = Queries.all("q63_pagerank")(spark, dir)
    val agg = df.agg(sum("pr").as("mass"), count(lit(1)).as("n")).collect()(0)
    val mass = agg.getDouble(0)
    val n = agg.getLong(1).toDouble
    assert(math.abs(mass - n) / n < 1e-9, s"mass $mass drifted from n $n")
  }

  test("q150 dangling-aware pagerank conserves total probability mass 1.0") {
    // the asymmetric graph makes every supplier a sink: without the
    // dangling-mass redistribution Σ pr decays by ~0.85·(sink share)
    // per sweep — conservation at 1.0 is exactly the property the
    // dangling scalar exists to preserve.
    val df = Queries.all("q150_pagerank_dangling")(spark, dir)
    val mass = df.agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"probability mass drifted: $mass")
  }

  test("q64 grok-parsed latency histogram equals the direct computation") {
    // the same histogram computed WITHOUT grok (fields derived
    // arithmetically, as the oracle does) — proves the parse chain
    // extracts exactly the synthesized values.
    val direct = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error")
      .select((lit(200) + (col("user_id") % 3) * 100).cast("int").as("status"),
        ((col("event_id") % 10) * 1000 + col("event_id") % 1000).as("millis"))
      .groupBy(col("status"),
        expr(s"millis div ${QueriesAnalytics.LatencyBucketMs}").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min("millis").as("min_ms"), max("millis").as("max_ms"))
    val parsed = Queries.all("q64_latency_hist")(spark, dir)
    assert(parsed.exceptAll(direct).isEmpty && direct.exceptAll(parsed).isEmpty)
  }

  test("theilSenFromDaily: one spike day drags OLS but not the Theil-Sen median") {
    import spark.implicits._
    // flat series with a final-day spike: all six pairwise slopes are
    // {0,0,0,30,45,90} -> lower median (rank 3) = 0; OLS = 27/day
    val daily = Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 100L)).toDF("day", "c")
    val r = QueriesAnalytics.theilSenFromDaily(daily).collect()(0)
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
      r.getAs[Long]("ts_slope_milli"), r.getAs[Long]("ols_slope_milli")) ===
      ((4L, 6L, 0L, 27000L)))
  }

  test("q279 recursive buffer fold equals an independent Scala fold; both clamps fire") {
    val rows = Queries.all("q279_sql_backlog")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.map(_._1).sameElements(rows.map(_._1).sorted))
    val (cap, buf) = (rows.head._3, rows.head._4)
    // recompute the corpus-derived scalars INDEPENDENTLY from the
    // weekly n_events column (the text IS the oracle, so a wrong
    // in-SQL cap/buf derivation would pass both engines — this is the
    // only check that can catch it): cap = floor(mean weekly n),
    // buf = floor(half the mean), both through DOUBLE like the text
    val weeklyN = rows.map(_._2)
    assert(cap == math.floor(weeklyN.sum.toDouble / weeklyN.size).toLong,
      s"capacity $cap != floor(mean weekly volume) recomputed from n_events")
    assert(buf == math.floor(weeklyN.sum.toDouble / (2 * weeklyN.size)).toLong,
      s"buffer $buf != floor(half mean weekly volume) recomputed from n_events")
    assert(buf < cap, "buffer must be tighter than capacity or the cap clamp is vacuous")
    // independent reimplementation of the two-sided fold:
    // backlog_w = min(buf, max(0, prev + n - c)), dropped = the excess
    var prev = 0L
    rows.foreach { case (w, n, c, b, gotBacklog, gotDropped) =>
      assert(c == cap && b == buf, s"corpus-derived scalars must be constant (week $w)")
      val unclamped = math.max(0L, prev + n - cap)
      prev = math.min(buf, unclamped)
      assert(gotBacklog == prev, s"backlog mismatch week $w: got $gotBacklog expected $prev")
      assert(gotDropped == math.max(0L, unclamped - buf),
        s"dropped mismatch week $w: got $gotDropped")
    }
    // the fixture must exercise BOTH nonlinearities — the double
    // reflection is what makes this non-window-expressible
    assert(rows.exists(_._6 > 0L), "buffer cap never overflowed - upper clamp vacuous")
    assert(rows.exists(r => r._5 == 0L && r._2 < cap),
      "backlog never drained to the zero boundary - lower clamp vacuous")
    // the text IS the oracle (verbatim on both engines)
    assert(Queries.oracles("q279_sql_backlog") == QueriesAnalytics.SqlBacklogText)
  }

  test("q281 LATERAL LIMIT decorrelates to a rank window, never a per-row nested loop") {
    val df = Queries.all("q281_sql_lateral")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // at most 2 per nation, ordered; ties broken on custkey
    val byNation = rows.groupBy(_.getString(0))
    assert(byNation.values.forall(_.length <= 2))
    byNation.values.foreach { g =>
      val cents = g.map(_.getLong(2)).toSeq
      assert(cents == cents.sortBy(-_), s"per-nation order broken: ${g.toSeq}")
    }
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      s"LATERAL LIMIT must decorrelate to a rank window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(Queries.oracles("q281_sql_lateral") == QueriesAnalytics.SqlLateralText)
  }
}
