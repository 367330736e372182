package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Semantics and plan shape of the bucketed interval join (q46 checks
  * end-to-end numbers against DuckDB; these pin the boundary cases the
  * aggregate can mask).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  private def ts(micros: Long) = new Timestamp(micros / 1000).toInstant
    .plusNanos((micros % 1000) * 1000)

  private def mkPoints(rows: (Long, Long, Long)*) = // (pid, key, micros)
    rows.toSeq.toDF("pid", "k", "us")
      .select(col("pid"), col("k"), timestamp_micros(col("us")).as("pt"))

  private def mkIntervals(rows: (Long, Long, Long, Long)*) = // (iid, key, from, to)
    rows.toSeq.toDF("iid", "k", "us_from", "us_to")
      .select(col("iid"), col("k"),
        timestamp_micros(col("us_from")).as("ivs"),
        timestamp_micros(col("us_to")).as("ive"))

  test("half-open semantics: start inclusive, end exclusive; equi-key isolates") {
    val points = mkPoints((1L, 7L, 1000L), (2L, 7L, 2000L), (3L, 7L, 999L), (4L, 8L, 1500L))
    val intervals = mkIntervals((10L, 7L, 1000L, 2000L))
    val out = RangeJoin.intervalJoin(points, "pt", intervals, "ivs", "ive",
        bucketMicros = 500L, equiKeys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // pid 1 at start: in; pid 2 at end: out; pid 3 before: out; pid 4 wrong key: out
    assert(out === Set((1L, 10L)))
  }

  test("interval spanning many buckets matches each point exactly once") {
    val points = mkPoints((1L, 1L, 5000L), (2L, 1L, 9999L))
    val intervals = mkIntervals((10L, 1L, 0L, 10000L)) // spans 100 buckets of 100us
    val out = RangeJoin.intervalJoin(points, "pt", intervals, "ivs", "ive",
        bucketMicros = 100L, equiKeys = Seq("k"))
      .groupBy("pid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("no equi-keys still works (pure range predicate)") {
    val points = mkPoints((1L, 0L, 150L), (2L, 0L, 350L)).drop("k")
    val intervals = mkIntervals((10L, 0L, 100L, 200L), (11L, 0L, 300L, 400L)).drop("k")
    val out = RangeJoin.intervalJoin(points, "pt", intervals, "ivs", "ive", 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 11L)))
  }

  test("degenerate interval (end <= start) matches nothing instead of exploding") {
    val points = mkPoints((1L, 1L, 1000L))
    val intervals = mkIntervals((10L, 1L, 1000L, 1000L), (11L, 1L, 90000000L, 1000L))
    val out = RangeJoin.intervalJoin(points, "pt", intervals, "ivs", "ive",
      bucketMicros = 100L, equiKeys = Seq("k"))
    assert(out.count() === 0L) // and the inverted row exploded onto 0 buckets, not 900k
  }

  private def mkIv(cols: (String, String, String), rows: (Long, Long, Long, Long)*) =
    rows.toSeq.toDF(cols._1, "k0", cols._2, cols._3)
      .withColumnRenamed("k0", "k")

  test("overlap join equals the naive overlap predicate, duplicate-free") {
    // intervals straddle many buckets so every pair meets in SEVERAL
    // buckets — the ownership rule must collapse each to exactly one
    val a = mkIv(("aid", "as", "ae"),
      (1L, 1L, 0L, 1000L), (2L, 1L, 950L, 2000L), (3L, 1L, 5000L, 5001L),
      (4L, 2L, 0L, 10000L))
    val b = mkIv(("bid", "bs", "be"),
      (10L, 1L, 500L, 1500L), (11L, 1L, 999L, 1000L), (12L, 1L, 1000L, 1001L),
      (13L, 2L, 9999L, 20000L), (14L, 2L, 10000L, 10001L))
    val got = RangeJoin.overlapJoin(a, "as", "ae", b, "bs", "be",
        bucketWidth = 100L, equiKeys = Seq("k"))
      .select("aid", "bid").as[(Long, Long)].collect().toList
    val naive = a.join(b.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("as") < col("be") && col("bs") < col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got.size === got.toSet.size, s"duplicates in $got")
    assert(got.toSet === naive)
    // spot-check half-open edges: [0,1000) vs [999,1000) overlaps at
    // 999; vs [1000,1001) does not (end exclusive); cross-key never
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (2L, 12L), (4L, 13L)))
  }

  test("overlap join drops degenerate intervals on both sides") {
    val a = mkIv(("aid", "as", "ae"), (1L, 1L, 0L, 100L), (2L, 1L, 50L, 50L))
    val b = mkIv(("bid", "bs", "be"), (10L, 1L, 0L, 100L), (11L, 1L, 60L, 10L))
    val got = RangeJoin.overlapJoin(a, "as", "ae", b, "bs", "be", 10L, Seq("k"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("overlap join plans as an equi-join on the bucket, never a nested loop") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id"),
        col("ts_ms").as("vs"), (col("ts_ms") + 1800000L).as("ve"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid2"),
        col("ts_ms").as("ps"), (col("ts_ms") + 600000L).as("pe"))
    val df = RangeJoin.overlapJoin(views.drop("user_id"), "vs", "ve",
      buys, "ps", "pe", bucketWidth = 900000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"overlap join must decompose to an equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("plan is an equi-join on the bucket, never a nested loop") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts_t").as("c_ts"),
        timestamp_micros(unix_micros(col("ts_t")) + 300000000L).as("c_end"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_t").as("p_ts"))
    val df = RangeJoin.intervalJoin(buys, "p_ts", clicks, "c_ts", "c_end",
      300000000L, Seq("user_id"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join must decompose to an equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }
}
