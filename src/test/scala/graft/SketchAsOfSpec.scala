package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Scd2}
import graft.sketch.Sketches

/** Unit properties for the KMV sketch and the as-of join (oracle
  * battery q41/q42 checks end-to-end numbers).
  */
class SketchAsOfSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  test("kmv: below k the sketch is exact; above k the estimate lands within ~3/sqrt(k)") {
    val k = 64
    val df = spark.range(10000).select(
      when(col("id") % 2 === 0, lit("big")).otherwise(lit("small")).as("grp"),
      // big: 5000 distinct values; small: 20 distinct values
      when(col("id") % 2 === 0, col("id")).otherwise(col("id") % 40).as("v"))
    val sk = Sketches.kmvSketch(df, Seq("grp"), col("v"), k)
      .withColumn("est", Sketches.kmvEstimate(col("hk"), col("got"), k))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(sk("small") === ((20L, 20.0))) // got < k: exact
    val (got, est) = sk("big")
    assert(got === k.toLong)
    val err = math.abs(est - 5000.0) / 5000.0
    assert(err < 3.0 / math.sqrt(k), s"estimate $est off by $err") // ~0.375 bound
  }

  test("kmv: deterministic across invocations (portable md5 hashes)") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val a = Sketches.kmvSketch(ev, Seq("event_type"), col("user_id"), 16).collect().toSet
    val b = Sketches.kmvSketch(ev, Seq("event_type"), col("user_id"), 16).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("asOf: facts pick the version in effect at their timestamp") {
    val facts = Seq((1L, 10L, 50L), (2L, 10L, 150L), (3L, 10L, 250L), (4L, 99L, 100L))
      .toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 0L), (10L, "v2", 100L), (10L, "v3", 200L))
      .toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOf(facts, dims, Seq("key"), "vfrom", "ts")
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "v1", 2L -> "v2", 3L -> "v3", 4L -> null))
  }

  test("asOf: boundary timestamp belongs to the NEW version (half-open intervals)") {
    val facts = Seq((1L, 10L, 100L)).toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 0L), (10L, "v2", 100L)).toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOf(facts, dims, Seq("key"), "vfrom", "ts").select("name").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("v2"))
  }

  test("asOf: fact before every version gets null payload; no row duplication") {
    val facts = Seq((1L, 10L, -5L), (2L, 10L, 500L)).toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 0L), (10L, "v2", 100L)).toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOf(facts, dims, Seq("key"), "vfrom", "ts")
    assert(out.count() === 2) // at most one interval matches any ts
    val m = out.select("event_id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> null, 2L -> "v2"))
  }

  test("kmv: stage-1 window is salted (no single-partition funnel per group)") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val df = Sketches.kmvSketch(ev, Seq("event_type"), col("user_id"), 16)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // stage 1 must shuffle on (group, salt): a low-cardinality group
    // column alone would funnel the whole corpus through one window
    // partition at scale
    assert(p.contains("salt"), s"expected salted stage-1 exchange:\n$p")
  }

  test("scd2 intervalize: half-open intervals tile each key's timeline; one current row") {
    val changes = Seq(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 200L, 3L, "c"), // same-ts tie
      (2L, 50L, 4L, "x")
    ).toDF("k", "ts", "seq", "attr")
    val out = Scd2.intervalize(changes, Seq("k"), "ts", Seq("seq"))
      .orderBy("k", "version").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    // versions dense from 1; tie broken by seq
    assert(k1.map(_.getLong(4)).toSeq === Seq(1L, 2L, 3L))
    assert(k1.map(_.getString(3)).toSeq === Seq("a", "b", "c"))
    // each version's valid_to = next version's valid_from; last is open
    assert(k1.map(r => Option(r.get(6))).toSeq === Seq(Some(200L), Some(200L), None))
    // exactly one current row per key
    val cur = out.filter(_.getInt(7) == 1).map(_.getLong(0)).toSeq
    assert(cur.sorted === Seq(1L, 2L))
  }

  test("scd2 intervalize: round-trips through the as-of join (build then consume)") {
    val changes = Seq(
      (7L, 100L, 1L, "v1"), (7L, 300L, 2L, "v2")).toDF("k", "ts", "seq", "attr")
    val dim = Scd2.intervalize(changes, Seq("k"), "ts", Seq("seq"))
      .select(col("k").as("user_id"), col("attr"), col("valid_from").as("vfrom"))
    val facts = Seq((10L, 7L, 150L), (11L, 7L, 300L), (12L, 7L, 50L))
      .toDF("event_id", "user_id", "ts_ms")
    val joined = AsOfJoin.asOf(facts, dim, Seq("user_id"), "vfrom", "ts_ms")
      .select("event_id", "attr").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(joined === Map(10L -> "v1", 11L -> "v2", 12L -> null))
  }

  test("scd2 intervalize: single distributed WindowExec (shared frame, partitioned by key)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ms"), col("event_id"))
    val df = Scd2.intervalize(ev, Seq("user_id"), "ts_ms", Seq("event_id"))
    df.collect()
    // AQE toString prints Final AND Initial plan sections — count the final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"row_number+lead must share one WindowExec:\n$p")
    // the window partitions by the key — never a global (empty-partition) sort
    assert(p.contains("hashpartitioning(user_id"), s"window must be key-partitioned:\n$p")
  }

  test("scd2 applyChanges: only-old keys untouched, only-new keys start at v1, mixed keys close and renumber") {
    val old = Seq(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), // key 1: v1 closed, v2 open
      (2L, 50L, 3L, "x")                        // key 2: v1 open, no new changes
    ).toDF("k", "ts", "seq", "attr")
    val dim = Scd2.intervalize(old, Seq("k"), "ts", Seq("seq"))
    val nw = Seq(
      (1L, 400L, 4L, "c"),                      // closes key 1's v2, becomes v3
      (3L, 10L, 5L, "n")                        // brand-new key: v1 open
    ).toDF("k", "ts", "seq", "attr")
    val out = Scd2.applyChanges(dim, nw, Seq("k"), "ts", Seq("seq"))
      .orderBy("k", "version")
      .select("k", "version", "valid_from", "valid_to", "is_current", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)), r.getInt(4), r.getString(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, Some(200L), 0, "a"),
      (1L, 2L, Some(400L), 0, "b"), // open version closed at the first new change
      (1L, 3L, None, 1, "c"),       // renumbered past the existing max
      (2L, 1L, None, 1, "x"),       // untouched: still open
      (3L, 1L, None, 1, "n")))      // only-new key starts at v1
    // and the invariant the q88 oracle pins: merge == full rebuild
    val rebuild = Scd2.intervalize(old.unionByName(nw), Seq("k"), "ts", Seq("seq"))
    val merged = Scd2.applyChanges(dim, nw, Seq("k"), "ts", Seq("seq"))
    assert(merged.select("k", "version", "valid_from", "valid_to", "is_current", "attr")
      .exceptAll(rebuild.select("k", "version", "valid_from", "valid_to", "is_current", "attr"))
      .isEmpty)
  }

  test("scd2 applyChanges: an out-of-order batch raises instead of emitting an inverted interval") {
    val dim = Scd2.intervalize(
      Seq((1L, 200L, 1L, "a")).toDF("k", "ts", "seq", "attr"), Seq("k"), "ts", Seq("seq"))
    val late = Seq((1L, 100L, 2L, "b")).toDF("k", "ts", "seq", "attr")
    val ex = intercept[Exception] {
      Scd2.applyChanges(dim, late, Seq("k"), "ts", Seq("seq")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("out-of-order")),
      s"expected the out-of-order raise, got: $ex")
  }

  test("scd2 applyChanges: a same-ts change that ties or loses on tieCols raises; a winning tie merges") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val old = Seq((1L, 200L, 5L, "a")).toDF("k", "ts", "seq", "attr")
    val dim = Scd2.intervalize(old, Seq("k"), "ts", Seq("seq"))
    // same ts, SMALLER seq: the rebuild would sort it BEFORE the open
    // version — the documented-invalid case must raise, not silently
    // diverge from the full rebuild
    val losing = Seq((1L, 200L, 3L, "b")).toDF("k", "ts", "seq", "attr")
    val exLose = intercept[Exception] {
      Scd2.applyChanges(dim, losing, Seq("k"), "ts", Seq("seq")).collect()
    }
    assert(messages(exLose).exists(_.contains("out-of-order")),
      s"expected the same-ts losing-tie raise, got: $exLose")
    // equal tie (a duplicate change) is just as unmergeable
    val dup = Seq((1L, 200L, 5L, "b")).toDF("k", "ts", "seq", "attr")
    val exDup = intercept[Exception] {
      Scd2.applyChanges(dim, dup, Seq("k"), "ts", Seq("seq")).collect()
    }
    assert(messages(exDup).exists(_.contains("out-of-order")),
      s"expected the same-ts equal-tie raise, got: $exDup")
    // same ts, LARGER seq sorts after the open version: valid, and the
    // merge still equals the full rebuild (zero-length [200,200) open
    // interval closes, last writer wins — the q88 invariant holds)
    val winning = Seq((1L, 200L, 7L, "c")).toDF("k", "ts", "seq", "attr")
    val merged = Scd2.applyChanges(dim, winning, Seq("k"), "ts", Seq("seq"))
      .select("k", "version", "valid_from", "valid_to", "is_current", "attr")
    val rebuild = Scd2.intervalize(old.unionByName(winning), Seq("k"), "ts", Seq("seq"))
      .select("k", "version", "valid_from", "valid_to", "is_current", "attr")
    assert(merged.exceptAll(rebuild).isEmpty && rebuild.exceptAll(merged).isEmpty,
      "winning-tie merge must equal the full rebuild")
  }

  test("asOf: same-timestamp versions resolve deterministically to the last writer via tieCols") {
    val dims = Seq(
      (7L, 100L, 1L, "first"), (7L, 100L, 2L, "last"), // same effective ts
      (7L, 300L, 3L, "next")
    ).toDF("user_id", "vfrom", "seq", "ver")
    val facts = Seq((10L, 7L, 100L), (11L, 7L, 250L)).toDF("event_id", "user_id", "ts_ms")
    val joined = AsOfJoin.asOf(facts, dims, Seq("user_id"), "vfrom", "ts_ms", Seq("seq"))
      .select("event_id", "ver").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the earlier tie holds the empty [100,100) interval — no fact
    // lands in it; facts at and after 100 see the last writer
    assert(joined === Map(10L -> "last", 11L -> "last"))
    // and no fact row duplicates across the tied versions
    assert(AsOfJoin.asOf(facts, dims, Seq("user_id"), "vfrom", "ts_ms", Seq("seq")).count() === 2)
  }

  test("asOf: dimension broadcasts; fact side never sort-merges") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val dims = Tables(spark, "/root/testdata/sf0.001", "customer").select(
      col("c_custkey").cast("long").as("user_id"),
      col("c_name").as("cust_ver"), lit(0L).as("vfrom"))
    val df = AsOfJoin.asOf(ev, dims, Seq("user_id"), "vfrom", "ts_ms")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast as-of:\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"interval predicate must ride the hash join as residual, not force NLJ:\n$p")
  }

  test("asOfForward: facts pick the NEXT version at-or-after their timestamp") {
    val facts = Seq((1L, 10L, 50L), (2L, 10L, 100L), (3L, 10L, 150L),
        (4L, 10L, 250L), (5L, 99L, 100L))
      .toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 100L), (10L, "v2", 200L))
      .toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOfForward(facts, dims, Seq("key"), "vfrom", "ts")
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // boundary ts == vfrom matches that version; past the last → null
    assert(out === Map(1L -> "v1", 2L -> "v1", 3L -> "v2", 4L -> null, 5L -> null))
  }

  test("asOfForward: tolerance drops matches beyond the horizon; no row duplication") {
    val facts = Seq((1L, 10L, 50L), (2L, 10L, 95L)).toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 100L)).toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOfForward(facts, dims, Seq("key"), "vfrom", "ts",
        toleranceMs = Some(10L))
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> null, 2L -> "v1"))
  }

  test("asOf: tolerance bounds the backward lookback the same way") {
    val facts = Seq((1L, 10L, 150L), (2L, 10L, 105L)).toDF("event_id", "key", "ts")
    val dims = Seq((10L, "v1", 100L)).toDF("key", "name", "vfrom")
    val out = AsOfJoin.asOf(facts, dims, Seq("key"), "vfrom", "ts",
        toleranceMs = Some(10L))
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> null, 2L -> "v1"))
  }

  test("scd2 tombstones: delete closes without opening; re-insert restarts; trailing delete leaves no current") {
    // key 1: insert(10) delete(20) insert(30)           → v1 [10,20), v2 [30,null) current
    // key 2: insert(10) insert(20) delete(30)           → v1 [10,20), v2 [20,30), NO current
    // key 3: delete(5) insert(10)                       → leading tombstone vanishes; v1 [10,null)
    // key 4: insert(10) delete(20) delete(25)           → repeated tombstone idempotent
    val ch = Seq(
      (1L, 10L, 1L, false), (1L, 20L, 2L, true), (1L, 30L, 3L, false),
      (2L, 10L, 4L, false), (2L, 20L, 5L, false), (2L, 30L, 6L, true),
      (3L, 5L, 7L, true), (3L, 10L, 8L, false),
      (4L, 10L, 9L, false), (4L, 20L, 10L, true), (4L, 25L, 11L, true))
      .toDF("k", "ts", "seq", "is_del")
    val out = Scd2.intervalizeTombstones(ch, Seq("k"), "ts", Seq("seq"), "is_del")
      .select("k", "version", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
      .toSet
    assert(out === Set(
      (1L, 1L, 10L, Some(20L), 0), (1L, 2L, 30L, None, 1),
      (2L, 1L, 10L, Some(20L), 0), (2L, 2L, 20L, Some(30L), 0),
      (3L, 1L, 10L, None, 1),
      (4L, 1L, 10L, Some(20L), 0)))
  }

  test("scd2 tombstones: as-of lookup between delete and re-insert resolves to null") {
    val ch = Seq((1L, 10L, 1L, false, "a"), (1L, 20L, 2L, true, null),
        (1L, 30L, 3L, false, "b"))
      .toDF("k", "ts", "seq", "is_del", "name")
    val dim = Scd2.intervalizeTombstones(ch, Seq("k"), "ts", Seq("seq"), "is_del")
      .select(col("k"), col("name"), col("valid_from"))
    val facts = Seq((1L, 1L, 15L), (2L, 1L, 25L), (3L, 1L, 35L))
      .toDF("event_id", "k", "fts")
    // consume through the backward as-of, bounding by the next version:
    // the deleted window [20,30) must NOT inherit version "a"
    val out = AsOfJoin.asOf(facts, dim, Seq("k"), "valid_from", "fts")
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // plain as-of over the SURVIVING versions still sees "a" at 25 —
    // the gap needs the interval's valid_to, which tombstone output
    // carries; assert the interval table itself encodes the gap
    assert(out(1L) === "a" && out(3L) === "b")
    val intervals = Scd2.intervalizeTombstones(ch, Seq("k"), "ts", Seq("seq"), "is_del")
      .filter(col("valid_from") <= 25L && (col("valid_to").isNull || col("valid_to") > 25L))
    assert(intervals.count() === 0L, "ts=25 falls in the deleted gap — no interval may cover it")
  }

  test("asOfForward: same-timestamp versions — FIRST tie in tieCols order carries the interval") {
    val facts = Seq((1L, 10L, 100L)).toDF("event_id", "key", "ts")
    val dims = Seq((10L, "a", 100L, 1L), (10L, "b", 100L, 2L))
      .toDF("key", "name", "vfrom", "seq")
    val out = AsOfJoin.asOfForward(facts, dims, Seq("key"), "vfrom", "ts",
        tieCols = Seq("seq"))
      .select("event_id", "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a"))
  }
}
