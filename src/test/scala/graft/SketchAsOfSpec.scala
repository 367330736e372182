package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
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
}
