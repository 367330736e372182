package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.MgAggregator

/** Misra–Gries heavy-hitter summary: the containment guarantee (every
  * key above n/(k+1) survives) under partitioned/merged execution, the
  * bounded state size, and the candidate→exact-recount composition
  * that q92 ships.
  */
class MgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  /** Zipf-ish stream: key i appears ~N/i times, shuffled. */
  private def zipf(nKeys: Int, scale: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((1 to nKeys).flatMap(i => Seq.fill(scale / i)(i.toLong)))
  }

  test("every key above n/(k+1) is in the summary, for any partitioning") {
    import spark.implicits._
    val k = 16
    for (seed <- 1L to 3L; parts <- Seq(1, 4, 13)) {
      val stream = zipf(200, 2000, seed)
      val n = stream.size
      val truth = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mustKeep = truth.collect { case (key, c) if c.toLong * (k + 1) > n => key }.toSet
      val got = spark.createDataset(stream).repartition(parts)
        .agg(udaf(new MgAggregator(k), Encoders.scalaLong)(col("value")))
        .collect()(0).getSeq[Long](0).toSet
      assert(got.size <= k, s"summary exceeded $k counters: ${got.size}")
      assert(mustKeep.subsetOf(got),
        s"lost heavy keys ${mustKeep -- got} (seed=$seed parts=$parts)")
    }
  }

  test("reduce is MG: full table decrements instead of evicting arbitrarily") {
    val agg = new MgAggregator(2)
    var b = agg.zero
    Seq(1L, 1L, 1L, 2L, 3L).foreach { x => b = agg.reduce(b, x) }
    // table [1->3, 2->1]; the 3 decrements both: [1->2]
    assert(agg.finish(b).toSeq === Seq(1L))
  }

  test("merge subtracts the (k+1)-th largest, keeping at most k keys") {
    val agg = new MgAggregator(2)
    var a = agg.zero
    Seq(1L, 1L, 1L, 2L, 2L).foreach { x => a = agg.reduce(a, x) }
    var b = agg.zero
    Seq(3L, 3L, 3L, 3L, 2L).foreach { x => b = agg.reduce(b, x) }
    // combined [1->3, 2->3, 3->4]: cut = 3rd largest = 3 → survivors {3}
    assert(agg.finish(agg.merge(a, b)).toSeq === Seq(3L))
  }

  test("candidate + exact recount equals the exact groupBy (the q92 shape)") {
    import spark.implicits._
    val stream = zipf(500, 5000, 7L)
    val n = stream.size.toLong
    val hhK = 32
    val ev = spark.createDataset(stream).toDF("k").repartition(8)
    val cands = ev.agg(
        udaf(new MgAggregator(64), Encoders.scalaLong)(col("k")).as("cand"),
        count(lit(1)).as("n"))
      .select(explode(col("cand")).as("k"), col("n"))
    val got = ev.join(broadcast(cands), "k")
      .groupBy(col("k"), col("n")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * hhK > col("n"))
      .select("k", "cnt").as[(Long, Long)].collect().toMap
    val expect = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * hhK > n }
    assert(got === expect)
  }
}
