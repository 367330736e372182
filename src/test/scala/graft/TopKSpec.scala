package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.TopKAggregator

/** Bounded top-k aggregator: equivalence with the full sort under any
  * partitioning, the (v DESC, id ASC) tie contract, duplicate
  * handling, and groups smaller than k.
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def brute(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    rows.sortBy { case (v, id) => (-v, id) }.take(k)

  test("matches the full sort on random data, any partitioning, any k") {
    import spark.implicits._
    val rnd = new scala.util.Random(97L)
    // small value domain forces ties; duplicate (v, id) pairs included
    val rows = Seq.fill(800)((rnd.nextInt(40).toLong, rnd.nextInt(300).toLong))
    for (k <- Seq(1, 3, 17); parts <- Seq(1, 4, 13)) {
      val got = spark.createDataset(rows).repartition(parts)
        .agg(udaf(new TopKAggregator(k),
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(col("_1"), col("_2")))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got === brute(rows, k), s"mismatch at k=$k parts=$parts")
    }
  }

  test("reduce keeps order and bound as items arrive in adversarial order") {
    val agg = new TopKAggregator(3)
    var b = agg.zero
    // ascending arrival (worst case: every item displaces), then ties
    Seq((1L, 9L), (2L, 8L), (3L, 7L), (4L, 6L), (4L, 1L), (4L, 6L))
      .foreach { x => b = agg.reduce(b, x) }
    // top-3 of {1/9, 2/8, 3/7, 4/6, 4/1, 4/6}: 4/1, then the two 4/6 dups
    assert(agg.finish(b) === Seq((4L, 1L), (4L, 6L), (4L, 6L)))
  }

  test("groups smaller than k return all rows, merge with empty is identity") {
    val agg = new TopKAggregator(5)
    val b = agg.reduce(agg.zero, (7L, 1L))
    assert(agg.finish(agg.merge(b, agg.zero)) === Seq((7L, 1L)))
    assert(agg.finish(agg.merge(agg.zero, b)) === Seq((7L, 1L)))
    assert(agg.finish(agg.zero) === Seq.empty)
  }
}
