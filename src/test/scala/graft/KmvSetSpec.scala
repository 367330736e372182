package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.KmvSetAggregator

/** KMV set algebra: the kept set IS the k smallest distinct hashes
  * under any partitioning, the union-of-sketches identity that q100's
  * composition rests on, and the intersection-estimate error envelope
  * on planted-overlap sets.
  */
class KmvSetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val K = 64

  private def sketch(hs: Seq[Long], parts: Int): Seq[Long] = {
    import spark.implicits._
    spark.createDataset(hs).repartition(parts)
      .agg(udaf(new KmvSetAggregator(K), Encoders.scalaLong)(col("value")))
      .collect()(0).getSeq[Long](0).toSeq
  }

  test("kept set = k smallest distinct hashes, sorted, any partitioning") {
    val rnd = new scala.util.Random(100L)
    val hs = Seq.fill(3000)(rnd.nextLong() & 0xFFFFFFFFL)
    val expect = hs.distinct.sorted.take(K)
    for (parts <- Seq(1, 4, 13))
      assert(sketch(hs, parts) === expect, s"parts=$parts")
    // below k: exact, complete
    assert(sketch(hs.take(20), 3) === hs.take(20).distinct.sorted)
  }

  test("union of sketches = sketch of union (the q100 composition)") {
    val rnd = new scala.util.Random(101L)
    val a = Seq.fill(2000)(rnd.nextLong() & 0xFFFFFFFFL)
    val b = Seq.fill(2000)(rnd.nextLong() & 0xFFFFFFFFL)
    val sa = sketch(a, 4)
    val sb = sketch(b, 4)
    val merged = (sa ++ sb).distinct.sorted.take(K)
    assert(merged === sketch(a ++ b, 4))
  }

  test("intersection estimate lands within the k=64 envelope") {
    // planted overlap: 1000 common, 2000 unique each side, hashed by
    // the battery's portable md5 recipe (not uniform Longs — the real
    // input distribution)
    def h(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .take(4).map("%02x".format(_)).mkString, 16)
    val common = (1 to 1000).map(i => h(s"c$i"))
    val a = common ++ (1 to 2000).map(i => h(s"a$i"))
    val b = common ++ (1 to 2000).map(i => h(s"b$i"))
    val sa = sketch(a, 4)
    val sb = sketch(b, 4)
    val u = (sa ++ sb).distinct.sorted.take(K)
    val theta = u.last
    val estU = (K - 1).toDouble * 4294967296.0 / theta
    val m = sa.toSet.intersect(sb.toSet).count(_ <= theta)
    val estI = m.toDouble / u.size * estU
    // relative error ~ 1/sqrt(k) ≈ 12.5%; fixed seed, wide margin
    assert(math.abs(estI - 1000) / 1000 < 0.5, s"est $estI vs 1000")
    assert(math.abs(estU - 5000) / 5000 < 0.3, s"est $estU vs 5000")
  }
}
