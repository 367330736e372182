package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.CmsAggregator

/** Count-Min sketch invariants: the counter grid is identical under
  * any partitioning (linear merge), the sketch of a union is the
  * elementwise sum of the parts' sketches (the incremental-
  * maintenance identity), and point estimates are one-sided
  * (`est ≥ exact` for every key) and within the εN envelope on a
  * skewed corpus.
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val D = 4
  private val W = 64

  private def sketch(hs: Seq[Long], parts: Int): Seq[Long] = {
    import spark.implicits._
    spark.createDataset(hs).repartition(parts)
      .agg(udaf(new CmsAggregator(D, W), Encoders.scalaLong)(col("value")))
      .collect()(0).getSeq[Long](0).toSeq
  }

  private def estimate(c: Seq[Long], h: Long): Long =
    (0 until D).map(i => c(i * W + CmsAggregator.bucket(i, h, W))).min

  // Zipf-ish skew: key k occurs ~ N/k times
  private def corpus(seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    val keys = Seq.fill(200)(rnd.nextLong() & 0xFFFFFFFFL)
    keys.zipWithIndex.flatMap { case (h, i) => Seq.fill(400 / (i + 1) + 1)(h) }
  }

  test("counter grid identical under any partitioning; total mass = d*n") {
    val hs = corpus(7L)
    val ref = sketch(hs, 1)
    for (parts <- Seq(4, 13)) assert(sketch(hs, parts) === ref, s"parts=$parts")
    assert(ref.length == D * W && ref.sum == D.toLong * hs.length)
  }

  test("sketch of union = elementwise sum of sketches (incremental identity)") {
    val a = corpus(8L)
    val b = corpus(9L)
    val sum = sketch(a, 4).zip(sketch(b, 4)).map { case (x, y) => x + y }
    assert(sum === sketch(a ++ b, 4))
  }

  test("estimates are one-sided and inside the eps*N envelope") {
    val hs = corpus(10L)
    val c = sketch(hs, 4)
    val exact = hs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = hs.length.toLong
    // Markov bound per row: overshoot > 2N/W with prob < 1/2; with
    // d=4 independent rows the planted corpus sits far inside. Check
    // EVERY key for one-sidedness, the envelope with full margin.
    exact.foreach { case (h, cnt) =>
      val est = estimate(c, h)
      assert(est >= cnt, s"CMS under-counted $h: $est < $cnt")
      assert(est - cnt <= 2L * n * 2 / W, s"overshoot ${est - cnt} for $h")
    }
  }
}
