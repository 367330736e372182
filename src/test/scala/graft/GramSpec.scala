package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.GramAggregator

/** Gram sketch invariants: buffer layout positions address the right
  * moments, the distributed reduce matches a straight single-threaded
  * fold under any partitioning (exact integers — no tolerance), and
  * the derived Pearson correlation recovers planted structure.
  */
class GramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val D = 4
  private val Scale = 1e6

  private def gram(vs: Seq[Seq[Float]], parts: Int): Array[Long] = {
    import spark.implicits._
    spark.createDataset(vs).repartition(parts)
      .agg(udaf(new GramAggregator(D, Scale),
        ExpressionEncoder[Seq[Float]]())(col("value")))
      .collect()(0).getSeq[Long](0).toArray
  }

  private def reference(vs: Seq[Seq[Float]]): Array[Long] = {
    val b = new Array[Long](1 + D + D * (D + 1) / 2)
    vs.foreach { v =>
      val q = v.map(x => math.floor(x.toDouble * Scale).toLong)
      b(0) += 1
      var k = 1 + D
      for (i <- 0 until D) {
        b(1 + i) += q(i)
        for (j <- i until D) { b(k) += q(i) * q(j); k += 1 }
      }
    }
    b
  }

  private val rnd = new scala.util.Random(7L)
  private val vs: Seq[Seq[Float]] =
    Seq.fill(500)(Seq.fill(D)(rnd.nextFloat() * 2f - 1f))

  test("distributed reduce = single-threaded fold, any partitioning") {
    val expect = reference(vs)
    for (parts <- Seq(1, 4, 11))
      assert(gram(vs, parts).toSeq === expect.toSeq, s"parts=$parts")
  }

  test("position helpers address count / sums / products correctly") {
    val g = reference(vs)
    assert(g(0) === 500L)
    // spot-check via a tiny hand case: two vectors
    val two = Seq(Seq(1f, 0f, -1f, 0.5f), Seq(0f, 1f, 1f, 0.25f))
    val t = reference(two)
    assert(t(GramAggregator.sumPos(0) - 1) === 1000000L)
    assert(t(GramAggregator.sumPos(2) - 1) === 0L)
    // prod(0,2) = 1*(−1) + 0*1 = −1e12
    assert(t(GramAggregator.prodPos(D, 0, 2) - 1) === -1000000000000L)
    // prod(3,3) = 0.5² + 0.25² = 0.3125e12
    assert(t(GramAggregator.prodPos(D, 3, 3) - 1) === 312500000000L)
    // every triangle slot is addressed exactly once, in range
    val pos = (for { i <- 0 until D; j <- i until D }
      yield GramAggregator.prodPos(D, i, j))
    assert(pos.distinct.length === pos.length)
    assert(pos.min === 1 + D + 1 && pos.max === t.length)
  }

  test("derived correlation recovers planted structure") {
    // dim1 = dim0 (corr +1), dim2 = −dim0 (corr −1), dim3 independent
    val planted: Seq[Seq[Float]] = Seq.fill(200) {
      val x = rnd.nextFloat() * 2f - 1f
      Seq(x, x, -x, rnd.nextFloat() * 2f - 1f)
    }
    val g = reference(planted)
    def corr(i: Int, j: Int): Double = {
      val n = BigInt(g(0))
      val si = BigInt(g(GramAggregator.sumPos(i) - 1))
      val sj = BigInt(g(GramAggregator.sumPos(j) - 1))
      val pij = BigInt(g(GramAggregator.prodPos(D, i, j) - 1))
      val pii = BigInt(g(GramAggregator.prodPos(D, i, i) - 1))
      val pjj = BigInt(g(GramAggregator.prodPos(D, j, j) - 1))
      val cov = (n * pij - si * sj).toDouble
      cov / math.sqrt((n * pii - si * si).toDouble * (n * pjj - sj * sj).toDouble)
    }
    assert(math.abs(corr(0, 1) - 1.0) < 1e-9)
    // negation is not floor-symmetric (⌊−x⌋ = −⌈x⌉), so the mirrored
    // dim agrees only to quantization resolution, not bit-exactly
    assert(math.abs(corr(0, 2) + 1.0) < 1e-4)
    assert(math.abs(corr(0, 3)) < 0.2) // independent: near zero
  }
}
