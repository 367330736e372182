package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.layout.{Hilbert, ZOrder}
import graft.operators.GlobalRank

/** Layout-curve comparison: Hilbert files must carry TIGHTER min/max
  * envelopes than Z-order files on the same data and file count — the
  * property that buys extra file skipping for 2-D box predicates.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Bits = 8 // 256 x 256 grid
  // deliberately NOT a power of two: aligned power-of-4 ranges tile
  // exact squares under BOTH curves; real file counts are not aligned
  private val Files = 48

  // full uniform grid — every cell once, so envelopes measure the
  // curve, not the data distribution
  private def grid: DataFrame =
    spark.range(0, 1L << (2 * Bits), 1, 8)
      .select(col("id"),
        (col("id") % (1L << Bits)).as("u"),
        expr(s"id div ${1L << Bits}").as("v"))

  private def envelopes(keyed: DataFrame): Array[(Long, Long, Long, Long)] =
    GlobalRank.withNtile(keyed, Seq(col("k"), col("id")), Files, "file_id")
      .groupBy("file_id")
      .agg(min("u").as("mu"), max("u").as("xu"),
        min("v").as("mv"), max("v").as("xv"))
      .collect()
      .map(r => (r.getAs[Long]("mu"), r.getAs[Long]("xu"),
        r.getAs[Long]("mv"), r.getAs[Long]("xv")))

  private def area(env: Array[(Long, Long, Long, Long)]): Long =
    env.map { case (mu, xu, mv, xv) => (xu - mu + 1) * (xv - mv + 1) }.sum

  test("hilbert kernel matches a reference recursive definition on corners and samples") {
    // exhaustive 2-bit curve: the canonical 4x4 Hilbert walk
    val d2 = for (y <- 0 to 3; x <- 0 to 3) yield Hilbert.xy2d(2, x, y)
    assert(d2.toSet == (0 to 15).toSet, "2-bit walk must be a bijection")
    // adjacency: consecutive d differ by one grid step
    val byD = (for (y <- 0 to 3; x <- 0 to 3)
      yield (Hilbert.xy2d(2, x, y), (x, y))).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"non-adjacent step ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
    // exact bijection on the full 5-bit grid as well
    val seen = (for (y <- 0 until 32; x <- 0 until 32)
      yield Hilbert.xy2d(5, x, y)).toSet
    assert(seen == (0 until 1024).map(_.toLong).toSet,
      "5-bit walk must be a bijection onto 0..1023")
  }

  test("hilbert file envelopes are tighter than z-order at a non-aligned file count") {
    val hArea = area(envelopes(
      grid.withColumn("k", Hilbert.hValue(col("u"), col("v"), Bits))))
    val zArea = area(envelopes(
      grid.withColumn("k", ZOrder.zValue(Seq(col("u"), col("v")), Bits))))
    // the full grid is 65536 cells; sum of envelope areas measures
    // how much each file over-claims beyond its own rows
    assert(hArea < zArea,
      s"expected tighter Hilbert envelopes: hilbert=$hArea z=$zArea")
  }
}
