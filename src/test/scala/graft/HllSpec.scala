package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.HllAggregator

/** HyperLogLog sketch: register math against hand-computed values,
  * merge-order determinism (the property that makes q96
  * oracle-checkable), the standard-error envelope on a large distinct
  * stream, and the empty-group convention.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val B = 8
  private val RhoMax = 25
  private val Empty = 256L << RhoMax // every register at M=0

  private def sketch(hashes: Seq[Long], parts: Int): Long = {
    import spark.implicits._
    spark.createDataset(hashes).repartition(parts)
      .agg(udaf(new HllAggregator(B), Encoders.scalaLong)(col("value")))
      .collect()(0).getLong(0)
  }

  test("register math matches hand computation") {
    // h=0: reg 0, w=0 -> rho 25 (term 1); h=1: reg 0, w=1 -> rho 24
    // (term 2); the register keeps the MAX rho -> term 1 survives
    assert(sketch(Seq(0L), 1) === 1L + 255L * (1L << RhoMax))
    assert(sketch(Seq(1L), 1) === 2L + 255L * (1L << RhoMax))
    assert(sketch(Seq(0L, 1L), 1) === 1L + 255L * (1L << RhoMax))
    // top remainder bit set -> rho 1 -> term 2^24; distinct registers add
    val h2 = (3L << 24) | (1L << 23) // reg 3, w has bitlen 24 -> rho 1
    assert(sketch(Seq(0L, h2), 1) ===
      1L + (1L << (RhoMax - 1)) + 254L * (1L << RhoMax))
  }

  test("K is identical under any partitioning and duplication") {
    import spark.implicits._
    val rnd = new scala.util.Random(8L)
    val hashes = Seq.fill(5000)(rnd.nextLong() & 0xFFFFFFFFL)
    val dup = hashes ++ hashes.take(1234) // idempotent under re-inserts
    val ks = for (p <- Seq(1, 4, 13); hs <- Seq(hashes, dup))
      yield sketch(hs, p)
    assert(ks.toSet.size === 1, s"merge order changed the sketch: $ks")
  }

  test("estimate within the b=8 error envelope on 20k distinct keys") {
    import spark.implicits._
    val n = 20000
    val k = spark.range(n.toLong)
      .select(graft.dedup.Dedup.hash32(col("id").cast("string"), "hllspec").as("h"))
      .agg(udaf(new HllAggregator(B), Encoders.scalaLong)(col("h")))
      .collect()(0).getLong(0)
    val est = HllAggregator.alphaNum(B) / k
    // standard error 1.04/sqrt(256) ~ 6.5%; 4 sigma for a fixed seed
    assert(math.abs(est - n) / n < 0.26, s"estimate $est vs exact $n")
  }

  test("empty input keeps the all-zero-register convention") {
    assert(new HllAggregator(B).finish(Array.emptyLongArray) === Empty)
    assert(sketch(Seq.empty, 1) === Empty)
  }
}
