package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** The two physical paths of SRP band-bucketing must produce identical
  * buckets: the literal-codegen [[Similarity.srpBandKeys]] (battery
  * fixtures, bands × planes ≤ the codegen ceiling) and the data-driven
  * [[Similarity.srpBandBuckets]] (derived band counts past it — plane
  * signs as a broadcast frame, the oracle's own shape). Both bottom
  * out in the same md5-parity [[Similarity.planeSign]] doubles folded
  * by the same codegen dot kernel, so the sign decisions are
  * bit-identical by construction; this spec pins it on real fixture
  * vectors across several (bands, planes) points, including one past
  * the ceiling.
  */
class SrpBandPathSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def bucketsVia(e: org.apache.spark.sql.DataFrame, bands: Int,
                         planes: Int, literal: Boolean): Set[(Long, Long)] = {
    val df = if (literal)
      e.withColumn("__b",
          Similarity.srpBandKeys(col("v"), bands, planes, Similarity.EmbedDims))
        .select(col("vec_id"), explode_outer(col("__b")).as("bucket"))
    else Similarity.srpBandBuckets(e, "vec_id", "v", bands, planes,
      Similarity.EmbedDims)
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("literal and frame band-bucket paths agree on fixture vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .limit(100).localCheckpoint()
    for ((bands, planes) <- Seq((4, 5), (11, 7), (30, 5))) {
      val lit0 = bucketsVia(e, bands, planes, literal = true)
      val frame = bucketsVia(e, bands, planes, literal = false)
      assert(lit0 == frame, s"paths diverge at bands=$bands planes=$planes")
      assert(lit0.size == 100 * bands)
    }
    // one point PAST the codegen ceiling: the frame path must stand
    // alone there (the literal path cannot compile at this width, the
    // measured round-14 failure) — sanity: right cardinality, every
    // bucket inside its band's key space
    val bands = 60; val planes = 9
    assert(bands * planes > Similarity.BandKeyMaxCodegenPlanes)
    val big = Similarity.srpBandBuckets(e, "vec_id", "v", bands, planes,
        Similarity.EmbedDims)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(big.length == 100 * bands)
    assert(big.forall { case (_, b) =>
      val band = b >> planes
      band >= 0 && band < bands && (b - (band << planes)) < (1L << planes)
    })
  }
}
