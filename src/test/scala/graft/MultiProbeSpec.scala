package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** q87 multi-probe LSH: probing the Hamming-1 neighborhood must not
  * lose recall vs single-probe (its candidate set is a strict
  * superset) and must recover boundary neighbors on the fixture —
  * measured against the brute-force truth on non-seed queries
  * (same fairness rule as [[IvfLearnedSpec]]).
  */
class MultiProbeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[8]", "8")
  private val dir = "/root/testdata/sf0.001"
  private val K = 5

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("vec_id")).toSet }

  test("multi-probe recall >= single-probe recall; superset per query") {
    val planes = ScaleParams.lshPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val dims = 64
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val truth = topSets(Similarity.knnBrute(q, e, K))
    val single = topSets(Similarity.knnLsh(q, e, K, planes, dims))
    val multi = topSets(Similarity.knnLshMultiProbe(q, e, K, planes, dims))

    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (k, t) =>
        got.getOrElse(k, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size

    val (rs, rm) = (recall(single), recall(multi))
    info(f"recall@$K: single-probe=$rs%.3f multi-probe=$rm%.3f")
    assert(rm >= rs, f"multi-probe recall $rm%.3f < single-probe $rs%.3f")

    // every true neighbor the single probe found, the multi probe keeps:
    // its candidate set is a superset, so per-query hits can only grow
    truth.keys.foreach { k =>
      val sHits = single.getOrElse(k, Set.empty[Long]).intersect(truth(k))
      val mHits = multi.getOrElse(k, Set.empty[Long]).intersect(truth(k))
      assert(sHits.subsetOf(mHits),
        s"query $k: multi-probe lost true neighbors ${sHits.diff(mHits)}")
    }
  }
}
