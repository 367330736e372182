package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** q80 learned IVF: the Lloyd-refined coarse quantizer must beat the
  * first-K-vectors seed quantizer on probe recall — measured on
  * queries OUTSIDE the seed range. (Seed-range queries are a rigged
  * benchmark for the degenerate quantizer: a query that IS a seed
  * vector sits at the exact center of its own list, so its neighbors
  * land there with inflated probability. The battery's q29/q80 share
  * the `vec_id < 10` query set for oracle comparability; the recall
  * claim is evaluated on a fair query draw.)
  */
class IvfLearnedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[8]", "8")
  private val dir = "/root/testdata/sf0.001"
  private val Probes = 2
  private val K = 5

  private def assignTo(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("vec"), col("c_id")),
        struct(col("ccos"), (-col("c_id")).as("n"))).as("b"))
      .select(col("vec_id"), col("b.vec").as("vec"), col("b.c_id").as("list_id"))

  test("Lloyd-learned quantizer recall >= fixed-seed quantizer on non-seed queries") {
    val lists = ScaleParams.ivfLists(ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val truth = Similarity.knnBrute(q, e, K).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("vec_id")).toSet }

    def recall(cents: DataFrame): Double = {
      val assign = assignTo(e, cents)
      val pw = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id"))
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("ccos", Similarity.cosine(col("q_vec"), col("c_vec")))
        .withColumn("crk", row_number().over(pw)).filter(col("crk") <= Probes)
        .select(col("q_id"), col("q_vec"), col("c_id").as("list_id"))
      val rw = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      val got = broadcast(probes).join(assign, "list_id")
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("cos", Similarity.cosine(col("q_vec"), col("vec")))
        .withColumn("rank", row_number().over(rw)).filter(col("rank") <= K)
        .collect().groupBy(_.getAs[Long]("q_id"))
        .map { case (k, rs) => k -> rs.map(_.getAs[Long]("vec_id")).toSet }
      truth.map { case (k, t) =>
        got.getOrElse(k, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }

    val seed = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    // the same 2-iteration Lloyd refinement q80 runs (rounded means —
    // the oracle-parity contract)
    var cents: DataFrame = seed
    for (_ <- 1 to 2) {
      cents = assignTo(e, cents)
        .select(col("list_id"), posexplode(col("vec")))
        .groupBy(col("list_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c_vec"))
        .select(col("list_id").as("c_id"), col("c_vec"))
    }
    val learned = graft.dedup.Dedup.materialize(cents)
    val (rSeed, rLearned) = (recall(seed), recall(learned))
    info(f"recall@$K probes=$Probes: seed=$rSeed%.3f learned=$rLearned%.3f")
    assert(rLearned >= rSeed,
      f"learned quantizer recall $rLearned%.3f < fixed-seed $rSeed%.3f")
  }
}
