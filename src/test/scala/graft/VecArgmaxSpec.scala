package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** The projected IVF assignment (round-15: [[graft.sim.VectorArgmaxCos]]
  * — scan + projection, no join/aggregate/exchange) must be
  * ASSIGNMENT-IDENTICAL to the broadcast-argmax it replaces: same
  * cosine arithmetic (the VectorCosine fold verbatim), same tie-break
  * (equal cosines → smallest c_id), and the same ordering corners
  * Spark's max_by uses — NaN greater than any number, −0.0 equal to
  * 0.0. Battery oracles (q29/q288/q290, the index stores) ride on
  * this identity.
  */
class VecArgmaxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def assignMap(df: DataFrame): Map[Long, Long] =
    df.select(col("vec_id"), col("list_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("projected path == join path on the corpus fixture") {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val cents = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
      .localCheckpoint()
    assert(lists <= Similarity.IvfAssignMaxProjectedCents) // projected engages
    val projected = assignMap(Similarity.ivfAssign(e, cents))
    val joined = assignMap(Similarity.ivfAssignJoined(e, cents))
    assert(projected.nonEmpty && projected == joined)
  }

  test("ordering corners: ties -> smallest c_id, NaN greatest, -0.0 == 0.0 (both paths agree)") {
    import spark.implicits._
    // vec [1,0,0,0]:
    //   c0 [0,1,0,0] -> cos 0.0 ; c1 [0,2,0,0] -> cos 0.0 (exact tie)
    //   c2 [0,-1,0,0] -> cos -0.0 (ties 0.0 under IEEE ==)
    // winner must be c0 (smallest id among the tied maximum)
    val vecs = Seq((10L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "vec")
    val tied = Seq(
      (0L, Seq(0.0, 1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 2.0, 0.0, 0.0)),
      (2L, Seq(0.0, -1.0, 0.0, 0.0))).toDF("c_id", "c_vec").localCheckpoint()
    assert(assignMap(Similarity.ivfAssign(vecs, tied)) == Map(10L -> 0L))
    assert(assignMap(Similarity.ivfAssignJoined(vecs, tied)) == Map(10L -> 0L))

    // a zero-norm centroid scores NaN against everything, and Spark's
    // double ordering puts NaN ABOVE every number — both paths must
    // agree on that (degenerate, but the parity must not silently
    // diverge on it)
    val withNan = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (7L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("c_id", "c_vec").localCheckpoint()
    assert(assignMap(Similarity.ivfAssign(vecs, withNan)) == Map(10L -> 7L))
    assert(assignMap(Similarity.ivfAssignJoined(vecs, withNan)) == Map(10L -> 7L))

    // two NaNs tie -> smallest id
    val twoNan = Seq(
      (3L, Seq(0.0, 0.0, 0.0, 0.0)),
      (8L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("c_id", "c_vec").localCheckpoint()
    assert(assignMap(Similarity.ivfAssign(vecs, twoNan)) == Map(10L -> 3L))
    assert(assignMap(Similarity.ivfAssignJoined(vecs, twoNan)) == Map(10L -> 3L))
  }

  test("kernel plan is a pure projection: no join, no exchange, whole-stage codegen") {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
      .localCheckpoint()
    val df = Similarity.ivfAssign(e, cents)
    // CODEGEN_ONLY: a janino failure in the kernel must FAIL here, not
    // silently fall back to interpreted eval (the round-15 ternary
    // misparse did exactly that and the plan string was blind to it)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try df.queryExecution.toRdd.count(): Unit
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join") && !p.contains("Exchange") && !p.contains("Aggregate"), p)
    // the argmax runs inside whole-stage codegen (AQE renders spans as "*(n)")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("vec_argmax_cos")), p)
  }
}
