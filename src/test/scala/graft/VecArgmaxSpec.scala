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

  test("vec_top2_cos: winner/value/runner-up match the brute reference on the fixture") {
    // the round-16 struct kernel must agree with (a) vec_argmax_cos on
    // the winning index, (b) vec_cosine against the winner BIT-EXACTLY
    // (c is emitted from the same fold), and (c) a window-rank top-2 on
    // the runner-up value
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val centsDf = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
      .localCheckpoint()
    val Some((ids, mat)) = graft.sim.Similarity.collectedMat(centsDf, "c_id", "c_vec")
    val t = graft.functions.vec_top2_cos(col("vec"), typedLit(mat))
    val got = e.select(col("vec_id"), t.as("__t"))
      .select(col("vec_id"), col("__t").getField("i").as("i"),
        col("__t").getField("c").as("c"), col("__t").getField("c2").as("c2"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // reference: rank every (vec, cent) cosine, take top-2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("c_id"))
    val ref = e.crossJoin(broadcast(centsDf))
      .withColumn("cs", graft.sim.Similarity.cosine(col("vec"), col("c_vec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) ->
        (r.getAs[Long]("c_id"), r.getAs[Double]("cs"))).toMap
    assert(got.nonEmpty)
    got.foreach { case (vid, (i, c, c2)) =>
      val (refId, refC) = ref((vid, 1))
      assert(ids(i) == refId && c == refC, s"top-1 drift for $vid")
      assert(c2 == ref((vid, 2))._2, s"top-2 drift for $vid")
    }
  }

  test("vec_top2_cos corners: one-row matrix, exact ties, NaN rows") {
    import spark.implicits._
    def top2(vec: Seq[Double], m: Seq[Seq[Double]]): (Int, Double, Double) = {
      val r = Seq(Tuple1(vec)).toDF("v")
        .select(graft.functions.vec_top2_cos(col("v"), typedLit(m)).as("t"))
        .collect().head.getStruct(0)
      (r.getInt(0), r.getDouble(1), r.getDouble(2))
    }
    val v = Seq(1.0, 0.0)
    // one row: runner-up is -Infinity (an assignment against a single
    // centroid can never flip — infinite margin)
    assert(top2(v, Seq(Seq(1.0, 0.0))) == ((0, 1.0, Double.NegativeInfinity)))
    // exact tie keeps the lowest index as winner, tied value as c2
    assert(top2(v, Seq(Seq(2.0, 0.0), Seq(3.0, 0.0))) == ((0, 1.0, 1.0)))
    // NaN (zero-norm row) is greatest; the runner-up is the best number
    val (i1, c1, c21) = top2(v, Seq(Seq(1.0, 0.0), Seq(0.0, 0.0)))
    assert(i1 == 1 && c1.isNaN && c21 == 1.0)
    // two NaNs: lowest NaN index wins, NaN runner-up (margin NaN — a
    // pruned audit can never skip on it)
    val (i2, c2x, c22) = top2(v, Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)))
    assert(i2 == 0 && c2x.isNaN && c22.isNaN)
  }

  test("vec_top2_cos executes under CODEGEN_ONLY (no silent interpreted fallback)") {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val centsDf = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec")).localCheckpoint()
    val Some((_, mat)) = graft.sim.Similarity.collectedMat(centsDf, "c_id", "c_vec")
    val df = e.select(col("vec_id"),
      graft.functions.vec_top2_cos(col("vec"), typedLit(mat)).as("t"))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try df.queryExecution.toRdd.count(): Unit
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("vec_top2_cos")), p)
  }

  test("element-null contract (ADVICE r15): projected null-propagates, joined picks smallest id") {
    // a vector with a NULL ELEMENT is OUT OF CONTRACT — this pin
    // RECORDS the divergence instead of letting it drift silently: the
    // kernels null-propagate (null list_id / null verdict columns)
    // while the joined max_by ranks the all-null cosine structs and
    // still emits the smallest id.
    import spark.implicits._
    val vecs = Seq((10L, Seq(Some(1.0), None, Some(0.0), Some(0.0))))
      .toDF("vec_id", "vec")
    val cents = Seq(
      (3L, Seq(1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("c_id", "c_vec").localCheckpoint()
    val projected = Similarity.ivfAssign(vecs, cents)
      .select("list_id").collect().head
    assert(projected.isNullAt(0), "projected path must null-propagate")
    val joined = Similarity.ivfAssignJoined(vecs, cents)
      .select("list_id").collect().head
    assert(joined.getLong(0) == 3L,
      "joined path emits the smallest c_id on all-null cosines (recorded divergence)")
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
