package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Incremental MV maintenance: `merge(build(base), delta) ≡
  * build(base ∪ delta)` on arbitrary data and split choice, the
  * key-union behavior of combine (either side may be missing keys),
  * associativity across multi-batch folds, and the BIGINT-only state
  * contract.
  */
class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("k1", "k2"),
    partials = Seq(
      "cnt" -> lit(1L),
      "sum_v" -> col("v"),
      "n_neg" -> when(col("v") < 0L, 1L).otherwise(0L)))

  /** Random keyed rows incl. nulls in v and a skewed key. */
  private def rows(seed: Long, n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((
        rnd.nextInt(5).toString,
        rnd.nextInt(7).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(2000).toLong - 500)))
      .toDF("k1", "k2", "v")
      .select(col("k1"), col("k2"), col("v").cast("long").as("v"))
      .repartition(7)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("k1", "k2").collect().map(_.mkString("|")).toSeq.sorted

  test("merge(build(base), delta) == build(all) for several split predicates") {
    val all = rows(11L, 600).cache()
    try {
      val rebuild = canon(MaterializedAgg.build(all, view))
      for (m <- Seq(2, 3, 10)) {
        val base = all.filter(pmod(col("k2") + length(col("k1")), lit(m)) =!= 0)
        val delta = all.filter(pmod(col("k2") + length(col("k1")), lit(m)) === 0)
        val merged = MaterializedAgg.merge(MaterializedAgg.build(base, view), delta, view)
        assert(canon(merged) === rebuild, s"split mod $m diverged from rebuild")
      }
    } finally all.unpersist()
  }

  test("multi-batch fold == one-shot rebuild (associativity over arrivals)") {
    val all = rows(23L, 500).cache()
    try {
      val batches = (0 until 4).map(i => all.filter(pmod(col("k2"), lit(4)) === i))
      val folded = batches.tail.foldLeft(MaterializedAgg.build(batches.head, view)) {
        (mv, b) => MaterializedAgg.merge(mv, b, view)
      }
      assert(canon(folded) === canon(MaterializedAgg.build(all, view)))
    } finally all.unpersist()
  }

  test("combine unions keys: disjoint key sets pass through as zeros-elsewhere") {
    val a = rows(5L, 100).filter(col("k1") < "2")
    val b = rows(5L, 100).filter(col("k1") >= "2")
    val c = MaterializedAgg.combine(
      MaterializedAgg.build(a, view), MaterializedAgg.build(b, view), view)
    assert(canon(c) === canon(MaterializedAgg.build(a.unionByName(b), view)))
  }

  test("empty delta is a no-op") {
    val all = rows(7L, 200)
    val mv = MaterializedAgg.build(all, view)
    val merged = MaterializedAgg.merge(mv, all.limit(0), view)
    assert(canon(merged) === canon(mv))
  }

  test("non-BIGINT state is rejected (double sums would be order-dependent)") {
    val bad = ViewDef(Seq("k1"), Seq("s" -> col("v").cast("double")))
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.build(rows(3L, 50), bad)
    }
    assert(e.getMessage.contains("BIGINT"))
  }
}
