package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Stats.auc / Stats.ksTest against closed-form fixtures — the
  * boundary values a battery oracle over synthetic data never hits.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def df(rows: Seq[(Long, Boolean)]) = {
    import spark.implicits._
    rows.toDF("s", "p").repartition(4) // defeat local-relation folding
  }

  private def aucBp(rows: Seq[(Long, Boolean)]): Long =
    Stats.auc(df(rows), col("s"), col("p")).collect()(0).getAs[Long]("auc_bp")

  test("auc: perfect separation = 10000, perfect inversion = 0") {
    val pos = (1L to 10L).map(i => (100L + i, true))
    val neg = (1L to 10L).map(i => (i, false))
    assert(aucBp(pos ++ neg) == 10000L)
    assert(aucBp(pos.map { case (s, _) => (s, false) } ++
      neg.map { case (s, _) => (s, true) }) == 0L)
  }

  test("auc: all scores tied = 5000 exactly") {
    val rows = (1L to 20L).map(i => (7L, i % 2 == 0))
    assert(aucBp(rows) == 5000L)
  }

  test("auc: hand-counted interleaving") {
    // scores: pos {3, 1}, neg {2, 0} → pairs: (3>2),(3>0),(1>0) = 3
    // concordant of 4, no ties → AUC = 0.75
    val rows = Seq((3L, true), (1L, true), (2L, false), (0L, false))
    assert(aucBp(rows) == 7500L)
  }

  private def ks(rows: Seq[(Long, Boolean)]) = {
    val r = Stats.ksTest(df(rows).withColumnRenamed("p", "a"),
      col("s"), col("a")).collect()(0)
    (r.getAs[Long]("ks_bp"), r.getAs[Long]("at_value"))
  }

  test("ks: identical samples = 0, disjoint samples = 10000") {
    val base = (1L to 10L)
    assert(ks(base.map(i => (i, true)) ++ base.map(i => (i, false)))._1 == 0L)
    val (d, at) = ks(base.map(i => (i, true)) ++ base.map(i => (i + 100L, false)))
    assert(d == 10000L)
    assert(at == 10L) // sup attained at sample A's max
  }

  test("ks: shifted uniform, hand-counted D and smallest-value tie-break") {
    // A = {1..4}, B = {3..6}: D = 2/4 at v=2 (and v=4) → smallest wins
    val (d, at) = ks((1L to 4L).map(i => (i, true)) ++ (3L to 6L).map(i => (i, false)))
    assert(d == 5000L)
    assert(at == 2L)
  }

  test("auc/ks match the battery queries' oracle columns at sf0.001") {
    // the operators ARE q166/q167's cores; smoke the battery path
    val a = SparkEntry.queries("q166_auc")(spark, "/root/testdata/sf0.001").collect()(0)
    assert(a.getAs[Long]("n_pos") + a.getAs[Long]("n_neg") > 0)
    assert(a.getAs[Long]("auc_bp") >= 0 && a.getAs[Long]("auc_bp") <= 10000)
    val k = SparkEntry.queries("q167_ks_drift")(spark, "/root/testdata/sf0.001").collect()(0)
    assert(k.getAs[Long]("ks_bp") >= 0 && k.getAs[Long]("ks_bp") <= 10000)
  }
}
