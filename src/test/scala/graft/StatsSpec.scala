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

  private def w1(rows: Seq[(Long, Boolean)]) = {
    val r = Stats.wasserstein1(df(rows).withColumnRenamed("p", "a"),
      col("s"), col("a")).collect()(0)
    (r.getAs[Long]("w1_num"), r.getAs[Long]("w1_milli"))
  }

  test("wasserstein: identical samples = 0, point masses = their distance") {
    val base = (1L to 10L)
    assert(w1(base.map(i => (i, true)) ++ base.map(i => (i, false)))._1 == 0L)
    // A = {0}, B = {7}: all mass moves 7 → W1 = 7 (milli = 7000)
    assert(w1(Seq((0L, true), (7L, false))) == (7L, 7000L))
  }

  test("wasserstein: uniform shift by 2 = exactly 2 (hand-checked ECDF area)") {
    // A = {1..4}, B = {3..6}: |F_a−F_b| area = 2 → num = 2·(4·4)
    val (num, milli) = w1((1L to 4L).map(i => (i, true)) ++
      (3L to 6L).map(i => (i, false)))
    assert(num == 32L)
    assert(milli == 2000L)
  }

  test("wasserstein: degenerate one-value domain still yields a row of 0") {
    assert(w1(Seq((5L, true), (5L, false), (5L, true))) == (0L, 0L))
  }

  private def chi(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Stats.chiSquareCells(rows.toDF("r", "c").repartition(4),
      col("r"), col("c")).collect()
  }

  test("conformal: hand-computed threshold and coverage") {
    import spark.implicits._
    // calibration 1..99 each once: n_cal = 99, k = (99+1)/10 = 10,
    // threshold = 10th smallest = 10; test 1..100 → 91 of 100 ≥ 10
    val cal = (1L to 99L).map(v => (v, 1L)).toDF("q_micro", "n").repartition(4)
    val test_ = (1L to 100L).map(v => (v, 1L)).toDF("q_micro", "n").repartition(4)
    val r = Stats.conformalFromCounts(cal, test_, 10L).collect()(0)
    assert(r.getAs[Long]("n_cal") === 99L)
    assert(r.getAs[Long]("k") === 10L)
    assert(r.getAs[Long]("thr_micro") === 10L)
    assert(r.getAs[Long]("n_test") === 100L)
    assert(r.getAs[Long]("n_covered") === 91L)
    assert(r.getAs[Long]("coverage_bp") === 9100L)
  }

  test("conformal: tied calibration values pin the same threshold as row ranks") {
    import spark.implicits._
    // 5 copies of each value 1..20: n_cal = 100, k = 10 → the 10th
    // smallest ROW sits inside the run of 2s → threshold = 2
    val cal = (1L to 20L).map(v => (v, 5L)).toDF("q_micro", "n").repartition(4)
    val test_ = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("q_micro", "n")
    val r = Stats.conformalFromCounts(cal, test_, 10L).collect()(0)
    assert(r.getAs[Long]("k") === 10L)
    assert(r.getAs[Long]("thr_micro") === 2L)
    assert(r.getAs[Long]("n_covered") === 20L)
    assert(r.getAs[Long]("coverage_bp") === 6666L)
  }

  test("chi-square: perfect independence = all-zero terms and residuals") {
    // uniform 3×2 grid, 5 copies each: O = E everywhere
    val rows = for { r <- Seq("a", "b", "x"); c <- Seq("p", "q");
                     _ <- 1 to 5 } yield (r, c)
    val cells = chi(rows)
    assert(cells.length == 6)
    assert(cells.forall(_.getAs[Long]("term_micro") == 0L))
    assert(cells.forall(_.getAs[Double]("resid") == 0.0))
  }

  test("chi-square: 2x2 perfect association sums to n in micro-units") {
    // diagonal-only 2×2 with n/2 per diagonal cell: χ² = n exactly
    val rows = Seq.fill(6)(("a", "p")) ++ Seq.fill(6)(("b", "q"))
    val cells = chi(rows)
    assert(cells.length == 4) // zero cells (a,q)/(b,p) participate
    assert(cells.map(_.getAs[Long]("term_micro")).sum == 12L * 1000000L)
    // each cell's |resid| = √(χ²/4) = √3
    cells.foreach(r =>
      assert(math.abs(math.abs(r.getAs[Double]("resid")) - math.sqrt(3.0)) < 1e-5))
  }

  test("chi-square: zero-observed cell carries a negative residual") {
    // 2×2 with an empty cell: resid(a,q) < 0, obs = 0 present in output
    val rows = Seq.fill(4)(("a", "p")) ++ Seq.fill(2)(("b", "p")) ++
      Seq.fill(2)(("b", "q"))
    val cells = chi(rows)
    val empty = cells.find(r => r.getAs[String]("r") == "a" &&
      r.getAs[String]("c") == "q").get
    assert(empty.getAs[Long]("obs") == 0L)
    assert(empty.getAs[Double]("resid") < 0.0)
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
