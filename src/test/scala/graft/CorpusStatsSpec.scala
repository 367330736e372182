package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the corpus-growth statistics family
  * (q269–q272): Heaps checkpoint selection, Chao1/Good–Turing
  * arithmetic, Mann–Whitney doubled-rank algebra (with and without
  * ties, against hand-computed U and z), and the anisotropy
  * participation-ratio identities. The battery oracles pin
  * cross-engine parity; these pin the MATH on inputs small enough to
  * verify by hand.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  import spark.implicits._

  test("heapsFromDocStats: dyadic checkpoints, boundary rule, beta") {
    // docs end at cumulative tokens 200 / 400 / 700; vocabulary seen
    // by those boundaries: 150 / 200 / 300
    val base = Seq((1L, 200L, 150L), (2L, 200L, 50L), (3L, 300L, 100L))
      .toDF("doc_id", "nt", "n_new")
    val out = QueriesTraining.heapsFromDocStats(base)
      .select("j", "ck", "vocab", "beta_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 128 precedes every doc boundary (no row); 256 covers doc 1;
    // 512 covers docs 1-2; 1024 > total 700 (no row)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((8L, 256L, 150L), (9L, 512L, 200L)))
    // beta over the two checkpoints, via the same settled-milli rule
    val (x1, y1) = (math.round(math.log(256.0) * 1000.0), math.round(math.log(150.0) * 1000.0))
    val (x2, y2) = (math.round(math.log(512.0) * 1000.0), math.round(math.log(200.0) * 1000.0))
    val n = 2.0
    val beta = math.round(
      (n * (x1 * y1 + x2 * y2) - (x1 + x2).toDouble * (y1 + y2)) /
        (n * (x1 * x1 + x2 * x2) - (x1 + x2).toDouble * (x1 + x2)) * 1000.0)
    assert(out.map(_._4).distinct.toSeq === Seq(beta))
    // two-point slope sanity: ln(200/150)/ln(512/256) ~ 0.415
    assert(beta >= 410L && beta <= 420L)
  }

  test("richnessFromFof: Chao1 and Good-Turing closed forms") {
    val fof = Seq(
      ("s1", 10L, 100L, 4L, 1L), // chao1 = 10 + 4*3/(2*2) = 13
      ("s2", 7L, 50L, 0L, 3L)    // f1 = 0: no correction, no unseen
    ).toDF("source", "v_obs", "n_tokens", "f1", "f2")
    val out = QueriesTraining.richnessFromFof(fof)
      .select("source", "chao1_milli", "unseen_bp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(("s1", 13000L, 400L), ("s2", 7000L, 0L)))
  }

  private def mwRow(byV: DataFrame): (Long, Long, Long, Long) = {
    val r = QueriesTraining.mwFromCounts(byV).collect()(0)
    (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("u2_a"), r.getAs[Long]("z_milli"))
  }

  test("mwFromCounts: tie-free case against hand-computed U and z") {
    // A = {1, 2}, B = {3, 4}: U_A = 0, z = -2/sqrt(5/3) = -1.549
    val byV = Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 0L, 1L), (4L, 0L, 1L))
      .toDF("v", "na_v", "t")
    assert(mwRow(byV) === ((2L, 2L, 0L, -1549L)))
  }

  test("mwFromCounts: tied case uses midranks and the tie-corrected variance") {
    // A = {1, 1}, B = {1, 2}: doubled U = 2 (two half-ties),
    // var = (4/12)*((5) - 24/12) = 1, z = (1 - 2)/1 = -1
    val byV = Seq((1L, 2L, 3L), (2L, 0L, 1L)).toDF("v", "na_v", "t")
    assert(mwRow(byV) === ((2L, 2L, 2L, -1000L)))
  }

  test("mwFromCounts: degenerate one-group input settles z to 0") {
    val byV = Seq((5L, 2L, 2L), (7L, 1L, 1L)).toDF("v", "na_v", "t")
    val (na, nb, _, z) = mwRow(byV)
    assert((na, nb, z) === ((3L, 0L, 0L)))
  }

  test("shapeMomentSql: symmetric three-point sample has zero skew, kurtosis -3/2") {
    // x = {-1000, 0, 1000}: m2 = 2e6/3, m3 = 0, m4/m2^2 = 3/2,
    // JB = (3/6) * (0 + 1.5^2/4) * 1000 = 281 milli
    val m = Seq((3L, 0L, 2000000L, 0L, 2000000000000L))
      .toDF("n", "sx", "sxx", "sxxx", "sxxxx")
    val out = m.select(QueriesTraining.shapeMomentSql.map {
      case (nme, sql) => expr(sql).as(nme) }: _*).collect()(0)
    assert((out.getAs[Long]("skew_milli"), out.getAs[Long]("kurt_milli"),
      out.getAs[Long]("jb_milli")) === ((0L, -1500L, 281L)))
  }

  test("shapeMomentSql: degenerate zero-variance input settles to 0") {
    val m = Seq((4L, 4000L, 4000000L, 4000000000L, 4000000000000L))
      .toDF("n", "sx", "sxx", "sxxx", "sxxxx")
    val out = m.select(QueriesTraining.shapeMomentSql.map {
      case (nme, sql) => expr(sql).as(nme) }: _*).collect()(0)
    assert((out.getAs[Long]("skew_milli"), out.getAs[Long]("kurt_milli"),
      out.getAs[Long]("jb_milli")) === ((0L, 0L, 0L)))
  }

  test("Fano factor closed form: 3+1 occurrences over 4 docs = 1.5") {
    // cnt = 4, sc2 = 10, n = 4: (4*10 - 16)/(4*4) = 1.5 -> 1500 milli
    val fano = Seq((4L, 10L, 4L)).toDF("cnt", "sc2", "n")
      .select(expr(
        """CAST(round((CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE) - CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
          | / (CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT)""".stripMargin)
        .as("f")).collect()(0).getLong(0)
    assert(fano === 1500L)
  }

  private def anisoRow(comps: DataFrame, nVecs: Long): (Long, Long, Long, Long) = {
    val nv = spark.range(1).select(lit(nVecs).as("n_vecs"))
    val r = QueriesTraining.anisotropyFromMoments(comps, nv).collect()(0)
    (r.getAs[Long]("n_vecs"), r.getAs[Long]("dims"),
      r.getAs[Long]("pr_milli"), r.getAs[Long]("aniso_bp"))
  }

  test("anisotropyFromMoments: equal spectrum PR = dims, zero-mean aniso = 0") {
    // two dims, both variance 1.0, zero means
    val comps = Seq((0, 0L, 1000000L), (1, 0L, 1000000L))
      .toDF("pos", "m_micro", "m2_micro")
    assert(anisoRow(comps, 5L) === ((5L, 2L, 2000L, 0L)))
  }

  test("anisotropyFromMoments: single live dimension PR = 1, mean energy share") {
    // dim 0 carries mean 1 (m2 = 2 => var 1), dim 1 silent variance 1:
    // PR = (2e12)^2 / (2 * 1e24)... spectrum (1,1) -> PR 2; energy
    // share = 1e12*10000 / (3e6*1e6) = 3333 bp
    val live = Seq((0, 1000000L, 2000000L), (1, 0L, 1000000L))
      .toDF("pos", "m_micro", "m2_micro")
    assert(anisoRow(live, 3L) === ((3L, 2L, 2000L, 3333L)))
    // spectrum (1, 0): participation collapses to one dimension
    val collapsed = Seq((0, 0L, 1000000L), (1, 0L, 0L))
      .toDF("pos", "m_micro", "m2_micro")
    assert(anisoRow(collapsed, 3L)._3 === 1000L)
  }
}
