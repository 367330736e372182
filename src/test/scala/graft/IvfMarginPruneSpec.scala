package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IvfIndex, Similarity}
import graft.streaming.StreamingIvf

/** Displacement-pruned churn audit (round-16, VERDICT r15 item 2): the
  * steady-state reindex must stop paying a full corpus read to decide
  * "nothing churned", WITHOUT changing a single decision. The prune is
  * sound iff a list is skipped only when its stored minimum winning
  * margin strictly exceeds d_L + max_j d_j (normalized centroid
  * displacements) and its row count is unchanged — so these tests pin
  * pruned == full from BOTH sides of the bound:
  *
  *  - a sub-bound displacement prunes every list and the full-audit
  *    twin agrees nothing churned;
  *  - a planted displacement that DOES flip a list's rows (a
  *    boundary-hugging cluster whose margin sits under the bound)
  *    forces that list through the audit while the high-margin lists
  *    still prune — and the outcome is row-identical to the full twin;
  *  - appended rows void a list's evidence via the count check;
  *  - the cadence composition carries the evidence across a re-layout
  *    and a converged store's steady firing reads zero list data.
  */
class IvfMarginPruneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Dims = 64
  private val PerCluster = 25

  /** Unit-ish vector with weight `w0` on axis `a0` and `w1` on `a1`,
    * plus a per-row jitter so vectors are distinct.
    */
  private def vec(a0: Int, w0: Double, a1: Int, w1: Double, jitterDim: Int): Seq[Float] = {
    val v = Array.fill(Dims)(0.0f)
    v(a0) = w0.toFloat
    if (w1 != 0.0) v(a1) = w1.toFloat
    v(jitterDim) = 0.01f
    v.toSeq
  }

  /** Cluster 0 hugs the c0/c1 boundary (margin ≈ 0.074 against the
    * seed basis); clusters 1–3 sit on their axes (margin ≈ 1).
    */
  private def vectors: DataFrame = {
    import spark.implicits._
    val boundary = (0 until PerCluster).map { i =>
      (i.toLong, vec(0, 1.0, 1, 0.9, 8 + (i % 50)))
    }
    val axes = (1 until 4).flatMap { c =>
      (0 until PerCluster).map { i =>
        (c * 100L + i, vec(c, 1.0, 0, 0.0, 8 + (i % 50)))
      }
    }
    (boundary ++ axes).toDF("vec_id", "vec")
  }

  private def centsOf(vs: Seq[Seq[Float]]): DataFrame = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("c_id", "c_vec")
  }

  private def axisV(a: Int): Seq[Float] = {
    val v = Array.fill(Dims)(0.0f); v(a) = 1.0f; v.toSeq
  }

  private val cents0 = Seq(axisV(0), axisV(1), axisV(2), axisV(3))

  // every centroid nudged by 0.005 on dim 20: displacement ≈ 0.005,
  // bound ≈ 0.01 — under every list's margin, even the boundary one
  private val centsEps = cents0.map { v =>
    val a = v.toArray; a(20) = 0.005f; a.toSeq
  }

  // c1 pulled toward the boundary cluster: ‖ĉ1′ − ĉ1‖ ≈ 0.197, which
  // FLIPS cluster 0 (cos rises 0.743 → 0.802 past its own centroid)
  // while every axis cluster's ≈1 margin still clears 2·0.197
  private val centsFlip = {
    val c1 = Array.fill(Dims)(0.0f); c1(0) = 0.2f; c1(1) = 1.0f
    Seq(axisV(0), c1.toSeq, axisV(2), axisV(3))
  }

  private def buildIndex(path: String): Unit =
    Similarity.persistIvfIndex(
      Similarity.ivfAssign(vectors, centsOf(cents0)), path)

  private def placement(path: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Twin stores: run the same calls with the prune ON vs OFF and
    * demand identical placements and identical rewrite decisions.
    */
  private def twins(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"graft_mprune_$tag").toString
    val (p, f) = (s"$base/pruned", s"$base/full")
    buildIndex(p); buildIndex(f)
    // seed the evidence: a first run against the build basis (no stats
    // yet → full audit on both) writes .margin-stats
    val s1p = IvfIndex.reindexLists(spark, p, centsOf(cents0), minChurnBp = 5000L)
    val s1f = IvfIndex.reindexLists(spark, f, centsOf(cents0), minChurnBp = 5000L)
    assert(s1p.listsPruned == 0L && s1p.listsAudited == 4L, s1p)
    assert(s1p.listsRewritten == 0L && s1f.listsRewritten == 0L)
    (p, f)
  }

  test("sub-bound displacement: every list prunes, outcome identical to the full audit") {
    val (p, f) = twins("eps")
    val sp = IvfIndex.reindexLists(spark, p, centsOf(centsEps), minChurnBp = 5000L)
    val sf = IvfIndex.reindexLists(spark, f, centsOf(centsEps), minChurnBp = 5000L,
      marginPrune = false)
    assert(sp.listsPruned == 4L && sp.listsAudited == 0L, sp)
    assert(sf.listsPruned == 0L && sf.listsAudited == 4L, sf)
    assert(sp.listsRewritten == 0L && sf.listsRewritten == 0L)
    assert(sp.listsTotal == sf.listsTotal)
    assert(placement(p) == placement(f))
  }

  test("planted displacement flips the boundary list: the bound declines to prune it, high-margin lists still skip") {
    val (p, f) = twins("flip")
    val sp = IvfIndex.reindexLists(spark, p, centsOf(centsFlip), minChurnBp = 5000L)
    val sf = IvfIndex.reindexLists(spark, f, centsOf(centsFlip), minChurnBp = 5000L,
      marginPrune = false)
    // both sides of the bound in one run: the boundary list is audited
    // (margin 0.074 < 0.197) and rewritten (all its rows re-home to
    // list 1); the axis lists prune (margin ≈ 1 > 2 × 0.197)
    assert(sp.listsAudited == 1L && sp.listsPruned == 3L, sp)
    assert(sp.listsRewritten == 1L && sp.rowsMoved == PerCluster.toLong, sp)
    assert(sf.listsRewritten == 1L && sf.rowsMoved == PerCluster.toLong, sf)
    val got = placement(p)
    assert(got == placement(f))
    // the flip is real: every boundary row now lives in list 1
    (0 until PerCluster).foreach(i => assert(got(i) == (i.toLong, 1L)))
  }

  test("appends void a list's evidence: the count check forces its audit and the new churn is caught") {
    val (p, f) = twins("append")
    import spark.implicits._
    // 30 rows whose argmax is c3, appended into list 2's dir (an
    // out-of-band writer): churn 30/55 ≈ 5454 bp — invisible to the
    // stored margins, visible to the count check
    val extra = (0 until 30).map(i => (9000L + i, vec(3, 1.0, 0, 0.0, 8 + (i % 50))))
      .toDF("vec_id", "vec")
    Seq(p, f).foreach(path =>
      extra.write.mode("append").parquet(s"$path/list_id=2"))
    val sp = IvfIndex.reindexLists(spark, p, centsOf(centsEps), minChurnBp = 5000L)
    val sf = IvfIndex.reindexLists(spark, f, centsOf(centsEps), minChurnBp = 5000L,
      marginPrune = false)
    assert(sp.listsAudited == 1L && sp.listsPruned == 3L, sp)
    assert(sp.listsRewritten == 1L && sp.rowsMoved == 30L, sp)
    assert(sf.listsRewritten == 1L && sf.rowsMoved == 30L, sf)
    assert(placement(p) == placement(f))
    // the appended rows re-homed to list 3 on both stores
    val byId = placement(p).toMap
    (0 until 30).foreach(i => assert(byId(9000L + i) == 3L))
  }

  test("cadence composition: evidence survives the re-layout and a converged steady firing reads zero list data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mprune_cadence").toString
    val idx = s"$root/idx"
    // converged geometry: members identical to their centroid — the
    // refine is an exact fixed point, so the steady firing's
    // displacement is 0 and every margin holds
    def unit2(deg: Double): Seq[Float] = {
      val v = Array.fill(Dims)(0.0f)
      v(0) = math.cos(math.toRadians(deg)).toFloat
      v(1) = math.sin(math.toRadians(deg)).toFloat
      v.toSeq
    }
    val seeds = Seq((0L, unit2(0)), (1L, unit2(130))).toDF("c_id", "c_vec")
    StreamingIvf.ensureQuantizer(spark, idx, seeds)
    (0L until 4L).foreach { b =>
      val rows = ((0 until 8).map(i => (b * 100L + i, unit2(0))) ++
        (0 until 8).map(i => (b * 100L + 50 + i, unit2(130)))).toDF("vec_id", "embedding")
      val quant = StreamingIvf.currentQuantizer(spark, idx).get
      StreamingIvf.appendBatchPersistent(idx, rows, b, quant): Unit
      StreamingIvf.maybeRelayout(spark, idx, b, every = 2)
    }
    val s1 = StreamingIvf.maybeReindex(spark, idx, batchId = 4,
      relayoutEvery = 2, everyRelayouts = 2, minChurnBp = 1000L).get
    // firing 1 merged fresh batch dirs: no carried evidence, full audit
    assert(s1.listsPruned == 0L && s1.listsRewritten == 0L, s1)
    val before = placement(s"$idx")
    val genDir = new Path(s"$idx/batch=3")
    val hfs = genDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listFiles(l: Long): Set[String] =
      hfs.listStatus(new Path(genDir, s"list_id=$l"))
        .map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
    val filesBefore = Seq(0L, 1L).map(l => l -> listFiles(l)).toMap

    val s2 = StreamingIvf.maybeReindex(spark, idx, batchId = 8,
      relayoutEvery = 2, everyRelayouts = 2, minChurnBp = 1000L).get
    // steady state: the evidence pruned BOTH lists — zero list data
    // read, zero rewrites, files byte-untouched, placement unchanged
    assert(s2.listsAudited == 0L && s2.listsPruned == 2L, s2)
    assert(s2.listsRewritten == 0L && s2.bytesStaged == 0L, s2)
    Seq(0L, 1L).foreach(l => assert(listFiles(l) == filesBefore(l), s"list $l touched"))
    assert(placement(s"$idx") == before)
    assert(StreamingIvf.currentQuantizerGen(spark, idx).contains(2L))

    // the backstop: fullAuditEvery = 1 forces the exact pass — same
    // decisions, evidence re-measured from data
    val s3 = StreamingIvf.maybeReindex(spark, idx, batchId = 8,
      relayoutEvery = 2, everyRelayouts = 2, minChurnBp = 1000L,
      fullAuditEvery = 1).get
    assert(s3.listsAudited == 2L && s3.listsPruned == 0L, s3)
    assert(s3.listsRewritten == 0L && placement(s"$idx") == before)
  }
}
