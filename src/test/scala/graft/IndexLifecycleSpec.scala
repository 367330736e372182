package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IvfIndex, Similarity}
import graft.streaming.StreamingIvf

/** The full persisted-index LIFECYCLE composed end-to-end on ONE
  * store — the integration the round-13 verbs were built for:
  *
  *   ingest (streaming maintainer, re-layout cadence firing mid-run)
  *   → audit (per-list churn under a refined quantizer — q290's
  *     computation over the live store)
  *   → selective reindex (maintenance window, stream stopped)
  *   → resume ingest (the maintainer appends to the reindexed store)
  *
  * with probe answers checked exact at every stage boundary. The
  * reindex step runs against the RE-LAID store's merged `batch=<id>`
  * generation dir (a list-partitioned index root) — the documented
  * composition seam between IvfReindexSpec's flat fixture and the
  * maintainer's batch-keyed layout.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Dims = 64
  private val PerCluster = 30

  private def axis(c: Int, jitterDim: Int): Seq[Float] = {
    val v = Array.fill(Dims)(0.0f)
    v(c) = 1.0f
    v(jitterDim) = 0.01f
    v.toSeq
  }

  // 4 orthogonal clusters; old quantizer = axes 0..3, refined = axes
  // 0,1 swapped (clusters 0/1 churn 100%, clusters 2/3 churn 0)
  private def rows: Seq[(Long, Seq[Float])] =
    (0 until 4).flatMap { c =>
      (0 until PerCluster).map(i => (c * 100L + i, axis(c, 8 + (i % 50))))
    }

  private def cents(order: Seq[Int]): DataFrame = {
    import spark.implicits._
    order.zipWithIndex.map { case (ax, cid) =>
      val v = Array.fill(Dims)(0.0f); v(ax) = 1.0f
      (cid.toLong, v.toSeq)
    }.toDF("c_id", "c_vec")
  }

  private def probeRows(path: String, quant: DataFrame): Seq[(Long, Int, Long, Double)] = {
    import spark.implicits._
    val q = rows.filter(r => Seq(0L, 100L, 200L, 300L).contains(r._1))
      .toDF("vec_id", "vec")
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    Similarity.probePersistedIvf(spark, path,
        Similarity.ivfProbes(q, quant, nprobe = 2), k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("ingest -> cadence re-layout -> churn audit -> selective reindex -> resume, probes exact throughout") {
    val root = Files.createTempDirectory("graft_lifecycle").toString
    val idx = s"$root/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // ── ingest: 4 batches under the OLD quantizer, cadence fires at
    // batch 2 and merges batches 0,1 into one generation
    val oldQ = cents(Seq(0, 1, 2, 3))
    val stream = MemoryStream[(Long, Seq[Float])]
    val q1 = StreamingIvf.startMaintainer(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", idx, oldQ,
      trigger = Trigger.ProcessingTime(0), relayoutEvery = 2)
    rows.grouped(PerCluster).foreach { s => stream.addData(s.toSeq); q1.processAllAvailable() }
    q1.stop()
    assert(spark.read.parquet(idx).count() == rows.size)
    val preProbe = probeRows(idx, oldQ)
    assert(preProbe.nonEmpty)

    // ── maintenance window: finish the merge (all committed batches
    // to one generation — reindex then touches a compact store)
    StreamingIvf.relayoutState(spark, idx, 3L)

    // ── audit + selective reindex under the refined quantizer —
    // pointed at the merged GENERATION dir (a list-partitioned index
    // root), the documented composition for the batch-keyed store
    val newQ = cents(Seq(1, 0, 2, 3))
    val stats = IvfIndex.reindexLists(spark, s"$idx/batch=3", newQ, minChurnBp = 5000L)
    assert(stats.listsRewritten == 2L, stats)
    assert(stats.rowsRewritten == 2L * PerCluster, stats)
    // rewritten rows landed inside the store (no loss, no dupes) ...
    val all = spark.read.parquet(idx)
    assert(all.count() == rows.size)
    assert(all.select("vec_id").distinct().count() == rows.size)
    // ... and the mixed store probes EXACTLY like a fresh full
    // rebuild under the refined quantizer (kept lists are churn-free)
    val rebuilt = s"$root/rebuilt"
    Similarity.persistIvfIndex(
      Similarity.ivfAssign(rows.toDF("vec_id", "vec"), newQ), rebuilt)
    assert(probeRows(idx, newQ) == probeRows(rebuilt, newQ))

    // ── resume ingest against the reindexed store: new vectors for
    // cluster 2 under the refined quantizer, same checkpoint lineage;
    // they share query 200's jitter dim, so their cosine (exactly 1.0)
    // outranks the 0.9999 ties of the pre-existing members
    val more = (0 until 10).map(i => (1000L + i, axis(2, 8)))
    val q2 = StreamingIvf.startMaintainer(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", idx, newQ,
      trigger = Trigger.ProcessingTime(0))
    stream.addData(more); q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(idx).count() == rows.size + more.size)
    // the new arrivals are probe-visible and outrank the old ties
    val after = probeRows(idx, newQ)
    val q200Neighbors = after.filter(_._1 == 200L).map(_._3).toSet
    assert(q200Neighbors.subsetOf(more.map(_._1).toSet),
      s"resumed ingest invisible to probes: $after")
  }
}
