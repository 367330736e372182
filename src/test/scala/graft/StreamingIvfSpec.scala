package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity
import graft.streaming.StreamingIvf

/** Incremental persisted-IVF maintenance ([[StreamingIvf]]):
  *
  *  1. a real 3-batch `StreamingQuery` ingest builds an index whose
  *     probe answers are ROW-IDENTICAL to the one-shot q29 chain over
  *     the full corpus — incremental build changes when vectors
  *     arrive, never what a probe answers;
  *  2. a crash-window replay (re-running the last batch by hand, the
  *     foreachBatch replay shape) republishes its dir idempotently —
  *     index rows and per-list histogram unchanged;
  *  3. re-ingesting already-seen ids under a NEW batch id is a no-op;
  *  4. probes prune on `list_id` across the batch dirs — the executed
  *     scan opens ≤ batches × probed-lists files, not the index.
  */
class StreamingIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"
  private val Probes = 2
  private val K = 5

  private def corpus: DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))

  private lazy val lists =
    ScaleParams.ivfLists(ScaleParams.tableRows(spark, dir, "embeddings"))

  private def cents: DataFrame =
    corpus.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))

  private def probesFor(lo: Long, hi: Long): DataFrame =
    Similarity.ivfProbes(
      corpus.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec")),
      cents, Probes)

  // three uneven slices of the fixture corpus, keyed for addData
  private lazy val slices: Seq[Seq[(Long, Seq[Float])]] = {
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    Seq(rows.take(150), rows.slice(150, 320), rows.drop(320))
  }

  private lazy val indexPath: String = {
    val root = Files.createTempDirectory("graft_sivf").toString
    val ckpt = s"$root/ckpt"
    val idx = s"$root/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIvf.startMaintainer(
      stream.toDF().toDF("vec_id", "embedding"), ckpt, idx, cents,
      trigger = Trigger.ProcessingTime(0))
    slices.foreach { s => stream.addData(s); q.processAllAvailable() }
    q.stop()
    idx
  }

  private def indexRows(): Array[(Long, Long)] =
    spark.read.parquet(indexPath)
      .groupBy(col("list_id").cast("long").as("l")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("3-batch streaming build: probe == the one-shot q29 chain") {
    val got = Similarity.probePersistedIvf(spark, indexPath, probesFor(0, 10), K)
      .orderBy("q_id", "rank").collect()
    val oneShot = SparkEntry.queries("q29_knn_ivf")(spark, dir).collect()
    assert(got.length == oneShot.length && got.nonEmpty)
    got.zip(oneShot).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2), s"$a vs $b")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-12, s"$a vs $b")
    }
  }

  test("crash-window replay republishes the last batch idempotently") {
    val before = indexRows()
    import spark.implicits._
    StreamingIvf.appendBatchPersistent(indexPath,
      slices(2).toDF("vec_id", "embedding"), 2L, cents)
    assert(indexRows().sameElements(before))
  }

  test("re-ingesting seen ids under a new batch id is a no-op") {
    val before = indexRows()
    import spark.implicits._
    val assigned = StreamingIvf.appendBatchPersistent(indexPath,
      (slices(0).take(40) ++ slices(1).take(40)).toDF("vec_id", "embedding"),
      3L, cents)
    assert(assigned.isEmpty)
    assert(indexRows().sameElements(before))
  }

  test("stop/restart from the checkpoint resumes the index without loss or dupes") {
    val root = Files.createTempDirectory("graft_sivf_restart").toString
    val ckpt = s"$root/ckpt"
    val idx = s"$root/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // first incarnation: two batches, then a hard stop
    val s1 = MemoryStream[(Long, Seq[Float])]
    val q1 = StreamingIvf.startMaintainer(
      s1.toDF().toDF("vec_id", "embedding"), ckpt, idx, cents,
      trigger = Trigger.ProcessingTime(0))
    slices.take(2).foreach { s => s1.addData(s); q1.processAllAvailable() }
    q1.stop()
    // second incarnation, same checkpoint: a NEW query resumes from
    // the committed offsets and carries on with the remaining slice
    // (same MemoryStream object — its offsets are the replay log)
    val q2 = StreamingIvf.startMaintainer(
      s1.toDF().toDF("vec_id", "embedding"), ckpt, idx, cents,
      trigger = Trigger.ProcessingTime(0))
    s1.addData(slices(2)); q2.processAllAvailable()
    q2.stop()
    // the restarted maintainer's index answers exactly like the
    // one-shot chain over the full corpus: nothing lost, nothing doubled
    val got = Similarity.probePersistedIvf(spark, idx, probesFor(0, 10), K)
      .orderBy("q_id", "rank").collect()
    val oneShot = SparkEntry.queries("q29_knn_ivf")(spark, dir).collect()
    assert(got.length == oneShot.length && got.nonEmpty)
    got.zip(oneShot).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2), s"$a vs $b")
    }
    val total = spark.read.parquet(idx).count()
    assert(total == slices.map(_.size).sum, s"state rows $total")
  }

  test("probe scan prunes to the probed lists across batch dirs") {
    val probes = probesFor(0, 10)
    val probed = probes.select(col("list_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val allFiles = spark.read.parquet(indexPath).inputFiles.length
    val pruned = spark.read.parquet(indexPath)
      .filter(col("list_id").isin(probed.toSeq: _*))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val read = scan.metrics("numFiles").value
    // ≤ one file per (batch dir that holds the list, probed list);
    // 4 dirs exist after the replay/re-ingest tests above
    assert(read > 0 && read <= probed.size * 4 && read < allFiles,
      s"read $read of $allFiles files for ${probed.size} lists")
  }
}
