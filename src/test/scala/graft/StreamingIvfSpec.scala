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

  private def assertProbeMatchesOneShot(idx: String): Unit = {
    val got = Similarity.probePersistedIvf(spark, idx, probesFor(0, 10), K)
      .orderBy("q_id", "rank").collect()
    val oneShot = SparkEntry.queries("q29_knn_ivf")(spark, dir).collect()
    assert(got.length == oneShot.length && got.nonEmpty)
    got.zip(oneShot).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2), s"$a vs $b")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-12, s"$a vs $b")
    }
  }

  private def batchDirNames(idx: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(idx)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
  }

  test("re-layout cadence: the maintainer epilogue bounds the dir count, probes stay exact") {
    // 4 uneven batches with relayoutEvery = 2: the batchId=2 epilogue
    // merges batches 0,1 into one list-partitioned batch=1 generation
    val root = Files.createTempDirectory("graft_sivf_relayout").toString
    val idx = s"$root/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val four = Seq(rows.take(100), rows.slice(100, 220), rows.slice(220, 360), rows.drop(360))
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIvf.startMaintainer(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", idx, cents,
      trigger = Trigger.ProcessingTime(0), relayoutEvery = 2)
    four.foreach { s => stream.addData(s); q.processAllAvailable() }
    q.stop()
    assert(batchDirNames(idx) == Set("batch=1", "batch=2", "batch=3"), batchDirNames(idx))
    // the merged generation keeps list_id partitioning, one file per list
    val hfs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mergedLists = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/batch=1"))
      .filter(_.isDirectory).map(_.getPath)
    assert(mergedLists.nonEmpty && mergedLists.forall(_.getName.startsWith("list_id=")))
    mergedLists.foreach { l =>
      val files = hfs.listStatus(l).filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_"))
      assert(files.length == 1, s"${l.getName}: ${files.length} files")
    }
    assertProbeMatchesOneShot(idx)
    assert(spark.read.parquet(idx).count() == rows.size)
  }

  test("kill inside the re-layout window: the next batch rolls the store forward") {
    val root = Files.createTempDirectory("graft_sivf_crash").toString
    val idx = s"$root/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIvf.startMaintainer(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/ckpt", idx, cents,
      trigger = Trigger.ProcessingTime(0))
    slices.foreach { s => stream.addData(s); q.processAllAvailable() }
    q.stop()
    // replicate a kill PAST the commit marker, mid-retire: staging
    // written (list-partitioned merge of batches 0,1), marker present,
    // batch=0 retired, batch=1 still live
    val hroot = new org.apache.hadoop.fs.Path(idx)
    val hfs = hroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.option("basePath", idx)
      .parquet(s"$idx/batch=0", s"$idx/batch=1").drop("batch")
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$idx/.compact-state")
    hfs.create(new org.apache.hadoop.fs.Path(hroot, ".compact-commit-1"), true).close()
    assert(hfs.rename(new org.apache.hadoop.fs.Path(hroot, "batch=0"),
      new org.apache.hadoop.fs.Path(hroot, ".retired-batch=0")))
    // next maintainer batch heals the store before appending
    StreamingIvf.appendBatchPersistent(idx,
      slices(0).take(10).toDF("vec_id", "embedding"), 3L, cents)
    val names = hfs.listStatus(hroot).map(_.getPath.getName).toSet
    assert(!names.exists(n => n.startsWith(".compact") || n.startsWith(".retired-")), names)
    assert(names.contains("batch=1") && !names.contains("batch=0"), names)
    assertProbeMatchesOneShot(idx)
  }

  test("probeCommitted reads only strictly-earlier batches; empty before the first commit") {
    // horizon past every batch: identical to the root probe
    val all = StreamingIvf.probeCommitted(spark, indexPath, 100L, probesFor(0, 10), K)
      .orderBy("q_id", "rank").collect()
    val rootRead = Similarity.probePersistedIvf(spark, indexPath, probesFor(0, 10), K)
      .orderBy("q_id", "rank").collect()
    assert(all.length == rootRead.length && all.nonEmpty)
    all.zip(rootRead).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // horizon 1: only batch 0 is visible — any vector from a later
    // slice must be absent from the answers
    val laterIds = (slices(1) ++ slices(2)).map(_._1).toSet
    val early = StreamingIvf.probeCommitted(spark, indexPath, 1L, probesFor(0, 10), K)
      .collect().map(_.getLong(2)).toSet
    assert(early.nonEmpty && early.intersect(laterIds).isEmpty)
    // horizon 0: nothing committed yet — empty, with the right schema
    val none = StreamingIvf.probeCommitted(spark, indexPath, 0L, probesFor(0, 10), K)
    assert(none.columns.toSeq == Seq("q_id", "rank", "vec_id", "cos"))
    assert(none.isEmpty)
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
