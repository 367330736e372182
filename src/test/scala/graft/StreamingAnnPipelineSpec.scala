package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ShardedRecordSource
import graft.streaming.{StreamingAnn, StreamingDedup}

/** The embedding near-dup monitor driven END TO END through Structured
  * Streaming (VERDICT r11 item 2): vector ingest through the
  * Kinesis-shaped [[ShardedRecordSource]] with a kill injected inside
  * the at-least-once window (after the fold of batch 1, before its
  * offset commit), restarted with the PRODUCTION entry point
  * ([[StreamingAnn.startMonitor]]) — proving the persistent store
  * discipline holds under Spark's ACTUAL crash-window replay, not just
  * a hand-called `foldBatchPersistent(batchId)` (StreamingAnnSpec's
  * scope). The run also exercises the compaction CADENCE
  * ([[StreamingDedup.maybeCompact]] as the foreachBatch epilogue —
  * VERDICT r11 item 3): the store's dir count must stay bounded while
  * content stays row-stable and folds continue.
  *
  * Payload format: each shard record's data is UTF-8
  * `"<vec_id>|<f1>,<f2>,…"` — `Float.toString` / `cast("float")`
  * round-trips IEEE floats exactly, so the ingested vectors are
  * bit-identical to the fixture table and the monitor's lifetime
  * emissions must equal the q24 batch chain cosine-for-cosine.
  */
class StreamingAnnPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"
  private val ShardCount = 2
  private val CompactEvery = 2

  private def planes: Int =
    ScaleParams.srpBandPlanes(ScaleParams.tableRows(spark, dir, "embeddings"))

  /** Every fixture vector as a shard record, round-robin across
    * shards so near-dup pairs straddle shards and (with the 80-record
    * admission cap) micro-batch boundaries.
    */
  private def writeShards(srcDir: File): Unit = {
    val rows = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
    (0 until ShardCount).foreach { si =>
      val lines = rows.zipWithIndex.filter(_._2 % ShardCount == si).map {
        case (r, i) =>
          val vec = r.getSeq[Float](1).map(_.toString).mkString(",")
          val payload = s"${r.getLong(0)}|$vec"
          s"s$si-$i,${Fixtures.ArrivalMs}," +
            Base64.getEncoder.encodeToString(payload.getBytes(StandardCharsets.UTF_8))
      }
      Files.write(new File(srcDir, f"shard-$si%03d.log").toPath,
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  private def vectorStream(srcDir: File): DataFrame =
    spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .option("maxRecordsPerBatch", "80")
      .load()
      .select(split(col("data").cast("string"), "\\|").as("p"))
      .select(col("p").getItem(0).cast("long").as("vec_id"),
        transform(split(col("p").getItem(1), ","), x => x.cast("float"))
          .as("embedding"))

  test("vector ingest through a real StreamingQuery: crash-window replay idempotent, emissions == q24, cadence bounds the store") {
    val srcDir = Files.createTempDirectory("graft_annsoak_src").toFile
    val ckDir = Files.createTempDirectory("graft_annsoak_ck").toString
    val statePath = Files.createTempDirectory("graft_annsoak_state").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_annsoak_pairs").toString + "/pairs"
    writeShards(srcDir)
    val p = planes

    // first run: startMonitor's BODY plus a kill injected AFTER the
    // fold (state + pairs dirs written) but BEFORE the offset commit —
    // the exact window a process crash can land in
    val attempts = new ConcurrentHashMap[Long, Integer]()
    val crashed = vectorStream(srcDir).writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingAnn.foldBatchPersistent(statePath, batch, batchId, p,
          pairsDir = Some(pairsDir)): Unit
        StreamingDedup.maybeCompact(batch.sparkSession, statePath, batchId,
          CompactEvery)
        val n = attempts.merge(batchId, 1, (a, b) => a + b)
        if (batchId == 1L && n == 1)
          throw new RuntimeException("injected kill after embed fold of batch 1")
      }
      .start()
    val ex = intercept[StreamingQueryException] { crashed.awaitTermination() }
    assert(ex.getMessage.contains("injected kill after embed fold of batch 1"))

    // restart from the same checkpoint with the PRODUCTION entry:
    // batch 1 replays (same `< 1` snapshot, overwrites its own dirs),
    // then the stream drains with the compaction cadence in-band
    val q = StreamingAnn.startMonitor(vectorStream(srcDir), ckDir, statePath,
      pairsDir, p, compactEvery = CompactEvery, trigger = Trigger.AvailableNow())
    q.awaitTermination(180000)
    // the admission cap split the drain into several real micro-batches
    // (replayed batch 1 + the rest of the backlog)
    val restartBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(restartBatches >= 4,
      s"fixture must span several micro-batches, got $restartBatches on restart")

    // lifetime emissions == the q24 batch chain, exactly, with no
    // duplicate emission despite the forced replay
    val rebuild = Queries.all("q24_dedup_embed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rebuild.nonEmpty, "fixture must contain planted embedding near-dups")
    val emitted = StreamingDedup.pairsView(spark, pairsDir)
      .map(_.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
      .getOrElse(Seq.empty)
    assert(emitted.size == emitted.toSet.size, "a replayed batch re-emitted pairs")
    assert(emitted.toSet == rebuild, "stream emissions diverged from the q24 chain")

    // state holds exactly one row per ingested vector — the replay
    // re-signed nothing, and the cadence's compactions lost nothing
    val expectIds = Tables(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val stateIds = spark.read.parquet(statePath)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(stateIds == expectIds, "state diverged from the ingested vectors")

    // the cadence bounded the store: with every=2 the epilogue merges
    // [0, id-1] on every even batch, so far fewer dirs than batches
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(statePath))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs.size <= CompactEvery + 1,
      s"cadence failed to bound the store: ${dirs.sorted} after $restartBatches batches")
  }
}
