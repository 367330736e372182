package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Envelope, EnvelopeCodec, LogMessage, Pipeline}
import graft.sources.ShardedRecordSource
import graft.streaming.StreamingPipeline

/** End-to-end kill/restart soak over the flagship chain
  * (decode → route → grok → enrich → sink) through the Kinesis-shaped
  * [[ShardedRecordSource]]: the query is killed repeatedly mid-drain —
  * including INSIDE the at-least-once window (sink wrote, offset-log
  * commit never happened) — restarted from the same checkpoint each
  * time, and the sink must end with ZERO duplicate `doc_id`s and every
  * record present exactly once.
  *
  * This is the effectively-once improvement over the reference, whose
  * consumer checkpoints BEFORE the sink result is known
  * (`consumer.go:213-232` scans to the checkpoint store before error
  * inspection) and whose bulk indexer retries on auto-generated ids —
  * a crash there duplicates documents. Here the offset log commits
  * only after `foreachBatch` returns, the batchId-keyed overwrite sink
  * makes the replayed batch idempotent
  * ([[StreamingPipeline.sinkDocs]]), and `doc_id = md5(index:seq)`
  * ([[Pipeline.toJsonDocs]]) makes any residual replay an upsert.
  */
class StreamingSoakSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val ShardCount = 2
  private val RecordsPerShard = 40

  /** 80 routable records (2 shards × 40), unique sequence numbers and
    * messages, alternating between the two active keep-routes.
    */
  private def writeShards(dir: File): Unit =
    (0 until ShardCount).foreach { si =>
      val lines = (0 until RecordsPerShard).map { i =>
        val e =
          if (i % 2 == 0)
            Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
              Map("source_id" -> "gorouter"),
              Some(LogMessage(s"router line $si-$i", "OUT", 42L,
                Fixtures.AppGuid, "OTHER", "router/0")))
          else
            Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
              Map.empty,
              Some(LogMessage(s"app line $si-$i", "OUT", 42L,
                Fixtures.AppGuid, "APP/PROC/WEB", s"APP/PROC/WEB/$si")))
        s"s$si-$i,${Fixtures.ArrivalMs},${Base64.getEncoder.encodeToString(EnvelopeCodec.encode(e))}"
      }
      Files.write(new File(dir, f"shard-$si%03d.log").toPath,
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }

  test("kill/restart soak: crashes inside the commit window and graceful kills never duplicate a doc_id") {
    val srcDir = Files.createTempDirectory("graft_soak_src").toFile
    val outDir = Files.createTempDirectory("graft_soak_out").toString
    val ckDir = Files.createTempDirectory("graft_soak_ck").toString
    writeShards(srcDir)

    // driver-side bookkeeping (foreachBatch runs on the driver):
    // write attempts per batchId, so the test can PROVE the replay
    // actually happened rather than asserting a vacuous no-dup
    val attempts = new ConcurrentHashMap[Long, Integer]()
    // crash AFTER the sink write of these batchIds, first attempt only
    // — the exact at-least-once window a process kill can land in
    val crashAfter = Set(1L, 3L, 5L)

    def startQuery(trigger: Trigger): StreamingQuery = {
      val records = spark.readStream
        .format(classOf[ShardedRecordSource].getName)
        .option("path", srcDir.getAbsolutePath)
        .option("maxRecordsPerBatch", "8") // 80 records → ≥10 batches
        .load()
      Pipeline.assemble(records, Fixtures.dims(spark))
        .writeStream
        .option("checkpointLocation", ckDir)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          StreamingPipeline.sinkDocs(batch, batchId, outDir)
          val n = attempts.merge(batchId, 1, (a, b) => a + b)
          if (crashAfter.contains(batchId) && n == 1)
            throw new RuntimeException(s"injected kill after sink write of batch $batchId")
        }
        .start()
    }

    // three crash-kill cycles: each run dies inside the window where
    // the sink wrote but the offset log never committed; each restart
    // must replay that batch (same batchId, same offsets)
    crashAfter.toSeq.sorted.foreach { expected =>
      val q = startQuery(Trigger.AvailableNow())
      val ex = intercept[StreamingQueryException] { q.awaitTermination() }
      assert(ex.getMessage.contains(s"injected kill after sink write of batch $expected"),
        s"expected crash after batch $expected: ${ex.getMessage}")
    }

    // one graceful kill mid-drain (query.stop() between micro-batches,
    // the operator-initiated shutdown path), then restart
    val qStop = startQuery(Trigger.ProcessingTime(0))
    val deadline = System.nanoTime() + 60e9.toLong
    while (qStop.recentProgress.count(_.numInputRows > 0) < 1 && System.nanoTime() < deadline)
      Thread.sleep(25)
    qStop.stop()
    qStop.awaitTermination(60000)

    // final drain to completion
    val qFinal = startQuery(Trigger.AvailableNow())
    qFinal.awaitTermination(120000)

    // every injected crash produced a real replay: the batch was
    // written ≥2 times (first attempt + post-restart re-execution)
    crashAfter.foreach { id =>
      assert(attempts.get(id) != null && attempts.get(id) >= 2,
        s"batch $id was never replayed (attempts=${attempts.get(id)}) — the soak tested nothing")
    }

    // zero duplicate doc_ids in the RAW sink (not a dedup view): the
    // replayed batches overwrote their own batchId dirs
    val sink = spark.read.parquet(outDir)
    val total = sink.count()
    val distinctIds = sink.select("doc_id").distinct().count()
    val expected = (ShardCount * RecordsPerShard).toLong
    assert(total == expected, s"sink rows $total != $expected (lost or duplicated records)")
    assert(distinctIds == expected, s"duplicate doc_ids: $total rows, $distinctIds distinct")

    // end-to-end parity: the soaked streaming sink carries exactly the
    // documents the batch pipeline computes over the same shard files
    val batchDocs = Pipeline.toJsonDocs(
        Pipeline.assemble(
          spark.read.format(classOf[ShardedRecordSource].getName)
            .option("path", srcDir.getAbsolutePath).load(),
          Fixtures.dims(spark)))
      .select("doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val streamedDocs = sink.select("doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamedDocs.toSeq == batchDocs.toSeq)
  }
}
