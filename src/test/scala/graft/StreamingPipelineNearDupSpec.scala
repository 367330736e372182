package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.pipeline.{Envelope, EnvelopeCodec, LogMessage, Pipeline}
import graft.sources.ShardedRecordSource
import graft.streaming.{StreamingDedup, StreamingPipeline}

/** The ingest-time near-dup monitor fused into the FLAGSHIP chain
  * ([[StreamingPipeline.startWithNearDup]]): decode → route → grok →
  * enrich → sink, with every micro-batch also folded into the
  * persistent signature store keyed on the sink's own doc_id. Driven
  * through the Kinesis-shaped [[ShardedRecordSource]] with planted
  * near-duplicate log lines — including a crash inside the
  * at-least-once window — the monitor must (a) detect exactly the
  * pairs the batch MinHash-LSH chain finds over the same documents,
  * and (b) leave the sink's effectively-once contract intact.
  */
class StreamingPipelineNearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val ShardCount = 2
  private val RecordsPerShard = 24

  /** A 12-token log line: `group` selects the shared sentence body,
    * `variant` perturbs the final token — variant 0 twins are EXACT
    * duplicates, nonzero variants are near-duplicates (1 of 10
    * shingles differs). Distinct groups share no tokens.
    */
  private def line(group: Int, variant: Int): String = {
    val toks = (0 until 11).map(t => s"g${group}w$t")
    (toks :+ (if (variant == 0) s"g${group}tail" else s"g${group}alt$variant"))
      .mkString(" ")
  }

  /** 48 routable records. Every record in group `i % 6`; shard 0 gets
    * variant 0, shard 1 alternates variants 0/1 — so each group holds
    * cross-shard exact dups AND near-dups, and with 8-record batches
    * the pairs straddle micro-batch boundaries.
    */
  private def writeShards(dir: File): Unit =
    (0 until ShardCount).foreach { si =>
      val lines = (0 until RecordsPerShard).map { i =>
        val msg = line(i % 6, if (si == 0) 0 else i % 2)
        val e =
          if (i % 2 == 0)
            Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
              Map("source_id" -> "gorouter"),
              Some(LogMessage(msg, "OUT", 42L,
                Fixtures.AppGuid, "OTHER", "router/0")))
          else
            Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
              Map.empty,
              Some(LogMessage(msg, "OUT", 42L,
                Fixtures.AppGuid, "APP/PROC/WEB", s"APP/PROC/WEB/$si")))
        s"s$si-$i,${Fixtures.ArrivalMs},${Base64.getEncoder.encodeToString(EnvelopeCodec.encode(e))}"
      }
      Files.write(new File(dir, f"shard-$si%03d.log").toPath,
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }

  private def sourceStream(srcDir: File): DataFrame =
    spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .option("maxRecordsPerBatch", "8")
      .load()

  /** Batch ground truth over the same shard files: the corpus the
    * monitor dedups (doc_id, parsed message), through q21's chain.
    */
  private def rebuild(srcDir: File): Set[(String, String, Double)] = {
    val corpus = Pipeline.assemble(
        spark.read.format(classOf[ShardedRecordSource].getName)
          .option("path", srcDir.getAbsolutePath).load(),
        Fixtures.dims(spark))
      .select(Pipeline.docId.as("doc_id"),
        col("env.log_message.message").as("text"))
    Dedup.lshCandidates(
        Dedup.materialize(Dedup.minhashSigTable(corpus, "doc_id", "text", 16)),
        "doc_id", "sig", 4, 4)
      .withColumn("est_jaccard", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") * 32 >= lit(16))
      .select("id_a", "id_b", "est_jaccard")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
  }

  test("fused chain detects the batch chain's pairs and keeps sink parity through a crash-window replay") {
    val srcDir = Files.createTempDirectory("graft_neardup_src").toFile
    val outDir = Files.createTempDirectory("graft_neardup_out").toString
    val ckDir = Files.createTempDirectory("graft_neardup_ck").toString
    val statePath = Files.createTempDirectory("graft_neardup_state").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_neardup_pairs").toString + "/pairs"
    writeShards(srcDir)

    // first run: the startWithNearDup BODY plus an injected kill AFTER
    // the batch's sink + state writes but BEFORE the offset commit —
    // the exact window a process crash can land in
    val attempts = new ConcurrentHashMap[Long, Integer]()
    val crashed = Pipeline.assemble(sourceStream(srcDir), Fixtures.dims(spark))
      .writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          StreamingPipeline.sinkDocs(b, batchId, outDir)
          val docs = b.select(Pipeline.docId.as("doc_id"),
            col("env.log_message.message").as("text"))
          StreamingDedup.foldBatchPersistent(statePath, docs, batchId,
            pairsDir = Some(pairsDir)): Unit
        } finally b.unpersist(): Unit
        val n = attempts.merge(batchId, 1, (a, b) => a + b)
        if (batchId == 1L && n == 1)
          throw new RuntimeException("injected kill after near-dup fold of batch 1")
      }
      .start()
    val ex = intercept[StreamingQueryException] { crashed.awaitTermination() }
    assert(ex.getMessage.contains("injected kill after near-dup fold of batch 1"))

    // restart from the same checkpoint with the PRODUCTION entry point:
    // batch 1 replays (idempotent overwrite of its sink/state/pairs
    // dirs), then the stream drains
    val q = StreamingPipeline.startWithNearDup(sourceStream(srcDir),
      Fixtures.dims(spark), ckDir, outDir, statePath, pairsDir,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    // the monitor's lifetime emissions == the batch chain, exactly,
    // with no duplicate emission despite the forced replay
    val expected = rebuild(srcDir)
    assert(expected.nonEmpty, "fixture must plant near-dup log lines")
    val emitted = StreamingDedup.pairsView(spark, pairsDir)
      .map(_.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq)
      .getOrElse(Seq.empty)
    assert(emitted.size == emitted.toSet.size, "a replayed batch re-emitted pairs")
    assert(emitted.toSet == expected)

    // both exact twins (est = 1.0) and near twins (est < 1.0) surfaced
    assert(emitted.exists(_._3 == 1.0) && emitted.exists(_._3 < 1.0))

    // the signature state is exactly one row per sink document
    val sink = spark.read.parquet(outDir)
    val docIds = sink.select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(docIds.distinct == docIds, "duplicate doc_ids in the sink")
    val stateIds = spark.read.parquet(statePath)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(stateIds == docIds, "state ids diverged from sink doc ids")

    // sink parity with the batch pipeline (the soak invariant): the
    // fused monitor must not perturb the document stream
    val batchDocs = Pipeline.toJsonDocs(
        Pipeline.assemble(
          spark.read.format(classOf[ShardedRecordSource].getName)
            .option("path", srcDir.getAbsolutePath).load(),
          Fixtures.dims(spark)))
      .select("doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val streamedDocs = sink.select("doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(streamedDocs == batchDocs)
  }
}
