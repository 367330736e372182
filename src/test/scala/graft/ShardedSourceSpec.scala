package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EnvelopeCodec
import graft.sources.ShardedRecordSource
import graft.streaming.StreamingPipeline

/** The Kinesis-shaped custom source: shard enumeration, per-shard
  * slices, offset resume across restart, batch-mode read.
  */
class ShardedSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def writeShards(dir: File, firstBatch: Boolean): Unit = {
    val keep = Fixtures.envelopes.filter(_._1.startsWith("keep_")).map(_._2)
    Seq("shard-000.log", "shard-001.log").zipWithIndex.foreach { case (name, si) =>
      val lines = keep.zipWithIndex.map { case (e, i) =>
        val seq = s"${if (firstBatch) "a" else "b"}$si-$i"
        val b64 = Base64.getEncoder.encodeToString(EnvelopeCodec.encode(e))
        s"$seq,${Fixtures.ArrivalMs},$b64"
      }
      val f = new File(dir, name)
      val prev = if (f.exists()) Files.readString(f.toPath) else ""
      Files.writeString(f.toPath, prev + lines.mkString("", "\n", "\n"))
    }
  }

  test("micro-batch read + offset resume across restart") {
    val srcDir = Files.createTempDirectory("graft_shards").toFile
    val outDir = Files.createTempDirectory("graft_shards_out").toString
    val ckDir = Files.createTempDirectory("graft_shards_ck").toString
    writeShards(srcDir, firstBatch = true)

    def run(): Long = {
      val records = spark.readStream
        .format(classOf[ShardedRecordSource].getName)
        .option("path", srcDir.getAbsolutePath)
        .load()
      val q = StreamingPipeline.start(
        records, Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
      q.awaitTermination(120000)
      spark.read.parquet(outDir).count()
    }

    val afterFirst = run()
    // 4 keep-envelopes × 2 shards
    assert(afterFirst == 8L)

    // append a second batch of records; restart resumes from offsets
    writeShards(srcDir, firstBatch = false)
    val afterSecond = run()
    assert(afterSecond == 16L)

    // doc_id = md5(index:sequence): all distinct ⇔ no record replayed
    val distinctIds = spark.read.parquet(outDir)
      .select("doc_id").distinct().count()
    assert(distinctIds == 16L)
  }

  test("resharding: a shard created mid-stream is discovered from TRIM_HORIZON") {
    // the reference enumerates shards once at Scan start
    // (consumer.go:103-110) and never sees a split/merge; latestOffset
    // here re-enumerates per trigger, so a new shard appears in the
    // next offset range with initial position 0 — exactly once
    val srcDir = Files.createTempDirectory("graft_reshard").toFile
    val outDir = Files.createTempDirectory("graft_reshard_out").toString
    val ckDir = Files.createTempDirectory("graft_reshard_ck").toString
    writeShards(srcDir, firstBatch = true) // shard-000, shard-001

    def run(): Long = {
      val records = spark.readStream
        .format(classOf[ShardedRecordSource].getName)
        .option("path", srcDir.getAbsolutePath)
        .load()
      val q = StreamingPipeline.start(
        records, Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
      q.awaitTermination(120000)
      spark.read.parquet(outDir).count()
    }

    assert(run() == 8L)

    // "shard split": a third shard appears after the first checkpoint
    val keep = Fixtures.envelopes.filter(_._1.startsWith("keep_")).map(_._2)
    val lines = keep.zipWithIndex.map { case (e, i) =>
      s"c2-$i,${Fixtures.ArrivalMs},${Base64.getEncoder.encodeToString(EnvelopeCodec.encode(e))}"
    }
    Files.writeString(new File(srcDir, "shard-002.log").toPath,
      lines.mkString("", "\n", "\n"))

    assert(run() == 12L) // 8 old + 4 from the new shard, nothing replayed
    assert(spark.read.parquet(outDir).select("doc_id").distinct().count() == 12L)
  }

  test("flagship parity: streaming over the sharded source == batch over the same records") {
    // the reference's whole value is ONE pipeline (decode → route →
    // grok → enrich → index docs); this diffs its two execution modes
    // end-to-end on the full record mix — every fixture envelope
    // (keep AND drop routes) plus an undecodable payload — not just
    // the per-operator pieces
    val srcDir = Files.createTempDirectory("graft_parity").toFile
    val outDir = Files.createTempDirectory("graft_parity_out").toString
    val ckDir = Files.createTempDirectory("graft_parity_ck").toString
    val lines = Fixtures.envelopes.zipWithIndex.map { case ((_, e), i) =>
      s"s-$i,${Fixtures.ArrivalMs},${Base64.getEncoder.encodeToString(EnvelopeCodec.encode(e))}"
    } :+ s"s-bad,${Fixtures.ArrivalMs},${Base64.getEncoder.encodeToString(Array[Byte](0x7f, 0x00, 0x03))}"
    Files.writeString(new File(srcDir, "shard-000.log").toPath,
      lines.mkString("", "\n", "\n"))

    val streamRecords = spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .load()
    val q = StreamingPipeline.start(
      streamRecords, Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(outDir)
      .select("es_index", "doc_id", "doc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted

    // batch mode reads the SAME shard files through the same source
    val batchRecords = spark.read
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .load()
    val batch = graft.pipeline.Pipeline.toJsonDocs(
        graft.pipeline.Pipeline.assemble(batchRecords, Fixtures.dims(spark)))
      .select("es_index", "doc_id", "doc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted

    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("fairCap: water-filling splits the budget without starving any shard") {
    val from = Map("a" -> 0L, "b" -> 0L, "c" -> 0L)
    val avail = Map("a" -> 100L, "b" -> 5L, "c" -> 10L)
    // round 1 (share 10): a+10 b+5 c+10; round 2: the 5 left go to a
    assert(ShardedRecordSource.fairCap(from, avail, 30L) ===
      Map("a" -> 15L, "b" -> 5L, "c" -> 10L))
    // budget >= backlog: everything drains
    assert(ShardedRecordSource.fairCap(from, avail, 1000L) === avail)
    // zero budget: offsets stand still
    assert(ShardedRecordSource.fairCap(from, avail, 0L) === from)
    // partially-consumed start positions count only the NEW backlog
    assert(ShardedRecordSource.fairCap(Map("a" -> 99L), Map("a" -> 100L, "b" -> 3L), 10L)
      === Map("a" -> 100L, "b" -> 3L))
  }

  test("maxRecordsPerBatch: deep backlog drains in bounded micro-batches") {
    val srcDir = Files.createTempDirectory("graft_capped").toFile
    // one deep shard + one shallow shard, 14 records total
    Seq("shard-000.log" -> 11, "shard-001.log" -> 3).foreach { case (name, n) =>
      val lines = (0 until n).map { i =>
        val b64 = Base64.getEncoder.encodeToString(s"payload-$name-$i".getBytes("UTF-8"))
        s"$name-$i,${Fixtures.ArrivalMs},$b64"
      }
      Files.writeString(new File(srcDir, name).toPath, lines.mkString("", "\n", "\n"))
    }
    val records = spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .option("maxRecordsPerBatch", "4")
      .load()
    val q = records.writeStream.format("memory").queryName("capped_drain")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_capped_ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("capped_drain").count() === 14L)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.forall(_ <= 4L), s"a micro-batch exceeded the cap: ${sizes.mkString(",")}")
    assert(sizes.length >= 4, s"14 rows at cap 4 need >= 4 batches: ${sizes.mkString(",")}")
  }

  test("batch-mode read sees all shards from position zero") {
    val srcDir = Files.createTempDirectory("graft_shards_b").toFile
    writeShards(srcDir, firstBatch = true)
    val df = spark.read
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir.getAbsolutePath)
      .load()
    assert(df.count() == 8L)
    assert(df.select("sequenceNumber").distinct().count() == 8L)
    // shard files define partitioning: one partition per shard
    assert(df.rdd.getNumPartitions == 2)
  }

  test("10x multi-shard drain: streamed == batch, shard purity + order hold per output file") {
    // the streaming twin of ScaleRehearsal (VERDICT r6 #5, shrunk to
    // spec scale): 10x the sf0.001 events across 4 shards through the
    // FULL pipeline under AvailableNow — then (a) the streamed corpus
    // equals a batch run over the same shard logs, and (b) every
    // output parquet file holds exactly one shard's documents in
    // nondecreasing sequence order, which together certify the
    // reference consumer's fan-out semantics (per-shard ordering) and
    // the shuffle-free fact path under MULTIPLE shards.
    val base = "/root/testdata/sf0.001"
    val srcDir = Files.createTempDirectory("graft_10x_src").toString
    val outDir = Files.createTempDirectory("graft_10x_out").toString
    val ckDir = Files.createTempDirectory("graft_10x_ck").toString
    val nShards = 4
    val total = StreamingRehearsal.synthesize(spark, base, 10, nShards, srcDir)
    assert(total == 10000L)

    val dims = QueriesRelational.flagshipDims(spark, base)
    val streamRecords = spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir)
      .option("maxRecordsPerBatch", "4096") // force several micro-batches
      .load()
    val q = StreamingPipeline.start(streamRecords, dims, ckDir, outDir,
      Trigger.AvailableNow())
    q.awaitTermination(300000)

    val audited = StreamingRehearsal.auditShardInvariants(spark, outDir, nShards)
    assert(audited > nShards,
      s"expected multiple per-shard output files, audited only $audited")

    val streamed = spark.read.parquet(outDir).select("es_index", "doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    val batchRecords = spark.read
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir)
      .load()
    val batch = graft.pipeline.Pipeline.toJsonDocs(
        graft.pipeline.Pipeline.assemble(batchRecords, dims))
      .select("es_index", "doc_id", "doc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }
}
