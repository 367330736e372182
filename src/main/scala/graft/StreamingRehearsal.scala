package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.{Envelope, EnvelopeCodec, LogMessage}
import graft.sources.ShardedRecordSource
import graft.streaming.StreamingPipeline

/** Streaming-path scale rehearsal (VERDICT r6 #5): the batch dedup
  * chain is rehearsed at 10× in [[ScaleRehearsal]]; this drains the
  * FLAGSHIP STREAMING path — [[ShardedRecordSource]] → decode → route
  * → grok → enrich → documents under `Trigger.AvailableNow` — over a
  * mult× multi-shard envelope set, and prints records/s plus
  * per-micro-batch wall (BASELINE.md §f).
  *
  * It also re-asserts the two shard invariants under MULTIPLE shards
  * (the reference consumer's fan-out semantics: one goroutine per
  * shard, per-shard ordering): every output parquet file contains
  * exactly one shard's documents in nondecreasing sequence order — a
  * shuffle anywhere on the fact path would interleave shards inside a
  * file, and an ordering break would show as a decreasing id.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.StreamingRehearsal [mult] [nShards]`.
  */
object StreamingRehearsal {

  /** Writes mult× the base events as `nShards` shard logs (lines of
    * `seq,arrivalMillis,base64(envelope)`, the [[ShardedRecordSource]]
    * format). Copy k offsets event ids by k·10⁸, so ids are unique and
    * each shard's file ascends in id.
    */
  def synthesize(spark: org.apache.spark.sql.SparkSession, base: String,
                 mult: Int, nShards: Int, srcDir: String): Long = {
    import spark.implicits._
    val events = Tables.events(spark, base)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"), col("ts_ms"))
      .as[(Long, Long, String, String, Long)]
    val lines = (0 until mult).map { k =>
      val off = k * 100000000L
      events.map { case (eid0, userId, eventType, props, tsMs) =>
        val eid = eid0 + off
        val env = Envelope(
          origin = "system.example.gov.au",
          event_type = if (eventType == "error") "ValueMetric" else "LogMessage",
          timestamp = tsMs * 1000000L,
          deployment = "cf", job = "router", index = "0", ip = "10.0.0.1",
          tags = if (eventType == "click") Map("source_id" -> "gorouter") else Map.empty,
          log_message = Some(LogMessage(
            message = props,
            message_type = "OUT",
            timestamp = tsMs * 1000000L,
            app_id = if (userId % 7 == 0) "" else SyntheticSource.guid(userId),
            source_type = if (eventType == "purchase") "APP/PROC/WEB" else "OTHER",
            source_instance = s"APP/PROC/WEB/$eid")))
        (eid % nShards, eid,
          s"$eid,$tsMs,${Base64.getEncoder.encodeToString(EnvelopeCodec.encode(env))}")
      }
    }.reduce(_ unionAll _).toDF("shard", "eid", "line")
    // clean slate: a prior run with a DIFFERENT shard count would
    // leave extra shard-*.log files that the source happily drains —
    // phantom records that silently corrupt every downstream number
    rmTree(new File(srcDir))
    new File(srcDir).mkdirs()
    // materialized once: the envelope build + protobuf encode + base64
    // otherwise recomputes per shard write AND for the count (n+1 full
    // passes over the synthesized corpus)
    val mat = graft.dedup.Dedup.materialize(lines)
    (0 until nShards).foreach { s =>
      val tmp = s"$srcDir/_shard$s"
      // explicit per-shard seq sort: the log must ascend in id for the
      // per-shard ordering audit to be meaningful downstream
      mat.filter(col("shard") === s).orderBy("eid").select("line")
        .coalesce(1).write.mode("overwrite").text(tmp)
      val part = new File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".txt"))
        .head
      Files.move(part.toPath, Paths.get(f"$srcDir/shard-$s%03d.log"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      rmTree(new File(tmp))
    }
    mat.count()
  }

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  /** Asserts shard purity + per-shard nondecreasing order for every
    * output parquet file; returns the number of files audited.
    */
  def auditShardInvariants(spark: org.apache.spark.sql.SparkSession,
                           outDir: String, nShards: Int): Long = {
    // monotonicity needs row order within the file: parquet preserves
    // row order per file, and monotonically_increasing_id() ascends
    // within a partition read in file order — a per-file window over
    // it recovers the written order ONLY if each file maps to exactly
    // one read split. Size-based bin packing would split a file larger
    // than maxPartitionBytes across partitions and scramble pos vs
    // file offset, so pin the conf to one-split-per-file for the
    // audit's actions and restore it after.
    val conf = spark.conf
    val savedMax = conf.get("spark.sql.files.maxPartitionBytes")
    conf.set("spark.sql.files.maxPartitionBytes", (1L << 40).toString)
    try {
      val ordered = spark.read.option("basePath", outDir).parquet(outDir)
        .select(input_file_name().as("file"),
          monotonically_increasing_id().as("pos"),
          expr("CAST(regexp_extract(get_json_object(doc, '$.fields.file_path')," +
            " 'APP/PROC/WEB/([0-9]+)', 1) AS BIGINT)").as("eid"))
        .filter(col("eid").isNotNull)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("file").orderBy("pos")
      val bad = ordered
        .withColumn("prev", lag(col("eid"), 1).over(w))
        .withColumn("shard", col("eid") % nShards)
        .withColumn("prev_shard", lag(col("shard"), 1).over(w))
        .filter((col("prev").isNotNull && col("eid") < col("prev")) ||
          (col("prev_shard").isNotNull && col("shard") =!= col("prev_shard")))
        .count()
      require(bad == 0L, s"$bad output rows violate shard purity/order")
      ordered.select("file").distinct().count()
    } finally conf.set("spark.sql.files.maxPartitionBytes", savedMax)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val nShards = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.get("local[32]", "32")
    val srcDir = s"/tmp/graft_stream_${mult}x"
    val outDir = s"/tmp/graft_stream_${mult}x_out"
    val ckDir = s"/tmp/graft_stream_${mult}x_ck"
    Seq(outDir, ckDir).foreach(d => rmTree(new File(d)))
    val total = synthesize(spark, base, mult, nShards, srcDir)

    val dims = QueriesRelational.flagshipDims(spark, base)
    val records = spark.readStream
      .format(classOf[ShardedRecordSource].getName)
      .option("path", srcDir)
      .option("maxRecordsPerBatch", (total / 8).max(1L).toString)
      .load()
    val t0 = System.nanoTime()
    val q = StreamingPipeline.start(records, dims, ckDir, outDir, Trigger.AvailableNow())
    // a timed-out drain must FAIL, not print a success-shaped line over
    // a partially-written output
    require(q.awaitTermination(600000), "drain did not finish within 10 minutes")
    val wall = (System.nanoTime() - t0) / 1e9
    val batches = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => s"""{"rows":${p.numInputRows},"ms":${p.durationMs.get("triggerExecution")}}""")
    val files = auditShardInvariants(spark, outDir, nShards)
    println(s"""{"metric":"streaming_rehearsal","scale":"${mult}x","shards":$nShards,""" +
      s""""records":$total,"wall_sec":${math.round(wall * 10) / 10.0},""" +
      s""""records_per_sec":${math.round(total / wall)},""" +
      s""""files_audited":$files,"batches":[${batches.mkString(",")}]}""")
    spark.stop()
  }
}
