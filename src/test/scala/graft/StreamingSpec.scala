package graft

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{EnvelopeCodec, Pipeline, SourceRecord}
import graft.streaming.StreamingPipeline

/** Streaming semantics: same DataFrame plan as batch, micro-batch
  * execution, checkpointed restart, watermark late-data drop, and the
  * observed-metrics counters.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def sourceRecords: Seq[SourceRecord] =
    Fixtures.envelopes.zipWithIndex.map { case ((_, e), i) =>
      SourceRecord(EnvelopeCodec.encode(e), i.toString, new Timestamp(Fixtures.ArrivalMs))
    } :+ SourceRecord(Array[Byte](0x7f, 0x00, 0x03), "malformed", new Timestamp(Fixtures.ArrivalMs))

  test("streaming pipeline produces the same documents as batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val metrics = StreamingPipeline.registerMetrics(spark)
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    stream.addData(sourceRecords)
    val q = StreamingPipeline.start(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir).select("es_index", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val batch = Pipeline.toJsonDocs(
        Pipeline.assemble(Fixtures.records(spark), Fixtures.dims(spark)))
      .select("es_index", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)

    // the observe() counters saw every record incl. the malformed one.
    // Listener delivery is async — poll until the bus drains.
    val deadline = System.nanoTime() + 30e9.toLong
    while (metrics.recordsTotal.get() < sourceRecords.length && System.nanoTime() < deadline)
      Thread.sleep(50)
    spark.streams.removeListener(metrics)
    assert(metrics.recordsTotal.get() == sourceRecords.length)
    assert(metrics.malformedTotal.get() == 1)
  }

  test("checkpointed restart resumes offsets, no output duplication") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_restart_out").toString
    val ckDir = Files.createTempDirectory("graft_restart_ck").toString

    stream.addData(sourceRecords)
    val q1 = StreamingPipeline.start(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
    q1.awaitTermination(120000)
    val afterFirst = spark.read.parquet(outDir).count()

    // restart from the same checkpoint with only new data pending
    stream.addData(sourceRecords)
    val q2 = StreamingPipeline.start(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val afterSecond = spark.read.parquet(outDir).count()
    assert(afterFirst > 0 && afterSecond == 2 * afterFirst)
  }

  test("dead-letter path quarantines malformed records; documents unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_dlq_out").toString
    val ckDir = Files.createTempDirectory("graft_dlq_ck").toString
    val dlqDir = Files.createTempDirectory("graft_dlq_dlq").toString
    stream.addData(sourceRecords)
    val q = StreamingPipeline.startWithDeadLetter(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, dlqDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    // same documents as the plain sink path
    val streamed = spark.read.parquet(outDir).select("es_index", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val batch = Pipeline.toJsonDocs(
        Pipeline.assemble(Fixtures.records(spark), Fixtures.dims(spark)))
      .select("es_index", "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamed.toSeq == batch.toSeq)

    // the malformed record landed in quarantine with its raw payload
    val dlq = spark.read.parquet(dlqDir)
      .select("sequenceNumber", "data").collect()
    assert(dlq.length === 1)
    assert(dlq.head.getString(0) === "malformed")
    assert(dlq.head.getAs[Array[Byte]](1).toSeq === Seq[Byte](0x7f, 0x00, 0x03))
  }

  test("prometheus wiring: counters publish as metrics-system gauges") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the /metrics/prometheus servlet is turned on by configuration;
    // assert the documented conf, then assert the data path it would
    // serve: listener counters -> metrics-system gauges
    assert(GraftSession.prometheusConf("spark.ui.prometheus.enabled") === "true")
    assert(GraftSession.prometheusConf("spark.ui.enabled") === "true")

    val metrics = StreamingPipeline.registerMetrics(spark, publish = true)
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_prom_out").toString
    val ckDir = Files.createTempDirectory("graft_prom_ck").toString
    stream.addData(sourceRecords)
    val q = StreamingPipeline.start(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val deadline = System.nanoTime() + 30e9.toLong
    while (metrics.recordsTotal.get() < sourceRecords.length && System.nanoTime() < deadline)
      Thread.sleep(50)
    spark.streams.removeListener(metrics)

    val sc = spark.sparkContext
    assert(org.apache.spark.GraftMetrics.gaugeValue(sc, "graft_pipeline", "records_total")
      === Some(sourceRecords.length.toLong))
    assert(org.apache.spark.GraftMetrics.gaugeValue(sc, "graft_pipeline", "malformed_total")
      === Some(1L))
  }

  test("dead-letter path writes no batch dirs when nothing is malformed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_dlq_ok_out").toString
    val ckDir = Files.createTempDirectory("graft_dlq_ok_ck").toString
    val dlqDir = Files.createTempDirectory("graft_dlq_ok_dlq").toString
    stream.addData(sourceRecords.filter(_.sequenceNumber != "malformed"))
    val q = StreamingPipeline.startWithDeadLetter(
      stream.toDF(), Fixtures.dims(spark), ckDir, outDir, dlqDir, Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() > 0)
    // the healthy case leaves NO per-batch dirs behind — an all-empty
    // dlq tree would fail parquet schema inference for inspection tools
    val leftovers = new java.io.File(dlqDir).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      s"unexpected DLQ output: ${Option(leftovers).toSeq.flatten.mkString(", ")}")
  }

  test("currentView resolves a re-emitted doc_id to the latest batch, like an ES overwrite") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft_curview").toString
    // batch 0: two docs; batch 7: doc "a" re-emitted with new content
    Seq(("idx-2024.01.01", "a", "{\"v\":1}"), ("idx-2024.01.01", "b", "{\"v\":1}"))
      .toDF("es_index", "doc_id", "doc")
      .write.partitionBy("es_index").parquet(s"$outDir/batch=0")
    Seq(("idx-2024.01.01", "a", "{\"v\":2}"))
      .toDF("es_index", "doc_id", "doc")
      .write.partitionBy("es_index").parquet(s"$outDir/batch=7")

    val view = StreamingPipeline.currentView(spark, outDir)
      .select("doc_id", "doc").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(view.toSeq === Seq(("a", "{\"v\":2}"), ("b", "{\"v\":1}")))
  }

  test("watermark drops data later than the threshold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Timestamp, String)]
    val events = stream.toDF().toDF("ts", "family")
    val agg = StreamingPipeline.windowedCounts(events, "ts", "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("wm_counts")
      .outputMode("append").start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    stream.addData((t(1, 0), "a"), (t(1, 30), "a"))
    q.processAllAvailable()
    // advance watermark far past hour 1: wm = 09:00 - 10min
    stream.addData((t(9, 0), "a"))
    q.processAllAvailable()
    // late arrival for the already-finalized hour-1 window: dropped
    stream.addData((t(1, 45), "a"))
    q.processAllAvailable()
    stream.addData((t(12, 0), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_counts")
      .select(col("win_start"), col("cnt")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows("2024-01-01 01:00:00.0") == 2L) // late row not counted
  }

  test("stream-stream interval join: in-window purchases attach, out-of-window don't") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingPipeline.streamIntervalJoin(
      buys.toDF().toDF("user_id", "p_ts", "value"), "p_ts", "10 minutes",
      clicks.toDF().toDF("click_id", "user_id", "c_ts"), "c_ts", "10 minutes",
      "5 minutes", Seq("user_id"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()

    clicks.addData((100L, 1L, t(10, 0)), (200L, 2L, t(10, 10)))
    buys.addData(
      (1L, t(10, 2), 5.0),  // in window of click 100
      (1L, t(10, 9), 7.0),  // 9 min after click 100: outside 5-min window
      (3L, t(10, 1), 9.0))  // no click for user 3
    q.processAllAvailable()
    // a later purchase matches the second click once both sides progress
    buys.addData((2L, t(10, 12), 11.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attrib").select("click_id", "value")
      .as[(Long, Double)].collect().toSet
    assert(got === Set((100L, 5.0), (200L, 11.0)))
  }
}

/** flatMapGroupsWithState sessionization: sessions close on in-batch
  * gaps and on event-time timeout as the watermark advances.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("gap-based sessions close in-batch and via watermark timeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Sessionize
    val stream = MemoryStream[(Long, Timestamp)]
    val df = stream.toDF().toDF("user_id", "ts")
    val out = Sessionize.sessionsFromTimestamps(df, "10 minutes", gapMs = 30 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two events 10 min apart (one session), then a 3-hour jump
    // (closes session 1 in-batch on the next event's arrival)
    stream.addData((1L, t(1, 0)), (1L, t(1, 10)))
    q.processAllAvailable()
    stream.addData((1L, t(4, 0)))
    q.processAllAvailable()
    // advance watermark way past 4:00 + gap → closes session 2 by timeout
    stream.addData((2L, t(9, 0)))
    q.processAllAvailable()
    stream.addData((2L, t(23, 0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions").as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.start_ms, s.n_events, s.dur_ms)).toSet
    assert(rows.contains((1L, t(1, 0).getTime, 2L, 10 * 60 * 1000L)))
    assert(rows.contains((1L, t(4, 0).getTime, 1L, 0L)))
  }

  test("custom sessionizer agrees with the built-in session_window aggregation") {
    // same gap semantics, two independent implementations: Spark's
    // native session_window (state store managed by the engine) must
    // emit the same (user, start, count) sessions as the
    // flatMapGroupsWithState operator — a cross-check that the custom
    // state logic implements standard gap-session semantics, not a
    // private variant.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Sessionize
    val gapMs = 30 * 60 * 1000L
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val data = Seq(
      (1L, t(1, 0)), (1L, t(1, 10)), (1L, t(1, 25)), // one 3-event session
      (1L, t(4, 0)),                                  // second session after gap
      (2L, t(2, 0)), (2L, t(2, 30)),                  // exactly the gap: BOTH merge (inclusive boundary)
      (3L, t(5, 0)))
    val closer = Seq((9L, t(23, 0)))                  // watermark push to close all

    def run[A](name: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[A]): org.apache.spark.sql.DataFrame = {
      val stream = MemoryStream[(Long, Timestamp)]
      val out = build(stream.toDF().toDF("user_id", "ts"))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      stream.addData(data); q.processAllAvailable()
      stream.addData(closer); q.processAllAvailable()
      q.stop()
      spark.table(name)
    }

    val custom = run("cust_sessions")(df =>
        Sessionize.sessionsFromTimestamps(df, "10 minutes", gapMs))
      .select(col("user_id"), col("start_ms"), col("n_events"))
      .filter(col("user_id") < 9)
    val builtin = run("sw_sessions") { df =>
      df.withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_millis(col("w.start")).as("start_ms"), col("n_events"))
        .as[(Long, Long, Long)]
    }.filter(col("user_id") < 9)
    assert(custom.count() > 0)
    assert(custom.exceptAll(builtin).isEmpty && builtin.exceptAll(custom).isEmpty,
      s"custom=${custom.collect().toSeq} builtin=${builtin.collect().toSeq}")
  }
}

/** Per-batch dimension refresh: the stream-static broadcast join sees
  * dimension updates without a query restart (SURVEY §2 row 6 — the
  * TTL'd cache, with refresh granularity = trigger).
  */
class DimRefreshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("renamed app appears in the next micro-batch's documents") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.pipeline.Enrich

    val dimDir = Files.createTempDirectory("graft_dims").toString
    def writeDims(appName: String): Unit = {
      val apps = Seq((Fixtures.AppGuid, appName, "5e0d2e2e-0000-0000-0000-000000000001"))
        .toDF("app_guid", "name", "space_guid")
      val spaces = Seq(("5e0d2e2e-0000-0000-0000-000000000001", "prod",
        "a1b2c3d4-0000-0000-0000-000000000001")).toDF("space_guid", "name", "org_guid")
      val orgs = Seq(("a1b2c3d4-0000-0000-0000-000000000001", "agency")).toDF("org_guid", "name")
      Enrich.resolveDims(apps, spaces, orgs)
        .write.mode("overwrite").parquet(dimDir)
    }

    val keep = Fixtures.envelopes.collectFirst {
      case ("keep_tag_gorouter", e) => e
    }.get
    def record(seq: String) = SourceRecord(
      graft.pipeline.EnvelopeCodec.encode(keep), seq, new Timestamp(Fixtures.ArrivalMs))

    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_dimref_out").toString
    val ckDir = Files.createTempDirectory("graft_dimref_ck").toString

    writeDims("myapp-venerable")
    stream.addData(record("s1"))
    val q1 = StreamingPipeline.startWithDimRefresh(
      stream.toDF(), () => spark.read.parquet(dimDir), ckDir, outDir, Trigger.AvailableNow())
    q1.awaitTermination(120000)

    writeDims("renamed-blue")
    stream.addData(record("s2"))
    val q2 = StreamingPipeline.startWithDimRefresh(
      stream.toDF(), () => spark.read.parquet(dimDir), ckDir, outDir, Trigger.AvailableNow())
    q2.awaitTermination(120000)

    val docs = spark.read.parquet(outDir).select("doc").collect().map(_.getString(0))
    assert(docs.length == 2)
    assert(docs.exists(_.contains("\"@cf.app\":\"myapp\"")))     // suffix-stripped v1
    assert(docs.exists(_.contains("\"@cf.app\":\"renamed\"")))   // refreshed v2
  }

  test("jittered-TTL refresh: mid-window batches reuse the snapshot, expiry reloads") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.pipeline.{Enrich, LazyFillCache}

    val dimDir = Files.createTempDirectory("graft_dims_ttl").toString
    def writeDims(appName: String): Unit = {
      val apps = Seq((Fixtures.AppGuid, appName, "5e0d2e2e-0000-0000-0000-000000000001"))
        .toDF("app_guid", "name", "space_guid")
      val spaces = Seq(("5e0d2e2e-0000-0000-0000-000000000001", "prod",
        "a1b2c3d4-0000-0000-0000-000000000001")).toDF("space_guid", "name", "org_guid")
      val orgs = Seq(("a1b2c3d4-0000-0000-0000-000000000001", "agency")).toDF("org_guid", "name")
      Enrich.resolveDims(apps, spaces, orgs)
        .write.mode("overwrite").parquet(dimDir)
    }
    val keep = Fixtures.envelopes.collectFirst {
      case ("keep_tag_gorouter", e) => e
    }.get
    def record(seq: String) = SourceRecord(
      graft.pipeline.EnvelopeCodec.encode(keep), seq, new Timestamp(Fixtures.ArrivalMs))

    var clock = 0L
    var fills = 0
    val cache = new LazyFillCache[Unit, org.apache.spark.sql.DataFrame](1000,
      _ => { fills += 1; spark.read.parquet(dimDir).localCheckpoint() },
      () => clock, () => 1.0)
    val stream = MemoryStream[SourceRecord]
    val outDir = Files.createTempDirectory("graft_dimttl_out").toString
    val ckDir = Files.createTempDirectory("graft_dimttl_ck").toString

    def run(): Unit = {
      val q = StreamingPipeline.startWithDimCache(
        stream.toDF(), cache, ckDir, outDir, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    writeDims("myapp-venerable")
    stream.addData(record("s1")); run()
    writeDims("renamed-blue") // dims change ON DISK...
    stream.addData(record("s2")); run() // ...but the TTL has not lapsed
    clock = 2000              // TTL lapses
    stream.addData(record("s3")); run()

    val docs = spark.read.parquet(outDir).select("doc").collect().map(_.getString(0))
    assert(docs.length == 3)
    // batches inside one TTL window see the SAME snapshot (stale by
    // design — the reference's 6h-jittered-TTL staleness contract);
    // the first batch after expiry sees the reload
    assert(docs.count(_.contains("\"@cf.app\":\"myapp\"")) == 2)
    assert(docs.count(_.contains("\"@cf.app\":\"renamed\"")) == 1)
    assert(fills == 2)
  }
}

/** Streaming exact dedup: dropDuplicatesWithinWatermark bounds the
  * dedup state by event time — the streaming twin of q20_dedup_exact
  * for continuous training-data ingestion.
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("duplicates within the watermark window are dropped once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Timestamp)]
    val deduped = stream.toDF().toDF("doc_key", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    stream.addData(("a", t(1, 0)), ("a", t(1, 1)), ("b", t(1, 2)))
    q.processAllAvailable()
    stream.addData(("a", t(1, 3))) // still within watermark: dropped
    q.processAllAvailable()
    q.stop()

    val keys = spark.table("dedup_stream").select("doc_key")
      .collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b"))
  }
}
