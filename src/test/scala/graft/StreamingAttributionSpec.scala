package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Attribution
import graft.streaming.Attribution.Ev

/** Streaming last-touch attribution ([[Attribution]]): batch/stream
  * parity under arbitrary micro-batch boundaries, cross-batch state
  * carry, lookback expiry, and event-time-timeout state cleanup.
  */
class StreamingAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val LookbackMs = 60000L

  private def t(ms: Long) = new Timestamp(ms)

  /** The q110 batch-window formulation over the same rows. */
  private def batchAttribution(rows: Seq[Ev]): Set[(Long, Long, String)] = {
    import spark.implicits._
    val df = rows.map(e => (e.user_id, e.event_id, e.ts_ms, e.is_click, e.channel))
      .toDF("user_id", "event_id", "ts_ms", "is_click", "channel")
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("lc_ts", last(when(col("is_click"), col("ts_ms")), ignoreNulls = true).over(w))
      .withColumn("lc_ch", last(when(col("is_click"), col("channel")), ignoreNulls = true).over(w))
      .filter(!col("is_click"))
      .select(col("user_id"), col("event_id"),
        when(col("lc_ts").isNotNull && col("ts_ms") - col("lc_ts") <= LookbackMs,
          col("lc_ch")).otherwise(lit("unattributed")).as("channel"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
  }

  private def streamAttribution(batches: Seq[Seq[Ev]]): (Set[(Long, Long, String)], Seq[Long]) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val name = s"attr_${System.nanoTime()}"
    val q = Attribution.attribute(
        stream.toDS().withWatermark("ts", "0 seconds").as[Ev], LookbackMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    (got, stateRows)
  }

  private def ev(u: Long, id: Long, ms: Long, click: Boolean, ch: String = null) =
    Ev(u, id, t(ms), click, if (click) ch else null)

  test("parity with the batch window under arbitrary batch boundaries") {
    val rnd = new scala.util.Random(17L)
    // 3 users, interleaved clicks/purchases, planted same-ts pairs,
    // gaps straddling the lookback; globally time-ordered stream
    val all = (0 until 240).map { i =>
      val u = rnd.nextInt(3).toLong
      // +1h so no event sits at the initial watermark (epoch 0): a
      // ts-0 row is "late" to the zeroed watermark and silently drops
      val ms = 3600000L + i.toLong * 7000 + rnd.nextInt(3) // collisions across users
      val click = rnd.nextInt(3) != 0
      ev(u, 1000L + i, ms, click, Seq("a", "b", "c")(rnd.nextInt(3)))
    }.sortBy(e => e.ts_ms)
    val expected = batchAttribution(all)
    for (nb <- Seq(1, 3, 8)) {
      val size = math.ceil(all.size.toDouble / nb).toInt
      val (got, _) = streamAttribution(all.grouped(size).toSeq)
      assert(got === expected, s"diverged from batch window at $nb batches")
    }
  }

  test("a click in one batch attributes a purchase in a later batch") {
    val b1 = Seq(ev(1, 1, 1000, click = true, "search"))
    val b2 = Seq(ev(1, 2, 30000, click = false))
    val (got, _) = streamAttribution(Seq(b1, b2))
    assert(got === Set((1L, 2L, "search")))
  }

  test("purchase beyond the lookback is unattributed; same-ts click counts") {
    val b1 = Seq(ev(2, 1, 1000, click = true, "email"))
    val b2 = Seq(
      ev(2, 2, 1000 + LookbackMs + 1, click = false),  // expired
      ev(2, 3, 1000 + LookbackMs + 2, click = true, "social"),
      ev(2, 4, 1000 + LookbackMs + 2, click = false))  // same-ts, later id
    val (got, _) = streamAttribution(Seq(b1, b2))
    assert(got === Set(
      (2L, 2L, "unattributed"),
      (2L, 4L, "social")))
  }

  test("a late OLDER click under a lenient watermark does not regress stored last-touch state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val name = s"attr_late_${System.nanoTime()}"
    // 10-minute watermark delay admits cross-batch event-time disorder
    val q = Attribution.attribute(
        stream.toDS().withWatermark("ts", "10 minutes").as[Ev], LookbackMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(Seq(ev(1, 2, 3700000, click = true, "newer")))
    q.processAllAvailable()
    // late but within watermark: an OLDER click, then a purchase after both
    stream.addData(Seq(
      ev(1, 1, 3650000, click = true, "older"),
      ev(1, 3, 3710000, click = false)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(1), r.getString(3))).toSet
    assert(got === Set((3L, "newer")), "last-touch must stay on the newest click by event time")
  }

  test("a late purchase never credits an event-time-FUTURE stored click") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val name = s"attr_future_${System.nanoTime()}"
    val q = Attribution.attribute(
        stream.toDS().withWatermark("ts", "10 minutes").as[Ev], LookbackMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(Seq(ev(1, 5, 3700000, click = true, "newer")))
    q.processAllAvailable()
    // late batch inside the watermark: an older click then a purchase
    // BEFORE the stored click's event time — crediting "newer" would
    // attribute a click that happens after the purchase
    stream.addData(Seq(
      ev(1, 1, 3650000, click = true, "older"),
      ev(1, 2, 3655000, click = false)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(1), r.getString(3))).toSet
    assert(got === Set((2L, "unattributed")))
  }

  test("stale stored click past the horizon in a DATA batch: drop, don't set a below-watermark timeout") {
    // back-to-back data batches (file source, 1 file/trigger) never
    // take the hasTimedOut path; batch 3's fold sees user 1's stored
    // click with horizon far below the watermark batch 2 advanced —
    // setTimeoutTimestamp there throws and kills the query unless the
    // expired click is dropped
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr_files").toFile
    try {
      def write(n: String, mtime: Long, rows: Seq[Ev]): Unit = {
        rows.toDS().coalesce(1).write.parquet(s"$dir/in/$n")
        // the file source orders by modification time — pin it so the
        // three files become three ordered micro-batches
        new java.io.File(s"$dir/in/$n").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(_.setLastModified(mtime))
      }
      write("f1", 1000000L, Seq(ev(1, 1, 100000, click = true, "a")))
      write("f2", 2000000L, Seq(ev(9, 2, 5000000, click = true, "b")))
      write("f3", 3000000L, Seq(ev(1, 3, 5100000, click = false)))
      val name = s"attr_files_${System.nanoTime()}"
      val q = Attribution.attribute(
          spark.readStream.schema(Seq.empty[Ev].toDS().schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
            .withWatermark("ts", "0 seconds").as[Ev], LookbackMs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      q.processAllAvailable()
      q.stop()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val got = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getString(3))).toSet
      assert(got === Set((3L, "unattributed")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("event-time timeout removes expired per-user click state") {
    val b1 = Seq(ev(1, 1, 1000, click = true, "a"), ev(2, 2, 1000, click = true, "b"))
    // watermark jumps far past both clicks' lookback horizons — their
    // state rows must be reaped, not retained forever
    val b2 = Seq(ev(3, 3, 1000 + 100 * LookbackMs, click = true, "c"))
    val b3 = Seq(ev(3, 4, 1000 + 102 * LookbackMs, click = false))
    val (got, stateRows) = streamAttribution(Seq(b1, b2, b3))
    assert(got === Set((3L, 4L, "unattributed")))
    assert(stateRows.nonEmpty && stateRows.max >= 2 && stateRows.last <= 1,
      s"state not reaped: $stateRows")
  }
}
