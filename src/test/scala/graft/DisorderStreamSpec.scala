package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Disorder

/** Streaming twin of the q224 disorder audit: the per-shard running
  * max folds one row per shard, bucket counts fold additively, and —
  * because the running max at any arrival position equals
  * max(carried max, within-batch prior) — the fold over ANY
  * arrival-ordered batch boundaries reproduces the batch audit
  * EXACTLY, down to the share basis points.
  */
class DisorderStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  // sf0.01, not sf0.001: the jitter model needs the denser feed to
  // actually reorder (at sf0.001 per-shard gaps ~100 s >> 30 s jitter)
  private val sfDir = "/root/testdata/sf0.01"

  private def collectReport(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.collect().toSeq.map(r => (r.getAs[String]("bucket"),
      r.getAs[Long]("n_events"), r.getAs[Long]("max_late_ms"),
      r.getAs[Long]("share_bp")))

  test("foreachBatch disorder fold == q224 batch audit, exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // the same input the batch audit sees, chunked into 4 micro-batches
    // by global arrival order (the stream's delivery contract)
    val ev = Disorder.withArrival(Tables.events(spark, sfDir))
      .select("shard", "event_id", "ts_ms", "arr_ms")
    val rows = ev.orderBy("arr_ms", "event_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batches = rows.grouped((rows.size + 3) / 4).toSeq
    assert(batches.size === 4)

    val stream = MemoryStream[(Long, Long, Long, Long)]
    var state = Disorder.emptyState(spark)
    var buckets = Disorder.bucketize(
      Disorder.lateness(ev.limit(0), state))
    val q = stream.toDF().toDF("shard", "event_id", "ts_ms", "arr_ms")
      .writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val late = Disorder.lateness(delta, state)
        buckets = Disorder.mergeBuckets(buckets, Disorder.bucketize(late))
          .localCheckpoint()
        state = Disorder.advance(state, delta).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = collectReport(Disorder.report(buckets))
    val batch = collectReport(Queries.all("q224_disorder")(spark, sfDir))
    assert(streamed === batch)
    // the jitter model must actually produce late events at this SF
    assert(batch.map(_._1).exists(_ != "a_ontime"),
      s"fixture degenerate — all on-time: $batch")
  }
}
