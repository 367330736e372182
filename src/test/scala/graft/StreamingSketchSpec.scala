package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.{HllAggregator, KmvAggregator, TopKAggregator}

/** The sketch UDAFs (KMV, HLL, bounded top-k) run UNCHANGED in
  * Structured Streaming windowed aggregation: a typed Aggregator's
  * merge is exactly the contract streaming state needs, so partial
  * sketch buffers carry across micro-batches and the final summaries
  * equal the batch computation over the same rows. This is the
  * 100 TB streaming story — per-window distinct counts and top-k with
  * O(k)/O(m) state per window instead of per-row state, no re-read of
  * history — asserted here as exact batch/stream parity because every
  * one of these sketches is deterministic under any merge order.
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val K = 32
  private val HB = 6
  private val TK = 3

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  // three micro-batches spanning two hour windows, with planted
  // duplicates within AND across batches (dup handling is where a
  // broken merge would diverge from batch)
  private val batches: Seq[Seq[(Timestamp, Long)]] = {
    val rnd = new scala.util.Random(8L)
    def hs(n: Int) = Seq.fill(n)(rnd.nextLong() & 0xFFFFFFFFL)
    val w1 = hs(300)
    val w2 = hs(250)
    Seq(
      w1.take(200).map((t(10, 5), _)) ++ w2.take(50).map((t(11, 10), _)),
      w1.drop(200).map((t(10, 40), _)) ++ w1.take(80).map((t(10, 50), _)) ++
        w2.slice(50, 150).map((t(11, 30), _)),
      w2.drop(150).map((t(11, 55), _)) ++ w2.take(40).map((t(11, 59), _)))
  }

  private def aggregated(df: org.apache.spark.sql.DataFrame) = {
    val kmv = udaf(new KmvAggregator(K), Encoders.scalaLong)
    val hll = udaf(new HllAggregator(HB), Encoders.scalaLong)
    val tk = udaf(new TopKAggregator(TK),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    df.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(kmv(col("h")).as("kmv"), hll(col("h")).as("hll_k"),
        tk(col("h"), col("h")).as("top"))
      .select(col("w.start").as("ws"), col("kmv.hk"), col("kmv.got"),
        col("hll_k"), col("top"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("KMV/HLL/TopK state merges across micro-batches == batch windowed agg") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Timestamp, Long)]
    val q = aggregated(stream.toDF().toDF("ts", "h"))
      .writeStream.format("memory").queryName("sk_win")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    // parity is only meaningful if state really crossed batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    q.stop()

    val streamed = rows(spark.table("sk_win"))
    val batch = rows(aggregated(
      batches.flatten.toDF("ts", "h")))
    assert(streamed.size == 2 && streamed == batch)
  }

  test("append mode + watermark: a closed window's sketch is final and batch-equal") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Timestamp, Long)]
    // delay must cover the fixture's intra-window disorder (batch 2
    // revisits hour 10 after batch 1 touched hour 11) — a tighter
    // watermark would drop those as late, which is correct streaming
    // semantics but not the parity claim under test (late-drop is
    // covered by StreamingSpec's watermark test)
    val q = aggregated(
        stream.toDF().toDF("ts", "h").withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("sk_append")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    // advance the watermark past both windows so they finalize
    stream.addData(Seq((t(23, 0), 1L)))
    q.processAllAvailable()
    q.stop()

    val streamed = rows(spark.table("sk_append")
      .filter(col("ws") < t(12, 0)))
    val batch = rows(aggregated(batches.flatten.toDF("ts", "h")))
    assert(streamed.size == 2 && streamed == batch)
  }

  test("Gram sketch state merges across micro-batches == batch windowed agg") {
    // the q196/q199 moment buffer maintained INCREMENTALLY: per-window
    // embedding covariance stats over a stream, exact integer parity
    // (the buffer is the whole point — O(d²) state per window, the
    // corpus never re-reads)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val D = 4
    val rnd = new scala.util.Random(9L)
    def vec() = Seq.fill(D)(rnd.nextFloat() * 2f - 1f)
    val gbatches: Seq[Seq[(Timestamp, Seq[Float])]] = Seq(
      Seq.fill(40)((t(10, 15), vec())) ++ Seq.fill(10)((t(11, 5), vec())),
      Seq.fill(30)((t(10, 45), vec())) ++ Seq.fill(25)((t(11, 20), vec())),
      Seq.fill(15)((t(11, 50), vec())))
    def agg(df: org.apache.spark.sql.DataFrame) = {
      val gramU = udaf(new graft.sketch.GramAggregator(D, 1e6),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      df.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(gramU(col("v")).as("g"))
        .select(col("w.start").as("ws"), col("g"))
    }
    val stream = MemoryStream[(Timestamp, Seq[Float])]
    val q = agg(stream.toDF().toDF("ts", "v"))
      .writeStream.format("memory").queryName("gram_win")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    gbatches.foreach { b => stream.addData(b); q.processAllAvailable() }
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    q.stop()
    val streamed = rows(spark.table("gram_win"))
    val batch = rows(agg(gbatches.flatten.toDF("ts", "v")))
    assert(streamed.size == 2 && streamed == batch)
  }
}
