package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HoltStream
import graft.streaming.HoltStream.Ev

/** Streaming Holt smoothing: the per-key ring fold must equal BOTH the
  * batch twin (same fold, no state store) and an INDEPENDENT
  * window-lag computation (q246's plan shape — lag reads over one
  * sort), bit-for-bit, across real multi-batch boundaries.
  */
class HoltStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  // 3 users: a ramp (positive trend), a flat line (zero trend), and a
  // noisy saw — 40 events each, interleaved arrival across 4 batches
  private val events: Seq[Ev] = (0 until 40).flatMap { i =>
    Seq(
      Ev(1L, i * 10L + 1, 1000L + i * 100, 100L + 50L * i),
      Ev(2L, i * 10L + 2, 1000L + i * 100, 700L),
      Ev(3L, i * 10L + 3, 1000L + i * 100, if (i % 2 == 0) 200L else 900L))
  }
  private val batches: Seq[Seq[Ev]] = events.grouped(30).toSeq

  /** q246's window-lag form over the same fixture — the independent
    * twin (different plan, same integers).
    */
  private def lagTwin(df: DataFrame): DataFrame = {
    import QueriesAnalytics.{HoltLags, HoltWeights}
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    def dot(pick: ((Long, Long)) => Long) =
      HoltWeights.zipWithIndex.map { case (uv, j) =>
        val x = if (j == 0) col("cents")
                else coalesce(lag(col("cents"), j).over(w), lit(0L))
        x * lit(pick(uv) * (1L << (2 * (HoltLags - 1 - j))))
      }.reduce(_ + _)
    df.withColumn("level_x16m", dot(_._1))
      .withColumn("trend_x16m", dot(_._2))
      .withColumn("fcst_x16m", col("level_x16m") + col("trend_x16m"))
      .select("user_id", "event_id", "cents",
        "level_x16m", "trend_x16m", "fcst_x16m")
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("user_id", "event_id").collect().toSeq

  test("stream fold == batch twin == window-lag plan, exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val sink = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = HoltStream.smooth(stream.toDS()).toDF().writeStream
      .foreachBatch { (out: DataFrame, _: Long) =>
        sink.synchronized { sink ++= out.collect() }: Unit
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = sink.sortBy(r => (r.getLong(0), r.getLong(1)))
    val batch = sortedRows(HoltStream.batchSmooth(events.toDS()).toDF())
    val lagged = sortedRows(lagTwin(events.toDF()))
    assert(streamed.size === events.size)
    assert(streamed === batch)
    assert(streamed === lagged)

    // the ramp user's settled trend must be positive and near the true
    // slope once warm: slope 50 cents/step → trend ≈ 50·4^12 scaled
    val warmRamp = streamed.filter(r => r.getLong(0) == 1L && r.getLong(1) >= 300L)
    assert(warmRamp.nonEmpty)
    warmRamp.foreach { r =>
      val trend = r.getLong(4).toDouble / (1L << 24)
      assert(trend > 35.0 && trend < 65.0, s"ramp trend off: $trend")
    }
    // the flat user's warm trend must be exactly 0 scaled? (weights sum
    // to a truncated tail, so small residual) — bounded near zero
    val warmFlat = streamed.filter(r => r.getLong(0) == 2L && r.getLong(1) >= 300L)
    warmFlat.foreach { r =>
      val trend = math.abs(r.getLong(4).toDouble / (1L << 24))
      assert(trend < 20.0, s"flat trend off: $trend")
    }
  }

  test("out-of-order event fails loudly instead of corrupting the ring") {
    val (_, st) = HoltStream.fold(9L, None,
      Seq(Ev(9L, 1L, 100L, 10L), Ev(9L, 2L, 200L, 20L)))
    val ex = intercept[IllegalStateException] {
      HoltStream.fold(9L, st, Seq(Ev(9L, 3L, 150L, 30L)))
    }
    assert(ex.getMessage.contains("out-of-order"))
    // same-timestamp, smaller id is equally rejected (the strict-tie
    // contract shared with Scd2Stream)
    val ex2 = intercept[IllegalStateException] {
      HoltStream.fold(9L, st, Seq(Ev(9L, 2L, 200L, 30L)))
    }
    assert(ex2.getMessage.contains("out-of-order"))
  }
}
