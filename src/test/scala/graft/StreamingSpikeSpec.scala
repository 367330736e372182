package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SpikeDetector
import graft.streaming.SpikeDetector.{DayCount, Spike}

/** Online EWMA spike detection ([[SpikeDetector]]): hand-computed
  * dyadic baseline, batch/stream parity under arbitrary micro-batch
  * boundaries, and the loud out-of-order contract.
  */
class StreamingSpikeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def runStream(batches: Seq[Seq[DayCount]]): Seq[Spike] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[DayCount]
    val name = s"spike_${System.nanoTime()}"
    val q = SpikeDetector.detect(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[Spike].collect().toSeq
  }

  private def d(k: String, day: Int, cnt: Long) =
    DayCount(k, f"2026-01-$day%02d", cnt)

  test("hand-computed dyadic baseline: constant load is exact, 10x day flags") {
    // α=1/8, scale 2^15: constant 100 keeps ewma at exactly 100<<15
    // ((7e + 100·2^15)/8 == e); day5's 1000 vs baseline 100: spike
    import spark.implicits._
    val days = (1 to 4).map(i => d("a", i, 100L)) :+ d("a", 5, 1000L)
    val out = SpikeDetector.batchDetect(days.toDS()).collect().sortBy(_.day)
    assert(out.map(_.ewma_scaled).toSeq ==
      Seq(100L << 15, 100L << 15, 100L << 15, 100L << 15, 100L << 15))
    // warmup: first 3 days never flag; day4 (n=3) 100 ≤ 4·100 no;
    // day5 1000 > 4·100 yes
    assert(out.map(_.spike).toSeq == Seq(false, false, false, false, true))
    // post-spike baseline absorbs the spike with floor truncation:
    // (7·3276800 + 32768000) >> 3 = 6963200 (= 212.5 << 15)
    val (_, st) = SpikeDetector.fold("a", None, days)
    assert(st.get.ewmaScaled == 6963200L)
  }

  test("stream equals batch under three different micro-batch splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(29L)
    val all = for (k <- Seq("a", "b", "c"); day <- 1 to 12)
      yield d(k, day, 50 + rnd.nextInt(400).toLong)
    val expected = SpikeDetector.batchDetect(all.toDS()).collect().toSet
    // splits must respect per-key day order across batches (the
    // detector's contract); day-sliced splits do
    val splits = Seq(
      Seq(all),                                        // one batch
      (1 to 12).map(day => all.filter(_.day.endsWith(f"$day%02d"))), // per day
      Seq(all.filter(_.day <= "2026-01-05"), all.filter(_.day > "2026-01-05")))
    splits.foreach { batches =>
      assert(runStream(batches).toSet === expected,
        s"split into ${batches.size} batches diverged from batch fold")
    }
  }

  test("a day at or before the last folded day kills the query loudly") {
    val e = intercept[StreamingQueryException] {
      runStream(Seq(Seq(d("a", 5, 10L)), Seq(d("a", 4, 10L))))
    }
    assert(e.getCause.getMessage.contains("out-of-order day"))
    val e2 = intercept[StreamingQueryException] {
      runStream(Seq(Seq(d("a", 5, 10L)), Seq(d("a", 5, 10L))))
    }
    assert(e2.getCause.getMessage.contains("out-of-order day"))
  }
}
