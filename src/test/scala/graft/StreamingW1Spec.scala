package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef
import graft.operators.Stats

/** Streaming Wasserstein-1 drift monitor: q206's statistic computed
  * INCREMENTALLY — per-value (n_a, n_b) counts fold over micro-batches
  * via the MV merge (state = one row per distinct value), and
  * [[Stats.wasserstein1FromCounts]] derives the statistic from the
  * folded store. Counts are exact BIGINTs, the tail arithmetic is the
  * SAME code as batch, so fold == rebuild bit-for-bit whatever the
  * batch boundaries — the PSI monitor's integral-metric sibling
  * (PSI says "shares shifted", W₁ says "how much mass moved how far").
  */
class StreamingW1Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("__v"),
    partials = Seq(
      "n_a" -> when(col("in_a"), 1L).otherwise(0L),
      "n_b" -> when(!col("in_a"), 1L).otherwise(0L)))

  // snapshot B shifted +3 units: a real, known drift signal
  private val batches: Seq[Seq[(Boolean, Long)]] = {
    val rnd = new scala.util.Random(51L)
    Seq.fill(4)(Seq.fill(250) {
      val inA = rnd.nextBoolean()
      val v = math.abs(rnd.nextGaussian() * 5).toLong
      (inA, if (inA) v else v + 3L)
    })
  }

  private def w1Row(counts: DataFrame): (Long, Long, Long, Long) = {
    val r = Stats.wasserstein1FromCounts(counts).collect()(0)
    (r.getAs[Long]("tot_a"), r.getAs[Long]("tot_b"),
      r.getAs[Long]("w1_num"), r.getAs[Long]("w1_milli"))
  }

  test("foreachBatch W1 count fold == batch W1, exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Boolean, Long)]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[(Boolean, Long)].toDF("in_a", "__v"), view)
    val q = stream.toDF().toDF("in_a", "__v").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = w1Row(store.select(col("__v"), col("n_a"), col("n_b")))
    val batch = w1Row(batches.flatten.toDF("in_a", "__v")
      .groupBy("__v")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b")))
    assert(streamed === batch)
    // the planted +3 shift must register: W1 ≈ 3 → milli ≈ 3000
    assert(streamed._4 > 2000L && streamed._4 < 4000L,
      s"expected ~3000 milli shift, got ${streamed._4}")
  }
}
