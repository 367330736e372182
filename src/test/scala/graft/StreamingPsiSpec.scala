package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Streaming drift monitor: q153's PSI computed INCREMENTALLY — the
  * per-(bucket, snapshot) counts fold over micro-batches via the MV
  * merge (state = one row per bucket, O(buckets) forever), and the
  * final PSI arithmetic runs the SAME shared nano-unit term text as
  * the batch query. Folded integers must equal the batch rebuild's
  * exactly — counts are exact BIGINTs, so the stream and batch drift
  * gates can never disagree, batch boundaries included.
  */
class StreamingPsiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("bucket"),
    partials = Seq(
      "n_a" -> when(col("in_a"), 1L).otherwise(0L),
      "n_b" -> when(!col("in_a"), 1L).otherwise(0L)))

  // synthetic snapshots with a real shift: snapshot B's cents are
  // drawn from a distribution pushed one bucket up
  private val batches: Seq[Seq[(Boolean, Long)]] = {
    val rnd = new scala.util.Random(47L)
    Seq.fill(4)(Seq.fill(300) {
      val inA = rnd.nextBoolean()
      val base = math.abs(rnd.nextGaussian()) * 2e6
      val cents = (if (inA) base else base + 3e6).toLong
      (inA, cents)
    })
  }

  private def bucketed(df: DataFrame): DataFrame =
    df.withColumn("bucket",
      least(lit(QueriesAnalytics.PsiBuckets - 1L),
        expr(s"cents div ${QueriesAnalytics.PsiBucketCents}")))

  private def psiOf(counts: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val tot = counts.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    counts.crossJoin(broadcast(tot))
      .withColumn("term_nano", expr(QueriesAnalytics.psiTermSql))
      .select("bucket", "n_a", "n_b", "term_nano")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
  }

  test("foreachBatch PSI count fold == batch PSI, term-for-term in exact nano-units") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Boolean, Long)]
    var store: DataFrame = MaterializedAgg.build(
      bucketed(Seq.empty[(Boolean, Long)].toDF("in_a", "cents")), view)
    val q = stream.toDF().toDF("in_a", "cents").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, bucketed(delta), view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamPsi = psiOf(store)
    val batchPsi = psiOf(
      bucketed(batches.flatten.toDF("in_a", "cents"))
        .groupBy("bucket")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b")))
    assert(streamPsi === batchPsi)
    // the injected shift must actually register as drift (PSI > 0.25)
    val psiNano = streamPsi.map(_._4).sum
    assert(psiNano > 250000000L, s"expected detectable drift, psi_nano=$psiNano")
  }
}
