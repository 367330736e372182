package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef
import graft.text.TextAnalysis

/** Streaming α-temperature mixture: q248's input is the per-source
  * token count — purely additive, so it folds over micro-batches via
  * the MV merge (state = one row per source), and `alphaFromCounts`
  * derives the weights from the folded store with the SAME code as
  * the batch query (the q228/StreamingDoremiSpec pattern). Counts are
  * exact BIGINTs; the single per-source exp∘ln settles once; Hamilton
  * keeps Σ w1_bp = 10⁴ — so the streamed mixture can never disagree
  * with its batch twin.
  */
class StreamingAlphaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("source"),
    partials = Seq("n_tokens" -> size(TextAnalysis.tokens(col("text"))).cast("long")))

  private def weightRows(counts: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    QueriesTraining.alphaFromCounts(counts).collect().toSeq
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("f_micro"), r.getAs[Long]("w0_bp"), r.getAs[Long]("w1_bp")))

  // a dominant head source and two tails — α < 1 must compress the
  // head's share and lift the tails'
  private val batches: Seq[Seq[(String, String)]] = {
    val rnd = new scala.util.Random(29L)
    Seq.fill(3)(Seq.fill(50) {
      rnd.nextInt(10) match {
        case 0 => ("tail_a", Seq.fill(4)(s"t${rnd.nextInt(9)}").mkString(" "))
        case 1 => ("tail_b", Seq.fill(6)(s"u${rnd.nextInt(9)}").mkString(" "))
        case _ => ("head", Seq.fill(40)(s"h${rnd.nextInt(9)}").mkString(" "))
      }
    })
  }

  test("foreachBatch count fold == batch rebuild; head compressed, tails lifted, sum exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, String)]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[(String, String)].toDF("source", "text"), view)
    val q = stream.toDF().toDF("source", "text").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = weightRows(store.select("source", "n_tokens"))
    val rebuilt = weightRows(batches.flatten.toDF("source", "text")
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens")))
    assert(streamed === rebuilt)

    assert(streamed.map(_._5).sum === 10000L)
    val bySource = streamed.map(r => r._1 -> r).toMap
    assert(bySource("head")._5 < bySource("head")._4,
      s"head not compressed: ${bySource("head")}")
    assert(bySource("tail_a")._5 > bySource("tail_a")._4,
      s"tail_a not lifted: ${bySource("tail_a")}")
    assert(bySource("tail_b")._5 > bySource("tail_b")._4,
      s"tail_b not lifted: ${bySource("tail_b")}")
  }
}
