package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef
import graft.text.TextAnalysis

/** Streaming mixture reweighting: q228's input is the (source, term)
  * count table — purely additive, so it folds over micro-batches via
  * the MV merge (state = one row per (source, term), vocab-bounded),
  * and `doremiFromCounts` derives the weights from the folded store
  * with the SAME code as the batch query. Counts are exact BIGINTs
  * and every float settles once downstream, so the streamed mixture
  * can never disagree with its batch twin — the domain-weight monitor
  * a continuously-ingesting training pipeline would run.
  */
class StreamingDoremiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("source", "term"),
    partials = Seq("n_st" -> lit(1L)))

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      explode_outer(TextAnalysis.tokens(col("text"))).as("term"))

  private def weightRows(counts: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    QueriesTraining.doremiFromCounts(counts).collect().toSeq
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("h_micro"), r.getAs[Long]("w0_bp"), r.getAs[Long]("w1_bp")))

  // three sources with genuinely different entropy profiles: "hard"
  // draws from a wide pool (high xent), "easy" repeats a narrow one
  private val batches: Seq[Seq[(String, String)]] = {
    val rnd = new scala.util.Random(17L)
    val wide = (0 until 200).map(i => s"w$i")
    val narrow = Seq("the", "a", "of")
    val mid = (0 until 20).map(i => s"m$i")
    Seq.fill(3)(Seq.fill(60) {
      rnd.nextInt(3) match {
        case 0 => ("hard", Seq.fill(15)(wide(rnd.nextInt(wide.size))).mkString(" "))
        case 1 => ("easy", Seq.fill(15)(narrow(rnd.nextInt(narrow.size))).mkString(" "))
        case _ => ("mid", Seq.fill(15)(mid(rnd.nextInt(mid.size))).mkString(" "))
      }
    })
  }

  test("foreachBatch count fold == batch rebuild; mixture weights identical and tilted toward the hard source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, String)]
    var store: DataFrame = MaterializedAgg.build(
      tokens(Seq.empty[(String, String)].toDF("source", "text")), view)
    val q = stream.toDF().toDF("source", "text").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, tokens(delta), view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = weightRows(store.select("source", "term", "n_st"))
    val rebuilt = weightRows(tokens(batches.flatten.toDF("source", "text"))
      .groupBy("source", "term").agg(count(lit(1)).as("n_st")))
    assert(streamed === rebuilt)

    // Σ w1_bp = 10⁴ exactly (Hamilton), and the MW step must tilt the
    // mixture toward the high-entropy source relative to token share
    assert(streamed.map(_._5).sum === 10000L)
    val bySource = streamed.map(r => r._1 -> r).toMap
    assert(bySource("hard")._5 > bySource("hard")._4,
      s"hard source not upweighted: ${bySource("hard")}")
    assert(bySource("easy")._5 < bySource("easy")._4,
      s"easy source not downweighted: ${bySource("easy")}")
  }
}
