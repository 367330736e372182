package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef
import graft.text.TextAnalysis

/** Streaming Naive-Bayes trainer: q170's token count table is purely
  * additive, so it folds over micro-batches via the MV merge (state =
  * one row per term, vocab-sized forever). The fold must equal the
  * batch rebuild EXACTLY — counts are BIGINTs, and the ln-micro
  * weights are a pure function of them, so a streamed classifier and
  * its batch twin can never disagree on any document's score,
  * whatever the batch boundaries.
  */
class StreamingNbSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("term"),
    partials = Seq(
      "pos_ct" -> when(col("source") === "seed", 1L).otherwise(0L),
      "tot_ct" -> lit(1L)))

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      explode_outer(TextAnalysis.tokens(col("text"))).as("term"))

  /** ln-micro NB weights from a (term, pos_ct, tot_ct) count table —
    * the q170 formula, a pure function of exact integers.
    */
  private def weights(counts: DataFrame): Map[String, Long] = {
    val c2 = counts.withColumn("neg_ct", col("tot_ct") - col("pos_ct"))
    val s = c2.agg(count(lit(1)).as("v"),
      sum("pos_ct").as("pos_tot"), sum("neg_ct").as("neg_tot"))
    c2.crossJoin(broadcast(s))
      .select(col("term"), expr(
        """CAST(round(ln(CAST(pos_ct + 1 AS DOUBLE) / CAST(pos_tot + v AS DOUBLE)) * 1000000) AS BIGINT)
          | - CAST(round(ln(CAST(neg_ct + 1 AS DOUBLE) / CAST(neg_tot + v AS DOUBLE)) * 1000000) AS BIGINT)""".stripMargin)
        .as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private val batches: Seq[Seq[(String, String)]] = {
    val rnd = new scala.util.Random(11L)
    val seedWords = Seq("curated", "clean", "cited", "edited", "reviewed")
    val webWords = Seq("click", "free", "win", "buy", "now", "subscribe")
    Seq.fill(3)(Seq.fill(80) {
      val seed = rnd.nextBoolean()
      val pool = if (seed) seedWords else webWords
      val text = Seq.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")
      (if (seed) "seed" else "web", text)
    })
  }

  test("foreachBatch NB count fold == batch rebuild; weights and probe scores identical") {
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

    val rebuilt = tokens(batches.flatten.toDF("source", "text"))
      .groupBy("term")
      .agg(sum(when(col("source") === "seed", 1L).otherwise(0L)).as("pos_ct"),
        count(lit(1)).as("tot_ct"))

    def rows(df: DataFrame) = df.select("term", "pos_ct", "tot_ct")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(rows(store) == rows(rebuilt), "folded counts diverge from rebuild")

    val (wStream, wBatch) = (weights(store), weights(rebuilt))
    assert(wStream == wBatch, "weights diverge despite identical counts")
    // end-to-end: a probe doc scores identically against both models
    def score(w: Map[String, Long], text: String): Long =
      text.split("\\s+").map(t => w.getOrElse(t, 0L)).sum
    for (probe <- Seq("curated clean cited", "buy now free win", "clean buy"))
      assert(score(wStream, probe) == score(wBatch, probe))
    // and the classifier actually separates: seed-ish text scores higher
    assert(score(wStream, "curated clean cited edited") >
      score(wStream, "click free win buy"))
  }
}
