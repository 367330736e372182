package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Streaming parse-health monitor: q265's input is the per-type tier
  * count table — purely additive, so it folds over micro-batches via
  * the MV merge (state = one row per event type), and
  * `parseHealthFromCounts` derives the rates from the folded store
  * with the SAME code as the batch query. The alarm a log pipeline
  * actually runs: a producer silently changing its payload format
  * shows as a collapsing tier rate within one micro-batch of the
  * change.
  */
class StreamingParseHealthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("event_type"),
    partials = Seq("n" -> lit(1L)) ++ Queries.parseHealthIndicators(col("props"))
      .map { case (name, c) => s"n_${name.stripPrefix("m_")}" -> c })

  // healthy rows, then a "format change": the web type flips to an
  // unparseable payload in the last batch
  private val batches: Seq[Seq[(String, String)]] = {
    val rnd = new scala.util.Random(41L)
    def healthy() = s"""{"k": ${rnd.nextInt(100)}}"""
    Seq(
      Seq.fill(80)(("web", healthy())) ++ Seq.fill(40)(("job", healthy())),
      Seq.fill(60)(("web", healthy())) ++ Seq.fill(30)(("job", healthy())),
      Seq.fill(50)(("web", """{"version": 2}""")) ++ Seq.fill(30)(("job", healthy())))
  }

  private def rates(counts: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    Queries.parseHealthFromCounts(counts).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("foreachBatch count fold == batch rebuild; the format change collapses the rate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, String)]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[(String, String)].toDF("event_type", "props"), view)
    val q = stream.toDF().toDF("event_type", "props").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val streamed = rates(store.select("event_type", "n", "n_any", "n_2digit", "n_70s"))
    val all = batches.flatten.toDF("event_type", "props")
    val inds = Queries.parseHealthIndicators(col("props"))
    val rebuilt = rates(
      all.select(col("event_type") +: inds.map { case (n, c) => c.as(n) }: _*)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("m_any").as("n_any"),
          sum("m_2digit").as("n_2digit"), sum("m_70s").as("n_70s")))
    assert(streamed === rebuilt)

    val byType = streamed.map(r => r._1 -> r).toMap
    // job stayed healthy: every payload parses the any-int tier
    assert(byType("job")._3 === 10000L)
    // web shipped 50 unparseable payloads out of 190: rate collapses
    assert(byType("web")._2 === 190L)
    assert(byType("web")._3 === (140L * 10000L) / 190L)
  }
}
