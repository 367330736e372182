package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Streaming twin of q279's recursive finite-buffer backlog: the input
  * is the per-day event count — purely additive, so it folds over
  * micro-batches via the MV merge (state = one row per calendar day),
  * and `backlogFromDaily` derives the weekly two-sided-clamp series
  * from the folded store. The batch side runs Spark's actual
  * `WITH RECURSIVE` text, so the equality is CROSS-IMPLEMENTATION:
  * UnionLoop recursion vs an independent sequential fold over an
  * incrementally-maintained store (the q225/StreamingConformalSpec
  * pattern).
  */
class StreamingBacklogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private val view = ViewDef(keys = Seq("day"), partials = Seq("n" -> lit(1L)))

  test("MV-folded day counts + derive == the recursive SQL text, across real micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // arrival-order day rows from the real fixture, split mid-day so
    // batch boundaries cut INSIDE days (the additive-fold case that
    // would break any per-batch backlog emission — only the store is
    // maintained per batch; the series derives from the folded store)
    val days = Tables.events(spark, dir)
      .select(date_format(col("ts_t"), "yyyy-MM-dd").as("day"))
      .orderBy("day").collect().map(_.getString(0))
    val batches = days.grouped(days.length / 4 + 1).toSeq

    val stream = MemoryStream[String]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[String].toDF("day"), view)
    val q = stream.toDF().toDF("day").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val derived = QueriesAnalytics.backlogFromDaily(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val batch = Queries.all("q279_sql_backlog")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(derived == batch,
      s"fold-derived series != recursive text:\n$derived\nvs\n$batch")
  }
}
