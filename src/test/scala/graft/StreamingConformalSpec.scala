package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef
import graft.operators.Stats

/** Streaming conformal-threshold maintenance: q225's inputs reduce to
  * per-(split, q_micro) COUNTS — purely additive, so they fold over
  * micro-batches via the MV merge (state = one row per distinct
  * score, never per doc) — and `Stats.conformalFromCounts` derives
  * the threshold + coverage row from the folded store. The value at
  * calibration rank k is a pure function of the counts (ties cannot
  * move it), so the monitor must EQUAL the rank-based q225 query —
  * cross-IMPLEMENTATION equality, not just fold == rebuild.
  */
class StreamingConformalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val sfDir = "/root/testdata/sf0.01"

  private val view = ViewDef(
    keys = Seq("split", "q_micro"),
    partials = Seq("n" -> lit(1L)))

  private def row(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Long)] =
    df.collect().toSeq.map(r => (r.getAs[Long]("n_cal"), r.getAs[Long]("k"),
      r.getAs[Long]("thr_micro"), r.getAs[Long]("n_test"),
      r.getAs[Long]("n_covered"), r.getAs[Long]("coverage_bp")))

  test("foreachBatch count fold + conformalFromCounts == rank-based q225, exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val scored = QueriesTraining.conformalScored(spark, sfDir)
      .select("split", "q_micro")
    val rows = scored.as[(String, Long)].collect().toSeq
    val batches = rows.grouped((rows.size + 3) / 4).toSeq
    assert(batches.size === 4)

    val stream = MemoryStream[(String, Long)]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[(String, Long)].toDF("split", "q_micro"), view)
    val q = stream.toDF().toDF("split", "q_micro").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")

    val monitor = row(Stats.conformalFromCounts(
      store.filter(col("split") === "val").select("q_micro", "n"),
      store.filter(col("split") === "test").select("q_micro", "n"),
      QueriesTraining.ConformalAlpha))
    val batch = row(Queries.all("q225_conformal")(spark, sfDir))
    assert(monitor === batch)
  }
}
