package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Streaming Mann–Whitney maintenance: q271's inputs reduce to the
  * per-score count store (v, na_v, t) — purely additive, so it folds
  * over micro-batches via the MV merge with state bounded by the
  * score DOMAIN (micro-quality values), never by document count —
  * and `QueriesTraining.mwFromCounts` derives (U, z) from the folded
  * store with the SAME code as batch. Rank sums are pure functions of
  * the counts, so the monitor must EQUAL the batch query exactly.
  */
class StreamingMwSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val sfDir = "/root/testdata/sf0.01"

  private val view = ViewDef(
    keys = Seq("v"),
    partials = Seq("na_v" -> col("a"), "t" -> lit(1L)))

  private def row(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().toSeq.map(r => (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("u2_a"), r.getAs[Long]("z_milli")))

  test("foreachBatch count fold + mwFromCounts == batch q271, exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val rows = QueriesTraining.mwScored(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val batches = rows.grouped((rows.size + 3) / 4).toSeq
    assert(batches.size === 4)

    val stream = MemoryStream[(Long, Long)]
    var store: DataFrame = MaterializedAgg.build(
      Seq.empty[(Long, Long)].toDF("a", "v"), view)
    val q = stream.toDF().toDF("a", "v").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        store = MaterializedAgg.merge(store, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size,
      "fold must span multiple real micro-batches")
    // bounded state: one store row per distinct micro-quality value
    assert(store.count() === rows.map(_._2).distinct.size.toLong)

    val monitor = row(QueriesTraining.mwFromCounts(
      store.select("v", "na_v", "t")))
    val batch = row(Queries.all("q271_mannwhitney")(spark, sfDir))
    assert(monitor === batch)
  }
}
