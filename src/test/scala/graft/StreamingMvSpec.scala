package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.ViewDef

/** Streaming MV maintenance: [[MaterializedAgg]] folded over real
  * micro-batches via foreachBatch equals the batch rebuild over all
  * rows. This is the deployment shape for q103's operator — the MV
  * lives in a store, each arriving batch merges in O(delta)+O(keys),
  * and no history is ever re-read. foreachBatch (rather than a
  * stateful streaming agg) is the right harness because an MV's state
  * lives OUTSIDE the streaming checkpoint: the table itself is the
  * state, which is what makes it queryable mid-stream and rebuildable
  * after checkpoint loss.
  */
class StreamingMvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val view = ViewDef(
    keys = Seq("k"),
    partials = Seq("cnt" -> lit(1L), "sum_v" -> col("v")))

  private val batches: Seq[Seq[(String, Long)]] = {
    val rnd = new scala.util.Random(31L)
    Seq.fill(4)(Seq.fill(150)((s"k${rnd.nextInt(7)}", rnd.nextInt(100).toLong)))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("foreachBatch MV fold across micro-batches == batch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Long)]
    // the MV "store": starts empty at the view's schema
    var mv: DataFrame = MaterializedAgg.build(
      Seq.empty[(String, Long)].toDF("k", "v"), view)
    val q = stream.toDF().toDF("k", "v").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        // materialize the merged state per batch: an MV store write is
        // a sink, and the next merge must read state, not re-plan a
        // growing lineage over every historical batch
        mv = MaterializedAgg.merge(mv, delta, view).localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    // the fold only proves merging if >1 batch actually arrived
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size)

    val rebuild = MaterializedAgg.build(batches.flatten.toDF("k", "v"), view)
    assert(canon(mv) === canon(rebuild))
  }
}
