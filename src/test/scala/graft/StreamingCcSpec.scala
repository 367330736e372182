package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Streaming dedup-cluster maintenance: q121's star-contraction fold
  * driven by foreachBatch over real micro-batches of newly verified
  * pairs — the labels table is the state (outside the checkpoint,
  * queryable mid-stream), each batch folds in at |V|+|ΔE| cost, and
  * the final labeling equals the batch rebuild over every edge seen.
  * Mirrors [[StreamingMvSpec]]'s shape for the MV operator.
  */
class StreamingCcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("foreachBatch star-contraction fold across micro-batches == batch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(59L)
    val n = 50
    val nodes = (0L until n).toDF("doc_id")
    val batches = Seq.fill(4)(
      Seq.fill(18)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b })

    val stream = MemoryStream[(Long, Long)]
    // labels "store": every node starts as its own singleton component
    var labels: DataFrame = nodes
      .select(col("doc_id"), col("doc_id").as("canonical_id"))
    val q = stream.toDF().toDF("id_a", "id_b").writeStream
      .foreachBatch { (delta: DataFrame, _: Long) =>
        labels = Dedup.incrementalComponents(
          labels, nodes, delta, "doc_id", "id_a", "id_b")
        // incrementalComponents returns a materialized frame, so the
        // next fold reads state, not a growing cross-batch lineage
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size)

    val rebuild = Dedup.connectedComponents(
        nodes, batches.flatten.toDF("id_a", "id_b"), "doc_id", "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded === rebuild)
  }
}
