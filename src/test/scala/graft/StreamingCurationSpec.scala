package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Curation
import graft.text.TextAnalysis

/** The SURVEY §7.4.5 design claim, executed: the training-data
  * operators are additive `Dataset` transformations, so the SAME
  * quality-filter → chunk plan runs unchanged under Structured
  * Streaming — this spec diffs the streamed output against the batch
  * computation over identical documents.
  */
case class CurationDoc(doc_id: Long, text: String)

class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")


  private def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Curation.chunk(
      df.filter(TextAnalysis.qualityScore(col("text")) >= 0.3),
      "doc_id", "text", chunkTokens = 16, strideTokens = 12)

  test("quality-filter + chunk emits identical rows under streaming and batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[CurationDoc].collect().toSeq

    val stream = MemoryStream[CurationDoc]
    val outDir = Files.createTempDirectory("graft_cur_out").toString
    val ckDir = Files.createTempDirectory("graft_cur_ck").toString
    // two adds → two micro-batches: proves the transform is stateless
    // per-row (no cross-batch dependency), not just single-batch-safe
    val (a, b) = docs.splitAt(docs.size / 2)
    stream.addData(a)
    stream.addData(b)
    val q = curate(stream.toDF()).writeStream
      .format("parquet").option("checkpointLocation", ckDir)
      .option("path", outDir).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    // assert the drain: a false return means timeout — without this the
    // test would read a partial sink and fail with a misleading diff
    // while the query keeps writing under later suites
    val drained = q.awaitTermination(120000)
    if (!drained) q.stop()
    assert(drained, "AvailableNow drain timed out")

    val streamed = spark.read.parquet(outDir)
    val batch = curate(docs.toDF())
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream/batch curation outputs diverge")
  }
}
