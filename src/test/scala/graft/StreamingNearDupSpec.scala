package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** Ingest-time MinHash-LSH dedup: [[StreamingDedup.foldBatch]] driven
  * by foreachBatch over real micro-batches of raw documents. Contract:
  * every near-dup pair is emitted EXACTLY once — in the batch its
  * later document arrives in — and the union of all emissions equals
  * the batch chain (q21_dedup_minhash) over the full corpus,
  * signature-for-signature. Mirrors [[StreamingCcSpec]]'s fold shape.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  test("per-ingest fold emits each near-dup pair exactly once; union == batch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // 4 ingests, split by doc_id so planted near-dup pairs straddle
    // batch boundaries (their ids differ) — the cross-batch case is
    // the one that exercises the state, not just the increment
    val batches = (0 until 4).map(k => docs.filter(_._1 % 4 == k).toSeq)

    val stream = MemoryStream[(Long, String)]
    var sigs: DataFrame = StreamingDedup.emptySigs(spark)
    val emitted = ArrayBuffer.empty[(Long, Long, Double)]
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (next, pairs) = StreamingDedup.foldBatch(sigs, batch)
        sigs = next
        emitted ++= pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= batches.size)

    val rebuild = Queries.all("q21_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rebuild.nonEmpty, "fixture must contain planted near-dups")
    assert(emitted.size == emitted.toSet.size,
      "a pair must be emitted exactly once across the stream's lifetime")
    assert(emitted.toSet == rebuild)
    // the state is the full corpus signature table
    assert(sigs.count() == docs.length)
  }

  test("fold == rebuild for ANY batch split: random partitions, random batch counts") {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rebuild = Queries.all("q21_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rnd = new scala.util.Random(20260815L)
    // three random splits: arrival order shuffled, batch count varied —
    // the exactly-once-per-pair claim must hold for every partition of
    // the corpus into ingests, not just the doc_id % 4 slicing
    for (trial <- 1 to 3) {
      val nBatches = 2 + rnd.nextInt(4)
      val assign = docs.map(d => (rnd.nextInt(nBatches), d))
      val batches = (0 until nBatches).map(k => assign.filter(_._1 == k).map(_._2).toSeq)
      var sigs = StreamingDedup.emptySigs(spark)
      val emitted = ArrayBuffer.empty[(Long, Long, Double)]
      batches.filter(_.nonEmpty).foreach { b =>
        val (next, pairs) = StreamingDedup.foldBatch(sigs, b.toDF("doc_id", "text"))
        sigs = next
        emitted ++= pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
      assert(emitted.size == emitted.toSet.size, s"trial $trial: duplicate emission")
      assert(emitted.toSet == rebuild, s"trial $trial ($nBatches batches): fold != rebuild")
    }
  }
}
