package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.QueriesTraining
import graft.dedup.Dedup

/** Incremental maintenance of the PERSISTED IVF index
  * ([[graft.sim.Similarity.persistIvfIndex]]) from a vector stream —
  * the ingest path every production vector store runs: new vectors are
  * assigned to the FIXED coarse quantizer (broadcast argmax — one
  * increment-sized pass) and appended to the list-partitioned index,
  * on the [[StreamingDedup]] store discipline:
  *
  *  - each micro-batch writes ONLY its increment under
  *    `indexPath/batch=<id>/list_id=<c>/` (overwrite mode → a
  *    crash-window replay republishes the same dir idempotently);
  *  - the increment anti-joins against the ids of STRICTLY EARLIER
  *    batches ([[StreamingDedup.stateSigs]] — a replayed batch never
  *    sees its own half-published output), so re-ingesting a seen
  *    vector is a no-op;
  *  - probes ([[graft.sim.Similarity.probePersistedIvf]] on the root)
  *    prune on `list_id` ACROSS the batch dirs — the scan opens
  *    ~batches × nprobe leaf dirs, never the rest of the corpus.
  *
  * Visibility contract: a probe sees the batches committed when its
  * scan plans; the in-flight batch (and a crashed batch until its
  * replay republishes) is not yet visible — the standard eventual
  * visibility of in-flight inserts in any vector store.
  *
  * Centroids are FIXED for the index lifetime (changing them moves
  * cell boundaries = a reindex). The re-index trigger is measured, not
  * guessed: q290_index_churn reports per-list how many vectors a
  * refined quantizer would move. Small-file compaction for this store
  * is a RE-LAYOUT (re-persist via `persistIvfIndex`), deliberately not
  * [[StreamingDedup.compactState]] — the generic compactor's merged
  * dir would flatten the `list_id` partitioning the probes prune on.
  */
object StreamingIvf {

  /** One micro-batch into the index; returns the (materialized)
    * assigned increment. Call from `foreachBatch(batch, batchId)`.
    */
  def appendBatchPersistent(indexPath: String, batch: DataFrame, batchId: Long,
                            cents: DataFrame, idCol: String = "vec_id",
                            embCol: String = "embedding"): DataFrame = {
    val spark = batch.sparkSession
    val inc = batch.select(col(idCol).as("vec_id"), col(embCol).as("vec"))
    val fresh = StreamingDedup.stateSigs(spark, indexPath, batchId) match {
      case Some(st) => inc.join(st.select(col("vec_id")), Seq("vec_id"), "left_anti")
      case None => inc
    }
    val assigned = Dedup.materialize(QueriesTraining.ivfAssign(fresh, cents))
    assigned.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$indexPath/batch=$batchId")
    assigned
  }

  /** The maintainer as a production streaming query: every micro-batch
    * of `vectors` (columns `idCol`, `embCol`) appends to the index.
    * Restart = start again with the same checkpoint: offsets resume,
    * the index re-opens from disk, a crash-window replay republishes
    * its batch dir idempotently (`StreamingIvfSpec`).
    */
  def startMaintainer(vectors: DataFrame, checkpointDir: String,
                      indexPath: String, cents: DataFrame,
                      idCol: String = "vec_id", embCol: String = "embedding",
                      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchPersistent(indexPath, batch, batchId, cents,
          idCol = idCol, embCol = embCol): Unit
      }
      .start()
}
