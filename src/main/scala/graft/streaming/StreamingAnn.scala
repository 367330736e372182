package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.sim.Similarity

/** Streaming near-duplicate detection over EMBEDDINGS — the q24 chain
  * (banded SRP candidates → exact-cosine verify) as an ingest-time
  * monitor on the SAME persistent batchId-keyed store discipline as
  * [[StreamingDedup.foldBatchPersistent]]: per micro-batch of new
  * vectors the state grows by exactly the increment, snapshot reads
  * exclude the current batch (crash-window replays idempotent),
  * re-ingested ids anti-join away, restart = re-open the path, and
  * [[StreamingDedup.compactState]] bounds the small files (the store
  * functions are schema-agnostic — one maintenance path for both
  * monitors).
  *
  * Fold == rebuild, EXACTLY: a pair is emitted in the batch its later
  * vector arrives in; the union of all emissions equals the batch
  * chain (q24_dedup_embed) over the full corpus, cosine-for-cosine
  * (same `vec_dot`/`vec_norm` fold, vectors round-trip parquet floats
  * bit-identically).
  *
  * State per vector = (id, v, nrm, band buckets): unlike the MinHash
  * monitor's 16 longs, the VECTOR itself must persist — the exact-
  * cosine verify needs it, exactly as any vector index stores its
  * vectors. Per-batch cost: the increment's exploded band buckets
  * BROADCAST; the state streams past the hash join with no shuffle —
  * one state scan + increment-sized work.
  *
  * `planesPerBand` is the index's occupancy knob
  * ([[graft.ScaleParams.srpBandPlanes]], BASELINE §e): FIX it for the
  * index lifetime from the TARGET corpus size — changing it is a
  * reindex, not a parameter tweak (every stored bucket changes).
  */
object StreamingAnn {

  def foldBatchPersistent(statePath: String, batch: DataFrame, batchId: Long,
                          planesPerBand: Int,
                          idCol: String = "vec_id", embCol: String = "embedding",
                          bands: Int = Similarity.EmbedBands,
                          dims: Int = Similarity.EmbedDims,
                          minCos: Double = Similarity.NearDupCos,
                          pairsDir: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    StreamingDedup.recoverIfNeeded(spark, statePath)
    val prior = StreamingDedup.stateSigs(spark, statePath, batchId)
    val signed = batch
      .select(col(idCol), col(embCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .withColumn("buckets",
        Similarity.srpBandKeys(col("v"), bands, planesPerBand, dims))
    val newRows = Dedup.materialize(prior match {
      case Some(st) => signed.join(st.select(col(idCol)), Seq(idCol), "left_anti")
      case None => signed
    })
    val all = prior.map(_.unionAll(newRows)).getOrElse(newRows)
    val pairs = Dedup.materialize(
      Similarity.incrementalNearDupPairs(all, newRows, idCol, minCos))
    // pairs materialized ABOVE this write (the snapshot they read must
    // never include the increment being published)
    newRows.write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    pairsDir.foreach { pd =>
      if (!pairs.isEmpty)
        pairs.write.mode("overwrite").parquet(s"$pd/batch=$batchId")
    }
    pairs
  }

  /** The monitor as a PRODUCTION streaming query: every micro-batch of
    * `vectors` (columns `idCol`, `embCol`) folds into the persistent
    * store, near-dup pairs land batchId-keyed under `pairsDir`
    * ([[StreamingDedup.pairsView]] reads the union), and — when
    * `compactEvery > 0` — [[StreamingDedup.maybeCompact]] runs as the
    * `foreachBatch` epilogue (the epilogue IS the quiesce window; see
    * its scaladoc). Restart = start again with the same checkpoint:
    * offsets resume, the state re-opens from disk, and a crash-window
    * replay recomputes idempotently (StreamingAnnPipelineSpec forces
    * one through a [[graft.sources.ShardedRecordSource]] drive).
    *
    * `planesPerBand` is FIXED for the index lifetime — derive it once
    * from the TARGET corpus size ([[graft.ScaleParams.srpBandPlanes]]),
    * not per batch (a changed value changes every stored bucket: a
    * reindex, not a tweak).
    */
  def startMonitor(vectors: DataFrame, checkpointDir: String, statePath: String,
                   pairsDir: String, planesPerBand: Int,
                   idCol: String = "vec_id", embCol: String = "embedding",
                   compactEvery: Int = 0,
                   trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatchPersistent(statePath, batch, batchId, planesPerBand,
          idCol = idCol, embCol = embCol, pairsDir = Some(pairsDir)): Unit
        StreamingDedup.maybeCompact(batch.sparkSession, statePath, batchId,
          compactEvery)
      }
      .start()
}
