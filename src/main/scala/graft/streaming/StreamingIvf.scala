package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.QueriesTraining
import graft.dedup.Dedup
import graft.sim.Similarity

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
  * Visibility contract, stated precisely (round-13, ADVICE r12): a
  * ROOT-READ probe enumerates whatever partition dirs exist when its
  * scan plans, which includes the IN-FLIGHT batch dir being written
  * and — during a crash replay — a `batch=N` dir mid-overwrite, so it
  * can observe a PARTIAL batch or fail transiently on a vanishing
  * file. That is the usual dirty-read trade of scanning a live store's
  * root. [[probeCommitted]] is the clean-read path: it enumerates only
  * STRICTLY-EARLIER named batch dirs (the [[StreamingDedup.stateSigs]]
  * discipline — a committed batch dir is immutable), at the cost of
  * the caller supplying the batch horizon it wants to read at.
  *
  * Centroids are FIXED for the index lifetime (changing them moves
  * cell boundaries = a reindex — [[graft.sim.IvfIndex.reindexLists]]
  * applies a refined quantizer selectively, q290 measures when).
  * Small-file compaction for this store is a RE-LAYOUT: the r12
  * rehearsal measured the batch-dir tax (3,576 files → probe 8.05 s
  * vs 1.57 s on the re-laid index) and the fix is now a CADENCE, not
  * a manual call — [[maybeRelayout]], the `maybeCompact`-shaped
  * `foreachBatch` epilogue that [[startMaintainer]] drives every
  * `relayoutEvery` batches. It deliberately does NOT use
  * [[StreamingDedup.compactState]]'s flat writer — a generic merged
  * dir would flatten the `list_id` partitioning the probes prune on —
  * but shares its lock/marker/recovery skeleton
  * ([[StreamingDedup.compactStateAs]]), so crash semantics cannot
  * drift between the two stores.
  */
object StreamingIvf {

  /** One micro-batch into the index; returns the (materialized)
    * assigned increment. Call from `foreachBatch(batch, batchId)`.
    * Heals a crashed re-layout first ([[StreamingDedup.recoverIfNeeded]]
    * — same litter grammar), so a maintainer restart after a kill
    * inside the re-layout window rolls the store forward before
    * touching it.
    */
  def appendBatchPersistent(indexPath: String, batch: DataFrame, batchId: Long,
                            cents: DataFrame, idCol: String = "vec_id",
                            embCol: String = "embedding"): DataFrame = {
    val spark = batch.sparkSession
    StreamingDedup.recoverIfNeeded(spark, indexPath)
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

  /** RE-LAYOUT: merge the committed `batch=<id>` dirs with
    * `id <= upToBatchId` into ONE `batch=<largest-merged>` dir that
    * keeps the `list_id` partitioning — each inverted list collapses
    * from ~batches sliver files back to one file (`repartition` on the
    * partition column first, the sliver rule), so probe planning stops
    * paying the per-dir listing tax the r12 rehearsal measured.
    * Contract and crash story are [[StreamingDedup.compactState]]'s,
    * verbatim (same marker, same roll-forward/back, same clamp to the
    * largest merged id); only the staging writer differs.
    */
  def relayoutState(spark: SparkSession, indexPath: String, upToBatchId: Long,
                    lockTtlMs: Long = 60 * 60 * 1000L): Unit =
    StreamingDedup.compactStateAs(spark, indexPath, upToBatchId, lockTtlMs) {
      (merged, _, staging) =>
        merged.repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id").parquet(staging)
    }

  /** Re-layout cadence as a `foreachBatch` epilogue — the epilogue IS
    * the quiesce window and `batchId - 1` is committed by construction
    * (the [[StreamingDedup.maybeCompact]] argument, verbatim). Fires
    * every `every` batches; `every = 0` disables. A replayed batch
    * re-runs it harmlessly: the range is already merged to one dir, so
    * the skeleton no-ops.
    */
  def maybeRelayout(spark: SparkSession, indexPath: String, batchId: Long,
                    every: Int, lockTtlMs: Long = 60 * 60 * 1000L): Unit =
    if (every > 0 && batchId > 0 && batchId % every == 0)
      relayoutState(spark, indexPath, batchId - 1, lockTtlMs)

  /** The maintainer as a production streaming query: every micro-batch
    * of `vectors` (columns `idCol`, `embCol`) appends to the index,
    * and every `relayoutEvery` batches the committed dirs re-layout
    * into one list-partitioned generation (0 = never, the pre-r13
    * behavior). Restart = start again with the same checkpoint:
    * offsets resume, the index re-opens from disk, a crash-window
    * replay republishes its batch dir idempotently, and a kill inside
    * the re-layout window rolls forward on the next batch
    * (`StreamingIvfSpec`).
    */
  def startMaintainer(vectors: DataFrame, checkpointDir: String,
                      indexPath: String, cents: DataFrame,
                      idCol: String = "vec_id", embCol: String = "embedding",
                      trigger: Trigger = Trigger.ProcessingTime("15 seconds"),
                      relayoutEvery: Int = 0): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchPersistent(indexPath, batch, batchId, cents,
          idCol = idCol, embCol = embCol): Unit
        maybeRelayout(batch.sparkSession, indexPath, batchId, relayoutEvery)
      }
      .start()

  /** Committed-snapshot probe (round-13, ADVICE r12): answer from the
    * batches STRICTLY EARLIER than `beforeBatchId` only — the
    * [[StreamingDedup.stateSigs]] enumeration, so the scan never
    * touches the in-flight batch dir or a replay's mid-overwrite
    * litter. Same pruning physics as the root probe: the bounded
    * probe-list collect turns into planning-time partition pruning on
    * `list_id` within the named dirs. Empty result (correct schema)
    * when no batch has committed yet.
    */
  def probeCommitted(spark: SparkSession, indexPath: String, beforeBatchId: Long,
                     probes: DataFrame, k: Int): DataFrame = {
    val root = new Path(indexPath)
    val dirs = StreamingDedup.batchDirs(StreamingDedup.fs(spark, root), root)
      .filter(_._2 < beforeBatchId)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("q_id", LongType), StructField("rank", IntegerType),
          StructField("vec_id", LongType), StructField("cos", DoubleType))))
    else {
      val p = probes.localCheckpoint()
      val idx = spark.read.option("basePath", indexPath)
        .parquet(dirs.map(_._1.toString): _*)
        .drop("batch")
        .filter(col("list_id").isin(Similarity.probedLists(p): _*))
      Similarity.probeIndexFrame(idx, p, k)
    }
  }
}
