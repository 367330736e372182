package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sim.Similarity

/** STREAMING DECONTAMINATION GATE — the q293 embedding-decontam pass
  * at its production operating point: the corpus is not a table you
  * scan once, it is an INGEST STREAM, and contamination should be
  * caught at the door rather than by a quarterly batch sweep. The eval
  * set is fixed for the gate's lifetime (benchmark suites change
  * rarely; redeploy the gate when they do) and benchmark-sized by
  * contract — the same broadcast-budget guard as the batch pass
  * enforces it, naming the banded chain (q297/q299 physics) past
  * broadcast scale.
  *
  * Per micro-batch: one broadcast-join pass over the INCREMENT only
  * (increment × eval cosines, map-side; nothing shuffles), then the
  * batch routes into two batchId-keyed stores on the
  * [[StreamingDedup.foldBatchPersistent]] discipline:
  *
  *  - `cleanPath/batch=<id>/`      — rows below the threshold;
  *  - `quarantinePath/batch=<id>/` — flagged rows, WITH the verdict
  *    columns (`near_eval_id`, `max_cos`) so a reviewer can adjudicate
  *    without recomputing anything.
  *
  * Overwrite-mode batch dirs make a crash-window replay republish the
  * same two dirs idempotently (exactly-once per batch id), and every
  * input row lands in EXACTLY one store — the router contract,
  * spec-pinned. Because the verdict is a pure per-row function of
  * (row, eval set), the union of streamed verdicts equals the batch
  * pass over the union of the increments (fold == rebuild, the
  * [[StreamingDedup]] standard), which is what lets a team trust the
  * gate as a drop-in for the batch sweep.
  */
object StreamingDecontam {

  /** Per-row verdicts for one increment against the broadcast eval
    * frame `(e_id, e_vec)`: `(vec_id, vec, near_eval_id, max_cos,
    * flagged)` — [[Similarity.evalVerdicts]], THE shared decontam
    * verdict kernel (round-15, VERDICT r14 item 3), computed on
    * increment-sized input. Pure: no state, no side effects — which is
    * exactly why fold == batch sweep holds by construction: the batch
    * pass (q293) runs the same kernel over the union of increments.
    */
  def flagIncrement(inc: DataFrame, eval: DataFrame,
                    minCos: Double = Similarity.NearDupCos): DataFrame =
    Similarity.evalVerdicts(inc, eval, minCos)

  /** The broadcast-budget guard, shared discipline with the batch pass:
    * the eval footprint is counted ONCE at gate start (rows × dims ×
    * 8 B) and the gate refuses past [[Similarity.EvalBroadcastBudgetBytes]].
    * ADVICE r14: a ZERO-row eval frame is refused too — the verdict
    * cross-join would produce zero groups per batch and every
    * increment would silently vanish from BOTH stores, violating the
    * every-row-lands-in-exactly-one-store router contract. An empty
    * eval set means "nothing to screen": that deployment should skip
    * the gate, not run it as a row sink.
    */
  private def requireEvalFits(eval: DataFrame, dims: Int): Unit = {
    val evalRows = eval.count()
    require(evalRows > 0L,
      "StreamingDecontam: the eval frame is EMPTY - every increment row " +
        "would drop out of the verdict cross-join and land in neither " +
        "store. Deploy the gate with a non-empty eval set, or skip the " +
        "gate entirely when there is nothing to screen against.")
    val estBytes = evalRows * dims * 8L
    require(estBytes <= Similarity.EvalBroadcastBudgetBytes,
      s"StreamingDecontam: eval-set broadcast footprint $estBytes B exceeds " +
        s"the budget ${Similarity.EvalBroadcastBudgetBytes} B. A gate checks " +
        "against a benchmark-sized eval set by contract - past broadcast " +
        "scale run the banded candidate chain (q297/q299 physics) as a " +
        "periodic batch sweep instead.")
  }

  /** Start the gate. `vectors` is the ingest stream (columns `idCol`,
    * `embCol`); `eval` the fixed eval frame `(e_id, e_vec)`,
    * materialized and broadcast per batch. Restart with the same
    * checkpoint resumes offsets; a replayed batch republishes its two
    * dirs idempotently.
    */
  def startGate(vectors: DataFrame, checkpointDir: String, eval: DataFrame,
                cleanPath: String, quarantinePath: String,
                minCos: Double = Similarity.NearDupCos,
                idCol: String = "vec_id", embCol: String = "embedding",
                dims: Int = Similarity.EmbedDims,
                trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery = {
    requireEvalFits(eval, dims)
    val ev = eval.select(col("e_id"), col("e_vec")).localCheckpoint()
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch.select(col(idCol).as("vec_id"), col(embCol).as("vec")),
          batchId, ev, cleanPath, quarantinePath, minCos)
      }
      .start()
  }

  /** One gated batch — package-visible so the spec can drive replay
    * windows directly. Writes the verdict split under `batch=<id>` in
    * both stores (overwrite → idempotent), quarantine keeping the
    * verdict columns.
    */
  private[graft] def gateBatch(inc: DataFrame, batchId: Long, eval: DataFrame,
                               cleanPath: String, quarantinePath: String,
                               minCos: Double): Unit = {
    val verdicts = graft.dedup.Dedup.materialize(
      flagIncrement(inc, eval, minCos))
    verdicts.filter(col("flagged") === 0L)
      .select(col("vec_id"), col("vec"))
      .write.mode("overwrite").parquet(s"$cleanPath/batch=$batchId")
    verdicts.filter(col("flagged") === 1L)
      .select(col("vec_id"), col("vec"), col("near_eval_id"), col("max_cos"))
      .write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
  }
}
