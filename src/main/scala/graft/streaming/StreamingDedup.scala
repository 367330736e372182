package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Streaming near-duplicate detection: the MinHash-LSH dedup chain as
  * an INGEST-TIME monitor — every micro-batch of new documents is
  * signed, collided against the corpus signed so far, and the
  * resulting near-dup pairs are emitted in the batch that completes
  * them. This is the shape a 100 TB pipeline actually dedups in:
  * re-running the batch chain per ingest is quadratic in wall-clock
  * over the corpus lifetime; the fold is one corpus-signature scan
  * per batch (the reference's stream never dedups at all — this is a
  * capability the Spark re-expression adds on top of its pipeline,
  * like the incremental-CC and MV monitors).
  *
  * Fold == rebuild, EXACTLY: a pair is emitted in the batch its later
  * document arrives in (within-batch pairs included — the increment is
  * a subset of the snapshot inside [[Dedup.incrementalCandidates]]),
  * every pair is emitted exactly once across the stream's lifetime,
  * and the union of all emissions equals the batch chain
  * (q21_dedup_minhash) over the full corpus, signature-for-signature
  * (StreamingDedupSpec asserts set equality including est_jaccard).
  *
  * Scale shape per batch: the increment's exploded band keys
  * BROADCAST; the signature state streams past the hash join with no
  * shuffle and no sort, so batch cost = one state scan + work
  * proportional to the increment. The state is the signature table —
  * 16 longs per document, NOT the text (a 100 TB corpus folds to a
  * ~100 GB signature state; production would keep it as a bucketed
  * table on the cluster FS and this fold as a merge-append). State is
  * re-materialized per batch ([[Dedup.materialize]]) so the next fold
  * reads blocks, not a lineage growing with batch count.
  */
object StreamingDedup {

  /** Empty signature state: (idCol, sig array<long>). */
  def emptySigs(spark: SparkSession, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Long])].toDF(idCol, "sig")
  }

  /** Fold one micro-batch of raw documents into the signature state.
    * Returns (newState, emittedPairs): `newState` is the materialized
    * snapshot including this batch's signatures; `emittedPairs` is
    * `(id_a, id_b, est_jaccard)` for every near-dup pair (estimated
    * Jaccard ≥ `tNum/tDen` over the 16-hash signature) whose LATER
    * document arrived in this batch — the exact rows the batch chain
    * would produce for these pairs.
    */
  def foldBatch(sigs: DataFrame, batch: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                tNum: Int = 1, tDen: Int = 2): (DataFrame, DataFrame) = {
    val newSigs = Dedup.materialize(
      Dedup.minhashSigTable(batch, idCol, textCol, 16))
    val all = Dedup.materialize(sigs.unionAll(newSigs))
    val pairs = Dedup.incrementalCandidates(all, newSigs, idCol, "sig", 4, 4)
      .withColumn("est_jaccard", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      // integer-rational threshold (the battery's knife-edge rule):
      // est = matches/16, so est >= tNum/tDen <=> matches*tDen >= 16*tNum
      .filter(col("est_jaccard") * 16 * tDen >= lit(16 * tNum))
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    (all, pairs)
  }
}
