package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 dimension BUILDER: intervalize a change stream.
  *
  * The reference keeps only the CURRENT app→space→org mapping in its
  * TTL cache (`caching_lazyfill.go:87-157` rebuilds an entry whenever
  * it expires — history is discarded). A warehouse needs the history:
  * this operator turns the raw change stream (one row per observed
  * dimension update) into the validity-interval table that
  * [[AsOfJoin]] (q42) consumes — each key's versions ordered by change
  * time, `valid_from` inclusive, `valid_to` exclusive (null = current).
  *
  * Scale shape: one shuffle on the dimension key, then per-key sorted
  * windows. Both window functions (`row_number`, `lead`) share one
  * frame spec, so Catalyst plans a SINGLE WindowExec pass — and the
  * partitionBy keeps it distributed (never the single-partition
  * whole-table sort a naive global version numbering would plan).
  * Dimension churn per key is bounded (thousands of versions, not
  * billions), so per-group state stays small at any corpus scale.
  */
object Scd2 {

  /** @param changes  one row per observed change of a key's attributes
    * @param keyCols  the dimension's natural key
    * @param tsCol    change timestamp (any orderable type)
    * @param tieCols  deterministic tie-break for same-timestamp changes
    *                 (e.g. a sequence / event id)
    */
  def intervalize(changes: DataFrame, keyCols: Seq[String], tsCol: String,
                  tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, lit(1)).otherwise(lit(0)))
  }

  /** [[intervalize]] for a change stream that carries DELETE
    * tombstones — the shape real CDC feeds have (Debezium `op = 'd'`,
    * Kafka log-compaction nulls). A tombstone closes the key's open
    * version at its timestamp and opens NOTHING: the key has no
    * current row until a later change re-inserts it, so an as-of
    * lookup between delete and re-insert correctly resolves to null
    * (q42's "fact before every version" path, now also "fact after
    * the deletion").
    *
    * Derivation: `lead(ts)` over ALL changes (both kinds) bounds each
    * version by the next change of either kind, THEN tombstones drop
    * out and `row_number` renumbers the surviving versions. A leading
    * or repeated tombstone bounds nothing and vanishes — idempotent
    * by construction. Same single-exchange scale shape as
    * [[intervalize]] (the second window reuses the first's
    * partitioning and sort).
    */
  def intervalizeTombstones(changes: DataFrame, keyCols: Seq[String],
                            tsCol: String, tieCols: Seq[String],
                            isDeleteCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    changes
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .filter(!col(isDeleteCol))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", col("__next_ts"))
      .withColumn("is_current", when(col("valid_to").isNull, lit(1)).otherwise(lit(0)))
      .drop("__next_ts", isDeleteCol)
  }

  /** Incremental SCD2 MERGE — the nightly operation a warehouse
    * actually runs: fold a batch of NEW changes into an existing
    * interval table without recomputing history. Closed history rows
    * pass through untouched; each key's open version closes at its
    * first new change; the new changes intervalize with versions
    * offset by the key's existing count.
    *
    * Invariant (the q88 oracle): for any time-split of a change
    * stream, `applyChanges(intervalize(old), new) ==
    * intervalize(old ∪ new)` row-for-row — incremental maintenance
    * equals the full rebuild.
    *
    * Contract (the batch twin of [[graft.streaming.Scd2Stream]]'s
    * ordering contract): every new change is STRICTLY after the key's
    * open `valid_from` — or at the same timestamp only if it sorts
    * strictly after it on the tie columns (a same-ts change with a
    * smaller-or-equal tie would win or tie the rebuild's ordering
    * race, which no append-only merge can reproduce). BOTH violations
    * raise at execution (`raise_error` in the close expression): a
    * strictly-earlier change, and — when `tieCols` are given — a
    * same-ts change whose tie tuple does not sort after the open
    * row's. Silently emitting either would corrupt every downstream
    * as-of consumer.
    *
    * Scale shape: everything shuffles on the dimension key only —
    * intervalize's window, the per-key first-change aggregate, and the
    * joins co-partition; history size never enters a window function,
    * so a key's closed past rides through as a scan-union, not a
    * re-sort. The version offset comes from the key's OPEN row (the
    * max version by construction), not an aggregate over history.
    *
    * Callers feeding both consumers from a recomputed plan should
    * materialize `dim` and `changes` once (see q88): the two uses
    * project differently, so ReuseExchange alone won't dedupe them.
    *
    * @param dim existing table in [[intervalize]]'s output shape
    * @param changes new rows in the same shape intervalize consumes
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col)
    val tieHelpers = tieCols.map(t => s"__first_tie_$t")
    // the earliest new change per key WITH its tie columns: min over
    // the (ts, ties…) struct is the same lexicographic order
    // intervalize sorts by, so the guard compares against exactly the
    // change that would close the open version
    val firstNew = changes.groupBy(keys: _*)
      .agg(min(struct((tsCol +: tieCols).map(col): _*)).as("__first"))
      .select(keys ++ (col("__first").getField(tsCol).as("__first_new") +:
        tieCols.map(t => col("__first").getField(t).as(s"__first_tie_$t"))): _*)
    // the open row carries the key's max version by construction —
    // a filter, not an aggregate over the whole history
    val maxOld = dim.filter(col("is_current") === 1)
      .select(keys :+ col("version").as("__v0"): _*)
    // valid iff the first new change sorts strictly after the open row
    // on (ts, ties…); without tieCols a same-ts change is accepted (no
    // order is defined — the documented caller responsibility)
    val inOrder =
      if (tieCols.isEmpty) col("__first_new") >= col("valid_from")
      else (col("__first_new") > col("valid_from")) ||
        (col("__first_new") === col("valid_from") &&
          struct(tieHelpers.map(col): _*) > struct(tieCols.map(col): _*))
    val closeAt = when(inOrder, col("__first_new"))
      .otherwise(raise_error(concat(
        lit("out-of-order change batch: first new change at "),
        col("__first_new").cast("string"),
        lit(if (tieCols.isEmpty) " precedes the open version's valid_from "
            else " does not sort after the open version at "),
        col("valid_from").cast("string"))))
    val oldRows = dim.join(firstNew, keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current") === 1 && col("__first_new").isNotNull, closeAt)
          .otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("__first_new").isNotNull, lit(0)).otherwise(col("is_current")))
      .drop("__first_new" +: tieHelpers: _*)
    val newRows = intervalize(changes, keyCols, tsCol, tieCols)
      .join(maxOld, keyCols, "left")
      .withColumn("version", col("version") + coalesce(col("__v0"), lit(0L)))
      .drop("__v0")
    oldRows.unionByName(newRows)
  }
}
