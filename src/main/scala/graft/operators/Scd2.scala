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
}
