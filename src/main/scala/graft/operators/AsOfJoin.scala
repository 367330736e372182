package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal (as-of) dimension join: each fact row matches the LATEST
  * dimension version whose effective timestamp is ≤ the fact's — the
  * SCD type-2 lookup the reference's TTL'd cache approximates in time
  * ([[graft.pipeline.Enrich]] models the current-state refresh; this
  * models point-in-time correctness for replays/backfills, where a
  * 2024 log line must see the 2024 app name, not today's).
  *
  * Spark has no native as-of join; the composition here turns it into
  * an equi-join + interval filter, which is the scale shape:
  * `lead(version)` over the DIMENSION (dimension-sized window, keyed
  * per entity) converts version rows into half-open validity intervals
  * [version, next-version), and the fact side then broadcast-hash-joins
  * on the entity key with the interval predicate as the join residual.
  * The fact side never shuffles and never expands — at most one
  * version interval contains any timestamp.
  */
object AsOfJoin {

  /** Left as-of join. `dims` must have `keys` + `versionCol`
    * (ascending effective-from) + payload columns; payload names must
    * not clash with fact columns. Facts whose ts precedes every
    * version get null payloads (left join).
    *
    * Same-timestamp versions: pass `tieCols` (e.g. a sequence id) and
    * the interval derivation resolves them deterministically — the
    * earlier tie gets the empty [t, t) interval (matches no fact), the
    * last writer at t carries [t, next). Without `tieCols`,
    * `versionCol` must be unique per key or the split is
    * nondeterministic.
    */
  def asOf(facts: DataFrame, dims: DataFrame, keys: Seq[String],
           versionCol: String, factTsCol: String,
           tieCols: Seq[String] = Nil,
           toleranceMs: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((versionCol +: tieCols).map(col): _*)
    val d0 = dims.withColumn("__valid_to", lead(col(versionCol), 1).over(w))
    // rename dim keys so the join output has no ambiguous columns
    val d = keys.foldLeft(d0)((acc, k) => acc.withColumnRenamed(k, s"__d_$k"))
    val cond = keys.map(k => facts(k) === d(s"__d_$k")).reduce(_ && _) &&
      facts(factTsCol) >= d(versionCol) &&
      (d("__valid_to").isNull || facts(factTsCol) < d("__valid_to")) &&
      toleranceMs.map(t => facts(factTsCol) - d(versionCol) <= t)
        .getOrElse(lit(true))
    facts.join(broadcast(d), cond, "left")
      .drop(versionCol).drop("__valid_to")
      .drop(keys.map(k => s"__d_$k"): _*)
  }

  /** FORWARD as-of join (the other half of the pandas `merge_asof`
    * surface): each fact matches the EARLIEST dimension version whose
    * effective timestamp is ≥ the fact's — "the next rate change /
    * maintenance window / schedule entry at-or-after this event" —
    * optionally within `toleranceMs` (facts whose next version is
    * further out get null payloads, like a backward fact before the
    * first version).
    *
    * Same scale shape as [[asOf]], mirrored: `lag(version)` over the
    * dimension converts versions into half-open (prev, version]
    * intervals, the fact side broadcast-joins with the interval (and
    * tolerance) as residual predicates — one interval contains any
    * timestamp, so the fact side never expands and never shuffles.
    * Same-timestamp versions resolve by `tieCols` as [[asOf]]'s
    * mirror image: the FIRST tie at t carries (prev, t] and wins;
    * every later tie gets an empty (t, t] interval matching no fact.
    */
  def asOfForward(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                  versionCol: String, factTsCol: String,
                  tieCols: Seq[String] = Nil,
                  toleranceMs: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((versionCol +: tieCols).map(col): _*)
    val d0 = dims.withColumn("__valid_from_excl", lag(col(versionCol), 1).over(w))
    val d = keys.foldLeft(d0)((acc, k) => acc.withColumnRenamed(k, s"__d_$k"))
    val cond = keys.map(k => facts(k) === d(s"__d_$k")).reduce(_ && _) &&
      facts(factTsCol) <= d(versionCol) &&
      (d("__valid_from_excl").isNull || facts(factTsCol) > d("__valid_from_excl")) &&
      toleranceMs.map(t => d(versionCol) - facts(factTsCol) <= t)
        .getOrElse(lit(true))
    facts.join(broadcast(d), cond, "left")
      .drop(versionCol).drop("__valid_from_excl")
      .drop(keys.map(k => s"__d_$k"): _*)
  }
}
