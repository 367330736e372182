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
           tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((versionCol +: tieCols).map(col): _*)
    val d0 = dims.withColumn("__valid_to", lead(col(versionCol), 1).over(w))
    // rename dim keys so the join output has no ambiguous columns
    val d = keys.foldLeft(d0)((acc, k) => acc.withColumnRenamed(k, s"__d_$k"))
    val cond = keys.map(k => facts(k) === d(s"__d_$k")).reduce(_ && _) &&
      facts(factTsCol) >= d(versionCol) &&
      (d("__valid_to").isNull || facts(factTsCol) < d("__valid_to"))
    facts.join(broadcast(d), cond, "left")
      .drop(versionCol).drop("__valid_to")
      .drop(keys.map(k => s"__d_$k"): _*)
  }
}
