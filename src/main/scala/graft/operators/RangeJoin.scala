package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join via bucketing: match point rows to interval
  * rows with `start ≤ point < end`, optionally under extra equi-keys.
  *
  * Spark's built-in answer to a pure range predicate is
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) and an OOM hazard
  * the moment neither side broadcasts. The scale shape used here is
  * the standard bucketed decomposition (the same trick Databricks'
  * range-join optimization and Flink's interval join use): quantize
  * time into fixed-width buckets, explode each interval onto the
  * buckets it overlaps (⌈len/width⌉ rows, a small constant when the
  * bucket width is chosen near the typical interval length), map each
  * point to its single containing bucket, then SortMergeJoin on
  * (equiKeys..., bucket) — a plain shuffled equi-join that AQE can
  * re-plan and skew-split — and keep the exact `[start, end)` residual
  * as a post-join filter. Every candidate pair is produced exactly
  * once: a point lives in exactly one bucket, and an interval appears
  * at most once per bucket (`sequence` emits distinct bucket ids), so
  * no dedup pass is needed.
  *
  * All boundary math is done on LONG microseconds (`unix_micros`), so
  * the predicate is integer-exact and engine-portable.
  */
object RangeJoin {

  /** Inner bucketed interval join. `pointTs`, `intervalStart`,
    * `intervalEnd` are TimestampType column names on `points` /
    * `intervals`; `bucketMicros` is the quantization width. Interval
    * semantics are half-open `[start, end)`. Column names of the two
    * inputs must be disjoint apart from `equiKeys`.
    */
  def intervalJoin(points: DataFrame, pointTs: String,
                   intervals: DataFrame, intervalStart: String, intervalEnd: String,
                   bucketMicros: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    def bucketOf(c: Column): Column = floor(unix_micros(c) / bucketMicros)
    // rename interval equi-keys so the join emits unambiguous columns
    val iv0 = equiKeys.foldLeft(intervals)((acc, k) =>
      acc.withColumnRenamed(k, s"__i_$k"))
    // explode the interval onto every bucket it overlaps; end is
    // exclusive, so the last covered bucket is the one holding end-1.
    // Degenerate intervals (end <= start) are dropped FIRST: they can
    // match nothing under half-open semantics, and an inverted pair
    // would otherwise send sequence() stepping downward — a single
    // corrupt row exploding onto every bucket between end and start
    val iv = iv0
      .filter(col(intervalEnd) > col(intervalStart))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(intervalStart)),
        floor((unix_micros(col(intervalEnd)) - 1) / bucketMicros))))
    val p = points.withColumn("__bucket", bucketOf(col(pointTs)))
    val cond = (equiKeys.map(k => p(k) === iv(s"__i_$k")) :+
      (p("__bucket") === iv("__bucket")) :+
      (unix_micros(p(pointTs)) >= unix_micros(iv(intervalStart))) :+
      (unix_micros(p(pointTs)) < unix_micros(iv(intervalEnd)))).reduce(_ && _)
    p.join(iv, cond, "inner")
      .drop("__bucket")
      .drop(equiKeys.map(k => s"__i_$k"): _*)
  }

  /** Interval × interval overlap join — the two-sided sibling of
    * [[intervalJoin]]: emit (l, r) pairs whose half-open intervals
    * `[lStart, lEnd)` and `[rStart, rEnd)` intersect, optionally under
    * extra equi-keys.
    *
    * Same bucketed decomposition, plus the standard ownership trick to
    * keep the output duplicate-free WITHOUT a distinct pass: both
    * sides explode onto their covered buckets, but a matched pair is
    * emitted only in the bucket containing `max(lStart, rStart)` — the
    * overlap's first instant, which provably lies in both sides'
    * bucket ranges, so each overlapping pair survives in exactly one
    * bucket. The join itself is a plain shuffled equi-join on
    * (equiKeys..., bucket) that AQE can re-plan and skew-split; the
    * overlap predicate and the ownership test are cheap integer
    * residuals.
    *
    * Bounds are LONG columns (any fixed unit — millis, micros); bucket
    * arithmetic goes through `floor(x / width)` on doubles, exact for
    * |x| < 2^53 (epoch micros are ~2^51). Degenerate intervals
    * (`end <= start`) are dropped on both sides — they contain no
    * instant, so they can overlap nothing. Column names of the two
    * inputs must be disjoint apart from `equiKeys`.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    def buckets(s: Column, e: Column): Column =
      sequence(bucketOf(s), bucketOf(e - 1))
    val r0 = equiKeys.foldLeft(right)((acc, k) =>
      acc.withColumnRenamed(k, s"__r_$k"))
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("__bucket", explode(buckets(col(lStart), col(lEnd))))
    val r = r0.filter(col(rEnd) > col(rStart))
      .withColumn("__rbucket", explode(buckets(col(rStart), col(rEnd))))
    val cond = (equiKeys.map(k => l(k) === r(s"__r_$k")) ++ Seq(
      l("__bucket") === r("__rbucket"),
      l(lStart) < r(rEnd),
      r(rStart) < l(lEnd),
      l("__bucket") === bucketOf(greatest(l(lStart), r(rStart))))).reduce(_ && _)
    l.join(r, cond, "inner")
      .drop("__bucket").drop("__rbucket")
      .drop(equiKeys.map(k => s"__r_$k"): _*)
  }
}
