package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Engine-portable approximate sketches. Spark's own
  * `approx_count_distinct`/`approx_percentile` are HLL++/KLL — great at
  * scale but their answers can't be reproduced by another engine, so
  * they can't be oracle-checked (and pipelines that pin results across
  * engines can't use them). The KMV (k-minimum-values) estimator gets
  * the same O(k) state and error ~1/√k, but bottoms out in md5 — every
  * engine computes the identical sketch, bit for bit.
  */
object Sketches {

  /** Per-group k smallest DISTINCT hash values of `value` — the KMV
    * sketch. Two-stage shape for 100 TB: stage 1 takes the k smallest
    * within (group, hash-salt) buckets — the shuffle is keyed on the
    * salted pair, so a low-cardinality group column never funnels the
    * full corpus through one partition — and stage 2 ranks the
    * surviving `salts × k` rows per group (tiny). Returns
    * (groupCols..., hk = k-th smallest hash, got ≤ k).
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], value: Column,
                k: Int, salts: Int = 32): DataFrame = {
    val g = groupCols.map(col)
    val dh = df.select(g :+ Dedup.hash32(value.cast("string"), "kmv").as("h"): _*)
      .distinct()
    val w1 = Window.partitionBy((groupCols :+ "salt").map(col): _*).orderBy("h")
    val s1 = dh.withColumn("salt", col("h") % salts)
      .withColumn("rn", row_number().over(w1)).filter(col("rn") <= k)
      .drop("rn", "salt")
    val w2 = Window.partitionBy(g: _*).orderBy("h")
    s1.withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .groupBy(g: _*)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("got"))
  }

  /** KMV distinct-count estimate from a [[kmvSketch]] row: with fewer
    * than k distinct values the sketch IS the exact set (estimate =
    * got); otherwise (k−1) · 2³² / hk — hashes are uniform on
    * [0, 2³²), so the k-th smallest pins the density.
    */
  def kmvEstimate(hk: Column, got: Column, k: Int): Column =
    when(got < k, got.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / hk.cast("double"))
}
