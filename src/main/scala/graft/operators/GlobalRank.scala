package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Exact global rank / ntile WITHOUT a global single-partition window.
  *
  * `Window.orderBy(...)` with no partition spec moves the whole corpus
  * through one task (`WindowExec: No Partition Defined`) — the classic
  * scale-killer for "assign global row numbers". This operator computes
  * the identical ranks in two phases, the same shape
  * `RDD.zipWithIndex` uses:
  *
  *  1. range-repartition on the sort key (a distributed sort's shuffle)
  *     and row_number WITHIN each partition (partitioned window — every
  *     task sorts only its own range);
  *  2. add per-partition offsets from the partition row-count
  *     histogram — a partition-count-sized driver collect (metadata,
  *     not data: ≤ one row per partition).
  *
  * Range partition p holds keys strictly below partition p+1's, so
  * `offset(p) + local row_number` IS the exact global rank. Sampled
  * range boundaries (which are not cross-engine deterministic) only
  * move rows between partitions; the rank itself is exact, which keeps
  * rank-derived outputs oracle-reproducible.
  */
object GlobalRank {

  /** `df` plus an exact 1-based global rank over `sortCols` (which must
    * be a total order — include a unique tiebreak column).
    */
  def withRank(df: DataFrame, sortCols: Seq[Column],
               rankCol: String = "rank"): DataFrame =
    ranked(df, sortCols, rankCol)._1

  /** `df` plus the exact `ntile(k)` bucket (1-based, long) that a
    * global `ntile(k) OVER (ORDER BY sortCols)` would assign — first
    * `n mod k` buckets get `ceil(n/k)` rows, the rest `floor(n/k)` —
    * computed rank-side so no single-partition WindowExec appears.
    */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
                tileCol: String): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val (r, n) = ranked(df, sortCols, "__rank")
    val rank = col("__rank")
    val q = n / k
    val rem = n % k
    val cut = (q + 1) * rem
    val tile =
      if (q == 0) rank // fewer rows than buckets: bucket = rank
      else if (rem == 0) (rank - 1) / q + 1
      else when(rank <= cut, (rank - 1) / (q + 1) + 1)
        .otherwise((rank - cut - 1) / q + rem + 1)
    r.withColumn(tileCol, tile.cast("long")).drop("__rank")
  }

  private def ranked(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "global rank needs at least one sort column")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // materialized (eager localCheckpoint): two consumers — the
    // histogram job and the output — must see the SAME sampled range
    // boundaries, and the upstream must not recompute per consumer.
    val parts = Dedup.materialize(
      df.repartitionByRange(parallelism, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val hist = parts.groupBy("__pid").count().orderBy("__pid").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val total = hist.map(_._2).sum
    var acc = 0L
    val offsets = hist.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    // ≤ one branch per partition — a metadata-sized case expression
    val offsetCol = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val out = parts
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__pid")
    (out, total)
  }
}
