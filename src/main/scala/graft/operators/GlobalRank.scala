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
               rankCol: String = "rank", numPartitions: Int = 0): DataFrame =
    ranked(df, sortCols, rankCol, numPartitions)._1

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

  /** `df` plus the exact EXCLUSIVE global running max of long column
    * `valCol` over `sortCols` (strictly-preceding rows only) — what a
    * `max(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    * 1 PRECEDING)` global window computes, without the
    * single-partition WindowExec. Same two-phase shape as
    * [[withRank]]: range-partition on the sort key, per-partition max
    * (metadata-sized collect), exclusive cross-partition prefix
    * maxima as an array literal (`element_at`, O(1)/row), plus a
    * partitioned exclusive running-max window within each range.
    *
    * Rows with NO strict predecessor get [[Long.MinValue]] (the
    * natural identity for max — callers comparing `v > prefix` keep
    * the global optimum without a null branch). `sortCols` must be a
    * total order for a deterministic result wherever ties would
    * straddle a comparison.
    */
  def withPrefixMax(df: DataFrame, sortCols: Seq[Column], valCol: String,
                    outCol: String, numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "global prefix max needs a sort column")
    val parallelism =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val parts = Dedup.materialize(
      df.repartitionByRange(parallelism, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    // a partition whose values are ALL null has a null max — keep the
    // identity rather than silently reading 0 from the null cell
    val hist = parts.groupBy("__pid").agg(max(col(valCol)).as("mx"))
      .collect().filterNot(_.isNullAt(1))
      .map(r => (r.getInt(0), r.getLong(1)))
    val numParts = parts.rdd.getNumPartitions
    val maxes = Array.fill(numParts)(Long.MinValue)
    hist.foreach { case (pid, m) => maxes(pid) = m }
    // exclusive prefix: partition p sees the max over partitions < p
    val prefixArr = new Array[Long](numParts)
    var acc = Long.MinValue
    var i = 0
    while (i < numParts) {
      prefixArr(i) = acc
      acc = math.max(acc, maxes(i)); i += 1
    }
    val partPrefix = element_at(lit(prefixArr), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localPrefix = coalesce(max(col(valCol)).over(w), lit(Long.MinValue))
    parts.withColumn(outCol, greatest(partPrefix, localPrefix)).drop("__pid")
  }

  /** `df` plus exact global running SUMS of the long columns `valCols`
    * over `sortCols` — what `sum(v) OVER (ORDER BY ...)` global windows
    * compute (inclusive frame, or exclusive with
    * `inclusive = false`) — without the single-partition WindowExec.
    * The distributed-ECDF primitive: AUC, KS statistics, cumulative
    * shares all reduce to it.
    *
    * One range shuffle serves ALL requested columns: the per-partition
    * totals for every column ride a single metadata-sized collect
    * (≤ one row per partition), the per-column offsets are array
    * literals (`element_at`, O(1)/row), and the partitioned local
    * windows share one frame spec so Spark evaluates them in a single
    * WindowExec pass. Null values count as 0. Exact while every
    * running sum stays inside Long range (callers summing counts are
    * safe to ~9.2e18 rows).
    */
  def withPrefixSums(df: DataFrame, sortCols: Seq[Column],
                     valCols: Seq[String], outCols: Seq[String],
                     inclusive: Boolean = true,
                     numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "global prefix sum needs a sort column")
    require(valCols.nonEmpty && valCols.length == outCols.length,
      s"valCols/outCols must align, got $valCols vs $outCols")
    val parallelism =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val parts = Dedup.materialize(
      df.repartitionByRange(parallelism, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    // one aggregate carries every column's partition total; sum()
    // ignores nulls, and an all-null/empty partition's null total is
    // the additive identity 0
    val aggs = valCols.map(c => sum(col(c)).as(c))
    val totals = parts.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
      .collect()
    val numParts = parts.rdd.getNumPartitions
    val offsetArrs = valCols.indices.map { ci =>
      val perPart = new Array[Long](numParts)
      totals.foreach { r =>
        if (!r.isNullAt(ci + 1)) perPart(r.getInt(0)) = r.getLong(ci + 1)
      }
      // exclusive prefix over partitions: partition p's base is the
      // sum over partitions < p
      val arr = new Array[Long](numParts)
      var acc = 0L
      var i = 0
      while (i < numParts) { arr(i) = acc; acc += perPart(i); i += 1 }
      arr
    }
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
    val out = valCols.indices.foldLeft(parts) { (acc, i) =>
      acc.withColumn(outCols(i),
        element_at(lit(offsetArrs(i)), col("__pid") + 1)
          + coalesce(sum(col(valCols(i))).over(w), lit(0L)))
    }
    out.drop("__pid")
  }

  private def ranked(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String, numPartitions: Int = 0): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "global rank needs at least one sort column")
    val parallelism =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // materialized (eager localCheckpoint): two consumers — the
    // histogram job and the output — must see the SAME sampled range
    // boundaries, and the upstream must not recompute per consumer.
    val parts = Dedup.materialize(
      df.repartitionByRange(parallelism, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val hist = parts.groupBy("__pid").count().orderBy("__pid").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val total = hist.map(_._2).sum
    // Dense cumulative-offset array over ALL partition ids (empty
    // partitions hold 0 rows and are absent from the histogram): one
    // array literal + O(1) element_at per row. A per-partition
    // when-chain here would cost O(partitions) per row — fine at
    // local[32], anti-scaling on a cluster where defaultParallelism
    // is 10^4+.
    val numParts = parts.rdd.getNumPartitions
    val counts = new Array[Long](numParts)
    hist.foreach { case (pid, c) => counts(pid) = c }
    val offsetArr = new Array[Long](numParts)
    var acc = 0L
    var i = 0
    while (i < numParts) { offsetArr(i) = acc; acc += counts(i); i += 1 }
    val offsetCol = element_at(lit(offsetArr), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val out = parts
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__pid")
    (out, total)
  }
}
