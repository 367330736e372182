package graft.layout

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the write-side half of the co-located join
  * story: hash-bucketing both sides of a recurring join on its key
  * (same key, same bucket count) lets every later join read
  * bucket-aligned splits and skip the exchange entirely, and an
  * equality filter on the bucket key prunes to 1/n of the files
  * before the scan starts. At 100 TB this is the difference between
  * re-shuffling the fact table on every join of every job and paying
  * the shuffle ONCE at layout time — the same amortization argument
  * as [[ZOrder]], applied to join keys instead of range predicates.
  *
  * The layout contract ([[BucketingSpec]] asserts all three):
  *   - both sides bucketed on the join key with equal bucket counts →
  *     SortMergeJoin with ZERO ShuffleExchange;
  *   - writing pre-partitioned by the key (one task per bucket) and
  *     `sortBy` the key → one sorted file per bucket, so the
  *     scan-side Sort disappears too;
  *   - `key = literal` scans `SelectedBucketsCount: 1 out of n`.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. Repartitions by
    * the key into `buckets` tasks first so each bucket is ONE sorted
    * file — without this, every write task emits a file per bucket it
    * touches (task × bucket small files) and readers must re-sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val sorts = key +: sortCols
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
