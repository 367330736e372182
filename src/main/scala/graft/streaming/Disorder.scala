package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Event-time disorder / watermark-sizing measurement, shared by the
  * batch audit (q224) and its incremental streaming monitor.
  *
  * Each event rides a shard (`user_id mod` [[Shards]] — the reference
  * consumer's partition-key fan-in, many users multiplexed per shard;
  * cf. /root/reference vendor kinesis-consumer shard fan-out) and
  * arrives under a deterministic md5-derived network-jitter model
  * (event time + delay < [[JitterMs]]): the synthetic feed is
  * perfectly ordered, so the audit rehearses the arrival noise a real
  * producer fleet adds, with the battery's usual hash determinism.
  * Lateness of an event = how far the shard's running max event-time
  * (in arrival order) is ahead of the event's own time — exactly the
  * quantity a `withWatermark` delay must cover for the event not to
  * be dropped.
  *
  * The streaming fold keeps ONE row per shard (the running max) plus
  * a bucket-sized count table; because the running max at any position
  * equals max(carried max, within-batch prior max), the fold over any
  * arrival-ordered batch boundaries reproduces the batch computation
  * EXACTLY — fold == rebuild, the same contract as the W₁/PSI/NB
  * monitors.
  */
object Disorder {

  val Shards = 32
  val JitterMs = 30000L

  /** (shard, event_id, ts_ms, arr_ms) from a `Tables.events` frame.
    * Null user_ids are dropped (battery convention): a null shard key
    * would also break the streaming fold's carry join — plain
    * equality never matches null, so the null shard's running max
    * would silently reset per batch and fold ≠ rebuild.
    */
  def withArrival(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(pmod(col("user_id"), lit(Shards)).as("shard"),
        col("event_id"), col("ts_ms"))
      .withColumn("arr_ms", col("ts_ms") +
        pmod(Dedup.hash32(col("event_id").cast("string"), "arr"),
          lit(JitterMs)))

  /** Exponential lateness bucket — shared literal boundaries with the
    * q224 oracle text.
    */
  def bucketOf(lateMs: Column): Column =
    when(lateMs === 0, lit("a_ontime"))
      .when(lateMs < 1000L, lit("b_lt1s"))
      .when(lateMs < 10000L, lit("c_lt10s"))
      .when(lateMs < 100000L, lit("d_lt100s"))
      .otherwise(lit("e_ge100s"))

  def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("shard", "max_ts")
  }

  /** Per-event lateness rows for one arrival-ordered batch, given the
    * carried per-shard running max. An event with NO prior (first of
    * its shard ever) yields no row — identical on the batch path,
    * where the window's 1-PRECEDING frame is empty.
    */
  def lateness(batch: DataFrame, state: DataFrame): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("arr_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    batch.join(state.withColumnRenamed("max_ts", "__carry"),
        Seq("shard"), "left")
      .withColumn("__prior_in", max("ts_ms").over(w))
      .withColumn("__prior", greatest(
        coalesce(col("__prior_in"), lit(Long.MinValue)),
        coalesce(col("__carry"), lit(Long.MinValue))))
      .filter(col("__prior") =!= Long.MinValue)
      .select(col("shard"),
        greatest(col("__prior") - col("ts_ms"), lit(0L)).as("late_ms"))
  }

  /** Advance the per-shard running max over one batch. */
  def advance(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
        batch.groupBy("shard").agg(max("ts_ms").as("max_ts")))
      .groupBy("shard").agg(max("max_ts").as("max_ts"))

  /** Bucket-count delta for a lateness frame. */
  def bucketize(late: DataFrame): DataFrame =
    late.select(bucketOf(col("late_ms")).as("bucket"), col("late_ms"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"), max("late_ms").as("max_late_ms"))

  /** Additive merge of two bucket tables (counts sum, maxes max). */
  def mergeBuckets(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket")
      .agg(sum("n_events").as("n_events"), max("max_late_ms").as("max_late_ms"))

  /** The audit table: per-bucket counts, max lateness, share in bp. */
  def report(buckets: DataFrame): DataFrame = {
    val tot = buckets.agg(sum("n_events").as("total"))
    buckets.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_events"), col("max_late_ms"),
        expr("n_events * 10000 div total").as("share_bp"))
      .orderBy("bucket")
  }
}
