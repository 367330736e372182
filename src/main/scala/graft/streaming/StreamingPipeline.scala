package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.pipeline.{LazyFillCache, Pipeline}

/** Structured-Streaming assembly of the reference pipeline
  * (SURVEY §3.1 stages 2-3): the same declarative plan as batch
  * [[Pipeline.assemble]], driven by micro-batches with checkpointed
  * offsets.
  *
  * Delivery semantics (SURVEY §2 row 11): offset log at batch start +
  * commit log at batch end ⇒ end-to-end at-least-once, an improvement
  * over the reference's async-sink + 60 s checkpoint loss window; the
  * date-partitioned parquet append is made effectively-once by writing
  * per-batch directories keyed on batchId (idempotent replay).
  */
object StreamingPipeline {

  /** The per-batch sink body every `start*` variant shares: documents
    * land under a batchId-keyed subdir in overwrite mode, so a micro-
    * batch REPLAYED after a crash (sink wrote, offset-log commit never
    * happened — the at-least-once window) overwrites its own earlier
    * attempt instead of duplicating it. Together with the
    * deterministic `doc_id` ([[Pipeline.toJsonDocs]]) this is the
    * effectively-once contract `StreamingSoakSpec` kills and restarts
    * against.
    */
  def sinkDocs(assembled: DataFrame, batchId: Long, outDir: String): Unit =
    Pipeline.toJsonDocs(assembled)
      .write.mode("overwrite")
      .partitionBy("es_index")
      .parquet(s"$outDir/batch=$batchId")

  /** Start the full pipeline over a streaming `records` frame, landing
    * date-partitioned documents under `outDir`. 15 s trigger mirrors
    * the reference's bulk flush interval (`main.go:189`).
    */
  def start(records: DataFrame, dims: DataFrame, checkpointDir: String,
            outDir: String, trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    Pipeline.assemble(records, dims)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sinkDocs(batch, batchId, outDir)
      }
      .start()

  /** [[start]] with the ingest-time near-dup monitor fused into the
    * same `foreachBatch` (VERDICT r10 item 3): each micro-batch is (a)
    * sunk exactly as [[start]] does, and (b) folded into the
    * persistent MinHash-LSH signature store
    * ([[StreamingDedup.foldBatchPersistent]]) keyed on the SAME
    * deterministic `doc_id` the sink documents carry
    * ([[Pipeline.docId]]), over the parsed log line — so an emitted
    * pair `(id_a, id_b)` joins directly against the sink to name the
    * two near-duplicate documents. Near-dup pairs land batchId-keyed
    * under `pairsDir` ([[StreamingDedup.pairsView]] reads the union).
    *
    * One batch, one plan head: the assembled frame is persisted for
    * the two consumers (sink projection + dedup projection) and
    * released before the batch commits — decode/route/grok/enrich run
    * once per record, not once per consumer (the dead-letter variant's
    * rule). Both sinks and the state write are batchId-keyed, so a
    * crash-window replay is idempotent end to end, and the signature
    * state survives restarts on disk — the monitor COMPOSES with the
    * reference pipeline's effectively-once contract instead of
    * weakening it.
    *
    * `compactEvery > 0` bounds the signature store's dir growth by
    * running [[StreamingDedup.maybeCompact]] as the `foreachBatch`
    * epilogue — serialized with folds by construction, over committed
    * batches only (the epilogue IS the quiesce; see its scaladoc). At
    * the 15 s trigger an unbounded store accretes ~5,760 dirs/day.
    */
  def startWithNearDup(records: DataFrame, dims: DataFrame, checkpointDir: String,
                       outDir: String, statePath: String, pairsDir: String,
                       compactEvery: Int = 0,
                       trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    Pipeline.assemble(records, dims)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          sinkDocs(b, batchId, outDir)
          val docs = b.select(Pipeline.docId.as("doc_id"),
            col("env.log_message.message").as("text"))
          StreamingDedup.foldBatchPersistent(statePath, docs, batchId,
            pairsDir = Some(pairsDir)): Unit
        } finally b.unpersist(): Unit
        StreamingDedup.maybeCompact(batch.sparkSession, statePath, batchId,
          compactEvery)
      }
      .start()

  /** Like [[start]], but the dimension is re-loaded every micro-batch
    * — the Spark-native form of the reference's TTL'd read-through
    * cache (SURVEY §2 row 6: 6 h jittered TTL ⇒ here, refresh
    * granularity = trigger interval). `dimsLoader` re-reads the
    * dimension snapshot (table/path/API dump); the broadcast join is
    * re-planned per batch so updates are visible without restart.
    */
  def startWithDimRefresh(records: DataFrame, dimsLoader: () => DataFrame,
                          checkpointDir: String, outDir: String,
                          trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pipeline.toJsonDocs(Pipeline.assemble(batch, dimsLoader()))
          .write.mode("overwrite")
          .partitionBy("es_index")
          .parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** [[startWithDimRefresh]] with the reference's jittered-TTL refresh
    * policy (`caching_lazyfill.go:87-157`, 6 h × jitter [0.75, 1.25)
    * in production config): the dimension snapshot reloads only when
    * its TTL lapses, not every micro-batch — per-row lazy fill against
    * one Go process's cache translates to per-SNAPSHOT lazy fill on
    * the driver, since the join side is a broadcast snapshot. The
    * snapshot is localCheckpointed at fill so every batch inside one
    * TTL window broadcasts the SAME materialized rows (no re-read of a
    * possibly-moving source mid-window), and the cache is the one
    * refresh-decision point (injectable clock/jitter in tests via the
    * `cache` overload).
    */
  def startWithDimTtl(records: DataFrame, dimsLoader: () => DataFrame,
                      dimTtlMs: Long, checkpointDir: String, outDir: String,
                      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    startWithDimCache(records,
      new LazyFillCache[Unit, DataFrame](dimTtlMs, _ => dimsLoader().localCheckpoint()),
      checkpointDir, outDir, trigger)

  def startWithDimCache(records: DataFrame, cache: LazyFillCache[Unit, DataFrame],
                        checkpointDir: String, outDir: String,
                        trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pipeline.toJsonDocs(Pipeline.assemble(batch, cache.get(())))
          .write.mode("overwrite")
          .partitionBy("es_index")
          .parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Like [[start]], but malformed records go to a DEAD-LETTER path
    * instead of vanishing: the reference logs-and-drops undecodable
    * Kinesis records (`main.go:356-360` — a counter and a discarded
    * payload); at 100 TB "count and discard" means losing the evidence
    * needed to debug an upstream producer, so the raw (data,
    * sequenceNumber, arrival) triple is quarantined, batchId-keyed for
    * idempotent replay like the main sink. The batch is decoded ONCE —
    * the persisted frame carries the decoded `env` struct, so both the
    * DLQ branch and [[Pipeline.assembleDecoded]] read cached decode
    * output (released before the batch commits — bounded lifetime, no
    * session leak).
    */
  def startWithDeadLetter(records: DataFrame, dims: DataFrame, checkpointDir: String,
                          outDir: String, dlqDir: String,
                          trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val decoded = Pipeline.withEnv(batch).persist()
        try {
          val malformed = decoded.filter(col("env").isNull)
            .select("data", "sequenceNumber", "approximateArrivalTimestamp")
          // only write the DLQ batch dir when something is actually
          // malformed: the healthy-pipeline case would otherwise leave
          // a data-file-less parquet dir per batch, and a reader over
          // dlqDir fails schema inference when ALL dirs are empty.
          // Cheap: `decoded` is already persisted by this point.
          if (!malformed.isEmpty) {
            malformed.write.mode("overwrite").parquet(s"$dlqDir/batch=$batchId")
          }
          Pipeline.toJsonDocs(Pipeline.assembleDecoded(decoded, dims))
            .write.mode("overwrite")
            .partitionBy("es_index")
            .parquet(s"$outDir/batch=$batchId")
        } finally decoded.unpersist()
      }
      .start()

  /** Watermarked tumbling-window aggregation over the decoded stream —
    * the event-time operator family the reference lacks entirely
    * (SURVEY §2.3): late data beyond the watermark is dropped, state
    * is bounded, output is append-mode finalized windows.
    */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("family"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("family"), col("cnt"))

  /** Stream-stream interval join with bounded state: points (e.g.
    * purchases) match intervals anchored at an event (e.g. clicks,
    * window `[anchor, anchor + windowExpr)`) for the same equi-keys.
    * The time-bound condition + watermarks on BOTH sides is what lets
    * Spark evict join state — without the range constraint each side's
    * state grows forever, the stream-join equivalent of an unbounded
    * nested loop. (Batch twin: [[graft.operators.RangeJoin]].)
    *
    * Inputs must already carry the named timestamp columns; all other
    * column names must be disjoint apart from `equiKeys`.
    */
  def streamIntervalJoin(points: DataFrame, pointTs: String, pointDelay: String,
                         anchors: DataFrame, anchorTs: String, anchorDelay: String,
                         windowExpr: String, equiKeys: Seq[String]): DataFrame = {
    val p = points.withWatermark(pointTs, pointDelay)
    val a0 = anchors.withWatermark(anchorTs, anchorDelay)
    val a = equiKeys.foldLeft(a0)((acc, k) => acc.withColumnRenamed(k, s"__a_$k"))
    val cond = (equiKeys.map(k => p(k) === a(s"__a_$k")) :+
      (p(pointTs) >= a(anchorTs)) :+
      (p(pointTs) < a(anchorTs) + expr(s"INTERVAL $windowExpr"))).reduce(_ && _)
    p.join(a, cond, "inner")
      .drop(equiKeys.map(k => s"__a_$k"): _*)
  }

  /** Current-document view over the batchId-keyed sink layout — the
    * read-side twin of Elasticsearch's overwrite-by-id semantics
    * (`main.go:432-451`: every index action carries a deterministic
    * doc id, so a re-sent document REPLACES its predecessor). The
    * parquet sink appends one `batch=<id>` dir per micro-batch
    * (idempotent replay); when a later batch re-emits a doc_id (e.g. a
    * reprocessed record), both versions exist on disk and a reader
    * must resolve to the LATEST — exactly what an ES GET would return.
    *
    * Plan shape: partition-discovered `batch` column (no file-name
    * parsing), window partitioned by (es_index, doc_id) — never
    * global — keeping the max-batch row. At scale the window shuffles
    * on the doc key once; since `es_index` is the physical partition
    * column, per-index reads prune before the shuffle.
    */
  def currentView(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // read the ROOT: partition discovery yields the `batch` (and
    // `es_index`) columns from the dir layout; a `batch=*` glob would
    // also work but trips a noisy FileStreamSink metadata probe
    val all = spark.read.parquet(outDir)
    val w = Window.partitionBy(col("es_index"), col("doc_id"))
      .orderBy(col("batch").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch")
  }

  /** Prometheus-style cumulative counters fed by the `observe` node in
    * [[Pipeline.assemble]] — the Spark twin of the reference's
    * sent/error counters (`main.go:40-52, 201-210`).
    */
  final class Metrics extends StreamingQueryListener {
    val recordsTotal = new AtomicLong(0)
    val malformedTotal = new AtomicLong(0)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      if (om.containsKey("graft_pipeline")) {
        val row = om.get("graft_pipeline")
        recordsTotal.addAndGet(row.getAs[Long]("records_total"))
        malformedTotal.addAndGet(row.getAs[Long]("malformed_total"))
      }
    }
  }

  /** Registers the listener; with `publish = true` its counters are
    * ALSO exposed as metrics-system gauges (source `graft_pipeline`),
    * which every configured sink exports — in particular the driver's
    * `/metrics/prometheus` servlet when the session is built with
    * [[graft.GraftSession.prometheusConf]].
    */
  def registerMetrics(spark: SparkSession, publish: Boolean = false): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    if (publish)
      org.apache.spark.GraftMetrics.registerGauges(spark.sparkContext, "graft_pipeline",
        Map("records_total" -> (() => m.recordsTotal.get()),
            "malformed_total" -> (() => m.malformedTotal.get())))
    m
  }
}
