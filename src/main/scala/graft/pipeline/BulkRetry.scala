package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}

/** Bulk-sink retry/backoff semantics (SURVEY §2 row 10's delivery
  * half; reference `vendor/gopkg.in/olivere/elastic.v5/bulk_processor
  * .go:21,64-67`): a bulk flush reports a per-item status; items with
  * a retryable status — 408 Request Timeout, 429 Too Many Requests,
  * 503 Service Unavailable, 507 Insufficient Storage — are resubmitted
  * after an exponential backoff that doubles from 200 ms to a 10 s
  * ceiling, while anything else non-2xx fails that item immediately
  * (never the whole batch). Replaying a retried sub-batch is safe
  * because doc ids are deterministic ([[Pipeline.toJsonDocs]]): the
  * sink sees an idempotent upsert.
  *
  * This is deliberately executor-side, per-partition logic: each task
  * drains its own partition's bulk chunks with no driver round-trip,
  * so the retry path scales with the cluster exactly like the happy
  * path. The local file sink makes retries moot; an ES/HTTP-shaped
  * sender plugs in as the `send` function.
  */
object BulkRetry {

  val RetryableStatuses: Set[Int] = Set(408, 429, 503, 507)
  val BaseBackoffMs = 200L
  val MaxBackoffMs = 10000L

  /** Exponential backoff before retry `attempt` (0-based): 200 ms
    * doubling, capped at 10 s (the reference's
    * `elastic.NewExponentialBackoff(200ms, 10s)`).
    */
  def backoffMs(attempt: Int): Long =
    math.min(MaxBackoffMs, BaseBackoffMs << math.min(attempt, 30))

  /** One document of a bulk request: target index, deterministic id,
    * JSON body.
    */
  final case class Doc(esIndex: String, docId: String, doc: String)

  /** Per-item outcome of one `send`: HTTP-shaped status. */
  final case class ItemResult[A](item: A, status: Int)

  /** Flush outcome: 2xx count, retry rounds used, items that failed
    * fatally or exhausted their retries (with last status).
    */
  final case class Report[A](succeeded: Long, attempts: Int, failed: Seq[ItemResult[A]])

  /** Sends `items` through `send`, resubmitting the retryable subset
    * (per-item, not whole-batch) with exponential backoff until clean,
    * fatal, or `maxRetries` rounds are spent. `sleep` is injectable
    * for tests.
    */
  def flush[A](items: Seq[A], maxRetries: Int = 5, sleep: Long => Unit = Thread.sleep)
              (send: Seq[A] => Seq[ItemResult[A]]): Report[A] = {
    var pending: Seq[A] = items
    var failed = Seq.empty[ItemResult[A]]
    var succeeded = 0L
    var attempt = 0
    var done = pending.isEmpty
    while (!done) {
      val raw = send(pending)
      // Trust nothing about the sender's cardinality: keep only ONE
      // result per submitted item occurrence (multiset semantics —
      // duplicate acks for one submission, or acks for items never
      // submitted, are discarded), and fail the unacknowledged
      // remainder (status 0 = "unaccounted by sender") so
      // succeeded + failed always accounts for every input item.
      val budget = scala.collection.mutable.Map.empty[A, Int]
      pending.foreach(a => budget(a) = budget.getOrElse(a, 0) + 1)
      // .toList forces the filter's budget decrements NOW — a lazy Seq
      // from the sender (Stream/LazyList) would otherwise run them
      // after the unacknowledged-remainder sweep below, double-counting
      // every acked item as both failed(0) and succeeded/retried.
      val results = raw.filter { r =>
        val n = budget.getOrElse(r.item, 0)
        if (n > 0) { budget(r.item) = n - 1; true } else false
      }.toList
      failed ++= budget.collect { case (a, n) if n > 0 => Seq.fill(n)(ItemResult(a, 0)) }.flatten
      succeeded += results.count(_.status / 100 == 2)
      failed ++= results.filter(r => r.status / 100 != 2 && !RetryableStatuses(r.status))
      val retry = results.filter(r => RetryableStatuses(r.status))
      if (retry.isEmpty) done = true
      else if (attempt >= maxRetries) { failed ++= retry; done = true }
      else {
        sleep(backoffMs(attempt))
        attempt += 1
        pending = retry.map(_.item)
      }
    }
    Report(succeeded, attempt, failed)
  }

  /** Drains a [[Pipeline.toJsonDocs]]-shaped frame through a retrying
    * bulk sender, `bulkSize` docs per request, partition-parallel.
    * Returns (sent, failed) totals via accumulators. Wire into
    * streaming with `foreachBatch((b, _) => writeBulk(Pipeline
    * .toJsonDocs(b))(send))`.
    */
  def writeBulk(docs: DataFrame, bulkSize: Int = 1000, maxRetries: Int = 5)
               (send: Seq[Doc] => Seq[ItemResult[Doc]]): (Long, Long) = {
    val sc = docs.sparkSession.sparkContext
    val sent = sc.longAccumulator("graft_bulk_sent")
    val lost = sc.longAccumulator("graft_bulk_failed")
    docs.select("es_index", "doc_id", "doc").foreachPartition { (it: Iterator[Row]) =>
      // A thrown send (the common ES failure mode: connection refused,
      // timeout) must ride the per-item backoff path, not fail the task —
      // task-level replay would re-send chunks that already succeeded.
      // Map transport exceptions to all-items-503 (retryable), so flush
      // backs off and retries; only exhausted retries count as lost.
      val safeSend: Seq[Doc] => Seq[ItemResult[Doc]] = chunk =>
        try send(chunk)
        catch { case scala.util.control.NonFatal(_) => chunk.map(ItemResult(_, 503)) }
      it.grouped(bulkSize).foreach { chunk =>
        val items = chunk.map(r => Doc(r.getString(0), r.getString(1), r.getString(2))).toSeq
        val rep = flush(items, maxRetries)(safeSend)
        sent.add(rep.succeeded)
        lost.add(rep.failed.size.toLong)
      }
    }
    (sent.value, lost.value)
  }
}
