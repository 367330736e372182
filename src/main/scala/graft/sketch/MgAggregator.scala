package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed [[Aggregator]] — the
  * one-pass, bounded-memory key-frequency profiler a 100 TB engine
  * needs BEFORE it can plan around skew (the salted join q51 and the
  * AQE skew handling both presuppose someone already knows which keys
  * are hot; this operator finds them without a full groupBy over a
  * possibly-unbounded key domain).
  *
  * Guarantee (the classical one, preserved under arbitrary merge
  * order per the mergeable-summaries construction: on overflow,
  * subtract the (k+1)-th largest combined count from every entry and
  * keep the positive remainder): after summarizing n rows with k
  * counters, every key with true frequency > n/(k+1) is present in
  * the summary. The summary's counts are UNDERestimates, so callers
  * must recount the candidate set exactly — the intended pattern
  * (and what q92 does):
  *
  *   1. one pass, O(k) state/partition, map-side partial merge →
  *      ≤ k candidate keys (a guaranteed superset of the heavy keys);
  *   2. broadcast the candidates, semi-join + exact recount — only
  *      candidate rows shuffle;
  *   3. exact integer threshold filter ⇒ the output is exactly the
  *      keys above threshold, deterministic regardless of merge order
  *      (extra candidates die in step 3).
  *
  * Like [[KmvAggregator]], the buffer is a flat Long array mutated in
  * place: `[fill, key₁, count₁, key₂, count₂, …]`, capacity 1 + 2k,
  * kept SORTED by key so the per-row lookup is an O(log k) binary
  * search, not an O(k) scan — at k = 128 on a full-table pass that is
  * ~7 comparisons per input row instead of up to 128 in the hottest
  * loop of the aggregation. Insertion shifts are O(k) but only fire
  * on NEW keys (bounded by eviction cycles), and the decrement pass
  * is amortized O(1) per row since each pass cancels k prior
  * increments; both preserve the sort order.
  */
class MgAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b0: Array[Long], key: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](1 + 2 * k) else b0
    val fill = b(0).toInt
    // binary search over the key-sorted pair slots
    var lo = 0
    var hi = fill - 1
    var pos = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val km = b(1 + 2 * mid)
      if (km == key) { pos = mid; lo = hi + 1 }
      else if (km < key) lo = mid + 1
      else hi = mid - 1
    }
    if (pos >= 0) b(2 + 2 * pos) += 1
    else if (fill < k) { // lo = insertion point that keeps the sort
      System.arraycopy(b, 1 + 2 * lo, b, 3 + 2 * lo, 2 * (fill - lo))
      b(1 + 2 * lo) = key
      b(2 + 2 * lo) = 1L
      b(0) = fill + 1
    } else {
      // table full and key absent: decrement every counter, compact
      // zeros (the Misra–Gries step; order-preserving)
      var w = 0
      var r = 0
      while (r < fill) {
        val c = b(2 + 2 * r) - 1
        if (c > 0) { b(1 + 2 * w) = b(1 + 2 * r); b(2 + 2 * w) = c; w += 1 }
        r += 1
      }
      b(0) = w
    }
    b
  }

  override def merge(a0: Array[Long], b0: Array[Long]): Array[Long] = {
    if (b0.length == 0) a0
    else if (a0.length == 0) b0
    else {
      val m = scala.collection.mutable.LongMap.empty[Long]
      def addAll(x: Array[Long]): Unit = {
        val f = x(0).toInt
        var i = 0
        while (i < f) {
          m(x(1 + 2 * i)) = m.getOrElse(x(1 + 2 * i), 0L) + x(2 + 2 * i)
          i += 1
        }
      }
      addAll(a0); addAll(b0)
      // subtract the (k+1)-th largest count from everyone when over
      // capacity; at most k entries stay positive and the per-key
      // undercount stays bounded by n/(k+1) in total (the
      // mergeable-summaries argument)
      val cut =
        if (m.size > k) {
          val counts = m.values.toArray
          java.util.Arrays.sort(counts)
          counts(counts.length - k - 1)
        } else 0L
      val keys = m.keysIterator.toArray
      java.util.Arrays.sort(keys) // the buffer contract: key-sorted
      val out = new Array[Long](1 + 2 * k)
      var w = 0
      var i = 0
      while (i < keys.length) {
        val c = m(keys(i)) - cut
        if (c > 0) { out(1 + 2 * w) = keys(i); out(2 + 2 * w) = c; w += 1 }
        i += 1
      }
      out(0) = w
      out
    }
  }

  /** Candidate keys only, sorted — the counts are underestimates by
    * construction and exposing them invites misuse; recount exactly.
    */
  override def finish(b: Array[Long]): Array[Long] = {
    if (b.length == 0) Array.emptyLongArray
    else {
      val fill = b(0).toInt
      val keys = new Array[Long](fill)
      var i = 0
      while (i < fill) { keys(i) = b(1 + 2 * i); i += 1 }
      java.util.Arrays.sort(keys)
      keys
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
