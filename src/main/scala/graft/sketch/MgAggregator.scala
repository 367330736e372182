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
  * place: `[fill, key₁, count₁, key₂, count₂, …]`, capacity 1 + 2k.
  */
class MgAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b0: Array[Long], key: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](1 + 2 * k) else b0
    val fill = b(0).toInt
    var i = 0
    while (i < fill) {
      if (b(1 + 2 * i) == key) { b(2 + 2 * i) += 1; return b }
      i += 1
    }
    if (fill < k) {
      b(1 + 2 * fill) = key
      b(2 + 2 * fill) = 1L
      b(0) = fill + 1
    } else {
      // table full and key absent: decrement every counter, compact
      // zeros (the Misra–Gries step — amortized O(1) per input row,
      // since each decrement pass cancels k prior increments)
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
      val out = new Array[Long](1 + 2 * k)
      var w = 0
      if (m.size > k) {
        // subtract the (k+1)-th largest count from everyone; at most k
        // entries stay positive and the per-key undercount stays
        // bounded by n/(k+1) in total (mergeable-summaries argument)
        val counts = m.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - k - 1)
        m.foreach { case (key, c) =>
          if (c - cut > 0) { out(1 + 2 * w) = key; out(2 + 2 * w) = c - cut; w += 1 }
        }
      } else {
        m.foreach { case (key, c) =>
          out(1 + 2 * w) = key; out(2 + 2 * w) = c; w += 1
        }
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
