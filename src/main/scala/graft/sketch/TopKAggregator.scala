package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed [[Aggregator]] — the
  * partial-aggregating alternative to the `row_number() OVER
  * (PARTITION BY g ORDER BY v DESC) <= k` window. The window shape
  * sorts EVERY row of every group after shuffling all of them; this
  * buffer keeps the k best per group per partition, so the map side
  * combines before the exchange and only ≤ k rows per (group,
  * partition) ever shuffle — on a 100 TB fact table with a
  * million-row hot group, the window ships and sorts the million,
  * this ships k·partitions. Same contract Spark's own
  * `ApproximateNthPercentile`-class aggregates rely on: commutative,
  * associative merge over bounded state.
  *
  * Ordering is total and integer-only: by `v` DESC, then `id` ASC —
  * the exact tiebreak the oracle's window spells out, so the result
  * is deterministic and hash-comparable. Duplicate `(v, id)` pairs
  * are kept (top-k of ROWS, not of distinct values).
  *
  * Buffer layout: flat Long array `[fill, v₁, id₁, …]` sorted by the
  * output order, capacity 1 + 2k, mutated in place like the sibling
  * sketches ([[KmvAggregator]], [[MgAggregator]]).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** True if (v1, id1) ranks strictly before (v2, id2). */
  @inline private def before(v1: Long, id1: Long, v2: Long, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  private def insert(b0: Array[Long], v: Long, id: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](1 + 2 * k) else b0
    val fill = b(0).toInt
    if (fill >= k && !before(v, id, b(2 * fill - 1), b(2 * fill))) b
    else {
      // position of the first kept item the new one ranks before
      var p = 0
      while (p < fill && !before(v, id, b(1 + 2 * p), b(2 + 2 * p))) p += 1
      val keep = math.min(fill, k - 1) // items after p that survive
      System.arraycopy(b, 1 + 2 * p, b, 3 + 2 * p, 2 * (keep - p))
      b(1 + 2 * p) = v
      b(2 + 2 * p) = id
      if (fill < k) b(0) = fill + 1
      b
    }
  }

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] =
    insert(b, in._1, in._2)

  override def merge(a: Array[Long], b0: Array[Long]): Array[Long] = {
    if (b0.length == 0) a
    else if (a.length == 0) b0
    else {
      val fb = b0(0).toInt
      var i = 0
      var out = a
      while (i < fb) { out = insert(out, b0(1 + 2 * i), b0(2 + 2 * i)); i += 1 }
      out
    }
  }

  override def finish(b: Array[Long]): Seq[(Long, Long)] = {
    if (b.length == 0) Seq.empty
    else (0 until b(0).toInt).map(i => (b(1 + 2 * i), b(2 + 2 * i)))
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
