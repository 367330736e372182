package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV sketch result: k-th smallest distinct hash (max of the kept
  * set) and how many were kept (< k ⇒ the set is exact).
  */
case class KmvState(hk: Long, got: Long)

/** The KMV sketch as a typed [[Aggregator]] — the UDAF face of
  * [[Sketches.kmvSketch]] (which builds the identical sketch from
  * composed relational ops). One aggregation instead of two window
  * stages: the buffer is the bounded sorted array of the k smallest
  * DISTINCT hashes, O(k) state per group, mergeable in any order —
  * exactly the contract Spark's partial aggregation needs, so the
  * map side combines before the shuffle like any built-in agg.
  *
  * Registered via `functions.udaf`, it slots into `groupBy(...).agg`
  * and SQL — the extension surface SURVEY §2.3 notes the reference
  * lacks entirely. Value-identical to the two-stage sketch (same
  * oracle pins both: q41 vs q76).
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], KmvState] {
  require(k > 0, s"k must be positive, got $k")

  // Buffer layout: slot 0 = fill count, slots 1..fill = the kept
  // hashes, sorted ascending. Fixed capacity k+1, mutated IN PLACE —
  // Aggregator buffers are owned by the framework between calls, so
  // reduce/merge may mutate and return them; the round-6 version
  // allocated and copied a fresh array per input row (O(k) GC churn
  // per row on the advertised scale-ready extension surface).
  override def zero: Array[Long] = Array.emptyLongArray

  /** In-place insert into the sorted bounded set; no-op for duplicates
    * and for values above the current k-th minimum when full.
    */
  private def insert(b0: Array[Long], h: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](k + 1) else b0
    val fill = b(0).toInt
    val i = java.util.Arrays.binarySearch(b, 1, 1 + fill, h)
    if (i >= 0) b // already present (KMV is over DISTINCT hashes)
    else {
      val p = -i - 1 // insertion slot in [1, fill+1]
      if (fill >= k && p > k) b // larger than everything kept
      else {
        if (fill < k) {
          System.arraycopy(b, p, b, p + 1, fill - p + 1)
          b(0) = fill + 1
        } else { // full: shift right, dropping the current k-th minimum
          System.arraycopy(b, p, b, p + 1, k - p)
        }
        b(p) = h
        b
      }
    }
  }

  override def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    val fillB = if (b.length == 0) 0 else b(0).toInt
    var i = 1
    while (i <= fillB) { out = insert(out, b(i)); i += 1 }
    out
  }
  override def finish(b: Array[Long]): KmvState = {
    val fill = if (b.length == 0) 0 else b(0).toInt
    KmvState(if (fill == 0) 0L else b(fill), fill.toLong)
  }
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
}

/** KMV variant that returns the kept k-minimum hash SET (ascending) —
  * the carrier of sketch set algebra (q100): the union of two sets'
  * sketches is the k smallest of the merged hash sets, the
  * intersection estimate is the Jaccard-style common fraction below
  * the union's k-th minimum scaled by the union estimate. Same
  * buffer, same in-place insert as [[KmvAggregator]]; only `finish`
  * differs (the full kept set instead of its max).
  */
class KmvSetAggregator(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val kmv = new KmvAggregator(k)
  override def zero: Array[Long] = kmv.zero
  override def reduce(b: Array[Long], h: Long): Array[Long] = kmv.reduce(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = kmv.merge(a, b)
  override def finish(b: Array[Long]): Seq[Long] = {
    val fill = if (b.length == 0) 0 else b(0).toInt
    (1 to fill).map(b(_))
  }
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
