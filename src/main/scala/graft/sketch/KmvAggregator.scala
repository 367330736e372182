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

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert into the sorted bounded set; no-op for duplicates and for
    * values above the current k-th minimum when full.
    */
  private def insert(b: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) b // already present (KMV is over DISTINCT hashes)
    else {
      val p = -i - 1
      if (b.length >= k && p >= k) b // larger than everything kept
      else {
        val out = new Array[Long](math.min(b.length + 1, k))
        System.arraycopy(b, 0, out, 0, p)
        out(p) = h
        System.arraycopy(b, p, out, p + 1, out.length - p - 1)
        out
      }
    }
  }

  override def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)
  override def finish(b: Array[Long]): KmvState =
    KmvState(if (b.isEmpty) 0L else b.last, b.length.toLong)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
}
