package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed [[Aggregator]] — the frequency twin of
  * [[KmvAggregator]] (distinct count) and [[HllAggregator]] (constant
  * memory distinct): `d` hash rows × `w` counters answer "how often
  * did key x occur" with one-sided error (`est ≥ exact`, over by at
  * most `εN` with probability `1−δ`, `w = e/ε`, `d = ln 1/δ`) from
  * `d·w` longs of state no matter how many rows or keys flowed
  * through. The buffer is LINEAR — merge is elementwise sum, so
  * map-side partial aggregation, any merge order, and incremental
  * maintenance (`cms(base ∪ Δ) = cms(base) + cms(Δ)`) are all exact
  * identities, which is what lets a 100 TB engine keep one tiny
  * frequency summary per stream partition and add them at read time.
  *
  * Determinism contract (what makes it oracle-checkable): the input
  * is the battery's portable 32-bit md5 hash
  * ([[graft.dedup.Dedup.hash32]]), and row `i`'s bucket is the exact
  * integer affine mix `((A(i)·h + B(i)) mod 2³¹−1) mod w` — products
  * stay below 2⁵³ so every step is exact in BIGINT on both engines;
  * the SQL twin reproduces the full counter table with a GROUP BY.
  *
  * Like the sibling sketches the buffer is mutated in place and
  * allocated on first use (empty groups cost nothing).
  */
class CmsAggregator(d: Int, w: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(d > 0 && d <= CmsAggregator.A.length, s"d in [1,${CmsAggregator.A.length}], got $d")
  require(w > 1, s"w must be > 1, got $w")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b0: Array[Long], h: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](d * w) else b0
    var i = 0
    while (i < d) {
      b(i * w + CmsAggregator.bucket(i, h, w)) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) a
    else if (a.length == 0) b
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  /** The flat counter table, row-major: slot `i·w + j` = row i,
    * bucket j. Returned whole (not just point estimates) because the
    * counters ARE the sketch — estimation, merging, and the oracle
    * comparison all read them.
    */
  override def finish(b: Array[Long]): Seq[Long] =
    if (b.length == 0) Seq.fill(d * w)(0L) else b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CmsAggregator {
  /** Pairwise-independent-style affine families, shared verbatim with
    * the SQL oracle (odd multipliers < 2²⁰ keep `A·h` < 2⁵² exact).
    */
  val A: Array[Long] = Array(293L, 1049L, 7919L, 104729L, 524287L)
  val B: Array[Long] = Array(1L, 97L, 769L, 12289L, 65537L)
  val M: Long = 2147483647L // 2^31 − 1

  def bucket(i: Int, h: Long, w: Int): Int =
    (((A(i) * h + B(i)) % M) % w).toInt

  /** SQL twin of [[bucket]] for literal row `i` over hash column
    * `h` — exact BIGINT arithmetic end to end.
    */
  def bucketSql(i: Int, h: String, w: Int): String =
    s"((${A(i)} * $h + ${B(i)}) % $M) % $w"
}
