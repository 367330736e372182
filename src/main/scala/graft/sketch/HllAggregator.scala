package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed [[Aggregator]] — the
  * constant-memory companion to [[KmvAggregator]]: KMV keeps the k
  * smallest hashes (O(k) longs, exact below k), HLL keeps `m = 2^b`
  * 5-bit register maxima (fixed 2^b bytes of state no matter how
  * large the group), the shape that lets a 100 TB engine carry a
  * distinct-count per (high-cardinality) group key through map-side
  * partial aggregation when even KMV's k longs per group is too much.
  *
  * Determinism contract (what makes this ORACLE-checkable where most
  * HLL implementations aren't): the input is the battery's portable
  * 32-bit md5 hash ([[graft.dedup.Dedup.hash32]]), registers are
  * max-merged — max is commutative/associative/idempotent, so the
  * summary is IDENTICAL under any partitioning, merge order, or
  * duplication — and [[finish]] returns the integer
  * `K = Σ_j 2^(rhoMax − M_j)`, which determines the raw HLL estimate
  * `α_m · m² · 2^rhoMax / K` through one exact-rounded division.
  * Every term of K is a power of two in [1, 2^rhoMax] and there are m
  * of them, so K ≤ m·2^rhoMax (2^33 at b=8) fits a BIGINT exactly —
  * the SQL oracle reproduces K with integer shifts and hash-string
  * ops only; no float enters until the final division on both
  * engines.
  *
  * Register math (b index bits, w = 32−b value bits): for hash
  * `h ∈ [0, 2^32)`, register `j = h >> w`, remainder
  * `r = h & (2^w − 1)`, and `ρ = (w+1) − bitlen(r)` with the `r = 0`
  * convention `ρ = w+1` — equivalently the position of the first set
  * bit scanning from the top of the w-bit remainder, the Flajolet
  * et al. definition. `bitlen` is the binary-string length, which
  * both engines compute exactly in integer/string space.
  *
  * Like the sibling sketches, the buffer is a flat Long array mutated
  * in place (slot j = M_j), sized m only on first use so empty groups
  * cost nothing.
  */
class HllAggregator(b: Int) extends Aggregator[Long, Array[Long], Long] {
  require(b >= 4 && b <= 16, s"b must be in [4,16], got $b")

  private val m = 1 << b
  private val wBits = 32 - b
  private val rhoMax = wBits + 1
  private val wMask = (1L << wBits) - 1

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b0: Array[Long], h: Long): Array[Long] = {
    val buf = if (b0.length == 0) new Array[Long](m) else b0
    val j = (h >>> wBits).toInt
    val r = h & wMask
    val rho =
      if (r == 0L) rhoMax
      else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(r))
    if (rho > buf(j)) buf(j) = rho
    buf
  }

  override def merge(a: Array[Long], b0: Array[Long]): Array[Long] = {
    if (b0.length == 0) a
    else if (a.length == 0) b0
    else {
      var j = 0
      while (j < m) { if (b0(j) > a(j)) a(j) = b0(j); j += 1 }
      a
    }
  }

  /** `K = Σ_j 2^(rhoMax − M_j)` — the exact-integer carrier of the
    * harmonic mean `Σ 2^(−M_j) = K / 2^rhoMax`. Empty registers
    * contribute the full `2^rhoMax` (M_j = 0), including for a group
    * that saw no rows at all.
    */
  override def finish(buf: Array[Long]): Long = {
    if (buf.length == 0) m.toLong << rhoMax
    else {
      var k = 0L
      var j = 0
      while (j < m) { k += 1L << (rhoMax - buf(j)).toInt; j += 1 }
      k
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}

object HllAggregator {
  /** The raw-estimate constant `α_m · m² · 2^rhoMax` for `m = 2^b`,
    * evaluated with the exact literal arithmetic the SQL twin spells
    * out — both engines fold the same IEEE expression, so
    * `est = alphaNum(b) / K` is bit-identical across them.
    */
  def alphaNum(b: Int): Double = {
    val m = (1 << b).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, (32 - b + 1).toDouble)
  }

  /** SQL-text twin of [[alphaNum]] (DuckDB `**` is IEEE double pow). */
  def alphaNumSql(b: Int): String = {
    val m = 1 << b
    s"0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0 * (2.0 ** ${32 - b + 1})"
  }
}
