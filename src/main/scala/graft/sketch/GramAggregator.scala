package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable second-moment (Gram) sketch over an embedding column —
  * the one-pass building block for covariance / correlation / PCA
  * prep at corpus scale: a single typed aggregation whose buffer is
  * the count, the per-dimension sums, and the upper-triangular
  * element products, all in EXACT fixed-point integers so two engines
  * (or two clusters) reduce to bit-identical statistics regardless of
  * partitioning or merge order.
  *
  * Buffer layout (`Array[Long]`, length 1 + d + d(d+1)/2):
  * `[0]` = row count; `[1..d]` = Σ qᵢ; then the i ≤ j triangle of
  * Σ qᵢqⱼ in row-major order, where qᵢ = ⌊vᵢ · scale⌋ (floor, not
  * round — floor of identical doubles is unambiguous across engines,
  * the same recipe as q54's int8 quantizer).
  *
  * Scale shape: O(d²) state per GROUP, O(d²) work per row, map-side
  * partial aggregation combines partitions before the (single-key)
  * shuffle — the exchange carries ~32 buffers of d(d+3)/2 longs, not
  * the corpus. This is the Summarizer/treeAggregate shape expressed
  * as a plain `groupBy().agg`, so it composes with any grouping.
  *
  * Overflow contract (the 100 TB knob): each product term is ≤ scale²
  * for unit-bounded embeddings, so Σ over n rows needs
  * n · scale² < 2⁶³. The caller derives `scale` from corpus size the
  * way ScaleParams derives band/list counts — scale 10⁶ holds to
  * ~9 × 10⁶ rows per group, 10⁴ to ~9 × 10¹⁰; correlation output is
  * scale-invariant, so shrinking the scale trades only fixed-point
  * resolution, never semantics.
  */
class GramAggregator(d: Int, scale: Double)
    extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
  require(d > 0, s"d must be positive, got $d")
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b0: Array[Long], v: Seq[Float]): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](len) else b0
    require(v.length == d, s"expected $d dims, got ${v.length}")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) { q(i) = math.floor(v(i).toDouble * scale).toLong; i += 1 }
    b(0) += 1L
    var k = 1 + d
    i = 0
    while (i < d) {
      b(1 + i) += q(i)
      var j = i
      while (j < d) { b(k) += q(i) * q(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  override def merge(a0: Array[Long], b0: Array[Long]): Array[Long] = {
    if (b0.length == 0) a0
    else if (a0.length == 0) b0
    else {
      var i = 0
      while (i < len) { a0(i) += b0(i); i += 1 }
      a0
    }
  }

  override def finish(b: Array[Long]): Array[Long] =
    if (b.length == 0) new Array[Long](len) else b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object GramAggregator {
  /** 1-based `element_at` position of Σ qᵢqⱼ (0-based i ≤ j) in the
    * finished buffer.
    */
  def prodPos(d: Int, i: Int, j: Int): Int = {
    require(0 <= i && i <= j && j < d)
    1 + d + (i * (2 * d - i + 1)) / 2 + (j - i) + 1
  }

  /** 1-based `element_at` position of Σ qᵢ. */
  def sumPos(i: Int): Int = 1 + i + 1
}
