package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * low-cardinality dimension buckets into one sort key so that sorting
  * by the key co-locates rows that are close in EVERY dimension at
  * once. Files written from a z-sorted corpus carry tight min/max
  * ranges on each dimension, which is what makes multi-column
  * predicate pruning work on a 100 TB table: a filter on any single
  * dimension skips most files, not just a filter on the leading sort
  * column.
  *
  * The z-value is pure integer bit math built from `shiftright`/
  * `shiftleft`/`&`/`|` — whole-stage-codegen'd, no UDF, and
  * engine-portable (the DuckDB oracle generates the identical
  * expression from the same loop).
  */
object ZOrder {

  /** Morton code of `dims` (integral columns, each using the low
    * `bits` bits): dimension `d`'s bit `b` lands at interleaved
    * position `b * dims.size + d`. Total width must fit a signed long.
    *
    * Each dimension is masked to its declared width FIRST — an
    * out-of-range value (in particular a negative one, whose sign bits
    * would otherwise interleave into the key and corrupt the min/max
    * pruning envelopes) contributes only its low `bits` bits,
    * deterministically and identically in both engine twins. Callers
    * that need out-of-range inputs to fail loudly should validate
    * upstream; the layout key itself is total and portable.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits > 0 && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits does not fit a signed long")
    val mask = (1L << bits) - 1
    val terms = for {
      b <- 0 until bits
      (dim, d) <- dims.zipWithIndex
      masked = dim.bitwiseAND(lit(mask))
    } yield shiftleft(shiftright(masked, b).bitwiseAND(lit(1L)), b * dims.size + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same Morton code as ANSI-SQL text over column names — the
    * oracle twin of [[zValue]], generated from the identical loop so
    * the two engines compute the same key bit-for-bit (including the
    * width mask).
    */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val mask = (1L << bits) - 1
    val terms = for {
      b <- 0 until bits
      (dim, d) <- dims.zipWithIndex
    } yield s"(((($dim & $mask) >> $b) & 1) << ${b * dims.size + d})"
    terms.mkString("(", " | ", ")")
  }

  /** Physically lay out `df` into `numFiles` z-ordered ranges:
    * range-partition on the z-value, sort within each partition, and
    * keep the key as `__z` (callers drop it after writing). This is
    * the operator a table-maintenance job runs before writing parquet;
    * `repartitionByRange` samples range boundaries, so file ASSIGNMENT
    * is not cross-engine deterministic — the oracle-checked audit
    * (q47) uses rank-exact `ntile` instead, and this method is
    * spec-verified (partition count, intra-partition sortedness,
    * disjoint z ranges).
    */
  def layout(df: DataFrame, dims: Seq[Column], bits: Int, numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
}
