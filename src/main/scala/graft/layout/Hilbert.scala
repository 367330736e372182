package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Hilbert-curve data layout: the locality-preserving sibling of
  * [[ZOrder]]. A Morton (Z) curve takes long diagonal jumps at every
  * power-of-two boundary, so a file of consecutive z-values can span a
  * wide min/max envelope on each dimension; the Hilbert curve visits
  * every cell of a 2^bits × 2^bits grid moving ONE step at a time, so
  * consecutive ranges tile compact squares and file-level min/max
  * pruning envelopes stay tight on BOTH dimensions — the reason
  * lakehouse table formats offer Hilbert clustering over Z-order for
  * multi-dimensional workloads.
  *
  * The index is the classic iterative xy→d walk (one quadrant
  * decision + rotation per bit level), a per-row O(bits) codegen
  * kernel; the oracle twin unrolls the same loop as a materialized
  * CTE chain so both engines compute identical integers.
  */
object Hilbert {

  /** Iterative kernel — referenced from generated code. Inputs are
    * masked to `bits` (out-of-range values contribute their low bits,
    * deterministically, matching [[ZOrder.zValue]]'s contract).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** `hilbert_d(x, y)` at a fixed bit width as a Column. */
  def hValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && 2 * bits <= 62, s"2 x $bits bits must fit a signed long")
    Bridge.column(HilbertD(Bridge.expression(x), Bridge.expression(y), bits))
  }

  /** The same walk as a DuckDB CTE chain: `srcCte` must expose
    * `idCols`, `$xCol`, `$yCol`; the returned text defines CTEs
    * `h0..h${bits}` where `h$bits` has (idCols, hd). Each level is
    * MATERIALIZED so the per-level state is computed once instead of
    * exponentially re-inlined.
    */
  def hValueCtesSql(srcCte: String, idCols: Seq[String], xCol: String,
                    yCol: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val ids = idCols.mkString(", ")
    val init = s"""h0 AS MATERIALIZED (SELECT $ids, ($xCol & $mask) AS hx,
                  |  ($yCol & $mask) AS hy, CAST(0 AS BIGINT) AS hd FROM $srcCte)""".stripMargin
    val levels = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val j = i + 1
      s"""r$j AS MATERIALIZED (SELECT $ids, hx, hy, hd,
         |  CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |  CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry FROM h$i),
         |h$j AS MATERIALIZED (SELECT $ids,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END)
         |       ELSE hx END AS hx,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END)
         |       ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * rx, ry) AS hd FROM r$j)""".stripMargin
    }
    (init +: levels).mkString(",\n")
  }
}

/** Codegen Hilbert index: a per-row O(bits) loop via the shared
  * [[Hilbert.xy2d]] kernel.
  */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  private def checkIntegral(dt: DataType, side: String): TypeCheckResult = dt match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hilbert_d $side must be integral, got $other")
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkIntegral(left.dataType, "x")
    if (l != TypeCheckResult.TypeCheckSuccess) l else checkIntegral(right.dataType, "y")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(bits, asLong(x), asLong(y))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.layout.Hilbert"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $kernel.xy2d($bits, (long) $x, (long) $y);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertD =
    copy(left = l, right = r)
}
