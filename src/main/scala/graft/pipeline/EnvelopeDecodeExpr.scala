package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `envelope_decode(binary)` → Envelope struct; null on a malformed
  * record (the reference counts + logs and continues scanning,
  * `main.go:358-360` — dead-lettering is a `filter(isnull)` away).
  *
  * Native expression with codegen so decode fuses into the same
  * WholeStageCodegen stage as the downstream type filter — the
  * record-at-a-time fusion the reference gets by hand (SURVEY.md §3.1).
  */
case class EnvelopeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"envelope_decode requires binary input, got ${child.dataType}")

  override def dataType: DataType = Envelope.schema
  override def nullable: Boolean = true
  override def prettyName: String = "envelope_decode"

  override def nullSafeEval(input: Any): Any =
    EnvelopeDecode.decodeToRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = EnvelopeDecode.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.MODULE$$.decodeToRow($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EnvelopeDecode =
    copy(child = newChild)
}

object EnvelopeDecode {

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** null on malformed input. */
  def decodeToRow(bytes: Array[Byte]): InternalRow = {
    val e =
      try EnvelopeCodec.decode(bytes)
      catch { case _: EnvelopeCodec.MalformedEnvelopeException => return null }
    val tagKeys = new Array[Any](e.tags.size)
    val tagVals = new Array[Any](e.tags.size)
    var i = 0
    e.tags.foreach { case (k, v) => tagKeys(i) = utf8(k); tagVals(i) = utf8(v); i += 1 }
    val lmRow: Any = e.log_message match {
      case Some(lm) => new GenericInternalRow(Array[Any](
        utf8(lm.message), utf8(lm.message_type), lm.timestamp,
        utf8(lm.app_id), utf8(lm.source_type), utf8(lm.source_instance)))
      case None => null
    }
    new GenericInternalRow(Array[Any](
      utf8(e.origin), utf8(e.event_type), e.timestamp,
      utf8(e.deployment), utf8(e.job), utf8(e.index), utf8(e.ip),
      new ArrayBasedMapData(new GenericArrayData(tagKeys), new GenericArrayData(tagVals)),
      lmRow))
  }
}
