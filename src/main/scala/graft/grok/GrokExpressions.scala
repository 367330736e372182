package graft.grok

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for grok extraction.
  *
  * All three are native `Expression`s with `doGenCode` (not UDFs) so
  * they stay inside WholeStageCodegen and are no optimization barrier:
  * Catalyst can still reorder cheap filters ahead of them (the
  * reference's hand-written predicate-before-parse ordering,
  * SURVEY.md §4). The pattern is compiled once at plan time
  * (`@transient lazy val`), never per row.
  */

/** Shared string-input type check (AbstractDataType — the
  * ExpectsInputTypes route — is private[sql], so the check is spelled
  * once here instead of per expression).
  */
private[graft] trait RequiresStringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
}

/** `grok_extract(text, 'PATTERN')` → typed struct of captures;
  * null when the pattern does not match (grok.Parse returns an empty
  * map, `/root/reference/vendor/github.com/vjeantet/grok/grok.go:201-215`).
  *
  * @param wanted when set (by [[graft.plans.PruneGrokCaptures]]), emit
  *   only these captures — same regex, fewer group extractions and a
  *   narrower row (the engine's own column pruning, mirroring
  *   `NamedCapturesOnly`, grok.go:342-352)
  */
case class GrokExtract(child: Expression, grokPattern: String,
                       wanted: Option[Seq[String]] = None)
    extends UnaryExpression with RequiresStringInput {

  @transient private lazy val compiled: CompiledGrok = {
    val full = GrokLibrary.default.compile(grokPattern)
    wanted.map(full.project).getOrElse(full)
  }

  override def dataType: DataType = compiled.schema
  override def nullable: Boolean = true
  override def prettyName: String = "grok_extract"

  override def nullSafeEval(input: Any): Any =
    compiled.evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grok", compiled, classOf[CompiledGrok].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $g.evalRow($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): GrokExtract =
    copy(child = newChild)
}

/** `grok_extract_map(text, 'PATTERN')` → map<string,string> of raw
  * captures — the dynamic-schema shape of grok.Parse. Empty map on no
  * match, never null (for non-null input).
  */
case class GrokExtractMap(child: Expression, grokPattern: String)
    extends UnaryExpression with RequiresStringInput {

  @transient private lazy val compiled: CompiledGrok =
    GrokLibrary.default.compile(grokPattern)

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "grok_extract_map"

  override def nullSafeEval(input: Any): Any =
    compiled.evalMap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grok", compiled, classOf[CompiledGrok].getName)
    defineCodeGen(ctx, ev, c => s"$g.evalMap($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GrokExtractMap =
    copy(child = newChild)
}

/** `grok_match(text, 'PATTERN')` → boolean (grok.Match, grok.go:186-198). */
case class GrokMatch(child: Expression, grokPattern: String)
    extends UnaryExpression with RequiresStringInput {

  @transient private lazy val compiled: CompiledGrok =
    GrokLibrary.default.compile(grokPattern)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "grok_match"

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(compiled.matches(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grok", compiled, classOf[CompiledGrok].getName)
    defineCodeGen(ctx, ev, c => s"$g.matches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GrokMatch =
    copy(child = newChild)
}
