package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

import graft.grok.GrokExtract

/** Capture pruning for `grok_extract` (SURVEY §4, custom Catalyst work
  * item 2): when a query only reads some fields of the extracted
  * struct (`g.rtr_status`), rewrite the expression to extract exactly
  * those captures. The regex still runs once, but the 22-capture
  * ROUTERACCESS row narrows to what the query references — fewer group
  * reads, less boxing, smaller rows downstream.
  *
  * Two shapes are handled:
  *  - post-CollapseProject: `GetStructField(GrokExtract(..), ord)`
  *    inline in one projection;
  *  - alias boundary: `Project [g.a, g.c] <- Project [grok(..) AS g]`
  *    (CollapseProject keeps these separate because the grok is
  *    non-cheap and referenced more than once).
  * A whole-struct reference anywhere disqualifies that instance.
  */
object PruneGrokCaptures extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case p: Project => pruneAcrossAlias(pruneInline(p))
    }

  // -- shape 1: GetStructField(GrokExtract, ord) within one projection

  private def pruneInline(p: Project): Project = {
    val wholeStruct = mutable.Set.empty[GrokExtract]
    val usedFields = mutable.Map.empty[GrokExtract, mutable.LinkedHashSet[String]]

    def visit(e: Expression): Unit = e match {
      case GetStructField(g: GrokExtract, ord, _) if g.wanted.isEmpty =>
        val name = g.dataType.asInstanceOf[StructType].fields(ord).name
        usedFields.getOrElseUpdate(g, mutable.LinkedHashSet.empty) += name
        visit(g.child)
      case g: GrokExtract => wholeStruct += g; g.children.foreach(visit)
      case other => other.children.foreach(visit)
    }
    p.projectList.foreach(visit)

    val prunable = usedFields.filter { case (g, names) =>
      !wholeStruct.contains(g) &&
        names.size < g.dataType.asInstanceOf[StructType].fields.length
    }
    if (prunable.isEmpty) p
    else {
      val replacement = prunable.map { case (g, names) =>
        g -> g.copy(wanted = Some(names.toSeq))
      }.toMap
      p.transformExpressionsUp {
        case GetStructField(g: GrokExtract, ord, _) if replacement.contains(g) =>
          val pruned = replacement(g)
          val name = g.dataType.asInstanceOf[StructType].fields(ord).name
          val newOrd = pruned.dataType.asInstanceOf[StructType].fieldIndex(name)
          GetStructField(pruned, newOrd, Some(name))
      }.asInstanceOf[Project]
    }
  }

  // -- shape 2: Project [attr.a, ...] over Project [grok(..) AS attr]

  private def pruneAcrossAlias(p: Project): Project = p.child match {
    case inner: Project =>
      val grokAlias: Map[ExprId, GrokExtract] = inner.projectList.collect {
        case a @ Alias(g: GrokExtract, _) if g.wanted.isEmpty => a.exprId -> g
      }.toMap
      if (grokAlias.isEmpty) return p

      val whole = mutable.Set.empty[ExprId]
      val used = mutable.Map.empty[ExprId, mutable.LinkedHashSet[String]]
      def visit(e: Expression): Unit = e match {
        case GetStructField(ar: AttributeReference, ord, _) if grokAlias.contains(ar.exprId) =>
          val name = ar.dataType.asInstanceOf[StructType].fields(ord).name
          used.getOrElseUpdate(ar.exprId, mutable.LinkedHashSet.empty) += name
        case ar: AttributeReference if grokAlias.contains(ar.exprId) => whole += ar.exprId
        case other => other.children.foreach(visit)
      }
      p.projectList.foreach(visit)

      val prunable = used.filter { case (id, names) =>
        !whole.contains(id) &&
          names.size < grokAlias(id).dataType.asInstanceOf[StructType].fields.length
      }
      if (prunable.isEmpty) return p

      val prunedGrok: Map[ExprId, GrokExtract] = prunable.map { case (id, names) =>
        id -> grokAlias(id).copy(wanted = Some(names.toSeq))
      }.toMap
      val newInnerList: Seq[NamedExpression] = inner.projectList.map {
        case a @ Alias(_: GrokExtract, name) if prunedGrok.contains(a.exprId) =>
          Alias(prunedGrok(a.exprId), name)(exprId = a.exprId,
            qualifier = a.qualifier, explicitMetadata = a.explicitMetadata)
        case x => x
      }
      val newOuterList = p.projectList.map(_.transformUp {
        case GetStructField(ar: AttributeReference, ord, _) if prunedGrok.contains(ar.exprId) =>
          val name = ar.dataType.asInstanceOf[StructType].fields(ord).name
          val newType = prunedGrok(ar.exprId).dataType.asInstanceOf[StructType]
          val newAttr = AttributeReference(ar.name, newType, ar.nullable, ar.metadata)(
            exprId = ar.exprId, qualifier = ar.qualifier)
          GetStructField(newAttr, newType.fieldIndex(name), Some(name))
      }.asInstanceOf[NamedExpression])
      Project(newOuterList, Project(newInnerList, inner.child))
    case _ => p
  }
}

/** Session extension wiring (`spark.sql.extensions=graft.plans.
  * GraftExtensions`): the engine's optimizer rule on every session
  * built with the config — the deployment path for a shared cluster
  * where code can't call per-session registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PruneGrokCaptures)
    ext.injectOptimizerRule(_ => EditDistancePrefilter)
  }
}
