package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Length, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.text.DamerauLevenshtein

/** Length-band prefilter for edit-distance predicates (a
  * `Rule[LogicalPlan]`, the engine's second piece of custom Catalyst
  * optimizer work after [[PruneGrokCaptures]]).
  *
  * Every edit operation changes a string's length by at most one, so
  * `dist(a, b) ≤ k ⇒ |len(a) − len(b)| ≤ k` — for Levenshtein AND the
  * full Damerau–Levenshtein (a transposition changes length by 0).
  * The rule rewrites `dist(a,b) ≤ k` (k a foldable bound) inside
  * Filter and Join conditions into
  * `|len(a) − len(b)| ≤ k AND dist(a,b) ≤ k`: codegen's `And`
  * short-circuits, so the O(|a|·|b|) dynamic program runs only for
  * pairs that survive two length reads — on a blocked ER verify most
  * candidates differ in length by more than the budget and never pay
  * the DP.
  *
  * Soundness: `p ⇒ g` makes `g ∧ p ≡ p` as a three-valued boolean —
  * in EVERY context, including under NOT (when either input is null
  * both sides are null; otherwise both are defined and equal) — so
  * the rewrite is an equivalence, not a filter-only strengthening.
  * The guard itself cannot overflow (lengths are non-negative ints).
  *
  * Idempotence (the rule runs in a fixed-point batch): a predicate
  * already shaped `guard AND dist-cmp` with the exact guard this rule
  * would generate is left untouched.
  *
  * Levenshtein's 3-arg threshold form is deliberately skipped: its
  * `-1` sentinel already encodes a bound and compares against the
  * sentinel would be caller semantics, not ours to strengthen.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val g = addGuards(cond)
      if (g.fastEquals(cond)) f else f.copy(condition = g)
    case j: Join if j.condition.isDefined =>
      val g = addGuards(j.condition.get)
      if (g.fastEquals(j.condition.get)) j else j.copy(condition = Some(g))
  }

  /** (a, b) of a supported edit-distance call. */
  private def distArgs(e: Expression): Option[(Expression, Expression)] = e match {
    case DamerauLevenshtein(a, b) => Some((a, b))
    case Levenshtein(a, b, None) => Some((a, b))
    case _ => None
  }

  private def boundOf(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(v.toInt)
    case _ => None
  }

  private def lenBand(a: Expression, b: Expression): Expression =
    Abs(Subtract(Length(a), Length(b)))

  /** The guard for a supported comparison node, if it qualifies. */
  private def guardFor(cmp: Expression): Option[Expression] = cmp match {
    case LessThanOrEqual(d, lit) =>
      for ((a, b) <- distArgs(d); k <- boundOf(lit); if k >= 0)
        yield LessThanOrEqual(lenBand(a, b), Literal(k))
    case LessThan(d, lit) =>
      for ((a, b) <- distArgs(d); k <- boundOf(lit); if k >= 1)
        yield LessThan(lenBand(a, b), Literal(k))
    case GreaterThanOrEqual(lit, d) =>
      for ((a, b) <- distArgs(d); k <- boundOf(lit); if k >= 0)
        yield LessThanOrEqual(lenBand(a, b), Literal(k))
    case GreaterThan(lit, d) =>
      for ((a, b) <- distArgs(d); k <- boundOf(lit); if k >= 1)
        yield LessThan(lenBand(a, b), Literal(k))
    case _ => None
  }

  private def addGuards(e: Expression): Expression = e match {
    case And(g, p) if guardFor(p).exists(_.semanticEquals(g)) =>
      e // already guarded by a previous fixed-point iteration
    case cmp =>
      guardFor(cmp) match {
        case Some(g) => And(g, cmp)
        case None => cmp.mapChildren(addGuards)
      }
  }
}
