package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.EditDistancePrefilter

/** The length-band prefilter rule ([[EditDistancePrefilter]]):
  * `dist(a,b) ≤ k` predicates gain a short-circuiting
  * `|len(a)−len(b)| ≤ k` guard — pinned in the optimized plan for
  * Filter and Join, for both `damerau_levenshtein` and the built-in
  * `levenshtein`; fixed-point idempotent; threshold-form levenshtein
  * untouched; and the rewrite changes no results (q292's oracle
  * already proves that corpus-wide — here a doctored frame where the
  * guard actually prunes is checked row-for-row).
  */
class EditDistancePrefilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  // spark.range + non-foldable derivations: a Seq(...).toDF would
  // constant-fold through ConvertToLocalRelation and leave no Filter
  // for the rule to rewrite (the skill-notes trap)
  private def names: DataFrame =
    spark.range(5).select(
      element_at(array(lit("a"), lit("abcdef"), lit("ab"),
        lit("short"), lit("same")), (col("id") + 1).cast("int")).as("x"),
      element_at(array(lit("abcdef"), lit("abcfed"), lit("ba"),
        lit("muchlongerstring"), lit("same")), (col("id") + 1).cast("int")).as("y"))

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("filter on damerau_levenshtein <= k gains the length-band guard") {
    val p = optimized(names.filter(
      graft.functions.damerau_levenshtein(col("x"), col("y")) <= 2))
    assert(p.contains("abs((length(") && p.contains("damerau_levenshtein"),
      p)
  }

  test("built-in levenshtein <= k is guarded too; threshold form is not") {
    val p = optimized(names.filter(levenshtein(col("x"), col("y")) <= 2))
    assert(p.contains("abs((length("), p)
    val pt = optimized(names.filter(expr("levenshtein(x, y, 5) <= 2")))
    assert(!pt.contains("abs((length("), pt)
  }

  test("flipped orientations are guarded: k >= dist and k > dist") {
    val p1 = optimized(names.filter(
      lit(2) >= graft.functions.damerau_levenshtein(col("x"), col("y"))))
    assert(p1.contains("abs((length("), p1)
    val p2 = optimized(names.filter(
      lit(3) > graft.functions.damerau_levenshtein(col("x"), col("y"))))
    assert(p2.contains("abs((length("), p2)
  }

  test("join conditions are guarded") {
    val a = names.select(col("x"))
    val b = names.select(col("y"))
    val p = optimized(a.join(b,
      graft.functions.damerau_levenshtein(col("x"), col("y")) <= 1))
    assert(p.contains("abs((length("), p)
  }

  test("fixed-point idempotent: a second application is a no-op") {
    val plan = names.filter(
        graft.functions.damerau_levenshtein(col("x"), col("y")) <= 2)
      .queryExecution.optimizedPlan
    assert(EditDistancePrefilter(plan).fastEquals(plan))
  }

  test("guarded filter returns exactly the unguarded rows") {
    val got = names.filter(
        graft.functions.damerau_levenshtein(col("x"), col("y")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    // expected via the kernel, no plan involved
    val expected = names.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (x, y) =>
        graft.text.DamerauLevenshteinKernel.dl(
          org.apache.spark.unsafe.types.UTF8String.fromString(x),
          org.apache.spark.unsafe.types.UTF8String.fromString(y)) <= 2
      }.sorted
    assert(got.sameElements(expected), got.mkString(","))
  }
}
