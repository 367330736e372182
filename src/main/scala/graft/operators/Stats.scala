package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics as reusable operators — exact
  * integer results, built on [[GlobalRank.withPrefixSums]] so no
  * global single-partition window ever appears. q166/q167 are these
  * operators applied to the battery tables; `StatsSpec` pins the
  * closed-form fixtures (perfect separation, identical samples, …).
  */
object Stats {

  /** Exact ROC-AUC of `score` against boolean `positive`, from integer
    * pair-concordance counts: one row
    * (n_pos, n_neg, concordant, tied, auc_bp) with
    * AUC = (concordant + ties/2) / (pos·neg) floored to basis points.
    *
    * Scale: aggregates per DISTINCT SCORE first — the shuffle is
    * score-domain-sized however big the input — then one exclusive
    * prefix sum + one scalar aggregate. Exact while
    * n_pos · n_neg < 2⁶³ (~3·10⁹ per class; shard the audit beyond).
    */
  def auc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val byScore = df
      .select(score.as("__s"), when(positive, 1L).otherwise(0L).as("__p"))
      .groupBy("__s")
      .agg(sum("__p").as("pos_s"), (count(lit(1)) - sum("__p")).as("neg_s"))
    GlobalRank.withPrefixSums(byScore, Seq(col("__s")),
        Seq("neg_s"), Seq("cum_neg"), inclusive = false)
      .agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"),
        sum(col("pos_s") * col("cum_neg")).as("concordant"),
        sum(col("pos_s") * col("neg_s")).as("tied"))
      .select(col("n_pos"), col("n_neg"), col("concordant"), col("tied"),
        expr("(2 * concordant + tied) * 10000 div (2 * n_pos * n_neg)")
          .as("auc_bp"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic of `value` between
    * the `inA` and !`inA` samples: one row
    * (tot_a, tot_b, at_value, d_num, ks_bp) where
    * d_num = max |cum_a·tot_b − cum_b·tot_a| over every distinct
    * value (the sup-norm numerator — neither ECDF is ever formed as a
    * float) and ties break to the smallest value. ks_bp floors
    * d_num / (tot_a·tot_b) to basis points.
    *
    * Scale: one conditional aggregation to the value domain (both
    * samples in one pass, map-side combine); both inclusive prefix
    * sums ride ONE withPrefixSums shuffle. Exact while
    * tot_a · tot_b < 2⁶³.
    */
  def ksTest(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val byV = df.select(value.as("__v"), inA.as("__a"))
      .groupBy("__v")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val cum = GlobalRank.withPrefixSums(byV, Seq(col("__v")),
      Seq("n_a", "n_b"), Seq("cum_a", "cum_b"))
    val tot = cum.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    cum.crossJoin(broadcast(tot))
      .withColumn("d_num",
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
      .agg(max(struct(col("d_num"), (-col("__v")).as("vneg"),
        col("tot_a"), col("tot_b"))).as("m"))
      .select(col("m.tot_a").as("tot_a"), col("m.tot_b").as("tot_b"),
        (-col("m.vneg")).as("at_value"), col("m.d_num").as("d_num"))
      .withColumn("ks_bp", expr("d_num * 10000 div (tot_a * tot_b)"))
      .select("tot_a", "tot_b", "at_value", "d_num", "ks_bp")
  }
}
