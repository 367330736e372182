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

  /** Exact 1-D Wasserstein-1 (earth-mover) distance of `value`
    * between the `inA` and !`inA` samples — the INTEGRAL complement
    * of [[ksTest]]'s sup-norm: W₁ = ∫\|F_a − F_b\|dv, computed as
    * Σ over distinct values of \|cum_a·tot_b − cum_b·tot_a\|·Δv —
    * exact integers end-to-end (neither ECDF is ever a float). One
    * row (tot_a, tot_b, w1_num, w1_milli) with
    * w1_milli = ⌊1000·w1_num / (tot_a·tot_b)⌋. KS answers "is there
    * drift anywhere"; W₁ answers "how much mass moved how far" — the
    * magnitude a drift gate actually thresholds on.
    *
    * Scale: one conditional aggregation to the value domain; the
    * cumulative sums AND the value rank ride ONE
    * [[GlobalRank.withPrefixSums]] shuffle (rank = prefix sum of
    * ones); Δv comes from a rank self-join (co-partitioned integer
    * keys), NOT a global lead window. Exact while
    * tot_a·tot_b·range < 2⁶³.
    */
  def wasserstein1(df: DataFrame, value: Column, inA: Column): DataFrame =
    wasserstein1FromCounts(
      df.select(value.as("__v"), inA.as("__a"))
        .groupBy("__v")
        .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b")))

  /** The W₁ tail arithmetic over a PRE-AGGREGATED (__v, n_a, n_b)
    * count table — the face an incremental monitor feeds: per-value
    * counts fold over micro-batches (exact integers, O(domain) state),
    * and this derives the identical statistic the batch path computes
    * (`StreamingW1Spec` pins fold == rebuild).
    */
  def wasserstein1FromCounts(byV0: DataFrame): DataFrame = {
    val byV = byV0.withColumn("__one", lit(1L))
    val cum = graft.dedup.Dedup.materialize(
      GlobalRank.withPrefixSums(byV, Seq(col("__v")),
        Seq("n_a", "n_b", "__one"), Seq("cum_a", "cum_b", "rk")))
    val tot = cum.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    val nxt = cum.select((col("rk") - 1).as("rk"), col("__v").as("__vn"))
    val segSum = cum.join(nxt, "rk") // last value has no successor → no segment
      .crossJoin(broadcast(tot))
      .select((abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")) *
        (col("__vn") - col("__v"))).as("seg"))
      .agg(coalesce(sum("seg"), lit(0L)).as("w1_num"))
    tot.crossJoin(broadcast(segSum)) // one row even on a single-value domain
      .select(col("tot_a"), col("tot_b"), col("w1_num"),
        expr("w1_num * 1000 div (tot_a * tot_b)").as("w1_milli"))
  }

  /** Split-conformal calibration from PRE-AGGREGATED per-value count
    * tables `cal`/`test` of shape (q_micro, n) — the face an
    * incremental monitor feeds: counts fold over micro-batches (exact
    * integers, O(score domain) state), and the k-th-smallest
    * calibration value is a pure function of the counts (ties don't
    * move the VALUE at rank k), so this derives the identical row the
    * rank-based batch query (q225) computes — cross-implementation
    * equality pinned by `StreamingConformalSpec`.
    *
    * Scale: one [[GlobalRank.withPrefixSums]] over the value domain
    * (no single-partition window), threshold + totals broadcast.
    */
  def conformalFromCounts(cal: DataFrame, test: DataFrame,
                          alpha: Long): DataFrame = {
    val cum = graft.dedup.Dedup.materialize(
      GlobalRank.withPrefixSums(cal, Seq(col("q_micro")), Seq("n"), Seq("cum")))
    val nCal = cum.agg(sum("n").as("n_cal"))
    val thr = cum.crossJoin(broadcast(nCal))
      .withColumn("k", expr(s"greatest(1, (n_cal + 1) div $alpha)"))
      .filter(col("cum") >= col("k") && col("cum") - col("n") < col("k"))
      .select(col("n_cal"), col("k"), col("q_micro").as("thr_micro"))
    test.crossJoin(broadcast(thr))
      .agg(first("n_cal").as("n_cal"), first("k").as("k"),
        first("thr_micro").as("thr_micro"),
        sum("n").as("n_test"),
        sum(when(col("q_micro") >= col("thr_micro"), col("n")).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), col("k"), col("thr_micro"), col("n_test"),
        col("n_covered"), expr("n_covered * 10000 div n_test").as("coverage_bp"))
  }

  /** Pearson chi-squared independence test between two categorical
    * columns, per contingency cell (ZERO-observed cells included —
    * omitting them understates the statistic): one row per (r, c)
    * with the observed count, row/column totals, the standardized
    * residual (O − E)/√E — computed as the algebraically identical
    * (O·n − rt·ct)/√(n·rt·ct), so both engines divide the SAME exact
    * integers and land on bit-identical doubles — and the cell's
    * chi-squared term in exact micro-units (each term's identical
    * double rounds to an integer; the total is then an ORDER-FREE
    * integer sum, immune to float-summation-order drift).
    *
    * Scale: one aggregation to the (r × c) category domain (map-side
    * combine — the shuffle is category-sized, never corpus-sized);
    * the margins are two key-sized aggregates broadcast onto the
    * dense cell grid. Exact while n·rt·ct < 2⁶³ as integers; shard
    * (or lift to decimal) beyond ~10⁶ per-margin × 10⁹-row corpora.
    */
  def chiSquareCells(df: DataFrame, rowCat: Column, colCat: Column): DataFrame = {
    val cells = df.select(rowCat.as("r"), colCat.as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("obs"))
    val rt = cells.groupBy("r").agg(sum("obs").as("rt"))
    val ct = cells.groupBy("c").agg(sum("obs").as("ct"))
    val n = cells.agg(sum("obs").as("n"))
    rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
      .join(cells, Seq("r", "c"), "left_outer")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("num", col("obs") * col("n") - col("rt") * col("ct"))
      .withColumn("den", col("n") * col("rt") * col("ct"))
      .select(col("r"), col("c"), col("obs"), col("rt"), col("ct"),
        round(col("num").cast("double") / sqrt(col("den").cast("double")), 6)
          .as("resid"),
        round(col("num").cast("double") * col("num").cast("double") *
          lit(1000000.0) / col("den").cast("double"), 0)
          .cast("long").as("term_micro"))
  }
}
