package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join via prefix filtering (the
  * AllPairs/PPJoin family) — the exact-completeness counterpart of the
  * LSH chain: [[Dedup.lshCandidates]] trades recall for speed; this
  * operator returns EVERY pair with Jaccard ≥ t, provably, without
  * the O(n²) comparison a naive exact join needs.
  *
  * Prefix-filter theorem: order each set's elements by a global total
  * order and keep only the first `|x| − ⌈t·|x|⌉ + 1` as the prefix;
  * any pair with J(A,B) ≥ t shares at least one PREFIX element (for a
  * qualifying pair, |A∩B| ≥ t·|A∪B| ≥ ⌈t·|x|⌉ for both sets, and two
  * sets whose common elements all sat outside one another's prefixes
  * would contradict the shared total order — the Bayardo et al.
  * all-pairs construction). Candidates = prefix-token equi-join;
  * verification computes the exact intersection on candidates only.
  *
  * The global order is (element document-frequency ascending,
  * md5(element)): rarest-first minimizes candidate collisions (the
  * frequent elements land OUTSIDE prefixes), and the md5 tiebreak is
  * engine-portable. The order affects only candidate COUNT, never the
  * result set — any total order is complete — so the oracle can be
  * the brute-force all-pairs join.
  *
  * The threshold is an integer ratio `tNum/tDen` and every comparison
  * is integer cross-multiplication — no float knife edges anywhere.
  *
  * Scale shape: the df aggregate and the prefix self-join shuffle
  * element keys only; the per-set rank window partitions by set id
  * (bounded by set size); the verify join fetches sets for CANDIDATE
  * pairs only, sort-merge (spills, no corpus-sized hash map). The
  * length filter (`tDen·min(n) ≥ tNum·max(n)`) prunes before any
  * array is touched. Everything is doc-id- or element-keyed — no
  * global ordering, no driver state.
  */
object AllPairs {

  /** All pairs with `|A∩B| / |A∪B| ≥ tNum/tDen` over
    * `sets(idCol, setCol: array<string>)` (elements must be distinct
    * per set, e.g. [[Dedup.shingleTable]]'s output). Returns
    * `(id_a, id_b, n_inter, n_union)`, `id_a < id_b`, all integral.
    */
  def similarPairs(sets: DataFrame, idCol: String, setCol: String,
                   tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a ratio in (0, 1]: got $tNum/$tDen")
    // prefix length |x| − ⌈t·|x|⌉ + 1, all-integer ceil
    val sized = sets
      .select(col(idCol).as("__id"), col(setCol).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      .withColumn("__p",
        expr(s"__n - ((CAST($tNum AS BIGINT) * __n + ${tDen - 1}) DIV $tDen) + 1"))
    // three consumers (element explode + both verify sides): one pass
    val m = Dedup.materialize(sized)

    val elems = m.select(col("__id"), col("__n"), col("__p"),
      explode(col("__set")).as("__e"))
    val dfreq = elems.groupBy("__e").agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy("__id").orderBy(col("__df"), md5(col("__e")))
    val prefix = elems.join(dfreq, "__e")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__p"))
      .select(col("__id"), col("__n"), col("__e"))

    val candA = prefix.select(col("__id").as("id_a"), col("__n").as("__na"), col("__e"))
    val candB = prefix.select(col("__id").as("id_b"), col("__n").as("__nb"), col("__e"))
    val cands = candA.join(candB, "__e")
      .filter(col("id_a") < col("id_b"))
      // length filter: J ≥ t forces tDen·min(|A|,|B|) ≥ tNum·max(|A|,|B|)
      .filter(col("__nb") * tDen >= col("__na") * tNum &&
        col("__na") * tDen >= col("__nb") * tNum)
      .select("id_a", "id_b").distinct()

    // MERGE-pinned verify joins, as in the LSH verify path: both set
    // sides canonicalize to the same materialized exchange
    val sa = m.select(col("__id").as("id_a"), col("__set").as("__sa"),
      col("__n").as("__na")).hint("MERGE")
    val sb = m.select(col("__id").as("id_b"), col("__set").as("__sb"),
      col("__n").as("__nb")).hint("MERGE")
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("n_inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("n_union", col("__na") + col("__nb") - col("n_inter"))
      .filter(col("n_inter") * tDen >= col("n_union") * tNum)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"))
  }
}
