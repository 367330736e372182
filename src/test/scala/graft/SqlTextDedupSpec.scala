package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** q277_sql_dedup: the MinHash-LSH dedup chain exposed as ONE
  * Spark-SQL text (VERDICT r9 item 5). The text is generated from the
  * same hash constants as the Scala chain, so the two must be
  * row-IDENTICAL — this spec pins that parity (exact signatures, not
  * approximate overlap), plus the physical shape that makes the text
  * the same 100 TB plan as the operator it exposes.
  */
class SqlTextDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("SQL-text chain is row-identical to the Scala q21 chain") {
    val sql = rows(Queries.all("q277_sql_dedup")(spark, dir))
    val scala = rows(Queries.all("q21_dedup_minhash")(spark, dir))
    assert(sql.nonEmpty, "planted near-dups must surface")
    assert(sql == scala) // same pairs, same exact est_jaccard, same order
  }

  test("q277 and q21 share one oracle text verbatim") {
    assert(Queries.oracles("q277_sql_dedup") == Queries.oracles("q21_dedup_minhash"))
  }

  test("incremental SQL-text recipe is row-identical to the Scala q43 chain") {
    val sql = rows(Queries.all("q278_sql_dedup_incr")(spark, dir))
    val scala = rows(Queries.all("q43_dedup_incremental")(spark, dir))
    assert(sql.nonEmpty, "the 25% increment must contain near-dup pairs")
    assert(sql == scala)
    assert(Queries.oracles("q278_sql_dedup_incr") == Queries.oracles("q43_dedup_incremental"))
  }

  test("table-function recipe at 8/16 is row-identical to q21; 16/16 pins the exact subset") {
    val tvf = rows(Queries.all("q280_sql_dedup_tvf")(spark, dir))
    val scala = rows(Queries.all("q21_dedup_minhash")(spark, dir))
    assert(tvf.nonEmpty && tvf == scala)
    assert(Queries.oracles("q280_sql_dedup_tvf") == Queries.oracles("q21_dedup_minhash"))
    // the PARAMETER does the work: at 16/16 only full-signature
    // agreement survives — exactly q277's rows with est_jaccard = 1.0
    val exact = rows(QueriesTraining.sqlDedupTvfCall(spark, dir, 16))
    val expected = rows(Queries.all("q277_sql_dedup")(spark, dir)).filter(_._3 == 1.0)
    assert(exact == expected)
    assert(exact.size < scala.size, "16/16 must be a strict subset on this fixture")
    // catalog hygiene: the temp function never outlives its query
    assert(!spark.catalog.functionExists("near_dup_pairs"))
  }

  test("table-function at 0/16 degenerates to the full LSH candidate set") {
    import org.apache.spark.sql.functions.col
    val all = rows(QueriesTraining.sqlDedupTvfCall(spark, dir, 0))
    val cands = graft.dedup.Dedup.lshCandidates(
        graft.dedup.Dedup.minhashSigTable(
          Tables(spark, dir, "documents"), "doc_id", "text", 16),
        "doc_id", "sig", 4, 4)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.map(p => (p._1, p._2)).toSet == cands,
      "threshold 0 must pass every banded collision through unfiltered")
    // 0/16 ⊇ 8/16 ⊋ 16/16: at sf0.001 every banded collision already
    // clears 8/16 (the bands are tuned for ~0.5), so the strict
    // pruning step this fixture exhibits is 16/16 (pinned in the test
    // above); here assert the superset direction only
    assert(all.size >= rows(Queries.all("q280_sql_dedup_tvf")(spark, dir)).size)
  }

  test("q278 plans the incremental shape: increment side broadcasts, corpus side never sorts") {
    val df = Queries.all("q278_sql_dedup_incr")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE prints both; count the final
    assert(p.contains("BroadcastHashJoin"),
      s"increment band rows must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("the text plans the bulk shape: SMJ candidate join, no BNLJ, fanned-out scan") {
    val df = Queries.all("q277_sql_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE prints both; pin the FINAL plan
    // MERGE-pinned band-key self-join (hash build side of corpus size
    // would OOM at scale; SMJ spills) and no nested-loop anywhere
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the REPARTITION(doc_id) hint materializes as a hash exchange so
    // the tokenize/shingle/md5 stage never runs on one local split
    assert(p.contains("REPARTITION_BY_COL") || p.contains("hashpartitioning(doc_id"))
    // the single-corpus-pass shape: both self-join sides canonicalize
    // to ONE band-key exchange, so the final plan REUSES it — the
    // signature chain is computed once per action (ScaleRehearsal's
    // `sql` mode re-checks this at the 100x corpus; the text has no
    // scale-varied parameters, so the planned shape is scale-stable)
    assert(p.contains("ReusedExchange"),
      s"self-join sides must reuse one exchange:\n$p")
  }
}
