package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{AllPairs, Dedup}

/** Exact all-pairs similarity join: completeness vs brute force (the
  * prefix filter must lose NOTHING), threshold edge cases in integer
  * space, and the plan shape that makes it scale.
  */
class AllPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def brute(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      if inter * tDen >= union * tNum
    } yield (ia, ib, inter.toLong, union.toLong)).sorted

  test("prefix-filtered result equals brute force on adversarial random sets") {
    import spark.implicits._
    // seeded generator: skewed element frequencies (some near-universal
    // elements, a long unique tail) — the regime where prefix ordering
    // matters most; sizes 1..12 include singleton sets (prefix must
    // stay >= 1) and near-duplicates (planted pairs)
    val rnd = new scala.util.Random(20260813L)
    val base = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(12)
      val elems = (0 until n).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 30) s"common${rnd.nextInt(3)}"          // hot elements
        else if (r < 60) s"mid${rnd.nextInt(15)}"
        else s"rare${rnd.nextInt(500)}"
      }.distinct
      (i, elems)
    }
    // planted near-dups: copy with one element changed
    val planted = base.take(8).map { case (i, es) =>
      (i + 1000L, if (es.size > 1) es.tail :+ s"swap$i" else es)
    }
    val sets = base ++ planted
    for ((tNum, tDen) <- Seq((1, 2), (3, 10), (4, 5), (1, 1))) {
      val df = sets.toDF("id", "s")
      val got = AllPairs.similarPairs(df, "id", "s", tNum, tDen)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === brute(sets, tNum, tDen), s"mismatch at t=$tNum/$tDen")
    }
  }

  test("t=1 finds exactly the identical sets; disjoint corpus finds none") {
    import spark.implicits._
    val sets = Seq(
      (1L, Seq("a", "b")), (2L, Seq("b", "a")), // same set, different order
      (3L, Seq("a", "b", "c")), (4L, Seq("x")))
    val eq = AllPairs.similarPairs(sets.toDF("id", "s"), "id", "s", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(eq === Seq((1L, 2L)))
    val disjoint = (1L to 10L).map(i => (i, Seq(s"only$i")))
    assert(AllPairs.similarPairs(disjoint.toDF("id", "s"), "id", "s", 1, 2).count() === 0L)
  }

  test("scale boundary: high-df corpus past maxCandidates refuses with the LSH path named") {
    import spark.implicits._
    // synthetic worst case: every set is {hot} ∪ {unique tail} at t=1/2 —
    // the shared element lands INSIDE every prefix (it's the set's only
    // repeated element but ties are df-ordered, and with 2-element sets
    // the prefix is ≥1 element either way), so prefix-df(hot) ≈ n and
    // the candidate bound is ~n²/2
    val n = 200
    val sets = (1L to n.toLong).map(i => (i, Seq("hot", s"u$i")))
    val df = sets.toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      AllPairs.similarPairs(df, "id", "s", 1, 2, maxCandidates = 1000L)
    }
    assert(ex.getMessage.contains("lshCandidates"),
      s"refusal must name the scale-safe path: ${ex.getMessage}")
    assert(ex.getMessage.contains("maxCandidates"), ex.getMessage)
    // the same corpus RUNS with an explicit opt-in bound
    val ok = AllPairs.similarPairs(df, "id", "s", 1, 2, maxCandidates = 100000L)
    assert(ok.count() === 0L) // J(A,B)=1/3 < 1/2 for every pair
    // and the default bound admits the battery's real corpora (q91's
    // own input at sf0.001) without tripping
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull)
    val sh = Dedup.shingleTable(docs, "doc_id", "text")
    AllPairs.similarPairs(sh, "doc_id", "sh", 1, 2).count(): Unit
  }

  test("plan shape: candidate generation never compares non-prefix elements") {
    // the filter that makes this NOT O(n²): with a 1/2 threshold only
    // ~half of each set's elements (the rare half) enter the self-join.
    // The prefix branch is checkpointed inside similarPairs (one
    // derivation for guard + both join sides), so its shape is pinned
    // HERE, below the checkpoint, via the package-visible prefixTable.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull)
    val sh = Dedup.shingleTable(docs, "doc_id", "text")
    val sized = sh
      .select(col("doc_id").as("__id"), col("sh").as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      .withColumn("__p", expr("__n - ((CAST(1 AS BIGINT) * __n + 1) DIV 2) + 1"))
    // similarPairs checkpoints sized before deriving the prefix; match
    // that here so the branch under test has the same input lineage
    val pref = AllPairs.prefixTable(Dedup.materialize(sized), 1, 2)
    pref.collect()
    val pp = pref.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the rank filter gates the join input (__rk <= __p present)
    assert(pp.contains("__rk") && pp.contains("__p"),
      s"prefix rank filter missing from plan:\n$pp")
    // the per-set rank window is key-partitioned, never a global sort
    assert(pp.contains("hashpartitioning(__id"),
      s"prefix window must partition by set id:\n$pp")

    val out = AllPairs.similarPairs(sh, "doc_id", "sh", 1, 2)
    out.collect()
    val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // verify side sort-merges (spillable), not a corpus-sized hash build
    assert("SortMergeJoin".r.findAllIn(p).nonEmpty,
      s"verify join should sort-merge:\n$p")
    // the prefix branch feeds the join as a checkpointed scan — the
    // window/rank machinery must NOT be re-derived above the checkpoint
    assert(!p.contains("__rk"),
      s"prefix rank must be below the checkpoint, not re-derived:\n$p")
  }
}
