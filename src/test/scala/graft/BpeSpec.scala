package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** Hand-computed oracles for the BPE trainer: merge selection,
  * frequency weighting, deterministic tie-break, and — the subtle one —
  * left-to-right NON-OVERLAPPING merge application.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("merge table on a hand-computed corpus (3 steps)") {
    // words: "aaab" ×2, "ab" ×1
    //   s0: aaab = §a§ §a§ §a§ §b§ (2), ab = §a§ §b§ (1)
    //   step 1: (a,a) = 2·2 = 4 beats (a,b) = 2+1 = 3 → §aa§
    //           aaab → §aa§ §a§ §b§ (left-to-right: first pair wins)
    //   step 2: (a,b) = 2+1 = 3 beats (aa,a) = 2 → §ab§
    //           aaab → §aa§ §ab§, ab → §ab§
    //   step 3: (aa,ab) = 2 → §aaab§
    val got = Bpe.train(docs("aaab aaab ab"), col("text"), merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "§a§ §a§", "§aa§", 4L),
      (2, "§a§ §b§", "§ab§", 3L),
      (3, "§aa§ §ab§", "§aaab§", 2L)))
  }

  test("merge application is left-to-right non-overlapping (aaaa)") {
    // "aaaa": (a,a) occurs 3× overlapping, counted 3; application
    // must give §aa§ §aa§ (not §aa§ §a§ §a§), so step 2's winner is
    // (aa,aa) with count 1 — wrong overlap handling would surface as
    // (aa,a) here.
    val got = Bpe.train(docs("aaaa"), col("text"), merges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "§a§ §a§", "§aa§", 3L),
      (2, "§aa§ §aa§", "§aaaa§", 1L)))
  }

  test("tie-break is pair-ascending and tokenization lowercases") {
    // "ba" ×2 and "Bc" ×2 → pairs (b,a) = 2 and (b,c) = 2 tie;
    // ascending pair string picks "§b§ §a§"
    val got = Bpe.train(docs("ba ba Bc bc"), col("text"), merges = 1)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(("§b§ §a§", 2L)))
  }

  test("apply: per-doc subword counts under the learned segmentation") {
    import spark.implicits._
    val d = Seq((0L, "aaab aaab ab")).toDF("doc_id", "text")
    // after 2 merges (see the 3-step test): aaab → §aa§ §ab§ (2
    // subwords), ab → §ab§ (1); doc = 3 words → 2+2+1 = 5 subwords
    val out = Bpe.tokenizedCounts(d, col("text"), merges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 3L, 5L)))
    // 3rd merge collapses aaab entirely: 1+1+1
    val out3 = Bpe.tokenizedCounts(d, col("text"), merges = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out3.toSeq == Seq((3L, 3L)))
  }

  test("exhausted vocabulary raises instead of short-tabling") {
    // single-char words only: no adjacent pair exists at step 1
    val e = intercept[IllegalStateException] {
      Bpe.train(docs("a b a"), col("text"), merges = 1)
    }
    assert(e.getMessage.contains("exhausted"))
  }
}
