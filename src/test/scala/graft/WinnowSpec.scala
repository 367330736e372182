package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing (q169): the two guarantees the MOSS selection rule is
  * chosen FOR, asserted on the exact expressions the query ships:
  *
  *  1. coverage — every window of w consecutive k-gram hashes
  *     contains at least one selected fingerprint position;
  *  2. detection — two documents sharing a substring of length
  *     ≥ k + w − 1 share at least one fingerprint HASH.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val k = QueriesTraining.WinnowK
  private val w = QueriesTraining.WinnowW

  private def winnowed(texts: Seq[String]) = {
    import spark.implicits._
    QueriesTraining.winnowSelect(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
          .repartition(4)) // defeat ConvertToLocalRelation constant folding
      .select("doc_id", "m", "nw", "hs", "sel")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[Long](4)))
      .sortBy(_._1)
  }

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog near the quiet river bank",
    "aaaaaaaaaaaaaaaaaaaaaaaa", // all-equal hashes: rightmost-tie rule
    "short", // shorter than k: single-gram fallback
    ("abcdefgh" * 6) + "xyz" // periodic text
  )

  test("every window of w consecutive grams holds a fingerprint") {
    for ((id, m, nw, _, sel) <- winnowed(fixtures)) {
      val s = sel.toSet
      for (j <- 1L to nw) {
        val width = math.min(w.toLong, m)
        assert((j until j + width).exists(s.contains),
          s"doc $id: window starting at $j (width $width) has no fingerprint in $s")
      }
    }
  }

  test("selected positions are in range, distinct, and each is its window's rightmost min") {
    for ((id, m, _, hs, sel) <- winnowed(fixtures)) {
      assert(sel.distinct.size == sel.size, s"doc $id: duplicate positions")
      assert(sel.forall(p => p >= 1 && p <= m), s"doc $id: position out of range")
      // all-equal-hash doc: rightmost-tie rule means consecutive
      // selections step by 1 at window ends, never the leftmost
      if (hs.distinct.size == 1 && m >= w)
        assert(sel.min == w.toLong, s"doc $id: tie rule picked a non-rightmost min")
    }
  }

  test("docs sharing a substring of length >= k+w-1 share a fingerprint hash") {
    val shared = "zqxjvkwpmbty_shared_run_0123456789" // length >= k+w-1
    assert(shared.length >= k + w - 1)
    val a = "left padding words before " + shared + " and unrelated tail alpha"
    val b = "totally different head material " + shared + " closing beta words"
    val rows = winnowed(Seq(a, b))
    val fpHashes = rows.map { case (_, _, _, hs, sel) =>
      sel.map(p => hs(p.toInt - 1)).toSet
    }
    assert(fpHashes(0).intersect(fpHashes(1)).nonEmpty,
      "no shared fingerprint despite a shared k+w-1 substring")
  }

  test("codegen kernel matches the HOF reference: positions AND hashes, fixtures + corpus") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(40).collect().map(_.getString(0)).toSeq
    val texts = fixtures ++ corpus
    val reference = winnowed(texts).map { case (id, _, _, hs, sel) =>
      id -> sel.map(p => (p, hs(p.toInt - 1)))
    }.toMap
    val kernel = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(4)
      .select(col("doc_id"), graft.functions.winnow_fps(lower(col("text"))).as("fps"))
      .select(col("doc_id"), expr("transform(fps, f -> f.pos)").as("ps"),
        expr("transform(fps, f -> f.hash)").as("hh"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Int](1).map(_.toLong).zip(r.getSeq[Long](2)))
      .toMap
    for (id <- reference.keys.toSeq.sorted)
      // reference sel is array_distinct (first-occurrence order) ==
      // kernel's nondecreasing selection order
      assert(kernel(id) == reference(id), s"doc $id kernel != HOF reference")
  }

  test("fingerprint density sits near the theoretical 2/(w+1)") {
    val text = ("the common crawl corpus holds many web documents with natural text. " * 20)
    val Seq((_, _, nw, _, sel)) = winnowed(Seq(text)).toSeq
    val density = sel.size.toDouble / nw
    assert(density > 1.0 / w && density < 3.0 / (w + 1),
      s"density $density outside (1/w, 3/(w+1))")
  }
}
