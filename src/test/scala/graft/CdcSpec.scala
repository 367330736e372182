package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.CdcChunker

/** Content-defined chunking: boundary locality and the shift-robust
  * dedup property fixed-width blocks (q45) lack.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  // deterministic pseudo-text: ASCII, no \s collapse concerns
  private def text(n: Int, seed: Int): String = {
    val sb = new StringBuilder
    var x = seed
    for (_ <- 0 until n) {
      x = (x * 48271) % 2147483647
      sb.append(('a' + (x % 26)).toChar)
    }
    sb.toString
  }

  private def md5Chunks(t: String): Seq[String] = {
    import spark.implicits._
    Seq(t).toDF("text")
      .select(explode(graft.functions.cdc_chunks(col("text"))).as("c"), col("text"))
      .selectExpr("md5(substring(text, c.start, c.len)) AS h")
      .as[String].collect().toSeq
  }

  test("chunks tile the document exactly: contiguous, full cover, 1-based") {
    import spark.implicits._
    for (n <- Seq(1, 5, CdcChunker.Window - 1, CdcChunker.Window, 400, 5000)) {
      val t = text(n, 7)
      val spans = Seq(t).toDF("text")
        .select(explode(graft.functions.cdc_chunks(col("text"))).as("c"))
        .select("c.start", "c.len").as[(Int, Int)].collect().sortBy(_._1)
      assert(spans.head._1 == 1)
      assert(spans.map(_._2).sum == n, s"cover mismatch at n=$n")
      spans.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1, s"gap at n=$n")
        case _ =>
      }
    }
  }

  test("short documents (< window) are a single whole-document chunk") {
    import spark.implicits._
    val spans = Seq("tiny").toDF("text")
      .select(explode(graft.functions.cdc_chunks(col("text"))).as("c"))
      .select("c.start", "c.len").as[(Int, Int)].collect()
    assert(spans.toSeq == Seq((1, 4)))
  }

  test("shift-robustness: a 7-char prefix insertion preserves almost all chunk hashes") {
    val base = text(8000, 13)
    val shifted = "PREFIX!" + base
    val a = md5Chunks(base)
    val b = md5Chunks(shifted).toSet
    // boundaries are local: only the chunks overlapping the first
    // post-insertion boundary can change; everything after re-aligns.
    val survived = a.count(b.contains)
    assert(a.size > 50, s"fixture too small: ${a.size} chunks")
    assert(survived >= a.size - 3,
      s"expected all but the head chunks to survive the shift: ${survived}/${a.size}")
    // the fixed-width control: q45-style 64-char blocks lose (nearly)
    // every block hash under the same 7-char shift
    def blocks(t: String) = t.grouped(64).toSeq
    val fixedSurvived = blocks(base).count(blocks(shifted).toSet.contains)
    assert(fixedSurvived <= 2,
      s"fixed blocks unexpectedly shift-robust: $fixedSurvived")
  }

  test("boundary rule matches the unrolled window polynomial (oracle twin)") {
    val t = text(300, 29)
    // direct O(n·W) recomputation of every window hash
    val expected = (CdcChunker.Window to t.length).filter { i =>
      val h = (0 until CdcChunker.Window).foldLeft(0L) { (acc, k) =>
        (acc + (t.charAt(i - CdcChunker.Window + k).toLong *
          CdcChunker.Coef(k))) % CdcChunker.Mod
      }
      h % CdcChunker.BoundaryMod == CdcChunker.BoundaryMod - 1
    }
    import spark.implicits._
    val ends = Seq(t).toDF("text")
      .select(explode(graft.functions.cdc_chunks(col("text"))).as("c"))
      .select("c.start", "c.len").as[(Int, Int)].collect().sortBy(_._1)
      .map { case (s, l) => s + l - 1 }.toSeq
    // every chunk end is a boundary, plus the trailing remainder chunk
    // ending at n when no boundary fell exactly there
    val want =
      if (expected.nonEmpty && expected.last == t.length) expected
      else expected :+ t.length
    assert(ends == want,
      "rolling kernel and unrolled polynomial disagree on boundaries")
  }
}
