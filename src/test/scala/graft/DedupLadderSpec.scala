package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q266's rung classifier on planted pairs — the fixture's verified
  * near-dups are all 'near_only', so the exact / bag / prefix arms
  * (and the ladder's cheapest-first precedence) are pinned here.
  */
class DedupLadderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def digests(t: String): (String, String, Long) = {
    import java.security.MessageDigest
    def md5(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bag = t.trim.split("\\s+").sorted.mkString(" ")
    (md5(t), md5(bag), t.length.toLong)
  }

  test("rungs classify cheapest-first: exact beats bag beats prefix beats near") {
    import spark.implicits._
    val cases = Seq(
      // byte-identical → exact (even though bag/prefix also hold)
      ("alpha beta gamma", "alpha beta gamma", "exact"),
      // same tokens reordered → bag (prefix cannot hold: same length)
      ("alpha beta gamma", "gamma beta alpha", "bag"),
      // strict prefix, either direction
      ("alpha beta", "alpha beta gamma delta", "prefix"),
      ("alpha beta gamma delta", "alpha beta", "prefix"),
      // overlapping but neither exact/bag/prefix → near_only
      ("alpha beta gamma", "alpha beta gamba", "near_only"))
    val rows = cases.map { case (ta, tb, want) =>
      val (tma, bma, la) = digests(ta)
      val (tmb, bmb, lb) = digests(tb)
      (ta, tb, tma, tmb, bma, bmb, la, lb, want)
    }
    val df = rows.toDF("t_a", "t_b", "tm_a", "tm_b", "bm_a", "bm_b",
        "len_a", "len_b", "want")
      .withColumn("rung", QueriesTraining.dedupLadderRung)
    val bad = df.filter(col("rung") =!= col("want"))
      .select("t_a", "t_b", "rung", "want").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
