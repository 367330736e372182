package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ScaleParams: the corpus-derived knob rules and their metadata-only
  * row-count source. The SQL twins are exercised by the oracle gate
  * (q24/q26/q29/q39/q47/q56 run them in DuckDB every Verify); here the
  * Scala side's ladder is pinned so a rule edit that would desync the
  * twins fails fast.
  */
class ScaleParamsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("footer row counts equal actual row counts on the fixtures") {
    for ((t, dir) <- Seq(
        "documents" -> "/root/testdata/sf0.001",
        "embeddings" -> "/root/testdata/sf0.01",
        "events" -> "/root/testdata/sf0.01")) {
      val meta = ScaleParams.tableRows(spark, dir, t)
      val real = spark.read.parquet(s"$dir/$t.parquet").count()
      assert(meta == real, s"$dir/$t: footer=$meta actual=$real")
    }
  }

  test("SRP planes reproduce the measured BASELINE §e ladder") {
    assert(ScaleParams.srpBandPlanes(5000) == 8)
    assert(ScaleParams.srpBandPlanes(50000) == 11)
    assert(ScaleParams.srpBandPlanes(500000) == 15)
    assert(ScaleParams.srpBandPlanes(1) == 1) // floor
  }

  test("IVF lists ~ sqrt(n), layout/shard counts scale with rows") {
    assert(ScaleParams.ivfLists(500) == 22)
    assert(ScaleParams.ivfLists(2000) == 45)
    assert(ScaleParams.ivfLists(1) == 4) // floor
    assert(ScaleParams.layoutFiles(10000) == 16) // r6-parity point
    assert(ScaleParams.shardCount(5000) == 16)   // r6-parity point
    assert(ScaleParams.packShards(500) == 1)
    assert(ScaleParams.lshPlanes(500) == 4)      // floor holds the fixture value
  }

  test("srpBandsFor: recall-derived band count is monotone and meets its own guarantee") {
    // fixture operating points: loose (q297) and tight (q299)
    assert(ScaleParams.srpBandsFor(5, 0.3, 9000L) == 30)
    assert(ScaleParams.srpBandsFor(5, 0.8, 9000L) == 7)
    // monotone in target recall: more recall -> never fewer bands
    val recalls = Seq(1000L, 5000L, 9000L, 9500L, 9900L)
    for (thr <- Seq(0.3, 0.5, 0.8, 0.9); b <- Seq(3, 5, 8, 11)) {
      val ladder = recalls.map(ScaleParams.srpBandsFor(b, thr, _))
      assert(ladder == ladder.sorted, s"thr=$thr b=$b: $ladder")
    }
    // monotone in threshold: looser threshold (weaker p*) -> never fewer bands
    for (r <- recalls; b <- Seq(3, 5, 8, 11)) {
      val ladder = Seq(0.9, 0.8, 0.5, 0.3).map(ScaleParams.srpBandsFor(b, _, r))
      assert(ladder == ladder.sorted, s"r=$r b=$b: $ladder")
    }
    // the returned L meets the guarantee and L-1 would not (tight ceil)
    for (thr <- Seq(0.3, 0.8); b <- Seq(5, 8); r <- Seq(9000L, 9900L)) {
      val pb = math.pow(ScaleParams.srpCollisionProb(thr), b)
      val l = ScaleParams.srpBandsFor(b, thr, r)
      val miss = 1.0 - r / 10000.0
      assert(math.pow(1.0 - pb, l) <= miss + 1e-12, s"thr=$thr b=$b r=$r L=$l")
      if (l > 1)
        assert(math.pow(1.0 - pb, l - 1) > miss, s"thr=$thr b=$b r=$r L=$l not minimal")
    }
    // cross-engine ceil safety: the ceil argument sits far from an
    // integer at every fixture operating point (libm divergence is
    // ~1e-15 relative; 1e-3 absolute distance is 12 orders of margin)
    for (thr <- Seq(0.3, 0.8); b <- Seq(5)) {
      val pb = math.pow(ScaleParams.srpCollisionProb(thr), b)
      val q = math.log(0.1) / math.log(1.0 - pb)
      assert(math.abs(q - math.rint(q)) > 1e-3, s"thr=$thr b=$b quotient $q on a knife edge")
    }
  }

  test("srpBandsFor refuses out-of-range recall targets loudly") {
    // ADVICE r14: 10000 bp computes ln(0) = -Inf whose ceil().toLong
    // wraps to -1 bands through .toInt — fail loudly instead
    for (bad <- Seq(10000L, 0L, -5L, 20000L)) {
      val ex = intercept[IllegalArgumentException](
        ScaleParams.srpBandsFor(5, 0.8, bad))
      assert(ex.getMessage.contains("recall"), ex.getMessage)
      intercept[IllegalArgumentException](ScaleParams.srpBandsForSql(0.8, bad))
    }
    // the open-interval boundary cases still work
    assert(ScaleParams.srpBandsFor(5, 0.8, 1L) >= 1)
    assert(ScaleParams.srpBandsFor(5, 0.8, 9999L) >= 1)
  }

  test("row counts are always fresh: an overwrite is seen, not served stale") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sp").toString
    Seq(1L, 2L, 3L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(ScaleParams.tableRows(spark, dir, "t") == 3L)
    Seq(1L, 2L, 3L, 4L, 5L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(ScaleParams.tableRows(spark, dir, "t") == 5L,
      "overwritten parquet must not serve the previous corpus's count")
  }
}
