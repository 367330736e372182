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
