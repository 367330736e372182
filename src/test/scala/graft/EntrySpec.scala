package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("flagship entry: full pipeline end-to-end, rows > 0, enriched") {
    val df = SparkEntry.entry(spark).cache()
    val n = df.count()
    assert(n > 0)
    // error-typed envelopes become ValueMetric and must be filtered out
    val evTotal = Tables(spark, "/root/testdata/sf0.001", "events").count()
    assert(n < evTotal)
    // enrichment resolved at least some org names via the dim chain
    assert(df.filter(org.apache.spark.sql.functions.col("`@cf.org`") =!= "").count() > 0)
    df.unpersist()
  }

  test("every declared query has an oracle and runs at sf0.001") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"query $name returned no rows")
    }
  }
}
