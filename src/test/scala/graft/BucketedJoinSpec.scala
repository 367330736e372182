package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins (SURVEY §7.4-5 / the 100 TB
  * playbook): two tables bucketed+sorted on the join key join with
  * ZERO shuffle — the physical plan has no Exchange at all. At real
  * scale this is how repeated fact-fact joins amortize their shuffle:
  * pay it once at write time.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("bucketed+sorted tables sort-merge join with no Exchange") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables(spark, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables(spark, dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val bl = spark.table("b_lineitem")
      val bo = spark.table("b_orders")
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
      val n = joined.collect().length // execute joined's own QueryExecution
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should be shuffle-free:\n$plan")

      // sanity: the same join WITHOUT bucketing does shuffle
      val l = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      val unbucketed = l.join(o, l("l_orderkey") === o("o_orderkey"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
