package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin

/** The salted-join rewrite: result-identical to the plain join, and the
  * hot key's rows really do spread across reducers.
  */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  private def skewed = spark.range(0, 10000).select(
    // 90% of rows share key 0
    when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
    col("id").as("rid"))

  private def dim = spark.range(0, 10000).select(
    col("id").as("k"), concat(lit("v"), col("id") % 5).as("label"))

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).groupBy("label")
      .agg(count(lit(1)).as("n"), sum("rid").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = SaltedJoin.salted(skewed, dim, Seq("k"), col("rid"), 8)
      .groupBy("label").agg(count(lit(1)).as("n"), sum("rid").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("outer rows survive: left join keeps unmatched big-side keys") {
    val missing = skewed.withColumn("k", col("k") + 100000L) // no dim match
    val out = SaltedJoin.salted(missing, dim, Seq("k"), col("rid"), 4, "left")
    assert(out.count() === 10000L)
    assert(out.filter(col("label").isNull).count() === 10000L)
  }

  test("right/full joins are rejected: replication would duplicate unmatched dim rows") {
    intercept[IllegalArgumentException] {
      SaltedJoin.salted(skewed, dim, Seq("k"), col("rid"), 8, "full")
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.salted(skewed, dim, Seq("k"), col("rid"), 8, "right_outer")
    }
  }

  test("hot key spreads over saltFactor shuffle partitions") {
    val joined = SaltedJoin.salted(skewed, dim, Seq("k"), col("rid"), 8)
      .filter(col("k") === 0L)
    // partition ids that actually carry hot-key rows, via spark_partition_id
    // on the join output BEFORE any later exchange
    val parts = joined.select(spark_partition_id().as("p")).distinct().count()
    assert(parts >= 4, s"hot key landed on only $parts partition(s)")
  }
}
