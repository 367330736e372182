package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** GlobalRank: exact global rank / ntile without a single-partition
  * window — ranks must match the (scale-unsafe) global-window
  * reference on every input shape, including the ntile remainder
  * arithmetic's edge cases.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  // non-foldable, collision-heavy sort key across many partitions
  private def data(n: Long) = spark.range(0, n, 1, 8)
    .select((col("id") * 7919 % 97).as("k"), col("id"))

  private def collectRanks(n: Long): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
    val df = data(n)
    val twoPhase = GlobalRank.withRank(df, Seq(col("k"), col("id")))
      .select("k", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val reference = df.withColumn("rank",
        row_number().over(Window.orderBy("k", "id")).cast("long"))
      .select("k", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    (twoPhase, reference)
  }

  test("withRank equals the global-window row_number") {
    val (got, want) = collectRanks(1000)
    assert(got == want)
  }

  test("withNtile equals global ntile: remainder zero, remainder nonzero, n < k") {
    for ((n, k) <- Seq((1000L, 8), (1000L, 7), (5L, 16), (97L, 97))) {
      val df = data(n)
      val got = GlobalRank.withNtile(df, Seq(col("k"), col("id")), k, "t")
        .select("id", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy("k", "id")).cast("long"))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("empty input yields empty output") {
    val df = data(10).filter(col("id") < 0)
    assert(GlobalRank.withRank(df, Seq(col("id"))).count() === 0L)
    assert(GlobalRank.withNtile(df, Seq(col("id")), 4, "t").count() === 0L)
  }

  test("withPrefixMax equals the global exclusive running max (asc, desc, 512 parts)") {
    // value column deliberately NOT monotone in the sort key
    val df = data(1000).withColumn("v", (col("id") * 6007 % 389).cast("long"))
    for ((sort, parts) <- Seq((col("k").asc, 0), (col("k").desc, 0), (col("k").asc, 512))) {
      val got = GlobalRank
        .withPrefixMax(df, Seq(sort, col("id")), "v", "pm", numPartitions = parts)
        .select("id", "pm").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val w = Window.orderBy(sort, col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = df
        .withColumn("pm", coalesce(max(col("v")).over(w), lit(Long.MinValue)))
        .select("id", "pm").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want, s"prefix-max mismatch for sort=$sort parts=$parts")
    }
  }

  test("withPrefixMax ignores null values; sparse all-null partitions keep the identity") {
    val df = data(200).withColumn("v",
      when(col("id") % 3 === 0, (col("id") * 13 % 101).cast("long")))
    val got = GlobalRank
      .withPrefixMax(df, Seq(col("k"), col("id")), "v", "pm", numPartitions = 64)
      .select("id", "pm").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("pm", coalesce(max(col("v")).over(w), lit(Long.MinValue)))
      .select("id", "pm").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want)
  }

  test("withPrefixMax on an empty frame yields empty output") {
    val df = data(10).filter(col("id") < 0).withColumn("v", col("id"))
    assert(GlobalRank.withPrefixMax(df, Seq(col("id")), "v", "pm").count() === 0L)
  }

  test("offset lookup is O(1) per row: no per-partition CASE over __pid in the plan") {
    val ranked = GlobalRank.withRank(data(1000), Seq(col("k"), col("id")))
    val plan = ranked.queryExecution.optimizedPlan.toString
    assert(!plan.contains("CASE WHEN"),
      s"per-partition branch chain found in plan (anti-scales with cluster size):\n$plan")
    assert(plan.contains("element_at"),
      s"expected O(1) element_at offset lookup in plan:\n$plan")
  }

  test("cluster-scale rehearsal: 512 partitions, exact ranks, no codegen fallback") {
    // At 512 branches a when-chain would blow codegen's method-size
    // limit and fall back to interpreted eval; the array lookup must
    // keep the rank projection inside WholeStageCodegen.
    val df = data(5000)
    val ranked = GlobalRank.withRank(df, Seq(col("k"), col("id")), numPartitions = 512)
    // collect ranked itself so AQE finalizes ITS executedPlan
    val got = ranked.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"))).toSeq.sorted
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy("k", "id")).cast("long"))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want)
    // `*(n)` is WholeStageCodegen's marker in the final AQE plan; the
    // rank projection must carry it (a 512-branch when-chain would
    // trip the codegen size limit and lose the star).
    val exec = ranked.queryExecution.executedPlan.toString
    assert(exec.linesIterator.exists(l => l.contains("Project") && l.contains("*(")),
      s"rank projection fell out of whole-stage codegen at 512 partitions:\n${exec.take(2000)}")
  }

  test("withPrefixSums equals global running sums: inclusive+exclusive, multi-col, 512 parts") {
    val df = data(1000)
      .withColumn("a", (col("id") * 31 % 17).cast("long"))
      .withColumn("b", when(col("id") % 4 === 0, (col("id") % 7).cast("long"))) // nulls
    for ((inclusive, parts) <- Seq((true, 0), (false, 0), (true, 512))) {
      val got = GlobalRank.withPrefixSums(df, Seq(col("k"), col("id")),
          Seq("a", "b"), Seq("ca", "cb"), inclusive, numPartitions = parts)
        .select("id", "ca", "cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val w = Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
      val want = df
        .withColumn("ca", coalesce(sum(col("a")).over(w), lit(0L)))
        .withColumn("cb", coalesce(sum(col("b")).over(w), lit(0L)))
        .select("id", "ca", "cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got == want, s"prefix-sum mismatch inclusive=$inclusive parts=$parts")
    }
  }

  test("withPrefixSums on an empty frame yields empty output") {
    val df = data(10).filter(col("id") < 0).withColumn("v", col("id"))
    assert(GlobalRank.withPrefixSums(df, Seq(col("id")), Seq("v"), Seq("cv")).count() === 0L)
  }

  test("descending sort columns rank correctly") {
    val df = data(500)
    val got = GlobalRank.withRank(df, Seq(col("k").desc, col("id")))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want)
  }
}
