package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning (the other half of the 100 TB layout
  * playbook next to bucketing): when the fact table is partitioned on
  * the join key and the dimension side carries a filter, Spark injects
  * a runtime `dynamicpruning` subquery into the fact scan — only the
  * partitions matching the filtered dim keys are read at all. At
  * 100 TB with date/tenant-partitioned facts this is the difference
  * between scanning one partition and scanning the lake.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("dim-side filter prunes fact partitions at runtime (dynamicpruning in scan)") {
    val root = Files.createTempDirectory("graft_dpp").toString
    val dir = "/root/testdata/sf0.001"
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.partitionBy("event_type").parquet(s"$root/fact")
    // The dim filter must sit on a NON-join column read from storage:
    // a literal predicate on the join key itself propagates through
    // the equi-join as a STATIC partition filter (constraint
    // propagation — no runtime pruning needed), and a local literal
    // dim constant-folds. Only a stored attribute filter leaves the
    // surviving join keys unknown until runtime — the DPP case.
    Tables.events(spark, dir).select(col("event_type")).distinct()
      .withColumn("flag", when(col("event_type") === "click", 1).otherwise(0))
      .write.parquet(s"$root/dim")

    val fact = spark.read.parquet(s"$root/fact")
    val dim = spark.read.parquet(s"$root/dim").filter(col("flag") === 1)
    val joined = fact.join(dim, "event_type")
    val n = joined.collect().length
    val clicks = Tables.events(spark, dir).filter(col("event_type") === "click").count()
    assert(n.toLong === clicks)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan should carry a runtime partition-pruning subquery:\n$plan")
  }
}
