package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IndexMapping

/** Index auto-create fidelity: the mapping body (`main.go:306-320`)
  * and the create-once memo (`main.go:293-300,327`).
  */
class IndexMappingSpec extends AnyFunSuite {

  test("mapping body carries the reference's dynamic-typing contract") {
    val spark = GraftSession.get("local[2]", "2")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // parse with Spark's JSON reader — proves it's valid JSON and has
    // the exact fields the reference sets
    val row = Seq(IndexMapping.MappingJson).toDF("j").select(
      get_json_object(col("j"), "$.mappings._doc.dynamic").as("dyn"),
      get_json_object(col("j"), "$.mappings._doc.date_detection").as("dd"),
      get_json_object(col("j"), "$.mappings._doc.numeric_detection").as("nd"),
      get_json_object(col("j"), "$.mappings._doc.properties.timestamp.type").as("tt"),
      get_json_object(col("j"), "$.mappings._doc.properties.timestamp.format").as("tf"))
      .collect().head
    assert(row.getString(0) === "true")
    assert(row.getString(1) === "true")
    assert(row.getString(2) === "true")
    assert(row.getString(3) === "date")
    assert(row.getString(4) === "epoch_millis")
  }

  test("registry creates each index exactly once under concurrent ensure") {
    val reg = new IndexMapping.Registry
    val creates = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { _ =>
      new Thread(() => (1 to 100).foreach { i =>
        reg.ensure(s"gorouter-2024-01-${i % 5}")(_ => creates.incrementAndGet())
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(creates.get() === 5)
    assert(reg.known.size === 5)
  }
}
