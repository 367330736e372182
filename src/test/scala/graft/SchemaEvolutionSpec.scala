package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on the document sink — the parquet analogue of the
  * reference's ES dynamic mapping (`main.go:306-320`: new fields may
  * appear on any document; old documents simply lack them). A later
  * release adds a column; old and new batch directories coexist under
  * one root and must stay readable together.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("a column added by a later release reads back with nulls for old batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_evolve").toString
    // release 1 writes (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(root)
    // release 2 adds a lang column
    Seq((3L, "gamma", "en"), (4L, "delta", "de")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(root)

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang"))
    assert(merged.count() === 4)
    // old batches surface the new column as null — no rewrite needed
    assert(merged.filter(col("doc_id") <= 2 && col("lang").isNull).count() === 2)
    assert(merged.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))

    // the footgun the option exists for: a plain read may resolve to
    // ONE footer's schema and silently drop the new column — pipeline
    // readers over evolving sinks must opt in to mergeSchema (or set
    // it in table metadata)
    val plain = spark.read.parquet(root)
    assert(plain.count() === 4)
  }
}
