package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.grok.GrokExtract

/** The PruneGrokCaptures optimizer rule: referenced-only captures
  * survive, values are unchanged, whole-struct references are left
  * intact.
  */
class PruneGrokSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val pat = "%{WORD:a} %{INT:b:int} %{WORD:c}"

  private def grokExtracts(df: org.apache.spark.sql.DataFrame): Seq[GrokExtract] =
    df.queryExecution.optimizedPlan
      .collect { case node => node.expressions }.flatten
      .flatMap(_.collect { case g: GrokExtract => g })

  test("single-field reference prunes the struct to that capture") {
    val df = spark.range(1)
      .select(concat_ws(" ", lit("hello"), (col("id") + 42).cast("string"), lit("world")).as("line"))
      .select(graft.functions.grok_extract(col("line"), pat).as("g"))
      .select(col("g.b").as("b"))
    val gs = grokExtracts(df)
    assert(gs.nonEmpty && gs.forall(_.wanted.contains(Seq("b"))))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("multi-field reference keeps exactly the referenced captures") {
    val df = spark.range(1)
      .select(concat_ws(" ", lit("hello"), (col("id") + 42).cast("string"), lit("world")).as("line"))
      .select(graft.functions.grok_extract(col("line"), pat).as("g"))
      .select(col("g.c").as("c"), col("g.a").as("a"))
    val gs = grokExtracts(df)
    assert(gs.nonEmpty && gs.forall(g => g.wanted.exists(_.toSet == Set("a", "c"))))
    val r = df.collect().head
    assert(r.getString(0) == "world" && r.getString(1) == "hello")
  }

  test("whole-struct reference is not pruned") {
    val df = spark.range(1)
      .select(concat_ws(" ", lit("hello"), (col("id") + 42).cast("string"), lit("world")).as("line"))
      .select(graft.functions.grok_extract(col("line"), pat).as("g"))
    val gs = grokExtracts(df)
    assert(gs.nonEmpty && gs.forall(_.wanted.isEmpty))
    assert(df.select("g.a", "g.b", "g.c").collect().head.toSeq ==
      Seq("hello", 42L, "world"))
  }
}
