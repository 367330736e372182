package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Build-once / query-many IVF index persistence
  * ([[Similarity.persistIvfIndex]] / [[Similarity.probePersistedIvf]]):
  *
  *  1. correctness — probing the persisted index returns EXACTLY the
  *     in-memory q29 chain's rows (same assignment, same probes, same
  *     rerank math), so persistence changes where the lists live, not
  *     what a probe answers;
  *  2. physical shape — the probe's `IN (lists)` predicate lands on
  *     the partition column and prunes at planning time: the filtered
  *     read's inputFiles are a strict subset limited to the probed
  *     `list_id=` directories (this is the I/O bill q288 audits);
  *  3. amortization — a SECOND query set probes the SAME index files
  *     without any rebuild and matches its own in-memory rerank.
  */
class PersistedIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[8]", "8")
  private val dir = "/root/testdata/sf0.001"
  private val Probes = 2
  private val K = 5

  private def embeddings: DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))

  private def cents(e: DataFrame): DataFrame = {
    val lists = ScaleParams.ivfLists(ScaleParams.tableRows(spark, dir, "embeddings"))
    e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
  }

  // the q29 assignment, kept test-local so the spec pins the CONTRACT
  // (argmax cosine, ties to the smaller centroid id), not the impl
  private def assign(e: DataFrame, c: DataFrame): DataFrame =
    e.crossJoin(broadcast(c))
      .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("vec"), col("c_id")),
        struct(col("ccos"), (-col("c_id")).as("n"))).as("b"))
      .select(col("vec_id"), col("b.vec").as("vec"), col("b.c_id").as("list_id"))

  private def queriesFrom(e: DataFrame, lo: Long, hi: Long): DataFrame =
    e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))

  private lazy val indexPath: String = {
    val p = Files.createTempDirectory("graft_ivf_index").toString + "/index"
    val e = embeddings
    Similarity.persistIvfIndex(assign(e, cents(e)), p)
    p
  }

  test("persisted probe == in-memory q29 chain, row for row") {
    val fromIndex = Similarity.probePersistedIvf(spark, indexPath,
        Similarity.ivfProbes(queriesFrom(embeddings, 0, 10), cents(embeddings), Probes), K)
      .orderBy("q_id", "rank").collect()
    val inMemory = SparkEntry.queries("q29_knn_ivf")(spark, dir).collect()
    assert(fromIndex.length == inMemory.length)
    fromIndex.zip(inMemory).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2), s"$a vs $b")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-12, s"$a vs $b")
    }
  }

  test("probe scan is partition-pruned to the probed lists' files") {
    val probes = Similarity.ivfProbes(queriesFrom(embeddings, 0, 10),
      cents(embeddings), Probes)
    val probedLists = probes.select(col("list_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val allFiles = spark.read.parquet(indexPath).inputFiles.length
    val pruned = spark.read.parquet(indexPath)
      .filter(col("list_id").isin(probedLists.toSeq: _*))
    pruned.collect()
    // inputFiles ignores filters — the proof is the executed scan's
    // own numFiles metric (this plan has no exchange, so no AQE wrap)
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < allFiles, s"read $read of $allFiles files")
    assert(read <= probedLists.size * 2, // ≈1 file per probed list dir here
      s"read $read files for ${probedLists.size} probed lists")
    // and the pruning is PLAN-time: the scan carries a partition filter
    val planStr = scan.toString
    assert(planStr.contains("PartitionFilters") &&
      !planStr.matches("(?s).*PartitionFilters: \\[\\].*"), planStr.take(2000))
  }

  test("a second query set reuses the index without rebuild") {
    val e = embeddings
    val c = cents(e)
    val probes = Similarity.ivfProbes(queriesFrom(e, 10, 15), c, Probes)
    val got = Similarity.probePersistedIvf(spark, indexPath, probes, K)
      .orderBy("q_id", "rank").collect()
    // expected: the same rerank against the in-memory assignment
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val expected = broadcast(probes).join(assign(e, c), "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", Similarity.cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rank").collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2), s"$a vs $b")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-12, s"$a vs $b")
    }
  }
}
