package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** q282_sql_knn_tvf: LSH-bucketed ANN exposed as a parameterized SQL
  * table function (`SELECT * FROM near_neighbors(k)`). The body is
  * generated from the same constants as the Scala operator (plane
  * count, hyperplane signs, vec_dot/vec_norm kernels), so the two
  * must be row-IDENTICAL — bit-exact cosines, not approximate — and
  * the parameter must do real work (k=1 prefix, large-k full bucket
  * ranking). Mirrors SqlTextDedupSpec's pinning of q280.
  */
class SqlKnnTvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("table function at k=5 is row-identical to the Scala q26 chain; shares its oracle") {
    val tvf = rows(Queries.all("q282_sql_knn_tvf")(spark, dir))
    val scala = rows(Queries.all("q26_knn_lsh")(spark, dir))
    assert(tvf.nonEmpty, "every query vector must find bucket-mates on the fixture")
    assert(tvf == scala) // same neighbors, same EXACT cosines, same order
    assert(Queries.oracles("q282_sql_knn_tvf") == Queries.oracles("q26_knn_lsh"))
  }

  test("the parameter does the work: k=1 is the per-query argmax prefix of k=5") {
    val k5 = rows(QueriesTraining.sqlKnnTvfCall(spark, dir, 5))
    val k1 = rows(QueriesTraining.sqlKnnTvfCall(spark, dir, 1))
    assert(k1 == k5.filter(_._2 == 1), "k=1 must be exactly the rank-1 slice")
    assert(k1.size < k5.size)
    // catalog hygiene: the temp function never outlives its query
    assert(!spark.catalog.functionExists("near_neighbors"))
  }

  test("large k degenerates to the FULL bucket-mate ranking (the unbounded chain)") {
    import org.apache.spark.sql.functions.col
    val all = rows(QueriesTraining.sqlKnnTvfCall(spark, dir, Int.MaxValue))
    val n = ScaleParams.tableRows(spark, dir, "embeddings")
    val unbounded = graft.sim.Similarity.knnLsh(
        Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").as("vec"))
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("vec").as("q_vec")),
        Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").as("vec")),
        Int.MaxValue, ScaleParams.lshPlanes(n), 64)
      .orderBy("q_id", "rank")
    assert(all == rows(unbounded),
      "k=MAX must pass every bucket collision through, ranked")
  }

  test("multi-probe table function at k=5 is row-identical to the Scala q87 chain") {
    val tvf = rows(Queries.all("q283_sql_knn_probe_tvf")(spark, dir))
    val scala = rows(Queries.all("q87_knn_multiprobe")(spark, dir))
    assert(tvf.nonEmpty && tvf == scala)
    assert(Queries.oracles("q283_sql_knn_probe_tvf") == Queries.oracles("q87_knn_multiprobe"))
    assert(!spark.catalog.functionExists("near_neighbors_probe"))
  }

  test("probing widens the candidate set: k=MAX multi-probe pairs are a strict superset") {
    val single = rows(QueriesTraining.sqlKnnTvfCall(spark, dir, Int.MaxValue))
      .map(r => (r._1, r._3)).toSet
    val probed = rows(QueriesTraining.sqlKnnProbeTvfCall(spark, dir, Int.MaxValue))
      .map(r => (r._1, r._3)).toSet
    assert(single.subsetOf(probed),
      "a query's own bucket is probe mask 0 — its mates must all survive")
    assert(probed.size > single.size,
      "Hamming-1 probes must recover boundary neighbors on this fixture")
  }

  test("IVF table function at k=5 is row-identical to the Scala q29 chain") {
    val tvf = rows(Queries.all("q285_sql_knn_ivf_tvf")(spark, dir))
    val scala = rows(Queries.all("q29_knn_ivf")(spark, dir))
    assert(tvf.nonEmpty && tvf == scala)
    assert(Queries.oracles("q285_sql_knn_ivf_tvf") == Queries.oracles("q29_knn_ivf"))
    assert(!spark.catalog.functionExists("near_neighbors_ivf"))
    // k=1 is the argmax prefix here too
    val k1 = rows(QueriesTraining.sqlKnnIvfTvfCall(spark, dir, 1))
    assert(k1 == tvf.filter(_._2 == 1) && k1.size < tvf.size)
  }

  private def pairRows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("embed near-dup table function at the battery threshold is row-identical to the Scala q24 chain") {
    val tvf = pairRows(Queries.all("q286_sql_embed_tvf")(spark, dir))
    val scala = pairRows(Queries.all("q24_dedup_embed")(spark, dir))
    assert(tvf.nonEmpty, "fixture must contain planted embedding near-dups")
    assert(tvf == scala) // same pairs, same EXACT cosines, same order
    assert(Queries.oracles("q286_sql_embed_tvf") == Queries.oracles("q24_dedup_embed"))
    assert(!spark.catalog.functionExists("near_dup_vectors"))
  }

  test("the threshold does the work: tighter min_cos is exactly the filter of the looser result") {
    // min_cos = -1 passes EVERY verified candidate (cosine range):
    // the full banded-SRP candidate set, cosine-verified
    val loose = pairRows(QueriesTraining.sqlEmbedDedupTvfCall(spark, dir, -1.0))
    val tight = pairRows(QueriesTraining.sqlEmbedDedupTvfCall(spark, dir,
      graft.sim.Similarity.NearDupCos))
    assert(tight == loose.filter(_._3 >= graft.sim.Similarity.NearDupCos),
      "threshold must filter, never change, the candidate-verify rows")
    assert(tight.size < loose.size,
      "the fixture must hold candidate pairs below the near-dup threshold")
    // an unsatisfiable threshold degenerates to empty, not an error
    assert(pairRows(QueriesTraining.sqlEmbedDedupTvfCall(spark, dir, 2.0)).isEmpty)
  }

  test("the embed-dedup text plans the one-corpus-pass shape: banded self-join reuses its exchange") {
    val df = Queries.all("q286_sql_embed_tvf")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the MERGE-pinned band self-join must canonicalize both sides to
    // ONE exchange (the expensive bands*planes vec_dot pass runs once)
    assert(p.contains("ReusedExchange"), s"band self-join must reuse its exchange:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("the text plans the ANN shape: query side broadcasts, no corpus sort, no nested loop") {
    val df = Queries.all("q282_sql_knn_tvf")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), s"query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }
}
