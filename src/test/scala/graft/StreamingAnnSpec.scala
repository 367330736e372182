package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingAnn, StreamingDedup}

/** Ingest-time EMBEDDING near-dup detection
  * ([[StreamingAnn.foldBatchPersistent]]) on the shared persistent
  * store: emission union must equal the q24 batch chain exactly
  * (cosine-for-cosine), replays must be idempotent, and the
  * schema-agnostic [[StreamingDedup.compactState]] must serve this
  * store too.
  */
class StreamingAnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def planes: Int =
    ScaleParams.srpBandPlanes(ScaleParams.tableRows(spark, dir, "embeddings"))

  private def vecs(): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("persistent embed fold: emission union == q24 rebuild, exactly; replay is a no-op") {
    val statePath = Files.createTempDirectory("graft_annstore").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_annpairs").toString + "/pairs"
    val all = vecs().persist()
    val p = planes
    def fold(k: Int, id: Long) = collectPairs(
      StreamingAnn.foldBatchPersistent(statePath,
        all.filter(pmod(col("vec_id"), lit(4)) === k), id, p,
        pairsDir = Some(pairsDir)))

    val perBatch = (0 until 4).map(k => fold(k, k.toLong))
    val emitted = perBatch.flatten
    val rebuild = collectPairs(Queries.all("q24_dedup_embed")(spark, dir)).toSet
    assert(rebuild.nonEmpty, "fixture must contain planted embedding near-dups")
    assert(emitted.size == emitted.toSet.size, "duplicate emission")
    assert(emitted.toSet == rebuild, "fold != q24 batch chain")
    assert(StreamingDedup.pairsView(spark, pairsDir)
      .map(collectPairs(_).toSet).getOrElse(Set.empty) == rebuild)
    // crash-window replay of the last batch: same pairs, state
    // unchanged (SET compare — the fold's output carries no ORDER BY)
    val stateCount = spark.read.parquet(statePath).count()
    assert(fold(3, 3L).toSet == perBatch(3).toSet,
      "replay diverged from the original attempt")
    assert(spark.read.parquet(statePath).count() == stateCount, "replay grew the state")
    assert(stateCount == all.count(), "state must hold one row per vector")
    all.unpersist(): Unit
  }

  test("q284 incremental == q24 restricted to touching pairs == a one-ingest fold") {
    val q24 = collectPairs(Queries.all("q24_dedup_embed")(spark, dir))
    val q284 = collectPairs(Queries.all("q284_embed_incremental")(spark, dir))
    assert(q284.nonEmpty && q284.toSet ==
      q24.filter(p => p._1 % 4 == 3 || p._2 % 4 == 3).toSet,
      "incremental chain must emit exactly the pairs touching the increment")
    assert(q284.size < q24.size, "the increment restriction must prune on this fixture")
    // the streaming monitor folding ONLY the increment over a state
    // seeded with the rest of the corpus emits the same rows
    val statePath = Files.createTempDirectory("graft_annincr").toString + "/state"
    val p = planes
    StreamingAnn.foldBatchPersistent(statePath,
      vecs().filter(pmod(col("vec_id"), lit(4)) =!= 3), 0L, p): Unit
    val folded = collectPairs(StreamingAnn.foldBatchPersistent(statePath,
      vecs().filter(pmod(col("vec_id"), lit(4)) === 3), 1L, p))
    assert(folded.toSet == q284.toSet,
      "declared incremental query and streaming fold must agree row-for-row")
  }

  test("q287 groups are the transitive closure of the q24 pairs with component-min canonicals") {
    val pairs = collectPairs(Queries.all("q24_dedup_embed")(spark, dir))
    val groups = Queries.all("q287_embed_groups")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && groups.size ==
      ScaleParams.tableRows(spark, dir, "embeddings"),
      "every vector must carry a component label")
    // paired vectors share a component; the label is the member min;
    // transitive chains collapse (that's what pairs alone can't say)
    pairs.foreach { case (a, b, _) =>
      assert(groups(a) == groups(b), s"pair ($a,$b) split across groups") }
    groups.groupBy(_._2).foreach { case (lbl, members) =>
      assert(lbl == members.keys.min, s"canonical $lbl is not its component min") }
    assert(groups.exists { case (id, lbl) => id != lbl },
      "fixture must produce non-singleton groups")
  }

  test("the shared compactor serves the embed store: content stable, folds continue") {
    val statePath = Files.createTempDirectory("graft_anncompact").toString + "/state"
    val all = vecs().persist()
    val p = planes
    val emitted = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def fold(k: Int): Unit = emitted ++= collectPairs(
      StreamingAnn.foldBatchPersistent(statePath,
        all.filter(pmod(col("vec_id"), lit(4)) === k), k.toLong, p))
    (0 until 3).foreach(fold)
    val before = spark.read.parquet(statePath)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    StreamingDedup.compactState(spark, statePath, upToBatchId = 2L)
    val dirs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(statePath))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=2"), s"expected one merged dir, got $dirs")
    assert(spark.read.parquet(statePath)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == before)
    fold(3)
    val rebuild = collectPairs(Queries.all("q24_dedup_embed")(spark, dir)).toSet
    assert(emitted.toSet == rebuild && emitted.size == emitted.toSet.size)
    all.unpersist(): Unit
  }
}
