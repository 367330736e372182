package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.streaming.StreamingDedup

/** The PERSISTENT signature store behind the ingest-time dedup
  * monitor ([[StreamingDedup.foldBatchPersistent]]): per batch it
  * must write ONLY the increment (O(increment), not O(state)), read
  * its snapshot from disk (restart = re-open the path), stay
  * idempotent under crash-window replays and re-ingested ids, and
  * survive [[StreamingDedup.compactState]] — including a compactor
  * crash at every recoverable point — without changing a row.
  * Parity oracle throughout: the batch MinHash-LSH chain over the
  * same corpus (the q21 shape).
  */
class StreamingDedupStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")
  private val dir = "/root/testdata/sf0.001"

  private def docs(): Array[(Long, String)] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  /** The batch-chain ground truth over an arbitrary (doc_id, text)
    * corpus — q21's exact shape (sig → banded candidates → est ≥ 1/2).
    */
  private def rebuildPairs(corpus: DataFrame): Set[(Long, Long, Double)] =
    Dedup.lshCandidates(
        Dedup.materialize(Dedup.minhashSigTable(corpus, "doc_id", "text", 16)),
        "doc_id", "sig", 4, 4)
      .withColumn("est_jaccard", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") * 32 >= lit(16))
      .select("id_a", "id_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def stateIds(statePath: String): Seq[Long] =
    spark.read.parquet(statePath).select("doc_id")
      .collect().map(_.getLong(0)).toSeq

  test("persistent fold: emissions union == batch rebuild; each batch dir holds only its increment") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigstore").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_sigpairs").toString + "/pairs"
    val batches = (0 until 4).map(k => all.filter(_._1 % 4 == k))

    val emitted = batches.zipWithIndex.flatMap { case (b, id) =>
      collectPairs(StreamingDedup.foldBatchPersistent(
        statePath, b.toSeq.toDF("doc_id", "text"), id.toLong,
        pairsDir = Some(pairsDir)))
    }
    val rebuild = rebuildPairs(all.toSeq.toDF("doc_id", "text"))
    assert(rebuild.nonEmpty, "fixture must contain planted near-dups")
    assert(emitted.size == emitted.toSet.size, "duplicate emission")
    assert(emitted.toSet == rebuild)
    // the persisted emission dirs carry the same union
    assert(StreamingDedup.pairsView(spark, pairsDir)
      .map(collectPairs(_).toSet).getOrElse(Set.empty) == rebuild)

    // O(increment) write: batch k's dir contains EXACTLY batch k's ids
    batches.zipWithIndex.foreach { case (b, id) =>
      val ids = spark.read.parquet(s"$statePath/batch=$id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == b.map(_._1).toSet, s"batch $id dir is not exactly its increment")
    }
    assert(stateIds(statePath).sorted.toSeq == all.map(_._1).sorted.toSeq)
  }

  test("crash-window replay and re-ingested ids are both no-ops") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigreplay").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_sigreplay_p").toString + "/pairs"
    val b0 = all.filter(_._1 % 2 == 0)
    val b1 = all.filter(_._1 % 2 == 1)
    def fold(b: Array[(Long, String)], id: Long) = collectPairs(
      StreamingDedup.foldBatchPersistent(statePath, b.toSeq.toDF("doc_id", "text"),
        id, pairsDir = Some(pairsDir)))

    fold(b0, 0L): Unit
    val firstAttempt = fold(b1, 1L)
    val idsAfter = stateIds(statePath).sorted.toSeq
    // crash-window replay: same batch, same batchId — the fold must
    // read the same `< 1` snapshot (its own half-published dir is
    // excluded), recompute the same pairs, overwrite its own dir.
    // SET comparison: the fold's output carries no ORDER BY, so row
    // order is shuffle-scheduling-dependent (dup-freedom is asserted
    // by the exactly-once tests)
    val replay = fold(b1, 1L)
    assert(replay.toSet == firstAttempt.toSet,
      "replay diverged from the original attempt")
    assert(stateIds(statePath).sorted.toSeq == idsAfter, "replay changed the state")
    // re-ingest under a NEW batchId: every id already in state — the
    // anti-join drops all of them; nothing emitted, nothing re-signed
    val reingest = fold(b0, 2L)
    assert(reingest.isEmpty, "re-ingested ids re-emitted pairs")
    assert(stateIds(statePath).sorted.toSeq == idsAfter, "re-ingest grew the state")
    // lifetime emissions still equal the batch rebuild
    assert(StreamingDedup.pairsView(spark, pairsDir)
      .map(collectPairs(_).toSet).getOrElse(Set.empty) ==
      rebuildPairs(all.toSeq.toDF("doc_id", "text")))
  }

  test("compactState merges committed dirs without changing a row; folds continue after") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigcompact").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft_sigcompact_p").toString + "/pairs"
    val batches = (0 until 4).map(k => all.filter(_._1 % 4 == k))
    val emitted = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def fold(k: Int): Unit = emitted ++= collectPairs(
      StreamingDedup.foldBatchPersistent(statePath,
        batches(k).toSeq.toDF("doc_id", "text"), k.toLong, pairsDir = Some(pairsDir)))

    (0 until 3).foreach(fold)
    val before = stateIds(statePath).sorted.toSeq
    StreamingDedup.compactState(spark, statePath, upToBatchId = 2L,
      targetFileBytes = 1L << 20)
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(statePath)).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=2"), s"expected one merged dir, got $dirs")
    assert(stateIds(statePath).sorted.toSeq == before, "compaction changed the state")
    // the stream keeps folding against the merged store
    fold(3)
    assert(emitted.toSet == rebuildPairs(all.toSeq.toDF("doc_id", "text")))
    assert(emitted.size == emitted.toSet.size)
    // idempotent: compacting an already-compacted range is a no-op
    StreamingDedup.compactState(spark, statePath, upToBatchId = 2L)
    assert(stateIds(statePath).sorted.toSeq ==
      (before ++ batches(3).map(_._1)).sorted)
  }

  test("compactor crash recovery: rolls back before the commit marker, forward after it") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigrecover").toString + "/state"
    val batches = (0 until 3).map(k => all.filter(_._1 % 3 == k))
    batches.zipWithIndex.foreach { case (b, id) =>
      StreamingDedup.foldBatchPersistent(statePath,
        b.toSeq.toDF("doc_id", "text"), id.toLong): Unit
    }
    val before = stateIds(statePath).sorted.toSeq
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // crash BEFORE the marker: a stale staging dir must be rolled
    // back (deleted), never published — the store is untouched
    spark.read.parquet(s"$statePath/batch=0")
      .write.parquet(s"$statePath/.compact-state")
    StreamingDedup.compactState(spark, statePath, upToBatchId = 1L)
    assert(stateIds(statePath).sorted.toSeq == before)
    val afterFirst = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(afterFirst == Seq("batch=1", "batch=2"))

    // crash AFTER the marker (staging complete, publish never ran):
    // the next run must roll FORWARD — publish the staging content
    val staged = spark.read.option("basePath", statePath)
      .parquet(s"$statePath/batch=1", s"$statePath/batch=2")
      .drop("batch")
    staged.write.parquet(s"$statePath/.compact-state")
    fs.create(new Path(root, ".compact-commit-2"), true).close()
    StreamingDedup.compactState(spark, statePath, upToBatchId = 2L)
    val afterSecond = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(afterSecond == Seq("batch=2"), s"forward recovery failed: $afterSecond")
    assert(stateIds(statePath).sorted.toSeq == before, "recovery changed the state")
    assert(!fs.exists(new Path(root, ".compact-commit-2")) &&
      !fs.exists(new Path(root, ".compact-state")),
      "recovery left protocol litter behind")
  }

  test("a FOLD self-heals a compactor crash: no silent partial snapshot until the next compactState") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigfoldheal").toString + "/state"
    val batches = (0 until 3).map(k => all.filter(_._1 % 3 == k))
    val emitted = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def fold(b: Array[(Long, String)], id: Long): Unit = emitted ++= collectPairs(
      StreamingDedup.foldBatchPersistent(statePath, b.toSeq.toDF("doc_id", "text"), id))
    fold(batches(0), 0L)
    fold(batches(1), 1L)
    // simulate the WORST compactor crash: marker written, batch dirs
    // already retired, staging complete, publish never ran, stale lock
    // left behind — stateSigs alone would see an EMPTY store here
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = spark.read.option("basePath", statePath)
      .parquet(s"$statePath/batch=0", s"$statePath/batch=1").drop("batch")
    staged.write.parquet(s"$statePath/.compact-state")
    fs.create(new Path(root, ".compact-commit-1"), true).close()
    assert(fs.rename(new Path(root, "batch=0"), new Path(root, ".retired-batch=0")))
    assert(fs.rename(new Path(root, "batch=1"), new Path(root, ".retired-batch=1")))
    fs.create(new Path(root, ".compact-lock"), true).close()
    // while the lock is FRESH the fold must NOT steal it — litter plus
    // a live lock means a compactor may be mid-publish (a quiesce
    // violation); the fold aborts loudly instead of deleting a live
    // run's staging (round-11 advice: honor the TTL like withLock)
    val live = intercept[IllegalStateException] { fold(batches(2), 2L) }
    assert(live.getMessage.contains("quiesce"), live.getMessage)
    // age the lock past the TTL → the owner is adjudicated dead
    assert(new java.io.File(statePath, ".compact-lock")
      .setLastModified(System.currentTimeMillis() - 2 * 60 * 60 * 1000L))
    // the NEXT FOLD (not compactState) must roll the crash forward
    // before reading its snapshot — otherwise batch 2 would re-sign
    // re-ingested ids and miss every cross-batch pair
    fold(batches(2), 2L)
    assert(stateIds(statePath).sorted.toSeq == all.map(_._1).sorted.toSeq,
      "fold read a partial store after the compactor crash")
    val rebuild = rebuildPairs(all.toSeq.toDF("doc_id", "text"))
    assert(emitted.toSet == rebuild && emitted.size == emitted.toSet.size)
    val dirs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=1", "batch=2"), s"roll-forward incomplete: $dirs")
    assert(!fs.exists(new Path(root, ".compact-lock")),
      "the dead compactor's stale lock must be cleared")
  }

  test("foreign dir names are skipped, not fatal; a too-high upToBatchId clamps to the newest merged dir") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigforeign").toString + "/state"
    val batches = (0 until 3).map(k => all.filter(_._1 % 3 == k))
    val emitted = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def fold(k: Int): Unit = emitted ++= collectPairs(
      StreamingDedup.foldBatchPersistent(statePath,
        batches(k).toSeq.toDF("doc_id", "text"), k.toLong))
    fold(0); fold(1)
    // manual-ops litter: a non-conforming dir name must not throw
    // NumberFormatException in every subsequent fold (round-11 advice)
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root, "batch=0_old"))
    fold(2)
    assert(stateIds(statePath).sorted.toSeq == all.map(_._1).sorted.toSeq,
      "fold over a store with a foreign dir name diverged")
    assert(emitted.toSet == rebuildPairs(all.toSeq.toDF("doc_id", "text")))
    fs.delete(new Path(root, "batch=0_old"), true)
    // caller passes an id ABOVE the newest dir: the publish target
    // must clamp to the largest merged id (2), never a future id that
    // stateSigs(_, _, 3) would exclude (round-11 advice)
    val before = stateIds(statePath).sorted.toSeq
    StreamingDedup.compactState(spark, statePath, upToBatchId = 99L)
    val dirs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=2"), s"expected the merged dir under the CLAMPED id: $dirs")
    assert(StreamingDedup.stateSigs(spark, statePath, beforeBatchId = 3L)
      .map(_.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      .getOrElse(Seq.empty) == before,
      "the merged snapshot must stay visible to the next batch")
  }

  test("recovery is total: marker + retired dirs with NEITHER staging nor published dir restores the retired copies") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigtotal").toString + "/state"
    val batches = (0 until 2).map(k => all.filter(_._1 % 2 == k))
    batches.zipWithIndex.foreach { case (b, id) =>
      StreamingDedup.foldBatchPersistent(statePath,
        b.toSeq.toDF("doc_id", "text"), id.toLong): Unit
    }
    val before = stateIds(statePath).sorted.toSeq
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the round-11-advice state: a post-marker crash whose staging was
    // then lost (quiesce violation rolled it back after dirs retired)
    // — batch=1 retired, no staging, no published batch=1
    fs.create(new Path(root, ".compact-commit-1"), true).close()
    assert(fs.rename(new Path(root, "batch=0"), new Path(root, ".retired-batch=0")))
    assert(fs.rename(new Path(root, "batch=1"), new Path(root, ".retired-batch=1")))
    // pre-fix this require-failed on every subsequent call, wedging
    // the store; now it must restore the retired dirs and carry on
    StreamingDedup.compactState(spark, statePath, upToBatchId = 1L)
    assert(stateIds(statePath).sorted.toSeq == before,
      "total recovery must restore the retired copies — the only remaining data")
    val names = fs.listStatus(root).map(_.getPath.getName).sorted.toSeq
    assert(!names.exists(_.startsWith(".compact-commit-")) &&
      !names.exists(_.startsWith(".retired-")),
      s"recovery left protocol litter behind: $names")
    // folds continue against the recovered store
    val pairs = collectPairs(StreamingDedup.foldBatchPersistent(statePath,
      all.filter(_._1 % 2 == 0).toSeq.toDF("doc_id", "text"), 2L))
    assert(pairs.isEmpty, "re-ingest after recovery must anti-join away")
  }

  test("maybeCompact epilogue: dir count stays bounded across folds, content row-stable, cadence-off is a no-op") {
    import spark.implicits._
    val all = docs()
    val statePath = Files.createTempDirectory("graft_sigcadence").toString + "/state"
    val batches = (0 until 8).map(k => all.filter(_._1 % 8 == k))
    val emitted = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirCount(): Int = fs.listStatus(root)
      .map(_.getPath.getName).count(_.startsWith("batch="))
    batches.zipWithIndex.foreach { case (b, id) =>
      emitted ++= collectPairs(StreamingDedup.foldBatchPersistent(statePath,
        b.toSeq.toDF("doc_id", "text"), id.toLong))
      StreamingDedup.maybeCompact(spark, statePath, id.toLong, every = 3)
      // every=3 merges [0, id-1] at ids 3 and 6: the store never
      // holds more than `every + 1` dirs right after the epilogue
      assert(dirCount() <= 4, s"cadence failed to bound the store at batch $id")
    }
    assert(stateIds(statePath).sorted.toSeq == all.map(_._1).sorted.toSeq)
    assert(emitted.toSet == rebuildPairs(all.toSeq.toDF("doc_id", "text")))
    assert(emitted.size == emitted.toSet.size)
    // a replayed batch re-runs the epilogue harmlessly (range already
    // merged → <= 1 dir in range → no-op), and every=0 disables
    val dirsBefore = fs.listStatus(root).map(_.getPath.getName).sorted.toSeq
    StreamingDedup.maybeCompact(spark, statePath, 6L, every = 3)
    StreamingDedup.maybeCompact(spark, statePath, 7L, every = 0)
    assert(fs.listStatus(root).map(_.getPath.getName).sorted.toSeq == dirsBefore)
  }
}
