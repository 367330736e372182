package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.pipeline.Compaction

/** SELECTIVE REINDEX of a persisted IVF index (round-13, VERDICT r12
  * item 2) — the ACTION the q290 churn audit exists to trigger.
  *
  * The index lifecycle so far: build once ([[Similarity.persistIvfIndex]]),
  * maintain incrementally ([[graft.streaming.StreamingIvf]]), audit
  * (q288 probe economics, q290 churn under a refined quantizer). The
  * missing verb was applying the refined quantizer WITHOUT rewriting
  * 100 TB of inverted lists: [[reindexLists]] rewrites ONLY the lists
  * whose churn (share of members that re-draw under the new centroids)
  * exceeds a threshold — their rows are re-assigned and land in their
  * new list directories — while near-zero-churn lists keep their files
  * byte-for-byte untouched. Bytes rewritten scale with the churn
  * fraction, not the corpus (`IvfReindexSpec` + BASELINE §d measure
  * it against a full re-layout).
  *
  * The result is a MIXED-GENERATION index: rewritten lists answer
  * under the new quantizer, kept lists under the old. Probes (with the
  * new centroids) remain internally exact — every vector lives in
  * exactly one list, and the rerank is exact cosine on probed members
  * — and the mixed index differs from a full rebuild only by the
  * movers of BELOW-threshold lists (≤ threshold fraction per kept
  * list, by construction). At `minChurnBp = 0`, or whenever every
  * kept list has zero churn, it IS the full rebuild, row-identical
  * (the spec's identity pin).
  *
  * Crash discipline (the [[graft.streaming.StreamingDedup]] marker
  * transposed to an in-place, per-list publish): stage → commit marker
  * (its content = the retired list ids + a commit id) → retire source
  * dirs → move staged files in → clean up. A crash before the marker
  * rolls BACK (staging deleted, sources untouched); after it, rolls
  * FORWARD ([[recoverReindex]] — every step idempotent: retires skip
  * already-retired lists, file moves are atomic renames under a
  * commit-unique prefix, so a replay only moves what remains). Runs
  * under the single-maintainer lock; like every maintenance verb on
  * this store, the retire/publish window must be quiesced against
  * probes (a racing reader can see a partial list).
  */
object IvfIndex {

  /** What a [[reindexLists]] run did — the economics row.
    * `rowsRewritten`/`bytesStaged` are the bill (all members of
    * rewritten lists, movers and stayers alike — a list rewrite is a
    * whole-list rewrite); `rowsMoved` the churn it actually applied.
    */
  final case class ReindexStats(listsTotal: Long, listsRewritten: Long,
                                rowsRewritten: Long, rowsMoved: Long,
                                bytesStaged: Long)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val StagingName = ".reindex-staging"
  private val MarkerName = ".reindex-commit"

  /** Rewrite the lists of the index at `path` whose churn under
    * `newCents(c_id, c_vec)` is ≥ `minChurnBp` basis points; leave the
    * rest untouched on disk. `path` must be a LIST-PARTITIONED index
    * root (`list_id=*` dirs directly under it) — a
    * [[Similarity.persistIvfIndex]] output, or, for the batch-keyed
    * streaming store, ONE merged generation dir (`.../batch=<id>`
    * after [[graft.streaming.StreamingIvf.relayoutState]]; reindexing
    * the store ROOT would plant root-level `list_id=*` dirs next to
    * the `batch=*` dirs and break partition discovery —
    * `IndexLifecycleSpec` pins the working composition). One assignment pass over the index (the
    * [[Similarity.ivfAssign]] broadcast argmax — vectors never
    * shuffle), one K-row churn aggregate (the q290 computation), one
    * staged write of the rewritten lists' rows repartitioned on their
    * NEW list (one file per list, the sliver rule), then the marker
    * publish above.
    *
    * The churn collect is K rows (list count — bounded metadata, the
    * q290 output); nothing else reaches the driver.
    */
  def reindexLists(spark: SparkSession, path: String, newCents: DataFrame,
                   minChurnBp: Long,
                   lockTtlMs: Long = 60 * 60 * 1000L): ReindexStats = {
    val root = new Path(path)
    val hfs = fs(spark, root)
    Compaction.withLock(hfs, root, lockTtlMs) {
      recoverLocked(spark, hfs, root) // finish any crashed run first
      val cur = spark.read.parquet(path)
        .select(col("vec_id"), col("vec"), col("list_id").cast("long").as("cur_list"))
      // pass 1 — the churn AUDIT (q290's computation): one full linear
      // read to a K-row aggregate. Round-15 physical cut: the audit
      // only needs the WINNING LIST ID per row, so with a bounded
      // quantizer the new assignment is the [[Similarity.assignListCol]]
      // PROJECTION (no join, no per-vector aggregate, no exchange —
      // scan straight into the K-row combine; the r14 join shape's
      // exchange carried the whole vector in its max_by struct plus a
      // second two-sided shuffle, measured 33.1 s vs ~2 s on the
      // 200k × 447 rehearsal store). Past the projection ceiling the
      // carried broadcast-argmax keeps the exchange at three longs per
      // vector (measured 14.2 s on the same store). Deliberately not
      // materialized for reuse: pass 2 below re-reads only the
      // rewritten lists via partition pruning — I/O ∝ churn fraction,
      // which is the whole point of selectivity.
      val assigned = Similarity.projectedCents(newCents) match {
        case Some((ids, mat)) => cur.select(col("cur_list"),
          Similarity.assignListCol(col("vec"), ids, mat).as("new_list"))
        case None => cur.crossJoin(broadcast(newCents))
          .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
          .groupBy(col("vec_id"))
          .agg(max_by(col("c_id"), struct(col("ccos"), (-col("c_id")).as("n")))
            .as("new_list"),
            first(col("cur_list")).as("cur_list"))
      }
      val churn = assigned
        .groupBy("cur_list")
        .agg(count(lit(1)).as("n"),
          sum(when(col("new_list") =!= col("cur_list"), 1L).otherwise(0L)).as("moved"))
        .withColumn("churn_bp", expr("moved * 10000 div n"))
        .collect()
      val rewrite = churn.filter(_.getAs[Long]("churn_bp") >= minChurnBp)
        .map(_.getAs[Long]("cur_list"))
      if (rewrite.isEmpty) ReindexStats(churn.length.toLong, 0L, 0L, 0L, 0L)
      else {
        val rewriteSet = rewrite.toSet
        val rewritten = churn.filter(r => rewriteSet(r.getAs[Long]("cur_list")))
        val rowsRewritten = rewritten.map(_.getAs[Long]("n")).sum
        val rowsMoved = rewritten.map(_.getAs[Long]("moved")).sum

        val staging = new Path(root, StagingName)
        hfs.delete(staging, true)
        // pass 2 — the REWRITE: re-read ONLY the flagged lists (the
        // isin lands on the partition column → planning-time pruning,
        // the probePersistedIvf physics) and re-assign just their rows
        // same predicate form as probePersistedIvf — the shape whose
        // planning-time pruning PersistedIndexSpec pins on numFiles
        val movedRows = spark.read.parquet(path)
          .filter(col("list_id").isin(rewrite.toIndexedSeq: _*))
          .select(col("vec_id"), col("vec"))
        Similarity.ivfAssign(movedRows, newCents)
          .repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id").parquet(staging.toString)
        val bytesStaged = allBytes(hfs, staging)

        // commit point: marker carries the commit id + retired list ids
        val commitId = System.currentTimeMillis()
        val marker = new Path(root, MarkerName)
        val out = hfs.create(marker, true)
        out.write((commitId.toString +: rewrite.map(_.toString)).mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
        out.close()
        publish(hfs, root)
        ReindexStats(churn.length.toLong, rewrite.length.toLong,
          rowsRewritten, rowsMoved, bytesStaged)
      }
    }
  }

  /** Self-healing entry for readers/maintainers: rolls a crashed
    * [[reindexLists]] run forward (marker present) or back (staging
    * with no marker), under the store lock. No-op on a clean store.
    */
  def recoverReindex(spark: SparkSession, path: String,
                     lockTtlMs: Long = 60 * 60 * 1000L): Unit = {
    val root = new Path(path)
    val hfs = fs(spark, root)
    if (hfs.exists(new Path(root, MarkerName)) ||
        hfs.exists(new Path(root, StagingName)) ||
        hfs.exists(root) && hfs.listStatus(root).exists(
          _.getPath.getName.startsWith(".retired-")))
      Compaction.withLock(hfs, root, lockTtlMs) {
        recoverLocked(spark, hfs, root)
      }
  }

  private def recoverLocked(spark: SparkSession, hfs: FileSystem, root: Path): Unit = {
    val marker = new Path(root, MarkerName)
    if (hfs.exists(marker)) publish(hfs, root)
    else {
      // no marker: staging (if any) is an incomplete write — roll back.
      // A .retired-* twin here is post-commit cleanup litter (publish
      // deletes the marker before the twins — a crash between the two
      // strands them) or foreign litter: delete it when its live dir
      // exists, restore it defensively when the live dir is gone
      hfs.delete(new Path(root, StagingName), true)
      if (hfs.exists(root))
        hfs.listStatus(root).toSeq.map(_.getPath)
          .filter(_.getName.startsWith(".retired-")).foreach { r =>
            val live = new Path(root, r.getName.stripPrefix(".retired-"))
            if (!hfs.exists(live)) { hfs.rename(r, live): Unit }
            else hfs.delete(r, true): Unit
          }
    }
  }

  /** Post-marker publish, idempotent at every resume point:
    *  1. retire each marker-listed live `list_id=<id>` dir — UNLESS
    *     its `.retired-list_id=<id>` twin already exists, in which
    *     case the live dir is THIS run's staged output (retires all
    *     precede moves, so a re-visited id with a retired twin can
    *     only have been recreated by step 2) and is left alone;
    *  2. move every staged file into its live list dir under a
    *     commit-unique `rx<commitId>-` prefix (atomic renames; a
    *     replay only sees the files not yet moved);
    *  3. drop staging, then the MARKER, then the retired dirs (their
    *     rows were all staged — a list rewrite stages movers AND
    *     stayers).
    *
    * The marker MUST go before the retired dirs (round-14, ADVICE r13
    * high): step 1's "already retired ⇒ the live dir is this run's
    * output" inference is keyed on the retired twin's EXISTENCE, so a
    * crash after the twins are deleted but while the marker survives
    * would make a replay re-retire the freshly published lists, find
    * no staging to republish, and then delete the retired dirs — the
    * only remaining copy of every rewritten list. With the marker
    * deleted first, a crash mid-cleanup leaves only orphaned
    * `.retired-*` litter, which [[recoverLocked]]'s no-marker path
    * already disposes of safely (restores the twin if its live dir is
    * missing, deletes it otherwise).
    */
  private def publish(hfs: FileSystem, root: Path): Unit = {
    val marker = new Path(root, MarkerName)
    val lines = {
      val in = hfs.open(marker)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
    }
    val commitId = lines.head.trim
    val retiredIds = lines.tail.map(_.trim).filter(_.nonEmpty)
    retiredIds.foreach { id =>
      val live = new Path(root, s"list_id=$id")
      val retired = new Path(root, s".retired-list_id=$id")
      // belt to the marker-ordering suspenders (ADVICE r13): a live dir
      // already holding THIS commit's rx-prefixed files is republished
      // output, never a retire target — even in states the fixed
      // cleanup ordering makes unreachable, a replay cannot re-retire
      // published lists
      val republished = hfs.exists(live) && hfs.listStatus(live)
        .exists(_.getPath.getName.startsWith(s"rx$commitId-"))
      if (!republished && !hfs.exists(retired) && hfs.exists(live)) {
        if (!hfs.rename(live, retired))
          throw new java.io.IOException(s"reindex failed to retire $live")
      }
    }
    val staging = new Path(root, StagingName)
    if (hfs.exists(staging)) {
      hfs.listStatus(staging).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("list_id=")).foreach { src =>
          val target = new Path(root, src.getName)
          if (!hfs.exists(target)) hfs.mkdirs(target): Unit
          hfs.listStatus(src).toSeq.filter(_.isFile).map(_.getPath)
            .filterNot(_.getName.startsWith("_")) // write markers
            .foreach { f =>
              if (!hfs.rename(f, new Path(target, s"rx$commitId-${f.getName}")))
                throw new java.io.IOException(s"reindex failed to publish $f")
            }
        }
      hfs.delete(staging, true)
    }
    // DRAINED lists (ADVICE r14): a rewritten list whose members ALL
    // reassign away stages no files under its own id, so step 2 never
    // recreates its live dir — and a crash between the marker delete
    // and the twin cleanup would strand a `.retired-` twin whose live
    // dir is missing, which the no-marker recovery path then RESTORES
    // (resurrecting rows already republished into other lists =
    // duplicate vectors). Recreate an (empty) live dir for every
    // marker-listed id before the marker goes, so recovery can always
    // tell post-commit litter (live dir exists → delete the twin) from
    // a genuinely lost list.
    retiredIds.foreach { id =>
      val live = new Path(root, s"list_id=$id")
      if (!hfs.exists(live)) hfs.mkdirs(live): Unit
    }
    // commit completes HERE: once the marker is gone this publish can
    // never replay, so the retired twins below are pure garbage — a
    // crash mid-loop leaves litter for the no-marker recovery path,
    // never a state where step 1 could re-retire published lists
    hfs.delete(marker, false): Unit
    hfs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(".retired-"))
      .foreach(p => hfs.delete(p, true))
  }

  private def allBytes(hfs: FileSystem, p: Path): Long = {
    val it = hfs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) total += it.next().getLen
    total
  }
}
