package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for the partitioned file sink — the
  * operational sibling of [[Retention]]. A streaming sink appends one
  * file set per micro-batch, so a 15 s trigger writes ~5,760
  * files/day/partition; at 100 TB the resulting metadata pressure and
  * sub-split scan tasks dominate read cost long before data volume
  * does. Compaction rewrites a partition's many small files into
  * ⌈bytes / targetFileBytes⌉ files.
  *
  * Each partition is rewritten independently (scales with partition
  * count) and CRASH-RECOVERABLY, not atomically: the swap is two
  * renames (retire the old dir, publish the staging dir), so a reader
  * listing the root in the instant between them — or after a crash in
  * that window — misses the partition. Data is never lost: the retired
  * copy survives as `.retired-<partition>`, and the next [[compact]]
  * run restores any partition whose crash left only the retired copy
  * behind. Run compaction with the sink quiesced (between streaming
  * batches, or on closed date partitions): a writer appending during
  * the rewrite would land files in the retired dir and lose them at
  * cleanup — same contract as every file-level compactor without a
  * transaction log.
  */
object Compaction {

  final case class Report(partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compacts every `es_index=<name>` partition under `root` whose
    * file count exceeds `minFiles`. Returns one [[Report]] per
    * compacted partition. First recovers any partition a previous
    * crashed run left retired-but-unpublished.
    *
    * Exactly ONE compactor may run per root at a time: the run takes a
    * create-exclusive `.compact-lock` marker for its duration — two
    * concurrent runs interleaving the retire/publish renames on one
    * partition could retire a freshly published dir or republish stale
    * staging output, a window the single-run crash recovery does not
    * model. A crashed run's stale lock is reclaimed after
    * `lockTtlMs` (crash recovery already handles its half-done work).
    */
  def compact(spark: SparkSession, root: String, targetFileBytes: Long = 128L << 20,
              minFiles: Int = 2, lockTtlMs: Long = 60 * 60 * 1000L): Seq[Report] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    withLock(fs, rootPath, lockTtlMs) {
      doCompact(spark, fs, rootPath, targetFileBytes, minFiles)
    }
  }

  /** Single-compactor mutual exclusion for `root`: create-exclusive
    * `.compact-lock` marker held for the body's duration, stale locks
    * reclaimed after `lockTtlMs`. Shared by this compactor and the
    * streaming dedup state compactor
    * ([[graft.streaming.StreamingDedup.compactState]]) — the
    * interleaved-rename hazard is identical for both layouts.
    */
  def withLock[T](fs: org.apache.hadoop.fs.FileSystem, root: Path,
                  lockTtlMs: Long)(body: => T): T = {
    val lock = new Path(root, ".compact-lock")
    if (fs.exists(lock) &&
        fs.getFileStatus(lock).getModificationTime < System.currentTimeMillis() - lockTtlMs)
      fs.delete(lock, false) // stale lock from a crashed run
    val acquired = try { fs.createNewFile(lock) } catch { case _: java.io.IOException => false }
    if (!acquired)
      throw new java.io.IOException(
        s"another compaction run holds $lock; re-run after it finishes (or after its TTL)")
    try body
    finally fs.delete(lock, false): Unit
  }

  private def doCompact(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                        rootPath: Path, targetFileBytes: Long,
                        minFiles: Int): Seq[Report] = {
    // crash recovery: a .retired-X with no live es_index=X means a
    // previous run died between the two renames — the retired copy is
    // the only (complete) copy; restore it before compacting
    fs.listStatus(rootPath).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".retired-"))
      .foreach { retired =>
        val live = new Path(rootPath, retired.getName.stripPrefix(".retired-"))
        if (!fs.exists(live)) {
          if (!fs.rename(retired, live))
            throw new java.io.IOException(s"compaction recovery failed for $retired")
        } else fs.delete(retired, true) // publish completed; drop leftovers
      }
    val parts = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("es_index="))
    parts.flatMap { part =>
      val files = fs.listStatus(part).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      if (files.size <= minFiles || bytes == 0) None
      else {
        val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
        val staging = new Path(part.getParent, s".compact-${part.getName}")
        fs.delete(staging, true)
        spark.read.parquet(part.toString)
          .repartition(n)
          .write.mode("overwrite").parquet(staging.toString)
        val retired = new Path(part.getParent, s".retired-${part.getName}")
        fs.delete(retired, true)
        if (!fs.rename(part, retired))
          throw new java.io.IOException(s"compaction failed to retire $part")
        if (!fs.rename(staging, part)) {
          fs.rename(retired, part) // roll back; partition never vanished
          throw new java.io.IOException(s"compaction failed to publish $staging")
        }
        fs.delete(retired, true)
        val after = fs.listStatus(part).count(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        Some(Report(part.getName.stripPrefix("es_index="), files.size, after, bytes))
      }
    }
  }
}
