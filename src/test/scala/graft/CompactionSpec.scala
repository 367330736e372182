package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Compaction

/** Small-files compaction over a partitionBy("es_index") sink layout. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[4]", "4")
  import spark.implicits._

  test("compaction merges many small files; rows and values unchanged") {
    val root = Files.createTempDirectory("graft_compact").toString
    // simulate 10 micro-batch appends into two partitions
    (1 to 10).foreach { b =>
      Seq((b.toLong, s"doc-$b", "gorouter-2024-01-01"), (b.toLong, s"doc-$b", "gorouter-2024-01-02"))
        .toDF("n", "doc", "es_index")
        .repartition(2)
        .write.mode("append").partitionBy("es_index").parquet(root)
    }
    val before = spark.read.parquet(root).orderBy("es_index", "n", "doc").collect()

    val reports = Compaction.compact(spark, root, targetFileBytes = 1L << 30)
    assert(reports.size === 2)
    reports.foreach { r =>
      assert(r.filesBefore > r.filesAfter)
      assert(r.filesAfter === 1) // 1 GiB target swallows everything
    }

    val after = spark.read.parquet(root).orderBy("es_index", "n", "doc").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("partitions at or under minFiles are left alone") {
    val root = Files.createTempDirectory("graft_compact_small").toString
    Seq((1L, "gorouter-2024-01-01")).toDF("n", "es_index")
      .coalesce(1).write.mode("overwrite").partitionBy("es_index").parquet(root)
    assert(Compaction.compact(spark, root).isEmpty)
  }

  test("crash recovery: a retired-but-unpublished partition is restored on the next run") {
    val root = Files.createTempDirectory("graft_compact_crash").toString
    Seq((1L, "gorouter-2024-01-01"), (2L, "gorouter-2024-01-01"))
      .toDF("n", "es_index")
      .write.mode("overwrite").partitionBy("es_index").parquet(root)
    // simulate a crash between the two renames: live dir gone, only the
    // retired copy remains
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(root, "es_index=gorouter-2024-01-01")
    val retired = new org.apache.hadoop.fs.Path(root, ".retired-es_index=gorouter-2024-01-01")
    assert(fs.rename(live, retired))
    assert(!fs.exists(live)) // the crash window: partition invisible

    Compaction.compact(spark, root)
    assert(spark.read.parquet(root).count() === 2L) // restored
    assert(!fs.exists(retired))
  }

  test("a held lock fails a second compactor fast; a stale lock is reclaimed") {
    val root = Files.createTempDirectory("graft_compact_lock").toString
    (1 to 5).foreach { b =>
      Seq((b.toLong, "gorouter-2024-01-01")).toDF("n", "es_index")
        .write.mode("append").partitionBy("es_index").parquet(root)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(root, ".compact-lock")
    assert(fs.createNewFile(lock)) // another run holds the root
    intercept[java.io.IOException] { Compaction.compact(spark, root) }
    assert(fs.exists(lock)) // the loser must not release the winner's lock

    // a crashed run's lock ages past the TTL and is reclaimed
    fs.setTimes(lock, System.currentTimeMillis() - 1000L, -1)
    val reports = Compaction.compact(spark, root,
      targetFileBytes = 1L << 30, lockTtlMs = 500L)
    assert(reports.nonEmpty)
    assert(!fs.exists(lock)) // released after the run
  }

  test("target size splits output into multiple files") {
    val root = Files.createTempDirectory("graft_compact_split").toString
    (1 to 5).foreach { _ =>
      spark.range(20000).select(col("id").as("n"), lit("gorouter-2024-01-03").as("es_index"))
        .repartition(4)
        .write.mode("append").partitionBy("es_index").parquet(root)
    }
    val rep = Compaction.compact(spark, root, targetFileBytes = 64 << 10).head
    assert(rep.filesAfter > 1) // 64 KiB target forces a split
    assert(spark.read.parquet(root).count() === 100000L)
  }
}
