package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IvfIndex, Similarity}

/** Selective reindex (VERDICT r12 item 2): rewrite ONLY the lists the
  * q290 churn audit flags, leave zero-churn lists byte-for-byte
  * untouched, and keep probes exact. Fixture: 4 orthogonal clusters;
  * the refined quantizer SWAPS centroids 0 and 1 (churn 10000 bp for
  * lists 0/1) and keeps 2 and 3 (churn 0) — so the mixed-generation
  * index must be ROW-IDENTICAL to a full rebuild, and the bytes bill
  * must cover exactly the two rewritten lists.
  */
class IvfReindexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Dims = 64
  private val PerCluster = 25

  private def axis(c: Int, jitterDim: Int): Seq[Float] = {
    val v = Array.fill(Dims)(0.0f)
    v(c) = 1.0f
    v(jitterDim) = 0.01f
    v.toSeq
  }

  private def vectors: DataFrame = {
    import spark.implicits._
    (0 until 4).flatMap { c =>
      (0 until PerCluster).map { i =>
        (c * 100L + i, axis(c, 8 + (i % 50)))
      }
    }.toDF("vec_id", "vec")
  }

  private def cents(order: Seq[Int]): DataFrame = {
    import spark.implicits._
    order.zipWithIndex.map { case (ax, cid) =>
      val v = Array.fill(Dims)(0.0f); v(ax) = 1.0f
      (cid.toLong, v.toSeq)
    }.toDF("c_id", "c_vec")
  }

  private val oldCents = Seq(0, 1, 2, 3) // c_id i -> axis i
  private val newCents = Seq(1, 0, 2, 3) // refined: 0 and 1 swapped

  private def buildIndex(path: String): Unit =
    Similarity.persistIvfIndex(
      Similarity.ivfAssign(vectors, cents(oldCents)), path)

  private def probeRows(path: String): Seq[(Long, Int, Long, Double)] = {
    val q = vectors.filter(col("vec_id").isin(0L, 100L, 200L))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val probes = Similarity.ivfProbes(q, cents(newCents), nprobe = 2)
    Similarity.probePersistedIvf(spark, path, probes, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  private def listFiles(path: String, list: Long): Set[String] = {
    val d = new Path(s"$path/list_id=$list")
    val hfs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.listStatus(d).map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
  }

  test("high-churn lists rewrite, zero-churn lists stay byte-identical, probes match a full rebuild") {
    val base = Files.createTempDirectory("graft_reindex").toString
    val mixed = s"$base/mixed"
    val rebuilt = s"$base/rebuilt"
    buildIndex(mixed)
    val untouchedBefore = Seq(2L, 3L).map(l => l -> listFiles(mixed, l)).toMap

    val stats = IvfIndex.reindexLists(spark, mixed, cents(newCents), minChurnBp = 5000L)
    assert(stats.listsTotal == 4L)
    assert(stats.listsRewritten == 2L, stats)
    assert(stats.rowsRewritten == 2L * PerCluster, stats)
    assert(stats.rowsMoved == 2L * PerCluster, stats) // the swap moves every member
    assert(stats.bytesStaged > 0L)

    // zero-churn lists: same file names, same mtimes — never rewritten
    Seq(2L, 3L).foreach { l =>
      assert(listFiles(mixed, l) == untouchedBefore(l), s"list $l was touched")
    }

    // the kept lists had zero churn, so mixed == full rebuild exactly
    Similarity.persistIvfIndex(
      Similarity.ivfAssign(vectors, cents(newCents)), rebuilt)
    assert(probeRows(mixed) == probeRows(rebuilt))

    // every vector still lives in exactly one list
    val all = spark.read.parquet(mixed)
    assert(all.count() == 4L * PerCluster)
    assert(all.select("vec_id").distinct().count() == 4L * PerCluster)

    // idempotent: a second run with the same refined centroids finds
    // zero churn everywhere and rewrites nothing
    val again = IvfIndex.reindexLists(spark, mixed, cents(newCents), minChurnBp = 5000L)
    assert(again.listsRewritten == 0L, again)
  }

  test("threshold above every list's churn rewrites nothing") {
    val path = Files.createTempDirectory("graft_reindex_noop").toString + "/idx"
    buildIndex(path)
    val before = (0L to 3L).map(l => l -> listFiles(path, l)).toMap
    val stats = IvfIndex.reindexLists(spark, path, cents(newCents), minChurnBp = 10001L)
    assert(stats.listsRewritten == 0L && stats.bytesStaged == 0L)
    (0L to 3L).foreach(l => assert(listFiles(path, l) == before(l)))
  }

  test("crash inside the publish window rolls forward to the completed reindex") {
    val base = Files.createTempDirectory("graft_reindex_crash").toString
    val done = s"$base/done"
    val crashed = s"$base/crashed"
    buildIndex(done)
    buildIndex(crashed)
    IvfIndex.reindexLists(spark, done, cents(newCents), minChurnBp = 5000L)
    val want = spark.read.parquet(done)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // replicate the exact mid-crash state: staging written, marker
    // committed, ONE of the two retires done, zero file moves
    val root = new Path(crashed)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val assigned = Similarity.ivfAssign(vectors, cents(newCents))
      .withColumnRenamed("list_id", "new_list")
    val movers = spark.read.parquet(crashed)
      .select(col("vec_id"), col("list_id").cast("long").as("cur_list"))
      .join(assigned.select(col("vec_id"), col("vec"), col("new_list")), "vec_id")
      .filter(col("cur_list").isin(0L, 1L))
      .select(col("vec_id"), col("vec"), col("new_list").as("list_id"))
    movers.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$crashed/.reindex-staging")
    val out = hfs.create(new Path(root, ".reindex-commit"), true)
    out.write("424242\n0\n1".getBytes(StandardCharsets.UTF_8))
    out.close()
    assert(hfs.rename(new Path(root, "list_id=0"), new Path(root, ".retired-list_id=0")))

    IvfIndex.recoverReindex(spark, crashed)

    val got = spark.read.parquet(crashed)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // no litter: marker, staging, retired dirs all gone
    val names = hfs.listStatus(root).map(_.getPath.getName).toSet
    assert(!names.exists(n => n.startsWith(".reindex") || n.startsWith(".retired-")), names)
    assert(probeRows(crashed) == probeRows(done))
  }

  test("crash between the marker delete and the retired-dir cleanup: litter disposed, rows intact") {
    // the crash window the round-14 publish REORDERING creates (ADVICE
    // r13 high — marker now goes first, so the worst reachable state is
    // post-commit litter): live dirs fully published, marker gone,
    // retired twins stranded. Recovery must dispose of the twins
    // without touching a row.
    val base = Files.createTempDirectory("graft_reindex_litter").toString
    val idx = s"$base/idx"
    buildIndex(idx)
    IvfIndex.reindexLists(spark, idx, cents(newCents), minChurnBp = 5000L)
    val want = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val root = new Path(idx)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // strand post-commit litter: copy the published lists to retired
    // twins as if cleanup died mid-loop after the marker was deleted
    Seq(0L, 1L).foreach { l =>
      org.apache.hadoop.fs.FileUtil.copy(hfs, new Path(root, s"list_id=$l"),
        hfs, new Path(root, s".retired-list_id=$l"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    IvfIndex.recoverReindex(spark, idx)
    val got = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    val names = hfs.listStatus(root).map(_.getPath.getName).toSet
    assert(!names.exists(n => n.startsWith(".reindex") || n.startsWith(".retired-")), names)
  }

  test("replay on a fully-published store with a stale marker and no retired twins keeps every row") {
    // the exact state ADVICE r13 showed the OLD cleanup ordering could
    // strand (marker survives, twins and staging already deleted): the
    // old replay re-retired the published lists and then destroyed
    // them. The fixed ordering makes the state unreachable AND the
    // rx<commitId> republish check makes even a hand-built instance of
    // it safe — pinned here.
    val base = Files.createTempDirectory("graft_reindex_stale").toString
    val idx = s"$base/idx"
    buildIndex(idx)
    IvfIndex.reindexLists(spark, idx, cents(newCents), minChurnBp = 5000L)
    val want = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val root = new Path(idx)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the published rx files' commit id is the one the marker must name
    val commitId = hfs.listStatus(new Path(root, "list_id=0"))
      .map(_.getPath.getName).filter(_.startsWith("rx"))
      .head.stripPrefix("rx").takeWhile(_ != '-')
    val out = hfs.create(new Path(root, ".reindex-commit"), true)
    out.write(s"$commitId\n0\n1".getBytes(StandardCharsets.UTF_8))
    out.close()
    IvfIndex.recoverReindex(spark, idx)
    val got = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    val names = hfs.listStatus(root).map(_.getPath.getName).toSet
    assert(!names.exists(n => n.startsWith(".reindex") || n.startsWith(".retired-")), names)
  }

  test("drained list: publish recreates its live dir, so a stranded twin can never resurrect rows") {
    // ADVICE r14 (medium): a rewritten list whose members ALL reassign
    // away stages nothing under its own id. Publish must still recreate
    // its (empty) live dir before the marker goes — otherwise a crash
    // between the marker delete and the twin cleanup strands a
    // .retired- twin with NO live dir, and the no-marker recovery path
    // "defensively restores" it, resurrecting rows already republished
    // into other lists (duplicate vectors: probes return them twice,
    // churn audits double-count).
    val base = Files.createTempDirectory("graft_reindex_drain").toString
    val idx = s"$base/idx"
    buildIndex(idx)
    val hfs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep a copy of list 0's pre-reindex files to forge the stranded twin
    org.apache.hadoop.fs.FileUtil.copy(hfs, new Path(idx, "list_id=0"),
      hfs, new Path(base, "saved_list0"), false,
      spark.sparkContext.hadoopConfiguration)

    // drain quantizer: c0 re-seats to an axis NO vector occupies, c1 to
    // the 0/1 bisector — cluster 0's rows all re-home to list 1 (churn
    // 10000 bp), clusters 1-3 keep their argmax (churn 0), and nothing
    // lands back in list 0
    import spark.implicits._
    val drainCents = {
      def at(pairs: (Int, Float)*): Seq[Float] = {
        val v = Array.fill(Dims)(0.0f); pairs.foreach { case (i, x) => v(i) = x }; v.toSeq
      }
      Seq((0L, at(4 -> 1.0f)), (1L, at(0 -> 0.7071f, 1 -> 0.7071f)),
        (2L, at(2 -> 1.0f)), (3L, at(3 -> 1.0f))).toDF("c_id", "c_vec")
    }
    val stats = IvfIndex.reindexLists(spark, idx, drainCents, minChurnBp = 5000L)
    assert(stats.listsRewritten == 1L && stats.rowsMoved == PerCluster.toLong, stats)

    // the fix's direct observable: the drained list's live dir exists
    // (empty) even though no staged file landed in it
    assert(hfs.exists(new Path(idx, "list_id=0")), "drained live dir missing")
    assert(hfs.listStatus(new Path(idx, "list_id=0")).isEmpty)
    val want = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.length == 4 * PerCluster)
    assert(want.count(_._2 == 1L) == 2 * PerCluster) // cluster 0 re-homed

    // strand the crash-window litter: cleanup died after the marker
    // delete, leaving the drained list's retired twin behind
    org.apache.hadoop.fs.FileUtil.copy(hfs, new Path(base, "saved_list0"),
      hfs, new Path(idx, ".retired-list_id=0"), false,
      spark.sparkContext.hadoopConfiguration)
    IvfIndex.recoverReindex(spark, idx)

    val got = spark.read.parquet(idx)
      .select(col("vec_id"), col("list_id").cast("long")).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "recovery resurrected drained rows")
    assert(got.map(_._1).distinct.length == got.length, "duplicate vectors")
    val names = hfs.listStatus(new Path(idx)).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith(".retired-")), names)
  }

  test("staging with no marker rolls back: index untouched") {
    val path = Files.createTempDirectory("graft_reindex_rb").toString + "/idx"
    buildIndex(path)
    val before = (0L to 3L).map(l => l -> listFiles(path, l)).toMap
    vectors.limit(5).withColumn("list_id", lit(0L))
      .write.parquet(s"$path/.reindex-staging/list_id=0")
    IvfIndex.recoverReindex(spark, path)
    val root = new Path(path)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(new Path(root, ".reindex-staging")))
    (0L to 3L).foreach(l => assert(listFiles(path, l) == before(l)))
  }
}
