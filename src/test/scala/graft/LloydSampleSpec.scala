package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingDedup, StreamingIvf}

/** Persisted Lloyd sample (round-17 — the last corpus-sized term in
  * the steady cadence bill): the reindex epilogue's sampled refine must
  * stop reading the whole merged generation to materialize its
  * hash-mod sample, WITHOUT changing what the refine computes. The
  * sidecar is sound because it is the SAME deterministic hash-mod
  * predicate maintained incrementally: append writes its increment's
  * 1-in-B rows, compaction tracks the main store's horizon, and the
  * refine subfilters to mod' with B | mod' — so the base it refines on
  * is row-identical to what the direct corpus filter at mod' yields.
  * These tests pin:
  *
  *  - sidecar == direct filter, row-for-row, across appends AND the
  *    re-layout merge;
  *  - refine from the sidecar == refine from the corpus filter,
  *    bit-exact (identical row set; the fixture's components are
  *    dyadic rationals so partial-sum tree shape cannot produce ULP
  *    drift between the two physical reads);
  *  - every doubt path falls back to the direct filter: no sidecar,
  *    a diverged dir-id set (a sample dir lost before compaction
  *    clamps the two stores to different horizons), an empty sidecar,
  *    a base rate coarser than the wanted rate, mixed non-dividing
  *    rates — the poisoned-sidecar trick makes consumption visible;
  *  - the cadence composition: maybeReindex consumes the sidecar,
  *    publishes the refined generation, and leaves the sidecar VALID
  *    for the next firing (reindex moves rows between lists, never
  *    changes the (vec_id, vec) membership the sample covers).
  */
class LloydSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val Dims = 8

  /** Two planted clusters around axes 0 and 1. All components are
    * DYADIC rationals (multiples of 0.125): any summation tree over
    * them is exact at these magnitudes, so the M-step mean is
    * bit-identical regardless of which physical file the rows came
    * from — the property the bit-exact parity test leans on. n=800,
    * K=2 puts lloydSampleMod exactly at the sidecar's base rate 8.
    */
  private def vectors: DataFrame = {
    import spark.implicits._
    (0L until 800L).map { i =>
      val v = Array.fill(Dims)(0.0)
      val axis = (i % 2L).toInt
      v(axis) = 1.0
      v(2 + ((i / 2) % 6L).toInt) = 0.125 * (1 + (i % 3L))
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def cents: DataFrame = {
    import spark.implicits._
    Seq(0, 1).map { a =>
      val v = Array.fill(Dims)(0.0); v(a) = 1.0; (a.toLong, v.toSeq)
    }.toDF("c_id", "c_vec")
  }

  /** Ingest `vectors` as 4 batches with a re-layout at batch 2 (the
    * maintainer flow in miniature); `fullRelayout` then merges
    * everything to one generation dir, the state maybeReindex sees.
    */
  private def buildStore(tag: String, sampleEvery: Long): String = {
    val idx = Files.createTempDirectory(s"graft_lsample_$tag").toString + "/idx"
    val batched = vectors.withColumn("b", pmod(col("vec_id"), lit(4L)))
    (0L until 4L).foreach { b =>
      StreamingIvf.appendBatchPersistent(idx,
        batched.filter(col("b") === b).drop("b"), b, cents,
        sampleEvery = sampleEvery): Unit
      StreamingIvf.maybeRelayout(spark, idx, b, every = 2)
    }
    idx
  }

  private def fullRelayout(idx: String): Unit =
    StreamingIvf.relayoutState(spark, idx, 3L)

  private def mergedDir(idx: String): Path = {
    val root = new Path(idx)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .sortBy(_.getName.stripPrefix("batch=").toLong).last
  }

  private def idsOf(df: DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq

  private def centsOf(df: DataFrame): Seq[(Long, Seq[Double])] =
    df.orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  test("sidecar == direct hash-mod filter, across appends and the re-layout merge") {
    val idx = buildStore("parity", sampleEvery = 8L)
    val sr = StreamingIvf.lloydSampleRoot(idx)
    val store = spark.read.parquet(idx).select("vec_id", "vec")
    val direct = idsOf(store.filter(pmod(xxhash64(col("vec_id")), lit(8L)) === 0L))
    def sidecarIds(): Seq[Long] =
      idsOf(spark.read.option("basePath", sr.toString).parquet(sr.toString))
    assert(sidecarIds() == direct, "pre-merge: union of sample batch dirs")
    fullRelayout(idx)
    assert(sidecarIds() == direct, "post-merge: one compacted sample dir")
    val sidecar = spark.read.parquet(new Path(sr, mergedDir(idx).getName).toString)
    assert(sidecar.select("smod").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(8L))
    assert(StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx)).isDefined)
  }

  test("refine from the sidecar == refine from the corpus filter, bit-exact") {
    val idx = buildStore("refine", sampleEvery = 8L)
    fullRelayout(idx)
    val dir = mergedDir(idx)
    val rows = spark.read.parquet(dir.toString).select(col("vec_id"), col("vec"))
    // n=800, K=2: wanted mod = 800 / max(100, 8) = 8 = the base rate,
    // so the sidecar path subfilters at mod' = 8 and refines the
    // IDENTICAL row set the direct filter yields
    val persisted = StreamingIvf.persistedLloydSample(spark, idx, dir)
    assert(persisted.isDefined)
    val fromSidecar = centsOf(StreamingIvf.lloydRefine(rows, cents, 2,
      persisted = persisted))
    val fromFilter = centsOf(StreamingIvf.lloydRefine(rows, cents, 2))
    assert(fromSidecar == fromFilter)
    // and the refine moved: centroids differ from the seeds
    assert(fromSidecar != centsOf(cents))
  }

  test("no sidecar (sampleEvery <= 1): pre-r17 stores fall back") {
    val idx = buildStore("nosidecar", sampleEvery = 0L)
    val sr = StreamingIvf.lloydSampleRoot(idx)
    val hfs = sr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(sr))
    fullRelayout(idx)
    assert(StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx)).isEmpty)
  }

  test("a lost sample dir clamps the two compactions apart: validity refuses") {
    val idx = buildStore("diverged", sampleEvery = 8L)
    val sr = StreamingIvf.lloydSampleRoot(idx)
    val hfs = sr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate one append that bypassed the sidecar write: the main
    // compaction merges {1,2,3} -> batch=3 while the sample compaction
    // clamps to its largest surviving id -> batch=2; the twin is
    // missing and the id sets differ
    assert(hfs.delete(new Path(sr, "batch=3"), true))
    fullRelayout(idx)
    assert(StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx)).isEmpty)
  }

  test("doubt paths inside the refine fall back to the direct filter") {
    import spark.implicits._
    val idx = buildStore("doubt", sampleEvery = 8L)
    fullRelayout(idx)
    val rows = spark.read.parquet(mergedDir(idx).toString)
      .select(col("vec_id"), col("vec"))
    val baseline = centsOf(StreamingIvf.lloydRefine(rows, cents, 1))
    // POISONED sidecars: all-zero vectors. If any of these were
    // consumed the refined centroids would collapse toward zero, so
    // equality with the direct-filter run proves the fallback fired.
    val zeroVec = Seq.fill(Dims)(0.0)
    def poisoned(smod: Long): DataFrame =
      (0L until 100L).map(i => (i, zeroVec, smod))
        .toDF("vec_id", "vec", "smod")
    // base rate coarser than the wanted rate (smod 16 > mod 8)
    assert(centsOf(StreamingIvf.lloydRefine(rows, cents, 1,
      persisted = Some(poisoned(16L)))) == baseline)
    // mixed rates that do not divide (6 does not divide 8)
    assert(centsOf(StreamingIvf.lloydRefine(rows, cents, 1,
      persisted = Some(poisoned(8L).unionAll(poisoned(6L))))) == baseline)
    // empty sidecar frame
    assert(centsOf(StreamingIvf.lloydRefine(rows, cents, 1,
      persisted = Some(poisoned(8L).limit(0)))) == baseline)
  }

  test("mixed DIVIDING rates are usable: subfilter at mod' lands the direct sample") {
    val idx = buildStore("mixed", sampleEvery = 8L)
    fullRelayout(idx)
    val rows = spark.read.parquet(mergedDir(idx).toString)
      .select(col("vec_id"), col("vec"))
    // a sidecar persisted at rate 4 for its early batches (ids < 400)
    // and rate 8 later — each row sampled ONCE at its own batch's
    // rate, the production shape. The subfilter at mod' = 8 selects
    // {h%8==0} from both regimes, exactly the direct mod-8 sample
    val mixed = rows.filter(col("vec_id") < 400L &&
        pmod(xxhash64(col("vec_id")), lit(4L)) === 0L)
      .withColumn("smod", lit(4L))
      .unionAll(rows.filter(col("vec_id") >= 400L &&
          pmod(xxhash64(col("vec_id")), lit(8L)) === 0L)
        .withColumn("smod", lit(8L)))
    val got = centsOf(StreamingIvf.lloydRefine(rows, cents, 1,
      persisted = Some(mixed)))
    assert(got == centsOf(StreamingIvf.lloydRefine(rows, cents, 1)))
  }

  test("backfill: a pre-r17 store adopts the sidecar with one corpus read") {
    val idx = buildStore("backfill", sampleEvery = 0L)
    fullRelayout(idx)
    assert(StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx)).isEmpty)
    StreamingIvf.backfillLloydSample(spark, idx)
    val persisted = StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx))
    assert(persisted.isDefined)
    val store = spark.read.parquet(idx).select("vec_id", "vec")
    assert(idsOf(persisted.get) ==
      idsOf(store.filter(pmod(xxhash64(col("vec_id")), lit(8L)) === 0L)))
    // idempotent: a second backfill rewrites nothing (twin exists)
    StreamingIvf.backfillLloydSample(spark, idx)
    assert(StreamingIvf.persistedLloydSample(spark, idx, mergedDir(idx)).isDefined)
  }

  test("cadence composition: maybeReindex consumes the sidecar and leaves it valid") {
    val idx = buildStore("cadence", sampleEvery = 8L)
    StreamingIvf.ensureQuantizer(spark, idx, cents)
    val stats = StreamingIvf.maybeReindex(spark, idx, batchId = 4,
      relayoutEvery = 2, everyRelayouts = 2, minChurnBp = 2000L)
    assert(stats.isDefined, "the cadence must fire at batch 4")
    assert(StreamingIvf.currentQuantizerGen(spark, idx).contains(1L))
    // the reindex moved rows BETWEEN lists (or not) but never changed
    // the (vec_id, vec) membership: the sidecar still covers the store
    val dir = mergedDir(idx)
    val persisted = StreamingIvf.persistedLloydSample(spark, idx, dir)
    assert(persisted.isDefined)
    val store = spark.read.parquet(idx).select("vec_id", "vec")
    assert(idsOf(persisted.get) ==
      idsOf(store.filter(pmod(xxhash64(col("vec_id")), lit(8L)) === 0L)))
  }
}
