package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Training-data-pipeline operators (SURVEY §7.4 north-star scope):
  * text analysis, dedup (exact / MinHash-LSH / n-gram Jaccard /
  * SimHash / embedding-cosine), ANN similarity search, multimodal
  * plumbing. Every query has a DuckDB oracle generated from the same
  * constants so signatures/hashes are engine-identical.
  */
object QueriesTraining {

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- text

  /** Tokenization + BPE-ish counting (SURVEY §7.4 text analysis). */
  // per-row-expensive text stages fan single-split local scans out to
  // full parallelism first (no-op at real scale — see Dedup.fanOut)
  private def docsFanned(spark: SparkSession, dir: String): DataFrame =
    Dedup.fanOut(Tables(spark, dir, "documents"), col("doc_id"))

  private val qTextTokens: Q = (spark, dir) => {
    docsFanned(spark, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_tok_len"))
      .orderBy("doc_id")
  }

  /** q122: BPE vocabulary induction — the first K merge rules of a
    * subword tokenizer, learned distributed (corpus touched once by
    * the word-frequency pass; each merge iteration is vocab-sized).
    * See [[graft.text.Bpe]] for the full scale argument.
    */
  private val qBpeMerges: Q = (spark, dir) =>
    graft.text.Bpe.train(Tables(spark, dir, "documents"), col("text"))

  /** q130: the learned vocabulary APPLIED back to the corpus
    * ([[graft.text.Bpe.tokenizedCounts]]) — per doc, word count vs
    * subword count under the K-merge segmentation. The induce→apply
    * pair is the full tokenizer lifecycle; the oracle nests the same
    * K-stage chain and joins its final state to the documents.
    */
  private val qBpeApply: Q = (spark, dir) =>
    graft.text.Bpe.tokenizedCounts(Tables(spark, dir, "documents"), col("text"))

  private val DsirBuckets = 1024

  /** q123: DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-document
    * log p_target(x) − log p_raw(x) under hashed-n-gram bag models —
    * the score DSIR feeds into Gumbel/weighted resampling to tilt a
    * raw crawl toward a target domain (here: the `lang = 'en'` slice;
    * the resampling step itself is q90's Efraimidis–Spirakis operator,
    * composed downstream).
    *
    * The hashing is the whole scale story: uni+bigram features map
    * into a FIXED [[DsirBuckets]]-bucket space, so both LMs are
    * B-row tables regardless of corpus size — they aggregate with
    * map-side combine and broadcast back to the feature stream; the
    * only corpus-sized shuffle is the per-doc score aggregation on
    * doc_id. Token arrays materialize once and feed the unigram and
    * bigram branches (the tokenize subtree never re-executes).
    * Laplace (+1) smoothing; round(·,6) + checker rel-tol rides the
    * summation-order ULPs like q53/q83.
    */
  private val qDsir: Q = (spark, dir) => {
    val tk = Dedup.materialize(
      docsFanned(spark, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokens(lower(col("text"))).as("t")))
    val uni = tk.select(col("doc_id"), col("lang"), explode(col("t")).as("gram"))
    val bigrams = when(size(col("t")) >= 2,
      transform(sequence(lit(2), size(col("t"))),
        i => concat(element_at(col("t"), i - 1), lit(" "), element_at(col("t"), i))))
      .otherwise(array().cast("array<string>"))
    val big = tk.select(col("doc_id"), col("lang"), explode(bigrams).as("gram"))
    val feats = Dedup.materialize(uni.unionByName(big).withColumn("bucket",
      conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % DsirBuckets))
    // both LMs in ONE bucket-keyed aggregation: B rows out
    val model = feats.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", 1)).as("ct"))
    val totals = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    feats.join(broadcast(model), "bucket")
      .crossJoin(broadcast(totals))
      .withColumn("lw",
        log((col("ct") + 1).cast("double") / (col("nt") + DsirBuckets).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("nr") + DsirBuckets).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), round(sum("lw"), 6).as("dsir_logw"))
      .orderBy("doc_id")
  }

  /** q236: IMPORTANCE-WEIGHT ESS — the diagnostic that decides whether
    * q123's DSIR reweighting is usable: effective sample size
    * (Σw)²/(n·Σw²) of the normalized importance weights, in bp of n.
    * A low ESS means a few documents dominate the resampled mixture
    * (variance blows up); published pipelines gate on exactly this
    * number before trusting importance-sampled data selection.
    *
    * Unlike q123 (per-doc float log-sum under the checker's
    * tolerance), everything here feeds EXACT integer compares, so the
    * hashed-bucket log-ratio settles to micro per BUCKET (order-free
    * per-doc integer sums), the max-shift is an integer, and the one
    * exp per doc runs on bit-identical inputs on both engines.
    *
    * Scale: the q123 chain (gram keys, B-sized model broadcast); the
    * final moments are one map-side-combined aggregate.
    */
  private val qDsirEss: Q = (spark, dir) => {
    val tk = Dedup.materialize(
      docsFanned(spark, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokens(lower(col("text"))).as("t")))
    val uni = tk.select(col("doc_id"), col("lang"), explode(col("t")).as("gram"))
    val bigrams = when(size(col("t")) >= 2,
      transform(sequence(lit(2), size(col("t"))),
        i => concat(element_at(col("t"), i - 1), lit(" "), element_at(col("t"), i))))
      .otherwise(array().cast("array<string>"))
    val big = tk.select(col("doc_id"), col("lang"), explode(bigrams).as("gram"))
    val feats = Dedup.materialize(uni.unionByName(big).withColumn("bucket",
      conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % DsirBuckets))
    val model = feats.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", 1)).as("ct"))
    val totals = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val lw = model.crossJoin(broadcast(totals))
      .select(col("bucket"), expr(
        s"""CAST(round((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $DsirBuckets AS DOUBLE))
           |  - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $DsirBuckets AS DOUBLE))) * 1000000.0) AS BIGINT)""".stripMargin)
        .as("lw_micro"))
    val perDoc = Dedup.materialize(feats.join(broadcast(lw), "bucket")
      .groupBy("doc_id").agg(sum("lw_micro").as("logw_micro")))
    val mx = perDoc.agg(max("logw_micro").as("mx"))
    val w = perDoc.crossJoin(broadcast(mx))
      .select(expr(
        "CAST(round(exp(CAST(logw_micro - mx AS DOUBLE) / 1000000.0) * 1000.0) AS BIGINT)")
        .as("w_milli"), col("mx"))
    w.agg(count(lit(1)).as("n_docs"), first(col("mx")).as("max_logw_micro"),
        sum("w_milli").as("sum_w_milli"),
        sum(col("w_milli") * col("w_milli")).as("sw2"))
      .select(col("n_docs"), col("max_logw_micro"), col("sum_w_milli"),
        expr(
          """CAST(round(CAST(sum_w_milli AS DOUBLE) * CAST(sum_w_milli AS DOUBLE) * 10000.0
            |  / (CAST(n_docs AS DOUBLE) * CAST(sw2 AS DOUBLE))) AS BIGINT)""".stripMargin)
          .as("ess_bp"))
  }

  private val SimhashHamMax = 3
  private val SimhashBands = 4

  /** q138: SimHash near-dup PAIRS by Hamming distance — the Manku et
    * al. (WWW'07) web-dedup design that q23 computes fingerprints
    * for: a pair is near-dup iff hamming(simhash_a, simhash_b) ≤
    * [[SimhashHamMax]], and the pigeonhole principle turns that into
    * a JOIN — split the 32-bit fingerprint into [[SimhashBands]]
    * 8-bit bands; ≤ 3 differing bits can touch at most 3 bands, so
    * every qualifying pair agrees EXACTLY on ≥ 1 band and the
    * candidate join is a plain equi-join on (band index, band value).
    * Exact `bit_count(xor)` verifies candidates only.
    *
    * Scale: fingerprints are one codegen pass (q23); the bands
    * explode ×4; band-value collision groups are the only quadratic
    * exposure and band width (8 bits here, 16 in Manku's 64-bit
    * design) is the occupancy knob — same argument as the SRP/LSH
    * family, integer-exact end to end.
    */
  private val qSimhashDedup: Q = (spark, dir) => {
    val s = Dedup.materialize(docsFanned(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), Dedup.simhash32(col("text")).as("simhash")))
    val b = s.select(col("doc_id"), col("simhash"),
        explode(array((0 until SimhashBands).map(k =>
          struct(lit(k).as("k"),
            expr(s"(simhash >> (8 * $k)) & 255").as("bv"))): _*)).as("bd"))
      .select(col("doc_id"), col("simhash"), col("bd.k"), col("bd.bv"))
    b.select(col("doc_id").as("id_a"), col("simhash").as("ha"), col("k"), col("bv"))
      .join(b.select(col("doc_id").as("id_b"), col("simhash").as("hb"),
        col("k"), col("bv")), Seq("k", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= SimhashHamMax)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** q161: LANGUAGE CONFUSION MATRIX — the label-quality audit that
    * gates trusting either signal: declared `lang` metadata vs the
    * engine's own n-gram detector (q18), counted per (declared,
    * detected) cell with the cell share of its declared row in
    * integer basis points. Diagonal mass = agreement; heavy
    * off-diagonal cells localize which declared labels (or which
    * detector languages) to distrust before filtering a corpus on
    * either.
    *
    * Scale: one detector projection (codegen stopword hits) + one
    * cells-sized aggregate; the row totals join |langs| rows.
    */
  private val qLangConfusion: Q = (spark, dir) => {
    val pred = docsFanned(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
    val cells = pred.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("lang").agg(sum("n").as("row_n"))
    cells.join(rows, "lang")
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("n * 10000 div row_n").as("share_bp"))
      .orderBy("lang", "lang_pred")
  }

  /** q162: SOURCE-OVERLAP MATRIX — corpus-provenance diagnostics: the
    * shingle-level Jaccard between every pair of sources (which feeds
    * dedup priorities and mixture weights — two sources at 0.9
    * overlap should not both get full budget). The quadratic
    * "compare every source pair's shingle sets" collapses to one
    * self-join on SHINGLE keys of the distinct (shingle, source)
    * table: intersections come from co-occurrence counts, unions from
    * per-source totals — output is |sources|² regardless of corpus
    * size, and no shuffle ever carries text.
    */
  private val qSourceOverlap: Q = (spark, dir) => {
    val sg = Dedup.materialize(
      Dedup.shingleTable(Tables(spark, dir, "documents"), "doc_id", "text")
        .join(Tables(spark, dir, "documents").select("doc_id", "source"), "doc_id")
        .select(col("source"), explode_outer(col("sh")).as("g"))
        .distinct())
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sg.select(col("source").as("src_a"), col("g"))
      .join(sg.select(col("source").as("src_b"), col("g")), "g")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("sz").as("sza")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("sz").as("szb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_inter"),
        (col("sza") + col("szb") - col("n_inter")).as("n_union"))
      .withColumn("jaccard_bp", expr("n_inter * 10000 div n_union"))
      .orderBy("src_a", "src_b")
  }

  /** q164: EXACT WEIGHTED MEDIAN per group — the robust-statistics
    * primitive (median price weighted by quantity): the scan-friendly
    * shape aggregates (group, value) → weight sums FIRST (key-sized
    * shuffle with map-side combine), so the cumulative window runs
    * over DISTINCT VALUES per group, not rows — the difference
    * between a window over 10⁹ rows and one over 10⁴ prices at
    * 100 TB. Median = least value whose doubled cumulative weight
    * reaches the group total (the lower weighted median —
    * deterministic, integer end-to-end).
    */
  private val qWeightedMedian: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val vw = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
      .groupBy("l_returnflag", "cents").agg(sum("w").as("wsum"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_returnflag")
    vw.withColumn("cum", sum("wsum").over(wCum))
      .withColumn("tot", sum("wsum").over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min("cents").as("w_median_cents"), max("tot").as("total_weight"))
      .orderBy("l_returnflag")
  }

  private val SetCoverRounds = 3

  /** q163: GREEDY COVERAGE SELECTION — the submodular data-selection
    * primitive (eval-set construction, dedup-aware sampling): pick
    * the document covering the most shingles, remove those shingles,
    * repeat. [[SetCoverRounds]] deterministic rounds (greedy is the
    * canonical (1−1/e) approximation; ties → smallest doc_id), each
    * emitting (round, doc_id, marginal_gain, covered_total).
    *
    * Scale: the corpus-sized (doc, shingle) table is built ONCE; each
    * round is one arg-max aggregate (max_by, map-side combinable) +
    * one broadcast semi-join removing the winner's shingles — the
    * covered set grows by one document's shingles per round, so the
    * broadcast stays document-sized however big the corpus is.
    */
  private val qSetCover: Q = (spark, dir) => {
    val ds = Dedup.materialize(
      Dedup.shingleTable(Tables(spark, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), explode_outer(col("sh")).as("g")).distinct())
    var uncovered = ds
    var coveredTotal = 0L
    val picks = (1 to SetCoverRounds).map { round =>
      val top = uncovered.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .agg(max_by(struct(col("doc_id"), col("gain")),
          struct(col("gain"), (-col("doc_id")).as("nd"))).as("b"))
        .select(col("b.doc_id"), col("b.gain")).collect()(0)
      val (winner, gain) = (top.getLong(0), top.getLong(1))
      coveredTotal += gain
      val winnerShingles = uncovered.filter(col("doc_id") === winner)
        .select(col("g"))
      uncovered = Dedup.materialize(
        uncovered.join(broadcast(winnerShingles), Seq("g"), "left_anti"))
      (round.toLong, winner, gain, coveredTotal)
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.map(p => Row(p._1, p._2, p._3, p._4)), 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("marginal_gain", LongType, nullable = false),
        StructField("covered_total", LongType, nullable = false))))
      .orderBy("round")
  }

  private val NoveltyBatchSize = 50L

  /** q160: CRAWL-INCREMENT NOVELTY RATE — the content-freshness
    * measurement a continuously-crawled corpus runs per increment:
    * what fraction of this batch's shingles has never been seen in
    * any EARLIER batch? (A collapsing novelty rate means the crawl is
    * re-fetching what it already has.) Batches simulated as doc_id
    * ranges ([[NoveltyBatchSize]] docs per increment).
    *
    * Scale: the naive form joins each batch against the union of all
    * prior batches (quadratic re-scans); this reduces the WHOLE
    * history to ONE shuffle — first_batch(shingle) = min(batch) over
    * the corpus — then novelty per batch is a count over (shingle,
    * first_batch) keys. Incremental form: the min-aggregate is
    * mergeable, so yesterday's first-seen table absorbs today's
    * increment in O(delta).
    */
  private val qNovelty: Q = (spark, dir) => {
    val sh = Dedup.shingleTable(
      Tables(spark, dir, "documents"), "doc_id", "text")
      .withColumn("batch", expr(s"doc_id div $NoveltyBatchSize"))
      .select(col("batch"), explode_outer(col("sh")).as("g"))
    val shM = Dedup.materialize(sh.distinct()) // (batch, shingle) pairs
    val firstSeen = shM.groupBy("g").agg(min("batch").as("first_batch"))
    val perBatch = shM.groupBy("batch").agg(count(lit(1)).as("n_shingles"))
    val novel = shM.join(firstSeen, "g")
      .filter(col("batch") === col("first_batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_novel"))
    perBatch.join(novel, Seq("batch"), "left")
      .select(col("batch"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_shingles"))
      .orderBy("batch")
  }

  private val PhashFrame = 32
  private val PhashBands = 4
  private val PhashHamMax = 3L

  /** q157: PERCEPTUAL-HASH media dedup — the image/audio sibling of
    * q138's text SimHash: each payload's first [[PhashFrame]]-byte
    * frame (the q28 sample) reduces to a 32-bit average-hash — bit i
    * set iff 32·bᵢ > Σb, a PURE INTEGER threshold (no float mean), so
    * re-encoded or slightly-corrupted copies that preserve coarse
    * structure land within a small Hamming ball. Near-dup pairs by
    * Hamming ≤ [[PhashHamMax]] via the same pigeonhole banding
    * (4 × 8-bit bands: ≤3 flipped bits cannot touch all 4 bands, so
    * band-equality candidates are EXACT, not probabilistic).
    *
    * Scale: hash is a per-row codegen projection; the self-join keys
    * on (band, 8-bit value) — max 4·256 buckets of hash keys, never
    * payload bytes; verify is an integer popcount on candidates only.
    * (Payload = text bytes on this fixture — the q27/q28 ASCII note.)
    */
  private val qPhashDedup: Q = (spark, dir) => {
    val m = docsFanned(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= PhashFrame)
      .select(col("doc_id"), substring(col("text"), 1, PhashFrame).as("frame"))
    val withSum = m.withColumn("fsum", expr(
      s"aggregate(transform(sequence(1, $PhashFrame), i -> CAST(ascii(substr(frame, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)"))
    val bitTerms = (0 until PhashFrame).map(i =>
      s"(CASE WHEN CAST(ascii(substr(frame, ${i + 1}, 1)) AS BIGINT) * $PhashFrame > fsum THEN ${1L << i} ELSE 0 END)")
      .mkString("\n      + ")
    val h = Dedup.materialize(
      withSum.withColumn("phash", expr(s"CAST($bitTerms AS BIGINT)"))
        .select("doc_id", "phash"))
    val b = h.select(col("doc_id"), col("phash"),
        explode(array((0 until PhashBands).map(k =>
          struct(lit(k).as("k"),
            expr(s"(phash >> (8 * $k)) & 255").as("bv"))): _*)).as("bd"))
      .select(col("doc_id"), col("phash"), col("bd.k"), col("bd.bv"))
    b.select(col("doc_id").as("id_a"), col("phash").as("ha"), col("k"), col("bv"))
      .join(b.select(col("doc_id").as("id_b"), col("phash").as("hb"),
        col("k"), col("bv")), Seq("k", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= PhashHamMax)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  private val PmiWindow = 2
  private val PmiTopK = 40

  /** q137: PMI co-occurrence statistics — the word2vec/GloVe-era
    * corpus measurement: for token pairs co-occurring within
    * ±[[PmiWindow]] positions, pointwise mutual information
    * ln(p(a,b) / (p(a)·p(b))) with the pair distribution from the
    * windowed counts and marginals from the unigram distribution.
    * Top-[[PmiTopK]] pairs by COUNT (integer ordering, pair-string
    * tiebreak — the selection never touches the float PMI).
    *
    * Scale: pairs come straight off the token array (one explode of
    * a per-row transform — no self-join, no window function); the
    * count table shuffles pair KEYS with map-side combine; marginals
    * join only the top-K slice. Both engines fold the same
    * normalized (least, greatest) pair key.
    */
  private val qPmi: Q = (spark, dir) => {
    val tk = Dedup.materialize(
      docsFanned(spark, dir).select(
        TextAnalysis.tokens(lower(col("text"))).as("t")))
    def pairsAt(k: Int) = {
      val t = col("t")
      when(size(t) >= k + 1,
        transform(sequence(lit(1), size(t) - k), i =>
          concat(least(element_at(t, i), element_at(t, i + k)), lit(" "),
            greatest(element_at(t, i), element_at(t, i + k)))))
        .otherwise(array().cast("array<string>"))
    }
    val pairs = tk.select(explode(concat(
      (1 to PmiWindow).map(pairsAt): _*)).as("pair"))
    val topPairs = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(PmiTopK)
    val toks = tk.select(explode(col("t")).as("term"))
    val tc = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val totals = pairs.agg(count(lit(1)).as("np"))
      .crossJoin(toks.agg(count(lit(1)).as("nt")))
    topPairs
      .withColumn("wa", split(col("pair"), " ").getItem(0))
      .withColumn("wb", split(col("pair"), " ").getItem(1))
      .join(tc.select(col("term").as("wa"), col("c").as("ca")), "wa")
      .join(tc.select(col("term").as("wb"), col("c").as("cb")), "wb")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(
        log((col("cnt").cast("double") / col("np")) /
          ((col("ca").cast("double") / col("nt")) *
            (col("cb").cast("double") / col("nt")))), 6))
      .select(col("pair"), col("cnt"), col("pmi"))
      .orderBy(col("cnt").desc, col("pair"))
  }

  /** Quality scoring: punctuation/stopword ratios + composite score. */
  private val qTextQuality: Q = (spark, dir) => {
    docsFanned(spark, dir).select(
        col("doc_id"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic (stopword-hit argmax). */
  private val qTextLangid: Q = (spark, dir) => {
    docsFanned(spark, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: rolling polynomial hash + md5 key. */
  private val qTextFingerprint: Q = (spark, dir) => {
    docsFanned(spark, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- dedup

  /** Exact dedup: hash-groupBy on the normalized-text key. Input is
    * documents ∪ an id-shifted copy of itself so every group has a
    * duplicate to collapse (sf0.01 has no natural exact dups).
    */
  private val qDedupExact: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val dup = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    dup.groupBy(TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("canonical_id"))
      .orderBy("fp")
  }

  private def sigs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSigTable(Tables(spark, dir, "documents"), "doc_id", "text", 16)

  /** MinHash+LSH near-dup candidates with estimated Jaccard. */
  private val qDedupMinhash: Q = (spark, dir) => {
    val cands = Dedup.lshCandidates(sigs(spark, dir), "doc_id", "sig", 4, 4)
    cands.withColumn("est_jaccard", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** q277: the MinHash-LSH dedup chain as ONE Spark-SQL text — the
    * SQL-driveable recipe for the battery's flagship near-dup operator
    * (VERDICT r9 item 5: "expose MinHash-LSH dedup as a SQL recipe").
    * Generated from the SAME constants as [[Dedup]] ([[Dedup.minhashA]]
    * affine family mod 2^31−1, `conv(substr(md5(x),1,8),16,10)` shingle
    * hash ≡ DuckDB `('0x'||substr(md5(x),1,8))::BIGINT`, 4×4 banding,
    * est-Jaccard ≥ 1/2), so it is row-identical to q21_dedup_minhash
    * (SqlTextDedupSpec pins the parity) and shares q21's DuckDB oracle
    * text verbatim.
    *
    * The text declares the BULK shape, not the per-row array form:
    * shingles explode to rows, the 16 min-hashes partial-aggregate
    * map-side and shuffle once on doc_id, and — exactly like
    * [[Dedup.lshCandidates]] — the signature columns are CARRIED
    * through the band-key explode so the MERGE-pinned self-join's two
    * sides canonicalize to the SAME exchange (ReuseExchange: the
    * corpus pass runs once) and est-Jaccard needs no join back to the
    * signature table. A first cut that re-joined `cand` to `sig`
    * re-derived the whole explode+aggregate twice and measured 2.3×
    * q21's cost; this shape benches 1:1 with the Scala chain. The
    * REPARTITION hint mirrors [[Dedup.fanOut]]: local single-split
    * parquet fans out before the per-row-expensive tokenize/shingle/
    * md5 stage; at real scale the scan is already split and the
    * exchange is one no-op-sized shuffle.
    */
  /** Spark-dialect CTE prefix through the per-doc band keys — the
    * Spark twin of the oracle-side `sigBandCtes`, shared by the batch
    * (q277) and incremental (q278) SQL-text recipes. Signature columns
    * ride along into `bands` (see the q277 scaladoc for why).
    *
    * `fanOut` gates the REPARTITION(doc_id) hint — the text-generation
    * twin of [[Dedup.fanOut]]'s guard: a single-split local scan needs
    * the fan-out before the per-row-expensive tokenize/shingle/md5
    * stage, but on an already-split scan the hint is a pure full-
    * corpus TEXT shuffle (measured at the 100× rehearsal point: the
    * hinted text ran 1.66× the Scala chain, the adaptive text restores
    * parity — BASELINE §d round-11). The query closures decide per
    * scan, exactly as the operator does.
    */
  private[graft] def sqlSigBandCtes(fanOut: Boolean): String = {
    val mins = (0 until 16)
      .map(j => s"min((${Dedup.minhashA(j)} * h + ${Dedup.minhashB(j)}) % ${Dedup.MinhashP}) AS m$j")
      .mkString(",\n    ")
    val bandArr = (0 until 4)
      .map { b =>
        val parts = (0 until 4).map(r => s"CAST(m${b * 4 + r} AS STRING)").mkString(", ")
        s"md5(concat_ws('|', '$b', $parts))"
      }
      .mkString("array(\n      ", ",\n      ", ")")
    val hint = if (fanOut) "/*+ REPARTITION(doc_id) */ " else ""
    s"""WITH toks AS (SELECT ${hint}doc_id,
       |    split(trim(text), '\\\\s+') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |    CASE WHEN size(t) >= 3
       |      THEN array_distinct(transform(sequence(0, size(t) - 3),
       |        i -> concat_ws(' ', element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
       |      ELSE array(concat_ws(' ', t)) END AS s
       |  FROM toks),
       |ex AS (SELECT doc_id, CAST(conv(substr(md5(g), 1, 8), 16, 10) AS BIGINT) AS h
       |  FROM sh LATERAL VIEW OUTER explode(s) gen AS g),
       |sig AS (SELECT doc_id,
       |    $mins
       |  FROM ex GROUP BY doc_id),
       |bands AS (SELECT *, band_key
       |  FROM sig LATERAL VIEW explode($bandArr) gen AS band_key)""".stripMargin
  }

  /** The 16-way signature agreement count between join sides `a`/`b` —
    * symmetric, so it serves both the ordered (q277) and the
    * least/greatest-normalized (q278) pair forms.
    */
  private def sqlSigMatches: String = (0 until 16)
    .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END")
    .mkString(" +\n      ")

  private[graft] def sqlDedupText(fanOut: Boolean): String =
    s"""${sqlSigBandCtes(fanOut)}
       |SELECT id_a, id_b, est_jaccard FROM (
       |  SELECT /*+ MERGE(a), MERGE(b) */ DISTINCT
       |    a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST($sqlSigMatches AS DOUBLE) / 16.0 AS est_jaccard
       |  FROM bands a JOIN bands b USING (band_key)
       |  WHERE a.doc_id < b.doc_id)
       |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** True when the documents scan needs the in-text fan-out hint —
    * [[Dedup.fanOut]]'s partition-count guard applied at SQL-text
    * generation time.
    */
  private def docsNeedFanOut(spark: SparkSession, dir: String): Boolean =
    Tables(spark, dir, "documents").rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism

  private val qSqlDedup: Q = (spark, dir) =>
    QueriesAnalytics.sqlVerbatim(spark, dir,
      sqlDedupText(docsNeedFanOut(spark, dir)), Seq("documents"))

  /** q278: the INCREMENTAL dedup recipe as SQL text — q43's semantics
    * (the 25% ingest `doc_id % 4 = 3` deduped against the full corpus
    * snapshot) with q43's physical shape declared in hints: the
    * increment's band rows BROADCAST, the corpus side streams past the
    * hash join with no shuffle and no sort — per-ingest cost is one
    * corpus scan plus work proportional to the increment, the way a
    * 100 TB pipeline actually runs day to day. Row-identical to
    * q43_dedup_incremental (SqlTextDedupSpec) and shares its oracle.
    */
  private[graft] def sqlDedupIncrText(fanOut: Boolean): String =
    s"""${sqlSigBandCtes(fanOut)},
       |inc AS (SELECT * FROM bands WHERE doc_id % 4 = 3)
       |SELECT id_a, id_b, est_jaccard FROM (
       |  SELECT /*+ BROADCAST(b) */ DISTINCT
       |    least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b,
       |    CAST($sqlSigMatches AS DOUBLE) / 16.0 AS est_jaccard
       |  FROM bands a JOIN inc b USING (band_key)
       |  WHERE a.doc_id <> b.doc_id)
       |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  private val qSqlDedupIncr: Q = (spark, dir) =>
    QueriesAnalytics.sqlVerbatim(spark, dir,
      sqlDedupIncrText(docsNeedFanOut(spark, dir)), Seq("documents"))

  /** q280: the dedup recipe as a PARAMETERIZED SQL table function —
    * Spark 4's SQL-defined UDFs (`CREATE FUNCTION … RETURNS TABLE`)
    * let the whole MinHash-LSH chain register as a catalog object a
    * SQL user calls with a threshold: `SELECT * FROM
    * near_dup_pairs(10)` keeps pairs agreeing on ≥ 10 of 16 signature
    * components. The body is the same generated chain as q277 (shared
    * [[sqlSigBandCtes]] / [[sqlSigMatches]]; threshold in sixteenths —
    * est·16 is the exact integer match count, so the parameterized
    * filter sits on an integer boundary, never an IEEE knife-edge).
    * q280 calls it at 8/16 (est ≥ 0.5), so it is row-identical to
    * q21/q277 and shares their oracle; SqlTextDedupSpec additionally
    * calls it at 16/16 and pins the exact-signature subset. The
    * function is TEMPORARY and dropped after eager analysis — the
    * sqlVerbatim catalog-hygiene rule extended to functions.
    */
  private[graft] def sqlDedupTvfDdl(fanOut: Boolean): String =
    s"""CREATE TEMPORARY FUNCTION near_dup_pairs(t16 INT)
       |RETURNS TABLE(id_a BIGINT, id_b BIGINT, est_jaccard DOUBLE) RETURN
       |${sqlSigBandCtes(fanOut)}
       |SELECT id_a, id_b, est_jaccard FROM (
       |  SELECT /*+ MERGE(a), MERGE(b) */ DISTINCT
       |    a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST($sqlSigMatches AS DOUBLE) / 16.0 AS est_jaccard
       |  FROM bands a JOIN bands b USING (band_key)
       |  WHERE a.doc_id < b.doc_id)
       |WHERE est_jaccard * 16.0 >= CAST(t16 AS DOUBLE)""".stripMargin

  private[graft] def sqlDedupTvfCall(spark: SparkSession, dir: String,
                                     sixteenths: Int): DataFrame = {
    val fanOut = docsNeedFanOut(spark, dir)
    Tables(spark, dir, "documents").createOrReplaceTempView("documents")
    try {
      spark.sql(sqlDedupTvfDdl(fanOut))
      spark.sql("SELECT id_a, id_b, est_jaccard " +
        s"FROM near_dup_pairs($sixteenths) ORDER BY id_a, id_b")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS near_dup_pairs")
      spark.catalog.dropTempView("documents"): Unit
    }
  }

  private val qSqlDedupTvf: Q = (spark, dir) => sqlDedupTvfCall(spark, dir, 8)

  /** The SRP bucket id as Spark SQL, generated from the SAME
    * deterministic hyperplane family as [[Similarity.srpBucket]]
    * (literal ±1 arrays from [[Similarity.planeSign]]) over the
    * engine's registered codegen kernels (`vec_dot` — the SQL surface
    * twin of the Scala chain's expressions, so the per-plane dots are
    * bit-identical, not merely close).
    */
  private def sqlSrpBucket(vecExpr: String, planes: Int,
                           planeOffset: Int = 0): String =
    (0 until planes).map { j =>
      val plane = (0 until EmbedDims).map(i =>
        if (Similarity.planeSign(planeOffset + j, i) > 0) "1.0D" else "-1.0D")
        .mkString("array(", ", ", ")")
      s"CASE WHEN vec_dot($vecExpr, $plane) > 0 THEN ${1L << j}L ELSE 0L END"
    }.mkString("(", " +\n      ", ")")

  /** q282: SIMILARITY SEARCH as a PARAMETERIZED SQL table function —
    * the q280 precedent extended from dedup to ANN (VERDICT r10 item
    * 4): `SELECT * FROM near_neighbors(k)` returns the top-k
    * LSH-bucketed cosine neighbors for every query vector, exactly
    * the q26 chain ([[Similarity.knnLsh]]) a SQL user could not
    * otherwise reach. The body is GENERATED from the same constants
    * as the operator — plane count from the corpus footer rows
    * ([[ScaleParams.lshPlanes]], the same value the oracle derives
    * in-SQL), hyperplanes from [[Similarity.planeSign]], dots/norms
    * through the registered `vec_dot`/`vec_norm` codegen kernels — so
    * q282 at k=5 is ROW-IDENTICAL to q26 and shares its oracle
    * (SqlKnnTvfSpec also pins k=1 as the per-query argmax prefix and
    * a large k as the full bucket-mate ranking).
    *
    * Scale shape, declared in the text like q26's plan: one corpus
    * pass computes bucket + norm (the fan-out hint is GENERATED only
    * when the scan is single-split — [[embedsNeedFanOut]], the q277
    * lesson: an unconditional hint is a full-corpus shuffle on an
    * already-split scan), the 10-row query side BROADCASTs, and the
    * rank window partitions by q_id — never a corpus-wide sort, never
    * a nested loop (plan-pinned in the spec).
    */
  /** [[Dedup.fanOut]]'s guard for the embeddings scan, applied at
    * TVF-text generation time (the q277 lesson: an unconditional
    * REPARTITION hint is a full-corpus shuffle once the scan is
    * already split — BASELINE §d round-11).
    */
  private def embedsNeedFanOut(spark: SparkSession, dir: String): Boolean =
    Tables(spark, dir, "embeddings").rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism

  private def embedsFanOutHint(fanOut: Boolean): String =
    if (fanOut) "/*+ REPARTITION(vec_id) */ " else ""

  private[graft] def sqlKnnTvfDdl(planes: Int, fanOut: Boolean): String =
    s"""CREATE TEMPORARY FUNCTION near_neighbors(k INT)
       |RETURNS TABLE(q_id BIGINT, rank INT, vec_id BIGINT, cos DOUBLE) RETURN
       |WITH b AS (SELECT ${embedsFanOutHint(fanOut)}vec_id, embedding AS vec,
       |    vec_norm(embedding) AS nrm,
       |    ${sqlSrpBucket("embedding", planes)} AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, vec AS q_vec, nrm AS qn, bucket
       |  FROM b WHERE vec_id < 10),
       |scored AS (SELECT /*+ BROADCAST(q) */ q.q_id, c.vec_id,
       |    vec_dot(q.q_vec, c.vec) / (q.qn * c.nrm) AS cos
       |  FROM b c JOIN q USING (bucket)
       |  WHERE c.vec_id <> q.q_id AND q.qn > 0 AND c.nrm > 0),
       |ranked AS (SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= k""".stripMargin

  private[graft] def sqlKnnTvfCall(spark: SparkSession, dir: String,
                                   k: Int): DataFrame = {
    val planes = ScaleParams.lshPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val fanOut = embedsNeedFanOut(spark, dir)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    try {
      spark.sql(sqlKnnTvfDdl(planes, fanOut))
      spark.sql("SELECT q_id, rank, vec_id, cos " +
        s"FROM near_neighbors($k) ORDER BY q_id, rank")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS near_neighbors")
      spark.catalog.dropTempView("embeddings"): Unit
    }
  }

  private val qSqlKnnTvf: Q = (spark, dir) => sqlKnnTvfCall(spark, dir, 5)

  /** q283: MULTI-PROBE similarity search as a SQL table function —
    * `near_neighbors_probe(k)` is q282's body with the QUERY side
    * exploded to `planes + 1` probe buckets (own bucket + every
    * Hamming-1 neighbor via XOR masks, [[Similarity.knnLshMultiProbe]]):
    * the recall/cost knob a SQL user turns WITHOUT rebuilding the
    * index. Row-identical to q87 at k=5 and shares its oracle; the
    * corpus side still computes ONE bucket per vector — only the
    * 10-row broadcast side grows by the probe factor (plan-pinned with
    * q282's assertions in SqlKnnTvfSpec).
    */
  private[graft] def sqlKnnProbeTvfDdl(planes: Int, fanOut: Boolean): String = {
    val masks = (0L +: (0 until planes).map(j => 1L << j))
      .map(m => s"${m}L").mkString("array(", ", ", ")")
    s"""CREATE TEMPORARY FUNCTION near_neighbors_probe(k INT)
       |RETURNS TABLE(q_id BIGINT, rank INT, vec_id BIGINT, cos DOUBLE) RETURN
       |WITH b AS (SELECT ${embedsFanOutHint(fanOut)}vec_id, embedding AS vec,
       |    vec_norm(embedding) AS nrm,
       |    ${sqlSrpBucket("embedding", planes)} AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, vec AS q_vec, nrm AS qn,
       |    CAST(bucket ^ mask AS BIGINT) AS bucket
       |  FROM b LATERAL VIEW explode($masks) gen AS mask
       |  WHERE vec_id < 10),
       |scored AS (SELECT /*+ BROADCAST(q) */ q.q_id, c.vec_id,
       |    vec_dot(q.q_vec, c.vec) / (q.qn * c.nrm) AS cos
       |  FROM b c JOIN q USING (bucket)
       |  WHERE c.vec_id <> q.q_id AND q.qn > 0 AND c.nrm > 0),
       |ranked AS (SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= k""".stripMargin
  }

  private[graft] def sqlKnnProbeTvfCall(spark: SparkSession, dir: String,
                                        k: Int): DataFrame = {
    val planes = ScaleParams.lshPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val fanOut = embedsNeedFanOut(spark, dir)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    try {
      spark.sql(sqlKnnProbeTvfDdl(planes, fanOut))
      spark.sql("SELECT q_id, rank, vec_id, cos " +
        s"FROM near_neighbors_probe($k) ORDER BY q_id, rank")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS near_neighbors_probe")
      spark.catalog.dropTempView("embeddings"): Unit
    }
  }

  private val qSqlKnnProbeTvf: Q = (spark, dir) => sqlKnnProbeTvfCall(spark, dir, 5)

  /** q285: IVF similarity search as a SQL table function —
    * `near_neighbors_ivf(k)` completes the TVF index family (LSH
    * q282, multi-probe q283, IVF q285): the q29 chain with the
    * first-√n coarse quantizer, max_by assignment, and 2-probe exact
    * rerank. The assignment uses SQL `max_by` over the broadcast
    * centroid cross — the same one-row-per-vector exchange as the
    * operator (a rank-window spelling would shuffle the corpus×K
    * cross, the anti-pattern [[ivfAssign]]'s scaladoc documents) —
    * and every cosine goes through the `vec_cosine` kernel, so k=5 is
    * row-identical to q29 and shares its oracle. The centroid crosses
    * plan as broadcast nested loops BY DESIGN: scoring every vector
    * against every centroid is the IVF build, and the centroid side
    * is √n-sized.
    */
  private[graft] def sqlKnnIvfTvfDdl(lists: Int, fanOut: Boolean): String =
    s"""CREATE TEMPORARY FUNCTION near_neighbors_ivf(k INT)
       |RETURNS TABLE(q_id BIGINT, rank INT, vec_id BIGINT, cos DOUBLE) RETURN
       |WITH e AS (SELECT ${embedsFanOutHint(fanOut)}vec_id, embedding AS vec
       |  FROM embeddings),
       |c AS (SELECT vec_id AS c_id, vec AS c_vec FROM e WHERE vec_id < $lists),
       |assign AS (SELECT vec_id, best.vec AS vec, best.c_id AS list_id FROM (
       |  SELECT /*+ BROADCAST(c) */ e.vec_id,
       |    max_by(named_struct('vec', e.vec, 'c_id', c.c_id),
       |      struct(vec_cosine(e.vec, c.c_vec), -c.c_id)) AS best
       |  FROM e CROSS JOIN c GROUP BY e.vec_id)),
       |q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 10),
       |probes AS (SELECT q_id, q_vec, list_id FROM (
       |  SELECT /*+ BROADCAST(c) */ q.q_id, q.q_vec, c.c_id AS list_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY vec_cosine(q.q_vec, c.c_vec) DESC, c.c_id) AS crk
       |  FROM q CROSS JOIN c) WHERE crk <= $IvfProbes),
       |ranked AS (SELECT /*+ BROADCAST(p) */ p.q_id, a.vec_id,
       |    vec_cosine(p.q_vec, a.vec) AS cos,
       |    row_number() OVER (PARTITION BY p.q_id
       |      ORDER BY vec_cosine(p.q_vec, a.vec) DESC, a.vec_id) AS rank
       |  FROM probes p JOIN assign a USING (list_id)
       |  WHERE a.vec_id <> p.q_id)
       |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= k""".stripMargin

  private[graft] def sqlKnnIvfTvfCall(spark: SparkSession, dir: String,
                                      k: Int): DataFrame = {
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val fanOut = embedsNeedFanOut(spark, dir)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    try {
      spark.sql(sqlKnnIvfTvfDdl(lists, fanOut))
      spark.sql("SELECT q_id, rank, vec_id, cos " +
        s"FROM near_neighbors_ivf($k) ORDER BY q_id, rank")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS near_neighbors_ivf")
      spark.catalog.dropTempView("embeddings"): Unit
    }
  }

  private val qSqlKnnIvfTvf: Q = (spark, dir) => sqlKnnIvfTvfCall(spark, dir, 5)

  /** q286: EMBEDDING near-dup detection as a PARAMETERIZED SQL table
    * function — `near_dup_vectors(min_cos)` finishes the TVF symmetry
    * (VERDICT r11 item 5): text dedup already had `near_dup_pairs`
    * (q280) and ANN search its index family (q282/q283/q285); this
    * gives the q24/q284 banded-SRP chain the same catalog surface, so
    * a SQL user can sweep the verify threshold without touching Scala.
    * The body is GENERATED from the operators' own constants — band
    * count [[Similarity.EmbedBands]], planes-per-band from the corpus
    * footer rows ([[ScaleParams.srpBandPlanes]], the occupancy rule),
    * hyperplanes from [[Similarity.planeSign]] per band family, dots/
    * norms through the registered `vec_dot`/`vec_norm` codegen
    * kernels — so the call at [[Similarity.NearDupCos]] is
    * ROW-IDENTICAL to q24 (bit-exact cosines) and shares its oracle.
    * SqlKnnTvfSpec pins the threshold boundary (tighter threshold ==
    * exact filter of the looser result) and the plan shape.
    *
    * Scale shape, declared in the text like q24's plan: ONE corpus
    * pass computes the banded keys (MERGE-pinned self-join → both
    * sides canonicalize to the same exchange, ReuseExchange — the
    * q277 lesson), the fan-out hint is generated only when the scan
    * is single-split ([[embedsNeedFanOut]]), and the exact-cosine
    * verify runs on candidates only.
    */
  private[graft] def sqlEmbedDedupTvfDdl(planes: Int, fanOut: Boolean): String = {
    val bandKeys = (0 until Similarity.EmbedBands).map { t =>
      s"(${t.toLong << planes}L + ${sqlSrpBucket("vec", planes, t * planes)})"
    }.mkString("array(\n      ", ",\n      ", ")")
    s"""CREATE TEMPORARY FUNCTION near_dup_vectors(min_cos DOUBLE)
       |RETURNS TABLE(id_a BIGINT, id_b BIGINT, cos DOUBLE) RETURN
       |WITH e AS (SELECT ${embedsFanOutHint(fanOut)}vec_id, embedding AS vec,
       |    vec_norm(embedding) AS nrm
       |  FROM embeddings),
       |k AS (SELECT vec_id, bucket
       |  FROM e LATERAL VIEW explode($bandKeys) gen AS bucket),
       |cand AS (SELECT /*+ MERGE(a), MERGE(b) */ DISTINCT
       |    a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM k a JOIN k b USING (bucket) WHERE a.vec_id < b.vec_id),
       |pairs AS (SELECT id_a, id_b,
       |    vec_dot(ea.vec, eb.vec) / (ea.nrm * eb.nrm) AS cos
       |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
       |            JOIN e eb ON eb.vec_id = cand.id_b)
       |SELECT id_a, id_b, cos FROM pairs WHERE cos >= min_cos""".stripMargin
  }

  private[graft] def sqlEmbedDedupTvfCall(spark: SparkSession, dir: String,
                                          minCos: Double): DataFrame = {
    val planes = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val fanOut = embedsNeedFanOut(spark, dir)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    try {
      spark.sql(sqlEmbedDedupTvfDdl(planes, fanOut))
      spark.sql("SELECT id_a, id_b, cos " +
        s"FROM near_dup_vectors(CAST($minCos AS DOUBLE)) ORDER BY id_a, id_b")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS near_dup_vectors")
      spark.catalog.dropTempView("embeddings"): Unit
    }
  }

  private val qSqlEmbedDedupTvf: Q = (spark, dir) =>
    sqlEmbedDedupTvfCall(spark, dir, Similarity.NearDupCos)

  /** q303: DECONTAMINATION as a PARAMETERIZED SQL table function —
    * `decontam_banded(min_cos, recall_bp)` closes the TVF family's one
    * gap (round-15, VERDICT r14 item 6): dedup has `near_dup_pairs`
    * (q280), ANN its index family (q282/q283/q285), embedding dedup
    * `near_dup_vectors` (q286) — but decontamination, the chain a
    * data-curation team most wants callable from SQL, had none. The
    * body is the q299 banded chain with EVERY knob derived in-SQL from
    * the function's arguments and the corpus itself:
    *
    *  - planes from the occupancy rule over `count(*)`
    *    ([[ScaleParams.srpBandPlanes]]'s SQL twin — the same value the
    *    oracle derives);
    *  - p∗ = 1 − acos(min_cos)/π and the band count
    *    L = ceil(ln(1−r)/ln(1−p∗^planes)) ([[ScaleParams.srpBandsFor]]
    *    transposed to SQL — Catalyst's acos/ln/power/ceil are the same
    *    JDK Math calls the Scala rule makes, so the derived integer is
    *    identical, and the oracle's interpolated-literal twin agrees
    *    because the ceil argument sits ≥ 0.016 from any integer);
    *  - both guards ship IN the text: recall_bp outside (0, 10000)
    *    raises before ln(0) can wrap (the [[ScaleParams.srpBandsFor]]
    *    require), and a derived bands × planes past the enumerated
    *    4096 ceiling raises with a named cause (the signListsCte
    *    discipline) instead of silently truncating the plane family;
    *  - sign planes from the same md5(j ++ '_' ++ i) parity as
    *    [[Similarity.planeSign]], dots/norms through the registered
    *    `vec_dot`/`vec_norm` codegen kernels, buckets reassembled with
    *    the integer bit-sum — the [[Similarity.srpBandBuckets]] frame
    *    path as SQL text, bit-identical cosines.
    *
    * Called at ([[Similarity.DecontamTightCos]],
    * [[Similarity.DecontamRecallBp]]) it is ROW-IDENTICAL to q299 and
    * shares its oracle; `SqlDecontamTvfSpec` pins the identity, both
    * guards, and the plan shape (no CartesianProduct — the sign cross
    * broadcasts, the corpus↔eval candidate step is a bucket
    * equi-join).
    *
    * Scale shape, declared in the text like q299's plan: one corpus
    * pass computes rows × L·b dots flowing into a map-side-combined
    * (vec_id, band) aggregate (the exchange carries rows × bands, not
    * rows × planes — the frame path's honest linear-in-planes bill),
    * the fan-out hint is generated only when the scan is single-split
    * ([[embedsNeedFanOut]]), and the exact-cosine verify runs on
    * candidates only.
    */
  private[graft] def sqlDecontamTvfDdl(fanOut: Boolean): String =
    s"""CREATE TEMPORARY FUNCTION decontam_banded(min_cos DOUBLE, recall_bp BIGINT)
       |RETURNS TABLE(vec_id BIGINT, near_eval_id BIGINT, max_cos DOUBLE) RETURN
       |WITH e AS (SELECT ${embedsFanOutHint(fanOut)}vec_id, embedding AS v,
       |    vec_norm(embedding) AS nrm
       |  FROM embeddings),
       |ev AS (SELECT vec_id AS e_id,
       |    transform(v, (x, i) -> x * CASE WHEN CAST(conv(substring(md5(
       |      concat('e', CAST(vec_id AS STRING), '_', CAST(i AS STRING))),
       |      1, 1), 16, 10) AS BIGINT) % 2 = 0 THEN 1.45D ELSE 0.55D END) AS e_vec
       |  FROM e WHERE vec_id % 10 = 7),
       |ev2 AS (SELECT e_id, e_vec, vec_norm(e_vec) AS e_nrm FROM ev),
       |p AS (SELECT GREATEST(1, CAST(round(log2(count(*) / 20.0), 0) AS BIGINT)) AS planes
       |  FROM e),
       |lb AS (SELECT CASE WHEN recall_bp <= 0 OR recall_bp >= 10000
       |    THEN raise_error(concat('decontam_banded: recall_bp must be in ',
       |      '(0, 10000) - SRP banding cannot guarantee 100% recall, got ',
       |      CAST(recall_bp AS STRING)))
       |    ELSE GREATEST(1, CAST(ceil(ln(1.0 - recall_bp / 10000.0) /
       |      ln(1.0 - power(1.0 - acos(min_cos) / pi(), planes))) AS BIGINT))
       |    END AS bands
       |  FROM p),
       |np AS (SELECT CASE WHEN lb.bands * p.planes > 4096
       |    THEN raise_error(concat('decontam_banded: derived plane count ',
       |      CAST(lb.bands * p.planes AS STRING),
       |      ' exceeds the enumerated ceiling 4096'))
       |    ELSE lb.bands * p.planes END AS nplanes, p.planes AS planes
       |  FROM lb, p),
       |sg AS (SELECT id AS j, transform(sequence(0, ${EmbedDims - 1}), i ->
       |    CASE WHEN CAST(conv(substring(md5(concat(CAST(id AS STRING), '_',
       |      CAST(i AS STRING))), 1, 1), 16, 10) AS BIGINT) % 2 = 0
       |    THEN 1.0D ELSE -1.0D END) AS sv
       |  FROM range(0, 4096)
       |  WHERE id < (SELECT nplanes FROM np)),
       |bk AS (SELECT /*+ BROADCAST(sg), BROADCAST(np) */ vec_id,
       |    j div np.planes AS band, np.planes AS planes,
       |    sum(CASE WHEN vec_dot(v, sv) > 0
       |      THEN shiftleft(CAST(1 AS BIGINT), CAST(j % np.planes AS INT))
       |      ELSE CAST(0 AS BIGINT) END) AS bits
       |  FROM e CROSS JOIN sg CROSS JOIN np GROUP BY 1, 2, 3),
       |bke AS (SELECT /*+ BROADCAST(sg), BROADCAST(np) */ e_id,
       |    j div np.planes AS band, np.planes AS planes,
       |    sum(CASE WHEN vec_dot(e_vec, sv) > 0
       |      THEN shiftleft(CAST(1 AS BIGINT), CAST(j % np.planes AS INT))
       |      ELSE CAST(0 AS BIGINT) END) AS bits
       |  FROM ev2 CROSS JOIN sg CROSS JOIN np GROUP BY 1, 2, 3),
       |k AS (SELECT vec_id, shiftleft(band, CAST(planes AS INT)) + bits AS bucket FROM bk),
       |ke AS (SELECT e_id, shiftleft(band, CAST(planes AS INT)) + bits AS bucket FROM bke),
       |cand AS (SELECT DISTINCT k.vec_id, ke.e_id FROM k JOIN ke USING (bucket)),
       |pairs AS (SELECT cand.vec_id, cand.e_id,
       |    vec_dot(ec.v, ee.e_vec) / (ec.nrm * ee.e_nrm) AS cos
       |  FROM cand JOIN e ec ON ec.vec_id = cand.vec_id
       |            JOIN ev2 ee ON ee.e_id = cand.e_id),
       |best AS (SELECT vec_id, e_id, cos, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, e_id) AS rk FROM pairs)
       |SELECT vec_id, e_id AS near_eval_id, cos AS max_cos
       |FROM best WHERE rk = 1 AND cos >= min_cos""".stripMargin

  private[graft] def sqlDecontamTvfCall(spark: SparkSession, dir: String,
                                        minCos: Double, recallBp: Long): DataFrame = {
    val fanOut = embedsNeedFanOut(spark, dir)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    try {
      spark.sql(sqlDecontamTvfDdl(fanOut))
      spark.sql("SELECT vec_id, near_eval_id, max_cos FROM " +
        s"decontam_banded(CAST($minCos AS DOUBLE), ${recallBp}L) ORDER BY vec_id")
    } finally {
      spark.sql("DROP TEMPORARY FUNCTION IF EXISTS decontam_banded")
      spark.catalog.dropTempView("embeddings"): Unit
    }
  }

  private val qSqlDecontamTvf: Q = (spark, dir) =>
    sqlDecontamTvfCall(spark, dir, Similarity.DecontamTightCos,
      Similarity.DecontamRecallBp)

  /** q287: EMBEDDING near-dup GROUPS — connected components over the
    * q24 verified-pair graph, canonical id = component minimum: the
    * q31 step (pairwise similarity → an actionable keep/drop decision)
    * for the VECTOR modality, closing the text/embedding symmetry the
    * same way q284/q286 did for the incremental and TVF forms. A
    * semantic-dedup pipeline keeps one document per component (the
    * canonical) and drops the rest — pairs alone can't express that
    * when near-dups chain transitively (a~b, b~c: two pairs, ONE
    * group of three).
    *
    * Scale shape: [[Dedup.connectedComponents]] — label propagation
    * with node-sized per-iteration state, the symmetrized edge set
    * persisted pre-partitioned on src (labels, which change per round,
    * are the only re-shuffled side), O(component diameter) rounds —
    * near-dup components are shallow (duplicate clusters, not social
    * graphs), so the round count is small and corpus-independent.
    */
  private val qEmbedGroups: Q = (spark, dir) => {
    val vecs = Tables(spark, dir, "embeddings").select(col("vec_id"))
    val pairs = qDedupEmbed(spark, dir).select("id_a", "id_b")
    Dedup.connectedComponents(vecs, pairs, "vec_id", "id_a", "id_b")
      .orderBy("vec_id")
  }

  /** Incremental dedup: the 25% increment (doc_id % 4 = 3) deduped
    * against the full corpus snapshot — band keys of the increment
    * broadcast, the corpus signature side never shuffles
    * ([[Dedup.incrementalCandidates]]).
    */
  private val qDedupIncremental: Q = (spark, dir) => {
    val all = sigs(spark, dir)
    val inc = all.filter(col("doc_id") % 4 === 3)
    Dedup.incrementalCandidates(all, inc, "doc_id", "sig", 4, 4)
      .withColumn("est_jaccard", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")
  }

  /** LSH candidates verified by exact trigram Jaccard ≥ 0.4 — the
    * shared edge set of the pairwise and grouping dedup queries.
    */
  private def ngramPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // The shingle table feeds THREE consumers — the minhash signature
    // aggregation and both sides of the exact-Jaccard verify join.
    // Materialize it once (eager localCheckpoint, leak-free) so the
    // tokenize+shingle pass over the corpus runs exactly once per
    // invocation; ReuseExchange alone can't unify the sig path (keyed
    // aggregation) with the verify path (pair join).
    val sh = Dedup.materialize(Dedup.shingleTable(docs, "doc_id", "text"))
    val s = Dedup.minhashSigsFromShingles(sh, "doc_id", 16)
    val cands = Dedup.lshCandidates(s, "doc_id", "sig", 4, 4)
    // MERGE-pinned joins: the two shingle-table sides canonicalize to
    // the same doc_id exchange below the SMJ sorts, so ReuseExchange
    // reads the materialized blocks once each within the action — and
    // sort-merge spills where a shuffled-hash build side of corpus
    // size would OOM
    val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")).hint("MERGE")
    val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")).hint("MERGE")
    cands.select("id_a", "id_b").join(shA, "id_a").join(shB, "id_b")
      .withColumn("jacc", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= 0.4)
  }

  /** n-gram Jaccard dedup: exact trigram-shingle Jaccard, verified
    * only on LSH candidate pairs (the 100 TB-scalable shape — exact
    * verify never touches non-colliding pairs).
    */
  private val qDedupNgram: Q = (spark, dir) => {
    ngramPairs(spark, dir)
      .select(col("id_a"), col("id_b"), col("jacc"))
      .orderBy("id_a", "id_b")
  }

  /** q165: LSH CANDIDATE PRECISION — the index-tuning complement of
    * q112's recall audit: of the pairs the MinHash bands surface, what
    * fraction survives the exact Jaccard verify? Low precision means
    * the band parameters waste the verify budget on noise (add rows
    * per band); q112-low recall means they miss true pairs (add
    * bands). Together the two numbers ARE the LSH tuning loop.
    * Candidate and survivor counts are exact integers; the rate is
    * integer basis points.
    *
    * Scale: identical shape to q22 (banded candidates, verify only on
    * collisions) — the audit adds one counting aggregate.
    */
  private val qLshPrecision: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.materialize(Dedup.shingleTable(docs, "doc_id", "text"))
    val s = Dedup.minhashSigsFromShingles(sh, "doc_id", 16)
    val cands = Dedup.lshCandidates(s, "doc_id", "sig", 4, 4)
    val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")).hint("MERGE")
    val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")).hint("MERGE")
    cands.select("id_a", "id_b").join(shA, "id_a").join(shB, "id_b")
      .withColumn("jacc", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("jacc") >= 0.4, 1L).otherwise(0L)).as("n_true"))
      .withColumn("precision_bp", expr("n_true * 10000 div n_cand"))
      .select("n_cand", "n_true", "precision_bp")
  }

  /** q166: EXACT ROC-AUC — the classifier-evaluation primitive behind
    * quality-filter tuning (does the scorer actually separate the
    * classes before you gate the corpus on it?). Here: the en-stopword
    * -ratio scorer judged against the declared `lang = 'en'` labels.
    * AUC is computed from pair concordance counts, all integers:
    * aggregate per distinct score first (score domain ≤ 10⁶ micro
    * values however big the corpus), exclusive global prefix sum of
    * negatives by score ([[graft.operators.GlobalRank.withPrefixSums]]
    * — no single-partition window), then
    * AUC = (concordant + ties/2) / (pos·neg) in exact basis points.
    * Exact while pos·neg < 2⁶³ (~3·10⁹ per class — per-slice audits;
    * shard-and-average beyond that).
    */
  private val qAuc: Q = (spark, dir) => {
    val scored = docsFanned(spark, dir)
      .select(TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"), col("lang"))
      .select(expr("CAST(round(stop_ratio * 1000000) AS BIGINT)").as("score_micro"),
        col("lang"))
    graft.operators.Stats.auc(scored, col("score_micro"), col("lang") === "en")
  }

  private[graft] val AucFolds = 5

  /** q262: CROSS-FOLD AUC STABILITY — q166's exact AUC computed per
    * hash-fold (5 folds by the portable doc_id hash) PLUS the pooled
    * row (fold = −1): the eval-stability audit that says whether a
    * reported AUC is a property of the scorer or of the sample. A
    * spread of several hundred bp across folds means single-split
    * metric deltas of that size are noise — read BEFORE believing any
    * A/B of two quality filters. Same integer pair-concordance
    * machinery as q166; the per-fold cumulative runs in a
    * fold-PARTITIONED window (never unpartitioned).
    *
    * Scale: one score pass; the per-(fold, score) aggregate bounds
    * window input to folds × score-domain rows. Exact while
    * pos·neg < 2⁶³ per fold.
    */
  private val qFoldAuc: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sc = docsFanned(spark, dir).select(
      expr(s"CAST(conv(substr(md5(concat('fold:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % $AucFolds")
        .as("fold"),
      round(TextAnalysis.stopwordRatio(col("text")) * 1000000)
        .cast("long").as("score_micro"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val byS = sc.groupBy("fold", "score_micro")
      .agg(sum("pos").as("pos_s"), (count(lit(1)) - sum("pos")).as("neg_s"))
    val w = Window.partitionBy("fold").orderBy("score_micro")
      .rowsBetween(Window.unboundedPreceding, -1)
    val perFold = byS
      .withColumn("cum_neg", coalesce(sum("neg_s").over(w), lit(0L)))
      .groupBy("fold")
      .agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"),
        sum(col("pos_s") * col("cum_neg")).as("concordant"),
        sum(col("pos_s") * col("neg_s")).as("tied"))
    val pooled = graft.operators.Stats.auc(
        sc.select(col("score_micro"), (col("pos") === 1L).as("p")),
        col("score_micro"), col("p"))
      .select(lit(-1L).as("fold"), col("n_pos"), col("n_neg"),
        col("concordant"), col("tied"))
    perFold.unionByName(pooled)
      .select(col("fold"), col("n_pos"), col("n_neg"), col("concordant"),
        col("tied"),
        expr("(2 * concordant + tied) * 10000 div (2 * n_pos * n_neg)")
          .as("auc_bp"))
      .orderBy("fold")
  }

  /** q197: PEARSON CHI-SQUARED INDEPENDENCE AUDIT — is language
    * distribution independent of source? The categorical complement
    * of q167's KS (continuous drift) and q187's keyness (per-term
    * G²): the full source × lang contingency grid with standardized
    * residuals — WHICH cells deviate, the localization a drift alarm
    * needs — plus the exact-integer chi-squared total and degrees of
    * freedom on every row. Zero-observed cells participate (the grid
    * is the margin cross, not the observed support).
    *
    * Exactness: residuals divide identical exact integers; each cell's
    * χ² term settles to micro-units BEFORE the total, so the sum is
    * order-free integer arithmetic ([[graft.operators.Stats
    * .chiSquareCells]]).
    */
  /** The chi-squared audit as ONE dialect-neutral ANSI text — shared
    * by q197's oracle AND run verbatim by Spark as q202 (SQL front
    * end #10): no `div`/`//`, no engine-specific casts, margins
    * rebuilt relationally. Defined ABOVE its uses (object-val
    * initialization order — the q77 lesson).
    */
  private[graft] val ChiSquareSqlText: String =
    """WITH cells AS (SELECT source AS r, lang AS c,
      |  CAST(count(*) AS BIGINT) AS obs FROM documents GROUP BY 1, 2),
      |rt AS (SELECT r, CAST(sum(obs) AS BIGINT) AS rt FROM cells GROUP BY r),
      |ct AS (SELECT c, CAST(sum(obs) AS BIGINT) AS ct FROM cells GROUP BY c),
      |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
      |grid AS (SELECT rt.r, ct.c, COALESCE(cells.obs, 0) AS obs,
      |  rt.rt, ct.ct, n.n,
      |  COALESCE(cells.obs, 0) * n.n - rt.rt * ct.ct AS num,
      |  n.n * rt.rt * ct.ct AS den
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |  LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c),
      |terms AS (SELECT r, c, obs, rt, ct,
      |  round(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)), 6) AS resid,
      |  CAST(round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) * 1000000.0
      |    / CAST(den AS DOUBLE)) AS BIGINT) AS term_micro
      |  FROM grid),
      |tot AS (SELECT CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
      |  CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT) AS dof
      |  FROM terms)
      |SELECT r AS source, c AS lang, obs, rt, ct, resid, term_micro,
      |  chi2_micro, dof
      |FROM terms, tot ORDER BY source, lang""".stripMargin

  /** q202: SQL front end #10 — [[ChiSquareSqlText]] executed VERBATIM
    * by Spark (the text IS its own oracle, the q189 pattern): pins
    * that the engine's SQL surface plans the dense margin-cross,
    * LEFT-JOIN-grid, and exact micro-unit settle identically to the
    * DataFrame operator (q197 holds the same result through
    * [[graft.operators.Stats.chiSquareCells]]).
    */
  private val qSqlChiSquare: Q = (spark, dir) =>
    QueriesAnalytics.sqlVerbatim(spark, dir, ChiSquareSqlText, Seq("documents"))

  private val qChiSquare: Q = (spark, dir) => {
    val cells = graft.operators.Stats.chiSquareCells(
      Tables(spark, dir, "documents"), col("source"), col("lang"))
    val tot = cells.agg(sum("term_micro").as("chi2_micro"),
      ((count_distinct(col("r")) - 1) * (count_distinct(col("c")) - 1))
        .as("dof"))
    cells.crossJoin(broadcast(tot))
      .select(col("r").as("source"), col("c").as("lang"), col("obs"),
        col("rt"), col("ct"), col("resid"), col("term_micro"),
        col("chi2_micro"), col("dof"))
      .orderBy("source", "lang")
  }

  private[graft] val NbSeedSource = "src0"

  /** q170: NAIVE-BAYES QUALITY CLASSIFIER — the CCNet/GPT-3-style
    * "looks like the curated seed" filter as one distributed
    * train+score pipeline: multinomial NB with add-one smoothing,
    * positive class = the [[NbSeedSource]] documents, token weights
    * w(t) = ln p(t|pos) − ln p(t|neg) settled to integer micro-units
    * PER TERM (the q145 rule: micro-rounding before any sum kills
    * both libm-ulp and float-ordering drift), doc score = Σ w(t) over
    * occurrences, exact BIGINT. Output: per-source doc counts, exact
    * score sums, and the floored mean — the audit that says which
    * sources the classifier would up/down-sample.
    *
    * Scale: corpus tokenized ONCE (materialized); the count table
    * shuffles term keys with map-side combine; the three training
    * scalars ride one broadcast row; scoring is a term-keyed join of
    * occurrences against the vocab-sized weight table, re-aggregated
    * per doc then per source. Nothing ever holds a corpus-sized
    * structure on one node.
    */
  /** Per-doc NB scores (doc_id, source, score) — the shared
    * train+score core of q170 (per-source audit) and q172
    * (calibration bins).
    */
  private def nbDocScores(spark: SparkSession, dir: String): DataFrame = {
    val toks = Dedup.materialize(
      docsFanned(spark, dir)
        .select(col("doc_id"), col("source"),
          explode_outer(TextAnalysis.tokens(col("text"))).as("term")))
    val counts = toks.groupBy("term")
      .agg(sum(when(col("source") === NbSeedSource, 1L).otherwise(0L)).as("pos_ct"),
        count(lit(1)).as("tot_ct"))
      .withColumn("neg_ct", col("tot_ct") - col("pos_ct"))
    val scalars = counts.agg(count(lit(1)).as("v"),
      sum("pos_ct").as("pos_tot"), sum("neg_ct").as("neg_tot"))
    val weights = counts.crossJoin(broadcast(scalars))
      .select(col("term"), expr(
        """CAST(round(ln(CAST(pos_ct + 1 AS DOUBLE) / CAST(pos_tot + v AS DOUBLE)) * 1000000) AS BIGINT)
          | - CAST(round(ln(CAST(neg_ct + 1 AS DOUBLE) / CAST(neg_tot + v AS DOUBLE)) * 1000000) AS BIGINT)""".stripMargin)
        .as("w"))
    toks.join(weights, "term")
      .groupBy("doc_id", "source").agg(sum("w").as("score"))
  }

  private val qNbQuality: Q = (spark, dir) => {
    nbDocScores(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("score").as("sum_w_micro"))
      // floor (not Spark's truncating div): sums are negative and the
      // oracle's // floors; exact while |sum| < 2^53 micro-units
      .withColumn("mean_w_micro",
        expr("CAST(FLOOR(CAST(sum_w_micro AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT)"))
      .orderBy("source")
  }

  private val MarginK = 25

  /** q295: MARGIN-BASED ACTIVE-LEARNING SELECTION — closes the
    * data-centric loop the classifier queries open: q170 trains and
    * scores, q172 calibrates, and THIS picks the next labeling batch —
    * the [[MarginK]] documents nearest the NB decision boundary
    * (smallest |score|), where a label buys the most model improvement
    * (classic uncertainty/margin sampling). Contrast q249's
    * hard-negative mining, which needs known positives; margin
    * sampling needs only the scores.
    *
    * Exactness: scores are q170's integer micro-units, so |score| and
    * the (abs_score, doc_id) selection order are knife-edge-free.
    * Scale: the score pass is q170's (term-keyed, map-side combined);
    * the global smallest-k is `TakeOrderedAndProject` — per-partition
    * top-k then a k-row merge on the driver, never a global sort or a
    * single-partition window.
    */
  private val qMarginSample: Q = (spark, dir) => {
    nbDocScores(spark, dir)
      .withColumn("abs_score", abs(col("score")))
      .orderBy(col("abs_score"), col("doc_id")).limit(MarginK)
      .select(col("doc_id"), col("source"), col("score"), col("abs_score"))
      .orderBy("abs_score", "doc_id")
  }

  /** q296: QUALITY-SCORER AGREEMENT CUBE (query-by-committee
    * disagreement) — the engine ships three independent quality
    * signals (NB seed-likeness q170, unigram cross-entropy q53,
    * heuristic quality q17); before an ensemble cut, a curation review
    * asks WHERE they agree. Each scorer quartiles the corpus
    * (bucket 4 = best under that scorer, orientations aligned:
    * score ↑, xent ↓, quality ↑), and the 4×4×4 cell counts with the
    * per-cell quartile spread ARE the answer — diagonal mass =
    * consensus, high-spread cells = the QBC disagreement region where
    * a label (q295's batch) or a rule review buys the most.
    *
    * Exactness: quartiles are rank-exact ntile
    * ([[graft.operators.GlobalRank.withNtile]] — no single-partition
    * window) over knife-edge-free keys (integer micro scores; xent
    * micro-rounded; quality is a per-row expression, bit-identical
    * cross-engine) with doc_id tie-breaks. The oracle nests the three
    * scorers' full texts as subqueries (the q112 precedent — the `s`
    * CTE name collides across fragments, so composition nests rather
    * than concatenates).
    *
    * Scale: three corpus score passes (each already audited under its
    * own query), three range-shuffle ntiles, doc-keyed joins,
    * 64-cell output.
    */
  private val qCommitteeCube: Q = (spark, dir) => {
    import graft.operators.GlobalRank
    def bucket(df: DataFrame, key: Column, out: String): DataFrame =
      GlobalRank.withNtile(df, Seq(key, col("doc_id")), 4, out)
        .select(col("doc_id"), col(out).cast("long").as(out))
    val nb = bucket(nbDocScores(spark, dir).select(col("doc_id"), col("score")),
      col("score"), "b_nb")
    val xe = bucket(qUnigramXent(spark, dir)
        .select(col("doc_id"), (-col("xent")).as("negx")),
      col("negx"), "b_xe")
    val qq = bucket(qTextQuality(spark, dir).select(col("doc_id"), col("quality")),
      col("quality"), "b_q")
    nb.join(xe, "doc_id").join(qq, "doc_id")
      .groupBy("b_nb", "b_xe", "b_q")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("spread",
        greatest(col("b_nb"), col("b_xe"), col("b_q"))
          - least(col("b_nb"), col("b_xe"), col("b_q")))
      .orderBy("b_nb", "b_xe", "b_q")
  }

  private[graft] val WinnowK = graft.text.Winnower.K
  private[graft] val WinnowW = graft.text.Winnower.W

  /** q169: WINNOWING FINGERPRINTS (the MOSS selection rule) — the
    * LOCAL document-fingerprinting alternative to MinHash: slide a
    * [[WinnowW]]-gram window over the char [[WinnowK]]-gram hashes
    * and keep the window minimum (rightmost on ties — robust
    * winnowing), which GUARANTEES a fingerprint in every window (any
    * shared substring of length ≥ k+w−1 is detected — the coverage
    * property MinHash cannot promise; `WinnowSpec` asserts it).
    * Output: per-doc fingerprint profile — gram/window/fingerprint
    * counts, density in basis points, and the exact integer digest of
    * the selected hashes (content-pinning the selection itself).
    *
    * Scale: embarrassingly row-local — one narrow projection, no
    * shuffle until the final metadata-sized sort; the downstream
    * shared-fingerprint join (q66's span shape) would shuffle only
    * the selected ~1/w of grams.
    */
  /** Adds `t, m, hs, nw, sel` winnowing columns to a frame with a
    * `text` column — the interpreted HOF REFERENCE formulation of the
    * winnowing rule. q169 ships the O(m) codegen kernel
    * ([[graft.text.Winnower]]); `WinnowSpec` asserts the guarantees on
    * this formulation AND pins the kernel to it element-by-element.
    */
  private[graft] def winnowSelect(df: DataFrame): DataFrame = {
    val (k, w) = (WinnowK, WinnowW)
    df.withColumn("t", lower(col("text")))
      .withColumn("m", greatest(lit(1), length(col("t")) - (k - 1)).cast("long"))
      .withColumn("hs", expr(
        s"transform(sequence(1L, m), i -> CAST(conv(substr(md5(substr(t, CAST(i AS INT), $k)), 1, 8), 16, 10) AS BIGINT))"))
      .withColumn("nw", greatest(lit(1L), col("m") - (w - 1)))
      .withColumn("sel", expr(
        s"""array_distinct(transform(sequence(1L, nw), j ->
           |  array_max(filter(transform(sequence(0L, least(CAST($w AS BIGINT), m) - 1L), o -> j + o),
           |    p -> element_at(hs, CAST(p AS INT)) = array_min(slice(hs, CAST(j AS INT), CAST(least(CAST($w AS BIGINT), m) AS INT)))))))""".stripMargin))
  }

  private val qWinnow: Q = (spark, dir) => {
    val (k, w) = (WinnowK, WinnowW)
    docsFanned(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("m", greatest(lit(1), length(col("t")) - (k - 1)).cast("long"))
      .withColumn("nw", greatest(lit(1L), col("m") - (w - 1)))
      // codegen kernel (one O(m) deque pass) — WinnowSpec pins it to
      // the interpreted HOF reference formulation in [[winnowSelect]]
      .withColumn("fps", graft.functions.winnow_fps(col("t")))
      .select(col("doc_id"), col("m").as("n_grams"), col("nw").as("n_windows"),
        size(col("fps")).cast("long").as("n_fp"),
        expr("CAST(size(fps) AS BIGINT) * 10000 div nw").as("density_bp"),
        expr("aggregate(fps, CAST(0 AS BIGINT), (acc, f) -> acc + f.hash)").as("fp_digest"))
      .orderBy("doc_id")
  }

  /** q176: SOURCE JS-DIVERGENCE MATRIX — pairwise Jensen–Shannon
    * divergence between the sources' unigram distributions: the
    * mixture-design signal (which sources are interchangeable, which
    * add diversity) that q162's doc-overlap Jaccard cannot see.
    * Split exactly into the shared-term sum plus a CLOSED-FORM tail:
    * terms present in only one source contribute p·ln2/2, so the tail
    * is ln2/2·(2 − sharedMassA − sharedMassB) with the shared masses
    * as exact INTEGER count ratios — no sum over either side's
    * disjoint vocabulary, no order-dependent double accumulation
    * anywhere (per-term lns settle to micro-units first, q145's
    * rule).
    *
    * Scale: one (source, term) count pass (map-side combine), source
    * totals broadcast (one row per source), the pair join keyed on
    * term — each term's row count is (sources having it)², bounded by
    * the source count squared, never by corpus size.
    */
  private val qJsMatrix: Q = (spark, dir) => {
    val toks = Dedup.materialize(
      docsFanned(spark, dir)
        .select(col("source"), explode_outer(TextAnalysis.tokens(col("text"))).as("term")))
    val totals = toks.groupBy("source").agg(count(lit(1)).as("tot"))
    val st = Dedup.materialize(
      toks.groupBy("source", "term").agg(count(lit(1)).as("c"))
        .join(broadcast(totals), "source"))
    val a = st.select(col("term"), col("source").as("src_a"),
      col("c").as("ca"), col("tot").as("tota")).hint("MERGE")
    val b = st.select(col("term"), col("source").as("src_b"),
      col("c").as("cb"), col("tot").as("totb")).hint("MERGE")
    val perTerm = a.join(b, "term").filter(col("src_a") < col("src_b"))
      .withColumn("pa", expr("CAST(ca AS DOUBLE) / CAST(tota AS DOUBLE)"))
      .withColumn("pb", expr("CAST(cb AS DOUBLE) / CAST(totb AS DOUBLE)"))
      .withColumn("ln_a", expr("CAST(round(ln(2.0 * pa / (pa + pb)) * 1000000) AS BIGINT)"))
      .withColumn("ln_b", expr("CAST(round(ln(2.0 * pb / (pa + pb)) * 1000000) AS BIGINT)"))
      .withColumn("t_nano", expr("CAST(round((pa * ln_a + pb * ln_b) * 500.0) AS BIGINT)"))
    perTerm.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"), sum("t_nano").as("inner_nano"),
        sum("ca").as("sca"), sum("cb").as("scb"),
        max("tota").as("tota"), max("totb").as("totb"))
      .withColumn("tail_nano", expr(
        """CAST(round(ln(2.0) * 500000000.0 *
          |  ((1.0 - CAST(sca AS DOUBLE) / CAST(tota AS DOUBLE))
          |   + (1.0 - CAST(scb AS DOUBLE) / CAST(totb AS DOUBLE)))) AS BIGINT)""".stripMargin))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("inner_nano") + col("tail_nano")).as("js_nano"))
      .orderBy("src_a", "src_b")
  }

  private[graft] val NbCalBins = 10

  /** q172: CLASSIFIER CALIBRATION (reliability bins) — is q170's NB
    * score actually monotone in seed-likeness? Docs ranked by score
    * into [[NbCalBins]] exact rank-ntiles (no float knife-edge; the
    * two-phase [[graft.operators.GlobalRank.withNtile]], no global
    * window), per bin the realized seed share in integer basis
    * points. A calibrated quality filter shows the share falling
    * across bins; an inversion localizes exactly which score range
    * lies.
    */
  private val qNbCalibration: Q = (spark, dir) => {
    val binned = graft.operators.GlobalRank.withNtile(
      nbDocScores(spark, dir), Seq(col("score").desc, col("doc_id")),
      NbCalBins, "bin")
    binned.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("source") === NbSeedSource, 1L).otherwise(0L)).as("n_seed"))
      .withColumn("seed_share_bp", expr("n_seed * 10000 div n_docs"))
      .orderBy("bin")
  }

  private[graft] val WinnowMaxDf = 20 // stop-fingerprint cap
  private[graft] val WinnowMinShared = 3 // pair-report threshold

  /** q171: WINNOWING CANDIDATE PAIRS — the MOSS application of q169's
    * fingerprints: documents sharing ≥ [[WinnowMinShared]] selected
    * hashes are substring-level copy candidates (the guarantee: any
    * shared run ≥ k+w−1 chars yields a shared fingerprint). Hashes in
    * more than [[WinnowMaxDf]] documents are dropped as
    * stop-fingerprints BEFORE the self-join — boilerplate blocks
    * would otherwise pair quadratically (the blocking-skew guard
    * every LSH-style self-join here ships).
    *
    * Scale: only the selected ~2/(w+1) of grams ever shuffle; the
    * df-capped self-join is sort-merge (spills, no corpus-sized hash
    * maps) with each block ≤ MaxDf rows.
    */
  private val qWinnowPairs: Q = (spark, dir) => {
    val fp = Dedup.materialize(
      docsFanned(spark, dir)
        .select(col("doc_id"),
          explode_outer(graft.functions.winnow_fps(lower(col("text")))).as("f"))
        .select(col("doc_id"), col("f.hash").as("h")).distinct())
    val keep = fp.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= WinnowMaxDf)
    val kept = Dedup.materialize(fp.join(keep, "h").select("doc_id", "h"))
    val a = kept.select(col("h"), col("doc_id").as("id_a")).hint("MERGE")
    val b = kept.select(col("h"), col("doc_id").as("id_b")).hint("MERGE")
    a.join(b, "h").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .orderBy("id_a", "id_b")
  }

  /** q180: EXACT SPEARMAN RANK CORRELATION — does the quality score
    * just measure length? ρ between quality (micro) and n_chars over
    * tie-AVERAGE ranks kept integer by doubling
    * (rank2 = 2·below + cnt + 1): per metric one aggregate to
    * distinct values (domain-sized) + one exclusive
    * [[graft.operators.GlobalRank.withPrefixSums]] — never a global
    * window, never a per-row rank shuffle — then Pearson over the six
    * exact BIGINT moment sums (q141's sufficient-statistics shape).
    * Exact while 4n⁴ < 2⁶³ (n ≲ 3·10⁴ per audited slice; shard the
    * audit or switch the moments to doubles beyond).
    */
  private val qSpearman: Q = (spark, dir) => {
    val m = Dedup.materialize(
      docsFanned(spark, dir)
        .select(col("doc_id"), col("n_chars").as("y"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .select(col("doc_id"), col("y"),
          expr("CAST(round(quality * 1000000) AS BIGINT)").as("x")))
    def rank2(c: String): DataFrame =
      graft.operators.GlobalRank.withPrefixSums(
          m.groupBy(c).agg(count(lit(1)).as("cnt")),
          Seq(col(c)), Seq("cnt"), Seq("below"), inclusive = false)
        .select(col(c), (lit(2L) * col("below") + col("cnt") + 1L).as(s"r$c"))
    val ranked = m.join(rank2("x"), "x").join(rank2("y"), "y")
    ranked.agg(count(lit(1)).as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("n"),
        // products in double space: ranks are ≤ 2n, so n·sxx ≈ 4n⁴
        // overflows BIGINT past n ≈ 38k (the q235 overflow lesson);
        // the long SUMS stay exact and both engines cast the same longs
        expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               | / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)""".stripMargin)
          .as("rho"))
  }

  /** q185: EMBEDDING DISPERSION PER LABEL — is the labeled embedding
    * space actually clustered? Per label: the per-dim centroid
    * (settled to 6 decimals BEFORE any cosine — the q80 iteration
    * rule, so downstream micro-rounding never sits on a
    * sum-order knife edge), then each member's cosine to its own
    * centroid in integer micro-units: count, floored mean (cohesion)
    * and min (the worst outlier — a mislabeled-vector smell).
    *
    * Scale: one posexplode pass shuffling (label, dim) keys with
    * map-side partial avgs; centroids are label-count × dim rows —
    * broadcast; the member pass is one narrow projection + label-keyed
    * aggregate.
    */
  private val qEmbedDispersion: Q = (spark, dir) => {
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("label"), Similarity.asDouble(col("embedding")).as("v"))
    val comps = e.select(col("label"), posexplode(col("v")))
      .groupBy("label", "pos").agg(round(avg("col"), 6).as("m"))
    val cents = comps.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    e.join(broadcast(cents), "label")
      .select(col("label"),
        round(Similarity.cosine(col("v"), col("c")) * 1000000).cast("long").as("cm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum("cm").as("sum_cm"), min("cm").as("min_cos_micro"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        expr("CAST(FLOOR(CAST(sum_cm AS DOUBLE) / CAST(n_vecs AS DOUBLE)) AS BIGINT)")
          .as("mean_cos_micro"),
        col("min_cos_micro"))
      .orderBy("label")
  }

  private[graft] val RingShards = 8

  /** 32-bit ring point for shard `i` — same md5-prefix hash family as
    * the doc points; computed ONCE driver-side and interpolated as a
    * literal into BOTH engines' texts, so parity is by construction.
    */
  private def ringPoint(i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"shard:$i".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Shared SQL fragments: clockwise ring distances, their min, and
    * the argmin owner (ties — md5 collisions — to the smallest shard
    * id). Pure least/CASE/% arithmetic; identical text parses on
    * Spark and DuckDB. The min is computed once into its own column
    * so the CASE compares, not recomputes.
    */
  private def ringDistSql(h: String, i: Int): String =
    s"((${ringPoint(i)} - $h + 4294967296) % 4294967296)"
  private def ringMinSql(h: String, k: Int): String =
    (0 until k).map(ringDistSql(h, _)).mkString("least(", ", ", ")")
  private def ringCaseSql(h: String, k: Int, mindCol: String): String =
    (0 until k).map(i => s"WHEN ${ringDistSql(h, i)} = $mindCol THEN $i")
      .mkString("CASE ", " ", " END")

  /** q184: CONSISTENT-HASH REBALANCE AUDIT — growing [[RingShards]] →
    * +1 shards, what fraction of documents MOVE under (a) the
    * consistent-hash ring (expected ≈ 1/(k+1)) vs (b) naive
    * `hash mod k` (≈ k/(k+1) — nearly everything)? The audit that
    * justifies ring placement for any stateful shard map (dedup
    * indices, ANN partitions, dimension caches). Ring points are
    * build-time literals; the owner is a least/CASE chain — O(k) per
    * row, k fixed and small, fully codegen.
    *
    * Scale: one narrow projection + one single-row aggregate; no
    * shuffle at all beyond the final count.
    */
  private val qRebalance: Q = (spark, dir) => {
    val hExpr = "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    docsFanned(spark, dir)
      .select(expr(hExpr).as("h"))
      .withColumn("mind_k", expr(ringMinSql("h", RingShards)))
      .withColumn("mind_k1", expr(ringMinSql("h", RingShards + 1)))
      .select(col("h"),
        expr(ringCaseSql("h", RingShards, "mind_k")).as("ring_k"),
        expr(ringCaseSql("h", RingShards + 1, "mind_k1")).as("ring_k1"),
        expr(s"h % $RingShards").as("mod_k"),
        expr(s"h % ${RingShards + 1}").as("mod_k1"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ring_k") =!= col("ring_k1"), 1L).otherwise(0L)).as("ring_moved"),
        sum(when(col("mod_k") =!= col("mod_k1"), 1L).otherwise(0L)).as("mod_moved"))
      .select(col("n_docs"), col("ring_moved"),
        expr("ring_moved * 10000 div n_docs").as("ring_moved_bp"),
        col("mod_moved"),
        expr("mod_moved * 10000 div n_docs").as("mod_moved_bp"))
  }

  private[graft] val PackSweepLens = Seq(512, 1024, 2048, 4096)

  /** q182: CONTEXT-LENGTH PACKING SWEEP — the choose-your-max-len
    * table: for each candidate sequence length, chunks per doc
    * ceil(tokens/L) with the last chunk padded (q69's split-allowed
    * model), total chunks, and padding waste in integer bp — the
    * pad-vs-truncate cost curve read in one pass (q129 audits ONE
    * bucketing; this sweeps the L axis). One tokenize pass, a 4-way
    * constant explode, a 4-row output.
    */
  private val qPackingSweep: Q = (spark, dir) => {
    val lens = PackSweepLens.mkString("array(", ", ", ")")
    docsFanned(spark, dir)
      .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .select(col("n_tok"), explode(expr(lens)).as("len"))
      .withColumn("chunks", expr("CAST(ceil(CAST(n_tok AS DOUBLE) / len) AS BIGINT)"))
      .groupBy("len")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"),
        sum("chunks").as("total_chunks"))
      .withColumn("slots", col("total_chunks") * col("len"))
      .withColumn("waste_bp", expr("(slots - total_tokens) * 10000 div slots"))
      .select("len", "n_docs", "total_tokens", "total_chunks", "waste_bp")
      .orderBy("len")
  }

  private[graft] val JaccHistBins = 20

  /** q183: JACCARD HISTOGRAM OVER LSH CANDIDATES — the dedup
    * threshold-tuning curve: exact-similarity mass of the candidate
    * set in [[JaccHistBins]] bins, with the suffix-cumulative "pairs
    * kept at threshold ≥ bin" count. Bin = (20·|∩|) div |∪| on exact
    * INTEGER shingle counts — no float ratio ever touches a bin edge.
    * q165 reports one number for one threshold; this is the whole
    * curve for choosing it.
    *
    * Scale: q22's chain (banded candidates, verify only on
    * collisions); the histogram is bin-keyed, the suffix cumulative a
    * [[graft.operators.GlobalRank.withPrefixSums]] over ≤ 20 rows.
    */
  private val qJaccardHist: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.materialize(Dedup.shingleTable(docs, "doc_id", "text"))
    val s = Dedup.minhashSigsFromShingles(sh, "doc_id", 16)
    val cands = Dedup.lshCandidates(s, "doc_id", "sig", 4, 4)
    val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")).hint("MERGE")
    val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")).hint("MERGE")
    val hist = cands.select("id_a", "id_b").join(shA, "id_a").join(shB, "id_b")
      .select(expr(
        s"""least(CAST(${JaccHistBins - 1} AS BIGINT),
           |  CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * $JaccHistBins
           |    div CAST(size(array_union(sh_a, sh_b)) AS BIGINT))""".stripMargin)
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
    graft.operators.GlobalRank.withPrefixSums(
        hist, Seq(col("bin").desc), Seq("n_pairs"), Seq("n_pairs_ge"))
      .select("bin", "n_pairs", "n_pairs_ge")
      .orderBy("bin")
  }

  private[graft] val MatryoshkaPrefixes = Seq(8, 16, 32)

  /** q192: MATRYOSHKA PREFIX-DIM RECALL — how much ANN recall do the
    * first d dimensions buy? For each prefix length in
    * [[MatryoshkaPrefixes]]: exact top-10 by prefix-cosine vs the
    * full-64-dim ground truth, recall in integer bp — the evaluation
    * behind tiered MRL retrieval (coarse search on a prefix, rerank
    * on the full vector), which at 100 TB is the difference between
    * scanning 8 and 64 floats per candidate.
    *
    * Scale: q25's broadcast-queries shape ×(prefixes+1); the overlap
    * join is (query·k)-sized.
    */
  private val qMatryoshka: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val full = Similarity.knnBrute(q, e, 10).select(col("q_id"), col("vec_id"))
    val pref = MatryoshkaPrefixes.map { d =>
      val qd = q.select(col("q_id"), slice(col("q_vec"), 1, d).as("q_vec"))
      val ed = e.select(col("vec_id"), slice(col("vec"), 1, d).as("vec"))
      Similarity.knnBrute(qd, ed, 10)
        .select(lit(d.toLong).as("d"), col("q_id"), col("vec_id"))
    }.reduce(_ unionAll _)
    val prefM = Dedup.materialize(pref) // hits + totals read it twice
    val hits = prefM.join(full, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("d").agg(count(lit(1)).as("hits"))
    prefM.groupBy("d").agg(count(lit(1)).as("n_pairs"))
      .join(hits, Seq("d"), "left_outer")
      .select(col("d"), col("n_pairs"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_bp", expr("hits * 10000 div n_pairs"))
      .orderBy("d")
  }

  private[graft] val GramScale = 1e6
  private[graft] val GramTopK = 20

  /** q196: EMBEDDING CORRELATION AUDIT via the one-pass mergeable
    * [[graft.sketch.GramAggregator]] — the PCA-prep / redundant-dim
    * diagnosis a 100 TB embedding store needs before choosing MRL
    * prefixes (q192) or PQ codebooks (q139): which dimension pairs
    * carry the same signal? One typed aggregation reduces the corpus
    * to an exact fixed-point (count, Σq, Σqq) buffer (map-side
    * combine; the shuffle carries ~32 buffers of d(d+3)/2 longs, not
    * rows); Pearson correlation and covariance then derive from the
    * EXACT integer numerators n·Σqᵢqⱼ − Σqᵢ·Σqⱼ in decimal space, so
    * both engines divide the same integers and land on bit-identical
    * doubles — no float-summation-order drift anywhere. Output: the
    * [[GramTopK]] most-|correlated| off-diagonal pairs.
    *
    * The d×d fan-out happens on ONE aggregated row (a broadcast cross
    * join against a 2 016-row literal index table), never on data.
    */
  private val qEmbedGram: Q = (spark, dir) => {
    import spark.implicits._
    import graft.sketch.GramAggregator
    val d = EmbedDims
    val gramU = udaf(new GramAggregator(d, GramScale),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val g = Tables(spark, dir, "embeddings").agg(gramU(col("embedding")).as("g"))
    val idx = (for { i <- 0 until d; j <- i + 1 until d }
      yield (i.toLong, j.toLong, GramAggregator.sumPos(i),
        GramAggregator.sumPos(j), GramAggregator.prodPos(d, i, j),
        GramAggregator.prodPos(d, i, i), GramAggregator.prodPos(d, j, j)))
      .toDF("i", "j", "si_pos", "sj_pos", "pij_pos", "pii_pos", "pjj_pos")
    idx.crossJoin(broadcast(g))
      .select(col("i"), col("j"),
        element_at(col("g"), lit(1)).as("n"),
        element_at(col("g"), col("si_pos")).as("si"),
        element_at(col("g"), col("sj_pos")).as("sj"),
        element_at(col("g"), col("pij_pos")).as("pij"),
        element_at(col("g"), col("pii_pos")).as("pii"),
        element_at(col("g"), col("pjj_pos")).as("pjj"))
      .select(col("i"), col("j"), col("n"),
        (col("n").cast("decimal(20,0)") * col("pij").cast("decimal(20,0)") -
          col("si").cast("decimal(20,0)") * col("sj").cast("decimal(20,0)"))
          .as("covnum"),
        (col("n").cast("decimal(20,0)") * col("pii").cast("decimal(20,0)") -
          col("si").cast("decimal(20,0)") * col("si").cast("decimal(20,0)"))
          .as("vni"),
        (col("n").cast("decimal(20,0)") * col("pjj").cast("decimal(20,0)") -
          col("sj").cast("decimal(20,0)") * col("sj").cast("decimal(20,0)"))
          .as("vnj"))
      .filter(col("vni") > 0 && col("vnj") > 0)
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        round(col("covnum").cast("double") /
          sqrt(col("vni").cast("double") * col("vnj").cast("double")), 9)
          .as("corr"),
        round(col("covnum").cast("double") / col("n").cast("double") /
          col("n").cast("double") / lit(GramScale * GramScale), 12)
          .as("cov"))
      .orderBy(abs(col("corr")).desc, col("dim_i"), col("dim_j"))
      .limit(GramTopK)
  }

  private[graft] val PcaScale = 1e3

  /** q199: TOP PRINCIPAL COMPONENT by EXACT power iteration — the
    * MLlib-PCA shape (distributed moment collection, tiny dense solve
    * downstream) with every arithmetic step engine-exact: the corpus
    * reduces to ONE [[graft.sketch.GramAggregator]] pass (fixed-point
    * scale [[PcaScale]], chosen so every intermediate fits exact
    * decimal/HUGEINT — the documented overflow contract), the d×d
    * integer covariance numerators n·Σqᵢqⱼ − Σqᵢ·Σqⱼ materialize from
    * that single row, and two power-method sweeps u₁ = C·1,
    * u₂ = C·u₁ run entirely in integer arithmetic — normalization by
    * max-|component| (order-free, exact) instead of the usual L2, so
    * NO float enters until the final per-dim division. Output: the
    * dominant loading direction (u₂/‖u₂‖_∞) and the eigenvalue-ratio
    * estimate ‖u₂‖∞ div ‖u₁‖∞.
    *
    * Scale: the corpus pass is the q196 map-side-combining aggregate;
    * everything after is O(d²) symbolic algebra on a broadcast row —
    * the d×d fan-out never touches data.
    */
  private val qPcaPower: Q = (spark, dir) => {
    import spark.implicits._
    import graft.sketch.GramAggregator
    val d = EmbedDims
    val gramU = udaf(new GramAggregator(d, PcaScale),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val g = Dedup.materialize(
      Tables(spark, dir, "embeddings").agg(gramU(col("embedding")).as("g")))
    val idx = (for { i <- 0 until d; j <- 0 until d }
      yield (i.toLong, j.toLong, GramAggregator.sumPos(i),
        GramAggregator.sumPos(j),
        GramAggregator.prodPos(d, math.min(i, j), math.max(i, j))))
      .toDF("i", "j", "si_pos", "sj_pos", "pij_pos")
    val mat = idx.crossJoin(broadcast(g))
      .select(col("i"), col("j"),
        (element_at(col("g"), lit(1)).cast("decimal(19,0)") *
          element_at(col("g"), col("pij_pos")).cast("decimal(19,0)") -
          element_at(col("g"), col("si_pos")).cast("decimal(19,0)") *
          element_at(col("g"), col("sj_pos")).cast("decimal(19,0)"))
          .as("covnum"))
    val u1 = mat.groupBy("j").agg(sum("covnum").as("u1"))
    val m1 = u1.agg(max(abs(col("u1"))).as("m1"))
    val u2 = mat.join(broadcast(u1.select(col("j").as("i"), col("u1"))), "i")
      .groupBy("j").agg(sum(col("covnum") * col("u1")).as("u2"))
    val m2 = u2.agg(max(abs(col("u2"))).as("m2"))
    u2.crossJoin(broadcast(m2)).crossJoin(broadcast(m1))
      .select(col("j").as("dim"),
        round(col("u2").cast("double") / col("m2").cast("double"), 9)
          .as("loading"),
        expr("CAST(m2 div m1 AS BIGINT)").as("lambda_ratio"))
      .orderBy("dim")
  }

  /** q201: GINI / LORENZ INEQUALITY AUDIT of character mass — how
    * concentrated is the corpus in its biggest documents, per source
    * and overall? The complement of q198's tail INDEX: Gini is the
    * single-number budget-skew alarm (a source at 0.6+ is a few
    * megadocs wearing a source label), computed by the exact sorted
    * rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) — integer
    * end-to-end, emitted in ppm by integer division.
    *
    * Scale: per-source ranks are source-partitioned windows; the ALL
    * row's global rank is the two-phase [[graft.operators.GlobalRank]]
    * (battery invariant: no single-partition window); both reduce to
    * one metadata-sized moment aggregate. Exact while n·Σ(i·x) fits a
    * long (~10⁹ docs × 10⁴ chars; decimal-lift beyond).
    */
  private val qGini: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents").select(
      col("source"), col("doc_id"), col("n_chars").as("x"))
    def gini(ranked: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
      ranked.groupBy(key.as("source"))
        .agg(count(lit(1)).as("n_docs"), sum("x").as("sum_chars"),
          sum(col("rk") * col("x")).as("s1"))
        .select(col("source"), col("n_docs"), col("sum_chars"),
          expr("(2 * s1 - (n_docs + 1) * sum_chars) * 1000000" +
            " div (n_docs * sum_chars)").as("gini_ppm"))
    val perSource = gini(docs.withColumn("rk", row_number().over(
      Window.partitionBy("source").orderBy("x", "doc_id")).cast("long")),
      col("source"))
    val overall = gini(graft.operators.GlobalRank.withRank(
      docs, Seq(col("x"), col("doc_id")), "rk"), lit("ALL"))
    perSource.unionByName(overall).orderBy("source")
  }

  private[graft] val KCenterRounds = 5

  /** q203: K-CENTER DIVERSITY CORESET — Gonzalez farthest-point
    * traversal over the embedding store: seed = smallest vec_id, then
    * repeatedly pick the vector MINIMIZING its max-cosine to the
    * selected set (≡ maximizing its min cosine-distance — the 2-approx
    * k-center rule). The diversity-sampling primitive behind eval-set
    * construction and dedup-aware subset selection: where q163 greedily
    * covers SHINGLES, this greedily spreads in EMBEDDING space.
    *
    * Exactness: every pair cosine settles to micro-units through the
    * q185 recipe (codegen kernel ≡ the oracle's left-to-right fold),
    * so selection compares integers; ties break on vec_id.
    *
    * Scale (the incremental-dmax trick): each round updates the
    * frontier against ONLY the newly-picked center — one broadcast
    * 1-row cross join + greatest() over the materialized (vec, dmax)
    * frame — so k rounds cost k corpus passes, not k·|selected|. The
    * per-round argmin is a map-side-combining min_by aggregate
    * (metadata-sized collect, the q163 precedent).
    */
  private val qKCenter: Q = (spark, dir) => {
    def cosMicro(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(Similarity.cosine(a, b) * 1000000).cast("long")
    val e0 = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val seed = Dedup.materialize(e0.orderBy("vec_id").limit(1))
    val seedId = seed.select("vec_id").collect()(0).getLong(0)
    var cur = Dedup.materialize(
      e0.filter(col("vec_id") =!= seedId)
        .crossJoin(broadcast(seed.select(col("v").as("cv"))))
        .select(col("vec_id"), col("v"), cosMicro(col("v"), col("cv")).as("dmax")))
    var picks = List((1L, seedId, -1L))
    (2 to KCenterRounds).foreach { round =>
      val top = cur.agg(min_by(struct(col("vec_id"), col("dmax")),
          struct(col("dmax"), col("vec_id"))).as("b"))
        .select(col("b.vec_id"), col("b.dmax")).collect()(0)
      val (id, dm) = (top.getLong(0), top.getLong(1))
      picks ::= (round.toLong, id, dm)
      val c = cur.filter(col("vec_id") === id).select(col("v").as("cv"))
      cur = Dedup.materialize(
        cur.filter(col("vec_id") =!= id).crossJoin(broadcast(c))
          .select(col("vec_id"), col("v"),
            greatest(col("dmax"), cosMicro(col("v"), col("cv"))).as("dmax")))
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picks.reverse.map(p => Row(p._1, p._2, p._3)), 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("dmax_micro", LongType, nullable = false))))
      .orderBy("round")
  }

  /** q205: CROSS-SOURCE QUANTILE NORMALIZATION — map every document's
    * WITHIN-SOURCE length rank onto the GLOBAL length distribution
    * (x_norm = the global value at rank ⌊r·n_g / n_s⌋), the classic
    * batch-effect remover: after it, every source's normalized
    * distribution is the same, so a single global threshold cuts the
    * same quantile from each domain without the per-source windows
    * q119 needs at query time. Rank-based end-to-end — no float
    * quantile interpolation, no knife edges.
    *
    * Scale: within-source ranks are source-partitioned windows; the
    * global sorted table is [[graft.operators.GlobalRank]] (no
    * single-partition window); the lookup is ONE shuffle join on the
    * integer target rank.
    */
  private val qQuantileNorm: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents").select(
      col("source"), col("doc_id"), col("n_chars").as("x"))
    val ng = docs.agg(count(lit(1)).as("n_g"))
    val bySource = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("x", "doc_id")).cast("long"))
      .withColumn("n_s", count(lit(1)).over(
        Window.partitionBy("source")).cast("long"))
    val global = graft.operators.GlobalRank.withRank(
        docs, Seq(col("x"), col("doc_id")), "g")
      .select(col("g"), col("x").as("x_norm"))
    bySource.crossJoin(broadcast(ng))
      .withColumn("g", expr("rk * n_g div n_s"))
      .join(global, "g")
      .select(col("source"), col("doc_id"), col("x"), col("rk"),
        col("g"), col("x_norm"))
      .orderBy("source", "doc_id")
  }

  /** q206: WASSERSTEIN-1 DRIFT MAGNITUDE — [[graft.operators.Stats
    * .wasserstein1]] between the even- and odd-doc_id halves of the
    * corpus length distribution (two crawl shards). q167's KS says
    * WHETHER distributions differ; W₁ says HOW MUCH MASS MOVED HOW
    * FAR — the quantity a drift gate thresholds, in exact integer
    * milli-chars.
    */
  private val qWasserstein: Q = (spark, dir) =>
    graft.operators.Stats.wasserstein1(
      Tables(spark, dir, "documents"),
      col("n_chars"), col("doc_id") % 2 === 0)

  /** Graded NDCG@5 constants: relevance of the true top-10 neighbor
    * at rank t is 11 − t; each DCG term settles to micro BEFORE the
    * sum (the q145 rule); the ideal DCG is a pure constant computed
    * once and interpolated into BOTH engines' texts.
    */
  private[graft] val NdcgIdealMicro: Long =
    (1 to 5).map(i => math.round(
      (11 - i) * 1000000.0 / (math.log(i + 1.0) / math.log(2.0)))).sum

  /** q207: NDCG RANKING QUALITY of the LSH ANN index — q112 measures
    * recall (did the truth show up AT ALL); NDCG@5 measures ORDER
    * (did it show up EARLY, weighted by graded relevance 11 − t of
    * the exact top-10). The metric a retrieval stack actually tunes
    * on. Per query: DCG in exact micro (each 1/log₂(p+1) term
    * micro-rounded, then an order-free integer sum), NDCG in bp by
    * integer division against the constant ideal.
    *
    * Scale: inherits q25/q26's probe shapes; the scoring join is
    * (queries × k)-sized.
    */
  private val qNdcg: Q = (spark, dir) => {
    val truth = qKnnBrute(spark, dir)
      .select(col("q_id"), col("vec_id"), col("rank").as("trank"))
    val ret = qKnnLsh(spark, dir)
      .select(col("q_id"), col("vec_id"), col("rank").as("prank"))
    val terms = ret.join(truth, Seq("q_id", "vec_id"))
      .select(col("q_id"), expr(
        "CAST(round((11 - trank) * 1000000.0 / log2(prank + 1)) AS BIGINT)")
        .as("term"))
      .groupBy("q_id").agg(sum("term").as("dcg_micro"))
    truth.select("q_id").distinct()
      .join(terms, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"))
      .withColumn("ndcg_bp", expr(s"dcg_micro * 10000 div $NdcgIdealMicro"))
      .orderBy("q_id")
  }

  /** q208: DP COUNT RELEASE (ε = 1 Laplace) — the privacy sibling of
    * q194's k-anonymity audit and q38's PII scrub: per-source doc
    * counts released with Laplace(1/ε) noise drawn by INVERSE-CDF
    * from a SEEDED uniform (the md5-prefix of the source name over
    * 2³²), so the release is reproducible, auditable, and
    * engine-exact — noise = −sign(u−½)·ln(1−2|u−½|), ln'd once per
    * GROUP (not per row) and settled to micro-units. A real release
    * would use a private seed; the mechanism, sensitivity-1 counts,
    * and inverse-CDF sampling are exactly production-shaped.
    *
    * Scale: one count aggregate; everything after is per-group
    * scalar arithmetic.
    */
  private val qDpRelease: Q = (spark, dir) => {
    val counts = Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_true"))
      .withColumn("u", expr(
        "CAST(conv(substr(md5(source), 1, 8), 16, 10) AS BIGINT) / 4294967296.0"))
      // ln(0) guard: u = ½ ± ½ exactly would blow the inverse CDF;
      // the epsilon floor is identical on both engines
      .withColumn("noise", expr(
        "-sign(u - 0.5) * ln(greatest(0.000000000001, 1.0 - 2.0 * abs(u - 0.5)))"))
    // derive micro/released in a SECOND projection (alias-capture rule)
    counts.select(col("source"), col("n_true"),
      expr("CAST(round(noise * 1000000.0) AS BIGINT)").as("noise_micro"),
      (col("n_true") + expr("CAST(round(noise) AS BIGINT)")).as("n_released"))
      .orderBy("source")
  }

  /** q211: WINSORIZED / TRIMMED ROBUST MOMENTS — the outlier-immune
    * per-source length statistics a pipeline REPORTS (where q134
    * FLAGS outliers and q71 CUTS by rank): clamp each source's bottom
    * and top 5% BY RANK to the boundary values (winsorize), and drop
    * them (trim), emitting both means in exact integer milli-chars.
    * Rank-based boundaries — value at rank ⌊n/20⌋+1 and n−⌊n/20⌋ —
    * so there is no float percentile interpolation anywhere.
    *
    * Scale: one source-partitioned rank window; the two boundary
    * values per source come from the SAME pass as conditional
    * aggregates (sum of the rank-pinned row — no second join), and
    * the clamp + moments are one more aggregate.
    */
  private val qWinsorize: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars").as("x"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("x", "doc_id")).cast("long"))
      .withColumn("n_s", count(lit(1)).over(
        Window.partitionBy("source")).cast("long"))
      .withColumn("lo", expr("n_s div 20"))
    val bounds = ranked.groupBy("source")
      .agg(sum(when(col("rk") === col("lo") + 1, col("x"))).as("p05"),
        sum(when(col("rk") === col("n_s") - col("lo"), col("x"))).as("p95"))
    ranked.join(bounds, "source")
      .withColumn("xw", least(greatest(col("x"), col("p05")), col("p95")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), max("p05").as("p05"), max("p95").as("p95"),
        sum("xw").as("sw"),
        sum(when(col("rk") > col("lo") && col("rk") <= col("n_s") - col("lo"),
          col("x"))).as("st"),
        sum(when(col("rk") > col("lo") && col("rk") <= col("n_s") - col("lo"),
          1L).otherwise(0L)).as("nt"))
      .select(col("source"), col("n_docs"), col("p05"), col("p95"),
        expr("sw * 1000 div n_docs").as("wins_mean_milli"),
        expr("st * 1000 div nt").as("trim_mean_milli"))
      .orderBy("source")
  }

  private[graft] val BootB = 20

  /** Inverse-CDF thresholds for Poisson(1) weights, P(X ≤ k) for
    * k = 0..5 — Scala-computed double literals shared VERBATIM by
    * both engines' CASE texts (shortest-round-trip toString parses to
    * the identical double everywhere).
    */
  private[graft] val BootPoissonCase: String = {
    def fact(k: Int): Double = (1 to k).product.toDouble
    val cdf = (0 to 5).map(k =>
      (0 to k).map(j => math.exp(-1.0) / fact(j)).sum)
    "CASE " + cdf.zipWithIndex.map { case (t, k) =>
      s"WHEN u < $t THEN $k" }.mkString(" ") + " ELSE 6 END"
  }

  /** q214: POISSON BOOTSTRAP STANDARD ERROR — the distributed-systems
    * form of the bootstrap (each (row, replicate) draws an independent
    * Poisson(1) inclusion weight, so no replicate ever needs a global
    * resample): [[BootB]] replicates of the corpus mean length, each
    * weight drawn DETERMINISTICALLY by inverse-CDF from the
    * md5-prefix uniform of (doc_id, replicate) — the whole uncertainty
    * estimate is reproducible and engine-exact. Replicate means are
    * exact integer milli (weighted sums + integer division); the SE
    * derives from exact integer moments of the B means with one sqrt
    * at the end.
    *
    * Scale: a bounded ×B fan-out (documented — B is a constant), one
    * (replicate)-keyed aggregate with map-side combine, then
    * metadata-sized arithmetic. The classic alternative (B global
    * resamples) is unrunnable at corpus scale; Poisson bootstrap is
    * exactly the published workaround (Chamandy et al., "Estimating
    * uncertainty for massive data streams").
    */
  private val qBootstrap: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("x"))
    val reps = spark.range(BootB).select(col("id").as("r"))
    val weighted = docs.crossJoin(broadcast(reps))
      .withColumn("u", Dedup.hash32(
        concat(col("doc_id").cast("string"), lit("_"), col("r").cast("string")),
        "boot") / lit(4294967296.0))
      .withColumn("w", expr(BootPoissonCase))
    val repMeans = weighted.groupBy("r")
      .agg(sum(col("w") * col("x")).as("swx"), sum("w").as("sw"))
      .select(expr("swx * 1000 div sw").as("m"))
    val boot = repMeans.agg(count(lit(1)).as("n_b"),
      min("m").as("boot_min_milli"), max("m").as("boot_max_milli"),
      sum("m").as("sm"), sum(col("m") * col("m")).as("smm"))
    val full = docs.agg(count(lit(1)).as("n_docs"),
      expr("sum(x) * 1000 div count(1)").as("full_mean_milli"))
    full.crossJoin(broadcast(boot))
      .select(col("n_docs"), col("full_mean_milli"), col("n_b"),
        col("boot_min_milli"), col("boot_max_milli"),
        expr("CAST(round(sqrt(CAST(n_b * smm - sm * sm AS DOUBLE)" +
          " / CAST(n_b * (n_b - 1) AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("se_micro"))
  }

  private[graft] val ShuffleAuditBuckets = 8L

  /** q215: TRAINING-ORDER SHUFFLE AUDIT — did the hash shuffle
    * actually decorrelate sources? Documents take their q56-style
    * shard bucket and their md5 training order WITHIN the bucket;
    * the audit counts adjacent same-source pairs in that order and
    * compares against the exact expectation under a uniformly random
    * permutation, E = Σ_s c_bs(c_bs − 1)/m_b per bucket — a
    * same-source run longer than chance means consecutive training
    * batches over-sample one domain (the gradient-correlation smell
    * curriculum papers warn about). Observed and expected both exact
    * integers (expectation in milli via integer division).
    *
    * Scale: one bucket-partitioned lag window (bucket count is the
    * shard count — bounded per-partition state), one (bucket, source)
    * aggregate; output is bucket-sized.
    */
  private val qShuffleAudit: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("bucket", pmod(Dedup.hash32(col("doc_id").cast("string"),
        "shard"), lit(ShuffleAuditBuckets)))
      .withColumn("ord", md5(concat(lit("ord:"), col("doc_id").cast("string"))))
    val w = Window.partitionBy("bucket").orderBy("ord", "doc_id")
    val obs = d.withColumn("prev_src", lag(col("source"), 1).over(w))
      .groupBy("bucket")
      .agg(count(lit(1)).as("m"),
        sum(when(col("prev_src") === col("source"), 1L).otherwise(0L))
          .as("obs_same"))
    val exp_ = d.groupBy("bucket", "source").agg(count(lit(1)).as("c"))
      .groupBy("bucket").agg(sum(col("c") * (col("c") - 1)).as("cc"))
    obs.join(exp_, "bucket")
      .select(col("bucket"), col("m"), col("obs_same"),
        expr("cc * 1000 div m").as("exp_same_milli"))
      .orderBy("bucket")
  }

  /** q218: COMPRESSIBILITY PROXY — per-source corpus-distinct trigram
    * shingles over total per-doc-distinct shingles, in integer bp: a
    * low ratio means documents repeat each other's phrasing
    * (boilerplate, templates, mirrored content) — the cheap
    * before-deduplication smell test the C4/Gopher pipelines run, and
    * the per-SOURCE version of what q160 measures per crawl batch.
    *
    * Scale: the one corpus pass is the shared shingle table; the
    * aggregate shuffles (source, shingle) keys with map-side combine.
    */
  private val qCompressProxy: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    val sh = Dedup.shingleTable(d, "doc_id", "text")
      .join(d.select("doc_id", "source"), "doc_id")
      .select(col("source"), explode_outer(col("sh")).as("g"))
    sh.groupBy("source")
      .agg(count(lit(1)).as("n_sh"), count_distinct(col("g")).as("n_uniq"))
      .select(col("source"), col("n_sh"), col("n_uniq"),
        expr("n_uniq * 10000 div n_sh").as("uniq_bp"))
      .orderBy("source")
  }

  /** q219: MARKOV ENTROPY RATE — one number for how PREDICTABLE the
    * event stream is: per prev-type conditional entropy
    * H(next│prev) = Σ p·(−ln p) from q93/q213's transition counts,
    * plus the corpus rate (transition-count-weighted mean) as an ALL
    * row. Low entropy = scripted/templated behavior corpus-wide — the
    * population-level reading of q213's per-user anomaly score. Each
    * cell's −ln p settles to micro once (∣types∣² cells), so every
    * output is an exact integer division of integer sums.
    */
  private val qMarkovEntropy: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val cells = trans.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("tot", sum("cnt").over(Window.partitionBy("prev_type")))
      .withColumn("s_micro", expr(
        "CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0) AS BIGINT)"))
    val perPrev = cells.groupBy("prev_type")
      .agg(sum("cnt").as("n_trans"),
        expr("sum(cnt * s_micro) div sum(cnt)").as("h_micro"))
    val all = cells.agg(sum("cnt").as("n_trans"),
        expr("sum(cnt * s_micro) div sum(cnt)").as("h_micro"))
      .select(lit("ALL").as("prev_type"), col("n_trans"), col("h_micro"))
    perPrev.unionByName(all).orderBy("prev_type")
  }

  private[graft] val OovVocabSizes = Seq(100L, 1000L)

  /** q220: VOCABULARY COVERAGE / OOV CURVE — what share of token
    * OCCURRENCES do the top-K most frequent terms cover? The
    * tokenizer-sizing measurement (complement of q122's BPE induce
    * and q145's Zipf fit): coverage at K = 100 and 1000 in integer
    * bp, with the OOV rate as its complement. Top-K selection is a
    * per-partition top-k merge on (count, term) — no global window —
    * and coverage is an exact integer division.
    */
  private val qOovCurve: Q = (spark, dir) => {
    val terms = docsFanned(spark, dir)
      .select(explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val termsM = Dedup.materialize(terms)
    val total = termsM.agg(sum("cnt").as("total"))
    OovVocabSizes.map { k =>
      termsM.orderBy(col("cnt").desc, col("term")).limit(k.toInt)
        .agg(sum("cnt").as("covered"))
        .crossJoin(broadcast(total))
        .select(lit(k).as("vocab_k"), col("covered"), col("total"),
          expr("covered * 10000 div total").as("coverage_bp"))
    }.reduce(_ unionByName _).orderBy("vocab_k")
  }

  /** q221: SIMPLIFIED SILHOUETTE — cluster-quality audit of the
    * learned IVF partition (q80's centroids): per vector, a = cosine
    * distance (1−cos) to its OWN centroid, b = distance to the nearest
    * OTHER centroid; since a ≤ b, s = (b−a)/b = (cos1−cos2)/(1−cos2)
    * ∈ [0,1], settled to micro per row. Per-list mean + ALL row
    * (list −1) — the "is K right / are these lists coherent" gate
    * before shipping an IVF index or a semdedup threshold.
    *
    * Scale: both the own-assignment and nearest-other passes are the
    * [[ivfAssign]] shape — broadcast centroids, map-side `max_by`, the
    * exchange carries ONE row per vector per pass (never corpus×K);
    * the final aggregate is list-count-sized.
    */
  private val qSilhouette: Q = (spark, dir) => {
    val e = embeddingsRepartitioned(spark, dir)
    val cents = learnedCentroids(spark, dir, e)
    val own = e.crossJoin(broadcast(cents))
      .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("vec"), col("c_id"), col("ccos")),
        struct(col("ccos"), (-col("c_id")).as("neg_c_id"))).as("best"))
      .select(col("vec_id"), col("best.vec").as("vec"),
        col("best.c_id").as("list_id"), col("best.ccos").as("cos1"))
    val s = own.crossJoin(broadcast(cents))
      .filter(col("c_id") =!= col("list_id"))
      .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max(col("list_id")).as("list_id"), max(col("cos1")).as("cos1"),
        max(col("ccos")).as("cos2"))
      .select(col("list_id"), expr(
        "CAST(round((CASE WHEN cos2 >= 1.0 THEN 0.0 ELSE (cos1 - cos2) / (1.0 - cos2) END) * 1000000) AS BIGINT)"
      ).as("s_micro"))
    val sM = Dedup.materialize(s)
    val mean = "CAST(FLOOR(CAST(sum(s_micro) AS DOUBLE) / CAST(count(1) AS DOUBLE)) AS BIGINT)"
    val per = sM.groupBy("list_id").agg(count(lit(1)).as("n_vecs"),
      expr(mean).as("mean_s_micro"))
    val all = sM.agg(count(lit(1)).as("n_vecs"), expr(mean).as("mean_s_micro"))
      .select(lit(-1L).as("list_id"), col("n_vecs"), col("mean_s_micro"))
    per.select(col("list_id").cast("long").as("list_id"), col("n_vecs"),
        col("mean_s_micro"))
      .unionByName(all).orderBy("list_id")
  }

  private[graft] val KappaPrefixChars = 200

  /** q222: LABEL-STABILITY KAPPA — Cohen's κ between the q18 langid
    * run on the FULL text and the same classifier run on only the
    * first [[KappaPrefixChars]] characters: the cheap robustness audit
    * for "can the pipeline language-route on a prefix?" (at 100 TB you
    * want to langid the first KB, not the whole document — κ says what
    * that shortcut costs beyond raw agreement, by discounting the
    * agreement two skewed labelers get for free).
    *
    * Exact rational: κ = (po−pe)/(1−pe) over the confusion counts is
    * (agree·n − Σ_l nA_l·nB_l) / (n² − Σ_l nA_l·nB_l) — integer
    * numerator and denominator; settled to micro by the sign-safe
    * floor division ((x − ((x%d + d)%d)) div d, identical on both
    * engines for any sign). One classify pass, label-count-sized
    * aggregates. Exact while n² · 10⁶ < 2⁶³ (~3·10⁶ docs; settle the
    * rational in double space beyond — the §h3 overflow rule).
    */
  private val qLangKappa: Q = (spark, dir) => {
    val d = docsFanned(spark, dir).select(
      TextAnalysis.langId(col("text")).as("a"),
      TextAnalysis.langId(substring(col("text"), 1, KappaPrefixChars)).as("b"))
    val cells = Dedup.materialize(
      d.groupBy("a", "b").agg(count(lit(1)).as("c")))
    val marg = cells.agg(sum("c").as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val pe = cells.groupBy("a").agg(sum("c").as("na"))
      .join(cells.groupBy("b").agg(sum("c").as("nb")),
        col("a") === col("b"))
      .agg(sum(col("na") * col("nb")).as("sum_prod"))
    marg.crossJoin(broadcast(pe))
      .select(col("n"), col("agree"), col("sum_prod"),
        expr("agree * 10000 div n").as("po_bp"),
        expr("(agree * n - sum_prod) * 1000000").as("num"),
        (col("n") * col("n") - col("sum_prod")).as("den"))
      .select(col("n"), col("agree"), col("sum_prod"), col("po_bp"),
        // den = 0 ⇔ pe = 1 ⇔ both labelers are the SAME point mass
        // (then po = 1 too): κ is 1 by continuity, and the guard keeps
        // a single-language corpus from dividing by zero
        expr("CASE WHEN den = 0 THEN 1000000 ELSE (num - ((num % den + den) % den)) div den END")
          .as("kappa_micro"))
  }

  /** q223: LABEL↔CLUSTER MUTUAL INFORMATION — does the learned IVF
    * coarse quantizer (q80's centroids) respect the label structure?
    * Per (label, list) cell, pointwise MI ln(N·n_lc/(n_l·n_c)) settles
    * to micro once; the corpus MI (= the cell-count-weighted mean,
    * always ≥ 0) lands in an ALL row (−1, −1). The
    * information-theoretic twin of q197's chi² independence audit,
    * pointed at cluster homogeneity — the go/no-go for using cluster
    * id as a curriculum or dedup stratum.
    *
    * Scale: one assignment pass (broadcast centroids, map-side
    * max_by), then every aggregate is grid-sized (labels × lists).
    */
  private val qClusterMi: Q = (spark, dir) => {
    val e = embeddingsRepartitioned(spark, dir)
    val cents = learnedCentroids(spark, dir, e)
    val lab = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val cells = Dedup.materialize(
      ivfAssign(e, cents).join(lab, "vec_id")
        .groupBy("label", "list_id").agg(count(lit(1)).as("n_lc")))
    val nl = cells.groupBy("label").agg(sum("n_lc").as("n_l"))
    val nc = cells.groupBy("list_id").agg(sum("n_lc").as("n_c"))
    val tot = cells.agg(sum("n_lc").as("n"))
    val pmi = cells.join(nl, "label").join(nc, "list_id")
      .crossJoin(broadcast(tot))
      .withColumn("pmi_micro", expr(
        "CAST(round(ln(CAST(n_lc AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(n_l AS DOUBLE) * CAST(n_c AS DOUBLE))) * 1000000.0) AS BIGINT)"))
    val pmiM = Dedup.materialize(
      pmi.select(col("label"), col("list_id").cast("long").as("list_id"),
        col("n_lc"), col("pmi_micro")))
    val mi = pmiM.crossJoin(broadcast(tot))
      .agg(sum("n_lc").cast("long").as("n_lc"), first(col("n")).as("nn"),
        sum(col("n_lc") * col("pmi_micro")).as("w"))
      .select(lit(-1L).as("label"), lit(-1L).as("list_id"), col("n_lc"),
        expr("(w - ((w % nn + nn) % nn)) div nn").as("pmi_micro"))
    pmiM.unionByName(mi).orderBy("label", "list_id")
  }

  private[graft] val ConformalAlpha = 10 // α = 1/10

  /** q225: SPLIT-CONFORMAL COVERAGE — the distribution-free quality
    * gate: on the q61 hash-split, the `val` slice calibrates a
    * low-quality cutoff at the k-th smallest quality micro-score,
    * k = ⌊(n_cal+1)/[[ConformalAlpha]]⌋ (the split-conformal quantile
    * for α = 1/10), and the `test` slice audits the guarantee: the
    * share of test docs at or above the cutoff should be ≈ 1−α
    * regardless of the score distribution. Rank-pinned threshold (no
    * float quantile knife-edge); coverage in exact bp.
    *
    * Scale: scoring is one codegen pass; the calibration rank is
    * [[graft.operators.GlobalRank]] (no single-partition window); the
    * threshold row and counts broadcast.
    */
  /** (doc_id, split, q_micro) — q225's scored projection, shared with
    * the streaming conformal monitor's count fold
    * (`StreamingConformalSpec`).
    */
  private[graft] def conformalScored(spark: SparkSession, dir: String): DataFrame =
    docsFanned(spark, dir).select(col("doc_id"),
        QueriesAnalytics.splitAssignment(col("doc_id")).as("split"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"), col("split"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))

  private val qConformal: Q = (spark, dir) => {
    val sM = Dedup.materialize(conformalScored(spark, dir))
    val cal = sM.filter(col("split") === "val")
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = graft.operators.GlobalRank.withRank(
      cal, Seq(col("q_micro").asc, col("doc_id").asc), "rk")
    val thr = ranked.crossJoin(broadcast(nCal))
      // greatest(1, ·): with n_cal < alpha-1 the conformal rank would
      // be 0 (no matching row on Spark but an EMPTY oracle result —
      // shape mismatch); clamping to the smallest calibration value is
      // the conservative threshold and keeps both engines one-row
      .filter(col("rk") === expr(s"greatest(1, (n_cal + 1) div $ConformalAlpha)"))
      .select(col("n_cal"), col("rk").as("k"), col("q_micro").as("thr_micro"))
    sM.filter(col("split") === "test")
      .crossJoin(broadcast(thr))
      .agg(first(col("n_cal")).as("n_cal"), first(col("k")).as("k"),
        first(col("thr_micro")).as("thr_micro"),
        count(lit(1)).as("n_test"),
        sum(when(col("q_micro") >= col("thr_micro"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), col("k"), col("thr_micro"), col("n_test"),
        col("n_covered"), expr("n_covered * 10000 div n_test").as("coverage_bp"))
  }

  /** q226: CROSS-SPLIT CONTAMINATION — near-duplicate pairs that
    * STRADDLE the q61 train/test hash split: the leakage a random
    * per-DOCUMENT split inflicts when dedup wasn't run per-CLUSTER
    * first (a train doc's near-copy sitting in test silently inflates
    * eval scores — the reason the published pipelines split by dup
    * cluster, not by doc). Pairs are q22's LSH-verified Jaccard ≥ 0.4
    * set verbatim; each pair lands in its unordered (split, split)
    * combo with counts and share in bp — the (test, train)/(train,
    * val) rows are the leak.
    *
    * Scale: everything upstream is the q21/q22 banded-LSH shape
    * (exact verify touches candidates only); the split labels join on
    * doc_id keys; the combo grid is 6 rows.
    */
  private val qSplitContamination: Q = (spark, dir) => {
    val pairs = ngramPairs(spark, dir).select("id_a", "id_b")
    val split = Tables(spark, dir, "documents").select(col("doc_id"),
      QueriesAnalytics.splitAssignment(col("doc_id")).as("sp"))
    val combos = Dedup.materialize(pairs
      .join(split.select(col("doc_id").as("id_a"), col("sp").as("sp_a")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("sp").as("sp_b")), "id_b")
      .select(least(col("sp_a"), col("sp_b")).as("split_lo"),
        greatest(col("sp_a"), col("sp_b")).as("split_hi"))
      .groupBy("split_lo", "split_hi").agg(count(lit(1)).as("n_pairs")))
    val tot = combos.agg(sum("n_pairs").as("total"))
    combos.crossJoin(broadcast(tot))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        expr("n_pairs * 10000 div total").as("share_bp"))
      .orderBy("split_lo", "split_hi")
  }

  /** q235: QUALITY–LENGTH BIAS AUDIT — is the quality score just
    * measuring document length? Per source (and corpus-wide ALL row),
    * the OLS slope and Pearson r of quality (micro) on ln(n_chars)
    * (settled to milli per doc — one libm call on an integer input,
    * identical on both engines): a large, uniform slope with high r
    * says a quality cut is a length cut in disguise, and per-source
    * slope differences say the bias is uneven — the audit behind
    * q119's per-source percentile normalization.
    *
    * Scale: one codegen scoring pass; per-source integer moment sums
    * (map-side combine, q209's both-engines-divide-the-same-integers
    * rule); output is source-sized.
    */
  private val qQualityLengthBias: Q = (spark, dir) => {
    val scored = Dedup.materialize(docsFanned(spark, dir)
      .select(col("source"), col("n_chars"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("source"),
        expr("CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000.0) AS BIGINT)").as("x"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("y")))
    def moments(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = g
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    // moment PRODUCTS in double space: n·syy overflows BIGINT beyond
    // ~5k docs × micro² values (the 10× rehearsal caught the ANSI
    // overflow). The long SUMS stay exact; both engines cast the same
    // exact longs, so the doubles — and the settled outputs — match.
    val dxx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val dyy = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val dxy = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val slopeExpr = expr(
      s"""CAST(CASE WHEN $dxx <= 0.0 THEN 0
         |ELSE round($dxy / $dxx * 1000.0) END AS BIGINT)""".stripMargin)
    val rExpr = expr(
      s"""CAST(CASE WHEN $dxx <= 0.0 OR $dyy <= 0.0 THEN 0
         |ELSE round($dxy / sqrt($dxx * $dyy) * 1000000.0)
         |END AS BIGINT)""".stripMargin)
    val per = moments(scored.groupBy("source"))
      .select(col("source"), col("n"), slopeExpr.as("slope_milli"),
        rExpr.as("r_micro"))
    val all = moments(scored.groupBy())
      .select(lit("ALL").as("source"), col("n"), slopeExpr.as("slope_milli"),
        rExpr.as("r_micro"))
    per.unionByName(all).orderBy("source")
  }

  /** q241: DEDUP THRESHOLD STABILITY (Adjusted Rand Index) — how much
    * does the cluster structure move when the Jaccard threshold
    * tightens from 0.4 to 0.5? Both clusterings run the same CC over
    * the same verified pair set (the 0.5 edges are a filter of the
    * 0.4 edges — one LSH chain, two label generations); ARI comes
    * from the exact pair-counting contingency
    * (Σ C(n_ij,2) vs its independence expectation), every count an
    * exact integer and the final ratio in micro from products taken
    * in double space (the §h3 overflow rule). ARI ≈ 1 means the
    * policy choice between thresholds barely moves cluster
    * membership; a low ARI means the dedup decision boundary is
    * load-bearing and deserves a sweep (q183).
    *
    * Scale: one LSH chain; two CC runs on edge subsets; the
    * contingency is cluster-pair-sized.
    */
  private val AriDenSql =
    "((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0 - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0))"

  private val qDedupAri: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val pairs = Dedup.materialize(ngramPairs(spark, dir)
      .select("id_a", "id_b", "jacc"))
    val compA = Dedup.connectedComponents(docs,
      pairs.select("id_a", "id_b"), "doc_id", "id_a", "id_b")
      .select(col("doc_id"), col("canonical_id").as("ca"))
    val compB = Dedup.connectedComponents(docs,
      pairs.filter(col("jacc") >= 0.5).select("id_a", "id_b"),
      "doc_id", "id_a", "id_b")
      .select(col("doc_id"), col("canonical_id").as("cb"))
    val cont = Dedup.materialize(compA.join(compB, "doc_id")
      .groupBy("ca", "cb").agg(count(lit(1)).as("m")))
    def c2(c: String) = expr(s"sum($c * ($c - 1) div 2)")
    val idx = cont.agg(c2("m").as("s_ij"), sum("m").as("n"))
    val ai = cont.groupBy("ca").agg(sum("m").as("a")).agg(c2("a").as("s_a"))
    val bj = cont.groupBy("cb").agg(sum("m").as("b")).agg(c2("b").as("s_b"))
    idx.crossJoin(broadcast(ai)).crossJoin(broadcast(bj))
      .select(col("n"), col("s_ij"), col("s_a"), col("s_b"),
        expr(
          // den <= 0 covers BOTH trivial clusterings (all singletons
          // AND everything-one-cluster): the ratio there is 0/0 — NaN
          // casts to 0 on Spark but errors on DuckDB; identical
          // trivial clusterings are ARI = 1 by convention
          s"""CAST(CASE WHEN $AriDenSql <= 0.0 THEN 1000000
            |ELSE round((CAST(s_ij AS DOUBLE)
            |  - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0))
            |  / $AriDenSql
            |  * 1000000.0) END AS BIGINT)""".stripMargin).as("ari_micro"))
  }

  /** q240: NORMALIZATION DEDUP DELTA — what does q20's normalization
    * (lower + trim + whitespace collapse) actually buy over raw-byte
    * exact dedup? Both fingerprints in one pass; per key-type, the
    * docs removable by keep-one; the delta is the casing/whitespace
    * mirror mass a raw-hash dedup would MISS — the cheap argument for
    * normalizing before hashing at 100 TB (and the guard against
    * over-normalizing: a large delta deserves a sample review).
    *
    * Like q20, the fixture plants its own duplicates (the synthetic
    * corpus has none): every doc gains an UPPERCASED, padded variant —
    * byte-distinct, normalization-equivalent — so raw dedup finds 0
    * and the delta is exactly the planted mass.
    *
    * Scale: one projection, two key-sized count aggregates, 1-row out.
    */
  private val qNormDelta: Q = (spark, dir) => {
    val d = docsFanned(spark, dir).select(col("doc_id"), col("text"))
    val dup = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(upper(col("text")), lit("  ")).as("text")))
    val keys = Dedup.materialize(dup
      .select(col("doc_id"), md5(col("text")).as("raw_fp"),
        TextAnalysis.fingerprintMd5(col("text")).as("norm_fp")))
    def removed(c: String) = keys.groupBy(col(c))
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("cnt") >= 2, col("cnt") - 1).otherwise(0L)), lit(0L))
          .as("removed"))
    val n = keys.agg(count(lit(1)).as("n_docs"))
    n.crossJoin(broadcast(removed("raw_fp")
        .select(col("removed").as("raw_removed"))))
      .crossJoin(broadcast(removed("norm_fp")
        .select(col("removed").as("norm_removed"))))
      .select(col("n_docs"), col("raw_removed"), col("norm_removed"),
        (col("norm_removed") - col("raw_removed")).as("delta_removed"))
  }

  /** q239: LSH CANDIDATE RECALL — the other half of q165's precision:
    * of all truly-similar pairs (exact Jaccard ≥ 0.4 by the q91
    * prefix-filtered all-pairs machinery at threshold 2/5 — ground
    * truth, not an estimate), what share did the banded-MinHash
    * pipeline (q22's verified pairs) actually surface? Recall in bp
    * is THE number behind band/row parameter choices — precision says
    * the candidates are clean, recall says nothing was missed, and
    * only both justify skipping the quadratic scan at 100 TB.
    *
    * Scale: truth via the prefix filter (never the full cross
    * product); the compare is one pair-keyed left join.
    */
  private val qLshRecall: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    val truth = Dedup.materialize(graft.dedup.AllPairs.similarPairs(
        Dedup.shingleTable(docs, "doc_id", "text"), "doc_id", "sh", 2, 5)
      .select("id_a", "id_b"))
    val found = ngramPairs(spark, dir)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_true"), col("n_found"),
        expr("n_found * 10000 div n_true").as("recall_bp"))
  }

  /** q238: DEDUP TOKEN SAVINGS — the budget line item for
    * cluster-keep-one dedup: across dup clusters, the tokens the
    * non-representative members carry (representative = q109's
    * keep-best-quality rule), as a share of corpus tokens in bp. The
    * doc-count dup rate (q118) overstates savings when duplicates are
    * short and understates when mirrors are long — training budgets
    * are token-denominated, so this is the number that matters.
    *
    * Scale: the q21/q31 component shapes; one scoring/count pass;
    * cluster aggregates with map-side combine; single-row output.
    */
  private val qDedupSavings: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val comp = Dedup.connectedComponents(docs,
      ngramPairs(spark, dir).select("id_a", "id_b"), "doc_id", "id_a", "id_b")
    val meta = docsFanned(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"), col("n_tok"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
    val j = Dedup.materialize(comp.join(meta, "doc_id"))
    val cz = j.groupBy("canonical_id")
      .agg(count(lit(1)).as("sz"), sum("n_tok").as("ctok"),
        max_by(col("n_tok"), struct(col("q_micro"),
          (-col("doc_id")).as("nd"))).as("rep_tok"))
    val tot = j.agg(sum("n_tok").as("corpus_tokens"))
    // conditional aggregation, not filter-then-agg: on a corpus with
    // NO dup clusters a filtered global agg still emits one all-null
    // row on Spark but zero rows from the oracle's WHERE — this shape
    // always yields one zeroed row on both engines
    cz.agg(count(when(col("sz") >= 2, 1)).as("n_clusters"),
        sum(when(col("sz") >= 2, col("sz") - 1).otherwise(0L)).as("docs_removed"),
        sum(when(col("sz") >= 2, col("ctok") - col("rep_tok")).otherwise(0L))
          .as("tokens_removed"))
      .crossJoin(broadcast(tot))
      .select(col("n_clusters"), col("docs_removed"), col("tokens_removed"),
        col("corpus_tokens"),
        expr("tokens_removed * 10000 div corpus_tokens").as("saved_bp"))
  }

  /** q231: DUP-CLUSTER QUALITY DIFFERENTIAL — what does keep-best
    * dedup actually buy? Three audited means of the quality
    * micro-score: all members of dup clusters, the best-kept
    * representative per cluster (max quality — the value keep-one
    * retention ships), and the singleton corpus as the baseline. The
    * gap between `dup_members` and `singleton` says whether
    * duplication skews low-quality (mirrors/templates) or high
    * (popular content), and `dup_best_kept` minus `dup_members` is
    * the uplift the keep-best policy earns.
    *
    * Scale: the q21/q31 edge + component shapes; quality is one
    * codegen pass; all aggregates cluster- or group-sized.
    */
  private val qDupQualityGap: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val comp = Dedup.connectedComponents(docs,
      ngramPairs(spark, dir).select("id_a", "id_b"), "doc_id", "id_a", "id_b")
    val qual = docsFanned(spark, dir)
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
    val cz = Dedup.materialize(comp.join(qual, "doc_id")
      .groupBy("canonical_id")
      .agg(count(lit(1)).as("sz"), sum("q_micro").as("sq"),
        max("q_micro").as("mq")))
    def grp(name: String, f: DataFrame => DataFrame): DataFrame = f(cz)
      .select(lit(name).as("grp"), col("n").as("n_docs"),
        expr("s div n").as("mean_q_micro"))
    grp("dup_members", _.filter(col("sz") >= 2)
        .agg(sum("sz").as("n"), sum("sq").as("s")))
      .unionByName(grp("dup_best_kept", _.filter(col("sz") >= 2)
        .agg(count(lit(1)).as("n"), sum("mq").as("s"))))
      .unionByName(grp("singleton", _.filter(col("sz") === 1)
        .agg(sum("sz").as("n"), sum("sq").as("s"))))
      .orderBy("grp")
  }

  /** q232: TOKEN-BUDGET QUALITY CUT — the planner's inverse of q71:
    * instead of "keep the top quartile", answer "which quality
    * threshold fills a target token budget (half the corpus here)?".
    * Docs ranked by (quality desc, doc_id); the token prefix sum
    * crosses the budget at exactly one doc, whose rank, quality, and
    * cumulative tokens are the answer — rank-pinned like every cut in
    * the battery, no float knife-edge, and the budget itself derives
    * from the corpus (total div 2) so the query is scale-free.
    *
    * Scale: one scoring pass; [[GlobalRank.withPrefixSums]] (no
    * single-partition window); the crossing filter is a broadcast of
    * one budget row.
    */
  private val qTokenBudget: Q = (spark, dir) => {
    val scored = docsFanned(spark, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"), col("n_tok"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
      .withColumn("__one", lit(1L))
    val cum = Dedup.materialize(graft.operators.GlobalRank.withPrefixSums(
      scored, Seq(col("q_micro").desc, col("doc_id")),
      Seq("n_tok", "__one"), Seq("cum", "rk")))
    val budget = cum.agg(sum("n_tok").as("t"))
      .select(col("t"), expr("t div 2").as("budget"))
    cum.crossJoin(broadcast(budget))
      .filter(col("cum") >= col("budget") &&
        col("cum") - col("n_tok") < col("budget"))
      .select(col("t").as("total_tokens"), col("budget"),
        col("rk").as("n_docs_kept"), col("q_micro").as("thr_q_micro"),
        col("cum").as("kept_tokens"))
  }

  private[graft] val OverMergeSizeCap = 50L

  /** q230: TRANSITIVE OVER-MERGE AUDIT — the known failure mode of
    * connected-component dedup: chains (A~B, B~C) merge documents
    * (A, C) that never passed the pairwise test themselves. For each
    * dup cluster (size 2..[[OverMergeSizeCap]] — the quadratic
    * member-pair expansion is bounded per cluster, and anything
    * larger is exactly the pathological chain this audit exists to
    * flag upstream), every intra-cluster pair is checked against the
    * DIRECT verified edge set (q22's Jaccard ≥ 0.4 on LSH candidates,
    * the same edges CC ran on): the share with no direct edge, per
    * cluster size, is the chaining risk — the number that decides
    * between cluster-keep-one and pairwise-only dedup policies.
    *
    * Scale: edges and components are the audited q21/q31 shapes; the
    * member self-join is canonical_id-keyed with the size cap bounding
    * each group; output is cluster-size-sized.
    */
  private val qOverMerge: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val pairs = Dedup.materialize(ngramPairs(spark, dir).select("id_a", "id_b"))
    val comp = Dedup.connectedComponents(docs, pairs, "doc_id", "id_a", "id_b")
    val keep = comp.groupBy("canonical_id").agg(count(lit(1)).as("sz"))
      .filter(col("sz") >= 2 && col("sz") <= OverMergeSizeCap)
    val ma = comp.select(col("canonical_id"), col("doc_id").as("id_a"))
    val mb = comp.select(col("canonical_id"), col("doc_id").as("id_b"))
    val intra = broadcast(keep).join(ma, "canonical_id").join(mb, "canonical_id")
      .filter(col("id_a") < col("id_b"))
    val flagged = Dedup.materialize(intra
      .join(pairs.withColumn("direct", lit(1L)), Seq("id_a", "id_b"), "left")
      .select(col("sz"), col("canonical_id"),
        coalesce(col("direct"), lit(0L)).as("direct")))
    val g1 = keep.groupBy("sz").agg(count(lit(1)).as("n_clusters"))
    val g2 = flagged.groupBy("sz")
      .agg(count(lit(1)).as("n_pairs"), sum("direct").as("n_direct"))
    g1.join(g2, "sz")
      .select(col("sz"), col("n_clusters"), col("n_pairs"), col("n_direct"),
        expr("(n_pairs - n_direct) * 10000 div n_pairs").as("transitive_bp"))
      .orderBy("sz")
  }

  /** q229: BRIER DECOMPOSITION (Murphy) — the classifier-eval
    * companion to q172's calibration bins: per-doc forecast
    * probability p = σ(score) (one sigmoid per doc, settled to micro),
    * docs land in q172's exact rank-ntile bins, and the Brier score
    * splits into reliability − resolution + uncertainty, each an
    * exact integer in micro² units from bin counts and micro means.
    * REL says "are the forecasts honest", RES "do they discriminate",
    * UNC is the irreducible base-rate term — the three numbers that
    * tell you whether to recalibrate or retrain.
    *
    * Scale: the score pass is q170's; the rank is GlobalRank's
    * two-phase ntile (no single-partition window); everything after
    * is bin-sized. Exact while n·10¹² < 2⁶³ (~9·10⁶ docs — the raw
    * Brier sum of micro² terms; shard or rescale to milli beyond).
    */
  private val qBrier: Q = (spark, dir) => {
    val scored = Dedup.materialize(
      nbDocScores(spark, dir).select(col("doc_id"), col("score"),
          when(col("source") === NbSeedSource, 1L).otherwise(0L).as("y"))
        .withColumn("p_micro", expr(
          "CAST(round(1000000.0 / (1.0 + exp(-CAST(score AS DOUBLE) / 1000000.0))) AS BIGINT)")))
    val binned = graft.operators.GlobalRank.withNtile(
      scored, Seq(col("score").desc, col("doc_id")), NbCalBins, "bin")
    val bins = Dedup.materialize(binned.groupBy("bin")
      .agg(count(lit(1)).as("n_k"), sum("p_micro").as("sp"), sum("y").as("pos_k"))
      .select(col("bin"), col("n_k"), col("pos_k"),
        expr("sp div n_k").as("f_micro"),
        expr("pos_k * 1000000 div n_k").as("o_micro")))
    val tot = bins.agg(sum("n_k").as("n"), sum("pos_k").as("pos"))
      .withColumn("obar", expr("pos * 1000000 div n"))
    val bs = scored.agg(count(lit(1)).as("nd"),
      sum(expr("(p_micro - y * 1000000) * (p_micro - y * 1000000)")).as("sq"))
    bins.crossJoin(broadcast(tot)).crossJoin(broadcast(bs))
      .agg(first(col("n")).as("n_docs"), first(col("obar")).as("base_rate_micro"),
        expr("first(sq div nd)").as("bs_micro2"),
        expr("sum(n_k * (f_micro - o_micro) * (f_micro - o_micro)) div first(n)").as("rel_micro2"),
        expr("sum(n_k * (o_micro - obar) * (o_micro - obar)) div first(n)").as("res_micro2"),
        expr("first(obar * (1000000 - obar))").as("unc_micro2"))
  }

  private[graft] val IsoBins = 20

  /** q243: ISOTONIC RECALIBRATION (pool-adjacent-violators) — the
    * non-parametric companion to q172's binned calibration table:
    * fit the monotone-nondecreasing step function closest (weighted
    * least squares) to the per-bin positive rates, bins ordered by
    * classifier score. Where q229 DIAGNOSES miscalibration (Murphy
    * reliability), this COMPUTES the recalibration map a serving
    * stack would apply — the standard isotonic post-hoc calibrator.
    *
    * PAV is computed by its minimax characterization
    * `fit_i = max_{j≤i} min_{k≥i} mean(y over bins j..k)` rather than
    * the sequential pooling loop: with [[IsoBins]] bins the O(B³)
    * range-mean table is metadata-sized, every range mean is ONE
    * IEEE division of exact BIGINT sums (bit-identical on both
    * engines, q205's rank discipline), and the max-of-min needs no
    * iteration — so the oracle expresses it as plain joins, no
    * recursion. Floats settle once at the very end (micro-rounding
    * the chosen fit value).
    *
    * Scale: the corpus-sized work is q229's score pass plus ONE
    * GlobalRank ntile (no single-partition window); everything after
    * the per-bin aggregate operates on B rows (B³ = 8000 combos at
    * B = 20) via broadcast joins. Exact while pos_k·10⁶ < 2⁵³
    * (doubles carry the integer sums exactly).
    */
  /** Per-doc NB forecasts (doc_id, score, y, p_micro — q229's
    * sigmoid) binned ascending into [[IsoBins]] rank-ntile bins —
    * the shared front of q243 and q251.
    */
  private def isoScored(spark: SparkSession, dir: String): DataFrame = {
    val scored = nbDocScores(spark, dir).select(col("doc_id"), col("score"),
      when(col("source") === NbSeedSource, 1L).otherwise(0L).as("y"))
      .withColumn("p_micro", expr(
        "CAST(round(1000000.0 / (1.0 + exp(-CAST(score AS DOUBLE) / 1000000.0))) AS BIGINT)"))
    // bin 1 = lowest score: isotonic expects rates nondecreasing in
    // the forecast order, so rank ascending (q229 ranks descending)
    graft.operators.GlobalRank.withNtile(
      scored, Seq(col("score"), col("doc_id")), IsoBins, "bin")
  }

  /** Bin aggregate + PAV minimax fit over [[isoScored]]'s bins:
    * (bin, n_k, pos_k, sp, fit_micro) — the shared core of q243
    * (the calibration map) and q251 (the before/after audit).
    */
  private def pavBins(binned: DataFrame): DataFrame = {
    val bins = Dedup.materialize(binned.groupBy("bin")
      .agg(count(lit(1)).as("n_k"), sum("y").as("pos_k"), sum("p_micro").as("sp")))
    // range means over bin intervals [j, k]: B² ranges, each an exact
    // integer-sum pair divided ONCE into a double
    val lo = bins.select(col("bin").as("j"))
    val hi = bins.select(col("bin").as("k"))
    val member = bins.select(col("bin").as("b"), col("n_k").as("nm"), col("pos_k").as("pm"))
    val ranges = lo.join(hi, col("j") <= col("k"))
      .join(member, col("b") >= col("j") && col("b") <= col("k"))
      .groupBy("j", "k")
      .agg(expr("CAST(sum(pm) AS DOUBLE) / CAST(sum(nm) AS DOUBLE)").as("m"))
    // minimax: inner min over k ≥ i per (i, j), then max over j ≤ i
    val iw = bins.select(col("bin").as("i"))
      .join(ranges, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("m").as("mn"))
    val fit = iw.groupBy("i").agg(max("mn").as("fit"))
    bins.join(fit, bins("bin") === fit("i"))
      .select(col("bin"), col("n_k"), col("pos_k"), col("sp"),
        expr("CAST(round(fit * 1000000.0) AS BIGINT)").as("fit_micro"))
  }

  private val qIsotonic: Q = (spark, dir) =>
    pavBins(isoScored(spark, dir))
      .select(col("bin"), col("n_k"), col("pos_k"),
        expr("pos_k * 1000000 div n_k").as("raw_micro"), col("fit_micro"))
      .orderBy("bin")

  /** q251: CALIBRATION COMPOSITION AUDIT — apply q243's isotonic map
    * back to the forecasts and re-run q229's Murphy decomposition on
    * the SAME bins, before vs after: does the calibrator actually
    * repair reliability, and what does the Brier score pay or gain?
    * The "after" forecast for every doc in bin k is fit_micro(k), so
    * the after-Brier needs no second corpus pass — it expands from
    * bin stats as Σ_k [n_k·fit² − 2·10⁶·fit·pos_k + 10¹²·pos_k].
    * Resolution is forecast-independent (it only sees observed rates)
    * and is reported once. All terms are exact integers in micro².
    *
    * Scale: ONE score+bin pass (q243's), then bin-sized arithmetic.
    * Exact while n·10¹² < 2⁶³ (q229's documented bound, ~9·10⁶ docs;
    * rescale to milli beyond).
    */
  private val qCalibratedBrier: Q = (spark, dir) => {
    val binned = isoScored(spark, dir)
    val bins = pavBins(binned)
      .withColumn("f_micro", expr("sp div n_k"))
      .withColumn("o_micro", expr("pos_k * 1000000 div n_k"))
    val bsBefore = binned.agg(count(lit(1)).as("nd"),
      sum(expr("(p_micro - y * 1000000) * (p_micro - y * 1000000)")).as("sq"))
    val tot = bins.agg(sum("n_k").as("n"), sum("pos_k").as("pos"))
      .withColumn("obar", expr("pos * 1000000 div n"))
    bins.crossJoin(broadcast(tot)).crossJoin(broadcast(bsBefore))
      .agg(first(col("n")).as("n_docs"),
        first(col("obar")).as("base_rate_micro"),
        expr("first(sq div nd)").as("bs_before_micro2"),
        expr("sum(n_k * fit_micro * fit_micro - 2000000 * fit_micro * pos_k" +
          " + 1000000000000 * pos_k) div first(n)").as("bs_after_micro2"),
        expr("sum(n_k * (f_micro - o_micro) * (f_micro - o_micro)) div first(n)")
          .as("rel_before_micro2"),
        expr("sum(n_k * (fit_micro - o_micro) * (fit_micro - o_micro)) div first(n)")
          .as("rel_after_micro2"),
        expr("sum(n_k * (o_micro - obar) * (o_micro - obar)) div first(n)")
          .as("res_micro2"))
  }

  private[graft] val TempGrid = Seq(25L, 50L, 75L, 100L, 150L, 200L, 300L, 400L)

  /** q252: TEMPERATURE SCALING (grid search) — the parametric member
    * of the calibration family (q172 bins → q229 diagnosis → q243
    * non-parametric map → this): rescale the NB logit by 1/T and pick
    * the T minimizing negative log-likelihood over a fixed
    * [[TempGrid]] (T×100 as integer literals both engines share).
    * One sigmoid+ln per (doc, T) settles each NLL term to micro
    * BEFORE summing (q145's per-term rule — order-free integer sums),
    * with p clamped to [1e-12, 1−1e-12] so saturated logits at small
    * T stay finite and portable. is_best compares exact integer NLL
    * sums.
    *
    * Scale: one score pass, then a grid-bounded fan-out (|grid| rows
    * per doc) into a map-side-combining per-T aggregate — shuffle
    * carries |grid| keys; everything after is grid-sized. Exact while
    * n·2.8·10⁷ < 2⁶³ (the clamp bounds each term by −ln 10⁻¹² ≈ 27.6).
    */
  private val qTempScaling: Q = (spark, dir) => {
    val scored = nbDocScores(spark, dir).select(col("score"),
      when(col("source") === NbSeedSource, 1L).otherwise(0L).as("y"))
    val terms = scored
      .withColumn("t_x100", explode(array(TempGrid.map(lit): _*)))
      .withColumn("p", expr(
        "1.0 / (1.0 + exp(-(CAST(score AS DOUBLE) / 1000000.0) / (CAST(t_x100 AS DOUBLE) / 100.0)))"))
      .withColumn("term_micro", expr(
        """CASE WHEN y = 1
          |  THEN CAST(round(-ln(least(greatest(p, 1e-12), 1.0 - 1e-12)) * 1000000.0) AS BIGINT)
          |  ELSE CAST(round(-ln(least(greatest(1.0 - p, 1e-12), 1.0 - 1e-12)) * 1000000.0) AS BIGINT)
          |END""".stripMargin))
    val byT = Dedup.materialize(terms.groupBy("t_x100")
      .agg(count(lit(1)).as("n_docs"), sum("term_micro").as("nll_micro")))
    val best = byT.agg(min("nll_micro").as("best_nll"))
    byT.crossJoin(broadcast(best))
      .select(col("t_x100"), col("n_docs"), col("nll_micro"),
        (col("nll_micro") === col("best_nll")).cast("long").as("is_best"))
      .orderBy("t_x100")
  }

  private[graft] val AlphaTemp = 0.3

  /** q248: α-TEMPERATURE MIXTURE (w_s ∝ n_s^α, α = [[AlphaTemp]]) —
    * the multilingual sampling rule (mT5/XLM-R style): exponentiating
    * token shares below 1 lifts low-resource sources and caps the
    * head, the static counterpart of q228's learned DoReMi update.
    * The power settles ONCE per source (`exp(α·ln n)` — one libm
    * composition on a BIGINT-derived input, micro-rounded, q228's exp
    * rule), and the new weights land in exact bp by largest-remainder
    * rounding (q149's Hamilton via GlobalRank) — Σ w1_bp = 10⁴
    * exactly.
    *
    * Scale: one tokenize pass shuffling nothing but (source) keys
    * with map-side combine; everything after is source-sized.
    */
  /** The q248 weights as a pure function of the (source, n_tokens)
    * count table — everything downstream is derivable from the
    * counts, so the SAME code serves the batch query and a streaming
    * monitor's MV-folded store (`StreamingAlphaSpec`, the q228
    * precedent: fold == rebuild down to the bp).
    */
  private[graft] def alphaFromCounts(counts: DataFrame): DataFrame = {
    val src = Dedup.materialize(counts
      .withColumn("f_micro", expr(
        s"CAST(round(exp($AlphaTemp * ln(CAST(n_tokens AS DOUBLE))) * 1000000.0) AS BIGINT)")))
    val totals = src.agg(sum("f_micro").as("u"), sum("n_tokens").as("t"))
    val quotas = src.crossJoin(broadcast(totals))
      .withColumn("w0_bp", expr("n_tokens * 10000 div t"))
      .withColumn("base", expr("f_micro * 10000 div u"))
      .withColumn("rem", expr("(f_micro * 10000) % u"))
    val qM = Dedup.materialize(graft.operators.GlobalRank.withRank(
      quotas, Seq(col("rem").desc, col("source")), "rk"))
    val leftover = qM.agg((lit(10000L) - sum("base")).as("l"))
    qM.crossJoin(broadcast(leftover))
      .withColumn("w1_bp", col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L))
      .select("source", "n_tokens", "f_micro", "w0_bp", "w1_bp")
      .orderBy("source")
  }

  private val qAlphaMixture: Q = (spark, dir) =>
    alphaFromCounts(docsFanned(spark, dir)
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens")))

  /** q266: DEDUP-LADDER ATTRIBUTION — for every VERIFIED near-dup
    * pair (q22's Jaccard ≥ 0.4 edge set), which cheaper rung would
    * already have caught it: byte-exact (q20), bag-exact (q255), or
    * prefix-truncation (q244)? Pairs are attributed to the CHEAPEST
    * catching rung ('exact' → 'bag' → 'prefix' → 'near_only'), with
    * counts and bp shares — the table that prices what the expensive
    * shingle pipeline uniquely contributes, and therefore whether the
    * cheap rungs should run first as a prefilter (they dedupe for one
    * shuffle each; every pair they absorb never reaches the LSH
    * verify).
    *
    * Scale: the pair set is the audited q21/q22 chain; rung
    * indicators are two doc_id-keyed joins carrying per-doc digests
    * (md5, bag key, length — constant width, never the full text
    * twice... the prefix check alone ships both texts, bounded by the
    * verified-pair count, not the corpus).
    */
  /** The cheapest-catching-rung classifier over the paired digest
    * columns (tm, bm, len, t per side) — shared by q266 and its spec (the
    * fixture's verified pairs are all 'near_only', so the other rungs'
    * classification is pinned by `DedupLadderSpec`'s planted pairs).
    */
  private[graft] def dedupLadderRung: Column =
    when(col("tm_a") === col("tm_b"), lit("exact"))
      .when(col("bm_a") === col("bm_b"), lit("bag"))
      .when(col("len_a") < col("len_b") &&
          expr("substring(t_b, 1, CAST(len_a AS INT)) = t_a") ||
        col("len_b") < col("len_a") &&
          expr("substring(t_a, 1, CAST(len_b AS INT)) = t_b"), lit("prefix"))
      .otherwise(lit("near_only"))

  private val qDedupLadder: Q = (spark, dir) => {
    val d = docsFanned(spark, dir).select(col("doc_id"), col("text"),
      md5(col("text")).as("tm"),
      md5(concat_ws(" ", sort_array(TextAnalysis.tokens(col("text"))))).as("bm"),
      length(col("text")).cast("long").as("len"))
    val a = d.select(col("doc_id").as("id_a"), col("text").as("t_a"),
      col("tm").as("tm_a"), col("bm").as("bm_a"), col("len").as("len_a"))
    val b = d.select(col("doc_id").as("id_b"), col("text").as("t_b"),
      col("tm").as("tm_b"), col("bm").as("bm_b"), col("len").as("len_b"))
    val pairs = ngramPairs(spark, dir).select("id_a", "id_b")
      .join(a, "id_a").join(b, "id_b")
      .select(dedupLadderRung.as("rung"))
    val counts = Dedup.materialize(
      pairs.groupBy("rung").agg(count(lit(1)).as("n_pairs")))
    val tot = counts.agg(sum("n_pairs").as("t"))
    counts.crossJoin(broadcast(tot))
      .select(col("rung"), col("n_pairs"),
        expr("n_pairs * 10000 div t").as("share_bp"))
      .orderBy("rung")
  }

  private[graft] val EpochsBudgetX = 5L

  /** q264: EFFECTIVE-EPOCHS PLANNING TABLE — the consequence check on
    * q248's mixture: under a token budget of [[EpochsBudgetX]]× the
    * corpus, how many passes over each SOURCE does its α-weight imply?
    * epochs_s = budget·w_s / n_s in exact milli-epochs, flagged past
    * the ~4-epoch knee where repeating data stops buying loss
    * (Muennighoff et al., "Scaling Data-Constrained LMs") — the table
    * that says which upweighted tails will be memorized rather than
    * learned. Nests q248 (same weights, bp-exact) plus one total.
    *
    * Scale: q248's one tokenize pass; everything after is
    * source-sized. Exact while w_bp·T·5000 < 2⁶³ (~1.8·10¹¹ tokens;
    * rescale milli→centi beyond).
    */
  private val qEpochs: Q = (spark, dir) => {
    val w = Dedup.materialize(alphaFromCounts(docsFanned(spark, dir)
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))))
    val tot = w.agg(sum("n_tokens").as("t"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("w1_bp"),
        expr(s"w1_bp * t * ${EpochsBudgetX * 1000L} div (10000 * n_tokens)")
          .as("epochs_milli"))
      .withColumn("over_4ep", (col("epochs_milli") > 4000L).cast("long"))
      .orderBy("source")
  }

  private[graft] val HardNegK = 5
  private[graft] val HardNegQueries = 10

  /** q249: HARD-NEGATIVE MINING — for each query vector, the
    * [[HardNegK]] most-cosine-similar vectors with a DIFFERENT label,
    * plus the margin against the best same-label neighbor. The
    * contrastive-training data op (triplet/InfoNCE batches live or
    * die on negatives near the decision boundary): margin ≈ 0 rows
    * ARE the hard negatives; margin > 0 rows are label noise
    * candidates (a wrong-label vector closer than every right-label
    * one). Ranking follows q25's discipline: per-pair cosine from the
    * shared left-to-right fold, ties pinned by vec_id.
    *
    * Scale: queries broadcast (small by contract) against one
    * candidate pass — the q25 brute shape, here the ground-truth
    * baseline; the production path composes the SAME label predicate
    * with the q26/q87 bucket probes (filter before rank, so the
    * per-probe rerank set only shrinks). Windows partition by q_id.
    */
  private val qHardNegatives: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < HardNegQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("q_vec"))
    val scored = Dedup.materialize(
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
          Similarity.cosine(col("q_vec"), col("v")).as("cos")))
    val negW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val neg = scored.filter(col("label") =!= col("q_label"))
      .withColumn("rank", row_number().over(negW).cast("long"))
      .filter(col("rank") <= HardNegK)
    val pos = scored.filter(col("label") === col("q_label"))
      .groupBy("q_id").agg(max("cos").as("pos_cos"))
    neg.join(pos, "q_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"),
        col("pos_cos"), (col("cos") - col("pos_cos")).as("margin"))
      .orderBy("q_id", "rank")
  }

  /** q258: TOKENIZER FERTILITY BY LANGUAGE — chars per subword token
    * (and per whitespace token), per declared language: THE
    * multilingual tokenizer-equity metric — a language whose fertility
    * runs high pays more sequence positions per character of content,
    * so it is undertrained at equal token budgets (the motivation for
    * q248's α-mixture). Integer milli-ratios from exact char/token
    * sums; the subword proxy is q16's BPE pre-tokenization regex.
    *
    * Scale: one narrow projection (two regex counts + length per
    * row), one lang-keyed aggregate with map-side combine.
    */
  private val qFertility: Q = (spark, dir) => {
    docsFanned(spark, dir)
      .select(col("lang"), length(col("text")).cast("long").as("nc"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("nb"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("n_chars"),
        sum("nb").as("n_bpe"), sum("nt").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("n_bpe"),
        col("n_tokens"),
        expr("n_chars * 1000 div n_bpe").as("bpe_fertility_milli"),
        expr("n_chars * 1000 div n_tokens").as("tok_fertility_milli"))
      .orderBy("lang")
  }

  private[graft] val SentSplitRe = """[.!?]+\s+"""

  /** q259: SENTENCE SEGMENTATION STATS — the missing granularity
    * between q16's tokens and q69's fixed windows: split on
    * sentence-terminal punctuation runs ([[SentSplitRe]] — consuming,
    * not lookbehind: the Java∩RE2 portability rule) and report
    * per-source sentence counts and length moments. The packing /
    * boilerplate / readability pipelines all key on sentence shape;
    * a source whose "sentences" run hundreds of chars is markup or
    * code, not prose — this is the query that flags it.
    *
    * Scale: one regex-split projection + bounded explode (segments
    * per doc ≤ doc length), one source-keyed aggregate; empty
    * segments filtered identically on both engines so trailing-
    * separator semantics can't diverge.
    */
  private val qSentences: Q = (spark, dir) => {
    val segs = docsFanned(spark, dir)
      .select(col("source"), col("doc_id"),
        explode_outer(split(col("text"), SentSplitRe)).as("seg"))
      .filter(length(col("seg")) > 0)
      .select(col("source"), col("doc_id"), length(col("seg")).cast("long").as("sl"))
    val perSource = segs.groupBy("source")
      .agg(count(lit(1)).as("n_sentences"), sum("sl").as("sum_chars"),
        max("sl").as("max_sent_chars"))
    val docs = docsFanned(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    docs.join(perSource, "source")
      .select(col("source"), col("n_docs"), col("n_sentences"),
        expr("n_sentences * 1000 div n_docs").as("sent_per_doc_milli"),
        expr("sum_chars * 1000 div n_sentences").as("mean_sent_chars_milli"),
        col("max_sent_chars"))
      .orderBy("source")
  }

  private[graft] val BowReorderOffset = 2000000L

  /** q255: BAG-OF-WORDS DEDUP — exact duplicate grouping on the
    * ORDER-INSENSITIVE token multiset key (md5 of the sorted token
    * list): catches reshuffled boilerplate, reordered list pages and
    * template permutations that byte-exact q20 misses and that
    * shingle Jaccard only scores fuzzily — the cheap middle rung of
    * the dedup ladder (byte-exact → bag-exact → near-dup).
    * `n_distinct_texts > 1` rows are the groups ONLY this rung merges.
    * Reordered copies are synthesized deterministically (every 9th
    * doc contributes its token-REVERSED twin under doc_id +
    * [[BowReorderOffset]] — byte-distinct, bag-identical) so the
    * detector has known artifacts to find alongside any natural ones
    * (the fixture has none — q244's planting rationale).
    *
    * Scale: one tokenize+sort projection (per-row cost bounded by doc
    * length), one md5-keyed shuffle with map-side combine — q20's
    * shape with a different key.
    */
  private val qBowDups: Q = (spark, dir) => {
    val base = docsFanned(spark, dir).select(col("doc_id"), col("text"))
    val reordered = base.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + lit(BowReorderOffset)).as("doc_id"),
        concat_ws(" ", reverse(TextAnalysis.tokens(col("text")))).as("text"))
    val d = base.unionByName(reordered).select(col("doc_id"),
      md5(col("text")).as("text_md5"),
      md5(concat_ws(" ", sort_array(TextAnalysis.tokens(col("text"))))).as("bow_key"))
    d.groupBy("bow_key")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"),
        count_distinct(col("text_md5")).as("n_distinct_texts"))
      .filter(col("n_docs") >= 2)
      .orderBy("canonical_id")
  }

  private[graft] val HashBuckets = 4096L

  /** q256: FEATURE-HASHING COLLISION AUDIT — the hashing trick maps
    * an unbounded vocabulary into [[HashBuckets]] buckets; this
    * measures what that costs on THIS corpus: vocabulary size, buckets
    * touched, terms sharing a bucket (collision bp) and — the number
    * that matters for model quality — the OCCURRENCE mass sitting in
    * collided buckets. The go/no-go audit before replacing a vocab
    * table with a hash layer.
    *
    * Scale: one tokenize pass → term-keyed count (map-side combine) →
    * bucket-keyed aggregate; output is one row. The portable
    * md5-prefix hash is the house cross-engine idiom.
    */
  private val qFeatureHashing: Q = (spark, dir) => {
    val toks = docsFanned(spark, dir)
      .select(explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
    val terms = toks.groupBy("term").agg(count(lit(1)).as("occ"))
      .withColumn("bucket", expr(
        s"CAST(conv(substr(md5(term), 1, 8), 16, 10) AS BIGINT) % $HashBuckets"))
    val buckets = terms.groupBy("bucket")
      .agg(count(lit(1)).as("n_terms_b"), sum("occ").as("occ_b"))
    buckets.agg(sum("n_terms_b").as("n_terms"),
        count(lit(1)).as("buckets_used"),
        sum(when(col("n_terms_b") >= 2, col("n_terms_b")).otherwise(0L))
          .as("collided_terms"),
        sum(when(col("n_terms_b") >= 2, col("occ_b")).otherwise(0L))
          .as("collided_mass"),
        sum("occ_b").as("total_mass"))
      .select(col("n_terms"), col("buckets_used"), col("collided_terms"),
        expr("collided_terms * 10000 div n_terms").as("collision_bp"),
        expr("collided_mass * 10000 div total_mass").as("collided_mass_bp"),
        col("total_mass"))
  }

  private[graft] val NoiseK = 5
  private[graft] val NoiseFlagAt = 4L

  /** q253: LABEL-NOISE AUDIT (k-NN disagreement) — for every labeled
    * vector, how many of its [[NoiseK]] nearest neighbors carry a
    * DIFFERENT label; per label: the mean disagreement (bp) and the
    * count flagged at ≥ [[NoiseFlagAt]]/5 (the confident-learning-
    * style "this label is probably wrong" candidates). Where q249
    * mines hard negatives for training batches and q221's silhouette
    * scores cluster cohesion, this localizes WHICH labels to send to
    * re-annotation — the data-quality loop's triage query.
    *
    * Exactness: q25's ranking discipline (same cosine fold, ties by
    * neighbor id); disagreement counts are integers end-to-end.
    *
    * Scale: the fixture-scale ground truth is the exact all-pairs
    * rank (the q91 precedent — an audit is allowed its quadratic
    * baseline at sample scale); the corpus-scale path swaps candidate
    * generation for the q29 IVF probes (identical downstream: rank,
    * vote, aggregate), auditing a stratified sample. Windows
    * partition by vec_id.
    */
  /** The exact top-[[NoiseK]] neighbor list (vec_id, label, n_id,
    * n_label) — shared by q253's noise votes and q261's hubness
    * in-degrees. Norms once per VECTOR (not per pair); the pair
    * kernel is one codegen dot + a division.
    */
  private def knnTopNeighbors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val other = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      col("v").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("n_id"))
    e.join(other, col("vec_id") =!= col("n_id"))
      .withColumn("cos",
        Similarity.dot(col("v"), col("nv")) / (col("nrm") * col("nn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= NoiseK)
      .select("vec_id", "label", "n_id", "n_label")
  }

  private val qLabelNoise: Q = (spark, dir) => {
    val votes = knnTopNeighbors(spark, dir)
      .groupBy("vec_id", "label")
      .agg(sum(when(col("n_label") =!= col("label"), 1L).otherwise(0L))
        .as("disagree"))
    votes.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        expr(s"sum(disagree) * 10000 div (count(1) * $NoiseK)").as("disagree_bp"),
        sum(when(col("disagree") >= NoiseFlagAt, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy("label")
  }

  /** q261: HUBNESS AUDIT — the k-occurrence histogram of the exact
    * 5-NN graph: how often each vector appears in OTHER vectors'
    * top-5. High-dimensional similarity spaces grow hubs (a few
    * points near everything) and anti-hubs (in-degree 0), which skew
    * every kNN-derived signal — q253's noise votes, q249's negative
    * pools, retrieval rerankers. The histogram (plus its max) is the
    * standard pathology check before trusting any of them.
    *
    * Scale: q253's shared neighbor list; in-degrees are one n_id-keyed
    * count, the histogram one more aggregate; anti-hubs enter via a
    * left join against the vector ids (count 0 rows are real rows).
    */
  private val qHubness: Q = (spark, dir) => {
    val indeg = knnTopNeighbors(spark, dir)
      .groupBy(col("n_id")).agg(count(lit(1)).as("occ"))
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"))
    e.join(indeg, e("vec_id") === indeg("n_id"), "left")
      .select(coalesce(col("occ"), lit(0L)).as("occ"))
      .groupBy("occ").agg(count(lit(1)).as("n_vectors"))
      .orderBy("occ")
  }

  private[graft] val CutGrid = Seq(10L, 25L, 50L, 75L, 90L)

  /** q260: QUALITY-CUT SWEEP — the curation frontier curve: for each
    * keep-top-X% cut over the quality ranking, the kept token budget,
    * mean quality, and exact-duplicate rate INSIDE the kept set. One
    * table answers "where should the cut sit" — tokens trade against
    * quality, and the dup-rate column shows whether quality selection
    * concentrates duplicates (boilerplate scores uniformly). q71
    * executes ONE cut; this prices the whole menu. Selection is BY
    * RANK on micro-settled scores (rk·100 ≤ cut·n — exact rational
    * compare, no float threshold), the q71 discipline.
    *
    * Scale: one score+rank pass (GlobalRank, no single-partition
    * window); the grid fan-out is ≤ |grid| rows per kept doc into a
    * map-side-combining per-cut aggregate.
    */
  private val qCutSweep: Q = (spark, dir) => {
    val scored = docsFanned(spark, dir).select(col("doc_id"),
      round(graft.text.TextAnalysis.qualityScore(col("text")) * 1000000)
        .cast("long").as("qm"),
      md5(col("text")).as("tm"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
    val ranked = graft.operators.GlobalRank.withRank(
      scored, Seq(col("qm").desc, col("doc_id")), "rk")
    val n = scored.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("cut", explode(array(CutGrid.map(lit): _*)))
      .filter(col("rk") * 100 <= col("cut") * col("n"))
      .groupBy("cut")
      .agg(count(lit(1)).as("n_kept"), sum("nt").as("tokens_kept"),
        expr("sum(qm) div count(1)").as("mean_q_micro"),
        count_distinct(col("tm")).as("n_distinct"))
      .select(col("cut"), col("n_kept"), col("tokens_kept"),
        col("mean_q_micro"),
        expr("(n_kept - n_distinct) * 10000 div n_kept").as("dup_bp"))
      .orderBy("cut")
  }

  private[graft] val MmrRounds = 5
  private[graft] val MmrLambdaX10 = 6L // λ = 0.6

  /** q250: MAXIMAL MARGINAL RELEVANCE — diversified top-k for the
    * query vector vec_id = 0: greedily pick
    * argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), the classic
    * redundancy-penalized re-ranking (Carbonell & Goldstein) behind
    * dedup-aware retrieval and diverse eval-set construction. Where
    * q203's k-center ignores relevance entirely and q25 ignores
    * redundancy entirely, MMR interpolates — λ = 0.6 keeps it
    * relevance-led. Every cosine settles to micro (q203's recipe), so
    * the score `6·rel − 4·maxsim` (λ-interpolation scaled ×10 — the
    * ÷10 is monotone, so dropping it changes no argmax and dodges the
    * Spark-truncating vs DuckDB-flooring integer-division split on
    * negatives) is an exact integer; ties break on vec_id.
    *
    * Scale: q203's incremental trick verbatim — each round updates the
    * frontier's max-sim against ONLY the newly-picked vector (one
    * broadcast 1-row cross join + greatest()), so k rounds cost k
    * corpus passes; the per-round argmax is a map-side-combining
    * max_by (metadata-sized collect, the q163/q203 precedent).
    */
  private val qMmr: Q = (spark, dir) => {
    def cosMicro(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(Similarity.cosine(a, b) * 1000000).cast("long")
    val e0 = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val qv = Dedup.materialize(e0.filter(col("vec_id") === 0)
      .select(col("v").as("q_vec")))
    // rel is fixed per candidate; maxsim starts at the first pick
    val rel = Dedup.materialize(
      e0.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"), col("v"), cosMicro(col("v"), col("q_vec")).as("rel")))
    val seed = rel.agg(max_by(struct(col("vec_id"), col("v"), col("rel")),
        struct(col("rel"), (-col("vec_id")).as("nid"))).as("b"))
      .select(col("b.vec_id"), col("b.v"), col("b.rel"))
    val seedRow = seed.select("vec_id", "rel").collect()(0)
    var picks = List((1L, seedRow.getLong(0), seedRow.getLong(1), -1L))
    var cur = Dedup.materialize(
      rel.filter(col("vec_id") =!= seedRow.getLong(0))
        .crossJoin(broadcast(seed.select(col("v").as("sv"))))
        .select(col("vec_id"), col("v"), col("rel"),
          cosMicro(col("v"), col("sv")).as("maxsim")))
    (2 to MmrRounds).foreach { r =>
      val scoredTop = cur
        .withColumn("score",
          expr(s"$MmrLambdaX10 * rel - ${10 - MmrLambdaX10} * maxsim"))
        .agg(max_by(struct(col("vec_id"), col("v"), col("rel"), col("score")),
          struct(col("score"), (-col("vec_id")).as("nid"))).as("b"))
        .select(col("b.vec_id"), col("b.v"), col("b.rel"), col("b.score"))
      val top = scoredTop.select("vec_id", "rel", "score").collect()(0)
      picks ::= (r.toLong, top.getLong(0), top.getLong(1), top.getLong(2))
      cur = Dedup.materialize(
        cur.filter(col("vec_id") =!= top.getLong(0))
          .crossJoin(broadcast(scoredTop.select(col("v").as("sv"))))
          .select(col("vec_id"), col("v"), col("rel"),
            greatest(col("maxsim"), cosMicro(col("v"), col("sv"))).as("maxsim")))
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picks.reverse.map(p => Row(p._1, p._2, p._3, p._4)), 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("rel_micro", LongType, nullable = false),
        StructField("score_x10micro", LongType, nullable = false))))
      .orderBy("round")
  }

  private[graft] val CoverageTauMicro = 300000L

  /** q257: CORESET COVERAGE AUDIT — the evaluation that closes the
    * selection loop: for each diversity-selection policy (q203's
    * k-center, q250's MMR, and the naive first-k baseline), what
    * fraction of the corpus lies within cos ≥ τ of SOME selected
    * vector? k-center maximizes exactly this kind of radius coverage;
    * MMR trades some of it for relevance; first-k is the control —
    * the three-way number that justifies paying for either greedy
    * loop. Membership compares micro-settled integers against the τ
    * literal (no float knife edge); pick sets come from the SAME
    * audited loops the battery already runs.
    *
    * Scale: pick sets are k-sized (broadcast); coverage is ONE corpus
    * pass against 3k broadcast vectors; distinct + count aggregate
    * after. The greedy loops' own scale story is q203/q250's.
    */
  private val qCoresetCoverage: Q = (spark, dir) => {
    def cosMicro(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(Similarity.cosine(a, b) * 1000000).cast("long")
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val first = e.orderBy("vec_id").limit(KCenterRounds)
      .select(lit("first5").as("method"), col("vec_id"))
    val kc = qKCenter(spark, dir).select(lit("kcenter").as("method"), col("vec_id"))
    val mm = qMmr(spark, dir).select(lit("mmr").as("method"), col("vec_id"))
    val picks = kc.unionByName(mm).unionByName(first)
      .join(e.select(col("vec_id"), col("v").as("pv")), "vec_id")
      .select(col("method"), col("pv"))
    val covered = e.crossJoin(broadcast(picks))
      .filter(cosMicro(col("v"), col("pv")) >= CoverageTauMicro)
      .select("method", "vec_id").distinct()
      .groupBy("method").agg(count(lit(1)).as("covered"))
    val tot = e.agg(count(lit(1)).as("total"))
    covered.crossJoin(broadcast(tot))
      .select(col("method"), col("covered"), col("total"),
        expr("covered * 10000 div total").as("coverage_bp"))
      .orderBy("method")
  }

  private[graft] val PrefixBlock = 32
  private[graft] val PrefixTruncOffset = 1000000L

  /** q244: PREFIX-TRUNCATION DUPLICATES — exact detection of documents
    * that are a strict character-level PREFIX of another document, the
    * crawl artifact q21/q22 structurally under-weight (a truncated
    * fetch shares all its shingles with its parent but Jaccard divides
    * by the PARENT's size) and q104's shingle containment only
    * approximates (set containment ignores order — a shuffled quote
    * scores 1.0, a true truncation is the ORDERED relation). Classic
    * cause: re-crawls cut by content-length caps, paywall folds,
    * streaming disconnects. Truncated copies are synthesized
    * deterministically (every 7th doc contributes its first-half
    * prefix under doc_id + [[PrefixTruncOffset]]) so the detector has
    * known artifacts to find alongside any natural ones.
    *
    * Scale: candidate generation blocks on the first [[PrefixBlock]]
    * characters — a prefix pair MUST share that block (docs shorter
    * than the block are excluded by construction, documented), so the
    * self-join keys on the block and only intra-block pairs ship
    * texts; the `substr(b, 1, len_a) = a` verify runs on collisions
    * only. Equal-length pairs (exact duplicates — q20's job) are
    * excluded by the strict len_a < len_b predicate.
    */
  private val qPrefixDups: Q = (spark, dir) => {
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val trunc = base
      .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 2 * PrefixBlock)
      .select((col("doc_id") + lit(PrefixTruncOffset)).as("doc_id"),
        expr("substring(text, 1, CAST(length(text) div 2 AS INT))").as("text"))
    val d = base.unionByName(trunc)
      .filter(length(col("text")) >= PrefixBlock)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"),
        substring(col("text"), 1, PrefixBlock).as("blk"))
    val a = d.select(col("blk"), col("doc_id").as("id_a"),
      col("text").as("t_a"), col("len").as("len_a"))
    val b = d.select(col("blk"), col("doc_id").as("id_b"),
      col("text").as("t_b"), col("len").as("len_b"))
    a.join(b, "blk")
      .filter(col("len_a") < col("len_b") &&
        expr("substring(t_b, 1, CAST(len_a AS INT)) = t_a"))
      .select(col("id_a"), col("id_b"), col("len_a"), col("len_b"),
        expr("len_a * 10000 div len_b").as("kept_bp"))
      .orderBy("id_a", "id_b")
  }

  /** q245: CROSS-SOURCE DUPLICATE FLOW — the verified near-dup edge
    * set (q22's Jaccard ≥ 0.4 on LSH candidates) aggregated into a
    * source×source flow matrix: which corpora duplicate WHICH. The
    * audit behind mixture double-counting (two "independent" sources
    * sharing mass inflate their combined weight) and crawl-overlap
    * attribution; the within/cross split decides whether dedup should
    * run per-source (cheap) or globally (required when cross flows
    * dominate). Pairs normalize to unordered (source_lo ≤ source_hi);
    * shares settle to integer basis points of the total pair count.
    *
    * Scale: the edge set is the audited q21/q22 chain; attaching
    * sources is two doc_id-keyed joins against the (doc_id, source)
    * projection; the flow table is source²-sized.
    */
  private val qDupFlow: Q = (spark, dir) => {
    val src = Tables(spark, dir, "documents").select(col("doc_id"), col("source"))
    val pairs = ngramPairs(spark, dir).select("id_a", "id_b")
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
    val flows = Dedup.materialize(pairs.groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs")))
    val tot = flows.agg(sum("n_pairs").as("t"))
    flows.crossJoin(broadcast(tot))
      .select(col("source_lo"), col("source_hi"), col("n_pairs"),
        expr("n_pairs * 10000 div t").as("share_bp"),
        (col("source_lo") === col("source_hi")).cast("long").as("within"))
      .orderBy("source_lo", "source_hi")
  }

  private[graft] val DoremiEta = 0.1

  /** q228: MIXTURE REWEIGHTING (DoReMi-style, one exact step) — the
    * domain-weight update behind learned data mixtures: each source's
    * excess-loss proxy is its token-weighted unigram cross-entropy
    * (q53's model at source granularity), and one multiplicative-
    * weights step w′_s ∝ n_s · exp(η·H_s) tilts the mixture toward
    * hard domains. Every float settles once: −ln p to micro PER TERM
    * (order-free weighted sums after that, q219's rule), the exp
    * factor to micro per SOURCE (one libm call on a BIGINT-derived
    * input), and the new weights land in exact bp by largest-remainder
    * rounding (q149's Hamilton, rank via GlobalRank) — Σ w1_bp = 10⁴
    * exactly. Exact while n_tokens·f_micro·10⁴ < 2⁶³ per source
    * (~3·10⁸ tokens at f ≈ 3·10⁶; rescale f to milli beyond).
    *
    * Scale: one tokenize pass; shuffles carry term and (source, term)
    * KEYS with map-side combine; everything after is source-sized.
    */
  /** The q228 update as a pure function of the (source, term, n_st)
    * count table — everything downstream of the counts is derivable
    * from them (corpus term counts = Σ over sources), so the SAME code
    * serves the batch query and the streaming monitor's MV-folded
    * store (`StreamingDoremiSpec`: fold == rebuild down to the bp).
    */
  private[graft] def doremiFromCounts(st: DataFrame): DataFrame = {
    val stM = Dedup.materialize(st)
    val ct = stM.groupBy("term").agg(sum("n_st").as("c"))
    val tot = stM.agg(sum("n_st").as("t"))
    val sMicro = ct.crossJoin(broadcast(tot))
      .select(col("term"), expr(
        "CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0) AS BIGINT)"
      ).as("s_micro"))
    val src = Dedup.materialize(stM.join(sMicro, "term")
      .groupBy("source")
      .agg(sum("n_st").as("n_tokens"),
        expr("sum(n_st * s_micro) div sum(n_st)").as("h_micro"))
      .withColumn("f_micro", expr(
        s"CAST(round(exp($DoremiEta * CAST(h_micro AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT)"))
      .withColumn("unnorm", col("n_tokens") * col("f_micro")))
    val totals = src.agg(sum("unnorm").as("u"), sum("n_tokens").as("t"))
    val quotas = src.crossJoin(broadcast(totals))
      .withColumn("w0_bp", expr("n_tokens * 10000 div t"))
      .withColumn("base", expr("unnorm * 10000 div u"))
      .withColumn("rem", expr("(unnorm * 10000) % u"))
    val qM = Dedup.materialize(graft.operators.GlobalRank.withRank(
      quotas, Seq(col("rem").desc, col("source")), "rk"))
    val leftover = qM.agg((lit(10000L) - sum("base")).as("l"))
    qM.crossJoin(broadcast(leftover))
      .withColumn("w1_bp", col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L))
      .select("source", "n_tokens", "h_micro", "w0_bp", "w1_bp")
      .orderBy("source")
  }

  private val qDoremi: Q = (spark, dir) =>
    doremiFromCounts(docsFanned(spark, dir)
      .select(col("source"), explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("n_st")))

  private[graft] val NeymanBudget = 1000L

  /** q190: NEYMAN ALLOCATION — q149's Hamilton apportionment upgraded
    * to optimal stratified sampling: each source's share of a
    * [[NeymanBudget]]-doc eval sample is proportional to N_h·σ_h
    * (population sigma of n_chars, from the exact integer moment sums,
    * settled to milli-units), which minimizes the estimator variance
    * for a fixed budget — the statistically-right way to size
    * per-source eval slices. Integer largest-remainder rounding, so
    * allocations are exact, sum to the budget, and are auditable.
    *
    * Scale: one moment aggregate (map-side combine), then the whole
    * method runs on the source-sized table; remainder rank via
    * [[graft.operators.GlobalRank]] (battery invariant: no
    * single-partition window even on tiny tables).
    */
  private val qNeyman: Q = (spark, dir) => {
    val strata = docsFanned(spark, dir)
      .select(col("source"), col("n_chars").as("x"))
      .groupBy("source")
      .agg(count(lit(1)).as("nh"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("sigma_milli", expr(
        "CAST(round(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)) / CAST(nh AS DOUBLE) * 1000) AS BIGINT)"))
      .withColumn("w", col("nh") * col("sigma_milli"))
    val sM = Dedup.materialize(strata)
    val tot = sM.agg(sum("w").as("wt"))
    val quotas = sM.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"w * $NeymanBudget div wt"))
      .withColumn("rem", expr(s"(w * $NeymanBudget) % wt"))
    val qM = Dedup.materialize(graft.operators.GlobalRank.withRank(
      quotas, Seq(col("rem").desc, col("source")), "rk"))
    val leftover = qM.agg((lit(NeymanBudget) - sum("base")).as("l"))
    qM.crossJoin(broadcast(leftover))
      .withColumn("alloc", col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L))
      .select("source", "nh", "sigma_milli", "base", "alloc")
      .orderBy("source")
  }

  private[graft] val KeynessTopK = 5

  /** q187: KEYNESS — each source's most DISTINCTIVE terms by
    * add-one-smoothed log-odds ratio vs the rest of the corpus
    * (the corpus-interpretability report behind "what even is this
    * source?"): per (source, term),
    * ln((c+1)/(tot_s−c+1)) − ln((C−c+1)/(T−tot_s−(C−c)+1)) settled to
    * integer micro-units per row, top-[[KeynessTopK]] per source.
    *
    * Scale: one (source, term) count pass; the global term counts
    * join on term keys; source totals and the corpus total ride one
    * broadcast; top-k is a source-partitioned window over the
    * vocab-sized table.
    */
  private val qKeyness: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = Dedup.materialize(
      docsFanned(spark, dir)
        .select(col("source"), explode_outer(TextAnalysis.tokens(col("text"))).as("term")))
    val st = toks.groupBy("source", "term").agg(count(lit(1)).as("c"))
    val tTot = toks.groupBy("term").agg(count(lit(1)).as("ct"))
    val sTot = toks.groupBy("source").agg(count(lit(1)).as("tots"))
    val gTot = toks.agg(count(lit(1)).as("tot"))
    val scored = st.join(tTot, "term")
      .join(broadcast(sTot), "source").crossJoin(broadcast(gTot))
      .withColumn("score_micro", expr(
        """CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(tots - c + 1 AS DOUBLE)) * 1000000) AS BIGINT)
          | - CAST(round(ln(CAST(ct - c + 1 AS DOUBLE)
          |   / CAST(tot - tots - (ct - c) + 1 AS DOUBLE)) * 1000000) AS BIGINT)""".stripMargin))
    val w = Window.partitionBy("source").orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= KeynessTopK)
      .select(col("source"), col("rk").cast("long").as("rk"), col("term"),
        col("score_micro"))
      .orderBy("source", "rk")
  }

  /** q188: MINHASH CALIBRATION — is the 16-hash signature's match
    * fraction actually an unbiased Jaccard estimate on THIS corpus?
    * Per signature-agreement level (0..16 matching hash positions over
    * LSH candidates): pair count, the estimator's value in bp
    * (level·10000/16), and the mean TRUE Jaccard in bp from exact
    * integer shingle counts — the sketch-quality table read before
    * trusting q21's thresholds.
    *
    * Scale: q22's chain + one zip_with over 16-element signatures;
    * 17-row output.
    */
  private val qMinhashCalibration: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.materialize(Dedup.shingleTable(docs, "doc_id", "text"))
    val s = Dedup.materialize(Dedup.minhashSigsFromShingles(sh, "doc_id", 16))
    val cands = Dedup.lshCandidates(s, "doc_id", "sig", 4, 4)
    val sigA = s.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sigB = s.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")).hint("MERGE")
    val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")).hint("MERGE")
    cands.select("id_a", "id_b")
      .join(shA, "id_a").join(shB, "id_b")
      .join(sigA, "id_a").join(sigB, "id_b")
      .select(
        expr("""aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END),
               |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin).as("matches"),
        expr("""CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 10000
               |  div CAST(size(array_union(sh_a, sh_b)) AS BIGINT)""".stripMargin).as("true_bp"))
      .groupBy("matches")
      .agg(count(lit(1)).as("n_pairs"), sum("true_bp").as("sum_true"))
      .select(col("matches"), col("n_pairs"),
        expr("matches * 10000 div 16").as("est_bp"),
        expr("sum_true div n_pairs").as("mean_true_bp"))
      .orderBy("matches")
  }

  private[graft] val IncrementMod = 17

  /** q186: INCREMENTAL WINNOW DEDUP — the crawl-increment decision
    * (q43's shape on winnowing instead of MinHash): treat every
    * doc_id ≡ 0 (mod [[IncrementMod]]) as "today's batch" and report,
    * per new doc, its corpus near-dup candidates by shared
    * fingerprints — n candidates, the best (most shared, smallest id)
    * corpus doc, clean docs kept with nulls.
    *
    * Scale: the INCREMENT's fingerprints broadcast (a day's crawl vs
    * the corpus); the corpus side is one fingerprint projection +
    * hash-local join — the corpus never reshuffles, which is the
    * whole point of incremental dedup.
    */
  private val qWinnowIncremental: Q = (spark, dir) => {
    val fps = docsFanned(spark, dir)
      .select(col("doc_id"),
        explode_outer(graft.functions.winnow_fps(lower(col("text")))).as("f"))
      .select(col("doc_id"), col("f.hash").as("h")).distinct()
    val inc = fps.filter(col("doc_id") % IncrementMod === 0)
      .select(col("doc_id").as("new_id"), col("h"))
    val corpusAll = fps.filter(col("doc_id") % IncrementMod =!= 0)
    // q171's stop-fingerprint guard, on CORPUS df: boilerplate hashes
    // would otherwise pair every new doc with most of the corpus
    val keep = corpusAll.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowMaxDf)
    val corpus = corpusAll.join(keep.select("h"), "h")
    val cand = corpus.join(broadcast(inc), "h")
      .groupBy("new_id", "doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
    val perNew = cand.groupBy("new_id")
      .agg(count(lit(1)).as("n_dup_candidates"),
        max(struct(col("n_shared"), (-col("doc_id")).as("negid"))).as("b"))
      .select(col("new_id"), col("n_dup_candidates"),
        (-col("b.negid")).as("best_dup"), col("b.n_shared").as("best_shared"))
    inc.select("new_id").distinct()
      .join(perNew, Seq("new_id"), "left_outer")
      .select(col("new_id"),
        coalesce(col("n_dup_candidates"), lit(0L)).as("n_dup_candidates"),
        col("best_dup"), col("best_shared"))
      .orderBy("new_id")
  }

  private[graft] val BoilerplateTopK = 20

  /** q177: BOILERPLATE FINGERPRINT REPORT — the top [[BoilerplateTopK]]
    * winnowing hashes by document frequency, each with its exemplar
    * occurrence (lexicographic min (doc, pos)) and the actual k-gram
    * text pulled from that exemplar: the "what IS this repeated
    * span?" report curation teams run before adding a scrub rule —
    * q171 drops these as stop-fingerprints, this query names them.
    *
    * Scale: fingerprints (≈ 2/(w+1) of grams) shuffle once on hash
    * with map-side combine; the top-k is a TakeOrdered over the
    * hash-count table; the text lookup joins the corpus against a
    * BROADCAST k-row exemplar list — the full text column never
    * shuffles.
    */
  private val qBoilerplate: Q = (spark, dir) => {
    val docs = docsFanned(spark, dir)
    val fps = docs
      .select(col("doc_id"),
        explode_outer(graft.functions.winnow_fps(lower(col("text")))).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.hash").as("h"))
    val top = Dedup.materialize(fps.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("ex"))
      .orderBy(col("df").desc, col("h")).limit(BoilerplateTopK)
      .select(col("h"), col("df"), col("ex.doc_id").as("ex_doc"),
        col("ex.pos").cast("long").as("ex_pos")))
    // corpus scan against the broadcast k-row exemplar list; only the
    // ≤ k exemplar texts ever leave their partitions
    val texts = docs
      .join(broadcast(top.select(col("ex_doc")).distinct()),
        col("doc_id") === col("ex_doc"))
      .select(col("doc_id").as("ed"), lower(col("text")).as("t"))
    top.join(broadcast(texts), col("ex_doc") === col("ed"))
      .select(col("h"), col("df"), col("ex_doc"), col("ex_pos"),
        expr(s"substring(t, CAST(ex_pos AS INT), $WinnowK)").as("gram"))
      .orderBy(col("df").desc, col("h"))
  }

  private[graft] val ContainmentBp = 5000

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25Terms = Seq("join", "stream", "vector")

  /** q108: BM25 RELEVANCE SCORING — the ranking function behind
    * retrieval-based curation (finding the corpus documents most
    * relevant to a probe query: contamination triage, topical subset
    * extraction, RAG index audits). Okapi BM25 with the standard
    * k₁ = 1.2, b = 0.75 and idf = ln(1 + (N−df+½)/(df+½)), over the
    * battery's shared lowercase-whitespace tokenizer.
    *
    * Scale shape is an inverted-index probe, not a scan-and-score:
    * tokens explode and are filtered to the [[Bm25Terms]] postings
    * BEFORE any shuffle, so the exchange carries only matching
    * (doc, term) postings — O(postings of the query terms), not
    * O(corpus tokens). Corpus stats (N, avgdl) and per-term df ride
    * in broadcasts. Per-(doc, term) contributions are pure arithmetic
    * on (tf, dl) — no float aggregation anywhere except the final
    * ≤|terms|-element per-doc sum (within the checker's 1e-9 rel-tol
    * like q21/q22's unrounded doubles).
    */
  private val qBm25: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    val toks = docs.select(col("doc_id"),
      split(trim(lower(col("text"))), "\\s+").as("ltoks"))
    val dl = Dedup.materialize(
      toks.select(col("doc_id"), size(col("ltoks")).cast("long").as("dl")))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // postings: explode → filter to query terms → count. The filter
    // sits under the aggregation's exchange, so only hits shuffle.
    // Materialized: tf feeds BOTH the score join and the df aggregate,
    // and without it the corpus tokenize+explode runs twice (explain-
    // audited; postings are tiny, the two consumers are not).
    val tf = Dedup.materialize(
      toks.select(col("doc_id"), explode_outer(col("ltoks")).as("term"))
        .filter(col("term").isin(Bm25Terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("tf")))
    val df_ = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    tf.join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * (Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) +
            lit(Bm25B) * col("dl") * col("n_docs") / col("sum_dl"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"), sum(col("contrib")).as("score"))
      .orderBy("doc_id")
  }

  /** q104: ASYMMETRIC CONTAINMENT on LSH candidates — |A∩B|/|A| (and
    * /|B|), the directed measure Jaccard can't express: a short doc
    * fully quoted inside a long one scores near-zero Jaccard (union is
    * dominated by the long doc) but containment ≈ 1 in the short→long
    * direction. This is the detector for boilerplate wrapping, quote
    * inclusion, and prefix/suffix-padded near-copies — the dup classes
    * a training-corpus pipeline must catch that symmetric dedup (q21/
    * q22) structurally misses. Emits both directions in integer basis
    * points (`n_inter·10⁴ div |side|` — no float knife edges), keeping
    * pairs where either direction ≥ [[ContainmentBp]].
    *
    * Scale shape is q22's: exact set intersection runs ONLY on pairs
    * that collide in an LSH band; the shingle table materializes once
    * and feeds signature aggregation plus both MERGE-pinned sides of
    * the verify join (sort-merge spills; a corpus-sized hash build
    * would not). NOTE: min-hash LSH recall is driven by Jaccard, so
    * high-containment/low-Jaccard pairs need the banding tuned low
    * (or a suffix-array pass, q66) at production thresholds — the
    * operator contract here is exact verification on the candidate
    * set, matching the reference battery's LSH-candidates-then-verify
    * design.
    */
  private val qContainment: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.materialize(Dedup.shingleTable(docs, "doc_id", "text"))
    val s = Dedup.minhashSigsFromShingles(sh, "doc_id", 16)
    val cands = Dedup.lshCandidates(s, "doc_id", "sig", 4, 4)
    val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")).hint("MERGE")
    val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")).hint("MERGE")
    cands.select("id_a", "id_b").join(shA, "id_a").join(shB, "id_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .select(col("id_a"), col("id_b"),
        expr("n_inter * 10000 div size(sh_a)").as("cont_ab_bp"),
        expr("n_inter * 10000 div size(sh_b)").as("cont_ba_bp"))
      .filter(greatest(col("cont_ab_bp"), col("cont_ba_bp")) >= ContainmentBp)
      .orderBy("id_a", "id_b")
  }

  /** Near-dup *groups*: connected components over the verified pair
    * graph; canonical id = component minimum. The step that turns
    * pairwise similarity into an actionable keep/drop decision.
    */
  private val qDedupGroups: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    Dedup.connectedComponents(docs, ngramPairs(spark, dir), "doc_id", "id_a", "id_b")
      .orderBy("doc_id")
  }

  /** q115: CHARACTER-ENTROPY QUALITY SIGNAL — Shannon entropy of the
    * per-document character distribution, the cheap noise detector
    * that catches what token ratios miss: base64/hex blobs and
    * minified code score HIGH (near-uniform bytes), boilerplate runs
    * and repeated-char padding score LOW — both tails are cut in
    * C4/Gopher-style cleaning. Computed as `ln n − (Σ c·ln c)/n` over
    * per-char counts.
    *
    * Scale: the groupBy(doc, code) is map-side combined, so the
    * exchange carries ≤ |docs| × |charset| rows (≈ 70/doc), NOT
    * corpus characters — the explode collapses before it ships. The
    * only float aggregation is the ≤ |charset|-term per-doc sum
    * (checker rel-tol, q108 precedent). Empty/null docs are excluded
    * on both sides (`sequence(1, 0)` steps DOWNWARD in Spark — the
    * round-6 trap).
    */
  private val qCharEntropy: Q = (spark, dir) => {
    val codes = docsFanned(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), explode_outer(expr(
        "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))"))
        .as("code"))
    val counts = codes.groupBy("doc_id", "code")
      .agg(count(lit(1)).cast("long").as("c"))
    counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).cast("long").as("n_distinct_chars"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        (log(col("n_chars").cast("double"))
          - col("clogc") / col("n_chars").cast("double")).as("entropy"))
      .orderBy("doc_id")
  }

  /** q109: DEDUP-CLUSTER REPRESENTATIVE SELECTION — the decision step
    * that turns clustering into curation: q31 keeps the MINIMUM id per
    * near-dup component (deterministic but quality-blind); a training
    * pipeline should keep the BEST member. Joins the connected
    * components with the battery's quality score (settled to integer
    * micros — the scores are bit-identical deterministic expressions,
    * but ranking on integers removes even the theoretical ULP
    * knife-edge) and emits each multi-member cluster's argmax-quality
    * representative with its member count.
    *
    * Scale: components and quality are both doc_id-keyed; the argmax
    * window partitions by cluster id (no global window), and the
    * member-count join is co-partitioned on the same key.
    */
  private val qClusterRep: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val comp = Dedup.connectedComponents(docs, ngramPairs(spark, dir),
      "doc_id", "id_a", "id_b")
    // round in a SECOND projection: an alias-shadowing select would
    // capture the rounded column in same-select dependents (q54 trap)
    val qual = docsFanned(spark, dir)
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
    val members = comp.groupBy("canonical_id")
      .agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy("canonical_id")
      .orderBy(col("q_micro").desc, col("doc_id"))
    comp.join(qual, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(members, "canonical_id")
      .filter(col("n_members") >= 2)
      .select(col("canonical_id"), col("doc_id").as("rep_doc_id"),
        col("q_micro").as("rep_q_micro"), col("n_members"))
      .orderBy("canonical_id")
  }

  /** q119: PER-SOURCE PERCENTILE-RANK NORMALIZATION of the quality
    * score — the calibration step in front of any cross-domain
    * quality cut: raw scores are not comparable across sources (a
    * mediocre doc from a clean domain outscores a good doc from a
    * noisy one), so each doc gets its quality PERCENTILE within its
    * own source, in integer basis points `(rank−1)·10⁴ div (n−1)`.
    * A global threshold over `pct_bp` then takes the same fraction
    * from every domain — q71's rank-not-value lesson applied
    * per-group. Integer end to end (quality settles to micros before
    * ranking, rank arithmetic is exact).
    *
    * Scale: one source-partitioned window (rank and the per-source
    * count share the partition's exchange); no global window, no
    * floats.
    */
  private val qPctRank: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val qual = docsFanned(spark, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("doc_id"), col("source"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
    // explicit NULLS LAST: Spark ASC defaults nulls FIRST, DuckDB
    // LAST — a null-text doc (null quality) would shift every rank
    // in its source and break oracle parity (the battery's other
    // quality rankings are DESC, where the engines happen to agree)
    val w = Window.partitionBy("source")
      .orderBy(col("q_micro").asc_nulls_last, col("doc_id"))
    val wn = Window.partitionBy("source")
    qual.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn).cast("long"))
      .select(col("doc_id"), col("source"), col("q_micro"),
        when(col("n") === 1L, lit(0L))
          .otherwise(expr("(rk - 1) * 10000 div (n - 1)")).as("pct_bp"))
      .orderBy("doc_id")
  }

  /** q118: PER-SOURCE NEAR-DUP RATE — the curation observability
    * report that tells a pipeline owner WHERE the duplication lives:
    * share of each source's documents that participate in at least
    * one verified near-dup pair (q22's edge set), in integer basis
    * points. High-dup sources are mirror/scraper domains — exactly
    * what q94's caps and q111's temperature sampling then act on;
    * this query is the measurement that justifies those knobs.
    *
    * Scale: the pair derivation is the LSH chain (shared shape with
    * q22); the report side is a doc_id semi-join + one source-keyed
    * aggregate.
    */
  private val qDupRate: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("source"))
    val pairs = ngramPairs(spark, dir)
    val dup = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
      .withColumn("is_dup", lit(1L))
    docs.join(dup, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        expr("n_dup * 10000 div n_docs").as("dup_bp"))
      .orderBy("source")
  }

  /** q121: INCREMENTAL dedup-cluster maintenance
    * ([[Dedup.incrementalComponents]]) — yesterday's component labels
    * plus today's verified pairs, folded by star contraction: each old
    * component collapses to |members| star edges, so the propagation
    * re-runs over |V|+|ΔE| edges instead of |E|+|ΔE| and converges in
    * Δ-chain-bounded iterations. The oracle IS q31's full-rebuild text
    * (it never sees the 80/20 edge split), so the driver hashes the
    * merge≡rebuild identity itself — completing the incremental
    * family: candidates (q43), SCD2 (q88), MVs (q103), components
    * (q121).
    */
  private val qCcIncremental: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    // materialized: the pair derivation feeds both split sides
    val pairs = Dedup.materialize(ngramPairs(spark, dir).select("id_a", "id_b"))
    val split = Dedup.hash32(
      concat_ws(":", col("id_a"), col("id_b")), "ccsplit") % 5
    val baseLabels = Dedup.connectedComponents(
      docs, pairs.filter(split =!= 0), "doc_id", "id_a", "id_b")
    Dedup.incrementalComponents(baseLabels, docs,
        pairs.filter(split === 0), "doc_id", "id_a", "id_b")
      .orderBy("doc_id")
  }

  /** SimHash sketch per document (32-bit sign-sum). */
  private val qDedupSimhash: Q = (spark, dir) => {
    Dedup.simhashTable(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  // one definition for the banded-SRP family's parameters — shared
  // with the streaming monitor via Similarity (the round-11 review:
  // shadowed literals diverge silently)
  private val EmbedDims = Similarity.EmbedDims
  private val NearDupCos = Similarity.NearDupCos
  private val EmbedBands = Similarity.EmbedBands

  /** Embedding-cosine near-dup via BANDED SRP ([[Similarity.srpBandKeys]]):
    * [[EmbedBands]] independent planes-per-band tables; a pair is a
    * candidate iff it shares any band key, then the exact cosine
    * filter runs on candidates only. All-pairs would be O(n²); a
    * single SRP table caps join parallelism at 2^planes buckets (the
    * round-5 scale finding) — banding gives bands*2^planes key space
    * with recall 1-(1-p^b)^L.
    *
    * The planes-per-band count is DERIVED from the corpus row count
    * ([[ScaleParams.srpBandPlanes]], the occupancy rule BASELINE §e
    * measured): fixed planes under-bucket at scale and the candidate
    * join explodes quadratically. The oracle derives the identical
    * value from `count(*)` and builds its buckets dynamically.
    */
  private val qDedupEmbed: Q = (spark, dir) => {
    val planes = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    // materialized: both sides of the candidate self-join read the
    // SAME computed band keys (self-joins don't reuse exchanges)
    val sigs = Dedup.materialize(e.select(col("vec_id"),
      explode_outer(Similarity.srpBandKeys(col("v"), EmbedBands,
        planes, EmbedDims)).as("bucket")))
    val cand = sigs.select(col("vec_id").as("id_a"), col("bucket"))
      .join(sigs.select(col("vec_id").as("id_b"), col("bucket")), "bucket")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct() // a pair can collide in >1 band
    val ea = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= NearDupCos)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy("id_a", "id_b")
  }

  /** q284: INCREMENTAL embedding dedup — q43's ingest-vs-snapshot
    * semantics applied to the q24 chain: the 25% increment
    * (`vec_id % 4 = 3`) of new vectors deduped against the full
    * corpus snapshot. The increment's exploded band buckets BROADCAST;
    * the corpus side streams past the hash join with no shuffle and
    * no sort — per-ingest cost is one corpus scan plus work
    * proportional to the increment, the exact physics
    * [[graft.streaming.StreamingAnn]] runs per micro-batch (this is
    * its declared oracle-checked twin, as q43 is to the MinHash
    * monitor). Emits every near-dup pair touching the increment,
    * normalized and cosine-verified like q24.
    */
  private val qEmbedIncremental: Q = (spark, dir) => {
    val planes = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = Dedup.materialize(
      Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
        .withColumn("buckets", Similarity.srpBandKeys(col("v"), EmbedBands,
          planes, EmbedDims)))
    val inc = e.filter(col("vec_id") % 4 === 3)
    Similarity.incrementalNearDupPairs(e, inc, "vec_id")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------- similarity

  /** Brute-force cosine top-k: exact ANN baseline. */
  private val qKnnBrute: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    Similarity.knnBrute(q, e, 10).orderBy("q_id", "rank")
  }

  /** LSH-bucketed ANN: same ranking restricted to the query's bucket.
    * Plane count derived ([[ScaleParams.lshPlanes]]): the per-probe
    * rerank set stays ~constant as the corpus grows instead of the
    * bucket scan growing linearly with n.
    */
  private val qKnnLsh: Q = (spark, dir) => {
    val planes = ScaleParams.lshPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = Tables(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    Similarity.knnLsh(q, e, 5, planes, EmbedDims).orderBy("q_id", "rank")
  }

  /** q112: ANN RECALL AUDIT — the index-quality measurement that
    * turns "approximate" from a hope into a number: per query point,
    * how many of the brute-force top-5 neighbors (q25's ground truth)
    * the single-probe LSH index (q26) and the multi-probe index (q87)
    * actually returned. Integer hit counts out of 5 — no float
    * comparisons, membership by exact (q_id, vec_id) identity under
    * the shared deterministic tie order. This is the observability
    * query a 100 TB vector store runs on a sampled query set after
    * every index rebuild; on this fixture it PROVES the README's
    * multi-probe claim (recall 0.15 → 0.48) as an oracle-checked
    * result rather than a notebook anecdote.
    *
    * Scale: ground truth runs on the sampled query set only (brute
    * top-k over queries × corpus — the audit's budget knob is the
    * sample size); the joins are (q_id, vec_id)-keyed against 5-row
    * groups.
    */
  private val qAnnRecall: Q = (spark, dir) => {
    val gt = qKnnBrute(spark, dir).filter(col("rank") <= 5)
      .select("q_id", "vec_id")
    val l = qKnnLsh(spark, dir).select("q_id", "vec_id")
    val m = qKnnLshProbe(spark, dir).select("q_id", "vec_id")
    val base = gt.select("q_id").distinct()
    val nl = gt.join(l, Seq("q_id", "vec_id"))
      .groupBy("q_id").agg(count(lit(1)).as("lsh_hits"))
    val nm = gt.join(m, Seq("q_id", "vec_id"))
      .groupBy("q_id").agg(count(lit(1)).as("mp_hits"))
    base.join(nl, Seq("q_id"), "left").join(nm, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"),
        coalesce(col("mp_hits"), lit(0L)).as("mp_hits"))
      .orderBy("q_id")
  }

  /** q87: multi-probe LSH ANN — q26's index probed at Hamming
    * distance ≤ 1 ([[Similarity.knnLshMultiProbe]]): recall recovered
    * from SRP boundary losses by exploding the QUERY side to planes+1
    * probe buckets; the corpus keeps one bucket per vector and zero
    * extra shuffles.
    */
  private val qKnnLshProbe: Q = (spark, dir) => {
    val planes = ScaleParams.lshPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = Tables(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    Similarity.knnLshMultiProbe(q, e, 5, planes, EmbedDims).orderBy("q_id", "rank")
  }

  private val JlDims = 16
  private val JlOffsets = Seq(1L, 17L, 289L)
  private val JlSample = 500L

  /** q131: random-projection (Johnson–Lindenstrauss) distortion audit
    * — the measurement that justifies projecting wide embeddings down
    * before indexing at 100 TB: each 64-dim vector maps to the 16-dim
    * vector of its signed-plane dots (the SAME deterministic ±1
    * hyperplane family the SRP index uses, so this audits the index's
    * own geometry), and a fixed offset-lattice pair sample compares
    * exact cosine against projected cosine. Output per offset: pair
    * count, mean and max absolute cosine error.
    *
    * Scale: projection is a per-row map (16 codegen dot products);
    * the audit joins a BOUNDED sample (JlSample × |offsets| pairs) —
    * the corpus-sized part never exceeds one projection pass, which
    * the real pipeline pays anyway to build the reduced index.
    */
  private val qJlDistortion: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val proj = array((0 until JlDims).map { j =>
      val plane = array((0 until EmbedDims).map(i =>
        lit(Similarity.planeSign(j, i).toDouble)): _*)
      Similarity.dot(col("v"), plane)
    }: _*)
    val ep = Dedup.materialize(e.withColumn("y", proj))
    val offsets = JlOffsets.toDF("off")
    val a = ep.filter(col("vec_id") < JlSample)
      .select(col("vec_id").as("id_a"), col("v").as("va"), col("y").as("ya"))
    val b = ep.select(col("vec_id").as("id_b"), col("v").as("vb"), col("y").as("yb"))
    a.crossJoin(broadcast(offsets))
      .withColumn("id_b", col("id_a") + col("off"))
      .join(b, "id_b")
      .withColumn("ae", abs(Similarity.cosine(col("va"), col("vb")) -
        Similarity.cosine(col("ya"), col("yb"))))
      .groupBy("off")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("ae"), 6).as("mean_abs_err"),
        round(max("ae"), 6).as("max_abs_err"))
      .orderBy("off")
  }

  private val RrfK = 60
  /** lcm(61..70): scaling each reciprocal-rank term 1/(60+rank) to an
    * EXACT integer for rank ≤ 10, so fusion scores compare with no
    * float anywhere — bit-identical ordering on both engines.
    */
  private val RrfScale = 142813628717760L

  /** q125: reciprocal-rank fusion (Cormack et al. 2009) of the three
    * approximate indexes — single-probe LSH (q26), multi-probe LSH
    * (q87), IVF (q29). RRF is THE standard zero-tuning rank combiner
    * for hybrid retrieval (vector + keyword, or several ANN indexes):
    * score(d) = Σ_lists 1/(k + rank_list(d)). A vector that several
    * cheap indexes agree on outranks a single index's artifact.
    *
    * Exactness: each term is the integer [[RrfScale]] div (60+rank)
    * (scale = lcm of all denominators), so scores are exact BIGINTs —
    * no float knife-edge in the fused ordering; ties break on vec_id.
    * Scale: inherits the three index probes (each touches ~1/√n of
    * the corpus per query); fusion itself is a (q_id, vec_id)-keyed
    * aggregation over ≤ 15 rows per query and a per-query window.
    */
  private val qRrfFusion: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val lists = Seq(qKnnLsh(spark, dir), qKnnLshProbe(spark, dir), qKnnIvf(spark, dir))
    val contribs = lists.map(_.select(col("q_id"), col("vec_id"), col("rank")))
      .reduce(_ unionByName _)
      .withColumn("c", expr(s"${RrfScale}L div ($RrfK + rank)"))
    contribs.groupBy("q_id", "vec_id")
      .agg(sum("c").as("rrf_scaled"), count(lit(1)).as("n_lists"))
      .withColumn("frank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf_scaled").desc, col("vec_id"))))
      .filter(col("frank") <= 5)
      .select("q_id", "frank", "vec_id", "rrf_scaled", "n_lists")
      .orderBy("q_id", "frank")
  }

  /** K-means K for q49 — a MODEL choice, deliberately NOT derived from
    * corpus stats (contrast [[ScaleParams.ivfLists]], which is index
    * parameterization and scales ~√n).
    */
  private val KmeansK = 8
  private val IvfProbes = 2

  /** IVF-style ANN: deterministic coarse quantizer (first K vectors as
    * centroids), one inverted list per centroid, queries probe the
    * `IvfProbes` nearest lists and rerank exactly. At 100 TB the
    * assignment is a broadcast map stage and the probe join touches
    * only nprobe/K of the corpus. The list count is derived
    * ([[ScaleParams.ivfLists]], ~√n): a constant K means each probe
    * scans a constant FRACTION of the corpus — linear probe cost —
    * while √n lists keep probe cost ~√n.
    */
  /** argmax assignment of every vector to its nearest centroid.
    * max_by, not a window rank: map-side partial aggregation means the
    * exchange carries one row per vector instead of K (a row_number
    * window would shuffle the full corpus×K crossjoin just to pick its
    * max). Tie-break = (ccos desc, smallest c_id) via -c_id.
    */
  private[graft] def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame =
    Similarity.ivfAssign(e, cents) // canonical E-step lives with the index verbs

  /** Probe the `IvfProbes` nearest lists per query and rerank exactly. */
  private def ivfProbeRerank(e: DataFrame, cents: DataFrame,
                             assign: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val probeW = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", Similarity.cosine(col("q_vec"), col("c_vec")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= IvfProbes)
      .select(col("q_id"), col("q_vec"), col("c_id").as("list_id"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes).join(assign, "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", Similarity.cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rank")
  }

  private def embeddingsRepartitioned(spark: org.apache.spark.sql.SparkSession,
                                      dir: String): DataFrame = {
    val parallelism = spark.sparkContext.defaultParallelism
    Tables(spark, dir, "embeddings").select(
        col("vec_id"), col("embedding").as("vec"))
      .repartition(parallelism, col("vec_id"))
  }

  private val qKnnIvf: Q = (spark, dir) => {
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = embeddingsRepartitioned(spark, dir)
    val cents = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    ivfProbeRerank(e, cents, ivfAssign(e, cents))
  }

  private val LloydIters = 2

  /** q80: LEARNED IVF — q49's k-means M-step composed into q29's index
    * build. The first-K-vectors quantizer is a stand-in no real 100 TB
    * ANN index would ship; here the coarse quantizer is refined by
    * [[LloydIters]] Lloyd iterations (assign → per-list component
    * mean) from the same deterministic seed before the lists are built
    * and probed.
    *
    * Oracle parity: the iteration count is a CONSTANT, so the oracle
    * unrolls it as CTE pairs; updated centroid components are
    * `round(avg, 6)` on BOTH engines, so order-of-summation ULP noise
    * in the mean cannot flip a downstream argmax assignment. Each
    * M-step shuffle carries K×dim partial sums, never vectors
    * (map-side combine), and each E-step is a broadcast argmax — the
    * whole build is `LloydIters` linear passes.
    */
  private val qIvfLearned: Q = (spark, dir) => {
    val e = embeddingsRepartitioned(spark, dir)
    val learned = learnedCentroids(spark, dir, e)
    ivfProbeRerank(e, learned, ivfAssign(e, learned))
  }

  /** q80's learned coarse quantizer, shared with the q221/q223 audits:
    * first-`lists` vectors ([[ScaleParams.ivfLists]]) refined by
    * [[LloydIters]] assign → `round(avg, 6)`-mean rounds, materialized.
    */
  private def learnedCentroids(spark: org.apache.spark.sql.SparkSession,
                               dir: String, e: DataFrame): DataFrame = {
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    var cents = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    for (_ <- 1 to LloydIters) {
      cents = ivfAssign(e, cents)
        .select(col("list_id"), posexplode(col("vec")))
        .groupBy(col("list_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c_vec"))
        .select(col("list_id").as("c_id"), col("c_vec"))
    }
    Dedup.materialize(cents)
  }

  /** q288: IVF INDEX PROBE-ECONOMICS AUDIT — for each query, which
    * inverted lists the q29 index probes and what fraction of the
    * corpus those lists hold. This is the number a persisted vector
    * index is sized by: `scan_bp` IS the I/O bill of one probe against
    * a list-partitioned index (probe bytes = candidate rows / corpus
    * rows), the same way q144 turns the layout choice into touched
    * files. Skewed lists show up here first — a hot cell holding 30%
    * of the corpus means probes that hit it pay 30% of a full scan,
    * the signal to re-learn centroids (q80) or split the cell.
    *
    * The physical twin is [[graft.sim.Similarity.persistIvfIndex]] +
    * [[graft.sim.Similarity.probePersistedIvf]]: the assignment this
    * audit aggregates, written list-partitioned and read back with
    * partition pruning (`PersistedIndexSpec` pins plan + parity with
    * q29) — build-once / query-many, where every other ANN query in
    * the battery rebuilds its index inside the query.
    *
    * Scale: assignment is q29's broadcast argmax (one corpus pass,
    * map-side combined to one row per vector); list sizes are
    * K-row metadata; the probe side is 10 queries × √n centroids
    * broadcast. Nothing here re-reads vectors after assignment.
    */
  private val qIvfAudit: Q = (spark, dir) => {
    val total = ScaleParams.tableRows(spark, dir, "embeddings")
    val lists = ScaleParams.ivfLists(total)
    val e = embeddingsRepartitioned(spark, dir)
    val cents = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    val sizes = ivfAssign(e, cents)
      .groupBy(col("list_id")).agg(count(lit(1)).as("cnt"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    Similarity.ivfProbes(q, cents, IvfProbes)
      .join(sizes, "list_id")
      .groupBy(col("q_id"))
      .agg(
        concat_ws(",", transform(sort_array(collect_list(col("list_id"))),
          x => x.cast("string"))).as("probe_lists"),
        count(lit(1)).as("n_lists"),
        sum(col("cnt")).as("cand_rows"))
      .withColumn("scan_bp", expr(s"cand_rows * 10000 div ${total}L"))
      .orderBy("q_id")
  }

  /** q290: INDEX-CHURN AUDIT — the "is a re-index worth it?" trigger
    * for a persisted IVF index (q288/`Similarity.persistIvfIndex`):
    * per seed-quantizer list, how many of its vectors would move under
    * the Lloyd-refined quantizer (q80's centroids). A persisted index
    * ages as the quantizer improves (or the corpus drifts); re-writing
    * 100 TB of inverted lists is only worth paying where cells
    * actually re-draw — high-churn lists are badly-seeded cells (the
    * refinement moved their boundary), near-zero churn means the index
    * layout is already where the better quantizer would put it.
    *
    * Scale: two broadcast-argmax assignment passes (each one linear
    * corpus pass, map-side combined to a row per vector) joined on
    * vec_id, aggregated to K rows. Nothing shuffles vectors.
    */
  private val qIndexChurn: Q = (spark, dir) => {
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = embeddingsRepartitioned(spark, dir)
    val seed = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    val a0 = ivfAssign(e, seed)
      .select(col("vec_id"), col("list_id").as("seed_list"))
    val a1 = ivfAssign(e, learnedCentroids(spark, dir, e))
      .select(col("vec_id"), col("list_id").as("new_list"))
    a0.join(a1, "vec_id")
      .groupBy(col("seed_list"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("new_list") =!= col("seed_list"), 1L)
          .otherwise(0L)).as("moved"))
      .withColumn("churn_bp", expr("moved * 10000 div n"))
      .orderBy("seed_list")
  }

  /** q293: EMBEDDING-SPACE DECONTAMINATION — the semantic complement
    * of q37's n-gram protocol: flag corpus vectors within cosine
    * [[Similarity.NearDupCos]] of ANY held-out eval vector
    * (`vec_id % 10 == 7` is the eval split). Paraphrased benchmark
    * leakage shares no 13-gram but lands next to the eval point in
    * embedding space — this is the fuzzy-decontam pass LLM data teams
    * run alongside the exact one.
    *
    * Scale shape: the eval side BROADCASTS (q37's design transposed to
    * vectors); the corpus streams past it map-side and `max_by`
    * aggregates to one row per vector with map-side combine — one
    * linear pass, vectors never shuffle. The threshold compare is
    * bit-safe cross-engine because both sides fold the same `vec_dot`
    * order (the q24 precedent).
    *
    * GUARDED (round-13, VERDICT r12 item 1 — the plan is a cross
    * product whose "small" side the query itself derives as 10% of the
    * corpus, so "benchmark-sized by contract" must be ENFORCED, not
    * asserted in prose): before the plan runs, the eval side's
    * broadcast footprint is estimated from parquet-footer metadata
    * (rows/10 × dims × 8 B — no data scan) and the call REFUSES past
    * [[Similarity.EvalBroadcastBudgetBytes]], naming the scale-safe
    * banded path (q297) — the exact discipline
    * [[graft.dedup.AllPairs.similarPairs]] established for the other
    * inherently-quadratic exact operator.
    */
  private val qEmbedDecontam: Q = (spark, dir) => embedDecontamExact(spark, dir)

  /** The guarded exact pass behind q293 — package-visible so the guard
    * is spec-testable with a tiny budget (`DecontamBandedSpec`) and the
    * recall audit (q298) can reuse the ground-truth chain.
    */
  private[graft] def embedDecontamExact(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      maxEvalBytes: Long = Similarity.EvalBroadcastBudgetBytes): DataFrame = {
    val total = ScaleParams.tableRows(spark, dir, "embeddings")
    // the eval split is vec_id % 10 == 7 → ~total/10 rows; footprint
    // estimate = rows × dims × 8 B (the broadcast relation widens the
    // float payload to doubles' order of magnitude once row overhead
    // is counted) — metadata only, the AllPairs refusal discipline
    val estBytes = (total / 10L) * Similarity.EmbedDims * 8L
    require(estBytes <= maxEvalBytes,
      s"embedDecontamExact: estimated eval-side broadcast footprint $estBytes B " +
        s"(~${total / 10L} eval vectors x ${Similarity.EmbedDims} dims) exceeds " +
        s"the broadcast budget $maxEvalBytes B. The corpus x eval cross product " +
        "is the exact GROUND TRUTH, not the production decontam path — past " +
        "broadcast scale use the SRP-banded chain (q297_embed_decontam_banded / " +
        "the q24 candidate physics), whose recall against this pass is the " +
        "measured q298_decontam_recall audit.")
    val e = embeddingsRepartitioned(spark, dir)
    val eval = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("e_id"), col("vec").as("e_vec"))
    val corpus = e.filter(col("vec_id") % 10 =!= 7)
    // the shared verdict kernel (round-15, VERDICT r14 item 3): one
    // definition with the streaming gate and the tight ground truth;
    // the unused vec payload is dropped and Catalyst prunes its agg
    Similarity.evalVerdicts(corpus, eval, Similarity.NearDupCos)
      .drop("vec")
      .orderBy("vec_id")
  }

  /** Band buckets for the DERIVED-band decontam chains: the literal
    * codegen [[Similarity.srpBandKeys]] while bands × planes fits the
    * codegen ceiling (every battery fixture does), the data-driven
    * [[Similarity.srpBandBuckets]] twin past it (the 10×+ loose-
    * threshold rehearsal points, where the derived L reaches the
    * thousands and the literal path cannot compile —
    * `SrpBandPathSpec` pins the two paths bucket-identical).
    */
  private def srpBucketsOf(e: DataFrame, idCol: String, vecCol: String,
                           bands: Int, planes: Int): DataFrame =
    if (bands * planes <= Similarity.BandKeyMaxCodegenPlanes)
      e.withColumn("__b",
          Similarity.srpBandKeys(col(vecCol), bands, planes, EmbedDims))
        .select(col(idCol), explode_outer(col("__b")).as("bucket"))
    else Similarity.srpBandBuckets(e, idCol, vecCol, bands, planes, EmbedDims)

  /** The q297 banded chain's flagged set, shared by q297 itself and
    * the q298 recall audit: corpus↔eval SRP band-bucket candidates
    * (the q24 physics with the eval split as one join side), exact
    * cosine on candidates only, per-vector argmax, threshold filter.
    */
  private def embedDecontamBandedFlags(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val planes = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    // band count DERIVED from (threshold, target recall) — round-14,
    // VERDICT r13 item 1: L = ceil(ln(1−r)/ln(1−p*^b)), the formula
    // this chain's scaladoc used to state in prose. At the loose
    // fixture threshold that is ~30 bands at 500 rows — the honest
    // price of demanding 90% recall where p* (0.597) sits barely above
    // the 0.5 noise rate; q298 measures the recall actually achieved,
    // q300 the same contract at the tight production threshold.
    val bands = ScaleParams.srpBandsFor(planes, NearDupCos,
      Similarity.DecontamRecallBp)
    val e = Dedup.materialize(
      Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", Similarity.norm(col("v"))))
    val sigs = Dedup.materialize(srpBucketsOf(e, "vec_id", "v", bands, planes))
    val cand = sigs.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id"), col("bucket"))
      .join(sigs.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id").as("e_id"), col("bucket")), "bucket")
      .select("vec_id", "e_id").distinct() // a pair can collide in >1 band
    val ec = e.select(col("vec_id"), col("v"), col("nrm"))
    val ee = e.select(col("vec_id").as("e_id"), col("v").as("e_vec"),
      col("nrm").as("e_nrm"))
    cand.join(ec, "vec_id").join(ee, "e_id")
      .withColumn("cos",
        Similarity.dot(col("v"), col("e_vec")) / (col("nrm") * col("e_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cos"), col("e_id")),
        struct(col("cos"), (-col("e_id")).as("n"))).as("b"))
      .filter(col("b.cos") >= NearDupCos)
      .select(col("vec_id"), col("b.e_id").as("near_eval_id"),
        col("b.cos").as("max_cos"))
      .orderBy("vec_id")
  }

  /** q297: BANDED EMBEDDING DECONTAMINATION — q293's 100 TB shape
    * (VERDICT r12 item 1b). The exact pass broadcasts the eval set and
    * detonates once the eval side outgrows the broadcast budget (q293's
    * guard now refuses there); this twin runs the q24 banded-SRP
    * candidate physics instead: both splits hash into [[EmbedBands]]
    * band buckets ([[ScaleParams.srpBandPlanes]] occupancy-scaled), the
    * corpus↔eval candidate set is a bucket EQUI-JOIN (shuffle keyed on
    * band buckets — no broadcast, no cross product, either side may be
    * arbitrarily large), and the exact cosine + argmax + threshold run
    * on candidates only. Output = the flagged rows (the decontam
    * verdict: drop these), `(vec_id, near_eval_id, max_cos)`.
    *
    * Semantics, stated honestly (why this does NOT share q293's oracle
    * the way q85 shares q37's): a Bloom prefilter has no false
    * negatives, so q85's candidates provably cover every exact hit;
    * SRP banding is probabilistic — a qualifying pair can miss every
    * band (at this fixture ALL qualifying pairs sit in the marginal
    * cos ∈ [0.3, 0.5) band where per-plane collision ≈ 0.6, so misses
    * are structural, not an edge case). The oracle therefore reproduces
    * the banding itself (the q24 discipline: identical md5-derived
    * planes, identical fold order), and the banded-vs-exact gap is a
    * first-class MEASURED number — q298's recall_bp — not a silent
    * approximation.
    *
    * Round-14 (VERDICT r13 item 1): the band count is no longer the
    * fixed [[EmbedBands]] — it is DERIVED from (threshold, target
    * recall) by [[ScaleParams.srpBandsFor]], the worst-case bound
    * L = ceil(ln(1−r)/ln(1−p*^b)) with p* the collision probability AT
    * the threshold, so the shipped operating point now carries a
    * ≥[[Similarity.DecontamRecallBp]] bp recall guarantee in
    * expectation instead of whatever 4 bands happened to give (32%,
    * the r13 measured number). The guarantee's PRICE is stated by the
    * derivation itself: at this loose fixture threshold (p* = 0.597 vs
    * 0.5 noise) it costs ~30 bands at 500 rows and grows toward
    * cross-product candidate volume with scale (the LSH exponent
    * ρ = ln(p∗) / ln(0.5) = 0.745 — BASELINE §n measures the curve);
    * at the tight production threshold (q299, cos ≥ 0.8, ρ = 0.33)
    * the same 90% target costs 7 bands. That asymmetry — cheap
    * guarantees exactly where production decontamination operates —
    * is the honest shape of SRP banding.
    */
  private val qEmbedDecontamBanded: Q = (spark, dir) =>
    embedDecontamBandedFlags(spark, dir)

  /** q298: DECONTAM RECALL AUDIT — of the corpus vectors the EXACT
    * pass flags (q293's ground truth), what share does the banded
    * production path (q297) catch? The q239 pattern transposed to the
    * embedding modality: precision is 1 by construction (banded flags
    * verify exact cosine ≥ the same threshold, so banded ⊆ exact), so
    * recall_bp is the single number that justifies — or refuses — the
    * banded path's parameters at scale.
    *
    * Scale: the exact side is the guarded ground-truth operator (an
    * AUDIT input, run at benchmark scale by definition — the same
    * role q91's exact all-pairs plays for q239); the compare is one
    * vec_id-keyed left join to a single row.
    */
  private val qDecontamRecall: Q = (spark, dir) => {
    val exact = embedDecontamExact(spark, dir)
      .filter(col("flagged") === 1L).select(col("vec_id"))
    val banded = embedDecontamBandedFlags(spark, dir)
      .select(col("vec_id"), lit(1L).as("hit"))
    exact.join(banded, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_banded"))
      .select(col("n_exact"), col("n_banded"),
        // empty denominator (nothing to recall) reports vacuously-full
        // recall instead of an ANSI divide-by-zero (ADVICE r13)
        expr("CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT) " +
          "ELSE n_banded * 10000 div n_exact END").as("recall_bp"))
  }

  /** The PLANTED-LEAK eval set for the tight-threshold decontam family
    * (q299/q300): each eval item is a deterministically perturbed copy
    * of the corpus row it contaminates — component i scaled by 1.45 or
    * 0.55 on the parity of md5("e" ++ vec_id ++ "_" ++ i) (the
    * portable-hash recipe, 'e'-salted so the signs are independent of
    * the SRP plane signs). The fixture's natural corpus↔eval pairs top
    * out at cos 0.49 (no tight-threshold regime exists in the data),
    * and a recall audit needs KNOWN ground truth anyway — planting is
    * how decontamination recall is validated in practice. Measured on
    * the fixture: planted pairs land at cos ∈ [0.893, 0.941], the
    * closest non-planted pair at 0.456 — both sides of the 0.8
    * threshold with ≥ 0.09 margin, and both engines compute the SAME
    * doubles (identical literals, identical fold), so the compare is
    * not even margin-dependent.
    */
  private def plantedEvalTight(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("e_id"),
        transform(col("v"), (x, i) =>
          x * when(conv(substring(md5(concat(lit("e"), col("vec_id").cast("string"),
              lit("_"), i.cast("string"))), 1, 1), 16, 10).cast("long") % 2 === 0,
            lit(1.45)).otherwise(lit(0.55))).as("e_vec"))

  /** The q299 banded chain's flagged set, shared with the q300 recall
    * audit — the q297 physics at the TIGHT production threshold
    * [[Similarity.DecontamTightCos]] against the planted eval set, the
    * corpus being the FULL table (contamination means eval rows hide
    * in the corpus). Band count derived for the same
    * [[Similarity.DecontamRecallBp]] target: at cos ≥ 0.8 the
    * per-plane collision bound is p* = 0.795, so 90% recall costs 7
    * bands at the fixture's 5 planes — versus 30 at the loose q297
    * threshold — which is the whole argument for tight-threshold
    * decontamination at 100 TB (the LSH exponent ρ = 0.33 vs 0.745).
    */
  private def decontamTightBandedFlags(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val planes = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val bands = ScaleParams.srpBandsFor(planes, Similarity.DecontamTightCos,
      Similarity.DecontamRecallBp)
    val e = Dedup.materialize(
      Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", Similarity.norm(col("v"))))
    val ev = Dedup.materialize(
      plantedEvalTight(e.select(col("vec_id"), col("v")))
        .withColumn("e_nrm", Similarity.norm(col("e_vec"))))
    val cand = srpBucketsOf(e, "vec_id", "v", bands, planes)
      .join(srpBucketsOf(ev, "e_id", "e_vec", bands, planes), "bucket")
      .select("vec_id", "e_id").distinct()
    cand.join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(ev.select(col("e_id"), col("e_vec"), col("e_nrm")), "e_id")
      .withColumn("cos",
        Similarity.dot(col("v"), col("e_vec")) / (col("nrm") * col("e_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cos"), col("e_id")),
        struct(col("cos"), (-col("e_id")).as("n"))).as("b"))
      .filter(col("b.cos") >= Similarity.DecontamTightCos)
      .select(col("vec_id"), col("b.e_id").as("near_eval_id"),
        col("b.cos").as("max_cos"))
      .orderBy("vec_id")
  }

  /** q299: TIGHT-THRESHOLD BANDED DECONTAMINATION — the production
    * operating point (VERDICT r13 item 1's proof row): the q297 chain
    * at cos ≥ [[Similarity.DecontamTightCos]] over a planted-leak eval
    * set ([[plantedEvalTight]]), band count derived for the same 90%
    * recall target. Flags exactly the contaminated corpus rows the
    * plant created; q300 measures the recall against the exact pass.
    */
  private val qDecontamTight: Q = (spark, dir) =>
    decontamTightBandedFlags(spark, dir)

  /** The exact ground truth behind q300 — the q293 broadcast shape
    * (eval side is 50 planted rows, far inside the budget; asserted
    * with the same metadata-only estimate for discipline) at the tight
    * threshold over the full contaminated corpus.
    */
  private[graft] def decontamTightExactFlags(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val total = ScaleParams.tableRows(spark, dir, "embeddings")
    val estBytes = (total / 10L) * Similarity.EmbedDims * 8L
    require(estBytes <= Similarity.EvalBroadcastBudgetBytes,
      s"decontamTightExactFlags: eval broadcast estimate $estBytes B exceeds " +
        s"budget ${Similarity.EvalBroadcastBudgetBytes} B - use the banded " +
        "q299 chain past broadcast scale")
    val e = embeddingsRepartitioned(spark, dir)
    val ev = plantedEvalTight(e.select(col("vec_id"), col("vec").as("v")))
    // same shared verdict kernel as q293 and the streaming gate
    Similarity.evalVerdicts(e, ev, Similarity.DecontamTightCos)
      .drop("vec")
      .orderBy("vec_id")
  }

  /** q300: TIGHT-THRESHOLD DECONTAM RECALL AUDIT — q298's compare at
    * the production operating point: of the corpus rows the exact pass
    * flags at cos ≥ 0.8 (the 50 planted leaks), what share does the
    * derived-band q299 chain catch? This is the row that PROVES the
    * [[ScaleParams.srpBandsFor]] derivation: the target is 9000 bp and
    * the worst-case bound is over pairs AT the threshold, while the
    * planted pairs sit at cos ≈ 0.9 (per-band collision 0.46 vs the
    * bound's 0.32), so the measured recall should clear the target
    * with room. Precision is 1 by construction, as in q298.
    */
  private val qDecontamRecallTight: Q = (spark, dir) => {
    val exact = decontamTightExactFlags(spark, dir)
      .filter(col("flagged") === 1L).select(col("vec_id"))
    val banded = decontamTightBandedFlags(spark, dir)
      .select(col("vec_id"), lit(1L).as("hit"))
    exact.join(banded, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_banded"))
      .select(col("n_exact"), col("n_banded"),
        expr("CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT) " +
          "ELSE n_banded * 10000 div n_exact END").as("recall_bp"))
  }

  /** q302: EVAL-SIDE CONTAMINATION REPORT — the decontam family's
    * other direction: q293/q297 answer "which CORPUS rows must be
    * dropped"; the report a benchmark owner actually reads is per EVAL
    * item — how many corpus rows sit within the threshold of it, and
    * how close the nearest one is. Items with heavy counts are the
    * compromised ones (their scores are memorization, not ability);
    * zero-count items are still clean and stay reportable (left join,
    * count 0, max_cos 0.0).
    *
    * Scale: the q293 broadcast shape with the aggregation flipped to
    * the eval key — eval broadcasts, the corpus streams past map-side,
    * and the groupBy(e_id) output is EVAL-sized (benchmark-sized by
    * the same contract, enforced by the same metadata-only guard that
    * names the banded chain for corpus-proportional eval sets). One
    * linear corpus pass; vectors never shuffle.
    */
  private val qDecontamReport: Q = (spark, dir) => {
    val total = ScaleParams.tableRows(spark, dir, "embeddings")
    val estBytes = (total / 10L) * Similarity.EmbedDims * 8L
    require(estBytes <= Similarity.EvalBroadcastBudgetBytes,
      s"decontamReport: eval broadcast estimate $estBytes B exceeds budget " +
        s"${Similarity.EvalBroadcastBudgetBytes} B - run the report from the " +
        "banded candidate set (q297_embed_decontam_banded physics) past " +
        "broadcast scale")
    val e = embeddingsRepartitioned(spark, dir)
    val eval = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("e_id"), col("vec").as("e_vec"))
    val corpus = e.filter(col("vec_id") % 10 =!= 7)
    val hits = corpus.crossJoin(broadcast(eval))
      .withColumn("cos", Similarity.cosine(col("vec"), col("e_vec")))
      .filter(col("cos") >= Similarity.NearDupCos)
      .groupBy(col("e_id"))
      .agg(count(lit(1)).as("n_contaminated"), max(col("cos")).as("mx"))
    eval.select(col("e_id")).join(hits, Seq("e_id"), "left")
      .select(col("e_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("mx"), lit(0.0)).as("max_cos"))
      .orderBy("e_id")
  }

  private val GeoMedianIters = 3
  private val GeoMedianGroups = 4

  /** q289: GEOMETRIC MEDIAN of each embedding group (Weiszfeld
    * iterations) next to the arithmetic mean — the robust centroid.
    * The mean a cluster rep (q109) or coarse quantizer (q49/q80) is
    * built from moves linearly with any outlier batch (one poisoned
    * shard drags every centroid it touches); the geometric median's
    * influence function is bounded — breakdown point 0.5 — so the
    * rep stays put until HALF the group is contaminated. `mean_c` vs
    * `med_c` per component is exactly the poisoning diagnostic: big
    * gaps = heavy-tailed or contaminated groups.
    *
    * Weiszfeld is an IRLS fixed point: mₜ₊₁ = Σ(v/‖v−mₜ‖) / Σ(1/‖v−mₜ‖),
    * seeded at the mean, [[GeoMedianIters]] rounds. Cross-engine
    * parity contract: distances are the codegen
    * [[graft.functions.vec_l2sq]] — bit-identical to the oracle's
    * left-to-right fold over the SAME `round(·,6)` median components,
    * so the weights are bit-equal and only the final weighted mean
    * (order-free after `round(·,6)`, the q80 convention) is rounded.
    * Points sitting exactly on the current estimate get weight 0 (the
    * standard Weiszfeld guard), and a fully-degenerate group keeps its
    * previous estimate.
    *
    * Scale: each round is ONE linear pass — the medians broadcast
    * (groups × dims rows), and the per-vector weight is computed in
    * the SAME projection that carries the array (round-13, VERDICT
    * r12 item 6: the earlier shape joined the exploded corpus×dims
    * table against a per-vector weight frame on `(grp, vec_id)` — a
    * corpus×dims SHUFFLE per iteration; now the explode is narrow
    * and the only exchange per iteration carries groups×dims partial
    * sums, map-side combined — `GeoMedianSpec` pins the plan). No
    * corpus shuffle, the q49 Lloyd shape.
    */
  /** One Weiszfeld round as a SINGLE linear pass over the array
    * column (round-13, VERDICT r12 item 6). `e` carries
    * `(grp, vec_id, v)`, `m` the current `(grp, pos, m)` estimates.
    * The medians re-vectorize and BROADCAST onto `e` (groups×dims
    * rows), the per-vector weight `1/√d2` is a scalar computed in the
    * same projection that carries `v`, and the explode is NARROW —
    * the only exchange is the `(grp, pos)` hash aggregate of
    * map-side-combined partial sums. The earlier shape shuffled the
    * exploded corpus×dims table into a `(grp, vec_id)` join against
    * the weight frame; `GeoMedianSpec` pins that exchange's absence.
    * Value-identical to the old plan: the same per-vector `w` lands
    * on the same `(grp, pos, x)` terms, summed per group either way
    * (float-sum order within a group was never deterministic; the
    * oracle contract is the round(·,6) fold + rel-1e-9 tolerance).
    */
  private[graft] def geoMedianStep(e: DataFrame, m: DataFrame): DataFrame = {
    val mv = m.groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mv"))
    val ew = e.join(broadcast(mv), "grp")
      .withColumn("d2", graft.functions.vec_l2sq(col("v"), col("mv")))
      .select(col("grp"), col("v"),
        when(col("d2") > 0, lit(1.0) / sqrt(col("d2")))
          .otherwise(lit(0.0)).as("w"))
    ew.select(col("grp"), col("w"),
        posexplode_outer(col("v")).as(Seq("pos0", "x")))
      .select(col("grp"), (col("pos0") + 1).cast("long").as("pos"),
        col("w"), col("x"))
      .groupBy("grp", "pos")
      .agg(sum(col("w") * col("x")).as("num"), sum(col("w")).as("den"))
      .join(m.withColumnRenamed("m", "prev"), Seq("grp", "pos"))
      .select(col("grp"), col("pos"),
        when(col("den") > 0, round(col("num") / col("den"), 6))
          .otherwise(col("prev")).as("m"))
  }

  private val qGeoMedian: Q = (spark, dir) => {
    val e = Dedup.materialize(
      embeddingsRepartitioned(spark, dir).select(
        (col("vec_id") % GeoMedianGroups).as("grp"), col("vec_id"),
        Similarity.asDouble(col("vec")).as("v")))
    val comp = e.select(col("grp"), col("vec_id"),
        posexplode_outer(col("v")).as(Seq("pos0", "x")))
      .select(col("grp"), col("vec_id"),
        (col("pos0") + 1).cast("long").as("pos"), col("x"))
    val m0 = Dedup.materialize(
      comp.groupBy("grp", "pos").agg(round(avg(col("x")), 6).as("m")))
    var m = m0
    for (_ <- 1 to GeoMedianIters) m = Dedup.materialize(geoMedianStep(e, m))
    m0.withColumnRenamed("m", "mean_c")
      .join(m.withColumnRenamed("m", "med_c"), Seq("grp", "pos"))
      .select(col("grp").as("group_id"), col("pos"),
        col("mean_c"), col("med_c"))
      .orderBy("group_id", "pos")
  }

  private val PqM = 4        // subspaces
  private val PqSubDim = EmbedDims / PqM
  private val PqK = 8        // centroids per subspace codebook
  private val PqIters = 1    // Lloyd refinements per subspace

  /** q139: PRODUCT-QUANTIZATION ANN with asymmetric-distance (ADC)
    * scoring — the memory story a 100 TB vector store actually ships:
    * each 64-dim float vector (256 B) compresses to [[PqM]] one-byte
    * codes (4 B, 64×), and query scoring touches ONLY the codes plus a
    * per-query M×K distance table — the raw corpus vectors are never
    * read again after encoding.
    *
    * Build: sub-vector slices become rows `(vec_id, m, sv)`, so one
    * generic Lloyd pass trains all M codebooks at once (subspace is a
    * grouping key, not an unrolled program). Init = first-[[PqK]]
    * vectors per subspace; [[PqIters]] assign/mean refinements with
    * `round(·,6)` means (the cross-engine parity contract q80 uses).
    * Encode: broadcast argmin over the M×K codebook — the shuffle
    * carries one row per (vector, subspace), never vectors×K.
    * Score: per-query distance table `(q_id, m, code) → d_us` scaled
    * to integer micro-units, broadcast onto the codes table; the ADC
    * sum is an exact BIGINT aggregation (order-free — no float
    * summation knife-edge across engines) with map-side combine, so
    * the exchange carries one row per (query, vector).
    *
    * All distances are the codegen [[graft.functions.vec_l2sq]] —
    * bit-identical to the oracle's left-to-right `list_reduce` fold.
    */
  private val qPqAdc: Q = (spark, dir) => {
    val e = embeddingsRepartitioned(spark, dir)
    val sub = e.select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("vec"))
      .withColumn("sv", slice(col("vec"), col("m") * PqSubDim + 1, lit(PqSubDim)))
      .select("vec_id", "m", "sv")
    var cb = sub.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("c_id"), col("sv").as("c_vec"))
    // generic Lloyd pass over the (vec_id, m) sub-vector table: one
    // E-step broadcast argmin + one M-step carrying M×K×subdim sums
    for (_ <- 1 to PqIters) {
      cb = sub.join(broadcast(cb), "m")
        .withColumn("d2", round(graft.functions.vec_l2sq(col("sv"), col("c_vec")), 6))
        .groupBy(col("vec_id"), col("m"))
        .agg(min_by(struct(col("sv"), col("c_id")), struct(col("d2"), col("c_id"))).as("best"))
        .select(col("m"), col("best.c_id").as("list_id"), col("best.sv").as("sv"))
        .select(col("m"), col("list_id"), posexplode(col("sv")))
        .groupBy(col("m"), col("list_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("mu"))
        .groupBy(col("m"), col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu")).as("c_vec"))
        .select(col("m"), col("list_id").as("c_id"), col("c_vec"))
    }
    val codebook = Dedup.materialize(cb)
    val codes = sub.join(broadcast(codebook), "m")
      .withColumn("d2", round(graft.functions.vec_l2sq(col("sv"), col("c_vec")), 6))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("c_id"), struct(col("d2"), col("c_id"))).as("code"))
    val q = sub.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("m"), col("sv").as("q_sv"))
    val dt = q.join(broadcast(codebook), "m")
      .select(col("q_id"), col("m"), col("c_id"),
        round(graft.functions.vec_l2sq(col("q_sv"), col("c_vec")) * 1e6)
          .cast("long").as("d_us"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist_us"), col("vec_id"))
    // aliased probe table: codes and dt share the `sub` lineage, so an
    // unaliased codes("m") === dt("m") degenerates to a trivially-true
    // self-reference
    val dtA = dt.select(col("q_id"), col("m").as("dm"),
      col("c_id").as("dc"), col("d_us"))
    codes.join(broadcast(dtA),
        col("m") === col("dm") && col("code") === col("dc"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d_us")).as("adist_us"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("adist_us"))
      .orderBy("q_id", "rank")
  }

  /** q140: PARETO-FRONTIER (skyline) document selection — keep every
    * document no other document dominates on (token count, lexical
    * diversity): the multi-criteria keep-rule a curation pipeline
    * applies when no single scalar score exists. The oracle is the
    * O(n²) dominance NOT-EXISTS; the engine computes the identical
    * set in three LINEAR passes, because 2-D dominance reduces
    * exactly to an exclusive prefix max:
    *  1. per-token-count aggregate: best diversity per length group
    *     (one key-sized shuffle with map-side combine);
    *  2. exclusive global prefix max over strictly-LONGER groups via
    *     [[graft.operators.GlobalRank.withPrefixMax]] — range
    *     partition + metadata-sized collect, no single-partition
    *     window;
    *  3. a length group is on the frontier iff its best strictly
    *     beats every longer group's; a document survives iff its
    *     group is on the frontier and it attains the group best
    *     (ties on both axes: neither dominates, both kept).
    * Diversity is integer basis points (floor(1e4·distinct/total)) —
    * every dominance comparison is BIGINT, no float knife-edge.
    */
  private val qSkyline: Q = (spark, dir) => {
    val toks = docsFanned(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
    val s = Dedup.materialize( // feeds the group agg AND the final join
      toks.filter(size(col("t")) > 0)
        .select(col("doc_id"), size(col("t")).cast("long").as("tok_cnt"),
          size(array_distinct(col("t"))).cast("long").as("ud"))
        .withColumn("uniq_bp",
          floor(lit(10000.0) * col("ud") / col("tok_cnt")).cast("long"))
        .select("doc_id", "tok_cnt", "uniq_bp"))
    val g = s.groupBy("tok_cnt").agg(max(col("uniq_bp")).as("gq"))
    val skyGroups = graft.operators.GlobalRank
      .withPrefixMax(g, Seq(col("tok_cnt").desc), "gq", "pm")
      .filter(col("gq") > col("pm"))
      .select(col("tok_cnt"), col("gq"))
    s.join(skyGroups, "tok_cnt")
      .filter(col("uniq_bp") === col("gq"))
      .select(col("doc_id"), col("tok_cnt"), col("uniq_bp"))
      .orderBy("doc_id")
  }

  private[graft] val ApportionBudget = 10000L

  /** q149: TOKEN-BUDGET APPORTIONMENT by largest remainder (Hamilton's
    * method) — the allocation step of mixture construction: given a
    * training budget of [[ApportionBudget]] slots, each source's share
    * is proportional to its token mass, but shares must be INTEGERS
    * that sum exactly to the budget. floor(N·w_s/T) under-allocates by
    * L slots; the L sources with the largest integer remainders
    * N·w_s mod T get one extra. Every quantity is exact BIGINT
    * arithmetic (no float quotas), so the allocation is deterministic
    * and auditable — the property a reproducible data-mixture config
    * needs.
    *
    * Scale: one token-count aggregate (corpus shuffle), then the
    * entire method runs on the source-sized table; the remainder rank
    * is [[graft.operators.GlobalRank]] (no single-partition window
    * even on the small table, battery invariant).
    */
  private val qApportion: Q = (spark, dir) => {
    val toks = docsFanned(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("tok"))
    val toksM = Dedup.materialize(toks) // total + per-source consumers
    val total = toksM.agg(sum("tok").as("t_total"))
    val quotas = toksM.crossJoin(broadcast(total))
      .withColumn("base", expr(s"tok * $ApportionBudget div t_total"))
      .withColumn("rem", expr(s"(tok * $ApportionBudget) % t_total"))
    val quotasM = Dedup.materialize(
      graft.operators.GlobalRank.withRank(quotas,
        Seq(col("rem").desc, col("source")), "rk"))
    val leftover = quotasM.agg(
      (lit(ApportionBudget) - sum(col("base"))).as("l"))
    quotasM.crossJoin(broadcast(leftover))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L))
      .select(col("source"), col("tok"), col("base"), col("rem"),
        col("rk"), col("alloc"))
      .orderBy("source")
  }

  private[graft] val ZipfTopK = 100

  /** Shared OLS-fit text for q145 (q141's shared-Cramer pattern, 1-D):
    * slope/intercept/R² of y~x from the six exact BIGINT sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy²) — identical IEEE ops on
    * identical integers on both engines.
    */
  private[graft] val zipfFitSql: Seq[(String, String)] = {
    def cd(c: String) = s"CAST($c AS DOUBLE)"
    val num = s"(${cd("n")}*${cd("sxy")} - ${cd("sx")}*${cd("sy")})"
    val denX = s"(${cd("n")}*${cd("sxx")} - ${cd("sx")}*${cd("sx")})"
    val denY = s"(${cd("n")}*${cd("syy")} - ${cd("sy")}*${cd("sy")})"
    val slope = s"($num / $denX)"
    Seq(
      "slope" -> s"round($slope, 6)",
      "intercept_ln" -> s"round((${cd("sy")} - $slope*${cd("sx")}) / ${cd("n")} / 1000000.0, 6)",
      "r2" -> s"round($num*$num / ($denX*$denY), 6)")
  }

  private[graft] val HillK = 200L

  /** q198: HILL TAIL-INDEX ESTIMATOR — the power-law-tail complement
    * of q145's Zipf body fit: α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the
    * [[HillK]] largest document lengths. A heavy tail (α ≤ 2) means a
    * few giant documents dominate token mass — the signal that length
    * capping / chunking (q69) must run before packing (q39), and the
    * sizing input for those caps.
    *
    * Exactness + scale: the top-(k+1) selection is per-partition
    * top-k + merge (TakeOrderedAndProject — no global sort, no
    * single-partition window); rows AT the tail threshold contribute
    * ln(1) = 0, so the sum runs over the whole selected set without
    * identifying the (k+1)-th row. Each ln settles to micro-units
    * per row (the q145 rule) so the total is an exact integer sum,
    * and α̂ derives by integer division.
    */
  private val qHill: Q = (spark, dir) => {
    val sel = Tables(spark, dir, "documents")
      .select(col("n_chars"), col("doc_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(HillK.toInt + 1)
    val m = sel.agg(min(col("n_chars")).as("x_tail"))
    val alphaNum = HillK * 1000000000000L // k · 10¹² (α in micro-units)
    sel.crossJoin(broadcast(m))
      .select(col("x_tail"), expr(
        "CAST(round(ln(CAST(n_chars AS DOUBLE) / CAST(x_tail AS DOUBLE)) * 1000000.0) AS BIGINT)")
        .as("l_micro"))
      .groupBy("x_tail")
      .agg(sum("l_micro").as("sum_log_micro"))
      .select(lit(HillK).as("k"), col("x_tail"), col("sum_log_micro"),
        expr(s"${alphaNum}L div sum_log_micro").as("alpha_micro"))
  }

  /** q145: ZIPF rank-frequency fit — the corpus-health diagnostic
    * (natural text follows freq ∝ rank^s with s ≈ −1; template spam,
    * boilerplate floods and synthetic junk bend the curve): per
    * source, OLS of ln(freq) over ln(rank) for the top-[[ZipfTopK]]
    * terms, with slope / intercept / R².
    *
    * Parity + scale: ln is evaluated PER ROW and settled to integer
    * micro-units immediately (a raw Σln would be an order-of-summation
    * float; micro-rounding kills the engines' ≤1-ulp libm disagreement
    * long before it can flip anything), so the fit reduces to six
    * exact BIGINT sums — one term-count shuffle, one source-partitioned
    * top-k window, one metadata-sized aggregate. Same
    * sufficient-statistics shape as q141/q135.
    */
  private val qZipf: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val tf = docsFanned(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("f"))
    val w = Window.partitionBy("source").orderBy(col("f").desc, col("term"))
    val xy = tf.withColumn("r", row_number().over(w))
      .filter(col("r") <= ZipfTopK)
      .select(col("source"),
        expr("CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)").as("y"))
    xy.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("source") +: col("n") +:
        zipfFitSql.map { case (nm, e) => expr(e).as(nm) }: _*)
      .orderBy("source")
  }

  /** q142: CONTENT-DEFINED CHUNKING dedup — the shift-robust sibling
    * of q45's fixed-width block dedup: chunk boundaries fall where a
    * trailing-window polynomial hash matches a mask
    * ([[graft.text.CdcChunker]]), a PURELY LOCAL decision, so an
    * insertion early in a document moves chunk content by at most one
    * window instead of re-aligning every downstream block (rsync /
    * LBFS / storage-dedup lineage). Emits each chunk's span + md5 and
    * its corpus-wide copy count — the join that turns chunking into
    * dedup.
    *
    * Scale: the chunker is ONE O(n) codegen pass per document (the
    * `cdc_chunks` expression — no per-position explode); the explode
    * that follows is output-sized (≈ len/64 chunks per doc), and the
    * copy-count join shuffles md5 keys only. The oracle recomputes
    * the identical boundaries via the unrolled 16-term polynomial —
    * same integers mod 1e9+7.
    */
  private val qCdcChunks: Q = (spark, dir) => {
    val ch = docsFanned(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        graft.functions.cdc_chunks(col("text")).as("ch"))
      // posexplode_outer: ch is provably non-empty for len>=1 docs,
      // and the _outer variant keeps InferFiltersFromGenerate from
      // re-inlining the chunker below the fan-out repartition
      .select(col("doc_id"), col("text"), posexplode_outer(col("ch")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.start").cast("long").as("start_pos"),
        col("col.len").cast("long").as("chunk_len"), col("text"))
      .withColumn("chunk_md5",
        md5(expr("substring(text, CAST(start_pos AS INT), CAST(chunk_len AS INT))")))
      .drop("text")
    val chM = Dedup.materialize(ch) // feeds the copy-count agg AND the join
    val copies = chM.groupBy("chunk_md5").agg(count(lit(1)).as("n_copies"))
    chM.join(copies, "chunk_md5")
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        col("chunk_len"), col("chunk_md5"), col("n_copies"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** K-means M-step at scale (the IVF maintenance job q29 assumes):
    * re-assign every vector to its nearest centroid, recompute each
    * centroid as the elementwise mean of its list, and report the
    * drift (cosine between old and new centroid). The M-step explodes
    * vectors to (list, component) and aggregates — the shuffle carries
    * K×dim running sums, never whole vectors, so a 10^9-vector corpus
    * reduces to K×dim rows regardless of list sizes (map-side partial
    * aggregation does the heavy summing).
    */
  private val qCentroidUpdate: Q = (spark, dir) => {
    val parallelism = spark.sparkContext.defaultParallelism
    val e = Tables(spark, dir, "embeddings").select(
        col("vec_id"), col("embedding").as("vec"))
      .repartition(parallelism, col("vec_id"))
    val cents = e.filter(col("vec_id") < KmeansK)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    val assign = e.crossJoin(broadcast(cents))
      .withColumn("ccos", Similarity.cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("vec"), col("c_id")),
        struct(col("ccos"), (-col("c_id")).as("neg_c_id"))).as("best"))
      .select(col("best.vec").as("vec"), col("best.c_id").as("list_id"))
    val comps = assign.select(col("list_id"), posexplode(col("vec")))
      .groupBy(col("list_id"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"), count(lit(1)).as("cnt"))
    val newCents = comps.groupBy(col("list_id"))
      .agg(max(col("cnt")).as("n_assigned"), // every pos counts the same vectors
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c_new"))
    newCents.join(broadcast(cents), newCents("list_id") === cents("c_id"))
      .select(col("list_id"), col("n_assigned"),
        round(Similarity.cosine(col("c_new"), col("c_vec")), 6).as("drift"))
      .orderBy("list_id")
  }

  // ---------------------------------------------------------- multimodal

  /** Multimodal plumbing: binary payload + typed metadata through the
    * mapPartitions decode-stub stage (see [[Multimodal]]).
    */
  private val qMultimodal: Q = (spark, dir) => {
    val media = Multimodal.mediaFromDocuments(spark, Tables(spark, dir, "documents"))
    Multimodal.extractFeatures(media).toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"), col("mean_byte"), col("n_frames"))
      .orderBy("doc_id")
  }

  /** Frame-sample + resize plumbing: payload sliced to fixed-size
    * frames with halved dims, md5 per frame oracle-checked.
    *
    * NOTE (q19/q27/q28): the Spark side operates on UTF-8 *bytes*
    * (the multimodal domain) while the DuckDB oracle uses character
    * functions; they agree because the documents fixture is pure
    * ASCII (verified) — with multi-byte text the oracle, not the
    * engine, would need `encode()`-based byte semantics.
    */
  private val qFrames: Q = (spark, dir) => {
    val media = Multimodal.mediaFromDocuments(spark, Tables(spark, dir, "documents"))
    Multimodal.sampleFrames(media).toDF()
      .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"),
        col("width"), col("height"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Corpus-level shingle document-frequency top-k (n-gram stats —
    * the contamination/boilerplate detector's first query).
    */
  private val qNgramTopk: Q = (spark, dir) => {
    Dedup.shingleTable(Tables(spark, dir, "documents"), "doc_id", "text")
      .select(explode_outer(col("sh")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle")).limit(20)
  }

  /** TF-IDF top-3 terms per document — the classic corpus-weighting
    * join shape: explode → per-(doc, term) tf (one shuffle, map-side
    * combined) → per-term document frequency (second shuffle over the
    * MUCH smaller tf table) → score and per-doc rank (window
    * partitioned by doc_id — never a global window). Corpus size N
    * rides in as a broadcast 1-row frame, not a driver constant, so
    * the plan is a single job. Ranking uses the ROUNDED score (both
    * engines) with the term as tiebreak — unrounded float ordering is
    * not cross-engine-stable at equal weights.
    */
  private val qTfidf: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val toks = Dedup.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val scored = tf.join(dfT, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Per-document cross-entropy under the corpus unigram LM — the
    * cheap perplexity-proxy quality score (a Gopher/C4-style filter
    * input): tokens join their corpus counts, per-doc mean of
    * −ln p(term). Corpus total rides as a broadcast 1-row frame; the
    * count table shuffles once on term, the re-agg once on doc_id.
    */
  private val qUnigramXent: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val toks = Dedup.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val total = toks.select(count(lit(1)).as("tot"))
    toks.join(counts, "term").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(log(col("c").cast("double") / col("tot"))) / count(lit(1)), 6).as("xent"))
      .orderBy("doc_id")
  }

  private val BigramLambda = 0.75

  /** q83: interpolated-bigram-LM cross-entropy per document — the
    * perplexity-proxy quality filter one step up from q53's unigram
    * (CCNet/KenLM-style scoring, degraded to what a SQL oracle can
    * replay): H(d) = -mean log(λ·P(w|v) + (1-λ)·P(w)) over d's
    * bigrams, probabilities MLE from the corpus itself.
    *
    * Scale shape: ONE posexplode pass; bigrams from a per-doc lag
    * window (partitioned by doc_id — never global); the three count
    * tables shuffle term/bigram KEYS only (map-side combined), the
    * corpus total broadcasts, and the final score is one doc-keyed
    * aggregation. Like q53, the log-sum rides round(·,6) + the
    * checker's 1e-9 tolerance over order-of-summation ULPs.
    */
  private val qBigramXent: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    // materialized: the tokenize+lag stream feeds FOUR consumers (uni,
    // ctx, big, and the scored probe side) — without this the per-row-
    // expensive tokenize subtree re-executes per aggregate branch
    val toks = Dedup.materialize(Dedup.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("term")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = Dedup.materialize(toks
      .withColumn("prev", lag(col("term"), 1).over(w))
      .filter(col("prev").isNotNull))
    val uni = toks.groupBy("term").agg(count(lit(1)).as("c1"))
    val ctx = bi.groupBy(col("prev").as("v")).agg(count(lit(1)).as("cv"))
    val big = bi.groupBy("prev", "term").agg(count(lit(1)).as("c2"))
    val tot = toks.select(count(lit(1)).as("tot"))
    bi.join(big, Seq("prev", "term"))
      .join(ctx, bi("prev") === ctx("v"))
      .join(uni, "term")
      .crossJoin(broadcast(tot))
      .withColumn("p",
        lit(BigramLambda) * (col("c2").cast("double") / col("cv")) +
          lit(1 - BigramLambda) * (col("c1").cast("double") / col("tot")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log(col("p"))) / count(lit(1)), 6).as("xent"))
      .orderBy("doc_id")
  }

  /** q84: SemDeDup-style semantic dedup (Abbas et al. 2023): cluster
    * the embedding space with the derived-K coarse quantizer, then
    * find near-duplicate pairs by EXACT pairwise cosine WITHIN each
    * cluster only. The cluster bound is the whole design: pairwise
    * work drops from O(n²) to Σc² ≈ n²/K, and with K ~ √n
    * ([[ScaleParams.ivfLists]]) join parallelism grows with the
    * corpus instead of capping at a constant cluster count. The
    * LSH-banded q24 is the recall-tunable variant; this is the
    * cluster-exact one — same verification kernel, different
    * candidate generator.
    */
  private val qSemDedup: Q = (spark, dir) => {
    val lists = ScaleParams.ivfLists(
      ScaleParams.tableRows(spark, dir, "embeddings"))
    val e = embeddingsRepartitioned(spark, dir)
    val cents = e.filter(col("vec_id") < lists)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
    val assign = Dedup.materialize(
      ivfAssign(e, cents).select(col("vec_id"), col("vec"), col("list_id")))
    val a = assign.select(col("list_id"), col("vec_id").as("id_a"), col("vec").as("va"))
    val b = assign.select(col("list_id"), col("vec_id").as("id_b"), col("vec").as("vb"))
    a.join(b, "list_id")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= NearDupCos)
      .select(col("list_id"), col("id_a"), col("id_b"), col("cos"))
      .orderBy("list_id", "id_a", "id_b")
  }

  /** Int8 quantization audit for the embedding store: per-vector
    * affine (min, max) → floor-clamped 0..255 codes, emitted as the
    * integer code SUM (exact, engine-portable) plus the rounded range
    * — proves both engines quantize bit-identically without dumping
    * 64-wide code arrays. Floats widen to double loss-free first; the
    * (x−mn)·255/(mx−mn) op order matches the oracle exactly, so floor
    * boundaries agree. Constant vectors (mx = mn) code to 0.
    */
  private val qEmbedQuant: Q = (spark, dir) => {
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    val qsum = when(col("mx") === col("mn"), lit(0L)).otherwise(
      aggregate(col("v"), lit(0L), (acc, x) =>
        acc + least(floor((x - col("mn")) * lit(255.0) / (col("mx") - col("mn"))), lit(255.0))
          .cast("long")))
    // round in a SECOND projection: aliasing round(mn) as "mn" in the
    // same select would capture the rounded value inside the aggregate
    // lambda (self-referencing alias resolution) and shift the floor
    // boundaries the oracle computes from the exact min/max
    e.select(col("vec_id"), col("mn"), col("mx"), qsum.as("q_sum"))
      .select(col("vec_id"),
        round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"),
        col("q_sum"))
      .orderBy("vec_id")
  }

  /** Duplicate-cluster size histogram — the summary a dedup run
    * reports (how much of the corpus is duplicated, at what
    * multiplicity): exact-dup groups by normalized-text fingerprint,
    * then group-size frequencies. Two shuffles, both over keys far
    * smaller than the corpus (fingerprints, then sizes).
    */
  private val qDupHistogram: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val dup = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    dup.groupBy(TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")
  }

  private[graft] val SpanN = 8
  private[graft] val EditPfxLen = 80
  private[graft] val EditMaxDist = 40

  /** Cross-document repeated-span audit (the memorization-risk
    * signal exact-substring dedup acts on): per doc, how many of its
    * distinct [[SpanN]]-gram token spans also occur in ANOTHER
    * document. dup_bp is integer basis points (engine-exact `div`,
    * no float ratio).
    *
    * Scale: spans shuffle as md5-sized group keys twice (df count,
    * then doc re-aggregation) — text itself never moves after the
    * explode; both aggregates partial-combine map-side.
    */
  private val qDupSpans: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val sh8 = Dedup.fanOut(docs.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull), col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("toks"), SpanN).as("sh"))
    val spans = sh8.select(col("doc_id"), explode_outer(col("sh")).as("span"))
    // doc frequency per span; spans are per-doc distinct, so count =
    // number of documents containing the span
    val spanDf = spans.groupBy("span").agg(count(lit(1)).as("df"))
    spans.join(spanDf, "span")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_spans"), col("n_dup"),
        expr("(n_dup * 10000) div n_spans").as("dup_bp"))
      .orderBy("doc_id")
  }

  /** Edit-distance near-dup verify: LSH candidates re-checked with
    * character-level Levenshtein over the normalized-text prefix —
    * the cheap fuzzy-match verifier when token Jaccard is too coarse
    * (e.g. small in-place edits that shift every shingle). Same
    * scale shape as q22: exact verify touches ONLY candidate pairs.
    */
  private val qDedupEdit: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val cands = Dedup.lshCandidates(sigs(spark, dir), "doc_id", "sig", 4, 4)
    val pfx = docs.select(col("doc_id"),
      substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, EditPfxLen)
        .as("pfx"))
    cands.select("id_a", "id_b")
      .join(pfx.select(col("doc_id").as("id_a"), col("pfx").as("pfx_a")), "id_a")
      .join(pfx.select(col("doc_id").as("id_b"), col("pfx").as("pfx_b")), "id_b")
      .select(col("id_a"), col("id_b"), levenshtein(col("pfx_a"), col("pfx_b")).as("lev"))
      .filter(col("lev") <= EditMaxDist)
      .orderBy("id_a", "id_b")
  }

  /** Quantile-threshold curation (the FineWeb-style "keep the top
    * quartile by quality" cut): exact global quartile assignment by
    * (quality desc, doc_id) via the scale-safe [[graft.operators
    * .GlobalRank.withNtile]] — selection is BY RANK, not by a float
    * threshold, so there is no knife-edge comparison to diverge
    * between engines — then a per-language audit of what survived.
    */
  private val qQualityCut: Q = (spark, dir) => {
    val scored = docsFanned(spark, dir).select(col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    graft.operators.GlobalRank.withNtile(scored,
        Seq(col("quality").desc, col("doc_id")), 4, "qt")
      .filter(col("qt") === 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_checksum"),
        round(min("quality"), 6).as("min_q"))
      .orderBy("lang")
  }

  /** q132: CURRICULUM ORDERING — the deterministic global training
    * order a curriculum-scheduled run consumes: docs bin into quality
    * quartiles (phase 1 = best quality first, the FineWeb-style
    * easy/clean-first schedule), and WITHIN each phase the order is a
    * hash shuffle (md5 of doc_id), so each phase is internally
    * decorrelated while the phase sequence is the curriculum. Both
    * steps are the scale-safe [[graft.operators.GlobalRank]] — bin
    * assignment and the global position are exact ntile/rank semantics
    * with NO single-partition window anywhere.
    */
  private val qCurriculum: Q = (spark, dir) => {
    val scored = docsFanned(spark, dir).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val binned = graft.operators.GlobalRank.withNtile(scored,
      Seq(col("quality").desc, col("doc_id")), 4, "bin")
    graft.operators.GlobalRank.withRank(binned,
        Seq(col("bin"), md5(col("doc_id").cast("string")), col("doc_id")), "pos")
      .select(col("doc_id"), col("bin"), col("pos").cast("long").as("pos"))
      .orderBy("doc_id")
  }

  /** Deterministic balanced training-shard assignment: rank docs by
    * token count (longest first, doc_id tiebreak) with the scale-safe
    * [[graft.operators.GlobalRank]] — NO single-partition window —
    * then round-robin `rank mod k`, which balances shard doc counts
    * exactly and token sums to within one stripe. Reports per-shard
    * doc/token totals — the audit a shard-writer job emits. Shard
    * count derived from corpus rows ([[ScaleParams.shardCount]]), not
    * hand-set.
    */
  private val qShardAssign: Q = (spark, dir) => {
    val shards = ScaleParams.shardCount(
      ScaleParams.tableRows(spark, dir, "documents"))
    val d = Tables(spark, dir, "documents").select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.GlobalRank
      .withRank(d, Seq(col("n_tokens").desc, col("doc_id")), "rn")
      .withColumn("shard_id", (col("rn") - 1) % shards + 1)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("shard_id")
  }

  /** q82: the REGISTERED custom-function surface driven through the
    * SQL front end — `rolling_hash` (codegen polynomial fingerprint)
    * and `vec_cosine` (codegen vector kernel) called from a
    * `spark.sql` text, joined across documents ⋈ embeddings (next-id
    * neighbor). The oracle recomputes both through the proven
    * built-ins-only twins (q19's fold, q24's exact-order cosine), so
    * this pins that the SQL-registered expressions are value-identical
    * to their Column-API faces — the registration itself becomes
    * oracle-checked instead of WARN-log-checked.
    */
  private[graft] val SqlFunctionsText: String =
    """SELECT d.doc_id,
      |  rolling_hash(d.text) AS fp,
      |  round(vec_cosine(a.embedding, b.embedding), 6) AS cos_next
      |FROM documents d
      |JOIN embeddings a ON a.vec_id = d.doc_id
      |JOIN embeddings b ON b.vec_id = d.doc_id + 1
      |ORDER BY doc_id""".stripMargin

  private val qSqlFunctions: Q = (spark, dir) =>
    QueriesAnalytics.sqlVerbatim(spark, dir, SqlFunctionsText,
      Seq("documents", "embeddings"))

  /** q91: EXACT all-pairs near-dup join ([[graft.dedup.AllPairs]]) —
    * every pair with trigram-shingle Jaccard ≥ 1/2, found by prefix
    * filtering instead of LSH. The completeness statement IS the
    * oracle: the prefix-filtered plan must hash-match the brute-force
    * all-pairs join (which the oracle runs; at sf0.01 the LSH chain's
    * q22 finds the same 25 pairs — recall 1.0 on this corpus, now
    * proven rather than sampled). Threshold and outputs are all
    * integer — no float knife edges.
    */
  private val qAllPairs: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    graft.dedup.AllPairs.similarPairs(
        Dedup.shingleTable(docs, "doc_id", "text"), "doc_id", "sh", 1, 2)
      .orderBy("id_a", "id_b")
  }

  /** q98: triangle census of the exact near-dup graph
    * ([[graft.graph.Triangles]] over q91's pair set) — the
    * transitivity audit behind cluster-collapse dedup: q31 keeps one
    * doc per CONNECTED COMPONENT, which is only safe if near-dup is
    * (mostly) transitive; the closure rate (closed wedges / wedges)
    * measures exactly that. Low closure = chained false merges. The
    * census itself is the degree-oriented count whose wedge join is
    * bounded by √m out-degrees — the only triangle shape that
    * survives a power-law dup graph at corpus scale.
    */
  private val qDupTriangles: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    val pairs = graft.dedup.AllPairs.similarPairs(
      Dedup.shingleTable(docs, "doc_id", "text"), "doc_id", "sh", 1, 2)
    graft.graph.Triangles.audit(pairs, "id_a", "id_b")
  }

  /** q136: per-node clustering coefficient over the near-dup graph —
    * tells duplicate-cluster CORES (clique-like neighborhoods,
    * coeff → 10000) apart from template/boilerplate BRIDGES
    * (high degree, low closure). Composes q91's exact edge set with
    * [[graft.graph.Triangles.perNode]].
    */
  private val qClusterCoeff: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    val pairs = graft.dedup.AllPairs.similarPairs(
      Dedup.shingleTable(docs, "doc_id", "text"), "doc_id", "sh", 1, 2)
    graft.graph.Triangles.perNode(pairs, "id_a", "id_b").orderBy("node")
  }

  // ----------------------------------------- corpus-growth statistics

  private[graft] val HeapsMinJ = 7L

  /** Shared OLS-slope text (the q235 moment rule: exact integer sums,
    * products in double space) over columns (n, sx, sy, sxx, sxy).
    */
  private def slopeMilliSql: String = {
    val dxx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val dxy = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    s"""CAST(CASE WHEN $dxx <= 0.0 THEN 0
       |ELSE round($dxy / $dxx * 1000.0) END AS BIGINT)""".stripMargin
  }

  /** Heaps'-law table from per-doc stats `(doc_id, nt, n_new)` —
    * shared by q269 and `CorpusStatsSpec`'s closed-form fixture.
    */
  private[graft] def heapsFromDocStats(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    val vc = Dedup.materialize(graft.operators.GlobalRank.withPrefixSums(
      base, Seq(col("doc_id")), Seq("nt", "n_new"), Seq("ct", "vcum")))
    val total = vc.agg(max("ct").as("total"))
    val cks = spark.range(HeapsMinJ, 63).toDF("j")
      .crossJoin(broadcast(total))
      .select(col("j"),
        expr("CAST(pow(2.0, CAST(j AS DOUBLE)) AS BIGINT)").as("ck"), col("total"))
      .filter(col("ck") <= col("total")).drop("total")
    val v = Dedup.materialize(vc.crossJoin(broadcast(cks))
      .filter(col("ct") <= col("ck"))
      .groupBy("j", "ck").agg(max("vcum").as("vocab")))
    val beta = v.select(
        expr("CAST(round(ln(CAST(ck AS DOUBLE)) * 1000.0) AS BIGINT)").as("x"),
        expr("CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000.0) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(expr(slopeMilliSql).as("beta_milli"))
    v.crossJoin(broadcast(beta))
      .select(col("j"), col("ck"), col("vocab"), col("beta_milli"))
      .orderBy("j")
  }

  /** q269: HEAPS'-LAW VOCABULARY GROWTH — distinct vocabulary as a
    * function of corpus size, measured EXACTLY at dyadic token
    * checkpoints (2^[[HeapsMinJ]] … ≤ total) in doc_id order, plus
    * the fitted Heaps exponent β (OLS of ln V on ln N over the
    * checkpoints, q235's settled-integer moment rule). The curve
    * answers the 100 TB planning question "how fast does the
    * vocabulary (and every vocab-keyed state: BPE merges, term
    * stats, dedup shingle tables) grow if we 10× the crawl?" — and a
    * β break signals a corpus-composition shift (new language or
    * template flood entering the mix).
    *
    * Exactness: a term is "seen" at the cumulative token count of the
    * END of the doc_id-ordered doc that first contains it — both
    * engines evaluate the same document-boundary rule, no sampling.
    * Checkpoints a corpus hasn't reached yet are absent on both
    * sides by the same `ck <= total` filter.
    *
    * Scale: token prefix offsets and first-seen cumulative vocabulary
    * ride ONE [[graft.operators.GlobalRank.withPrefixSums]] pass (one
    * range shuffle carries both running sums); first occurrence is a
    * term-keyed min (map-side combine, the only token-sized shuffle);
    * the checkpoint probe is a ≤56-row broadcast against the
    * docs-sized prefix table — one pass, output is checkpoint-sized.
    */
  private val qHeaps: Q = (spark, dir) => {
    val tk = Dedup.materialize(docsFanned(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("t")))
    val firstIn = tk.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy("term").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    val base = tk.select(col("doc_id"), size(col("t")).cast("long").as("nt"))
      .join(firstIn, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    heapsFromDocStats(base)
  }

  /** Richness estimators from per-source frequency-of-frequencies
    * `(source, v_obs, n_tokens, f1, f2)` — shared by q270 and
    * `CorpusStatsSpec`.
    */
  private[graft] def richnessFromFof(fof: DataFrame): DataFrame =
    fof.select(col("source"), col("v_obs"), col("n_tokens"), col("f1"), col("f2"),
        (col("v_obs") * 1000 + expr(
          "CAST(round(500.0 * CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / CAST(f2 + 1 AS DOUBLE)) AS BIGINT)"))
          .as("chao1_milli"),
        expr("f1 * 10000 div n_tokens").as("unseen_bp"))
      .orderBy("source")

  /** q270: UNSEEN-VOCABULARY ESTIMATORS (Chao1 + Good–Turing) — per
    * source and corpus-wide ALL row: observed vocabulary, token count,
    * singleton/doubleton counts (f1/f2 — the hapax legomena the
    * estimators run on), the Chao1 lower bound on TRUE vocabulary
    * V + f1(f1−1)/(2(f2+1)) in milli, and the Good–Turing unseen
    * probability mass f1/N in bp. This is the "is the crawl
    * saturating?" gate: unseen_bp near zero says more of the same
    * source buys no new vocabulary (diminishing data value), while a
    * Chao1 far above v_obs says the source's tail is still unmined —
    * the per-source rows rank sources by remaining novelty, the
    * complement of q48's mixture weights. f1 per SOURCE uses
    * source-local counts; the ALL row re-counts terms corpus-wide
    * (corpus f1 ≠ Σ source f1 — a term singleton in two sources is a
    * corpus doubleton).
    *
    * Scale: one (source, term)-keyed count with map-side combine;
    * the ALL re-aggregation shuffles term keys only; both
    * frequency-of-frequency folds are key-sized. Exact integers
    * throughout; the single Chao1 double product rounds
    * deterministically from exact BIGINTs.
    */
  private val qChao1: Q = (spark, dir) => {
    val terms = Dedup.materialize(docsFanned(spark, dir)
      .select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c")))
    def fof(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = g
      .agg(count(lit(1)).as("v_obs"), sum("c").as("n_tokens"),
        count(when(col("c") === 1, 1)).as("f1"),
        count(when(col("c") === 2, 1)).as("f2"))
    val per = fof(terms.groupBy("source"))
    val all = fof(terms.groupBy("term").agg(sum("c").as("c")).groupBy())
      .select(lit("ALL").as("source"), col("v_obs"), col("n_tokens"),
        col("f1"), col("f2"))
    richnessFromFof(per.unionByName(all))
  }

  /** Mann–Whitney summary from the value-grouped count store
    * `(v, na_v, t)` — na_v = group-A rows at score v, t = all rows at
    * v. Shared by q271, `CorpusStatsSpec`'s hand-computed fixtures,
    * and the streaming monitor (the store folds additively, so the
    * MV merge maintains it incrementally).
    *
    * Rank algebra in half-units so everything stays integer: the
    * doubled midrank at v is 2·cum_lt + t + 1; doubled rank sum
    * R2 = Σ na_v·(2 cum_lt + t + 1); doubled U is
    * u2_a = R2 − n_a(n_a+1) with mean n_a·n_b. Tie-corrected normal
    * variance from the exact Σ(t³−t) (BIGINT-exact while the largest
    * tie group stays under ~2.1M rows — beyond that, rescale the
    * score grain before the cube).
    */
  private[graft] def mwFromCounts(byV: DataFrame): DataFrame = {
    val cum = graft.operators.GlobalRank.withPrefixSums(
      byV, Seq(col("v")), Seq("t"), Seq("cle"))
    val m = cum.agg(sum("na_v").as("na"), sum(col("t") - col("na_v")).as("nb"),
      sum(col("na_v") * (lit(2) * (col("cle") - col("t")) + col("t") + 1)).as("r2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("st3"),
      sum("t").as("n"))
    val varSql =
      """(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
        | * (CAST(n + 1 AS DOUBLE)
        |    - CAST(st3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))""".stripMargin
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      (col("r2") - col("na") * (col("na") + 1)).as("u2_a"),
      expr(
        s"""CAST(CASE WHEN n < 2 OR na = 0 OR nb = 0 OR $varSql <= 0.0 THEN 0
           |ELSE round((CAST(r2 - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
           |  / (2.0 * sqrt($varSql)) * 1000.0) END AS BIGINT)""".stripMargin)
        .as("z_milli"))
  }

  /** q271: MANN–WHITNEY RANK-SUM TEST — is English-document quality
    * stochastically higher than the rest of the corpus? The
    * nonparametric two-sample location test q167's KS statistic
    * complements: KS asks "are the distributions different anywhere",
    * MW asks the DIRECTIONAL question "does one group tend to score
    * higher", which is what a per-language quality-threshold decision
    * actually needs. Exact doubled-U from tie-corrected midranks (no
    * float enters the rank algebra; see [[mwFromCounts]]), plus the
    * tie-corrected normal z in milli — positive z = group A (en)
    * stochastically larger.
    *
    * Scale: one codegen scoring pass folds to a score-domain-sized
    * (v, na_v, t) count store (map-side combine); ranks come from one
    * [[graft.operators.GlobalRank.withPrefixSums]] range shuffle over
    * that store, never over documents. The same store folds
    * additively, so a streaming monitor maintains it with bounded
    * state (`StreamingMwSpec`).
    */
  /** Per-doc (a, v) rows the MW store folds from — shared by q271 and
    * `StreamingMwSpec`'s incremental monitor.
    */
  private[graft] def mwScored(spark: SparkSession, dir: String): DataFrame =
    docsFanned(spark, dir)
      .select((col("lang") === "en").cast("long").as("a"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .select(col("a"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("v"))

  private val qMannWhitney: Q = (spark, dir) =>
    mwFromCounts(mwScored(spark, dir).groupBy("v")
      .agg(sum("a").as("na_v"), count(lit(1)).as("t")))

  /** Anisotropy summary from settled per-dimension moments
    * `(pos, m_micro, m2_micro)` and the vector count — shared by q272
    * and `CorpusStatsSpec`'s two-dim closed-form fixture.
    */
  private[graft] def anisotropyFromMoments(comps: DataFrame,
                                           nVecs: DataFrame): DataFrame = {
    val per = comps.select(
      (col("m2_micro") * lit(1000000L) - col("m_micro") * col("m_micro")).as("var_sc"),
      col("m_micro"), col("m2_micro"))
    val m = per.agg(count(lit(1)).as("dims"), sum("var_sc").as("svar"),
      sum(expr("CAST(var_sc AS DECIMAL(38,0)) * var_sc")).as("svar2"),
      sum(col("m_micro") * col("m_micro")).as("smm"),
      sum("m2_micro").as("sm2"))
    m.crossJoin(broadcast(nVecs))
      .select(col("n_vecs"), col("dims"),
        expr(
          """CAST(CASE WHEN CAST(svar2 AS DOUBLE) <= 0.0 THEN 0
            |ELSE round(CAST(svar AS DOUBLE) * CAST(svar AS DOUBLE)
            |  / CAST(svar2 AS DOUBLE) * 1000.0) END AS BIGINT)""".stripMargin)
          .as("pr_milli"),
        expr("CAST(smm * 10000 div (sm2 * 1000000) AS BIGINT)").as("aniso_bp"))
  }

  /** q272: EMBEDDING ANISOTROPY AUDIT — the two spectrum-shape
    * numbers that decide whether cosine over this embedding space is
    * trustworthy at all: the participation ratio (Σλ)²/Σλ² of the
    * per-dimension variance spectrum in milli (effective dimension
    * count — d means isotropic, ≪d means a few directions carry
    * everything and q24/q84's SRP bands lose discrimination), and the
    * mean-vector energy share ‖μ‖²/E‖x‖² in bp (the common-direction
    * offset that inflates every cosine; >0 says "center before
    * hashing"). q199 extracts the top principal DIRECTION; this
    * audits the whole diagonal spectrum — the go/no-go gate before
    * trusting any cosine-based dedup or ANN config.
    *
    * Exactness: per-dim moments settle to micro BIGINTs (the one
    * accepted avg-order wobble, q221's rule), then variance, the PR
    * numerator, and the energy ratio are EXACT integer arithmetic in
    * micro² units — Σλ² alone needs 128-bit (DECIMAL(38)/HUGEINT,
    * the q199 overflow contract), and the single PR division runs on
    * identical exact operands in both engines.
    *
    * Scale: one posexplode pass shuffling (dim) keys with map-side
    * partial avgs — corpus×d rows in flight, d rows out; everything
    * after is d-sized arithmetic.
    */
  private val qAnisotropy: Q = (spark, dir) => {
    val e = Dedup.fanOut(Tables(spark, dir, "embeddings"), col("vec_id"))
      .select(Similarity.asDouble(col("embedding")).as("v"))
    val comps = e.select(posexplode(col("v")))
      .groupBy("pos").agg(
        expr("CAST(round(avg(col) * 1000000) AS BIGINT)").as("m_micro"),
        expr("CAST(round(avg(col * col) * 1000000) AS BIGINT)").as("m2_micro"))
    anisotropyFromMoments(comps, e.agg(count(lit(1)).as("n_vecs")))
  }

  /** Shared moment-shape text over columns (n, sx, sxx, sxxx, sxxxx)
    * — raw sums exact (the two high moments in 128-bit), every
    * derived value computed by the IDENTICAL double-op sequence on
    * both engines, settled to milli. Emitted verbatim into the Spark
    * select and the DuckDB oracle.
    */
  private[graft] def shapeMomentSql: Seq[(String, String)] = {
    val m1 = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    val m2 = s"(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - $m1 * $m1)"
    val m3 = s"(CAST(sxxx AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * $m1 * CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) + 2.0 * $m1 * $m1 * $m1)"
    val m4 = s"(CAST(sxxxx AS DOUBLE) / CAST(n AS DOUBLE) - 4.0 * $m1 * CAST(sxxx AS DOUBLE) / CAST(n AS DOUBLE) + 6.0 * $m1 * $m1 * CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * $m1 * $m1 * $m1 * $m1)"
    val s = s"($m3 / ($m2 * sqrt($m2)))"
    val k = s"($m4 / ($m2 * $m2) - 3.0)"
    Seq(
      "skew_milli" ->
        s"CAST(CASE WHEN $m2 <= 0.0 THEN 0 ELSE round($s * 1000.0) END AS BIGINT)",
      "kurt_milli" ->
        s"CAST(CASE WHEN $m2 <= 0.0 THEN 0 ELSE round($k * 1000.0) END AS BIGINT)",
      "jb_milli" ->
        s"""CAST(CASE WHEN $m2 <= 0.0 THEN 0
           |ELSE round(CAST(n AS DOUBLE) / 6.0 * ($s * $s + $k * $k / 4.0) * 1000.0)
           |END AS BIGINT)""".stripMargin)
  }

  /** q273: LENGTH LOG-NORMALITY AUDIT — per source (and ALL): the
    * skewness, excess kurtosis, and Jarque–Bera statistic of
    * ln(n_chars), each in milli. Document length is the one feature
    * every pipeline stage buckets on (q129's batching, q69's
    * chunking, q235's bias audit) under an implicit "roughly
    * lognormal" assumption — this row TESTS it: heavy positive skew
    * says the source still carries unbounded boilerplate tails,
    * strong NEGATIVE skew is the signature of a hard truncation cap
    * upstream (crawler or extractor clipping), and a large JB flags
    * any source whose length model shouldn't be mean±sd. x settles
    * to milli ln BEFORE the moments (q235's rule), the four raw
    * power sums are exact integers (x³/x⁴ ride DECIMAL/HUGEINT — the
    * q199 128-bit contract), and every derived double runs the same
    * op sequence on both engines.
    *
    * Scale: one codegen projection, one source-keyed aggregate with
    * map-side combine; output is source-sized.
    */
  private val qLognormal: Q = (spark, dir) => {
    val x = Dedup.materialize(docsFanned(spark, dir)
      .select(col("source"),
        expr("CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000.0) AS BIGINT)").as("x")))
    def moments(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = g
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("sxxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("sxxxx"))
    val derived = shapeMomentSql.map { case (nme, sql) => expr(sql).as(nme) }
    val per = moments(x.groupBy("source"))
      .select(col("source") +: col("n") +: derived: _*)
    val all = moments(x.groupBy())
      .select(lit("ALL").as("source") +: col("n") +: derived: _*)
    per.unionByName(all).orderBy("source")
  }

  private[graft] val BurstTopK = 20

  /** q274: TERM BURSTINESS (Church–Gale Fano factor) — for the top-
    * [[BurstTopK]] corpus terms: the variance-to-mean ratio of the
    * term's PER-DOCUMENT count over ALL documents (zeros included) in
    * milli. Fano ≈ 1000 is Poisson scatter — the function-word
    * profile; far above says the term clumps into few documents — the
    * content/topic-word (or template-artifact) profile. This is the
    * classical signal separating "frequent because it's everywhere"
    * from "frequent because a subcorpus repeats it", the refinement
    * behind stopword induction (q143's OOV cut treats both the same)
    * and a template-flood smell when a supposedly-generic term goes
    * bursty. Fano = (N·Σc² − (Σc)²)/(N·Σc) from exact integer sums,
    * products in double space (q235's overflow rule).
    *
    * Scale: one (term, doc)-keyed count (map-side combine), one
    * term-keyed fold, top-k by TakeOrdered (no global sort); N is a
    * broadcast scalar.
    */
  private val qBurstiness: Q = (spark, dir) => {
    val tt = docsFanned(spark, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val ag = tt.groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("term").agg(sum("c").as("cnt"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("sc2"))
    val nd = Tables(spark, dir, "documents").agg(count(lit(1)).as("n"))
    ag.orderBy(col("cnt").desc, col("term")).limit(BurstTopK)
      .crossJoin(broadcast(nd))
      .select(col("term"), col("cnt"), col("df"),
        expr(
          """CAST(round((CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE) - CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
            | / (CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT)""".stripMargin)
          .as("fano_milli"))
      .orderBy(col("cnt").desc, col("term"))
  }

  val all: Map[String, Q] = Map(
    "q273_lognormal" -> qLognormal,
    "q274_burstiness" -> qBurstiness,
    "q269_heaps" -> qHeaps,
    "q270_chao1" -> qChao1,
    "q271_mannwhitney" -> qMannWhitney,
    "q272_anisotropy" -> qAnisotropy,
    "q91_allpairs" -> qAllPairs,
    "q98_dup_triangles" -> qDupTriangles,
    "q136_cluster_coeff" -> qClusterCoeff,
    "q66_dup_spans" -> qDupSpans,
    "q67_dedup_edit" -> qDedupEdit,
    "q71_quality_cut" -> qQualityCut,
    "q56_shard_assign" -> qShardAssign,
    "q55_dup_histogram" -> qDupHistogram,
    "q52_tfidf" -> qTfidf,
    "q53_unigram_xent" -> qUnigramXent,
    "q83_bigram_xent" -> qBigramXent,
    "q84_semdedup" -> qSemDedup,
    "q54_embed_quant" -> qEmbedQuant,
    "q28_frames" -> qFrames,
    "q29_knn_ivf" -> qKnnIvf,
    "q80_ivf_learned" -> qIvfLearned,
    "q139_pq_adc" -> qPqAdc,
    "q140_skyline" -> qSkyline,
    "q142_cdc_chunks" -> qCdcChunks,
    "q145_zipf" -> qZipf,
    "q149_apportion" -> qApportion,
    "q82_sql_functions" -> qSqlFunctions,
    "q49_centroid_update" -> qCentroidUpdate,
    "q30_ngram_topk" -> qNgramTopk,
    "q31_dedup_groups" -> qDedupGroups,
    "q16_text_tokens" -> qTextTokens,
    "q122_bpe_merges" -> qBpeMerges,
    "q123_dsir_weights" -> qDsir,
    "q236_dsir_ess" -> qDsirEss,
    "q130_bpe_apply" -> qBpeApply,
    "q137_pmi" -> qPmi,
    "q138_simhash_dedup" -> qSimhashDedup,
    "q157_phash_dedup" -> qPhashDedup,
    "q160_novelty" -> qNovelty,
    "q161_lang_confusion" -> qLangConfusion,
    "q162_source_overlap" -> qSourceOverlap,
    "q163_set_cover" -> qSetCover,
    "q164_weighted_median" -> qWeightedMedian,
    "q165_lsh_precision" -> qLshPrecision,
    "q166_auc" -> qAuc,
    "q169_winnow" -> qWinnow,
    "q170_nb_quality" -> qNbQuality,
    "q171_winnow_pairs" -> qWinnowPairs,
    "q172_nb_calibration" -> qNbCalibration,
    "q176_js_matrix" -> qJsMatrix,
    "q177_boilerplate" -> qBoilerplate,
    "q180_spearman" -> qSpearman,
    "q182_packing_sweep" -> qPackingSweep,
    "q183_jaccard_hist" -> qJaccardHist,
    "q184_rebalance" -> qRebalance,
    "q185_embed_dispersion" -> qEmbedDispersion,
    "q186_winnow_incremental" -> qWinnowIncremental,
    "q187_keyness" -> qKeyness,
    "q188_minhash_calibration" -> qMinhashCalibration,
    "q190_neyman" -> qNeyman,
    "q192_matryoshka" -> qMatryoshka,
    "q196_embed_gram" -> qEmbedGram,
    "q197_chi_square" -> qChiSquare,
    "q198_hill" -> qHill,
    "q199_pca_power" -> qPcaPower,
    "q201_gini" -> qGini,
    "q202_sql_chisq" -> qSqlChiSquare,
    "q203_kcenter" -> qKCenter,
    "q205_quantile_norm" -> qQuantileNorm,
    "q206_wasserstein" -> qWasserstein,
    "q207_ndcg" -> qNdcg,
    "q208_dp_release" -> qDpRelease,
    "q211_winsorize" -> qWinsorize,
    "q214_bootstrap" -> qBootstrap,
    "q215_shuffle_audit" -> qShuffleAudit,
    "q218_compress_proxy" -> qCompressProxy,
    "q219_markov_entropy" -> qMarkovEntropy,
    "q220_oov_curve" -> qOovCurve,
    "q221_silhouette" -> qSilhouette,
    "q222_lang_kappa" -> qLangKappa,
    "q223_cluster_mi" -> qClusterMi,
    "q225_conformal" -> qConformal,
    "q226_split_contamination" -> qSplitContamination,
    "q228_doremi" -> qDoremi,
    "q229_brier" -> qBrier,
    "q230_over_merge" -> qOverMerge,
    "q231_dup_quality_gap" -> qDupQualityGap,
    "q238_dedup_savings" -> qDedupSavings,
    "q239_lsh_recall" -> qLshRecall,
    "q240_norm_delta" -> qNormDelta,
    "q241_dedup_ari" -> qDedupAri,
    "q243_isotonic" -> qIsotonic,
    "q244_prefix_dups" -> qPrefixDups,
    "q245_dup_flow" -> qDupFlow,
    "q248_alpha_mixture" -> qAlphaMixture,
    "q249_hard_negatives" -> qHardNegatives,
    "q250_mmr" -> qMmr,
    "q251_calibrated_brier" -> qCalibratedBrier,
    "q252_temp_scaling" -> qTempScaling,
    "q253_label_noise" -> qLabelNoise,
    "q255_bow_dups" -> qBowDups,
    "q256_feature_hashing" -> qFeatureHashing,
    "q257_coreset_coverage" -> qCoresetCoverage,
    "q258_fertility" -> qFertility,
    "q259_sentences" -> qSentences,
    "q260_cut_sweep" -> qCutSweep,
    "q261_hubness" -> qHubness,
    "q262_fold_auc" -> qFoldAuc,
    "q264_epochs" -> qEpochs,
    "q266_dedup_ladder" -> qDedupLadder,
    "q235_quality_length_bias" -> qQualityLengthBias,
    "q232_token_budget" -> qTokenBudget,
    "q17_text_quality" -> qTextQuality,
    "q18_text_langid" -> qTextLangid,
    "q19_text_fingerprint" -> qTextFingerprint,
    "q20_dedup_exact" -> qDedupExact,
    "q21_dedup_minhash" -> qDedupMinhash,
    "q277_sql_dedup" -> qSqlDedup,
    "q278_sql_dedup_incr" -> qSqlDedupIncr,
    "q280_sql_dedup_tvf" -> qSqlDedupTvf,
    "q282_sql_knn_tvf" -> qSqlKnnTvf,
    "q283_sql_knn_probe_tvf" -> qSqlKnnProbeTvf,
    "q284_embed_incremental" -> qEmbedIncremental,
    "q285_sql_knn_ivf_tvf" -> qSqlKnnIvfTvf,
    "q286_sql_embed_tvf" -> qSqlEmbedDedupTvf,
    "q287_embed_groups" -> qEmbedGroups,
    "q288_ivf_audit" -> qIvfAudit,
    "q289_geomedian" -> qGeoMedian,
    "q290_index_churn" -> qIndexChurn,
    "q293_embed_decontam" -> qEmbedDecontam,
    "q295_margin_sample" -> qMarginSample,
    "q296_committee_cube" -> qCommitteeCube,
    "q297_embed_decontam_banded" -> qEmbedDecontamBanded,
    "q298_decontam_recall" -> qDecontamRecall,
    "q299_decontam_tight" -> qDecontamTight,
    "q300_decontam_recall_tight" -> qDecontamRecallTight,
    "q303_decontam_tvf" -> qSqlDecontamTvf,
    "q302_decontam_report" -> qDecontamReport,
    "q43_dedup_incremental" -> qDedupIncremental,
    "q22_dedup_ngram" -> qDedupNgram,
    "q104_containment" -> qContainment,
    "q108_bm25" -> qBm25,
    "q109_cluster_rep" -> qClusterRep,
    "q112_ann_recall" -> qAnnRecall,
    "q125_rrf_fusion" -> qRrfFusion,
    "q131_jl_distortion" -> qJlDistortion,
    "q132_curriculum" -> qCurriculum,
    "q115_char_entropy" -> qCharEntropy,
    "q118_dup_rate" -> qDupRate,
    "q121_cc_incremental" -> qCcIncremental,
    "q119_pct_rank" -> qPctRank,
    "q23_dedup_simhash" -> qDedupSimhash,
    "q24_dedup_embed" -> qDedupEmbed,
    "q25_knn_brute" -> qKnnBrute,
    "q26_knn_lsh" -> qKnnLsh,
    "q87_knn_multiprobe" -> qKnnLshProbe,
    "q27_multimodal" -> qMultimodal)

  // -------------------------------------------------- oracle generation

  /** Shared DuckDB fragments, generated from the same constants as the
    * Spark side so the two engines compute identical hashes.
    */
  private[graft] val toksSql = """string_split_regex(trim(text), '\s+')"""
  private[graft] val ltoksSql = """string_split_regex(trim(lower(text)), '\s+')"""

  private def stopListSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private[graft] def hitsSql(words: Seq[String]): String =
    s"len(list_filter(ltoks, x -> list_contains(${stopListSql(words)}, x)))"

  private[graft] val normTextSql = """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""

  /** Quality-score CTE chain (twin of [[TextAnalysis.qualityScore]]),
    * shared by q17 and q71: `q` yields (doc_id, lang, punct_ratio,
    * stop_ratio, quality).
    */
  private[graft] lazy val qualityScoreCtes =
    s"""WITH t AS (SELECT doc_id, lang, text, $ltoksSql AS ltoks FROM documents),
       |s AS (SELECT doc_id, lang,
       |  CAST(len(ltoks) AS DOUBLE) AS n_tok,
       |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(${hitsSql(TextAnalysis.stopwords.toMap.apply("en"))} AS DOUBLE) / CAST(len(ltoks) AS DOUBLE) AS stop_ratio
       |  FROM t),
       |q AS (SELECT doc_id, lang, punct_ratio, stop_ratio,
       |  0.4*least(1.0, n_tok/100.0)
       |  + 0.3*(1.0 - least(1.0, punct_ratio*4.0))
       |  + 0.3*least(1.0, stop_ratio*4.0) AS quality
       |FROM s)""".stripMargin

  /** NB train+score CTE chain (twin of [[nbDocScores]]): `d` yields
    * (doc_id, source, score) — shared by q170 and q172.
    */
  private[graft] lazy val nbScoreCtes =
    s"""WITH toks AS (SELECT doc_id, source, unnest($toksSql) AS term FROM documents),
       |c AS (SELECT term,
       |  CAST(sum(CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END) AS BIGINT) AS pos_ct,
       |  CAST(count(*) AS BIGINT) AS tot_ct FROM toks GROUP BY term),
       |c2 AS (SELECT term, pos_ct, tot_ct - pos_ct AS neg_ct FROM c),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS v,
       |  CAST(sum(pos_ct) AS BIGINT) AS pos_tot,
       |  CAST(sum(neg_ct) AS BIGINT) AS neg_tot FROM c2),
       |w AS (SELECT term,
       |  CAST(round(ln(CAST(pos_ct + 1 AS DOUBLE) / CAST(pos_tot + v AS DOUBLE)) * 1000000) AS BIGINT)
       |  - CAST(round(ln(CAST(neg_ct + 1 AS DOUBLE) / CAST(neg_tot + v AS DOUBLE)) * 1000000) AS BIGINT) AS w
       |  FROM c2, s),
       |d AS (SELECT doc_id, source, CAST(sum(w) AS BIGINT) AS score
       |  FROM toks JOIN w USING (term) GROUP BY doc_id, source)""".stripMargin

  /** Winnowing CTE chain (twin of [[graft.text.Winnower.fps]] /
    * [[winnowSelect]]): `s` yields (doc_id, m, nw, hs, sel) — shared
    * by q169 and q171.
    */
  private[graft] lazy val winnowCtes = {
    val (k, w) = (WinnowK, WinnowW)
    s"""WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
       |g AS (SELECT doc_id, t, greatest(1, length(t) - ${k - 1}) AS m FROM t),
       |h AS (SELECT doc_id, m, greatest(1, m - ${w - 1}) AS nw,
       |  list_transform(range(1, m + 1),
       |    i -> ('0x' || substr(md5(substr(t, CAST(i AS INT), $k)), 1, 8))::BIGINT) AS hs
       |  FROM g),
       |s AS (SELECT doc_id, m, nw, hs,
       |  list_distinct(list_transform(range(1, nw + 1), j ->
       |    list_max(list_filter(list_transform(range(0, least($w, m)), o -> j + o),
       |      p -> hs[CAST(p AS INT)] = list_min(hs[CAST(j AS INT) : CAST(j + least($w, m) - 1 AS INT)]))))) AS sel
       |  FROM h)""".stripMargin
  }

  /** Left-fold sum of BIGINTs (portable twin of Spark `aggregate`). */
  private def foldSumSql(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $listExpr), (a, b) -> a + b)"

  private def foldSumDoubleSql(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (a, b) -> a + b)"

  private def codesSql(c: String = "text"): String =
    s"list_transform(range(1, length($c)+1), i -> unicode($c[i]))"

  /** n-gram token shingles with the same short-doc fallback as
    * [[Dedup.shinglesFromTokens]]. */
  private def shinglesNSql(n: Int): String = {
    val gram = (0 until n).map(k => if (k == 0) "t[i]" else s"t[i+$k]")
      .mkString(" || ' ' || ")
    s"""CASE WHEN len(t) >= $n
       |  THEN list_distinct(list_transform(range(1, len(t)-${n - 2}), i -> $gram))
       |  ELSE [array_to_string(t, ' ')] END""".stripMargin
  }

  private[graft] val shinglesSql = shinglesNSql(3)

  /** Brute-force exact all-pairs Jaccard ≥ 1/2 over trigram shingles,
    * ending in `apairs(id_a, id_b, n_inter, n_union)` — the oracle of
    * q91 (prefix filtering must lose nothing vs comparing every pair)
    * and the edge set of q98's triangle census.
    */
  private lazy val allPairsCtes =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents
       |  WHERE text IS NOT NULL),
       |sh AS (SELECT doc_id, $shinglesSql AS s FROM toks),
       |ss AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh),
       |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |ov AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(count(*) AS BIGINT) AS n_inter
       |       FROM e a JOIN e b USING (g)
       |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |apairs AS (SELECT id_a, id_b, n_inter,
       |    sa.n + sb.n - n_inter AS n_union
       |  FROM ov
       |  JOIN ss sa ON sa.doc_id = ov.id_a
       |  JOIN ss sb ON sb.doc_id = ov.id_b
       |  WHERE n_inter * 2 >= (sa.n + sb.n - n_inter) * 1)""".stripMargin

  private val sigElemsSql = (0 until 16)
    .map { j =>
      val (a, b) = (Dedup.minhashA(j), Dedup.minhashB(j))
      s"list_aggregate(list_transform(hs, h -> ($a*h + $b) % ${Dedup.MinhashP}), 'min')"
    }
    .mkString("[\n    ", ",\n    ", "]")

  private val bandElemsSql = (0 until 4)
    .map { b =>
      val parts = (0 until 4)
        .map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '|' || ")
      s"md5('$b|' || $parts)"
    }
    .mkString("[", ",\n    ", "]")

  /** CTE chain through the per-doc band keys — shared by the dedup
    * oracles (batch AND incremental, which differ only in the pair
    * predicate over `bands`).
    */
  private[graft] val sigBandCtes =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (SELECT doc_id, $shinglesSql AS s FROM toks),
       |shh AS (SELECT doc_id, s,
       |  list_transform(s, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM sh),
       |sig AS (SELECT doc_id, s, $sigElemsSql AS sig FROM shh),
       |bands AS (SELECT doc_id, unnest($bandElemsSql) AS band_key FROM sig)""".stripMargin

  /** CTE chain shared by the MinHash and n-gram dedup oracles. */
  private val lshCandidateCtes =
    s"""$sigBandCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b USING (band_key) WHERE a.doc_id < b.doc_id)""".stripMargin

  /** The full MinHash-LSH dedup oracle — ONE copy bound to BOTH
    * q21_dedup_minhash (Scala chain) and q277_sql_dedup (the same
    * chain as pure Spark-SQL text): the two queries are defined to be
    * row-identical, so they must share one oracle verbatim.
    */
  private lazy val minhashDedupOracle =
    s"""$lshCandidateCtes,
       |est AS (SELECT id_a, id_b,
       |  CAST(len(list_filter(range(1, 17), j -> sa.sig[j] = sb.sig[j])) AS DOUBLE)/16.0 AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
       |SELECT id_a, id_b, est_jaccard FROM est
       |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** The incremental-dedup oracle — ONE copy bound to BOTH
    * q43_dedup_incremental (Scala chain) and q278_sql_dedup_incr (the
    * same chain as SQL text): defined row-identical, one oracle.
    */
  private lazy val incrDedupOracle =
    s"""$sigBandCtes,
       |cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
       |                greatest(a.doc_id, b.doc_id) AS id_b
       |         FROM bands a JOIN bands b USING (band_key)
       |         WHERE a.doc_id <> b.doc_id AND b.doc_id % 4 = 3),
       |est AS (SELECT id_a, id_b,
       |  CAST(len(list_filter(range(1, 17), j -> sa.sig[j] = sb.sig[j])) AS DOUBLE)/16.0 AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
       |SELECT id_a, id_b, est_jaccard FROM est
       |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** The exact-Jaccard verify CTE over the LSH candidates — ONE copy
    * (11 oracles nest it; a threshold or tie-order edit in a stray
    * copy would silently desynchronize one query from the rest).
    */
  private lazy val jacCte =
    """jac AS (SELECT id_a, id_b,
      |  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      |    / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jacc
      |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)""".stripMargin

  /** The 0.4-threshold edge set + recursive reachability chain shared
    * by every connected-components oracle (requires WITH RECURSIVE).
    */
  private lazy val ccReachCtes =
    """pairs AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
      |sym AS (SELECT id_a AS s, id_b AS d FROM pairs
      |        UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT sym.d, reach.lbl FROM reach JOIN sym ON sym.s = reach.id)""".stripMargin

  private def dotSql(a: String, b: String): String =
    foldSumDoubleSql(s"list_transform(range(1, ${EmbedDims + 1}), i -> ($a)[i] * ($b)[i])")

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Dims-parameterized twins for non-64-dim vectors (q131's 16-dim
    * projections) — same exact left-to-right fold.
    */
  private def dotSqlN(a: String, b: String, n: Int): String =
    foldSumDoubleSql(s"list_transform(range(1, ${n + 1}), i -> ($a)[i] * ($b)[i])")

  private def cosSqlN(a: String, b: String, n: Int): String =
    s"${dotSqlN(a, b, n)} / (sqrt(${dotSqlN(a, a, n)}) * sqrt(${dotSqlN(b, b, n)}))"

  /** Squared-L2 twin of [[graft.functions.vec_l2sq]] — identical
    * left-to-right fold over (a_i−b_i)², so PQ codebook assignment
    * never sits on a float knife-edge across engines.
    */
  private def l2Sql(a: String, b: String, n: Int): String =
    foldSumDoubleSql(
      s"list_transform(range(1, ${n + 1}), i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]))")

  /** DYNAMIC-plane-count SRP oracle machinery (round 7): the plane
    * count is now a scalar derived from `count(*)` (the ScaleParams
    * rule), so the oracle can no longer unroll per-plane SQL at text-
    * build time. Instead:
    *
    *  - `sg` materializes one ±1 sign LIST per plane j (ordered by
    *    dim) from the identical [[Similarity.planeSign]] derivation —
    *    md5("j_i") first-hex-digit parity — nplanes×dims md5 calls
    *    total, reused by every vector;
    *  - per-(vector, plane) dots use the SAME left-to-right
    *    `list_reduce` fold as [[Similarity.dot]], so the `> 0` sign
    *    never sits on an order-of-summation knife edge;
    *  - bucket bits re-assemble with an integer (order-free) sum.
    */
  private def signListsCte(nplanesExpr: String, ceiling: Int = 256): String =
    // DuckDB range() takes only constant bounds: enumerate a constant
    // plane ceiling (default 256 = bands×planes for any corpus under
    // 2^60 rows at the FIXED 4-band parameterization; the decontam
    // family's recall-DERIVED band count needs more headroom — its
    // call sites pass 4096, still O(ceiling) cheap because the j <
    // filter prunes before the md5 aggregate) and filter by the
    // derived scalar. ADVICE r14: an operating point whose DERIVED
    // plane count exceeds the ceiling must error() with a named cause,
    // not silently truncate the plane family into an opaque row
    // mismatch (the loose decontam threshold derives past 4096 around
    // ~50k rows) — the CASE is branch-lazy in DuckDB, so in-ceiling
    // runs never evaluate the error
    s"""sg AS (SELECT j, list(CASE WHEN
       |    ('0x' || substr(md5(j || '_' || i), 1, 1))::BIGINT % 2 = 0
       |    THEN 1.0 ELSE -1.0 END ORDER BY i) AS sv
       |  FROM range(0, $ceiling) t(j), range(0, $EmbedDims) u(i)
       |  WHERE j < CASE WHEN ($nplanesExpr) > $ceiling
       |    THEN error('signListsCte: derived plane count ' ||
       |      ($nplanesExpr) || ' exceeds the enumerated ceiling $ceiling')
       |    ELSE ($nplanesExpr) END
       |  GROUP BY j)""".stripMargin

  /** Per-(vec_id, plane j) signed dot — exact fold order. */
  private val planeDotsCte: String =
    s"""d AS (SELECT vec_id, j,
       |  ${foldSumDoubleSql(s"list_transform(range(1, ${EmbedDims + 1}), i -> v[i] * sv[i])")} AS dt
       |  FROM e, sg)""".stripMargin

  /** One unrolled Lloyd iteration for the q80 oracle: E-step argmax
    * assignment against `prev` centroids, M-step per-component mean
    * rounded to 6 decimals (the cross-engine parity contract — see
    * the q80 Scaladoc).
    */
  private def lloydCteSql(it: Int, prev: String): String =
    s"""a$it AS (SELECT vec_id, v, c_id AS list_id FROM (
       |  SELECT e.vec_id, e.v, $prev.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", s"$prev.c_vec")} DESC, $prev.c_id) AS crk
       |  FROM e, $prev) WHERE crk = 1),
       |m$it AS (SELECT list_id, i, round(avg(v[i]), 6) AS m
       |  FROM a$it, (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) idx
       |  GROUP BY list_id, i),
       |c$it AS (SELECT list_id AS c_id, list(m ORDER BY i) AS c_vec
       |  FROM m$it GROUP BY list_id)""".stripMargin

  private val simhashTermsSql = (0 until 32)
    .map(i => s"CASE WHEN 2*len(list_filter(hs, h -> ((h >> $i) & 1) = 1)) > len(hs) THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    .mkString("\n    + ")

  private[graft] val langCaseSql = {
    val best = TextAnalysis.stopwords.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val whens = TextAnalysis.stopwords
      .map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }.mkString("\n  ")
    s"CASE WHEN $best = 0 THEN 'und'\n  $whens\n  ELSE 'und' END"
  }

  /** The three ANN oracle texts, hoisted so q112's recall audit can
    * nest them verbatim as subqueries (a WITH chain is a valid
    * parenthesized subquery in DuckDB) — one source of truth for
    * ranking semantics across q25/q26/q87 and the audit.
    */
  /** q203's oracle as a nestable val (the q112 precedent: a full
    * `WITH … ORDER BY` text is a valid parenthesized subquery) —
    * q257's coverage audit nests it.
    */
  private lazy val kCenterOracle: String = {
    def cm(a: String, b: String) =
      s"CAST(round((${cosSql(a, b)}) * 1000000.0) AS BIGINT)"
    val steps = (2 to KCenterRounds).map { r =>
      val pd = s"d${r - 1}"
      s"""p$r AS (SELECT vec_id, v, dmax FROM $pd ORDER BY dmax, vec_id LIMIT 1),
         |d$r AS (SELECT $pd.vec_id, $pd.v,
         |  greatest($pd.dmax, ${cm(s"$pd.v", s"p$r.v")}) AS dmax
         |  FROM $pd, p$r WHERE $pd.vec_id <> p$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val outs = (2 to KCenterRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, vec_id, dmax AS dmax_micro FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS (SELECT e.vec_id, e.v, ${cm("e.v", "c1.v")} AS dmax
       |  FROM e, c1 WHERE e.vec_id <> c1.vec_id),
       |$steps
       |SELECT CAST(1 AS BIGINT) AS round, vec_id,
       |  CAST(-1 AS BIGINT) AS dmax_micro FROM c1
       |UNION ALL $outs
       |ORDER BY round""".stripMargin
  }

  /** q248's oracle as a nestable val — q264's epoch table nests it. */
  private lazy val alphaMixtureOracle: String =
    s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
       |src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM toks GROUP BY source),
       |f AS (SELECT source, n_tokens,
       |  CAST(round(exp($AlphaTemp * ln(CAST(n_tokens AS DOUBLE))) * 1000000.0) AS BIGINT) AS f_micro
       |  FROM src),
       |tots AS (SELECT CAST(sum(f_micro) AS BIGINT) AS u,
       |  CAST(sum(n_tokens) AS BIGINT) AS t FROM f),
       |q AS (SELECT source, n_tokens, f_micro,
       |  CAST(n_tokens * 10000 // t AS BIGINT) AS w0_bp,
       |  CAST(f_micro * 10000 // u AS BIGINT) AS base,
       |  (f_micro * 10000) % u AS rem FROM f, tots),
       |r AS (SELECT source, n_tokens, f_micro, w0_bp, base,
       |  row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
       |lo AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS l FROM r)
       |SELECT source, n_tokens, f_micro, w0_bp,
       |  CAST(base + CASE WHEN rk <= l THEN 1 ELSE 0 END AS BIGINT) AS w1_bp
       |FROM r, lo ORDER BY source""".stripMargin

  /** q250's oracle, nestable for the same reason. */
  private lazy val mmrOracle: String = {
    def cm(a: String, b: String) =
      s"CAST(round((${cosSql(a, b)}) * 1000000.0) AS BIGINT)"
    val lam = MmrLambdaX10
    val steps = (2 to MmrRounds).map { r =>
      val pd = s"d${r - 1}"
      s"""p$r AS (SELECT vec_id, v, rel,
         |  $lam * rel - ${10 - lam} * maxsim AS score FROM $pd
         |  ORDER BY score DESC, vec_id LIMIT 1),
         |d$r AS (SELECT $pd.vec_id, $pd.v, $pd.rel,
         |  greatest($pd.maxsim, ${cm(s"$pd.v", s"p$r.v")}) AS maxsim
         |  FROM $pd, p$r WHERE $pd.vec_id <> p$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val outs = (2 to MmrRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, vec_id, rel AS rel_micro, score AS score_x10micro FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qv AS (SELECT v AS q_vec FROM e WHERE vec_id = 0),
       |rel AS (SELECT vec_id, v, ${cm("v", "q_vec")} AS rel
       |  FROM e, qv WHERE vec_id <> 0),
       |p1 AS (SELECT vec_id, v, rel FROM rel ORDER BY rel DESC, vec_id LIMIT 1),
       |d1 AS (SELECT r.vec_id, r.v, r.rel, ${cm("r.v", "p1.v")} AS maxsim
       |  FROM rel r, p1 WHERE r.vec_id <> p1.vec_id),
       |$steps
       |SELECT CAST(1 AS BIGINT) AS round, vec_id, rel AS rel_micro,
       |  CAST(-1 AS BIGINT) AS score_x10micro FROM p1
       |UNION ALL $outs
       |ORDER BY round""".stripMargin
  }

  /** q24's banded-SRP embedding dedup text, with `pairCond` appended
    * to the candidate predicate — "" is the full chain (q24), a
    * touch-the-increment clause is the incremental twin (q284).
    */
  private def embedDedupOracle(pairCond: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT ${ScaleParams.srpBandPlanesSql} AS planes FROM e),
       |${signListsCte(s"$EmbedBands * (SELECT planes FROM p)")},
       |$planeDotsCte,
       |bk AS (SELECT vec_id, j // pp.planes AS band, pp.planes AS planes,
       |  CAST(sum(CASE WHEN dt > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(j % pp.planes AS INT)) ELSE 0 END) AS BIGINT) AS bits
       |  FROM d, p pp GROUP BY 1, 2, 3),
       |k AS (SELECT vec_id,
       |  (CAST(band AS BIGINT) << CAST(planes AS INT)) + bits AS bucket FROM bk),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |         FROM k a JOIN k b2 USING (bucket) WHERE a.vec_id < b2.vec_id$pairCond),
       |pairs AS (SELECT id_a, id_b, ${cosSql("ea.v", "eb.v")} AS cos
       |          FROM cand JOIN e ea ON ea.vec_id = id_a
       |                    JOIN e eb ON eb.vec_id = id_b)
       |SELECT id_a, id_b, cos FROM pairs WHERE cos >= $NearDupCos ORDER BY id_a, id_b""".stripMargin

  /** q293's oracle — the exact corpus × eval cross product. */
  private lazy val embedDecontamOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ev AS (SELECT vec_id AS e_id, v AS e_vec FROM e WHERE vec_id % 10 = 7),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
       |scored AS (SELECT c.vec_id, ev.e_id,
       |    ${cosSql("c.v", "ev.e_vec")} AS cos FROM c, ev),
       |best AS (SELECT vec_id, e_id, cos FROM (
       |  SELECT vec_id, e_id, cos, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, e_id) AS rk FROM scored) WHERE rk = 1)
       |SELECT vec_id, e_id AS near_eval_id, cos AS max_cos,
       |  CAST(CASE WHEN cos >= ${Similarity.NearDupCos} THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM best ORDER BY vec_id""".stripMargin

  /** q297's oracle — the [[embedDedupOracle]] banding machinery
    * (identical md5-derived planes, identical fold order, identical
    * occupancy-scaled plane count) with the bucket self-join split
    * corpus↔eval, then exact cosine + per-vector argmax + threshold on
    * the CANDIDATES only. The oracle reproduces the banding because
    * SRP banding has false negatives (unlike q85's Bloom prefilter) —
    * the banded-vs-exact gap is q298's measured recall, not something
    * an oracle may silently absorb.
    */
  private lazy val embedDecontamBandedOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT ${ScaleParams.srpBandPlanesSql} AS planes FROM e),
       |lb AS (SELECT ${ScaleParams.srpBandsForSql(Similarity.NearDupCos,
                Similarity.DecontamRecallBp)} AS bands FROM p),
       |${signListsCte("(SELECT bands FROM lb) * (SELECT planes FROM p)",
                ceiling = 4096)},
       |$planeDotsCte,
       |bk AS (SELECT vec_id, j // pp.planes AS band, pp.planes AS planes,
       |  CAST(sum(CASE WHEN dt > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(j % pp.planes AS INT)) ELSE 0 END) AS BIGINT) AS bits
       |  FROM d, p pp GROUP BY 1, 2, 3),
       |k AS (SELECT vec_id,
       |  (CAST(band AS BIGINT) << CAST(planes AS INT)) + bits AS bucket FROM bk),
       |cand AS (SELECT DISTINCT c.vec_id, ev.vec_id AS e_id
       |         FROM k c JOIN k ev USING (bucket)
       |         WHERE c.vec_id % 10 <> 7 AND ev.vec_id % 10 = 7),
       |pairs AS (SELECT cand.vec_id, cand.e_id,
       |    ${cosSql("ec.v", "ee.v")} AS cos
       |    FROM cand JOIN e ec ON ec.vec_id = cand.vec_id
       |              JOIN e ee ON ee.vec_id = cand.e_id),
       |best AS (SELECT vec_id, e_id, cos FROM (
       |  SELECT vec_id, e_id, cos, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, e_id) AS rk FROM pairs) WHERE rk = 1)
       |SELECT vec_id, e_id AS near_eval_id, cos AS max_cos
       |FROM best WHERE cos >= ${Similarity.NearDupCos} ORDER BY vec_id""".stripMargin

  /** q298's oracle — both chains' FULL texts nested as parenthesized
    * subqueries (the round-8 composition recipe; each keeps its own
    * WITH scope), compared on the flagged vec_id sets.
    */
  private lazy val decontamRecallOracle: String =
    s"""WITH ex AS (SELECT vec_id FROM ($embedDecontamOracle) WHERE flagged = 1),
       |bd AS (SELECT vec_id, CAST(1 AS BIGINT) AS hit
       |       FROM ($embedDecontamBandedOracle))
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(coalesce(bd.hit, 0)) AS BIGINT) AS n_banded,
       |  CAST(CASE WHEN count(*) = 0 THEN 10000
       |    ELSE sum(coalesce(bd.hit, 0)) * 10000 // count(*) END AS BIGINT) AS recall_bp
       |FROM ex LEFT JOIN bd USING (vec_id)""".stripMargin

  /** The planted-leak eval CTE (q299/q300) — the exact SQL twin of
    * [[plantedEvalTight]]: component i of eval item vec_id scaled by
    * 1.45/0.55 on the parity of md5('e' || vec_id || '_' || i), i
    * 0-based on both engines (DuckDB's 1-based list position shifted
    * by one).
    */
  private val plantedEvalCte: String =
    s"""ev AS (SELECT vec_id AS e_id, list_transform(range(1, ${EmbedDims + 1}),
       |  i -> v[i] * CASE WHEN ('0x' || substr(md5('e' || vec_id || '_' || (i-1)), 1, 1))::BIGINT % 2 = 0
       |    THEN 1.45 ELSE 0.55 END) AS w
       |  FROM e WHERE vec_id % 10 = 7)""".stripMargin

  /** q299's oracle — the [[embedDecontamBandedOracle]] machinery with
    * the planted eval side carrying its OWN plane dots/buckets (the
    * eval vectors are derived, not table rows), the tight threshold,
    * and the tight-threshold derived band count.
    */
  private lazy val decontamTightBandedOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$plantedEvalCte,
       |p AS (SELECT ${ScaleParams.srpBandPlanesSql} AS planes FROM e),
       |lb AS (SELECT ${ScaleParams.srpBandsForSql(Similarity.DecontamTightCos,
                Similarity.DecontamRecallBp)} AS bands FROM p),
       |${signListsCte("(SELECT bands FROM lb) * (SELECT planes FROM p)",
                ceiling = 4096)},
       |$planeDotsCte,
       |de AS (SELECT e_id, j,
       |  ${foldSumDoubleSql(s"list_transform(range(1, ${EmbedDims + 1}), i -> w[i] * sv[i])")} AS dt
       |  FROM ev, sg),
       |bk AS (SELECT vec_id, j // pp.planes AS band, pp.planes AS planes,
       |  CAST(sum(CASE WHEN dt > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(j % pp.planes AS INT)) ELSE 0 END) AS BIGINT) AS bits
       |  FROM d, p pp GROUP BY 1, 2, 3),
       |bke AS (SELECT e_id, j // pp.planes AS band, pp.planes AS planes,
       |  CAST(sum(CASE WHEN dt > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(j % pp.planes AS INT)) ELSE 0 END) AS BIGINT) AS bits
       |  FROM de, p pp GROUP BY 1, 2, 3),
       |k AS (SELECT vec_id,
       |  (CAST(band AS BIGINT) << CAST(planes AS INT)) + bits AS bucket FROM bk),
       |ke AS (SELECT e_id,
       |  (CAST(band AS BIGINT) << CAST(planes AS INT)) + bits AS bucket FROM bke),
       |cand AS (SELECT DISTINCT c.vec_id, ev2.e_id
       |         FROM k c JOIN ke ev2 USING (bucket)),
       |pairs AS (SELECT cand.vec_id, cand.e_id,
       |    ${cosSql("ec.v", "ee.w")} AS cos
       |    FROM cand JOIN e ec ON ec.vec_id = cand.vec_id
       |              JOIN ev ee ON ee.e_id = cand.e_id),
       |best AS (SELECT vec_id, e_id, cos FROM (
       |  SELECT vec_id, e_id, cos, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, e_id) AS rk FROM pairs) WHERE rk = 1)
       |SELECT vec_id, e_id AS near_eval_id, cos AS max_cos
       |FROM best WHERE cos >= ${Similarity.DecontamTightCos} ORDER BY vec_id""".stripMargin

  /** q300's exact side — the q293 cross product over the planted eval
    * set at the tight threshold; the corpus is the FULL table.
    */
  private lazy val decontamTightExactOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$plantedEvalCte,
       |scored AS (SELECT e.vec_id, ev.e_id,
       |    ${cosSql("e.v", "ev.w")} AS cos FROM e, ev),
       |best AS (SELECT vec_id, e_id, cos FROM (
       |  SELECT vec_id, e_id, cos, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, e_id) AS rk FROM scored) WHERE rk = 1)
       |SELECT vec_id, e_id AS near_eval_id, cos AS max_cos,
       |  CAST(CASE WHEN cos >= ${Similarity.DecontamTightCos} THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM best ORDER BY vec_id""".stripMargin

  /** q302's oracle — the exact cross product rolled up on the eval
    * key, clean items kept by the left join.
    */
  private lazy val decontamReportOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ev AS (SELECT vec_id AS e_id, v AS e_vec FROM e WHERE vec_id % 10 = 7),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
       |hits AS (SELECT e_id, cos FROM (
       |  SELECT ev.e_id, ${cosSql("c.v", "ev.e_vec")} AS cos FROM c, ev)
       |  WHERE cos >= ${Similarity.NearDupCos}),
       |agg AS (SELECT e_id, CAST(count(*) AS BIGINT) AS n_contaminated,
       |  max(cos) AS mx FROM hits GROUP BY e_id)
       |SELECT ev.e_id, COALESCE(agg.n_contaminated, 0) AS n_contaminated,
       |  COALESCE(agg.mx, 0.0) AS max_cos
       |FROM ev LEFT JOIN agg ON agg.e_id = ev.e_id ORDER BY ev.e_id""".stripMargin

  /** q300's oracle — both tight chains nested (the q298 pattern). */
  private lazy val decontamTightRecallOracle: String =
    s"""WITH ex AS (SELECT vec_id FROM ($decontamTightExactOracle) WHERE flagged = 1),
       |bd AS (SELECT vec_id, CAST(1 AS BIGINT) AS hit
       |       FROM ($decontamTightBandedOracle))
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(coalesce(bd.hit, 0)) AS BIGINT) AS n_banded,
       |  CAST(CASE WHEN count(*) = 0 THEN 10000
       |    ELSE sum(coalesce(bd.hit, 0)) * 10000 // count(*) END AS BIGINT) AS recall_bp
       |FROM ex LEFT JOIN bd USING (vec_id)""".stripMargin

  /** Components over the q24 pair graph (q287): the full q24 oracle
    * text nested verbatim as the edge set (the round-8 composition
    * recipe), then the same recursive-reachability labeling as
    * [[componentsOracle]] with the node universe = every vector.
    */
  private lazy val embedComponentsOracle: String =
    s"""WITH RECURSIVE pv AS (SELECT id_a, id_b FROM (${embedDedupOracle("")})),
       |sym AS (SELECT id_a AS s, id_b AS d FROM pv
       |        UNION ALL SELECT id_b, id_a FROM pv),
       |reach(id, lbl) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT sym.d, reach.lbl FROM reach JOIN sym ON sym.s = reach.id)
       |SELECT id AS vec_id, min(lbl) AS canonical_id
       |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin

  private lazy val knnBruteOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
       |scored AS (SELECT q_id, vec_id, ${cosSql("q_vec", "v")} AS cos
       |           FROM q, e WHERE vec_id <> q_id),
       |ranked AS (SELECT q_id, vec_id, cos,
       |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |           FROM scored)
       |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private lazy val knnLshOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.lshPlanesSql} AS planes FROM e),
         |${signListsCte("(SELECT planes FROM p)")},
         |$planeDotsCte,
         |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN dt > 0
         |    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM d GROUP BY vec_id),
         |b AS (SELECT e.vec_id, e.v, bkt.bucket FROM e JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS q_vec, bucket FROM b WHERE vec_id < 10),
         |scored AS (SELECT q_id, c.vec_id, ${cosSql("q_vec", "c.v")} AS cos
         |           FROM q JOIN b c USING (bucket) WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private lazy val knnMultiProbeOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.lshPlanesSql} AS planes FROM e),
         |${signListsCte("(SELECT planes FROM p)")},
         |$planeDotsCte,
         |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN dt > 0
         |    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM d GROUP BY vec_id),
         |b AS (SELECT e.vec_id, e.v, bkt.bucket FROM e JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS q_vec, bucket FROM b WHERE vec_id < 10),
         |masks AS (SELECT CASE WHEN j < 0 THEN CAST(0 AS BIGINT)
         |    ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END AS mask
         |  FROM (SELECT unnest(range(-1, 64)) AS j)
         |  WHERE j < (SELECT planes FROM p)),
         |probes AS (SELECT q_id, q_vec, xor(bucket, mask) AS bucket FROM q, masks),
         |scored AS (SELECT q_id, c.vec_id, ${cosSql("q_vec", "c.v")} AS cos
         |           FROM probes JOIN b c USING (bucket) WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private lazy val knnIvfOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
         |c AS (SELECT vec_id AS c_id, v AS c_vec FROM e
         |      WHERE vec_id < (SELECT lists FROM p)),
         |assign AS (SELECT vec_id, v, c_id AS list_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.v", "c.c_vec")} DESC, c.c_id) AS crk
         |  FROM e, c) WHERE crk = 1),
         |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
         |probes AS (SELECT q_id, q_vec, c_id AS list_id FROM (
         |  SELECT q.q_id, q.q_vec, c.c_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("q.q_vec", "c.c_vec")} DESC, c.c_id) AS crk
         |  FROM q, c) WHERE crk <= $IvfProbes),
         |scored AS (SELECT q_id, a.vec_id, ${cosSql("p.q_vec", "a.v")} AS cos
         |           FROM probes p JOIN assign a USING (list_id)
         |           WHERE a.vec_id <> p.q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** q288's oracle — the knnIvfOracle assignment/probe CTEs reduced
    * to list-size economics (no rerank: the audit never touches
    * vectors after assignment, and neither does its SQL).
    */
  private lazy val ivfAuditOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
       |c AS (SELECT vec_id AS c_id, v AS c_vec FROM e
       |      WHERE vec_id < (SELECT lists FROM p)),
       |assign AS (SELECT vec_id, c_id AS list_id FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.c_vec")} DESC, c.c_id) AS crk
       |  FROM e, c) WHERE crk = 1),
       |sizes AS (SELECT list_id, CAST(count(*) AS BIGINT) AS cnt
       |          FROM assign GROUP BY list_id),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
       |probes AS (SELECT q_id, c_id AS list_id FROM (
       |  SELECT q.q_id, c.c_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY ${cosSql("q.q_vec", "c.c_vec")} DESC, c.c_id) AS crk
       |  FROM q, c) WHERE crk <= $IvfProbes)
       |SELECT q_id,
       |  string_agg(CAST(s.list_id AS VARCHAR), ',' ORDER BY s.list_id) AS probe_lists,
       |  CAST(count(*) AS BIGINT) AS n_lists,
       |  CAST(sum(s.cnt) AS BIGINT) AS cand_rows,
       |  CAST(sum(s.cnt) * 10000 // (SELECT n FROM tot) AS BIGINT) AS scan_bp
       |FROM probes pr JOIN sizes s ON s.list_id = pr.list_id
       |GROUP BY q_id ORDER BY q_id""".stripMargin

  /** q290's oracle — the q80 Lloyd CTE chain, with `a1` (assignment
    * under the seed quantizer c0 — the first Lloyd E-step) compared
    * against the final assignment under c[[LloydIters]].
    */
  private lazy val indexChurnOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
       |c0 AS (SELECT vec_id AS c_id, v AS c_vec FROM e
       |       WHERE vec_id < (SELECT lists FROM p)),
       |${(1 to LloydIters).map(it => lloydCteSql(it, s"c${it - 1}")).mkString(",\n")},
       |af AS (SELECT vec_id, c_id AS list_id FROM (
       |  SELECT e.vec_id, cL.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "cL.c_vec")} DESC, cL.c_id) AS crk
       |  FROM e, c$LloydIters cL) WHERE crk = 1),
       |j AS (SELECT a1.vec_id, a1.list_id AS seed_list, af.list_id AS new_list
       |      FROM a1 JOIN af ON af.vec_id = a1.vec_id)
       |SELECT seed_list, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN new_list <> seed_list THEN 1 ELSE 0 END) AS BIGINT) AS moved,
       |  CAST(sum(CASE WHEN new_list <> seed_list THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS churn_bp
       |FROM j GROUP BY seed_list ORDER BY seed_list""".stripMargin

  /** q289's oracle — [[GeoMedianIters]] Weiszfeld rounds unrolled as
    * CTE pairs (the q80/q250 constant-iteration convention): distances
    * via the same left-to-right [[l2Sql]] fold over the same
    * `round(·,6)` median components, weighted means rounded
    * identically, degenerate groups falling back to the previous
    * estimate on both engines.
    */
  private lazy val geoMedianOracle: String = {
    val iters = (1 to GeoMedianIters).map { t =>
      val pm = s"m${t - 1}"
      s"""d$t AS (SELECT e.grp, e.vec_id,
         |    ${l2Sql("e.v", s"${pm}v.mv", EmbedDims)} AS d2
         |  FROM e JOIN ${pm}v USING (grp)),
         |w$t AS (SELECT grp, vec_id,
         |    CASE WHEN d2 > 0 THEN 1.0 / sqrt(d2) ELSE 0.0 END AS w FROM d$t),
         |m$t AS (SELECT c.grp, c.pos,
         |    CASE WHEN sum(w.w) > 0 THEN round(sum(w.w * c.x) / sum(w.w), 6)
         |         ELSE min(pp.m) END AS m
         |  FROM comp c JOIN w$t w ON w.grp = c.grp AND w.vec_id = c.vec_id
         |  JOIN $pm pp ON pp.grp = c.grp AND pp.pos = c.pos
         |  GROUP BY c.grp, c.pos),
         |m${t}v AS (SELECT grp, list(m ORDER BY pos) AS mv FROM m$t GROUP BY grp)""".stripMargin
    }.mkString(",\n")
    val last = s"m$GeoMedianIters"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |    vec_id % $GeoMedianGroups AS grp FROM embeddings),
       |comp AS (SELECT grp, vec_id, CAST(i AS BIGINT) AS pos, v[i] AS x
       |  FROM e, (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) ii),
       |m0 AS (SELECT grp, pos, round(avg(x), 6) AS m FROM comp GROUP BY grp, pos),
       |m0v AS (SELECT grp, list(m ORDER BY pos) AS mv FROM m0 GROUP BY grp),
       |$iters
       |SELECT m0.grp AS group_id, m0.pos AS pos, m0.m AS mean_c, $last.m AS med_c
       |FROM m0 JOIN $last ON $last.grp = m0.grp AND $last.pos = m0.pos
       |ORDER BY group_id, pos""".stripMargin
  }

  /** Full-rebuild components oracle — shared by q31 (direct build)
    * and q121 (incremental star-contraction build): the text never
    * sees q121's edge split, so the compare hashes merge≡rebuild.
    */
  private lazy val componentsOracle: String =
    s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |$jacCte,
       |$ccReachCtes
       |SELECT id AS doc_id, min(lbl) AS canonical_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // Heaps: same document-boundary first-seen rule, same dyadic
    // checkpoint generator, same slopeMilliSql beta text
    "q269_heaps" ->
      s"""WITH tt AS (SELECT doc_id, $ltoksSql AS t FROM documents),
         |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt FROM tt),
         |cum AS (SELECT doc_id, nt, CAST(sum(nt) OVER (ORDER BY doc_id) AS BIGINT) AS ct FROM d),
         |tm AS (SELECT doc_id, unnest(t) AS term FROM tt),
         |fi AS (SELECT term, min(doc_id) AS doc_id FROM tm GROUP BY term),
         |nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new FROM fi GROUP BY doc_id),
         |vc AS (SELECT c.doc_id, c.ct,
         |  CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY c.doc_id) AS BIGINT) AS vcum
         |  FROM cum c LEFT JOIN nn n ON n.doc_id = c.doc_id),
         |tot AS (SELECT max(ct) AS total FROM vc),
         |cks AS (SELECT j, CAST(pow(2.0, CAST(j AS DOUBLE)) AS BIGINT) AS ck
         |  FROM (SELECT unnest(range($HeapsMinJ, 63)) AS j), tot
         |  WHERE CAST(pow(2.0, CAST(j AS DOUBLE)) AS BIGINT) <= total),
         |v AS (SELECT j, ck, max(vcum) AS vocab FROM vc, cks WHERE ct <= ck GROUP BY j, ck),
         |pts AS (SELECT CAST(round(ln(CAST(ck AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
         |  CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000.0) AS BIGINT) AS y FROM v),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM pts),
         |b AS (SELECT $slopeMilliSql AS beta_milli FROM m)
         |SELECT j, ck, vocab, beta_milli FROM v, b ORDER BY j""".stripMargin,

    // Chao1/Good-Turing: source-local counts per source, corpus-wide
    // re-count for the ALL row (corpus f1 != sum of source f1)
    "q270_chao1" ->
      s"""WITH tm AS (SELECT source, unnest($ltoksSql) AS term FROM documents),
         |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM tm GROUP BY source, term),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS v_obs, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS f1,
         |  CAST(count(CASE WHEN c = 2 THEN 1 END) AS BIGINT) AS f2
         |  FROM tc GROUP BY source),
         |ac AS (SELECT term, CAST(sum(c) AS BIGINT) AS c FROM tc GROUP BY term),
         |al AS (SELECT 'ALL' AS source, CAST(count(*) AS BIGINT) AS v_obs, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS f1,
         |  CAST(count(CASE WHEN c = 2 THEN 1 END) AS BIGINT) AS f2 FROM ac),
         |u AS (SELECT * FROM per UNION ALL SELECT * FROM al)
         |SELECT source, v_obs, n_tokens, f1, f2,
         |  v_obs * 1000 + CAST(round(500.0 * CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / CAST(f2 + 1 AS DOUBLE)) AS BIGINT) AS chao1_milli,
         |  f1 * 10000 // n_tokens AS unseen_bp
         |FROM u ORDER BY source""".stripMargin,

    // Mann-Whitney: doubled-midrank algebra over the value-grouped
    // count store; variance text mirrors mwFromCounts verbatim
    "q271_mannwhitney" -> {
      val va = "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 * (CAST(n + 1 AS DOUBLE) - CAST(st3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))"
      s"""$qualityScoreCtes,
         |sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
         |  CAST(round(quality * 1000000) AS BIGINT) AS v FROM q),
         |byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS na_v, CAST(count(*) AS BIGINT) AS t FROM sc GROUP BY v),
         |cum AS (SELECT v, na_v, t, CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cle FROM byv),
         |m AS (SELECT CAST(sum(na_v) AS BIGINT) AS na, CAST(sum(t - na_v) AS BIGINT) AS nb,
         |  CAST(sum(na_v * (2 * (cle - t) + t + 1)) AS BIGINT) AS r2,
         |  CAST(sum(t * t * t - t) AS BIGINT) AS st3, CAST(sum(t) AS BIGINT) AS n FROM cum)
         |SELECT na AS n_a, nb AS n_b, r2 - na * (na + 1) AS u2_a,
         |  CAST(CASE WHEN n < 2 OR na = 0 OR nb = 0 OR $va <= 0.0 THEN 0
         |  ELSE round((CAST(r2 - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
         |    / (2.0 * sqrt($va)) * 1000.0) END AS BIGINT) AS z_milli
         |FROM m""".stripMargin
    },

    // Anisotropy: settled micro moments, exact micro^2 variance
    // arithmetic, HUGEINT for the lone 128-bit sum (q199's contract)
    "q272_anisotropy" ->
      s"""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) idx),
         |c AS (SELECT i, CAST(round(avg(x) * 1000000) AS BIGINT) AS m_micro,
         |  CAST(round(avg(x * x) * 1000000) AS BIGINT) AS m2_micro FROM ex GROUP BY i),
         |p AS (SELECT m2_micro * 1000000 - m_micro * m_micro AS var_sc, m_micro, m2_micro FROM c),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS dims, CAST(sum(var_sc) AS BIGINT) AS svar,
         |  sum(CAST(var_sc AS HUGEINT) * var_sc) AS svar2,
         |  CAST(sum(m_micro * m_micro) AS BIGINT) AS smm,
         |  CAST(sum(m2_micro) AS BIGINT) AS sm2 FROM p),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings)
         |SELECT n_vecs, dims,
         |  CAST(CASE WHEN CAST(svar2 AS DOUBLE) <= 0.0 THEN 0
         |  ELSE round(CAST(svar AS DOUBLE) * CAST(svar AS DOUBLE) / CAST(svar2 AS DOUBLE) * 1000.0) END AS BIGINT) AS pr_milli,
         |  CAST(smm * 10000 // (sm2 * 1000000) AS BIGINT) AS aniso_bp
         |FROM m, nv""".stripMargin,

    // Lognormality: same settled-milli ln, exact power sums (HUGEINT
    // for the two high moments), the same shapeMomentSql derived text
    "q273_lognormal" -> {
      val derived = shapeMomentSql.map { case (nme, sql) => s"$sql AS $nme" }
        .mkString(",\n")
      s"""WITH xs AS (SELECT source,
         |  CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000.0) AS BIGINT) AS x
         |  FROM documents),
         |mper AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         |  sum(CAST(x AS HUGEINT) * x * x) AS sxxx,
         |  sum(CAST(x AS HUGEINT) * x * x * x) AS sxxxx
         |  FROM xs GROUP BY source),
         |mall AS (SELECT 'ALL' AS source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         |  sum(CAST(x AS HUGEINT) * x * x) AS sxxx,
         |  sum(CAST(x AS HUGEINT) * x * x * x) AS sxxxx
         |  FROM xs),
         |m AS (SELECT * FROM mper UNION ALL SELECT * FROM mall)
         |SELECT source, n,
         |$derived
         |FROM m ORDER BY source""".stripMargin
    },

    // Burstiness: per-doc counts with zeros folded analytically
    // (variance over ALL docs from sums over occurring docs only)
    "q274_burstiness" ->
      s"""WITH tm AS (SELECT doc_id, unnest($ltoksSql) AS term FROM documents),
         |pc AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c FROM tm GROUP BY term, doc_id),
         |ag AS (SELECT term, CAST(sum(c) AS BIGINT) AS cnt, CAST(count(*) AS BIGINT) AS df,
         |  CAST(sum(c * c) AS BIGINT) AS sc2 FROM pc GROUP BY term),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |top AS (SELECT term, cnt, df, sc2 FROM ag ORDER BY cnt DESC, term LIMIT $BurstTopK)
         |SELECT term, cnt, df,
         |  CAST(round((CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE) - CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fano_milli
         |FROM top, nd ORDER BY cnt DESC, term""".stripMargin,

    // K-stage unrolled BPE twin, generated from the same sentinel,
    // merge count, and tie-break constants as the Spark trainer
    "q122_bpe_merges" -> graft.text.Bpe.oracleSql(graft.text.Bpe.DefaultMerges),
    "q130_bpe_apply" -> graft.text.Bpe.applyOracleSql(graft.text.Bpe.DefaultMerges),

    // DSIR twin: same bucket hash, Laplace smoothing, and lowercase
    // tokenizer; bigrams by 1-based list index (q83's pattern)
    "q123_dsir_weights" ->
      s"""WITH tt AS (SELECT doc_id, lang, $ltoksSql AS t FROM documents),
         |toks AS (SELECT doc_id, lang, unnest(range(1, len(t) + 1)) AS pos, t FROM tt),
         |g AS (SELECT doc_id, lang, t[pos] AS gram FROM toks
         |      UNION ALL
         |      SELECT doc_id, lang, t[pos - 1] || ' ' || t[pos] AS gram FROM toks WHERE pos >= 2),
         |f AS (SELECT doc_id, lang,
         |  ('0x' || substr(md5(gram), 1, 8))::BIGINT % $DsirBuckets AS bucket FROM g),
         |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
         |  CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS ct
         |  FROM f GROUP BY bucket),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM m)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(sum(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $DsirBuckets AS DOUBLE))
         |          - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $DsirBuckets AS DOUBLE))), 6) AS dsir_logw
         |FROM f JOIN m USING (bucket), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ESS: the q123 chain with per-BUCKET micro settling (order-free
    // integer per-doc sums), integer max-shift, one exp per doc
    "q236_dsir_ess" ->
      s"""WITH tt AS (SELECT doc_id, lang, $ltoksSql AS t FROM documents),
         |toks AS (SELECT doc_id, lang, unnest(range(1, len(t) + 1)) AS pos, t FROM tt),
         |g AS (SELECT doc_id, lang, t[pos] AS gram FROM toks
         |      UNION ALL
         |      SELECT doc_id, lang, t[pos - 1] || ' ' || t[pos] AS gram FROM toks WHERE pos >= 2),
         |f AS (SELECT doc_id, lang,
         |  ('0x' || substr(md5(gram), 1, 8))::BIGINT % $DsirBuckets AS bucket FROM g),
         |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
         |  CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS ct
         |  FROM f GROUP BY bucket),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM m),
         |lw AS (SELECT bucket,
         |  CAST(round((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $DsirBuckets AS DOUBLE))
         |    - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $DsirBuckets AS DOUBLE))) * 1000000.0) AS BIGINT) AS lw_micro
         |  FROM m, tot),
         |pd AS (SELECT doc_id, CAST(sum(lw_micro) AS BIGINT) AS logw_micro
         |  FROM f JOIN lw USING (bucket) GROUP BY doc_id),
         |mx AS (SELECT CAST(max(logw_micro) AS BIGINT) AS mx FROM pd),
         |w AS (SELECT CAST(round(exp(CAST(logw_micro - mx AS DOUBLE) / 1000000.0) * 1000.0) AS BIGINT) AS w_milli, mx
         |  FROM pd, mx),
         |sm AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(mx) AS BIGINT) AS max_logw_micro,
         |  CAST(sum(w_milli) AS BIGINT) AS sum_w_milli,
         |  CAST(sum(w_milli * w_milli) AS BIGINT) AS sw2 FROM w)
         |SELECT n_docs, max_logw_micro, sum_w_milli,
         |  CAST(round(CAST(sum_w_milli AS DOUBLE) * CAST(sum_w_milli AS DOUBLE) * 10000.0
         |    / (CAST(n_docs AS DOUBLE) * CAST(sw2 AS DOUBLE))) AS BIGINT) AS ess_bp
         |FROM sm""".stripMargin,

    // brute-force all-pairs — the exactness claim: prefix filtering
    // must lose nothing vs comparing every pair
    "q91_allpairs" ->
      s"""$allPairsCtes
         |SELECT id_a, id_b, n_inter, n_union FROM apairs
         |ORDER BY id_a, id_b""".stripMargin,

    // the near-dup graph's triangle census: edges = q91's exact pair
    // set; triangles by the brute 3-way join (u<v normalization makes
    // each triangle appear once), wedges = sum C(deg, 2)
    "q98_dup_triangles" ->
      s"""$allPairsCtes,
         |g AS (SELECT id_a AS u, id_b AS v FROM apairs),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
         |  FROM (SELECT u AS node FROM g UNION ALL SELECT v AS node FROM g)
         |  GROUP BY node),
         |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM g ab JOIN g ac ON ab.u = ac.u AND ab.v < ac.v
         |            JOIN g bc ON bc.u = ab.v AND bc.v = ac.v),
         |agg AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_edges,
         |  (SELECT COALESCE(CAST(sum(d * (d - 1) // 2) AS BIGINT), 0) FROM deg)
         |    AS n_wedges,
         |  (SELECT n_triangles FROM tri) AS n_triangles)
         |SELECT n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0 THEN 3 * n_triangles * 10000 // n_wedges
         |       ELSE 0 END AS closure_bp
         |FROM agg""".stripMargin,

    // PMI: same windowed (least, greatest) pair keys, count-ordered
    // top-K, marginals joined on the K slice only
    "q137_pmi" ->
      s"""WITH tt AS (SELECT $ltoksSql AS t FROM documents),
         |pr AS (SELECT unnest(list_concat(
         |    CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), i ->
         |      least(t[i], t[i+1]) || ' ' || greatest(t[i], t[i+1]))
         |      ELSE CAST([] AS VARCHAR[]) END,
         |    CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), i ->
         |      least(t[i], t[i+2]) || ' ' || greatest(t[i], t[i+2]))
         |      ELSE CAST([] AS VARCHAR[]) END)) AS pair
         |  FROM tt),
         |pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pr GROUP BY pair),
         |top AS (SELECT pair, cnt FROM pc ORDER BY cnt DESC, pair LIMIT $PmiTopK),
         |tok AS (SELECT unnest(t) AS term FROM tt),
         |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY term),
         |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM pr) AS np,
         |        (SELECT CAST(count(*) AS BIGINT) FROM tok) AS nt)
         |SELECT pair, cnt, round(ln((CAST(cnt AS DOUBLE) / np) /
         |  ((CAST(ca.c AS DOUBLE) / nt) * (CAST(cb.c AS DOUBLE) / nt))), 6) AS pmi
         |FROM top JOIN tc ca ON ca.term = string_split(pair, ' ')[1]
         |  JOIN tc cb ON cb.term = string_split(pair, ' ')[2], tot
         |ORDER BY cnt DESC, pair""".stripMargin,

    // per-node closure over the same exact edge set; triangles fan
    // out to endpoints, integer-bp coefficient
    "q136_cluster_coeff" ->
      s"""$allPairsCtes,
         |g AS (SELECT id_a AS u, id_b AS v FROM apairs),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT u AS node FROM g UNION ALL SELECT v AS node FROM g)
         |  GROUP BY node),
         |tri AS (SELECT ab.u AS a, ab.v AS b, ac.v AS c
         |  FROM g ab JOIN g ac ON ab.u = ac.u AND ab.v < ac.v
         |            JOIN g bc ON bc.u = ab.v AND bc.v = ac.v),
         |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
         |  (SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
         |   UNION ALL SELECT c AS node FROM tri)
         |  GROUP BY node)
         |SELECT deg.node AS node, degree,
         |  coalesce(tn.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
         |  CASE WHEN degree >= 2
         |    THEN (2 * coalesce(tn.n_triangles, CAST(0 AS BIGINT)) * 10000)
         |      // (degree * (degree - 1))
         |    ELSE CAST(0 AS BIGINT) END AS coeff_bp
         |FROM deg LEFT JOIN tn USING (node) ORDER BY node""".stripMargin,

    "q66_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents
         |  WHERE text IS NOT NULL),
         |sh AS (SELECT doc_id, ${shinglesNSql(SpanN)} AS s FROM toks),
         |sp AS (SELECT doc_id, unnest(s) AS span FROM sh),
         |df AS (SELECT span, count(*) AS df FROM sp GROUP BY span),
         |j AS (SELECT doc_id, df FROM sp JOIN df USING (span)),
         |a AS (SELECT doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM j GROUP BY doc_id)
         |SELECT doc_id, n_spans, n_dup, (n_dup * 10000) // n_spans AS dup_bp
         |FROM a ORDER BY doc_id""".stripMargin,

    "q67_dedup_edit" ->
      s"""$lshCandidateCtes,
         |pfx AS (SELECT doc_id, substr($normTextSql, 1, $EditPfxLen) AS pfx FROM documents),
         |l AS (SELECT id_a, id_b, levenshtein(a.pfx, b.pfx) AS lev
         |  FROM cand JOIN pfx a ON a.doc_id = id_a JOIN pfx b ON b.doc_id = id_b)
         |SELECT id_a, id_b, lev FROM l WHERE lev <= $EditMaxDist
         |ORDER BY id_a, id_b""".stripMargin,

    "q56_shard_assign" ->
      s"""WITH p AS (SELECT ${ScaleParams.shardCountSql} AS shards FROM documents),
         |t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |r AS (SELECT doc_id, n_tokens,
         |        row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn FROM t)
         |SELECT (rn - 1) % (SELECT shards FROM p) + 1 AS shard_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM r GROUP BY 1 ORDER BY shard_id""".stripMargin,

    "q55_dup_histogram" ->
      s"""WITH dup AS (SELECT doc_id, text FROM documents
         |             UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |g AS (SELECT md5($normTextSql) AS fp, count(*) AS cluster_size
         |      FROM dup GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM g GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    "q52_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (SELECT doc_id, tf.term,
         |        round(tf * ln(n.n::DOUBLE / df.df), 6) AS tfidf
         |      FROM tf JOIN df USING (term), n),
         |r AS (SELECT doc_id, term, tfidf,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
         |      FROM s)
         |SELECT doc_id, rank, term, tfidf FROM r WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    "q53_unigram_xent" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |c AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
         |tot AS (SELECT count(*) AS tot FROM toks)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(-sum(ln(c.c::DOUBLE / tot.tot)) / count(*), 6) AS xent
         |FROM toks JOIN c USING (term), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q54_embed_quant" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
         |SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
         |  CAST(CASE WHEN mx = mn THEN 0 ELSE
         |    list_sum(list_transform(v, x ->
         |      CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) AS BIGINT)))
         |  END AS BIGINT) AS q_sum
         |FROM s ORDER BY vec_id""".stripMargin,

    "q16_text_tokens" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe,
         |  CAST(${foldSumSql("list_transform(toks, x -> length(x))")} AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE) AS mean_tok_len
         |FROM t ORDER BY doc_id""".stripMargin,

    "q17_text_quality" ->
      s"""$qualityScoreCtes
         |SELECT doc_id, punct_ratio, stop_ratio, quality
         |FROM q ORDER BY doc_id""".stripMargin,

    // curriculum: quartile phases by quality rank, hash-shuffled
    // within phase; windows are the oracle's job only — the Spark
    // side is two GlobalRank passes
    "q132_curriculum" ->
      s"""$qualityScoreCtes,
         |r AS (SELECT doc_id, quality,
         |  ntile(4) OVER (ORDER BY quality DESC, doc_id) AS bin FROM q),
         |c AS (SELECT doc_id, CAST(bin AS BIGINT) AS bin,
         |  CAST(row_number() OVER (
         |    ORDER BY bin, md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
         |  FROM r)
         |SELECT doc_id, bin, pos FROM c ORDER BY doc_id""".stripMargin,

    "q71_quality_cut" ->
      s"""$qualityScoreCtes,
         |r AS (SELECT doc_id, lang, quality,
         |  ntile(4) OVER (ORDER BY quality DESC, doc_id) AS qt FROM q)
         |SELECT lang, count(*) AS n_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |  round(min(quality), 6) AS min_q
         |FROM r WHERE qt = 1 GROUP BY lang ORDER BY lang""".stripMargin,

    "q18_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $ltoksSql AS ltoks FROM documents),
         |s AS (SELECT doc_id, lang,
         |  ${TextAnalysis.stopwords.map { case (l, ws) => s"${hitsSql(ws)} AS s_$l" }.mkString(",\n  ")}
         |  FROM t)
         |SELECT doc_id, lang, $langCaseSql AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "q19_text_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), ${codesSql()}), (a, b) -> (a*131 + b) % 1000000007) AS fp,
         |  md5($normTextSql) AS fp_md5
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q83_bigram_xent" ->
      s"""WITH tt AS (SELECT doc_id, $toksSql AS t FROM documents),
         |toks AS (SELECT doc_id, unnest(range(1, len(t)+1)) AS pos, t FROM tt),
         |tk AS (SELECT doc_id, pos, t[pos] AS term FROM toks),
         |bi AS (SELECT doc_id, t[pos] AS term, t[pos-1] AS prev FROM toks WHERE pos >= 2),
         |uni AS (SELECT term, count(*) AS c1 FROM tk GROUP BY 1),
         |ctx AS (SELECT prev AS v, count(*) AS cv FROM bi GROUP BY 1),
         |big AS (SELECT prev, term, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |tot AS (SELECT count(*) AS tot FROM tk)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(-sum(ln($BigramLambda * (c2 / CAST(cv AS DOUBLE))
         |    + ${1 - BigramLambda} * (c1 / CAST(tot AS DOUBLE)))) / count(*), 6) AS xent
         |FROM bi JOIN big USING (prev, term) JOIN ctx ON bi.prev = ctx.v
         |  JOIN uni USING (term), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q84_semdedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
         |c AS (SELECT vec_id AS c_id, v AS c_vec FROM e
         |      WHERE vec_id < (SELECT lists FROM p)),
         |assign AS (SELECT vec_id, v, c_id AS list_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.v", "c.c_vec")} DESC, c.c_id) AS crk
         |  FROM e, c) WHERE crk = 1),
         |pairs AS (SELECT a.list_id, a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.v", "b.v")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id)
         |SELECT list_id, id_a, id_b, cos FROM pairs
         |WHERE cos >= $NearDupCos ORDER BY list_id, id_a, id_b""".stripMargin,

    "q82_sql_functions" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT d.doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), ${codesSql("d.text")}), (a, b) -> (a*131 + b) % 1000000007) AS fp,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos_next
         |FROM documents d
         |JOIN e a ON a.vec_id = d.doc_id
         |JOIN e b ON b.vec_id = d.doc_id + 1
         |ORDER BY doc_id""".stripMargin,

    "q20_dedup_exact" ->
      s"""WITH dup AS (SELECT doc_id, text FROM documents
         |             UNION ALL SELECT doc_id + 1000000, text FROM documents)
         |SELECT md5($normTextSql) AS fp, count(*) AS cnt, min(doc_id) AS canonical_id
         |FROM dup GROUP BY 1 ORDER BY fp""".stripMargin,

    "q43_dedup_incremental" -> incrDedupOracle,

    "q278_sql_dedup_incr" -> incrDedupOracle,

    "q21_dedup_minhash" -> minhashDedupOracle,

    "q277_sql_dedup" -> minhashDedupOracle,

    "q280_sql_dedup_tvf" -> minhashDedupOracle,
    // the ANN table functions at k=5 ARE the q26/q87 chains — one
    // oracle text each
    "q282_sql_knn_tvf" -> knnLshOracle,
    "q283_sql_knn_probe_tvf" -> knnMultiProbeOracle,
    "q285_sql_knn_ivf_tvf" -> knnIvfOracle,

    "q22_dedup_ngram" ->
      s"""$lshCandidateCtes,
         |$jacCte
         |SELECT id_a, id_b, jacc FROM jac WHERE jacc >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // precision audit: same candidates and verify expression as q22,
    // plus the counting aggregate
    "q165_lsh_precision" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |  CAST(sum(CASE WHEN jacc >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
         |  FROM jac)
         |SELECT n_cand, n_true,
         |  CAST(n_true * 10000 // n_cand AS BIGINT) AS precision_bp FROM s2""".stripMargin,

    // exact AUC from integer pair-concordance counts; the exclusive
    // cumulative-negatives window mirrors withPrefixSums
    "q166_auc" ->
      s"""$qualityScoreCtes,
         |sc AS (SELECT CAST(round(stop_ratio * 1000000) AS BIGINT) AS score_micro,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM q),
         |by_s AS (SELECT score_micro, CAST(sum(pos) AS BIGINT) AS pos_s,
         |  CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
         |  FROM sc GROUP BY score_micro),
         |cum AS (SELECT pos_s, neg_s,
         |  CAST(coalesce(sum(neg_s) OVER (ORDER BY score_micro
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_neg
         |  FROM by_s),
         |a AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         |  CAST(sum(neg_s) AS BIGINT) AS n_neg,
         |  CAST(sum(pos_s * cum_neg) AS BIGINT) AS concordant,
         |  CAST(sum(pos_s * neg_s) AS BIGINT) AS tied FROM cum)
         |SELECT n_pos, n_neg, concordant, tied,
         |  CAST((2 * concordant + tied) * 10000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_bp
         |FROM a""".stripMargin,

    // NB classifier: same smoothing, per-term micro-rounded ln
    // weights, floor mean
    // committee cube: the three scorers' FULL texts nested as
    // subqueries (CTE names collide across fragments), rank-exact
    // ntile per scorer with aligned orientations, 4x4x4 cell counts
    "q296_committee_cube" -> {
      val nbFull = s"$nbScoreCtes\nSELECT doc_id, score FROM d"
      val xentFull =
        s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
           |c AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
           |tot AS (SELECT count(*) AS tot FROM toks)
           |SELECT doc_id, round(-sum(ln(c.c::DOUBLE / tot.tot)) / count(*), 6) AS xent
           |FROM toks JOIN c USING (term), tot GROUP BY doc_id""".stripMargin
      val qFull = s"$qualityScoreCtes\nSELECT doc_id, quality FROM q"
      s"""WITH nb AS (SELECT doc_id,
         |    CAST(ntile(4) OVER (ORDER BY score, doc_id) AS BIGINT) AS b_nb
         |  FROM ($nbFull)),
         |xe AS (SELECT doc_id,
         |    CAST(ntile(4) OVER (ORDER BY xent DESC, doc_id) AS BIGINT) AS b_xe
         |  FROM ($xentFull)),
         |qq AS (SELECT doc_id,
         |    CAST(ntile(4) OVER (ORDER BY quality, doc_id) AS BIGINT) AS b_q
         |  FROM ($qFull))
         |SELECT b_nb, b_xe, b_q, CAST(count(*) AS BIGINT) AS n_docs,
         |  greatest(b_nb, b_xe, b_q) - least(b_nb, b_xe, b_q) AS spread
         |FROM nb JOIN xe USING (doc_id) JOIN qq USING (doc_id)
         |GROUP BY b_nb, b_xe, b_q ORDER BY b_nb, b_xe, b_q""".stripMargin
    },

    // margin sampling: same score CTEs, smallest-|score| k with the
    // deterministic (abs_score, doc_id) order
    "q295_margin_sample" ->
      s"""$nbScoreCtes
         |SELECT doc_id, source, CAST(score AS BIGINT) AS score,
         |  CAST(abs(score) AS BIGINT) AS abs_score
         |FROM d ORDER BY abs_score, doc_id LIMIT $MarginK""".stripMargin,

    "q170_nb_quality" ->
      s"""$nbScoreCtes
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(score) AS BIGINT) AS sum_w_micro,
         |  CAST(FLOOR(CAST(sum(score) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_w_micro
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // winnowing: same k-gram hashes, window-min selection with
    // rightmost-tie rule, distinct positions, integer digest
    "q169_winnow" ->
      s"""$winnowCtes
         |SELECT doc_id, CAST(m AS BIGINT) AS n_grams, CAST(nw AS BIGINT) AS n_windows,
         |  CAST(len(sel) AS BIGINT) AS n_fp,
         |  CAST(CAST(len(sel) AS BIGINT) * 10000 // nw AS BIGINT) AS density_bp,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(sel, p -> hs[CAST(p AS INT)])), (a, b) -> a + b) AS BIGINT) AS fp_digest
         |FROM s ORDER BY doc_id""".stripMargin,

    // JS matrix: same per-term micro lns, integer shared masses,
    // closed-form disjoint tail
    "q176_js_matrix" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |tt AS (SELECT source, CAST(count(*) AS BIGINT) AS tot FROM toks GROUP BY source),
         |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY source, term),
         |j AS (SELECT a.term, a.source AS src_a, b.source AS src_b,
         |    a.c AS ca, b.c AS cb, ta.tot AS tota, tb.tot AS totb
         |  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
         |  JOIN tt ta ON ta.source = a.source JOIN tt tb ON tb.source = b.source),
         |p AS (SELECT src_a, src_b, ca, cb, tota, totb,
         |  CAST(ca AS DOUBLE) / CAST(tota AS DOUBLE) AS pa,
         |  CAST(cb AS DOUBLE) / CAST(totb AS DOUBLE) AS pb FROM j),
         |l AS (SELECT src_a, src_b, ca, cb, tota, totb, pa, pb,
         |  CAST(round(ln(2.0 * pa / (pa + pb)) * 1000000) AS BIGINT) AS ln_a,
         |  CAST(round(ln(2.0 * pb / (pa + pb)) * 1000000) AS BIGINT) AS ln_b FROM p),
         |t AS (SELECT src_a, src_b, ca, cb, tota, totb,
         |  CAST(round((pa * ln_a + pb * ln_b) * 500.0) AS BIGINT) AS t_nano FROM l),
         |g AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared,
         |  CAST(sum(t_nano) AS BIGINT) AS inner_nano,
         |  CAST(sum(ca) AS BIGINT) AS sca, CAST(sum(cb) AS BIGINT) AS scb,
         |  max(tota) AS tota, max(totb) AS totb
         |  FROM t GROUP BY src_a, src_b)
         |SELECT src_a, src_b, n_shared,
         |  inner_nano + CAST(round(ln(2.0) * 500000000.0 *
         |    ((1.0 - CAST(sca AS DOUBLE) / CAST(tota AS DOUBLE))
         |     + (1.0 - CAST(scb AS DOUBLE) / CAST(totb AS DOUBLE)))) AS BIGINT) AS js_nano
         |FROM g ORDER BY src_a, src_b""".stripMargin,

    // calibration: same score CTEs, exact rank-ntile bins
    "q172_nb_calibration" ->
      s"""$nbScoreCtes,
         |r AS (SELECT source, CAST(ntile($NbCalBins) OVER
         |  (ORDER BY score DESC, doc_id) AS BIGINT) AS bin FROM d)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END) AS BIGINT) AS n_seed,
         |  CAST(sum(CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS seed_share_bp
         |FROM r GROUP BY bin ORDER BY bin""".stripMargin,

    // dispersion: same 6-decimal centroid settle, same cosine fold,
    // same micro rounding
    "q185_embed_dispersion" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
         |comps AS (SELECT label, i, round(avg(v[i]), 6) AS m
         |  FROM e, (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) idx
         |  GROUP BY label, i),
         |c AS (SELECT label, list(m ORDER BY i) AS c FROM comps GROUP BY label),
         |s2 AS (SELECT e.label,
         |  CAST(round(${cosSql("e.v", "c.c")} * 1000000) AS BIGINT) AS cm
         |  FROM e JOIN c ON c.label = e.label)
         |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(FLOOR(CAST(sum(cm) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_cos_micro,
         |  CAST(min(cm) AS BIGINT) AS min_cos_micro
         |FROM s2 GROUP BY label ORDER BY label""".stripMargin,

    // rebalance: identical ring-point literals and least/CASE text
    "q184_rebalance" -> {
      val h = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
      s"""WITH d AS (SELECT $h AS h FROM documents),
         |m AS (SELECT h, ${ringMinSql("h", RingShards)} AS mind_k,
         |  ${ringMinSql("h", RingShards + 1)} AS mind_k1 FROM d),
         |o AS (SELECT h, ${ringCaseSql("h", RingShards, "mind_k")} AS ring_k,
         |  ${ringCaseSql("h", RingShards + 1, "mind_k1")} AS ring_k1,
         |  h % $RingShards AS mod_k, h % ${RingShards + 1} AS mod_k1 FROM m),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ring_k <> ring_k1 THEN 1 ELSE 0 END) AS BIGINT) AS ring_moved,
         |  CAST(sum(CASE WHEN mod_k <> mod_k1 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
         |  FROM o)
         |SELECT n_docs, ring_moved,
         |  CAST(ring_moved * 10000 // n_docs AS BIGINT) AS ring_moved_bp,
         |  mod_moved, CAST(mod_moved * 10000 // n_docs AS BIGINT) AS mod_moved_bp
         |FROM a""".stripMargin
    },

    // packing sweep: same split-allowed ceil model per candidate L
    "q182_packing_sweep" -> {
      val lens = PackSweepLens.mkString("[", ", ", "]")
      s"""WITH t AS (SELECT CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
         |x AS (SELECT n_tok, unnest($lens) AS len FROM t),
         |c AS (SELECT len, n_tok,
         |  CAST(ceil(CAST(n_tok AS DOUBLE) / len) AS BIGINT) AS chunks FROM x),
         |g AS (SELECT CAST(len AS BIGINT) AS len, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(chunks) AS BIGINT) AS total_chunks FROM c GROUP BY len)
         |SELECT len, n_docs, total_tokens, total_chunks,
         |  CAST((total_chunks * len - total_tokens) * 10000
         |    // (total_chunks * len) AS BIGINT) AS waste_bp
         |FROM g ORDER BY len""".stripMargin
    },

    // jaccard histogram: same candidates, integer-exact bin edges,
    // suffix cumulative
    "q183_jaccard_hist" ->
      s"""$lshCandidateCtes,
         |iu AS (SELECT CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
         |  CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS BIGINT) AS uni
         |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b),
         |bb AS (SELECT least(${JaccHistBins - 1}, inter * $JaccHistBins // uni) AS bin FROM iu),
         |hh AS (SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM bb GROUP BY bin)
         |SELECT bin, n_pairs,
         |  CAST(sum(n_pairs) OVER (ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
         |FROM hh ORDER BY bin""".stripMargin,

    // Spearman: same doubled tie-average ranks, same six moments
    "q180_spearman" ->
      s"""$qualityScoreCtes,
         |m AS (SELECT q.doc_id, CAST(round(quality * 1000000) AS BIGINT) AS x,
         |  d.n_chars AS y FROM q JOIN documents d ON d.doc_id = q.doc_id),
         |rx AS (SELECT x, CAST(2 * coalesce(sum(cnt) OVER (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS BIGINT) AS rx
         |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY x)),
         |ry AS (SELECT y, CAST(2 * coalesce(sum(cnt) OVER (ORDER BY y
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS BIGINT) AS ry
         |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY y)),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         |  CAST(sum(rx * rx) AS BIGINT) AS sxx, CAST(sum(ry * ry) AS BIGINT) AS syy,
         |  CAST(sum(rx * ry) AS BIGINT) AS sxy
         |  FROM m JOIN rx USING (x) JOIN ry USING (y))
         |SELECT n, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
         |FROM mo""".stripMargin,

    // matryoshka: q25's ranking text per prefix width, same fold
    "q192_matryoshka" -> {
      val pcte = MatryoshkaPrefixes.map { d =>
        s"""p$d AS (SELECT $d AS d, q_id, vec_id FROM (
           |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY ${cosSqlN("q_vec", "v", d)} DESC, vec_id) AS rk
           |  FROM q, e WHERE vec_id <> q_id) WHERE rk <= 10)""".stripMargin
      }.mkString(",\n")
      val punion = MatryoshkaPrefixes.map(d => s"SELECT * FROM p$d").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
         |f AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSql("q_vec", "v")} DESC, vec_id) AS rk
         |  FROM q, e WHERE vec_id <> q_id) WHERE rk <= 10),
         |$pcte,
         |pall AS ($punion),
         |hh AS (SELECT d, CAST(count(*) AS BIGINT) AS hits
         |  FROM pall JOIN f USING (q_id, vec_id) GROUP BY d),
         |nn AS (SELECT d, CAST(count(*) AS BIGINT) AS n_pairs FROM pall GROUP BY d)
         |SELECT CAST(nn.d AS BIGINT) AS d, n_pairs,
         |  CAST(coalesce(hits, 0) AS BIGINT) AS hits,
         |  CAST(coalesce(hits, 0) * 10000 // n_pairs AS BIGINT) AS recall_bp
         |FROM nn LEFT JOIN hh USING (d) ORDER BY d""".stripMargin
    },

    // gram: same floor fixed-point quantization, exact HUGEINT moment
    // numerators, identical integer→double division order
    "q196_embed_gram" ->
      s"""WITH ex AS (SELECT vec_id, i,
         |  CAST(floor(CAST(embedding[i] AS DOUBLE) * ${GramScale.toLong}.0) AS BIGINT) AS v
         |  FROM embeddings, (SELECT unnest(generate_series(1, $EmbedDims)) AS i) t),
         |n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
         |s AS (SELECT i, CAST(sum(v) AS HUGEINT) AS s FROM ex GROUP BY i),
         |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS HUGEINT) AS p
         |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |c AS (SELECT p.i - 1 AS dim_i, p.j - 1 AS dim_j,
         |  n.n * p.p - sa.s * sb.s AS covnum,
         |  n.n * pii.p - sa.s * sa.s AS vni,
         |  n.n * pjj.p - sb.s * sb.s AS vnj, n.n AS n
         |  FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
         |  JOIN p pii ON pii.i = p.i AND pii.j = p.i
         |  JOIN p pjj ON pjj.i = p.j AND pjj.j = p.j, n
         |  WHERE p.i < p.j)
         |SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
         |  round(CAST(covnum AS DOUBLE) /
         |    sqrt(CAST(vni AS DOUBLE) * CAST(vnj AS DOUBLE)), 9) AS corr,
         |  round(CAST(covnum AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
         |    / ${(GramScale * GramScale).toLong}.0, 12) AS cov
         |FROM c WHERE vni > 0 AND vnj > 0
         |ORDER BY abs(round(CAST(covnum AS DOUBLE) /
         |    sqrt(CAST(vni AS DOUBLE) * CAST(vnj AS DOUBLE)), 9)) DESC,
         |  dim_i, dim_j
         |LIMIT $GramTopK""".stripMargin,

    // chi-squared: dense margin cross incl. zero cells; identical
    // integer numerators, micro-settled terms, order-free total.
    // The SAME text is q202's Spark-side query (SQL surface #10) and
    // its oracle — operator, SQL front end, and oracle triple-pinned.
    "q197_chi_square" -> ChiSquareSqlText,
    "q202_sql_chisq" -> ChiSquareSqlText,

    // Gini: same sorted-rank identity, integer ppm; the ALL row is
    // just the unpartitioned window on the oracle side
    "q201_gini" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS x FROM documents),
        |ps AS (SELECT source, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY x, doc_id) AS BIGINT) AS rk, x FROM d),
        |al AS (SELECT 'ALL' AS source, CAST(row_number() OVER (
        |    ORDER BY x, doc_id) AS BIGINT) AS rk, x FROM d),
        |u AS (SELECT * FROM ps UNION ALL SELECT * FROM al),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(x) AS BIGINT) AS sum_chars,
        |  CAST(sum(rk * x) AS BIGINT) AS s1
        |  FROM u GROUP BY source)
        |SELECT source, n_docs, sum_chars,
        |  CAST((2 * s1 - (n_docs + 1) * sum_chars) * 1000000
        |    // (n_docs * sum_chars) AS BIGINT) AS gini_ppm
        |FROM g ORDER BY source""".stripMargin,

    // k-center: unrolled farthest-point rounds, micro-cosine fold
    "q203_kcenter" -> kCenterOracle,

    // quantile normalization: same integer rank mapping, windows are
    // the oracle's job
    "q205_quantile_norm" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS x FROM documents),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_g FROM d),
        |bs AS (SELECT source, doc_id, x,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS BIGINT) AS rk,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM d),
        |gl AS (SELECT CAST(row_number() OVER (ORDER BY x, doc_id) AS BIGINT) AS g,
        |  x AS x_norm FROM d)
        |SELECT source, doc_id, x, rk, rk * n_g // n_s AS g, x_norm
        |FROM bs, ng JOIN gl ON gl.g = rk * n_g // n_s
        |ORDER BY source, doc_id""".stripMargin,

    // bootstrap: same hash uniforms, shared Poisson CASE text,
    // integer replicate means
    "q214_bootstrap" ->
      s"""WITH d AS (SELECT doc_id, n_chars AS x FROM documents),
         |reps AS (SELECT unnest(generate_series(0, ${BootB - 1})) AS r),
         |wts AS (SELECT x, r, $BootPoissonCase AS w FROM (
         |  SELECT d.x, reps.r,
         |    CAST(('0x' || substr(md5('boot:' || CAST(doc_id AS STRING) || '_'
         |      || CAST(r AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
         |  FROM d, reps)),
         |rm AS (SELECT CAST(sum(w * x) * 1000 // sum(w) AS BIGINT) AS m
         |  FROM wts GROUP BY r),
         |b AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
         |  CAST(min(m) AS BIGINT) AS boot_min_milli,
         |  CAST(max(m) AS BIGINT) AS boot_max_milli,
         |  CAST(sum(m) AS BIGINT) AS sm, CAST(sum(m * m) AS BIGINT) AS smm
         |  FROM rm),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(x) * 1000 // count(*) AS BIGINT) AS full_mean_milli FROM d)
         |SELECT n_docs, full_mean_milli, n_b, boot_min_milli, boot_max_milli,
         |  CAST(round(sqrt(CAST(n_b * smm - sm * sm AS DOUBLE)
         |    / CAST(n_b * (n_b - 1) AS DOUBLE)) * 1000.0) AS BIGINT) AS se_micro
         |FROM f, b""".stripMargin,

    // compress proxy: shared shingle recipe; (source, shingle) agg
    "q218_compress_proxy" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
         |sh AS (SELECT source, $shinglesSql AS s FROM toks),
         |g AS (SELECT source, unnest(s) AS g FROM sh)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_sh,
         |  CAST(count(DISTINCT g) AS BIGINT) AS n_uniq,
         |  CAST(count(DISTINCT g) * 10000 // count(*) AS BIGINT) AS uniq_bp
         |FROM g GROUP BY source ORDER BY source""".stripMargin,

    // entropy rate: same transition cells, micro-settled -ln p
    "q219_markov_entropy" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type FROM (
        |  SELECT event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_type
        |  FROM e) WHERE prev_type IS NOT NULL),
        |c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tr GROUP BY 1, 2),
        |s AS (SELECT prev_type, cnt,
        |  CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS s_micro
        |  FROM (SELECT *, CAST(sum(cnt) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS tot FROM c)),
        |pp AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS n_trans,
        |  CAST(sum(cnt * s_micro) // sum(cnt) AS BIGINT) AS h_micro
        |  FROM s GROUP BY prev_type),
        |al AS (SELECT 'ALL' AS prev_type, CAST(sum(cnt) AS BIGINT) AS n_trans,
        |  CAST(sum(cnt * s_micro) // sum(cnt) AS BIGINT) AS h_micro FROM s)
        |SELECT * FROM pp UNION ALL SELECT * FROM al ORDER BY prev_type""".stripMargin,

    // OOV curve: same term counts; top-K by (cnt DESC, term)
    "q220_oov_curve" -> {
      val arms = OovVocabSizes.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS vocab_k,
           |  (SELECT CAST(sum(cnt) AS BIGINT) FROM
           |    (SELECT cnt FROM c ORDER BY cnt DESC, term LIMIT $k)) AS covered,
           |  (SELECT CAST(sum(cnt) AS BIGINT) FROM c) AS total""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT unnest(t) AS term FROM toks),
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY term),
         |u AS ($arms)
         |SELECT vocab_k, covered, total,
         |  CAST(covered * 10000 // total AS BIGINT) AS coverage_bp
         |FROM u ORDER BY vocab_k""".stripMargin
    },

    // silhouette: the q80 Lloyd chain verbatim, then own/nearest-other
    // assignment with identical tie order and the same micro settling
    "q221_silhouette" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
         |c0 AS (SELECT vec_id AS c_id, v AS c_vec FROM e
         |       WHERE vec_id < (SELECT lists FROM p)),
         |${(1 to LloydIters).map(it => lloydCteSql(it, s"c${it - 1}")).mkString(",\n")},
         |sc AS (SELECT e.vec_id, cL.c_id,
         |  ${cosSql("e.v", "cL.c_vec")} AS ccos FROM e, c$LloydIters cL),
         |own AS (SELECT vec_id, c_id AS list_id, ccos AS cos1 FROM (
         |  SELECT vec_id, c_id, ccos, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, c_id) AS crk FROM sc) WHERE crk = 1),
         |snd AS (SELECT sc.vec_id, max(sc.ccos) AS cos2 FROM sc
         |  JOIN own ON own.vec_id = sc.vec_id AND sc.c_id <> own.list_id
         |  GROUP BY sc.vec_id),
         |s AS (SELECT own.list_id,
         |  CAST(round((CASE WHEN cos2 >= 1.0 THEN 0.0
         |    ELSE (cos1 - cos2) / (1.0 - cos2) END) * 1000000) AS BIGINT) AS s_micro
         |  FROM own JOIN snd ON snd.vec_id = own.vec_id),
         |per AS (SELECT CAST(list_id AS BIGINT) AS list_id,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(FLOOR(CAST(sum(s_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_s_micro
         |  FROM s GROUP BY list_id),
         |alls AS (SELECT CAST(-1 AS BIGINT) AS list_id,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(FLOOR(CAST(sum(s_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_s_micro
         |  FROM s)
         |SELECT * FROM per UNION ALL SELECT * FROM alls ORDER BY list_id""".stripMargin,

    // kappa: same classifier text on full and prefix tokens; exact
    // integer rational with the sign-safe shared floor division
    "q222_lang_kappa" -> {
      val hits = TextAnalysis.stopwords
        .map { case (l, ws) => s"${hitsSql(ws)} AS s_$l" }.mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, text FROM documents),
         |fa AS (SELECT doc_id, $ltoksSql AS ltoks FROM t),
         |sa AS (SELECT doc_id, $hits FROM fa),
         |la AS (SELECT doc_id, $langCaseSql AS a FROM sa),
         |fb AS (SELECT doc_id,
         |  string_split_regex(trim(lower(substr(text, 1, $KappaPrefixChars))), '\\s+') AS ltoks FROM t),
         |sb AS (SELECT doc_id, $hits FROM fb),
         |lb AS (SELECT doc_id, $langCaseSql AS b FROM sb),
         |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
         |  FROM la JOIN lb USING (doc_id) GROUP BY a, b),
         |m AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree FROM cells),
         |pa AS (SELECT a, CAST(sum(c) AS BIGINT) AS na FROM cells GROUP BY a),
         |pb AS (SELECT b, CAST(sum(c) AS BIGINT) AS nb FROM cells GROUP BY b),
         |sp AS (SELECT CAST(sum(na * nb) AS BIGINT) AS sum_prod
         |  FROM pa JOIN pb ON pa.a = pb.b),
         |x AS (SELECT n, agree, sum_prod,
         |  (agree * n - sum_prod) * 1000000 AS num,
         |  n * n - sum_prod AS den FROM m, sp)
         |SELECT n, agree, sum_prod,
         |  CAST(agree * 10000 // n AS BIGINT) AS po_bp,
         |  CAST(CASE WHEN den = 0 THEN 1000000
         |    ELSE (num - ((num % den + den) % den)) // den END AS BIGINT) AS kappa_micro
         |FROM x""".stripMargin
    },

    // cluster MI: the q80 assignment verbatim, per-cell ln settled to
    // micro once, ALL row via the shared sign-safe floor division
    "q223_cluster_mi" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
         |c0 AS (SELECT vec_id AS c_id, v AS c_vec FROM e
         |       WHERE vec_id < (SELECT lists FROM p)),
         |${(1 to LloydIters).map(it => lloydCteSql(it, s"c${it - 1}")).mkString(",\n")},
         |assign AS (SELECT vec_id, c_id AS list_id FROM (
         |  SELECT e.vec_id, cL.c_id, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSql("e.v", "cL.c_vec")} DESC, cL.c_id) AS crk
         |  FROM e, c$LloydIters cL) WHERE crk = 1),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |cells AS (SELECT label, CAST(list_id AS BIGINT) AS list_id,
         |  CAST(count(*) AS BIGINT) AS n_lc
         |  FROM assign JOIN lab USING (vec_id) GROUP BY label, list_id),
         |nl AS (SELECT label, CAST(sum(n_lc) AS BIGINT) AS n_l FROM cells GROUP BY label),
         |nc AS (SELECT list_id, CAST(sum(n_lc) AS BIGINT) AS n_c FROM cells GROUP BY list_id),
         |tot AS (SELECT CAST(sum(n_lc) AS BIGINT) AS n FROM cells),
         |pmi AS (SELECT c.label, c.list_id, c.n_lc,
         |  CAST(round(ln(CAST(c.n_lc AS DOUBLE) * CAST(t.n AS DOUBLE)
         |    / (CAST(nl.n_l AS DOUBLE) * CAST(nc.n_c AS DOUBLE))) * 1000000.0) AS BIGINT) AS pmi_micro
         |  FROM cells c JOIN nl USING (label) JOIN nc USING (list_id), tot t),
         |mi AS (SELECT CAST(-1 AS BIGINT) AS label, CAST(-1 AS BIGINT) AS list_id,
         |  CAST(sum(n_lc) AS BIGINT) AS n_lc,
         |  CAST((CAST(sum(n_lc * pmi_micro) AS BIGINT)
         |    - ((CAST(sum(n_lc * pmi_micro) AS BIGINT) % t.n + t.n) % t.n)) // t.n AS BIGINT) AS pmi_micro
         |  FROM pmi, tot t GROUP BY t.n)
         |SELECT label, list_id, n_lc, pmi_micro FROM pmi
         |UNION ALL SELECT * FROM mi ORDER BY label, list_id""".stripMargin,

    // conformal: q61's hash split + the shared quality chain; the
    // calibration quantile is rank-pinned, coverage is integer bp
    "q225_conformal" ->
      s"""$qualityScoreCtes,
         |sc AS (SELECT doc_id,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(round(quality * 1000000) AS BIGINT) AS q_micro FROM q),
         |cal AS (SELECT doc_id, q_micro FROM sc WHERE split = 'val'),
         |ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
         |rk AS (SELECT q_micro,
         |  row_number() OVER (ORDER BY q_micro, doc_id) AS rk FROM cal),
         |thr AS (SELECT n_cal, CAST(rk AS BIGINT) AS k, q_micro AS thr_micro
         |  FROM rk, ncal WHERE rk = greatest(1, (n_cal + 1) // $ConformalAlpha)),
         |tst AS (SELECT q_micro FROM sc WHERE split = 'test')
         |SELECT n_cal, k, thr_micro, CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN q_micro >= thr_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
         |  CAST(sum(CASE WHEN q_micro >= thr_micro THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS coverage_bp
         |FROM tst, thr GROUP BY n_cal, k, thr_micro""".stripMargin,

    // cross-split contamination: q22's verified pair set verbatim,
    // q61's split CASE on both endpoints, least/greatest combo grid
    "q226_split_contamination" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |pr AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
         |sp AS (SELECT doc_id,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
         |       ELSE 'test' END AS sp FROM documents),
         |px AS (SELECT least(sa.sp, sb.sp) AS split_lo,
         |  greatest(sa.sp, sb.sp) AS split_hi
         |  FROM pr JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b),
         |g AS (SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM px GROUP BY split_lo, split_hi),
         |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM g)
         |SELECT split_lo, split_hi, n_pairs,
         |  CAST(n_pairs * 10000 // total AS BIGINT) AS share_bp
         |FROM g, t ORDER BY split_lo, split_hi""".stripMargin,

    // quality-length bias: shared quality chain + n_chars ln settled
    // per doc; both engines divide the same exact integer moments
    "q235_quality_length_bias" -> {
      val dxx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      val dyy = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
      val dxy = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
      val slope = s"""CAST(CASE WHEN $dxx <= 0.0 THEN 0
        |  ELSE round($dxy / $dxx * 1000.0) END AS BIGINT)""".stripMargin
      val rr = s"""CAST(CASE WHEN $dxx <= 0.0 OR $dyy <= 0.0 THEN 0
        |  ELSE round($dxy / sqrt($dxx * $dyy) * 1000000.0)
        |  END AS BIGINT)""".stripMargin
      s"""$qualityScoreCtes,
         |sc AS (SELECT d.source,
         |  CAST(round(ln(CAST(d.n_chars AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
         |  CAST(round(quality * 1000000) AS BIGINT) AS y
         |  FROM q JOIN documents d ON d.doc_id = q.doc_id),
         |mper AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM sc GROUP BY source),
         |mall AS (SELECT 'ALL' AS source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM sc),
         |m AS (SELECT * FROM mper UNION ALL SELECT * FROM mall)
         |SELECT source, n, $slope AS slope_milli, $rr AS r_micro
         |FROM m ORDER BY source""".stripMargin
    },

    // ARI: the recursive-CC chain twice (0.5 edges filter the 0.4
    // set), exact pair-counting contingency, double-space products
    "q241_dedup_ari" ->
      s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$jacCte,
         |pairs AS (SELECT id_a, id_b, jacc FROM jac WHERE jacc >= 0.4),
         |sym AS (SELECT id_a AS s, id_b AS d FROM pairs
         |        UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT sym.d, reach.lbl FROM reach JOIN sym ON sym.s = reach.id),
         |compa AS (SELECT id AS doc_id, min(lbl) AS ca FROM reach GROUP BY id),
         |sym5 AS (SELECT id_a AS s, id_b AS d FROM pairs WHERE jacc >= 0.5
         |        UNION ALL SELECT id_b, id_a FROM pairs WHERE jacc >= 0.5),
         |reach5(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT sym5.d, reach5.lbl FROM reach5 JOIN sym5 ON sym5.s = reach5.id),
         |compb AS (SELECT id AS doc_id, min(lbl) AS cb FROM reach5 GROUP BY id),
         |cont AS (SELECT ca, cb, CAST(count(*) AS BIGINT) AS m
         |  FROM compa JOIN compb USING (doc_id) GROUP BY ca, cb),
         |ix AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS s_ij,
         |  CAST(sum(m) AS BIGINT) AS n FROM cont),
         |aa AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS s_a
         |  FROM (SELECT CAST(sum(m) AS BIGINT) AS a FROM cont GROUP BY ca)),
         |bb AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS s_b
         |  FROM (SELECT CAST(sum(m) AS BIGINT) AS b FROM cont GROUP BY cb))
         |SELECT n, s_ij, s_a, s_b,
         |  CAST(CASE WHEN ((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0 - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0)) <= 0.0 THEN 1000000
         |  ELSE round((CAST(s_ij AS DOUBLE)
         |    - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0))
         |    / ((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0 - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0))
         |    * 1000000.0) END AS BIGINT) AS ari_micro
         |FROM ix, aa, bb""".stripMargin,

    // norm delta: both fingerprints in one scan; removable = sum(cnt-1)
    "q240_norm_delta" ->
      s"""WITH dd AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, upper(text) || '  ' FROM documents),
         |k AS (SELECT doc_id, md5(text) AS raw_fp,
         |  md5($normTextSql) AS norm_fp FROM dd),
         |rr AS (SELECT CAST(sum(CASE WHEN cnt >= 2 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS raw_removed
         |  FROM (SELECT raw_fp, count(*) AS cnt FROM k GROUP BY raw_fp)),
         |nr AS (SELECT CAST(sum(CASE WHEN cnt >= 2 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS norm_removed
         |  FROM (SELECT norm_fp, count(*) AS cnt FROM k GROUP BY norm_fp)),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM k)
         |SELECT n_docs, raw_removed, norm_removed,
         |  CAST(norm_removed - raw_removed AS BIGINT) AS delta_removed
         |FROM n, rr, nr""".stripMargin,

    // recall: exact 2/5 truth by brute overlap (an oracle may be
    // quadratic), found = the q22 verified pairs, one pair left join
    "q239_lsh_recall" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |found AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
         |ss AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh),
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |ov AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS n_inter
         |  FROM e a JOIN e b USING (g) WHERE a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |truth AS (SELECT ov.id_a, ov.id_b FROM ov
         |  JOIN ss sa ON sa.doc_id = ov.id_a JOIN ss sb ON sb.doc_id = ov.id_b
         |  WHERE n_inter * 5 >= (sa.n + sb.n - n_inter) * 2),
         |fl AS (SELECT t.id_a, t.id_b,
         |  CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM truth t LEFT JOIN found f ON f.id_a = t.id_a AND f.id_b = t.id_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(hit) AS BIGINT) AS n_found,
         |  CAST(sum(hit) * 10000 // count(*) AS BIGINT) AS recall_bp FROM fl""".stripMargin,

    // dedup savings: CC chain + quality CTEs; rep by the q109 rule
    // (row_number twin of max_by's (q desc, doc_id asc) tie order)
    "q238_dedup_savings" ->
      s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$jacCte,
         |$ccReachCtes,
         |comp AS (SELECT id AS doc_id, min(lbl) AS cid FROM reach GROUP BY id),
         |${qualityScoreCtes.replaceFirst("^WITH ", "")},
         |tk AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
         |jm AS (SELECT comp.cid, tk.n_tok,
         |  CAST(round(quality * 1000000) AS BIGINT) AS qm, q.doc_id
         |  FROM comp JOIN q ON q.doc_id = comp.doc_id
         |  JOIN tk ON tk.doc_id = comp.doc_id),
         |rk AS (SELECT cid, n_tok,
         |  row_number() OVER (PARTITION BY cid ORDER BY qm DESC, doc_id) AS rn FROM jm),
         |cz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz,
         |  CAST(sum(n_tok) AS BIGINT) AS ctok,
         |  CAST(max(CASE WHEN rn = 1 THEN n_tok END) AS BIGINT) AS rep_tok
         |  FROM rk GROUP BY cid),
         |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS corpus_tokens FROM jm)
         |SELECT CAST(count(CASE WHEN sz >= 2 THEN 1 END) AS BIGINT) AS n_clusters,
         |  CAST(sum(CASE WHEN sz >= 2 THEN sz - 1 ELSE 0 END) AS BIGINT) AS docs_removed,
         |  CAST(sum(CASE WHEN sz >= 2 THEN ctok - rep_tok ELSE 0 END) AS BIGINT) AS tokens_removed,
         |  corpus_tokens,
         |  CAST(sum(CASE WHEN sz >= 2 THEN ctok - rep_tok ELSE 0 END) * 10000 // corpus_tokens AS BIGINT) AS saved_bp
         |FROM cz, tot GROUP BY corpus_tokens""".stripMargin,

    // dup-quality gap: recursive-CC chain + the shared quality CTEs
    // (CTE name sets are disjoint); positive integer-div means
    "q231_dup_quality_gap" ->
      s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$jacCte,
         |$ccReachCtes,
         |comp AS (SELECT id AS doc_id, min(lbl) AS cid FROM reach GROUP BY id),
         |${qualityScoreCtes.replaceFirst("^WITH ", "")},
         |jq AS (SELECT comp.cid, CAST(round(quality * 1000000) AS BIGINT) AS qm
         |  FROM comp JOIN q ON q.doc_id = comp.doc_id),
         |cz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz,
         |  CAST(sum(qm) AS BIGINT) AS sq, CAST(max(qm) AS BIGINT) AS mq
         |  FROM jq GROUP BY cid),
         |ga AS (SELECT 'dup_members' AS grp, CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sq) // sum(sz) AS BIGINT) AS mean_q_micro FROM cz WHERE sz >= 2),
         |gb AS (SELECT 'dup_best_kept' AS grp, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(mq) // count(*) AS BIGINT) AS mean_q_micro FROM cz WHERE sz >= 2),
         |gc AS (SELECT 'singleton' AS grp, CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sq) // sum(sz) AS BIGINT) AS mean_q_micro FROM cz WHERE sz = 1)
         |SELECT * FROM ga UNION ALL SELECT * FROM gb UNION ALL SELECT * FROM gc
         |ORDER BY grp""".stripMargin,

    // token budget: same quality chain + token counts; the inclusive
    // prefix sum crosses the derived budget at exactly one doc
    "q232_token_budget" ->
      s"""$qualityScoreCtes,
         |tk AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
         |sc AS (SELECT q.doc_id, tk.n_tok,
         |  CAST(round(quality * 1000000) AS BIGINT) AS qm
         |  FROM q JOIN tk ON tk.doc_id = q.doc_id),
         |w AS (SELECT doc_id, n_tok, qm,
         |  CAST(sum(n_tok) OVER (ORDER BY qm DESC, doc_id) AS BIGINT) AS cum,
         |  CAST(row_number() OVER (ORDER BY qm DESC, doc_id) AS BIGINT) AS rk FROM sc),
         |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM sc),
         |b AS (SELECT t, CAST(t // 2 AS BIGINT) AS budget FROM tot)
         |SELECT b.t AS total_tokens, b.budget AS budget, w.rk AS n_docs_kept,
         |  w.qm AS thr_q_micro, w.cum AS kept_tokens
         |FROM w, b WHERE w.cum >= b.budget AND w.cum - w.n_tok < b.budget""".stripMargin,

    // over-merge: the recursive-CC oracle chain + the same direct edge
    // set; intra-cluster pairs by comp self-join under the size cap
    "q230_over_merge" ->
      s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$jacCte,
         |$ccReachCtes,
         |comp AS (SELECT id AS doc_id, min(lbl) AS cid FROM reach GROUP BY id),
         |keep AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz FROM comp
         |  GROUP BY cid HAVING count(*) >= 2 AND count(*) <= $OverMergeSizeCap),
         |ip AS (SELECT k.sz, a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM keep k JOIN comp a ON a.cid = k.cid JOIN comp b ON b.cid = k.cid
         |  WHERE a.doc_id < b.doc_id),
         |fl AS (SELECT ip.sz,
         |  CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS direct
         |  FROM ip LEFT JOIN pairs p ON p.id_a = ip.id_a AND p.id_b = ip.id_b),
         |g1 AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM keep GROUP BY sz),
         |g2 AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(direct) AS BIGINT) AS n_direct FROM fl GROUP BY sz)
         |SELECT g1.sz AS sz, n_clusters, n_pairs, n_direct,
         |  CAST((n_pairs - n_direct) * 10000 // n_pairs AS BIGINT) AS transitive_bp
         |FROM g1 JOIN g2 ON g1.sz = g2.sz ORDER BY sz""".stripMargin,

    // brier: the q170 score chain + q172's ntile, one sigmoid per doc
    // settled to micro, decomposition terms as exact integer micro-sq
    // isotonic: same exact integer bin sums; every range mean is one
    // IEEE division of BIGINTs (bit-identical both engines); minimax
    // as joins — PAV with zero recursion
    "q243_isotonic" ->
      s"""$nbScoreCtes,
         |sc AS (SELECT doc_id, score,
         |  CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END AS y FROM d),
         |r AS (SELECT y,
         |  CAST(ntile($IsoBins) OVER (ORDER BY score, doc_id) AS BIGINT) AS bin FROM sc),
         |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
         |  CAST(sum(y) AS BIGINT) AS pos_k FROM r GROUP BY bin),
         |rg AS (SELECT lo.bin AS j, hi.bin AS k,
         |  CAST(sum(m.pos_k) AS DOUBLE) / CAST(sum(m.n_k) AS DOUBLE) AS m
         |  FROM b lo JOIN b hi ON lo.bin <= hi.bin
         |  JOIN b m ON m.bin BETWEEN lo.bin AND hi.bin
         |  GROUP BY lo.bin, hi.bin),
         |iw AS (SELECT i.bin AS i, rg.j, min(rg.m) AS mn
         |  FROM b i JOIN rg ON rg.j <= i.bin AND rg.k >= i.bin
         |  GROUP BY i.bin, rg.j),
         |fit AS (SELECT i, max(mn) AS fit FROM iw GROUP BY i)
         |SELECT b.bin, b.n_k, b.pos_k,
         |  CAST(b.pos_k * 1000000 // b.n_k AS BIGINT) AS raw_micro,
         |  CAST(round(fit.fit * 1000000.0) AS BIGINT) AS fit_micro
         |FROM b JOIN fit ON fit.i = b.bin ORDER BY b.bin""".stripMargin,

    // prefix dups: same synthesized truncations, same block key, same
    // ordered substr verify — all integers
    "q244_prefix_dups" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |tr AS (SELECT doc_id + $PrefixTruncOffset AS doc_id,
         |  substr(text, 1, CAST(length(text) // 2 AS INT)) AS text
         |  FROM base WHERE doc_id % 7 = 0 AND length(text) >= ${2 * PrefixBlock}),
         |d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
         |  substr(text, 1, $PrefixBlock) AS blk
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM tr)
         |  WHERE length(text) >= $PrefixBlock)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.len AS len_a, b.len AS len_b,
         |  CAST(a.len * 10000 // b.len AS BIGINT) AS kept_bp
         |FROM d a JOIN d b ON a.blk = b.blk AND a.len < b.len
         |  AND substr(b.text, 1, CAST(a.len AS INT)) = a.text
         |ORDER BY id_a, id_b""".stripMargin,

    // dup flow: the shared verified-pair chain + two source joins
    "q245_dup_flow" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |p AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
         |ws AS (SELECT least(da.source, db.source) AS source_lo,
         |  greatest(da.source, db.source) AS source_hi
         |  FROM p JOIN documents da ON da.doc_id = id_a
         |  JOIN documents db ON db.doc_id = id_b),
         |fl AS (SELECT source_lo, source_hi,
         |  CAST(count(*) AS BIGINT) AS n_pairs FROM ws GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM fl)
         |SELECT source_lo, source_hi, n_pairs,
         |  CAST(n_pairs * 10000 // t AS BIGINT) AS share_bp,
         |  CAST(source_lo = source_hi AS BIGINT) AS within
         |FROM fl, t ORDER BY source_lo, source_hi""".stripMargin,

    // coreset coverage: nests the q203/q250 oracle texts verbatim as
    // pick-set subqueries (the q112 nesting precedent); τ compares
    // micro integers
    "q257_coreset_coverage" -> {
      def cm(a: String, b: String) =
        s"CAST(round((${cosSql(a, b)}) * 1000000.0) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |kc AS (SELECT vec_id FROM ($kCenterOracle)),
         |mm AS (SELECT vec_id FROM ($mmrOracle)),
         |f5 AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $KCenterRounds),
         |picks AS (SELECT 'kcenter' AS method, vec_id FROM kc
         |  UNION ALL SELECT 'mmr', vec_id FROM mm
         |  UNION ALL SELECT 'first5', vec_id FROM f5),
         |pv AS (SELECT method, e.v AS pv FROM picks JOIN e USING (vec_id)),
         |cov AS (SELECT DISTINCT method, c.vec_id FROM e c, pv
         |  WHERE ${cm("c.v", "pv")} >= $CoverageTauMicro),
         |cnt AS (SELECT method, CAST(count(*) AS BIGINT) AS covered
         |  FROM cov GROUP BY method),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM e)
         |SELECT method, covered, total,
         |  CAST(covered * 10000 // total AS BIGINT) AS coverage_bp
         |FROM cnt, t ORDER BY method""".stripMargin
    },

    // fold AUC: q166's concordance CTEs with a fold key; per-fold
    // window partitions by fold, pooled row appended
    "q262_fold_auc" ->
      s"""$qualityScoreCtes,
         |sc AS (SELECT ('0x' || substr(md5('fold:' || CAST(doc_id AS STRING)), 1, 8))::BIGINT % $AucFolds AS fold,
         |  CAST(round(stop_ratio * 1000000) AS BIGINT) AS score_micro,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM q),
         |by_s AS (SELECT fold, score_micro, CAST(sum(pos) AS BIGINT) AS pos_s,
         |  CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
         |  FROM sc GROUP BY fold, score_micro),
         |cum AS (SELECT fold, pos_s, neg_s,
         |  CAST(coalesce(sum(neg_s) OVER (PARTITION BY fold ORDER BY score_micro
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_neg
         |  FROM by_s),
         |pf AS (SELECT fold, CAST(sum(pos_s) AS BIGINT) AS n_pos,
         |  CAST(sum(neg_s) AS BIGINT) AS n_neg,
         |  CAST(sum(pos_s * cum_neg) AS BIGINT) AS concordant,
         |  CAST(sum(pos_s * neg_s) AS BIGINT) AS tied FROM cum GROUP BY fold),
         |ps AS (SELECT score_micro, CAST(sum(pos) AS BIGINT) AS pos_s,
         |  CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
         |  FROM sc GROUP BY score_micro),
         |pc AS (SELECT pos_s, neg_s,
         |  CAST(coalesce(sum(neg_s) OVER (ORDER BY score_micro
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_neg
         |  FROM ps),
         |pl AS (SELECT CAST(-1 AS BIGINT) AS fold, CAST(sum(pos_s) AS BIGINT) AS n_pos,
         |  CAST(sum(neg_s) AS BIGINT) AS n_neg,
         |  CAST(sum(pos_s * cum_neg) AS BIGINT) AS concordant,
         |  CAST(sum(pos_s * neg_s) AS BIGINT) AS tied FROM pc),
         |u AS (SELECT * FROM pf UNION ALL SELECT * FROM pl)
         |SELECT fold, n_pos, n_neg, concordant, tied,
         |  CAST((2 * concordant + tied) * 10000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_bp
         |FROM u ORDER BY fold""".stripMargin,

    // cut sweep: quality CTE chain + rank window; the keep predicate
    // is the same exact rational compare
    "q260_cut_sweep" ->
      s"""$qualityScoreCtes,
         |base AS (SELECT q.doc_id,
         |  CAST(round(q.quality * 1000000) AS BIGINT) AS qm,
         |  md5(d2.text) AS tm,
         |  CAST(len(string_split_regex(trim(d2.text), '\\s+')) AS BIGINT) AS nt
         |  FROM q JOIN documents d2 ON d2.doc_id = q.doc_id),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY qm DESC, doc_id) AS BIGINT) AS rk
         |  FROM base),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
         |g AS (SELECT unnest(${CutGrid.mkString("[", ", ", "]")}) AS cut),
         |k AS (SELECT cut, qm, tm, nt FROM r, n, g WHERE rk * 100 <= cut * n)
         |SELECT CAST(cut AS BIGINT) AS cut, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(nt) AS BIGINT) AS tokens_kept,
         |  CAST(sum(qm) // count(*) AS BIGINT) AS mean_q_micro,
         |  CAST((count(*) - count(DISTINCT tm)) * 10000 // count(*) AS BIGINT) AS dup_bp
         |FROM k GROUP BY cut ORDER BY cut""".stripMargin,

    // hubness: the q253 neighbor CTEs, in-degree + histogram;
    // anti-hubs via left join
    "q261_hubness" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (SELECT a.vec_id, b.vec_id AS n_id,
         |  ${cosSql("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         |rk AS (SELECT vec_id, n_id,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, n_id) AS rk
         |  FROM scored),
         |indeg AS (SELECT n_id, CAST(count(*) AS BIGINT) AS occ
         |  FROM rk WHERE rk <= $NoiseK GROUP BY n_id),
         |od AS (SELECT coalesce(indeg.occ, 0) AS occ
         |  FROM e LEFT JOIN indeg ON indeg.n_id = e.vec_id)
         |SELECT CAST(occ AS BIGINT) AS occ, CAST(count(*) AS BIGINT) AS n_vectors
         |FROM od GROUP BY occ ORDER BY occ""".stripMargin,

    // fertility: q16's regex twins, integer milli-ratios
    "q258_fertility" ->
      s"""WITH t AS (SELECT lang, CAST(length(text) AS BIGINT) AS nc,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS nb,
         |  CAST(len($toksSql) AS BIGINT) AS nt FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(sum(nb) AS BIGINT) AS n_bpe,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) * 1000 // sum(nb) AS BIGINT) AS bpe_fertility_milli,
         |  CAST(sum(nc) * 1000 // sum(nt) AS BIGINT) AS tok_fertility_milli
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // sentences: same consuming split regex, same empty filter
    "q259_sentences" ->
      s"""WITH segs AS (SELECT source, doc_id,
         |  unnest(string_split_regex(text, '$SentSplitRe')) AS seg FROM documents),
         |s AS (SELECT source, CAST(length(seg) AS BIGINT) AS sl
         |  FROM segs WHERE length(seg) > 0),
         |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sentences,
         |  CAST(sum(sl) AS BIGINT) AS sum_chars,
         |  CAST(max(sl) AS BIGINT) AS max_sent_chars FROM s GROUP BY source),
         |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY source)
         |SELECT d.source, n_docs, n_sentences,
         |  CAST(n_sentences * 1000 // n_docs AS BIGINT) AS sent_per_doc_milli,
         |  CAST(sum_chars * 1000 // n_sentences AS BIGINT) AS mean_sent_chars_milli,
         |  max_sent_chars
         |FROM d JOIN ps ON ps.source = d.source ORDER BY d.source""".stripMargin,

    // bow dups: same sorted-token key (list_sort ≡ sort_array on
    // ASCII tokens), same md5
    "q255_bow_dups" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |re AS (SELECT doc_id + $BowReorderOffset AS doc_id,
         |  array_to_string(list_reverse($toksSql), ' ') AS text
         |  FROM base WHERE doc_id % 9 = 0),
         |d AS (SELECT doc_id, md5(text) AS text_md5,
         |  md5(array_to_string(list_sort($toksSql), ' ')) AS bow_key
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM re))
         |SELECT bow_key, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS canonical_id,
         |  CAST(count(DISTINCT text_md5) AS BIGINT) AS n_distinct_texts
         |FROM d GROUP BY bow_key HAVING count(*) >= 2
         |ORDER BY canonical_id""".stripMargin,

    // feature hashing: the portable md5-prefix hash, integer shares
    "q256_feature_hashing" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS term FROM documents),
         |terms AS (SELECT term, CAST(count(*) AS BIGINT) AS occ
         |  FROM toks GROUP BY term),
         |tb AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT % $HashBuckets AS bucket,
         |  occ FROM terms),
         |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_terms_b,
         |  CAST(sum(occ) AS BIGINT) AS occ_b FROM tb GROUP BY bucket)
         |SELECT CAST(sum(n_terms_b) AS BIGINT) AS n_terms,
         |  CAST(count(*) AS BIGINT) AS buckets_used,
         |  CAST(sum(CASE WHEN n_terms_b >= 2 THEN n_terms_b ELSE 0 END) AS BIGINT) AS collided_terms,
         |  CAST(sum(CASE WHEN n_terms_b >= 2 THEN n_terms_b ELSE 0 END) * 10000 // sum(n_terms_b) AS BIGINT) AS collision_bp,
         |  CAST(sum(CASE WHEN n_terms_b >= 2 THEN occ_b ELSE 0 END) * 10000 // sum(occ_b) AS BIGINT) AS collided_mass_bp,
         |  CAST(sum(occ_b) AS BIGINT) AS total_mass
         |FROM b""".stripMargin,

    // label noise: q25's cosine fold + rank discipline; integer votes
    "q253_label_noise" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (SELECT a.vec_id, a.label, b.vec_id AS n_id, b.label AS n_label,
         |  ${cosSql("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         |rk AS (SELECT vec_id, label, n_label,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, n_id) AS rk
         |  FROM scored),
         |votes AS (SELECT vec_id, label,
         |  CAST(sum(CASE WHEN n_label <> label THEN 1 ELSE 0 END) AS BIGINT) AS disagree
         |  FROM rk WHERE rk <= $NoiseK GROUP BY vec_id, label)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(disagree) * 10000 // (count(*) * $NoiseK) AS BIGINT) AS disagree_bp,
         |  CAST(sum(CASE WHEN disagree >= $NoiseFlagAt THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM votes GROUP BY label ORDER BY label""".stripMargin,

    // temperature scaling: same grid literals, same clamp, per-term
    // micro settling — order-free integer NLL sums
    "q252_temp_scaling" -> {
      val grid = TempGrid.mkString("[", ", ", "]")
      s"""$nbScoreCtes,
         |sc AS (SELECT score,
         |  CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END AS y FROM d),
         |g AS (SELECT unnest($grid) AS t_x100),
         |pt AS (SELECT t_x100, y,
         |  1.0 / (1.0 + exp(-(CAST(score AS DOUBLE) / 1000000.0) / (CAST(t_x100 AS DOUBLE) / 100.0))) AS p
         |  FROM sc, g),
         |tm AS (SELECT t_x100,
         |  CASE WHEN y = 1
         |    THEN CAST(round(-ln(least(greatest(p, 1e-12), 1.0 - 1e-12)) * 1000000.0) AS BIGINT)
         |    ELSE CAST(round(-ln(least(greatest(1.0 - p, 1e-12), 1.0 - 1e-12)) * 1000000.0) AS BIGINT)
         |  END AS term_micro FROM pt),
         |bt AS (SELECT t_x100, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(term_micro) AS BIGINT) AS nll_micro FROM tm GROUP BY t_x100),
         |b AS (SELECT CAST(min(nll_micro) AS BIGINT) AS best_nll FROM bt)
         |SELECT CAST(t_x100 AS BIGINT) AS t_x100, n_docs, nll_micro,
         |  CAST(nll_micro = best_nll AS BIGINT) AS is_best
         |FROM bt, b ORDER BY t_x100""".stripMargin
    },

    // calibrated brier: q243's PAV chain + q229's decomposition on the
    // same bins; the after-Brier expands from bin stats
    "q251_calibrated_brier" ->
      s"""$nbScoreCtes,
         |sc AS (SELECT doc_id, score,
         |  CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END AS y,
         |  CAST(round(1000000.0 / (1.0 + exp(-CAST(score AS DOUBLE) / 1000000.0))) AS BIGINT) AS p_micro
         |  FROM d),
         |r AS (SELECT y, p_micro,
         |  CAST(ntile($IsoBins) OVER (ORDER BY score, doc_id) AS BIGINT) AS bin FROM sc),
         |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
         |  CAST(sum(y) AS BIGINT) AS pos_k,
         |  CAST(sum(p_micro) AS BIGINT) AS sp FROM r GROUP BY bin),
         |rg AS (SELECT lo.bin AS j, hi.bin AS k,
         |  CAST(sum(m.pos_k) AS DOUBLE) / CAST(sum(m.n_k) AS DOUBLE) AS m
         |  FROM b lo JOIN b hi ON lo.bin <= hi.bin
         |  JOIN b m ON m.bin BETWEEN lo.bin AND hi.bin
         |  GROUP BY lo.bin, hi.bin),
         |iw AS (SELECT i.bin AS i, rg.j, min(rg.m) AS mn
         |  FROM b i JOIN rg ON rg.j <= i.bin AND rg.k >= i.bin
         |  GROUP BY i.bin, rg.j),
         |fit AS (SELECT i, max(mn) AS fit FROM iw GROUP BY i),
         |fb AS (SELECT b.bin, b.n_k, b.pos_k,
         |  CAST(b.sp // b.n_k AS BIGINT) AS f_micro,
         |  CAST(b.pos_k * 1000000 // b.n_k AS BIGINT) AS o_micro,
         |  CAST(round(fit.fit * 1000000.0) AS BIGINT) AS fit_micro
         |  FROM b JOIN fit ON fit.i = b.bin),
         |t AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
         |  CAST(sum(pos_k) * 1000000 // sum(n_k) AS BIGINT) AS obar FROM fb),
         |q AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |  CAST(sum((p_micro - y * 1000000) * (p_micro - y * 1000000)) AS BIGINT) AS sq FROM sc)
         |SELECT t.n AS n_docs, t.obar AS base_rate_micro,
         |  CAST(q.sq // q.nd AS BIGINT) AS bs_before_micro2,
         |  CAST(sum(n_k * fit_micro * fit_micro - 2000000 * fit_micro * pos_k
         |    + 1000000000000 * pos_k) // t.n AS BIGINT) AS bs_after_micro2,
         |  CAST(sum(n_k * (f_micro - o_micro) * (f_micro - o_micro)) // t.n AS BIGINT) AS rel_before_micro2,
         |  CAST(sum(n_k * (fit_micro - o_micro) * (fit_micro - o_micro)) // t.n AS BIGINT) AS rel_after_micro2,
         |  CAST(sum(n_k * (o_micro - obar) * (o_micro - obar)) // t.n AS BIGINT) AS res_micro2
         |FROM fb, t, q GROUP BY t.n, t.obar, q.sq, q.nd""".stripMargin,

    // alpha mixture: one exp∘ln per source micro-rounded (q228's exp
    // rule); Hamilton rounding mirrored with a window rank
    "q248_alpha_mixture" -> alphaMixtureOracle,

    // dedup ladder: the shared verified-pair chain + per-doc digests;
    // same cheapest-rung CASE order
    "q266_dedup_ladder" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |p AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
         |dg AS (SELECT doc_id, text, md5(text) AS tm,
         |  md5(array_to_string(list_sort(string_split_regex(trim(text), '\\s+')), ' ')) AS bm,
         |  CAST(length(text) AS BIGINT) AS len FROM documents),
         |cl AS (SELECT CASE
         |    WHEN da.tm = db.tm THEN 'exact'
         |    WHEN da.bm = db.bm THEN 'bag'
         |    WHEN (da.len < db.len AND substr(db.text, 1, CAST(da.len AS INT)) = da.text)
         |      OR (db.len < da.len AND substr(da.text, 1, CAST(db.len AS INT)) = db.text)
         |      THEN 'prefix'
         |    ELSE 'near_only' END AS rung
         |  FROM p JOIN dg da ON da.doc_id = id_a JOIN dg db ON db.doc_id = id_b),
         |c AS (SELECT rung, CAST(count(*) AS BIGINT) AS n_pairs FROM cl GROUP BY rung),
         |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM c)
         |SELECT rung, n_pairs, CAST(n_pairs * 10000 // t AS BIGINT) AS share_bp
         |FROM c, t ORDER BY rung""".stripMargin,

    // epochs: nests the q248 oracle; integer milli-epochs
    "q264_epochs" ->
      s"""WITH w AS (SELECT * FROM ($alphaMixtureOracle)),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM w)
         |SELECT source, n_tokens, w1_bp,
         |  CAST(w1_bp * t * ${EpochsBudgetX * 1000L} // (10000 * n_tokens) AS BIGINT) AS epochs_milli,
         |  CAST(w1_bp * t * ${EpochsBudgetX * 1000L} // (10000 * n_tokens) > 4000 AS BIGINT) AS over_4ep
         |FROM w, t ORDER BY source""".stripMargin,

    // hard negatives: q25's cosine fold + rank discipline, split by
    // label match; margins are same-fold double subtractions
    "q249_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec
         |  FROM e WHERE vec_id < $HardNegQueries),
         |scored AS (SELECT q_id, q_label, vec_id, label,
         |  ${cosSql("q_vec", "v")} AS cos
         |  FROM q, e WHERE vec_id <> q_id),
         |neg AS (SELECT q_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored WHERE label <> q_label),
         |pos AS (SELECT q_id, max(cos) AS pos_cos
         |  FROM scored WHERE label = q_label GROUP BY q_id)
         |SELECT n.q_id, n.rank, n.vec_id, n.cos, p.pos_cos,
         |  n.cos - p.pos_cos AS margin
         |FROM neg n JOIN pos p ON p.q_id = n.q_id
         |WHERE n.rank <= $HardNegK ORDER BY n.q_id, n.rank""".stripMargin,

    // MMR: q203's unrolled greedy CTE pairs with the λ-score argmax;
    // scores stay ×10-scaled integers (no engine-split integer div)
    "q250_mmr" -> mmrOracle,

    "q229_brier" ->
      s"""$nbScoreCtes,
         |sc AS (SELECT doc_id, score,
         |  CASE WHEN source = '$NbSeedSource' THEN 1 ELSE 0 END AS y,
         |  CAST(round(1000000.0 / (1.0 + exp(-CAST(score AS DOUBLE) / 1000000.0))) AS BIGINT) AS p_micro
         |  FROM d),
         |r AS (SELECT y, p_micro,
         |  CAST(ntile($NbCalBins) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bin FROM sc),
         |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
         |  CAST(sum(y) AS BIGINT) AS pos_k,
         |  CAST(sum(p_micro) // count(*) AS BIGINT) AS f_micro,
         |  CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS o_micro
         |  FROM r GROUP BY bin),
         |t AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
         |  CAST(sum(pos_k) * 1000000 // sum(n_k) AS BIGINT) AS obar FROM b),
         |q AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |  CAST(sum((p_micro - y * 1000000) * (p_micro - y * 1000000)) AS BIGINT) AS sq FROM sc)
         |SELECT t.n AS n_docs, t.obar AS base_rate_micro,
         |  CAST(q.sq // q.nd AS BIGINT) AS bs_micro2,
         |  CAST(sum(n_k * (f_micro - o_micro) * (f_micro - o_micro)) // t.n AS BIGINT) AS rel_micro2,
         |  CAST(sum(n_k * (o_micro - obar) * (o_micro - obar)) // t.n AS BIGINT) AS res_micro2,
         |  CAST(t.obar * (1000000 - t.obar) AS BIGINT) AS unc_micro2
         |FROM b, t, q GROUP BY t.n, t.obar, q.sq, q.nd""".stripMargin,

    // doremi: per-term micro settling makes source sums order-free;
    // one exp per source; Hamilton rounding mirrored with a window rank
    "q228_doremi" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks),
         |sm AS (SELECT term,
         |  CAST(round(-ln(c.c::DOUBLE / tt.t) * 1000000.0) AS BIGINT) AS s_micro
         |  FROM c, tt),
         |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
         |  FROM toks GROUP BY source, term),
         |src AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_st * s_micro) // sum(n_st) AS BIGINT) AS h_micro
         |  FROM st JOIN sm USING (term) GROUP BY source),
         |f AS (SELECT source, n_tokens, h_micro,
         |  CAST(round(exp($DoremiEta * CAST(h_micro AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT) AS f_micro
         |  FROM src),
         |u AS (SELECT source, n_tokens, h_micro, n_tokens * f_micro AS unnorm FROM f),
         |tots AS (SELECT CAST(sum(unnorm) AS BIGINT) AS uu,
         |  CAST(sum(n_tokens) AS BIGINT) AS t FROM u),
         |q AS (SELECT source, n_tokens, h_micro,
         |  CAST(n_tokens * 10000 // t AS BIGINT) AS w0_bp,
         |  CAST(unnorm * 10000 // uu AS BIGINT) AS base,
         |  (unnorm * 10000) % uu AS rem FROM u, tots),
         |r AS (SELECT source, n_tokens, h_micro, w0_bp, base,
         |  row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
         |lo AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS l FROM r)
         |SELECT source, n_tokens, h_micro, w0_bp,
         |  CAST(base + CASE WHEN rk <= l THEN 1 ELSE 0 END AS BIGINT) AS w1_bp
         |FROM r, lo ORDER BY source""".stripMargin,

    // shuffle audit: same md5 order + exact adjacency expectation
    "q215_shuffle_audit" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS STRING)), 1, 8))
         |    AS BIGINT) % $ShuffleAuditBuckets AS bucket,
         |  md5('ord:' || CAST(doc_id AS STRING)) AS ord
         |  FROM documents),
         |o AS (SELECT bucket, CAST(count(*) AS BIGINT) AS m,
         |  CAST(sum(CASE WHEN prev_src = source THEN 1 ELSE 0 END) AS BIGINT)
         |    AS obs_same
         |  FROM (SELECT bucket, source, lag(source) OVER (
         |    PARTITION BY bucket ORDER BY ord, doc_id) AS prev_src FROM d)
         |  GROUP BY bucket),
         |x AS (SELECT bucket, CAST(sum(c * (c - 1)) AS BIGINT) AS cc FROM (
         |  SELECT bucket, source, CAST(count(*) AS BIGINT) AS c FROM d
         |  GROUP BY bucket, source) GROUP BY bucket)
         |SELECT bucket, m, obs_same,
         |  CAST(cc * 1000 // m AS BIGINT) AS exp_same_milli
         |FROM o JOIN x USING (bucket) ORDER BY bucket""".stripMargin,

    // winsorize: same rank-pinned boundaries via conditional sums
    "q211_winsorize" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS x FROM documents),
        |r AS (SELECT source, doc_id, x,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS BIGINT) AS rk,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM d),
        |r2 AS (SELECT *, n_s // 20 AS lo FROM r),
        |b AS (SELECT source,
        |  CAST(sum(CASE WHEN rk = lo + 1 THEN x END) AS BIGINT) AS p05,
        |  CAST(sum(CASE WHEN rk = n_s - lo THEN x END) AS BIGINT) AS p95
        |  FROM r2 GROUP BY source),
        |j AS (SELECT r2.*, b.p05, b.p95,
        |  least(greatest(x, p05), p95) AS xw FROM r2 JOIN b USING (source))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(p05) AS BIGINT) AS p05, CAST(max(p95) AS BIGINT) AS p95,
        |  CAST(sum(xw) * 1000 // count(*) AS BIGINT) AS wins_mean_milli,
        |  CAST(sum(CASE WHEN rk > lo AND rk <= n_s - lo THEN x END) * 1000
        |    // sum(CASE WHEN rk > lo AND rk <= n_s - lo THEN 1 ELSE 0 END)
        |    AS BIGINT) AS trim_mean_milli
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // DP release: portable md5-prefix uniform, identical inverse-CDF
    // doubles, micro-settled noise
    "q208_dp_release" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_true
        |  FROM documents GROUP BY source),
        |u AS (SELECT source, n_true,
        |  CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) / 4294967296.0 AS u
        |  FROM c),
        |z AS (SELECT source, n_true,
        |  -sign(u - 0.5) * ln(greatest(0.000000000001, 1.0 - 2.0 * abs(u - 0.5))) AS noise
        |  FROM u)
        |SELECT source, n_true,
        |  CAST(round(noise * 1000000.0) AS BIGINT) AS noise_micro,
        |  n_true + CAST(round(noise) AS BIGINT) AS n_released
        |FROM z ORDER BY source""".stripMargin,

    // Wasserstein-1: lead window is the oracle's job; exact integer
    // |cumA·totB − cumB·totA|·Δv segments
    "q206_wasserstein" ->
      """WITH d AS (SELECT n_chars AS v, doc_id % 2 = 0 AS a FROM documents),
        |byv AS (SELECT v,
        |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM d GROUP BY v),
        |c AS (SELECT v, CAST(sum(n_a) OVER w AS BIGINT) AS cum_a,
        |  CAST(sum(n_b) OVER w AS BIGINT) AS cum_b,
        |  lead(v) OVER (ORDER BY v) AS vn
        |  FROM byv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
        |  CAST(sum(n_b) AS BIGINT) AS tot_b FROM byv),
        |s AS (SELECT CAST(coalesce(sum(abs(cum_a * tot_b - cum_b * tot_a)
        |    * (vn - v)), 0) AS BIGINT) AS w1_num
        |  FROM c, t WHERE vn IS NOT NULL)
        |SELECT tot_a, tot_b, w1_num,
        |  CAST(w1_num * 1000 // (tot_a * tot_b) AS BIGINT) AS w1_milli
        |FROM t, s""".stripMargin,

    // Hill: same top-(k+1) selection; ln settled to micro per row,
    // exact integer sum + integer division
    "q198_hill" ->
      s"""WITH sel AS (SELECT n_chars FROM documents
         |  ORDER BY n_chars DESC, doc_id LIMIT ${HillK + 1}),
         |m AS (SELECT CAST(min(n_chars) AS BIGINT) AS x_tail FROM sel),
         |s AS (SELECT CAST(sum(CAST(round(ln(CAST(n_chars AS DOUBLE)
         |    / CAST(x_tail AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT)
         |    AS sum_log_micro
         |  FROM sel, m)
         |SELECT CAST($HillK AS BIGINT) AS k, x_tail, sum_log_micro,
         |  CAST(${HillK * 1000000000000L} // sum_log_micro AS BIGINT) AS alpha_micro
         |FROM m, s""".stripMargin,

    // PCA power iteration: same fixed-point moments; the whole method
    // is HUGEINT-exact until the final per-dim division
    "q199_pca_power" ->
      s"""WITH ex AS (SELECT vec_id, i,
         |  CAST(floor(CAST(embedding[i] AS DOUBLE) * ${PcaScale.toLong}.0) AS BIGINT) AS v
         |  FROM embeddings, (SELECT unnest(generate_series(1, $EmbedDims)) AS i) t),
         |n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
         |s AS (SELECT i, CAST(sum(v) AS HUGEINT) AS s FROM ex GROUP BY i),
         |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS HUGEINT) AS p
         |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |tri AS (SELECT p.i, p.j, n.n * p.p - sa.s * sb.s AS covnum
         |  FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j, n),
         |mat AS (SELECT i, j, covnum FROM tri
         |  UNION ALL SELECT j, i, covnum FROM tri WHERE i <> j),
         |u1 AS (SELECT j, sum(covnum) AS u1 FROM mat GROUP BY j),
         |m1 AS (SELECT max(abs(u1)) AS m1 FROM u1),
         |u2 AS (SELECT mat.j, sum(mat.covnum * u1.u1) AS u2
         |  FROM mat JOIN u1 ON u1.j = mat.i GROUP BY mat.j),
         |m2 AS (SELECT max(abs(u2)) AS m2 FROM u2)
         |SELECT CAST(u2.j - 1 AS BIGINT) AS dim,
         |  round(CAST(u2 AS DOUBLE) / CAST(m2 AS DOUBLE), 9) AS loading,
         |  CAST(m2 // m1 AS BIGINT) AS lambda_ratio
         |FROM u2, m2, m1 ORDER BY dim""".stripMargin,

    // Neyman: same integer moments, milli sigma, largest remainder
    "q190_neyman" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS nh,
         |  CAST(sum(n_chars) AS BIGINT) AS sx,
         |  CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
         |  FROM documents GROUP BY source),
         |g AS (SELECT source, nh,
         |  CAST(round(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE))
         |    / CAST(nh AS DOUBLE) * 1000) AS BIGINT) AS sigma_milli FROM s),
         |w AS (SELECT source, nh, sigma_milli, nh * sigma_milli AS w FROM g),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w),
         |q AS (SELECT source, nh, sigma_milli,
         |  CAST(w * $NeymanBudget // wt AS BIGINT) AS base,
         |  CAST((w * $NeymanBudget) % wt AS BIGINT) AS rem FROM w, t),
         |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
         |l AS (SELECT $NeymanBudget - CAST(sum(base) AS BIGINT) AS l FROM q)
         |SELECT source, nh, sigma_milli, base,
         |  CAST(base + CASE WHEN rk <= l THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM r, l ORDER BY source""".stripMargin,

    // keyness: same smoothing, per-row micro lns, per-source top-k
    "q187_keyness" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
         |tt AS (SELECT term, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY 1),
         |stot AS (SELECT source, CAST(count(*) AS BIGINT) AS tots FROM toks GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM toks),
         |sc AS (SELECT source, term,
         |  CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(tots - c + 1 AS DOUBLE)) * 1000000) AS BIGINT)
         |  - CAST(round(ln(CAST(ct - c + 1 AS DOUBLE)
         |      / CAST(tot - tots - (ct - c) + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS score_micro
         |  FROM st JOIN tt USING (term) JOIN stot USING (source), g),
         |r AS (SELECT source, term, score_micro,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY score_micro DESC, term) AS rk FROM sc)
         |SELECT source, CAST(rk AS BIGINT) AS rk, term, score_micro
         |FROM r WHERE rk <= $KeynessTopK ORDER BY source, rk""".stripMargin,

    // calibration: same candidates, per-position signature compare,
    // exact true-jaccard bp
    "q188_minhash_calibration" ->
      s"""$lshCandidateCtes,
         |pp AS (SELECT
         |  CAST(list_sum(list_transform(range(1, 17),
         |    i -> CASE WHEN sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)] THEN 1 ELSE 0 END)) AS BIGINT) AS matches,
         |  CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) * 10000
         |    // CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS BIGINT) AS true_bp
         |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b),
         |g2 AS (SELECT matches, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(true_bp) AS BIGINT) AS sum_true FROM pp GROUP BY matches)
         |SELECT matches, n_pairs, CAST(matches * 10000 // 16 AS BIGINT) AS est_bp,
         |  CAST(sum_true // n_pairs AS BIGINT) AS mean_true_bp
         |FROM g2 ORDER BY matches""".stripMargin,

    // incremental winnow: same split rule, same fingerprint sets,
    // best = (max shared, min id)
    "q186_winnow_incremental" ->
      s"""$winnowCtes,
         |fp AS (SELECT DISTINCT doc_id, h FROM
         |  (SELECT doc_id, hs[CAST(unnest(sel) AS INT)] AS h FROM s)),
         |inc AS (SELECT doc_id AS new_id, h FROM fp WHERE doc_id % $IncrementMod = 0),
         |corpall AS (SELECT doc_id, h FROM fp WHERE doc_id % $IncrementMod <> 0),
         |keep AS (SELECT h FROM corpall GROUP BY h HAVING count(*) <= $WinnowMaxDf),
         |corp AS (SELECT doc_id, h FROM corpall JOIN keep USING (h)),
         |cand AS (SELECT new_id, doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM corp JOIN inc USING (h) GROUP BY new_id, doc_id
         |  HAVING count(*) >= $WinnowMinShared),
         |pn AS (SELECT new_id,
         |  CAST(count(*) AS BIGINT) AS n_dup_candidates,
         |  CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS best_dup,
         |  CAST(max(CASE WHEN rn = 1 THEN n_shared END) AS BIGINT) AS best_shared
         |  FROM (SELECT new_id, doc_id, n_shared,
         |    row_number() OVER (PARTITION BY new_id
         |      ORDER BY n_shared DESC, doc_id) AS rn FROM cand)
         |  GROUP BY new_id)
         |SELECT i.new_id AS new_id,
         |  CAST(coalesce(pn.n_dup_candidates, 0) AS BIGINT) AS n_dup_candidates,
         |  pn.best_dup AS best_dup, pn.best_shared AS best_shared
         |FROM (SELECT DISTINCT new_id FROM inc) i LEFT JOIN pn USING (new_id)
         |ORDER BY new_id""".stripMargin,

    // boilerplate: same fingerprints, df ranking, (doc,pos)-min
    // exemplar, gram extraction from the exemplar text
    "q177_boilerplate" ->
      s"""$winnowCtes,
         |fp AS (SELECT doc_id, unnest(sel) AS pos,
         |  unnest(list_transform(sel, p -> hs[CAST(p AS INT)])) AS h FROM s),
         |bf AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM fp GROUP BY h),
         |bex AS (SELECT h, doc_id AS ex_doc, pos AS ex_pos FROM
         |  (SELECT h, doc_id, pos,
         |     row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM fp)
         |  WHERE rn = 1),
         |top AS (SELECT bf.h AS h, df, ex_doc, CAST(ex_pos AS BIGINT) AS ex_pos
         |  FROM bf JOIN bex USING (h) ORDER BY df DESC, h LIMIT $BoilerplateTopK)
         |SELECT top.h AS h, df, ex_doc, ex_pos,
         |  substr(lower(d.text), CAST(ex_pos AS INT), $WinnowK) AS gram
         |FROM top JOIN documents d ON d.doc_id = top.ex_doc
         |ORDER BY df DESC, h""".stripMargin,

    // winnowing candidate pairs: same fingerprints, df-capped
    // blocking, exact shared-hash counts
    "q171_winnow_pairs" ->
      s"""$winnowCtes,
         |fp AS (SELECT DISTINCT doc_id, h FROM
         |  (SELECT doc_id, hs[CAST(unnest(sel) AS INT)] AS h FROM s)),
         |d AS (SELECT h, count(*) AS df FROM fp GROUP BY h),
         |k AS (SELECT doc_id, h FROM fp JOIN d USING (h)
         |  WHERE df BETWEEN 2 AND $WinnowMaxDf)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
         |ORDER BY id_a, id_b""".stripMargin,

    "q108_bm25" -> {
      val termsIn = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, $ltoksSql AS ltoks FROM documents
         |  WHERE text IS NOT NULL),
         |dl AS (SELECT doc_id, CAST(len(ltoks) AS BIGINT) AS dl FROM toks),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(ltoks) AS term FROM toks)
         |  WHERE term IN ($termsIn) GROUP BY doc_id, term),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |c AS (SELECT tf.doc_id,
         |  ln(CAST(1.0 AS DOUBLE) + (st.n_docs - dfq.df + CAST(0.5 AS DOUBLE))
         |      / (dfq.df + CAST(0.5 AS DOUBLE)))
         |  * (tf.tf * CAST(${Bm25K1 + 1.0} AS DOUBLE))
         |  / (tf.tf + CAST($Bm25K1 AS DOUBLE) * (CAST(${1.0 - Bm25B} AS DOUBLE)
         |      + CAST($Bm25B AS DOUBLE) * dl.dl * st.n_docs / st.sum_dl)) AS contrib
         |  FROM tf JOIN dfq USING (term) JOIN dl ON dl.doc_id = tf.doc_id, st)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  sum(contrib) AS score
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q109_cluster_rep" ->
      s"""${lshCandidateCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$jacCte,
         |$ccReachCtes,
         |comp AS (SELECT id AS doc_id, min(lbl) AS canonical_id
         |  FROM reach GROUP BY id),
         |${qualityScoreCtes.replaceFirst("^WITH ", "")},
         |qm AS (SELECT doc_id,
         |  CAST(round(quality * 1000000) AS BIGINT) AS q_micro FROM q),
         |m AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS n_members
         |  FROM comp GROUP BY canonical_id),
         |r AS (SELECT comp.canonical_id, comp.doc_id, qm.q_micro,
         |  row_number() OVER (PARTITION BY comp.canonical_id
         |    ORDER BY qm.q_micro DESC, comp.doc_id) AS rn
         |  FROM comp JOIN qm ON qm.doc_id = comp.doc_id)
         |SELECT r.canonical_id, r.doc_id AS rep_doc_id,
         |  r.q_micro AS rep_q_micro, m.n_members
         |FROM r JOIN m ON m.canonical_id = r.canonical_id
         |WHERE r.rn = 1 AND m.n_members >= 2
         |ORDER BY r.canonical_id""".stripMargin,

    "q119_pct_rank" ->
      s"""$qualityScoreCtes,
         |qm AS (SELECT q.doc_id, d.source,
         |    CAST(round(q.quality * 1000000) AS BIGINT) AS q_micro
         |  FROM q JOIN documents d ON d.doc_id = q.doc_id),
         |r AS (SELECT doc_id, source, q_micro,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY q_micro NULLS LAST, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM qm)
         |SELECT doc_id, source, q_micro,
         |  CASE WHEN n = 1 THEN 0 ELSE ((rk - 1) * 10000) // (n - 1) END AS pct_bp
         |FROM r ORDER BY doc_id""".stripMargin,

    "q118_dup_rate" ->
      s"""$lshCandidateCtes,
         |$jacCte,
         |p AS (SELECT id_a, id_b FROM jac WHERE jacc >= 0.4),
         |ids AS (SELECT id_a AS doc_id FROM p UNION SELECT id_b FROM p),
         |dd AS (SELECT d.source,
         |    CASE WHEN ids.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
         |  FROM documents d LEFT JOIN ids ON ids.doc_id = d.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
         |  (CAST(sum(is_dup) AS BIGINT) * 10000) // CAST(count(*) AS BIGINT) AS dup_bp
         |FROM dd GROUP BY source ORDER BY source""".stripMargin,

    "q104_containment" ->
      s"""$lshCandidateCtes,
         |x AS (SELECT id_a, id_b,
         |  CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
         |  CAST(len(sa.s) AS BIGINT) AS n_a, CAST(len(sb.s) AS BIGINT) AS n_b
         |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b),
         |c AS (SELECT id_a, id_b,
         |  (n_inter * 10000) // n_a AS cont_ab_bp,
         |  (n_inter * 10000) // n_b AS cont_ba_bp FROM x)
         |SELECT id_a, id_b, cont_ab_bp, cont_ba_bp FROM c
         |WHERE greatest(cont_ab_bp, cont_ba_bp) >= $ContainmentBp
         |ORDER BY id_a, id_b""".stripMargin,

    "q115_char_entropy" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL AND length(text) > 0),
         |codes AS (SELECT doc_id, unnest(${codesSql("text")}) AS code FROM d),
         |cc AS (SELECT doc_id, code, CAST(count(*) AS BIGINT) AS c
         |  FROM codes GROUP BY doc_id, code),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
         |  sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
         |  FROM cc GROUP BY doc_id)
         |SELECT doc_id, n_chars, n_distinct_chars,
         |  ln(CAST(n_chars AS DOUBLE)) - clogc / CAST(n_chars AS DOUBLE) AS entropy
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q23_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_transform($toksSql, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
         |  FROM documents)
         |SELECT doc_id, $simhashTermsSql AS simhash
         |FROM t ORDER BY doc_id""".stripMargin,

    // Hamming-banded pairs over q23's fingerprints: pigeonhole makes
    // the distance predicate an equi-join; exact bit_count verify
    // weighted median: aggregate-then-scan, lower-median pick
    "q164_weighted_median" ->
      s"""WITH vw AS (SELECT l_returnflag,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wsum
         |  FROM lineitem GROUP BY l_returnflag, cents),
         |c AS (SELECT l_returnflag, cents, wsum,
         |  CAST(sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents) AS BIGINT) AS cum,
         |  CAST(sum(wsum) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
         |  FROM vw)
         |SELECT l_returnflag, min(cents) AS w_median_cents,
         |  max(tot) AS total_weight
         |FROM c WHERE cum * 2 >= tot
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // greedy set cover: rounds unrolled as (arg-max, anti-join) CTE
    // pairs — same tie order, same covered-set removal
    "q163_set_cover" -> {
      val rounds = (1 to SetCoverRounds).map { i =>
        s"""w$i AS (SELECT doc_id, gain FROM (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain,
           |    row_number() OVER (ORDER BY count(*) DESC, doc_id) AS rk
           |  FROM u${i - 1} GROUP BY doc_id) WHERE rk = 1),
           |u$i AS (SELECT u.doc_id, u.g FROM u${i - 1} u
           |  WHERE NOT EXISTS (SELECT 1 FROM u${i - 1} x
           |    JOIN w$i ww ON x.doc_id = ww.doc_id WHERE x.g = u.g))""".stripMargin
      }.mkString(",\n")
      val outRows = (1 to SetCoverRounds).map { i =>
        val cum = (1 to i).map(j => s"w$j.gain").mkString(" + ")
        val from = (1 to i).map(j => s"w$j").mkString(", ")
        s"""SELECT CAST($i AS BIGINT) AS round, w$i.doc_id AS doc_id,
           |  w$i.gain AS marginal_gain, CAST($cum AS BIGINT) AS covered_total
           |FROM $from""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shl AS (SELECT doc_id, $shinglesSql AS s FROM toks),
         |e0 AS (SELECT doc_id, unnest(s) AS g FROM shl),
         |u0 AS (SELECT DISTINCT doc_id, g FROM e0),
         |$rounds
         |$outRows
         |ORDER BY round""".stripMargin
    },

    // confusion matrix: q18's detector CTEs + a cells aggregate
    "q161_lang_confusion" ->
      s"""WITH t AS (SELECT doc_id, lang, $ltoksSql AS ltoks FROM documents
         |  WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, lang,
         |  ${TextAnalysis.stopwords.map { case (l, ws) => s"${hitsSql(ws)} AS s_$l" }.mkString(",\n  ")}
         |  FROM t),
         |p AS (SELECT lang, $langCaseSql AS lang_pred FROM s),
         |cells AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY lang, lang_pred),
         |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY lang)
         |SELECT cells.lang AS lang, lang_pred, n,
         |  CAST(n * 10000 // row_n AS BIGINT) AS share_bp
         |FROM cells JOIN r USING (lang)
         |ORDER BY lang, lang_pred""".stripMargin,

    // source overlap: distinct (shingle, source) self-join on shingle
    "q162_source_overlap" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shl AS (SELECT doc_id, $shinglesSql AS s FROM toks),
         |u AS (SELECT d.source AS source, unnest(shl.s) AS g
         |  FROM shl JOIN documents d USING (doc_id)),
         |sg AS (SELECT DISTINCT source, g FROM u),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
         |  FROM sg GROUP BY source),
         |inter AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_inter
         |  FROM sg a JOIN sg b USING (g) WHERE a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, n_inter,
         |  CAST(sa.sz + sb.sz - n_inter AS BIGINT) AS n_union,
         |  CAST(n_inter * 10000 // (sa.sz + sb.sz - n_inter) AS BIGINT) AS jaccard_bp
         |FROM inter
         |JOIN sizes sa ON sa.source = src_a
         |JOIN sizes sb ON sb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin,

    // novelty: history reduced to one min-aggregate over shingle keys
    "q160_novelty" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shl AS (SELECT doc_id, $shinglesSql AS s FROM toks),
         |u AS (SELECT doc_id // $NoveltyBatchSize AS batch, unnest(s) AS g FROM shl),
         |pairs AS (SELECT DISTINCT batch, g FROM u),
         |fs AS (SELECT g, min(batch) AS first_batch FROM pairs GROUP BY g),
         |pb AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM pairs GROUP BY batch),
         |nv AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_novel
         |  FROM pairs JOIN fs USING (g) WHERE batch = first_batch GROUP BY batch)
         |SELECT pb.batch AS batch, n_shingles,
         |  coalesce(n_novel, 0) AS n_novel,
         |  CAST(coalesce(n_novel, 0) * 10000 // n_shingles AS BIGINT) AS novelty_bp
         |FROM pb LEFT JOIN nv USING (batch) ORDER BY batch""".stripMargin,

    // aHash: integer threshold bits over the first frame's codes;
    // same pigeonhole banding + popcount verify as q138
    "q157_phash_dedup" -> {
      val bitTermsSql = (1 to PhashFrame).map(i =>
        s"(CASE WHEN cs[$i] * $PhashFrame > fsum THEN ${1L << (i - 1)} ELSE 0 END)")
        .mkString("\n    + ")
      s"""WITH m AS (SELECT doc_id, substr(text, 1, $PhashFrame) AS frame
         |  FROM documents WHERE text IS NOT NULL AND length(text) >= $PhashFrame),
         |c AS (SELECT doc_id,
         |  list_transform(range(1, ${PhashFrame + 1}), i -> unicode(frame[i])) AS cs
         |  FROM m),
         |s AS (SELECT doc_id, cs, ${foldSumSql("cs")} AS fsum FROM c),
         |h AS (SELECT doc_id, CAST($bitTermsSql AS BIGINT) AS phash FROM s),
         |b AS (SELECT doc_id, phash, k, (phash >> (8 * k)) & 255 AS bv
         |  FROM h, (SELECT unnest(range(0, $PhashBands)) AS k)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b,
         |    a.phash AS ha, c2.phash AS hb
         |  FROM b a JOIN b c2 ON a.k = c2.k AND a.bv = c2.bv AND a.doc_id < c2.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= $PhashHamMax
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q138_simhash_dedup" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_transform($toksSql, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, $simhashTermsSql AS simhash FROM t),
         |b AS (SELECT doc_id, simhash, k, (simhash >> (8 * k)) & 255 AS bv
         |  FROM s, (SELECT unnest(range(0, $SimhashBands)) AS k)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |    a.simhash AS ha, c.simhash AS hb
         |  FROM b a JOIN b c ON a.k = c.k AND a.bv = c.bv AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= $SimhashHamMax
         |ORDER BY id_a, id_b""".stripMargin,

    "q24_dedup_embed" -> embedDedupOracle(""),

    // q24's text with the candidate set restricted to pairs TOUCHING
    // the 25% increment — the incremental chain emits exactly those
    "q284_embed_incremental" ->
      embedDedupOracle(" AND (a.vec_id % 4 = 3 OR b2.vec_id % 4 = 3)"),

    // the embedding near-dup TVF called at the battery threshold is
    // row-identical to q24 by construction — shared oracle text
    "q286_sql_embed_tvf" -> embedDedupOracle(""),

    "q287_embed_groups" -> embedComponentsOracle,

    "q25_knn_brute" -> knnBruteOracle,

    "q26_knn_lsh" -> knnLshOracle,

    "q87_knn_multiprobe" -> knnMultiProbeOracle,

    // the three index-family oracles nested verbatim: the audit's
    // ground truth and candidates are BY CONSTRUCTION the same rows
    // the driver already hash-verified for q25/q26/q87
    // NDCG: nests the same brute/LSH texts; micro terms then integer
    // sum; ideal is the shared Scala constant
    "q207_ndcg" ->
      s"""WITH t AS (SELECT q_id, vec_id, rank AS trank FROM ($knnBruteOracle)),
         |r AS (SELECT q_id, vec_id, rank AS prank FROM ($knnLshOracle)),
         |terms AS (SELECT r.q_id, CAST(round((11 - t.trank) * 1000000.0
         |    / log2(r.prank + 1)) AS BIGINT) AS term
         |  FROM r JOIN t ON t.q_id = r.q_id AND t.vec_id = r.vec_id),
         |d AS (SELECT q_id, CAST(sum(term) AS BIGINT) AS dcg_micro
         |  FROM terms GROUP BY q_id),
         |base AS (SELECT DISTINCT q_id FROM t)
         |SELECT base.q_id AS q_id,
         |  coalesce(d.dcg_micro, CAST(0 AS BIGINT)) AS dcg_micro,
         |  CAST(coalesce(d.dcg_micro, 0) * 10000 // $NdcgIdealMicro AS BIGINT) AS ndcg_bp
         |FROM base LEFT JOIN d ON d.q_id = base.q_id
         |ORDER BY q_id""".stripMargin,

    "q112_ann_recall" ->
      s"""WITH gt AS (SELECT q_id, vec_id FROM ($knnBruteOracle) WHERE rank <= 5),
         |l AS (SELECT q_id, vec_id FROM ($knnLshOracle)),
         |m AS (SELECT q_id, vec_id FROM ($knnMultiProbeOracle)),
         |base AS (SELECT DISTINCT q_id FROM gt),
         |nl AS (SELECT gt.q_id, CAST(count(*) AS BIGINT) AS lsh_hits
         |  FROM gt JOIN l USING (q_id, vec_id) GROUP BY gt.q_id),
         |nm AS (SELECT gt.q_id, CAST(count(*) AS BIGINT) AS mp_hits
         |  FROM gt JOIN m USING (q_id, vec_id) GROUP BY gt.q_id)
         |SELECT base.q_id AS q_id, coalesce(nl.lsh_hits, CAST(0 AS BIGINT)) AS lsh_hits,
         |  coalesce(nm.mp_hits, CAST(0 AS BIGINT)) AS mp_hits
         |FROM base
         |LEFT JOIN nl ON nl.q_id = base.q_id
         |LEFT JOIN nm ON nm.q_id = base.q_id
         |ORDER BY base.q_id""".stripMargin,

    "q30_ngram_topk" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM toks),
         |u AS (SELECT unnest(s) AS shingle FROM sh)
         |SELECT shingle, count(*) AS df FROM u
         |GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

    "q31_dedup_groups" -> componentsOracle,

    // merge == rebuild: the incremental star-contraction composition
    // shares the FULL-rebuild oracle text (q37/q85, q86/q88 precedent)
    "q121_cc_incremental" -> componentsOracle,

    "q29_knn_ivf" -> knnIvfOracle,
    "q288_ivf_audit" -> ivfAuditOracle,
    "q289_geomedian" -> geoMedianOracle,
    "q290_index_churn" -> indexChurnOracle,
    "q293_embed_decontam" -> embedDecontamOracle,
    "q297_embed_decontam_banded" -> embedDecontamBandedOracle,
    "q298_decontam_recall" -> decontamRecallOracle,
    "q299_decontam_tight" -> decontamTightBandedOracle,
    "q300_decontam_recall_tight" -> decontamTightRecallOracle,
    // the decontam TVF called at (tight threshold, 9000 bp) IS the
    // q299 chain — row-identical by construction, one oracle text
    "q303_decontam_tvf" -> decontamTightBandedOracle,
    "q302_decontam_report" -> decontamReportOracle,

    // JL audit: same sign lists + exact plane-dot fold as the SRP
    // oracles; projected cosine via the 16-dim fold twin
    "q131_jl_distortion" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${signListsCte(JlDims.toString)},
         |$planeDotsCte,
         |y AS (SELECT vec_id, list(dt ORDER BY j) AS yv FROM d GROUP BY vec_id),
         |o(off) AS (VALUES ${JlOffsets.map(o => s"(CAST($o AS BIGINT))").mkString(", ")}),
         |p AS (SELECT a.vec_id AS id_a, a.vec_id + off AS id_b, off
         |      FROM e a, o WHERE a.vec_id < $JlSample),
         |err AS (SELECT off,
         |  abs(${cosSql("ea.v", "eb.v")} - ${cosSqlN("ya.yv", "yb.yv", JlDims)}) AS ae
         |  FROM p JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
         |    JOIN y ya ON ya.vec_id = id_a JOIN y yb ON yb.vec_id = id_b)
         |SELECT off, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(ae), 6) AS mean_abs_err, round(max(ae), 6) AS max_abs_err
         |FROM err GROUP BY off ORDER BY off""".stripMargin,

    // RRF fusion of the three nested index oracles; integer-scaled
    // reciprocal terms (exact lcm division) — no float ordering
    "q125_rrf_fusion" ->
      s"""WITH l AS (SELECT q_id, vec_id, rank FROM ($knnLshOracle)),
         |m AS (SELECT q_id, vec_id, rank FROM ($knnMultiProbeOracle)),
         |i AS (SELECT q_id, vec_id, rank FROM ($knnIvfOracle)),
         |u AS (SELECT * FROM l UNION ALL SELECT * FROM m UNION ALL SELECT * FROM i),
         |f AS (SELECT q_id, vec_id,
         |  CAST(sum($RrfScale // ($RrfK + rank)) AS BIGINT) AS rrf_scaled,
         |  CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY q_id, vec_id),
         |r AS (SELECT q_id, vec_id, rrf_scaled, n_lists,
         |  row_number() OVER (PARTITION BY q_id ORDER BY rrf_scaled DESC, vec_id) AS frank
         |  FROM f)
         |SELECT q_id, frank, vec_id, rrf_scaled, n_lists FROM r
         |WHERE frank <= 5 ORDER BY q_id, frank""".stripMargin,

    "q80_ivf_learned" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT ${ScaleParams.ivfListsSql} AS lists FROM e),
         |c0 AS (SELECT vec_id AS c_id, v AS c_vec FROM e
         |       WHERE vec_id < (SELECT lists FROM p)),
         |${(1 to LloydIters).map(it => lloydCteSql(it, s"c${it - 1}")).mkString(",\n")},
         |assign AS (SELECT vec_id, v, c_id AS list_id FROM (
         |  SELECT e.vec_id, e.v, cL.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.v", "cL.c_vec")} DESC, cL.c_id) AS crk
         |  FROM e, c$LloydIters cL) WHERE crk = 1),
         |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
         |probes AS (SELECT q_id, q_vec, c_id AS list_id FROM (
         |  SELECT q.q_id, q.q_vec, cL.c_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("q.q_vec", "cL.c_vec")} DESC, cL.c_id) AS crk
         |  FROM q, c$LloydIters cL) WHERE crk <= $IvfProbes),
         |scored AS (SELECT q_id, a.vec_id, ${cosSql("p2.q_vec", "a.v")} AS cos
         |           FROM probes p2 JOIN assign a USING (list_id)
         |           WHERE a.vec_id <> p2.q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // skyline: the oracle is the O(n²) dominance definition itself —
    // the engine's 3-linear-pass reduction must reproduce it exactly
    "q140_skyline" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents
         |  WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS tok_cnt,
         |    CAST(FLOOR(10000.0 * len(list_distinct(t)) / len(t)) AS BIGINT) AS uniq_bp
         |  FROM t WHERE len(t) > 0),
         |sky AS (SELECT a.doc_id, a.tok_cnt, a.uniq_bp FROM s a
         |  WHERE NOT EXISTS (SELECT 1 FROM s b
         |    WHERE b.tok_cnt >= a.tok_cnt AND b.uniq_bp >= a.uniq_bp
         |      AND (b.tok_cnt > a.tok_cnt OR b.uniq_bp > a.uniq_bp)))
         |SELECT doc_id, tok_cnt, uniq_bp FROM sky ORDER BY doc_id""".stripMargin,

    // apportionment: pure integer Hamilton method — floor quotas by
    // BIGINT division, remainders ranked exactly
    "q149_apportion" ->
      s"""WITH s AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS tok
         |  FROM documents WHERE text IS NOT NULL GROUP BY source),
         |t AS (SELECT CAST(sum(tok) AS BIGINT) AS t_total FROM s),
         |q AS (SELECT source, tok,
         |  tok * $ApportionBudget // t_total AS base,
         |  (tok * $ApportionBudget) % t_total AS rem FROM s, t),
         |r AS (SELECT source, tok, base, rem,
         |  CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
         |  FROM q),
         |l AS (SELECT $ApportionBudget - CAST(sum(base) AS BIGINT) AS lv FROM q)
         |SELECT source, tok, CAST(base AS BIGINT) AS base,
         |  CAST(rem AS BIGINT) AS rem, rk,
         |  CAST(base + CASE WHEN rk <= lv THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM r, l ORDER BY source""".stripMargin,

    // Zipf: per-row micro-scaled ln, then exact BIGINT sufficient
    // statistics and the shared OLS text (q141 pattern)
    "q145_zipf" ->
      s"""WITH tt AS (SELECT source, unnest($toksSql) AS term FROM documents
         |  WHERE text IS NOT NULL),
         |tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
         |  FROM tt GROUP BY source, term),
         |rk AS (SELECT source, term, f,
         |  row_number() OVER (PARTITION BY source ORDER BY f DESC, term) AS r
         |  FROM tf),
         |xy AS (SELECT source,
         |  CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         |  CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
         |  FROM rk WHERE r <= $ZipfTopK),
         |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM xy GROUP BY source)
         |SELECT source, n,
         |  ${zipfFitSql.map { case (nm, e) => s"$e AS $nm" }.mkString(",\n  ")}
         |FROM s ORDER BY source""".stripMargin,

    // CDC: the oracle recomputes each boundary from the UNROLLED
    // 16-term window polynomial — mathematically the same integers
    // mod 1e9+7 as the engine's O(n) rolling kernel
    "q142_cdc_chunks" -> {
      import graft.text.CdcChunker
      val whTerms = (0 until CdcChunker.Window).map { k =>
        val off = CdcChunker.Window - 1 - k
        s"cs[i-$off]*CAST(${CdcChunker.Coef(k)} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH c AS (SELECT doc_id, text, ${codesSql()} AS cs,
         |  CAST(length(text) AS INT) AS n FROM documents
         |  WHERE text IS NOT NULL AND length(text) >= 1),
         |p AS (SELECT doc_id, unnest(range(${CdcChunker.Window}, n+1)) AS i
         |  FROM c WHERE n >= ${CdcChunker.Window}),
         |wh AS (SELECT p.doc_id, i, ($whTerms) % ${CdcChunker.Mod} AS h
         |  FROM p JOIN c USING (doc_id)),
         |b AS (SELECT doc_id, i FROM wh
         |  WHERE h % ${CdcChunker.BoundaryMod} = ${CdcChunker.BoundaryMod - 1}),
         |seg AS (SELECT doc_id,
         |  coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
         |  i AS e FROM b),
         |mb AS (SELECT doc_id, max(i) AS mi FROM b GROUP BY doc_id),
         |tail AS (SELECT c.doc_id, coalesce(mi, 0) + 1 AS s, n AS e
         |  FROM c LEFT JOIN mb USING (doc_id)),
         |allseg AS (SELECT * FROM seg UNION ALL
         |  SELECT doc_id, s, e FROM tail WHERE s <= e),
         |r AS (SELECT a.doc_id AS doc_id,
         |  row_number() OVER (PARTITION BY a.doc_id ORDER BY s) AS chunk_idx,
         |  CAST(s AS BIGINT) AS start_pos, CAST(e - s + 1 AS BIGINT) AS chunk_len,
         |  md5(substr(c2.text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS chunk_md5
         |  FROM allseg a JOIN c c2 USING (doc_id)),
         |cn AS (SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies
         |  FROM r GROUP BY chunk_md5)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, start_pos,
         |  chunk_len, r.chunk_md5 AS chunk_md5, n_copies
         |FROM r JOIN cn USING (chunk_md5) ORDER BY doc_id, chunk_idx""".stripMargin
    },

    // PQ: the generic (vec_id, m) sub-vector Lloyd pass + integer-
    // micro-unit ADC sum — the BIGINT sum is order-free, and every
    // float comparison is on a round(·,6) of a bit-identical fold
    "q139_pq_adc" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sub AS (SELECT vec_id, m, v[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS sv
         |        FROM e, range(0, $PqM) t(m)),
         |c0 AS (SELECT m, vec_id AS c_id, sv AS c_vec FROM sub WHERE vec_id < $PqK),
         |a1 AS (SELECT vec_id, m, sv, c_id AS list_id FROM (
         |  SELECT s.vec_id, s.m, s.sv, c.c_id,
         |    row_number() OVER (PARTITION BY s.vec_id, s.m
         |      ORDER BY round(${l2Sql("s.sv", "c.c_vec", PqSubDim)}, 6), c.c_id) AS crk
         |  FROM sub s JOIN c0 c USING (m)) WHERE crk = 1),
         |m1 AS (SELECT m, list_id, i, round(avg(sv[i]), 6) AS mu
         |  FROM a1, (SELECT unnest(range(1, ${PqSubDim + 1})) AS i) idx
         |  GROUP BY m, list_id, i),
         |c1 AS (SELECT m, list_id AS c_id, list(mu ORDER BY i) AS c_vec
         |  FROM m1 GROUP BY m, list_id),
         |codes AS (SELECT vec_id, m, c_id AS code FROM (
         |  SELECT s.vec_id, s.m, c.c_id,
         |    row_number() OVER (PARTITION BY s.vec_id, s.m
         |      ORDER BY round(${l2Sql("s.sv", "c.c_vec", PqSubDim)}, 6), c.c_id) AS crk
         |  FROM sub s JOIN c1 c USING (m)) WHERE crk = 1),
         |q AS (SELECT vec_id AS q_id, m, sv AS q_sv FROM sub WHERE vec_id < 10),
         |dt AS (SELECT q_id, q2.m, c.c_id,
         |  CAST(round(${l2Sql("q2.q_sv", "c.c_vec", PqSubDim)} * 1000000) AS BIGINT) AS d_us
         |  FROM q q2 JOIN c1 c USING (m)),
         |sc AS (SELECT q_id, vec_id, CAST(sum(d_us) AS BIGINT) AS adist_us
         |  FROM codes k JOIN dt ON dt.m = k.m AND dt.c_id = k.code
         |  GROUP BY q_id, vec_id),
         |r AS (SELECT q_id, vec_id, adist_us,
         |  row_number() OVER (PARTITION BY q_id ORDER BY adist_us, vec_id) AS rank
         |  FROM sc WHERE vec_id <> q_id)
         |SELECT q_id, rank, vec_id, adist_us FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    "q49_centroid_update" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id AS c_id, v AS c_vec FROM e WHERE vec_id < $KmeansK),
         |assign AS (SELECT vec_id, v, c_id AS list_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.v", "c.c_vec")} DESC, c.c_id) AS crk
         |  FROM e, c) WHERE crk = 1),
         |comps AS (SELECT list_id, i, avg(v[i]) AS m, count(*) AS cnt
         |  FROM assign, (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) idx
         |  GROUP BY list_id, i),
         |newc AS (SELECT list_id, max(cnt) AS n_assigned, list(m ORDER BY i) AS c_new
         |  FROM comps GROUP BY list_id)
         |SELECT n.list_id, n.n_assigned,
         |  round(${cosSql("n.c_new", "c.c_vec")}, 6) AS drift
         |FROM newc n JOIN c ON c.c_id = n.list_id
         |ORDER BY list_id""".stripMargin,

    "q28_frames" ->
      s"""WITH f AS (SELECT doc_id, text,
         |  unnest(range(0, least(${Multimodal.MaxFrames}, length(text) // ${Multimodal.FrameBytes}))) AS frame_idx,
         |  64 + (doc_id % 16) * 8 AS w, 64 + (doc_id % 9) * 8 AS h
         |  FROM documents)
         |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         |  md5(substr(text, CAST(frame_idx * ${Multimodal.FrameBytes} + 1 AS INT), ${Multimodal.FrameBytes})) AS frame_md5,
         |  CAST(greatest(1, w // 2) AS INT) AS width,
         |  CAST(greatest(1, h // 2) AS INT) AS height
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q27_multimodal" ->
      s"""SELECT doc_id,
         |  (['png','jpeg','wav'])[CAST(doc_id % 3 + 1 AS INT)] AS format,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST(${foldSumSql(codesSql())} AS DOUBLE) / CAST(length(text) AS DOUBLE) AS mean_byte,
         |  CAST(least(8, length(text) // 32) AS INT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin)
}
