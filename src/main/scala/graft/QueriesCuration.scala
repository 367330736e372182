package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.curation.Curation
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Corpus-curation battery: test-set decontamination, PII scrubbing,
  * sequence packing, stratified sampling — the training-data prep ops
  * a 100 TB pipeline runs after dedup. Oracle conventions follow
  * [[QueriesTraining]] (shared md5-hash and tokenizer recipes).
  */
object QueriesCuration {

  private type Q = (SparkSession, String) => DataFrame

  private val MinOverlap = 5

  /** Test-set decontamination: docs sharing ≥ 5 distinct trigram
    * shingles with the held-out eval slice (doc_id % 97 = 0) are
    * flagged. Eval shingles broadcast; one corpus shuffle on doc_id.
    */
  private val qDecontam: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    val eval_ = d.filter(col("doc_id") % 97 === 0)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    Curation.decontaminate(corpus, eval_, "doc_id", "text", MinOverlap)
      .orderBy("doc_id")
  }

  /** q85: q37's decontamination flags through the Bloom-prefilter
    * composition ([[Curation.decontaminateBloom]]): eval shingles →
    * Bloom sketch (constant, codegen `might_contain` prune on the
    * corpus explosion) → exact shuffle-join verify on survivors. The
    * output is bit-identical to the exact path — the oracle IS q37's
    * SQL — what changes is the 100 TB shape: no string broadcast, the
    * join input is ~fpp of the corpus shingles.
    */
  private val qDecontamBloom: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    val eval_ = d.filter(col("doc_id") % 97 === 0)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    Curation.decontaminateBloom(corpus, eval_, "doc_id", "text", MinOverlap)
      .orderBy("doc_id")
  }

  private val KeepQuality = 0.5

  /** END-TO-END curation keep set — the composition a training-data
    * user actually runs, in one call: quality score ≥ [[KeepQuality]]
    * ∧ detected language = en ∧ exact-dedup canonical (fingerprint
    * group minimum) ∧ decontaminated (< [[MinOverlap]] shingles shared
    * with the eval slice). One scored projection feeds the quality /
    * language / fingerprint rules (single corpus pass); the canonical
    * and clean sets semi-join back on doc_id. The quality threshold
    * compares the ROUNDED score so the cut is engine-stable.
    */
  /** The shared curation stage frames: (scored, canonical, clean).
    * `scored` is eagerly materialized — it feeds the quality/language
    * filters AND the canonical fingerprint groupBy (and in q75 five
    * stage subtrees), so the tokenize+score pass runs once per
    * invocation, not once per consumer.
    */
  private def curationFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val eval_ = d.filter(col("doc_id") % 97 === 0)
    val scored = Dedup.materialize(
      Dedup.fanOut(corpus, col("doc_id")).select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp")))
    val canonical = scored.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val clean = Curation.decontaminate(corpus, eval_, "doc_id", "text", MinOverlap)
      .filter(col("contaminated") === 0).select("doc_id")
    (scored, canonical, clean)
  }

  private val qCurationKeep: Q = (spark, dir) => {
    val (scored, canonical, clean) = curationFrames(spark, dir)
    scored.filter(col("quality") >= KeepQuality && col("lang_pred") === "en")
      .join(canonical, "doc_id")
      .join(clean, "doc_id")
      .select(col("doc_id"), col("quality"))
      .orderBy("doc_id")
  }

  /** q75: the curation FUNNEL — how many documents (and which: id
    * checksums) survive each successive stage of q57's keep-set
    * composition. The observability view a pipeline owner actually
    * watches: stage-over-stage attrition localizes which rule ate the
    * corpus. Stage sets are nested by construction, so counts are
    * monotone non-increasing.
    */
  private val qCurationFunnel: Q = (spark, dir) => {
    val (scored, canonical, clean) = curationFrames(spark, dir)
    val s1 = scored.select("doc_id")
    val s2 = scored.filter(col("quality") >= KeepQuality).select("doc_id")
    val s3 = scored.filter(col("quality") >= KeepQuality && col("lang_pred") === "en")
      .select("doc_id")
    val s4 = s3.join(canonical, "doc_id")
    val s5 = s4.join(clean, "doc_id")
    def stage(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"), sum("doc_id").as("id_checksum"))
        .select(lit(label).as("stage"), col("n"), col("id_checksum"))
    stage("1_total", s1)
      .unionAll(stage("2_quality", s2))
      .unionAll(stage("3_lang", s3))
      .unionAll(stage("4_canonical", s4))
      .unionAll(stage("5_clean", s5))
      .orderBy("stage")
  }

  /** PII scrubbing: emails / IPv4s / 8+-digit runs redacted, per-kind
    * match counts on the raw text. The corpus has no natural PII, so a
    * deterministic synthesizer plants one of each on id-keyed slices.
    */
  private val qPiiScrub: Q = (spark, dir) => {
    val raw = Tables(spark, dir, "documents").select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" src 10.0."), (col("doc_id") % 256).cast("string"), lit(".17")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" acct 4111"), lpad((col("doc_id") % 10000).cast("string"), 8, "0")))
        .otherwise(lit(""))).as("raw"))
    raw.select(col("doc_id"),
        Curation.countMatches(col("raw"), Curation.EmailRe).as("n_email"),
        Curation.countMatches(col("raw"), Curation.Ipv4Re).as("n_ip"),
        Curation.countMatches(col("raw"), Curation.LongNumRe).as("n_num"),
        Curation.scrubPii(col("raw")).as("clean"))
      .orderBy("doc_id")
  }

  private val PackBudget = 512

  /** Sequence packing: concatenate docs in id order within hash
    * shards, record each doc's start offset and context-window bin.
    * Shard count derived from corpus rows ([[ScaleParams.packShards]]).
    */
  private val qSeqPack: Q = (spark, dir) => {
    val shards = ScaleParams.packShards(
      ScaleParams.tableRows(spark, dir, "documents"))
    Curation.packSequences(Tables(spark, dir, "documents"),
        "doc_id", "text", PackBudget, shards)
      .orderBy("doc_id")
  }

  private val SampleRatesBp = Map("en" -> 3000, "de" -> 7000)
  private val SampleDefaultBp = 10000

  /** Stratified sampling for data mixing: downsample en to 30%, de to
    * 70%, keep other languages whole — deterministic hash-mod gate.
    */
  private val qStratified: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    d.filter(Curation.stratifiedKeep(col("doc_id"), col("lang"),
        SampleRatesBp, SampleDefaultBp))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  private val ReservoirK = 50
  private val ReservoirFudge = 4.0

  /** q81: deterministic FIXED-SIZE per-stratum sample (the balanced-
    * subset op q40's rate gate can't express — "exactly k docs per
    * language"). Priority = salted portable hash; the k smallest
    * priorities per stratum ARE the sample (hash-priority reservoir —
    * equivalent to a uniform draw, reproducible across engines and
    * runs).
    *
    * Scale shape: ranking a whole stratum would sort the largest
    * stratum end-to-end, so candidates are PRE-PRUNED by a per-stratum
    * basis-point threshold derived from the stratum count
    * (fudge × k / nₛ — candidates ≈ fudge·k per stratum regardless of
    * stratum size), and only the ~4k survivors reach the window rank.
    * The threshold derivation is deterministic from counts, so the
    * oracle replays it exactly: both engines agree even in the
    * (astronomically unlikely) under-sampled tail.
    */
  private val qReservoir: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir, "documents").select(
      col("doc_id"), col("lang"),
      Dedup.hash32(col("doc_id").cast("string"), "res").as("pri"))
    val ns = d.groupBy("lang").agg(count(lit(1)).as("ns"))
    val w = Window.partitionBy("lang").orderBy("pri", "doc_id")
    d.join(broadcast(ns), "lang")
      .filter(col("pri") % 10000 <
        least(lit(10000L),
          ceil(lit(ReservoirFudge * ReservoirK * 10000) / col("ns")).cast("long")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= ReservoirK)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  /** Gopher-style repetition quality over the corpus. */
  private val qRepQuality: Q = (spark, dir) => {
    Curation.repetitionMetrics(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  private val BlockWords = 8

  /** C4-style cross-doc block dedup. The corpus has no natural
    * cross-doc block duplicates at small SF, so the input is
    * documents ∪ an id-shifted copy (same trick as q20_dedup_exact):
    * every copy block is a duplicate of its original, so kept_ratio
    * must be 1.0 for originals and 0.0 for the shifted ids.
    */
  private val qBlockDedup: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val dup = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    Curation.blockDedupStats(dup, "doc_id", "text", BlockWords)
      .orderBy("doc_id")
  }

  private val WSampleK = 100

  /** q90: deterministic WEIGHTED sample without replacement
    * (Efraimidis–Spirakis exponential keys): doc i gets priority
    * −ln(u_i)/w_i from a salted-md5 uniform u_i and weight w_i =
    * n_chars; the k smallest priorities are exactly a weighted draw
    * without replacement. The weighted complement of q81's uniform
    * per-stratum reservoir (and q48's rate-based temperature gate —
    * this one is EXACTLY k docs, weight-proportional).
    *
    * Scale shape: priorities are a pure row function (no shuffle);
    * the k smallest ride a TakeOrdered partial top-k, never a global
    * sort. Priorities round to 12 decimals on both engines before
    * ranking (ties broken by doc_id) so the selection can't straddle
    * a 1-ulp libm difference in ln.
    */
  private val qWeightedSample: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    val u = (Dedup.hash32(col("doc_id").cast("string"), "wsample") + lit(0.5)) /
      lit(4294967296.0)
    d.select(col("doc_id"), col("n_chars"),
        round(log(lit(1.0) / u) / col("n_chars"), 12).as("pri"))
      .orderBy(col("pri"), col("doc_id"))
      .limit(WSampleK)
  }

  private val MixTargetBp = 2500

  /** Temperature-based mixture sampling: sqrt-weight the sources
    * (T=2), solve per-source keep rates for a 25% overall target, and
    * report the realized hash-gate sample per source.
    */
  private val qMixture: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
    val rates = Curation.temperatureRates(d, "source", MixTargetBp)
    val kept = d
      .join(broadcast(rates.select(col("source"), col("bp"))), "source")
      .filter(Dedup.hash32(col("doc_id").cast("string"), "mix") % 10000 < col("bp"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy("source")
  }

  /** q94: per-domain document cap — at most [[DomainCap]] docs kept
    * per source, chosen by salted-hash rank (deterministic, unbiased
    * within the domain). The standard web-curation guard against any
    * single domain dominating the training mixture — the hard-cap
    * complement of q48's proportional temperature sampling. Scale
    * shape: one shuffle on source for the partitioned rank window;
    * per-domain state is the running count, and the cap bounds output
    * per group no matter how skewed the domain sizes are. (A
    * pathologically hot single domain would skew the window shuffle
    * itself — that domain's rows all land on one partition; cap
    * selection can then ride the salted-hash bucket trick q7 uses, at
    * the price of an extra pre-aggregation. Not needed while domains
    * stay below partition-size scale.)
    */
  private val DomainCap = 15
  private val qDomainCap: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(Dedup.hash32(col("doc_id").cast("string"), "cap"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= DomainCap)
      .orderBy("source", "rk")
  }

  /** q106: URL CANONICALIZATION ([[graft.text.UrlCanon]]) — collapse
    * the surface variants a crawler actually sees (case-mangled
    * scheme/host, explicit default port, trailing slash, unsorted
    * query params, fragments) onto one canonical key, then the
    * per-canonical-URL rollup that key exists for: hit count, distinct
    * raw variants collapsed, distinct users. Without this step,
    * per-URL dedup and per-domain caps (q94) fracture across cosmetic
    * variants and under-count every page.
    *
    * The messy URLs are synthesized deterministically from events rows
    * (every canonicalization rule is exercised: 2 schemes × 4
    * host:port spellings × optional trailing slash × 2 param orders ×
    * optional fragment), so the DuckDB oracle rebuilds the identical
    * input and applies the identical rule chain — both sides pure
    * codegen string/array functions in the Java∩RE2 regex subset.
    * Scale: narrow per-row projection, one hash aggregation on the
    * canonical key; the multi-distinct plans as Expand(×2).
    */
  private val qUrlCanon: Q = (spark, dir) => {
    import graft.text.UrlCanon
    // single-split local parquet serializes the per-row regex chain —
    // fan out BEFORE the synth+canonicalize projection (q35 precedent)
    val ev = Dedup.fanOut(Tables.events(spark, dir), col("event_id"))
    val raw = concat(
      when(col("event_id") % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"),
      when(col("event_id") % 4 === 0, lit("Example.COM:443"))
        .when(col("event_id") % 4 === 1, lit("example.com"))
        .when(col("event_id") % 4 === 2, lit("EXAMPLE.com:8443"))
        .otherwise(lit("example.com:443")),
      lit("/"), col("event_type"),
      when(col("event_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("event_id") % 2 === 0,
        concat(lit("?a="), (col("user_id") % 10).cast("string"),
          lit("&b="), (col("user_id") % 7).cast("string")))
        .otherwise(concat(lit("?b="), (col("user_id") % 7).cast("string"),
          lit("&a="), (col("user_id") % 10).cast("string"))),
      when(col("event_id") % 7 === 0, lit("#s")).otherwise(lit("")))
    ev.select(col("user_id"), raw.as("u"))
      .select(col("user_id"), col("u"), UrlCanon.canonicalize(col("u")).as("url"))
      .groupBy("url")
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("u")).as("n_variants"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("url")
  }

  private val TempCap = 40L

  /** q111: TEMPERATURE-BALANCED DOMAIN DOWNSAMPLING — the α = 0.5
    * corpus-rebalancing rule multilingual/multi-source training mixes
    * use (mT5-style): source s keeps each doc with probability
    * min(1, (cap/n_s)^α), flattening over-represented domains while
    * touching small ones not at all. Fully deterministic and exactly
    * integer on both engines: the keep threshold is
    * `least(10⁴, floor(sqrt((10⁸·cap) div n_s)))` — integer division
    * first, then sqrt of an exactly-representable integer (correctly
    * rounded, and exact on perfect squares, so the floor never sits on
    * a ULP boundary) — and membership is the battery's salted-md5 hash
    * of doc_id against that threshold in basis points of 2⁻¹⁰⁰⁰⁰ⁱˢʰ…
    * of 10⁴. Contrast q94 (hard per-domain CAP by ranked hash): caps
    * truncate, temperature FLATTENS — both are deterministic set
    * selections any retry reproduces.
    *
    * Scale: per-source counts are one tiny aggregate broadcast back;
    * membership is a narrow per-row codegen predicate — no shuffle of
    * the corpus at all beyond the count.
    */
  private val qTempSample: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("source"))
    val counts = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("thr_bp",
        least(lit(10000L),
          floor(sqrt(expr(s"CAST(${100000000L * TempCap} div n_docs AS DOUBLE)")))
            .cast("long")))
    d.join(broadcast(counts), "source")
      .withColumn("kept",
        when(Dedup.hash32(col("doc_id").cast("string"), "tsamp") % 10000 < col("thr_bp"), 1L)
          .otherwise(0L))
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), max(col("thr_bp")).as("thr_bp"),
        sum(col("kept")).as("n_kept"))
      .orderBy("source")
  }

  /** Power-of-two caps enumerated to 2^20 — shared by the Spark and
    * oracle sides so the bucket edges are the SAME integers (a float
    * `2^ceil(log2 n)` can land on either side of an exact power of
    * two depending on the engine's log; an enumerated CASE cannot).
    */
  private val PadCaps: Seq[Long] = (0 to 20).map(1L << _)

  /** q129: sequence-length bucketing / padding-waste audit — the batch
    * -efficiency measurement behind bucketed batching (length-sorted
    * batches are how training pipelines avoid padding short sequences
    * to the global max): docs bucket to the smallest power-of-two cap
    * ≥ their token count, and each bucket reports its doc count, token
    * mass, absolute pad waste (n·cap − Σtokens), and waste in integer
    * basis points. ONE aggregation over the corpus, all-integer math;
    * compare Σ per-bucket waste against padding everything to the top
    * bucket to see the win bucketing buys.
    */
  private val qPadBuckets: Q = (spark, dir) => {
    // a doc beyond the top cap gets a NULL bucket on BOTH engines
    // (and a NULL waste row — visible, not silently mis-binned); the
    // oracle pins NULLS FIRST to match Spark's ASC default
    val caps = PadCaps.foldRight(lit(null).cast("long")) { (cap, rest) =>
      when(col("n_tokens") <= cap, lit(cap)).otherwise(rest)
    }
    Dedup.fanOut(Tables(spark, dir, "documents"), col("doc_id"))
      .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bucket_cap", caps)
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_waste", col("bucket_cap") * col("n_docs") - col("sum_tokens"))
      .withColumn("waste_bp",
        expr("(pad_waste * 10000) div (bucket_cap * n_docs)"))
      .select("bucket_cap", "n_docs", "sum_tokens", "pad_waste", "waste_bp")
      .orderBy("bucket_cap")
  }

  val all: Map[String, Q] = Map(
    "q129_pad_buckets" -> qPadBuckets,
    "q106_url_canon" -> qUrlCanon,
    "q111_temp_sample" -> qTempSample,
    "q94_domain_cap" -> qDomainCap,
    "q57_curation_keep" -> qCurationKeep,
    "q75_curation_funnel" -> qCurationFunnel,
    "q37_decontam" -> qDecontam,
    "q85_decontam_bloom" -> qDecontamBloom,
    "q38_pii_scrub" -> qPiiScrub,
    "q39_seq_pack" -> qSeqPack,
    "q40_stratified" -> qStratified,
    "q81_reservoir" -> qReservoir,
    "q44_rep_quality" -> qRepQuality,
    "q45_block_dedup" -> qBlockDedup,
    "q48_mixture" -> qMixture,
    "q90_weighted_sample" -> qWeightedSample)

  // -------------------------------------------------- oracle generation

  private val hashIdSql =
    """('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"""
  private def saltedHashIdSql(salt: String) =
    s"""('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"""

  /** Shared CTE chain for the q57/q75 curation composition: yields
    * `corpus` (doc_id, text), `q` (doc_id, quality, lang_pred),
    * `canon` and `clean` (surviving doc_ids).
    */
  private lazy val curationCtes =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
       |t AS (SELECT doc_id, text, ${QueriesTraining.ltoksSql} AS ltoks FROM corpus),
       |h AS (SELECT doc_id, text, ltoks,
       |  ${TextAnalysis.stopwords.map { case (l, ws) => s"${QueriesTraining.hitsSql(ws)} AS s_$l" }.mkString(",\n  ")}
       |  FROM t),
       |q AS (SELECT doc_id,
       |  round(0.4*least(1.0, CAST(len(ltoks) AS DOUBLE)/100.0)
       |    + 0.3*(1.0 - least(1.0, CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 4.0))
       |    + 0.3*least(1.0, CAST(s_en AS DOUBLE) / CAST(len(ltoks) AS DOUBLE) * 4.0), 6) AS quality,
       |  ${QueriesTraining.langCaseSql} AS lang_pred
       |  FROM h),
       |canon AS (SELECT min(doc_id) AS doc_id FROM
       |  (SELECT doc_id, md5(${QueriesTraining.normTextSql}) AS fp FROM corpus)
       |  GROUP BY fp),
       |toksAll AS (SELECT doc_id, ${QueriesTraining.toksSql} AS t FROM documents),
       |sh AS (SELECT doc_id, ${QueriesTraining.shinglesSql} AS s FROM toksAll),
       |ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0),
       |cs AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0),
       |ov AS (SELECT doc_id, count(DISTINCT shingle) AS overlap
       |       FROM cs JOIN ev USING (shingle) GROUP BY doc_id),
       |clean AS (SELECT c.doc_id FROM corpus c LEFT JOIN ov USING (doc_id)
       |          WHERE coalesce(ov.overlap, 0) < $MinOverlap)""".stripMargin

  private lazy val decontamSql =
    s"""WITH toks AS (SELECT doc_id, ${QueriesTraining.toksSql} AS t FROM documents),
       |sh AS (SELECT doc_id, ${QueriesTraining.shinglesSql} AS s FROM toks),
       |ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0),
       |cs AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0),
       |ov AS (SELECT doc_id, count(DISTINCT shingle) AS overlap
       |       FROM cs JOIN ev USING (shingle) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(o.overlap, CAST(0 AS BIGINT)) AS overlap,
       |  CASE WHEN coalesce(o.overlap, 0) >= $MinOverlap THEN 1 ELSE 0 END AS contaminated
       |FROM documents d LEFT JOIN ov o USING (doc_id)
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // bucket edges from the SAME enumerated power-of-two list; all
    // integer math, `//` = Spark's `div` on non-negative longs
    "q129_pad_buckets" -> {
      val capCase = "CASE " + PadCaps.map(c =>
        s"WHEN n_tokens <= $c THEN CAST($c AS BIGINT)").mkString(" ") + " END"
      s"""WITH t AS (SELECT CAST(len(${QueriesTraining.toksSql}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT $capCase AS bucket_cap, n_tokens FROM t),
         |a AS (SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens FROM b GROUP BY bucket_cap)
         |SELECT bucket_cap, n_docs, sum_tokens,
         |  bucket_cap * n_docs - sum_tokens AS pad_waste,
         |  ((bucket_cap * n_docs - sum_tokens) * 10000) // (bucket_cap * n_docs) AS waste_bp
         |FROM a ORDER BY bucket_cap NULLS FIRST""".stripMargin
    },
    "q111_temp_sample" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY source),
         |t AS (SELECT source, n_docs,
         |  least(CAST(10000 AS BIGINT), CAST(floor(sqrt(
         |    CAST(${100000000L * TempCap} // n_docs AS DOUBLE))) AS BIGINT)) AS thr_bp
         |  FROM c),
         |k AS (SELECT d.source, t.n_docs, t.thr_bp,
         |  CASE WHEN ${saltedHashIdSql("tsamp")} % 10000 < t.thr_bp
         |       THEN 1 ELSE 0 END AS kept
         |  FROM documents d JOIN t ON t.source = d.source)
         |SELECT source, max(n_docs) AS n_docs, max(thr_bp) AS thr_bp,
         |  CAST(sum(kept) AS BIGINT) AS n_kept
         |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q106_url_canon" ->
      """WITH r AS (SELECT user_id,
        |  (CASE WHEN event_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
        |  || '://'
        |  || (CASE WHEN event_id % 4 = 0 THEN 'Example.COM:443'
        |           WHEN event_id % 4 = 1 THEN 'example.com'
        |           WHEN event_id % 4 = 2 THEN 'EXAMPLE.com:8443'
        |           ELSE 'example.com:443' END)
        |  || '/' || event_type
        |  || (CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END)
        |  || (CASE WHEN event_id % 2 = 0
        |        THEN '?a=' || CAST(user_id % 10 AS VARCHAR)
        |          || '&b=' || CAST(user_id % 7 AS VARCHAR)
        |        ELSE '?b=' || CAST(user_id % 7 AS VARCHAR)
        |          || '&a=' || CAST(user_id % 10 AS VARCHAR) END)
        |  || (CASE WHEN event_id % 7 = 0 THEN '#s' ELSE '' END) AS u
        |  FROM events),
        |c AS (SELECT user_id, u,
        |  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
        |  regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hp,
        |  regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        |  regexp_extract(u, '\?([^#]*)', 1) AS qry
        |  FROM r),
        |n AS (SELECT user_id, u, sch,
        |  lower(regexp_extract(hp, '^([^:]*)', 1)) AS hst,
        |  regexp_extract(hp, ':([0-9]+)$', 1) AS prt,
        |  CASE WHEN regexp_replace(pth, '/+$', '', 'g') = '' THEN '/'
        |       ELSE regexp_replace(pth, '/+$', '', 'g') END AS cpath,
        |  array_to_string(list_sort(list_filter(string_split(qry, '&'),
        |    x -> x <> '')), '&') AS sq
        |  FROM c),
        |k AS (SELECT user_id, u,
        |  sch || '://' || hst
        |  || (CASE WHEN prt = '' THEN ''
        |           WHEN sch = 'http' AND prt = '80' THEN ''
        |           WHEN sch = 'https' AND prt = '443' THEN ''
        |           ELSE ':' || prt END)
        |  || cpath
        |  || (CASE WHEN sq = '' THEN '' ELSE '?' || sq END) AS url
        |  FROM n)
        |SELECT url, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(count(DISTINCT u) AS BIGINT) AS n_variants,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM k GROUP BY url ORDER BY url""".stripMargin,

    "q94_domain_cap" ->
      s"""WITH r AS (SELECT source, doc_id,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY ${saltedHashIdSql("cap")}, doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |SELECT source, doc_id, rk FROM r WHERE rk <= $DomainCap
         |ORDER BY source, rk""".stripMargin,

    "q90_weighted_sample" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
         |  (${saltedHashIdSql("wsample")} + 0.5) / 4294967296.0 AS u
         |  FROM documents)
         |SELECT doc_id, n_chars, round(ln(1.0 / u) / n_chars, 12) AS pri
         |FROM h ORDER BY pri, doc_id LIMIT $WSampleK""".stripMargin,

    "q57_curation_keep" ->
      s"""$curationCtes
         |SELECT q.doc_id, q.quality
         |FROM q JOIN canon USING (doc_id) JOIN clean USING (doc_id)
         |WHERE q.quality >= $KeepQuality AND q.lang_pred = 'en'
         |ORDER BY doc_id""".stripMargin,

    "q75_curation_funnel" ->
      s"""$curationCtes,
         |s3 AS (SELECT doc_id FROM q
         |       WHERE quality >= $KeepQuality AND lang_pred = 'en'),
         |s4 AS (SELECT s3.doc_id FROM s3 JOIN canon USING (doc_id)),
         |s5 AS (SELECT s4.doc_id FROM s4 JOIN clean USING (doc_id)),
         |u AS (
         |  SELECT '1_total' AS stage, count(*) AS n,
         |    CAST(sum(doc_id) AS BIGINT) AS id_checksum FROM corpus
         |  UNION ALL SELECT '2_quality', count(*), CAST(sum(doc_id) AS BIGINT)
         |    FROM q WHERE quality >= $KeepQuality
         |  UNION ALL SELECT '3_lang', count(*), CAST(sum(doc_id) AS BIGINT) FROM s3
         |  UNION ALL SELECT '4_canonical', count(*), CAST(sum(doc_id) AS BIGINT) FROM s4
         |  UNION ALL SELECT '5_clean', count(*), CAST(sum(doc_id) AS BIGINT) FROM s5)
         |SELECT stage, n, id_checksum FROM u ORDER BY stage""".stripMargin,

    "q37_decontam" -> decontamSql,

    // the Bloom prefilter is result-transparent: q85 shares q37's oracle
    "q85_decontam_bloom" -> decontamSql,

    "q38_pii_scrub" -> {
      // DuckDB single-quoted strings don't process backslash escapes,
      // so the Java regex strings embed verbatim
      val email = Curation.EmailRe
      val ip = Curation.Ipv4Re
      val num = Curation.LongNumRe
      s"""WITH raw AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0
         |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' src 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' acct 4111' || lpad(CAST(doc_id % 10000 AS VARCHAR), 8, '0') ELSE '' END AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(raw, '$email')) AS n_email,
         |  len(regexp_extract_all(raw, '$ip')) AS n_ip,
         |  len(regexp_extract_all(raw, '$num')) AS n_num,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    raw, '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$num', '<NUM>', 'g') AS clean
         |FROM raw ORDER BY doc_id""".stripMargin
    },

    "q39_seq_pack" ->
      s"""WITH p AS (SELECT ${ScaleParams.packShardsSql} AS shards FROM documents),
         |t AS (
         |  SELECT doc_id,
         |    CAST(len(${QueriesTraining.toksSql}) AS BIGINT) AS tok_count,
         |    $hashIdSql % (SELECT shards FROM p) AS shard
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, tok_count, shard,
         |    coalesce(CAST(sum(tok_count) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), CAST(0 AS BIGINT)) AS "offset"
         |  FROM t)
         |SELECT doc_id, tok_count, shard, "offset", "offset" // $PackBudget AS bin
         |FROM o ORDER BY doc_id""".stripMargin,

    "q40_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${saltedHashIdSql("strat")} % 10000 <
         |  CASE lang WHEN 'en' THEN ${SampleRatesBp("en")}
         |            WHEN 'de' THEN ${SampleRatesBp("de")}
         |            ELSE $SampleDefaultBp END
         |ORDER BY doc_id""".stripMargin,

    "q81_reservoir" ->
      s"""WITH d AS (SELECT doc_id, lang, ${saltedHashIdSql("res")} AS pri
         |           FROM documents),
         |n AS (SELECT lang, count(*) AS ns FROM d GROUP BY lang),
         |c AS (SELECT d.doc_id, d.lang, d.pri FROM d JOIN n USING (lang)
         |      WHERE d.pri % 10000 < LEAST(10000,
         |        CAST(ceil($ReservoirFudge * $ReservoirK * 10000 / ns) AS BIGINT))),
         |r AS (SELECT lang, doc_id, pri,
         |        row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rk
         |      FROM c)
         |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
         |FROM r WHERE rk <= $ReservoirK ORDER BY lang, rk""".stripMargin,

    "q44_rep_quality" ->
      s"""WITH toks AS (SELECT doc_id, ${QueriesTraining.toksSql} AS t FROM documents),
         |g AS (
         |  SELECT doc_id, 1 AS n, unnest(t) AS g FROM toks
         |  UNION ALL SELECT doc_id, 2,
         |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
         |    FROM toks WHERE len(t) >= 2
         |  UNION ALL SELECT doc_id, 3,
         |    unnest(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |    FROM toks WHERE len(t) >= 3),
         |c AS (SELECT doc_id, n, g, count(*) AS cnt FROM g GROUP BY doc_id, n, g),
         |m AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS n_toks,
         |  CAST(sum(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS n_distinct,
         |  max(CASE WHEN n = 2 THEN cnt END) AS top2,
         |  CAST(sum(CASE WHEN n = 2 THEN cnt END) AS BIGINT) AS tot2,
         |  CAST(sum(CASE WHEN n = 3 AND cnt > 1 THEN cnt END) AS BIGINT) AS dup3,
         |  CAST(sum(CASE WHEN n = 3 THEN cnt END) AS BIGINT) AS tot3
         |  FROM c GROUP BY doc_id),
         |r AS (SELECT doc_id, n_toks,
         |  round(CAST(n_distinct AS DOUBLE) / n_toks, 6) AS distinct_ratio,
         |  round(coalesce(CAST(top2 AS DOUBLE) / tot2, 0.0), 6) AS top_bigram_frac,
         |  round(coalesce(CAST(coalesce(dup3, 0) AS DOUBLE) / tot3, 0.0), 6) AS dup_trigram_frac
         |  FROM m)
         |SELECT doc_id, n_toks, distinct_ratio, top_bigram_frac, dup_trigram_frac,
         |  CASE WHEN distinct_ratio < 0.2 OR top_bigram_frac > 0.18
         |       OR dup_trigram_frac > 0.3 THEN 1 ELSE 0 END AS flagged
         |FROM r ORDER BY doc_id""".stripMargin,

    "q45_block_dedup" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |toks AS (SELECT doc_id, ${QueriesTraining.toksSql} AS t FROM base),
         |b AS (SELECT doc_id,
         |  unnest(range(0, CAST(ceil(len(t) / $BlockWords.0) AS BIGINT))) AS block_idx, t
         |  FROM toks),
         |blk AS (SELECT doc_id, block_idx,
         |  array_to_string(t[block_idx * $BlockWords + 1 : block_idx * $BlockWords + $BlockWords], ' ') AS block
         |  FROM b),
         |r AS (SELECT doc_id,
         |  row_number() OVER (PARTITION BY md5(block) ORDER BY doc_id, block_idx) AS rn
         |  FROM blk)
         |SELECT doc_id, count(*) AS total_blocks,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_blocks,
         |  round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_ratio
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q48_mixture" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs,
         |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE) * 1000000)) AS BIGINT) AS w FROM c),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(n_docs) AS BIGINT) AS n_total FROM w),
         |r AS (SELECT source, n_docs, w,
         |  least(10000, CAST(floor(
         |    CAST((n_total * $MixTargetBp) // 10000 AS DOUBLE) * w / sum_w / n_docs * 10000
         |  ) AS BIGINT)) AS bp
         |  FROM w, t),
         |k AS (SELECT d.source, count(*) AS n_kept
         |  FROM documents d JOIN r USING (source)
         |  WHERE ${saltedHashIdSql("mix")} % 10000 < bp
         |  GROUP BY d.source)
         |SELECT r.source, r.n_docs, r.w, r.bp,
         |  coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
         |FROM r LEFT JOIN k USING (source) ORDER BY source""".stripMargin)
}
