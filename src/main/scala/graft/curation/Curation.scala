package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Training-corpus curation operators beyond dedup/ANN: test-set
  * decontamination, PII scrubbing, sequence packing, and deterministic
  * stratified sampling. Like [[graft.text.TextAnalysis]], everything
  * is codegen'd built-ins (no UDFs) and every formula has an exact
  * DuckDB twin (see [[graft.QueriesCuration]]).
  */
object Curation {

  // ------------------------------------------------- decontamination

  /** Flags corpus documents that share ≥ `minOverlap` distinct n-gram
    * shingles with a held-out evaluation set — the standard guard
    * against benchmark leakage into training data.
    *
    * Scale shape: the eval set is benchmark-sized (thousands of docs),
    * so its DISTINCT shingle set broadcasts; the corpus explodes to
    * (doc, shingle) rows, hash-joins the broadcast (skew-immune — no
    * shuffle keyed on popular shingles), and aggregates
    * `count(distinct shingle)` per doc with map-side partial
    * aggregation. One corpus shuffle, keyed on doc id.
    *
    * Returns every corpus row: (idCol, overlap, contaminated 0/1) —
    * zero-overlap docs included (left join), so the output is a
    * keep/drop decision column for the whole corpus.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, minOverlap: Int): DataFrame = {
    val evalShingles = broadcast(
      Dedup.shingleTable(evalSet, idCol, textCol)
        .select(explode_outer(col("sh")).as("shingle")).distinct())
    val overlaps = Dedup.shingleTable(corpus, idCol, textCol)
      .select(col(idCol), explode_outer(col("sh")).as("shingle"))
      .join(evalShingles, "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("overlap"))
    corpus.select(col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("contaminated",
        when(col("overlap") >= minOverlap, lit(1)).otherwise(lit(0)))
  }

  /** [[decontaminate]]'s 100 TB form — identical output, composed the
    * way a run whose eval shingle set does NOT fit in broadcast memory
    * must be. The eval shingles collapse to a Bloom sketch (Spark's own
    * runtime-filter machinery: `BloomFilterAggregate` over `xxhash64`,
    * built with one map-side-combined aggregation pass) that ships to
    * executors as a ~1.2 bytes/key constant inside a codegen'd
    * `BloomFilterMightContain` predicate. That predicate prunes the
    * corpus shingle explosion BEFORE any join — at ~1% fpp it drops
    * ~99% of non-contaminated shingles inside the scan stage — and the
    * exact join then runs as an ordinary shuffle join on the survivors
    * only, so NEITHER side is ever broadcast as strings. False
    * positives die in the exact join; false negatives are impossible:
    * the result is bit-identical to [[decontaminate]] and shares its
    * oracle (q85 vs q37).
    *
    * Sizing: ~10 bits/key ⇒ ~1% fpp. Spark clamps the sketch at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (4M keys / 8 MB default) — on a real cluster raise those confs
    * with the eval-set cardinality; fpp degrades gracefully (the exact
    * verify keeps correctness, only the prune selectivity suffers).
    */
  /** Bloom sketch of a string column, ~10 bits/key (≈1% fpp), built
    * with Spark's runtime-filter aggregate (map-side partial merge —
    * the sketch, not the strings, rides the final reduce).
    */
  def bloomSketch(keys: DataFrame, keyCol: String, nKeys: Long): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val n = math.max(nKeys, 1L)
    keys.agg(Bridge.column(
      new BloomFilterAggregate(new XxHash64(Seq(Bridge.expression(col(keyCol)))),
        Literal(n), Literal(n * 10))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen membership predicate against a [[bloomSketch]] constant. */
  def bloomMightContain(sketch: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.BinaryType
    Bridge.column(new BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      new XxHash64(Seq(Bridge.expression(c)))))
  }

  def decontaminateBloom(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                         textCol: String, minOverlap: Int): DataFrame = {
    // small side materialized once: it feeds the count, the sketch
    // build, and the exact verify join
    val evalShingles = Dedup.materialize(
      Dedup.shingleTable(evalSet, idCol, textCol)
        .select(explode_outer(col("sh")).as("shingle")).distinct())
    val sketch = bloomSketch(evalShingles, "shingle", evalShingles.count())

    val overlaps = Dedup.shingleTable(corpus, idCol, textCol)
      .select(col(idCol), explode_outer(col("sh")).as("shingle"))
      .filter(bloomMightContain(sketch, col("shingle"))) // codegen prune, pre-shuffle
      .join(evalShingles, "shingle") // exact verify: shuffle join, no broadcast
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("overlap"))
    corpus.select(col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("contaminated",
        when(col("overlap") >= minOverlap, lit(1)).otherwise(lit(0)))
  }

  // ---------------------------------------------------- PII scrubbing

  /** Redaction patterns — deliberately in the regex subset shared by
    * Java (Spark codegen) and RE2 (DuckDB): no backreferences, no
    * lookaround.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\b\\d{8,}\\b"

  /** Replaces emails → `<EMAIL>`, IPv4s → `<IP>`, then 8+-digit runs →
    * `<NUM>` (that order: addresses and dotted quads must be consumed
    * before the bare digit-run pattern sees the text), and counts each
    * pattern's matches on the ORIGINAL text. Purely per-row — linear
    * scan at any scale, stays inside WholeStageCodegen.
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, LongNumRe, "<NUM>")
  }

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  // -------------------------------------------------- sequence packing

  /** Assigns each document the fixed-size context window (bin) its
    * START lands in when documents are concatenated in id order —
    * exactly how LLM training data is packed (documents straddle
    * window boundaries; the bin records where the doc begins).
    *
    * A single global running sum would serialize to one partition, so
    * packing is SHARDED: `hash(id) % numShards` routes docs to
    * independent packers and the running sum windows per shard — the
    * same topology a 1000-executor packer uses. Returns
    * (idCol, tok_count, shard, offset, bin): `offset` = tokens before
    * this doc within its shard, `bin` = offset / budgetTokens.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Int, numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("tok_count"),
        (Dedup.hash32(col(idCol).cast("string")) % numShards).as("shard"))
      .withColumn("offset", coalesce(sum(col("tok_count")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budgetTokens))
  }

  // ------------------------------------- repetition quality (Gopher-style)

  /** Per-document repetition metrics in the style of the Gopher data
    * quality rules (Rae et al. 2021 §A1.1): distinct-token ratio,
    * fraction of word-bigram occurrences taken by the single most
    * frequent bigram, and fraction of word-trigram occurrences that
    * belong to any repeated trigram — plus a composite `flagged` bit.
    *
    * Scale shape: one pass tags every 1/2/3-gram occurrence with its
    * order `n` and explodes ONCE; `groupBy(id, n, gram)` counts with
    * map-side partial aggregation, then a conditional-aggregate
    * `groupBy(id)` folds the three orders into one row per doc. Two
    * shuffles, both keyed on the document id — no per-doc data ever
    * crosses documents, so skew equals the longest document, not the
    * hottest n-gram.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokens materialized as their own projection (lambda reads an
    // attribute, not a re-computed split — see Dedup.shingleTable)
    val toks = Dedup.fanOut(docs, col(idCol))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    def grams(n: Int): Column = {
      val arr =
        if (n == 1) col("toks")
        else transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*))
      // guard BEFORE building: sequence(0, negative) would step down
      transform(when(size(col("toks")) >= n, arr).otherwise(lit(Array.empty[String])),
        g => struct(lit(n).as("n"), g.as("g")))
    }
    // explode_outer + explicit null filter, NOT plain explode: explode
    // triggers InferFiltersFromGenerate, whose size>0 filter gets
    // predicate-pushed below the fan-out repartition with the gram
    // arrays re-inlined (serial re-evaluation over unsplit input)
    val tagged = toks.select(col(idCol),
        explode_outer(concat(grams(1), grams(2), grams(3))).as("gr"))
      .filter(col("gr").isNotNull)
      .select(col(idCol), col("gr.n").as("n"), col("gr.g").as("g"))
    val counts = tagged.groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(idCol)).agg(
        sum(when(col("n") === 1, col("cnt"))).as("n_toks"),
        sum(when(col("n") === 1, lit(1L))).as("n_distinct"),
        max(when(col("n") === 2, col("cnt"))).as("top2"),
        sum(when(col("n") === 2, col("cnt"))).as("tot2"),
        sum(when(col("n") === 3 && col("cnt") > 1, col("cnt"))).as("dup3"),
        sum(when(col("n") === 3, col("cnt"))).as("tot3"))
      .select(col(idCol), col("n_toks"),
        round(col("n_distinct").cast("double") / col("n_toks"), 6).as("distinct_ratio"),
        round(coalesce(col("top2").cast("double") / col("tot2"), lit(0.0)), 6)
          .as("top_bigram_frac"),
        round(coalesce(coalesce(col("dup3"), lit(0L)).cast("double") / col("tot3"),
          lit(0.0)), 6).as("dup_trigram_frac"))
      .withColumn("flagged",
        when(col("distinct_ratio") < 0.2 || col("top_bigram_frac") > 0.18
          || col("dup_trigram_frac") > 0.3, lit(1)).otherwise(lit(0)))
  }

  // ------------------------------------- cross-document block dedup (C4)

  /** C4-style cross-document block deduplication: split each document
    * into consecutive `blockWords`-word blocks, keep only the globally
    * FIRST occurrence of each block (ordered by doc id, then block
    * position), and report per-document kept/total block counts.
    *
    * Scale shape: blocks shuffle once on their content hash; the
    * first-occurrence choice is a `row_number` window over that hash —
    * group size = number of copies of one block, so the window never
    * sees more than a duplicate cluster (no global sort). A second
    * doc-id-keyed aggregate folds the survivors back to one row per
    * document. This is how paragraph dedup runs at 100 TB: the
    * shuffled unit is a ~50-byte hash + position, never the text.
    */
  def blockDedupStats(docs: DataFrame, idCol: String, textCol: String,
                      blockWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Dedup.fanOut(docs, col(idCol))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    val nBlocks = ceil(size(col("toks")).cast("double") / blockWords).cast("int")
    // guard BEFORE building: a null/empty token array would send
    // sequence(0, -1) stepping downward and fabricate phantom blocks;
    // guarded docs yield an empty array, whose outer-explode null row
    // the isNotNull filter drops (so a null-text doc has zero blocks,
    // matching the oracle's unnest-over-range semantics)
    val blocks = toks.select(col(idCol), posexplode_outer(
        when(size(col("toks")) > 0,
          transform(sequence(lit(0), nBlocks - 1),
            i => array_join(slice(col("toks"), i * blockWords + 1, lit(blockWords)), " ")))
          .otherwise(lit(Array.empty[String]))))
      .toDF(idCol, "block_idx", "block")
      .filter(col("block").isNotNull)
    val firstOccurrence = Window.partitionBy(md5(col("block")))
      .orderBy(col(idCol), col("block_idx"))
    blocks.withColumn("rn", row_number().over(firstOccurrence))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("total_blocks"),
        sum(when(col("rn") === 1, lit(1L)).otherwise(lit(0L))).as("kept_blocks"))
      .withColumn("kept_ratio",
        round(col("kept_blocks").cast("double") / col("total_blocks"), 6))
  }

  // -------------------------------- temperature-based mixture sampling

  /** Per-stratum keep rates for temperature-based data mixing (the
    * multilingual-corpus recipe: sample stratum s proportional to
    * n_s^(1/T) with T=2, i.e. sqrt weights — upweights small strata,
    * flattens large ones). Returns one row per stratum:
    * (stratum, n_docs, w, bp) where `bp` is the keep rate in BASIS
    * POINTS such that expected total kept ≈ `targetFracBp/10000` of
    * the corpus.
    *
    * Integer-portable by construction: weights are
    * `floor(sqrt(n_docs * 1e6))` (IEEE sqrt is correctly rounded, so
    * the floor is engine-exact), their sum is integer (order-free),
    * and the final rate is floored into basis points. The result is
    * stratum-count-sized — broadcast it back onto the corpus and gate
    * rows with [[stratifiedKeep]]'s hash-mod (no shuffle on the data
    * path).
    */
  def temperatureRates(docs: DataFrame, stratumCol: String,
                       targetFracBp: Int): DataFrame = {
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val weighted = counts.withColumn("w",
      floor(sqrt(col("n_docs").cast("double") * 1000000d)).cast("long"))
    val totals = weighted.agg(
      sum(col("w")).as("sum_w"), sum(col("n_docs")).as("n_total"))
    weighted.crossJoin(broadcast(totals))
      .withColumn("target", expr(s"(n_total * $targetFracBp) div 10000"))
      .withColumn("bp", least(lit(10000L), floor(
        col("target").cast("double") * col("w") / col("sum_w") / col("n_docs")
          * 10000)))
      .select(col(stratumCol), col("n_docs"), col("w"), col("bp"))
  }

  // ---------------------------------------------- stratified sampling

  /** Deterministic per-stratum downsampling for data mixing: keeps a
    * row iff `hash(salt:id) % 10000 < rate(stratum)`. Rates are BASIS
    * POINTS (0..10000) — integer end to end, so the gate is bit-exact
    * across engines (a double `rate * 10000` truncates differently in
    * IEEE754 vs DECIMAL math). The hash-mod gate makes the sample
    * reproducible across engines and runs (unlike
    * `sample()`/`TABLESAMPLE`), and it's a per-row filter — no
    * shuffle, pushes below wide transforms. Strata absent from
    * `ratesBp` use `defaultBp`.
    */
  def stratifiedKeep(id: Column, stratum: Column, ratesBp: Map[String, Int],
                     defaultBp: Int, salt: String = "strat"): Column = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    Dedup.hash32(id.cast("string"), salt) % 10000 < rate
  }

  // ------------------------------------------------- document chunking

  /** Fixed-size token windows at `strideTokens` stride — the
    * unit-of-training transform between curation and shard write.
    * Returns (idCol, chunk_id, chunk_start, chunk_tokens, chunk_md5):
    * chunk boundaries by exact integer math, chunk CONTENT pinned by
    * an md5 of the joined token slice. Null-text rows yield no chunks.
    *
    * A pure stateless projection + generate — usable unchanged under
    * Structured Streaming (`StreamingCurationSpec` diffs stream vs
    * batch output), and map-only at any scale: tokens are
    * materialized once per doc (attribute, not a re-split per chunk —
    * the HOF trap), chunks explode to O(tokens/stride) rows, nothing
    * shuffles.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk, got chunk=$chunkTokens stride=$strideTokens")
    val t = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"), size(col("__t")).cast("long").as("__n"))
      .withColumn("__nc", when(col("__n") <= chunkTokens, lit(1L))
        .otherwise(expr(s"(__n - $chunkTokens + ${strideTokens - 1}) div $strideTokens") + 1L))
    t.select(col(idCol), col("__t"), col("__n"),
        explode_outer(sequence(lit(0L), col("__nc") - 1L)).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * strideTokens + 1L)
      .withColumn("chunk_tokens",
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_id") * strideTokens))
      .select(col(idCol), col("chunk_id"), col("chunk_start"), col("chunk_tokens"),
        md5(concat_ws(" ", slice(col("__t"), col("chunk_start"), col("chunk_tokens"))))
          .as("chunk_md5"))
  }
}
