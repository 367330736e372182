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
}
