package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, BPE-ish token counting, quality scoring, language-ID
  * (n-gram/stopword heuristic), and document fingerprinting (rolling
  * polynomial hash).
  *
  * Everything here is built from codegen'd built-ins and higher-order
  * array functions — no UDFs — so Catalyst keeps pushdown/pruning and
  * the operators scale linearly with no shuffle (all per-row).
  *
  * Each formula is deliberately expressible in ANSI SQL so the DuckDB
  * oracle can mirror it bit-for-bit (integer math) or within 1e-9
  * (double math); see [[graft.Queries]].
  */
object TextAnalysis {

  /** Whitespace tokenization. `trim` first so leading/trailing blanks
    * don't produce empty tokens (matches DuckDB
    * `string_split_regex(trim(x), '\s+')`).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of maximal runs of letters, digits,
    * or single other non-space chars — the pre-tokenization regex most
    * BPE vocabularies apply before merges.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Mean token length in characters (double). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
      size(toks).cast("double")
  }

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      length(text).cast("double")

  /** Stopword lists per language, tiny by design (the heuristic needs
    * discrimination, not coverage). Alphabetical language order — the
    * argmax tie-break depends on it.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "de"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of tokens present in `words` (duplicates counted). */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val lit_words = array(words.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(lit_words, t)))
  }

  def stopwordRatio(text: Column): Column =
    stopwordHits(text, stopwords.toMap.apply("en")).cast("double") /
      tokenCount(text).cast("double")

  /** Composite quality score in [0,1]: length signal + cleanliness +
    * stopword naturalness. Weights are arbitrary but fixed; the point
    * is a deterministic, cheap, distributable scorer.
    */
  def qualityScore(text: Column): Column = {
    val lenSig = least(lit(1.0), tokenCount(text).cast("double") / lit(100.0))
    val clean = lit(1.0) - least(lit(1.0), punctRatio(text) * lit(4.0))
    val natural = least(lit(1.0), stopwordRatio(text) * lit(4.0))
    lit(0.4) * lenSig + lit(0.3) * clean + lit(0.3) * natural
  }

  /** Language-ID: argmax of per-language stopword hit counts, ties
    * broken by alphabetical language order, all-zero → "und".
    */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === best, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  /** Codepoints of every character, 1-based positional extraction so
    * the DuckDB mirror (`list_transform(range(1, len+1), i ->
    * unicode(x[i]))`) folds in the identical order.
    */
  private def codepoints(text: Column): Column =
    transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))))

  /** Rolling polynomial fingerprint: fold (acc*131 + code) mod 1e9+7
    * over all codepoints. Exact integer math — hash-identical across
    * engines; stays < 2^63 at every step so no overflow anywhere.
    * Native codegen expression ([[RollingHash]]); [[fingerprintHof]]
    * is the built-ins-only twin it is spec-checked against.
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      RollingHash(org.apache.spark.sql.graft.Bridge.expression(text)))

  /** The same fold via interpreted higher-order built-ins — kept as
    * the semantic reference for `TrainingOpsSpec`'s parity check (and
    * as documentation that no UDF was ever needed here).
    */
  def fingerprintHof(text: Column): Column =
    aggregate(codepoints(text), lit(0L), (a, c) => (a * 131L + c) % 1000000007L)

  /** md5 of whitespace-normalized lowercase text — the exact-dup key. */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
}
