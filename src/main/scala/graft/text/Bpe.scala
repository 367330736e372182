package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction: learn the
  * first K merge rules of a subword tokenizer from the corpus (Sennrich
  * et al. 2016, the algorithm behind GPT-2/LLaMA-style vocabularies).
  *
  * Scale shape — the exact split real BPE trainers use (e.g. the
  * word-counting pre-pass in HuggingFace `tokenizers`):
  *
  *  - the CORPUS is touched exactly once, by the word-frequency
  *    aggregation (tokenize → explode → one shuffle on the word key
  *    with map-side combine). Everything after operates on the
  *    distinct-word table, which is vocabulary-sized (~10⁷ rows at
  *    100 TB), not corpus-sized.
  *  - each merge iteration is one vocabulary-sized job: adjacent
  *    symbol pairs explode (bounded by word length), aggregate on the
  *    pair key, and the arg-max pair — ONE row, metadata like
  *    [[graft.operators.GlobalRank]]'s offsets — is collected and
  *    folded back as a literal `replace`. The state is re-persisted
  *    and the parent unpersisted every step, so lineage stays O(1)
  *    and no iteration ever re-reads the corpus.
  *  - the merge table itself is driver-resident by design: it IS the
  *    tokenizer artifact (a few thousand rows in production), exactly
  *    what real trainers hold in memory.
  *
  * Symbol-sequence encoding: a word's current segmentation is a single
  * string of sentinel-wrapped symbols joined by spaces, e.g. "abc" →
  * `§a§ §b§ §c§`. A merge of pair (x, y) is then literally
  * `replace(sym, "§x§ §y§", "§xy§")` — string `replace` is
  * left-to-right non-overlapping in both Spark and DuckDB, which is
  * precisely BPE's merge-application convention ("aaaa" + merge (a,a)
  * → "aa","aa", not "aa","a","a" — see [[graft.BpeSpec]]). The
  * sentinel makes the match exact: `§x§ §y§` can only match at a
  * symbol boundary, never inside a longer symbol.
  *
  * Ties are broken deterministically (count DESC, pair string ASC) so
  * the learned table is reproducible and oracle-checkable; the DuckDB
  * twin ([[oracleSql]]) unrolls the same K iterations as CTE stages
  * from the same constants.
  */
object Bpe {

  /** Symbol sentinel. Any character not produced by the tokenizer
    * works; the section sign never appears in the corpus fixtures. If
    * it DID appear in a token, both engines would mis-bracket the
    * same way — parity holds; the semantics contract does not.
    */
  val Sep = "§"

  /** Merge-rule count for the battery query (q122). Small so the
    * unrolled oracle stays readable; production vocabularies just run
    * the same loop ~30k times over the same vocabulary-sized state.
    */
  val DefaultMerges = 6

  /** Initial segmentation: one sentinel-wrapped symbol per character,
    * space-joined. `substr` is 1-based and character-exact on both
    * engines.
    */
  private[graft] def wrapChars(word: Column): Column =
    array_join(
      transform(sequence(lit(1), length(word)),
        i => concat(lit(Sep), word.substr(i, lit(1)), lit(Sep))),
      " ")

  /** Adjacent symbol pairs of a segmentation, as `"§x§ §y§"` strings.
    * Guarded: Spark's `sequence(1, 0)` would step DOWNWARD, so
    * single-symbol words short-circuit to an empty array.
    */
  private[graft] def adjacentPairs(sym: Column): Column = {
    val l = split(sym, " ")
    when(size(l) >= 2,
      transform(sequence(lit(1), size(l) - 1),
        i => concat(element_at(l, i), lit(" "), element_at(l, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Lowercased whitespace word frequencies — the one corpus-sized
    * pass (shared tokenizer shape: `trim` then split on `\s+`).
    */
  private[graft] def wordFreq(docs: DataFrame, textCol: Column): DataFrame =
    graft.dedup.Dedup.fanOut(docs, textCol)
      .select(explode(TextAnalysis.tokens(lower(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Learn the first `merges` BPE rules. Returns the merge table
    * `(step INT, pair STRING, merged STRING, cnt BIGINT)` ordered by
    * step — `pair` is the sentinel-wrapped winning pair, `merged` the
    * new symbol, `cnt` its frequency-weighted occurrence count at
    * selection time.
    *
    * Throws if the vocabulary exhausts (no adjacent pair left) before
    * `merges` steps — a silent short table would diverge from the
    * fixed-K oracle.
    */
  def train(docs: DataFrame, textCol: Column, merges: Int = DefaultMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (out, state) = trainState(docs, textCol, merges)
    state.unpersist(blocking = false)
    out.toDF("step", "pair", "merged", "cnt")
  }

  /** The trainer's loop, also returning the final PERSISTED
    * segmentation state `(word, freq, sym)` — the learned tokenizer's
    * application table ([[q130]]'s input). Caller owns the unpersist.
    */
  private[graft] def trainState(docs: DataFrame, textCol: Column,
                                merges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1: $merges")
    var state = wordFreq(docs, textCol)
      .withColumn("sym", wrapChars(col("word")))
      .persist()
    state.count() // materialize: no later job re-reads the corpus

    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to merges) {
      val top = state
        .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
        .groupBy("pair")
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect() // 1 row: the arg-max merge rule (metadata-sized)
      if (top.isEmpty) {
        state.unpersist(blocking = false)
        throw new IllegalStateException(
          s"BPE vocabulary exhausted after ${step - 1} merges (requested $merges)")
      }
      val pair = top(0).getString(0)
      val cnt = top(0).getLong(1)
      val merged = pair.replace(s"$Sep $Sep", "")
      out += ((step, pair, merged, cnt))

      val next = state
        .withColumn("sym", replace(col("sym"), lit(pair), lit(merged)))
        .persist()
      next.count() // pin before dropping the parent: O(1) lineage
      state.unpersist(blocking = false)
      state = next
    }
    (out.result(), state)
  }

  /** Apply the learned vocabulary back to the corpus: per document,
    * whitespace-word count and the subword count under the final
    * segmentation — the compression measurement that tells you whether
    * K merges were worth it. One more corpus pass (docs re-explode to
    * words) joined against the vocab-sized state on the word key; the
    * per-word subword count is projected BEFORE the join ships it, so
    * the join carries (word, int), never symbol strings.
    */
  def tokenizedCounts(docs: DataFrame, textCol: Column,
                      merges: Int = DefaultMerges): DataFrame = {
    val (_, state) = trainState(docs, textCol, merges)
    val sizes = state.select(col("word"),
      size(split(col("sym"), " ")).cast("long").as("n_sub"))
    val words = graft.dedup.Dedup.fanOut(docs, textCol)
      .select(col("doc_id"), explode(TextAnalysis.tokens(lower(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val out = graft.dedup.Dedup.materialize(
      words.join(sizes, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
        .orderBy("doc_id"))
    state.unpersist(blocking = false)
    out
  }

  /** DuckDB twin: the same K iterations unrolled as CTE stages from
    * the same sentinel and tie-break. `s0` is the initial
    * per-character segmentation; each stage `k` counts pairs over
    * `s(k-1)`, picks the arg-max into `b(k)`, and applies it into
    * `s(k)`; the result unions the K winners.
    */
  /** The shared K-stage CTE chain: word frequencies, initial
    * segmentation, and per-stage (pair-count, arg-max, apply) triples.
    * `word` rides through every stage so [[applyOracleSql]] can join
    * the final state back to documents.
    */
  private def stagesSql(merges: Int, table: String, textCol: String): String = {
    val head =
      s"""wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS word
         |        FROM $table)
         |  WHERE length(word) > 0 GROUP BY word),
         |s0 AS (SELECT word, freq, array_to_string(list_transform(range(1, length(word) + 1),
         |    i -> '$Sep' || substr(word, i, 1) || '$Sep'), ' ') AS sym FROM wf)""".stripMargin
    val stages = (1 to merges).map { k =>
      s""",
         |p$k AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS pair, freq
         |        FROM (SELECT string_split(sym, ' ') AS l, freq FROM s${k - 1}))
         |  GROUP BY pair),
         |b$k AS (SELECT CAST($k AS INT) AS step, pair, replace(pair, '$Sep $Sep', '') AS merged, cnt
         |  FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
         |s$k AS (SELECT word, freq, replace(sym, (SELECT pair FROM b$k), (SELECT merged FROM b$k)) AS sym
         |  FROM s${k - 1})""".stripMargin
    }.mkString
    head + stages
  }

  def oracleSql(merges: Int, table: String = "documents", textCol: String = "text"): String = {
    val union = (1 to merges).map(k => s"SELECT * FROM b$k").mkString(" UNION ALL ")
    s"""WITH ${stagesSql(merges, table, textCol)}
       |SELECT step, pair, merged, cnt FROM ($union) ORDER BY step""".stripMargin
  }

  /** DuckDB twin of [[tokenizedCounts]]: the same chain, then the
    * corpus re-exploded to words and joined to the final stage.
    */
  def applyOracleSql(merges: Int, table: String = "documents", textCol: String = "text"): String =
    s"""WITH ${stagesSql(merges, table, textCol)},
       |sz AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub FROM s$merges),
       |w AS (SELECT doc_id, unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS word
       |      FROM $table)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords
       |FROM w JOIN sz USING (word) WHERE length(word) > 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
