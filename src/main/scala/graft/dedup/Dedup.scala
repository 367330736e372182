package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, all built on
  * shuffle-conscious Spark primitives:
  *
  *  - exact:   groupBy(md5(normalized text)) → canonical id (1 shuffle)
  *  - MinHash: shingle → 16 portable min-hashes → 4 LSH bands →
  *             equi-join on band key (shuffle on band key only; the
  *             classic near-dup candidate generator that scales to
  *             100 TB because it never compares non-colliding pairs)
  *  - n-gram Jaccard: exact verification on LSH candidates only
  *  - SimHash: 32-bit sign-sum sketch; near-dup = small Hamming
  *             distance, blocked by 8-bit bands (pigeonhole: distance
  *             ≤ 6 over 4 bands ⇒ ≥ 1 band equal)
  *
  * Hash portability: every hash bottoms out in md5 (identical across
  * engines); "hex → int" is Spark `conv(substr(md5(x),1,8),16,10)` ≡
  * DuckDB `('0x'||substr(md5(x),1,8))::BIGINT`, so the DuckDB oracle
  * reproduces signatures exactly.
  */
object Dedup {

  /** Distinct token 3-shingles; docs shorter than n tokens collapse to
    * a single whole-text shingle so every doc has ≥ 1.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array(concat_ws(" ", toks))))
  }

  /** 32-bit portable hash of a string column (first 8 md5 hex chars). */
  def hash32(c: Column, salt: String = ""): Column =
    conv(substring(md5(if (salt.isEmpty) c else concat(lit(salt), lit(":"), c)), 1, 8), 16, 10)
      .cast("long")

  /** MinHash signature: for each of `numHashes` salted hash families,
    * the lexicographic min of md5(j:shingle). Min over hex strings ≡
    * min over the underlying 128-bit values, and string min is
    * engine-portable (pure ASCII ordering).
    *
    * Array-column form — fine for streaming/per-row use, but for bulk
    * dedup prefer [[minhashSigTable]]: this expression inlines the
    * shingle subtree `numHashes` times once ProjectCollapse runs,
    * which bloats codegen badly.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 16): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingleCol, s => md5(concat(lit(s"$j:"), s))))
    }: _*)

  /** Bulk MinHash: explode shingles to rows, take the `numHashes`
    * mins as aggregates. The 100 TB shape — shingles are computed
    * once, the aggregates partial-combine map-side, and the only
    * shuffle is the groupBy on the doc id (which the LSH band join
    * needs anyway). Returns (idCol, sig array<string>).
    */
  def minhashSigTable(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 16): DataFrame = {
    val exploded = docs.select(col(idCol), explode(shingles(col(textCol))).as("shingle"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"m$j"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** LSH band keys: md5 of the concatenated signature slice per band.
    * Any shared band key makes a candidate pair.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      md5(concat_ws("|", lit(b.toString) +: slice: _*))
    }: _*)

  /** Candidate pairs from LSH banding: explode band keys, self-join on
    * key, keep ordered distinct pairs. The join shuffles on band key —
    * collision groups are small by construction, so no skew blowup.
    */
  def lshCandidates(docs: DataFrame, idCol: String, sigCol: String,
                    bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val exploded = docs.select(
        col(idCol), col(sigCol),
        explode(bandKeys(col(sigCol), bands, rowsPerBand)).as("band_key"))
    val a = exploded.select(col(idCol).as("id_a"), col(sigCol).as("sig_a"), col("band_key"))
    val b = exploded.select(col(idCol).as("id_b"), col(sigCol).as("sig_b"), col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Estimated Jaccard from two MinHash signatures: fraction of
    * agreeing components.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") /
      size(sigA).cast("double")

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 32-bit SimHash over the (non-distinct) token stream: bit i is the
    * sign of Σ_tokens (bit i of hash32(token) ? +1 : −1). Near-dup
    * docs differ in few bits.
    */
  def simhash32(text: Column): Column = {
    val hs = transform(TextAnalysis.tokens(text), t => hash32(t))
    val n = size(hs)
    (0 until 32).map { i =>
      val ones = size(filter(hs, h => shiftright(h, i).bitwiseAND(1) === 1))
      when(ones * 2 > n, lit(1L) * (1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 32-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
