package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.multimodal.{MediaRecord, Multimodal}
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Unit oracles for the training-data operators, on literal fixtures
  * with hand-computed expectations.
  */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).collect().head.get(0)
  }

  test("tokenization trims and splits on runs of whitespace") {
    assert(one(TextAnalysis.tokenCount(col("text")), "  a  b\tc ") == 3)
    assert(one(TextAnalysis.meanTokenLen(col("text")), "ab cd") == 2.0)
  }

  test("bpe-ish count: letter runs, digit runs, single punct") {
    // "ab3!x" -> [ab][3][!][x]; space not counted
    assert(one(TextAnalysis.bpeTokenCount(col("text")), "ab3! x") == 4)
  }

  test("quality score is bounded and rewards stopword-bearing text") {
    val hi = one(TextAnalysis.qualityScore(col("text")),
      "the cat sat on the mat and it is a fine day in the sun").asInstanceOf[Double]
    val lo = one(TextAnalysis.qualityScore(col("text")),
      "@@@ ### $$$ %%%").asInstanceOf[Double]
    assert(hi > lo && hi <= 1.0 && lo >= 0.0)
  }

  test("langId picks stopword-majority language, und when no hits") {
    assert(one(TextAnalysis.langId(col("text")), "der hund und die katze ist da") == "de")
    assert(one(TextAnalysis.langId(col("text")), "the cat is a pet") == "en")
    assert(one(TextAnalysis.langId(col("text")), "xyzzy plugh") == "und")
  }

  test("fingerprint is the polynomial fold mod 1e9+7") {
    val expected = "ab".foldLeft(0L)((a, c) => (a * 131 + c.toInt) % 1000000007L)
    assert(one(TextAnalysis.fingerprint(col("text")), "ab") == expected)
  }

  test("codegen rolling hash == interpreted HOF fold on real corpus + unicode edges") {
    // the native RollingHash expression must be value-identical to the
    // built-ins-only formulation the DuckDB oracle mirrors — checked
    // over every sf0.001 document AND non-ASCII codepoint edge cases
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .unionAll(Seq("", " ", "héllo wörld", "日本語テキスト", "mixed ascii + 中文",
          // supplementary-plane (astral) input: surrogate pairs are where
          // the native codePointAt walk and the HOF twin could diverge
          "violin key: 𝄞", "emoji 😀🚀 mix", "𝄞")
        .toDF("text"))
    val diff = docs.select(
        TextAnalysis.fingerprint(col("text")).as("native"),
        TextAnalysis.fingerprintHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.isEmpty, s"native/HOF fingerprint mismatch: ${diff.head(3).toSeq}")
  }

  test("deflate ratio: repetition compresses far below natural text; SQL surface works") {
    import spark.implicits._
    val rep = "the same phrase again and again " * 50
    val natural = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).head().getString(0)
    val repBp = one(graft.functions.deflate_ratio_bp(col("text")), rep)
      .asInstanceOf[Long]
    val natBp = one(graft.functions.deflate_ratio_bp(col("text")), natural)
      .asInstanceOf[Long]
    assert(repBp < natBp / 2, s"repetitive=$repBp natural=$natBp")
    assert(one(graft.functions.deflate_ratio_bp(col("text")), "") === 10000L)
    // deterministic: same input, same codepath, same value
    assert(one(graft.functions.deflate_ratio_bp(col("text")), rep) === repBp)
    // registered for SQL use
    Seq(rep).toDF("text").createOrReplaceTempView("dfr_t")
    val viaSql = spark.sql("SELECT deflate_ratio_bp(text) AS r FROM dfr_t")
      .head().getLong(0)
    assert(viaSql === repBp)
  }

  test("shingles: distinct token 3-grams; short docs collapse to whole text") {
    val sh = one(Dedup.shingles(col("text")), "a b c d").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq == Seq("a b c", "b c d"))
    val short = one(Dedup.shingles(col("text")), "a b").asInstanceOf[scala.collection.Seq[String]]
    assert(short.toSeq == Seq("a b"))
  }

  test("minhash: identical docs agree on all components, est jaccard 1.0") {
    import spark.implicits._
    val df = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSignature(Dedup.shingles(col("text")), 16).as("sig"))
    val cands = Dedup.lshCandidates(df, "doc_id", "sig")
      .withColumn("est", Dedup.estJaccard(col("sig_a"), col("sig_b")))
      .collect()
    assert(cands.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(cands.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      .forall(_.getAs[Double]("est") == 1.0))
    // disjoint docs never collide on any of the 4 bands
    assert(!cands.exists(r => r.getLong(1) == 3L))
  }

  test("simhash: equal for identical text, hamming 0; differs for disjoint") {
    import spark.implicits._
    val hs = Seq("alpha beta gamma", "alpha beta gamma", "zeta eta theta")
      .toDF("text").select(Dedup.simhash32(col("text")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("cosine: orthogonal → 0, identical → 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    val ortho = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    val same = df.select(Similarity.cosine(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(ortho) < 1e-15)
    assert(math.abs(same - 1.0) < 1e-15)
  }

  test("knnBrute returns k ranked neighbors, self excluded") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)), (3L, Seq(1.0, 0.05)))
      .toDF("vec_id", "vec")
    val q = e.filter(col("vec_id") === 0).select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val out = Similarity.knnBrute(q, e, 2).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("vec_id") == 3L) // closest to (1,0)
    assert(out(1).getAs[Long]("vec_id") == 1L)
  }

  test("srp bucket is stable and in range") {
    import spark.implicits._
    val v = Seq(Seq.tabulate(64)(i => math.sin(i + 1))).toDF("v")
    val b1 = v.select(Similarity.srpBucket(col("v"), 4, 64)).head.getLong(0)
    val b2 = v.select(Similarity.srpBucket(col("v"), 4, 64)).head.getLong(0)
    assert(b1 == b2 && b1 >= 0 && b1 < 16)
  }

  test("multimodal decode stub: mean byte + frame count over binary payload") {
    import spark.implicits._
    val media = Seq(MediaRecord(7L, "png", Array.fill[Byte](100)(65), 64, 64)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 100L && f.mean_byte == 65.0 && f.n_frames == 3)
  }

  test("batched embed: model-call batch shapes are exactly grouped(batchSize)") {
    import spark.implicits._
    val media = (0L until 40L)
      .map(i => MediaRecord(i, "png", Array.fill(8)(i.toByte), 64, 64))
      .toDS().repartition(1)
    val out = Multimodal.batchedEmbed(media, batchSize = 16, dims = 4).collect()
    val shapes = out.groupBy(_.batch_idx).view
      .mapValues(_.map(_.batch_size).distinct.toSeq).toMap
    // 40 rows in one partition → batches of 16, 16, 8, in order
    assert(shapes === Map(0 -> Seq(16), 1 -> Seq(16), 2 -> Seq(8)))
    assert(out.forall(_.embedding.length == 4))
  }

  test("batched embed: embeddings depend only on payload, never on batching") {
    import spark.implicits._
    val media = (0L until 50L)
      .map(i => MediaRecord(i, "wav", Array.tabulate(32)(j => (i + j).toByte), 64, 64))
    val a = Multimodal.batchedEmbed(media.toDS().repartition(1), batchSize = 7)
      .collect().map(e => e.doc_id -> e.embedding.toSeq).toMap
    val b = Multimodal.batchedEmbed(media.toDS().repartition(13), batchSize = 16)
      .collect().map(e => e.doc_id -> e.embedding.toSeq).toMap
    assert(a === b)
    // hand-check: doc 0 payload bytes 0..31, dims 8 → chunk 4; dim d
    // mean = (4d + 1.5) / 255
    val e0 = a(0L)
    (0 until 8).foreach { d =>
      assert(math.abs(e0(d) - (4 * d + 1.5f) / 255f) < 1e-6f)
    }
  }

  test("DSIR weights tilt toward the target domain: mean log-ratio of " +
      "en docs exceeds non-en") {
    val dir = "/root/testdata/sf0.001"
    val w = Queries.all("q123_dsir_weights")(spark, dir)
      .join(Tables(spark, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
    val means = w
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(avg("dsir_logw").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val (en, rest) = (means(true), means(false))
    // the target slice must score strictly higher on its own model —
    // and by a margin, not a tie broken by smoothing noise
    assert(en > rest + 0.1, s"en mean $en vs rest $rest")
  }
}

/** SQL surface: the custom expressions usable from spark.sql. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("grok_* and vec_* callable from SQL") {
    val r = spark.sql(
      """SELECT grok_extract('x 42', '%{WORD:w} %{INT:n:int}').n AS n,
        |       grok_match('hello', '%{WORD}') AS m,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |       vec_dot(array(cast(2.0 as float)), array(3.0D)) AS d
        |""".stripMargin).collect().head
    assert(r.getLong(0) == 42L && r.getBoolean(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-15 && r.getDouble(3) == 6.0)
  }

  test("frame sampling slices payload bytes with halved dims") {
    import spark.implicits._
    val media = Seq(MediaRecord(3L, "png", Array.tabulate[Byte](70)(_.toByte), 64, 72)).toDS()
    val frames = Multimodal.sampleFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.length == 2) // 70/32 = 2 full frames
    assert(frames(0).frame.toSeq == (0 until 32).map(_.toByte))
    assert(frames(1).frame.toSeq == (32 until 64).map(_.toByte))
    assert(frames.forall(f => f.width == 32 && f.height == 36))
  }
}

/** Connected components on a hand-built graph. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("two chains + a singleton resolve to component minima") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // 1-2-3 (chain), 5-6 and 6-7 via 5-7 (triangle-ish), 4 isolated
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L), (7L, 5L)).toDF("a", "b")
    val got = graft.dedup.Dedup.connectedComponents(nodes, edges, "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("incremental star-contraction == full rebuild on random graphs and splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    for (trial <- 0 until 2) {
      // moderately dense: enough structure for merges/chains/isolates,
      // small enough diameter that the shared-suite JVM's heap absorbs
      // the per-round plan growth between lineage cuts
      val n = 60
      val nodes = (0L until n).toDF("id")
      val all = Seq.fill(110)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (base, delta) = all.partition(_ => rnd.nextInt(5) != 0)
      val rebuild = graft.dedup.Dedup.connectedComponents(
          nodes, all.toDF("a", "b"), "id", "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseLabels = graft.dedup.Dedup.connectedComponents(
        nodes, base.toDF("a", "b"), "id", "a", "b")
      val inc = graft.dedup.Dedup.incrementalComponents(
          baseLabels, nodes, delta.toDF("a", "b"), "id", "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === rebuild, s"trial $trial diverged")
    }
  }

  test("incremental with an empty delta reproduces the existing labels") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val base = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val labels = graft.dedup.Dedup.connectedComponents(nodes, base, "id", "a", "b")
    val inc = graft.dedup.Dedup.incrementalComponents(
        labels, nodes, Seq.empty[(Long, Long)].toDF("a", "b"), "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("a delta edge merging two old components relabels BOTH components' members") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("id")
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("a", "b")
    val labels = graft.dedup.Dedup.connectedComponents(nodes, base, "id", "a", "b")
    // bridge the two chains at their FAR ends: members 10..12 must all
    // flow down to canonical 1 through the star, not just node 12
    val inc = graft.dedup.Dedup.incrementalComponents(
        labels, nodes, Seq((3L, 12L)).toDF("a", "b"), "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

}
