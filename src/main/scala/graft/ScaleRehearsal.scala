package graft

import org.apache.spark.sql.functions._

/** Two-point scaling rehearsal for the dedup chain (BASELINE.md §d).
  *
  * Synthesizes an N× documents table from the base scale — N copies
  * with offset doc_ids and every token prefixed with a copy tag, so
  * copies are DISJOINT corpora: shingle/minhash/band keys never
  * collide across copies, intra-copy duplicate structure is preserved
  * exactly, and the workload grows ~N× without manufacturing N-way
  * near-dup cliques (which identical copies would — C(N,2) candidate
  * pairs per doc, a different workload, not a scale-up).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.ScaleRehearsal [mult]` — times each dedup-chain query at 1×
  * and N×, prints one JSON line per scale.
  */
object ScaleRehearsal {
  private val ChainQueries = Seq(
    "q21_dedup_minhash", "q277_sql_dedup", "q22_dedup_ngram", "q31_dedup_groups",
    "q43_dedup_incremental", "q52_tfidf", "q53_unigram_xent",
    "q66_dup_spans", "q69_chunking",
    // round 8: exact prefix-filter all-pairs + its triangle census —
    // the copy transform keeps cross-copy shingles disjoint, so the
    // exact pair set at Nx is N× the 1x set and candidate growth
    // measures the prefix filter, not manufactured dups
    "q91_allpairs", "q98_dup_triangles",
    // round-8 late additions over the same documents corpus:
    // containment verify on LSH candidates; BM25 (copy tags make the
    // constant probe terms match nothing at Nx, so the timing isolates
    // the O(corpus) tokenize→filter stage — the postings exchange is
    // empty, which IS the scale claim: work below the exchange grows
    // linearly, the shuffle doesn't); cluster representative
    // selection (components + quality argmax)
    "q104_containment", "q108_bm25", "q109_cluster_rep",
    // round-8 continuation: BPE induce (vocab grows ~Nx under the
    // copy tags, so the per-iteration vocab jobs scale too, not just
    // the one corpus pass) + apply, DSIR's bucket models (B stays
    // FIXED at Nx — the point), padding buckets, curriculum ranks,
    // and the JL projection pass over the rotated embeddings
    "q122_bpe_merges", "q123_dsir_weights", "q129_pad_buckets",
    "q132_curriculum", "q131_jl_distortion")

  private val EmbedDims = 64

  /** Copy k's embedding transform: circular rotation by k mod 64,
    * NEGATED on odd rotation laps. Each transform is norm-preserving
    * and intra-copy-cosine-preserving (rotation is a permutation;
    * cos(-a,-b) = cos(a,b)), and the negation keeps lap-2 copies from
    * aliasing lap-1 rotations into exact cross-copy duplicates — up to
    * 128 distinct copies. Beyond that copies WOULD alias and
    * manufacture guaranteed near-dup cliques, so fail loudly. One
    * definition for both rehearsal paths: the two inline copies of
    * this expression diverged once already (the k ≥ 64 negative-slice
    * crash lived only in the chain path).
    */
  private def copyVariant(k: Int): org.apache.spark.sql.Column = {
    require(k < 2 * EmbedDims,
      s"only ${2 * EmbedDims} distinct copy transforms exist; got copy $k")
    val r = k % EmbedDims
    val rot = if (r == 0) col("embedding")
      else concat(slice(col("embedding"), r + 1, EmbedDims - r),
        slice(col("embedding"), 1, r))
    if ((k / EmbedDims) % 2 == 1) transform(rot, x => -x) else rot
  }

  /** Banded-SRP near-dup pairs with a PARAMETERIZED plane count — the
    * README scale rule made measurable: growing planesPerBand with the
    * corpus holds per-bucket occupancy (and so per-bucket pair work)
    * roughly constant, which is what keeps the candidate join ~linear
    * instead of quadratic. The battery's q24 fixes the parameters for
    * oracle determinism; this rehearsal varies them with scale.
    */
  private def embedPairs(spark: org.apache.spark.sql.SparkSession, dir: String,
                         planesPerBand: Int): Long = {
    import graft.sim.Similarity
    val e = graft.dedup.Dedup.fanOut(
        spark.read.parquet(s"$dir/embeddings.parquet"), col("vec_id"))
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val sigs = graft.dedup.Dedup.materialize(e.select(col("vec_id"),
      explode_outer(Similarity.srpBandKeys(col("v"), 4, planesPerBand, EmbedDims))
        .as("bucket")))
    val cand = sigs.select(col("vec_id").as("id_a"), col("bucket"))
      .join(sigs.select(col("vec_id").as("id_b"), col("bucket")), "bucket")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ea = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.3).count()
  }

  private def runEmbed(spark: org.apache.spark.sql.SparkSession,
                       base: String, scaled: String, mult: Int): Unit = {
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
    (0 until mult).map { k =>
      emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        copyVariant(k).as("embedding"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
    val planes = 8 + (math.log(mult.toDouble) / math.log(2.0)).round.toInt
    // "auto" = the battery's own derivation (ScaleParams occupancy
    // rule from the scaled corpus's footer row count) — the knob the
    // round-6 verdict asked to stop hand-setting; "scaled" keeps the
    // hand formula §e was measured with; "fixed" is the contrast case
    val auto = ScaleParams.srpBandPlanes(
      ScaleParams.tableRows(spark, scaled, "embeddings"))
    // fixed-8 at 100× is the measured-abort case (BASELINE §e: ~10⁸
    // candidate pairs, >77 GB spill) — don't re-detonate it
    val variants = Seq("auto" -> auto, "scaled" -> planes) ++
      (if (mult < 100) Seq("fixed" -> 8) else Seq.empty)
    for ((label, p) <- variants) {
      val t0 = System.nanoTime()
      val pairs = embedPairs(spark, scaled, p)
      val t = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"scale_rehearsal_embed","scale":"${mult}x","variant":"$label","planes":$p,"pairs":$pairs,"sec":$t}""")
    }
  }

  /** Bloom-prune selectivity audit (BASELINE §g): on the given corpus,
    * count the corpus shingle explosion, the rows surviving the q85
    * sketch prune, and the true-overlap rows — the measured join-input
    * reduction the Bloom composition buys, plus the realized false-
    * positive rate vs the ~1% design point (10 bits/key).
    */
  private def runBloom(spark: org.apache.spark.sql.SparkSession, dir: String,
                       label: String): Unit = {
    import graft.curation.Curation
    import graft.dedup.Dedup
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val eval_ = d.filter(col("doc_id") % 97 === 0)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val evalShingles = Dedup.materialize(
      Dedup.shingleTable(eval_, "doc_id", "text")
        .select(explode_outer(col("sh")).as("shingle")).distinct())
    val nEval = evalShingles.count()
    val sketch = Curation.bloomSketch(evalShingles, "shingle", nEval)
    val corpusShingles = Dedup.materialize(
      Dedup.shingleTable(corpus, "doc_id", "text")
        .select(col("doc_id"), explode_outer(col("sh")).as("shingle")))
    val total = corpusShingles.count()
    val survive = corpusShingles
      .filter(Curation.bloomMightContain(sketch, col("shingle"))).count()
    val trueHits = corpusShingles.join(evalShingles, "shingle").count()
    val fpRate = (survive - trueHits).toDouble / math.max(total - trueHits, 1L)
    def time(q: String): Double = timeQuery(spark, q, dir)
    Seq("q37_decontam", "q85_decontam_bloom").foreach(time) // warm
    val (tExact, tBloom) = (time("q37_decontam"), time("q85_decontam_bloom"))
    println(s"""{"metric":"bloom_prune","scale":"$label","sketch_bytes":${sketch.length},""" +
      s""""eval_shingles":$nEval,"corpus_shingles":$total,"bloom_survivors":$survive,""" +
      s""""true_overlaps":$trueHits,"fp_rate":$fpRate,""" +
      s""""q37_exact_sec":$tExact,"q85_bloom_sec":$tBloom}""")
  }

  /** Time one battery query's DECLARED plan on `dir`. The shared
    * methodology for every rehearsal path: `queryExecution.toRdd
    * .count()`, never `df.count()` — the latter wraps the query in
    * Aggregate(count(1)) and lets Catalyst column-prune
    * projection-shaped queries down to a bare scan count (see Bench).
    */
  private def timeQuery(spark: org.apache.spark.sql.SparkSession,
                        name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count(): Unit
    (System.nanoTime() - t0) / 1e9
  }

  /** ER-pipeline rehearsal: synthesize an N× customer registry —
    * offset keys (so derived phones stay distinct) and copy-tagged
    * names (so exact-name blocks and the SNM sort neighborhood stay
    * intra-copy) — and time the two candidate generators + verify +
    * CC end-to-end at 1× and N×. The claim under test: block sizes
    * and rank-window width are corpus-independent, so both pipelines
    * grow ~linearly.
    */
  private def runEr(spark: org.apache.spark.sql.SparkSession, base: String,
                    scaled: String, mult: Int): Unit = {
    val c = spark.read.parquet(s"$base/customer.parquet")
    (0 until mult).map { k =>
      c.withColumn("c_custkey", col("c_custkey") + lit(k * 10000000L))
        .withColumn("c_name", concat(lit(s"c${k}_"), col("c_name")))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/customer.parquet")
    val qs = Seq("q126_entity_resolution", "q133_sorted_neighborhood")
    def time(name: String, dir: String): Double = timeQuery(spark, name, dir)
    Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
      qs.foreach(q => time(q, dir)) // warm
      val timed = qs.map(q => "\"" + q + "\":" + time(q, dir))
        .mkString("{", ",", "}")
      println(s"""{"metric":"scale_rehearsal_er","scale":"$label","queries":$timed}""")
    }
  }

  /** N× documents synthesis shared by the chain and bloom paths — one
    * definition (the embedding copyVariant diverged once when inlined
    * twice; don't repeat that with the text transform).
    */
  /** N× a keyed table by unioning `mult` key-offset copies — ONE copy
    * of the logic (three rehearsal branches cloned it until a fix to
    * the offsets had to be repeated per clone).
    */
  private def scaleOffsetTable(spark: org.apache.spark.sql.SparkSession,
                               base: String, scaled: String, mult: Int,
                               name: String, offsets: Map[String, Long]): Unit = {
    val t = spark.read.parquet(s"$base/$name.parquet")
    (0 until mult).map { k =>
      offsets.foldLeft(t) { case (acc, (c, off)) =>
        acc.withColumn(c, col(c) + lit(k * off)) }
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/$name.parquet")
  }

  private def scaleDocs(spark: org.apache.spark.sql.SparkSession,
                        base: String, scaled: String, mult: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until mult).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    // "embed" second arg: embeddings-only (skip the text chain) — used
    // for the larger multiples where the SRP parameterization contrast
    // actually bites but 100x text synthesis would dominate the run
    val embedOnly = args.length > 1 && args(1) == "embed"
    // "bloom" second arg: q85 selectivity audit over base + Nx docs
    val bloomOnly = args.length > 1 && args(1) == "bloom"
    // "er" second arg: entity-resolution pipelines over an Nx registry
    val erOnly = args.length > 1 && args(1) == "er"
    // "new8" second arg: the round-8 continuation's doc/embedding
    // operators (skyline, CDC chunking, Zipf, apportionment, PQ-ADC)
    // at 1x vs Nx
    val new8Only = args.length > 1 && args(1) == "new8"
    // "new9" second arg: the third continuation's operators — text
    // (winnowing/NB/JS/AUC), graph (HITS/BFS over an Nx disjoint-copy
    // trade graph), events (KS/bitmaps/paths over Nx disjoint users)
    val new9Only = args.length > 1 && args(1) == "new9"
    // "new10" second arg: the round-8 fourth continuation's operators
    // (assoc rules, Gram/PCA moments, chi²/Hill, bot regularity)
    val new10Only = args.length > 1 && args(1) == "new10"
    // "new11" second arg: the round-8 fifth continuation's audits —
    // silhouette/cluster-MI (Lloyd chain with the √n-DERIVED list
    // count at Nx), langid kappa + conformal (docs), disorder
    // (events), cross-split contamination (the full LSH chain + split)
    val new11Only = args.length > 1 && args(1) == "new11"
    // "new12" second arg: the round-8 sixth continuation's heavy
    // document compositions — Brier (NB chain), dup-quality gap +
    // token savings (CC + quality chains), token-budget cut (prefix
    // sums), DSIR ESS, LSH recall (exact all-pairs truth)
    val new12Only = args.length > 1 && args(1) == "new12"
    // "new13" second arg: the seventh continuation — calibration
    // family (PAV bins + before/after Brier: bin count FIXED at Nx,
    // the B^3 minimax stays metadata-sized while the score pass
    // grows), prefix-truncation dedup (block sizes corpus-independent
    // under the copy tags), dup flow (the verified-pair chain + source
    // joins), Holt (events window), alpha mixture (tokenize pass),
    // hard negatives + MMR (fixed query/round count, corpus-sized
    // candidate passes)
    val new13Only = args.length > 1 && args(1) == "new13"
    // "new14" second arg: the seventh continuation's second wave —
    // temperature scaling + fold AUC (score passes), BOW dedup +
    // feature hashing + fertility + sentences + cut sweep (tokenize
    // passes), dow seasonality (events). The deliberately-quadratic
    // sample-scale audits (q253 label noise, q261 hubness: exact
    // all-pairs ground truth, the q91 rationale) are EXCLUDED at Nx —
    // 50k² pairs is not their operating point; their corpus-scale
    // path swaps in the q29 IVF probes.
    val new14Only = args.length > 1 && args(1) == "new14"
    // "pivf" second arg: persisted-IVF build-once/query-many economics
    // at Nx — build wall (one linear pass), probe wall against the
    // list-partitioned index (pruned to nprobe lists) vs the full
    // in-query rebuild (q29), and the file-pruning ratio
    val pivfOnly = args.length > 1 && args(1) == "pivf"
    // "sivf" second arg: STREAMING index maintenance at Nx — 8 equal
    // ingests through StreamingIvf.appendBatchPersistent; the claim
    // under test: per-batch wall tracks the INCREMENT (assignment +
    // column-pruned id anti-join), not the index size behind it
    val sivfOnly = args.length > 1 && args(1) == "sivf"
    // "decontam" second arg (round-13, VERDICT r12 item 1): the q293
    // exact corpus×eval cross product vs the q297 banded chain at 1x
    // and Nx — exact work is quadratic in N (0.9N × 0.1N pairs), the
    // banded candidate volume is held down by the occupancy-scaled
    // planes; exact is SKIPPED past 10x (the measured-detonation
    // regime), and the guard arithmetic prints at every scale
    val decontamOnly = args.length > 1 && args(1) == "decontam"
    // "reindex" second arg (round-13, VERDICT r12 item 2): selective
    // reindex economics on the Nx persisted index — bytes/wall at
    // churn thresholds vs the full re-layout
    val reindexOnly = args.length > 1 && args(1) == "reindex"
    // "ccstars" second arg: large-star/small-star vs LPA on the q287
    // pair graph (round-14 bounded experiment)
    val ccstarsOnly = args.length > 1 && args(1) == "ccstars"
    // "decontam14" second arg: the recall-vs-cost curve of the
    // DERIVED-band decontam chains at the loose vs tight thresholds
    val decontam14Only = args.length > 1 && args(1) == "decontam14"
    // "lifecycle" second arg: the closed auto-reindex loop at Nx
    val lifecycleOnly = args.length > 1 && args(1) == "lifecycle"
    // "lifecycle2" second arg (round-15, VERDICT r14 item 1): the
    // cadence epilogue in the CONCENTRATED-churn regime
    val lifecycle2Only = args.length > 1 && args(1) == "lifecycle2"
    // "gate" second arg: the streaming decontam gate's O(increment)
    // claim — per-batch cost flat in history
    val gateOnly = args.length > 1 && args(1) == "gate"
    // "rescreen" second arg (round-15, VERDICT r14 item 2): the
    // incremental re-screen's cost ∝ EVAL DELTA claim
    val rescreenOnly = args.length > 1 && args(1) == "rescreen"
    val scaled = s"/tmp/graft_scale_${mult}x"
    val spark = GraftSession.get("local[32]", "32")
    if (pivfOnly) {
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        val rows = ScaleParams.tableRows(spark, dir, "embeddings")
        val lists = ScaleParams.ivfLists(rows)
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").as("vec"))
        val cents = e.filter(col("vec_id") < lists)
          .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
        val idxPath = s"$scaled/pivf_index_$label"
        val tb = System.nanoTime()
        graft.sim.Similarity.persistIvfIndex(
          QueriesTraining.ivfAssign(e, cents), idxPath)
        val buildSec = (System.nanoTime() - tb) / 1e9
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
        def probeOnce(): Double = {
          val t0 = System.nanoTime()
          graft.sim.Similarity.probePersistedIvf(spark, idxPath,
            graft.sim.Similarity.ivfProbes(q, cents, 2), 5)
            .queryExecution.toRdd.count(): Unit
          (System.nanoTime() - t0) / 1e9
        }
        probeOnce() // warm
        val probeSec = Seq.fill(3)(probeOnce()).sorted.apply(1)
        timeQuery(spark, "q29_knn_ivf", dir) // warm
        val rebuildSec =
          Seq.fill(3)(timeQuery(spark, "q29_knn_ivf", dir)).sorted.apply(1)
        val filesTotal = spark.read.parquet(idxPath).inputFiles.length
        println(s"""{"metric":"scale_rehearsal_pivf","scale":"$label","rows":$rows,""" +
          s""""lists":$lists,"build_sec":$buildSec,"probe_persisted_sec":$probeSec,""" +
          s""""probe_rebuild_sec":$rebuildSec,"files_total":$filesTotal,"nprobe":2}""")
      }
      spark.stop(); return
    }
    if (sivfOnly) {
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val rows = ScaleParams.tableRows(spark, scaled, "embeddings")
      val lists = ScaleParams.ivfLists(rows)
      val e = spark.read.parquet(s"$scaled/embeddings.parquet")
      val cents = e.filter(col("vec_id") < lists)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val idxPath = s"$scaled/sivf_index"
      val hp = new org.apache.hadoop.fs.Path(idxPath)
      val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (hfs.exists(hp)) hfs.delete(hp, true): Unit
      val batchSecs = (0 until 8).map { i =>
        val slice = e.filter(col("vec_id") % 8 === i)
        val t0 = System.nanoTime()
        graft.streaming.StreamingIvf.appendBatchPersistent(
          idxPath, slice, i.toLong, cents)
        (System.nanoTime() - t0) / 1e9
      }
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      def probeOnce(): Double = {
        val t0 = System.nanoTime()
        graft.sim.Similarity.probePersistedIvf(spark, idxPath,
          graft.sim.Similarity.ivfProbes(q, cents, 2), 5)
          .queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      probeOnce() // warm
      val probeSec = Seq.fill(3)(probeOnce()).sorted.apply(1)
      val stateRows = spark.read.parquet(idxPath).count()
      val filesIncr = spark.read.parquet(idxPath).inputFiles.length
      // the small-files tax and its fix: re-layout the batch-dir index
      // into the one-file-per-list shape (the StreamingIvf scaladoc's
      // "compaction is a re-layout" contract, measured)
      val relayoutPath = s"$scaled/sivf_relayout"
      val tr = System.nanoTime()
      graft.sim.Similarity.persistIvfIndex(
        spark.read.parquet(idxPath).select(col("vec_id"), col("vec"),
          col("list_id").cast("long").as("list_id")), relayoutPath)
      val relayoutSec = (System.nanoTime() - tr) / 1e9
      def probeRelayout(): Double = {
        val t0 = System.nanoTime()
        graft.sim.Similarity.probePersistedIvf(spark, relayoutPath,
          graft.sim.Similarity.ivfProbes(q, cents, 2), 5)
          .queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      probeRelayout() // warm
      val probeRelayoutSec = Seq.fill(3)(probeRelayout()).sorted.apply(1)
      val filesRelayout = spark.read.parquet(relayoutPath).inputFiles.length
      // the PRODUCTION verb (round-13, VERDICT r12 item 3): in-place
      // StreamingIvf.relayoutState behind the commit marker — merges
      // the batch dirs into ONE list-partitioned generation on the
      // live store; probe recovery measured on the same root the
      // maintainer keeps writing to
      val tr2 = System.nanoTime()
      graft.streaming.StreamingIvf.relayoutState(spark, idxPath, 7L)
      val relayoutInPlaceSec = (System.nanoTime() - tr2) / 1e9
      probeOnce() // warm against the re-laid store
      val probeAfterSec = Seq.fill(3)(probeOnce()).sorted.apply(1)
      val filesAfter = spark.read.parquet(idxPath).inputFiles.length
      val stateRowsAfter = spark.read.parquet(idxPath).count()
      val secsJson = batchSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
      println(s"""{"metric":"scale_rehearsal_sivf","scale":"${mult}x","rows":$rows,""" +
        s""""lists":$lists,"batch_secs":$secsJson,""" +
        f""""flat_ratio":${batchSecs(7) / batchSecs(1)}%.2f,""" +
        s""""probe_sec":$probeSec,"files_incremental":$filesIncr,""" +
        s""""relayout_sec":$relayoutSec,"probe_relayout_sec":$probeRelayoutSec,""" +
        s""""files_relayout":$filesRelayout,""" +
        s""""relayout_inplace_sec":$relayoutInPlaceSec,""" +
        s""""probe_after_inplace_sec":$probeAfterSec,"files_after_inplace":$filesAfter,""" +
        s""""state_rows_after_inplace":$stateRowsAfter,""" +
        s""""state_rows":$stateRows,"nprobe":2}""")
      spark.stop(); return
    }
    if (decontamOnly) {
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        val rows = ScaleParams.tableRows(spark, dir, "embeddings")
        val est = (rows / 10L) * graft.sim.Similarity.EmbedDims * 8L
        val budget = graft.sim.Similarity.EvalBroadcastBudgetBytes
        def median3(name: String): Double = {
          timeQuery(spark, name, dir) // warm
          Seq.fill(3)(timeQuery(spark, name, dir)).sorted.apply(1)
        }
        val bandedSec = median3("q297_embed_decontam_banded")
        val bandedFlags = SparkEntry.queries("q297_embed_decontam_banded")(spark, dir).count()
        // exact past 10x is the detonation the guard exists for
        // (pairs = 0.09 rows² cosine folds) — measured at 1x/10x,
        // skipped beyond with the pair count printed instead
        val exactJson = if (mult <= 10 || label == "1x") {
          val s = median3("q293_embed_decontam")
          val f = SparkEntry.queries("q293_embed_decontam")(spark, dir)
            .filter(col("flagged") === 1L).count()
          s""""exact_sec":$s,"exact_flags":$f"""
        } else {
          s""""exact_sec":null,"exact_pairs_skipped":${(rows / 10L) * (rows - rows / 10L)}"""
        }
        println(s"""{"metric":"scale_rehearsal_decontam","scale":"$label","rows":$rows,""" +
          s""""banded_sec":$bandedSec,"banded_flags":$bandedFlags,$exactJson,""" +
          s""""guard_est_bytes":$est,"guard_budget_bytes":$budget,""" +
          s""""guard_fires":${est > budget}}""")
      }
      spark.stop(); return
    }
    if (reindexOnly) {
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val rows = ScaleParams.tableRows(spark, scaled, "embeddings")
      val lists = ScaleParams.ivfLists(rows)
      val e = spark.read.parquet(s"$scaled/embeddings.parquet")
        .select(col("vec_id"), col("embedding").as("vec"))
      val seed = e.filter(col("vec_id") < lists)
        .select(col("vec_id").as("c_id"), col("vec").as("c_vec"))
      // the refined quantizer: ONE Lloyd E+M round from the seed (the
      // q290 regime at its first refinement — enough to redraw the
      // badly-seeded cells without an Nx-scale full Lloyd chain)
      val refined = graft.sim.Similarity.ivfAssign(e, seed)
        .select(col("list_id"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg(col("x")).as("mu"))
        .groupBy("list_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu")).as("c_vec"))
        .select(col("list_id").as("c_id"), col("c_vec"))
        .localCheckpoint()
      val basePath = s"$scaled/reindex_base"
      val tb = System.nanoTime()
      graft.sim.Similarity.persistIvfIndex(
        graft.sim.Similarity.ivfAssign(e, seed), basePath)
      val buildSec = (System.nanoTime() - tb) / 1e9
      val baseBytes = {
        val p = new org.apache.hadoop.fs.Path(basePath)
        val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = hfs.listFiles(p, true); var t = 0L
        while (it.hasNext) t += it.next().getLen
        t
      }
      // full re-layout anchor: re-persist the whole index under the
      // refined quantizer (what a non-selective reindex costs)
      val tf = System.nanoTime()
      graft.sim.Similarity.persistIvfIndex(
        graft.sim.Similarity.ivfAssign(e, refined), s"$scaled/reindex_full")
      val fullSec = (System.nanoTime() - tf) / 1e9
      // CONCENTRATED churn contrast: swap the vectors of 5% of the
      // centroid pairs (c_id 2i ↔ 2i+1 for i < lists/40) — those
      // cells churn ~100%, every other cell 0 — the regime q290 flags
      // and selective reindex exists for (the Lloyd refinement above
      // yields UNIFORM ~15% churn on the rotation-copy synthesis: the
      // adversarial case where selectivity degenerates to all/nothing)
      val swapped = {
        // clamp to ≥ 1 pair (ADVICE r13): below 40 lists the 5% rule
        // rounds to zero and the "swap" row would silently measure an
        // identity-quantizer no-op while still printing as a swap
        val pairs = math.max(1, lists / 40)
        seed.withColumn("c_id",
          when(col("c_id") < 2L * pairs,
            col("c_id") - (col("c_id") % 2) * 2 + 1)
            .otherwise(col("c_id")))
          .localCheckpoint()
      }
      for ((qlabel, quant, thr) <- Seq(
          ("lloyd", refined, 0L), ("lloyd", refined, 1000L), ("lloyd", refined, 5000L),
          ("swap", swapped, 5000L))) {
        val idx = s"$scaled/reindex_${qlabel}_t$thr"
        val src = new org.apache.hadoop.fs.Path(basePath)
        val dst = new org.apache.hadoop.fs.Path(idx)
        val hfs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
        hfs.delete(dst, true)
        org.apache.hadoop.fs.FileUtil.copy(hfs, src, hfs, dst, false,
          spark.sparkContext.hadoopConfiguration)
        val t0 = System.nanoTime()
        val st = graft.sim.IvfIndex.reindexLists(spark, idx, quant, thr)
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"metric":"scale_rehearsal_reindex","scale":"${mult}x","rows":$rows,""" +
          s""""lists":$lists,"quantizer":"$qlabel","min_churn_bp":$thr,""" +
          s""""lists_rewritten":${st.listsRewritten},""" +
          s""""rows_rewritten":${st.rowsRewritten},"rows_moved":${st.rowsMoved},""" +
          s""""bytes_staged":${st.bytesStaged},"index_bytes":$baseBytes,""" +
          s""""reindex_sec":$sec,"full_relayout_sec":$fullSec,"build_sec":$buildSec}""")
      }
      spark.stop(); return
    }
    if (decontam14Only) {
      // BASELINE §n: what a RECALL TARGET costs as thresholds loosen
      // (round-14, VERDICT r13 item 1's curve). Per scale and
      // threshold: the derived band count, the banded chain's median
      // time, and — where the exact ground truth is affordable — the
      // measured recall. The loose threshold's derived L grows with
      // the occupancy-scaled planes (the LSH exponent at p*=0.597 is
      // 0.745), so past 10x the loose chain's signature volume is
      // printed and SKIPPED — stating that cost is the derivation's
      // whole point; the tight chain stays cheap at every scale.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      def med3(name: String, dir: String): Double = {
        timeQuery(spark, name, dir) // warm
        Seq.fill(3)(timeQuery(spark, name, dir)).sorted.apply(1)
      }
      def recallOf(name: String, dir: String): Long =
        SparkEntry.queries(name)(spark, dir)
          .collect()(0).getAs[Long]("recall_bp")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        val rows = ScaleParams.tableRows(spark, dir, "embeddings")
        val planes = ScaleParams.srpBandPlanes(rows)
        for ((thr, bandedQ, recallQ) <- Seq(
            (graft.sim.Similarity.NearDupCos,
              "q297_embed_decontam_banded", "q298_decontam_recall"),
            (graft.sim.Similarity.DecontamTightCos,
              "q299_decontam_tight", "q300_decontam_recall_tight"))) {
          val bands = ScaleParams.srpBandsFor(planes, thr,
            graft.sim.Similarity.DecontamRecallBp)
          val sigRows = rows * bands.toLong
          // loose chain past 10x: state the volume, skip the run
          val affordable = thr > 0.5 || rows <= 25000L
          val body = if (affordable) {
            val sec = med3(bandedQ, dir)
            // exact ground truth (and so the recall audit) stays
            // affordable through 10x of this fixture
            val rec = if (rows <= 25000L) s""","recall_bp":${recallOf(recallQ, dir)}"""
              else ""
            f""""banded_sec":$sec%.3f$rec"""
          } else s""""skipped":"loose chain at $rows rows = $sigRows signature rows","banded_sec":null"""
          println(s"""{"metric":"scale_rehearsal_decontam14","scale":"$label",""" +
            s""""rows":$rows,"threshold":$thr,"planes":$planes,"bands":$bands,""" +
            s""""target_recall_bp":${graft.sim.Similarity.DecontamRecallBp},""" +
            s""""sig_rows":$sigRows,$body}""")
        }
      }
      spark.stop(); return
    }
    if (lifecycleOnly) {
      // BASELINE §m addendum: the CLOSED lifecycle loop at Nx — drive
      // the maintainer verbs directly (append -> relayout cadence ->
      // auto Lloyd-refine + churn audit + selective reindex +
      // quantizer publish) and price the reindex epilogue against the
      // probe it improves. Seed quantizer = first-sqrt(n) vectors (the
      // q29 stand-in a real store starts from); the Lloyd refinement
      // gives the uniform-churn regime on this synthesis (the r13
      // honest footnote), so the epilogue's bill here is the AUDIT +
      // full-rewrite worst case — the upper bound of the cadence.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val rows = ScaleParams.tableRows(spark, scaled, "embeddings")
      val lists = ScaleParams.ivfLists(rows)
      val all = spark.read.parquet(s"$scaled/embeddings.parquet")
      val seed = all.limit(lists)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .localCheckpoint()
      val idx = s"$scaled/lifecycle_idx"
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(idxPath, true)
      graft.streaming.StreamingIvf.ensureQuantizer(spark, idx, seed)
      val batches = all.withColumn("b", col("vec_id") % 8)
      val tIngest = System.nanoTime()
      (0L until 8L).foreach { b =>
        val quant = graft.streaming.StreamingIvf.currentQuantizer(spark, idx).get
        graft.streaming.StreamingIvf.appendBatchPersistent(idx,
          batches.filter(col("b") === b).drop("b"), b, quant): Unit
        graft.streaming.StreamingIvf.maybeRelayout(spark, idx, b, every = 4)
      }
      val ingestSec = (System.nanoTime() - tIngest) / 1e9
      val q = all.limit(10).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .localCheckpoint()
      def probeSec(): Double = {
        val quant = graft.streaming.StreamingIvf.currentQuantizer(spark, idx).get
        val t0 = System.nanoTime()
        graft.sim.Similarity.probePersistedIvf(spark, idx,
          graft.sim.Similarity.ivfProbes(q, quant, 2), 5)
          .queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      probeSec() // warm
      val probeBefore = Seq.fill(3)(probeSec()).sorted.apply(1)
      // round-15: the refine is now SAMPLED (VERDICT r14 item 1). On
      // this rotation-copy synthesis every firing still makes real
      // Lloyd progress (diffuse data — the r13 uniform-churn footnote),
      // so both firings below pay the near-full rewrite: this mode is
      // the cadence's WORST-case bill. The concentrated regime a
      // production index actually drifts in is measured by lifecycle2.
      val tLoop = System.nanoTime()
      val stats = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 8, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loopSec = (System.nanoTime() - tLoop) / 1e9
      probeSec() // warm against the reindexed store
      val probeAfter = Seq.fill(3)(probeSec()).sorted.apply(1)
      val gen = graft.streaming.StreamingIvf.currentQuantizerGen(spark, idx)
      // STEADY-STATE firing (round-15, VERDICT r14 item 1): the first
      // epilogue above is the MIGRATION bill — a badly-seeded quantizer
      // refined on this synthesis churns every list (the r13 uniform
      // footnote), so its cost is dominated by the near-full rewrite.
      // The recurring bill is the SECOND cadence firing on the converged
      // store: the sampled refine re-lands near the gen-1 centroids,
      // the audit (the one honest full pass) finds concentrated /
      // near-zero churn, and the epilogue should sit at the audit
      // floor — the number that recurs every period at 100 TB.
      val tLoop2 = System.nanoTime()
      val stats2 = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 16, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loop2Sec = (System.nanoTime() - tLoop2) / 1e9
      probeSec() // warm against the steady-state store
      val probeSteady = Seq.fill(3)(probeSec()).sorted.apply(1)
      val gen2 = graft.streaming.StreamingIvf.currentQuantizerGen(spark, idx)
      println(s"""{"metric":"scale_rehearsal_lifecycle","scale":"${mult}x","rows":$rows,""" +
        s""""lists":$lists,"ingest_sec":${f"$ingestSec%.2f"},""" +
        s""""reindex_epilogue_sec":${f"$loopSec%.2f"},""" +
        s""""lists_rewritten":${stats.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""rows_rewritten":${stats.map(_.rowsRewritten).getOrElse(-1L)},""" +
        s""""bytes_staged":${stats.map(_.bytesStaged).getOrElse(-1L)},""" +
        s""""quantizer_gen":${gen.getOrElse(-1L)},""" +
        s""""probe_before_sec":${f"$probeBefore%.2f"},"probe_after_sec":${f"$probeAfter%.2f"},""" +
        s""""steady_epilogue_sec":${f"$loop2Sec%.2f"},""" +
        s""""steady_lists_rewritten":${stats2.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""steady_rows_rewritten":${stats2.map(_.rowsRewritten).getOrElse(-1L)},""" +
        s""""steady_quantizer_gen":${gen2.getOrElse(-1L)},""" +
        s""""probe_steady_sec":${f"$probeSteady%.2f"}}""")
      spark.stop(); return
    }
    if (lifecycle2Only) {
      // BASELINE §o addendum (round-15): the rotation-copy synthesis is
      // the cadence's UNIFORM-churn worst case (every firing makes real
      // Lloyd progress on diffuse data, so every list churns — the r13
      // honest footnote). Production index drift is CONCENTRATED: most
      // cells are converged and stable, a few moved. This fixture
      // constructs that regime exactly — the IndexLifecycleAutoSpec
      // geometry at 100× scale: 5 planted (P 3,200 / boundary Q 800 /
      // R 3,200) triples in disjoint coordinate planes (dims 2t, 2t+1;
      // seeds at −40°/95°, so one sampled refine flips exactly Q) plus
      // 437 already-converged cells (members identical to their
      // centroid — exact Lloyd fixed points, immune to sampling
      // wiggle). Expected: firing 1 rewrites exactly the 5 boundary
      // lists (~10% of rows); firing 2 (steady state) rewrites ZERO and
      // its epilogue is the audit floor — the number that recurs every
      // cadence period at 100 TB.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      // 437 ordinary centers from the base corpus, dims 0-9 zeroed so
      // they are exactly orthogonal to every planted plane
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val centers = emb0.orderBy("vec_id").limit(437)
        .withColumn("cell", row_number().over(w).cast("long") + lit(9L))
        .select(col("cell"),
          transform(col("embedding"), (x, d) =>
            when(d < 10, lit(0.0)).otherwise(x)).as("c_vec"))
        .localCheckpoint()
      def planeUnit(t: org.apache.spark.sql.Column, deg: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(63)), d =>
          when(d === t * 2, cos(radians(deg)))
            .when(d === t * 2 + 1, sin(radians(deg)))
            .otherwise(lit(0.0)))
      val triples = spark.range(0L, 36000L)
        .select(col("id").as("vec_id"), expr("id div 7200").as("t"),
          pmod(col("id"), lit(7200L)).as("off"))
        .withColumn("deg", when(col("off") < 3200, lit(0.0))
          .when(col("off") < 4000, lit(50.0)).otherwise(lit(130.0)))
        .select(col("vec_id"), planeUnit(col("t"), col("deg")).as("embedding"))
      val ordinary = spark.range(36000L, 200000L)
        .select(col("id").as("vec_id"),
          (pmod(col("id") - 36000L, lit(437L)) + 10L).as("cell"))
        .join(centers, "cell")
        .select(col("vec_id"), col("c_vec").as("embedding"))
      triples.unionAll(ordinary)
        .write.mode("overwrite").parquet(s"$scaled/lifecycle2_corpus.parquet")
      val all = spark.read.parquet(s"$scaled/lifecycle2_corpus.parquet")
      val rows = all.count()
      val seeds = spark.range(0L, 10L)
        .select(col("id").as("c_id"), expr("id div 2").as("t"),
          when(pmod(col("id"), lit(2L)) === 0L, lit(-40.0))
            .otherwise(lit(95.0)).as("deg"))
        .select(col("c_id"), planeUnit(col("t"), col("deg")).as("c_vec"))
        .unionAll(centers.select(col("cell").as("c_id"), col("c_vec")))
        .localCheckpoint()
      val idx = s"$scaled/lifecycle2_idx"
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(idxPath, true)
      graft.streaming.StreamingIvf.ensureQuantizer(spark, idx, seeds)
      val batches = all.withColumn("b", pmod(col("vec_id"), lit(8L)))
      val tIngest = System.nanoTime()
      (0L until 8L).foreach { b =>
        val quant = graft.streaming.StreamingIvf.currentQuantizer(spark, idx).get
        graft.streaming.StreamingIvf.appendBatchPersistent(idx,
          batches.filter(col("b") === b).drop("b"), b, quant): Unit
        graft.streaming.StreamingIvf.maybeRelayout(spark, idx, b, every = 4)
      }
      val ingestSec = (System.nanoTime() - tIngest) / 1e9
      val q = all.filter(col("vec_id") < 36000L && pmod(col("vec_id"), lit(7200L)).between(3200, 3209))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .localCheckpoint() // boundary-Q probes: the rows whose placement the cadence moves
      def probeSec(): Double = {
        val quant = graft.streaming.StreamingIvf.currentQuantizer(spark, idx).get
        val t0 = System.nanoTime()
        graft.sim.Similarity.probePersistedIvf(spark, idx,
          graft.sim.Similarity.ivfProbes(q, quant, 2), 5)
          .queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      probeSec() // warm
      val probeBefore = Seq.fill(3)(probeSec()).sorted.apply(1)
      val tLoop = System.nanoTime()
      val stats = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 8, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loopSec = (System.nanoTime() - tLoop) / 1e9
      probeSec() // warm
      val probeAfter = Seq.fill(3)(probeSec()).sorted.apply(1)
      val tLoop2 = System.nanoTime()
      val stats2 = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 16, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loop2Sec = (System.nanoTime() - tLoop2) / 1e9
      probeSec() // warm
      val probeSteady = Seq.fill(3)(probeSec()).sorted.apply(1)
      // round-16 (VERDICT r15 item 2): firing 3 = the SAME converged
      // steady state with the displacement prune bypassed
      // (fullAuditEvery = 1) — the r15 recurring bill re-measured on
      // this box, so pruned-vs-full is a same-run comparison
      val tLoop3 = System.nanoTime()
      val stats3 = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 24, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L,
        fullAuditEvery = 1)
      val loop3Sec = (System.nanoTime() - tLoop3) / 1e9
      // round-17 (persisted Lloyd sample): firing 4 = the SAME
      // converged steady state with the sample sidecar FORFEITED
      // (deleted — the pre-r17 refine path: the hash-mod filter pays
      // the full merged-generation read), so sidecar-vs-fallback is a
      // same-run comparison isolating the refine's read bill
      val sampleRoot = graft.streaming.StreamingIvf.lloydSampleRoot(idx)
      sampleRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(sampleRoot, true)
      val tLoop4 = System.nanoTime()
      val stats4 = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 32, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loop4Sec = (System.nanoTime() - tLoop4) / 1e9
      // firing 5: sidecar BACKFILLED on the same converged store — the
      // adjacent-in-time twin of firing 4, so sidecar-vs-fallback is
      // read off two consecutive firings instead of across the run's
      // heat gradient
      graft.streaming.StreamingIvf.backfillLloydSample(spark, idx)
      val tLoop5 = System.nanoTime()
      val stats5 = graft.streaming.StreamingIvf.maybeReindex(spark, idx,
        batchId = 40, relayoutEvery = 4, everyRelayouts = 2, minChurnBp = 1000L)
      val loop5Sec = (System.nanoTime() - tLoop5) / 1e9
      println(s"""{"metric":"scale_rehearsal_lifecycle2","scale":"${mult}x","rows":$rows,""" +
        s""""lists":447,"ingest_sec":${f"$ingestSec%.2f"},""" +
        s""""migration_epilogue_sec":${f"$loopSec%.2f"},""" +
        s""""lists_rewritten":${stats.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""rows_rewritten":${stats.map(_.rowsRewritten).getOrElse(-1L)},""" +
        s""""steady_epilogue_sec":${f"$loop2Sec%.2f"},""" +
        s""""steady_lists_rewritten":${stats2.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""steady_rows_rewritten":${stats2.map(_.rowsRewritten).getOrElse(-1L)},""" +
        s""""steady_lists_pruned":${stats2.map(_.listsPruned).getOrElse(-1L)},""" +
        s""""steady_lists_audited":${stats2.map(_.listsAudited).getOrElse(-1L)},""" +
        s""""steady_full_epilogue_sec":${f"$loop3Sec%.2f"},""" +
        s""""steady_full_lists_rewritten":${stats3.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""steady_nosample_epilogue_sec":${f"$loop4Sec%.2f"},""" +
        s""""steady_nosample_lists_rewritten":${stats4.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""steady_sample_epilogue_sec":${f"$loop5Sec%.2f"},""" +
        s""""steady_sample_lists_rewritten":${stats5.map(_.listsRewritten).getOrElse(-1L)},""" +
        s""""probe_before_sec":${f"$probeBefore%.2f"},""" +
        s""""probe_after_sec":${f"$probeAfter%.2f"},""" +
        s""""probe_steady_sec":${f"$probeSteady%.2f"}}""")
      spark.stop(); return
    }
    if (gateOnly) {
      // BASELINE §q: the streaming decontamination gate at Nx — the
      // O(increment) claim measured: the corpus streams through in 8
      // increments against a FIXED broadcast eval set (the base
      // fixture's natural eval split), and per-batch cost must be flat
      // in history (batch 8 ≈ batch 1) because the gate keeps NO
      // corpus-sized state — the verdict is (row, eval)-local.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val all = spark.read.parquet(s"$scaled/embeddings.parquet")
      val eval = emb0.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id").as("e_id"), col("embedding").as("e_vec"))
        .localCheckpoint()
      val evalRows = eval.count()
      val rows = all.count()
      val cleanP = s"$scaled/gate_clean"
      val quarP = s"$scaled/gate_quarantine"
      Seq(cleanP, quarP).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true): Unit
      }
      val batches = all.withColumn("b", col("vec_id") % 8)
      val secs = (0L until 8L).map { b =>
        val inc = batches.filter(col("b") === b)
          .select(col("vec_id"), col("embedding").as("vec"))
        val t0 = System.nanoTime()
        graft.streaming.StreamingDecontam.gateBatch(inc, b, eval,
          cleanP, quarP, graft.sim.Similarity.NearDupCos)
        (System.nanoTime() - t0) / 1e9
      }
      val nClean = spark.read.parquet(cleanP).count()
      val nQuar = spark.read.parquet(quarP).count()
      val secsJson = secs.map(s => f"$s%.3f").mkString("[", ",", "]")
      println(s"""{"metric":"scale_rehearsal_gate","scale":"${mult}x","rows":$rows,""" +
        s""""eval_rows":$evalRows,"batch_secs":$secsJson,""" +
        f""""flat_ratio":${secs(7) / secs(1)}%.2f,""" +
        s""""clean":$nClean,"quarantined":$nQuar}""")
      spark.stop(); return
    }
    if (rescreenOnly) {
      // BASELINE §q addendum (round-15): the incremental re-screen's
      // bill has two parts — an O(clean) store rewrite (the floor: the
      // compact-skeleton read + republish every rescreen pays) and an
      // O(clean × delta) verdict pass. The claim under test: the
      // verdict part tracks the eval DELTA, never the eval set — a
      // 100-row delta re-screen should sit at the rewrite floor while
      // a from-scratch screen against the full eval set pays the whole
      // O(clean × eval) cross again.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val all = spark.read.parquet(s"$scaled/embeddings.parquet")
      val rows = all.count()
      // a mid-sized eval set (1/40 of the corpus — inside the broadcast
      // budget at 100×) so the delta-vs-full contrast is visible; the
      // TIGHT production threshold throughout — at the loose 0.3 point
      // this synthesis is so dense that a 5k-row eval flags the entire
      // corpus (measured: clean store empty) and there is nothing left
      // to re-screen
      val eval0 = all.filter(col("vec_id") % 40 === 7)
        .select(col("vec_id").as("e_id"), col("embedding").as("e_vec"))
        .localCheckpoint()
      val evalRows = eval0.count()
      val cleanP = s"$scaled/rescreen_clean"
      val quarP = s"$scaled/rescreen_quarantine"
      Seq(cleanP, quarP).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true): Unit
      }
      graft.streaming.StreamingDecontam.ensureEval(spark, cleanP, eval0)
      val batches = all.withColumn("b", col("vec_id") % 8)
      (0L until 8L).foreach { b =>
        graft.streaming.StreamingDecontam.gateBatch(
          batches.filter(col("b") === b)
            .select(col("vec_id"), col("embedding").as("vec")),
          b, eval0, cleanP, quarP, graft.sim.Similarity.DecontamTightCos)
      }
      val cleanRows = spark.read.parquet(cleanP).count()
      // planted deltas: verbatim copies of committed-clean vectors
      // under fresh e_ids (guaranteed catches the gen-0 screen missed)
      import spark.implicits._
      // round-17: plants drawn from ONE batch dir (vec_id % 8 == 3 =
      // the dir key) so the selective rewrite has locality to exploit —
      // the previous consecutive-id pick spread 100 plants across all
      // 8 dirs and dirs_rewritten read 8/8 regardless of delta size,
      // which demonstrates the fixture, not the operator. Contamination
      // with batch-dir locality is also the production shape: a leaked
      // benchmark enters the corpus in the ingest window around its
      // release.
      val picked = spark.read.parquet(cleanP).select(col("vec_id"), col("vec"))
        .filter(pmod(col("vec_id"), lit(8L)) === 3L)
        .orderBy("vec_id").limit(1100).collect()
        .map(r => r.getSeq[Double](1).toSeq)
      // plant ids OUTSIDE the corpus id space (max corpus id ~10^9):
      // the delta is an e_id anti-join, so an id collision with a gen-0
      // eval row silently drops that plant from the delta
      val gen1 = eval0.unionAll(
        picked.take(100).zipWithIndex
          .map { case (v, i) => (4000000000L + i, v) }.toSeq.toDF("e_id", "e_vec"))
      val gen2 = gen1.unionAll(
        picked.slice(100, 1100).zipWithIndex
          .map { case (v, i) => (4100000000L + i, v) }.toSeq.toDF("e_id", "e_vec"))
      graft.streaming.StreamingDecontam.publishEval(spark, cleanP, 1L, gen1)
      val tA0 = System.nanoTime()
      val sA = graft.streaming.StreamingDecontam.rescreenClean(spark, cleanP, quarP,
        minCos = graft.sim.Similarity.DecontamTightCos)
      val tA = (System.nanoTime() - tA0) / 1e9
      graft.streaming.StreamingDecontam.publishEval(spark, cleanP, 2L, gen2)
      val tB0 = System.nanoTime()
      val sB = graft.streaming.StreamingDecontam.rescreenClean(spark, cleanP, quarP,
        minCos = graft.sim.Similarity.DecontamTightCos)
      val tB = (System.nanoTime() - tB0) / 1e9
      // the alternative a team without the watermark runs: re-screen
      // the whole clean store against the whole (grown) eval set
      val cleanNow = spark.read.parquet(cleanP).select("vec_id", "vec")
      val evFull = graft.streaming.StreamingDecontam.evalAt(spark, cleanP, 2L)
        .localCheckpoint()
      val tF0 = System.nanoTime()
      // verdicts only — Catalyst prunes the first(vec) payload agg out
      // of the plan, so the baseline times the verdict pass, not a
      // needless 195k-group × 64-float state buffer
      graft.sim.Similarity.evalVerdicts(cleanNow, evFull,
          graft.sim.Similarity.DecontamTightCos)
        .select("vec_id", "flagged")
        .queryExecution.toRdd.count(): Unit
      val tFull = (System.nanoTime() - tF0) / 1e9
      // round-17: the write bill made visible (VERDICT r15 item 1's
      // "done" row) — dirs/bytes rewritten must track the AFFECTED
      // dirs, never the store (the r16 selective per-dir rewrite)
      def rw(s: Option[graft.streaming.StreamingDecontam.RescreenStats]): String =
        s""""dirs_total":${s.map(_.dirsTotal).getOrElse(-1L)},""" +
          s""""dirs_rewritten":${s.map(_.dirsRewritten).getOrElse(-1L)},""" +
          s""""bytes_rewritten":${s.map(_.bytesRewritten).getOrElse(-1L)}"""
      val cleanBytes = {
        val p = new org.apache.hadoop.fs.Path(cleanP)
        val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        hfs.getContentSummary(p).getLength
      }
      println(s"""{"metric":"scale_rehearsal_rescreen","scale":"${mult}x","rows":$rows,""" +
        s""""eval_rows":$evalRows,"clean_rows":$cleanRows,"clean_bytes":$cleanBytes,""" +
        f""""rescreen_d100_sec":$tA%.2f,"moved_d100":${sA.map(_.moved).getOrElse(-1L)},""" +
        s""""d100_rw":{${rw(sA)}},""" +
        f""""rescreen_d1000_sec":$tB%.2f,"moved_d1000":${sB.map(_.moved).getOrElse(-1L)},""" +
        s""""d1000_rw":{${rw(sB)}},""" +
        f""""full_rescreen_verdict_sec":$tFull%.2f}""")
      spark.stop(); return
    }
    if (ccstarsOnly) {
      // large-star/small-star vs LPA on the q287 pair graph (round-14,
      // VERDICT r13 item 7): rotation-copy N× embeddings give N
      // disjoint copies of the fixture's component structure — same
      // diameter (so LPA's round count is scale-free here), N× the
      // edge volume, which is exactly the contrast that matters: LPA
      // pays O(diameter) rounds of node-sized shuffles against a
      // cached edge partitioning; stars pay O(log n) rounds of
      // edge-sized shuffles. Adopt on a measured win, else record the
      // negative result next to pointer jumping's.
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id")).localCheckpoint()
        val pairs = SparkEntry.queries("q24_dedup_embed")(spark, dir)
          .select("id_a", "id_b").localCheckpoint()
        val nEdges = pairs.count()
        def time(f: => org.apache.spark.sql.DataFrame): Double = {
          val t0 = System.nanoTime()
          f.queryExecution.toRdd.count(): Unit
          (System.nanoTime() - t0) / 1e9
        }
        def med3(f: => org.apache.spark.sql.DataFrame): Double = {
          time(f) // warm
          Seq.fill(3)(time(f)).sorted.apply(1)
        }
        val lpaSec = med3(graft.dedup.Dedup.connectedComponents(
          nodes, pairs, "vec_id", "id_a", "id_b"))
        val starsSec = med3(graft.dedup.Dedup.connectedComponentsStars(
          nodes, pairs, "vec_id", "id_a", "id_b"))
        println(s"""{"metric":"scale_rehearsal_ccstars","scale":"$label",""" +
          s""""nodes":${nodes.count()},"edges":$nEdges,""" +
          f""""lpa_sec":$lpaSec%.3f,"stars_sec":$starsSec%.3f,""" +
          f""""ratio":${starsSec / lpaSec}%.2f}""")
      }
      spark.stop(); return
    }
    if (new8Only) {
      scaleDocs(spark, base, scaled, mult)
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).as("embedding"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val qs = Seq("q140_skyline", "q142_cdc_chunks", "q145_zipf",
        "q149_apportion", "q139_pq_adc")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new8","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new9Only) {
      // docs: copy-tagged tokens (disjoint vocab/fingerprints per
      // copy); graph tables: offset keys → N disjoint components with
      // identical internal structure; events: offset users/event ids
      // (ts kept — the KS midpoint split sees the same distribution)
      scaleDocs(spark, base, scaled, mult)
      def scaleTable(name: String, offsets: Map[String, Long]): Unit =
        scaleOffsetTable(spark, base, scaled, mult, name, offsets)
      scaleTable("orders", Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
      scaleTable("lineitem", Map("l_orderkey" -> 1000000000L, "l_suppkey" -> 10000000L))
      scaleTable("supplier", Map("s_suppkey" -> 10000000L))
      scaleTable("events", Map("event_id" -> 1000000000L, "user_id" -> 10000000L))
      val qs = Seq("q166_auc", "q169_winnow", "q170_nb_quality",
        "q171_winnow_pairs", "q176_js_matrix", "q167_ks_drift",
        "q168_hits", "q173_bfs_layers", "q175_activity_bitmap", "q179_paths")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new9","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new10Only) {
      // round-8 fourth continuation: baskets (assoc rules), moments
      // (Gram/PCA — embeddings via the rotation variant, cast back to
      // float for the Aggregator's input encoder), order stats (chi²/
      // Hill over docs), gaps (bot regularity over Nx disjoint users)
      scaleDocs(spark, base, scaled, mult)
      def scaleTable(name: String, offsets: Map[String, Long]): Unit =
        scaleOffsetTable(spark, base, scaled, mult, name, offsets)
      // l_suppkey/orders/supplier offsets keep the q204 supplier
      // co-order graph as N disjoint copies (component structure
      // preserved); l_partkey is shared so q195/q210 baskets grow in
      // COUNT over the same item space
      scaleTable("lineitem", Map("l_orderkey" -> 1000000000L, "l_suppkey" -> 10000000L))
      scaleTable("orders", Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
      scaleTable("supplier", Map("s_suppkey" -> 10000000L))
      scaleTable("events", Map("event_id" -> 1000000000L, "user_id" -> 10000000L))
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).cast("array<float>").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val qs = Seq("q195_assoc_rules", "q196_embed_gram", "q197_chi_square",
        "q198_hill", "q199_pca_power", "q200_bot_regularity",
        // later round-8 additions over the same scaled tables: labeled
        // BFS, rec-eval composition, sequence anomaly, shingle ratio
        "q204_closeness", "q210_rec_hitrate", "q213_path_anomaly",
        "q218_compress_proxy")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new10","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new11Only) {
      scaleDocs(spark, base, scaled, mult)
      def scaleTable(name: String, offsets: Map[String, Long]): Unit =
        scaleOffsetTable(spark, base, scaled, mult, name, offsets)
      scaleTable("events", Map("event_id" -> 1000000000L, "user_id" -> 10000000L))
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).cast("array<float>").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val qs = Seq("q221_silhouette", "q222_lang_kappa", "q223_cluster_mi",
        "q224_disorder", "q225_conformal", "q226_split_contamination")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new11","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new12Only) {
      scaleDocs(spark, base, scaled, mult)
      val qs = Seq("q229_brier", "q231_dup_quality_gap", "q232_token_budget",
        "q235_quality_length_bias", "q236_dsir_ess", "q238_dedup_savings",
        "q239_lsh_recall")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new12","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new13Only) {
      scaleDocs(spark, base, scaled, mult)
      def scaleTable(name: String, offsets: Map[String, Long]): Unit =
        scaleOffsetTable(spark, base, scaled, mult, name, offsets)
      scaleTable("events", Map("event_id" -> 1000000000L, "user_id" -> 10000000L))
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).cast("array<float>").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val qs = Seq("q243_isotonic", "q251_calibrated_brier",
        "q244_prefix_dups", "q245_dup_flow", "q246_holt",
        "q248_alpha_mixture", "q249_hard_negatives", "q250_mmr")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new13","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "new15") {
      // the eighth continuation's corpus-statistics family: Heaps +
      // Chao1 (vocab-keyed state on a DISJOINT-vocab Nx corpus — the
      // worst case: vocabulary grows with the multiple), MW +
      // lognormal + burstiness (score/moment passes with key-sized
      // folds), anisotropy (one posexplode moment pass)
      scaleDocs(spark, base, scaled, mult)
      val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map { k =>
        emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          copyVariant(k).cast("array<float>").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      val qs = Seq("q269_heaps", "q270_chao1", "q271_mannwhitney",
        "q272_anisotropy", "q273_lognormal", "q274_burstiness")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new15","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (new14Only) {
      scaleDocs(spark, base, scaled, mult)
      scaleOffsetTable(spark, base, scaled, mult, "events",
        Map("event_id" -> 1000000000L, "user_id" -> 10000000L))
      val qs = Seq("q252_temp_scaling", "q255_bow_dups",
        "q256_feature_hashing", "q258_fertility", "q259_sentences",
        "q260_cut_sweep", "q262_fold_auc", "q263_dow_season")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        println(s"""{"metric":"scale_rehearsal_new14","scale":"$label","dir":"$dir","queries":$line}""")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "sql") {
      // SQL-recipe vs Scala-operator parity at the DEEPEST feasible
      // scale (VERDICT r10 item 5): only the two dedup chains run, so
      // the multiple can go past the full-chain rehearsal's disk bound
      // (the r7 100x abort was the whole battery's spill stacked on one
      // box, q22/q66's shingle-carrying sorts dominating). Also prints
      // whether the generated text still plans the single-corpus-pass
      // shape (ReusedExchange) at the scaled point — the claim is not
      // just "same wall", it's "same physics".
      scaleDocs(spark, base, scaled, mult)
      val qs = Seq("q21_dedup_minhash", "q277_sql_dedup")
      Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
        qs.foreach(q => timeQuery(spark, q, dir)) // warm
        val line = qs.map(q => "\"" + q + "\":" + timeQuery(spark, q, dir))
          .mkString("{", ",", "}")
        val df = SparkEntry.queries("q277_sql_dedup")(spark, dir)
        df.queryExecution.toRdd.count(): Unit
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val reused = plan.contains("ReusedExchange")
        println(s"""{"metric":"scale_rehearsal_sql","scale":"$label","dir":"$dir","queries":$line,"sql_plan_reused_exchange":$reused}""")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "neardup") {
      // the persistent streaming fold's per-batch cost as state grows
      // (VERDICT r10 item 1's rehearsal row): Nx corpus split into 8
      // equal-size ingests folded through the on-disk signature store —
      // the O(increment) claim is "batch 8 costs ~ batch 1" even though
      // the state behind batch 8 is 7x larger. A mid-stream compaction
      // after batch 4 exercises the maintenance path in-band.
      scaleDocs(spark, base, scaled, mult)
      val statePath = s"$scaled/neardup_state"
      val pairsDir = s"$scaled/neardup_pairs"
      val hadoopPath = new org.apache.hadoop.fs.Path(scaled)
      val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(statePath), true)
      fs.delete(new org.apache.hadoop.fs.Path(pairsDir), true)
      val docs = spark.read.parquet(s"$scaled/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nBatches = 8
      var pairsTotal = 0L
      val secs = (0 until nBatches).map { k =>
        val b = docs.filter(pmod(col("doc_id"), lit(nBatches)) === k)
        val t0 = System.nanoTime()
        val pairs = graft.streaming.StreamingDedup.foldBatchPersistent(
          statePath, b, k.toLong, pairsDir = Some(pairsDir))
        pairsTotal += pairs.count()
        val t = (System.nanoTime() - t0) / 1e9
        if (k == 3) graft.streaming.StreamingDedup.compactState(spark, statePath, 3L)
        t
      }
      val js = secs.map(s => f"$s%.3f").mkString("[", ",", "]")
      // round-12 (VERDICT r11 item 4): make the compaction BENEFIT a
      // measured row — time a full state scan (what every fold's
      // snapshot read pays) against the fragmented store, compact to
      // the newest committed batch, time it again. At 8 dirs the
      // delta is mostly task/metadata overhead; the claim it anchors
      // is the trend a 5,760-dir day would follow.
      def dirCount(): Int = fs.listStatus(new org.apache.hadoop.fs.Path(statePath))
        .map(_.getPath.getName).count(_.startsWith("batch="))
      def scanSec(): Double = {
        val t0 = System.nanoTime()
        graft.streaming.StreamingDedup.stateSigs(spark, statePath, nBatches.toLong)
          .foreach(_.queryExecution.toRdd.count(): Unit)
        (System.nanoTime() - t0) / 1e9
      }
      val (dirsPre, scanPre) = (dirCount(), scanSec())
      val tc0 = System.nanoTime()
      graft.streaming.StreamingDedup.compactState(spark, statePath, nBatches - 1L)
      val compactSec = (System.nanoTime() - tc0) / 1e9
      val (dirsPost, scanPost) = (dirCount(), scanSec())
      val stateRows = spark.read.parquet(statePath).count()
      // flat_ratio denominator = batch 2, NOT batch 1: batch 1 is
      // JVM/codegen warm-up, so dividing by it would report "flat"
      // even for a genuinely growing per-batch cost (round-11 review)
      println(s"""{"metric":"scale_rehearsal_neardup","scale":"${mult}x","batches":$nBatches,"pairs":$pairsTotal,"batch_secs":$js,"flat_ratio_post_warm":${f"${secs.last / secs(1)}%.2f"},""" +
        s""""state_rows":$stateRows,"state_dirs_pre":$dirsPre,"scan_pre_sec":${f"$scanPre%.3f"},""" +
        s""""compact_sec":${f"$compactSec%.3f"},"state_dirs_post":$dirsPost,"scan_post_sec":${f"$scanPost%.3f"}}""")
      spark.stop(); return
    }
    if (embedOnly) { runEmbed(spark, base, scaled, mult); spark.stop(); return }
    if (erOnly) { runEr(spark, base, scaled, mult); spark.stop(); return }
    if (bloomOnly) {
      runBloom(spark, base, "1x")
      scaleDocs(spark, base, scaled, mult)
      runBloom(spark, scaled, s"${mult}x")
      spark.stop(); return
    }

    scaleDocs(spark, base, scaled, mult)

    // embeddings xN: vec_id offset + circular dimension rotation per
    // copy — a permutation (orthogonal), so intra-copy cosine
    // structure is EXACT while cross-copy dots decorrelate: workload
    // grows ~N x without manufactured cross-copy near-dup cliques
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("embedding"))
    (0 until mult).map { k =>
      emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        copyVariant(k).as("embedding"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")

    def time(name: String, dir: String): Double = timeQuery(spark, name, dir)
    Seq("1x" -> base, s"${mult}x" -> scaled).foreach { case (label, dir) =>
      ChainQueries.foreach(q => time(q, dir)) // warm
      val qs = ChainQueries.map(q => "\"" + q + "\":" + time(q, dir))
        .mkString("{", ",", "}")
      // plane count scaled so buckets grow with the corpus:
      // occupancy ~ n / (bands * 2^planes) stays ~constant
      val planes = if (label == "1x") 8
        else 8 + (math.log(mult.toDouble) / math.log(2.0)).round.toInt
      embedPairs(spark, dir, planes) // warm
      val t0 = System.nanoTime()
      val pairs = embedPairs(spark, dir, planes)
      val tEmbed = (System.nanoTime() - t0) / 1e9
      // the CONTRAST case at the scaled point: planes NOT grown with
      // the corpus — per-bucket occupancy x mult, pair work x mult^2
      val fixed = if (label == "1x") "" else {
        val t1 = System.nanoTime()
        embedPairs(spark, dir, 8)
        s""","embed_fixed8_sec":${(System.nanoTime() - t1) / 1e9}"""
      }
      println(s"""{"metric":"scale_rehearsal","scale":"$label","dir":"$dir","queries":$qs,""" +
        s""""embed_planes":$planes,"embed_pairs":$pairs,"embed_sec":$tEmbed$fixed}""")
    }
    spark.stop()
  }
}
