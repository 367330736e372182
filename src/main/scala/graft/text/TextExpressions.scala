package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)`: fold (acc·131 + codepoint) mod 1e9+7 over the
  * string's Unicode code points.
  *
  * Semantics-identical to the HOF formulation
  * `aggregate(transform(sequence(1, length(t)), i -> ascii(substr(t, i, 1))), 0L, ...)`
  * (and to the DuckDB oracle's `unicode()` fold), but a native codegen
  * expression: the HOF version is interpreted AND materializes an
  * O(n) codepoint array per row with a fresh single-char UTF8String
  * per element — ~50× slower on document-sized text, which made the
  * fingerprint scan the single most expensive line of the round-6
  * battery before this. Exact integer math, < 2^63 at every step.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private[text] val Mod = 1000000007L
  private[text] val Mult = 131L

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
        java.lang.String $str = $s.toString();
        long $acc = 0L;
        int $i = 0;
        while ($i < $str.length()) {
          int $cp = $str.codePointAt($i);
          $acc = ($acc * ${Mult}L + (long) $cp) % ${Mod}L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Content-defined-chunking kernel for [[CdcChunks]] — referenced from
  * generated code via `addReferenceObj`.
  */
object CdcChunker extends Serializable {
  val Window = 16
  val Mult = 131L
  val Mod = 1000000007L
  /** boundary iff windowHash % BoundaryMod == BoundaryMod - 1 (mean
    * chunk length = BoundaryMod chars) */
  val BoundaryMod = 64L
  /** 131^Window mod Mod — the outgoing-char coefficient */
  val PowW: Long = {
    var p = 1L
    for (_ <- 1 to Window) p = p * Mult % Mod
    p
  }
  /** 131^(Window-1-k) mod Mod for k = 0..Window-1 — the unrolled
    * per-position coefficients the DuckDB oracle twin interpolates. */
  val Coef: Array[Long] = Array.tabulate(Window) { k =>
    var p = 1L
    for (_ <- 1 until Window - k) p = p * Mult % Mod
    p
  }

  /** Gear/Rabin-style content-defined chunk boundaries: a boundary
    * falls after char i iff the polynomial hash of the trailing
    * [[Window]] chars matches the [[BoundaryMod]] mask — a PURELY
    * LOCAL decision, so inserting or deleting bytes early in a
    * document shifts chunk CONTENT by at most one window instead of
    * re-aligning every fixed-width block (the property that makes
    * chunk-hash dedup shift-robust where q45's fixed blocks are not).
    * Operates on bytes (== chars on the ASCII fixture — q19/q28
    * note); one O(n) pass, exact integer math, < 2^63 throughout.
    *
    * Returns (start, len) pairs, 1-based char starts; a document
    * shorter than one window is a single chunk.
    */
  def chunks(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var h = 0L
    var start = 0 // 0-based start of the open chunk
    var i = 0
    while (i < n) {
      h = (h * Mult + (bytes(i) & 0xff)) % Mod
      if (i >= Window) h = ((h - (bytes(i - Window) & 0xff) * PowW) % Mod + Mod) % Mod
      if (i >= Window - 1 && h % BoundaryMod == BoundaryMod - 1) {
        out += new GenericInternalRow(Array[Any](start + 1, i - start + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += new GenericInternalRow(Array[Any](start + 1, n - start))
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text)`: content-defined chunk spans as
  * `array<struct<start int, len int>>` — see [[CdcChunker.chunks]].
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string input, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunker.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("cdcChunker", CdcChunker,
      CdcChunker.getClass.getName.stripSuffix("$") + "$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $kernel.chunks($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** Winnowing kernel for [[WinnowFps]] — referenced from generated
  * code via `addReferenceObj`. Semantics-identical to the HOF
  * formulation q169 first shipped (k-gram md5-prefix hashes, window
  * min, rightmost on ties, distinct positions — `WinnowSpec` asserts
  * kernel ≡ HOF on fixtures and corpus samples), but one O(m) pass:
  * a monotonic deque replaces the O(m·w²) interpreted min/filter
  * lambdas, and one reused MessageDigest replaces per-gram expression
  * trees.
  */
object Winnower extends Serializable {
  val K = 8 // char k-gram width
  val W = 4 // winnowing window, in k-grams

  /** Selected fingerprints as (pos, hash) pairs, 1-based positions in
    * first-selection order. Hash = first 8 md5 hex digits of the
    * k-gram as an unsigned int — exactly Spark's
    * `conv(substr(md5(substr(t, i, K)), 1, 8), 16, 10)`; grams come
    * from `UTF8String.substringSQL`, the same char semantics as the
    * SQL `substr` the oracle twin uses.
    */
  def fps(s: UTF8String): ArrayData = {
    val m = math.max(1, s.numChars() - K + 1)
    val width = math.min(W, m)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val d = md.digest(s.substringSQL(i + 1, K).getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      md.reset()
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val deque = new java.util.ArrayDeque[Int]()
    var lastSel = -1
    var j = 0
    while (j < m) {
      // tail-evict on >=: among equal minima only the rightmost survives
      while (!deque.isEmpty && hs(deque.peekLast) >= hs(j)) deque.pollLast()
      deque.addLast(j)
      if (j >= width - 1) {
        while (deque.peekFirst < j - width + 1) deque.pollFirst()
        val sel = deque.peekFirst
        // selections are nondecreasing in position, so adjacent-dedupe
        // IS distinct
        if (sel != lastSel) {
          out += new GenericInternalRow(Array[Any](sel + 1, hs(sel)))
          lastSel = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fps(text)`: winnowing fingerprint (pos, hash) pairs — see
  * [[Winnower.fps]].
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires string input, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    Winnower.fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("winnower", Winnower,
      Winnower.getClass.getName.stripSuffix("$") + "$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $kernel.fps($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Deterministic zlib helper for [[DeflateRatio]] — referenced from
  * generated code via `addReferenceObj`.
  */
object Zlib extends Serializable {
  /** deflate(bytes).length at a FIXED level (6), basis points of the
    * raw length: low = highly compressible (repetitive), ~10000+ =
    * incompressible. Empty input → 10000 (defined as neutral).
    */
  def ratioBp(bytes: Array[Byte]): Long = {
    if (bytes.isEmpty) return 10000L
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total * 10000L / bytes.length
    } finally d.end()
  }
}

/** `deflate_ratio_bp(text)`: zlib-compressed size as basis points of
  * the UTF-8 byte length — the compression-ratio quality signal
  * (Gopher-style): near-duplicate boilerplate and degenerate
  * repetition compress far below natural text, catching what
  * token-level stats miss. Integer output, deterministic for a fixed
  * zlib level.
  *
  * No DuckDB twin exists (no zlib there), so this ships as a
  * spec-verified function rather than an oracle-checked battery query.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio_bp requires string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_ratio_bp"

  override def nullSafeEval(input: Any): Any =
    Zlib.ratioBp(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zlib = ctx.addReferenceObj("zlib", Zlib, Zlib.getClass.getName.stripSuffix("$") + "$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $zlib.ratioBp($s.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Shared code-point decoding for the string-metric kernels (round-13,
  * ADVICE r12): both kernels iterate UNICODE CODE POINTS — Spark's own
  * `levenshtein`/`length` convention — never UTF-16 code units. This
  * is what makes the [[graft.plans.EditDistancePrefilter]] guard
  * `|length(a) − length(b)| ≤ k` a true implication of `dl(a,b) ≤ k`
  * for every string: one code-point edit changes the code-point length
  * by at most 1, while a code-UNIT iteration would let one insert of a
  * surrogate pair shift `length()` by 2. Note the semantics landscape,
  * probed empirically: DuckDB's core kernels operate on UTF-8 BYTES
  * (`damerau_levenshtein('𝄞','a') = 4`), Spark's builtins on code
  * points — the three regimes coincide exactly on the ASCII plane,
  * which is where the q291/q292 cross-engine oracles live
  * (`JaroWinklerSpec` covers the non-ASCII planes in-engine).
  */
private[text] object CodePoints {
  def of(u: UTF8String): Array[Int] = {
    val s = u.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      out(k) = c
      k += 1
      i += Character.charCount(c)
    }
    out
  }
}

/** Textbook Jaro–Winkler kernel — referenced from generated code via
  * `addReferenceObj`. Semantics pinned to DuckDB's core
  * `jaro_winkler_similarity` on the ASCII plane (the q291 oracle),
  * probed empirically: match window `max(|a|,|b|)/2 − 1` (so
  * "ab"/"ba" = 0.0 — window 0), transpositions = half the
  * matched-order mismatches, Winkler boost `+ ℓ·0.1·(1−jaro)` with
  * prefix ℓ ≤ 4 applied only when jaro > 0.7, both-empty = 0.0
  * (DuckDB's convention, not the usual 1.0). Lengths/positions are
  * CODE POINTS ([[CodePoints]] — beyond ASCII, DuckDB's byte regime
  * deliberately diverges).
  */
object JaroWinklerKernel extends Serializable {
  def jw(au: UTF8String, bu: UTF8String): Double = {
    val a = CodePoints.of(au)
    val b = CodePoints.of(bu)
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var tRaw = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) tRaw += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - tRaw / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)`: the record-linkage string similarity Spark
  * lacks as a built-in, as a codegen expression (the `levenshtein`
  * complement — JW weights shared prefixes and tolerates
  * transpositions, the right metric for names/titles where edit
  * distance over-penalizes swapped tokens). Cross-engine-validated:
  * q291 scores the same candidate pairs DuckDB scores with its core
  * `jaro_winkler_similarity`.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("jwKernel", JaroWinklerKernel,
      JaroWinklerKernel.getClass.getName.stripSuffix("$") + "$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel.jw($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Full Damerau–Levenshtein (Lowrance–Wagner — transpositions may be
  * followed by further edits, so dl("CA","ABC") = 2 where the
  * restricted OSA variant says 3). Pinned to DuckDB's core
  * `damerau_levenshtein` on the ASCII plane (probed: the full
  * variant; beyond ASCII DuckDB counts UTF-8 bytes, this kernel CODE
  * POINTS — see [[CodePoints]]). O(|a|·|b|) ints plus a
  * last-occurrence map — name-field sized inputs.
  */
object DamerauLevenshteinKernel extends Serializable {
  def dl(au: UTF8String, bu: UTF8String): Long = {
    val a = CodePoints.of(au)
    val b = CodePoints.of(bu)
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = da.getOrDefault(b(j - 1), 0)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        var best = h(i)(j) + cost                       // substitute / match
        if (h(i + 1)(j) + 1 < best) best = h(i + 1)(j) + 1   // insert
        if (h(i)(j + 1) + 1 < best) best = h(i)(j + 1) + 1   // delete
        val tr = h(k)(l) + (i - k - 1) + 1 + (j - l - 1)     // transpose
        if (tr < best) best = tr
        h(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    h(la + 1)(lb + 1).toLong
  }
}

/** `damerau_levenshtein(a, b)`: edit distance with transpositions —
  * the dedup/ER budget metric that stops over-charging swapped
  * characters (lev says "ab"→"ba" costs 2; one transposition is one
  * human error). Cross-engine-validated by q292 against DuckDB's core
  * implementation; integer output, so the compare is hash-exact.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinKernel.dl(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("dlKernel", DamerauLevenshteinKernel,
      DamerauLevenshteinKernel.getClass.getName.stripSuffix("$") + "$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel.dl($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
