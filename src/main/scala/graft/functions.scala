package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.grok.{GrokExtract, GrokExtractMap, GrokMatch}
import graft.sim.{VectorArgmaxCos, VectorCosine, VectorDot, VectorL2Sq, VectorNorm, VectorTop2Cos}

/** Column-API and SQL surface for the engine's custom expressions. */
object functions {

  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  /** Typed-struct grok extraction; see [[graft.grok.GrokExtract]]. */
  def grok_extract(c: Column, pattern: String): Column = col(GrokExtract(expr(c), pattern))

  /** map<string,string> grok extraction; see [[graft.grok.GrokExtractMap]]. */
  def grok_extract_map(c: Column, pattern: String): Column = col(GrokExtractMap(expr(c), pattern))

  /** Boolean grok match; see [[graft.grok.GrokMatch]]. */
  def grok_match(c: Column, pattern: String): Column = col(GrokMatch(expr(c), pattern))

  /** Codegen'd vector math over array<float|double> embeddings. */
  def vec_dot(a: Column, b: Column): Column = col(VectorDot(expr(a), expr(b)))
  def vec_norm(a: Column): Column = col(VectorNorm(expr(a)))
  def vec_cosine(a: Column, b: Column): Column = col(VectorCosine(expr(a), expr(b)))
  def vec_l2sq(a: Column, b: Column): Column = col(VectorL2Sq(expr(a), expr(b)))
  def vec_argmax_cos(v: Column, cents: Column): Column =
    col(VectorArgmaxCos(expr(v), expr(cents)))
  def vec_top2_cos(v: Column, cents: Column): Column =
    col(VectorTop2Cos(expr(v), expr(cents)))

  /** Codegen'd rolling polynomial text fingerprint; see [[graft.text.RollingHash]]. */
  def rolling_hash(c: Column): Column = col(graft.text.RollingHash(expr(c)))

  /** Compression-ratio quality signal; see [[graft.text.DeflateRatio]]. */
  def deflate_ratio_bp(c: Column): Column = col(graft.text.DeflateRatio(expr(c)))

  /** Content-defined chunk spans; see [[graft.text.CdcChunks]]. */
  def cdc_chunks(c: Column): Column = col(graft.text.CdcChunks(expr(c)))

  /** Winnowing fingerprints; see [[graft.text.WinnowFps]]. */
  def winnow_fps(c: Column): Column = col(graft.text.WinnowFps(expr(c)))

  /** Jaro–Winkler string similarity; see [[graft.text.JaroWinkler]]. */
  def jaro_winkler(a: Column, b: Column): Column =
    col(graft.text.JaroWinkler(expr(a), expr(b)))

  /** Full Damerau–Levenshtein; see [[graft.text.DamerauLevenshtein]]. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    col(graft.text.DamerauLevenshtein(expr(a), expr(b)))

  /** Hilbert-curve index; see [[graft.layout.Hilbert]]. */
  def hilbert_d(x: Column, y: Column, bits: Int): Column =
    graft.layout.Hilbert.hValue(x, y, bits)

  private def literalString(e: Expression, fn: String): String = e match {
    case Literal(s, _: StringType) if s != null => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn requires a foldable string literal grok pattern, got: $e")
  }

  /** Registers grok_* for SQL use: `SELECT grok_extract(line, '%{GENERIC}').log_event`. */
  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "grok_extract",
      es => GrokExtract(es.head, literalString(es(1), "grok_extract")))
    Bridge.registerFunction(spark, "grok_extract_map",
      es => GrokExtractMap(es.head, literalString(es(1), "grok_extract_map")))
    Bridge.registerFunction(spark, "grok_match",
      es => GrokMatch(es.head, literalString(es(1), "grok_match")))
    Bridge.registerFunction(spark, "vec_dot", es => VectorDot(es.head, es(1)))
    Bridge.registerFunction(spark, "vec_norm", es => VectorNorm(es.head))
    Bridge.registerFunction(spark, "vec_cosine", es => VectorCosine(es.head, es(1)))
    Bridge.registerFunction(spark, "vec_l2sq", es => VectorL2Sq(es.head, es(1)))
    Bridge.registerFunction(spark, "vec_argmax_cos",
      es => VectorArgmaxCos(es.head, es(1)))
    Bridge.registerFunction(spark, "vec_top2_cos",
      es => VectorTop2Cos(es.head, es(1)))
    Bridge.registerFunction(spark, "rolling_hash", es => graft.text.RollingHash(es.head))
    Bridge.registerFunction(spark, "deflate_ratio_bp", es => graft.text.DeflateRatio(es.head))
    Bridge.registerFunction(spark, "cdc_chunks", es => graft.text.CdcChunks(es.head))
    Bridge.registerFunction(spark, "winnow_fps", es => graft.text.WinnowFps(es.head))
    Bridge.registerFunction(spark, "jaro_winkler",
      es => graft.text.JaroWinkler(es.head, es(1)))
    Bridge.registerFunction(spark, "damerau_levenshtein",
      es => graft.text.DamerauLevenshtein(es.head, es(1)))
    Bridge.registerFunction(spark, "hilbert_d", es =>
      graft.layout.HilbertD(es.head, es(1), es(2) match {
        case Literal(v, _: IntegerType) if v != null => v.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"hilbert_d requires a foldable int literal bit width, got: $other")
      }))
  }
}
