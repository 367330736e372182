package graft.grok

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Matcher, Pattern}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One semantic capture inside a compiled grok pattern.
  *
  * @param name  the capture's semantic name (alias if given, else the
  *              referenced pattern's name)
  * @param group the 1-based regex group index backing it
  * @param typ   "string" | "int" | "float" (`%{P:alias:type}` annotation)
  */
final case class GrokCapture(name: String, group: Int, typ: String)

final class GrokCompileException(msg: String) extends RuntimeException(msg)

/** A grok pattern compiled to a single `java.util.regex.Pattern`.
  *
  * Capture groups are tracked by *index*, never by regex group name —
  * this supports duplicate semantic names and names that are illegal
  * Java group identifiers (e.g. `rtr_app_id`), which the reference's
  * Go library expresses as `(?P<name>…)` groups
  * (`/root/reference/vendor/github.com/vjeantet/grok/grok.go:344-352`).
  *
  * Match semantics mirror `grok.Parse`/`ParseTyped`
  * (`grok.go:201-225, 228-259`): unanchored first match; on no match an
  * empty capture set; duplicate names keep the value of the *last*
  * group (even if that group did not participate — faithfully yielding
  * `""`); `:int`/`:float` coerce with errors mapped to 0 / 0.0 (Go's
  * discarded `strconv` error).
  */
final class CompiledGrok private[grok] (
    val source: String,
    val regexSource: String,
    val captures: Array[GrokCapture],
    val restrict: Option[Seq[String]] = None) extends Serializable {

  @transient lazy val pattern: Pattern = Pattern.compile(regexSource)

  @transient private lazy val localMatcher: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => pattern.matcher(""))

  /** Distinct capture names in first-seen order; value comes from the
    * highest (= last) group index carrying that name. With `restrict`,
    * only the listed names, in the listed order (capture pruning).
    */
  val fields: Array[GrokCapture] = {
    val byName = mutable.LinkedHashMap.empty[String, GrokCapture]
    captures.foreach { c =>
      byName.get(c.name) match {
        case Some(prev) => byName(c.name) = prev.copy(group = math.max(prev.group, c.group))
        case None => byName(c.name) = c
      }
    }
    restrict match {
      case Some(names) => names.flatMap(byName.get).toArray
      case None => byName.values.toArray
    }
  }

  /** Pruned variant emitting only `names` (same regex, fewer group
    * extractions + a narrower output row). Unknown names are dropped.
    */
  def project(names: Seq[String]): CompiledGrok =
    new CompiledGrok(source, regexSource, captures, Some(names))

  def sqlType(typ: String): DataType = typ match {
    case "int" => LongType
    case "float" => DoubleType
    case _ => StringType
  }

  /** Struct emitted by grok_extract: one field per distinct capture. */
  val schema: StructType =
    StructType(fields.map(f => StructField(f.name, sqlType(f.typ), nullable = false)))

  /** `find()` with regex-engine stack exhaustion mapped to NO MATCH.
    *
    * `java.util.regex` backtracks recursively — one stack frame per
    * quantifier iteration — so a pathological input (e.g. a
    * several-thousand-label dotted hostname against `HOSTNAME`'s
    * `(?:\.[…])*` loop) throws StackOverflowError. The reference's Go
    * RE2 engine is linear-time/constant-stack and would simply not
    * match; letting the error fly would instead kill the Spark task
    * (and the job, after retries) on ONE adversarial log line.
    * Divergence is confined to inputs no real producer emits; the
    * no-match path (GENERIC fallback / malformed counter) handles
    * them downstream. Adversarial GREEDYDATA backtracking cost stays
    * polynomial and is bounded by input length — see the grok
    * backtracking property spec, which pins ~linear growth and keeps
    * an absolute per-eval bound at 8 KiB lines.
    */
  private def safeFind(m: Matcher): Boolean =
    try m.find() catch { case _: StackOverflowError => false }

  def matches(s: UTF8String): Boolean =
    safeFind(localMatcher.get().reset(s.toString))

  private def coerce(raw0: String, typ: String): Any = {
    val raw = if (raw0 == null) "" else raw0 // non-participating group: Go yields ""
    typ match {
      case "int" =>
        try java.lang.Long.valueOf(java.lang.Long.parseLong(raw))
        catch { case _: NumberFormatException => java.lang.Long.valueOf(0L) }
      case "float" =>
        try java.lang.Double.valueOf(java.lang.Double.parseDouble(raw))
        catch { case _: NumberFormatException => java.lang.Double.valueOf(0.0) }
      case _ => UTF8String.fromString(raw)
    }
  }

  /** Typed-struct extraction; null when the pattern does not match. */
  def evalRow(s: UTF8String): InternalRow = {
    val m = localMatcher.get().reset(s.toString)
    if (!safeFind(m)) return null
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      values(i) = coerce(m.group(f.group), f.typ)
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** `map<string,string>` extraction (grok.Parse shape); empty map when
    * the pattern does not match.
    */
  def evalMap(s: UTF8String): MapData = {
    val m = localMatcher.get().reset(s.toString)
    if (!safeFind(m)) {
      return new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    }
    val keys = new Array[Any](fields.length)
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      val raw = m.group(f.group)
      keys(i) = UTF8String.fromString(f.name)
      values(i) = UTF8String.fromString(if (raw == null) "" else raw)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}

/** Grok pattern library + compiler.
  *
  * Composition (`%{NAME}`, `%{NAME:alias}`, `%{NAME:alias:type}`)
  * expands recursively against [[patterns]] with cycle detection; with
  * `namedCapturesOnly = false` (the reference's configuration,
  * `/root/reference/main.go:558`) every referenced pattern *itself*
  * becomes a capture, so `%{GENERIC}` yields both `GENERIC` and
  * `log_event`. Compiled patterns are cached per pattern string
  * (mirrors `grok.go:290-317`); expansion happens once at plan time,
  * never per row.
  */
final class GrokLibrary(
    val patterns: Map[String, String],
    val namedCapturesOnly: Boolean) extends Serializable {

  @transient private lazy val cache = new ConcurrentHashMap[String, CompiledGrok]()

  def compile(pattern: String): CompiledGrok =
    cache.computeIfAbsent(pattern, p => doCompile(p))

  private val TokenRe = Pattern.compile("""^\w+(?::\w+(?::\w+)?)?$""")

  private def doCompile(top: String): CompiledGrok = {
    val sb = new java.lang.StringBuilder
    val caps = mutable.ArrayBuffer.empty[GrokCapture]
    val types = mutable.HashMap.empty[String, String]
    var groups = 0

    def emit(p: String, stack: List[String], topLevel: Boolean): Unit = {
      var i = 0
      var inClass = false
      while (i < p.length) {
        val c = p.charAt(i)
        if (c == '\\' && i + 1 < p.length) {
          sb.append(c).append(p.charAt(i + 1)); i += 2
        } else if (inClass) {
          if (c == ']') inClass = false
          sb.append(c); i += 1
        } else if (c == '[') {
          inClass = true; sb.append(c); i += 1
        } else if (c == '%' && i + 1 < p.length && p.charAt(i + 1) == '{') {
          val close = p.indexOf('}', i + 2)
          val token = if (close < 0) null else p.substring(i + 2, close)
          if (token == null || !TokenRe.matcher(token).matches()) {
            // leave malformed %{…} literal (grok.go `normal` regex misses
            // it); escape the brace — literal in RE2, quantifier in Java
            sb.append("%\\{"); i += 2
          } else {
            val parts = token.split(':')
            val syntax = parts(0)
            val hasAlias = parts.length > 1
            val semantic = if (hasAlias) parts(1) else syntax
            if (parts.length == 3 && parts(2) != "string") {
              // top-level annotations overwrite; nested ones only fill gaps
              // (grok.go:331-335 + 354-359 merge order)
              if (topLevel) types(semantic) = parts(2)
              else if (!types.contains(semantic)) types(semantic) = parts(2)
            }
            if (stack.contains(syntax)) {
              throw new GrokCompileException(
                s"recursive pattern reference %{$syntax} via ${stack.mkString(" -> ")}")
            }
            val body = patterns.getOrElse(syntax,
              throw new GrokCompileException(s"no pattern found for %{$syntax}"))
            if (!namedCapturesOnly || hasAlias) {
              groups += 1
              caps += GrokCapture(semantic, groups, "string")
              sb.append('(')
              emit(body, syntax :: stack, topLevel = false)
              sb.append(')')
            } else {
              sb.append("(?:")
              emit(body, syntax :: stack, topLevel = false)
              sb.append(')')
            }
            i = close + 1
          }
        } else if (c == '(') {
          if (i + 1 < p.length && p.charAt(i + 1) == '?') {
            val isNamed = p.startsWith("(?P<", i) ||
              (p.startsWith("(?<", i) && i + 3 < p.length &&
                p.charAt(i + 3) != '=' && p.charAt(i + 3) != '!')
            if (isNamed) {
              // raw named group in a pattern body: track as a capture,
              // emit as a plain group (duplicate-name safe)
              val start = i + (if (p.charAt(i + 2) == 'P') 4 else 3)
              val gt = p.indexOf('>', start)
              if (gt < 0) throw new GrokCompileException(s"unterminated named group in: $p")
              groups += 1
              caps += GrokCapture(p.substring(start, gt), groups, "string")
              sb.append('(')
              i = gt + 1
            } else {
              sb.append(c); i += 1 // (?: (?> (?= (?! (?<= (?<! — non-capturing
            }
          } else {
            groups += 1 // anonymous group inside a library pattern body
            sb.append(c); i += 1
          }
        } else {
          sb.append(c); i += 1
        }
      }
    }

    emit(top, Nil, topLevel = true)
    val typed = caps.map(c => c.copy(typ = types.getOrElse(c.name, "string"))).toArray
    val compiled = new CompiledGrok(top, sb.toString, typed)
    compiled.pattern // force regex compile now: fail at plan time, not per task
    compiled
  }
}

object GrokLibrary {
  /** Reference configuration: default library + the 7 application
    * patterns, NamedCapturesOnly=false (`/root/reference/main.go:558-568`).
    */
  lazy val default: GrokLibrary = new GrokLibrary(GrokPatterns.all, namedCapturesOnly = false)
}
