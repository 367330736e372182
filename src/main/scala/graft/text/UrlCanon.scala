package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-normalization step in front of every
  * web-corpus dedup/caps/grouping stage (CommonCrawl-style curation:
  * the same page arrives as `HTTPS://Example.COM:443/a/?b=2&a=1#frag`
  * and `https://example.com/a?a=1&b=2` and must collapse to ONE key
  * before per-URL dedup or per-domain caps mean anything).
  *
  * Rules applied (the conservative, semantics-preserving subset of
  * RFC 3986 §6 normalization):
  *   - scheme and host lowercased
  *   - default ports stripped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - fragment dropped
  *   - empty path → `/`; trailing slashes trimmed off non-root paths
  *   - query parameters sorted bytewise; empty fragments of the
  *     query string (`a=1&&b=2`) dropped; a fully-empty query (`?`)
  *     dropped
  *
  * Everything is built from codegen string/array functions shared
  * verbatim (modulo dialect) with the DuckDB oracle — regexes stay in
  * the Java∩RE2 subset (no lookaround), splitting/sorting uses
  * split + array_sort on both engines. Per-row, no state, no shuffle:
  * at 100 TB this is a narrow projection that runs wherever the rows
  * already are.
  */
object UrlCanon {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  def host(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, HostPortRe, 1), "^([^:]*)", 1))

  /** Port with the `:` prefix, or '' when absent / default-for-scheme. */
  def portPart(url: Column): Column = {
    val p = regexp_extract(regexp_extract(url, HostPortRe, 1), ":([0-9]+)$", 1)
    val s = scheme(url)
    when(p === "", lit(""))
      .when(s === "http" && p === "80", lit(""))
      .when(s === "https" && p === "443", lit(""))
      .otherwise(concat(lit(":"), p))
  }

  /** Path with `''` → `/` and trailing slashes trimmed on non-root. */
  def path(url: Column): Column = {
    val raw = regexp_extract(url, PathRe, 1)
    val trimmed = regexp_replace(raw, "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Sorted, empty-stripped query with the `?` prefix, or ''. */
  def queryPart(url: Column): Column = {
    val q = regexp_extract(url, QueryRe, 1)
    val params = array_sort(filter(split(q, "&"), _ =!= ""))
    val joined = array_join(params, "&")
    when(joined === "", lit("")).otherwise(concat(lit("?"), joined))
  }

  /** Null for inputs with no parseable `scheme://host` prefix (crawl
    * data is full of them; fabricating `://…` keys would silently
    * merge all garbage into pseudo-URLs). Callers drop or route
    * nulls explicitly.
    */
  def canonicalize(url: Column): Column =
    when(scheme(url) === "" || host(url) === "", lit(null).cast("string"))
      .otherwise(concat(scheme(url), lit("://"), host(url), portPart(url),
        path(url), queryPart(url)))
}
