package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.UrlCanon

/** Rule-by-rule canonicalization table plus idempotence: canonical
  * output is a fixed point of the canonicalizer.
  */
class UrlCanonSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlCanon.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme and host lowercase; default port strips; fragment drops") {
    assert(canon("HTTPS://Example.COM:443/a#frag") === Seq("https://example.com/a"))
    assert(canon("HTTP://X.org:80/a") === Seq("http://x.org/a"))
  }

  test("non-default port survives") {
    assert(canon("https://example.com:8443/a") === Seq("https://example.com:8443/a"))
    // http's default is NOT https' default
    assert(canon("http://example.com:443/a") === Seq("http://example.com:443/a"))
  }

  test("path normalization: empty -> /, trailing slashes trim, root stays /") {
    assert(canon("https://a.com") === Seq("https://a.com/"))
    assert(canon("https://a.com/") === Seq("https://a.com/"))
    assert(canon("https://a.com/x/y///") === Seq("https://a.com/x/y"))
  }

  test("query params sort; empty segments and empty query drop") {
    assert(canon("https://a.com/p?b=2&a=1") === Seq("https://a.com/p?a=1&b=2"))
    assert(canon("https://a.com/p?b=2&&a=1&") === Seq("https://a.com/p?a=1&b=2"))
    assert(canon("https://a.com/p?") === Seq("https://a.com/p"))
  }

  test("full variant set collapses to one key") {
    val variants = Seq(
      "HTTPS://Example.COM:443/t/?b=9&a=3#s",
      "https://example.com/t?a=3&b=9",
      "https://EXAMPLE.com/t///?b=9&&a=3")
    assert(canon(variants: _*).distinct === Seq("https://example.com/t?a=3&b=9"))
  }

  test("unparseable inputs (no scheme://host) canonicalize to null, not pseudo-keys") {
    assert(canon("not a url", "/relative/path", "example.com/no-scheme", "http://")
      === Seq(null, null, null, null))
  }

  test("canonicalize is idempotent on its own output") {
    val ins = Seq("HTTPS://Example.COM:443/a/b/?z=1&y=2#f",
      "http://h.net:8080/", "https://a.com/p?")
    val once = canon(ins: _*)
    assert(canon(once: _*) === once)
  }
}
