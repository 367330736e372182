package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Enrich
import graft.sources.PagedSource

/** REST-paginator drain (`caching_lazyfill.go:51-80, 161-190` shape):
  * token threading, termination, runaway guard, and feeding the
  * drained dimension into the enrichment resolve.
  */
class PagedSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val pages = Map(
    None -> (Seq(("g1", "app-one-venerable", "s1"), ("g2", "app-two", "s1")), Some("p2")),
    Some("p2") -> (Seq(("g3", "app-three", "s2")), Some("p3")),
    Some("p3") -> (Seq.empty[(String, String, String)], None))

  test("drains every page following next tokens; empty tail page is fine") {
    val df = PagedSource.loadAll(spark, (t: Option[String]) => pages(t))
      .toDF("app_guid", "name", "space_guid")
    assert(df.count() === 3)
    assert(df.select("app_guid").collect().map(_.getString(0)).sorted
      === Array("g1", "g2", "g3"))
  }

  test("a token loop hits the page guard instead of spinning forever") {
    val looping: Option[String] => (Seq[(String, String)], Option[String]) =
      _ => (Seq(("x", "y")), Some("again"))
    val e = intercept[IllegalStateException] {
      PagedSource.loadAll(spark, looping, maxPages = 5)
    }
    assert(e.getMessage.contains("5 pages"))
  }

  test("paged apps feed resolveDims like any table-loaded dimension") {
    import spark.implicits._
    val apps = PagedSource.loadAll(spark, (t: Option[String]) => pages(t))
      .toDF("app_guid", "name", "space_guid")
    val spaces = Seq(("s1", "prod", "o1"), ("s2", "dev", "o1"))
      .toDF("space_guid", "name", "org_guid")
    val orgs = Seq(("o1", "agency")).toDF("org_guid", "name")
    val dims = Enrich.resolveDims(apps, spaces, orgs).collect()
    assert(dims.length === 3)
    val one = dims.find(_.getAs[String]("app_guid") == "g1").get
    assert(one.getAs[String]("app_name") === "app-one") // suffix stripped
    assert(one.getAs[String]("org_name") === "agency")  // chain resolved
  }
}
