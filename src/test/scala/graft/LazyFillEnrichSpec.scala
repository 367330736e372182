package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Enrich, RowLazyFillEnrich}
import graft.pipeline.RowLazyFillEnrich.AppInfo

/** Executor-resident per-row lazy-fill enrichment (the reference's
  * record-loop cache, caching_lazyfill.go:87-157): value equivalence
  * with the broadcast join, fill-once-per-key economics, negative
  * caching, TTL refill, and the map-only (shuffle-free) plan shape.
  */
object LazyFillEnrichSpec {
  // statics shared across tasks in local mode's single JVM
  val fills = new ConcurrentHashMap[String, AtomicInteger]()
  @volatile var clockMs: Long = 0L

  val dimData: Map[String, AppInfo] = Map(
    "a1" -> AppInfo("app-one", "s1", "space-one", "o1", "org-one"),
    "a2" -> AppInfo("app-two", "s1", "space-one", "o1", "org-one"),
    "a3" -> AppInfo("app-three", "s2", "space-two", "o2", "org-two"))

  val countingLoader: String => Option[AppInfo] = { k =>
    fills.computeIfAbsent(k, _ => new AtomicInteger()).incrementAndGet()
    dimData.get(k)
  }

  case class Rec(appId: String, msg: String)
}

class LazyFillEnrichSpec extends AnyFunSuite {
  import LazyFillEnrichSpec._
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val records = (1 to 40).map(i => Rec(s"a${i % 4}", s"m$i")) // a0 is a MISS

  test("per-row cached enrichment == broadcast-join enrichment, map-only plan") {
    import spark.implicits._
    RowLazyFillEnrich.reset("equiv")
    val ds = spark.createDataset(records).repartition(4)
    val out = RowLazyFillEnrich.mapWithAppInfo(
        ds, "equiv", ttlMs = 3600000L, loader = countingLoader)(_.appId)(
        (r, i) => (r.appId, r.msg, i.map(_.appName).orNull,
          i.map(_.spaceName).orNull, i.map(_.orgName).orNull))
      .toDF("app_id", "msg", "app_name", "space_name", "org_name")
    // no exchange anywhere: the stage must preserve per-shard order
    out.collect()
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

    // broadcast twin over the same dimension
    val dims = dimData.toSeq.map { case (g, a) =>
      (g, a.appName, a.spaceGuid, a.spaceName, a.orgGuid, a.orgName)
    }.toDF("app_guid", "app_name", "space_guid", "space_name", "org_guid", "org_name")
    val viaJoin = Enrich.enrich(
        ds.toDF("appId", "msg"), dims, col("appId"), lit(""),
        ignoreMissingApps = false, validateGuid = false)
      .select(col("appId"), col("msg"), col("`@cf.app`"),
        col("`@cf.space`"), col("`@cf.org`"))
    val a = out.collect().map(r => (0 to 4).map(r.get).mkString("|")).sorted
    val b = viaJoin.collect().map(r => (0 to 4).map(r.get).mkString("|")).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("each distinct key fills exactly once per JVM; misses are negative-cached") {
    import spark.implicits._
    RowLazyFillEnrich.reset("fillonce")
    fills.clear()
    val ds = spark.createDataset(records).repartition(4)
    RowLazyFillEnrich.mapWithAppInfo(
        ds, "fillonce", ttlMs = 3600000L, loader = countingLoader)(_.appId)(
        (r, i) => (r.msg, i.isDefined))
      .collect()
    // 40 records, 4 distinct keys (one a miss): 4 fills total — the
    // miss 'a0' is cached as None, not re-fetched per record
    assert(fills.size() == 4, s"expected 4 distinct fills, got ${fills.size()}")
    fills.forEach((k, n) => assert(n.get() == 1, s"key $k filled ${n.get()} times"))
  }

  test("a DIFFERENT loader reusing a cacheId fails fast even when the ttl matches") {
    import spark.implicits._
    RowLazyFillEnrich.reset("loadertag")
    val one = spark.createDataset(Seq(Rec("a1", "x"))).coalesce(1)
    RowLazyFillEnrich.mapWithAppInfo(
        one, "loadertag", ttlMs = 3600000L, loader = countingLoader)(_.appId)(
        (r, i) => i.map(_.appName).orNull)
      .collect()
    // same id, same ttl, different fill function: before the loader
    // fingerprint this silently served the FIRST loader's cache
    val otherLoader: String => Option[AppInfo] = _ => None
    val ex = intercept[Exception] {
      RowLazyFillEnrich.mapWithAppInfo(
          one, "loadertag", ttlMs = 3600000L, loader = otherLoader)(_.appId)(
          (r, i) => i.map(_.appName).orNull)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("loader")),
      s"expected the loader-fingerprint mismatch, got: $ex")
    // an explicit loaderTag names runtime config the closure class can't
    RowLazyFillEnrich.reset("loadertag")
    RowLazyFillEnrich.mapWithAppInfo(
        one, "loadertag", ttlMs = 3600000L, loader = otherLoader)(_.appId)(
        (r, i) => i.map(_.appName).orNull, loaderTag = "cfg-v1")
      .collect()
    val ex2 = intercept[Exception] {
      RowLazyFillEnrich.mapWithAppInfo(
          one, "loadertag", ttlMs = 3600000L, loader = otherLoader)(_.appId)(
          (r, i) => i.map(_.appName).orNull, loaderTag = "cfg-v2")
        .collect()
    }
    assert(messages(ex2).exists(_.contains("cfg-v1")),
      s"expected the explicit-tag mismatch, got: $ex2")
  }

  test("TTL lapse refills through the injected clock; fresh entries don't") {
    import spark.implicits._
    RowLazyFillEnrich.reset("ttl")
    fills.clear()
    clockMs = 0L
    val clock: () => Long = () => clockMs
    val one = spark.createDataset(Seq(Rec("a1", "x"))).coalesce(1)
    def pass(): Unit = RowLazyFillEnrich.mapWithAppInfo(
        one, "ttl", ttlMs = 1000L, loader = countingLoader)(_.appId)(
        (r, i) => i.map(_.appName).orNull, now = clock, jitter = () => 1.0)
      .collect(): Unit
    pass()
    pass() // within TTL: served from cache
    assert(fills.get("a1").get() == 1)
    clockMs = 1500L // past the 1s deadline
    pass()
    assert(fills.get("a1").get() == 2, "expired entry must refill")
  }
}
