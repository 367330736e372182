package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Enrich

/** Per-origin enrichment truth table (reference `main.go:79-109`: one
  * CF client+cache per origin; `main.go:332,94`: unrecognised origin →
  * `augmentWithAppInfo` errors → row kept WITHOUT the six keys,
  * `main.go:417-419`).
  */
class EnrichOriginSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get("local[2]", "2")
  import spark.implicits._

  private val GuidA = "f47ac10b-58cc-4372-a567-0e02b2c3d479"
  private val GuidMiss = "00000000-0000-0000-0000-00000000dead"

  private def dims = Seq(
    ("env1", GuidA, "app-one", "s1", "space-one", "o1", "org-one"),
    ("env2", GuidA, "APP-ONE-PROD", "s2", "space-two", "o2", "org-two")
  ).toDF("origin", "app_guid", "app_name", "space_guid", "space_name", "org_guid", "org_name")

  private def logs = Seq(
    ("r_env1_hit", "env1", GuidA, ""),
    ("r_env2_hit", "env2", GuidA, ""),      // same guid, different universe
    ("r_env1_miss", "env1", GuidMiss, ""),
    ("r_unknown_origin", "env3", GuidA, ""),
    ("r_no_key", "env1", "", "")
  ).toDF("row_id", "env", "app_id", "rtr_app_id")

  private def run(ignoreMissing: Boolean) =
    Enrich.enrichPerOrigin(logs, dims, col("env"), col("app_id"), col("rtr_app_id"),
        ignoreMissingApps = ignoreMissing, colPrefix = "cf_")
      .select("row_id", "cf_app", "cf_app_id", "cf_space", "cf_org")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap

  test("same guid resolves through its origin's own dimension universe") {
    val out = run(ignoreMissing = true)
    assert(out("r_env1_hit") === (("app-one", GuidA, "space-one", "org-one")))
    assert(out("r_env2_hit") === (("APP-ONE-PROD", GuidA, "space-two", "org-two")))
  }

  test("unrecognised origin keeps the row with all keys null (ignoring: path)") {
    val out = run(ignoreMissing = true)
    assert(out.contains("r_unknown_origin"))
    assert(out("r_unknown_origin") === ((null, null, null, null)))
  }

  test("no resolvable key drops the row in both modes") {
    assert(!run(ignoreMissing = true).contains("r_no_key"))
    assert(!run(ignoreMissing = false).contains("r_no_key"))
  }

  test("known-origin miss: IgnoreMissingApps=true sets raw guid + empty names") {
    val out = run(ignoreMissing = true)
    assert(out("r_env1_miss") === (("", GuidMiss, "", "")))
  }

  test("known-origin miss: IgnoreMissingApps=false leaves all keys null, row kept") {
    val out = run(ignoreMissing = false)
    assert(out("r_env1_miss") === ((null, null, null, null)))
    // hits still resolve
    assert(out("r_env1_hit") === (("app-one", GuidA, "space-one", "org-one")))
  }

  test("assembleMultiEnv: lookup origin is the envelope's; unconfigured env keeps rows keyless") {
    // dims configured ONLY for system.example.gov.au; the fixtures'
    // env2 rows (missing/invalid guid) must keep their keys null
    // instead of the single-env raw-guid-empty-names degradation
    val originDims = Fixtures.dims(spark)
      .withColumn("origin", org.apache.spark.sql.functions.lit("system.example.gov.au"))
    val out = graft.pipeline.Pipeline
      .assembleMultiEnv(Fixtures.records(spark), originDims)
      .select(col("file_path"), col("`@cf.app`"), col("`@cf.app_id`"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out.keySet === Set("router/0", "APP/PROC/WEB/0", "APP/PROC/WEB/1", "APP/PROC/WEB/2"))
    // configured origin resolves (suffix strip intact)
    assert(out("APP/PROC/WEB/0") === (("myapp", Fixtures.AppGuid.toUpperCase)))
    // env2 is not a configured environment: rows kept, keys null
    assert(out("APP/PROC/WEB/1") === ((null, null)))
    assert(out("APP/PROC/WEB/2") === ((null, null)))
  }
}
