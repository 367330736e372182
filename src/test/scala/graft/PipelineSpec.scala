package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

object Fixtures {
  val AppGuid = "f47ac10b-58cc-4372-a567-0e02b2c3d479"
  val AppGuidMissing = "00000000-0000-0000-0000-00000000dead"
  val ArrivalMs = 1704153599123L // 2024-01-01T23:59:59.123Z

  private def lm(msg: String, appId: String, srcType: String, srcInst: String) =
    Some(LogMessage(msg, "OUT", 42L, appId, srcType, srcInst))

  val envelopes: Seq[(String, Envelope)] = Seq(
    "drop_var_log" -> Envelope("env1", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("m1", AppGuid, "OTHER", "/var/log/messages")),
    "drop_access_log_even_with_tag" -> Envelope("env1", "LogMessage", 1L, "", "", "", "",
      Map("source_id" -> "gorouter"), lm("m2", AppGuid, "OTHER", "/var/vcap/sys/log/gorouter/access.log")),
    "drop_director" -> Envelope("env1", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("m3", AppGuid, "OTHER", "/var/vcap/sys/log/director/debug.log")),
    "drop_var_vcap" -> Envelope("env1", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("m4", AppGuid, "OTHER", "/var/vcap/sys/log/other/x.log")),
    "keep_tag_gorouter" -> Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
      Map("source_id" -> "gorouter"), lm("hello router", AppGuid, "OTHER", "router/0")),
    "keep_app_web" -> Envelope("system.example.gov.au", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("app log line", AppGuid.toUpperCase, "APP/PROC/WEB", "APP/PROC/WEB/0")),
    "keep_missing_app" -> Envelope("env2", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("missing app", AppGuidMissing, "APP/PROC/WEB", "APP/PROC/WEB/1")),
    "keep_invalid_guid" -> Envelope("env2", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("bad guid", "not-a-guid", "APP/PROC/WEB", "APP/PROC/WEB/2")),
    "drop_no_app" -> Envelope("env2", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("no app", "", "APP/PROC/WEB", "APP/PROC/WEB/3")),
    "drop_value_metric" -> Envelope("env1", "ValueMetric", 1L, "", "", "", "",
      Map.empty, None),
    "drop_unroutable" -> Envelope("env1", "LogMessage", 1L, "", "", "", "",
      Map.empty, lm("nothing matches", AppGuid, "OTHER", "somewhere/else")))

  def records(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = envelopes.zipWithIndex.map { case ((_, e), i) =>
      (EnvelopeCodec.encode(e), i.toString, new Timestamp(ArrivalMs))
    } :+ ((Array[Byte](0x7f, 0x00, 0x03), "malformed", new Timestamp(ArrivalMs)))
    rows.toDF("data", "sequenceNumber", "approximateArrivalTimestamp")
  }

  def dims(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val apps = Seq(
      // non-canonical casing on purpose: canonicalization lowers it
      (Fixtures.AppGuid.toUpperCase, "myapp-venerable", "5e0d2e2e-0000-0000-0000-000000000001"),
      ("11111111-1111-1111-1111-111111111111", "web-blue-green", "5e0d2e2e-0000-0000-0000-000000000001"),
      ("22222222-2222-2222-2222-222222222222", "orphan", "99999999-0000-0000-0000-000000000099"))
      .toDF("app_guid", "name", "space_guid")
    val spaces = Seq(
      ("5e0d2e2e-0000-0000-0000-000000000001", "prod", "a1b2c3d4-0000-0000-0000-000000000001"))
      .toDF("space_guid", "name", "org_guid")
    val orgs = Seq(("a1b2c3d4-0000-0000-0000-000000000001", "agency")).toDF("org_guid", "name")
    Enrich.resolveDims(apps, spaces, orgs)
  }
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  lazy val out: DataFrame =
    Pipeline.assemble(Fixtures.records(spark), Fixtures.dims(spark)).cache()

  test("routing truth table: exactly the 4 keep-cases survive") {
    val paths = out.select("file_path").collect().map(_.getString(0)).toSet
    assert(paths == Set("router/0", "APP/PROC/WEB/0", "APP/PROC/WEB/1", "APP/PROC/WEB/2"))
  }

  test("grok captures: GENERIC + log_event both present") {
    val r = out.filter(col("file_path") === "router/0")
      .select(col("captures")).collect().head.getMap[String, String](0)
    assert(r("log_event") == "hello router" && r("GENERIC") == "hello router")
  }

  test("enrichment: valid guid resolves app/space/org with suffix strip") {
    val r = out.filter(col("file_path") === "APP/PROC/WEB/0")
      .select(col("`@cf.app`"), col("`@cf.app_id`"), col("`@cf.space`"), col("`@cf.org`"))
      .collect().head
    assert(r.getString(0) == "myapp") // -venerable stripped
    // canonicalization is join-key-only; the emitted guid is the RAW
    // input, case preserved (App.Guid = appGuid, caching_lazyfill.go:255)
    assert(r.getString(1) == Fixtures.AppGuid.toUpperCase)
    assert(r.getString(2) == "prod" && r.getString(3) == "agency")
  }

  test("enrichment: missing app keeps row with empty names (IgnoreMissingApps)") {
    val r = out.filter(col("file_path") === "APP/PROC/WEB/1")
      .select(col("`@cf.app`"), col("`@cf.app_id`"), col("`@cf.space`")).collect().head
    assert(r.getString(0) == "" && r.getString(1) == Fixtures.AppGuidMissing && r.getString(2) == "")
  }

  test("enrichment: invalid guid degrades to empty entity (IgnoreMissingApps)") {
    // GetApp never fails under IgnoreMissingApps=true: uuid-parse
    // failure -> entity{} -> empty names, raw guid kept
    val r = out.filter(col("file_path") === "APP/PROC/WEB/2")
      .select(col("`@cf.app`"), col("`@cf.app_id`")).collect().head
    assert(r.getString(0) == "" && r.getString(1) == "not-a-guid")
  }

  test("computed columns: millis timestamp, @cf.env, dt partition, es_index") {
    val r = out.filter(col("file_path") === "router/0")
      .select(col("timestamp"), col("`@cf.env`"), col("dt"), col("es_index")).collect().head
    assert(r.getLong(0) == Fixtures.ArrivalMs)
    assert(r.getString(1) == "system.example.gov.au")
    assert(r.getString(2) == "2024-01-01")
    assert(r.getString(3) == "gorouter-2024-01-01")
  }

  test("json docs: dynamic map + typed timestamp") {
    val docs = Pipeline.toJsonDocs(out)
    val d = docs.filter(col("es_index") === "gorouter-2024-01-01").select("doc")
      .collect().map(_.getString(0))
    assert(d.length == 4)
    assert(d.forall(_.contains("\"timestamp\":" + Fixtures.ArrivalMs)))
    assert(d.exists(_.contains("\"log_event\":\"hello router\"")))
  }

  test("toJsonDocs: reserved-name captures survive unless actually overwritten") {
    // reference semantics: the doc map is built captures-first and the
    // computed writes win (main.go:432-440) — but the enrichment-error
    // path never writes @cf.* (main.go:417-419), so a capture named
    // like one survives there. file_path/@cf.env are always written.
    // Must not throw under the default mapKeyDedupPolicy=EXCEPTION.
    def assembled(cfApp: Column) = spark.range(1).select(
      lit("gorouter-2024-01-01").as("es_index"),
      lit("2024-01-01").as("dt"),
      lit("7").as("sequenceNumber"),
      lit(Fixtures.ArrivalMs).as("timestamp"),
      lit("/real/path").as("file_path"),
      lit("system.example.gov.au").as("@cf.env"),
      map(lit("file_path"), lit("capture_path"),
        lit("@cf.app"), lit("capture_app"),
        lit("log_event"), lit("x")).as("captures"),
      cfApp.as("@cf.app"),
      lit(null).cast("string").as("@cf.app_id"),
      lit(null).cast("string").as("@cf.space"),
      lit(null).cast("string").as("@cf.space_id"),
      lit(null).cast("string").as("@cf.org"),
      lit(null).cast("string").as("@cf.org_id"))
    // enrichment failed (@cf.app null): the @cf.app CAPTURE survives
    val kept = Pipeline.toJsonDocs(assembled(lit(null).cast("string")))
      .select("doc").collect().head.getString(0)
    assert(kept.contains("\"@cf.app\":\"capture_app\""))
    // always-written keys beat captures regardless
    assert(kept.contains("\"file_path\":\"/real/path\"") && !kept.contains("capture_path"))
    // enrichment succeeded: the computed @cf.app wins
    val over = Pipeline.toJsonDocs(assembled(lit("real_app")))
      .select("doc").collect().head.getString(0)
    assert(over.contains("\"@cf.app\":\"real_app\"") && !over.contains("capture_app"))
  }

  test("partitioned sink + retention sweep") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Pipeline.writePartitioned(out, dir)
    // add an old partition + an undated one + .kibana
    for (name <- Seq("gorouter-2020-01-01", "undated_index", ".kibana")) {
      val p = new java.io.File(s"$dir/es_index=$name")
      p.mkdirs()
    }
    val (kept, dropped) = Retention.sweep(spark, dir, daysToKeep = 30,
      now = java.time.LocalDate.parse("2024-01-15"))
    assert(kept.toSet == Set("gorouter-2024-01-01", ".kibana"))
    assert(dropped.toSet == Set("gorouter-2020-01-01", "undated_index"))
  }
}

class RetentionRuleSpec extends AnyFunSuite {
  import graft.pipeline.Retention.shouldKeep
  val cut = "2024-01-01"
  test("keep rules incl. reference quirks (main.go:227-243)") {
    assert(shouldKeep(".kibana", cut))
    assert(shouldKeep("gorouter-2024-01-01", cut))
    assert(shouldKeep("gorouter-2024-06-30", cut))
    assert(!shouldKeep("gorouter-2023-12-31", cut))
    assert(!shouldKeep("undated_index", cut)) // quirk: undated dropped
    assert(!shouldKeep("short", cut)) // quirk: short names dropped
    assert(shouldKeep("2024-01-02", cut)) // bare date == suffix
    assert(!shouldKeep("gorouter-2024-1-02", cut)) // malformed date
  }
}

class EnvelopeCodecSpec extends AnyFunSuite {
  test("round trip") {
    val e = Fixtures.envelopes.map(_._2).head
    assert(EnvelopeCodec.decode(EnvelopeCodec.encode(e)) == e)
    val full = Envelope("o", "LogMessage", 99L, "dep", "job", "idx", "1.2.3.4",
      Map("a" -> "b", "source_id" -> "gorouter"),
      Some(LogMessage("msg", "ERR", 7L, "app", "st", "si")))
    assert(EnvelopeCodec.decode(EnvelopeCodec.encode(full)) == full)
  }
  test("malformed throws") {
    intercept[EnvelopeCodec.MalformedEnvelopeException](
      EnvelopeCodec.decode(Array[Byte](0x0a, 0x7f))) // truncated bytes field
    intercept[EnvelopeCodec.MalformedEnvelopeException](
      EnvelopeCodec.decode(Array[Byte]())) // missing required fields
  }
  test("unknown fields skipped") {
    val full = Envelope("o", "LogMessage", 0L, "", "", "", "", Map.empty, None)
    val withUnknown = EnvelopeCodec.encode(full) ++ Array[Byte](
      0xc8.toByte, 0x01, 0x05) // field 25 varint tag (2-byte), value 5
    assert(EnvelopeCodec.decode(withUnknown) == full)
  }
}

class DormantRoutesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  private val accessLine = "host.example.com - [2019-01-02T03:04:05.678+0000] " +
    "\"GET /path?q=1 HTTP/1.1\" 200 73 2310 \"-\" \"curl/7.54\" " +
    "\"10.0.0.9:45301\" \"10.0.1.12:61002\" x_forwarded_for:\"203.0.113.7\" " +
    "x_forwarded_proto:\"https\" vcap_request_id:\"abc-123\" response_time:0.003452 " +
    "app_id:\"f47ac10b-58cc-4372-a567-0e02b2c3d479\" app_index:\"0\" " +
    "x_b3_traceid:\"t1\" x_b3_spanid:\"s1\" x_b3_parentspanid:\"p1\""

  private def records: DataFrame = {
    import spark.implicits._
    val env = Envelope("env1", "LogMessage", 1L, "", "", "", "", Map.empty,
      Some(LogMessage(accessLine, "OUT", 42L, Fixtures.AppGuid, "OTHER",
        "/var/vcap/sys/log/gorouter/access.log")))
    (Fixtures.envelopes.map(_._2) :+ env).zipWithIndex.map { case (e, i) =>
      (EnvelopeCodec.encode(e), i.toString, new Timestamp(Fixtures.ArrivalMs))
    }.toDF("data", "sequenceNumber", "approximateArrivalTimestamp")
  }

  test("resurrected branches route to their families (main.go:368-393 comments)") {
    val out = Pipeline.assemble(records, Fixtures.dims(spark), includeDormant = true)
    val fams = out.select("family").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(fams.get("linux_logs").contains(1))
    assert(fams.get("gorouter_access").contains(2)) // fixture + access line
    assert(fams.get("bosh_director").contains(1))
    assert(fams.get("var_vcap_sys_log").contains(1))
    assert(fams.get("gorouter").contains(4))
  }

  test("gorouter_access parses ROUTERACCESS typed captures end-to-end") {
    val out = Pipeline.assemble(records, Fixtures.dims(spark), includeDormant = true)
    val caps = out
      .filter(col("family") === "gorouter_access" &&
        col("file_path") === "/var/vcap/sys/log/gorouter/access.log" &&
        col("captures").getItem("rtr_status").isNotNull)
      .select("captures").collect().head.getMap[String, String](0)
    assert(caps("rtr_status") == "200")
    assert(caps("rtr_response_time_sec") == "0.003452")
    assert(caps("rtr_app_id") == "f47ac10b-58cc-4372-a567-0e02b2c3d479")
  }

  test("doc ids are deterministic and unique per (index, sequence)") {
    val docs = Pipeline.toJsonDocs(Pipeline.assemble(records, Fixtures.dims(spark)))
    val ids = docs.select("doc_id").collect().map(_.getString(0))
    assert(ids.length == ids.distinct.length)
    val again = Pipeline.toJsonDocs(Pipeline.assemble(records, Fixtures.dims(spark)))
      .select("doc_id").collect().map(_.getString(0))
    assert(ids.sorted.sameElements(again.sorted))
  }
}

/** Codec wire-format strictness + proto2 merge semantics. */
class CodecWireSpec extends AnyFunSuite {
  import graft.pipeline.EnvelopeCodec

  test("known field with wrong wire type is rejected, not misread") {
    // field 1 (origin, expects length-delimited) as varint: tag 0x08
    val bad = Array[Byte](0x08, 0x05, 0x10, 0x05)
    intercept[EnvelopeCodec.MalformedEnvelopeException](EnvelopeCodec.decode(bad))
  }

  test("repeated logMessage chunks merge field-by-field") {
    val full = Envelope("o", "LogMessage", 1L, "", "", "", "", Map.empty,
      Some(LogMessage("m1", "OUT", 7L, "app-1", "st", "si")))
    val enc = EnvelopeCodec.encode(full)
    // second field-8 chunk carrying only message+type+ts: locate the
    // chunk (tag 0x42, then 1-byte length) in a minimal encoding
    val enc2 = EnvelopeCodec.encode(Envelope("x", "LogMessage", 0L, "", "", "", "",
      Map.empty, Some(LogMessage("m2", "ERR", 9L, "", "", ""))))
    val idx = enc2.indexWhere(_ == 0x42.toByte)
    val merged = EnvelopeCodec.decode(enc ++ enc2.slice(idx, idx + 2 + enc2(idx + 1)))
    val lm = merged.log_message.get
    assert(lm.message == "m2" && lm.message_type == "ERR" && lm.timestamp == 9L)
    assert(lm.app_id == "app-1") // preserved from the first chunk (proto2 merge)
  }
}
