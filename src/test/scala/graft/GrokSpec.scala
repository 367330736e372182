package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col => c}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.grok.{GrokLibrary, GrokCompileException}

class GrokCompilerSpec extends AnyFunSuite {
  private val lib = GrokLibrary.default

  private def parse(pattern: String, text: String): Map[String, Any] = {
    val g = lib.compile(pattern)
    val row = g.evalRow(UTF8String.fromString(text))
    if (row == null) Map.empty
    else g.fields.zipWithIndex.map { case (f, i) =>
      f.name -> (f.typ match {
        case "int" => row.getLong(i)
        case "float" => row.getDouble(i)
        case _ => row.getUTF8String(i).toString
      })
    }.toMap
  }

  test("GENERIC yields both GENERIC and log_event (NamedCapturesOnly=false)") {
    val got = parse("%{GENERIC}", "hello world")
    assert(got == Map("GENERIC" -> "hello world", "log_event" -> "hello world"))
  }

  test("empty line yields empty captures, not no-match") {
    val got = parse("%{GENERIC}", "")
    assert(got == Map("GENERIC" -> "", "log_event" -> ""))
  }

  test("captures stop at first newline (dot excludes \\n)") {
    val got = parse("%{GENERIC}", "line one\nline two")
    assert(got("log_event") == "line one")
  }

  test("no match returns empty map") {
    assert(parse("%{IPV4:ip}", "not an ip").isEmpty)
  }

  test("ROUTERACCESS typed captures (FIXTURES.md §4 sample line)") {
    val line = "host.example.com - [2019-01-02T03:04:05.678+0000] " +
      "\"GET /path?q=1 HTTP/1.1\" 200 73 2310 \"-\" \"curl/7.54\" " +
      "\"10.0.0.9:45301\" \"10.0.1.12:61002\" x_forwarded_for:\"203.0.113.7\" " +
      "x_forwarded_proto:\"https\" vcap_request_id:\"abc-123\" response_time:0.003452 " +
      "app_id:\"f47ac10b-58cc-4372-a567-0e02b2c3d479\" app_index:\"0\" " +
      "x_b3_traceid:\"t1\" x_b3_spanid:\"s1\" x_b3_parentspanid:\"p1\""
    val got = parse("%{ROUTERACCESS}", line)
    assert(got("rtr_hostname") == "host.example.com")
    assert(got("rtr_verb") == "GET")
    assert(got("rtr_path") == "/path?q=1")
    assert(got("rtr_status") == 200L)
    assert(got("rtr_request_bytes_received") == 73L)
    assert(got("rtr_body_bytes_sent") == 2310L)
    assert(got("rtr_response_time_sec") == 0.003452)
    assert(got("rtr_src_port") == 45301L)
    assert(got("rtr_dst_port") == 61002L)
    assert(got("rtr_app_id") == "f47ac10b-58cc-4372-a567-0e02b2c3d479")
    assert(got("rtr_app_index") == 0L)
    assert(got("x_b3_parentspanid") == "p1")
  }

  test(":int on unparsable value coerces to 0 (Go strconv error discarded)") {
    // GREEDYDATA:x:int over non-numeric text
    val got = parse("%{GREEDYDATA:x:int}", "abc")
    assert(got("x") == 0L)
  }

  test("duplicate semantic names: last group wins") {
    val got = parse("%{WORD:w} %{WORD:w}", "first second")
    assert(got("w") == "second")
  }

  test("composed timestamps: LINUXMESSAGES") {
    val got = parse("%{LINUXMESSAGES}", "2021-03-04T05:06:07.8+0000 some message here")
    assert(got("os_time") == "2021-03-04T05:06:07.8+0000")
    assert(got("var_log_messages") == "some message here")
  }

  test("unknown pattern reference fails at compile time") {
    intercept[GrokCompileException](lib.compile("%{NOPE:x}"))
  }

  test("malformed %{ stays literal") {
    val got = parse("""%{foo-bar %{WORD:w}""", "%{foo-bar baz")
    assert(got("w") == "baz")
  }

  test("compiled pattern caching returns same instance") {
    assert(lib.compile("%{GENERIC}") eq lib.compile("%{GENERIC}"))
  }
}

class GrokSparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  test("grok_extract as Column and in SQL, inside codegen") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val df = Seq("hello spark", "another line").toDF("line")
    val out = df.select(graft.functions.grok_extract(c("line"), "%{GENERIC}").as("g"))
      .select("g.log_event").as[String].collect().sorted
    assert(out.toSeq == Seq("another line", "hello spark"))

    df.createOrReplaceTempView("lines")
    val sqlOut = spark.sql(
      "SELECT grok_extract(line, '%{GENERIC}').log_event AS ev FROM lines ORDER BY ev")
      .as[String].collect()
    assert(sqlOut.toSeq == Seq("another line", "hello spark"))
  }

  test("grok_match filters and grok_extract_map returns raw captures") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val df = Seq("ip 10.1.2.3 ok", "no ip here").toDF("line")
    val matched = df.filter(graft.functions.grok_match(c("line"), "%{IPV4:ip}"))
      .select(graft.functions.grok_extract_map(c("line"), "%{IPV4:ip}").as("m"))
      .select($"m.ip").as[String].collect()
    assert(matched.toSeq == Seq("10.1.2.3"))
  }

  test("typed struct schema: int/float fields") {
    import spark.implicits._
    val df = Seq("status 200 time 0.25").toDF("line")
    val g = df.select(graft.functions.grok_extract(
      c("line"), "status %{INT:code:int} time %{NUMBER:t:float}").as("g"))
    val schema = g.schema.fields.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema("code").dataType == org.apache.spark.sql.types.LongType)
    assert(schema("t").dataType == org.apache.spark.sql.types.DoubleType)
    val row = g.select("g.code", "g.t").collect().head
    assert(row.getLong(0) == 200L && row.getDouble(1) == 0.25)
  }
}

class DormantPatternsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.grok.GrokLibrary
  private def parse(pattern: String, line: String): Map[String, Any] = {
    val g = GrokLibrary.default.compile(pattern)
    val row = g.evalRow(org.apache.spark.unsafe.types.UTF8String.fromString(line))
    if (row == null) Map.empty
    else g.fields.zipWithIndex.map { case (f, i) =>
      f.name -> (row.get(i, g.schema(i).dataType) match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other
      })
    }.toMap
  }

  test("BOSHDIRECTOROUT: director debug line") {
    val got = parse("%{BOSHDIRECTOROUT}",
      "D, [2021-03-04T05:06:07.8+0000 #12345] DEBUG -- DirectorJobRunner: something happened")
    assert(got("director_time") == "2021-03-04T05:06:07.8+0000")
    assert(got("bosh_director_out").toString.endsWith("something happened"))
  }

  test("BOSHDIRECTORERR: nginx-style error line") {
    val got = parse("%{BOSHDIRECTORERR}",
      "10.0.0.5 - - [04/Mar/2021:05:06:07 +0000] failed to talk to nats")
    assert(got("client_ip") == "10.0.0.5")
    assert(got("director_time") == "04/Mar/2021:05:06:07 +0000")
    assert(got("bosh_director_err") == "failed to talk to nats")
  }
}
