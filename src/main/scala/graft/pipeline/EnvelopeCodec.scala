package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Hand-rolled protobuf wire-format codec for the Loggregator Envelope.
  *
  * Implements just the proto2 wire format (varint + length-delimited
  * fields, per the public protobuf encoding spec) for the field numbers
  * the reference consumes:
  * Envelope: origin=1 (req), eventType=2 (req), timestamp=6,
  * logMessage=8, deployment=13, job=14, index=15, ip=16, tags=17
  * (`envelope.pb.go:99-118`); LogMessage: message=1 (req),
  * message_type=2 (req), timestamp=3 (req), app_id=4, source_type=5,
  * source_instance=6 (`log.pb.go:57-65`).
  *
  * Decode mirrors generated-unmarshal behavior: unknown fields are
  * skipped, missing required fields are an error (malformed record →
  * dead-letter, `main.go:358-360`), absent optional fields read as
  * ""/0 (Go `GetX()` accessors).
  */
object EnvelopeCodec {

  final class MalformedEnvelopeException(msg: String) extends RuntimeException(msg)

  // ---- wire-level reader ----

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= buf.length) throw new MalformedEnvelopeException("truncated varint")
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new MalformedEnvelopeException("varint too long")
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || pos + len > buf.length) throw new MalformedEnvelopeException("truncated bytes")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len.toInt)
      pos += len.toInt
      out
    }

    /** Known fields must arrive with their declared wire type — the
      * generated unmarshal rejects mismatches ("proto: wrong wireType")
      * rather than misreading bytes (envelope.pb.go unmarshal).
      */
    def expectWire(field: Int, got: Int, want: Int): Unit =
      if (got != want) throw new MalformedEnvelopeException(
        s"field $field: wire type $got, expected $want")

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 =>
        if (pos + 8 > buf.length) throw new MalformedEnvelopeException("truncated fixed64")
        pos += 8
      case 2 => readBytes()
      case 5 =>
        if (pos + 4 > buf.length) throw new MalformedEnvelopeException("truncated fixed32")
        pos += 4
      case t => throw new MalformedEnvelopeException(s"unsupported wire type $t")
    }
  }

  /** Decodes one LogMessage chunk, merging over `prev` — proto2
    * semantics for a repeated embedded field: later chunks merge
    * field-by-field into the existing message, they do not replace it
    * (the generated unmarshal appends into m.LogMessage).
    */
  private def decodeLogMessage(bytes: Array[Byte], prev: Option[LogMessage]): LogMessage = {
    val r = new Reader(bytes)
    var message: String = prev.map(_.message).orNull
    var messageType: String = prev.map(_.message_type).orNull
    var timestamp = prev.map(_.timestamp).getOrElse(0L)
    var appId = prev.map(_.app_id).getOrElse("")
    var sourceType = prev.map(_.source_type).getOrElse("")
    var sourceInstance = prev.map(_.source_instance).getOrElse("")
    // required-field presence is checked PER CHUNK (the generated
    // unmarshal verifies its hasFields bitmap at the end of every
    // chunk, log.pb.go:460-467) even though values merge over prev
    var sawMessage = false
    var sawType = false
    var sawTimestamp = false
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 =>
          r.expectWire(field, wire, 2)
          message = new String(r.readBytes(), UTF_8); sawMessage = true
        case 2 =>
          r.expectWire(field, wire, 0)
          val v = r.readVarint().toInt
          messageType = Envelope.MessageTypes.getOrElse(v, s"UNKNOWN_$v"); sawType = true
        case 3 => r.expectWire(field, wire, 0); timestamp = r.readVarint(); sawTimestamp = true
        case 4 => r.expectWire(field, wire, 2); appId = new String(r.readBytes(), UTF_8)
        case 5 => r.expectWire(field, wire, 2); sourceType = new String(r.readBytes(), UTF_8)
        case 6 => r.expectWire(field, wire, 2); sourceInstance = new String(r.readBytes(), UTF_8)
        case _ => r.skip(wire)
      }
    }
    if (!sawMessage || !sawType || !sawTimestamp)
      throw new MalformedEnvelopeException("LogMessage missing required field")
    LogMessage(message, messageType, timestamp, appId, sourceType, sourceInstance)
  }

  private def decodeTagEntry(bytes: Array[Byte]): (String, String) = {
    val r = new Reader(bytes)
    var k = ""
    var v = ""
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => r.expectWire(field, wire, 2); k = new String(r.readBytes(), UTF_8)
        case 2 => r.expectWire(field, wire, 2); v = new String(r.readBytes(), UTF_8)
        case _ => r.skip(wire)
      }
    }
    (k, v)
  }

  /** Throws MalformedEnvelopeException on any wire-format violation. */
  def decode(bytes: Array[Byte]): Envelope = {
    val r = new Reader(bytes)
    var origin: String = null
    var eventType: String = null
    var timestamp = 0L
    var deployment = ""
    var job = ""
    var index = ""
    var ip = ""
    val tags = mutable.LinkedHashMap.empty[String, String]
    var logMessage: Option[LogMessage] = None
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => r.expectWire(field, wire, 2); origin = new String(r.readBytes(), UTF_8)
        case 2 =>
          r.expectWire(field, wire, 0)
          val v = r.readVarint().toInt
          eventType = Envelope.EventTypes.getOrElse(v, s"UNKNOWN_$v")
        case 6 => r.expectWire(field, wire, 0); timestamp = r.readVarint()
        case 8 =>
          r.expectWire(field, wire, 2)
          logMessage = Some(decodeLogMessage(r.readBytes(), logMessage))
        case 13 => r.expectWire(field, wire, 2); deployment = new String(r.readBytes(), UTF_8)
        case 14 => r.expectWire(field, wire, 2); job = new String(r.readBytes(), UTF_8)
        case 15 => r.expectWire(field, wire, 2); index = new String(r.readBytes(), UTF_8)
        case 16 => r.expectWire(field, wire, 2); ip = new String(r.readBytes(), UTF_8)
        case 17 =>
          r.expectWire(field, wire, 2)
          val (k, v) = decodeTagEntry(r.readBytes())
          tags(k) = v
        case _ => r.skip(wire)
      }
    }
    if (origin == null || eventType == null)
      throw new MalformedEnvelopeException("Envelope missing required field")
    Envelope(origin, eventType, timestamp, deployment, job, index, ip, tags.toMap, logMessage)
  }

  // ---- wire-level writer (fixtures / tests) ----

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit =
      if (s != null) { tag(field, 2); val b = s.getBytes(UTF_8); varint(b.length); out.write(b) }
    def vint(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def result: Array[Byte] = out.toByteArray
  }

  def encode(e: Envelope): Array[Byte] = {
    val w = new Writer
    w.str(1, e.origin)
    w.vint(2, Envelope.EventTypes.find(_._2 == e.event_type).map(_._1.toLong).getOrElse(0L))
    if (e.timestamp != 0) w.vint(6, e.timestamp)
    e.log_message.foreach { lm =>
      val lw = new Writer
      lw.str(1, lm.message)
      lw.vint(2, Envelope.MessageTypes.find(_._2 == lm.message_type).map(_._1.toLong).getOrElse(1L))
      lw.vint(3, lm.timestamp)
      if (lm.app_id.nonEmpty) lw.str(4, lm.app_id)
      if (lm.source_type.nonEmpty) lw.str(5, lm.source_type)
      if (lm.source_instance.nonEmpty) lw.str(6, lm.source_instance)
      w.bytes(8, lw.result)
    }
    if (e.deployment.nonEmpty) w.str(13, e.deployment)
    if (e.job.nonEmpty) w.str(14, e.job)
    if (e.index.nonEmpty) w.str(15, e.index)
    if (e.ip.nonEmpty) w.str(16, e.ip)
    e.tags.foreach { case (k, v) =>
      val tw = new Writer
      tw.str(1, k)
      tw.str(2, v)
      w.bytes(17, tw.result)
    }
    w.result
  }
}
