package graft.pipeline

import org.apache.spark.sql.types._

/** Loggregator envelope data model (SURVEY.md §1.1).
  *
  * Shapes mirror the reference's protobuf messages
  * (`/root/reference/vendor/github.com/cloudfoundry/sonde-go/events/
  * envelope.pb.go:99-118`, `log.pb.go:57-65`); only the fields the
  * pipeline reads are modeled. `message` is kept as String — the
  * reference always decodes it as UTF-8 (`main.go:396`).
  */
final case class LogMessage(
    message: String,
    message_type: String, // OUT | ERR (log.pb.go:22-26)
    timestamp: Long,
    app_id: String,
    source_type: String,
    source_instance: String)

final case class Envelope(
    origin: String,
    event_type: String, // enum name, e.g. "LogMessage" (envelope.pb.go:49-61)
    timestamp: Long,
    deployment: String,
    job: String,
    index: String,
    ip: String,
    tags: Map[String, String],
    log_message: Option[LogMessage])

/** A source record as the Kinesis consumer sees it
  * (`vendor/github.com/harlow/kinesis-consumer/consumer.go:17`).
  */
final case class SourceRecord(
    data: Array[Byte],
    sequenceNumber: String,
    approximateArrivalTimestamp: java.sql.Timestamp)

object Envelope {

  /** eventType enum (envelope.pb.go:49-61). */
  val EventTypes: Map[Int, String] = Map(
    // positions 1-3 are removed in this proto version and have no
    // name entries (envelope.pb.go:52-54, name map :62-69) — they
    // decode as UNKNOWN_N like any other unnamed value
    4 -> "HttpStartStop",
    5 -> "LogMessage", 6 -> "ValueMetric", 7 -> "CounterEvent", 8 -> "Error",
    9 -> "ContainerMetric")

  val MessageTypes: Map[Int, String] = Map(1 -> "OUT", 2 -> "ERR")

  val logMessageSchema: StructType = StructType(Seq(
    StructField("message", StringType, nullable = false),
    StructField("message_type", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("app_id", StringType, nullable = false),
    StructField("source_type", StringType, nullable = false),
    StructField("source_instance", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("origin", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("deployment", StringType, nullable = false),
    StructField("job", StringType, nullable = false),
    StructField("index", StringType, nullable = false),
    StructField("ip", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("log_message", logMessageSchema, nullable = true)))
}
