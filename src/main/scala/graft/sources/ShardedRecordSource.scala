package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kinesis-shaped custom micro-batch source (SURVEY §2 row 1):
  * `spark.readStream.format(classOf[ShardedRecordSource].getName)
  * .option("path", dir).load()` over a directory of per-shard
  * append-only record logs (`shard-*.log`, lines of
  * `seq,arrivalMillis,base64(data)`).
  *
  * The mapping mirrors the reference consumer
  * (`vendor/github.com/harlow/kinesis-consumer/consumer.go`):
  *  - shard enumeration ≈ `DescribeStream` (`consumer.go:234-249`)
  *  - one input partition per shard ≈ goroutine per shard
  *    (`consumer.go:121-139`) — per-shard ordering preserved
  *  - offset = shard → next position map ≈ the checkpoint table;
  *    resume-from-offset ≈ `AFTER_SEQUENCE_NUMBER` iterators
  *    (`consumer.go:251-269`), initial offset ≈ `TRIM_HORIZON`
  *  - commit is a no-op: the offset log IS the checkpoint (Spark
  *    subsumes the reference's Postgres/DDB store, SURVEY §2 row 11)
  */
class ShardedRecordSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardedRecordSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ShardedRecordTable(properties.get("path"),
      Option(properties.get("maxRecordsPerBatch")).map(_.toLong))
  override def supportsExternalMetadata(): Boolean = false
}

object ShardedRecordSource {
  /** Same shape as Spark's Kinesis/Kafka sources (SURVEY §1.1 Record). */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("sequenceNumber", StringType, nullable = false),
    StructField("approximateArrivalTimestamp", TimestampType, nullable = false)))

  def shardFiles(path: String): Seq[File] = {
    val d = new File(path)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("shard-") && f.getName.endsWith(".log"))
      .sortBy(_.getName).toSeq
  }

  /** Streaming line count — never materializes the file (latestOffset
    * runs per trigger; a growing shard log must not be heap-allocated
    * wholesale each time).
    */
  def countLines(f: File): Long = {
    val r = Files.newBufferedReader(f.toPath, StandardCharsets.UTF_8)
    try {
      var n = 0L
      while (r.readLine() != null) n += 1
      n
    } finally r.close()
  }

  /** Admission control: cap a trigger's end offsets at `maxRows` new
    * records, split across shards by deterministic water-filling —
    * every backlogged shard gets an equal share per round, remainders
    * recirculate, so one deep shard (a resharding hot spot, or a
    * restart against hours of backlog) can never starve the others.
    * This is the micro-batch analogue of the per-shard `GetRecords`
    * limit the reference's consumer polls with: without it, a restart
    * against a deep stream would pull the whole backlog into ONE
    * micro-batch — unbounded executor memory and a checkpoint that
    * commits nothing until everything lands.
    */
  def fairCap(from: Map[String, Long], avail: Map[String, Long],
              maxRows: Long): Map[String, Long] = {
    val backlog = collection.mutable.Map(avail.toSeq.map { case (s, to) =>
      s -> math.max(0L, to - from.getOrElse(s, 0L))
    }: _*)
    val taken = collection.mutable.Map(avail.keys.map(_ -> 0L).toSeq: _*)
    var budget = math.max(0L, maxRows)
    var active = backlog.filter(_._2 > 0).keys.toSeq.sorted
    while (budget > 0 && active.nonEmpty) {
      val share = math.max(1L, budget / active.size)
      val it = active.iterator
      while (it.hasNext && budget > 0) {
        val s = it.next()
        val take = math.min(share, math.min(backlog(s), budget))
        taken(s) += take; backlog(s) -= take; budget -= take
      }
      active = active.filter(backlog(_) > 0)
    }
    avail.map { case (s, _) => s -> (from.getOrElse(s, 0L) + taken(s)) }
  }
}

class ShardedRecordTable(path: String, maxRecordsPerBatch: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"sharded-records($path)"
  override def schema(): StructType = ShardedRecordSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ShardedRecordScan(path, maxRecordsPerBatch)
}

class ShardedRecordScan(path: String, maxRecordsPerBatch: Option[Long] = None)
    extends Scan {
  override def readSchema(): StructType = ShardedRecordSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedMicroBatchStream(path, maxRecordsPerBatch)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      ShardedRecordSource.shardFiles(path).map(f =>
        ShardSlice(f.getAbsolutePath, 0L, ShardedRecordSource.countLines(f))
          : InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory = new ShardReaderFactory
  }
}

/** shard → next-unread position; the stream's checkpointable state. */
case class ShardOffsets(positions: Map[String, Long]) extends Offset {
  // stable ordering so equal offsets serialize identically
  override def json(): String = positions.toSeq.sorted
    .map { case (s, p) => s"$s=$p" }.mkString(";")
}

object ShardOffsets {
  def parse(json: String): ShardOffsets =
    if (json.isEmpty) ShardOffsets(Map.empty)
    else ShardOffsets(json.split(";").map { kv =>
      val Array(s, p) = kv.split("=", 2); s -> p.toLong
    }.toMap)
}

class ShardedMicroBatchStream(path: String, maxRecordsPerBatch: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = ShardOffsets(Map.empty) // TRIM_HORIZON

  override def latestOffset(): Offset =
    ShardOffsets(ShardedRecordSource.shardFiles(path)
      .map(f => f.getName -> ShardedRecordSource.countLines(f)).toMap)

  // ---- SupportsAdmissionControl: bound each trigger's intake.
  // `maxRecordsPerBatch` caps a micro-batch like the Kinesis consumer's
  // per-poll GetRecords limit; the full backlog still drains, one
  // bounded batch (and one checkpoint commit) at a time. Without this,
  // a restart against a deep stream pulls the whole backlog into ONE
  // micro-batch — unbounded executor memory, and no checkpoint commits
  // until every record lands.
  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // AvailableNow target, frozen at query start: batches never read past
  // it even if shards keep growing during the run. Implemented HERE
  // (not via Spark's wrapper) because the fallback
  // AvailableNowMicroBatchStreamWrapper bypasses the delegate's
  // admission control — one giant batch.
  private var availableNowTarget: Option[ShardOffsets] = None
  @volatile private var lastSeenHead: Option[ShardOffsets] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset().asInstanceOf[ShardOffsets])

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // enumerate the TRUE head every trigger, even under AvailableNow:
    // the frozen drain target bounds what this run READS, but backlog
    // reporting must track the live stream — an autoscaler watching
    // records-behind-latest would otherwise read zero while shards
    // keep growing during the drain.
    val trueHead = latestOffset().asInstanceOf[ShardOffsets]
    lastSeenHead = Some(trueHead)
    val head = availableNowTarget.getOrElse(trueHead)
    limit match {
      case m: ReadMaxRows => ShardOffsets(ShardedRecordSource.fairCap(
        start.asInstanceOf[ShardOffsets].positions, head.positions, m.maxRows()))
      case _ => head
    }
  }

  /** Head of the stream as of this trigger's enumeration, regardless
    * of the cap or a frozen AvailableNow target — lets the progress
    * reporter expose backlog (records behind latest), the signal an
    * autoscaler watches. Reuses the scan `latestOffset(start, limit)`
    * already did rather than re-counting every shard file a second
    * time per progress report.
    */
  override def reportLatestOffset(): Offset = lastSeenHead.getOrElse(latestOffset())

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].positions
    val e = end.asInstanceOf[ShardOffsets].positions
    e.toSeq.sorted.flatMap { case (shard, to) =>
      val from = s.getOrElse(shard, 0L)
      if (to > from)
        Some(ShardSlice(new File(path, shard).getAbsolutePath, from, to): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ShardReaderFactory

  override def commit(end: Offset): Unit = () // offset log is the checkpoint
  override def stop(): Unit = ()
}

/** One shard's [from, to) slice — per-shard ordering is preserved
  * because a shard never spans partitions.
  */
case class ShardSlice(file: String, from: Long, to: Long) extends InputPartition

class ShardReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[ShardSlice]
    new PartitionReader[InternalRow] {
      // stream the file, skipping to `from` — O(slice), no wholesale
      // materialization, positions stay Long
      private val reader = Files.newBufferedReader(
        new File(slice.file).toPath, StandardCharsets.UTF_8)
      private var pos = 0L
      while (pos < slice.from && reader.readLine() != null) pos += 1
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (pos >= slice.to) return false
        val line = reader.readLine()
        if (line == null) return false
        val parts = line.split(",", 3)
        if (parts.length != 3) throw new IllegalArgumentException(
          s"malformed shard record at ${slice.file}:$pos (expected seq,millis,base64): $line")
        row = new GenericInternalRow(Array[Any](
          Base64.getDecoder.decode(parts(2)),
          UTF8String.fromString(parts(0)),
          parts(1).toLong * 1000L)) // millis → micros
        pos += 1
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}
