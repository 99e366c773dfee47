package graft.sources.flosegments

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.FloSchema
import graft.sources.FloBinaryCodec

/**
 * DataSourceV2 source for flo's NATIVE segment files (`<n>.events`, 16-byte
 * header + back-to-back binary records — see [[graft.sources.FloBinaryCodec]]
 * for the record layout from persistent_event.rs).
 *
 * Batch: `spark.read.format("flo-segments").load(dir)`.
 * Streaming: `spark.readStream.format("flo-segments").load(dir)` — offsets
 * are per-file BYTE positions, so a consumer chases a growing segment
 * exactly like flo's live readers chase the single writer through the mmap
 * (segment/mmap.rs:186-228): appending records to an already-seen file
 * yields them in the next micro-batch, and new segment files are picked up
 * as they appear. Offsets serialize to JSON in the checkpoint, giving
 * exactly-from-offset resume (T3) over the reference's own storage format.
 *
 * Assumes flo's append-only discipline: bytes before a recorded offset are
 * immutable, records are appended whole (the reference writes a record then
 * advances the head pointer, so a reader never sees a torn record).
 */
class FloSegmentsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "flo-segments"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FloSchema.eventType

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FloSegmentsTable(properties.get("path"))
}

/**
 * Mid-stream batch-size renegotiation (the reference's `SetBatchSize` verb,
 * flo-protocol/src/client.rs:261-262: a client changes its consume batch
 * budget on a live connection, effective from the next batch). Spark fixes
 * source options at query start, so the renegotiated budget travels OUTSIDE
 * the option map: a driver-side registry keyed by the load path, consulted by
 * every live micro-batch stream on each `latestOffset` call — the next
 * micro-batch admits under the new budget, no restart needed.
 */
object FloSegmentsSource {
  private val budgetOverrides =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Renegotiate the per-micro-batch event budget for every live stream
    * reading `path` (the exact string passed to `.load(...)`). Takes effect
    * at the next micro-batch boundary. */
  def setBatchSize(path: String, maxEvents: Long): Unit = {
    require(maxEvents > 0, s"batch size must be positive, got $maxEvents")
    budgetOverrides.put(path, maxEvents)
  }

  /** Drop a renegotiated budget: streams fall back to their start-time
    * `maxEventsPerTrigger` option (or unlimited). */
  def clearBatchSize(path: String): Unit = budgetOverrides.remove(path)

  private[flosegments] def batchSizeOverride(path: String): Option[Long] =
    Option(budgetOverrides.get(path)).map(_.longValue)
}

final class FloSegmentsTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "flo-segments requires a path (.load(dir))")
  override def name(): String = s"flo-segments(`$path`)"
  override def schema(): StructType = FloSchema.eventType
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FloSegmentsScan(path,
        Option(options.get("maxEventsPerTrigger")).map(_.toLong))
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FloSegmentsWriteBuilder(path, info)
}

final class FloSegmentsScan(path: String, maxEventsPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = FloSchema.eventType

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val conf = new graft.util.SerializableHadoopConf(FloSegments.hadoopConf())
      FloSegments.listSegments(path).map { case (file, len) =>
        FloSegmentRange(file, FloSegments.HeaderLen, len, conf): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FloSegmentReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FloSegmentsMicroBatchStream(path, maxEventsPerTrigger)
}

/** Per-file byte positions — the streaming offset. */
final case class SegmentsOffset(positions: Map[String, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sorted
      .map { case (f, p) => s""""${f.replace("\\", "\\\\").replace("\"", "\\\"")}":$p""" }
      .mkString("{", ",", "}")
}

object SegmentsOffset {
  private val Entry = """"((?:[^"\\]|\\.)*)":(\d+)""".r
  def fromJson(json: String): SegmentsOffset = SegmentsOffset(
    Entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toLong
    }.toMap)
}

/**
 * Event-count flow control (T4): with `maxEventsPerTrigger` set, each
 * micro-batch admits at most that many events — the Spark rendering of the
 * reference's negotiated consume batch budget (default 10,000 server-side,
 * connection_handler/connection_state.rs:11; client re-ups at
 * flo-client-lib/src/async/mod.rs:33). Admission walks record length
 * headers forward from the start offset (4-byte reads on a buffered
 * stream, no payload decode) so the admitted end offset always lands on a
 * record boundary.
 *
 * Implements `SupportsTriggerAvailableNow` so `Trigger.AvailableNow` drains
 * to a CAPTURED end target while still honoring the per-batch budget —
 * Spark's fallback wrapper for plain streams ignores read limits entirely
 * (one giant batch) for sources that don't.
 */
final class FloSegmentsMicroBatchStream(path: String, maxEventsPerTrigger: Option[Long])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = SegmentsOffset(Map.empty)

  /** With AvailableNow, the (file -> length) universe is frozen at query
    * start; tail mode re-lists on every trigger. */
  @volatile private var frozenUniverse: Option[Map[String, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenUniverse = Some(FloSegments.listSegments(path).toMap)

  private def universe: Map[String, Long] =
    frozenUniverse.getOrElse(FloSegments.listSegments(path).toMap)

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxEventsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
  }

  override def reportLatestOffset(): Offset = SegmentsOffset(universe)

  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.ReadMaxRows
    val s = start.asInstanceOf[SegmentsOffset].positions
    // a renegotiated budget (SetBatchSize parity) overrides the start-time
    // limit from the NEXT batch on — checked per call, so a live stream
    // honors the change without a restart
    (FloSegmentsSource.batchSizeOverride(path), limit) match {
      case (Some(b), _) => admit(s, b)
      case (None, r: ReadMaxRows) => admit(s, r.maxRows())
      case _ => SegmentsOffset(universe)
    }
  }

  /** Advance each file's offset by whole records until `budget` events are
    * admitted; files are visited in SEGMENT order (numeric, not
    * lexicographic) so older segments drain before newer ones. */
  private def admit(start: Map[String, Long], budget: Long): SegmentsOffset = {
    val out = scala.collection.mutable.Map[String, Long]() ++ start
    var remaining = budget
    universe.toSeq.sortBy(s => FloSegments.segmentOrder(s._1)).foreach { case (file, len) =>
      var pos = math.max(start.getOrElse(file, 0L), FloSegments.HeaderLen.toLong)
      if (remaining > 0 && len > pos) {
        val p = new Path(file)
        val in = p.getFileSystem(FloSegments.hadoopConf()).open(p)
        try {
          in.seek(pos)
          val lenBuf = new Array[Byte](4)
          var continue = true
          while (continue && remaining > 0 && pos + 4 <= len) {
            in.readFully(lenBuf)
            val totalLen = java.nio.ByteBuffer.wrap(lenBuf).getInt
            if (totalLen < 48 || pos + totalLen > len) continue = false
            else {
              // seek, not skip(): skip() may legally return 0 (e.g. a segment
              // truncated after listing), which would spin this loop forever
              in.seek(pos + totalLen)
              pos += totalLen
              remaining -= 1
            }
          }
        } finally in.close()
      }
      out(file) = pos
    }
    SegmentsOffset(out.toMap)
  }

  override def latestOffset(): Offset =
    SegmentsOffset(FloSegments.listSegments(path).toMap)

  override def deserializeOffset(json: String): Offset = SegmentsOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SegmentsOffset].positions
    val e = end.asInstanceOf[SegmentsOffset].positions
    val conf = new graft.util.SerializableHadoopConf(FloSegments.hadoopConf())
    e.toSeq.sorted.flatMap { case (file, endPos) =>
      val startPos = math.max(s.getOrElse(file, 0L), FloSegments.HeaderLen.toLong)
      if (endPos > startPos) Some(FloSegmentRange(file, startPos, endPos, conf): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FloSegmentReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class FloSegmentRange(
    file: String,
    startByte: Long,
    endByte: Long,
    conf: graft.util.SerializableHadoopConf)
    extends InputPartition

final class FloSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[FloSegmentRange]
    new FloSegmentPartitionReader(range)
  }
}

/**
 * Streams records incrementally off the open input stream — task heap is
 * bounded by ONE record (length header first, then exactly that record's
 * bytes), not the whole byte range: a 1 GiB segment no longer materializes
 * a 1 GiB array per task. Mirrors how the reference's readers walk the
 * mmap record by record (segment/mod.rs:153-183).
 */
final class FloSegmentPartitionReader(range: FloSegmentRange)
    extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(range.file)
    val stream = p.getFileSystem(range.conf.value).open(p)
    stream.seek(range.startByte)
    stream
  }

  private var pos = range.startByte
  private var current: InternalRow = _
  private val lenBuf = new Array[Byte](4)

  override def next(): Boolean = {
    if (pos + 4 > range.endByte) return false
    in.readFully(lenBuf)
    val totalLen = java.nio.ByteBuffer.wrap(lenBuf).getInt
    // stop at the first invalid/truncated record, like the reference reader
    if (totalLen < 48 || pos + totalLen > range.endByte) return false
    val rec = new Array[Byte](totalLen)
    System.arraycopy(lenBuf, 0, rec, 0, 4)
    in.readFully(rec, 4, totalLen - 4)
    FloBinaryCodec.decode(rec, 0) match {
      case Some((e, _)) =>
        pos += totalLen
        current = new GenericInternalRow(Array[Any](
          e.event_counter,
          e.partition,
          e.timestamp.getTime * 1000L, // ms -> TimestampType micros
          e.parent_counter.map(Long.box).orNull,
          e.parent_partition.map(Int.box).orNull,
          UTF8String.fromString(e.namespace),
          e.data))
        true
      case None => false
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

private[flosegments] object FloSegments {
  val HeaderLen = 16 // segment header: create/end timestamps (header.rs:9-59)

  /** Numeric-aware segment ordering: flo names segments `<n>.events`, and
    * lexicographic order would visit 10.events before 2.events — budgeted
    * admission would then deliver newer counters before older ones across
    * micro-batches. Sort by parsed segment number first, name second. */
  def segmentOrder(file: String): (Long, String) = {
    val name = file.substring(file.lastIndexOf('/') + 1)
    val num = name.stripSuffix(".events")
    val parsed = if (num.nonEmpty && num.forall(_.isDigit))
      try num.toLong catch { case _: NumberFormatException => Long.MaxValue }
    else Long.MaxValue
    (parsed, file)
  }

  /** (file, length) for every `*.events` segment under `path`, in segment
    * order. */
  def listSegments(path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".events"))
      .map(s => s.getPath.toString -> s.getLen)
      .sortBy(s => segmentOrder(s._1))
      .toSeq
  }

  /** Driver-side hadoop conf: the active session's (spark.hadoop.* settings
    * included) when one exists, a default otherwise. */
  def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
}
