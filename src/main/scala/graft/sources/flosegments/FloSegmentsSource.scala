package graft.sources.flosegments

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
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

final class FloSegmentsTable(path: String) extends Table with SupportsRead {
  require(path != null, "flo-segments requires a path (.load(dir))")
  override def name(): String = s"flo-segments(`$path`)"
  override def schema(): StructType = FloSchema.eventType
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FloSegmentsScan(path)
    }
}

final class FloSegmentsScan(path: String) extends Scan {
  override def readSchema(): StructType = FloSchema.eventType

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      FloSegments.listSegments(path).map { case (file, len) =>
        FloSegmentRange(file, FloSegments.HeaderLen, len): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new FloSegmentReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FloSegmentsMicroBatchStream(path)
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

final class FloSegmentsMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SegmentsOffset(Map.empty)

  override def latestOffset(): Offset =
    SegmentsOffset(FloSegments.listSegments(path).toMap)

  override def deserializeOffset(json: String): Offset = SegmentsOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SegmentsOffset].positions
    val e = end.asInstanceOf[SegmentsOffset].positions
    e.toSeq.sorted.flatMap { case (file, endPos) =>
      val startPos = math.max(s.getOrElse(file, 0L), FloSegments.HeaderLen.toLong)
      if (endPos > startPos) Some(FloSegmentRange(file, startPos, endPos): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FloSegmentReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class FloSegmentRange(file: String, startByte: Long, endByte: Long)
    extends InputPartition

final class FloSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[FloSegmentRange]
    new FloSegmentPartitionReader(range)
  }
}

final class FloSegmentPartitionReader(range: FloSegmentRange)
    extends PartitionReader[InternalRow] {

  private val bytes: Array[Byte] = {
    val p = new Path(range.file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try {
      val len = (range.endByte - range.startByte).toInt
      val buf = new Array[Byte](len)
      in.seek(range.startByte)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  private var pos = 0
  private var current: InternalRow = _

  override def next(): Boolean =
    FloBinaryCodec.decode(bytes, pos) match {
      case Some((e, nextPos)) =>
        pos = nextPos
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

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[flosegments] object FloSegments {
  val HeaderLen = 16 // segment header: create/end timestamps (header.rs:9-59)

  /** (file, length) for every `*.events` segment under `path`, sorted. */
  def listSegments(path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".events"))
      .map(s => s.getPath.toString -> s.getLen)
      .sortBy(_._1)
      .toSeq
  }
}
