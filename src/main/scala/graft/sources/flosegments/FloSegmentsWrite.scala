package graft.sources.flosegments

import java.io.IOException

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

import graft.model.{FloEvent, FloSchema}
import graft.sources.FloBinaryCodec
import graft.util.SerializableHadoopConf

/**
 * DSv2 STREAMING WRITE for the native flo segment format — the sink half
 * of the `flo-segments` source: `writeStream.format("flo-segments")
 * .start(dir)` renders a live stream of envelope rows into valid
 * `*.events` segment files a real flo server (or [[FloSegmentsSource]] /
 * `FloEngine.importSegments`) can read back. Completes the migration
 * matrix: batch both ways existed (`readSegmentFiles` /
 * `writeSegmentFiles`), streaming read existed (the DSv2 source); this is
 * streaming OUT.
 *
 * Plan contract via [[RequiresDistributionAndOrdering]]: the write
 * DECLARES clustering on `partition` and (partition, event_counter)
 * ordering, and Spark plans the shuffle + sort — each flo partition lands
 * wholly in one task with rows in counter order, so every emitted file is
 * a contiguous ordered run like a real segment (the same declared-
 * requirements discipline as AsofMergeJoinExec, applied to the write
 * side).
 *
 * Exactly-once per epoch: writers stage `.e<epoch>.p<part>.t<task>.staged`
 * files; the driver's `commit(epoch)` renames them to their deterministic
 * final names `e<epoch>.p<part>.events`, and a RETRIED epoch finding its
 * final file already present discards the duplicate stage — the same
 * rename-as-commit idempotence the engine's produceStream markers give
 * the parquet path.
 */
final class FloSegmentsWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write =
    new FloSegmentsWrite(path, info.schema(), info.queryId())
}

final class FloSegmentsWrite(path: String, schema: StructType, queryId: String)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("partition")))

  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.identity("partition"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("event_counter"), SortDirection.ASCENDING))

  override def toStreaming: StreamingWrite =
    new FloSegmentsStreamingWrite(path, schema, queryId.take(8))

  /** Batch rendering: same writers and rename-commit, one deterministic
    * file set per (query, flo partition) — `b<queryId>.p<part>.events` —
    * so a retried task attempt can never double-commit and distinct jobs
    * appending to one dir never collide. */
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new FloSegmentsBatchWrite(path, schema, queryId.take(8))
}

final class FloSegmentsBatchWrite(path: String, schema: StructType, tag: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.DataWriterFactory =
    new FloSegmentsBatchWriterFactory(path, schema, conf, tag)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    FloSegmentsCommit.commit(path, conf, messages)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    FloSegmentsCommit.abort(path, conf, messages)
}

/** Standalone serializable factory: the write object itself holds a live
  * SparkSession reference and must never ship to executors. */
final class FloSegmentsBatchWriterFactory(
    path: String, schema: StructType, conf: SerializableHadoopConf, tag: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FloSegmentsDataWriter(path, schema, conf, partitionId, taskId, s"b$tag")
}

/** Rename-as-commit shared by the batch and streaming writes. */
private[flosegments] object FloSegmentsCommit {
  def commit(path: String, conf: SerializableHadoopConf,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case FloSegmentsCommitMessage(files) => files.foreach { case (staged, finalName) =>
        val src = new Path(staged)
        val dst = new Path(path, finalName)
        if (fs.exists(dst)) fs.delete(src, false)
        else if (!fs.rename(src, dst)) {
          if (fs.exists(dst)) fs.delete(src, false)
          else throw new IOException(s"could not commit $src -> $dst")
        }
      }
      case _ =>
    }
  }

  def abort(path: String, conf: SerializableHadoopConf,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case FloSegmentsCommitMessage(files) =>
        files.foreach { case (staged, _) => fs.delete(new Path(staged), false) }
      case _ =>
    }
  }
}

/** `tag` = the query id: epoch numbers restart at 0 for every fresh
  * checkpoint, so untagged `e<epoch>` names would let a SECOND query
  * writing to the same dir collide with the first's epochs — and the
  * commit-side duplicate check would silently discard the new data as a
  * "retried epoch". The query id is stable across restarts from one
  * checkpoint (epoch retry dedup still works) and distinct across
  * queries (no collision). */
final class FloSegmentsStreamingWrite(path: String, schema: StructType, tag: String)
    extends StreamingWrite {

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FloSegmentsWriterFactory(path, schema, conf, tag)

  /** Rename staged files to their deterministic final names; a final file
    * already present (retried epoch) wins and the stage is discarded. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    FloSegmentsCommit.commit(path, conf, messages)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    FloSegmentsCommit.abort(path, conf, messages)
}

final case class FloSegmentsCommitMessage(files: Seq[(String, String)])
    extends WriterCommitMessage

final class FloSegmentsWriterFactory(
    path: String, schema: StructType, conf: SerializableHadoopConf, tag: String)
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new FloSegmentsDataWriter(path, schema, conf, partitionId, taskId,
      s"e$epochId-$tag")
}

/**
 * Per-task writer: one open body file per flo partition seen (the declared
 * clustering makes that a handful per task, each fed in counter order).
 * Bodies stream record-by-record — task heap is bounded by one record —
 * and `commit()` prepends the 16-byte min/max-timestamp header while
 * staging, exactly like the batch exporter.
 */
final class FloSegmentsDataWriter(
    dir: String, schema: StructType, conf: SerializableHadoopConf,
    partitionId: Int, taskId: Long, tag: String)
    extends DataWriter[InternalRow] {

  private val fs = new Path(dir).getFileSystem(conf.value)
  fs.mkdirs(new Path(dir))

  // field indexes by NAME: the incoming schema is by-name resolved against
  // the table schema, but positions are not guaranteed
  private def idx(n: String) = schema.fieldIndex(n)
  private val iCounter = idx("event_counter")
  private val iPartition = idx("partition")
  private val iTs = idx("timestamp")
  private val iParentC = idx("parent_counter")
  private val iParentP = idx("parent_partition")
  private val iNs = idx("namespace")
  private val iData = idx("data")

  private final class OpenSeg(val part: Int) {
    val body = new Path(dir, s".$tag.p$part.t$taskId.body")
    val out = fs.create(body, true)
    var minTs = Long.MaxValue
    var maxTs = Long.MinValue
  }
  private val open = mutable.Map.empty[Int, OpenSeg]

  override def write(row: InternalRow): Unit = {
    val part = row.getInt(iPartition)
    val seg = open.getOrElseUpdate(part, new OpenSeg(part))
    val tsMillis = Math.floorDiv(row.getLong(iTs), 1000L) // micros -> millis
    if (tsMillis < seg.minTs) seg.minTs = tsMillis
    if (tsMillis > seg.maxTs) seg.maxTs = tsMillis
    seg.out.write(FloBinaryCodec.encode(FloEvent(
      event_counter = row.getLong(iCounter),
      partition = part,
      timestamp = new java.sql.Timestamp(tsMillis),
      parent_counter = if (row.isNullAt(iParentC)) None else Some(row.getLong(iParentC)),
      parent_partition = if (row.isNullAt(iParentP)) None else Some(row.getInt(iParentP)),
      namespace = row.getUTF8String(iNs).toString,
      data = row.getBinary(iData))))
  }

  override def commit(): WriterCommitMessage = {
    val files = open.values.map { seg =>
      seg.out.close()
      val staged = new Path(dir, s".$tag.p${seg.part}.t$taskId.staged")
      val out = fs.create(staged, true)
      try {
        out.write(FloBinaryCodec.encodeHeader(seg.minTs, seg.maxTs))
        val in = fs.open(seg.body)
        try {
          val buf = new Array[Byte](64 * 1024)
          var read = in.read(buf)
          while (read >= 0) {
            if (read > 0) out.write(buf, 0, read)
            read = in.read(buf)
          }
        } finally in.close()
      } finally out.close()
      fs.delete(seg.body, false)
      (staged.toString, s"$tag.p${seg.part}.events")
    }.toSeq
    open.clear()
    FloSegmentsCommitMessage(files)
  }

  override def abort(): Unit = {
    open.values.foreach { seg =>
      try seg.out.close() catch { case _: Exception => }
      fs.delete(seg.body, false)
    }
    open.clear()
  }

  override def close(): Unit = abort()
}
