package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.FloEvent

/**
 * flo's on-disk/wire event record format, implemented from the reference's
 * documented layout (flo-server/.../segment/persistent_event.rs:20-35,178-209;
 * wire form flo-protocol/src/client.rs:561-572) so the engine can exchange
 * data with an actual flo log:
 *
 * {{{
 * u32 total_len | b"FLO_EVT\n" | u16 actor | u64 counter | u16 parent_actor
 * | u64 parent_counter | u64 ts_millis | u32 ns_len | ns | u32 data_len | data
 * }}}
 *
 * Big-endian throughout; a null parent id is the all-zero id on the wire
 * (flo-protocol/src/client.rs:116-118, parse at :335-347). `total_len` counts
 * the WHOLE record INCLUDING the 4-byte length field itself:
 * `PersistentEvent::get_repr_length` = 48 + ns_len + data_len
 * (persistent_event.rs:20-34) and `validate` rejects any record where
 * `total_len != 48 + ns_len + data_len` (persistent_event.rs:97). The next
 * record therefore starts at `offset + total_len`.
 */
object FloBinaryCodec {

  val Magic: Array[Byte] = "FLO_EVT\n".getBytes("ASCII")
  /** 4(len) + 8(magic) + 2 + 8 + 2 + 8 + 8 + 4 + 4 = 48 fixed bytes. */
  private val FixedLen = 4 + 8 + 2 + 8 + 2 + 8 + 8 + 4 + 4

  /** Serialize one event to its binary record. */
  def encode(e: FloEvent): Array[Byte] = {
    val ns = e.namespace.getBytes("UTF-8")
    val data = if (e.data == null) Array.empty[Byte] else e.data
    val totalLen = FixedLen + ns.length + data.length
    val buf = ByteBuffer.allocate(totalLen).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(totalLen)
    buf.put(Magic)
    buf.putShort(e.partition.toShort)
    buf.putLong(e.event_counter)
    buf.putShort(e.parent_partition.getOrElse(0).toShort)
    buf.putLong(e.parent_counter.getOrElse(0L))
    buf.putLong(e.timestamp.getTime)
    buf.putInt(ns.length)
    buf.put(ns)
    buf.putInt(data.length)
    buf.put(data)
    buf.array()
  }

  /** Parse one record starting at `offset`; returns the event and the next
    * offset, or None on truncation/bad magic (the reference's reader stops
    * at the first invalid record — segment/mod.rs:153-183). */
  def decode(bytes: Array[Byte], offset: Int): Option[(FloEvent, Int)] = {
    if (offset + 4 > bytes.length) return None
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset).order(ByteOrder.BIG_ENDIAN)
    val totalLen = buf.getInt
    if (totalLen < FixedLen || offset + totalLen > bytes.length) return None
    val magic = new Array[Byte](8)
    buf.get(magic)
    if (!java.util.Arrays.equals(magic, Magic)) return None
    val partition = buf.getShort & 0xFFFF
    val counter = buf.getLong
    val parentPartition = buf.getShort & 0xFFFF
    val parentCounter = buf.getLong
    val tsMillis = buf.getLong
    val nsLen = buf.getInt
    // overflow-safe: nsLen near Int.MaxValue must not wrap the sum negative
    if (nsLen < 0 || nsLen > totalLen - FixedLen) return None
    val ns = new Array[Byte](nsLen)
    buf.get(ns)
    val dataLen = buf.getInt
    // mirror the reference's validate(): total_len must equal 48 + ns + data
    // (persistent_event.rs:97) — reject mismatched lengths rather than drift.
    if (dataLen < 0 || dataLen != totalLen - FixedLen - nsLen) return None
    val data = new Array[Byte](dataLen)
    buf.get(data)
    // all-zero parent id means null
    val (pc, pp) =
      if (parentCounter == 0L && parentPartition == 0) (None, None)
      else (Some(parentCounter), Some(parentPartition))
    Some((FloEvent(counter, partition, new Timestamp(tsMillis), pc, pp,
      new String(ns, "UTF-8"), data), offset + totalLen))
  }

  /** Parse a whole segment buffer (back-to-back records). */
  def decodeAll(bytes: Array[Byte], offset: Int = 0): Seq[FloEvent] = {
    val out = Seq.newBuilder[FloEvent]
    var pos = offset
    var continue = true
    while (continue) decode(bytes, pos) match {
      case Some((e, next)) => out += e; pos = next
      case None => continue = false
    }
    out.result()
  }

  /** Distributed encode: events → binary records (one per row). */
  def encodeDataset(events: Dataset[FloEvent]): Dataset[Array[Byte]] = {
    import events.sparkSession.implicits._
    events.mapPartitions(_.map(encode))
  }

  /** Distributed decode: binary records → events. */
  def decodeDataset(spark: SparkSession, records: Dataset[Array[Byte]]): Dataset[FloEvent] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap(b => decode(b, 0).map(_._1)))
  }

  /** Read raw flo segment files (`<n>.events`, 16-byte header of create/end
    * timestamps then records — segment/header.rs:9-59) into a DataFrame. */
  def readSegmentFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(glob)
      .flatMap { case (_, pds) => decodeAll(pds.toArray(), offset = 16) }
      .toDF()
  }

  /** The 16-byte segment header: big-endian u64 create/end millis
    * (segment/header.rs:9-59). */
  def encodeHeader(createMillis: Long, endMillis: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
    buf.putLong(createMillis)
    buf.putLong(endMillis)
    buf.array()
  }

  /**
   * Write a dataset of events as VALID flo segment files — the inverse of
   * [[readSegmentFiles]] and the missing half of the migration path: data
   * processed here can round-trip back to a live flo server's storage
   * format. One `<n>.events` file per Spark partition (events repartitioned
   * by flo partition and counter-sorted within, so each file is a
   * contiguous ordered run like a real segment); the header's create/end
   * timestamps are the file's min/max event times. Executor-side streaming
   * writes — no driver collect, task heap bounded by one record.
   *
   * Returns the number of events written.
   */
  def writeSegmentFiles(events: Dataset[FloEvent], dir: String): Long = {
    import events.sparkSession.implicits._
    val spark = events.sparkSession
    val fsForDir = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsForDir.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val shippedConf =
      new graft.util.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

    val written = events
      .repartition(org.apache.spark.sql.functions.col("partition"))
      .sortWithinPartitions("event_counter")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          // attempt-unique staging names: speculative/retried attempts of
          // this partition each write their own files, then atomically
          // rename into the final name — concurrent attempts can never
          // interleave bytes in one file (their contents are identical, so
          // whichever rename wins, the segment is whole)
          val ctx = org.apache.spark.TaskContext.get()
          val taskId = ctx.partitionId()
          val attempt = ctx.taskAttemptId()
          val conf = shippedConf.value
          val tmp = new org.apache.hadoop.fs.Path(dir, s".${taskId + 1}.events.body-$attempt")
          val staged = new org.apache.hadoop.fs.Path(dir, s".${taskId + 1}.events.attempt-$attempt")
          val dst = new org.apache.hadoop.fs.Path(dir, s"${taskId + 1}.events")
          val fs = tmp.getFileSystem(conf)
          // records stream to a temp body file while min/max times accrue;
          // the final file is header + body (headers are not seekable on
          // every FileSystem, so the body cannot be written in place first)
          var minTs = Long.MaxValue
          var maxTs = Long.MinValue
          var n = 0L
          val body = fs.create(tmp, true)
          try {
            it.foreach { e =>
              val ts = e.timestamp.getTime
              if (ts < minTs) minTs = ts
              if (ts > maxTs) maxTs = ts
              body.write(encode(e))
              n += 1
            }
          } finally body.close()
          val out = fs.create(staged, true)
          try {
            out.write(encodeHeader(minTs, maxTs))
            val in = fs.open(tmp)
            try {
              val buf = new Array[Byte](64 * 1024)
              var read = in.read(buf)
              while (read >= 0) {
                if (read > 0) out.write(buf, 0, read)
                read = in.read(buf)
              }
            } finally in.close()
          } finally out.close()
          fs.delete(tmp, false)
          if (!fs.rename(staged, dst)) {
            // dst may be a stale file from a previous export — replace it;
            // if a sibling attempt wins the race instead, its content is
            // identical, so either way the final segment is whole
            fs.delete(dst, false)
            if (!fs.rename(staged, dst)) {
              if (fs.exists(dst)) fs.delete(staged, false)
              else throw new java.io.IOException(s"could not commit $staged -> $dst")
            }
          }
          Iterator.single(n)
        }
      }
    written.collect().sum
  }
}
