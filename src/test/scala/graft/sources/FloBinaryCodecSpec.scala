package graft.sources

import java.sql.Timestamp

import graft.SparkSuite
import graft.model.FloEvent

class FloBinaryCodecSpec extends SparkSuite {

  private val ev = FloEvent(42L, 3, new Timestamp(1700000000123L),
    Some(41L), Some(2), "/meals/breakfast", "bacon".getBytes("UTF-8"))

  test("record round-trips through the binary format") {
    val bytes = FloBinaryCodec.encode(ev)
    val Some((decoded, next)) = FloBinaryCodec.decode(bytes, 0)
    assert(decoded == ev.copy(data = decoded.data))
    assert(decoded.data.toSeq == ev.data.toSeq)
    assert(next == bytes.length)
  }

  test("record layout matches the reference (48 + ns + data, FLO_EVT magic)") {
    val bytes = FloBinaryCodec.encode(ev)
    // persistent_event.rs: total record size = 48 + namespace + data
    assert(bytes.length == 48 + "/meals/breakfast".length + "bacon".length)
    assert(new String(bytes.slice(4, 12), "ASCII") == "FLO_EVT\n")
    // big-endian u32 total_len counts everything after itself
    val len = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    assert(len == bytes.length - 4)
  }

  test("null parent encodes as the all-zero id (client.rs:116-118)") {
    val orphan = ev.copy(parent_counter = None, parent_partition = None)
    val bytes = FloBinaryCodec.encode(orphan)
    val Some((decoded, _)) = FloBinaryCodec.decode(bytes, 0)
    assert(decoded.parent_counter.isEmpty && decoded.parent_partition.isEmpty)
  }

  test("decodeAll stops at truncation and bad magic") {
    val two = FloBinaryCodec.encode(ev) ++ FloBinaryCodec.encode(ev.copy(event_counter = 43L))
    assert(FloBinaryCodec.decodeAll(two).map(_.event_counter) == Seq(42L, 43L))
    assert(FloBinaryCodec.decodeAll(two.dropRight(3)).map(_.event_counter) == Seq(42L))
    val garbage = Array.fill[Byte](60)(7)
    assert(FloBinaryCodec.decodeAll(garbage).isEmpty)
  }

  test("empty payload and u16-range partition survive") {
    val e = FloEvent(1L, 65535, new Timestamp(0L), None, None, "/x", Array.empty)
    val Some((d, _)) = FloBinaryCodec.decode(FloBinaryCodec.encode(e), 0)
    assert(d.partition == 65535 && d.data.isEmpty)
  }

  test("distributed encode/decode round-trip + raw segment file read") {
    import spark.implicits._
    val events = (1 to 100).map(i =>
      FloEvent(i.toLong, 1 + i % 3, new Timestamp(1700000000000L + i),
        None, None, s"/ns/$i", s"payload$i".getBytes("UTF-8")))
    val ds = spark.createDataset(events)
    val encoded = FloBinaryCodec.encodeDataset(ds)
    val decoded = FloBinaryCodec.decodeDataset(spark, encoded).collect()
      .sortBy(_.event_counter)
    assert(decoded.map(_.event_counter).toSeq == (1L to 100L))
    assert(decoded.map(_.namespace).toSeq == (1 to 100).map(i => s"/ns/$i"))

    // write a fake raw segment file: 16-byte header + records, read it back
    val dir = tempDir("flo-segments")
    val header = new Array[Byte](16)
    val body = events.flatMap(FloBinaryCodec.encode).toArray
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/1.events"), header ++ body)
    val fromSeg = FloBinaryCodec.readSegmentFiles(spark, s"$dir/*.events")
    assert(fromSeg.count() == 100)
  }
}
