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
    // big-endian u32 total_len counts the WHOLE record, length field included
    // (persistent_event.rs:20-34 get_repr_length = 48 + ns + data; :97 validate)
    val len = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    assert(len == bytes.length)
  }

  test("decodes a hand-built byte-literal record from the reference layout") {
    // Built independently of encode(): persistent_event.rs:178-209 layout,
    // ns = "/a" (2 bytes), data = 0xCAFE (2 bytes) -> total_len = 52.
    val buf = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(52)                               // u32 total_len (incl. itself)
    buf.put("FLO_EVT\n".getBytes("ASCII"))       // 8-byte magic
    buf.putShort(7)                              // u16 actor (partition)
    buf.putLong(99L)                             // u64 event_counter
    buf.putShort(0)                              // u16 parent actor (zero id)
    buf.putLong(0L)                              // u64 parent counter
    buf.putLong(1700000000123L)                  // u64 ts millis
    buf.putInt(2)                                // u32 ns_len
    buf.put("/a".getBytes("UTF-8"))
    buf.putInt(2)                                // u32 data_len
    buf.put(Array(0xCA.toByte, 0xFE.toByte))
    val bytes = buf.array()
    val Some((d, next)) = FloBinaryCodec.decode(bytes, 0)
    assert(next == 52)
    assert(d.event_counter == 99L && d.partition == 7 && d.namespace == "/a")
    assert(d.parent_counter.isEmpty && d.parent_partition.isEmpty)
    assert(d.timestamp.getTime == 1700000000123L)
    assert(d.data.toSeq == Seq(0xCA.toByte, 0xFE.toByte))
    // two back-to-back literal records decode as two events (the r1 bug
    // yielded only the first: next-offset was computed 4 bytes long)
    assert(FloBinaryCodec.decodeAll(bytes ++ bytes).map(_.event_counter) == Seq(99L, 99L))
    // encode() reproduces the literal byte-for-byte
    val enc = FloBinaryCodec.encode(d)
    assert(enc.toSeq == bytes.toSeq)
  }

  test("rejects an overflowing ns_len instead of crashing (corrupt record)") {
    val good = FloBinaryCodec.encode(ev)
    val bad = good.clone()
    // valid magic + total_len, ns_len = 0x7FFFFFF0: the naive 48 + ns_len
    // sum wraps negative — decode must return None, not throw/allocate 2 GB
    java.nio.ByteBuffer.wrap(bad, 40, 4).putInt(0x7FFFFFF0)
    assert(FloBinaryCodec.decode(bad, 0).isEmpty)
  }

  test("rejects mismatched total_len like the reference's validate") {
    val good = FloBinaryCodec.encode(ev)
    val bad = good.clone()
    // inflate total_len by 4 (the r1 off-by-len self-consistent form)
    val buf = java.nio.ByteBuffer.wrap(bad, 0, 4)
    buf.putInt(good.length + 4)
    assert(FloBinaryCodec.decode(bad ++ new Array[Byte](4), 0).isEmpty)
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

  test("property: random events round-trip and concatenations decode completely") {
    val rnd = new scala.util.Random(99)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(5)
      val events = (1 to n).map { i =>
        val nsLen = rnd.nextInt(40)
        val ns = "/" + rnd.alphanumeric.take(nsLen).mkString
        val data = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(data)
        val parent = if (rnd.nextBoolean()) (Some(rnd.nextLong().abs.max(1L)), Some(1 + rnd.nextInt(65534)))
                     else (None, None)
        FloEvent(rnd.nextLong().abs, rnd.nextInt(65536),
          new Timestamp(rnd.nextLong().abs % 4102444800000L),
          parent._1, parent._2, ns, data)
      }
      val buf = events.flatMap(FloBinaryCodec.encode).toArray
      val back = FloBinaryCodec.decodeAll(buf)
      assert(back.size == n, s"decoded ${back.size} of $n")
      back.zip(events).foreach { case (d, e) =>
        assert(d.event_counter == e.event_counter && d.partition == e.partition)
        assert(d.namespace == e.namespace && d.data.toSeq == e.data.toSeq)
        assert(d.timestamp == e.timestamp)
        assert(d.parent_counter == e.parent_counter && d.parent_partition == e.parent_partition)
      }
    }
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
