package graft.sources.flosegments

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp

import graft.SparkSuite
import graft.model.FloEvent
import graft.sources.FloBinaryCodec

/** The DataSourceV2 source over flo's native segment format. */
class FloSegmentsSourceSpec extends SparkSuite {

  private def event(c: Long, ns: String): FloEvent =
    FloEvent(c, 1 + (c % 3).toInt, new Timestamp(1700000000000L + c), None, None,
      ns, s"d$c".getBytes("UTF-8"))

  private def writeSegment(dir: String, name: String, events: Seq[FloEvent]): Unit =
    Files.write(Paths.get(dir, name),
      new Array[Byte](16) ++ events.flatMap(FloBinaryCodec.encode))

  private def appendTo(dir: String, name: String, events: Seq[FloEvent]): Unit =
    Files.write(Paths.get(dir, name),
      events.flatMap(FloBinaryCodec.encode).toArray, StandardOpenOption.APPEND)

  test("batch read of native segment files via format(\"flo-segments\")") {
    val dir = tempDir("segsrc-batch")
    writeSegment(dir, "1.events", (1L to 50L).map(i => event(i, s"/b/$i")))
    writeSegment(dir, "2.events", (51L to 80L).map(i => event(i, s"/b/$i")))
    val df = spark.read.format("flo-segments").load(dir)
    assert(df.count() == 80)
    val got = df.orderBy("event_counter").collect()
    assert(got.map(_.getAs[Long]("event_counter")).toSeq == (1L to 80L))
    assert(got.head.getAs[String]("namespace") == "/b/1")
    assert(new String(got.head.getAs[Array[Byte]]("data"), "UTF-8") == "d1")
    assert(got.head.getAs[Timestamp]("timestamp") == new Timestamp(1700000000001L))
  }

  test("streaming read picks up appended records AND new segment files") {
    val dir = tempDir("segsrc-stream")
    writeSegment(dir, "1.events", (1L to 10L).map(i => event(i, s"/s/$i")))
    val q = spark.readStream.format("flo-segments").load(dir)
      .writeStream.format("memory").queryName("segtail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("segtail").count() == 10)

      // chase the writer within the SAME segment (flo's live-reader path)
      appendTo(dir, "1.events", (11L to 15L).map(i => event(i, s"/s/$i")))
      q.processAllAvailable()
      assert(spark.table("segtail").count() == 15)

      // segment rotation: a new file appears
      writeSegment(dir, "2.events", (16L to 20L).map(i => event(i, s"/s/$i")))
      q.processAllAvailable()
      val counters = spark.table("segtail").orderBy("event_counter")
        .collect().map(_.getAs[Long]("event_counter")).toSeq
      assert(counters == (1L to 20L))
    } finally q.stop()
  }

  test("checkpointed restart resumes from byte offsets without redelivery") {
    val dir = tempDir("segsrc-ckpt")
    val ckpt = tempDir("segsrc-ckpt-loc")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("flo-segments").load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.collect().map(_.getAs[Long]("event_counter")) }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    writeSegment(dir, "1.events", (1L to 5L).map(i => event(i, s"/c/$i")))
    drain()
    assert(seen.sorted.toSeq == (1L to 5L))
    appendTo(dir, "1.events", (6L to 9L).map(i => event(i, s"/c/$i")))
    drain()
    assert(seen.sorted.toSeq == (1L to 9L), s"redelivery or loss: ${seen.sorted}")
  }

  test("offset json round-trips (incl. quotes in paths)") {
    val o = SegmentsOffset(Map("/a/1.events" -> 123L, "/b \"x\"/2.events" -> 7L))
    assert(SegmentsOffset.fromJson(o.json()) == o)
    assert(SegmentsOffset.fromJson(SegmentsOffset(Map.empty).json()).positions.isEmpty)
  }

  test("importSegments migrates a flo data dir into the engine, ids preserved") {
    val segDir = tempDir("segsrc-import")
    writeSegment(segDir, "1.events", (1L to 12L).map(i => event(i, s"/m/$i")))
    val root = tempDir("segsrc-import-engine")
    val engine = new graft.engine.FloEngine(spark, root)
    assert(engine.importSegments("migrated", segDir) == 12L)
    // original ids and namespaces survive; glob consume works over them
    val got = engine.consumeAll("migrated", "/m/*").collect()
    assert(got.map(_.getAs[Long]("event_counter")).toSeq == (1L to 12L))
    // the counter sequence continues above the imported maximum
    val acked = engine.produceStrings("migrated", 1, Seq("/m/new" -> ""))
    assert(acked.collect().head.getAs[Long]("event_counter") == 13L)
  }

  test("glob + vv predicates compose on the segment source") {
    import org.apache.spark.sql.functions.col
    val dir = tempDir("segsrc-pred")
    writeSegment(dir, "1.events", (1L to 30L).map(i => event(i, s"/p/${i % 5}")))
    val df = spark.read.format("flo-segments").load(dir)
      .filter(graft.model.VersionVector(1 -> 3L, 2 -> 0L)
        .toPredicate(col("partition"), col("event_counter")))
      .filter(graft.functions.ns_glob(col("namespace"), "/p/*"))
    // partitions are 1+(c%3): p1 = counters 3,6,..., p2 = 1,4,...
    val got = df.orderBy("event_counter").collect()
      .map(r => (r.getAs[Long]("event_counter"), r.getAs[Int]("partition")))
    assert(got.forall { case (c, p) => (p == 1 && c > 3) || (p == 2 && c > 0) })
    assert(got.nonEmpty)
  }
}
