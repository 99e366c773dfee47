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

  test("maxEventsPerTrigger admits an event budget per micro-batch (T4, connection_state.rs:11)") {
    val dir = tempDir("segsrc-admission")
    writeSegment(dir, "1.events", (1L to 25L).map(i => event(i, s"/a/$i")))
    writeSegment(dir, "2.events", (26L to 40L).map(i => event(i, s"/a/$i")))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("flo-segments")
      .option("maxEventsPerTrigger", "10")
      .load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val nonEmpty = sizes.filter(_ > 0)
    assert(nonEmpty.sum == 40, s"lost/duplicated events: $sizes")
    assert(nonEmpty.forall(_ <= 10), s"a batch exceeded the 10-event budget: $sizes")
    assert(nonEmpty.length == 4, s"expected 4 full batches of 10, got $sizes")
  }

  test("SetBatchSize renegotiates the budget on a live stream (client.rs:261-262)") {
    val dir = tempDir("segsrc-renegotiate")
    writeSegment(dir, "1.events", (1L to 40L).map(i => event(i, s"/r/$i")))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val q = spark.readStream.format("flo-segments")
        .option("maxEventsPerTrigger", "10")
        .load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          sizes.synchronized { sizes += n }
          // renegotiate after the second batch: foreachBatch runs on the
          // stream's driver thread, so the new budget is in place before
          // the next latestOffset call — no restart
          if (sizes.count(_ > 0) == 2) FloSegmentsSource.setBatchSize(dir, 20L)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(sizes.filter(_ > 0).toSeq == Seq(10L, 10L, 20L),
        s"expected 10+10 then a renegotiated 20, got $sizes")
    } finally FloSegmentsSource.clearBatchSize(dir)
  }

  test("admission drains 10+ segments in NUMERIC order, not lexicographic") {
    val dir = tempDir("segsrc-numorder")
    // 12 segments of 5 events each; lexicographic order would visit
    // 1,10,11,12,2,... and deliver counters out of order across batches
    (0 until 12).foreach { s =>
      writeSegment(dir, s"${s + 1}.events",
        (1L to 5L).map(i => event(s * 5 + i, s"/n/${s * 5 + i}")))
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("flo-segments")
      .option("maxEventsPerTrigger", "5")
      .load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.orderBy("event_counter").collect().map(_.getAs[Long]("event_counter"))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(seen.toSeq == (1L to 60L),
      s"cross-batch delivery order broken: ${seen.take(20)}")
  }

  test("writeSegmentFiles round-trips: engine -> .events -> flo-segments source") {
    val root = tempDir("segsrc-export-engine")
    val engine = new graft.engine.FloEngine(spark, root)
    engine.createStream(graft.engine.FloEngine.EventStreamOptions("default", numPartitions = 2))
    engine.produceStrings("default", 1, (1 to 8).map(i => (s"/x/$i", s"v$i")))
    engine.produceStrings("default", 2, (1 to 5).map(i => (s"/y/$i", s"w$i")))

    val out = tempDir("segsrc-export-dir")
    assert(engine.exportSegments("default", out) == 13L)

    // files are valid segments: 16-byte header with min/max millis, records decode
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.endsWith(".events"))
    assert(segs.nonEmpty)
    segs.foreach { s =>
      val bytes = Files.readAllBytes(Paths.get(s.getPath.toUri))
      val buf = java.nio.ByteBuffer.wrap(bytes, 0, 16)
      val create = buf.getLong; val end = buf.getLong
      assert(create > 0 && end >= create, s"bad header times: $create/$end")
      assert(FloBinaryCodec.decodeAll(bytes, offset = 16).nonEmpty)
    }

    // read back through the DSv2 source: envelope identical to the engine view
    val back = spark.read.format("flo-segments").load(out)
    val orig = engine.consumeAll("default")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getAs[Long]("event_counter"), r.getAs[Int]("partition"),
          r.getAs[Timestamp]("timestamp").getTime, r.getAs[String]("namespace"),
          new String(r.getAs[Array[Byte]]("data"), "UTF-8"))
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(key(back) == key(orig))
  }

  test("a large segment streams through the reader without whole-range buffering") {
    // 40 MiB segment: 4000 records of ~10 KiB. The reader holds ONE record
    // at a time; before the fix this test's task buffered the full 40 MiB.
    val dir = tempDir("segsrc-large")
    val big = "x" * 10000
    val events = (1L to 4000L).map(i =>
      FloEvent(i, 1, new Timestamp(1700000000000L + i), None, None, s"/big/$i",
        big.getBytes("UTF-8")))
    writeSegment(dir, "1.events", events)
    val df = spark.read.format("flo-segments").load(dir)
    assert(df.count() == 4000)
    import org.apache.spark.sql.functions._
    assert(df.agg(sum(length(col("data")))).collect().head.getLong(0) == 40000000L)
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

  test("DSv2 streaming WRITE: segments stream out as valid .events files, epochs commit by rename") {
    val srcDir = tempDir("segsink-src")
    val outDir = tempDir("segsink-out")
    val ckpt = tempDir("segsink-ckpt")
    // source: native segments streamed IN via the DSv2 source, OUT via the
    // DSv2 sink — a pure flo-format relay with a Spark plan in the middle
    writeSegment(srcDir, "1.events", (1L to 30L).map(i => event(i, s"/w/$i")))
    val q = spark.readStream.format("flo-segments").load(srcDir)
      .writeStream.format("flo-segments")
      .option("checkpointLocation", ckpt)
      .start(outDir)
    try {
      q.processAllAvailable()
      // epoch 2: more records into the same source segment
      appendTo(srcDir, "1.events", (31L to 45L).map(i => event(i, s"/w/$i")))
      q.processAllAvailable()
    } finally q.stop()

    // every emitted file is a valid committed segment: final names only
    // (hidden files = local-FS .crc checksum sidecars, not ours)
    val files = new java.io.File(outDir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.matches("e\\d+-[0-9a-f-]+\\.p\\d+\\.events")),
      s"unexpected sink files: $files")

    // the written log round-trips through the batch reader with full parity
    val back = spark.read.format("flo-segments").load(outDir)
    val got = back.orderBy("event_counter").collect()
    assert(got.map(_.getAs[Long]("event_counter")).toSeq == (1L to 45L))
    assert(got.head.getAs[String]("namespace") == "/w/1")
    assert(new String(got.last.getAs[Array[Byte]]("data"), "UTF-8") == "d45")
    assert(got.head.getAs[Timestamp]("timestamp") == new Timestamp(1700000000001L))
    // null parents survive the round trip
    assert(got.forall(_.isNullAt(got.head.fieldIndex("parent_counter"))))

    // the declared (partition, event_counter) ordering was honored: each
    // file's records are counter-sorted (valid contiguous runs, like real
    // segments), and each file holds exactly one flo partition
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outDir, f))
      val evs = FloBinaryCodec.decodeAll(bytes, offset = 16)
      assert(evs.nonEmpty, s"$f decoded empty")
      assert(evs.map(_.partition).distinct.size == 1, s"$f mixes partitions")
      assert(evs.map(_.event_counter) == evs.map(_.event_counter).sorted, s"$f unsorted")
      // header min/max match the contained records
      val buf = java.nio.ByteBuffer.wrap(bytes, 0, 16)
      assert(buf.getLong == evs.map(_.timestamp.getTime).min, s"$f header min")
      assert(buf.getLong == evs.map(_.timestamp.getTime).max, s"$f header max")
    }
  }

  test("DSv2 batch WRITE: df.write.format(flo-segments) appends committed segment files") {
    val outDir = tempDir("segsink-batch")
    import spark.implicits._
    val df = (1L to 40L).map(i => event(i, s"/bw/$i")).toDF()
    df.write.format("flo-segments").mode("append").save(outDir)
    // a second job appends WITHOUT colliding (query-unique file tags)
    (41L to 60L).map(i => event(i, s"/bw/$i")).toDF()
      .write.format("flo-segments").mode("append").save(outDir)

    val files = new java.io.File(outDir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.matches("b[0-9a-f-]+\\.p\\d+\\.events")),
      s"unexpected sink files: $files")
    val back = spark.read.format("flo-segments").load(outDir)
    val got = back.orderBy("event_counter").collect()
    assert(got.map(_.getAs[Long]("event_counter")).toSeq == (1L to 60L))
    // declared ordering honored per file
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outDir, f))
      val evs = FloBinaryCodec.decodeAll(bytes, offset = 16)
      assert(evs.map(_.partition).distinct.size == 1, s"$f mixes partitions")
      assert(evs.map(_.event_counter) == evs.map(_.event_counter).sorted, s"$f unsorted")
    }
  }
}
