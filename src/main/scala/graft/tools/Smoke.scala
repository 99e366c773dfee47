package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Dev smoke-drive: exercises the public library surface end-to-end against
 * the driver-provided testdata (see FIXTURES.md §3 bridging fixture).
 * Run: `sbt "runMain graft.tools.Smoke [sfDir]"`.
 */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    val ev = graft.Tables.floEvents(spark, sfDir)
    println("TOTAL=" + ev.count())

    val filtered = ev.filter(ns_glob($"namespace", "/events/p*")).orderBy($"event_counter")
    println("GLOB_P=" + filtered.count())
    filtered.select($"namespace",
      event_id_str($"event_counter", $"partition").as("id"),
      payload_json($"data", "$.k").as("k")).show(5, false)
    println("DISTINCT_NS=" + ev.filter(ns_glob($"namespace", "/events/p*"))
      .select("namespace").distinct().collect().map(_.getString(0)).sorted.mkString(","))

    println("MATCHALL_PLAN=" + ev.filter(ns_glob($"namespace", "/**/*"))
      .queryExecution.optimizedPlan.toString.linesIterator.take(2).mkString(" | "))

    try { ev.filter(ns_glob($"namespace", "/foo**")); println("ERR=NONE (BUG)") }
    catch { case e: Exception => println("ERR=" + e.getMessage) }

    graft.expressions.GraftExtensions.register(spark)
    ev.createOrReplaceTempView("flo_smoke")
    println("SQL_NSGLOB=" + spark.sql(
      "SELECT count(*) FROM flo_smoke WHERE ns_glob(namespace, '/events/p*')")
      .collect().head.getLong(0))
    println("LITERAL=" + ev.filter(ns_glob($"namespace", "/events/purchase")).count())
    println("LITERAL_PLAN=" + ev.filter(ns_glob($"namespace", "/events/purchase"))
      .queryExecution.optimizedPlan.toString.linesIterator.take(2).mkString(" | "))

    // ---- engine drive: produce -> consume -> tail -> expire on a temp log
    import graft.engine.FloEngine
    import graft.model.VersionVector
    val root = java.nio.file.Files.createTempDirectory("smoke-engine").toString
    val engine = new FloEngine(spark, root)
    engine.createStream(FloEngine.EventStreamOptions("default", numPartitions = 2))
    engine.produceStrings("default", 1, Seq("/meals/breakfast/drinks/coffee" -> "c"))
    engine.produceStrings("default", 2, Seq("/meals/lunch/drinks/soda" -> "s", "/meals/lunch" -> "l"))
    println("ENGINE_STATUS=" + engine.status("default").toSeq.sorted.mkString(","))
    val drinks = engine.consumeAll("default", "/**/drinks/*").collect()
    println("ENGINE_DRINKS=" + drinks.map(r =>
      r.getAs[String]("namespace") + "@" + r.getAs[Long]("event_counter")).mkString(","))
    val q = engine.consumeStream("default", "/**/*", VersionVector(1 -> 0L, 2 -> 1L))
      .writeStream.format("memory").queryName("smoketail").start()
    q.processAllAvailable()
    engine.produceStrings("default", 1, Seq("/late/event" -> "x"))
    q.processAllAvailable()
    q.stop()
    println("ENGINE_TAIL=" + spark.table("smoketail").orderBy("event_counter")
      .select("namespace").collect().map(_.getString(0)).mkString(","))
    println("ENGINE_CONSUME_PLAN=" + engine.consume("default", "/late/*", VersionVector(1 -> 0L))
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("PartitionFilters"))
      .mkString(" | ").take(400))

    // ordered egress + watermark windows + vv aggregator
    val ordered = scala.collection.mutable.ArrayBuffer.empty[Long]
    val oq = engine.consumeStreamOrdered("default") { b =>
      ordered ++= b.collect().map(_.getAs[Long]("event_counter"))
    }
    oq.processAllAvailable(); oq.stop()
    println("ORDERED_EGRESS=" + ordered.mkString(","))
    val wq = engine.consumeWindowed("default", "/**/*", "1 hour")
      .writeStream.format("memory").queryName("smokewin").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    wq.awaitTermination(60000)
    println("WINDOWED_NS=" + spark.table("smokewin").count())
    import spark.implicits._
    val vvAgg = engine.consumeAll("default").select($"partition", $"event_counter")
      .as[(Int, Long)].select(graft.model.VersionVectorAggregator.column).first()
    println("VV_AGG=" + vvAgg.toSeq.sorted.mkString(","))

    // compaction + flo binary segment round-trip
    engine.compact("default")
    println("COMPACTED_CONSUME=" + engine.consumeAll("default").count())
    import graft.sources.FloBinaryCodec
    val evs = engine.consumeAll("default").as[graft.model.FloEvent].collect()
    val segDir = java.nio.file.Files.createTempDirectory("smoke-seg")
    java.nio.file.Files.write(segDir.resolve("1.events"),
      new Array[Byte](16) ++ evs.flatMap(FloBinaryCodec.encode))
    val back = FloBinaryCodec.readSegmentFiles(spark, s"$segDir/*.events")
    println("SEGMENT_READBACK=" + back.orderBy("event_counter")
      .select("namespace").collect().map(_.getString(0)).mkString(","))
    val viaSource = spark.read.format("flo-segments").load(segDir.toString)
    println("DSV2_SEGMENTS=" + viaSource.orderBy("event_counter")
      .select("event_counter").collect().map(_.getLong(0)).mkString(","))
    try { engine.consumeAll("no-such-stream"); println("NOSUCH=MISSED (BUG)") }
    catch { case e: graft.engine.NoSuchStream => println("NOSUCH=" + e.getMessage) }

    // migration: import the raw segment dir we just wrote into a new stream
    val migrated = new FloEngine(spark,
      java.nio.file.Files.createTempDirectory("smoke-migrate").toString)
    println("IMPORTED=" + migrated.importSegments("fromflo", segDir.toString) +
      " events, heads=" + migrated.status("fromflo").toSeq.sorted.mkString(","))

    // janitor racing a planned reader: plan, expire, then run
    val planned = engine.consumeAll("default")
    val cutoffNow = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    val dropped = engine.expireOldEvents("default", cutoffNow)
    println("JANITOR_RACE=" + dropped.size + " dropped, reader sees " +
      planned.count() + " rows (no FileNotFound)")
    engine.close()
    migrated.close()
    spark.stop()
  }
}
