package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.Sessionizer.Session

/** Event-time streaming sessionization (custom state + event-time timeout)
  * against the batch gaps-and-islands window it mirrors. */
class SessionizerSpec extends SparkSuite {

  private def startQuery(name: String, gapMs: Long, delay: String = "0 seconds")(
      implicit enc: org.apache.spark.sql.Encoder[(Long, Long)],
      sqlCtx: org.apache.spark.sql.SQLContext) = {
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
    val q = Sessionizer.sessionize(df, gapMs = gapMs, watermarkDelay = delay)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, q)
  }

  test("sessions split intra-batch, close via event-time timeout, and match the batch window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (input, q) = startQuery("sess_out", gapMs = 30000)
    try {
      // u1: two events inside the gap; u2: one event; u3: two events farther
      // apart than the gap in one batch (an intra-batch split)
      input.addData((1L, 1000L), (1L, 2000L), (2L, 5000L), (3L, 1000L), (3L, 60000L))
      q.processAllAvailable()
      val after1 = spark.table("sess_out").as[Session].collect().toSet
      // delay 0 -> the watermark lands at 60000 and finalizes every session
      // whose last+gap it passed (u1, u2, and u3's first)
      assert(after1 == Set(
        Session(3L, 1000L, 1000L, 1L),
        Session(1L, 1000L, 2000L, 2L),
        Session(2L, 5000L, 5000L, 1L)), s"got $after1")

      // a far-future event pushes the watermark past u3's open timeout
      input.addData((9L, 500000L))
      q.processAllAvailable()
      val after2 = spark.table("sess_out").as[Session].collect().toSet
      assert(after2 == after1 + Session(3L, 60000L, 60000L, 1L), s"got $after2")

      // batch twin on the SAME closed data: identical sessions (u9 still open)
      val batch = Seq((1L, 1000L), (1L, 2000L), (2L, 5000L), (3L, 1000L),
        (3L, 60000L)).toDF("user_id", "ms")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms")
      val marked = batch.select(col("user_id"), col("ms"),
        when(lag("ms", 1).over(w).isNull || col("ms") - lag("ms", 1).over(w) > 30000, 1)
          .otherwise(0).as("is_new"))
      val sess = marked.select(col("user_id"), col("ms"),
        sum("is_new").over(w.rowsBetween(Long.MinValue, 0)).as("sid"))
        .groupBy("user_id", "sid")
        .agg(min("ms").as("session_start_ms"), max("ms").as("session_end_ms"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[Session].collect().toSet
      assert(sess == after2, s"batch window disagrees: $sess vs $after2")
    } finally q.stop()
  }

  test("late events inside the watermark merge into the open session, extending it backwards") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (input, q) = startQuery("sess_late", gapMs = 30000, delay = "1 minute")
    try {
      input.addData((5L, 100000L))
      q.processAllAvailable() // watermark -> 40000
      input.addData((5L, 95000L)) // late but allowed: merges backwards
      q.processAllAvailable()
      input.addData((9L, 1000000L)) // close everything
      q.processAllAvailable()
      val got = spark.table("sess_late").as[Session].collect().toSet
      assert(got.contains(Session(5L, 95000L, 100000L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("a late event BRIDGES two held sessions instead of violating the gap invariant") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // gap 30s, delay 60s: t=0 and t=40000 form two held sessions; the late
    // t=10000 is within the gap of both -> ONE session [0, 40000] n=3,
    // exactly what the batch window computes over {0, 10000, 40000}
    val (input, q) = startQuery("sess_bridge", gapMs = 30000, delay = "1 minute")
    try {
      input.addData((7L, 1000L), (7L, 41000L))
      q.processAllAvailable()
      assert(spark.table("sess_bridge").isEmpty,
        "nothing may emit while a late event could still reshape the sessions")
      input.addData((7L, 11000L))
      q.processAllAvailable()
      input.addData((9L, 1000000L)) // push the watermark, finalize
      q.processAllAvailable()
      val got = spark.table("sess_bridge").as[Session]
        .collect().filter(_.user_id == 7L).toSet
      assert(got == Set(Session(7L, 1000L, 41000L, 3L)), s"got $got")
    } finally q.stop()
  }

  test("open sessions survive a checkpointed restart and close correctly after it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt").toString
    val input = MemoryStream[(Long, Long)]
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[Session]()
    def start() = {
      val df = input.toDF().toDF("user_id", "ms")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
      Sessionizer.sessionize(df, gapMs = 30000, watermarkDelay = "1 minute")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], _: Long) =>
          b.collect().foreach(emitted.add)
        }
        .start()
    }
    val q1 = start()
    try {
      input.addData((1L, 10000L), (1L, 20000L))
      q1.processAllAvailable()
      assert(emitted.isEmpty, "session still open — nothing may emit")
    } finally q1.stop()
    val q2 = start()
    try {
      // an in-gap event after the restart must EXTEND the recovered session
      input.addData((1L, 40000L))
      input.addData((9L, 1000000L)) // push the watermark, finalize
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = emitted.asScala.filter(_.user_id == 1L).toSet
      assert(got == Set(Session(1L, 10000L, 40000L, 3L)), s"got $got")
    } finally q2.stop()
  }

  test("batch mode: the same call sessionizes a static frame completely") {
    import spark.implicits._
    val batch = Seq((1L, 1000L), (1L, 2000L), (1L, 60000L), (2L, 5000L))
      .toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
    val got = Sessionizer.sessionize(batch, gapMs = 30000).collect().toSet
    assert(got == Set(
      Session(1L, 1000L, 2000L, 2L),
      Session(1L, 60000L, 60000L, 1L),
      Session(2L, 5000L, 5000L, 1L)), s"got $got")
  }

  test("rejects a non-positive gap") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
    assertThrows[IllegalArgumentException] {
      Sessionizer.sessionize(df, gapMs = 0)
    }
  }
}
