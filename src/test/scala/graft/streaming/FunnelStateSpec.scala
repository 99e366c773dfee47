package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.FunnelState.Verdict

/** Event-time streaming funnel (tumbling windows + watermark finality)
  * against its batch-degenerate twin. */
class FunnelStateSpec extends SparkSuite {

  private val Win = 100000L // 100 s tumbling windows for the tests

  private def startQuery(name: String, delay: String = "0 seconds")(
      implicit enc: org.apache.spark.sql.Encoder[(Long, Long, String)],
      sqlCtx: org.apache.spark.sql.SQLContext) = {
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_type"))
    val q = FunnelState.funnel(df, windowMs = Win, watermarkDelay = delay)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, q)
  }

  test("greedy anchors: order-insensitive, strictly increasing, step-gated") {
    // click BEFORE the first view must not anchor; the later one does
    val a = FunnelState.anchors(
      Seq((1, 50L), (0, 100L), (1, 200L), (2, 300L)), 3)
    assert(a == Seq(100L, 200L, 300L), a.toString)
    // same set in any arrival order -> same anchors
    val b = FunnelState.anchors(
      Seq((2, 300L), (1, 200L), (1, 50L), (0, 100L)), 3)
    assert(a == b)
    // chain stops at the first missing step even if later steps exist
    assert(FunnelState.anchors(Seq((0, 100L), (2, 300L)), 3) == Seq(100L))
    // simultaneous events do NOT chain (strict >)
    assert(FunnelState.anchors(Seq((0, 100L), (1, 100L)), 3) == Seq(100L))
  }

  test("verdicts emit only at window finality and match the batch twin on a replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 1 min allowance: batch 1's max ts (30 s) keeps the watermark at 0,
    // so batch 2's click at 20 s is in-allowance, not late-dropped
    val (input, q) = startQuery("funnel_out", delay = "1 minute")
    try {
      // u1 completes in window 0 — delivered OUT OF ORDER (purchase first);
      // u2 views only; u3's click precedes its view (completed = 1)
      input.addData((1L, 30000L, "purchase"), (1L, 10000L, "view"),
        (2L, 15000L, "view"), (3L, 5000L, "click"), (3L, 8000L, "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").isEmpty,
        "no verdict may emit while the window can still receive events")
      input.addData((1L, 20000L, "click"))
      q.processAllAvailable()
      // push the watermark past window end (100000 + 10 s delay)
      input.addData((9L, 300000L, "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_out").as[Verdict].collect()
        .filter(_.user_id != 9L).toSet
      assert(got == Set(
        Verdict(1L, 0L, 3, Seq(10000L, 20000L, 30000L)),
        Verdict(2L, 0L, 1, Seq(15000L)),
        Verdict(3L, 0L, 1, Seq(8000L))), s"got $got")

      // batch twin over the same closed window agrees verdict-for-verdict
      val batch = Seq((1L, 30000L, "purchase"), (1L, 10000L, "view"),
        (2L, 15000L, "view"), (3L, 5000L, "click"), (3L, 8000L, "view"),
        (1L, 20000L, "click"))
        .toDF("user_id", "ms", "event_type")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
          col("event_type"))
      val twin = FunnelState.funnel(batch, windowMs = Win).collect().toSet
      assert(twin == got, s"batch twin disagrees: $twin vs $got")
    } finally q.stop()
  }

  test("a late-but-allowed earlier view re-anchors the whole chain before finality") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (input, q) = startQuery("funnel_late", delay = "2 minutes")
    try {
      input.addData((5L, 50000L, "view"), (5L, 60000L, "click"))
      q.processAllAvailable()
      // late view at 10 s (inside the 2 min allowance): first_view moves
      // back, and the SAME click still anchors after it
      input.addData((5L, 10000L, "view"))
      q.processAllAvailable()
      input.addData((9L, 1000000L, "view")) // finalize window 0
      q.processAllAvailable()
      val got = spark.table("funnel_late").as[Verdict].collect()
        .filter(_.user_id == 5L).toSet
      assert(got == Set(Verdict(5L, 0L, 2, Seq(10000L, 60000L))), s"got $got")
    } finally q.stop()
  }

  test("funnel state survives a checkpointed restart: anchors from before the stop still chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt").toString
    val input = MemoryStream[(Long, Long, String)]
    // foreachBatch, not the memory sink — the memory sink refuses to
    // recover from a checkpoint; verdicts land in a shared buffer
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[Verdict]()
    def start() = {
      val df = input.toDF().toDF("user_id", "ms", "event_type")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
          col("event_type"))
      FunnelState.funnel(df, windowMs = Win, watermarkDelay = "1 minute")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Verdict], _: Long) =>
          batch.collect().foreach(emitted.add)
        }
        .start()
    }
    val q1 = start()
    try {
      input.addData((1L, 10000L, "view"), (1L, 20000L, "click"),
        (2L, 15000L, "view"))
      q1.processAllAvailable()
      assert(emitted.isEmpty, "window 0 is not final yet")
    } finally q1.stop()
    // restart from the checkpoint: the held (step, ts) state must recover
    val q2 = start()
    try {
      input.addData((1L, 30000L, "purchase"))
      input.addData((9L, 1000000L, "view")) // finalize window 0
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = emitted.asScala.filter(_.user_id != 9L).toSet
      assert(got == Set(
        Verdict(1L, 0L, 3, Seq(10000L, 20000L, 30000L)),
        Verdict(2L, 0L, 1, Seq(15000L))), s"got $got")
    } finally q2.stop()
  }

  test("events split across windows anchor independently per window") {
    import spark.implicits._
    // view in window 0, click+purchase in window 1: window 0 is a
    // 1-step funnel, window 1 has no view -> no verdict
    val batch = Seq((1L, 90000L, "view"), (1L, 110000L, "click"),
      (1L, 120000L, "purchase"))
      .toDF("user_id", "ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_type"))
    val got = FunnelState.funnel(batch, windowMs = Win).collect().toSet
    assert(got == Set(Verdict(1L, 0L, 1, Seq(90000L))), s"got $got")
  }
}
