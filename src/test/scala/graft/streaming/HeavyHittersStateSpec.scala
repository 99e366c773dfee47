package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming Misra–Gries frequent items: watermark finality, the
  * approximation guarantee under counter pressure, and the exact regime. */
class HeavyHittersStateSpec extends SparkSuite {

  private val Win = 100000L // 100 s windows

  test("offer: exact under budget, decrement-all over it, heavy survivor") {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    Seq("a", "a", "a", "b").foreach(HeavyHittersState.offer(m, _, 2))
    assert(m == Map("a" -> 3L, "b" -> 1L))
    // "c" over budget: decrements all, evicts b
    HeavyHittersState.offer(m, "c", 2)
    assert(m == Map("a" -> 2L))
  }

  test("emits only at window finality; exact counts when k covers the items") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("item", "ms")
      .select(col("item"), timestamp_millis(col("ms")).as("ts"))
    val q = HeavyHittersState.frequentItems(df, "item", Win, k = 64)
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode("append").start()
    try {
      input.addData(("x", 1000L), ("y", 2000L), ("x", 3000L), ("x", 50000L))
      q.processAllAvailable()
      assert(spark.table("hh_exact").isEmpty,
        "no emission while the window can still receive events")
      input.addData(("z", 250000L)) // watermark past window-0 end
      q.processAllAvailable()
      val got = spark.table("hh_exact")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((0L, "x", 3L), (0L, "y", 1L)))
    } finally q.stop()
  }

  test("small-k regime keeps the MG guarantee across batches and shards") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(41)
    // one heavy item drowned in near-unique noise, delivered over 3 batches
    val items = rnd.shuffle(
      Seq.fill(300)("hot") ++ (1 to 600).map(i => "n" + rnd.nextInt(400)))
    val k = 16
    val shards = 4
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("item", "ms")
      .select(col("item"), timestamp_millis(col("ms")).as("ts"))
    // 1 minute allowance: batches 2-3 reuse ts=10 s, and an event whose ts
    // EQUALS the watermark is late-dropped — with 0 delay the first batch
    // would advance the watermark to 10 s and silently drop the rest
    val q = HeavyHittersState.frequentItems(df, "item", Win, k = k,
        shards = shards, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("hh_approx")
      .outputMode("append").start()
    try {
      items.grouped(300).foreach { chunk =>
        input.addData(chunk.map(i => (i, 10000L)): _*)
        q.processAllAvailable()
      }
      input.addData(("z", 250000L))
      q.processAllAvailable()
      val got = spark.table("hh_approx").filter(col("window_start_ms") === 0)
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      // per-shard guarantee: "hot" routes to one shard whose traffic is at
      // most the full stream; 300 > 900/(16+1), so it must survive
      assert(got.contains("hot"), s"hot lost; got ${got.keys.toSeq.sorted}")
      assert(got("hot") <= 300L, "count_lb must lower-bound the truth")
      assert(300L - got("hot") <= items.size.toLong / (k + 1),
        s"error ${300L - got("hot")} beyond the MG bound")
      // state was capped: at most k survivors per shard
      assert(got.size <= k * shards)
    } finally q.stop()
  }
}
