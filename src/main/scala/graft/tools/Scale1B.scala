package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.FloEngine
import graft.model.VersionVector

/**
 * The decade drive past [[ScaleSmoke]]'s 100M: replay the sf0.1 events
 * table to 1B events through a FloEngine, with the maintenance loop a
 * real deployment would run — periodic `compactSmall` holding the
 * steady-state segment-file profile bounded while produce keeps
 * appending. Measures, at decade marks along the way:
 *
 *  - `status()` (footer stats only) — must stay O(segment files), and
 *    segment files must stay ~flat under maintenance compaction;
 *  - near-head vv consume (newest ~1M rows) — file pruning must keep it
 *    flat in HISTORY size;
 *  - segment file count (the compactSmall steady-state claim);
 *  - sustained produce throughput across thousands of appends.
 *
 * Scale-appropriate knobs, recorded honestly in BASELINE.md: segments
 * rotate at 32 MiB (a 4 MiB segment policy at 1B events would mean 30k
 * files — the small-files antipattern the knob exists to prevent; the
 * O(file-count) admin claims are tested by the file-count curve, not by
 * any fixed file size) and segment parquet is zstd-compressed (the
 * container has 79 GB free; the engine inherits the session codec).
 *
 * {{{ sbt "runMain graft.tools.Scale1B"   # or java -cp ... with the
 *     jdk17 --add-opens set; SPARK_GRAFT_BATCHES=20 for a probe }}}
 */
object Scale1B {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // per-append batch = COPIES replicas of the sf events table
    val copies = sys.env.getOrElse("SPARK_GRAFT_BATCH_COPIES", "5").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "2000").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "100").toInt
    val segMb = sys.env.getOrElse("SPARK_GRAFT_SEG_MB", "32").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "28")
    val root = sys.env.getOrElse("SPARK_GRAFT_ROOT",
      java.nio.file.Files.createTempDirectory("scale-1b").toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE1B $label%-36s $sec%8.2f s")
      (out, sec)
    }

    val numPartitions = 3
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val engine = new FloEngine(spark, root)
      engine.createStream(FloEngine.EventStreamOptions("big",
        numPartitions = numPartitions, segmentMaxSizeBytes = segMb << 20))

      val base = Tables.floEvents(spark, sfDir)
        .select("partition", "namespace", "parent_counter", "parent_partition", "data")
      val reqs = (1 until copies).foldLeft(base)((d, _) => d.unionAll(base))
        .localCheckpoint(true) // freeze the batch: replaying must not re-read parquet per append
      val perBatch = reqs.count()
      val total = perBatch * batches
      println(s"SCALE1B plan: $batches appends x $perBatch rows = $total events, " +
        s"seg ${segMb}MiB zstd, compactSmall every $compactEvery appends")

      def fileCount(): Int = (1 to numPartitions).map { p =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/big/partition=$p"))
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      }.sum
      def dirBytes(): Long =
        fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$root/big")).getLength

      // decade marks: measure the admin/consume profile as history grows
      val marks = Set(batches / 10, batches / 2, batches)
      var produceSec = 0.0
      var compactSec = 0.0
      (1 to batches).foreach { i =>
        val t0 = System.nanoTime()
        engine.produce("big", reqs)
        produceSec += (System.nanoTime() - t0) / 1e9
        if (i % compactEvery == 0) {
          val t1 = System.nanoTime()
          // fold any segment below half the rotation size — appends land
          // as ~(batch/partitions)-sized files, so maintenance keeps the
          // profile at ~full segments regardless of append granularity
          engine.compactSmall("big", minFileBytes = (segMb << 20) / 2)
          compactSec += (System.nanoTime() - t1) / 1e9
        }
        if (marks(i)) {
          val events = perBatch * i
          val files = fileCount()
          val bytes = dirBytes()
          println(f"SCALE1B mark $events%d events: $files%d files, " +
            f"${bytes / 1e9}%.1f GB (${bytes.toDouble / events}%.0f B/event), " +
            f"produce so far $produceSec%.0f s (${events / produceSec}%.0f ev/s), " +
            f"compact so far $compactSec%.0f s")
          val (heads, _) = time(s"status @$events (footer stats)")(engine.status("big"))
          // counters are one global sequence interleaved across partitions,
          // so the stream head is the per-partition MAX
          require(heads.values.max == events, s"head ${heads.values.max} != $events")
          // newest ~1M rows across partitions: flat in history size is THE claim
          val nearHead = VersionVector(heads.map { case (p, h) =>
            p -> math.max(0L, h - 1000000L) })
          val (recent, _) = time(s"consume near-head @$events")(
            engine.consume("big", "/**/*", nearHead).count())
          println(s"SCALE1B   near-head rows: $recent")
          // sustained full-scan consume (glob + order, the Bench band's
          // plan) through the noop SINK — count() short-circuits to the
          // parquet metadata path and reads nothing, so ev/s must come
          // from a real executed scan. The claim this leg pins: scan
          // RATE is flat across the decade (cost scales with data read
          // plus ~1 ms/file planning over the MAINTAINED file count,
          // never with append history).
          val (_, scanSec) = time(s"consume full scan @$events (noop)")(
            engine.consumeAll("big", "/events/p*")
              .write.format("noop").mode("overwrite").save())
          println(f"SCALE1B   full-scan consume: ${events / scanSec}%.0f ev/s")
          // T5 at scale: watermark + tumbling-window aggregation over the
          // STREAMING path from a near-head vv (the tail consumer's
          // windowed agg, embedded_tests.rs:253-291's semantics) with
          // Trigger.AvailableNow. The claim pinned across the decade:
          // wall time tracks the MAINTAINED file count (source listing)
          // plus the fixed ~1M-row tail — never append history.
          val groups = new java.util.concurrent.atomic.AtomicLong
          val (_, winSec) = time(s"windowed agg near-head @$events") {
            val q = engine.consumeWindowed("big", "/events/p*",
                windowDuration = "1 hour", watermarkDelay = "1 minute",
                vv = nearHead)
              .writeStream
              .outputMode("update")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .foreachBatch {
                (b: org.apache.spark.sql.DataFrame, _: Long) =>
                  groups.addAndGet(b.count()); ()
              }
              .start()
            q.awaitTermination()
          }
          println(f"SCALE1B   windowed-agg groups: ${groups.get()}%d in $winSec%.2f s")
        }
      }

      val (all, _) = time("full ordered scan count @1B")(
        engine.consumeAll("big").count())
      require(all == total, s"scan $all != $total")
      val (dropped, _) = time("retention drop (whole files)")(
        engine.expireOldEvents("big",
          new java.sql.Timestamp(System.currentTimeMillis() + 3600 * 1000)))
      println(s"SCALE1B dropped files: ${dropped.size}")
      println("SCALE1B DONE")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      spark.stop()
    }
  }
}
