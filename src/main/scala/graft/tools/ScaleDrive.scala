package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.engine.FloEngine
import graft.model.VersionVector

/**
 * Sustained-ingest scale drive (the 1B-event tier): replays the sf events
 * table `ROUNDS` times through a FloEngine running the STEADY-STATE
 * maintenance loop a deployment actually schedules — periodic
 * `compactSmall` (fold the per-append commits into full segments, mature
 * segments untouched) and a rolling ingest-time retention window
 * (whole-file drops). [[ScaleSmoke]] measures a fully-RETAINED history one
 * order of magnitude at a time (10M in r4, 100M in r5); this tool answers
 * the next question — does the engine HOLD its profile while the
 * cumulative counter passes 1B on a bounded working set? (A retained 1B
 * would be ~120 GB; this host has 80 GB free, and a real deployment at
 * this rate runs retention anyway — flo's whole reason for whole-segment
 * expiry, controller/mod.rs:151-178.)
 *
 * What must stay flat per tick, regardless of how many events EVER flowed:
 *   - produce throughput (counters stay contiguous across eviction);
 *   - `status()` — O(live segment files), cumulative history irrelevant;
 *   - near-head consume — vv seek prunes to the newest files;
 *   - compactSmall — O(small-file bytes since the last tick).
 *
 * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ROUNDS=10000 \
 *     sbt "runMain graft.tools.ScaleDrive" }}}
 */
object ScaleDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "10000").toInt
    val maintEvery = sys.env.getOrElse("SPARK_GRAFT_MAINT_EVERY", "500").toInt
    val retainSec = sys.env.getOrElse("SPARK_GRAFT_RETAIN_SEC", "900").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SCALE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      out
    }

    val root = java.nio.file.Files.createTempDirectory("scale-drive").toString
    val numPartitions = 3
    try {
      val engine = new FloEngine(spark, root)
      engine.createStream(FloEngine.EventStreamOptions("big",
        numPartitions = numPartitions, segmentMaxSizeBytes = 4L << 20))

      val reqs = Tables.floEvents(spark, sfDir)
        .select("partition", "namespace", "parent_counter", "parent_partition", "data")
      val perRound = reqs.count()
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def liveFiles(): Int = (1 to numPartitions).map { p =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/big/partition=$p"))
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      }.sum
      def liveBytes(): Long = (1 to numPartitions).map { p =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/big/partition=$p"))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getLen).sum
      }.sum

      val t0 = System.nanoTime()
      var produceSec = 0.0
      var maintSec = 0.0
      var windowT0 = System.nanoTime()
      (1 to rounds).foreach { r =>
        val p0 = System.nanoTime()
        engine.produce("big", reqs)
        produceSec += (System.nanoTime() - p0) / 1e9

        if (r % maintEvery == 0) {
          val m0 = System.nanoTime()
          val folded = engine.compactSmall("big", minFileBytes = 1L << 20)
          val dropped = engine.expireOldEvents("big",
            new java.sql.Timestamp(System.currentTimeMillis() - retainSec * 1000L))
          val mSec = (System.nanoTime() - m0) / 1e9
          maintSec += mSec
          val windowSec = (System.nanoTime() - windowT0) / 1e9
          windowT0 = System.nanoTime()
          println(f"SCALE tick r=$r%6d  window ${maintEvery * perRound / windowSec}%8.0f ev/s" +
            f"  maint $mSec%6.1f s (folded ${folded.values.sum}%d, dropped ${dropped.size}%d)" +
            f"  live files ${liveFiles()}%d  live ${liveBytes() / (1L << 30)}%d GiB")
        }
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      val total = perRound * rounds
      println(f"SCALE produce $total%d events   wall $wallSec%8.1f s" +
        f"  produce-only $produceSec%8.1f s (${total / produceSec}%.0f ev/s)" +
        f"  maint $maintSec%7.1f s (${100 * maintSec / wallSec}%.1f%%)")
      println(s"SCALE live segment files: ${liveFiles()} (${liveBytes() / (1L << 30)} GiB retained)")

      // counters stay contiguous through eviction: head == everything ever
      // produced even though only the window's files remain
      val heads = time("status (footer stats only)")(engine.status("big"))
      require(heads.values.max == total,
        s"head ${heads.values.max} != $total — counters must stay contiguous through eviction")

      // newest ~1M rows via vv seek — file pruning, not history size,
      // decides the cost (same measurement as the r5 100M row)
      val seekBack = 1000000L / numPartitions
      val nearHead = VersionVector(heads.map { case (p, h) => p -> (h - seekBack) })
      val recent = time("consume near-head (vv seek)")(
        engine.consume("big", "/**/*", nearHead).count())
      println(s"SCALE   near-head rows: $recent")

      val live = time("consume full window scan")(engine.consumeAll("big").count())
      println(s"SCALE   retained-window rows: $live")

      val folded = time("final compactSmall")(engine.compactSmall("big"))
      println(s"SCALE   final fold: ${folded.values.sum} small files")
      val recent2 = time("consume near-head after fold")(
        engine.consume("big", "/**/*", nearHead).count())
      require(recent2 == recent, s"compactSmall changed results: $recent2 != $recent")
    } finally {
      fsDelete(spark, root)
      spark.stop()
    }
  }

  private def fsDelete(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
