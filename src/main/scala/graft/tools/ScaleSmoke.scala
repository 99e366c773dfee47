package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.FloEngine
import graft.model.VersionVector

/**
 * Engine scale drive: replays the sf events table N times (default 10 →
 * ~1M events at sf0.1) through a FloEngine with small segments, then
 * measures the admin/consume paths whose cost profile matters at scale:
 *
 *  - produce throughput across many batches (counters stay contiguous);
 *  - `status()` on a many-hundreds-of-files stream (footer stats only —
 *    distributed read path past 64 files);
 *  - near-head vv consume (file pruning must keep it fast regardless of
 *    history size);
 *  - full ordered scan;
 *  - compaction + the same consume after (stats-tight pruning);
 *  - whole-file retention drop.
 *
 * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleSmoke" }}}
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "10").toInt
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

    val root = java.nio.file.Files.createTempDirectory("scale-smoke").toString
    val numPartitions = 3
    try {
    val engine = new FloEngine(spark, root)
    // ~4 MiB segments so 1M events rotate into dozens of files
    engine.createStream(FloEngine.EventStreamOptions("big", numPartitions = numPartitions,
      segmentMaxSizeBytes = 4L << 20))

    val reqs = Tables.floEvents(spark, sfDir)
      .select("partition", "namespace", "parent_counter", "parent_partition", "data")
    val perRound = reqs.count()

    // produce commits eagerly (the parquet write happens inside produce);
    // forcing the returned ack frame would re-scan the produced range and
    // skew the throughput number
    val t0 = System.nanoTime()
    (1 to rounds).foreach(_ => engine.produce("big", reqs))
    val prodSec = (System.nanoTime() - t0) / 1e9
    val total = perRound * rounds
    println(f"SCALE produce $total%d events            $prodSec%8.2f s  (${total / prodSec}%.0f ev/s)")

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nFiles = (1 to numPartitions).map { p =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/big/partition=$p"))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }.sum
    println(s"SCALE segment files: $nFiles (rotation at 4 MiB)")

    val heads = time("status (footer stats only)")(engine.status("big"))
    require(heads.values.max == total, s"head ${heads.values.max} != $total")

    // consume only the newest ~1% (all namespaces) — file pruning must
    // make this near-free regardless of history size
    val nearHead = VersionVector(heads.map { case (p, h) => p -> (h - total / 100) })
    val recent = time("consume near-head (vv seek)")(
      engine.consume("big", "/**/*", nearHead).count())
    println(s"SCALE   near-head rows: $recent")

    val all = time("consume full ordered scan")(
      engine.consumeAll("big").count())
    require(all == total, s"scan $all != $total")

    time("compact to 4 files/partition")(engine.compact("big", filesPerPartition = 4))
    val recent2 = time("consume near-head after compact")(
      engine.consume("big", "/**/*", nearHead).count())
    require(recent2 == recent, s"compact changed results: $recent2 != $recent")

    val dropped = time("retention drop (whole files)")(
      engine.expireOldEvents("big",
        new java.sql.Timestamp(System.currentTimeMillis() + 3600 * 1000)))
    println(s"SCALE   dropped files: ${dropped.size}")
    require(engine.consumeAll("big").count() == 0)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      spark.stop()
    }
  }
}
