package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Parquet small-file compaction — the table-side twin of
 * [[graft.engine.FloEngine.compactSmall]] (which folds the flo log's
 * small tail segments).
 *
 * Streaming sinks, frequent small batch appends, and over-parallel
 * writers all leave a table as thousands of KB-scale files; at 100 TB
 * that is the classic small-files problem (every scan pays per-file open
 * + footer read + task schedule, and the driver pays listing). Compaction
 * rewrites the directory into ~`targetBytes` files via `coalesce` — a
 * shuffle-FREE merge (tasks read several input files each and write one),
 * so the cost is one linear copy of the data, no exchange. Use
 * [[ZOrderLayout.writeClustered]] instead when the rewrite should also
 * fix the sort layout; plain compaction preserves only content, not
 * order.
 *
 * `compactInPlace` stages to `<dir>.__compact_tmp` and swaps via rename —
 * the swap window is not atomic on a plain filesystem; run it under the
 * same single-writer discipline any table rewrite needs.
 */
object Compaction {

  /** Rewrite `srcDir`'s parquet into `dstDir` at ~`targetBytes`/file.
    * Returns (filesBefore, filesAfter). */
  def compactTo(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val df = spark.read.parquet(srcDir)
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // size from the scan's own leaf files (recursive — a dir-partitioned
    // table's files live in subdirectories a flat listing would miss).
    // NOTE the rewrite flattens `col=` partition dirs into plain columns;
    // re-partition a partitioned table with its own writer instead.
    val leafFiles = df.inputFiles
    val totalBytes = leafFiles.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.coalesce(nOut).write.mode("overwrite").parquet(dstDir)
    val after = fs.listStatus(new Path(dstDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (leafFiles.length, after)
  }

  /** Compact `dir` in place (stage + swap). Returns (before, after). */
  def compactInPlace(
      spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    val tmp = dir.stripSuffix("/") + ".__compact_tmp"
    val counts = compactTo(spark, dir, tmp, targetBytes)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.rename(new Path(tmp), new Path(dir))
    counts
  }
}
