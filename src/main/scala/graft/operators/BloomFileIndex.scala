package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.util.sketch.BloomFilter

/**
 * File-level Bloom data skipping for parquet tables — a persisted
 * secondary index over a high-cardinality column (integral or string).
 *
 * Parquet min/max stats prune files only when the layout correlates with
 * the predicate column ([[ZOrderLayout]] manufactures that correlation
 * for up to two range keys). A POINT lookup on an uncorrelated key — the
 * "find this doc_id / join key / namespace in 100 TB" query — reads every
 * file, because every envelope straddles every value. A per-file Bloom
 * filter at ~10 bits/key answers "could this file contain v?" with no
 * false negatives, so the lookup plans over only the files whose filter
 * fires: the scan shrinks from O(table) to O(matching files + fpp).
 *
 * Index layout: one parquet of (file, n_rows, bloom) rows; tiny
 * (kilobytes per data file), read driver-side at lookup time. The build
 * is one distributed scan: per-partition Bloom partials keyed by
 * `input_file_name`, merged per file (BloomFilter union is lossless, the
 * same bit array ORed). Files are ADDRESSED, not assumed 1:1 with
 * partitions, so a file split across read partitions still gets exactly
 * one merged filter.
 *
 * Append safety: files NOT present in the index (written after the last
 * build) are always scanned — the index can only remove files it has
 * actually summarized, so a stale index degrades to a slower lookup,
 * never a wrong one. Rebuild to regain pruning on the appended tail.
 *
 * Flo context: this is the generalization of the engine's counter
 * seek — the reference seeks segments by per-partition counter ranges
 * (reference flo/src/event_store/index.rs); the Bloom index gives the
 * same touch-only-relevant-segments behavior for UNORDERED keys, where
 * range stats can't help. [[graft.engine.FloEngine.indexNamespaces]]
 * applies it to the log's namespace column.
 */
object BloomFileIndex {

  /** Build (or rebuild) the index for `tableDir` on `column`. */
  def build(
      spark: SparkSession,
      tableDir: String,
      column: String,
      indexDir: String,
      fpp: Double = 0.01): Unit =
    buildFrom(spark.read.parquet(tableDir), column, indexDir, fpp)

  /** Build from an existing scan (callers with their own reader options —
    * e.g. the flo engine's janitor-racing reads — pass it here). */
  def buildFrom(
      df: DataFrame,
      column: String,
      indexDir: String,
      fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val asString = df.schema(column).dataType == StringType
    val rows = df.select(input_file_name().as("file"),
      (if (asString) col(column).cast("string") else col(column).cast("long")).as("v"))
    // per-file row counts size each filter (files are bounded in number;
    // the counts map is index-sized, fine to hold on the driver)
    val counts = rows.groupBy("file").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // counts also rides into the closure below: keep it index-sized
    def partialsOf[T](ds: org.apache.spark.sql.Dataset[(String, T)])(
        put: (BloomFilter, T) => Unit): Array[(String, Array[Byte])] =
      ds.mapPartitions { it =>
        val blooms = scala.collection.mutable.HashMap.empty[String, BloomFilter]
        it.foreach { case (f, v) =>
          if (v != null) {
            // a file appended between the sizing pass and this scan has no
            // count — size it generously rather than fail the build (the
            // filter is then looser than ideal, never wrong)
            val bf = blooms.getOrElseUpdate(f,
              BloomFilter.create(math.max(counts.getOrElse(f, 1L << 20), 1L), fpp))
            put(bf, v)
          }
        }
        blooms.iterator.map { case (f, bf) => (f, serialize(bf)) }
      }.collect()
    val partials =
      if (asString) partialsOf(rows.as[(String, String)])(_.putString(_))
      else partialsOf(rows.as[(String, java.lang.Long)])((bf, v) => bf.putLong(v))
    val merged = partials.groupBy(_._1).map { case (f, parts) =>
      val bf = read(parts.head._2)
      parts.tail.foreach(p => bf.mergeInPlace(read(p._2)))
      (f, counts(f), serialize(bf))
    }.toSeq
    merged.toDF("file", "n_rows", "bloom")
      .repartition(1)
      .write.mode("overwrite").parquet(indexDir)
  }

  /**
   * Point-lookup scan: plan over the files whose Bloom filter might
   * contain `value` (a Long or String matching the indexed column's
   * type) PLUS any file the index has never seen — no false negatives,
   * even against appends since the last build. The equality filter is
   * still applied for fpp hits. Reads with `basePath` so directory
   * partition columns survive the explicit file list.
   */
  def lookup(
      spark: SparkSession,
      tableDir: String,
      column: String,
      indexDir: String,
      value: Any): DataFrame = {
    import spark.implicits._
    val idx = spark.read.parquet(indexDir)
      .select("file", "bloom").as[(String, Array[Byte])].collect()
    val hits = idx.collect {
      case (f, b) if mightContain(read(b), value) => f
    }
    val schemaSource = spark.read.parquet(tableDir)
    val unindexed = schemaSource.inputFiles.toSet -- idx.map(_._1)
    val files = (hits ++ unindexed).toIndexedSeq
    val scanned =
      if (files.isEmpty) schemaSource.limit(0)
      else spark.read.option("basePath", tableDir)
        .option("ignoreMissingFiles", "true").parquet(files: _*)
    scanned.filter(col(column) === lit(value))
  }

  private def mightContain(bf: BloomFilter, value: Any): Boolean = value match {
    case s: String => bf.mightContainString(s)
    case n: Number => bf.mightContainLong(n.longValue())
    case other => throw new IllegalArgumentException(
      s"BloomFileIndex.lookup: unsupported key ${other.getClass}")
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
