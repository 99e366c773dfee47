package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * File-level Bloom data skipping for parquet tables — a persisted
 * secondary index over a high-cardinality column.
 *
 * Parquet min/max stats prune files only when the layout correlates with
 * the predicate column ([[ZOrderLayout]] manufactures that correlation
 * for up to two range keys). A POINT lookup on an uncorrelated key — the
 * "find this doc_id / join key / event id in 100 TB" query — reads every
 * file, because every envelope straddles every value. A per-file Bloom
 * filter at ~10 bits/key answers "could this file contain v?" with no
 * false negatives, so the lookup plans over only the files whose filter
 * fires: the scan shrinks from O(table) to O(matching files + fpp).
 *
 * Index layout: one parquet of (file, n_rows, bloom) rows plus the
 * build parameters; tiny (kilobytes per data file), read driver-side at
 * lookup time. The build is one distributed scan: per-partition Bloom
 * partials keyed by `input_file_name`, merged per file (BloomFilter
 * union is lossless, same bit array ORed). Files are ADDRESSED, not
 * assumed 1:1 with partitions, so a file split across read partitions
 * still gets exactly one merged filter.
 *
 * Flo context: this is the generalization of the engine's counter
 * seek — the reference seeks segments by per-partition counter ranges
 * (reference flo/src/event_store/index.rs); the Bloom index gives the
 * same touch-only-relevant-segments behavior for UNORDERED keys, where
 * range stats can't help.
 */
object BloomFileIndex {

  /**
   * Build (or rebuild) the index for `tableDir` on integral `column`,
   * writing to `indexDir`. `fpp` trades index size for extra files read
   * on lookup.
   */
  def build(
      spark: SparkSession,
      tableDir: String,
      column: String,
      indexDir: String,
      fpp: Double = 0.01): Unit = {
    import spark.implicits._
    val df = spark.read.parquet(tableDir)
    val rows = df.select(input_file_name().as("file"), col(column).cast("long").as("v"))
    // per-file row counts size each filter (files are bounded in number;
    // the counts map is index-sized, fine to hold on the driver)
    val counts = rows.groupBy("file").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val partials = rows.as[(String, java.lang.Long)].mapPartitions { it =>
      val blooms = scala.collection.mutable.HashMap.empty[String, BloomFilter]
      it.foreach { case (f, v) =>
        if (v != null) {
          val bf = blooms.getOrElseUpdate(f,
            BloomFilter.create(math.max(counts(f), 1L), fpp))
          bf.putLong(v)
        }
      }
      blooms.iterator.map { case (f, bf) =>
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (f, bos.toByteArray)
      }
    }.collect()
    val merged = partials.groupBy(_._1).map { case (f, parts) =>
      val bf = read(parts.head._2)
      parts.tail.foreach(p => bf.mergeInPlace(read(p._2)))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      (f, counts(f), bos.toByteArray)
    }.toSeq
    merged.toDF("file", "n_rows", "bloom")
      .repartition(1)
      .write.mode("overwrite").parquet(indexDir)
  }

  /**
   * Point-lookup scan: plan over ONLY the files whose Bloom filter might
   * contain `value` (no false negatives — the result is exactly the full
   * scan's), with the equality filter still applied for fpp hits.
   */
  def lookup(
      spark: SparkSession,
      tableDir: String,
      column: String,
      indexDir: String,
      value: Long): DataFrame = {
    import spark.implicits._
    val idx = spark.read.parquet(indexDir)
      .select("file", "bloom").as[(String, Array[Byte])].collect()
    val hits = idx.collect { case (f, b) if read(b).mightContainLong(value) => f }
    val schemaSource = spark.read.parquet(tableDir)
    val scanned =
      if (hits.isEmpty) schemaSource.limit(0)
      else spark.read.schema(schemaSource.schema).parquet(hits.toIndexedSeq: _*)
    scanned.filter(col(column) === value)
  }

  private def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
