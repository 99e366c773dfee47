package graft.operators

import graft.SparkSuite

/** Shuffle-free parquet compaction: content preserved, file count cut. */
class CompactionSpec extends SparkSuite {

  private def canon(dir: String): Seq[String] =
    spark.read.parquet(dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("compactTo merges many small files into few, byte-identical content") {
    import spark.implicits._
    val src = tempDir("compact-src")
    val dst = tempDir("compact-dst")
    (1L to 5000L).map(i => (i, s"payload$i"))
      .toDF("id", "s").repartition(64) // 64 tiny files
      .write.mode("overwrite").parquet(src)
    val before = canon(src)
    val (nBefore, nAfter) = Compaction.compactTo(spark, src, dst, targetBytes = 1L << 20)
    assert(nBefore == 64)
    assert(nAfter < 8, s"expected few output files, got $nAfter")
    assert(canon(dst) == before)
  }

  test("compactInPlace swaps the directory; readers see identical rows") {
    import spark.implicits._
    val dir = tempDir("compact-inplace")
    (1L to 2000L).map(i => (i, i % 7)).toDF("id", "tag")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val before = canon(dir)
    val (nBefore, nAfter) = Compaction.compactInPlace(spark, dir, targetBytes = 1L << 20)
    assert(nBefore == 32 && nAfter < nBefore)
    assert(canon(dir) == before)
    // the staging dir must be gone after the swap
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_tmp")))
  }
}
