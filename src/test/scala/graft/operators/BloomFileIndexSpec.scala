package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** File-level Bloom data skipping: exactness and pruning. */
class BloomFileIndexSpec extends SparkSuite {

  private def writeTable(dir: String, nFiles: Int): Unit = {
    import spark.implicits._
    (1L to 8000L).map(i => (i, s"p$i", i % 97))
      .toDF("key", "payload", "tag")
      .repartitionByRange(nFiles, col("key"))
      .write.mode("overwrite").parquet(dir)
  }

  test("lookup equals the full scan, reads a fraction of the files") {
    val dir = tempDir("bloomidx-data")
    val idx = tempDir("bloomidx-idx")
    writeTable(dir, 16)
    BloomFileIndex.build(spark, dir, "key", idx)
    for (key <- Seq(1L, 4000L, 7999L)) {
      val got = BloomFileIndex.lookup(spark, dir, "key", idx, key)
      val want = spark.read.parquet(dir).filter(col("key") === key)
      assert(got.collect().toSeq == want.collect().toSeq, s"key=$key")
      assert(got.inputFiles.length <= 3,
        s"key=$key read ${got.inputFiles.length} of 16 files")
    }
    // absent key: no false negatives possible, result is empty
    assert(BloomFileIndex.lookup(spark, dir, "key", idx, 999999L).count() == 0)
  }

  test("a file split across read partitions still gets one lossless filter") {
    val dir = tempDir("bloomidx-split")
    val idx = tempDir("bloomidx-splitidx")
    writeTable(dir, 2) // 2 large-ish files
    val before = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      // force each file to span many read partitions during the build
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      BloomFileIndex.build(spark, dir, "key", idx)
    } finally {
      before.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    }
    // every key must still be found (merge missed nothing)
    for (key <- Seq(1L, 2000L, 4001L, 8000L)) {
      assert(BloomFileIndex.lookup(spark, dir, "key", idx, key).count() == 1,
        s"key=$key lost by partial-merge")
    }
  }
}
