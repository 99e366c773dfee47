package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Ingest-robustness bars for the corpus-table read path — the failure
  * modes a 100 TB lake actually has: shards written before a schema
  * change, and shards a crashed writer left truncated. Neither may crash
  * a full-corpus scan; both must be handleable with explicit, auditable
  * semantics (evolved columns null-fill, corrupt shards are countable and
  * skippable by configuration, never silently half-read). */
class RobustnessSpec extends SparkSuite {

  test("schema evolution: old shards null-fill new columns under mergeSchema") {
    import spark.implicits._
    val dir = tempDir("evolve")
    // generation 1: (doc_id, text); generation 2 adds quality_ppm
    Seq((1L, "old shard doc")).toDF("doc_id", "text")
      .write.parquet(s"$dir/g1")
    Seq((2L, "new shard doc", 750000L)).toDF("doc_id", "text", "quality_ppm")
      .write.parquet(s"$dir/g2")

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/g1", s"$dir/g2")
    assert(merged.columns.toSet == Set("doc_id", "text", "quality_ppm"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality_ppm")),
      "old shard must null-fill the evolved column")
    assert(rows(1).getAs[Long]("quality_ppm") == 750000L)
    // and the usual analytics degrade gracefully over the union
    assert(merged.filter(col("quality_ppm").isNull).count() == 1)
  }

  test("schema evolution: WITHOUT mergeSchema the read pins one shard's schema (the footgun, stated)") {
    import spark.implicits._
    val dir = tempDir("evolve-pin")
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/g1")
    Seq((2L, "b", 1L)).toDF("doc_id", "text", "extra").write.parquet(s"$dir/g2")
    val cols = spark.read.parquet(s"$dir/g1", s"$dir/g2").columns.toSet
    // whichever footer wins, the union schema is NOT guaranteed — the
    // mergeSchema test above is the supported path; this pin documents why
    assert(cols.contains("doc_id") && cols.contains("text"))
  }

  test("corrupt shard: scan fails loudly by default, skips countably with ignoreCorruptFiles") {
    import spark.implicits._
    val dir = tempDir("corrupt")
    Seq((1L, "good one"), (2L, "good two")).toDF("doc_id", "text")
      .repartition(1).write.parquet(s"$dir/data")
    // a crashed writer's torn shard: valid magic prefix, truncated body
    val good = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/data"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(good)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/data/part-torn.parquet"),
      bytes.take(bytes.length / 3))

    val strict = intercept[Exception] {
      spark.read.parquet(s"$dir/data").count()
    }
    assert(strict != null, "default read must fail loudly on a torn shard")

    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val rows = spark.read.parquet(s"$dir/data")
      assert(rows.count() == 2L,
        "ignoreCorruptFiles must keep every intact shard's rows")
      assert(rows.select(sum("doc_id")).collect()(0).getLong(0) == 3L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("partition-pruned corpus layout: source=... directories prune at plan time") {
    import spark.implicits._
    val dir = s"${tempDir("parts")}/t"
    Seq((1L, "a", "web"), (2L, "b", "web"), (3L, "c", "books"))
      .toDF("doc_id", "text", "source")
      .write.partitionBy("source").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("source") === "web")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("source"), s"expected a partition filter in:\n$scan")
    assert(q.count() == 2)
    // files actually read: only the web directory's
    val read = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(read.forall(_.contains("source=web")), read.mkString(","))
  }
}
