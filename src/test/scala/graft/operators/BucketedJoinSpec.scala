package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Bucketed co-located joins — the storage-level answer to the join
 * shuffle: two tables bucketed by the same key into the same bucket
 * count hash-place matching keys in matching buckets at WRITE time, so
 * the join plans with zero Exchange on either side. At 100 TB this is
 * the difference between shuffling both fact tables on every join and
 * paying the partitioning once at ingest — the same trade the flo log
 * makes by laying events out by `partition=` at produce time.
 */
class BucketedJoinSpec extends SparkSuite {

  test("same-bucket join plans with no shuffle on either side") {
    import spark.implicits._
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("key", "av")
    val b = (1L to 2000L).filter(_ % 3 == 0).map(i => (i, s"b$i")).toDF("key", "bv")
    spark.sql("DROP TABLE IF EXISTS bj_a")
    spark.sql("DROP TABLE IF EXISTS bj_b")
    a.write.bucketBy(8, "key").sortBy("key").saveAsTable("bj_a")
    b.write.bucketBy(8, "key").sortBy("key").saveAsTable("bj_b")
    try {
      // force the join to actually use the bucket layout: at test sizes
      // AQE would otherwise broadcast (which also skips the shuffle, but
      // proves nothing about bucketing)
      val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bj_a").join(spark.table("bj_b"), "key")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        assert(joined.count() == 666)
        // and the result matches the plain (shuffling) join
        val plain = a.join(b, "key")
        assert(joined.select("key", "av", "bv").collect().map(_.toString).sorted.toSeq ==
          plain.select("key", "av", "bv").collect().map(_.toString).sorted.toSeq)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
    }
  }

  test("mismatched bucket counts fall back to a shuffle on one side only") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bj_c")
    spark.sql("DROP TABLE IF EXISTS bj_d")
    (1L to 500L).map(i => (i, i * 2)).toDF("key", "cv")
      .write.bucketBy(8, "key").saveAsTable("bj_c")
    (1L to 500L).map(i => (i, i * 3)).toDF("key", "dv")
      .write.bucketBy(4, "key").saveAsTable("bj_d")
    try {
      // disable broadcast so the bucket-vs-bucket path is what plans
      val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bj_c").join(spark.table("bj_d"), "key")
        val plan = joined.queryExecution.executedPlan.toString
        // the coarser table re-buckets; the finer side stays in place
        assert(plan.split("Exchange").length - 1 <= 1,
          s"at most one side may shuffle:\n$plan")
        assert(joined.count() == 500)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_c")
      spark.sql("DROP TABLE IF EXISTS bj_d")
    }
  }
}
