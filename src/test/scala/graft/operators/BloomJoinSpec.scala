package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.GraftExtensions

/** The Bloom-prefiltered join against the plain join it must match. */
class BloomJoinSpec extends SparkSuite {

  test("prefiltered join is bit-identical to the plain join (false positives removed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val fact = (1 to 5000).map(i => (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100)))
      .toDF("row_id", "key", "payload").repartition(7)
    // selective dim: 3% of the fact's key space
    val dim = (1 to 1000).filter(_ % 33 == 0).map(k => (k.toLong, s"dim$k"))
      .toDF("dkey", "dval").repartition(2)
    // tiny filter + aggressive fpp so false positives actually occur and
    // the join must be the one removing them
    val got = BloomJoin.prefilteredJoin(fact, "key", dim, "dkey", fpp = 0.3)
      .select("row_id", "key", "payload", "dkey", "dval")
    val plain = fact.join(dim, col("key") === col("dkey"))
      .select("row_id", "key", "payload", "dkey", "dval")
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(got) == canon(plain))
    assert(plain.count() > 0)
  }

  test("the probe prunes the fact before the join: no false negatives, real reduction") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val fact = (1L to 20000L).toDF("key")
    val dim = (1L to 20000L).filter(_ % 100 == 0).toDF("dkey")
    val bloom = dim.stat.bloomFilter("dkey", 200, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val surviving = fact
      .filter(call_function("graft_bloom_contains", col("key"), lit(bos.toByteArray)))
      .as[Long].collect().toSet
    val trueKeys = (1L to 20000L).filter(_ % 100 == 0).toSet
    assert(trueKeys.subsetOf(surviving), "bloom dropped a true match")
    // at fpp=0.01 the 19800 non-members should shrink to ~200+1% noise
    assert(surviving.size < 1200, s"filter barely pruned: ${surviving.size} rows survive")
  }

  test("Spark's injected runtime bloom filter is the built-in twin (SPARK-32268)") {
    import spark.implicits._
    // parquet-backed so the optimizer sees scan sizes
    val factDir = tempDir("rtbloom-fact")
    val dimDir = tempDir("rtbloom-dim")
    (1L to 20000L).map(i => (i % 1000, i)).toDF("fk", "payload")
      .write.mode("overwrite").parquet(factDir)
    (1L to 1000L).map(i => (i, s"d$i")).toDF("dk", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local test tables are far below the 10 GB application-side default
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter(col("tag") === "d7")
      val joined = fact.join(dim, col("fk") === col("dk"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"runtime filter did not inject:\n$plan")
      assert(joined.count() == 20) // 20000/1000 occurrences of the one key
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("probe runs below the join in the executed plan (null keys drop, like inner join)") {
    import spark.implicits._
    // parquet-backed fact: over a LocalRelation the probe predicate is
    // folded away at optimize time (pushed through any repartition, then
    // ConvertToLocalRelation evaluates it); over a file scan it stays in
    // the plan, which is the real-world shape anyway
    val dir = tempDir("bloomjoin")
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("row_id", "key").write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq((10L, "a"), (40L, "b")).toDF("dkey", "dval")
    val joined = BloomJoin.prefilteredJoin(fact, "key", dim, "dkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)
    assert(joined.select("row_id").as[Long].collect().toSeq == Seq(1L))
  }
}
