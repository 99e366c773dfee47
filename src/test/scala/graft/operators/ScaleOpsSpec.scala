package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale techniques: salted skew joins and bucketed co-located joins. */
class ScaleOpsSpec extends SparkSuite {

  test("salted join produces identical results to a plain join") {
    import spark.implicits._
    // heavily skewed big side: 90% of rows share key 1
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "payload")
    val small = (0 until 7).map(k => (k, s"dim$k")).toDF("sk", "name")

    val plain = big.join(small, $"k" === $"sk").select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, $"k", $"sk",
      saltBy = Seq($"payload"), salt = 8).select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the salt spreads the hot key over multiple values
    val spread = big.withColumn("__salt", pmod(hash($"payload"), lit(8)))
      .filter($"k" === 1).select("__salt").distinct().count()
    assert(spread == 8, s"hot key only spread over $spread salts")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val s = spark
    import s.implicits._
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.load(s, "/root/testdata/sf0.001", "orders")
      orders.write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      val li = graft.Tables.load(s, "/root/testdata/sf0.001", "lineitem")
      li.write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = s.table("lineitem_b")
        .join(s.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed co-located join: no Exchange feeding the SortMergeJoin
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count())
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
