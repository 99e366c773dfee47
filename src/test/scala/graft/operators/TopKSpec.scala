package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The bounded-heap top-k aggregate (`graft_topk` / `TopK.topKPerKey`)
  * against the row_number window recipe it replaces at scale. */
class TopKSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def windowTopK(df: DataFrame, key: String, k: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("score").desc, col("id"))
    df.select(col(key), col("id"), col("score"), col("tag"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
      .select(key, "id", "score", "tag", "rn")
  }

  test("matches the window recipe on randomized groups (ties, negatives, strings)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // scores drawn from a tiny range so equal-score ties at the k boundary
    // are common — the id tiebreak must resolve them identically
    val rows = (1 to 500).map { i =>
      ("g" + rnd.nextInt(9), i.toLong, (rnd.nextInt(11) - 5).toDouble, "t" + rnd.nextInt(3))
    }
    val df = rows.toDF("key", "id", "score", "tag").repartition(4)
    val viaAgg = TopK.topKPerKey(df, Seq("key"),
      struct(col("score"), -col("id")), Seq("id", "score", "tag"), 5)
      .select("key", "id", "score", "tag", "rn")
    val viaWindow = windowTopK(df, "key", 5)
    assert(canon(viaAgg) == canon(viaWindow))
  }

  test("k larger than every group returns whole groups, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2.0, "x"), ("a", 2L, 1.0, "y"), ("b", 3L, 9.0, "z"))
      .toDF("key", "id", "score", "tag")
    val got = TopK.topKPerKey(df, Seq("key"),
      struct(col("score"), -col("id")), Seq("id", "score", "tag"), 100)
    assert(got.count() == 3)
    assert(canon(got.select("key", "id", "score", "tag", "rn")) ==
      canon(windowTopK(df, "key", 100)))
  }

  test("null sort keys are dropped; all-null group vanishes") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(2.0), "x"), ("a", 2L, None, "y"), ("b", 3L, None, "z"))
      .toDF("key", "id", "score", "tag")
    // null score => null struct FIELD, but the struct itself is non-null —
    // so sort on the bare score column to exercise the null-drop path
    val got = TopK.topKPerKey(df, Seq("key"), col("score"),
      Seq("id", "score", "tag"), 3).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

  test("plan shape: partial+final object hash aggregate, no window, no full sort before shuffle") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g" + i % 5, i.toLong, i * 1.5, "t"))
      .toDF("key", "id", "score", "tag")
    val top = TopK.topKPerKey(df, Seq("key"),
      struct(col("score"), -col("id")), Seq("id", "score"), 3)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, // partial + final
      s"expected two aggregate phases in:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("SQL path: graft_topk callable from spark.sql") {
    import spark.implicits._
    graft.expressions.GraftExtensions.register(spark)
    Seq(("a", 1L, 5.0), ("a", 2L, 7.0), ("a", 3L, 6.0))
      .toDF("key", "id", "score").createOrReplaceTempView("topk_sql")
    val got = spark.sql(
      """SELECT key, graft_topk(struct(score, -id), id, 2) AS top
        |FROM topk_sql GROUP BY key""".stripMargin).collect()
    assert(got.head.getSeq[Long](1).toSeq == Seq(2L, 3L))
  }

  test("non-literal or non-positive k is rejected") {
    import spark.implicits._
    graft.expressions.GraftExtensions.register(spark)
    val df = Seq(("a", 1L)).toDF("key", "id")
    df.createOrReplaceTempView("topk_badk")
    assertThrows[Exception] {
      spark.sql("SELECT graft_topk(id, id, id) FROM topk_badk GROUP BY key").collect()
    }
    assertThrows[Exception] {
      spark.sql("SELECT graft_topk(id, id, 0) FROM topk_badk GROUP BY key").collect()
    }
  }
}
