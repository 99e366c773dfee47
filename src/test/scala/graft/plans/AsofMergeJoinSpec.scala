package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.AsofJoin

/** The native as-of operator (custom LogicalPlan + Strategy + merge-scan
  * SparkPlan) against the declarative union+window recipe: same semantics,
  * different physical plan. */
class AsofMergeJoinSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("semantics: at-or-before, equal-time eligibility, rightOrder tiebreak, no-match nulls") {
    import spark.implicits._
    val readings = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 15L),
      (4L, "b", 10L), (5L, "c", 3L)).toDF("reading_id", "sensor", "t")
    val cals = Seq(
      (100L, "a", 5L, 1.5), (101L, "a", 12L, 2.5),
      (102L, "a", 12L, 3.5), // same instant as 101: higher cal_id must win
      (103L, "b", 11L, 9.9)  // after b's only reading: no match
    ).toDF("cal_id", "sensor", "t", "gain")

    val got = AsofJoin.asofMerge(readings, cals, "t", "t", by = Seq("sensor"),
        valueCols = Seq("cal_id", "gain"), rightOrder = Seq("cal_id"))
      .collect().map(r => r.getAs[Long]("reading_id") ->
        (Option(r.getAs[java.lang.Long]("asof_cal_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_gain")).map(_.toDouble))).toMap

    assert(got(1L) == ((Some(100L), Some(1.5))))
    assert(got(2L) == ((Some(100L), Some(1.5))))
    assert(got(3L) == ((Some(102L), Some(3.5))))
    assert(got(4L) == ((None, None)))
    assert(got(5L) == ((None, None)))
    assert(got.size == 5)
  }

  test("matches the window recipe on randomized input with null times, null keys, duplicate times") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def key(): Option[String] =
      if (rnd.nextInt(10) == 0) None else Some(("k" + rnd.nextInt(7)))
    def time(): Option[Long] =
      if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(40).toLong)
    val left = (1 to 300).map(i => (i.toLong, key(), time()))
      .toDF("lid", "k", "t")
    val right = (1 to 400).map(i => (i.toLong, key(), time(), rnd.nextDouble()))
      .toDF("rid", "k", "t", "v")

    val recipe = AsofJoin.asof(left, right, "t", "t", by = Seq("k"),
      valueCols = Seq("rid", "v"), rightOrder = Seq("rid"))
    val native = AsofJoin.asofMerge(left, right, "t", "t", by = Seq("k"),
      valueCols = Seq("rid", "v"), rightOrder = Seq("rid"))
    assert(native.columns.toSeq == recipe.columns.toSeq)
    assert(canon(native) == canon(recipe))
    assert(native.count() == 300) // every left row survives exactly once
  }

  test("empty sides: no right rows -> all-null matches; no left rows -> empty result") {
    import spark.implicits._
    val left = Seq((1L, "a", 5L)).toDF("lid", "k", "t")
    val right = Seq.empty[(Long, String, Long, Double)].toDF("rid", "k", "t", "v")
    val r1 = AsofJoin.asofMerge(left, right, "t", "t", Seq("k"), Seq("v"))
    assert(r1.count() == 1 && r1.collect().head.isNullAt(3))
    val r2 = AsofJoin.asofMerge(right.select("rid", "k", "t"), left
        .withColumnRenamed("lid", "rid").withColumn("v", lit(1.0)),
      "t", "t", Seq("k"), Seq("v"))
    assert(r2.count() == 0)
  }

  test("plan shape: AsofMergeJoinExec present, no window exec, merge preserves left order claim") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong)).toDF("lid", "k", "t")
    val right = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong, i * 1.0))
      .toDF("rid", "k", "t", "v")
    val df = AsofJoin.asofMerge(left, right, "t", "t", Seq("k"), Seq("v"))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), s"expected the custom exec in:\n$plan")
    assert(!plan.contains("Window"), s"native path must not plan a window:\n$plan")
    // EnsureRequirements honored the declared distribution + ordering:
    // a shuffle and a sort on each side
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan)
  }

  test("self as-of (left and right carved from one table) resolves despite shared lineage") {
    import spark.implicits._
    val ev = (1 to 100).map(i =>
      (i.toLong, "u" + i % 5, i.toLong, if (i % 3 == 0) "p" else "v", i * 0.5))
      .toDF("id", "u", "t", "typ", "value")
    val views = ev.filter($"typ" === "v").select("id", "u", "t")
    val buys = ev.filter($"typ" === "p").select($"u", $"t", $"id", $"value")
    val recipe = AsofJoin.asof(views, buys, "t", "t", Seq("u"), Seq("value"), Seq("id"))
    val native = AsofJoin.asofMerge(views, buys, "t", "t", Seq("u"), Seq("value"), Seq("id"))
    assert(canon(native) == canon(recipe))
  }

  test("optimizer rule prunes unread left columns through the custom node") {
    import spark.implicits._
    val left = (1 to 50).map(i =>
      (i.toLong, "k" + i % 3, i.toLong, "wide_payload_" * 4 + i)) // droppable col
      .toDF("lid", "k", "t", "bulk")
    val right = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong, i * 1.0))
      .toDF("rid", "k", "t", "v")
    val joinedAll = AsofJoin.asofMerge(left, right, "t", "t", Seq("k"), Seq("v"))
    // project away `bulk` AND the join time right above the node
    val slim = joinedAll.select("lid", "k", "asof_v")
    slim.collect()
    val optimized = slim.queryExecution.optimizedPlan
    val node = optimized.collect { case n: AsofMergeJoinNode => n }.head
    val leftCols = node.left.output.map(_.name).toSet
    assert(!leftCols.contains("bulk"),
      s"unread left column must not reach the join: $leftCols")
    assert(leftCols == Set("lid", "k", "t"), // t survives: it is the join time
      s"got $leftCols")
    // results are unchanged by the pruning
    val expected = AsofJoin.asof(left, right, "t", "t", Seq("k"), Seq("v"))
      .select("lid", "k", "asof_v")
    assert(canon(slim) == canon(expected))
  }

  test("value-column prefix collision on the left is rejected") {
    import spark.implicits._
    val left = Seq((1L, "a", 5L, 9.9)).toDF("lid", "k", "t", "asof_v")
    val right = Seq((1L, "a", 4L, 1.0)).toDF("rid", "k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofMerge(left, right, "t", "t", Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
