package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.RangeJoin

/** The native keyed interval-containment operator (custom LogicalPlan +
  * Strategy + sweep-scan SparkPlan) against the declarative null-safe theta
  * join: same semantics, different physical plan — the native exec keeps
  * O(max concurrent overlap) state instead of planning a cross-ish join. */
class IntervalMergeJoinSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Reference semantics: null-safe key equality (null keys group together,
    * matching window-partitioning semantics), strict [lo, hi) containment
    * (null point/lo/hi match nothing under SQL three-valued logic). */
  private def recipe(
      points: DataFrame, pointCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, by: Seq[String], valueCols: Seq[String],
      prefix: String = "iv_"): DataFrame = {
    val iv = intervals.select(
      by.map(c => intervals(c).as("__r_" + c)) ++
        Seq(intervals(loCol).as("__r_lo"), intervals(hiCol).as("__r_hi")) ++
        valueCols.map(c => intervals(c).as(prefix + c)): _*)
    val cond = by.map(c => points(c) <=> iv("__r_" + c))
      .reduce(_ && _) && points(pointCol) >= iv("__r_lo") &&
      points(pointCol) < iv("__r_hi")
    points.join(iv, cond, "inner")
      .select(points.columns.map(points(_)) ++ valueCols.map(c => iv(prefix + c)): _*)
  }

  test("semantics: [lo,hi) containment, overlap fan-out, inner drop, null point/lo/hi") {
    import spark.implicits._
    val points = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), // 30 == hi: excluded
      (4L, "b", 5L),                                  // no b interval covers 5
      (5L, "c", 7L),                                  // null-hi interval: no match
      (6L, "a", 15L)                                  // inside BOTH a-intervals
    ).toDF("pid", "k", "x")
    val nullPt = Seq(("a", 7L)).toDF("k", "iv")
      .select(lit(7L).as("pid"), col("k"), lit(null).cast("long").as("x"))
    val intervals = Seq(
      (100L, "a", 5L, 30L), (101L, "a", 12L, 22L),
      (102L, "b", 10L, 20L), (104L, "d", 0L, 100L) // d: no points at all
    ).toDF("ivid", "k", "lo", "hi")
    val nullIv = Seq(1).toDF("one").select(lit(103L).as("ivid"),
      lit("c").as("k"), lit(0L).as("lo"), lit(null).cast("long").as("hi"))

    val got = RangeJoin.pointInIntervalMerge(
        points.union(nullPt), "x", intervals.union(nullIv), "lo", "hi",
        by = Seq("k"), valueCols = Seq("ivid"))
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iv_ivid")))
      .sorted.toSeq
    assert(got == Seq((1L, 100L), (2L, 100L), (2L, 101L), (6L, 100L), (6L, 101L)))
  }

  test("left-outer: unmatched and null-point rows survive once with null values") {
    import spark.implicits._
    val points = Seq(
      (1L, "a", 10L),  // matched
      (2L, "a", 99L),  // unmatched: survives with null
      (3L, "z", 5L)    // key with no intervals at all
    ).toDF("pid", "k", "x")
    val nullPt = Seq(1).toDF("one").select(lit(4L).as("pid"), lit("a").as("k"),
      lit(null).cast("long").as("x"))
    val intervals = Seq((100L, "a", 5L, 30L)).toDF("ivid", "k", "lo", "hi")
    val got = RangeJoin.pointInIntervalMerge(points.union(nullPt), "x",
        intervals, "lo", "hi", Seq("k"), Seq("ivid"), joinType = "left_outer")
      .collect().map(r => (r.getAs[Long]("pid"),
        Option(r.getAs[java.lang.Long]("iv_ivid")).map(_.toLong)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, Some(100L)), (2L, None), (3L, None), (4L, None)))
    assert(intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalMerge(points, "x", intervals, "lo", "hi",
        Seq("k"), Seq("ivid"), joinType = "full")
    }.getMessage.contains("joinType"))
  }

  test("left-outer matches the declarative left theta join on randomized input") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def key(): Option[String] =
      if (rnd.nextInt(10) == 0) None else Some("k" + rnd.nextInt(6))
    def num(bound: Int): Option[Long] =
      if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(bound).toLong)
    val points = (1 to 300).map(i => (i.toLong, key(), num(60))).toDF("pid", "k", "x")
    val intervals = (1 to 200).map { i =>
      val lo = num(60)
      (i.toLong, key(), lo, lo.map(_ + rnd.nextInt(15).toLong))
    }.toDF("ivid", "k", "lo", "hi")
    val native = RangeJoin.pointInIntervalMerge(points, "x", intervals,
      "lo", "hi", Seq("k"), Seq("ivid"), joinType = "left_outer")
    val iv = intervals.select(col("k").as("__rk"), col("lo"), col("hi"),
      col("ivid").as("iv_ivid"))
    val expected = points.join(iv,
        col("k") <=> col("__rk") && col("x") >= col("lo") && col("x") < col("hi"),
        "left_outer")
      .select(points.columns.map(col) :+ col("iv_ivid"): _*)
    assert(native.columns.toSeq == expected.columns.toSeq)
    assert(canon(native) == canon(expected))
    // every left row survives at least once
    assert(native.select("pid").distinct().count() == 300)
  }

  test("matches the declarative theta join on randomized input with nulls and duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def key(): Option[String] =
      if (rnd.nextInt(10) == 0) None else Some("k" + rnd.nextInt(6))
    def num(bound: Int): Option[Long] =
      if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(bound).toLong)
    val points = (1 to 400).map(i => (i.toLong, key(), num(60)))
      .toDF("pid", "k", "x")
    val intervals = (1 to 250).map { i =>
      val lo = num(60)
      (i.toLong, key(), lo, lo.map(_ + rnd.nextInt(15).toLong), rnd.nextDouble())
    }.toDF("ivid", "k", "lo", "hi", "w")

    val native = RangeJoin.pointInIntervalMerge(points, "x", intervals,
      "lo", "hi", by = Seq("k"), valueCols = Seq("ivid", "w"))
    val expected = recipe(points, "x", intervals, "lo", "hi",
      Seq("k"), Seq("ivid", "w"))
    assert(native.columns.toSeq == expected.columns.toSeq)
    assert(canon(native) == canon(expected))
  }

  test("plan shape: IntervalMergeJoinExec, shuffles both sides, no nested-loop join") {
    import spark.implicits._
    val points = (1 to 100).map(i => (i.toLong, "k" + i % 5, i.toLong)).toDF("pid", "k", "x")
    val intervals = (1 to 40).map(i => (i.toLong, "k" + i % 5, i.toLong, i.toLong + 10))
      .toDF("ivid", "k", "lo", "hi")
    val df = RangeJoin.pointInIntervalMerge(points, "x", intervals, "lo", "hi",
      Seq("k"), Seq("ivid"))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalMergeJoin"), s"expected the custom exec in:\n$plan")
    assert(!plan.contains("NestedLoop"), s"must not fall back to a nested loop:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan)
  }

  test("sweep state is the active set: maxActiveIntervals metric stays at the overlap bound") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 600 intervals on ONE key (one task carries the data — the metric
      // sums per-task maxima across tasks), but at most 3 ever overlap one
      // point: interval j covers [3j, 3j+9) => any x lies in at most 3
      val intervals = (0 until 600).map(j =>
          (j.toLong, "k", (j * 3).toLong, (j * 3).toLong + 9))
        .toDF("ivid", "k", "lo", "hi")
      val points = (0 until 400).map(i => (i.toLong, "k", (i * 4).toLong))
        .toDF("pid", "k", "x")
      val df = RangeJoin.pointInIntervalMerge(points, "x", intervals, "lo", "hi",
        Seq("k"), Seq("ivid"))
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collectFirst { case e: IntervalMergeJoinExec => e }.get
      val maxActive = exec.metrics("maxActiveIntervals").value
      assert(maxActive > 0 && maxActive <= 3,
        s"state must track overlap (<=3), not interval count (600/key): $maxActive")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("optimizer rule prunes unread left columns through the custom node") {
    import spark.implicits._
    val points = (1 to 50).map(i =>
        (i.toLong, "k" + i % 3, i.toLong, "wide_payload_" * 4 + i))
      .toDF("pid", "k", "x", "bulk")
    val intervals = (1 to 30).map(i => (i.toLong, "k" + i % 3, i.toLong, i.toLong + 5))
      .toDF("ivid", "k", "lo", "hi")
    val joined = RangeJoin.pointInIntervalMerge(points, "x", intervals, "lo", "hi",
      Seq("k"), Seq("ivid"))
    val slim = joined.select("pid", "iv_ivid")
    slim.collect()
    val node = slim.queryExecution.optimizedPlan
      .collect { case n: IntervalMergeJoinNode => n }.head
    val leftCols = node.left.output.map(_.name).toSet
    assert(!leftCols.contains("bulk"), s"unread left column must not reach the join: $leftCols")
    assert(leftCols == Set("pid", "k", "x"), s"got $leftCols") // k, x survive: join inputs
    val expected = recipe(points, "x", intervals, "lo", "hi", Seq("k"), Seq("ivid"))
      .select("pid", "iv_ivid")
    assert(canon(slim) == canon(expected))
  }

  test("self interval join (both sides carved from one table) resolves despite shared lineage") {
    import spark.implicits._
    val ev = (1 to 120).map(i =>
        (i.toLong, "u" + i % 4, i.toLong, if (i % 5 == 0) "w" else "p"))
      .toDF("id", "u", "t", "typ")
    val points = ev.filter($"typ" === "p").select("id", "u", "t")
    val windows = ev.filter($"typ" === "w")
      .select($"id".as("wid"), $"u", $"t".as("lo"), ($"t" + 8L).as("hi"))
    val native = RangeJoin.pointInIntervalMerge(points, "t", windows, "lo", "hi",
      Seq("u"), Seq("wid"))
    val expected = recipe(points, "t", windows, "lo", "hi", Seq("u"), Seq("wid"))
    assert(canon(native) == canon(expected))
  }

  test("overlap join: tie starts once, nesting, touching excluded, empty intervals drop") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 10L, 20L),
      (2L, "a", 30L, 30L), // empty: matches nothing
      (3L, "b", 0L, 100L)  // nests several b intervals
    ).toDF("lid", "k", "llo", "lhi")
    val right = Seq(
      (100L, "a", 10L, 12L),  // tie start with lid=1: exactly one pair
      (101L, "a", 19L, 40L),  // tail overlap with lid=1
      (102L, "a", 20L, 25L),  // touches lid=1 at hi: NO overlap ([10,20) vs [20,25))
      (103L, "b", 40L, 50L),  // nested in lid=3
      (104L, "b", 90L, 200L), // straddles lid=3's hi
      (105L, "b", 7L, 7L)     // empty right: matches nothing
    ).toDF("rid", "k", "rlo", "rhi")
    val got = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
        right, "rlo", "rhi", by = Seq("k"), valueCols = Seq("rid"))
      .collect().map(r => (r.getAs[Long]("lid"), r.getAs[Long]("iv_rid")))
      .sorted.toSeq
    assert(got == Seq((1L, 100L), (1L, 101L), (3L, 103L), (3L, 104L)))
  }

  test("overlap join matches the declarative GREATEST/LEAST theta join on randomized input") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def key(): Option[String] =
      if (rnd.nextInt(10) == 0) None else Some("k" + rnd.nextInt(5))
    def iv(bound: Int): (Option[Long], Option[Long]) = {
      val lo = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(bound).toLong)
      // mix empty (len 0), unit and long intervals
      (lo, lo.map(_ + rnd.nextInt(12).toLong))
    }
    val left = (1 to 250).map { i => val (lo, hi) = iv(50); (i.toLong, key(), lo, hi) }
      .toDF("lid", "k", "llo", "lhi")
    val right = (1 to 250).map { i => val (lo, hi) = iv(50); (i.toLong, key(), lo, hi) }
      .toDF("rid", "k", "rlo", "rhi")

    val native = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
      right, "rlo", "rhi", by = Seq("k"), valueCols = Seq("rid", "rlo"))
    val r = right.select(col("k").as("__rk"), col("rlo"), col("rhi"), col("rid"))
    // strict overlap written as four conjuncts: equivalent to
    // max(lo) < min(hi) for non-empty intervals, and — unlike Spark's
    // greatest()/least(), which IGNORE nulls — three-valued-false on any
    // null endpoint, matching the operator's pinned null semantics
    val expected = left.join(r,
        col("k") <=> col("__rk") &&
          col("llo") < col("lhi") && col("rlo") < col("rhi") &&
          col("llo") < col("rhi") && col("rlo") < col("lhi"))
      .select(left.columns.map(col) ++
        Seq(col("rid").as("iv_rid"), col("rlo").as("iv_rlo")): _*)
    assert(native.columns.toSeq == expected.columns.toSeq)
    val (n, e) = (canon(native), canon(expected))
    if (n != e) {
      val (ns, es) = (n.groupBy(identity).view.mapValues(_.size).toMap,
        e.groupBy(identity).view.mapValues(_.size).toMap)
      val extra = ns.collect { case (k, c) if c > es.getOrElse(k, 0) => k -> (c, es.getOrElse(k, 0)) }
      val miss = es.collect { case (k, c) if c > ns.getOrElse(k, 0) => k -> (ns.getOrElse(k, 0), c) }
      fail(s"native-extra=${extra.take(10)}\nnative-missing=${miss.take(10)}")
    }
  }

  test("streaming points probe a static interval table per micro-batch (batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static per-key calibration windows; a point stream enriches against
    // them — the stream-static shape of the native interval join (each
    // micro-batch is a batch DF inside foreachBatch, so the sweep exec
    // applies unchanged)
    val intervals = (1 to 60).map(i =>
        (i.toLong, "k" + i % 3, (i * 5).toLong, (i * 5 + 12).toLong))
      .toDF("ivid", "k", "lo", "hi").localCheckpoint(true)
    val pts = (1 to 90).map(i => (i.toLong, "k" + i % 3, (i * 3).toLong))
    val expected = RangeJoin.pointInIntervalMerge(
        pts.toDF("pid", "k", "x"), "x", intervals, "lo", "hi",
        Seq("k"), Seq("ivid"))
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iv_ivid"))).toSet

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("pid", "k", "x").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = RangeJoin.pointInIntervalMerge(
            batch.localCheckpoint(true), "x", intervals, "lo", "hi",
            Seq("k"), Seq("ivid"))
          .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iv_ivid")))
        results.synchronized { results ++= got }
        ()
      }.start()
    try {
      input.addData(pts.take(40))
      q.processAllAvailable()
      input.addData(pts.drop(40))
      q.processAllAvailable()
    } finally q.stop()
    assert(results.toSet == expected && results.size == expected.size,
      s"streaming result diverged: ${results.size} vs ${expected.size}")
  }

  test("empty sides and input validation") {
    import spark.implicits._
    val points = Seq((1L, "a", 5L)).toDF("pid", "k", "x")
    val none = Seq.empty[(Long, String, Long, Long)].toDF("ivid", "k", "lo", "hi")
    assert(RangeJoin.pointInIntervalMerge(points, "x", none, "lo", "hi",
      Seq("k"), Seq("ivid")).count() == 0)
    val iv = Seq((1L, "a", 0L, 9L)).toDF("ivid", "k", "lo", "hi")
    assert(RangeJoin.pointInIntervalMerge(points.limit(0), "x", iv, "lo", "hi",
      Seq("k"), Seq("ivid")).count() == 0)

    val collide = points.withColumn("iv_ivid", lit(1))
    assert(intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalMerge(collide, "x", iv, "lo", "hi", Seq("k"), Seq("ivid"))
    }.getMessage.contains("collide"))
    assert(intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalMerge(points, "k", iv, "lo", "hi", Seq("k"), Seq("ivid"))
    }.getMessage.contains("share a type"))
    assert(intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalMerge(points, "x", iv, "lo", "hi", Nil, Seq("ivid"))
    }.getMessage.contains("by"))
    // mismatched BY-KEY types would hash equal keys to different partitions
    // and mis-read row slots — silently wrong results, so it must throw
    val intKey = points.withColumn("k", lit(1).cast("int"))
    val longKey = iv.withColumn("k", lit(1L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalMerge(intKey, "x", longKey, "lo", "hi",
        Seq("k"), Seq("ivid"))
    }
    assert(e.getMessage.contains("'k' must share a type"), e.getMessage)
    assert(intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asofMerge(intKey, longKey
          .withColumnRenamed("lo", "t2"), "x", "t2", Seq("k"), Seq("ivid"))
    }.getMessage.contains("'k' must share a type"))
  }

  test("optimizer rule prunes unread VALUE pairs off the node (right side slims)") {
    import spark.implicits._
    val points = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong)).toDF("pid", "k", "x")
    val intervals = (1 to 30).map(i =>
        (i.toLong, "k" + i % 3, i.toLong, i.toLong + 5, "wide_" * 8 + i, i * 1.5))
      .toDF("ivid", "k", "lo", "hi", "bulk", "w")
    val joined = RangeJoin.pointInIntervalMerge(points, "x", intervals,
      "lo", "hi", Seq("k"), valueCols = Seq("ivid", "bulk", "w"))
    val slim = joined.select("pid", "iv_w")
    slim.collect()
    val node = slim.queryExecution.optimizedPlan
      .collect { case n: IntervalMergeJoinNode => n }.head
    assert(node.valueOutput.map(_.name) == Seq("iv_w"),
      s"unused value pairs must prune: ${node.valueOutput.map(_.name)}")
    assert(!node.right.output.map(_.name).contains("bulk"),
      s"pruned value must leave the right child: ${node.right.output.map(_.name)}")
    val expected = recipe(points, "x", intervals, "lo", "hi", Seq("k"),
      Seq("ivid", "bulk", "w")).select("pid", "iv_w")
    assert(canon(slim) == canon(expected))
  }

  test("two-pass overlap's swapped pass slims its value shuffle under an outer projection") {
    import spark.implicits._
    val left = (1 to 40).map(i =>
        (i.toLong, "k" + i % 3, i.toLong, i.toLong + 6, "bulky_" * 8 + i))
      .toDF("lid", "k", "llo", "lhi", "payload")
    val right = (1 to 40).map(i => (i.toLong, "k" + i % 3, i.toLong + 3, i.toLong + 9))
      .toDF("rid", "k", "rlo", "rhi")
    val slim = RangeJoin.intervalOverlapTwoPass(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), Seq("rid"))
      .select("lid", "iv_rid")
    slim.collect()
    // the case-2 node (right side = left table as intervals) must not carry
    // `payload` as a value once the projection pushed through the union:
    // llo survives (the strictness filter reads it), payload must not
    val nodes = slim.queryExecution.optimizedPlan
      .collect { case n: IntervalMergeJoinNode => n }
    assert(nodes.size == 2)
    val case2 = nodes.find(_.valueOutput.exists(_.name.startsWith("__l_"))).get
    val vals = case2.valueOutput.map(_.name).toSet
    assert(!vals.contains("__l_payload"),
      s"unreferenced wide column must prune off the swapped pass: $vals")
    assert(vals.contains("__l_llo"), s"filter-referenced value must survive: $vals")
  }
}
