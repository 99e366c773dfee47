package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.RangeJoin

/** The single-pass native interval-OVERLAP operator against the two-pass
  * containment decomposition it replaced: same semantics, half the
  * exchanges — one merged plane sweep with per-side active sets instead of
  * two containment sweeps plus a union. */
class IntervalOverlapJoinSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def randomSides(seed: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def key(): Option[String] =
      if (rnd.nextInt(10) == 0) None else Some("k" + rnd.nextInt(5))
    def iv(bound: Int): (Option[Long], Option[Long]) = {
      val lo = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(bound).toLong)
      (lo, lo.map(_ + rnd.nextInt(12).toLong)) // mix empty, unit, long
    }
    val left = (1 to 300).map { i => val (lo, hi) = iv(60); (i.toLong, key(), lo, hi) }
      .toDF("lid", "k", "llo", "lhi")
    val right = (1 to 300).map { i => val (lo, hi) = iv(60); (i.toLong, key(), lo, hi) }
      .toDF("rid", "k", "rlo", "rhi")
    (left, right)
  }

  test("single-pass sweep matches the two-pass containment decomposition on randomized input") {
    val (left, right) = randomSides(23)
    val native = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
      right, "rlo", "rhi", by = Seq("k"), valueCols = Seq("rid", "rlo"))
    val twoPass = RangeJoin.intervalOverlapTwoPass(left, "llo", "lhi",
      right, "rlo", "rhi", by = Seq("k"), valueCols = Seq("rid", "rlo"))
    assert(native.columns.toSeq == twoPass.columns.toSeq)
    assert(canon(native) == canon(twoPass))
  }

  test("one exec, one exchange+sort per side — half the two-pass plan's shuffles") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong, i.toLong + 6))
      .toDF("lid", "k", "llo", "lhi")
    val right = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong + 3, i.toLong + 9))
      .toDF("rid", "k", "rlo", "rhi")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val native = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), Seq("rid"))
      native.collect()
      val plan = native.queryExecution.executedPlan
      assert(plan.collect { case e: IntervalOverlapJoinExec => e }.size == 1)
      val nativeShuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(nativeShuffles == 2, s"one exchange per side, got $nativeShuffles")

      val twoPass = RangeJoin.intervalOverlapTwoPass(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), Seq("rid"))
      val twoPassShuffles = twoPass.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.size
      assert(twoPassShuffles == 4,
        s"the decomposition shuffles each side twice, got $twoPassShuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sweep state is the per-side active sets: metric stays at the overlap bound") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 500 intervals per side on ONE key (one task carries the data — the
      // metric sums per-task maxima), laid out so at most 3 per side are
      // ever live at one sweep position: interval j covers [3j, 3j+9)
      val left = (0 until 500).map(j =>
          (j.toLong, "k", (j * 3).toLong, (j * 3).toLong + 9))
        .toDF("lid", "k", "llo", "lhi")
      val right = (0 until 500).map(j =>
          (j.toLong, "k", (j * 3 + 1).toLong, (j * 3 + 1).toLong + 9))
        .toDF("rid", "k", "rlo", "rhi")
      val df = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), Seq("rid"))
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collectFirst { case e: IntervalOverlapJoinExec => e }.get
      val maxActive = exec.metrics("maxActiveIntervals").value
      assert(maxActive > 0 && maxActive <= 6,
        s"state must track overlap (<=3/side), not interval count (500/side): $maxActive")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("optimizer rule prunes unread left columns and value pairs through the node") {
    import spark.implicits._
    val left = (1 to 40).map(i =>
        (i.toLong, "k" + i % 3, i.toLong, i.toLong + 6, "bulky_" * 8 + i))
      .toDF("lid", "k", "llo", "lhi", "payload")
    val right = (1 to 40).map(i =>
        (i.toLong, "k" + i % 3, i.toLong + 3, i.toLong + 9, "wide_" * 8 + i))
      .toDF("rid", "k", "rlo", "rhi", "heavy")
    val slim = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), valueCols = Seq("rid", "heavy"))
      .select("lid", "iv_rid")
    slim.collect()
    val node = slim.queryExecution.optimizedPlan
      .collect { case n: IntervalOverlapJoinNode => n }.head
    val leftCols = node.left.output.map(_.name).toSet
    assert(!leftCols.contains("payload"),
      s"unread left column must not reach the exchange: $leftCols")
    assert(Set("k", "llo", "lhi", "lid").subsetOf(leftCols), s"$leftCols")
    assert(node.valueOutput.map(_.name) == Seq("iv_rid"),
      s"unread value pair must prune: ${node.valueOutput.map(_.name)}")
    assert(!node.right.output.map(_.name).contains("heavy"),
      s"pruned value must leave the right child: ${node.right.output.map(_.name)}")
    // and the pruned plan still answers correctly
    val expected = RangeJoin.intervalOverlapTwoPass(left, "llo", "lhi",
        right, "rlo", "rhi", Seq("k"), Seq("rid"))
      .select("lid", "iv_rid")
    assert(canon(slim) == canon(expected))
  }

  test("output clustering survives: a downstream per-key aggregate adds no exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong, i.toLong + 6))
        .toDF("lid", "k", "llo", "lhi")
      val right = (1 to 50).map(i => (i.toLong, "k" + i % 3, i.toLong + 3, i.toLong + 9))
        .toDF("rid", "k", "rlo", "rhi")
      val agg = RangeJoin.intervalOverlapMerge(left, "llo", "lhi",
          right, "rlo", "rhi", Seq("k"), Seq("rid"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      agg.collect()
      val shuffles = agg.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.size
      assert(shuffles == 2,
        s"the by-key aggregate must reuse the join's clustering, got $shuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
