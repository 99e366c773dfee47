package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT continuous quantiles (the `percentile()` / `quantile_cont`
 * definition: interpolate at rank `p * (n-1)`) with a 100 TB-shaped plan.
 *
 * The two existing formulations both have a scale ceiling: the built-in
 * `percentile()` holds every group value in ONE aggregation buffer
 * (serialized whole between partial and final — the round-4 bench's 7.3x
 * outlier), and the two-pass rank-select in `q_stats_suite` bounds memory
 * but still sorts each group's full distinct-value set in a single task
 * (fine at bench SFs; a parallelism floor at billions of distinct values).
 *
 * This operator is the classic sketch-guided exact selection instead:
 *
 *  1. ONE aggregate computes each group's count and a GK
 *     `approx_percentile` BRACKET around every target — values at
 *     `p ± slack/accuracy`. The sketch's rank error is `n/accuracy`, so
 *     with `slack > 1` the true target ranks provably fall inside the
 *     bracket (guarded at runtime, not assumed — see below).
 *  2. ONE scan counts, per group and target, the rows strictly below the
 *     bracket (conditional sums — a mergeable hash aggregate), fixing the
 *     absolute rank of everything inside the bracket.
 *  3. Only rows INSIDE a bracket survive to the rank-select: value-
 *     frequency collapse, a running count per (group, target) — each such
 *     partition holds at most `~2 * slack * n / accuracy` ranks regardless
 *     of n — then the exact `(1-g)*lo + g*hi` interpolation.
 *
 * Total: two corpus scans, all aggregates mergeable, no unbounded buffer,
 * no per-group full sort. The price is the bracket guard: if the sketch
 * ever mis-brackets (it cannot, within its published error bound, but the
 * bound is an invariant worth enforcing), `assert_true` fails the query
 * loudly instead of returning a silently-wrong quantile.
 *
 * Returns one row per group: (keys..., q_<i> for each requested p).
 */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      accuracy: Int = 10000,
      slack: Int = 5): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile targets must be in [0, 1], got $ps")
    require(accuracy > 0 && slack >= 2, "accuracy > 0 and slack >= 2 required")
    val k = keys.map(col)
    val v = col(valueCol)
    val delta = slack.toDouble / accuracy

    // stage 1: per-group n + sketch brackets for every target (one agg row
    // per group; the GK sketch is mergeable, memory O(accuracy)). Column
    // API, not an interpolated SQL string — a column name needing
    // backticks must not break (or misparse into) the sketch stage
    val lows = ps.map(p => math.max(0.0, p - delta))
    val highs = ps.map(p => math.min(1.0, p + delta))
    val brackets = df.groupBy(k: _*).agg(
      count(v).as("n"),
      percentile_approx(v, array((lows ++ highs).map(lit): _*),
        lit(accuracy)).as("bs"))
    val bCols = ps.indices.flatMap(i => Seq(
      element_at(col("bs"), i + 1).as(s"blo_$i"),
      element_at(col("bs"), ps.size + i + 1).as(s"bhi_$i")))
    val b = brackets.select((col("n") +: k) ++ bCols: _*)

    // stage 2: absolute rank anchors — rows strictly below each bracket
    // (conditional sums; map-side combinable)
    val withB = df.join(broadcast(b), keys)
    val belowCols = ps.indices.map(i =>
      sum(when(v < col(s"blo_$i"), 1L).otherwise(0L)).as(s"below_$i"))
    val anchors = withB.groupBy(k: _*).agg(belowCols.head, belowCols.tail: _*)

    // stage 3: rank-select INSIDE the brackets only. A row can sit in
    // several targets' brackets — explode per target, then collapse to
    // value frequencies per (group, target)
    val targetRows = withB.select((k :+ v.as("v") :+ posexplode(array(
      ps.indices.map(i => struct(col(s"blo_$i").as("lo"),
        col(s"bhi_$i").as("hi"))): _*)).as(Seq("ti", "w"))): _*)
      .filter(col("v") >= col("w.lo") && col("v") <= col("w.hi"))
      .groupBy((k :+ col("ti") :+ col("v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val wnd = Window.partitionBy((k :+ col("ti")): _*).orderBy("v")
    val ranked = targetRows
      .withColumn("cum", sum("cnt").over(wnd))
      .join(broadcast(anchors), keys)
      .join(broadcast(b.select((k :+ col("n")): _*)), keys)

    // target rank r = p*(n-1); value at absolute 0-indexed rank q is the
    // first bracket value with below + cum >= q + 1
    def forTarget(i: Int): Seq[Column] = {
      val inT = col("ti") === i
      val r = lit(ps(i)) * (col("n") - 1).cast("double")
      val lo = floor(r)
      val below = col(s"below_$i")
      Seq(
        min(when(inT && below + col("cum") >= lo + 1, col("v"))).as(s"vlo_$i"),
        min(when(inT && below + col("cum") >= lo + 2, col("v"))).as(s"vhi_$i"),
        max(when(inT, r - lo)).as(s"g_$i"),
        // bracket-coverage guard inputs: the window's absolute rank span
        min(when(inT, below)).as(s"first_$i"),
        max(when(inT, below + col("cum"))).as(s"last1_$i"))
    }
    val aggs = ps.indices.flatMap(forTarget)
    val sel = ranked.groupBy(k: _*).agg(aggs.head, aggs.tail: _*)

    val outCols = ps.indices.map { i =>
      val r = lit(ps(i)) * (col("n") - 1).cast("double")
      val lo = floor(r)
      val needHi = col(s"g_$i") > 0.0
      // loud failure on a broken bracket instead of a silent wrong answer
      val covered = (lo >= col(s"first_$i")) &&
        when(needHi, lo + 2 <= col(s"last1_$i")).otherwise(lo + 1 <= col(s"last1_$i"))
      // an all-NULL group (n = 0) has no bracket rows; keep the group with
      // NULL quantiles (percentile()/quantile_cont semantics), don't drop it
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(when(assert_true(covered).isNull,
          (lit(1.0) - col(s"g_$i")) * col(s"vlo_$i") +
            col(s"g_$i") * coalesce(col(s"vhi_$i"), col(s"vlo_$i"))))
        .as(s"q_$i")
    }
    // base on the bracket table (one row per group even when empty/all-NULL)
    b.select((k :+ col("n")): _*)
      .join(broadcast(sel), keys, "left")
      .select(k ++ outCols: _*)
  }
}
