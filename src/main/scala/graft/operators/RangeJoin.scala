package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join as a reusable library operator: joins a
 * point column against `[lo, hi)` intervals without the |points| × |intervals|
 * cross product a naive theta join plans.
 *
 * Scale shape — bucket quantization: points quantize to width-`w` buckets;
 * each interval explodes to the buckets it covers; the interval predicate
 * becomes an equi-join on bucket plus an exact residual filter. Candidates
 * are bounded by rows × buckets-per-interval, and the join stays a hash join
 * even when BOTH sides are large (set `broadcastIntervals = false` to let the
 * planner shuffle instead of broadcasting a big interval table).
 *
 * Pick `bucketWidth` near the typical interval width: each interval then
 * covers 2-3 buckets and each point meets only the intervals overlapping its
 * bucket.
 */
object RangeJoin {

  /**
   * Rows of `points` paired with every `intervals` row whose `[loCol, hiCol)`
   * contains `pointCol` (lo inclusive, hi exclusive). Returns all columns
   * from both inputs. Column names must not collide across the two inputs
   * (standard join hygiene; rename before calling).
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"column names ${shared.mkString(", ")} appear on both sides; rename before joining")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by the operator")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // floor(hi/w) is included even though hi is exclusive — when hi lands
    // exactly on a bucket boundary that bucket can never pass the residual
    // filter, which is harmless and avoids epsilon arithmetic on doubles
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val ivSide = if (broadcastIntervals) broadcast(iv) else iv
    p.join(ivSide, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /**
   * KEYED interval containment through the NATIVE Catalyst operator
   * ([[graft.plans.IntervalMergeJoinNode]] /
   * [[graft.plans.IntervalMergeJoinExec]]): each `points` row pairs with
   * every `intervals` row sharing its `by` key columns (same names on both
   * sides) whose `[loCol, hiCol)` contains `pointCol` — inner-join
   * semantics, so unmatched points emit nothing. Returns every `points`
   * column unchanged plus, for each name in `valueCols`, a `prefix`-ed
   * column with the interval row's value.
   *
   * Versus [[pointInInterval]]: no bucket-width knob to tune, no
   * one-row-per-covered-bucket interval explosion, and both sides can be
   * corpus-sized — each shuffles ONCE on the `by` keys and a single sweep
   * pass joins them with O(max concurrent interval overlap) state per
   * partition. Prefer the bucket recipe when there is no usable key and the
   * interval side is small; prefer this when both sides are large and keyed
   * (events x session windows per user, readings x calibration ranges per
   * sensor).
   *
   * Null semantics (IntervalMergeJoinSpec pins them): null point, null lo,
   * or null hi matches nothing; null `by` keys group together.
   *
   * `joinType = "left_outer"` keeps unmatched points (including null-point
   * rows) with null value columns — the enrichment contract
   * [[AsofJoin.asofMerge]] has, for intervals. Default `"inner"`.
   */
  def pointInIntervalMerge(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      by: Seq[String],
      valueCols: Seq[String],
      prefix: String = "iv_",
      joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.graftshim.PlanShim
    import graft.plans.{IntervalMergeJoinNode, KeyedMergeBuild}

    val leftOuter = joinType match {
      case "inner" => false
      case "left_outer" => true
      case other => throw new IllegalArgumentException(
        s"joinType must be 'inner' or 'left_outer', got '$other'")
    }
    val b = KeyedMergeBuild.prepare("interval merge join", points, intervals,
      by, rightExtra = Seq(loCol, hiCol), valueCols, prefix,
      typedPairs = Seq(pointCol -> loCol, pointCol -> hiCol),
      rules = Seq(graft.plans.PruneIntervalMergeJoin))
    PlanShim.ofRows(points.sparkSession, IntervalMergeJoinNode(
      by.map(b.leftAttr), by.map(b.rMap),
      b.leftAttr(pointCol), b.rMap(loCol), b.rMap(hiCol),
      valueCols.map(b.rMap), b.valueOutput, leftOuter, b.lPlan, b.rPlan))
  }

  /**
   * KEYED interval OVERLAP join — the third classic temporal-join shape
   * after as-of ([[AsofJoin.asofMerge]]) and point-in-interval
   * ([[pointInIntervalMerge]]): each `left` row's `[lLo, lHi)` pairs with
   * every `right` row sharing its `by` keys whose `[rLo, rHi)` overlaps it
   * (`max(lLo, rLo) < min(lHi, rHi)`). Returns every `left` column plus a
   * `prefix`-ed column per `valueCols` name, one output row per
   * overlapping pair; empty (`lo >= hi`) and null-endpoint intervals on
   * either side match nothing (three-valued-strict — note Spark's own
   * `greatest()`/`least()` IGNORE nulls, so a declarative
   * `greatest(...) < least(...)` recipe would treat a null endpoint as
   * absent instead; the strict equivalent is the four-conjunct form
   * `lLo < lHi AND rLo < rHi AND lLo < rHi AND rLo < lHi`).
   *
   * Physical shape: ONE merged plane sweep through the NATIVE
   * [[graft.plans.IntervalOverlapJoinNode]] /
   * [[graft.plans.IntervalOverlapJoinExec]] operator — both sides
   * hash-partition on the `by` keys and sort by start ONCE, then a single
   * pass walks the two streams together keeping an active set per side
   * (O(max concurrent overlap) state, never a per-key cross product); each
   * overlapping pair emits exactly once, at the later-starting interval.
   * Versus [[intervalOverlapTwoPass]] (the same semantics composed from
   * two containment sweeps): half the exchanges and sorts per side, and no
   * union of two shuffled legs. That is how a 100 TB overlap join stays a
   * single pair of sorted scans.
   */
  def intervalOverlapMerge(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      by: Seq[String],
      valueCols: Seq[String],
      prefix: String = "iv_"): DataFrame = {
    import org.apache.spark.sql.graftshim.PlanShim
    import graft.plans.{IntervalOverlapJoinNode, KeyedMergeBuild}

    val b = KeyedMergeBuild.prepare("interval overlap join", left, right,
      by, rightExtra = Seq(rLo, rHi), valueCols, prefix,
      typedPairs = Seq(lLo -> rLo, lHi -> rLo, lLo -> rHi),
      rules = Seq(graft.plans.PruneIntervalOverlapJoin))
    PlanShim.ofRows(left.sparkSession, IntervalOverlapJoinNode(
      by.map(b.leftAttr), by.map(b.rMap),
      b.leftAttr(lLo), b.leftAttr(lHi), b.rMap(rLo), b.rMap(rHi),
      valueCols.map(b.rMap), b.valueOutput, b.lPlan, b.rPlan))
  }

  /**
   * The same keyed interval-overlap semantics as [[intervalOverlapMerge]],
   * composed from the CONTAINMENT operator instead of the dedicated
   * single-pass exec — kept as the reference recipe (the spec cross-checks
   * the two and the bench head-to-heads them). The overlap predicate
   * decomposes EXACTLY into two disjoint containment cases by which
   * interval starts later — `rLo <= lLo < rHi` (left starts inside right,
   * ties here) or `lLo < rLo < lHi` (right starts strictly inside left) —
   * so two passes of [[pointInIntervalMerge]] cover it with no duplicates
   * and no theta join, at the cost of shuffling and sorting each side
   * twice plus a union.
   */
  def intervalOverlapTwoPass(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      by: Seq[String],
      valueCols: Seq[String],
      prefix: String = "iv_"): DataFrame = {
    val reserved = "__l_"
    require(!(left.columns ++ right.columns).exists(_.startsWith(reserved)),
      s"column names starting with $reserved are reserved by the operator")
    val leftLive = left.filter(col(lLo) < col(lHi)) // drops empty + null-endpoint
    val rightSlim = right.select(
      (by ++ Seq(rLo, rHi) ++ valueCols).distinct.map(col): _*)
      .filter(col(rLo) < col(rHi))

    // case 1 — right starts at-or-before left: lLo in [rLo, rHi)
    val case1 = pointInIntervalMerge(leftLive, lLo, rightSlim, rLo, rHi,
      by, valueCols, prefix)

    // case 2 — right starts strictly inside left: rLo in (lLo, lHi).
    // Swapped sweep (right rows are the points), left rides as the interval
    // side with ALL its columns as values; the strict filter excludes the
    // rLo == lLo tie case 1 already emitted.
    val case2Raw = pointInIntervalMerge(rightSlim, rLo, leftLive, lLo, lHi,
      by, valueCols = left.columns.toSeq, prefix = reserved)
      .filter(col(rLo) > col(reserved + lLo))
    val case2 = case2Raw.select(
      left.columns.map(c => col(reserved + c).as(c)) ++
        valueCols.map(c => col(c).as(prefix + c)): _*)

    case1.unionByName(case2)
  }
}
