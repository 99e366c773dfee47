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
}
