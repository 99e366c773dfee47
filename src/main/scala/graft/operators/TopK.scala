package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Top-k rows per key as a library operator over the bounded-heap native
 * aggregate [[graft.expressions.TopKRows]] (`graft_topk`).
 *
 * Versus the `row_number() <= k` window recipe: the aggregate path gets
 * map-side partial aggregation, so the shuffle carries at most k rows per
 * key per input partition and no task ever sorts its whole partition —
 * each group's state is an O(k) heap. Use it when k is small relative to
 * group size (the hot top-k case); use a window when you need every row
 * ranked anyway.
 */
object TopK {

  /**
   * The k rows with the LARGEST `sortKey` per `keyCols` group, returned as
   * one row each: key columns + `payloadCols` + `rn` (1-based rank, 1 =
   * largest sortKey).
   *
   * `sortKey` must be a TOTAL order over each group for a deterministic
   * result — include a unique tiebreak, e.g.
   * `struct(col("score"), -col("id"))` for "score desc, id asc" (negating
   * the tiebreak flips its direction under the max-first comparison).
   * Rows with a NULL sortKey are dropped.
   */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      sortKey: Column,
      payloadCols: Seq[String],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty, "topKPerKey needs at least one key column")
    require(payloadCols.nonEmpty, "topKPerKey needs at least one payload column")
    require(k > 0, s"k must be positive, got $k")
    graft.expressions.GraftExtensions.register(df.sparkSession)
    df.groupBy(keyCols.map(col): _*)
      .agg(call_function("graft_topk",
        sortKey, struct(payloadCols.map(col): _*), lit(k)).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__r")): _*)
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__r.$c").as(c)) :+
        (col("__pos") + 1).cast("int").as("rn"): _*)
  }
}
