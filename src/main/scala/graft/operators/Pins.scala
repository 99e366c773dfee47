package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Shared helpers for the eager-pin (`localCheckpoint(true)`) pattern the
 * query catalog uses on multi-consumed narrow frames.
 *
 * Failure-semantics tradeoff (documented once, here, for every call
 * site): an eager `localCheckpoint` truncates lineage into
 * executor-local blocks, so (a) losing an executor makes downstream
 * stages fail UNRECOVERABLY (no recomputation path — acceptable on a
 * single-node bench harness; reliability-sensitive deployments should
 * swap in reliable `checkpoint()` or a parquet stage, which is exactly
 * what `PrepPipeline.fullPrep`'s `materialize` seam exists for), and
 * (b) query CONSTRUCTION triggers real Spark jobs, so plan-inspection
 * paths execute work as a side effect.
 */
object Pins {

  /** Row ceiling under which a pinned id-set may be broadcast-hinted.
    * 20 M single-column long rows ≈ 160 MB of key data — well inside
    * executor memory and Spark's hard broadcast caps (8 GB / 512 M
    * rows), far above every bench SF (≤ 1 M docs). */
  val BroadcastMaxRows: Long = 20L * 1000 * 1000

  /**
   * Broadcast hint GATED on the pinned frame's actual row count.
   *
   * Why the gate: a `localCheckpoint` frame reports worst-case size
   * statistics, so joins against a pinned small table silently downgrade
   * broadcast → sort-merge without an explicit hint (measured +2.8 s on
   * pipe_full_prep at sf0.1). But an UNCONDITIONAL hint bypasses
   * `autoBroadcastJoinThreshold`'s safety on frames whose row count is
   * proportional to the corpus (pass/keep id-sets where most docs
   * survive): at 100 TB that is a guaranteed driver/executor OOM rather
   * than a graceful sort-merge. The frame is already materialized
   * (pinned), so the count is one cheap cached-block job; under the
   * ceiling the plan is identical to the unconditional hint, over it the
   * join degrades to the safe shuffle strategy.
   */
  def broadcastIfBounded(
      pinned: DataFrame, maxRows: Long = BroadcastMaxRows): DataFrame =
    if (pinned.count() <= maxRows) broadcast(pinned) else pinned
}
