package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming frequent items per tumbling event-time window — the live twin
 * of the batch `graft_heavy_hitters` aggregate, as Misra–Gries state in
 * `flatMapGroupsWithState` ("which namespaces dominate the log RIGHT NOW"
 * over an unbounded stream, with bounded memory).
 *
 * Sharding: items are routed by `hash(item) % shards`, so one window
 * fans out over `shards` state keys (no single hot key at cluster scale)
 * while every occurrence of an item lands in the SAME shard — per-item
 * counts are never split, and the MG bound applies per shard: any item
 * with more than n_shard/(k+1) of its shard's traffic survives, count_lb
 * within that bound below truth. With k at or above a shard's distinct-
 * item count no counter ever decrements and the emission is EXACT window
 * counts — the configuration the oracle checks; the spec drives the
 * small-k approximate regime against the guarantee.
 *
 * Emission at watermark finality only (append-safe across restarts, same
 * contract as [[FunnelState]]); state per key is at most k counters, and
 * finalized windows leave the store. On a batch frame the group is
 * complete, so the verdict emits immediately — the batch-degenerate path
 * the catalog query oracle-checks.
 */
object HeavyHittersState {

  final case class Hit(window_start_ms: Long, item: String, count_lb: Long)

  /** One MG streaming step over a (item -> count) map capped at k. */
  private[streaming] def offer(
      m: scala.collection.mutable.HashMap[String, Long], item: String, k: Int): Unit = {
    m.get(item) match {
      case Some(c) => m.update(item, c + 1)
      case None if m.size < k => m.update(item, 1L)
      case None =>
        // materialize the key set before the decrement sweep — updating a
        // scala HashMap while iterating its live keysIterator is undefined
        m.keys.toArray.foreach { key =>
          val c = m(key)
          if (c == 1L) m.remove(key) else m.update(key, c - 1)
        }
    }
  }

  def frequentItems(
      events: DataFrame,
      itemCol: String,
      windowMs: Long,
      tsCol: String = "ts",
      k: Int = 64,
      shards: Int = 8,
      watermarkDelay: String = "0 seconds"): Dataset[Hit] = {
    require(k > 0 && shards > 0 && windowMs > 0)
    val streaming = events.isStreaming
    import events.sparkSession.implicits._
    events
      .select(col(itemCol).cast("string").as("item"),
        col(tsCol).cast("timestamp").as("ts"))
      .filter(col("item").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey { r =>
        val win = Math.floorDiv(r._2.getTime, windowMs) * windowMs
        val shard = Math.floorMod(r._1.hashCode, shards)
        (win, shard)
      }
      .flatMapGroupsWithState[List[(String, Long)], Hit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, Int), batch: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[List[(String, Long)]]) =>
          val (winStart, _) = key
          val winEnd = winStart + windowMs
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.foreach { case (i, c) => m.update(i, c) })
          batch.foreach(r => offer(m, r._1, k))
          def emit = m.toSeq.sortBy { case (i, c) => (-c, i) }
            .iterator.map { case (i, c) => Hit(winStart, i, c) }
          if (!streaming) emit
          else {
            val wm = state.getCurrentWatermarkMs()
            if (wm >= winEnd) { state.remove(); emit }
            else {
              state.update(m.toList)
              state.setTimeoutTimestamp(math.max(winEnd, wm + 1))
              Iterator.empty
            }
          }
      }
  }
}
