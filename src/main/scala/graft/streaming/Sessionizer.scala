package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sessionization as CUSTOM STATE — the live twin of the batch
 * `q_sessionize` gaps-and-islands window. Each key holds its one OPEN
 * session `(start, last, count)` in the state store; a session closes and
 * emits either when a same-batch event lands beyond the inactivity gap
 * (intra-batch split) or when the EVENT-TIME timeout fires (the watermark
 * passed `last + gap`), so emissions are final and append-mode safe across
 * checkpointed restarts.
 *
 * Scale: state is one small entry per ACTIVE key — closed sessions leave
 * the store via timeout, so state is bounded by concurrently-active keys,
 * not by history. Late events inside the watermark merge into the open
 * session (extending it backwards if needed); events later than the
 * watermark are dropped by Spark upstream, the standard trade.
 */
object Sessionizer {

  final case class Session(
      user_id: Long,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long)

  /** The per-key state-store entry (public: the state Encoder's generated
    * code must be able to construct it). */
  final case class Open(startMs: Long, lastMs: Long, n: Long)

  /**
   * Sessionize a streaming (or batch-test) frame with an inactivity gap.
   * Input needs a long key column and a timestamp column; a watermark of
   * `watermarkDelay` is applied to the timestamp (late-arrival budget —
   * it also sets how long after quiescence a session takes to close).
   */
  def sessionize(
      events: DataFrame,
      gapMs: Long,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    require(gapMs > 0, "inactivity gap must be positive")
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("long").as("k"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, batch: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: close and emit
            val open = state.get
            state.remove()
            Iterator.single(Session(k, open.startMs, open.lastMs, open.n))
          } else {
            val times = batch.map(_._2.getTime).toArray
            java.util.Arrays.sort(times)
            var closed = List.empty[Session]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(o) if t - o.lastMs <= gapMs =>
                  // merge (a late event may extend the session backwards)
                  cur = Some(Open(math.min(o.startMs, t), math.max(o.lastMs, t), o.n + 1))
                case Some(o) =>
                  closed ::= Session(k, o.startMs, o.lastMs, o.n) // intra-batch split
                  cur = Some(Open(t, t, 1))
                case None =>
                  cur = Some(Open(t, t, 1))
              }
            }
            cur.foreach { o =>
              state.update(o)
              // the timeout must sit beyond the current watermark; for a
              // session fed only by allowed-late events, clamp forward
              state.setTimeoutTimestamp(
                math.max(o.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverse.iterator
          }
      }
  }
}
