package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sessionization as CUSTOM STATE — the live twin of the batch
 * `q_sessionize` gaps-and-islands window. Each key holds its not-yet-final
 * sessions in the state store; an event merges into any session within the
 * inactivity gap (BRIDGING two sessions when it lands between them, and
 * extending a session backwards when it arrives late-but-allowed), and a
 * session emits ONLY once the event-time watermark passes `end + gap` —
 * no earlier event can still change it, so every emission is final
 * (append-mode safe across checkpointed restarts) and equals the batch
 * window over the same in-watermark data.
 *
 * Scale: state is the list of not-yet-final sessions per ACTIVE key —
 * bounded by the watermark delay over the gap, not by history; finalized
 * sessions leave the store. Events later than the watermark are dropped by
 * Spark upstream, the standard trade.
 *
 * On a BATCH frame the same call degenerates correctly: each key's full
 * data arrives in one group, every session is closed by definition, and
 * everything emits (no state, no timeouts — Spark's batch GroupState has
 * no watermark to consult).
 */
object Sessionizer {

  final case class Session(
      user_id: Long,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long)

  /** A not-yet-final session held in the state store (public: the state
    * Encoder's generated code must be able to construct it). */
  final case class Open(startMs: Long, lastMs: Long, n: Long)

  /** Merge sorted event times into a sorted session list: each time joins
    * every session within `gapMs` (bridging neighbors), else opens one. */
  private def fold(sessions: List[Open], times: Array[Long], gapMs: Long): List[Open] = {
    var acc = sessions
    times.foreach { t =>
      val (near, far) = acc.partition(s =>
        t >= s.startMs - gapMs && t <= s.lastMs + gapMs)
      val merged = near.foldLeft(Open(t, t, 1)) { (m, s) =>
        Open(math.min(m.startMs, s.startMs), math.max(m.lastMs, s.lastMs), m.n + s.n)
      }
      acc = (merged :: far).sortBy(_.startMs)
    }
    acc
  }

  /**
   * Sessionize a streaming (or batch) frame with an inactivity gap. Input
   * needs a long key column and a timestamp column; a watermark of
   * `watermarkDelay` is applied to the timestamp (the late-arrival budget —
   * it also sets how long after quiescence a session takes to finalize).
   */
  def sessionize(
      events: DataFrame,
      gapMs: Long,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    require(gapMs > 0, "inactivity gap must be positive")
    val streaming = events.isStreaming
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("long").as("k"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[Open], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, batch: Iterator[(Long, java.sql.Timestamp)], state: GroupState[List[Open]]) =>
          val times = batch.map(_._2.getTime).toArray
          java.util.Arrays.sort(times)
          val all = fold(state.getOption.getOrElse(Nil), times, gapMs)
          if (!streaming) {
            // batch degenerate case: the group is complete, emit everything
            // (GroupState has no watermark in batch execution — don't touch
            // timeouts, they'd throw)
            all.iterator.map(s => Session(k, s.startMs, s.lastMs, s.n))
          } else {
            // final = no in-watermark event can still reach the session
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = all.partition(_.lastMs + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              state.setTimeoutTimestamp(
                math.max(open.map(_.lastMs + gapMs).min, wm + 1))
            }
            closed.iterator.map(s => Session(k, s.startMs, s.lastMs, s.n))
          }
      }
  }
}
