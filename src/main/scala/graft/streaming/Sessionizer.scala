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

  /** Merge sorted event times into a SORTED session list: a linear
    * two-pointer walk (O(sessions + events) per invocation — a hot key's
    * full batch history costs one pass, not per-event list scans).
    * Emitting items in start order and gap-merging each into the running
    * session yields exactly the gap-connected components: an event between
    * two held sessions bridges them, a late event ahead of a session
    * extends it backwards. */
  private def fold(sessions: List[Open], times: Array[Long], gapMs: Long): List[Open] = {
    val ss = sessions.toArray // sorted by startMs (invariant of this fn)
    val out = scala.collection.mutable.ListBuffer.empty[Open]
    var cur: Open = null
    def push(o: Open): Unit = {
      if (cur == null) cur = o
      else if (o.startMs <= cur.lastMs + gapMs) {
        cur = Open(cur.startMs, math.max(cur.lastMs, o.lastMs), cur.n + o.n)
      } else { out += cur; cur = o }
    }
    var si = 0
    var ti = 0
    while (si < ss.length || ti < times.length) {
      if (ti >= times.length || (si < ss.length && ss(si).startMs <= times(ti))) {
        push(ss(si)); si += 1
      } else {
        push(Open(times(ti), times(ti), 1)); ti += 1
      }
    }
    if (cur != null) out += cur
    out.toList
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
