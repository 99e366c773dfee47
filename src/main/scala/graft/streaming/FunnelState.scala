package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming funnel analysis as custom state — the live twin of the batch
 * `q_funnel` greedy ordered funnel, scoped to tumbling event-time windows
 * (the production contract: "converted within the window", so a verdict
 * can FINALIZE — an unbounded funnel never could, since a later event
 * might always arrive).
 *
 * Semantics per (user, window): anchor t_0 = earliest step-0 event;
 * t_k = earliest step-k event strictly after t_{k-1}; `completed` = number
 * of anchored steps. Greedy anchoring is ORDER-INSENSITIVE on the final
 * event set, so out-of-order arrival needs no special casing — the state
 * holds the window's (step, ts) pairs and the verdict is computed once, at
 * finality. A verdict emits ONLY when the event-time watermark passes the
 * window end: every in-watermark event of the window has arrived (later
 * ones are dropped upstream by Spark), so the emission is final and
 * append-mode safe across checkpointed restarts, and equals the batch
 * computation over the same in-watermark data.
 *
 * Scale: state is (step, ts) pairs for ACTIVE (user, window) keys only —
 * horizon-bounded by the watermark delay plus one window, not by history;
 * emitted keys leave the store. On a batch frame the same call
 * degenerates correctly: each key's full window arrives in one group and
 * the verdict emits immediately (batch GroupState has no watermark).
 */
object FunnelState {

  final case class Verdict(
      user_id: Long,
      window_start_ms: Long,
      completed: Int,
      step_ts_ms: Seq[Long])

  /** Greedy anchors over the final event set: earliest step-0, then
    * earliest of each later step strictly after the previous anchor. */
  private[streaming] def anchors(
      events: Seq[(Int, Long)], nSteps: Int): Seq[Long] = {
    val byStep = Array.fill(nSteps)(scala.collection.mutable.ArrayBuffer.empty[Long])
    events.foreach { case (s, t) => if (s >= 0 && s < nSteps) byStep(s) += t }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = Long.MinValue
    var k = 0
    var done = false
    while (k < nSteps && !done) {
      val cand = byStep(k).filter(t => if (k == 0) true else t > prev)
      if (cand.isEmpty) done = true
      else { prev = cand.min; out += prev; k += 1 }
    }
    out.toSeq
  }

  /**
   * Funnel a streaming (or batch) frame. `steps` maps the event-type
   * column's values to funnel stages in order; events of other types are
   * filtered out before the shuffle. Emits one [[Verdict]] per
   * (user, window) that saw at least one step-0 event.
   */
  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowMs: Long = 24L * 3600 * 1000,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      watermarkDelay: String = "0 seconds"): Dataset[Verdict] = {
    require(steps.nonEmpty && windowMs > 0)
    val streaming = events.isStreaming
    val nSteps = steps.length
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc)
      }
    events
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("timestamp").as("ts"), stepIdx.as("step"))
      .filter(col("step") >= 0)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Int)]
      .groupByKey(r => (r._1, Math.floorDiv(r._2.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[List[(Int, Long)], Verdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, Long), batch: Iterator[(Long, java.sql.Timestamp, Int)],
         state: GroupState[List[(Int, Long)]]) =>
          val (user, winStart) = key
          val winEnd = winStart + windowMs
          val merged = state.getOption.getOrElse(Nil) ++
            batch.map(r => (r._3, r._2.getTime))
          def verdict = {
            val a = anchors(merged, nSteps)
            Verdict(user, winStart, a.length, a)
          }
          if (!streaming) {
            // batch degenerate case: the group is complete — emit now
            // (only for windows that anchored step 0)
            if (anchors(merged, nSteps).nonEmpty) Iterator.single(verdict)
            else Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            if (wm >= winEnd) {
              // window is final (whether we got here by data or timeout)
              state.remove()
              if (anchors(merged, nSteps).nonEmpty) Iterator.single(verdict)
              else Iterator.empty
            } else {
              state.update(merged)
              state.setTimeoutTimestamp(math.max(winEnd, wm + 1))
              Iterator.empty
            }
          }
      }
  }
}
