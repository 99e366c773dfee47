package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming enforcement of a per-source token budget — the live half of
 * [[graft.operators.EvalOps.waterfill]]: plan the mixture offline (exact
 * integer allocations with caps), then admit documents from the live
 * stream until each source's allocation is spent. The admission decision
 * is stateful across micro-batches (`mapGroupsWithState` keyed by
 * source), so a source that exhausts its quota in batch N admits nothing
 * in batch N+1 — the streaming analog of "stop reading this source once
 * its mixture share is met".
 *
 * Determinism: within a micro-batch each source's arrivals admit in
 * doc_id order (the group sorts its batch slice — bounded by one source's
 * rows per micro-batch, not the stream), so a replay admits the same
 * prefix. State per source is ONE long (tokens used); quotas ride in as a
 * broadcast-sized map. Greedy prefix admission, not bin packing: a doc
 * that would overflow the quota is dropped and admission continues with
 * smaller later docs only if they fit the remainder.
 *
 * Output rows: (source, doc_id, tokens, used_after) — `used_after` is the
 * running spend, so downstream sinks can audit the budget trajectory.
 */
object QuotaGuard {

  case class Admission(source: String, doc_id: Long, tokens: Long, used_after: Long)

  /**
   * Wrap a (source, doc_id, tokens) stream in quota admission. `quotas`
   * maps source -> token allocation (absent sources are unlimited —
   * pass every planned source explicitly for a closed-world gate).
   */
  def admit(docs: Dataset[(String, Long, Long)],
      quotas: Map[String, Long]): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[Long]) =>
          val quota = quotas.getOrElse(source, Long.MaxValue)
          var used = state.getOption.getOrElse(0L)
          val admitted = rows.toSeq.sortBy(_._2).flatMap { case (_, id, tok) =>
            if (used + tok <= quota) {
              used += tok
              Some(Admission(source, id, tok, used))
            } else None
          }
          state.update(used)
          admitted.iterator
      }
  }

  /** Adapt a documents-shaped DataFrame (doc_id, source, text) into the
    * (source, doc_id, tokens) admission input, batch or streaming. */
  def tokenized(docs: DataFrame): Dataset[(String, Long, Long)] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        size(split(trim(col("text")), " +")).cast("long"))
      .as[(String, Long, Long)]
  }
}
