package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/**
 * [[QuotaGuard]] on Spark 4's `transformWithState` arbitrary-state API —
 * the successor to `mapGroupsWithState` (typed per-state-variable storage,
 * TTL support, timers, RocksDB-backed). Semantics are IDENTICAL to the
 * classic implementation (StreamingCorpusSpec pins admission-set equality
 * on the same replay), which is the point: the engine's stateful
 * operators port to the new API without behavior change, and new state
 * features (TTL eviction of idle sources, timers for budget-epoch resets)
 * become available without another rewrite.
 *
 * Requires the RocksDB state store provider
 * (`spark.sql.streaming.stateStore.providerClass`) — transformWithState
 * is not supported on the default HDFS-backed store.
 */
object QuotaGuardV2 {

  /** Per-source admission processor: ONE long of state (tokens used). */
  class AdmitProcessor(quotas: Map[String, Long])
    extends StatefulProcessor[String, (String, Long, Long), QuotaGuard.Admission] {

    @transient private var used: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      used = getHandle.getValueState[Long]("used", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        source: String,
        rows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[QuotaGuard.Admission] = {
      val quota = quotas.getOrElse(source, Long.MaxValue)
      var u = if (used.exists()) used.get() else 0L
      val admitted = rows.toSeq.sortBy(_._2).flatMap { case (_, id, tok) =>
        if (u + tok <= quota) {
          u += tok
          Some(QuotaGuard.Admission(source, id, tok, u))
        } else None
      }
      used.update(u)
      admitted.iterator
    }
  }

  /** Same contract as [[QuotaGuard.admit]], on the new state API. */
  def admit(docs: Dataset[(String, Long, Long)],
      quotas: Map[String, Long]): Dataset[QuotaGuard.Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new AdmitProcessor(quotas),
        TimeMode.None(), OutputMode.Append())
  }
}
