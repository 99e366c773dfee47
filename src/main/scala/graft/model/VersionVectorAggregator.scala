package graft.model

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed aggregator folding event ids into a [[VersionVector]] — the Spark
 * rendering of the reference's consumer-position tracking
 * (flo-event/src/version_vec.rs:70-73 `update_if_greater` applied per
 * consumed event, as in flo-client-lib/src/sync/mod.rs:116-144).
 *
 * Usage: {{{ events.select(VersionVectorAggregator.toColumn).first() }}}
 * or grouped per consumer. Merge is the per-partition max — associative and
 * commutative, so Spark's partial aggregation is safe at any parallelism.
 */
object VersionVectorAggregator
    extends Aggregator[(Int, Long), Map[Int, Long], Map[Int, Long]] {

  override def zero: Map[Int, Long] = Map.empty

  override def reduce(acc: Map[Int, Long], id: (Int, Long)): Map[Int, Long] = {
    val (partition, counter) = id
    if (counter > acc.getOrElse(partition, 0L)) acc.updated(partition, counter) else acc
  }

  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (acc, (p, c)) =>
      if (c > acc.getOrElse(p, 0L) || !acc.contains(p)) acc.updated(p, c) else acc
    }

  override def finish(reduction: Map[Int, Long]): Map[Int, Long] = reduction

  override def bufferEncoder: Encoder[Map[Int, Long]] = Encoders.kryo[Map[Int, Long]]
  override def outputEncoder: Encoder[Map[Int, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()

  /** The aggregator as a typed column over (partition, event_counter) pairs
    * (inherited `toColumn` from [[Aggregator]] is the entry point). */
  def column: TypedColumn[(Int, Long), Map[Int, Long]] = toColumn
}
