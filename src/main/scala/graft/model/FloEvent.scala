package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/**
 * The engine's native record: flo's 5-field event envelope
 * (reference: flo-event/src/lib.rs:252-258 `OwnedFloEvent`; on-disk format
 * flo-server/src/engine/event_stream/partition/segment/persistent_event.rs:20-35).
 *
 *  - `event_counter` + `partition` together form the event id (`FloEventId
 *    { actor, event_counter }`, flo-event/src/lib.rs:67-71). Ordering of ids is
 *    `(event_counter, partition)` lexicographic (lib.rs:164-182).
 *  - `timestamp` is server-assigned at persist time, millisecond precision,
 *    explicitly non-monotonic (lib.rs:51-53).
 *  - `parent_counter`/`parent_partition` flatten the optional parent id; the
 *    all-zero id on the wire means null (flo-protocol/src/client.rs:335-347).
 *  - `namespace` is a `/`-separated UTF-8 path — the consume filter key.
 *  - `data` is an opaque binary payload (may be empty); the server imposes no
 *    schema (flo-protocol/src/client.rs:119-121).
 */
final case class FloEvent(
    event_counter: Long,
    partition: Int,
    timestamp: Timestamp,
    parent_counter: Option[Long],
    parent_partition: Option[Int],
    namespace: String,
    data: Array[Byte])

object FloEvent {
  /** Format an event id as the reference does: `"counter.partition"`
    * (flo-event/src/lib.rs:73-97). */
  def formatId(counter: Long, partition: Int): String = s"$counter.$partition"

  /** Parse `"counter.partition"`; None on malformed input (mirrors FromStr). */
  def parseId(s: String): Option[(Long, Int)] = s.split('.') match {
    case Array(c, p) =>
      try Some((c.toLong, p.toInt))
      catch { case _: NumberFormatException => None }
    case _ => None
  }
}

object FloSchema {
  /** Spark schema of the event envelope; `partition` is also the physical
    * directory-partitioning column of the on-disk log. */
  val eventType: StructType = StructType(Seq(
    StructField("event_counter", LongType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("parent_counter", LongType, nullable = true),
    StructField("parent_partition", IntegerType, nullable = true),
    StructField("namespace", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  /** Schema of a produce request: everything the client supplies
    * (flo-protocol/src/client.rs:105-122 `ProduceEvent` minus op_id). The
    * engine assigns `event_counter` and `timestamp`. */
  val produceType: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("namespace", StringType, nullable = false),
    StructField("parent_counter", LongType, nullable = true),
    StructField("parent_partition", IntegerType, nullable = true),
    StructField("data", BinaryType, nullable = false)))
}

/** A produce request: client-supplied fields of one event. */
final case class ProduceRequest(
    partition: Int,
    namespace: String,
    parent_counter: Option[Long],
    parent_partition: Option[Int],
    data: Array[Byte])
