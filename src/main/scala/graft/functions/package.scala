package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.{EventFilter, NamespaceGlob}

/**
 * Column-level functions of the engine. All are plain Catalyst expressions
 * (codegen'd, no Scala UDFs in the hot path): a glob compiles once at plan
 * time into either a literal equality, a `startsWith`, or an anchored
 * `RLike` — each of which Spark codegens and can push toward the scan.
 */
package object functions {

  /**
   * flo's namespace glob predicate (reference semantics:
   * flo-server/src/engine/event_stream/partition/event_reader/namespace.rs).
   *
   * Plan-time compilation picks the cheapest physical form:
   *  - `/&#42;&#42;/&#42;` (match-all, event_reader/mod.rs:27-34) → `true` (filter folds away)
   *  - no metacharacters → `namespace = 'literal'` (namespace.rs:89-93 semantics)
   *  - otherwise → anchored regex via `RLIKE` (compiled once per query)
   *
   * Invalid patterns throw [[graft.model.InvalidNamespaceGlob]] at plan time,
   * mirroring the reference's `InvalidNamespaceGlob` protocol error.
   */
  def ns_glob(namespace: Column, pattern: String): Column =
    EventFilter.parseOrThrow(pattern) match {
      case EventFilter.All => lit(true)
      case EventFilter.Glob(g) =>
        if (NamespaceGlob.isLiteral(pattern)) namespace === lit(pattern)
        else {
          // any literal prefix before the first metacharacter becomes an
          // extra startsWith conjunct: RLIKE is not usable for parquet
          // row-group pruning but StringStartsWith is, so prefix globs
          // (the common namespace-hierarchy case) skip files via min/max
          // stats; the anchored regex keeps exactness
          val prefix = pattern.takeWhile(c => c != '*' && c != '?' && c != '[')
          val rx = namespace.rlike(g.regex)
          if (prefix.nonEmpty) namespace.startsWith(prefix) && rx else rx
        }
    }

  /** Event id rendered as the reference's `"counter.partition"` display form
    * (flo-event/src/lib.rs:73-97). */
  def event_id_str(counter: Column, partition: Column): Column =
    concat_ws(".", counter, partition)

  /** Parse `"counter.partition"` back into a struct(counter, partition);
    * null fields on malformed input. */
  def parse_event_id(id: Column): Column = struct(
    split(id, "\\.").getItem(0).cast("long").as("event_counter"),
    split(id, "\\.").getItem(1).cast("int").as("partition"))

  /** Timestamp → millis-since-epoch (flo stores ms precision,
    * flo-event/src/time.rs:8-23). */
  def ts_to_millis(ts: Column): Column = unix_millis(ts)

  /** Millis-since-epoch → timestamp. */
  def millis_to_ts(ms: Column): Column = timestamp_millis(ms)

  /** Truncate a timestamp to flo's millisecond precision. */
  def truncate_to_millis(ts: Column): Column = timestamp_millis(unix_millis(ts))

  /** The wire encodes a null parent id as the all-zero id
    * (flo-protocol/src/client.rs:335-347): decode zero → null at ingest. */
  def zero_id_to_null(counter: Column): Column =
    when(counter === lit(0L), lit(null)).otherwise(counter)

  /** Payload decode, `StringCodec` equivalent (flo-client-lib/src/codec/mod.rs:57-68):
    * UTF-8 bytes → string. */
  def payload_utf8(data: Column): Column = data.cast("string")

  /** Payload decode, `SerdeJsonCodec` equivalent (codec/serde.rs): extract a
    * JSON field from the (UTF-8 JSON) payload. */
  def payload_json(data: Column, path: String): Column =
    get_json_object(data.cast("string"), path)

  /** Encode a string payload to binary (produce-side `StringCodec`). */
  def payload_encode(s: Column): Column = encode(s, "UTF-8")
}
