package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * A consumer's position: per-partition highest-consumed event counter
 * (reference: flo-event/src/version_vec.rs:7 `VersionVector(HashMap<ActorId,
 * EventCounter>)`).
 *
 * Consumption starts EXCLUSIVE after each entry's counter, and partitions
 * absent from the vector are not read at all (flo-client-lib/src/sync/mod.rs:124-130,
 * flo-server/src/engine/connection_handler/consumer/mod.rs:91-107).
 */
final case class VersionVector(entries: Map[Int, Long]) {

  /** Strictly-increasing insert; error on ANY regress including 0 <= 0,
    * matching version_vec.rs:47-55 and its tests. Use `set`/`zero` for the
    * explicit read-from-start position. */
  def update(partition: Int, counter: Long): Either[String, VersionVector] = {
    val current = get(partition)
    if (counter <= current)
      Left(s"Cannot update partition $partition to counter $counter (current: $current)")
    else Right(set(partition, counter))
  }

  /** Unconditional set (version_vec.rs:58-60). */
  def set(partition: Int, counter: Long): VersionVector =
    VersionVector(entries.updated(partition, counter))

  def contains(partition: Int): Boolean = entries.contains(partition)

  /** Keep the max of the existing and given counter (version_vec.rs:70-73). */
  def updateIfGreater(partition: Int, counter: Long): VersionVector =
    if (counter > get(partition)) set(partition, counter) else this

  /** 0 when absent (version_vec.rs:76-78). */
  def get(partition: Int): Long = entries.getOrElse(partition, 0L)

  /** Sorted entries (version_vec.rs:81-87). */
  def snapshot: Seq[(Int, Long)] = entries.toSeq.sortBy(_._1)

  def min: Long = if (entries.isEmpty) 0L else entries.values.min
  def max: Long = if (entries.isEmpty) 0L else entries.values.max

  /** Union of partitions, per-partition max counter. A 0-counter entry is
    * preserved — presence means "read this partition from the start", which
    * differs from absence (partition not read at all). */
  def merge(other: VersionVector): VersionVector =
    other.entries.foldLeft(this) { case (vv, (p, c)) =>
      if (!vv.contains(p)) vv.set(p, c) else vv.updateIfGreater(p, c)
    }

  /**
   * The consume-start predicate: `OR_{(p,c) ∈ vv} (partition = p AND counter > c)`.
   * Encodes both rules at once — exclusive start per partition, and absent
   * partitions read nothing (an empty vector reads nothing: `false`).
   * Catalyst pushes the disjunction into the scan (partition pruning on
   * `partition`, min/max row-group pruning on `counter`).
   */
  def toPredicate(partition: Column, counter: Column): Column =
    snapshot
      .map { case (p, c) => partition === lit(p) && counter > lit(c) }
      .reduceOption(_ || _)
      .getOrElse(lit(false))
}

object VersionVector {
  val empty: VersionVector = VersionVector(Map.empty[Int, Long])
  def apply(entries: (Int, Long)*): VersionVector = VersionVector(entries.toMap)
  /** Read-from-the-beginning vector for the given partitions (counter 0,
    * exclusive ⇒ starts at 1). */
  def zero(partitions: Seq[Int]): VersionVector =
    VersionVector(partitions.map(_ -> 0L).toMap)
}
