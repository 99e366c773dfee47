package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.Platform

/**
 * Misra–Gries frequent-items sketch as a native Catalyst aggregate:
 * `graft_heavy_hitters(item, k)` keeps at most k counters and returns
 * `array<struct<item, count_lb>>` sorted by count descending — every item
 * whose true frequency exceeds n/(k+1) is GUARANTEED to be present
 * (n = total non-null items in the group), and each reported `count_lb`
 * is a lower bound on the item's true count with error < n/(k+1).
 *
 * The 100 TB story vs `GROUP BY item ORDER BY count DESC LIMIT k`: a web
 * corpus's token vocabulary has billions of distinct keys, so the exact
 * plan shuffles the whole vocabulary and hash-aggregates it. The sketch
 * holds O(k) state per partition, gets map-side partial aggregation for
 * free, and ships at most k counters per partition to one reducer — the
 * vocabulary never shuffles. Downstream, a second exact-count pass over
 * ONLY the candidates (a broadcast semi join, at most k keys) turns the
 * approximate sketch into an exact heavy-hitters answer — see
 * [[graft.operators.CorpusOps.heavyHitters]].
 *
 * Merge is the Agarwal et al. "Mergeable Summaries" (PODS'12) rule: sum
 * counters pairwise, and if more than k survive, subtract the (k+1)-th
 * largest count from all and drop the non-positive — the n/(k+1) error
 * bound is preserved under arbitrary merge trees, which is exactly what
 * Spark's partial/final aggregation needs.
 *
 * Flo context: the reference exposes only exact aggregation over consumed
 * events (reference flo/src/server/mod.rs — consumers fold events
 * themselves); heavy hitters over event namespaces is the first thing an
 * operator asks of a busy log, so the engine provides the sketch natively.
 */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", child.dataType, nullable = false),
      StructField("count_lb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"graft_heavy_hitters: k must be positive, got $k")
    } else if (!RowOrdering.isOrderable(child.dataType)) {
      // orderability doubles as "hashable + has equality" for our map keys,
      // and gives eval a deterministic tiebreak order
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters: item type ${child.dataType} is not orderable")
    } else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(InternalRow.copyValue(v))
    buf
  }

  override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    val it = b2.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b1.addCount(e.getKey, e.getValue) }
    b1.shrinkToK()
    b1
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Any, Long)]
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries += ((e.getKey, e.getValue)) }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ordering.compare(ia, ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.toArray[Any])
  }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array(child.dataType, LongType: DataType))

  override def serialize(buf: MGBuffer): Array[Byte] = {
    // same aliasing discipline as TopKRows.serialize: consume each record's
    // bytes before the next serProj call (UnsafeRow.getBytes may return the
    // projection's shared backing buffer)
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = serProj(new GenericInternalRow(Array(e.getKey, e.getValue: Any))).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val buf = createAggregationBuffer()
    val in = java.nio.ByteBuffer.wrap(bytes)
    var off = 0
    while (off < bytes.length) {
      val len = in.getInt(off)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + off + 4, len)
      buf.addCount(InternalRow.copyValue(row.get(0, child.dataType)), row.getLong(1))
      off += 4 + len
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

/**
 * At most k counters. `offer` is the classic streaming step (amortized O(1):
 * each decrement-all pays for k prior increments); `addCount` + `shrinkToK`
 * implement the mergeable-summaries combine.
 */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[Any, java.lang.Long]()

  def offer(item: Any): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement every counter; drop the ones that reach zero
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def addCount(item: Any, c: Long): Unit = {
    val cur = counts.get(item)
    counts.put(item, if (cur == null) c else cur + c)
  }

  /** If more than k counters survive a merge, subtract the (k+1)-th largest
    * count from all and drop the non-positive (Agarwal et al. PODS'12). */
  def shrinkToK(): Unit = {
    if (counts.size > k) {
      val values = new Array[Long](counts.size)
      var i = 0
      val it0 = counts.values().iterator()
      while (it0.hasNext) { values(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(values)
      val threshold = values(values.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= threshold) it.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
  }
}
