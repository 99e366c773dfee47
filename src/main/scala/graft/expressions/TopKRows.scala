package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.unsafe.Platform

/**
 * Bounded top-k as a native Catalyst aggregate: `graft_topk(sort, value, k)`
 * keeps the k rows with the LARGEST `sort` per group and returns their
 * `value`s sorted descending.
 *
 * The 100 TB story vs the `row_number() <= k` window recipe: an aggregate
 * gets map-side partial aggregation for free, so each input partition
 * contributes at most k rows per group to the shuffle and holds an O(k)
 * heap instead of sorting its whole partition — O(n log k) with no sort
 * buffer, where the window pays a full in-partition sort even with rank
 * pushdown. Every group's state is bounded, so no group can spill.
 *
 * Determinism: `sort` must be a TOTAL order (include a unique tiebreak
 * column, exactly like a row_number window needs one) — with ties at the
 * k boundary the survivor is otherwise partition-order-dependent. Rows
 * with a NULL sort key are dropped (a top-k by an undefined rank has no
 * defined position; matches NULLS LAST desc-ranking semantics for k < n).
 */
case class TopKRows(
    sortExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def left: Expression = sortExpr
  override def right: Expression = valueExpr

  override def dataType: DataType =
    ArrayType(valueExpr.dataType, containsNull = valueExpr.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"graft_topk: k must be positive, got $k")
    } else if (!RowOrdering.isOrderable(sortExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk: sort key type ${sortExpr.dataType} is not orderable")
    } else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(sortExpr.dataType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ordering)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = sortExpr.eval(input)
    if (s != null) {
      // copy: eval results may be views into reused row buffers
      buf.add(InternalRow.copyValue(s), InternalRow.copyValue(valueExpr.eval(input)))
    }
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    val it = b2.heap.iterator()
    while (it.hasNext) { val e = it.next(); b1.add(e(0), e(1)) }
    b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val elems = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    val it = buf.heap.iterator()
    while (it.hasNext) elems += it.next()
    val sorted = elems.sortWith((a, b) => ordering.compare(a(0), b(0)) > 0)
    new GenericArrayData(sorted.map(_(1)).toArray)
  }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array(sortExpr.dataType, valueExpr.dataType))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    // UnsafeRow.getBytes may return the projection's SHARED backing buffer
    // (when sizeInBytes happens to equal the buffer length), so each
    // record's bytes must be consumed before the next serProj call —
    // stream them straight into the output
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = serProj(new GenericInternalRow(Array(e(0), e(1)))).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes) // big-endian, matching DataOutputStream
    var off = 0
    while (off < bytes.length) {
      val len = in.getInt(off)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + off + 4, len)
      buf.add(InternalRow.copyValue(row.get(0, sortExpr.dataType)),
        InternalRow.copyValue(row.get(1, valueExpr.dataType)))
      off += 4 + len
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKRows =
    copy(sortExpr = newLeft, valueExpr = newRight)
}

/** Min-heap of (sort, value) pairs capped at k: the head is the weakest
  * kept row, evicted when a stronger one arrives. O(log k) per insert,
  * O(k) memory regardless of group size. */
final class TopKBuffer(val k: Int, ord: Ordering[Any]) {
  val heap = new java.util.PriorityQueue[Array[Any]](
    math.max(k, 1),
    new java.util.Comparator[Array[Any]] {
      override def compare(a: Array[Any], b: Array[Any]): Int =
        ord.compare(a(0), b(0))
    })

  def add(sort: Any, value: Any): Unit = {
    if (heap.size < k) {
      heap.add(Array(sort, value))
    } else if (ord.compare(sort, heap.peek()(0)) > 0) {
      heap.poll()
      heap.add(Array(sort, value))
    }
  }
}
