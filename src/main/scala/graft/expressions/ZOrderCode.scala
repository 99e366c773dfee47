package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/**
 * `graft_zorder(x, y)` — 64-bit Morton (Z-order) code: interleaves the low
 * 32 bits of two non-negative integers, x on even bit positions, y on odd.
 *
 * Why a layout primitive lives in the engine: at 100 TB the scan you avoid
 * is the cheapest scan there is. Sorting a table by `graft_zorder(a, b)`
 * before writing (repartitionByRange + sortWithinPartitions) gives every
 * parquet file a tight min/max envelope on BOTH a and b, so predicate
 * pushdown on EITHER column prunes files/row-groups — where a linear sort
 * on a leaves b's per-file ranges as wide as the table. This is the same
 * trade Delta/Iceberg expose as OPTIMIZE ZORDER BY, done here as a plain
 * codegen expression so it composes with any writer.
 *
 * The interleave is the standard mask-shift bit spread (public-domain bit
 * twiddling; see also Morton 1966), evaluated via a static helper so the
 * generated code is a single JVM call that JIT inlines.
 */
case class ZOrderCode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(ByteType, ShortType, IntegerType, LongType)
    if (ok.contains(left.dataType) && ok.contains(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder: both keys must be integral, got ${left.dataType}, ${right.dataType}")
    }
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderCodes.interleave(
      x.asInstanceOf[Number].longValue(), y.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.ZOrderCodes.interleave((long) $x, (long) $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}

/** `graft_zorder3(x, y, z)` — 63-bit Morton code of three keys (21 bits
  * each, stride 3): the 3-dimensional layout key for tables queried by
  * three independent range predicates (e.g. user × time × value). Same
  * design notes as [[ZOrderCode]]. */
case class ZOrderCode3(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder3"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(ByteType, ShortType, IntegerType, LongType)
    if (Seq(first, second, third).forall(e => ok.contains(e.dataType))) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder3: all keys must be integral, got " +
          Seq(first, second, third).map(_.dataType).mkString(", "))
    }
  }

  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrderCodes.interleave3(
      x.asInstanceOf[Number].longValue(),
      y.asInstanceOf[Number].longValue(),
      z.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) =>
      s"graft.expressions.ZOrderCodes.interleave3((long) $x, (long) $y, (long) $z)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ZOrderCode3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_hilbert(x, y)` — distance along the order-16 Hilbert curve for
  * two 16-bit keys. Hilbert ordering never takes the long diagonal jumps
  * Morton does at power-of-two boundaries, so per-file envelopes come out
  * tighter on average (ZOrderSpec measures both on the same grid) — the
  * curve behind "liquid"-style clustering. Same usage as [[ZOrderCode]]:
  * sort or range-partition by the code before writing. */
case class HilbertCode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(ByteType, ShortType, IntegerType, LongType)
    if (ok.contains(left.dataType) && ok.contains(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert: both keys must be integral, got ${left.dataType}, ${right.dataType}")
    }
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderCodes.hilbert(
      x.asInstanceOf[Number].longValue(), y.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.ZOrderCodes.hilbert((long) $x, (long) $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertCode =
    copy(left = newLeft, right = newRight)
}

object ZOrderCodes {

  /** Spread the low 32 bits of v onto the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x on even bits, y on odd. Inputs truncate to 32 bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Spread the low 21 bits of v to every third bit position. */
  def spread3(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x001f00000000ffffL
    x = (x | (x << 16)) & 0x001f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** 3-key Morton code, 21 bits per key, stride 3. */
  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)

  /** Distance along the order-16 Hilbert curve (inputs truncate to 16
    * bits) — the classic xy2d walk (Hamilton's convention, per the
    * public-domain formulation): halve the quadrant size each step,
    * accumulate the sub-square's offset, rotate/reflect into it. */
  def hilbert(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xffffL
    var y = yIn & 0xffffL
    var d = 0L
    var s = 0x8000L // half of the 2^16 grid
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve is upright
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
