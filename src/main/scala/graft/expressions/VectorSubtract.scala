package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `graft_sub(a, b)` — element-wise `array<double>` subtraction as a native
 * codegen'd expression. Exists for the residual computation of the
 * IVF-PQ index build ([[graft.operators.AnnIndex]]): `uv - centroid`
 * runs over the whole corpus, and the lambda form
 * `zip_with(a, b, (x, y) -> x - y)` is CodegenFallback — one such lambda
 * knocks the entire collapsed projection (including `graft_unit` /
 * `graft_dot` sharing it) out of whole-stage codegen (same measurement
 * that motivated [[UnitVector]]).
 *
 * Length mismatch truncates to the shorter input (zip_with would pad with
 * nulls; vectors in one corpus share a dimension, so neither case should
 * fire — truncation keeps the kernel branch-light). Null elements
 * propagate: a null on either side yields a null slot.
 */
case class VectorSubtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sub expects (array<double>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, a), ArrayType(_, b)) => a || b
    case _ => true
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = elementsNullable)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    if (!elementsNullable) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = va.getDouble(i) - vb.getDouble(i); i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (va.isNullAt(i) || vb.isNullAt(i)) null
          else Double.box(va.getDouble(i) - vb.getDouble(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (!elementsNullable)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $a.getDouble($i) - $b.getDouble($i);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = ($a.isNullAt($i) || $b.isNullAt($i)) ? null
           |    : (Object) ($a.getDouble($i) - $b.getDouble($i));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSubtract =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sub"
}
