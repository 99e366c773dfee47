package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `graft_unit(v)` — unit-normalize an `array<double>` vector as a native
 * codegen'd expression.
 *
 * Replaces `transform(v, x -> x / sqrt(graft_dot(v, v)))`: Catalyst
 * higher-order lambdas are CodegenFallback, and one in a projection knocks
 * the WHOLE collapsed projection out of whole-stage codegen — including
 * every codegen-capable expression sharing it (measured on the LSH
 * bucketing stage; DotProductSpec pins the codegen'd plan shape).
 *
 * FP sequence matches the lambda form EXACTLY — norm = sqrt of the
 * sequential left-to-right self-dot, then one IEEE divide per element — so
 * oracle-checked results are bit-identical, including the degenerate
 * cases: a zero vector divides by 0.0 and yields NaN elements (NaN
 * compares largest in both Spark and DuckDB, preserving the baseline's
 * ordering/threshold behavior), and a null element stays null in the
 * output (its slot reads as 0.0 for the norm, like the lambda's
 * `graft_dot` self-product did).
 */
case class UnitVector(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unit expects array<double>, got ${other.simpleString}")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elementsNullable)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val nullable = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!nullable || !v.isNullAt(i)) { val x = v.getDouble(i); s += x * x }
      i += 1
    }
    val norm = math.sqrt(s)
    if (!nullable) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null else Double.box(v.getDouble(i) / norm)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      if (!elementsNullable)
        s"""
           |int $n = $v.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $v.getDouble($i);
           |  $s += $x * $x;
           |}
           |double $norm = java.lang.Math.sqrt($s);
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $v.getDouble($i) / $norm;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = $v.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$v.isNullAt($i)) {
           |    double $x = $v.getDouble($i);
           |    $s += $x * $x;
           |  }
           |}
           |double $norm = java.lang.Math.sqrt($s);
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $v.isNullAt($i) ? null : (Object) ($v.getDouble($i) / $norm);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)

  override def prettyName: String = "graft_unit"
}
