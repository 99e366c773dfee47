package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `graft_int8_stats(v)` — one-pass int8 scalar-quantization statistics for an
 * `array<double>` embedding, as a native codegen'd expression.
 *
 * Quantization model: per-vector max-abs scaling, `q_i = trunc(x_i * 127 /
 * max_j |x_j|)` (truncation toward zero — Spark's double→long cast and
 * DuckDB's `trunc` agree bit-for-bit, whereas `round` ties break differently
 * for negative halves between the two engines). Returns a fixed 5-slot
 * `array<double>`:
 *
 *   [0] mx         — max absolute component (the scale denominator)
 *   [1] sum_q      — Σ q_i            (integer-valued)
 *   [2] sum_abs_q  — Σ |q_i|          (integer-valued)
 *   [3] nz         — #{i : q_i ≠ 0}   (integer-valued)
 *   [4] max_err    — max_i |x_i − q_i·mx/127| (reconstruction error; the
 *                    dequantize fp op order is fixed: multiply, then divide)
 *
 * A zero or empty vector yields [0, 0, 0, 0, 0] (no division happens). Null
 * ELEMENTS are defined as 0.0 in both the interpreted and codegen paths (the
 * parquet embedding schema carries containsNull=true even though the data has
 * no nulls; leaving the slot undefined would let the two paths diverge —
 * GenericArrayData NPEs on getDouble of a null slot, UnsafeArrayData reads
 * 0.0).
 *
 * Like [[DotProduct]], this exists because the higher-order-function
 * formulation (`aggregate(transform(...))`) evaluates its lambda interpreted
 * per element AND knocks the whole collapsed projection out of whole-stage
 * codegen (BASELINE.md's recorded lesson); this emits one tight Java loop.
 */
case class Int8Stats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_int8_stats expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(if (v.isNullAt(i)) 0.0 else v.getDouble(i))
      if (a > mx) mx = a; i += 1
    }
    var sumQ = 0.0; var sumAbsQ = 0.0; var nz = 0.0; var maxErr = 0.0
    if (mx > 0.0) {
      i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
        val q = (x * 127.0 / mx).toLong
        sumQ += q; sumAbsQ += math.abs(q); if (q != 0L) nz += 1.0
        val err = math.abs(x - q * mx / 127.0)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new GenericArrayData(Array(mx, sumQ, sumAbsQ, nz, maxErr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val a = ctx.freshName("a")
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val err = ctx.freshName("err")
      val sumQ = ctx.freshName("sumQ")
      val sumAbsQ = ctx.freshName("sumAbsQ")
      val nz = ctx.freshName("nz")
      val maxErr = ctx.freshName("maxErr")
      s"""
         |int $n = $v.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs($v.isNullAt($i) ? 0.0 : $v.getDouble($i));
         |  if ($a > $mx) $mx = $a;
         |}
         |double $sumQ = 0.0; double $sumAbsQ = 0.0;
         |double $nz = 0.0; double $maxErr = 0.0;
         |if ($mx > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $v.isNullAt($i) ? 0.0 : $v.getDouble($i);
         |    long $q = (long) ($x * 127.0 / $mx);
         |    $sumQ += $q; $sumAbsQ += java.lang.Math.abs($q);
         |    if ($q != 0L) $nz += 1.0;
         |    double $err = java.lang.Math.abs($x - $q * $mx / 127.0);
         |    if ($err > $maxErr) $maxErr = $err;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new double[]{$mx, $sumQ, $sumAbsQ, $nz, $maxErr});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Stats =
    copy(child = newChild)

  override def prettyName: String = "graft_int8_stats"
}
