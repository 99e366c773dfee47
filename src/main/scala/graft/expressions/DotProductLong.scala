package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `graft_dotl(a, b)` — exact integer dot product of two `array<bigint>`
 * columns as a native codegen'd expression (the BIGINT twin of
 * [[DotProduct]]).
 *
 * Exists for the fixed-point similarity paths (hashed-TF-IDF weights, 1e3/
 * 1e4-scaled PQ fixtures) where products overflow a double's 53-bit mantissa
 * so `graft_dot`-on-casts would be inexact, and where the alternative
 * formulations are the measured scale-killers: a sparse (doc, bucket,
 * weight) equi-join materializes |A|·|B|·buckets rows through a hash
 * aggregate (55 M rows at sf0.1 for sim_text_knn), and the higher-order
 * `aggregate(zip_with(...))` evaluates interpreted per element. Long
 * arithmetic wraps on overflow identically in Java and DuckDB (both 64-bit
 * two's complement), and the operands here are bounded by construction
 * (|w| ≤ tf·n_docs·10⁴), so results match the oracle bit-for-bit.
 */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dotl"
}
