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
 * `aggregate(zip_with(...))` evaluates interpreted per element.
 *
 * Overflow contract: every product and the running sum are computed with
 * `Math.multiplyExact`/`addExact`, so a 64-bit overflow FAILS LOUDLY
 * (ArithmeticException) instead of wrapping — matching DuckDB, which
 * raises an out-of-range error on BIGINT multiplication overflow rather
 * than wrapping. A silent wrap would diverge from the oracle AND could
 * silently drop pairs wherever a wrapped-negative sum feeds a `> 0`
 * inclusion predicate (sim_text_knn). The operands in the current callers
 * are bounded by construction (|w| ≤ tf·n_docs·10⁴ keeps 64·maxW² well
 * under Long.MaxValue at bench scale), so the checks never fire there; at
 * a corpus size where they would, the query now aborts with a clear error
 * instead of returning silently wrong results.
 *
 * Input contract (enforced): equal-length arrays with non-nullable
 * elements. Mismatched lengths throw (the old behavior silently truncated
 * to the shorter array); `containsNull=true` element types are rejected at
 * analysis (getLong would read null slots as garbage). Callers that read
 * arrays back from parquet (which re-infers containsNull=true) should
 * densify via transform/coalesce, which restores a non-null element type.
 */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl expects (array<bigint>, array<bigint>) with non-null " +
        s"elements (containsNull=false), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"graft_dotl: array lengths differ ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dotl: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum = java.lang.Math.addExact($sum,
         |    java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dotl"
}
