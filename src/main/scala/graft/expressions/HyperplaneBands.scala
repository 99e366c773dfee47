package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * `graft_lsh_bands(v, seed, numPlanes, bands, dim)` — banded random-
 * hyperplane (sign-bit) LSH codes of an `array<double>` vector, as ONE
 * native codegen'd expression.
 *
 * Returns `array<long>` of length `bands`; band `b` packs the sign bits of
 * planes `[b*r, (b+1)*r)` (r = numPlanes/bands, LSB first). The hyperplanes
 * are unit-free gaussians expanded deterministically from `seed` at plan
 * time, so codes are stable across runs, partitions, and executors.
 *
 * Rationale (BASELINE.md lesson): the `aggregate(zip_with(...))` higher-order
 * formulation evaluates interpreted per element — on the bucketing pass that
 * touches EVERY corpus vector this dominated the r1 ANN queries. This
 * expression emits a single fused loop (numPlanes x dim multiply-adds) inside
 * whole-stage codegen, and one expression node replaces 128 dot + shift
 * columns in the plan.
 */
case class HyperplaneBands(
    child: Expression,
    seed: Long,
    numPlanes: Int,
    bands: Int,
    dim: Int)
    extends UnaryExpression {

  require(numPlanes % bands == 0, "numPlanes must be a multiple of bands")
  require(numPlanes / bands <= 62, "band width must fit a long")

  private val r = numPlanes / bands

  /** Row-major [numPlanes * dim] gaussian hyperplanes from the fixed seed. */
  @transient private lazy val planes: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes * dim)(rnd.nextGaussian())
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def codesOf(v: ArrayData): Array[Long] = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](bands)
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var i = 0
      val off = p * dim
      while (i < n) {
        s += v.getDouble(i) * planes(off + i)
        i += 1
      }
      if (s > 0) out(p / r) |= 1L << (p % r)
      p += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(codesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$bands];
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $s = 0.0;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $v.getDouble($i) * $pl[$off + $i];
         |  }
         |  if ($s > 0) $out[$p / $r] |= 1L << ($p % $r);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bands"
}
