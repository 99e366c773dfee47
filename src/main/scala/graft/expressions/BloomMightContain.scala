package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * `graft_bloom_contains(key, bloomBytes)` — membership probe against a
 * pre-built [[org.apache.spark.util.sketch.BloomFilter]], as a native
 * codegen expression so the probe runs inside whole-stage codegen on the
 * fact table's scan side (no UDF boundary, no row materialization).
 *
 * The filter bytes are a plan-time constant: they ride into the generated
 * code as a deserialized reference object, so each executor JVM holds ONE
 * decoded bitset per plan, not one per row or per call.
 *
 * Why this exists when Spark has broadcast-hash joins and injected runtime
 * bloom filters: at ~10 bits/key a Bloom filter is 50–100× smaller than a
 * broadcast hash relation, so a dimension (or semi-join key set) that is
 * far past `autoBroadcastJoinThreshold` can still ship to every task as a
 * compact pre-filter, cutting the fact side BEFORE its shuffle. Spark's own
 * runtime filter injection (SPARK-32268) makes the same trade but only
 * fires on its own heuristics; this expression makes the plan explicit and
 * composable (e.g. [[graft.operators.BloomJoin.prefilteredJoin]]).
 */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains: key must be an integral type, got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfRef.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
