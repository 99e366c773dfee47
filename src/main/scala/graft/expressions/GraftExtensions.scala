package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Engine extensions: registers the custom expressions with Catalyst.
 *
 * Two entry points:
 *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at session
 *    build time (the standard plugin path), or
 *  - `GraftExtensions.register(spark)` at runtime (idempotent) for sessions
 *    the caller didn't build — used by the query catalog.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFunction)
}

object GraftExtensions {

  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_dot expects exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** Runtime registration into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotFunction._1)) {
      registry.registerFunction(dotFunction._1, dotFunction._2, dotFunction._3)
    }
  }
}
