package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/**
 * The one compilation unit that lives inside Spark's `org.apache.spark.sql`
 * namespace: `Dataset.ofRows` — the only way to turn a custom
 * [[LogicalPlan]] node into a user-facing DataFrame — is `private[sql]`, so
 * a library shipping its own plan nodes needs a shim here (the standard
 * pattern across public Spark extension libraries; everything else in this
 * repo stays in the `graft` namespace and uses public APIs).
 */
object PlanShim {

  /** Wrap an (already analyzed or analyzable) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a LIVE session — the runtime
    * twin of `SparkSessionExtensions.injectPlannerStrategy`, for sessions
    * the caller didn't build (same split as `GraftExtensions.register`). */
  def withStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = strategy +: exp.extraStrategies
    }
  }

  /** Idempotently add an optimizer rule to a LIVE session — the runtime
    * twin of `SparkSessionExtensions.injectOptimizerRule` (the rule lands
    * in the optimizer's "User Provided Optimizers" batch). */
  def withOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule)) {
      exp.extraOptimizations = rule +: exp.extraOptimizations
    }
  }
}
