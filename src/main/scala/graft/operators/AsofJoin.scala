package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * AS-OF join as a reusable library operator (an operator Spark lacks
 * natively), promoted out of the query catalog so a user can run it on their
 * own table pairs the way the reference exposes its client operations as an
 * embeddable API surface (flo-server/tests/embedded_tests.rs:168-200 is the
 * reference's pattern of operator-as-API; the semantics here are the
 * standard time-series as-of, not a reference feature).
 *
 * Scale shape — the union+window linear merge: tag both sides, UNION them,
 * shuffle ONCE on the `by` keys, and take the running last-non-null right
 * row per key. No per-row range probe (a correlated max-time<=t subquery
 * rescans the right side per left row), no broadcast requirement on either
 * side (both can be corpus-sized), no theta-join candidate explosion.
 */
object AsofJoin {

  /**
   * For each `left` row, attach the most recent `right` row whose
   * `rightTime` is at-or-before the row's `leftTime`, matching on the `by`
   * key columns (same names on both sides). Returns every `left` column
   * unchanged plus, for each name in `valueCols`, a `prefix`-ed column
   * holding the matched right row's value (null when no right row is
   * at-or-before).
   *
   * Ties: a right row exactly AT `leftTime` is eligible; among right rows
   * with equal time, the last by `rightOrder` ascending wins — pass the
   * right table's unique id to pin a deterministic winner (with `rightOrder`
   * empty and duplicate right times, the winner is plan-dependent).
   *
   * NULL times follow SQL comparison semantics: a right row with NULL
   * `rightTime` matches nothing (it is dropped — without that it would sort
   * NULLS FIRST and read as "before everything"), and a left row with NULL
   * `leftTime` gets a null match.
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String],
      valueCols: Seq[String],
      rightOrder: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    require(by.nonEmpty, "asof join needs at least one 'by' key column")
    require(valueCols.nonEmpty, "asof join needs at least one right value column")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"time columns must share a type, got ${left.schema(leftTime).dataType} " +
        s"vs ${right.schema(rightTime).dataType}")
    val reserved = left.columns.filter(c => c.startsWith("__"))
    require(reserved.isEmpty,
      s"left columns ${reserved.mkString(", ")} collide with the operator's " +
        "internal __-prefixed union columns; rename them first")

    val byCols = by.map(col)
    // both union legs carry: by..., __t, __side, rightOrder..., __lrow, __v —
    // the missing side of each struct/order column rides as a typed null
    val lRowType = StructType(left.schema.fields)
    val vType = StructType(valueCols.map(c => right.schema(c)))
    val oTypes = rightOrder.map(c => right.schema(c).dataType)

    val rightLeg = right.where(col(rightTime).isNotNull).select(
      byCols ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"))
        ++ rightOrder.zipWithIndex.map { case (c, i) => col(c).as(s"__o$i") }
        ++ Seq(lit(null).cast(lRowType).as("__lrow"),
          struct(valueCols.map(col): _*).as("__v")): _*)
    val leftLeg = left.select(
      byCols ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"))
        ++ oTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__o$i") }
        ++ Seq(struct(left.columns.map(col): _*).as("__lrow"),
          lit(null).cast(vType).as("__v")): _*)

    // right rows sort before left rows at the same instant (side 0 < 1), so
    // "at-or-before" includes same-time right rows; the running last() only
    // ever reads right legs (left legs carry a null __v, skipped by
    // ignoreNulls)
    val order: Seq[Column] =
      col("__t") +: col("__side") +: rightOrder.indices.map(i => col(s"__o$i"))
    val w = Window.partitionBy(byCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightLeg.unionAll(leftLeg)
      .withColumn("__asof",
        last(when(col("__side") === 0, col("__v")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +:
        valueCols.map(c => col(s"__asof.$c").as(prefix + c)): _*)
  }

  /**
   * The same as-of join through the NATIVE Catalyst operator
   * ([[graft.plans.AsofMergeJoinNode]] / [[graft.plans.AsofMergeJoinExec]]):
   * identical semantics and signature to [[asof]] (AsofMergeJoinSpec pins
   * the two paths equal on randomized inputs), different physical plan —
   * a one-pass co-partitioned merge with O(1) per-partition state instead
   * of a union + window sort. Prefer this when the union legs' widened
   * null-struct columns or the window buffer show up in the profile; prefer
   * [[asof]] when plan portability matters (it is pure DataFrame API).
   *
   * Registers the planner strategy on the DataFrame's session (idempotent).
   */
  def asofMerge(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String],
      valueCols: Seq[String],
      rightOrder: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.graftshim.PlanShim
    import graft.plans.{AsofMergeJoinNode, KeyedMergeBuild}

    val b = KeyedMergeBuild.prepare("asof join", left, right, by,
      rightExtra = rightTime +: rightOrder, valueCols, prefix,
      typedPairs = Seq(leftTime -> rightTime),
      rules = Seq(graft.plans.PruneAsofMergeJoin))
    PlanShim.ofRows(left.sparkSession, AsofMergeJoinNode(
      by.map(b.leftAttr), by.map(b.rMap),
      b.leftAttr(leftTime), b.rMap(rightTime),
      valueCols.map(b.rMap), rightOrder.map(b.rMap),
      b.valueOutput, b.lPlan, b.rPlan))
  }
}
