package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.PlanShim

/**
 * Shared construction scaffolding for the keyed-merge native operators
 * ([[AsofMergeJoinNode]], [[IntervalMergeJoinNode]]): input validation,
 * strategy/rule registration, fresh-exprId re-aliasing of the right side
 * (a self join must not present one attribute id on both sides of a binary
 * node), and value-output materialization. Each operator wrapper keeps only
 * its semantic differences (which node it builds); a third merge operator
 * should start here instead of copying either wrapper.
 */
private[graft] object KeyedMergeBuild {

  /** Everything a wrapper needs to construct its node. */
  final case class Prepared(
      lPlan: LogicalPlan,
      rPlan: LogicalPlan,
      rMap: Map[String, Attribute],
      valueOutput: Seq[AttributeReference]) {
    def leftAttr(n: String): Attribute = KeyedMergeBuild.attr(lPlan, n, "left")
  }

  private def attr(p: LogicalPlan, n: String, side: String): Attribute =
    p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
      s"$side column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))

  /**
   * Validate and prepare both sides of a keyed merge node.
   *
   * @param op          operator name for error messages
   * @param rightExtra  non-value right columns the node reads (times/bounds)
   * @param typedPairs  (left column, right column) pairs required to share a
   *                    data type — the merge compares them ordinally
   * @param rules       optimizer rules to register alongside the strategy
   */
  def prepare(
      op: String,
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      rightExtra: Seq[String],
      valueCols: Seq[String],
      prefix: String,
      typedPairs: Seq[(String, String)],
      rules: Seq[Rule[LogicalPlan]]): Prepared = {
    require(by.nonEmpty, s"$op needs at least one 'by' key column")
    require(valueCols.nonEmpty, s"$op needs at least one value column")
    // the merge hash-partitions and ordinally compares the by keys on BOTH
    // sides: a type mismatch (int vs bigint key) would hash equal keys to
    // different partitions and mis-read row slots — silently wrong results,
    // so it must be an error here
    by.foreach { k =>
      val (lt, rt) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lt == rt, s"$op 'by' column '$k' must share a type across " +
        s"sides, got $lt vs $rt")
    }
    typedPairs.foreach { case (lc, rc) =>
      val (lt, rt) = (left.schema(lc).dataType, right.schema(rc).dataType)
      require(lt == rt, s"$op columns '$lc'/'$rc' must share a type, " +
        s"got $lt vs $rt")
    }
    val collisions = valueCols.map(prefix + _).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"output columns ${collisions.mkString(", ")} collide with left " +
        "columns; pass a different prefix")

    val spark = left.sparkSession
    PlanShim.withStrategy(spark, GraftStrategies)
    rules.foreach(PlanShim.withOptimizerRule(spark, _))

    val lPlan = PlanShim.analyzed(left)
    val rPlan0 = PlanShim.analyzed(right)
    val needed = (by ++ rightExtra ++ valueCols).distinct
    val aliases = needed.map(n => Alias(attr(rPlan0, n, "right"), n)())
    val rMap = aliases.map(a => a.name -> a.toAttribute).toMap
    val valueOutput = valueCols.map(c =>
      AttributeReference(prefix + c, rMap(c).dataType, nullable = true)())
    Prepared(lPlan, Project(aliases, rPlan0), rMap, valueOutput)
  }
}
