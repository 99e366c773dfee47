package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/**
 * AS-OF join as a NATIVE Catalyst operator — the whole-operator extension
 * path (custom `LogicalPlan` + `Strategy` + `SparkPlan`), complementing the
 * declarative union+window recipe in [[graft.operators.AsofJoin.asof]].
 *
 * Physical shape: both sides hash-partitioned on the `by` keys (Catalyst's
 * EnsureRequirements inserts the exchanges and in-partition sorts from the
 * declared requirements, and AQE coalesces both sides consistently — the
 * exact machinery shuffled joins use), then ONE streaming merge pass per
 * partition: no union materialization, no null struct legs, no window sort
 * buffer — each partition holds O(1) state (the current key's last-seen
 * right values). At 100 TB both sides shuffle once, carrying only their own
 * columns; skew follows the same rules as any keyed join.
 *
 * Semantics are identical to [[graft.operators.AsofJoin.asof]] (the spec
 * pins the two paths equal on randomized inputs): for each left row, the
 * most recent right row with `rightTime <= leftTime` on the same `by` keys;
 * equal-time right rows are eligible; among equal times the last by
 * `rightOrder` ascending wins; NULL right times match nothing; NULL left
 * times match nothing; NULL `by` keys group together (window-partitioning
 * semantics, not join-equality semantics).
 */
case class AsofMergeJoinNode(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightOrder: Seq[Attribute],
    valueOutput: Seq[Attribute],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ valueOutput

  /** valueOutput is born here, not read from children — without this the
    * analyzer's missing-input check rejects the plan. */
  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/**
 * Column pruning THROUGH the custom node: Catalyst's built-in
 * `ColumnPruning` cannot see into unknown plan nodes, so without this rule
 * every left column rides the shuffle even when the query projects a
 * subset away right above the join (`q_asof_native` drops the join time
 * from its final select, for example). The rule pushes the projection's
 * column set into the left child, keeping the join's own `by`/time
 * attributes — at 100 TB, unread columns dropped before an exchange are
 * the cheapest bytes in the plan. Injected via
 * `SparkSessionExtensions.injectOptimizerRule` (plugin path) or
 * `PlanShim.withOptimizerRule` (runtime path); a fixed point is reached
 * after one application (the second pass finds nothing to drop).
 */
object PruneAsofMergeJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsofMergeJoinNode) =>
      prune(j, p.references).map(n => p.copy(child = n)).getOrElse(p)
    case p @ Project(_, f @ Filter(_, j: AsofMergeJoinNode)) =>
      prune(j, p.references ++ f.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)
  }

  /** Unread left columns and unread (rightValue, output) pairs dropped —
    * the right child narrows to by/time/order + surviving values (same
    * value-pruning shape as [[PruneIntervalMergeJoin]]); None when stable. */
  private def prune(
      j: AsofMergeJoinNode, refs: AttributeSet): Option[LogicalPlan] = {
    val keepLeft = AttributeSet(j.leftBy :+ j.leftTime) ++ refs
    val keptLeft = j.left.output.filter(keepLeft.contains)
    val keptPairs = j.rightValues.zip(j.valueOutput)
      .filter { case (_, out) => refs.contains(out) }
    val prunedVals = keptPairs.length < j.valueOutput.length
    if (keptLeft.length == j.left.output.length && !prunedVals) None
    else {
      val (rv, vo) = keptPairs.unzip
      val keepRight =
        AttributeSet((j.rightBy :+ j.rightTime) ++ j.rightOrder ++ rv)
      val keptRight = j.right.output.filter(keepRight.contains)
      Some(j.copy(
        left = if (keptLeft.length == j.left.output.length) j.left
               else Project(keptLeft, j.left),
        right = if (!prunedVals) j.right else Project(keptRight, j.right),
        rightValues = rv, valueOutput = vo))
    }
  }
}

/** Plans the graft native nodes ([[AsofMergeJoinNode]],
  * [[IntervalMergeJoinNode]]) — injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (plugin path) or
  * `PlanShim.withStrategy` (runtime path). */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofMergeJoinNode =>
      AsofMergeJoinExec(n.leftBy, n.rightBy, n.leftTime, n.rightTime,
        n.rightValues, n.rightOrder, n.valueOutput,
        planLater(n.left), planLater(n.right)) :: Nil
    case n: IntervalMergeJoinNode =>
      IntervalMergeJoinExec(n.leftBy, n.rightBy, n.point, n.lo, n.hi,
        n.rightValues, n.valueOutput, n.leftOuter,
        planLater(n.left), planLater(n.right)) :: Nil
    case n: IntervalOverlapJoinNode =>
      IntervalOverlapJoinExec(n.leftBy, n.rightBy, n.lLo, n.lHi, n.rLo, n.rHi,
        n.rightValues, n.valueOutput,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/**
 * One-pass merge join over co-partitioned, co-sorted children.
 *
 * Required layout (enforced by EnsureRequirements from the declarations
 * below): both children clustered on the `by` keys; left sorted by
 * (by, leftTime), right by (by, rightTime, rightOrder), all ascending
 * nulls-first. The merge then walks both iterators once: right rows behind
 * the current left key are discarded, right rows at the key with
 * `time <= leftTime` fold into a single "last seen" value buffer (ascending
 * order makes the fold's survivor the correct winner), and each left row
 * emits with the buffer or nulls. Nulls-first sorting gives the null-time
 * semantics for free: null-time left rows surface before any right row is
 * eligible, and null-time right rows are skipped explicitly.
 */
case class AsofMergeJoinExec(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightOrder: Seq[Attribute],
    valueOutput: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueOutput

  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightBy ++ (rightTime +: rightOrder)).map(a => SortOrder(a, Ascending)))

  // one left row out per left row in, in left's order, in left's partitions
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    // locals so the task closure doesn't capture the plan node
    val leftOut = left.output
    val rightOut = right.output
    val lByE = leftBy; val rByE = rightBy
    val lTimeE = leftTime; val rTimeE = rightTime
    val rValE = rightValues
    val keyTypes = leftBy.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lByE, leftOut)
      val rKey = UnsafeProjection.create(rByE, rightOut)
      val lTime = UnsafeProjection.create(Seq(lTimeE), leftOut)
      val rTime = UnsafeProjection.create(Seq(rTimeE), rightOut)
      val rVal = UnsafeProjection.create(rValE, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(rValE.length)

      new Iterator[InternalRow] {
        // lookahead: the last row an iterator returned stays valid until
        // the next next() call, so no defensive copy is needed here
        private var rightRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var curKey: UnsafeRow = null   // group the lastSeen belongs to
        private var lastSeen: UnsafeRow = null // copied value projection

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val leftRow = lIter.next()
          val lk = lKey(leftRow)
          if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
            lastSeen = null
            curKey = lk.copy()
          }
          var done = false
          while (!done && rightRow != null) {
            val c = keyOrd.compare(rKey(rightRow), lk)
            if (c < 0) advance() // right group already passed by the left
            else if (c > 0) done = true
            else {
              val rt = rTime(rightRow)
              if (rt.isNullAt(0)) advance() // undefined time matches nothing
              else {
                val lt = lTime(leftRow)
                if (!lt.isNullAt(0) && timeOrd.compare(rt, lt) <= 0) {
                  lastSeen = rVal(rightRow).copy()
                  advance()
                } else done = true // future right rows stay for later lefts
              }
            }
          }
          numOut += 1
          project(joined(leftRow, if (lastSeen != null) lastSeen else nullVals))
        }

        private def advance(): Unit =
          rightRow = if (rIter.hasNext) rIter.next() else null
      }
    }
  }
}
