package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/**
 * Keyed interval-containment join as a NATIVE Catalyst operator — the second
 * whole-operator extension instance after [[AsofMergeJoinNode]], for the
 * range shape [[graft.operators.RangeJoin.pointInInterval]] covers
 * declaratively: each left row `(key, point)` pairs with every right row
 * `(key, lo, hi)` whose `[lo, hi)` contains the point (inner-join
 * semantics — left rows with no containing interval emit nothing).
 *
 * Physical shape: both sides hash-partition on the `by` keys (Catalyst's
 * EnsureRequirements inserts exchanges and in-partition sorts; AQE coalesces
 * both sides consistently), then ONE forward sweep per partition — left
 * walks points in ascending order, right intervals enter an active set when
 * `lo <= point` and leave permanently once `hi <= point` (points only grow
 * within a key, so an expired interval can never match again). Per-partition
 * state is the ACTIVE set only: O(max concurrent interval overlap), not
 * O(intervals) — the sweep-line bound, the same reason the bucket recipe
 * bounds candidates by bands-per-bucket. Versus that declarative recipe:
 * no bucket-width tuning knob, no interval-row explosion to one row per
 * covered bucket, and both sides can be corpus-sized (no broadcast anywhere;
 * skew follows the same rules as any keyed join).
 *
 * Null semantics (pinned in IntervalMergeJoinSpec): a null point matches
 * nothing; an interval with null `lo` or null `hi` matches nothing; null
 * `by` keys group together (window-partitioning semantics, matching the
 * as-of node). `lo`/`hi`/point must share a data type.
 *
 * `leftOuter = true` switches to left-outer semantics: every left row
 * survives at least once, with null value columns when no interval
 * contains its point (including null-point rows) — the as-of operator's
 * enrichment contract, for intervals.
 */
case class IntervalMergeJoinNode(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    point: Attribute,
    lo: Attribute,
    hi: Attribute,
    rightValues: Seq[Attribute],
    valueOutput: Seq[Attribute],
    leftOuter: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ valueOutput

  /** valueOutput is born here, not read from children — without this the
    * analyzer's missing-input check rejects the plan. */
  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/**
 * Column pruning THROUGH the interval node, twin of [[PruneAsofMergeJoin]]:
 * pushes a parent projection's column set into BOTH children so unread
 * columns drop BEFORE the exchanges — at 100 TB, columns pruned ahead of a
 * shuffle are the cheapest bytes in the plan. Left side: unread left
 * columns (keeping the join's own `by`/point attributes). Right side:
 * unread (rightValues, valueOutput) pairs drop from the node itself, which
 * narrows the right child to `by`/lo/hi plus the surviving values — this is
 * what keeps [[graft.operators.RangeJoin.intervalOverlapMerge]]'s swapped
 * pass (which rides EVERY left column as a value) from shuffling the full
 * left width when the caller projects a few columns. Matches a parent
 * `Project` directly above the node or above an intervening `Filter` (the
 * overlap join's strictness filter). Reaches its fixed point in one
 * application per shape.
 */
object PruneIntervalMergeJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: IntervalMergeJoinNode) =>
      prune(j, p.references).map(n => p.copy(child = n)).getOrElse(p)
    case p @ Project(_, f @ Filter(_, j: IntervalMergeJoinNode)) =>
      prune(j, p.references ++ f.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)
  }

  /** The node with unread left columns and unread value pairs dropped, or
    * None when nothing prunes (so the caller keeps the plan `eq`-stable
    * and the rule terminates). */
  private def prune(
      j: IntervalMergeJoinNode, refs: AttributeSet): Option[LogicalPlan] = {
    val keepLeft = AttributeSet(j.leftBy :+ j.point) ++ refs
    val keptLeft = j.left.output.filter(keepLeft.contains)
    val keptPairs = j.rightValues.zip(j.valueOutput)
      .filter { case (_, out) => refs.contains(out) }
    val prunedVals = keptPairs.length < j.valueOutput.length
    if (keptLeft.length == j.left.output.length && !prunedVals) None
    else {
      val (rv, vo) = keptPairs.unzip
      val keepRight = AttributeSet((j.rightBy :+ j.lo :+ j.hi) ++ rv)
      val keptRight = j.right.output.filter(keepRight.contains)
      Some(j.copy(
        left = if (keptLeft.length == j.left.output.length) j.left
               else Project(keptLeft, j.left),
        right = if (!prunedVals) j.right else Project(keptRight, j.right),
        rightValues = rv, valueOutput = vo))
    }
  }
}

/**
 * One-pass sweep join over co-partitioned, co-sorted children.
 *
 * Required layout (enforced by EnsureRequirements from the declarations
 * below): both children clustered on the `by` keys; left sorted by
 * (by, point), right by (by, lo), ascending nulls-first. Nulls-first gives
 * the null semantics almost for free: null-point left rows surface before
 * any interval is admitted (explicitly skipped), null-`lo` intervals sort
 * first in their group (explicitly skipped), null-`hi` intervals are
 * rejected at admission.
 */
case class IntervalMergeJoinExec(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    point: Attribute,
    lo: Attribute,
    hi: Attribute,
    rightValues: Seq[Attribute],
    valueOutput: Seq[Attribute],
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueOutput

  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "maxActiveIntervals" -> SQLMetrics.createMetric(sparkContext,
      "max concurrent active intervals (summed across tasks)"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ point).map(a => SortOrder(a, Ascending)),
    (rightBy :+ lo).map(a => SortOrder(a, Ascending)))

  // output rows ride in the left row's partition, in left's order (several
  // consecutive rows per left row) — both declarations remain valid
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val maxActive = longMetric("maxActiveIntervals")
    // locals so the task closure doesn't capture the plan node
    val leftOut = left.output
    val rightOut = right.output
    val lByE = leftBy; val rByE = rightBy
    val pointE = point; val loE = lo; val hiE = hi
    val rValE = rightValues
    val keyTypes = leftBy.map(_.dataType)
    val ptType = point.dataType
    val outAttrs = output
    val outer = leftOuter
    val nValues = valueOutput.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lByE, leftOut)
      val rKey = UnsafeProjection.create(rByE, rightOut)
      val lPt = UnsafeProjection.create(Seq(pointE), leftOut)
      val rLo = UnsafeProjection.create(Seq(loE), rightOut)
      val rHi = UnsafeProjection.create(Seq(hiE), rightOut)
      val rVal = UnsafeProjection.create(rValE, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ptOrd = RowOrdering.createNaturalAscendingOrdering(Seq(ptType))
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead: the last row an iterator returned stays valid until the
        // next next() call; admitted intervals are copied into the active set
        private var rightRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var curKey: UnsafeRow = null
        // (hi, values) per admitted not-yet-expired interval, admission order
        private val active = new ArrayBuffer[(UnsafeRow, UnsafeRow)]()
        private var leftRow: InternalRow = null
        private var nMatches = 0 // prefix of `active` matching the current left row
        private var mIdx = 0
        private var emitOuter = false // left-outer: current left row unmatched
        private val nullValues: InternalRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nValues)

        override def hasNext: Boolean = {
          while (!emitOuter && mIdx >= nMatches && lIter.hasNext) {
            leftRow = lIter.next()
            mIdx = 0
            nMatches = 0
            val lk = lKey(leftRow)
            if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
              active.clear()
              curKey = lk.copy()
            }
            val lp = lPt(leftRow)
            if (!lp.isNullAt(0)) {
              // admit intervals of this key whose lo has been reached
              var done = false
              while (!done && rightRow != null) {
                val c = keyOrd.compare(rKey(rightRow), lk)
                if (c < 0) advance() // interval group already passed by the left
                else if (c > 0) done = true
                else {
                  val rl = rLo(rightRow)
                  if (rl.isNullAt(0)) advance() // undefined lo matches nothing
                  else if (ptOrd.compare(rl, lp) <= 0) {
                    val rh = rHi(rightRow)
                    // admit only if it can still match: hi > point (covers
                    // null/empty/already-expired intervals in one check)
                    if (!rh.isNullAt(0) && ptOrd.compare(lp, rh) < 0)
                      active += ((rh.copy(), rVal(rightRow).copy()))
                    advance()
                  } else done = true // future intervals wait for later points
                }
              }
              // expire intervals the point has passed; points only grow
              // within a key, so expired intervals never match again
              var i = 0
              var kept = 0
              while (i < active.length) {
                if (ptOrd.compare(lp, active(i)._1) < 0) {
                  if (kept != i) active(kept) = active(i)
                  kept += 1
                }
                i += 1
              }
              active.dropRightInPlace(active.length - kept)
              // every survivor has lo <= point < hi: all match
              nMatches = kept
              if (kept > maxActive.value) maxActive.set(kept)
            }
            // left-outer: an unmatched left row (no containing interval, or
            // a null point) still surfaces once, with null values
            if (outer && nMatches == 0) emitOuter = true
          }
          emitOuter || mIdx < nMatches
        }

        override def next(): InternalRow = {
          numOut += 1
          if (emitOuter) {
            emitOuter = false
            project(joined(leftRow, nullValues))
          } else {
            val v = active(mIdx)._2
            mIdx += 1
            project(joined(leftRow, v))
          }
        }

        private def advance(): Unit =
          rightRow = if (rIter.hasNext) rIter.next() else null
      }
    }
  }
}
