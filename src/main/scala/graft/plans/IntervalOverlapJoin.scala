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
 * Keyed interval-OVERLAP join as a NATIVE Catalyst operator — the third
 * whole-operator extension after [[AsofMergeJoinNode]] (as-of) and
 * [[IntervalMergeJoinNode]] (point-in-interval): each left row's
 * `[lLo, lHi)` pairs with every right row sharing its `by` keys whose
 * `[rLo, rHi)` overlaps it (`lLo < rHi && rLo < lHi`), one output row per
 * overlapping pair.
 *
 * Versus the two-sweep decomposition
 * ([[graft.operators.RangeJoin.intervalOverlapTwoPass]] — split the
 * predicate on which interval starts later, run the containment sweep
 * twice, union): ONE pass instead of two, so each side shuffles and sorts
 * ONCE instead of twice and there is no union of two exchanges to
 * re-coalesce. Physical shape: both sides hash-partition on the `by` keys
 * and sort by (by, start); one merged plane sweep walks both streams in
 * start order, keeping an active set PER SIDE of the intervals whose end
 * hasn't been passed — O(max concurrent overlap) state per partition,
 * never a per-key cross product. Each overlapping pair is emitted exactly
 * once, by whichever interval starts later (ties resolve to the left
 * stream, so the right event sees the tied left interval already active).
 *
 * Null semantics match the two-pass recipe and the sibling nodes
 * (IntervalOverlapJoinSpec pins them): an interval with a null endpoint or
 * `lo >= hi` (empty) matches nothing on either side; null `by` keys group
 * together. All four endpoint columns must share a data type.
 */
case class IntervalOverlapJoinNode(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    lLo: Attribute,
    lHi: Attribute,
    rLo: Attribute,
    rHi: Attribute,
    rightValues: Seq[Attribute],
    valueOutput: Seq[Attribute],
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
 * Column pruning THROUGH the overlap node, twin of
 * [[PruneIntervalMergeJoin]]: a parent projection's column set pushes into
 * both children so unread columns drop BEFORE the exchanges. Left keeps its
 * `by`/endpoint attributes plus referenced columns; unread (rightValues,
 * valueOutput) pairs drop from the node, narrowing the right child to
 * `by`/endpoints plus surviving values.
 */
object PruneIntervalOverlapJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: IntervalOverlapJoinNode) =>
      prune(j, p.references).map(n => p.copy(child = n)).getOrElse(p)
    case p @ Project(_, f @ Filter(_, j: IntervalOverlapJoinNode)) =>
      prune(j, p.references ++ f.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)
  }

  private def prune(
      j: IntervalOverlapJoinNode, refs: AttributeSet): Option[LogicalPlan] = {
    val keepLeft = AttributeSet(j.leftBy ++ Seq(j.lLo, j.lHi)) ++ refs
    val keptLeft = j.left.output.filter(keepLeft.contains)
    val keptPairs = j.rightValues.zip(j.valueOutput)
      .filter { case (_, out) => refs.contains(out) }
    val prunedVals = keptPairs.length < j.valueOutput.length
    if (keptLeft.length == j.left.output.length && !prunedVals) None
    else {
      val (rv, vo) = keptPairs.unzip
      val keepRight = AttributeSet((j.rightBy :+ j.rLo :+ j.rHi) ++ rv)
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
 * One-pass merged plane sweep over co-partitioned, per-side start-sorted
 * children (EnsureRequirements inserts the exchanges and sorts from the
 * declarations below; nulls-first ascending surfaces null-start intervals
 * before any live interval is admitted, where they are skipped).
 *
 * Sweep invariant: events (intervals from either stream) are processed in
 * ascending (key, start) order. Processing a live interval `x` with start
 * `s`: first drop every active interval whose end `<= s` (starts only grow,
 * so it can never overlap anything again), then pair `x` with every
 * surviving OTHER-side active interval (each such `y` has `y.start <= s <
 * y.end` and `x.start = s < x.end` — overlap holds), then admit `x` to its
 * own side's active set. Pairs emit exactly once: by the later-starting
 * interval (left wins start ties, so the tied pair emits at the right
 * event).
 */
case class IntervalOverlapJoinExec(
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    lLo: Attribute,
    lHi: Attribute,
    rLo: Attribute,
    rHi: Attribute,
    rightValues: Seq[Attribute],
    valueOutput: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueOutput

  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "maxActiveIntervals" -> SQLMetrics.createMetric(sparkContext,
      "max concurrent active intervals, both sides (summed across tasks)"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ lLo).map(a => SortOrder(a, Ascending)),
    (rightBy :+ rLo).map(a => SortOrder(a, Ascending)))

  // rows stay in the co-partitioned partition and keys drain in ascending
  // order, so the by-key clustering survives; finer left ordering does NOT
  // (a right event emits earlier-starting left rows out of lLo order)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    left.outputOrdering.takeWhile(so => leftBy.exists(_.semanticEquals(so.child)))

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
    val lLoE = lLo; val lHiE = lHi; val rLoE = rLo; val rHiE = rHi
    val rValE = rightValues
    val keyTypes = leftBy.map(_.dataType)
    val endpointType = lLo.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lByE, leftOut)
      val rKey = UnsafeProjection.create(rByE, rightOut)
      val lLoP = UnsafeProjection.create(Seq(lLoE), leftOut)
      val lHiP = UnsafeProjection.create(Seq(lHiE), leftOut)
      val rLoP = UnsafeProjection.create(Seq(rLoE), rightOut)
      val rHiP = UnsafeProjection.create(Seq(rHiE), rightOut)
      val rVal = UnsafeProjection.create(rValE, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ptOrd = RowOrdering.createNaturalAscendingOrdering(Seq(endpointType))
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead rows stay valid until the next next() on their iterator;
        // everything admitted to an active set is copied first, and pending
        // emissions pair from the admitted copies so both lookaheads can
        // advance as soon as the event is processed
        private var lRow: InternalRow = if (lIter.hasNext) lIter.next() else null
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var curKey: UnsafeRow = null
        // (end, payload) per admitted not-yet-expired interval: payload is
        // the full left row on the left side, the projected values on the right
        private val activeL = new ArrayBuffer[(UnsafeRow, InternalRow)]()
        private val activeR = new ArrayBuffer[(UnsafeRow, UnsafeRow)]()
        // emission state for the event just processed: the event's own
        // admitted payload plus how much of the other side's active set to
        // pair it with (nothing else runs until these emissions drain)
        private var eventIsLeft = false
        private var eventPayload: InternalRow = null
        private var nMatches = 0
        private var mIdx = 0

        override def hasNext: Boolean = {
          while (mIdx >= nMatches && (lRow != null || rRow != null)) {
            // pick the earlier (key, start) event; left wins ties so the
            // tied pair emits when the right event finds left already active
            eventIsLeft =
              if (lRow == null) false
              else if (rRow == null) true
              else {
                val kc = keyOrd.compare(lKey(lRow), rKey(rRow))
                if (kc != 0) kc < 0
                else ptOrd.compare(lLoP(lRow), rLoP(rRow)) <= 0
              }
            val key = if (eventIsLeft) lKey(lRow) else rKey(rRow)
            if (curKey == null || keyOrd.compare(key, curKey) != 0) {
              activeL.clear(); activeR.clear()
              curKey = key.copy()
            }
            val lo = if (eventIsLeft) lLoP(lRow) else rLoP(rRow)
            val hi = if (eventIsLeft) lHiP(lRow) else rHiP(rRow)
            // a null-endpoint or empty interval matches nothing: consume it
            // without expiry/emission/admission
            if (!lo.isNullAt(0) && !hi.isNullAt(0) && ptOrd.compare(lo, hi) < 0) {
              expire(activeL, lo)
              expire(activeR, lo)
              // every other-side survivor overlaps the event (see scaladoc)
              nMatches = if (eventIsLeft) activeR.length else activeL.length
              mIdx = 0
              eventPayload =
                if (eventIsLeft) lRow.copy() else rVal(rRow).copy()
              if (eventIsLeft) activeL += ((hi.copy(), eventPayload))
              else activeR += ((hi.copy(), eventPayload.asInstanceOf[UnsafeRow]))
              val stateSize = activeL.length + activeR.length
              if (stateSize > maxActive.value) maxActive.set(stateSize)
            }
            if (eventIsLeft) lRow = if (lIter.hasNext) lIter.next() else null
            else rRow = if (rIter.hasNext) rIter.next() else null
          }
          mIdx < nMatches
        }

        override def next(): InternalRow = {
          numOut += 1
          val out = if (eventIsLeft) {
            project(joined(eventPayload, activeR(mIdx)._2))
          } else {
            project(joined(activeL(mIdx)._2, eventPayload))
          }
          mIdx += 1
          out
        }

        /** Drop active entries whose end has been passed (end <= start):
          * starts only grow within a key, so they can never match again. */
        private def expire[T](
            active: ArrayBuffer[(UnsafeRow, T)], start: InternalRow): Unit = {
          var i = 0
          var kept = 0
          while (i < active.length) {
            if (ptOrd.compare(start, active(i)._1) < 0) {
              if (kept != i) active(kept) = active(i)
              kept += 1
            }
            i += 1
          }
          active.dropRightInPlace(active.length - kept)
        }
      }
    }
  }
}
