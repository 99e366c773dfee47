package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property check of the Misra–Gries invariants over randomized streams
 * and randomized merge splits — driver-side on [[MGBuffer]], so thousands
 * of cases run without Spark overhead (same hand-rolled style as
 * NamespaceGlobSpec's 20k-case sweep). The two properties every
 * distributed execution relies on:
 *   1. any item with true count > n/(k+1) is in the summary;
 *   2. every reported count is a lower bound within n/(k+1) of the truth.
 * Checked for the sequential update path and for an arbitrary 2-way split
 * combined with the mergeable-summaries rule (the partial-agg path).
 */
class MisraGriesPropertySpec extends AnyFunSuite {

  private def offerAll(items: Seq[String], k: Int): MGBuffer = {
    val b = new MGBuffer(k)
    items.foreach(b.offer)
    b
  }

  private def counts(b: MGBuffer): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    b.counts.forEach((k, v) => m(k.asInstanceOf[String]) = v)
    m.toMap
  }

  private def check(
      summary: Map[String, Long], items: Seq[String], k: Int, cse: String): Unit = {
    val n = items.size.toLong
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    truth.foreach { case (item, c) =>
      if (c > bound) {
        assert(summary.contains(item), s"$cse: heavy '$item' ($c > $bound) lost")
      }
    }
    summary.foreach { case (item, lb) =>
      val t = truth.getOrElse(item, 0L)
      assert(lb <= t, s"$cse: '$item' lb $lb above truth $t")
      assert(t - lb <= bound, s"$cse: '$item' error ${t - lb} > $bound")
    }
    assert(summary.size <= k, cse)
  }

  private def randomStream(rnd: scala.util.Random): (Seq[String], Int) = {
    val k = 1 + rnd.nextInt(12)
    val heavy = (0 until rnd.nextInt(4)).flatMap { i =>
      List.fill(20 + rnd.nextInt(100))("H" + i)
    }
    val tail = Seq.fill(rnd.nextInt(300))("t" + rnd.nextInt(40))
    (rnd.shuffle(heavy ++ tail), k)
  }

  test("sequential stream keeps both MG invariants (2000 random cases)") {
    val rnd = new scala.util.Random(2024)
    for (c <- 1 to 2000) {
      val (items, k) = randomStream(rnd)
      check(counts(offerAll(items, k)), items, k, s"case $c k=$k n=${items.size}")
    }
  }

  test("arbitrary split + mergeable-summaries combine keeps both invariants (2000 cases)") {
    val rnd = new scala.util.Random(4048)
    for (c <- 1 to 2000) {
      val (items, k) = randomStream(rnd)
      val (a, b) = items.splitAt(if (items.isEmpty) 0 else rnd.nextInt(items.size + 1))
      val ba = offerAll(a, k)
      val bb = offerAll(b, k)
      bb.counts.forEach((item, cnt) => ba.addCount(item, cnt))
      ba.shrinkToK()
      check(counts(ba), items, k, s"case $c k=$k n=${items.size}")
    }
  }
}
