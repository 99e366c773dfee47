package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Bench gate logic: the engine-throughput floor (0.6x trailing-3-run
 * median over the driver's BENCH_r*.json history) must trip on a real
 * consume/produce-path slowdown and stay quiet on unmeasured runs,
 * driver-machine weather, and missing history. Pure-function tests — no
 * SparkSession.
 */
class BenchGateSpec extends AnyFunSuite {

  private def historyDir(consumeVals: Seq[Double],
                         produceVals: Seq[Double]): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("bench-hist")
    consumeVals.zip(produceVals).zipWithIndex.foreach { case ((c, p), i) =>
      // same wrapped shape as the driver file: the JSON line lives inside
      // a JSON string field, so its quotes are backslash-escaped
      val line = s"""{"n":${i + 1},"tail":"[info] {\\"metric\\":\\"total_query_sec\\",\\"produce_events_per_sec\\":${p.toLong},\\"consume_events_per_sec\\":${c.toLong}}"}"""
      java.nio.file.Files.writeString(
        dir.resolve(f"BENCH_r${i + 1}%02d.json"), line)
    }
    dir
  }

  test("trailing median uses the last 3 MEASURED rounds and skips -1 rounds") {
    // r1=1408k, r2 unmeasured, r3=1102k, r4=1017k, r5=845k — the actual
    // driver history shape; median of (1102k, 1017k, 845k) = 1017k
    val dir = historyDir(
      consumeVals = Seq(1408277, -1, 1102539, 1016780, 844775),
      produceVals = Seq(121027, -1, 119830, 141764, 146130))
    assert(Bench.trailingMedian(dir, "consume_events_per_sec").contains(1016780.0))
    assert(Bench.trailingMedian(dir, "produce_events_per_sec").contains(141764.0))
  }

  test("driver-machine weather passes; a deliberate consume-path slowdown trips") {
    val dir = historyDir(
      consumeVals = Seq(1102539, 1016780, 844775),
      produceVals = Seq(119830, 141764, 146130))
    // r8's real reading (845k vs floor 0.6 x 1017k = 610k): no violation
    assert(Bench.throughputFloorViolations(146130, 844775, dir).isEmpty)
    // a halved consume path (500k < 610k): trips, names the metric
    val slow = Bench.throughputFloorViolations(146130, 500000, dir)
    assert(slow.map(_._1) == Seq("consume_events_per_sec"))
    assert(slow.head._3 == 0.6 * 1016780)
    // a gutted produce path trips independently
    val slowProd = Bench.throughputFloorViolations(50000, 844775, dir)
    assert(slowProd.map(_._1) == Seq("produce_events_per_sec"))
  }

  test("unmeasured runs (-1, isolation mode) and missing history never gate") {
    val dir = historyDir(
      consumeVals = Seq(1102539, 1016780, 844775),
      produceVals = Seq(119830, 141764, 146130))
    assert(Bench.throughputFloorViolations(-1, -1, dir).isEmpty)
    val empty = java.nio.file.Files.createTempDirectory("bench-hist-empty")
    assert(Bench.trailingMedian(empty, "consume_events_per_sec").isEmpty)
    assert(Bench.throughputFloorViolations(1, 1, empty).isEmpty)
    // history of only unmeasured rounds: no basis, no gate
    val unmeasured = historyDir(Seq(-1.0, -1.0), Seq(-1.0, -1.0))
    assert(Bench.throughputFloorViolations(1, 1, unmeasured).isEmpty)
  }

  test("even-sized measurement windows use the true median (middle average)") {
    // only 2 measured rounds (fresh history): floor base must be the
    // average of the two, not the upper element — upper-median made the
    // gate stricter than documented right after a history reset
    val dir = historyDir(
      consumeVals = Seq(1000000, 800000),
      produceVals = Seq(100000, 140000))
    assert(Bench.trailingMedian(dir, "consume_events_per_sec").contains(900000.0))
    assert(Bench.trailingMedian(dir, "produce_events_per_sec").contains(120000.0))
  }

  test("a transient spike clears the budget gate on re-run; a real slowdown still flags") {
    val tolerance = 1.5
    val floorSec = 0.3
    // two candidates over budget on the suite passes: `spiky` (budget 3.73,
    // measured 6.06 — the r9 pipe_curriculum shape) re-runs fast; `broken`
    // (budget 2.0, measured 5.0) re-runs slow
    val candidates = Seq(
      ("spiky", 6.06, 3.73),
      ("broken", 5.0, 2.0))
    var reruns = List.empty[String]
    val (confirmed, best) = Bench.confirmBudgetViolations(
      candidates,
      name => { reruns ::= name; if (name == "spiky") 3.5 else 4.9 },
      tolerance, floorSec)
    assert(reruns.toSet == Set("spiky", "broken"), "each candidate re-runs once")
    assert(confirmed.map(_._1) == Seq("broken"),
      s"only the reproducible slowdown flags, got $confirmed")
    assert(best("spiky") == 3.5 && best("broken") == 4.9,
      "the report carries the best observed time")
    // a failed re-run (-1) keeps the original measurement and still flags
    val (c2, b2) = Bench.confirmBudgetViolations(
      Seq(("errs", 6.0, 3.0)), _ => -1.0, tolerance, floorSec)
    assert(c2.map(_._1) == Seq("errs") && b2("errs") == 6.0)
    // nothing over budget: no re-runs at all
    val (c3, _) = Bench.confirmBudgetViolations(
      Seq.empty, _ => fail("must not re-run"), tolerance, floorSec)
    assert(c3.isEmpty)
  }

  test("the real repo history yields active floors for round 9") {
    val repo = java.nio.file.Paths.get(".")
    val c = Bench.throughputFloor(repo, "consume_events_per_sec")
    val p = Bench.throughputFloor(repo, "produce_events_per_sec")
    assert(c.exists(_ > 0), s"consume floor should be active, got $c")
    assert(p.exists(_ > 0), s"produce floor should be active, got $p")
    // the floors must sit BELOW the band the builder certifies against,
    // or every healthy run would flag
    assert(c.get < 1000000, s"consume floor $c must clear the healthy band")
    assert(p.get < 99000, s"produce floor $p must clear the healthy band")
  }
}
