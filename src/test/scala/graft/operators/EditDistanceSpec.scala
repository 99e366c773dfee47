package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/**
 * PassJoin fuzzy dedup: the banded plan must be EXACTLY the brute-force
 * answer — candidate generation is only allowed to over-generate, and the
 * thresholded-Levenshtein verify trims it back. Parity against the cross
 * join on both real testdata and adversarial planted fixtures (edits that
 * shift every later segment) is the recall-completeness evidence; the plan
 * pin proves the scale path never degenerates into a cartesian product.
 */
class EditDistanceSpec extends SparkSuite {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(4)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("banded pairs equal brute force on real testdata (sf0.001)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fast = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, 4))
    val brute = pairSet(EditDistance.fuzzyPrefixPairsBrute(docs, 192, 4))
    assert(fast === brute)
    assert(brute.nonEmpty, "testdata should contain planted near-dup prefixes")
  }

  test("edits that shift all later segments are still found (parity on planted fixtures)") {
    val base = ("the quick brown fox jumps over the lazy dog " * 5).trim // 219 chars
    val rows = Seq(
      1L -> base,
      2L -> ("X" + base),              // 1 insertion at position 0: everything shifts
      3L -> base.drop(3),              // 3 deletions at the front
      4L -> base.replace("quick", "quack"), // substitutions mid-string
      5L -> ("XY" + base.drop(2)),     // 2 substitutions at the front
      6L -> base.reverse,              // far away: must NOT match
      7L -> ("Z" * 200),               // unrelated
      8L -> (base.take(100) + "INSERT" + base.drop(100))) // 6 inserts: beyond d=4 for pair (1,8)
    val docs = docsDf(rows)
    for (d <- Seq(1, 2, 4)) {
      val fast = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, d))
      val brute = pairSet(EditDistance.fuzzyPrefixPairsBrute(docs, 192, d))
      assert(fast === brute, s"parity failed at maxDist=$d")
    }
    val at4 = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, 4))
    // prefix semantics: the front insertion costs 2 on the 192-char window
    // (insert at 0 + the shifted-out tail char re-aligned at the end)
    assert(at4.contains((1L, 2L, 2L)), "front insertion missed")
    assert(!at4.exists(p => p._1 == 6L || p._2 == 6L), "reverse must not match")
  }

  test("threshold boundary: distance exactly d kept, d+1 dropped") {
    val base = "a" * 100 + "b" * 100
    val docs = docsDf(Seq(
      1L -> base,
      2L -> ("cc" + base.drop(2)),   // distance 2
      3L -> ("ccc" + base.drop(3)))) // distance 3
    val at2 = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, 2))
    assert(at2.contains((1L, 2L, 2L)))
    assert(!at2.exists(p => p._1 == 1L && p._2 == 3L), "distance 3 must be dropped at d=2")
    val brute = pairSet(EditDistance.fuzzyPrefixPairsBrute(docs, 192, 2))
    assert(at2 === brute)
  }

  test("randomized parity: scattered edits against a shared base corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh "
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val bases = (0 until 20).map(_ => randStr(200))
    // each doc: a base, possibly perturbed by 0-6 random single-char edits
    val rows = (0 until 60).map { i =>
      val b = bases(rnd.nextInt(bases.size))
      val edits = rnd.nextInt(7)
      var s = b
      (0 until edits).foreach { _ =>
        val pos = rnd.nextInt(s.length)
        rnd.nextInt(3) match {
          case 0 => s = s.take(pos) + alphabet(rnd.nextInt(alphabet.length)) + s.drop(pos + 1)
          case 1 => s = s.take(pos) + alphabet(rnd.nextInt(alphabet.length)) + s.drop(pos)
          case 2 => s = s.take(pos) + s.drop(pos + 1)
        }
      }
      (i.toLong, s)
    }
    val docs = docsDf(rows)
    val fast = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, 4))
    val brute = pairSet(EditDistance.fuzzyPrefixPairsBrute(docs, 192, 4))
    assert(fast === brute)
    assert(brute.nonEmpty, "the perturbed corpus should contain close pairs")
  }

  test("empty and sub-(d+1)-char docs: short bucket restores brute parity") {
    // keys shorter than maxDist+1 chars have empty canonical segments and
    // no probe rows toward equally-short partners — without the short
    // bucket these pairs are silently dropped while brute force (and the
    // DuckDB oracle) reports them
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val rows = Seq(
      1L -> "",                 // empty
      2L -> "",                 // empty twin: dist 0 pair (1,2)
      3L -> "a",                // 1-char: within d of both empties and of 4
      4L -> "ab",
      5L -> "abcd",             // == d chars at d=4: still short-bucket
      6L -> "abcdef",           // len d+2: long path; within d of 5 (dist 2)
      7L -> base,               // a normal long doc
      8L -> ("X" + base))       // its near dup
    val docs = docsDf(rows)
    for (d <- Seq(1, 2, 4)) {
      val fast = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, d))
      val brute = pairSet(EditDistance.fuzzyPrefixPairsBrute(docs, 192, d))
      assert(fast === brute, s"short-key parity failed at maxDist=$d")
    }
    val at4 = pairSet(EditDistance.fuzzyPrefixPairs(docs, 192, 4))
    assert(at4.contains((1L, 2L, 0L)), "empty-empty pair missed")
    assert(at4.contains((1L, 3L, 1L)), "empty-vs-1-char pair missed")
    assert(at4.contains((5L, 6L, 2L)), "short-vs-long cross pair missed")
  }

  test("the banded plan contains no cartesian or nested-loop join") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = EditDistance.fuzzyPrefixPairs(docs, 192, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
