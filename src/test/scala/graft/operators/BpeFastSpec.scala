package graft.operators

import org.apache.spark.sql.DataFrame

import graft.{SparkSuite, Tables}

/**
 * In-process BPE trainer ([[CorpusOps.bpeTrainFast]] /
 * [[CorpusOps.bpeMergeLoop]]) must produce EXACTLY the merge sequence of
 * the distributed formulation ([[CorpusOps.bpeTrain]]) — same pairs, same
 * order, same weighted counts, same tie-breaks, same early stop — on every
 * corpus. The distributed loop (one Spark job + one driver collect per
 * merge) stays as the equality oracle; the in-process loop is the
 * production path for real 32–50k-merge vocabularies.
 */
class BpeFastSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def mergeRows(df: DataFrame): Seq[(Int, String, String, String, Long)] =
    df.orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq

  test("fast trainer equals the distributed trainer on the hand corpus (ties + early stop)") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa aa"), (2L, "aa aa aa aa ab"), (3L, "ab ab"))
      .toDF("doc_id", "text")
    val slow = mergeRows(CorpusOps.bpeTrain(docs, numMerges = 10))
    val fast = mergeRows(CorpusOps.bpeTrainFast(docs, numMerges = 10))
    assert(fast == slow, s"fast $fast != slow $slow")
    assert(fast.nonEmpty && fast.length < 10) // early stop exercised
  }

  test("fast trainer equals the distributed trainer on sf0.001 documents") {
    val docs = Tables.load(spark, sf, "documents")
    val slow = mergeRows(CorpusOps.bpeTrain(docs, numMerges = 25))
    val fast = mergeRows(CorpusOps.bpeTrainFast(docs, numMerges = 25))
    assert(fast == slow)
    assert(fast.length == 25) // the tiny vocab still yields 25 full merges
  }

  test("fast trainer equals the distributed trainer on randomized overlap-heavy corpora") {
    import spark.implicits._
    // seeded corpora over a 3-letter alphabet force the hard cases: greedy
    // overlap runs ("aaa", "abab"), count ties broken lexicographically,
    // merge-created pairs raising an existing pair's count, early stop
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val words = (1 to 20).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => "ab" (rnd.nextInt(2))).mkString +
          (if (rnd.nextBoolean()) "c" else "")
      }
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, (w + " ") * (1 + rnd.nextInt(3))) }
        .toDF("doc_id", "text")
      val n = 1 + rnd.nextInt(12)
      val slow = mergeRows(CorpusOps.bpeTrain(docs, n))
      val fast = mergeRows(CorpusOps.bpeTrainFast(docs, n))
      assert(fast == slow, s"trial $trial (numMerges=$n): fast $fast != slow $slow")
    }
  }

  test("doc-level units (the scale-drive shape) equal the distributed trainer on space-free docs") {
    import spark.implicits._
    // texts without spaces make the word pre-tokenizer yield the whole
    // doc, so bpeMergeLoop over per-doc character units must match the
    // distributed word-level trainer bit-for-bit
    val texts = Seq("abcabcabc", "aabbaabb", "abcabc", "zzzz", "aabb")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val units = texts.groupBy(identity).map { case (t, g) =>
      ((t.map(_.toString) :+ "</w>").toArray, g.size.toLong)
    }.toArray
    val slow = mergeRows(CorpusOps.bpeTrain(docs, numMerges = 15))
      .map(m => (m._1, m._2, m._3, m._5))
    val fast = CorpusOps.bpeMergeLoop(units, numMerges = 15)
    assert(fast == slow, s"fast $fast != slow $slow")
  }

  test("rank-priority encoder equals the sequential rule walk on trained tables") {
    import spark.implicits._
    // train real tables on two corpora (the tiny-alphabet one exercises
    // overlap/tie shapes; sf0.001 exercises the real vocabulary), then
    // encode a word set that includes unseen words, substrings, and
    // overlap runs — the encoders must agree symbol-for-symbol
    val corpora = Seq(
      Seq((1L, "aa aa aa aa"), (2L, "aa aa aa aa ab"), (3L, "ab ab"),
        (4L, "aaa aab abab baba")).toDF("doc_id", "text"),
      graft.Tables.load(spark, sf, "documents"))
    val rnd = new scala.util.Random(7)
    corpora.foreach { docs =>
      val merges = CorpusOps.bpeTrainFast(docs, numMerges = 30)
      val rows = merges.select("rank", "left", "right").collect()
      val rules = rows.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      val rankOf = rows.map(r =>
        (r.getAs[String]("left"), r.getAs[String]("right")) ->
          r.getAs[Int]("rank")).toMap
      val words = Seq("aa", "ab", "aaa", "abab", "ababab", "ba", "zq",
        "spark", "batch", "sort", "sorting") ++
        (1 to 40).map(_ => (1 to (1 + rnd.nextInt(8)))
          .map(_ => "abcs" (rnd.nextInt(4))).mkString)
      words.foreach { w =>
        val slow = CorpusOps.encodeWord(w, rules)
        val fast = CorpusOps.encodeWordFast(w, rankOf)
        assert(fast == slow, s"'$w': fast $fast != slow $slow")
      }
    }
  }

  test("merge loop leaves no learnable pair behind at early stop") {
    // after the loop stops on its own, every remaining adjacent pair in
    // the rewritten units must have weighted count < 2
    val units = Array(
      ("ababab".map(_.toString).toArray :+ "</w>", 3L),
      ("bcbc".map(_.toString).toArray :+ "</w>", 2L))
    val merges = CorpusOps.bpeMergeLoop(units, numMerges = 1000)
    assert(merges.nonEmpty && merges.length < 1000)
    // replay the learned rules over the original units (the loop does not
    // mutate its input) and check no remaining adjacent pair repeats
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    units.foreach { case (arr, w) =>
      var syms: Seq[String] = arr.toSeq
      merges.foreach { case (_, a, b, _) => syms = CorpusOps.applyMerge(syms, a, b) }
      syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + w)
    }
    assert(counts.values.forall(_ < 2), s"learnable pair left: $counts")
  }
}
