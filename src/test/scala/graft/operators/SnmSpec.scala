package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sorted-neighborhood near-dup screening: the distributed global rank,
  * model equality with a brute in-memory SNM, and the screening
  * soundness/recall contract. */
class SnmSpec extends SparkSuite {

  test("globalRank stamps contiguous 0-based ranks in total key order") {
    import spark.implicits._
    // shuffled input with a total-order key (val, id)
    val rows = new scala.util.Random(42).shuffle(
      (0L until 500L).map(i => (i, (i * 37) % 101))).toDF("id", "v")
      .repartition(7)
    val ranked = CorpusOps.globalRank(rows, struct(col("v"), col("id")), "rnk")
      .select("id", "v", "rnk").as[(Long, Long, Long)].collect()
    assert(ranked.map(_._3).sorted.toSeq == (0L until 500L))
    val byRank = ranked.sortBy(_._3).map(r => (r._2, r._1)).toSeq
    assert(byRank == byRank.sorted, "rank order must equal (v, id) sort order")
  }

  test("rankByIntCells == brute (zval, tie) rank, uniform and skewed") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // uniform over the 20-bit key space, duplicate zvals broken by id,
    // plus a pathological all-one-cell cluster (every high bit equal) —
    // the skew case must stay EXACT even when one cell hosts everything
    val uniform = (0L until 400L).map(i => (i, rnd.nextInt(1 << 20).toLong))
    val skewed = (400L until 600L).map(i => (i, 5L + (i % 3))) // cell 0
    val rows = rnd.shuffle(uniform ++ skewed).toDF("id", "zval")
      .repartition(7)
    val got = CorpusOps
      .rankByIntCells(rows, "zval", "id", zvalBits = 20, rankCol = "rnk")
      .select("id", "zval", "rnk").as[(Long, Long, Long)].collect()
    val expected = (uniform ++ skewed).sortBy { case (id, z) => (z, id) }
      .zipWithIndex.map { case ((id, z), i) => (id, z, i.toLong) }
    assert(got.sortBy(_._3).toSeq == expected.toSeq)
  }

  /** Brute in-memory SNM: the model the operator must match. */
  private def model(
      docs: Seq[(Long, String)], w: Int, pct: Int): Set[(Long, Long)] = {
    def grams(t: String): Set[String] = {
      val ws = t.trim.split(" +").toSeq
      if (ws.size < 3) Set.empty else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val g = docs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val df = g.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = g.map { case (id, gs) =>
      val (kdf, kgram) = gs.map(x => (df(x), x)).min
      (kdf, kgram, id, gs)
    }.sortBy(x => (x._1, x._2, x._3)).map { case (_, _, id, gs) => (id, gs) }
    (for {
      i <- ranked.indices; j <- (i + 1) to math.min(i + w, ranked.size - 1)
      (ia, ga) = ranked(i); (ib, gb) = ranked(j)
      common = (ga & gb).size; union = ga.size + gb.size - common
      if common * 100 >= union * pct
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
  }

  private def corpus: Seq[(Long, String)] = (0L until 60L).map { i =>
    val body = i % 3 match {
      case 0 => s"alpha beta gamma delta epsilon zeta eta ${i / 3} tail marker"
      case 1 => s"alpha beta gamma delta epsilon zeta eta ${i / 3} tail changed"
      case _ => s"unrelated content ${i} with words ${i * 7} ${i * 13} here now"
    }
    (i, body)
  }

  test("snmPairs equals the brute SNM model on a planted corpus") {
    import spark.implicits._
    for ((w, pct) <- Seq((5, 50), (10, 30), (2, 80))) {
      val got = CorpusOps.snmPairs(corpus.toDF("doc_id", "text"), w, pct)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == model(corpus, w, pct), s"mismatch at window=$w pct=$pct")
    }
  }

  test("multipass recall: pass 2 catches twins whose rarest grams sort apart") {
    import spark.implicits._
    // twins 200/201 differ in their FIRST word only: each doc's rarest
    // gram is its own unique (df=1) leading trigram — "apple …" vs
    // "zebra …" — and 15 filler docs with unique 'mid*' grams sort
    // BETWEEN them, so pass 1's window of 10 never compares the twins.
    // Their SECOND-rarest gram is the shared df=2 "qq yyy shared", so
    // pass 2 sorts them adjacent.
    val twins = Seq(
      (200L, "apple qq yyy shared body words here again"),
      (201L, "zebra qq yyy shared body words here again"))
    val fillers = (0 until 15).map { j =>
      (300L + j, f"mid$j%02d fill$j%02d gap$j%02d lone$j%02d solo$j%02d")
    }
    val all = (twins ++ fillers).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val one = pairs(CorpusOps.snmPairs(all, window = 10, pct = 50))
    val multi = pairs(CorpusOps.snmMultipass(all, passes = 2, window = 10, pct = 50))
    assert(!one.contains((200L, 201L)),
      s"pass 1 unexpectedly compared the twins: $one")
    assert(multi.contains((200L, 201L)), s"pass 2 missed the twins: $multi")
    assert(one.subsetOf(multi), "multipass must contain every pass-1 pair")
  }

  test("verify merge counts supplementary-plane grams (code-point vs UTF-16 order)") {
    import spark.implicits._
    import graft.similarity.MinHashKernel.{codePointCompare, intersectionSortedStrings}
    // U+FFFD (BMP, sorts HIGH in code-point order) vs U+1F600 (supplementary,
    // whose UTF-16 lead surrogate 0xD83D sorts LOW under String.compareTo):
    // the two orders disagree exactly here, which is what broke the merge
    assert("�".compareTo("😀") > 0, "UTF-16 puts the emoji first")
    assert(codePointCompare("�", "😀") < 0,
      "code-point order (= sort_array order) puts U+FFFD first")
    // arrays in sort_array (code-point) order; a compareTo merge would stop
    // at the U+FFFD/emoji boundary and undercount common 3 -> 2
    val ga = IndexedSeq("dd � cc", "ee dd �", "� cc bb", "😀 ee dd")
    val gb = IndexedSeq("dd � cc", "ee dd �", "� cc zz", "😀 ee dd")
    assert(intersectionSortedStrings(ga, gb) == 3)
    // end to end: the twins' jaccard is 3/5 = 0.6 >= 0.5 — the pair must
    // survive the verify on non-ASCII text
    val docsDf = Seq(
      (1L, "😀 ee dd � cc bb"),
      (2L, "😀 ee dd � cc zz")).toDF("doc_id", "text")
    val got = CorpusOps.snmPairs(docsDf, window = 10, pct = 50)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.6)), s"non-ASCII verify broke: $got")
  }

  test("screening contract: sound (pairs are true near-dups) and catches planted dups") {
    import spark.implicits._
    val got = CorpusOps.snmPairs(corpus.toDF("doc_id", "text"), 10, 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // soundness: every emitted pair really has jaccard >= 0.5 (brute model
    // over ALL pairs, no window)
    val all = model(corpus, corpus.size, 50)
    assert(got.subsetOf(all), s"unsound pairs: ${(got -- all).take(3)}")
    // the planted i%3==0 / i%3==1 twins share their rarest grams and an
    // 8-of-10 gram overlap — the screen must find them
    val planted = (0L until 60L by 3L).map(i => (i, i + 1)).toSet
    assert(planted.subsetOf(got),
      s"missed planted twins: ${(planted -- got).take(3)}")
  }

  test("window recall audit: band 0 is exactly the single-pass capture on the true-pair set") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents")
    val rows = graft.queries.DedupQueries.queries("dedup_snm_recall")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("dist_band"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"), r.getAs[Long]("n_true"),
        r.getAs[Long]("pct_milli"))).toSeq.sortBy(_._1)
    // accounting invariants: bands partition the true pairs, cum is a
    // running sum ending at n_true, pct is the integer milli share
    assert(rows.nonEmpty)
    val nTrue = rows.head._4
    assert(rows.forall(_._4 == nTrue))
    assert(rows.map(_._2).sum == nTrue)
    assert(rows.last._3 == nTrue)
    rows.foldLeft(0L) { case (acc, (_, n, cum, _, pct)) =>
      assert(cum == acc + n, s"cum broke at $rows")
      assert(pct == n * 1000 / nTrue)
      acc + n
    }
    // the identity the audit reads off: band 0 (rank distance <= window)
    // = the pairs single-pass SNM at the same window/pct captures,
    // restricted to the audit's df-capped true-pair set
    val snm = CorpusOps.snmPairs(docs, window = 10, pct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fx = spark.read.parquet(graft.queries.DedupQueries.SnmRecallPath)
    val sets = fx.select(col("doc_id"), col("grams"))
    val truePairs = CorpusOps.pairSetStatsStrings(
        CorpusOps.postingPairCounts(
          sets.select(col("doc_id"), explode(col("grams")).as("sh")), "sh", 64)
          .select(col("doc_a"), col("doc_b")),
        sets)
      .filter(col("common") * 2 >= col("union_sz"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val band0 = rows.find(_._1 == 0L).map(_._2).getOrElse(0L)
    assert(band0 == (snm & truePairs).size.toLong,
      s"band0 $band0 != |snm ∩ true| ${(snm & truePairs).size}")
  }
}
