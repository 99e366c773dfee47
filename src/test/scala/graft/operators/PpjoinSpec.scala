package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PPJoin prefix-filtered set-similarity join: losslessness against a
  * brute-force model (the WWW'08 guarantee the operator's pruning rests
  * on), head-to-head row equality with the df-capped posting-join path,
  * and the boundary arithmetic of the integer prefix/α formulas. */
class PpjoinSpec extends SparkSuite {

  /** Brute-force all-pairs distinct-trigram Jaccard at pct — the model. */
  private def brute(docs: Seq[(Long, String)], pct: Int): Set[(Long, Long)] = {
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" +").toSeq
      if (w.size < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val g = docs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    (for {
      (ia, ga) <- g; (ib, gb) <- g if ia < ib
      common = (ga & gb).size; union = ga.size + gb.size - common
      if common * 100 >= union * pct
    } yield (ia, ib)).toSet
  }

  private def run(docs: Seq[(Long, String)], pct: Int): Set[(Long, Long)] = {
    import spark.implicits._
    CorpusOps.ppjoinPairs(docs.toDF("doc_id", "text"), pct)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  }

  test("ppjoin equals the brute-force all-pairs join on a planted corpus") {
    // clusters of near-dups, singletons, a doc repeated verbatim, and a
    // super-hot shared sentence (a stop-phrase every doc contains) so the
    // prefix filter must look PAST a df == n gram
    val hot = "the quick brown fox jumps"
    val docs: Seq[(Long, String)] = (0L until 40L).map { i =>
      val body = i % 4 match {
        case 0 => s"alpha beta gamma delta epsilon zeta ${i / 4} end marker"
        case 1 => s"alpha beta gamma delta epsilon zeta ${i / 4} end changed"
        case 2 => s"totally unrelated content number ${i} with its own words here"
        case _ => s"shared prefix words then unique tail ${i} ${i * 7} ${i * 13}"
      }
      (i, s"$hot $body")
    } :+ (100L, s"$hot alpha beta gamma delta epsilon zeta 0 end marker") :+
      (101L, "tiny doc") :+ // < 3 words: no grams, never paired
      (102L, "exactly three words")
    for (pct <- Seq(30, 50, 80)) {
      assert(run(docs, pct) == brute(docs, pct), s"mismatch at pct=$pct")
    }
  }

  test("ppjoin at 0.5 returns exactly dedup_ngram_jaccard's rows on sf0.001") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pp = CorpusOps.ppjoinPairs(d, 50)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val nj = graft.queries.DedupQueries.queries("dedup_ngram_jaccard")(
        spark, "/root/testdata/sf0.001")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp.nonEmpty, "expected near-dup pairs at sf0.001")
    assert(pp == nj,
      s"ppjoin vs posting-join disagree: only-pp=${(pp -- nj).take(3)} " +
        s"only-nj=${(nj -- pp).take(3)}")
  }

  test("integer prefix and alpha formulas match their real-valued forms") {
    // plen = s - ceil(t*s) + 1, alpha = ceil(t/(1+t)*(sa+sb)) — the div
    // forms in ppjoinPairs must equal math.ceil over the rationals
    for (pct <- 1 to 99; s <- 1 to 60) {
      val ceilTs = (pct * s + 99) / 100
      assert(ceilTs == math.ceil(pct * s / 100.0).toInt, s"ceil t*s pct=$pct s=$s")
    }
    for (pct <- Seq(30, 50, 80, 95); sa <- 1 to 40; sb <- 1 to 40) {
      val alpha = (pct * (sa + sb) + 100 + pct - 1) / (100 + pct)
      val real = math.ceil(pct.toDouble / (100 + pct) * (sa + sb)).toInt
      assert(alpha == real, s"alpha pct=$pct sa=$sa sb=$sb: $alpha vs $real")
    }
  }

  test("ppjoinAcross equals the brute cross-join on a split planted corpus") {
    import spark.implicits._
    val base: Seq[(Long, String)] = (0L until 40L).map { i =>
      val body = i % 4 match {
        case 0 => s"alpha beta gamma delta epsilon zeta ${i / 4} end marker"
        case 1 => s"alpha beta gamma delta epsilon zeta ${i / 4} end changed"
        case 2 => s"totally unrelated content number ${i} with its own words"
        case _ => s"shared prefix words then unique tail ${i} ${i * 7}"
      }
      (i, body)
    }
    val leftDocs = base.filter(_._1 % 5 == 0)
    val rightDocs = base.filter(_._1 % 5 != 0)
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" +").toSeq
      if (w.size < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (pct <- Seq(30, 60)) {
      val want = (for {
        (la, ga0) <- leftDocs.map { case (i, t) => (i, grams(t)) }
        (rb, gb0) <- rightDocs.map { case (i, t) => (i, grams(t)) }
        if ga0.nonEmpty && gb0.nonEmpty
        common = (ga0 & gb0).size; union = ga0.size + gb0.size - common
        if common * 100 >= union * pct
      } yield (la, rb)).toSet
      val got = CorpusOps.ppjoinAcross(
          leftDocs.toDF("doc_id", "text"), rightDocs.toDF("doc_id", "text"), pct)
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"cross mismatch at pct=$pct: " +
        s"only-got=${(got -- want).take(3)} only-want=${(want -- got).take(3)}")
    }
  }

  test("materialize knob: identity and localCheckpoint paths are bit-identical") {
    import spark.implicits._
    val docsDf = (0L until 30L).map { i =>
      (i, if (i % 2 == 0) s"alpha beta gamma delta ${i / 2} end"
          else s"alpha beta gamma delta ${i / 2} fin")
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(rows(CorpusOps.ppjoinPairs(docsDf, 50)) ==
      rows(CorpusOps.ppjoinPairs(docsDf, 50,
        materialize = _.localCheckpoint(true))))
    assert(rows(CorpusOps.snmMultipass(docsDf, 2, 10, 50)) ==
      rows(CorpusOps.snmMultipass(docsDf, 2, 10, 50, materialize = identity)))
  }

  test("prefix audit flags exact-dup clusters with their implied candidate mass") {
    import spark.implicits._
    // 20 byte-identical docs (the boilerplate hazard class: every copy's
    // rarest grams have posting length = cluster size) + 10 gram-disjoint
    // singletons. The dup doc has 10 tokens -> 8 trigrams, all df 20;
    // plen = 8 - ceil(50*8/100) + 1 = 5, so 5 prefix grams at pdf 20.
    val dup = "aa bb cc dd ee ff gg hh ii jj"
    val docs = (0L until 20L).map(i => (i, dup)) ++
      (100L until 110L).map(i => (i, s"u${i}a u${i}b u${i}c u${i}d"))
    val audit = CorpusOps
      .ppjoinPrefixAudit(docs.toDF("doc_id", "text"), pct = 50)
      .collect().map(r => r.getAs[Int]("df_decade") -> r).toMap
    // decade 2 = the flagged cluster: 5 grams, each posting 20 docs,
    // implied candidate mass 5 * C(20,2) = 950 — visible BEFORE the join
    val top = audit(2)
    assert(top.getAs[Long]("max_posting") == 20L, top)
    assert(top.getAs[Long]("n_grams") == 5L, top)
    assert(top.getAs[Long]("implied_pairs") == 5L * 190L, top)
    // decade 1 = the healthy stratum: singleton postings, zero mass
    assert(audit(1).getAs[Long]("implied_pairs") == 0L, audit(1))
    assert(audit(1).getAs[Long]("max_posting") == 1L, audit(1))
  }

  test("single-gram docs pair only with themselves-alike at pct 50") {
    // sz == 1 -> plen == 1: the whole set IS the prefix; two one-gram docs
    // with the same gram have jaccard 1.0, with different grams 0.0
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    assert(run(docs, 50) == Set((1L, 2L)))
  }
}
