package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, SparkEntry, Tables}

/** Invariant tests for the query catalog on sf0.001 (the driver's oracle
  * compare covers value correctness; these cover the non-SQL-expressible
  * operators' semantics + a smoke pass over the whole catalog). */
class QueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every catalog query runs and returns rows on sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empty = counts.filter(_._2 == 0).keys.toSeq
    assert(empty.isEmpty, s"queries with empty results: $empty")
    assert(counts.size >= 28)
  }

  test("oracleSql only names declared queries, with matching column sets") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("minhash LSH pairs are verified near-dups (jaccard >= 0.5, a < b)") {
    val pairs = DedupQueries.queries("dedup_minhash_lsh")(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("minhash LSH finds the exact-duplicate upper bound (identical docs collide)") {
    // identical texts must always collide in every band: jaccard 1.0 pairs
    // are a subset of LSH output. Build a mini-log by duplicating documents.
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents").limit(20)
      .select($"doc_id", $"text")
    val dup = docs.withColumn("doc_id", $"doc_id" + 10000)
    val all = docs.union(dup)
    // same pipeline, inlined over a temp view-based dir is overkill; assert
    // on the shingle-set equality instead: identical text -> identical sig
    val sh = all.select($"doc_id",
      array_distinct(expr("transform(sequence(0, greatest(length(text)-5, 0)), i -> substring(text, i+1, 5))")).as("shs"))
    val joined = sh.as("a").join(sh.as("b"),
      col("a.doc_id") + 10000 === col("b.doc_id"))
    assert(joined.filter(size(array_except(col("a.shs"), col("b.shs"))) =!= 0).count() == 0)
  }

  test("simhash pairs respect the hamming threshold and ordering") {
    val rows = DedupQueries.queries("dedup_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Number]("hamming").longValue <= 3)
    }
  }

  test("ngram jaccard pairs agree with minhash-found near-dups") {
    val jac = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(jac.nonEmpty)
    // near-dup docs found by char-shingle minhash should overlap word-trigram dups
    val mh = DedupQueries.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert((jac & mh).nonEmpty, s"jac=$jac mh=$mh")
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    val brute = SimilarityQueries.queries("sim_knn_brute")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = SimilarityQueries.queries("sim_knn_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall@5 too low: $recall")
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val brute = SimilarityQueries.queries("sim_knn_brute")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = SimilarityQueries.queries("sim_knn_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // random hyperplanes on near-uniform vectors: banded 4x4-bit codes give
    // bounded recall; assert it's clearly better than chance and non-degenerate
    assert(recall >= 0.2, s"LSH recall@5 too low: $recall")
    assert(lsh.nonEmpty)
  }

  test("approx_count_distinct is within 5% of exact") {
    val r = ScalarQueries.queries("q_approx_distinct")(spark, sf).collect().head
    val approx = r.getAs[Long]("approx_parts").toDouble
    val exact = r.getAs[Long]("exact_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("text quality ratios are sane") {
    val rows = TextQueries.queries("text_quality")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") > 0)
      val stop = r.getAs[Double]("stopword_ratio")
      assert(stop >= 0.0 && stop <= 1.0)
      assert(r.getAs[Double]("avg_token_len") > 0.0)
    }
  }

  test("langid guesses only declared languages") {
    val langs = TextQueries.queries("text_langid")(spark, sf)
      .select("guessed_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "und")))
  }
}
