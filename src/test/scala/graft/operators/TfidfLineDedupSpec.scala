package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Keep-first span dedup ([[CorpusOps.lineDedup]]) and the TF-IDF family
 * ([[CorpusOps.tfidfKeywords]] / [[CorpusOps.hashedTfidf]]). The
 * cross-engine arithmetic is hash-checked by the `pipe_line_dedup` /
 * `text_tfidf_topk` / `text_hash_vectors` / `sim_text_knn` DuckDB
 * oracles; this spec pins the SEMANTICS on hand-computed fixtures —
 * global first-occurrence order, the rewrite's reassembly, idf
 * monotonicity, the hashing trick's linearity — plus partition
 * invariance and the no-cartesian plan shape.
 */
class TfidfLineDedupSpec extends SparkSuite {

  import spark.implicits._

  // ---------------------------------------------------------------- lineDedup

  test("lineDedup: global keep-first across docs, reassembly in order") {
    // span width 2: doc 0 = [a b][c d], doc 1 = [c d][e f], doc 2 = [a b]
    val docs = Seq(
      (0L, "a b c d"), (1L, "c d e f"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, spanWords = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    // doc 0 owns both its spans (first in global order); doc 1 loses
    // "c d" to doc 0 but keeps "e f"; doc 2 loses its only span entirely
    assert(out === Seq(
      (0L, 2L, 2L, "a b c d"),
      (1L, 2L, 1L, "e f"),
      (2L, 1L, 0L, "")))
  }

  test("lineDedup: intra-doc repeats also collapse to the first position") {
    val docs = Seq((7L, "x y x y x y")).toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, spanWords = 2)
      .select("n_spans", "n_kept", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out === ((3L, 1L, "x y")))
  }

  test("lineDedup differs from boilerplateRemoval: first occurrence survives") {
    // a span shared by 3 docs: boilerplate removal (minDocs=2) drops ALL
    // occurrences; lineDedup keeps exactly the earliest one
    val docs = Seq((0L, "s s"), (1L, "s s"), (2L, "s s")).toDF("doc_id", "text")
    val line = CorpusOps.lineDedup(docs, spanWords = 2)
      .agg(sum("n_kept")).as[Long].head()
    val boiler = CorpusOps.boilerplateRemoval(docs, chunkWords = 2, minDocs = 2)
      .agg(sum(col("n_chunks") - col("n_boiler"))).as[Long].head()
    assert(line === 1L)
    assert(boiler === 0L)
  }

  test("lineDedupSpans: the downstream is span-source-agnostic (newline lines)") {
    // real newline-split lines through the same pipeline the catalog
    // query drives with word windows
    val docs = Seq(
      (0L, "copyright acme\nreal content zero"),
      (1L, "copyright acme\nreal content one"))
      .toDF("doc_id", "text")
    val spans = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("i", "chunk")))
    val out = CorpusOps.lineDedupSpans(spans)
      .orderBy("doc_id")
      .select("doc_id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect()
    assert(out === Seq(
      (0L, 2L, "copyright acme real content zero"),
      (1L, 1L, "real content one")))
  }

  test("lineDedup is partition-invariant") {
    val docs = (0L until 40L)
      .map(i => (i, s"shared span words here plus unique tail $i"))
      .toDF("doc_id", "text")
    val a = CorpusOps.lineDedup(docs, spanWords = 4)
      .orderBy("doc_id").collect()
    val b = CorpusOps.lineDedup(docs.repartition(7), spanWords = 4)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("lineDedup plan: aggregate + hash join, no cartesian, no global window") {
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val plan = CorpusOps.lineDedup(docs, spanWords = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
    // first-occurrence selection must be the map-side-combining aggregate,
    // not a window over the span key (hot spans would serialize)
    assert(!plan.toLowerCase.contains("window"))
  }

  test("incremental line dedup replayed in id order equals the batch operator") {
    // history batch + two streamed batches with planted cross-batch span
    // copies: 21 copies a span from history, 32 copies one from batch 1 —
    // the second only dedups if the index actually ACCUMULATES
    val history = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
    val batch1 = Seq((11L, "iota kappa lambda mu"), (12L, "nu xi omicron pi"))
    val batch2 = Seq(
      (21L, "alpha beta gamma delta rho sigma tau upsilon"),
      (32L, "nu xi omicron pi phi chi psi omega"))
    def toDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val idxDir = tempDir("line-dedup-idx")
    CorpusOps.lineDedupIndex(toDf(history), spanWords = 4)
      .write.mode("overwrite").parquet(idxDir)
    val streamed = Seq(batch1, batch2).flatMap { b =>
      val out = CorpusOps.incrementalLineDedup(
          toDf(b), spark.read.parquet(idxDir), spanWords = 4)
        .select("doc_id", "n_spans", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      CorpusOps.lineDedupIndex(toDf(b), spanWords = 4)
        .write.mode("append").parquet(idxDir)
      out
    }
    val batch = CorpusOps.lineDedup(toDf(history ++ batch1 ++ batch2), spanWords = 4)
      .select("doc_id", "n_spans", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .filter(_._1 >= 11L).toSeq
    assert(streamed.sortBy(_._1) === batch.sortBy(_._1))
    // and the planted copies were actually suppressed
    val m = streamed.map(r => r._1 -> r._4).toMap
    assert(m(21L) === "rho sigma tau upsilon")
    assert(m(32L) === "phi chi psi omega")
  }

  // -------------------------------------------------------------------- tfidf

  test("tfidfKeywords: rarer terms outrank frequent ones; ties break by term") {
    // 4 docs; "rare" appears in 1 doc, "common" in all 4.
    val docs = Seq(
      (0L, "common rare common"), (1L, "common common"),
      (2L, "common"), (3L, "common"))
      .toDF("doc_id", "text")
    val out = CorpusOps.tfidfKeywords(docs, k = 2)
      .filter(col("doc_id") === 0L).orderBy("rnk")
      .select("term", "tf", "df", "score")
      .as[(String, Long, Long, Long)].collect()
    // doc 0: rare tf=1 df=1 -> score 1*(4*10000 div 1)=40000;
    //        common tf=2 df=4 -> score 2*(4*10000 div 4)=20000
    assert(out === Seq(("rare", 1L, 1L, 40000L), ("common", 2L, 4L, 20000L)))
  }

  test("tfidfKeywords: integer idf surrogate is exact (div, not ln)") {
    val docs = Seq((0L, "x y"), (1L, "y"), (2L, "y")).toDF("doc_id", "text")
    val scores = CorpusOps.tfidfScored(docs)
      .filter(col("doc_id") === 0L)
      .select("term", "score").as[(String, Long)].collect().toMap
    // N=3: x df=1 -> 30000 div 1 = 30000; y df=3 -> 30000 div 3 = 10000
    assert(scores === Map("x" -> 30000L, "y" -> 10000L))
  }

  test("hashedTfidf: linearity — bucket weights are signed sums of term scores") {
    val docs = Seq((0L, "alpha beta alpha")).toDF("doc_id", "text")
    val scored = CorpusOps.tfidfScored(docs)
      .withColumn("h", md5(col("term")))
      .withColumn("bucket", conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 64)
      .withColumn("sgn", when(
        conv(substring(col("h"), 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
        .otherwise(-1L))
      .select(col("bucket"), (col("sgn") * col("score")).as("w"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.filter(_._2 != 0L)
    val vecs = CorpusOps.hashedTfidf(docs, buckets = 64)
      .select("bucket", "weight").as[(Long, Long)].collect().toMap
    assert(vecs === scored)
  }

  test("hashedTfidf is deterministic and partition-invariant") {
    val docs = (0L until 30L)
      .map(i => (i, s"term${i % 7} term${i % 3} filler words here ${i}"))
      .toDF("doc_id", "text")
    val a = CorpusOps.hashedTfidf(docs, buckets = 64)
      .orderBy("doc_id", "bucket").collect()
    val b = CorpusOps.hashedTfidf(docs.repartition(5), buckets = 64)
      .orderBy("doc_id", "bucket").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("passages: stride windows cover the doc, overlap correctly, clamp at the tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.passages(docs, window = 4, stride = 2)
      .orderBy("pas_idx").select("pas_idx", "text")
      .as[(Int, String)].collect().toSeq
    assert(out === Seq(
      (0, "w1 w2 w3 w4"), (1, "w3 w4 w5 w6"), (2, "w5 w6 w7 w8"),
      (3, "w7 w8 w9 w10"), (4, "w9 w10")))
    // every word appears in at least one passage (coverage)
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("novelty query: unique-content doc scores 1.0, verbatim twin scores 0.0") {
    val dir = tempDir("novelty")
    Seq(
      (1L, "one two three four five", "en", "src0", 23L),
      (2L, "one two three four five", "en", "src0", 23L), // twin: df=2 grams
      (3L, "alpha beta gamma delta epsilon", "en", "src0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.queries("text_novelty")(spark, dir)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("zipf query: ranks are dense, cumulative share is monotone and <= 1") {
    val out = graft.queries.TextQueries
      .queries("text_zipf")(spark, "/root/testdata/sf0.001")
      .select("rank", "freq", "cum_share")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (1 to out.length))
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq, "freq not descending")
    val shares = out.map(_._3)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last <= 1.0)
  }

  test("docGraphTriangles: counts a clique triangle once; open wedges count zero") {
    // chunks are 10-word windows; ten distinct shared words form one chunk
    def chunk(tag: String) = (0 until 10).map(i => s"$tag$i").mkString(" ")
    val (p, q, r, y) = (chunk("p"), chunk("q"), chunk("r"), chunk("y"))
    val docs = Seq(
      1L -> s"$p $r", // 1-2 via p, 1-3 via r
      2L -> s"$p $q", // 2-3 via q  => triangle 1-2-3 through THREE chunks
      3L -> s"$q $r",
      4L -> s"$y ${chunk("u")}", // 4-5 via y: an edge, no triangle
      5L -> s"$y ${chunk("w")}")
      .map { case (i, t) => (i, t) }.toDF("doc_id", "text")
    val out = CorpusOps.docGraphTriangles(docs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("corpusDiff classifies added, removed, changed, unchanged") {
    val before = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val out = CorpusOps.corpusDiff(before, after)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("docClusters: disjoint-vocabulary registers separate into distinct cells") {
    // even ids = science vocab, odd ids = chat vocab — the deterministic
    // lowest-id centroid init then seeds one cell per register
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, s"quantum flux lattice spectra entropy tensor boson")
      else (i, s"lol okay haha whatever brb gonna wanna yeah")
    }.toDF("doc_id", "text")
    val assign = CorpusOps.docClusters(docs, cells = 2, lloydIters = 3)
      .select("doc_id", "cell").as[(Long, Long)].collect().toMap
    val sciCells = assign.filter(_._1 % 2 == 0).values.toSeq
    val chatCells = assign.filter(_._1 % 2 == 1).values.toSeq
    assert(sciCells.distinct.size == 1, s"science split: $sciCells")
    assert(chatCells.distinct.size == 1, s"chat split: $chatCells")
    assert(sciCells.head != chatCells.head, "registers merged into one cell")
  }

  test("docClusters is deterministic and partition-invariant") {
    val docs = (0L until 30L)
      .map(i => (i, s"word${i % 5} word${i % 7} body text here ${i % 3}"))
      .toDF("doc_id", "text")
    val a = CorpusOps.docClusters(docs, cells = 3, lloydIters = 2)
      .select("doc_id", "cell").orderBy("doc_id").collect()
    val b = CorpusOps.docClusters(docs.repartition(7), cells = 3, lloydIters = 2)
      .select("doc_id", "cell").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("denseHashedVectors round-trips the sparse rows; absent buckets read 0") {
    val docs = Seq((5L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val sparse = CorpusOps.hashedTfidf(docs, buckets = 64)
      .select("bucket", "weight").as[(Long, Long)].collect().toMap
    val dense = CorpusOps.denseHashedVectors(docs, buckets = 64)
      .select("v").as[Seq[Double]].head()
    assert(dense.length == 64)
    (0 until 64).foreach { b =>
      assert(dense(b) == sparse.getOrElse(b.toLong, 0L).toDouble,
        s"bucket $b mismatch")
    }
  }

  test("text knn over hashed vectors: identical docs are each other's top hit") {
    val docs = Seq(
      (0L, "quantum flux lattice entropy"),
      (29L, "quantum flux lattice entropy"), // probe (29 % 29 == 0)
      (2L, "lol okay haha whatever"),
      (3L, "quantum flux other words"))
      .toDF("doc_id", "text")
    val vecs = CorpusOps.hashedTfidf(docs, buckets = 64)
    val probes = vecs.filter(col("doc_id") === 29L)
      .select(col("doc_id").as("query_id"), col("bucket"), col("weight").as("wq"))
    val top = probes
      .join(vecs.select(col("doc_id").as("neighbor_id"), col("bucket"),
        col("weight").as("wc")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id").agg(sum(col("wq") * col("wc")).as("dot"))
      .orderBy(col("dot").desc, col("neighbor_id"))
      .select("neighbor_id").as[Long].head()
    assert(top === 0L) // the verbatim twin dominates every partial overlap
  }
}
