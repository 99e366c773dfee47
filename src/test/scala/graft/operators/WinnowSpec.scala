package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Winnowing fingerprints ([[CorpusOps.winnowFingerprints]] /
 * [[CorpusOps.winnowPairs]]) and asymmetric containment
 * ([[CorpusOps.containmentPairs]]). The cross-engine selection/pairing
 * arithmetic is hash-checked end to end by the `dedup_winnow` /
 * `dedup_containment` DuckDB oracles (full recompute from raw text);
 * this spec pins the ALGORITHMIC guarantees the oracle can't state —
 * winnowing's density and detection-floor properties (Schleimer et al.,
 * SIGMOD 2003, §4), containment's asymmetry — plus partition invariance
 * and the no-cartesian plan shape.
 */
class WinnowSpec extends SparkSuite {

  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ------------------------------------------------------- winnowFingerprints

  test("winnow: selected positions are a subset of gram positions with gaps <= w") {
    val text = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val fps = CorpusOps.winnowFingerprints(mkDocs((1L, text)), k = 4, w = 4)
      .orderBy("pos").select("pos").as[Long].collect()
    assert(fps.nonEmpty)
    // positions are valid gram starts: 0 .. 120-4
    assert(fps.forall(p => p >= 0 && p <= 116))
    // the winnowing guarantee: consecutive selected positions are at most
    // w apart (every window selects something, and a window spans w grams)
    fps.sliding(2).foreach {
      case Array(a, b) => assert(b - a <= 4, s"gap $a -> $b exceeds w")
      case _           =>
    }
  }

  test("winnow: expected density ~ 2/(w+1) on random-ish text") {
    val text = (1 to 2000).map(i => s"t${(i * 2654435761L) % 9973}").mkString(" ")
    val n = CorpusOps.winnowFingerprints(mkDocs((1L, text)), k = 4, w = 8)
      .count().toDouble
    val grams = 2000 - 4 + 1
    val expected = 2.0 / (8 + 1) * grams
    // generous band — the theorem is about expectation over random hashes
    assert(n > expected * 0.6 && n < expected * 1.6,
      s"density $n vs expected ~$expected")
  }

  test("winnow: detection floor — a shared run of w+k-1 words yields a common fingerprint") {
    // two otherwise-disjoint docs sharing exactly w+k-1 = 7 words
    val shared = "alpha bravo charlie delta echo foxtrot golf"
    val a = (1 to 40).map(i => s"left$i").mkString(" ") + " " + shared
    val b = shared + " " + (1 to 40).map(i => s"right$i").mkString(" ")
    val fps = CorpusOps.winnowFingerprints(mkDocs((1L, a), (2L, b)), k = 4, w = 4)
    val common = fps.filter(col("doc_id") === 1)
      .select("fp").intersect(fps.filter(col("doc_id") === 2).select("fp"))
    assert(common.count() >= 1)
  }

  test("winnow: identical docs select identical fingerprint sets; repartition invariant") {
    val text = (1 to 200).map(i => s"u${i % 23}v$i").mkString(" ")
    val docs = mkDocs((1L, text), (2L, text))
    val fps = CorpusOps.winnowFingerprints(docs, k = 4, w = 4)
    val s1 = fps.filter(col("doc_id") === 1).select("pos", "fp")
    val s2 = fps.filter(col("doc_id") === 2).select("pos", "fp")
    assert(s1.exceptAll(s2).count() === 0 && s2.exceptAll(s1).count() === 0)
    val re = CorpusOps.winnowFingerprints(docs.repartition(7), k = 4, w = 4)
    assert(fps.exceptAll(re).count() === 0 && re.exceptAll(fps).count() === 0)
  }

  test("winnow: matches an independent driver reference on random tiny-vocab corpora") {
    // tiny vocabulary -> the same gram recurs INSIDE one window, so the
    // rightmost-tie rule actually decides selections (equal hashes only
    // arise from equal grams)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def refFps(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val words = text.trim.split(" +")
      if (words.length < k) return Set.empty
      val hashes = words.sliding(k).map(g =>
        java.lang.Long.parseLong(md5hex(g.mkString(" ")).substring(0, 8), 16)).toArray
      val n = hashes.length
      val starts = if (n <= w) Seq(0) else 0 to (n - w)
      starts.map { s0 =>
        val end = math.min(s0 + w - 1, n - 1)
        var best = s0
        for (i <- s0 + 1 to end)
          if (hashes(i) <= hashes(best)) best = i // <= : rightmost tie
        (best.toLong, hashes(best))
      }.toSet
    }
    val rnd = new scala.util.Random(167)
    val vocab = Array("aa", "bb", "cc")
    val corpora = (1L to 30L).map { id =>
      val len = 2 + rnd.nextInt(30)
      (id, Seq.fill(len)(vocab(rnd.nextInt(3))).mkString(" "))
    }
    val got = CorpusOps.winnowFingerprints(corpora.toDF("doc_id", "text"), k = 2, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpora.foreach { case (id, text) =>
      val want = refFps(text, 2, 4)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id: '$text'")
    }
  }

  test("winnow: short doc (< w grams) still fingerprints via its global min") {
    // 5 words -> 2 grams at k=4, fewer than w=4: exactly one selection
    val fps = CorpusOps.winnowFingerprints(
      mkDocs((1L, "one two three four five")), k = 4, w = 4)
    assert(fps.count() === 1)
  }

  test("winnowPairs: near-dup detected, disjoint docs rejected, plan has no cartesian") {
    val base = (1 to 100).map(i => s"p${i % 31}q$i").mkString(" ")
    val edited = base.split(" ").updated(50, "EDITED").mkString(" ")
    val other = (1 to 100).map(i => s"z${i % 17}y$i").mkString(" ")
    val docs = mkDocs((1L, base), (2L, edited), (3L, other))
    val pairs = CorpusOps.winnowPairs(docs, k = 4, w = 4, pct = 50)
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("winnowPairs: df cap refuses the quadratic join on a ubiquitous fingerprint") {
    // 12 IDENTICAL docs: every selected fingerprint is shared by all 12,
    // so df 12 > maxDf 10 and no pairs emit (conservative-miss semantics)
    val docs = (1L to 12L).map(i =>
      (i, "same old phrase repeated here always forever")).toDF("doc_id", "text")
    val n = CorpusOps.winnowPairs(docs, k = 4, w = 4, pct = 10, maxDf = 10).count()
    assert(n === 0)
  }

  // ------------------------------------------------- weightedJaccardPairs

  test("weighted jaccard separates repetition the distinct-set detector cannot see") {
    val p = (1 to 20).map(i => s"par${i}w").mkString(" ")
    val docs = mkDocs(
      (1L, p),                                  // one copy
      (2L, Seq.fill(10)(p).mkString(" ")),      // ten copies
      (3L, Seq.fill(10)(p).mkString(" ")))      // ten copies again
    // distinct-set jaccard calls (1, 2) near-identical — the SETS agree
    val setPairs = graft.queries.DedupQueries.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(setPairs.contains((1L, 2L)))
    // the multiset view sees the 10x repetition: (1, 2) drops below 0.5,
    // while the equal-multiset pair (2, 3) scores 1.0
    val w = CorpusOps.weightedJaccardPairs(docs, pct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!w.contains((1L, 2L)), w.toString)
    assert(w.contains((2L, 3L)), w.toString)
  }

  test("weighted jaccard: repartition invariant, no cartesian") {
    val p = (1 to 15).map(i => s"wj${i}").mkString(" ")
    val docs = mkDocs((1L, p + " " + p), (2L, p + " " + p), (3L, "other words here now"))
    val a = CorpusOps.weightedJaccardPairs(docs)
    val b = CorpusOps.weightedJaccardPairs(docs.repartition(5))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ------------------------------------------------------- detectorAudit

  test("detectorAudit: counts and milli ratios on hand pairs; empty sides sentinel") {
    val det = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val tru = Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = CorpusOps.detectorAudit(det, tru)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r === ((1L, 1L, 1L, 500L, 500L)))
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val e = CorpusOps.detectorAudit(empty, tru)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(e === ((0L, 0L, 2L, -1L, 0L)))
  }

  // ------------------------------------------------ incrementalWinnowPairs

  test("incremental winnow: ordered replay over the accumulated index matches the batch operator") {
    // disjoint 20-word docs; planted: 12 ~ 3 (batch vs history),
    // 14 ~ 11 (same batch), 22 ~ 13 (batch 2 vs batch 1 — visible only
    // if the index accumulates)
    def doc(i: Int) = (0 until 20).map(k => s"w${i}_$k").mkString(" ")
    def dupOf(i: Int) = doc(i).split(" ").dropRight(1).mkString(" ") + " tail"
    val history = (1 to 10).map(i => (i.toLong, doc(i)))
    val batch1 = Seq((11L, doc(11)), (12L, dupOf(3)), (13L, doc(13)), (14L, dupOf(11)))
    val batch2 = Seq((21L, doc(21)), (22L, dupOf(13)), (23L, doc(23)))
    val idxDir = tempDir("winnow-idx")
    CorpusOps.winnowIndex(history.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(idxDir)
    val flagged = scala.collection.mutable.Set.empty[(Long, Long)]
    Seq(batch1, batch2).foreach { b =>
      val df = b.toDF("doc_id", "text").localCheckpoint(true)
      flagged ++= CorpusOps.incrementalWinnowPairs(df, spark.read.parquet(idxDir))
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      CorpusOps.winnowIndex(df).write.mode("append").parquet(idxDir)
    }
    val whole = (history ++ batch1 ++ batch2).toDF("doc_id", "text")
    val batchPairs = CorpusOps.winnowPairs(whole)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(flagged.toSet === batchPairs)
    assert(Set((3L, 12L), (11L, 14L), (13L, 22L)).subsetOf(flagged.toSet))
  }

  // ----------------------------------------------------- decontaminateFuzzy

  test("fuzzy decontamination catches an edited eval leak that exact 5-grams miss") {
    // eval doc: 30 distinct words; train doc: the same text with every
    // 5th word edited — no intact 5-gram anywhere, so exact gram
    // decontamination scores zero, but the intact 4-word runs between
    // edits still select shared winnow fingerprints (k=4, w=1 windows
    // inside each intact run)
    val evalText = (1 to 30).map(i => s"ev${i}tok").mkString(" ")
    val trainWords = (1 to 30).map(i =>
      if (i % 5 == 0) s"EDIT$i" else s"ev${i}tok")
    val train = mkDocs((3L, trainWords.mkString(" ")),
      (7L, (1 to 30).map(i => s"clean$i").mkString(" ")))
    val eval = mkDocs((100L, evalText))
    val exact = CorpusOps.decontaminate(train, eval)
    assert(exact.count() === 0, "exact 5-grams should see nothing")
    val fuzzy = CorpusOps.decontaminateFuzzy(
      train, eval, minShared = 2, k = 4, w = 2)
    val got = fuzzy.select("doc_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 100L)))
  }

  test("fuzzy decontamination: eval-occurrence cap drops ubiquitous fingerprints") {
    // every one of 30 eval docs is the same text: its fingerprints have
    // eval-occurrence 30 > cap 10, so a train copy is NOT flagged
    val t = (1 to 40).map(i => s"cap${i}w").mkString(" ")
    val eval = (100L to 129L).map(i => (i, t)).toDF("doc_id", "text")
    val train = mkDocs((1L, t))
    val n = CorpusOps.decontaminateFuzzy(
      train, eval, minShared = 1, maxEvalOcc = 10).count()
    assert(n === 0)
  }

  // --------------------------------------------------------- containmentPairs

  test("containment: a quoted doc is found inside its container, direction correct") {
    val quote = (1 to 20).map(i => s"q${i}word").mkString(" ")
    val container = (1 to 60).map(i => s"c${i}pad").mkString(" ") + " " + quote
    val docs = mkDocs((10L, quote), (20L, container))
    val out = CorpusOps.containmentPairs(docs, pct = 90)
      .select("inner_id", "outer_id").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 20L)))
  }

  test("containment: symmetric jaccard at 0.5 misses the same quote pair") {
    val quote = (1 to 20).map(i => s"q${i}word").mkString(" ")
    val container = (1 to 60).map(i => s"c${i}pad").mkString(" ") + " " + quote
    val docs = mkDocs((10L, quote), (20L, container))
    // |A| = 18 grams, |B| = 78 -> jaccard = 18/78 < 0.5: the resemblance
    // detector is blind to exactly what containment flags
    val jac = graft.queries.DedupQueries.ngramJaccardPairs(docs).count()
    assert(jac === 0)
  }

  test("containment: near-identical docs emit BOTH directions; min-grams floor holds") {
    val text = (1 to 30).map(i => s"m${i}n").mkString(" ")
    val both = CorpusOps.containmentPairs(mkDocs((1L, text), (2L, text)), pct = 90)
      .select("inner_id", "outer_id").as[(Long, Long)].collect().toSet
    assert(both === Set((1L, 2L), (2L, 1L)))
    // a 4-word doc (2 grams < minGrams 5) never reports as contained
    val tiny = CorpusOps.containmentPairs(
      mkDocs((1L, "a b c d"), (2L, "a b c d plus much more text here")),
      pct = 90, minGrams = 5)
    assert(tiny.filter(col("inner_id") === 1).count() === 0)
  }

  test("containment: repartition invariant and no cartesian in the plan") {
    val quote = (1 to 20).map(i => s"r${i}s").mkString(" ")
    val container = (1 to 50).map(i => s"t${i}u").mkString(" ") + " " + quote
    val docs = mkDocs((1L, quote), (2L, container), (3L, "unrelated words entirely here"))
    val a = CorpusOps.containmentPairs(docs, pct = 90)
    val b = CorpusOps.containmentPairs(docs.repartition(5), pct = 90)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
