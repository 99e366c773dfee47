package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Invariant tests for the round-3 corpus-preparation operators (the
  * driver's DuckDB compare covers value correctness; these pin the operator
  * semantics — split coverage, balance, error bounds — and exercise the
  * synthetic edge cases the real corpus doesn't contain). */
class PipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"

  test("decontaminate flags only non-benchmark docs, and every exact copy of a benchmark doc") {
    val flagged = PipelineQueries.queries("pipe_decontaminate")(spark, sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 20 != 0, "benchmark doc in flag list")
      assert(r.getAs[Long]("n_hits") >= 1)
    }
    // completeness on the strongest signal: a training doc whose text is an
    // exact duplicate of a benchmark doc shares all its 5-grams and MUST be
    // flagged (if the corpus has no such pair at this sf the check is
    // vacuous for data pairs — the synthetic test below always exercises it)
    val docs = Tables.load(spark, sf, "documents")
    val exactCross = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") &&
          pmod(col("a.doc_id"), lit(20)) === 0 &&
          pmod(col("b.doc_id"), lit(20)) =!= 0)
      .select(col("b.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val flaggedIds = flagged.map(_.getAs[Long]("doc_id")).toSet
    assert(exactCross.subsetOf(flaggedIds),
      s"exact benchmark copies not flagged: ${exactCross -- flaggedIds}")
  }

  test("decontaminate flags a synthetic verbatim copy of a benchmark doc") {
    // same operator body over a tiny synthetic corpus where doc 0 (benchmark)
    // and doc 1 (train) are verbatim copies and doc 3 is disjoint
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val grams = graft.operators.CorpusOps.fiveGrams(docs)
    val bench = grams.filter(pmod(col("doc_id"), lit(20)) === 0).select("gram").distinct()
    val hits = grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .join(broadcast(bench), "gram").groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L), s"expected only doc 1 flagged, got $hits")
    assert(hits(1L) == 2) // 6 words -> two 5-grams, both contaminated
  }

  test("chunk dedup: identical docs reach dup_frac 1.0, disjoint docs stay 0") {
    import spark.implicits._
    val twelve = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (1 to 12).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, twelve), (2L, twelve), (3L, other)).toDF("doc_id", "text")
    val stats = graft.operators.CorpusOps.chunkDedupStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 12 words -> 2 chunks (10 + 2)
    assert(stats(1L) == ((2L, 2L, 1.0)))
    assert(stats(2L) == ((2L, 2L, 1.0)))
    assert(stats(3L) == ((2L, 0L, 0.0)))
  }

  test("chunk dedup covers every doc and bounds the fraction") {
    val docs = Tables.load(spark, sf, "documents")
    val stats = PipelineQueries.queries("pipe_chunk_dedup")(spark, sf).collect()
    assert(stats.length == docs.count())
    stats.foreach { r =>
      val (n, d, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n && f >= 0.0 && f <= 1.0)
    }
  }

  test("stratified sample takes min(20, |lang|) docs per language") {
    val docs = Tables.load(spark, sf, "documents")
    val langCounts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = PipelineQueries.queries("pipe_sample_stratified")(spark, sf)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == langCounts.keySet)
    sampled.foreach { case (lang, n) =>
      assert(n == math.min(20L, langCounts(lang)), s"$lang: $n")
    }
  }

  test("neyman allocation over-samples the high-variance stratum") {
    import spark.implicits._
    // stratum a: 200 docs of CONSTANT length (sigma = 0 -> weight 0);
    // stratum b: 200 docs alternating 5 / 100 words (huge sigma).
    // Optimal allocation sends (almost) the whole budget to b.
    val docs = ((1 to 200).map { i =>
      (i.toLong, (1 to 20).map(j => s"a$j").mkString(" "), "aa")
    } ++ (1 to 200).map { i =>
      val n = if (i % 2 == 0) 5 else 100
      (1000L + i, (1 to n).map(j => s"b$j").mkString(" "), "bb")
    }).toDF("doc_id", "text", "lang")
    val got = graft.operators.CorpusOps.neymanSample(docs, k = 50)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("aa", 0L) === 0L, s"zero-variance stratum got $got")
    assert(got("bb") >= 49L && got("bb") <= 50L, got.toString)
    // determinism across partitionings
    val a = graft.operators.CorpusOps.neymanSample(docs, 50)
      .orderBy("doc_id").collect().toSeq
    val b = graft.operators.CorpusOps.neymanSample(docs.repartition(7), 50)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("stratified pre-filter bounds the final window's input on a 90/10 skewed corpus") {
    import spark.implicits._
    // 900 docs of one dominant language, 100 of another — the shape that
    // funnels a naive per-lang window onto one task
    val docs = (1 to 1000)
      .map(i => (i.toLong, if (i <= 900) "dom" else "rare"))
      .toDF("doc_id", "lang")
    val surv = graft.operators.CorpusOps.stratifiedSurvivors(docs, k = 20, salts = 32)
    val byLang = surv.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-lang survivor count is bounded by k*salts regardless of skew
    assert(byLang("dom") <= 20L * 32, s"dom survivors ${byLang("dom")}")
    assert(byLang("rare") <= 20L * 32)
    // and recall-complete: composing the final window over survivors yields
    // exactly the naive single-window top 20 per language
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("graft-strat:"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= 20).select("doc_id", "rn")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val twoLevel = surv
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= 20).select("doc_id", "rn")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(twoLevel == naive)
  }

  test("decontaminate shuffle fallback (tiny broadcast budget) matches the broadcast path") {
    val s = spark
    val docs = Tables.load(s, sf, "documents")
    // lowered budget forces the non-broadcast join; results must not move.
    // Disable auto-broadcast so the planner can't silently re-broadcast the
    // small side and turn the fallback assertion vacuous.
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val rows =
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        PipelineQueries.decontaminate(docs, maxBroadcastGrams = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val broadcastRows = PipelineQueries.decontaminate(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == broadcastRows)
    assert(rows.nonEmpty)
  }

  test("pack_bins two-level ranking fans the corpus shuffle beyond the 16 buckets") {
    // the corpus-sized window runs on (bucket, salt): with 32 salts the
    // ranking exchange hash-partitions on two keys -> the plan must show a
    // window partitioned by both, not by bucket alone
    val plan = PipelineQueries.queries("pipe_pack_bins")(spark, sfMid)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), plan)
    val rankedOnSalt = plan.linesIterator.exists(l =>
      l.contains("row_number") && l.contains("salt"))
    assert(rankedOnSalt, s"corpus ranking window not salted:\n$plan")
    // the corpus-sized ranking window runs exactly ONCE (the offsets branch
    // is a partial aggregation off the pruned scan, not a second ranking —
    // see the packBins scaladoc for why scan-twice beats sort-twice here)
    val rankingWindows = "row_number\\(\\) windowspecdefinition".r.findAllIn(plan).size
    assert(rankingWindows == 1,
      s"expected one ranking window, found $rankingWindows:\n$plan")
  }

  test("temperature resampling keeps the rarest language whole and downsamples the rest monotonically") {
    val docs = Tables.load(spark, sfMid, "documents")
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = PipelineQueries.queries("pipe_sample_temperature")(spark, sfMid)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy(_._2)._1
    // thr(min lang) = 65536 -> every 16-bit hash prefix passes
    assert(kept(minLang) == counts(minLang))
    // directional: the most over-represented language keeps the smallest share
    val maxLang = counts.maxBy(_._2)._1
    val shareMax = kept(maxLang).toDouble / counts(maxLang)
    val shareMin = kept(minLang).toDouble / counts(minLang)
    assert(shareMax < shareMin)
    // and the realized share tracks sqrt(minc/cnt) within sampling noise
    val expected = math.sqrt(counts(minLang).toDouble / counts(maxLang))
    assert(math.abs(shareMax - expected) < 0.15, s"share $shareMax vs expected $expected")
  }

  test("pack_bins partitions every doc once into 8 size-balanced bins") {
    val total = Tables.load(spark, sfMid, "documents").count()
    val bins = PipelineQueries.queries("pipe_pack_bins")(spark, sfMid).collect()
    assert(bins.map(_.getLong(0)).toSet == (0L to 7L).toSet)
    assert(bins.map(_.getLong(1)).sum == total)
    val tokens = bins.map(_.getLong(2))
    // stratified round-robin: per-bin token totals within 15% of each other
    // at 500 docs (the bound tightens as the corpus grows)
    assert(tokens.max.toDouble / tokens.min < 1.15,
      s"imbalanced bins: ${tokens.mkString(",")}")
  }

  test("seq_pack conserves docs and tokens with contiguous sequence ids per shard") {
    val docs = Tables.load(spark, sfMid, "documents")
    val nDocs = docs.count()
    val totalTokens = docs
      .select(size(split(trim(col("text")), " +")).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    val rows = PipelineQueries.queries("pipe_seq_pack")(spark, sfMid).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
    // contiguity below relies on no doc spanning two whole windows — true
    // for this corpus (docs cap around ~120 tokens); assert the precondition
    // so the check can't silently go vacuous on future fixtures
    val maxTok = docs.select(max(size(split(trim(col("text")), " +"))))
      .collect().head.getInt(0)
    assert(maxTok <= 512, s"fixture changed: max doc tokens $maxTok > window")
    // per shard: sequence ids are contiguous from 0 (greedy packing leaves
    // no holes — a sequence exists iff some doc's cumulative offset lands in it)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L, s"shard $shard starts at ${ids.head}")
      assert(ids.zipWithIndex.forall { case (id, i) => id == i },
        s"shard $shard has sequence holes: ${ids.mkString(",")}")
    }
  }

  test("length histogram buckets are disjoint, exhaustive, and label-consistent") {
    val total = Tables.load(spark, sf, "documents").count()
    val rows = PipelineQueries.queries("text_len_histogram")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (b, minL, maxL) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(b >= 0 && b <= 11)
      assert(minL >= b * 50)
      if (b < 11) assert(maxL < (b + 1) * 50)
    }
  }

  test("dataset card aggregates are internally consistent") {
    val r = PipelineQueries.queries("pipe_dataset_card")(spark, sf).collect().head
    val nDocs = r.getAs[Long]("n_docs")
    assert(nDocs == Tables.load(spark, sf, "documents").count())
    assert(r.getAs[Long]("n_langs") == 5)
    assert(r.getAs[Long]("total_tokens") > nDocs) // > 1 token/doc
    val avg = r.getAs[Double]("avg_tokens")
    assert(avg == math.floor(r.getAs[Long]("total_tokens") * 10000.0 / nDocs) / 10000)
    assert(r.getAs[Long]("n_exact_dups") >= 0)
  }

  test("BPE training learns the hand-computable merge sequence and stops when nothing repeats") {
    import spark.implicits._
    // words: "aa" x8, "ab" x3. Symbols: [a a </w>] and [a b </w>].
    // Round 0: (a,a) and (a,</w>) tie at 8 -> lexicographic: (a,</w>).
    // Round 1: (a, a</w>) at 8. Round 2: (a,b)/(b,</w>) tie at 3 -> (a,b).
    // Round 3: (ab, </w>) at 3. Then no pair repeats -> early stop.
    val docs = Seq((1L, "aa aa aa aa"), (2L, "aa aa aa aa ab"), (3L, "ab ab"))
      .toDF("doc_id", "text")
    val got = graft.operators.CorpusOps.bpeTrain(docs, numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got == Seq(
      (0, "a", "</w>", "a</w>", 8L),
      (1, "a", "a</w>", "aa</w>", 8L),
      (2, "a", "b", "ab", 3L),
      (3, "ab", "</w>", "ab</w>", 3L)), s"got $got")
  }

  test("BPE merge counts are non-increasing and deterministic on the real corpus") {
    val run1 = TextQueries.queries("text_bpe_merges")(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    assert(run1.nonEmpty && run1.map(_._1) == run1.indices.toSeq)
    // a merge-created pair inherits at most its creator's count; existing
    // pairs only lose occurrences -> the argmax sequence cannot rise
    val counts = run1.map(_._4)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"counts must be non-increasing: $counts")
    val run2 = TextQueries.queries("text_bpe_merges")(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    assert(run1 == run2, "training must be deterministic")
  }

  test("BPE encode applies the learned merges: hand-computed tokens, round-trip, no residual pair") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa aa"), (2L, "aa aa aa aa ab"), (3L, "ab ab"))
      .toDF("doc_id", "text")
    val merges = graft.operators.CorpusOps.bpeTrain(docs, numMerges = 10)
    val vocab = graft.operators.CorpusOps.bpeEncode(docs, merges)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("n"),
        r.getAs[scala.collection.Seq[String]]("tokens").toSeq)).toSeq.sortBy(_._1)
    // merges learned: (a,</w>) (a,a</w>) (a,b) (ab,</w>) — hand-apply:
    // "aa" = [a a </w>] -> [a a</w>] -> [aa</w>]; "ab" -> [ab</w>]
    assert(vocab == Seq(("aa", 8L, Seq("aa</w>")), ("ab", 3L, Seq("ab</w>"))),
      s"got $vocab")
  }

  test("BPE encode invariants hold on the real corpus against the learned rules") {
    val corpus = Tables.load(spark, sf, "documents")
    val merges = graft.operators.CorpusOps.bpeTrain(corpus, numMerges = 12)
    val rules = merges.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(rules.nonEmpty)
    val vocab = graft.operators.CorpusOps.bpeEncode(corpus, merges).collect()
      .map(r => (r.getAs[String]("w"),
        r.getAs[scala.collection.Seq[String]]("tokens").toSeq))
    assert(vocab.nonEmpty)
    val ruleSet = rules.toSet
    vocab.foreach { case (w, tokens) =>
      // round-trip: tokens concatenate back to the word + end marker
      assert(tokens.mkString == w + "</w>", s"round-trip broke for '$w': $tokens")
      assert(tokens.length <= w.length + 1)
      // exhaustion: no adjacent pair equals any learned merge (later merges
      // cannot re-create an earlier rule's adjacency — merging two symbols
      // into a NEW symbol never makes two pre-existing symbols adjacent)
      tokens.zip(tokens.tail).foreach { p =>
        assert(!ruleSet.contains(p), s"residual mergeable pair $p in '$w'")
      }
    }
    // doc lengths are conserved sums of the vocab word lengths
    val lens = graft.operators.CorpusOps.bpeDocLengths(corpus, merges)
    val totals = lens.agg(sum("n_words"), sum("n_tokens")).collect().head
    val vocabTotals = graft.operators.CorpusOps.bpeEncode(corpus, merges)
      .select(sum(col("n")), sum(size(col("tokens")) * col("n")))
      .collect().head
    assert(totals.getLong(0) == vocabTotals.getLong(0))
    assert(totals.getLong(1) == vocabTotals.getLong(1))
    assert(totals.getLong(1) <= vocabTotals.getLong(0) * 1000) // sanity
  }

  test("mixture sample hits the target ratios, capped by the scarcest source") {
    import spark.implicits._
    // A supplies 10 docs at weight 2 -> T = 5; B has 20 at weight 1 ->
    // 20/1 = 20 doesn't bind. kA = floor(2*5) = 10, kB = floor(1*5) = 5.
    // C is unlisted and must be excluded entirely.
    val docs = ((1 to 10).map(i => (i.toLong, "A")) ++
      (11 to 30).map(i => (i.toLong, "B")) ++
      (31 to 35).map(i => (i.toLong, "C"))).toDF("doc_id", "source")
    val weights = Map("A" -> 2.0, "B" -> 1.0)
    val got = graft.operators.CorpusOps.mixtureSample(docs, weights)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.count(_._2 == "A") == 10)
    assert(got.count(_._2 == "B") == 5)
    assert(!got.exists(_._2 == "C"))
    // deterministic: a second run picks the identical sample
    val again = graft.operators.CorpusOps.mixtureSample(docs, weights)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == again)
    // salt pre-filter is recall-complete: 1 salt group == no pre-filter
    val unsalted = graft.operators.CorpusOps.mixtureSample(docs, weights, salts = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == unsalted)
  }

  test("intra-doc dedup keeps first occurrences and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y a b"),        // chunks: [x y][x y][a b] -> keep 1st + [a b]
      (2L, "a b c"),              // [a b][c] -> nothing repeated
      (3L, "k k k k k")           // [k k][k k][k] -> [k k][k]
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusOps.intraDocDedup(docs, chunkWords = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, "x y a b"),
      (2L, 2L, 2L, "a b c"),
      (3L, 3L, 2L, "k k k")), got.toSeq.toString)
  }

  test("boilerplate removal drops cross-doc shared chunks everywhere, empty docs hash empty") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared only in one a b c d e f g h i j"),
      (2L, s"$shared unique two x y z p q r s t u v"),
      (3L, shared) // entirely boilerplate -> clean_text must be ""
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusOps
      .boilerplateRemoval(docs, chunkWords = 10, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 22 words -> 3 chunks each (10 + 10 + trailing 2)
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, "only in one a b c d e f g h i j"),
      (2L, 3L, 1L, "unique two x y z p q r s t u v"),
      (3L, 1L, 1L, "")), got.toSeq.toString)
  }

  test("fullPrep materialization knob: localCheckpoint and parquet-stage are bit-identical") {
    // the scale knob must be purely an execution choice: the default
    // localCheckpoint path (single-machine) and the parquet-stage path (a
    // cluster's durable restart point) must produce the same bits
    val base = graft.Tables.load(spark, sf, "documents")
    def tmp(p: String) = tempDir(p)
    val a = graft.operators.PrepPipeline.fullPrep(base,
        tmp("fp-w1"), tmp("fp-s1"), tmp("fp-r1"), tmp("fp-g1"))
      .collect().map(_.toSeq).toSeq
    val stage = tempDir("fp-stage")
    val b = graft.operators.PrepPipeline.fullPrep(base,
        tmp("fp-w2"), tmp("fp-s2"), tmp("fp-r2"), tmp("fp-g2"),
        materialize = df => {
          df.write.mode("overwrite").parquet(stage)
          spark.read.parquet(stage)
        })
      .collect().map(_.toSeq).toSeq
    assert(a == b, s"materialization changed results:\n$a\nvs\n$b")
    assert(a.nonEmpty)
  }

  test("int8 quantization stats respect the truncation error bound") {
    val rows = PipelineQueries.queries("sim_quantize_int8")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mx = r.getAs[Double]("scale_mx")
      assert(mx > 0.0)
      assert(r.getAs[Long]("sum_abs_q") <= 127L * 64)
      assert(r.getAs[Long]("n_nonzero") <= 64)
      // truncation toward zero: |x - q*mx/127| < one step = mx/127
      assert(r.getAs[Double]("max_err") < mx / 127 + 1e-9,
        s"err ${r.getAs[Double]("max_err")} vs step ${mx / 127}")
    }
  }
}
