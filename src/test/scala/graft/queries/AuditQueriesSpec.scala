package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Exactness + invariant bars for the round-7 evaluation/audit queries
  * (ROC-AUC, calibration, centroid silhouette, KS drift, OLS, JSONL
  * round-trip). The DuckDB oracles prove cross-engine equality; these
  * prove the MATH — each statistic is recomputed brute-force on the
  * collected sf0.001 corpus and compared exactly. */
class AuditQueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("text_quality_auc equals the brute-force pairwise AUC exactly") {
    val row = TextQueries.queries("text_quality_auc")(spark, sf).collect()(0)
    val aucPpm = row.getAs[Long]("auc_ppm")
    assert(aucPpm >= 0L && aucPpm <= 1000000L)
    // better than chance on its own training corpus
    assert(aucPpm > 500000L, s"trained model AUC at chance: $aucPpm")

    // brute force: P(score_pos > score_neg) + 0.5 P(tie) over ALL pairs
    val scored = graft.operators.QualityModel
      .scoreAgainst(graft.Tables.load(spark, sf, "documents"),
        TextQueries.QualityModelFixturePath)
      .select("score_fp", "label").collect()
      .map(r => (r.getAs[Long]("score_fp"), r.getAs[Boolean]("label")))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(row.getAs[Long]("n_pos") == pos.length.toLong)
    assert(row.getAs[Long]("n_neg") == neg.length.toLong)
    var u2 = 0L // doubled U so ties stay integer
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = math.floor(
      u2.toDouble * 1000000.0 / (pos.length.toDouble * neg.length * 2.0)).toLong
    assert(aucPpm == expected, s"query $aucPpm vs brute $expected")
    assert(row.getAs[Long]("gini_ppm") == aucPpm * 2 - 1000000L)
  }

  test("text_quality_calibration partitions the corpus and bounds rates") {
    val rows = TextQueries.queries("text_quality_calibration")(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("n_pred") <= r.getAs[Long]("n"))
      val ppm = r.getAs[Long]("pos_rate_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("sim_silhouette matches a brute-force recomputation exactly") {
    val got = SimilarityQueries.queries("sim_silhouette")(spark, sf).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("mean_sil_ppm"))).toMap
    got.values.foreach { case (_, s) =>
      assert(s >= -1000000L && s <= 1000000L)
    }

    // brute force on the collected corpus, same fixed-point chain
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Double](2).map(x => math.floor(x * 1000000).toLong).toArray))
    val dim = vecs.head._3.length
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(dim) { i =>
        math.floor(vs.map(_._3(i)).sum.toDouble / vs.length).toLong
      }
    }
    def d2(a: Array[Long], c: Array[Long]): Long =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val silByLabel = vecs.groupBy(_._2).map { case (l, vs) =>
      val sfps = vs.map { case (_, lab, v) =>
        val a2 = d2(v, cents(lab))
        val b2 = cents.filter(_._1 != lab).values.map(c => d2(v, c)).min
        if (a2 == 0L && b2 == 0L) 0L
        else math.floor(1000000.0 * (math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
          math.max(math.sqrt(a2.toDouble), math.sqrt(b2.toDouble))).toLong
      }
      l -> (vs.length.toLong, math.floor(sfps.sum.toDouble / sfps.length).toLong)
    }
    assert(got == silByLabel, s"query $got vs brute $silByLabel")
  }

  test("pipe_ks_drift matches a brute-force ECDF recomputation exactly") {
    val row = PipelineQueries.queries("pipe_ks_drift")(spark, sf).collect()(0)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("v")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("v")))
    val a = docs.filter(_._1 % 2 == 0).map(_._2)
    val b = docs.filter(_._1 % 2 != 0).map(_._2)
    assert(row.getAs[Long]("n_a") == a.length.toLong)
    assert(row.getAs[Long]("n_b") == b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val dNum = values.map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.max
    assert(row.getAs[Long]("d_num") == dNum, s"${row.getAs[Long]("d_num")} vs $dNum")
    val ksPpm = row.getAs[Long]("ks_ppm")
    assert(ksPpm >= 0L && ksPpm <= 1000000L)
    assert(ksPpm ==
      math.floor(dNum.toDouble * 1000000.0 / (a.length.toDouble * b.length)).toLong)
  }

  test("q_linreg matches brute-force least squares on the raw rows") {
    val rows = ScalarQueries.queries("q_linreg")(spark, sf).collect()
    val data = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("x"), r.getAs[Long]("y")))
      .groupBy(_._1)
    rows.foreach { r =>
      val g = data(r.getString(0))
      val n = g.length.toDouble
      val sx = g.map(_._2).sum.toDouble
      val sy = g.map(_._3).sum.toDouble
      val sxy = g.map(t => t._2 * t._3).sum.toDouble
      val sxx = g.map(t => t._2 * t._2).sum.toDouble
      val syy = g.map(t => t._3 * t._3).sum.toDouble
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(r.getAs[Long]("slope_ppm") == math.floor(1000000.0 * num / den).toLong)
      assert(r.getAs[Long]("icept_4") ==
        math.floor(10000.0 * (sy - num / den * sx) / n).toLong)
      val r2 = r.getAs[Long]("r2_ppm")
      assert(r2 >= 0L && r2 <= 1000000L)
      assert(r2 == math.floor(1000000.0 * num * num / (den * (n * syy - sy * sy))).toLong)
    }
  }

  test("flo_causal_depth pointer doubling matches a sequential parent walk exactly") {
    val hist = FloQueries.queries("flo_causal_depth")(spark, sf).collect()
      .map(r => r.getAs[Long]("depth") -> r.getAs[Long]("n_events")).toMap
    val ids = graft.Tables.floEvents(spark, sf)
      .select("event_counter").collect().map(_.getLong(0))
    def parent(e: Long): Option[Long] = {
      val p = e - (e % 997 + 1)
      if (p >= 1) Some(p) else None
    }
    val depth = scala.collection.mutable.Map.empty[Long, Long]
    def walk(e: Long): Long = depth.getOrElseUpdate(e,
      parent(e).map(p => walk(p) + 1).getOrElse(0L))
    val expected = ids.map(walk).groupBy(identity)
      .map { case (d, xs) => d -> xs.length.toLong }
    assert(hist == expected, s"query $hist vs walk $expected")
    assert(hist.values.sum == ids.length.toLong)
  }

  test("dedup_threshold_sweep is monotone: higher cuts keep fewer pairs and docs") {
    val rows = DedupQueries.queries("dedup_threshold_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("thr_milli"))
    assert(rows.length == 7)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("n_pairs") <= lo.getAs[Long]("n_pairs"))
      assert(hi.getAs[Long]("n_docs") <= lo.getAs[Long]("n_docs"))
    }
    // the 500 cut agrees with the oracle-checked 0.5 detector
    val at500 = rows.find(_.getAs[Long]("thr_milli") == 500L).get
    val direct = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).count()
    assert(at500.getAs[Long]("n_pairs") == direct)
  }

  test("text_quality_pr: recall falls with the threshold, endpoints sane") {
    val rows = TextQueries.queries("text_quality_pr")(spark, sf).collect()
      .sortBy(_.getAs[Long]("thr_fp"))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("recall_ppm") <= lo.getAs[Long]("recall_ppm"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("precision_ppm") >= 0L &&
        r.getAs[Long]("precision_ppm") <= 1000000L)
    }
    // threshold 0 admits everything: recall 1.0
    assert(rows.head.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("text_langid_confusion covers the corpus and its diagonal is text_langid's accuracy") {
    val rows = TextQueries.queries("text_langid_confusion")(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    // shares are floor-ppm of a partition: they sum to <= 1e6 and within
    // |cells| of it
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length)
  }

  test("sim_embedding_drift: identical halves drift zero, shifted halves don't") {
    import spark.implicits._
    // synthetic: same vectors in both halves -> centroids equal -> 0
    val vs = (0 until 40).map { i =>
      (i.toLong, i % 3, Array.tabulate(8)(j => (i % 5 + j).toDouble / 10.0))
    }
    val dup = vs.map { case (id, l, v) => (id * 2, l, v) } ++
      vs.map { case (id, l, v) => (id * 2 + 1, l, v) } // even/odd twins
    val df = dup.toDF("vec_id", "label", "v")
    val e = df.select(col("vec_id"), col("label"),
      posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x") * 1000000).cast("long").as("xfp"),
        (col("vec_id") % 2 === 0).as("in_a"))
    def cent(flag: Boolean) = e.filter(col("in_a") === flag)
      .groupBy("label", "pos")
      .agg(floor(sum("xfp").cast("double") / count(lit(1))).as("c"))
    val drift = cent(true).withColumnRenamed("c", "ca")
      .join(cent(false).withColumnRenamed("c", "cb"), Seq("label", "pos"))
      .groupBy("label")
      .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("d2"))
      .collect()
    drift.foreach(r => assert(r.getAs[Long]("d2") == 0L, r.toString))
    // and the catalog query runs with plausible magnitudes on real data
    val real = SimilarityQueries.queries("sim_embedding_drift")(spark, sf).collect()
    assert(real.length == 10)
    real.foreach(r => assert(r.getAs[Long]("drift_fp") >= 0L))
  }

  test("merge upsert: deletes win over updates, inserts appear, kept rows unchanged") {
    val rows = PipelineQueries.queries("pipe_merge_upsert")(spark, sf).collect()
    val base = graft.Tables.load(spark, sf, "documents")
    val n = base.count()
    val deleted = base.filter(col("doc_id") % 11 === 0).count()
    val inserted = base.filter(col("doc_id") % 13 === 0).count()
    // updates exclude ids that are ALSO deleted (delete priority)
    val updated = base.filter(col("doc_id") % 7 === 0 &&
      col("doc_id") % 11 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n - deleted + inserted)
    assert(rows.map(_.getAs[Long]("n_updated")).sum == updated)
    assert(rows.map(_.getAs[Long]("n_inserted")).sum == inserted)
    assert(rows.map(_.getAs[Long]("n_kept")).sum == n - deleted - updated)
  }

  test("as-of tolerance matches are exactly the untolerated matches within the window") {
    val tol = AnalyticsQueries.queries("q_asof_tolerance")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.get(r.fieldIndex("asof_purchase_id"))),
          Option(r.get(r.fieldIndex("gap_sec"))))).toMap
    val base = AnalyticsQueries.queries("q_asof_join")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("asof_purchase_id")))).toMap
    assert(tol.keySet == base.keySet)
    tol.foreach { case (id, (pid, gap)) =>
      (pid, gap) match {
        case (Some(p), Some(g)) =>
          // a tolerated match must be THE as-of match, within the window
          assert(base(id).contains(p), s"event $id: $p vs ${base(id)}")
          assert(g.asInstanceOf[Long] >= 0L && g.asInstanceOf[Long] <= 3600L)
        case (None, None) => // no match or out of window — consistent nulls
        case other => fail(s"event $id: inconsistent null pattern $other")
      }
    }
    // the tolerance genuinely cuts something on this data
    val baseMatches = base.values.count(_.isDefined)
    val tolMatches = tol.values.count(_._1.isDefined)
    assert(tolMatches < baseMatches, s"$tolMatches !< $baseMatches")
  }

  test("jsonl read path counts corrupt rows instead of failing") {
    val dir = tempDir("jsonl-corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "source": "s", "text": "good row"}
        |this line is not json at all
        |{"doc_id": 2, "source": "s", "text": "another good row"}
        |{"doc_id": "not-a-number", "source": "s", "text": "type mismatch"}
        |""".stripMargin)
    // Spark refuses a query whose only referenced file column is the
    // corrupt-record column (it would always be empty after pruning);
    // cache() materializes the parse so the audit filters are legal —
    // the catalog query avoids this by aggregating real columns alongside
    val back = spark.read
      .schema("doc_id LONG, source STRING, text STRING, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache()
    try {
      assert(back.count() == 4)
      assert(back.filter(col("_corrupt").isNotNull).count() == 2)
      assert(back.filter(col("_corrupt").isNull && col("doc_id").isNotNull).count() == 2)
    } finally back.unpersist()
  }

  test("pipe_curriculum phases partition the corpus into quartile-bounded slices") {
    val rows = PipelineQueries.queries("pipe_curriculum")(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("docs")).sum == n)
    val byPhase = rows.groupBy(_.getAs[Long]("phase"))
      .view.mapValues(_.map(_.getAs[Long]("docs")).sum).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L))
    // quartile thresholds: each phase holds ~n/4 (ties can shift docs
    // across a threshold, so allow a generous band)
    byPhase.values.foreach(c => assert(c >= n / 8 && c <= n * 3 / 8, byPhase))
  }

  test("pipe_contrastive_pairs is a within-bucket permutation with no self-pairs") {
    val rows = PipelineQueries.queries("pipe_contrastive_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != r.getAs[Long]("neg_doc_id"))
      assert(r.getAs[String]("anchor").split(" ").length == 8)
      assert(r.getAs[String]("positive").split(" ").length == 8)
    }
    // the ring is a bijection: every consumer appears exactly once on both
    // sides, so negatives are a permutation of the consumers
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("neg_doc_id")).distinct.length == rows.length)
    // each negative really is the neighbor's positive chunk
    val posById = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("positive")).toMap
    rows.foreach { r =>
      posById.get(r.getAs[Long]("neg_doc_id")).foreach { p =>
        assert(r.getAs[String]("negative") == p)
      }
    }
  }

  test("pipe_mixture_plan waterfills exactly: caps respected, budget met by floor") {
    val rows = PipelineQueries.queries("pipe_mixture_plan")(spark, sf).collect()
    val availTot = rows.map(_.getAs[Long]("avail")).sum
    val b = availTot / 2
    rows.foreach { r =>
      val alloc = r.getAs[Long]("alloc")
      assert(alloc >= 0L && alloc <= r.getAs[Long]("avail"))
      if (r.getAs[Boolean]("saturated"))
        assert(alloc == r.getAs[Long]("avail"))
    }
    val allocTot = rows.map(_.getAs[Long]("alloc")).sum
    val unsatW = rows.filterNot(_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("weight")).sum
    assert(allocTot <= b)
    // floor division leaves < 1 token per unit of unsaturated weight
    assert(b - allocTot <= math.max(unsatW, 1L), s"alloc $allocTot of $b")
    // unsaturated sources split the residual exactly proportionally (floor)
    val satAvail = rows.filter(_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("avail")).sum
    rows.filterNot(_.getAs[Boolean]("saturated")).foreach { r =>
      assert(r.getAs[Long]("alloc") ==
        (b - satAvail) * r.getAs[Long]("weight") / math.max(unsatW, 1L))
    }
  }

  test("pipe_padding_waste buckets partition the corpus with bounded waste") {
    val rows = PipelineQueries.queries("pipe_padding_waste")(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("docs")).sum == n)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("bucket_waste_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      val ub = r.getAs[Long]("bucket_ub")
      // no truncation in this corpus: pad + tokens == docs * bound exactly
      if (ub < 2048L)
        assert(r.getAs[Long]("bucket_pad") + r.getAs[Long]("tokens") ==
          r.getAs[Long]("docs") * ub)
    }
  }

  test("observe() yields per-gate telemetry from ONE pass of the cleaning pipeline") {
    // single-pass pipeline observability: counts of what each gate dropped,
    // collected by the Observation API during the SAME action that produces
    // the output — no second scan per metric (at 100 TB, re-counting each
    // stage separately would multiply the corpus reads by the stage count)
    import org.apache.spark.sql.Observation
    val nTokens = size(split(trim(col("text")), " +"))
    val obs = Observation("clean_telemetry")
    val base = graft.Tables.load(spark, sf, "documents")
    val out = base
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(nTokens < 5, 1L).otherwise(0L)).as("n_too_short"),
        sum(length(col("text"))).as("chars_in"))
      .filter(nTokens >= 5)
    val survivors = out.count()
    val m = obs.get
    assert(m("n_in") == base.count())
    assert(m("n_in").asInstanceOf[Long] - m("n_too_short").asInstanceOf[Long]
      == survivors)
    assert(m("chars_in").asInstanceOf[Long] > 0L)
  }

  test("pipe_jsonl_roundtrip reports zero corrupt rows on the real corpus") {
    val rows = PipelineQueries.queries("pipe_jsonl_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_corrupt")).sum == 0L)
  }
}
