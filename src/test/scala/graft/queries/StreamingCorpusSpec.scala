package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.FloEngine
import graft.engine.FloEngine.EventStreamOptions
import graft.functions.payload_utf8

/**
 * Corpus-prep operators on the LIVE stream: the same stateless column
 * pipeline (payload decode -> quality gate -> normalize -> fingerprint ->
 * deterministic hash sample) runs unchanged on `consumeStream`, with
 * `dropDuplicates` adding cross-micro-batch dedup state — the streaming
 * twin of `pipe_clean_corpus`. Structured Streaming plans the identical
 * expressions incrementally, which is the point: one pipeline definition
 * serves the 100 TB backfill (batch) and the live tail.
 */
class StreamingCorpusSpec extends SparkSuite {

  /** The shared pipeline: decode, gate docs under 5 tokens, fingerprint the
    * normalized text, keep a deterministic ~75% hash sample (first hex
    * nibble < 'c' = 12/16), dedup on the fingerprint. Works on any
    * flo-envelope DataFrame, batch or streaming. */
  private def prep(df: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    df.select(col("event_counter").as("doc_id"),
        payload_utf8(col("data")).as("text"))
      .filter(size(split(trim(col("text")), " +")) >= 5)
      .withColumn("fp", md5(norm))
      .filter(substring(md5(concat(lit("graft:"), col("fp"))), 1, 1) < "c")
      .dropDuplicates("fp")
  }

  test("batch and streaming runs of one pipeline agree; later-batch duplicates are suppressed by state") {
    val root = tempDir("flo-corpus-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    val longDoc = (i: Int) => s"the quick brown fox number $i jumps over the lazy dog"
    val batch1 = (1 to 20).map(i => s"/docs/en/$i" -> longDoc(i)) ++
      Seq("/docs/short/1" -> "too short", // fails the 5-token gate
        "/docs/en/dup" -> longDoc(3))     // exact dup of doc 3 inside batch 1
    e.produceStrings("docs", 1, batch1)

    val q = prep(e.consumeStream("docs"))
      .writeStream.format("memory").queryName("corpus_prep").start()
    try {
      q.processAllAvailable()
      val streamed1 = spark.table("corpus_prep").collect()
      val expected1 = prep(e.read("docs")).collect()
      assert(streamed1.map(_.getAs[String]("fp")).toSet ==
        expected1.map(_.getAs[String]("fp")).toSet,
        "streaming and batch runs of the same pipeline must keep the same fingerprints")
      assert(streamed1.length == expected1.length)

      // a second micro-batch: new docs plus a re-send of doc 5's text — the
      // stream's dedup state must suppress the re-send, the batch run agrees
      e.produceStrings("docs", 1,
        (30 to 35).map(i => s"/docs/en/$i" -> longDoc(i)) :+
          ("/docs/en/redup" -> longDoc(5)))
      q.processAllAvailable()
      val streamed2 = spark.table("corpus_prep").collect()
      val expected2 = prep(e.read("docs")).collect()
      assert(streamed2.map(_.getAs[String]("fp")).toSet ==
        expected2.map(_.getAs[String]("fp")).toSet)
      assert(streamed2.map(_.getAs[String]("fp")).distinct.length == streamed2.length,
        "no fingerprint may be emitted twice across micro-batches")
    } finally q.stop()
  }

  test("drift monitor readings equal the batch KS recomputation after every micro-batch") {
    val root = tempDir("flo-drift-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    def doc(words: Int, i: Int) =
      (Seq.fill(words - 1)("w") :+ s"tail$i").mkString(" ")
    // reference corpus: lengths 5..14
    val refTexts = (0 until 50).map(i => doc(5 + i % 10, i))
    val ref = spark.createDataFrame(
      refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    ).toDF("doc_id", "text")
      .select(size(split(trim(col("text")), " +")).cast("long").as("v"))

    val mon = new graft.streaming.DriftMonitor(ref, "v")
    val lens = prepLens(e.consumeStream("docs"))
    val q = mon.attach(lens).start()
    try {
      // batch 1: same length profile as the reference -> small KS
      e.produceStrings("docs", 1,
        (0 until 50).map(i => s"/docs/a/$i" -> doc(5 + i % 10, i)))
      q.processAllAvailable()
      assert(mon.readings.nonEmpty)
      // batch 2: shifted profile (lengths 25..34) -> KS must jump and the
      // reading must STILL equal the batch recomputation over all data
      e.produceStrings("docs", 1,
        (0 until 50).map(i => s"/docs/b/$i" -> doc(25 + i % 10, i)))
      q.processAllAvailable()

      val expectAll = graft.operators.EvalOps
        .ksDrift(prepLens(e.read("docs")), ref, "v").collect()(0)
      val last = mon.readings.last
      assert(last._2 == expectAll.getAs[Long]("n_a"))
      assert(last._4 == expectAll.getAs[Long]("ks_ppm"),
        s"monitor ${last._4} vs batch ${expectAll.getAs[Long]("ks_ppm")}")
      assert(last._5 == expectAll.getAs[Boolean]("reject_05"))
      // the shift batch must raise the statistic
      assert(mon.readings.last._4 > mon.readings.head._4,
        s"readings: ${mon.readings}")
      // current() agrees with the recorded last reading
      assert(mon.current().get.getAs[Long]("ks_ppm") == last._4)
    } finally q.stop()
  }

  test("persisted drift monitor survives a restart: restored histogram equals stream-so-far") {
    val root = tempDir("flo-drift-persist")
    val persist = tempDir("flo-drift-hist")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    def doc(words: Int, i: Int) =
      (Seq.fill(words - 1)("w") :+ s"tail$i").mkString(" ")
    val ref = spark.createDataFrame(
      (0 until 50).map(i => (i.toLong, doc(5 + i % 10, i)))
    ).toDF("doc_id", "text")
      .select(size(split(trim(col("text")), " +")).cast("long").as("v"))

    // run 1: two batches fold into the persisted histogram; the query
    // checkpoints so the restart below is a REAL restart (offsets and
    // batch ids continue; uncommitted batches replay)
    val cp = tempDir("flo-drift-cp")
    val mon1 = new graft.streaming.DriftMonitor(ref, "v", Some(persist))
    val q1 = mon1.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp).start()
    try {
      e.produceStrings("docs", 1,
        (0 until 40).map(i => s"/docs/a/$i" -> doc(5 + i % 10, i)))
      q1.processAllAvailable()
      e.produceStrings("docs", 1,
        (0 until 40).map(i => s"/docs/b/$i" -> doc(25 + i % 10, i)))
      q1.processAllAvailable()
    } finally q1.stop()
    val lastRun1 = mon1.readings.last

    // "restart": a FRESH monitor instance on the same persistDir — the
    // in-memory histogram is gone, the committed one must restore; its
    // current() must equal both run 1's last reading AND the batch
    // recomputation over all data seen so far (the invariant a driver-
    // memory-only monitor silently violates after restart)
    val mon2 = new graft.streaming.DriftMonitor(ref, "v", Some(persist))
    val restored = mon2.current().get
    assert(restored.getAs[Long]("ks_ppm") == lastRun1._4)
    val expectAll = graft.operators.EvalOps
      .ksDrift(prepLens(e.read("docs")), ref, "v").collect()(0)
    assert(restored.getAs[Long]("n_a") == expectAll.getAs[Long]("n_a"))
    assert(restored.getAs[Long]("ks_ppm") == expectAll.getAs[Long]("ks_ppm"))

    // the restarted query (same checkpoint) keeps folding on top of the
    // restored state — only NEW offsets arrive, batch ids continue
    val q2 = mon2.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp).start()
    try {
      e.produceStrings("docs", 1,
        (0 until 20).map(i => s"/docs/c/$i" -> doc(45 + i % 5, i)))
      q2.processAllAvailable()
    } finally q2.stop()
    val expectAll2 = graft.operators.EvalOps
      .ksDrift(prepLens(e.read("docs")), ref, "v").collect()(0)
    assert(mon2.readings.nonEmpty)
    assert(mon2.readings.last._2 == expectAll2.getAs[Long]("n_a"))
    assert(mon2.readings.last._4 == expectAll2.getAs[Long]("ks_ppm"),
      s"resumed monitor ${mon2.readings.last._4} vs batch ${expectAll2.getAs[Long]("ks_ppm")}")
  }

  /** token-length view of a flo doc stream (batch or streaming). */
  private def prepLens(df: DataFrame): DataFrame =
    df.select(payload_utf8(col("data")).as("text"))
      .select(size(split(trim(col("text")), " +")).cast("long").as("v"))

  test("drift monitor identity stamp: a reset checkpoint over an old persistDir fails loudly") {
    val root = tempDir("flo-drift-ident")
    val persist = tempDir("flo-drift-ident-hist")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))
    def doc(words: Int, i: Int) =
      (Seq.fill(words - 1)("w") :+ s"t$i").mkString(" ")
    val ref = spark.createDataFrame(
      (0 until 20).map(i => (i.toLong, doc(5 + i % 5, i)))
    ).toDF("doc_id", "text")
      .select(size(split(trim(col("text")), " +")).cast("long").as("v"))

    // run 1 commits ONLY batch 0 — the exact shape the batch-id fail-fast
    // cannot see (a fresh checkpoint's first batch is also id 0)
    val cp1 = tempDir("flo-drift-ident-cp1")
    val mon1 = new graft.streaming.DriftMonitor(ref, "v", Some(persist), Some(cp1))
    val q1 = mon1.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp1).start()
    try {
      e.produceStrings("docs", 1,
        (0 until 10).map(i => s"/docs/a/$i" -> doc(5 + i % 5, i)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(mon1.readings.nonEmpty)

    // legit continuation: SAME checkpoint, same persistDir — restores and
    // keeps folding
    val mon2 = new graft.streaming.DriftMonitor(ref, "v", Some(persist), Some(cp1))
    val q2 = mon2.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp1).start()
    try {
      e.produceStrings("docs", 1,
        (0 until 10).map(i => s"/docs/b/$i" -> doc(7 + i % 5, i)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(mon2.readings.nonEmpty)

    // misuse: FRESH checkpoint (new query id), old persistDir — before
    // the stamp, its batch 0 masqueraded as a legit replay of the old
    // run's batch 0 and silently restored the stale histogram; now the
    // identity mismatch fails the query descriptively
    val cp2 = tempDir("flo-drift-ident-cp2")
    val mon3 = new graft.streaming.DriftMonitor(ref, "v", Some(persist), Some(cp2))
    val q3 = mon3.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp2).start()
    val err = intercept[Exception] {
      e.produceStrings("docs", 1, Seq(s"/docs/c/0" -> doc(6, 0)))
      q3.processAllAvailable()
    }
    q3.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("stamped with query id")),
      s"want the identity-mismatch message, got: ${messages(err)}")
    assert(mon3.readings.isEmpty, "the mismatched run must not record readings")
  }

  test("drift monitor identity stamp: an empty (crash-artifact) stamp self-heals") {
    val root = tempDir("flo-drift-heal")
    val persist = tempDir("flo-drift-heal-hist")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))
    def doc(words: Int, i: Int) =
      (Seq.fill(words - 1)("w") :+ s"t$i").mkString(" ")
    val ref = spark.createDataFrame(
      (0 until 20).map(i => (i.toLong, doc(5 + i % 5, i)))
    ).toDF("doc_id", "text")
      .select(size(split(trim(col("text")), " +")).cast("long").as("v"))

    // a crash between create() and write() leaves a zero-byte stamp; it
    // must read as ABSENT (re-stamped with this run's id), not fail every
    // later run with "stamped with query id ''"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(persist, "_run_identity"), Array.empty[Byte])
    val cp = tempDir("flo-drift-heal-cp")
    val mon = new graft.streaming.DriftMonitor(ref, "v", Some(persist), Some(cp))
    val q = mon.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp).start()
    try {
      e.produceStrings("docs", 1,
        (0 until 10).map(i => s"/docs/a/$i" -> doc(5 + i % 5, i)))
      q.processAllAvailable()
    } finally q.stop()
    assert(mon.readings.nonEmpty, "the healed run must process batches")
    val stamped = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(persist, "_run_identity")), "UTF-8").trim
    assert(stamped.nonEmpty, "the stamp must be re-written with the real id")
    // and the re-written stamp still guards: a fresh checkpoint now fails
    val cp2 = tempDir("flo-drift-heal-cp2")
    val mon2 = new graft.streaming.DriftMonitor(ref, "v", Some(persist), Some(cp2))
    val q2 = mon2.attach(prepLens(e.consumeStream("docs")))
      .option("checkpointLocation", cp2).start()
    val err = intercept[Exception] {
      e.produceStrings("docs", 1, Seq(s"/docs/c/0" -> doc(6, 0)))
      q2.processAllAvailable()
    }
    q2.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("stamped with query id")),
      s"want the identity-mismatch message, got: ${messages(err)}")
  }

  test("quota guard admits the greedy per-source prefix and stays exhausted across batches") {
    import graft.streaming.QuotaGuard
    val root = tempDir("flo-quota-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    def doc(words: Int) = Seq.fill(words)("w").mkString(" ")
    // two sources with known token supplies; quotas below supply so the
    // guard must actually cut off
    val quotas = Map("big" -> 40L, "small" -> 25L)
    def docsView(df: DataFrame): DataFrame = df.select(
      col("event_counter").as("doc_id"),
      regexp_extract(col("namespace"), "/docs/([a-z]+)/", 1).as("source"),
      payload_utf8(col("data")).as("text"))

    val q = QuotaGuard.admit(QuotaGuard.tokenized(
        docsView(e.consumeStream("docs"))), quotas)
      .toDF().writeStream.format("memory").queryName("quota_admit").start()
    try {
      // batch 1: big gets 3x10 tokens (admits 3, cap 40), small 2x10
      // (admits 2, cap 25 -> second blocked at 20+10? no: 20 <= 25 admits,
      // third would be 30 > 25)
      e.produceStrings("docs", 1,
        (1 to 3).map(i => s"/docs/big/$i" -> doc(10)) ++
          (1 to 2).map(i => s"/docs/small/$i" -> doc(10)))
      q.processAllAvailable()
      // batch 2: big sends 2 more 10s (only ONE fits: 30+10=40 exactly),
      // small sends a 10 (blocked: 20+10=30>25) then a 5 (fits: 25 exactly)
      e.produceStrings("docs", 1,
        (4 to 5).map(i => s"/docs/big/$i" -> doc(10)) ++
          Seq("/docs/small/3" -> doc(10), "/docs/small/4" -> doc(5)))
      q.processAllAvailable()

      val rows = spark.table("quota_admit").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
          r.getAs[Long]("used_after")))
      val bySource = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(bySource("big") == 40L, s"big spent ${bySource("big")}")
      assert(bySource("small") == 25L, s"small spent ${bySource("small")}")
      // used_after trajectories never exceed the quota
      rows.foreach { case (src, _, after) => assert(after <= quotas(src)) }
      // replay the same admission greedily in test code over the batch
      // boundaries: big admits 4 of 5 docs, small admits 3 of 4
      assert(rows.count(_._1 == "big") == 4)
      assert(rows.count(_._1 == "small") == 3)
    } finally q.stop()
  }

  test("transformWithState quota guard (new state API) admits the identical set") {
    import graft.streaming.{QuotaGuard, QuotaGuardV2}
    val root = tempDir("flo-quota-v2")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))
    def doc(words: Int) = Seq.fill(words)("w").mkString(" ")
    val quotas = Map("big" -> 40L, "small" -> 25L)
    def docsView(df: DataFrame): DataFrame = df.select(
      col("event_counter").as("doc_id"),
      regexp_extract(col("namespace"), "/docs/([a-z]+)/", 1).as("source"),
      payload_utf8(col("data")).as("text"))
    e.produceStrings("docs", 1,
      (1 to 3).map(i => s"/docs/big/$i" -> doc(10)) ++
        (1 to 2).map(i => s"/docs/small/$i" -> doc(10)))

    // the new API requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = QuotaGuardV2.admit(QuotaGuard.tokenized(
          docsView(e.consumeStream("docs"))), quotas)
        .toDF().writeStream.format("memory").queryName("quota_v2").start()
      try {
        q.processAllAvailable()
        // second batch exercises cross-batch state on the new store
        e.produceStrings("docs", 1,
          (4 to 5).map(i => s"/docs/big/$i" -> doc(10)) ++
            Seq("/docs/small/3" -> doc(10), "/docs/small/4" -> doc(5)))
        q.processAllAvailable()
        val v2 = spark.table("quota_v2").collect()
          .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
            r.getAs[Long]("tokens"), r.getAs[Long]("used_after"))).toSet
        // identical to the classic mapGroupsWithState admission on the
        // same replay (its expected set is pinned in the test above:
        // big admits 4 of 5, small 3 of 4, exact quota fills)
        val byStr = v2.toSeq.groupBy(_._1)
          .view.mapValues(_.map(_._3).sum).toMap
        assert(byStr("big") == 40L && byStr("small") == 25L, v2.toString)
        assert(v2.count(_._1 == "big") == 4 && v2.count(_._1 == "small") == 3)
        v2.foreach { case (src, _, _, after) => assert(after <= quotas(src)) }
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("quota guard matches the waterfill plan end to end (plan offline, enforce live)") {
    import graft.streaming.QuotaGuard
    val root = tempDir("flo-quota-plan")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))
    def doc(words: Int, i: Int) =
      (Seq.fill(words - 1)("w") :+ s"t$i").mkString(" ")
    val corpus = (0 until 40).map { i =>
      (s"src${i % 4}", s"/docs/src${i % 4}/$i", doc(5 + i % 7, i))
    }
    e.produceStrings("docs", 1, corpus.map { case (_, ns, t) => ns -> t })

    // plan the mixture on the full (already-ingested) corpus
    def docsView(df: DataFrame): DataFrame = df.select(
      col("event_counter").as("doc_id"),
      regexp_extract(col("namespace"), "/docs/([a-z0-9]+)/", 1).as("source"),
      payload_utf8(col("data")).as("text"))
    val avail = docsView(e.read("docs"))
      .select(col("source"), size(split(trim(col("text")), " +")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("avail"))
    val plan = graft.operators.EvalOps.waterfill(avail).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap

    // enforce it on a replay of the same corpus
    val q = QuotaGuard.admit(QuotaGuard.tokenized(
        docsView(e.consumeStream("docs"))), plan)
      .toDF().writeStream.format("memory").queryName("quota_plan").start()
    try {
      q.processAllAvailable()
      val spent = spark.table("quota_plan").collect()
        .groupBy(_.getAs[String]("source"))
        .view.mapValues(_.map(_.getAs[Long]("tokens")).sum).toMap
      plan.foreach { case (src, alloc) =>
        assert(spent.getOrElse(src, 0L) <= alloc,
          s"$src spent ${spent.getOrElse(src, 0L)} over $alloc")
        // greedy admission fills to within one max-doc of the allocation
        val maxDoc = 11L
        assert(spent.getOrElse(src, 0L) >= alloc - maxDoc || alloc == 0L,
          s"$src underfilled: ${spent.getOrElse(src, 0L)} of $alloc")
      }
    } finally q.stop()
  }

  test("ppjoin decontamination guard on the live stream matches the batch R-S join") {
    import graft.operators.CorpusOps
    val root = tempDir("flo-ppjoin-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    val s = spark
    import s.implicits._
    // static eval set (the contamination reference); streamed docs include
    // one near-dup of each eval doc, one per micro-batch
    val eval = Seq(
      (900L, "held out question alpha beta gamma delta epsilon zeta"),
      (901L, "another benchmark prompt one two three four five six"))
    val evalDf = eval.toDF("doc_id", "text").localCheckpoint(true)
    val batch1 = Seq(
      11L -> "held out question alpha beta gamma delta epsilon edited",
      12L -> "completely unrelated training document with its own words")
    val batch2 = Seq(
      21L -> "another benchmark prompt one two three four five altered",
      22L -> "more clean training text nothing shared with the eval set")

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = e.consumeStream("docs")
      .select(col("namespace"), payload_utf8(col("data")).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // localCheckpoint: ppjoinAcross reads the batch side in several
        // subtrees (grams -> union df -> perDoc -> prefixes -> verify) and
        // a foreachBatch DF's plan cannot be safely self-referenced
        val docsB = batch.select(
            substring_index(col("namespace"), "/", -1).cast("long").as("doc_id"),
            col("text"))
          .localCheckpoint(true)
        val pairs = CorpusOps.ppjoinAcross(evalDf, docsB, pct = 50)
          .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
        flagged.synchronized { flagged ++= pairs }
        ()
      }
      .start()
    try {
      e.produceStrings("docs", 1, batch1.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
      e.produceStrings("docs", 1, batch2.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
    } finally q.stop()

    // batch-parity: the one-shot R-S join over everything streamed must
    // flag exactly the same (eval, train) pairs — per-batch df differs
    // from the full-corpus df, but PPJoin is LOSSLESS under any
    // consistent gram order, so the verified answer cannot depend on it
    val expected = CorpusOps.ppjoinAcross(
        evalDf, (batch1 ++ batch2).toDF("doc_id", "text"), pct = 50)
      .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
      .toSet
    assert(expected == Set((900L, 11L), (901L, 21L)),
      s"planted contamination must be what the batch join finds: $expected")
    assert(flagged.toSet == expected,
      s"stream flagged ${flagged.toSet}, batch found $expected")
  }

  test("incremental near-dup over the accumulated band index matches the batch operator on a planted-dup replay") {
    import graft.operators.CorpusOps
    val root = tempDir("flo-neardup-stream")
    val idxDir = s"$root/index"
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    // 1..10 historical; 11..30 streamed in two micro-batches. Planted:
    // 12 ~ 3 (stream vs HISTORY), 14 ~ 11 (both in batch 1), 22 ~ 13
    // (batch 2 vs batch 1 — only visible if the index actually ACCUMULATES).
    // Docs draw from DISJOINT vocabulary slices of 4-letter words (minhash
    // shingles are character-level: numeric suffixes like doc "1" vs "11"
    // share most shingles and read as accidental near-dups)
    val W: IndexedSeq[String] = (0 until 800).map { n =>
      Integer.toString(n + 18000, 26).map { c =>
        if (c.isDigit) ('q' + (c - '0')).toChar else c }.mkString
    }
    def doc(i: Int) = (0 until 12).map(k => W(i * 12 + k)).mkString(" ")
    def dupOf(i: Int) = doc(i) + " extra"
    val history = (1 to 10).map(i => i.toLong -> doc(i))
    val batch1 = Seq(11 -> doc(11), 12 -> dupOf(3), 13 -> doc(13), 14 -> dupOf(11))
      .map { case (i, t) => i.toLong -> t }
    val batch2 = Seq(21 -> doc(21), 22 -> dupOf(13), 23 -> doc(23))
      .map { case (i, t) => i.toLong -> t }

    val s = spark
    import s.implicits._
    def toDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // seed the index with the historical corpus (the batch-built backfill)
    val (hb, hs) = CorpusOps.minhashIndexTables(toDf(history))
    hb.write.mode("overwrite").parquet(s"$idxDir/bands")
    hs.write.mode("overwrite").parquet(s"$idxDir/sets")

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = e.consumeStream("docs")
      .select(col("namespace"), payload_utf8(col("data")).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the doc id rides the namespace (/docs/<id>) — event counters are
        // per-stream, not per-corpus. localCheckpoint cuts the micro-batch
        // plan before the operator's band SELF-join re-references it (a
        // foreachBatch DF's plan cannot be safely self-joined) and caches
        // the batch for its three passes (bands, sets, index append)
        val docsB = batch.select(
            substring_index(col("namespace"), "/", -1).cast("long").as("doc_id"),
            col("text"))
          .localCheckpoint(true)
        val pairs = CorpusOps.incrementalNearDup(docsB,
            s.read.parquet(s"$idxDir/bands"), s.read.parquet(s"$idxDir/sets"))
          .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        flagged.synchronized { flagged ++= pairs }
        // accept the batch into the index: APPEND, never rebuild
        val (bb, bs) = CorpusOps.minhashIndexTables(docsB)
        bb.write.mode("append").parquet(s"$idxDir/bands")
        bs.write.mode("append").parquet(s"$idxDir/sets")
        ()
      }
      .start()
    try {
      // doc_id rides the event counter: produce in arrival order
      e.produceStrings("docs", 1, batch1.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
      e.produceStrings("docs", 1, batch2.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
    } finally q.stop()

    // batch-parity: the one-shot operator over the full corpus must agree
    // on every pair whose LATER doc was streamed
    val all = toDf(history ++ batch1 ++ batch2)
    val expected = CorpusOps.nearDupPairsMinhash(all).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter(_._2 >= 11L).toSet
    assert(expected == Set((3L, 12L), (11L, 14L), (13L, 22L)),
      s"planted dups must be what the batch operator finds: $expected")
    assert(flagged.toSet == expected,
      s"stream flagged ${flagged.toSet}, batch found $expected")
  }

  test("incremental accepted-corpus dedup over the stream equals the one-shot keep run") {
    import graft.operators.CorpusOps
    val root = tempDir("flo-incdedup-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "ingest", numPartitions = 1))

    val s = spark
    import s.implicits._
    // planted shapes: 10 is the canonical of a cross-batch dup (30, later
    // + shorter — the normal canonical-first ingestion case); 11~12 is an
    // intra-batch cluster whose keep-best is 12 (longer); 13/31 are clean
    val batch1 = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      11L -> "one two three four five six seven eight nine ten",
      12L -> "one two three four five six seven eight nine ten extra more",
      13L -> "completely unrelated words nothing shared here at all today friend")
    val batch2 = Seq(
      30L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
      31L -> "fresh independent content entirely new tokens appearing only once nowhere")
    def toDocs(df: DataFrame): DataFrame = df.select(
      substring_index(col("namespace"), "/", -1).cast("long").as("doc_id"),
      col("text"), length(col("text")).cast("long").as("n_chars"))

    // the accepted corpus accumulates across micro-batches (pinned via
    // localCheckpoint: it is read by several ppjoin subtrees every batch)
    var accepted = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "text", "n_chars").localCheckpoint(true)
    val q = e.consumeStream("ingest")
      .select(col("namespace"), payload_utf8(col("data")).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docsB = toDocs(batch).localCheckpoint(true)
        if (docsB.count() > 0) {
          val kept = CorpusOps.incrementalPpjoinKeep(docsB, accepted, pct = 50)
          accepted = accepted.unionByName(kept).localCheckpoint(true)
        }
        ()
      }
      .start()
    try {
      e.produceStrings("ingest", 1, batch1.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
      e.produceStrings("ingest", 1, batch2.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
    } finally q.stop()

    val streamed = accepted.select("doc_id").as[Long].collect().toSet
    // one-shot reference: the SAME operator over everything as one batch
    // against an empty accepted set
    val all = (batch1 ++ batch2).map { case (i, t) => (i, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val oneShot = CorpusOps.incrementalPpjoinKeep(
        all, all.limit(0), pct = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == Set(10L, 12L, 13L, 31L), s"one-shot keeps: $oneShot")
    assert(streamed == oneShot,
      s"stream accepted $streamed, one-shot kept $oneShot")
  }

  test("indexed accepted-corpus guard on the stream: persisted-index path equals the recompute form and the one-shot run") {
    import graft.operators.CorpusOps
    val root = tempDir("flo-incdedup-idx-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "ingest", numPartitions = 1))

    val s = spark
    import s.implicits._
    // same planted shapes as the recompute-form test above
    val batch1 = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      11L -> "one two three four five six seven eight nine ten",
      12L -> "one two three four five six seven eight nine ten extra more",
      13L -> "completely unrelated words nothing shared here at all today friend")
    val batch2 = Seq(
      30L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
      31L -> "fresh independent content entirely new tokens appearing only once nowhere")
    def toDocs(df: DataFrame): DataFrame = df.select(
      substring_index(col("namespace"), "/", -1).cast("long").as("doc_id"),
      col("text"), length(col("text")).cast("long").as("n_chars"))

    // the DEFAULT streaming-guard shape: the accepted corpus lives as the
    // persisted APPEND-ONLY index; each micro-batch is one
    // ppjoinIndexIngest step (probe postings + intra keep-best + append) —
    // no in-memory accepted DataFrame, no per-batch history re-aggregation.
    // An empty seed freezes the all-df-0 (lexicographic) gram order, which
    // is as consistent as any — losslessness needs consistency only.
    val idx = tempDir("flo-incdedup-idx")
    val emptyDocs = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "text", "n_chars")
    CorpusOps.ppjoinIndexInit(spark, idx, emptyDocs, pct = 50)
    val streamedIds = scala.collection.mutable.Set.empty[Long]
    val q = e.consumeStream("ingest")
      .select(col("namespace"), payload_utf8(col("data")).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docsB = toDocs(batch).localCheckpoint(true)
        if (docsB.count() > 0) {
          val kept = CorpusOps.ppjoinIndexIngest(spark, idx, docsB)
          streamedIds.synchronized {
            streamedIds ++= kept.select("doc_id").as[Long].collect() }
        }
        ()
      }
      .start()
    try {
      e.produceStrings("ingest", 1, batch1.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
      e.produceStrings("ingest", 1, batch2.map { case (i, t) => s"/docs/$i" -> t })
      q.processAllAvailable()
    } finally q.stop()

    // parity 1: the recompute form replayed over the same batches
    def toDf(rows: Seq[(Long, String)]): DataFrame =
      rows.map { case (i, t) => (i, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars").localCheckpoint(true)
    var acc = toDf(Seq.empty)
    Seq(batch1, batch2).foreach { b =>
      val kept = CorpusOps.incrementalPpjoinKeep(toDf(b), acc, pct = 50)
      acc = acc.unionByName(kept).localCheckpoint(true)
    }
    val recompute = acc.select("doc_id").as[Long].collect().toSet
    // parity 2: the one-shot run (canonical-first fixture: all three agree)
    val all = toDf(batch1 ++ batch2)
    val oneShot = CorpusOps.incrementalPpjoinKeep(all, all.limit(0), pct = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == Set(10L, 12L, 13L, 31L), s"one-shot keeps: $oneShot")
    assert(recompute == oneShot, s"recompute $recompute != one-shot $oneShot")
    assert(streamedIds.toSet == oneShot,
      s"indexed stream accepted ${streamedIds.toSet}, expected $oneShot")
    // and the persisted index holds exactly the accepted docs' sets
    val idxIds = CorpusOps.ppjoinIndexSets(spark, idx)
      .select("doc_id").as[Long].collect().toSet
    assert(idxIds == oneShot, s"index holds $idxIds")
  }

  test("incremental dedup divergence modes are exactly the documented ones") {
    import graft.operators.CorpusOps
    val s = spark
    import s.implicits._
    def docs(rows: Seq[(Long, String)]): DataFrame =
      rows.map { case (i, t) => (i, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars").localCheckpoint(true)
    def keepIds(batch: DataFrame, acc: DataFrame): Set[Long] =
      CorpusOps.incrementalPpjoinKeep(batch, acc, pct = 50)
        .select("doc_id").as[Long].collect().toSet

    // mode 1: a LATER-arriving better duplicate is dropped (the accepted
    // set is immutable) while the one-shot keep-best prefers it
    val early = docs(Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val later = docs(Seq(
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa richer longer"))
    val acceptedAfterEarly = early
    assert(keepIds(later, acceptedAfterEarly).isEmpty,
      "immutable accepted set must drop the later better duplicate")
    val oneShot1 = keepIds(docs(Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa richer longer")),
      early.limit(0))
    assert(oneShot1 == Set(2L), s"one-shot keep-best prefers the longer: $oneShot1")

    // mode 2: a chain A~B~C with B dropped intra-batch leaves a later C
    // accepted (drops never join the guard set) where the one-shot run's
    // component spans the chain. B = base (10 trigrams); A edits the last
    // TWO words (kills 2 trigrams: A~B = 8/12 = 0.67, and A is longer so
    // keep-best keeps it); C edits the first two (C~B = 0.67); A and C
    // share only the 6 middle trigrams: 6/14 = 0.43 < 0.5.
    val base = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val a = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 e11 edited-much-longer"
    val c = "q1 q2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val b1 = docs(Seq(1L -> a, 2L -> base))
    val kept1 = keepIds(b1, b1.limit(0))
    assert(kept1 == Set(1L), s"batch 1 keep-best: $kept1")
    val acc = b1.filter(col("doc_id") === 1L)
    assert(keepIds(docs(Seq(3L -> c)), acc) == Set(3L),
      "C resembles only the dropped B — the incremental guard admits it")
    val oneShot2 = keepIds(docs(Seq(1L -> a, 2L -> base, 3L -> c)), b1.limit(0))
    assert(oneShot2 == Set(1L),
      s"the one-shot component spans the chain and keeps only A: $oneShot2")
  }
}
