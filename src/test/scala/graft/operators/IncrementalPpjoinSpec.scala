package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Indexed incremental accepted-corpus dedup
 * ([[CorpusOps.incrementalPpjoinKeepIndexed]]): the frozen gram order
 * must lose nothing (PPJoin's prefix theorem needs consistency, not
 * rarest-first optimality), the persisted index must be APPEND-ONLY
 * (replayed per-batch deltas concatenate to exactly the one-shot index),
 * and verdicts must equal the recompute-everything form
 * ([[CorpusOps.incrementalPpjoinKeep]]) batch for batch.
 */
class IncrementalPpjoinSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (i, t) => (i, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars").localCheckpoint(true)

  // seed corpus (defines the frozen order), then two ingestion batches:
  // 30 = cross-batch dup of 10 (lower score — dropped by the guard);
  // 40/41 = an intra-batch cluster of UNSEEN-gram docs (df-0 order leg);
  // 50 = dup of 31 across batches (guards must work for docs ACCEPTED
  // after the freeze, not just seed docs)
  private val seed = Seq(
    10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    11L -> "one two three four five six seven eight nine ten",
    13L -> "completely unrelated words nothing shared here at all today friend")
  private val b1 = Seq(
    30L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
    31L -> "fresh independent content entirely new tokens appearing only once nowhere")
  private val b2 = Seq(
    40L -> "qq ww ee rr tt yy uu ii oo pp aa ss",
    41L -> "qq ww ee rr tt yy uu ii oo pp aa ss dd ff",
    50L -> "fresh independent content entirely new tokens appearing only once")

  test("indexed replay == one-shot indexed == recompute form, and the index is append-only") {
    val orderT = CorpusOps.ppjoinFrozenOrder(docs(seed)).localCheckpoint(true)
    val empty = docs(Seq.empty)
    val (e1, e2) = CorpusOps.ppjoinIndexTables(empty, orderT)

    // replay: seed, then b1, then b2 — accumulating accepted + index
    var accepted = empty
    var pre = e1.localCheckpoint(true)
    var sets = e2.localCheckpoint(true)
    Seq(seed, b1, b2).foreach { batch =>
      val (kept, kp, ks) = CorpusOps.incrementalPpjoinKeepIndexed(
        docs(batch), pre, sets, orderT, pct = 50)
      accepted = accepted.unionByName(kept).localCheckpoint(true)
      pre = pre.unionByName(kp).localCheckpoint(true)
      sets = sets.unionByName(ks).localCheckpoint(true)
    }
    val replayKeeps = accepted.select("doc_id").as[Long].collect().toSet

    // one-shot: everything as ONE batch against the empty index
    val all = docs(seed ++ b1 ++ b2)
    val (oneShot, _, _) = CorpusOps.incrementalPpjoinKeepIndexed(
      all, e1, e2, orderT, pct = 50)
    val oneShotKeeps = oneShot.select("doc_id").as[Long].collect().toSet

    // the recompute-everything form, replayed with the same batches
    var acc2 = empty
    Seq(seed, b1, b2).foreach { batch =>
      val kept = CorpusOps.incrementalPpjoinKeep(docs(batch), acc2, pct = 50)
      acc2 = acc2.unionByName(kept).localCheckpoint(true)
    }
    val recomputeKeeps = acc2.select("doc_id").as[Long].collect().toSet

    // planted expectations: 30 dropped (dup of accepted 10), 50 dropped
    // (dup of accepted-after-freeze 31), 40 dropped intra (41 longer),
    // 11 kept (no dup)
    val expected = Set(10L, 11L, 13L, 31L, 41L)
    assert(replayKeeps == expected, s"replay keeps $replayKeeps")
    assert(recomputeKeeps == expected, s"recompute keeps $recomputeKeeps")
    // NOTE: the one-shot single-batch run sees 10~30 / 31~50 / 40~41 as
    // INTRA clusters (keep-best, not first-wins) — on this fixture the
    // keep-best winners coincide with the first-arrivals by construction
    assert(oneShotKeeps == expected, s"one-shot keeps $oneShotKeeps")

    // append-only invariant: accumulated per-batch deltas == the index
    // built one-shot from the FINAL accepted set under the same order
    val (fullPre, fullSets) = CorpusOps.ppjoinIndexTables(accepted, orderT)
    def rows(df: DataFrame, cols: String*) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(pre, "gram", "doc_id", "i", "sz") ==
      rows(fullPre, "gram", "doc_id", "i", "sz"),
      "accumulated prefix index must equal the one-shot index")
    assert(rows(sets, "doc_id", "grams") == rows(fullSets, "doc_id", "grams"),
      "accumulated set index must equal the one-shot index")
  }

  test("persisted index: init+ingest replay equals the in-memory replay; pct rides the meta") {
    // pct = 60, deliberately NOT the default: the persisted form must run
    // under the pct stamped at init (a caller passing a different pct was
    // the silent-false-negative hazard — the path API takes none)
    val idx = tempDir("ppjoin-idx")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 60)
    assert(CorpusOps.ppjoinIndexExists(spark, idx))
    assert(CorpusOps.ppjoinIndexMeta(spark, idx) ==
      ((60, CorpusOps.PpjoinIndexFormatVersion)))
    var persisted = Set.empty[Long]
    Seq(seed, b1, b2).foreach { batch =>
      persisted ++= CorpusOps.ppjoinIndexIngest(spark, idx, docs(batch))
        .select("doc_id").as[Long].collect()
    }
    // reference: the in-memory kernel replay under the same order and pct
    val orderT = CorpusOps.ppjoinFrozenOrder(docs(seed)).localCheckpoint(true)
    val empty = docs(Seq.empty)
    var (pre, sets) = CorpusOps.ppjoinIndexTables(empty, orderT, pct = 60)
    var kernel = Set.empty[Long]
    Seq(seed, b1, b2).foreach { batch =>
      val (kept, kp, ks) = CorpusOps.incrementalPpjoinKeepIndexed(
        docs(batch), pre, sets, orderT, pct = 60)
      kernel ++= kept.select("doc_id").as[Long].collect()
      pre = pre.unionByName(kp).localCheckpoint(true)
      sets = sets.unionByName(ks).localCheckpoint(true)
    }
    assert(persisted == kernel,
      s"persisted-path keeps $persisted != kernel keeps $kernel")
    // the on-disk index equals the accumulated in-memory one
    def rows(df: DataFrame, cols: String*) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(CorpusOps.ppjoinIndexPrefixes(spark, idx),
        "gram", "doc_id", "i", "sz") == rows(pre, "gram", "doc_id", "i", "sz"))
    assert(rows(CorpusOps.ppjoinIndexSets(spark, idx), "doc_id", "grams") ==
      rows(sets, "doc_id", "grams"))
  }

  test("persisted index meta gates: missing and version-drifted layouts fail descriptively") {
    val missing = intercept[IllegalStateException] {
      CorpusOps.ppjoinIndexIngest(spark, tempDir("ppjoin-noidx"), docs(b1))
    }
    assert(missing.getMessage.contains("ppjoinIndexInit"), missing.getMessage)

    val idx = tempDir("ppjoin-idx-drift")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 50)
    // simulate a format bump: rewrite meta with a stale version
    spark.read.parquet(s"$idx/meta").withColumn("format_version", lit(0L))
      .write.mode("overwrite").parquet(s"$idx/meta2")
    spark.read.parquet(s"$idx/meta2")
      .write.mode("overwrite").parquet(s"$idx/meta")
    val drift = intercept[IllegalArgumentException] {
      CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
    }
    assert(drift.getMessage.contains("format v0"), drift.getMessage)
  }

  test("persisted index: a torn batch (tables without a commit marker) is invisible, swept, and costs no recall") {
    val idx = tempDir("ppjoin-torn")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 50)
    CorpusOps.ppjoinIndexIngest(spark, idx, docs(seed)) // batch 1: all kept
    // simulate v1's fatal crash state: one table of a batch written, no
    // commit marker — under v1 later probes silently lost candidates here
    val orderT = spark.read.parquet(s"$idx/order")
    val (tornPre, _) = CorpusOps.ppjoinIndexTables(docs(b1), orderT, pct = 50)
    tornPre.write.mode("overwrite").parquet(s"$idx/batches/b00000002/prefixes")
    // readers never union the uncommitted dir
    assert(CorpusOps.ppjoinIndexPrefixes(spark, idx)
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 13L))
    // the next ingest sweeps the torn dir and STILL detects the
    // cross-batch dup (30 duplicates accepted 10)
    val kept = CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(31L), s"30 must drop as a dup of accepted 10: $kept")
    assert(CorpusOps.ppjoinIndexSets(spark, idx)
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 13L, 31L))
  }

  test("persisted index: ingest holds the exclusive mutation marker; stale markers are taken over") {
    val idx = tempDir("ppjoin-guard")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 50)
    val marker = java.nio.file.Paths.get(s"$idx/_mutating")
    // a live concurrent ingest: fail descriptively instead of racing the
    // read-then-append cycle (mutual duplicate admission)
    java.nio.file.Files.write(marker, "ingest".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
    }
    assert(err.getMessage.contains("being mutated"), err.getMessage)
    assert(CorpusOps.ppjoinIndexSets(spark, idx).count() == 0,
      "the refused ingest must not have touched the index")
    // a stale marker is a crashed ingest: taken over, step completes,
    // marker released
    java.nio.file.Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()
        - 10 * CorpusOps.PpjoinIndexGuardTtlMillis))
    val kept1 = CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(30L, 31L), s"empty index accepts the whole batch: $kept1")
    assert(!java.nio.file.Files.exists(marker),
      "a completed ingest must release the marker")
    // and the next step probes the now-committed batch (50 dups 31,
    // 40/41 intra-cluster keeps the higher-score 41)
    val kept2 = CorpusOps.ppjoinIndexIngest(spark, idx, docs(b2))
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(41L), s"expected only 41 kept: $kept2")
  }

  test("persisted index: compaction folds committed batches into one with identical tables and probe results") {
    val idx = tempDir("ppjoin-compact")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 50)
    CorpusOps.ppjoinIndexIngest(spark, idx, docs(seed))
    CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
    def rows(df: DataFrame, cols: String*) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val preBefore = rows(CorpusOps.ppjoinIndexPrefixes(spark, idx),
      "gram", "doc_id", "i", "sz")
    val setsBefore = rows(CorpusOps.ppjoinIndexSets(spark, idx),
      "doc_id", "grams")
    def batchDirs() = new java.io.File(s"$idx/batches").listFiles()
      .filter(_.getName.startsWith("b")).map(_.getName).toSet
    assert(batchDirs().size == 3, s"init + 2 ingests: ${batchDirs()}")

    assert(CorpusOps.ppjoinIndexCompact(spark, idx) == 3)
    assert(rows(CorpusOps.ppjoinIndexPrefixes(spark, idx),
      "gram", "doc_id", "i", "sz") == preBefore)
    assert(rows(CorpusOps.ppjoinIndexSets(spark, idx),
      "doc_id", "grams") == setsBefore)
    assert(batchDirs().size == 1,
      s"superseded batch dirs must be swept: ${batchDirs()}")
    assert(CorpusOps.ppjoinIndexCompact(spark, idx) == 0,
      "a single-batch index has nothing to fold")
    // the folded index still probes identically: 50 dups accepted 31,
    // 40/41 keep-best keeps 41 — the same verdicts as the uncompacted
    // replay leg above
    val kept = CorpusOps.ppjoinIndexIngest(spark, idx, docs(b2))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(41L), s"expected only 41 kept after compaction: $kept")
  }

  test("persisted index: a mutator usurped mid-ingest aborts before its commit marker lands") {
    val idx = tempDir("ppjoin-usurp")
    CorpusOps.ppjoinIndexInit(spark, idx, docs(seed), pct = 50)
    CorpusOps.ppjoinIndexIngest(spark, idx, docs(seed))
    val before = CorpusOps.ppjoinIndexSets(spark, idx)
      .select("doc_id").as[Long].collect().toSet
    val markerPath = s"$idx/_mutating"
    // the batch plan usurps the guard marker when first evaluated —
    // simulating a takeover landing while this ingest computes its step
    val usurp = udf { (id: Long) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(markerPath),
        "usurper ingest".getBytes("UTF-8"))
      id >= 0
    }
    val err = intercept[IllegalStateException] {
      CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1).filter(usurp(col("doc_id"))))
    }
    assert(err.getMessage.contains("no longer owned"), err.getMessage)
    // usurper's marker intact; no batch committed; only a torn dir that
    // the next mutation sweeps
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(markerPath)), "UTF-8").startsWith("usurper"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(markerPath))
    assert(CorpusOps.ppjoinIndexSets(spark, idx)
      .select("doc_id").as[Long].collect().toSet == before,
      "the aborted ingest must not have committed anything")
    val kept = CorpusOps.ppjoinIndexIngest(spark, idx, docs(b1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(31L), s"recovery ingest verdicts unchanged: $kept")
  }

  test("frozen order is lossless: indexed cross verdicts equal the brute cross join") {
    val orderT = CorpusOps.ppjoinFrozenOrder(docs(seed)).localCheckpoint(true)
    // accepted = seed + b1 (as indexed), probe = b2 (all-unseen grams in
    // 40/41 exercise the df-0 leg)
    val acceptedDocs = docs(seed ++ b1)
    val (aPre, aSets) = CorpusOps.ppjoinIndexTables(acceptedDocs, orderT)
    val probe = docs(b2)
    val (bPre, bSets) = CorpusOps.ppjoinIndexTables(probe, orderT)
    val cand = CorpusOps.ppjoinCandidates(
      bPre, aPre, 50, "left_id", "right_id", selfJoin = false)
    val got = CorpusOps.ppjoinVerify(cand, bSets, aSets, "left_id", "right_id", 50)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // brute: exact trigram jaccard over the cross product
    val t = (d: DataFrame) => d.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim
        .split(" +").sliding(3).map(_.mkString(" ")).toSet).toMap
    val pm = t(probe); val am = t(acceptedDocs)
    val brute = (for {
      (pid, ps) <- pm.toSeq; (aid, as0) <- am.toSeq
      common = (ps & as0).size; union = ps.size + as0.size - common
      if union > 0 && common * 100 >= union * 50
    } yield (pid, aid)).toSet
    assert(got == brute, s"indexed $got != brute $brute")
    assert(brute.nonEmpty, "fixture must plant at least one cross dup")
  }
}
