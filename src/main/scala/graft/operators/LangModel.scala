package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-gram language-model scoring for quality filtering — the CCNet /
 * Wikipedia-LM recipe (Wenzek et al., "CCNet: Extracting High Quality
 * Monolingual Datasets from Web Crawl Data", 2019): train a smoothed
 * n-gram LM on the corpus, score every document by its average negative
 * log-likelihood, and filter/bucket on the score (high NLL ≈ far from the
 * corpus distribution ≈ boilerplate, gibberish, or rare-domain text).
 *
 * Model: bigram with add-one smoothing,
 *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
 * trained on the SAME corpus being scored (self-perplexity — the common
 * first pass; scoring against a reference corpus is the same plan with the
 * counts built from the other table).
 *
 * Determinism: per-bigram NLL is fixed-pointed to 1e4 (`round(-ln(p)*1e4)`
 * as a LONG) before the per-doc aggregation, so the sum is an exact
 * integer — immune to float summation order across partitions — and the
 * only float sensitivity left is a last-ulp `ln` disagreement landing
 * within 1e-11 relative of a rounding boundary. The final score divides
 * two exact integers.
 *
 * Scale shape (100 TB): bigram extraction is shuffle-free (array slice +
 * zip inside the row); model counts are two hash aggregates keyed on
 * (w1, w2) / w1 — bounded by observed vocabulary, not corpus size; scoring
 * joins doc bigrams to the counts with plain shuffle hash joins (the count
 * tables can exceed broadcast size on a web corpus) and re-aggregates on
 * doc_id. No collects, no windows, no per-group buffers.
 */
object LangModel {

  /** Bigram rows (doc_id, w1, w2) with multiplicity — built from the word
    * array in-row (slice + zip), no positional shuffle or window. */
  private[graft] def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))

  /**
   * Per-document bigram NLL under the corpus's own add-one-smoothed bigram
   * LM. Output: (doc_id, n_bigrams, nll) where nll is the mean per-bigram
   * negative log-likelihood (natural log), fixed-pointed at 1e-4 per
   * bigram and rounded to 6 decimals. Documents with < 2 words are absent.
   */
  def bigramNll(docs: DataFrame): DataFrame = {
    val (c12, c1, vocab) = trainCounts(docs)
    scoreWith(docs, c12, c1, vocab)
  }

  /** The distinct-word table (one `w` column) — the vocabulary SET, which
    * [[mergeModels]] needs (V of a union is NOT the sum of the parts'
    * sizes; it is the size of the distinct union). */
  private[graft] def vocabWords(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), " +")).as("w")).distinct()

  /** The model's three count tables: c(w1 w2), c(w1 ·), and the 1-row
    * vocabulary size V over ALL word occurrences. */
  private[graft] def trainCounts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val bg = bigrams(docs)
    (bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")),
      bg.groupBy("w1").agg(count(lit(1)).as("c1")),
      vocabWords(docs).agg(count(lit(1)).as("v")))
  }

  /**
   * Score `docs` against a (possibly frozen) model. LEFT joins + coalesce
   * handle bigrams/heads the model never saw — P = (0+1)/(0+V) in the
   * worst case — so scoring NEW documents against a reference model is
   * well-defined (self-scoring never misses, making this the exact same
   * answer as training on the fly).
   *
   * Skew: bigram keys are Zipfian — "of the" alone can be a hot shuffle
   * partition at web scale. The count lookup is therefore HYBRID: the
   * top-`headK` rows of c12/c1 (the stop-bigram head — few and tiny) ride
   * a broadcast hash join, and only the long tail shuffles, so no single
   * reducer owns a stop-word's traffic. The split is invisible in the
   * output (both paths compute the same coalesced count; which keys land
   * in the head never changes a value — the exact-integer NLL makes that
   * assertable bit-for-bit). `headK = 0` forces the pure shuffle plan.
   */
  def scoreWith(
      docs: DataFrame, c12: DataFrame, c1: DataFrame, vocab: DataFrame,
      headK: Int = 4096): DataFrame =
    // exact-integer fixed point: double division and ln are deterministic
    // given identical long inputs; the long sum is order-independent
    aggregateNll(scoredBigramCounts(docs, c12, c1, vocab, headK)
      .withColumn("nll_fp", bigramNllFp))

  /** The counts-level scoring rows (doc_id, c12n, c1n, v) — everything
    * BEFORE the log: the hybrid head-broadcast/tail-shuffle count lookup
    * with unseen keys coalesced to 0. Shared by the inline scorer and the
    * exported-log-table path so the two can never drift. */
  private def scoredBigramCounts(
      docs: DataFrame, c12: DataFrame, c1: DataFrame, vocab: DataFrame,
      headK: Int): DataFrame = {
    val bg = bigrams(docs)
    // the head ordering MUST be total (count desc, then the key columns):
    // the head is evaluated twice (inner-join broadcast + anti-join
    // broadcast), and with a count-only ordering a tie at the headK
    // boundary could resolve differently between the two evaluations —
    // a row matching evaluation-1's head but not evaluation-2's would be
    // scored twice (and its mirror dropped), silently corrupting the NLL
    def hybrid(rows: DataFrame, counts: DataFrame, keys: Seq[String],
        ord: Seq[Column]): DataFrame =
      if (headK <= 0) rows.join(counts, keys, "left")
      else {
        val head = counts.orderBy(ord: _*).limit(headK)
        rows.join(broadcast(head), keys, "inner").unionByName(
          rows.join(broadcast(head.select(keys.map(col): _*)), keys, "left_anti")
            .join(counts, keys, "left"),
          allowMissingColumns = true)
      }
    val with12 = hybrid(bg, c12, Seq("w1", "w2"),
      Seq(col("c12").desc, col("w1"), col("w2")))
    val with1 = hybrid(with12, c1, Seq("w1"),
      Seq(col("c1").desc, col("w1")))
    with1
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        coalesce(col("c12"), lit(0L)).as("c12n"),
        coalesce(col("c1"), lit(0L)).as("c1n"), col("v"))
  }

  /** `round(-ln((c12n+1)/(c1n+V))·1e4)` — ONE canonical expression shape
    * shared by the inline scorer and the exported log table, so the two
    * paths are bit-identical by construction. */
  private def bigramNllFp: Column =
    round(-log((col("c12n") + lit(1).cast("double")) /
      (col("c1n") + col("v").cast("double"))) * 1e4).cast("long")

  private def aggregateNll(scored: DataFrame): DataFrame =
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_fp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s") / col("n_bigrams") / 1e4, 6).as("nll"))

  /**
   * [[scoreWith]] through an EXPORTED fixed-point log table — the
   * determinism-rule path for oracle-checked queries: `ln` runs ONCE, in
   * this engine, over the distinct integer (c12n, c1n, v) triples; the
   * resulting `nll_fp` LONGs export to `fixturePath`, and scoring (here
   * AND in the DuckDB oracle) is a pure integer join + sum over identical
   * bits. A count disagreement between engines surfaces as a missed join
   * (row mismatch), and V rides in the key so even the vocabulary size is
   * cross-checked. The log table is bounded by the number of DISTINCT
   * observed (c12, c1) count pairs — far below the bigram-type count
   * (counts are Zipf-clustered), broadcastable at any corpus scale.
   * Output is bit-identical to [[scoreWith]] (same expression shape on
   * the same inputs, values round-tripped through parquet LONGs).
   */
  def scoreWithLogTable(
      docs: DataFrame, c12: DataFrame, c1: DataFrame, vocab: DataFrame,
      fixturePath: String, headK: Int = 4096): DataFrame = {
    // the count tables feed BOTH the key job and the scoring job —
    // materialize them once (they are vocab-bounded) so the corpus pays
    // each counting aggregation exactly once across the two jobs
    val (c12m, c1m, vocabM) = (c12.localCheckpoint(true),
      c1.localCheckpoint(true), vocab.localCheckpoint(true))
    // key enumeration from the MODEL tables, not the scoring rows — the
    // corpus is scored exactly once. COMPLETE for any document set: a
    // scoring row is (c12>0, c1 of the same head) [the c12⋈c1 pairs],
    // (0, c1) [unseen bigram, seen head], or (0, 0) [unseen head].
    val keys = c12m.join(c1m, "w1").select(col("c12"), col("c1"))
      .unionByName(c1m.select(lit(0L).as("c12"), col("c1")))
      .unionByName(c1m.sparkSession.range(1)
        .select(lit(0L).as("c12"), lit(0L).as("c1")))
      .distinct()
      .crossJoin(broadcast(vocabM))
      .select(col("c12").as("c12n"), col("c1").as("c1n"), col("v"))
    keys.withColumn("nll_fp", bigramNllFp)
      .write.mode("overwrite").parquet(fixturePath)
    val logTable = docs.sparkSession.read.parquet(fixturePath)
    aggregateNll(scoredBigramCounts(docs, c12m, c1m, vocabM, headK)
      .join(broadcast(logTable), Seq("c12n", "c1n", "v")))
  }

  /**
   * Persist the model (build once, score many — the same amortization
   * split as [[AnnIndex]]): `c12/`, `c1/` parquet plus a 1-row `meta/`
   * written LAST as the commit marker, so a crashed build is invisible to
   * [[scoreAgainst]].
   */
  def writeModel(docs: DataFrame, path: String): Unit = {
    val bg = bigrams(docs)
    bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .write.mode("overwrite").parquet(s"$path/c12")
    bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      .write.mode("overwrite").parquet(s"$path/c1")
    // the vocabulary SET rides along (vocab-bounded): counts alone can't
    // merge models exactly — V(A ∪ B) is the distinct union's size, not
    // V(A) + V(B). meta (= V) derives from the WRITTEN vocab parquet
    // (the mergeModels pattern) so the corpus-wide distinct runs ONCE,
    // not once for the table and again for the count
    vocabWords(docs).write.mode("overwrite").parquet(s"$path/vocab")
    docs.sparkSession.read.parquet(s"$path/vocab")
      .agg(count(lit(1)).as("v"))
      .withColumn("format_version", lit(FormatVersion))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Persisted-model format version, stamped into `meta/` and REQUIRED to
    * match on every read — the [[AnnIndex]] versioned-path contract
    * applied to the model dirs: a layout change bumps this, so a reader
    * fails descriptively instead of scoring silently against stale bits.
    * v2 = version-stamped meta (v1 dirs predate the stamp and are
    * rejected with a retrain instruction). */
  private[graft] val FormatVersion = 2L

  /** Read + validate `meta/`: format stamp present and current. Returns
    * the 1-row (v) table the scorers consume. */
  private def validatedMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.columns.contains("format_version"),
      s"LM model at $path has no format_version stamp (pre-v$FormatVersion " +
        "layout) — retrain with writeModel (or rebuild via mergeModels)")
    val ver = meta.select("format_version").head().getLong(0)
    require(ver == FormatVersion,
      s"LM model at $path is format v$ver but this build reads " +
        s"v$FormatVersion — retrain before scoring")
    meta.select("v")
  }

  /**
   * Merge two persisted models into a third — incremental retrain without
   * touching the original corpora. Count tables sum on their keys; the
   * vocabulary is the distinct union; `meta/` (= V) is derived from the
   * merged vocabulary and written LAST as the commit marker. Because every
   * table is exact integers, `merge(train(A), train(B))` scores
   * BIT-IDENTICALLY to `train(A ∪ B)` for disjoint corpora — the spec
   * asserts that equality, not an approximation.
   */
  def mergeModels(
      spark: org.apache.spark.sql.SparkSession,
      a: String, b: String, out: String): Unit = {
    require(out != a && out != b, "merge output must be a fresh path")
    val c12 = spark.read.parquet(s"$a/c12")
      .unionByName(spark.read.parquet(s"$b/c12"))
      .groupBy("w1", "w2").agg(sum(col("c12")).as("c12"))
    val c1 = spark.read.parquet(s"$a/c1")
      .unionByName(spark.read.parquet(s"$b/c1"))
      .groupBy("w1").agg(sum(col("c1")).as("c1"))
    val vocab = spark.read.parquet(s"$a/vocab")
      .unionByName(spark.read.parquet(s"$b/vocab")).distinct()
    c12.write.mode("overwrite").parquet(s"$out/c12")
    c1.write.mode("overwrite").parquet(s"$out/c1")
    vocab.write.mode("overwrite").parquet(s"$out/vocab")
    spark.read.parquet(s"$out/vocab").agg(count(lit(1)).as("v"))
      .withColumn("format_version", lit(FormatVersion))
      .write.mode("overwrite").parquet(s"$out/meta")
  }

  /** Trigram rows (doc_id, w1, w2, w3) with multiplicity — the in-row
    * slice/zip construction of [[bigrams]], one position wider. */
  private[graft] def trigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 2),
          slice(col("w"), lit(2), size(col("w")) - 2),
          slice(col("w"), lit(3), size(col("w")) - 2))).as("tg"))
      .select(col("doc_id"), col("tg.0").as("w1"), col("tg.1").as("w2"),
        col("tg.2").as("w3"))

  /**
   * Stupid Backoff trigram scoring (Brants et al., "Large Language Models
   * in Machine Translation", EMNLP 2007) — the web-scale LM recipe:
   * relative frequencies with a fixed backoff factor instead of a
   * normalized smooth, because at corpus scale the counts ARE the model
   * and normalization is the part that doesn't distribute.
   *
   *   S(w3 | w1 w2) = c123/c12                     when the trigram is in the model
   *                 = α · c23/c2                   else, when the bigram is
   *                 = α² · (c3+1)/(N+V)            else (add-one unigram floor,
   *                                                  so unseen words score finitely)
   *
   * The model is the TRAINING corpus's count tables; scoring any corpus
   * against them backs off precisely where the model has no evidence.
   * Output: (doc_id, n_trigrams, tri_hits, bi_hits, uni_hits, nll) —
   * the hit tiers are exact integers (strong oracle evidence on their
   * own) and nll is the [[bigramNll]] fixed-point mean (per-position
   * round(-ln(S)·1e4) LONGs, order-independent sums).
   *
   * Scale shape: counts are vocabulary-bounded hash aggregates; scoring
   * is three left shuffle hash joins on the n-gram keys (the same
   * Zipf-skew caveat as [[scoreWith]] — AQE splits the hot keys) plus a
   * broadcast 1-row (N, V); the doc re-aggregation sums exact LONGs.
   */
  def stupidBackoffNll(
      docs: DataFrame, model: DataFrame, alpha: Double = 0.4): DataFrame =
    aggregateBackoff(backoffScored(docs, model)
      .withColumn("nll_fp", backoffNllFp(alpha)))

  /** The ladder rows at COUNTS level: (doc_id, tier, num, den) — tier 0 =
    * trigram hit (c123/c12), 1 = bigram backoff (c23/c2), 2 = add-one
    * unigram floor ((c3+1)/(N+V)). Everything before the log; shared by
    * the inline scorer and the exported-log-table path. */
  private def backoffScored(docs: DataFrame, model: DataFrame): DataFrame =
    backoffParts(docs, model)._1

  /** (scored ladder rows, complete (tier, num, den) key table). The key
    * table enumerates from the MODEL count tables — tier 0 from the
    * co-occurring c123⋈c12 pairs, tier 1 from c23⋈c2, tier 2 from the
    * distinct unigram counts (+0 for unseen) against the constant N+V —
    * so deriving it never re-scores the corpus. */
  private def backoffParts(
      docs: DataFrame, model: DataFrame,
      materializeModel: Boolean = false): (DataFrame, DataFrame) = {
    // the log-table path reads every count table TWICE (key job + scoring
    // job): materialize the vocab-bounded tables once there; the inline
    // path keeps its single-job lineage
    def m(df: DataFrame): DataFrame =
      if (materializeModel) df.localCheckpoint(true) else df
    val tg = trigrams(model)
    val c123 = m(tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123")))
    val c12t = m(tg.groupBy("w1", "w2").agg(count(lit(1)).as("c12t")))
    val bg = bigrams(model)
    val c23 = m(bg.select(col("w1").as("w2"), col("w2").as("w3"))
      .groupBy("w2", "w3").agg(count(lit(1)).as("c23")))
    val uni = model.select(explode(split(trim(col("text")), " +")).as("w"))
    val c2 = m(uni.groupBy(col("w").as("w2")).agg(count(lit(1)).as("c2")))
    val c3 = m(uni.groupBy(col("w").as("w3")).agg(count(lit(1)).as("c3")))
    val nv = m(uni.agg(count(lit(1)).as("n"))
      .crossJoin(vocabWords(model).agg(count(lit(1)).as("v"))))
    val keys = c123.join(c12t, Seq("w1", "w2"))
        .select(lit(0).as("tier"), col("c123").as("num"), col("c12t").as("den"))
      .unionByName(c23.join(c2, Seq("w2"))
        .select(lit(1).as("tier"), col("c23").as("num"), col("c2").as("den")))
      .unionByName(c3.select(col("c3"))
        .unionByName(model.sparkSession.range(1).select(lit(0L).as("c3")))
        .distinct()
        .crossJoin(broadcast(nv))
        .select(lit(2).as("tier"), (col("c3") + lit(1)).as("num"),
          (col("n") + col("v")).as("den")))
      .distinct()
    val scored = trigrams(docs)
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12t, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(c2, Seq("w2"), "left")
      .join(c3, Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("tier",
        when(col("c123").isNotNull, lit(0))
          .when(col("c23").isNotNull, lit(1)).otherwise(lit(2)))
      .select(col("doc_id"), col("tier"),
        when(col("tier") === 0, col("c123"))
          .when(col("tier") === 1, col("c23"))
          .otherwise(coalesce(col("c3"), lit(0L)) + lit(1)).as("num"),
        when(col("tier") === 0, col("c12t"))
          .when(col("tier") === 1, col("c2"))
          .otherwise(col("n") + col("v")).as("den"))
    (scored, keys)
  }

  /** `round(-ln(S)·1e4)` from (tier, num, den) — the double expression
    * shape mirrors the DuckDB oracle exactly: each branch is one division
    * (and a literal multiply), no re-association an engine could do
    * differently. ONE canonical shape for the inline scorer and the
    * exported log table. */
  private def backoffNllFp(alpha: Double): Column =
    round(-log(
      when(col("tier") === 0, col("num").cast("double") / col("den"))
        .when(col("tier") === 1,
          lit(alpha) * (col("num").cast("double") / col("den")))
        .otherwise(lit(alpha * alpha) *
          (col("num").cast("double") / col("den")))) * 1e4).cast("long")

  private def aggregateBackoff(scored: DataFrame): DataFrame =
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("tier") === 0, 1L).otherwise(0L)).as("tri_hits"),
        sum(when(col("tier") === 1, 1L).otherwise(0L)).as("bi_hits"),
        sum(when(col("tier") === 2, 1L).otherwise(0L)).as("uni_hits"),
        sum(col("nll_fp")).as("s"))
      .select(col("doc_id"), col("n_trigrams"), col("tri_hits"),
        col("bi_hits"), col("uni_hits"),
        round(col("s") / col("n_trigrams") / 1e4, 6).as("nll"))

  /**
   * [[stupidBackoffNll]] through an EXPORTED fixed-point log table (the
   * same determinism-rule path as [[scoreWithLogTable]]): `ln` runs once
   * here over the distinct integer (tier, num, den) triples, the LONG
   * `nll_fp` table exports to `fixturePath`, and scoring in BOTH engines
   * is an integer join + sum over identical bits. The full backoff ladder
   * (tier choice, counts, N+V) is still recomputed independently by the
   * oracle — a ladder disagreement misses the join and surfaces as a row
   * mismatch. Output bit-identical to [[stupidBackoffNll]].
   */
  def stupidBackoffNllLogTable(
      docs: DataFrame, model: DataFrame, fixturePath: String,
      alpha: Double = 0.4): DataFrame = {
    val (sc, keys) = backoffParts(docs, model, materializeModel = true)
    keys.withColumn("nll_fp", backoffNllFp(alpha))
      .write.mode("overwrite").parquet(fixturePath)
    val logTable = docs.sparkSession.read.parquet(fixturePath)
    aggregateBackoff(sc.join(broadcast(logTable), Seq("tier", "num", "den")))
  }

  def modelExists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean =
    try { spark.read.parquet(s"$path/meta").head(); true }
    // NonFatal only: an OOM or interrupt must surface, not masquerade as
    // "model absent" and trigger a spurious retrain
    catch { case scala.util.control.NonFatal(_) => false }

  /** Score documents against the persisted model at `path` — the frozen
    * reference-LM shape (and the streaming stream-static join side). */
  def scoreAgainst(docs: DataFrame, path: String): DataFrame = {
    val s = docs.sparkSession
    scoreWith(docs,
      s.read.parquet(s"$path/c12"), s.read.parquet(s"$path/c1"),
      validatedMeta(s, path))
  }

  /** [[scoreAgainst]] through [[scoreWithLogTable]] — the persisted-model
    * scoring path of the determinism-rule protocol. */
  def scoreAgainstLogTable(
      docs: DataFrame, path: String, fixturePath: String): DataFrame = {
    val s = docs.sparkSession
    scoreWithLogTable(docs,
      s.read.parquet(s"$path/c12"), s.read.parquet(s"$path/c1"),
      validatedMeta(s, path), fixturePath)
  }

  /** [[bigramNll]] through [[scoreWithLogTable]] — train-and-score with
    * the log table exported for the oracle. */
  def bigramNllLogTable(docs: DataFrame, fixturePath: String): DataFrame = {
    val (c12, c1, vocab) = trainCounts(docs)
    scoreWithLogTable(docs, c12, c1, vocab, fixturePath)
  }
}
