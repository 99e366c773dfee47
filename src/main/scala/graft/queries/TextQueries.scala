package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables

/**
 * Text-analysis operators for the training-data pipeline: quality scoring,
 * n-gram-heuristic language ID, BPE-ish token counting, and content
 * fingerprinting — all as codegen'd column expressions (no UDFs), all
 * DuckDB-oracle-checked.
 *
 * Ratio discipline: ratios are floored at fixed precision
 * (`floor(10000 * a / b) / 10000`) instead of round() — Spark rounds
 * HALF_UP, DuckDB half-away-from-zero on doubles, and floor sidesteps the
 * half-way cases entirely (both engines do the same IEEE double division).
 */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Weight-fixture export for `text_quality_model` (SemDeDup protocol:
    * fixed literal — the oracle SQL is static and runs outside the JVM). */
  private[graft] val QualityModelFixturePath = graft.Fixtures.path("quality_model")

  /** The catalog queries that SCORE against the persisted quality model
    * (call [[graft.operators.QualityModel.ensureModel]] at query time)
    * without owning its training budget. Bench pre-builds the model
    * outside per-query timing iff one of THESE is in the run — the same
    * explicit-registry protocol as
    * [[SimilarityQueries.indexServingQueries]] (IndexRegistrySpec
    * mechanically pins this set against the ensureModel call sites, so a
    * new consumer can't silently re-absorb training into its first timed
    * pass — the r9 `pipe_curriculum` budget breach). `text_quality_model`
    * is deliberately ABSENT: it is the training query, its budget covers
    * writeModel. */
  private[graft] val qualityModelServingQueries: Set[String] = Set(
    "text_quality_auc", "text_quality_calibration", "text_quality_pr",
    "pipe_curriculum", "pipe_dataset_card2")

  /** Learned-vocab fixture export for `text_bpe_doclen_verified`. */
  private[graft] val BpeVocabFixturePath = graft.Fixtures.path("bpe_vocab")
  private[graft] val BpeStatesFixturePath = graft.Fixtures.path("bpe_states")
  private[graft] val BpeEncFixturePath = graft.Fixtures.path("bpe_encoded")
  private[graft] val BpeMergesStatesPath = graft.Fixtures.path("bpe_merges_states")
  private[graft] val BpeTopFixturePath = graft.Fixtures.path("bpe_top_vocab")
  private[graft] val BpeDoclenFixturePath = graft.Fixtures.path("bpe_doclen_vocab")
  // fixed-point log tables (one per query so verify order never couples):
  // the determinism-rule protocol — ln runs once, in Spark, over distinct
  // integer count keys; both engines score by integer join + sum
  private[graft] val PplLogFixturePath = graft.Fixtures.path("ppl_logtable")
  private[graft] val PplModelLogFixturePath = graft.Fixtures.path("ppl_model_logtable")
  private[graft] val PplSampleLogFixturePath = graft.Fixtures.path("ppl_sample_logtable")
  private[graft] val TriLogFixturePath = graft.Fixtures.path("trigram_logtable")

  private def ratio4(a: Column, b: Column): Column =
    floor(a.cast("double") * 10000 / b) / 10000

  /** Language stopword alternations (tiny n-gram heuristic). */
  private val langPatterns = Seq(
    "en" -> "\\b(the|and|of|to|in|is|for|with)\\b",
    "es" -> "\\b(el|la|de|que|los|las|una|por)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein)\\b")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // trained quality classifier (the fastText-filter distillation):
    // ridge-regress the Gopher rule verdict onto six integer document
    // features via exact DECIMAL sufficient statistics, solve the 6x6
    // system on the driver, export the 1e12-scaled integer weights as a
    // fixture, and score the corpus as a pure integer dot product. The
    // DuckDB oracle recomputes the features from raw text and scores
    // against the SAME weight fixture — training (the one float step)
    // exports; everything downstream hash-matches engine-independently.
    "text_quality_model" -> ((s, d) => {
      // the TRAINING query: its budget deliberately covers writeModel.
      // Consumers (auc/calibration/pr/curriculum/card2) call ensureModel
      // instead — score-only when the cached model is current.
      val base = docs(s, d)
      graft.operators.QualityModel
        .writeModel(base, QualityModelFixturePath, identity = d)
      graft.operators.QualityModel.scoreAgainst(base, QualityModelFixturePath)
        .orderBy("doc_id")
    }),

    // exact ROC-AUC of the trained quality score against the Gopher
    // verdict — the audit every filter model ships with before it gates a
    // corpus. Scale shape: the corpus collapses to (score, n_pos, n_neg)
    // in ONE mergeable hash aggregate; the Mann-Whitney rank-sum then runs
    // on the distinct-score grid only (a window over aggregated rows —
    // the raw corpus never passes through a global sort). Ties get the
    // average-rank trapezoid term n1*n0/2, carried doubled so the scan is
    // all-integer; the single final division runs on exact-integer-valued
    // doubles (deterministic IEEE, no Σ-order dependence), so the ppm
    // floor is engine-identical at any corpus size.
    "text_quality_auc" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.QualityModel
        .ensureModel(base, QualityModelFixturePath, identity = d)
      val scored = graft.operators.QualityModel
        .scoreAgainst(base, QualityModelFixturePath)
      graft.operators.EvalOps.rocAuc(scored, "score_fp", "label")
    }),

    // reliability table for the same model (is a high score actually more
    // likely to pass?): 10 equal-width bins over the observed score range
    // — the range is a 2-long broadcast from one tiny aggregate, binning
    // is integer arithmetic in the scan, and the result is |bins| rows.
    // Per bin: count, label positives, predicted positives, floored mean
    // score and positive-rate ppm. Signed means go through the
    // floor-on-double chain (Spark `div` truncates toward zero, DuckDB
    // `//` floors — they disagree on negatives, doubles don't).
    "text_quality_calibration" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.QualityModel
        .ensureModel(base, QualityModelFixturePath, identity = d)
      val scored = graft.operators.QualityModel
        .scoreAgainst(base, QualityModelFixturePath)
      graft.operators.EvalOps
        .calibration(scored, "score_fp", "label", "predicted")
    }),

    // vocabulary coverage curve (the tokenizer-design readout: how much of
    // the token stream does a top-k vocab cover?): one vocab aggregate,
    // rank over the VOCAB grid (never corpus rows), conditional sums give
    // every k in one pass. All integer.
    "text_vocab_coverage" -> ((s, d) => {
      // the rank runs over the VOCAB table — corpus-derived and unbounded
      // (1e8+ types at web scale), so a no-partition-key window would
      // funnel it through one task; globalRank's range-partitioned sort +
      // zipWithIndex is rank-identical ((−c, tok) ascending ≡
      // (c desc, tok) — counts are positive, so negation is order-exact)
      val counts = docs(s, d)
        .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val vocab = graft.operators.CorpusOps
        .globalRank(counts, struct((-col("c")).as("nc"), col("tok")), "rk0")
        .withColumn("rk", col("rk0") + lit(1L))
      val ks = s.createDataFrame(Seq(Tuple1(10L), Tuple1(100L), Tuple1(1000L)))
        .toDF("k")
      vocab.crossJoin(broadcast(ks))
        .groupBy("k").agg(
          sum(when(col("rk") <= col("k"), col("c")).otherwise(0L)).as("covered"),
          sum("c").as("total"))
        .withColumn("coverage_ppm", expr("covered * 1000000 div total"))
        .orderBy("k")
    }),

    // unigram^0.75 negative-sampling table (the word2vec/NCE preparation
    // step: smoothed unigram draw weights): x^0.75 computed as
    // sqrt(x·sqrt(x)) — two CORRECTLY-ROUNDED operations instead of
    // libm pow (whose last ulp differs across runtimes), so the smoothed
    // weights and their ppm shares hash-match engine-independently.
    // One vocab aggregate; shares against a broadcast total; top 50.
    "text_negative_table" -> ((s, d) => {
      val counts = docs(s, d)
        .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .withColumn("w_fp",
          floor(sqrt(col("c").cast("double") * sqrt(col("c").cast("double")))
            * 1000000).cast("long"))
      val tot = counts.agg(sum("w_fp").as("tot_w"))
      counts.crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("w_fp * 1000000 div tot_w"))
        .select("tok", "c", "w_fp", "share_ppm")
        .orderBy(col("c").desc, col("tok")).limit(50)
    }),

    // language-ID confusion matrix (the detector eval next to text_langid's
    // per-doc verdicts): labeled vs guessed counts with per-cell corpus
    // share ppm — one scan, |langs|² output rows
    "text_langid_confusion" -> ((s, d) => {
      val Seq(en, es, de) = langPatterns.map { case (_, pat) =>
        regexp_count(lower(col("text")), lit(pat))
      }
      val guess = when(en >= es && en >= de && en > 0, "en")
        .when(es >= de && es > 0, "es")
        .when(de > 0, "de").otherwise("und")
      val cells = docs(s, d)
        .select(col("lang").as("labeled"), guess.as("guessed"))
        .groupBy("labeled", "guessed").agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum("n").as("total"))
      cells.crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("n * 1000000 div total"))
        .drop("total")
        .orderBy("labeled", "guessed")
    }),

    // precision/recall curve for the trained quality model (the
    // threshold-choosing companion to text_quality_auc): at each decile
    // threshold of the 1e12-scaled regression output, precision and
    // recall of "score >= t" against the Gopher verdict. One (score,
    // n1, n0) aggregate feeds every threshold — the per-threshold
    // tallies are conditional sums over the aggregated grid, so the
    // corpus is scanned once regardless of how many cuts are evaluated.
    "text_quality_pr" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.QualityModel
        .ensureModel(base, QualityModelFixturePath, identity = d)
      val byScore = graft.operators.QualityModel
        .scoreAgainst(base, QualityModelFixturePath)
        .groupBy("score_fp").agg(
          sum(when(col("label"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("label"), 0L).otherwise(1L)).as("n0"))
        .localCheckpoint(true)
      val thr = s.range(0, 10)
        .select((col("id") * 100000000000L).as("thr_fp"))
      byScore.crossJoin(broadcast(thr))
        .groupBy("thr_fp").agg(
          sum(when(col("score_fp") >= col("thr_fp"), col("n1")).otherwise(0L)).as("tp"),
          sum(when(col("score_fp") >= col("thr_fp"), col("n0")).otherwise(0L)).as("fp"),
          sum("n1").as("pos"))
        .select(col("thr_fp"), col("tp"), col("fp"),
          expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) ELSE 0 END")
            .as("precision_ppm"),
          expr("CASE WHEN pos > 0 THEN tp * 1000000 div pos ELSE 0 END")
            .as("recall_ppm"))
        .orderBy("thr_fp")
    }),

    // BPE merge training on the corpus (tokenizer learning, the capability
    // upstream of token counting): 12 merge rules from the word-frequency
    // formulation — ONE corpus-sized word-count shuffle, then the
    // in-process incremental merge loop over the collected vocab-bounded
    // table (real-vocab capable: 32k merges need ZERO extra Spark jobs —
    // BpeScaleDrive records the figure). FULLY ORACLE-CHECKED (promoted
    // round 9): the DISTRIBUTED formulation's per-round vocab states
    // export as this query's own fixture, the oracle recomputes every
    // round's weighted-pair argmax from them, and the returned table is
    // the PRODUCTION fast trainer's — so the driver itself re-proves
    // fast ≡ distributed merge-for-merge on every run (BpeFastSpec's
    // equality bar, executed as a hash check).
    "text_bpe_merges" -> ((s, d) => {
      val corpus = docs(s, d)
      graft.operators.CorpusOps.bpeTrainStates(corpus, numMerges = 12)._2
        .write.mode("overwrite").parquet(BpeMergesStatesPath)
      graft.operators.CorpusOps.bpeTrainFast(corpus, numMerges = 12)
        .orderBy("rank")
    }),

    // The tokenizer's APPLY step: encode the corpus with the merges just
    // learned, surface the 25 most frequent BPE tokens. The iterative
    // rewrite runs once per DISTINCT word (vocab-sized side); the corpus
    // pays one word-count shuffle. FULLY ORACLE-CHECKED (promoted round
    // 9, the text_bpe_encode_verified protocol applied to the production
    // output): the learned word -> token-sequence table exports as this
    // query's own fixture, and the oracle RECOUNTS word frequencies from
    // the raw corpus, joins the fixture, and rebuilds the same top-25 —
    // the count pipeline cross-checks engine-independently; only the
    // merge-chain rewrite itself rides the fixture.
    "text_bpe_encode" -> ((s, d) => {
      val corpus = docs(s, d)
      val merges = graft.operators.CorpusOps.bpeTrainFast(corpus, numMerges = 12)
      graft.operators.CorpusOps.bpeEncode(corpus, merges)
        .select(col("w"), col("tokens"))
        .write.mode("overwrite").parquet(BpeTopFixturePath)
      corpus
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .join(s.read.parquet(BpeTopFixturePath), "w")
        .select(explode(col("tokens")).as("token"), col("n"))
        .groupBy("token").agg(sum("n").as("freq"))
        .orderBy(col("freq").desc, col("token")).limit(25)
    }),

    // Per-doc token budget under the LEARNED tokenizer (what sequence
    // packing at 100 TB actually keys on): doc word streams join the
    // broadcast vocab->token-length table, aggregated per source. FULLY
    // ORACLE-CHECKED (promoted round 9): the (word, token_count) table
    // exports as this query's own fixture; the oracle re-walks the raw
    // corpus's word streams, joins it, and recomputes the per-source
    // integer aggregate — tokens_per_word as an exact integer div.
    "text_bpe_doclen" -> ((s, d) => {
      val corpus = docs(s, d)
      val merges = graft.operators.CorpusOps.bpeTrainFast(corpus, numMerges = 12)
      graft.operators.CorpusOps.bpeEncode(corpus, merges)
        .select(col("w"), size(col("tokens")).cast("long").as("word_tokens"))
        .write.mode("overwrite").parquet(BpeDoclenFixturePath)
      graft.operators.CorpusOps.bpeDocLengths(corpus, merges)
        .join(corpus.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          sum("n_words").as("total_words"),
          sum("n_tokens").as("total_tokens"))
        .select(col("source"), col("docs"), col("total_words"),
          col("total_tokens"),
          (expr("(total_tokens * 10000) div total_words") / 10000.0)
            .as("tokens_per_word"))
        .orderBy("source")
    }),

    // the ORACLE-CHECKED half of BPE doc budgeting: the learned
    // word -> token-count table (the non-SQL step — the iterative merge
    // chain) exports as a fixture, and BOTH engines recompute the per-doc
    // token budgets from it (word explode + vocab join + integer sums) —
    // the corpus-level aggregation the packer keys on hash-checks
    // engine-independently; the encoder itself stays on PipelineSpec's
    // hand-computed bars.
    "text_bpe_doclen_verified" -> ((s, d) => {
      val corpus = docs(s, d)
      val merges = graft.operators.CorpusOps.bpeTrainFast(corpus, numMerges = 12)
      graft.operators.CorpusOps.bpeEncode(corpus, merges)
        .select(col("w"), size(col("tokens")).cast("long").as("word_tokens"))
        .write.mode("overwrite").parquet(BpeVocabFixturePath)
      val vocab = s.read.parquet(BpeVocabFixturePath)
      corpus
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .join(broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("word_tokens").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // the ORACLE-CHECKED half of BPE TRAINING: the per-round vocab states
    // (the iterative part — symbol tables as they stood before each merge)
    // export as a fixture, and BOTH engines recompute every round's
    // weighted adjacent-pair counts and argmax selection from identical
    // bits — the trainer's selection logic (count -> (cnt desc, pair)
    // tie-break -> top-1 per round) hash-checks engine-independently; the
    // state REWRITE between rounds stays on PipelineSpec's hand-computed
    // merge-sequence bars.
    "text_bpe_merges_verified" -> ((s, d) => {
      val corpus = docs(s, d)
      graft.operators.CorpusOps.bpeTrainStates(corpus, numMerges = 12)._2
        .write.mode("overwrite").parquet(BpeStatesFixturePath)
      val st = s.read.parquet(BpeStatesFixturePath)
      val pairs = st
        .filter(size(col("syms")) >= 2)
        .select(col("merge_round"),
          explode(expr("zip_with(slice(syms, 1, size(syms) - 1)," +
            " slice(syms, 2, size(syms) - 1)," +
            " (a, b) -> named_struct('lhs', a, 'rhs', b))")).as("p"),
          col("n"))
        .select(col("merge_round"), col("p.lhs").as("lhs"),
          col("p.rhs").as("rhs"), col("n"))
      val cnts = pairs.groupBy("merge_round", "lhs", "rhs")
        .agg(sum("n").as("pair_count"))
      cnts.withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("merge_round")
            .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))))
        .filter(col("rk") === 1)
        .select(col("merge_round").cast("long").as("merge_round"),
          col("lhs"), col("rhs"), col("pair_count"))
        .orderBy("merge_round")
    }),

    // the ORACLE-CHECKED half of BPE ENCODING: the learned word -> token
    // SEQUENCE table (the merge-chain rewrite, non-SQL) exports as a
    // fixture; both engines recount word frequencies from the raw corpus,
    // join the fixture, and emit per-word token counts PLUS the
    // reassembled string — concat(tokens) must equal word + '</w>', so a
    // lossy or reordered encode surfaces as a hash mismatch, proving the
    // round-trip property engine-independently (PipelineSpec's in-JVM
    // round-trip bar gains a DuckDB-recomputed twin).
    "text_bpe_encode_verified" -> ((s, d) => {
      val corpus = docs(s, d)
      val merges = graft.operators.CorpusOps.bpeTrainFast(corpus, numMerges = 12)
      graft.operators.CorpusOps.bpeEncode(corpus, merges)
        .select(col("w"), col("tokens"))
        .write.mode("overwrite").parquet(BpeEncFixturePath)
      val voc = s.read.parquet(BpeEncFixturePath)
      corpus
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .join(broadcast(voc), "w")
        .select(col("w"), col("n"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws("", col("tokens")).as("reassembled"))
        .orderBy("w")
    }),

    // Stupid Backoff trigram scoring (Brants et al. 2007): the model is
    // the EVEN-doc_id half of the corpus, every doc scores against it —
    // so the odd half actually exercises the backoff ladder. The hit-tier
    // columns are exact integers and the nll is the bigram recipe's
    // fixed-point mean, so the full ladder (trigram hit -> alpha*bigram
    // -> alpha^2*smoothed-unigram) is DuckDB-hash-checked end to end.
    "text_trigram_backoff" -> ((s, d) => {
      val all = docs(s, d)
      graft.operators.LangModel.stupidBackoffNllLogTable(
          all, all.filter(col("doc_id") % 2 === 0), TriLogFixturePath)
        .orderBy("doc_id")
    }),

    // Unicode cleaning pass (the canonical FIRST stage of a web-corpus
    // pipeline — every hash-keyed operator downstream treats composed and
    // decomposed graphemes as different bytes unless NFC runs first):
    // strip ASCII control chars -> trim -> collapse whitespace runs ->
    // NFC-normalize via the native codegen graft_nfc expression. NFC is
    // a Unicode-standard algorithm, so DuckDB's nfc_normalize recomputes
    // the identical clean text and the md5 fingerprint hash-checks the
    // whole pass end to end.
    "text_unicode_clean" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val stripped = regexp_replace(col("text"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
      val collapsed = regexp_replace(trim(stripped), "[ \\t\\n\\r]+", " ")
      docs(s, d)
        .withColumn("clean", call_function("graft_nfc", collapsed))
        .select(col("doc_id"),
          length(col("text")).as("n_raw"),
          length(col("clean")).as("n_clean"),
          (col("clean") =!= col("text")).as("changed"),
          (instr(col("text"), "\uFFFD") > 0).as("has_repl"),
          substring(md5(col("clean")), 1, 16).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // quality scoring: length, token stats, stopword ratio
    "text_quality" -> ((s, d) => {
      val nTokens = size(split(trim(col("text")), " +"))
      val nStop = regexp_count(lower(col("text")), lit(langPatterns.head._2))
      docs(s, d).select(
          col("doc_id"),
          length(col("text")).as("n_chars_m"),
          nTokens.as("n_tokens"),
          ratio4(length(regexp_replace(col("text"), " ", "")), nTokens).as("avg_token_len"),
          ratio4(nStop, nTokens).as("stopword_ratio"),
          (nTokens < 5).as("too_short"))
        .orderBy("doc_id")
    }),

    // keyword-in-context concordance (corpus exploration: every "spark"
    // occurrence with ±2 words): one in-scan explode + a clamped slice,
    // no shuffle beyond the final sort — the grep-with-context of the
    // catalog, fully recomputable in SQL
    "text_concordance" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("w"))
        .select(col("doc_id"),
          explode(expr("filter(sequence(0, size(w) - 1), i -> w[i] = 'spark')")).as("pos"),
          col("w"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          expr("array_join(slice(w, greatest(pos - 2, 0) + 1, " +
            "pos + 3 - greatest(pos - 2, 0)), ' ')").as("kwic"))
        .orderBy("doc_id", "pos")
    }),

    // Heaps'-law vocabulary-growth curve: V(k) = distinct tokens whose
    // FIRST occurrence lies in the first k% of docs (by doc_id order) —
    // the sublinearity audit that predicts vocab-bounded state sizes
    // (BPE tables, LM counts) at 100 TB. One token scan to min-first-doc,
    // then a 10-row threshold aggregate; exact integers throughout
    "text_heaps_curve" -> ((s, d) => {
      val firsts = docs(s, d)
        .select(col("doc_id"), explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .groupBy("tok").agg(min("doc_id").as("first_doc"))
      val maxId = docs(s, d).agg(max("doc_id").cast("long").as("mx"))
      firsts.crossJoin(broadcast(maxId))
        .select(explode(sequence(lit(1), lit(10))).as("decile"),
          col("first_doc"), col("mx"))
        .filter(col("first_doc") * 10 <= col("decile") * col("mx"))
        .groupBy("decile").agg(count(lit(1)).as("vocab"))
        .orderBy("decile")
    }),

    // token-concentration Gini: ranks over (count, token) are unique, so
    // the classic Σ(2i − n − 1)·c_(i) numerator is an exact integer and
    // gini_milli = num·1000 div (n·Σc) is engine-exact — the one-number
    // "how head-heavy is this corpus" readout behind the skew-join and
    // df-cap knobs
    "text_token_gini" -> ((s, d) => {
      val counts = docs(s, d)
        .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      // the global rank runs over the VOCAB table (corpus-derived and
      // unbounded — 1e8+ types at web scale), so it goes through the
      // distributed globalRank (range-partitioned sort + zipWithIndex),
      // not a single-reducer window; 1 + 0-based rank over (c, tok)
      // ascending is rank-identical to ROW_NUMBER, so the Σ(2i−n−1)·c
      // formula and the oracle are unchanged
      val ranked = graft.operators.CorpusOps
        .globalRank(counts, struct(col("c"), col("tok")), "rk0")
        .withColumn("i", col("rk0") + lit(1L))
      ranked
        .agg(count(lit(1)).as("n_tokens"),
          sum("c").cast("long").as("total"),
          sum((lit(2L) * col("i") - lit(1L)) * col("c")).cast("long").as("wsum"))
        .select(col("n_tokens"), col("total"),
          expr("(wsum - n_tokens * total) * 1000 div (n_tokens * total)")
            .as("gini_milli"))
    }),

    // collocation mining: adjacent word pairs ranked by integer LIFT
    // (1000·N·c_ab div (c_a·c_b) — the log-free monotone PMI surrogate,
    // the same trick as BM25's rational idf): which bigrams occur far
    // more than their unigram frequencies predict. Support floor >= 5
    // kills noise pairs; top-20 by (lift, pair) is fully deterministic
    // and every quantity is an exact integer, so the oracle recomputes
    // counts, lift, and the cut
    "text_collocations" -> ((s, d) => {
      val words = docs(s, d)
        .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("w"))
      val uni = words
        .select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val bi = words
        .filter(size(col("w")) >= 2)
        .select(explode(sequence(lit(0), size(col("w")) - 2)).as("i"), col("w"))
        .select(expr("w[i]").as("t1"), expr("w[i+1]").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val tot = uni.agg(sum("c").cast("long").as("n"))
      bi.join(uni.select(col("tok").as("t1"), col("c").as("c_a")), "t1")
        .join(uni.select(col("tok").as("t2"), col("c").as("c_b")), "t2")
        .crossJoin(broadcast(tot))
        .withColumn("lift_milli", expr("1000L * n * c_ab div (c_a * c_b)"))
        .select("t1", "t2", "c_ab", "c_a", "c_b", "lift_milli")
        .orderBy(col("lift_milli").desc, col("t1"), col("t2"))
        .limit(20)
    }),

    // Flesch–Kincaid readability (the classic quality feature): sentence
    // count = punctuation-run count, syllables = vowel-group count (the
    // standard heuristic). Counts are exact integers; the grade is
    // floor-milli over IEEE ops written identically in both engines, with
    // greatest(·, 1) floors making the no-punctuation degenerate case
    // deterministic rather than a division by zero
    "text_readability" -> ((s, d) => {
      val nSent = size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
      val nWords = size(split(trim(col("text")), " +"))
      val nSyll = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
      docs(s, d).select(
          col("doc_id"),
          nSent.cast("long").as("n_sent"),
          nWords.cast("long").as("n_words"),
          nSyll.cast("long").as("n_syll"))
        .withColumn("fk_milli", expr(
          "CAST(floor(1000 * ((0.39 * (CAST(n_words AS DOUBLE) / CAST(greatest(n_sent, 1L) AS DOUBLE)))" +
            " + (11.8 * (CAST(n_syll AS DOUBLE) / CAST(greatest(n_words, 1L) AS DOUBLE)))" +
            " - 15.59)) AS BIGINT)"))
        .orderBy("doc_id")
    }),

    // n-gram-heuristic language ID: argmax of per-language stopword hits
    "text_langid" -> ((s, d) => {
      val scores = langPatterns.map { case (lang, pat) =>
        lang -> regexp_count(lower(col("text")), lit(pat))
      }
      val Seq(en, es, de) = scores.map(_._2)
      docs(s, d).select(
          col("doc_id"), col("lang").as("labeled_lang"),
          when(en >= es && en >= de && en > 0, "en")
            .when(es >= de && es > 0, "es")
            .when(de > 0, "de")
            .otherwise("und").as("guessed_lang"))
        .orderBy("doc_id")
    }),

    // BPE-ish token counting: letter-runs | digit-runs | single symbols
    "text_token_count" -> ((s, d) => {
      val bpeish = regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
      docs(s, d)
        .select(col("source"), bpeish.as("n_bpe"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("n_bpe").as("total_tokens"),
          (floor(sum("n_bpe") * lit(10000) / count(lit(1))) / 10000).as("avg_tokens"))
        .orderBy("source")
    }),

    // TF-IDF keyword extraction: top-3 most characteristic terms per doc
    // under the exact-integer idf surrogate tf * (N*10^4 div df) — integer
    // division instead of ln() so the ranking is engine-independent
    // bit-for-bit (ln's last ulp varies across libms; div doesn't). One
    // (doc_id, term) shuffle + one vocab-bounded df aggregate; the per-doc
    // window state is one doc's vocabulary.
    "text_tfidf_topk" -> ((s, d) =>
      graft.operators.CorpusOps.tfidfKeywords(docs(s, d), k = 3)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
        .orderBy("doc_id", "rnk")),

    // feature-hashed TF-IDF document vectors (hashing trick, Weinberger et
    // al. 2009): 64 signed md5 buckets, exact-integer weights — the
    // text → vector bridge into the similarity operators, sparse
    // (doc_id, bucket, weight) rows. Fixed dimensionality regardless of
    // vocabulary growth; every downstream inner product stays integer.
    "text_hash_vectors" -> ((s, d) =>
      graft.operators.CorpusOps.hashedTfidf(docs(s, d), buckets = 64)
        .orderBy("doc_id", "bucket")),

    // content fingerprint: digest of the normalized text (stable doc identity)
    "text_fingerprint" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      docs(s, d)
        .select(col("doc_id"), substring(md5(norm), 1, 16).as("fp"))
        .orderBy("doc_id")
    }),

    // vocabulary building: top-50 most frequent lowercased letter-tokens
    // across the corpus with document frequency — explode is the only
    // fan-out, the count is one shuffle (the classic first step of any
    // tokenizer/vocab pipeline)
    // passage-level BM25 retrieval (the RAG indexing shape): the corpus
    // explodes into stride-8 / window-16 word passages IN-SCAN (no
    // shuffle), each passage becomes a retrieval unit with a composite
    // id, and the proven BM25 recipe ranks the top-25 passages for the
    // query — retrieval granularity decouples from document granularity,
    // which is what makes BM25 usable over book-length docs at 100 TB.
    "text_passage_bm25" -> ((s, d) => {
      val pas = graft.operators.CorpusOps
        .passages(docs(s, d), window = 16, stride = 8)
        .select((col("doc_id") * 10000 + col("pas_idx")).as("doc_id"),
          col("text"))
      graft.operators.CorpusOps.bm25(pas, Seq("spark", "merge"), k = 25)
        .select(expr("doc_id div 10000").as("doc_id"),
          pmod(col("doc_id"), lit(10000)).as("pas_idx"),
          col("tf_spark"), col("tf_merge"), col("dl"), col("score"))
    }),

    // per-doc novelty: the share of a doc's DISTINCT word trigrams found
    // in no other doc — the memorization-risk / contribution metric (a
    // doc of df-1 grams adds new content; a doc of shared grams is
    // redundant). One gram shuffle for df, one doc aggregate; ratios
    // floor-scaled. Trigram construction is the in-row slice+zip of the
    // LM path (shuffle-free).
    "text_novelty" -> ((s, d) => {
      val grams = docs(s, d)
        .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 2), " +
            "i -> concat_ws(' ', w[i-1], w[i], w[i+1]))")).as("gram"))
        .distinct()
      // grams is already distinct on (doc_id, gram), so count-per-gram ≡
      // countDistinct(doc_id) bit-for-bit — count(1) skips the Expand +
      // per-key distinct machinery the countDistinct formulation pays
      val dfTab = grams.groupBy("gram")
        .agg(count(lit(1)).as("df"))
      grams.join(dfTab, Seq("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
          (floor(sum(when(col("df") === 1, 1L).otherwise(0L)) * lit(10000)
            / count(lit(1))) / 10000).as("novelty"))
        .orderBy("doc_id")
    }),

    // Zipf audit: top-40 rank/frequency table with the rank*freq product
    // (Zipf's law predicts it ~constant) and each token's cumulative
    // corpus share — the head-heaviness diagnostic behind every df-cap /
    // broadcast-head decision in this library. One vocab-bounded
    // aggregate; the window runs over 40 rows.
    "text_zipf" -> ((s, d) => {
      val counts = docs(s, d)
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
        .filter(length(col("tok")) >= 2)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val total = counts.agg(sum("freq").as("total"))
      val top = counts.orderBy(col("freq").desc, col("tok")).limit(40)
        .crossJoin(broadcast(total))
      val w = Window.orderBy(col("freq").desc, col("tok"))
      top
        .withColumn("rank", row_number().over(w))
        .withColumn("rank_x_freq", col("rank") * col("freq"))
        .withColumn("cum_share",
          floor(sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0))
            * lit(10000) / col("total")) / 10000)
        .select("rank", "tok", "freq", "rank_x_freq", "cum_share")
        .orderBy("rank")
    }),

    "text_vocab_topk" -> ((s, d) => {
      val tokens = docs(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
        .filter(length(col("tok")) >= 2)
      tokens.groupBy("tok")
        .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
        .orderBy(col("tf").desc, col("tok"))
        .limit(50)
    }),

    // LM-based quality scoring (the CCNet recipe): every doc's mean
    // bigram NLL under the corpus's own add-one-smoothed bigram model —
    // high NLL = far from the corpus distribution. Bigrams are built
    // in-row (slice+zip, shuffle-free); model counts are vocab-bounded
    // hash aggregates; scoring is two shuffle hash joins. Per-bigram NLL
    // is fixed-pointed to an exact LONG before the doc aggregation, so
    // the result is immune to float summation order (see [[graft
    // .operators.LangModel]]).
    "text_perplexity" -> ((s, d) =>
      graft.operators.LangModel
        .bigramNllLogTable(docs(s, d), PplLogFixturePath).orderBy("doc_id")),

    // same scores through the PERSISTED model (build once / score many —
    // the amortization split: a reference LM is trained on one corpus
    // snapshot and scores every later batch). Self-scoring against the
    // frozen model is bit-identical to the on-the-fly path, so the same
    // oracle hash must match — which also proves the persistence
    // round-trip loses nothing.
    "text_perplexity_model" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
      // the cache key carries a fingerprint of the source parquet's file
      // metadata (name/size/mtime): driver testdata HAS been regenerated
      // in place across rounds (the events.ts type change), and a
      // path-only key would silently reuse a model trained on the old
      // corpus — breaking the claimed bit-identity with text_perplexity
      val fp = {
        val f = new java.io.File(s"$d/documents.parquet")
        val files = if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
        val sig = files.map(x => s"${x.getName}:${x.length}:${x.lastModified}").mkString("|")
        f"${sig.hashCode & 0xffffffffL}%08x"
      }
      // v3 = format_version-stamped meta (LangModel.FormatVersion): the
      // path version bump makes pre-stamp cached dirs simply not found
      // (rebuilt fresh) instead of tripping the loud stale-layout gate —
      // the right behavior for a build-once ensure path
      val path = s"${sys.props("java.io.tmpdir")}/graft_lm/v3_${tag}_$fp"
      if (!graft.operators.LangModel.modelExists(s, path))
        graft.operators.LangModel.writeModel(docs(s, d), path)
      graft.operators.LangModel
        .scoreAgainstLogTable(docs(s, d), path, PplModelLogFixturePath)
        .orderBy("doc_id")
    }),

    // composed cleaning pipeline (the realistic end-to-end use): quality
    // gate (>= 5 tokens) -> normalized exact-dedup keep-lowest-id ->
    // English-only gate -> surviving doc ids. Each stage is an operator
    // proven above; this query proves they COMPOSE in one plan (one
    // window shuffle + codegen'd filters, no materialization between
    // stages).
    "pipe_clean_corpus" -> ((s, d) => {
      val nTokens = size(split(trim(col("text")), " +"))
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val Seq(en, es, de) = langPatterns.map { case (_, pat) =>
        regexp_count(lower(col("text")), lit(pat))
      }
      val isEnglish = en >= es && en >= de && en > 0
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("norm_hash").orderBy("doc_id")
      docs(s, d)
        .filter(nTokens >= 5)
        .select(col("doc_id"), md5(norm).as("norm_hash"), isEnglish.as("is_en"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("is_en"))
        .select(col("doc_id"), col("norm_hash"))
        .orderBy("doc_id")
    }),

    // PII scrubbing: emails and phone numbers replaced by typed
    // placeholders, plus detection counts. The corpus is synthetic and
    // PII-free, so the query first STAMPS deterministic PII into each doc
    // (the oracle does the identical construction) — what's under test is
    // the scrub operator: regex semantics, global replacement, and
    // counting, all codegen'd (regexp_replace/regexp_count, no UDF), with
    // the hash compare proving Spark and DuckDB agree byte-for-byte on the
    // scrubbed text.
    "text_pii_scrub" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "555-[0-9]{3}-[0-9]{4}"
      val stamped = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com call 555-123-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      docs(s, d)
        .select(col("doc_id"),
          regexp_count(stamped, lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(stamped, lit(phoneRe)).cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(stamped, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("scrubbed_md5"))
        .orderBy("doc_id")
    }),

    // repetition-based quality signals (Gopher-style): the duplicated-word
    // fraction and the dominance of the single most frequent word — high
    // values flag boilerplate/spam for the quality gate. One explode + a
    // two-level aggregation (word counts, then per-doc stats); every
    // counter is integer-exact and ratios are floor-scaled.
    "text_repetition" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          (floor((col("n_words") - col("n_distinct")) * lit(1000) / col("n_words")) / 1000)
            .as("dup_frac"),
          (floor(col("top_c") * lit(1000) / col("n_words")) / 1000).as("top_word_frac"))
        .orderBy("doc_id")
    }),

    // deterministic hash sampling: a stable ~10% Bernoulli sample keyed on
    // md5 of a salted doc_id — reproducible across runs, engines, and
    // cluster sizes, with no RNG state to coordinate; the standard way to
    // cut eval slices from a 100 TB corpus (rand() samples are neither
    // reproducible nor pushdown-friendly). Hex digits compare
    // lexicographically, so the threshold is a plain string bound.
    "pipe_sample_hash" -> ((s, d) =>
      docs(s, d)
        .withColumn("h", md5(concat(lit("graft:"), col("doc_id").cast("string"))))
        .filter(substring(col("h"), 1, 4) < "199a") // 0x0000..0x1999 ~ 10%
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // WEIGHTED Bernoulli sampling: include doc with probability
    // n_chars/1000 (longer docs proportionally likelier — the "sample by
    // tokens, not by docs" correction that keeps a length-biased corpus
    // from under-representing long documents). The coin is the first 28
    // bits of a salted md5 compared against weight * 2^28 in INTEGER
    // arithmetic — membership is a pure function of (doc_id, weight), so
    // the sample is reproducible across engines, partitionings, and
    // incremental corpus growth, and the whole operator is a codegen'd
    // filter on the scan: no shuffle, no RNG state, embarrassingly
    // parallel at any scale.
    "pipe_sample_weighted" -> ((s, d) =>
      docs(s, d)
        .withColumn("h", md5(concat(lit("graft-wt:"), col("doc_id").cast("string"))))
        .filter(expr("CAST(conv(substring(h, 1, 7), 16, 10) AS BIGINT) * 1000" +
          " < n_chars * 268435456"))
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .orderBy("doc_id")),

    // BM25 relevance ranking of the corpus against a term query — the
    // retrieval step of a dedup-then-retrieve pipeline. One scan computes
    // per-doc term frequencies and length (codegen regexp, no explode); the
    // corpus stats (N, avgdl, per-term df) are ONE aggregate row broadcast
    // back, so at 100 TB the plan is scan + tiny broadcast + top-k, no
    // shuffle of document rows at all. The idf uses the log-free rational
    // form (N - df + 0.5)/(df + 0.5) — same ranking as the log form, but
    // every operation is a plain IEEE +,*,/ on integer-derived doubles, so
    // Spark and DuckDB produce bit-identical scores (ln differs in the last
    // ulp across libm implementations, which would break the hash oracle).
    // Runs through the library operator [[graft.operators.CorpusOps.bm25]]
    // (k1 = 1.2, b = 0.75 defaults — `1.2 + 1` and `1 - 0.75` are
    // bit-identical to the oracle's 2.2 / 0.25 literals in IEEE doubles),
    // so the driver's hash compare covers the public API path.
    "text_bm25" -> ((s, d) =>
      graft.operators.CorpusOps.bm25(
        docs(s, d), terms = Seq("spark", "window", "merge"), k = 50)),

    // hybrid search: BM25 (lexical) + integer-dot retrieval against the
    // query's hashed-TF-IDF vector, fused by reciprocal-rank fusion
    // (Cormack et al. 2009) — rank-only fusion, immune to score-scale
    // mismatch between the legs. Exact integers end to end, so the
    // oracle recomputes BOTH retrievers and the fusion
    "text_hybrid_rrf" -> ((s, d) =>
      graft.operators.CorpusOps.hybridRrf(
          docs(s, d), Seq("spark", "window", "merge"), topN = 20, k = 10)
        .orderBy(col("rrf").desc, col("doc_id"))),

    // deterministic train/valid/test split (12/2/2 sixteenths) from the
    // first hex nibble of a salted hash: membership is a pure function of
    // doc_id, so the split is stable under repartitioning and incremental
    // corpus growth — a new doc never moves an old one between splits.
    "pipe_train_split" -> ((s, d) => {
      val nib = substring(
        md5(concat(lit("graft-split:"), col("doc_id").cast("string"))), 1, 1)
      docs(s, d)
        .select(col("doc_id"),
          when(nib <= "b", "train").when(nib <= "d", "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // the pretraining GLOBAL SHUFFLE, planned: assign every doc to one of
    // 16 output shards by a salted-hash nibble and order WITHIN each shard
    // by the hash — the standard "shuffle 100 TB once, write N shards,
    // stream them in hash order" prep step. Hash-mod sharding needs NO
    // global sort or window (a codegen'd projection feeds one 16-group
    // aggregate); membership is a pure function of doc_id, so shards are
    // stable under repartitioning and incremental growth. Output is the
    // shard manifest a writer would execute: per-shard doc/char volumes
    // (the balance evidence), source spread, and the first hash in shard
    // order (the deterministic intra-shard cursor).
    "pipe_shard_plan" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          graft.operators.CorpusOps.shardHash(col("doc_id")).as("h"))
        .withColumn("shard", graft.operators.CorpusOps.shardNibble(col("h")))
        .groupBy("shard")
        .agg(count(lit(1)).as("docs"),
          sum("n_chars").as("total_chars"),
          countDistinct("source").as("n_sources"),
          min("h").as("min_h"))
        .orderBy("shard")),

    // EXACT heavy hitters (tokens holding >= 1/500 of the corpus) through
    // the two-pass Misra-Gries plan: sketch candidates with the native
    // bounded-memory aggregate, recount only those exactly. The oracle is
    // the full-vocabulary GROUP BY ... HAVING — the sketch plan must match
    // it bit-for-bit while never shuffling the vocabulary (the exactness
    // guarantee is k+1 > denom; see CorpusOps.heavyHitters).
    "text_heavy_hitters" -> ((s, d) =>
      graft.operators.CorpusOps.heavyHitters(docs(s, d), k = 1000, denom = 500)),

    // Gopher-style quality rule battery (Rae et al. 2021 §A1.1, adapted to
    // the whitespace corpus): word-count bounds, mean word length, most-
    // common-word frequency share, duplicate-word fraction, stopword
    // presence — the standard pre-training doc filters. Two-level
    // aggregation: one (doc_id, word) shuffle builds per-doc word counts
    // with map-side partials, then a tiny per-doc rollup; state is bounded
    // by a single document's vocabulary everywhere, so no doc can spill
    // another's task. All ratios floor-scaled to 4 decimals (engine-exact).
    "text_gopher_quality" -> ((s, d) =>
      gopherScores(docs(s, d)).orderBy("doc_id")),

    // the session's operators COMPOSE in one plan: Gopher quality gate ->
    // weighted (by-length) Bernoulli sample -> per-language stats of the
    // surviving corpus — the realistic "filter then sample then report"
    // DAG. Each stage is oracle-proven alone above; this query's oracle
    // is the combined predicate, so the composition itself is what's
    // hash-checked. Plan shape: the gopher scores join back doc-keyed,
    // the sample predicate is a codegen filter, one final tiny aggregate.
    "pipe_quality_sample" -> ((s, d) => {
      val base = docs(s, d)
      base.join(gopherScores(base).select("doc_id", "passes"), "doc_id")
        .filter(col("passes"))
        .withColumn("h", md5(concat(lit("graft-wt:"), col("doc_id").cast("string"))))
        .filter(expr("CAST(conv(substring(h, 1, 7), 16, 10) AS BIGINT) * 1000" +
          " < n_chars * 268435456"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("lang")
    }),

    // perplexity-gated pipeline (the CCNet composition): LM-score the
    // corpus against its own bigram model, keep in-distribution docs
    // (nll <= 3.4), take the deterministic 50% hash sample, report per
    // language. min/max of the kept scores ride along (both order-
    // independent, unlike a float avg) so the oracle hash also pins the
    // gate's boundary behavior.
    "pipe_perplexity_sample" -> ((s, d) => {
      val base = docs(s, d)
      base
        .join(graft.operators.LangModel
          .bigramNllLogTable(base, PplSampleLogFixturePath)
          .select("doc_id", "nll"), "doc_id")
        .filter(col("nll") <= 3.4)
        .withColumn("h", md5(concat(lit("graft-ppl:"), col("doc_id").cast("string"))))
        .filter(substring(col("h"), 1, 1) < "8")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
          min("nll").as("min_nll"), max("nll").as("max_nll"))
        .orderBy("lang")
    }))

  /** Per-doc Gopher rule battery (word-count bounds, mean word length,
    * top-word share, dup-word fraction, stopword presence) with the
    * `passes` verdict — shared by text_gopher_quality and the composed
    * pipe_quality_sample. */
  private[queries] def gopherScores(documents: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val toks = documents.select(col("doc_id"),
      explode(split(trim(col("text")), " +")).as("tok"))
    val wc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val agg = wc.groupBy("doc_id").agg(
      sum("c").as("n_words"),
      sum(length(col("tok")) * col("c")).as("sum_len"),
      count(lit(1)).as("n_distinct"),
      max("c").as("top_c"),
      sum(when(col("tok").isin(stop: _*), col("c")).otherwise(0L)).as("n_stop"))
    def fl4(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      floor(num.cast("double") * 10000 / den) / 10000
    agg.select(
        col("doc_id"), col("n_words"),
        fl4(col("sum_len"), col("n_words")).as("mean_word_len"),
        fl4(col("top_c"), col("n_words")).as("top_word_frac"),
        fl4(col("n_words") - col("n_distinct"), col("n_words")).as("dup_word_frac"),
        col("n_stop"))
      .withColumn("passes",
        col("n_words").between(20, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("top_word_frac") <= 0.2 &&
          col("dup_word_frac") <= 0.5 &&
          col("n_stop") >= 2)
  }

  /** Shared by text_perplexity and text_perplexity_model (the persisted-
    * model self-scoring path is defined to be bit-identical), each with
    * its own exported log-table fixture. The oracle still recomputes the
    * ENTIRE count pipeline (bigrams, c12, c1, V) from raw text — only the
    * transcendental `ln` comes from the fixture, keyed on the full integer
    * triple (c12, c1, v), so a count or vocabulary disagreement between
    * engines misses the join and fails as a row mismatch. */
  private def perplexitySql(fixturePath: String) =
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), bg0 AS (
        |  SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN generate_series(1, len(w) - 1)]) AS bg
        |  FROM t WHERE len(w) >= 2
        |), bg AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bg0
        |), c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
        |), c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1
        |), v AS (
        |  SELECT COUNT(DISTINCT x.uw) AS v
        |  FROM (SELECT unnest(w) AS uw FROM t) x
        |), lt AS (SELECT * FROM read_parquet('$fixturePath/*.parquet'))
        |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(SUM(lt.nll_fp) / COUNT(*) / 1e4, 6) AS nll
        |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |     JOIN lt ON lt.c12n = c12.c12 AND lt.c1n = c1.c1 AND lt.v = v.v
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  /** Shared scored-corpus CTE chain `WITH ... scored` — (doc_id, score_fp,
    * predicted, label) recomputed from raw text against the exported weight
    * fixture. text_quality_model selects it directly; the AUC and
    * calibration audits extend the chain. */
  private[queries] lazy val qualityScoredSql: String =
    s"""WITH wc AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      |    FROM documents)
      |  GROUP BY 1, 2
      |), a AS (
      |  SELECT doc_id, SUM(c) AS n_words, SUM(len(tok) * c) AS sum_len,
      |    COUNT(*) AS n_distinct, MAX(c) AS top_c,
      |    SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN c ELSE 0 END) AS n_stop
      |  FROM wc GROUP BY 1
      |), f AS (
      |  SELECT doc_id,
      |    CAST(10000 AS BIGINT) AS f0,
      |    CAST(LEAST(n_words, 1000) * 10 AS BIGINT) AS f1,
      |    CAST((sum_len * 10000) // n_words AS BIGINT) AS f2,
      |    CAST((top_c * 10000) // n_words AS BIGINT) AS f3,
      |    CAST(((n_words - n_distinct) * 10000) // n_words AS BIGINT) AS f4,
      |    CAST((n_stop * 10000) // n_words AS BIGINT) AS f5,
      |    (n_words BETWEEN 20 AND 100000
      |     AND (sum_len * 10000) // n_words BETWEEN 30000 AND 100000
      |     AND (top_c * 10000) // n_words <= 2000
      |     AND ((n_words - n_distinct) * 10000) // n_words <= 5000
      |     AND n_stop >= 2) AS label
      |  FROM a
      |), w AS (SELECT * FROM read_parquet('$QualityModelFixturePath/weights/*.parquet'))
      |, scored AS (
      |  SELECT doc_id,
      |    CAST(f0*w_0 + f1*w_1 + f2*w_2 + f3*w_3 + f4*w_4 + f5*w_5 AS BIGINT) AS score_fp,
      |    (f0*w_0 + f1*w_1 + f2*w_2 + f3*w_3 + f4*w_4 + f5*w_5 >= 500000000000) AS predicted,
      |    label
      |  FROM f CROSS JOIN w)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same 0-based positions, same clamped ±2 slice
    "text_concordance" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, w, unnest([i - 1
        |    FOR i IN generate_series(1, len(w)) IF w[i] = 'spark']) AS pos
        |  FROM wd)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  array_to_string(w[greatest(pos - 2, 0) + 1 : pos + 3], ' ') AS kwic
        |FROM occ
        |ORDER BY doc_id, pos""".stripMargin,

    // first-occurrence doc per token, decile thresholds on max doc_id
    "text_heaps_curve" ->
      """WITH f AS (
        |  SELECT tok, MIN(doc_id) AS first_doc FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY 1
        |), mx AS (SELECT MAX(doc_id) AS mx FROM documents)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS vocab
        |FROM f, mx, generate_series(1, 10) AS g(decile)
        |WHERE first_doc * 10 <= decile * mx
        |GROUP BY decile
        |ORDER BY decile""".stripMargin,

    // same unique (count, token) ranks, same integer Gini arithmetic
    "text_token_gini" ->
      """WITH c AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY 1
        |), r AS (
        |  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, tok) AS BIGINT) AS i
        |  FROM c
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(c) AS BIGINT) AS total,
        |  CAST((CAST(SUM((2 * i - 1) * c) AS BIGINT) - COUNT(*) * SUM(c)) * 1000
        |    // (COUNT(*) * SUM(c)) AS BIGINT) AS gini_milli
        |FROM r""".stripMargin,

    // same counts, same integer lift, same (lift, pair) cut
    "text_collocations" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w
        |  FROM documents
        |), uni AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(w) AS tok FROM wd) GROUP BY 1
        |), bi AS (
        |  SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM (
        |    SELECT u.t1, u.t2 FROM (
        |      SELECT unnest([{'t1': w[i], 't2': w[i+1]}
        |                     FOR i IN generate_series(1, len(w) - 1)]) AS u
        |      FROM wd WHERE len(w) >= 2))
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni)
        |SELECT t1, t2, c_ab, a.c AS c_a, b.c AS c_b,
        |  1000 * n * c_ab // (a.c * b.c) AS lift_milli
        |FROM bi JOIN uni a ON a.tok = t1 JOIN uni b ON b.tok = t2, tot
        |ORDER BY lift_milli DESC, t1, t2
        |LIMIT 20""".stripMargin,

    // same regex counts, same greatest() floors, same IEEE op order
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sent,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
        |  FROM documents)
        |SELECT doc_id, n_sent, n_words, n_syll,
        |  CAST(FLOOR(1000 * ((0.39 * (CAST(n_words AS DOUBLE) / CAST(greatest(n_sent, 1) AS DOUBLE)))
        |    + (11.8 * (CAST(n_syll AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)))
        |    - 15.59)) AS BIGINT) AS fk_milli
        |FROM c ORDER BY doc_id""".stripMargin,

    // identical op order: strip controls -> trim -> collapse -> NFC;
    // RE2 \x hex classes match Java's, and nfc_normalize implements the
    // same Unicode-standard algorithm as java.text.Normalizer
    "text_unicode_clean" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    nfc_normalize(regexp_replace(trim(
        |      regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
        |      '[ \t\n\r]+', ' ', 'g')) AS clean
        |  FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_raw,
        |  length(clean) AS n_clean,
        |  (clean <> text) AS changed,
        |  (strpos(text, chr(65533)) > 0) AS has_repl,
        |  substring(md5(clean), 1, 16) AS clean_fp
        |FROM c ORDER BY doc_id""".stripMargin,
    // full Stupid Backoff recompute: trigram/bigram/unigram counts from
    // the even-doc model half, the three-tier CASE with the same double
    // expression shape, per-position fixed-point NLL
    // the full backoff ladder (tier choice, counts, N+V) recomputes from
    // raw text; only ln comes from the exported log table, keyed on the
    // integer (tier, num, den) triple — a ladder disagreement misses the
    // join and fails as a row mismatch
    "text_trigram_backoff" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), m AS (SELECT * FROM t WHERE doc_id % 2 = 0
        |), tgm0 AS (
        |  SELECT unnest([{'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]}
        |                 FOR i IN generate_series(1, len(w) - 2)]) AS tg
        |  FROM m WHERE len(w) >= 3
        |), tgm AS (SELECT tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3 FROM tgm0
        |), bgm0 AS (
        |  SELECT unnest([{'w2': w[i], 'w3': w[i+1]}
        |                 FOR i IN generate_series(1, len(w) - 1)]) AS bg
        |  FROM m WHERE len(w) >= 2
        |), bgm AS (SELECT bg.w2 AS w2, bg.w3 AS w3 FROM bgm0
        |), c123 AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM tgm GROUP BY 1, 2, 3
        |), c12t AS (SELECT w1, w2, COUNT(*) AS c12t FROM tgm GROUP BY 1, 2
        |), c23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM bgm GROUP BY 1, 2
        |), uni AS (SELECT unnest(w) AS u FROM m
        |), c2 AS (SELECT u AS w2, COUNT(*) AS c2 FROM uni GROUP BY 1
        |), c3 AS (SELECT u AS w3, COUNT(*) AS c3 FROM uni GROUP BY 1
        |), nv AS (
        |  SELECT (SELECT COUNT(*) FROM uni) AS n,
        |         (SELECT COUNT(DISTINCT u) FROM uni) AS v
        |), tgd0 AS (
        |  SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]}
        |                         FOR i IN generate_series(1, len(w) - 2)]) AS tg
        |  FROM t WHERE len(w) >= 3
        |), tgd AS (SELECT doc_id, tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3 FROM tgd0
        |), lt AS (SELECT * FROM read_parquet('$TriLogFixturePath/*.parquet')
        |), keyed AS (
        |  SELECT doc_id,
        |    CASE WHEN c123.c123 IS NOT NULL THEN 0
        |         WHEN c23.c23 IS NOT NULL THEN 1 ELSE 2 END AS tier,
        |    CASE WHEN c123.c123 IS NOT NULL THEN c123.c123
        |         WHEN c23.c23 IS NOT NULL THEN c23.c23
        |         ELSE COALESCE(c3.c3, 0) + 1 END AS num,
        |    CASE WHEN c123.c123 IS NOT NULL THEN c12t.c12t
        |         WHEN c23.c23 IS NOT NULL THEN c2.c2
        |         ELSE nv.n + nv.v END AS den
        |  FROM tgd
        |  LEFT JOIN c123 USING (w1, w2, w3)
        |  LEFT JOIN c12t USING (w1, w2)
        |  LEFT JOIN c23 USING (w2, w3)
        |  LEFT JOIN c2 USING (w2)
        |  LEFT JOIN c3 USING (w3)
        |  CROSS JOIN nv
        |), sc AS (
        |  SELECT keyed.doc_id, keyed.tier, lt.nll_fp
        |  FROM keyed JOIN lt ON lt.tier = keyed.tier
        |    AND lt.num = keyed.num AND lt.den = keyed.den
        |)
        |SELECT doc_id, COUNT(*) AS n_trigrams,
        |  CAST(SUM(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tri_hits,
        |  CAST(SUM(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bi_hits,
        |  CAST(SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT) AS uni_hits,
        |  ROUND(SUM(nll_fp) / COUNT(*) / 1e4, 6) AS nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // recompute doc token budgets from the exported learned vocab:
    // word explode + fixture join + integer sums
    "text_bpe_doclen_verified" ->
      s"""WITH v AS (SELECT * FROM read_parquet('$BpeVocabFixturePath/*.parquet')),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tw
        |  FROM documents)
        |SELECT doc_id, COUNT(*) AS n_words,
        |       CAST(SUM(word_tokens) AS BIGINT) AS n_tokens
        |FROM tok JOIN v ON v.w = tok.tw
        |WHERE len(tw) > 0
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // recompute every round's weighted pair counts + argmax from the
    // exported vocab states: adjacent pairs via 1-based list indexing,
    // top-1 per round by (count desc, pair) — the trainer's selection
    // logic on identical bits
    // the PRODUCTION trainer's output, recomputed round by round from the
    // distributed formulation's exported states — the driver re-proves
    // fast ≡ distributed on every run
    "text_bpe_merges" ->
      s"""WITH st AS (SELECT * FROM read_parquet('$BpeMergesStatesPath/*.parquet')),
        |pairs AS (
        |  SELECT merge_round, syms[i] AS lhs, syms[i + 1] AS rhs, n
        |  FROM st, UNNEST(range(1, len(syms))) AS t(i)
        |  WHERE len(syms) >= 2),
        |cnts AS (
        |  SELECT merge_round, lhs, rhs, CAST(SUM(n) AS BIGINT) AS pair_count
        |  FROM pairs GROUP BY 1, 2, 3)
        |SELECT CAST(merge_round AS INTEGER) AS rank, lhs AS left,
        |       rhs AS right, lhs || rhs AS merged, pair_count
        |FROM cnts
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY merge_round
        |  ORDER BY pair_count DESC, lhs, rhs) = 1
        |ORDER BY rank""".stripMargin,

    // recount word frequencies from the raw corpus, join the exported
    // word -> token-sequence table, rebuild the production top-25
    "text_bpe_encode" ->
      s"""WITH v AS (SELECT * FROM read_parquet('$BpeTopFixturePath/*.parquet')),
        |tok AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok
        |  WHERE len(w) > 0 GROUP BY w),
        |x AS (
        |  SELECT unnest(v.tokens) AS token, wc.n
        |  FROM wc JOIN v USING (w))
        |SELECT token, CAST(SUM(n) AS BIGINT) AS freq
        |FROM x GROUP BY token
        |ORDER BY freq DESC, token LIMIT 25""".stripMargin,

    // re-walk the corpus's word streams against the exported
    // word -> token-count table, recompute the per-source budget with the
    // exact integer tokens_per_word div
    "text_bpe_doclen" ->
      s"""WITH v AS (SELECT * FROM read_parquet('$BpeDoclenFixturePath/*.parquet')),
        |w AS (
        |  SELECT doc_id, source,
        |         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        |  FROM documents),
        |j AS (
        |  SELECT w.doc_id, w.source, v.word_tokens
        |  FROM w JOIN v USING (w) WHERE len(w.w) > 0),
        |per_doc AS (
        |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_words,
        |         CAST(SUM(word_tokens) AS BIGINT) AS n_tokens
        |  FROM j GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_words) AS BIGINT) AS total_words,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST((CAST(SUM(n_tokens) AS BIGINT) * 10000)
        |       // CAST(SUM(n_words) AS BIGINT) AS BIGINT) / 10000.0
        |    AS tokens_per_word
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,

    "text_bpe_merges_verified" ->
      s"""WITH st AS (SELECT * FROM read_parquet('$BpeStatesFixturePath/*.parquet')),
        |pairs AS (
        |  SELECT merge_round, syms[i] AS lhs, syms[i + 1] AS rhs, n
        |  FROM st, UNNEST(range(1, len(syms))) AS t(i)
        |  WHERE len(syms) >= 2),
        |cnts AS (
        |  SELECT merge_round, lhs, rhs, CAST(SUM(n) AS BIGINT) AS pair_count
        |  FROM pairs GROUP BY 1, 2, 3)
        |SELECT CAST(merge_round AS BIGINT) AS merge_round, lhs, rhs, pair_count
        |FROM cnts
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY merge_round
        |  ORDER BY pair_count DESC, lhs, rhs) = 1
        |ORDER BY merge_round""".stripMargin,

    // recount words from the raw corpus, join the exported token table,
    // re-concatenate the token sequence — reassembled must equal
    // word || '</w>' bit-for-bit in both engines
    "text_bpe_encode_verified" ->
      s"""WITH v AS (SELECT * FROM read_parquet('$BpeEncFixturePath/*.parquet')),
        |tok AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok
        |  WHERE len(w) > 0 GROUP BY w)
        |SELECT wc.w, wc.n, CAST(len(v.tokens) AS BIGINT) AS n_tokens,
        |       list_aggr(v.tokens, 'string_agg', '') AS reassembled
        |FROM wc JOIN v ON v.w = wc.w
        |ORDER BY wc.w""".stripMargin,

    // recompute the integer features from raw text, score against the
    // exported weight fixture: floor integer division everywhere, so the
    // dot product is exact in both engines
    "text_quality_model" ->
      s"""$qualityScoredSql
        |SELECT doc_id, score_fp, predicted, label FROM scored
        |ORDER BY doc_id""".stripMargin,

    // same scored corpus -> (score, n1, n0) grid -> doubled rank-sum;
    // the one division runs on exact-integer doubles, same shape as Spark
    "text_quality_auc" ->
      s"""$qualityScoredSql,
        |bys AS (
        |  SELECT score_fp,
        |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM scored GROUP BY 1
        |), cum AS (
        |  SELECT n1, n0, COALESCE(SUM(n0) OVER (ORDER BY score_fp
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |  FROM bys
        |), u AS (
        |  SELECT CAST(SUM(n1 * cum0 * 2 + n1 * n0) AS BIGINT) AS u2,
        |    CAST(SUM(n1) AS BIGINT) AS n_pos, CAST(SUM(n0) AS BIGINT) AS n_neg
        |  FROM cum)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
        |    CAST(FLOOR(CAST(u2 AS DOUBLE) * 1000000.0 /
        |      (CAST(n_pos AS DOUBLE) * n_neg * 2.0)) AS BIGINT) END AS auc_ppm,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
        |    CAST(FLOOR(CAST(u2 AS DOUBLE) * 1000000.0 /
        |      (CAST(n_pos AS DOUBLE) * n_neg * 2.0)) AS BIGINT) * 2 - 1000000
        |    END AS gini_ppm
        |FROM u""".stripMargin,

    // same scored corpus -> equal-width bins over the observed range;
    // signed mean via the floor-on-double chain (`//` floors, Spark `div`
    // truncates — doubles agree)
    "text_quality_calibration" ->
      s"""$qualityScoredSql,
        |rng AS (SELECT MIN(score_fp) AS lo, MAX(score_fp) AS hi FROM scored)
        |SELECT LEAST((score_fp - lo) * 10 // (hi - lo + 1), 9) AS bin,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(CASE WHEN predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
        |  CAST(FLOOR(CAST(SUM(score_fp) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS mean_score_fp,
        |  CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
        |    AS BIGINT) AS pos_rate_ppm
        |FROM scored CROSS JOIN rng
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same rank grid, same conditional sums per k
    "text_vocab_coverage" ->
      """WITH v AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY 1
        |), r AS (
        |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rk FROM v
        |), ks AS (SELECT unnest([10, 100, 1000]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN rk <= k THEN c ELSE 0 END) AS BIGINT) AS covered,
        |  CAST(SUM(c) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN rk <= k THEN c ELSE 0 END) * 1000000 // SUM(c)
        |    AS BIGINT) AS coverage_ppm
        |FROM r CROSS JOIN ks
        |GROUP BY k ORDER BY k""".stripMargin,

    // same two-sqrt smoothing, same floor-fp weights and ppm shares
    "text_negative_table" ->
      """WITH c AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY 1
        |), w AS (
        |  SELECT tok, c,
        |    CAST(FLOOR(SQRT(CAST(c AS DOUBLE) * SQRT(CAST(c AS DOUBLE)))
        |      * 1000000) AS BIGINT) AS w_fp
        |  FROM c
        |), tot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS tot_w FROM w)
        |SELECT tok, c, w_fp,
        |  CAST(w_fp * 1000000 // tot_w AS BIGINT) AS share_ppm
        |FROM w CROSS JOIN tot
        |ORDER BY c DESC, tok LIMIT 50""".stripMargin,

    // same guess CASE as text_langid, aggregated into the matrix
    "text_langid_confusion" ->
      s"""WITH g AS (
         |  SELECT lang AS labeled,
         |    CASE
         |      WHEN len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(1)._2}'))
         |       AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(2)._2}'))
         |       AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) > 0 THEN 'en'
         |      WHEN len(regexp_extract_all(lower(text), '${langPatterns(1)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(2)._2}'))
         |       AND len(regexp_extract_all(lower(text), '${langPatterns(1)._2}')) > 0 THEN 'es'
         |      WHEN len(regexp_extract_all(lower(text), '${langPatterns(2)._2}')) > 0 THEN 'de'
         |      ELSE 'und' END AS guessed
         |  FROM documents
         |), cells AS (
         |  SELECT labeled, guessed, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM g GROUP BY 1, 2
         |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
         |SELECT labeled, guessed, n,
         |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm
         |FROM cells CROSS JOIN tot
         |ORDER BY labeled, guessed""".stripMargin,

    // same scored grid, same decile thresholds, same conditional tallies
    "text_quality_pr" ->
      s"""$qualityScoredSql,
        |bys AS (
        |  SELECT score_fp,
        |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM scored GROUP BY 1
        |), thr AS (
        |  SELECT i * 100000000000 AS thr_fp FROM generate_series(0, 9) AS s(i)
        |), tallies AS (
        |  SELECT thr_fp,
        |    CAST(SUM(CASE WHEN score_fp >= thr_fp THEN n1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN score_fp >= thr_fp THEN n0 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(n1) AS BIGINT) AS pos
        |  FROM bys CROSS JOIN thr GROUP BY 1)
        |SELECT thr_fp, tp, fp,
        |  CASE WHEN tp + fp > 0 THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT)
        |       ELSE 0 END AS precision_ppm,
        |  CASE WHEN pos > 0 THEN CAST(tp * 1000000 // pos AS BIGINT)
        |       ELSE 0 END AS recall_ppm
        |FROM tallies ORDER BY thr_fp""".stripMargin,

    "text_perplexity" -> perplexitySql(PplLogFixturePath),
    "text_perplexity_model" -> perplexitySql(PplModelLogFixturePath),

    "pipe_perplexity_sample" ->
      s"""WITH ppl AS (${perplexitySql(PplSampleLogFixturePath)})
         |SELECT d.lang, COUNT(*) AS n, CAST(SUM(d.n_chars) AS BIGINT) AS chars,
         |       MIN(p.nll) AS min_nll, MAX(p.nll) AS max_nll
         |FROM documents d JOIN ppl p USING (doc_id)
         |WHERE p.nll <= 3.4
         |  AND substring(md5('graft-ppl:' || CAST(d.doc_id AS VARCHAR)), 1, 1) < '8'
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  LENGTH(text) AS n_chars_m,
         |  LEN(string_split_regex(TRIM(text), ' +')) AS n_tokens,
         |  FLOOR(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) * 10000
         |        / LEN(string_split_regex(TRIM(text), ' +'))) / 10000 AS avg_token_len,
         |  FLOOR(CAST(LEN(regexp_extract_all(LOWER(text), '${langPatterns.head._2}')) AS DOUBLE) * 10000
         |        / LEN(string_split_regex(TRIM(text), ' +'))) / 10000 AS stopword_ratio,
         |  LEN(string_split_regex(TRIM(text), ' +')) < 5 AS too_short
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CASE
         |    WHEN len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(1)._2}'))
         |     AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(2)._2}'))
         |     AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) > 0 THEN 'en'
         |    WHEN len(regexp_extract_all(lower(text), '${langPatterns(1)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(2)._2}'))
         |     AND len(regexp_extract_all(lower(text), '${langPatterns(1)._2}')) > 0 THEN 'es'
         |    WHEN len(regexp_extract_all(lower(text), '${langPatterns(2)._2}')) > 0 THEN 'de'
         |    ELSE 'und' END AS guessed_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_tokens,
        |  FLOOR(CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS DOUBLE) * 10000 / COUNT(*)) / 10000 AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_passage_bm25" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), p AS (
        |  SELECT doc_id * 10000 + u.i AS doc_id,
        |    array_to_string(w[1+8*u.i : 8*u.i+16], ' ') AS text
        |  FROM t, UNNEST(generate_series(0, CAST(floor((len(w)-1)/8) AS INT))) AS u(i)
        |), scored AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS tf_spark,
        |    CAST(len(regexp_extract_all(text, '\bmerge\b')) AS BIGINT) AS tf_merge,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS dl
        |  FROM p),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
        |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM scored),
        |ranked AS (
        |  SELECT doc_id, tf_spark, tf_merge, dl,
        |    (CAST(n_docs AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5) / (CAST(df_spark AS DOUBLE) + 0.5)
        |      * (CAST(tf_spark AS DOUBLE) * 2.2)
        |      / (CAST(tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |    + (CAST(n_docs AS DOUBLE) - CAST(df_merge AS DOUBLE) + 0.5) / (CAST(df_merge AS DOUBLE) + 0.5)
        |      * (CAST(tf_merge AS DOUBLE) * 2.2)
        |      / (CAST(tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS score
        |  FROM scored, stats)
        |SELECT doc_id // 10000 AS doc_id, doc_id % 10000 AS pas_idx,
        |  tf_spark, tf_merge, dl, score
        |FROM (SELECT * FROM ranked WHERE score > 0
        |      ORDER BY score DESC, doc_id LIMIT 25)""".stripMargin,

    "text_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] AS gram
        |  FROM t, UNNEST(generate_series(1, len(w) - 2)) AS u(i)
        |  WHERE len(w) >= 3),
        |d AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  FLOOR(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) * 10000
        |    / COUNT(*)) / 10000 AS novelty
        |FROM g JOIN d USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_zipf" ->
      """WITH c AS (
        |  SELECT tok, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) >= 2 GROUP BY tok),
        |tot AS (SELECT SUM(freq) AS total FROM c),
        |top AS (SELECT tok, freq FROM c ORDER BY freq DESC, tok LIMIT 40),
        |r AS (
        |  SELECT tok, freq,
        |    ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank,
        |    SUM(freq) OVER (ORDER BY freq DESC, tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM top)
        |SELECT CAST(rank AS INT) AS rank, tok, freq,
        |  CAST(rank * freq AS BIGINT) AS rank_x_freq,
        |  FLOOR(CAST(cum AS DOUBLE) * 10000 / total) / 10000 AS cum_share
        |FROM r, tot ORDER BY rank""".stripMargin,

    "text_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
        |  FROM documents
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term, tf, df, tf * (n_docs * 10000 // df) AS score
        |  FROM tf JOIN df USING (term), n),
        |r AS (
        |  SELECT doc_id, term, tf, df, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM sc)
        |SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "text_hash_vectors" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
        |  FROM documents
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term, tf * (n_docs * 10000 // df) AS score,
        |    CAST('0x' || substring(md5(term), 1, 8) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST('0x' || substring(md5(term), 9, 1) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, bucket, CAST(SUM(sgn * score) AS BIGINT) AS weight
        |FROM sc GROUP BY 1, 2 HAVING SUM(sgn * score) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  SUBSTRING(md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_vocab_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        |  FROM documents)
        |SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM toks WHERE LENGTH(tok) >= 2
        |GROUP BY tok ORDER BY tf DESC, tok LIMIT 50""".stripMargin,

    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        |  FROM documents),
        |tt AS (SELECT tok FROM toks WHERE LENGTH(tok) >= 2),
        |total AS (SELECT COUNT(*) AS n FROM tt)
        |SELECT tok, COUNT(*) AS cnt
        |FROM tt, total
        |GROUP BY tok, total.n
        |HAVING COUNT(*) * 500 >= total.n
        |ORDER BY cnt DESC, tok""".stripMargin,

    "text_gopher_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        |  FROM documents),
        |wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_words,
        |    CAST(SUM(LENGTH(tok) * c) AS BIGINT) AS sum_len,
        |    COUNT(*) AS n_distinct,
        |    MAX(c) AS top_c,
        |    CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN c ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM wc GROUP BY 1)
        |SELECT doc_id, n_words,
        |  FLOOR(CAST(sum_len AS DOUBLE) * 10000 / n_words) / 10000 AS mean_word_len,
        |  FLOOR(CAST(top_c AS DOUBLE) * 10000 / n_words) / 10000 AS top_word_frac,
        |  FLOOR(CAST(n_words - n_distinct AS DOUBLE) * 10000 / n_words) / 10000 AS dup_word_frac,
        |  n_stop,
        |  (n_words BETWEEN 20 AND 100000)
        |    AND (FLOOR(CAST(sum_len AS DOUBLE) * 10000 / n_words) / 10000 BETWEEN 3.0 AND 10.0)
        |    AND (FLOOR(CAST(top_c AS DOUBLE) * 10000 / n_words) / 10000 <= 0.2)
        |    AND (FLOOR(CAST(n_words - n_distinct AS DOUBLE) * 10000 / n_words) / 10000 <= 0.5)
        |    AND (n_stop >= 2) AS passes
        |FROM agg ORDER BY doc_id""".stripMargin,

    "pipe_quality_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        |  FROM documents),
        |wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_words,
        |    CAST(SUM(LENGTH(tok) * c) AS BIGINT) AS sum_len,
        |    COUNT(*) AS n_distinct,
        |    MAX(c) AS top_c,
        |    CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN c ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM wc GROUP BY 1),
        |g AS (SELECT doc_id,
        |    (n_words BETWEEN 20 AND 100000)
        |      AND (FLOOR(CAST(sum_len AS DOUBLE) * 10000 / n_words) / 10000 BETWEEN 3.0 AND 10.0)
        |      AND (FLOOR(CAST(top_c AS DOUBLE) * 10000 / n_words) / 10000 <= 0.2)
        |      AND (FLOOR(CAST(n_words - n_distinct AS DOUBLE) * 10000 / n_words) / 10000 <= 0.5)
        |      AND (n_stop >= 2) AS passes
        |  FROM agg)
        |SELECT d.lang, COUNT(*) AS n, CAST(SUM(d.n_chars) AS BIGINT) AS chars
        |FROM documents d JOIN g USING (doc_id)
        |WHERE g.passes
        |  AND ('0x' || substring(md5('graft-wt:' || CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT * 1000
        |      < d.n_chars * 268435456
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "pipe_clean_corpus" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
         |    (len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(1)._2}'))
         |     AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) >= len(regexp_extract_all(lower(text), '${langPatterns(2)._2}'))
         |     AND len(regexp_extract_all(lower(text), '${langPatterns(0)._2}')) > 0) AS is_en
         |  FROM documents
         |  WHERE len(string_split_regex(trim(text), ' +')) >= 5),
         |ranked AS (
         |  SELECT doc_id, norm_hash, is_en,
         |    ROW_NUMBER() OVER (PARTITION BY norm_hash ORDER BY doc_id) AS rn
         |  FROM scored)
         |SELECT doc_id, norm_hash FROM ranked
         |WHERE rn = 1 AND is_en ORDER BY doc_id""".stripMargin,

    "text_pii_scrub" ->
      """WITH stamped AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com call 555-123-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS st
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(st, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(st, '555-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  md5(regexp_replace(
        |        regexp_replace(st, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '555-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM stamped ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS word
        |  FROM documents
        |), wc AS (
        |  SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word
        |), st AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
        |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_c
        |  FROM wc GROUP BY doc_id)
        |SELECT doc_id, n_words, n_distinct,
        |  FLOOR((n_words - n_distinct) * 1000 / n_words) / 1000 AS dup_frac,
        |  FLOOR(top_c * 1000 / n_words) / 1000 AS top_word_frac
        |FROM st ORDER BY doc_id""".stripMargin,

    "pipe_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substring(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
        |ORDER BY doc_id""".stripMargin,

    "pipe_sample_weighted" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |WHERE ('0x' || substring(md5('graft-wt:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT * 1000
        |      < n_chars * 268435456
        |ORDER BY doc_id""".stripMargin,

    // both retrievers + the integer fusion recomputed: the BM25 leg is
    // the proven text_bm25 arithmetic, the vector leg the proven
    // sim_text_knn hashed space with the query folded through the same
    // df weighting, fusion is integer division on ranks
    "text_hybrid_rrf" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS tf_spark,
        |    CAST(len(regexp_extract_all(text, '\bwindow\b')) AS BIGINT) AS tf_window,
        |    CAST(len(regexp_extract_all(text, '\bmerge\b')) AS BIGINT) AS tf_merge,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
        |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |    SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM scored),
        |bscore AS (
        |  SELECT doc_id,
        |    (CAST(n_docs AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5) / (CAST(df_spark AS DOUBLE) + 0.5)
        |      * (CAST(tf_spark AS DOUBLE) * 2.2)
        |      / (CAST(tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |    + (CAST(n_docs AS DOUBLE) - CAST(df_window AS DOUBLE) + 0.5) / (CAST(df_window AS DOUBLE) + 0.5)
        |      * (CAST(tf_window AS DOUBLE) * 2.2)
        |      / (CAST(tf_window AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |    + (CAST(n_docs AS DOUBLE) - CAST(df_merge AS DOUBLE) + 0.5) / (CAST(df_merge AS DOUBLE) + 0.5)
        |      * (CAST(tf_merge AS DOUBLE) * 2.2)
        |      / (CAST(tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS score
        |  FROM scored, stats),
        |br AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_bm25
        |  FROM (SELECT * FROM bscore WHERE score > 0
        |        ORDER BY score DESC, doc_id LIMIT 20)),
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
        |  FROM documents
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, tf * (n_docs * 10000 // df) AS score,
        |    CAST('0x' || substring(md5(term), 1, 8) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST('0x' || substring(md5(term), 9, 1) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM tf JOIN dft USING (term), n),
        |v AS (
        |  SELECT doc_id, bucket, CAST(SUM(sgn * score) AS BIGINT) AS weight
        |  FROM sc GROUP BY 1, 2 HAVING SUM(sgn * score) <> 0),
        |qv AS (
        |  SELECT bucket, CAST(SUM(sgn * sc0) AS BIGINT) AS qw FROM (
        |    SELECT (n_docs * 10000 // df) AS sc0,
        |      CAST('0x' || substring(md5(term), 1, 8) AS BIGINT) % 64 AS bucket,
        |      CASE WHEN CAST('0x' || substring(md5(term), 9, 1) AS BIGINT) % 2 = 0
        |        THEN 1 ELSE -1 END AS sgn
        |    FROM dft, n WHERE term IN ('spark', 'window', 'merge'))
        |  GROUP BY 1 HAVING SUM(sgn * sc0) <> 0),
        |vs AS (
        |  SELECT doc_id, CAST(SUM(weight * qw) AS BIGINT) AS dot
        |  FROM v JOIN qv USING (bucket)
        |  GROUP BY 1 HAVING SUM(weight * qw) > 0),
        |vr AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id) AS BIGINT) AS rank_vec
        |  FROM vs),
        |vr20 AS (SELECT * FROM vr WHERE rank_vec <= 20),
        |f AS (
        |  SELECT COALESCE(br.doc_id, vr20.doc_id) AS doc_id,
        |    COALESCE(rank_bm25, -1) AS rank_bm25,
        |    COALESCE(rank_vec, -1) AS rank_vec
        |  FROM br FULL OUTER JOIN vr20 ON br.doc_id = vr20.doc_id)
        |SELECT doc_id, rank_bm25, rank_vec,
        |  (CASE WHEN rank_bm25 > 0 THEN 1000000 // (60 + rank_bm25) ELSE 0 END
        |   + CASE WHEN rank_vec > 0 THEN 1000000 // (60 + rank_vec) ELSE 0 END) AS rrf
        |FROM f
        |ORDER BY rrf DESC, doc_id
        |LIMIT 10""".stripMargin,

    "text_bm25" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS tf_spark,
        |    CAST(len(regexp_extract_all(text, '\bwindow\b')) AS BIGINT) AS tf_window,
        |    CAST(len(regexp_extract_all(text, '\bmerge\b')) AS BIGINT) AS tf_merge,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
        |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |    SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM scored),
        |ranked AS (
        |  SELECT doc_id, tf_spark, tf_window, tf_merge, dl,
        |    (CAST(n_docs AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5) / (CAST(df_spark AS DOUBLE) + 0.5)
        |      * (CAST(tf_spark AS DOUBLE) * 2.2)
        |      / (CAST(tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |    + (CAST(n_docs AS DOUBLE) - CAST(df_window AS DOUBLE) + 0.5) / (CAST(df_window AS DOUBLE) + 0.5)
        |      * (CAST(tf_window AS DOUBLE) * 2.2)
        |      / (CAST(tf_window AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |    + (CAST(n_docs AS DOUBLE) - CAST(df_merge AS DOUBLE) + 0.5) / (CAST(df_merge AS DOUBLE) + 0.5)
        |      * (CAST(tf_merge AS DOUBLE) * 2.2)
        |      / (CAST(tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS score
        |  FROM scored, stats)
        |SELECT * FROM ranked WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,

    "pipe_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |       WHEN substring(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the shard nibble re-derives via hex-digit position lookup (value of
    // the 2nd md5 hex char == the hash mod 16)
    "pipe_shard_plan" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    md5('graft-shard:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT
        |  CAST(strpos('0123456789abcdef', substring(h, 2, 1)) - 1 AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  MIN(h) AS min_h
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin)
}
