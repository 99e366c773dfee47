package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Corpus-preparation operators a large-scale training-data pipeline runs
 * between "raw crawl" and "training shards" — the steps that sit downstream
 * of the dedup/quality operators in [[DedupQueries]]/[[TextQueries]]:
 *
 *  - benchmark decontamination (n-gram overlap against an eval set)
 *  - cross-document chunk dedup (the "duplicated line removal" of web
 *    pipelines, re-expressed over whitespace corpora as fixed 10-word chunks)
 *  - deterministic stratified sampling (N docs per language)
 *  - temperature resampling (α = 0.5 language rebalancing)
 *  - size-balanced shard packing (stratified round-robin, no global sort)
 *  - corpus length histogram + one-row dataset card
 *  - int8 embedding quantization statistics (native codegen expression)
 *
 * All queries are DuckDB-oracle-checked. Determinism discipline: sampling
 * and shard assignment key on md5 of a salted doc_id (reproducible across
 * engines, runs, and cluster sizes — no RNG state); ratios are floor-scaled
 * (see TextQueries' scaladoc for the HALF_UP-vs-away-from-zero rationale);
 * quantization truncates toward zero (Spark's double→long cast and DuckDB's
 * `trunc` agree; `round` tie-breaking differs for negative halves).
 */
object PipelineQueries {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Shared build-once range-clustered layout + Bloom index for the
    * `pipe_bloom_skip` pair; returns (dataDir, idxDir, lookup rows). */
  private def bloomLookup(s: SparkSession, d: String, key: Long) = {
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_bloomidx/v1_$tag"
    val (dataDir, idxDir) = (s"$base/data", s"$base/idx")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$idxDir/_SUCCESS")
    if (!fs.exists(marker)) {
      docs(s, d).repartitionByRange(16, col("doc_id"))
        .write.mode("overwrite").parquet(dataDir)
      graft.operators.BloomFileIndex.build(s, dataDir, "doc_id", idxDir)
    }
    (dataDir, idxDir,
      graft.operators.BloomFileIndex.lookup(s, dataDir, "doc_id", idxDir, key))
  }
  private def events(s: SparkSession, d: String) = Tables.load(s, d, "events")

  private val Ops = graft.operators.CorpusOps

  /** Chunk-span fixture export for `pipe_cdc_dedup` (SemDeDup protocol:
    * fixed literal — the oracle SQL is static, runs outside the JVM). */
  private[graft] val CdcFixturePath = graft.Fixtures.path("cdc_spans")
  private[graft] val DocClustersFixturePath = graft.Fixtures.path("doc_clusters")

  /** Gzipped-JSONL export dir for `pipe_jsonl_roundtrip` (the ingest-format
    * leg: corpora arrive as .jsonl.gz shards, not parquet). */
  private[graft] val JsonlFixturePath = graft.Fixtures.path("jsonl_docs")

  /** WARC-shaped export dir for `pipe_warc_roundtrip`. */
  private[graft] val WarcFixturePath = graft.Fixtures.path("warc_docs")

  /** Fixture exports for the composed `pipe_full_prep` (separate paths —
    * its classifier trains on the CLEANED corpus and its spans chunk the
    * gated survivors, so sharing the single-stage fixtures would clobber
    * them mid-Verify). */
  private[graft] val FullPrepWeightsPath = graft.Fixtures.path("full_prep_weights")
  private[graft] val FullPrepSpansPath = graft.Fixtures.path("full_prep_spans")

  /** DSIR fixture exports: the <= `buckets`-row fixed-point log-ratio
    * table and the per-doc fixed-point Gumbel perturbation. Both engines
    * consume the SAME integer bits, so no transcendental (`ln`) ever
    * appears in an oracle-checked compare — a 1-ulp libm divergence at a
    * `round(x*1e4)` boundary would otherwise flip a weight (the project
    * determinism rule; see the CdcChunker span protocol). */
  private[graft] val DsirRatiosPath = graft.Fixtures.path("dsir_ratios")
  private[graft] val DsirGumbelPath = graft.Fixtures.path("dsir_gumbel")
  private[graft] val FullPrepRatiosPath = graft.Fixtures.path("full_prep_ratios")
  private[graft] val FullPrepGumbelPath = graft.Fixtures.path("full_prep_gumbel")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // content-defined chunking dedup (FastCDC gear hash): chunk every doc
    // at content-chosen boundaries, dedup chunks across the corpus by
    // md5 identity with a first-occurrence rule. The boundary scan (the
    // one non-SQL step) exports as a fixture; chunk hashing, the
    // first-occurrence verdict, and the per-doc stats recompute in BOTH
    // engines from the same spans — the SemDeDup protocol.
    "pipe_cdc_dedup" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.CdcChunker.chunkTable(base)
        .write.mode("overwrite").parquet(CdcFixturePath)
      graft.operators.CdcChunker.dedupStats(base, s.read.parquet(CdcFixturePath))
        .orderBy("doc_id")
    }),

    // THE composed flagship of the round-7 operators — the end-to-end
    // training-data prep a real pipeline runs, each stage an operator
    // proven alone above, chained here so the COMPOSITION is what the
    // oracle hash-checks: unicode clean (graft_nfc) -> trained-classifier
    // quality gate (weights fixture, integer dot) -> CDC mostly-dup drop
    // (span fixture, first-occurrence stats) -> DSIR top-20 selection
    // toward the English slice -> per-language report with exact integer
    // weight bounds.
    // composition lives in [[graft.operators.PrepPipeline]]; the cleaned
    // projection's materialization is that operator's explicit scale knob
    // (default localCheckpoint here at local scale; parquet-stage on a
    // cluster — PipelineSpec pins both paths bit-identical)
    "pipe_full_prep" -> ((s, d) =>
      graft.operators.PrepPipeline.fullPrep(docs(s, d), FullPrepWeightsPath,
        FullPrepSpansPath, FullPrepRatiosPath, FullPrepGumbelPath)),

    // composed prep over the session-5 operator family: fuzzy
    // decontamination (winnow fingerprints vs the eval slice) → winnow
    // near-dup drop (lower id of each flagged pair survives — the
    // greedy pairwise rule, deterministic without a closure) → Neyman
    // sample → per-lang report. Every stage is proven SQL, so the
    // oracle chains the whole pipeline and the hash match proves the
    // COMPOSITION, not just the parts.
    "pipe_full_prep2" -> ((s, d) => {
      val all = docs(s, d)
      val eval = all.filter(pmod(col("doc_id"), lit(20)) === 0)
      val train = all.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      // pin the two verdict id-tables (tiny: flagged/dropped doc ids):
      // c1 feeds both the winnow stage and c2, and c2 feeds both the
      // Neyman sample and the final report — unpinned, each downstream
      // consumer re-runs the whole upstream fingerprint pipeline; pinned,
      // re-deriving c1/c2 costs one corpus scan + an anti join against a
      // cached id list (the heavy frames themselves stay unpinned — at
      // scale only the ids are worth block storage)
      // broadcast hints: pinned (localCheckpoint) frames report
      // worst-case size stats, which would downgrade the anti joins
      // to sort-merge; gated on the pinned count (corpus-proportional
      // id-sets must degrade to sort-merge, not OOM, at 100 TB — see
      // graft.operators.Pins)
      val flagged = Ops.decontaminateFuzzy(train, eval, minShared = 2)
        .select("doc_id").distinct().localCheckpoint(true)
      val c1 = train.join(
        graft.operators.Pins.broadcastIfBounded(flagged), Seq("doc_id"), "left_anti")
      val dropB = Ops.winnowPairs(c1, k = 4, w = 4, pct = 50)
        .select(col("doc_b").as("doc_id")).distinct().localCheckpoint(true)
      val c2 = c1.join(
        graft.operators.Pins.broadcastIfBounded(dropB), Seq("doc_id"), "left_anti")
      val sel = Ops.neymanSample(c2, k = 50)
      c2.join(sel.select("doc_id"), "doc_id")
        .select(col("lang"),
          size(split(trim(col("text")), " +")).cast("long").as("x"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("x").cast("long").as("tokens"))
        .orderBy("lang")
    }),

    // the CDC APPLY step: rewrite the corpus with duplicate chunks
    // removed (first occurrence survives corpus-wide), reassembled in
    // position order — chunk-level C4 at content-defined boundaries.
    // Same fixture protocol; the oracle hashes the REWRITTEN text, so
    // the reassembly math is what the hash match proves.
    "pipe_cdc_rewrite" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.CdcChunker.chunkTable(base)
        .write.mode("overwrite").parquet(CdcFixturePath)
      graft.operators.CdcChunker.dedupRewrite(base, s.read.parquet(CdcFixturePath))
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // DSIR importance resampling (Xie et al. 2023): weight every doc by
    // how much its hashed-ngram bucket distribution looks like the TARGET
    // slice (here: the English docs) vs the raw corpus, then Gumbel-top-k
    // select 100 docs ∝ exp(weight). The two `ln`-derived artifacts (the
    // <=4096-row ratio table, the per-doc Gumbel key) export as integer
    // fixtures; the oracle recomputes gram extraction, bucket hashing,
    // the weight sums, and the final top-k from the raw text + those bits.
    "pipe_dsir_sample" -> ((s, d) => {
      val all = docs(s, d)
      // ratio table + Gumbel keys export as fixtures (the CdcChunker span
      // protocol): the oracle consumes the same integer bits instead of
      // re-deriving them through its own libm `ln`
      graft.operators.Dsir.ratioTable(
          all, all.filter(col("lang") === "en"), buckets = 4096)
        .write.mode("overwrite").parquet(DsirRatiosPath)
      graft.operators.Dsir.gumbelTable(all)
        .write.mode("overwrite").parquet(DsirGumbelPath)
      graft.operators.Dsir.resampleWithGumbel(
          graft.operators.Dsir.scoreWithRatios(
            all, s.read.parquet(DsirRatiosPath), buckets = 4096),
          s.read.parquet(DsirGumbelPath), k = 100)
        .orderBy("doc_id")
    }),

    // benchmark decontamination: training docs sharing any word 5-gram with
    // the held-out benchmark slice (doc_id % 20 == 0 stands in for the eval
    // set) are flagged with their distinct-hit count. Scale shape: the
    // benchmark gram set is small by construction (eval sets are MBs, the
    // corpus is TBs) -> broadcast hash join against it; the corpus-side gram
    // stream never shuffles.
    "pipe_decontaminate" -> ((s, d) => decontaminate(docs(s, d))),

    // fuzzy decontamination: winnowing fingerprints instead of exact
    // grams — survives light edits of leaked eval text (any intact
    // w+k-1-word run still selects a shared fingerprint) at ~2/(w+1) of
    // the gram-set footprint. Same eval split as pipe_decontaminate;
    // full DuckDB recompute from raw text (selection is the proven
    // dedup_winnow machinery)
    "pipe_decontaminate_fuzzy" -> ((s, d) => {
      val all = docs(s, d)
      Ops.decontaminateFuzzy(
          train = all.filter(pmod(col("doc_id"), lit(20)) =!= 0),
          eval = all.filter(pmod(col("doc_id"), lit(20)) === 0),
          minShared = 2)
        .orderBy("doc_id", "eval_id")
    }),

    // WHOLE-DOCUMENT near-dup decontamination: train docs that are a
    // near-duplicate (trigram jaccard >= 0.3) of an eval doc, found by the
    // lossless cross-table prefix-filter join ([[graft.operators.CorpusOps
    // .ppjoinAcross]], PPJoin's R-S form) — catches a paraphrased-or-
    // lightly-edited eval doc leaking wholesale where the gram guard sees
    // only scattered hits. Output = brute cross-join answer (no cap, no
    // misses), so the oracle states the brute definition. Same eval split
    // as pipe_decontaminate.
    "pipe_decontaminate_neardup" -> ((s, d) => {
      val all = docs(s, d)
      Ops.ppjoinAcross(
          left = all.filter(pmod(col("doc_id"), lit(20)) === 0),
          right = all.filter(pmod(col("doc_id"), lit(20)) =!= 0),
          pct = 30)
        .select(col("left_id").as("eval_id"), col("right_id").as("train_id"),
          col("jaccard"))
        .orderBy("eval_id", "train_id")
    }),

    // span-level decontamination (the strong form): train docs sharing a
    // CONTIGUOUS >= 8-token run with the eval slice, longest run measured
    // exactly — "how much verbatim eval text leaked", not just gram hits.
    // Same eval split as pipe_decontaminate; seed-and-extend machinery
    // shared with dedup_substring via [[graft.operators.CorpusOps
    // .decontaminateSpans]].
    "pipe_decontaminate_spans" -> ((s, d) => {
      val all = docs(s, d)
      Ops.decontaminateSpans(
          train = all.filter(pmod(col("doc_id"), lit(20)) =!= 0),
          eval = all.filter(pmod(col("doc_id"), lit(20)) === 0),
          minTokens = 8)
        .orderBy("doc_id", "eval_id")
    }),

    // cross-document chunk dedup (duplicated-"line" removal for corpora
    // without newlines): docs are cut into fixed non-overlapping 10-word
    // chunks; a chunk appearing in >1 distinct doc is duplicated; each doc
    // reports its duplicated-chunk fraction (the pipeline's removal signal).
    // One shuffle keyed on the chunk hash — exactly the RefinedWeb/Gopher
    // line-dedup plan, where the dup-line table is orders of magnitude
    // smaller than the corpus.
    "pipe_chunk_dedup" -> ((s, d) =>
      Ops.chunkDedupStats(docs(s, d)).orderBy("doc_id")),

    // intra-document repetition REMOVAL (C4 rule, rewrite not just stats):
    // repeated 2-word chunks within a doc keep their first occurrence and
    // the doc is reassembled in order. clean_text is hashed so the oracle
    // proves the rewritten CONTENT, not just the counts. Single
    // (doc_id, chunk) shuffle; state bounded by one document everywhere.
    "pipe_intradoc_dedup" -> ((s, d) =>
      Ops.intraDocDedup(docs(s, d), chunkWords = 2)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy("doc_id")),

    // cross-document boilerplate removal: 10-word chunks shared by >= 2
    // distinct docs are dropped everywhere, docs reassembled. One chunk
    // shuffle for the df aggregate, boilerplate set broadcast back, one
    // doc_id shuffle to reassemble.
    "pipe_boilerplate" -> ((s, d) =>
      Ops.boilerplateRemoval(docs(s, d), chunkWords = 10, minDocs = 2)
        .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy("doc_id")),

    // KEEP-FIRST span dedup (the RefinedWeb/MassiveText exact-line rule at
    // 8-word span granularity): a span seen earlier in global (doc_id,
    // pos) order drops from every later position, first occurrence
    // survives, docs reassembled. Distinct from pipe_intradoc_dedup
    // (per-doc) and pipe_boilerplate (drop-everywhere). First occurrences
    // via a map-side-combining min(struct) aggregate — hot spans collapse
    // in partials, never queue on a window reducer.
    "pipe_line_dedup" -> ((s, d) =>
      Ops.lineDedup(docs(s, d), spanWords = 8)
        .select(col("doc_id"), col("n_spans"), col("n_kept"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy("doc_id")),

    // key-skew profiler (the diagnostic you run BEFORE picking a join/agg
    // strategy at 100 TB): per-key counts for events.user_id, the top-10
    // hot keys with their load share, plus the aggregate skew summary
    // (distinct keys, max/avg count ratio). One map-side-combining
    // aggregate on the key; the top-10 is a bounded TakeOrdered.
    "pipe_skew_profile" -> ((s, d) => {
      val counts = events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(
        sum("cnt").as("total"), count(lit(1)).as("n_keys"),
        max("cnt").as("max_cnt"))
      counts.crossJoin(broadcast(tot))
        .withColumn("share", floor(col("cnt") * lit(10000) / col("total")) / 10000)
        .withColumn("skew",
          floor(col("max_cnt") * lit(10000) * col("n_keys") / col("total")) / 10000)
        .orderBy(col("cnt").desc, col("user_id")).limit(10)
        .select("user_id", "cnt", "n_keys", "share", "skew")
    }),

    // one-glance corpus health report (the first query a data engineer
    // runs on a new 100 TB drop): doc/token/vocab counts, exact-dup
    // volume, source and token head-shares — every metric an integer
    // (shares 1e4-floor-scaled) so the report is one (metric, value)
    // table with a single hash-checkable type. Four independent cheap
    // aggregates unioned; nothing corpus-quadratic.
    "pipe_corpus_report" -> ((s, d) => {
      val dd = docs(s, d)
      val toks = dd.select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
      val docStats = dd.agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"))
      val tokStats = toks.agg(
        count(lit(1)).as("total_tokens"),
        countDistinct("tok").as("distinct_tokens"))
      val dupDocs = dd.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c") - 1).as("dup_docs"))
      val topSource = dd.groupBy("source").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), sum("c").as("tot"))
        .select(expr("mx * 10000L div tot").as("top_source_share_x10k"))
      val topToken = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), sum("c").as("tot"))
        .select(expr("mx * 10000L div tot").as("top_token_share_x10k"))
      def rows(df: DataFrame): DataFrame = {
        val cols = df.columns
        df.select(explode(array(cols.map(c =>
          struct(lit(c).as("metric"), col(c).cast("long").as("value"))): _*))
          .as("r")).select("r.metric", "r.value")
      }
      rows(docStats).unionByName(rows(tokStats)).unionByName(rows(dupDocs))
        .unionByName(rows(topSource)).unionByName(rows(topToken))
        .orderBy("metric")
    }),

    // triangle counting on the co-chunk graph (cohesion next to
    // pipe_pagerank's centrality): df-capped edges derived once, the
    // canonical a<b<c three-way join counts each triangle exactly once,
    // per-doc participation via an id-only explode aggregate.
    "pipe_triangles" -> ((s, d) =>
      Ops.docGraphTriangles(docs(s, d)).orderBy("doc_id")),

    // corpus snapshot diff (data versioning): version B derives from the
    // current corpus deterministically — docs with doc_id % 11 = 0 are
    // dropped (removed), % 7 = 0 are uppercased (changed), and % 17 = 0
    // reappear shifted +1000000 (added) — so BOTH engines can construct
    // the same B and the oracle checks the full-outer hash-diff logic.
    // token-distribution drift between two snapshots (the monitoring
    // readout after an ingest or filter change: WHICH tokens moved):
    // per-snapshot ppm shares as exact integers (c*1e6 div N), drift =
    // share difference, top-20 by |drift| with token tie-break. Snapshot
    // B deterministically drops every 5th doc so both engines derive it
    "pipe_token_drift" -> ((s, d) => {
      val a = docs(s, d)
      val b = a.filter(col("doc_id") % 5 =!= 0)
      def counts(df: org.apache.spark.sql.DataFrame) = df
        .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val ca = counts(a)
      val cb = counts(b)
      val tot = ca.agg(sum("c").cast("long").as("na"))
        .crossJoin(cb.agg(sum("c").cast("long").as("nb")))
      ca.select(col("tok"), col("c").as("c_a"))
        .join(cb.select(col("tok"), col("c").as("c_b")), Seq("tok"), "full_outer")
        .na.fill(0L, Seq("c_a", "c_b"))
        .crossJoin(broadcast(tot))
        .filter(col("c_a") + col("c_b") >= 10)
        .withColumn("share_a_ppm", expr("c_a * 1000000L div na"))
        .withColumn("share_b_ppm", expr("c_b * 1000000L div nb"))
        .withColumn("drift_ppm", col("share_a_ppm") - col("share_b_ppm"))
        .select("tok", "c_a", "c_b", "share_a_ppm", "share_b_ppm", "drift_ppm")
        .orderBy(abs(col("drift_ppm")).desc, col("tok"))
        .limit(20)
    }),

    // exact two-sample Kolmogorov-Smirnov on the per-doc token-count
    // distribution between two corpus halves (the distribution-shift gate
    // pipe_token_drift's per-token view doesn't give: ONE number that says
    // "the length distribution moved"). Scale shape: the corpus collapses
    // to (value, count_a, count_b) in one mergeable hash aggregate; the
    // ECDF prefix scan runs over the DISTINCT-value grid only (token
    // counts — thousands of values, not rows), so the window never sees
    // the corpus. D is carried as the exact integer numerator
    // max|cum_a·n_b − cum_b·n_a| (no float ECDFs to drift); the ppm value
    // and the α=0.05 Smirnov threshold use deterministic double math on
    // those exact integers.
    "pipe_ks_drift" -> ((s, d) => {
      val t = docs(s, d).select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("v"))
      graft.operators.EvalOps.ksDrift(
        t.filter(col("doc_id") % 2 === 0).select("v"),
        t.filter(col("doc_id") % 2 =!= 0).select("v"), "v")
    }),

    // WARC-shaped round-trip (the OTHER web-ingest surface: crawls arrive
    // as WARC record streams, not line-JSON): export header+payload
    // records, read them back by splitting on the record delimiter via
    // the text source's lineSep option (a per-read setting — no global
    // Hadoop record-delimiter mutation), parse headers with codegen'd
    // string ops, and AUDIT the framing: each record declares its payload
    // length and the reader counts mismatches (real WARC is Content-Length
    // framed; a delimiter collision inside a payload would surface here
    // as a mismatch, not silent corruption). Lossless-ness proved by
    // per-source exact aggregates against the parquet original.
    "pipe_warc_roundtrip" -> ((s, d) => {
      val rec = concat(
        lit("WARC-Record-ID: "), col("doc_id"), lit("\n"),
        lit("WARC-Source: "), col("source"), lit("\n"),
        lit("Content-Chars: "), length(col("text")), lit("\n\n"),
        col("text"))
      docs(s, d).select(rec.as("value"))
        .coalesce(4)
        .write.mode("overwrite").option("lineSep", "\nWARC/1.0\n")
        .text(WarcFixturePath)
      val raw = s.read.option("lineSep", "\nWARC/1.0\n").text(WarcFixturePath)
        .filter(length(col("value")) > 0)
      val headers = substring_index(col("value"), "\n\n", 1)
      val parsed = raw.select(
        regexp_extract(headers, "WARC-Record-ID: ([0-9]+)", 1)
          .cast("long").as("doc_id"),
        regexp_extract(headers, "WARC-Source: ([^\n]+)", 1).as("source"),
        regexp_extract(headers, "Content-Chars: ([0-9]+)", 1)
          .cast("long").as("declared"),
        (length(col("value")) - length(headers) - 2).as("payload_chars"))
      parsed.groupBy("source").agg(
          count(lit(1)).as("docs"),
          sum("doc_id").as("id_sum"),
          sum("payload_chars").as("chars"),
          sum(when(col("declared") =!= col("payload_chars"), 1L).otherwise(0L))
            .as("n_misframed"))
        .orderBy("source")
    }),

    // categorical drift between corpus halves — the chi-square companion
    // to pipe_ks_drift (KS sees ordinal shifts; chi-square sees CATEGORY
    // composition changes, here the source mix). Per-category contribution
    // carried as the exact integer numerator (c_a·n_b − c_b·n_a)² over the
    // exact denominator n_a·n_b·(c_a+c_b) — the one float stage is scalar
    // IEEE on exact integers, summed AFTER flooring to fixed point so
    // accumulation order can't move a bit. One category-grid aggregate.
    "pipe_source_drift" -> ((s, d) => {
      val t = docs(s, d).select(col("source"),
        (col("doc_id") % 2 === 0).as("in_a"))
      val byc = t.groupBy("source").agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cb"))
      val tot = byc.agg(sum("ca").as("na"), sum("cb").as("nb"))
      byc.crossJoin(broadcast(tot))
        // diff stays exact in LONG to ~3e9 docs per side; the square runs
        // in double (deterministic IEEE) so no silent long overflow at scale
        .withColumn("diff", col("ca") * col("nb") - col("cb") * col("na"))
        .withColumn("contrib_micro",
          floor(col("diff").cast("double") * col("diff") * 1000000.0 /
            (col("na").cast("double") * col("nb") *
              (col("ca") + col("cb")).cast("double"))).cast("long"))
        .agg(count(lit(1)).as("n_categories"),
          max("na").as("n_a"), max("nb").as("n_b"),
          sum("contrib_micro").as("chi2_micro"))
    }),

    // gzipped-JSONL round-trip (the ingest surface: web corpora arrive as
    // .jsonl.gz shards): export the corpus as compressed JSON lines, read
    // it back through the JSON source with an EXPLICIT schema and
    // PERMISSIVE corrupt-record capture (schema inference would be a
    // second full pass at 100 TB; corrupt rows must be counted, not
    // crash the job), and prove losslessness with per-source exact
    // aggregates against the parquet original. Splittability note: gzip
    // shards are each single-split — parallelism = shard count, which is
    // why the export writes multiple files rather than coalesce(1).
    "pipe_jsonl_roundtrip" -> ((s, d) => {
      docs(s, d)
        .select(to_json(struct(col("doc_id"), col("source"), col("text"))).as("value"))
        .coalesce(4)
        .write.mode("overwrite").option("compression", "gzip").text(JsonlFixturePath)
      s.read
        .schema("doc_id LONG, source STRING, text STRING, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(JsonlFixturePath)
        .groupBy("source").agg(
          count(lit(1)).as("docs"),
          sum("doc_id").as("id_sum"),
          sum(length(col("text"))).as("chars"),
          sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
        .orderBy("source")
    }),

    // curriculum schedule (easy→hard training phases): phase thresholds are
    // the quartiles of the trained quality score, computed by the
    // sketch-guided EXACT quantile operator (mergeable GK brackets — no
    // unbounded buffer, no global sort), broadcast as 3 numbers; phase
    // assignment is a stateless comparison in the scan; the readout is a
    // (phase, source) aggregate. The corpus-sized join attaches n_chars by
    // doc_id — co-partitioned with the score derivation, one shuffle.
    // Scores against the PERSISTED version-stamped model (ensureModel:
    // trains only when the cached model is missing/stale; Bench pre-builds
    // it under its own budget key) — training inside this timed query was
    // the r9 budget violation.
    "pipe_curriculum" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.QualityModel
        .ensureModel(base, TextQueries.QualityModelFixturePath, identity = d)
      // pin the (doc_id, score_fp) frame: exactQuantiles scans it 3x and
      // the phase verdict once more — unpinned, each pass re-runs the
      // model scoring (weights join + dot) over the whole corpus
      val scored = graft.operators.QualityModel
        .scoreAgainst(base, TextQueries.QualityModelFixturePath)
        .select(col("doc_id"), col("score_fp"))
        .localCheckpoint(true)
      val qs = graft.operators.Quantiles
        .exactQuantiles(
          scored.withColumn("g", lit(1))
            .withColumn("x", col("score_fp").cast("double")),
          Seq("g"), "x", Seq(0.25, 0.5, 0.75))
        .select(col("q_0").as("t25"), col("q_1").as("t50"), col("q_2").as("t75"))
      scored.crossJoin(broadcast(qs))
        .withColumn("phase",
          when(col("score_fp") >= col("t75"), 0L)
            .when(col("score_fp") >= col("t50"), 1L)
            .when(col("score_fp") >= col("t25"), 2L)
            .otherwise(3L))
        .join(base.select("doc_id", "source", "n_chars"), "doc_id")
        .groupBy("phase", "source")
        .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
        .orderBy("phase", "source")
    }),

    // contrastive training pairs (SimCSE/CLIP-style): anchor = words 1-8,
    // positive = words 9-16 of the same doc; the NEGATIVE comes from a
    // salted-hash ring — docs hash into 16 buckets, sort by hash within
    // the bucket, each doc takes the next doc's positive chunk (wrapping).
    // Scale shape: the ring window is PARTITIONED by bucket (no global
    // sort; widen the bucket prefix at larger corpora), the self-join is
    // an equi-join on (bucket, ring position). Deterministic: the hash is
    // salted md5, no RNG state; singleton buckets are dropped (a doc can't
    // be its own negative).
    "pipe_contrastive_pairs" -> ((s, d) =>
      graft.operators.EvalOps.contrastivePairs(docs(s, d)).orderBy("doc_id")),

    // mixture allocation plan with caps (the DoReMi/temperature-mixture
    // planning primitive): given per-source token supplies, temperature-0.5
    // weights (w = floor-sqrt supply — one IEEE sqrt on an exact integer),
    // and a budget of half the corpus, waterfill EXACTLY: sources sorted by
    // supply/weight saturate as a prefix (classic waterfilling argument —
    // removing a source whose ratio exceeds the running quotient only
    // lowers the quotient, so the integer test avail·W_rem ≤ B_rem·w is
    // monotone down the order); unsaturated sources split the remaining
    // budget ∝ weight by floor division. Everything after the sort key is
    // integer arithmetic; the windows run over |sources| rows.
    "pipe_mixture_plan" -> ((s, d) => {
      val avail = docs(s, d)
        .select(col("source"),
          size(split(trim(col("text")), " +")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("avail"))
      graft.operators.EvalOps.waterfill(avail).orderBy("source")
    }),

    // robust per-source length-outlier counts (truncation/garbage
    // detection without distribution assumptions): per-source median and
    // MAD via the sketch-guided EXACT quantile operator (mergeable GK
    // brackets, no unbounded buffer), flag docs beyond 5·MAD. Run on the
    // integer-valued token count so every interpolated midpoint is a
    // binary-exact half (the q_mad bit-identity argument); degenerate
    // MAD=0 sources fall back to a 1-token band.
    "pipe_length_outliers" -> ((s, d) => {
      // pin the (source, token-count) projection: two exactQuantiles
      // passes (3 scans each) + the deviation rejoin + the final verdict
      // scan re-run the full-text regexp split ~8x unpinned; pinned, the
      // regex runs once and every pass reads 16-byte cached rows
      val t = docs(s, d).select(col("source"),
        size(split(trim(col("text")), " +")).cast("double").as("x"))
        .localCheckpoint(true)
      val med = graft.operators.Quantiles
        .exactQuantiles(t, Seq("source"), "x", Seq(0.5))
        .select(col("source"), col("q_0").as("med"))
      val dev = t.join(broadcast(med), "source")
        .withColumn("dv", abs(col("x") - col("med")))
      val mad = graft.operators.Quantiles
        .exactQuantiles(dev, Seq("source"), "dv", Seq(0.5))
        .select(col("source"), col("q_0").as("mad"))
      t.join(broadcast(med), "source").join(broadcast(mad), "source")
        .groupBy("source").agg(count(lit(1)).as("docs"),
          sum(when(abs(col("x") - col("med")) >
              greatest(col("mad") * 5, lit(1.0)), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("source")
    }),

    // epochs-per-source data recipe (the UP-sampling complement of
    // pipe_mixture_plan's capped waterfill: when the mix calls for more
    // tokens than a source has, it repeats for ceil(target/avail) epochs
    // with a sampled final pass — the LLaMA-style recipe table). One
    // per-source aggregate + a broadcast totals row; every number exact
    // integer arithmetic.
    "pipe_epoch_plan" -> ((s, d) => {
      val avail = docs(s, d)
        .select(col("source"),
          size(split(trim(col("text")), " +")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("avail"))
        .withColumn("weight", floor(sqrt(col("avail").cast("double"))))
      val tot = avail.agg(sum("avail").as("b"), sum("weight").as("tot_w"))
      avail.crossJoin(broadcast(tot))
        .withColumn("target", expr("b * weight div tot_w"))
        .withColumn("epochs", expr("(target + avail - 1) div avail"))
        .withColumn("last_epoch_frac_ppm",
          expr("(target - (epochs - 1) * avail) * 1000000 div avail"))
        .select("source", "avail", "weight", "target", "epochs",
          "last_epoch_frac_ppm")
        .orderBy("source")
    }),

    // padding-waste audit (the batch-shape readout sequence packing exists
    // to fix): per-doc token counts fall into power-of-two length buckets;
    // compare pad-to-bucket-bound against pad-to-global-max. One scan, one
    // tiny broadcast (global max), |buckets| output rows, all integer.
    // Docs past the largest bucket truncate (pad 0) — stated, not hidden.
    "pipe_padding_waste" -> ((s, d) =>
      graft.operators.EvalOps.paddingWaste(docs(s, d))),

    // MERGE / upsert (the table-maintenance half of pipe_corpus_diff's
    // detection): apply a changes table (updates, deletes, inserts — all
    // deterministically derived so both engines construct the same one) to
    // the corpus snapshot in ONE full-outer join on doc_id + coalesce —
    // the lake MERGE shape: no window, no second pass, deletes drop by
    // filter, updates prefer the change side, inserts survive the outer.
    // Readout: per-source row counts + char sums of the merged snapshot,
    // plus applied-operation tallies.
    "pipe_merge_upsert" -> ((s, d) => {
      val base = docs(s, d)
      val changes = base.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), upper(col("text")).as("new_text"),
          lit("update").as("op"), col("source"))
        .unionByName(base.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), lit(null).cast("string").as("new_text"),
            lit("delete").as("op"), col("source")))
        .unionByName(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            lower(col("text")).as("new_text"),
            lit("insert").as("op"), col("source")))
      // delete wins over update for ids matching both %7 and %11
      val ranked = changes.withColumn("pri",
          when(col("op") === "delete", 0).when(col("op") === "update", 1)
            .otherwise(2))
      val w = Window.partitionBy("doc_id").orderBy("pri")
      val effective = ranked
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("new_text"), col("op"),
          col("source").as("c_source"))
      val merged = base.join(effective, Seq("doc_id"), "full_outer")
        .filter(coalesce(col("op"), lit("keep")) =!= "delete")
        .select(col("doc_id"),
          coalesce(col("new_text"), col("text")).as("text"),
          coalesce(col("source"), col("c_source")).as("source"),
          coalesce(col("op"), lit("keep")).as("op"))
      merged.groupBy("source").agg(
          count(lit(1)).as("n_rows"),
          sum(length(col("text"))).as("chars"),
          sum(when(col("op") === "update", 1L).otherwise(0L)).as("n_updated"),
          sum(when(col("op") === "insert", 1L).otherwise(0L)).as("n_inserted"),
          sum(when(col("op") === "keep", 1L).otherwise(0L)).as("n_kept"))
        .orderBy("source")
    }),

    "pipe_corpus_diff" -> ((s, d) => {
      val a = docs(s, d)
      val b = a.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, upper(col("text")))
            .otherwise(col("text")))
        .unionByName(a.filter(col("doc_id") % 17 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L),
          allowMissingColumns = false)
      Ops.corpusDiff(a, b).orderBy("doc_id")
    }),

    // topic clustering + cluster labeling (corpus exploration): spherical
    // k-means over the unit hashed-TF-IDF vectors (the SemDeDup protocol —
    // the one non-SQL step, the k-means assignment, exports as a fixture),
    // then BOTH engines recompute the labeling: per cluster, size + top-3
    // terms by summed exact-integer tf-idf. The oracle hash proves the
    // label stage (scoring, grouping, ranking) engine-independently;
    // clustering quality itself sits on TfidfLineDedupSpec's bars.
    "pipe_doc_clusters_verified" -> ((s, d) => {
      val dd = docs(s, d)
      Ops.docClusters(dd, cells = 8, lloydIters = 2)
        .select("doc_id", "cell")
        .write.mode("overwrite").parquet(DocClustersFixturePath)
      val assign = s.read.parquet(DocClustersFixturePath)
      val terms = assign.join(Ops.tfidfScored(dd), "doc_id")
        .groupBy("cell", "term").agg(sum("score").as("total_score"))
      val sizes = assign.groupBy("cell").agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("cell")
        .orderBy(col("total_score").desc, col("term"))
      terms.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .join(sizes, "cell")
        .select("cell", "n_docs", "rnk", "term", "total_score")
        .orderBy("cell", "rnk")
    }),

    // mixture rebalancing to target source weights (ratio 1:2:3:4 cycling
    // over the 20 sources): the scarcest source caps the total, every
    // source keeps floor(w*T) docs by deterministic salted-hash rank.
    // The k-table is computed distributed and broadcast — no collect.
    "pipe_mixture_sample" -> ((s, d) =>
      Ops.mixtureSample(docs(s, d),
          (0 until 20).map(i => s"src$i" -> (i % 4 + 1).toDouble).toMap)
        .orderBy("doc_id")),

    // deterministic stratified sample: the first 20 docs per language in
    // salted-hash order — a reproducible fixed-size eval slice per stratum.
    // Skew guard: a naive per-lang window puts the dominant language (60%+
    // of any real web corpus) on ONE task; instead, rank first within
    // (lang, salt) — 32-way fan-out of the heavy shuffle — and keep only
    // local rank <= 20. PROVABLY recall-complete: a row in the per-lang
    // global top 20 is necessarily in the top 20 of its own salt group, so
    // the final per-lang window ranks <= 20*32 survivor rows per language
    // and its output is identical to the unfiltered single-window rank.
    "pipe_sample_stratified" -> ((s, d) =>
      Ops.stratifiedSample(docs(s, d), k = 20).orderBy("doc_id")),

    // Neyman (optimal) allocation: slots ∝ N_h·σ_h of the word count —
    // high-variance strata over-sample because that is where budget buys
    // estimator precision. N·σ = sqrt(exact integer), allocation is pure
    // integer arithmetic after the one IEEE sqrt — no float summation
    // order anywhere, so the oracle recomputes allocation AND membership
    "pipe_sample_neyman" -> ((s, d) =>
      Ops.neymanSample(docs(s, d), k = 100).orderBy("doc_id")),

    // the same exactly-k-per-language sample through the bounded-heap
    // aggregate (graft_topk): no window, no skew pre-filter — a dominant
    // language costs the same O(k) heap per task as a rare one
    "pipe_sample_stratified_agg" -> ((s, d) =>
      Ops.stratifiedSampleTopK(docs(s, d), k = 20).orderBy("doc_id")),

    // temperature resampling (α = 0.5): per-language keep probability
    // ∝ sqrt(min_count / count_l), so over-represented languages are
    // downsampled toward balance (the multilingual-training rebalancing
    // move). Membership = salted-hash-prefix integer under a per-lang
    // integer threshold — deterministic, no RNG. Plan: tiny per-lang count
    // agg broadcast back onto the corpus scan; one shuffle total.
    "pipe_sample_temperature" -> ((s, d) => {
      val counts = docs(s, d).groupBy("lang").agg(count(lit(1)).as("cnt"))
      val thr = counts.crossJoin(counts.agg(min(col("cnt")).as("minc")))
        .select(col("lang"),
          floor(lit(65536) * sqrt(col("minc").cast("double") / col("cnt"))).as("thr"))
      val hexInt = conv(substring(
        md5(concat(lit("graft-temp:"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("long")
      docs(s, d).join(broadcast(thr), "lang")
        .filter(hexInt < col("thr"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // size-balanced shard packing: docs are stratified into token-count
    // buckets (integer math), then round-robined into 8 bins by salted-hash
    // rank WITHIN each bucket — per-bin token totals balance to within one
    // bucket-width per stratum without any global sort. The round-robin rank
    // is realized as a salted TWO-LEVEL ranking (see packBins): the heavy
    // shuffle runs on (bucket, salt) = up to 16*32 groups, not the 16-task
    // funnel a plain per-bucket window would be (~6 TB sorted per task at
    // 100 TB).
    "pipe_pack_bins" -> ((s, d) => Ops.packBins(docs(s, d)).orderBy("bin")),

    // sequence packing (the training-prep step after cleaning: concatenate
    // docs into fixed token windows, here 512): docs are hash-assigned to 64
    // UNIFORM shards (no skew by construction — unlike lang/bucket keys) and
    // packed greedily in salted-hash order; a doc belongs to the sequence its
    // cumulative token offset falls in (the standard pack-then-split
    // approximation, where a straddling doc is cut at the boundary). Output
    // is the per-sequence audit (doc count, token fill). Scale: the heavy
    // window is a per-shard running sum — linear merge per shard, shard
    // count is a free parallelism knob independent of any data property.
    "pipe_seq_pack" -> ((s, d) =>
      Ops.seqPack(docs(s, d)).orderBy("shard", "seq_id")),

    // corpus length histogram: fixed-width integer buckets (50 chars, open
    // top bucket) — the first plot of any dataset audit. Pure integer math
    // end to end; one shuffle on a 12-value key.
    "text_len_histogram" -> ((s, d) => {
      val len = length(col("text")).cast("long")
      docs(s, d)
        .select(least(floor(len / 50), lit(11)).as("bucket"), len.as("len"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), min("len").as("min_len"),
          max("len").as("max_len"), sum("len").as("sum_len"))
        .orderBy("bucket")
    }),

    // one-row dataset card: the header numbers of a corpus datasheet
    // (docs, languages, sources, tokens, exact-dup count) in a single
    // aggregation pass over the corpus.
    "pipe_dataset_card" -> ((s, d) => {
      val nTok = size(split(trim(col("text")), " +")).cast("long")
      docs(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        sum(nTok).as("total_tokens"),
        (floor(sum(nTok) * lit(10000) / count(lit(1))) / 10000).as("avg_tokens"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"))
    }),

    // the MODEL-CARD extension of pipe_dataset_card: one row composing the
    // session's audit statistics — trained-filter AUC, length-distribution
    // KS between corpus halves, near-dup pair rate, and detected-English
    // share. Each leg is its own proven single-row plan (the oracles are
    // the same CTE fragments the standalone queries use); the composition
    // is three broadcast-singleton crosses.
    "pipe_dataset_card2" -> ((s, d) => {
      val base = docs(s, d)
      graft.operators.QualityModel
        .ensureModel(base, TextQueries.QualityModelFixturePath, identity = d)
      val auc = graft.operators.EvalOps
        .rocAuc(graft.operators.QualityModel
          .scoreAgainst(base, TextQueries.QualityModelFixturePath),
          "score_fp", "label")
        .select(col("auc_ppm"))
      val lens = base.select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("v"))
      val ks = graft.operators.EvalOps.ksDrift(
          lens.filter(col("doc_id") % 2 === 0).select("v"),
          lens.filter(col("doc_id") % 2 =!= 0).select("v"), "v")
        .select(col("ks_ppm").as("len_parity_ks_ppm"))
      val dups = DedupQueries.ngramJaccardPairs(base)
        .agg(count(lit(1)).as("neardup_pairs"))
      val en = base.select(
          (regexp_count(lower(col("text")),
            lit("\\b(the|and|of|to|in|is|for|with)\\b")) > 0).as("has_en"))
        .agg(sum(when(col("has_en"), 1L).otherwise(0L)).as("n_en"),
          count(lit(1)).as("n_docs"))
        .select(col("n_docs"), expr("n_en * 1000000 div n_docs").as("en_share_ppm"))
      en.crossJoin(broadcast(auc))
        .crossJoin(broadcast(ks))
        .crossJoin(broadcast(dups))
        .withColumn("neardup_pair_rate_ppm",
          expr("neardup_pairs * 1000000 div n_docs"))
    }),

    // int8 scalar quantization audit: per-vector max-abs scale, quantized
    // checksums, and worst-case reconstruction error — the report a pipeline
    // runs before shipping embeddings to an int8 ANN index. One pass, one
    // tight codegen'd loop per row (graft_int8_stats), no shuffle at all
    // until the final order for the oracle.
    "sim_quantize_int8" -> ((s, d) => {
      SimilarityQueries.emb(s, d)
        .select(col("vec_id"), expr("graft_int8_stats(v)").as("st"))
        .select(col("vec_id"),
          (floor(col("st")(0) * 1000000) / 1000000).as("scale_mx"),
          col("st")(1).cast("long").as("sum_q"),
          col("st")(2).cast("long").as("sum_abs_q"),
          col("st")(3).cast("long").as("n_nonzero"),
          (floor(col("st")(4) * 10000000) / 10000000).as("max_err"))
        .orderBy("vec_id")
    }),

    // Z-order layout audit ([[graft.expressions.ZOrderCode]]): events are
    // min-max-scaled to 16 bits on (user_id, event second), Morton-coded
    // with the native graft_zorder expression, and cut into 32 equal-depth
    // buckets in z order. The per-bucket min/max envelopes on BOTH
    // dimensions are the min/max stats each parquet file would carry if
    // written in this order — tight on both axes, where a linear sort
    // leaves the second axis's envelope table-wide (ZOrderSpec measures the
    // pruning difference). The production write path is
    // repartitionByRange(zval) (sampled boundaries, cluster-scale); the
    // catalog audit uses ntile for deterministic, oracle-checkable cuts.
    // ANALYZE-style column statistics in ONE scan: per column, row count,
    // nulls, exact distinct count, lexicographic min/max (string-cast so
    // the 6-stat row shape is uniform across types and engine-exact).
    // Multiple COUNT(DISTINCT)s in one aggregate plan via Expand (one
    // pass over the data, rows x columns intermediate) — the right shape
    // while ndv per column is shuffle-bounded; at petabyte scale swap the
    // exact ndv for HLL partials per column and keep the same one-scan
    // plan. The stats feed the planner's own CBO as well as pipeline
    // data-quality gates (a column whose ndv or null rate drifts is the
    // first sign of an upstream schema break).
    "pipe_column_stats" -> ((s, d) => {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val base = docs(s, d)
      val agg = base.agg(
        count(lit(1)).as("n"),
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
          countDistinct(col(c)).as(s"ndv_$c"),
          min(col(c).cast("string")).as(s"min_$c"),
          max(col(c).cast("string")).as(s"max_$c"))): _*)
      val stacked = cols.map { c =>
        agg.select(lit(c).as("column"), col("n"),
          col(s"nulls_$c").as("nulls"), col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s"))
      }.reduce(_ unionAll _)
      stacked.orderBy("column")
    }),

    // file-level Bloom data skipping ([[graft.operators.BloomFileIndex]]):
    // the corpus is laid out in 16 range-clustered files (build-once into
    // tmp, meta-marker committed like the ANN index), a per-file Bloom
    // index is built on doc_id, and a point lookup plans over only the
    // files whose filter fires. Output carries the pruning evidence
    // (files_read of files_total) next to the found row; no_oracle —
    // BloomFileIndexSpec proves exactness vs the full scan and the
    // lossless partial-merge.
    "pipe_bloom_skip" -> ((s, d) => {
      val (dataDir, _, hit) = bloomLookup(s, d, 42L)
      hit.select(col("doc_id"), col("lang"), col("source"))
        .withColumn("files_total", lit(16))
        .withColumn("files_read", lit(hit.inputFiles.length))
    }),

    // the ORACLE-CHECKED half of Bloom data skipping: the rows the
    // skipped scan returns for a probe set (hits in different range
    // files + one absent key) must equal the plain full-table lookup —
    // the no-false-negative serving guarantee, proven engine-
    // independently. files_read stays on BloomFileIndexSpec (false-
    // positive counts are filter-private).
    "pipe_bloom_skip_verified" -> ((s, d) => {
      val probes = Seq(1L, 42L, 123L, 321L, 999999999L)
      probes.map { k =>
        bloomLookup(s, d, k)._3
          .select(lit(k).as("probe"), col("doc_id"), col("lang"), col("source"))
      }.reduce(_ unionAll _).orderBy("probe")
    }),

    // 3-key z-order ([[graft.expressions.ZOrderCode3]]): events clustered
    // on (user, second, cent-value) — the user × time × amount layout a
    // billing/event store actually serves range queries against on all
    // three axes. Same ntile audit protocol as pipe_zorder; envelopes
    // must tighten on ALL THREE dims per bucket.
    "pipe_zorder3" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val base = events(s, d).select(
        col("event_id"), col("user_id").as("u"),
        expr("unix_micros(ts) div 1000000").as("sec"),
        floor(col("value") * 100).cast("long").as("v100"))
      val b = base.agg(
        min("u").as("minu"), max("u").as("maxu"),
        min("sec").as("mins"), max("sec").as("maxs"),
        min("v100").as("minv"), max("v100").as("maxv"),
        count(lit(1)).as("n_total"))
      val scaled = base.crossJoin(broadcast(b)).select(
        col("event_id"), col("n_total"),
        expr("(u - minu) * 65535 div greatest(maxu - minu, 1)").as("xs"),
        expr("(sec - mins) * 65535 div greatest(maxs - mins, 1)").as("ys"),
        expr("(v100 - minv) * 65535 div greatest(maxv - minv, 1)").as("zs"))
      // NTILE(32) over the whole table is a single-task sort; the
      // cell-histogram rank ([[graft.operators.CorpusOps.rankByIntCells]]
      // — the 48-bit interleaved code's high bits are near-uniform by
      // construction) plus [[ntileBucketSql]]'s front-loaded-split
      // arithmetic reproduces ntile's cuts exactly, so the oracle's
      // NTILE stays valid
      val coded = scaled.withColumn("zval",
        call_function("graft_zorder3", col("xs"), col("ys"), col("zs")))
      Ops.rankByIntCells(coded, "zval", "event_id", zvalBits = 48, rankCol = "rk")
        .withColumn("bucket", expr(ntileBucketSql(32)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("xs").as("min_x"), max("xs").as("max_x"),
          min("ys").as("min_y"), max("ys").as("max_y"),
          min("zs").as("min_z"), max("zs").as("max_z"))
        .orderBy("bucket")
    }),

    // document authority via fixed-point PageRank over the co-chunk graph
    // ([[graft.operators.CorpusOps.docGraphPageRank]]): the web pipelines'
    // "rank the pages, weight the sample" step, runnable on a corpus with
    // no hyperlinks. Integer fixed-point (1e9 = 1.0) makes 5 power
    // iterations engine-exact — the oracle unrolls them as CTEs and must
    // match every rank to the unit.
    "pipe_pagerank" -> ((s, d) =>
      Ops.docGraphPageRank(docs(s, d), iterations = 5, maxChunkDocs = 50)),

    // label-propagation communities on the same co-chunk graph: sync
    // rounds + smallest-label tie rule = deterministic, so the oracle
    // unrolls the rounds as CTEs and matches every label
    "pipe_communities" -> ((s, d) =>
      Ops.docGraphCommunities(docs(s, d), iterations = 3, maxChunkDocs = 50)
        .orderBy("doc_id")),

    // k-core peel on the same graph: three rounds of degree-<3 removal
    // isolate the dense core; fixed rounds -> the oracle unrolls them
    "pipe_kcore" -> ((s, d) =>
      Ops.docGraphKCore(docs(s, d), kCore = 3, rounds = 3, maxChunkDocs = 50)
        .orderBy("doc_id")),

    "pipe_zorder" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val base = events(s, d).select(
        col("event_id"), col("user_id").as("u"),
        expr("unix_micros(ts) div 1000000").as("sec"))
      val b = base.agg(
        min("u").as("minu"), max("u").as("maxu"),
        min("sec").as("mins"), max("sec").as("maxs"),
        count(lit(1)).as("n_total"))
      val scaled = base.crossJoin(broadcast(b)).select(
        col("event_id"), col("n_total"),
        expr("(u - minu) * 65535 div greatest(maxu - minu, 1)").as("xs"),
        expr("(sec - mins) * 65535 div greatest(maxs - mins, 1)").as("ys"))
      // distributed ntile replacement — see pipe_zorder3's comment
      val coded = scaled
        .withColumn("zval", call_function("graft_zorder", col("xs"), col("ys")))
      Ops.rankByIntCells(coded, "zval", "event_id", zvalBits = 32, rankCol = "rk")
        .withColumn("bucket", expr(ntileBucketSql(32)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("xs").as("min_x"), max("xs").as("max_x"),
          min("ys").as("min_y"), max("ys").as("max_y"))
        .orderBy("bucket")
    }),

    // the same file-envelope audit on the HILBERT curve (the layout
    // behind "liquid"-style clustering): consecutive Hilbert codes are
    // always grid-adjacent — no Morton diagonal jumps — so the 32 range
    // buckets cover tighter rectangles (ZOrderSpec measures the envelope-
    // area win on this same data). The oracle replays the xy2d bit loop
    // as 16 generated CTE steps of pure integer CASE/XOR arithmetic.
    "pipe_hilbert" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val base = events(s, d).select(
        col("event_id"), col("user_id").as("u"),
        expr("unix_micros(ts) div 1000000").as("sec"))
      val b = base.agg(
        min("u").as("minu"), max("u").as("maxu"),
        min("sec").as("mins"), max("sec").as("maxs"),
        count(lit(1)).as("n_total"))
      val scaled = base.crossJoin(broadcast(b)).select(
        col("event_id"), col("n_total"),
        expr("(u - minu) * 65535 div greatest(maxu - minu, 1)").as("xs"),
        expr("(sec - mins) * 65535 div greatest(maxs - mins, 1)").as("ys"))
      // distributed ntile replacement — see pipe_zorder3's comment
      val coded = scaled
        .withColumn("zval", call_function("graft_hilbert", col("xs"), col("ys")))
      Ops.rankByIntCells(coded, "zval", "event_id", zvalBits = 32, rankCol = "rk")
        .withColumn("bucket", expr(ntileBucketSql(32)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("xs").as("min_x"), max("xs").as("max_x"),
          min("ys").as("min_y"), max("ys").as("max_y"))
        .orderBy("bucket")
    }))

  /** Catalog rendering of [[graft.operators.CorpusOps.decontaminate]]: the
    * eval corpus is the doc_id % 20 == 0 slice (the stand-in for a real
    * held-out benchmark), the rest is training. The broadcast guard and the
    * join-before-dedupe ordering live in the library operator. */
  private[queries] def decontaminate(
      documents: DataFrame,
      maxBroadcastGrams: Long = Ops.DefaultMaxBroadcastGrams): DataFrame =
    Ops.decontaminate(
        train = documents.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        eval = documents.filter(pmod(col("doc_id"), lit(20)) === 0),
        maxBroadcastGrams = maxBroadcastGrams)
      .orderBy("doc_id")

  /** NTILE(`k`)'s bucket for the 0-based global rank column `rk` over
    * `n_total` rows, as plain integer arithmetic on globalRank's output:
    * NTILE front-loads the `n mod k` larger buckets (size ⌈n/k⌉) before
    * the ⌊n/k⌋ ones — identical in Spark and DuckDB — so this exactly
    * reproduces the oracle's `NTILE(k) OVER (ORDER BY …)` without the
    * single-task no-partition-key window. The ELSE branch's `div (n div
    * k)` is only reached when n ≥ k (rk ≥ rem·(bs+1) is impossible for
    * bs = 0), so the n < k degenerate case stays division-free. */
  private def ntileBucketSql(k: Int): String =
    s"CAST(CASE WHEN rk < (n_total % $k) * (n_total div $k + 1) " +
      s"THEN rk div (n_total div $k + 1) " +
      s"ELSE (n_total % $k) + " +
      s"(rk - (n_total % $k) * (n_total div $k + 1)) div (n_total div $k) " +
      s"END + 1 AS INT)"

  /** 16-bit Morton bit-spread as portable SQL: the same mask-shift chain
    * [[graft.expressions.ZOrderCodes.spread]] runs, specialized to 16-bit
    * inputs (4 steps) — pure integer bit ops, so engine-exact. */
  private def spreadSql(c: String): String =
    Seq((8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))
      .foldLeft(c) { case (s, (sh, m)) => s"(($s | ($s << $sh)) & $m)" }

  /** Stride-3 (21-bit) Morton spread as portable SQL, mirroring
    * [[graft.expressions.ZOrderCodes.spread3]]. */
  private def spread3Sql(c: String): String =
    Seq((32, 8725724278095871L), (16, 8725728556220671L),
        (8, 1157144660301377551L), (4, 1207822528635744451L),
        (2, 1317624576693539401L))
      .foldLeft(s"($c & 2097151)") { case (s, (sh, m)) => s"(($s | ($s << $sh)) & $m)" }

  /** The order-16 Hilbert xy2d loop ([[graft.expressions.ZOrderCodes
    * .hilbert]]) unrolled as 16 generated CTE steps over (event_id, x, y,
    * d): per step, quadrant bits rx/ry via mask tests, d += s²·((3rx)⊕ry),
    * then the reflect-and-swap rotation — pure integer CASE/XOR, engine-
    * exact. */
  private def hilbertStepsSql(initFrom: String): String = {
    val steps = (15 to 0 by -1).map(i => 1L << i)
    val ctes = steps.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) initFrom else s"h${i - 1}"
      // inner projection renames to px/py/pd: DuckDB's lateral column
      // aliases would otherwise bind same-list references of x/y to the
      // NEW aliases instead of the previous step's values
      s"""h$i AS (
         |  SELECT event_id,
         |    CASE WHEN (py & $s) = 0
         |         THEN (CASE WHEN (px & $s) > 0 THEN $s - 1 - py ELSE py END)
         |         ELSE px END AS x,
         |    CASE WHEN (py & $s) = 0
         |         THEN (CASE WHEN (px & $s) > 0 THEN $s - 1 - px ELSE px END)
         |         ELSE py END AS y,
         |    pd + CAST($s AS BIGINT) * $s * xor(3 * (CASE WHEN (px & $s) > 0 THEN 1 ELSE 0 END),
         |                       (CASE WHEN (py & $s) > 0 THEN 1 ELSE 0 END)) AS d
         |  FROM (SELECT event_id, x AS px, y AS py, d AS pd FROM $prev))""".stripMargin
    }
    ctes.mkString(",\n")
  }

  /** Unrolled fixed-point PageRank iterations as CTEs (pipe_pagerank). */
  private def pagerankSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.doc_id,
         |  150000000 + (85 * COALESCE(s.s, 0)) // 100 AS pr
         |  FROM n LEFT JOIN (
         |    SELECT ed.dst AS doc_id, CAST(SUM(r${i - 1}.pr // ed.outdeg) AS BIGINT) AS s
         |    FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.doc_id GROUP BY ed.dst) s
         |  USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
       |), c AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([array_to_string(w[1+10*i : 10+10*i], ' ')
       |            FOR i IN generate_series(0, CAST(floor((len(w)-1)/10) AS INT))]) AS chunk
       |  FROM t
       |), keep AS (
       |  SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50
       |), e AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM c a JOIN c b USING (chunk) JOIN keep USING (chunk)
       |  WHERE a.doc_id <> b.doc_id
       |), deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
       |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
       |n AS (SELECT doc_id FROM documents),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS pr FROM n),
       |$iters
       |SELECT doc_id, pr FROM r$iterations ORDER BY doc_id""".stripMargin
  }

  /** Unrolled synchronous LPA rounds — the same co-chunk edge derivation
    * as [[pagerankSql]], then per-round neighbor-label votes with the
    * (count DESC, label ASC) argmax as a window rank. */
  private def communitiesSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s"""v$i AS (
         |  SELECT e.dst AS doc_id, l.lbl, COUNT(*) AS cnt
         |  FROM e JOIN l${i - 1} l ON e.src = l.doc_id GROUP BY 1, 2
         |), w$i AS (
         |  SELECT doc_id, lbl,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lbl ASC) AS rn
         |  FROM v$i
         |), l$i AS (
         |  SELECT n.doc_id, COALESCE(w.lbl, n.doc_id) AS lbl
         |  FROM n LEFT JOIN (SELECT doc_id, lbl FROM w$i WHERE rn = 1) w USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
       |), c AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([array_to_string(w[1+10*i : 10+10*i], ' ')
       |            FOR i IN generate_series(0, CAST(floor((len(w)-1)/10) AS INT))]) AS chunk
       |  FROM t
       |), keep AS (
       |  SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50
       |), e AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM c a JOIN c b USING (chunk) JOIN keep USING (chunk)
       |  WHERE a.doc_id <> b.doc_id
       |), n AS (SELECT doc_id FROM documents),
       |l0 AS (SELECT doc_id, doc_id AS lbl FROM n),
       |$iters
       |SELECT doc_id, lbl AS community FROM l$iterations ORDER BY doc_id""".stripMargin
  }

  /** Unrolled k-core peel rounds over the shared co-chunk edge CTEs. */
  private def kcoreSql(kCore: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""d$i AS (
         |  SELECT e.src, COUNT(*) AS deg
         |  FROM e JOIN a${i - 1} x ON e.src = x.doc_id
         |         JOIN a${i - 1} y ON e.dst = y.doc_id
         |  GROUP BY 1),
         |a$i AS (SELECT src AS doc_id FROM d$i WHERE deg >= $kCore)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
       |), c AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([array_to_string(w[1+10*i : 10+10*i], ' ')
       |            FOR i IN generate_series(0, CAST(floor((len(w)-1)/10) AS INT))]) AS chunk
       |  FROM t
       |), keep AS (
       |  SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM c a JOIN c b USING (chunk) JOIN keep USING (chunk)
       |  WHERE a.doc_id <> b.doc_id
       |), a0 AS (SELECT DISTINCT src AS doc_id FROM e),
       |$iters
       |SELECT e.src AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM e JOIN a$rounds x ON e.src = x.doc_id
       |       JOIN a$rounds y ON e.dst = y.doc_id
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "pipe_communities" -> communitiesSql(3),

    "pipe_kcore" -> kcoreSql(3, 3),

    // the whole session-5 composition chained: winnow selection once,
    // decon flag → survivor set → winnow pairs within survivors →
    // greedy pair drop → Neyman allocation → report
    "pipe_full_prep2" ->
      """WITH wds AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), keyed AS (
        |  SELECT doc_id, u.pos AS pos,
        |    CAST('0x' || substring(md5(u.gram), 1, 8) AS BIGINT) * 1048576
        |      + (1048575 - u.pos) AS key
        |  FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i - 1, 'gram': array_to_string(w[i:i+3], ' ')}
        |              FOR i IN generate_series(1, len(w) - 3)]) AS u
        |    FROM wds WHERE len(w) >= 4)
        |  WHERE u.pos < 1048576
        |), win AS (
        |  SELECT doc_id, pos,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
        |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey,
        |    MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
        |  FROM keyed
        |), fps AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, wkey // 1048576 AS fp
        |  FROM win WHERE pos <= greatest(maxpos - 3, 0)
        |), te AS (
        |  SELECT doc_id AS eval_id, fp FROM fps WHERE doc_id % 20 = 0
        |), kept_e AS (
        |  SELECT eval_id, fp FROM te
        |  JOIN (SELECT fp FROM te GROUP BY fp HAVING COUNT(*) <= 1000) USING (fp)
        |), flagged AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM (SELECT doc_id, fp FROM fps WHERE doc_id % 20 <> 0) tr
        |  JOIN kept_e USING (fp)
        |  GROUP BY tr.doc_id, eval_id HAVING COUNT(*) >= 2
        |), c1 AS MATERIALIZED (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |), fps1 AS MATERIALIZED (
        |  SELECT fps.* FROM fps JOIN c1 USING (doc_id)
        |), sizes AS (
        |  SELECT doc_id, COUNT(*) AS sz FROM fps1 GROUP BY 1
        |), keptf AS (
        |  SELECT fp FROM fps1 GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 1000
        |), wp AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |    FROM fps1 a JOIN keptf USING (fp) JOIN fps1 b USING (fp)
        |    WHERE a.doc_id < b.doc_id GROUP BY 1, 2) c
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE common * 100 >= (sa.sz + sb.sz - common) * 50
        |), c2 AS MATERIALIZED (
        |  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN c1 USING (doc_id)
        |  WHERE doc_id NOT IN (SELECT doc_b FROM wp)
        |), st AS (
        |  SELECT lang AS h, COUNT(*) AS n_h, SUM(x) AS sx, SUM(x * x) AS sxx
        |  FROM (SELECT lang,
        |          CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS x
        |        FROM c2)
        |  GROUP BY 1
        |), wt AS (
        |  SELECT h,
        |    CAST(FLOOR(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS w
        |  FROM st
        |), a AS (
        |  SELECT h, 50 * w // greatest((SELECT SUM(w) FROM wt), 1) AS alloc FROM wt
        |), r AS (
        |  SELECT doc_id, lang, text,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('graft-neyman:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rk
        |  FROM c2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS tokens
        |FROM r JOIN a ON a.h = r.lang
        |WHERE rk <= alloc
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // same derived snapshot, same integer ppm shares, same ordering
    "pipe_token_drift" ->
      """WITH ta AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |  FROM documents
        |), tb AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |  FROM documents WHERE doc_id % 5 <> 0
        |), ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_a FROM ta GROUP BY 1),
        |cb AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_b FROM tb GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT CAST(SUM(c_a) AS BIGINT) FROM ca) AS na,
        |         (SELECT CAST(SUM(c_b) AS BIGINT) FROM cb) AS nb
        |), j AS (
        |  SELECT COALESCE(ca.tok, cb.tok) AS tok,
        |    COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        |  FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
        |)
        |SELECT tok, c_a, c_b,
        |  c_a * 1000000 // na AS share_a_ppm,
        |  c_b * 1000000 // nb AS share_b_ppm,
        |  c_a * 1000000 // na - c_b * 1000000 // nb AS drift_ppm
        |FROM j, tot
        |WHERE c_a + c_b >= 10
        |ORDER BY abs(c_a * 1000000 // na - c_b * 1000000 // nb) DESC, tok
        |LIMIT 20""".stripMargin,

    // same parity split, same integer D numerator, same double chain for
    // the ppm value and the Smirnov threshold
    "pipe_ks_drift" ->
      """WITH t AS (
        |  SELECT CAST(LEN(string_split_regex(TRIM(text), ' +')) AS BIGINT) AS v,
        |    doc_id % 2 = 0 AS in_a
        |  FROM documents
        |), byv AS (
        |  SELECT v, CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1
        |), cum AS (
        |  SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
        |  FROM byv
        |), tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM byv
        |), agg AS (
        |  SELECT CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
        |    MAX(na) AS n_a, MAX(nb) AS n_b
        |  FROM cum CROSS JOIN tot)
        |SELECT n_a, n_b, d_num,
        |  CAST(FLOOR(CAST(d_num AS DOUBLE) * 1000000.0 /
        |    (CAST(n_a AS DOUBLE) * n_b)) AS BIGINT) AS ks_ppm,
        |  CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) >
        |    1.358 * SQRT(CAST(n_a + n_b AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b))
        |    AS reject_05
        |FROM agg""".stripMargin,

    // scored CTE shared with text_quality_model; quantile_cont matches the
    // sketch-guided exact quantile operator (same continuous definition)
    "pipe_curriculum" ->
      s"""${TextQueries.qualityScoredSql},
        |qs AS (
        |  SELECT quantile_cont(CAST(score_fp AS DOUBLE), 0.25) AS t25,
        |    quantile_cont(CAST(score_fp AS DOUBLE), 0.5) AS t50,
        |    quantile_cont(CAST(score_fp AS DOUBLE), 0.75) AS t75
        |  FROM scored)
        |SELECT CASE WHEN score_fp >= t75 THEN 0
        |            WHEN score_fp >= t50 THEN 1
        |            WHEN score_fp >= t25 THEN 2 ELSE 3 END AS phase,
        |  d.source, COUNT(*) AS docs, CAST(SUM(d.n_chars) AS BIGINT) AS chars
        |FROM scored s CROSS JOIN qs JOIN documents d USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same salted ring: md5 bucket, ROW_NUMBER within bucket, wrap via
    // rn % cnt + 1, singleton buckets dropped
    "pipe_contrastive_pairs" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    array_to_string(w[1:8], ' ') AS anchor,
        |    array_to_string(w[9:16], ' ') AS positive,
        |    md5('graft-neg:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
        |        FROM documents)
        |  WHERE len(w) >= 16
        |), ring AS (
        |  SELECT *, substring(h, 1, 1) AS bucket FROM ch
        |), rr AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h) AS rn,
        |    COUNT(*) OVER (PARTITION BY bucket) AS cnt
        |  FROM ring)
        |SELECT a.doc_id, b.doc_id AS neg_doc_id,
        |  a.anchor, a.positive, b.positive AS negative
        |FROM rr a JOIN rr b
        |  ON a.bucket = b.bucket AND a.rn % a.cnt + 1 = b.rn
        |WHERE a.cnt > 1
        |ORDER BY a.doc_id""".stripMargin,

    // same ascending supply/weight order, same integer saturation test and
    // floor split — the window layer runs over |sources| rows in both
    "pipe_mixture_plan" ->
      """WITH avail AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1
        |), wts AS (
        |  SELECT source, avail,
        |    CAST(FLOOR(SQRT(CAST(avail AS DOUBLE))) AS BIGINT) AS weight
        |  FROM avail
        |), tot AS (
        |  SELECT CAST(SUM(avail) AS BIGINT) AS tot_avail,
        |    CAST(SUM(weight) AS BIGINT) AS tot_w FROM wts
        |), rows_ AS (
        |  SELECT source, avail, weight, tot_avail // 2 AS b,
        |    CAST(COALESCE(SUM(avail) OVER (
        |      ORDER BY CAST(avail AS DOUBLE) / weight, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix_avail,
        |    tot_w - CAST(COALESCE(SUM(weight) OVER (
        |      ORDER BY CAST(avail AS DOUBLE) / weight, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS w_from
        |  FROM wts CROSS JOIN tot
        |), sat AS (
        |  SELECT *, avail * w_from <= (b - prefix_avail) * weight AS saturated
        |  FROM rows_
        |), fin AS (
        |  SELECT CAST(SUM(CASE WHEN saturated THEN avail ELSE 0 END) AS BIGINT)
        |      AS sat_avail,
        |    CAST(SUM(CASE WHEN saturated THEN 0 ELSE weight END) AS BIGINT)
        |      AS unsat_w
        |  FROM sat)
        |SELECT source, avail, weight, saturated,
        |  CASE WHEN saturated THEN avail
        |       ELSE (b - sat_avail) * weight // GREATEST(unsat_w, 1) END AS alloc
        |FROM sat CROSS JOIN fin
        |ORDER BY source""".stripMargin,

    // quantile_cont matches the exact-quantile operator on integer-valued
    // inputs; same 5-MAD band with the 1-token degenerate floor
    "pipe_length_outliers" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(LEN(string_split_regex(TRIM(text), ' +')) AS DOUBLE) AS x
        |  FROM documents
        |), m AS (
        |  SELECT source, quantile_cont(x, 0.5) AS med FROM t GROUP BY 1
        |), d2 AS (
        |  SELECT t.source, ABS(x - med) AS dv FROM t JOIN m USING (source)
        |), md AS (
        |  SELECT source, quantile_cont(dv, 0.5) AS mad FROM d2 GROUP BY 1)
        |SELECT t.source, COUNT(*) AS docs,
        |  CAST(SUM(CASE WHEN ABS(x - med) > GREATEST(mad * 5, 1.0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM t JOIN m USING (source) JOIN md USING (source)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same integer recipe arithmetic
    "pipe_epoch_plan" ->
      """WITH avail AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1
        |), wts AS (
        |  SELECT source, avail,
        |    CAST(FLOOR(SQRT(CAST(avail AS DOUBLE))) AS BIGINT) AS weight
        |  FROM avail
        |), tot AS (
        |  SELECT CAST(SUM(avail) AS BIGINT) AS b,
        |    CAST(SUM(weight) AS BIGINT) AS tot_w FROM wts
        |), plan AS (
        |  SELECT source, avail, weight, b * weight // tot_w AS target
        |  FROM wts CROSS JOIN tot)
        |SELECT source, avail, weight, target,
        |  (target + avail - 1) // avail AS epochs,
        |  (target - ((target + avail - 1) // avail - 1) * avail) * 1000000 // avail
        |    AS last_epoch_frac_ppm
        |FROM plan ORDER BY source""".stripMargin,

    // same power-of-two buckets, same broadcastable global max, truncation
    // past the top bucket
    "pipe_padding_waste" ->
      """WITH t AS (
        |  SELECT CAST(LEN(string_split_regex(TRIM(text), ' +')) AS BIGINT) AS n
        |  FROM documents
        |), b AS (
        |  SELECT n, CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |    WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
        |    WHEN n <= 512 THEN 512 WHEN n <= 1024 THEN 1024 ELSE 2048 END
        |    AS bucket_ub
        |  FROM t
        |), g AS (SELECT MAX(n) AS gmax FROM t)
        |SELECT bucket_ub, COUNT(*) AS docs, CAST(SUM(n) AS BIGINT) AS tokens,
        |  CAST(SUM(GREATEST(bucket_ub - n, 0)) AS BIGINT) AS bucket_pad,
        |  CAST(SUM(gmax - n) AS BIGINT) AS global_pad,
        |  CAST(SUM(GREATEST(bucket_ub - n, 0)) * 1000000
        |    // (COUNT(*) * bucket_ub) AS BIGINT) AS bucket_waste_ppm
        |FROM b CROSS JOIN g
        |GROUP BY bucket_ub ORDER BY bucket_ub""".stripMargin,

    // same deterministic changes table, same delete-beats-update priority,
    // same full-outer merge
    "pipe_merge_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id, UPPER(text) AS new_text, 'update' AS op, source
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS VARCHAR), 'delete', source
        |  FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, LOWER(text), 'insert', source
        |  FROM documents WHERE doc_id % 13 = 0
        |), effective AS (
        |  SELECT doc_id, new_text, op, source AS c_source FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY CASE op WHEN 'delete' THEN 0 WHEN 'update' THEN 1
        |               ELSE 2 END) AS rn
        |    FROM changes)
        |  WHERE rn = 1
        |), merged AS (
        |  SELECT COALESCE(b.doc_id, e.doc_id) AS doc_id,
        |    COALESCE(e.new_text, b.text) AS text,
        |    COALESCE(b.source, e.c_source) AS source,
        |    COALESCE(e.op, 'keep') AS op
        |  FROM documents b FULL OUTER JOIN effective e ON b.doc_id = e.doc_id
        |  WHERE COALESCE(e.op, 'keep') <> 'delete')
        |SELECT source, COUNT(*) AS n_rows,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
        |  CAST(SUM(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        |  CAST(SUM(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
        |  CAST(SUM(CASE WHEN op = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM merged GROUP BY source ORDER BY source""".stripMargin,

    // same exact diff, same double square, same per-category floor before
    // the integer sum
    "pipe_source_drift" ->
      """WITH t AS (
        |  SELECT source, doc_id % 2 = 0 AS in_a FROM documents
        |), byc AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        |  FROM byc
        |), c AS (
        |  SELECT ca, cb, na, nb, CAST(ca * nb - cb * na AS BIGINT) AS diff
        |  FROM byc CROSS JOIN tot)
        |SELECT COUNT(*) AS n_categories, MAX(na) AS n_a, MAX(nb) AS n_b,
        |  CAST(SUM(CAST(FLOOR(CAST(diff AS DOUBLE) * diff * 1000000.0 /
        |    (CAST(na AS DOUBLE) * nb * CAST(ca + cb AS DOUBLE))) AS BIGINT))
        |    AS BIGINT) AS chi2_micro
        |FROM c""".stripMargin,

    // round-trip identity off the parquet original, zero framing
    // mismatches
    "pipe_warc_roundtrip" ->
      """SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
        |  CAST(0 AS BIGINT) AS n_misframed
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // round-trip identity: the same per-source aggregates straight off the
    // parquet original (losslessness = equality), zero corrupt rows
    "pipe_jsonl_roundtrip" ->
      """SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // ppjoinAcross is lossless, so the oracle is the brute eval x train
    // cross jaccard at the 0.3 threshold
    "pipe_decontaminate_neardup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                   FOR i IN generate_series(1, len(w) - 2)]) AS grams
        |  FROM t WHERE len(w) >= 3),
        |ev AS (SELECT * FROM g WHERE doc_id % 20 = 0),
        |tr AS (SELECT * FROM g WHERE doc_id % 20 <> 0)
        |SELECT eval_id, train_id,
        |  FLOOR(common * 1000 / union_sz) / 1000 AS jaccard
        |FROM (
        |  SELECT ev.doc_id AS eval_id, tr.doc_id AS train_id,
        |    CAST(len(list_intersect(ev.grams, tr.grams)) AS BIGINT) AS common,
        |    CAST(len(ev.grams) + len(tr.grams)
        |         - len(list_intersect(ev.grams, tr.grams)) AS BIGINT) AS union_sz
        |  FROM ev, tr)
        |WHERE common * 100 >= union_sz * 30
        |ORDER BY eval_id, train_id""".stripMargin,

    // the dedup_winnow selection pipeline, split train/eval on doc_id%20,
    // eval-occurrence cap, >= 2 shared fingerprints flag a pair
    "pipe_decontaminate_fuzzy" ->
      """WITH wds AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), keyed AS (
        |  SELECT doc_id, u.pos AS pos,
        |    CAST('0x' || substring(md5(u.gram), 1, 8) AS BIGINT) * 1048576
        |      + (1048575 - u.pos) AS key
        |  FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i - 1, 'gram': array_to_string(w[i:i+3], ' ')}
        |              FOR i IN generate_series(1, len(w) - 3)]) AS u
        |    FROM wds WHERE len(w) >= 4)
        |  WHERE u.pos < 1048576
        |), win AS (
        |  SELECT doc_id, pos,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
        |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey,
        |    MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
        |  FROM keyed
        |), fps AS (
        |  SELECT DISTINCT doc_id, wkey // 1048576 AS fp
        |  FROM win WHERE pos <= greatest(maxpos - 3, 0)
        |), te AS (
        |  SELECT doc_id AS eval_id, fp FROM fps WHERE doc_id % 20 = 0
        |), kept_e AS (
        |  SELECT eval_id, fp FROM te
        |  JOIN (SELECT fp FROM te GROUP BY fp HAVING COUNT(*) <= 1000) USING (fp)
        |), tr AS (
        |  SELECT doc_id, fp FROM fps WHERE doc_id % 20 <> 0
        |)
        |SELECT tr.doc_id, eval_id, CAST(COUNT(*) AS BIGINT) AS shared
        |FROM tr JOIN kept_e USING (fp)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY doc_id, eval_id""".stripMargin,

    "pipe_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS i,
        |    array_to_string(w[1+8*u.i : 8+8*u.i], ' ') AS chunk
        |  FROM t, UNNEST(generate_series(0, CAST(floor((len(w)-1)/8) AS INT))) AS u(i)
        |), r AS (
        |  SELECT doc_id, i, chunk,
        |    ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, i) AS rn
        |  FROM c)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY i), '')) AS clean_hash
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipe_corpus_report" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
        |  FROM documents),
        |src AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
        |tk AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        |h AS (SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY 1)
        |SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
        |  UNION ALL SELECT 'n_sources', COUNT(DISTINCT source) FROM documents
        |  UNION ALL SELECT 'n_langs', COUNT(DISTINCT lang) FROM documents
        |  UNION ALL SELECT 'total_tokens', COUNT(*) FROM toks
        |  UNION ALL SELECT 'distinct_tokens', COUNT(DISTINCT tok) FROM toks
        |  UNION ALL SELECT 'dup_docs', CAST(SUM(c - 1) AS BIGINT) FROM h
        |  UNION ALL SELECT 'top_source_share_x10k',
        |    CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) FROM src
        |  UNION ALL SELECT 'top_token_share_x10k',
        |    CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) FROM tk)
        |ORDER BY metric""".stripMargin,

    "pipe_triangles" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), c0 AS (
        |  SELECT doc_id, array_to_string(w[1+10*u.i : 10+10*u.i], ' ') AS chunk
        |  FROM t, UNNEST(generate_series(0, CAST(floor((len(w)-1)/10) AS INT))) AS u(i)
        |), c AS (SELECT DISTINCT doc_id, chunk FROM c0),
        |keep AS (
        |  SELECT chunk FROM c GROUP BY chunk
        |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50),
        |k AS (SELECT c.* FROM c JOIN keep USING (chunk)),
        |e AS (
        |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        |  FROM k a JOIN k b USING (chunk) WHERE a.doc_id < b.doc_id),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |x AS (
        |  SELECT a AS doc_id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT doc_id, COUNT(*) AS triangles FROM x
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "pipe_corpus_diff" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 17 = 0)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN md5(a.text) <> md5(b.text) THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin,

    // recompute cluster sizes + the top-3 tf-idf label terms from the
    // exported k-means assignment — the tfidf SQL is the proven
    // text_tfidf_topk formulation
    "pipe_doc_clusters_verified" ->
      s"""WITH a AS (SELECT * FROM read_parquet('$DocClustersFixturePath/*.parquet')),
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
        |  FROM documents
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term, tf * ((SELECT n_docs FROM n) * 10000 // df) AS score
        |  FROM tf JOIN df USING (term)),
        |t AS (
        |  SELECT cell, term, CAST(SUM(score) AS BIGINT) AS total_score
        |  FROM a JOIN sc USING (doc_id) GROUP BY 1, 2),
        |sz AS (SELECT cell, COUNT(*) AS n_docs FROM a GROUP BY 1),
        |r AS (
        |  SELECT cell, term, total_score,
        |    ROW_NUMBER() OVER (PARTITION BY cell
        |      ORDER BY total_score DESC, term) AS rnk
        |  FROM t)
        |SELECT cell, sz.n_docs, CAST(rnk AS INT) AS rnk, term, total_score
        |FROM r JOIN sz USING (cell) WHERE rnk <= 3
        |ORDER BY cell, rnk""".stripMargin,

    "pipe_skew_profile" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys, MAX(cnt) AS max_cnt FROM c)
        |SELECT user_id, cnt, n_keys,
        |  FLOOR(CAST(cnt AS DOUBLE) * 10000 / total) / 10000 AS share,
        |  FLOOR(CAST(max_cnt AS DOUBLE) * 10000 * n_keys / total) / 10000 AS skew
        |FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,

    // the COMPOSITION oracle: every stage's proven SQL chained over the
    // cleaned text — gate via the exported classifier weights, CDC stats
    // via the exported spans, DSIR fully recomputed, one final report
    "pipe_full_prep" ->
      s"""WITH clean AS (
        |  SELECT doc_id, lang, n_chars,
        |    nfc_normalize(regexp_replace(trim(
        |      regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')),
        |      '[ \\t\\n\\r]+', ' ', 'g')) AS text
        |  FROM documents
        |), wc AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM clean)
        |  GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, SUM(c) AS n_words, SUM(len(tok) * c) AS sum_len,
        |    COUNT(*) AS n_distinct, MAX(c) AS top_c,
        |    SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN c ELSE 0 END) AS n_stop
        |  FROM wc GROUP BY 1
        |), wts AS (SELECT * FROM read_parquet('$FullPrepWeightsPath/weights/*.parquet')),
        |gate AS (
        |  SELECT doc_id FROM agg CROSS JOIN wts
        |  WHERE 10000 * w_0 + LEAST(n_words, 1000) * 10 * w_1
        |      + ((sum_len * 10000) // n_words) * w_2
        |      + ((top_c * 10000) // n_words) * w_3
        |      + (((n_words - n_distinct) * 10000) // n_words) * w_4
        |      + ((n_stop * 10000) // n_words) * w_5 >= 500000000000
        |), q AS (SELECT clean.* FROM clean JOIN gate USING (doc_id)
        |), sp AS (SELECT * FROM read_parquet('$FullPrepSpansPath/*.parquet')),
        |ch AS (
        |  SELECT sp.doc_id, start, len, md5(substring(q.text, start + 1, len)) AS h
        |  FROM sp JOIN q USING (doc_id)
        |), fo AS (SELECT h, MIN(doc_id * 1000000000 + start) AS fkey FROM ch GROUP BY h),
        |st AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN doc_id * 1000000000 + start <> fkey THEN len ELSE 0 END) AS dup_chars,
        |    SUM(len) AS total_chars
        |  FROM ch JOIN fo USING (h) GROUP BY doc_id
        |), dd AS (
        |  SELECT q.* FROM q JOIN st USING (doc_id) WHERE dup_chars * 2 <= total_chars
        |), w2 AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM dd),
        |grams AS (
        |  SELECT doc_id, unnest(ws) AS gram FROM w2
        |  UNION ALL
        |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |                         FOR i IN generate_series(1, len(ws) - 1)]) AS gram
        |  FROM w2 WHERE len(ws) >= 2
        |), gb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(gram), 1, 8) AS BIGINT) % 1024 AS bucket
        |  FROM grams
        |), lr AS (SELECT bucket, lr_fp FROM read_parquet('$FullPrepRatiosPath/*.parquet')),
        |dw AS (
        |  SELECT doc_id, CAST(SUM(COALESCE(lr_fp, 0)) AS BIGINT) AS weight_fp
        |  FROM gb LEFT JOIN lr USING (bucket) GROUP BY 1
        |), gk AS (
        |  SELECT doc_id, gumbel_fp FROM read_parquet('$FullPrepGumbelPath/*.parquet')
        |), g AS (
        |  SELECT doc_id, weight_fp, weight_fp + gumbel_fp AS key_fp
        |  FROM dw JOIN gk USING (doc_id)
        |), topk AS (SELECT doc_id FROM g ORDER BY key_fp DESC, doc_id LIMIT 20)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  MIN(weight_fp) AS min_w, MAX(weight_fp) AS max_w
        |FROM dd JOIN g USING (doc_id) JOIN topk USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // the Bloom-skipped scan's rows must equal the plain lookup — the
    // no-false-negative serving guarantee of file-level data skipping
    "pipe_bloom_skip_verified" ->
      """SELECT CAST(probe AS BIGINT) AS probe, doc_id, lang, source
        |FROM (VALUES (1), (42), (123), (321), (999999999)) AS p(probe)
        |JOIN documents ON doc_id = probe
        |ORDER BY probe""".stripMargin,

    // recompute the CDC rewrite from the exported spans: first-occurrence
    // keep verdict, position-ordered reassembly, hash of the clean text
    "pipe_cdc_rewrite" ->
      s"""WITH sp AS (SELECT * FROM read_parquet('$CdcFixturePath/*.parquet')),
        |ch AS (
        |  SELECT sp.doc_id, start, len,
        |         substring(text, start + 1, len) AS chunk,
        |         md5(substring(text, start + 1, len)) AS h
        |  FROM sp JOIN documents USING (doc_id)
        |), f AS (
        |  SELECT h, MIN(doc_id * 1000000000 + start) AS fkey FROM ch GROUP BY h
        |)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN doc_id * 1000000000 + start = fkey THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(COALESCE(string_agg(chunk, '' ORDER BY start)
        |        FILTER (WHERE doc_id * 1000000000 + start = fkey), '')) AS clean_fp
        |FROM ch JOIN f USING (h)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // recompute the CDC downstream from the exported spans: md5 chunk
    // identity, first occurrence via the encoded (doc_id, start) key
    // (start < 1e9 makes the encoding order-equivalent to the struct
    // min), per-doc dedup stats
    "pipe_cdc_dedup" ->
      s"""WITH sp AS (SELECT * FROM read_parquet('$CdcFixturePath/*.parquet')),
        |ch AS (
        |  SELECT sp.doc_id, start, len,
        |         md5(substring(text, start + 1, len)) AS h
        |  FROM sp JOIN documents USING (doc_id)
        |), f AS (
        |  SELECT h, MIN(doc_id * 1000000000 + start) AS fkey FROM ch GROUP BY h
        |)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN doc_id * 1000000000 + start <> fkey THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN doc_id * 1000000000 + start <> fkey THEN len ELSE 0 END) AS BIGINT) AS dup_chars,
        |  CAST(SUM(len) AS BIGINT) AS total_chars
        |FROM ch JOIN f USING (h)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // full DSIR recompute: unigram+bigram grams, md5-prefix buckets,
    // add-one-smoothed bucket log ratios fixed-pointed to 1e4 (identical
    // double expression order as the Spark side, the LangModel recipe),
    // exact integer per-doc weight sums, md5-derived Gumbel keys, top-100
    "pipe_dsir_sample" ->
      s"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
        |), grams AS (
        |  SELECT doc_id, unnest(ws) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |                         FOR i IN generate_series(1, len(ws) - 1)]) AS gram
        |  FROM w WHERE len(ws) >= 2
        |), gb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(gram), 1, 8) AS BIGINT) % 4096 AS bucket
        |  FROM grams
        |), lr AS (SELECT bucket, lr_fp FROM read_parquet('$DsirRatiosPath/*.parquet')),
        |dw AS (
        |  SELECT doc_id, COUNT(*) AS n_feats,
        |    CAST(SUM(COALESCE(lr_fp, 0)) AS BIGINT) AS weight_fp
        |  FROM gb LEFT JOIN lr USING (bucket) GROUP BY 1
        |), gk AS (
        |  SELECT doc_id, gumbel_fp FROM read_parquet('$DsirGumbelPath/*.parquet')
        |), g AS (
        |  SELECT doc_id, n_feats, weight_fp, weight_fp + gumbel_fp AS key_fp
        |  FROM dw JOIN gk USING (doc_id)
        |), topk AS (SELECT doc_id FROM g ORDER BY key_fp DESC, doc_id LIMIT 100)
        |SELECT g.doc_id, n_feats, weight_fp, (t.doc_id IS NOT NULL) AS kept
        |FROM g LEFT JOIN topk t USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin,

    "pipe_column_stats" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map { c =>
        s"""SELECT '$c' AS "column", COUNT(*) AS n,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
           |  COUNT(DISTINCT $c) AS ndv,
           |  MIN(CAST($c AS VARCHAR)) AS min_s, MAX(CAST($c AS VARCHAR)) AS max_s
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),

    "pipe_pagerank" -> pagerankSql(5),

    "pipe_zorder3" ->
      s"""WITH base AS (
         |  SELECT event_id, user_id AS u, epoch_ms(ts) // 1000 AS sec,
         |    CAST(FLOOR(value * 100) AS BIGINT) AS v100
         |  FROM events),
         |b AS (SELECT MIN(u) AS minu, MAX(u) AS maxu, MIN(sec) AS mins,
         |  MAX(sec) AS maxs, MIN(v100) AS minv, MAX(v100) AS maxv FROM base),
         |scaled AS (SELECT event_id,
         |    (u - minu) * 65535 // GREATEST(maxu - minu, 1) AS xs,
         |    (sec - mins) * 65535 // GREATEST(maxs - mins, 1) AS ys,
         |    (v100 - minv) * 65535 // GREATEST(maxv - minv, 1) AS zs
         |  FROM base, b),
         |z AS (SELECT event_id, xs, ys, zs,
         |    (${spread3Sql("xs")} | (${spread3Sql("ys")} << 1) | (${spread3Sql("zs")} << 2)) AS zval
         |  FROM scaled),
         |t AS (SELECT xs, ys, zs, NTILE(32) OVER (ORDER BY zval, event_id) AS bucket FROM z)
         |SELECT bucket, COUNT(*) AS n,
         |  MIN(xs) AS min_x, MAX(xs) AS max_x, MIN(ys) AS min_y, MAX(ys) AS max_y,
         |  MIN(zs) AS min_z, MAX(zs) AS max_z
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "pipe_zorder" ->
      s"""WITH base AS (
         |  SELECT event_id, user_id AS u, epoch_ms(ts) // 1000 AS sec FROM events),
         |b AS (SELECT MIN(u) AS minu, MAX(u) AS maxu, MIN(sec) AS mins, MAX(sec) AS maxs FROM base),
         |scaled AS (SELECT event_id,
         |    (u - minu) * 65535 // GREATEST(maxu - minu, 1) AS xs,
         |    (sec - mins) * 65535 // GREATEST(maxs - mins, 1) AS ys
         |  FROM base, b),
         |z AS (SELECT event_id, xs, ys,
         |    (${spreadSql("xs")} | (${spreadSql("ys")} << 1)) AS zval FROM scaled),
         |t AS (SELECT xs, ys, NTILE(32) OVER (ORDER BY zval, event_id) AS bucket FROM z)
         |SELECT bucket, COUNT(*) AS n,
         |  MIN(xs) AS min_x, MAX(xs) AS max_x, MIN(ys) AS min_y, MAX(ys) AS max_y
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    // same scaling, then the generated 16-step xy2d loop instead of the
    // Morton bit spread
    "pipe_hilbert" ->
      s"""WITH base AS (
         |  SELECT event_id, user_id AS u, epoch_ms(ts) // 1000 AS sec FROM events),
         |b AS (SELECT MIN(u) AS minu, MAX(u) AS maxu, MIN(sec) AS mins, MAX(sec) AS maxs FROM base),
         |scaled AS (SELECT event_id,
         |    (u - minu) * 65535 // GREATEST(maxu - minu, 1) AS xs,
         |    (sec - mins) * 65535 // GREATEST(maxs - mins, 1) AS ys
         |  FROM base, b),
         |h_init AS (SELECT event_id, xs AS x, ys AS y, CAST(0 AS BIGINT) AS d FROM scaled),
         |${hilbertStepsSql("h_init")},
         |z AS (SELECT s.event_id, s.xs, s.ys, h15.d AS zval
         |      FROM scaled s JOIN h15 ON s.event_id = h15.event_id),
         |t AS (SELECT xs, ys, NTILE(32) OVER (ORDER BY zval, event_id) AS bucket FROM z)
         |SELECT bucket, COUNT(*) AS n,
         |  MIN(xs) AS min_x, MAX(xs) AS max_x, MIN(ys) AS min_y, MAX(ys) AS max_y
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "pipe_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                   FOR i IN generate_series(1, len(w) - 4)]) AS grams
        |  FROM t WHERE len(w) >= 5
        |), ge AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g
        |), bench AS (
        |  SELECT DISTINCT gram FROM ge WHERE doc_id % 20 = 0)
        |SELECT doc_id, COUNT(*) AS n_hits
        |FROM ge JOIN bench USING (gram)
        |WHERE doc_id % 20 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // two-table rendering of the dedup_substring seed-and-extend SQL
    "pipe_decontaminate_spans" ->
      """WITH wds AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), grams AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i - 1, 'gram': array_to_string(w[i:i+4], ' ')}
        |              FOR i IN generate_series(1, len(w) - 4)]) AS u
        |    FROM wds WHERE len(w) >= 5)
        |), ge AS (
        |  SELECT doc_id AS eval_id, pos AS pos_e, gram FROM grams WHERE doc_id % 20 = 0
        |), keptE AS (
        |  SELECT g.* FROM ge g JOIN (
        |    SELECT gram FROM ge GROUP BY gram HAVING COUNT(*) <= 1000) f USING (gram)
        |), gt AS (
        |  SELECT doc_id, pos AS pos_t, gram FROM grams WHERE doc_id % 20 <> 0
        |), m AS (
        |  SELECT t.doc_id, e.eval_id, t.pos_t, t.pos_t - e.pos_e AS diag
        |  FROM gt t JOIN keptE e USING (gram)
        |), isl AS (
        |  SELECT doc_id, eval_id, diag, pos_t,
        |         pos_t - ROW_NUMBER() OVER (PARTITION BY doc_id, eval_id, diag ORDER BY pos_t) AS island
        |  FROM m
        |), runs AS (
        |  SELECT doc_id, eval_id, diag, island, COUNT(*) AS run FROM isl GROUP BY 1,2,3,4
        |)
        |SELECT doc_id, eval_id, CAST(MAX(run) + 4 AS BIGINT) AS overlap_tokens
        |FROM runs GROUP BY 1, 2 HAVING MAX(run) + 4 >= 8
        |ORDER BY doc_id, eval_id""".stripMargin,

    "pipe_chunk_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[1+10*i : 10+10*i], ' ')
        |            FOR i IN generate_series(0, CAST(floor((len(w)-1)/10) AS INT))]) AS chunk
        |  FROM t
        |), s AS (
        |  SELECT chunk, 1 AS is_dup FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 1)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(COALESCE(is_dup, 0)) AS BIGINT) AS n_dup,
        |  FLOOR(CAST(SUM(COALESCE(is_dup, 0)) AS BIGINT) * 1000 / COUNT(*)) / 1000 AS dup_frac
        |FROM c LEFT JOIN s USING (chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // COALESCE on the reassembly: a fully-deduped doc must hash the empty
    // string (Spark's empty collect_list -> array_join -> ""), not NULL
    "pipe_intradoc_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS i,
        |    array_to_string(w[1+2*u.i : 2+2*u.i], ' ') AS chunk
        |  FROM t, UNNEST(generate_series(0, CAST(floor((len(w)-1)/2) AS INT))) AS u(i)
        |), r AS (
        |  SELECT doc_id, i, chunk,
        |    row_number() OVER (PARTITION BY doc_id, chunk ORDER BY i) AS rn
        |  FROM c)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY i), '')) AS clean_hash
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipe_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS i,
        |    array_to_string(w[1+10*u.i : 10+10*u.i], ' ') AS chunk
        |  FROM t, UNNEST(generate_series(0, CAST(floor((len(w)-1)/10) AS INT))) AS u(i)
        |), b AS (
        |  SELECT chunk, TRUE AS is_boiler FROM c
        |  GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  md5(COALESCE(string_agg(CASE WHEN is_boiler IS NULL THEN chunk END, ' ' ORDER BY i), '')) AS clean_hash
        |FROM c LEFT JOIN b USING (chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipe_mixture_sample" -> {
      val vals = (0 until 20).map(i => s"('src$i', ${i % 4 + 1}.0)").mkString(", ")
      s"""WITH wts(source, wt) AS (VALUES $vals),
         |cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
         |cap AS (SELECT MIN(n / wt) AS cap FROM cnt JOIN wts USING (source)),
         |k AS (SELECT source, CAST(FLOOR(wt * cap) AS BIGINT) AS k FROM wts, cap),
         |r AS (
         |  SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY md5(source || '#' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, source, rn FROM r JOIN k USING (source)
         |WHERE rn <= k ORDER BY doc_id""".stripMargin
    },

    "pipe_sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('graft-strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    // stratum stats -> integer N·σ weights -> integer allocation ->
    // salted-rank membership, all recomputed
    "pipe_sample_neyman" ->
      """WITH st AS (
        |  SELECT lang AS h, COUNT(*) AS n_h,
        |    SUM(x) AS sx, SUM(x * x) AS sxx
        |  FROM (SELECT doc_id, lang,
        |          CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS x
        |        FROM documents)
        |  GROUP BY 1
        |), w AS (
        |  SELECT h,
        |    CAST(FLOOR(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS w
        |  FROM st
        |), a AS (
        |  SELECT h, 100 * w // greatest((SELECT SUM(w) FROM w), 1) AS alloc FROM w
        |), r AS (
        |  SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('graft-neyman:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, rk
        |FROM r JOIN a ON a.h = r.lang
        |WHERE rk <= alloc
        |ORDER BY doc_id""".stripMargin,

    "pipe_sample_stratified_agg" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('graft-strat:' || CAST(doc_id AS VARCHAR)) DESC) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    "pipe_sample_temperature" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        |), m AS (SELECT MIN(cnt) AS minc FROM c),
        |t AS (
        |  SELECT lang, FLOOR(65536 * sqrt(CAST(minc AS DOUBLE) / cnt)) AS thr FROM c, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE CAST('0x' || substring(md5('graft-temp:' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS INTEGER) < thr
        |ORDER BY d.doc_id""".stripMargin,

    // the oracle states the two-level scheme's rank as its equivalent single
    // window: ORDER BY (salt, h, doc_id) — the engine realizes the same
    // order via local-rank + offset composition (see packBins)
    "pipe_pack_bins" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), ' +')) AS n_tokens,
        |    md5('graft-pack:' || CAST(doc_id AS VARCHAR)) AS h,
        |    least(floor(len(string_split_regex(trim(text), ' +')) / 8), 15) AS bucket
        |  FROM documents
        |), s AS (
        |  SELECT *, CAST('0x' || substring(h, 29, 4) AS INTEGER) % 32 AS salt FROM b
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY salt, h, doc_id) - 1 + bucket AS BIGINT) % 8 AS bin
        |  FROM s)
        |SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM r GROUP BY bin ORDER BY bin""".stripMargin,

    // NB window=512 is a power of two, so cum/512 divides exactly in both
    // engines' double arithmetic — floor never sits on a rounding edge
    "pipe_seq_pack" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), ' +')) AS n_tokens,
        |    md5('graft-seq:' || CAST(doc_id AS VARCHAR)) AS h,
        |    CAST('0x' || substring(md5('graft-seq:' || CAST(doc_id AS VARCHAR)), 29, 4) AS INTEGER) % 64 AS shard
        |  FROM documents
        |), c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM b
        |), s AS (
        |  SELECT shard, CAST(floor(cum_before / 512) AS BIGINT) AS seq_id, n_tokens FROM c)
        |SELECT shard, seq_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM s GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,

    "text_len_histogram" ->
      """SELECT least(CAST(floor(length(text) / 50) AS BIGINT), 11) AS bucket,
        |  COUNT(*) AS n_docs,
        |  MIN(length(text)) AS min_len, MAX(length(text)) AS max_len,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_len
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    // same four proven fragments, composed
    "pipe_dataset_card2" ->
      s"""${TextQueries.qualityScoredSql},
        |bys AS (
        |  SELECT score_fp,
        |    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM scored GROUP BY 1
        |), cum AS (
        |  SELECT n1, n0, COALESCE(SUM(n0) OVER (ORDER BY score_fp
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |  FROM bys
        |), auc AS (
        |  SELECT CASE WHEN SUM(n1) = 0 OR SUM(n0) = 0 THEN NULL ELSE
        |    CAST(FLOOR(CAST(SUM(n1 * cum0 * 2 + n1 * n0) AS DOUBLE) * 1000000.0 /
        |    (CAST(SUM(n1) AS DOUBLE) * SUM(n0) * 2.0)) AS BIGINT) END AS auc_ppm
        |  FROM cum
        |), lens AS (
        |  SELECT doc_id, CAST(LEN(string_split_regex(TRIM(text), ' +')) AS BIGINT) AS v
        |  FROM documents
        |), byv AS (
        |  SELECT v, CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM lens GROUP BY 1
        |), kcum AS (
        |  SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
        |  FROM byv
        |), ktot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM byv
        |), ks AS (
        |  SELECT CAST(FLOOR(CAST(MAX(ABS(cuma * nb - cumb * na)) AS DOUBLE) * 1000000.0 /
        |    (CAST(MAX(na) AS DOUBLE) * MAX(nb))) AS BIGINT) AS len_parity_ks_ppm
        |  FROM kcum CROSS JOIN ktot
        |), t2 AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
        |), g2 AS (
        |  SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                   FOR i IN generate_series(1, len(w) - 2)]) AS grams
        |  FROM t2 WHERE len(w) >= 3
        |), dups AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS neardup_pairs FROM (
        |    SELECT 1 FROM (
        |      SELECT len(list_intersect(a.grams, b.grams)) AS common,
        |        len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS union_sz
        |      FROM g2 a JOIN g2 b ON a.doc_id < b.doc_id)
        |    WHERE common * 2 >= union_sz)
        |), en AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN len(regexp_extract_all(lower(text),
        |      '\\b(the|and|of|to|in|is|for|with)\\b')) > 0 THEN 1 ELSE 0 END)
        |      * 1000000 // COUNT(*) AS BIGINT) AS en_share_ppm
        |  FROM documents)
        |SELECT en.n_docs, en.en_share_ppm, auc.auc_ppm, ks.len_parity_ks_ppm,
        |  dups.neardup_pairs,
        |  CAST(dups.neardup_pairs * 1000000 // en.n_docs AS BIGINT)
        |    AS neardup_pair_rate_ppm
        |FROM en CROSS JOIN auc CROSS JOIN ks CROSS JOIN dups""".stripMargin,

    "pipe_dataset_card" ->
      """SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS total_tokens,
        |  FLOOR(CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) * 10000 / COUNT(*)) / 10000 AS avg_tokens,
        |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
        |FROM documents""".stripMargin,

    // zero/empty-vector guard mirrors the native expression's semantics
    // ([0,0,0,0,0], no division): if(mx > 0, ...) on the quantize step and
    // COALESCE on the empty-list aggregates, so a degenerate vector in a
    // future corpus hashes identically instead of going NULL in DuckDB only
    "sim_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, v,
        |    COALESCE(list_max(list_transform(v, x -> abs(x))), 0) AS mx FROM e
        |), q AS (
        |  SELECT vec_id, v, mx,
        |    list_transform(v, x -> if(mx > 0, trunc(x * 127 / mx), 0)) AS qs FROM m)
        |SELECT vec_id,
        |  FLOOR(mx * 1000000) / 1000000 AS scale_mx,
        |  CAST(COALESCE(list_sum(qs), 0) AS BIGINT) AS sum_q,
        |  CAST(COALESCE(list_sum(list_transform(qs, y -> abs(y))), 0) AS BIGINT) AS sum_abs_q,
        |  CAST(len(list_filter(qs, y -> y <> 0)) AS BIGINT) AS n_nonzero,
        |  FLOOR(COALESCE(list_max([abs(v[i] - (qs[i] * mx) / 127)
        |                  FOR i IN generate_series(1, len(v))]), 0) * 10000000) / 10000000 AS max_err
        |FROM q ORDER BY vec_id""".stripMargin)
}
