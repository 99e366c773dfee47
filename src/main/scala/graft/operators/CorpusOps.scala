package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Public corpus-preparation API over "documents-shaped" DataFrames
 * (`doc_id: bigint`, `text: string`[, `lang: string`]) — the training-data
 * operators the query catalog exercises, promoted to a library surface so a
 * user can run them on their own tables (the same operator-as-API
 * discipline as [[AsofJoin]]/[[RangeJoin]]; the reference exposes its
 * operations to embedders the same way, flo-server/tests/embedded_tests.rs).
 *
 * The reusable kernels (gram/chunk explosion, salted two-level ranking)
 * LIVE here; the catalog queries in `graft.queries` delegate to this
 * object, so the DuckDB oracle checks cover the library path and the
 * dependency points one way (queries -> operators, never back).
 *
 * Every operator keeps the catalog's scale shape: one corpus-sized shuffle
 * on a high-cardinality or salted key, tiny side tables broadcast, id-only
 * pairs on heavy joins.
 */
object CorpusOps {

  /** Salt-group fan-out for the two-level window rewrites: 32 groups turn
    * one hot key into 32 shuffle partitions. */
  val DefaultSalts = 32

  /** Broadcast budget for the decontamination eval-gram set: ~50 MB at
    * ~50 B/gram — comfortably broadcastable; beyond it the join falls back
    * to a shuffle (eval sets are MBs in practice, but nothing enforces it). */
  val DefaultMaxBroadcastGrams = 1000000L

  /** Deterministic salt in [0, salts) carved from the TAIL of the md5 hex
    * (rank ORDER uses the hash from position 1, so head and tail stay
    * independent-ish; DuckDB oracles read the same lowercase hex). */
  private[graft] def saltCol(h: org.apache.spark.sql.Column, salts: Int) =
    pmod(conv(substring(h, 29, 4), 16, 10).cast("long"), lit(salts))

  /** Word 5-gram rows per doc, NOT deduplicated (callers dedupe where — and
    * only where — the plan needs it). */
  private[graft] def fiveGrams(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("w")) - 5)).as("i"), col("w"))
      .select(col("doc_id"),
        expr("concat(w[i],' ',w[i+1],' ',w[i+2],' ',w[i+3],' ',w[i+4])").as("gram"))

  /** Word g-gram rows WITH word positions: (doc_id, pos, gram), pos
    * 0-based, not deduplicated — [[substringDedup]] needs every occurrence
    * to extend runs through repeated text. */
  private[graft] def posGrams(documents: DataFrame, g: Int): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .filter(size(col("w")) >= g)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("w")) - g)).as("pos"), col("w"))
      .select(col("doc_id"), col("pos"),
        expr(s"concat_ws(' ', slice(w, pos + 1, $g))").as("gram"))

  /**
   * Substring-level exact dedup — the training-data-canonical "two docs
   * share a contiguous overlap of >= `minTokens` tokens" detector (doc- and
   * chunk-level hashing miss overlaps that straddle chunk boundaries or sit
   * inside otherwise-different docs). Seed-and-extend over word g-grams,
   * fully declarative: a shared substring of L tokens is EXACTLY a run of
   * L-g+1 consecutive shared g-grams on one (doc pair, pos_a - pos_b)
   * diagonal, so per-gram posting lists emit (pair, pos_a, diagonal) match
   * seeds and a gaps-and-islands pass per diagonal measures each run — no
   * per-pair alignment loop, no suffix array.
   *
   * Scale shape: the only corpus-sized shuffle groups gram occurrences;
   * pair emission is bounded by the per-gram occurrence cap (`maxGramOcc`,
   * the same quadratic-explosion guard as the n-gram Jaccard posting
   * join); the island windows partition by (pair, diagonal) — many small
   * partitions, never a per-doc or global sort.
   *
   * Cap semantics, stated honestly: an over-cap gram contributes NO match
   * rows, so a run that CONTAINS one splits at that point and the pair
   * reports the longest capped sub-run (conservative under-measurement; a
   * run made entirely of boilerplate reports nothing). The DuckDB oracle
   * applies the identical cap, so measured values still hash-match; raise
   * `maxGramOcc` when exact lengths through ultra-common grams matter
   * more than bounding the posting join.
   *
   * Returns (doc_a < doc_b, overlap_tokens = longest shared run) for pairs
   * at or above `minTokens`.
   */
  def substringDedup(
      docs: DataFrame,
      minTokens: Int,
      g: Int = 5,
      maxGramOcc: Int = 1000): DataFrame = {
    require(minTokens >= g, s"minTokens $minTokens must be >= gram size $g")
    val s = docs.sparkSession
    import s.implicits._
    val pairRows = posGrams(docs, g)
      .groupBy("gram").agg(collect_list(struct(col("doc_id"), col("pos"))).as("ps"))
      .filter(size(col("ps")) > 1 && size(col("ps")) <= maxGramOcc)
      .select("ps").as[Seq[(Long, Int)]]
      .mapPartitions(_.flatMap { ps =>
        for {
          i <- ps.indices.iterator
          j <- ps.indices
          if ps(i)._1 < ps(j)._1
        } yield (ps(i)._1, ps(j)._1, ps(i)._2, ps(i)._2 - ps(j)._2)
      })
      .toDF("doc_a", "doc_b", "pos_a", "diag")
    // one row per (pair, pos_a, diag) by construction (a position holds one
    // gram), so consecutive pos_a on a diagonal = one contiguous run
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    pairRows
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(count(lit(1)).as("run"))
      .groupBy("doc_a", "doc_b")
      .agg((max(col("run")) + lit(g - 1)).cast("long").as("overlap_tokens"))
      .filter(col("overlap_tokens") >= minTokens)
  }

  /**
   * Span-level benchmark decontamination — the canonical strong form:
   * training docs sharing a CONTIGUOUS run of >= `minTokens` tokens with
   * any eval doc, with the longest shared span measured exactly. The
   * gram-hit form ([[decontaminate]]) counts shared 5-grams and is the
   * cheap screen; this one answers "how much verbatim eval text leaked",
   * the evidence an actual removal decision wants. Same seed-and-extend
   * plan as [[substringDedup]], across two tables: positional eval grams
   * (occurrence-capped — boilerplate grams seed nothing; same cap
   * semantics as [[substringDedup]]: a run containing an over-cap gram
   * splits there and reports the longest sub-run) hash-join the train
   * gram stream, and gaps-and-islands per (train doc, eval doc, diagonal)
   * measures each run. The eval side is small by nature, so Spark
   * broadcasts it; train-side rows never shuffle before the join drops
   * the clean ~everything.
   *
   * Returns (doc_id = train doc, eval_id, overlap_tokens >= minTokens).
   */
  def decontaminateSpans(
      train: DataFrame,
      eval: DataFrame,
      minTokens: Int,
      g: Int = 5,
      maxEvalGramOcc: Int = 1000): DataFrame = {
    require(minTokens >= g, s"minTokens $minTokens must be >= gram size $g")
    val ge = posGrams(eval, g)
      .select(col("doc_id").as("eval_id"), col("pos").as("pos_e"), col("gram"))
    val keptE = ge.join(
      ge.groupBy("gram").agg(count(lit(1)).as("occ_e"))
        .filter(col("occ_e") <= maxEvalGramOcc).select("gram"), "gram")
    val m = posGrams(train, g).join(keptE, "gram")
      .select(col("doc_id"), col("eval_id"), col("pos").as("pos_t"),
        (col("pos") - col("pos_e")).as("diag"))
    val w = Window.partitionBy("doc_id", "eval_id", "diag").orderBy("pos_t")
    m.withColumn("island", col("pos_t") - row_number().over(w))
      .groupBy("doc_id", "eval_id", "diag", "island")
      .agg(count(lit(1)).as("run"))
      .groupBy("doc_id", "eval_id")
      .agg((max(col("run")) + lit(g - 1)).cast("long").as("overlap_tokens"))
      .filter(col("overlap_tokens") >= minTokens)
  }

  /** Non-overlapping n-word chunks per doc WITH their position index
    * (doc_id, i, chunk) — the positional base for the rewrite operators
    * ([[intraDocDedup]], [[boilerplateRemoval]]) that must reassemble
    * text in order. */
  private[graft] def docChunksPos(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("w")) - 1) / n).cast("int"))).as("i"), col("w"))
      .select(col("doc_id"), col("i"),
        expr(s"array_join(slice(w, 1 + $n*i, $n), ' ')").as("chunk"))

  /** Non-overlapping 10-word chunks per doc (the "lines" of a corpus whose
    * docs carry no newlines). */
  private[graft] def docChunks(documents: DataFrame): DataFrame =
    docChunksPos(documents, 10).select("doc_id", "chunk")

  /**
   * C4-style intra-document repetition removal: within each doc, a
   * repeated n-word chunk keeps only its FIRST occurrence, and the doc is
   * reassembled from the survivors in original order. Returns
   * (doc_id, n_chunks, n_kept, clean_text).
   *
   * One shuffle (doc_id, chunk) for the per-doc first-occurrence window,
   * then the per-doc reassembly rides the doc_id side of the same sort —
   * state is bounded by a single document everywhere, so the operator
   * scales linearly in corpus size with no cross-doc traffic at all.
   */
  def intraDocDedup(documents: DataFrame, chunkWords: Int = 2): DataFrame = {
    val w = Window.partitionBy("doc_id", "chunk").orderBy("i")
    docChunksPos(documents, chunkWords)
      .withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN rn = 1 THEN struct(i, chunk) END)), s -> s.chunk)"),
          " ").as("clean_text"))
  }

  /**
   * Cross-document boilerplate removal (the "shared line" C4 rule): an
   * n-word chunk appearing in at least `minDocs` DISTINCT documents is
   * boilerplate; every occurrence is dropped and each doc reassembled from
   * what remains. Returns (doc_id, n_chunks, n_boiler, clean_text).
   *
   * Scale shape: one shuffle on the chunk for the document-frequency
   * aggregate; the boilerplate set (df >= minDocs survivors) is tiny
   * relative to the corpus, so the join back is AQE-broadcast at any
   * realistic threshold — the corpus-sized chunk stream shuffles exactly
   * once more, on doc_id, for reassembly.
   */
  def boilerplateRemoval(
      documents: DataFrame, chunkWords: Int = 10, minDocs: Int = 2): DataFrame = {
    val chunks = docChunksPos(documents, chunkWords)
    val boiler = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= minDocs)
      .select(col("chunk"), lit(true).as("is_boiler"))
    chunks.join(boiler, Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN is_boiler IS NULL THEN struct(i, chunk) END)), s -> s.chunk)"),
          " ").as("clean_text"))
  }

  /**
   * Mixture rebalancing: deterministically sample each `source` down so
   * the OUTPUT follows the target weight ratios. The achievable total is
   * capped by the scarcest source (T = min over sources of n_s / w_s);
   * each source keeps k_s = floor(w_s * T) docs, chosen by salted-hash
   * rank so the sample is reproducible and shuffle-balanced. Sources
   * absent from `weights` are excluded.
   *
   * Scale shape: one corpus-sized aggregate for the per-source counts
   * (metadata-sized result), the k-table stays a broadcast join (never a
   * collect), and the ranking uses the same two-level salted window as
   * [[stratifiedSample]] — local rank within (source, salt) pre-filters
   * to k_s survivors per salt group (provably recall-complete: a global
   * top-k_s row is in its salt group's top k_s), so the dominant source
   * of a skewed corpus fans out over `salts` tasks instead of one.
   * Returns (doc_id, source, rn).
   */
  def mixtureSample(
      documents: DataFrame,
      weights: Map[String, Double],
      salts: Int = DefaultSalts): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val wts = weights.toSeq.toDF("source", "wt")
    val cap = documents.groupBy("source").agg(count(lit(1)).as("n"))
      .join(broadcast(wts), "source")
      .agg(min(col("n") / col("wt")).as("cap"))
    val ktab = wts.crossJoin(broadcast(cap))
      .select(col("source"), floor(col("wt") * col("cap")).cast("long").as("k"))
    val h = md5(concat(col("source"), lit("#"), col("doc_id").cast("string")))
    val base = documents.select(col("doc_id"), col("source"), h.as("h"))
      .join(broadcast(ktab), "source")
      .withColumn("salt", saltCol(col("h"), salts))
    val wLocal = Window.partitionBy("source", "salt").orderBy(col("h"), col("doc_id"))
    val wGlobal = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    base.withColumn("rs", row_number().over(wLocal))
      .filter(col("rs") <= col("k"))
      .withColumn("rn", row_number().over(wGlobal).cast("long"))
      .filter(col("rn") <= col("k"))
      .select(col("doc_id"), col("source"), col("rn"))
  }

  /** Salted-hash shard key for the pretraining shard plan: the md5 hex of
    * `graft-shard:<doc_id>` — a pure function of doc_id (stable under
    * repartitioning and incremental growth) that doubles as the
    * deterministic intra-shard order cursor. The ONE definition of the
    * sharding `pipe_shard_plan` ships — the scale drive and specs reuse it
    * so they can never measure a different sharding than the query. */
  def shardHash(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(concat(lit("graft-shard:"), docId.cast("string")))

  /** 16-way shard membership from a [[shardHash]] value: hex nibble at
    * 1-based position 2, as BIGINT 0..15. (The DuckDB oracle re-derives
    * the same nibble via a hex-digit position lookup.) */
  def shardNibble(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(h, 2, 1), 16, 10).cast("long")

  /** Exact-duplicate groups: one hash shuffle on the content hash.
    * Returns (text_hash, keep_id = min doc_id, n_copies). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Case/punctuation/whitespace-insensitive duplicate groups. */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs.groupBy(md5(norm).as("norm_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /**
   * Benchmark decontamination: training docs sharing at least one word
   * 5-gram with the eval corpus, with their distinct-hit counts.
   *
   * Broadcast guard without double work: the eval side is sized by its RAW
   * gram count (Σ max(tokens−4, 0) — one cheap no-explode aggregate), an
   * upper bound on the distinct gram count. Conservative by construction:
   * the guard can only fall back to a shuffle early, never broadcast an
   * oversized set — and the distinct gram set itself is built exactly once,
   * in the join. The corpus-side gram stream never shuffles before the join
   * filter drops the clean ~everything; (doc_id, gram) dedupe runs on the
   * rare survivors only.
   */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    val evalGramsUpper = eval
      .select(greatest(size(split(trim(col("text")), " +")) - 4, lit(0))
        .cast("long").as("n"))
      .agg(coalesce(sum("n"), lit(0L)))
      .collect().head.getLong(0)
    val evalGrams = fiveGrams(eval).select("gram").distinct()
    val evalSide =
      if (evalGramsUpper <= maxBroadcastGrams) broadcast(evalGrams) else evalGrams
    fiveGrams(train)
      .join(evalSide, "gram")
      .dropDuplicates("doc_id", "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /**
   * Connected components over an undirected pair table `(doc_a, doc_b)` —
   * turns pairwise near-dup verdicts into dedup GROUPS (keep one doc per
   * component). Hash-min label propagation: each round is ONE distributed
   * join+agg pushing the smallest known label across edges, O(cluster
   * diameter) rounds; convergence rides a `changed` flag carried through
   * each round's localCheckpoint (a cached scan, not a second join), and
   * each round frees the previous round's checkpoint blocks so block
   * storage stays O(1) in rounds. Returns (doc_id, component = min member
   * id, n_members). Drives Spark jobs eagerly; call from one thread.
   */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val und = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // materialize the edge cache BEFORE the first registry snapshot: its
    // internal cached RDD registers in sc.getPersistentRDDs only at first
    // materialization, and it must never land in a checkpoint id-diff below
    // (it would be freed after round 1 and every later round would rebuild
    // the whole edge pipeline from source)
    und.count()
    // Dataset.localCheckpoint persists its materialized RDD internally; the
    // handle isn't public API, so track it by diffing the persistent-RDD
    // registry around the (eager) checkpoint call
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var (labels, liveIds) = checkpointed(
      und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp")))
    var converged = false
    while (!converged) {
      val prop = und.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("p"))
      // labels only ever decrease, so "this round changed something"
      // ⟺ some propagated min undercuts the current label (p < comp)
      val (next, nextIds) = checkpointed(labels
        .join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("p"), col("comp"))).as("comp"),
          (coalesce(col("p"), col("comp")) < col("comp")).as("changed")))
      converged = next.filter(col("changed")).isEmpty
      free(liveIds)
      labels = next.drop("changed")
      liveIds = nextIds
    }
    und.unpersist()
    val w = Window.partitionBy("comp")
    labels.select(col("id").as("doc_id"), col("comp").as("component"),
      count(lit(1)).over(w).as("n_members"))
  }

  /** The dedup APPLY step: given the corpus and its near-dup pair table,
    * mark each doc kept or dropped — one canonical doc (the min id) per
    * connected component survives; docs in no component survive untouched.
    * Exact duplicates share all their shingles, so they land in components
    * too: this single rule is the whole keep-set. Returns
    * (doc_id, component = nullable cluster label, kept). */
  def dedupKeepSet(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs).select(col("doc_id"), col("component"))
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("component"),
        (col("component").isNull || col("component") === col("doc_id")).as("kept"))
  }

  /** The QUALITY-RANKED dedup apply step: keep the best-scoring doc per
    * near-dup cluster instead of [[dedupKeepSet]]'s min-id canonical —
    * the policy production pipelines actually run (keep the longest /
    * highest-quality near-duplicate, drop the rest). `scoreCol` must be a
    * column of `docs`; ties break to the LOWEST doc_id so the verdict is
    * deterministic. Returns (doc_id, component, <scoreCol>, kept);
    * `component` stays NULL for singletons (trivially kept).
    *
    * Plan shape: the same O(diameter)-round component labeling, then ONE
    * window over cluster-partitioned rows — clusters are near-dup groups
    * (small by construction), so the rank never sees corpus-sized
    * partitions; singletons rank alone under their own id. */
  def dedupKeepBest(
      docs: DataFrame, pairs: DataFrame, scoreCol: String): DataFrame = {
    val comp = connectedComponents(pairs).select(col("doc_id"), col("component"))
    docs.select(col("doc_id"), col(scoreCol))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(col("component"), col("doc_id")))
          .orderBy(col(scoreCol).desc, col("doc_id"))))
      .select(col("doc_id"), col("component"), col(scoreCol),
        (col("rk") === 1).as("kept"))
  }

  /** Per-doc duplicated-chunk stats (cross-document "line" dedup signal):
    * (doc_id, n_chunks, n_dup, dup_frac). One shuffle on the chunk hash —
    * the RefinedWeb/Gopher line-dedup plan. */
  def chunkDedupStats(documents: DataFrame): DataFrame = {
    val chunks = docChunks(documents)
    val shared = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1)
      .select(col("chunk"), lit(1L).as("is_dup"))
    chunks.join(shared, Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        (floor(col("n_dup") * lit(1000) / col("n_chunks")) / 1000).as("dup_frac"))
  }

  /** Stage 1 of the stratified sample: per-(lang, salt) top-k survivors —
    * a provably recall-complete skew pre-filter for the per-lang top-k
    * (any global top-k row is in its salt group's top k). Returns
    * (doc_id, lang, h) with at most k*salts rows per language. */
  private[graft] def stratifiedSurvivors(
      documents: DataFrame, k: Int, salts: Int): DataFrame = {
    val h = md5(concat(lit("graft-strat:"), col("doc_id").cast("string")))
    val base = documents.select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("salt", saltCol(col("h"), salts))
    val wLocal = Window.partitionBy("lang", "salt").orderBy(col("h"), col("doc_id"))
    base.withColumn("rs", row_number().over(wLocal))
      .filter(col("rs") <= k)
      .select("doc_id", "lang", "h")
  }

  /** Deterministic per-language top-k sample (skew-guarded — see
    * [[stratifiedSurvivors]] and PLANS.md). Returns (doc_id, lang, rn <= k). */
  def stratifiedSample(
      docs: DataFrame, k: Int = 20, salts: Int = DefaultSalts): DataFrame = {
    val surv = stratifiedSurvivors(docs, k, salts)
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    surv.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  // ---- MinHash+LSH near-dup stages (moved from the query catalog so the
  // operator is a public API; `dedup_minhash_lsh` and tools.Profile drive
  // these exact builders) ----

  private[graft] val MinhashH = 32 // signature length
  private[graft] val MinhashB = 8  // bands
  private[graft] val MinhashR = MinhashH / MinhashB

  /** (doc_id, band_idx, band_val) rows from the single-pass JVM signature
    * kernel — one loop per document, zero shuffle. */
  private[graft] def minhashBands(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    import graft.similarity.MinHashKernel
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val sig = MinHashKernel.signature(text, k = 5, h = MinhashH)
        MinHashKernel.bands(sig, MinhashB, MinhashR).zipWithIndex.map {
          case (bv, bi) => (id, bi, bv)
        }
      })
      .toDF("doc_id", "band_idx", "band_val")
  }

  /** Per-bucket collision cap default for the sketch band joins: a band
    * bucket is same-band-value docs, so over-cap buckets are exact- or
    * near-identical clusters LARGER than any test corpus (documents max
    * 5000 at sf0.1 — the default provably never binds there) that exact
    * dedup should collapse first; at 100 TB the cap bounds each bucket's
    * C(n,2) emission. Same honest semantics as `maxGramOcc` and the
    * embedding path's [[Ann.DefaultMaxBucket]]: over-cap buckets emit
    * nothing and surface in the audit frame. */
  val DefaultBandMaxBucket: Int = 8192

  /** Band-bucket collision cap shared by the minhash and simhash paths:
    * (bands rows with over-cap buckets removed, audit = one row per
    * over-cap (band_idx, band_val, n)). One extra hash aggregate over
    * the band rows; the audit side is collision-bounded, tiny. */
  private[graft] def capBandBuckets(
      bands: DataFrame, maxBucket: Int): (DataFrame, DataFrame) = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val sizes = bands.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("n"))
    val over = sizes.filter(col("n") > maxBucket)
    (bands.join(over.select("band_idx", "band_val"),
      Seq("band_idx", "band_val"), "left_anti"), over)
  }

  /** Distinct (doc_a < doc_b) pairs sharing at least one band value. */
  private[graft] def minhashCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Sorted distinct shingle hashes per doc (same kernel hash family as
    * the signatures, one pass per doc): (doc_id, shs). */
  private[graft] def shingleSets(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, graft.similarity.MinHashKernel.shingleHashes(text, k = 5))
      })
      .toDF("doc_id", "shs")
  }

  /** Shingle sets for CANDIDATE docs only (a semi join prunes the rest). */
  private[graft] def minhashShingleSets(documents: DataFrame, cand: DataFrame): DataFrame = {
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // candDocs is band-collision-bounded but NOT small-bounded (millions
    // of candidates at 100 TB) — let the optimizer pick broadcast vs
    // shuffle from its stats rather than forcing a broadcast
    shingleSets(documents.join(candDocs, "doc_id"))
  }

  /** Exact per-pair set stats over sorted-distinct LONG sets (doc_id,
    * shs): joins the sets onto id-only pairs and counts the two-pointer
    * intersection — the shared verify core of the minhash verified twin
    * and the LSH recall audit. Returns (doc_a, doc_b, common, union_sz),
    * unfiltered — callers apply their own threshold. */
  private[graft] def pairSetStatsLongs(
      cand: DataFrame, sets: DataFrame): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .as[(Long, Long, IndexedSeq[Long], IndexedSeq[Long])]
      .mapPartitions(_.map { case (a, b, sa, sb) =>
        val common = graft.similarity.MinHashKernel
          .intersectionSortedLongs(sa, sb).toLong
        (a, b, common, sa.size + sb.size - common)
      })
      .toDF("doc_a", "doc_b", "common", "union_sz")
  }

  /** [[pairSetStatsLongs]] over code-point-sorted STRING sets (doc_id,
    * grams) — the word-trigram-space verify core (SNM recall audit). */
  private[graft] def pairSetStatsStrings(
      cand: DataFrame, sets: DataFrame): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ga"), col("gb"))
      .as[(Long, Long, IndexedSeq[String], IndexedSeq[String])]
      .mapPartitions(_.map { case (a, b, ga, gb) =>
        val common = graft.similarity.MinHashKernel
          .intersectionSortedStrings(ga, gb).toLong
        (a, b, common, ga.size + gb.size - common)
      })
      .toDF("doc_a", "doc_b", "common", "union_sz")
  }

  /** Exact-jaccard verify (two-pointer JVM kernel — Catalyst
    * array_intersect is interpreted per pair and dominates when band
    * collisions number in the tens of thousands); keeps
    * jaccard >= threshold, rounded to 3 decimals. `setsA`/`setsB` supply
    * the two sides' shingle sets — the same table for the self-join dedup,
    * index vs batch tables for [[incrementalNearDup]]. */
  private[graft] def minhashVerify(
      cand: DataFrame, setsA: DataFrame, setsB: DataFrame,
      threshold: Double): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    cand
      .join(setsA.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shs", "sa"), "doc_a")
      .join(setsB.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shs", "sb"), "doc_b")
      // using-column joins reorder columns — re-select before the
      // positional tuple encoder
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .as[(Long, Long, IndexedSeq[Long], IndexedSeq[Long])]
      .mapPartitions(_.flatMap { case (a, b, sa, sb) =>
        val jac = graft.similarity.MinHashKernel.jaccardSortedLongs(sa, sb)
        if (jac >= threshold) Some((a, b, math.round(jac * 1000).toDouble / 1000))
        else None
      })
      .toDF("doc_a", "doc_b", "jaccard")
  }

  /**
   * SimHash near-duplicate pairs over any documents-shaped table
   * (`doc_id`, `text`): one 64-bit sketch per document (single-pass JVM
   * kernel), candidates from 16-bit band collisions (a pair within hamming
   * distance 3 must agree on at least one of the 4 bands — pigeonhole),
   * kept when `bit_count(a ^ b) <= maxHamming`. Returns
   * (doc_a < doc_b, hamming). Candidates carry only (id, sketch) — 16
   * bytes — through the band self-join.
   */
  def nearDupPairsSimhash(
      docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = DefaultBandMaxBucket): DataFrame =
    nearDupPairsSimhashAudited(docs, maxHamming, maxBucket)._1

  /** [[nearDupPairsSimhash]] with the dropped-band mass surfaced
    * ([[capBandBuckets]] semantics). */
  def nearDupPairsSimhashAudited(
      docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = DefaultBandMaxBucket): (DataFrame, DataFrame) = {
    // pigeonhole over 4 bands covers hamming <= 3 ONLY: 4+ differing bits
    // can spread across all four bands and never collide — reject rather
    // than silently under-recall
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit bands guarantee recall only for maxHamming <= 3, got $maxHamming")
    val s = docs.sparkSession
    import s.implicits._
    // pin the (doc_id, simhash) sketch — 16 bytes/doc: the band fan-out
    // below feeds the cap aggregate, its anti join, and both self-join
    // sides, each of which re-runs the per-doc kernel unpinned
    val sim = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, graft.similarity.MinHashKernel.simhash(text))
      })
      .toDF("doc_id", "simhash")
      .localCheckpoint(true)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band_idx"),
        expr(s"shiftright(simhash, ${16 * b}) & 65535").as("band_val")))
    val bandRows = sim.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_idx"), col("band.band_val"))
    val (bands, audit) = capBandBuckets(bandRows, maxBucket)
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    (pairs, audit)
  }

  /**
   * MinHash+LSH near-duplicate pairs over any documents-shaped table
   * (`doc_id`, `text`): zero-shuffle JVM signature kernel (32 hashes /
   * 8 bands over 5-shingles), band self-join carrying only id pairs,
   * exact-jaccard verify on semi-join-pruned candidates. Returns
   * (doc_a < doc_b, jaccard >= threshold). The candidate stage recalls
   * any pair agreeing on a full band; the verify makes precision exact.
   */
  def nearDupPairsMinhash(
      docs: DataFrame, threshold: Double = 0.5,
      maxBucket: Int = DefaultBandMaxBucket): DataFrame =
    nearDupPairsMinhashAudited(docs, threshold, maxBucket)._1

  /** [[nearDupPairsMinhash]] with the dropped-band mass surfaced:
    * (verified pairs, audit of over-cap (band_idx, band_val, n) buckets)
    * — the [[Ann.nearDupPairsCosineAudited]] accounting on the shingle
    * path. */
  def nearDupPairsMinhashAudited(
      docs: DataFrame, threshold: Double = 0.5,
      maxBucket: Int = DefaultBandMaxBucket): (DataFrame, DataFrame) = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // pins: the JVM signature kernel feeds the cap's size aggregate, the
    // cap's anti join, and both self-join sides (4 executions unpinned);
    // the candidate pairs feed the verify join AND both sides of the
    // shingle-set semi join; the candidate-bounded shingle sets feed the
    // verify twice. All three frames are narrow or candidate-bounded —
    // the corpus text itself is never pinned.
    val bandRows = minhashBands(docs).localCheckpoint(true)
    val (bands, audit) = capBandBuckets(bandRows, maxBucket)
    val cand = minhashCandidates(bands).localCheckpoint(true)
    val sets = minhashShingleSets(docs, cand).localCheckpoint(true)
    (minhashVerify(cand, sets, sets, threshold), audit)
  }

  /** The two index tables behind [[incrementalNearDup]] for one doc set:
    * (bands = (doc_id, band_idx, band_val), sets = (doc_id, shs)). A
    * continuous-ingestion pipeline persists these once for the historical
    * corpus and APPENDS each accepted micro-batch's tables — the index
    * grows with the stream instead of being rebuilt. */
  def minhashIndexTables(docs: DataFrame): (DataFrame, DataFrame) =
    (minhashBands(docs), shingleSets(docs))

  /**
   * Incremental near-dup for continuous ingestion — the streaming twin of
   * [[nearDupPairsMinhash]]. New docs (a micro-batch) LSH-probe the
   * ACCUMULATED band index via a stream-static hash join on
   * (band_idx, band_val): each new doc touches only its own band buckets,
   * never rescanning history, and the exact-jaccard verify reads historical
   * shingle sets for the COLLIDING candidates only. In-batch pairs (both
   * docs new) come from the same band self-join as the batch operator, so
   * replaying a corpus through micro-batches flags exactly the batch
   * operator's pairs — StreamingCorpusSpec pins that parity.
   *
   * Returns (doc_a < doc_b, jaccard) — the SAME orientation as the batch
   * operator, so replay output unions/compares cleanly even when a
   * historical id is larger than a new one. The caller appends
   * [[minhashIndexTables]] of each processed batch to the index afterwards
   * (typically from `foreachBatch`).
   */
  def incrementalNearDup(
      newDocs: DataFrame,
      indexBands: DataFrame,
      indexSets: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val nb = minhashBands(newDocs)
    val histCand = nb.as("n").join(indexBands.as("h"),
        col("n.band_idx") === col("h.band_idx") &&
          col("n.band_val") === col("h.band_val") &&
          // a re-delivered doc must not near-dup itself
          col("h.doc_id") =!= col("n.doc_id"))
      .select(col("h.doc_id").as("doc_a"), col("n.doc_id").as("doc_b"))
      .distinct()
    val newSets = shingleSets(newDocs)
    // re-orient to doc_a < doc_b AFTER the verify (whose set joins key
    // doc_a = index side, doc_b = batch side)
    val histPairs = minhashVerify(histCand, indexSets, newSets, threshold)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("jaccard"))
    histPairs.unionAll(nearDupPairsMinhash(newDocs, threshold))
  }

  /**
   * BM25 relevance ranking of a documents-shaped table (`doc_id`, `text`)
   * against a fixed bag of lowercase terms. Per-document term frequencies
   * (codegen regexp, word-boundary match) and length feed both the corpus
   * statistics (N, avgdl, per-term df — ONE aggregate row broadcast back)
   * and the scoring pass, so the pruned projection is scanned TWICE (the
   * regexp tf work runs in both passes): document rows never shuffle, the
   * top-k is a TakeOrderedAndProject, and scan-twice beats a corpus-sized
   * cache at the 100 TB target (same trade as packBins — persist `base`
   * yourself only when the corpus fits a storage tier). The idf is the
   * log-free rational form `(N - df + 0.5) / (df + 0.5)` — a MONOTONE
   * per-term transform of the classic idf, built from plain IEEE
   * arithmetic on integer-derived doubles so results are bit-reproducible
   * across engines (the `text_bm25` oracle relies on it). Note the
   * caveat: per-term order is preserved, but MULTI-term totals can order
   * documents differently than log-form BM25 (the rational form weights
   * rare terms more heavily) — scores here are self-consistent and
   * reproducible, not standard-BM25-comparable.
   * Returns (doc_id, tf_<term>..., dl, score) for the k best score > 0
   * docs, score descending, doc_id tiebreak.
   */
  /**
   * Distributed BPE merge training (the classic word-frequency
   * formulation): learn `numMerges` byte-pair merge rules from the corpus.
   * ONE corpus-sized pass builds the weighted distinct-word table — the
   * only shuffle that touches the corpus; every merge round then runs on
   * that VOCAB-sized side (weighted adjacent-pair counts -> argmax ->
   * apply), so 100 TB of text costs one word-count aggregation plus
   * `numMerges` jobs over a table bounded by |vocab|, not |corpus|. The
   * per-round argmax collects ONE row to the driver (metadata-sized, like
   * the engine's footer stats); ties break lexicographically so training
   * is deterministic. Words carry the classic `</w>` end marker, so merges
   * distinguish suffixes from mid-word pairs.
   *
   * The max pair count is non-increasing across rounds (a merge-created
   * pair inherits at most its creator's count; existing pairs only lose) —
   * PipelineSpec pins this invariant plus a hand-computed merge sequence.
   * Returns (rank, left, right, merged, pair_count), rank 0-based in merge
   * order; stops early when no pair repeats. The vocab-side symbol rewrite
   * is a typed map on the distinct-word table — a Scala lambda confined to
   * the vocab side, same discipline as the media codec kernels (never the
   * corpus hot path).
   */
  def bpeTrain(docs: DataFrame, numMerges: Int): DataFrame =
    bpeTrainStates(docs, numMerges)._1

  /**
   * [[bpeTrain]] plus the per-round VOCAB STATES it derived each merge
   * from: the second DataFrame is (merge_round, syms, n) — the weighted
   * distinct-word symbol table as it stood BEFORE round r's argmax. The
   * states are the `text_bpe_merges_verified` fixture: pair counting and
   * argmax selection over an exported state are plain relational algebra
   * (adjacent-pair explode -> weighted count -> top-1 by (count, pair)),
   * so both engines can recompute every round's selection from identical
   * bits while the iterative state REWRITE stays on PipelineSpec's
   * hand-computed bars. States are vocab-sized x rounds — never
   * corpus-sized.
   */
  def bpeTrainStates(docs: DataFrame, numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val s = docs.sparkSession
    import s.implicits._
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    var vocab: org.apache.spark.sql.Dataset[(Seq[String], Long)] =
      words.as[(String, Long)]
        .map { case (w, n) => ((w.map(_.toString) :+ "</w>"): Seq[String], n) }
        .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val states = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = vocab.flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n)) }
        .toDF("a", "b", "n")
        .groupBy("a", "b").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < 2) done = true
      else {
        val (a, b) = (top.head.getAs[String]("a"), top.head.getAs[String]("b"))
        states += vocab.toDF("syms", "n")
          .select(lit(rank).as("merge_round"), col("syms"), col("n"))
        merges += ((rank, a, b, top.head.getAs[Long]("cnt")))
        vocab = vocab.map { case (syms, n) => (applyMerge(syms, a, b), n) }
          .localCheckpoint(true) // truncate the per-round lineage
        rank += 1
      }
    }
    val mergesDf = merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
    val statesDf =
      if (states.isEmpty)
        Seq.empty[(Int, Seq[String], Long)].toDF("merge_round", "syms", "n")
      else states.reduce(_.unionAll(_))
    (mergesDf, statesDf)
  }

  /**
   * Real-vocab BPE training: the SAME merge sequence as [[bpeTrain]] /
   * [[bpeTrainStates]] — spec-proven equal, including tie-breaks and the
   * count-&lt;-2 early stop — computed with ONE Spark job total instead of
   * one job plus one driver round-trip per merge. The corpus-sized work is
   * unchanged (a single weighted distinct-word aggregation), but that
   * table is vocab-bounded, so it is collected ONCE and the merge loop
   * runs in-process with incremental pair statistics (the classic
   * learn_bpe formulation, Sennrich et al. 2016): a pair → unit-index map
   * keeps each round's rewrite O(affected words), and a lazy-deletion
   * heap keeps the argmax O(log heap) instead of a scan of every pair.
   * At the catalog's 12 merges the distributed loop is fine; at a real
   * 32–50k-merge vocab it schedules 50k Spark jobs — hours of pure
   * scheduler overhead — while this loop finishes in seconds
   * ([[graft.tools.BpeScaleDrive]] records the 32k-merge figure).
   *
   * Tie-break parity: the distributed argmax orders by Spark StringType
   * comparison (UTF8 binary = code-point order), so the heap comparator
   * uses [[graft.similarity.MinHashKernel.codePointCompare]], never
   * `String.compareTo` (they diverge on supplementary-plane symbols).
   */
  def bpeTrainFast(docs: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val s = docs.sparkSession
    import s.implicits._
    val units = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .collect()
      .map { case (w, n) => ((w.map(_.toString) :+ "</w>").toArray, n) }
    val merges = bpeMergeLoop(units, numMerges)
    merges.toDF("rank", "left", "right", "pair_count")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Heap row for [[bpeMergeLoop]]'s lazy-deletion argmax. */
  private final case class BpePairEntry(cnt: Long, a: String, b: String)

  /**
   * The in-process incremental BPE merge loop shared by [[bpeTrainFast]]
   * and [[graft.tools.BpeScaleDrive]]: `units` are (symbol array, weight)
   * rows — read once at entry; the caller's arrays are never mutated.
   * Returns (rank, left, right, pair_count) in merge order, stopping
   * early when the best pair's weighted count drops below 2 (the same
   * rule as the distributed loop).
   *
   * Bookkeeping invariants: `stats` holds the exact current weighted
   * count of every adjacent pair (zero entries removed); `where(p)` is
   * exactly the set of unit indexes where `p` currently occurs; the heap
   * holds one entry per (pair, value) a count has ever taken, and a
   * popped entry is acted on only if its value matches `stats` — a pair
   * whose count changed since the push has a fresher entry deeper in the
   * heap, and a merged-away pair has no `stats` row at all, so stale
   * tops skip harmlessly. Per-round cost is O(Σ affected unit lengths +
   * changed-pairs · log heap); total pushes are bounded by total rewrite
   * work, so the heap never dominates.
   */
  private[graft] def bpeMergeLoop(
      units: Array[(Array[String], Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    import graft.similarity.MinHashKernel.codePointCompare
    val syms = units.map(_._1)
    val weight = units.map(_._2)
    val stats = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val cmp = new java.util.Comparator[BpePairEntry] {
      def compare(x: BpePairEntry, y: BpePairEntry): Int = {
        val c = java.lang.Long.compare(y.cnt, x.cnt)
        if (c != 0) c
        else {
          val ca = codePointCompare(x.a, y.a)
          if (ca != 0) ca else codePointCompare(x.b, y.b)
        }
      }
    }
    val heap = new java.util.PriorityQueue[BpePairEntry](1024, cmp)
    var i = 0
    while (i < syms.length) {
      val arr = syms(i)
      var j = 0
      while (j < arr.length - 1) {
        val p = (arr(j), arr(j + 1))
        stats(p) = stats.getOrElse(p, 0L) + weight(i)
        where.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
      i += 1
    }
    stats.foreach { case ((a, b), c) => heap.add(BpePairEntry(c, a, b)) }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      var top: BpePairEntry = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (e.cnt >= 2 && stats.getOrElse((e.a, e.b), 0L) == e.cnt) top = e
        else if (e.cnt < 2) { heap.clear() } // max < 2: nothing left to learn
      }
      if (top == null) done = true
      else {
        val (a, b) = (top.a, top.b)
        merges += ((rank, a, b, top.cnt))
        // rewrite ONLY the units that contain (a, b); exact subtract/re-add
        // of each touched unit's pair multiset keeps stats/where precise
        // through every greedy-overlap corner ("a a a", merge-created
        // adjacencies, pairs vanishing entirely)
        val before = mutable.HashMap.empty[(String, String), Long]
        def bump(p: (String, String), d: Long): Unit = {
          if (!before.contains(p)) before(p) = stats.getOrElse(p, 0L)
          val nv = stats.getOrElse(p, 0L) + d
          if (nv == 0L) stats.remove(p) else stats(p) = nv
        }
        val affected = where.getOrElse((a, b), mutable.HashSet.empty).toArray
        java.util.Arrays.sort(affected)
        affected.foreach { u =>
          val old = syms(u)
          val w = weight(u)
          val oldPairs = mutable.HashSet.empty[(String, String)]
          var j = 0
          while (j < old.length - 1) {
            val p = (old(j), old(j + 1)); bump(p, -w); oldPairs += p; j += 1
          }
          oldPairs.foreach(p => where.get(p).foreach(_ -= u))
          val next = applyMerge(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(old), a, b).toArray
          syms(u) = next
          val newPairs = mutable.HashSet.empty[(String, String)]
          j = 0
          while (j < next.length - 1) {
            val p = (next(j), next(j + 1)); bump(p, w); newPairs += p; j += 1
          }
          newPairs.foreach(p =>
            where.getOrElseUpdate(p, mutable.HashSet.empty) += u)
        }
        before.foreach { case (p, old) =>
          val now = stats.getOrElse(p, 0L)
          if (now != old && now > 0L) heap.add(BpePairEntry(now, p._1, p._2))
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Greedy left-to-right single-pass rewrite of one merge rule — the
    * standard BPE step, shared verbatim between training ([[bpeTrain]]'s
    * per-round vocab rewrite) and encoding ([[bpeEncode]]) so the two can
    * never drift: an encoder applying a different pass discipline than the
    * trainer produces tokens the learned vocabulary doesn't contain. */
  private[graft] def applyMerge(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** One word through the full rank-ordered merge list (chars + `</w>`,
    * then each rule once in training order — [[applyMerge]] discipline).
    * O(rules · len): the equality ORACLE for [[encodeWordFast]], fine at
    * catalog rule counts, quadratic waste at a real 32k-rule vocab. */
  private[graft] def encodeWord(
      w: String, rules: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString) :+ "</w>"
    rules.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }

  /**
   * Rank-priority encoding — the production encoder for REAL rule
   * tables: repeatedly apply the lowest-rank merge PRESENT in the word
   * (one ranks lookup per adjacent pair per round) instead of walking
   * all R rules. O(len² · lookup) per word, independent of R — at 32k
   * rules the sequential walk does 32k passes per word for the ~len
   * that can apply.
   *
   * Provably equal to [[encodeWord]] (BpeFastSpec pins it on random
   * words × real trained tables): when the sequential walk reaches rank
   * r, every pair of rank &lt; r is exhausted and — the no-recreation
   * invariant, asserted by PipelineSpec — no later merge can re-create
   * an earlier rule's adjacency (merging two symbols into a NEW symbol
   * never makes two pre-existing symbols adjacent). So the min-rank
   * present pair IS the next rule the sequential walk would apply, and
   * both apply it with the same greedy [[applyMerge]] pass.
   */
  private[graft] def encodeWordFast(
      w: String, rankOf: collection.Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString) :+ "</w>"
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        rankOf.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < best) { best = r; bestA = syms(i); bestB = syms(i + 1) }
        }
        i += 1
      }
      if (bestA == null) done = true
      else syms = applyMerge(syms, bestA, bestB)
    }
    syms
  }

  /**
   * The APPLY step of the tokenizer pair — encode every distinct word with
   * the rank-ordered merge table [[bpeTrain]] learned, weighted by corpus
   * frequency. Returns the encoded VOCABULARY (word, n, tokens): one row
   * per distinct word with its corpus count and its BPE token sequence —
   * the table every downstream tokenizer consumer (token frequencies,
   * per-doc lengths) joins against, so the corpus-sized pass stays a
   * word-count aggregation and the iterative merge rewrite runs once per
   * DISTINCT word, not once per occurrence.
   *
   * The merge table is `numMerges` rows — metadata-sized, collected to the
   * driver in rank order and shipped in the task closure (same discipline
   * as bpeTrain's per-round argmax row). The per-word encode is a Scala
   * lambda confined to the vocab-sized side, never the corpus hot path.
   *
   * PipelineSpec pins: a hand-computed encode, the round-trip property
   * (tokens concatenate back to `word</w>`), and the no-residual-pair
   * invariant (no adjacent token pair in any encoded word equals a learned
   * merge — every rule was applied to exhaustion in rank order, and later
   * merges cannot re-create an earlier rule's adjacency because merging
   * two symbols into a NEW symbol never makes two pre-existing symbols
   * adjacent).
   */
  def bpeEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // rank map in the task closure: rules-table-sized (the same rows the
    // sequential walk would carry), but each word now touches only the
    // rules PRESENT in it — [[encodeWordFast]]'s contract
    val rankOf: Map[(String, String), Int] = merges
      .select("rank", "left", "right").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")) ->
        r.getAs[Int]("rank")).toMap
    docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (w, n, encodeWordFast(w, rankOf)) }
      .toDF("w", "n", "tokens")
  }

  /**
   * Per-document BPE token counts: each doc's word stream joined against
   * the [[bpeEncode]] vocabulary's token LENGTHS. The vocab side carries
   * (word, token_count) only — at natural-language scale it is millions of
   * short rows, so the join broadcasts (AQE would pick the same plan; the
   * hint makes it deliberate). Returns (doc_id, n_words, n_tokens).
   */
  def bpeDocLengths(docs: DataFrame, merges: DataFrame): DataFrame = {
    val vocab = bpeEncode(docs, merges)
      .select(col("w"), size(col("tokens")).cast("long").as("word_tokens"))
    docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(vocab), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("word_tokens").as("n_tokens"))
  }

  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 50,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase alphanumeric words, got: ${terms.mkString(", ")}")
    val base = docs.select(
      col("doc_id") +:
        terms.map(t =>
          regexp_count(col("text"), lit("\\b" + t + "\\b")).cast("long").as(s"tf_$t")) :+
        size(split(trim(col("text")), " +")).cast("long").as("dl"): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl") +:
        terms.map(t => sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).as(s"df_$t")): _*)
    def termScore(t: String): org.apache.spark.sql.Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+ col("dl") :+
        terms.map(termScore).reduce(_ + _).as("score"): _*)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /**
   * Exactly-k-per-language sampling through the bounded-heap aggregate
   * ([[TopK.topKPerKey]] / `graft_topk`): no window, no skew pre-filter —
   * a language holding 60% of the corpus costs the same O(k) heap per task
   * as a rare one, so the plan is skew-immune by construction where the
   * window variant needs [[stratifiedSurvivors]]'s pre-filter. Rank is the
   * salted md5 DESCENDING (a different but equally arbitrary deterministic
   * order than [[stratifiedSample]]'s ascending rank — both are stable
   * under repartitioning and corpus growth of OTHER languages).
   */
  def stratifiedSampleTopK(docs: DataFrame, k: Int = 20): DataFrame = {
    val h = md5(concat(lit("graft-strat:"), col("doc_id").cast("string")))
    TopK.topKPerKey(docs.select(col("doc_id"), col("lang"), h.as("h")),
        Seq("lang"), col("h"), Seq("doc_id"), k)
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  /**
   * Size-balanced shard packing via salted two-level ranking. The
   * per-bucket round-robin rank is `row_number() over (partition by bucket
   * ORDER BY salt, h, doc_id)`, realized scalably as: rank within
   * (bucket, salt) — the only corpus-sized shuffle, fanned out over
   * salts*buckets groups — plus an exclusive running offset of the tiny
   * per-(bucket, salt) counts. The bucket-rotated mod-`nBins` bin keeps
   * remainder docs from piling into bin 0 across strata. Returns
   * (bin, n_docs, total_tokens).
   *
   * The counts branch is a map-side partial aggregation straight off the
   * (2-column, pruned) source scan — the corpus is read twice but shuffled
   * and window-sorted ONCE. Deriving the counts from the ranked output
   * instead would dedupe the scan only if AQE reused the ranking exchange,
   * and it measurably does not: column pruning gives the two consumers
   * different projections (the counts don't need n_tokens), so the
   * exchanges never canonicalize equal and the window+sort runs twice —
   * a second pruned scan is strictly cheaper than a second corpus sort.
   * Caching `base` trades a corpus-sized cache for the extra scan and is
   * the wrong default at 100 TB.
   */
  def packBins(
      documents: DataFrame, nBins: Int = 8, salts: Int = DefaultSalts): DataFrame = {
    val nTok = size(split(trim(col("text")), " +"))
    val h = md5(concat(lit("graft-pack:"), col("doc_id").cast("string")))
    val base = documents.select(col("doc_id"), nTok.as("n_tokens"), h.as("h"))
      .withColumn("bucket", least(floor(col("n_tokens") / 8), lit(15)))
      .withColumn("salt", saltCol(col("h"), salts))
    val wLocal = Window.partitionBy("bucket", "salt").orderBy(col("h"), col("doc_id"))
    val ranked = base.withColumn("rs", row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy("bucket").orderBy("salt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket", "salt").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select("bucket", "salt", "off")
    ranked.join(broadcast(offsets), Seq("bucket", "salt"))
      .withColumn("bin",
        pmod(col("off") + col("rs") - 1 + col("bucket"), lit(nBins)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
  }

  /** Fixed-window sequence-packing audit (training sequences of `window`
    * tokens, greedy in salted-hash order within uniformly-hashed shards —
    * shard count is a free parallelism knob on an unskewable key). Returns
    * (shard, seq_id, n_docs, total_tokens). Powers of two make the
    * cumulative-offset division fp-exact; prefer them for `window`. */
  def seqPack(
      documents: DataFrame, window: Int = 512, shards: Int = 64): DataFrame = {
    val nTok = size(split(trim(col("text")), " +"))
    val h = md5(concat(lit("graft-seq:"), col("doc_id").cast("string")))
    val base = documents.select(col("doc_id"), nTok.as("n_tokens"), h.as("h"))
      .withColumn("shard", saltCol(col("h"), shards))
    val wCum = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wCum), lit(0)))
      .withColumn("seq_id", floor(col("cum_before") / window))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
  }

  /**
   * PageRank over the co-chunk document graph, in 64-bit FIXED-POINT so
   * every engine computes bit-identical ranks (floating-point PageRank is
   * summation-order-dependent; integer sums are not). Ranks carry 1e9
   * units = 1.0; each iteration is `pr' = 0.15 + 0.85 * Σ pr/outdeg`
   * with integer division throughout (both engines truncate identically
   * on non-negatives).
   *
   * Graph: docs are linked when they share a 10-word chunk (the dedup
   * signal re-used as an authority signal — the web-graph analogue for a
   * corpus with no hyperlinks; highly-replicated boilerplate is df-capped
   * out at `maxChunkDocs`, the same guard as the n-gram dedup path, which
   * also bounds pair fan-out to df² per chunk). Scale shape per
   * iteration: ranks⋈edges on src (edges carry outdeg pre-joined, built
   * once), one shuffle grouping contributions by dst, one node-sized left
   * join — the corpus text is never touched after edge extraction. At
   * cluster scale, checkpoint ranks every few iterations to cut lineage
   * (same discipline as [[connectedComponents]]'s one-job-per-round).
   *
   * Dangling/isolated docs take the base rank 0.15 and contribute
   * nothing, matching the usual convention. Returns (doc_id, pr).
   */
  def docGraphPageRank(
      documents: DataFrame,
      iterations: Int = 5,
      maxChunkDocs: Int = 50): DataFrame = {
    val Scale = 1000000000L
    val Base = 150000000L // 0.15 * Scale
    val chunks = docChunks(documents).distinct()
    val keep = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df").between(2, maxChunkDocs))
      .select("chunk")
    val kept = chunks.join(keep, "chunk")
    val pairs = kept.as("a").join(kept.as("b"), "chunk")
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // the edge table feeds EVERY iteration; materialize it once or the
    // final plan re-derives chunks + self-join + distinct per round
    // (measured 4x on the bench query). Same lineage-truncation pattern
    // as connectedComponents' per-round checkpoint.
    val edges = pairs.join(
        pairs.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    val nodes = documents.select("doc_id")
    var ranks = nodes.withColumn("pr", lit(Scale))
    for (_ <- 1 to iterations) {
      val sums = edges.join(ranks, edges("src") === ranks("doc_id"))
        .select(col("dst").as("doc_id"), expr("pr div outdeg").as("c"))
        .groupBy("doc_id").agg(sum("c").as("s"))
      ranks = nodes.join(sums, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(Base) + expr("85 * coalesce(s, 0L) div 100")).as("pr"))
    }
    ranks.orderBy("doc_id")
  }

  /**
   * EXACT heavy hitters without shuffling the vocabulary: the classic
   * two-pass sketch-then-recount plan. Pass 1 runs the Misra–Gries
   * aggregate [[graft.expressions.MisraGries]] (`graft_heavy_hitters`)
   * over the token stream — O(k) state per partition, at most k counters
   * shipped to one reducer, the billions-of-keys vocabulary never
   * shuffles — and counts n exactly in the same aggregate (one scan).
   * Pass 2 recounts ONLY the sketch's candidates (a broadcast semi join,
   * ≤ k keys in the shuffle) and filters `cnt * denom >= n`.
   *
   * Exactness argument: MG guarantees every item with true frequency
   * > n/(k+1) is in the candidate set; with k+1 > denom the threshold
   * n/denom is strictly above the guarantee line, so no qualifying token
   * can be missed, and the exact recount removes any false positives.
   * The result is bit-identical to the full-vocabulary GROUP BY plan at
   * a fraction of its shuffle. Returns (tok, cnt) sorted by cnt desc.
   */
  /**
   * Overlapping passage windows for retrieval indexing (the RAG prep
   * step): stride-spaced `window`-word slices per document, trailing
   * windows clamping at the doc end. Returns (doc_id, pas_idx, text) —
   * one in-scan explode, no shuffle; the passage table then feeds any
   * documents-shaped operator ([[bm25]] for passage retrieval,
   * [[hashedTfidf]] for passage vectors).
   */
  def passages(
      documents: DataFrame, window: Int = 32, stride: Int = 16): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    documents.select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("w")) - 1) / stride).cast("int"))).as("pas_idx"),
        col("w"))
      .select(col("doc_id"), col("pas_idx"),
        expr(s"array_join(slice(w, 1 + $stride * pas_idx, $window), ' ')")
          .as("text"))
  }

  /**
   * Triangle counting over the co-chunk document graph (the cohesion
   * metric complementing [[docGraphPageRank]]'s centrality): undirected
   * edges orient low-id → high-id, and triangles close through the
   * canonical e(a,b) ⋈ e(b,c) ⋈ e(a,c) join with a &lt; b &lt; c, so each
   * triangle counts exactly once. Returns (doc_id, triangles) for every
   * doc in at least one triangle.
   *
   * Scale shape: the same df-capped co-chunk edge derivation as pagerank
   * (a chunk shared by more than `maxChunkDocs` docs never becomes
   * edges), the edge table materializes ONCE and feeds all three join
   * legs, and every join keys on node ids. The classic degree-ordering
   * refinement (orient edges from low- to high-degree instead of by id)
   * drops the worst-case wedge fan-out on power-law graphs; the df cap
   * already bounds degree here, so id orientation suffices.
   */
  def docGraphTriangles(
      documents: DataFrame, maxChunkDocs: Int = 50): DataFrame = {
    val chunks = docChunks(documents).distinct()
    val keep = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df").between(2, maxChunkDocs))
      .select("chunk")
    val kept = chunks.join(keep, "chunk")
    val edges = kept.as("a").join(kept.as("b"), "chunk")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
      .distinct()
      .localCheckpoint(true) // feeds three join legs — derive once
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
  }

  /**
   * Corpus snapshot diff (the data-versioning primitive): per doc_id,
   * compare content hashes across two corpus versions and classify as
   * added / removed / changed / unchanged. ONE full-outer hash join on
   * doc_id carrying 16-byte digests, never text — the cheapest possible
   * shape at any scale. Returns (doc_id, status).
   */
  def corpusDiff(before: DataFrame, after: DataFrame): DataFrame =
    before.select(col("doc_id"), md5(col("text")).as("h_before"))
      .join(after.select(col("doc_id"), md5(col("text")).as("h_after")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_before").isNull, "added")
          .when(col("h_after").isNull, "removed")
          .when(col("h_before") =!= col("h_after"), "changed")
          .otherwise("unchanged").as("status"))

  def heavyHitters(
      documents: DataFrame, k: Int = 1000, denom: Int = 500): DataFrame = {
    require(k + 1 > denom,
      s"heavyHitters: need k+1 > denom for the MG guarantee, got k=$k denom=$denom")
    graft.expressions.GraftExtensions.register(documents.sparkSession)
    val tokens = documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(length(col("tok")) >= 2)
    val sketch = tokens.agg(
      call_function("graft_heavy_hitters", col("tok"), lit(k)).as("cand"),
      count(lit(1)).as("n"))
    val candidates = sketch
      .select(explode(col("cand")).as("c"), col("n"))
      .select(col("c.item").as("tok"), col("n"))
    tokens
      .join(broadcast(candidates.select("tok")), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .join(broadcast(candidates), Seq("tok"))
      .filter(col("cnt") * denom >= col("n"))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /**
   * RefinedWeb-style exact span ("line") dedup with KEEP-FIRST semantics:
   * a span seen anywhere earlier in the corpus (global (doc_id, position)
   * order) is removed from every later position; only the first
   * occurrence survives. This is the third rewrite semantics next to
   * [[intraDocDedup]] (first-per-DOC) and [[boilerplateRemoval]] (drop
   * ALL occurrences of over-shared chunks) — the one RefinedWeb/
   * MassiveText apply to newline-split lines. Spans here are
   * non-overlapping `spanWords`-word windows (the synthetic corpus
   * carries no newline structure; the pipeline is span-source-agnostic —
   * LineDedupSpec drives the same downstream over regex-split lines).
   * Returns (doc_id, n_spans, n_kept, clean_text).
   *
   * Scale shape: first occurrences come from a map-side-combining
   * min(struct(doc_id, i)) aggregate on the span — the hot spans that
   * motivate the operator collapse in the partial aggregate instead of
   * queueing on one window reducer — then one shuffle join on the span
   * marks keepers and one doc_id shuffle reassembles. No window over a
   * data-dependent-cardinality key anywhere.
   */
  def lineDedup(documents: DataFrame, spanWords: Int = 8): DataFrame =
    lineDedupSpans(docChunksPos(documents, spanWords))

  /** The span-source-agnostic downstream of [[lineDedup]]: `spans` is any
    * (doc_id, i, chunk) table (word windows, regex-split lines, …). */
  private[graft] def lineDedupSpans(spans: DataFrame): DataFrame = {
    val firsts = spans.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("i"))).as("f"))
      .select(col("chunk"), col("f.doc_id").as("f_doc"), col("f.i").as("f_i"))
    spans.join(firsts, Seq("chunk"))
      .withColumn("kept",
        col("doc_id") === col("f_doc") && col("i") === col("f_i"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN kept THEN struct(i, chunk) END)), s -> s.chunk)"),
          " ").as("clean_text"))
  }

  /** Accumulated span index for [[incrementalLineDedup]]: the distinct
    * spans seen so far (persist and union across batches). */
  def lineDedupIndex(documents: DataFrame, spanWords: Int = 8): DataFrame =
    docChunksPos(documents, spanWords).select("chunk").distinct()

  /**
   * Incremental keep-first span dedup for continuous ingestion — the
   * streaming twin of [[lineDedup]], the [[CdcChunker.incrementalStats]]
   * discipline: new docs span ONCE, their spans probe the accumulated
   * index with a hash join (history is never re-spanned), and the
   * within-batch min(struct) rule handles batch-internal dups. When
   * micro-batches arrive in ascending doc_id order, replaying a corpus
   * batch-by-batch reassembles EXACTLY the batch operator's clean text —
   * an index hit means the first occurrence sat in an earlier (= lower-
   * id) batch; StreamingCorpusSpec pins the parity.
   */
  def incrementalLineDedup(
      newDocs: DataFrame, indexChunks: DataFrame,
      spanWords: Int = 8): DataFrame = {
    val spans = docChunksPos(newDocs, spanWords)
    val firsts = spans.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("i"))).as("f"))
      .select(col("chunk"), col("f.doc_id").as("f_doc"), col("f.i").as("f_i"))
    val hist = indexChunks.select(col("chunk"), lit(true).as("in_hist"))
    spans.join(firsts, Seq("chunk"))
      .join(hist, Seq("chunk"), "left")
      .withColumn("kept", coalesce(col("in_hist"), lit(false)).unary_! &&
        col("doc_id") === col("f_doc") && col("i") === col("f_i"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN kept THEN struct(i, chunk) END)), s -> s.chunk)"),
          " ").as("clean_text"))
  }

  /** Shared tf·idf scoring stream: (doc_id, term, tf, df, score) with the
    * EXACT-INTEGER idf surrogate score = tf · (n_docs·10⁴ div df).
    * Integer division is bit-identical across engines where ln() is only
    * correctly-rounded-ish per libm — the surrogate keeps the idf
    * monotonicity (rarer term ⇒ larger factor) the ranking actually needs
    * while making every downstream hash-checkable. One (doc_id, term)
    * shuffle for tf, one vocab-bounded map-side-combining aggregate for
    * df, n_docs rides a broadcast singleton (never a driver collect). */
  private[graft] def tfidfScored(documents: DataFrame): DataFrame = {
    val words = documents.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), " +")).as("term"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df from the tf rows, not a second pass over `words`: tf holds exactly
    // one row per (doc, term), so count-per-term ≡ countDistinct(doc_id)
    // bit-for-bit — and the tf exchange is IDENTICAL in both branches, so
    // AQE's stage cache evaluates the corpus explode once where the
    // countDistinct formulation re-scanned and re-exploded the whole corpus
    // (guide §2.3/§2.4: one corpus pass, one (doc,term) shuffle, then a
    // term-keyed agg over the already-collapsed pairs).
    // count(tf) not count(1): counting a literal lets the optimizer prune
    // the tf value from this branch's partial aggregate, and the pruned
    // subtree no longer canonicalizes equal to the join branch — stage
    // reuse silently stops firing and the corpus explodes twice (verified
    // against the executed plan; count(tf) ≡ count(1), tf is never null)
    val dfTab = tf.groupBy("term").agg(count(col("tf")).as("df"))
    tf.join(dfTab, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("n_docs * 10000L div df"))
      .select("doc_id", "term", "tf", "df", "score")
  }

  /**
   * TF-IDF keyword extraction: the `k` most characteristic terms per
   * document under [[tfidfScored]]'s exact-integer scoring, ties broken
   * lexicographically. Returns (doc_id, term, tf, df, score, rnk).
   *
   * The per-doc top-k window partitions on doc_id — state bounded by one
   * document's vocabulary, key cardinality = corpus size, no skew. The
   * df side joins unhinted: vocab-sized tables broadcast at bench SF and
   * degrade to a shuffle join at web scale (AQE decides).
   */
  def tfidfKeywords(documents: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tfidfScored(documents)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /**
   * Feature-hashed TF-IDF document vectors (the "hashing trick",
   * Weinberger et al., ICML 2009): terms hash into `buckets` signed
   * buckets — md5-prefix bucket index, md5-next-nibble sign — and the
   * exact-integer tf·idf scores sum per (doc, bucket). Integer end to
   * end, so the vectors AND every inner product computed from them are
   * engine-independent. Returns sparse (doc_id, bucket, weight) rows
   * with zero-sum buckets dropped; densify only at the consumer.
   *
   * Scale shape: adds one (doc_id, bucket) aggregate — key space
   * corpus × buckets, perfectly spread — on top of [[tfidfScored]]'s
   * shuffles. The fixed bucket count makes downstream joins on `bucket`
   * candidates for broadcast-side replication, and the dimensionality
   * (unlike a learned vocabulary) never grows with the corpus.
   */
  def hashedTfidf(documents: DataFrame, buckets: Int = 64): DataFrame = {
    val h = md5(col("term"))
    val sgn = when(
      conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
      .otherwise(-1L)
    tfidfScored(documents)
      .withColumn("bucket",
        conv(substring(h, 1, 8), 16, 10).cast("long") % buckets)
      .withColumn("sgn", sgn)
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sgn") * col("score")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** [[hashedTfidf]] densified to (id, v: array&lt;double&gt;) — the shape
    * every ANN/clustering operator consumes. The per-doc map build is a
    * HOF over a `buckets`-length array, once per document, off every hot
    * path. Docs whose every bucket cancels to zero have no sparse rows
    * and are absent here (they carry no signal to embed). */
  def denseHashedVectors(documents: DataFrame, buckets: Int = 64): DataFrame =
    denseHashedVectorsLong(documents, buckets)
      .select(col("id"), expr("transform(v, x -> cast(x as double))").as("v"))

  /** The exact-integer twin of [[denseHashedVectors]]: dense
    * `array<bigint>` of the hashed-TF-IDF weights, one row per doc. The
    * sequence bound derives from the SAME `buckets` argument as the
    * hashing, so the two can never silently diverge (indices past the
    * hash range would otherwise stay 0 and alter dots). Feeds the
    * exact-integer dot paths (`graft_dotl`). */
  def denseHashedVectorsLong(documents: DataFrame, buckets: Int = 64): DataFrame =
    hashedTfidf(documents, buckets)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bucket"), col("weight"))).as("bw"))
      .select(col("doc_id").as("id"), expr(
        s"transform(sequence(0, ${buckets - 1}), b -> " +
          "coalesce(element_at(map_from_entries(bw), cast(b as bigint)), 0L))")
        .as("v"))

  /**
   * Unsupervised topic clustering of the corpus: spherical k-means over
   * the unit-normalized [[denseHashedVectors]] (the shared
   * [[Ann.ivfCentroids]] kernel — deterministic lowest-id init +
   * distributed Lloyd rounds). Returns (doc_id, cell, cs) where `cs` is
   * the assigned cosine. Label the clusters by joining [[tfidfScored]]
   * on the assignment — `pipe_doc_clusters_verified` oracle-checks that
   * labeling stage end to end.
   *
   * Scale shape: every centroid join broadcasts a `cells`-row side; the
   * corpus is never self-joined. Same cost model as SemDeDup's
   * clustering stage (one broadcast crossJoin + two aggregates per Lloyd
   * round).
   */
  def docClusters(
      documents: DataFrame, cells: Int = 8, lloydIters: Int = 2,
      buckets: Int = 64): DataFrame = {
    graft.expressions.GraftExtensions.register(documents.sparkSession)
    // the unit vectors feed every Lloyd round's crossJoin plus the final
    // assignment; pin them or the whole tf/df/densify pipeline re-runs
    // per round (lloydIters + 1 times)
    val u = denseHashedVectors(documents, buckets)
      .select(col("id"), expr("graft_unit(v)").as("uv"))
      .localCheckpoint(true)
    val cents = Ann.ivfCentroids(u, cells, lloydIters)
    Ann.ivfAssign(u, cents)
      .select(col("id").as("doc_id"), col("cell"), col("cs"))
  }

  /**
   * Neyman-allocation stratified sampling (the optimal-allocation
   * result from classic survey sampling): stratum h receives sample
   * slots ∝ N_h·σ_h, not ∝ N_h — high-variance strata are
   * over-sampled because that is where a fixed budget buys the most
   * estimator precision. Variance here is of the document word count
   * (the cost driver a token-budgeted pipeline estimates).
   *
   * Engine-portability: N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) exactly, so the
   * stratum weight is floor(sqrt(exact integer)) — ONE correctly-rounded
   * IEEE sqrt — and the allocation k·w_h div Σw is pure integer
   * arithmetic after that (no float summation order anywhere). Stratum
   * membership is the salted-md5 rank, like every sampler here.
   *
   * Scale shape: one corpus aggregate to |strata| rows, one broadcast
   * of the tiny allocation table, one per-stratum rank window (the
   * salted two-level rewrite applies if a stratum is hot). Returns the
   * selected (doc_id, lang, rk) rows.
   *
   * Allocation rounding: each stratum gets floor(k·w_h / Σw) slots with
   * NO remainder redistribution, so the total selected is typically a
   * few rows short of `k` (at most |strata|−1 short). This is
   * deliberate: a largest-remainder pass would re-rank strata on
   * remainder ties and every engine (and every oracle) would have to
   * mirror that tie-break exactly for at most |strata|−1 extra rows —
   * the floor keeps the allocation a single integer expression. Callers
   * that need an exact-k budget should request k + |strata|.
   */
  def neymanSample(
      documents: DataFrame, k: Int, strataCol: String = "lang"): DataFrame = {
    val stats = documents
      .select(col(strataCol).as("h"),
        col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("x"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_h"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .select(col("h"), col("n_h"),
        // N·σ = sqrt(N·Σx² − (Σx)²): exact integer under the sqrt
        floor(sqrt((col("n_h").cast("decimal(38,0)") * col("sxx") -
          col("sx") * col("sx")).cast("double"))).cast("long").as("w"))
    // greatest(tot, 1): a fully-degenerate corpus (every stratum constant
    // length -> every weight 0) allocates zero everywhere instead of
    // dividing by zero — and the floor changes nothing when tot > 0
    val totW = stats.agg(
      greatest(coalesce(sum("w"), lit(0L)).cast("long"), lit(1L)).as("tot"))
    val alloc = stats.crossJoin(broadcast(totW))
      .select(col("h"), expr(s"${k}L * w div tot").as("alloc"))
    val rk = Window.partitionBy(strataCol)
      .orderBy(md5(concat(lit("graft-neyman:"), col("doc_id").cast("string"))),
        col("doc_id"))
    documents.select(col("doc_id"), col(strataCol))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .join(broadcast(alloc.withColumnRenamed("h", strataCol)), strataCol)
      .filter(col("rk") <= col("alloc"))
      .select(col("doc_id"), col(strataCol), col("rk"))
  }

  /**
   * Detector audit — precision/recall of one pair detector against
   * another treated as ground truth, the evaluation harness a pipeline
   * runs before trusting a cheaper sketch at scale ("how much does
   * winnowing miss vs exact Jaccard on MY corpus?"). Both inputs are
   * (doc_a < doc_b) pair tables; output is ONE row (tp, fp, fn,
   * precision_milli, recall_milli) — integer-first milli ratios, so two
   * engines agree exactly. One full-outer hash join on the pair key;
   * pair tables are the SMALL derived artifacts (not the corpus), so
   * this costs nothing at any scale.
   */
  def detectorAudit(detected: DataFrame, truth: DataFrame): DataFrame = {
    val d = detected.select(col("doc_a"), col("doc_b")).distinct()
      .withColumn("in_d", lit(1L))
    val t = truth.select(col("doc_a"), col("doc_b")).distinct()
      .withColumn("in_t", lit(1L))
    d.join(t, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(when(col("in_d") === 1 && col("in_t") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("in_d") === 1 && col("in_t").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("in_d").isNull && col("in_t") === 1, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(-1L))
          .otherwise(expr("tp * 1000 div (tp + fp)")).as("precision_milli"),
        when(col("tp") + col("fn") === 0, lit(-1L))
          .otherwise(expr("tp * 1000 div (tp + fn)")).as("recall_milli"))
  }

  /**
   * Synchronous label-propagation communities over the co-chunk document
   * graph (Raghavan, Albert & Kumara 2007) — the clustering complement to
   * [[docGraphPageRank]]'s centrality and [[docGraphTriangles]]'s
   * cohesion. Labels start as doc ids; each round every node adopts the
   * most frequent label among its NEIGHBORS, ties to the smallest label —
   * synchronous updates plus the deterministic tie rule make the result a
   * pure function of the graph (the paper's random tie-break is the one
   * thing replaced, exactly so the DuckDB oracle can unroll the rounds).
   * Isolated nodes keep their own id. Unlike [[connectedComponents]]'
   * min-id closure, LPA respects DENSITY: a narrow bridge between two
   * dense groups does not merge them.
   *
   * Scale shape: the df-capped edge table materializes once and feeds
   * every round; a round is one hash join on node id, one (node, label)
   * count aggregate, and one per-node argmax window (state = one node's
   * neighbor-label histogram, degree-bounded by the df cap). Returns
   * (doc_id, community) for every document.
   */
  def docGraphCommunities(
      documents: DataFrame, iterations: Int = 3,
      maxChunkDocs: Int = 50): DataFrame = {
    val chunks = docChunks(documents).distinct()
    val keep = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df").between(2, maxChunkDocs))
      .select("chunk")
    val kept = chunks.join(keep, "chunk")
    val edges = kept.as("a").join(kept.as("b"), "chunk")
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      // feeds every round — same lineage-truncation reasoning as pagerank
      .localCheckpoint(true)
    val nodes = documents.select("doc_id")
    val byVote = Window.partitionBy("dst").orderBy(desc("cnt"), asc("lbl"))
    var labels = nodes.withColumn("lbl", col("doc_id"))
    for (_ <- 1 to iterations) {
      val votes = edges
        .join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byVote))
        .filter(col("rn") === 1)
        .select(col("dst").as("doc_id"), col("lbl").as("vote"))
      labels = nodes.join(votes, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("vote"), col("doc_id")).as("lbl"))
    }
    labels.select(col("doc_id"), col("lbl").as("community"))
  }

  /**
   * k-core peeling over the co-chunk graph (fixed rounds of the classic
   * degree-< k removal) — the dense-core extractor: after [[docGraphPageRank]]
   * ranks and [[docGraphCommunities]] partitions, the k-core isolates the
   * subgraph where EVERY member keeps >= k in-core connections (template
   * farms, mirror clusters — structures a pair threshold can't see).
   * Fixed `rounds` keeps it a pure function of the graph (the full core
   * is the fixpoint; each extra round only removes — the spec pins
   * convergence on its fixture, and survivors report their end-state
   * in-core degree honestly either way). Returns (doc_id, deg).
   *
   * Scale shape: the df-capped edge table materializes once; each round
   * is two semi-join-shaped hash joins on node ids + one degree count.
   */
  def docGraphKCore(
      documents: DataFrame, kCore: Int = 3, rounds: Int = 3,
      maxChunkDocs: Int = 50): DataFrame = {
    val chunks = docChunks(documents).distinct()
    val keep = chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df").between(2, maxChunkDocs))
      .select("chunk")
    val kept = chunks.join(keep, "chunk")
    val edges = kept.as("a").join(kept.as("b"), "chunk")
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    def coreDegrees(alive: DataFrame): DataFrame =
      edges
        .join(alive.select(col("doc_id").as("src")), "src")
        .join(alive.select(col("doc_id").as("dst")), "dst")
        .groupBy("src").agg(count(lit(1)).as("deg"))
    var alive = edges.select(col("src").as("doc_id")).distinct()
    for (_ <- 1 to rounds)
      alive = coreDegrees(alive).filter(col("deg") >= kCore)
        .select(col("src").as("doc_id"))
    coreDegrees(alive).select(col("src").as("doc_id"), col("deg"))
  }

  /** Position budget for the winnowing key packing: positions at or above
    * the cap are dropped (documented truncation — a 2^20-word document is
    * ~5 MB of text; raise the pack width before hitting it in practice). */
  private[graft] val WinnowPosCap = 1L << 20

  /**
   * Winnowing fingerprint selection — Schleimer, Wilkerson & Aiken,
   * "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
   * 2003; the MOSS algorithm). Every window of `w` consecutive word
   * `k`-gram hashes selects its minimum (ties break to the RIGHTMOST
   * position, the paper's robust-winnowing rule); the distinct selected
   * (position, hash) pairs are the document's fingerprints. The guarantee:
   * any shared run of w + k - 1 words between two documents selects at
   * least one common fingerprint, at an expected density of 2/(w+1) of
   * the gram stream — a tunable sketch with a DETECTION FLOOR, unlike
   * MinHash's whole-document resemblance.
   *
   * Engine-portable by construction: gram hashes are the md5-prefix
   * bridge, and the (hash, rightmost-tie) window minimum packs into ONE
   * integer key — key = h * 2^20 + (2^20 - 1 - pos) — so `min(key)` over
   * a ROWS frame IS the winnowing rule in any engine with window
   * functions; no argmin/struct-ordering semantics to align.
   *
   * Scale shape: one shuffle on doc_id; the two window functions share
   * the same partitioning + ordering (one sort); per-doc state is the doc
   * itself. Returns distinct (doc_id, pos, fp).
   *
   * Floor semantics, stated honestly: a document with fewer than `k`
   * words has NO k-grams and therefore no fingerprints — it sits below
   * every detection floor and is invisible to [[winnowPairs]] and
   * [[decontaminateFuzzy]] alike (run [[exactDedup]]/[[normalizedDedup]]
   * for sub-k-word content). Every oracle applies the identical floor,
   * so this is a contract, not a latent mismatch.
   */
  def winnowFingerprints(
      documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val keyed = posGrams(documents, k)
      .filter(col("pos") < WinnowPosCap)
      .select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          * WinnowPosCap + (lit(WinnowPosCap - 1) - col("pos"))).as("key"))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val whole = Window.partitionBy("doc_id")
    keyed
      .withColumn("wkey", min(col("key")).over(frame))
      .withColumn("maxpos", max(col("pos")).over(whole))
      // only FULL windows select (clamped trailing frames would over-
      // select near the doc end); a doc with fewer than w grams is one
      // short window — its global minimum still fingerprints it
      .filter(col("pos") <= greatest(col("maxpos") - (w - 1), lit(0)))
      .select(col("doc_id"),
        (lit(WinnowPosCap - 1) - col("wkey") % WinnowPosCap).as("pos"),
        expr(s"wkey div ${WinnowPosCap}L").as("fp"))
      .distinct()
  }

  /**
   * Fingerprint-overlap near-dup pairs over [[winnowFingerprints]] — the
   * MOSS report stage: per-fingerprint posting lists (df-capped like
   * every posting join here) emit id pairs, shared-fingerprint counts
   * join the per-doc fingerprint totals, and pairs at or above `pct`%
   * Jaccard on the fingerprint SETS survive. Integer threshold math
   * (100 * common >= pct * union) and integer-first scoring keep the
   * DuckDB oracle an exact hash match. Returns (doc_a < doc_b, common,
   * score) ordered by the caller.
   */
  def winnowPairs(
      documents: DataFrame, k: Int = 4, w: Int = 4,
      pct: Int = 50, maxDf: Int = 1000): DataFrame = {
    val fps = winnowFingerprints(documents, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // sizes is PER-DOC (corpus-sized at 100 TB) — no broadcast hint; the
    // pair table is posting-bounded, so the optimizer broadcasts sizes
    // only while its stats say it fits, and shuffle-joins beyond that
    postingPairCounts(fps, "fp", maxDf)
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
      .withColumn("union_sz", col("sa") + col("sb") - col("common"))
      .filter(col("common") * 100 >= col("union_sz") * pct)
      .select(col("doc_a"), col("doc_b"), col("common"),
        (floor(col("common") * lit(1000) / col("union_sz")) / 1000).as("score"))
  }

  /**
   * The shared df-capped posting-list pair stage: `rows` is a DISTINCT
   * (doc_id, `keyCol`) table; keys held by fewer than 2 or more than
   * `maxDf` docs emit nothing (the quadratic-explosion guard every
   * posting join here shares — over-cap keys are conservative misses,
   * mirrored by each caller's oracle), and each surviving key's sorted
   * posting list emits its C(df, 2) id pairs in one pass. Returns
   * (doc_a < doc_b, common = shared key count).
   */
  private[graft] def postingPairCounts(
      rows: DataFrame, keyCol: String, maxDf: Int): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    graft.expressions.GraftExtensions.register(s)
    // single-shuffle bounded collect: graft_topk keeps the maxDf+1
    // SMALLEST doc_ids per key in an O(maxDf) heap with map-side
    // partials, so a stop-gram with df ~1e6 never materializes a
    // corpus-sized array in any aggregation buffer (the r7 advisor's
    // hazard) — and unlike a df-count semi-join, the corpus shuffles on
    // the key exactly ONCE. A full maxDf+1 result means df > maxDf ->
    // drop (the same conservative miss); otherwise the result IS the
    // complete posting list, already ascending (largest -doc_id first).
    rows.groupBy(keyCol)
      .agg(expr(s"graft_topk(-doc_id, doc_id, ${maxDf + 1})").as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(col("ds")).as[Seq[Long]]
      .mapPartitions(_.flatMap { ds =>
        for (i <- ds.indices.iterator; j <- (i + 1) until ds.size)
          yield (ds(i), ds(j))
      })
      .toDF("doc_a", "doc_b")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
  }

  /**
   * Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
   * Buettcher, SIGIR 2009): the same query runs through BM25 (lexical)
   * AND an integer dot product against the query's hashed-TF-IDF vector
   * (the sparse-"semantic" leg on [[hashedTfidf]]'s shared space), and
   * rrf = Σ_r floor(1e6 / (60 + rank_r)) fuses the two rank lists — the
   * standard hybrid-search shape, robust to either retriever's score
   * scale because only RANKS enter the fusion. Every fusion quantity is
   * an exact integer (ranks, integer division), so the oracle recomputes
   * both retrievers and the fusion.
   *
   * Scale shape: BM25 is the proven one-scan + broadcast-stats plan with
   * a TakeOrdered top-N; the vector leg joins the corpus's sparse rows
   * against a ≤|terms|-row broadcast query vector and reranks through
   * the bounded heap; the fusion full-outer join touches 2·topN rows.
   * Returns the top `k` (doc_id, rank_bm25, rank_vec, rrf), missing
   * ranks as −1.
   */
  def hybridRrf(
      documents: DataFrame, terms: Seq[String], topN: Int = 20,
      k: Int = 10, rrfK: Int = 60, buckets: Int = 64): DataFrame = {
    require(terms.nonEmpty && topN >= k, s"need terms and topN >= k")
    val bmRank = Window.orderBy(col("score").desc, col("doc_id"))
    // the window runs over bm25's ALREADY top-N-limited output (<= topN
    // rows) — not a corpus-sized sort
    val bm = bm25(documents, terms, topN)
      .select(col("doc_id"), row_number().over(bmRank).cast("long").as("rank_bm25"))
    val words = documents.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), " +")).as("term"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val h = md5(col("term"))
    val qvec = words.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", expr("n_docs * 10000L div df"))
      .withColumn("bucket", conv(substring(h, 1, 8), 16, 10).cast("long") % buckets)
      .withColumn("sgn", when(
        conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L))
      .groupBy("bucket").agg(sum(col("sgn") * col("score")).as("qw"))
      .filter(col("qw") =!= 0L)
    val vecScores = hashedTfidf(documents, buckets)
      .join(broadcast(qvec), "bucket")
      .groupBy("doc_id").agg(sum(col("weight") * col("qw")).as("dot"))
      .filter(col("dot") > 0)
    val vec = TopK.topKPerKey(vecScores.withColumn("g", lit(1)),
        Seq("g"), struct(col("dot"), -col("doc_id")), Seq("doc_id"), topN)
      .select(col("doc_id"), col("rn").cast("long").as("rank_vec"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .na.fill(-1L, Seq("rank_bm25", "rank_vec"))
      .withColumn("rrf",
        when(col("rank_bm25") > 0,
          expr(s"1000000L div (${rrfK}L + rank_bm25)")).otherwise(0L) +
        when(col("rank_vec") > 0,
          expr(s"1000000L div (${rrfK}L + rank_vec)")).otherwise(0L))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "rank_bm25", "rank_vec", "rrf")
  }

  /**
   * Exact WEIGHTED (multiset) Jaccard near-dup: Σ min(tf_a, tf_b) /
   * Σ max(tf_a, tf_b) over word-trigram term frequencies — the
   * repetition-sensitive resemblance the distinct-set detectors ignore
   * (a doc that repeats one paragraph 50 times has the same distinct
   * gram SET as one copy; the multisets differ 50-fold). Using
   * Σmax = T_a + T_b − Σmin, everything is exact integers: the posting
   * join accumulates shared minima, totals ride a broadcast, and the
   * threshold test is 2·Σmin ≥ T_a + T_b − Σmin. Same df-capped posting
   * discipline as every pair stage here (cap counts DOCS holding the
   * gram, conservative-miss on over-cap grams, mirrored by the oracle).
   * Returns (doc_a < doc_b, smin, wjac).
   */
  def weightedJaccardPairs(
      documents: DataFrame, pct: Int = 50, maxDf: Int = 1000): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    graft.expressions.GraftExtensions.register(s)
    val tf = documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("wd"))
      .filter(size(col("wd")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("wd")) - 3)).as("i"), col("wd"))
      .select(col("doc_id"),
        expr("concat(wd[i], ' ', wd[i+1], ' ', wd[i+2])").as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("t"))
    // same single-shuffle bounded collect as postingPairCounts: the
    // O(maxDf) graft_topk heap keeps over-cap grams out of every
    // aggregation buffer, and the struct sorts by -doc_id so the result
    // is the complete ascending posting list when df <= maxDf
    val pairMins = tf
      .groupBy("gram")
      .agg(expr(s"graft_topk(-doc_id, struct(doc_id, tf), ${maxDf + 1})")
        .as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(col("ds")).as[Seq[(Long, Long)]]
      .mapPartitions(_.flatMap { ds =>
        for (i <- ds.indices.iterator; j <- (i + 1) until ds.size)
          yield (ds(i)._1, ds(j)._1, math.min(ds(i)._2, ds(j)._2))
      })
      .toDF("doc_a", "doc_b", "m")
      .groupBy("doc_a", "doc_b").agg(sum("m").cast("long").as("smin"))
    pairMins
      // totals is PER-DOC (corpus-sized at 100 TB) — no broadcast hint,
      // same discipline as winnowPairs/containmentPairs
      .join(totals.select(col("doc_id").as("doc_a"), col("t").as("ta")), "doc_a")
      .join(totals.select(col("doc_id").as("doc_b"), col("t").as("tb")), "doc_b")
      .withColumn("smax", col("ta") + col("tb") - col("smin"))
      .filter(col("smin") * 100 >= col("smax") * pct)
      .select(col("doc_a"), col("doc_b"), col("smin"),
        (floor(col("smin") * lit(1000) / col("smax")) / 1000).as("wjac"))
  }

  /** Accumulated fingerprint index for [[incrementalWinnowPairs]]: the
    * distinct (doc_id, fp) postings of history — append each processed
    * batch's index (typically from `foreachBatch`), like
    * [[minhashIndexTables]] / [[lineDedupIndex]]. */
  def winnowIndex(documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    winnowFingerprints(documents, k, w).select("doc_id", "fp").distinct()

  /**
   * Incremental winnowing near-dup for continuous ingestion — the
   * streaming twin of [[winnowPairs]], the [[incrementalNearDup]]
   * discipline: a new batch fingerprints ONCE, probes the accumulated
   * index with a hash join on the fingerprint (history is never
   * re-fingerprinted), and in-batch pairs come from the batch operator
   * itself. The df cap applies to the postings VISIBLE at probe time
   * (history + this batch) — a fingerprint that only later exceeds the
   * cap can thus emit a pair the one-shot batch operator would suppress;
   * on corpora where the cap never binds (its design point), ordered
   * replay flags EXACTLY the batch operator's pairs, which
   * StreamingCorpusSpec pins. Returns (doc_a < doc_b, common, score).
   */
  def incrementalWinnowPairs(
      newDocs: DataFrame, indexFps: DataFrame,
      k: Int = 4, w: Int = 4, pct: Int = 50, maxDf: Int = 1000): DataFrame = {
    val nf = winnowIndex(newDocs, k, w)
    val visDf = indexFps.select("fp").unionAll(nf.select("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val common = indexFps.join(visDf, "fp").as("h")
      .join(nf.as("n"),
        col("h.fp") === col("n.fp") &&
          // a re-delivered doc must not near-dup itself
          col("h.doc_id") =!= col("n.doc_id"))
      .groupBy(col("h.doc_id").as("doc_h"), col("n.doc_id").as("doc_n"))
      .agg(count(lit(1)).as("common"))
    val histSizes = indexFps.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val newSizes = nf.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val histPairs = common
      .join(histSizes.select(col("doc_id").as("doc_h"), col("sz").as("sa")), "doc_h")
      // newSizes is MICRO-BATCH-bounded (never corpus-sized) — broadcast is safe
      .join(broadcast(newSizes.select(col("doc_id").as("doc_n"), col("sz").as("sb"))), "doc_n")
      .withColumn("union_sz", col("sa") + col("sb") - col("common"))
      .filter(col("common") * 100 >= col("union_sz") * pct)
      .select(least(col("doc_h"), col("doc_n")).as("doc_a"),
        greatest(col("doc_h"), col("doc_n")).as("doc_b"), col("common"),
        (floor(col("common") * lit(1000) / col("union_sz")) / 1000).as("score"))
    histPairs.unionAll(winnowPairs(newDocs, k, w, pct, maxDf))
  }

  /**
   * Fuzzy (edit-tolerant) decontamination via winnowing fingerprints —
   * the gap between [[decontaminate]] (exact 5-gram hits: one edited
   * word per 5 breaks every gram) and [[decontaminateSpans]] (exact
   * contiguous runs): a train doc sharing `minShared`+ distinct selected
   * fingerprints with an eval doc is flagged even when the leaked text
   * was lightly edited, because ANY surviving w+k-1-word run still
   * selects a common fingerprint (the winnowing guarantee), and the
   * fingerprint set is only ~2/(w+1) the size of the gram set — the
   * broadcast-side footprint shrinks by the same factor.
   *
   * Returns (doc_id, eval_id, shared) for flagged train/eval pairs.
   * Eval-side fingerprints above `maxEvalOcc` occurrences are dropped
   * (the posting-cap discipline; boilerplate shared across the whole
   * eval set identifies nothing). The eval side of the join is small by
   * nature — AQE broadcasts it at bench scale; at web scale it shuffles
   * on the high-cardinality fingerprint, never on a hot key.
   */
  def decontaminateFuzzy(
      train: DataFrame, eval: DataFrame, minShared: Int = 2,
      k: Int = 4, w: Int = 4, maxEvalOcc: Int = 1000): DataFrame = {
    val evalFps = winnowFingerprints(eval, k, w)
      .select(col("doc_id").as("eval_id"), col("fp")).distinct()
    val keptE = evalFps.join(
      evalFps.groupBy("fp").agg(count(lit(1)).as("occ_e"))
        .filter(col("occ_e") <= maxEvalOcc).select("fp"), "fp")
    winnowFingerprints(train, k, w)
      .select(col("doc_id"), col("fp")).distinct()
      .join(keptE, "fp")
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /**
   * Asymmetric containment pairs — the quote/inclusion detector the
   * symmetric resemblance family (Jaccard, MinHash) is blind to: a short
   * document quoted verbatim inside a long one has tiny Jaccard but
   * containment |A ∩ B| / |A| ≈ 1 (Broder 1997's second coefficient).
   * Word-trigram DISTINCT sets, the same df-capped posting-list pair
   * emission as [[graft.queries.DedupQueries.ngramJaccardPairs]], then
   * BOTH directions of the containment test on each candidate pair.
   *
   * Returns (inner_id, outer_id, common, containment) where inner's gram
   * set is >= `pct`% inside outer's and inner has >= `minGrams` distinct
   * grams (below that, "containment" is noise — a 3-gram doc is inside
   * everything). Integer threshold + integer-first score, so the oracle
   * hash-matches. Near-identical docs legitimately emit both directions.
   *
   * Scale: candidate volume bounded by the df cap exactly as in the
   * Jaccard path; the cap's conservative-miss semantics (an over-cap gram
   * vouches for no pair) are shared with the oracle.
   */
  def containmentPairs(
      documents: DataFrame, pct: Int = 90, minGrams: Int = 5,
      maxDf: Int = 1000): DataFrame = {
    val gramRows = documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("wd"))
      .filter(size(col("wd")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("wd")) - 3)).as("i"), col("wd"))
      .select(col("doc_id"),
        expr("concat(wd[i], ' ', wd[i+1], ' ', wd[i+2])").as("gram"))
      .dropDuplicates("doc_id", "gram")
    val sizes = gramRows.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // sizes is PER-DOC (corpus-sized at 100 TB) — no broadcast hint
    val common = postingPairCounts(gramRows, "gram", maxDf)
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
    val aInB = common
      .filter(col("sa") >= minGrams && col("common") * 100 >= col("sa") * pct)
      .select(col("doc_a").as("inner_id"), col("doc_b").as("outer_id"),
        col("common"), (floor(col("common") * lit(1000) / col("sa")) / 1000).as("containment"))
    val bInA = common
      .filter(col("sb") >= minGrams && col("common") * 100 >= col("sb") * pct)
      .select(col("doc_b").as("inner_id"), col("doc_a").as("outer_id"),
        col("common"), (floor(col("common") * lit(1000) / col("sb")) / 1000).as("containment"))
    aInB.unionByName(bInA)
  }

  /** Distinct word-trigram rows (doc_id, gram) — the shared unit of the
    * set-similarity family (jaccard/containment/ppjoin/snm). */
  private[graft] def triGramRows(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("wd"))
      .filter(size(col("wd")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("wd")) - 3)).as("i"), col("wd"))
      .select(col("doc_id"),
        expr("concat(wd[i], ' ', wd[i+1], ' ', wd[i+2])").as("gram"))
      .dropDuplicates("doc_id", "gram")

  /**
   * The R-S (cross-table) form of [[ppjoinPairs]]: every (left, right)
   * pair with exact word-trigram Jaccard >= `pct`/100 between two
   * corpora — the shape of near-duplicate DECONTAMINATION (eval set vs
   * training corpus) and of incremental dedup (new batch vs accepted
   * corpus). One global gram order over the UNION document frequency
   * (consistency is all the prefix theorem needs), per-side prefixes,
   * the same lossless length + positional pruning, exact verify — so the
   * output equals the brute cross-join answer while the plan touches
   * only prefix postings. Returns (left_id, right_id, jaccard).
   *
   * Scale: at a 100 TB train side and a MB-scale eval side the prefix
   * join's left leg is tiny and the right leg is the train corpus's
   * rarest-gram slice; candidates are id pairs only, verify arrays join
   * per side. `materialize` as in [[ppjoinPairs]] (identity default —
   * measured faster at local SF; stage out at cluster scale).
   */
  def ppjoinAcross(
      left: DataFrame, right: DataFrame, pct: Int = 50,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    val lg = triGramRows(left)
    val rg = triGramRows(right)
    // union df: gram ordering consistent across BOTH corpora (doc ids may
    // collide between tables — rows are distinct per side, so df is the
    // sum of the two sides' dfs, order-stable either way)
    val dfT = lg.unionByName(rg).groupBy("gram").agg(count(lit(1)).as("df"))
    val lp = ppjoinPerDoc(lg, dfT, materialize)
    val rp = ppjoinPerDoc(rg, dfT, materialize)
    val cand = ppjoinCandidates(
      ppjoinPrefixes(lp, pct), ppjoinPrefixes(rp, pct),
      pct, "left_id", "right_id", selfJoin = false)
    // verify reads per-side code-point-sorted sets, NOT lp/rp — those are
    // in rarest-first (df, gram) order, which the two-pointer merge can't
    // compare; the plain sets also skip the df join the prefix side pays
    ppjoinVerify(cand, ppjoinPlainSets(lg), ppjoinPlainSets(rg),
      "left_id", "right_id", pct)
  }

  /** (doc_id, grams rarest-first under dfT's global (df, gram) order, sz)
    * — the per-doc table both PPJoin forms index and verify from. */
  private def ppjoinPerDoc(
      gramRows: DataFrame, dfT: DataFrame,
      materialize: DataFrame => DataFrame): DataFrame =
    materialize(gramRows.join(dfT, "gram")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("gs"))
      .select(col("doc_id"),
        expr("transform(gs, x -> x.gram)").as("grams"),
        size(col("gs")).cast("long").as("sz")))

  /** Prefix postings (gram, doc_id, 1-based position, set size): the first
    * s − ⌈t·s⌉ + 1 grams of each doc's rarest-first array. */
  private def ppjoinPrefixes(perDoc: DataFrame, pct: Int): DataFrame = perDoc
    .withColumn("plen",
      (col("sz") - expr(s"($pct * sz + 99) div 100") + 1).cast("int"))
    .select(col("doc_id"), col("sz"),
      posexplode(slice(col("grams"), lit(1), col("plen"))).as(Seq("i0", "gram")))
    .select(col("gram"), col("doc_id"), (col("i0") + 1).as("i"), col("sz"))

  /**
   * Prefix-posting skew accounting — the [[ppjoinPairs]] analog of the
   * minhash band-bucket audit: PPJoin's lossless guarantee forbids a cap,
   * so the posting join's cost is governed by prefix-gram document
   * frequency, and boilerplate-heavy corpora push prefix df toward the
   * dup-cluster size (the containment drive's super-linear blow-up
   * class). This is the readout a deployment logs BEFORE the join to SEE
   * that hazard: per decimal-magnitude decade of prefix-posting length —
   * gram count, posting rows, the largest posting, the implied candidate
   * mass Σ pdf·(pdf−1)/2 (the self-join's upper bound before length/
   * positional pruning), and the heaviest gram itself (max over the
   * zero-padded `(pdf, gram)` string — deterministic). A heavy top
   * decade says: run exact/normalized dedup first, exactly the
   * discipline the minhash cap docs prescribe. Two shuffles (gram df,
   * decade roll-up); output is ≤ ~12 rows.
   */
  def ppjoinPrefixAudit(documents: DataFrame, pct: Int = 50): DataFrame = {
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    val gramRows = triGramRows(documents)
    val dfT = gramRows.groupBy("gram").agg(count(lit(1)).as("df"))
    val pre = ppjoinPrefixes(ppjoinPerDoc(gramRows, dfT, identity), pct)
    pre.groupBy("gram").agg(count(lit(1)).as("pdf"))
      .withColumn("df_decade", length(col("pdf").cast("string")))
      .groupBy("df_decade").agg(
        count(lit(1)).as("n_grams"),
        sum("pdf").cast("long").as("posting_rows"),
        max("pdf").as("max_posting"),
        sum(expr("pdf * (pdf - 1) div 2")).cast("long").as("implied_pairs"),
        expr("substring(max(concat(lpad(cast(pdf as string), 12, '0'), " +
          "':', gram)), 14)").as("top_gram"))
      .orderBy("df_decade")
  }

  /** The shared candidate stage: prefix-posting equi-join on gram, length
    * filter, PPJoin's positional α bound, distinct id pairs. `selfJoin`
    * adds the doc_a < doc_b canonicalization a self-join needs. */
  private[graft] def ppjoinCandidates(
      lpre: DataFrame, rpre: DataFrame, pct: Int,
      aId: String, bId: String, selfJoin: Boolean): DataFrame = {
    val joined = lpre
      .select(col("gram"), col("doc_id").as(aId),
        col("i").as("ia"), col("sz").as("sa"))
      .join(rpre.select(col("gram"), col("doc_id").as(bId),
        col("i").as("ib"), col("sz").as("sb")), Seq("gram"))
    (if (selfJoin) joined.filter(col(aId) < col(bId)) else joined)
      .filter(col("sa") * 100 >= col("sb") * pct &&
        col("sb") * 100 >= col("sa") * pct)
      .filter(least(col("sa") - col("ia"), col("sb") - col("ib")) + 1 >=
        expr(s"($pct * (sa + sb) + ${100 + pct} - 1) div ${100 + pct}"))
      .select(col(aId), col(bId)).distinct()
  }

  /** The shared exact verify: join each side's (doc_id, grams) set table
    * onto the id-only candidates, two-pointer merge count, integer
    * threshold, floor-milli jaccard. The gram arrays MUST be in
    * `sort_array`'s code-point order (see [[ppjoinPlainSets]]) — the merge
    * compares code points, the same kernel the SNM verify uses; Catalyst
    * `array_intersect` evaluates interpreted per pair and dominates on
    * boilerplate-heavy corpora where survivors grow (the containment
    * blow-up shape), so the codegen'd deserialize + JVM merge wins. */
  private[graft] def ppjoinVerify(
      cand: DataFrame, setsA: DataFrame, setsB: DataFrame,
      aId: String, bId: String, pct: Int): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    cand
      .join(setsA.select(col("doc_id").as(aId), col("grams").as("ga")), aId)
      .join(setsB.select(col("doc_id").as(bId), col("grams").as("gb")), bId)
      .select(col(aId), col(bId), col("ga"), col("gb"))
      .as[(Long, Long, IndexedSeq[String], IndexedSeq[String])]
      .mapPartitions(_.flatMap { case (a, b, ga, gb) =>
        val common = graft.similarity.MinHashKernel
          .intersectionSortedStrings(ga, gb).toLong
        val union = ga.size + gb.size - common
        if (common * 100 >= union * pct)
          Some((a, b, (common * 1000L / union).toDouble / 1000))
        else None
      })
      .toDF(aId, bId, "jaccard")
  }

  /** Order-free distinct gram sets in `sort_array` code-point order — the
    * verify-side table ([[ppjoinVerify]] needs the code-point order for
    * its two-pointer merge); skips the df join the prefix side pays. */
  private def ppjoinPlainSets(gramRows: DataFrame): DataFrame = gramRows
    .groupBy("doc_id")
    .agg(sort_array(collect_list(col("gram"))).as("grams"))

  /**
   * Contiguous global rank (0-based) by `key`, without a single-partition
   * window: `repartitionByRange` + `sortWithinPartitions` establish the
   * global order ACROSS partitions (range boundaries come from sampling,
   * but they only choose the split points — the concatenated partition
   * order is the total key order regardless), and `zipWithIndex` stamps
   * contiguous indexes with one extra per-partition count job — the
   * canonical distributed ranking, and the one place this library touches
   * the RDD API (Window.orderBy with no partition key funnels the corpus
   * through ONE task). `key` must be a total order (include a unique
   * tie-break column) or ranks are nondeterministic between runs.
   *
   * The input is PINNED (eager localCheckpoint) before the sort: the
   * machinery runs the caller's upstream plan three times otherwise —
   * `repartitionByRange` samples it for the range bounds, `zipWithIndex`
   * runs its per-partition count job, and the final job reads it again —
   * which doubled the z-order catalog family when its scan + broadcast-
   * stats plan sat upstream (r11 bench gate). Rank inputs are thin by
   * construction (ids + key columns, never gram/text arrays), so the pin
   * is cheap and the three passes read cached blocks.
   */
  private[graft] def globalRank(
      df: DataFrame, key: org.apache.spark.sql.Column,
      rankCol: String): DataFrame = {
    val s = df.sparkSession
    val sorted = df.withColumn("__gr_key", key)
      .localCheckpoint(true)
      .repartitionByRange(col("__gr_key"))
      .sortWithinPartitions("__gr_key")
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    s.createDataFrame(rdd, schema).drop("__gr_key")
  }

  /**
   * Contiguous global rank (0-based) by the NON-NEGATIVE integer key
   * `(zvalCol, tieCol)` — the specialized fast path [[globalRank]]'s
   * general machinery doesn't need when the key's high bits form a
   * near-uniform coarse histogram (z-order / Hilbert codes of uniformly
   * scaled coordinates): `cell = zval >> (zvalBits - cellBits)` is
   * order-aligned with the key, so
   *
   *  1. one map-side-combined aggregation yields the ≤ 2^cellBits cell
   *     counts, collected to the driver (BOUNDED: O(cells), never
   *     O(rows) — the same documented exception as the Bloom cell-id
   *     lists) and prefix-summed into per-cell global offsets;
   *  2. `row_number()` windowed BY CELL (hash-partitioned — distributed,
   *     no single-task funnel) plus the broadcast offset is the exact
   *     0-based global rank, in the same job as the caller's downstream
   *     aggregation.
   *
   * Two jobs total vs globalRank's pin + range-sample + zipWithIndex
   * count + final (the r11 bench-gate cost on the z-order family). The
   * trade is the skew exposure: a key distribution concentrated in one
   * cell degrades that cell's window to a single task — callers scale
   * `cellBits` to their key width (coordinates scaled to 16 bits per
   * axis keep cells near-uniform by construction). Ranks are
   * deterministic: the (zval, tie) key must be unique per row, as with
   * [[globalRank]].
   */
  private[graft] def rankByIntCells(
      df: DataFrame, zvalCol: String, tieCol: String, zvalBits: Int,
      rankCol: String, cellBits: Int = 12): DataFrame = {
    require(zvalBits > 0 && cellBits > 0, s"positive bit widths")
    val shift = math.max(zvalBits - cellBits, 0)
    val withCell = df.withColumn("__cell",
      expr(s"shiftright($zvalCol, $shift)"))
    // per-cell counts: one map-side-combined aggregation, ≤ 2^cellBits rows
    val cellCounts = withCell.groupBy("__cell").agg(count(lit(1)).as("__cnt"))
    // Per-cell global offset = Σ counts of strictly-smaller cells, computed
    // LAZILY — no driver collect, no single-partition window. The r11/r12
    // bench showed per-ACTION overhead, not arithmetic, dominating this
    // family: a collect()ed histogram makes the rank 2 actions and
    // re-executes the caller's scan + broadcast-stats upstream once per
    // action (pinning traded that for a checkpoint job, measured no
    // better); lazy offsets fold everything into the caller's ONE action.
    // The prefix sum itself is two-level so it stays bounded AND spread:
    // coarse cells (the high cellBits/2 bits) prefix via a ≤ 2^cellBits-
    // pair broadcast nested-loop (64×64 at the default), and the
    // within-coarse prefix via a window PARTITIONED by coarse cell
    // (≤ 2^cellBits rows total, never a single-partition funnel). A flat
    // one-level self-join was measured at ~1 s: 2^(2·cellBits) = 16.7 M
    // pair rows through the aggregate. Cells with no smaller coarse
    // neighbor keep offset 0 via the left join.
    val coarseShiftBits = cellBits - cellBits / 2
    val withCoarse = cellCounts.withColumn("__coarse",
      expr(s"shiftright(__cell, $coarseShiftBits)"))
    val coarseCounts = withCoarse.groupBy("__coarse")
      .agg(sum("__cnt").as("__ccnt"))
    val coarseOff = coarseCounts.select(col("__coarse"))
      .join(broadcast(coarseCounts
          .select(col("__coarse").as("__bc"), col("__ccnt").as("__bn"))),
        col("__bc") < col("__coarse"), "left")
      .groupBy("__coarse")
      .agg(coalesce(sum("__bn"), lit(0L)).as("__coff"))
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy("__coarse").orderBy("__cell")
    val offT = withCoarse
      .withColumn("__within",
        sum(col("__cnt")).over(wi) - col("__cnt"))
      .join(broadcast(coarseOff), "__coarse")
      .select(col("__cell"), (col("__coff") + col("__within")).as("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__cell").orderBy(col(zvalCol), col(tieCol))
    withCell.join(broadcast(offT), "__cell")
      .withColumn(rankCol,
        col("__off") + org.apache.spark.sql.functions.row_number().over(w)
          .cast("long") - lit(1L))
      .drop("__cell", "__off")
  }

  /**
   * Sorted-neighborhood (SNM) near-dup screening (Hernandez & Stolfo,
   * SIGMOD 1995's merge/purge, on gram sets): every doc keyed by its
   * RAREST word trigram under the global (df, gram) order (`keyRank`
   * selects the k-th rarest — [[snmMultipass]]'s handle) — near-dups
   * overwhelmingly share their rarest gram, so they land adjacent in the
   * sort — then each doc is compared against exactly the next `window`
   * docs in rank order and survivors are verified with the exact
   * distinct-trigram Jaccard at `pct`/100. Complements the posting-join
   * and prefix-filter detectors with a third plan shape: ONE global
   * range-sort + a rank equi-join whose fan-out is `window` rows per doc
   * — candidate volume is window·n by construction, immune to df skew
   * (no posting list, no band bucket, nothing quadratic anywhere), at
   * the price of RECALL bounded by the window (a near-dup pair more than
   * `window` ranks apart is missed — the documented screening trade-off,
   * mirrored exactly by the oracle's rank-distance rule).
   *
   * Returns (doc_a < doc_b, jaccard) like the Jaccard family.
   */
  def snmPairs(
      documents: DataFrame, window: Int = 10, pct: Int = 50,
      keyRank: Int = 1,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(keyRank >= 1, s"keyRank >= 1, got $keyRank")
    snmPass(snmPerDoc(documents, materialize), window, pct, keyRank, materialize)
  }

  /** The shared SNM per-doc table: `ks` = the doc's distinct grams sorted
    * by the global (df, gram) order (pass keys are `element_at(ks, k)`),
    * `grams` = the same set code-point-sorted for the verify merge. Built
    * ONCE (one gram shuffle for df, one per-doc aggregation) and fed to
    * every pass — [[snmMultipass]]'s cost fix; `materialize` pins it
    * because the rank sort and both verify sides all read it. */
  private def snmPerDoc(
      documents: DataFrame,
      materialize: DataFrame => DataFrame): DataFrame = {
    val gramRows = triGramRows(documents)
    val dfT = gramRows.groupBy("gram").agg(count(lit(1)).as("df"))
    materialize(gramRows.join(dfT, "gram")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("ks"))
      .select(col("doc_id"), col("ks"),
        sort_array(expr("transform(ks, x -> x.gram)")).as("grams")))
  }

  /** One SNM pass over a [[snmPerDoc]] table: keyRank-th-rarest sort key
    * (capped at the doc's gram count), distributed contiguous rank over
    * the THIN key projection (zipWithIndex re-executes its lineage per
    * use, so the rank table pins too and the gram arrays stay out of the
    * RDD roundtrip), ids-only window equi-join, exact two-pointer verify
    * in sort_array's code-point order. */
  private def snmPass(
      perDoc: DataFrame, window: Int, pct: Int, keyRank: Int,
      materialize: DataFrame => DataFrame): DataFrame = {
    require(window >= 1 && pct >= 1 && pct <= 99,
      s"window >= 1 and pct in [1, 99], got $window/$pct")
    val keyed = perDoc
      .select(col("doc_id"),
        element_at(col("ks"),
          least(lit(keyRank), size(col("ks"))).cast("int")).as("k0"))
      .select(col("doc_id"), col("k0.df").as("kdf"), col("k0.gram").as("kgram"))
    val ranked = materialize(globalRank(keyed,
        struct(col("kdf"), col("kgram"), col("doc_id")), "rnk")
      .select(col("doc_id"), col("rnk")))
    // each doc meets its next `window` ranks: explode the distance, then
    // a plain equi-join on the dense LONG rank — IDS ONLY through the
    // candidate shuffle (the gram arrays would otherwise ride it
    // window-fold); arrays join back onto the window·n candidate rows
    val leftIds = ranked
      .select(col("doc_id").as("id_a"),
        explode(sequence(lit(1), lit(window))).as("d"), col("rnk"))
      .select(col("id_a"), (col("rnk") + col("d")).as("rnk"))
    val cand = leftIds
      .join(ranked.select(col("doc_id").as("id_b"), col("rnk")), "rnk")
      .select(col("id_a"), col("id_b"))
    val s = perDoc.sparkSession
    import s.implicits._
    // exact verify through a two-pointer merge count (Catalyst
    // array_intersect evaluates interpreted per pair and dominates at
    // window·n candidates); the merge MUST compare in sort_array's
    // code-point order — String.compareTo diverges on supplementary-plane
    // text (see MinHashKernel.codePointCompare)
    cand
      .join(perDoc.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(perDoc.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
      .select(col("id_a"), col("id_b"), col("ga"), col("gb"))
      .as[(Long, Long, IndexedSeq[String], IndexedSeq[String])]
      .mapPartitions(_.flatMap { case (a, b, ga, gb) =>
        val common = graft.similarity.MinHashKernel
          .intersectionSortedStrings(ga, gb).toLong
        val union = ga.size + gb.size - common
        if (common * 100 >= union * pct)
          Some((math.min(a, b), math.max(a, b),
            (common * 1000L / union).toDouble / 1000))
        else None
      })
      .toDF("doc_a", "doc_b", "jaccard")
  }

  /**
   * Multi-pass SNM — the recall fix the original merge/purge paper
   * prescribes: a single sort key misses near-dups whose key disagrees
   * (twins whose rarest grams are their OWN unique edits sort to opposite
   * ends), so run `passes` passes keyed by the 1st, 2nd, … `passes`-th
   * rarest gram and union the verified pairs (a pair found twice carries
   * the same exact jaccard — DISTINCT dedups it). The gram pipeline and
   * per-doc aggregation run ONCE ([[snmPerDoc]] is shared across passes);
   * each pass adds one thin-key sort + one window join + one verify.
   */
  def snmMultipass(
      documents: DataFrame, passes: Int = 2, window: Int = 10,
      pct: Int = 50,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(passes >= 1, s"passes >= 1, got $passes")
    val perDoc = snmPerDoc(documents, materialize)
    (1 to passes)
      .map(k => snmPass(perDoc, window, pct, k, materialize))
      .reduce(_.unionByName(_))
      .distinct()
  }

  /**
   * PPJoin set-similarity self-join (Xiao, Wang, Lin & Yu, "Efficient
   * Similarity Joins for Near Duplicate Detection", WWW 2008): every pair
   * with exact word-trigram Jaccard >= `pct`/100, found via LOSSLESS
   * prefix filtering instead of the df cap the posting-join family uses.
   * Grams are globally ordered by ascending document frequency (rarest
   * first, ties by gram text — identical in both engines on the ASCII
   * corpus); a doc of set size s need only index its first
   * s − ⌈t·s⌉ + 1 grams in that order (the PREFIX), because two sets
   * with Jaccard >= t must share a gram inside both prefixes — so the
   * candidate join touches the rarest slice of each posting list and an
   * over-frequent gram lands in a prefix only when a doc has nothing
   * rarer. Two further exact filters prune candidates before
   * verification: the LENGTH filter (t·s_b <= s_a when s_a <= s_b) and
   * PPJoin's POSITIONAL filter — a shared prefix gram at 1-based
   * positions (i, j) bounds the overlap by min(s_a−i, s_b−j)+1, which
   * must reach α = ⌈t/(1+t)·(s_a+s_b)⌉, the overlap a qualifying pair
   * needs. The first shared gram of a qualifying pair sits in both
   * prefixes and passes the bound, so admitting a pair when ANY of its
   * shared prefix grams passes loses nothing. Survivors are verified
   * EXACTLY (distinct-set intersection on the two gram arrays), so the
   * result equals the brute all-pairs join at the threshold — no
   * conservative misses, and the oracle states the brute definition.
   *
   * All thresholds are integer-exact: ⌈pct·s/100⌉ = (pct·s+99) div 100,
   * α = (pct·(s_a+s_b)+100+pct−1) div (100+pct), and the verify test is
   * 100·common >= pct·union.
   *
   * Scale shape: one shuffle join tags grams with df, one groupBy builds
   * each doc's sorted gram array (per-DOC sized buffers, never
   * corpus-sized), the candidate join shuffles only prefix postings
   * (id + position + size — no text beyond the gram key), and the exact
   * verify joins gram arrays against id-only candidate pairs. The sorted
   * per-doc table feeds FOUR plan subtrees (both prefix-join sides, both
   * verify sides — though the verify pair reads a cheaper code-point-
   * sorted variant with no df join), so `materialize` can pin it instead of
   * re-running the gram pipeline per subtree: at local SF the measured
   * default is identity (each subtree is one cheap codegen scan and an
   * eager checkpoint of the wide arrays costs more than it saves — 8.7 s
   * vs 5.1 s at sf0.1), while at cluster scale four corpus scans dwarf
   * one stage-out, so pass `_.localCheckpoint(true)` or a parquet-stage
   * materializer (the [[PrepPipeline]] knob, opposite default).
   * Returns (doc_a < doc_b, jaccard) like the Jaccard family.
   */
  def ppjoinPairs(
      documents: DataFrame, pct: Int = 50,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    val gramRows = triGramRows(documents)
    val dfT = gramRows.groupBy("gram").agg(count(lit(1)).as("df"))
    val perDoc = ppjoinPerDoc(gramRows, dfT, materialize)
    val pre = ppjoinPrefixes(perDoc, pct)
    val cand = ppjoinCandidates(pre, pre, pct, "doc_a", "doc_b", selfJoin = true)
    val plainSets = ppjoinPlainSets(gramRows)
    ppjoinVerify(cand, plainSets, plainSets, "doc_a", "doc_b", pct)
  }

  /**
   * One ingestion step of INCREMENTAL accepted-corpus dedup — the
   * growing-corpus shape a training pipeline actually runs: micro-batches
   * arrive, the accepted set only ever GROWS (immutable once written),
   * and each batch is admitted in two lossless stages:
   *
   *  1. cross guard — any batch doc with trigram jaccard >= `pct`/100
   *     against ANY accepted doc is dropped ([[ppjoinAcross]]: the R-S
   *     prefix join touches only the accepted corpus's rarest-gram slice,
   *     so the step costs the batch, not the history);
   *  2. intra-batch keep-best — [[ppjoinPairs]] over the survivors,
   *     connected components, keep the best-scoring doc per cluster
   *     (`scoreCol` desc, id asc — [[dedupKeepBest]]'s rule).
   *
   * Returns the batch rows to ACCEPT (full rows, so the caller can append
   * them to the accepted corpus and its indexes). Semantics contract,
   * spec-pinned by StreamingCorpusSpec: replaying a corpus in id-ordered
   * micro-batches accepts exactly the one-shot single-batch run's keeps
   * whenever (a) each cross-batch duplicate's canonical arrived in an
   * earlier batch with the higher score (the normal ingestion case —
   * canonical first) and (b) no near-dup chain crosses batches through a
   * DROPPED doc. Both divergence modes are real and documented: a
   * later-arriving better duplicate is dropped (the accepted set is
   * immutable — re-run [[dedupKeepBest]] offline to re-canonicalize), and
   * a near-dup chain A~B~C whose middle doc B was dropped leaves a
   * later-batch C accepted when C resembles only B (drops never join the
   * guard set, while the one-shot run's connected components span the
   * whole chain); the spec asserts both modes explicitly rather than
   * hiding them.
   */
  def incrementalPpjoinKeep(
      batch: DataFrame, accepted: DataFrame, pct: Int = 50,
      scoreCol: String = "n_chars"): DataFrame = {
    val crossDrop = ppjoinAcross(batch, accepted, pct)
      .select(col("left_id").as("doc_id")).distinct()
    val survivors = batch.join(crossDrop, Seq("doc_id"), "left_anti")
    val intra = ppjoinPairs(survivors, pct).select(col("doc_a"), col("doc_b"))
    val kept = dedupKeepBest(survivors.select(col("doc_id"), col(scoreCol)),
        intra, scoreCol)
      .filter(col("kept")).select("doc_id")
    survivors.join(kept, "doc_id")
  }

  /**
   * FROZEN gram order for the indexed incremental form: a (gram, df)
   * snapshot from a seed corpus. PPJoin's prefix theorem needs one
   * CONSISTENT total gram order, not the live-df one — rarest-first
   * merely minimizes prefix-join cost — so freezing the order is what
   * makes the accepted-side index APPEND-ONLY: under the live union df
   * ([[ppjoinAcross]]), every batch shifts dfs and silently re-orders
   * historical docs' prefixes, forcing a full history re-aggregation per
   * batch. Grams unseen by the snapshot order as (df = 0, gram) — new
   * grams ARE rare, and the rule is stable forever because the snapshot
   * is never updated in place (rebuild to a NEW snapshot + index when
   * drift makes prefixes too long; the rebuild is offline and the old
   * index serves meanwhile, the [[AnnIndex.rebalance]] discipline).
   */
  def ppjoinFrozenOrder(seed: DataFrame): DataFrame =
    triGramRows(seed).groupBy("gram").agg(count(lit(1)).as("df"))

  /** A doc set's PPJoin index tables under a frozen order: (prefixes =
    * (gram, doc_id, i, sz) posting rows, sets = (doc_id, grams)
    * code-point-sorted). Both are per-doc-derived ONLY — no corpus-wide
    * aggregate — so per-batch tables concatenate into the accepted
    * index (parquet append, partitioned by gram hash at scale). */
  def ppjoinIndexTables(
      docs: DataFrame, orderT: DataFrame, pct: Int = 50): (DataFrame, DataFrame) = {
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    val gramRows = triGramRows(docs)
    val keyed = gramRows.join(orderT, Seq("gram"), "left")
      .select(col("doc_id"), col("gram"),
        coalesce(col("df"), lit(0L)).as("df"))
    val perDoc = keyed
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("gs"))
      .select(col("doc_id"),
        expr("transform(gs, x -> x.gram)").as("grams"),
        size(col("gs")).cast("long").as("sz"))
    (ppjoinPrefixes(perDoc, pct), ppjoinPlainSets(gramRows))
  }

  /**
   * The INDEXED ingestion step — the 100 TB form of
   * [[incrementalPpjoinKeep]]: the accepted corpus lives as persisted
   * prefix-posting + gram-set tables under a [[ppjoinFrozenOrder]]
   * snapshot, and each batch (a) probes its own prefixes against the
   * accepted postings (an equi-join on gram where the batch side is
   * micro-batch-sized — no history re-aggregation, no shuffle of
   * history; partition the persisted postings by gram hash and the probe
   * prunes), (b) runs the intra-batch pair join under the SAME frozen
   * order, (c) keeps best per intra cluster. Lossless at every step: the
   * prefix theorem holds under any consistent order, and verification is
   * exact on candidates. Returns (kept rows, kept prefix rows, kept set
   * rows) — the caller appends the latter two to the accepted index
   * (APPEND-ONLY: old docs' prefixes never change under the frozen
   * order; IncrementalPpjoinSpec pins replayed-index ≡ one-shot-index
   * equality and verdict parity with the recompute form).
   */
  def incrementalPpjoinKeepIndexed(
      batch: DataFrame,
      acceptedPrefixes: DataFrame,
      acceptedSets: DataFrame,
      orderT: DataFrame,
      pct: Int = 50,
      scoreCol: String = "n_chars"): (DataFrame, DataFrame, DataFrame) = {
    val (bPre, bSets) = ppjoinIndexTables(batch, orderT, pct)
    val crossCand = ppjoinCandidates(
      bPre, acceptedPrefixes, pct, "left_id", "right_id", selfJoin = false)
    val crossDrop = ppjoinVerify(
        crossCand, bSets, acceptedSets, "left_id", "right_id", pct)
      .select(col("left_id").as("doc_id")).distinct()
    val survivors = batch.join(crossDrop, Seq("doc_id"), "left_anti")
    // intra-batch under the same frozen order: prefixes/sets prune to the
    // surviving ids (semi joins), then the standard self candidate join
    val sIds = survivors.select("doc_id")
    val sPre = bPre.join(sIds, "doc_id")
    val sSets = bSets.join(sIds, "doc_id")
    val intraCand = ppjoinCandidates(sPre, sPre, pct, "doc_a", "doc_b",
      selfJoin = true)
    val intra = ppjoinVerify(intraCand, sSets, sSets, "doc_a", "doc_b", pct)
      .select(col("doc_a"), col("doc_b"))
    val keptIds = dedupKeepBest(
        survivors.select(col("doc_id"), col(scoreCol)), intra, scoreCol)
      .filter(col("kept")).select("doc_id")
    (batch.join(keptIds, "doc_id"),
      bPre.join(keptIds, "doc_id"),
      bSets.join(keptIds, "doc_id"))
  }

  /** Persisted accepted-corpus index format version — stamped into the
    * index meta by [[ppjoinIndexInit]], REQUIRED by [[ppjoinIndexIngest]]
    * (the [[QualityModel.FormatVersion]] / AnnIndex discipline: a stale
    * layout fails descriptively instead of probing silently).
    *
    * v2: per-batch table dirs + a commit-marker log replaced v1's flat
    * append-mode `prefixes/`+`sets/` dirs — v1 had no per-batch commit,
    * so a crash between the two appends left prefix rows without their
    * set rows and later probes silently dropped those candidates at the
    * verify join (undetected false-negative dedup).
    *
    * v3: commit markers carry CONTENT (`dir=<batch dir name>` and, for a
    * compaction, `folds=<superseded ids>`), which buys two things v2
    * could not express: (a) batch dirs are unique PER ATTEMPT
    * (`b<id>_<owner token>`), so a mutator that stalled past the guard
    * TTL and resumed after a takeover can NEVER overwrite the takeover's
    * committed dir — its writes land in its own torn dir and its commit
    * aborts at the ownership re-verify; (b) [[ppjoinIndexCompact]] flips
    * N committed batches to one folded batch with a SINGLE atomic marker
    * create (readers exclude fold-superseded ids), so a crash anywhere
    * in compaction leaves a readable, duplicate-free index. */
  private[graft] val PpjoinIndexFormatVersion = 3L

  /** Staleness horizon for the ingest mutation marker (`<path>/_mutating`,
    * heartbeated at TTL/3 by [[MutationGuard]]). */
  private[graft] val PpjoinIndexGuardTtlMillis = 60000L

  private def ppjoinIndexFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ppjoinBatchDirName(id: Long, attempt: String): String =
    f"b$id%08d_$attempt"

  /** One committed batch: its id, the batch dir NAME its marker recorded
    * (unique per mutation attempt — see [[PpjoinIndexFormatVersion]] v3),
    * and, for a compaction marker, the batch ids it superseded. */
  private case class PpjoinCommit(id: Long, dir: String, folds: Seq[Long])

  /** Every marker file id under `commits/`, with its parsed commit when
    * the content is complete. A marker exists-but-unparsable in exactly
    * two states: mid-create (the exclusive create lands the file a moment
    * before its content) or crashed-mid-create — in BOTH the batch is NOT
    * yet committed, so readers skip it ([[ppjoinIndexIngest]]'s guarded
    * sweep deletes crashed ones so their ids can be re-minted). A v2
    * index's zero-byte markers all parse as torn, so its batches read as
    * "no committed batches — initialize" (and the meta version gate fails
    * every mutation path descriptively first). */
  private def ppjoinMarkerFiles(
      spark: SparkSession, path: String): Seq[(Long, Option[PpjoinCommit])] = {
    val f = ppjoinIndexFs(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/commits")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("b"))
      .map { s =>
        val id = s.getPath.getName.drop(1).toLong
        val content =
          try {
            val in = f.open(s.getPath)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          } catch { case _: java.io.IOException => "" }
        val fields = content.split("\n").map(_.trim).filter(_.nonEmpty)
          .map(l => l.span(_ != '=')).map { case (k, v) => (k, v.drop(1)) }
          .toMap
        (id, fields.get("dir").map(d => PpjoinCommit(id, d,
          fields.get("folds").toSeq.flatMap(_.split(",")
            .filter(_.nonEmpty).map(_.toLong)))))
      }
      .sortBy(_._1)
  }

  /** Every COMMITTED batch, ascending by id — including fold-superseded
    * ones (callers that mint new ids must never reuse a superseded id
    * whose marker still exists). */
  private def ppjoinCommits(
      spark: SparkSession, path: String): Seq[PpjoinCommit] =
    ppjoinMarkerFiles(spark, path).flatMap(_._2)

  /** The batches a reader unions: committed AND not superseded by any
    * compaction marker — a batch EXISTS iff its marker under `commits/`
    * does (torn batch dirs, crashed before their marker, are invisible),
    * and a FOLDED batch stops existing the instant the fold's single
    * marker create lands (atomic visibility flip, no window where a
    * reader sees the rows twice). */
  private def ppjoinVisibleCommits(
      spark: SparkSession, path: String): Seq[PpjoinCommit] = {
    val all = ppjoinCommits(spark, path)
    val superseded = all.flatMap(_.folds).toSet
    all.filterNot(c => superseded(c.id))
  }

  private def ppjoinVisibleDirs(
      spark: SparkSession, path: String, table: String): Seq[String] = {
    val visible = ppjoinVisibleCommits(spark, path)
    if (visible.isEmpty) throw new IllegalStateException(
      s"no committed ppjoin index at $path (no committed batches) — " +
        "initialize with ppjoinIndexInit")
    visible.map(c => s"$path/batches/${c.dir}/$table")
  }

  /** The accepted corpus's prefix-posting table: union of COMMITTED,
    * non-superseded batches only. [[ppjoinIndexInit]] always commits
    * batch 0 (empty tables), so on a committed index the union is never
    * path-less; an uninitialized/stale path fails descriptively. */
  def ppjoinIndexPrefixes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(ppjoinVisibleDirs(spark, path, "prefixes"): _*)

  /** The accepted corpus's gram-set table (committed batches only). */
  def ppjoinIndexSets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(ppjoinVisibleDirs(spark, path, "sets"): _*)

  /** True iff a committed persisted index exists at `path` (`meta/` is
    * written last = the commit marker). */
  def ppjoinIndexExists(spark: SparkSession, path: String): Boolean =
    try { spark.read.parquet(s"$path/meta").head(); true }
    catch { case _: Exception => false }

  /**
   * Initialize a PERSISTED accepted-corpus PPJoin index at `path`:
   * `order/` = the [[ppjoinFrozenOrder]] snapshot taken from `seed`,
   * committed batch 0 (empty `prefixes`/`sets` tables under
   * `batches/b00000000/` with its `commits/` marker), and `meta/` (pct +
   * format version) written LAST as the index-level commit marker. The
   * seed corpus only donates its gram-df snapshot here — ingest it as
   * the first [[ppjoinIndexIngest]] batch, exactly like any later batch.
   *
   * pct lives IN the index, not at the call sites: the persisted
   * prefixes embed the pct used to cut them, so a later ingest under a
   * lower pct would silently probe too-short accepted prefixes and miss
   * candidates (false negatives against the documented lossless
   * contract). Stamping it once and reading it back on every ingestion
   * step makes the mismatch unrepresentable.
   *
   * Re-initializing over an existing index deletes `meta/` FIRST (the
   * index reads as absent for the whole rebuild, so a crash mid-init
   * fails later ingests descriptively instead of mixing layouts), then
   * the old batch/commit state.
   */
  def ppjoinIndexInit(
      spark: SparkSession, path: String, seed: DataFrame,
      pct: Int = 50): Unit = {
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    val f = ppjoinIndexFs(spark, path)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/commits"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/batches"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/prefixes"), true) // v1 leftovers
    f.delete(new org.apache.hadoop.fs.Path(s"$path/sets"), true)
    val orderT = ppjoinFrozenOrder(seed)
    orderT.write.mode("overwrite").parquet(s"$path/order")
    val (e1, e2) = ppjoinIndexTables(seed.limit(0), orderT, pct)
    val d0 = ppjoinBatchDirName(0L, "init")
    e1.write.mode("overwrite").parquet(s"$path/batches/$d0/prefixes")
    e2.write.mode("overwrite").parquet(s"$path/batches/$d0/sets")
    ppjoinMarkCommitted(spark, path, 0L, d0, Seq.empty)
    import spark.implicits._
    Seq((pct, PpjoinIndexFormatVersion)).toDF("pct", "format_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Per-batch commit: the marker under `commits/` created AFTER both of
    * the batch's tables are fully written, recording the batch's
    * per-attempt dir name and (for a compaction) the superseded ids. The
    * create is EXCLUSIVE — two mutators that somehow both minted id
    * (impossible under the guard, narrow races aside) resolve to one
    * winner here. */
  private def ppjoinMarkCommitted(
      spark: SparkSession, path: String, id: Long, dir: String,
      folds: Seq[Long]): Unit = {
    val f = ppjoinIndexFs(spark, path)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/commits"))
    val content = s"dir=$dir" +
      (if (folds.isEmpty) "" else s"\nfolds=${folds.sorted.mkString(",")}")
    val out = f.create(new org.apache.hadoop.fs.Path(f"$path/commits/b$id%08d"), false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** The committed index's (pct, format version); fails descriptively on
    * a missing or pre-stamp layout. */
  def ppjoinIndexMeta(spark: SparkSession, path: String): (Int, Long) = {
    val meta =
      try spark.read.parquet(s"$path/meta")
      catch {
        case e: Exception => throw new IllegalStateException(
          s"no committed ppjoin index at $path (meta/ unreadable) — " +
            s"initialize with ppjoinIndexInit", e)
      }
    require(meta.columns.contains("format_version") &&
        meta.columns.contains("pct"),
      s"ppjoin index at $path has no pct/format_version stamp " +
        s"(pre-v$PpjoinIndexFormatVersion layout) — rebuild with ppjoinIndexInit")
    val m = meta.head()
    val ver = m.getAs[Long]("format_version")
    require(ver == PpjoinIndexFormatVersion,
      s"ppjoin index at $path is format v$ver but this build reads " +
        s"v$PpjoinIndexFormatVersion — rebuild before ingesting")
    (m.getAs[Int]("pct"), ver)
  }

  /**
   * One ingestion step against the persisted index: require-match the
   * meta stamp, run [[incrementalPpjoinKeepIndexed]] under the index's
   * OWN pct and frozen order, then commit the kept docs' prefix/set rows
   * as one batch. Returns the kept batch rows.
   *
   * Crash- and concurrency-safe, the [[AnnIndex]] discipline:
   *
   *  - the whole step runs under the [[MutationGuard]] exclusive marker
   *    (`<path>/_mutating`, heartbeated, stale-takeover) — two
   *    `ingest-dedup-batch` invocations racing the read-then-append
   *    cycle would otherwise each probe an index missing the other's
   *    docs and admit mutual duplicates;
   *  - both tables land in a fresh PER-ATTEMPT `batches/b<id>_<token>/`
   *    dir and become visible only when the `commits/` marker (whose
   *    content records the dir) is created AFTER both writes — a crash
   *    between the writes leaves a torn dir no reader ever unions (v1's
   *    append-mode torn batch silently dropped verify candidates:
   *    undetected false-negative dedup), and the next ingest sweeps it;
   *  - ownership is RE-VERIFIED at the commit edge (immediately before
   *    the marker create): a mutator that stalled past the guard TTL and
   *    was taken over aborts with only a torn dir of its own — it can
   *    never clobber the takeover's committed batch (unique dirs) nor
   *    commit a batch that probed a stale index view;
   *  - the three result frames are pinned (eager localCheckpoint)
   *    before any write, so the probe lineage never relists a
   *    directory it is concurrently growing, and the expensive dedup
   *    plan runs once, not once per output.
   */
  def ppjoinIndexIngest(
      spark: SparkSession, path: String, batch: DataFrame,
      scoreCol: String = "n_chars"): DataFrame =
    MutationGuard.withExclusiveHandle(
        spark, new org.apache.hadoop.fs.Path(s"$path/_mutating"),
        s"ppjoin index at $path", "ingest", PpjoinIndexGuardTtlMillis) { guard =>
      val (pct, _) = ppjoinIndexMeta(spark, path)
      ppjoinSweepTorn(spark, path)
      val orderT = spark.read.parquet(s"$path/order")
      val (kept0, kp0, ks0) = incrementalPpjoinKeepIndexed(batch,
        ppjoinIndexPrefixes(spark, path),
        ppjoinIndexSets(spark, path), orderT, pct, scoreCol)
      val kept = kept0.localCheckpoint(true)
      val kp = kp0.localCheckpoint(true)
      val ks = ks0.localCheckpoint(true)
      val id = ppjoinCommits(spark, path).map(_.id).max + 1
      // the dir is unique to THIS attempt (guard-token-free but
      // UUID-suffixed): a mutator stalled past the TTL and resumed after
      // a takeover writes into its own dir, never the takeover's — then
      // dies at the commit-edge verify below, leaving only a torn dir
      val dname = ppjoinBatchDirName(id,
        java.util.UUID.randomUUID().toString.take(8))
      val bdir = s"$path/batches/$dname"
      kp.write.mode("overwrite").parquet(s"$bdir/prefixes")
      ks.write.mode("overwrite").parquet(s"$bdir/sets")
      // commit-edge re-verify (the FloEngine.verifyLeaseOwnership
      // discipline): a usurped mutator aborts HERE, with its batch
      // invisible — the usurper's committed batches are untouched
      guard.verifyOwnership()
      ppjoinMarkCommitted(spark, path, id, dname, Seq.empty)
      kept
    }

  /** Guarded-context sweep of torn state: batch dirs no commit marker
    * references (a crash before the marker, or a usurped mutator's
    * aborted attempt) and content-less marker files (a crash inside the
    * marker create itself — the batch they would have committed is torn
    * by definition). Only ever called while HOLDING the mutation guard:
    * an unparsable marker can then never be a concurrent commit in
    * flight. */
  private def ppjoinSweepTorn(spark: SparkSession, path: String): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val f = ppjoinIndexFs(spark, path)
    val markers = ppjoinMarkerFiles(spark, path)
    markers.collect { case (id, None) => id }.foreach { id =>
      log.warn(s"sweeping torn (content-less) ppjoin commit marker b$id")
      f.delete(new org.apache.hadoop.fs.Path(f"$path/commits/b$id%08d"), false)
    }
    val referenced = markers.flatMap(_._2).map(_.dir).toSet
    val batchesDir = new org.apache.hadoop.fs.Path(s"$path/batches")
    val allDirs =
      if (f.exists(batchesDir)) f.listStatus(batchesDir).toSeq
        .map(_.getPath).filter(_.getName.startsWith("b"))
      else Seq.empty
    allDirs.filterNot(p => referenced(p.getName)).foreach { p =>
      log.warn(s"sweeping torn (uncommitted) ppjoin index batch $p")
      f.delete(p, true)
    }
  }

  /**
   * Fold every visible committed batch into ONE (the
   * [[graft.engine.FloEngine.compactSmall]] discipline for this index):
   * [[ppjoinIndexPrefixes]]/[[ppjoinIndexSets]] union one parquet dir per
   * committed batch, so a deployment ingesting thousands of small daily
   * batches accumulates thousands of dirs — O(batches) listing and
   * planning on every probe, the small-file creep that kills at 10^4
   * batches. Compaction rewrites the union into a single fresh batch dir
   * and flips visibility with ONE atomic commit-marker create whose
   * `folds=` record supersedes the old ids; crash-safety:
   *
   *  - before the fold marker lands, readers see the old batches (the
   *    folded dir is torn, invisible, swept later);
   *  - the marker create IS the flip — no window where a reader unions
   *    both the old batches and their folded copy (duplicate set rows
   *    would multiply the verify join);
   *  - a crash after the marker leaves superseded markers/dirs as
   *    garbage that [[ppjoinSweepTorn]] + the cleanup below remove on
   *    the next guarded mutation — readers already exclude them.
   *
   * Probe results are unchanged (union of the same rows; PPJoin's
   * candidate and verify joins are row-set functions of the two tables).
   * Returns the number of batches folded (0 = nothing to do).
   */
  def ppjoinIndexCompact(spark: SparkSession, path: String): Int =
    MutationGuard.withExclusiveHandle(
        spark, new org.apache.hadoop.fs.Path(s"$path/_mutating"),
        s"ppjoin index at $path", "compact", PpjoinIndexGuardTtlMillis) { guard =>
      ppjoinIndexMeta(spark, path)
      ppjoinSweepTorn(spark, path)
      val all = ppjoinCommits(spark, path)
      val superseded = all.flatMap(_.folds).toSet
      // fold-superseded markers that survived a crashed earlier cleanup:
      // readers exclude them already; drop them so `folds=` lists and
      // the commits listing stay O(visible)
      val f = ppjoinIndexFs(spark, path)
      all.filter(c => superseded(c.id)).foreach { c =>
        f.delete(new org.apache.hadoop.fs.Path(f"$path/commits/b${c.id}%08d"), false)
        f.delete(new org.apache.hadoop.fs.Path(s"$path/batches/${c.dir}"), true)
      }
      val visible = all.filterNot(c => superseded(c.id))
      if (visible.size <= 1) 0
      else {
        // read the union THROUGH the normal reader paths, write to a
        // fresh dir: the read never lists a dir this op is writing, so
        // no pin needed — each table is one identity re-read of
        // committed parquet
        val id = all.map(_.id).max + 1
        val dname = ppjoinBatchDirName(id,
          java.util.UUID.randomUUID().toString.take(8))
        val bdir = s"$path/batches/$dname"
        ppjoinIndexPrefixes(spark, path)
          .write.mode("overwrite").parquet(s"$bdir/prefixes")
        ppjoinIndexSets(spark, path)
          .write.mode("overwrite").parquet(s"$bdir/sets")
        guard.verifyOwnership()
        ppjoinMarkCommitted(spark, path, id, dname, visible.map(_.id))
        // post-flip cleanup (crash-tolerant: re-run removes leftovers)
        visible.foreach { c =>
          f.delete(new org.apache.hadoop.fs.Path(f"$path/commits/b${c.id}%08d"), false)
          f.delete(new org.apache.hadoop.fs.Path(s"$path/batches/${c.dir}"), true)
        }
        visible.size
      }
    }
}
