package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Approximate-nearest-neighbor search over the embedding column.
 *
 *  - `sim_knn_brute`: exact top-k cosine (the correctness baseline,
 *    oracle-checked against DuckDB's list_cosine_similarity).
 *  - `sim_knn_lsh`: random-hyperplane LSH — banded sign-bit codes bucket
 *    the vectors (one codegen'd `graft_lsh_bands` pass over the corpus),
 *    query-side multi-probe (each band code plus its hamming-1 neighbors),
 *    candidates from bucket collisions only, exact `graft_dot` rerank.
 *  - `sim_knn_ivf`: k-means cells (deterministic init + one distributed
 *    Lloyd iteration), 6-probe, exact rerank.
 *
 * Parameters were tuned against the real testdata (recall@5 vs brute at
 * sf0.001/sf0.1 — see SimilaritySpec's 0.8 bar): 128 planes / 16 bands /
 * hamming-1 probes give ~0.90 recall at ~45% candidate fraction on these
 * near-uniform synthetic vectors; on clustered real-world embeddings the
 * same plan yields far smaller buckets (candidate volume is data-dependent,
 * the plan shape is not: broadcast the tiny probe side, hash-join on
 * (band, code), never an all-pairs cross join of the corpus).
 *
 * All randomness is a fixed-seed PRNG expanded at plan time, so results are
 * deterministic across runs/partitions.
 */
object SimilarityQueries {

  private[graft] def emb(s: SparkSession, d: String): DataFrame = {
    graft.expressions.GraftExtensions.register(s)
    // native array cast, NOT transform(x -> cast(x)): a higher-order lambda
    // is CodegenFallback and knocks the whole collapsed projection (incl.
    // graft_lsh_bands / graft_dot downstream) out of whole-stage codegen
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
  }

  // authoritative hashing/layout constants for the embeddings fixture —
  // every caller (incl. DedupQueries' embedding dedup) must reference these
  // rather than re-assert the values
  private[graft] val Dim = 64
  private[graft] val Seed = 7
  private[graft] val NumPlanes = 128
  private val KnnBands = 16 // r = 8 bits/band

  /** Fixture exports for the ANN verified twins (the SemDeDup protocol:
    * fixed literals because the oracle SQL is static and runs outside
    * the JVM). */
  private[graft] val KnnLshFixturePath = graft.Fixtures.path("knn_lsh_cand")
  private[graft] val KnnIvfFixturePath = graft.Fixtures.path("knn_ivf_cand")
  private[graft] val KnnIvfIdxFixturePath = graft.Fixtures.path("knn_ivf_idx_cand")
  private[graft] val KnnIvfPqFixturePath = graft.Fixtures.path("knn_ivfpq_cand")
  private[graft] val HardNegFixturePath = graft.Fixtures.path("hard_neg_cand")
  private[graft] val KnnIvfAppFixturePath = graft.Fixtures.path("knn_ivf_app_cand")
  private[graft] val TextAnnVecsFixturePath = graft.Fixtures.path("text_ann_vecs")
  private[graft] val TextAnnCandFixturePath = graft.Fixtures.path("text_ann_cand")
  private[graft] val PcaFixturePath = graft.Fixtures.path("pca_model")
  private[graft] val PqAuditSubsFixturePath = graft.Fixtures.path("pq_audit_subs")
  private[graft] val PqAuditCbFixturePath = graft.Fixtures.path("pq_audit_cb")
  private[graft] val PqDistSubsFixturePath = graft.Fixtures.path("pq_dist_subs")
  private[graft] val PqDistCbFixturePath = graft.Fixtures.path("pq_dist_cb")

  private[graft] val PqSubs = 8
  private[graft] val PqCodes = 16
  // the persisted-index configuration (sim_knn_ivfpq / sim_knn_ivf_indexed)
  private[graft] val IdxCells = 16
  private[graft] val IdxCodes = 64

  /** The catalog queries that SERVE a persisted ANN index (call
    * [[ensureIndex]]/[[ensureAppendedIndex]] at query time). Bench
    * pre-builds the indexes outside per-query timing iff one of THESE is
    * in the run — an explicit registry maintained next to ensureIndex,
    * replacing name-pattern matching under which a future index-serving
    * query could silently move the k-means build back inside its first
    * timed serve (the r7 budget breach). IndexRegistrySpec mechanically
    * pins this set against the ensureIndex call sites in the query
    * source, so adding a serving query without updating the registry
    * fails the suite. */
  private[graft] val indexServingQueries: Set[String] = Set(
    "sim_hard_negatives_indexed", "sim_hard_negatives_indexed_verified",
    "sim_knn_ivf_appended", "sim_knn_ivf_appended_verified",
    "sim_knn_ivfpq", "sim_knn_ivfpq_verified",
    "sim_knn_ivf_indexed", "sim_knn_ivf_indexed_verified",
    "sim_knn_ivf_verified",
    "sim_pq_distortion", "sim_pq_distortion_verified",
    "dedup_embedding_indexed", "dedup_embedding_indexed_verified")

  /** Deterministic on-disk location for the persisted ANN index of one
    * testdata dir: keyed by corpus dir + every build parameter + a format
    * version, so a parameter change can never read a stale layout. */
  private[graft] def indexPath(d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    // v3 = cell-MEAN residual coding (IVFADC with the L2-optimal reference;
    // v2's unit-centroid residuals measured WORSE than raw PQ on weakly
    // clustered data — see sim_pq_distortion); the version tag prevents a
    // search from ever reading a stale layout
    s"${sys.props("java.io.tmpdir")}/graft_ann/v3_${tag}_c${IdxCells}_s${PqSubs}_cb${IdxCodes}_i1"
  }

  /** Build the index iff no completed build exists (meta is the commit
    * marker) — the build-once/search-many amortization. The testdata dirs
    * are immutable, so dir + params fully identify the corpus version; a
    * mutable corpus would key this by snapshot/version id instead. */
  private[graft] def ensureIndex(s: SparkSession, d: String): String = {
    val p = indexPath(d)
    if (!graft.operators.AnnIndex.exists(s, p))
      graft.operators.AnnIndex.buildIvfPq(
        emb(s, d).select(col("vec_id").as("id"), col("v")),
        dim = Dim, path = p, cells = IdxCells, subs = PqSubs,
        codes = IdxCodes, lloydIters = 1)
    p
  }

  /** The grown-index twin of [[ensureIndex]]: build on the ~70% of ids
    * with `id % 10 < 7`, then [[graft.operators.AnnIndex.append]] the
    * rest — so the served index exercised by `sim_knn_ivf_appended` is one
    * that actually went through the incremental path. */
  private[graft] def ensureAppendedIndex(s: SparkSession, d: String): String = {
    val p = indexPath(d) + "_app"
    if (!graft.operators.AnnIndex.exists(s, p)) {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.AnnIndex.buildIvfPq(
        e.filter(pmod(col("id"), lit(10)) < 7),
        dim = Dim, path = p, cells = IdxCells, subs = PqSubs,
        codes = IdxCodes, lloydIters = 1)
      graft.operators.AnnIndex.append(s, p,
        e.filter(pmod(col("id"), lit(10)) >= 7))
    }
    p
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact top-5 cosine neighbors for the first 10 vectors (baseline),
    // through the public operator [[graft.operators.Ann.knnBrute]]. The
    // rerank is the bounded-heap graft_topk aggregate, not a window:
    // map-side partials cut the shuffle to k ids per query per partition
    // and nothing sorts the full candidate set — the shape that matters
    // when "10 queries" becomes a 100M-row query table.
    "sim_knn_brute" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.Ann.knnBrute(e, e.filter(col("id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),

    // hard-negative mining for contrastive training: per probe vector, the
    // top-5 most-similar vectors with a DIFFERENT label (the negatives the
    // embedding confuses with positives). Same exact scoring + bounded-heap
    // rerank as sim_knn_brute, label inequality in the join condition —
    // oracle-checked against DuckDB's full recompute.
    "sim_hard_negatives" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"), col("label"))
      graft.operators.Ann.hardNegatives(e, e.filter(col("id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),

    // the same mining through the PERSISTED index (per-epoch mining against
    // a build-once index): probed cells only, labels joined by id after
    // probing so the unlabeled index serves any labeling. Index path not
    // SQL-expressible -> rows-only; QueriesSpec measures recall >= 0.8 vs
    // the exact baseline and label disjointness.
    "sim_hard_negatives_indexed" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"), col("label"))
      graft.operators.AnnIndex.searchHardNegatives(
          s, ensureIndex(s, d), e.filter(col("id") < 10),
          e.select(col("id"), col("label")), k = 5)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of the APPENDED index's serving path: the
    // ADC candidate window of the index that actually went through
    // AnnIndex.append exports as a fixture, and both engines rerank it by
    // exact cosine — proving the grown index's scoring/top-k math
    // engine-independently, not just against the recall bar.
    "sim_knn_ivf_appended_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val q = e.filter(col("id") < 10)
      graft.operators.AnnIndex.prunedCandidateIds(
          s, ensureAppendedIndex(s, d), q,
          probe = 6, rerank = 100, excludeSelf = true)
        .write.mode("overwrite").parquet(KnnIvfAppFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(KnnIvfAppFixturePath), e, q, k = 5)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of text ANN: the hashed-TF-IDF vectors AND
    // the hyperplane candidate pairs (the two non-SQL kernels) export as
    // fixtures; both engines rerank the same candidates by exact cosine
    // over the same vector bits — text similarity's serving math joins
    // the embedding family's engine-independent proof.
    "sim_text_ann_verified" -> ((s, d) => {
      val vecs = graft.operators.CorpusOps
        .denseHashedVectors(Tables.load(s, d, "documents"), buckets = 64)
      vecs.write.mode("overwrite").parquet(TextAnnVecsFixturePath)
      val fv = s.read.parquet(TextAnnVecsFixturePath)
      val probes = fv.filter(col("id") % 29 === 0)
      graft.operators.Ann.knnLshCandidateIds(fv, probes,
          dim = 64, seed = Seed, planes = NumPlanes, bands = KnnBands)
        .write.mode("overwrite").parquet(TextAnnCandFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(TextAnnCandFixturePath), fv, probes, k = 5)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN with query-side multi-probe, through the public
    // operator [[graft.operators.Ann.knnLsh]]: corpus vectors key on their
    // exact band codes; each query probes its own code plus all hamming-1
    // variants per band. The probe side (queries x bands x (r+1)) is tiny
    // and broadcast — the corpus is hash-joined, never crossed. Not
    // SQL-expressible (hyperplane literals) -> rows-only check; recall
    // >= 0.8 vs the brute baseline is asserted in QueriesSpec.
    "sim_knn_lsh" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.Ann.knnLsh(e, e.filter(col("id") < 10), k = 5,
          dim = Dim, seed = Seed, planes = NumPlanes, bands = KnnBands)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of IVF-PQ ANN: the ADC stage (probed cells
    // -> asymmetric-distance scores over persisted codes -> rerank
    // window) exports its candidate pairs, and both engines exact-rerank
    // the same window — ADC's candidate ordering (the one non-SQL step,
    // spec-barred on recall) is exactly what's factored out.
    "sim_knn_ivfpq_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val q = e.filter(col("id") < 10)
      graft.operators.AnnIndex.prunedCandidateIds(
          s, ensureIndex(s, d), q, probe = 6, rerank = 100, excludeSelf = true)
        .write.mode("overwrite").parquet(KnnIvfPqFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(KnnIvfPqFixturePath), e, q, k = 5)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of indexed hard-negative mining: the
    // label-constrained probed-cell candidates export; both engines
    // rerank by exact cosine (the label verdict is baked into the
    // candidate set, and the oracle ALSO re-asserts it from the
    // embeddings table — a label-violating candidate would surface as a
    // row mismatch, not silently rank).
    "sim_hard_negatives_indexed_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"), col("label"))
      val q = e.filter(col("id") < 10)
      val path = ensureIndex(s, d)
      val cents = s.read.parquet(s"$path/centroids")
      val vecs = s.read.parquet(s"$path/vectors")
      val probes = graft.operators.AnnIndex.probeCells(
        q, cents, probe = 6, carryVec = false, carryCols = Seq("label"))
      probes.join(
          vecs.select(col("cell"), col("id"))
            .join(e.select(col("id"), col("label").as("nl")), Seq("id")),
          col("probe_cell") === col("cell") && col("query_id") =!= col("id") &&
            col("label") =!= col("nl"))
        .select(col("query_id"), col("id").as("neighbor_id"))
        .write.mode("overwrite").parquet(HardNegFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(HardNegFixturePath),
          e.select(col("id"), col("v")), q.select(col("id"), col("v")), k = 5)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of persisted-index IVF ANN: the probed-cell
    // candidate stage (k-means cells — the non-SQL step) exports its
    // (query_id, neighbor_id) pairs from the PERSISTED index, and both
    // engines rerank the same candidates by exact cosine — the same split
    // as sim_knn_lsh_verified, over the index the catalog serves.
    "sim_knn_ivf_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val q = e.filter(col("id") < 10)
      val path = ensureIndex(s, d)
      val cents = s.read.parquet(s"$path/centroids")
      val vecs = s.read.parquet(s"$path/vectors")
      graft.operators.AnnIndex.probeCells(q, cents, probe = 6, carryVec = false)
        .join(vecs, col("probe_cell") === col("cell") &&
          col("query_id") =!= col("id"))
        .select(col("query_id"), col("id").as("neighbor_id"))
        .write.mode("overwrite").parquet(KnnIvfFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(KnnIvfFixturePath), e, q, k = 5)
        .orderBy("query_id", "rank")
    }),

    // the ORACLE-CHECKED half of LSH ANN: the hyperplane probe stage (the
    // non-SQL step) exports its candidate (query_id, neighbor_id) pairs as
    // a fixture, and BOTH engines rerank the same candidate set by exact
    // cosine — the hash match proves the scoring, ordering (cos DESC, id
    // ASC), and top-k math engine-independently, leaving only candidate
    // RECALL to QueriesSpec's >= 0.8 bar vs the brute baseline.
    "sim_knn_lsh_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val q = e.filter(col("id") < 10)
      graft.operators.Ann.knnLshCandidateIds(e, q,
          dim = Dim, seed = Seed, planes = NumPlanes, bands = KnnBands)
        .write.mode("overwrite").parquet(KnnLshFixturePath)
      val cand = s.read.parquet(KnnLshFixturePath)
      graft.operators.Ann.rerankCandidateIds(cand, e, q, k = 5)
        .orderBy("query_id", "rank")
    }),

    // IVF ANN: k-means cells from a deterministic init (16 lowest vec_ids)
    // refined by ONE distributed Lloyd iteration (assign via broadcast
    // centroids -> per-dimension mean -> renormalize), then 6-probe + exact
    // rerank. Every centroid join broadcasts a 16-row side; the corpus is
    // never crossed with itself. Cell assignment is an ARGMAX hash
    // aggregate (max of a (cs, -cent_id, uv) struct) — partial aggregation
    // combines the 16 candidate rows map-side, where a window would
    // shuffle-and-sort all n x 16 rows.
    "sim_knn_ivf" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.Ann.knnIvf(e, e.filter(col("id") < 10), k = 5,
          cells = 16, probe = 6)
        .orderBy("query_id", "rank")
    }),

    // Product-quantization audit — the codebook half of the IVF-PQ design
    // that makes billion-vector ANN fit in memory (PQ stores each 64-dim
    // float vector as 8 one-byte codes, a 32x compression). The 64-dim
    // space splits into 8 subspaces of 8 dims; each subspace trains a
    // 16-centroid codebook (deterministic init from the 16 lowest vec_ids +
    // ONE distributed Lloyd iteration, mirroring sim_knn_ivf) and every
    // vector quantizes to its nearest centroid per subspace. The audit
    // reports per-subspace codebook usage and mean squared distortion —
    // the accept/reject evidence before swapping exact vectors for codes.
    // Plan shape: codebooks are 16-row broadcasts; the argmin is a
    // min-of-struct hash aggregate (map-side combine of the 16 candidate
    // rows, no window); the corpus is never self-joined. Not
    // SQL-expressible (iterative k-means) -> rows-only check; QueriesSpec
    // asserts distortion beats a rank-0 baseline and assignments are
    // deterministic.
    "sim_pq_audit" -> ((s, d) => {
      val sub = graft.operators.Ann.pqSubvectors(
        emb(s, d).select(col("vec_id").as("id"), col("v")),
        dim = Dim, subs = PqSubs)
      val cb1 = graft.operators.Ann.pqCodebooks(sub, PqCodes)
      graft.operators.Ann.pqAssign(sub, cb1, carrySubvectors = false)
        .groupBy("sub_idx")
        .agg(countDistinct("code").as("codes_used"),
          (floor(avg("d2") * 10000) / 10000).as("avg_distortion"),
          count(lit(1)).as("n_subvectors"))
        .orderBy("sub_idx")
    }),

    // IVF-PQ composed ANN over the PERSISTED index ([[graft.operators
    // .AnnIndex]]): the index (cells, assignments, codebooks, codes) is
    // built once per corpus version and reused by every search — the
    // amortization a real deployment needs (the r4 ephemeral variant spent
    // ~90% of its time re-training inside the query). The search itself:
    // coarse cells route queries, asymmetric-distance computation over the
    // persisted PQ codes orders candidates WITHOUT touching vectors
    // (cell-partitioned parquet -> probed cells only), exact rerank on the
    // ADC top-100. Not SQL-expressible -> rows-only check; QueriesSpec
    // holds the recall bar vs brute.
    "sim_knn_ivfpq" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.AnnIndex.searchIvfPq(s, ensureIndex(s, d),
          e.filter(col("id") < 10), k = 5, rerank = 100)
        .orderBy("query_id", "rank")
    }),

    // The GROWN index: built on ~70% of the corpus, the rest APPENDED via
    // [[graft.operators.AnnIndex.append]] (hard-assign to frozen cells,
    // code against frozen means/codebooks, append cell partitions, meta
    // last) — the incremental-maintenance path served from the catalog,
    // not just specs: a continuously-ingesting pipeline must absorb new
    // vectors WITHOUT the full rebuild. Not SQL-expressible -> rows-only;
    // QueriesSpec holds the grown index to the SAME recall bar as the
    // built-whole one and requires appended ids to surface.
    "sim_knn_ivf_appended" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.AnnIndex.searchIvfPq(s, ensureAppendedIndex(s, d),
          e.filter(col("id") < 10), k = 5, rerank = 100)
        .orderBy("query_id", "rank")
    }),

    // Pure-IVF search over the SAME persisted index (one build serves both
    // search modes — PQ tables simply unused): probe 6 cells, read only
    // those cells' vector partitions, exact rerank. The head-to-head with
    // the ephemeral sim_knn_ivf (identical cells/probe) is the build-vs-
    // search amortization, isolated. Recall bar in QueriesSpec.
    "sim_knn_ivf_indexed" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      graft.operators.AnnIndex.searchIvf(s, ensureIndex(s, d),
          e.filter(col("id") < 10), k = 5, probe = 6)
        .orderBy("query_id", "rank")
    }),

    // the EXACT-NAME oracle twin of sim_knn_ivf_indexed (closing the 1:1
    // naming convention the rest of the no_oracle tail follows): the
    // probe window sim_knn_ivf_indexed serves — probe-6 cells of the SAME
    // persisted index, self excluded — exports its (query_id, neighbor_id)
    // candidates, and both engines rerank by exact cosine. Same kernel as
    // sim_knn_ivf_verified, keyed to the serving query's name and its own
    // fixture so the twin protocol stays auditable at a glance.
    "sim_knn_ivf_indexed_verified" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val q = e.filter(col("id") < 10)
      val path = ensureIndex(s, d)
      val cents = s.read.parquet(s"$path/centroids")
      val vecs = s.read.parquet(s"$path/vectors")
      graft.operators.AnnIndex.probeCells(q, cents, probe = 6, carryVec = false)
        .join(vecs, col("probe_cell") === col("cell") &&
          col("query_id") =!= col("id"))
        .select(col("query_id"), col("id").as("neighbor_id"))
        .write.mode("overwrite").parquet(KnnIvfIdxFixturePath)
      graft.operators.Ann.rerankCandidateIds(
          s.read.parquet(KnnIvfIdxFixturePath), e, q, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Residual-coding payoff, MEASURED: mean squared reconstruction error
    // per vector for the persisted index's residual codebooks (IVFADC —
    // quantize `uv - mean(cell)`) vs raw-vector PQ codebooks trained at
    // the SAME bit budget (8 subspaces x 64 codes). This measurement is
    // why the v3 index codes against the UN-normalized cell mean: the mean
    // is the L2-optimal reference (residual energy 1 - ||mv||^2, never
    // above raw), while v2's unit-centroid residuals carry 2 - 2 E[cos] —
    // MORE than raw energy on weakly clustered corpora, and measurably
    // worse here (0.48 centroid vs 0.36 raw vs 0.33 mean at sf0.01).
    // Both legs are argmin-by-struct hash aggregates over broadcast
    // codebooks (the corpus is never self-joined); the residual leg reads
    // the persisted artifacts, so it also audits the stored bits. Not
    // SQL-expressible (k-means) -> rows-only check; QueriesSpec pins
    // residual < raw and determinism.
    "sim_pq_distortion" -> ((s, d) => {
      import graft.operators.Ann
      graft.expressions.GraftExtensions.register(s)
      val p = ensureIndex(s, d)
      val vecs = s.read.parquet(s"$p/vectors")
      val cb = s.read.parquet(s"$p/codebooks")
      val means = s.read.parquet(s"$p/means")
      val resid = vecs
        .join(broadcast(means), "cell")
        .select(col("id"), expr("graft_sub(uv, mv)").as("rv"))
      val residD2 = Ann.pqAssign(
        Ann.pqSubvectors(resid, Dim, PqSubs, vecCol = "rv"), cb,
        carrySubvectors = false)
      // pin the raw subvectors: the codebook train consumes them three
      // times (init-id distinct, init join, Lloyd assign) plus the final
      // assign — each re-ran the emb scan + unit + explode otherwise
      val subRaw = Ann.pqSubvectors(
        emb(s, d).select(col("vec_id").as("id"),
          expr("graft_unit(v)").as("uv")), Dim, PqSubs, vecCol = "uv")
        .localCheckpoint(true)
      val rawD2 = Ann.pqAssign(subRaw, Ann.pqCodebooks(subRaw, IdxCodes),
        carrySubvectors = false)
      def mse(df: DataFrame, tag: String) = df
        .agg((floor(avg("d2") * lit(PqSubs) * 1e7) / 1e7).as("mse_per_vector"),
          (count(lit(1)) / PqSubs).cast("long").as("n_vectors"))
        .select(lit(tag).as("variant"), col("mse_per_vector"), col("n_vectors"))
      mse(residD2, "residual_ivfadc").unionAll(mse(rawD2, "raw_pq"))
        .orderBy("variant")
    }),

    // the ORACLE-CHECKED half of the PQ audit: the trained subvectors AND
    // codebooks (k-means — the non-SQL step) export as FIXED-POINT integer
    // fixtures, and both engines recompute the nearest-code assignment
    // (integer squared-L2 argmin, ties to the lowest code) plus the
    // per-subspace usage/distortion audit from identical bits — the
    // quantizer's serving math (assign + audit), engine-independently
    // proven; codebook TRAINING stays on QueriesSpec's distortion bars.
    "sim_pq_audit_verified" -> ((s, d) => {
      val sub = graft.operators.Ann.pqSubvectors(
        emb(s, d).select(col("vec_id").as("id"), col("v")),
        dim = Dim, subs = PqSubs)
      val cb = graft.operators.Ann.pqCodebooks(sub, PqCodes)
      sub.select(col("id"), col("sub_idx"),
          expr("transform(sv, x -> CAST(round(x * 1000) AS BIGINT))").as("sv_fp"))
        .write.mode("overwrite").parquet(PqAuditSubsFixturePath)
      cb.select(col("sub_idx"), col("code"),
          expr("transform(cv, x -> CAST(round(x * 1000) AS BIGINT))").as("cv_fp"))
        .write.mode("overwrite").parquet(PqAuditCbFixturePath)
      val sf = s.read.parquet(PqAuditSubsFixturePath)
      val cf = s.read.parquet(PqAuditCbFixturePath)
      sf.join(broadcast(cf), "sub_idx")
        .withColumn("d2_fp", expr(
          "aggregate(zip_with(sv_fp, cv_fp, (a, b) -> (a - b) * (a - b))," +
            " 0L, (acc, x) -> acc + x)"))
        .groupBy("id", "sub_idx")
        .agg(min(struct(col("d2_fp"), col("code"))).as("best"))
        .select(col("sub_idx"), col("best.code").as("code"),
          col("best.d2_fp").as("d2_fp"))
        .groupBy("sub_idx")
        .agg(countDistinct("code").as("codes_used"),
          sum("d2_fp").as("total_d2_fp"),
          count(lit(1)).as("n_subvectors"))
        .select(col("sub_idx").cast("long").as("sub_idx"), col("codes_used"),
          col("total_d2_fp"), col("n_subvectors"))
        .orderBy("sub_idx")
    }),

    // the ORACLE-CHECKED half of the residual-coding measurement: BOTH
    // legs' subvectors (residual `uv - mean(cell)` from the PERSISTED
    // index; raw unit vectors) and their codebooks export as fixed-point
    // fixtures under a `variant` tag, and both engines recompute each
    // leg's integer argmin assignment and total distortion — the
    // residual-beats-raw verdict rests on engine-independent integer
    // arithmetic over the stored index bits, not on two float k-means
    // runs happening to agree.
    "sim_pq_distortion_verified" -> ((s, d) => {
      import graft.operators.Ann
      graft.expressions.GraftExtensions.register(s)
      val p = ensureIndex(s, d)
      val fp = (c: String) =>
        expr(s"transform($c, x -> CAST(round(x * 1000) AS BIGINT))")
      val resid = s.read.parquet(s"$p/vectors")
        .join(broadcast(s.read.parquet(s"$p/means")), "cell")
        .select(col("id"), expr("graft_sub(uv, mv)").as("rv"))
      val residSub = Ann.pqSubvectors(resid, Dim, PqSubs, vecCol = "rv")
      // pin: the fixture export AND the codebook train (3 internal
      // consumers) read the raw subvectors
      val rawSub = Ann.pqSubvectors(
        emb(s, d).select(col("vec_id").as("id"),
          expr("graft_unit(v)").as("uv")), Dim, PqSubs, vecCol = "uv")
        .localCheckpoint(true)
      val rawCb = Ann.pqCodebooks(rawSub, IdxCodes)
      residSub.select(lit("residual_ivfadc").as("variant"), col("id"),
          col("sub_idx"), fp("sv").as("sv_fp"))
        .unionAll(rawSub.select(lit("raw_pq").as("variant"), col("id"),
          col("sub_idx"), fp("sv").as("sv_fp")))
        .write.mode("overwrite").parquet(PqDistSubsFixturePath)
      s.read.parquet(s"$p/codebooks")
        .select(lit("residual_ivfadc").as("variant"), col("sub_idx"),
          col("code"), fp("cv").as("cv_fp"))
        .unionAll(rawCb.select(lit("raw_pq").as("variant"), col("sub_idx"),
          col("code"), fp("cv").as("cv_fp")))
        .write.mode("overwrite").parquet(PqDistCbFixturePath)
      val sf = s.read.parquet(PqDistSubsFixturePath)
      val cf = s.read.parquet(PqDistCbFixturePath)
      sf.join(broadcast(cf), Seq("variant", "sub_idx"))
        .withColumn("d2_fp", expr(
          "aggregate(zip_with(sv_fp, cv_fp, (a, b) -> (a - b) * (a - b))," +
            " 0L, (acc, x) -> acc + x)"))
        .groupBy("variant", "id", "sub_idx")
        .agg(min(struct(col("d2_fp"), col("code"))).as("best"))
        .groupBy("variant")
        .agg(sum(col("best.d2_fp")).as("total_d2_fp"),
          count(lit(1)).as("n_subvectors"))
        .orderBy("variant")
    }),

    // per-label centroid similarity: group embeddings by label, average the
    // vectors (element-wise), report each label's centroid norm — exercises
    // vector aggregation without a UDAF
    // text-knn over the feature-hashed TF-IDF vectors (the text → vector
    // bridge, exact-INTEGER inner products end to end): probe docs
    // (doc_id % 29 = 0) join the sparse (doc_id, bucket, weight) corpus on
    // bucket, dot products sum per pair, top-5 by (dot DESC, id). Probe-
    // bounded brute force — the correctness baseline shape of
    // sim_knn_brute; epoch-scale mining feeds these vectors to AnnIndex.
    // Pairs sharing no bucket have dot 0 and drop; identical semantics in
    // the oracle, so the hash match proves vectors AND ranking.
    "sim_text_knn" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      // Dense 64-bucket long vectors + codegen'd exact integer dots
      // (graft_dotl) instead of the sparse (doc, bucket, weight) bucket
      // equi-join: these vectors are DENSE in all 64 buckets, so the
      // sparse join materialized |probes|·|corpus|·64 rows (55 M at
      // sf0.1) through a hash aggregate just to sum 64 products per pair
      // — the dense broadcast-NLJ evaluates the same exact integer sum
      // in one fused loop per pair, no pair-explosion shuffle. Pair
      // inclusion is preserved bit-for-bit: the sparse join emitted
      // (q, n) iff they share ≥ 1 mutually-nonzero bucket ⟺
      // Σ|wq|·|wc| > 0, and absent sparse rows are exactly the zero
      // weights, so the dense dot equals the sparse sum. Pinned AFTER
      // the per-doc densify so the HOF map-build never rides the
      // pair loop (the HOF-poisoning discipline, PLANS.md).
      val dense = graft.operators.CorpusOps
        .denseHashedVectorsLong(Tables.load(s, d, "documents"), buckets = 64)
        .withColumnRenamed("id", "doc_id")
        .withColumn("a", expr("transform(v, x -> abs(x))"))
        .localCheckpoint(true)
      // the probe broadcast is this query's DESIGN (probe-bounded brute
      // force — the correctness baseline; sim_text_ann is the scale
      // path): probes are 1/29 of the corpus, so the documented ceiling
      // is ~300 M docs (≈ 10 M probe rows × ~600 B/row under the 8 GB
      // broadcast cap); past that, use sim_text_ann
      val probes = dense.filter(col("doc_id") % 29 === 0)
        .select(col("doc_id").as("query_id"),
          col("v").as("qv"), col("a").as("qa"))
      val dots = broadcast(probes)
        .join(dense.select(col("doc_id").as("neighbor_id"),
            col("v").as("nv"), col("a").as("na")),
          col("query_id") =!= col("neighbor_id") &&
            expr("graft_dotl(qa, na)") > 0)
        .select(col("query_id"), col("neighbor_id"),
          expr("graft_dotl(qv, nv)").as("dot"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("neighbor_id"))
      dots.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "dot", "rank")
        .orderBy("query_id", "rank")
    }),

    // the SCALE path of text similarity: the same hashed-TF-IDF vectors,
    // densified and unit-normalized, searched through the existing
    // hyperplane-LSH ANN plan instead of the probe-bounded brute force —
    // text and embeddings now share one similarity stack end to end.
    // no_oracle (hyperplanes); QueriesSpec holds recall >= 0.8 against
    // the exact cosine brute force over the same vectors at two SFs.
    "sim_text_ann" -> ((s, d) => {
      // pin the dense vectors: corpus codes, probe codes, and the rerank
      // reattach all read them (three lazy re-derivations otherwise)
      val vecs = graft.operators.CorpusOps
        .denseHashedVectors(Tables.load(s, d, "documents"), buckets = 64)
        .localCheckpoint(true)
      val probes = vecs.filter(col("id") % 29 === 0)
      graft.operators.Ann.knnLsh(vecs, probes, k = 5, dim = 64)
        .orderBy("query_id", "rank")
    }),

    "sim_label_centroids" -> ((s, d) => {
      val e = emb(s, d).select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      e.groupBy("label", "pos").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(expr("floor(sqrt(sum((sx / n) * (sx / n))) * 1000) / 1000").as("centroid_norm"),
          max("n").as("n_vectors"))
        .orderBy("label")
    }),

    // per-label mean silhouette against the label centroids (the simplified
    // / centroid silhouette: a = distance to own centroid, b = nearest
    // other centroid, s = (b-a)/max(a,b)) — the cluster-quality audit run
    // before trusting labels for SemDeDup cells or hard-negative strata.
    // Scale shape: centroids are ONE hash aggregate collapsing to
    // |labels|·dim rows, broadcast; the corpus pays one (vec, dim) explode
    // joined against that broadcast (rows = n·dim·|labels| — linear in n,
    // the |labels| factor is inherent to centroid silhouette); everything
    // downstream is per-vector then a |labels|-row aggregate. No pairwise
    // term anywhere (full silhouette is O(n²) — exactly what this variant
    // exists to avoid at corpus scale). Exactness: coordinates quantize to
    // 1e6 fixed-point; centroids floor-divide on doubles (exact-integer
    // sums, deterministic IEEE); squared distances are exact BIGINT sums;
    // sqrt of an exact integer is correctly-rounded IEEE so the final
    // ratio matches DuckDB bit-for-bit before its 1e6 floor.
    "sim_silhouette" -> ((s, d) =>
      graft.operators.EvalOps.silhouette(
        emb(s, d).select(col("vec_id"), col("label"), col("v")))),

    // PCA projection, oracle-verified: the d×d eigensolve is driver-side
    // (not SQL-expressible) so the 1e9-scaled eigenvectors export as a
    // fixture — then BOTH engines recompute the fixed-point quantization
    // and the integer projection dot products exactly. The Spark plan
    // inlines the coefficients as literals: one codegen'd scan, no join,
    // no shuffle (the 100 TB projection-pass shape); the oracle does the
    // equivalent fixture-join group-by.
    "sim_pca_project" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val model = graft.operators.Pca.fit(e, r = 8)
      graft.operators.Pca.modelTable(e, model)
        .coalesce(1).write.mode("overwrite").parquet(PcaFixturePath)
      graft.operators.Pca.project(e, model.wFp).orderBy("vec_id")
    }),

    // kNN in the PCA-reduced space — the "cut 64 dims to 8, then search"
    // composition. Integer squared-L2 ranking with id tie-break, so the
    // oracle recomputes projection, offset-scaling, and the full top-5
    // from the same fixture (written here too: fit is deterministic, so
    // either writer produces identical bits). QueriesSpec measures recall
    // vs the full-space exact ranking.
    "sim_knn_pca" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val model = graft.operators.Pca.fit(e, r = 8)
      graft.operators.Pca.modelTable(e, model)
        .coalesce(1).write.mode("overwrite").parquet(PcaFixturePath)
      val proj = graft.operators.Pca.project(e, model.wFp)
      graft.operators.Pca.knnProjected(
          proj, proj.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),

    // embedding-norm profile (the sanity gate before ANY similarity work:
    // un-normalized or zero vectors silently corrupt cosine math): exact
    // fixed-point squared norms per vector, IEEE-sqrt to the 1e6-scaled
    // norm, corpus-level min/max/floored-mean and zero-vector count in
    // one row. One explode + two aggregates, no joins.
    "sim_norm_profile" -> ((s, d) => {
      val norms = emb(s, d)
        .select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(col("vec_id"),
          floor(col("x") * 1000000).cast("long").as("xfp"))
        .groupBy("vec_id")
        .agg(sum(col("xfp") * col("xfp")).as("norm2"))
        .select(col("norm2"),
          floor(sqrt(col("norm2").cast("double"))).as("norm_fp"))
      norms.agg(count(lit(1)).as("n_vectors"),
        min("norm_fp").as("min_norm_fp"),
        max("norm_fp").as("max_norm_fp"),
        floor(sum("norm_fp").cast("double") / count(lit(1))).as("mean_norm_fp"),
        sum(when(col("norm2") === 0, 1L).otherwise(0L)).as("n_zero_vectors"))
    }),

    // per-label embedding drift between two corpus halves (the embedding-
    // space analog of pipe_ks_drift: did a re-embed / ingest change move
    // the classes?): fixed-point centroids per (half, label) from ONE
    // aggregate each, then the exact-integer squared-distance between
    // halves per label, surfaced as the 1e6-scaled L2. |labels|·dim
    // intermediate rows — the corpus is scanned once per half.
    "sim_embedding_drift" -> ((s, d) => {
      val e = emb(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(col("label"), col("pos"),
          floor(col("x") * 1000000).cast("long").as("xfp"),
          (col("vec_id") % 2 === 0).as("in_a"))
      def cent(flag: Boolean, cName: String, nName: String) =
        e.filter(col("in_a") === flag)
          .groupBy("label", "pos")
          .agg(floor(sum("xfp").cast("double") / count(lit(1))).as(cName),
            count(lit(1)).as(nName))
      cent(flag = true, "ca", "na")
        .join(cent(flag = false, "cb", "nb"), Seq("label", "pos"))
        .groupBy("label")
        .agg(max("na").as("n_a"), max("nb").as("n_b"),
          sum((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("d2"))
        .select(col("label"), col("n_a"), col("n_b"),
          floor(sqrt(col("d2").cast("double"))).as("drift_fp"))
        .orderBy("label")
    }),

    // ORACLE-CHECKED recall audit: how much top-5 ranking fidelity does
    // the 64->8 PCA compression cost? Both rankings are deterministic
    // (exact integer L2 in the reduced space, exact cosine + id tiebreak
    // in the full space), so the per-query overlap and its histogram are
    // exact — unlike the LSH/IVF recall bars (hyperplane/k-means guts
    // aren't SQL-expressible, spec-only), this one hash-checks
    // engine-independently end to end. Scale: both top-5 legs are the
    // already-audited bounded-heap plans; the audit itself is a semi join
    // on (query, neighbor) + a |0..5|-row histogram.
    "sim_recall_pca" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val model = graft.operators.Pca.fit(e, r = 8)
      graft.operators.Pca.modelTable(e, model)
        .coalesce(1).write.mode("overwrite").parquet(PcaFixturePath)
      val proj = graft.operators.Pca.project(e, model.wFp)
      val pcaTop = graft.operators.Pca
        .knnProjected(proj, proj.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val bruteTop = graft.operators.Ann
        .knnBrute(e, e.filter(col("id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = bruteTop
        .join(pcaTop, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      bruteTop.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("hits"), lit(0L)).as("hits"))
        .groupBy("hits").agg(count(lit(1)).as("n_queries"))
        .withColumn("recall_ppm", expr("hits * 1000000 div 5"))
        .orderBy("hits")
    }),

    // PCA-residual outliers: vectors whose energy the fitted subspace
    // explains least — the classic structural-anomaly detector. Shares
    // the sim_pca_project fixture (deterministic fit, identical bits);
    // the oracle recomputes projections, exact norm sums, and the
    // identically-ordered residual chain.
    "sim_pca_outliers" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"), col("v"))
      val model = graft.operators.Pca.fit(e, r = 8)
      graft.operators.Pca.modelTable(e, model)
        .coalesce(1).write.mode("overwrite").parquet(PcaFixturePath)
      graft.operators.Pca.outliers(e, model, k = 20)
    }),

    // MMR diversity re-rank (Carbonell & Goldstein 1998): top-20 by
    // milli-cosine to the probe, then 10 greedy rel − max-sim steps. The
    // greedy loop is sequential BY DEFINITION and runs on the driver over
    // the bounded candidate set; the oracle unrolls every step as a CTE
    // and matches the full selection, rank by rank.
    "sim_mmr_rerank" -> ((s, d) =>
      graft.operators.Mmr.rerank(
          emb(s, d).select(col("vec_id").as("id"), col("v")),
          probeId = 0L, n = 20, k = 10)
        .orderBy("rank")))

  val oracles: Map[String, String] = Map(
    "sim_mmr_rerank" -> graft.operators.Mmr.oracleSql(0, 20, 10),
    "sim_pca_outliers" ->
      graft.operators.Pca.outliersOracleSql(PcaFixturePath, 20),

    // recompute quantization + the 8 integer projection dot products from
    // the embeddings table and the exported eigenvector fixture
    "sim_pca_project" ->
      s"""WITH w AS (SELECT * FROM read_parquet('$PcaFixturePath/*.parquet')),
        |q AS (
        |  SELECT vec_id,
        |    [CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
        |     FOR x IN embedding] AS qv
        |  FROM embeddings
        |)
        |SELECT vec_id,
        |  CAST(SUM(CASE WHEN comp = 0 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p0,
        |  CAST(SUM(CASE WHEN comp = 1 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN comp = 2 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN comp = 3 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN comp = 4 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN comp = 5 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p5,
        |  CAST(SUM(CASE WHEN comp = 6 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p6,
        |  CAST(SUM(CASE WHEN comp = 7 THEN qv[i + 1] * w.w ELSE 0 END) AS BIGINT) AS p7
        |FROM q, w
        |GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin,

    // recompute projection -> offset-scale -> exact integer L2 top-5 with
    // the (dist2, id) tie order from the embeddings table + fixture
    "sim_knn_pca" ->
      s"""WITH w AS (SELECT * FROM read_parquet('$PcaFixturePath/*.parquet')),
        |q AS (
        |  SELECT vec_id,
        |    [CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
        |     FOR x IN embedding] AS qv
        |  FROM embeddings
        |), proj AS (
        |  SELECT vec_id, comp,
        |    (CAST(SUM(qv[i + 1] * w.w) AS BIGINT) + 70000000000000000)
        |      // 1000000000 AS ps
        |  FROM q, w GROUP BY vec_id, comp
        |), pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(SUM((a.ps - b.ps) * (a.ps - b.ps)) AS BIGINT) AS dist2
        |  FROM proj a JOIN proj b
        |    ON a.comp = b.comp AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 10
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, neighbor_id, dist2,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dist2 ASC, neighbor_id ASC) AS INT) AS rank
        |  FROM pairs
        |)
        |SELECT query_id, neighbor_id, dist2, rank FROM ranked
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "sim_text_knn" ->
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
        |  FROM tf JOIN df USING (term), n),
        |v AS (
        |  SELECT doc_id, bucket, CAST(SUM(sgn * score) AS BIGINT) AS weight
        |  FROM sc GROUP BY 1, 2 HAVING SUM(sgn * score) <> 0),
        |dots AS (
        |  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
        |    CAST(SUM(a.weight * b.weight) AS BIGINT) AS dot
        |  FROM v a JOIN v b USING (bucket)
        |  WHERE a.doc_id % 29 = 0 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT query_id, neighbor_id, dot,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, dot, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_hard_negatives" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b
        |    ON b.vec_id <> a.vec_id AND b.label <> a.label
        |  WHERE a.vec_id < 10)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank the exported ADC window — same contract as the other ANN twins
    "sim_knn_ivfpq_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KnnIvfPqFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank the exported label-constrained candidates; the label
    // inequality is re-asserted from the embeddings table itself
    "sim_hard_negatives_indexed_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$HardNegFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id
        |  WHERE a.label <> b.label)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank the exported IVF candidate set — same contract as the LSH twin
    "sim_knn_ivf_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KnnIvfFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank sim_knn_ivf_indexed's exported probe window — the exact-name
    // twin, same rerank contract over the serving query's own fixture
    "sim_knn_ivf_indexed_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KnnIvfIdxFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank the APPENDED index's exported ADC window — same contract as
    // sim_knn_ivf_verified, over the index that grew through append
    "sim_knn_ivf_appended_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KnnIvfAppFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // recompute the integer argmin assignment + per-subspace audit from
    // the exported fixed-point subvector/codebook fixtures
    "sim_pq_audit_verified" ->
      s"""WITH s AS (SELECT * FROM read_parquet('$PqAuditSubsFixturePath/*.parquet')),
        |c AS (SELECT * FROM read_parquet('$PqAuditCbFixturePath/*.parquet')),
        |d AS (
        |  SELECT s.id, s.sub_idx, c.code,
        |    CAST(list_sum(list_transform(range(1, len(sv_fp) + 1),
        |      i -> (sv_fp[i] - cv_fp[i]) * (sv_fp[i] - cv_fp[i]))) AS BIGINT) AS d2
        |  FROM s JOIN c USING (sub_idx)),
        |best AS (
        |  SELECT id, sub_idx, code, d2 FROM d
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY id, sub_idx
        |    ORDER BY d2, code) = 1)
        |SELECT CAST(sub_idx AS BIGINT) AS sub_idx,
        |       CAST(COUNT(DISTINCT code) AS BIGINT) AS codes_used,
        |       CAST(SUM(d2) AS BIGINT) AS total_d2_fp,
        |       CAST(COUNT(*) AS BIGINT) AS n_subvectors
        |FROM best GROUP BY 1 ORDER BY 1""".stripMargin,

    // recompute both legs' integer assignments + total distortion from
    // the variant-tagged fixed-point fixtures
    "sim_pq_distortion_verified" ->
      s"""WITH s AS (SELECT * FROM read_parquet('$PqDistSubsFixturePath/*.parquet')),
        |c AS (SELECT * FROM read_parquet('$PqDistCbFixturePath/*.parquet')),
        |d AS (
        |  SELECT s.variant, s.id, s.sub_idx, c.code,
        |    CAST(list_sum(list_transform(range(1, len(sv_fp) + 1),
        |      i -> (sv_fp[i] - cv_fp[i]) * (sv_fp[i] - cv_fp[i]))) AS BIGINT) AS d2
        |  FROM s JOIN c ON c.variant = s.variant AND c.sub_idx = s.sub_idx),
        |best AS (
        |  SELECT variant, id, sub_idx, d2 FROM d
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY variant, id, sub_idx
        |    ORDER BY d2, code) = 1)
        |SELECT variant, CAST(SUM(d2) AS BIGINT) AS total_d2_fp,
        |       CAST(COUNT(*) AS BIGINT) AS n_subvectors
        |FROM best GROUP BY variant ORDER BY variant""".stripMargin,

    // rerank the exported text-ANN candidates over the exported vectors —
    // both sides of the cosine come from fixtures, so the hash match
    // proves the scoring/ordering math on identical bits
    "sim_text_ann_verified" ->
      s"""WITH v AS (SELECT * FROM read_parquet('$TextAnnVecsFixturePath/*.parquet')),
        |c AS (SELECT * FROM read_parquet('$TextAnnCandFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.v, b.v) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN v a ON a.id = c.query_id
        |         JOIN v b ON b.id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // rerank the exported LSH candidate set — same ordering contract as
    // sim_knn_brute, restricted to the fixture's pairs
    "sim_knn_lsh_verified" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KnnLshFixturePath/*.parquet'))
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, c.neighbor_id) AS rank
        |  FROM c JOIN embeddings a ON a.vec_id = c.query_id
        |         JOIN embeddings b ON b.vec_id = c.neighbor_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_knn_brute" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 10)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_label_centroids" ->
      """WITH flat AS (
        |  SELECT label, t.pos, CAST(embedding[t.pos] AS DOUBLE) AS x
        |  FROM embeddings, generate_series(1, 64) AS t(pos))
        |, agg AS (
        |  SELECT label, pos, SUM(x) AS sx, COUNT(*) AS n FROM flat GROUP BY 1, 2)
        |SELECT label, FLOOR(SQRT(SUM((sx / n) * (sx / n))) * 1000) / 1000 AS centroid_norm,
        |       MAX(n) AS n_vectors
        |FROM agg GROUP BY label ORDER BY label""".stripMargin,

    // same fixed-point squared norms, same IEEE sqrt and floored mean
    "sim_norm_profile" ->
      """WITH f AS (
        |  SELECT vec_id,
        |    CAST(FLOOR(CAST(embedding[t.pos] AS DOUBLE) * 1000000) AS BIGINT) AS xfp
        |  FROM embeddings, generate_series(1, 64) AS t(pos)
        |), n2 AS (
        |  SELECT vec_id, CAST(SUM(xfp * xfp) AS BIGINT) AS norm2 FROM f GROUP BY 1
        |), nf AS (
        |  SELECT norm2,
        |    CAST(FLOOR(SQRT(CAST(norm2 AS DOUBLE))) AS BIGINT) AS norm_fp
        |  FROM n2)
        |SELECT COUNT(*) AS n_vectors,
        |  MIN(norm_fp) AS min_norm_fp, MAX(norm_fp) AS max_norm_fp,
        |  CAST(FLOOR(CAST(SUM(norm_fp) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS mean_norm_fp,
        |  CAST(SUM(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_vectors
        |FROM nf""".stripMargin,

    // same parity halves, same floor-on-double centroids, same exact
    // integer squared distance and IEEE sqrt
    "sim_embedding_drift" ->
      """WITH f AS (
        |  SELECT vec_id, label, t.pos,
        |    CAST(FLOOR(CAST(embedding[t.pos] AS DOUBLE) * 1000000) AS BIGINT) AS xfp,
        |    vec_id % 2 = 0 AS in_a
        |  FROM embeddings, generate_series(1, 64) AS t(pos)
        |), ca AS (
        |  SELECT label, pos,
        |    CAST(FLOOR(CAST(SUM(xfp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ca,
        |    CAST(COUNT(*) AS BIGINT) AS na
        |  FROM f WHERE in_a GROUP BY 1, 2
        |), cb AS (
        |  SELECT label, pos,
        |    CAST(FLOOR(CAST(SUM(xfp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cb,
        |    CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM f WHERE NOT in_a GROUP BY 1, 2)
        |SELECT label, MAX(na) AS n_a, MAX(nb) AS n_b,
        |  CAST(FLOOR(SQRT(CAST(SUM((ca - cb) * (ca - cb)) AS DOUBLE))) AS BIGINT)
        |    AS drift_fp
        |FROM ca JOIN cb USING (label, pos)
        |GROUP BY label ORDER BY label""".stripMargin,

    // both rankings recomputed from scratch (brute cosine + fixture-join
    // PCA projection), then the same semi-join overlap histogram
    "sim_recall_pca" ->
      s"""WITH brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |        ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |    WHERE a.vec_id < 10)
        |  WHERE rank <= 5
        |), w AS (SELECT * FROM read_parquet('$PcaFixturePath/*.parquet')),
        |q AS (
        |  SELECT vec_id,
        |    [CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
        |     FOR x IN embedding] AS qv
        |  FROM embeddings
        |), proj AS (
        |  SELECT vec_id, comp,
        |    (CAST(SUM(qv[i + 1] * w.w) AS BIGINT) + 70000000000000000)
        |      // 1000000000 AS ps
        |  FROM q, w GROUP BY vec_id, comp
        |), pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(SUM((a.ps - b.ps) * (a.ps - b.ps)) AS BIGINT) AS dist2
        |  FROM proj a JOIN proj b
        |    ON a.comp = b.comp AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 10
        |  GROUP BY 1, 2
        |), pca AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY dist2 ASC, neighbor_id ASC) AS rank
        |    FROM pairs)
        |  WHERE rank <= 5
        |), hits AS (
        |  SELECT b.query_id, CAST(COUNT(p.neighbor_id) AS BIGINT) AS hits
        |  FROM brute b LEFT JOIN pca p
        |    ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
        |  GROUP BY 1)
        |SELECT hits, COUNT(*) AS n_queries,
        |  CAST(hits * 1000000 // 5 AS BIGINT) AS recall_ppm
        |FROM hits GROUP BY hits ORDER BY hits""".stripMargin,

    // same 1e6 fixed-point quantization, same floor-on-double centroid,
    // same exact-integer squared distances and IEEE sqrt ratio (positions
    // are 1-based here vs Spark's 0-based posexplode — the join is
    // within-engine, so only consistency matters)
    "sim_silhouette" ->
      """WITH f AS (
        |  SELECT vec_id, label, t.pos,
        |    CAST(FLOOR(CAST(embedding[t.pos] AS DOUBLE) * 1000000) AS BIGINT) AS xfp
        |  FROM embeddings, generate_series(1, 64) AS t(pos)
        |), cent AS (
        |  SELECT label AS clabel, pos,
        |    CAST(FLOOR(CAST(SUM(xfp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cfp
        |  FROM f GROUP BY 1, 2
        |), d2 AS (
        |  SELECT f.vec_id, f.label, c.clabel,
        |    CAST(SUM((f.xfp - c.cfp) * (f.xfp - c.cfp)) AS BIGINT) AS d2
        |  FROM f JOIN cent c USING (pos) GROUP BY 1, 2, 3
        |), ab AS (
        |  SELECT vec_id, label,
        |    MIN(CASE WHEN clabel = label THEN d2 END) AS a2,
        |    MIN(CASE WHEN clabel <> label THEN d2 END) AS b2
        |  FROM d2 GROUP BY 1, 2
        |), sil AS (
        |  SELECT vec_id, label,
        |    CASE WHEN a2 = 0 AND b2 = 0 THEN 0
        |         ELSE CAST(FLOOR(1000000.0 *
        |           (SQRT(CAST(b2 AS DOUBLE)) - SQRT(CAST(a2 AS DOUBLE))) /
        |           GREATEST(SQRT(CAST(a2 AS DOUBLE)), SQRT(CAST(b2 AS DOUBLE))))
        |           AS BIGINT) END AS s_fp
        |  FROM ab)
        |SELECT label, COUNT(*) AS n,
        |  CAST(FLOOR(CAST(SUM(s_fp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_sil_ppm
        |FROM sil GROUP BY label ORDER BY label""".stripMargin)
}
