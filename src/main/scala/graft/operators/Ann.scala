package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search as library operators over any
 * `(id: long, v: array<double>)` table — the catalog's `sim_knn_*` /
 * `dedup_embedding_lsh` queries delegate here, so the oracle + recall bars
 * cover these public entry points (operator-as-API, the same treatment as
 * [[AsofJoin]]/[[RangeJoin]]/[[CorpusOps]]).
 *
 * Scale contract shared by every method: the corpus side is only ever
 * hash-joined on band codes or fed through a bounded-heap rerank — never
 * broadcast, never self-crossed; the probe side of [[knnLsh]] is
 * broadcast and must be small (queries x bands x (r+1) rows).
 */
object Ann {

  /** Banded sign-bit LSH codes (one codegen `graft_lsh_bands` node):
    * (id, v, band_idx, code). */
  private[graft] def bandedCodes(
      e: DataFrame, seed: Int, planes: Int, bands: Int, dim: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(e.sparkSession)
    e.select(col("id"), col("v"),
      posexplode(expr(s"graft_lsh_bands(v, $seed, $planes, $bands, $dim)"))
        .as(Seq("band_idx", "code")))
  }

  private[operators] def cosRerank(scored: DataFrame, k: Int): DataFrame =
    TopK.topKPerKey(scored, Seq("query_id"),
        struct(col("cos"), -col("neighbor_id")), Seq("neighbor_id"), k)
      .select(col("query_id"), col("neighbor_id"), col("rn").as("rank"))

  private val cosine =
    expr("graft_dot(qv, nv) / (sqrt(graft_dot(qv, qv)) * sqrt(graft_dot(nv, nv)))")

  /**
   * Exact top-k cosine neighbors (the correctness baseline): every
   * (query, corpus) pair scored — O(|queries| x |corpus|) by definition,
   * use for oracles and small probe sets; [[knnLsh]] is the scale path.
   * Returns (query_id, neighbor_id, rank 1..k).
   *
   * `excludeSelf` (default true, here and in [[knnLsh]]/[[knnIvf]]/
   * [[knnIvfPq]]) drops corpus rows whose id equals the query id — correct
   * when queries are drawn FROM the corpus (the self-search case); pass
   * false when corpus and queries are distinct tables whose id spaces
   * merely overlap, or a query's true neighbor that happens to share its
   * id is silently lost.
   */
  def knnBrute(
      corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val scored = queries.select(col("id").as("query_id"), col("v").as("qv"))
      .join(corpus.select(col("id").as("neighbor_id"), col("v").as("nv")),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), cosine.as("cos"))
    cosRerank(scored, k)
  }

  /**
   * Hard-negative mining for contrastive training data: for every query
   * vector, the top-k most-similar corpus vectors with a DIFFERENT label —
   * the highest-value negatives precisely because the embedding thinks
   * they're positives. Both inputs are (id, v, label); output is
   * (query_id, neighbor_id, rank). Exact (brute) scoring with the same
   * bounded-heap rerank as [[knnBrute]]: the shuffle carries at most k
   * ids per query per partition, never the scored cross product.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val scored = queries
      .select(col("id").as("query_id"), col("v").as("qv"), col("label").as("ql"))
      .join(corpus
          .select(col("id").as("neighbor_id"), col("v").as("nv"), col("label").as("nl")),
        col("query_id") =!= col("neighbor_id") && col("ql") =!= col("nl"))
      .select(col("query_id"), col("neighbor_id"), cosine.as("cos"))
    cosRerank(scored, k)
  }

  /**
   * LSH-bucketed top-k cosine neighbors with query-side hamming-1
   * multi-probe: corpus vectors key on their exact band codes, each query
   * probes its own code plus every 1-bit variant per band, candidates come
   * from bucket collisions only, and the exact rerank runs on candidates
   * through the bounded-heap aggregate. Defaults are the measured
   * recall >= 0.8 configuration from the catalog (128 planes / 16 bands).
   */
  def knnLsh(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      seed: Int = 7,
      planes: Int = 128,
      bands: Int = 16,
      excludeSelf: Boolean = true): DataFrame = {
    rerankCandidateIds(
      knnLshCandidateIds(corpus, queries, dim, seed, planes, bands, excludeSelf),
      corpus, queries, k)
  }

  /** The LSH probe stage of [[knnLsh]] as an id-pair table: multiprobe
    * band codes hash-join the corpus codes, and the distinct carries ONLY
    * the 16-byte (query_id, neighbor_id) pair — vectors re-attach in
    * [[rerankCandidateIds]] after the dedup, so wide float arrays never
    * ride the candidate shuffle (the same discipline as
    * [[nearDupPairsCosine]]). Exported as the `sim_knn_lsh_verified`
    * fixture: DuckDB reranks the same candidate set, proving the
    * scoring/ordering math engine-independently. */
  private[graft] def knnLshCandidateIds(
      corpus: DataFrame, queries: DataFrame, dim: Int,
      seed: Int, planes: Int, bands: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(planes % bands == 0, "planes must divide evenly into bands")
    val r = planes / bands
    val corpusCodes = bandedCodes(corpus.select(col("id"), col("v")),
        seed, planes, bands, dim)
      .select(col("id"), col("band_idx"), col("code"))
    val probeArr = array((col("code") +:
      (0 until r).map(j => col("code").bitwiseXOR(lit(1L << j)))): _*)
    val probes = bandedCodes(queries.select(col("id"), col("v")),
        seed, planes, bands, dim)
      .select(col("id").as("query_id"), col("band_idx"),
        explode(probeArr).as("code"))
    broadcast(probes).join(corpusCodes, Seq("band_idx", "code"))
      .filter(if (excludeSelf) col("query_id") =!= col("id") else lit(true))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .distinct()
  }

  /** Exact-cosine rerank of candidate (query_id, neighbor_id) pairs:
    * query vectors re-attach via a broadcast join (queries are a bounded
    * probe set), neighbor vectors via the corpus join, then the shared
    * bounded-heap top-k. */
  private[graft] def rerankCandidateIds(
      candIds: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val scored = candIds
      .join(broadcast(queries.select(col("id").as("query_id"), col("v").as("qv"))),
        "query_id")
      .join(corpus.select(col("id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine.as("cos"))
    cosRerank(scored, k)
  }

  // ---- product-quantization stages (shared by sim_pq_audit and knnIvfPq) ----

  /** Split each vector into `subs` contiguous subvectors: (id, sub_idx, sv).
    * `vecCol` selects which vector column to split. */
  private[graft] def pqSubvectors(
      e: DataFrame, dim: Int, subs: Int, vecCol: String = "v"): DataFrame = {
    require(dim % subs == 0, s"dim $dim must split evenly into $subs subspaces")
    val subDim = dim / subs
    e.select(col("id"), explode(array((0 until subs).map(m =>
        struct(lit(m).as("sub_idx"),
          slice(col(vecCol), m * subDim + 1, subDim).as("sv"))): _*)).as("p"))
      .select(col("id"), col("p.sub_idx").as("sub_idx"), col("p.sv").as("sv"))
  }

  /** Nearest-codebook-entry assignment per (vector, subspace): broadcast the
    * tiny codebook, argmin squared L2 as a min-of-struct hash aggregate
    * (ties to the lowest code). Returns (id, sub_idx, code, d2[, sv]).
    * Pass `carrySubvectors = false` when the caller only needs code/d2 —
    * the subvector array otherwise rides every partial aggregation buffer
    * for nothing (the Lloyd caller is the only one that needs it). */
  private[graft] def pqAssign(
      sub: DataFrame, cb: DataFrame, carrySubvectors: Boolean = true): DataFrame = {
    val scored = sub.join(broadcast(cb), "sub_idx")
      .withColumn("d2",
        expr("graft_dot(sv, sv) - 2 * graft_dot(sv, cv) + graft_dot(cv, cv)"))
    if (carrySubvectors) {
      scored.groupBy("id", "sub_idx")
        .agg(min(struct(col("d2"), col("code"), col("sv"))).as("best"))
        .select(col("id"), col("sub_idx"),
          col("best.code").as("code"), col("best.d2").as("d2"),
          col("best.sv").as("sv"))
    } else {
      scored.groupBy("id", "sub_idx")
        .agg(min(struct(col("d2"), col("code"))).as("best"))
        .select(col("id"), col("sub_idx"),
          col("best.code").as("code"), col("best.d2").as("d2"))
    }
  }

  /** Bit-reproducible per-key mean of a double column. A plain `avg` merges
    * partial sums in shuffle-arrival order — nondeterministic float
    * addition, which would poison a persisted index ([[AnnIndex]]): two
    * builds of the same corpus could disagree in the last ulp and route
    * borderline vectors to different cells. Instead: one partial sum per
    * (key, input-partition) — computed in deterministic row order within
    * its partition, and arriving at the final aggregate as a SINGLE row so
    * merge order cannot matter — then a linear fold in ascending
    * partition-id order. The fold buffer is bounded by the number of input
    * partitions (not rows); the aggregate() lambda runs on keys-row output,
    * not the corpus scan.
    *
    * Scope of the guarantee: bit-identity holds across builds under the
    * SAME partitioning configuration (input splits, shuffle partitions) —
    * the partial grouping keys on `spark_partition_id()`. Rebuilding on a
    * differently-configured cluster may differ in the last ulp; a
    * deployment pinning strict cross-config identity should rebuild and
    * RE-PERSIST rather than compare indexes across configs (the persisted
    * index, not the builder, is the source of truth — searches always see
    * the stored bits). */
  private[graft] def detMean(
      df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy((keys.map(col) :+ spark_partition_id().as("pid")): _*)
      .agg(sum(col(valueCol)).as("ps"), count(col(valueCol)).as("pc"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("pid"), col("ps"), col("pc")))).as("parts"))
      .select((keys.map(col) :+
        (expr("aggregate(parts, 0.0D, (acc, p) -> acc + p.ps)") /
          expr("aggregate(parts, 0.0D, (acc, p) -> acc + p.pc)")).as("m")): _*)

  /** One Lloyd iteration per subspace: per-dimension mean of the assigned
    * subvectors becomes the refined codebook (sub_idx, code, cv). Means go
    * through [[detMean]] so codebooks are bit-identical across builds. */
  private[graft] def pqLloyd(assigned: DataFrame): DataFrame =
    detMean(assigned
        .select(col("sub_idx"), col("code"), posexplode(col("sv")).as(Seq("pos", "x"))),
        Seq("sub_idx", "code", "pos"), "x")
      .groupBy("sub_idx", "code")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("sub_idx"), col("code"),
        expr("transform(pm, e -> e.m)").as("cv")) // subs x codes rows — HOF harmless

  /** Per-subspace codebooks: deterministic init (subvectors of the `codes`
    * lowest ids, code = rank of the id) + one Lloyd round. The init-id
    * ranking window runs on a `codes`-row side — single-task by design. */
  private[graft] def pqCodebooks(sub: DataFrame, codes: Int): DataFrame = {
    val initIds = sub.select("id").distinct().orderBy("id").limit(codes)
      .withColumn("code",
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("id")) - 1)
          .cast("int"))
    val initCb = sub.join(broadcast(initIds), "id")
      .select(col("sub_idx"), col("code"), col("sv").as("cv"))
    pqLloyd(pqAssign(sub, initCb))
  }

  /** Hard cell assignment against broadcast centroids: (id, uv, cell, cs).
    * Argmax-by-struct — highest cosine, ties to the LOWEST cent_id; a hash
    * aggregate with map-side partials, where a window would shuffle-and-
    * sort all n x cells rows. */
  private[graft] def ivfAssign(u: DataFrame, cents: DataFrame): DataFrame =
    u.crossJoin(broadcast(cents))
      .withColumn("cs", expr("graft_dot(uv, cv)"))
      .groupBy(col("id"))
      .agg(max(struct(col("cs"), (-col("cent_id")).as("nc"), col("uv"))).as("best"))
      .select(col("id"), col("best.uv").as("uv"), (-col("best.nc")).as("cell"),
        col("best.cs").as("cs"))

  /** Spherical k-means centroids: deterministic init (the `cells` lowest
    * ids) refined by `iters` distributed Lloyd rounds (hard-assign ->
    * per-dimension mean -> renormalize). Each round is one broadcast
    * crossJoin + two aggregations; the objective (mean assigned cosine) is
    * non-decreasing per round — ScaleOpsSpec asserts it. Rounds compose
    * lazily: past a handful of iterations, localCheckpoint the running
    * centroids yourself to truncate the replayed lineage. */
  private[graft] def ivfCentroids(u: DataFrame, cells: Int, iters: Int): DataFrame = {
    require(iters >= 0, s"lloydIters must be >= 0, got $iters")
    var cents = u.orderBy("id").limit(cells)
      .select(col("id").as("cent_id"), col("uv").as("cv"))
    var i = 0
    while (i < iters) {
      cents = detMean(ivfAssign(u, cents)
          .select(col("cell"), posexplode(col("uv")).as(Seq("pos", "x"))),
          Seq("cell", "pos"), "x")
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"),
          expr("transform(pm, e -> e.m)").as("mv")) // `cells` rows — HOF harmless
        .select(col("cent_id"), expr("graft_unit(mv)").as("cv"))
      i += 1
    }
    cents
  }

  /**
   * IVF top-k cosine neighbors: spherical k-means cells
   * ([[ivfCentroids]]: deterministic init + `lloydIters` distributed Lloyd
   * rounds), then `probe`-cell search + exact rerank. Every centroid join
   * broadcasts a `cells`-row side; the corpus is never crossed with
   * itself.
   */
  def knnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int = 16,
      probe: Int = 6,
      lloydIters: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    require(probe <= cells, s"cannot probe $probe of $cells cells")
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val u = corpus.select(col("id"), expr("graft_unit(v)").as("uv"))
    val cs = expr("graft_dot(uv, cv)") // unit x unit = cosine

    val cents = ivfCentroids(u, cells, lloydIters)
    val assigned = ivfAssign(u, cents).drop("cs")

    val probes = TopK.topKPerKey(
        queries.select(col("id"), expr("graft_unit(v)").as("uv"))
          .crossJoin(broadcast(cents)).withColumn("cs", cs),
        Seq("id"), struct(col("cs"), -col("cent_id")), Seq("cent_id", "uv"), probe)
      .select(col("id").as("query_id"), col("uv").as("qv"),
        col("cent_id").as("probe_cell"))

    val cand = probes.join(assigned,
        col("probe_cell") === col("cell") &&
          (if (excludeSelf) col("query_id") =!= col("id") else lit(true)))
      .select(col("query_id"), col("qv"), col("id").as("neighbor_id"),
        col("uv").as("nv"))
      .distinct()
    // qv/nv are unit vectors: dot = cosine
    cosRerank(cand.withColumn("cos", expr("graft_dot(qv, nv)")), k)
  }

  /**
   * IVF-PQ top-k cosine neighbors — the composed billion-vector design:
   * IVF cells route each query to `probe` cells; within them, candidates
   * are ordered by ASYMMETRIC DISTANCE COMPUTATION (the query's exact
   * subvectors against each candidate's product-quantization codes, a
   * per-(query, subspace, code) lookup table of `graft_dot`s); only the
   * ADC top-`rerank` rejoin their true vectors for the exact final top-k.
   *
   * The scale contract this buys: candidate scoring touches NO vectors —
   * the heavy stage carries (query_id, neighbor_id, sub_idx, code) rows
   * against a broadcast LUT (queries x subs x codes rows), exactly how a
   * disk-resident PQ index avoids reading raw vectors. Exact vectors are
   * read for `rerank` rows per query, period.
   */
  def knnIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      cells: Int = 16,
      probe: Int = 6,
      subs: Int = 8,
      codes: Int = 16,
      rerank: Int = 20,
      excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val u = corpus.select(col("id"), expr("graft_unit(v)").as("uv"))
    val qu = queries.select(col("id"), expr("graft_unit(v)").as("uv"))

    // coarse index: cells + assignments (vectors stop here)
    val cents = ivfCentroids(u, cells, iters = 1)
    val assigned = ivfAssign(u, cents).select(col("id"), col("cell"))

    // fine index: per-subspace codebooks + one byte-ish code per subspace
    val sub = pqSubvectors(u, dim, subs, vecCol = "uv")
    val cb = pqCodebooks(sub, codes)
    val pqCodes = pqAssign(sub, cb, carrySubvectors = false)
      .select(col("id").as("neighbor_id"), col("sub_idx"), col("code"))

    // ADC lookup table: exact query subvector x codebook entry dots (tiny)
    val lut = pqSubvectors(qu, dim, subs, vecCol = "uv")
      .join(broadcast(cb), "sub_idx")
      .select(col("id").as("query_id"), col("sub_idx"), col("code"),
        expr("graft_dot(sv, cv)").as("pdot"))

    val probes = TopK.topKPerKey(
        qu.crossJoin(broadcast(cents))
          .withColumn("cs", expr("graft_dot(uv, cv)")),
        Seq("id"), struct(col("cs"), -col("cent_id")), Seq("cent_id"), probe)
      .select(col("id").as("query_id"), col("cent_id").as("probe_cell"))

    val candIds = probes.join(assigned, col("probe_cell") === col("cell"))
      .filter(if (excludeSelf) col("query_id") =!= col("id") else lit(true))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .distinct()

    // approximate scores from codes alone; prune to the rerank window
    val adc = candIds
      .join(pqCodes, "neighbor_id")
      .join(broadcast(lut), Seq("query_id", "sub_idx", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("pdot").as("adc"))
    val pruned = TopK.topKPerKey(adc, Seq("query_id"),
        struct(col("adc"), -col("neighbor_id")), Seq("neighbor_id"), rerank)
      .select("query_id", "neighbor_id")

    // exact rerank on the surviving few
    val withVecs = pruned
      .join(u.select(col("id").as("neighbor_id"), col("uv").as("nv")), "neighbor_id")
      .join(qu.select(col("id").as("query_id"), col("uv").as("qv")), "query_id")
    cosRerank(withVecs.withColumn("cos", expr("graft_dot(qv, nv)")), k)
  }

  /**
   * SemDeDup-style cluster-confined semantic dedup (Abbas et al.,
   * "SemDeDup: Data-efficient learning at web-scale through semantic
   * deduplication", 2023): spherical k-means over the embeddings, exact
   * pairwise cosine WITHIN each cluster only, pairs at or above
   * `threshold` reported as semantic duplicates.
   *
   * This is the third embedding-dedup shape next to the LSH bucketing
   * ([[nearDupPairsCosine]]) and the persisted-index probe
   * ([[AnnIndex.nearDupPairs]]): candidates here are *semantic
   * neighborhoods* (same cluster) rather than hash collisions, which is
   * what lets the paper's recipe dedupe paraphrases that share no
   * shingles and sit on opposite sides of an LSH hyperplane.
   *
   * Scale: cost is Σ(cell size²)·assign² — the `cells` parameter IS the
   * knob (SemDeDup runs ~n/1000 clusters at web scale so cells stay
   * ~10³). Both join sides shuffle once on `cell`; centroids ride a
   * broadcast; the pair join carries (id, uv) only. Recall is
   * cluster-confined by DESIGN (pairs split across every assigned cell
   * are invisible) — `assign` > 1 multi-assigns each vector to its
   * top-`assign` cells, the standard mitigation when the corpus has weak
   * cluster structure (a pair is found if ANY assigned cell is shared);
   * the spec MEASURES recall against the exact baseline rather than
   * assuming it.
   */
  /** The cluster-assignment half of [[semanticDedupPairs]], exposed so the
    * catalog can export it as a fixture table: (id, uv, cell) rows, each id
    * multi-assigned to its top-`assign` cells. The k-means is the part an
    * SQL oracle cannot recompute; everything DOWNSTREAM of this table (the
    * within-cell exact-cosine verify) is plain relational algebra, which is
    * exactly what `dedup_semantic_verified` hands to DuckDB. */
  def semanticAssignments(
      embeddings: DataFrame,
      cells: Int = 16,
      lloydIters: Int = 1,
      assign: Int = 3): DataFrame = {
    require(assign >= 1 && assign <= cells, s"assign=$assign of $cells cells")
    graft.expressions.GraftExtensions.register(embeddings.sparkSession)
    val u = embeddings.select(col("id"), expr("graft_unit(v)").as("uv"))
    val cents = ivfCentroids(u, cells, lloydIters)
    TopK.topKPerKey(
        u.crossJoin(broadcast(cents))
          .withColumn("cs", expr("graft_dot(uv, cv)")),
        Seq("id"), struct(col("cs"), -col("cent_id")), Seq("cent_id", "uv"), assign)
      .select(col("id"), col("uv"), col("cent_id").as("cell"))
  }

  def semanticDedupPairs(
      embeddings: DataFrame,
      cells: Int = 16,
      lloydIters: Int = 1,
      threshold: Double = 0.4,
      assign: Int = 3): DataFrame = {
    val assigned = semanticAssignments(embeddings, cells, lloydIters, assign)
    assigned.alias("a")
      .join(assigned.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos", expr("graft_dot(a.uv, b.uv)"))
      .filter(col("cos") >= threshold)
      // integer-first flooring (same discipline as the jaccard scores):
      // the reported score is engine-stable at 3 decimals
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (floor(col("cos") * 1000) / 1000).as("cos"))
      // a pair sharing several assigned cells emits once per shared cell —
      // identical (id_a, id_b, cos) values, so the dedup keeps a
      // deterministic row whichever survives
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * Near-duplicate `(id_a < id_b)` pairs by embedding cosine, LSH-bucketed:
   * band codes of the UNIT vectors hash-join carrying only the id pair (the
   * wide arrays rejoin after the distinct), exact `graft_dot` verify at
   * `threshold`. The catalog's `dedup_embedding_lsh` (subset-of-exact +
   * recall >= 0.9 bars) runs through this.
   *
   * `maxBucket` is the quadratic-explosion guard (the `maxGramOcc` of the
   * embedding path): a band bucket holding > `maxBucket` vectors emits NO
   * candidate pairs, so adversarial data — a mass of near-identical
   * directions that land every band in one bucket — costs
   * O(bands x maxBucket^2) instead of degrading toward all-pairs. Cap
   * semantics, stated honestly ([[CorpusOps.substringDedup]] discipline):
   * pairs whose EVERY shared bucket is over-cap are missed (conservative
   * under-detection — a duplicate cluster larger than `maxBucket` per
   * bucket should be handled by exact dedup first); the dropped-bucket
   * mass is reported by [[nearDupPairsCosineAudited]]. The default clears
   * every test corpus untouched (no bucket can exceed it at n <= 4096)
   * while still bounding the 100 TB case.
   */
  def nearDupPairsCosine(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.4,
      seed: Int = 7,
      planes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    nearDupPairsCosineAudited(
      embeddings, dim, threshold, seed, planes, bands, maxBucket)._1

  /** Per-bucket collision cap default: no-op on corpora up to 4096
    * vectors, bounds each band bucket's C(n,2) emission at scale. */
  val DefaultMaxBucket: Int = 4096

  /** [[nearDupPairsCosine]] with the dropped-band mass surfaced: returns
    * (verified pairs, audit) where the audit holds one row per OVER-CAP
    * bucket (band_idx, code, n) — count/sum it for the honest "what did
    * the cap silence" readout a production run should log next to its
    * pair count. */
  def nearDupPairsCosineAudited(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.4,
      seed: Int = 7,
      planes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = DefaultMaxBucket): (DataFrame, DataFrame) = {
    graft.expressions.GraftExtensions.register(embeddings.sparkSession)
    val u = embeddings.select(col("id"), expr("graft_unit(v)").as("v"))
    // pin the NARROW code table (id, band, code — never the vectors):
    // the capped candidate stage reads it three times (both self-join
    // sides + the bucket-size aggregate), and the branches prune
    // different columns so their subtrees don't canonicalize equal —
    // without the pin each consumer re-runs the scan + unit + banding
    // kernel. The wide `u` stays unpinned: the verify rejoin reads it
    // column-pruned from source, which is the right trade at corpus
    // scale. (Eager-pin failure semantics — unrecoverable on executor
    // loss, jobs at query construction — documented once in
    // graft.operators.Pins.)
    val coded = bandedCodes(u, seed, planes, bands, dim)
      .select("id", "band_idx", "code")
      .localCheckpoint(true)
    val (candIds, audit) = cosineCandidatePairsCapped(coded, maxBucket)
    (cosineVerifyPairs(candIds, u, threshold), audit)
  }

  /** Stage builder (shared with tools.Profile so the profiler drives the
    * production plan): distinct (id_a < id_b) pairs colliding on any band. */
  private[graft] def cosineCandidatePairs(coded: DataFrame): DataFrame =
    coded.as("a").join(coded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  /** [[cosineCandidatePairs]] under the per-bucket cap: buckets over
    * `maxBucket` contribute nothing and surface in the audit frame
    * (band_idx, code, n). One extra aggregate over the (already shuffled)
    * coded rows — the bucket-size side is bands x codes-bounded, tiny. */
  private[graft] def cosineCandidatePairsCapped(
      coded: DataFrame, maxBucket: Int): (DataFrame, DataFrame) = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val sizes = coded.groupBy("band_idx", "code").agg(count(lit(1)).as("n"))
    val over = sizes.filter(col("n") > maxBucket)
    val kept = coded.join(over.select("band_idx", "code"),
      Seq("band_idx", "code"), "left_anti")
    (cosineCandidatePairs(kept), over)
  }

  /** Stage builder: exact-cosine verify of candidate id pairs against the
    * unit vectors (the arrays rejoin only here, after the distinct). */
  private[graft] def cosineVerifyPairs(
      candIds: DataFrame, u: DataFrame, threshold: Double): DataFrame =
    candIds
      .join(u.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(u.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .filter(expr("graft_dot(va, vb)") >= threshold)
      .select(col("id_a"), col("id_b"))
}
