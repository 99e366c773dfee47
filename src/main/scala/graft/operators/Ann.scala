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

  private def cosRerank(scored: DataFrame, k: Int): DataFrame =
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
   */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val scored = queries.select(col("id").as("query_id"), col("v").as("qv"))
      .join(corpus.select(col("id").as("neighbor_id"), col("v").as("nv")),
        col("query_id") =!= col("neighbor_id"))
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
      bands: Int = 16): DataFrame = {
    require(planes % bands == 0, "planes must divide evenly into bands")
    val r = planes / bands
    val corpusCodes = bandedCodes(corpus.select(col("id"), col("v")),
      seed, planes, bands, dim)
    val probeArr = array((col("code") +:
      (0 until r).map(j => col("code").bitwiseXOR(lit(1L << j)))): _*)
    val probes = bandedCodes(queries.select(col("id"), col("v")),
        seed, planes, bands, dim)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("band_idx"), explode(probeArr).as("code"))
    val cand = broadcast(probes).join(corpusCodes, Seq("band_idx", "code"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("qv"), col("id").as("neighbor_id"),
        col("v").as("nv"))
      .distinct()
    cosRerank(cand.withColumn("cos", cosine), k)
  }

  /**
   * IVF top-k cosine neighbors: k-means cells from a deterministic init
   * (the `cells` lowest ids) refined by ONE distributed Lloyd iteration
   * (assign via broadcast centroids -> per-dimension mean -> renormalize),
   * then `probe`-cell search + exact rerank. Every centroid join
   * broadcasts a `cells`-row side; the corpus is never crossed with
   * itself. Cell assignment is an ARGMAX hash aggregate (max of a
   * (cos, -cent_id, uv) struct) — partial aggregation combines the
   * candidate rows map-side, where a window would shuffle-and-sort all
   * n x cells rows.
   */
  def knnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int = 16,
      probe: Int = 6): DataFrame = {
    require(probe <= cells, s"cannot probe $probe of $cells cells")
    graft.expressions.GraftExtensions.register(corpus.sparkSession)
    val u = corpus.select(col("id"), expr("graft_unit(v)").as("uv"))
    val cs = expr("graft_dot(uv, cv)") // unit x unit = cosine

    val init = u.orderBy("id").limit(cells)
      .select(col("id").as("cent_id"), col("uv").as("cv"))

    // argmax-by-struct: highest cosine, ties to the LOWEST cent_id
    def assignCells(cents: DataFrame): DataFrame =
      u.crossJoin(broadcast(cents))
        .withColumn("cs", cs)
        .groupBy(col("id"))
        .agg(max(struct(col("cs"), (-col("cent_id")).as("nc"), col("uv"))).as("best"))
        .select(col("id"), col("best.uv").as("uv"), (-col("best.nc")).as("cell"))

    // one Lloyd iteration: hard-assign, per-dimension mean, renormalize
    val cents = assignCells(init)
      .select(col("cell"), posexplode(col("uv")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell").as("cent_id"),
        expr("transform(pm, e -> e.m)").as("mv")) // `cells` rows — HOF harmless
      .select(col("cent_id"), expr("graft_unit(mv)").as("cv"))

    val assigned = assignCells(cents)

    val probes = TopK.topKPerKey(
        queries.select(col("id"), expr("graft_unit(v)").as("uv"))
          .crossJoin(broadcast(cents)).withColumn("cs", cs),
        Seq("id"), struct(col("cs"), -col("cent_id")), Seq("cent_id", "uv"), probe)
      .select(col("id").as("query_id"), col("uv").as("qv"),
        col("cent_id").as("probe_cell"))

    val cand = probes.join(assigned,
        col("probe_cell") === col("cell") && col("query_id") =!= col("id"))
      .select(col("query_id"), col("qv"), col("id").as("neighbor_id"),
        col("uv").as("nv"))
      .distinct()
    // qv/nv are unit vectors: dot = cosine
    cosRerank(cand.withColumn("cos", expr("graft_dot(qv, nv)")), k)
  }

  /**
   * Near-duplicate `(id_a < id_b)` pairs by embedding cosine, LSH-bucketed:
   * band codes of the UNIT vectors hash-join carrying only the id pair (the
   * wide arrays rejoin after the distinct), exact `graft_dot` verify at
   * `threshold`. The catalog's `dedup_embedding_lsh` (subset-of-exact +
   * recall >= 0.9 bars) runs through this.
   */
  def nearDupPairsCosine(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.4,
      seed: Int = 7,
      planes: Int = 128,
      bands: Int = 32): DataFrame = {
    graft.expressions.GraftExtensions.register(embeddings.sparkSession)
    val u = embeddings.select(col("id"), expr("graft_unit(v)").as("v"))
    val coded = bandedCodes(u, seed, planes, bands, dim)
      .select("id", "band_idx", "code")
    val candIds = coded.as("a").join(coded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candIds
      .join(u.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(u.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .filter(expr("graft_dot(va, vb)") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
