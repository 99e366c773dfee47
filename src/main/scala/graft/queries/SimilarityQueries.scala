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
 *    the vectors, candidates come from bucket collisions only, exact
 *    rerank on candidates. This is the 100 TB path: the candidate join is
 *    a hash join on (band, code) instead of an all-pairs cross join.
 *
 * All randomness is a fixed-seed PRNG expanded at plan time into literal
 * hyperplane arrays, so results are deterministic across runs/partitions.
 */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.expressions.GraftExtensions.register(s)
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** cosine(a.v, b.v) via the native codegen'd dot expression. */
  private def cosine: Column =
    expr("graft_dot(a.v, b.v) / (sqrt(graft_dot(a.v, a.v)) * sqrt(graft_dot(b.v, b.v)))")

  private val Dim = 64
  private val NumPlanes = 16
  private val Bands = 4
  private val BitsPerBand = NumPlanes / Bands

  /** Deterministic hyperplanes: fixed-seed gaussians, expanded as literals. */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH code of vector column `v` for plane `p`. */
  private def planeBit(v: Column, p: Int): Column = {
    val plane = array(planes(p).toIndexedSeq.map(lit): _*)
    val dot = aggregate(zip_with(v, plane, (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
    when(dot > 0, lit(1)).otherwise(lit(0))
  }

  /** (band_idx, band_code) structs for vector column `v`. */
  private def bandCodes(v: Column): Seq[Column] =
    (0 until Bands).map { b =>
      val bits = (0 until BitsPerBand).map(i => planeBit(v, b * BitsPerBand + i) * lit(1 << i))
      struct(lit(b).as("band_idx"), bits.reduce(_ + _).as("band_code"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact top-5 cosine neighbors for the first 10 vectors (baseline)
    "sim_knn_brute" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      q.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          cosine.as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN: candidates from band-code collisions, exact rerank.
    // Not SQL-expressible (hyperplane literals) -> rows-only check; recall
    // vs the brute-force baseline is asserted in SimilarityQueriesSpec.
    "sim_knn_lsh" -> ((s, d) => {
      val e = emb(s, d)
      val buckets = e.select(col("vec_id"), col("v"),
          explode(array(bandCodes(col("v")): _*)).as("bc"))
        .select(col("vec_id"), col("v"), col("bc.band_idx"), col("bc.band_code"))
      val q = buckets.filter(col("vec_id") < 10)
      val cand = q.as("qa").join(buckets.as("cb"),
          col("qa.band_idx") === col("cb.band_idx") &&
            col("qa.band_code") === col("cb.band_code") &&
            col("qa.vec_id") =!= col("cb.vec_id"))
        .select(col("qa.vec_id").as("query_id"), col("qa.v").as("qv"),
          col("cb.vec_id").as("neighbor_id"), col("cb.v").as("nv"))
        .distinct()
      val cos = expr("graft_dot(qv, nv) / (sqrt(graft_dot(qv, qv)) * sqrt(graft_dot(nv, nv)))")
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      cand.withColumn("cos", cos)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // IVF-style ANN: vectors bucketed into cells by nearest "centroid"
    // (deterministic seed vectors stand in for a k-means pass), queries
    // probe only the nearest 4 cells, exact rerank on candidates. The
    // assignment and probe joins broadcast the tiny centroid set — no
    // all-pairs work anywhere.
    "sim_knn_ivf" -> ((s, d) => {
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val simToCent = expr("graft_dot(v, cv) / (sqrt(graft_dot(v, v)) * sqrt(graft_dot(cv, cv)))")
      val wAssign = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cent_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("cs", simToCent)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
      val probes = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cs", expr("graft_dot(qv, cv) / (sqrt(graft_dot(qv, qv)) * sqrt(graft_dot(cv, cv)))"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cs").desc, col("cent_id"))))
        .filter(col("rn") <= 4)
        .select(col("query_id"), col("qv"), col("cent_id").as("probe_cell"))
      val cand = probes.join(assigned,
          col("probe_cell") === col("cell") && col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"), col("v").as("nv"))
        .distinct()
      val cos = expr("graft_dot(qv, nv) / (sqrt(graft_dot(qv, qv)) * sqrt(graft_dot(nv, nv)))")
      val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      cand.withColumn("cos", cos)
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // per-label centroid similarity: group embeddings by label, average the
    // vectors (element-wise), report each label's centroid norm — exercises
    // vector aggregation without a UDAF
    "sim_label_centroids" -> ((s, d) => {
      val e = emb(s, d).select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      e.groupBy("label", "pos").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(expr("floor(sqrt(sum((sx / n) * (sx / n))) * 1000) / 1000").as("centroid_norm"),
          max("n").as("n_vectors"))
        .orderBy("label")
    }))

  val oracles: Map[String, String] = Map(
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
        |FROM agg GROUP BY label ORDER BY label""".stripMargin)
}
