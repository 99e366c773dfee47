package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
 * 1998) — the diversity pass a retrieval pipeline runs between "top-N by
 * similarity" and "k passages into the context window", so the k results
 * aren't five copies of the same paragraph. Greedy: each step admits the
 * candidate maximizing λ·rel − (1−λ)·max(sim to the already-selected);
 * at λ = 1/2 that ordering is exactly rel − maxsim, which is how both
 * engines compute it here.
 *
 * Engine-independence: vectors quantize through the proven
 * [[Pca.quantized]] bridge, dots and norms are exact LONGs, and the only
 * floating arithmetic is the shared milli-cosine formula
 * `floor(1000 * (dot / (sqrt(na) * sqrt(nb))))` — int64→double
 * conversion, sqrt, multiply, divide, floor are each IEEE
 * correctly-rounded, so the JVM and DuckDB produce the same bits in the
 * same op order (the `text_bm25` reproducibility argument). Candidate
 * cut and every greedy step tie-break on id. The `sim_mmr_rerank` oracle
 * unrolls all k greedy steps as CTEs and matches the full selection.
 *
 * Scale shape: candidate selection is one scan (literal-coefficient
 * probe dot, in-row norm) plus a single-group bounded-heap top-N — at
 * most N rows per partition reach one reducer. The greedy loop runs on
 * the DRIVER over those N rows (N² sims, N·k comparisons): MMR is
 * sequential by definition, and N is a user knob — bounded egress like
 * the BPE argmax, not a corpus collect.
 */
object Mmr {

  private def cosMilli(dot: Long, na: Long, nb: Long): Long =
    math.floor(1000.0 * (dot.toDouble /
      (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))).toLong

  /**
   * Select top-`n` candidates by milli-cosine to `probeId`'s vector,
   * then greedily re-rank k of them by rel − max-sim-to-selected.
   * `emb` is (id, v); returns (rank 1..k, vec_id, rel_milli).
   */
  def rerank(emb: DataFrame, probeId: Long, n: Int = 20, k: Int = 10): DataFrame = {
    require(k >= 1 && n >= k, s"need 1 <= k <= n, got k=$k n=$n")
    val s = emb.sparkSession
    import s.implicits._
    val q = Pca.quantized(emb)
    val probe = q.filter(col("id") === probeId)
      .select("qv").as[Seq[Long]].head()
    val np = probe.map(x => x * x).sum
    val dotCol = probe.zipWithIndex
      .map { case (p, i) => col("qv")(i) * lit(p) }.reduce(_ + _)
    val scored = q.filter(col("id") =!= probeId)
      .select(col("id"), col("qv"), dotCol.as("dot"),
        expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)").as("na"))
      .withColumn("rel", floor(lit(1000.0) * (col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * lit(math.sqrt(np.toDouble)))))
        .cast("long"))
    val top = TopK.topKPerKey(scored.withColumn("g", lit(1)),
        Seq("g"), struct(col("rel"), -col("id")), Seq("id", "rel", "qv", "na"), n)
      .select("id", "rel", "qv", "na")
    val cand = top.as[(Long, Long, Seq[Long], Long)].collect()
      .sortBy { case (id, rel, _, _) => (-rel, id) }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], Long)]
    val remaining = scala.collection.mutable.LinkedHashSet(cand.indices: _*)
    for (_ <- 1 to math.min(k, cand.length)) {
      val best = remaining.minBy { i =>
        val (id, rel, qv, na) = cand(i)
        val maxSim =
          if (pickedVecs.isEmpty) 0L
          else pickedVecs.map { case (sv, sn) =>
            val dot = qv.zip(sv).map { case (a, b) => a * b }.sum
            cosMilli(dot, na, sn)
          }.max
        (-(rel - maxSim), id)
      }
      val (id, rel, qv, na) = cand(best)
      picked += ((id, rel))
      pickedVecs += ((qv, na))
      remaining -= best
    }
    picked.zipWithIndex
      .map { case ((id, rel), i) => (i + 1, id, rel) }.toSeq
      .toDF("rank", "vec_id", "rel_milli")
  }

  /**
   * The DuckDB oracle: quantization, probe dots, the (rel DESC, id)
   * top-`n` cut, all candidate-pair sims, and `k` UNROLLED greedy steps —
   * each picks its argmax of rel − COALESCE(max sim to the selected), id
   * tie-break, via a correlated subquery over the accumulated selection.
   */
  def oracleSql(probeId: Long, n: Int, k: Int): String = {
    val steps = (2 to k).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT c.id, c.rel FROM cand c
         |  WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
         |  ORDER BY c.rel - COALESCE((
         |      SELECT MAX(s.sim) FROM sims s
         |      WHERE s.a = c.id AND s.b IN (SELECT id FROM sel${i - 1})), 0) DESC,
         |    c.id ASC
         |  LIMIT 1),
         |sel$i AS MATERIALIZED (
         |  SELECT id FROM sel${i - 1} UNION ALL SELECT id FROM p$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT $i AS rank, id AS vec_id, rel AS rel_milli FROM p$i")
      .mkString("\nUNION ALL\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id,
       |    [CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
       |     FOR x IN embedding] AS qv
       |  FROM embeddings
       |), withn AS MATERIALIZED (
       |  SELECT vec_id, qv,
       |    CAST(list_sum([qv[i] * qv[i]
       |      FOR i IN generate_series(1, len(qv))]) AS BIGINT) AS na
       |  FROM q
       |), pr AS (SELECT qv AS pv, na AS np FROM withn WHERE vec_id = $probeId),
       |cand AS MATERIALIZED (
       |  SELECT w.vec_id AS id, w.qv, w.na,
       |    CAST(FLOOR(1000 * (CAST(CAST(list_sum([w.qv[i] * pr.pv[i]
       |        FOR i IN generate_series(1, len(w.qv))]) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(w.na AS DOUBLE)) * sqrt(CAST(pr.np AS DOUBLE)))))
       |      AS BIGINT) AS rel
       |  FROM withn w, pr WHERE w.vec_id <> $probeId
       |  ORDER BY rel DESC, id ASC LIMIT $n
       |), sims AS MATERIALIZED (
       |  SELECT a.id AS a, b.id AS b,
       |    CAST(FLOOR(1000 * (CAST(CAST(list_sum([a.qv[i] * b.qv[i]
       |        FOR i IN generate_series(1, len(a.qv))]) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(a.na AS DOUBLE)) * sqrt(CAST(b.na AS DOUBLE)))))
       |      AS BIGINT) AS sim
       |  FROM cand a JOIN cand b ON a.id <> b.id
       |), p1 AS MATERIALIZED (
       |  SELECT id, rel FROM cand ORDER BY rel DESC, id ASC LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT id FROM p1),
       |$steps
       |SELECT * FROM ($out)
       |ORDER BY rank""".stripMargin
  }
}
