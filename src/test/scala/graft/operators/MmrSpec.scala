package graft.operators

import graft.SparkSuite

/**
 * MMR re-ranking ([[Mmr]]): the selection arithmetic is hash-checked
 * cross-engine by the `sim_mmr_rerank` oracle (all greedy steps
 * unrolled); this spec pins the SEMANTICS — a near-duplicate of the top
 * pick is demoted below a diverse lower-relevance candidate, pure-
 * relevance order is restored when candidates are mutually orthogonal —
 * plus determinism across partitionings.
 */
class MmrSpec extends SparkSuite {

  import spark.implicits._

  private def df(vs: (Long, Array[Double])*) =
    vs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")

  // probe along e0; a ~ probe, dup ~ a, b diverse (e0+e1), c orthogonal
  private val fixture = df(
    0L -> Array(1.0, 0.0, 0.0, 0.0),     // probe
    1L -> Array(0.98, 0.05, 0.0, 0.0),   // a: top relevance
    2L -> Array(0.97, 0.06, 0.0, 0.0),   // dup of a: 2nd by relevance
    3L -> Array(0.7, 0.7, 0.0, 0.0),     // b: diverse, lower relevance
    4L -> Array(0.0, 0.0, 1.0, 0.0))     // c: orthogonal, near-zero rel

  test("a near-duplicate of the top pick is demoted below diverse candidates") {
    val got = Mmr.rerank(fixture, probeId = 0L, n = 4, k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // pure relevance order is 1, 2, 3, 4. After picking 1, λ=1/2 scores
    // are rel − max-sim-to-selected: the dup (2) lands at ~997−999 < 0,
    // b (3) at ~707−742 < 0, while the orthogonal c (4) pays ZERO
    // penalty — so c takes rank 2, and rank 3 goes to the dup (−2) over
    // b (−35). The dup drops from relevance-rank 2 to last place.
    assert(got === Seq(1L, 4L, 2L), got.toString)
  }

  test("mutually orthogonal candidates keep pure relevance order") {
    val ortho = df(
      0L -> Array(1.0, 1.0, 1.0, 1.0),
      1L -> Array(1.0, 0.0, 0.0, 0.0),
      2L -> Array(0.0, 1.0, 0.0, 0.0),
      3L -> Array(0.0, 0.0, 1.0, 0.0))
    val got = Mmr.rerank(ortho, probeId = 0L, n = 3, k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // equal rel, zero mutual sim -> id tie-break gives 1, 2, 3
    assert(got === Seq(1L, 2L, 3L))
  }

  test("deterministic across partitionings") {
    val rnd = new scala.util.Random(59)
    val vs = (0L to 60L).map(i => i -> Array.fill(8)(rnd.nextGaussian()))
    val a = Mmr.rerank(df(vs: _*), 0L, n = 15, k = 8)
      .orderBy("rank").collect().toSeq
    val b = Mmr.rerank(df(vs: _*).repartition(7), 0L, n = 15, k = 8)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }
}
