package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * PCA ([[Pca]]): the integer projection arithmetic is hash-checked
 * cross-engine by the `sim_pca_project` DuckDB oracle; this spec pins
 * the LINEAR-ALGEBRA semantics — the Jacobi solver against a
 * hand-diagonalizable matrix, orthonormality, recovery of a planted
 * dominant direction, variance-share ordering — plus the statistics
 * pass's partition invariance and run-to-run determinism.
 */
class PcaSpec extends SparkSuite {

  import spark.implicits._

  private def embDf(vs: Seq[Array[Double]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")

  test("jacobiEigen: diagonalizes a hand-checkable symmetric matrix") {
    // [[2, 1], [1, 2]] has eigenpairs (3, [1,1]/√2) and (1, [1,-1]/√2)
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = (0 until 2).sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // same sign, equal magnitude
  }

  test("fit: planted dominant direction is recovered by the first component") {
    // vectors = t * u + small noise on v ⊥ u, d = 6
    val u = Array(1.0, 2.0, -1.0, 0.5, 0.0, 1.5)
    val un = math.sqrt(u.map(x => x * x).sum)
    val w = Array(2.0, -1.0, 0.0, 0.0, 1.0, 0.0) // ⊥ u
    val rnd = new scala.util.Random(7)
    val vs = (1 to 300).map { _ =>
      val t = rnd.nextGaussian() * 2
      val e = rnd.nextGaussian() * 0.05
      u.indices.map(i => t * u(i) / un + e * w(i)).toArray
    }
    val m = Pca.fit(embDf(vs), r = 3)
    val pc0 = m.wFp(0).map(_.toDouble / Pca.WScale)
    val cosine = math.abs(pc0.zip(u).map { case (a, b) => a * b }.sum) /
      (math.sqrt(pc0.map(x => x * x).sum) * un)
    assert(cosine > 0.999, s"first PC misses the planted direction: $cosine")
    // variance shares are descending and the first dominates
    assert(m.varSharePpm.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(m.varSharePpm(0) > 900000L, m.varSharePpm.mkString(","))
  }

  test("fit: eigenvector rows are orthonormal at the export scale") {
    val rnd = new scala.util.Random(11)
    val vs = (1 to 200).map(_ => Array.fill(8)(rnd.nextGaussian()))
    val m = Pca.fit(embDf(vs), r = 4)
    val w = m.wFp.map(_.map(_.toDouble / Pca.WScale))
    for (a <- w.indices; b <- a until w.length) {
      val dot = w(a).zip(w(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"w$a . w$b = $dot")
    }
  }

  test("stats: partition-invariant and mergeable (exact integer sums)") {
    val rnd = new scala.util.Random(23)
    val vs = (1 to 100).map(_ => Array.fill(5)(rnd.nextGaussian()))
    val a = Pca.stats(embDf(vs)).orderBy("i", "j").collect().toSeq
    val b = Pca.stats(embDf(vs).repartition(7)).orderBy("i", "j").collect().toSeq
    assert(a == b)
  }

  test("stats are mergeable: summing two halves' rows equals the whole corpus") {
    // the incremental-training claim, made concrete: stats rows are
    // (i, j, exact integer sum) — union + re-aggregate over two disjoint
    // halves must be BIT-identical to one pass over the union
    val rnd = new scala.util.Random(73)
    val vs = (1 to 120).map(_ => Array.fill(5)(rnd.nextGaussian()))
    val (l, r) = vs.splitAt(70)
    val whole = Pca.stats(embDf(vs)).orderBy("i", "j").collect().toSeq
    val merged = Pca.stats(embDf(l)).unionByName(Pca.stats(embDf(r)))
      .groupBy("i", "j")
      .agg(org.apache.spark.sql.functions.sum("s").cast("decimal(38,0)").as("s"))
      .orderBy("i", "j").collect().toSeq
    assert(whole == merged)
  }

  test("fit + project: deterministic across runs; projection matches a driver recompute") {
    val rnd = new scala.util.Random(31)
    val vs = (1 to 150).map(_ => Array.fill(6)(rnd.nextGaussian()))
    val df = embDf(vs)
    val m1 = Pca.fit(df, r = 2)
    val m2 = Pca.fit(df.repartition(5), r = 2)
    assert(m1.wFp.map(_.toSeq).toSeq == m2.wFp.map(_.toSeq).toSeq)
    val proj = Pca.project(df, m1.wFp).orderBy("vec_id")
      .as[(Long, Long, Long)].collect()
    // driver-side recompute of the same integer arithmetic
    vs.zipWithIndex.foreach { case (v, i) =>
      val qv = v.map(x => (x * 1e6).toLong)
      val want0 = qv.zip(m1.wFp(0)).map { case (q, w) => q * w }.sum
      val want1 = qv.zip(m1.wFp(1)).map { case (q, w) => q * w }.sum
      assert(proj(i) === ((i.toLong, want0, want1)))
    }
  }

  test("knnProjected: high recall vs full-space L2 when the data IS low-rank") {
    // 64-dim vectors from an 8-dim latent (fixed mixing) + small noise:
    // the regime PCA reduction is FOR. Recall of reduced-space top-5
    // against full-space top-5 must be high here; on isotropic data it
    // legitimately would not be.
    val rnd = new scala.util.Random(101)
    val mix = Array.fill(64, 8)(rnd.nextGaussian())
    val vs = (1 to 200).map { _ =>
      val z = Array.fill(8)(rnd.nextGaussian())
      Array.tabulate(64) { i =>
        mix(i).zip(z).map { case (a, b) => a * b }.sum + rnd.nextGaussian() * 0.01
      }
    }
    val df = embDf(vs)
    val m = Pca.fit(df, r = 8)
    val proj = Pca.project(df, m.wFp)
    val got = Pca.knnProjected(proj, proj.filter(col("vec_id") < 10), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // full-space exact top-5 by L2, computed on the driver
    val want = (0 until 10).map { qi =>
      val q = vs(qi)
      val top = vs.indices.filter(_ != qi).sortBy { ni =>
        (vs(ni).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, ni)
      }.take(5).map(_.toLong).toSet
      qi.toLong -> top
    }.toMap
    val recall = want.keys.toSeq.map(q =>
      (got(q) intersect want(q)).size.toDouble / 5).sum / want.size
    assert(recall >= 0.9, s"reduced-space recall $recall")
  }

  test("outliers: a planted off-subspace vector ranks first with high residual") {
    // corpus lives in an 8-dim subspace of R^24; one vector is built in
    // the orthogonal complement (Gram-Schmidt against the mixing columns)
    val rnd = new scala.util.Random(131)
    val d = 24
    val mix = Array.fill(d, 8)(rnd.nextGaussian())
    val inSpan = (0 until 150).map { _ =>
      val z = Array.fill(8)(rnd.nextGaussian())
      Array.tabulate(d)(i => mix(i).zip(z).map { case (a, b) => a * b }.sum)
    }
    var alien = Array.fill(d)(rnd.nextGaussian())
    for (c <- 0 until 8) {
      val colv = Array.tabulate(d)(i => mix(i)(c))
      val nn = colv.map(x => x * x).sum
      val dt = alien.zip(colv).map { case (a, b) => a * b }.sum
      alien = alien.zip(colv).map { case (a, b) => a - dt / nn * b }
    }
    val norm = math.sqrt(alien.map(x => x * x).sum)
    val scaled = alien.map(_ / norm * 3)
    val df = embDf(inSpan :+ scaled) // alien id = 150
    val model = Pca.fit(df, r = 8)
    val top = Pca.outliers(df, model, k = 3)
      .as[(Long, Long)].collect()
    // the residual is against the UNCENTERED projection while the fit is
    // mean-centered, so the alien reads ~0.88 rather than ~1.0 — still an
    // order of magnitude above every in-span vector
    assert(top.head._1 === 150L, top.toSeq.toString)
    assert(top.head._2 >= 800L, s"alien residual ${top.head._2}")
    assert(top(1)._2 <= 200L, s"in-span runner-up ${top(1)._2}")
  }

  test("project: plan is one scan — no join, no exchange") {
    val rnd = new scala.util.Random(43)
    val vs = (1 to 50).map(_ => Array.fill(4)(rnd.nextGaussian()))
    val plan = Pca.project(embDf(vs), Pca.fit(embDf(vs), r = 2).wFp)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }
}
