package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/**
 * SemDeDup invariants. Cluster-confined recall is a DESIGN property, not
 * a guarantee — so it is measured against the exact all-pairs baseline,
 * not assumed. Precision, by contrast, is absolute: every reported pair
 * carries an exact verified cosine.
 */
class SemDedupSpec extends SparkSuite {

  private def emb(sf: String): DataFrame =
    Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brutePairs(e: DataFrame, threshold: Double): Set[(Long, Long)] = {
    graft.expressions.GraftExtensions.register(spark)
    val u = e.select(col("id"), expr("graft_unit(v)").as("uv"))
    u.alias("a").join(u.alias("b"), col("a.id") < col("b.id"))
      .withColumn("cos", expr("graft_dot(a.uv, b.uv)"))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("every reported pair is an exact >= threshold pair (subset of brute force)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = emb(sf)
      val got = pairSet(Ann.semanticDedupPairs(e, cells = 16, threshold = 0.4))
      val exact = brutePairs(e, 0.4)
      assert(got.subsetOf(exact), s"$sf: non-dup pairs reported: ${got -- exact}")
    }
  }

  test("cluster-confined recall >= 0.8 of the exact baseline on real testdata") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = emb(sf)
      val got = pairSet(Ann.semanticDedupPairs(e, cells = 16, threshold = 0.4))
      val exact = brutePairs(e, 0.4)
      assert(exact.nonEmpty, s"$sf: baseline should find planted semantic dups")
      val recall = got.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"$sf: recall $recall (${got.size}/${exact.size})")
    }
  }

  test("two runs produce identical pairs (deterministic clustering + scoring)") {
    val e = emb("sf0.001")
    val a = Ann.semanticDedupPairs(e, cells = 16, threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = Ann.semanticDedupPairs(e.repartition(7), cells = 16, threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(1))) ===
      b.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("the within-cell join is cell-keyed — no cartesian, no nested loop") {
    val plan = Ann.semanticDedupPairs(emb("sf0.001"), cells = 16, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
