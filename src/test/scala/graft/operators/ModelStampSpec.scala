package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/**
 * Version-stamp discipline for every persisted model directory (the
 * [[AnnIndex]] versioned-path contract extended to LM / quality / PCA):
 * a reader must fail DESCRIPTIVELY on a stale layout (no stamp), a
 * format-version mismatch, or a parameter drift — never score silently
 * against incompatible bits.
 */
class ModelStampSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def emb = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("v"))

  private def requireMsg(f: => Any): String =
    intercept[IllegalArgumentException](f).getMessage

  test("LM model round-trips; stale/mismatched stamps fail descriptively") {
    val path = tempDir("lm-stamp")
    LangModel.writeModel(docs, path)
    assert(LangModel.scoreAgainst(docs, path).count() > 0)

    // stale layout: a pre-stamp meta (just v) must be rejected, not scored
    spark.read.parquet(s"$path/meta").select("v")
      .write.mode("overwrite").parquet(s"$path/meta_old")
    val stale = tempDir("lm-stale")
    Seq("c12", "c1", "vocab").foreach(t =>
      spark.read.parquet(s"$path/$t").write.parquet(s"$stale/$t"))
    spark.read.parquet(s"$path/meta_old").write.parquet(s"$stale/meta")
    val m1 = requireMsg(LangModel.scoreAgainst(docs, stale).count())
    assert(m1.contains("format_version") && m1.contains("retrain"), m1)

    // version mismatch
    val old = tempDir("lm-v1")
    Seq("c12", "c1", "vocab").foreach(t =>
      spark.read.parquet(s"$path/$t").write.parquet(s"$old/$t"))
    spark.read.parquet(s"$path/meta")
      .withColumn("format_version", lit(1L))
      .write.parquet(s"$old/meta")
    val m2 = requireMsg(LangModel.scoreAgainst(docs, old).count())
    assert(m2.contains("format v1") && m2.contains("retrain"), m2)
  }

  test("merged LM models carry the stamp") {
    val a = tempDir("lm-a"); val b = tempDir("lm-b"); val out = tempDir("lm-m")
    val half = docs.filter(col("doc_id") % 2 === 0)
    val other = docs.filter(col("doc_id") % 2 === 1)
    LangModel.writeModel(half, a)
    LangModel.writeModel(other, b)
    LangModel.mergeModels(spark, a, b, out)
    assert(LangModel.scoreAgainst(docs, out).count() > 0)
  }

  test("quality model round-trips; stale stamp and feature-dim drift fail descriptively") {
    val path = tempDir("qm-stamp")
    QualityModel.writeModel(docs, path)
    assert(QualityModel.scoreAgainst(docs, path).count() > 0)

    val stale = tempDir("qm-stale")
    spark.read.parquet(s"$path/weights").write.parquet(s"$stale/weights")
    spark.read.parquet(s"$path/meta").select("d", "lambda")
      .write.parquet(s"$stale/meta")
    val m1 = requireMsg(QualityModel.scoreAgainst(docs, stale).count())
    assert(m1.contains("format_version") && m1.contains("retrain"), m1)

    val drifted = tempDir("qm-dim")
    spark.read.parquet(s"$path/weights").write.parquet(s"$drifted/weights")
    spark.read.parquet(s"$path/meta").withColumn("d", lit(99))
      .write.parquet(s"$drifted/meta")
    val m2 = requireMsg(QualityModel.scoreAgainst(docs, drifted).count())
    assert(m2.contains("99 features") && m2.contains("retrain"), m2)
  }

  test("PCA model round-trips exactly; stale stamp and scale drift fail descriptively") {
    val path = tempDir("pca-stamp")
    val model = Pca.writeModel(emb, path, r = 4)
    val direct = Pca.project(emb, model.wFp).orderBy("vec_id").collect()
    val served = Pca.projectAgainst(emb, path).orderBy("vec_id").collect()
    assert(direct.map(_.toSeq).toSeq == served.map(_.toSeq).toSeq,
      "persisted projection must be bit-identical to the in-memory fit")
    val loaded = Pca.readModel(spark, path)
    assert(loaded.varSharePpm.toSeq == model.varSharePpm.toSeq)

    val stale = tempDir("pca-stale")
    Seq("weights", "varshare").foreach(t =>
      spark.read.parquet(s"$path/$t").write.parquet(s"$stale/$t"))
    spark.read.parquet(s"$path/meta").select("r", "d", "wscale")
      .write.parquet(s"$stale/meta")
    val m1 = requireMsg(Pca.projectAgainst(emb, stale).count())
    assert(m1.contains("format_version") && m1.contains("refit"), m1)

    val scaled = tempDir("pca-scale")
    Seq("weights", "varshare").foreach(t =>
      spark.read.parquet(s"$path/$t").write.parquet(s"$scaled/$t"))
    spark.read.parquet(s"$path/meta").withColumn("wscale", lit(1000L))
      .write.parquet(s"$scaled/meta")
    val m2 = requireMsg(Pca.projectAgainst(emb, scaled).count())
    assert(m2.contains("scale 1000") && m2.contains("refit"), m2)
  }
}
