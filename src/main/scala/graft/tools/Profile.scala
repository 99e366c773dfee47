package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.MinHashKernel

/**
 * Dev profiler: times the internal stages of the heaviest catalog queries
 * so optimization effort lands where the seconds are (the bench reports
 * only whole-query times). Not part of the driver contract.
 *
 * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Profile" }}}
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // match Bench's parallelism
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftExtensions.register(spark)
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val H = 32; val B = 8; val R = H / B

    // --- dedup_minhash_lsh stages
    val docs = Tables.load(spark, sfDir, "documents")
    val bands = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val sig = MinHashKernel.signature(text, k = 5, h = H)
        MinHashKernel.bands(sig, B, R).zipWithIndex.map { case (bv, bi) => (id, bi, bv) }
      })
      .toDF("doc_id", "band_idx", "band_val")
    time("mh: band rows")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("mh: candidates")(cand.count())
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sets = docs.join(broadcast(candDocs), "doc_id")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, MinHashKernel.shingleHashes(text, 5)) })
      .toDF("doc_id", "shs")
    time("mh: shingle sets")(sets.count())
    val paired = cand
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shs", "sa"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shs", "sb"), "doc_b")
      // using-column joins reorder columns (doc_b first) — re-select before
      // the positional tuple encoder, same as DedupQueries does
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .as[(Long, Long, IndexedSeq[Long], IndexedSeq[Long])]
    time("mh: verify joins+jaccard")(paired.mapPartitions(_.flatMap { case (a, b, sa, sb) =>
      val j = MinHashKernel.jaccardSortedLongs(sa, sb)
      if (j >= 0.5) Some((a, b)) else None
    }).count())

    // --- dedup_embedding_lsh stages
    val u = graft.queries.SimilarityQueries.emb(spark, sfDir)
      .select(col("vec_id"), expr("graft_unit(v)").as("v"))
    val coded = graft.queries.SimilarityQueries.bandedCodes(u, 32)
      .select("vec_id", "band_idx", "code")
    time("emb: coded rows")(coded.count())
    val candIds = coded.as("a").join(coded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.code") === col("b.code") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    time("emb: candidate ids")(candIds.count())
    time("emb: verify")(candIds
      .join(u.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(u.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .filter(expr("graft_dot(va, vb)") >= 0.4)
      .count())

    spark.stop()
  }
}
