package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

    // --- dedup_minhash_lsh stages (the REAL builders from CorpusOps —
    // the profiler cannot drift from the production plan)
    import graft.operators.{Ann, CorpusOps}
    val docs = Tables.load(spark, sfDir, "documents")
    val bands = CorpusOps.minhashBands(docs)
    time("mh: band rows")(bands.count())
    val cand = CorpusOps.minhashCandidates(bands)
    time("mh: candidates")(cand.count())
    val sets = CorpusOps.minhashShingleSets(docs, cand)
    time("mh: shingle sets")(sets.count())
    time("mh: verify joins+jaccard")(
      CorpusOps.minhashVerify(cand, sets, sets, threshold = 0.5).count())

    // --- dedup_embedding_lsh stages (Ann builders)
    val u = graft.queries.SimilarityQueries.emb(spark, sfDir)
      .select(col("vec_id").as("id"), expr("graft_unit(v)").as("v"))
    val coded = Ann.bandedCodes(u, seed = 7, planes = 128, bands = 32, dim = 64)
      .select("id", "band_idx", "code")
    time("emb: coded rows")(coded.count())
    val candIds = Ann.cosineCandidatePairs(coded)
    time("emb: candidate ids")(candIds.count())
    time("emb: verify")(Ann.cosineVerifyPairs(candIds, u, 0.4).count())

    spark.stop()
  }
}
