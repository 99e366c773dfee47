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

    // --- mm_image_phash_verified stages (12.8 s in the r7s3 bench)
    import graft.multimodal.Multimodal
    val base = Multimodal.documentsAsPngMedia(spark, sfDir)
    time("phash: decode+DCT only")(
      base.map(m => Multimodal.dctLowband(m.data).length.toLong)
        .reduce(_ + _))
    val probes = base.filter(_.doc_id % 10 == 0).map { m =>
      val (w, h, px) = Multimodal.decodeImageIO(m.data).get
      m.copy(doc_id = m.doc_id + 10000000L,
        data = Multimodal.encodePng(px.map(p => math.min(255, p + 20)), w, h))
    }
    time("phash: probe encode leg")(probes.count())
    val fdir = java.nio.file.Files.createTempDirectory("phash-prof").toString
    time("phash: full fixture write")(
      { base.union(probes).map(m => (m.doc_id, Multimodal.dctLowband(m.data)))
          .toDF("doc_id", "c").write.mode("overwrite").parquet(fdir); 0L })
    val hashesDf = spark.read.parquet(fdir)
      .withColumn("m", expr("element_at(array_sort(slice(c, 2, 63)), 32)"))
      .select(col("doc_id"), expr(
        "aggregate(sequence(1, 63), 0L, (acc, i) -> " +
          "acc + IF(element_at(c, i + 1) > m, shiftleft(1L, i), 0L))")
        .as("ahash"))
    time("phash: packed hashes")(hashesDf.count())
    time("phash: banded pairs (lazy lineage)")(
      Multimodal.bandedHammingPairs(hashesDf, maxHamming = 3).count())
    val pinned = hashesDf.localCheckpoint(true)
    time("phash: banded pairs (checkpointed)")(
      Multimodal.bandedHammingPairs(pinned, maxHamming = 3).count())

    // --- mm_audio_spectral stages
    val abase = Multimodal.documentsAsToneAudio(spark, sfDir)
    time("spectral: tone synth + WAV")(abase.count())
    val peaks = Multimodal.audioPeakTable(abase, frameSize = 256, hop = 256)
    time("spectral: peak table (DFT)")(peaks.count())
    time("spectral: landmarks + votes")(
      Multimodal.audioLandmarkPairs(peaks, minVotes = 3, maxDf = 64).count())

    spark.stop()
  }
}
