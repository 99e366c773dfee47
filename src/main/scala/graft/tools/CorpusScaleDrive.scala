package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-operator scale drive: amplify the documents table ×N (mutated
 * copies + a planted 10% exact-duplicate stratum) and measure the
 * training-data operators at increasing corpus sizes. The point is the
 * SCALING RATIO, not the absolute seconds: every measured operator has a
 * bucketed/bounded plan whose cost should grow ~linearly with the corpus
 * (candidate joins bounded by band/chunk collisions, ratio tables bounded
 * by knobs, weights by doc count) — a super-linear ratio would expose a
 * hidden all-pairs or an unbounded aggregate long before a 100 TB run
 * does.
 *
 * Drive: `SPARK_GRAFT_SCALES=4,16 sbt "runMain graft.tools.CorpusScaleDrive"`
 * (factors multiply the base sf corpus; results print one line per
 * (operator, factor) plus the ratio table — recorded in BASELINE.md).
 */
object CorpusScaleDrive {

  def amplify(docs: DataFrame, factor: Int): DataFrame = {
    // copy k of doc d, id offset by k*1e6. The workload must keep OUTPUT
    // linear in `factor` or the measurement conflates plan scaling with
    // result-size scaling: k=1 of every 10th doc stays byte-identical
    // (a bounded exact/near-dup stratum — one pair per planted doc, never
    // a C(factor,2) clique), and every other copy appends a (doc, k)-keyed
    // stream of junk tokens ~as long as the doc itself, pushing pairwise
    // jaccard between copies to ~1/3 < the 0.5 threshold — amplified
    // corpora grow the CORPUS, not the answer.
    docs.crossJoin(
        spark(docs).range(factor.toLong).select(col("id").as("k")))
      .select(
        (col("doc_id") + col("k") * 1000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .when(col("k") === 1 && col("doc_id") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" "),
            array_join(
              transform(
                sequence(lit(1), greatest(size(split(col("text"), " +")), lit(1))),
                i => concat(lit("z"), col("k"), lit("_"),
                  pmod(col("doc_id") * 31 + i * 2654435761L, lit(9973)))),
              " "))).as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "4,16")
      .split(",").map(_.trim.toInt).toSeq
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftExtensions.register(s)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val base = graft.Tables.load(s, sfDir, "documents")
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    for (factor <- scales) {
      // materialize the amplified corpus to parquet so every operator
      // reads a real file source (scan + pushdown behavior included)
      val dir = java.nio.file.Files.createTempDirectory(s"corpus-x$factor").toString
      amplify(base, factor).write.mode("overwrite").parquet(dir)
      val docs = s.read.parquet(dir)
      val nDocs = docs.count()
      System.err.println(s"[scale] factor $factor: $nDocs docs at $dir")

      // SPARK_GRAFT_LEGS=a,b,c re-drives a subset (e.g. just the legs an
      // operator change touched) without paying the full 23-leg sweep
      val legFilter = sys.env.get("SPARK_GRAFT_LEGS")
        .map(_.split(",").map(_.trim).toSet)
      def run(name: String)(f: => Long): Unit = {
        if (legFilter.forall(_.contains(name))) {
          val (sec, rows) = time(f)
          results += ((name, factor, sec))
          System.err.println(f"[scale] x$factor $name%-22s $sec%8.2f s  ($rows rows)")
        }
      }

      run("exact_dedup") {
        graft.operators.CorpusOps.exactDedup(docs).count()
      }
      run("minhash_neardup") {
        graft.operators.CorpusOps.nearDupPairsMinhash(docs, threshold = 0.5).count()
      }
      run("cdc_dedup") {
        graft.operators.CdcChunker.cdcDedup(docs).count()
      }
      run("dsir_select") {
        graft.operators.Dsir.select(
          docs, docs.filter(col("lang") === "en"), k = 100).count()
      }
      run("quality_train_score") {
        val w = graft.operators.QualityModel.train(docs)
        graft.operators.QualityModel.score(docs, w.toSeq).count()
      }
      run("trigram_backoff") {
        graft.operators.LangModel.stupidBackoffNll(
          docs, docs.filter(col("doc_id") % 2 === 0)).count()
      }
      run("line_dedup") {
        graft.operators.CorpusOps.lineDedup(docs).count()
      }
      run("tfidf_vectors") {
        graft.operators.CorpusOps.hashedTfidf(docs).count()
      }
      run("keep_best") {
        // star-shaped pairs (group min <-> member) from the planted exact
        // dups: linear in corpus size even if a group were huge; component
        // labeling + the cluster-partitioned keep-best window follow
        val hashed = docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
        val groups = graft.operators.CorpusOps.exactDedup(docs)
          .filter(col("n_copies") > 1).select("text_hash", "keep_id")
        val pairs = hashed.join(groups, "text_hash")
          .filter(col("doc_id") =!= col("keep_id"))
          .select(col("keep_id").as("doc_a"), col("doc_id").as("doc_b"))
        graft.operators.CorpusOps.dedupKeepBest(docs, pairs, "n_chars").count()
      }
      run("shard_plan") {
        // hash-mod sharding: codegen projection + one 16-group aggregate —
        // the "global shuffle" plan with NO global sort (the SAME shared
        // expression pipe_shard_plan ships, so the drive can never measure
        // a different sharding)
        docs.select(col("doc_id"), col("source"), col("n_chars"),
            graft.operators.CorpusOps.shardHash(col("doc_id")).as("h"))
          .withColumn("shard", graft.operators.CorpusOps.shardNibble(col("h")))
          .groupBy("shard")
          .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"),
            countDistinct("source").as("n_sources"), min("h").as("min_h"))
          .count()
      }
      run("corpus_diff") {
        graft.operators.CorpusOps.corpusDiff(
          docs, docs.filter(col("doc_id") % 11 =!= 0)).count()
      }
      run("winnow_pairs") {
        // copies share the original prefix, so prefix fingerprints align —
        // but the junk suffix halves the fingerprint jaccard below the 0.5
        // threshold (the same bounded-answer argument as minhash_neardup)
        graft.operators.CorpusOps.winnowPairs(docs).count()
      }
      run("containment") {
        // each original IS contained in its own mutated copies (they carry
        // it as a prefix): the answer grows ~linearly with factor, which
        // the ratio table tolerates; the JOIN stays posting-bounded
        graft.operators.CorpusOps.containmentPairs(docs).count()
      }
      run("ppjoin") {
        // lossless prefix filter under amplification: a mutated copy's
        // rarest grams are its (doc, k)-keyed junk (df = 1), so prefixes
        // land on near-unique grams and candidates stay sparse while the
        // planted exact stratum (1 pair per planted doc) keeps the answer
        // linear — the drive measures the prefix join, not answer growth
        graft.operators.CorpusOps.ppjoinPairs(docs, pct = 50).count()
      }
      run("prefix_audit") {
        // the accounting readout on the corpus class that DOES blow the
        // lossless posting join up: `factor` IDENTICAL copies of every
        // base doc (boilerplate/exact-dup clusters) push each doc's
        // rarest grams to posting length = cluster size. The audit's top
        // decade must flag it (max_posting >= factor) BEFORE anyone pays
        // the C(pdf,2) join — the run-exact-dedup-first discipline
        val exactDups = base.select(
            explode(sequence(lit(0), lit(factor - 1))).as("k"),
            col("doc_id"), col("text"))
          .select((col("doc_id") * 1000 + col("k")).as("doc_id"), col("text"))
        val audit = graft.operators.CorpusOps.ppjoinPrefixAudit(exactDups)
          .collect()
        val top = audit.maxBy(_.getAs[Int]("df_decade"))
        val maxPosting = top.getAs[Long]("max_posting")
        require(maxPosting >= factor,
          s"audit must flag the x$factor exact-dup corpus, " +
            s"saw max_posting=$maxPosting")
        System.err.println(s"[scale] x$factor prefix-audit top decade: " +
          s"decade=${top.getAs[Int]("df_decade")} max_posting=$maxPosting " +
          s"implied_pairs=${top.getAs[Long]("implied_pairs")} " +
          s"top_gram='${top.getAs[String]("top_gram")}'")
        audit.length.toLong
      }
      run("snm") {
        // candidate volume is window*n BY CONSTRUCTION — the ratio should
        // track the sort (n log n / shuffle-bound), the skew-immunity claim
        graft.operators.CorpusOps.snmPairs(docs, window = 10, pct = 50).count()
      }
      run("incremental_keep") {
        // the RECOMPUTE form: one ingestion step with a fixed batch (the
        // k=0 originals) vs a history growing with the factor. Honest
        // shape note: this form re-aggregates the union gram df over the
        // whole history per batch, so its cost has a history-linear term
        // (masked at local scale by fixed overhead) — the indexed leg
        // below is the form whose history cost is a posting probe
        val batch = docs.filter(col("doc_id") < 1000000L)
          .localCheckpoint(true)
        val accepted = docs.filter(col("doc_id") >= 1000000L)
          .localCheckpoint(true)
        graft.operators.CorpusOps
          .incrementalPpjoinKeep(batch, accepted, pct = 50).count()
      }
      // the INDEXED form's persisted state builds OUTSIDE the timed
      // region (it is the accepted index a deployment appends to, built
      // once, not per batch)
      val idxState = if (legFilter.forall(_.contains("incremental_keep_indexed"))) {
        val accepted = docs.filter(col("doc_id") >= 1000000L)
          .localCheckpoint(true)
        val orderT = graft.operators.CorpusOps.ppjoinFrozenOrder(accepted)
          .localCheckpoint(true)
        val (aPre, aSets) = graft.operators.CorpusOps
          .ppjoinIndexTables(accepted, orderT)
        Some((orderT, aPre.localCheckpoint(true), aSets.localCheckpoint(true)))
      } else None
      run("incremental_keep_indexed") {
        // timed: the batch pipeline + the posting probe + exact verify —
        // the claim is NO history re-aggregation, so the ratio should
        // stay near-flat in history size up to the probe join's scan of
        // matching postings
        val batch = docs.filter(col("doc_id") < 1000000L)
          .localCheckpoint(true)
        val (orderT, pre, sets) = idxState.get
        val (kept, _, _) = graft.operators.CorpusOps
          .incrementalPpjoinKeepIndexed(batch, pre, sets, orderT, pct = 50)
        kept.count()
      }
      run("decontaminate_fuzzy") {
        // eval pinned to BASE docs only (k = 0): the amplifier preserves
        // doc_id % 20 across copies (1e6 % 20 = 0), so a %20 eval split
        // would amplify BOTH sides and grow the answer quadratically —
        // a fixed eval set is also the realistic shape
        graft.operators.CorpusOps.decontaminateFuzzy(
          train = docs.filter(col("doc_id") >= 1000000L),
          eval = docs.filter(col("doc_id") < 1000000L &&
            pmod(col("doc_id"), lit(20)) === 0)).count()
      }
      run("quality_auc") {
        // rank-sum over the distinct-score grid: the window input is
        // score-aggregated, so the scan dominates and scaling stays linear
        val w = graft.operators.QualityModel.train(docs)
        val scored = graft.operators.QualityModel.score(docs, w.toSeq)
        graft.operators.EvalOps.rocAuc(scored, "score_fp", "label").count()
      }
      run("ks_drift") {
        val t = docs.select(col("doc_id"),
          size(split(trim(col("text")), " +")).cast("long").as("v"))
        graft.operators.EvalOps.ksDrift(
          t.filter(col("doc_id") % 2 === 0).select("v"),
          t.filter(col("doc_id") % 2 =!= 0).select("v"), "v").count()
      }
      run("contrastive_pairs") {
        // ring output is one triple per eligible doc — linear by design
        graft.operators.EvalOps.contrastivePairs(docs).count()
      }
      run("padding_waste") {
        graft.operators.EvalOps.paddingWaste(docs).count()
      }
      run("merge_upsert") {
        // one full-outer join + coalesce; changes table derived in-scan
        val changes = docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), upper(col("text")).as("new_text"))
        docs.join(changes, Seq("doc_id"), "full_outer")
          .select(coalesce(col("new_text"), col("text")).as("text")).count()
      }
      run("threshold_sweep_pairs") {
        // the sweep's corpus-side cost: pair emission at the 0.3 floor,
        // bounded by the df cap (the 7 threshold scans read the PAIR
        // table, never the corpus)
        graft.queries.DedupQueries.ngramJaccardPairsAt(docs, 300).count()
      }
      run("mixture_plan") {
        // per-source token aggregate + the |sources|-row waterfill
        val avail = docs
          .select(col("source"),
            size(split(trim(col("text")), " +")).cast("long").as("n"))
          .groupBy("source").agg(sum("n").as("avail"))
        graft.operators.EvalOps.waterfill(avail).count()
      }
      // co-chunk graph ops (pagerank, triangles, LPA communities) are
      // deliberately absent: the amplifier's junk-SUFFIX design shares
      // each doc's original text as a prefix across all k copies, so
      // 10-word chunks align and every copy family becomes a k-clique —
      // the ANSWER (and the per-chunk df) grows with k², which would
      // conflate result-size growth with plan scaling. Their bounded-join
      // shape is pinned by the df-cap specs instead.

      // embedding-side: amplify vectors with a per-copy deterministic
      // perturbation, then PCA statistics + projection (pure scans)
      run("pca_fit_project") {
        val emb = graft.Tables.load(s, sfDir, "embeddings")
          .select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("v"))
        val amped = emb.crossJoin(
            s.range(factor.toLong).select(col("id").as("k")))
          .select((col("id") + col("k") * 1000000L).as("id"),
            expr("transform(v, (x, i) -> x + k * 0.001 * (i % 7))").as("v"))
          .localCheckpoint(true)
        val m = graft.operators.Pca.fit(amped, r = 8)
        graft.operators.Pca.project(amped, m.wFp).count()
      }
      run("silhouette") {
        // same perturbation amplifier, labels carried through: centroid
        // silhouette is one aggregate + one broadcast-join scan
        val emb = graft.Tables.load(s, sfDir, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val amped = emb.crossJoin(
            s.range(factor.toLong).select(col("id").as("k")))
          .select((col("vec_id") + col("k") * 1000000L).as("vec_id"),
            col("label"),
            expr("transform(v, (x, i) -> x + k * 0.001 * (i % 7))").as("v"))
          .localCheckpoint(true)
        graft.operators.EvalOps.silhouette(amped).count()
      }
    }
    // scaling table: seconds ratio between consecutive factors vs the
    // data ratio — bounded plans should sit at or below the data ratio
    val byOp = results.groupBy(_._1)
    println("op,factor,sec")
    results.foreach { case (op, f, sec) => println(f"$op,$f,$sec%.2f") }
    if (scales.size >= 2) {
      val dataRatio = scales.last.toDouble / scales.head
      println(f"data_ratio,${dataRatio}%.1f")
      byOp.toSeq.sortBy(_._1).foreach { case (op, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        val ratio = m(scales.last) / m(scales.head)
        println(f"ratio,$op,$ratio%.2f")
      }
    }
    s.stop()
  }
}
