package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.FloEngine
import graft.model.VersionVector

/**
 * CLI verbs over the engine — the Spark rendering of the reference's
 * `FloCliCommand` surface (flo-client-cli/src/client_cli/mod.rs:10-15:
 * produce/consume plus admin verbs).
 *
 * {{{
 * sbt "runMain graft.tools.Cli <root> produce <stream> <partition> <ns> <payload>"
 * sbt "runMain graft.tools.Cli <root> consume <stream> [glob] [limit]"
 * sbt "runMain graft.tools.Cli <root> status  <stream>"
 * sbt "runMain graft.tools.Cli <root> streams"
 * sbt "runMain graft.tools.Cli <root> compact <stream>"
 * sbt "runMain graft.tools.Cli <root> compact-small <stream> [minFileBytes]"
 * sbt "runMain graft.tools.Cli <root> expire  <stream> <cutoff-millis>"
 * sbt "runMain graft.tools.Cli <root> import  <stream> <segmentsDir>"
 * sbt "runMain graft.tools.Cli <root> export  <stream> <segmentsDir>"
 * sbt "runMain graft.tools.Cli <root> janitor <tick-millis> <run-millis>"
 * sbt "runMain graft.tools.Cli <root> dedup   <docsParquet> [threshold] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> bm25    <docsParquet> <term> [term...]"
 * sbt "runMain graft.tools.Cli <root> index-build  <embParquet> <indexPath> [cells] [codes]"
 * sbt "runMain graft.tools.Cli <root> index-append <embParquet> <indexPath>"
 * sbt "runMain graft.tools.Cli <root> index-status <indexPath>"
 * sbt "runMain graft.tools.Cli <root> index-expire <indexPath> <deadIdsParquet>"
 * sbt "runMain graft.tools.Cli <root> index-rebalance <indexPath> [--force]"
 * sbt "runMain graft.tools.Cli <root> index-search <indexPath> <embParquet> <k> [ids...]"
 * sbt "runMain graft.tools.Cli <root> pagerank <docsParquet> [iterations] [topK]"
 * sbt "runMain graft.tools.Cli <root> heavy-hitters <docsParquet> [k] [denom]"
 * sbt "runMain graft.tools.Cli <root> zorder-write <inParquet> <outDir> <colA> <colB> [colC] [files]"
 * sbt "runMain graft.tools.Cli <root> bloom-index <tableDir> <indexDir> <column>"
 * sbt "runMain graft.tools.Cli <root> bloom-lookup <tableDir> <indexDir> <column> <value>"
 * sbt "runMain graft.tools.Cli <root> compact-table <tableDir> [targetMB]"
 * sbt "runMain graft.tools.Cli <root> ns-index <stream>"
 * sbt "runMain graft.tools.Cli <root> consume-ns <stream> <namespace> [limit]"
 * sbt "runMain graft.tools.Cli <root> import-jsonl <jsonlDir> <outParquet>"
 * sbt "runMain graft.tools.Cli <root> export-jsonl <docsParquet> <outDir> [files]"
 * sbt "runMain graft.tools.Cli <root> explain <queryName> [sfDir]"
 * sbt "runMain graft.tools.Cli <root> table-view <stream>"
 * sbt "runMain graft.tools.Cli <root> hot-namespaces <stream> [k]"
 * sbt "runMain graft.tools.Cli <root> fuzzy-dedup <docsParquet> [maxDist] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> sem-dedup <embParquet> [threshold] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> lm-train <docsParquet> <modelPath>"
 * sbt "runMain graft.tools.Cli <root> lm-merge <modelA> <modelB> <modelOut>"
 * sbt "runMain graft.tools.Cli <root> lm-score <docsParquet> <modelPath> [outParquet]"
 * sbt "runMain graft.tools.Cli <root> line-dedup <docsParquet> <outParquet> [spanWords]"
 * sbt "runMain graft.tools.Cli <root> tfidf-keywords <docsParquet> [k] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> text-knn <docsParquet> <k> [ids...]"
 * sbt "runMain graft.tools.Cli <root> doc-clusters <docsParquet> [cells] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> phash-dedup <mediaParquet> [maxHamming] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> audio-match <audioParquet> [minVotes] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> winnow-dedup <docsParquet> [pct] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> ppjoin-dedup <docsParquet> [pct] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> snm-dedup <docsParquet> [pct] [passes]"
 * sbt "runMain graft.tools.Cli <root> incremental-dedup <docsParquet> [nBatches] [pct]"
 * sbt "runMain graft.tools.Cli <root> incremental-dedup-indexed <docsParquet> [nBatches] [pct]"
 * sbt "runMain graft.tools.Cli <root> init-dedup-index <indexDir> <seedDocsParquet> [pct]"
 * sbt "runMain graft.tools.Cli <root> ingest-dedup-batch <indexDir> <batchDocsParquet> [outParquet]"
 * sbt "runMain graft.tools.Cli <root> compact-dedup-index <indexDir>"
 * sbt "runMain graft.tools.Cli <root> containment <docsParquet> [pct]"
 * sbt "runMain graft.tools.Cli <root> communities <docsParquet> [iterations]"
 * sbt "runMain graft.tools.Cli <root> pca-project <embParquet> <outParquet> [r]"
 * sbt "runMain graft.tools.Cli <root> mmr-rerank <embParquet> <probeId> [k]"
 * sbt "runMain graft.tools.Cli <root> neyman-sample <docsParquet> [k] [outParquet]"
 * sbt "runMain graft.tools.Cli <root> shot-detect <videoParquet> [minHamming]"
 * sbt "runMain graft.tools.Cli <root> audio-segments <audioParquet>"
 * sbt "runMain graft.tools.Cli <root> weighted-dedup <docsParquet> [pct]"
 * sbt "runMain graft.tools.Cli <root> hybrid-search <docsParquet> <term> [term...]"
 * sbt "runMain graft.tools.Cli <root> hilbert-write <inParquet> <outDir> <colA> <colB> [files]"
 * sbt "runMain graft.tools.Cli <root> quality-audit <docsParquet> <modelDir>"
 * sbt "runMain graft.tools.Cli <root> silhouette <embParquet>"
 * sbt "runMain graft.tools.Cli <root> ks-drift <docsParquetA> <docsParquetB>"
 * sbt "runMain graft.tools.Cli <root> mixture-plan <docsParquet> [num] [den]"
 * sbt "runMain graft.tools.Cli <root> contrastive-pairs <docsParquet> [outParquet]"
 * sbt "runMain graft.tools.Cli <root> padding-audit <docsParquet>"
 * sbt "runMain graft.tools.Cli <root> epoch-plan <docsParquet>"
 * sbt "runMain graft.tools.Cli <root> length-outliers <docsParquet>"
 * sbt "runMain graft.tools.Cli <root> source-drift <docsParquetA> <docsParquetB>"
 * }}}
 *
 * The corpus verbs (`dedup`, `bm25`) run the public
 * [[graft.operators.CorpusOps]] surface over any (doc_id, text) parquet;
 * the `index-*` verbs run [[graft.operators.AnnIndex]] over any
 * (id, v: array&lt;double&gt;) parquet (a `vec_id`/`embedding` layout like the
 * testdata's is adapted automatically) — `<root>` is still required (an
 * engine is constructed) but unused by them.
 */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: Cli <root> <verb> [args...] (see scaladoc)")
      sys.exit(2)
    }
    val root = args(0)
    // embedded-vs-standalone: when a session already exists in this JVM
    // (a test harness or host app driving verbs in-process), use it and
    // do NOT stop it on exit — stopping the host's shared context kills
    // every later consumer. A fresh JVM (the normal CLI run) builds its
    // own session and stops it at the end as before.
    val preexisting = SparkSession.getDefaultSession
      .filter(s => !s.sparkContext.isStopped)
    val spark = preexisting.getOrElse(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new FloEngine(spark, root)

    args(1) match {
      case "produce" =>
        val Array(_, _, stream, partition, ns, payload) = args.take(6)
        engine.createStream(FloEngine.EventStreamOptions(stream, partition.toInt))
        val acked = engine.produceStrings(stream, partition.toInt, Seq(ns -> payload))
        acked.collect().foreach { r =>
          println(s"acked ${r.getAs[Long]("event_counter")}.${r.getAs[Int]("partition")}")
        }
      case "consume" =>
        val stream = args(2)
        val glob = if (args.length > 3) args(3) else "/**/*"
        val limit = if (args.length > 4) Some(args(4).toLong) else None
        engine.consumeAll(stream, glob, limit).collect().foreach { r =>
          println(s"${r.getAs[Long]("event_counter")}.${r.getAs[Int]("partition")} " +
            s"${r.getAs[String]("namespace")} " +
            new String(Option(r.getAs[Array[Byte]]("data")).getOrElse(Array.empty), "UTF-8"))
        }
      case "status" =>
        engine.status(args(2)).toSeq.sorted.foreach { case (p, h) =>
          println(s"partition=$p head=$h")
        }
      case "streams" =>
        engine.listStreams().foreach(println)
      case "compact" =>
        engine.compact(args(2)); println("compacted")
      case "compact-small" =>
        // steady-state maintenance: fold only small tail segments
        val minBytes = if (args.length > 3) args(3).toLong else 1L << 20
        val merged = engine.compactSmall(args(2), minBytes)
        println(merged.toSeq.sorted
          .map { case (p, n) => s"partition=$p merged=$n" }.mkString("\n"))
      case "expire" =>
        val dropped = engine.expireOldEvents(args(2),
          new java.sql.Timestamp(args(3).toLong))
        println(s"dropped ${dropped.size} files")
      case "import" =>
        println(s"imported ${engine.importSegments(args(2), args(3))} events")
      case "export" =>
        println(s"exported ${engine.exportSegments(args(2), args(3))} events")
      case "janitor" =>
        // run the scheduled retention janitor for a bounded window (a real
        // deployment calls startJanitor() and leaves it running)
        engine.startJanitor(Some(args(2).toLong))
        Thread.sleep(args(3).toLong)
        engine.stopJanitor()
        println("janitor stopped")
      case "dedup" =>
        // corpus-prep verb: near-dup pairs over a documents parquet
        // (doc_id, text) via the public operator surface. Results stream
        // through toLocalIterator — one partition on the driver at a time,
        // not a full collect (a web corpus's pair set would OOM the driver);
        // pass an output path as the 4th arg to skip stdout entirely
        val docs = spark.read.parquet(args(2))
        val threshold = if (args.length > 3) args(3).toDouble else 0.5
        val pairs = graft.operators.CorpusOps.nearDupPairsMinhash(docs, threshold)
          .orderBy("doc_a", "doc_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t${r.getAs[Double]("jaccard")}")
        }
      case "bm25" =>
        // corpus-prep verb: rank a documents parquet against query terms
        // (bounded: top-k only, so the collect is k rows by construction)
        val docs = spark.read.parquet(args(2))
        val terms = args.drop(3).toSeq
        graft.operators.CorpusOps.bm25(docs, terms, k = 20)
          .collect()
          .foreach(r => println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}"))
      case "index-build" =>
        // build the persisted ANN index once for an embeddings parquet;
        // dim read off the first row (all vectors must share it)
        val emb = embTable(spark, args(2))
        val dim = emb.select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("v"))).head().getInt(0)
        val cells = if (args.length > 4) args(4).toInt else 16
        val codes = if (args.length > 5) args(5).toInt else 64
        graft.operators.AnnIndex.buildIvfPq(emb, dim, args(3),
          cells = cells, codes = codes)
        println(s"built index at ${args(3)} (dim=$dim cells=$cells codes=$codes)")
      case "index-append" =>
        // append new vectors to an existing index without retraining
        graft.operators.AnnIndex.append(spark, args(3), embTable(spark, args(2)))
        println(s"appended ${args(2)} into ${args(3)}")
      case "index-status" =>
        graft.operators.AnnIndex.meta(spark, args(2)).collect().foreach { m =>
          println(m.schema.fieldNames.map(n => s"$n=${m.getAs[Any](n)}").mkString(" "))
        }
      case "index-expire" =>
        // retention coupling: trim vectors whose ids appear in the given
        // parquet id table (e.g. exported from an S6 expiry) out of the
        // index, then report the skew audit so an operator sees whether
        // the trim (or prior appends) left the cells unbalanced
        val dead = spark.read.parquet(args(3)).select("id")
        val removed = graft.operators.AnnIndex.expire(spark, args(2), dead)
        val skewed = graft.operators.AnnIndex.needsRebalance(spark, args(2))
        println(s"removed $removed vectors from ${args(2)}; needs_rebalance=$skewed")
      case "index-rebalance" =>
        // retrain in place from the persisted vectors when the skew audit
        // fires (or --force), restoring routing quality after drifted
        // appends. SINGLE WRITER, NO CONCURRENT SEARCH while this runs:
        // the swap leaves the live path briefly absent; a crash inside
        // the swap is healed automatically on the next run (or by
        // AnnIndex.recoverInterruptedSwap before serving).
        val force = args.length > 3 && args(3) == "--force"
        if (force || graft.operators.AnnIndex.needsRebalance(spark, args(2))) {
          graft.operators.AnnIndex.rebalance(spark, args(2))
          println(s"rebalanced ${args(2)}")
        } else println(s"${args(2)} is balanced; use --force to retrain anyway")
      case "index-search" =>
        // top-k neighbors for the given query ids (default: first 5 ids)
        val emb = embTable(spark, args(3))
        val k = args(4).toInt
        val queries =
          if (args.length > 5) {
            val ids = args.drop(5).map(_.toLong)
            emb.filter(org.apache.spark.sql.functions.col("id").isin(ids: _*))
          } else emb.orderBy("id").limit(5)
        graft.operators.AnnIndex.searchIvfPq(spark, args(2), queries, k,
            rerank = math.max(100, 2 * k))
          .orderBy("query_id", "rank")
          .collect()
          .foreach(r => println(s"${r.getAs[Long]("query_id")}\t" +
            s"${r.getAs[Int]("rank")}\t${r.getAs[Long]("neighbor_id")}"))
      case "pagerank" =>
        // authority scores over a documents parquet; output bounded to
        // top-k so the collect is k rows by construction
        val docs = spark.read.parquet(args(2))
        val iters = if (args.length > 3) args(3).toInt else 5
        val topK = if (args.length > 4) args(4).toInt else 25
        graft.operators.CorpusOps.docGraphPageRank(docs, iters)
          .orderBy(org.apache.spark.sql.functions.col("pr").desc,
            org.apache.spark.sql.functions.col("doc_id"))
          .limit(topK).collect()
          .foreach(r => println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("pr")}"))
      case "heavy-hitters" =>
        // exact tokens holding >= 1/denom of the corpus (two-pass
        // Misra-Gries; at most denom rows can qualify, so collect is safe)
        val docs = spark.read.parquet(args(2))
        val k = if (args.length > 3) args(3).toInt else 1000
        val denom = if (args.length > 4) args(4).toInt else 500
        graft.operators.CorpusOps.heavyHitters(docs, k, denom).collect()
          .foreach(r => println(s"${r.getAs[String]("tok")}\t${r.getAs[Long]("cnt")}"))
      case "zorder-write" =>
        // rewrite a parquet table z-clustered on two or three integral
        // columns: ... <colA> <colB> [colC] [files] (a numeric 6th arg is
        // the file count, a name is the third key)
        val in = spark.read.parquet(args(2))
        val rest = args.drop(6)
        val thirdKey = rest.headOption.filterNot(_.forall(_.isDigit))
        val files = (rest.drop(thirdKey.size.toInt) ++ Seq("16")).head.toInt
        thirdKey match {
          case Some(c) =>
            graft.operators.ZOrderLayout
              .writeClustered3(in, args(4), args(5), c, files, args(3))
          case None =>
            graft.operators.ZOrderLayout
              .writeClustered(in, args(4), args(5), files, args(3))
        }
        println(s"wrote $files z-clustered files to ${args(3)}")
      case "hilbert-write" =>
        // rewrite a parquet table hilbert-clustered on two integral columns
        val files = if (args.length > 6) args(6).toInt else 16
        graft.operators.ZOrderLayout.writeClusteredHilbert(
          spark.read.parquet(args(2)), args(4), args(5), files, args(3))
        println(s"wrote $files hilbert-clustered files to ${args(3)}")
      case "bloom-index" =>
        graft.operators.BloomFileIndex.build(spark, args(2), args(4), args(3))
        println(s"indexed ${args(2)} on ${args(4)} -> ${args(3)}")
      case "bloom-lookup" =>
        val hit = graft.operators.BloomFileIndex.lookup(
          spark, args(2), args(4), args(3), args(5).toLong)
        println(s"files_read=${hit.inputFiles.length}")
        hit.collect().foreach(println)
      case "ns-index" =>
        engine.indexNamespaces(args(2))
        println(s"namespace index built for ${args(2)}")
      case "consume-ns" =>
        // exact-namespace consume through the segment Bloom index
        val limit = if (args.length > 4) Some(args(4).toLong) else None
        engine.consumeIndexed(args(2), args(3), maxEvents = limit)
          .collect().foreach { r =>
            println(s"${r.getAs[Long]("event_counter")}.${r.getAs[Int]("partition")} " +
              s"${r.getAs[String]("namespace")} " +
              new String(Option(r.getAs[Array[Byte]]("data")).getOrElse(Array.empty), "UTF-8"))
          }
      case "table-view" =>
        // latest event per namespace (the KTable view of the log)
        engine.tableView(args(2)).orderBy("namespace").collect().foreach { r =>
          println(s"${r.getAs[String]("namespace")}\t" +
            s"${r.getAs[Long]("event_counter")}.${r.getAs[Int]("partition")}\t" +
            s"v${r.getAs[Long]("n_versions")}\t" +
            new String(Option(r.getAs[Array[Byte]]("data")).getOrElse(Array.empty), "UTF-8"))
        }
      case "hot-namespaces" =>
        // bounded-memory frequent-namespaces sketch (at most k rows out)
        val k = if (args.length > 3) args(3).toInt else 64
        engine.frequentNamespaces(args(2), k).collect().foreach { r =>
          println(s"${r.getAs[String]("namespace")}\t>=${r.getAs[Long]("count_lb")}")
        }
      case "explain" =>
        // print the formatted physical plan of any catalog query — the
        // evidence PLANS.md cites, on demand (plan shapes are the contract
        // the scale claims rest on; this is how to audit one live)
        val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
        graft.SparkEntry.queries.get(args(2)) match {
          case Some(fn) => fn(spark, sfDir).explain("formatted")
          case None =>
            System.err.println(s"unknown query '${args(2)}'; catalog has: " +
              graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
            sys.exit(2)
        }
      case "import-jsonl" =>
        // JSONL -> parquet ingest with a corruption audit up front
        val bad = graft.operators.CorpusIO.countCorrupt(spark, args(2))
        graft.operators.CorpusIO.readJsonl(spark, args(2))
          .write.mode("overwrite").parquet(args(3))
        val n = spark.read.parquet(args(3)).count()
        println(s"imported $n docs to ${args(3)} ($bad corrupt lines skipped)")
      case "export-jsonl" =>
        val files = if (args.length > 4) args(4).toInt else 0
        graft.operators.CorpusIO.writeJsonl(
          spark.read.parquet(args(2)), args(3), files)
        println(s"exported ${args(2)} as jsonl to ${args(3)}")
      case "compact-table" =>
        val targetMB = if (args.length > 3) args(3).toLong else 128L
        val (b, a) = graft.operators.Compaction.compactInPlace(
          spark, args(2), targetMB << 20)
        println(s"compacted ${args(2)}: $b -> $a files")
      case "unicode-clean" =>
        // unicode cleaning pass over a documents parquet: strip controls,
        // trim, collapse whitespace, NFC-normalize; writes the cleaned
        // corpus (doc_id, text) to the output path
        graft.expressions.GraftExtensions.register(spark)
        import org.apache.spark.sql.functions._
        val src = spark.read.parquet(args(2))
        val stripped = regexp_replace(col("text"),
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
        val collapsed = regexp_replace(trim(stripped), "[ \\t\\n\\r]+", " ")
        src.withColumn("text", call_function("graft_nfc", collapsed))
          .write.mode("overwrite").parquet(args(3))
        println(s"cleaned ${spark.read.parquet(args(3)).count()} docs to ${args(3)}")
      case "backoff-score" =>
        // Stupid Backoff trigram scoring: score <docs parquet> against a
        // <model-corpus parquet>; writes or streams per-doc tiers + nll
        val scored = graft.operators.LangModel.stupidBackoffNll(
            spark.read.parquet(args(2)), spark.read.parquet(args(3)))
          .orderBy("doc_id")
        if (args.length > 4) {
          scored.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} rows to ${args(4)}")
        } else scored.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("nll")}")
        }
      case "cdc-dedup" =>
        // content-defined chunking dedup stats over a documents parquet;
        // writes (doc_id, n_chunks, n_dup, dup_chars, total_chars) or
        // streams the dedupable fraction per doc
        val d = spark.read.parquet(args(2))
        val stats = graft.operators.CdcChunker.cdcDedup(d).orderBy("doc_id")
        if (args.length > 3) {
          stats.write.mode("overwrite").parquet(args(3))
          println(s"wrote ${spark.read.parquet(args(3)).count()} rows to ${args(3)}")
        } else stats.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("dup_chars")}/" +
            s"${r.getAs[Long]("total_chars")}")
        }
      case "quality-train" =>
        // train the quality classifier on a documents parquet, persist to
        // a model dir (weights + meta commit marker)
        val w = graft.operators.QualityModel.writeModel(
          spark.read.parquet(args(2)), args(3))
        println(s"trained quality model -> ${args(3)}: w_fp=${w.mkString(",")}")
      case "quality-score" =>
        // score a documents parquet against a persisted quality model;
        // writes (doc_id, score_fp, predicted, label) or streams verdicts
        val scored = graft.operators.QualityModel
          .scoreAgainst(spark.read.parquet(args(2)), args(3))
          .orderBy("doc_id")
        if (args.length > 4) {
          scored.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} rows to ${args(4)}")
        } else scored.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("score_fp")}\t" +
            s"${r.getAs[Boolean]("predicted")}")
        }
      case "dsir-select" =>
        // DSIR importance resampling: select <k> docs from a raw corpus
        // parquet toward a target corpus parquet's hashed-ngram
        // distribution; writes (doc_id, n_feats, weight_fp, kept) or
        // streams the kept ids
        val raw = spark.read.parquet(args(2))
        val target = spark.read.parquet(args(3))
        val k = if (args.length > 4) args(4).toInt else 1000
        val sel = graft.operators.Dsir.select(raw, target, k).orderBy("doc_id")
        if (args.length > 5) {
          sel.write.mode("overwrite").parquet(args(5))
          println(s"wrote ${spark.read.parquet(args(5)).count()} rows to ${args(5)}")
        } else sel.filter(org.apache.spark.sql.functions.col("kept"))
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("weight_fp")}")
          }
      case "fuzzy-dedup" =>
        // edit-distance near-dup pairs over a documents parquet; same
        // bounded-output discipline as `dedup` (stream or write, no collect)
        val docs = spark.read.parquet(args(2))
        val maxDist = if (args.length > 3) args(3).toInt else 4
        val pairs = graft.operators.EditDistance
          .fuzzyPrefixPairs(docs, prefixLen = 192, maxDist = maxDist)
          .orderBy("doc_id_a", "doc_id_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id_a")}\t${r.getAs[Long]("doc_id_b")}\t${r.getAs[Long]("dist")}")
        }
      case "sem-dedup" =>
        // SemDeDup pairs over an embeddings parquet
        val emb = embTable(spark, args(2))
        val threshold = if (args.length > 3) args(3).toDouble else 0.4
        val pairs = graft.operators.Ann
          .semanticDedupPairs(emb, threshold = threshold)
          .orderBy("id_a", "id_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("id_a")}\t${r.getAs[Long]("id_b")}\t${r.getAs[Double]("cos")}")
        }
      case "lm-train" =>
        // persist the bigram LM of a documents parquet (build once)
        graft.operators.LangModel.writeModel(spark.read.parquet(args(2)), args(3))
        val c12 = spark.read.parquet(s"${args(3)}/c12").count()
        println(s"trained LM at ${args(3)}: $c12 bigram types")
      case "lm-merge" =>
        // merge two persisted LMs (incremental retrain: sum counts, union
        // vocab, commit marker last) — merge(train(A), train(B)) scores
        // bit-identically to train(A ∪ B)
        graft.operators.LangModel.mergeModels(spark, args(2), args(3), args(4))
        val c12 = spark.read.parquet(s"${args(4)}/c12").count()
        println(s"merged LM at ${args(4)}: $c12 bigram types")
      case "lm-score" =>
        // score a documents parquet against a persisted LM (score many);
        // output is doc-count-bounded — write to parquet or stream rows
        val scored = graft.operators.LangModel
          .scoreAgainst(spark.read.parquet(args(2)), args(3))
          .orderBy("doc_id")
        if (args.length > 4) {
          scored.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} scores to ${args(4)}")
        } else scored.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("nll")}")
        }
      case "line-dedup" =>
        // keep-first span dedup (the RefinedWeb exact-line rule) over a
        // documents parquet; writes (doc_id, n_spans, n_kept, clean_text)
        val span = if (args.length > 4) args(4).toInt else 8
        graft.operators.CorpusOps
          .lineDedup(spark.read.parquet(args(2)), spanWords = span)
          .write.mode("overwrite").parquet(args(3))
        val out = spark.read.parquet(args(3))
        import org.apache.spark.sql.functions.sum
        val (tot, kept) = out.agg(sum("n_spans"), sum("n_kept")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).head
        println(s"line-dedup: kept $kept of $tot spans -> ${args(3)}")
      case "tfidf-keywords" =>
        // top-k characteristic terms per doc (exact-integer idf surrogate)
        val k = if (args.length > 3) args(3).toInt else 3
        val kw = graft.operators.CorpusOps
          .tfidfKeywords(spark.read.parquet(args(2)), k)
          .orderBy("doc_id", "rnk")
        if (args.length > 4) {
          kw.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} keyword rows to ${args(4)}")
        } else kw.limit(1000).toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Int]("rnk")}\t" +
            s"${r.getAs[String]("term")}\t${r.getAs[Long]("score")}")
        }
      case "text-knn" =>
        // top-k most similar docs by exact integer inner product over the
        // hashed-TF-IDF vectors, for the given probe doc ids
        import org.apache.spark.sql.functions._
        val k = args(3).toInt
        val ids = args.drop(4).map(_.toLong)
        val vecs = graft.operators.CorpusOps
          .hashedTfidf(spark.read.parquet(args(2)), buckets = 64)
        val probes = vecs.filter(col("doc_id").isin(ids: _*))
          .select(col("doc_id").as("query_id"), col("bucket"),
            col("weight").as("wq"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))
        probes.join(vecs.select(col("doc_id").as("neighbor_id"), col("bucket"),
            col("weight").as("wc")), Seq("bucket"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .groupBy("query_id", "neighbor_id")
          .agg(sum(col("wq") * col("wc")).as("dot"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
          .orderBy("query_id", "rank")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("query_id")}\t${r.getAs[Int]("rank")}\t" +
              s"${r.getAs[Long]("neighbor_id")}\t${r.getAs[Long]("dot")}")
          }
      case "doc-clusters" =>
        // topic clustering + tf-idf labels over a documents parquet
        import org.apache.spark.sql.functions._
        val cells = if (args.length > 3) args(3).toInt else 8
        val d = spark.read.parquet(args(2))
        val assign = graft.operators.CorpusOps.docClusters(d, cells = cells)
        if (args.length > 4) {
          assign.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} assignments to ${args(4)}")
        } else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("cell").orderBy(col("total").desc, col("term"))
          assign.join(graft.operators.CorpusOps.tfidfScored(d), "doc_id")
            .groupBy("cell", "term").agg(sum("score").as("total"))
            .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
            .orderBy("cell", "rnk")
            .toLocalIterator().forEachRemaining { r =>
              println(s"${r.getAs[Long]("cell")}\t${r.getAs[Int]("rnk")}\t" +
                s"${r.getAs[String]("term")}")
            }
        }
      case "phash-dedup" =>
        // perceptual-hash image near-dup over a (doc_id, data) parquet of
        // encoded images (BMP/PNG/JPEG/GIF)
        import spark.implicits._
        val maxH = if (args.length > 3) args(3).toInt else 3
        val items = spark.read.parquet(args(2))
          .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
            org.apache.spark.sql.functions.col("data"))
          .as[(Long, Array[Byte])]
          .map { case (id, data) =>
            graft.multimodal.Multimodal.MediaItem(id, "image", data, 0, 0) }
        val pairs = graft.multimodal.Multimodal
          .imageNearDupPairsPhash(items, maxHamming = maxH)
          .orderBy("doc_a", "doc_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
            s"${r.getAs[Int]("hamming")}")
        }
      case "audio-match" =>
        // spectral landmark matching over a (doc_id, data) parquet of WAVs
        import spark.implicits._
        val votes = if (args.length > 3) args(3).toInt else 3
        val items = spark.read.parquet(args(2))
          .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
            org.apache.spark.sql.functions.col("data"))
          .as[(Long, Array[Byte])]
          .map { case (id, data) =>
            graft.multimodal.Multimodal.AudioItem(id, "audio", data, 0, 0) }
        val pairs = graft.multimodal.Multimodal
          .audioSpectralMatches(items, minVotes = votes)
          .orderBy("doc_a", "doc_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} matches to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
            s"${r.getAs[Long]("votes")}")
        }
      case "winnow-dedup" =>
        // winnowing (MOSS) fingerprint near-dup over a documents parquet
        import org.apache.spark.sql.functions.col
        val pct = if (args.length > 3) args(3).toInt else 50
        val pairs = graft.operators.CorpusOps
          .winnowPairs(docsTable(spark, args(2)), pct = pct)
          .orderBy("doc_a", "doc_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
            s"${r.getAs[Double]("score")}")
        }
      case "ppjoin-dedup" =>
        // lossless prefix-filtered near-dup (PPJoin): exact jaccard >= pct/100
        val pct = if (args.length > 3) args(3).toInt else 50
        val pairs = graft.operators.CorpusOps
          .ppjoinPairs(docsTable(spark, args(2)), pct = pct)
          .orderBy("doc_a", "doc_b")
        if (args.length > 4) {
          pairs.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} pairs to ${args(4)}")
        } else pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
            s"${r.getAs[Double]("jaccard")}")
        }
      case "incremental-dedup" =>
        // growing-corpus ingestion: replay the docs table in <nBatches>
        // id-ordered micro-batches through the accepted-corpus guard
        // (cross ppjoinAcross drop + intra keep-best), then compare with
        // the one-shot run of the same operator
        import org.apache.spark.sql.functions.{col, length, lit}
        val n = if (args.length > 3) args(3).toInt else 4
        val pct = if (args.length > 4) args(4).toInt else 50
        val all = docsTable(spark, args(2))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .localCheckpoint(true)
        // exact (relativeError 0) id quantiles make contiguous id-ordered
        // batches without a corpus-sized window
        val cuts = all.stat.approxQuantile("doc_id",
          (1 until n).map(_.toDouble / n).toArray, 0.0)
        var accepted = all.limit(0).localCheckpoint(true)
        (0 until n).foreach { b =>
          val lo = if (b == 0) lit(true) else col("doc_id") > cuts(b - 1)
          val hi = if (b == n - 1) lit(true) else col("doc_id") <= cuts(b)
          val batch = all.filter(lo && hi).localCheckpoint(true)
          val kept = graft.operators.CorpusOps
            .incrementalPpjoinKeep(batch, accepted, pct)
          accepted = accepted.unionByName(kept).localCheckpoint(true)
          println(s"batch $b: ${batch.count()} docs in, accepted total ${accepted.count()}")
        }
        val oneShot = graft.operators.CorpusOps
          .incrementalPpjoinKeep(all, all.limit(0), pct).count()
        println(s"incremental accepted ${accepted.count()}; one-shot keep-best kept $oneShot")
      case "init-dedup-index" =>
        // stand up a PERSISTED accepted-corpus dedup index a deployment
        // ingests into across CLI invocations (the incremental-dedup-indexed
        // verb above is the self-contained replay DEMO of the same API):
        // freeze the gram order on the seed docs, commit empty tables +
        // the pct/format meta stamp. Ingest the seed itself as the first
        // ingest-dedup-batch call.
        import org.apache.spark.sql.functions.{col, length}
        val idxDir = args(2)
        val seed = docsTable(spark, args(3))
          .withColumn("n_chars", length(col("text")).cast("long"))
        val pct = if (args.length > 4) args(4).toInt else 50
        graft.operators.CorpusOps.ppjoinIndexInit(spark, idxDir, seed, pct)
        val (mPct, mVer) = graft.operators.CorpusOps.ppjoinIndexMeta(spark, idxDir)
        println(s"initialized dedup index at $idxDir (pct=$mPct, format v$mVer)")
      case "ingest-dedup-batch" =>
        // one ingestion step against a persisted index: probe + intra
        // keep-best under the index's OWN stamped pct, append the kept
        // docs' rows; prints the admitted ids (or writes them to parquet)
        import org.apache.spark.sql.functions.{col, length}
        val idxDir = args(2)
        val batch = docsTable(spark, args(3))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .localCheckpoint(true)
        // pre-join accounting readout (ppjoinPrefixAudit): the per-decade
        // posting mass the batch is about to put through the prefix join —
        // a heavy top decade (max_posting ~ batch size, implied_pairs
        // quadratic) says run exact/normalized dedup FIRST. Two shuffles
        // on rows the ingest reads anyway; printed per batch so the
        // discipline reaches the operator actually driving ingestion.
        val (auditPct, _) = graft.operators.CorpusOps.ppjoinIndexMeta(spark, idxDir)
        graft.operators.CorpusOps.ppjoinPrefixAudit(batch, auditPct)
          .collect().foreach { r =>
            println(s"prefix-audit decade=${r.getAs[Int]("df_decade")} " +
              s"n_grams=${r.getAs[Long]("n_grams")} " +
              s"posting_rows=${r.getAs[Long]("posting_rows")} " +
              s"max_posting=${r.getAs[Long]("max_posting")} " +
              s"implied_pairs=${r.getAs[Long]("implied_pairs")} " +
              s"top_gram=${r.getAs[String]("top_gram")}")
          }
        val kept = graft.operators.CorpusOps.ppjoinIndexIngest(spark, idxDir, batch)
        if (args.length > 4) {
          kept.write.mode("overwrite").parquet(args(4))
          println(s"batch ${batch.count()} docs in, kept " +
            s"${spark.read.parquet(args(4)).count()} -> ${args(4)}")
        } else {
          val ids = kept.select("doc_id").orderBy("doc_id")
            .collect().map(_.getLong(0))
          println(s"batch ${batch.count()} docs in, kept ${ids.length}: " +
            ids.take(50).mkString(",") + (if (ids.length > 50) ",..." else ""))
        }
      case "compact-dedup-index" =>
        // fold the index's committed batch dirs into one (the small-file
        // maintenance a long-running ingest deployment schedules, same
        // discipline as the event log's compact-small): O(1) dirs per
        // probe afterward, probe results unchanged
        val folded = graft.operators.CorpusOps.ppjoinIndexCompact(spark, args(2))
        println(s"compacted dedup index at ${args(2)}: folded $folded batches")
      case "incremental-dedup-indexed" =>
        // the 100 TB ingestion shape: the accepted corpus lives as
        // APPEND-ONLY parquet index tables (prefix postings + gram sets)
        // under a frozen gram order — each batch probes the postings and
        // appends only its kept docs' rows; no history re-aggregation
        import org.apache.spark.sql.functions.{col, length, lit}
        val n = if (args.length > 3) args(3).toInt else 4
        val pct = if (args.length > 4) args(4).toInt else 50
        val idx = java.nio.file.Files.createTempDirectory("graft-incidx").toString
        val all = docsTable(spark, args(2))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .localCheckpoint(true)
        val cuts = all.stat.approxQuantile("doc_id",
          (1 until n).map(_.toDouble / n).toArray, 0.0)
        // freeze the order on the FIRST batch (the seed corpus); the
        // persisted-index API owns the pct/format stamp and pins each
        // step's outputs before appending (ppjoinIndexIngest)
        val first = all.filter(
          if (n == 1) lit(true) else col("doc_id") <= cuts(0))
        graft.operators.CorpusOps.ppjoinIndexInit(spark, idx, first, pct)
        var acceptedN = 0L
        (0 until n).foreach { b =>
          val lo = if (b == 0) lit(true) else col("doc_id") > cuts(b - 1)
          val hi = if (b == n - 1) lit(true) else col("doc_id") <= cuts(b)
          val batch = all.filter(lo && hi).localCheckpoint(true)
          val kept = graft.operators.CorpusOps
            .ppjoinIndexIngest(spark, idx, batch)
          val keptN = kept.count()
          acceptedN += keptN
          println(s"batch $b: ${batch.count()} docs in, kept $keptN, accepted total $acceptedN")
        }
        println(s"indexed-incremental accepted $acceptedN docs; index at $idx")
      case "snm-dedup" =>
        // sorted-neighborhood screening: <passes> multi-pass, window 10
        val pct = if (args.length > 3) args(3).toInt else 50
        val passes = if (args.length > 4) args(4).toInt else 2
        val pairs = graft.operators.CorpusOps
          .snmMultipass(docsTable(spark, args(2)), passes = passes, pct = pct)
          .orderBy("doc_a", "doc_b")
        pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
            s"${r.getAs[Double]("jaccard")}")
        }
      case "containment" =>
        // asymmetric quote/inclusion detection: inner >= pct% inside outer
        val pct = if (args.length > 3) args(3).toInt else 90
        val pairs = graft.operators.CorpusOps
          .containmentPairs(docsTable(spark, args(2)), pct = pct)
          .orderBy("inner_id", "outer_id")
        pairs.toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("inner_id")}\t${r.getAs[Long]("outer_id")}\t" +
            s"${r.getAs[Double]("containment")}")
        }
      case "communities" =>
        // label-propagation communities over the co-chunk graph; prints
        // the non-singleton communities with their members
        import org.apache.spark.sql.functions._
        val iters = if (args.length > 3) args(3).toInt else 3
        graft.operators.CorpusOps
          .docGraphCommunities(docsTable(spark, args(2)), iterations = iters)
          .groupBy("community").agg(
            count(lit(1)).as("sz"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          .filter(col("sz") > 1)
          .orderBy(desc("sz"), asc("community"))
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("community")}\t${r.getAs[Long]("sz")}\t" +
              r.getAs[Seq[Long]]("members").mkString(","))
          }
      case "pca-project" =>
        // fit top-r components on an embeddings parquet, project, write
        val r = if (args.length > 4) args(4).toInt else 8
        val e = embTable(spark, args(2))
        val model = graft.operators.Pca.fit(e, r)
        val proj = graft.operators.Pca.project(e, model.wFp)
        proj.write.mode("overwrite").parquet(args(3))
        println(s"wrote ${spark.read.parquet(args(3)).count()} rows to ${args(3)}; " +
          s"variance shares (ppm): ${model.varSharePpm.mkString(",")}")
      case "weighted-dedup" =>
        // exact multiset-jaccard near-dup over a documents parquet
        val pct = if (args.length > 3) args(3).toInt else 50
        graft.operators.CorpusOps
          .weightedJaccardPairs(docsTable(spark, args(2)), pct = pct)
          .orderBy("doc_a", "doc_b")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("doc_a")}\t${r.getAs[Long]("doc_b")}\t" +
              s"${r.getAs[Double]("wjac")}")
          }
      case "hybrid-search" =>
        // BM25 + hashed-vector retrieval fused by RRF
        val terms = args.drop(3).toSeq
        graft.operators.CorpusOps
          .hybridRrf(docsTable(spark, args(2)), terms, topN = 20, k = 10)
          .orderBy(org.apache.spark.sql.functions.col("rrf").desc,
            org.apache.spark.sql.functions.col("doc_id"))
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("doc_id")}\trrf=${r.getAs[Long]("rrf")}\t" +
              s"bm25=${r.getAs[Long]("rank_bm25")}\tvec=${r.getAs[Long]("rank_vec")}")
          }
      case "mmr-rerank" =>
        // diversity re-rank around a probe vector id
        val probe = args(3).toLong
        val k = if (args.length > 4) args(4).toInt else 10
        graft.operators.Mmr.rerank(embTable(spark, args(2)), probe, n = 4 * k, k = k)
          .orderBy("rank")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Int]("rank")}\t${r.getAs[Long]("vec_id")}\t" +
              s"${r.getAs[Long]("rel_milli")}")
          }
      case "neyman-sample" =>
        // variance-optimal stratified sample of a documents parquet
        val k = if (args.length > 3) args(3).toInt else 100
        val out = graft.operators.CorpusOps.neymanSample(
          spark.read.parquet(args(2)), k)
        if (args.length > 4) {
          out.write.mode("overwrite").parquet(args(4))
          println(s"wrote ${spark.read.parquet(args(4)).count()} rows to ${args(4)}")
        } else out.groupBy("lang").count().orderBy("lang")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[String]("lang")}\t${r.getAs[Long]("count")}")
          }
      case "shot-detect" =>
        // shot boundaries over a (doc_id, data) parquet of AVI videos
        import spark.implicits._
        val minH = if (args.length > 3) args(3).toInt else 16
        val items = spark.read.parquet(args(2))
          .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
            org.apache.spark.sql.functions.col("data"))
          .as[(Long, Array[Byte])]
          .map { case (id, data) =>
            graft.multimodal.Multimodal.VideoItem(id, "video", data, 0, 0, 0) }
        graft.multimodal.Multimodal.shotBoundaries(
            graft.multimodal.Multimodal.videoFrameHashes(items), minHamming = minH)
          .orderBy("doc_id", "boundary_idx")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("boundary_idx")}\t" +
              s"${r.getAs[Long]("hamming")}")
          }
      case "audio-segments" =>
        // activity segments over a (doc_id, data) parquet of WAVs
        import spark.implicits._
        val items = spark.read.parquet(args(2))
          .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
            org.apache.spark.sql.functions.col("data"))
          .as[(Long, Array[Byte])]
          .map { case (id, data) =>
            graft.multimodal.Multimodal.AudioItem(id, "audio", data, 0, 0) }
        graft.multimodal.Multimodal.audioSegments(
            graft.multimodal.Multimodal.audioEnergyRows(items))
          .orderBy("doc_id", "seg_start")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[Long]("doc_id")}\t${r.getAs[Long]("seg_start")}\t" +
              s"${r.getAs[Long]("seg_end")}\t${r.getAs[Long]("n_frames")}")
          }
      case "quality-audit" =>
        // ROC-AUC + reliability table of a persisted quality model over a
        // documents parquet (train first with quality-train)
        val scored = graft.operators.QualityModel
          .scoreAgainst(docsTable(spark, args(2)), args(3))
        val auc = graft.operators.EvalOps
          .rocAuc(scored, "score_fp", "label").collect()(0)
        println(s"auc_ppm=${auc.getAs[Long]("auc_ppm")}\t" +
          s"gini_ppm=${auc.getAs[Long]("gini_ppm")}\t" +
          s"n_pos=${auc.getAs[Long]("n_pos")}\tn_neg=${auc.getAs[Long]("n_neg")}")
        graft.operators.EvalOps
          .calibration(scored, "score_fp", "label", "predicted")
          .toLocalIterator().forEachRemaining { r =>
            println(s"bin=${r.getAs[Long]("bin")}\tn=${r.getAs[Long]("n")}\t" +
              s"pos_rate_ppm=${r.getAs[Long]("pos_rate_ppm")}\t" +
              s"mean_score_fp=${r.getAs[Long]("mean_score_fp")}")
          }
      case "silhouette" =>
        // per-label centroid silhouette over a labeled embeddings parquet
        import org.apache.spark.sql.functions.col
        val e = spark.read.parquet(args(2))
          .select(col("vec_id").cast("long").as("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        graft.operators.EvalOps.silhouette(e)
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.get(0)}\tn=${r.getAs[Long]("n")}\t" +
              s"mean_sil_ppm=${r.getAs[Long]("mean_sil_ppm")}")
          }
      case "ks-drift" =>
        // exact two-sample KS on per-doc token counts between two corpora
        import org.apache.spark.sql.functions.{col, size, split, trim}
        def lens(p: String) = docsTable(spark, p)
          .select(size(split(trim(col("text")), " +")).cast("long").as("v"))
        val r = graft.operators.EvalOps
          .ksDrift(lens(args(2)), lens(args(3)), "v").collect()(0)
        println(s"n_a=${r.getAs[Long]("n_a")}\tn_b=${r.getAs[Long]("n_b")}\t" +
          s"ks_ppm=${r.getAs[Long]("ks_ppm")}\t" +
          s"reject_05=${r.getAs[Boolean]("reject_05")}")
      case "mixture-plan" =>
        // exact waterfilling of a token budget across sources with caps
        import org.apache.spark.sql.functions.{col, size, split, sum, trim}
        val num = if (args.length > 3) args(3).toLong else 1L
        val den = if (args.length > 4) args(4).toLong else 2L
        val avail = spark.read.parquet(args(2))
          .select(col("source"),
            size(split(trim(col("text")), " +")).cast("long").as("n"))
          .groupBy("source").agg(sum("n").as("avail"))
        graft.operators.EvalOps.waterfill(avail, num, den)
          .orderBy("source")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[String]("source")}\tavail=${r.getAs[Long]("avail")}\t" +
              s"alloc=${r.getAs[Long]("alloc")}\tsaturated=${r.getAs[Boolean]("saturated")}")
          }
      case "contrastive-pairs" =>
        // (anchor, positive, negative) triples over a documents parquet
        val pairs = graft.operators.EvalOps
          .contrastivePairs(docsTable(spark, args(2))).orderBy("doc_id")
        if (args.length > 3) {
          pairs.write.mode("overwrite").parquet(args(3))
          println(s"wrote ${spark.read.parquet(args(3)).count()} pairs to ${args(3)}")
        } else pairs.limit(20).toLocalIterator().forEachRemaining { r =>
          println(s"${r.getAs[Long]("doc_id")}\tneg=${r.getAs[Long]("neg_doc_id")}\t" +
            s"${r.getAs[String]("anchor").take(40)}")
        }
      case "epoch-plan" =>
        // epochs-per-source data recipe over a documents parquet
        import org.apache.spark.sql.functions.{col, expr, floor, size, split, sqrt, sum, trim}
        val avail = spark.read.parquet(args(2))
          .select(col("source"),
            size(split(trim(col("text")), " +")).cast("long").as("n"))
          .groupBy("source").agg(sum("n").as("avail"))
          .withColumn("weight", floor(sqrt(col("avail").cast("double"))))
        val tot = avail.agg(sum("avail").as("b"), sum("weight").as("tot_w"))
        avail.crossJoin(org.apache.spark.sql.functions.broadcast(tot))
          .withColumn("target", expr("b * weight div tot_w"))
          .withColumn("epochs", expr("(target + avail - 1) div avail"))
          .orderBy("source")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[String]("source")}\tavail=${r.getAs[Long]("avail")}\t" +
              s"target=${r.getAs[Long]("target")}\tepochs=${r.getAs[Long]("epochs")}")
          }
      case "length-outliers" =>
        // robust per-source length outliers (5-MAD band)
        import org.apache.spark.sql.functions._
        val t0 = spark.read.parquet(args(2)).select(col("source"),
          size(split(trim(col("text")), " +")).cast("double").as("x"))
        val med = graft.operators.Quantiles
          .exactQuantiles(t0, Seq("source"), "x", Seq(0.5))
          .select(col("source"), col("q_0").as("med"))
        val dev = t0.join(broadcast(med), "source")
          .withColumn("dv", abs(col("x") - col("med")))
        val mad = graft.operators.Quantiles
          .exactQuantiles(dev, Seq("source"), "dv", Seq(0.5))
          .select(col("source"), col("q_0").as("mad"))
        t0.join(broadcast(med), "source").join(broadcast(mad), "source")
          .groupBy("source").agg(count(lit(1)).as("docs"),
            sum(when(abs(col("x") - col("med")) >
                greatest(col("mad") * 5, lit(1.0)), 1L).otherwise(0L)).as("n_outliers"))
          .orderBy("source")
          .toLocalIterator().forEachRemaining { r =>
            println(s"${r.getAs[String]("source")}\tdocs=${r.getAs[Long]("docs")}\t" +
              s"outliers=${r.getAs[Long]("n_outliers")}")
          }
      case "source-drift" =>
        // chi-square source-composition drift between two corpora
        import org.apache.spark.sql.functions._
        def cnt(p: String, n: String) = spark.read.parquet(p)
          .groupBy("source").agg(count(lit(1)).as(n))
        val byc = cnt(args(2), "ca").join(cnt(args(3), "cb"), Seq("source"), "full_outer")
          .na.fill(0L, Seq("ca", "cb"))
        val tot = byc.agg(sum("ca").as("na"), sum("cb").as("nb"))
        val r = byc.crossJoin(broadcast(tot))
          .withColumn("diff", col("ca") * col("nb") - col("cb") * col("na"))
          .withColumn("contrib_micro",
            floor(col("diff").cast("double") * col("diff") * 1000000.0 /
              (col("na").cast("double") * col("nb") *
                (col("ca") + col("cb")).cast("double"))).cast("long"))
          .agg(count(lit(1)).as("n_categories"), sum("contrib_micro").as("chi2_micro"))
          .collect()(0)
        println(s"categories=${r.getAs[Long]("n_categories")}\t" +
          s"chi2_micro=${r.getAs[Long]("chi2_micro")}")
      case "padding-audit" =>
        // padding-waste table over a documents parquet
        graft.operators.EvalOps.paddingWaste(docsTable(spark, args(2)))
          .toLocalIterator().forEachRemaining { r =>
            println(s"bucket=${r.getAs[Long]("bucket_ub")}\tdocs=${r.getAs[Long]("docs")}\t" +
              s"tokens=${r.getAs[Long]("tokens")}\t" +
              s"bucket_waste_ppm=${r.getAs[Long]("bucket_waste_ppm")}")
          }
      case "catalog" =>
        // inventory of the query catalog: every SparkEntry query with its
        // oracle status — `all` also prints the no_oracle / orphan sets
        val q = graft.SparkEntry.queries.keySet
        val o = graft.SparkEntry.oracleSql.keySet
        println(s"queries=${q.size} oracles=${o.size} no_oracle=${(q -- o).size}")
        if (args.length > 2 && args(2) == "all") {
          (q -- o).toSeq.sorted.foreach(n => println(s"no_oracle\t$n"))
          (o -- q).toSeq.sorted.foreach(n => println(s"orphan_oracle\t$n"))
        }
      case other =>
        System.err.println(s"unknown verb: $other")
        sys.exit(2)
    }
    // release the writer lease: verbs that produced hold it, and a CLI
    // re-run on the same root inside the lease TTL would otherwise be
    // refused as a second live writer
    engine.close()
    if (preexisting.isEmpty) spark.stop()
  }

  /** Documents-shaped read for corpus verbs: (doc_id: long, text). */
  private def docsTable(spark: SparkSession, path: String) = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
  }

  /** Adapt any embeddings parquet to the (id: long, v: array<double>)
    * shape the Ann operators take; accepts the testdata's
    * (vec_id, embedding) layout directly. */
  private def embTable(spark: SparkSession, path: String) = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(path)
    val cols = df.columns.toSet
    val base =
      if (cols.contains("id") && cols.contains("v")) df
      else if (cols.contains("vec_id") && cols.contains("embedding"))
        df.select(col("vec_id").as("id"), col("embedding").as("v"))
      else {
        System.err.println(
          s"expected (id, v) or (vec_id, embedding) columns, got ${df.columns.mkString(",")}")
        sys.exit(2)
      }
    base.select(col("id").cast("long").as("id"),
      col("v").cast("array<double>").as("v"))
  }
}
