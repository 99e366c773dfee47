package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Public corpus-preparation API over "documents-shaped" DataFrames
 * (`doc_id: bigint`, `text: string`[, `lang: string`]) — the training-data
 * operators the query catalog exercises, promoted to a library surface so a
 * user can run them on their own tables (the same operator-as-API
 * discipline as [[AsofJoin]]/[[RangeJoin]]; the reference exposes its
 * operations to embedders the same way, flo-server/tests/embedded_tests.rs).
 *
 * Every operator here keeps the catalog's scale shape: one corpus-sized
 * shuffle on a high-cardinality or salted key, tiny side tables broadcast,
 * id-only pairs on heavy joins. The catalog queries delegate to these (or
 * to the same `private[graft]` kernels), so the DuckDB oracle checks cover
 * this surface too.
 */
object CorpusOps {

  /** Exact-duplicate groups: one hash shuffle on the content hash.
    * Returns (text_hash, keep_id = min doc_id, n_copies). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Case/punctuation/whitespace-insensitive duplicate groups. */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs.groupBy(md5(norm).as("norm_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /**
   * Benchmark decontamination: training docs sharing at least one word
   * 5-gram with the eval corpus, with their distinct-hit counts. The eval
   * gram set is SIZED first and broadcast only when it fits
   * `maxBroadcastGrams` (~50 MB at the default); past that the join
   * degrades to a shuffle instead of OOMing on an oversized broadcast. The
   * corpus-side gram stream never shuffles before the join filter.
   */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      maxBroadcastGrams: Long = graft.queries.PipelineQueries.MaxBroadcastGrams): DataFrame = {
    val evalGrams = graft.queries.PipelineQueries.fiveGrams(eval)
      .select("gram").distinct()
    val evalSide =
      if (evalGrams.count() <= maxBroadcastGrams) broadcast(evalGrams) else evalGrams
    graft.queries.PipelineQueries.fiveGrams(train)
      .join(evalSide, "gram")
      .dropDuplicates("doc_id", "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /**
   * Connected components over an undirected pair table `(doc_a, doc_b)` —
   * turns pairwise near-dup verdicts into dedup GROUPS (keep one doc per
   * component). Hash-min label propagation: each round is ONE distributed
   * join+agg pushing the smallest known label across edges, O(cluster
   * diameter) rounds; convergence rides a `changed` flag carried through
   * each round's localCheckpoint (a cached scan, not a second join), and
   * each round frees the previous round's checkpoint blocks so block
   * storage stays O(1) in rounds. Returns (doc_id, component = min member
   * id, n_members).
   */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val und = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // Dataset.localCheckpoint persists its materialized RDD internally; the
    // handle isn't public API, so track it by diffing the persistent-RDD
    // registry around the (eager) checkpoint call
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var (labels, liveIds) = checkpointed(
      und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp")))
    var converged = false
    while (!converged) {
      val prop = und.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("p"))
      // labels only ever decrease, so "this round changed something"
      // ⟺ some propagated min undercuts the current label (p < comp)
      val (next, nextIds) = checkpointed(labels
        .join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("p"), col("comp"))).as("comp"),
          (coalesce(col("p"), col("comp")) < col("comp")).as("changed")))
      converged = next.filter(col("changed")).isEmpty
      free(liveIds)
      labels = next.drop("changed")
      liveIds = nextIds
    }
    und.unpersist()
    val w = Window.partitionBy("comp")
    labels.select(col("id").as("doc_id"), col("comp").as("component"),
      count(lit(1)).over(w).as("n_members"))
  }

  /** Per-doc duplicated-chunk stats (cross-document "line" dedup signal):
    * returns (doc_id, n_chunks, n_dup, dup_frac). One shuffle on the chunk
    * hash. */
  def chunkDedupStats(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.chunkDedup(docs)

  /** Deterministic per-language top-k sample (skew-guarded: per-(lang,
    * salt) pre-filter, provably recall-complete — see PLANS.md). Returns
    * (doc_id, lang, rn <= k). */
  def stratifiedSample(docs: DataFrame, k: Int = 20, salts: Int = 32): DataFrame = {
    val surv = graft.queries.PipelineQueries.stratifiedSurvivors(docs, k, salts)
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    surv.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Size-balanced shard packing audit via salted two-level ranking.
    * Returns (bin, n_docs, total_tokens). */
  def packBins(docs: DataFrame, nBins: Int = 8, salts: Int = 32): DataFrame =
    graft.queries.PipelineQueries.packBins(docs, nBins, salts)

  /** Fixed-window sequence-packing audit (training sequences of `window`
    * tokens, greedy in salted-hash order within uniformly-hashed shards).
    * Returns (shard, seq_id, n_docs, total_tokens). */
  def seqPack(docs: DataFrame, window: Int = 512, shards: Int = 64): DataFrame =
    graft.queries.PipelineQueries.seqPack(docs, window, shards)
}
