package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Content-defined chunking (CDC) dedup — the storage-dedup primitive
 * (Rabin fingerprinting / LBFS; the gear-hash variant follows FastCDC,
 * Xia et al., USENIX ATC'16) applied to corpus preparation: cut every
 * document at positions chosen by a rolling hash of the local content,
 * then dedup chunks ACROSS documents by content hash. Because boundaries
 * depend on content, not offsets, an insertion near the head of a copied
 * document shifts every byte — and the chunker still re-synchronizes a
 * few chunks later, so the shared tail dedups. Fixed-size chunking
 * (`docChunks`-style word windows) misses ALL of a shifted copy;
 * seed-and-extend finds it but pays a posting join. CDC is the O(n)
 * middle path storage systems run at exabyte scale.
 *
 * Engine split (the fixture protocol): the gear-hash boundary scan is the
 * one non-SQL step — `pipe_cdc_dedup` exports (doc_id, start, len) and
 * BOTH engines recompute chunk identity (md5 of the substring) and the
 * first-occurrence dedup verdict from the same table, so everything
 * downstream of the kernel hash-checks engine-independently.
 *
 * Scale shape (100 TB): chunking is one mapPartitions pass (per-doc state:
 * one long); chunk rows carry (doc_id, start, len) + a hash — never the
 * chunk text twice; the dedup verdict is ONE hash-keyed aggregate
 * (min-occurrence struct) joined back — two shuffles total, both on
 * bounded-width rows.
 */
object CdcChunker {

  /** Deterministic gear table: splitmix64 of the byte value — fixed, no
    * RNG state (public-domain mixer; same constants as java.util
    * .SplittableRandom's documented algorithm). */
  private[graft] val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * Content-defined chunk spans of one string: (start, len) with
   * `min <= len <= max` (the final chunk may be shorter). A boundary is
   * cut after position i when the rolling gear hash (which depends only
   * on the trailing <= 64 characters — the shift discards older input)
   * lands on `mask` zeros and the chunk has reached `min`. The hash is
   * NOT reset at boundaries, so boundary positions re-synchronize with
   * content after any local edit.
   */
  private[graft] def chunkSpans(
      text: String, min: Int, max: Int, mask: Long): IndexedSeq[(Int, Int)] = {
    require(min >= 1 && max >= min, s"need 1 <= min <= max, got $min/$max")
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(text.charAt(i) & 0xff)
      val len = i - start + 1
      if ((len >= min && (h & mask) == 0L) || len >= max) {
        out += ((start, len)); start = i + 1
      }
      i += 1
    }
    if (start < n) out += ((start, n - start))
    out.toIndexedSeq
  }

  /** Default knobs sized for document-scale text: ~64-char average chunks
    * (mask = 2^5-1 over the >= 32-char region), capped at 192. Storage
    * systems use the same shape at 4-8 KiB. */
  val DefaultMin = 32
  val DefaultMax = 192
  val DefaultMask: Long = 31L

  /** Chunk span table (doc_id, start, len) — one kernel pass, the fixture
    * export for the oracle. `start` is 0-based (substring at start+1). */
  def chunkTable(
      docs: DataFrame,
      min: Int = DefaultMin, max: Int = DefaultMax,
      mask: Long = DefaultMask): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        chunkSpans(if (t == null) "" else t, min, max, mask)
          .map { case (st, ln) => (id, st, ln) }
      })
      .toDF("doc_id", "start", "len")
  }

  /**
   * Per-document CDC dedup stats from a chunk-span table joined back to
   * the corpus: chunk identity is md5 of the substring (engine-bridge
   * hash); an instance is a DUP when the same content first occurred at a
   * strictly earlier (doc_id, start). Returns (doc_id, n_chunks, n_dup,
   * dup_chars, total_chars) — `dup_chars / total_chars` is the per-doc
   * dedupable fraction, the number a pipeline gates on.
   */
  def dedupStats(docs: DataFrame, spans: DataFrame): DataFrame = {
    val chunks = spans.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("start"), col("len"),
        md5(expr("substring(text, start + 1, len)")).as("h"))
    chunks.join(firstOccurrence(chunks), "h")
      .withColumn("is_dup",
        !(col("doc_id") === col("f_doc") && col("start") === col("f_start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("is_dup"), col("len").cast("long")).otherwise(0L)).as("dup_chars"),
        sum(col("len").cast("long")).as("total_chars"))
  }

  /** The composed operator: chunk, then dedup across the corpus. */
  def cdcDedup(
      docs: DataFrame,
      min: Int = DefaultMin, max: Int = DefaultMax,
      mask: Long = DefaultMask): DataFrame =
    dedupStats(docs, chunkTable(docs, min, max, mask))

  /**
   * The APPLY step: rewrite every document with its duplicate chunks
   * REMOVED (first occurrence corpus-wide survives, later instances drop
   * — the chunk-level C4 rule at content-defined boundaries). Returns
   * (doc_id, n_chunks, n_kept, clean_text) where clean_text concatenates
   * the surviving chunks in position order; a fully-duplicated document
   * comes back empty. Same two-shuffle shape as [[dedupStats]] plus the
   * doc_id reassembly aggregate (state bounded by one document).
   */
  def dedupRewrite(docs: DataFrame, spans: DataFrame): DataFrame = {
    val chunks = spans.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("start"), col("len"),
        expr("substring(text, start + 1, len)").as("chunk"))
      .withColumn("h", md5(col("chunk")))
    chunks.join(firstOccurrence(chunks), "h")
      .withColumn("keep",
        col("doc_id") === col("f_doc") && col("start") === col("f_start"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws("", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN keep THEN struct(start, chunk) END)), s -> s.chunk)"))
          .as("clean_text"))
  }

  /** Chunk rows with content identity: (doc_id, start, len, h). */
  /** Corpus-wide first occurrence of each chunk hash: min (doc_id, start)
    * per `h` — THE precedence rule every CDC variant shares (stats,
    * rewrite, incremental). One definition so a future change to chunk
    * identity or tie order cannot silently break their pinned parity. */
  private def firstOccurrence(chunks: DataFrame): DataFrame =
    chunks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("start"))).as("f"))
      .select(col("h"), col("f.doc_id").as("f_doc"), col("f.start").as("f_start"))

  private def hashedChunks(
      docs: DataFrame, min: Int, max: Int, mask: Long): DataFrame =
    chunkTable(docs, min, max, mask)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("start"), col("len"),
        md5(expr("substring(text, start + 1, len)")).as("h"))

  /** The accumulated chunk-identity index behind [[incrementalStats]]:
    * the DISTINCT content hashes of a processed doc set. A continuous
    * pipeline persists this once and APPENDS each accepted micro-batch's
    * hashes — the index grows with the stream instead of rechunking
    * history. */
  def cdcIndex(
      docs: DataFrame,
      min: Int = DefaultMin, max: Int = DefaultMax,
      mask: Long = DefaultMask): DataFrame =
    hashedChunks(docs, min, max, mask).select("h").distinct()

  /**
   * Incremental CDC dedup for continuous ingestion — the streaming twin
   * of [[cdcDedup]]. New docs chunk ONCE; their hashes probe the
   * accumulated index with a hash join (history is never rechunked), and
   * the within-batch first-occurrence rule handles batch-internal dups.
   * When micro-batches arrive in ascending doc_id order (the produce
   * path's contract), replaying a corpus batch-by-batch yields EXACTLY
   * the batch operator's stats — an index hit means the first occurrence
   * was in an earlier (= lower-id) batch; CdcChunkerSpec pins the parity.
   */
  def incrementalStats(
      newDocs: DataFrame, indexHashes: DataFrame,
      min: Int = DefaultMin, max: Int = DefaultMax,
      mask: Long = DefaultMask): DataFrame = {
    val chunks = hashedChunks(newDocs, min, max, mask)
    val hist = indexHashes.select(col("h"), lit(true).as("in_hist"))
    chunks.join(firstOccurrence(chunks), "h")
      .join(hist, Seq("h"), "left")
      .withColumn("is_dup", coalesce(col("in_hist"), lit(false)) ||
        !(col("doc_id") === col("f_doc") && col("start") === col("f_start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("is_dup"), col("len").cast("long")).otherwise(0L)).as("dup_chars"),
        sum(col("len").cast("long")).as("total_chars"))
  }
}
