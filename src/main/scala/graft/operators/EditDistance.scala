package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance (Levenshtein) near-dup over short document keys — the
 * "fuzzy title/URL/prefix dedup" a training-data pipeline runs where
 * shingle overlap is too coarse (one-character typos, OCR noise, tracking
 * suffixes).
 *
 * Candidate generation is the segment-pigeonhole scheme of PassJoin (Li,
 * Deng, Wang, Feng: "PASS-JOIN: A Partition-based Method for Similarity
 * Joins", PVLDB 5(3), 2011): partition every key into `maxDist + 1`
 * contiguous segments — two keys within edit distance d must agree on at
 * least one segment, because d edits can touch at most d of the d+1
 * segments (pigeonhole), and an untouched segment survives VERBATIM as a
 * substring of the other key, shifted by at most the net length drift
 * (≤ d) of the edits before it. So:
 *
 *   - index side: the d+1 canonical segments of every key,
 *   - probe side: every substring of every key whose (segment index,
 *     length, start) could equal a partner segment under ≤ d edits —
 *     for each possible partner length in L±d, the segment-i (start,
 *     length) that partner would have, with the start further shifted by
 *     ±d (the edit drift bound),
 *   - candidates: a hash join on (segment index, bytes) — id pairs only,
 *   - verify: exact `levenshtein(keyA, keyB, maxDist)` (the THRESHOLDED
 *     builtin: O(d·n) banded DP, not O(n²)) on the candidate pairs.
 *
 * Scale shape: probe fan-out is ≤ (d+1)·(2d+1)·(4d+1) short rows per
 * document — LINEAR in the corpus, never quadratic; the join carries
 * (segment bytes, id) only; verification touches candidate pairs only.
 * The equivalent brute force is a corpus × corpus cross join — the spec
 * pins exact parity against it on small data and the absence of any
 * cartesian/nested-loop node in this plan.
 */
object EditDistance {

  /** Canonical segment start of segment `i` of a length-`len` key split
    * into `n` even segments (floor partitioning, the PassJoin layout). */
  private def segStart(i: Column, len: Column, n: Int): Column =
    floor(i * len / n).cast("int")

  /**
   * Document pairs whose `prefixLen`-char text prefixes are within edit
   * distance `maxDist`. Output: (doc_id_a < doc_id_b, dist), one row per
   * pair, dist exact.
   */
  def fuzzyPrefixPairs(
      docs: DataFrame, prefixLen: Int = 192, maxDist: Int = 4): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(prefixLen > 4 * (maxDist + 1),
      s"prefixLen=$prefixLen too short for maxDist=$maxDist segments")
    val d = maxDist
    val n = d + 1
    val keys = docs.select(
      col("doc_id"), substring(col("text"), 1, prefixLen).as("key"))
    // fan the ~(d+1)(2d+1)² per-doc probe explosion over the cluster: the
    // keys projection is narrow (id + prefix), so this shuffle is cheap,
    // and without it a compact input (one parquet split) would run the
    // entire generate chain on one task
    val withLen = keys.repartition(col("doc_id")).withColumn("len", length(col("key")))

    // Index side: the n canonical segments of every key.
    val segs = withLen
      .select(col("doc_id"), col("key"), col("len"),
        explode(sequence(lit(0), lit(n - 1))).as("i"))
      .withColumn("s", segStart(col("i"), col("len"), n))
      .withColumn("e", segStart(col("i") + 1, col("len"), n))
      .filter(col("e") > col("s"))
      .select(col("doc_id"), col("i"),
        expr("substring(key, s + 1, e - s)").as("piece"))

    // Probe side: substrings that could equal a partner's segment i under
    // ≤ d edits. Partner length ∈ [len-d, len+d] fixes the possible
    // (start, length) of its segment i; the matching substring here sits
    // within ±d of that start (edit drift). The triple explode is ≤
    // (d+1)(2d+1)(2d+1) rows/doc BEFORE dedup — linear in the corpus.
    val probes = withLen
      .select(col("doc_id"), col("key"), col("len"),
        explode(sequence(lit(0), lit(n - 1))).as("i"))
      .select(col("doc_id"), col("key"), col("len"), col("i"),
        explode(sequence(lit(-d), lit(d))).as("dl"))
      .withColumn("plen", col("len") + col("dl"))
      .filter(col("plen") >= n)
      .withColumn("ps", segStart(col("i"), col("plen"), n))
      .withColumn("pe", segStart(col("i") + 1, col("plen"), n))
      .filter(col("pe") > col("ps"))
      .select(col("doc_id"), col("key"), col("len"), col("i"),
        col("ps"), (col("pe") - col("ps")).as("plenSeg"),
        explode(sequence(lit(-d), lit(d))).as("ds"))
      .withColumn("s", col("ps") + col("ds"))
      .filter(col("s") >= 0 && col("s") + col("plenSeg") <= col("len"))
      .select(col("doc_id"), col("i"),
        expr("substring(key, s + 1, plenSeg)").as("piece"))
      .dropDuplicates("doc_id", "i", "piece")

    // Candidates: hash join on (segment index, bytes) — id pairs only.
    val cand = segs.alias("a")
      .join(probes.alias("b"),
        col("a.i") === col("b.i") && col("a.piece") === col("b.piece") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_b"))

    // Short-key bucket: keys with len < d+1 have empty canonical segments
    // (dropped by the e > s filter) and no probe rows toward partners
    // shorter than d+1, so a short×short pair never meets in the main join.
    // But two strings of length ≤ d are ALWAYS within edit distance d
    // (replace the overlap, insert the rest), so the bucket's candidate set
    // is simply all its pairs. Joined on a constant bucket key (pmod keeps
    // it non-foldable so Catalyst can't rewrite the equi-join into a
    // nested-loop) — quadratic only in the bucket, and a corpus where this
    // bucket is large has a quadratic OUTPUT anyway: every pair qualifies.
    val sk = withLen.filter(col("len") < n)
      .select(col("doc_id"), pmod(col("doc_id"), lit(1L)).as("k"))
    val shortCand = sk.select(col("doc_id").as("doc_id_a"), col("k"))
      .join(sk.select(col("doc_id").as("doc_id_b"), col("k")), "k")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"))

    // Verify: exact thresholded Levenshtein on candidates only. The
    // dropDuplicates sits after the union because a short key CAN surface
    // in the main join too (its probes target longer partners), so the two
    // paths may emit the same pair.
    cand.unionAll(shortCand)
      .dropDuplicates("doc_id_a", "doc_id_b")
      .join(keys.select(col("doc_id").as("doc_id_a"), col("key").as("ka")), "doc_id_a")
      .join(keys.select(col("doc_id").as("doc_id_b"), col("key").as("kb")), "doc_id_b")
      .withColumn("dist", levenshtein(col("ka"), col("kb"), d).cast("long"))
      // the thresholded builtin returns -1 when the bound is exceeded
      .filter(col("dist") >= 0 && col("dist") <= d)
      .select(col("doc_id_a"), col("doc_id_b"), col("dist"))
  }

  /** The O(n²) brute-force twin (cross join + full Levenshtein) — oracle
    * and spec duty ONLY; never the scale path. */
  private[graft] def fuzzyPrefixPairsBrute(
      docs: DataFrame, prefixLen: Int, maxDist: Int): DataFrame = {
    val keys = docs.select(
      col("doc_id"), substring(col("text"), 1, prefixLen).as("key"))
    keys.alias("a").crossJoin(keys.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist",
        levenshtein(col("a.key"), col("b.key"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
        col("dist"))
  }
}
