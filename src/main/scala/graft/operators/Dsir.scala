package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al., "Data
 * Selection for Language Models via Importance Resampling", NeurIPS 2023):
 * given a RAW corpus and a (much smaller) TARGET corpus exemplifying the
 * distribution you want, estimate hashed n-gram bucket distributions for
 * both, weight every raw document by its log importance ratio
 * Σ_grams ln(p_target(bucket)/p_raw(bucket)), and resample the raw corpus
 * by Gumbel-top-k on those log weights — the standard trick that makes
 * "sample ∝ importance weight, without replacement" a deterministic
 * ORDER BY instead of sequential draws.
 *
 * Determinism / engine-independence: gram→bucket hashing is md5-prefix
 * arithmetic (the same bridge the samplers use, reproducible in any
 * engine); per-bucket log ratios are fixed-pointed to 1e4 LONGs (the
 * [[LangModel]] recipe), so per-doc weights are exact integer sums immune
 * to float summation order; the Gumbel perturbation derives from md5 bits
 * (u = (28-bit prefix + 0.5)/2^28) and is itself fixed-pointed, so the
 * final ranking key is a pure integer — `pipe_dsir_sample`'s DuckDB
 * oracle recomputes the whole pipeline from the parquet text.
 *
 * Scale shape (100 TB): gram extraction is in-row; bucket counts are two
 * hash aggregates bounded by `buckets` (a knob, default 4096 — the paper
 * uses 10^4); the per-bucket log-ratio table is therefore ALWAYS tiny and
 * rides a broadcast join onto the gram stream — scoring shuffles the
 * corpus exactly once, on doc_id, for the weight sum. The Gumbel-top-k
 * select is the bounded-heap `graft_topk` aggregate (O(k) state per
 * partition, k rows per partition shuffled — never a global sort).
 */
object Dsir {

  /** Gram rows (doc_id, gram) WITH multiplicity: word unigrams + space-
    * joined bigrams, built in-row (slice + zip — no positional shuffle). */
  private[graft] def gramRows(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), split(trim(col("text")), " +").as("w"))
    val uni = words.select(col("doc_id"), explode(col("w")).as("gram"))
    val bi = words.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1))).as("bg"))
      .select(col("doc_id"), concat_ws(" ", col("bg.0"), col("bg.1")).as("gram"))
    uni.unionAll(bi)
  }

  /** (doc_id, bucket) rows: md5-prefix hash of the gram into `buckets`
    * buckets — the engine-independent feature hash. */
  private[graft] def bucketRows(docs: DataFrame, buckets: Int): DataFrame =
    gramRows(docs).select(col("doc_id"),
      (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % buckets)
        .as("bucket"))

  /**
   * Per-document log importance weights of `raw` against `target`:
   * (doc_id, n_feats, weight_fp) where weight_fp is the exact LONG
   * Σ_grams round(ln(p_t(b)/p_r(b)) · 1e4) under add-one-smoothed bucket
   * distributions p(b) = (c(b)+1)/(n+buckets). Positive = looks more like
   * the target than like the raw corpus. Documents with zero grams (empty
   * text still yields one empty-string unigram, so: none) are absent.
   */
  /**
   * The per-bucket fixed-point log-ratio table (bucket, lr_fp) — the
   * MODEL of the DSIR method, <= `buckets` rows by construction. A
   * continuous pipeline computes this once over the reference corpora
   * and scores every incoming batch against the frozen table
   * ([[scoreWithRatios]]) — the stream-static shape. Only buckets
   * PRESENT in raw carry a row (a raw doc's grams can't miss the
   * support); scoring coalesces absent buckets to the smoothed floor.
   */
  def ratioTable(
      raw: DataFrame, target: DataFrame, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val rawB = bucketRows(raw, buckets)
    val tgtB = bucketRows(target, buckets)
    val rawCounts = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgtCounts = tgtB.groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = rawB.agg(count(lit(1)).as("nr"))
      .crossJoin(tgtB.agg(count(lit(1)).as("nt")))
    rawCounts.join(tgtCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
            (col("nt") + lit(buckets).cast("double"))) /
          ((col("cr") + lit(1)).cast("double") /
            (col("nr") + lit(buckets).cast("double")))) * 1e4)
          .cast("long").as("lr_fp"),
        // the bucket count is a PROPERTY OF THE TABLE (it fixes the gram
        // hash modulus AND the smoothing denominator) — it rides along so
        // a frozen-table consumer can never silently score under a
        // different modulus
        lit(buckets).as("n_buckets"))
  }

  /** Score any doc set against a (possibly frozen) ratio table: the
    * tiny table broadcasts, so the gram stream never shuffles on its
    * (Zipf-hot) bucket key; docs whose buckets the table never saw
    * contribute 0 (no evidence either way). */
  def scoreWithRatios(
      docs: DataFrame, ratios: DataFrame, buckets: Int = 4096): DataFrame = {
    // a frozen table scored under a different modulus hashes ~ (1 - 1/k)
    // of grams into buckets the table has no rows for and silently skews
    // every weight toward 0 — the table's own n_buckets stamp (present
    // since it was added to ratioTable) makes the mismatch loud instead
    if (ratios.columns.contains("n_buckets"))
      ratios.select("n_buckets").limit(1).collect().headOption.foreach { r =>
        val tb = r.getAs[Number]("n_buckets").intValue()
        require(tb == buckets,
          s"ratio table was built with $tb buckets but scoring was asked " +
            s"for $buckets — the bucket count is a property of the table")
      }
    bucketRows(docs, buckets)
      .join(broadcast(ratios.select("bucket", "lr_fp")), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("lr_fp"), lit(0L))).as("weight_fp"))
  }

  def importanceWeights(
      raw: DataFrame, target: DataFrame, buckets: Int = 4096): DataFrame =
    scoreWithRatios(raw, ratioTable(raw, target, buckets), buckets)

  /**
   * Gumbel-top-k resampling of weighted docs: perturb each integer log
   * weight with a deterministic fixed-point Gumbel draw (inverse-CDF of
   * an md5-derived uniform) and keep the k largest keys — equivalent to
   * sampling k docs without replacement with probability ∝ exp(weight),
   * but expressible as a bounded-heap top-k. Input must carry (doc_id,
   * n_feats, weight_fp); output adds `kept`.
   */
  def resample(weights: DataFrame, k: Int, salt: String = "graft-dsir"): DataFrame =
    resampleWithGumbel(weights, gumbelTable(weights, salt), k)

  /** The per-doc fixed-point Gumbel perturbation (doc_id, gumbel_fp):
    * u = (28-bit md5 prefix + 0.5) / 2^28 in (0,1), gumbel = -ln(-ln u),
    * fixed-pointed to 1e4 LONG. Computed ONCE and exportable as a fixture
    * so an oracle-checked compare never re-evaluates the transcendental
    * (`ln` is the one libm call whose last ulp is not portable; `round` at
    * a half-way boundary would amplify it into an integer flip). */
  def gumbelTable(docs: DataFrame, salt: String = "graft-dsir"): DataFrame = {
    val u = (conv(substring(
        md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 7),
      16, 10).cast("double") + 0.5) / lit(268435456.0)
    docs.select(col("doc_id"),
      round(-log(-log(u)) * 1e4).cast("long").as("gumbel_fp"))
  }

  /** [[resample]] against a precomputed (possibly fixture-read) Gumbel
    * table — the key is the pure integer weight_fp + gumbel_fp, so both
    * engines of an oracle pair rank identical bits. */
  def resampleWithGumbel(weights: DataFrame, gumbel: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // left join + per-row raise_error instead of a silent inner join: a
    // weighted doc missing from the gumbel table (a STALE fixture scored
    // against a newer batch) must fail loudly, not vanish from the
    // selection without even a kept = false row
    val keyed = weights
      .join(gumbel.select("doc_id", "gumbel_fp"), Seq("doc_id"), "left")
      .withColumn("gumbel_fp", coalesce(col("gumbel_fp"),
        raise_error(concat(lit("resampleWithGumbel: doc_id "), col("doc_id"),
          lit(" has no gumbel-table row (stale fixture?)")))))
      .withColumn("key_fp", col("weight_fp") + col("gumbel_fp"))
    val top = TopK.topKPerKey(
        keyed.withColumn("__g", lit(0)), Seq("__g"),
        struct(col("key_fp"), -col("doc_id")), Seq("doc_id"), k)
      .select(col("doc_id"), lit(true).as("kept"))
    keyed.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"), col("weight_fp"),
        coalesce(col("kept"), lit(false)).as("kept"))
  }

  /** The composed select: weigh `raw` against `target`, Gumbel-top-k to
    * `k` docs. Returns every raw doc with its weight and verdict. */
  def select(
      raw: DataFrame, target: DataFrame, k: Int,
      buckets: Int = 4096, salt: String = "graft-dsir"): DataFrame =
    resample(importanceWeights(raw, target, buckets), k, salt)
}
