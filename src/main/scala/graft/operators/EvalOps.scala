package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Evaluation / audit statistics for corpus and model quality — the readouts
 * a pipeline runs before trusting a filter model, a clustering, or a new
 * corpus snapshot. Every operator follows the engine's exactness
 * discipline: integer or fixed-point accumulation (order-independent,
 * mergeable), with floats confined to scalar IEEE operations on
 * exact-integer operands so results are deterministic across engines,
 * partitionings, and cluster sizes.
 *
 * Scale shapes (100 TB): every statistic collapses the corpus in ONE
 * mergeable hash aggregate before any window/join; windows run over
 * value-grids (distinct scores, distinct lengths, |sources|, |labels|·dim),
 * never over corpus rows.
 */
object EvalOps {

  /**
   * Exact ROC-AUC by Mann-Whitney rank-sum: one row
   * (n_pos, n_neg, auc_ppm, gini_ppm). `scored` needs an integer score
   * column and a boolean label column. Ties take the average-rank
   * trapezoid term, carried doubled so the scan stays integer.
   */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored.groupBy(scoreCol).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n1"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n0"))
    val w = Window.orderBy(scoreCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum0", coalesce(sum("n0").over(w), lit(0L)))
      // the doubled rank-sum is ~2·n_pos·n_neg and overflows int64 past
      // ~4.3e9 labeled docs; widen to DECIMAL(38,0) so the accumulation
      // stays exact at any corpus size (DuckDB's SUM(BIGINT) widens to
      // int128 natively, so the oracle already agrees; both sides then
      // cast the exact integer to double for the one ppm division)
      .agg(sum(col("n1").cast("decimal(38,0)") * col("cum0") * 2 +
          col("n1").cast("decimal(38,0)") * col("n0")).as("u2"),
        sum("n1").as("n_pos"), sum("n0").as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        // single-class input has no ranking to score: 0/0 would float to
        // NaN and floor to 0 — indistinguishable from a perfectly
        // anti-correlated classifier — so the degenerate case surfaces as
        // NULL instead (gini below null-propagates with it)
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("long"))
          .otherwise(floor(col("u2").cast("double") * 1000000.0 /
            (col("n_pos").cast("double") * col("n_neg") * 2.0)))
          .as("auc_ppm"))
      .withColumn("gini_ppm", col("auc_ppm") * 2 - 1000000L)
  }

  /**
   * Reliability table: `bins` equal-width bins over the observed integer
   * score range; per bin count, label positives, predicted positives,
   * floored mean score, positive-rate ppm. Signed means go through the
   * floor-on-double chain (integer `div` truncation differs across
   * engines on negatives; doubles don't).
   */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
      predictedCol: String, bins: Int = 10): DataFrame = {
    val rng = scored.agg(min(scoreCol).as("lo"), max(scoreCol).as("hi"))
    // (score - lo) * bins and the per-bin score sum both run in
    // DECIMAL(38,0): a wide integer score range (nanosecond-like
    // magnitudes) or a giant bin would otherwise wrap int64 silently;
    // `div` (IntegralDivide) returns BIGINT so the bin id and the floored
    // mean keep their schema
    scored.crossJoin(broadcast(rng))
      .withColumn("bin",
        least(expr(s"CAST(($scoreCol - lo) AS DECIMAL(38,0)) * $bins " +
            "div (hi - lo + 1)"),
          lit(bins - 1L)))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(predictedCol), 1L).otherwise(0L)).as("n_pred"),
        floor(sum(col(scoreCol).cast("decimal(38,0)")).cast("double") /
          count(lit(1))).as("mean_score_fp"))
      .withColumn("pos_rate_ppm", expr("n_pos * 1000000 div n"))
      .orderBy("bin")
  }

  /**
   * Exact two-sample Kolmogorov-Smirnov over an integer value column:
   * one row (n_a, n_b, d_num, ks_ppm, reject_05). `a` and `b` are
   * single-column frames of the value. D is carried as the exact integer
   * numerator max|cum_a·n_b − cum_b·n_a|; the ECDF prefix scan runs over
   * the distinct-value grid only. The α=0.05 verdict is the Smirnov
   * asymptotic threshold (c(0.05) = 1.358).
   */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame) = df
      .select(col(valueCol).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    ksDriftCounts(counts(a), counts(b))
  }

  /**
   * Histogram-input variant of [[ksDrift]]: `a`/`b` are (v: long, c: long)
   * count tables (mergeable — exactly what an incremental monitor
   * accumulates). Same exact integer statistic.
   */
  def ksDriftCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val byv = a.select(col("v"), col("c").as("ca"), lit(0L).as("cb"))
      .unionByName(b.select(col("v"), lit(0L).as("ca"), col("c").as("cb")))
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val w = Window.orderBy("v")
    val tot = byv.agg(sum("ca").as("na"), sum("cb").as("nb"))
    byv
      .select(col("v"), sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
      .crossJoin(broadcast(tot))
      // the cross products reach n_a*n_b ~ (histogram row counts)² — at
      // the monitor's unbounded stream-so-far accumulation that passes
      // int64 around 4.3e9 rows/side, so the comparison runs in
      // DECIMAL(38,0) (the same widening rocAuc got); the OUTPUT d_num
      // casts back to BIGINT for the Arrow-faithful schema — by then the
      // max is already exact
      .agg(max(abs(col("cuma").cast("decimal(38,0)") * col("nb") -
          col("cumb").cast("decimal(38,0)") * col("na"))).as("d_dec"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("n_a"), col("n_b"), col("d_dec").cast("long").as("d_num"),
        floor(col("d_dec").cast("double") * 1000000.0 /
          (col("n_a").cast("double") * col("n_b"))).as("ks_ppm"),
        (col("d_dec").cast("double") / (col("n_a").cast("double") * col("n_b")) >
          lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double") /
            (col("n_a").cast("double") * col("n_b")))).as("reject_05"))
  }

  /**
   * Simplified (centroid) silhouette per label over (id, label,
   * v: array&lt;double&gt;): centroids in 1e6 fixed-point from one
   * aggregate, broadcast; per-vector a²/b² as exact BIGINT squared
   * distances; s = (√b²−√a²)/max(√a²,√b²) floored to ppm; per-label
   * integer means. No pairwise term — linear in rows with an inherent
   * |labels| factor.
   */
  def silhouette(vecs: DataFrame, idCol: String = "vec_id",
      labelCol: String = "label", vecCol: String = "v"): DataFrame = {
    val e = vecs
      .select(col(idCol), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), col("label"), col("pos"),
        floor(col("x") * 1000000).cast("long").as("xfp"))
    val cent = e.groupBy(col("label").as("clabel"), col("pos"))
      .agg(floor(sum("xfp").cast("double") / count(lit(1))).as("cfp"))
    val d2 = e.join(broadcast(cent), Seq("pos"))
      .groupBy(idCol, "label", "clabel")
      .agg(sum((col("xfp") - col("cfp")) * (col("xfp") - col("cfp"))).as("d2"))
    val ab = d2.groupBy(idCol, "label").agg(
      min(when(col("clabel") === col("label"), col("d2"))).as("a2"),
      min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
    ab.select(col(idCol), col("label"),
        when(col("a2") === 0 && col("b2") === 0, lit(0L))
          .otherwise(floor(lit(1000000.0) *
            (sqrt(col("b2").cast("double")) - sqrt(col("a2").cast("double"))) /
            greatest(sqrt(col("a2").cast("double")), sqrt(col("b2").cast("double")))))
          .as("s_fp"))
      .groupBy("label").agg(count(lit(1)).as("n"),
        floor(sum("s_fp").cast("double") / count(lit(1))).as("mean_sil_ppm"))
      .orderBy("label")
  }

  /**
   * Exact integer waterfilling of a token budget across sources with
   * supply caps. Input: (source, avail) — exact integer supplies; weights
   * are temperature-0.5 (floor-sqrt of supply, one IEEE sqrt on an exact
   * integer); budget = avail · budgetNum / budgetDen (floor). Sources
   * sorted ascending by supply/weight saturate as a prefix (removing a
   * source whose ratio exceeds the running quotient only lowers the
   * quotient, so the integer test avail·W_rem ≤ B_rem·w is monotone);
   * unsaturated sources split the residual ∝ weight by floor division.
   * Output: (source, avail, weight, saturated, alloc).
   */
  def waterfill(avail: DataFrame, budgetNum: Long = 1L,
      budgetDen: Long = 2L): DataFrame = {
    val wts = avail.withColumn("weight",
      floor(sqrt(col("avail").cast("double"))))
    val tot = wts.agg(sum("avail").as("tot_avail"), sum("weight").as("tot_w"))
    val before = Window
      .orderBy(col("avail").cast("double") / col("weight"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // token-scale products (avail·w_from ~ 1e13 · 5e6 at a 100 TB corpus)
    // pass int64 — the comparisons and the alloc multiply run in
    // DECIMAL(38,0), exactly like rocAuc's rank-sum; `div` (IntegralDivide)
    // accepts decimal operands and returns BIGINT, so the output schema is
    // unchanged
    val rows = wts.crossJoin(broadcast(tot))
      .withColumn("b", expr(
        s"CAST(tot_avail AS DECIMAL(38,0)) * $budgetNum div $budgetDen"))
      .withColumn("prefix_avail",
        coalesce(sum("avail").over(before), lit(0L)))
      .withColumn("w_from",
        col("tot_w") - coalesce(sum("weight").over(before), lit(0L)))
      .withColumn("saturated",
        col("avail").cast("decimal(38,0)") * col("w_from") <=
          (col("b") - col("prefix_avail")).cast("decimal(38,0)") * col("weight"))
    val fin = rows.agg(
      sum(when(col("saturated"), col("avail")).otherwise(0L)).as("sat_avail"),
      sum(when(col("saturated"), 0L).otherwise(col("weight"))).as("unsat_w"))
    rows.crossJoin(broadcast(fin))
      .withColumn("alloc",
        when(col("saturated"), col("avail"))
          .otherwise(expr(
            "CAST(b - sat_avail AS DECIMAL(38,0)) * weight div greatest(unsat_w, 1)")))
      .select("source", "avail", "weight", "saturated", "alloc")
  }

  /**
   * Contrastive (anchor, positive, negative) triples: anchor/positive are
   * deterministic word chunks of the same doc; the negative is the next
   * doc's positive on a salted-md5 ring partitioned into `bucketChars`
   * hex-prefix buckets (16^bucketChars rings — the scale knob; no global
   * sort). Singleton buckets drop (a doc can't be its own negative).
   */
  def contrastivePairs(docs: DataFrame, bucketChars: Int = 1): DataFrame = {
    val ch = docs
      .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
      .filter(size(col("w")) >= 16)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, 8)).as("anchor"),
        concat_ws(" ", slice(col("w"), 9, 8)).as("positive"),
        md5(concat(lit("graft-neg:"), col("doc_id"))).as("h"))
      .withColumn("bucket", substring(col("h"), 1, bucketChars))
    val ring = ch
      .withColumn("rn",
        row_number().over(Window.partitionBy("bucket").orderBy("h")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("bucket")))
    val neg = ring.select(col("bucket").as("nbucket"), col("rn").as("nrn"),
      col("doc_id").as("neg_doc_id"), col("positive").as("negative"))
    ring.filter(col("cnt") > 1)
      .withColumn("want_rn", col("rn") % col("cnt") + 1)
      .join(neg, col("bucket") === col("nbucket") && col("want_rn") === col("nrn"))
      .select(col("doc_id"), col("neg_doc_id"),
        col("anchor"), col("positive"), col("negative"))
  }

  /**
   * Padding-waste audit: per-doc token counts in power-of-two length
   * buckets, pad-to-bucket-bound vs pad-to-global-max. Docs past the top
   * bucket truncate (pad 0). One scan + a broadcast max; |buckets| rows.
   */
  def paddingWaste(docs: DataFrame): DataFrame = {
    val t = docs
      .select(size(split(trim(col("text")), " +")).cast("long").as("n"))
    val b = t.withColumn("bucket_ub",
      when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
        .when(col("n") <= 64, 64L).when(col("n") <= 128, 128L)
        .when(col("n") <= 256, 256L).when(col("n") <= 512, 512L)
        .when(col("n") <= 1024, 1024L).otherwise(2048L))
    val gmax = t.agg(max("n").as("gmax"))
    b.crossJoin(broadcast(gmax))
      .groupBy("bucket_ub").agg(
        count(lit(1)).as("docs"),
        sum("n").as("tokens"),
        sum(greatest(col("bucket_ub") - col("n"), lit(0L))).as("bucket_pad"),
        sum(col("gmax") - col("n")).as("global_pad"))
      .withColumn("bucket_waste_ppm",
        expr("bucket_pad * 1000000 div (docs * bucket_ub)"))
      .orderBy("bucket_ub")
  }
}
