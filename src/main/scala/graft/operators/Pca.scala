package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column — the standard dimensionality
 * reduction run before ANN indexing / clustering at corpus scale (cut
 * 64-dim vectors to the 8 directions that carry the variance, then build
 * the index on those). Same train/score split as [[QualityModel]]:
 * sufficient statistics reduce the corpus to a d×d Gram table in ONE
 * distributed pass, the d×d eigensolve happens on the driver (Jacobi —
 * d is 64, not a distributed problem), and projection is a stateless
 * per-row expression.
 *
 * Exactness / engine-independence: vectors quantize to fixed-point LONGs
 * (trunc at 1e6 — the [[graft.expressions.Int8Stats]] bridge discipline:
 * float widens to double exactly, one IEEE multiply, truncate toward
 * zero — identical in any engine); the Gram/mean statistics are exact
 * integer sums; eigenvectors export as 1e9-scaled LONGs, so the
 * projection is an integer dot product both engines reproduce
 * bit-for-bit (`sim_pca_project`'s DuckDB oracle recomputes it from the
 * embeddings table and the exported fixture).
 *
 * Scale shape (100 TB): the statistics pass is mapPartitions with
 * O(d^2) state per task emitting d(d+1)/2 + d + 1 rows per PARTITION
 * (never per row), merged by a d^2-bounded DECIMAL(38,0) aggregate —
 * partition-local partials stay in LONG, safe below ~9e6 unit-norm
 * vectors per partition at the 1e6 scale (9e18 / (1e12 per product);
 * split partitions before that). Projection is a literal-coefficient
 * codegen expression: no join, no shuffle, one scan.
 */
object Pca {

  /** Fixed-point scale for quantized vector entries. */
  private[graft] val Q = 1000000L

  /** Eigenvector export scale (1e9). */
  private[graft] val WScale = 1000000000L

  /** (id, qv) with qv_i = trunc(double(v_i) * 1e6) — the portable
    * quantization both engines compute identically. */
  private[graft] def quantized(emb: DataFrame): DataFrame =
    emb.select(col("id"),
      expr(s"transform(v, x -> CAST(CAST(x AS DOUBLE) * ${Q}D AS BIGINT))")
        .as("qv"))

  /**
   * Exact sufficient statistics of the quantized vectors as rows
   * (i, j, s): j >= 0 → s = Σ qv_i·qv_j (upper triangle), j = -1 →
   * s = Σ qv_i (the mean numerators), i = j = -1 → s = n. DECIMAL(38,0)
   * sums of per-partition LONG partials: order-independent, mergeable.
   */
  private[graft] def stats(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val partials = quantized(emb).select(col("qv")).as[Seq[Long]]
      .mapPartitions { it =>
        var d = -1
        var n = 0L
        var sums: Array[Long] = null
        var prods: Array[Long] = null
        it.foreach { v =>
          if (d < 0) {
            d = v.length
            sums = new Array[Long](d)
            prods = new Array[Long](d * (d + 1) / 2)
          }
          require(v.length == d, s"ragged embedding: ${v.length} vs $d")
          n += 1
          val a = v.toArray
          var i = 0
          var t = 0
          while (i < d) {
            sums(i) += a(i)
            var j = i
            while (j < d) { prods(t) += a(i) * a(j); t += 1; j += 1 }
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else {
          val rows = Iterator.single((-1, -1, n)) ++
            Iterator.tabulate(d)(i => (i, -1, sums(i))) ++ {
              var t = -1
              for (i <- Iterator.range(0, d); j <- Iterator.range(i, d))
                yield { t += 1; (i, j, prods(t)) }
            }
          rows
        }
      }
      .toDF("i", "j", "s")
    partials.groupBy("i", "j")
      .agg(sum(col("s").cast("decimal(38,0)")).as("s"))
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as COLUMNS), unsorted. Deterministic —
    * fixed sweep order, fixed convergence rule. */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off2: Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += 2 * a(p)(q) * a(p)(q)
      s
    }
    val norm2 = {
      var s = off2
      for (p <- 0 until d) s += a(p)(p) * a(p)(p)
      math.max(s, java.lang.Double.MIN_NORMAL)
    }
    var sweep = 0
    while (sweep < 64 && off2 > 1e-24 * norm2) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 0) {
          val phi = 0.5 * math.atan2(2 * apq, a(q)(q) - a(p)(p))
          val c = math.cos(phi)
          val sn = math.sin(phi)
          val (app, aqq) = (a(p)(p), a(q)(q))
          a(p)(p) = c * c * app - 2 * sn * c * apq + sn * sn * aqq
          a(q)(q) = sn * sn * app + 2 * sn * c * apq + c * c * aqq
          a(p)(q) = 0.0
          a(q)(p) = 0.0
          for (k <- 0 until d if k != p && k != q) {
            val (akp, akq) = (a(k)(p), a(k)(q))
            a(k)(p) = c * akp - sn * akq
            a(p)(k) = a(k)(p)
            a(k)(q) = sn * akp + c * akq
            a(q)(k) = a(k)(q)
          }
          for (k <- 0 until d) {
            val (vkp, vkq) = (v(k)(p), v(k)(q))
            v(k)(p) = c * vkp - sn * vkq
            v(k)(q) = sn * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fitted model: 1e9-scaled eigenvector rows (component-major) and the
    * per-component variance share in ppm (descending). */
  final case class Model(wFp: Array[Array[Long]], varSharePpm: Array[Long])

  /**
   * Fit the top-`r` principal components of the MEAN-CENTERED quantized
   * vectors. Covariance (up to the positive scalar 1/n^2, which moves no
   * eigenvector) is n·P − S·Sᵀ computed exactly in BigDecimal from the
   * statistics rows. Sign rule: each eigenvector's largest-|entry|
   * coordinate (first index on ties) is made positive — a deterministic
   * orientation, since eigenvectors are only defined up to sign.
   */
  def fit(emb: DataFrame, r: Int = 8): Model = {
    val rows = stats(emb).collect()
    val byKey = rows.map(row =>
      (row.getInt(0), row.getInt(1)) -> row.getDecimal(2)).toMap
    val n = byKey((-1, -1)).longValueExact()
    require(n >= 2, s"need >= 2 vectors to fit, got $n")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    require(r >= 1 && r <= d, s"need 1 <= r <= $d, got $r")
    val sVec = Array.tabulate(d)(i => BigDecimal(byKey((i, -1))))
    val nBd = BigDecimal(n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val p = BigDecimal(byKey(if (i <= j) (i, j) else (j, i)))
      // scale down for conditioning only — eigenvectors are invariant
      ((nBd * p - sVec(i) * sVec(j)) / (nBd * nBd * Q * Q)).toDouble
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => (-vals(i), i)).take(r)
    val wFp = order.map { c =>
      val col0 = Array.tabulate(d)(k => vecs(k)(c))
      val pivot = (0 until d).maxBy(k => (math.abs(col0(k)), -k))
      val sgn = if (col0(pivot) < 0) -1.0 else 1.0
      col0.map(x => math.round(x * sgn * WScale))
    }.toArray
    val tot = vals.map(x => math.max(x, 0.0)).sum
    val share = order.map(c =>
      if (tot <= 0) 0L else math.round(math.max(vals(c), 0.0) / tot * 1e6))
    Model(wFp, share.toArray)
  }

  /** Persisted-model format version — the [[LangModel.FormatVersion]]
    * contract: stamped into `meta/`, REQUIRED on read, so a stale layout
    * or a rank/dim/scale drift fails descriptively instead of projecting
    * silently against incompatible coefficients. v2 = version-stamped
    * meta. */
  private[graft] val FormatVersion = 2L

  /**
   * Persist a fitted model (fit once, project many — the [[AnnIndex]] /
   * [[LangModel]] amortization split): `weights/` one row per (comp, i)
   * eigenvector entry plus `varshare/`, then a 1-row `meta/` LAST as the
   * commit marker carrying (format_version, r, d, wscale) — the
   * parameters a reader must agree on.
   */
  def writeModel(emb: DataFrame, path: String, r: Int = 8): Model = {
    val s = emb.sparkSession
    import s.implicits._
    val model = fit(emb, r)
    modelTable(emb, model).write.mode("overwrite").parquet(s"$path/weights")
    model.varSharePpm.zipWithIndex.map { case (v, c) => (c, v) }.toSeq
      .toDF("comp", "share_ppm")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/varshare")
    Seq((FormatVersion, model.wFp.length, model.wFp.head.length, WScale))
      .toDF("format_version", "r", "d", "wscale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    model
  }

  /** Read + validate a persisted model: meta commit marker present,
    * format stamp current, coefficient scale unchanged. */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.columns.contains("format_version"),
      s"PCA model at $path has no format_version stamp " +
        s"(pre-v$FormatVersion layout) — refit with writeModel")
    val m = meta.head()
    val ver = m.getAs[Long]("format_version")
    require(ver == FormatVersion,
      s"PCA model at $path is format v$ver but this build reads " +
        s"v$FormatVersion — refit before projecting")
    val ws = m.getAs[Long]("wscale")
    require(ws == WScale,
      s"PCA model at $path used coefficient scale $ws; this build uses " +
        s"$WScale — refit before projecting")
    val r = m.getAs[Int]("r")
    val d = m.getAs[Int]("d")
    val rows = spark.read.parquet(s"$path/weights").collect()
      .map(x => (x.getAs[Int]("comp"), x.getAs[Int]("i"), x.getAs[Long]("w")))
    require(rows.length == r * d,
      s"PCA model at $path has ${rows.length} weight rows, meta says ${r * d}")
    val wFp = Array.ofDim[Long](r, d)
    rows.foreach { case (c, i, w) => wFp(c)(i) = w }
    val share = spark.read.parquet(s"$path/varshare").collect()
      .sortBy(_.getAs[Int]("comp")).map(_.getAs[Long]("share_ppm"))
    Model(wFp, share)
  }

  /** Project against a persisted model at `path`. */
  def projectAgainst(emb: DataFrame, path: String): DataFrame =
    project(emb, readModel(emb.sparkSession, path).wFp)

  /** The fixture shape: one row per (comp, i) eigenvector entry. */
  def modelTable(emb: DataFrame, model: Model): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    model.wFp.zipWithIndex.flatMap { case (row, c) =>
      row.zipWithIndex.map { case (w, i) => (c, i, w) }
    }.toSeq.toDF("comp", "i", "w")
  }

  /**
   * Project onto the fitted components: (vec_id, p0..p{r-1}) where
   * p_c = Σ_i qv_i · wFp_c_i — exact LONG (|p| <= d·1e6·1e9 ≈ 6e16).
   * The coefficients are LITERALS in the expression: one codegen'd scan,
   * no join, no shuffle — the plan a 100 TB projection pass wants.
   */
  def project(emb: DataFrame, wFp: Array[Array[Long]]): DataFrame = {
    val cols: Seq[Column] = wFp.zipWithIndex.map { case (row, c) =>
      row.zipWithIndex.map { case (w, i) => col("qv")(i) * lit(w) }
        .reduce(_ + _).as(s"p$c")
    }.toSeq
    quantized(emb).select(col("id").as("vec_id") +: cols: _*)
  }

  /**
   * Residual-based outlier scoring: resid = 1 − Σ_c p_c² / (|q|²·|w_c|²),
   * the fraction of a vector's energy OUTSIDE the fitted subspace — the
   * classic PCA anomaly detector (a vector the principal components
   * cannot explain is structurally unlike the corpus). Returns the top-k
   * (vec_id, resid_milli), worst first, id tie-break.
   *
   * Determinism: na = Σqv² and nw_c = Σw_c² are exact LONGs (a unit
   * eigenvector at the 1e9 scale has Σw² ≈ 1e18 < 2^63); the residual is
   * a FIXED-ORDER chain of IEEE ops (left-associated term sum, each term
   * (p·p)/(na·nw)) written identically in the DuckDB oracle. int→double
   * conversions are correctly rounded in both engines even where p
   * exceeds 2^53.
   */
  def outliers(emb: DataFrame, model: Model, k: Int = 20): DataFrame = {
    val dims = model.wFp.length
    val nw = model.wFp.map(_.foldLeft(0L)((a, w) => a + w * w))
    val pCols = model.wFp.zipWithIndex.map { case (row, c) =>
      row.zipWithIndex.map { case (w, i) => col("qv")(i) * lit(w) }
        .reduce(_ + _).as(s"p$c")
    }
    val base = quantized(emb).select(
      col("id").as("vec_id") +:
        expr("aggregate(qv, 0L, (a, x) -> a + x * x)").as("na") +:
        pCols.toSeq: _*)
    val frac = (0 until dims).map { c =>
      (col(s"p$c").cast("double") * col(s"p$c").cast("double")) /
        (col("na").cast("double") * lit(nw(c).toDouble))
    }.reduce(_ + _)
    base
      .withColumn("resid_milli",
        floor(lit(1000.0) * (lit(1.0) - frac)).cast("long"))
      .select("vec_id", "resid_milli")
      .orderBy(col("resid_milli").desc, col("vec_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[outliers]]: recomputes quantization, na, the 8
    * projections, the exact nw_c sums, and the identically-ordered
    * residual chain from the embeddings table + fixture. */
  def outliersOracleSql(fixturePath: String, k: Int): String = {
    val r = 8
    val pivs = (0 until r).map(c =>
      s"MAX(CASE WHEN comp = $c THEN p END) AS p$c").mkString(",\n    ")
    val nws = (0 until r).map(c =>
      s"(SELECT nw FROM nw WHERE comp = $c) AS nw$c").mkString(",\n    ")
    val terms = (0 until r).map(c =>
      s"((CAST(p$c AS DOUBLE) * CAST(p$c AS DOUBLE)) / (CAST(na AS DOUBLE) * CAST(nw$c AS DOUBLE)))")
      .mkString("\n    + ")
    s"""WITH w AS MATERIALIZED (SELECT * FROM read_parquet('$fixturePath/*.parquet')),
       |q AS MATERIALIZED (
       |  SELECT vec_id,
       |    [CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
       |     FOR x IN embedding] AS qv
       |  FROM embeddings
       |), nw AS (SELECT comp, CAST(SUM(w.w * w.w) AS BIGINT) AS nw FROM w GROUP BY 1),
       |na AS (
       |  SELECT vec_id, CAST(list_sum([qv[i] * qv[i]
       |    FOR i IN generate_series(1, len(qv))]) AS BIGINT) AS na
       |  FROM q
       |), proj AS (
       |  SELECT q.vec_id, w.comp,
       |    CAST(SUM(qv[i + 1] * w.w) AS BIGINT) AS p
       |  FROM q, w GROUP BY 1, 2
       |), piv AS (
       |  SELECT vec_id, $pivs
       |  FROM proj GROUP BY vec_id
       |)
       |SELECT piv.vec_id,
       |  CAST(FLOOR(1000 * (1 - ($terms))) AS BIGINT) AS resid_milli
       |FROM piv JOIN na ON na.vec_id = piv.vec_id,
       |  (SELECT $nws) x
       |ORDER BY resid_milli DESC, piv.vec_id
       |LIMIT $k""".stripMargin
  }

  /** Offset/scale for projected-space L2: shift projections nonnegative
    * (|p| <= 6.4e16 < the 7e16 offset), then drop 9 low digits so an
    * 8-dim squared distance stays inside LONG. Floor division on
    * NONNEGATIVE values is plain truncation — the offset exists exactly
    * because floor (DuckDB `//`) and truncate-toward-zero (JVM `div`)
    * disagree on negatives. A common offset shifts every coordinate
    * equally, so distances are unchanged. */
  private[graft] val L2Off = 70000000000000000L
  private[graft] val L2Scl = 1000000000L

  /**
   * Exact top-k nearest neighbors in the PROJECTED space by integer
   * squared L2 — the "reduce with PCA, then search the 8-dim space"
   * composition, with ties broken by neighbor id. Inputs are
   * [[project]]-shaped (vec_id, p0..); returns (query_id, neighbor_id,
   * dist2, rank). All-integer scoring + the bounded-heap rerank (at most
   * k rows per query per partition cross the shuffle), so the DuckDB
   * oracle recomputes the whole ranking exactly.
   */
  def knnProjected(
      proj: DataFrame, probes: DataFrame, k: Int, dims: Int = 8): DataFrame = {
    def scaled(df: DataFrame, prefix: String, idName: String) =
      df.select(col("vec_id").as(idName) +: (0 until dims).map(i =>
        expr(s"(p$i + ${L2Off}L) div ${L2Scl}L").as(s"$prefix$i")): _*)
    val dist2 = (0 until dims).map(i =>
      (col(s"q$i") - col(s"n$i")) * (col(s"q$i") - col(s"n$i")))
      .reduce(_ + _)
    val scored = scaled(probes, "q", "query_id")
      .join(scaled(proj, "n", "neighbor_id"),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dist2.as("dist2"))
    TopK.topKPerKey(scored, Seq("query_id"),
        struct(-col("dist2"), -col("neighbor_id")), Seq("neighbor_id", "dist2"), k)
      .select(col("query_id"), col("neighbor_id"), col("dist2"),
        col("rn").as("rank"))
  }
}
