package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function surface (§2.8 north star: string/date/math) and the
  * remaining grouping-set shapes (§2.4 cube), plus approx distinct
  * (sketch-based — engine-specific, so spec-checked not oracle-checked). */
object ScalarQueries {

  /** Fixture exports for the sketch verified twins: the sketch's ANSWER
    * (engine-specific bits — HLL estimate, GK median) lands in parquet,
    * and BOTH engines recompute the exact side and the error-bound
    * verdict from identical bits — the same `_verified` protocol as the
    * MinHash/PQ/BPE families, closing the last non-twinned no_oracle
    * pair. */
  private[graft] val ApproxDistinctFixturePath =
    graft.Fixtures.path("approx_distinct")
  private[graft] val ApproxP50FixturePath =
    graft.Fixtures.path("approx_p50")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // string/date/math scalar suite over orders
    "q_scalar_suite" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          expr("extract(YEAR FROM o_orderdate)").cast("long").as("yr"),
          expr("extract(MONTH FROM o_orderdate)").cast("long").as("mo"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderstatus"), 1, 1).as("status_c"),
          (floor(sqrt(col("o_totalprice")) * 100) / 100).as("sqrt_price"),
          (floor(abs(col("o_totalprice") - 1000.0) * 100) / 100).as("abs_diff"),
          greatest(col("o_totalprice"), lit(500.0)).as("floor_500"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"))
        .orderBy("o_orderkey")
    }),

    // full cube over two dimensions with subtotals
    "q_cube" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("sum_price"))
        .orderBy("st", "prio")
    }),

    // explicit GROUPING SETS through the SQL entry path (no DataFrame API
    // exists for arbitrary grouping sets; spark.sql over a temp view)
    "q_grouping_sets" -> ((s, d) => {
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
          |       COALESCE(o_orderpriority, 'ALL') AS prio,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY st, prio""".stripMargin)
    }),

    // ordered string aggregation (LISTAGG / string_agg — the report-
    // building scalar every BI surface needs): deterministic because the
    // list sorts before joining; bounded because the input is an
    // already-aggregated distinct set per group, never raw rows
    "q_string_agg" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"))
        .orderBy("o_orderstatus")
    }),

    // HLL approx distinct next to the exact count (sketches are
    // engine-specific: QueriesSpec asserts the <5% error bound instead)
    "q_approx_distinct" -> ((s, d) => {
      Tables.load(s, d, "lineitem").agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))
    }),

    // the ORACLE-CHECKED half of the HLL sketch: the per-group estimate
    // (the one engine-specific number) exports as a fixture; both engines
    // recompute the EXACT distinct count and the 3-sigma error verdict
    // (default rsd 5% -> |approx-exact| <= 15% of exact) from the same
    // bits — so a wrong estimate, a wrong exact count, or a broken bound
    // all surface as a hash mismatch
    "q_approx_distinct_verified" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"))
        .write.mode("overwrite").parquet(ApproxDistinctFixturePath)
      li.groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("exact_parts"))
        .join(s.read.parquet(ApproxDistinctFixturePath), "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("approx_parts"),
          (abs(col("approx_parts") - col("exact_parts")) * 100 <=
            col("exact_parts") * 15).as("within_3rsd"))
        .orderBy("l_returnflag")
    }),

    // quantile sketch next to the exact percentiles (q_stats_suite): a
    // GK-style approx_percentile with accuracy 10000 (rank error <= n/1e4)
    // per group. Mergeable sketch = one map-side-combinable pass at any
    // scale where the exact single-buffer percentile must hold a group's
    // full column. Sketch internals are engine-specific -> rows-only check;
    // QueriesSpec asserts each value within 1% relative error of exact.
    "q_approx_percentile" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)")
          .as("pcts"), count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          col("pcts")(0).as("p25"), col("pcts")(1).as("p50"),
          col("pcts")(2).as("p75"), col("pcts")(3).as("p95"), col("n"))
        .orderBy("l_returnflag")),

    // the ORACLE-CHECKED half of the GK quantile sketch: the per-group
    // approximate median (the engine-specific value) exports as a
    // fixture; both engines recompute its EXACT rank brackets from the
    // corpus (below = #{v < p50}, at_or_below = #{v <= p50} — the sketch
    // returns a real element, so its true rank lies between the two) and
    // assert the GK accuracy-10000 guarantee as pure integer
    // inequalities: the target rank n/2 sits within ⌈n/10000⌉ (rank
    // error bounds are whole ranks) of the brackets
    "q_approx_percentile_verified" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      // coalesce(1) for the FIXTURE sketch only: approx_percentile's
      // partial-summary merge is partition-order sensitive, so a
      // multi-partition sketch can pick a different (still
      // guarantee-satisfying) element between runs — fine for the
      // within-run oracle compare, but it made recorded result hashes /
      // bench baselines run-unstable. One partition = one partial = a
      // deterministic element for the same files; the guarantee check
      // below is unchanged and the scoring join still reads the full
      // distributed table.
      li.coalesce(1).groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"))
        .write.mode("overwrite").parquet(ApproxP50FixturePath)
      li.join(s.read.parquet(ApproxP50FixturePath), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("p50"), 1L).otherwise(0L))
            .as("below"),
          sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L))
            .as("at_or_below"))
        // the rank-error bound is the integer ⌈n/accuracy⌉ (GK tolerances
        // are whole ranks): B = (n + 9999) div 10000, |rank − n/2| <= B
        // written 2x-scaled to stay integer-exact
        .select(col("l_returnflag"), col("n"), col("below"), col("at_or_below"),
          ((col("below") * 2 <= col("n") + expr("2 * ((n + 9999) div 10000)")) &&
            (col("at_or_below") * 2 >= col("n") - expr("2 * ((n + 9999) div 10000)")))
            .as("rank_ok"))
        .orderBy("l_returnflag")
    }),

    // array scalar suite (§2.8): split / size / element access (first,
    // last) / sort / slice / contains, each with an exact DuckDB
    // list-function counterpart
    "q_array_suite" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), split(trim(col("text")), " +").as("w"))
        .filter(size(col("w")) >= 3)
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          element_at(col("w"), 1).as("first_word"),
          element_at(col("w"), -1).as("last_word"),
          concat_ws(" ", slice(sort_array(col("w")), 1, 3)).as("sorted_head"),
          array_contains(col("w"), "the").cast("int").as("has_the"))
        .orderBy("doc_id")
    }),

    // json scalar suite (§2.8): path extraction from the events props
    // column + integer-exact aggregation of the extracted values
    "q_json_extract" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"),
          max("k").as("max_k"), sum("k").as("sum_k"))
        .orderBy("event_type")
    }),

    // pivot (§2.4): events per type per day — the DataFrame-only pivot op
    // with a FIXED value list (dynamic pivots need two passes; pinning the
    // columns keeps one pass AND a stable schema for the oracle)
    "q_pivot" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    }),

    // unpivot (§2.4): the inverse — wide per-day counts back to long form
    // via the DataFrame unpivot API (melt); oracle is a UNION ALL
    "q_unpivot" -> ((s, d) => {
      val wide = Tables.load(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(
          ids = Array(col("day")),
          values = Array(col("click"), col("view")),
          variableColumnName = "event_type",
          valueColumnName = "n")
        .orderBy("day", "event_type")
    }),

    // date arithmetic suite (§2.8): add / diff / trunc / last_day /
    // day-of-week, aligned to DuckDB's conventions (dow 0 = Sunday)
    "q_date_suite" -> ((s, d) => {
      val od = to_date(col("o_orderdate"))
      Tables.load(s, d, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          date_add(od, 30).as("plus30"),
          datediff(lit(java.sql.Date.valueOf("1998-01-01")), od).cast("long").as("days_to_98"),
          trunc(od, "month").as("mon"),
          last_day(od).as("eom"),
          (dayofweek(od) - 1).cast("long").as("dow"))
        .orderBy("o_orderkey")
    }),

    // statistical aggregates (§2.4): corr / covar / stddev / variance and
    // EXACT interpolated percentiles, floored to absorb last-ulp
    // accumulation-order differences between engines.
    //
    // The percentiles deliberately avoid percentile(): that aggregate holds
    // EVERY group value in one buffer (O(group rows), serialized whole
    // between partial and final agg — the round-4 bench's 7.3x outlier and
    // an OOM at scale). Instead: pass 1 collapses to (group, value, freq) —
    // a mergeable hash aggregate with map-side combine — and pass 2 ranks
    // the distinct values with a running count (sort-based window: spills,
    // memory bounded) and interpolates at rank p*(n-1), the same
    // continuous-quantile definition as percentile()/quantile_cont.
    "q_stats_suite" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      def f4(c: org.apache.spark.sql.Column) = floor(c * 10000) / 10000
      val li = Tables.load(s, d, "lineitem")
      // moment stats: constant-size buffers, one hash aggregate
      val moments = li.groupBy("l_returnflag").agg(
        f4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        f4(stddev_samp(col("l_quantity"))).as("sd_q"),
        f4(var_samp(col("l_quantity"))).as("var_q"),
        (floor(covar_samp(col("l_quantity"), col("l_extendedprice")) * 100) / 100).as("cov_qp"))
      val vf = li.groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val ranked = vf
        .withColumn("cum", sum("cnt").over(
          Window.partitionBy("l_returnflag").orderBy("v")))
        .withColumn("n", sum("cnt").over(Window.partitionBy("l_returnflag")))
      // value at 0-indexed rank k = first distinct value with cum >= k+1;
      // continuous quantile at p sits between ranks floor(r) and floor(r)+1
      // where r = p*(n-1), with fraction g = r - floor(r)
      def sel(p: Double, out: String) = {
        val r = lit(p) * (col("n") - 1).cast("double")
        val lo = floor(r)
        Seq(
          min(when(col("cum") >= lo + 1, col("v"))).as(s"${out}_lo"),
          min(when(col("cum") >= lo + 2, col("v"))).as(s"${out}_hi"),
          max(r - lo).as(s"${out}_g"))
      }
      val aggs = sel(0.25, "p25") ++ sel(0.5, "p50") ++ sel(0.75, "p75")
      val pcts = ranked.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
      // (1-g)*lo + g*hi in exactly that order — the same IEEE evaluation
      // order percentile()/quantile_cont use, so the 1e-4 floor stays exact
      def interp(out: String) =
        f4((lit(1.0) - col(s"${out}_g")) * col(s"${out}_lo") +
          col(s"${out}_g") * coalesce(col(s"${out}_hi"), col(s"${out}_lo"))).as(out)
      moments.join(pcts, "l_returnflag")
        .select(col("l_returnflag"), col("corr_qp"), col("sd_q"), col("var_q"),
          col("cov_qp"), interp("p25"), interp("p50"), interp("p75"))
        .orderBy("l_returnflag")
    }),

    // EXACT quantiles through the sketch-guided library operator
    // [[graft.operators.Quantiles.exactQuantiles]] — the 100 TB formulation:
    // GK brackets around each target (one mergeable agg), absolute-rank
    // anchors (conditional sums), rank-select confined to the bracketed
    // rows (~2*slack*n/accuracy ranks per target regardless of n). Same
    // values as percentile()/quantile_cont, no unbounded buffer AND no
    // per-group full sort (q_stats_suite's remaining parallelism floor).
    // median absolute deviation (the robust spread statistic): two exact
    // quantile passes — per-group median, then the median of absolute
    // deviations. Run on the integer-valued quantity column so every
    // interpolated midpoint is an exact binary half and both engines'
    // doubles agree bit-for-bit (a fractional-cents column would leave
    // the deviations one ulp apart across engines)
    "q_mad" -> ((s, d) => {
      // pin the 2-column projection: the two exactQuantiles passes scan
      // their input 3x each (brackets / anchors / rank-select) plus the
      // deviation rejoin — unpinned, that is ~7 executions of the base
      // scan; pinned, one parquet read and 7 cache reads of 9-byte rows
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"))
        .localCheckpoint(true)
      val med = graft.operators.Quantiles
        .exactQuantiles(li, Seq("l_returnflag"), "x", Seq(0.5))
        .select(col("l_returnflag"), col("q_0").as("med"))
      val dev = li.join(broadcast(med), "l_returnflag")
        .withColumn("d", abs(col("x") - col("med")))
      graft.operators.Quantiles
        .exactQuantiles(dev, Seq("l_returnflag"), "d", Seq(0.5))
        .join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("med"), col("q_0").as("mad"))
        .orderBy("l_returnflag")
    }),

    // per-group simple OLS (price-vs-quantity trend per return flag):
    // the 100 TB regression shape — ONE hash aggregate collapses each
    // group to six exact-BIGINT sufficient statistics (n, Σx, Σy, Σxy,
    // Σx², Σy²; x = quantity units, y = whole-dollar price, both exact
    // integer casts, so the sums are order-independent and mergeable),
    // then slope/intercept/r² are scalar double arithmetic on those
    // exact-integer-valued operands (deterministic IEEE — no Σ-order
    // dependence survives to the float stage) floored at fixed precision.
    // No window, no join, no second pass.
    "q_linreg" -> ((s, d) => {
      val t = Tables.load(s, d, "lineitem").select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      val a = t.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("double")
      val sxd = col("sx").cast("double")
      val syd = col("sy").cast("double")
      val num = nd * col("sxy").cast("double") - sxd * syd
      val den = nd * col("sxx").cast("double") - sxd * sxd
      val deny = nd * col("syy").cast("double") - syd * syd
      a.select(col("l_returnflag"), col("n"),
          floor(lit(1000000.0) * num / den).as("slope_ppm"),
          floor(lit(10000.0) * (syd - num / den * sxd) / nd).as("icept_4"),
          floor(lit(1000000.0) * num * num / (den * deny)).as("r2_ppm"))
        .orderBy("l_returnflag")
    }),

    // third/fourth central moments per group (skewness / excess kurtosis)
    // from EXACT power sums — Spark's skewness()/kurtosis() and DuckDB's
    // differ on bias correction, so neither builtin can oracle the other;
    // raw Σy, Σy², Σy³, Σy⁴ as DECIMAL(38,0) are exact and order-free in
    // both engines (y⁴ ≈ 1e16 × 6e5 rows fits 38 digits), and the
    // population-moment float chain runs on exact-integer operands.
    // Same one-aggregate no-window shape as q_linreg.
    "q_moments" -> ((s, d) => {
      val t = Tables.load(s, d, "lineitem").select(
        col("l_returnflag"), col("l_quantity").cast("long").as("y"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val a = t.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(dec(col("y"))).as("s1"),
        sum(dec(col("y") * col("y"))).as("s2"),
        sum(dec(col("y") * col("y") * col("y"))).as("s3"),
        sum(dec(col("y") * col("y") * col("y") * col("y"))).as("s4"))
      val nd = col("n").cast("double")
      val m = col("s1").cast("double") / nd
      val m2 = col("s2").cast("double") / nd - m * m
      val m3 = col("s3").cast("double") / nd - lit(3.0) * m * (col("s2").cast("double") / nd) +
        lit(2.0) * m * m * m
      val m4 = col("s4").cast("double") / nd - lit(4.0) * m * (col("s3").cast("double") / nd) +
        lit(6.0) * m * m * (col("s2").cast("double") / nd) - lit(3.0) * m * m * m * m
      a.select(col("l_returnflag"), col("n"),
          floor(m * 10000).as("mean_4"),
          floor(m2 * 10000).as("var_4"),
          floor(m3 / (sqrt(m2) * m2) * 1000000).as("skew_ppm"),
          floor((m4 / (m2 * m2) - lit(3.0)) * 1000000).as("kurt_ppm"))
        .orderBy("l_returnflag")
    }),

    "q_exact_quantiles" -> ((s, d) => {
      def f4(c: org.apache.spark.sql.Column) = floor(c * 10000) / 10000
      graft.operators.Quantiles.exactQuantiles(
          Tables.load(s, d, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
          Seq(0.25, 0.5, 0.75, 0.95))
        .select(col("l_returnflag"), f4(col("q_0")).as("p25"),
          f4(col("q_1")).as("p50"), f4(col("q_2")).as("p75"),
          f4(col("q_3")).as("p95"))
        .orderBy("l_returnflag")
    }),

    // map scalar suite (§2.8): map_from_entries -> map_keys/values ->
    // explode round-trip; the driver hashes the (re-flattened) result, so
    // any map-op divergence breaks the exact group-by oracle
    "q_map_suite" -> ((s, d) => {
      val counts = Tables.load(s, d, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      counts
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(explode(col("m")).as(Seq("event_type", "n")))
        .select(col("event_type"), col("n"),
          lit(1).as("via_map")) // marks the map round-trip path
        .orderBy("event_type")
    }))

  val oracles: Map[String, String] = Map(
    // both sketch twins read the Spark-exported sketch answer (the one
    // engine-specific number) and recompute the exact side + verdict —
    // SUM(CASE) CAST back to BIGINT inside the CTE (HUGEINT hazard), the
    // verdict in an OUTER select (DuckDB lateral-alias hazard)
    "q_approx_distinct_verified" ->
      s"""SELECT e.l_returnflag, e.exact_parts, f.approx_parts,
         |  (ABS(f.approx_parts - e.exact_parts) * 100 <= e.exact_parts * 15)
         |    AS within_3rsd
         |FROM (SELECT l_returnflag,
         |        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
         |      FROM lineitem GROUP BY 1) e
         |JOIN read_parquet('$ApproxDistinctFixturePath/*.parquet') f
         |  USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    "q_approx_percentile_verified" ->
      s"""WITH j AS (
         |  SELECT l.l_returnflag, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN l.l_extendedprice < f.p50 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS below,
         |    CAST(SUM(CASE WHEN l.l_extendedprice <= f.p50 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS at_or_below
         |  FROM lineitem l
         |  JOIN read_parquet('$ApproxP50FixturePath/*.parquet') f
         |    USING (l_returnflag)
         |  GROUP BY 1)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n, below, at_or_below,
         |  (below * 2 <= n + 2 * ((n + 9999) // 10000) AND
         |   at_or_below * 2 >= n - 2 * ((n + 9999) // 10000)) AS rank_ok
         |FROM j ORDER BY l_returnflag""".stripMargin,

    "q_scalar_suite" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
        |  UPPER(o_orderpriority) AS prio_upper,
        |  SUBSTRING(o_orderstatus, 1, 1) AS status_c,
        |  FLOOR(SQRT(o_totalprice) * 100) / 100 AS sqrt_price,
        |  FLOOR(ABS(o_totalprice - 1000.0) * 100) / 100 AS abs_diff,
        |  GREATEST(o_totalprice, 500.0) AS floor_500,
        |  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |       COALESCE(o_orderpriority, 'ALL') AS prio,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, prio""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS prio,
        |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, prio""".stripMargin,

    "q_array_suite" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id, len(w) AS n_words, w[1] AS first_word, w[len(w)] AS last_word,
        |  array_to_string(list_sort(w)[1:3], ' ') AS sorted_head,
        |  CAST(list_contains(w, 'the') AS INT) AS has_the
        |FROM t WHERE len(w) >= 3 ORDER BY doc_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_map_suite" ->
      """SELECT event_type, COUNT(*) AS n, 1 AS via_map
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) FILTER (event_type = 'click') AS click,
        |    COUNT(*) FILTER (event_type = 'view') AS view
        |  FROM events GROUP BY 1)
        |SELECT day, 'click' AS event_type, click AS n FROM wide
        |UNION ALL
        |SELECT day, 'view' AS event_type, view AS n FROM wide
        |ORDER BY day, event_type""".stripMargin,

    "q_date_suite" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  datediff('day', o_orderdate, DATE '1998-01-01') AS days_to_98,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  last_day(o_orderdate) AS eom,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,

    "q_mad" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS med
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, MIN(med) AS med,
        |  quantile_cont(abs(CAST(l.l_quantity AS DOUBLE) - med), 0.5) AS mad
        |FROM lineitem l JOIN m ON m.l_returnflag = l.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same exact-BIGINT sufficient statistics, same double chain — every
    // CAST sits exactly where Spark's does so the IEEE operations line up
    "q_linreg" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |), a AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
        |    CAST(SUM(y*y) AS BIGINT) AS syy
        |  FROM t GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT) AS slope_ppm,
        |  CAST(FLOOR(10000.0 * (CAST(sy AS DOUBLE)
        |      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE)) AS BIGINT) AS icept_4,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT) AS r2_ppm
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q_string_agg" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // same exact power sums, same population-moment float chain (each
    // arithmetic step mirrors the Spark column expression's associativity)
    "q_moments" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS y FROM lineitem
        |), a AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS s1,
        |    CAST(SUM(y*y) AS BIGINT) AS s2,
        |    CAST(SUM(y*y*y) AS BIGINT) AS s3,
        |    CAST(SUM(y*y*y*y) AS BIGINT) AS s4
        |  FROM t GROUP BY 1
        |), mm AS (
        |  SELECT l_returnflag, n, s2, s3, s4,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m
        |  FROM a
        |), cm AS (
        |  SELECT l_returnflag, n, m,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - m * m AS m2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 3.0 * m * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 2.0 * m * m * m AS m3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 4.0 * m * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 6.0 * m * m * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      - 3.0 * m * m * m * m AS m4
        |  FROM mm)
        |SELECT l_returnflag, n,
        |  CAST(FLOOR(m * 10000) AS BIGINT) AS mean_4,
        |  CAST(FLOOR(m2 * 10000) AS BIGINT) AS var_4,
        |  CAST(FLOOR(m3 / (SQRT(m2) * m2) * 1000000) AS BIGINT) AS skew_ppm,
        |  CAST(FLOOR((m4 / (m2 * m2) - 3.0) * 1000000) AS BIGINT) AS kurt_ppm
        |FROM cm ORDER BY l_returnflag""".stripMargin,

    "q_exact_quantiles" ->
      """SELECT l_returnflag,
        |  FLOOR(quantile_cont(l_extendedprice, 0.25)*10000)/10000 AS p25,
        |  FLOOR(quantile_cont(l_extendedprice, 0.5)*10000)/10000 AS p50,
        |  FLOOR(quantile_cont(l_extendedprice, 0.75)*10000)/10000 AS p75,
        |  FLOOR(quantile_cont(l_extendedprice, 0.95)*10000)/10000 AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stats_suite" ->
      """SELECT l_returnflag,
        |  FLOOR(corr(l_quantity, l_extendedprice)*10000)/10000 AS corr_qp,
        |  FLOOR(stddev_samp(l_quantity)*10000)/10000 AS sd_q,
        |  FLOOR(var_samp(l_quantity)*10000)/10000 AS var_q,
        |  FLOOR(covar_samp(l_quantity, l_extendedprice)*100)/100 AS cov_qp,
        |  FLOOR(quantile_cont(l_extendedprice, 0.25)*10000)/10000 AS p25,
        |  FLOOR(quantile_cont(l_extendedprice, 0.5)*10000)/10000 AS p50,
        |  FLOOR(quantile_cont(l_extendedprice, 0.75)*10000)/10000 AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
