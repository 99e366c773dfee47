package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * TPC-H breadth beyond the round-1 set (Q1/Q3/Q5/Q6 live in
 * [[AnalyticsQueries]]): the remaining classic plan shapes — two-sided
 * dimension pairs (Q7), conditional-share ratios (Q8/Q14), LIKE-filtered
 * fact enrichment (Q9), outer-join histograms (Q13), scalar-subquery
 * equality (Q15), correlated per-group thresholds (Q17), grouped-IN
 * semijoins (Q18), disjunctive pushdown (Q19), and anti-join + global
 * scalar aggregate (Q22) — adapted to the synthetic schema (no partsupp,
 * no commit/receipt dates; nations are NATION_0..24).
 *
 * Scale notes (100 TB): nation/region are constant-size — always
 * broadcast. supplier is a slow dimension — broadcast deliberately,
 * matching q5's convention. part and customer scale with the corpus, so
 * their joins carry no hint: at bench SF AQE picks broadcast on its own,
 * and at cluster scale the same plan degrades gracefully to a shuffle
 * join instead of OOMing the driver.
 *
 * Float discipline (see AnalyticsQueries): money columns are exact
 * 2-decimal values, so every sum runs in DECIMAL(18,2) (associative —
 * partial-agg order can't change the bits) and casts to DOUBLE at the
 * end; ratios of two such doubles are floor-scaled to 4 places so the
 * single IEEE division both engines perform is compared at a stable
 * precision.
 */
object TpchQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** DERIVED partsupp — the one TPC-H table the driver schema lacks,
    * constructed deterministically from part × 4 suppliers so BOTH
    * engines build identical rows (the corpus-derivation pattern of
    * pipe_corpus_diff/pipe_merge_upsert, applied to a dimension):
    * supplier assignment mirrors the TPC-H generator's stride rule with
    * a constant per-k step (floor(S/4)) so the four suppliers per part
    * are structurally distinct for every S; availqty and supplycost are
    * integer hashes (cost carried in CENTS so aggregates stay exact).
    * Unlocks the four remaining classic shapes: Q2, Q11, Q16, Q20. */
  private[queries] def partsupp(s: SparkSession, d: String): DataFrame = {
    val ns = t(s, d, "supplier").agg(count(lit(1)).as("ns"))
    t(s, d, "part").select(col("p_partkey"))
      .crossJoin(broadcast(s.range(4).select(col("id").as("k"))))
      .crossJoin(broadcast(ns))
      .select(
        col("p_partkey").as("ps_partkey"),
        expr("(p_partkey + p_partkey div ns + k * (ns div 4)) % ns")
          .as("ps_suppkey"),
        expr("(p_partkey * 4 + k) % 991 + 1").as("ps_availqty"),
        expr("(p_partkey * 7 + k * 13) % 90000 + 1000").as("ps_supplycost_cents"))
  }

  /** The same derivation as portable SQL (prefix it with a WITH). */
  private val psCte =
    """ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + p_partkey // ns + k * (ns // 4)) % ns AS ps_suppkey,
      |    (p_partkey * 4 + k) % 991 + 1 AS ps_availqty,
      |    (p_partkey * 7 + k * 13) % 90000 + 1000 AS ps_supplycost_cents
      |  FROM part CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) CROSS JOIN ns)""".stripMargin

  private def dsum(c: String): Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  /** Exact decimal sum of extendedprice*(1-discount), as double. */
  private val discPrice =
    expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")

  /** floor-scale a ratio to 4 decimal places (both engines do the same
    * single IEEE divide on identical operands, then the same floor). */
  private def ratio4(num: Column, den: Column): Column =
    floor(num * lit(10000) / den) / 10000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q7: volume shipped between a nation PAIR, by ship year. The
    // supplier leg (supplier ⋈ 2-of-25 nations) is a BROADCAST — joining
    // it FIRST cuts the fact to the pair's ~2/25 before any shuffle, so
    // the orderkey exchange carries 12× fewer rows than the naive
    // li⋈orders-first order (Catalyst keeps the written join order; CBO
    // is off). The customer-side nation filter applies after the customer
    // join, same effect on the aggregation input.
    "q7_nation_volume" -> ((s, d) => {
      // NATION_18/19 rather than the classic FRANCE/GERMANY stand-ins:
      // this pair trades in BOTH directions even at sf0.001 (rows>0 spec)
      val pair = Seq("NATION_18", "NATION_19")
      val n1 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val suppSide = t(s, d, "supplier")
        .join(n1, col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      t(s, d, "lineitem")
        .join(broadcast(suppSide), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8: NATION_2 suppliers' share of the ASIA customer market by order
    // year — conditional numerator over an unconditional denominator in
    // one aggregation pass (no second scan, no self-join).
    "q8_market_share" -> ((s, d) => {
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNation = t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_2", discPrice)
            .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).cast("double").as("nation_volume"),
          sum(discPrice).cast("double").as("total_volume"))
        .select(col("o_year"),
          ratio4(col("nation_volume"), col("total_volume")).as("mkt_share"),
          col("nation_volume"), col("total_volume"))
        .orderBy("o_year")
    }),

    // Q9: profit on a part-name family by supplier nation and ship year.
    // Without partsupp, cost = retailprice * quantity * 0.01 — a decimal
    // MULTIPLY, not /100: DuckDB's decimal division converts to DOUBLE
    // (per-row float noise breaks the hash compare), multiplication stays
    // exact in both engines. part join is unhinted — it scales with the
    // corpus.
    "q9_product_profit" -> ((s, d) => {
      val parts = t(s, d, "part").filter(col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
      val amount = expr(
        """CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          | - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.01 AS DECIMAL(18,2))""".stripMargin)
      t(s, d, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q10: top returned-item revenue by customer over one quarter — group
    // on the full customer tuple (key + attributes ride the same shuffle),
    // top-20 via TakeOrderedAndProject.
    "q10_returned_items" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP'1996-04-01 00:00:00'")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q13: distribution of orders-per-customer — LEFT OUTER so zero-order
    // customers survive into the c_count=0 bucket, then a second (tiny)
    // aggregation over the counts. count(o_orderkey) not count(*): null
    // order keys from the outer join must not count.
    "q13_order_distribution" -> ((s, d) => {
      val ord = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14: promo revenue share over one month — the conditional-sum ratio
    // in a single pass; part join unhinted (scales with corpus).
    "q14_promo_revenue" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1997-03-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1997-04-01 00:00:00'"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).cast("double").as("promo_revenue"),
          sum(discPrice).cast("double").as("total_revenue"))
        .select(ratio4(col("promo_revenue") * lit(100), col("total_revenue")).as("promo_pct"),
          col("promo_revenue"), col("total_revenue"))
    }),

    // Q15: supplier(s) with the maximum quarterly revenue — the revenue
    // aggregate is computed ONCE: its per-suppkey shuffle is shared
    // between the join leg and the 1-row max leg via ReuseExchange (the
    // explicit isNotNull below matters — without it the join side infers
    // an isnotnull(l_suppkey) constraint the max side lacks, the two
    // exchanges stop canonicalizing equal, and the fact is scanned twice;
    // QueriesSpec pins the reuse). Equality on doubles is safe: both
    // sides are the same decimal-sum cast, bit-identical across engines.
    "q15_top_supplier" -> ((s, d) => {
      val revenue = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1996-04-01 00:00:00'") &&
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(discPrice).cast("double").as("total_revenue"))
      val maxRev = revenue.agg(max("total_revenue").as("max_revenue"))
      t(s, d, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // Q17: revenue from small-quantity orders of one brand+type — the
    // correlated per-part AVG decorrelates to one grouped aggregate joined
    // back to the fact (part filter first, so both the aggregate and the
    // join touch only the brand's lineitems). avg = decimal-sum / count:
    // identical operands → identical IEEE divide in both engines.
    "q17_small_qty" -> ((s, d) => {
      val parts = t(s, d, "part")
        .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
        .select("p_partkey")
      val li = t(s, d, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("p_partkey").as("agg_pk"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_qty"))
      li.join(avgQty, col("p_partkey") === col("agg_pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg((dsum("l_extendedprice") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // Q18: orders whose total quantity clears a threshold — grouped
    // semijoin: the qualifying keys come from ONE aggregation of lineitem,
    // then enrich. Threshold 200 keeps the qualifying set ~1.5% of orders.
    "q18_large_orders" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bigOrders = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .filter(col("total_qty") > 200)
      bigOrders
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19: disjunctive brand/size/quantity blocks — one part join, the
    // OR-of-conjuncts stays a single predicate so each side's base terms
    // (p_partkey join key, l_quantity range hull) still push to the scans.
    "q19_disjunctive" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(discPrice).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Q2: minimum-cost supplier per part within a region — the correlated
    // scalar-min subquery classic. Formulated as a per-part window MIN +
    // equality filter: identical rows to the aggregate-and-join-back form
    // (both keep every tied min-cost supplier), but ONE partsupp scan and
    // ONE exchange instead of two scans, two broadcast builds of the
    // region-supplier side, and a join-back (guide §2.4 — the join-back's
    // second pass re-ran the whole supplier⋈nation⋈region subtree because
    // different column pruning per branch defeats exchange reuse).
    // Dimensions broadcast.
    "q2_min_cost_supplier" -> ((s, d) => {
      val regionSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val ps = partsupp(s, d)
        .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ps_partkey")
      ps.withColumn("min_cents", min("ps_supplycost_cents").over(w))
        .filter(col("ps_supplycost_cents") === col("min_cents"))
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY")
            .select("p_partkey", "p_size")),
          col("ps_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_size"), col("ps_supplycost_cents"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q11: important stock — per-part inventory value for one nation's
    // suppliers, kept when above a fixed fraction of the nation total
    // (the scalar-subquery threshold as a broadcast singleton). Exact:
    // value = cents × qty summed as DECIMAL.
    "q11_important_stock" -> ((s, d) => {
      val natSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val ps = partsupp(s, d)
        .join(natSupp, col("ps_suppkey") === col("s_suppkey"))
        .withColumn("value_c",
          (col("ps_supplycost_cents") * col("ps_availqty")).cast("decimal(38,0)"))
      val tot = ps.agg(sum("value_c").as("tot_c"))
      ps.groupBy("ps_partkey").agg(sum("value_c").as("part_value_c"))
        .crossJoin(broadcast(tot))
        // keep parts above 1/1000 of the nation total (scaled integer test)
        .filter(col("part_value_c") * 1000 > col("tot_c"))
        .select(col("ps_partkey"),
          col("part_value_c").cast("long").as("value_c"))
        .orderBy(col("value_c").desc, col("ps_partkey"))
    }),

    // Q16: supplier count per (brand, type, size) for non-excluded parts,
    // excluding flagged suppliers via a shuffle-capable LEFT ANTI (the
    // NOT IN classic with both keys non-null)
    "q16_supplier_cnt" -> ((s, d) => {
      val flagged = t(s, d, "supplier")
        .filter(col("s_suppkey") % 10 === 0).select(col("s_suppkey").as("bad"))
      partsupp(s, d)
        .join(broadcast(t(s, d, "part")
            .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 30)),
          col("ps_partkey") === col("p_partkey"))
        .join(flagged, col("ps_suppkey") === col("bad"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100)
    }),

    // Q20: suppliers holding excess stock of shipped parts — availqty >
    // half the quantity actually shipped for that (part, supplier) in a
    // year: the nested-EXISTS classic as one aggregate + one semi join.
    "q20_excess_stock" -> ((s, d) => {
      val shipped = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1998-01-01 00:00:00'"))
        .groupBy(col("l_partkey").as("sp"), col("l_suppkey").as("ss"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val excess = partsupp(s, d)
        .join(shipped, col("ps_partkey") === col("sp") &&
          col("ps_suppkey") === col("ss"))
        .filter(col("ps_availqty") * 2 > col("qty"))
        .select(col("ps_suppkey")).distinct()
      t(s, d, "supplier")
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Q4: order-priority histogram of orders with at least one LATE line
    // (classic: l_commitdate < l_receiptdate; this schema carries only
    // l_shipdate, so "late" = shipped more than 30 days after the order
    // date — same correlated-EXISTS shape). LEFT SEMI join: the lineitem
    // side is filtered by the date window via the join, existence tested
    // without multiplying rows; both keys non-null → shuffle-capable.
    "q4_order_priority" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP'1996-07-01 00:00:00'"))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q12: two-way conditional counts over a fact join window (classic
    // groups by l_shipmode; this schema has none, so the return flag
    // plays the category and "late" keeps the Q4 adaptation at 60 days).
    // The priority split is the Q12 signature: urgent/high vs the rest,
    // counted in ONE pass with when() — no second join, no union.
    "q12_shipmode" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "orders").join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1997-01-01 00:00:00'") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // Q21: suppliers who were the ONLY late supplier on a finished
    // multi-supplier order — the double-correlated EXISTS / NOT EXISTS
    // classic, as one semi + one anti join on (orderkey, ≠suppkey). The
    // anti side pre-filters to LATE lines only, so at scale it carries
    // the small offending subset; nation is a constant-size broadcast.
    "q21_waiting_supplier" -> ((s, d) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val l1 = li.join(
          t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = l1.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      l1
        .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        .join(broadcast(t(s, d, "supplier")
            .join(broadcast(t(s, d, "nation")
              .filter(col("n_name") === "NATION_3")),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }),

    // Q22: positive-balance customers above the global average balance
    // with no recent urgent order — a 1-row scalar aggregate broadcast
    // against the customer scan, then a shuffle-capable LEFT ANTI against
    // the filtered orders (both keys non-null → no NAAJ cliff; cf. the
    // q_subqueries note). The anti side is filtered BEFORE the join, so
    // at scale it carries only the urgent-recent keys. (The classic
    // "never ordered at all" predicate is empty on this dense data —
    // every customer has orders.)
    "q22_idle_customers" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_bal"))
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= expr("TIMESTAMP'2000-01-01 00:00:00'"))
        .select("o_custkey")
      cust
        .join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum("c_acctbal").as("totacctbal"))
        .orderBy("c_nationkey")
    }))

  val oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  EXTRACT(year FROM l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_18','NATION_19') AND n2.n_name IN ('NATION_18','NATION_19')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS v,
        |    n1.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'ASIA')
        |SELECT o_year,
        |  FLOOR(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN v ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 10000
        |        / CAST(SUM(v) AS DOUBLE)) / 10000 AS mkt_share,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN v ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
        |  CAST(SUM(v) AS DOUBLE) AS total_volume
        |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, EXTRACT(year FROM l_shipdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.01 AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q2_min_cost_supplier" ->
      s"""WITH $psCte,
        |rs AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |), ps AS (
        |  SELECT partsupp.*, rs.s_name, rs.s_acctbal, rs.n_name
        |  FROM partsupp JOIN rs ON ps_suppkey = rs.s_suppkey
        |), mc AS (
        |  SELECT ps_partkey AS mk, MIN(ps_supplycost_cents) AS min_cents
        |  FROM ps GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_size,
        |  CAST(ps_supplycost_cents AS BIGINT) AS ps_supplycost_cents
        |FROM ps
        |JOIN part ON ps_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN mc ON ps_partkey = mk AND ps_supplycost_cents = min_cents
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $psCte,
        |ns2 AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |), ps AS (
        |  SELECT ps_partkey,
        |    CAST(ps_supplycost_cents AS BIGINT) * ps_availqty AS value_c
        |  FROM partsupp JOIN ns2 ON ps_suppkey = s_suppkey
        |), tot AS (SELECT SUM(value_c) AS tot_c FROM ps)
        |SELECT ps_partkey, CAST(SUM(value_c) AS BIGINT) AS value_c
        |FROM ps CROSS JOIN tot
        |GROUP BY ps_partkey, tot_c
        |HAVING SUM(value_c) * 1000 > tot_c
        |ORDER BY value_c DESC, ps_partkey""".stripMargin,

    "q16_supplier_cnt" ->
      s"""WITH $psCte
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM partsupp
        |JOIN part ON ps_partkey = p_partkey
        |  AND p_brand <> 'Brand#1' AND p_size <= 30
        |WHERE ps_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 100""".stripMargin,

    "q20_excess_stock" ->
      s"""WITH $psCte,
        |shipped AS (
        |  SELECT l_partkey AS sp, l_suppkey AS ss,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2
        |), excess AS (
        |  SELECT DISTINCT ps_suppkey
        |  FROM partsupp JOIN shipped
        |    ON ps_partkey = sp AND ps_suppkey = ss
        |  WHERE ps_availqty * 2 > qty)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
        |ORDER BY s_suppkey""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q12_shipmode" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH l1 AS (
        |  SELECT l_orderkey, l_suppkey, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM l1 l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q14_promo_revenue" ->
      """WITH s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT FLOOR(promo_revenue * 100 * 10000 / total_revenue) / 10000 AS promo_pct,
        |  promo_revenue, total_revenue FROM s""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = part.p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
        |avgq AS (
        |  SELECT p_partkey AS agg_pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM li JOIN avgq ON p_partkey = agg_pk
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 200)
        |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_idle_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
