package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * The analytics surface (SURVEY §2.3-§2.8 north star): joins, aggregations,
 * window functions, sorts/limits, set ops, rollup, event-time bucketing and
 * sessionization over the TPC-H-ish tables.
 *
 * Numeric discipline for oracle (DuckDB) hash-equality: every aggregated
 * double goes through an exact DECIMAL sum first and is cast to DOUBLE at
 * the end — decimal addition is associative, so Spark's partial aggregation
 * order and DuckDB's single-threaded order produce bit-identical results.
 * Plain double SUM would differ in the last ulp between engines.
 */
object AnalyticsQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Exact decimal sum of a 2-decimal column, surfaced as double. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: the canonical wide aggregation
    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= expr("TIMESTAMP'2000-12-31 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style: selective dim filter, broadcast join, top-k by revenue
    "q3_shipping_priority" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < expr("TIMESTAMP'1998-06-30 00:00:00'"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > expr("TIMESTAMP'1998-06-30 00:00:00'"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
          .cast("double").as("revenue"))
        .select(col("o_orderkey"), cast_date(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: 6-way join, small dims broadcast, group by nation
    "q5_region_revenue" -> ((s, d) => {
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP'1997-01-01 00:00:00'"))
      val li = t(s, d, "lineitem")
      val supp = t(s, d, "supplier")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Bloom-prefiltered fact⋈dim join ([[graft.operators.BloomJoin]]): the
    // urgent-priority orders slice (~1/5 of orders) stands in for a dim too
    // big to broadcast as a hash relation but cheap to ship as a ~10-bit/key
    // Bloom filter. The native graft_bloom_contains probe drops ~4/5 of
    // lineitem inside its scan's codegen span BEFORE the orderkey shuffle;
    // the hash join then removes the fpp false positives, so the oracle is
    // the PLAIN join — bit-identical results, a fraction of the exchange.
    "q_bloom_join" -> ((s, d) => {
      val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.BloomJoin
        .prefilteredJoin(t(s, d, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    }),

    // TPC-H Q6-style forecast-revenue: the canonical selective-scan
    // aggregate — every predicate reaches the parquet scan as PushedFilters
    // (timestamp range, double range, quantity bound), so at 100 TB this
    // reads only row groups whose min/max stats overlap the window. No
    // join, no shuffle: partial agg per scan task + one 1-row merge.
    "q6_forecast_revenue" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1998-01-01 00:00:00'") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24)
        .agg(
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // §2.5: ranking + running aggregate windows
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .filter(pmod(col("o_custkey"), lit(100)) === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rk"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "rk")
    }),

    // §2.6 top-k per group via ranking window
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    }),

    // The SAME top-3-per-priority through the bounded-heap native aggregate
    // ([[graft.expressions.TopKRows]] via [[graft.operators.TopK]]): map-side
    // partial aggregation bounds the shuffle at k rows per key per input
    // partition and replaces the window's in-partition sort with an O(k)
    // heap. Same oracle as q_topk_per_group — the driver hash-checks the
    // custom aggregate's output against DuckDB's window ranking.
    "q_topk_agg" -> ((s, d) =>
      graft.operators.TopK.topKPerKey(
          t(s, d, "orders"), Seq("o_orderpriority"),
          struct(col("o_totalprice"), -col("o_orderkey")),
          Seq("o_orderkey", "o_totalprice"), 3)
        .orderBy("o_orderpriority", "rn")),

    // §2.4: rollup with subtotal rows
    "q_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),

    // §2.7: EXCEPT / INTERSECT / UNION ALL
    "q_setops" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val buyers = t(s, d, "orders").select(col("o_custkey").as("custkey"))
      val rich = cust.filter(col("c_acctbal") > 7000).select(col("c_custkey").as("custkey"))
      val debt = cust.filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey"))
      rich.except(buyers).withColumn("tag", lit("rich_no_orders"))
        .unionAll(debt.intersect(buyers).withColumn("tag", lit("debt_buyer")))
        .select("tag", "custkey")
        .orderBy("tag", "custkey")
    }),

    // §2.3: semi/anti joins
    "q_semi_anti" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val cond = col("c_custkey") === col("o_custkey")
      val withO = cust.join(ord, cond, "left_semi").agg(count(lit(1)).as("with_orders"))
      val withoutO = cust.join(ord, cond, "left_anti").agg(count(lit(1)).as("without_orders"))
      withO.crossJoin(withoutO)
    }),

    // T5 north star: event-time tumbling hour buckets
    "q_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum("value").as("sum_value"),
          countDistinct("user_id").as("users"))
        .orderBy("hour", "event_type")
    }),

    // referential-integrity audit (the lake health check run after any
    // ingest or MERGE): orphan counts in both directions for the two fact
    // relationships, as four LEFT ANTI legs collapsed to one row — each
    // leg is a shuffle-capable anti join on non-null keys, the readout a
    // broadcast-singleton cross.
    "q_integrity_audit" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer").select(col("c_custkey"))
      val orphanLines = li.join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("lineitems_without_order"))
      val childlessOrders = o.select("o_orderkey")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orders_without_lineitem"))
      val orphanOrders = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orders_without_customer"))
      val idleCust = c.join(o.select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("customers_without_order"))
      orphanLines.crossJoin(broadcast(childlessOrders))
        .crossJoin(broadcast(orphanOrders))
        .crossJoin(broadcast(idleCust))
    }),

    // event-flow mining (product-analytics path analysis): per-user
    // transition bigrams over the time-ordered event stream, top-20 edges
    // of the Markov transition graph. The window partitions by user (no
    // global sort — per-user state only), ties in ts break on event_id so
    // the lead() is deterministic; the readout is an |event_type|²-bounded
    // aggregate + TakeOrdered.
    "q_event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("from_type"), col("to_type"))
        .limit(20)
    }),

    // burst detection over the hourly series: an hour is a burst when its
    // count clears mean + 2σ — squared into the exact-integer test
    // (n·c − S)² > 4·(n·Q − S²) with n·c > S, so no float enters the
    // verdict and the oracle matches every flagged hour. The stats row is
    // a broadcast singleton; the series is scanned once per side
    "q_burst_hours" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("c"))
      // DECIMAL(38,0) keeps the squared test exact far past LONG range
      // ((n·c)² overflows int64 once hourly counts reach ~1e5 at 1e4
      // hours); DuckDB's BIGINT sums widen to HUGEINT natively, so both
      // engines stay exact and agree on every verdict
      val stats = hourly.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("c").cast("decimal(38,0)")).as("s"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("q"))
      hourly.crossJoin(broadcast(stats))
        .withColumn("cd", col("c").cast("decimal(38,0)"))
        .filter(col("n") * col("cd") > col("s") &&
          (col("n") * col("cd") - col("s")) * (col("n") * col("cd") - col("s"))
            > lit(4) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("hour"), col("c"),
          (col("n") * col("cd") - col("s")).cast("long").as("excess_n"))
        .orderBy("hour")
    }),

    // gaps-and-islands sessionization (30-minute inactivity gap), ms precision
    "q_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marked = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(lag("ts", 1).over(byUser).isNull ||
            unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(byUser)) > 1800000L, 1)
            .otherwise(0).as("is_new"))
      val sess = marked.select(col("user_id"),
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      sess.groupBy("user_id")
        .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // the CUSTOM-STATE sessionizer ([[graft.streaming.Sessionizer]]) on its
    // batch path, hash-checked against DuckDB's gaps-and-islands window —
    // the same flatMapGroupsWithState logic that runs live with event-time
    // timeouts is what produces these rows, so the state-machine semantics
    // (merge, bridge, split) are oracle-verified, not just spec'd.
    // Timestamps compare at ms precision on both sides (java getTime and
    // DuckDB epoch_ms both floor), 30-minute gap like q_sessionize.
    "q_sessionize_state" -> ((s, d) =>
      graft.streaming.Sessionizer.sessionize(
          t(s, d, "events").select(col("user_id"), col("ts")),
          gapMs = 1800000L)
        .toDF()
        .orderBy("user_id", "session_start_ms")),

    // §2.4: multi-column distinct aggregation
    "q_distinct_stats" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        countDistinct("l_partkey").as("parts"),
        countDistinct("l_suppkey").as("supps"),
        countDistinct("l_orderkey").as("orders_cnt"),
        count(lit(1)).as("rows_cnt"))
    }),

    // AS-OF join (an operator Spark lacks natively): for each 'view' event,
    // the same user's most recent 'purchase' at-or-before it (second
    // granularity; ties break purchase-before-view, then highest event_id).
    // Runs through the library operator [[graft.operators.AsofJoin]] — the
    // union+window linear merge: ONE shuffle on user_id, no per-row range
    // probe, no broadcast requirement on either side.
    "q_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("t"), col("event_type"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "t")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      graft.operators.AsofJoin.asof(views, purchases,
          leftTime = "t", rightTime = "t", by = Seq("user_id"),
          valueCols = Seq("p_id", "p_value"), rightOrder = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_p_id").as("asof_purchase_id"),
          col("asof_p_value").as("asof_purchase_value"))
        .orderBy("event_id")
    }),

    // as-of with a MATCH TOLERANCE (the realistic attribution form: a view
    // is credited to a purchase only within the attribution window) — the
    // same linear-merge as-of carries the matched time as a value column,
    // and matches older than 1 hour null out. No extra pass: the
    // tolerance is a stateless projection over the as-of output.
    "q_asof_tolerance" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("t"), col("event_type"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "t")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id"),
          col("event_id").as("p_id"), col("value").as("p_value"),
          col("t").as("p_t"))
      val joined = graft.operators.AsofJoin.asof(views, purchases,
        leftTime = "t", rightTime = "t", by = Seq("user_id"),
        valueCols = Seq("p_id", "p_value", "p_t"), rightOrder = Seq("event_id"))
      val gap = expr("unix_micros(t) div 1000000") -
        expr("unix_micros(asof_p_t) div 1000000")
      val ok = col("asof_p_t").isNotNull && gap <= 3600L
      joined.select(col("event_id"), col("user_id"),
          when(ok, col("asof_p_id")).as("asof_purchase_id"),
          when(ok, col("asof_p_value")).as("asof_purchase_value"),
          when(ok, gap).as("gap_sec"))
        .orderBy("event_id")
    }),

    // The SAME as-of join through the native Catalyst operator
    // ([[graft.plans.AsofMergeJoinExec]] — custom LogicalPlan + Strategy +
    // one-pass merge SparkPlan): both sides shuffle once on user_id and
    // merge with O(1) per-partition state; no union legs, no window buffer.
    // Same oracle as q_asof_join, so the driver hash-checks the custom
    // operator's row-level output against DuckDB directly.
    "q_asof_native" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("t"), col("event_type"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "t")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      graft.operators.AsofJoin.asofMerge(views, purchases,
          leftTime = "t", rightTime = "t", by = Seq("user_id"),
          valueCols = Seq("p_id", "p_value"), rightOrder = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_p_id").as("asof_purchase_id"),
          col("asof_p_value").as("asof_purchase_value"))
        .orderBy("event_id")
    }),

    // §2.5 completion: the analytic window family beyond ranking/running —
    // offsets (lag/lead), equal-width bucketing (ntile), frame navigation
    // (first/nth value) over a TOTAL order, plus the tie-aware distribution
    // family (rank/dense_rank/percent_rank/cume_dist) over a date-only order
    // where ties are real. Two window specs, same partition key, so the plan
    // pays ONE shuffle and two in-partition sorts.
    "q_window_analytics" -> ((s, d) => {
      val wSeq = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
      val wTie = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
      t(s, d, "orders")
        .filter(pmod(col("o_custkey"), lit(50)) === 0)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          lag("o_totalprice", 1).over(wSeq).as("prev_price"),
          lead("o_totalprice", 1).over(wSeq).as("next_price"),
          ntile(4).over(wSeq).as("quartile"),
          first("o_orderkey").over(wSeq).as("first_key"),
          nth_value(col("o_orderkey"), 2).over(wSeq).as("second_key"),
          rank().over(wTie).as("date_rank"),
          dense_rank().over(wTie).as("date_dense_rank"),
          percent_rank().over(wTie).as("date_percent_rank"),
          cume_dist().over(wTie).as("date_cume_dist"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // §2.3/§2.4: the subquery surface through the SQL entry path — correlated
    // scalar aggregates (COUNT / MAX per outer row), an uncorrelated scalar
    // threshold, EXISTS, and NOT EXISTS. Catalyst decorrelates all four into
    // joins (aggregate-then-join for the scalars, left-semi for EXISTS,
    // left-anti for NOT EXISTS) — no per-row re-execution anywhere, which is
    // the whole 100 TB story for subqueries. NOT EXISTS deliberately, not
    // NOT IN: with possibly-null keys NOT IN needs a null-aware anti join,
    // which Spark can only execute as a BROADCAST — a silent scale cliff
    // when the subquery side grows. Both keys here are non-null, so the
    // plain (shuffle-capable) left-anti is the same answer with no cliff.
    // MAX (order-stable) instead of SUM on the double column keeps the
    // oracle hash exact without a decimal detour.
    "q_subqueries" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_sq")
      t(s, d, "orders").createOrReplaceTempView("orders_sq")
      t(s, d, "supplier").createOrReplaceTempView("supplier_sq")
      s.sql(
        """SELECT c_custkey, c_acctbal,
          |  (SELECT COUNT(*) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  (SELECT MAX(o_totalprice) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) AS max_order
          |FROM customer_sq c
          |WHERE c.c_acctbal > (SELECT MAX(c_acctbal) FROM customer_sq) / 2
          |  AND EXISTS (SELECT 1 FROM orders_sq o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          |  AND NOT EXISTS (SELECT 1 FROM supplier_sq s
          |                  WHERE s.s_suppkey = c.c_custkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Range join without an equi-key (interval containment): events.value
    // against 20 OVERLAPPING bands [b*25, b*25+60), through the library
    // operator [[graft.operators.RangeJoin]] — bucket quantization turns the
    // interval predicate into an equi-join on bucket plus an exact residual
    // filter, bounding candidates by rows × bands-per-bucket instead of the
    // |events| × |bands| cross product a naive theta join plans.
    "q_range_join" -> ((s, d) => {
      val bands = s.range(0, 20).select(
        col("id").cast("int").as("band_id"),
        (col("id") * lit(25.0)).as("lo"),
        (col("id") * lit(25.0) + lit(60.0)).as("hi"))
      val ev = t(s, d, "events").select(col("event_id"), col("value"))
      graft.operators.RangeJoin.pointInInterval(
          ev, "value", bands, "lo", "hi", bucketWidth = 25.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_events"), dsum("value").as("sum_value"))
        .orderBy("band_id")
    }),

    // KEYED interval containment through the NATIVE operator
    // ([[graft.plans.IntervalMergeJoinExec]]): per-user 4-hour purchase
    // attribution windows, joined against that user's click/view stream.
    // Both sides derive from `events` (self-lineage through the node's
    // fresh-exprId re-alias) and both can be corpus-sized: each shuffles
    // once on user_id and one sweep pass joins them with O(concurrent
    // windows) state — no bucket-width knob, no interval explosion.
    "q_interval_merge" -> ((s, d) => {
      val ev = t(s, d, "events")
      val windows = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("lo"), (col("ts") + expr("INTERVAL 4 HOURS")).as("hi"))
      val clicks = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.RangeJoin.pointInIntervalMerge(
          clicks, "ts", windows, "lo", "hi",
          by = Seq("user_id"), valueCols = Seq("purchase_id"))
        .groupBy(col("iv_purchase_id").as("purchase_id"))
        .agg(count(lit(1)).as("n_in_window"), dsum("value").as("sum_value"))
        .orderBy("purchase_id")
    }),

    // The LEFT-OUTER leg of the native interval join: every click/view
    // survives, tagged with its containing purchase window or null — the
    // enrichment contract (row-level, so the oracle hash-checks the
    // unmatched-null rows and the fan-out duplicates alike).
    "q_interval_merge_outer" -> ((s, d) => {
      val ev = t(s, d, "events")
      val windows = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("lo"), (col("ts") + expr("INTERVAL 4 HOURS")).as("hi"))
      val clicks = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id"), col("ts"))
      graft.operators.RangeJoin.pointInIntervalMerge(
          clicks, "ts", windows, "lo", "hi",
          by = Seq("user_id"), valueCols = Seq("purchase_id"),
          joinType = "left_outer")
        .select(col("event_id"), col("iv_purchase_id").as("purchase_id"))
        .orderBy("event_id", "purchase_id")
    }),

    // Interval OVERLAP join (the third temporal-join shape): per-user
    // 4-hour purchase windows x 4-hour error windows that overlap — which
    // purchases happened while errors were live. Through
    // [[graft.operators.RangeJoin.intervalOverlapMerge]], the dedicated
    // single-pass native operator ([[graft.plans.IntervalOverlapJoinExec]]):
    // each side shuffles and sorts ONCE on user_id, one merged plane sweep
    // pairs the two window streams with O(max concurrent overlap) state —
    // never a per-user cross product of windows.
    "q_interval_overlap" -> ((s, d) => {
      val ev = t(s, d, "events")
      def windows(typ: String, id: String, lo: String, hi: String) =
        ev.filter(col("event_type") === typ).select(
          col("user_id"), col("event_id").as(id),
          col("ts").as(lo), (col("ts") + expr("INTERVAL 4 HOURS")).as(hi))
      graft.operators.RangeJoin.intervalOverlapMerge(
          windows("purchase", "purchase_id", "plo", "phi"), "plo", "phi",
          windows("error", "error_id", "elo", "ehi"), "elo", "ehi",
          by = Seq("user_id"), valueCols = Seq("error_id"))
        .select(col("purchase_id"), col("iv_error_id").as("error_id"))
        .orderBy("purchase_id", "error_id")
    }),

    // Ordered funnel view → click → purchase (greedy: earliest view, then
    // earliest click after it, then any purchase after that). Both
    // step-2/step-3 anchors come from running-min windows over the SAME
    // (user, ts) sort, so the whole funnel costs ONE shuffle: no
    // self-joins of the event log, no per-step scans — the shape that
    // survives a 100 TB event table. Raw-ts comparisons are oracle-safe:
    // the data is microsecond-granular (nanos % 1000 == 0), so Spark's
    // micros and DuckDB's nanos order identically.
    "q_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e1 = t(s, d, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        min(when(col("event_type") === "view", col("ts"))).over(w)
          .as("first_view"))
      val e2 = e1.withColumn("first_click",
        min(when(col("event_type") === "click" && col("ts") > col("first_view"),
          col("ts"))).over(w))
      e2.groupBy("user_id")
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("viewed"),
          max(when(col("event_type") === "click" && col("ts") > col("first_view"), 1)
            .otherwise(0)).as("clicked"),
          max(when(col("event_type") === "purchase" && col("ts") > col("first_click"), 1)
            .otherwise(0)).as("purchased"))
        .agg(
          count(lit(1)).as("users"),
          sum("viewed").as("n_view"),
          sum("clicked").as("n_view_click"),
          sum("purchased").as("n_view_click_purchase"))
        .select(col("users"), col("n_view"), col("n_view_click"),
          col("n_view_click_purchase"),
          (floor(col("n_view_click") * lit(10000) / col("n_view")) / 10000)
            .as("cr_click"),
          (floor(col("n_view_click_purchase") * lit(10000) / col("n_view_click")) / 10000)
            .as("cr_purchase"))
    }),

    // The streaming funnel operator on its batch-degenerate path: greedy
    // anchors per (user, day window) through FunnelState.funnel — the SAME
    // code that runs live with watermark finality (StreamingSpec has the
    // replay-parity test). Oracle rebuilds the anchor chain as layered
    // FILTER aggregates.
    "q_funnel_state" -> ((s, d) =>
      graft.streaming.FunnelState.funnel(
          t(s, d, "events"), windowMs = 86400000L)
        .toDF()
        .select(col("user_id"), col("window_start_ms"), col("completed"),
          try_element_at(col("step_ts_ms"), lit(1)).as("t0_ms"),
          try_element_at(col("step_ts_ms"), lit(2)).as("t1_ms"),
          try_element_at(col("step_ts_ms"), lit(3)).as("t2_ms"))
        .orderBy("user_id", "window_start_ms")),

    // streaming frequent-items state machine on its batch-degenerate path
    // ([[graft.streaming.HeavyHittersState]]): hourly tumbling windows over
    // the event log, Misra-Gries counters per (window, shard) key. k=1024
    // exceeds the event-type cardinality, so no counter ever decrements and
    // the emission is EXACT hourly type counts — which is what lets an
    // oracle check a sketch operator bit-for-bit. The small-k approximate
    // regime (decrements, guarantee bar, watermark finality) is driven by
    // HeavyHittersStateSpec on a live MemoryStream.
    "q_heavy_hitters_state" -> ((s, d) =>
      graft.streaming.HeavyHittersState.frequentItems(
          t(s, d, "events"), itemCol = "event_type",
          windowMs = 3600000L, k = 1024)
        .toDF()
        .orderBy("window_start_ms", "item")),

    // RANGE-frame window: for every event, activity in the user's trailing
    // hour — a VALUE-based frame (range on epoch micros), not a row count,
    // so sparse and dense users get the same time semantics. One user
    // shuffle; the frame is evaluated by a sliding two-pointer over the
    // sorted partition, O(events) not O(events × frame).
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("cnt_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            .as("sum_1h"))
        .orderBy("user_id", "event_id")
    }),

    // Day-cohort retention matrix: cohort = each user's first active day
    // (unordered running min — one window over the same user shuffle), then
    // distinct (user, day) activity bucketed by day offset. Two shuffles
    // total (user, then cohort×offset), both on bounded keys.
    "q_cohort_retention" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
      t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("cohort_day", min("day").over(wu))
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("active_users"))
        .orderBy("cohort_day", "day_offset")
    }))

  private def cast_date(c: org.apache.spark.sql.Column) = c.cast("date")

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
         |  $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_bloom_join" ->
      s"""SELECT YEAR(o_orderdate) AS o_year, $revenueSql AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05
        |  AND l_quantity < 24""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rk,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rk""".stripMargin,

    "q_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_topk_agg" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_setops" ->
      """SELECT 'rich_no_orders' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
        |  EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'debt_buyer' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        |  INTERSECT SELECT o_custkey FROM orders)
        |ORDER BY tag, custkey""".stripMargin,

    "q_semi_anti" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer c
        |    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        |  (SELECT COUNT(*) FROM customer c
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin,

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_integrity_audit" ->
      """SELECT
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) AS lineitems_without_order,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN
        |    (SELECT l_orderkey FROM lineitem)) AS orders_without_lineitem,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)) AS orders_without_customer,
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
        |    (SELECT o_custkey FROM orders)) AS customers_without_order""".stripMargin,

    "q_event_transitions" ->
      """SELECT event_type AS from_type, next_type AS to_type,
        |  COUNT(*) AS n
        |FROM (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n DESC, from_type, to_type LIMIT 20""".stripMargin,

    "q_burst_hours" ->
      """WITH h AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
        |    CAST(SUM(c * c) AS BIGINT) AS q
        |  FROM h
        |)
        |SELECT hour, c, n * c - s AS excess_n
        |FROM h, st
        |WHERE n * c > s AND (n * c - s) * (n * c - s) > 4 * (n * q - s * s)
        |ORDER BY hour""".stripMargin,

    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sessionize_state" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ms,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "q_distinct_stats" ->
      """SELECT COUNT(DISTINCT l_partkey) AS parts, COUNT(DISTINCT l_suppkey) AS supps,
        |  COUNT(DISTINCT l_orderkey) AS orders_cnt, COUNT(*) AS rows_cnt
        |FROM lineitem""".stripMargin,

    "q_asof_join" ->
      """SELECT a.event_id, a.user_id,
        |  p.event_id AS asof_purchase_id, p.value AS asof_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') a
        |LEFT JOIN LATERAL (
        |  SELECT event_id, value FROM events b
        |  WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
        |    AND date_trunc('second', b.ts) <= date_trunc('second', a.ts)
        |  ORDER BY date_trunc('second', b.ts) DESC, event_id DESC LIMIT 1
        |) p ON TRUE
        |ORDER BY a.event_id""".stripMargin,

    // same lateral as-of, tolerance applied as a CASE over the matched gap
    "q_asof_tolerance" ->
      """SELECT a.event_id, a.user_id,
        |  CASE WHEN gap_sec <= 3600 THEN p_event_id END AS asof_purchase_id,
        |  CASE WHEN gap_sec <= 3600 THEN p_value END AS asof_purchase_value,
        |  CASE WHEN gap_sec <= 3600 THEN gap_sec END AS gap_sec
        |FROM (
        |  SELECT a.event_id, a.user_id, p.event_id AS p_event_id,
        |    p.value AS p_value,
        |    epoch_ms(date_trunc('second', a.ts)) // 1000
        |      - epoch_ms(p.p_t) // 1000 AS gap_sec
        |  FROM (SELECT * FROM events WHERE event_type = 'view') a
        |  LEFT JOIN LATERAL (
        |    SELECT event_id, value, date_trunc('second', b.ts) AS p_t
        |    FROM events b
        |    WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
        |      AND date_trunc('second', b.ts) <= date_trunc('second', a.ts)
        |    ORDER BY date_trunc('second', b.ts) DESC, event_id DESC LIMIT 1
        |  ) p ON TRUE
        |) a
        |ORDER BY a.event_id""".stripMargin,

    "q_asof_native" ->
      """SELECT a.event_id, a.user_id,
        |  p.event_id AS asof_purchase_id, p.value AS asof_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') a
        |LEFT JOIN LATERAL (
        |  SELECT event_id, value FROM events b
        |  WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
        |    AND date_trunc('second', b.ts) <= date_trunc('second', a.ts)
        |  ORDER BY date_trunc('second', b.ts) DESC, event_id DESC LIMIT 1
        |) p ON TRUE
        |ORDER BY a.event_id""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  lag(o_totalprice) OVER wseq AS prev_price,
        |  lead(o_totalprice) OVER wseq AS next_price,
        |  ntile(4) OVER wseq AS quartile,
        |  first_value(o_orderkey) OVER wseq AS first_key,
        |  nth_value(o_orderkey, 2) OVER wseq AS second_key,
        |  rank() OVER wtie AS date_rank,
        |  dense_rank() OVER wtie AS date_dense_rank,
        |  percent_rank() OVER wtie AS date_percent_rank,
        |  cume_dist() OVER wtie AS date_cume_dist
        |FROM orders
        |WHERE o_custkey % 50 = 0
        |WINDOW wseq AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey),
        |       wtie AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_subqueries" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT MAX(c_acctbal) FROM customer) / 2
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND c.c_custkey NOT IN (SELECT s_suppkey FROM supplier)
        |ORDER BY c_custkey""".stripMargin,

    "q_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(b AS INTEGER) AS band_id, b * 25.0 AS lo, b * 25.0 + 60.0 AS hi
        |  FROM range(0, 20) t(b))
        |SELECT band_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q_interval_merge" ->
      """WITH w AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS lo,
        |         ts + INTERVAL 4 HOUR AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT user_id, ts, value FROM events
        |  WHERE event_type IN ('click', 'view'))
        |SELECT purchase_id, COUNT(*) AS n_in_window,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM p JOIN w ON p.user_id = w.user_id AND p.ts >= w.lo AND p.ts < w.hi
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin,

    "q_interval_merge_outer" ->
      """WITH w AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS lo,
        |         ts + INTERVAL 4 HOUR AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type IN ('click', 'view'))
        |SELECT p.event_id, w.purchase_id
        |FROM p LEFT JOIN w ON p.user_id = w.user_id
        |  AND p.ts >= w.lo AND p.ts < w.hi
        |ORDER BY event_id, purchase_id""".stripMargin,

    "q_interval_overlap" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS plo,
        |         ts + INTERVAL 4 HOUR AS phi
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, event_id AS error_id, ts AS elo,
        |         ts + INTERVAL 4 HOUR AS ehi
        |  FROM events WHERE event_type = 'error')
        |SELECT purchase_id, error_id
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND GREATEST(plo, elo) < LEAST(phi, ehi)
        |ORDER BY purchase_id, error_id""".stripMargin,

    "q_funnel" ->
      """WITH e1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS first_view
        |  FROM events),
        |e2 AS (
        |  SELECT *,
        |    MIN(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS first_click
        |  FROM e1),
        |pu AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
        |    MAX(CASE WHEN event_type = 'click' AND ts > first_view THEN 1 ELSE 0 END) AS clicked,
        |    MAX(CASE WHEN event_type = 'purchase' AND ts > first_click THEN 1 ELSE 0 END) AS purchased
        |  FROM e2 GROUP BY 1),
        |agg AS (
        |  SELECT COUNT(*) AS users,
        |    CAST(SUM(viewed) AS BIGINT) AS n_view,
        |    CAST(SUM(clicked) AS BIGINT) AS n_view_click,
        |    CAST(SUM(purchased) AS BIGINT) AS n_view_click_purchase
        |  FROM pu)
        |SELECT users, n_view, n_view_click, n_view_click_purchase,
        |  FLOOR(n_view_click * 10000 / n_view) / 10000 AS cr_click,
        |  FLOOR(n_view_click_purchase * 10000 / n_view_click) / 10000 AS cr_purchase
        |FROM agg""".stripMargin,

    "q_funnel_state" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS tms,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |      WHEN 'purchase' THEN 2 ELSE -1 END AS step,
        |    (epoch_ms(ts) // 86400000) * 86400000 AS win
        |  FROM events),
        |f AS (SELECT * FROM e WHERE step >= 0),
        |a0 AS (
        |  SELECT user_id, win, MIN(tms) FILTER (step = 0) AS t0
        |  FROM f GROUP BY 1, 2),
        |a1 AS (
        |  SELECT f.user_id, f.win, ANY_VALUE(t0) AS t0,
        |    MIN(tms) FILTER (step = 1 AND tms > t0) AS t1
        |  FROM f JOIN a0 USING (user_id, win) GROUP BY 1, 2),
        |a2 AS (
        |  SELECT f.user_id, f.win, ANY_VALUE(t0) AS t0, ANY_VALUE(t1) AS t1,
        |    MIN(tms) FILTER (step = 2 AND t1 IS NOT NULL AND tms > t1) AS t2
        |  FROM f JOIN a1 USING (user_id, win) GROUP BY 1, 2)
        |SELECT user_id, win AS window_start_ms,
        |  CASE WHEN t0 IS NULL THEN 0 WHEN t1 IS NULL THEN 1
        |    WHEN t2 IS NULL THEN 2 ELSE 3 END AS completed,
        |  t0 AS t0_ms, t1 AS t1_ms, t2 AS t2_ms
        |FROM a2 WHERE t0 IS NOT NULL
        |ORDER BY user_id, window_start_ms""".stripMargin,

    "q_heavy_hitters_state" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
        |  event_type AS item, COUNT(*) AS count_lb
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start_ms, item""".stripMargin,

    "q_window_range" ->
      """SELECT user_id, event_id,
        |  COUNT(*) OVER w AS cnt_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH a AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |c AS (
        |  SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM a)
        |SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
