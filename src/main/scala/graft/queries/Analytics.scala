package graft.queries

import graft.ext.Multimodal
import graft.ops.RowNumbers
import graft.streaming.StreamingIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytical, windowed/streaming-semantics, and multimodal queries.
  *
  * The join queries are the bench workhorses. Broadcast hints appear ONLY on
  * relations whose size does not grow with the data (nation/region, supplier,
  * tightly filtered key projections); anything fact-scale (orders, customer,
  * per-partkey aggregates) is left to AQE, which may broadcast at small SF
  * from runtime stats but must shuffle-join at 100 TB. Aggregates use exact
  * DECIMAL sums cast to DOUBLE at the end, and every output has a total
  * deterministic order.
  */
object Analytics {
  import Tables.t

  private def revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    .cast("decimal(25,6)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 flavor: shipping priority
    "q3_shipping_priority" -> ((s, dir) => {
      // broadcast sides projected to join+output columns only — the
      // broadcast payload is what every executor must hold in memory
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // orders is fact-scale — no broadcast hint; AQE picks the join
      // strategy from runtime sizes. cust is a one-column projection of a
      // 1/5-selectivity dimension filter: broadcast-safe.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 flavor: local supplier volume per nation
    "q5_local_supplier" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region").where(col("r_name") === "ASIA")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1994-01-01").cast("timestamp"))
        .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        // customer grows with SF (15M rows at sf100) — shuffle join; the
        // o_custkey side is already shuffled from the orders join
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q10 flavor: top returned-revenue customers
    "q10_returned_items" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      // orders and customer are both fact/SF-scale — no broadcast hints;
      // at 100 TB these must be shuffle joins (AQE may still pick broadcast
      // at small SF from runtime stats, which is exactly the point)
      t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // pivot: event types to columns (portable oracle via conditional agg)
    "q_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // top-k per group via partitioned window
    "q_topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
      // the IS NOT NULL filter on the LEAF attributes is the declared
      // precondition that lets TopKWindowRewrite prove the window≡aggregate
      // equivalence from the plan's constraints (parquet columns are
      // nullable; null scores would rank after non-null ones in the window
      // but are dropped by the bounded aggregate) — PlanSpec asserts the
      // rewrite actually fires here
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .where(col("value").isNotNull && col("event_id").isNotNull)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .orderBy("user_id", "rnk")
    }),

    // semi + anti joins: high-value customers with/without urgent orders
    "q_semi_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").where(col("c_acctbal") > 9000)
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val semi = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(true).as("has_urgent"))
      val anti = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(false).as("has_urgent"))
      semi.unionByName(anti).orderBy("c_custkey")
    }),

    // correlated aggregate (TPC-H Q17 flavor): small-quantity order revenue
    "q17_small_quantity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy("l_partkey")
        .agg((sum(col("l_quantity").cast("decimal(20,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      // partAvg has one row per l_partkey (20M at sf100) — never broadcast;
      // both sides hash-partition on l_partkey so the join co-locates with
      // the aggregation's own shuffle
      li.join(partAvg, "l_partkey")
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(20,2)")).cast("double") / lit(7.0))
          .as("avg_yearly"))
    }),

    // multi-level rollup aggregation (grand totals + subtotals, one pass)
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"))
        .select(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("g_flag", "g_status", "flag", "status")),

    // CUBE: all grouping-set combinations in one pass (complements rollup)
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"))
        .select(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("g_flag", "g_status", "flag", "status")),

    // explicit GROUPING SETS (the general form cube/rollup compile to):
    // the two single-dimension marginals plus the grand total, skipping
    // the 2-D cells a cube would also emit — same Expand-based plan with
    // one replicated row per REQUESTED set only
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping(col("o_orderpriority")).as("g_pri"),
          grouping(col("o_orderstatus")).as("g_status"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,2)")).cast("double").as("sum_price"))
        .select(col("g_pri"), col("g_status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("sum_price"))
        .orderBy("g_pri", "g_status", "priority", "status")),

    // correlation assembled from exact decimal component sums (n, Σx, Σy,
    // Σxy, Σx², Σy²) cast to double only for the final closed-form —
    // Spark's corr() and DuckDB's disagree in the last ulps because their
    // streaming-update orders differ; component sums are order-free
    "q_corr" -> ((s, dir) => {
      val x = col("l_quantity").cast("decimal(20,2)")
      val y = col("l_extendedprice").cast("decimal(20,2)")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("cn"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum((x * y).cast("decimal(30,4)")).cast("double").as("sxy"),
          sum((x * x).cast("decimal(30,4)")).cast("double").as("sxx"),
          sum((y * y).cast("decimal(30,4)")).cast("double").as("syy"))
        .select(col("l_returnflag"),
          ((col("cn") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("cn") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("cn") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // ntile quartiles within each priority class. A window partitioned by
    // the 5-value priority key would give 5 tasks, each sorting/buffering
    // 1/5 of orders — "parallel" in name only at 100×. Instead: gap-free
    // global row numbers over a RANGE sort on (priority, price, key) —
    // parallel across the whole table — then per-class rank r = _id −
    // first(_id in class) from a 5-row broadcast agg, and the exact
    // ntile(4) formula (first n%4 tiles take ⌈n/4⌉ rows) applied as a
    // narrow projection. No task ever holds more than its range slice.
    "q_ntile" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val rn = RowNumbers.withRowNumbersOrdered(base,
        Seq(col("o_orderpriority").asc, col("o_totalprice").asc,
          col("o_orderkey").asc))
      val extents = rn.groupBy("o_orderpriority")
        .agg(min(col("_id")).as("g_start"), count(lit(1)).as("g_n"))
      def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        call_function("div", a, b)
      val qSize = idiv(col("g_n"), lit(4L))
      val rem = col("g_n") % 4
      val cut = rem * (qSize + 1) // rows covered by the ⌈n/4⌉-sized tiles
      val r = col("_id") - col("g_start") + 1
      rn.join(broadcast(extents), Seq("o_orderpriority"))
        .withColumn("quartile",
          when(r <= cut, idiv(r - 1, qSize + 1) + 1)
            .otherwise(rem + idiv(r - cut - 1, greatest(qSize, lit(1L))) + 1)
            .cast("int"))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,2)")).cast("double").as("sum_price"))
        .orderBy("o_orderpriority", "quartile")
    }),

    // lag/lead: per-user inter-event gap and next event type (keyed window,
    // scales with users × events-per-user, no global sort)
    "q_lag_lead" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("event_id").asc)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("us"), col("event_type"))
        .withColumn("prev_gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select("event_id", "user_id", "prev_gap_us", "next_type")
        .orderBy("event_id")
    }),

    // exact percentiles (sort-based; both engines interpolate identically).
    // Gate runs the EXACT tier of ops.Percentiles for the bit-for-bit
    // oracle; production at 100 TB uses the approx (Greenwald-Khanna
    // sketch) tier — exact percentile buffers every group value in one
    // executor map, an OOM with 5 groups at scale (PercentilesSpec asserts
    // the sketch tier plans without that buffering aggregate).
    "q_percentiles" -> ((s, dir) =>
      graft.ops.Percentiles.grouped(
        t(s, dir, "orders"), Seq("o_orderpriority"), "o_totalprice",
        Seq("p50" -> 0.5, "p90" -> 0.9), exact = true)
        .orderBy("o_orderpriority")),

    // windowed running total (partitioned analytic window — no global sort)
    "w_running_total" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, dir, "orders").where(col("o_custkey") < 100)
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(20,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE-frame rolling window: each order's trailing-7-day spend for the
    // same customer — a time-based frame (peers by value, not row count),
    // partitioned per customer so there is no global sort; exact decimal
    // sum, double only at the output
    "q_rolling_range" -> ((s, dir) => {
      // frame dimension = day number since epoch (orderdates are midnight
      // NTZ timestamps, so day granularity is exact and timezone-free)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
      t(s, dir, "orders").where(col("o_custkey") < 300)
        .withColumn("rolling_7d",
          sum(col("o_totalprice").cast("decimal(20,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "rolling_7d")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // streaming-semantics windows (same functions serve readStream inputs)
    "stream_tumbling_hour" -> ((s, dir) =>
      StreamingIngest.tumblingAgg(
        Tables.events(s, dir), "ts_us", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(20,2)")).cast("double").as("sum_value")))
        .orderBy("window_start", "event_type")),

    "stream_sliding_window" -> ((s, dir) =>
      StreamingIngest.slidingAgg(
        Tables.events(s, dir), "ts_us", "1 hour", "30 minutes", Seq("event_type"),
        Seq(count(lit(1)).as("n_events")))
        .orderBy("window_start", "event_type")),

    "stream_session_window" -> ((s, dir) =>
      StreamingIngest.sessionAgg(
        Tables.events(s, dir), "ts_us", "30 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n_events")))
        .orderBy("user_id", "session_start")),

    "stream_heavy_hitters" -> ((s, dir) =>
      // hot-key report per tumbling hour: top-5 users by event count with
      // exact integer traffic share — the live skew/abuse signal (bounded
      // graft_topk rank; StreamingQualitySpec proves the incremental
      // count-state path ranks identically)
      StreamingIngest.heavyHitters(
        Tables.events(s, dir), "ts_us", "1 hour", "user_id", k = 5)
        .orderBy("window_start", "rank")),

    // multimodal: binary payload + partition-wise decode (stubbed codec)
    "ext_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        t(s, dir, "documents").select("doc_id", "text"), "doc_id", "text")
        .toDF().orderBy("doc_id")),

    // TPC-H Q6 flavor: scan-only filter+agg — the pushdown benchmark (all
    // four predicates and the two-column projection must reach the parquet
    // reader; no join, no shuffle beyond the final partial-agg merge)
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(25,6)"))
          .cast("double").as("revenue"))),

    // TPC-H Q14 flavor: promo revenue share. part scales with SF (20M rows
    // at sf100) — no broadcast hint; the ratio is computed from two exact
    // decimal sums in one aggregation pass
    "q14_promo_revenue" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast("decimal(25,6)"))).cast("double")
            .as("promo_revenue"),
          sum(revenue).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_pct"))
    }),

    // TPC-H Q19 flavor: disjunction of brand/size/quantity bands. The
    // cross-side OR can't be pushed as-is, so each side is pre-filtered
    // with the UNION of its arms (part: brand∈{...} ∧ size≤15; lineitem:
    // 1≤qty≤30) before the join — the join input shrinks ~10× and the
    // exact disjunction runs post-join on the survivors
    "q19_brand_bands" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#24") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      val li = t(s, dir, "lineitem")
        .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      li.join(part, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#24" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15)))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // interval join via binning: clicks inside each purchase's 10-minute
    // attribution window — big×big inequality join planned as an equi
    // shuffle join (ops/RangeJoin), never a nested loop
    "ext_range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"),
        expr("ts div 1000").as("us"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("us").as("click_us"))
      val windows = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("us").as("lo"),
          (col("us") + lit(600000000L)).as("hi"))
      graft.ops.RangeJoin
        .binnedRangeJoin(clicks, windows, "click_us", "lo", "hi", 600000000L)
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("purchase_id")
    }),

    // TPC-H Q18 flavor: HAVING over a keyed aggregate, then join back to
    // the fact rows. The big-orders key set is derived FROM the aggregate
    // (bounded by the having-filter), joined back on the already-shuffled
    // key — no broadcast hints anywhere
    "q18_big_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("qty"))
        .where(col("qty") > 150)
        .select(col("l_orderkey"), col("qty").cast("double").as("total_qty"))
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q13 flavor: customer order-count distribution. The left outer
    // join and the per-customer count share one shuffle (both keyed on the
    // customer key); the second aggregate reduces to #distinct-counts rows
    "q13_customer_distribution" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q7 flavor: cross-nation shipping volume by year, both
    // directions of one nation pair. nation is fixed-size (25 rows) —
    // broadcast twice under different aliases; the pair filter applies
    // post-join on the two broadcast nations, everything fact-scale
    // shuffles on its join key
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenue).cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q15 flavor: top supplier(s) by quarterly revenue. The max is
    // taken over the (one row per supplier) revenue aggregate and joined
    // back as a 1-row broadcast; revenue stays DECIMAL through the
    // equality so ties are exact, and only the output casts to double
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(revenue).as("r"))
      val mx = rev.agg(max(col("r")).as("mx"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_name")
      rev.join(broadcast(mx), col("r") === col("mx"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("r").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q4 flavor: orders (one quarter) with at least one line shipped
    // more than 60 days after the order date, counted per priority. The
    // EXISTS is a left-semi join with the inequality folded into the join
    // condition — each order counts once however many lines are late
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q22 flavor: dormant capital — customers above the average
    // positive balance with no RECENT order (none since 1999), grouped by
    // TPC-H Q8 flavor: national market share — NATION_1's share of
    // AMERICA-region revenue for PROMO parts by order year. The two-nation
    // role-play (customer region filter vs supplier nationality) joins
    // nation twice; nation/region/supplier are bounded dims (hinted),
    // part is SF-scale so its filtered key projection joins via AQE.
    // Share = exact decimal sums, divided as double at the very end.
    "q8_market_share" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .where(col("p_type") === "PROMO").select("p_partkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val region = t(s, dir, "region")
        .where(col("r_name") === "AMERICA").select("r_regionkey")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(part, col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", revenue)
            .otherwise(lit(0).cast("decimal(25,6)"))).as("nat"),
          sum(revenue).as("tot"))
        .select(col("o_year"),
          (col("nat").cast("double") / col("tot").cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 flavor (this schema carries no partsupp, so profit =
    // revenue without supply cost): revenue from '%red%' parts by
    // supplier nation and order year. p_name's substring predicate pushes
    // to the part scan as StringContains; the part keys then join
    // unhinted (SF-scale), nation/supplier broadcast.
    "q9_product_profit" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .where(col("p_name").contains("red")).select("p_partkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("nation"))
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(part, col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("s_nkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(revenue).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // nation. The global average is a 1-row broadcast (exact decimal
    // parts, double at the end); the lapsed test is a left-anti join on
    // the customer key against the date-filtered order keys
    "q22_dormant_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val avgBal = cust.where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(20,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
      cust.join(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(20,2)")).cast("double").as("totacctbal"))
        .orderBy("n_name")
    }),

    // TPC-H Q2 flavor (no partsupp table in this schema — the offer book
    // is the distinct (part, supplier) relation of lineitem, offer price =
    // that supplier's cheapest extended price): per size-15 part, the
    // cheapest EUROPE supplier. The classic correlated min-subquery runs
    // as a per-part min aggregate joined back on (part, offer), lowest
    // s_suppkey on ties — never a window
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eu = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
      val offers = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice").cast("decimal(20,2)")).as("offer"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      val best = offers.groupBy(col("l_partkey"))
        .agg(min(col("offer")).as("best_offer"))
      offers
        .join(best, Seq("l_partkey"))
        .where(col("offer") === col("best_offer"))
        .groupBy(col("l_partkey"), col("best_offer"))
        .agg(min(col("s_suppkey")).as("s_suppkey"))
        .join(broadcast(t(s, dir, "part").where(col("p_size") === 15)
          .select("p_partkey", "p_name")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), "s_suppkey")
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          col("best_offer").cast("double").as("offer"))
        .orderBy("p_partkey")
    }),

    // TPC-H Q11 flavor: per-part shipped value from ASIA suppliers,
    // HAVING value > 0.1% of the ASIA total — the global scalar lands as
    // a broadcast one-row cross join, the threshold compare stays in
    // exact decimals (value × 1000 vs total: integer-scaled, no
    // decimal/double division)
    "q11_important_parts" -> ((s, dir) => {
      val asia = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val shipped = t(s, dir, "lineitem")
        .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"))
      val byPart = shipped.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(25,2)")).as("val_dec"))
      val total = shipped
        .agg(sum(col("l_extendedprice").cast("decimal(25,2)")).as("total_dec"))
      byPart.join(broadcast(total))
        .where(col("val_dec") * 1000 > col("total_dec"))
        .select(col("l_partkey").as("p_partkey"),
          col("val_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    }),

    // TPC-H Q12 flavor (no l_shipmode/l_commitdate in this schema):
    // lineitems classed by ship latency (days from order date), counting
    // critical- vs normal-priority ORDERS per class — one fact join, one
    // conditional aggregate
    "q12_ship_latency" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        .join(t(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("latency_class",
          when(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) < 30, "1_fast")
            .when(datediff(to_date(col("l_shipdate")),
              to_date(col("o_orderdate"))) < 90, "2_medium")
            .otherwise("3_slow"))
        .groupBy("latency_class")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("latency_class")),

    // TPC-H Q16 flavor: how many suppliers offer each (brand, type, size)
    // combination, excluding one brand, a size set, and "complaint"
    // suppliers (negative balance — the NOT IN subquery runs as a
    // broadcast anti join, never a distinct-then-NOT-contains)
    "q16_supplier_cnt" -> ((s, dir) => {
      val complaints = t(s, dir, "supplier")
        .where(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(t(s, dir, "part")
          .where(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(complaints),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 flavor: AMERICA suppliers who DOMINATE the supply of a
    // red part — shipped more than 2× their fair share of the part's
    // total quantity (the availqty>half-demand correlation, rebuilt on
    // the shipment relation; fair-share-relative so the predicate stays
    // selective-but-nonempty at every SF). The ratio compares as
    // supp·n_supp > 2·total in exact decimal×int products — no division;
    // the supplier screen is a semi join
    "q20_dominant_suppliers" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .where(col("p_name").startsWith("red"))
        .select("p_partkey")
      val redShip = t(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      val perSupp = redShip.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("supp_qty"))
      val perPart = redShip.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("part_qty"),
          countDistinct(col("l_suppkey")).as("n_supp"))
      val dominant = perSupp.join(perPart, "l_partkey")
        .where(col("supp_qty") * col("n_supp") > col("part_qty") * 2)
        .select("l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .where(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 flavor (late = shipped >60 days after the order date):
    // suppliers who were the ONLY late shipper on a finished
    // multi-supplier order — the exists(other supplier) is a semi join,
    // the not-exists(other LATE supplier) an anti join, both on the
    // order key; no window, no distinct-collect
    "q21_waiting_suppliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val pairs = li.select("l_orderkey", "l_suppkey").distinct()
      val latePairs = li.where(col("late"))
        .select("l_orderkey", "l_suppkey").distinct()
      val others = pairs
        .select(col("l_orderkey").as("o_key"), col("l_suppkey").as("o_supp"))
      val lateOthers = latePairs
        .select(col("l_orderkey").as("o_key"), col("l_suppkey").as("o_supp"))
      latePairs
        .join(others, col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("o_supp"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("o_supp"), "left_anti")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    }),

    // cohort retention: users cohorted by first-event week, active-user
    // counts per (cohort, week offset). The first-event aggregate and the
    // join back both shuffle on user_id (co-partitioned — one exchange of
    // each side); the output grid is weeks², tiny at any scale
    "q_rolling_anomaly" -> ((s, dir) => {
      // exact rolling z-score anomaly flags per event type (3σ over the
      // trailing 50 observations): the flag is an integer discriminant
      // comparison — no mean, no sqrt, no float accumulation — so the
      // oracle replays it bit-for-bit
      val e = Tables.events(s, dir).select(col("event_id"),
        col("event_type"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.TimeSeries.rollingAnomalies(e, "event_type",
          Seq(col("us"), col("event_id")), "cents", window = 50, tNum = 3)
        .select("event_type", "event_id", "us", "cents", "n", "flag")
        .orderBy("event_type", "us", "event_id")
    }),

    "q_funnel" -> ((s, dir) => {
      // ordered view→click→purchase funnel per user: the filtered event
      // stream shuffles ONCE on user, each user folds its time-sorted
      // events — provably equal to the min-chain SQL funnel the oracle
      // runs (stage k+1 = first next-step event strictly after t_k)
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts div 1000").as("us"),
          col("event_type"))
      graft.ops.TimeSeries.funnel(e, "user_id", "us", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    "q_cohort_retention" -> ((s, dir) => {
      val wk = 604800000000L // 7 days in µs
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts div 1000").as("us"))
      val first = e.groupBy("user_id").agg(min("us").as("first_us"))
      e.join(first, "user_id")
        .groupBy(expr(s"first_us div $wk").as("cohort_week"),
          expr(s"us div $wk - first_us div $wk").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // set operations (§2.7 beyond UNION): INTERSECT and EXCEPT on customer
    // key sets — distinct-semantics set ops, one shuffle each
    "q_set_ops" -> ((s, dir) => {
      val building = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val rich = t(s, dir, "customer")
        .where(col("c_acctbal") > 8000).select("c_custkey")
      val both = building.intersect(rich)
        .select(col("c_custkey"), lit("both").as("which"))
      val onlyB = building.except(rich)
        .select(col("c_custkey"), lit("building_only").as("which"))
      both.unionByName(onlyB).orderBy("which", "c_custkey")
    }),

    // ordered funnel: signup → later click → later purchase, per user.
    // Three keyed min-aggregations chained by join — every stage shuffles
    // on user_id so AQE co-locates them; no window over the full event log
    "ext_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
        expr("ts div 1000").as("us"), col("event_type"))
      val s1 = e.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val s2 = e.where(col("event_type") === "click").join(s1, "user_id")
        .where(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"))
      val s3 = e.where(col("event_type") === "purchase").join(s2, "user_id")
        .where(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
        .join(s3.select("user_id", "t3"), Seq("user_id"), "left")
        .agg(count(lit(1)).as("signup_users"),
          count(col("t2")).as("click_after_signup"),
          count(col("t3")).as("purchase_after_click"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_topk_per_group" ->
      """SELECT user_id, event_id, value, rnk FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,

    "q_semi_anti_join" ->
      """SELECT c_custkey, TRUE AS has_urgent FROM customer c
        |WHERE c_acctbal > 9000 AND EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, FALSE FROM customer c
        |WHERE c_acctbal > 9000 AND NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q17_small_quantity" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN pa ON lineitem.l_partkey = pa.l_partkey
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,

    "q_rollup" ->
      """SELECT grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        |  COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,

    "q_cube" ->
      """SELECT grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        |  COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,

    "q_grouping_sets" ->
      """SELECT grouping(o_orderpriority) AS g_pri, grouping(o_orderstatus) AS g_status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_pri, g_status, priority, status""".stripMargin,

    "q_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS cn,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_quantity AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  (cn * sxy - sx * sy) /
        |    (sqrt(cn * sxx - sx * sx) * sqrt(cn * syy - sy * sy)) AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_ntile" ->
      """WITH q AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(4) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, quartile, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price
        |FROM q GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,

    "q_lag_lead" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS us, event_type
        |  FROM events)
        |SELECT event_id, user_id,
        |  us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS prev_gap_us,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS next_type
        |FROM e ORDER BY event_id""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "w_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rolling_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch_ns(o_orderdate)//86400000000000
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
        |FROM orders WHERE o_custkey < 300
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "stream_tumbling_hour" ->
      """WITH e AS (SELECT epoch_ns(ts)//1000 AS us, event_type, value FROM events)
        |SELECT make_timestamp(us - us % 3600000000) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "stream_sliding_window" ->
      """WITH e AS (SELECT epoch_ns(ts)//1000 AS us, event_type FROM events),
        |w AS (SELECT make_timestamp((us - us % 1800000000) - k * 1800000000) AS window_start,
        |             event_type
        |      FROM e CROSS JOIN (VALUES (0::BIGINT), (1::BIGINT)) k(k))
        |SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "stream_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
        |o AS (SELECT user_id, us,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |               OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, us,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM o)
        |SELECT make_timestamp(MIN(us)) AS session_start, user_id, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "stream_heavy_hitters" ->
      """WITH e AS (SELECT epoch_ns(ts)//1000 AS us, user_id FROM events),
        |c AS (SELECT make_timestamp(us - us % 3600000000) AS window_start,
        |             user_id, COUNT(*) AS n
        |      FROM e GROUP BY 1, 2),
        |tot AS (SELECT window_start, CAST(SUM(n) AS BIGINT) AS n_window
        |        FROM c GROUP BY 1),
        |r AS (SELECT window_start, user_id, n,
        |        row_number() OVER (PARTITION BY window_start
        |          ORDER BY n DESC, user_id ASC) AS rank
        |      FROM c)
        |SELECT r.window_start, r.user_id, r.rank, CAST(r.n AS BIGINT) AS n,
        |  tot.n_window, (CAST(r.n AS BIGINT) * 1000000) // tot.n_window AS share_ppm
        |FROM r JOIN tot USING (window_start) WHERE r.rank <= 5
        |ORDER BY window_start, rank""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_revenue" ->
      """WITH j AS (
        |  SELECT p_type, CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6)) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) AS promo_revenue,
        |    CAST(SUM(rev) AS DOUBLE) AS total_revenue
        |  FROM j)
        |SELECT promo_revenue, total_revenue,
        |  100.0 * promo_revenue / total_revenue AS promo_pct
        |FROM a""".stripMargin,

    "q19_brand_bands" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#24' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(20,2))) AS qty
        |  FROM lineitem GROUP BY l_orderkey HAVING qty > 150)
        |SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |  CAST(qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_rolling_anomaly" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ns(ts)//1000 AS us,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_type, event_id, us, cents,
        |        SUM(CAST(cents AS HUGEINT)) OVER fr AS s,
        |        SUM(CAST(cents AS HUGEINT) * cents) OVER fr AS q,
        |        CAST(COUNT(*) OVER fr AS HUGEINT) AS n
        |      FROM e
        |      WINDOW fr AS (PARTITION BY event_type ORDER BY us, event_id
        |                    ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, us, cents, CAST(n AS BIGINT) AS n,
        |  (n >= 2 AND
        |   (n * cents - s) * (n * cents - s) * 1 > 9 * (n * q - s * s)) AS flag
        |FROM w ORDER BY event_type, us, event_id""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us, event_type
        |           FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(us) AS t FROM e
        |       JOIN t1 ON t1.user_id = e.user_id
        |       WHERE event_type = 'click' AND us > t1.t GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(us) AS t FROM e
        |       JOIN t2 ON t2.user_id = e.user_id
        |       WHERE event_type = 'purchase' AND us > t2.t GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e
        |      WHERE event_type IN ('view', 'click', 'purchase'))
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.t IS NOT NULL THEN 3
        |            WHEN t2.t IS NOT NULL THEN 2
        |            WHEN t1.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  COALESCE(t3.t, t2.t, t1.t) AS t_last
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |  LEFT JOIN t3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
        |f AS (SELECT user_id, MIN(us) AS first_us FROM e GROUP BY user_id)
        |SELECT f.first_us//604800000000 AS cohort_week,
        |  e.us//604800000000 - f.first_us//604800000000 AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS active_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q13_customer_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist FROM co
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT MAX(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
        |    THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))
        |    ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE contains(p_name, 'red')
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin,

    "q22_dormant_customers" ->
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE) AS totacctbal
        |FROM customer CROSS JOIN ab
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(20,2))) AS offer
        |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
        |  GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT l_partkey, MIN(offer) AS best_offer
        |  FROM offers GROUP BY l_partkey),
        |win AS (
        |  SELECT o.l_partkey, b.best_offer, MIN(o.l_suppkey) AS s_suppkey
        |  FROM offers o JOIN best b
        |    ON o.l_partkey = b.l_partkey AND o.offer = b.best_offer
        |  GROUP BY o.l_partkey, b.best_offer)
        |SELECT p_partkey, p_name, w.s_suppkey, eu.s_name, eu.n_name,
        |  CAST(w.best_offer AS DOUBLE) AS offer
        |FROM win w
        |JOIN part ON w.l_partkey = p_partkey AND p_size = 15
        |JOIN eu ON w.s_suppkey = eu.s_suppkey
        |ORDER BY p_partkey""".stripMargin,

    "q11_important_parts" ->
      """WITH asia AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
        |shipped AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(25,2)) AS p
        |  FROM lineitem JOIN asia ON l_suppkey = s_suppkey),
        |by_part AS (
        |  SELECT l_partkey, SUM(p) AS val_dec FROM shipped GROUP BY l_partkey),
        |total AS (SELECT SUM(p) AS total_dec FROM shipped)
        |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS value
        |FROM by_part CROSS JOIN total
        |WHERE val_dec * 1000 > total_dec
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "q12_ship_latency" ->
      """SELECT
        |  CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) < 30 THEN '1_fast'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) < 90 THEN '2_medium'
        |    ELSE '3_slow' END AS latency_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY latency_class ORDER BY latency_class""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH red_ship AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(20,2)) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'),
        |per_supp AS (
        |  SELECT l_partkey, l_suppkey, SUM(q) AS supp_qty
        |  FROM red_ship GROUP BY l_partkey, l_suppkey),
        |per_part AS (
        |  SELECT l_partkey, SUM(q) AS part_qty,
        |    COUNT(DISTINCT l_suppkey) AS n_supp
        |  FROM red_ship GROUP BY l_partkey),
        |dominant AS (
        |  SELECT DISTINCT s.l_suppkey
        |  FROM per_supp s JOIN per_part p ON s.l_partkey = p.l_partkey
        |  WHERE s.supp_qty * p.n_supp > p.part_qty * 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li),
        |late_pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM late_pairs lp
        |JOIN supplier ON lp.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM pairs p
        |    WHERE p.l_orderkey = lp.l_orderkey AND p.l_suppkey <> lp.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late_pairs lo
        |    WHERE lo.l_orderkey = lp.l_orderkey AND lo.l_suppkey <> lp.l_suppkey)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    "q_set_ops" ->
      """WITH building AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
        |SELECT c_custkey, 'both' AS which
        |FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
        |UNION ALL
        |SELECT c_custkey, 'building_only' AS which
        |FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
        |ORDER BY which, c_custkey""".stripMargin,

    "ext_range_join" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS us, event_type FROM events),
        |c AS (SELECT us AS click_us FROM e WHERE event_type = 'click'),
        |w AS (SELECT event_id AS purchase_id, us AS lo, us + 600000000 AS hi
        |      FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, COUNT(*) AS n_clicks
        |FROM c JOIN w ON click_us >= lo AND click_us < hi
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin,

    "ext_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        |SELECT COUNT(*) AS signup_users, COUNT(t2) AS click_after_signup,
        |  COUNT(t3) AS purchase_after_click
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    "ext_multimodal_features" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
        |  3 AS channels,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 30 ELSE 1 END AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
