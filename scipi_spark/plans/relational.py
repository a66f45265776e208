"""General relational query surface over the TPC-H-ish test tables.

The reference's own relational footprint is narrow (equi-joins, groupBy,
filter/sort/limit — SURVEY §2.7); this module widens the engine to the
standard analytics surface (multi-join aggregations, window functions,
rollup, distinct aggregates, semi/anti joins, set operations, JSON
extraction) — all declarative Catalyst plans, used both as correctness
entries and as the bench headliners.

Plan hygiene per query (verified via .explain):
- filters land on the parquet scan (PushedFilters), scans read only the
  projected columns (ReadSchema)
- dimension joins (region/nation/supplier/part) broadcast; only fact-fact
  joins shuffle
- aggregations are partial (map-side) before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scipi_spark.sources.tables import load_events, load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy aggregation; the whole query is one partial+
    final hash aggregate over a pruned 7-column scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3-style: customer (broadcast) ⋈ orders ⋈ lineitem, top-10
    unshipped orders by revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == segment
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: five-table join where every dimension broadcasts;
    the only shuffle is lineitem⋈orders and the final 5-row aggregate."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan+filter+agg — every predicate reaches the
    parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS as a left-semi join — orders in 1996Q1 with
    at least one returned lineitem, counted by priority.  The semi join
    never materializes lineitem columns, so the probe side is build-only."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str, n: int = 20) -> DataFrame:
    """TPC-H Q10-style: top customers by revenue lost to returns — one
    fact-fact shuffle join, customer/nation broadcast, TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(n)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: two-level aggregation over a left outer join —
    distribution of customers by how many non-low-priority orders they
    placed (0 included via the outer join)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17-style: correlated avg subquery done as ONE pass — a
    window avg over l_partkey instead of the textbook agg-then-self-join,
    halving the shuffles (the window's exchange is the only one)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == brand
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 200.0, n: int = 100
) -> DataFrame:
    """TPC-H Q18-style: HAVING on a fact aggregate, then join the survivors
    back to orders/customer.  The aggregate output is tiny (<0.2% of
    orders), so the join back to orders co-partitions on the same key and
    customer broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(n)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunction of conjunctive range predicates across
    both join sides — Catalyst extracts the common l_quantity bounds and
    pushes them to the scan; part broadcasts."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(clause).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: one fact-fact join + conditional aggregation."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: broadcast dimension join + ratio of conditional
    sums (single global aggregate)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.upper(F.col("p_type")).startswith("PROMO")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(promo, rev).otherwise(0.0)) * 100.0 / F.sum(rev), 6
            ).alias("promo_share_pct")
        )
    )


def cube_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("volume"),
    )


def window_top_orders_per_customer(
    spark: SparkSession, sf_dir: str, n: int = 3
) -> DataFrame:
    """Ranking window: top-n orders by totalprice per customer, with the
    customer's running order count — rank + cumulative window in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w_rank).alias("rk"),
        )
        .filter(F.col("rk") <= n)
    )


def window_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth: per customer order sequence with rank,
    lag/lead order values, and delta vs the previous order — one window
    pass, no self-join."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("order_seq"),
        F.round("o_totalprice", 2).alias("price"),
        F.round(prev, 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(prev, F.lit(0.0)), 2).alias(
            "delta_vs_prev"
        ),
    )


def window_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, each order's trailing-90-day
    order count and revenue. The frame is VALUE-based (all orders whose
    date falls in the interval, ties included wholesale), not row-based —
    rangeBetween over a day-number key (timestamps don't cast to numeric
    directly), the Spark spelling of RANGE BETWEEN INTERVAL '90 days'
    PRECEDING AND CURRENT ROW — both bounds inclusive on whole days.
    One hash partition on the customer + one in-partition sort serves
    both aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(days).rangeBetween(-90, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_90d"),
    )


def rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: order counts and volume by
    (status, priority) with rollup subtotals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("volume"),
        )
    )


def distinct_agg_supplier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates: per supplier, #distinct parts and #distinct
    orders served plus total quantity (two distincts + one plain agg in a
    single pass — Catalyst expands distincts)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface: per market segment, customers WITH orders
    (left_semi) and customers WITHOUT orders (left_anti)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("with_orders"))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("without_orders"))
    )
    return with_orders.unionByName(without)


def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface: nations that have customers vs nations
    that have suppliers."""
    cust_nations = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp_nations = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn(
        "kind", F.lit("both")
    )
    cust_only = cust_nations.exceptAll(supp_nations).withColumn(
        "kind", F.lit("customers_only")
    )
    return both.unionByName(cust_only)


def events_sessionize(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Batch sessionization: per-user sessions closed after ``gap`` of
    inactivity (the batch twin of streaming.session_window_stats; the
    DuckDB oracle is the classic gaps-and-islands rewrite)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of value per event type (the exact
    twin of the approx-sketch path)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-user sketch per event type, self-verified: the
    sketch value itself is engine-specific (no cross-engine oracle
    exists), so the query emits the EXACT distinct count (oracle-able)
    plus a boolean asserting the sketch landed within 3x the requested
    rsd — the driver gate then catches sketch regressions through the
    deterministic columns. At scale only the sketch aggregation runs
    (one pass, fixed memory); the exact twin here is the verification
    harness, not the production path."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            (
                F.abs(
                    F.approx_count_distinct("user_id", rsd=0.02)
                    - F.count_distinct("user_id")
                )
                / F.count_distinct("user_id")
            )
            <= 0.06
        ).alias("sketch_within_bounds"),
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation over the event stream: per user, recency
    (days since last event, against the corpus max timestamp), frequency
    (event count) and monetary (value sum), each cut into terciles by
    percent_rank with a user-id tie-break — the classic behavioral
    segmentation (champions / at-risk / hibernating read directly off
    the (r, f, m) triple).

    One (user) aggregation is the only event-sized shuffle; the corpus
    max-timestamp is a 1-row aggregate broadcast back; each tercile is
    an exact distributed percent_rank (range-sliced + tiny offset table,
    :mod:`scipi_spark.operators.ranking`) over the per-user rows — with
    10⁸–10⁹ users an unpartitioned ``percent_rank`` window would be a
    single-reducer sort ×3, so none is used. The per-user base is
    localCheckpoint-ed once and the three rank results join back on the
    user key."""
    from scipi_spark.operators.ranking import with_percent_rank

    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    corpus_max = ev.agg(F.max("ts").alias("max_ts"))
    base = (
        per_user.crossJoin(F.broadcast(corpus_max))
        .select(
            "user_id",
            F.datediff(F.col("max_ts"), F.col("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=True)
    )

    def tercile(col: str, asc: bool, out: str):
        # best tercile = 3: recent (small recency), frequent, high spend
        ranked = with_percent_rank(
            base.select("user_id", col),
            order_cols=[(col, asc), ("user_id", True)],
            out_col="__pr",
        )
        return ranked.select(
            "user_id",
            F.when(F.col("__pr") < F.lit(1.0) / 3, 3)
            .when(F.col("__pr") < F.lit(2.0) / 3, 2)
            .otherwise(1)
            .cast("int")
            .alias(out),
        )

    return (
        base.join(tercile("recency_days", True, "r_score"), "user_id")
        .join(tercile("frequency", False, "f_score"), "user_id")
        .join(tercile("monetary", False, "m_score"), "user_id")
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
        )
    )


def market_basket_pairs(
    spark: SparkSession, sf_dir: str, min_both: int = 2
) -> DataFrame:
    """Association rules over order baskets: for every part pair
    co-occurring in >= ``min_both`` orders, the classic support /
    confidence / lift triple (the retail affinity analysis; in a
    training-data context the same machinery scores tag/source
    co-occurrence).

    Plan: the pair fan-out happens FROM each order's row (sorted
    distinct item set -> chained explodes + a ``<`` filter, the
    no-self-join posting-list shape of ``source_overlap``): one
    distinct, one per-order collect, one pair-count aggregation — pair
    explosion is C(basket,2) per order, bounded by basket size, never
    by catalog size. Item counts and the order total are two more partial
    aggregations; the tiny per-item table broadcasts back onto the
    pair table. The oracle computes the same rules with an explicit
    basket self-join — two structurally different plans agreeing.

    The distinct basket subtree feeds four consumers (the n_orders
    count, the per-order sets, and the item-count table twice via the
    ca/cb aliases) — un-materialized that is 6 lineitem scans and 3
    distinct exchanges per run. Materializing it is SIZE-GATED
    (``spark.scipi.basket.materializeMinBytes``, default 1 GiB of
    estimated lineitem scan bytes): at bench scale the scans are ~10 MB
    and AQE coalesces the re-run subtrees, so the checkpoint's frozen
    64-partition scans cost MORE than they save (r12 measured it
    adverse: warm 5.7 -> 8.7 task-s, and reverted); at real lineitem
    sizes the six full scans dominate everything and the one-time
    checkpoint wins. The gate reads the optimizer's size estimate —
    planning-time only, no extra job — and the results are identical
    either way (same subtree, evaluated once vs. repeatedly)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    )
    baskets = li.distinct()
    try:
        gate = int(
            spark.conf.get(
                "spark.scipi.basket.materializeMinBytes", str(1 << 30)
            )
        )
        scan_bytes = int(
            li._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable: keep the re-scan shape
        gate, scan_bytes = 1, 0
    if scan_bytes >= gate:
        baskets = baskets.localCheckpoint(eager=True)
    n_orders = baskets.select("okey").distinct().count()
    item_counts = baskets.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    sets = baskets.groupBy("okey").agg(
        F.sort_array(F.collect_set("part")).alias("parts")
    )
    # r13 (guide §1.2 per-task work): the C(basket,2) pair fan-out is
    # two chained codegen'd explodes + a `<` filter rather than the r12
    # nested transform/slice/struct comprehension — higher-order array
    # functions are CodegenFallback (interpreted lambda per pair, boxed
    # struct per pair, the whole pair array materialized per order),
    # and `slice` additionally copied an O(basket) array per element.
    # `parts` is a sorted DISTINCT set, so {a < b} is exactly the
    # {index i < j} pair set: identical counts, identical result.
    pairs = (
        sets.select(F.explode("parts").alias("part_a"), "parts")
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_both)
    )
    ca = item_counts.select(
        F.col("part").alias("part_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("part").alias("part_b"), F.col("n_item").alias("n_b")
    )
    n = F.lit(float(n_orders))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(F.col("n_both") / n, 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_both") * n) / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


def events_anomaly_mad(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Robust rate-anomaly detection: per-(user, hour) event counts
    flagged when cnt > median + 3*MAD of all cells — the
    outlier-resistant alternative to mean/stddev thresholds (a handful
    of abusive users cannot drag the threshold up, because both the
    center and the spread are medians). The ops-monitoring twin of the
    curation screens: rate spikes are bot/incident signatures.

    Plan: one (user, hour) count aggregation [the only data-sized
    shuffle], then two single-row percentile aggregations (median, then
    MAD over the residuals) broadcast back as literals into a scan-fused
    filter. ``exact=True`` (default, the oracle-parity path) uses exact
    interpolated ``percentile`` — it gathers every cell count into one
    aggregation buffer, fine while (user × hour) cardinality is bounded;
    ``exact=False`` is the 100 TB path: ``approx_percentile`` keeps the
    aggregation buffer at sketch size (mergeable per partition) at the
    cost of a bounded rank error on the two thresholds — an anomaly
    SCREEN tolerates that; an audited report does not, which is why
    exact stays the default. Exact interpolated percentile parity with
    DuckDB's quantile_cont is already pinned by events_percentiles. The
    counts table feeds three consumers, so it is materialized once."""

    def pctl(expr: str) -> str:
        return (
            f"percentile({expr}, 0.5)"
            if exact
            else f"cast(approx_percentile({expr}, 0.5, 10000) as double)"
        )

    ev = load_events(spark, sf_dir)
    hc = (
        ev.groupBy(
            "user_id",
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    med = hc.agg(F.expr(pctl("cnt")).alias("med"))
    with_med = hc.crossJoin(F.broadcast(med))
    mad = with_med.agg(F.expr(pctl("abs(cnt - med)")).alias("mad"))
    return (
        with_med.crossJoin(F.broadcast(mad))
        .filter(F.col("cnt") > F.col("med") + 3 * F.col("mad"))
        .select(
            "user_id",
            "hour",
            "cnt",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


def events_json_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream batch twin: JSON extraction from props + per-hour,
    per-type aggregation (the batch-mode golden answer for the streaming
    tumbling-window query)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.select(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "value",
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str, size: int = 15, ptype: str = "SMALL", n: int = 100
) -> DataFrame:
    """TPC-H Q2-style: cheapest supplier per qualifying part.

    The testdata has no partsupp table, so the supply relation is the
    (l_partkey, l_suppkey) pairs observed in lineitem and "supply cost"
    is the minimum observed unit price (min is order-independent, so it
    is bit-stable across engines — avg would not be).  The textbook
    correlated-min subquery is a window min over partkey: the per-pair
    aggregate and the window share the same partitioning, so Catalyst
    plans ONE shuffle for both.  part is pre-filtered and broadcast."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == size) & (F.col("p_type") == ptype))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_price").alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(sup), best.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round("cost", 6).alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(n)
    )


def q7_volume_shipping(
    spark: SparkSession, sf_dir: str, n1: str = "NATION_1", n2: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year and
    direction.  Both nation dimensions broadcast (aliased to keep the two
    roles distinct); the only shuffles are the two fact joins and the
    final 4-row aggregate."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp_nation), sup.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cust_nation), cust.c_nationkey == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("string").alias("l_year"),
        )
        .agg(F.round(rev, 2).alias("revenue"))
    )


def q8_market_share(
    spark: SparkSession,
    sf_dir: str,
    target_nation: str = "NATION_3",
    region: str = "ASIA",
    ptype: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8: the target nation's share of supplier volume into a
    customer region, by order year.  Share = conditional-sum / sum in one
    aggregate (no self-join); every dimension broadcasts."""
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    cust_nat = nation.join(
        F.broadcast(reg), nation.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == ptype
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nat), cust.c_nationkey == F.col("cn_key"), "inner")
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(supp_nat), sup.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("string").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_type_profit(
    spark: SparkSession, sf_dir: str, name_word: str = "widget"
) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation and order year for parts
    whose name contains a word.  No partsupp.ps_supplycost in the
    testdata, so cost is the deterministic proxy 0.6 * p_retailprice *
    l_quantity (documented divergence; the plan shape — two fact joins,
    all dimensions broadcast — is the point)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(name_word)
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("string").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def q11_important_parts(
    spark: SparkSession, sf_dir: str, nation: str = "NATION_5",
    multiplier: float = 2.0,
) -> DataFrame:
    """TPC-H Q11-style: parts whose stocked value (here: lineitem revenue
    via suppliers of one nation) exceeds ``multiplier`` x the MEAN part
    value.  The official query's fixed fraction-of-total threshold must
    be rescaled by 1/SF to stay meaningful (it selects nothing at larger
    SFs); a mean-relative threshold is scale-invariant by construction.
    The HAVING-scalar-subquery is a 1-row broadcast cross join — the
    per-part aggregate is computed once and reused for both sides (no
    second scan: the threshold is an agg OF the per-part agg)."""
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    per_part = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    per_part = per_part.persist()
    total = per_part.agg(
        (F.avg("value") * F.lit(multiplier)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    revenue "view" is computed once, its 1-row max broadcasts back onto
    it (equality join, not a sort), exactly the textbook view+max shape
    without materializing anything twice."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total"))
        .persist()
    )
    mx = revenue.agg(F.max("total").alias("max_total"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total") == F.col("max_total"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.round("total", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier count per (brand, type, size)
    bucket.  The supply relation is distinct (l_partkey, l_suppkey) from
    lineitem (no partsupp table); the "customer complaints" exclusion is
    suppliers with negative account balance (deterministic analog).  The
    excluded-supplier set is tiny and broadcast as an anti join."""
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        ps.join(F.broadcast(bad_sup), ps.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_dominant_suppliers(
    spark: SparkSession, sf_dir: str, prefix: str = "red",
    year: int = 1996, frac: float = 0.5,
) -> DataFrame:
    """TPC-H Q20-style: suppliers holding a dominant share of a part's
    flow.  availqty doesn't exist in the testdata, so "excess stock"
    becomes: shipped more than ``frac`` of a part's total quantity that
    year (same semi-join-chain plan shape: part filter -> per-(part,supp)
    aggregate -> correlated threshold -> semi join suppliers).  The
    threshold is a window sum over the SAME partitioning as the
    aggregate — one shuffle total."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(prefix)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") > frac * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        # dominant is at most |supplier| rows but Catalyst has no stats
        # for the derived set — hint it broadcast so the semi join never
        # sort-merges
        sup.join(
            F.broadcast(dominant), sup.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q21_suppliers_kept_waiting(
    spark: SparkSession, sf_dir: str, n: int = 100
) -> DataFrame:
    """TPC-H Q21-style: suppliers solely responsible for problems in
    multi-supplier orders.  No commit/receipt dates in the testdata, so
    "late" is returnflag = 'R'.  The textbook EXISTS + NOT-EXISTS double
    correlation collapses into ONE per-order aggregate: an order counts
    against supplier S iff it has >= 2 distinct suppliers and S is the
    only supplier with a returned item — all derivable from
    count-distinct + conditional max in a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_bad_supp"),
        F.max(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("bad_supp"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_bad_supp") == 1)
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("bad_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("bad_supp") == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(n)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: wealthy customers with no orders, grouped by
    country code.  No phone column in the testdata, so the country code
    is c_nationkey % 5 (deterministic analog of the phone prefix), and
    "no orders" is scoped to the recent window (every customer has SOME
    order at this density).  The average-balance scalar broadcasts; the
    no-orders test is a left anti join (never a NOT IN shuffle)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 5).alias("cntrycode")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def events_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    within_seconds: int = 604_800,
) -> DataFrame:
    """Ordered funnel conversion: users whose first ``steps[0]`` is
    followed by a ``steps[1]`` and then a ``steps[2]``, all inside a
    horizon measured from the first step.

    The sequencing constraint (step k counts only AFTER step k-1) is
    expressed with RUNNING MINs over one per-user event-time ordering —
    two window passes that share the same partitioning, so the whole
    funnel costs ONE shuffle regardless of step count; the textbook
    k-way self-join would cost k-1 shuffles and explode on heavy users."""
    s1, s2, s3 = steps
    # event_id in the ordering makes the running-min frame a strict total
    # order — identical tie handling in Spark and the oracle
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.unix_timestamp("ts")
    t1_run = F.min(F.when(F.col("event_type") == s1, sec)).over(w)
    with1 = ev.select(
        "event_id", "user_id", "ts", "event_type", t1_run.alias("t1")
    )
    t2_cand = F.when(
        (F.col("event_type") == s2)
        & F.col("t1").isNotNull()
        & (sec <= F.col("t1") + within_seconds),
        sec,
    )
    with2 = with1.select(
        "event_id", "user_id", "ts", "event_type", "t1",
        F.min(t2_cand).over(w).alias("t2"),
    )
    t3_cand = F.when(
        (F.col("event_type") == s3)
        & F.col("t2").isNotNull()
        & (sec <= F.col("t1") + within_seconds),
        sec,
    )
    per_user = with2.select(
        "user_id", "t1", "t2", F.min(t3_cand).over(w).alias("t3")
    ).groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("step1_users"),
        F.count("t2").alias("step2_users"),
        F.count("t3").alias("step3_users"),
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week
    (the cohort), counted as retained in each later week they appear.
    Output: (cohort_week, week_offset, n_users).

    Two aggregations over one events scan: distinct (user, week)
    activity [shuffle on user], a per-user min for the cohort week
    (a window over the SAME user partitioning — no extra exchange),
    then the (cohort, offset) rollup. Weeks are Monday-truncated
    DATEs, so offsets are exact multiples of 7 days in every engine."""
    ev = load_events(spark, sf_dir)
    user_weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    w = Window.partitionBy("user_id")
    with_cohort = user_weeks.withColumn("cohort_week", F.min("week").over(w))
    return (
        with_cohort.groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


#: Explicit pivot value list: discovery-free plans (no extra collect
#: job) and a schema that is identical at any scale.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type counts via pivot with an EXPLICIT value
    list — without it Spark runs a distinct-values job first and the
    output schema depends on the data, which breaks both incremental
    runs and plan caching. One shuffle (the groupBy); absent cells
    coalesce to 0."""
    ev = load_events(spark, sf_dir)
    wide = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(
        F.count(F.lit(1))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES],
    )


def events_unpivot(wide: DataFrame) -> DataFrame:
    """Melt the wide pivot back to (user_id, event_type, n) long form —
    `DataFrame.unpivot` is a narrow per-row explode, no shuffle. Zero
    cells are dropped so the round trip reproduces the long table."""
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "n")
        .filter(F.col("n") > 0)
    )
