"""General relational query plans — the operator classes the reference
never exercises (SURVEY.md §2.5) made first-class: multi-agg groupBy,
semi/anti joins, set operators, rollup, scalar subqueries, sessionization
and window frames. Each function is a (spark, sf_dir) -> DataFrame plan
over the synthetic TPC-H-ish tables, with a DuckDB oracle registered in
``__spark_entry__``.

Scale notes are per-plan; the common rules: aggregations are
map-side-combinable, dim joins broadcast, windows partition on bounded
keys, and sorts only appear at final output (TakeOrderedAndProject where
a limit exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 2-key groupBy → 8 aggregates.

    Whole plan is one map-side-combinable hash aggregate; the shipdate
    filter pushes down into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    region) + groupBy. Fixed-size dims (nation 25 rows, region 5 rows)
    are pinned broadcast; customer grows 150K rows/SF so its join
    strategy is left to AQE (broadcast while it fits, shuffle beyond).
    The only unavoidable shuffle is lineitem⋈orders on orderkey, then
    the agg is map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is NOT force-broadcast: 150K rows/SF grows linearly
        # with data volume; a pinned broadcast is a driver/executor OOM
        # at large SF. AQE picks broadcast vs shuffle from measured size.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("region_name", "nation_name")
    )


def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue within each market segment:
    join → groupBy → window row_number ≤ k (the canonical top-k-per-group
    plan: one shuffle on custkey for the agg, one on segment for the
    bounded window)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        # customer grows with SF — no pinned broadcast; AQE decides.
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("spend_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("spend_rank") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spend", "spend_rank")
        .orderBy("c_mktsegment", "spend_rank")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no orders. Broadcast anti
    when the key list is small; shuffle-anti otherwise (AQE decides)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def high_value_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + uncorrelated scalar subquery: customers with
    at least one order above the global average order price."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    avg_price = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    big_orders = orders.join(
        F.broadcast(avg_price), F.col("o_totalprice") > F.col("avg_price")
    )
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: (status, priority) → status → grand total.

    Spark expands rollup into a single expand+aggregate — still one
    shuffle. Null grouping cells are labeled 'ALL' so the oracle can
    match deterministic strings instead of NULL-vs-NULL semantics.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("order_status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("order_priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("order_status", "order_priority")
    )


def order_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers with open orders INTERSECT customers with
    finished orders, UNION customers with high-priority orders, EXCEPT
    the bottom spenders. Exercises INTERSECT/UNION/EXCEPT distinct
    semantics in one plan."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    finished_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    urgent_c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    cheap_c = orders.filter(F.col("o_totalprice") < 1000).select("o_custkey")
    return (
        open_c.intersect(finished_c)
        .union(urgent_c)
        .distinct()
        .exceptAll(cheap_c.distinct())
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min cumsum session ids, per-user
    session stats. Windows partition by user_id (bounded, no global
    sort); at 100 TB this is the classic one-shuffle sessionize."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def running_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame (ROWS UNBOUNDED PRECEDING): daily order revenue and
    its running cumulative sum — the frame class the reference lacks."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("order_day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    )
    w = Window.orderBy("order_day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("cum_revenue", F.round(F.sum("day_revenue").over(w), 2))
        .orderBy("order_day")
    )


def order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows (NTILE + PERCENT_RANK), partitioned
    by order priority: per (priority, decile) — row count, price range,
    and the percent-rank span of the decile. (Span, not mean: a float
    MEAN's value depends on summation order, which differs between
    engines; min/max of per-row ranks is order-free and verifies
    exactly.)

    The window partitions by priority (bounded group count), never a
    global single-partition rank; ties broken by order key so the
    decile assignment is a total order and engine-portable.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        ranked.groupBy("o_orderpriority", "decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            (F.floor(F.min("pr") * 1e6) / 1e6).alias("min_pct_rank"),
            (F.floor(F.max("pr") * 1e6) / 1e6).alias("max_pct_rank"),
        )
        .orderBy("o_orderpriority", "decile")
    )


def events_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent
    order at or before the event time (events.user_id ↔ orders.o_custkey).

    Exercises ``operators.asof.asof_join`` — one hash shuffle on the
    key, no pair blowup (see that module's docstring). The right side is
    pre-deduplicated to one order per (custkey, date) — latest orderkey
    wins — so the as-of pick is deterministic.
    """
    from ..operators.asof import asof_join  # noqa: PLC0415

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    right = (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            F.col("o_orderkey").alias("last_order_key"),
            F.col("o_totalprice").alias("last_order_price"),
        )
    )
    return asof_join(
        events,
        right,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["last_order_key", "last_order_price"],
    ).orderBy("event_id")


def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in
    one pass — Spark expands the cube into a single map-side-combinable
    aggregate (no N-pass union), same plan family as rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("order_status", "order_priority")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: daily event counts, one column per event type.

    The pivot value list is explicit — with it, Spark plans a single
    aggregate pass (no extra distinct-values job) and the output schema
    is stable, both of which matter for a scheduled 100 TB build.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("period"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("period")
    )


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the spark.sql surface: (status, priority),
    (status), () — a strict subset of cube's combinations in one pass
    (rollup/cube are the degenerate cases; the explicit form prunes the
    combinations the report doesn't need).
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
               COALESCE(o_orderpriority, 'ALL') AS order_priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY order_status, order_priority
        """
    )


def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per order status (median / p90).

    ``percentile`` (exact) rather than ``percentile_approx``: the
    approx sketch is the right call at 100 TB, but its error bound is
    engine-specific, so the oracle-checked form is the exact one; swap
    in approx_percentile at scale and keep this as the verification
    query.
    """
    orders = load_table(spark, sf_dir, "orders")
    trunc = lambda c: (F.floor(c * 1e6) / 1e6)  # noqa: E731
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            trunc(F.expr("percentile(o_totalprice, 0.5)")).alias("p50_price"),
            trunc(F.expr("percentile(o_totalprice, 0.9)")).alias("p90_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def purchases_in_browse_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution via interval join: each *purchase* event
    is matched to the browse-session window — ``[session_start,
    session_end + 30min)`` over the user's NON-purchase events — that
    contains it, then aggregated per session.

    Exercises ``operators.interval.interval_join`` — the banded
    equi-join shape (one shuffle per side on (user, hour-bucket), exact
    containment filter after the hash join; see that module's docstring
    for why the naive non-equi formulation is a nested-loop join).
    Browse windows of one user never overlap (sessions split on >30min
    gaps, windows extend exactly 30min), so each purchase attributes to
    at most one session.
    """
    from ..operators.interval import interval_join  # noqa: PLC0415

    events = load_table(spark, sf_dir, "events")
    browse = events.filter(F.col("event_type") != "purchase")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    sid = (
        browse.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    windows = sid.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("win_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    pairs = interval_join(
        purchases,
        windows,
        left_time="ts",
        right_start="win_start",
        right_end="win_end",
        on=["user_id"],
        bucket_seconds=3600,
    )
    return (
        pairs.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("purchase_value"),
            F.max("ts").alias("last_purchase_ts"),
        )
        .orderBy("user_id", "session_seq")
    )


def part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (SURVEY.md §2.5 notes the reference uses
    only YEAR() + JSON parse): string ops (upper, substring, concat,
    lpad, length, regexp_extract, split) and math ops (abs, round,
    floor, power, ln) in one projection — all JVM-side built-ins inside
    a single whole-stage-codegen span, no shuffle at all (orderBy on the
    key is the only exchange, for deterministic output).
    """
    part = load_table(spark, sf_dir, "part")
    first_word = F.regexp_extract(F.col("p_name"), r"^(\w+)", 1)
    return (
        part.select(
            "p_partkey",
            F.upper(first_word).alias("first_word_upper"),
            F.substring("p_name", 1, 3).alias("name_prefix"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
            F.length("p_name").cast("long").alias("name_len"),
            F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
            F.abs(F.col("p_retailprice") - 1000).alias("price_dist_1000"),
            F.floor(F.col("p_retailprice") / 100).alias("price_century"),
            (F.floor(F.pow("p_size", 2) * 1e6) / 1e6).alias("size_sq"),
            (F.floor(F.log(F.col("p_retailprice")) * 1e6) / 1e6).alias("ln_price"),
        )
        .orderBy("p_partkey")
    )


def numeric_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of lineitem's numeric measures — one row per
    column with count/null/distinct/min/max/mean/stddev.

    ONE aggregation pass computes all columns' stats simultaneously
    (7 aggregates x 4 columns in a single map-side-combinable
    HashAggregate — not one scan per column, which at 100 TB is the
    difference between reading the table once and four times); the
    wide single row then unpivots to rows with ``stack``. Floats are
    floor-truncated to 6dp for engine-portable comparison.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    t6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731

    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(c).alias(f"{c}__n"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
                F.countDistinct(c).cast("long").alias(f"{c}__nd"),
                F.min(c).cast("double").alias(f"{c}__mn"),
                F.max(c).cast("double").alias(f"{c}__mx"),
                t6(F.avg(c)).alias(f"{c}__avg"),
                t6(F.stddev_samp(c)).alias(f"{c}__sd"),
            ]
        )
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__avg, {c}__sd"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_values, n_nulls, n_distinct, min_val, max_val, "
        "mean_val, stddev_val)"
    ).orderBy("col_name")


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume (TPC-H Q7 shape): supplier nation x
    customer nation x ship-month revenue, for pairs where the two
    nations differ.

    Join strategy at scale: lineitem joins nation twice (broadcast —
    25 fixed rows, aliased per role); supplier and customer grow with
    SF so they carry no hint — AQE broadcasts them wherever they fit
    and falls back to shuffle at scale. The unavoidable shuffle is
    lineitem ⋈ orders on orderkey, after which the groupBy is map-side
    combinable.
    Extends the reference's single inner-equi-join surface (SURVEY
    §2.5 — "joins beyond inner-equi" absent there) with the multi-role
    dim pattern (same nation table joined under two aliases).

    Revenue accumulates in DECIMAL, not double: these groups are small
    (nation-pair × month), so double-sum accumulation order visibly
    shifts the 2-decimal rounding across engines. The per-row product
    is bit-identical IEEE everywhere; casting it to decimal(18,6) makes
    the subsequent sum exact and order-independent (and map-side
    combinable all the same).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # supplier and customer are NOT force-broadcast: both grow
        # linearly with data volume (10K and 150K rows/SF) — a pinned
        # broadcast is a driver-memory hazard at large SF. AQE still
        # broadcasts them from measured size at any SF where they fit;
        # only the truly fixed-size nation dim (25 rows) is pinned.
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_trunc("month", "l_shipdate").alias("ship_month"),
        )
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("volume"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_month")
    )


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: a user converts
    at a stage only via events AFTER their entry into the previous
    stage (first view -> first click after that view -> first purchase
    after that click).

    One shuffle total: all three stage timestamps are unbounded
    MIN-windows over the SAME user_id partitioning, so Catalyst plans a
    single Exchange feeding stacked Window operators (the stage-N
    timestamp feeds the stage-N+1 window predicate without
    re-shuffling). The per-user frame then collapses to one row per
    user (groupBy on the already-partitioned key) and a 3-row stack.
    At 100 TB the cost is one events shuffle by user_id — the same
    price as any sessionization — with no self-joins.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    wu = Window.partitionBy("user_id")
    s1 = events.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max(F.col("t_view").isNotNull().cast("long")).alias("r1"),
        F.max(F.col("t_click").isNotNull().cast("long")).alias("r2"),
        F.max(F.col("t_purchase").isNotNull().cast("long")).alias("r3"),
    )
    totals = per_user.agg(
        F.sum("r1").alias("n1"), F.sum("r2").alias("n2"), F.sum("r3").alias("n3")
    )
    # 3-row funnel with conversion pct vs the previous stage; floor6 +
    # zero-guard keep it exact and NULL-free for any data
    pct = (
        "CASE WHEN {prev} = 0 THEN 0.0 "
        "ELSE floor(CAST({cur} AS DOUBLE) * 100.0 / {prev} * 1e6) / 1e6 END"
    )
    return totals.selectExpr(
        "stack(3, "
        " 1, 'view', n1, CAST(100.0 AS DOUBLE), "
        f" 2, 'click_after_view', n2, {pct.format(cur='n2', prev='n1')}, "
        f" 3, 'purchase_after_click', n3, {pct.format(cur='n3', prev='n2')}"
        ") AS (stage_order, stage, n_users, pct_of_prev)"
    ).orderBy("stage_order")


def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type no other query exercises):
    per-nation customer account balance vs supplier account balance,
    nations appearing on either side.

    Both inputs are already nation-grain aggregates (≤25 rows), so the
    full-outer join itself is trivial at any scale — the heavy lifting
    is the two map-side-combinable aggs feeding it. Balances sum in
    DECIMAL for cross-engine order-independence.
    """
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    c = cust.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("customer_balance"),
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count("*").alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("supplier_balance"),
    )
    joined = c.join(s, c.nk_c == s.nk_s, "full_outer").withColumn(
        "nationkey", F.coalesce("nk_c", "nk_s")
    )
    return (
        joined.join(F.broadcast(nation), F.col("nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"),
        )
        .orderBy("nation_name")
    )


def rolling_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs the ROWS frames elsewhere): rolling
    7-day revenue over daily aggregates — RANGE BETWEEN 6 days
    PRECEDING AND CURRENT ROW on the day timestamp, so gaps in the
    calendar shrink the window instead of silently spanning them
    (the ROWS-frame bug this operator class exists to avoid).

    The frame sums DECIMAL day-revenues: sliding-frame accumulators
    (add/remove) would drift under float math and diverge from an
    engine that recomputes each frame; decimal is exact either way.
    Window is unpartitioned but runs over one row per DAY — bounded
    cardinality at any input scale (same argument as the trend KPI).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("order_day")
    ).agg(
        F.round(F.sum("o_totalprice"), 2)
        .cast("decimal(18,2)")
        .alias("day_rev")
    )
    w = (
        # Order the RANGE frame by integer DAYS since epoch, not epoch
        # seconds: midnight-to-midnight is 86400 s only in a DST-free
        # session zone (82800/90000 across a transition), so a seconds
        # frame would include/exclude the wrong day under e.g.
        # Europe/Berlin while the calendar-interval oracle would not.
        # datediff is calendar-exact in any zone.
        Window.orderBy(F.datediff(F.col("order_day"), F.lit("1970-01-01")))
        # 6 days back + the current day = a 7-day window
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "order_day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("week_revenue"),
        F.count("*").over(w).cast("long").alias("n_days_in_window"),
    ).orderBy("order_day")


def order_priority_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (greenfield vs SURVEY §2.5 — the
    reference's period aggregates silently skip empty periods): per
    order-priority daily series on a COMPLETE calendar — missing days
    materialize with zero counts/revenue, and the running average order
    price forward-fills from the last observed day (``last(...,
    ignorenulls=True)`` over an unbounded-preceding ROWS frame — the
    LOCF gap-fill every BI/forecasting consumer expects).

    Scale shape: one (priority, day)-keyed map-side-combinable shuffle
    builds the daily aggregates; the calendar grid is |priorities| ×
    |days| — bounded by the DOMAIN, not the row count, at any input
    scale — so the deliberate small crossJoin and the per-priority
    O(days) window never grow with the fact table. Revenue accumulates
    in DECIMAL (order-independent, exact) with single IEEE casts after,
    keeping the result engine-reproducible for the exact oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"),
    )
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    cal = bounds.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 day"))
        ).alias("day")
    )
    pri = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    grid = pri.crossJoin(cal)
    joined = grid.join(daily, ["priority", "day"], "left")
    avg_price = F.when(
        F.col("n_orders").isNotNull(),
        F.col("rev_dec").cast("double") / F.col("n_orders"),
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "priority",
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("rev_dec"), F.lit(0)).cast("double").alias("day_revenue"),
        # days before a priority's FIRST observation have nothing to
        # carry forward; 0.0 keeps the result NULL-free (NaN breaks
        # order-insensitive hashing — same rule as the trend KPI)
        F.coalesce(
            F.last(avg_price, ignorenulls=True).over(w), F.lit(0.0)
        ).alias("avg_price_ffill"),
    ).orderBy("priority", "day")


def nation_top_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg family): per
    nation, the top-3 customers by spend as one comma-joined string in
    rank order — the "denormalized label" shape BI tools ask of a
    warehouse.

    Determinism is the whole trick for an order-sensitive aggregate:
    spend totals accumulate in DECIMAL (a double sum's value depends on
    partition order, which would reorder ties differently per engine),
    ranking tie-breaks on custkey, and the join happens via
    array_sort(collect_list(struct(rank, name))) — collect_list order
    is partition-nondeterministic, so the sort key rides INSIDE the
    collected struct and the concatenation order never depends on it.
    One custkey shuffle for the agg, one bounded nation-partitioned
    window, and the final groupBy carries ≤3 rows per nation.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        # customer grows with SF — no pinned broadcast; AQE decides.
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("__spend")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("__spend").desc(), F.col("c_custkey")
    )
    top = spend.withColumn("__rank", F.row_number().over(w)).filter(
        F.col("__rank") <= 3
    )
    return (
        top.join(F.broadcast(nation), top.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__rank", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ", ",
            ).alias("top_customers"),
            F.count("*").alias("n_listed"),
            F.sum("__spend").cast("double").alias("combined_spend"),
        )
        .orderBy("nation_name")
    )


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over time — the aggregate SQL engines
    can't express as a window (COUNT(DISTINCT) OVER is unsupported in
    Spark and most warehouses). Re-expressed scalably: a user counts as
    NEW only on their first-ever day (one user_id-keyed min-aggregate),
    daily new-user counts then cumulative-sum over the bounded day
    spine — distinct-so-far without ever materializing per-day distinct
    sets.

    Scale shape: the only data-sized shuffle is the per-user MIN
    (map-side combinable); everything after runs on O(days) rows. The
    unpartitioned cumulative window is over that bounded spine, same
    argument as the trend KPI.
    """
    events = load_table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily_new = first_day.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    daily_active = events.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count_distinct("user_id").alias("active_users"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily_active.join(daily_new, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("distinct_users_to_date", F.sum("new_users").over(w))
        .orderBy("day")
    )


def above_nation_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (WHERE spend > avg spend OF THE
    CUSTOMER'S OWN NATION) — the decorrelated form every engine
    actually executes: per-customer totals, per-nation averages, one
    broadcast-joined comparison. Extends the uncorrelated scalar
    subquery (high_value_order_customers) to the correlated class.

    Per-customer spend accumulates in DECIMAL so the nation average is
    exact/deterministic; the single IEEE division (sum/count) follows
    the engine-reproducibility pattern. One custkey shuffle; the nation
    aggregate is 25 rows — broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        # customer grows with SF — no pinned broadcast; AQE decides.
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("__spend")
        )
    )
    nation_avg = spend.groupBy("c_nationkey").agg(
        (F.sum("__spend").cast("double") / F.count("*")).alias("__nation_avg")
    )
    return (
        spend.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("__spend").cast("double") > F.col("__nation_avg"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            "c_name",
            F.col("__spend").cast("double").alias("customer_spend"),
            F.col("__nation_avg").alias("nation_avg_spend"),
        )
        .orderBy("nation_name", "c_custkey")
    )


def session_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation (the built-in dynamic-gap
    operator, distinct from :func:`user_sessions`' lag/cumsum form):
    per-user 30-minute-gap sessions with event counts and decimal-exact
    value totals. The same call works unchanged as a watermarked
    Structured Streaming aggregation — that API unification is the
    point of covering the native form.

    Session end follows Spark's semantics: last event time + gap. One
    (user_id)-keyed shuffle; session merging is linear per key.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


def user_event_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregate family (``min_by``/``max_by``): each
    user's first and last event type and value in one pass — the
    "latest status per key" query every event warehouse runs, WITHOUT
    a window+filter (one map-side-combinable shuffle; a window form
    would sort inside every user partition).

    Tie-breaks are explicit: the ordering key is struct(ts, event_id),
    so two events on the same timestamp resolve by event_id instead of
    partition order — what makes an argmax aggregate
    engine-reproducible at all.
    """
    events = load_table(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("event_type", okey).alias("first_event_type"),
            F.min_by("value", okey).alias("first_value"),
            F.max_by("event_type", okey).alias("last_event_type"),
            F.max_by("value", okey).alias("last_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


def supplier_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.x): walk a reporting
    hierarchy to its root and roll up account balances per level.

    The hierarchy is derived deterministically from the supplier table
    (parent(k) = k DIV 10 — a fanout-10 tree rooted at 0), standing in
    for the org-chart / BOM / referral-graph shape the reference's flat
    SQL layer cannot express (SURVEY §2.5 lists recursion among the
    absent classes). Both engines run the IDENTICAL recursive SQL, so
    the oracle proves the full fixpoint semantics, not one unrolling.

    Scale shape: each iteration is one join of the (shrinking) frontier
    against nothing but itself (pure projection per step here — the
    general form joins frontier to an edge table, shuffle on the edge
    key). Depth is bounded by the key width (log10 of max key ≈ 6
    levels), so the iteration count is O(log N), never data-sized.
    """
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    view = f"__sup_hier_{abs(hash(sf_dir)) % 10**8}"
    sup.createOrReplaceTempView(view)
    try:
        return spark.sql(f"""
            WITH RECURSIVE chain AS (
              SELECT s_suppkey AS suppkey, s_suppkey AS cur, 0 AS depth
              FROM {view}
              UNION ALL
              SELECT suppkey, cur DIV 10 AS cur, depth + 1 AS depth
              FROM chain WHERE cur > 0
            ),
            depths AS (
              SELECT suppkey, MAX(depth) AS depth_to_root
              FROM chain GROUP BY suppkey
            )
            SELECT d.depth_to_root,
                   COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_acctbal,
                   MIN(d.suppkey) AS min_suppkey,
                   MAX(d.suppkey) AS max_suppkey
            FROM depths d JOIN {view} s ON d.suppkey = s.s_suppkey
            GROUP BY d.depth_to_root
            ORDER BY d.depth_to_root
        """)
    finally:
        # the temp view only needs to outlive plan ANALYSIS (the
        # returned DataFrame is already resolved); drop it so repeated
        # calls on shared sessions leave no residue
        spark.catalog.dropTempView(view)


def daily_order_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly flags: per-day order counts scored against a
    trailing 28-day baseline (mean + population std over the RANGE
    frame, current day excluded), |z| > 2 flagged.

    Determinism across engines is the design constraint: the frame
    sums COUNTS (exact integers), the mean/variance come from the
    closed-form (sum, sum-of-squares) pair — var = sumsq/n − mean² —
    computed in ONE identical double expression on both sides, and the
    z-score is floor-truncated. No engine-ordered float accumulation
    anywhere (the reason stddev_samp/variance built-ins can never pass
    a value-hash oracle).

    Scale: the window runs over one row per DAY — bounded cardinality
    at any input size (the rolling_weekly_revenue argument); everything
    before it is one map-side-combinable daily aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("order_day")
    ).agg(F.count("*").cast("long").alias("n_orders"))
    w = (
        Window.orderBy(
            F.datediff(F.col("order_day"), F.lit("1970-01-01"))
        ).rangeBetween(-28, -1)  # trailing 4 weeks, EXCLUDING today
    )
    n = F.count("*").over(w)
    s = F.sum("n_orders").over(w)
    s2 = F.sum(F.col("n_orders") * F.col("n_orders")).over(w)
    mean = s.cast("double") / n.cast("double")
    # clamp at 0: catastrophic cancellation can yield a tiny negative,
    # whose sqrt is engine-defined (NaN vs error) — clamped, both
    # engines take the same zero-variance branch
    var = F.greatest(
        s2.cast("double") / n.cast("double") - mean * mean, F.lit(0.0)
    )
    z = F.when(
        var > 0,
        (F.col("n_orders").cast("double") - mean) / F.sqrt(var),
    )
    trunc = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        daily.select(
            "order_day",
            "n_orders",
            n.alias("n_baseline_days"),
            trunc(mean).alias("baseline_mean"),
            trunc(z).alias("z_score"),
            F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
        )
        # need a full baseline window for a meaningful score
        .filter(F.col("n_baseline_days") >= 14)
        .orderBy("order_day")
    )


def nation_revenue_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-analytic window functions (ntile / percent_rank /
    cume_dist) — the last unexercised window-function class (SURVEY
    §2.5 lists the reference's window surface as DENSE_RANK only).

    Deliberately computed over the NATION aggregate grain (≤ 25 rows):
    these functions need a total order over their partition, so at
    100 TB they belong on bounded post-aggregation grains — for
    row-level global ranks use the bucketed two-pass rank
    (operators/keys.py) or the quantile sketch instead (both
    registered). The window here is cardinality-bounded by the nation
    dimension, the same argument as the KPI trend frames.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # Revenue accumulates in DECIMAL (the repo-wide sum discipline —
    # see nation_trade_volume): the per-row product is bit-identical
    # IEEE on every engine, and the decimal sum is exact and
    # order-independent, so the rounded value feeding the tie-sensitive
    # ntile/percent_rank below can never flip at a .xx5 boundary from
    # partition-order float accumulation (ADVICE r04).
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("nation_name"))
    trunc = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return per_nation.select(
        "nation_name",
        F.col("revenue").cast("double").alias("revenue"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        trunc(F.percent_rank().over(w)).alias("pct_rank"),
        trunc(F.cume_dist().over(w)).alias("cume"),
    ).orderBy("nation_name")


def event_type_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day event-type distribution drift: the Jensen-Shannon
    divergence (nats) between each day's event-type mix and the
    previous day's — the temporal sibling of the corpus-level
    source-pair divergence (functions/text.py:
    source_unigram_divergence) and the number an ops monitor alerts
    on when a client release or tracking bug shifts the event mix.

    Same shared-support identity and determinism discipline: types
    present on both days contribute trunc6'd per-type terms summed in
    exact DECIMAL; types private to one day reduce to exact integer
    count sums times ln 2. Every post-aggregation stage is bounded by
    |event types| × |days| — domain, not event volume; the only
    data-sized stage is the one (day, type)-keyed count aggregation.

    Output: (day, n_shared_types, jsd_vs_prev), one row per day that
    has a preceding day with events.
    """
    from ..functions.text import trunc6  # noqa: PLC0415

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.col("event_type").alias("typ"),
    ).agg(F.count("*").alias("c"))
    totals = counts.groupBy("day").agg(F.sum("c").alias("t"))
    cur = counts.join(totals, "day").select(
        "day", "typ", F.col("c").alias("ca"), F.col("t").alias("ta")
    )
    prev = (
        counts.join(totals, "day")
        .select(
            (F.col("day") + F.expr("interval 1 day")).alias("day"),
            "typ",
            F.col("c").alias("cb"),
            F.col("t").alias("tb"),
        )
    )
    pa = F.col("ca").cast("double") / F.col("ta").cast("double")
    pb = F.col("cb").cast("double") / F.col("tb").cast("double")
    term = trunc6(
        pa * F.log(F.lit(2.0) * pa / (pa + pb))
        + pb * F.log(F.lit(2.0) * pb / (pa + pb))
    )
    shared = (
        cur.join(prev, ["day", "typ"])
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_shared_types"),
            F.sum(term.cast("decimal(28,6)")).alias("s"),
            F.sum("ca").alias("cca"),
            F.sum("cb").alias("ccb"),
        )
    )
    day_pairs = totals.join(
        totals.select(
            (F.col("day") + F.expr("interval 1 day")).alias("day"),
            F.col("t").alias("tb"),
        ),
        "day",
    ).select("day", F.col("t").alias("ta"), "tb")
    only_mass = (
        F.lit(1.0)
        - F.coalesce(F.col("cca"), F.lit(0)).cast("double")
        / F.col("ta").cast("double")
    ) + (
        F.lit(1.0)
        - F.coalesce(F.col("ccb"), F.lit(0)).cast("double")
        / F.col("tb").cast("double")
    )
    jsd = trunc6(
        F.lit(0.5)
        * (
            only_mass * F.lit(0.693147)
            + F.coalesce(F.col("s").cast("double"), F.lit(0.0))
        )
    )
    return (
        day_pairs.join(shared, "day", "left")
        .select(
            "day",
            F.coalesce("n_shared_types", F.lit(0))
            .cast("long")
            .alias("n_shared_types"),
            jsd.alias("jsd_vs_prev"),
        )
        .orderBy("day")
    )
