"""Behavioral marketing analytics — the query families a marketing
analytics team runs downstream of the reference's star schema
(`/root/reference/astro-sdk-tutorial/dags/etl_s3_snowflake_aggregated_views.py`
stops at per-period view KPIs; these are the standard next questions:
cohort retention, RFM segmentation, journey transition matrices,
basket affinity, and trend fitting).

Every plan keeps the repo-wide determinism discipline: exact integer /
decimal aggregation before any float division, one fixed IEEE
expression per derived double, ``floor(x*1e6)/1e6`` truncation on
anything an oracle hashes, and explicit tiebreaks on every rank.

Scale notes are per-plan; the common rules: aggregations are
map-side-combinable, windows partition on per-entity or bounded keys,
global ranks go through the bucketed two-pass machinery
(``operators.keys.ordered_surrogate_key``), and scalar denominators
ride as broadcast 1-row aggregates.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keys import ordered_surrogate_key
from ..tables import load_table

_TRUNC = 1e6


def _trunc6(col: F.Column) -> F.Column:
    return F.floor(col * _TRUNC) / _TRUNC


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream.

    Each user's cohort is the ISO week of their first event; the
    output is the classic retention triangle: for every
    ``(cohort_week, week_offset)`` cell, how many distinct cohort
    members were active that week and what fraction of the cohort
    that is.

    Determinism: counts are exact integers; ``retention`` is a single
    IEEE double division of two exact longs, then floor-truncated.

    Scale: two map-side-combinable aggregates (first-seen per user,
    distinct user-week activity) meet on a user_id-keyed shuffle; the
    cohort-size backfill is a window over the already-aggregated
    triangle, whose cardinality is O(weeks²) — bounded by calendar
    time, not data volume.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    cells = (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").cast("long").alias("n_active"))
        .withColumn(
            "week_offset",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            ).cast("long"),
        )
    )
    # every user is active in their own cohort week (it is the week of
    # their first event), so the offset-0 cell IS the cohort size
    w = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w)
    return (
        cells.select(
            "cohort_week",
            "week_offset",
            "n_active",
            size.alias("cohort_size"),
            _trunc6(
                F.col("n_active").cast("double") / size.cast("double")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    orders — the canonical marketing scoring model.

    Per customer: days since last order (against the corpus max order
    date), order count, and an exact decimal revenue sum. Each metric
    is then quartiled 1–4 (4 = best) by EXACT global rank with a
    custkey tiebreak, and the three digits concatenate into the
    familiar ``rfm_code`` (e.g. 444 = recent, frequent, big spender).

    Quartile definition is the rank formula ``floor(4*(rank-1)/N)+1``
    (equal-population by rank, deterministic under ties via the
    custkey tiebreak) — NOT engine ntile, whose uneven-remainder
    placement is engine-specific.

    Scale: the per-customer aggregate is one map-side-combinable
    shuffle; each of the three global ranks runs through the bucketed
    two-pass ``ordered_surrogate_key`` (no single-partition window
    anywhere); the max order date and customer count ride as broadcast
    1-row aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    maxdate = orders.agg(F.max("o_orderdate").alias("__maxdate"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__mon"),
        )
        .join(F.broadcast(maxdate))
        .select(
            "custkey",
            F.datediff(F.col("__maxdate").cast("date"), F.col("last_order").cast("date"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            F.col("__mon").cast("double").alias("monetary"),
            F.col("__mon").alias("__mon_exact"),
        )
        # each ordered_surrogate_key consumes its input from three plan
        # branches (min/max bounds, bucket counts, main); chaining three
        # of them without a materialization barrier re-derives the
        # orders aggregate 3³+ times (measured: 330 exchanges). The
        # checkpoint pins the per-customer grain ONCE — it is the small
        # post-aggregation table, not raw orders.
        .localCheckpoint(eager=False)
    )
    # rank each metric with a deterministic custkey tiebreak; lower
    # rank = better (most recent, most frequent, highest spend)
    ranked = ordered_surrogate_key(
        per_cust, "__r_rank", ["recency_days", "custkey"], descending=False
    ).localCheckpoint(eager=False)
    ranked = ordered_surrogate_key(
        ranked, "__f_rank", ["frequency", "custkey"], descending=True
    ).localCheckpoint(eager=False)
    ranked = ordered_surrogate_key(
        ranked, "__m_rank", ["__mon_exact", "custkey"], descending=True
    )
    n = per_cust.agg(F.count("*").cast("long").alias("__n"))
    # ordered_surrogate_key applies `descending` to the leading column
    # only; the custkey tiebreak stays ascending in all three ranks, so
    # every rank is fully deterministic under metric ties.
    score = lambda rank: (  # noqa: E731
        4 - F.floor((rank - 1) * 4 / F.col("__n"))
    ).cast("long")
    return (
        ranked.join(F.broadcast(n))
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            score(F.col("__r_rank")).alias("r_score"),
            score(F.col("__f_rank")).alias("f_score"),
            score(F.col("__m_rank")).alias("m_score"),
        )
        .withColumn(
            "rfm_code",
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).cast("long"),
        )
        .orderBy("custkey")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | current event type).

    Per user, events order by ``(ts, event_id)`` (the id tiebreak makes
    simultaneous events deterministic); ``lead`` pairs each event with
    its successor; terminal events drop. The probability denominator
    is the per-source-type transition total.

    Scale: the lead window partitions per user (no global order); the
    pair aggregate is map-side combinable onto an O(|types|²) grid;
    the row-probability window runs over that bounded grid.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    w_row = Window.partitionBy("from_type")
    total = F.sum("n_transitions").over(w_row)
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        _trunc6(
            F.col("n_transitions").cast("double") / total.cast("double")
        ).alias("probability"),
    ).orderBy("from_type", "to_type")


def frequent_item_pairs(
    spark: SparkSession, sf_dir: str, k: int = 50
) -> DataFrame:
    """Market-basket affinity: the top-k part pairs most often bought
    together in one order, with support against all orders.

    Within-order distinct parts self-join on the order key under
    ``p1 < p2`` (each unordered pair counted once); the pair counts
    shuffle to an aggregate and the top-k plans as
    TakeOrderedAndProject with a full (count desc, p1, p2) tiebreak.

    Scale: the self-join fan-out is bounded by per-order basket size
    (|lines| choose 2 per order — single-digit for order-shaped data),
    never corpus-quadratic; the order-count denominator is a broadcast
    1-row aggregate; driver traffic is O(k).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.alias("a")
    b = li.alias("b")
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count("*").cast("long").alias("__n_orders")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("n_orders_together"))
    )
    return (
        pairs.join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_orders_together",
            _trunc6(
                F.col("n_orders_together").cast("double")
                / F.col("__n_orders").cast("double")
            ).alias("support"),
        )
        .orderBy(F.col("n_orders_together").desc(), "part_a", "part_b")
        .limit(k)
    )


def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of daily revenue: slope and intercept of
    ``revenue ~ day`` fitted from one pass of exact closed-form moments
    (n, Σx, Σx², Σy, Σxy) — the scalable alternative to collecting a
    series per group.

    x is the absolute day number (epoch days — slope is shift
    invariant); y is the exact decimal daily revenue. All five moments
    aggregate exactly (bigint / decimal), and slope / intercept are
    derived in one fixed double expression each, floor-truncated, so
    no partition-order float accumulation can flip the hash.

    Scale: two chained map-side-combinable aggregates (day grain, then
    nation grain) behind broadcast dim joins; no windows at all. The
    day-grain pre-aggregate keeps the moment pass's shuffle at
    O(nations × days), and the decimal Σxy is computed at that bounded
    grain rather than per line item.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.date_trunc("day", "o_orderdate").alias("order_day"),
        )
        # the day-grain sum re-casts to decimal(20,6) so the Σxy product
        # below stays inside decimal(38,6) on BOTH engines (DuckDB widens
        # decimal products by full operand width, Spark caps at 38)
        .agg(F.sum(revenue).cast("decimal(20,6)").alias("rev"))
        .withColumn(
            "x",
            F.datediff(F.col("order_day").cast("date"), F.lit("1970-01-01"))
            .cast("long"),
        )
    )
    moments = daily.groupBy("nation_name").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("rev") * F.col("x").cast("decimal(10,0)")).alias("sxy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return moments.select(
        "nation_name",
        "n_days",
        _trunc6(slope).alias("slope_per_day"),
        _trunc6(intercept).alias("intercept"),
    ).orderBy("nation_name")


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment read-out: users deterministically
    hash-split into control/treatment arms, conversion = "activated
    within 24 h" (first purchase within a day of the user's first
    event — the corpus's every-user-eventually-purchases saturation
    makes a lifetime conversion flag degenerate), reporting per-arm
    rates, absolute lift, and the pooled two-proportion z statistic —
    the standard A/B significance check.

    The arm assignment reuses the repo's content-hash bucketing
    (``operators.sampling.hash_bucket``), so membership is retry-stable
    and identically reproducible in the SQL oracle. All inputs to the
    statistics are four exact integers; rates/lift/z are each ONE fixed
    IEEE expression floor-truncated. Degenerate pools (pooled rate 0 or
    1, z undefined) yield NULL on both engines via the same guard.

    Scale: one map-side-combinable per-user aggregate, then a single
    global 4-counter aggregate — two scans' worth of work, one row out.
    """
    from ..operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        # conditional-min trick: activation needs "first purchase ts"
        # relative to "first event ts" — both fall out of ONE aggregate
        F.when(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
            < F.min("ts") + F.expr("INTERVAL 24 HOURS"),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    arm = (hash_bucket(F.col("user_id"), "exp1") % 2).alias("arm")
    counts = per_user.select("converted", arm).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treatment"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_treatment"),
    )
    na = F.col("n_control").cast("double")
    nb = F.col("n_treatment").cast("double")
    ca = F.col("conv_control").cast("double")
    cb = F.col("conv_treatment").cast("double")
    pa = ca / na
    pb = cb / nb
    pooled = (ca + cb) / (na + nb)
    se = F.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb))
    z = F.when(
        (pooled > 0) & (pooled < 1), (pb - pa) / se
    )
    return counts.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        _trunc6(pa).alias("rate_control"),
        _trunc6(pb).alias("rate_treatment"),
        _trunc6(pb - pa).alias("lift_abs"),
        _trunc6(z).alias("z_score"),
    )


def session_path_mining(
    spark: SparkSession, sf_dir: str, depth: int = 5, k: int = 20
) -> DataFrame:
    """Top-k session opening paths: the first ``depth`` event types of
    every 30-minute session, joined ``a>b>c``, ranked by session count
    — the journey-mining view ("how do sessions start, and which
    openings dominate?") that complements the pairwise Markov matrix
    with actual ordered paths.

    Sessionization is the repo's standard lag+gap>30min cumsum (same
    windows as ``relational.user_sessions``); the path string comes
    from ``depth`` conditional-max aggregates over the per-session
    step rank (``concat_ws`` skips the NULLs of shorter sessions), so
    no order-sensitive ``collect_list`` is involved. Share is the
    session fraction against a broadcast 1-row total.

    Scale: all windows partition per user / per session; the path
    aggregate shuffles one row per session, the final top-k plans as
    TakeOrderedAndProject with a full (count, path) tiebreak.
    """
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(
        by_user
    )
    with_sid = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    steps = with_sid.withColumn("rn", F.row_number().over(w_sess)).filter(
        F.col("rn") <= depth
    )
    paths = steps.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            *[
                F.max(F.when(F.col("rn") == i, F.col("event_type")))
                for i in range(1, depth + 1)
            ],
        ).alias("path")
    )
    total = paths.agg(F.count("*").cast("long").alias("__total"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .join(F.broadcast(total))
        .select(
            "path",
            "n_sessions",
            _trunc6(
                F.col("n_sessions").cast("double")
                / F.col("__total").cast("double")
            ).alias("session_share"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def rolling_active_users(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """Exact DAU / WAU / stickiness per active day — the engagement
    triple on every growth dashboard. WAU(d) is the EXACT distinct
    user count over [d−6, d]; approximations (HLL unions) exist in the
    sketch family, this is the exact path.

    A rolling DISTINCT cannot ride a window frame (distinct doesn't
    decompose), and the textbook band join (days × activity on a range
    predicate) plans as a nested-loop theta join — quadratic at scale.
    Instead each (user, day) activity row EXPLODES to the ≤7 window
    ends it can serve (an equi-key), the ends prune against the
    broadcast active-day dimension, and one distinct+count per end
    finishes it: all joins equi, fan-out bounded by the window width.

    Stickiness = DAU/WAU — one double division of exact longs,
    floor-truncated.
    """
    events = load_table(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = activity.select("day").distinct()
    dau = activity.groupBy("day").agg(
        F.count("*").cast("long").alias("dau")
    )
    ends = activity.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days,"
                " interval 1 day)"
            )
        ).alias("wend"),
    )
    wau = (
        ends.join(
            F.broadcast(days.select(F.col("day").alias("wend"))), "wend"
        )
        .distinct()
        .groupBy("wend")
        .agg(F.count("*").cast("long").alias("wau"))
    )
    return (
        wau.join(dau, wau.wend == dau.day, "left")
        .select(
            F.col("wend").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            "wau",
            _trunc6(
                F.coalesce(F.col("dau"), F.lit(0)).cast("double")
                / F.col("wau").cast("double")
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def view_to_purchase_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution: hours from each user's FIRST view
    to their first purchase at-or-after it, histogrammed by whole
    hours — the funnel-latency panel next to the conversion rate.

    Latencies are exact integer second differences floored to hours;
    the histogram is a map-side-combinable count. Users who never
    purchase after their first view simply don't appear (the funnel's
    non-converts — counted by the conversion queries, not here).

    Scale: one per-user aggregate for the first view, one user-keyed
    join onto purchases with a residual ts filter, one min-aggregate,
    one histogram aggregate — no windows at all.
    """
    events = load_table(spark, sf_dir, "events")
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("fv"))
        .groupBy("user_id", "fv")
        .agg(F.min("ts").alias("fp"))
    )
    latency_hours = F.floor(
        (F.col("fp").cast("long") - F.col("fv").cast("long")) / 3600
    ).cast("long")
    return (
        first_purchase.select(latency_hours.alias("latency_hours"))
        .groupBy("latency_hours")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("latency_hours")
    )


def daily_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session count and bounce rate (sessions with exactly one
    event), indexed by session start day — the engagement-quality KPI
    next to DAU/WAU.

    Sessionization is the standard lag+gap>30min cumsum; the per-day
    rollup keys on each session's first-event day. Counts are exact;
    the rate is one truncated double division.

    Scale: the session windows partition per user; the rollup is one
    map-side-combinable aggregate on the bounded day grain.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(
        by_user
    )
    with_sid = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = with_sid.groupBy("user_id", "session_seq").agg(
        F.date_trunc("day", F.min("ts")).alias("start_day"),
        F.count("*").alias("n_events"),
    )
    return (
        sessions.groupBy(F.col("start_day").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            _trunc6(
                F.col("n_bounces").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


def item_conversion_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-item view→purchase conversion: views, purchases, distinct
    viewers/buyers, and the conversion rate — the item-level funnel
    panel next to the KPI views' per-period counts.

    One conditional aggregate per item (map-side combinable); items
    with purchases but no views report rate −1.0 (a sentinel, not a
    fake infinity — and NULL floats can never hash-compare across
    engines). Rates are one truncated double division of exact longs.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("item_key"),
    ).filter(F.col("item_key").isNotNull())
    agg = events.groupBy("item_key").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        )
        .cast("long")
        .alias("n_viewers"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("long")
        .alias("n_buyers"),
    )
    rate = F.when(
        F.col("n_views") > 0,
        F.col("n_purchases").cast("double") / F.col("n_views").cast("double"),
    ).otherwise(F.lit(-1.0))
    return agg.select(
        "item_key",
        "n_views",
        "n_purchases",
        "n_viewers",
        "n_buyers",
        _trunc6(rate).alias("conversion_rate"),
    ).orderBy("item_key")


def daily_order_anomalies_robust(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust time-series anomaly flags: per-day order counts scored
    by the MEDIAN / MAD of the trailing 28-day window (today excluded)
    — the outlier-resistant sibling of ``daily_order_anomalies``,
    whose mean/std baseline a single spike can drag.

    Exactness: the window holds ≤28 integer day-counts, so the median
    is an integer or an exact .5 (the two-middle average of ints), the
    absolute deviations are exact, and the MAD is exact by the same
    argument; the robust z ``(x − med) / (1.4826 · MAD)`` is one fixed
    double expression, floor-truncated, NULL-guarded to −999/flag-only
    when MAD is 0 (a constant window — sentinel, not NULL: NULL floats
    can't hash-compare).

    Scale: the daily aggregate is map-side combinable; everything
    after runs on one row per DAY — the collect_list/array_sort frame
    is ≤28 elements, the bounded-window argument shared by the whole
    anomaly family.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("order_day")
    ).agg(F.count("*").cast("long").alias("n_orders"))
    w = (
        Window.orderBy(
            F.datediff(F.col("order_day"), F.lit("1970-01-01"))
        ).rangeBetween(-28, -1)
    )
    # materialize the sorted window ONCE: the median/MAD/z expressions
    # reference the array ~10 times and transform lambdas re-derive
    # captured subtrees per element — without the barrier Catalyst
    # inlines array_sort(collect_list(window)) into every site and the
    # tree grows past codegen limits (measured 25 s for 2 400 rows;
    # 2 s with it). The checkpoint holds one row per DAY — bounded.
    based = daily.withColumn(
        "__arr", F.array_sort(F.collect_list("n_orders").over(w))
    ).localCheckpoint(eager=False)

    def _median(sorted_arr: F.Column) -> F.Column:
        n = F.size(sorted_arr)
        lo = F.element_at(sorted_arr, ((n + 1) / 2).cast("int"))
        hi = F.element_at(sorted_arr, (n / 2 + 1).cast("int"))
        return (lo.cast("double") + hi.cast("double")) / 2

    arr = F.col("__arr")
    med = _median(arr)
    devs = F.array_sort(
        F.transform(arr, lambda x: F.abs(x.cast("double") - med))
    )
    mad = _median(devs)
    z = F.when(
        mad > 0,
        (F.col("n_orders").cast("double") - med) / (F.lit(1.4826) * mad),
    ).otherwise(F.lit(-999.0))
    return (
        based.select(
            "order_day",
            "n_orders",
            F.size(arr).cast("long").alias("n_baseline_days"),
            _trunc6(med).alias("baseline_median"),
            _trunc6(mad).alias("baseline_mad"),
            _trunc6(z).alias("robust_z"),
            ((mad > 0) & (F.abs(z) > 3.5)).alias("is_anomaly"),
        )
        .filter(F.col("n_baseline_days") >= 14)
        .orderBy("order_day")
    )


def seasonal_naive_forecast_eval(
    spark: SparkSession, sf_dir: str, season_days: int = 7
) -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict today =
    same-weekday last week) over daily order counts: one summary row
    with MAE / RMSE / MAPE — the baseline every real forecasting model
    must beat, and the standard accuracy panel.

    Exactness: errors are integer differences; MAE/RMSE divide exact
    integer sums once (trunc6); MAPE follows the per-term truncation
    discipline (each |e|/actual truncated to decimal(18,6), summed
    exactly, then one mean division).

    Scale: day-grain aggregate + one equi self-join on the day number
    (gaps drop naturally) + one global aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("order_day")
    ).agg(F.count("*").cast("long").alias("n_orders")).withColumn(
        "dn",
        F.datediff(F.col("order_day").cast("date"), F.lit("1970-01-01"))
        .cast("long"),
    )
    lagged = daily.select(
        (F.col("dn") + season_days).alias("dn"),
        F.col("n_orders").alias("forecast"),
    )
    joined = daily.join(lagged, "dn").withColumn(
        "err", F.col("n_orders") - F.col("forecast")
    )
    ape = (
        F.floor(
            F.abs(F.col("err")).cast("double")
            / F.col("n_orders").cast("double")
            * 1e6
        )
        / 1e6
    ).cast("decimal(18,6)")
    agg = joined.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.abs("err")).alias("sae"),
        F.sum(F.col("err") * F.col("err")).alias("sse"),
        F.sum(ape).alias("sape"),
    )
    n = F.col("n_eval").cast("double")
    return agg.select(
        "n_eval",
        _trunc6(F.col("sae").cast("double") / n).alias("mae"),
        _trunc6(F.sqrt(F.col("sse").cast("double") / n)).alias("rmse"),
        _trunc6(F.col("sape").cast("double") / n).alias("mape"),
    )


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across customers as the Gini coefficient
    — the one-number answer to "how top-heavy is our revenue?", next
    to the RFM segmentation it summarizes.

    Uses the rank formulation ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n``
    over per-customer revenues sorted ascending (custkey tiebreak).
    The rank is the bucketed two-pass ``ordered_surrogate_key`` (never
    a single-partition window); ``Σ i·xᵢ`` accumulates exactly in
    decimal (rank as decimal(10,0) × revenue (18,2)); the final Gini
    is one fixed double expression, floor-truncated.

    Scale: one per-customer aggregate, one two-pass global rank, one
    4-way global aggregate — all map-side-combinable or bounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .localCheckpoint(eager=False)
    )
    ranked = ordered_surrogate_key(
        per_cust, "i", ["rev", "custkey"], descending=False
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").alias("total_rev"),
        F.sum(
            F.col("i").cast("decimal(10,0)") * F.col("rev")
        ).alias("weighted"),
    )
    n = F.col("n_customers").cast("double")
    s = F.col("total_rev").cast("double")
    w = F.col("weighted").cast("double")
    gini = 2 * w / (n * s) - (n + 1) / n
    return agg.select(
        "n_customers",
        _trunc6(s).alias("total_revenue"),
        _trunc6(gini).alias("gini"),
    )


def event_dow_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence diagnostics for event type × day of
    week — "does the event mix shift by weekday?", the seasonality
    sibling of the temporal-JSD drift monitor.

    One contingency aggregate (map-side combinable onto the O(types×7)
    grid), then expected counts ``row·col/N`` and per-cell
    contributions ``(o−e)²/e`` — each ONE fixed double expression over
    exact integers, floor-truncated per cell. The full chi-square
    statistic is the (truncated) contribution sum; keeping the per-cell
    table makes the result hash-comparable and is what an analyst
    inspects anyway.

    Scale: everything after the first aggregate runs on the bounded
    grid; the row/col/total sums are windows over ≤ types×7 rows.
    """
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count("*").cast("long").alias("observed"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    row_t = F.sum("observed").over(w_row)
    col_t = F.sum("observed").over(w_col)
    n = F.sum("observed").over(w_all)
    expected = (
        row_t.cast("double") * col_t.cast("double") / n.cast("double")
    )
    contrib = (
        (F.col("observed").cast("double") - expected)
        * (F.col("observed").cast("double") - expected)
        / expected
    )
    return cells.select(
        "event_type",
        "dow",
        "observed",
        _trunc6(expected).alias("expected"),
        _trunc6(contrib).alias("chisq_contrib"),
    ).orderBy("event_type", "dow")


def customer_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval profile per customer: the gap series
    between consecutive orders (lag over the per-customer order
    timeline) reduced to count / mean / min / max days — the
    "purchase cadence" input to churn and replenishment models.

    Gaps are exact integer day differences; the mean is one double
    division of two exact longs, floor-truncated. Ordering ties break
    on the order key, so same-day orders produce a deterministic gap
    sequence (including 0-day gaps, which are real cadence signal).

    Scale: the lag window partitions per customer; the profile is a
    map-side-combinable aggregate on the same key — one shuffle total.
    Single-order customers drop (no gaps), matching the SQL oracle's
    implicit inner behavior.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w),
    ).cast("long")
    return (
        orders.withColumn("gap_days", gap)
        .filter(F.col("gap_days").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            _trunc6(
                F.sum("gap_days").cast("double")
                / F.count("*").cast("double")
            ).alias("mean_gap_days"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .orderBy("custkey")
    )


def nation_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order-price distribution shape in ONE pass: mean,
    population std, skewness, and excess kurtosis from exact decimal
    raw power sums (Σx..Σx⁴) — the higher-moment siblings of the
    one-pass correlation/trend queries, and what a pricing analyst
    reads before trusting a mean.

    Exactness: prices become exact integer CENTS (decimal(12,2)·100 →
    long — a double·100 would carry binary artifacts), and the power
    sums stay integral all the way: c² in long (≤10¹⁶), c³/c⁴ in
    scale-0 decimals (≤10³²) — scale 0 means Spark's precision cap can
    drop only unused headroom, never round a digit (a decimal(12,2)⁴
    product gets silently rounded from scale 8 to 6 at the cap, which
    is why the cents grid exists). Skewness/kurtosis are
    scale-invariant, so they compute directly on cents; mean/std
    divide by 100 at the end. Each statistic is one fixed double
    expression over the exact sums, floor-truncated; variance clamps
    at 0 (the daily_order_anomalies guard).

    Scale: broadcast dim joins + one map-side-combinable aggregate;
    no windows, no second pass. Σc⁴ has ~6 decimal digits of headroom
    above 10⁹ rows/group at 10⁶ max price — the same documented bound
    class as the correlation matrix.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    c = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    c2 = c * c
    d2 = c2.cast("decimal(19,0)")
    c3 = d2 * c.cast("decimal(11,0)")
    c4 = d2 * d2
    sums = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(c.cast("decimal(20,0)")).alias("s1"),
            F.sum(d2).alias("s2"),
            F.sum(c3).alias("s3"),
            F.sum(c4).alias("s4"),
        )
    )
    n = F.col("n_orders").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mean = s1 / n  # cents
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    # central moments from raw sums (one fixed expression each)
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean * mean * (s2 / n)
        - 3 * mean * mean * mean * mean
    )
    skew = F.when(var > 0, m3 / (std * std * std))
    kurt = F.when(var > 0, m4 / (var * var) - 3)
    return sums.select(
        "nation_name",
        "n_orders",
        _trunc6(mean / 100).alias("mean_price"),
        _trunc6(std / 100).alias("std_price"),
        _trunc6(skew).alias("skewness"),
        _trunc6(kurt).alias("excess_kurtosis"),
    ).orderBy("nation_name")


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the same user's ``view`` touches in the preceding
    3 days, and the credit rolls up per viewed item — the measurement
    query behind every "which content drives revenue" dashboard.

    Determinism: the per-(purchase, item) credit is ONE fixed IEEE
    expression floor-truncated immediately (the repo's per-term
    truncation discipline), so the per-item rollup is an exact decimal
    sum — no partition-order float accumulation.

    Scale: the touch join is a user-keyed equi-join with a residual
    time-band predicate — fan-out bounded by per-user activity in the
    3-day window, never corpus-quadratic; both window counts partition
    on the purchase id (bounded per purchase). Purchases with no touch
    in the window drop out (inner join) — an "unattributed" bucket is
    a one-line left-join variant.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("item_key"),
    )
    touches = purchases.join(views, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
    )
    per_pair = touches.groupBy("p_id", "value", "item_key").agg(
        F.count("*").cast("long").alias("cnt_item")
    )
    w_p = Window.partitionBy("p_id")
    credit = (
        per_pair.withColumn("cnt_total", F.sum("cnt_item").over(w_p))
        .withColumn(
            "term",
            (
                F.floor(
                    F.col("value")
                    * F.col("cnt_item")
                    / F.col("cnt_total")
                    * 1e6
                )
                / 1e6
            ).cast("decimal(18,6)"),
        )
    )
    return (
        credit.groupBy("item_key")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cnt_item").cast("long").alias("n_touches"),
            F.sum("term").cast("double").alias("attributed_revenue"),
        )
        .orderBy("item_key")
    )


# EWMA weights 0.5^j are EXACT in decimal (j decimal digits), so the
# weighted sum below is exact decimal arithmetic on both engines — no
# engine-ordered float accumulation can reach the trunc6 boundary.
_EWMA_SPAN = 14
_EWMA_WEIGHTS = [Decimal(1) / (Decimal(2) ** j) for j in range(_EWMA_SPAN)]
# partial normalizers: sum of the first s weights, s = 1.._EWMA_SPAN
_EWMA_NORMS = [
    sum(_EWMA_WEIGHTS[:s], Decimal(0)) for s in range(1, _EWMA_SPAN + 1)
]


def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily order revenue
    (decay 0.5/day over a trailing 14-row window) — the smoothing every
    revenue dashboard runs next to the raw daily line.

    A windowed EWMA instead of the textbook infinite recurrence: the
    recurrence is sequentially dependent (unexpressible without a
    global ordered scan), while the trailing-window form is a frame
    aggregate — and with decay 0.5 the truncated tail under-weights by
    < 2⁻¹⁴, far below the trunc6 boundary the oracle hashes.

    Mechanics: ``collect_list`` over the ROWS frame yields the trailing
    revenue series in frame order (oldest → newest); an ``aggregate``
    higher-order function folds it against EXACT decimal weight
    literals (0.5ʲ has j decimal digits), and the partial-window
    normalizer comes from a precomputed exact lookup. Only the final
    num/den division is float, one IEEE op, floor-truncated.

    Scale: the window runs over one row per DAY — bounded cardinality
    (the daily_order_anomalies argument); upstream is one map-side
    combinable daily aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("order_day")
    ).agg(
        # re-cast the sum to decimal(18,2): Spark widens sums to (28,2)
        # and DuckDB to (38,2), and the ×weight product would overflow
        # 38 digits (DuckDB errors; Spark silently DROPS scale when it
        # caps precision, breaking exactness). (18,2) fits daily grain.
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    w = Window.orderBy("order_day").rowsBetween(-(_EWMA_SPAN - 1), 0)
    weights = F.array(
        *[
            F.lit(wt).cast("decimal(15,14)")
            for wt in _EWMA_WEIGHTS
        ]
    )
    norms = F.array(
        *[F.lit(nm).cast("decimal(16,14)") for nm in _EWMA_NORMS]
    )
    arr = F.collect_list("rev").over(w)
    # arr[i] (1-based) is s-i days old at window size s → weight 0.5^(s-i)
    # accumulator stays decimal(37,16): a (38,16)+(38,16) add would
    # overflow precision 38 and Spark silently drops scale to (38,15);
    # the post-add re-cast is lossless below 10²¹ (daily-revenue grain)
    num = F.aggregate(
        F.sequence(F.lit(1), F.size(arr)),
        F.lit(Decimal(0)).cast("decimal(37,16)"),
        lambda acc, i: (
            acc
            + (
                F.element_at(arr, i)
                * F.element_at(weights, F.size(arr) - i + 1)
            ).cast("decimal(34,16)")
        ).cast("decimal(37,16)"),
    )
    den = F.element_at(norms, F.size(arr))
    return daily.select(
        "order_day",
        F.col("rev").cast("double").alias("daily_revenue"),
        F.size(arr).cast("long").alias("n_in_window"),
        _trunc6(num.cast("double") / den.cast("double")).alias(
            "ewma_revenue"
        ),
    ).orderBy("order_day")
