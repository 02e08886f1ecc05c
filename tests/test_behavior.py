"""Behavioral marketing pack (plans/behavior.py): cohort retention,
RFM segmentation, transition matrices, basket affinity, OLS trends.

Value-level oracles for these plans live in ``__spark_entry__``
(DuckDB); the tests here pin the invariants a hash-compare can't
express: probability normalization, quartile balance, pair ordering,
and closed-form agreement with an independent numpy fit.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import behavior

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def retention(spark):
    return behavior.retention_cohorts(spark, SF).collect()


def test_retention_offset_zero_is_full_cohort(retention):
    for r in retention:
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size
            assert r.retention == 1.0


def test_retention_bounded_and_offsets_nonnegative(retention):
    assert retention, "cohort triangle must be non-empty"
    for r in retention:
        assert 0 <= r.retention <= 1.0
        assert r.week_offset >= 0
        assert 0 < r.n_active <= r.cohort_size


def test_retention_cohort_sizes_cover_all_users(spark, retention):
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    total = sum(r.n_active for r in retention if r.week_offset == 0)
    assert total == n_users


@pytest.fixture(scope="module")
def rfm(spark):
    return behavior.rfm_segments(spark, SF).collect()


def test_rfm_scores_in_range_and_code_consistent(rfm):
    for r in rfm:
        assert 1 <= r.r_score <= 4
        assert 1 <= r.f_score <= 4
        assert 1 <= r.m_score <= 4
        assert r.rfm_code == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_rfm_quartiles_are_balanced(rfm):
    # the rank formula floor(4*(rank-1)/N)+1 yields quartile sizes that
    # differ by at most one
    n = len(rfm)
    for col in ("r_score", "f_score", "m_score"):
        sizes = [0] * 5
        for r in rfm:
            sizes[getattr(r, col)] += 1
        occupied = [s for s in sizes[1:] if s > 0]
        assert max(occupied) - min(occupied) <= 1
        assert sum(occupied) == n


def test_rfm_monotone_against_metric(rfm):
    # a strictly better metric can never receive a worse score
    by_recency = sorted(rfm, key=lambda r: (r.recency_days, r.custkey))
    for a, b in zip(by_recency, by_recency[1:]):
        assert a.r_score >= b.r_score
    by_mon = sorted(rfm, key=lambda r: (-r.monetary, r.custkey))
    for a, b in zip(by_mon, by_mon[1:]):
        assert a.m_score >= b.m_score


@pytest.fixture(scope="module")
def transitions(spark):
    return behavior.event_transition_matrix(spark, SF).collect()


def test_transition_rows_are_probability_distributions(transitions):
    from collections import defaultdict

    rows = defaultdict(float)
    for t in transitions:
        assert 0 < t.probability <= 1.0
        rows[t.from_type] += t.probability
    for from_type, total in rows.items():
        # truncation shaves < 1e-6 per cell
        assert 1.0 - 1e-4 <= total <= 1.0 + 1e-9, from_type


def test_transition_counts_conserve_events(spark, transitions):
    # #transitions == #events - #users with >= 1 event (each user's
    # terminal event emits no pair)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(t.n_transitions for t in transitions) == n_events - n_users


def test_frequent_item_pairs_ordering_and_support(spark):
    rows = behavior.frequent_item_pairs(spark, SF, k=20).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert 0 < r.support <= 1.0
    counts = [r.n_orders_together for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_frequent_item_pairs_matches_exact_recount(spark):
    # recount the single top pair straight from lineitem
    top = behavior.frequent_item_pairs(spark, SF, k=1).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = (
        li.filter(F.col("l_partkey").isin(top.part_a, top.part_b))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 2)
        .count()
    )
    assert n == top.n_orders_together


def test_ewma_matches_python_replica(spark):
    from decimal import Decimal

    rows = behavior.ewma_daily_revenue(spark, SF).collect()
    assert rows
    series = [Decimal(str(r.daily_revenue)).quantize(Decimal("0.01")) for r in rows]
    for t, r in enumerate(rows):
        window = series[max(0, t - 13) : t + 1]
        num = sum(
            v * (Decimal(1) / Decimal(2) ** (len(window) - 1 - i))
            for i, v in enumerate(window)
        )
        den = sum(Decimal(1) / Decimal(2) ** j for j in range(len(window)))
        expect = math.floor(float(num) / float(den) * 1e6) / 1e6
        assert r.n_in_window == len(window)
        assert r.ewma_revenue == pytest.approx(expect, abs=2e-6)


def test_ewma_window_ramps_then_saturates(spark):
    rows = behavior.ewma_daily_revenue(spark, SF).collect()
    sizes = [r.n_in_window for r in rows]
    assert sizes[:14] == list(range(1, 15))
    assert all(s == 14 for s in sizes[14:])


def test_attribution_conserves_purchase_value(spark):
    # total attributed revenue == sum of values of attributed purchases
    # (up to the per-term 1e-6 truncation, bounded by #credit rows)
    rows = behavior.multi_touch_attribution(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts"), "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    attributed = (
        purchases.join(views, "user_id")
        .filter(
            (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
        )
        .select("p_id", "value")
        .distinct()
    )
    expect_total = sum(r.value for r in attributed.collect())
    n_credit_rows = sum(r.n_purchases for r in rows)
    got_total = sum(r.attributed_revenue for r in rows)
    assert abs(got_total - expect_total) <= n_credit_rows * 1e-6 + 1e-6


def test_attribution_touches_are_positive_and_items_real(spark):
    rows = behavior.multi_touch_attribution(spark, SF).collect()
    for r in rows:
        assert r.n_touches >= r.n_purchases >= 1
        assert r.attributed_revenue >= 0
        assert r.item_key is not None


def test_fixed_k_sample_exact_size_and_nested(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    k100 = sampling.fixed_k_sample(docs, "doc_id", k=min(40, n))
    ids100 = {r.doc_id for r in k100.select("doc_id").collect()}
    assert len(ids100) == min(40, n)
    # bottom-k nesting: the k=10 sample is a subset of the k=40 sample
    ids10 = {
        r.doc_id
        for r in sampling.fixed_k_sample(docs, "doc_id", k=10)
        .select("doc_id")
        .collect()
    }
    assert ids10 <= ids100
    # partitioning invariance
    ids_re = {
        r.doc_id
        for r in sampling.fixed_k_sample(docs.repartition(7), "doc_id", k=10)
        .select("doc_id")
        .collect()
    }
    assert ids_re == ids10
    # k beyond corpus size returns everything
    assert sampling.fixed_k_sample(docs, "doc_id", k=n + 50).count() == n
    with pytest.raises(ValueError):
        sampling.fixed_k_sample(docs, "doc_id", k=0)


def test_ab_test_lift_partitions_users_and_is_consistent(spark):
    row = behavior.ab_test_lift(spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_control + row.n_treatment == n_users
    assert 0 <= row.conv_control <= row.n_control
    assert 0 <= row.conv_treatment <= row.n_treatment
    assert 0.0 <= row.rate_control <= 1.0
    assert 0.0 <= row.rate_treatment <= 1.0
    # lift ~ rate difference (each side independently truncated)
    assert row.lift_abs == pytest.approx(
        row.rate_treatment - row.rate_control, abs=2e-6
    )
    if row.z_score is not None and row.lift_abs != 0:
        assert (row.z_score > 0) == (row.lift_abs > 0)


def test_chisq_contingency_identities(spark):
    rows = behavior.event_dow_chisq(spark, SF).collect()
    assert rows
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.observed for r in rows) == n_events
    # expected counts sum back to N (up to per-cell truncation)
    assert sum(r.expected for r in rows) == pytest.approx(
        n_events, abs=len(rows) * 1e-6
    )
    for r in rows:
        assert r.chisq_contrib >= 0
        assert 1 <= r.dow <= 7


def test_chisq_matches_scipy_style_formula(spark):
    import numpy as np

    rows = behavior.event_dow_chisq(spark, SF).collect()
    types = sorted({r.event_type for r in rows})
    dows = sorted({r.dow for r in rows})
    obs = np.zeros((len(types), len(dows)))
    for r in rows:
        obs[types.index(r.event_type), dows.index(r.dow)] = r.observed
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp)[obs > -1]
    got = sum(r.chisq_contrib for r in rows)
    assert got == pytest.approx(chi2.sum(), abs=len(rows) * 1e-6)


def test_purchase_gaps_match_python_replica(spark):
    from collections import defaultdict

    rows = behavior.customer_purchase_gaps(spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append((o.o_orderdate, o.o_orderkey))
    for r in rows:
        seq = sorted(by_cust[r.custkey])
        gaps = [
            (b[0].date() - a[0].date()).days for a, b in zip(seq, seq[1:])
        ]
        assert r.n_gaps == len(gaps)
        assert r.min_gap_days == min(gaps)
        assert r.max_gap_days == max(gaps)
        assert r.mean_gap_days == pytest.approx(
            math.floor(sum(gaps) / len(gaps) * 1e6) / 1e6, abs=1e-9
        )
    # customers with a single order never emit a profile row
    singles = {c for c, seq in by_cust.items() if len(seq) == 1}
    assert singles.isdisjoint({r.custkey for r in rows})


def test_session_paths_cover_all_sessions_and_are_bounded(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        relational,
    )

    rows = behavior.session_path_mining(spark, SF, k=10_000).collect()
    assert rows
    n_sessions = relational.user_sessions(spark, SF).count()
    assert sum(r.n_sessions for r in rows) == n_sessions
    assert sum(r.session_share for r in rows) == pytest.approx(
        1.0, abs=len(rows) * 1e-6
    )
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 5
        assert all(s for s in steps)
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_rolling_active_users_matches_python_replica(spark):
    from collections import defaultdict

    rows = behavior.rolling_active_users(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    act = {(r.user_id, r.day) for r in ev.distinct().collect()}
    days = sorted({d for _, d in act})
    by_day = defaultdict(set)
    for u, d in act:
        by_day[d].add(u)
    for r in rows:
        window = {
            u
            for d in days
            if 0 <= (r.day - d).days <= 6
            for u in by_day[d]
        }
        assert r.wau == len(window)
        assert r.dau == len(by_day[r.day])
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0
    assert {r.day for r in rows} == set(days)


def test_weighted_fixed_k_sample_properties(spark):
    import math as m

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.filter(F.col("n_chars") > 0).count()
    k = min(20, n)
    got = sampling.weighted_fixed_k_sample(
        docs, "doc_id", "n_chars", k=k, salt="aes1"
    )
    rows = got.select("doc_id", "n_chars").collect()
    assert len(rows) == k
    # python replica of the A-ES key ordering
    all_rows = docs.filter(F.col("n_chars") > 0).select(
        "doc_id", "n_chars"
    ).collect()
    import hashlib

    def key(doc_id, w):
        h = int(
            hashlib.md5(f"aes1{doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / 2**60
        return m.floor(m.log(u) / w * 1e12) / 1e12

    expect = sorted(
        all_rows, key=lambda r: (-key(r.doc_id, r.n_chars), r.doc_id)
    )[:k]
    assert {r.doc_id for r in rows} == {r.doc_id for r in expect}
    # partitioning invariance
    again = sampling.weighted_fixed_k_sample(
        docs.repartition(9), "doc_id", "n_chars", k=k, salt="aes1"
    )
    assert {r.doc_id for r in again.select("doc_id").collect()} == {
        r.doc_id for r in rows
    }
    with pytest.raises(ValueError):
        sampling.weighted_fixed_k_sample(docs, "doc_id", "n_chars", k=0)


def test_weighted_fixed_k_sample_is_weight_biased(spark):
    # 10x-weight rows should dominate the sample across many draws
    # (deterministic: vary salt, not a seed)
    rows = [(i, 1000 if i % 2 == 0 else 1) for i in range(400)]
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    df = spark.createDataFrame(rows, ["id", "w"])
    heavy = 0
    for salt in ("s1", "s2", "s3"):
        got = sampling.weighted_fixed_k_sample(df, "id", "w", k=50, salt=salt)
        heavy += sum(1 for r in got.collect() if r.id % 2 == 0)
    assert heavy / 150 > 0.9


def test_view_to_purchase_latency_replica(spark):
    rows = behavior.view_to_purchase_latency(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    fv = {}
    for e in ev:
        if e.event_type == "view":
            fv[e.user_id] = min(fv.get(e.user_id, e.ts), e.ts)
    lat = {}
    for e in ev:
        if e.event_type == "purchase" and e.user_id in fv and e.ts >= fv[e.user_id]:
            lat[e.user_id] = min(lat.get(e.user_id, e.ts), e.ts)
    import math as m

    hist = {}
    for u, fp in lat.items():
        h = m.floor(
            (int(fp.timestamp()) - int(fv[u].timestamp())) / 3600
        )
        hist[h] = hist.get(h, 0) + 1
    assert {r.latency_hours: r.n_users for r in rows} == hist


def test_nation_revenue_trend_matches_numpy_fit(spark):
    import numpy as np

    rows = behavior.nation_revenue_trend(spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name"), F.date_trunc("day", "o_orderdate").alias("d")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
            F.datediff(
                F.date_trunc("day", F.first("o_orderdate")).cast("date"),
                F.lit("1970-01-01"),
            ).alias("x"),
        )
        .collect()
    )
    by_nation: dict[str, list] = {}
    for r in daily:
        by_nation.setdefault(r.n_name, []).append((r.x, r.rev))
    for row in rows:
        pts = by_nation[row.nation_name]
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert row.n_days == len(pts)
        assert math.isclose(row.slope_per_day, slope, rel_tol=1e-4, abs_tol=1e-3)
        assert math.isclose(row.intercept, intercept, rel_tol=1e-4, abs_tol=10.0)


def test_nation_price_moments_match_numpy(spark):
    import numpy as np

    rows = behavior.nation_price_moments(spark, SF).collect()
    assert rows
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_totalprice")
        .collect()
    )
    from collections import defaultdict

    by_nation = defaultdict(list)
    for r in joined:
        by_nation[r.n_name].append(round(r.o_totalprice, 2))
    for row in rows:
        xs = np.array(by_nation[row.nation_name])
        assert row.n_orders == len(xs)
        mean, std = xs.mean(), xs.std()
        assert row.mean_price == pytest.approx(mean, rel=1e-6, abs=1e-4)
        assert row.std_price == pytest.approx(std, rel=1e-6, abs=1e-4)
        if std > 0:
            z = (xs - mean) / std
            assert row.skewness == pytest.approx(
                (z**3).mean(), rel=1e-4, abs=1e-4
            )
            assert row.excess_kurtosis == pytest.approx(
                (z**4).mean() - 3, rel=1e-4, abs=1e-4
            )


def test_daily_bounce_rate_consistent_with_sessions(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        relational,
    )

    rows = behavior.daily_bounce_rate(spark, SF).collect()
    assert rows
    sessions = relational.user_sessions(spark, SF).collect()
    assert sum(r.n_sessions for r in rows) == len(sessions)
    assert sum(r.n_bounces for r in rows) == sum(
        1 for s in sessions if s.n_events == 1
    )
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0.0 <= r.bounce_rate <= 1.0


def test_item_conversion_rates_consistency(spark):
    rows = behavior.item_conversion_rates(spark, SF).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .filter(F.col("k").isNotNull())
        .collect()
    )
    n_views = sum(1 for e in ev if e.event_type == "view")
    n_purch = sum(1 for e in ev if e.event_type == "purchase")
    assert sum(r.n_views for r in rows) == n_views
    assert sum(r.n_purchases for r in rows) == n_purch
    for r in rows:
        assert r.n_viewers <= r.n_views
        assert r.n_buyers <= r.n_purchases
        if r.n_views == 0:
            assert r.conversion_rate == -1.0
        else:
            assert r.conversion_rate >= 0.0


def test_robust_anomalies_match_python_median_mad(spark):
    import statistics

    rows = behavior.daily_order_anomalies_robust(spark, SF).collect()
    assert rows
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series = {r.d: r.n for r in daily}
    days = sorted(series)
    for r in rows:
        window = [
            series[d] for d in days if 1 <= (r.order_day - d).days <= 28
        ]
        assert r.n_baseline_days == len(window)
        med = statistics.median(window)
        assert r.baseline_median == math.floor(med * 1e6) / 1e6
        mad = statistics.median(sorted(abs(x - med) for x in window))
        assert r.baseline_mad == math.floor(mad * 1e6) / 1e6
        if mad > 0:
            z = (r.n_orders - med) / (1.4826 * mad)
            assert r.robust_z == pytest.approx(
                math.floor(z * 1e6) / 1e6, abs=2e-6
            )
            assert r.is_anomaly == (abs(z) > 3.5)


def test_seasonal_naive_forecast_eval_replica(spark):
    rows = behavior.seasonal_naive_forecast_eval(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_dn = {
        (row.d.date() - __import__("datetime").date(1970, 1, 1)).days: row.n
        for row in daily
    }
    errs = [
        (by_dn[dn] - by_dn[dn - 7], by_dn[dn])
        for dn in by_dn
        if dn - 7 in by_dn
    ]
    assert r.n_eval == len(errs)
    assert r.mae == math.floor(
        sum(abs(e) for e, _ in errs) / len(errs) * 1e6
    ) / 1e6
    assert r.rmse == pytest.approx(
        math.floor(
            math.sqrt(sum(e * e for e, _ in errs) / len(errs)) * 1e6
        )
        / 1e6,
        abs=2e-6,
    )
    sape = sum(math.floor(abs(e) / a * 1e6) / 1e6 for e, a in errs)
    assert r.mape == pytest.approx(
        math.floor(sape / len(errs) * 1e6) / 1e6, abs=2e-6
    )


def test_revenue_gini_matches_python_and_bounds(spark):
    row = behavior.revenue_gini(spark, SF).collect()[0]
    per_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .collect()
    )
    xs = sorted(
        (float(r.rev), r.o_custkey) for r in per_cust
    )
    n = len(xs)
    s = sum(v for v, _ in xs)
    w = sum((i + 1) * v for i, (v, _) in enumerate(xs))
    gini = 2 * w / (n * s) - (n + 1) / n
    assert row.n_customers == n
    assert row.gini == pytest.approx(
        math.floor(gini * 1e6) / 1e6, abs=2e-6
    )
    assert 0.0 <= row.gini < 1.0


def test_revenue_gini_extremes(spark):
    # perfectly equal revenues -> Gini ~ 0
    eq = spark.createDataFrame(
        [(i, 100.0, "d", "2024-01-01", "p") for i in range(50)],
        "o_custkey long, o_totalprice double, o_orderstatus string,"
        " o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderkey", F.col("o_custkey"))
    import tempfile, os

    d = tempfile.mkdtemp()
    eq.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    row = behavior.revenue_gini(spark, d).collect()[0]
    assert row.gini == pytest.approx(0.0, abs=1e-6)
