"""Exact two-sample KS (operators/stats.py): agreement with a
pure-Python ECDF replica, self-test zero, banding invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import stats

SF = "/root/testdata/sf0.001"


def _python_ks(pairs_a, pairs_b):
    xs = sorted(set(pairs_a) | set(pairs_b))
    na, nb = len(pairs_a), len(pairs_b)
    best, at = -1.0, None
    sa = sorted(pairs_a)
    sb = sorted(pairs_b)
    ia = ib = 0
    for x in xs:
        while ia < na and sa[ia] <= x:
            ia += 1
        while ib < nb and sb[ib] <= x:
            ib += 1
        # raw-double comparison (no epsilon): mirrors the operator's
        # IEEE ordering, where equal-fraction diffs can differ by 1 ulp
        d = abs(ia / na - ib / nb)
        if d > best:
            best, at = d, x
    return best, at


@pytest.fixture(scope="module")
def joined(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_totalprice", "c_mktsegment"
    )


def test_ks_matches_python_replica(spark, joined):
    row = stats.ks_two_sample(
        joined, "o_totalprice", "c_mktsegment", "BUILDING", "MACHINERY"
    ).collect()[0]
    vals = joined.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).collect()
    a = [r.o_totalprice for r in vals if r.c_mktsegment == "BUILDING"]
    b = [r.o_totalprice for r in vals if r.c_mktsegment == "MACHINERY"]
    best, at = _python_ks(a, b)
    assert row.n_a == len(a)
    assert row.n_b == len(b)
    assert row.ks_stat == math.floor(best * 1e6) / 1e6
    assert row.at_value == at


def test_ks_self_distribution_is_zero(spark):
    # duplicate one sample under two labels: identical ECDFs, KS = 0
    df = spark.createDataFrame(
        [(float(v % 97), g) for v in range(500) for g in ("x", "y")],
        ["v", "g"],
    )
    row = stats.ks_two_sample(df, "v", "g", "x", "y").collect()[0]
    assert row.ks_stat == 0.0
    assert row.n_a == row.n_b == 500


def test_ks_banding_and_partitioning_invariance(spark, joined):
    base = stats.ks_two_sample(
        joined, "o_totalprice", "c_mktsegment", "BUILDING", "MACHINERY"
    ).collect()
    few_bands = stats.ks_two_sample(
        joined.repartition(17),
        "o_totalprice",
        "c_mktsegment",
        "BUILDING",
        "MACHINERY",
        n_bands=7,
    ).collect()
    assert base == few_bands


def test_ks_detects_shifted_distribution(spark):
    rows = [(float(i), "base") for i in range(300)] + [
        (float(i) + 150.0, "shift") for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = stats.ks_two_sample(df, "v", "g", "base", "shift").collect()[0]
    # half the mass is disjoint → KS = 0.5 exactly
    assert row.ks_stat == pytest.approx(0.5, abs=1e-6)
