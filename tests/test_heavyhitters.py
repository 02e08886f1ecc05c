"""Exact heavy hitters (operators/heavyhitters.py): output exactness
under arbitrary partitioning, lossy-counting candidate guarantees, and
bounded candidate-pass state."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
    heavyhitters,
)


def _exact(df, key, phi):
    total = df.filter(F.col(key).isNotNull()).count()
    rows = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {
        getattr(r, key): r.n for r in rows if r.n / total >= phi
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # 3 hot keys (1000/500/200) over a 400-key cold tail
    data = (
        [("hot_a",)] * 1000
        + [("hot_b",)] * 500
        + [("hot_c",)] * 200
        + [(f"cold_{i % 400}",) for i in range(2300)]
    )
    return spark.createDataFrame(data, ["k"])


def test_matches_exact_answer(skewed):
    got = {
        r.k: r.n_occurrences
        for r in heavyhitters.heavy_hitters(skewed, "k", phi=0.04).collect()
    }
    assert got == _exact(skewed, "k", 0.04)
    assert set(got) == {"hot_a", "hot_b", "hot_c"}


def test_partitioning_invariance(skewed):
    expected = _exact(skewed, "k", 0.04)
    for df in (skewed.repartition(13), skewed.coalesce(1), skewed.repartition(32, "k")):
        got = {
            r.k: r.n_occurrences
            for r in heavyhitters.heavy_hitters(df, "k", phi=0.04).collect()
        }
        assert got == expected


def test_epsilon_never_changes_output(skewed):
    base = heavyhitters.heavy_hitters(skewed, "k", phi=0.04).collect()
    tight = heavyhitters.heavy_hitters(
        skewed, "k", phi=0.04, epsilon=0.002
    ).collect()
    assert base == tight


def test_numeric_keys_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [(1,)] * 50 + [(2,)] * 30 + [(None,)] * 100 + [(3,)] * 1, ["k"]
    )
    rows = heavyhitters.heavy_hitters(df, "k", phi=0.3).collect()
    # nulls are excluded from both the counts and the denominator (81)
    assert {r.k: r.n_occurrences for r in rows} == {1: 50, 2: 30}


def test_ratio_is_truncated_fraction(skewed):
    total = skewed.count()
    for r in heavyhitters.heavy_hitters(skewed, "k", phi=0.04).collect():
        assert r.ratio == math.floor(r.n_occurrences / total * 1e6) / 1e6


def test_validation():
    with pytest.raises(ValueError):
        heavyhitters.heavy_hitters(None, "k", phi=0.0)
    with pytest.raises(ValueError):
        heavyhitters.heavy_hitters(None, "k", phi=0.1, epsilon=0.1)


def test_candidate_gen_never_drops_a_borderline_periodic_key():
    # adversarial for pruning: a key at EXACTLY phi frequency, spread
    # one occurrence per batch so every inter-arrival gap gives the
    # pruner a chance to evict it, buried in a rotating unique tail
    phi, eps = 0.01, 0.005
    gen = heavyhitters._make_candidate_gen("k", phi, eps)
    batches = []
    uid = 0
    for _ in range(50):
        vals = ["borderline"]
        for _ in range(99):
            vals.append(f"tail_{uid}")
            uid += 1
        batches.append(pd.DataFrame({"k": vals}))
    out = list(gen(iter(batches)))
    cands = set(out[0]["k"])
    # lossy counting's f >= true - eps*n bound makes the (phi-eps)*n
    # emission rule a guaranteed superset of every ratio->=phi key
    assert "borderline" in cands
    # ... while the rotating tail (4950 singletons) is pruned, not kept
    assert len(cands) < 1000
