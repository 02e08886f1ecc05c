"""Merge-layer semantics (SURVEY.md §2.1 S6/S7): ignore vs update modes,
composite keys, source dedup, idempotence (FIXTURES.md §5 edge cases)."""

from __future__ import annotations

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import merge


def _target(spark):
    return spark.createDataFrame(
        [("k1", "old1"), ("k2", "old2")], "key string, val string"
    )


def _source(spark):
    return spark.createDataFrame(
        [("k2", "new2"), ("k3", "new3")], "key string, val string"
    )


def test_merge_ignore_keeps_target_rows(spark):
    out = merge.merge_ignore(_target(spark), _source(spark), ["key"])
    got = {r["key"]: r["val"] for r in out.collect()}
    # matched key k2 untouched; new key k3 inserted
    assert got == {"k1": "old1", "k2": "old2", "k3": "new3"}


def test_merge_update_overwrites_matched(spark):
    out = merge.merge_update(_target(spark), _source(spark), ["key"])
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {"k1": "old1", "k2": "new2", "k3": "new3"}


def test_merge_composite_key(spark):
    tgt = spark.createDataFrame(
        [("a", 1, "t1"), ("a", 2, "t2")], "k1 string, k2 int, val string"
    )
    src = spark.createDataFrame(
        [("a", 2, "s2"), ("b", 1, "s3")], "k1 string, k2 int, val string"
    )
    out = merge.merge_update(tgt, src, ["k1", "k2"])
    got = {(r["k1"], r["k2"]): r["val"] for r in out.collect()}
    assert got == {("a", 1): "t1", ("a", 2): "s2", ("b", 1): "s3"}


def test_merge_dedups_duplicate_source_keys(spark):
    tgt = _target(spark)
    src = spark.createDataFrame(
        [("k3", "dup_b"), ("k3", "dup_a")], "key string, val string"
    )
    out = merge.merge_update(tgt, src, ["key"], source_order_by=["val"])
    got = {r["key"]: r["val"] for r in out.collect()}
    # deterministic survivor: first by val ordering
    assert got["k3"] == "dup_a"
    assert out.count() == 3


def test_merge_update_idempotent(spark):
    """Re-running the same day's load changes nothing (SURVEY §7 M3)."""
    tgt = _target(spark)
    src = _source(spark)
    once = merge.merge_update(tgt, src, ["key"])
    twice = merge.merge_update(once, src, ["key"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_ignore_idempotent(spark):
    tgt = _target(spark)
    src = _source(spark)
    once = merge.merge_ignore(tgt, src, ["key"])
    twice = merge.merge_ignore(once, src, ["key"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
