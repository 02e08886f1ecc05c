"""As-of join and stateful streaming sessionization."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.asof import (
    asof_join,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.streaming import (
    sessions as ss,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(5), "c")],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(20), 200.0), (3, _ts(0), 999.0)],
        "k long, rt timestamp, px double",
    )
    out = {
        (r["k"], r["ev"]): r["px"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", right_cols=["px"]
        ).collect()
    }
    assert out[(1, "a")] == 100.0
    assert out[(1, "b")] == 200.0
    assert out[(2, "c")] is None


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts(20), "x")], "k long, t timestamp, ev string")
    right = spark.createDataFrame([(1, _ts(20), 7.0)], "k long, rt timestamp, px double")
    [row] = asof_join(
        left, right, on="k", left_time="t", right_time="rt", right_cols=["px"]
    ).collect()
    assert row["px"] == 7.0


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], "k long, t timestamp, ev string")
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0), (1, _ts(15), 2.0), (1, _ts(25), 3.0)],
        "k long, rt timestamp, px double",
    )
    [row] = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        right_cols=["px"],
        direction="forward",
    ).collect()
    assert row["px"] == 2.0


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        [(eid, int(ts.timestamp() * 1e9), uid, "view", val, "{}")
         for eid, ts, uid, val in rows],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_streaming_sessions_state_carries_across_batches(spark, tmp_path):
    # Two files => two micro-batches (maxFilesPerTrigger=1). User 1's
    # second-batch event continues the open session; user 2 starts a
    # new session after a >30min gap.
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    f1 = str(tmp_path / "b1.parquet")
    f2 = str(tmp_path / "b2.parquet")
    _write_events(spark, f1, [
        (1, base, 1, 1.0),
        (2, base + dt.timedelta(minutes=10), 1, 2.0),
        (3, base, 2, 5.0),
    ])
    _write_events(spark, f2, [
        (4, base + dt.timedelta(minutes=20), 1, 3.0),
        (5, base + dt.timedelta(minutes=60), 2, 7.0),
    ])
    import shutil
    src = str(tmp_path / "stream")
    import os
    os.makedirs(src, exist_ok=True)
    import time
    now = time.time()
    for i, f in enumerate([f1, f2]):
        part = [p for p in os.listdir(f) if p.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(os.path.join(f, part), dst)
        # The file stream source orders batches by modification time;
        # equal mtimes make batch order arbitrary.
        os.utime(dst, (now + i * 10, now + i * 10))

    out = ss.run_streaming_sessions(spark, src + "/*", query_name="t_sessions")
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in out.collect()
    }
    assert rows[(1, 1)]["n_events"] == 3
    assert rows[(1, 1)]["session_value"] == 6.0
    assert rows[(2, 1)]["n_events"] == 1
    assert rows[(2, 2)]["n_events"] == 1
    assert rows[(2, 2)]["session_value"] == 7.0


def test_cosine_dup_pairs_lsh_subset_of_exact(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        similarity,
    )
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_dup_pairs_lsh(emb, threshold=0.4).collect()
    }
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.5
    blocked = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_dup_pairs_blocked(emb, threshold=0.4).collect()
    }
    assert blocked == exact


def test_asof_null_timestamps_stay_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, None, "b")], "k long, t timestamp, ev string"
    )
    right = spark.createDataFrame(
        [(1, None, 666.0), (1, _ts(5), 5.0)], "k long, rt timestamp, px double"
    )
    out = {
        r["ev"]: r["px"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", right_cols=["px"]
        ).collect()
    }
    # Null-time right row must never match; null-time left row must
    # never inherit a carried value.
    assert out == {"a": 5.0, "b": None}


def test_asof_rejects_column_collision(spark):
    import pytest

    left = spark.createDataFrame([(1, _ts(1), 9.0)], "k long, t timestamp, px double")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, rt timestamp, px double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", right_time="rt",
                  right_cols=["px"])


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "near"), (1, _ts(59), "far")],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 5.0)], "k long, rt timestamp, px double"
    )
    out = {
        r["ev"]: r["px"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["px"], tolerance="30 minutes",
        ).collect()
    }
    assert out == {"near": 5.0, "far": None}


def test_interval_join_semantics(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.interval import (
        interval_join,
    )

    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),   # inside A
            (2, 1, _ts(30)),   # == A end (half-open: excluded)
            (3, 1, _ts(0)),    # == A start (included)
            (4, 2, _ts(10)),   # right key, wrong user
            (5, 1, None),      # null point never matches
        ],
        "event_id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(30), "A"), (9, _ts(0), _ts(30), "B")],
        "k long, s timestamp, e timestamp, label string",
    )
    out = interval_join(
        left, right, left_time="t", right_start="s", right_end="e", on=["k"],
        bucket_seconds=600,
    )
    got = {(r["event_id"], r["label"]) for r in out.collect()}
    assert got == {(1, "A"), (3, "A")}
    # Banding must produce a hash join, not a nested loop.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_join_bucket_straddle(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.interval import (
        interval_join,
    )

    # Interval spans many buckets; point in a middle bucket still
    # matches exactly once.
    left = spark.createDataFrame(
        [(1, 1, _ts(35))], "event_id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), _ts(59), "wide")],
        "k long, s timestamp, e timestamp, label string",
    )
    out = interval_join(
        left, right, left_time="t", right_start="s", right_end="e", on=["k"],
        bucket_seconds=60,
    ).collect()
    assert [(r["event_id"], r["label"]) for r in out] == [(1, "wide")]


def test_interval_join_validation(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.interval import (
        interval_join,
    )

    left = spark.createDataFrame([(1, _ts(1))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(9))], "k long, t timestamp, e timestamp"
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(left, right, left_time="t", right_start="t",
                      right_end="e", on=["k"])
    right2 = spark.createDataFrame(
        [(1, _ts(0), _ts(9))], "k long, s timestamp, e timestamp"
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(left, right2, left_time="t", right_start="s",
                      right_end="e", on=["k"], bucket_seconds=0)


def test_asof_carries_composite_row_not_stitched_columns(spark):
    # The nearest right row has price=NULL: pandas merge_asof carries
    # that row AS-IS (price null), never a Frankenstein row mixing the
    # newer row's qty with an older row's price. Regression for the
    # per-column last(ignorenulls) formulation.
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    right = spark.createDataFrame(
        [
            ("k", t0, 100.0, 1),
            ("k", t0 + dt.timedelta(minutes=5), None, 2),
        ],
        ["key", "rt", "price", "qty"],
    )
    left = spark.createDataFrame(
        [("k", t0 + dt.timedelta(minutes=10))], ["key", "lt"]
    )
    out = asof_join(
        left, right, on="key", left_time="lt", right_time="rt",
        right_cols=["price", "qty"],
    ).first()
    assert out["qty"] == 2
    assert out["price"] is None  # from the SAME (nearest) row
    # And the tolerance uses that same row's timestamp: the nearest
    # row is 5 min away -> within 6 minutes, even though the only row
    # with a non-null price is 10 min away.
    out2 = asof_join(
        left, right, on="key", left_time="lt", right_time="rt",
        right_cols=["price", "qty"], tolerance="6 minutes",
    ).first()
    assert out2["qty"] == 2 and out2["price"] is None


def test_conversion_funnel_ordering(spark, tmp_path):
    """Stage credit requires strictly-later events: a click BEFORE the
    first view must not count, nor a purchase before the first
    qualifying click."""
    import datetime as dt

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        relational,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, user, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        # user 1: view -> click -> purchase (full funnel)
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        # user 2: click BEFORE view, purchase after view but no click after
        # view: counts for view only
        ev(4, 2, "click", 0), ev(5, 2, "view", 10), ev(6, 2, "purchase", 20),
        # user 3: view -> click, purchase BEFORE the click: stops at click
        ev(7, 3, "purchase", 0), ev(8, 3, "view", 5), ev(9, 3, "click", 15),
        # user 4: never views
        ev(10, 4, "purchase", 0), ev(11, 4, "click", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "funnel_events")
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        r["stage"]: (r["n_users"], r["pct_of_prev"])
        for r in relational.conversion_funnel(spark, path).collect()
    }
    assert out["view"][0] == 3          # users 1,2,3
    assert out["click_after_view"][0] == 2   # users 1,3
    assert out["purchase_after_click"][0] == 1  # user 1 only
    assert out["purchase_after_click"][1] == 50.0


def test_source_interleave_order_matches_python_model_and_is_even(spark):
    """Differential: ranks and keys equal a hashlib-md5 Python replica.
    Evenness (the property a hash shuffle lacks): in every prefix of
    the epoch order, each source's share is within 1 of proportional."""
    import hashlib

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    rows = [(i, f"s{i % 3}") for i in range(30)] + [
        (100 + i, "s_big") for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.source_interleave_order(df, "doc_id", "source").collect()

    by_src: dict[str, list[tuple[str, int]]] = {}
    for i, src in rows:
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_src.setdefault(src, []).append((h, i))
    expect = {}
    for src, hs in by_src.items():
        m = len(hs)
        for rn, (_, i) in enumerate(sorted(hs), start=1):
            expect[i] = (rn, (2 * rn - 1) * 1_048_576 // (2 * m))
    assert {r["doc_id"]: (r["src_rank"], r["interleave_key"]) for r in out} == expect

    ordered = sorted(out, key=lambda r: (r["interleave_key"], r["source"], r["src_rank"]))
    total = len(rows)
    sizes = {s: sum(1 for _, src in rows if src == s) for s in by_src}
    seen = {s: 0 for s in by_src}
    for pos, r in enumerate(ordered, start=1):
        seen[r["source"]] += 1
        for s in sizes:
            assert abs(seen[s] - pos * sizes[s] / total) <= 1.0
