"""Declarative constraint checker (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import quality


def test_each_constraint_kind_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.io", 10.0, "O", 1),
            (2, None, 20.0, "F", 1),        # not_null violation
            (2, "c@x.io", -5.0, "O", 2),    # dup key + range violation
            (3, "nope", 30.0, "Z", 99),     # matches + in_set + ref violation
        ],
        ["k", "email", "amount", "status", "ref_k"],
    )
    dim = spark.createDataFrame([(1,), (2,)], ["dk"])
    out = {
        r.constraint: r
        for r in quality.check_constraints(
            df,
            {
                "email_not_null": ("not_null", "email"),
                "amount_range": ("range", "amount", 0.0, 100.0),
                "status_in_set": ("in_set", "status", ["O", "F"]),
                "email_format": ("matches", "email", r"[a-z]+@[a-z.]+"),
                "k_unique": ("unique", "k"),
                "ref_k_in_dim": ("ref", "ref_k", dim, "dk"),
            },
        ).collect()
    }
    assert len(out) == 6
    assert (out["email_not_null"].n_violations, out["email_not_null"].passed) == (1, False)
    assert out["amount_range"].n_violations == 1
    assert out["status_in_set"].n_violations == 1
    # null email: rlike(null) -> null -> not counted; 'nope' fails
    assert out["email_format"].n_violations == 1
    # both rows of the duplicated key count as violations
    assert (out["k_unique"].n_violations, out["k_unique"].n_rows) == (2, 4)
    assert out["ref_k_in_dim"].n_violations == 1
    assert all(r.n_rows == 4 for r in out.values())


def test_all_green_passes(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], ["k", "v"])
    out = quality.check_constraints(
        df,
        {
            "k_unique": ("unique", "k"),
            "v_range": ("range", "v", 0.0, 10.0),
        },
    ).collect()
    assert all(r.passed for r in out)


def test_row_local_checks_share_one_aggregate(spark):
    """Adding more row-local constraints must NOT add passes over the
    data: they all fold into a single aggregate node."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    plan = quality.check_constraints(
        df,
        {
            "a_nn": ("not_null", "a"),
            "b_nn": ("not_null", "b"),
            "a_range": ("range", "a", 0, 1000),
            "b_range": ("range", "b", 0, 1000),
        },
    )._jdf.queryExecution().optimizedPlan().toString()
    # one scan feeding one aggregate — the Range source appears once
    assert plan.count("Range (0, 100") == 1, plan


def test_validation_errors(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="no constraints"):
        quality.check_constraints(df, {})
    with pytest.raises(ValueError, match="unknown constraint kinds"):
        quality.check_constraints(df, {"x": ("bogus", "id")})


def test_constraint_names_restricted_to_identifiers(spark):
    """Names flow into stack() string literals and __v_ aliases —
    quotes/spaces/hyphens must be rejected up front, not silently
    generate broken or injectable SQL (ADVICE r04)."""
    df = spark.range(3)
    for bad in ("a b", "a-b", "a'b", "a`b", ""):
        with pytest.raises(ValueError, match="constraint names"):
            quality.check_constraints(df, {bad: ("not_null", "id")})


def test_numeric_corr_pairs_hand_computed(spark):
    """y = 2x -> exactly 1.0 (sqrt(144) is exact); z = -x -> -1.0;
    constant column -> 0.0 against everything (zero-variance rule);
    a row with any NULL is excluded listwise (n = 3 for all pairs)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        quality,
    )

    df = spark.createDataFrame(
        [
            (1.0, 2.0, -1.0, 7.0),
            (2.0, 4.0, -2.0, 7.0),
            (3.0, 6.0, -3.0, 7.0),
            (9.0, None, 9.0, 9.0),
        ],
        "x double, y double, z double, w double",
    )
    out = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in quality.numeric_corr_pairs(df, ["x", "y", "z", "w"]).collect()
    }
    assert out[("x", "y")] == (1.0, 3)
    assert out[("x", "z")] == (-1.0, 3)
    assert out[("y", "z")] == (-1.0, 3)
    for pair in [("x", "w"), ("y", "w"), ("z", "w")]:
        assert out[pair] == (0.0, 3)


def test_table_column_profile_known_values(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        quality,
    )

    rows = [
        ("a", 1),
        ("a", 2),
        ("b", None),
        (None, 2),
        ("a", 2),
    ]
    df = spark.createDataFrame(rows, "s string, n int")
    out = {
        r.column_name: r
        for r in quality.table_column_profile(df, ["s", "n"]).collect()
    }
    s = out["s"]
    assert (s.n_rows, s.n_null, s.n_distinct) == (5, 1, 2)
    assert (s.top_value, s.top_count) == ("a", 3)
    n = out["n"]
    assert (n.n_rows, n.n_null, n.n_distinct) == (5, 1, 2)
    assert (n.top_value, n.top_count) == ("2", 3)


def test_table_column_profile_all_null_column(spark):
    """An all-NULL column must still emit its profile row (n_null =
    n_rows, NULL mode) — an inner join against the empty mode frame
    used to drop it silently (ADVICE r05)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        quality,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "s string, gone string"
    )
    out = {
        r.column_name: r
        for r in quality.table_column_profile(df, ["s", "gone"]).collect()
    }
    assert set(out) == {"s", "gone"}
    g = out["gone"]
    assert (g.n_rows, g.n_null, g.n_distinct) == (2, 2, 0)
    assert g.top_value is None and g.top_count is None


def test_table_column_profile_mode_tiebreak_and_validation(spark):
    import pytest

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        quality,
    )

    df = spark.createDataFrame([("x",), ("y",)], "v string")
    row = quality.table_column_profile(df, ["v"]).collect()[0]
    # equal frequencies: the smaller string wins deterministically
    assert (row.top_value, row.top_count) == ("x", 1)
    with pytest.raises(ValueError):
        quality.table_column_profile(df, [])


# --- script-aware CJK tokenization (VERDICT r11 item 3) ---------------


def _cjk_frame(spark):
    return spark.createDataFrame(
        [
            (1, "机器学习模型需要大量高质量训练数据才能取得良好效果"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "データの品質を確認する 한글 mixed words here"),
        ],
        "doc_id long, text string",
    )


def test_token_count_script_aware_counts_cjk_codepoints(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = _cjk_frame(spark)
    rows = {
        r.doc_id: (r.ws, r.sa)
        for r in df.select(
            "doc_id",
            text_fn.token_count(F.col("text")).alias("ws"),
            text_fn.token_count(F.col("text"), script_aware=True).alias(
                "sa"
            ),
        ).collect()
    }
    assert rows[1] == (1, 25)  # one giant "word" vs per-codepoint
    assert rows[2] == (10, 10)  # pure ASCII: flag is a no-op
    assert rows[3][0] == 5 and rows[3][1] == 16  # 11 CJK cp + 1 + 4


def test_gopher_gate_keeps_cjk_docs_with_flag(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = _cjk_frame(spark)
    kw = dict(
        min_words=20,
        max_words=100_000,
        min_mean_word_len=1.0,
        max_mean_word_len=12.0,
        max_punct_ratio=0.20,
        min_stopword_ratio=0.0,
    )
    off = {
        r.doc_id: r.keep
        for r in text_fn.gopher_quality_flags(df, **kw).collect()
    }
    on = {
        r.doc_id: r.keep
        for r in text_fn.gopher_quality_flags(
            df, script_aware=True, **kw
        ).collect()
    }
    assert off[1] is False and on[1] is True  # the discarded-language fix
    assert off[2] == on[2]  # ASCII unaffected


def test_chunk_documents_script_aware_windows(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = _cjk_frame(spark).filter(F.col("doc_id") == 1)
    off = text_fn.chunk_documents(df, chunk_size=8, stride=8).collect()
    on = text_fn.chunk_documents(
        df, chunk_size=8, stride=8, script_aware=True
    ).collect()
    assert len(off) == 1 and off[0].n_tokens == 1
    assert len(on) == 4 and [
        r.n_tokens for r in sorted(on, key=lambda r: r.chunk_index)
    ] == [8, 8, 8, 1]


def test_bm25_finds_cjk_term_with_flag(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = _cjk_frame(spark)
    for strategy in ("conditional", "inverted"):
        off = text_fn.bm25_topk(
            df, ["品"], top_k=3, strategy=strategy
        ).collect()
        on = text_fn.bm25_topk(
            df, ["品"], top_k=3, strategy=strategy, script_aware=True
        ).collect()
        assert all(r.score == 0.0 for r in off)
        hits = {r.doc_id for r in on if r.score > 0.0}
        assert hits == {3}  # 品 appears in doc 3 (and 质 only in 1)


def test_surprisal_script_aware_token_grain(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = _cjk_frame(spark)
    on = {
        r.doc_id: r.n_tokens
        for r in text_fn.unigram_surprisal(
            df, script_aware=True
        ).collect()
    }
    assert on[1] == 25 and on[3] == 16


def test_bpe_script_aware_words(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        bpe,
    )

    assert bpe._java_ws_words("机器学习 ok", script_aware=True) == [
        "机", "器", "学", "习", "ok",
    ]
    df = _cjk_frame(spark)
    merges = bpe.train_bpe_merges_spark(df, script_aware=True)
    counts = {
        r.doc_id: r.n_words
        for r in bpe.bpe_token_counts(
            df, merges, script_aware=True
        ).collect()
    }
    assert counts[1] == 25 and counts[2] == 10 and counts[3] == 16
