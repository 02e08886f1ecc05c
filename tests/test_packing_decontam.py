"""Sequence packing + decontamination operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions.text import (
    token_count,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.decontam import (
    ngram_collisions,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.packing import (
    pack_sequences,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.tables import load_table


def test_pack_sequences_layout_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    out = pack_sequences(
        docs, token_col="n_tokens", order_by="doc_id", max_tokens=512
    ).orderBy("doc_id")
    rows = out.collect()
    # Exact streaming-packer layout: each doc starts where the previous
    # one ended on the global token axis.
    cum = 0
    for r in rows:
        assert r["pack_id"] == cum // 512
        assert r["pack_offset"] == cum % 512
        cum += r["n_tokens"]
    # Bins are dense: every id up to the last appears.
    pack_ids = {r["pack_id"] for r in rows}
    assert pack_ids == set(range(max(pack_ids) + 1))


def test_pack_sequences_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    a = pack_sequences(docs, "n_tokens", "doc_id", 1024).orderBy("doc_id")
    b = pack_sequences(
        docs.repartition(13), "n_tokens", "doc_id", 1024
    ).orderBy("doc_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_pack_sequences_rejects_bad_budget(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    with pytest.raises(ValueError):
        pack_sequences(docs, "n_tokens", "doc_id", 0)


def test_ngram_collisions_detects_exact_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated training material about spark plans"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [
            # Contains a verbatim 5-gram from train doc 1.
            (10, "witnesses saw the quick brown fox jumps away"),
            # No 5-token overlap with any train doc.
            (11, "entirely novel evaluation sentence with fresh words"),
            # Shorter than 5 tokens -> single whole-text shingle, no hit.
            (12, "tiny eval doc"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_collisions(train, eval_df, n=5).collect()
    }
    assert out[10]["contaminated"] and out[10]["n_hits"] >= 1
    assert not out[11]["contaminated"] and out[11]["n_hits"] == 0
    assert not out[12]["contaminated"]
    assert out[12]["n_shingles"] == 1
    # Every eval doc is audited, hit or not.
    assert set(out) == {10, 11, 12}
