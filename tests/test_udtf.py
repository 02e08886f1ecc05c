"""Unit tests for the Python UDTF surface (functions/udtfs.py).

The lateral-join SQL is GENERATED — these pin the two edge cases the
string construction can break on (ADVICE r04): an input with ONLY the
text column (empty carried-column list), and column names that need
backtick quoting.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import udtfs


def test_split_sentences_basic(spark):
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, None)], ["doc_id", "text"]
    )
    out = udtfs.split_sentences_table(spark, df).collect()
    # NULL text vanishes (inner lateral); 3 sentences from doc 1
    # (the split pattern consumes the delimiter of non-final sentences)
    assert [(r.doc_id, r.sent_index, r.sentence) for r in out] == [
        (1, 0, "One"),
        (1, 1, "Two"),
        (1, 2, "Three?"),
    ]


def test_split_sentences_text_only_input(spark):
    """No carried columns: the generated SELECT must not start with a
    dangling comma."""
    df = spark.createDataFrame([("A. B.",)], ["text"])
    out = udtfs.split_sentences_table(spark, df).collect()
    assert [(r.sent_index, r.sentence) for r in out] == [(0, "A"), (1, "B.")]


def test_split_sentences_quotable_column_names(spark):
    """Column names with spaces/keywords survive via backtick quoting."""
    df = spark.createDataFrame(
        [(7, "Hi there. Bye.")], ["doc id", "the text"]
    )
    out = udtfs.split_sentences_table(spark, df, text_col="the text").collect()
    assert [(r["doc id"], r.sent_index) for r in out] == [(7, 0), (7, 1)]
