"""Train/eval decontamination — n-gram collision detection between a
training corpus and an evaluation set (the standard benchmark-leakage
check in large-scale training-data pipelines; green-field per
SURVEY.md §2.5, no reference analogue).

A document in the eval set is *contaminated* when any of its distinct
word ``n``-grams appears anywhere in the training corpus. The operator
reports, per eval document, how many of its distinct shingles collide —
the usual decision inputs (any-hit boolean, hit fraction) derive from
that.

Scale shape: train shingles collapse to a DISTINCT shingle set before
the join (the corpus-size→shingle-vocabulary reduction is what makes
this feasible at 100 TB), both sides join on a fixed-width 8-byte
xxhash64 key — the output carries no hash values, only collision
counts, so any engine verifying by value can join raw shingle strings
and agree (up to 64-bit hash collisions). The aggregate is map-side
combinable. No stage is quadratic; the only big shuffles are keyed by
shingle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def ngram_collisions(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per eval document: (id, n_shingles, n_hits, contaminated).

    ``n_shingles`` counts the doc's distinct word ``n``-grams,
    ``n_hits`` how many of them occur anywhere in ``train``,
    ``contaminated`` whether any did. Documents shorter than ``n``
    tokens contribute their full token-join as a single shingle (same
    convention as :func:`dedup.word_shingles`), so nothing silently
    drops out of the audit.
    """
    grams = F.explode(word_shingles(F.col(text_col), n)).alias("__g")
    train_sh = (
        train.select(grams).select(F.xxhash64("__g").alias("__sh")).distinct()
    )
    eval_sh = eval_df.select(F.col(id_col).alias("id"), grams).select(
        "id", F.xxhash64("__g").alias("__sh")
    )

    hits = (
        eval_sh.join(
            train_sh.withColumn("__hit", F.lit(1)), "__sh", "left"
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        )
    )
    return hits.select(
        F.col("id").alias(id_col),
        "n_shingles",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )
