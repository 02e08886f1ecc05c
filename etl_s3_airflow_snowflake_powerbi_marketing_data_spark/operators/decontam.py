"""Train/eval decontamination — n-gram collision detection between a
training corpus and an evaluation set (the standard benchmark-leakage
check in large-scale training-data pipelines; green-field per
SURVEY.md §2.5, no reference analogue).

A document in the eval set is *contaminated* when any of its distinct
word ``n``-grams appears anywhere in the training corpus. The operator
reports, per eval document, how many of its distinct shingles collide —
the usual decision inputs (any-hit boolean, hit fraction) derive from
that.

Scale shape: the eval suite is SMALL by definition (benchmarks are
thousands of documents; the train corpus is the 100 TB side), so the
train scan semi-joins against the eval set's distinct shingle hashes
FIRST — with AQE this plans as a broadcast semi-join, i.e. a map-side
filter at scan speed — and only the surviving train shingles (bounded
by |eval shingle vocabulary|) ever reach a shuffle for the DISTINCT.
Both sides join on a fixed-width 8-byte xxhash64 key — the output
carries no hash values, only collision counts, so any engine verifying
by value can join raw shingle strings and agree (up to 64-bit hash
collisions). The aggregate is map-side combinable. No stage is
quadratic; no corpus-sized shuffle anywhere.
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
    from .dedup import _spread  # noqa: PLC0415

    grams = F.explode(word_shingles(F.col(text_col), n)).alias("__g")
    # Spread the CORPUS side before shingling: the explode + hash is
    # CPU-bound and otherwise runs in however few splits the scan
    # yields. The eval side is small by contract — no spread needed.
    train = _spread(train, text_col)
    eval_sh = eval_df.select(F.col(id_col).alias("id"), grams).select(
        "id", F.xxhash64("__g").alias("__sh")
    )
    eval_set = eval_sh.select("__sh").distinct()
    # Semi-filter the corpus-sized side against the (small) eval
    # shingle vocabulary BEFORE any shuffle: AQE broadcasts eval_set,
    # so train shingles that can't collide die at the scan. No
    # broadcast hint — if someone decontaminates against a huge eval
    # side, AQE falls back to a shuffled semi-join instead of OOMing.
    train_sh = (
        train.select(grams)
        .select(F.xxhash64("__g").alias("__sh"))
        .join(eval_set, "__sh", "left_semi")
        .distinct()
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


def decontaminate_rewrite(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Surgical decontamination: REWRITE training documents by excising
    every token covered by an ``n``-gram that appears in the eval set —
    the remediation counterpart of :func:`ngram_collisions` (which only
    reports leakage, and from the eval side). Dropping whole train docs
    over one leaked span wastes data at 100 TB; the production move
    (PaLM/Llama-style decontamination) is to cut the leaked span and
    keep the rest.

    Both sides fingerprint FULL n-token windows (md5 of the
    space-joined window — the :func:`dedup.dedup_exact_substrings`
    convention, SQL-reproducible); eval documents shorter than ``n``
    tokens are below the protection granularity by definition.

    Scale shape: the eval side is small by contract, so its distinct
    window fingerprints semi-filter the train windows (AQE broadcasts
    the eval set — a map-side kill at scan speed); token-grain
    reconstruction then runs only for the train documents that
    actually contain a leaked span, every other document passes
    through map-only (the `_excise_covered` branch discipline).

    Output: (id_col, n_tokens, n_removed, cleaned_text) per TRAIN doc.
    """
    from .dedup import (  # noqa: PLC0415
        _excise_covered,
        _token_windows,
        _tokenized_base,
    )

    base = _tokenized_base(train, text_col, id_col)
    eval_fps = (
        _token_windows(_tokenized_base(eval_df, text_col, id_col), n)
        .select("fp")
        .distinct()
    )
    flagged = (
        _token_windows(base, n)
        .join(eval_fps, "fp", "left_semi")
        .select("id", "start")
    )
    return _excise_covered(base, flagged, n, id_col)
