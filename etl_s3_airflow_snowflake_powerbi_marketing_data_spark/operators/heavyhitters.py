"""Exact distributed heavy hitters via lossy-counting candidates.

The φ-heavy-hitter problem (all keys with frequency ≥ φ·N) at 100 TB
cannot afford a full groupBy over the key domain when the domain is
huge (every token, every line fingerprint, every URL). The classic
two-pass answer, and the one implemented here:

1. **Candidate pass — no shuffle.** Each partition runs Manku/Motwani
   lossy counting (VLDB 2002) over its local stream with error ε < φ
   and emits every key whose stored count ≥ (φ−ε)·n_local. Lossy
   counting undercounts by at most ε·n_local, so a key with true local
   ratio ≥ φ is always emitted; by pigeonhole, a key with GLOBAL ratio
   ≥ φ has local ratio ≥ φ in at least one partition. The candidate
   union is therefore a superset of the true answer, at O(1/ε) memory
   per partition and zero shuffle.
2. **Recount pass — tiny shuffle.** The (small) candidate set
   broadcast-joins back onto the data for an exact recount, and the
   final filter keeps keys with exact ratio ≥ φ.

Because pass 2 is exact, the OUTPUT is exactly the φ-heavy-hitter set
— independent of partitioning, batch boundaries, or the ε chosen —
which is what lets a plain SQL aggregate serve as the oracle. The
sketch only ever affects the candidate superset size.

The per-batch candidate maintenance is vectorized (pandas
``value_counts`` per Arrow batch merged into a dict) — no per-row
Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def _make_candidate_gen(key_col: str, phi: float, epsilon: float):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        delta: dict = {}
        n_seen = 0
        for pdf in batches:
            threshold_at_insert = math.floor(epsilon * n_seen)
            vc = pdf[key_col].value_counts()
            for key, c in vc.items():
                if key in counts:
                    counts[key] += int(c)
                else:
                    counts[key] = int(c)
                    # a key absent from the table has true count so far
                    # ≤ the prune threshold in force when it was last
                    # dropped (or 0 if never seen) — record that bound
                    delta[key] = threshold_at_insert
            n_seen += len(pdf)
            prune_below = math.floor(epsilon * n_seen)
            if prune_below > 0:
                for key in [
                    k for k, c in counts.items() if c + delta[k] <= prune_below
                ]:
                    del counts[key]
                    del delta[key]
        out = [
            k
            for k, c in counts.items()
            if n_seen > 0 and c >= (phi - epsilon) * n_seen
        ]
        yield pd.DataFrame({key_col: pd.Series(out, dtype=object)})

    return gen


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float = 0.001,
    epsilon: float | None = None,
    ratio_col: str = "ratio",
    count_col: str = "n_occurrences",
) -> DataFrame:
    """All keys of ``df[key_col]`` with frequency ≥ ``phi`` · N,
    exactly, with counts and floor-truncated ratios.

    ``epsilon`` is the lossy-counting error (default ``phi / 2``);
    it trades candidate-pass memory (O(1/ε) entries per partition)
    against candidate-set size and never affects the result.

    Scale shape: one shuffle-free map pass (Arrow-batched, vectorized),
    one broadcast semi-join recount whose aggregate keys are only the
    candidates, and a broadcast 1-row total. Null keys are not counted
    (a heavy null is a data-quality problem — surface it with
    ``operators.quality``, not here).
    """
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    eps = phi / 2 if epsilon is None else epsilon
    if not 0 < eps < phi:
        raise ValueError(f"epsilon must be in (0, phi), got {eps}")

    keyed = df.filter(F.col(key_col).isNotNull()).select(key_col)
    schema = keyed.schema
    candidates = (
        keyed.mapInPandas(_make_candidate_gen(key_col, phi, eps), schema)
        .distinct()
    )
    total = keyed.agg(F.count("*").cast("long").alias("__total"))
    counted = (
        keyed.join(F.broadcast(candidates), key_col)
        .groupBy(key_col)
        .agg(F.count("*").cast("long").alias(count_col))
    )
    ratio: Column = F.col(count_col).cast("double") / F.col("__total").cast(
        "double"
    )
    return (
        counted.join(F.broadcast(total))
        .filter(ratio >= phi)
        .select(
            key_col,
            count_col,
            (F.floor(ratio * 1e6) / 1e6).alias(ratio_col),
        )
        .orderBy(F.col(count_col).desc(), key_col)
    )
