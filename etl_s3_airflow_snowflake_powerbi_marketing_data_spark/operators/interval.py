"""Interval (range-containment) join, banded for scale.

The reference has no joins beyond inner-equi (SURVEY.md §2.5); this is
one of the standard time-join extensions (with ``asof.asof_join``) a
Spark-native engine should carry.

Semantics: match a left row (a point in time) to every right row whose
half-open interval ``[start, end)`` contains it, optionally also
requiring equality on ``on`` keys.

Why not the naive formulation: ``left.join(right, (t >= start) & (t <
end))`` has no equi-condition, so Spark plans BroadcastNestedLoopJoin —
O(|L|·|R|) compared pairs, a non-starter once the right side outgrows a
broadcast. Banding restores a hash join: quantize time into fixed-width
buckets, replicate each interval into every bucket it overlaps
(``sequence`` + ``explode``), give each left point its single bucket,
equi-join on (keys…, bucket), then apply the exact containment
predicate. Each (point, interval) pair meets in exactly one bucket — the
point's own — so no dedup pass is needed.

Scale shape: one shuffle on (keys…, bucket) for each side; replication
factor = interval_length / bucket_width + 1, so pick ``bucket_seconds``
near the typical interval length (default one day). Hot buckets are
ordinary skewed hash-join partitions — AQE skew-join splits them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _bucket(col: Column, width: int) -> Column:
    return F.floor(F.unix_timestamp(col) / F.lit(width))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner interval join: left rows at ``left_time`` ∈ right rows'
    ``[right_start, right_end)``, equi-matched on ``on`` keys.

    Output columns: all of ``left``'s, then ``right``'s non-key columns.
    Right columns colliding with left names must be renamed first.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    on = list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"columns collide across sides: {sorted(overlap)}; rename first"
        )

    lt = F.col(left_time).cast("timestamp")
    start = F.col(right_start).cast("timestamp")
    end = F.col(right_end).cast("timestamp")

    # A null point / degenerate interval can never match; drop before
    # the explode so they cost nothing.
    lhs = left.filter(lt.isNotNull()).withColumn(
        "__bucket", _bucket(lt, bucket_seconds)
    )
    rhs = (
        right.filter(start.isNotNull() & end.isNotNull() & (start < end))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    _bucket(start, bucket_seconds), _bucket(end, bucket_seconds)
                )
            ),
        )
    )
    joined = lhs.join(rhs, [*on, "__bucket"]).filter(
        (lt >= start) & (lt < end)
    )
    return joined.drop("__bucket")
