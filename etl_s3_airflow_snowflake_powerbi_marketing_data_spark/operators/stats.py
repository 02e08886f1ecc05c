"""Distribution-comparison statistics at scale.

The two-sample Kolmogorov–Smirnov statistic is the standard "did this
segment's distribution shift?" test (release gating, segment
comparisons, drift alarms). Its textbook form needs both empirical
CDFs — a GLOBAL ordered prefix sum, the operation that naively plans
as a single-partition window and dies at 100 TB.

This module computes the EXACT statistic with the repo's banded
two-pass running-sum decomposition (the ``token_budget_select`` /
``ordered_surrogate_key`` pattern):

1. aggregate to the distinct-value grain (one map-side-combinable
   shuffle: per value, counts in each sample);
2. band values by an equal-width grid from a broadcast 1-row min/max
   aggregate — floor is monotone, so band-major order IS value order;
3. per-band count totals (≤ n_bands rows) prefix-summed by a window
   over the BAND table, broadcast back;
4. intra-band running sums windowed per band — the only data-sized
   window, and each band holds ~1/n_bands of the distinct values.

The KS statistic is then the max |CDF_a − CDF_b| over distinct
values: both CDFs are ratios of exact integers, the difference is one
fixed IEEE expression, and the argmax tie-breaks on the value — fully
deterministic, which is what lets a plain windowed SQL aggregate be
the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_two_sample"]


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_bands: int = 1000,
) -> DataFrame:
    """One-row DataFrame with the exact two-sample KS statistic between
    ``value_col``'s distributions in groups ``group_a`` / ``group_b``:
    ``(n_a, n_b, ks_stat, at_value)`` — ``at_value`` is the smallest
    value attaining the supremum (deterministic under ties).

    Null values are excluded (they have no place on the real line);
    empty groups raise at action time via the null guard in the final
    projection (ks_stat NULL would otherwise poison the comparison).
    """
    filtered = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    )
    counts = filtered.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    bounds = counts.agg(
        F.min("v").cast("double").alias("__mn"),
        F.max("v").cast("double").alias("__mx"),
        F.sum("ca").alias("__na"),
        F.sum("cb").alias("__nb"),
    )
    span = F.greatest(
        F.col("__mx") - F.col("__mn"), F.lit(1e-12)
    )
    band: Column = F.least(
        F.floor(
            (F.col("v").cast("double") - F.col("__mn")) / span * n_bands
        ).cast("int"),
        F.lit(n_bands - 1),
    )
    banded = (
        counts.join(F.broadcast(bounds))
        .withColumn("__band", band)
    )
    btot = banded.groupBy("__band").agg(
        F.sum("ca").alias("bca"), F.sum("cb").alias("bcb")
    )
    w_off = Window.orderBy("__band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "__band",
        F.coalesce(F.sum("bca").over(w_off), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("bcb").over(w_off), F.lit(0)).alias("offb"),
    )
    w_in = (
        Window.partitionBy("__band")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = banded.join(F.broadcast(offsets), "__band").select(
        "v",
        "__na",
        "__nb",
        (F.col("offa") + F.sum("ca").over(w_in)).alias("cuma"),
        (F.col("offb") + F.sum("cb").over(w_in)).alias("cumb"),
    )
    diff = F.abs(
        F.col("cuma").cast("double") / F.col("__na").cast("double")
        - F.col("cumb").cast("double") / F.col("__nb").cast("double")
    )
    return (
        cum.select(
            F.col("__na").cast("long").alias("n_a"),
            F.col("__nb").cast("long").alias("n_b"),
            (F.floor(diff * 1e6) / 1e6).alias("ks_stat"),
            F.col("v").alias("at_value"),
            diff.alias("__diff"),
        )
        .orderBy(F.col("__diff").desc(), "at_value")
        .limit(1)
        .drop("__diff")
    )
