"""Time-series imputation over regularized daily grids.

``order_priority_daily_gapfill`` (plans/relational.py) regularizes a
sparse daily series with zeros + LOCF forward-fill; this module adds
the other imputation a forecasting/feature pipeline expects: LINEAR
interpolation between the nearest observed neighbors, which needs the
backward-looking AND forward-looking neighbor per gap day.

Scale shape: the input is an already-aggregated (key, day) grain —
bounded by |keys| × |days|, the DOMAIN, not the fact-table row count —
so the per-key ordered windows here are the same
bounded-post-aggregation windows the KPI trend family runs. The
calendar explode spans each key's own [min(day), max(day)] interval
(no extrapolation past the observed ends), so every gap day has both
neighbors by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import trunc6


def interpolate_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Complete each key's daily calendar and linearly interpolate the
    value on missing days: ``prev + (next - prev) · Δprev/Δspan`` with
    the nearest non-null neighbors on either side. Observed days pass
    through bit-unchanged; interpolated values truncate to 6 decimals
    (IEEE-identical formula on both oracle engines). Contract: ``df``
    holds at most one non-null value per (key, day).

    Output: (key, day, value, is_interpolated).
    """
    bounds = df.groupBy(key_col).agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    cal = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr("interval 1 day")
            )
        ).alias(day_col),
    )
    j = cal.join(df, [key_col, day_col], "left").withColumn(
        "__obs", F.col(value_col)
    )
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("__obs").isNotNull(), F.col(day_col))
    pv = F.last("__obs", ignorenulls=True).over(w_prev)
    pd_ = F.last(obs_day, ignorenulls=True).over(w_prev)
    nv = F.first("__obs", ignorenulls=True).over(w_next)
    nd = F.first(obs_day, ignorenulls=True).over(w_next)
    frac = F.datediff(F.col(day_col), pd_).cast("double") / F.datediff(
        nd, pd_
    ).cast("double")
    interp = trunc6(pv + (nv - pv) * frac)
    return j.select(
        key_col,
        day_col,
        F.when(F.col("__obs").isNotNull(), F.col("__obs"))
        .otherwise(interp)
        .alias(value_col),
        F.col("__obs").isNull().alias("is_interpolated"),
    )
