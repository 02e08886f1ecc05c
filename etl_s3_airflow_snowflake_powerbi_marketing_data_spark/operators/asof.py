"""As-of (nearest-event) join — an operator class the reference lacks
(SURVEY.md §2.5 lists joins beyond inner-equi as absent) but that event
analytics constantly needs: "for each event, the most recent fact for
the same key at or before the event time".

Spark has no built-in as-of join, and the naive formulation (range join
+ per-row argmax) explodes into an O(N·M) BroadcastNestedLoop or a
theta-join. This implementation is the union-merge pattern:

1. Tag both inputs and ``unionByName`` them into one stream of
   (key, time, side, payload) rows.
2. One window per key, ordered by (time, side) with right rows sorting
   before left rows at equal timestamps (so "at or before" includes
   exact matches), carries the last right payload forward as ONE
   struct (``last(struct, ignorenulls=True)`` over an
   unbounded-preceding frame). The single-struct carry matters: with
   independent per-column ``last(ignorenulls=True)`` calls, a NULL in
   one payload column of the nearest right row would stitch that
   column from an OLDER row — a composite no single right row
   produced, diverging from pandas ``merge_asof``. The struct is
   non-null for every right row, so all fields (and the matched
   timestamp the tolerance check uses) come from the same row.
3. Keep the left rows.

Cost: exactly ONE shuffle (hash on the join key for the window) over
rows-left + rows-right — the same price as a regular sort-merge join,
with no pair blowup. Skewed keys behave like any skewed window
partition (salt or AQE-skew handles them upstream).

Ties on the right side (same key, same timestamp) must be resolved by
the caller (pre-dedupe to one row per (key, time)) — the window carries
whichever sorts last otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach ``right_cols`` from the
    right row with the same ``on`` key and the greatest ``right_time``
    ≤ ``left_time`` (direction="backward") or the least ``right_time``
    ≥ ``left_time`` (direction="forward"). Unmatched left rows keep
    nulls — left-outer semantics, one output row per left row.

    ``tolerance`` (an interval string, e.g. ``"30 minutes"``) bounds
    the staleness of a match: a carried row further than the tolerance
    from the left timestamp reverts to null (pandas ``merge_asof``
    semantics). Costs nothing extra — the matched time already rides
    the window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        # The union-merge would silently fuse same-named columns.
        raise ValueError(
            f"right_cols collide with left columns: {sorted(overlap)}; "
            "rename the right side before joining"
        )

    carried = [c for c in right_cols]
    l_tag = (
        left.withColumn("__t", F.col(left_time).cast("timestamp"))
        .withColumn("__side", F.lit(1))
    )
    r_tag = (
        right.select(
            F.col(on),
            F.col(right_time).cast("timestamp").alias("__t"),
            *[F.col(c) for c in carried],
        )
        # A right row with a null time has no position on the axis and
        # can never be a legitimate match; dropping it here also stops
        # its payload from carrying into every row (null sorts first
        # ascending, i.e. "before everything").
        .filter(F.col("__t").isNotNull())
        .withColumn("__side", F.lit(0))
        # One struct per right row — never null (the row exists), so a
        # single last(ignorenulls) carries ALL fields + the matched
        # time from the SAME right row, even when some payload fields
        # are null in it.
        .withColumn(
            "__payload",
            F.struct(
                F.col("__t").alias("__rt"), *[F.col(c) for c in carried]
            ),
        )
        .drop(*carried)
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # A left row with a null time has no position either — it must
    # stay unmatched rather than inherit whatever the window order
    # happens to place before it.
    match = F.when(F.col("__t").isNull(), F.lit(None)).otherwise(
        F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    merged = merged.withColumn("__match", match)
    rt = F.col("__match.__rt")
    if tolerance is not None:
        gap = (
            (F.col("__t") - rt)
            if direction == "backward"
            else (rt - F.col("__t"))
        )
        keep = rt.isNotNull() & (gap <= F.expr(f"INTERVAL {tolerance}"))
        merged = merged.withColumn(
            "__match", F.when(keep, F.col("__match")).otherwise(F.lit(None))
        )
    return merged.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__match.{c}").alias(c) for c in carried],
    )
