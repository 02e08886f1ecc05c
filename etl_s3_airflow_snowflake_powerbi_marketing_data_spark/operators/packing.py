"""Sequence packing — assigning documents to fixed-token-budget bins
for training-batch construction (a training-data-pipeline operator the
reference has no analogue for; green-field per SURVEY.md §2.5).

Semantics: documents are laid out on one contiguous token axis in a
deterministic order (``order_by``, typically the id); bin ``k`` owns
token offsets ``[k·B, (k+1)·B)`` for budget ``B``, and a document
belongs to the bin where its first token lands (the streaming-packer
rule — a document may straddle its bin's end, exactly like causal-LM
sequence packing with cross-document attention masking). This is the
deterministic, shuffle-friendly spec; true bin-packing (first-fit
decreasing) is neither order-stable nor expressible without a serial
pass, which is why production packers stream.

Scale shape: the global running token total is computed with the SAME
bucketed two-pass trick as ``keys.ordered_surrogate_key`` — a broadcast
min/max defines order-contiguous buckets over a monotone proxy of the
ordering key, a tiny per-bucket aggregate turns bucket token sums into
cumulative offsets, and the only full-data shuffle is one hash exchange
on the bucket id. NO single-partition window anywhere, so the plan
holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .keys import _order_proxy


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_by: str,
    max_tokens: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """Adds ``pack_id`` (the bin) and ``pack_offset`` (token offset of
    the document's first token within its bin) to ``df``.

    ``token_col`` must be non-negative; ``order_by`` should be roughly
    uniform between min and max for balanced buckets (ids and
    timestamps are — same caveat as ``ordered_surrogate_key``).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    spark = df.sparkSession
    n = num_buckets or 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    proxy = _order_proxy(df, order_by)

    minmax = df.select(
        F.min(proxy).alias("__gmin"), F.max(proxy).alias("__gmax")
    )
    span = F.greatest(F.col("__gmax") - F.col("__gmin"), F.lit(1e-12))
    bucket = F.least(
        F.floor((proxy - F.col("__gmin")) / span * n).cast("int"),
        F.lit(n - 1),
    )
    bucketed = (
        df.join(F.broadcast(minmax))
        .withColumn("__bucket", bucket)
        .drop("__gmin", "__gmax")
    )

    # Tiny branch: per-bucket token sums → cumulative token offsets
    # (window over ≤ n rows, never the data).
    sums = bucketed.groupBy("__bucket").agg(
        F.sum(token_col).alias("__tok_sum")
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sums.select(
        "__bucket",
        F.coalesce(F.sum("__tok_sum").over(w_off), F.lit(0)).alias("__off"),
    )

    # Main branch: exclusive in-bucket running total + bucket offset =
    # exact global token offset of each document's first token.
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.coalesce(F.sum(token_col).over(w_local), F.lit(0)) + F.col("__off")
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn("__cum", cum_before)
        # Integer `div`, not float division: token offsets can exceed
        # double's exact-integer range long before 100 TB of text does
        # anything interesting.
        .withColumn("pack_id", F.expr(f"__cum div {max_tokens}").cast("long"))
        .withColumn(
            "pack_offset", (F.col("__cum") % max_tokens).cast("long")
        )
        .drop("__bucket", "__off", "__cum")
    )
