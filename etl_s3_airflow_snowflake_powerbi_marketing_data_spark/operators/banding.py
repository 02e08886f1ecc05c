"""Shared LSH banding machinery.

Every LSH-family operator here (SimHash near-dup, signed-projection
embedding LSH, MinHash banding) ends in the same shape: split a
signature into bands, explode to (id, band, band_key) rows, self-join
on the band key, keep ordered id pairs. One implementation keeps the
band masking and pair-join semantics in sync across all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bit_band_exprs(sig: Column, bands: int, bits_per_band: int) -> list[Column]:
    """Split an integer signature into ``bands`` disjoint bit groups."""
    mask = (1 << bits_per_band) - 1
    return [
        F.shiftright(sig, b * bits_per_band).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ]


def explode_bands(df: DataFrame, band_cols: list[Column]) -> DataFrame:
    """(…, band, band_key) — one row per (input row, band)."""
    return df.select(
        "*", F.posexplode(F.array(*band_cols)).alias("band", "band_key")
    )


def self_candidate_pairs(banded: DataFrame, id_col: str = "id") -> DataFrame:
    """Distinct ordered (id_a, id_b) pairs sharing ≥1 band bucket.

    The join key is (band, band_key): shuffle cost is proportional to
    bucket collisions, never all pairs. Callers re-verify candidates
    exactly (Hamming / Jaccard / cosine) — banding only bounds recall.

    The probe side is explicitly repartitioned on the band key before
    the join: banded rows are only O(N·bands) so the build side usually
    broadcasts, and a broadcast join inherits the PROBE side's
    partitioning — which for a small parquet scan is ONE partition, so
    the quadratic pair expansion (the actual work) would run in a
    single task (measured: a 4M-pair expansion single-threaded at
    sf0.1). The partition count is pinned explicitly because AQE sizes
    coalescing from the exchange's INPUT bytes — tiny here — and would
    fold the expansion back into a handful of tasks; the output is
    quadratically larger than what AQE can see. The tiny extra shuffle
    buys bucket-level parallelism for the expansion and the distinct's
    map-side partial dedup.
    """
    n_part = int(
        banded.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    ).repartition(n_part, "band", "band_key")
    right = banded.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
