"""Deterministic, engine-portable sampling for reproducible dataset
splits.

``df.sample()`` draws from a seeded RNG whose stream depends on
partitioning — rerun with different parallelism and the sample changes,
and no other engine can reproduce it. Training-data pipelines need the
opposite: membership decided per ROW from a content hash, so the split
is stable across runs, engines, cluster sizes, and incremental loads
(a document keeps its split forever, new documents land proportionally).

Mechanism: md5(salt || id) → first 15 hex digits → integer → modulo
10_000 buckets; a row is in-sample iff its bucket < rate·10_000. The
salt namespaces independent splits (train/eval/test use different
salts). Pure JVM expressions, no shuffle, fully pushdown-friendly —
the filter rides the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "deterministic_sample"]

_BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from md5(salt || id). 15 hex digits
    (60 bits) keep the conv() result well inside a signed 64-bit long —
    16 digits could overflow to negative on the Spark side."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BUCKETS


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket falls under ``rate`` (0..1]."""
    if not 0 < rate <= 1:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return df.filter(hash_bucket(F.col(id_col), salt) < int(rate * _BUCKETS))
