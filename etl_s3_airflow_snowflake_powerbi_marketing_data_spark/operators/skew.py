"""Skew mitigation utilities.

AQE's skew-join splitting handles joins; skewed AGGREGATIONS (one hot
group key holding a large fraction of rows — the "null user", the
default parameter, the boilerplate document) still funnel one reducer.
The classic fix is two-phase salted aggregation, expressed here for any
algebraic aggregate list.

At 100 TB a hot key is the difference between a 10-minute job and one
straggler task running for hours; salting bounds any task's share of a
key at 1/n_salts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random-free deterministic salt.

    ``aggs`` maps output column -> (input column, agg) where agg is one
    of ``sum | count | min | max`` (the algebraic aggregates that
    re-combine losslessly; avg = sum/count at the call site).

    Phase 1 groups on (keys, salt) — the hot key splits across
    ``n_salts`` reducers; phase 2 re-combines the ≤ n_salts partials
    per key (sum/count partials re-sum, min/max re-min/max). The salt
    is a content hash of the whole row, which matters for correctness:
    a salt derived from ``spark_partition_id``/``rand()`` changes when
    a failed stage recomputes, silently routing rows to already-fetched
    (key, salt) groups (the SPARK-23207 class of bug). A content hash
    is retry-stable; its only weakness is that *identical* rows share a
    salt, which re-concentrates skew only for mass-duplicate-row data.
    """
    first: dict[str, Column] = {}
    second: dict[str, Column] = {}
    for out, (col, how) in aggs.items():
        if how == "sum":
            first[out] = F.sum(col)
            second[out] = F.sum(out)
        elif how == "count":
            first[out] = F.count(col)
            second[out] = F.sum(out)
        elif how == "min":
            first[out] = F.min(col)
            second[out] = F.min(out)
        elif how == "max":
            first[out] = F.max(col)
            second[out] = F.max(out)
        else:
            raise ValueError(f"unsupported agg {how!r} for {out!r}")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_by, "__salt")
        .agg(*[c.alias(name) for name, c in first.items()])
    )
    return phase1.groupBy(*group_by).agg(
        *[c.alias(name) for name, c in second.items()]
    )


def _probe_salt(probe: DataFrame, n_salts: int, salt_mode: str):
    """Salt column for the probe side (see :func:`salted_join`).

    ``content`` (default): retry-stable whole-row hash — byte-identical
    duplicates share a salt (documented limitation). ``row``: mixes a
    deterministic per-partition row counter
    (``monotonically_increasing_id``) so byte-identical duplicate
    floods round-robin across salts — every reducer's share of a hot
    key is bounded at ~1/n_salts even when the skew IS the duplicates.
    Caveat (why it's opt-in): the counter depends on partition layout
    and intra-partition order, so a task retry that re-reads its input
    in a different order can re-route rows mid-query (the SPARK-23207
    bug class); safe for deterministic file scans (parquet row order is
    stable per split), unsafe downstream of a shuffle whose order is
    not pinned.
    """
    if salt_mode == "content":
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts)
        ).cast("int")
    if salt_mode == "row":
        return F.pmod(
            F.monotonically_increasing_id(), F.lit(n_salts)
        ).cast("int")
    raise ValueError(f"salt_mode={salt_mode!r}: use 'content' or 'row'")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_mode: str = "content",
) -> DataFrame:
    """Hot-key shuffle join: salt the probe side, replicate the build
    side once per salt, join on (keys, salt).

    AQE's skew-join splitting only helps when it SEES the skew (post
    shuffle-stage statistics, sort-merge joins); a known-hot key — the
    "null user", the default category, the boilerplate domain — is
    better bounded up front: with salting no reducer ever owns more
    than ~1/``n_salts`` of a key's probe rows.

    The salt on the probe side is a content hash of the whole row
    (retry-stable — recompute-after-failure lands every row on the same
    salt; `rand()`/partition-id salts re-route rows on retry, the
    SPARK-23207 bug class, exactly as documented for ``salted_agg``).
    Known limitation of that choice: BYTE-IDENTICAL duplicate probe
    rows hash to the same salt, so a hot key whose skew comes from
    exact duplicate floods still funnels into one reducer — the
    ~1/``n_salts`` reducer bound holds only for rows that differ
    somewhere outside the join keys. The retry-stable fix is upstream,
    not here: carry a pre-existing uniquifier (source offset, file
    rowid, event id) in the probe row so duplicates aren't
    byte-identical. When no uniquifier exists and the duplicates ARE
    the skew, ``salt_mode='row'`` opts into a per-partition row-counter
    salt that round-robins byte-identical rows across reducers — see
    :func:`_probe_salt` for the retry-ordering caveat that keeps it
    opt-in (deterministic in-operator disambiguators re-route rows on
    task retry, the exact bug class the content default avoids).
    The build side replicates via an explode over ``sequence(0,
    n_salts-1)`` — cost n_salts × |build|, which is the price of the
    technique and why the build side must be the SMALL side (for a
    build side too big to replicate, use AQE skew handling or split hot
    keys out explicitly). ``n_salts`` is deliberately NOT derived from
    the session's shuffle-partition count: the replication factor must
    be a bounded constant, not scale with cluster width (the cap that
    bit the fuzzy-match block join, operators/dedup.py).

    Result is bit-identical to ``probe.join(build, on, how)`` — every
    probe row meets every build row with its keys exactly once, because
    the build replica set covers all salt values. Supported ``how``:
    inner / left (forms where per-row match multiplicity is preserved
    under build replication keyed by salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: use inner/left for salted joins")
    if not 2 <= n_salts <= 256:
        raise ValueError(f"n_salts={n_salts} outside [2, 256]")
    salted_probe = probe.withColumn(
        "__salt", _probe_salt(probe, n_salts, salt_mode)
    )
    # explode cannot nest inside another expression (the cast) — stage it
    replicated = build.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__s")
    ).withColumn("__salt", F.col("__s").cast("int")).drop("__s")
    # Pin the SHUFFLE-HASH shape salting exists for: without the hint
    # the planner may broadcast whichever side its size estimate says
    # fits — at small SF that was the PROBE side (measured: a 600K-row
    # probe broadcast), the exact inversion of the operator's intent,
    # and a broadcast join has no reducer skew for salting to fix in
    # the first place. shuffle_hash on the replicated side keeps the
    # join a (keys, salt)-partitioned hash join with the bounded
    # replica set as the build side at every scale.
    return salted_probe.join(
        replicated.hint("shuffle_hash"), [*on, "__salt"], how
    ).drop("__salt")


def key_distribution_profile(
    df: DataFrame, key_col: str, source: str
) -> DataFrame:
    """Join-key skew diagnostic — the profile you run BEFORE picking a
    join strategy (broadcast vs shuffle vs salted) for a 100 TB join.

    Per-key counts are folded into an order-of-magnitude histogram
    (bucket = decimal digit count of the key's row count), so the
    output is bounded by ~log10(N) rows regardless of key cardinality:
    a clean power-law fingerprint of the key column. A heavy tail in
    the top bucket (few keys, huge max_cnt) says salt or AQE-skew-split
    the join; millions of singleton keys says the shuffle is fine.

    Scale shape: one groupBy over the key (map-side combined partial
    counts — the same shuffle the join itself would do, so the profile
    costs no more than one pass of the join's build side), then a
    second groupBy over ≤ ~20 digit buckets. The digit-count bucket is
    pure integer/string arithmetic — deterministic across engines,
    unlike floor(log2(x)) whose transcendental boundary cases can
    differ in the last ulp.

    Returns (source, bucket, n_keys, rows_in_bucket, max_cnt).
    """
    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count("*").alias("__cnt")
    )
    return (
        per_key.groupBy(
            F.length(F.col("__cnt").cast("string")).cast("long").alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("__cnt").cast("long").alias("rows_in_bucket"),
            F.max("__cnt").alias("max_cnt"),
        )
        .select(
            F.lit(source).alias("source"),
            "bucket",
            "n_keys",
            "rows_in_bucket",
            "max_cnt",
        )
    )
