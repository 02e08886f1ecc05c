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

from ..functions.text import trunc6

__all__ = [
    "hash_bucket",
    "deterministic_sample",
    "stratified_sample",
    "curate_top_per_group",
    "weighted_sample",
    "split_assign",
    "split_assign_leakage_safe",
    "corpus_shuffle",
    "source_temperature_mix",
    "source_interleave_order",
    "token_budget_select",
    "importance_resample",
]

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


def fixed_k_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows (or all rows if fewer), chosen as the k
    smallest ``md5(salt || id)`` values — the deterministic, mergeable
    answer to "give me a 10 000-doc sample" where a rate-based sample
    only hits the target in expectation.

    This is the KMV/bottom-k construction: the k smallest of a uniform
    hash are a uniform sample without replacement, stable across
    retries, partitionings, and incremental re-runs (a new corpus drop
    only displaces rows whose hash beats the current k-th — the same
    property the KMV sketch uses). Plans as TakeOrderedAndProject:
    per-partition top-k heaps, O(k) driver traffic, no shuffle of the
    full data. The id tiebreak keeps ties (hash collisions) exact.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy("__h", id_col)
        .limit(k)
        .drop("__h")
    )


def weighted_fixed_k_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows sampled without replacement with probability
    proportional to ``weight_col`` — the Efraimidis–Spirakis A-ES
    construction (IPL 2006): each row draws a deterministic uniform
    u ∈ (0, 1] from its content hash and keys itself by ln(u)/w; the k
    LARGEST keys are a weight-proportional sample without replacement.

    Engine-portability note: ``ln`` is the one transcendental in the
    key, and libm implementations may disagree in the last ulp — so
    the ordering key is floor-truncated to the 1e-12 grid (far above
    ulp noise, far below any real key gap) with the id as tiebreak,
    making the selection deterministic across engines. Plans as
    TakeOrderedAndProject: O(k) driver traffic, no full shuffle.

    Rows with NULL or non-positive weight are excluded (they have zero
    selection probability in A-ES).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + 1).cast("double") / F.lit(float(2**60))
    key = F.floor(
        F.log(u) / F.col(weight_col).cast("double") * 1e12
    ) / 1e12
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__aes", key)
        .orderBy(F.col("__aes").desc(), id_col)
        .limit(k)
        .drop("__aes")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing /
    source-reweighting primitive of training-data pipelines ("keep 100%
    of books, 10% of common-crawl, drop the rest").

    Same content-hash membership as :func:`deterministic_sample`, so
    every property carries over per stratum: stable across runs and
    cluster sizes, nested rates (a 10% sample is a subset of the 20%
    sample under the same salt), incremental loads land proportionally.
    Strata absent from ``rates`` fall back to ``default_rate``
    (``0.0`` = drop — a rate-0 stratum never passes the filter).

    Plan shape: one CASE expression over the strata map inside the
    filter — still a pure scan-side predicate, no shuffle, no join.
    """
    for stratum, rate in rates.items():
        if not 0 <= rate <= 1:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    if not 0 <= default_rate <= 1:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * _BUCKETS)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def curate_top_per_group(
    df: DataFrame,
    score_col: Column,
    group_col: str,
    id_col: str = "doc_id",
    per_group: int = 10,
    min_score: float = 0.0,
) -> DataFrame:
    """Per-group curation under a budget: keep the ``per_group``
    highest-scoring rows of each group, scores below ``min_score``
    excluded — the selection step of quality-weighted domain mixing
    (score docs, keep the best N per source/domain).

    Plans as a rank-k window that Spark executes with WindowGroupLimit:
    each shuffle partition pre-prunes to its local top-k per group
    BEFORE the exchange, so shuffle volume is O(groups x k) no matter
    how large the corpus — the same property the top-k-per-segment
    relational query pins in tests. Ties break by id for a
    deterministic survivor set.
    """
    from pyspark.sql import Window

    scored = df.withColumn("__score", score_col).filter(
        F.col("__score") >= min_score
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w).cast("long"))
        .filter(F.col("__rank") <= per_group)
        .withColumnRenamed("__score", "score")
        .withColumnRenamed("__rank", "rank_in_group")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    salt: str = "",
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its
    own weight in [0, 1] (clamped) — quality-proportional retention,
    the continuous-weight sibling of :func:`stratified_sample`'s
    categorical rates ("keep good docs almost surely, bad docs
    rarely").

    Membership is the same content-hash test as the other samplers, so
    the sample is reproducible across runs, partitionings, and cluster
    sizes, and monotone in the weight: raising a row's weight can only
    ever ADD it to the sample (the hash draw is fixed; only the
    threshold moves). Pure scan-side predicate — no shuffle, no RNG
    state, trivially parallel at any scale.

    ``floor`` (not cast) converts the weight threshold: Spark's
    double→long cast truncates while other engines round, and the
    sampler's oracle-reproducibility depends on every engine computing
    the identical integer threshold.

    Quantization caveat: the keep probability is
    ``floor(w * _BUCKETS) / _BUCKETS`` — with the default 10,000
    buckets, weights are quantized DOWN to the next 1e-4 step, so a
    weight below 1e-4 is never sampled and every weight is biased down
    by up to 1e-4 versus its nominal value. This is deliberate (the
    integer grid is what makes the draw engine-reproducible); callers
    whose weights live near or below 1e-4 should rescale them into a
    coarser range rather than assume exact-probability retention.
    """
    w = F.least(F.greatest(weight_col, F.lit(0.0)), F.lit(1.0))
    return df.filter(
        hash_bucket(F.col(id_col), salt) < F.floor(w * _BUCKETS).cast("long")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment — every row gets a
    named split from its content hash, so the assignment is stable
    across runs, engines, cluster sizes, and incremental loads (a new
    document lands proportionally; existing documents never migrate,
    which is what keeps eval sets uncontaminated over re-runs).

    ``fractions`` maps split name → fraction; they must sum to 1 (to
    bucket resolution). Buckets are carved cumulatively in the dict's
    insertion order, so ``{"train": .9, "val": .05, "test": .05}``
    assigns buckets [0,9000) / [9000,9500) / [9500,10000). Pure
    map-side expression: no shuffle, no RNG, rides the scan.
    """
    cum = 0.0
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    for name, frac in fractions.items():
        if frac <= 0:
            raise ValueError(f"fraction for {name!r} must be positive")
        cum += frac
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if abs(cum - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {cum}")
    return df.withColumn(split_col, expr)


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global corpus shuffle for training reproducibility:
    every row gets a contiguous 1..N position in md5(salt || id) order
    — a pseudo-random but reproducible permutation any engine can
    recompute (same salt → same order, forever).

    The global ranking reuses :func:`keys.ordered_surrogate_key` — the
    bucketed two-pass row_number, NOT a single-partition window — and
    md5's uniformity is exactly the "roughly uniform leading key" its
    equal-width buckets want. At 100 TB this is the standard
    pre-training shuffle: rank once, then range-partition readers by
    position.
    """
    from .keys import ordered_surrogate_key  # noqa: PLC0415

    hashed = df.withColumn(
        "__shufkey", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    return ordered_surrogate_key(
        hashed, pos_col, order_by=["__shufkey", id_col]
    ).drop("__shufkey")


def token_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    budget_fraction: float,
    n_bands: int = 1000,
) -> DataFrame:
    """Quality-ranked selection up to a global token budget — "give me
    the best ``budget_fraction`` of the corpus, by tokens": rows are
    taken in (score DESC, id ASC) order while the running sum of
    ``weight_col`` stays within ``floor(total_weight ·
    budget_fraction)``. The curation primitive for sizing a training
    mix ("the top N billion tokens by quality").

    Scale shape — a global ORDER BY + running sum with NO global
    window: scores (required in [0, 1]; clamped) are banded by
    ``floor(score · n_bands)``, and the running sum decomposes into
    (a) per-band weight totals, a groupBy over ≤ n_bands rows whose
    strictly-better-band prefix is a window over the ≤ n_bands band
    rows, broadcast back, plus (b) an intra-band running sum windowed
    per band. Band concatenation in DESC order with (score DESC, id)
    inside each band IS the global order, because floor is monotone.
    The per-band window is the only data-sized stage; a score
    distribution concentrated in one band degrades toward a global
    window — pick n_bands to spread it (same caveat class as any
    partitioned window).

    Returns the selected rows with ``cum_<weight_col>`` (the running
    total, integer-exact) appended.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError("budget_fraction must be in (0, 1]")
    # NULL scores rank last (lowest quality) instead of silently
    # vanishing in the band join while still inflating the total; the
    # clamped score drives BOTH the band and the intra-band order so
    # the two stay one consistent global ordering.
    score = F.least(
        F.greatest(F.coalesce(F.col(score_col), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    banded = df.withColumn("__score", score).withColumn(
        "__band",
        F.least(
            F.floor(F.col("__score") * F.lit(n_bands)), F.lit(n_bands - 1)
        ).cast("long"),
    )
    band_w = Window.orderBy(F.col("__band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    all_w = Window.orderBy(F.col("__band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # one <= n_bands-row frame carries BOTH the strictly-better-band
    # prefix and the corpus total — no separate full-corpus total scan
    band_prefix = (
        banded.groupBy("__band")
        .agg(F.sum(weight_col).alias("__bw"))
        .select(
            "__band",
            (F.sum("__bw").over(band_w) - F.col("__bw")).alias("__prior"),
            F.sum("__bw").over(all_w).cast("double").alias("__total"),
        )
    )
    in_band = (
        Window.partitionBy("__band")
        .orderBy(F.col("__score").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_name = f"cum_{weight_col}"
    out = (
        banded.join(F.broadcast(band_prefix), "__band")
        .withColumn(
            cum_name,
            (F.col("__prior") + F.sum(weight_col).over(in_band)).cast(
                "long"
            ),
        )
        .filter(
            F.col(cum_name)
            <= F.floor(F.col("__total") * F.lit(budget_fraction))
        )
    )
    return out.drop("__band", "__score", "__prior", "__total")


def mixture_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    group_col: str,
    proportions: dict[str, float],
    budget_fraction: float = 1.0,
    n_bands: int = 1000,
) -> DataFrame:
    """Domain-mixture curation — the Pile/Dolma training-mix builder:
    ONE global token budget (``budget_fraction`` of the corpus total)
    split across groups by target ``proportions``, each group's share
    filled with its best rows in (score DESC, id ASC) order. Groups
    absent from ``proportions`` contribute nothing (their budget is 0).

    Scale shape mirrors :func:`token_budget_select` with every key
    prefixed by the group: the per-(group, band) weight totals are a
    groupBy over ≤ groups × n_bands rows, the strictly-better-band
    prefix is a window over those bounded rows partitioned by group,
    the corpus total rides the same frame, and the only data-sized
    stage is the intra-(group, band) running-sum window. No global
    window, no per-group scan loop — one pass whatever the group count.

    Budget arithmetic (mirrored by the SQL oracle, all floors on
    doubles): global = floor(total_weight × budget_fraction); per
    group = floor(global × proportion). Returns the selected rows plus
    ``cum_<weight_col>`` (the group-local running total).

    ``score_col`` domain is **[0, 1]** (same convention as
    :func:`token_budget_select`): NULL coalesces to 0 and values are
    clamped into the unit interval before banding, so scores above 1
    all collapse into the top band and tie-break by ``id_col`` only —
    normalize scores upstream if callers produce a wider range.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError("budget_fraction must be in (0, 1]")
    if not proportions:
        raise ValueError("proportions must be non-empty")
    if any(p < 0 for p in proportions.values()) or sum(
        proportions.values()
    ) > 1.0 + 1e-9:
        raise ValueError("proportions must be >= 0 and sum to <= 1")

    score = F.least(
        F.greatest(F.coalesce(F.col(score_col), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    prop = F.lit(0.0)
    for g, p in sorted(proportions.items()):
        prop = F.when(F.col(group_col) == g, F.lit(float(p))).otherwise(prop)
    banded = (
        df.withColumn("__score", score)
        .withColumn(
            "__band",
            F.least(
                F.floor(F.col("__score") * F.lit(n_bands)),
                F.lit(n_bands - 1),
            ).cast("long"),
        )
        .withColumn("__prop", prop)
    )
    band_w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__band").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    all_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    band_prefix = (
        banded.groupBy(group_col, "__band")
        .agg(F.sum(weight_col).alias("__bw"))
        .select(
            group_col,
            "__band",
            (F.sum("__bw").over(band_w) - F.col("__bw")).alias("__prior"),
            F.sum("__bw").over(all_w).cast("double").alias("__total"),
        )
    )
    in_band = (
        Window.partitionBy(group_col, "__band")
        .orderBy(F.col("__score").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_name = f"cum_{weight_col}"
    budget = F.floor(
        F.floor(F.col("__total") * F.lit(budget_fraction)).cast("double")
        * F.col("__prop")
    )
    out = (
        banded.join(F.broadcast(band_prefix), [group_col, "__band"])
        .withColumn(
            cum_name,
            (F.col("__prior") + F.sum(weight_col).over(in_band)).cast(
                "long"
            ),
        )
        .filter(F.col(cum_name) <= budget)
    )
    return out.drop("__band", "__score", "__prior", "__total", "__prop")


def source_temperature_mix(
    df: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    alpha: float = 0.7,
    budget_docs: int = 1000,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-corpus
    sampling rule of Devlin et al. 2019 App. A / GPT-3's dataset
    weighting): each source's sampling weight is its size raised to
    ``alpha`` < 1, normalized — upweighting small sources relative to
    raw proportions without letting any source dominate. Returns per
    source: doc count, total size, the normalized weight, and the
    floor-allocated document budget at ``budget_docs``.

    Determinism discipline: the one transcendental per source —
    pow(size, alpha) — is floor-truncated to 6 decimals immediately;
    the normalizer sums those truncated values as DECIMAL(28,6)
    (exact); the weight is one double division of two exact values,
    truncated again; and the budget allocation multiplies the
    truncated weight as DECIMAL so the floor cannot flip on a binary
    ulp. Mirrored shape-for-shape in the DuckDB oracle.

    Plan: one groupBy(source) over the corpus — map-side combined,
    output is |sources| rows — then a 1-row broadcast of the
    normalizer. Nothing else scales with the corpus.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    sized = df.groupBy(F.col(group_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col(size_col)).cast("long").alias("n_bytes"),
    )
    p = F.floor(
        F.pow(F.col("n_bytes").cast("double"), F.lit(alpha)) * 1000000.0
    ) / 1000000.0
    powed = sized.select(
        "source", "n_docs", "n_bytes", p.cast("decimal(28,6)").alias("__p")
    )
    tot = powed.agg(F.sum("__p").alias("__tot"))
    weight = (
        F.floor(
            F.col("__p").cast("double")
            / F.col("__tot").cast("double")
            * 1000000.0
        )
        / 1000000.0
    )
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_bytes",
            weight.alias("weight"),
        )
        .select(
            "source",
            "n_docs",
            "n_bytes",
            "weight",
            F.floor(
                F.col("weight").cast("decimal(18,6)") * F.lit(budget_docs)
            )
            .cast("long")
            .alias("alloc_docs"),
        )
        .orderBy("source")
    )


def source_interleave_order(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
    scale: int = 1_048_576,
) -> DataFrame:
    """Proportional source-interleaved training order (stride
    scheduling): each source's documents land at evenly spaced
    positions, so a sequential reader sees every source at its corpus
    proportion EVERYWHERE in the epoch — the guarantee a plain
    hash shuffle gives only in expectation. Document i of a source
    with m docs gets the integer key floor((2i-1)·scale / (2m)) — its
    stride midpoint on a fixed grid — and the epoch order is
    (interleave_key, source, src_rank).

    Per-source ranks use the group-prefixed form of the
    ordered_surrogate_key two-pass (operators/keys.py): md5(salt||id)
    is the shuffle key, its leading 4 hex digits bucket each source's
    rows order-contiguously (fixed-width lowercase hex compares like
    its value), per-(source, bucket) counts roll into offsets with a
    window over ≤ |sources|·n_buckets COUNT rows (bounded by
    construction, never by data), and the only full-data shuffle is
    the (source, bucket) hash exchange — no per-source single
    partition, no skew from big sources.

    Output: (src_rank, id_col, source_col, interleave_key), ordered.
    Keys are integers on both engines (DIV), so the oracle is exact;
    readers wanting a contiguous global position compose this with
    the corpus_shuffle ranking on (interleave_key, source, src_rank).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    spark = df.sparkSession
    n = 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    shufkey = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    hashed = df.select(
        F.col(id_col), F.col(source_col).alias("__src"), shufkey.alias("__k")
    )
    # leading 16 bits of the hash, scaled to n order-contiguous buckets
    bucket = (
        F.conv(F.substring("__k", 1, 4), 16, 10).cast("long")
        * n
        / 65536
    ).cast("int")
    bucketed = hashed.withColumn("__b", bucket)
    counts = bucketed.groupBy("__src", "__b").agg(
        F.count("*").alias("__cnt")
    )
    w_off = (
        Window.partitionBy("__src")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__src",
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    sizes = counts.groupBy("__src").agg(F.sum("__cnt").alias("__m"))
    w_local = Window.partitionBy("__src", "__b").orderBy("__k", id_col)
    return (
        bucketed.join(F.broadcast(offsets), ["__src", "__b"])
        .join(F.broadcast(sizes), "__src")
        .withColumn(
            "__rn",
            (F.row_number().over(w_local) + F.col("__off")).cast("long"),
        )
        .select(
            F.col("__rn").alias("src_rank"),
            F.col(id_col),
            F.col("__src").alias(source_col),
            F.expr(
                f"CAST((2 * __rn - 1) * {scale} DIV (2 * __m) AS BIGINT)"
            ).alias("interleave_key"),
        )
        .orderBy("interleave_key", source_col, "src_rank")
    )


def importance_resample(
    df: DataFrame,
    target_flag: Column,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    dim: int = 256,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    pick the ``k`` raw documents whose HASHED n-gram distribution looks
    most like a curated target slice. Fit two bucket distributions over
    the same ``dim`` md5 buckets — p = tokens of target docs
    (``target_flag``), q = tokens of the WHOLE corpus (the raw pool the
    paper importance-weights against) — and score every document by the
    mean per-token log importance ratio ln p(b)/q(b) under Laplace(+1)
    smoothing; the top-``k`` non-target documents by score are the
    resampled selection. The hashing trick (shared with
    ``functions.text.hashed_features``: md5 → first 8 hex → mod dim) is
    the load-bearing scale property: model size is ``dim`` regardless of
    vocabulary, so the two distributions broadcast at any corpus size.

    Determinism discipline (the surprisal/NB precedent): each bucket's
    two log-probabilities truncate to 6 decimals immediately; the log
    ratio is an exact DECIMAL subtraction and the per-doc rollup is
    exact decimal × integer, so partition order cannot move a score.
    Ties break by ``id_col`` ascending.

    Plan: tokens pre-aggregate once to (doc, target, bucket) grain in
    a map-side-combined groupBy that lazily localCheckpoints because
    both consumers read it (both bucket distributions derive from it;
    AQE exchange reuse measurably does not fire for this shape — see
    functions.text.unigram_surprisal); the dim-row scored model and
    the 1-row totals broadcast back, and the final top-k is a global
    TakeOrderedAndProject — no window, no single-partition stage.

    Output: (id_col, source_col, n_tokens, log_weight) — the selected
    ``k`` rows, highest weight first.
    """
    h = F.md5(F.col("term"))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
    )
    toks = df.select(
        F.col(id_col),
        target_flag.cast("boolean").alias("__t"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.length("term") > 0).select(
        id_col, "__t", bucket.alias("__b")
    )
    per_db = toks.groupBy(id_col, "__t", "__b").agg(
        F.count("*").alias("__c")
    ).localCheckpoint(eager=False)
    model = per_db.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__ct"),
        F.sum("__c").alias("__cr"),
    )
    tot = model.agg(
        F.sum("__ct").alias("__nt"), F.sum("__cr").alias("__nr")
    )
    log_p = trunc6(
        F.log(
            (F.col("__ct") + 1).cast("double")
            / (F.col("__nt") + dim).cast("double")
        )
    ).cast("decimal(28,6)")
    log_q = trunc6(
        F.log(
            (F.col("__cr") + 1).cast("double")
            / (F.col("__nr") + dim).cast("double")
        )
    ).cast("decimal(28,6)")
    scored = model.crossJoin(F.broadcast(tot)).select(
        "__b", (log_p - log_q).alias("__s")
    )
    per_doc = (
        per_db.filter(~F.col("__t"))
        .join(F.broadcast(scored), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.col("__s") * F.col("__c")).alias("__sum"),
        )
    )
    weight = trunc6(F.col("__sum").cast("double") / F.col("n_tokens"))
    # Inner join: a zero-token document has no per_doc row and is
    # excluded from the ranked selection entirely. The earlier left
    # join coalesced empties to log_weight 0.0, which outranked every
    # document with a negative mean log ratio — and raw-pool documents
    # typically score negative, so empty documents crowded out real
    # ones (ADVICE r08). DSIR selects documents that LOOK LIKE the
    # target; an empty document carries no evidence either way and
    # must not be selected.
    return (
        df.filter(~target_flag)
        .select(id_col, source_col)
        .join(per_doc, id_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            weight.alias("log_weight"),
        )
        .orderBy(F.desc("log_weight"), F.asc(id_col))
        .limit(k)
    )


def split_assign_leakage_safe(
    df: DataFrame,
    text_col: str = "text",
    fractions: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Dedup-AWARE train/val/test split: the bucket hash keys on the
    normalized-content fingerprint instead of the document id, so
    byte-identical duplicates land in the SAME split by construction.
    Splitting on ids silently leaks training data into eval whenever
    the corpus still contains duplicates (two copies, two ids, two
    coin flips) — the standard contamination mode dedup-then-split
    pipelines exist to prevent, closed here even when the split runs
    BEFORE dedup.

    Same bucket arithmetic and cumulative carving as
    :func:`split_assign` (stable across runs/engines/cluster sizes);
    the fingerprint is md5 of whitespace-collapsed lowercased text —
    the :func:`operators.dedup.exact_duplicates` normalization, so
    "duplicate" means exactly what the dedup suite means by it. Pure
    map-side expression: no shuffle, rides the scan.
    """
    from .dedup import normalize_text  # noqa: PLC0415

    if fractions is None:
        fractions = {"train": 0.90, "val": 0.05, "test": 0.05}
    fp = F.md5(normalize_text(F.col(text_col)))
    return split_assign(
        df.withColumn("__fp", fp), "__fp", fractions, salt, split_col
    ).drop("__fp")
