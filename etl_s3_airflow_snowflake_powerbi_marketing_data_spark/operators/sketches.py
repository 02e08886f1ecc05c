"""Distinct-count sketches for 100 TB-scale profiling.

HyperLogLog re-expressed as plain DataFrame aggregation — the sketch
merge IS the shuffle combine (groupBy max per bucket is associative and
map-side combinable), so a distinct-user count over an arbitrarily
large corpus moves only O(groups × 2^p) rows after the map side.

Everything is DETERMINISTIC by construction, unlike builtin
``approx_count_distinct`` (whose HLL++ register merge is
partition-order-independent too, but whose estimate isn't reproducible
across engines): the hash is ``xxhash64`` (fixed seed 42), the harmonic
sum runs in exact integer arithmetic (scaled powers of two summed as
DECIMAL — float summation order can never perturb it), and the final
estimate is one float division from precomputed literals. That is what
lets an independent pure-Python implementation (tools/gen_expected.py)
produce an exact expected output the oracle compares by value.

Split into two halves on purpose:

- ``hll_registers``: hash → bucket → MAX(rho). Pure associative
  aggregation, so it is ALSO a legal Structured Streaming aggregation
  (complete mode) — registers maintained continuously over a stream
  equal the batch registers over the same rows, because MAX is
  micro-batch-order invariant.
- ``hll_finalize``: registers → estimate. A tiny batch projection +
  per-group fold, run at read time — how a production sketch table
  works (store registers, finalize on query).

Estimator: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard linear-counting small-range correction. The correction branch
compares E_raw against 2.5·m using exactly-reproducible arithmetic, so
every engine takes the same branch on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_p(p: int) -> None:
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} outside sane HLL range [4, 16]")


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Per-(group, bucket) MAX(rho) registers — the mergeable sketch
    state. Works identically on a batch or streaming DataFrame (one
    associative aggregation; map-side/partial merges ARE the sketch
    union).

    ``bin()`` (a per-row string) computes the leading-zero count; at
    extreme scale a branchless bit-trick cascade would shave the
    allocation, but the expression sits before the map-side combine,
    executing once per input row either way.
    """
    _check_p(p)
    suffix_bits = 64 - p
    mask = (1 << suffix_bits) - 1
    max_rho = suffix_bits + 1  # suffix == 0 case
    hashed = df.select(
        *group_cols,
        F.xxhash64(F.col(key_col)).alias("__h"),
    ).select(
        *group_cols,
        F.expr(f"shiftrightunsigned(__h, {suffix_bits})").alias("__bucket"),
        F.expr(f"__h & {mask}").alias("__sfx"),
    )
    # rho = 1 + leading zeros of the suffix within its field
    rho = (
        F.when(F.col("__sfx") == 0, F.lit(max_rho))
        .otherwise(F.lit(max_rho) - F.length(F.expr("bin(__sfx)")))
        .cast("int")
    )
    return hashed.groupBy(*group_cols, "__bucket").agg(F.max(rho).alias("__rho"))


def hll_finalize(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Registers → (group cols, ``hll_estimate`` double floor-4,
    ``buckets_used`` long). Standard error ≈ 1.04/sqrt(2^p)."""
    _check_p(p)
    m = 1 << p
    max_rho = (64 - p) + 1
    # Exact harmonic sum: each bucket contributes 2^(-rho), scaled by
    # 2^max_rho so every term is an integer; DECIMAL sum is exact and
    # order-independent (sum < 2^p · 2^max_rho = 2^65 < 10^38).
    term = F.expr(
        f"cast(shiftleft(cast(1 as bigint), {max_rho} - __rho) as decimal(38,0))"
    )
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("buckets_used"),
        F.sum(term).alias("__s_used"),
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    # Precompute the full numerator as ONE Python float literal so the
    # engine-side arithmetic is a single division (bit-reproducible).
    numerator = alpha * m * m * float(1 << max_rho)
    empties = F.lit(m) - F.col("buckets_used")
    s_total = (
        F.col("__s_used")
        + (
            empties.cast("decimal(38,0)")
            * F.lit(1 << max_rho).cast("decimal(38,0)")
        )
    ).cast("double")
    e_raw = F.lit(numerator) / s_total
    # Linear counting below 2.5m with empty buckets — both engines
    # compute e_raw identically, so the branch choice is reproducible.
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / empties.cast("double"))
    estimate = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empties > 0), linear
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols,
        (F.floor(estimate * 1e4) / 1e4).alias("hll_estimate"),
        "buckets_used",
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``key_col`` in one
    call: ``hll_finalize(hll_registers(df))``.

    Plan shape: one shuffle to (group, bucket) grain — the per-bucket
    MAX(rho) partial-aggregates map-side, so the exchange carries at
    most groups × 2^p rows regardless of input size — then a trivial
    second aggregation at group grain.
    """
    return hll_finalize(hll_registers(df, key_col, group_cols, p), group_cols, p)


def hll_pairwise_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 10,
) -> DataFrame:
    """Audience-overlap estimates between every pair of groups: HLL
    union via register MAX + inclusion-exclusion —
    |A∩B| ≈ |A| + |B| − |A∪B| — all from ONE register table, no exact
    distinct anywhere.

    This is the sketch SET-ALGEBRA property: registers of A∪B are the
    cell-wise MAX of A's and B's registers, so pairwise overlaps over
    G groups cost one self-join of O(G × 2^p) register rows — at
    100 TB the raw data is scanned once to build registers and never
    again, however many pair queries follow. (Intersection via
    inclusion-exclusion inherits the absolute error of the three
    estimates; fine for overlap ANALYTICS, not for exact joins.)

    Output: (group_a, group_b, est_a, est_b, est_union,
    est_intersection) for group_a < group_b, floor-4-truncated like
    ``hll_finalize``.
    """
    # the register table feeds THREE consumers (per-group finalize and
    # both sides of the pair replication) — materialize it once
    # (G × ≤2^p rows) so the raw data is scanned exactly once, not 3×
    regs = hll_registers(df, key_col, [group_col], p).localCheckpoint()
    singles = hll_finalize(regs, [group_col], p).select(
        F.col(group_col).alias("__g"),
        F.col("hll_estimate").alias("__est"),
    )
    # Union registers per pair: REPLICATE each group's registers onto
    # every pair it belongs to, then MAX per (pair, bucket). An inner
    # bucket-join of the two sides would silently DROP buckets set in
    # only one sketch and underestimate the union — the register union
    # must be an outer set union, which the union-then-max expresses
    # without any outer join. The pair list is O(G²) rows (broadcast);
    # the replicated registers are O(pairs × 2^p).
    groups = regs.select(F.col(group_col).alias("__g")).distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .crossJoin(groups.select(F.col("__g").alias("group_b")))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    regs_a = F.broadcast(pairs).join(
        regs, pairs["group_a"] == regs[group_col]
    ).select("group_a", "group_b", "__bucket", "__rho")
    regs_b = F.broadcast(pairs).join(
        regs, pairs["group_b"] == regs[group_col]
    ).select("group_a", "group_b", "__bucket", "__rho")
    union_regs = (
        regs_a.unionByName(regs_b)
        .groupBy("group_a", "group_b", "__bucket")
        .agg(F.max("__rho").alias("__rho"))
    )
    union_est = hll_finalize(union_regs, ["group_a", "group_b"], p).select(
        "group_a", "group_b", F.col("hll_estimate").alias("est_union")
    )
    out = (
        union_est.join(
            singles.select(
                F.col("__g").alias("group_a"), F.col("__est").alias("est_a")
            ),
            "group_a",
        )
        .join(
            singles.select(
                F.col("__g").alias("group_b"), F.col("__est").alias("est_b")
            ),
            "group_b",
        )
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return out.select(
        "group_a",
        "group_b",
        "est_a",
        "est_b",
        "est_union",
        (F.floor(F.greatest(inter, F.lit(0.0)) * 1e4) / 1e4).alias(
            "est_intersection"
        ),
    ).orderBy("group_a", "group_b")


def cms_registers(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-min sketch registers: (``__row``, ``__cell``, ``cnt``).

    Each input row increments one cell per hash row — cell_i =
    xxhash64(i, key) mod width, the per-seed chained-prefix pattern the
    MinHash signatures use. COUNT is associative, so the register build
    is one groupBy over ≤ depth × width keys: map-side partials bound
    the shuffle at O(partitions × depth × width) rows no matter how
    many billions of events stream through — THE frequency structure
    for keyspaces too large to hold exact per-key counters.

    Registers are mergeable by cell-wise addition (sum two register
    tables grouped on (__row, __cell)) — daily sketches roll up to
    monthly without touching raw data, like ``hll_registers``.

    Deterministic by construction (integer counts, fixed-seed hashing):
    an independent implementation reproduces every register exactly —
    unlike ``approx_count_distinct``-style merge-order-dependent state.
    """
    if not 1 <= depth <= 8:
        raise ValueError(f"depth={depth} outside [1, 8]")
    if not 64 <= width <= 1 << 20:
        raise ValueError(f"width={width} outside [64, {1 << 20}]")
    cells = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(width))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.posexplode(cells).alias("__row", "__cell"))
        .groupBy("__row", "__cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query a CMS register table for every key in ``keys``:
    estimate = min over hash rows of the key's cell count (Cormode &
    Muthukrishnan 2005). Always ≥ the true count; equal unless every
    hash row collides.

    Output: (key_col, ``est_count`` long), one row per distinct key.

    Plan: the register table is ≤ depth × width rows — it BROADCASTS to
    the key side (keys explode to depth rows each, left-join on
    (__row, __cell), min-combine). Nothing about the original data is
    rescanned: this is the serving path — sketch once, answer point
    queries from the sketch table forever.
    """
    cells = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(width))
            for i in range(depth)
        ]
    )
    probed = keys.select(key_col).distinct().select(
        key_col, F.posexplode(cells).alias("__row", "__cell")
    )
    return (
        probed.join(F.broadcast(registers), ["__row", "__cell"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


def cms_join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Equi-join cardinality estimation from count-min sketches — the
    AGMS/CMS inner-product estimator (Alon-Gibbons-Matias-Szegedy;
    Cormode & Muthukrishnan §4.2): |A ⋈ B| = Σ_k f_A(k)·f_B(k), and
    the MIN over hash rows of the register inner products is an upper-
    bound estimate of it with the usual εN_A·N_B guarantee. This is
    the statistic a cost-based optimizer wants BEFORE committing to a
    join strategy, computable from two sketch passes without running
    the join.

    The output row carries the exact join size next to the estimate
    (one key-grain aggregate per side + one key join — cheap at the
    key grain) and their ratio, making the query self-auditing: the
    estimate must upper-bound the exact count by construction.

    Scale: register builds are map-side-combinable onto ≤ depth×width
    cells; the inner product joins two ≤ depth×width register tables;
    products accumulate in decimal(38,0) (register products overflow
    int64 once counts pass ~3e9).
    """
    ra = cms_registers(left, left_key, depth=depth, width=width)
    rb = cms_registers(right, right_key, depth=depth, width=width)
    prod = (F.col("a.cnt").cast("decimal(19,0)") * F.col("b.cnt").cast(
        "decimal(19,0)"
    )).alias("p")
    inner = (
        ra.alias("a")
        .join(
            rb.alias("b"),
            (F.col("a.__row") == F.col("b.__row"))
            & (F.col("a.__cell") == F.col("b.__cell")),
        )
        .select(F.col("a.__row").alias("__row"), prod)
        .groupBy("__row")
        .agg(F.sum("p").alias("ip"))
        .agg(F.min("ip").cast("long").alias("cms_estimate"))
    )
    ca = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count("*").alias("ca")
    )
    cb = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count("*").alias("cb")
    )
    exact = (
        ca.join(cb, "k")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("ca").cast("decimal(19,0)")
                    * F.col("cb").cast("decimal(19,0)")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("exact_join_size")
        )
    )
    ratio = F.col("cms_estimate").cast("double") / F.col(
        "exact_join_size"
    ).cast("double")
    return (
        exact.join(F.broadcast(inner))
        .select(
            "exact_join_size",
            "cms_estimate",
            F.when(
                F.col("exact_join_size") > 0,
                F.floor(ratio * 1e6) / 1e6,
            ).alias("overestimate_ratio"),
        )
    )


def binned_quantile_sketch(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 1000,
) -> DataFrame:
    """Approximate quantiles via a fixed-width histogram sketch — the
    deterministic, engine-reproducible alternative to
    ``approx_percentile`` (whose GK summary depends on partition merge
    order and is not reproducible across engines, so it can never pass
    an exact oracle).

    Accuracy: the estimate is the UPPER EDGE of the first bin whose
    cumulative count reaches ceil(q·N) — within (max−min)/n_bins of
    the true quantile, and monotone in q by construction.

    Scale shape: one bounds aggregate (min/max/count — associative,
    map-side combined), one scan to bin (pure projection against the
    broadcast 1-row bounds), one groupBy over ≤ ``n_bins`` keys
    (map-side combined: the shuffle moves O(partitions × bins) rows
    regardless of input size), then O(bins × quantiles) driver-light
    selection. The cumulative window is unpartitioned but runs over
    ≤ n_bins rows — bounded by the SKETCH, not the data. Exactly the
    two-pass histogram a warehouse runs at 100 TB.

    Every arithmetic step is single-IEEE-op reproducible (bin width
    division, edge reconstruction), so a SQL engine computing the same
    formula lands on identical doubles — no float-accumulation anywhere
    (counts are integers).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    bounds = df.agg(
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
        F.count(value_col).alias("__n"),
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(n_bins)
    binned = (
        df.select(F.col(value_col).alias("__v"))
        .join(F.broadcast(bounds))
        .select(
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("__v") - F.col("__mn")) / width),
                    F.lit(n_bins - 1),
                )
            )
            .cast("long")
            .alias("bin"),
            "__mn",
            "__mx",
            "__n",
        )
    )
    hist = binned.groupBy("bin").agg(
        F.count("*").alias("cnt"),
        F.first("__mn").alias("__mn"),
        F.first("__mx").alias("__mx"),
        F.first("__n").alias("__n"),
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    q = cum.select(
        F.explode(F.array(*[F.lit(float(x)) for x in quantiles])).alias(
            "quantile"
        ),
        "bin",
        "cum",
        "__mn",
        "__mx",
        "__n",
    ).filter(F.col("cum") >= F.ceil(F.col("quantile") * F.col("__n")))
    est = F.col("__mn") + (F.col("bin") + 1) * (
        (F.col("__mx") - F.col("__mn")) / F.lit(n_bins)
    )
    return (
        q.groupBy("quantile")
        .agg(
            F.min("bin").alias("bin"),
            F.first("__mn").alias("__mn"),
            F.first("__mx").alias("__mx"),
        )
        .select("quantile", F.col("bin"), est.alias("est_value"))
        .orderBy("quantile")
    )

def histogram_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 1000,
) -> DataFrame:
    """Per-group fixed-width histogram REGISTERS over GLOBAL bin edges
    — the mergeable form of ``binned_quantile_sketch``.

    The edges come from one corpus-wide min/max pass (1-row broadcast),
    so every group's registers share the same bin geometry. That makes
    the registers ASSOCIATIVE under addition: summing day registers
    yields the month registers bit-for-bit (counts are integers — no
    float anywhere), which is what lets a 100 TB rollup hierarchy
    (day → month → total) re-aggregate O(groups × n_bins) register rows
    instead of re-scanning raw data — the additive sibling of the HLL
    register-MAX rollup (``hll_registers``).

    Scale shape: one bounds aggregate, one binning scan (pure
    projection against the broadcast bounds), one groupBy over
    (groups × ≤ n_bins) keys with map-side combine. Returns
    (*group_cols, bin, cnt, __mn, __mx, __nb) — the bin count rides in
    the registers so the finalize side derives the edge geometry from
    the sketch itself and can never mis-scale against a mismatched
    caller-passed n_bins (ADVICE r05).
    """
    bounds = df.agg(
        F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx")
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(n_bins)
    # NULL values fall outside every bin, matching the bounds aggregate
    # (min/max skip NULLs) — without this filter they'd form a NULL-bin
    # register that histogram_quantiles would sort first and count into
    # __n, shifting every quantile.
    binned = df.filter(F.col(value_col).isNotNull()).join(
        F.broadcast(bounds)
    ).select(
        *group_cols,
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("__mn")) / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("long")
        .alias("bin"),
        "__mn",
        "__mx",
        F.lit(n_bins).alias("__nb"),
    )
    return binned.groupBy(*group_cols, "bin").agg(
        F.count("*").alias("cnt"),
        F.first("__mn").alias("__mn"),
        F.first("__mx").alias("__mx"),
        F.first("__nb").alias("__nb"),
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Quantile extraction from histogram registers (the finalize half,
    like ``hll_finalize``): per-group cumulative window over the
    register rows — bounded by the SKETCH, not the data — then
    selection of the first bin whose cumulative count reaches
    ceil(q·N). The bin geometry (``__nb``) comes from the registers
    themselves, never from an independent parameter a caller could
    mismatch against the build side (ADVICE r05). Single-IEEE-op edge
    reconstruction, identical to ``binned_quantile_sketch`` so a SQL
    engine computing the same formula lands on the same doubles.
    Returns (*group_cols, quantile, bin, est_value, n_rows).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "__n", F.sum("cnt").over(wall)
    )
    q = cum.select(
        *group_cols,
        F.explode(F.array(*[F.lit(float(x)) for x in quantiles])).alias(
            "quantile"
        ),
        "bin",
        "cum",
        "__mn",
        "__mx",
        "__nb",
        "__n",
    ).filter(F.col("cum") >= F.ceil(F.col("quantile") * F.col("__n")))
    est = F.col("__mn") + (F.col("bin") + 1) * (
        (F.col("__mx") - F.col("__mn")) / F.col("__nb")
    )
    return (
        q.groupBy(*group_cols, "quantile")
        .agg(
            F.min("bin").alias("bin"),
            F.first("__mn").alias("__mn"),
            F.first("__mx").alias("__mx"),
            F.first("__nb").alias("__nb"),
            F.first("__n").alias("__n"),
        )
        .select(
            *group_cols,
            "quantile",
            "bin",
            est.alias("est_value"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        .orderBy(*group_cols, "quantile")
    )


def kmv_source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 5,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values sketch of every source's word-``n``-gram set,
    combined pairwise into content-overlap (Jaccard) estimates — the
    "which sources crawl the same text" diagnostic that complements
    the distributional JS divergence (functions/text.py): JSD sees
    word-frequency drift, KMV sees literal shared phrasing. Sketch
    algebra makes it cheap: each source is reduced to its ``k``
    lexicographically-smallest md5(shingle) digests (md5 as the
    uniform permutation — deterministic AND expressible in the DuckDB
    oracle, unlike xxhash64), and any number of pairwise estimates
    combine sketch rows only.

    Estimator: for pair (a, b), take the ``k`` smallest digests of
    sketch(a) ∪ sketch(b); J ≈ |those present in both| / |those kept|.
    When a union is smaller than ``k`` the sketch IS the union and the
    estimate is exact — including the exact 0.0 for disjoint sources.

    Scale shape: one (source, digest)-keyed distinct (map-side
    combinable), then the per-source row_number≤k filter which Spark
    rewrites to WindowGroupLimit — each task keeps ≤ k rows per source
    BEFORE the shuffle, so the sort never sees a source's full
    distinct-shingle set (the curate_top_per_group discipline). Every
    later stage touches only sketch rows: ≤ k·|sources| joined onto
    the S×S pair grid (grid justified in tools/plan_audit.py), ≤ 2k
    rows per pair through the bounded ranking window.

    Output: (source_a, source_b, n_union_sketch, n_common,
    jaccard_est), one row per unordered source pair.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from .dedup import _spread, word_shingles  # noqa: PLC0415

    sh = (
        _spread(df, text_col)
        .select(
            F.col(source_col).alias("__src"),
            F.explode(word_shingles(F.col(text_col), n)).alias("__g"),
        )
        .select("__src", F.md5(F.col("__g")).alias("__h"))
        .distinct()
    )
    w_src = Window.partitionBy("__src").orderBy("__h")
    sketch = (
        sh.withColumn("__r", F.row_number().over(w_src))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    srcs = sketch.select("__src").distinct()
    a = srcs.select(F.col("__src").alias("source_a"))
    b = srcs.select(F.col("__src").alias("source_b"))
    grid = a.crossJoin(b).where(F.col("source_a") < F.col("source_b"))
    members = grid.select(
        "source_a",
        "source_b",
        F.explode(F.array("source_a", "source_b")).alias("__src"),
    )
    pair_rows = (
        sketch.join(members, "__src")
        .groupBy("source_a", "source_b", "__h")
        .agg(F.count("*").alias("__cnt"))
    )
    w_pair = Window.partitionBy("source_a", "source_b").orderBy("__h")
    kept = pair_rows.withColumn(
        "__r", F.row_number().over(w_pair)
    ).filter(F.col("__r") <= k)
    return (
        kept.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_union_sketch"),
            F.sum((F.col("__cnt") == 2).cast("long")).alias("n_common"),
        )
        .select(
            "source_a",
            "source_b",
            "n_union_sketch",
            F.col("n_common").cast("long").alias("n_common"),
            (
                F.floor(
                    F.col("n_common").cast("double")
                    / F.col("n_union_sketch").cast("double")
                    * 1000000.0
                )
                / 1000000.0
            ).alias("jaccard_est"),
        )
    )


def histogram_percentile_rank(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 1000,
) -> DataFrame:
    """Per-group percentile rank (step-ECDF) of ``value_col`` via the
    mergeable histogram registers — the calibration step that makes
    heterogeneous per-source quality scores comparable before mixing
    (source A's 0.6 may be its 95th percentile while source B's is
    median; mixing on raw scores silently over-samples the laxer
    scale). Rank-normalization WITHOUT per-group sorts: an exact
    per-group percent_rank needs a data-sized sorted window per group,
    the classic 100 TB killer — the ECDF over ≤ ``n_bins`` registers
    is the sketch-resolution answer (same geometry as
    :func:`histogram_registers`, so day registers roll up to month
    ECDFs for free).

    Every row gets ``pct_rank`` = fraction of its group with a bin ≤
    its own (right-continuous step ECDF at histogram resolution; ties
    within a bin share a rank). Integer register counts divide once at
    the end — deterministic, floor-truncated to 6 decimals. NULL
    values are dropped (the registers' own contract).

    Scale shape: one bounds aggregate, the register build (groups ×
    ≤ n_bins keys, map-side combine), a bounded cumulative window over
    register rows, and one (group, bin)-keyed join back to the rows —
    AQE broadcasts the register side, which is sketch-sized at any
    corpus size.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    hist = histogram_registers(df, value_col, group_cols, n_bins)
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(wcum).alias("__cum"),
        F.sum("cnt").over(wall).alias("__tot"),
    )
    bounds = hist.select("__mn", "__mx").distinct()
    width = (F.col("__mx") - F.col("__mn")) / F.lit(n_bins)
    bin_expr = (
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("__mn")) / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("long")
    )
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .join(F.broadcast(bounds))
        .withColumn("bin", bin_expr)
        .drop("__mn", "__mx")
    )
    pct = (
        F.floor(
            F.col("__cum").cast("double")
            / F.col("__tot").cast("double")
            * 1000000.0
        )
        / 1000000.0
    )
    return rows.join(cum, [*group_cols, "bin"]).select(
        *df.columns, "bin", pct.alias("pct_rank")
    )
