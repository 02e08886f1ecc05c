"""Declarative data-quality constraint checking (the Deequ/
Great-Expectations core, engine-native).

The reference pipeline trusts its loads blindly — the only validation
in the repo is Airflow DAG-integrity boilerplate
(/root/reference/astro-sdk-tutorial/tests/dags/test_dag_example.py);
bad rows surface, if ever, in the Power BI layer. A warehouse engine
owns this: constraints declared as data, evaluated in as few passes as
the constraint mix allows, one violations row per constraint.

Constraint forms (each a dict entry: name -> spec):

- ``("not_null", col)``              — col IS NOT NULL
- ``("unique", col)``                — no key occurs twice
- ``("range", col, lo, hi)``         — lo <= col <= hi (inclusive)
- ``("in_set", col, values)``        — col within an allowed set
- ``("matches", col, regex)``        — full-match against a pattern
- ``("ref", col, dim_df, dim_col)``  — referential integrity: every
  non-null value exists in the dimension's key column

Output: (constraint, kind, n_rows, n_violations, passed) — one row per
constraint, ordered by name.

Scale shape: every row-local constraint (not_null / range / in_set /
matches) folds into ONE conditional-sum aggregate over a single scan —
adding ten more such checks adds zero passes. ``unique`` needs its own
keyed aggregation (count>1 per key, map-side combined, then a tiny
violation count). ``ref`` is a left-anti join against the dimension —
broadcast when the dim is small (AQE decides), i.e. the same cost as
the join the data was loaded for. Nothing collects more than the
per-constraint summary row.
"""

from __future__ import annotations

import re

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LOCAL = {"not_null", "range", "in_set", "matches"}


def _violation_expr(spec: tuple) -> Column:
    kind = spec[0]
    if kind == "not_null":
        return F.col(spec[1]).isNull()
    if kind == "range":
        _, col, lo, hi = spec
        c = F.col(col)
        return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    if kind == "in_set":
        _, col, values = spec
        return ~F.col(col).isin(list(values))
    if kind == "matches":
        _, col, pattern = spec
        return ~(F.col(col).rlike(f"^(?:{pattern})$"))
    raise ValueError(f"unknown row-local constraint kind {kind!r}")


def check_constraints(
    df: DataFrame, constraints: dict[str, tuple]
) -> DataFrame:
    """Evaluate ``constraints`` against ``df``; see module docstring
    for the spec forms and the pass structure."""
    if not constraints:
        raise ValueError("no constraints given")
    # Constraint names flow into SQL string literals ('{n}' in the
    # stack() expression) and into __v_{n} column aliases — restrict
    # them to identifier characters up front so a quote/space/hyphen
    # can neither break nor inject into the generated expression.
    bad_names = [n for n in constraints if not re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad_names:
        raise ValueError(
            f"constraint names must match [A-Za-z0-9_]+: {bad_names}"
        )

    row_local = {
        n: s for n, s in constraints.items() if s[0] in _ROW_LOCAL
    }
    uniques = {n: s for n, s in constraints.items() if s[0] == "unique"}
    refs = {n: s for n, s in constraints.items() if s[0] == "ref"}
    unknown = set(constraints) - set(row_local) - set(uniques) - set(refs)
    if unknown:
        bad = {n: constraints[n][0] for n in unknown}
        raise ValueError(f"unknown constraint kinds: {bad}")

    parts: list[DataFrame] = []

    if row_local:
        # one scan, one aggregate row for ALL row-local checks
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(_violation_expr(s).cast("long")).alias(f"__v_{n}")
            for n, s in row_local.items()
        ]
        one = df.agg(*aggs)
        stack_pairs = ", ".join(
            f"'{n}', '{s[0]}', __v_{n}" for n, s in row_local.items()
        )
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(row_local)}, {stack_pairs})"
                    " AS (constraint, kind, n_violations)"
                ),
                F.col("__n").alias("n_rows"),
            ).select("constraint", "kind", "n_rows", "n_violations")
        )

    for n, s in uniques.items():
        col = s[1]
        dup = (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
                .cast("long")
                .alias("n_violations"),
                F.sum("__c").cast("long").alias("n_rows"),
            )
        )
        parts.append(
            dup.select(
                F.lit(n).alias("constraint"),
                F.lit("unique").alias("kind"),
                "n_rows",
                F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
            )
        )

    for n, s in refs.items():
        _, col, dim_df, dim_col = s
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                dim_df.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        # both sides are 1-row aggregates — the cross join is a pair of
        # broadcast scalars, keeping the whole check one lazy plan
        parts.append(
            total.crossJoin(orphans).select(
                F.lit(n).alias("constraint"),
                F.lit("ref").alias("kind"),
                "n_rows",
                "n_violations",
            )
        )

    out = reduce(lambda a, b: a.unionByName(b), parts)
    nv = F.coalesce(F.col("n_violations"), F.lit(0))  # empty-input SUM is null
    return out.select(
        "constraint",
        "kind",
        "n_rows",
        nv.cast("long").alias("n_violations"),
        (nv == 0).alias("passed"),
    ).orderBy("constraint")


def table_column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Catalog-style column profile — one row per column with row
    count, null count, exact distinct count, and the modal value with
    its frequency (ties break on the smaller value string, so the mode
    is deterministic). The dbt-docs / DESCRIBE-EXTENDED panel, as a
    query.

    Values profile through their canonical string form (one report
    schema for every column type; timestamps render in UTC ISO form
    consistently on both engines).

    Scale: per column, one map-side-combinable value-grain aggregate
    feeding a 1-row TakeOrdered mode pick and a null/distinct rollup —
    each column's pipeline is independent (a union of narrow
    aggregates, never a wide shuffle). Column count is schema-bounded,
    so the union width is too.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    parts = []
    for c in cols:
        sval = F.col(c).cast("string")
        grain = (
            df.select(sval.alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("cnt"))
            # both the rollup and the mode pick consume the grain —
            # pin it so the base table scans once per column, not twice
            .localCheckpoint(eager=False)
        )
        stats = grain.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("n_null"),
            F.count(F.when(F.col("v").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("n_distinct"),
        )
        mode = (
            grain.filter(F.col("v").isNotNull())
            .orderBy(F.col("cnt").desc(), F.col("v"))
            .limit(1)
            .select(
                F.col("v").alias("top_value"),
                F.col("cnt").cast("long").alias("top_count"),
            )
        )
        parts.append(
            # LEFT join: for an all-NULL column the mode frame is
            # empty, and an inner join would silently drop the
            # column's row from the profile — it must still report
            # n_null = n_rows with NULL top_value/top_count (the
            # DuckDB oracle's LEFT JOIN mirrors this).
            stats.join(F.broadcast(mode), F.lit(True), "left").select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "top_value",
                "top_count",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


def numeric_corr_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact Pearson correlation for every pair of numeric columns in
    ONE aggregation pass — the profiling sibling of
    ``plans.relational.numeric_column_profile`` (which stops at
    per-column stats) and the BI correlation panel over a fact table.

    Determinism discipline: every moment (sum, sum of squares, sum of
    cross products) accumulates in EXACT decimal — inputs cast to
    DECIMAL(18,6) once, products therefore exact DECIMAL(37,12) —
    so the aggregates are order-independent; the Pearson formula then
    runs in doubles on those exact sums (single cast each, identical
    IEEE ops in the SQL oracle) and truncates to 6 decimals. A
    zero-variance column (constants — e.g. TPC-H o_shippriority)
    reports 0.0 against everything rather than NULL/NaN, keeping the
    output hash-comparable.

    Scale shape: one map-side-combinable aggregate producing a single
    row of 2k + k(k-1)/2 + 1 moments (k = len(cols) — driver-bounded
    by the column list, never the data), then a constant-size unpivot
    to (col_a, col_b, corr, n) pair rows. Rows where ANY of the
    columns is NULL are excluded up front (listwise deletion, the
    standard correlation-matrix contract), so every pair shares the
    same n.
    """
    if len(cols) < 2:
        raise ValueError("numeric_corr_pairs needs >= 2 columns")
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    clean = df.na.drop(subset=cols)
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(dec(c)).alias(f"s_{c}"))
        aggs.append(F.sum(dec(c) * dec(c)).alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(dec(a) * dec(b)).alias(f"p_{a}_{b}"))
    row = clean.agg(*aggs)

    n = F.col("n").cast("double")
    d = lambda name: F.col(name).cast("double")  # noqa: E731

    def corr(a: str, b: str) -> Column:
        cov = n * d(f"p_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
        va = n * d(f"q_{a}") - d(f"s_{a}") * d(f"s_{a}")
        vb = n * d(f"q_{b}") - d(f"s_{b}") * d(f"s_{b}")
        # clamp before truncating: sqrt rounding can land |r| a few
        # ulps past 1, and floor-truncation would then report the
        # out-of-range -1.000001
        r = F.greatest(
            F.lit(-1.0),
            F.least(F.lit(1.0), cov / (F.sqrt(va) * F.sqrt(vb))),
        )
        return F.when(
            (va <= 0) | (vb <= 0), F.lit(0.0)
        ).otherwise(F.floor(r * 1000000.0) / 1000000.0)

    out = row.select(
        F.col("n").cast("long").alias("n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        corr(a, b).alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("__p"),
    )
    return out.select(
        F.col("__p.col_a").alias("col_a"),
        F.col("__p.col_b").alias("col_b"),
        F.col("__p.corr").alias("corr"),
        "n",
    )
