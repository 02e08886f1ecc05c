"""End-to-end daily ETL driver — the reference's seven chained DAGs as
one Spark job (SURVEY.md §0: raw ingest → d_event → d_item →
d_parameter → d_user → f_events → aggregated views).

The reference chains Airflow DAGs with ``TriggerDagRunOperator`` and
materializes every hop into Snowflake; here the chain is plain call
order (Spark laziness fuses each build into one plan) and only the
named warehouse tables materialize. An external scheduler (Airflow)
invokes :func:`run_daily_pipeline` once per day — the engine/scheduler
split the north star prescribes.

MERGE targets persist as parquet directories under ``warehouse_dir``.
Each merge is write-to-staging-then-swap (the honest plain-parquet
atomicity fallback — reads of the old target feed the merge plan, so
in-place overwrite would corrupt; Delta/Iceberg replace the swap with a
transactional commit, see ``operators.merge.delta_merge``).

Reference semantics preserved (SURVEY.md §2.1 S6/S7) with one
deliberate, documented fix: the reference numbers each day's delta from
1 and merges, so day-2 inserts REUSE guid values already in the
warehouse (a latent reference bug — surrogate keys stop being keys).
Here matched rows keep their stable guid and inserted rows continue
contiguously from the warehouse max, so guids stay unique and existing
rows never renumber:
- dims merge with ``if_conflicts="ignore"`` on the natural key —
  append-only; pre-existing rows never change.
- ``d_item`` and ``f_events`` merge with ``if_conflicts="update"``
  (SCD-1), the fact on its composite key (attributes update, the
  surrogate key is stable).
- Re-running the same day is a no-op (idempotent); a new day's delta
  appends/updates exactly its keys.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.keys import ordered_surrogate_key
from ..operators.merge import merge_ignore, merge_update
from . import marketing

FACT_KEYS = ("event_id", "event_name", "event_parameter_value")


def _table_dir(warehouse_dir: str, name: str) -> str:
    return os.path.join(warehouse_dir, name)


def _swap_write(result: DataFrame, path: str) -> None:
    """Materialize to a staging dir, then atomically-ish swap. Local-FS
    rename; on HDFS/S3 this is the FileSystem rename / committer step,
    and with a table format it disappears entirely."""
    staging = path + "__staging"
    result.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)


# --- storage indirection: plain dirs vs the transactional layer ---------
#
# A warehouse bootstrapped with ``run_daily_pipeline(versioned=True)``
# carries a marker file; every table write then COMMITS a version
# (sources/versioned.py — atomic manifest, snapshot isolation, one
# auditable version per daily cycle, time travel across days) instead
# of the staging-dir swap, and every read resolves the latest
# snapshot. Plain warehouses behave exactly as before.

_VERSIONED_MARKER = ".versioned_warehouse"


def _is_versioned_table(path: str) -> bool:
    return os.path.exists(
        os.path.join(os.path.dirname(path), _VERSIONED_MARKER)
    )


def _table_exists(path: str) -> bool:
    if _is_versioned_table(path):
        from ..sources import versioned as vt  # noqa: PLC0415

        return bool(vt.table_versions(path))
    return os.path.exists(path)


def _read_tbl(spark: SparkSession, path: str) -> DataFrame:
    if _is_versioned_table(path):
        from ..sources import versioned as vt  # noqa: PLC0415

        return vt.read_version(spark, path)
    return spark.read.parquet(path)


def _write_tbl(result: DataFrame, path: str) -> None:
    if _is_versioned_table(path):
        from ..sources import versioned as vt  # noqa: PLC0415

        vt.write_version(result, path)
        return
    _swap_write(result, path)


def _null_safe_cond(keys: tuple[str, ...]):
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else cond & c
    return cond


def _merge_into(
    spark: SparkSession,
    result_path: str,
    fresh: DataFrame,
    keys: tuple[str, ...],
    update: bool,
    guid_col: str | None = None,
    guid_order: tuple[str, ...] = (),
) -> None:
    """Bootstrap on first run; MERGE (ignore/update) afterwards.

    When ``guid_col`` is given, surrogate keys stay globally unique
    across daily loads: matched rows keep the target's guid, new rows
    are renumbered contiguously after the warehouse max (ordered by
    ``guid_order`` for determinism). Without this, each day's delta
    would re-number from 1 and collide with existing guids."""
    if not _table_exists(result_path):
        _write_tbl(fresh, result_path)
        return
    target = _read_tbl(spark, result_path)
    if guid_col is None:
        merged = (
            merge_update(target, fresh, list(keys))
            if update
            else merge_ignore(target, fresh, list(keys))
        )
        _write_tbl(merged, result_path)
        return

    tgt_max = target.agg(F.max(guid_col)).first()[0] or 0
    src = fresh.drop(guid_col)
    cond = _null_safe_cond(keys)
    new_src = src.alias("s").join(target.alias("t"), cond, "left_anti")
    new_numbered = ordered_surrogate_key(
        new_src, guid_col, order_by=list(guid_order), start=tgt_max + 1
    ).select(*target.columns)
    if update:
        # Matched source rows take fresh attributes but keep the
        # target's stable guid.
        matched = (
            src.alias("s")
            .join(
                target.select(*keys, guid_col).alias("t"),
                cond,
                "inner",
            )
            .select(
                *[F.col(f"s.{c}") for c in src.columns],
                F.col(f"t.{guid_col}").alias(guid_col),
            )
            .select(*target.columns)
        )
        kept_old = (
            target.alias("t")
            .join(src.alias("s"), cond, "left_anti")
            .select(*target.columns)
        )
        merged = kept_old.unionByName(matched).unionByName(new_numbered)
    else:
        merged = target.unionByName(new_numbered)
    _write_tbl(merged, result_path)


def _stage_raw_ingest(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    # Full replace, latest delta wins (S3 semantics,
    # `etl_s3_snowflake_raw_event_ingest.py:49-54`).
    _write_tbl(
        marketing.build_event_raw(spark, sf_dir),
        _table_dir(warehouse_dir, "event_raw"),
    )


def _stage_d_event(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    # Dims: append-only merges on the natural key (S6).
    _merge_into(
        spark,
        _table_dir(warehouse_dir, "d_event"),
        marketing.build_d_event(spark, sf_dir),
        ("event_id",),
        update=False,
        guid_col="guid_event",
        guid_order=("event_id",),
    )


def _stage_d_item(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    # SCD-1 upsert (S7) on the item key.
    _merge_into(
        spark,
        _table_dir(warehouse_dir, "d_item"),
        marketing.build_d_item(spark, sf_dir),
        ("item_id",),
        update=True,
    )


def _stage_d_parameter(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    _merge_into(
        spark,
        _table_dir(warehouse_dir, "d_parameter"),
        marketing.build_d_parameter(spark, sf_dir),
        ("parameter_name",),
        update=False,
        guid_col="guid_parameter",
        guid_order=("parameter_name",),
    )


def _stage_d_user(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    _merge_into(
        spark,
        _table_dir(warehouse_dir, "d_user"),
        marketing.build_d_user(spark, sf_dir),
        ("user_id",),
        update=False,
        guid_col="guid_user",
        guid_order=("user_id",),
    )


def _stage_f_events(spark: SparkSession, sf_dir: str, warehouse_dir: str) -> None:
    # SCD-1 upsert on the composite fact key (S7).
    _merge_into(
        spark,
        _table_dir(warehouse_dir, "f_events"),
        marketing.build_f_events(spark, sf_dir),
        FACT_KEYS,
        update=True,
        guid_col="guid_event",
        guid_order=("event_id",),
    )


WAREHOUSE_TABLES = (
    "event_raw",
    "d_event",
    "d_user",
    "d_parameter",
    "d_item",
    "f_events",
)

# Declared warehouse contract — the reference's fixed CREATE OR REPLACE
# TABLE schemas (`etl_s3_snowflake_d_event.py:33-42` and peers), stated
# once here rather than re-inferred from files, so schema drift in a
# build is an ERROR at publish time instead of a silent catalog change.
WAREHOUSE_SCHEMAS: dict[str, str] = {
    "event_raw": (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, item_key BIGINT, guid_event_raw BIGINT"
    ),
    "d_event": "event_id BIGINT, guid_event BIGINT",
    "d_user": "user_id BIGINT, guid_user BIGINT",
    "d_parameter": "parameter_name STRING, guid_parameter BIGINT",
    "d_item": (
        "item_id BIGINT, item_name STRING, item_brand STRING,"
        " item_type STRING, item_size INT, item_price DOUBLE"
    ),
    "f_events": (
        "event_id BIGINT, event_time TIMESTAMP, event_user_id BIGINT,"
        " event_name STRING, event_value DOUBLE,"
        " event_parameter_value BIGINT, guid_event BIGINT"
    ),
}


def publish_catalog(
    spark: SparkSession,
    warehouse_dir: str,
    tables: tuple[str, ...] = WAREHOUSE_TABLES,
    prefix: str = "wh_",
    analyze: bool = False,
) -> None:
    """S5 — register every persisted warehouse table in the session
    CATALOG with its DECLARED schema (external over the parquet dirs,
    no data copy), after validating the files actually match the
    declaration.

    This is the reference's observable catalog semantics: downstream
    consumers address ``wh_f_events`` by name and the catalog answers
    schema questions — the filesystem layout becomes an implementation
    detail. Validation compares the parquet footer schema to
    :data:`WAREHOUSE_SCHEMAS`, so a build that drifts from the contract
    fails loudly here instead of poisoning every downstream query.
    """
    from pyspark.sql.types import StructType  # noqa: PLC0415

    from ..sources.writers import create_table_ddl  # noqa: PLC0415

    for name in tables:
        declared = StructType.fromDDL(WAREHOUSE_SCHEMAS[name])
        tdir = _table_dir(warehouse_dir, name)
        actual = _read_tbl(spark, tdir).schema
        if actual != declared:
            raise ValueError(
                f"schema drift in warehouse table {name!r}: declared "
                f"{declared.simpleString()} but files contain "
                f"{actual.simpleString()}"
            )
        location = tdir
        if _is_versioned_table(tdir):
            # The catalog points at the LATEST published snapshot's
            # data prefix (replace-mode snapshots hold exactly one);
            # each daily publish re-registers, so the catalog tracks
            # the last published version by construction.
            from ..sources import versioned as vt  # noqa: PLC0415

            prefixes = vt.snapshot_prefixes(tdir)
            if len(prefixes) != 1:
                continue  # append-mode history: address via views
            location = os.path.join(tdir, prefixes[0])
        create_table_ddl(
            spark,
            f"{prefix}{name}",
            WAREHOUSE_SCHEMAS[name],
            location=location,
        )
        if analyze:
            # CBO table stats (row count + size): what Catalyst's
            # cost-based join reordering and broadcast decisions read
            # for catalog-addressed tables — without stats every
            # wh_-table join falls back to file-size heuristics.
            spark.sql(
                f"ANALYZE TABLE {prefix}{name} COMPUTE STATISTICS"
            )


def _stage_aggregated_views(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    materialize_views: bool = False,
) -> None:
    # KPI views over the WAREHOUSE fact (not the day's source), exactly
    # like the reference's CREATE OR REPLACE VIEW layer (Q13). Reads
    # from persisted parquet so the stage is self-contained — it works
    # both in-process and as its own scheduler task / spark-submit.
    for name in WAREHOUSE_TABLES:
        _read_tbl(
            spark, _table_dir(warehouse_dir, name)
        ).createOrReplaceTempView(name)
    marketing.register_warehouse_kpi_views(spark)
    if materialize_views:
        for view_name in marketing.WAREHOUSE_KPI_SQL:
            _write_tbl(
                spark.table(view_name),
                _table_dir(warehouse_dir, f"kpi_{view_name}"),
            )


# One entry per DAG in the reference's daily chain, in chain order
# (`etl_s3_snowflake_raw_event_ingest.py:57-62` →
# `etl_s3_snowflake_f_events.py:98-104` → aggregated_views). Each stage
# is independently runnable (``main --stage``), so an external
# scheduler can map the chain 1:1 onto its own task graph — see
# ``orchestration.build_dag`` for the Airflow factory.
PIPELINE_STAGES = {
    "raw_ingest": _stage_raw_ingest,
    "d_event": _stage_d_event,
    "d_item": _stage_d_item,
    "d_parameter": _stage_d_parameter,
    "d_user": _stage_d_user,
    "f_events": _stage_f_events,
    "aggregated_views": _stage_aggregated_views,
}


def run_stage(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    stage: str,
    materialize_views: bool = False,
) -> None:
    """Run a single named pipeline stage (one reference DAG's worth)."""
    if stage not in PIPELINE_STAGES:
        raise ValueError(
            f"unknown stage {stage!r}; choose from {list(PIPELINE_STAGES)}"
        )
    os.makedirs(warehouse_dir, exist_ok=True)
    if stage == "aggregated_views":
        _stage_aggregated_views(spark, sf_dir, warehouse_dir, materialize_views)
    else:
        PIPELINE_STAGES[stage](spark, sf_dir, warehouse_dir)


def export_bi(
    spark: SparkSession,
    warehouse_dir: str,
    export_dir: str | None = None,
) -> dict[str, dict]:
    """S9 BI consumption contract (reference: Power BI over ODBC,
    ``README.md:73-77`` + ``report-overview.jpg``): drop every KPI view
    as a headered CSV plus a ``manifest.json`` describing path, column
    schema, and row count — the flat-file hand-off any BI client
    (Power BI folder source, Tableau, a plain spreadsheet) can ingest
    without a Spark connection.

    Every KPI result is bounded (rows ≤ #periods or ≤ top-k items, by
    construction — never raw-event cardinality), so the single-file
    ``coalesce(1)`` CSV is safe at any input scale; the heavy lifting
    stayed in the distributed plan that materialized the view.
    Returns the manifest's view map.
    """
    import json  # noqa: PLC0415

    export_dir = export_dir or os.path.join(warehouse_dir, "bi_export")
    views: dict[str, dict] = {}
    for view_name in marketing.WAREHOUSE_KPI_SQL:
        df = spark.table(view_name)
        out = _table_dir(export_dir, view_name)
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .csv(out)
        )
        views[view_name] = {
            "path": view_name,
            "format": "csv",
            "options": {"header": True},
            "columns": [
                {
                    "name": f.name,
                    "type": f.dataType.simpleString(),
                    "nullable": f.nullable,
                }
                for f in df.schema.fields
            ],
            "rows": spark.read.option("header", True).csv(out).count(),
        }
    manifest = {"contract": "bi_export/v1", "views": views}
    with open(os.path.join(export_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return views


def run_daily_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    materialize_views: bool = False,
    versioned: bool = False,
) -> dict[str, int]:
    """One daily cycle: ingest, build dims + fact, MERGE into the
    warehouse, refresh KPI views, publish the BI export. Returns
    per-table row counts.

    ``materialize_views=True`` additionally persists each KPI view as a
    ``kpi_<name>`` parquet table — the "answers always available" BI
    contract (SURVEY.md §3.3: the reference's views are recomputed on
    every Power BI read; materializing trades daily write cost for
    zero-latency reads).

    ``versioned=True`` bootstraps the warehouse on the transactional
    layer (sources/versioned.py): every table write commits one atomic
    version per daily cycle — concurrent readers keep their snapshot
    mid-cycle, any day's state stays time-travelable, and a crashed
    cycle leaves only invisible uncommitted prefixes. The flag only
    matters at bootstrap; an existing warehouse keeps its mode."""
    if versioned:
        os.makedirs(warehouse_dir, exist_ok=True)
        marker = os.path.join(warehouse_dir, _VERSIONED_MARKER)
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("sources/versioned.py transactional warehouse\n")
    for stage in PIPELINE_STAGES:
        run_stage(spark, sf_dir, warehouse_dir, stage, materialize_views)
    publish_catalog(spark, warehouse_dir)
    export_bi(spark, warehouse_dir)
    return {
        name: _read_tbl(spark, _table_dir(warehouse_dir, name)).count()
        for name in WAREHOUSE_TABLES
    }


# ---------------------------------------------------------------------------
# Partitioned incremental fact + continuous aggregate (the 100 TB shape)
# ---------------------------------------------------------------------------

FACT_PARTITION_COL = "event_date"


def merge_fact_partitioned(
    spark: SparkSession, warehouse_dir: str, fresh: DataFrame
) -> str:
    """Date-partitioned fact merge: rewrite ONLY the partitions the
    day's delta touches.

    The swap-based merge above rewrites the whole fact every day —
    honest but O(warehouse) daily I/O. At 100 TB the correct shape is:

    1. partition the fact by ``event_date`` (derived once from the
       immutable event_time);
    2. read back only the affected partitions (partition pruning — the
       unaffected 99.9% of the warehouse is never opened);
    3. merge the delta against just those rows;
    4. write with dynamic partition overwrite, which replaces exactly
       the affected date directories and leaves the rest untouched.

    Requires the partition column to be STABLE under updates (an update
    may change attributes, never event_date) — otherwise the old row in
    the old partition would survive as a duplicate. event_date derives
    from event_time, which is part of the event's identity here.
    """
    path = _table_dir(warehouse_dir, "f_events_partitioned")
    delta = fresh.withColumn(
        FACT_PARTITION_COL, F.to_date(F.col("event_time"))
    )
    if not os.path.exists(path):
        delta.write.partitionBy(FACT_PARTITION_COL).parquet(path)
        return path

    affected = [
        r[FACT_PARTITION_COL]
        for r in delta.select(FACT_PARTITION_COL).distinct().collect()
    ]
    target = spark.read.parquet(path).filter(
        F.col(FACT_PARTITION_COL).isin(affected)
    )
    guid_max = (
        spark.read.parquet(path).agg(F.max("guid_event")).first()[0] or 0
    )
    cond = _null_safe_cond(FACT_KEYS)
    src = delta.drop("guid_event")
    matched = (
        src.alias("s")
        .join(target.select(*FACT_KEYS, "guid_event").alias("t"), cond, "inner")
        .select(
            *[F.col(f"s.{c}") for c in src.columns],
            F.col("t.guid_event").alias("guid_event"),
        )
    )
    kept_old = target.alias("t").join(src.alias("s"), cond, "left_anti")
    new_rows = ordered_surrogate_key(
        src.alias("s").join(target.alias("t"), cond, "left_anti"),
        "guid_event",
        order_by=["event_id"],
        start=guid_max + 1,
    )
    cols = target.columns
    merged = (
        kept_old.select(*cols)
        .unionByName(matched.select(*cols))
        .unionByName(new_rows.select(*cols))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy(FACT_PARTITION_COL).parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return path


def update_daily_rollup(
    spark: SparkSession, warehouse_dir: str, fact_path: str, delta: DataFrame
) -> str:
    """Continuous aggregate: a persisted (period × event_name) rollup
    maintained incrementally — recompute ONLY the periods the delta
    touches from the merged fact, then upsert them into the rollup
    table. The daily cost is O(affected periods), not O(history);
    at 100 TB this is the difference between a rollup refresh that
    reads one day and one that rescans years.
    """
    rollup_path = _table_dir(warehouse_dir, "agg_daily_events")
    affected = [
        r["d"]
        for r in delta.select(
            F.to_date(F.col("event_time")).alias("d")
        ).distinct().collect()
    ]
    fact = spark.read.parquet(fact_path)
    recomputed = (
        fact.filter(F.col(FACT_PARTITION_COL).isin(affected))
        .groupBy(
            F.col(FACT_PARTITION_COL).alias("period"), F.col("event_name")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("event_value"), 2).alias("total_value"),
        )
    )
    if not os.path.exists(rollup_path):
        _swap_write(recomputed, rollup_path)
        return rollup_path
    target = spark.read.parquet(rollup_path)
    merged = merge_update(target, recomputed, ["period", "event_name"])
    _swap_write(merged, rollup_path)
    return rollup_path


def main(argv: list[str] | None = None) -> None:
    """spark-submit / Airflow entry point:

    ``spark-submit -m etl_..._spark.plans.pipeline <source_dir> <warehouse_dir>``

    The scheduler owns cadence and retries (the reference's Airflow
    DAGs, SURVEY.md §2.4); the engine owns everything else.
    """
    import argparse  # noqa: PLC0415

    from ..session import get_spark  # noqa: PLC0415

    parser = argparse.ArgumentParser(description="daily marketing ETL cycle")
    parser.add_argument("source_dir")
    parser.add_argument("warehouse_dir")
    parser.add_argument("--materialize-views", action="store_true")
    parser.add_argument(
        "--stage",
        choices=list(PIPELINE_STAGES),
        help="run one stage only (one reference DAG's worth); "
        "default runs the full daily cycle",
    )
    args = parser.parse_args(argv)
    spark = get_spark("daily_pipeline")
    if args.stage:
        run_stage(
            spark,
            args.source_dir,
            args.warehouse_dir,
            args.stage,
            args.materialize_views,
        )
        print(f"stage {args.stage}: done")
        return
    counts = run_daily_pipeline(
        spark, args.source_dir, args.warehouse_dir, args.materialize_views
    )
    for name, n in counts.items():
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
