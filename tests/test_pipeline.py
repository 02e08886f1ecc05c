"""End-to-end daily pipeline: bootstrap, idempotence, incremental
upsert, and the warehouse SQL view layer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import pipeline
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    counts = pipeline.run_daily_pipeline(spark, SF, wh)
    return wh, counts


def test_bootstrap_counts(spark, warehouse):
    _, counts = warehouse
    n_events = load_table(spark, SF, "events").count()
    assert counts["event_raw"] == n_events
    assert counts["f_events"] == n_events
    assert counts["d_item"] == load_table(spark, SF, "part").count()
    assert counts["d_parameter"] == 5


def test_rerun_is_idempotent(spark, warehouse):
    wh, first = warehouse
    before = spark.read.parquet(f"{wh}/f_events")
    before_rows = sorted(map(tuple, before.collect()))
    second = pipeline.run_daily_pipeline(spark, SF, wh)
    assert second == first
    after_rows = sorted(
        map(tuple, spark.read.parquet(f"{wh}/f_events").collect())
    )
    assert after_rows == before_rows


def test_incremental_day2_upserts(spark, warehouse, tmp_path):
    wh, first = warehouse
    # Day-2 source: one brand-new event and one changed existing event
    # (same composite key, new value) — plus the unchanged item table.
    events = load_table(spark, SF, "events")
    changed = (
        events.orderBy("event_id")
        .limit(1)
        .withColumn("value", F.col("value") + 1000.0)
    )
    max_id = events.agg(F.max("event_id")).first()[0]
    new = changed.withColumn("event_id", F.lit(max_id + 1))
    day2 = str(tmp_path / "day2")
    import os, shutil

    os.makedirs(day2)
    changed.unionByName(new).write.parquet(f"{day2}/events.parquet")
    shutil.copy(f"{SF}/part.parquet", f"{day2}/part.parquet")

    counts = pipeline.run_daily_pipeline(spark, day2, wh)
    assert counts["f_events"] == first["f_events"] + 1
    assert counts["d_event"] == first["d_event"] + 1
    # The changed event's value was SCD-1-updated in place.
    fact = spark.read.parquet(f"{wh}/f_events")
    changed_row = changed.first()
    got = fact.filter(F.col("event_id") == changed_row["event_id"]).first()
    assert got["event_value"] == pytest.approx(changed_row["value"])
    # Surrogate keys stay unique across daily loads (the reference
    # would have re-numbered day-2 inserts from 1): new rows continue
    # after the warehouse max, existing rows keep their guid.
    n_fact = fact.count()
    assert fact.select("guid_event").distinct().count() == n_fact
    assert (
        fact.agg(F.max("guid_event")).first()[0] == first["f_events"] + 1
    )
    dim = spark.read.parquet(f"{wh}/d_event")
    assert dim.select("guid_event").distinct().count() == dim.count()


def test_warehouse_sql_views(spark, warehouse):
    # Views were registered against the warehouse tables by the last
    # pipeline run in this module; they must parse, execute, and agree
    # with the fact table.
    top = spark.table("top_event_type_by_period")
    assert top.count() > 0
    vc = spark.table("view_count_by_period")
    total_views = vc.agg(F.sum("item_view")).first()[0]
    fact = spark.table("f_events").filter(F.col("event_name") == "view")
    dim = spark.table("d_item")
    joined = fact.join(dim, fact.event_parameter_value == dim.item_id).count()
    assert total_views == joined


def test_bi_export_contract(spark, warehouse):
    """S9 (reference README.md:73-77): the pipeline's final step drops
    every KPI view as a headered CSV + manifest.json — the flat-file
    contract a Power-BI-equivalent client ingests without Spark."""
    import json
    import os

    wh, _ = warehouse
    export_dir = os.path.join(wh, "bi_export")
    with open(os.path.join(export_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["contract"] == "bi_export/v1"
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        marketing,
    )

    assert set(manifest["views"]) == set(marketing.WAREHOUSE_KPI_SQL)
    assert len(manifest["views"]) == 6
    for view_name, meta in manifest["views"].items():
        view_dir = os.path.join(export_dir, meta["path"])
        csvs = [p for p in os.listdir(view_dir) if p.endswith(".csv")]
        assert len(csvs) == 1, view_name  # single-file hand-off
        # round-trip: the CSV holds exactly the view's rows, and the
        # manifest schema names the live view's columns in order
        live = spark.table(view_name)
        assert meta["rows"] == live.count()
        back = (
            spark.read.option("header", True).csv(os.path.join(view_dir, csvs[0]))
        )
        assert back.count() == meta["rows"]
        assert [c["name"] for c in meta["columns"]] == live.columns
        assert back.columns == live.columns


def test_catalog_publish_registers_declared_schemas(spark, warehouse):
    # S5: the pipeline's final step registers every warehouse table in
    # the session catalog under its DECLARED schema (reference
    # CREATE OR REPLACE TABLE semantics) — addressable by name, schema
    # answered by the catalog, validated against the files.
    wh, _ = warehouse
    for name in pipeline.WAREHOUSE_TABLES:
        assert spark.catalog.tableExists(f"wh_{name}")
        from pyspark.sql.types import StructType

        declared = StructType.fromDDL(pipeline.WAREHOUSE_SCHEMAS[name])
        assert spark.table(f"wh_{name}").schema == declared
    # Catalog reads agree with path reads (external location, no copy).
    assert (
        spark.table("wh_f_events").count()
        == spark.read.parquet(f"{wh}/f_events").count()
    )
    # Drift detection: a declaration mismatch must fail loudly.
    import pytest as _pytest

    orig = pipeline.WAREHOUSE_SCHEMAS["d_event"]
    pipeline.WAREHOUSE_SCHEMAS["d_event"] = "event_id BIGINT"
    try:
        with _pytest.raises(ValueError, match="schema drift"):
            pipeline.publish_catalog(spark, wh, tables=("d_event",))
    finally:
        pipeline.WAREHOUSE_SCHEMAS["d_event"] = orig


def test_partitioned_fact_merge_and_rollup(spark, tmp_path):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        marketing,
    )

    wh = str(tmp_path / "wh_part")
    fresh = marketing.build_f_events(spark, SF)
    path = pipeline.merge_fact_partitioned(spark, wh, fresh)
    import os

    # Physically partitioned by date.
    assert any(
        d.startswith("event_date=") for d in os.listdir(path)
    )
    n1 = spark.read.parquet(path).count()
    assert n1 == fresh.count()

    # Day 2: one changed row (same keys, new value) and one new row.
    changed = fresh.orderBy("event_id").limit(1).withColumn(
        "event_value", F.col("event_value") + 500.0
    )
    max_id = fresh.agg(F.max("event_id")).first()[0]
    new = changed.withColumn("event_id", F.lit(max_id + 1))
    delta = changed.unionByName(new)
    before_dirs = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("event_date=")
    }
    pipeline.merge_fact_partitioned(spark, wh, delta)
    after_dirs = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("event_date=")
    }
    fact = spark.read.parquet(path)
    assert fact.count() == n1 + 1
    # Only the touched date partitions were rewritten.
    affected = {
        f"event_date={r[0]}"
        for r in delta.select(
            F.to_date("event_time").cast("string")
        ).distinct().collect()
    }
    untouched = set(before_dirs) - affected
    assert untouched and all(
        before_dirs[d] == after_dirs[d] for d in untouched
    )
    # Surrogate keys stay unique.
    assert fact.select("guid_event").distinct().count() == fact.count()

    # Continuous aggregate equals a full recompute of the fact.
    rollup_path = pipeline.update_daily_rollup(spark, wh, path, fresh)
    pipeline.update_daily_rollup(spark, wh, path, delta)
    rollup = spark.read.parquet(rollup_path)
    full = (
        fact.groupBy(
            F.col("event_date").alias("period"), F.col("event_name")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("event_value"), 2).alias("total_value"),
        )
    )
    got = {tuple(r) for r in rollup.collect()}
    expect = {tuple(r) for r in full.collect()}
    assert got == expect


def test_stagewise_run_matches_full_pipeline(spark, tmp_path):
    # Running each stage as its own invocation (the scheduler-task
    # shape) must produce the same warehouse as the one-shot pipeline.
    # Fresh full run (the module fixture's warehouse has day-2 data
    # merged in by other tests).
    wh_full = str(tmp_path / "full")
    pipeline.run_daily_pipeline(spark, SF, wh_full)
    wh = str(tmp_path / "stagewise")
    for stage in pipeline.PIPELINE_STAGES:
        pipeline.run_stage(spark, SF, wh, stage)
    for name in pipeline.WAREHOUSE_TABLES:
        got = sorted(map(tuple, spark.read.parquet(f"{wh}/{name}").collect()))
        want = sorted(
            map(tuple, spark.read.parquet(f"{wh_full}/{name}").collect())
        )
        assert got == want, name


def test_run_stage_rejects_unknown(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown stage"):
        pipeline.run_stage(spark, SF, str(tmp_path), "nope")


def test_orchestration_surface():
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark import (
        orchestration,
    )

    # Stage order mirrors the reference's DAG chain.
    assert orchestration.STAGES == (
        "raw_ingest", "d_event", "d_item", "d_parameter", "d_user",
        "f_events", "aggregated_views",
    )
    cmd = orchestration.stage_command(
        "f_events", "/src dir", "/wh", python="python3"
    )
    assert "--stage f_events" in cmd
    assert "'/src dir'" in cmd  # shell-quoted
    mat = orchestration.stage_command(
        "aggregated_views", "/src", "/wh", materialize_views=True
    )
    assert "--materialize-views" in mat
    assert "--materialize-views" not in orchestration.stage_command(
        "raw_ingest", "/src", "/wh", materialize_views=True
    )
    with pytest.raises(ValueError):
        orchestration.stage_command("nope", "/src", "/wh")
    # Without airflow installed, build_dag fails loudly and helpfully.
    try:
        import airflow  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="apache-airflow"):
            orchestration.build_dag("/src", "/wh")


def test_dag_factory_structure_under_airflow(tmp_path):
    """Scheduler-side validation of the DAG factory (VERDICT r05 item
    6, reference anchor `etl_s3_snowflake_raw_event_ingest.py:36-41,
    57-62`): a DagBag import of a dags-folder two-liner must yield one
    import-error-free DAG with the seven pipeline stages in a linear
    dependency chain. Skips where apache-airflow is not installed
    (this sandbox — documented in README §Orchestration); runs
    everywhere a real scheduler environment exists."""
    pytest.importorskip("airflow")
    from airflow.models.dagbag import DagBag

    dag_file = tmp_path / "marketing_dag.py"
    dag_file.write_text(
        "from etl_s3_airflow_snowflake_powerbi_marketing_data_spark."
        "orchestration import build_dag\n"
        "dag = build_dag('/data/source', '/data/warehouse')\n"
    )
    bag = DagBag(dag_folder=str(tmp_path), include_examples=False)
    assert not bag.import_errors, bag.import_errors

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark import (
        orchestration,
    )

    dag = bag.get_dag(orchestration.DAG_ID)
    assert dag is not None
    assert [t.task_id for t in dag.topological_sort()] == list(
        orchestration.STAGES
    )
    # strict linear chain: stage N+1 depends on stage N only
    for up, down in zip(orchestration.STAGES, orchestration.STAGES[1:]):
        assert dag.get_task(down).upstream_task_ids == {up}
    assert dag.get_task(orchestration.STAGES[0]).upstream_task_ids == set()


def test_versioned_warehouse_two_days_time_travel(spark, tmp_path):
    """The daily pipeline on the transactional layer: each cycle
    commits one atomic version per warehouse table, so day-1 state
    stays time-travelable after day-2's merge, re-runs stay idempotent
    in CONTENT (they add auditable versions), and the published
    catalog tracks the latest snapshot."""
    import os
    import shutil

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.sources import (
        versioned as vt,
    )

    wh = str(tmp_path / "vwh")
    day1 = pipeline.run_daily_pipeline(spark, SF, wh, versioned=True)
    fact_path = f"{wh}/f_events"
    v_day1 = vt.table_versions(fact_path)[-1]

    # day-2 source: one new event
    events = load_table(spark, SF, "events")
    max_id = events.agg(F.max("event_id")).first()[0]
    new = events.orderBy("event_id").limit(1).withColumn(
        "event_id", F.lit(max_id + 1).cast("long")
    )
    day2 = str(tmp_path / "day2src")
    os.makedirs(day2)
    new.write.parquet(f"{day2}/events.parquet")
    shutil.copy(f"{SF}/part.parquet", f"{day2}/part.parquet")

    day2_counts = pipeline.run_daily_pipeline(spark, day2, wh, versioned=True)
    assert day2_counts["f_events"] == day1["f_events"] + 1

    # time travel: day-1 fact snapshot is intact under day-2's commit
    assert vt.read_version(spark, fact_path, v_day1).count() == day1["f_events"]
    assert vt.read_version(spark, fact_path).count() == day1["f_events"] + 1

    # catalog tracks the latest snapshot
    assert (
        spark.table("wh_f_events").count() == day1["f_events"] + 1
    )

    # no staging-swap leftovers; every table is a versioned table
    assert not os.path.exists(fact_path + "__staging")
    assert vt.table_versions(f"{wh}/d_item")


def test_publish_catalog_analyze_records_cbo_stats(spark, warehouse):
    wh, _ = warehouse
    pipeline.publish_catalog(spark, wh, analyze=True)
    desc = spark.sql("DESCRIBE TABLE EXTENDED wh_f_events").collect()
    stats = [r for r in desc if r["col_name"] == "Statistics"]
    assert stats and "rows" in stats[0]["data_type"]
