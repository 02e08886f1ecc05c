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
