"""Airflow DAG factory — the reference's daily chain as one task graph.

The reference runs seven separate ``@daily`` DAGs that self-chain with
fire-and-forget ``TriggerDagRunOperator`` hops
(`astro-sdk-tutorial/dags/etl_s3_snowflake_raw_event_ingest.py:57-62`
through `etl_s3_snowflake_f_events.py:98-104`; SURVEY.md §2.4 O1-O3).
That split exists because every hop materializes into Snowflake and each
DAG owns one table. Here the engine is Spark, so the idiomatic shape is
ONE DAG whose tasks are the same seven stages with real upstream
dependencies — the scheduler sees the whole chain, retries a single
stage without replaying the day, and ``catchup=False``/``@daily``
match the reference's cadence (`etl_s3_snowflake_raw_event_ingest.py:36-41`).

Import-gated: this module imports cleanly without Airflow installed
(stage names and command rendering are plain functions, unit-testable
anywhere); only :func:`build_dag` requires ``apache-airflow``. Drop a
two-liner into the scheduler's dags folder::

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.orchestration import build_dag
    dag = build_dag("s3a://bucket/source", "s3a://bucket/warehouse")
"""

from __future__ import annotations

import shlex

from .plans.pipeline import PIPELINE_STAGES

DAG_ID = "marketing_daily_etl"

#: Stage ids in dependency order — exactly the reference's chain.
STAGES: tuple[str, ...] = tuple(PIPELINE_STAGES)


def stage_command(
    stage: str,
    source_dir: str,
    warehouse_dir: str,
    materialize_views: bool = False,
    python: str = "python",
) -> str:
    """Shell command running ONE pipeline stage as its own process.

    Each task is an independent driver process (``python -m … --stage``,
    which works identically under ``spark-submit``), so a failed stage
    retries alone and executors are only held while a stage runs —
    the per-task isolation the reference got from seven DAGs.
    """
    if stage not in PIPELINE_STAGES:
        raise ValueError(
            f"unknown stage {stage!r}; choose from {list(PIPELINE_STAGES)}"
        )
    parts = [
        python,
        "-m",
        "etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans.pipeline",
        source_dir,
        warehouse_dir,
        "--stage",
        stage,
    ]
    if materialize_views and stage == "aggregated_views":
        parts.append("--materialize-views")
    return " ".join(shlex.quote(p) for p in parts)


def build_dag(
    source_dir: str,
    warehouse_dir: str,
    schedule: str = "@daily",
    materialize_views: bool = False,
    python: str = "python",
):
    """Build the Airflow DAG (requires ``apache-airflow`` at call time)."""
    try:  # pragma: no cover - exercised only where airflow is installed
        from airflow import DAG  # noqa: PLC0415
        from airflow.operators.bash import BashOperator  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "apache-airflow is not installed; build_dag must run inside "
            "the scheduler environment. The engine itself never needs it."
        ) from exc

    with DAG(
        dag_id=DAG_ID,
        schedule=schedule,
        catchup=False,
        tags=["marketing", "spark"],
    ) as dag:  # pragma: no cover
        prev = None
        for stage in STAGES:
            task = BashOperator(
                task_id=stage,
                bash_command=stage_command(
                    stage,
                    source_dir,
                    warehouse_dir,
                    materialize_views=materialize_views,
                    python=python,
                ),
                retries=2,
            )
            if prev is not None:
                prev >> task
            prev = task
    return dag
