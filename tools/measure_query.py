"""Per-query measurement harness for the optimization rounds (guide §1):
runs named queries (or all) once warm against $SPARK_GRAFT_SF_DIR with the
noop sink, and reports wall seconds, Spark JOB COUNT consumed by the query
(statusTracker delta — the fixed-overhead proxy that dominates at bench
scale and counts passes at any scale), and optionally dumps
``.explain("formatted")`` to a file.

Usage:
    python tools/measure_query.py q1 q2 ...            # time + job count
    python tools/measure_query.py --explain DIR q1 ... # also dump plans
    python tools/measure_query.py --repeat 3 q1 ...    # min of N
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.session import (
    get_spark,
    release_persisted_rdds,
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    repeat = 1
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure")
    qs = entrymod.queries()
    names = args or list(qs)

    # Warm-up: JVM, parquet footers, Python worker pool (bench.py parity).
    force(qs["pricing_summary"](spark, sf_dir))
    import pandas as _pd  # noqa: PLC0415

    force(
        spark.range(64)
        .groupBy((F.col("id") % 8).alias("g"))
        .applyInPandas(lambda pdf: _pd.DataFrame({"n": [len(pdf)]}), "n long")
    )

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        if name not in qs:
            print(f"?? unknown query {name}")
            continue
        samples, jobs = [], None
        for _ in range(repeat):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t0
            force(df)
            wall = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            samples.append(round(wall, 2))
            jobs = j1 - j0
            release_persisted_rdds(spark)
        phase = entrymod.PHASE_TIMINGS.get(name)
        out[name] = {
            "sec": min(samples),
            "samples": samples,
            "build_sec": round(t_build, 2),
            "jobs": jobs,
            "phases": phase,
        }
        print(f"{min(samples):8.2f}s  jobs={jobs:<4} {name}  "
              f"{'phases=' + json.dumps(phase) if phase else ''}")
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            with open(
                os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
    print(json.dumps({"total": round(sum(v["sec"] for v in out.values()), 2)}))


if __name__ == "__main__":
    main()
