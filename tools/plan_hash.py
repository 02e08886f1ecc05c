"""Canonical physical-plan hashes for every registered query — the
plan-identity detector behind gen_window.py's overflow rule (VERDICT
r12 item 3: a query whose PLAN changed this round must never overflow
out of driver grading, and function-level tracing alone cannot see
session-conf changes like a join-strategy flip).

    python tools/plan_hash.py [sf_dir] [query ...]   # JSON to stdout

Prints one JSON object {query: sha256-hex-of-canonical-plan}. The
canonicalization strips everything that varies run-to-run on an
UNCHANGED tree — expression ids (#123), plan ids, tmp/checkpoint
paths, version nonces, memory sizes — while keeping operator names,
join strategies and build sides, so: unchanged code+conf → unchanged
hash; SortMergeJoin → ShuffledHashJoin → changed hash.

Known blind spot (documented, not silent): queries that RUN eagerly
during plan construction (the streaming smokes) return a scan of
their result table, so their hash reflects that scan, not the gate
internals — those internals are exactly what fanout_map's function
tracer pins instead. The two detectors are complements.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SCRUB = [
    (re.compile(r"#\d+[A-Z]*"), "#_"),
    (re.compile(r"plan_id=\d+"), "plan_id=_"),
    (re.compile(r"\[id=#?\d+\]"), "[id=_]"),
    (re.compile(r"0x[0-9a-f]+"), "0x_"),
    (re.compile(r"[0-9a-f]{12,}"), "_hex_"),
    (re.compile(r"file:[^\s,\]\)]*"), "file:_"),
    (re.compile(r"/tmp/[^\s,\]\)]*"), "/tmp/_"),
    (re.compile(r"data/v\d+-[^\s,/\]\)]*"), "data/v_-_"),
    (re.compile(r"\d+ paths"), "_ paths"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(_)"),
    (re.compile(r"size=\d+(\.\d+)?\s*[KMGT]?i?B"), "size=_"),
]


def canonical(plan: str) -> str:
    for rx, rep in _SCRUB:
        plan = rx.sub(rep, plan)
    return plan


def plan_hashes(sf_dir: str, names: list[str] | None = None) -> dict:
    import __spark_entry__ as entrymod  # noqa: PLC0415
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.session import (  # noqa: PLC0415
        get_spark,
        release_persisted_rdds,
    )

    spark = get_spark("plan_hash")
    out: dict[str, str] = {}
    qs = entrymod.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out[name] = hashlib.sha256(
                canonical(plan).encode()
            ).hexdigest()
        except Exception as exc:  # noqa: BLE001 — record, don't abort
            out[name] = f"__error__:{type(exc).__name__}"
        release_persisted_rdds(spark)
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or None
    print(json.dumps(plan_hashes(sf_dir, names), sort_keys=True))


if __name__ == "__main__":
    main()
