"""Mechanical helper→query fan-out tracking (VERDICT r08 item 1).

Round 8 showed that hand-tracked "implementations changed this round"
lists under-count: a shared helper (CC path compression, the streaming
state-partition pin) fans out to queries nobody wrote down. This tool
derives the map mechanically:

1. ``python tools/fanout_map.py`` — builds every registered query at
   sf0.001 under a ``sys.settrace`` call tracer and records which
   package functions (``relpath:qualname``) execute during plan
   construction, writing ``FANOUT_MAP.json`` (query → sorted function
   list). Builders that run eagerly (streaming smokes, versioned
   round-trips) simply execute — their helpers are captured the same
   way. Pandas-UDF BODIES run in worker processes and are not traced,
   but their enclosing factory functions are, which pins the same
   source files at function granularity.

2. ``python tools/fanout_map.py --changed-since <rev>`` — parses
   ``git diff <rev> -- '*.py'`` hunk headers, maps changed lines to
   function spans via ``ast`` over the CURRENT tree, intersects with
   FANOUT_MAP.json, and prints every query whose traced function set
   includes a changed function. These queries must lead the next
   ``_R{N}_FRONT_50`` window.

Known limits (documented, not silent): functions DELETED by the diff
have no span in the current tree (their callers' spans usually change
too, which catches the fan-out in practice); edits inside
``oracle_sql()``'s SQL-string body attribute to the whole function —
the tool prints an explicit warning to hand-attribute oracle edits to
their query keys.
"""

from __future__ import annotations

import ast
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAP_PATH = os.path.join(REPO, "FANOUT_MAP.json")
PKG = "etl_s3_airflow_snowflake_powerbi_marketing_data_spark"


def _traced_roots() -> tuple[str, ...]:
    return (
        os.path.join(REPO, PKG) + os.sep,
        os.path.join(REPO, "__spark_entry__.py"),
    )


def build_map(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, list[str]]:
    import __spark_entry__ as entrymod  # noqa: PLC0415
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.session import (  # noqa: PLC0415
        get_spark,
        release_persisted_rdds,
    )

    spark = get_spark("fanout_map")
    roots = _traced_roots()
    out: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        hits: set[str] = set()

        def tracer(frame, event, arg):
            if event == "call":
                f = frame.f_code.co_filename
                if f.startswith(roots[0]) or f == roots[1]:
                    hits.add(
                        os.path.relpath(f, REPO)
                        + ":"
                        + frame.f_code.co_qualname
                    )
            return None

        sys.settrace(tracer)
        try:
            fn(spark, sf_dir)
        except Exception as exc:  # record, don't abort the sweep
            hits.add(f"__error__:{type(exc).__name__}")
        finally:
            sys.settrace(None)
        release_persisted_rdds(spark)
        out[name] = sorted(hits)
        print(f"{name}: {len(hits)} functions", file=sys.stderr)
    return out


def _function_spans(path: str) -> list[tuple[int, int, str]]:
    """(lineno, end_lineno, qualname) for every def in the file."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    spans: list[tuple[int, int, str]] = []

    def walk(node, prefix: str) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef)
            ):
                q = f"{prefix}{child.name}"
                spans.append((child.lineno, child.end_lineno or child.lineno, q))
                walk(child, q + ".<locals>.")
            elif isinstance(child, ast.ClassDef):
                walk(child, f"{prefix}{child.name}.")
            else:
                walk(child, prefix)

    walk(tree, "")
    return spans


def changed_functions(rev: str) -> set[str]:
    diff = subprocess.run(
        ["git", "diff", "--unified=0", rev, "--", "*.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    changed: dict[str, set[int]] = {}
    current: str | None = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            current = line[6:]
        elif line.startswith("@@") and current:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", line)
            if m:
                start = int(m.group(1))
                count = int(m.group(2) or "1")
                # count==0 (pure deletion): attribute to the adjacent line
                lines = range(start, start + max(count, 1))
                changed.setdefault(current, set()).update(lines)
    funcs: set[str] = set()
    for rel, lines in changed.items():
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            continue  # deleted file: callers' diffs carry the fan-out
        for lo, hi, q in _function_spans(path):
            if any(lo <= ln <= hi for ln in lines):
                funcs.add(f"{rel}:{q}")
    return funcs


def main() -> None:
    if "--changed-since" in sys.argv:
        rev = sys.argv[sys.argv.index("--changed-since") + 1]
        with open(MAP_PATH) as fh:
            fan = json.load(fh)
        funcs = changed_functions(rev)
        affected = {
            q
            for q, used in fan.items()
            if any(f in funcs for f in used)
        }
        if any(f.endswith(":oracle_sql") for f in funcs):
            print(
                "WARNING: oracle_sql() changed — hand-attribute the edited"
                " SQL blocks to their query keys (string edits inside one"
                " function are below this tool's granularity).",
                file=sys.stderr,
            )
        print(json.dumps({"changed_functions": sorted(funcs),
                          "affected_queries": sorted(affected)}, indent=1))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    fan = build_map(sf_dir)
    with open(MAP_PATH, "w") as fh:
        json.dump(fan, fh, indent=0, sort_keys=True)
    print(f"{len(fan)} queries -> {MAP_PATH}")


if __name__ == "__main__":
    main()
