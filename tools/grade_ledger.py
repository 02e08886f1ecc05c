"""Grade ledger: one committed artifact answering "when was each
registered query last driver-graded, and did it pass?" (VERDICT r09
item 6 — the invariant "every name green at least once, never
regressed" used to require walking every CORRECTNESS_r*.json by hand).

Usage:
    python tools/grade_ledger.py            # rebuild GRADE_LEDGER.json
    python tools/grade_ledger.py --canaries 11
        # print the stalest query per implementation module (from
        # FANOUT_MAP.json), staleness-ordered, capped at N — the
        # mechanical canary rotation for the next _R{N}_FRONT_50.

Ledger entry per registered query:
    last_graded_round  -- newest round whose CORRECTNESS window held it
                          (null = never driver-graded; covered only by
                          the check_oracles vanilla gate)
    last_result        -- pass/fail at that grading
    rounds_graded      -- every round that graded it
    ever_failed        -- true if ANY grading failed (r01 teething
                          failures land here; informational)
    regressed          -- true if a FAIL came after a pass — the
                          invariant breach the judge checks for

A grading "passes" when rows/schema/hash all match (hash_match may be
absent for rows-only checks — then rows+schema suffice, recorded as
check="rows_only").
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _passed(entry: dict) -> bool:
    if entry.get("err"):
        return False
    checks = [
        entry.get(k)
        for k in ("rows_match", "schema_match", "hash_match")
        if k in entry and entry.get(k) is not None
    ]
    return bool(checks) and all(checks)


def build_ledger() -> dict:
    gradings: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, entry in data.items():
            gradings.setdefault(name, []).append((rnd, _passed(entry)))

    import __spark_entry__ as entrymod  # noqa: PLC0415

    registered = list(entrymod.queries())

    def entry_for(hist: list[tuple[int, bool]]) -> dict:
        seen_pass = False
        regressed = False
        for _, ok in hist:
            if ok:
                seen_pass = True
            elif seen_pass:
                regressed = True
        return {
            "last_graded_round": hist[-1][0] if hist else None,
            "last_result": (
                ("pass" if hist[-1][1] else "FAIL") if hist else None
            ),
            "rounds_graded": [r for r, _ in hist],
            "ever_failed": any(not ok for _, ok in hist),
            "regressed": regressed,
        }

    ledger = {
        name: entry_for(sorted(gradings.get(name, [])))
        for name in registered
    }
    # graded names that are no longer registered (renames/removals)
    for name in sorted(set(gradings) - set(registered)):
        ledger[name] = {
            **entry_for(sorted(gradings[name])),
            "unregistered": True,
        }
    return ledger


def stalest_canaries(ledger: dict, k: int) -> list[tuple[str, str, int]]:
    """One query per implementation module (FANOUT_MAP.json), the
    stalest first — never-graded names sort stalest of all. Returns
    (query, module, last_graded_round) rows, at most ``k``."""
    with open(os.path.join(REPO, "FANOUT_MAP.json")) as fh:
        fanout = json.load(fh)

    def module_of(name: str) -> str:
        """Dominant implementation module: the module contributing the
        most executed functions to the query (shared plumbing —
        tables/session — excluded); alphabetical tie-break keeps the
        attribution deterministic."""
        counts: dict[str, int] = {}
        for fn in fanout.get(name, []):
            mod = fn.split(":")[0]
            if os.path.basename(mod) in ("tables.py", "session.py"):
                continue
            counts[mod] = counts.get(mod, 0) + 1
        if not counts:
            return "__spark_entry__.py"
        return max(sorted(counts), key=lambda m: counts[m])

    by_module: dict[str, tuple[int, str]] = {}
    for name, entry in ledger.items():
        if entry.get("unregistered"):
            continue
        last = entry["last_graded_round"]
        staleness = -1 if last is None else last
        mod = module_of(name)
        cur = by_module.get(mod)
        if cur is None or (staleness, name) < cur:
            by_module[mod] = (staleness, name)
    picks = sorted(
        (staleness, name, mod)
        for mod, (staleness, name) in by_module.items()
    )
    return [(name, mod, (None if s < 0 else s)) for s, name, mod in picks[:k]]


def main() -> None:
    ledger = build_ledger()
    out_path = os.path.join(REPO, "GRADE_LEDGER.json")
    with open(out_path, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
    n_graded = sum(
        1 for e in ledger.values() if e["last_graded_round"] is not None
    )
    regressed = [n for n, e in ledger.items() if e["regressed"]]
    print(
        f"{out_path}: {len(ledger)} queries, {n_graded} driver-graded, "
        f"regressed={regressed or 'none'}"
    )
    if "--canaries" in sys.argv:
        k = int(sys.argv[sys.argv.index("--canaries") + 1])
        for name, mod, last in stalest_canaries(ledger, k):
            print(f"canary {name}  [{mod}]  last_graded={last}")


if __name__ == "__main__":
    main()
