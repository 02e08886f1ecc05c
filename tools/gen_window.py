"""Mechanical grading-window generation (VERDICT r11 item 2).

Round 11 broke the window rule by HAND: ``fanout_map.py
--changed-since`` computed 18 diff-affected queries but the
hand-transcribed ``_FRONT_50`` carried only 17 of them
(``media_mp4_duration`` slipped). This tool removes the transcription
step: the committed window is GENERATED from the fanout tool's output
and the canary picker, and a pytest (tests/test_reference_shape.py)
re-derives the affected set at test time and asserts affected ⊆
window — so a slip fails the suite instead of surfacing in a verdict.

    python tools/gen_window.py --changed-since <round-start-rev> \
        [--round N] [--extra q1,q2] [--write]

Window assembly, in order:

1. AFFECTED — every query whose traced function set (FANOUT_MAP.json)
   intersects the diff's changed functions, PLUS every registered
   query missing from FANOUT_MAP entirely (new this round; the map
   predates it). This is the half the r11 slip lost.
2. EXTRA — hand-ATTRIBUTED (not hand-assembled) query keys for edits
   below the tool's granularity: oracle-SQL string bodies inside
   ``oracle_sql()``. The tool still warns when that function changed.
3. CANARIES — fill to 50 with ``grade_ledger.stalest_canaries`` (the
   stalest query per dominant implementation module), then — if the
   module list runs short — the stalest remaining ledger entries.

``--write`` rewrites the ``_FRONT_50`` block of ``__spark_entry__.py``
between the BEGIN/END GENERATED WINDOW markers and writes
``WINDOW_r{N}.json`` (the audit artifact the pytest checks against).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import fanout_map  # noqa: E402
import grade_ledger  # noqa: E402

ENTRY = os.path.join(REPO, "__spark_entry__.py")
BEGIN = "# --- BEGIN GENERATED WINDOW"
END = "# --- END GENERATED WINDOW"
WINDOW_SIZE = 50


def infer_round() -> int:
    rounds = [
        int(re.search(r"BENCH_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


def registered_queries() -> list[str]:
    import __spark_entry__ as entrymod  # noqa: PLC0415

    return list(entrymod.queries())


def plan_changed_queries(rev: str, sf_dir: str) -> set[str]:
    """Queries whose CANONICAL physical-plan hash differs between the
    round base rev and the current tree (tools/plan_hash.py) — the
    detector for changes function-level tracing cannot see (session
    conf flips like a join-strategy preference). Builds the base rev
    in a throwaway git worktree; a query present only in the current
    tree counts as changed."""
    import subprocess  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    def run_tree(cwd: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.join("tools", "plan_hash.py"), sf_dir],
            cwd=cwd,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    now = run_tree(REPO)
    wt = tempfile.mkdtemp(prefix="gen_window_base_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        base = run_tree(wt)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=True, capture_output=True,
        )
    return {q for q, h in now.items() if base.get(q) != h}


def compute_window(
    rev: str, extra: list[str], plan_changed: set[str] | None = None
) -> dict:
    with open(fanout_map.MAP_PATH) as fh:
        fan = json.load(fh)
    funcs = fanout_map.changed_functions(rev)
    registered = registered_queries()
    new_since_map = {q for q in registered if q not in fan}
    traced_hits = {
        q: sorted(set(used) & funcs)
        for q, used in fan.items()
        if any(f in funcs for f in used)
    }
    plan_changed = set(plan_changed or ())
    affected = sorted(
        set(traced_hits) | new_since_map | plan_changed
    )
    oracle_sql_changed = any(f.endswith(":oracle_sql") for f in funcs)
    unknown = [q for q in extra if q not in registered]
    if unknown:
        raise SystemExit(f"--extra names not registered: {unknown}")
    core = affected + [q for q in extra if q not in affected]
    ledger = grade_ledger.build_ledger()
    overflow: list[str] = []
    if len(core) > WINDOW_SIZE:
        # An optimization round's diff can touch more than 50 queries
        # by construction. Overflow rule (VERDICT r12 item 3 — the r12
        # stalest-kept rule could rotate heavily-changed queries OUT of
        # driver grading): overflow only the LEAST diff-relevant
        # affected queries, and NEVER one whose change was specific to
        # it. Ineligible to overflow: --extra names (hand-attributed),
        # queries NEW since the fanout map, queries whose canonical
        # plan hash changed this round (plan_changed), and queries hit
        # by a NARROW change (a changed function fanning out to few
        # queries — that change targeted them). Eligible queries rank
        # by how widely shared their most-specific matched helper is
        # (largest min-breadth first: affected only via corpus-wide
        # helpers), then by freshest driver grade, then name. Every
        # overflow name is still graded by the full sf0.01 + vanilla
        # check_oracles gates and documented in the round notes;
        # tests/test_reference_shape.py asserts the invariants.
        n_over = len(core) - WINDOW_SIZE
        breadth = {
            f: sum(1 for used in fan.values() if f in used)
            for f in funcs
        }
        min_breadth = {
            q: min(breadth[f] for f in hits)
            for q, hits in traced_hits.items()
        }
        narrow_cut = max(10, len(registered) // 10)
        eligible = [
            q
            for q in traced_hits
            if q not in extra
            and q not in plan_changed
            and q not in new_since_map
            and min_breadth[q] >= narrow_cut
        ]
        if len(eligible) < n_over:
            raise SystemExit(
                f"window overflow needs {n_over} low-relevance queries "
                f"but only {len(eligible)} are eligible (affected only "
                "via widely-shared helpers, plan unchanged) — the diff "
                "is too broad for one graded window; split the round "
                "or shrink the change set"
            )
        eligible.sort(
            key=lambda q: (
                -min_breadth[q],
                -(ledger.get(q, {}).get("last_graded_round") or -1),
                q,
            )
        )
        overflow = sorted(eligible[:n_over])
        core = [q for q in core if q not in overflow]
    if len(core) > WINDOW_SIZE:
        # ADVICE r12: --extra alone (plus ineligible affected) can
        # exceed capacity; fail with guidance instead of a bare
        # assert below.
        raise SystemExit(
            f"{len(core)} must-grade queries exceed the {WINDOW_SIZE}-"
            "slot window even after overflow — split the round"
        )
    canaries = []
    for name, _mod, _last in grade_ledger.stalest_canaries(
        ledger, len(ledger)
    ):
        if len(core) + len(canaries) >= WINDOW_SIZE:
            break
        if name not in core:
            canaries.append(name)
    if len(core) + len(canaries) < WINDOW_SIZE:
        # fewer modules than open slots: fall back to stalest overall
        stalest = sorted(
            (
                (-1 if e["last_graded_round"] is None
                 else e["last_graded_round"], n)
                for n, e in ledger.items()
                if not e.get("unregistered")
            )
        )
        for _s, name in stalest:
            if len(core) + len(canaries) >= WINDOW_SIZE:
                break
            if name not in core and name not in canaries:
                canaries.append(name)
    window = core + canaries
    assert len(window) == min(WINDOW_SIZE, len(registered))
    assert not set(window) & set(overflow)
    return {
        "rev": rev,
        "affected": affected,
        "extra": extra,
        "canaries": canaries,
        "overflow": overflow,
        "plan_changed": sorted(plan_changed),
        "overflow_rule": (
            "widest-shared-helper-only; plan-changed / new / narrow-hit "
            "/ extra queries never overflow (VERDICT r12 item 3)"
        ),
        "oracle_sql_changed": oracle_sql_changed,
        "window": window,
    }


def write_entry_block(window: dict, rnd: int) -> None:
    with open(ENTRY) as fh:
        src = fh.read()
    b = src.index(BEGIN)
    e = src.index(END)
    e = src.index("\n", e) + 1
    names = "".join(f'    "{q}",\n' for q in window["window"])
    over = window.get("overflow", [])
    over_note = (
        f" {len(over)} affected queries OVERFLOW the window (lowest "
        f"diff-relevance:\n# affected only via widely-shared helpers, "
        f"plans unchanged — see\n# WINDOW_r{rnd:02d}.json 'overflow'); "
        f"they are graded via check_oracles on a\n# vanilla session "
        f"and documented in the round notes.\n"
        if over
        else "\n"
    )
    block = (
        f"{BEGIN} (tools/gen_window.py — do not hand-edit) ---\n"
        f"# round {rnd}, diff base {window['rev']}: "
        f"{len(window['affected'])} diff-affected "
        f"(fanout_map --changed-since, plus registry entries newer\n"
        f"# than FANOUT_MAP), {len(window['extra'])} hand-attributed "
        f"oracle-SQL edits, {len(window['canaries'])} mechanical\n"
        f"# canaries (grade_ledger — stalest per dominant module). "
        f"Audit artifact: WINDOW_r{rnd:02d}.json;\n"
        f"# tests/test_reference_shape.py re-derives affected ⊆ window "
        f"∪ overflow from the live git diff.{over_note}"
        f"_FRONT_50 = [\n{names}]\n"
        f"{END} ---\n"
    )
    with open(ENTRY, "w") as fh:
        fh.write(src[:b] + block + src[e:])


def main() -> None:
    if "--changed-since" not in sys.argv:
        raise SystemExit(__doc__)
    rev = sys.argv[sys.argv.index("--changed-since") + 1]
    rnd = (
        int(sys.argv[sys.argv.index("--round") + 1])
        if "--round" in sys.argv
        else infer_round()
    )
    extra = (
        sys.argv[sys.argv.index("--extra") + 1].split(",")
        if "--extra" in sys.argv
        else []
    )
    # Plan-identity diff (default ON; --no-plan-diff to skip): catches
    # session-conf changes (join-strategy flips) the function tracer
    # cannot attribute. Runs two plan builds (current tree + a base-rev
    # worktree) at sf0.001 — minutes, once per round close.
    plan_changed: set[str] = set()
    if "--no-plan-diff" not in sys.argv:
        plan_changed = plan_changed_queries(
            rev, os.environ.get("GEN_WINDOW_SF_DIR", "/root/testdata/sf0.001")
        )
    window = compute_window(rev, [e for e in extra if e], plan_changed)
    window["round"] = rnd
    if window["oracle_sql_changed"] and not window["extra"]:
        print(
            "WARNING: oracle_sql() changed but no --extra given — "
            "hand-ATTRIBUTE any edited SQL blocks whose queries are "
            "not already in the affected set.",
            file=sys.stderr,
        )
    print(json.dumps(window, indent=1))
    if "--write" in sys.argv:
        out = os.path.join(REPO, f"WINDOW_r{rnd:02d}.json")
        with open(out, "w") as fh:
            json.dump(window, fh, indent=1)
        write_entry_block(window, rnd)
        print(f"wrote {out} and rewrote the _FRONT_50 block", file=sys.stderr)


if __name__ == "__main__":
    main()
