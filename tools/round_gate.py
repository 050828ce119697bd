#!/usr/bin/env python
"""Round-end gate: refuse a round snapshot while the suite is red.

VERDICT r9 "What's wrong" #2: round 9 committed its end-of-round
snapshot with ``tests/test_plans.py::test_fuzzy_match_caps_blocks_
before_join`` failing — the operator rewrite shipped without updating
its plan guard, and nothing in the process refused the red suite.
This gate is that refusal. Run it BEFORE declaring a round done:

    python tools/round_gate.py             # pytest + FULL-catalog preflight
    python tools/round_gate.py --fast      # pytest only
    RS_SL_PREFLIGHT_N=50 python tools/round_gate.py    # rotation prefix only

The preflight default is the WHOLE catalog (VERDICT r10 item 2): with a
306-query catalog and a 50-query driver rotation, "green within the
last 7 rounds" is not "green now" — the ~6 min full sweep is the price
of the stronger claim at every snapshot.

A bench-regression stage (VERDICT r10 item 7) diffs BENCH_FULL.json
against the copy committed at the previous round boundary and lists
every query whose time grew >1.5x (and >0.3s absolute — sub-second
entries flap with VM noise). It WARNS rather than fails — a slower
query can be a justified trade — but the listing forces the triage
that r10 skipped when dedup_semantic shipped 2.4x slower unannotated.

Exit status is 0 only when every stage passes; the last line is a
single machine-readable verdict so the snapshot script (or a human in
a hurry) cannot misread partial output as green.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TOOLS_DIR)


def _run(label: str, cmd: list[str]) -> bool:
    print(f"== round_gate: {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=_REPO_ROOT)
    print(f"== round_gate: {label}: {'PASS' if rc == 0 else f'FAIL (rc={rc})'}",
          flush=True)
    return rc == 0


def _prev_round_bench() -> tuple[dict, str] | None:
    """Per-query times from BENCH_FULL.json at the TRUE previous-round
    boundary.

    VERDICT r11 "What's wrong" #1: the old rule took the newest commit
    whose subject matched ``(round \\d+:|Final round)`` — but a round
    that commits several "Final round-N snapshot" commits then diffs
    its own final state against its own EARLIER state, and the actual
    round-over-round drift is never surfaced.  The driver's
    ``round N: verdict/…`` commit rewrites BENCH_FULL.json with the
    driver's own boundary measurement of round N's final code, so the
    newest such commit IS the previous round's anchor; our in-round
    "Final round-N snapshot" commits are never eligible.  Fallback
    (fresh clone without driver commits yet): the newest
    "Final round-M snapshot" with M strictly below the newest round
    number seen anywhere in the log.
    """
    try:
        log = subprocess.check_output(
            ["git", "log", "--format=%H %s", "--", "BENCH_FULL.json"],
            cwd=_REPO_ROOT, text=True,
        )
    except (subprocess.CalledProcessError, OSError):
        return None

    def _blob(sha: str) -> dict | None:
        try:
            raw = subprocess.check_output(
                ["git", "show", f"{sha}:BENCH_FULL.json"],
                cwd=_REPO_ROOT, text=True,
            )
            return json.loads(raw).get("queries") or None
        except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
            return None

    lines = [ln.partition(" ")[::2] for ln in log.splitlines()]
    # Newest driver boundary commit wins outright.
    for sha, subject in lines:
        m = re.match(r"round (\d+):", subject)
        if m:
            q = _blob(sha)
            if q:
                return q, f"round {m.group(1)} boundary commit {sha[:7]}"
            break
    # Fallback: snapshots of a strictly earlier round than the newest
    # snapshot round in the log (never this round's own snapshots).
    snap_rounds = [
        (int(m.group(1)), sha)
        for sha, subject in lines
        if (m := re.match(r"Final round-(\d+) snapshot", subject))
    ]
    if snap_rounds:
        newest = max(r for r, _ in snap_rounds)
        for r, sha in snap_rounds:  # log order = newest first
            if r < newest:
                q = _blob(sha)
                if q:
                    return q, f"round {r} snapshot commit {sha[:7]}"
    return None


def _bench_regressions() -> bool:
    """List >1.5x per-query deltas vs the previous round's committed
    BENCH_FULL. Informational (always True): slow can be a justified
    trade, but it must be LISTED at snapshot time, not discovered by
    the judge."""
    cur_path = os.path.join(_REPO_ROOT, "BENCH_FULL.json")
    try:
        with open(cur_path) as fh:
            cur = json.load(fh).get("queries") or {}
    except (OSError, json.JSONDecodeError):
        print("== round_gate: bench-diff: no current BENCH_FULL.json — skipped")
        return True
    baseline = _prev_round_bench()
    if not baseline:
        print("== round_gate: bench-diff: no prior round BENCH_FULL — skipped")
        return True
    prev, label = baseline
    print(f"== round_gate: bench-diff baseline: {label}")
    flagged = [
        (name, prev[name], t)
        for name, t in sorted(cur.items())
        if name in prev
        and prev[name] > 0
        and t > prev[name] * 1.5
        and t - prev[name] > 0.3
    ]
    if flagged:
        print(f"== round_gate: bench-diff: {len(flagged)} queries >1.5x slower"
              " than last round — triage before snapshot:")
        for name, p, c in flagged:
            print(f"   {name}: {p:.2f}s -> {c:.2f}s ({c / p:.1f}x)")
    else:
        print("== round_gate: bench-diff: no >1.5x per-query regressions")
    return True


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    stages: list[tuple[str, list[str]]] = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q",
                    "--no-header", "-p", "no:cacheprovider"]),
    ]
    if not fast:
        n = os.environ.get("RS_SL_PREFLIGHT_N", "all")
        stages.append(
            ("preflight", [sys.executable,
                           os.path.join(_TOOLS_DIR, "driver_preflight.py"), n])
        )
    ok = all(_run(label, cmd) for label, cmd in stages)
    _bench_regressions()
    print(f"ROUND_GATE: {'GREEN' if ok else 'RED — do not snapshot'}")
    return 0 if ok else 1


if __name__ == "__main__":
    main_rc = main()
    raise SystemExit(main_rc)
