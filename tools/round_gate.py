#!/usr/bin/env python
"""Round-end gate: refuse a round snapshot while the suite is red.

VERDICT r9 "What's wrong" #2: round 9 committed its end-of-round
snapshot with ``tests/test_plans.py::test_fuzzy_match_caps_blocks_
before_join`` failing — the operator rewrite shipped without updating
its plan guard, and nothing in the process refused the red suite.
This gate is that refusal. Run it BEFORE declaring a round done:

    python tools/round_gate.py             # pytest + 50-query preflight
    python tools/round_gate.py --fast      # pytest only
    RS_SL_PREFLIGHT_N=286 python tools/round_gate.py   # full catalog

Exit status is 0 only when every stage passes; the last line is a
single machine-readable verdict so the snapshot script (or a human in
a hurry) cannot misread partial output as green.
"""

from __future__ import annotations

import os
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


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    stages: list[tuple[str, list[str]]] = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q",
                    "--no-header", "-p", "no:cacheprovider"]),
    ]
    if not fast:
        n = os.environ.get("RS_SL_PREFLIGHT_N", "50")
        stages.append(
            ("preflight", [sys.executable,
                           os.path.join(_TOOLS_DIR, "driver_preflight.py"), n])
        )
    ok = all(_run(label, cmd) for label, cmd in stages)
    print(f"ROUND_GATE: {'GREEN' if ok else 'RED — do not snapshot'}")
    return 0 if ok else 1


if __name__ == "__main__":
    main_rc = main()
    raise SystemExit(main_rc)
