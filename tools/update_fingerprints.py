#!/usr/bin/env python
"""Snapshot oracle-SQL fingerprints for the driver rotation.

ADVICE r8: the red-first rotation only prioritized queries whose
latest driver row was red — an operator redefined while green (new
oracle semantics) stayed at the back of the queue, so the scoreboard
re-check of a redefinition could lag a full cycle. Fix: this file
maintains ``tools/oracle_fingerprints.json`` (query name → short hash
of its oracle SQL, representing "the definition the driver last saw
green"); ``__spark_entry__._catalog_order`` treats a current-hash
mismatch against the snapshot like a red row, so redefinitions jump
the queue.

Refresh rule (evidence-aware, NOT "trust whatever is on disk now"):

- a query whose latest driver row is green AND comes from the newest
  CORRECTNESS round gets its fingerprint set to the CURRENT oracle —
  the freshest scoreboard evidence vouches for the current definition;
- a query with an older green row and NO existing entry is
  bootstrapped to the current oracle (assumed unchanged since that
  row — override by hand if you know better, e.g. a redefinition that
  postdates the row: set the entry to any non-matching sentinel like
  ``stale:redefined-rN``);
- an existing entry that mismatches the current oracle is KEPT
  (stays flagged) until a newest-round green row exists for the new
  definition — that is the whole point;
- never-sampled queries get no entry (they already rotate first via
  last_seen=0).

Run at round start, after the driver lands CORRECTNESS_r{N}.json:

    python tools/update_fingerprints.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

FP_PATH = os.path.join(_REPO_ROOT, "tools", "oracle_fingerprints.json")


# Single-sourced from the driver artifact (which must stay standalone):
# writer and rotation reader share one scheme by construction.
from __spark_entry__ import oracle_fingerprint  # noqa: E402


def _driver_evidence(root: str) -> tuple[dict[str, tuple[int, bool]], int]:
    """name → (round of latest driver row, that row was green); plus
    the newest round number seen across all CORRECTNESS files."""
    latest: dict[str, tuple[int, bool]] = {}
    max_round = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        max_round = max(max_round, rnd)
        for name, rec in rows.items():
            if name in latest and latest[name][0] > rnd:
                continue
            if isinstance(rec, dict) and rec.get("err") == "no_oracle":
                green = True  # rows-only by declared design
            else:
                green = bool(
                    isinstance(rec, dict)
                    and rec.get("rows_match")
                    and rec.get("schema_match", True)
                    and rec.get("hash_match", True)
                    and not rec.get("err")
                )
            latest[name] = (rnd, green)
    return latest, max_round


def main() -> None:
    from rs_streamloader_spark.operators import REGISTRY

    fps: dict[str, str] = {}
    try:
        with open(FP_PATH) as fh:
            fps = json.load(fh)
    except (OSError, ValueError):
        pass

    evidence, max_round = _driver_evidence(_REPO_ROOT)
    refreshed, bootstrapped, kept_stale = 0, 0, []
    for name in REGISTRY:
        cur = oracle_fingerprint(REGISTRY[name].oracle)
        rnd, green = evidence.get(name, (0, False))
        # A hand-set "stale:…rN…" sentinel means "redefined DURING
        # round N, after that round's driver run" — a green row from
        # round < N predates the redefinition and must NOT clear it
        # (without this, re-running the tool in the same round wiped
        # the sentinel and vouched the new definition with old
        # evidence). The sentinel clears once the driver records a
        # green row in round >= N.
        # Expected sentinel format: "stale:<reason>-rN" where rN is the
        # round of redefinition. Take the MAX of all rN substrings so a
        # sentinel mentioning an older round too ("stale:pre-r2-redefined-r10")
        # parses as 10, not 2 — the first-match version cleared such a
        # sentinel with stale round-2 evidence.
        sentinel = fps.get(name, "")
        if sentinel.startswith("stale:"):
            rounds = [int(g) for g in re.findall(r"r(\d+)", sentinel)]
            if rounds and rnd < max(rounds):
                kept_stale.append(name)
                continue
        if green and rnd == max_round:
            if fps.get(name) != cur:
                refreshed += 1
            fps[name] = cur
        elif green and name not in fps:
            fps[name] = cur
            bootstrapped += 1
        elif name in fps and fps[name] != cur:
            kept_stale.append(name)

    # drop entries for queries no longer in the registry
    fps = {n: v for n, v in fps.items() if n in REGISTRY}
    with open(FP_PATH, "w") as fh:
        json.dump(fps, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {len(fps)} fingerprints -> {FP_PATH} "
        f"(refreshed {refreshed}, bootstrapped {bootstrapped}, "
        f"kept stale {kept_stale})"
    )


if __name__ == "__main__":
    main()
