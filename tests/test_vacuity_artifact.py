"""Vacuity-artifact staleness guard (VERDICT r11 item 2).

The scalar_regexp incident (nine rounds green while a branch was
vacuously constant, then a crash at scale) is why tools/vacuity_scan.py
exists — but the scan only protects operators it has actually seen:
round 11 added 9 operators after the last scan and none had a row.
This test makes that staleness impossible: every name in the driver
catalog must have a row in the NEWEST committed VACUITY_r*.json (or an
explicit waiver below), and every multirow constant-column flag in
that artifact must carry a triage note.
"""

from __future__ import annotations

import glob
import json
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Names allowed to be absent from the committed artifact — ONLY for
# operators added in the current session BEFORE the round-end rescan;
# must be empty at snapshot time.
WAIVED: set[str] = set()


def _newest_artifact() -> tuple[str, dict]:
    paths = glob.glob(os.path.join(_REPO, "VACUITY_r*.json"))
    assert paths, "no committed VACUITY_r*.json artifact"
    def round_no(p: str) -> int:
        m = re.search(r"VACUITY_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1
    newest = max(paths, key=round_no)
    with open(newest) as fh:
        return newest, json.load(fh)


def test_every_catalog_query_has_a_vacuity_row():
    import __spark_entry__ as entry

    path, art = _newest_artifact()
    scanned = set(art["all"])
    missing = sorted(set(entry.queries()) - scanned - WAIVED)
    assert not missing, (
        f"{len(missing)} catalog queries have no row in {os.path.basename(path)}"
        f" — run `python tools/vacuity_scan.py /root/testdata/sf0.01"
        f" VACUITY_rN.json`, triage the flags, and commit it: {missing}"
    )


def test_every_multirow_flag_is_triaged():
    path, art = _newest_artifact()
    triage = art.get("triage", {})
    untriaged = sorted(set(art.get("flagged_multirow", {})) - set(triage))
    assert not untriaged, (
        f"multirow constant-column flags in {os.path.basename(path)} without"
        f" a triage note: {untriaged}"
    )


def test_waiver_list_is_empty_at_snapshot():
    # a waiver is a mid-session convenience, never a shipped state
    assert not WAIVED, f"un-rescanned waived operators: {sorted(WAIVED)}"
