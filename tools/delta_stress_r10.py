#!/usr/bin/env python
"""One-off r10 delta: re-measure the four joins pinned after the k=100
rehearsal at 10× and merge the rows into SCALE_STRESS_r10.json, then
re-run the k=100 heavy-family rehearsal against the pinned plans."""

from __future__ import annotations

import json
import os
import sys

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TOOLS_DIR)
for _p in (_REPO_ROOT, _TOOLS_DIR):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import full_stress as fs
import scale_stress as ss

PINNED = [
    "dedup_minhash_lsh",
    "minhash_estimate_audit",
    "dedup_semantic",
    "item_item_cosine_topk",
]


def main() -> None:
    from rs_streamloader_spark.session import get_session

    spark = get_session(app_name="rs_sl_delta_stress_r10")
    spark.sparkContext.setLogLevel("ERROR")
    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # 10× delta, merged into the committed sweep artifact — refuse to
    # overwrite good committed rows with err rows from a missing/stale
    # replica dir (review finding: a cleared /tmp would have done so
    # while printing success)
    if not ss.scaled_dir_ready("/tmp/rs_sl_sf1", base_sf, 10):
        print("generating /tmp/rs_sl_sf1 at k=10…", file=sys.stderr, flush=True)
        ss.make_scaled(spark, base_sf, "/tmp/rs_sl_sf1", 10)
    ss.HEAVY_TAIL = PINNED  # run_stress records an err row for unknown names
    delta = ss.run_stress(spark, base_sf, "/tmp/rs_sl_sf1", 10)
    path = os.path.join(_REPO_ROOT, "SCALE_STRESS_r10.json")
    with open(path) as fh:
        merged = json.load(fh)
    merged["queries"].update(delta["queries"])
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"merged {len(delta['queries'])} delta rows -> {path}")

    # k=100 rehearsal against the pinned plans
    if not ss.scaled_dir_ready("/tmp/rs_sl_sf10", base_sf, 100):
        print("generating /tmp/rs_sl_sf10 at k=100…", file=sys.stderr, flush=True)
        ss.make_scaled(spark, base_sf, "/tmp/rs_sl_sf10", 100)
    ss.HEAVY_TAIL = list(fs.HEAVY_K100)
    result = ss.run_stress(spark, base_sf, "/tmp/rs_sl_sf10", 100)
    out = os.path.join(_REPO_ROOT, "SCALE_STRESS_r10_k100.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(result['queries'])} rows -> {out}")


if __name__ == "__main__":
    main()
