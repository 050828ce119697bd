#!/usr/bin/env python
"""Catalog-wide vacuity audit (VERDICT r9 item 2, beyond the named
queries): run every registered query at a small sf and report each
output column that is CONSTANT across all rows — the signature of a
branch that never fires on the test corpus (``scalar_regexp`` was
green for nine rounds with an always-zero ``n_numbers`` while being
one digit away from crashing).

A constant column is not automatically a bug — single-row reports,
fixed parameters echoed into the output, and degenerate-by-design
flags are legitimate — so the output is a review-ranked JSON report,
not a gate. Columns on >1-row results are the interesting tier.

    python tools/vacuity_scan.py [/root/testdata/sf0.01] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vacuity_scan.json"

    from rs_streamloader_spark.operators import REGISTRY
    from rs_streamloader_spark.session import get_session

    spark = get_session(app_name="rs_sl_vacuity_scan")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    for i, name in enumerate(REGISTRY, 1):
        rec: dict = {}
        try:
            # Pair/candidate-family outputs grow with the corpus; constancy
            # detection doesn't need the full result, so bound the driver
            # collect (and say so in the report when the cap bites).
            _CAP = 100_000
            pdf = REGISTRY[name].fn(spark, sf_dir).limit(_CAP + 1).toPandas()
            if len(pdf) > _CAP:
                pdf = pdf.iloc[:_CAP]
                rec["truncated_at"] = _CAP
            rec["rows"] = len(pdf)
            rec["constant_cols"] = {
                c: repr(pdf[c].iloc[0])[:60]
                for c in pdf.columns
                if len(pdf) and pdf[c].nunique(dropna=False) == 1
            }
        except Exception as exc:
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        report[name] = rec
        flagged = rec.get("constant_cols") or {}
        if flagged and rec.get("rows", 0) > 1:
            print(f"[{i}/{len(REGISTRY)}] {name}: rows={rec['rows']} "
                  f"CONSTANT {sorted(flagged)}", flush=True)

    multi = {
        n: r for n, r in report.items()
        if r.get("constant_cols") and r.get("rows", 0) > 1
    }
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "flagged_multirow": multi, "all": report},
            fh, indent=1, sort_keys=True,
        )
        fh.write("\n")
    errs = [n for n, r in report.items() if "err" in r]
    print(f"\n{len(multi)} multi-row queries with constant columns; "
          f"{len(errs)} errors {errs}; wrote {out_path}")


if __name__ == "__main__":
    main()
