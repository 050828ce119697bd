#!/usr/bin/env python
"""Pre-flight the driver's next correctness sweep (VERDICT r2 item 3).

Replicates what the per-round driver records: take the first N (=50)
entries of ``__spark_entry__.queries()`` — i.e. the least-recently-
verified prefix of the catalog rotation — and run Spark vs the DuckDB
oracle at sf0.01 with the same compare the local harness uses. Any
failure here would be a red row in CORRECTNESS_r{N}.json, so this runs
BEFORE every round-boundary commit of consequence.

    PYTHONPATH=/root/repo python tools/driver_preflight.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> None:
    raw_n = sys.argv[1] if len(sys.argv) > 1 else "50"
    # "all" = the whole catalog, whatever its current size — the
    # round-end default (VERDICT r10 item 2), so "cumulatively green"
    # stays "currently green" without hand-updating a count
    n = 10**9 if raw_n == "all" else int(raw_n)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    # bare session, like the driver's — config assumptions must not leak
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from oracle_harness import compare, duck_connection

    q = entry.queries()
    o = entry.oracle_sql()
    con = duck_connection(sf_dir)

    names = list(q)[:n]
    failed: list[str] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = q[name](spark, sf_dir)
            if name in o:
                oracle_pdf = con.execute(o[name]).df()
                compare(df, oracle_pdf, name)
                status = "ok"
            else:
                rows = df.count()
                status = f"rows-only ({rows} rows)"
        except Exception as exc:
            status = f"FAIL {type(exc).__name__}: {exc}"
            failed.append(name)
        print(
            f"[{i + 1:>2}/{len(names)}] {name}: {status} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
