#!/usr/bin/env python
"""Run named catalog queries against the DuckDB oracle at one or more
scale factors — the dev loop for adding operators.

    PYTHONPATH=/root/repo python tools/check_queries.py name1 name2 \
        [--sf /root/testdata/sf0.001 --sf /root/testdata/sf0.01]
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
    names = [a for a in sys.argv[1:] if not a.startswith("--sf=")]
    sfs = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sf=")]
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from pyspark.sql import SparkSession

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
    failed: list[str] = []
    for sf_dir in sfs:
        con = duck_connection(sf_dir)
        for name in names:
            t0 = time.perf_counter()
            try:
                df = q[name](spark, sf_dir)
                if name in o:
                    oracle_pdf = con.execute(o[name]).df()
                    compare(df, oracle_pdf, name)
                    status = "ok"
                else:
                    status = f"rows-only ({df.count()} rows)"
            except Exception as exc:
                status = f"FAIL {type(exc).__name__}: {exc}"
                failed.append(f"{name}@{sf_dir}")
            print(
                f"[{os.path.basename(sf_dir)}] {name}: {status} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    print(f"\nfailed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
