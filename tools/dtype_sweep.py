#!/usr/bin/env python
"""Report per-column dtype-kind divergence between Spark results and the
DuckDB oracle for a given list of catalog queries (or the full catalog).

    PYTHONPATH=/root/repo python tools/dtype_sweep.py [sf_dir] [name ...]

Prints one line per query: OK, or the list of (col, spark_dtype,
oracle_dtype) mismatches.  Used to drive the VERDICT r6 item-1 CAST fixes
and to prove the class is dead afterwards.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    # bare session ON PURPOSE, like driver_preflight: the external
    # driver builds its own untuned session, so config assumptions
    # must not leak into what this sweep observes
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from oracle_harness import dtype_kind_mismatches, duck_connection

    q = entry.queries()
    o = entry.oracle_sql()
    con = duck_connection(sf_dir)

    names = only or [n for n in q if n in o]
    bad: list[str] = []
    err: list[str] = []
    for i, name in enumerate(names):
        if name not in o:
            print(f"[{i + 1}/{len(names)}] {name}: no oracle, skipped")
            continue
        t0 = time.perf_counter()
        try:
            spark_pdf = q[name](spark, sf_dir).toPandas()
            oracle_pdf = con.execute(o[name]).df()
            mism = dtype_kind_mismatches(spark_pdf, oracle_pdf)
            dt = time.perf_counter() - t0
            if mism:
                bad.append(name)
                print(f"[{i + 1}/{len(names)}] {name}: MISMATCH {mism} ({dt:.1f}s)")
            else:
                print(f"[{i + 1}/{len(names)}] {name}: ok ({dt:.1f}s)")
        except Exception as e:  # noqa: BLE001
            err.append(name)
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {type(e).__name__}: {e}")
    print(f"\n{len(bad)} dtype-mismatched: {bad}")
    if err:
        print(f"{len(err)} errored: {err}")
    sys.exit(1 if (bad or err) else 0)


if __name__ == "__main__":
    main()
