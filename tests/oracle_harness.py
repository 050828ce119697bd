"""Local replica of the driver's correctness gate: run each registered
query in Spark AND its DuckDB oracle on the same parquet tables, then
compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                norm.append(round(v, 9))
            elif isinstance(v, pd.Timestamp):
                norm.append(v.tz_localize(None) if v.tzinfo else v)
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=repr)


def dtype_kind_mismatches(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[tuple[str, str, str]]:
    """Per-column dtype-KIND differences (int vs float vs object vs
    datetime; unsigned folds into int) between a Spark result and the
    DuckDB oracle frame — the divergence class the driver's exact
    value-hash fails on. Empty frames carry no representation for the
    driver to hash, so they report no mismatches. Shared by
    ``compare()`` and tools/dtype_sweep.py so the tool and the gate
    can never disagree."""
    if not len(spark_pdf):
        return []
    out = []
    for c in sorted(spark_pdf.columns):
        sk = spark_pdf[c].dtype.kind.replace("u", "i")
        ok = oracle_pdf[c].dtype.kind.replace("u", "i")
        if sk != ok:
            out.append((c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)))
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    spark_pdf = spark_df.toPandas()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    # Dtype-KIND strictness (VERDICT r6 item 2): the driver's exact value-hash
    # distinguishes 1667 (int64) from 1667.0 (float64), so a lenient local
    # compare that treats them as equal predicts green where the driver records
    # red.
    kind_mismatch = dtype_kind_mismatches(spark_pdf, oracle_pdf)
    assert not kind_mismatch, (
        f"{name}: dtype-kind mismatch (spark vs oracle): {kind_mismatch}"
    )
    s_rows = _normalize(spark_pdf)
    o_rows = _normalize(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
