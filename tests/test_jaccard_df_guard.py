"""Loud guard for the _JACCARD_DF_CAP oracle assumption (ADVICE r7).

The Spark side of the shared co-shingle pair stage drops shingles with
document frequency above ``_JACCARD_DF_CAP`` before pair generation;
the DuckDB oracles for its consumers (jaccard, containment, cluster,
leakage, provenance-matrix, graph family) do NOT render the cap — they
are bit-identical only while every corpus shingle's df is at or below
the cap. That held silently at every test scale so far; if the data
generator or a new scale ever exceeds it, the divergence should fail
HERE with an explanation, not as a mysterious hash mismatch in a
driver correctness row.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from rs_streamloader_spark.operators.dedup import _JACCARD_DF_CAP

_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_max_shingle_df_below_cap(sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip(f"no documents table at {sf_dir}")
    con = duckdb.connect()
    max_df = con.execute(
        f"""
        WITH s AS (
          SELECT doc_id, UNNEST(LIST_DISTINCT(
                   LIST_TRANSFORM(RANGE(LEN(ws) - 2),
                     i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
                 )) AS sh
          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws
                FROM read_parquet('{sf_dir}/documents.parquet'))
          WHERE LEN(ws) >= 3
        )
        SELECT MAX(df) FROM (SELECT COUNT(*) AS df FROM s GROUP BY sh)
        """
    ).fetchone()[0]
    assert max_df is not None and max_df <= _JACCARD_DF_CAP, (
        f"max shingle df {max_df} at {sf_dir} exceeds _JACCARD_DF_CAP="
        f"{_JACCARD_DF_CAP}: the Spark pair stage drops over-cap shingles"
        " but the DuckDB oracles do not — every co-shingle consumer"
        " (jaccard/containment/cluster/leakage/dup-matrix/graph) would"
        " hash-mismatch. Either raise the cap or render a HAVING"
        f" COUNT(*) <= {_JACCARD_DF_CAP} guard into the shingle CTEs."
    )
