"""Data-level golden tests: every registered query vs its DuckDB
oracle at sf0.001 (fast; CI-style). The driver repeats this at sf0.01.
Queries with ``oracle=None`` get a rows-≥0 + stable-schema smoke check
instead (same as the driver's weaker check).
"""

from __future__ import annotations

import pytest

from rs_streamloader_spark.operators import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        rows = df.collect()
        assert len(rows) >= 0
        assert len(df.schema.fields) > 0
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    compare(df, oracle_pdf, name)
