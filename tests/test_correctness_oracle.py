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


def test_documents_corpus_is_nonempty_ascii(spark):
    """The multimodal byte-stat and frame oracles equate CHARACTERS
    with BYTES — valid only while the documents corpus is non-empty
    pure ASCII. Pin that invariant so a future testdata change fails
    loudly here instead of silently skewing those comparisons."""
    from pyspark.sql import functions as F

    from rs_streamloader_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, "documents")["documents"]
    bad = docs.filter(
        (F.length("text") == 0)
        | (F.length("text") != F.octet_length(F.encode("text", "utf-8")))
    ).count()
    assert bad == 0
