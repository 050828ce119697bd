"""Constructed-corpus pins for ``pretrain_pipeline_e2e`` — the
ingest→quality→dedup→tally capstone. The synthetic corpus has no
exact-duplicate texts at the sf0.01 compare scale, so the dedup-drop
branch would be vacuously green there; this corpus plants passing
duplicates (and quality failures of two different kinds) and checks
cross-engine agreement plus every branch firing."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from tests.oracle_harness import compare

_T_PASS = " ".join(["the"] + ["wonderful"] * 30)  # passes all 4 screens
_T_MWL = "the " + " ".join(f"inspection{i % 10}" for i in range(40))
_DOCS = [
    # (doc_id, source, text)
    (0, "src0", _T_PASS),    # admitted (first copy, rn=1)
    (10, "src1", _T_PASS),   # duplicate -> dropped
    (30, "src2", _T_PASS),   # duplicate -> dropped
    (20, "src2", _T_MWL),    # fails mean-word-length screen
    (5, "src0", "tiny doc"), # fails word-count screen
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("pipeline_corpus")
    docs = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": s,
                "n_chars": len(t),
            }
            for i, s, t in _DOCS
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    return str(d)


def test_pipeline_branches_and_oracle_agree(spark, corpus_dir):
    import duckdb

    df = entry.queries()["pretrain_pipeline_e2e"](spark, corpus_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{corpus_dir}/documents.parquet')"
    )
    oracle = con.execute(
        entry.oracle_sql()["pretrain_pipeline_e2e"]
    ).df()
    compare(df, oracle, "pretrain_pipeline_e2e@constructed")
    pdf = df.toPandas().set_index("source").sort_index()
    # every branch fires: admission, both quality screens, dedup drops
    assert int(pdf["n_admitted"].sum()) == 1
    assert int(pdf["n_dup_dropped"].sum()) == 2
    assert int(pdf["n_quality_rejected"].sum()) == 2
    # the admitted copy is the FIRST by doc_id (src0), so src1/src2's
    # identical texts are the dropped ones
    assert pdf.loc["src0", "n_admitted"] == 1
    assert pdf.loc["src1", "n_dup_dropped"] == 1
    assert pdf.loc["src2", "n_dup_dropped"] == 1
    # token mass counts only the admitted copy
    assert int(pdf["admitted_tokens"].sum()) == 31


def test_pipeline_plan_shape(spark):
    """Map-only extraction feeding one dedup window + one rollup: at
    most 3 exchanges, and exactly one Python stage."""
    df = entry.queries()["pretrain_pipeline_e2e"](
        spark, "/root/testdata/sf0.001"
    )
    text = df._jdf.queryExecution().executedPlan().toString()
    assert text.count("Exchange") <= 3, text[:2000]
    assert text.count("MapInPandas") == 1, text[:2000]


def test_incremental_agg_max_fold_keeps_earlier_max(spark, tmp_path):
    """IVM non-additive-fold pin: a LATER batch carrying a SMALLER
    max_doc_id must not regress the stored max (greatest() fold, not
    last-write-wins). Constructed ids: doc 200 arrives in batch 2,
    doc 140 in batch 3 — the final row must keep 200. Cross-engine
    compared on the same corpus."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    rows = [
        # source sA: batch0 (id 0), batch2 (id 200), batch3 (id 140)
        (0, "sA", "alpha beta gamma"),
        (200, "sA", "delta epsilon"),
        (140, "sA", "zeta eta theta iota"),
        # source sB: strictly increasing ids across batches 0/1
        (3, "sB", "one two"),
        (23, "sB", "three four five"),
    ]
    d = tmp_path / "ivm"
    d.mkdir()
    docs = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": s,
                "n_chars": len(t),
            }
            for i, s, t in rows
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    got = {
        r["source"]: r
        for r in entry.queries()["native_store_incremental_agg"](
            spark, str(d)
        ).collect()
    }
    assert got["sA"]["max_doc_id"] == 200  # later batch had 140
    assert got["sA"]["n_docs"] == 3
    assert got["sB"]["n_docs"] == 2
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(
        entry.oracle_sql()["native_store_incremental_agg"]
    ).df()
    for _, w in want.iterrows():
        g = got[w["source"]]
        assert (g["n_docs"], g["chars_sum"], g["max_doc_id"]) == (
            w["n_docs"], w["chars_sum"], w["max_doc_id"],
        ), w["source"]
