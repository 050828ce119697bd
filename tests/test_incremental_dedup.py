"""Cross-run incremental dedup through the native sink (VERDICT r12
next-round #2): the signature STORE must behave like state — land
batch 1, persist; land batch 2, dedup against the persisted table and
upsert its signatures in; the store must grow ADDITIVELY (rewrite cost
tracks the batch's touched buckets, never the table), because at
100 TB a signature store that fully rewrites per batch is not a store.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.loader import Loader
from rs_streamloader_spark.sinks.native import NativeTableSink

N_BUCKETS = 64


def _land(spark, sink, df, staging_root):
    loader = Loader(
        spark,
        options={
            "table": "wh.sig_store",
            "id_field": "doc_id",
            "staging_format": "parquet",
            "copy_settings": {"format": "PARQUET"},
        },
        sink=sink,
        staging_root=staging_root,
    )
    loader.add_source(df)
    assert loader.upsert() == "SUCCESS"


def _sig_batch(spark, ids):
    return spark.createDataFrame(
        [(i, f"{i:032x}", f"{i * 7:032x}") for i in ids],
        "doc_id bigint, h0 string, h1 string",
    )


def _data_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getsize(p)
    return out


def test_signature_store_grows_additively_across_runs(spark, tmp_path):
    sink = NativeTableSink(
        spark, str(tmp_path / "store"), num_buckets=N_BUCKETS, bucket_by="doc_id"
    )

    # run 1: 1000-doc corpus half becomes the persisted store
    _land(spark, sink, _sig_batch(spark, range(0, 2000, 2)), str(tmp_path / "s1"))
    before = _data_files(str(tmp_path / "store"))
    table_bytes = sum(before.values())
    assert sink.read().count() == 1000

    # run 2: a SMALL batch of brand-new keys (the continuous-ingestion
    # shape: batch << store)
    new_ids = list(range(100001, 100041))  # 40 new keys
    batch2 = _sig_batch(spark, new_ids)
    from rs_streamloader_spark.sinks.native import BUCKET_COL

    touched = (
        sink._with_bucket(batch2).select(BUCKET_COL).distinct().count()
    )
    _land(spark, sink, batch2, str(tmp_path / "s2"))
    after = _data_files(str(tmp_path / "store"))

    # additive growth: every batch-1 row still present, batch-2 joined
    table = sink.read()
    assert table.count() == 1040
    assert table.filter(F.col("doc_id") < 2000).count() == 1000

    # NO FULL REWRITE: run 2 may only write the buckets its keys hash
    # into — written bytes bounded by the touched-bucket share of the
    # table (x3 slack for parquet per-file overhead on tiny buckets),
    # never the whole table
    new_files = {p: s for p, s in after.items() if p not in before}
    written = sum(new_files.values())
    assert touched <= min(len(new_ids), N_BUCKETS)
    assert written <= 3 * table_bytes * touched / N_BUCKETS, (
        f"run 2 wrote {written}B vs table {table_bytes}B with only "
        f"{touched}/{N_BUCKETS} buckets touched — full rewrite?"
    )

    # untouched buckets' files are byte-identical (not rewritten)
    surviving = {p: s for p, s in before.items() if p in after}
    assert all(after[p] == s for p, s in surviving.items())
    # and a majority of run-1 files must survive run 2 untouched
    assert len(surviving) >= (N_BUCKETS - touched) / N_BUCKETS * len(before) * 0.9


def test_incremental_decision_table_against_persisted_store(spark, tmp_path, monkeypatch):
    """End-to-end on a constructed corpus with planted cross-batch
    near-dups: the operator must flag the odd-id copies of even-id
    store docs as duplicates (signatures agree on every component) and
    pass genuinely novel odd docs as new."""
    import rs_streamloader_spark.operators.dedup as D

    base_a = "the quick brown fox jumps over the lazy dog again and again " * 3
    base_b = "colorless green ideas sleep furiously every single night here " * 3
    rows = []
    # even ids: the store
    rows.append((0, base_a))
    rows.append((2, base_b))
    rows.append((4, "completely unrelated store document about parquet buckets and shuffles in spark"))
    # odd ids: incoming — 1 duplicates doc 0, 3 duplicates doc 2, 5 is novel
    rows.append((1, base_a))
    rows.append((3, base_b))
    rows.append((5, "a genuinely novel incoming document mentioning watermarks and stateful streaming operators"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    monkeypatch.setattr(
        D, "load_tables", lambda _s, _d, *names: {"documents": docs}
    )

    out = {
        r["doc_id"]: r
        for r in D.dedup_incremental_minhash(
            spark, str(tmp_path / "sfdir")
        ).collect()
    }
    assert set(out) == {1, 3, 5}
    assert out[1]["is_dup"] and out[1]["matched_doc"] == 0
    assert out[1]["n_match"] == 16 and out[1]["est_jaccard"] == 1.0
    assert out[3]["is_dup"] and out[3]["matched_doc"] == 2
    assert not out[5]["is_dup"] and out[5]["matched_doc"] is None
    assert out[5]["n_match"] == 0
