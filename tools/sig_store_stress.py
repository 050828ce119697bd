#!/usr/bin/env python
"""Incremental-dedup SIGNATURE-STORE loader stress (VERDICT r13
next-round #3, the bytes half): prove that the minhash signature
store's per-batch upsert cost — the write path
``dedup_incremental_minhash`` / ``stream_incremental_dedup_replay``
run every batch — tracks BATCH size, not STORE size, as the store
grows 1× → 10× → 100×.

For k in {1, 10, 100} (documents: 5k / 50k / 500k → signature stores
of 2.5k / 25k / 250k rows):

- seed a bucketed native store with the even-doc minhash signatures
  via the real ``Loader.upsert`` path (bucket count scaled to hold
  rows-per-bucket roughly constant — the "size buckets to the table"
  production posture, same convention as tools/loader_stress.py);
- drive 2 successive ``Loader.upsert`` rounds per FIXED batch size
  (50 and 1000 smallest odd-doc signatures — present at every scale)
  and record wall time, buckets touched, and the REPLACE delta's
  actual committed bytes;
- record store growth additivity (rows after = seed + new keys).

Expected shape: rewritten bytes per round are governed by
min(batch_keys, num_buckets) × bucket_size. The 50-key batch stays
under the bucket count at every scale, so its rewritten bytes stay
roughly FLAT across the 100× store growth (rows-per-bucket is held
constant); the 1000-key batch EXCEEDS the bucket count and uniformly
hashes into every bucket, so it rewrites ~the whole store — the
measured crossover that says "size buckets to outnumber your batch
keys", which the artifact exists to document. Usage:

    python tools/sig_store_stress.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TOOLS_DIR)
for _p in (_REPO_ROOT, _TOOLS_DIR):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from pyspark.sql import functions as F  # noqa: E402

BATCH_SIZES = (50, 1000)
UPSERT_ROUNDS = 2
BUCKETS = {1: 16, 10: 160, 100: 1600}  # rows/bucket held constant (~156)
SRC = {
    1: os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    10: "/tmp/rs_sl_sf1",
    100: "/tmp/rs_sl_sf10",
}
WORK = "/tmp/rs_sl_sig_store_stress"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _newest_delta_bytes(table_root: str) -> tuple[str | None, int, int]:
    """(dirname, bytes, buckets) of the newest REPLACE delta commit."""
    from rs_streamloader_spark.sinks.native import _version_of

    best = None
    for name in os.listdir(table_root):
        v = _version_of(name)
        if v and name.startswith("d_"):
            if best is None or v[0] > best[0]:
                best = (v[0], name)
    if best is None:
        return None, 0, 0
    path = os.path.join(table_root, best[1])
    buckets = sum(1 for n in os.listdir(path) if n.startswith("__b="))
    return best[1], _dir_bytes(path), buckets


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO_ROOT, "SCALE_STRESS_r14_loader.json"
    )
    from rs_streamloader_spark.loader import Loader
    from rs_streamloader_spark.operators.dedup import (
        _shingles,
        _sigs_of_shingles,
    )
    from rs_streamloader_spark.session import get_session, load_tables
    from rs_streamloader_spark.sinks.native import NativeTableSink

    spark = get_session(app_name="rs_sl_sig_store_stress")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    result: dict = {"batch_sizes": list(BATCH_SIZES), "scales": {}}
    for k, src in SRC.items():
        if not os.path.isdir(src):
            result["scales"][f"k{k}"] = {"err": f"missing {src}"}
            continue
        docs = load_tables(spark, src, "documents")["documents"].select(
            "doc_id", "text"
        ).where(F.length("text") > 0)
        sigs = _sigs_of_shingles(_shingles(docs))
        store_sigs = sigs.where(F.col("doc_id") % 2 == 0)
        # fixed-size incoming batches: the N smallest odd ids
        # (replicas offset ids upward, so these exist at every scale)
        inc_all = (
            sigs.where(F.col("doc_id") % 2 == 1)
            .orderBy("doc_id")
            .limit(max(BATCH_SIZES))
        ).localCheckpoint(eager=True)

        base = os.path.join(WORK, f"k{k}")
        table_root = os.path.join(base, "sig_store")
        sink = NativeTableSink(
            spark, table_root, num_buckets=BUCKETS[k], bucket_by="doc_id"
        )

        def land(df, stage):
            loader = Loader(
                spark,
                options={
                    "table": "wh.sig_store",
                    "id_field": "doc_id",
                    "staging_format": "parquet",
                    "copy_settings": {"format": "PARQUET"},
                },
                sink=sink,
                staging_root=os.path.join(base, stage),
            )
            loader.add_source(df)
            loader.upsert()

        t0 = time.perf_counter()
        land(store_sigs, "seed")
        seed_s = round(time.perf_counter() - t0, 2)
        store_rows = sink.read().count()
        store_bytes = _dir_bytes(table_root)

        sweeps = {}
        for nb in BATCH_SIZES:
            inc_cached = inc_all.orderBy("doc_id").limit(nb)
            rounds = []
            for r in range(UPSERT_ROUNDS):
                # perturb a signature column so every round is a change
                b = inc_cached.withColumn(
                    "h0", F.md5(F.concat(F.col("h0"), F.lit(f"|r{r}")))
                )
                t0 = time.perf_counter()
                land(b, f"b{nb}_round{r}")
                el = round(time.perf_counter() - t0, 2)
                dname, dbytes, dbuckets = _newest_delta_bytes(table_root)
                rounds.append(
                    {
                        "upsert_s": el,
                        "rewritten_bytes": dbytes,
                        "buckets_touched": dbuckets,
                        "delta_dir": dname,
                    }
                )
                print(f"k{k} batch{nb} round{r}: {rounds[-1]}", flush=True)
            sweeps[f"batch{nb}"] = rounds
        final_rows = sink.read().count()
        result["scales"][f"k{k}"] = {
            "num_buckets": BUCKETS[k],
            "seed_s": seed_s,
            "store_rows": store_rows,
            "store_bytes": store_bytes,
            "batch_sweeps": sweeps,
            "final_rows": final_rows,
            # additivity: the largest batch's odd ids are new keys once
            "rows_ok": final_rows == store_rows + max(BATCH_SIZES),
        }
        print(f"k{k}: {json.dumps(result['scales'][f'k{k}'])[:300]}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
