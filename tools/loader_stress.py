#!/usr/bin/env python
"""Scale-stress the batch Loader's own data path (VERDICT r10 item 1).

Every catalog query has 10x/100x stress rows, but the Loader's M3
contract — "per-batch upsert cost tracks the batch's touched-bucket
volume, not table size" (reference RedshiftLoader.ts:369-384;
sinks/native.py bucketed REPLACE deltas) — was only ever asserted
functionally (tests/test_bucketed_sink.py) and measured at bench scale
(stream_upsert_loader_replay). This tool measures it:

  for k in {1, 10, 100}  (events: 100k / 1M / 10M rows):
    - seed a BUCKETED native table via Loader.trunc_insert, with the
      bucket count scaled to hold rows-per-bucket constant (the real
      deployment posture: you size buckets to the table);
    - drive 3 successive Loader.upsert(dedupe='last') rounds with a
      FIXED 50-key batch and record per-round wall time + how many
      buckets the REPLACE delta actually touched;
    - drive one Loader.insert round (ADDITIVE delta — O(batch) by
      construction) with 50 brand-new keys;
    - do the same seed + one upsert against an UNBUCKETED sink — the
      whole-table-rewrite contrast that shows what the bucketed layout
      is buying.

Expected shape (and what the artifact records): bucketed upsert time is
governed by min(batch_keys, num_buckets) x bucket_size — constant once
buckets outnumber batch keys — while the flat upsert grows ~linearly
with the table. Usage:

    python tools/loader_stress.py [OUT.json]
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

BATCH_KEYS = 50  # fixed batch size at every scale — the whole point
UPSERT_ROUNDS = 3
# constant ~10k rows/bucket: the "size buckets to the table" posture
BUCKETS = {1: 10, 10: 100, 100: 1000}
SRC = {
    1: None,  # filled from env/base below
    10: "/tmp/rs_sl_sf1",
    100: "/tmp/rs_sl_sf10",
}
WORK = "/tmp/rs_sl_loader_stress"


def _events(spark, src_dir: str):
    from rs_streamloader_spark.session import _read_parquet_nanos_safe

    return _read_parquet_nanos_safe(
        spark, os.path.join(src_dir, "events.parquet")
    ).select("event_id", "ts", "user_id", "event_type", "value")


def _batch(events, round_no: int, new_keys: bool = False, keys: int | None = None):
    """Deterministic fixed-size batch: the ``keys`` (default
    BATCH_KEYS) smallest event_ids (present at every scale — replicas
    offset keys upward), values perturbed per round so each upsert is
    a real change. With new_keys, shift ids past any replica's range
    to exercise the additive-append path instead."""
    b = (
        events.orderBy("event_id")
        .limit(keys or BATCH_KEYS)
        .withColumn("value", F.col("value") + F.lit(float(round_no)))
        .withColumn("event_type", F.lit(f"stress_r{round_no}"))
    )
    if new_keys:
        b = b.withColumn(
            "event_id", F.col("event_id") + F.lit(10_000_000_000_000)
        )
    return b


def _loader(spark, sink, stage_root: str, body):
    from rs_streamloader_spark.loader import Loader

    return Loader(
        spark,
        options={
            "table": "wh.events_stress",
            "id_field": "event_id",
            "staging_format": "parquet",
            "s3_cleanup": "ALWAYS",
        },
        staging_root=stage_root,
        sink=sink,
        body=body,
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _newest_commit(table_root: str, kind: str) -> str | None:
    from rs_streamloader_spark.sinks.native import _version_of

    best: tuple[int, str] | None = None
    for name in os.listdir(table_root):
        v = _version_of(name)
        if v and v[1] == kind and (best is None or v[0] > best[0]):
            best = (v[0], name)
    return None if best is None else os.path.join(table_root, best[1])


def _touched_buckets(table_root: str) -> tuple[int | None, int | None]:
    """(bucket subdirs, bytes) of the newest REPLACE delta commit — the
    physical evidence of how much table the upsert rewrote. Wall time
    at 100k-10M rows is overhead-dominated on local[32]; rewritten
    BYTES is the number that becomes wall time at 100 TB."""
    ddir = _newest_commit(table_root, "delta")
    if ddir is None:
        return None, None
    nb = sum(1 for n in os.listdir(ddir) if n.startswith("__b="))
    return nb, _dir_bytes(ddir)


def run(spark, base_sf: str) -> dict:
    from rs_streamloader_spark.sinks.native import NativeTableSink

    SRC[1] = base_sf
    out: dict = {"batch_keys": BATCH_KEYS, "bucketed": {}, "flat": {}}
    for k in (1, 10, 100):
        src = SRC[k]
        if not os.path.isdir(src):
            out["bucketed"][f"k{k}"] = {"err": f"missing scaled dir {src}"}
            continue
        events = _events(spark, src)
        n_rows = events.count()
        root = os.path.join(WORK, f"k{k}")
        shutil.rmtree(root, ignore_errors=True)

        # ---- bucketed table ------------------------------------------
        tbl = os.path.join(root, "tbl")
        sink = NativeTableSink(
            spark, tbl, num_buckets=BUCKETS[k], bucket_by="event_id"
        )
        t0 = time.perf_counter()
        _loader(spark, sink, os.path.join(root, "st_seed"), events).trunc_insert()
        seed_s = round(time.perf_counter() - t0, 2)

        upserts, touched, rewritten = [], [], []
        for r in range(1, UPSERT_ROUNDS + 1):
            body = _batch(events, r)
            t0 = time.perf_counter()
            _loader(spark, sink, os.path.join(root, f"st_u{r}"), body).upsert(
                dedupe="last"
            )
            upserts.append(round(time.perf_counter() - t0, 2))
            nb, nbytes = _touched_buckets(tbl)
            touched.append(nb)
            rewritten.append(nbytes)

        t0 = time.perf_counter()
        _loader(
            spark, sink, os.path.join(root, "st_ins"), _batch(events, 9, True)
        ).insert()
        insert_s = round(time.perf_counter() - t0, 2)
        final_rows = sink.read().count()

        out["bucketed"][f"k{k}"] = {
            "table_rows": n_rows,
            "num_buckets": BUCKETS[k],
            "seed_s": seed_s,
            "upsert_s": upserts,
            "buckets_touched": touched,
            "upsert_rewritten_bytes": rewritten,
            "table_bytes": _dir_bytes(tbl),
            "insert_s": insert_s,
            "final_rows": final_rows,
            "rows_ok": final_rows == n_rows + BATCH_KEYS,
        }
        print(f"[bucketed k={k}] {out['bucketed'][f'k{k}']}", flush=True)

        # ---- unbucketed contrast (whole-table rewrite) ---------------
        flat_tbl = os.path.join(root, "flat")
        flat = NativeTableSink(spark, flat_tbl)
        t0 = time.perf_counter()
        _loader(spark, flat, os.path.join(root, "st_fseed"), events).trunc_insert()
        fseed_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        _loader(
            spark, flat, os.path.join(root, "st_fu"), _batch(events, 1)
        ).upsert(dedupe="last")
        fup_s = round(time.perf_counter() - t0, 2)
        fnew = _newest_commit(flat_tbl, "full")
        out["flat"][f"k{k}"] = {
            "table_rows": n_rows,
            "seed_s": fseed_s,
            "upsert_s": [fup_s],
            "upsert_rewritten_bytes": [_dir_bytes(fnew) if fnew else None],
        }
        print(f"[flat k={k}] {out['flat'][f'k{k}']}", flush=True)
        shutil.rmtree(root, ignore_errors=True)

    # headline ratios: table grew 10x between k=10 and k=100 — bucketed
    # upsert should hold ~flat, the whole-table rewrite should not
    try:
        b10 = min(out["bucketed"]["k10"]["upsert_s"])
        b100 = min(out["bucketed"]["k100"]["upsert_s"])
        f10 = out["flat"]["k10"]["upsert_s"][0]
        f100 = out["flat"]["k100"]["upsert_s"][0]
        out["upsert_time_ratio_k10_to_k100"] = {
            "bucketed": round(b100 / max(b10, 1e-9), 2),
            "flat": round(f100 / max(f10, 1e-9), 2),
        }
        bb10 = min(out["bucketed"]["k10"]["upsert_rewritten_bytes"])
        bb100 = min(out["bucketed"]["k100"]["upsert_rewritten_bytes"])
        fb10 = out["flat"]["k10"]["upsert_rewritten_bytes"][0]
        fb100 = out["flat"]["k100"]["upsert_rewritten_bytes"][0]
        out["upsert_rewritten_bytes_ratio_k10_to_k100"] = {
            "bucketed": round(bb100 / max(bb10, 1), 2),
            "flat": round(fb100 / max(fb10, 1), 2),
        }
    except (KeyError, IndexError, TypeError):
        pass
    return out


def run_batch_size_sweep(spark, src: str, k: int = 10) -> dict:
    """The OTHER axis of the M3 contract: fix the table (k=10 replica,
    1M rows, 100 buckets) and sweep the BATCH — upsert cost must grow
    with batch size (specifically with min(batch_keys, num_buckets) ×
    bucket size in rewritten bytes), which together with the
    table-size sweep pins 'cost tracks batch, not table' from both
    directions."""
    from rs_streamloader_spark.sinks.native import NativeTableSink

    events = _events(spark, src)
    out: dict = {}
    for keys in (10, 100, 1000, 10000):
        root = os.path.join(WORK, f"bs{keys}")
        shutil.rmtree(root, ignore_errors=True)
        tbl = os.path.join(root, "tbl")
        sink = NativeTableSink(
            spark, tbl, num_buckets=BUCKETS[k], bucket_by="event_id"
        )
        _loader(spark, sink, os.path.join(root, "st_seed"), events).trunc_insert()
        body = _batch(events, 1, keys=keys)
        t0 = time.perf_counter()
        _loader(spark, sink, os.path.join(root, "st_u"), body).upsert(
            dedupe="last"
        )
        nb, nbytes = _touched_buckets(tbl)
        out[f"keys{keys}"] = {
            "upsert_s": round(time.perf_counter() - t0, 2),
            "buckets_touched": nb,
            "rewritten_bytes": nbytes,
        }
        print(f"[batch-sweep keys={keys}] {out[f'keys{keys}']}", flush=True)
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO_ROOT, "SCALE_STRESS_r11_loader.json"
    )
    from rs_streamloader_spark.session import get_session

    spark = get_session(app_name="rs_sl_loader_stress")
    spark.sparkContext.setLogLevel("ERROR")
    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = run(spark, base_sf)
    if os.path.isdir(SRC[10]):
        result["batch_size_sweep_k10"] = run_batch_size_sweep(spark, SRC[10])
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
