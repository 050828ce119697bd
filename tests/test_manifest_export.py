"""Open-manifest interop for NativeTableSink (VERDICT r14 "what's
missing" #3: Delta/Iceberg are unavailable in-container, so the
remaining lake gap is INTEROP, not semantics). ``export_manifest()``
writes a plain JSON file listing for a committed version; any
parquet-capable engine can then read the exact snapshot with zero
knowledge of the version-directory protocol — proven here by
consuming a manifest from DUCKDB and checking row parity with the
sink's own read."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.sinks.native import NativeTableSink, read_manifest


@pytest.fixture()
def bucketed(spark, tmp_path):
    return NativeTableSink(
        spark, str(tmp_path / "t"), num_buckets=4, bucket_by="id"
    )


def _vals(df):
    return {r["id"]: r["val"] for r in df.collect()}


def test_manifest_roundtrip_spark(spark, bucketed):
    sink = bucketed
    sink.upsert(
        spark.range(0, 50).select("id", F.lit("a").alias("val")),
        id_field="id",
    )
    sink.upsert(
        spark.range(25, 60).select("id", F.lit("b").alias("val")),
        id_field="id",
    )
    path = sink.export_manifest()
    m = json.loads(open(path).read())
    assert m["format"].startswith("rs-streamloader-native-manifest/")
    assert m["version"] == 2 and m["files"]
    assert all(f["path"].endswith(".parquet") for f in m["files"])
    assert _vals(read_manifest(spark, path)) == _vals(sink.read())


def test_manifest_consumed_by_duckdb(spark, bucketed):
    """The interop claim itself: a different engine reads the listed
    files directly and sees the exact committed snapshot."""
    import duckdb

    sink = bucketed
    sink.upsert(
        spark.range(0, 40).select("id", F.lit("x").alias("val")),
        id_field="id",
    )
    sink.upsert(
        spark.range(10, 20).select("id", F.lit("y").alias("val")),
        id_field="id",
    )
    m = json.loads(open(sink.export_manifest()).read())
    files = [f["path"] for f in m["files"]]
    con = duckdb.connect()
    rows = con.execute(
        "SELECT id, val FROM read_parquet(?)", [files]
    ).fetchall()
    got = dict(rows)
    assert got == _vals(sink.read())
    assert sum(1 for v in got.values() if v == "y") == 10


def test_manifest_of_pinned_version_under_concurrent_upsert(spark, bucketed):
    """Export under a pin names the pinned version's files and keeps
    reading that state while the live table moves on — the snapshot
    hand-off a downstream (non-Spark) consumer needs."""
    sink = bucketed
    sink.upsert(
        spark.range(0, 30).select("id", F.lit("old").alias("val")),
        id_field="id",
    )
    with sink.snapshot() as snap:
        path = sink.export_manifest(version=snap.version)
        sink.upsert(
            spark.range(0, 30).select("id", F.lit("new").alias("val")),
            id_field="id",
        )
        frozen = read_manifest(spark, path)
        assert set(_vals(frozen).values()) == {"old"}
        assert set(_vals(sink.read()).values()) == {"new"}
    # after release + vacuum the manifest's files are reclaimable —
    # the documented snapshot-lifetime rule
    assert sink.vacuum() > 0


def test_manifest_unbucketed_and_schema_evolution(spark, tmp_path):
    sink = NativeTableSink(spark, str(tmp_path / "u"))
    sink.trunc_insert(
        spark.range(0, 10).select("id", F.lit("a").alias("val"))
    )
    sink.insert(
        spark.range(100, 103).select(
            "id", F.lit("b").alias("val"), F.lit(7).alias("extra")
        )
    )
    path = sink.export_manifest()
    df = read_manifest(spark, path)
    assert set(df.columns) == {"id", "val", "extra"}
    assert df.count() == 13
    assert df.where("extra IS NULL").count() == 10


# ---------------------------------------------------------------------------
# zone-map stats + file skipping (r15: the pruning half of the open
# manifest — Delta file-stats / Iceberg manifest-metrics analogue)
# ---------------------------------------------------------------------------


def _manifest_dict(path):
    return json.loads(open(path).read())


def test_directory_manifest_stats_match_footers(spark, tmp_path):
    """Zone maps recorded by the distributed footer pass must equal a
    pyarrow recompute of every file's true column min/max."""
    import pyarrow.parquet as pq

    from rs_streamloader_spark.sinks.native import write_directory_manifest

    d = str(tmp_path / "clustered")
    df = spark.range(0, 400).select(
        F.col("id"),
        (F.col("id") / 100).cast("bigint").alias("band"),
        (F.col("id") * 3).alias("v"),
    )
    df.repartition("band").write.partitionBy("band").parquet(d)
    mp = write_directory_manifest(spark, d, stats_columns=["id", "v"])
    m = _manifest_dict(mp)
    assert m["stats_columns"] == ["id", "v"] and m["files"]
    for f in m["files"]:
        t = pq.read_table(f["path"], columns=["id", "v"])
        ids = t.column("id").to_pylist()
        vs = t.column("v").to_pylist()
        assert f["stats"]["id"] == {"min": min(ids), "max": max(ids)}
        assert f["stats"]["v"] == {"min": min(vs), "max": max(vs)}


def test_prune_manifest_files_semantics(spark, tmp_path):
    """Pure skipping rules: closed-interval intersection, None as
    unbounded, stats-absent files always kept."""
    from rs_streamloader_spark.sinks.native import prune_manifest_files

    m = {
        "files": [
            {"path": "a", "stats": {"id": {"min": 0, "max": 9}}},
            {"path": "b", "stats": {"id": {"min": 10, "max": 19}}},
            {"path": "c", "stats": {"id": {"min": 20, "max": 29}}},
            {"path": "d"},  # no stats -> never prunable
        ]
    }
    kept, total = prune_manifest_files(m, "id", 5, 12)
    assert kept == ["a", "b", "d"] and total == 4
    # boundary inclusivity: hi == file min keeps it
    assert prune_manifest_files(m, "id", None, 10)[0] == ["a", "b", "d"]
    assert prune_manifest_files(m, "id", 30, None)[0] == ["d"]
    assert prune_manifest_files(m, "id", None, None)[0] == [
        "a", "b", "c", "d",
    ]
    # unknown column -> nothing prunable
    assert prune_manifest_files(m, "zzz", 0, 1)[0] == ["a", "b", "c", "d"]


def test_pruned_read_equals_full_filter(spark, tmp_path):
    """Correctness gate: zone-map skip + residual predicate must equal
    the unpruned filtered read, and must actually skip files on a
    range-clustered layout."""
    from rs_streamloader_spark.sinks.native import (
        load_manifest,
        prune_manifest_files,
        read_manifest,
        write_directory_manifest,
    )

    d = str(tmp_path / "ranged")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") / 125).cast("bigint").alias("band")
    )
    df.repartition("band").write.partitionBy("band").parquet(d)
    mp = write_directory_manifest(spark, d, stats_columns=["id"])
    m = load_manifest(spark, mp)
    # bands of 125: [125..249], [250..374] and [375..499] intersect
    # [200, 399] -> 3 of the 8 files survive the skip
    kept, total = prune_manifest_files(m, "id", 200, 399)
    assert total == 8 and len(kept) == 3
    pruned = read_manifest(spark, mp, prune=("id", 200, 399)).where(
        (F.col("id") >= 200) & (F.col("id") <= 399)
    )
    full = read_manifest(spark, mp).where(
        (F.col("id") >= 200) & (F.col("id") <= 399)
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )


def test_sink_export_manifest_with_stats(spark, tmp_path):
    """export_manifest(stats_columns=...) on the sink's own layout:
    every listed file carries zone maps for the requested column and a
    full-range prune keeps everything."""
    from rs_streamloader_spark.sinks.native import prune_manifest_files

    sink = NativeTableSink(
        spark, str(tmp_path / "zt"), num_buckets=4, bucket_by="id"
    )
    sink.upsert(
        spark.range(0, 80).select("id", (F.col("id") % 7).alias("val")),
        id_field="id",
    )
    path = sink.export_manifest(stats_columns=["id"])
    m = _manifest_dict(path)
    assert m["stats_columns"] == ["id"]
    assert all("id" in (f.get("stats") or {}) for f in m["files"])
    kept, total = prune_manifest_files(m, "id", 0, 79)
    assert len(kept) == total
