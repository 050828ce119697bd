"""Staged-write contracts: part-size splitting, gzip compression,
manifest-from-listing, parquet staging format.
Reference: /root/reference/lib/RedshiftLoader.ts:143-160, 299-336;
split heuristic README.md:360-366."""

from __future__ import annotations

import json

from rs_streamloader_spark.staging import (
    delete_stage,
    list_committed_files,
    write_manifest,
    write_stage,
)


def test_max_records_per_file_splits_parts(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1)
    stage = write_stage(df, str(tmp_path / "s"), fmt="json", max_records_per_file=300)
    # 1000 rows / 300 per file → 4 parts from the single partition
    assert len(stage.files) == 4
    back = spark.read.json(stage.data_prefix)
    assert back.count() == 1000


def test_gzip_staging_roundtrip(spark, tmp_path):
    df = spark.range(50).selectExpr("id", "CAST(id AS STRING) AS s")
    stage = write_stage(df, str(tmp_path / "g"), fmt="json", gzip=True)
    assert all(f.endswith(".gz") for f in stage.files), stage.files
    back = spark.read.json(stage.data_prefix)
    assert back.count() == 50


def test_manifest_lists_all_parts_mandatory(spark, tmp_path):
    df = spark.range(100).repartition(3)
    stage = write_stage(df, str(tmp_path / "m"), fmt="json")
    write_manifest(spark, stage)
    manifest = json.loads(
        open(stage.manifest_path.replace("file:", "")).read()
    )
    urls = [e["url"] for e in manifest["entries"]]
    assert sorted(urls) == sorted(stage.files)
    assert all(e["mandatory"] for e in manifest["entries"])
    # manifest is a sibling of data/, never read back as a part
    assert stage.manifest_path not in stage.files


def test_parquet_staging_format(spark, tmp_path):
    df = spark.range(20).selectExpr("id", "id * 1.5 AS x")
    stage = write_stage(df, str(tmp_path / "p"), fmt="parquet")
    back = spark.read.parquet(stage.data_prefix)
    assert back.count() == 20
    assert [f for f in stage.files if f.endswith(".parquet")]


def test_delete_stage_removes_everything(spark, tmp_path):
    prefix = str(tmp_path / "d")
    stage = write_stage(spark.range(5), prefix, fmt="json")
    write_manifest(spark, stage)
    assert delete_stage(spark, prefix)
    assert list_committed_files(spark, prefix) == []


def test_to_copy_url_rewrites_hadoop_s3_schemes():
    """Redshift COPY only accepts s3:// URLs (the reference builds
    s3://bucket/key, RedshiftLoader.ts:300-311); Hadoop listings come
    back s3a://. ADVICE r1, medium."""
    from rs_streamloader_spark.staging import to_copy_url

    assert to_copy_url("s3a://bkt/pre/part-0.json.gz") == "s3://bkt/pre/part-0.json.gz"
    assert to_copy_url("s3n://bkt/k") == "s3://bkt/k"
    assert to_copy_url("s3://bkt/k") == "s3://bkt/k"
    assert to_copy_url("file:/tmp/x/part-0.json") == "file:/tmp/x/part-0.json"


def test_orc_staging_format_end_to_end(spark, tmp_path):
    """ORC staging (config.py:158 lists it; the reference's FORMAT AS
    ORC passthrough, redshift_sql.py:52) — staged parts are real ORC
    files, round-trip preserves values, and the full Loader upsert
    path lands them through the native sink."""
    from pyspark.sql import functions as F

    from rs_streamloader_spark.loader import Loader
    from rs_streamloader_spark.sinks.native import NativeTableSink

    df = spark.range(40).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS grp", "id * 2.5 AS x"
    )
    stage = write_stage(df, str(tmp_path / "o"), fmt="orc")
    assert [f for f in stage.files if f.endswith(".orc")], stage.files
    back = spark.read.orc(stage.data_prefix)
    assert back.count() == 40
    assert {r["id"] for r in back.collect()} == set(range(40))

    sink = NativeTableSink(
        spark, str(tmp_path / "t"), num_buckets=4, bucket_by="id"
    )
    loader = Loader(
        spark,
        options={
            "table": "wh.orc_target",
            "id_field": "id",
            "staging_format": "orc",
            "copy_settings": {"format": "ORC"},
        },
        sink=sink,
        staging_root=str(tmp_path / "stage"),
    )
    loader.add_source(df)
    loader.upsert()
    landed = sink.read()
    assert landed.count() == 40
    assert landed.agg(F.sum("x")).first()[0] == sum(i * 2.5 for i in range(40))
