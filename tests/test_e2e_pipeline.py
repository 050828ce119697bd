"""End-to-end slice at real row counts (SURVEY.md §7 step 4): a parquet
path body flows through Loader staging (parts + manifest) into the
NativeTableSink, then analytics run against the sink's committed table
— ingestion → staging → load mode → scan → aggregation in one test."""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_streamloader_spark.loader import Loader
from rs_streamloader_spark.session import load_tables
from rs_streamloader_spark.sinks.native import NativeTableSink

SF = "/root/testdata/sf0.01"


def test_parquet_body_to_native_table_and_query(spark, tmp_path):
    src = load_tables(spark, SF, "orders")["orders"]
    n_src = src.count()

    sink = NativeTableSink(spark, str(tmp_path / "orders_tbl"))
    loader = Loader(
        spark,
        options={
            "table": "wh.orders",
            "id_field": "o_orderkey",
            "staging_format": "parquet",
            "copy_settings": {"format": "PARQUET"},
        },
        sink=sink,
        staging_root=str(tmp_path / "stage"),
    )
    loader.add_source(f"{SF}/orders.parquet")
    assert loader.insert() == "SUCCESS"
    assert sink.read().count() == n_src

    # upsert a mutated slice: updated rows replace, new rows append
    updates = (
        src.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    n_upd = updates.count()
    up_loader = Loader(
        spark,
        options={
            "table": "wh.orders",
            "id_field": "o_orderkey",
            "staging_format": "parquet",
            "copy_settings": {"format": "PARQUET"},
        },
        sink=sink,
        staging_root=str(tmp_path / "stage2"),
    )
    up_loader.add_source(updates)
    assert up_loader.upsert() == "SUCCESS"
    table = sink.read()
    assert table.count() == n_src  # keyed upsert: no duplicates
    doubled = table.filter(F.col("o_orderkey") % 100 == 0)
    assert doubled.count() == n_upd

    # analytics over the committed table match the source-side compute
    got = (
        table.groupBy("o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        .collect()
    )
    exp_src = (
        src.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        .collect()
    )
    assert {r["o_orderstatus"]: r["total"] for r in got} == {
        r["o_orderstatus"]: r["total"] for r in exp_src
    }
