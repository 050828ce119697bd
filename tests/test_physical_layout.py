"""Physical-layout tests: bucketed co-located joins and partition
pruning — the storage-side half of the 100 TB posture (SURVEY.md §2
scale notes). These verify that when tables are laid out for an access
pattern, Spark's planner actually exploits the layout (no shuffle for
bucket-aligned joins; pruned partitions for partition-key filters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.plans import explain_str, shuffle_count


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Two bucketed tables sharing bucket count + key (the co-location
    contract), from the sf0.001 orders/lineitem tables."""
    from rs_streamloader_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001", "orders", "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t["orders"]
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        t["lineitem"]
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable broadcast so the join strategy decision is bucket-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert shuffle_count(joined) == 0, explain_str(joined)
        assert "SortMergeJoin" in explain_str(joined)
        # and it still computes the right thing
        plain = spark.table("b_lineitem").count()
        assert joined.count() == plain
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_reuses_distribution(warehouse):
    spark = warehouse
    agg = spark.table("b_orders").groupBy("o_orderkey").agg(F.count("*").alias("n"))
    # grouping on the bucket key needs no exchange
    assert shuffle_count(agg) == 0, explain_str(agg)


def test_partition_pruning(spark, tmp_path):
    from rs_streamloader_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", "events")["events"]
    path = str(tmp_path / "ev_partitioned")
    (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(path)
    )
    part = spark.read.parquet(path)
    days = [r["day"] for r in part.select("day").distinct().collect()]
    assert len(days) > 1, "need multiple partitions to prove pruning"
    one_day = sorted(days)[0]
    q = part.filter(F.col("day") == one_day)
    text = explain_str(q)
    # the filter must reach PartitionFilters, not a post-scan Filter
    assert "PartitionFilters: [" in text and "day" in text.split("PartitionFilters:")[1].split("]")[0]
    full = part.count()
    pruned = q.count()
    assert 0 < pruned < full


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning: when the fact table is partitioned
    on the join key's derived column and the dim side carries a
    selective filter, the fact scan must receive a runtime pruning
    subquery (dynamicpruning expression) — at 100 TB this is the
    difference between scanning one year and scanning the decade."""
    from rs_streamloader_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_by_year")
    (
        t["orders"]
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    years = (
        t["orders"]
        .select(F.year("o_orderdate").alias("o_year"))
        .distinct()
        .withColumn("pick", F.col("o_year") % 3)
    )
    dim = years.where(F.col("pick") == 0)
    joined = fact.join(dim.hint("broadcast"), "o_year").groupBy("o_year").count()
    text = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in text.lower(), text[:3000]
