"""Schema-evolution contract for NativeTableSink (VERDICT r14
next-round #6): what happens end-to-end when a batch carries a NEW
column. The merge machinery existed (`mergeSchema` reads,
``_merged_spec_schema`` widening) but nothing pinned the observable
contract — this does, matching the reference's COPY-'auto' posture
(unlisted columns NULL-fill, RedshiftLoader.ts:337-386) and its
CREATE-LIKE clone semantics (new columns come from the batch, never
dropped silently).

Pinned contract:
- upsert/insert with an added column: live read surfaces EVERY column
  ever written; rows from pre-evolution batches read NULL for it
- a pre-evolution ``read(version=)``/pin sees only the columns that
  existed at that version (time travel shows the schema of the time)
- bucketed delta paths: only rewritten buckets carry the new column
  physically; the mergeSchema union still NULL-fills the untouched
  buckets at read time
- the persisted spec schema widens monotonically (an empty-table read
  after evolution shows the union), and a LATER narrow batch never
  narrows it back
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.sinks.native import NativeTableSink


@pytest.fixture()
def bucketed(spark, tmp_path):
    return NativeTableSink(
        spark, str(tmp_path / "t"), num_buckets=4, bucket_by="id"
    )


def _v1(spark, n=20):
    return spark.range(0, n).select("id", F.lit("a").alias("val"))


def _v2_wide(spark, lo, hi, score=7):
    return spark.range(lo, hi).select(
        "id", F.lit("b").alias("val"), F.lit(score).alias("score")
    )


def test_unbucketed_upsert_add_column_null_fills_old_rows(spark, tmp_path):
    sink = NativeTableSink(spark, str(tmp_path / "u"))
    sink.upsert(_v1(spark), id_field="id")
    sink.upsert(_v2_wide(spark, 10, 25), id_field="id")
    live = sink.read()
    assert set(live.columns) == {"id", "val", "score"}
    rows = {r["id"]: (r["val"], r["score"]) for r in live.collect()}
    assert len(rows) == 25
    # untouched pre-evolution rows NULL-fill the new column
    assert rows[0] == ("a", None)
    # updated + new rows carry it
    assert rows[10] == ("b", 7) and rows[24] == ("b", 7)


def test_unbucketed_version_read_shows_schema_of_the_time(spark, tmp_path):
    sink = NativeTableSink(spark, str(tmp_path / "u"))
    sink.upsert(_v1(spark), id_field="id")
    with sink.snapshot() as snap:
        assert snap.version == 1
        sink.upsert(_v2_wide(spark, 10, 25), id_field="id")
        old = snap.read()
        # time travel shows the pre-evolution schema, not a NULL-padded
        # projection of the new one
        assert set(old.columns) == {"id", "val"}
        assert old.count() == 20
        assert set(sink.read().columns) == {"id", "val", "score"}


def test_bucketed_upsert_add_column_only_rewrites_touched_buckets(
    spark, bucketed, tmp_path
):
    sink = bucketed
    sink.upsert(_v1(spark, 40), id_field="id")
    # touch ONE key → exactly one bucket gets the delta rewrite
    sink.upsert(_v2_wide(spark, 0, 1), id_field="id")
    live = sink.read()
    assert set(live.columns) == {"id", "val", "score"}
    rows = {r["id"]: (r["val"], r["score"]) for r in live.collect()}
    assert len(rows) == 40
    assert rows[0] == ("b", 7)
    assert rows[39] == ("a", None)  # untouched bucket, NULL-filled
    # physical check: at least one surviving bucket file set lacks the
    # new column (proving NULL-fill happens at READ, not by rewriting
    # every bucket — the O(touched) contract)
    import glob

    files = glob.glob(str(tmp_path / "t" / "*" / "__b=*" / "*.parquet"))
    import pyarrow.parquet as pq

    col_sets = {tuple(sorted(pq.read_schema(f).names)) for f in files}
    assert any("score" not in cs for cs in col_sets)
    assert any("score" in cs for cs in col_sets)


def test_bucketed_additive_append_with_new_column(spark, bucketed):
    sink = bucketed
    sink.upsert(_v1(spark, 10), id_field="id")
    sink.insert(_v2_wide(spark, 100, 105))  # additive delta, wide rows
    live = sink.read()
    assert set(live.columns) == {"id", "val", "score"}
    assert live.count() == 15
    assert live.where("score IS NULL").count() == 10


def test_spec_schema_widens_and_never_narrows(spark, bucketed, tmp_path):
    sink = bucketed
    sink.upsert(_v1(spark, 10), id_field="id")
    sink.insert(_v2_wide(spark, 100, 103))
    # a LATER narrow batch must not narrow the persisted spec back
    sink.insert(spark.range(200, 203).select("id", F.lit("c").alias("val")))
    reopened = NativeTableSink(spark, str(tmp_path / "t"))
    import json as _json

    from pyspark.sql.types import StructType

    spec = StructType.fromJson(_json.loads(reopened._spec_schema_json))
    assert {f.name for f in spec.fields} == {"id", "val", "score"}
    # the spec is what an empty-table read uses: truncate to zero rows
    # and the declared columns must survive
    sink.trunc_insert(
        spark.createDataFrame([], "id bigint, val string, score int")
    )
    assert set(sink.read().columns) == {"id", "val", "score"}


def test_upsert_narrow_batch_against_wide_table_null_fills(spark, tmp_path):
    """The reverse direction: a batch MISSING a column upserts into a
    wider table — missing fields NULL-fill (COPY 'auto'), they never
    error and never drop the column for other rows."""
    sink = NativeTableSink(spark, str(tmp_path / "u"))
    sink.upsert(_v2_wide(spark, 0, 10), id_field="id")
    sink.upsert(
        spark.range(5, 12).select("id", F.lit("n").alias("val")),
        id_field="id",
    )
    live = sink.read()
    assert set(live.columns) == {"id", "val", "score"}
    rows = {r["id"]: (r["val"], r["score"]) for r in live.collect()}
    assert rows[0] == ("b", 7)  # untouched wide row intact
    assert rows[5] == ("n", None)  # updated by the narrow batch
    assert rows[11] == ("n", None)  # inserted by the narrow batch
