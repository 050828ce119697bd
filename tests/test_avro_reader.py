"""Tests for the stdlib-only distributed Avro reader
(sources/avro_reader.py — VERDICT r10 item 6: "light up the AVRO
path"). No avro library exists in this environment, so fixtures are
produced by the module's own ``write_container`` twin; the decode side
is additionally pinned against hand-computed byte sequences from the
Avro 1.11 spec so an encoder+decoder that are wrong the same way
cannot self-certify.

Reference surface: AVRO COPY bodies (lib/types.ts:24;
lib/RedshiftLoader.ts:388-393)."""

from __future__ import annotations

import datetime as dt

import pytest

from rs_streamloader_spark.config import CopySettings
from rs_streamloader_spark.errors import LoaderError
from rs_streamloader_spark.sources.avro_reader import (
    _Reader,
    compile_schema,
    decode_container,
    read_avro_fallback,
    write_container,
)
from rs_streamloader_spark.sources.copy_reader import read_body

FLAT = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
    ],
}
ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "ok": True, "note": "x"},
    {"id": 2, "name": "b", "score": -0.25, "ok": False, "note": None},
    {"id": 3, "name": "", "score": 0.0, "ok": True, "note": "y"},
]


# ---------------------------------------------------------------------------
# spec-pinned byte-level decode (no round-trip self-certification)
# ---------------------------------------------------------------------------
class TestSpecBytes:
    def test_zigzag_varint_decode_matches_spec_examples(self):
        # Avro spec "binary encoding" table: 0->00, -1->01, 1->02,
        # -2->03, 2->04, -64->7f, 64->80 01
        for raw, expect in [
            (b"\x00", 0), (b"\x01", -1), (b"\x02", 1), (b"\x03", -2),
            (b"\x04", 2), (b"\x7f", -64), (b"\x80\x01", 64),
        ]:
            assert _Reader(raw).long() == expect

    def test_string_and_record_decode_from_hand_bytes(self):
        # record {a: long=3, b: string="foo"}: 06 then 06 66 6f 6f
        dec, typ = compile_schema({
            "type": "record", "name": "r", "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        })
        assert dec(_Reader(b"\x06\x06foo")) == {"a": 3, "b": "foo"}
        assert [f.name for f in typ.fields] == ["a", "b"]

    def test_nullable_union_decode_from_hand_bytes(self):
        # ["null","int"]: branch 0 -> null (00); branch 1 value 5 -> 02 0a
        dec, _ = compile_schema({
            "type": "record", "name": "r", "fields": [
                {"name": "v", "type": ["null", "int"]},
            ],
        })
        assert dec(_Reader(b"\x00")) == {"v": None}
        assert dec(_Reader(b"\x02\x0a")) == {"v": 5}


# ---------------------------------------------------------------------------
# container round-trips (pure python, no Spark)
# ---------------------------------------------------------------------------
class TestContainer:
    def test_round_trip_null_codec(self):
        raw = write_container(FLAT, ROWS)
        got = [r for batch in decode_container(raw) for r in batch]
        assert got == ROWS

    def test_round_trip_deflate_codec(self):
        raw = write_container(FLAT, ROWS, codec="deflate")
        got = [r for batch in decode_container(raw) for r in batch]
        assert got == ROWS
        # deflate must actually compress a repetitive corpus
        big = [{**ROWS[0], "id": i} for i in range(500)]
        assert len(write_container(FLAT, big, codec="deflate")) < len(
            write_container(FLAT, big)
        )

    def test_multi_block_files_decode_completely(self):
        rows = [{**ROWS[0], "id": i} for i in range(10)]
        raw = write_container(FLAT, rows, records_per_block=3)
        got = [r for batch in decode_container(raw) for r in batch]
        assert [r["id"] for r in got] == list(range(10))

    def test_sync_marker_corruption_detected(self):
        raw = bytearray(write_container(FLAT, ROWS))
        raw[-1] ^= 0xFF  # trailing sync byte
        with pytest.raises(ValueError, match="sync marker"):
            list(decode_container(bytes(raw)))

    def test_writer_schema_mismatch_detected(self):
        other = {"type": "record", "name": "r",
                 "fields": [{"name": "id", "type": "long"}]}
        raw = write_container(other, [{"id": 1}])
        with pytest.raises(ValueError, match="schema differs"):
            list(decode_container(raw, expected_schema=FLAT))

    def test_empty_file_yields_no_records(self):
        assert list(decode_container(write_container(FLAT, []))) == []

    def test_logical_types_round_trip(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tms", "type": {
                "type": "long", "logicalType": "timestamp-millis"}},
            {"name": "tus", "type": {
                "type": "long", "logicalType": "timestamp-micros"}},
        ]}
        utc = dt.timezone.utc
        row = {
            "d": dt.date(2024, 2, 29),
            "tms": dt.datetime(2024, 2, 29, 12, 30, 0, 250000, tzinfo=utc),
            "tus": dt.datetime(2024, 2, 29, 12, 30, 0, 250007, tzinfo=utc),
        }
        raw = write_container(schema, [row])
        got = [r for b in decode_container(raw) for r in b]
        assert got == [row]

    def test_enum_fixed_array_map_round_trip(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "e", "type": {
                "type": "enum", "name": "col", "symbols": ["RED", "BLUE"]}},
            {"name": "f", "type": {"type": "fixed", "name": "f4", "size": 4}},
            {"name": "xs", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ]}
        row = {"e": "BLUE", "f": b"\x01\x02\x03\x04",
               "xs": [1, -2, 3], "m": {"k1": 10, "k2": -20}}
        raw = write_container(schema, [row])
        got = [r for b in decode_container(raw) for r in b]
        assert got == [row]

    def test_multi_branch_union_raises_clean_gate(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "v", "type": ["int", "string"]},
        ]}
        with pytest.raises(LoaderError) as exc:
            compile_schema(schema)
        assert exc.value.code == "AVRO_UNSUPPORTED"

    def test_decimal_logical_type_raises_clean_gate(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "v", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 10, "scale": 2}},
        ]}
        with pytest.raises(LoaderError) as exc:
            compile_schema(schema)
        assert exc.value.code == "AVRO_UNSUPPORTED"


# ---------------------------------------------------------------------------
# the distributed read path
# ---------------------------------------------------------------------------
class TestSparkRead:
    def test_multi_file_distributed_read(self, spark, tmp_path):
        # files are the parallel grain: each binaryFile row decodes
        # independently inside mapInPandas
        for i in range(4):
            rows = [{**ROWS[0], "id": 100 * i + j} for j in range(25)]
            (tmp_path / f"part{i}.avro").write_bytes(
                write_container(FLAT, rows, codec="deflate")
            )
        df = read_avro_fallback(spark, str(tmp_path))
        assert df.count() == 100
        assert df.schema["id"].dataType.simpleString() == "bigint"
        assert df.schema["note"].dataType.simpleString() == "string"
        got = sorted(r["id"] for r in df.collect())
        assert got == sorted(100 * i + j for i in range(4) for j in range(25))

    def test_explicit_schema_projects_and_casts(self, spark, tmp_path):
        (tmp_path / "a.avro").write_bytes(write_container(FLAT, ROWS))
        df = read_avro_fallback(
            spark, str(tmp_path / "a.avro"), schema="id INT, score DOUBLE"
        )
        assert df.columns == ["id", "score"]
        assert df.schema["id"].dataType.simpleString() == "int"
        assert {r["id"] for r in df.collect()} == {1, 2, 3}

    def test_nullable_union_nulls_survive_arrow(self, spark, tmp_path):
        (tmp_path / "a.avro").write_bytes(write_container(FLAT, ROWS))
        got = {r["id"]: r["note"]
               for r in read_avro_fallback(spark, str(tmp_path)).collect()}
        assert got == {1: "x", 2: None, 3: "y"}

    def test_timestamps_are_instants_not_session_local(self, spark, tmp_path):
        """Avro timestamps are UTC instants; the decoded value must not
        shift with spark.sql.session.timeZone (the jar path doesn't)."""
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "t", "type": {
                "type": "long", "logicalType": "timestamp-micros"}},
        ]}
        micros = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
        row = {"t": dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
               + dt.timedelta(microseconds=micros)}
        (tmp_path / "a.avro").write_bytes(write_container(schema, [row]))
        from pyspark.sql import functions as F

        old_tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            got = {}
            for tz in ("UTC", "America/New_York"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                got[tz] = (
                    read_avro_fallback(spark, str(tmp_path / "a.avro"))
                    .select(F.unix_micros("t").alias("u"))
                    .head()["u"]
                )
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)
        assert got["UTC"] == got["America/New_York"] == micros, got

    def test_loader_end_to_end_avro_body_to_native_sink(self, spark, tmp_path):
        """The reference flow: staged AVRO parts COPY into the target
        (RedshiftLoader.ts:388-393) — here: read_body → Loader.insert
        → native table."""
        from rs_streamloader_spark.loader import Loader
        from rs_streamloader_spark.sinks.native import NativeTableSink

        src_dir = tmp_path / "body"
        src_dir.mkdir()
        (src_dir / "p.avro").write_bytes(write_container(FLAT, ROWS))
        body = read_body(spark, str(src_dir), CopySettings(format="AVRO"))
        sink = NativeTableSink(spark, str(tmp_path / "tbl"))
        ld = Loader(
            spark,
            options={"table": "wh.avro_facts", "s3_cleanup": "ALWAYS",
                     "staging_format": "parquet"},
            staging_root=str(tmp_path / "stage"),
            sink=sink,
            body=body,
        )
        assert ld.insert() == "SUCCESS"
        out = {r["id"]: r["name"] for r in sink.read().collect()}
        assert out == {1: "a", 2: "b", 3: ""}


# ---------------------------------------------------------------------------
# r12: NaN fidelity, clean header gates, monolith warning
# ---------------------------------------------------------------------------
class TestR12Gates:
    def test_nan_payloads_survive_as_nan(self, spark, tmp_path):
        """ADVICE r11 (medium): the mapInPandas version decoded IEEE
        NaN to NULL (pandas null sentinel), silently diverging from
        the jar path. With mapInArrow + explicitly-typed arrays, NaN
        must survive as NaN and NULL stay NULL — distinguishable."""
        import math

        schema = {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "nd", "type": ["null", "double"]},
        ]}
        rows = [
            {"id": 1, "d": float("nan"), "f": float("nan"), "nd": None},
            {"id": 2, "d": 2.5, "f": 1.5, "nd": float("nan")},
        ]
        (tmp_path / "a.avro").write_bytes(write_container(schema, rows))
        got = {r["id"]: r for r in
               read_avro_fallback(spark, str(tmp_path)).collect()}
        assert math.isnan(got[1]["d"]) and math.isnan(got[1]["f"])
        assert got[1]["nd"] is None          # real null stays null
        assert math.isnan(got[2]["nd"])      # NaN in a nullable union
        assert got[2]["d"] == 2.5

    def test_bad_magic_raises_loader_error_naming_file(self, spark, tmp_path):
        (tmp_path / "junk.avro").write_bytes(b"PAR1" + b"\x00" * 64)
        with pytest.raises(LoaderError) as exc:
            read_avro_fallback(spark, str(tmp_path))
        assert exc.value.code == "AVRO_UNSUPPORTED"
        assert "junk.avro" in str(exc.value)

    def test_schema_disagreement_fails_clean_at_prepass(self, spark, tmp_path):
        """Two parts with different writer schemas must fail as a
        driver-side LoaderError naming the file (previously: lazy
        executor PythonException)."""
        other = {"type": "record", "name": "row", "fields": [
            {"name": "id", "type": "long"}]}
        (tmp_path / "a.avro").write_bytes(write_container(FLAT, ROWS))
        (tmp_path / "b.avro").write_bytes(
            write_container(other, [{"id": 9}]))
        with pytest.raises(LoaderError) as exc:
            read_avro_fallback(spark, str(tmp_path))
        assert exc.value.code == "AVRO_UNSUPPORTED"
        assert "differs between parts" in str(exc.value)

    def test_unsupported_codec_in_later_part_fails_clean(self, spark, tmp_path):
        """A snappy part hiding behind a null-codec first part used to
        fail lazily in the executor; the pre-pass must gate it on the
        driver, naming the file."""
        (tmp_path / "a.avro").write_bytes(write_container(FLAT, ROWS))
        good = write_container(FLAT, ROWS)
        # swap the length-prefixed codec value: 0x08"null" -> 0x0c"snappy"
        patched = good.replace(b"\x08null", b"\x0csnappy", 1)
        assert patched != good
        (tmp_path / "b.avro").write_bytes(patched)
        with pytest.raises(LoaderError) as exc:
            read_avro_fallback(spark, str(tmp_path))
        assert exc.value.code == "AVRO_UNSUPPORTED"
        assert "b.avro" in str(exc.value) and "snappy" in str(exc.value)

    def test_monolith_file_splits_into_parallel_tasks(
        self, spark, tmp_path, caplog, monkeypatch
    ):
        """VERDICT r11 item 4, upgraded r12: a local giant OCF no
        longer decodes on one core — it is tiled into sync-marker
        splits (one task each), logged at INFO, and decodes
        completely. Thresholds patched down so the test file stays
        small."""
        import logging as _logging

        import rs_streamloader_spark.sources.avro_reader as ar

        monkeypatch.setattr(ar, "_MONOLITH_WARN_BYTES", 64)
        monkeypatch.setattr(ar, "_SPLIT_BYTES", 64)
        (tmp_path / "big.avro").write_bytes(
            write_container(FLAT, ROWS, records_per_block=1)
        )
        with caplog.at_level(_logging.INFO, logger=ar.__name__):
            df = read_avro_fallback(spark, str(tmp_path))
            got = sorted(r["id"] for r in df.collect())
        assert got == sorted(r["id"] for r in ROWS)
        assert df.rdd.getNumPartitions() > 1  # genuinely parallel
        assert any(
            "big.avro" in r.getMessage() and "splits" in r.getMessage()
            for r in caplog.records
        ), [r.getMessage() for r in caplog.records]

    def test_nonlocal_monolith_still_warns_one_core(
        self, spark, tmp_path, caplog, monkeypatch
    ):
        """When the parts are NOT seekable from Python (s3a/hdfs), the
        per-file grain remains and the oversized warning must stay
        loud. Locality detection is forced off to exercise that path
        end-to-end (binaryFile probe + whole-file decode included)."""
        import logging as _logging

        import rs_streamloader_spark.sources.avro_reader as ar

        monkeypatch.setattr(ar, "_MONOLITH_WARN_BYTES", 64)
        monkeypatch.setattr(ar, "_parts_are_local", lambda parts: False)
        (tmp_path / "big.avro").write_bytes(write_container(FLAT, ROWS))
        with caplog.at_level(_logging.WARNING, logger=ar.__name__):
            df = read_avro_fallback(spark, str(tmp_path))
            assert df.count() == len(ROWS)  # warns, still decodes
        assert any(
            "big.avro" in r.getMessage() and "ONE core" in r.getMessage()
            for r in caplog.records
        ), [r.getMessage() for r in caplog.records]

    def test_split_tiling_exact_at_every_split_size(
        self, spark, tmp_path, monkeypatch
    ):
        """The sync-scan ownership tiling must be EXACT — no block
        decoded twice, none dropped — at split sizes smaller than a
        block, straddling blocks, and larger than the file; including
        a deflate-coded file and a multi-file mix."""
        import rs_streamloader_spark.sources.avro_reader as ar

        (tmp_path / "a.avro").write_bytes(
            write_container(FLAT, ROWS, records_per_block=2)
        )
        more = [
            {
                "id": 100 + i,
                "name": f"extra{i}",
                "score": float(i),
                "ok": i % 2 == 0,
                "note": None if i % 3 == 0 else f"n{i}",
            }
            for i in range(7)
        ]
        (tmp_path / "b.avro").write_bytes(
            write_container(FLAT, more, codec="deflate", records_per_block=3)
        )
        expect = sorted(r["id"] for r in ROWS + more)
        for split in (17, 64, 200, 10**9):
            monkeypatch.setattr(ar, "_SPLIT_BYTES", split)
            got = sorted(
                r["id"]
                for r in read_avro_fallback(spark, str(tmp_path)).collect()
            )
            assert got == expect, f"split={split}: {got}"

    def test_split_corruption_still_detected(self, spark, tmp_path, monkeypatch):
        """A flipped byte inside a block body must still fail loudly
        (sync mismatch / decode error) through the split reader."""
        import rs_streamloader_spark.sources.avro_reader as ar

        monkeypatch.setattr(ar, "_SPLIT_BYTES", 64)
        raw = bytearray(write_container(FLAT, ROWS, records_per_block=1))
        raw[-8] ^= 0xFF  # inside the final 16-byte sync marker
        (tmp_path / "bad.avro").write_bytes(bytes(raw))
        with pytest.raises(Exception, match="AVRO_UNSUPPORTED|decode failed"):
            read_avro_fallback(spark, str(tmp_path)).collect()

    def test_small_files_do_not_warn(self, spark, tmp_path, caplog):
        import logging as _logging

        import rs_streamloader_spark.sources.avro_reader as ar

        (tmp_path / "a.avro").write_bytes(write_container(FLAT, ROWS))
        with caplog.at_level(_logging.WARNING, logger=ar.__name__):
            read_avro_fallback(spark, str(tmp_path)).count()
        assert not [r for r in caplog.records if "ONE core" in r.getMessage()]
