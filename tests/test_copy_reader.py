"""COPY-knob reader parity tests (SURVEY.md §1.2): format options,
IGNOREHEADER, MAXERROR budget, TIMEFORMAT, TRUNCATECOLUMNS, encoding.
Reference behavior: /root/reference/lib/types.ts:24-50,
lib/RedshiftLoader.ts:351-363."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.config import CopySettings
from rs_streamloader_spark.errors import LoaderError
from rs_streamloader_spark.sources import (
    apply_time_format,
    read_body,
    truncate_columns,
)
from rs_streamloader_spark.sources.copy_reader import MAX_ERROR_EXCEEDED


def _write(path, text: str, encoding: str = "utf-8") -> str:
    path.write_text(text, encoding=encoding)
    return str(path)


def test_csv_quote_delimiter_header(spark, tmp_path):
    p = _write(
        tmp_path / "t.csv",
        'id|name\n1|"al|pha"\n2|beta\n',
    )
    cs = CopySettings(format="CSV", delimiter="|", quote='"', ignore_header=1)
    df = read_body(spark, p, cs, schema="id INT, name STRING")
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "al|pha", 2: "beta"}


def test_ignore_header_multi_line_rejected(spark, tmp_path):
    p = _write(tmp_path / "t.csv", "a\nb\n1\n")
    with pytest.raises(ValueError, match="IGNOREHEADER"):
        read_body(spark, p, CopySettings(format="CSV", ignore_header=2))


def test_max_error_zero_failfast(spark, tmp_path):
    p = _write(tmp_path / "bad.json", '{"id": 1}\n{broken\n')
    with pytest.raises(Exception):  # Spark FAILFAST surfaces a parse error
        read_body(spark, p, CopySettings(format="JSON"), schema="id INT").collect()


def test_max_error_budget_allows_and_drops(spark, tmp_path):
    p = _write(tmp_path / "mixed.json", '{"id": 1}\n{broken\n{"id": 3}\n')
    df = read_body(spark, p, CopySettings(format="JSON", max_error=1), schema="id INT")
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_max_error_budget_exceeded(spark, tmp_path):
    p = _write(tmp_path / "worse.json", '{"id": 1}\n{broken\nalso broken\n')
    with pytest.raises(LoaderError) as exc:
        read_body(
            spark, p, CopySettings(format="JSON", max_error=1), schema="id INT"
        ).collect()
    assert exc.value.code == MAX_ERROR_EXCEEDED


def test_max_error_requires_schema(spark, tmp_path):
    p = _write(tmp_path / "x.json", '{"id": 1}\n')
    with pytest.raises(ValueError, match="schema"):
        read_body(spark, p, CopySettings(format="JSON", max_error=1))


def test_read_body_applies_time_format_to_timestamp_columns(spark, tmp_path):
    p = _write(tmp_path / "e.json", '{"id": 1, "ts": 1483228800}\n')
    cs = CopySettings(format="JSON", time_format="epochsecs")
    df = read_body(spark, p, cs, schema="id INT, ts TIMESTAMP")
    assert dict(df.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as FF

    assert (
        df.select(FF.date_format("ts", "yyyy-MM-dd").alias("d")).first()["d"]
        == "2017-01-01"
    )


def test_copy_settings_unknown_key_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="maxerror"):
        CopySettings().merged_with({"maxerror": 5})


def test_time_format_epoch_variants(spark):
    df = spark.createDataFrame(
        [(1, "1483228800", "1483228800500")], "id INT, secs STRING, millis STRING"
    )
    out = apply_time_format(
        apply_time_format(df, ["secs"], "epochsecs"), ["millis"], "epochmillisecs"
    ).select(
        F.date_format("secs", "yyyy-MM-dd HH:mm:ss").alias("s"),
        F.date_format("millis", "yyyy-MM-dd HH:mm:ss.SSS").alias("m"),
    )
    row = out.first()
    assert row["s"] == "2017-01-01 00:00:00"
    assert row["m"] == "2017-01-01 00:00:00.500"


def test_time_format_redshift_pattern(spark):
    df = spark.createDataFrame([("2017/01/02 13:45:59",)], "ts STRING")
    out = apply_time_format(df, ["ts"], "YYYY/MM/DD HH24:MI:SS")
    assert (
        out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("x")).first()["x"]
        == "2017-01-02 13:45:59"
    )


def test_truncate_columns(spark):
    df = spark.createDataFrame([(1, "abcdefgh", "xy")], "id INT, a STRING, b STRING")
    row = truncate_columns(df, 4).first()
    assert (row["id"], row["a"], row["b"]) == (1, "abcd", "xy")


def test_encoding_utf16le(spark, tmp_path):
    p = tmp_path / "t16.csv"
    p.write_bytes('id;name\n1;héllo\n'.encode("utf-16-le"))
    cs = CopySettings(format="CSV", delimiter=";", ignore_header=1, encoding="UTF16LE")
    df = read_body(spark, str(p), cs, schema="id INT, name STRING")
    assert df.first()["name"] == "héllo"


def test_align_columns_auto_nulls_unmatched(spark):
    from pyspark.sql.types import StructType

    from rs_streamloader_spark.sources import align_columns

    df = spark.createDataFrame([(1, "x", 9.5)], "id INT, name STRING, extra DOUBLE")
    target = StructType.fromDDL("id BIGINT, name STRING, missing INT")
    out = align_columns(df, target, "auto")
    assert out.columns == ["id", "name", "missing"]
    row = out.first()
    assert (row["id"], row["name"], row["missing"]) == (1, "x", None)
    assert dict(out.dtypes)["id"] == "bigint"  # cast to target type


def test_align_columns_ignorecase(spark):
    from pyspark.sql.types import StructType

    from rs_streamloader_spark.sources import align_columns

    df = spark.createDataFrame([(1, "x")], "ID INT, Name STRING")
    target = StructType.fromDDL("id INT, name STRING")
    # strict auto: no match (Spark schema is case-preserving)
    strict = align_columns(df, target, "auto").first()
    assert strict["id"] is None
    relaxed = align_columns(df, target, "auto ignorecase").first()
    assert (relaxed["id"], relaxed["name"]) == (1, "x")


def test_align_columns_jsonpaths_positional(spark):
    from pyspark.sql.types import StructType

    from rs_streamloader_spark.sources import align_columns

    df = spark.createDataFrame([(7, "n", 2.5)], "a INT, b STRING, c DOUBLE")
    target = StructType.fromDDL("x INT, y STRING, z DOUBLE")
    jp = '{"jsonpaths": ["$.a", "$[\'b\']", "$.c"]}'
    row = align_columns(df, target, "jsonpaths", jp).first()
    assert (row["x"], row["y"], row["z"]) == (7, "n", 2.5)


def test_loader_applies_ignorecase_on_insert(spark, tmp_path):
    from rs_streamloader_spark.loader import Loader
    from rs_streamloader_spark.sinks.native import NativeTableSink

    sink = NativeTableSink(spark, str(tmp_path / "tbl"))
    sink.insert(spark.createDataFrame([(1, "seed")], "id INT, name STRING"))
    loader = Loader(
        spark,
        options={
            "table": "t",
            "copy_settings": {"column_map": "auto ignorecase"},
        },
        sink=sink,
        staging_root=str(tmp_path / "stage"),
    )
    loader.add_source([{"ID": 2, "NAME": "upper"}])
    assert loader.insert() == "SUCCESS"
    rows = {r["id"]: r["name"] for r in sink.read().collect()}
    assert rows == {1: "seed", 2: "upper"}


def test_align_columns_jsonpaths_nested_path_binds_struct_field(spark):
    from pyspark.sql.types import StructType

    from rs_streamloader_spark.sources import align_columns

    df = spark.createDataFrame(
        [(99, (7, "x"))], "id INT, meta STRUCT<id: INT, tag: STRING>"
    )
    target = StructType.fromDDL("meta_id INT, tag STRING")
    row = align_columns(df, target, "jsonpaths",
                        '{"jsonpaths": ["$.meta.id", "$.meta.tag"]}').first()
    # $.meta.id must bind the nested field, not the top-level id=99
    assert (row["meta_id"], row["tag"]) == (7, "x")


def test_align_columns_unknown_mode_raises(spark):
    from pyspark.sql.types import StructType

    from rs_streamloader_spark.sources import align_columns

    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ValueError, match="column_map"):
        align_columns(df, StructType.fromDDL("id INT"), "ignorecase")


def test_unparseable_timeformat_counts_against_max_error(spark, tmp_path):
    p = _write(
        tmp_path / "ts.json",
        '{"id": 1, "ts": "1483228800"}\n{"id": 2, "ts": "not-a-number"}\n',
    )
    # budget 0: the bad timestamp must fail the load, not load as NULL
    with pytest.raises(LoaderError):
        read_body(
            spark, p, CopySettings(format="JSON", time_format="epochsecs"),
            schema="id INT, ts TIMESTAMP",
        ).collect()
    # budget 1: bad row dropped, good row converted
    df = read_body(
        spark, p, CopySettings(format="JSON", time_format="epochsecs", max_error=1),
        schema="id INT, ts TIMESTAMP",
    )
    rows = df.collect()
    assert [r["id"] for r in rows] == [1]
    assert rows[0]["ts"] is not None


def test_timeformat_preserves_declared_ntz_type(spark, tmp_path):
    p = _write(tmp_path / "ntz.json", '{"id": 1, "ts": "1483228800"}\n')
    df = read_body(
        spark, p, CopySettings(format="JSON", time_format="epochsecs"),
        schema="id INT, ts TIMESTAMP_NTZ",
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_parquet_passthrough(spark, tmp_path):
    src = spark.createDataFrame([(1, "a")], "id INT, v STRING")
    dest = str(tmp_path / "p")
    src.write.parquet(dest)
    df = read_body(spark, dest, CopySettings(format="PARQUET"))
    assert df.count() == 1


def test_avro_unsupported_codec_raises_clean_loader_error(spark, tmp_path):
    """AVRO is a valid reference COPY format (lib/types.ts:24). The
    stdlib fallback (r11) decodes null/deflate; anything needing an
    external lib must still surface a clean driver-side LoaderError,
    not a lazy executor PythonException."""
    from rs_streamloader_spark.errors import LoaderError
    from rs_streamloader_spark.sources.avro_reader import write_container
    from rs_streamloader_spark.sources.copy_reader import AVRO_UNSUPPORTED

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "id", "type": "long"}]}
    raw = write_container(schema, [{"id": 1}])
    # flip the codec metadata value in place: "null" -> "zstd" (same
    # length, so the length-prefixed OCF metadata stays well-formed)
    raw = raw.replace(b"\x08null", b"\x08zstd")
    p = tmp_path / "a.avro"
    p.write_bytes(raw)
    with pytest.raises(LoaderError) as exc:
        read_body(spark, str(p), CopySettings(format="AVRO")).count()
    assert exc.value.code == AVRO_UNSUPPORTED
    assert "zstd" in str(exc.value)


def test_read_body_json_auto_ignorecase_matches_keys(spark, tmp_path):
    """Reader-level 'auto ignorecase' (lib/types.ts:32-40): JSON keys
    with different casing populate the target columns — on the plain
    schema'd read they would silently parse as NULL."""
    p = tmp_path / "b.json"
    p.write_text('{"ID": 1, "Text": "a"}\n{"ID": 2, "Text": "b"}\n')
    schema = "id BIGINT, text STRING"
    out = read_body(
        spark, str(p), CopySettings(format="JSON"), schema,
        column_map="auto ignorecase",
    )
    rows = {r["id"]: r["text"] for r in out.collect()}
    assert rows == {1: "a", 2: "b"}
    assert [f.name for f in out.schema.fields] == ["id", "text"]


def test_read_body_ignorecase_applies_timeformat(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('{"TS": 1500000000, "v": 1}\n')
    out = read_body(
        spark,
        str(p),
        CopySettings(format="JSON", time_format="epochsecs"),
        "ts TIMESTAMP, v BIGINT",
        column_map="auto ignorecase",
    )
    row = out.collect()[0]
    assert row["ts"].year == 2017 and row["v"] == 1


def test_ignorecase_bad_timeformat_charges_max_error(spark, tmp_path):
    """ADVICE r2 (medium): on 'auto ignorecase', an unparseable
    TIMEFORMAT value must count against MAXERROR exactly like the
    exact-case path — with the default max_error=0 the load FAILS
    instead of silently loading a NULL where data was present."""
    p = tmp_path / "t.json"
    p.write_text('{"TS": "1500000000", "v": 1}\n{"TS": "nope", "v": 2}\n')
    with pytest.raises(LoaderError) as exc:
        read_body(
            spark,
            str(p),
            CopySettings(format="JSON", time_format="epochsecs"),
            "ts TIMESTAMP, v BIGINT",
            column_map="auto ignorecase",
        ).collect()
    assert exc.value.code == MAX_ERROR_EXCEEDED
    # within budget: the bad row is DROPPED (Redshift error-row
    # semantics), the good row converts
    out = read_body(
        spark,
        str(p),
        CopySettings(format="JSON", time_format="epochsecs", max_error=1),
        "ts TIMESTAMP, v BIGINT",
        column_map="auto ignorecase",
    )
    rows = out.collect()
    assert [r["v"] for r in rows] == [1] and rows[0]["ts"].year == 2017


def test_ignorecase_parse_and_timeformat_share_budget(spark, tmp_path):
    """One malformed JSON row + one bad timestamp = 2 errors against a
    budget of 1 → the load fails (shared MAXERROR pool, like COPY)."""
    p = tmp_path / "t.json"
    p.write_text(
        '{"TS": "1500000000", "v": 1}\n'
        "{not json at all\n"
        '{"TS": "nope", "v": 3}\n'
    )
    with pytest.raises(LoaderError) as exc:
        read_body(
            spark,
            str(p),
            CopySettings(format="JSON", time_format="epochsecs", max_error=1),
            "ts TIMESTAMP, v BIGINT",
            column_map="auto ignorecase",
        ).collect()
    assert exc.value.code == MAX_ERROR_EXCEEDED
    # budget 2 absorbs both: only the fully-good row loads
    out = read_body(
        spark,
        str(p),
        CopySettings(format="JSON", time_format="epochsecs", max_error=2),
        "ts TIMESTAMP, v BIGINT",
        column_map="auto ignorecase",
    )
    assert [r["v"] for r in out.collect()] == [1]


def test_avro_reads_via_module_or_fallback(spark, tmp_path):
    """The AVRO path is a classpath probe, not a hardcoded refusal:
    with spark-avro present the jar reads; without it the stdlib
    fallback decoder does (VERDICT r2 item 7 + r10 item 6). Both
    branches produce the same rows."""
    from rs_streamloader_spark.sources.avro_reader import write_container
    from rs_streamloader_spark.sources.copy_reader import avro_supported

    if avro_supported(spark):
        src = spark.createDataFrame([(1, "a")], "id INT, v STRING")
        dest = str(tmp_path / "a")
        src.write.format("avro").save(dest)
        got = read_body(spark, dest, CopySettings(format="AVRO"))
    else:
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "int"},
            {"name": "v", "type": "string"},
        ]}
        (tmp_path / "a.avro").write_bytes(
            write_container(schema, [{"id": 1, "v": "a"}])
        )
        got = read_body(spark, str(tmp_path / "a.avro"),
                        CopySettings(format="AVRO"))
    assert [(r["id"], r["v"]) for r in got.collect()] == [(1, "a")]


def test_ignorecase_engages_on_loader_path(spark, tmp_path):
    """CopySettings.column_map must flow through to_dataframe →
    read_body so the Loader's path bodies get reader-level ignorecase
    (code-review r2: it was silently dropped, loading NULLs)."""
    from rs_streamloader_spark.sources.normalize import to_dataframe

    p = tmp_path / "b.json"
    p.write_text('{"ID": 1, "Text": "a"}\n')
    df = to_dataframe(
        spark,
        str(p),
        schema="id BIGINT, text STRING",
        copy_settings=CopySettings(format="JSON", column_map="auto ignorecase"),
    )
    assert df.collect()[0].asDict() == {"id": 1, "text": "a"}


def test_ignorecase_with_max_error_budget(spark, tmp_path):
    """MAXERROR + ignorecase must compose: malformed rows count
    against the budget on the inference path too."""
    from rs_streamloader_spark.errors import LoaderError

    p = tmp_path / "b.json"
    p.write_text('{"ID": 1, "Text": "a"}\nnot json at all{{\n{"ID": 2, "Text": "b"}\n')
    out = read_body(
        spark, str(p), CopySettings(format="JSON", max_error=1),
        "id BIGINT, text STRING", column_map="auto ignorecase",
    )
    assert {r["id"]: r["text"] for r in out.collect()} == {1: "a", 2: "b"}
    # budget blown → LoaderError (2 bad rows vs max_error=1)
    p.write_text('{"ID": 1}\nbad{{\nworse}}\n')
    with pytest.raises(LoaderError):
        read_body(
            spark, str(p), CopySettings(format="JSON", max_error=1),
            "id BIGINT, text STRING", column_map="auto ignorecase",
        ).collect()
    # max_error=0 keeps FAILFAST semantics (parity with the exact path)
    with pytest.raises(Exception):
        read_body(
            spark, str(p), CopySettings(format="JSON", max_error=0),
            "id BIGINT, text STRING", column_map="auto ignorecase",
        ).collect()


def test_max_error_budget_shared_across_parse_and_timeformat(spark, tmp_path):
    """Parse failures and bad TIMEFORMAT values share ONE MAXERROR
    budget, like Redshift COPY — not a fresh allowance each."""
    p = tmp_path / "m.json"
    p.write_text(
        '{"id": 1, "ts": "1483228800"}\n'
        "broken{{\n"
        '{"id": 2, "ts": "not-a-number"}\n'
    )
    cs = CopySettings(format="JSON", max_error=2, time_format="epochsecs")
    out = read_body(spark, str(p), cs, schema="id INT, ts TIMESTAMP")
    assert [r["id"] for r in out.collect()] == [1]
    # budget 1: parse failure consumes it, the bad timestamp overflows
    cs1 = CopySettings(format="JSON", max_error=1, time_format="epochsecs")
    with pytest.raises(LoaderError) as exc:
        read_body(spark, str(p), cs1, schema="id INT, ts TIMESTAMP")
    assert exc.value.code == MAX_ERROR_EXCEEDED


def test_marker_word_count_escapes_regex_metachars(spark):
    from rs_streamloader_spark.functions import marker_word_count

    df = spark.createDataFrame([("we like c++ and c++ a lot",)], "text STRING")
    assert df.select(marker_word_count("c++").alias("n")).first()["n"] == 2
    assert df.select(marker_word_count("u.s").alias("n")).first()["n"] == 0
