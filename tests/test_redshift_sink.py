"""End-to-end Loader → RedshiftSink flow with a fake pool — the Spark
analogue of the reference's whole-loader specs
(/root/reference/lib/RedshiftLoader.spec.ts: mocked S3 + fake pg pool).
Staging is real (local FS parts + manifest); the warehouse is faked."""

from __future__ import annotations

import json
import re

import pytest

from rs_streamloader_spark.errors import LoaderError
from rs_streamloader_spark.loader import Loader
from rs_streamloader_spark.sinks.redshift import RedshiftSink

ROWS_A = [{"id": 1, "text": "a", "number": 1.5}, {"id": 2, "text": "b", "number": 2.5}]
ROWS_B = [{"id": 3, "text": "UPSERT", "number": 3.5}]

AWS = {"access_key_id": "AKIATEST", "secret_access_key": "SECRETTEST"}


class FakeClient:
    def __init__(self, log, fail_on=None):
        self.log = log
        self.fail_on = fail_on

    def query(self, sql):
        self.log.append(sql)
        if self.fail_on and self.fail_on in sql:
            raise RuntimeError(f"injected failure at: {self.fail_on}")
        return None

    def release(self):
        pass


def make_pool(log, fail_on=None):
    return lambda: FakeClient(log, fail_on)


def make_loader(spark, tmp_path, sink, **opts):
    return Loader(
        spark,
        options={"table": "public.test_table", "id_field": "id", **opts},
        sink=sink,
        staging_root=str(tmp_path / "stage"),
    )


def test_insert_runs_single_copy_against_manifest(spark, tmp_path):
    log: list[str] = []
    sink = RedshiftSink(make_pool(log), "public.test_table", aws=AWS)
    loader = make_loader(spark, tmp_path, sink, s3_cleanup="NEVER")
    loader.add_sources([ROWS_A, ROWS_B])
    assert loader.insert() == "SUCCESS"

    assert len(log) == 1
    copy = log[0]
    assert copy.startswith("COPY public.test_table FROM '")
    assert "MANIFEST" in copy and "JSON 'auto'" in copy and "MAXERROR 0" in copy
    assert "aws_access_key_id=AKIATEST" in copy

    # the manifest the COPY points at lists the real staged parts
    manifest_url = copy.split("FROM '")[1].split("'")[0]
    manifest = json.loads(open(manifest_url.replace("file:", "")).read())
    assert manifest["entries"] and all(e["mandatory"] for e in manifest["entries"])


def test_upsert_reference_query_sequence(spark, tmp_path):
    log: list[str] = []
    sink = RedshiftSink(
        make_pool(log), "public.test_table", loading_table="loading.test_table", aws=AWS
    )
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    assert loader.upsert() == "SUCCESS"

    # RedshiftLoader.ts:369-384 sequence; the configured loading table
    # is only a base name — the actual temp table is uniquified per load
    # ({base}_temp_{jobtime}_{uuid}, RedshiftLoader.ts:343-350)
    assert log[0] == "BEGIN;"
    m = re.fullmatch(
        r"DROP TABLE IF EXISTS (loading\.test_table_temp_\d{8}_\d{6}_[0-9a-f]{8});",
        log[1],
    )
    assert m, log[1]
    temp = m.group(1)
    assert log[2] == f"CREATE TABLE {temp} (LIKE public.test_table);"
    assert log[3].startswith(f"COPY {temp} FROM '")
    assert (
        log[4]
        == f"DELETE FROM public.test_table WHERE id IN (SELECT id FROM {temp});"
    )
    assert log[5] == f"INSERT INTO public.test_table SELECT * FROM {temp};"
    assert log[6] == f"DROP TABLE {temp};"
    assert log[7] == "COMMIT;"


def test_concurrent_upserts_never_share_or_drop_configured_loading_table(
    spark, tmp_path
):
    """Two loads against the same configured loading_table must use
    distinct temp tables and never DROP the configured name itself
    (ADVICE r1: concurrent upserts sharing a config collided)."""
    log: list[str] = []
    sink = RedshiftSink(
        make_pool(log), "public.test_table", loading_table="loading.test_table", aws=AWS
    )
    for sub in ("a", "b"):
        loader = make_loader(spark, tmp_path / sub, sink)
        loader.add_source(ROWS_A)
        assert loader.upsert() == "SUCCESS"
    drops = [q for q in log if q.startswith("DROP TABLE IF EXISTS ")]
    assert len(drops) == 2 and drops[0] != drops[1]
    assert "DROP TABLE IF EXISTS loading.test_table;" not in log
    assert "DROP TABLE loading.test_table;" not in log


def test_trunc_insert_sequence(spark, tmp_path):
    log: list[str] = []
    sink = RedshiftSink(make_pool(log), "public.test_table", aws=AWS)
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    assert loader.trunc_insert() == "SUCCESS"
    assert log[0] == "TRUNCATE public.test_table;"
    assert log[1].startswith("COPY public.test_table FROM '")


def test_failure_rolls_back_and_runs_cleanup(spark, tmp_path):
    log: list[str] = []
    sink = RedshiftSink(
        make_pool(log, fail_on="DELETE FROM"),
        "public.test_table",
        loading_table="loading.test_table",
        aws=AWS,
    )
    loader = make_loader(spark, tmp_path, sink, s3_cleanup="ALWAYS")
    loader.add_source(ROWS_A)
    errors: list = []
    loader.on("error", errors.append)
    with pytest.raises(RuntimeError, match="injected failure"):
        loader.upsert()
    assert "ROLLBACK;" in log
    # standalone clean-up query after rollback (core.ts:32-39)
    assert log[-1].startswith("DROP TABLE IF EXISTS loading.test_table_temp_")
    assert errors  # loader emitted the error event
    # ALWAYS policy removed the stage despite the failure
    from rs_streamloader_spark.staging import list_committed_files

    assert list_committed_files(spark, loader.stage_prefix) == []


def test_stl_load_errors_probe_surfaces_details(spark, tmp_path):
    log: list[str] = []

    class ProbeClient(FakeClient):
        def query(self, sql):
            self.log.append(sql)
            if sql.startswith("COPY "):
                raise RuntimeError("load failed, check stl_load_errors")
            if "FROM stl_load_errors" in sql:
                return {"err_reason": "Invalid digit"}
            return None

    sink = RedshiftSink(lambda: ProbeClient(log), "public.test_table", aws=AWS)
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    with pytest.raises(LoaderError) as exc:
        loader.insert()
    assert exc.value.code == "RS_COPY_ERROR"
    assert exc.value.details == {"err_reason": "Invalid digit"}
    # credentials scrubbed from the attached query text (utils.ts:91)
    assert "SECRETTEST" not in (exc.value.query or "")


def test_dedupe_rejected_by_redshift_sink(spark, tmp_path):
    sink = RedshiftSink(make_pool([]), "public.test_table", aws=AWS)
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    with pytest.raises(ValueError, match="dedupe"):
        loader.upsert(dedupe="last")


def test_serializable_violation_retries_then_succeeds(spark, tmp_path):
    attempts = {"n": 0}
    log: list[str] = []

    class FlakyClient(FakeClient):
        def query(self, sql):
            self.log.append(sql)
            if sql == "COMMIT;" and attempts["n"] == 0:
                attempts["n"] += 1
                raise RuntimeError("serializable isolation violation on table x")
            return None

    sink = RedshiftSink(
        lambda: FlakyClient(log),
        "public.test_table",
        loading_table="loading.test_table",
        aws=AWS,
        backoff_base_s=0.0,
    )
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    assert loader.upsert() == "SUCCESS"
    assert log.count("COMMIT;") == 2  # failed once, retried whole txn


def test_create_table_generates_redshift_ddl(spark, tmp_path):
    """M6 createTable (reference README.md:52, unimplemented there):
    Spark schema → quoted Redshift DDL via the transactional runner."""
    log: list[str] = []
    sink = RedshiftSink(make_pool(log), "public.test_table", aws=AWS)
    assert (
        sink.create_table(
            "id BIGINT NOT NULL, text STRING, number DOUBLE,"
            " created_at TIMESTAMP, props MAP<STRING, STRING>"
        )
        == "SUCCESS"
    )
    assert log == [
        "CREATE TABLE IF NOT EXISTS public.test_table (id BIGINT NOT NULL,"
        " text VARCHAR(65535), number DOUBLE PRECISION,"
        " created_at TIMESTAMP, props SUPER);"
    ]


def test_loader_create_table_from_sources_native(spark, tmp_path):
    from rs_streamloader_spark.sinks.native import NativeTableSink

    sink = NativeTableSink(spark, str(tmp_path / "tbl"))
    loader = make_loader(spark, tmp_path, sink)
    loader.add_source(ROWS_A)
    assert loader.create_table() == "SUCCESS"
    assert sink.exists()
    assert sink.read().count() == 0
    assert set(sink.read().columns) == {"id", "text", "number"}
    # creating again with if_not_exists is a no-op; sources still addable
    assert loader.create_table() == "SUCCESS"
    loader.add_source(ROWS_B)
    assert loader.insert() == "SUCCESS"
    assert sink.read().count() == 3
