"""Env-gated live-infrastructure smoke (VERDICT r2 item 8).

Everything else in the suite fakes S3 (file://) and pg (duck-typed
pools), exactly like the reference's own specs
(lib/RedshiftLoader.spec.ts:14-30). These tests run the two seams that
have never met real endpoints — the s3a→s3 manifest rewrite
(staging.py) and the stl_load_errors probe (transaction.py) — against
a REAL bucket and warehouse, and are skipped cleanly unless the
environment provides:

- ``RS_SL_PG_DSN``     — libpq DSN for a Redshift(-protocol) warehouse
- ``RS_SL_S3_BUCKET``  — writable S3 bucket (s3a:// must resolve, i.e.
  hadoop-aws on the Spark classpath + ambient AWS credentials)
- ``RS_SL_AWS_IAM_ROLE`` (optional) — COPY credentials; falls back to
  ``AWS_ACCESS_KEY_ID`` / ``AWS_SECRET_ACCESS_KEY``
- ``RS_SL_IS_REDSHIFT=1`` (optional) — enables the stl_load_errors
  probe test (the table only exists on real Redshift, not vanilla pg)

The created table and staging prefix are uuid-suffixed and dropped /
deleted on the way out.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

PG_DSN = os.environ.get("RS_SL_PG_DSN")
S3_BUCKET = os.environ.get("RS_SL_S3_BUCKET")

pytestmark = pytest.mark.skipif(
    not (PG_DSN and S3_BUCKET),
    reason="live-infra smoke needs RS_SL_PG_DSN and RS_SL_S3_BUCKET",
)


def _pool(dsn: str):
    """Minimal PoolLike over psycopg2: one autocommit client per
    connect() (the transactional runner issues BEGIN/COMMIT itself)."""
    psycopg2 = pytest.importorskip("psycopg2")

    def connect():
        conn = psycopg2.connect(dsn)
        conn.autocommit = True

        class _Client:
            def query(self, sql: str):
                with conn.cursor() as cur:
                    cur.execute(sql)
                    if cur.description is None:
                        return []
                    cols = [d[0] for d in cur.description]
                    return [dict(zip(cols, r)) for r in cur.fetchall()]

            def release(self):
                conn.close()

        return _Client()

    return connect


def _aws_creds() -> dict:
    if os.environ.get("RS_SL_AWS_IAM_ROLE"):
        return {"iam_role": os.environ["RS_SL_AWS_IAM_ROLE"]}
    return {
        "access_key_id": os.environ.get("AWS_ACCESS_KEY_ID", ""),
        "secret_access_key": os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
        "session_token": os.environ.get("AWS_SESSION_TOKEN"),
    }


def test_live_copy_roundtrip(spark):
    """INSERT round-trip: stage gzip JSON parts to the real bucket,
    write the manifest (asserting every entry URL was rewritten
    s3a:// → s3:// — Redshift's COPY rejects s3a), run the COPY plan
    through the transactional runner, count the rows back."""
    from rs_streamloader_spark.sinks.redshift import RedshiftSink
    from rs_streamloader_spark.staging import (
        delete_stage,
        write_manifest,
        write_stage,
    )

    run = uuid.uuid4().hex[:8]
    prefix = f"s3a://{S3_BUCKET}/rs_sl_smoke/{run}"
    table = f"rs_sl_smoke_{run}"
    pool = _pool(PG_DSN)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, v STRING")
    try:
        stage = write_manifest(spark, write_stage(df, prefix, fmt="json", gzip=True))
        manifest = json.loads(
            "".join(r.value for r in spark.read.text(stage.manifest_path).collect())
        )
        assert manifest["entries"], "manifest listed no committed parts"
        assert all(
            e["url"].startswith("s3://") and e["mandatory"]
            for e in manifest["entries"]
        )

        sink = RedshiftSink(pool, table, aws=_aws_creds())
        sink.create_table("id INT, v STRING")
        assert sink.load_staged(stage, "INSERT") == "SUCCESS"

        client = pool()
        try:
            rows = client.query(f"SELECT COUNT(*) AS n FROM {table}")
        finally:
            client.release()
        assert rows[0]["n"] == 2
    finally:
        client = pool()
        try:
            client.query(f"DROP TABLE IF EXISTS {table}")
        finally:
            client.release()
        delete_stage(spark, prefix)


@pytest.mark.skipif(
    os.environ.get("RS_SL_IS_REDSHIFT") != "1",
    reason="stl_load_errors exists only on real Redshift",
)
def test_live_stl_load_errors_probe(spark):
    """A body that cannot COPY into the typed table (maxError=0) must
    surface as LoaderError(RS_COPY_ERROR) carrying the most recent
    stl_load_errors row as details (transaction.py:67-77)."""
    from rs_streamloader_spark.errors import RS_COPY_ERROR, LoaderError
    from rs_streamloader_spark.sinks.redshift import RedshiftSink
    from rs_streamloader_spark.staging import (
        delete_stage,
        write_manifest,
        write_stage,
    )

    run = uuid.uuid4().hex[:8]
    prefix = f"s3a://{S3_BUCKET}/rs_sl_smoke_bad/{run}"
    table = f"rs_sl_smoke_bad_{run}"
    pool = _pool(PG_DSN)
    # 'v' exceeds nothing, but 'id' is a string that cannot load as INT
    df = spark.createDataFrame([("not-an-int", "a")], "id STRING, v STRING")
    try:
        stage = write_manifest(spark, write_stage(df, prefix, fmt="json"))
        sink = RedshiftSink(pool, table, aws=_aws_creds())
        client = pool()
        try:
            client.query(f"CREATE TABLE {table} (id INT, v VARCHAR(8))")
        finally:
            client.release()
        with pytest.raises(LoaderError) as exc:
            sink.load_staged(stage, "INSERT")
        assert exc.value.code == RS_COPY_ERROR
        assert exc.value.details  # the probed stl_load_errors row
    finally:
        client = pool()
        try:
            client.query(f"DROP TABLE IF EXISTS {table}")
        finally:
            client.release()
        delete_stage(spark, prefix)
