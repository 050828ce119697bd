"""Transaction executor contract tests — ports of the reference's
core.spec.ts behaviors (/root/reference/lib/core.spec.ts:31-112) onto
a duck-typed fake pool."""

from __future__ import annotations

import pytest

from rs_streamloader_spark.errors import LoaderError
from rs_streamloader_spark.sinks.transaction import transaction_query


class FakeClient:
    def __init__(self, log, fail_on=None, error_msg="boom"):
        self.log = log
        self.fail_on = fail_on
        self.error_msg = error_msg
        self.released = False

    def query(self, sql):
        self.log.append(sql)
        if self.fail_on is not None and sql == self.fail_on:
            raise RuntimeError(self.error_msg)
        if sql.startswith("SELECT * FROM stl_load_errors"):
            return {"err_reason": "Invalid digit", "line_number": 7}
        return "OK"

    def release(self):
        self.released = True


def make_pool(log, **kw):
    clients = []

    def connect():
        c = FakeClient(log, **kw)
        clients.append(c)
        return c

    connect.clients = clients
    return connect


def test_runs_all_queries_and_succeeds():
    # core.spec.ts:31-38
    log = []
    assert transaction_query(make_pool(log), ["Q1;", "Q2;", "Q3;"]) == "SUCCESS"
    assert log == ["Q1;", "Q2;", "Q3;"]


def test_failure_mid_transaction_rolls_back():
    # core.spec.ts:39-60: original message propagates, ROLLBACK issued
    log = []
    pool = make_pool(log, fail_on="Q2;", error_msg="it broke")
    with pytest.raises(RuntimeError, match="it broke"):
        transaction_query(pool, ["Q1;", "Q2;", "Q3;"])
    assert log == ["Q1;", "Q2;", "ROLLBACK;"]
    assert all(c.released for c in pool.clients)


def test_invalid_pool_rejects():
    # core.spec.ts:61-69
    with pytest.raises(TypeError):
        transaction_query("not a pool", ["Q1;"])  # type: ignore[arg-type]


def test_stl_load_errors_probe():
    # core.spec.ts:70-91: probe error table, raise RS_COPY_ERROR w/ details
    log = []
    pool = make_pool(log, fail_on="COPY t;", error_msg="load failed, see stl_load_errors")
    with pytest.raises(LoaderError) as exc_info:
        transaction_query(pool, ["BEGIN;", "COPY t;"])
    err = exc_info.value
    assert err.code == "RS_COPY_ERROR"
    assert err.details == {"err_reason": "Invalid digit", "line_number": 7}
    assert log[-1].startswith("SELECT * FROM stl_load_errors")


def test_cleanup_query_after_rollback():
    # core.spec.ts:92-112: clean-up runs on a fresh client post-rollback
    log = []
    pool = make_pool(log, fail_on="Q2;")
    with pytest.raises(RuntimeError):
        transaction_query(pool, ["Q1;", "Q2;"], clean_up="DROP TABLE tmp;")
    assert log == ["Q1;", "Q2;", "ROLLBACK;", "DROP TABLE tmp;"]
    assert len(pool.clients) == 2  # txn client + cleanup client


def test_serializable_violation_retries_with_backoff():
    # core.ts:13, 49-53: backoff 1·3ⁿ, max 4 retries
    log = []
    attempts = {"n": 0}
    sleeps = []

    def connect():
        attempts["n"] += 1
        fail = "Q1;" if attempts["n"] <= 2 else None
        return FakeClient(
            log, fail_on=fail, error_msg="serializable isolation violation on table x"
        )

    out = transaction_query(
        connect, ["Q1;"], backoff_base_s=1.0, sleep=sleeps.append
    )
    assert out == "SUCCESS"
    assert sleeps == [1.0, 3.0]  # 1·3⁰, 1·3¹
    assert attempts["n"] >= 3


def test_retry_budget_exhausted():
    log = []
    pool = make_pool(
        log, fail_on="Q1;", error_msg="serializable isolation violation on table x"
    )
    sleeps = []
    with pytest.raises(RuntimeError, match="serializable"):
        transaction_query(pool, ["Q1;"], max_retries=4, sleep=sleeps.append)
    assert sleeps == [1.0, 3.0, 9.0, 27.0]
