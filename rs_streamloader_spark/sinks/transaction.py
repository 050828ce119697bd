"""Transactional query executor with retry/backoff and load-error
introspection (SURVEY.md §2.3 E1-E3).

Behavioral contract from /root/reference/lib/core.ts:7-94:

- all queries run sequentially on ONE client from a duck-typed pool;
- on failure: ``ROLLBACK;`` is issued, the client released, and the
  optional clean-up query run on a fresh client;
- ``serializable isolation violation`` → retry the whole transaction
  with exponential backoff (base·factorⁿ, max 4 retries — core.ts:13,
  49-53);
- an error mentioning ``stl_load_errors`` → probe
  ``SELECT * FROM stl_load_errors ORDER BY starttime DESC LIMIT 1``
  and re-raise as ``LoaderError('RS_COPY_ERROR', details=row)``
  (core.ts:40-48).

The pool is duck-typed exactly like the reference's ``PoolLike``
(lib/types.ts:84-87) so tests — and the real Redshift sink — can
supply any client factory (pg8000, psycopg, a fake).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Protocol

from rs_streamloader_spark.errors import RS_COPY_ERROR, LoaderError

SERIALIZABLE_VIOLATION = "serializable isolation violation on table"
STL_LOAD_ERRORS = "stl_load_errors"
MAX_RETRIES = 4  # core.ts:13


class ClientLike(Protocol):
    def query(self, sql: str) -> Any: ...
    def release(self) -> None: ...


PoolLike = Callable[[], ClientLike]  # pool.connect equivalent


def _run_once(
    connect: PoolLike, queries: list[str], clean_up: str | None
) -> str:
    client = connect()
    # each client must be released exactly once — a double release can
    # corrupt reference-counting pools, so the failure path sets the
    # flag before the function-level finally runs
    released = False
    try:
        for q in queries:
            try:
                client.query(q)
            except Exception as exc:
                try:
                    client.query("ROLLBACK;")
                finally:
                    released = True
                    client.release()
                if clean_up:
                    cleaner = connect()
                    try:
                        cleaner.query(clean_up)
                    finally:
                        cleaner.release()
                msg = str(exc)
                if STL_LOAD_ERRORS in msg:
                    prober = connect()
                    try:
                        row = prober.query(
                            "SELECT * FROM stl_load_errors"
                            " ORDER BY starttime DESC LIMIT 1"
                        )
                    finally:
                        prober.release()
                    raise LoaderError(
                        RS_COPY_ERROR, msg, details=row, query=q
                    ) from exc
                raise
        return "SUCCESS"
    finally:
        if not released:
            client.release()


def transaction_query(
    connect: PoolLike,
    queries: list[str],
    clean_up: str | None = None,
    max_retries: int = MAX_RETRIES,
    backoff_base_s: float = 1.0,
    backoff_factor: float = 3.0,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Run ``queries`` transactionally with the reference's retry
    semantics (core.ts:57-60 + 49-53)."""
    retries = 0
    while True:
        try:
            return _run_once(connect, queries, clean_up)
        except LoaderError:
            raise
        except Exception as exc:
            if SERIALIZABLE_VIOLATION in str(exc) and retries < max_retries:
                sleep(backoff_base_s * (backoff_factor**retries))
                retries += 1
                continue
            raise
