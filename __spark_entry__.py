"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from
``rs_streamloader_spark.operators.registry`` — every operator the
engine claims registers a Spark callable plus (when SQL-expressible)
a DuckDB oracle string there. See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable by executor Python workers (they inherit
# PYTHONPATH, not the driver's sys.path) — needed for the
# applyInPandas/mapInPandas operators regardless of the caller's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [_REPO_ROOT, os.environ.get("PYTHONPATH", "")] if p
)

from rs_streamloader_spark.operators import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def oracle_fingerprint(sql: str | None) -> str:
    """Stable short hash of an oracle definition (``no_oracle`` for
    rows-only queries, so adding/removing an oracle also re-queues).
    THE single source of the fingerprint scheme: the snapshot writer
    (tools/update_fingerprints.py) imports it from here, so the writer
    and the rotation reader can never drift (ADVICE r9). Lives in this
    file, not tools/, because the driver loads this file standalone."""
    import hashlib

    if sql is None:
        return "no_oracle"
    return hashlib.sha256(sql.encode("utf-8")).hexdigest()[:16]


def _catalog_order(root: str = _REPO_ROOT) -> list[str]:
    """Catalog order for the driver sweep: least-recently-verified
    first. The driver's correctness pass covers a bounded prefix of
    ``queries()`` per round (r1 recorded exactly the first 50 registry
    entries), so queries are sorted by the last round in which the
    driver recorded a row for them (never-recorded first), ties in
    registry order — cycling coverage across rounds so every operator
    accumulates driver evidence.

    Queries whose LATEST driver row was red jump the queue entirely:
    a red row means a fix shipped (or is owed) and the scoreboard
    should see the re-check next round, not after the full rotation
    cycles back around.

    A query whose oracle SQL changed since its fingerprint snapshot
    (tools/oracle_fingerprints.json, written by
    tools/update_fingerprints.py at each green round-end gate) is
    treated the same as red: a redefinition invalidates old green
    evidence, so the scoreboard should re-check it next round even if
    its last driver row predates the change (ADVICE r8)."""
    import glob
    import json
    import re

    last_seen: dict[str, int] = {}
    latest_green: dict[str, bool] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):  # unexpected shape — skip, never crash
            continue
        for name, rec in rows.items():
            if rnd >= last_seen.get(name, 0):
                if isinstance(rec, dict) and rec.get("err") == "no_oracle":
                    # Rows-only by declared design — normal rotation.
                    # But if the query HAS an oracle now (added after
                    # that row was recorded), the rows-only evidence is
                    # stale: requeue like a red so the scoreboard gets
                    # a real hash-checked row next round (VERDICT r9 #7
                    # — multimodal_features sat on an r5 no_oracle row
                    # for four rounds after gaining its oracle).
                    green = name in REGISTRY and REGISTRY[name].oracle is None
                else:
                    green = bool(
                        isinstance(rec, dict)
                        and rec.get("rows_match")
                        and rec.get("schema_match", True)
                        and rec.get("hash_match", True)
                        and not rec.get("err")
                    )
                latest_green[name] = green
            last_seen[name] = max(last_seen.get(name, 0), rnd)
    snapshot: dict[str, str] = {}
    try:
        with open(os.path.join(root, "tools", "oracle_fingerprints.json")) as fh:
            loaded = json.load(fh)
        if isinstance(loaded, dict):
            snapshot = loaded
    except (OSError, ValueError):
        pass  # no snapshot yet — fingerprint check is a no-op

    def _fp(name: str) -> str:
        return oracle_fingerprint(REGISTRY[name].oracle)

    def _needs_recheck(name: str) -> bool:
        if not latest_green.get(name, True):
            return True  # latest driver row red
        recorded = snapshot.get(name)
        # oracle redefined since the snapshot → old green evidence is
        # stale; re-queue like a red row (never-snapshotted = new
        # query, already first via last_seen=0)
        return recorded is not None and recorded != _fp(name)

    order = {name: i for i, name in enumerate(REGISTRY)}
    return sorted(
        REGISTRY,
        key=lambda n: (
            not _needs_recheck(n),  # red / redefined rows first
            last_seen.get(n, 0),
            order[n],
        ),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-way snowflake
    join + aggregation (TPC-H Q5 style)."""
    from rs_streamloader_spark.operators.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, os.environ.get("SPARK_GRAFT_SF_DIR", SF0001))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _catalog_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; entries
    with ``oracle=None`` (Pandas-UDF / streaming pipelines) are
    omitted → the driver records a rows-only check."""
    return {
        name: REGISTRY[name].oracle
        for name in _catalog_order()
        if REGISTRY[name].oracle is not None
    }
