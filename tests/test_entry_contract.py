"""Driver-contract tests for __spark_entry__: catalog completeness and
the least-recently-verified-first sweep order (red rows and redefined
oracles jump the queue)."""

from __future__ import annotations

import json

import __spark_entry__ as entry
from rs_streamloader_spark.operators import REGISTRY

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}


def test_queries_and_oracles_cover_registry():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(REGISTRY)
    assert set(o) == {n for n, s in REGISTRY.items() if s.oracle is not None}
    assert list(o) == [n for n in q if n in o]  # same relative order


def test_catalog_order_puts_unverified_first(tmp_path):
    names = list(REGISTRY)
    # simulate: r1 verified the first 3 registry entries green, r2 the next 2
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: GREEN for n in names[:3]})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: GREEN for n in names[3:5]})
    )
    order = entry._catalog_order(str(tmp_path))
    assert set(order) == set(names)
    # never-verified lead (registry order), then r1's, then r2's
    assert order[: len(names) - 5] == names[5:]
    assert order[len(names) - 5 : len(names) - 2] == names[:3]
    assert order[len(names) - 2 :] == names[3:5]


def test_catalog_order_puts_latest_red_first(tmp_path):
    names = list(REGISTRY)
    # everything green in r1 so never-sampled doesn't dominate; one red in r2
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: GREEN for n in names})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({names[7]: RED}))
    order = entry._catalog_order(str(tmp_path))
    assert order[0] == names[7]


def test_catalog_order_requeues_redefined_oracle(tmp_path):
    """ADVICE r8: a query whose oracle SQL changed since the committed
    fingerprint snapshot is treated like a red row even if its latest
    driver row was green."""
    names = list(REGISTRY)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: GREEN for n in names})
    )
    (tmp_path / "tools").mkdir()
    from tools.update_fingerprints import oracle_fingerprint

    fps = {n: oracle_fingerprint(REGISTRY[n].oracle) for n in names}
    target = names[11]
    fps[target] = "stale:redefined"  # simulate a post-green redefinition
    (tmp_path / "tools" / "oracle_fingerprints.json").write_text(json.dumps(fps))
    order = entry._catalog_order(str(tmp_path))
    assert order[0] == target
    # with a matching snapshot, nothing is flagged: plain rotation
    fps[target] = oracle_fingerprint(REGISTRY[target].oracle)
    (tmp_path / "tools" / "oracle_fingerprints.json").write_text(json.dumps(fps))
    assert entry._catalog_order(str(tmp_path)) == names


def test_catalog_order_without_history_is_registry_order(tmp_path):
    assert entry._catalog_order(str(tmp_path)) == list(REGISTRY)


def test_catalog_order_requeues_stale_no_oracle_row(tmp_path):
    """VERDICT r9 #7: a latest driver row of ``no_oracle`` for a query
    that NOW carries an oracle is stale rows-only evidence — it must
    requeue like a red (multimodal_features sat on an r5 no_oracle row
    for four rounds after gaining its oracle in r7). A no_oracle row
    for a query that is STILL declared rows-only rotates normally."""
    names = list(REGISTRY)
    rows_only = [n for n in names if REGISTRY[n].oracle is None]
    # pick an oracled query that sits AFTER the rows-only one so the
    # front-jump is observable as a shift
    start = names.index(rows_only[0]) if rows_only else 0
    oracled = next(
        (n for n in names[start:] if REGISTRY[n].oracle is not None), None
    )
    assert oracled is not None, (
        "registry has no oracled query after its first rows-only entry — "
        "rework this test's front-jump observation"
    )
    recs = {n: GREEN for n in names}
    recs[oracled] = {"err": "no_oracle", "rows_match": True}
    if rows_only:
        recs[rows_only[0]] = {"err": "no_oracle", "rows_match": True}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(recs))
    order = entry._catalog_order(str(tmp_path))
    assert order[0] == oracled
    if rows_only:  # declared-rows-only stays in plain rotation
        # (+1: the requeued query jumped from behind it to the front)
        assert order.index(rows_only[0]) == names.index(rows_only[0]) + 1
