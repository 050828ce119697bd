"""Driver-contract tests for __spark_entry__: catalog completeness and
the least-recently-verified-first sweep order."""

from __future__ import annotations

import json

import __spark_entry__ as entry
from rs_streamloader_spark.operators import REGISTRY


def test_queries_and_oracles_cover_registry():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(REGISTRY)
    assert set(o) == {n for n, s in REGISTRY.items() if s.oracle is not None}
    assert list(o) == [n for n in q if n in o]  # same relative order


def test_catalog_order_puts_unverified_first(tmp_path):
    names = list(REGISTRY)
    # simulate: r1 verified the first 3 registry entries, r2 the next 2
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {} for n in names[:3]})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: {} for n in names[3:5]})
    )
    order = entry._catalog_order(str(tmp_path))
    assert set(order) == set(names)
    # never-verified lead (registry order), then r1's, then r2's
    assert order[: len(names) - 5] == names[5:]
    assert order[len(names) - 5 : len(names) - 2] == names[:3]
    assert order[len(names) - 2 :] == names[3:5]


def test_catalog_order_without_history_is_registry_order(tmp_path):
    assert entry._catalog_order(str(tmp_path)) == list(REGISTRY)
