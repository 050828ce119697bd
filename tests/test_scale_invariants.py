"""Invariants of the controlled-statistics scale-up generator
(tools/scale_stress.py): a k× replica must grow every pair/aggregate
output ~linearly because each replica preserves within-replica
statistics exactly and shares nothing across replicas. Proven here at
k=2 over sf0.001 so the sf1 stress run's "~linear" assertion is an
established property, not a hope."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF = "/root/testdata/sf0.001"
K = 2


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    from scale_stress import make_scaled

    dst = str(tmp_path_factory.mktemp("scaled"))
    make_scaled(spark, SF, dst, K)
    return dst


def _rows(spark, name, sf):
    from rs_streamloader_spark.operators import REGISTRY

    return REGISTRY[name].fn(spark, sf).collect()


def test_jaccard_pairs_scale_exactly_linearly(spark, scaled_dir):
    """Word-prefixing is a bijection on each replica's shingle space →
    per-replica pair sets are isomorphic and cross-replica pairs are
    impossible: exactly k× the pairs, with identical jaccard values."""
    base = _rows(spark, "dedup_ngram_jaccard", SF)
    scaled = _rows(spark, "dedup_ngram_jaccard", scaled_dir)
    assert len(scaled) == K * len(base)
    base_j = sorted(round(r["jaccard"], 9) for r in base) * K
    assert sorted(round(r["jaccard"], 9) for r in scaled) == sorted(base_j)


def test_embedding_pairs_preserved_within_replicas(spark, scaled_dir):
    """Rademacher sign flips preserve within-replica dot products and
    norms exactly ((s∘x)·(s∘y) = x·y): every base pair appears in the
    scaled output k times (once per replica) with the identical
    cosine. Cross-replica pairs DO appear — at threshold 0.35 a few
    per-mille of RANDOM pairs clear the bar, so threshold-pair output
    is intrinsically superlinear on this distribution (the stress
    runner annotates the embedding family accordingly); the invariant
    is that every extra pair is strictly cross-replica."""
    from scale_stress import KEY_OFFSET

    base = {
        (r["vec_a"], r["vec_b"]): round(r["cosine"], 6)
        for r in _rows(spark, "embedding_near_dup", SF)
    }
    scaled = {
        (r["vec_a"], r["vec_b"]): round(r["cosine"], 6)
        for r in _rows(spark, "embedding_near_dup", scaled_dir)
    }
    within = set()
    for (a, b), c in base.items():
        for i in range(K):
            key = (a + i * KEY_OFFSET, b + i * KEY_OFFSET)
            assert scaled.get(key) == c, f"replica {i} lost/changed pair {a, b}"
            within.add(key)
    extras = set(scaled) - within
    assert all(
        (a < KEY_OFFSET) != (b < KEY_OFFSET) for a, b in extras
    ), "an unexpected same-replica pair appeared"


def test_date_windowed_aggregate_is_replica_invariant(spark, scaled_dir):
    """q5 filters a fixed 1996–1998 order window; the i×400-year
    replica time shift puts every replica but the first outside it, so
    the scaled output must equal the base EXACTLY (the same addends
    survive the filter) — the scaled run then measures how well the
    date predicate prunes k× history, which is precisely the
    long-history scale posture. A k× output here would mean the shift
    (or the filter pushdown) broke."""
    base = {r["n_name"]: r["revenue"] for r in _rows(spark, "q5_local_supplier_volume", SF)}
    scaled = {
        r["n_name"]: r["revenue"]
        for r in _rows(spark, "q5_local_supplier_volume", scaled_dir)
    }
    assert set(scaled) == set(base)
    for nation, rev in base.items():
        assert scaled[nation] == pytest.approx(rev, rel=1e-9)


def test_unwindowed_aggregate_scales_linearly(spark, scaled_dir):
    """q18 has no date filter: replica orders/customers are key-offset
    copies, so every qualifying (customer, order) row appears k times
    with identical totals."""
    base = _rows(spark, "q18_large_orders", SF)
    scaled = _rows(spark, "q18_large_orders", scaled_dir)
    assert len(scaled) == K * len(base)


def test_sessionization_scales_exactly_linearly(spark, scaled_dir):
    """user_id offsets keep replica users disjoint with identical event
    streams (shifted by whole i×24-year blocks, preserving every gap)
    → exactly k× the sessions, identical below the year (the events
    span a single January, so dropping the shifted year loses
    nothing)."""
    base = _rows(spark, "sessionize_stateful_replay", SF)
    scaled = _rows(spark, "sessionize_stateful_replay", scaled_dir)
    assert len(scaled) == K * len(base)

    def shape(r):
        return (r["session_start"].strftime("%m-%d %H:%M:%S.%f"), r["n_events"])

    assert sorted(map(shape, scaled)) == sorted(sorted(map(shape, base)) * K)


def test_range_join_scales_exactly_linearly(spark, scaled_dir):
    """The 400-year replica time shift makes temporal range joins
    replica-local: join_range's per-probe shipment aggregates repeat
    exactly k times (keys offset per replica), with no cross-replica
    matches inflating them."""
    from scale_stress import KEY_OFFSET

    base = {
        r["o_orderkey"]: (r["n_shipments"], r["qty_shipped"])
        for r in _rows(spark, "join_range", SF)
    }
    scaled = {
        r["o_orderkey"]: (r["n_shipments"], r["qty_shipped"])
        for r in _rows(spark, "join_range", scaled_dir)
    }
    assert len(scaled) == K * len(base)
    for key, val in base.items():
        for i in range(K):
            assert scaled[key + i * KEY_OFFSET] == val, (key, i)


def test_classify_growth_guards_degenerate_base():
    """ADVICE r8: base_rows == 0 must never be labeled superlinear for
    a trivial nonzero scaled count (0·k·1.5 == 0 made 0→2 read as
    'superlinear (measured)')."""
    from scale_stress import classify_growth

    assert classify_growth(0, 0, 10) == "output-constant (measured)"
    assert classify_growth(0, 2, 10) == "linear (measured)"
    assert classify_growth(0, 16, 10) == "indeterminate (base empty)"
    # non-degenerate bases keep the ratio semantics
    assert classify_growth(100, 110, 10) == "output-constant (measured)"
    assert classify_growth(100, 1000, 10) == "linear (measured)"
    assert classify_growth(100, 5000, 10) == "superlinear (measured)"
