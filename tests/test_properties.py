"""Property-based tests (hypothesis): the upsert state machine against
a pure-Python model, and timezone invariance of timestamp queries.

The reference's only data-semantics contract is the upsert
DELETE-then-INSERT (/root/reference/lib/RedshiftLoader.ts:369-384);
here it is checked over generated batch sequences instead of one
fixture."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rs_streamloader_spark.sinks.native import NativeTableSink

ids = st.integers(min_value=0, max_value=9)
vals = st.integers(min_value=0, max_value=1000)


def unique_batch():
    """A batch with unique ids (so the model is a plain dict update)."""
    return st.dictionaries(ids, vals, min_size=1, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(unique_batch(), min_size=1, max_size=3))
def test_upsert_matches_dict_model(spark, tmp_path_factory, batches):
    """After any sequence of unique-id upsert batches, the table equals
    the dict built by sequential updates (reference M3 semantics: new
    rows replace matching ids, non-matching target rows survive)."""
    root = str(tmp_path_factory.mktemp("upsert_prop"))
    sink = NativeTableSink(spark, root)
    model: dict[int, int] = {}
    for batch in batches:
        df = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "id INT, val INT"
        )
        sink.upsert(df, id_field="id")
        model.update(batch)
    got = {r["id"]: r["val"] for r in sink.read().collect()}
    assert got == model


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=unique_batch(),
    update_rows=st.lists(st.tuples(ids, vals), min_size=1, max_size=6),
)
def test_upsert_compat_keeps_duplicate_update_rows(
    spark, tmp_path_factory, target, update_rows
):
    """Reference-compat mode: every update row lands, even duplicate
    ids within the batch (RedshiftLoader.ts:379-380 COPYs all temp rows
    into the target)."""
    root = str(tmp_path_factory.mktemp("upsert_compat"))
    sink = NativeTableSink(spark, root)
    sink.insert(
        spark.createDataFrame([(k, v) for k, v in target.items()], "id INT, val INT")
    )
    sink.upsert(
        spark.createDataFrame(update_rows, "id INT, val INT"), id_field="id"
    )
    got = sorted((r["id"], r["val"]) for r in sink.read().collect())
    update_ids = {i for i, _ in update_rows}
    expected = sorted(
        [(k, v) for k, v in target.items() if k not in update_ids] + update_rows
    )
    assert got == expected


@pytest.mark.parametrize(
    "query",
    [
        "time_bucket_agg",
        "sessionize_events",
        # round-6 additions that emit timestamps / formatted dates
        "join_asof_nearest",
        "max_drawdown_revenue",
        "dau_mau_stickiness",
        "anomaly_mad_days",
        # round-7 additions that BUCKET by the NTZ ts (values would
        # shift under a TZ-dependent to_date; NTZ makes them invariant)
        "daily_acf_curve",
        "ks_test_click_view_value",
        "welch_t_click_view",
    ],
)
def test_timestamp_queries_are_timezone_invariant(spark, query):
    """Flipping the session timezone must not change results — all
    timestamp outputs are TIMESTAMP_NTZ or formatted strings (the
    events nanos column is rebuilt as NTZ in session.load_tables)."""
    from rs_streamloader_spark.operators import REGISTRY

    fn = REGISTRY[query].fn
    sf = "/root/testdata/sf0.001"
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_rows = set(map(tuple, fn(spark, sf).collect()))
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_rows = set(map(tuple, fn(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert utc_rows == ny_rows


class TestMinLabelPropagation:
    """Connected-components label propagation (dedup_cluster's core)
    against a pure-Python union-find model, plus the hop-cap boundary
    (VERDICT r2 item 4: convergence must be overflow-proof and fail
    loudly past the cap, never silently partial)."""

    @staticmethod
    def _sym_path_edges(spark, n):
        pairs = [(i, i + 1) for i in range(n - 1)]
        return spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "u INT, v INT"
        )

    def test_path_graph_single_component(self, spark):
        from rs_streamloader_spark.operators.dedup import propagate_min_labels

        labels = propagate_min_labels(self._sym_path_edges(spark, 16))
        assert {(r.u, r.label) for r in labels.collect()} == {
            (i, 0) for i in range(16)
        }

    def test_cap_boundary_converges_then_raises(self, spark):
        """max_steps=3 covers 6 hops: a 6-node path (diameter 5, last
        productive step 2, confirming step 3) converges; an 8-node path
        (diameter 7, still productive at step 3) must raise — the loud
        failure that replaced the silent 20-hop partial result."""
        from rs_streamloader_spark.operators.dedup import propagate_min_labels

        labels = propagate_min_labels(self._sym_path_edges(spark, 6), max_steps=3)
        assert {r.label for r in labels.collect()} == {0}
        with pytest.raises(RuntimeError, match="did not converge"):
            propagate_min_labels(self._sym_path_edges(spark, 8), max_steps=3)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=14),
                st.integers(min_value=0, max_value=14),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_matches_union_find_model(self, spark, pairs):
        from rs_streamloader_spark.operators.dedup import propagate_min_labels

        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            return
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        model = {x: find(x) for x in parent}

        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "u INT, v INT"
        )
        labels = propagate_min_labels(edges)
        assert {(r.u, r.label) for r in labels.collect()} == set(model.items())


class TestSegmentMergeProperties:
    """Property tests for the sessionization gap-merge — the pure core
    of the stateful operator's correctness."""

    def test_empty_input_merges_to_no_segments(self):
        from rs_streamloader_spark.streaming.stateful import merge_segments

        assert merge_segments([], 10) == []

    @given(
        points=st.lists(
            st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
        ),
        gap=st.integers(min_value=1, max_value=500),
    )
    def test_counts_preserved_and_gaps_respected(self, points, gap):
        from rs_streamloader_spark.streaming.stateful import merge_segments

        segs = merge_segments([[p, p, 1] for p in points], gap)
        # every event counted exactly once
        assert sum(s[2] for s in segs) == len(points)
        # segments ordered, internally consistent, separated by > gap
        for s in segs:
            assert s[0] <= s[1]
        for a, b in zip(segs, segs[1:]):
            assert b[0] - a[1] > gap
        # span endpoints are real points
        pset = set(points)
        assert all(s[0] in pset and s[1] in pset for s in segs)

    @given(
        points=st.lists(
            st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
        ),
        gap=st.integers(min_value=1, max_value=500),
    )
    def test_order_insensitive(self, points, gap):
        from rs_streamloader_spark.streaming.stateful import merge_segments

        a = merge_segments([[p, p, 1] for p in points], gap)
        b = merge_segments([[p, p, 1] for p in reversed(points)], gap)
        assert a == b

    @given(
        points=st.lists(
            st.integers(min_value=0, max_value=5_000), min_size=2, max_size=40
        ),
        gap=st.integers(min_value=1, max_value=300),
        split=st.integers(min_value=1, max_value=39),
    )
    def test_incremental_equals_batch(self, points, gap, split):
        """Merging a prefix, then merging the result with the rest,
        equals merging everything at once — the invariant that makes
        held-state + late-event merging correct across micro-batches."""
        from rs_streamloader_spark.streaming.stateful import merge_segments

        split = min(split, len(points) - 1)
        full = merge_segments([[p, p, 1] for p in points], gap)
        first = merge_segments([[p, p, 1] for p in points[:split]], gap)
        second = merge_segments(
            first + [[p, p, 1] for p in points[split:]], gap
        )
        assert second == full


class TestSequenceGapModel:
    """gap_rows vs the sorted-list model: the reported gaps must be
    exactly the maximal missing runs between min(ids) and max(ids),
    for any id set — including band-boundary and empty-band gaps."""

    @staticmethod
    def _model(id_list):
        s = sorted(set(id_list))
        return {
            (prev + 1, cur - 1, cur - prev - 1)
            for prev, cur in zip(s, s[1:])
            if cur - prev > 1
        }

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        id_list=st.lists(
            st.integers(min_value=0, max_value=40), min_size=1, max_size=25
        ),
        band=st.sampled_from([1, 3, 8, 1024]),
    )
    def test_matches_sorted_list_model(self, spark, id_list, band):
        from rs_streamloader_spark.operators.stats import gap_rows

        df = spark.createDataFrame([(i,) for i in set(id_list)], "id: long")
        got = {
            (r.gap_start, r.gap_end, r.n_missing) for r in gap_rows(df, band).collect()
        }
        assert got == self._model(id_list)


class TestSkylineModel:
    """skyline_rows vs brute-force dominance: a row survives iff no
    other row is >= on both axes and > on at least one."""

    @staticmethod
    def _model(rows):
        out = set()
        for i, (ida, ca, da) in enumerate(rows):
            dominated = any(
                (cb >= ca and db >= da and (cb > ca or db > da))
                for j, (idb, cb, db) in enumerate(rows)
                if j != i
            )
            if not dominated:
                out.add(ida)
        return out

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        points=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=8),
                st.integers(min_value=0, max_value=8),
            ),
            min_size=1,
            max_size=15,
        )
    )
    def test_matches_bruteforce_dominance(self, spark, points):
        import datetime

        from rs_streamloader_spark.operators.quality import skyline_rows

        rows = [
            (i, c, datetime.date(2020, 1, 1) + datetime.timedelta(days=d))
            for i, (c, d) in enumerate(points)
        ]
        df = spark.createDataFrame(rows, "id: long, cents: long, d: date")
        got = {r.id for r in skyline_rows(df).collect()}
        model_rows = [(i, c, d) for (i, c, d) in rows]
        assert got == self._model(model_rows)


class TestWeightedMedianModel:
    """weighted_median_of vs the expanded-list model: the result must
    equal the lower median of the multiset where value v appears w
    times."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vw=st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=1,
            max_size=15,
        )
    )
    def test_matches_expanded_multiset_model(self, spark, vw):
        from rs_streamloader_spark.operators.stats import weighted_median_of

        df = spark.createDataFrame(vw, "cents: long, w: long")
        row = weighted_median_of(df).collect()[0]
        expanded = sorted(v for v, w in vw for _ in range(w))
        # lower weighted median: smallest v with cum weight*2 >= total
        total = len(expanded)
        cum = 0
        want = None
        for v in expanded:
            cum += 1
            if 2 * cum >= total:
                want = v
                break
        assert row.median_value == want
        assert row.total_weight == total


# ---------------------------------------------------------------------------
# df-capped co-shingle pair counts vs a brute-force model
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=5), min_size=3, max_size=8),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(word_docs=docs_strategy, cap=st.integers(min_value=2, max_value=4))
def test_coshingle_counts_match_bruteforce_under_cap(
    spark, monkeypatch, word_docs, cap
):
    """The basket-array pair stage with a SMALL df cap equals the
    brute-force model that drops shingles with df > cap first — the
    capping branch itself, which the test corpora (max df 25 ≪ 2000)
    never reach. Tiny vocabulary (6 words) forces hot shingles."""
    import rs_streamloader_spark.operators.dedup as dd

    texts = [" ".join(str(w) for w in ws) for ws in word_docs]

    # brute-force model: distinct word-trigram shingles per doc,
    # drop shingles with df > cap, count shared shingles per pair
    shingles = []
    for ws in word_docs:
        gs = {
            " ".join(str(x) for x in ws[i : i + 3])
            for i in range(len(ws) - 2)
        }
        shingles.append(gs)
    from collections import Counter

    df_count = Counter(sh for gs in shingles for sh in gs)
    kept = [
        {sh for sh in gs if df_count[sh] <= cap} for gs in shingles
    ]
    expected = {}
    for a in range(len(kept)):
        for b in range(a + 1, len(kept)):
            i = len(kept[a] & kept[b])
            if i:
                expected[(a, b)] = (i, len(shingles[a]), len(shingles[b]))

    monkeypatch.setattr(dd, "_JACCARD_DF_CAP", cap)
    docs_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    monkeypatch.setattr(
        dd, "_shingles_cached", lambda _s, _d: dd._shingles(docs_df)
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["i"], r["na"], r["nb"])
        for r in dd._coshingle_counts_plan(spark, "ignored").collect()
    }
    assert got == expected
