"""Anti-vacuity gate: run every regexp/conditional-branch query against a
CONSTRUCTED corpus engineered so each branch actually fires, and assert the
branch-bearing output columns take >= 2 distinct values (and cross-engine
agreement on that corpus).

Why this exists (VERDICT r9, "What's wrong" #1): ``scalar_regexp`` was
driver-green for nine rounds while one digit away from crashing, because the
synthetic corpus contains no digits — its ``n_numbers`` column was only ever
asserted against all-zeros. A query is *vacuously* green when a branch of it
never executes on the test data; this suite pins every such branch to a
corpus where it provably takes both sides.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from tests.oracle_harness import compare

# ---------------------------------------------------------------------------
# Constructed corpus: every regexp / CASE branch in the catalog's text and
# event queries takes BOTH sides somewhere in these rows.
# ---------------------------------------------------------------------------

_DOCS = [
    # (doc_id, text, lang) — doc_ids are multiples of 10 so scalar_regexp's
    # `doc_id % 10 = 0` filter keeps them all.
    # digits + 'spark' + 'join' -> n_numbers>0, shouted!=text, mentions_join
    (0, "spark version 42 released in 2024 with 3 join fixes", "en"),
    # no digits / no spark / no join|merge -> the all-negative row
    (10, "the quick brown fox jumps over a lazy dog", "en"),
    # many digit runs, 'merge' branch of mentions_join
    (20, "merge of 1 2 3 4 5 6 7 8 9 batches done", "fr"),
    # marker-dense English ('the'/'a' >= 5% of tokens) -> langid 'en'
    (30, "the cat sat on a mat and the dog ate a bone the end", "en"),
    # zero marker words, labelled en -> langid 'other' (false negative cell)
    (40, "quarterly revenue projections exceeded expectations significantly", "en"),
    # marker-dense but labelled fr -> langid 'en' (false positive cell)
    (50, "the faux ami words flow like a river in the spring", "fr"),
    # non-en, no markers -> true negative cell
    (60, "bonjour tout le monde comment allez vous aujourd hui", "fr"),
    # organic email + phone ON TOP of the seeded pair -> n_emails=2, n_phones=2
    (70, "reach ops@corp.example.io or 555-1234 for spark support", "en"),
    # long, high-quality doc (length>=200, >=40 tokens, mean token len 3..8)
    (
        80,
        " ".join(["token%d" % (i % 7) for i in range(50)])
        + " the pipeline runs the merge and a join across 12 shards",
        "en",
    ),
    # short low-quality doc
    (90, "tiny", "zh"),
]

# One user-day that MATCHES view->click->purchase with no error between,
# one that has an error in between (no match), one with no purchase at all.
_EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    (1, "2024-03-01 08:00:00", 1, "view", 1.0),
    (2, "2024-03-01 08:05:00", 1, "click", 2.0),
    (3, "2024-03-01 08:10:00", 1, "purchase", 30.0),
    # user 2's journey has an error and NO later click: the sequence
    # pattern must not match, and the purchase's as-of state is 'error'
    (4, "2024-03-01 09:00:00", 2, "view", 1.0),
    (5, "2024-03-01 09:05:00", 2, "error", 0.0),
    (7, "2024-03-01 09:15:00", 2, "purchase", 25.0),
    (8, "2024-03-02 10:00:00", 3, "view", 1.0),
    (9, "2024-03-02 10:05:00", 3, "signup", 0.0),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory) -> str:
    """Write the constructed corpus in the same single-file-parquet layout
    as /root/testdata/sf*/ so both engines load it unchanged."""
    d = tmp_path_factory.mktemp("nonvacuity_corpus")
    docs = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": "src%d" % (i % 3),
                "n_chars": len(t),
            }
            for i, t, lang in _DOCS
        ]
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), d / "documents.parquet")
    ev = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": pd.Timestamp(ts),
                "user_id": uid,
                "event_type": et,
                "value": val,
                "props": "{}",
            }
            for eid, ts, uid, et, val in _EVENTS
        ]
    )
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), d / "events.parquet")
    return str(d)


def _run(spark, corpus_dir: str, name: str) -> pd.DataFrame:
    """Run catalog query `name` on the constructed corpus, cross-check it
    against its DuckDB oracle on the SAME corpus, and return the frame."""
    import duckdb

    df = entry.queries()[name](spark, corpus_dir)
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{corpus_dir}/{t}.parquet')"
        )
    oracle_pdf = con.execute(entry.oracle_sql()[name]).df()
    compare(df, oracle_pdf, f"{name}@constructed")
    return df.toPandas()


def _assert_varies(pdf: pd.DataFrame, name: str, *cols: str) -> None:
    for c in cols:
        nun = pdf[c].nunique(dropna=False)
        assert nun >= 2, (
            f"{name}.{c} is constant ({pdf[c].iloc[0]!r}) on the constructed "
            f"corpus — the branch it encodes never fired; vacuous assertion"
        )


def test_scalar_regexp_branches_fire(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "scalar_regexp")
    _assert_varies(pdf, "scalar_regexp", "n_numbers", "mentions_join", "first_word")
    # the r9 crash class: regexp_extract_all must survive digit-bearing text
    # and count full matches (idx=0), not a nonexistent capture group.
    assert pdf["n_numbers"].max() >= 9, pdf["n_numbers"].tolist()
    assert (pdf["n_numbers"] == 0).any()
    assert bool(pdf["mentions_join"].any()) and not bool(pdf["mentions_join"].all())
    # regexp_replace branch: at least one doc actually got rewritten
    shouted = pdf.set_index("doc_id")["shouted"]
    assert "SPARK" in shouted.loc[0] and "SPARK" not in shouted.loc[10]


def test_text_langid_predicts_both_classes(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "text_langid")
    _assert_varies(pdf, "text_langid", "predicted_lang")
    assert set(pdf["predicted_lang"]) == {"en", "other"}


def test_confusion_matrix_all_four_cells_nonzero(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "confusion_matrix_metrics")
    row = pdf.iloc[0]
    for cell in ("tp", "fp", "fn", "tn"):
        assert row[cell] > 0, f"confusion cell {cell} empty — classifier branch vacuous"


def test_text_quality_score_varies(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "text_quality_score")
    _assert_varies(pdf, "text_quality_score", "quality_score", "n_tokens")
    assert pdf["quality_score"].max() == 3 and pdf["quality_score"].min() == 0


def test_text_bpe_tokens_distinct_vs_total(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "text_bpe_tokens")
    _assert_varies(pdf, "text_bpe_tokens", "n_pieces", "n_unique_pieces")
    # repetition-heavy doc 80 must show dedup bite: unique < total somewhere
    assert (pdf["n_unique_pieces"] < pdf["n_pieces"]).any()


def test_text_pii_scrub_counts_organic_pii(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "text_pii_scrub")
    _assert_varies(pdf, "text_pii_scrub", "n_emails", "n_phones")
    by_id = pdf.set_index("doc_id")
    # doc 70 carries organic PII on top of the seeded pair
    assert by_id.loc[70, "n_emails"] == 2 and by_id.loc[70, "n_phones"] == 2
    assert by_id.loc[10, "n_emails"] == 1 and by_id.loc[10, "n_phones"] == 1


def test_corpus_rarity_rare_branch_fires(spark, corpus_dir):
    """rare_token_frac was constant 0 on the shipped corpus (its small
    synthetic vocabulary has no token at corpus frequency ≤ the rare
    cutoff). The constructed corpus is full of once-occurring tokens,
    so the rare branch takes real values — and not the same one
    everywhere."""
    pdf = _run(spark, corpus_dir, "text_corpus_rarity")
    _assert_varies(
        pdf, "text_corpus_rarity", "rare_token_frac", "mean_token_corpus_freq"
    )
    assert pdf["rare_token_frac"].max() > 0


def test_calendar_fill_gap_branch_fires(spark, corpus_dir):
    """The zero-fill branch is calendar_fill_daily's entire purpose,
    yet the shipped corpus has an event of every type on every day
    (is_gap was constant 0 in the r10 vacuity scan). The constructed
    events have 4 missing (type, day) cells out of 10."""
    pdf = _run(spark, corpus_dir, "calendar_fill_daily")
    _assert_varies(pdf, "calendar_fill_daily", "is_gap", "cnt")
    assert (pdf["is_gap"] == 1).sum() == 4 and len(pdf) == 10
    # filled rows are exactly the zero-count rows
    assert ((pdf["is_gap"] == 1) == (pdf["cnt"] == 0)).all()


def test_scd2_enrichment_carries_multiple_states(spark, corpus_dir):
    """Until r10 every purchase carried state_type='purchase' by
    construction (the dimension included the purchases themselves).
    The constructed events give one purchase a 'click' predecessor and
    one an 'error' predecessor."""
    pdf = _run(spark, corpus_dir, "scd2_asof_enrich")
    _assert_varies(pdf, "scd2_asof_enrich", "state_type")
    assert set(pdf["state_type"]) == {"click", "error"}
    assert "purchase" not in set(pdf["state_type"])


def test_srm_detector_fires_on_skewed_split(spark, tmp_path):
    """ab_srm_check's srm_detected was constant false on the shipped
    corpus (the hash split is healthy there — as it should be).
    Construct a corpus whose doc_ids ALL hash into the 'test' bucket:
    observed 0/0/n against expected 80/10/10 is the textbook SRM and
    the verdict must flip to true, identically in both engines."""
    import duckdb
    import hashlib

    from rs_streamloader_spark.operators.quality import ab_srm_check

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 100

    ids = [i for i in range(4000) if bucket(i) >= 90][:200]
    assert len(ids) == 200
    docs = pd.DataFrame(
        {"doc_id": ids, "text": ["the a doc"] * len(ids),
         "lang": ["en"] * len(ids), "source": ["src0"] * len(ids),
         "n_chars": [9] * len(ids)}
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), tmp_path / "documents.parquet"
    )
    spark_pdf = ab_srm_check(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle_pdf = con.execute(entry.oracle_sql()["ab_srm_check"]).df()
    compare(ab_srm_check(spark, str(tmp_path)), oracle_pdf, "ab_srm_check@skewed")
    assert spark_pdf["srm_detected"].all()
    by_split = spark_pdf.set_index("split")["observed"]
    assert by_split["train"] == 0 and by_split["val"] == 0 and by_split["test"] == 200


def test_fk_orphan_detector_fires(spark, tmp_path):
    """fk_integrity_audit's n_orphans was constant 0 on the shipped
    corpus (referential integrity holds there — as it should). A
    constructed star schema with one broken reference per edge must
    count exactly one orphan per edge, identically in both engines."""
    import duckdb

    from rs_streamloader_spark.operators.stats import fk_integrity_audit

    tables = {
        "nation": pd.DataFrame({"n_nationkey": [1, 2]}),
        "customer": pd.DataFrame({"c_custkey": [10, 11], "c_nationkey": [1, 99]}),
        "supplier": pd.DataFrame({"s_suppkey": [20, 21]}),
        "part": pd.DataFrame({"p_partkey": [30, 31]}),
        "orders": pd.DataFrame({"o_orderkey": [40, 41], "o_custkey": [10, 98]}),
        "lineitem": pd.DataFrame(
            {
                "l_orderkey": [40, 97],  # 97: no such order
                "l_partkey": [30, 96],   # 96: no such part
                "l_suppkey": [20, 95],   # 95: no such supplier
            }
        ),
    }
    for name, pdf in tables.items():
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tmp_path / f"{name}.parquet",
        )
    spark_df = fk_integrity_audit(spark, str(tmp_path))
    con = duckdb.connect()
    for name in tables:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')"
        )
    oracle_pdf = con.execute(entry.oracle_sql()["fk_integrity_audit"]).df()
    compare(spark_df, oracle_pdf, "fk_integrity_audit@orphans")
    pdf = spark_df.toPandas().set_index(["child_table", "fk_col"])
    assert (pdf["n_orphans"] == 1).all(), pdf


def test_fuzzy_subblock_branch_fires_and_agrees(spark, tmp_path):
    """The md5 sub-blocking fuse of fuzzy_name_match engages only when
    ONE deletion-variant group exceeds _FUZZY_BLOCK_CAP rows — which
    never happens on shipped corpora, and (since the r12 FastSS
    redefinition) no longer happens for the old mega-prefix corpus
    either (a shared 16-char prefix no longer implies a shared block).
    Construct a true pathological group: 153 names that each produce
    the SAME variant V by deleting one inserted character, so V's
    group is over the cap, the fuse splits it, and same-position
    substitution pairs whose ONLY shared variant is V are (by design)
    dropped. Both engines must agree on the identical nonzero pair
    set, and the drop must be observable vs brute force."""
    import duckdb

    from rs_streamloader_spark.operators.advanced import (
        _FUZZY_BLOCK_CAP,
        fuzzy_name_match,
    )

    v = "Supplier#BLOCK00"
    names = sorted(
        {v[:p] + c + v[p:] for p in range(len(v) + 1) for c in "123456789"}
    )
    # every name shares deletion variant v -> one group over the cap
    assert len(names) > _FUZZY_BLOCK_CAP, len(names)
    pdf = pd.DataFrame({"s_name": names})
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), tmp_path / "supplier.parquet"
    )

    spark_pdf = fuzzy_name_match(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{tmp_path}/supplier.parquet')"
    )
    oracle_pdf = con.execute(entry.oracle_sql()["fuzzy_name_match"]).df()
    assert 0 < len(oracle_pdf)
    key = lambda f: sorted(map(tuple, f[sorted(f.columns)].itertuples(index=False)))
    assert key(spark_pdf) == key(oracle_pdf)
    # the fuse really dropped pairs: at least one unit-distance pair
    # whose only shared variant is v fell across sub-blocks
    all_pairs = con.execute(
        """
        WITH n AS (SELECT DISTINCT s_name FROM supplier)
        SELECT COUNT(*) FROM n a JOIN n b
        ON a.s_name < b.s_name AND LEVENSHTEIN(a.s_name, b.s_name) <= 1
        """
    ).fetchone()[0]
    assert 0 < len(oracle_pdf) < all_pairs


def test_sequence_pattern_match_both_outcomes(spark, corpus_dir):
    pdf = _run(spark, corpus_dir, "sequence_pattern_match")
    by_day = pdf.set_index("day")
    # 2024-03-01: one clean v..c..p journey, one error-interrupted journey
    assert by_day.loc["2024-03-01", "n_matched"] == 1
    assert by_day.loc["2024-03-01", "n_journeys"] == 2
    # 2024-03-02: a journey with no purchase at all
    assert by_day.loc["2024-03-02", "n_matched"] == 0


def test_shapley_attribution_asymmetric_credit(spark, corpus_dir):
    """At sf0.01 every user touches every channel, so all phi columns
    are constant (VACUITY_r11 flag). On this corpus the coalitions
    differ — user1 {view,click} converts, user2 {view,error} converts,
    user3 {view,signup} doesn't — so credit must be ASYMMETRIC:
    view sits in both converting sets, signup in none."""
    pdf = _run(spark, corpus_dir, "shapley_attribution").set_index("channel")
    assert pdf["phi_nano"].nunique() >= 2, pdf
    assert pdf.loc["view", "phi_nano"] > pdf.loc["signup", "phi_nano"]
    # exact Shapley (ADVICE r11: ALL 2^n coalitions): signup's credit
    # is genuinely NEGATIVE here — it appears only in the one
    # non-converting set, so its marginal contributions are <= 0 (the
    # old observed-coalition truncation reported a misleading 0; the
    # sanity-suite itertools pin fixes the exact value)
    assert pdf.loc["signup", "phi_nano"] < 0
    # efficiency-style sanity on observed coalitions: total credit is
    # positive and view ties-or-beats every other channel
    assert (pdf["phi_nano"]["view"] >= pdf["phi_nano"]).all()


def test_bloom_join_prune_false_positive_fires(spark, tmp_path):
    """bloom_join_prune_audit's n_fp_keys is 0 at sf0.001 (expected FP
    count < 1 — a corpus property, see the docstring). Construct a
    member set plus a probe key whose BOTH hash positions collide with
    set bits (found by replaying the exact md5 position arithmetic in
    Python), so the false-positive branch provably fires and both
    engines agree on the same corpus."""
    import hashlib

    import duckdb

    from rs_streamloader_spark.operators.stats import (
        _BJOIN_K,
        _BJOIN_M,
        bloom_join_prune_audit,
    )

    def positions(key: int) -> list[int]:
        h = hashlib.md5(b"bjoin|" + str(key).encode()).hexdigest()
        return [int(h[4 * j : 4 * j + 4], 16) % _BJOIN_M for j in range(_BJOIN_K)]

    members = list(range(1, 201))
    bits = {p for k in members for p in positions(k)}
    fp_key = next(
        k
        for k in range(1000, 100000)
        if all(p in bits for p in positions(k))
    )
    pruned_key = next(
        k
        for k in range(1000, 100000)
        if not any(p in bits for p in positions(k))
    )
    customer = pd.DataFrame(
        {
            "c_custkey": members + [fp_key, pruned_key],
            "c_mktsegment": ["BUILDING"] * len(members) + ["MACHINERY"] * 2,
        }
    )
    orders = pd.DataFrame(
        {"o_custkey": [members[0], members[1], fp_key, fp_key, pruned_key]}
    )
    pq.write_table(
        pa.Table.from_pandas(customer, preserve_index=False),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        tmp_path / "orders.parquet",
    )

    spark_df = bloom_join_prune_audit(spark, str(tmp_path))
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')"
        )
    oracle_pdf = con.execute(entry.oracle_sql()["bloom_join_prune_audit"]).df()
    compare(spark_df, oracle_pdf, "bloom_join_prune_audit@collision")
    row = spark_df.toPandas().iloc[0]
    # the constructed double-collision key passes the filter yet fails
    # the exact verify — the false-positive branch fires
    assert row["n_fp_keys"] == 1, row
    # and the clean non-member is pruned without ever reaching the join
    assert row["n_pruned_orders"] == 1, row
    assert row["n_pass_orders"] == 4, row  # 2 member orders + 2 FP orders


def test_join_cardinality_audit_detects_skew_and_orphans(spark, tmp_path):
    """join_cardinality_estimate_audit's est_err_ppm is ~1e6 on the
    uniform synthetic corpus (the FK edges are exact by construction).
    Construct a corpus where the uniformity assumption breaks BOTH
    ways — orphan foreign keys (estimate too HIGH) and a skewed
    date-date edge (estimate too LOW) — so the audit provably reports
    real estimation error and both engines agree."""
    import duckdb

    from rs_streamloader_spark.operators.advanced import (
        join_cardinality_estimate_audit,
    )

    # orders reference custkeys 1..100; customer holds 51..150 — equal
    # ndv on both sides but only half-overlapping key sets, the exact
    # violation of the containment assumption (est = 2x exact)
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, 301),
            "o_custkey": [(i % 100) + 1 for i in range(300)],
            # 250 of 300 orders land on one hot date (est < exact)
            "o_orderdate": [
                pd.Timestamp("2024-03-01")
                if i < 250
                else pd.Timestamp("2024-03-02") + pd.Timedelta(days=i % 25)
                for i in range(300)
            ],
        }
    )
    customer = pd.DataFrame({"c_custkey": range(51, 151)})
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [(i % 300) + 1 for i in range(400)],
            "l_partkey": [(i % 10) + 1 for i in range(400)],
            "l_suppkey": [(i % 5) + 1 for i in range(400)],
            "l_shipdate": [
                pd.Timestamp("2024-03-01")
                if i < 330
                else pd.Timestamp("2024-03-02") + pd.Timedelta(days=i % 25)
                for i in range(400)
            ],
        }
    )
    part = pd.DataFrame({"p_partkey": range(1, 11)})
    supplier = pd.DataFrame({"s_suppkey": range(1, 6)})
    # microsecond precision like the real testdata — nanos would read
    # as BIGINT under the session's nanosAsLong setting
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    lineitem["l_shipdate"] = lineitem["l_shipdate"].astype("datetime64[us]")
    for name, pdf in (
        ("orders", orders),
        ("customer", customer),
        ("lineitem", lineitem),
        ("part", part),
        ("supplier", supplier),
    ):
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tmp_path / f"{name}.parquet",
        )

    spark_df = join_cardinality_estimate_audit(spark, str(tmp_path))
    con = duckdb.connect()
    for name in ("orders", "customer", "lineitem", "part", "supplier"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')"
        )
    oracle_pdf = con.execute(
        entry.oracle_sql()["join_cardinality_estimate_audit"]
    ).df()
    compare(spark_df, oracle_pdf, "join_cardinality_estimate_audit@skew")
    rows = {r["edge"]: r for r in spark_df.collect()}
    # half-overlapping key sets: containment over-estimates by 2x
    oc = rows["orders_customer"]
    assert oc["est_rows"] > oc["exact_rows"], oc
    assert oc["est_err_ppm"] == 2_000_000, oc
    # hot-date concentration: the uniformity assumption under-estimates
    sd = rows["ship_order_date"]
    assert sd["est_rows"] < sd["exact_rows"], sd
    assert sd["est_err_ppm"] <= 200_000, sd


def test_keep_best_quality_overrides_min_id(spark, tmp_path, monkeypatch):
    """dedup_keep_best_quality must keep the HIGHER-QUALITY member even
    when it has the larger doc_id (where min-id keep would differ) —
    pinned on a literal pair graph + constructed docs, so the rule is
    tested independently of shingle thresholds."""
    import rs_streamloader_spark.operators.dedup as D

    good = (
        "this is a long well formed document with plenty of words "
    ) * 8  # len >= 200, tokens >= 40, avg token len in band -> q = 3
    bad = "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb"  # q = 0 (short, few, long tokens)
    docs = pd.DataFrame(
        {
            "doc_id": [100, 200, 300],
            "text": [bad, good, good],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(bad), len(good), len(good)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        tmp_path / "documents.parquet",
    )
    pairs = spark.createDataFrame(
        [(100, 200), (100, 300)], "doc_a bigint, doc_b bigint"
    )
    monkeypatch.setattr(D, "_jaccard_pairs", lambda _s, _d: pairs)
    got = {
        r["cluster_id"]: r
        for r in D.dedup_keep_best_quality(spark, str(tmp_path)).collect()
    }
    row = got[100]  # cluster id = min doc_id
    assert row["n_members"] == 3
    assert row["kept_doc"] == 200  # best quality, doc_id tiebreak
    assert row["kept_quality"] == 3
    assert bool(row["keeper_differs_from_min_id"]) is True
    assert row["dropped_tokens"] > 0


def test_doc_char_entropy_drops_empty_text(spark, tmp_path):
    """ADVICE r11: sequence(1, 0) DESCENDS in Spark (default step -1),
    so a zero-length doc used to fabricate empty-char rows while the
    DuckDB oracle's WHERE i <= LENGTH(text) dropped the doc. Both
    engines must now drop it — proven on a corpus that actually
    contains an empty doc (shipped corpora have min length 44)."""
    import duckdb

    docs = pd.DataFrame(
        [
            {"doc_id": 0, "text": "", "lang": "en", "source": "s0", "n_chars": 0},
            {"doc_id": 1, "text": "abab", "lang": "en", "source": "s0", "n_chars": 4},
        ]
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), d / "documents.parquet")
    df = entry.queries()["doc_char_entropy"](spark, str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    oracle_pdf = con.execute(entry.oracle_sql()["doc_char_entropy"]).df()
    compare(df, oracle_pdf, "doc_char_entropy@empty-text")
    pdf = df.toPandas()
    assert set(pdf["doc_id"]) == {1}
    assert pdf["n_distinct_chars"].iloc[0] == 2


def test_overdispersion_fires_on_bursty_corpus(spark, tmp_path):
    """VACUITY_r12: `overdispersed` is False for every event type on
    the Poisson-flat synthetic corpus — the >1.5 branch never fires.
    Constructed corpus: type 'burst' lands all its events on one day
    of a 4-day span (dispersion ≫ 1.5), type 'steady' spreads 1/day
    (dispersion ≈ sub-Poisson). Both branches must fire and both
    engines must agree on the exact-rational flag."""
    import duckdb

    rows = []
    eid = 0
    # steady: one event per day, days 1-4
    for day in range(1, 5):
        eid += 1
        rows.append((eid, f"2024-03-0{day} 08:00:00", 1, "steady", 1.0))
    # burst: 40 events on day 1, zero on days 2-4 (grid densifies them)
    for i in range(40):
        eid += 1
        rows.append((eid, "2024-03-01 09:00:00", 2, "burst", 1.0))
    ev = pd.DataFrame(
        [
            {
                "event_id": e,
                "ts": pd.Timestamp(ts),
                "user_id": u,
                "event_type": et,
                "value": v,
                "props": "{}",
            }
            for e, ts, u, et, v in rows
        ]
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), d / "events.parquet")
    df = entry.queries()["event_count_overdispersion"](spark, str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    oracle_pdf = con.execute(entry.oracle_sql()["event_count_overdispersion"]).df()
    compare(df, oracle_pdf, "event_count_overdispersion@bursty")
    got = {r["event_type"]: r for r in df.collect()}
    assert bool(got["burst"]["overdispersed"]) is True
    assert bool(got["steady"]["overdispersed"]) is False
    # burst: n=4, sx=40, sxx=1600 -> index = (4*1600-1600)/(3*40) = 40
    assert got["burst"]["dispersion_index"] == 40.0


def test_bh_fdr_rejects_on_planted_effects_cross_engine(spark, tmp_path):
    """`rejected` is constant-false on the homogeneous synthetic corpus
    (every per-type test accepts). Constructed corpus: 'click' at an
    80% success share and 'error' at 10% against a ~36% base — both BH
    branches must fire AND the full row set must hash-match the DuckDB
    oracle on the same corpus (the step-up walk crosses engines)."""
    import duckdb

    shares = {
        "click": 0.8,
        "error": 0.1,
        "purchase": 0.36,
        "signup": 0.36,
        "view": 0.38,
    }
    rows = []
    eid = 0
    for et, share in shares.items():
        for i in range(300):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-03-01 08:00:00"),
                    "user_id": eid % 40,
                    "event_type": et,
                    "value": 80.0 if i < int(300 * share) else 20.0,
                    "props": "{}",
                }
            )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        d / "events.parquet",
    )
    df = entry.queries()["bh_fdr_correction"](spark, str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    oracle_pdf = con.execute(entry.oracle_sql()["bh_fdr_correction"]).df()
    compare(df, oracle_pdf, "bh_fdr_correction@planted")
    pdf = df.toPandas().set_index("event_type")
    assert bool(pdf.loc["click", "rejected"]) is True
    assert bool(pdf.loc["error", "rejected"]) is True
    assert not bool(pdf.loc["purchase", "rejected"])
