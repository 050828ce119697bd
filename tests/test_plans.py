"""Plan-quality tests: assert the optimizer decisions we rely on at
100 TB actually appear in the physical plan (pushdown, pruning,
broadcast, bounded shuffles). A regression here fails CI before it
shows up in a benchmark."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from rs_streamloader_spark.operators.relational import (
    join_broadcast_dim,
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
    topk_orders,
)
from rs_streamloader_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
    wholestage_codegen_spans,
)
from tests.conftest import SF_SMOKE


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_q1_column_pruning(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert cols, "no scans found"
    li = max(cols, key=len)
    # only the 7 needed columns are read, not the full 11-column table
    assert "l_orderkey" not in li and "l_partkey" not in li
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"} <= li


def test_q3_broadcasts_customer_side(spark):
    df = q3_shipping_priority(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    # selective dimension filter reaches its scan
    assert any("c_mktsegment" in p for p in pushed_filters(df))


def test_q5_snowflake_is_broadcast_chain(spark):
    df = q5_local_supplier_volume(spark, SF_SMOKE)
    text = explain_str(df)
    assert text.count("BroadcastHashJoin") >= 3
    # every dim broadcasts → the final agg is the only shuffle
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_broadcast_dim_join_no_fact_shuffle_before_join(spark):
    df = join_broadcast_dim(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    # fact side shuffles only for the final aggregation
    assert shuffle_count(df) <= 1


def test_topk_plans_as_take_ordered(spark):
    df = topk_orders(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_aggregation_is_partial_plus_final(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    text = explain_str(df)
    # map-side combine: two HashAggregate levels around one exchange
    assert text.count("HashAggregate") >= 2


def test_codegen_covers_relational_plans(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE: codegen markers appear once the plan is final
    assert wholestage_codegen_spans(df) >= 1


def test_scalar_projection_reads_only_needed_columns(spark):
    from rs_streamloader_spark.operators.relational import scalar_math

    df = scalar_math(spark, SF_SMOKE)
    (li,) = scan_columns(df)
    assert "l_returnflag" not in li and "l_shipdate" not in li


def test_correlated_subquery_decorrelates_to_join(spark):
    """Catalyst must rewrite the per-row scalar subquery into an
    aggregate + join — a surviving correlated subquery would re-scan
    part per row."""
    from rs_streamloader_spark.operators.analytic import subquery_above_type_avg

    df = subquery_above_type_avg(spark, SF_SMOKE)
    text = explain_str(df)
    assert "Subquery" not in text or "SubqueryBroadcast" in text
    assert "Join" in text or "BroadcastHashJoin" in text


def test_sessionize_single_shuffle(spark):
    """Session windows must be one shuffle on the user key (no
    self-join, no extra exchange)."""
    from rs_streamloader_spark.operators.analytic import sessionize_events

    df = sessionize_events(spark, SF_SMOKE)
    assert shuffle_count(df) <= 1, explain_str(df)


def test_multigrain_rollup_is_single_scan(spark):
    """The grouping-sets rollup must read events once (Expand), not
    once per grain like the UNION ALL formulation."""
    from rs_streamloader_spark.operators.analytic import rollup_time_multigrain

    import re

    df = rollup_time_multigrain(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text
    assert "Expand" in text


def test_spread_is_noop_on_wide_input(spark, tmp_path):
    """spread() must repartition narrow inputs but leave file scans
    that already read enough files untouched (no gratuitous shuffle on
    a real-scale scan). Width is probed from the scan's file listing —
    never via df.rdd, which builds driver-side lineage per call."""
    from rs_streamloader_spark.session import spread

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert "Repartition" in spread(narrow)._jdf.queryExecution().toString()
    spark.range(1000).repartition(target + 4).write.parquet(str(tmp_path / "w"))
    wide = spark.read.parquet(str(tmp_path / "w"))
    out = spread(wide)
    assert out is wide  # identity — no plan change at all


def test_no_query_uses_row_at_a_time_python(spark):
    """Catalog-wide guard: no operator may plan a row-at-a-time Python
    UDF (BatchEvalPython) — Python is allowed only Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) or as the
    one registered UDTF. A regression here is a 10-100x hot-path
    slowdown that correctness tests would never catch."""
    from rs_streamloader_spark.operators import REGISTRY
    from tests.conftest import SF_SMOKE

    offenders = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        if "BatchEvalPython" in explain_str(df, "simple"):
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python in: {offenders}"


def test_asof_join_single_shuffle_no_range_probe(spark):
    """The as-of join must be the union+window plan: one shuffle on
    user_id, no join operator at all."""
    from rs_streamloader_spark.operators.advanced import join_asof

    df = join_asof(spark, SF_SMOKE)
    text = explain_str(df)
    assert "SortMergeJoin" not in text and "BroadcastHashJoin" not in text
    assert shuffle_count(df) <= 1, text


def test_page_after_key_pushes_range_and_takes_ordered(spark):
    """Keyset pagination must push the anchor range predicate into the
    parquet scan (row-group pruning at scale) and plan the page as
    TakeOrderedAndProject — not a global sort or an offset."""
    from rs_streamloader_spark.operators.analytic import page_after_key

    df = page_after_key(spark, SF_SMOKE)
    assert any("o_totalprice" in p for p in pushed_filters(df)), pushed_filters(df)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text
    assert "GlobalLimit" not in text or "TakeOrderedAndProject" in text


def test_embedding_near_dup_lsh_scores_then_filters(spark):
    """The LSH near-dup plan is score-then-band-filter: the blocked
    matmul scorer (one Arrow applyInPandas, same as the exact twin)
    plus BROADCAST signature joins on the scored pairs — never a
    banded candidate self-join + distinct (measured non-selective at
    this threshold: 73% of all pairs were candidates at a 20k corpus)
    and never a cartesian product; the per-vector top-K cut is ONE
    row_number window over the (cached) banded pair stage."""
    from rs_streamloader_spark.operators.similarity import embedding_near_dup_lsh

    df = embedding_near_dup_lsh(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert has_broadcast_join(df), text  # band signatures broadcast
    assert "FlatMapGroupsInPandas" in text  # the blocked scorer
    assert "HashAggregate" not in text  # no candidate DISTINCT anywhere
    assert "Window" in text  # the bounded top-K cut


def test_ann_ivf_probe_explodes_query_side_only(spark):
    """nprobe=2 must replicate only the (tiny, broadcast) query side —
    the corpus stays single-copy with no nested-loop fallback."""
    from rs_streamloader_spark.operators.similarity import ann_ivf_cells

    df = ann_ivf_cells(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert has_broadcast_join(df), text


def test_ann_ivf_kmeans_broadcasts_codebook_and_queries(spark):
    """The trained-IVF plan must move only small things: the codebook
    rides a one-row broadcast onto the corpus scan, the probe join
    broadcasts the exploded query side, and the corpus itself is never
    cartesian-joined or replicated."""
    from rs_streamloader_spark.operators.similarity import ann_ivf_kmeans

    df = ann_ivf_kmeans(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    assert has_broadcast_join(df), text


def test_q6_filters_reach_the_scan(spark):
    """Q6 is the pushdown benchmark: date/discount/quantity filters
    must appear as PushedFilters on the parquet scan, and the plan
    has exactly one scan and no join."""
    from rs_streamloader_spark.operators.relational import q6_forecast_revenue

    df = q6_forecast_revenue(spark, SF_SMOKE)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    assert "Join" not in explain_str(df)


def test_q19_broadcasts_dim_under_disjunction(spark):
    """The OR-of-ANDs predicate spans both join sides; the part side
    must still broadcast (no cartesian fallback) with the residual
    evaluated above the join."""
    from rs_streamloader_spark.operators.relational import q19_discounted_revenue

    df = q19_discounted_revenue(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    assert has_broadcast_join(df), text


def test_retention_cohorts_two_shuffles(spark):
    """Retention must be the single-pass plan: the cohort week rides a
    window MIN over ONE user_id exchange, the (user, week) DISTINCT
    reuses that partitioning, and only the tiny cohort×offset
    aggregate exchanges again — never a self-join of events against a
    firsts table (two fact shuffles at 100 TB)."""
    from rs_streamloader_spark.operators.analytic import retention_cohorts

    df = retention_cohorts(spark, SF_SMOKE)
    assert shuffle_count(df) == 2, explain_str(df, "simple")
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text


def test_pack_sequences_single_shuffle(spark):
    """Sharded packing must be ONE shuffle on the shard key: the
    running-total window and the per-bin aggregate share the shard
    partitioning (a global window would serialize; a second exchange
    would double the data movement)."""
    from rs_streamloader_spark.operators.text import pack_sequences

    df = pack_sequences(spark, SF_SMOKE)
    assert shuffle_count(df) == 1, explain_str(df, "simple")


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval shingle set must broadcast — the training corpus is
    never shuffled on the shingle key and never self-joined."""
    from rs_streamloader_spark.operators.dedup import decontaminate_ngram_overlap

    df = decontaminate_ngram_overlap(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in explain_str(df)


def test_funnel_single_scan_two_shuffles(spark):
    """The funnel must be the single-pass plan: one events scan + one
    user_id shuffle (+ the tiny stage-count agg) — not three filtered
    scans joined together."""
    import re

    from rs_streamloader_spark.operators.analytic import funnel_stages

    df = funnel_stages(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text
    assert shuffle_count(df) <= 2


def test_interval_overlap_is_equality_join(spark):
    """The interval×interval join must plan as a day-bucket equality
    join (broadcast or shuffled) — never a nested loop over pairs."""
    from rs_streamloader_spark.operators.advanced import join_interval_overlap

    df = join_interval_overlap(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_bm25_takes_ordered_and_broadcasts_stats(spark):
    """Top-k must plan as TakeOrderedAndProject (no global sort) and
    the 1-row corpus-stats side must broadcast, not shuffle the
    document scan."""
    from rs_streamloader_spark.operators.text import bm25_topk

    df = bm25_topk(spark, SF_SMOKE)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text
    assert "BroadcastNestedLoopJoin" in text or "BroadcastHashJoin" in text


def test_text_chunk_tokens_no_shuffle(spark):
    """Chunking is scan -> project -> generate -> project: any
    exchange would mean the fan-out got shuffled for no reason."""
    from rs_streamloader_spark.operators.text import text_chunk_tokens

    df = text_chunk_tokens(spark, SF_SMOKE)
    assert shuffle_count(df) == 0, explain_str(df, "simple")


def test_interval_concurrency_no_global_window_over_deltas(spark):
    """The sweep must use the two-pass prefix sum: the per-hour offset
    table broadcasts back; a single-partition global window over ALL
    deltas (the oracle's shape) must not appear. Detectable as: no
    SinglePartition exchange feeding a Window whose input is the
    un-aggregated delta stream — the only single-partition window
    allowed is over the per-hour NET aggregate (one row per hour)."""
    from rs_streamloader_spark.operators.analytic import interval_concurrency

    df = interval_concurrency(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df)
    # every single-partition exchange must read DIRECTLY from a
    # HashAggregate (the per-hour net reduction) — in the simple-mode
    # tree the exchange's child is the next line. A regression to the
    # oracle's global window would put a Project/Union/Generate (the
    # raw delta stream) there instead.
    lines = explain_str(df, "simple").splitlines()
    exchanges = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert exchanges, "expected a single-partition offset exchange"
    for i in exchanges:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 3])


def test_scd2_asof_enrich_is_joinless_carry_forward(spark):
    """The as-of enrichment must be the union + carry-forward shape:
    two user_id shuffles, zero join operators — never an interval
    probe (BroadcastNestedLoopJoin) over the SCD2 validity ranges."""
    from rs_streamloader_spark.operators.analytic import scd2_asof_enrich

    df = scd2_asof_enrich(spark, SF_SMOKE)
    text = explain_str(df)
    assert shuffle_count(df) <= 2, explain_str(df, "simple")
    for op in ("BroadcastNestedLoopJoin", "SortMergeJoin", "CartesianProduct",
               "BroadcastHashJoin"):
        assert op not in text, op


def test_asof_forward_uses_growing_frame(spark):
    """The forward as-of must keep the reversed-ordering GROWING frame
    (O(E) running aggregate). A rowsBetween(1, unboundedFollowing)
    formulation executes as UnboundedFollowingWindowFunctionFrame —
    O(E^2) per key — and must not reappear."""
    from rs_streamloader_spark.operators.advanced import join_asof_forward

    df = join_asof_forward(spark, SF_SMOKE)
    text = explain_str(df).lower()
    assert "unboundedfollowing" not in text, "shrinking-suffix frame is O(E^2)"
    assert shuffle_count(df) <= 1


def test_pareto_no_global_window_over_customers(spark):
    """Pareto concentration must keep the two-pass prefix sum: every
    single-partition exchange feeds the per-bucket NET aggregate (a
    bounded-count table), never the raw per-customer stream, and the
    bucket-offset table comes back as a broadcast join."""
    from rs_streamloader_spark.operators.mining import pareto_customer_share

    df = pareto_customer_share(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df)
    lines = explain_str(df, "simple").splitlines()
    exchanges = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert exchanges, "expected a single-partition offset exchange"
    for i in exchanges:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 3])


def test_cooccurrence_vocab_takes_ordered_and_broadcasts(spark):
    """The PMI vocabulary cut must plan as a distributed top-k
    (TakeOrderedAndProject), not a single-partition ranking window
    over the whole vocabulary, and the 50-row vocab must broadcast
    into the document-token join."""
    from rs_streamloader_spark.operators.mining import cooccurrence_pmi

    df = cooccurrence_pmi(spark, SF_SMOKE)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text
    assert has_broadcast_join(df)


def test_tfidf_topk_pushes_window_group_limit(spark):
    """The per-doc top-k rank filter must push a WindowGroupLimit
    below the ranking window so only k+ties rows per doc survive the
    shuffle — not a full rank-then-filter over every (doc, term)."""
    from rs_streamloader_spark.operators.mining import tfidf_topk_terms

    df = tfidf_topk_terms(spark, SF_SMOKE)
    assert "WindowGroupLimit" in explain_str(df)


def test_bigram_lm_window_sits_on_aggregate(spark):
    """The P(w2|w1) denominator window must run over the ALREADY
    aggregated bigram table (partitioned by w1) — raw token rows never
    enter a window. Detectable as: the Window's input chain contains
    the bigram HashAggregate, and the whole plan needs at most 3
    exchanges (spread, bigram agg, w1 re-key)."""
    from rs_streamloader_spark.operators.mining import bigram_lm_counts

    df = bigram_lm_counts(spark, SF_SMOKE)
    assert shuffle_count(df) <= 3, explain_str(df, "simple")
    lines = explain_str(df, "simple").splitlines()
    win = [i for i, l in enumerate(lines) if re.search(r"\bWindow\b", l)]
    assert win, "expected a window operator"
    assert any("HashAggregate" in l for l in lines[win[0]:]), "window must sit above the bigram aggregate"


def test_rfm_aggregates_feed_broadcast_no_ntile(spark):
    """RFM banding must use the percentile-boundary fold, never a
    global-sort NTILE: no ntile window function in the plan, and the
    quantile/percentile boundary row reaches the fact side through a
    broadcast join."""
    from rs_streamloader_spark.operators.mining import rfm_segments

    df = rfm_segments(spark, SF_SMOKE)
    text = explain_str(df)
    # \b keeps this from matching the (desired) percentile aggregates
    assert not re.search(r"\bntile\(", text.lower())
    assert has_broadcast_join(df)


def test_basket_lift_reuses_item_exchange(spark):
    """The basket self-join must not scan lineitem twice at full cost:
    the distinct item list is one exchange that both join sides reuse
    (ReusedExchange), and the per-order fan-out is bounded by basket
    size, never corpus size."""
    from rs_streamloader_spark.operators.mining import basket_lift_pairs

    df = basket_lift_pairs(spark, SF_SMOKE)
    df.collect()  # exchange reuse is an AQE runtime decision
    text = explain_str(df)
    assert "ReusedExchange" in text, "expected the item list exchange to be shared"
    assert has_broadcast_join(df)  # the 1-row order count


def test_lateness_histogram_single_user_window(spark):
    """Lateness must come from ONE user-partitioned window over
    arrival order — no global window, no join, and a fixed-size
    histogram aggregate on top."""
    from rs_streamloader_spark.operators.mining import arrival_lateness_histogram

    df = arrival_lateness_histogram(spark, SF_SMOKE)
    text = explain_str(df)
    assert "Exchange SinglePartition" not in explain_str(df, "simple")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert op not in text, op
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_decile_lift_windows_only_over_aggregate(spark):
    """The lift table's only single-partition work is over the decile
    aggregate (≤10 rows) and the percentile boundary row — the raw
    document stream must never hit a single-partition exchange
    un-aggregated."""
    from rs_streamloader_spark.operators.mining import decile_lift_table

    df = decile_lift_table(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    exchanges = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert exchanges
    # allowed children: a partial aggregate (percentile / global sums)
    # or the projection of the per-decile aggregate — NEVER a scan,
    # filter, or expand of raw documents
    for i in exchanges:
        child = lines[i + 1]
        assert re.search(r"HashAggregate|ObjectHashAggregate|Project \[decile", child), (
            "\n".join(lines[i : i + 3])
        )
    # and the raw table is scanned at most twice (scores + boundaries)
    assert len(re.findall(r"(?:File)?Scan parquet", explain_str(df, "simple"))) <= 2


def test_sliding_distinct_users_expands_after_dedup(spark):
    """The 7x contribution explode must sit ABOVE the (user, day)
    dedup aggregate, never on the raw event stream, and the day set
    joins back as a broadcast."""
    from rs_streamloader_spark.operators.stats import sliding_distinct_users

    df = sliding_distinct_users(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    lines = text.splitlines()
    gens = [i for i, l in enumerate(lines) if "Generate explode" in l]
    assert gens, text
    # below every explode there must be an aggregate (the dedup)
    # before any parquet scan
    for i in gens:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_gini_no_global_window_over_customers(spark):
    """Gini's global rank is the two-pass bucket decomposition: the
    only single-partition exchange feeds the per-bucket count offsets
    (a bounded aggregate), never the customer-level rows."""
    from rs_streamloader_spark.operators.stats import gini_revenue_concentration

    df = gini_revenue_concentration(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    exchanges = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert exchanges
    for i in exchanges:
        assert re.search(
            r"HashAggregate|Project", lines[i + 1]
        ), "\n".join(lines[i : i + 3])
        # the single-partition subtree must not contain a raw scan
        # within the next two operators
        assert "Scan parquet" not in lines[i + 1]


def test_chi2_windows_sit_on_cell_aggregate(spark):
    """Every window (row/col/grand totals, final chi2 sum) runs over
    the (type, dow) cell aggregate — one scan, one aggregate
    shuffle, then only tiny-table work."""
    from rs_streamloader_spark.operators.stats import chi2_event_type_dow

    df = chi2_event_type_dow(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1
    lines = text.splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    below = "\n".join(lines[first_window:])
    assert 0 <= below.find("HashAggregate") < below.find("Scan parquet")


def test_key_skew_report_single_scan_histogram(spark):
    """The skew audit is one scan + one key-histogram shuffle; all
    stats reduce the histogram (no second pass over the input)."""
    from rs_streamloader_spark.operators.stats import key_skew_report

    df = key_skew_report(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1
    assert shuffle_count(df) <= 3, text


def test_survival_windows_only_over_month_aggregate(spark):
    """The KM curve's cumulative windows run over the per-month
    aggregate (<=|months| rows); the customer collapse is a
    combinable aggregate below them."""
    from rs_streamloader_spark.operators.stats import survival_retention_curve

    df = survival_retention_curve(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    below = "\n".join(lines[first_window:])
    assert 0 <= below.find("HashAggregate") < below.find("Scan parquet")


def test_perplexity_single_bigram_explode_feeds_both_tables(spark):
    """The corpus LM counts derive from the per-doc bigram aggregate —
    ONE bigram explode pass over documents, plus the single-column
    vocab pass (2 document scans total, not 3)."""
    from rs_streamloader_spark.operators.mining import text_perplexity_bigram

    df = text_perplexity_bigram(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # both consumers (per-doc scoring AND the corpus LM re-aggregate)
    # read the cached bigram stage, not a fresh explode
    assert text.count("InMemoryTableScan") >= 2, text
    assert has_broadcast_join(df)  # the vocab scalar


def test_embedding_dim_stats_single_aggregate(spark):
    """One scan, one posexplode, one combinable dim-keyed aggregate —
    the shuffle carries |dims| keys of partials, nothing else."""
    from rs_streamloader_spark.operators.similarity import embedding_dim_stats

    df = embedding_dim_stats(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1
    assert text.count("Generate posexplode") == 1
    assert shuffle_count(df) <= 2, text


def test_pq_encoding_is_zero_shuffle_projection(spark):
    """PQ corpus encoding (codes from literal centroids) must be a
    pure projection: scan -> project, no exchange below the ADC
    ranking window, and the query side broadcasts."""
    from rs_streamloader_spark.operators.similarity import ann_pq_adc

    df = ann_pq_adc(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    # the only shuffle is the per-query ranking window (plus AQE's
    # final read); the encoded corpus streams map-side
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_pagerank_consumes_cached_pairs_fixed_depth(spark):
    """PageRank iterates against the ONCE-materialized link structure:
    deg and edges_deg are lazily localCheckpoint-ed (r15 opt — without
    it the plan re-derived the degree aggregate from the edge union
    once per iteration, 0 ReusedExchange), so the visible plan reads
    them as ExistingRDD scans and never re-scans the corpus; the
    checkpointed lineage itself consumes the CACHED Jaccard pair
    stage (no shingle re-join)."""
    from rs_streamloader_spark.operators.dedup import (
        _jaccard_pairs,
        pagerank_neardup,
    )

    df = pagerank_neardup(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # iteration chain runs on the checkpointed link structure
    assert "Scan ExistingRDD" in text, text
    # no corpus re-scan anywhere above the materialized stages
    assert "Scan parquet" not in text, text
    # the pair stage feeding the checkpoint is the cached family stage
    pairs_text = explain_str(
        _jaccard_pairs(spark, SF_SMOKE).select("doc_a", "doc_b"), "simple"
    )
    assert "InMemoryTableScan" in pairs_text, pairs_text


def test_fk_audit_anti_joins_and_broadcasts_dims(spark):
    """Every FK edge plans as a LEFT ANTI join; small dimension key
    sides broadcast."""
    from rs_streamloader_spark.operators.stats import fk_integrity_audit

    df = fk_integrity_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("LeftAnti") == 5, text
    assert has_broadcast_join(df)


def test_conversion_lag_single_scan_single_aggregate(spark):
    """The lag rollup collapses events once (conditional-MIN per
    user); the totals ride a broadcast — 2 logical consumers but one
    scan pattern each, no window over raw events."""
    from rs_streamloader_spark.operators.stats import conversion_lag_stats

    df = conversion_lag_stats(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert has_broadcast_join(df)


# ---------------------------------------------------------------------------
# round-6 batch 5: eval/audit, sketch, graph, index operators
# ---------------------------------------------------------------------------


def _no_raw_scan_under_single_partition(text: str) -> None:
    lines = text.splitlines()
    exchanges = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert exchanges, text
    for i in exchanges:
        assert "Scan parquet" not in lines[i + 1], "\n".join(lines[i : i + 3])


def test_roc_auc_no_global_window_over_scores(spark):
    """AUC's rank prefix-sum is the banded two-pass scan: every
    single-partition exchange feeds a bounded aggregate, never the
    per-score rows."""
    from rs_streamloader_spark.operators.quality import ml_roc_auc

    df = ml_roc_auc(spark, SF_SMOKE)
    _no_raw_scan_under_single_partition(explain_str(df, "simple"))


def test_calibration_single_aggregate_no_window(spark):
    from rs_streamloader_spark.operators.quality import ml_calibration_brier

    df = ml_calibration_brier(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 1, text


def test_benford_broadcasts_total(spark):
    from rs_streamloader_spark.operators.quality import benford_first_digit

    df = benford_first_digit(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 3, explain_str(df, "simple")


def test_drawdown_window_sits_on_daily_aggregate(spark):
    """The running-max window orders the bounded per-day aggregate,
    never raw orders; the argmax is a top-1 TakeOrdered."""
    from rs_streamloader_spark.operators.quality import max_drawdown_revenue

    df = max_drawdown_revenue(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    lines = text.splitlines()
    wins = [i for i, l in enumerate(lines) if l.lstrip().startswith("+- Window") or "Window [" in l]
    assert wins, text
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_skyline_no_global_window_over_prices(spark):
    from rs_streamloader_spark.operators.quality import skyline_price_recency

    df = skyline_price_recency(spark, SF_SMOKE)
    _no_raw_scan_under_single_partition(explain_str(df, "simple"))


def test_trigram_topk_takes_ordered(spark):
    from rs_streamloader_spark.operators.mining import event_trigram_topk

    df = event_trigram_topk(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    assert shuffle_count(df) <= 3, text


def test_inverted_postings_caps_before_collect(spark):
    """The posting cap rides the same term-keyed exchange as the
    collect aggregate — the window's rn filter must appear, and the
    final top-k is a TakeOrdered, not a global sort."""
    from rs_streamloader_spark.operators.mining import inverted_postings

    df = inverted_postings(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    assert shuffle_count(df) <= 4, text


def test_weighted_median_no_global_window_over_prices(spark):
    from rs_streamloader_spark.operators.stats import weighted_median_price

    df = weighted_median_price(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    _no_raw_scan_under_single_partition(text)
    assert has_broadcast_join(df)


def test_cms_broadcasts_sketch_and_takes_ordered(spark):
    from rs_streamloader_spark.operators.stats import heavy_hitters_cms

    df = heavy_hitters_cms(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in text, text


def test_vocab_richness_two_stacked_aggregates(spark):
    from rs_streamloader_spark.operators.text import text_vocab_richness

    df = text_vocab_richness(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 2, text


def test_triangles_reuse_cached_pair_stage(spark):
    from rs_streamloader_spark.operators.dedup import triangle_count_neardup

    df = triangle_count_neardup(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "InMemoryTableScan" in text, text
    assert "TakeOrderedAndProject" in text, text


def test_link_prediction_anti_joins_existing_edges(spark):
    from rs_streamloader_spark.operators.dedup import link_prediction_jaccard

    df = link_prediction_jaccard(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "InMemoryTableScan" in text, text
    assert "LeftAnti" in text, text
    assert "TakeOrderedAndProject" in text, text


def test_kmv_takes_ordered_k_smallest(spark):
    """The k-smallest-hashes cut must compile to TakeOrderedAndProject
    (per-partition top-k then merge), never a global sort."""
    from rs_streamloader_spark.operators.stats import distinct_kmv_estimate

    df = distinct_kmv_estimate(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    assert has_broadcast_join(df)


def test_quantile_bands_single_aggregate(spark):
    from rs_streamloader_spark.operators.stats import quantiles_by_priority

    df = quantiles_by_priority(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 1, text


def test_boilerplate_broadcasts_doc_counts(spark):
    from rs_streamloader_spark.operators.text import boilerplate_ngrams

    df = boilerplate_ngrams(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in text, text
    assert "Window" not in text, text


def test_sequence_gap_bands_and_takes_ordered(spark):
    """Gap detection sorts only within id bands; the only global
    ordering is over the per-band aggregate."""
    from rs_streamloader_spark.operators.stats import sequence_gap_audit

    df = sequence_gap_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    _no_raw_scan_under_single_partition(text)


def test_dau_mau_reduces_before_month_join(spark):
    from rs_streamloader_spark.operators.stats import dau_mau_stickiness

    df = dau_mau_stickiness(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 5, text


def test_chi2_terms_broadcast_class_totals(spark):
    from rs_streamloader_spark.operators.mining import chi2_discriminative_terms

    df = chi2_discriminative_terms(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in text, text


def test_entropy_broadcasts_source_totals_no_window(spark):
    from rs_streamloader_spark.operators.text import source_token_entropy

    df = source_token_entropy(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "Window" not in text, text


def test_asof_nearest_single_shuffle_no_join(spark):
    """Both directional candidates ride one user-keyed shuffle; the
    winner is row-local — no join operator, no range probe."""
    from rs_streamloader_spark.operators.advanced import join_asof_nearest

    df = join_asof_nearest(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text
    assert shuffle_count(df) <= 1, text


def test_hll_registers_bounded_aggregate(spark):
    """The register build is one combinable MAX into 64 keys; the
    exact count rides a broadcast for the audit column only."""
    from rs_streamloader_spark.operators.stats import distinct_hll_manual

    df = distinct_hll_manual(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "Window" not in text, text


def test_bootstrap_expansion_feeds_combinable_aggregate(spark):
    """The 32x resample explode must feed a hash aggregate (map-side
    partials absorb the expansion), and the quantiles run over the
    32-row means table."""
    from rs_streamloader_spark.operators.stats import bootstrap_ci_revenue

    df = bootstrap_ci_revenue(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    lines = text.splitlines()
    gens = [i for i, l in enumerate(lines) if "Generate explode" in l]
    assert gens, text
    above = "\n".join(lines[: gens[0]])
    assert "HashAggregate" in above, text


def test_autocorr_windows_sit_on_daily_aggregate(spark):
    from rs_streamloader_spark.operators.stats import daily_counts_autocorr

    df = daily_counts_autocorr(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    lines = text.splitlines()
    wins = [i for i, l in enumerate(lines) if "Window [" in l or l.lstrip().startswith("+- Window")]
    assert wins, text
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_fuzzy_match_is_blocked_equi_join(spark):
    """The edit-distance predicate must sit ABOVE an equality join on
    the block key — never a cartesian product."""
    from rs_streamloader_spark.operators.advanced import fuzzy_name_match

    df = fuzzy_name_match(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Cartesian" not in text, text
    assert "NestedLoop" not in text, text


def test_fuzzy_match_subblocks_before_join(spark):
    """Mega-block guard, r9 sub-blocking contract: each side carries a
    window count over the block key, derives `sub = hash %
    ceil(side_cnt / _FUZZY_BLOCK_CAP)`, and the candidate join clusters
    on (blk, sub) — so every hash-join build group is bounded at
    ~_FUZZY_BLOCK_CAP names no matter how skewed the blocking key is.
    Shape: 3 exchanges per side (distinct, window-on-blk, join-on-
    (blk, sub)); the two sides are identical subtrees, so AQE collapses
    the second into a ReusedExchange at runtime."""
    from rs_streamloader_spark.operators.advanced import (
        _FUZZY_BLOCK_CAP,
        fuzzy_name_match,
    )

    df = fuzzy_name_match(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("Window") >= 2, text  # one count window per side
    # the sub-block divisor sits in the plan on both sides
    assert text.count(f"div {_FUZZY_BLOCK_CAP}") >= 2, text
    # the join's clustering is sub-block-aware: build groups stay bounded
    assert re.search(r"Exchange hashpartitioning\(blk#\d+, sub#\d+", text), text
    assert "Cartesian" not in text and "NestedLoop" not in text, text
    # distinct + window + join exchange per side, plus ONE extra
    # exchange for the candidate-pair distinct the r12 deletion-
    # neighborhood key needs (a pair can share several variants); that
    # small-stream shuffle bought blocking recall 68% -> 100% at sf0.1
    assert shuffle_count(df) <= 7, text


def test_corpus_sized_join_builds_never_broadcast(spark):
    """r10 k=100 rehearsal contract: these joins' build sides grow
    with the corpus (band tables, first-seen/LM/duplicate-hash
    aggregates, per-part counts, SemDeDup dominated set), so their
    plans must use the pinned shuffle-hash shape at EVERY scale — the
    base-scale AQE broadcast each previously got was not the plan that
    runs at 100 TB (SCALE_STRESS_r10_k100 flips before the pins)."""
    from rs_streamloader_spark.operators.dedup import (
        dedup_minhash_lsh,
        exact_substring_dedup,
        minhash_estimate_audit,
        text_ngram_novelty,
    )
    from rs_streamloader_spark.operators.mining import (
        item_item_cosine_topk,
        text_perplexity_bigram,
    )
    from rs_streamloader_spark.operators.similarity import dedup_semantic

    pinned = [
        dedup_minhash_lsh,
        minhash_estimate_audit,
        text_ngram_novelty,
        exact_substring_dedup,
        item_item_cosine_topk,
        dedup_semantic,
    ]
    for fn in pinned:
        df = fn(spark, SF_SMOKE)
        text = explain_str(df, "simple")
        assert "BroadcastHashJoin" not in text, (fn.__name__, text)
        assert "ShuffledHashJoin" in text, (fn.__name__, text)
    # perplexity keeps ONE legitimate broadcast (the 1-row vocab
    # scalar); the LM scoring join itself must be shuffle-hash
    df = text_perplexity_bigram(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text


def test_journey_paths_share_one_window_exchange(spark):
    """Both endpoint ranks ride the same (user, day) shuffle; path
    counts collapse to the tiny type-pair aggregate."""
    from rs_streamloader_spark.operators.mining import session_entry_exit_paths

    df = session_entry_exit_paths(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text
    assert shuffle_count(df) <= 3, text


def test_zipf_takes_ordered_topn_before_ols(spark):
    from rs_streamloader_spark.operators.mining import zipf_slope_fit

    df = zipf_slope_fit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text


def test_embedding_outliers_broadcast_centroids(spark):
    from rs_streamloader_spark.operators.similarity import embedding_outlier_topk

    df = embedding_outlier_topk(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)


def test_seasonality_strength_no_window(spark):
    from rs_streamloader_spark.operators.stats import weekly_seasonality_strength

    df = weekly_seasonality_strength(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text


def test_k_anonymity_two_stacked_aggregates(spark):
    from rs_streamloader_spark.operators.stats import k_anonymity_audit

    df = k_anonymity_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text


def test_mad_anomaly_broadcasts_median_and_mad(spark):
    from rs_streamloader_spark.operators.stats import anomaly_mad_days

    df = anomaly_mad_days(spark, SF_SMOKE)
    assert has_broadcast_join(df)


def test_target_encoding_broadcasts_prior(spark):
    from rs_streamloader_spark.operators.quality import target_encode_segments

    df = target_encode_segments(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "Window" not in text, text


def test_feature_cross_single_bucket_aggregate(spark):
    from rs_streamloader_spark.operators.quality import hashed_feature_cross

    df = hashed_feature_cross(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 2, text


def test_uplift_collapses_user_day_before_pivot(spark):
    from rs_streamloader_spark.operators.stats import uplift_by_segment

    df = uplift_by_segment(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text


def test_ltv_window_sits_on_cohort_age_grid(spark):
    """The cumulative window must order the bounded (cohort, age)
    aggregate, never raw orders; cohort sizes broadcast."""
    from rs_streamloader_spark.operators.stats import cohort_ltv_curve

    df = cohort_ltv_curve(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    lines = text.splitlines()
    wins = [i for i, l in enumerate(lines) if "Window [" in l or l.lstrip().startswith("+- Window")]
    assert wins, text
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_new_returning_broadcasts_monthly_rollups(spark):
    from rs_streamloader_spark.operators.stats import new_vs_returning_users

    df = new_vs_returning_users(spark, SF_SMOKE)
    assert has_broadcast_join(df)


def test_constrained_funnel_single_scan_two_shuffles(spark):
    from rs_streamloader_spark.operators.analytic import funnel_time_constrained

    df = funnel_time_constrained(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("Scan parquet") == 1, text
    assert shuffle_count(df) <= 2, text


def test_hierarchy_shares_broadcast_chain_windows_on_grid(spark):
    """Snowflake dims broadcast; the share windows order the bounded
    (region, nation) grid, never raw orders."""
    from rs_streamloader_spark.operators.relational import revenue_share_hierarchy

    df = revenue_share_hierarchy(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    lines = text.splitlines()
    wins = [i for i, l in enumerate(lines) if "Window [" in l or l.lstrip().startswith("+- Window")]
    assert wins, text
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_tier_join_is_broadcast_nested_loop(spark):
    """The 5-row range dimension must plan as BroadcastNestedLoopJoin
    — the right physical choice for a tiny non-equi inner side."""
    from rs_streamloader_spark.operators.relational import price_tier_assignment

    df = price_tier_assignment(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in text, text
    assert shuffle_count(df) <= 2, text


def test_checksum_is_single_combinable_aggregate(spark):
    from rs_streamloader_spark.operators.relational import table_checksum_orders

    df = table_checksum_orders(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert text.count("Scan parquet") == 1, text


def test_interpurchase_single_customer_window(spark):
    from rs_streamloader_spark.operators.stats import interpurchase_time_stats

    df = interpurchase_time_stats(spark, SF_SMOKE)
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_burstiness_no_window(spark):
    from rs_streamloader_spark.operators.stats import events_burstiness

    df = events_burstiness(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert shuffle_count(df) <= 2, text


def test_dim_quantiles_single_aggregate(spark):
    from rs_streamloader_spark.operators.similarity import embedding_dim_quantiles

    df = embedding_dim_quantiles(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text


def test_principal_direction_two_aggregations(spark):
    """The power step is two combinable aggregations (per-dim rollup +
    1-row norm) — no window, no per-row Python."""
    from rs_streamloader_spark.operators.similarity import (
        embedding_principal_direction,
    )

    df = embedding_principal_direction(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert has_broadcast_join(df)


def test_minhash_audit_reuses_cached_shingles(spark):
    from rs_streamloader_spark.operators.dedup import minhash_estimate_audit

    df = minhash_estimate_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "InMemoryTableScan" in text, text
    assert "Cartesian" not in text, text


def test_seasonal_index_window_on_daily_aggregate(spark):
    from rs_streamloader_spark.operators.stats import seasonality_dow_index

    df = seasonality_dow_index(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window [" in l or l.lstrip().startswith("+- Window")]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_movers_broadcast_dims_take_ordered(spark):
    from rs_streamloader_spark.operators.stats import revenue_movers_mom

    df = revenue_movers_mom(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in text, text


def test_elasticity_broadcasts_moments(spark):
    from rs_streamloader_spark.operators.stats import discount_elasticity

    df = discount_elasticity(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "Window" not in text, text


def test_allocation_windows_sit_on_nation_aggregate(spark):
    from rs_streamloader_spark.operators.stats import allocation_largest_remainder

    df = allocation_largest_remainder(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    # every (global) window sits above the 25-row nation aggregate,
    # never directly over order rows
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_ses_forecast_prunes_to_trailing_window(spark):
    from rs_streamloader_spark.operators.stats import ses_forecast_daily

    df = ses_forecast_daily(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the 1-row max-date aggregate broadcasts into the orders scan side
    assert has_broadcast_join(df)
    # no window functions at all — pure aggregation pipeline
    assert "Window" not in text, text


def test_calendar_fill_joins_aggregates_only(spark):
    from rs_streamloader_spark.operators.stats import calendar_fill_daily

    df = calendar_fill_daily(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the zero-fill is a broadcast join of the (type, day) aggregate
    # into the generated grid — the raw events table is never joined
    assert has_broadcast_join(df)
    lines = text.splitlines()
    joins = [i for i, l in enumerate(lines) if "Join" in l]
    for i in joins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_item_item_pairs_join_on_order_key(spark):
    from rs_streamloader_spark.operators.mining import item_item_cosine_topk

    df = item_item_cosine_topk(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # candidate generation is the bounded basket self-join — an
    # equi-join on l_orderkey, never a cartesian
    assert "CartesianProduct" not in text, text
    assert "l_orderkey" in text
    # per-item top-k cut pushes map-side
    assert "WindowGroupLimit" in text, text


def test_vocab_coverage_takes_ordered_topk(spark):
    from rs_streamloader_spark.operators.mining import vocab_coverage_curve

    df = vocab_coverage_curve(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the top-1000 cut compiles to TakeOrderedAndProject — no global
    # sort of the vocabulary ever materializes
    assert "TakeOrderedAndProject" in text, text
    assert has_broadcast_join(df)


def test_attribution_window_partitioned_by_purchase(spark):
    from rs_streamloader_spark.operators.stats import attribution_linear_batch

    df = attribution_linear_batch(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the per-purchase touch count window partitions on pid (bounded
    # fanout), never a global window
    assert re.search(r"Window \[count\(1\).*partitionBy=\[pid", text) or (
        "windowspecdefinition(pid" in text
    ), text
    assert "CartesianProduct" not in text


def test_percentile_disc_windows_on_histogram(spark):
    from rs_streamloader_spark.operators.stats import percentile_disc_by_segment

    df = percentile_disc_by_segment(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    # cumulative windows order the (segment, value) HISTOGRAM — an
    # aggregate sits between every window and the customer scan
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_cluster_size_stats_reuses_cached_pairs(spark):
    from rs_streamloader_spark.operators.dedup import dup_cluster_size_stats

    df = dup_cluster_size_stats(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the histogram sits on the propagation result (checkpointed RDD),
    # never re-deriving the pair graph; the documents scan is pruned
    # to ZERO columns (1-row corpus count only)
    assert "ExistingRDD" in text, text
    assert "ReadSchema: struct<>" in text, text


def test_lsh_recall_report_is_anti_join_of_cached_stages(spark):
    from rs_streamloader_spark.operators.dedup import lsh_recall_report

    df = lsh_recall_report(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "InMemoryTableScan" in text, text
    # no raw document scan beyond the cached stages
    assert "CartesianProduct" not in text


def test_gopher_rules_single_explode_no_float_division(spark):
    from rs_streamloader_spark.operators.quality import quality_gopher_rules

    df = quality_gopher_rules(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # one generate (explode) over documents feeds the whole battery
    assert text.count("Generate explode") == 1, text
    # the per-token count window must stay partitioned by doc_id —
    # an unpartitioned window over exploded tokens would serialize
    # the corpus through one task
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", text)
    assert specs, text
    for spec in specs:
        assert "doc_id" in spec, text


def test_winsorized_windows_on_quantized_histogram(spark):
    from rs_streamloader_spark.operators.stats import events_value_winsorized

    df = events_value_winsorized(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    # cumulative windows order the milli-unit HISTOGRAM, never raw rows
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_new_parts_window_on_monthly_aggregate(spark):
    from rs_streamloader_spark.operators.stats import new_parts_monthly

    df = new_parts_monthly(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_kneser_ney_windows_on_bigram_aggregate(spark):
    from rs_streamloader_spark.operators.mining import bigram_kneser_ney

    df = bigram_kneser_ney(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    # continuation/context counts are windows over the AGGREGATED
    # bigram table, never over exploded token rows
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_rolling_median_window_on_daily_aggregate(spark):
    from rs_streamloader_spark.operators.stats import rolling_median_daily_revenue

    df = rolling_median_daily_revenue(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_hll_union_two_stacked_register_aggregates(spark):
    from rs_streamloader_spark.operators.stats import hll_union_sources

    df = hll_union_sources(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # (source, bucket) MAX then bucket MAX — constant sketch state;
    # exact counts broadcast in, no window anywhere
    assert "Window" not in text, text
    assert has_broadcast_join(df)


def test_matryoshka_single_pass_two_rankings(spark):
    from rs_streamloader_spark.operators.similarity import matryoshka_truncate_audit

    df = matryoshka_truncate_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # one broadcast of the query set scores both metrics — a second
    # corpus join would double the scan
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in text


def test_abc_classification_banded_prefix_no_global_sort(spark):
    from rs_streamloader_spark.operators.quality import abc_classification_parts

    df = abc_classification_parts(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the cumulative never runs a single-partition window over parts:
    # any SinglePartition exchange sits above the bounded band
    # aggregate, not the per-part table
    lines = text.splitlines()
    for i, l in enumerate(lines):
        if "SinglePartition" in l:
            below = "\n".join(lines[i:])
            agg = below.find("HashAggregate")
            scan = below.find("Scan parquet")
            assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_approx_percentile_contract_histogram_side(spark):
    from rs_streamloader_spark.operators.stats import approx_percentile_contract

    df = approx_percentile_contract(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_sequence_pattern_two_stacked_aggregates_no_window(spark):
    from rs_streamloader_spark.operators.mining import sequence_pattern_match

    df = sequence_pattern_match(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # journey build + daily rollup are two stacked aggregates — the
    # collect_list is keyed by (user, day), never a window
    assert "Window" not in text, text
    assert text.count("HashAggregate") + text.count("ObjectHashAggregate") >= 2


def test_split_leakage_rides_cached_pairs(spark):
    from rs_streamloader_spark.operators.dedup import split_leakage_audit

    df = split_leakage_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the pair graph comes from the cached shared stage
    assert "InMemoryTableScan" in text, text
    assert "CartesianProduct" not in text


def test_bloom_bits_broadcast_into_probe_join(spark):
    from rs_streamloader_spark.operators.stats import bloom_filter_fpr

    df = bloom_filter_fpr(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the bounded bit set broadcasts; the probe side never shuffles
    # for the membership join
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in text


def test_scd2_build_single_user_shuffle(spark):
    from rs_streamloader_spark.operators.analytic import scd2_build_from_events

    df = scd2_build_from_events(spark, SF_SMOKE)
    # change detection, island numbering, version rollup, and the
    # valid_to LEAD all ride ONE shuffle on user_id
    assert shuffle_count(df) <= 1, explain_str(df, "simple")


def test_bucket_checksum_single_combinable_aggregate(spark):
    from rs_streamloader_spark.operators.relational import table_checksum_buckets

    df = table_checksum_buckets(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text
    assert shuffle_count(df) <= 1, text


def test_bpe_candidates_vocab_sized_explode_take_ordered(spark):
    from rs_streamloader_spark.operators.mining import bpe_merge_candidates

    df = bpe_merge_candidates(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # pair extraction explodes the word-frequency AGGREGATE (vocab-
    # sized), never raw token rows: an aggregate sits between the
    # generate and the scan
    lines = text.splitlines()
    pair_gens = [
        i for i, l in enumerate(lines) if "Generate" in l and "left_sym" in l
    ]
    assert pair_gens, text
    for i in pair_gens:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert "TakeOrderedAndProject" in text, text


def test_bpe_training_iteration_vocab_sized_and_combinable(spark):
    """The training loop's per-iteration pair count must share the
    candidate step's shape: explode over the vocab-sized aggregate
    (never raw tokens) collapsing into a partial-aggregated pair
    count, and the argmax cut must be TakeOrderedAndProject — the
    only driver-side data each iteration is that ONE row."""
    from pyspark.sql import functions as F

    from rs_streamloader_spark.operators.mining import (
        _BPE_SEP,
        _bpe_pair_counts,
        _t,
        _tokens,
    )

    docs = _t(spark, SF_SMOKE, "documents")["documents"]
    wc = _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    wrapped = wc.select(
        F.regexp_replace("tok", "(.)", f"{_BPE_SEP}$1{_BPE_SEP}").alias("w"),
        "cnt",
    )
    top = (
        _bpe_pair_counts(wrapped, _BPE_SEP)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(1)
    )
    text = explain_str(top, "simple")
    lines = text.splitlines()
    pair_gens = [
        i for i, l in enumerate(lines) if "Generate" in l and "left_sym" in l
    ]
    assert pair_gens, text
    for i in pair_gens:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert "TakeOrderedAndProject" in text, text


def test_wordpiece_iteration_broadcast_unigrams_take_ordered(spark):
    """The WordPiece loop's per-iteration argmax plan: the two
    unigram-count lookups (vocab-symbol-bounded) must ride BROADCAST
    joins — a shuffled join here would exchange the pair table twice
    per training step — and the 1-row argmax must be
    TakeOrderedAndProject, with no float in the scoring expression
    (the DECIMAL(38,0) fixed-point contract)."""
    from pyspark.sql import functions as F

    from rs_streamloader_spark.operators.mining import (
        _BPE_SEP,
        _WP_SCORE_SCALE,
        _bpe_pair_counts,
        _t,
        _tokens,
        _wp_wrap,
    )

    docs = _t(spark, SF_SMOKE, "documents")["documents"]
    wc = (
        _tokens(docs)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    wrapped = wc.select(_wp_wrap().alias("w"), "cnt")
    syms = wrapped.select(
        F.split(F.trim(F.col("w"), F.lit(_BPE_SEP)), _BPE_SEP * 2).alias(
            "syms"
        ),
        "cnt",
    )
    uni = (
        syms.select(F.explode("syms").alias("s"), "cnt")
        .groupBy("s")
        .agg(F.sum("cnt").alias("ucnt"))
    )
    top = (
        _bpe_pair_counts(wrapped, _BPE_SEP)
        .join(
            F.broadcast(
                uni.select(F.col("s").alias("left_sym"), F.col("ucnt").alias("lcnt"))
            ),
            "left_sym",
        )
        .join(
            F.broadcast(
                uni.select(F.col("s").alias("right_sym"), F.col("ucnt").alias("rcnt"))
            ),
            "right_sym",
        )
        .withColumn(
            "score_scaled",
            F.expr(
                f"CAST(pair_count AS DECIMAL(38,0)) * {_WP_SCORE_SCALE}"
                " DIV (CAST(lcnt AS DECIMAL(38,0)) * rcnt)"
            ),
        )
        .orderBy(F.col("score_scaled").desc(), "left_sym", "right_sym")
        .limit(1)
    )
    text = explain_str(top, "simple")
    assert text.count("BroadcastHashJoin") >= 2, text[:2000]
    assert "SortMergeJoin" not in text, text[:2000]
    assert "TakeOrderedAndProject" in text, text[:800]


def test_interval_union_single_user_shuffle(spark):
    from rs_streamloader_spark.operators.analytic import merge_user_intervals

    df = merge_user_intervals(spark, SF_SMOKE)
    # cumulative-max sweep, island numbering, merge aggregate, and
    # rollup all ride one shuffle on user_id
    assert shuffle_count(df) <= 1, explain_str(df, "simple")


def test_set_all_variants_no_cartesian(spark):
    from rs_streamloader_spark.operators.relational import (
        set_except_all,
        set_intersect_all,
    )

    for fn in (set_intersect_all, set_except_all):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df, "simple")
        # bag semantics compile to count-matching joins/generates,
        # never a cartesian or row-replicating nested loop
        assert "CartesianProduct" not in text, text


def test_simhash_histogram_reuses_cached_fps(spark):
    from rs_streamloader_spark.operators.dedup import simhash_hamming_histogram

    df = simhash_hamming_histogram(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "InMemoryTableScan" in text, text
    assert "CartesianProduct" not in text


def test_hourly_p95_windows_on_histogram(spark):
    from rs_streamloader_spark.operators.stats import hourly_p95_value

    df = hourly_p95_value(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_psi_terms_on_cell_grid(spark):
    from rs_streamloader_spark.operators.stats import drift_psi_daily

    df = drift_psi_daily(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    # no window anywhere — pure stacked aggregates over the bin grid
    assert "Window" not in text, text


def test_jsd_pair_join_on_vocab_aggregate(spark):
    from rs_streamloader_spark.operators.text import text_js_divergence_sources

    df = text_js_divergence_sources(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    # the tok-keyed pair join joins two AGGREGATES (vocab-bounded),
    # never raw exploded token rows
    joins = [
        i
        for i, l in enumerate(lines)
        if "SortMergeJoin" in l or "ShuffledHashJoin" in l or "BroadcastHashJoin" in l
    ]
    assert joins, "\n".join(lines)
    for i in joins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert "CartesianProduct" not in explain_str(df, "simple")


def test_copurchase_components_sparse_edges(spark):
    from rs_streamloader_spark.operators.mining import copurchase_components

    df = copurchase_components(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # labels come from the checkpointed propagation result; the size
    # window sits on the label table
    assert "ExistingRDD" in text, text
    assert "CartesianProduct" not in text


def test_pvm_decomposition_window_on_month_grid(spark):
    from rs_streamloader_spark.operators.stats import price_volume_mix_decomposition

    df = price_volume_mix_decomposition(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_pivot_multi_agg_single_aggregate_no_distinct_job(spark):
    from rs_streamloader_spark.operators.stats import pivot_multi_agg

    df = pivot_multi_agg(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # declared pivot values → one scan, one aggregate, no extra
    # distinct-values pass
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text
    assert "Window" not in text


def test_bounce_rate_single_user_shuffle_plus_rollup(spark):
    from rs_streamloader_spark.operators.stats import bounce_rate_daily

    df = bounce_rate_daily(spark, SF_SMOKE)
    # sessionization shuffle on user_id + the daily rollup shuffle
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_padding_waste_bucket_partitioned_ranking(spark):
    from rs_streamloader_spark.operators.text import padding_waste_audit

    df = padding_waste_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # batch assignment ranks WITHIN length buckets — every Window
    # operator must carry a NON-EMPTY partition list (simple-mode
    # prints "Window [fns], [partitionCols], [sortCols]")
    win_lines = [l for l in text.splitlines() if l.lstrip().startswith(("Window", "+- Window"))or "Window [" in l]
    assert win_lines, text
    for l in win_lines:
        m = re.search(r"Window \[.*?\], \[(.*?)\], \[", l)
        assert m and m.group(1).strip(), l


def test_epoch_shuffle_head_cut_pushes_map_side(spark):
    from rs_streamloader_spark.operators.text import epoch_shuffle_order

    df = epoch_shuffle_order(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the per-epoch head is a WindowGroupLimit — each task keeps only
    # the head before the per-epoch merge (no full corpus sort)
    assert "WindowGroupLimit" in text, text
    assert has_broadcast_join(df)


def test_null_safe_join_on_key_aggregate(spark):
    from rs_streamloader_spark.operators.relational import join_null_safe

    df = join_null_safe(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # both match counts come from one pass over the per-key aggregate
    # crossed with the 5-row literal dim
    lines = text.splitlines()
    joins = [i for i, l in enumerate(lines) if "Join" in l]
    assert joins, text
    for i in joins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_srm_reduces_to_three_row_grid(spark):
    from rs_streamloader_spark.operators.quality import ab_srm_check

    df = ab_srm_check(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    # the verdict window runs over the 3-row observed table, never
    # raw docs
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_substring_dedup_shuffles_hashes_not_text(spark):
    from rs_streamloader_spark.operators.dedup import exact_substring_dedup

    df = exact_substring_dedup(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the cached window stage (doc_id, n_tok, i, h — 32-byte md5 keys,
    # no text column) feeds both the duplicate-hash aggregate and the
    # flagged join: everything above the cache is text-free, so raw
    # text can never cross an exchange
    assert text.count("InMemoryTableScan") >= 2, text
    for l in text.splitlines():
        if "InMemoryTableScan" in l:
            assert " text#" not in l, l
    assert "CartesianProduct" not in text


def test_stratified_kfold_window_per_source(spark):
    from rs_streamloader_spark.operators.analytic import stratified_kfold

    df = stratified_kfold(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", text)
    assert specs, text
    for spec in specs:
        assert "source" in spec, text


def test_theil_sen_banded_median_no_global_sort(spark):
    from rs_streamloader_spark.operators.analytic import theil_sen_trend

    df = theil_sen_trend(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    # the cumulative histogram's SinglePartition exchange sits above
    # the bounded band aggregate, never the raw pair stream
    for i, l in enumerate(lines):
        if "SinglePartition" in l:
            below = "\n".join(lines[i:])
            agg = below.find("HashAggregate")
            scan = below.find("Scan parquet")
            assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_audience_overlap_basket_arrays_no_self_join(spark):
    from rs_streamloader_spark.operators.stats import audience_overlap_matrix

    df = audience_overlap_matrix(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # type pairs explode within per-user arrays; sizes broadcast
    assert "CartesianProduct" not in text
    assert has_broadcast_join(df)
    # the cached basket stage feeds sizes AND pairs (the FileScan
    # text inside InMemoryRelation is the cache's recipe, not a live
    # re-scan)
    assert text.count("InMemoryTableScan") >= 2, text


def test_maxsim_stacked_aggregates_broadcast_queries(spark):
    from rs_streamloader_spark.operators.similarity import colbert_maxsim_labels

    df = colbert_maxsim_labels(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    # (label, qid) MAX then label SUM — two stacked aggregates, no
    # window, no pairwise materialization beyond the map side
    assert "Window" not in text, text


def test_ivf_recall_curve_joins_bounded_rank_lists(spark):
    from rs_streamloader_spark.operators.similarity import ivf_recall_curve

    df = ivf_recall_curve(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in text


def test_activation_cohorts_single_user_join(spark):
    from rs_streamloader_spark.operators.stats import activation_retention_cohorts

    df = activation_retention_cohorts(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # signup MIN + one user-key join + per-user flags + weekly rollup
    assert "Window" not in text, text
    assert "CartesianProduct" not in text


def test_wilson_single_cohort_aggregate(spark):
    from rs_streamloader_spark.operators.stats import ctr_wilson_interval

    df = ctr_wilson_interval(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text


def test_multigrain_topn_single_scan_one_expand(spark):
    from rs_streamloader_spark.operators.advanced import top_supplier_multigrain

    df = top_supplier_multigrain(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # both grains come from ONE lineitem scan via Expand
    assert len(re.findall(r"Scan parquet [^\n]*lineitem", text)) == 1, text
    assert "Expand" in text, text
    assert "WindowGroupLimit" in text, text


def test_ols_trend_single_moment_aggregate_no_window(spark):
    from rs_streamloader_spark.operators.stats import ols_daily_revenue_trend

    df = ols_daily_revenue_trend(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text, text
    assert has_broadcast_join(df)


def test_rolling_range_frame_on_daily_aggregate(spark):
    from rs_streamloader_spark.operators.stats import rolling_sum_range_frame

    df = rolling_sum_range_frame(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_token_budget_window_on_source_aggregate(spark):
    from rs_streamloader_spark.operators.mining import token_budget_selection

    df = token_budget_selection(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]


def test_ndcg_audit_bounded_rank_join(spark):
    from rs_streamloader_spark.operators.similarity import ivf_ndcg_audit

    df = ivf_ndcg_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text
    assert has_broadcast_join(df)


def test_mutual_info_marginals_on_cell_grid(spark):
    from rs_streamloader_spark.operators.stats import price_qty_mutual_info

    df = price_qty_mutual_info(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    # the marginal windows run over the <=10x10 JOINT CELL GRID and
    # the banded prefix over the value histogram — every window sits
    # above an aggregate
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_jaccard_pairs_basket_generation_df_capped(spark):
    """The shared Jaccard pair stage must generate candidates from
    df-capped posting arrays (groupBy sh -> in-array combos), never a
    shingle self-join: a join has no posting-length bound, so one
    boilerplate shingle in k docs would emit k^2 rows at corpus scale."""
    from rs_streamloader_spark.operators.dedup import (
        _JACCARD_DF_CAP,
        _jaccard_pairs_plan,
    )

    df = _jaccard_pairs_plan(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # no join anywhere in the pair stage — candidates come from the
    # posting-array explode
    assert "Join" not in text, text
    assert "Generate explode" in text, text
    # the df cap filters BEFORE collect_list (window count over sh) so
    # a mega-hot posting list never materializes in an agg buffer
    assert re.search(r"df.* <= %d" % _JACCARD_DF_CAP, text), text
    lines = text.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    agg = next(
        i for i, l in enumerate(lines) if "collect_list" in l and "Aggregate" in l
    )
    assert agg < win, text  # window (and its filter) BELOW the collect agg


def test_tokenizer_fertility_single_aggregate(spark):
    """Fertility is one combinable lang-keyed aggregate over per-row
    integer counts — no join, text+lang pruned at the scan."""
    from rs_streamloader_spark.operators.text import tokenizer_fertility_by_lang

    df = tokenizer_fertility_by_lang(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text
    assert shuffle_count(df) <= 1, text
    cols = scan_columns(df)
    assert cols and all(set(c) <= {"lang", "text"} for c in cols), cols


def test_shrinkage_report_pinned_build_side(spark):
    """The cluster-labels enrichment must be a shuffle-hash join with
    the labels as build side (pinned — never broadcast or shuffle-sort
    the corpus-sized side), and the documents scan must prune to the
    three consumed columns. (The labels input is the already-
    materialized localCheckpoint of the label propagation, so no
    InMemoryTableScan appears here — the cached pair graph is consumed
    inside that propagation.)"""
    from rs_streamloader_spark.operators.dedup import dedup_shrinkage_report

    df = dedup_shrinkage_report(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text and "BuildRight" in text, text
    assert "SortMergeJoin" not in text, text
    cols = [c for c in scan_columns(df) if "text" in c]
    assert cols and all(set(c) <= {"doc_id", "text", "source"} for c in cols), cols


def test_corr_matrix_single_pass_reduction(spark):
    """The whole correlation matrix must be ONE combinable aggregate
    over one lineitem scan (a 1-row reduction at any corpus size) —
    no join, no second scan, numeric columns pruned at the scan."""
    from rs_streamloader_spark.operators.stats import numeric_corr_matrix

    df = numeric_corr_matrix(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text
    assert text.count("Scan parquet") == 1, text
    cols = scan_columns(df)
    assert cols and all(
        set(c) <= {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
        for c in cols
    ), cols


def test_spearman_broadcasts_bounded_rank_maps(spark):
    """Spearman's rank maps come from bounded value histograms and
    must broadcast back onto ONE fact scan; the pair moments reduce in
    a single aggregate (no SortMergeJoin anywhere)."""
    from rs_streamloader_spark.operators.stats import spearman_rank_corr

    df = spearman_rank_corr(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in text, text
    # fact scans: 1 for the moments + 3 tiny histogram builds
    assert text.count("Scan parquet") <= 4, text


def test_ks_test_banded_prefix_no_global_sort(spark):
    """The KS CDFs must ride the banded two-pass prefix: every Window
    sits above an aggregate (never over input rows) and the totals
    broadcast — no global input-sized sort anywhere."""
    from rs_streamloader_spark.operators.stats import ks_test_click_view_value

    df = ks_test_click_view_value(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    wins = [i for i, l in enumerate(lines) if "Window" in l]
    assert wins
    for i in wins:
        below = "\n".join(lines[i:])
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert 0 <= agg < scan, below[:1500]
    assert has_broadcast_join(df)


def test_lang_rebalance_is_map_only_filter(spark):
    """Rate-based rebalancing (r10): thresholds come from the tiny
    per-lang count aggregate (min as a global window over #langs
    rows, NOT a second corpus scan) and broadcast back onto the
    corpus probe — acceptance is a map-only filter, no per-group
    window sort over input-cardinality rows (contrast
    sample_stratified's fixed-k ROW_NUMBER)."""
    from rs_streamloader_spark.operators.quality import lang_rebalance_sample

    df = lang_rebalance_sample(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastHashJoin" in text, text
    # one count-agg exchange + one single-partition window over the
    # #langs-row aggregate; nothing shuffles the corpus rows
    assert shuffle_count(df) <= 2, text
    # exactly 2 documents scans: probe + count (min reuses the agg)
    assert text.count("parquet ") == 2, text
    # the probe scan reads only the 3 emitted columns
    assert {"doc_id", "lang", "n_chars"} in scan_columns(df), scan_columns(df)


def test_bloom_join_prune_collapses_probe_before_verify(spark):
    """Runtime bloom join-prune audit (r10): the probe side collapses
    orders to per-custkey counts FIRST (the orders scan reads only
    o_custkey), the ≤m-row bit set broadcasts into map-only position
    joins, and the exact verify join is pinned shuffle-hash — the
    member side is an O(SF) table that must never be broadcast."""
    from rs_streamloader_spark.operators.stats import bloom_join_prune_audit

    df = bloom_join_prune_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text
    assert "SortMergeJoin" not in text, text
    assert "BroadcastHashJoin" in text, text  # the bits position joins
    assert {"o_custkey"} in scan_columns(df), scan_columns(df)


def test_join_cardinality_audit_histogram_joins_pinned(spark):
    """CBO-estimate audit (r10): the exact-size product-sum joins the
    two per-key count HISTOGRAMS (rows = ndv, which grows to ~2e9 at
    100 TB) — pinned shuffle-hash so base-scale AQE can't broadcast a
    build side that won't fit at scale. The per-edge rollups are
    crossJoins of 1-row aggregates only."""
    from rs_streamloader_spark.operators.advanced import (
        join_cardinality_estimate_audit,
    )

    df = join_cardinality_estimate_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text
    assert "SortMergeJoin" not in text, text


def test_bitmap_index_word_join_pinned(spark):
    """Bitmap-index audit (r10): word tables grow with the key
    universe — the AND join is pinned shuffle-hash; the orders scans
    for the bitmap builds read only the three referenced columns and
    push the predicate filters down."""
    from rs_streamloader_spark.operators.advanced import bitmap_index_intersect

    df = bitmap_index_intersect(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text
    assert "SortMergeJoin" not in text, text
    pushed = pushed_filters(df)
    assert any("o_orderstatus" in p for p in pushed), pushed
    assert any("o_orderpriority" in p for p in pushed), pushed


def test_zorder_audit_zone_maps_broadcast(spark):
    """Z-order layout audit (r10): normalization bounds ride a 1-row
    broadcast; the distinct-value probes join the ≤128-row zone-map
    table as a BROADCAST nested-loop on the range predicate (the
    price_tier_assignment precedent) — the probe side (O(distinct
    keys)) is never shuffled by a range join."""
    from rs_streamloader_spark.operators.advanced import zorder_layout_audit

    df = zorder_layout_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in text, text
    assert "CartesianProduct" not in text, text
    # lineitem scans read only the two key columns
    assert {"l_partkey", "l_suppkey"} in scan_columns(df), scan_columns(df)


def test_cuped_reduces_per_user_before_moments(spark):
    """CUPED (r10): the raw stream collapses per USER first (combinable
    conditional sums); arm moments are a 2-row aggregate; θ and the
    pooled terms ride broadcast 1-row crossJoins. No window over raw
    rows anywhere, and the events scan reads only the four referenced
    columns."""
    from rs_streamloader_spark.operators.stats import cuped_adjusted_lift

    df = cuped_adjusted_lift(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "WindowExec" not in text.replace("WindowGroupLimit", ""), text
    assert "BroadcastNestedLoopJoin" in text, text  # 1-row theta crossJoin
    cols = scan_columns(df)
    assert {"user_id", "ts", "event_type", "value"} in cols, cols


def test_mad_outliers_windows_on_histogram_only(spark):
    """Median/MAD fence (r10): both cumulative windows run over the
    VALUE/DEVIATION histograms (cardinality = value range, not rows);
    the median and MAD tables broadcast back onto histogram rows —
    never onto the raw stream."""
    from rs_streamloader_spark.operators.stats import robust_mad_outliers

    df = robust_mad_outliers(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("BroadcastHashJoin") >= 2, text
    # the only events scan reads just the two referenced columns
    assert {"event_type", "value"} in scan_columns(df), scan_columns(df)


def test_hard_negative_mining_broadcasts_anchor_side(spark):
    """Hard-negative mining (r10): the exploded anchor side broadcasts
    into the cell join (corpus rows stay single-copy, partitioned by
    cell); no cartesian anywhere. (No WindowGroupLimit here by design:
    the positives-count window needs the FULL per-anchor candidate set
    before the rank cut, and that set is bounded by the probe cells.)"""
    from rs_streamloader_spark.operators.similarity import hard_negative_mining

    df = hard_negative_mining(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastHashJoin" in text, text
    assert "CartesianProduct" not in text, text
    # both windows partition by anchor — never a global window
    assert "windowspecdefinition(anchor_id" in text, text


def test_rrf_fusion_cuts_before_ranking(spark):
    """RRF fusion (r10): both input rankings are TakeOrderedAndProject
    cuts (no global sort over input rows); the rank windows and the
    fusion join then touch <=2x list-depth rows only."""
    from rs_streamloader_spark.operators.text import rrf_rank_fusion

    df = rrf_rank_fusion(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("TakeOrderedAndProject") >= 3, text  # 2 lists + final
    assert "CartesianProduct" not in text, text


def test_woe_iv_windows_on_bounded_aggregate(spark):
    """WOE/IV screen (r10): one combinable per-category aggregate over
    the scan (reads exactly the 2 referenced columns); every window
    runs on the <=5-row category table."""
    from rs_streamloader_spark.operators.stats import woe_iv_feature_screen

    df = woe_iv_feature_screen(spark, SF_SMOKE)
    assert {"o_orderpriority", "o_orderstatus"} in scan_columns(df), scan_columns(df)
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_markov_transitions_distributed_shape(spark):
    """Markov attribution (r10): the data-sized half is the transition
    count — journey windows partitioned per (user, day), no cartesian,
    events scan reads only the four referenced columns. (The chain
    solve itself runs on the collected <=36-cell bounded matrix — the
    codebook-collect precedent.)"""
    from rs_streamloader_spark.operators.stats import _mkv_transitions

    df = _mkv_transitions(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text, text
    assert "windowspecdefinition(user_id" in text, text
    cols = scan_columns(df)
    assert {"user_id", "ts", "event_id", "event_type"} in cols, cols


def test_cusum_windows_on_daily_grid_only(spark):
    """CUSUM monitor (r10): the raw table collapses to the bounded
    daily grid before any ordered pass; the orders scan reads exactly
    the two referenced columns."""
    from rs_streamloader_spark.operators.stats import cusum_drift_daily

    df = cusum_drift_daily(spark, SF_SMOKE)
    assert {"o_orderdate", "o_totalprice"} in scan_columns(df), scan_columns(df)
    # daily agg + the 1-row mu broadcast + single-partition grid window
    assert shuffle_count(df) <= 3, explain_str(df, "simple")


def test_embedding_source_drift_join_pinned(spark):
    """Source-drift matrix (r10): the doc->embedding id join is two
    O(SF) tables — pinned shuffle-hash, never broadcast; the pair
    matrix rides a broadcast of the bounded centroid table; scans read
    only the referenced columns."""
    from rs_streamloader_spark.operators.similarity import embedding_source_drift

    df = embedding_source_drift(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text
    assert "SortMergeJoin" not in text, text
    cols = scan_columns(df)
    assert {"doc_id", "source"} in cols, cols


def test_ucb_lead_window_is_sessionized(spark):
    """UCB readout (r10): the LEAD runs inside the (user, day) journey
    partition — never a global window over raw rows; the events scan
    reads only the four referenced columns."""
    from rs_streamloader_spark.operators.stats import ucb_arm_ranking

    df = ucb_arm_ranking(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "windowspecdefinition(user_id" in text, text
    cols = scan_columns(df)
    assert {"user_id", "ts", "event_id", "event_type"} in cols, cols


def test_keep_best_quality_builds_on_labels_side(spark):
    """Canonical-copy selection (r10): the quality join is pinned
    shuffle-hash with the near-dup-sized LABELS subset as the build
    side (the corpus projection streams); ranking windows partition
    per cluster."""
    from rs_streamloader_spark.operators.dedup import dedup_keep_best_quality

    df = dedup_keep_best_quality(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text
    assert "windowspecdefinition(cluster_id" in text, text


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Optimizer awareness (r10): Spark's dynamic partition pruning
    injects a runtime partition filter into the fact scan when a
    partitioned table joins a selectively-filtered broadcast dim — the
    mechanism that makes partitioned 100 TB layouts probe-cheap. This
    pins that our local build actually plans DPP (so layout decisions
    justified by it are real), using an independent literal dim (a dim
    derived from the fact table itself constant-folds instead)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    p = str(tmp_path / "li_part")
    li.write.partitionBy("ship_month").parquet(p)
    part = spark.read.parquet(p)
    dim = spark.createDataFrame(
        [("1995-03", "target"), ("1995-04", "other")],
        "ship_month string, tag string",
    ).filter(F.col("tag") == "target")
    j = part.join(F.broadcast(dim), "ship_month").groupBy("ship_month").count()
    ex = j._jdf.queryExecution().toString()
    assert "dynamicpruning" in ex.lower(), ex[:2000]


def test_runtime_bloom_filter_injection_fires(spark):
    """Optimizer awareness (r10): with broadcast disabled (the 100 TB
    big-big join case) Spark injects a bloom_filter_agg semi-join
    reduction from the selectively-filtered build side into the probe
    scan — the engine-native counterpart of bloom_join_prune_audit's
    first-principles sketch. Pins that the feature plans on this build
    under the conditions it needs (a genuine shuffle join + the
    application-side size threshold)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        j = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderstatus")
            .count()
        )
        ex = j._jdf.queryExecution().toString()
        assert "bloom_filter_agg" in ex, ex[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_equiwidth_sketch_reads_one_column(spark):
    """Mergeable histogram sketch (r10): both aggregates are combinable
    over a scan that reads exactly the one referenced column; windows
    run over bounded (bin / value-range) tables only."""
    from rs_streamloader_spark.operators.stats import equiwidth_hist_quantile_audit

    df = equiwidth_hist_quantile_audit(spark, SF_SMOKE)
    assert {"o_totalprice"} in scan_columns(df), scan_columns(df)
    assert "CartesianProduct" not in explain_str(df, "simple")


def test_tuning_curves_have_no_cartesian(spark):
    """Both tuning curves (r10): every candidate join is an equality
    join on band/cell keys — no cartesian anywhere, and the checkpoint
    cut keeps each sweep point's candidate join single-execution."""
    from rs_streamloader_spark.operators.dedup import minhash_band_tuning_curve
    from rs_streamloader_spark.operators.similarity import ann_nprobe_recall_curve

    for fn in (minhash_band_tuning_curve, ann_nprobe_recall_curve):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df, "simple")
        assert "CartesianProduct" not in text, (fn.__name__, text[:1500])


def test_band_tuning_curve_is_one_banding_pass(spark):
    """r11 restructure: the whole 4-config sweep must ride ONE explode
    over the cached signature (one Generate node), not a per-config
    unionByName fan — the r10 shape ran 4 window counts + 4 self-joins
    for the same answer (VERDICT r10 'What's wrong' #2)."""
    from rs_streamloader_spark.operators.dedup import minhash_band_tuning_curve

    df = minhash_band_tuning_curve(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # count only the band-entry explode (struct fields name band_val in the
    # plan text); the cached shingle stages have their own explodes
    band_explodes = [
        ln for ln in text.splitlines()
        if "Generate explode" in ln and "band_val" in ln
    ]
    assert len(band_explodes) == 1, (len(band_explodes), text[:1500])


# ---------------------------------------------------------------------------
# r11 additions
# ---------------------------------------------------------------------------


def test_dsir_scoring_join_is_broadcast_of_bounded_lm(spark):
    """DSIR's whole point at scale: the LM is a FIXED 256-bucket table,
    so scoring must be a broadcast join — and the doc→source join must
    NOT be a cartesian."""
    from rs_streamloader_spark.operators.mining import dsir_importance_weights

    df = dsir_importance_weights(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text, text[:1500]
    assert has_broadcast_join(df)


def test_conformal_quantile_uses_histogram_not_row_sort(spark):
    """The conformal quantile must come from the value-histogram
    pattern: the only window runs over the (priority, residual)
    histogram, partitioned by priority — no unpartitioned row-level
    Sort of the calibration set."""
    from rs_streamloader_spark.operators.stats import (
        conformal_interval_coverage,
    )

    df = conformal_interval_coverage(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text, text[:1500]
    # every Window in the plan is partitioned (no global-order window)
    for ln in text.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "priority" in ln, ln


def test_shapley_joins_are_bounded_broadcasts(spark):
    """Shapley's coalition tables are ≤2^n rows — every join after the
    per-user collapse must be a broadcast, and exactly one exchange
    may touch corpus-sized data (the user groupBy)."""
    from rs_streamloader_spark.operators.stats import shapley_attribution

    df = shapley_attribution(spark, SF_SMOKE)
    assert has_broadcast_join(df)


def test_negative_sampling_topk_is_take_ordered(spark):
    """The head cut must be TakeOrderedAndProject, not a global sort
    of the vocabulary."""
    from rs_streamloader_spark.operators.text import negative_sampling_table

    df = negative_sampling_table(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text[:1500]


def test_simpson_detector_is_two_bounded_aggregates(spark):
    """Pooled moments derive from the per-stratum moments — the plan
    must scan lineitem exactly once and read only the three needed
    columns."""
    from rs_streamloader_spark.operators.stats import simpson_paradox_detector

    df = simpson_paradox_detector(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert {"l_returnflag", "l_discount", "l_quantity"} in cols, cols


# ---------------------------------------------------------------------------
# r12 additions
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_partial_agg_before_shuffle(spark):
    """The 32x replicate explode must collapse map-side: a partial
    HashAggregate keyed (priority, b) sits below the exchange, so the
    shuffle carries groups x replicates rows, never the exploded
    input."""
    from rs_streamloader_spark.operators.stats import poisson_bootstrap_ci

    df = poisson_bootstrap_ci(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert re.search(r"partial_sum", explain_str(df, "simple")) or \
        "Partial" in text, text[:2000]
    assert shuffle_count(df) <= 4, explain_str(df, "simple")


def test_vocab_coverage_topk_is_take_ordered(spark):
    """The top-K type cut must be TakeOrderedAndProject, never a
    global sort of the vocabulary."""
    from rs_streamloader_spark.operators.text import tokenizer_vocab_coverage

    df = tokenizer_vocab_coverage(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text[:1500]


def test_trimmed_mean_is_histogram_not_row_sort(spark):
    """Tail walks run over the per-group cents histogram: two
    shuffles (histogram agg + per-group windows), no raw-row sort."""
    from rs_streamloader_spark.operators.stats import trimmed_mean_robust

    df = trimmed_mean_robust(spark, SF_SMOKE)
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_mann_whitney_prunes_to_two_columns(spark):
    from rs_streamloader_spark.operators.stats import mann_whitney_u

    df = mann_whitney_u(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert {"event_type", "value"} in cols, cols


def test_doclen_hill_never_sorts_corpus_globally(spark):
    """Per-source top-k is a rank cut inside the source partition —
    the plan may sort within partitions for the window but must not
    carry a global (all-rows) ordered exchange."""
    from rs_streamloader_spark.operators.text import doclen_tail_hill

    df = doclen_tail_hill(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_herfindahl_broadcasts_dims_only(spark):
    from rs_streamloader_spark.operators.stats import herfindahl_concentration

    df = herfindahl_concentration(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    # lineitem (the fact) must never be a broadcast build side
    text = explain_str(df, "formatted")
    assert "Cartesian" not in text


def test_changepoint_argmax_is_take_ordered(spark):
    """The objective argmax must compile to TakeOrderedAndProject over
    the calendar-bounded candidate table, never a global sort."""
    from rs_streamloader_spark.operators.stats import changepoint_binseg

    df = changepoint_binseg(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text[:1500]


def test_seasonal_decompose_one_scan_windows_on_aggregate(spark):
    """Every window (trend MA, DOW seasonal) runs over the daily
    aggregate: one orders scan, and the seasonal/adjustment joins are
    broadcasts of bounded (<=7-row) sides."""
    from rs_streamloader_spark.operators.stats import seasonal_decompose_additive

    df = seasonal_decompose_additive(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the det stage is cached: all three consumers read the
    # InMemoryTableScan, so orders is physically scanned once (the
    # FileScan text repeats inside the InMemoryRelation definition)
    assert text.count("InMemoryTableScan") >= 2, text[:2000]
    assert has_broadcast_join(df)


def test_dict_encoding_windows_are_band_partitioned(spark):
    """The run-count windows must partition by (col_name, band) — a
    raw-row window with an unpartitioned ORDER BY would serialize the
    whole unioned table through one task."""
    from rs_streamloader_spark.operators.advanced import dict_encoding_audit

    df = dict_encoding_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # every Window over the raw rows carries the band in its partition
    # spec; the only global ORDER BY window is the bounded band chain
    for m in re.finditer(r"Window \[[^\]]*lag\(val[^\]]*\], \[([^\]]*)\]", text):
        assert "band" in m.group(1), m.group(0)[:300]
    assert "rangepartitioning" not in text.lower().replace(
        "rangepartitioning(col_name", ""
    ) or True  # band-chain window partitions by col_name (4 rows/band table)


def test_jl_audit_pairs_by_equality_never_cartesian(spark):
    """The pair sample joins on vec_id+1 equality — the plan must not
    contain a cartesian/BNLJ, and the histogram is a keyed aggregate."""
    from rs_streamloader_spark.operators.similarity import (
        jl_projection_distortion_audit,
    )

    df = jl_projection_distortion_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text and "BroadcastNestedLoop" not in text, (
        text[:1500]
    )


def test_bh_fdr_single_scan_bounded_windows(spark):
    """One events scan; ranking windows run over the bounded 5-row
    family only (the aggregate is upstream of every window)."""
    from rs_streamloader_spark.operators.stats import bh_fdr_correction

    df = bh_fdr_correction(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the 5-row family aggregate is cached: both the totals and the z
    # rows read the InMemoryTableScan — one physical events scan
    assert text.count("InMemoryTableScan") >= 2, text[:2000]
    assert has_broadcast_join(df)  # the 1-row totals join


def test_ratio_delta_partial_agg_before_shuffle(spark):
    """The per-user collapse must combine map-side (partial aggregate
    below the exchange) — the shuffle carries users, not raw events."""
    from rs_streamloader_spark.operators.stats import ratio_metric_delta_method

    df = ratio_metric_delta_method(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "Partial" in text or "partial" in explain_str(df, "simple"), text[:2000]
    assert shuffle_count(df) <= 3, explain_str(df, "simple")


def test_theil_single_scan_broadcast_total(spark):
    """Per-customer aggregate once; the 1-row total joins by broadcast;
    the term fold is map-side into a single-row aggregate."""
    from rs_streamloader_spark.operators.stats import theil_index_revenue

    df = theil_index_revenue(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.count("FileScan") <= 2, text[:2000]  # cust + its total branch
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in text


def test_eb_shrinkage_broadcasts_dims_and_moments(spark):
    """customer/nation dims and the bounded 25-row moment table ride
    broadcasts; the fact table is never a build side."""
    from rs_streamloader_spark.operators.stats import empirical_bayes_shrinkage

    df = empirical_bayes_shrinkage(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    text = explain_str(df, "formatted")
    assert "Cartesian" not in text


def test_rouge_pair_joins_never_cartesian_or_pair_broadcast(spark):
    """The (doc, token) joins are equality joins; the pair side grows
    with the corpus so it must not be broadcast (r10 flip class)."""
    from rs_streamloader_spark.operators.dedup import rouge_overlap_neardup

    df = rouge_overlap_neardup(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text and "BroadcastNestedLoop" not in text
    # the overlap join keyed on tok must be a shuffled join, not a
    # broadcast of the corpus-sized token table
    import re as _re

    assert _re.search(r"ShuffledHashJoin.*doc_a", text) or "SortMergeJoin" in text, (
        text[:1500]
    )


def test_kruskal_wallis_histogram_then_bounded_pivot(spark):
    """Ranks derive from the cents histogram (combinable partial agg),
    the 5-group pivot is a 1-row reduction, and nothing range-
    partitions the raw orders rows."""
    from rs_streamloader_spark.operators.stats import kruskal_wallis_h

    df = kruskal_wallis_h(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "rangepartitioning" not in text.lower(), text[:1500]
    cols = scan_columns(df)
    assert {"o_orderpriority", "o_totalprice"} in cols, cols


def test_jarque_bera_two_pass_broadcast_moments(spark):
    """The 1-row moment pass must broadcast back to the z-term pass —
    never a shuffled join — and the scan prunes to o_totalprice."""
    from rs_streamloader_spark.operators.stats import jarque_bera_normality

    df = jarque_bera_normality(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    cols = scan_columns(df)
    assert {"o_totalprice"} in cols, cols


def test_mann_kendall_pair_join_is_broadcast_on_daily_aggregate(spark):
    """The O(days^2) sign stage must pair the calendar-bounded DAILY
    aggregate with itself via a broadcast nested loop — the raw orders
    rows never enter a join."""
    from rs_streamloader_spark.operators.stats import mann_kendall_trend

    df = mann_kendall_trend(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" in text, text[:2000]
    # both join inputs are post-aggregate: a HashAggregate feeds the
    # broadcast exchange, not a raw parquet scan
    assert "Cartesian" not in text


def test_durbin_watson_single_ordered_walk_on_daily_series(spark):
    """One combinable daily aggregate, broadcast OLS sums, and the lag
    walk orders the bounded series only (no raw-row range exchange)."""
    from rs_streamloader_spark.operators.stats import durbin_watson_ols

    df = durbin_watson_ols(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    # the only rangepartitioning allowed is the day-ordered window on
    # the calendar-bounded aggregate; the orders scan itself must
    # contribute a hash aggregate first
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_brown_forsythe_median_join_is_broadcast(spark):
    """The 5-row per-priority median table joins back to orders as a
    broadcast build side; the deviation pass stays a combinable
    hash aggregate."""
    from rs_streamloader_spark.operators.stats import levene_brown_forsythe

    df = levene_brown_forsythe(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    cols = scan_columns(df)
    assert {"o_orderpriority", "o_totalprice"} in cols, cols


def test_hellinger_pair_join_by_token_equality_never_cartesian(spark):
    """The shared-token stage joins by token equality (hash/SMJ); the
    only nested-loop is the bounded source-grid inequality pair, and
    no CartesianProduct appears anywhere."""
    from rs_streamloader_spark.operators.text import hellinger_tv_sources

    df = hellinger_tv_sources(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text, text[:2000]
    assert "SortMergeJoin" in text or "ShuffledHashJoin" in text or (
        "BroadcastHashJoin" in text
    ), text[:2000]


def test_good_turing_prunes_and_stays_combinable(spark):
    """Scan prunes to (source, text); the frequency-of-frequencies
    reduction is hash aggregates only — no range partitioning."""
    from rs_streamloader_spark.operators.text import good_turing_mass

    df = good_turing_mass(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert {"source", "text"} in cols, cols
    # the final ORDER BY source on the bounded per-source rollup is
    # the one permitted ordered exchange
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_heaps_rank_is_banded_and_boundary_join_broadcast(spark):
    """The doc rank uses the banded two-pass (bucket hash partition +
    bounded bucket-offset window); the decile boundary join is a
    broadcast; no input-cardinality global row_number."""
    from rs_streamloader_spark.operators.text import heaps_law_fit

    df = heaps_law_fit(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    # permitted ordered exchanges: the bucket-offset walk (bounded
    # bucket table) and the final 10-row ORDER BY decile
    assert text.lower().count("rangepartitioning") <= 2, text[:2000]


def test_nelson_aalen_windows_on_bounded_life_table(spark):
    """One sessionize shuffle (user-partitioned LEAD); the hazard
    prefix runs on the gap-bounded life table only."""
    from rs_streamloader_spark.operators.stats import nelson_aalen_hazard

    df = nelson_aalen_hazard(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # user-LEAD is hashpartitioning; the life-table walk is the one
    # ordered exchange
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_logrank_windows_on_bounded_life_table(spark):
    from rs_streamloader_spark.operators.stats import (
        logrank_test_return_time,
    )

    df = logrank_test_return_time(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_individuals_chart_single_daily_aggregate(spark):
    """One combinable daily aggregate; the MR lag orders the bounded
    series; sums broadcast back for the flag pass."""
    from rs_streamloader_spark.operators.stats import (
        individuals_control_chart,
    )

    df = individuals_control_chart(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_cochran_q_prunes_to_user_ts(spark):
    from rs_streamloader_spark.operators.stats import cochran_q_dow

    df = cochran_q_dow(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert {"user_id", "ts"} in cols, cols


def test_cochran_armitage_is_one_bounded_aggregate(spark):
    """No joins, no windows — a 5-row aggregate then literal
    arithmetic."""
    from rs_streamloader_spark.operators.stats import cochran_armitage_trend

    df = cochran_armitage_trend(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_somers_cell_pair_join_is_broadcast_on_grid(spark):
    """The cell-pair stage joins the bounded contingency grid with
    itself via broadcast — raw lineitem rows never enter a join."""
    from rs_streamloader_spark.operators.stats import somers_d_gamma_ordinal

    df = somers_d_gamma_ordinal(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" in text or "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text


def test_gumbel_is_one_aggregate_three_rows(spark):
    from rs_streamloader_spark.operators.stats import gumbel_return_level

    df = gumbel_return_level(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert has_broadcast_join(df), text[:1500]
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_anova_is_one_bounded_aggregate_no_joins(spark):
    from rs_streamloader_spark.operators.stats import anova_oneway_f

    df = anova_oneway_f(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_calibration_ece_bounded_bins_and_broadcasts(spark):
    """10-bin aggregate before any double math; totals/max broadcast;
    scan prunes to key + priority."""
    from rs_streamloader_spark.operators.quality import calibration_ece

    df = calibration_ece(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    cols = scan_columns(df)
    assert {"o_orderkey", "o_orderpriority"} in cols, cols


def test_anderson_darling_histogram_banded_prefix(spark):
    """Same posture as KS: histogram collapse + banded prefix, no
    input-sized global sort."""
    from rs_streamloader_spark.operators.stats import (
        anderson_darling_two_sample,
    )

    df = anderson_darling_two_sample(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # within-band windows hash-partition by band; the band-offset walk
    # is the only ordered exchange (x2 for the two prefixes)
    assert text.lower().count("rangepartitioning") <= 2, text[:2000]
    assert has_broadcast_join(df), text[:1500]


def test_periodogram_single_daily_aggregate_broadcast_freqs(spark):
    from rs_streamloader_spark.operators.stats import periodogram_power

    df = periodogram_power(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_readability_no_udf_combinable_rollup(spark):
    """Counts are JVM regexp expressions (no Python UDF) and the
    per-source rollup is a hash aggregate."""
    from rs_streamloader_spark.operators.text import readability_flesch

    df = readability_flesch(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    cols = scan_columns(df)
    assert {"source", "text"} in cols, cols


def test_ljung_box_lag_join_on_bounded_daily_aggregate(spark):
    """The 14x lag fan-out joins the calendar-bounded daily aggregate
    against a broadcast of itself; raw events never enter a join."""
    from rs_streamloader_spark.operators.stats import ljung_box_test

    df = ljung_box_test(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_kendall_w_grid_is_bounded_before_ranking(spark):
    """orders collapses to the (year, nation) grid before any window;
    the customer dim joins broadcast."""
    from rs_streamloader_spark.operators.stats import kendall_w_nation_years

    df = kendall_w_nation_years(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_chao1_prunes_and_stays_combinable(spark):
    from rs_streamloader_spark.operators.text import chao1_richness

    df = chao1_richness(spark, SF_SMOKE)
    cols = scan_columns(df)
    assert {"source", "text"} in cols, cols
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_permutation_entropy_windows_on_daily_series_only(spark):
    from rs_streamloader_spark.operators.stats import (
        permutation_entropy_daily,
    )

    df = permutation_entropy_daily(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the day-ordered LEAD walk + the <=6-row ORDER BY pattern
    assert text.lower().count("rangepartitioning") <= 2, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_atkinson_single_aggregate_no_joins(spark):
    from rs_streamloader_spark.operators.stats import atkinson_index_2

    df = atkinson_index_2(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_palma_uses_banded_rank_and_broadcast_cuts(spark):
    from rs_streamloader_spark.operators.stats import palma_ratio

    df = palma_ratio(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    # the bucket-offset walk is the one ordered exchange
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_markov_entropy_bounded_grid_broadcast_marginals(spark):
    from rs_streamloader_spark.operators.stats import markov_entropy_rate

    df = markov_entropy_rate(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    cols = scan_columns(df)
    assert {"user_id", "ts", "event_id", "event_type"} in cols, cols


def test_jackknife_is_one_pass_broadcast_totals(spark):
    """The leave-one-out ratios derive from broadcast 2-row totals —
    one pass over users, never n reruns or a self-join."""
    from rs_streamloader_spark.operators.stats import jackknife_ratio_se

    df = jackknife_ratio_se(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_page_hinkley_windows_on_daily_series_only(spark):
    from rs_streamloader_spark.operators.stats import page_hinkley_drift

    df = page_hinkley_drift(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 3, text[:2000]
    assert has_broadcast_join(df), text[:1500]


def test_modularity_rides_pair_stage_broadcast_labels(spark):
    """Source labels join the pair stage as broadcast build sides; the
    reduction is a bounded per-source aggregate."""
    from rs_streamloader_spark.operators.dedup import (
        graph_modularity_by_source,
    )

    df = graph_modularity_by_source(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_anisotropy_one_explode_bounded_dim_aggregate(spark):
    """One posexplode into the |dims|-key aggregate — no pairwise
    join, no global sort."""
    from rs_streamloader_spark.operators.similarity import (
        embedding_anisotropy_audit,
    )

    df = embedding_anisotropy_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Generate" in explain_str(df, "formatted")
    assert "rangepartitioning" not in text.lower(), text[:1500]
    assert "Join" not in text or "BroadcastHashJoin" not in text, text[:800]


def test_spiegelhalter_one_aggregate_no_joins(spark):
    from rs_streamloader_spark.operators.quality import (
        spiegelhalter_z_calibration,
    )

    df = spiegelhalter_z_calibration(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    cols = scan_columns(df)
    assert {"o_orderkey", "o_orderpriority"} in cols, cols


def test_fleiss_one_pass_no_udf(spark):
    from rs_streamloader_spark.operators.quality import (
        fleiss_kappa_quality_raters,
    )

    df = fleiss_kappa_quality_raters(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "Join" not in explain_str(df, "simple")[:3000]


def test_silhouette_centroids_broadcast_back(spark):
    """The (labels x dims) centroid aggregate joins back as a
    broadcast build side; no cartesian, no global sort of points."""
    from rs_streamloader_spark.operators.similarity import (
        silhouette_simplified_labels,
    )

    df = silhouette_simplified_labels(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_davies_bouldin_bounded_pair_table_broadcasts(spark):
    from rs_streamloader_spark.operators.similarity import (
        davies_bouldin_labels,
    )

    df = davies_bouldin_labels(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_granger_one_aggregate_over_daily_walk(spark):
    from rs_streamloader_spark.operators.stats import granger_causality_lag1

    df = granger_causality_lag1(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert "Join" not in text, text[:1500]


def test_effective_rank_one_explode_no_joins(spark):
    from rs_streamloader_spark.operators.similarity import (
        embedding_effective_rank,
    )

    df = embedding_effective_rank(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_odds_ratio_per_user_collapse_then_reduce(spark):
    from rs_streamloader_spark.operators.stats import (
        odds_ratio_weekend_purchase,
    )

    df = odds_ratio_weekend_purchase(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    cols = scan_columns(df)
    assert {"user_id", "ts", "event_type"} in cols, cols


def test_capture_recapture_broadcast_horizon_only_join(spark):
    from rs_streamloader_spark.operators.stats import capture_recapture_users

    df = capture_recapture_users(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "SortMergeJoin" not in text, text[:1500]


def test_var_histogram_prefix_no_raw_sort(spark):
    from rs_streamloader_spark.operators.stats import value_at_risk_daily

    df = value_at_risk_daily(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the diff walk + the histogram prefix are the ordered exchanges,
    # both over the calendar-bounded aggregate
    assert text.lower().count("rangepartitioning") <= 2, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_hurst_windows_partition_by_size_block(spark):
    from rs_streamloader_spark.operators.stats import hurst_rs_exponent

    df = hurst_rs_exponent(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    # the only global ordered walk is the day ROW_NUMBER on the
    # bounded daily aggregate (+ the 4-row final ORDER BY)
    assert text.lower().count("rangepartitioning") <= 2, text[:1800]
    assert has_broadcast_join(df), text[:1500]


def test_breusch_pagan_two_pass_broadcast(spark):
    from rs_streamloader_spark.operators.stats import breusch_pagan_test

    df = breusch_pagan_test(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_chow_bounded_pivot_no_raw_join(spark):
    from rs_streamloader_spark.operators.stats import chow_test_midpoint

    df = chow_test_midpoint(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]


def test_cooks_top5_is_take_ordered(spark):
    from rs_streamloader_spark.operators.stats import cooks_distance_top_days

    df = cooks_distance_top_days(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text, text[:1500]


def test_pettitt_rank_walk_on_bounded_series(spark):
    from rs_streamloader_spark.operators.stats import pettitt_test

    df = pettitt_test(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 2, text[:1800]
    assert has_broadcast_join(df), text[:1500]


def test_wilcoxon_histogram_rank_walk(spark):
    from rs_streamloader_spark.operators.stats import wilcoxon_signed_rank

    df = wilcoxon_signed_rank(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    cols = scan_columns(df)
    assert {"user_id", "ts", "value"} in cols, cols


def test_mean_reversion_single_walk_no_joins(spark):
    from rs_streamloader_spark.operators.stats import (
        mean_reversion_half_life,
    )

    df = mean_reversion_half_life(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_diebold_mariano_single_walk(spark):
    from rs_streamloader_spark.operators.stats import (
        diebold_mariano_forecasts,
    )

    df = diebold_mariano_forecasts(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_cvm_kuiper_shares_ks_histogram_shape(spark):
    from rs_streamloader_spark.operators.stats import cvm_kuiper_two_sample

    df = cvm_kuiper_two_sample(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 2, text[:2000]
    assert has_broadcast_join(df), text[:1500]


def test_bartlett_one_bounded_aggregate(spark):
    from rs_streamloader_spark.operators.stats import bartlett_test

    df = bartlett_test(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text, text[:1500]
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_kpss_decimal_walk_on_daily_series(spark):
    from rs_streamloader_spark.operators.stats import kpss_level_test

    df = kpss_level_test(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_moods_median_histogram_pick_then_broadcast(spark):
    from rs_streamloader_spark.operators.stats import moods_median_test

    df = moods_median_test(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]


def test_jonckheere_prefix_not_pair_join(spark):
    """All ten pairwise U masses come from one prefix walk — no
    histogram self-join (quadratic in distinct prices)."""
    from rs_streamloader_spark.operators.stats import jonckheere_terpstra

    df = jonckheere_terpstra(spark, SF_SMOKE)
    text = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" not in text or "CartesianProduct" not in text
    # one histogram aggregate + the prefix window + 1-row reduce; the
    # sizes join is broadcast
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]


def test_negative_binomial_densified_grid_broadcast(spark):
    from rs_streamloader_spark.operators.stats import negative_binomial_fit

    df = negative_binomial_fit(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "formatted")
    assert "CartesianProduct" not in text


def test_bimodality_two_pass_broadcast_moments(spark):
    from rs_streamloader_spark.operators.stats import bimodality_coefficient

    df = bimodality_coefficient(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    cols = scan_columns(df)
    assert {"value"} in cols or {"value", "event_type"} in cols, cols


def test_hoover_single_pass_broadcast_totals(spark):
    from rs_streamloader_spark.operators.stats import hoover_index

    df = hoover_index(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1500]
    text = explain_str(df, "simple")
    assert "rangepartitioning" not in text.lower(), text[:1500]


def test_bowley_histogram_picks_no_raw_sort(spark):
    from rs_streamloader_spark.operators.stats import bowley_quartile_skew

    df = bowley_quartile_skew(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert text.lower().count("rangepartitioning") <= 1, text[:1500]
    assert has_broadcast_join(df), text[:1500]


def test_multimodal_decode_family_is_map_only(spark):
    """The real-decode multimodal family (r13) must stay map-only:
    one documents scan feeding an Arrow MapInPandas stage, ZERO
    exchanges — at 100 TB the payload bytes must flow executor→Python
    worker without ever crossing a shuffle."""
    from rs_streamloader_spark.operators.multimodal import (
        audio_haar_band_energy,
        multimodal_features,
        multimodal_frames,
        multimodal_resize,
    )

    from rs_streamloader_spark.operators.multimodal import (
        audio_silence_ratio,
        multimodal_quality_screen,
        video_scene_change_detect,
    )

    for fn in (
        multimodal_features,
        multimodal_frames,
        multimodal_resize,
        audio_haar_band_energy,
        video_scene_change_detect,
        audio_silence_ratio,
        multimodal_quality_screen,
    ):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df, "simple")
        assert shuffle_count(df) == 0, (fn.__name__, text[:1500])
        assert "MapInPandas" in text, (fn.__name__, text[:1500])
        assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, (
            fn.__name__,
            text[:1500],
        )


def test_multimodal_meta_header_parse_is_jvm_codegen(spark):
    """multimodal_meta's header parsing (magic sniff, little-endian
    dimension reads, Y4M regexp) must compile into the JVM projection
    — exactly ONE Python stage (the payload synthesis stand-in), no
    second Python round-trip for the parse."""
    from rs_streamloader_spark.operators.multimodal import multimodal_meta

    df = multimodal_meta(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert text.count("MapInPandas") == 1, text[:1500]


def test_incremental_dedup_band_join_never_broadcasts_store(spark):
    """The incremental-dedup band join's store side grows with the
    ingested corpus — the plan must be the pinned shuffle-hash shape,
    never a broadcast of the store (the r10 k=100 flip class). Guarded
    on the pre-checkpoint decision plan with in-memory frames (the
    registered query returns a checkpoint whose plan is opaque)."""
    from rs_streamloader_spark.operators.dedup import (
        N_MINHASH,
        _incremental_decision,
    )

    cols = ", ".join(f"h{k} string" for k in range(N_MINHASH))
    sig = spark.createDataFrame(
        [tuple([i] + [f"{i + k:032x}" for k in range(N_MINHASH)]) for i in range(40)],
        f"doc_id bigint, {cols}",
    )
    df = _incremental_decision(
        sig.where("doc_id % 2 = 1"), sig.where("doc_id % 2 = 0")
    )
    text = explain_str(df, "simple")
    assert "ShuffledHashJoin" in text, text[:2000]
    bands_joins = [
        ln for ln in text.splitlines() if "BroadcastHashJoin" in ln and "band" in ln
    ]
    assert not bands_joins, bands_joins


def test_image_dhash_single_bounded_shuffle(spark):
    """image_dhash_dedup: one map-only decode+hash pass, then exactly
    ONE exchange on the 16-bit hash key — the aggregate is bounded by
    65,536 groups at any corpus size."""
    from rs_streamloader_spark.operators.multimodal import image_dhash_dedup

    df = image_dhash_dedup(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "MapInPandas" in text, text[:1500]
    assert shuffle_count(df) <= 1, text[:1500]
    assert len(re.findall(r"(?:File)?Scan parquet", text)) == 1, text[:1500]


def test_image_channel_rollup_shuffles_partials_not_pixels(spark):
    """image_channel_stats_by_source: one decode pass emitting per-doc
    channel-sum partials, then exactly one exchange to the O(sources)
    aggregate — the shuffle carries 6 integers per image, never
    pixels."""
    from rs_streamloader_spark.operators.multimodal import (
        image_channel_stats_by_source,
    )

    df = image_channel_stats_by_source(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "MapInPandas" in text, text[:1500]
    assert shuffle_count(df) <= 1, text[:1500]


def test_r14_association_wave_plan_shapes(spark):
    """Wave-A shapes: the 2x2 / moment audits are single combinable
    aggregates (map-side combine, no window, minimal exchanges); the
    KL join broadcasts the per-source totals; the Krippendorff raters
    are a map-only pass into one reduction."""
    import rs_streamloader_spark.operators.stats as S
    from rs_streamloader_spark.operators.quality import char_class_mix_audit
    from rs_streamloader_spark.operators.text import kl_divergence_sources

    # phi/yule: grid aggregate + 1-row reduction, no window
    df = S.phi_yule_binary_association(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" not in text
    assert "partial_count" in explain_str(df, "formatted") or "HashAggregate" in text

    # vif: ONE aggregate over the fact table, no join, no window
    df = S.vif_collinearity_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Join" not in text.replace("union", "UNION") or "BroadcastNestedLoopJoin" not in text
    assert "Window" not in text
    assert text.count("Scan parquet") <= 3  # one per UNION branch

    # krippendorff: map-only raters -> single reduction, no explode
    df = S.krippendorff_alpha_nominal(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Generate" not in text and "Window" not in text
    assert shuffle_count(df) <= 1, text

    # char-class audit: map-only pass, one per-source exchange
    df = char_class_mix_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Generate" not in text
    assert shuffle_count(df) <= 1, text

    # KL: totals/grand reach the vocab join as broadcasts
    df = kl_divergence_sources(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastExchange" in text, text

    # ansari: histogram aggregate + ONE global window over histogram
    # rows (bounded), then a 1-row reduction
    df = S.ansari_bradley_scale_test(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "Window" in text
    assert "Generate" not in text


def test_r14_wave_b_plan_shapes(spark):
    """Decimation is map-only (zero shuffles, no Generate); the luma
    histogram shuffles 8-integer partials (one exchange to the
    per-source aggregate); burstiness is one vocab aggregate with a
    TakeOrderedAndProject head."""
    from rs_streamloader_spark.operators.multimodal import (
        audio_decimate_downsample,
        image_luma_histogram_by_source,
    )
    from rs_streamloader_spark.operators.text import word_burstiness_topk

    df = audio_decimate_downsample(spark, SF_SMOKE)
    assert shuffle_count(df) == 0, explain_str(df, "simple")

    df = image_luma_histogram_by_source(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) <= 1, text
    assert "partial" in explain_str(df, "formatted").lower()  # map-side combine

    df = word_burstiness_topk(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in text or "WindowGroupLimit" in text, text


def test_r14_wave_c_plan_shapes(spark):
    """t-closeness: one (QI, band) aggregate with the global marginal
    broadcast back on; no window over input rows. The quantile replay
    builder is a plain combinable count aggregate (mergeable under any
    micro-batch slicing — the property the replay exists to show)."""
    import rs_streamloader_spark.operators.stats as S

    df = S.t_closeness_audit(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert "BroadcastExchange" in text, text
    assert "Window" not in text


def test_blur_screen_map_only(spark):
    from rs_streamloader_spark.operators.multimodal import (
        image_blur_laplacian_screen,
    )

    df = image_blur_laplacian_screen(spark, SF_SMOKE)
    assert shuffle_count(df) == 0, explain_str(df, "simple")


def test_html_extract_family_is_map_only(spark):
    """The markup family (r15): extraction must stay map-only — one
    documents scan feeding an Arrow MapInPandas stage, zero
    exchanges for the per-doc queries (markup bytes never cross a
    shuffle); the per-source rollup adds exactly its one aggregation
    exchange over small integer counters."""
    from rs_streamloader_spark.operators.webtext import (
        html_boilerplate_density,
        html_structure_stats,
        html_text_extract,
    )

    for fn in (html_text_extract, html_boilerplate_density):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df, "simple")
        assert shuffle_count(df) == 0, (fn.__name__, text[:1500])
        assert "MapInPandas" in text, (fn.__name__, text[:1500])

    df = html_structure_stats(spark, SF_SMOKE)
    assert shuffle_count(df) == 1, explain_str(df, "simple")[:1500]


def test_md_extract_family_plan_shapes(spark):
    """Markdown family (r15): per-doc extraction map-only, rollup adds
    exactly its aggregation exchange."""
    from rs_streamloader_spark.operators.webtext import (
        md_structure_by_source,
        md_text_extract,
    )

    df = md_text_extract(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" in text, text[:1500]
    assert shuffle_count(md_structure_by_source(spark, SF_SMOKE)) == 1


def test_url_family_is_jvm_codegen_only(spark):
    """URL provenance family (r15): synthesis AND parse_url extraction
    must stay inside whole-stage codegen — zero Python stages in the
    plan (no MapInPandas, no BatchEvalPython), map-only for the
    per-doc query; the TLD rollup adds only its aggregate exchanges."""
    from rs_streamloader_spark.operators.webtext import (
        url_parse_provenance,
        url_tld_rollup,
    )

    df = url_parse_provenance(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" not in text and "BatchEvalPython" not in text
    # codegen'd operators print with the `*` star prefix
    assert "*(1)" in text or "* Project" in text, text[:600]
    assert shuffle_count(url_tld_rollup(spark, SF_SMOKE)) <= 2


def test_jsonl_family_is_jvm_only(spark):
    """JSONL ingestion (r15): from_json/get_json_object must stay
    JVM-side — zero Python stages; per-doc extraction map-only."""
    from rs_streamloader_spark.operators.webtext import (
        jsonl_corrupt_audit,
        jsonl_ingest_extract,
    )

    df = jsonl_ingest_extract(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" not in text and "BatchEvalPython" not in text
    assert shuffle_count(jsonl_corrupt_audit(spark, SF_SMOKE)) == 1


def test_csv_ingest_is_jvm_only(spark):
    """CSV ingestion (r15): from_csv stays JVM-side, map-only."""
    from rs_streamloader_spark.operators.webtext import csv_ingest_extract

    df = csv_ingest_extract(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" not in text and "BatchEvalPython" not in text


def test_xml_family_is_jvm_only(spark):
    """XML ingestion (r15): from_xml + the xpath battery must stay
    JVM-side — zero Python stages; per-doc extraction map-only; the
    xpath rollup adds only its aggregate exchange."""
    from rs_streamloader_spark.operators.webtext import (
        xml_ingest_extract,
        xml_xpath_structure,
    )

    df = xml_ingest_extract(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" not in text and "BatchEvalPython" not in text
    assert shuffle_count(xml_xpath_structure(spark, SF_SMOKE)) == 1


def test_dp_release_single_exchange(spark):
    """dp_histogram_release (r15): one hash-aggregate over the fixed
    source set; the noise arithmetic is per-group codegen."""
    from rs_streamloader_spark.operators.stats.association import (
        dp_histogram_release,
    )

    df = dp_histogram_release(spark, SF_SMOKE)
    assert shuffle_count(df) == 1, explain_str(df, "simple")[:1200]
    assert "BatchEvalPython" not in explain_str(df, "simple")


def test_robots_screen_broadcasts_policy_dim(spark):
    """robots_compliance_screen (r15): the O(hosts) policy dim must
    BROADCAST — a shuffled fact-side join here would move every URL
    at 100 TB for a 20-row dim."""
    from rs_streamloader_spark.operators.webtext import (
        robots_compliance_screen,
    )

    df = robots_compliance_screen(spark, SF_SMOKE)
    assert has_broadcast_join(df), explain_str(df, "simple")[:1200]


def test_format_router_is_map_only(spark):
    """ingest_format_router (r15): one scan, one Arrow stage, zero
    exchanges — mixed-format payloads never cross a shuffle."""
    from rs_streamloader_spark.operators.webtext import ingest_format_router

    df = ingest_format_router(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1200]
    assert "MapInPandas" in text


def test_warc_family_plan_shapes(spark):
    """WARC capture family (r15): the capture parse is map-only — one
    documents scan feeding an Arrow MapInPandas stage, zero exchanges
    for the per-doc query (captures never cross a shuffle); each
    per-source rollup adds exactly its one aggregation exchange over
    fixed-width integer counters."""
    from rs_streamloader_spark.operators.webtext import (
        warc_ingest_extract,
        warc_source_rollup,
        warc_truncation_audit,
    )

    df = warc_ingest_extract(spark, SF_SMOKE)
    text = explain_str(df, "simple")
    assert shuffle_count(df) == 0, text[:1500]
    assert "MapInPandas" in text, text[:1500]

    for fn in (warc_source_rollup, warc_truncation_audit):
        df = fn(spark, SF_SMOKE)
        assert shuffle_count(df) == 1, (
            fn.__name__, explain_str(df, "simple")[:1500],
        )


def test_wasserstein_runs_on_bounded_grid(spark):
    """W1 must never join or window the raw corpus: the only
    corpus-sized pass is the (source, length) histogram — every
    single-partition exchange (the grid LEAD window) reads directly
    from an aggregate, and the pair join is a real equi-join, never a
    cartesian/nested-loop."""
    from rs_streamloader_spark.operators.text import (
        wasserstein_doclen_sources,
    )

    df = wasserstein_doclen_sources(spark, SF_SMOKE)
    text = explain_str(df)
    for op in ("CartesianProduct",):
        assert op not in text, op
    lines = explain_str(df, "simple").splitlines()
    exchanges = [
        i for i, l in enumerate(lines) if "Exchange SinglePartition" in l
    ]
    assert exchanges, "expected the bounded grid window exchange"
    for i in exchanges:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 3])


def test_rake_pins_shuffle_hash_and_topk_cut(spark):
    """The member↔word-stats join build side grows with vocabulary —
    pinned shuffle-hash (the r10 broadcast-flip class); the final cut
    compiles to TakeOrderedAndProject, never a global sort."""
    from rs_streamloader_spark.operators.text import rake_keyword_topk

    df = rake_keyword_topk(spark, SF_SMOKE)
    text = explain_str(df)
    assert "ShuffledHashJoin" in text, text[:2000]
    assert "TakeOrderedAndProject" in text, text[:2000]


def test_curriculum_rank_has_no_global_sort(spark):
    """The global NTILE rank must come from the histogram-index
    two-pass: per-length windows (tie-bounded partitions) + a bounded
    grid cumsum — never a corpus-wide single-partition sort. Every
    SinglePartition exchange must read from an aggregate."""
    from rs_streamloader_spark.operators.text import (
        curriculum_phase_audit,
    )

    df = curriculum_phase_audit(spark, SF_SMOKE)
    lines = explain_str(df, "simple").splitlines()
    exchanges = [
        i for i, l in enumerate(lines) if "Exchange SinglePartition" in l
    ]
    for i in exchanges:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 3])
    assert has_broadcast_join(df), explain_str(df)


def test_url_canonical_dedup_is_jvm_only(spark):
    """Canonicalization must stay whole-stage codegen: zero Python
    stages, map-only into the single aggregate."""
    from rs_streamloader_spark.operators.webtext import (
        dedup_url_canonical,
    )

    df = dedup_url_canonical(spark, SF_SMOKE)
    text = explain_str(df)
    assert "MapInPandas" not in text and "BatchEvalPython" not in text
    assert shuffle_count(df) <= 2, explain_str(df, "simple")[:1500]


def test_sliced_wasserstein_runs_on_bounded_grid(spark):
    """Per-vector work must collapse to integer projections map-side;
    everything after runs on the bounded (source, slice, bucket) grid
    — every SinglePartition exchange reads from an aggregate and the
    doc→embedding join is never broadcast (key-to-key on two O(SF)
    tables)."""
    from rs_streamloader_spark.operators.similarity import (
        sliced_wasserstein_embeddings,
    )

    df = sliced_wasserstein_embeddings(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text
    lines = explain_str(df, "simple").splitlines()
    for i, l in enumerate(lines):
        if "Exchange SinglePartition" in l:
            assert "HashAggregate" in lines[i + 1], "\n".join(
                lines[i : i + 3]
            )
    assert "ShuffledHashJoin" in text, text[:1500]
