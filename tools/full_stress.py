#!/usr/bin/env python
"""Full-catalog 10× scale-stress sweep (VERDICT r7 item 5) plus the
k=100 heavy-family rehearsal (item 7).

Usage:
    python tools/full_stress.py sweep [OUT.json]   # all catalog queries at k=10
    python tools/full_stress.py k100  [OUT.json]   # the HEAVY_K100 families at k=100

``sweep`` orders the run so the rows the verdict watches (the two r8
redefinitions and the never-stressed statistics family) land first —
a partially-complete artifact is still evidence.
"""

from __future__ import annotations

import json
import os
import sys

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TOOLS_DIR)
for _p in (_REPO_ROOT, _TOOLS_DIR):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import scale_stress as ss  # noqa: E402  (lives next to this file)

# rows the r7 verdict explicitly watches: run them first
PRIORITY = [
    "embedding_near_dup_lsh",
    "fuzzy_name_match",
    "daily_acf_curve",
    "ks_test_click_view_value",
    "kendall_tau_quantity_discount",
    "cramers_v_priority_status",
]

# the heaviest candidate-pair / graph families for the 100× rehearsal,
# extended (r10) with the remaining families whose scale behavior is
# load-bearing: simhash banding, suffix-window exact dedup, eval-side
# decontamination, the two LM/text joins pinned this round, brute-force
# ANN, bounded-hop connected components, and the split-leakage join
HEAVY_K100 = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "embedding_near_dup_lsh",
    "item_item_cosine_topk",
    "pagerank_neardup",
    "dedup_semantic",
    "fuzzy_name_match",
    "dedup_simhash",
    "exact_substring_dedup",
    "decontaminate_ngram_overlap",
    "text_perplexity_bigram",
    "text_ngram_novelty",
    "ann_topk_bruteforce",
    "dedup_cluster",
    "split_leakage_audit",
    # r10-session additions with a 100x-relevant shape
    "dedup_keep_best_quality",
    "lang_rebalance_sample",
    "embedding_source_drift",
    "markov_attribution_removal",
    "bloom_join_prune_audit",
    "join_cardinality_estimate_audit",
    "cusum_drift_daily",
    "minhash_band_tuning_curve",
    # r11: rides the shared bigram stage; the one new op whose work
    # scales with corpus content rather than a bounded key set
    "dsir_importance_weights",
    # r12: the new pair-stage consumer (per-pair token-overlap joins)
    "rouge_overlap_neardup",
    # r12 continuation: content-scaling additions — vocab-pair stage,
    # fof rollups, banded doc rank, the pair-graph modularity, and the
    # day-pair test whose k=100 row documents the year-shift artifact
    "hellinger_tv_sources",
    "good_turing_mass",
    "chao1_richness",
    "heaps_law_fit",
    "graph_modularity_by_source",
    "mann_kendall_trend",
    # r12 continuation ad-hoc entries, now listed so coverage is
    # reproducible from the list alone
    "bigram_cond_entropy_by_source",
    "doc_char_entropy",
    "poisson_bootstrap_ci",
    "quantile_normalize_doclen",
    "tokenizer_vocab_coverage",
    # r13: the incremental-dedup pair (store-sized band join + loader
    # upserts) and the two multimodal ops whose aggregate keys grow
    # with content (dHash buckets) or whose decode volume is the cost
    "dedup_incremental_minhash",
    "image_dhash_dedup",
    "multimodal_features",
    # r14 (VERDICT r13 #3): the streaming half of incremental dedup
    # (store-growth + bucket-rewrite bytes under micro-batches), the
    # remaining decode-volume multimodal ops (audio samples scale with
    # text; the joint screen runs all three decoders), the in-stream
    # decode replay, and the BPE training loop (vocab scales with the
    # per-replica token prefixes)
    "stream_incremental_dedup_replay",
    "audio_haar_band_energy",
    "multimodal_quality_screen",
    "stream_multimodal_screen_replay",
    "bpe_trained_merges",
    # r15: the raw-ingestion wave (parse volume scales with text), the
    # trainer loops, and the router/replay capstones — listed so the
    # committed k=100 coverage reproduces from this list alone
    "html_text_extract",
    "html_boilerplate_density",
    "html_structure_stats",
    "md_text_extract",
    "jsonl_ingest_extract",
    "csv_ingest_extract",
    "xml_ingest_extract",
    "xml_xpath_structure",
    "ingest_format_router",
    "stream_format_router_replay",
    "unigram_lm_em_vocab",
    "unigram_lm_fertility",
    "wordpiece_trained_merges",
    "wordpiece_trained_fertility",
    # r15 second/third waves: WARC capture parse (3-layer decode
    # volume), the pipeline capstone (parse + dedup window), the
    # in-stream WARC replay, and the CCNet bucket consumer of the
    # bigram-LM join
    "warc_ingest_extract",
    "pretrain_pipeline_e2e",
    "stream_warc_ingest_replay",
    "ccnet_perplexity_buckets",
    # linear per-vector projection work feeding the bounded slice grid
    "sliced_wasserstein_embeddings",
    # O(bins) state drift monitor — k100 exercises per-batch volume
    "stream_drift_monitor_replay",
]


def main() -> None:
    from rs_streamloader_spark.operators import REGISTRY
    from rs_streamloader_spark.session import get_session

    cmd = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name=f"rs_sl_full_stress_{cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if cmd == "sweep":
        out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            _REPO_ROOT, "SCALE_STRESS_r10.json"
        )
        k = int(os.environ.get("RS_SL_SCALE_K", "10"))
        scaled_sf = os.environ.get("RS_SL_SCALED_DIR", "/tmp/rs_sl_sf1")
        # filter PRIORITY by membership (ADVICE r9): a renamed/removed
        # priority query must not KeyError-abort the whole sweep
        names = [n for n in PRIORITY if n in REGISTRY] + [
            n for n in REGISTRY if n not in PRIORITY
        ]
        if not ss.scaled_dir_ready(scaled_sf, base_sf, k):
            print(f"generating {scaled_sf} at k={k}…", file=sys.stderr, flush=True)
            ss.make_scaled(spark, base_sf, scaled_sf, k)
        ss.HEAVY_TAIL = names
        result = ss.run_stress(spark, base_sf, scaled_sf, k)
    elif cmd == "k100":
        out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            _REPO_ROOT, "SCALE_STRESS_r10_k100.json"
        )
        k = int(os.environ.get("RS_SL_SCALE_K", "100"))
        scaled_sf = os.environ.get("RS_SL_SCALED_DIR", "/tmp/rs_sl_sf10")
        if not ss.scaled_dir_ready(scaled_sf, base_sf, k):
            print(f"generating {scaled_sf} at k={k}…", file=sys.stderr, flush=True)
            ss.make_scaled(spark, base_sf, scaled_sf, k)
        ss.HEAVY_TAIL = [n for n in HEAVY_K100 if n in REGISTRY]
        result = ss.run_stress(spark, base_sf, scaled_sf, k)
    else:
        raise SystemExit(f"unknown command {cmd!r} (sweep|k100)")

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(result['queries'])} rows -> {out_path}")


if __name__ == "__main__":
    main()
