"""Measured LSH recall against the exact twins (VERDICT r2 item 6).

The LSH operators' oracles replicate the banding algorithm, so a green
driver row proves the implementation — not the retrieval quality. These
tests measure quality: recall = |LSH ∩ exact| / |exact| against the
exact-twin operator on the same data, asserted ≥ 0.9, and precision
must be exactly 1.0 (every candidate is exact-verified, so the LSH
result is a subset of the exact result by construction).

Runs at sf0.01 (the driver's correctness scale); sf0.1 numbers are
measured offline and documented in the operator docstrings
(embedding 0.940, minhash 0.992).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _pairs(spark, name: str, ca: str, cb: str) -> set[tuple]:
    from rs_streamloader_spark.operators import REGISTRY

    return {(r[ca], r[cb]) for r in REGISTRY[name].fn(spark, SF).collect()}


def test_embedding_near_dup_lsh_recall(spark):
    """Top-K-list recall: the LSH operator emits per-vector top-K
    neighbor lists; recall is measured against the exact twin's
    per-vector top-K (derived from its unrestricted pair set). A
    band-surviving member of the exact top-K can only move UP in rank
    when a competitor is band-missed, so list recall ≥ per-pair band
    recall (0.941 measured at sf0.01). Precision stays 1.0: every
    emitted neighbor must be a true qualifying pair."""
    from collections import defaultdict

    from rs_streamloader_spark.operators import REGISTRY
    from rs_streamloader_spark.operators.similarity import NEARDUP_TOP_K

    exact_rows = REGISTRY["embedding_near_dup"].fn(spark, SF).collect()
    neigh = defaultdict(list)
    for r in exact_rows:
        neigh[r["vec_a"]].append((-r["cosine"], r["vec_b"]))
        neigh[r["vec_b"]].append((-r["cosine"], r["vec_a"]))
    exact_topk = {
        (v, nb)
        for v, lst in neigh.items()
        for _, nb in sorted(lst)[:NEARDUP_TOP_K]
    }
    lsh = _pairs(spark, "embedding_near_dup_lsh", "vec_id", "neighbor_id")
    exact_undirected = {(r["vec_a"], r["vec_b"]) for r in exact_rows}
    assert all(
        (min(a, b), max(a, b)) in exact_undirected for a, b in lsh
    )  # precision 1.0: every neighbor is exact-verified
    recall = len(lsh & exact_topk) / len(exact_topk)
    assert recall >= 0.9, f"embedding LSH top-K recall {recall:.3f} < 0.9"


def test_dedup_minhash_lsh_recall(spark):
    exact = _pairs(spark, "dedup_ngram_jaccard", "doc_a", "doc_b")
    lsh = _pairs(spark, "dedup_minhash_lsh", "doc_a", "doc_b")
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"minhash LSH recall {recall:.3f} < 0.9"


def test_ivf_kmeans_recall_beats_fixed_cells(spark):
    """One Lloyd step must not LOSE recall vs its own fixed-direction
    initialization at equal nprobe — data-trained cells follow corpus
    density (measured 0.50 vs 0.40 at sf0.01, 0.49 vs 0.43 at
    sf0.1). Everything is deterministic (seeded planes, 6dp-rounded
    centroids), so these are exact equalities, not flaky bounds."""
    exact = _pairs(spark, "ann_topk_bruteforce", "query_id", "neighbor_id")
    fixed = _pairs(spark, "ann_ivf_cells", "query_id", "neighbor_id")
    trained = _pairs(spark, "ann_ivf_kmeans", "query_id", "neighbor_id")
    r_fixed = len(fixed & exact) / len(exact)
    r_trained = len(trained & exact) / len(exact)
    assert r_trained >= r_fixed, (r_trained, r_fixed)
    assert r_trained >= 0.5


def test_block_exact_pairs_invariant_to_blocking(spark, monkeypatch):
    """The all-pairs scorer must return the identical pair set at ANY
    block count: with the count-adaptive BLOCK_TARGET (2048) the test
    corpus runs as ONE block, so force multi-block (500 vectors / 100
    -> 5 blocks, 15 block-pair groups) and require equality with the
    single-block result — covering the (bi, bj, side) replication and
    the cross-block id-orientation branch the default path no longer
    exercises at test scale."""
    import rs_streamloader_spark.operators.similarity as sim

    sf = "/root/testdata/sf0.001"

    def pairs():
        sim._COUNT_CACHE.clear()
        return {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in sim._block_exact_pairs(spark, sf).collect()
        }

    baseline = pairs()
    monkeypatch.setattr(sim, "BLOCK_TARGET", 100)
    multi = pairs()
    sim._COUNT_CACHE.clear()
    assert multi == baseline
    assert len(baseline) > 0


def test_dedup_semantic_adaptive_bits_branch(spark, monkeypatch):
    """Force the cell-subdivision branch (bits > 0), which the real
    corpus never reaches (500 vectors / (8·64) target → bits 0): with
    SEMDEDUP_TARGET_CELL=2 both the Spark side (runtime count) and a
    freshly rendered oracle (SQL COUNT) must derive the same bits and
    agree exactly on the kept/dropped sets."""
    import rs_streamloader_spark.operators.similarity as sim
    from tests.oracle_harness import compare, duck_connection

    monkeypatch.setattr(sim, "SEMDEDUP_TARGET_CELL", 2)
    sf = "/root/testdata/sf0.001"
    con = duck_connection(sf)
    n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert sim._semdedup_bits(n) > 0
    oracle_pdf = con.execute(sim._semdedup_oracle()).df()
    compare(sim.dedup_semantic(spark, sf), oracle_pdf, "dedup_semantic[bits>0]")
