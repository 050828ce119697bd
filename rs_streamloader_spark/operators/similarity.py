"""Similarity search over the ``embeddings`` table (64-dim float
vectors) — SURVEY.md §2.5 north-star extensions.

Numeric determinism strategy for the oracle compare: all dot products
are computed as left-to-right sequential folds over float32 values
cast to float64 (``aggregate`` in Spark, ``list_dot_product`` over
``DOUBLE[]`` in DuckDB), cosines are rounded to 6 decimals on both
sides, and rankings order by the *rounded* cosine with the neighbor id
as tiebreak — so rank boundaries cannot flip on last-bit differences.

Scale design: brute-force top-k is the correctness baseline and is
linear in corpus size per query (queries × corpus, broadcast query
side). The scale path is the LSH variant: random-hyperplane signatures
bucket the corpus, the join is an equality join on the bucket key, and
only in-bucket candidates are scored — O(corpus/2^bits) work per
query. Hyperplanes are a fixed seeded literal so both engines use the
identical projection.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.functions.vector import dot_expr, norm_expr
from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables, spread

N_QUERIES = 20  # vec_id < 20 are the query set
TOP_K = 5
COSINE_THRESHOLD = 0.35
EMB_DIM = 64
N_HYPERPLANES = 8

# deterministic hyperplanes, shared verbatim by Spark and the oracle
_rng = np.random.RandomState(42)
HYPERPLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.randn(EMB_DIM)] for _ in range(N_HYPERPLANES)
]


_dot = dot_expr  # shared deterministic fold (functions/vector.py)


def _with_norm(df: DataFrame, emb: str = "embedding") -> DataFrame:
    return df.withColumn("norm", norm_expr(emb))


_DUCK_COS = (
    "LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (SQRT(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * SQRT(LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_DUCK_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({_DUCK_COS}, 6) DESC, b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    full corpus — scored corpus-side in parallel, ranked per query.
    Linear in corpus size; this is the correctness baseline for the
    LSH variant."""
    t = spread(load_tables(spark, sf_dir, "embeddings")["embeddings"])
    corpus = _with_norm(t).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    queries = _with_norm(t.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    cos = F.round(
        _dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(queries)
        .join(corpus, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


N_BLOCKS = 8


def _block_pair_scores(pdf):
    """One (block_i, block_j) group: numpy matmul over the two blocks'
    matrices, emit id-ordered pairs above threshold. Memory is bounded
    by 2·(corpus/N_BLOCKS) vectors per group."""
    import numpy as np
    import pandas as pd

    within = bool(pdf["bi"].iloc[0] == pdf["bj"].iloc[0])
    a_rows = pdf[pdf["side"] == "a"]
    b_rows = a_rows if within else pdf[pdf["side"] == "b"]
    if a_rows.empty or b_rows.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )
    ma = np.vstack(a_rows["embedding"].to_numpy()).astype("float64")
    mb = np.vstack(b_rows["embedding"].to_numpy()).astype("float64")
    ids_a = a_rows["vec_id"].to_numpy()
    ids_b = b_rows["vec_id"].to_numpy()
    cos = np.round(
        (ma @ mb.T)
        / np.outer(np.sqrt((ma * ma).sum(1)), np.sqrt((mb * mb).sum(1))),
        6,
    )
    hot = cos >= COSINE_THRESHOLD
    lt = ids_a[:, None] < ids_b[None, :]
    i1, j1 = np.nonzero(hot & lt)  # a-side id smaller → (a, b)
    out = [pd.DataFrame({"vec_a": ids_a[i1], "vec_b": ids_b[j1], "cosine": cos[i1, j1]})]
    if not within:  # b-side id smaller → orient as (b, a)
        i2, j2 = np.nonzero(hot & ~lt)
        out.append(
            pd.DataFrame({"vec_a": ids_b[j2], "vec_b": ids_a[i2], "cosine": cos[i2, j2]})
        )
    return pd.concat(out, ignore_index=True)


@register(
    "embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_DUCK_COS}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND({_DUCK_COS}, 6) >= {COSINE_THRESHOLD}
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold, via
    block-partitioned pairwise scoring: vectors hash into N_BLOCKS
    blocks, each row is replicated to its (min(b,k), max(b,k)) block
    pairs, and each pair group scores a bounded numpy matrix product
    (Arrow-batched ``applyInPandas``).

    This is the 100 TB shape of exact all-pairs similarity: work and
    memory per task are bounded by (corpus/N_BLOCKS)², replication
    factor is N_BLOCKS, no driver involvement. Each unordered pair is
    scored in exactly one group. Results are identical to the
    all-pairs oracle (cosines rounded to 6dp on both sides)."""
    t = spread(load_tables(spark, sf_dir, "embeddings")["embeddings"])
    base = t.select("vec_id", "embedding", (F.col("vec_id") % N_BLOCKS).alias("blk"))
    replicated = base.select(
        "vec_id",
        "embedding",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BLOCKS - 1}), k -> struct("
                f" least(blk, k) AS bi, greatest(blk, k) AS bj,"
                f" CASE WHEN blk <= k THEN 'a' ELSE 'b' END AS side))"
            )
        ).alias("p"),
    ).select("vec_id", "embedding", "p.bi", "p.bj", "p.side")
    return replicated.groupBy("bi", "bj").applyInPandas(
        _block_pair_scores, schema="vec_a bigint, vec_b bigint, cosine double"
    )


def _duck_bucket(alias: str) -> str:
    """Random-hyperplane sign bucket for the oracle (same literal
    hyperplanes as the Spark side)."""
    terms = []
    for i, hp in enumerate(HYPERPLANES):
        lit = "[" + ", ".join(repr(v) for v in hp) + "]"
        terms.append(
            f"CASE WHEN LIST_DOT_PRODUCT(CAST({alias}.embedding AS DOUBLE[]),"
            f" CAST({lit} AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _spark_bucket(emb: str):
    total = F.lit(0)
    for i, hp in enumerate(HYPERPLANES):
        lit = "array(" + ", ".join(f"{v}D" for v in hp) + ")"
        proj = F.expr(
            f"aggregate(zip_with({emb}, {lit}, (x, y) -> CAST(x AS DOUBLE) * y),"
            f" 0D, (acc, v) -> acc + v)"
        )
        total = total + F.when(proj > 0, F.lit(1 << i)).otherwise(0)
    return total


def _duck_cell(alias: str) -> str:
    """IVF cell for the oracle: 1-based argmax over the fixed centroid
    projections (first occurrence on exact-equality ties — both engines
    compute the identical sequential-fold dots, so ties agree)."""
    dots = ", ".join(
        f"LIST_DOT_PRODUCT(CAST({alias}.embedding AS DOUBLE[]),"
        f" CAST([{', '.join(repr(v) for v in hp)}] AS DOUBLE[]))"
        for hp in HYPERPLANES
    )
    return f"LIST_POSITION([{dots}], LIST_MAX([{dots}]))"


def _spark_cell(emb: str):
    projections = []
    for hp in HYPERPLANES:
        lit = "array(" + ", ".join(f"{v}D" for v in hp) + ")"
        projections.append(
            f"aggregate(zip_with({emb}, {lit}, (x, y) -> CAST(x AS DOUBLE) * y),"
            f" 0D, (acc, v) -> acc + v)"
        )
    ds = "array(" + ", ".join(projections) + ")"
    return F.expr(f"array_position({ds}, array_max({ds}))").cast("int")


@register(
    "ann_ivf_cells",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_DUCK_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({_DUCK_COS}, 6) DESC, b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b
        ON b.vec_id <> a.vec_id
       AND {_duck_cell('a')} = {_duck_cell('b')}
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a fixed deterministic coarse quantizer (argmax
    over {N_HYPERPLANES} centroid directions ≈ spherical k-means cells
    with frozen centroids) partitions the corpus; each query probes
    only its own cell (nprobe=1) and ranks exact cosine within it.

    vs ``ann_lsh_bucketed``: IVF cells are data-direction-aligned
    (coarser, {N_HYPERPLANES} cells) while LSH gives 2^{N_HYPERPLANES}
    sign buckets — the two standard serving layouts. At scale the
    corpus is written partitioned by cell, so a probe is one partition
    read; a trained k-means quantizer drops in by replacing the
    centroid literals. The oracle replicates the identical assignment,
    so recall misses compare exactly."""
    t = spread(load_tables(spark, sf_dir, "embeddings")["embeddings"])
    with_cell = _with_norm(t).withColumn("cell", _spark_cell("embedding"))
    corpus = with_cell.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
        "cell",
    )
    queries = with_cell.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        "cell",
    )
    cos = F.round(_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(queries)
        .join(corpus, ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_DUCK_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({_DUCK_COS}, 6) DESC, b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b
        ON b.vec_id <> a.vec_id
       AND {_duck_bucket('a')} = {_duck_bucket('b')}
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (8 fixed seeded
    hyperplanes → 256 buckets), equality join on the bucket key, exact
    cosine rank within bucket. The oracle replicates the identical
    bucketing, so the compare is exact including LSH misses.

    At scale this is the serving plan: the corpus is hash-partitioned
    by bucket (a single shuffle, reusable across query batches) and
    each query touches ~corpus/256 candidates."""
    t = spread(load_tables(spark, sf_dir, "embeddings")["embeddings"])
    with_b = _with_norm(t).withColumn("bucket", _spark_bucket("embedding"))
    corpus = with_b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
        "bucket",
    )
    queries = with_b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        "bucket",
    )
    cos = F.round(_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(queries)
        .join(corpus, ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
