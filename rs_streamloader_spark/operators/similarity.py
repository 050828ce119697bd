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

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables

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


def _dot(a: str, b: str):
    """Sequential left-to-right double fold of a float-vector dot
    product — bit-deterministic across engines."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def _with_norm(df: DataFrame, emb: str = "embedding") -> DataFrame:
    return df.withColumn(
        "norm",
        F.sqrt(
            F.expr(
                f"aggregate(transform({emb}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                f" 0D, (acc, v) -> acc + v)"
            )
        ),
    )


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
    t = load_tables(spark, sf_dir, "embeddings")["embeddings"]
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
    """Embedding-cosine near-duplicate pairs above a threshold.

    Correctness form is all-pairs (fine at this corpus size); at 100 TB
    the same output is produced by pre-bucketing with the LSH signature
    below and unioning per-bucket pair scans."""
    t = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    a = _with_norm(t).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = _with_norm(t).select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
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
    t = load_tables(spark, sf_dir, "embeddings")["embeddings"]
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
