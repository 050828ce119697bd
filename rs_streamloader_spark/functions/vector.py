"""Vector column expressions over ``array<float>`` embeddings.

Dot products are sequential left-to-right double folds (``aggregate``
over ``zip_with``) — bit-deterministic, which the oracle comparisons
rely on. For bulk pairwise scoring use the block-partitioned numpy
path in operators/similarity.py instead; these expressions are for
row-at-a-time scoring inside larger projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            f" 0D, (acc, v) -> acc + v)"
        )
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def nano_mean(col: str | Column = "v") -> Column:
    """Order-independent mean of a double column at 6dp: each value
    rounds to integer NANO-units, the sum accumulates exactly in
    DECIMAL(38,0) (a billion-row group cannot overflow), and ONE
    divide + 6dp round produce the statistic — so partial-aggregation
    order can never move a half-boundary mean, unlike AVG. The single
    source of the embedding-centroid determinism policy; the oracle
    twin is :func:`nano_mean_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(F.round(c.cast("double") * 1_000_000_000).cast("decimal(38,0)"))
        / 1_000_000_000.0
        / F.count(F.lit(1)),
        6,
    )


def nano_mean_sql(expr: str = "v") -> str:
    """DuckDB twin of :func:`nano_mean` (SUM over BIGINT nano-units is
    HUGEINT — exact), as an aggregate-expression snippet."""
    return (
        f"ROUND(SUM(CAST(ROUND(CAST({expr} AS DOUBLE) * 1000000000) AS BIGINT))"
        f" / 1000000000.0 / COUNT(*), 6)"
    )
