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
