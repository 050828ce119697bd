"""Exact integer nano-unit moments for order-independent mean/std.

The cross-engine determinism policy for statistics over doubles
(see also :func:`rs_streamloader_spark.functions.vector.nano_mean`):
each value rounds to integer NANO-units, (n, Σx, Σx²) accumulate
exactly — DECIMAL(38,0) on the Spark side, HUGEINT in DuckDB — and
the statistic derives through ONE fixed double expression on both
engines, so partial-aggregation order can never move a boundary.
``sigma`` is the SAMPLE std, defined only for n > 1 (NULL otherwise)
and clamped at 0 before SQRT: a constant-valued group cancels to a
tiny negative in doubles, which DuckDB SQRT throws on and Spark turns
into NaN. Consumers gating membership on sigma (z-scores) must also
drop sigma = 0 groups — an unguarded divide is an ANSI error on the
Spark side while DuckDB silently NULLs it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NANO = 1_000_000_000


def nano_moment_aggs(col: str | Column) -> list[Column]:
    """Aggregate columns ``n, sx, sxx`` (exact integer moments) for a
    ``groupBy(...).agg(*nano_moment_aggs("v"))`` call."""
    c = F.col(col) if isinstance(col, str) else col
    vn = F.round(c.cast("double") * _NANO).cast("bigint")
    return [
        F.count("*").alias("n"),
        F.sum(vn.cast("decimal(38,0)")).alias("sx"),
        F.sum(vn.cast("decimal(38,0)") * vn).alias("sxx"),
    ]


def nano_mu() -> Column:
    """Mean from the ``(n, sx)`` moment columns."""
    return F.col("sx").cast("double") / float(_NANO) / F.col("n")


def nano_sigma_samp() -> Column:
    """Sample std from the ``(n, sx, sxx)`` moment columns — NULL for
    n ≤ 1, variance clamped at 0 before SQRT."""
    sxd = F.col("sx").cast("double") / float(_NANO)
    sxxd = F.col("sxx").cast("double") / 1e18
    return F.when(
        F.col("n") > 1,
        F.sqrt(
            F.greatest(
                (sxxd - sxd * sxd / F.col("n"))
                / F.greatest(F.col("n") - 1, F.lit(1)),
                F.lit(0.0),
            )
        ),
    )


def nano_moment_aggs_sql(expr: str) -> str:
    """DuckDB twin of :func:`nano_moment_aggs` as a SELECT-list
    snippet producing ``n, sx, sxx``."""
    nano = f"CAST(ROUND(({expr}) * {_NANO}) AS BIGINT)"
    return (
        f"COUNT(*) AS n, SUM({nano}) AS sx,"
        f" SUM(CAST({nano} AS HUGEINT) * {nano}) AS sxx"
    )


def nano_mu_sql() -> str:
    return f"CAST(sx AS DOUBLE) / {_NANO}.0 / n"


def nano_sigma_samp_sql() -> str:
    return (
        f"CASE WHEN n > 1 THEN"
        f" SQRT(GREATEST((CAST(sxx AS DOUBLE) / 1e18"
        f" - (CAST(sx AS DOUBLE) / {_NANO}.0)"
        f" * (CAST(sx AS DOUBLE) / {_NANO}.0) / n) / (n - 1), 0)) END"
    )


def pearson_from_moments(n: str, sa: str, sb: str, ssa: str, ssb: str, sab: str) -> Column:
    """Pearson r (6dp, NULL for a zero-variance side) from exact
    integer moment COLUMNS: count ``n``, sums ``sa``/``sb``, square
    sums ``ssa``/``ssb``, cross sum ``sab``. One fixed double
    expression; the SQL twin is :func:`pearson_from_moments_sql`.
    Shared by ``numeric_corr_matrix`` (value moments) and
    ``spearman_rank_corr`` (rank moments)."""

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    num = d(n) * d(sab) - d(sa) * d(sb)
    va = F.greatest(d(n) * d(ssa) - d(sa) * d(sa), F.lit(0.0))
    vb = F.greatest(d(n) * d(ssb) - d(sb) * d(sb), F.lit(0.0))
    return F.when((va > 0) & (vb > 0), F.round(num / (F.sqrt(va) * F.sqrt(vb)), 6))


def pearson_from_moments_sql(n: str, sa: str, sb: str, ssa: str, ssb: str, sab: str) -> str:
    """DuckDB twin of :func:`pearson_from_moments` as an expression
    snippet over the same moment columns."""
    num = (
        f"(CAST({n} AS DOUBLE) * CAST({sab} AS DOUBLE)"
        f" - CAST({sa} AS DOUBLE) * CAST({sb} AS DOUBLE))"
    )
    va = (
        f"GREATEST(CAST({n} AS DOUBLE) * CAST({ssa} AS DOUBLE)"
        f" - CAST({sa} AS DOUBLE) * CAST({sa} AS DOUBLE), 0)"
    )
    vb = (
        f"GREATEST(CAST({n} AS DOUBLE) * CAST({ssb} AS DOUBLE)"
        f" - CAST({sb} AS DOUBLE) * CAST({sb} AS DOUBLE), 0)"
    )
    return (
        f"CASE WHEN {va} > 0 AND {vb} > 0 THEN"
        f" ROUND({num} / (SQRT({va}) * SQRT({vb})), 6) END"
    )
