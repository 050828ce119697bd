"""Shared exact-1-D-Wasserstein machinery (r15).

Both W1 operators — ``wasserstein_doclen_sources`` (document-length
distributions) and ``sliced_wasserstein_embeddings`` (per-slice
projection distributions) — reduce to the same computation once their
input collapses to a bounded value histogram: for every source pair,
W1 = Σ_grid |F_a − F_b| · gap, evaluated exactly as
|cum_a·n_b − cum_b·n_a| DECIMAL(38) cross-products over the merged
step grid, floor-divided to micro-units once per pair. This module
single-sources that machinery for BOTH engine sides (the review pass
caught the two inline copies drifting: the oracle copy had grown a
float division), parameterized on the extra partition columns (none
for doclen; the slice key ``k`` for sliced-W) and a final divisor
(1 for doclen; the slice count for the sliced average).

Scale posture: every stage here runs on the bounded
(source × partition × grid) frame — the caller is responsible for
collapsing corpus-sized data into the histogram first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["w1_pair_micro", "w1_pair_cte_sql"]


def w1_pair_micro(
    hist: DataFrame,
    n: DataFrame,
    part_cols: list[str],
    scale_div: int = 1,
) -> DataFrame:
    """Exact pairwise W1 in integer micro-units.

    ``hist``: (source, *part_cols, v, cnt) bounded value histogram.
    ``n``: (source, n_s) per-source totals (per partition-slice — the
    caller guarantees every slice of a source has the same mass).
    Returns (source_a, source_b, n_a, n_b, w1_micro) with
    ``w1_micro = (10⁶ · Σ terms) DIV (scale_div · n_a · n_b)``."""
    grid = (
        hist.select(*part_cols, "v")
        .distinct()
        .withColumn(
            "gap",
            F.lead("v").over(
                Window.partitionBy(*part_cols).orderBy("v")
            )
            - F.col("v"),
        )
    )
    dens = (
        n.select("source")
        .crossJoin(F.broadcast(grid))
        .join(hist, ["source", *part_cols, "v"], "left")
        .select(
            "source", *part_cols, "v", "gap",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    c = dens.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("source", *part_cols)
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    a = c.alias("a")
    b = c.alias("b")
    na = n.select(
        F.col("source").alias("source_a"), F.col("n_s").alias("n_a")
    )
    nb = n.select(
        F.col("source").alias("source_b"), F.col("n_s").alias("n_b")
    )
    join_cond = (F.col("b.v") == F.col("a.v")) & (
        F.col("a.source") < F.col("b.source")
    )
    for pc in part_cols:
        join_cond = join_cond & (F.col(f"b.{pc}") == F.col(f"a.{pc}"))
    pairs = (
        a.join(b, join_cond)
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.gap").alias("gap"),
            F.col("a.cum").alias("cum_a"),
            F.col("b.cum").alias("cum_b"),
        )
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .withColumn(
            "term",
            F.expr(
                "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b"
                " - CAST(cum_b AS DECIMAL(38,0)) * n_a)"
                " * COALESCE(gap, 0)"
            ),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.expr(
            f"CAST((1000000 * sum(term)) DIV ({scale_div}"
            " * CAST(max(n_a) AS DECIMAL(38,0)) * max(n_b)) AS BIGINT)"
        ).alias("w1_micro"),
    )


def w1_pair_cte_sql(part_cols: list[str], scale_div: int = 1) -> str:
    """The DuckDB twin: CTE chain ``gg/dens/c/pr`` + final SELECT,
    expecting an ``h`` CTE of (source, *part_cols, v, cnt) and an
    ``n`` CTE of (source, n_s) to be defined upstream. All-integer:
    HUGEINT cross-products, ``//`` floor division once per pair."""
    pc = "".join(f"{c}, " for c in part_cols)
    part = f"PARTITION BY {', '.join(part_cols)} " if part_cols else ""
    on_pc = "".join(f"b.{c} = a.{c} AND " for c in part_cols)
    hjoin = "".join(f" AND h.{c} = gg.{c}" for c in part_cols)
    return f"""
    gg AS (
      SELECT {pc}v,
             LEAD(v) OVER ({part}ORDER BY v) - v AS gap
      FROM (SELECT DISTINCT {pc}v FROM h)
    ),
    dens AS (
      SELECT s.source, {"".join(f"gg.{c}, " for c in part_cols)}gg.v,
             gg.gap, COALESCE(h.cnt, 0) AS cnt
      FROM (SELECT DISTINCT source FROM h) s
      CROSS JOIN gg
      LEFT JOIN h ON h.source = s.source AND h.v = gg.v{hjoin}
    ),
    c AS (
      SELECT source, {pc}v, gap,
             SUM(cnt) OVER (PARTITION BY source{"".join(f", {c}" for c in part_cols)}
                            ORDER BY v) AS cum
      FROM dens
    ),
    pr AS (
      SELECT a.source AS source_a, b.source AS source_b,
             ABS(CAST(a.cum AS HUGEINT) * nb.n_s
                 - CAST(b.cum AS HUGEINT) * na.n_s)
               * COALESCE(a.gap, 0) AS term,
             na.n_s AS n_a, nb.n_s AS n_b
      FROM c a
      JOIN c b ON {on_pc}b.v = a.v AND a.source < b.source
      JOIN n na ON na.source = a.source
      JOIN n nb ON nb.source = b.source
    )
    SELECT source_a, source_b,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST((1000000 * SUM(term))
                // ({scale_div} * MAX(n_a) * MAX(n_b))
                AS BIGINT) AS w1_micro
    FROM pr GROUP BY 1, 2"""
