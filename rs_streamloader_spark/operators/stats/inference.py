"""stats subject module (split from the former stats.py, r13);
see the package __init__ for the family docstring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
import rs_streamloader_spark.operators.stats as _S
import math as _math  # noqa: F401  (shared across subject modules)
from rs_streamloader_spark.operators.stats.descriptive import (
    ab_test_proportion_z,
    bloom_filter_fpr,
    daily_counts_autocorr,
    distinct_hll_manual,
    events_value_winsorized,
    heavy_hitters_cms,
    percentile_disc_by_segment,
    ses_forecast_daily,
)




# ---------------------------------------------------------------------------
# Gap-correct rolling sum: RANGE-interval frame vs ROWS frame
# ---------------------------------------------------------------------------


@register(
    "rolling_sum_range_frame",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, rev_c,
           CAST(SUM(rev_c) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS sum_7d_range,
           CAST(SUM(rev_c) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS sum_7_rows,
           SUM(rev_c) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                            AND CURRENT ROW)
             <> SUM(rev_c) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
                                 AND CURRENT ROW) AS frames_diverge
    FROM daily
    """,
)
def rolling_sum_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-correct rolling 7-day revenue: the RANGE-interval frame
    (true calendar window) next to the naive 7-ROWS frame, with a
    divergence flag — on a series with MISSING days the ROWS frame
    silently reaches further back in time, the classic rolling-metric
    bug this pair of columns makes visible.

    Scale posture: both frames order the calendar-bounded daily
    aggregate; Spark expresses the interval frame as rangeBetween
    over the epoch-day integer (exactly the RANGE INTERVAL
    semantics). Cross-engine determinism: integer cents, day keys are
    unique so frame membership is unambiguous, dates out as
    strings."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    epoch_day = F.datediff("d", F.lit("1970-01-01"))
    w_range = (
        Window.orderBy(epoch_day.alias("ed")).rangeBetween(-6, 0)
    )
    w_rows = Window.orderBy("d").rowsBetween(-6, 0)
    out = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "rev_c",
        F.sum("rev_c").over(w_range).alias("sum_7d_range"),
        F.sum("rev_c").over(w_rows).alias("sum_7_rows"),
    )
    return out.withColumn(
        "frames_diverge", F.col("sum_7d_range") != F.col("sum_7_rows")
    )




# ---------------------------------------------------------------------------
# Mutual information between decile-binned continuous features
# ---------------------------------------------------------------------------

_MI_BINS = 10




@register(
    "price_qty_mutual_info",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    ph AS (
      SELECT price_c, COUNT(*) AS cnt FROM vals GROUP BY price_c
    ),
    pcum AS (
      SELECT price_c,
             SUM(cnt) OVER (ORDER BY price_c ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM ph
    ),
    pedges AS (
      SELECT b.b AS edge_idx,
             MIN(CASE WHEN cum >= (n * b.b + {_MI_BINS} - 1) // {_MI_BINS}
                      THEN price_c END) AS edge
      FROM pcum CROSS JOIN (SELECT UNNEST(RANGE(1, {_MI_BINS})) AS b) b
      GROUP BY b.b
    ),
    binned AS (
      SELECT (SELECT COUNT(*) FROM pedges e WHERE v.price_c > e.edge)
               AS price_bin,
             LEAST((v.qty - 1) // 5, {_MI_BINS - 1}) AS qty_bin
      FROM vals v
    ),
    joint AS (
      SELECT price_bin, qty_bin, COUNT(*) AS nij FROM binned GROUP BY 1, 2
    ),
    marg AS (
      SELECT j.price_bin, j.qty_bin, j.nij,
             SUM(j.nij) OVER (PARTITION BY j.price_bin) AS ni,
             SUM(j.nij) OVER (PARTITION BY j.qty_bin) AS nj,
             SUM(j.nij) OVER () AS n
      FROM joint j
    ),
    terms AS (
      SELECT CAST(ROUND((CAST(nij AS DOUBLE) / n)
                        * LN(CAST(nij AS DOUBLE) * n
                             / (CAST(ni AS DOUBLE) * nj))
                        * 1000000000) AS BIGINT) AS t_nano
      FROM marg
    )
    SELECT COUNT(*) AS n_cells,
           ROUND(SUM(t_nano) / 1000000000.0, 6) AS mutual_info_nats
    FROM terms
    """,
)
def price_qty_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two CONTINUOUS features (line-item
    price and quantity), price decile-binned by its exact cumulative
    histogram and quantity by fixed-width bands — the
    feature-redundancy measure a feature store computes before
    admitting correlated columns (χ² audits categorical pairs; MI
    handles the binned-continuous case).

    Scale posture: price deciles come from the cumulative value
    histogram with integer index math (the ``percentile_disc``
    pattern, broadcast as {b}−1 edges); binning is then row-local; the
    joint table is a ≤{b}×{b} aggregate whose marginals are windows
    over the CELL GRID. Cross-engine determinism: every MI term is
    one double expression with identical operand order rounded to
    integer nano-units before the sum."""
    li = _S._t(spark, sf_dir, "lineitem")["lineitem"]
    vals = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    from rs_streamloader_spark.operators.quality import _banded_prefix

    ph = vals.groupBy("price_c").agg(F.count("*").alias("cnt"))
    wall = Window.partitionBy()
    # banded two-pass prefix: the price-value histogram is bounded by
    # the price RANGE, but a global-sort window over it would still
    # serialize one partition — band it like every other exact
    # percentile in the catalog
    tot = ph.agg(F.sum("cnt").alias("n"))
    pcum = (
        _banded_prefix(ph, "price_c", "cnt", "sum", "cum_below")
        .join(F.broadcast(tot))
        .select(
            "price_c",
            (F.col("cum_below") + F.col("cnt")).alias("cum"),
            "n",
        )
    )
    bs = vals.sparkSession.createDataFrame(
        [(b,) for b in range(1, _MI_BINS)], "b bigint"
    )
    pedges = (
        pcum.crossJoin(F.broadcast(bs))
        .groupBy("b")
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"(n * b + {_MI_BINS} - 1) div {_MI_BINS}"),
                    F.col("price_c"),
                )
            ).alias("edge")
        )
    )
    edges = pedges.agg(
        F.sort_array(F.collect_list("edge")).alias("edges")
    )
    binned = vals.join(F.broadcast(edges)).select(
        F.expr("size(filter(edges, e -> price_c > e))").alias("price_bin"),
        F.least(
            F.expr("(qty - 1) div 5"), F.lit(_MI_BINS - 1).cast("bigint")
        ).alias("qty_bin"),
    )
    joint = binned.groupBy("price_bin", "qty_bin").agg(
        F.count("*").alias("nij")
    )
    marg = joint.select(
        "nij",
        F.sum("nij").over(Window.partitionBy("price_bin")).alias("ni"),
        F.sum("nij").over(Window.partitionBy("qty_bin")).alias("nj"),
        F.sum("nij").over(wall).alias("n"),
    )
    terms = marg.select(
        F.round(
            (F.col("nij").cast("double") / F.col("n"))
            * F.log(
                F.col("nij").cast("double")
                * F.col("n")
                / (F.col("ni").cast("double") * F.col("nj"))
            )
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("t_nano")
    )
    return terms.agg(
        F.count("*").alias("n_cells"),
        F.round(F.sum("t_nano") / 1_000_000_000.0, 6).alias("mutual_info_nats"),
    )




# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix over the lineitem numerics
# ---------------------------------------------------------------------------

# one spec drives BOTH engines: (column, integer scale that represents
# the column exactly — quantity is integral, money/rates are 2dp)
_CORR_COLS = [
    ("l_quantity", 100),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
]


_CORR_PAIRS = [
    (_CORR_COLS[i], _CORR_COLS[j])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
]




def _corr_oracle() -> str:
    def iu(c, k):
        return f"CAST(ROUND({c} * {k}) AS BIGINT)"

    sums = []
    for c, k in _CORR_COLS:
        sums.append(f"SUM({iu(c, k)}) AS s_{c}")
        sums.append(f"SUM(CAST({iu(c, k)} AS HUGEINT) * {iu(c, k)}) AS ss_{c}")
    for (a, ka), (b, kb) in _CORR_PAIRS:
        sums.append(
            f"SUM(CAST({iu(a, ka)} AS HUGEINT) * {iu(b, kb)}) AS sp_{a}_{b}"
        )
    from rs_streamloader_spark.functions.moments import pearson_from_moments_sql

    rows = []
    for (a, _), (b, _) in _CORR_PAIRS:
        r = pearson_from_moments_sql(
            "n", f"s_{a}", f"s_{b}", f"ss_{a}", f"ss_{b}", f"sp_{a}_{b}"
        )
        rows.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,"
            f" {r} AS corr FROM mom"
        )
    union = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH mom AS (
      SELECT COUNT(*) AS n, {", ".join(sums)}
      FROM lineitem
    )
    SELECT * FROM ({union})
    """




@register("numeric_corr_matrix", oracle=_corr_oracle())
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the lineitem numeric columns
    (quantity, price, discount, tax) — the feature-redundancy /
    leakage screen a profiling pass runs before modeling, emitted as
    the 6-row upper triangle (col_x, col_y, n, corr).

    Scale posture: ONE combinable aggregate computes every moment
    (n, Σx, Σx², Σxy for all pairs) in a single fact-table pass — a
    1-row reduction at any corpus size; the 6-row matrix then derives
    on the driver-free select. Cross-engine determinism: each column
    is exactly representable at its integer scale (quantity integral,
    money/rates 2dp → ×100), so every moment is an exact
    DECIMAL(38,0)/HUGEINT integer sum in any order; r derives through
    one fixed double expression (scales cancel in r), variances clamp
    at 0 and zero-variance pairs emit NULL on both engines."""
    t = _S.load_tables(spark, sf_dir, "lineitem")["lineitem"]

    def iu(c, k):
        return F.round(F.col(c) * k).cast("bigint")

    aggs = [F.count(F.lit(1)).alias("n")]
    for c, k in _CORR_COLS:
        v = iu(c, k)
        aggs.append(F.sum(v.cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(F.sum(v.cast("decimal(38,0)") * v).alias(f"ss_{c}"))
    for (a, ka), (b, kb) in _CORR_PAIRS:
        aggs.append(
            F.sum(iu(a, ka).cast("decimal(38,0)") * iu(b, kb)).alias(f"sp_{a}_{b}")
        )
    mom = t.agg(*aggs)

    from rs_streamloader_spark.functions.moments import pearson_from_moments

    structs = []
    for (a, _), (b, _) in _CORR_PAIRS:
        corr = pearson_from_moments(
            "n", f"s_{a}", f"s_{b}", f"ss_{a}", f"ss_{b}", f"sp_{a}_{b}"
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                corr.alias("corr"),
            )
        )
    return mom.select(F.explode(F.array(*structs)).alias("p")).select("p.*")




# ---------------------------------------------------------------------------
# Spearman rank correlation over bounded-cardinality lineitem numerics
# ---------------------------------------------------------------------------

# bounded-cardinality columns only (quantity 1..50, discount/tax ~11
# values): their value histograms are tiny, so the average-rank prefix
# is a window over a BOUNDED aggregate and the rank maps broadcast.
# l_extendedprice is deliberately excluded — its histogram is O(rows),
# which would put a global window over unbounded data in the plan.
_SPEAR_COLS = ["l_quantity", "l_discount", "l_tax"]


_SPEAR_PAIRS = [
    (_SPEAR_COLS[i], _SPEAR_COLS[j])
    for i in range(len(_SPEAR_COLS))
    for j in range(i + 1, len(_SPEAR_COLS))
]




def _spearman_oracle() -> str:
    ctes = []
    for c in _SPEAR_COLS:
        # doubled average rank (2*below + cnt + 1) stays an exact integer
        ctes.append(
            f"h_{c} AS (SELECT {c} AS v, COUNT(*) AS cnt FROM lineitem GROUP BY {c}),\n"
            f"    r_{c} AS (SELECT v,\n"
            f"       2 * (SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt)\n"
            f"         + cnt + 1 AS rk2 FROM h_{c})"
        )
    sums = ["COUNT(*) AS n"]
    for c in _SPEAR_COLS:
        sums.append(f"SUM(r_{c}.rk2) AS s_{c}")
        sums.append(f"SUM(CAST(r_{c}.rk2 AS HUGEINT) * r_{c}.rk2) AS ss_{c}")
    for a, b in _SPEAR_PAIRS:
        sums.append(f"SUM(CAST(r_{a}.rk2 AS HUGEINT) * r_{b}.rk2) AS sp_{a}_{b}")
    joins = " ".join(f"JOIN r_{c} ON r_{c}.v = l.{c}" for c in _SPEAR_COLS)
    from rs_streamloader_spark.functions.moments import pearson_from_moments_sql

    rows = []
    for a, b in _SPEAR_PAIRS:
        r = pearson_from_moments_sql(
            "n", f"s_{a}", f"s_{b}", f"ss_{a}", f"ss_{b}", f"sp_{a}_{b}"
        )
        rows.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,"
            f" {r} AS spearman FROM mom"
        )
    union = "\n      UNION ALL\n      ".join(rows)
    ctes_sql = ",\n    ".join(ctes)
    return f"""
    WITH {ctes_sql},
    mom AS (
      SELECT {", ".join(sums)}
      FROM lineitem l {joins}
    )
    SELECT * FROM ({union})
    """




@register("spearman_rank_corr", oracle=_spearman_oracle())
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation over the bounded-cardinality lineitem
    numerics (quantity, discount, tax) — the monotonic-association
    screen that catches what Pearson (``numeric_corr_matrix``) misses
    on non-linear relationships, with exact tie handling via average
    ranks.

    Scale posture: per-column value HISTOGRAMS (≤ ~50 rows — bounded
    cardinality by construction, see _SPEAR_COLS) carry the
    average-rank prefix as a window over a bounded aggregate; the
    tiny rank maps broadcast back onto one fact scan, and every pair
    moment reduces in ONE combinable aggregate. Cross-engine
    determinism: the DOUBLED average rank (2·below + cnt + 1) is an
    exact integer, all moments are exact HUGEINT/DECIMAL(38,0) sums
    in any order, and rho derives through one fixed double expression
    (the doubling cancels); zero-variance pairs emit NULL."""
    t = _S.load_tables(spark, sf_dir, "lineitem")["lineitem"]
    base = t.select(*_SPEAR_COLS)
    cur = base
    for c in _SPEAR_COLS:
        # histogram from the BASE projection — building it from the
        # progressively joined frame would re-execute earlier joins
        # inside every histogram scan
        h = base.groupBy(F.col(c).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        rk = h.select(
            "v",
            (2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1).alias(
                f"rk2_{c}"
            ),
        )
        cur = cur.join(F.broadcast(rk), cur[c] == rk["v"]).drop("v")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _SPEAR_COLS:
        rk = F.col(f"rk2_{c}")
        aggs.append(F.sum(rk.cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(F.sum(rk.cast("decimal(38,0)") * rk).alias(f"ss_{c}"))
    for a, b in _SPEAR_PAIRS:
        aggs.append(
            F.sum(
                F.col(f"rk2_{a}").cast("decimal(38,0)") * F.col(f"rk2_{b}")
            ).alias(f"sp_{a}_{b}")
        )
    mom = cur.agg(*aggs)

    from rs_streamloader_spark.functions.moments import pearson_from_moments

    structs = []
    for a, b in _SPEAR_PAIRS:
        rho = pearson_from_moments(
            "n", f"s_{a}", f"s_{b}", f"ss_{a}", f"ss_{b}", f"sp_{a}_{b}"
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                rho.alias("spearman"),
            )
        )
    return mom.select(F.explode(F.array(*structs)).alias("p")).select("p.*")




# ---------------------------------------------------------------------------
# Cramér's V: categorical-categorical association (orders priority × status)
# ---------------------------------------------------------------------------


@register(
    "cramers_v_priority_status",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS nij
      FROM orders GROUP BY 1, 2
    ),
    rx AS (SELECT x, SUM(nij) AS ri FROM obs GROUP BY x),
    cy AS (SELECT y, SUM(nij) AS cj FROM obs GROUP BY y),
    tot AS (SELECT SUM(nij) AS n FROM obs),
    -- densify: a ZERO-observed cell still contributes its full
    -- expected-count term (ri*cj/n), exactly when association is
    -- strongest — the PSI/SRM zero-cell lesson
    grid AS (
      SELECT rx.x, cy.y, rx.ri, cy.cj, COALESCE(obs.nij, 0) AS nij, t.n
      FROM rx CROSS JOIN cy CROSS JOIN tot t
      LEFT JOIN obs ON obs.x = rx.x AND obs.y = cy.y
    ),
    terms AS (
      -- chi2 term per cell as exact-int-derived doubles, rounded to
      -- integer MICRO-units before the (bounded-cell-count) sum
      SELECT CAST(ROUND(
               CAST(CAST(n AS HUGEINT) * nij - CAST(ri AS HUGEINT) * cj
                    AS DOUBLE)
               * CAST(CAST(n AS HUGEINT) * nij - CAST(ri AS HUGEINT) * cj
                      AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE))
               * 1000000) AS BIGINT) AS t_micro,
             n
      FROM grid
    ),
    kdim AS (
      SELECT LEAST((SELECT COUNT(*) FROM rx), (SELECT COUNT(*) FROM cy)) AS k
    )
    SELECT CAST(MIN(t.n) AS BIGINT) AS n,
           CAST(SUM(t_micro) AS BIGINT) AS chi2_micro,
           -- k=1 (a single-level column) has no association to
           -- measure: NULL identically on both engines
           CASE WHEN MIN(k.k) > 1 AND MIN(t.n) > 0 THEN
             ROUND(SQRT((SUM(t_micro) / 1000000.0)
                        / (MIN(t.n) * (MIN(k.k) - 1))), 6) END AS cramers_v
    FROM terms t CROSS JOIN kdim k
    """,
)
def cramers_v_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between order priority and order status — the
    categorical-categorical association screen completing the trio
    with Pearson (``numeric_corr_matrix``) and Spearman
    (``spearman_rank_corr``); the number a profiling pass reads to
    spot redundant categorical features or leakage.

    Scale posture: one combinable (x, y) contingency aggregate
    (bounded 5×3 grid), marginals and the zero-cell densification on
    the bounded grid, a 1-row reduction out. Cross-engine
    determinism: every count is exact; each χ² cell term is an
    exact-HUGEINT-derived double rounded to integer micro-units
    before the bounded sum (the SRM pattern), so no float
    accumulation order is exposed; V is one fixed double expression
    on the exact micro-sum."""
    t = _S.load_tables(spark, sf_dir, "orders")["orders"]
    obs = (
        t.groupBy(
            F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
        ).agg(F.count(F.lit(1)).alias("nij"))
    ).cache()
    rx = obs.groupBy("x").agg(F.sum("nij").alias("ri"))
    cy = obs.groupBy("y").agg(F.sum("nij").alias("cj"))
    tot = obs.agg(F.sum("nij").alias("n"))
    grid = (
        rx.crossJoin(cy)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["x", "y"], "left")
        .withColumn("nij", F.coalesce(F.col("nij"), F.lit(0)))
    )
    diff = (
        F.col("n").cast("decimal(38,0)") * F.col("nij")
        - F.col("ri").cast("decimal(38,0)") * F.col("cj")
    ).cast("double")
    term = (
        diff
        * diff
        / (
            F.col("n").cast("double")
            * F.col("ri").cast("double")
            * F.col("cj").cast("double")
        )
    )
    terms = grid.select(
        F.round(term * 1_000_000).cast("bigint").alias("t_micro"), "n"
    )
    k = rx.agg(F.count(F.lit(1)).alias("kx")).crossJoin(
        cy.agg(F.count(F.lit(1)).alias("ky"))
    ).select(F.least("kx", "ky").alias("k"))
    return (
        terms.agg(
            F.min("n").alias("n"), F.sum("t_micro").alias("chi2_micro")
        )
        .crossJoin(F.broadcast(k))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("chi2_micro").cast("bigint").alias("chi2_micro"),
            F.when(
                (F.col("k") > 1) & (F.col("n") > 0),
                F.round(
                    F.sqrt(
                        (F.col("chi2_micro") / 1_000_000.0)
                        / (F.col("n") * (F.col("k") - 1))
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )
    )




# ---------------------------------------------------------------------------
# Kendall's tau-b from the bounded joint histogram (no O(n^2) row pairs)
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_quantity_discount",
    oracle="""
    WITH grid AS (
      SELECT l_quantity AS x, l_discount AS y, COUNT(*) AS nij
      FROM lineitem GROUP BY 1, 2
    ),
    conc AS (
      SELECT
        SUM(CASE WHEN b.x > a.x AND b.y > a.y
                 THEN CAST(a.nij AS HUGEINT) * b.nij ELSE 0 END) AS c,
        SUM(CASE WHEN b.x > a.x AND b.y < a.y
                 THEN CAST(a.nij AS HUGEINT) * b.nij ELSE 0 END) AS d
      FROM grid a JOIN grid b
        ON b.x > a.x
    ),
    ties AS (
      SELECT
        (SELECT SUM(CAST(rx AS HUGEINT) * (rx - 1)) FROM (
           SELECT SUM(nij) AS rx FROM grid GROUP BY x)) AS tx2,
        (SELECT SUM(CAST(cy AS HUGEINT) * (cy - 1)) FROM (
           SELECT SUM(nij) AS cy FROM grid GROUP BY y)) AS ty2,
        (SELECT SUM(nij) FROM grid) AS n
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(c.c AS BIGINT) AS concordant,
           CAST(c.d AS BIGINT) AS discordant,
           -- explicit zero-denominator guard: a constant column makes
           -- the tie-corrected denominator 0; emit NULL identically
           -- on both engines (Spark would give NaN, DuckDB NULL)
           CASE WHEN (CAST(t.n AS DOUBLE) * (t.n - 1) / 2
                      - CAST(t.tx2 AS DOUBLE) / 2) > 0
                 AND (CAST(t.n AS DOUBLE) * (t.n - 1) / 2
                      - CAST(t.ty2 AS DOUBLE) / 2) > 0 THEN
           ROUND((CAST(c.c AS DOUBLE) - CAST(c.d AS DOUBLE))
                 / SQRT((CAST(t.n AS DOUBLE) * (t.n - 1) / 2
                         - CAST(t.tx2 AS DOUBLE) / 2)
                        * (CAST(t.n AS DOUBLE) * (t.n - 1) / 2
                           - CAST(t.ty2 AS DOUBLE) / 2)), 6) END AS tau_b
    FROM conc c CROSS JOIN ties t
    """,
)
def kendall_tau_quantity_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between quantity and discount with full tie
    correction — the third rank-association measure next to Spearman,
    computed WITHOUT the O(n²) row-pair enumeration: concordant and
    discordant pair MASSES come from the bounded joint value histogram
    (≤ ~50×11 cells), where each ordered cell pair contributes
    nij·n'ij pairs at once.

    Scale posture: one combinable (x, y) contingency aggregate, then
    a cell-pair join over the bounded grid (≤ 550² combinations —
    constant work at any corpus size) and bounded tie marginals; a
    1-row reduction out. Cross-engine determinism: pair masses are
    exact HUGEINT/DECIMAL(38,0) integer products and sums; tau-b is
    one fixed double expression over five exact integers."""
    t = _S.load_tables(spark, sf_dir, "lineitem")["lineitem"]
    grid = (
        t.groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).alias("nij"))
        .cache()
    )
    a, b = grid.alias("a"), grid.alias("b")
    conc = (
        a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
        .agg(
            F.sum(
                F.when(
                    F.col("b.y") > F.col("a.y"),
                    F.col("a.nij").cast("decimal(38,0)") * F.col("b.nij"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("c"),
            F.sum(
                F.when(
                    F.col("b.y") < F.col("a.y"),
                    F.col("a.nij").cast("decimal(38,0)") * F.col("b.nij"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("d"),
        )
    )
    tx = grid.groupBy("x").agg(F.sum("nij").alias("rx")).agg(
        F.sum(F.col("rx").cast("decimal(38,0)") * (F.col("rx") - 1)).alias("tx2")
    )
    ty = grid.groupBy("y").agg(F.sum("nij").alias("cy")).agg(
        F.sum(F.col("cy").cast("decimal(38,0)") * (F.col("cy") - 1)).alias("ty2")
    )
    n = grid.agg(F.sum("nij").alias("n"))
    half = (
        F.col("n").cast("double") * (F.col("n") - 1) / 2
    )
    return (
        conc.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("c").cast("bigint").alias("concordant"),
            F.col("d").cast("bigint").alias("discordant"),
            F.when(
                ((half - F.col("tx2").cast("double") / 2) > 0)
                & ((half - F.col("ty2").cast("double") / 2) > 0),
                F.round(
                    (F.col("c").cast("double") - F.col("d").cast("double"))
                    / F.sqrt(
                        (half - F.col("tx2").cast("double") / 2)
                        * (half - F.col("ty2").cast("double") / 2)
                    ),
                    6,
                ),
            ).alias("tau_b"),
        )
    )




# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov: click vs view value distributions
# ---------------------------------------------------------------------------

_KS_A, _KS_B = "click", "view"




@register(
    "ks_test_click_view_value",
    oracle=f"""
    WITH h AS (
      SELECT CAST(ROUND("value" * 100) AS BIGINT) AS v,
             SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
      GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM h
    ),
    tot AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb FROM h
    )
    SELECT CAST(t.na AS BIGINT) AS n_a,
           CAST(t.nb AS BIGINT) AS n_b,
           CAST(MAX(ABS(CAST(c.cum_a AS HUGEINT) * t.nb
                        - CAST(c.cum_b AS HUGEINT) * t.na)) AS BIGINT)
             AS d_num,
           ROUND(CAST(MAX(ABS(CAST(c.cum_a AS HUGEINT) * t.nb
                              - CAST(c.cum_b AS HUGEINT) * t.na)) AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * t.nb), 6) AS ks_d
    FROM cum c CROSS JOIN tot t
    WHERE t.na > 0 AND t.nb > 0
    GROUP BY t.na, t.nb
    """,
)
def ks_test_click_view_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the click
    and view value distributions — the distribution-drift test that
    complements PSI (``psi_value_drift``-style binned divergence) with
    the EXACT sup-distance, no binning loss: D = max_v |F_a(v) -
    F_b(v)|, computed as integer cross-products |cum_a·n_b −
    cum_b·n_a| over the merged value histogram so every comparison is
    exact until one final double division.

    Scale posture: values collapse to a cents-keyed histogram
    (combinable), the two inclusive CDFs ride the banded two-pass
    prefix (window WITHIN bounded cents bands + broadcast band
    offsets — never a global input-sized sort), and the sup reduces
    in one aggregate with the 1-row totals broadcast. Cross-engine
    determinism: all counts and cross-products are exact
    HUGEINT/DECIMAL(38,0) integers; ks_d is one double division of
    exact integers, rounded at 6dp."""
    from rs_streamloader_spark.operators.quality import _banded_prefix

    ev = _S._t(spark, sf_dir, "events")["events"].filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    h = ev.groupBy(
        F.round(F.col("value") * 100).cast("bigint").alias("v")
    ).agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias("cb"),
    )
    cum = _banded_prefix(h, "v", "ca", "sum", "ca_below")
    cum = _banded_prefix(cum, "v", "cb", "sum", "cb_below")
    cum = cum.select(
        (F.col("ca_below") + F.col("ca")).alias("cum_a"),
        (F.col("cb_below") + F.col("cb")).alias("cum_b"),
    )
    tot = h.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    diff = F.abs(
        F.col("cum_a").cast("decimal(38,0)") * F.col("nb")
        - F.col("cum_b").cast("decimal(38,0)") * F.col("na")
    )
    # one-sided or empty inputs produce NO row: the filter empties the
    # totals side and the GROUPED aggregate (unlike a global agg, which
    # would emit one all-NULL row) then emits nothing — exactly the
    # oracle's GROUP BY behavior
    return (
        cum.crossJoin(F.broadcast(tot.filter((F.col("na") > 0) & (F.col("nb") > 0))))
        .groupBy("na", "nb")
        .agg(F.max(diff).alias("d"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("d").cast("bigint").alias("d_num"),
            F.round(
                F.col("d").cast("double")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("ks_d"),
        )
    )




# ---------------------------------------------------------------------------
# Welch's t-test: click vs view mean value (unequal variances)
# ---------------------------------------------------------------------------


def _welch_oracle() -> str:
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs_sql,
        nano_mu_sql,
        nano_sigma_samp_sql,
    )

    return f"""
    WITH mom AS (
      SELECT event_type, {nano_moment_aggs_sql('"value"')}
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
      GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n,
             {nano_mu_sql()} AS mu,
             {nano_sigma_samp_sql()} AS sigma
      FROM mom
    ),
    sides AS (
      SELECT MAX(CASE WHEN event_type = '{_KS_A}' THEN n END) AS n_a,
             MAX(CASE WHEN event_type = '{_KS_A}' THEN mu END) AS mu_a,
             MAX(CASE WHEN event_type = '{_KS_A}' THEN sigma END) AS s_a,
             MAX(CASE WHEN event_type = '{_KS_B}' THEN n END) AS n_b,
             MAX(CASE WHEN event_type = '{_KS_B}' THEN mu END) AS mu_b,
             MAX(CASE WHEN event_type = '{_KS_B}' THEN sigma END) AS s_b
      FROM stats
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(mu_a, 6) AS mean_a, ROUND(mu_b, 6) AS mean_b,
           ROUND((mu_a - mu_b)
                 / SQRT(s_a * s_a / n_a + s_b * s_b / n_b), 4) AS t_stat,
           ROUND((s_a * s_a / n_a + s_b * s_b / n_b)
                 * (s_a * s_a / n_a + s_b * s_b / n_b)
                 / ((s_a * s_a / n_a) * (s_a * s_a / n_a) / (n_a - 1)
                    + (s_b * s_b / n_b) * (s_b * s_b / n_b) / (n_b - 1)),
                 2) AS welch_df
    FROM sides
    WHERE s_a > 0 AND s_b > 0
    """




@register("welch_t_click_view", oracle=_welch_oracle())
def welch_t_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the click and view mean
    values, with the Welch-Satterthwaite degrees of freedom — the
    continuous-metric companion to ``ab_test_proportion_z`` (means,
    not proportions) and the parametric counterpart of the exact KS
    sup-distance (``ks_test_click_view_value``).

    Scale posture: two combinable moment aggregates (the shared
    functions/moments.py nano-unit policy — third consumer), then
    pure 1-row arithmetic. Cross-engine determinism: moments are
    exact integer sums; mu/sigma/t/df derive through fixed double
    expressions identical on both engines; zero-variance sides drop
    the result row rather than dividing by zero (ANSI-safe)."""
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs,
        nano_mu,
        nano_sigma_samp,
    )

    ev = _S._t(spark, sf_dir, "events")["events"].filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    mom = ev.groupBy("event_type").agg(*nano_moment_aggs("value"))
    stats = mom.select(
        "event_type",
        F.col("n"),
        nano_mu().alias("mu"),
        nano_sigma_samp().alias("sigma"),
    )

    def side(t, c):
        return F.max(F.when(F.col("event_type") == t, F.col(c)))

    sides = stats.agg(
        side(_KS_A, "n").alias("n_a"),
        side(_KS_A, "mu").alias("mu_a"),
        side(_KS_A, "sigma").alias("s_a"),
        side(_KS_B, "n").alias("n_b"),
        side(_KS_B, "mu").alias("mu_b"),
        side(_KS_B, "sigma").alias("s_b"),
    ).filter((F.col("s_a") > 0) & (F.col("s_b") > 0))
    va = F.col("s_a") * F.col("s_a") / F.col("n_a")
    vb = F.col("s_b") * F.col("s_b") / F.col("n_b")
    return sides.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.col("mu_a"), 6).alias("mean_a"),
        F.round(F.col("mu_b"), 6).alias("mean_b"),
        F.round((F.col("mu_a") - F.col("mu_b")) / F.sqrt(va + vb), 4).alias(
            "t_stat"
        ),
        F.round(
            (va + vb) * (va + vb)
            / (va * va / (F.col("n_a") - 1) + vb * vb / (F.col("n_b") - 1)),
            2,
        ).alias("welch_df"),
    )




# ---------------------------------------------------------------------------
# Autocorrelation curve over daily event counts (lags 1..14)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 14




def _acf_oracle() -> str:
    from rs_streamloader_spark.functions.moments import pearson_from_moments_sql

    r = pearson_from_moments_sql("n", "s_x", "s_y", "ss_x", "ss_y", "sp")
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT g.lag, a.c AS x, b.c AS y
      FROM daily a
      CROSS JOIN (SELECT UNNEST(RANGE(1, {_ACF_MAX_LAG} + 1)) AS lag) g
      JOIN daily b ON b.d = a.d + CAST(g.lag AS INTEGER)
    ),
    mom AS (
      SELECT lag, COUNT(*) AS n,
             SUM(x) AS s_x, SUM(y) AS s_y,
             SUM(CAST(x AS HUGEINT) * x) AS ss_x,
             SUM(CAST(y AS HUGEINT) * y) AS ss_y,
             SUM(CAST(x AS HUGEINT) * y) AS sp
      FROM lagged GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
           {r} AS acf
    FROM mom
    """




@register("daily_acf_curve", oracle=_acf_oracle())
def daily_acf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation FUNCTION of daily event volume at lags 1..14 —
    the full curve a seasonality detector reads (a spike at lag 7 =
    weekly cycle), generalizing ``daily_counts_autocorr``'s two fixed
    lags; fourth consumer of the shared Pearson-from-moments policy.

    Scale posture: events collapse to the calendar-bounded daily
    aggregate FIRST; the lag fan-out (14×) and self-join run over the
    bounded daily series, and per-lag moments are one combinable
    aggregate. Cross-engine determinism: daily counts are exact
    integers, all moments exact HUGEINT/DECIMAL(38,0) sums, r one
    fixed double expression (zero-variance windows NULL)."""
    from rs_streamloader_spark.functions.moments import pearson_from_moments

    ev = _S._t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lags = daily.select(
        "d", "c", F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("lag")
    ).select(F.expr("date_add(d, lag)").alias("d2"), F.col("c").alias("x"), "lag")
    other = daily.select(F.col("d").alias("d2"), F.col("c").alias("y"))
    pairs = lags.join(F.broadcast(other), "d2")
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s_x"),
        F.sum("y").alias("s_y"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("ss_x"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("ss_y"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sp"),
    )
    return mom.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        pearson_from_moments("n", "s_x", "s_y", "ss_x", "ss_y", "sp").alias("acf"),
    )




# ---------------------------------------------------------------------------
# Runtime Bloom-filter join pruning, audited exactly
# ---------------------------------------------------------------------------

_BJOIN_M = 1024  # bits — small by design so saturation is observable


_BJOIN_K = 2  # hash positions per key (4 hex chars of one md5 each)




def _bjoin_pos_sql(key: str, j: int) -> str:
    """DuckDB: join-filter hash position j — 4 md5 hex digits walked
    via STRPOS, mod m (mirrors Spark's conv(substr, 16, 10) % m)."""
    h = f"MD5('bjoin|' || CAST({key} AS VARCHAR))"
    digits = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({h}, {4 * j + 1 + i}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) % {_BJOIN_M})"




@register(
    "bloom_join_prune_audit",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_bjoin_pos_sql('k', j)} AS pos FROM members" for j in range(_BJOIN_K))}
      )
    ),
    grp AS (SELECT o_custkey AS pk, COUNT(*) AS n_orders FROM orders GROUP BY 1),
    probe AS (
      SELECT g.pk, g.n_orders,
             (b0.pos IS NOT NULL AND b1.pos IS NOT NULL) AS pass,
             (m.k IS NOT NULL) AS member
      FROM grp g
      LEFT JOIN bits b0 ON b0.pos = {_bjoin_pos_sql('g.pk', 0)}
      LEFT JOIN bits b1 ON b1.pos = {_bjoin_pos_sql('g.pk', 1)}
      LEFT JOIN members m ON m.k = g.pk
    )
    SELECT
      CAST((SELECT COUNT(*) FROM members) AS BIGINT)            AS n_member_keys,
      CAST((SELECT COUNT(*) FROM bits) AS BIGINT)               AS n_bits_set,
      CAST(COUNT(*) AS BIGINT)                                  AS n_probe_keys,
      CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)     AS n_pass_keys,
      CAST(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END)
           AS BIGINT)                                           AS n_fp_keys,
      CAST(SUM(n_orders) AS BIGINT)                             AS n_probe_orders,
      CAST(SUM(CASE WHEN pass THEN n_orders ELSE 0 END)
           AS BIGINT)                                           AS n_pass_orders,
      CAST(SUM(CASE WHEN NOT pass THEN n_orders ELSE 0 END)
           AS BIGINT)                                           AS n_pruned_orders,
      CAST(CAST(SUM(CASE WHEN NOT pass THEN n_orders ELSE 0 END) AS HUGEINT)
           * 1000000 // GREATEST(SUM(n_orders), 1) AS BIGINT)   AS pruned_ppm
    FROM probe
    """,
)
def bloom_join_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning, audited exactly: the
    orders→customer(segment='BUILDING') join is prefiltered by a
    {_BJOIN_M}-bit / k={_BJOIN_K} Bloom filter over the build-side
    keys — the semi-join reduction Spark's
    spark.sql.optimizer.runtime.bloomFilter applies — and the audit
    reports exactly how many probe keys/orders the filter pruned, how
    many passed, and how many passers were FALSE positives that the
    exact join must still reject (no reference analogue).

    Plan (the 100 TB shape): the probe side collapses to per-custkey
    order counts FIRST (map-side-combinable; rows = O(customers), not
    O(orders)); the bit set is a distinct aggregate bounded at
    {_BJOIN_M} rows that BROADCASTS into two map-only position joins;
    only the exact verify join shuffles, on the key-level tables, with
    a shuffle_hash hint on the member build side (an O(SF) table —
    never force-broadcast, see the salted-join rule). Bloom has no
    false negatives, so members always pass (n_pass_keys ≥
    n_member∩probe) — the invariant the exact verify certifies.

    m is deliberately small so saturation is measurable: at 10×/100×
    member counts the fill fraction → 1 and pruned_ppm → 0 — the
    audit's whole point is to MEASURE when the sketch stops paying for
    itself (production sizes m ∝ expected n, same plan). False
    positives at small corpora are a corpus property (expected FP ≈
    probes·fill^k < 1 at sf0.001); the constructed-collision case is
    pinned in tests/test_nonvacuity.py. Cross-engine determinism: bit
    positions are pure md5 hex arithmetic (conv here, the STRPOS
    digit walk in the oracle); every output is an integer with the
    ppm ratio as DECIMAL(38,0)/HUGEINT floor division."""
    t = _S._t(spark, sf_dir, "customer", "orders")
    members = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )

    def pos(key_col: str, j: int):
        h = F.md5(F.concat(F.lit("bjoin|"), F.col(key_col).cast("string")))
        return (
            F.conv(F.substring(h, 4 * j + 1, 4), 16, 10).cast("int") % _BJOIN_M
        )

    bits = (
        members.select(
            F.explode(
                F.array(*[pos("k", j) for j in range(_BJOIN_K)])
            ).alias("pos")
        )
        .distinct()
    )
    grp = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # identical broadcast subtrees (no rename) so the second bits
    # build collapses to a ReusedExchange — one filtered-customer
    # scan serves both position joins
    b0 = F.broadcast(bits).alias("b0")
    b1 = F.broadcast(bits).alias("b1")
    probe = (
        grp.withColumn("p0", pos("pk", 0))
        .withColumn("p1", pos("pk", 1))
        .join(b0, F.col("p0") == F.col("b0.pos"), "left")
        .join(b1, F.col("p1") == F.col("b1.pos"), "left")
        .join(
            members.withColumn("mk", F.col("k")).hint("shuffle_hash"),
            F.col("pk") == F.col("k"),
            "left",
        )
        .select(
            "n_orders",
            (F.col("b0.pos").isNotNull() & F.col("b1.pos").isNotNull()).alias(
                "pass"
            ),
            F.col("mk").isNotNull().alias("member"),
        )
    )
    n_members = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_member_keys"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    agg = probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe_keys"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_keys"),
        F.sum(F.when(F.col("pass") & ~F.col("member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fp_keys"),
        F.sum("n_orders").cast("bigint").alias("n_probe_orders"),
        F.sum(F.when(F.col("pass"), F.col("n_orders")).otherwise(0))
        .cast("bigint")
        .alias("n_pass_orders"),
        F.sum(F.when(~F.col("pass"), F.col("n_orders")).otherwise(0))
        .cast("bigint")
        .alias("n_pruned_orders"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN NOT pass THEN n_orders ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000"
            " div GREATEST(SUM(n_orders), 1) AS BIGINT)"
        ).alias("pruned_ppm"),
    )
    return (
        agg.join(F.broadcast(n_members))
        .join(F.broadcast(n_bits))
        .select(
            "n_member_keys",
            "n_bits_set",
            "n_probe_keys",
            "n_pass_keys",
            "n_fp_keys",
            "n_probe_orders",
            "n_pass_orders",
            "n_pruned_orders",
            "pruned_ppm",
        )
    )




# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

# var(Y_adj)/var(Y) ratio from exact integer moments; the division is the
# single final double expression, rendered from ONE shared string so both
# engines evaluate identical operand order.
_CUPED_VR_EXPR = (
    "CASE WHEN vy = 0 THEN NULL ELSE ROUND((1.0 - "
    "(CAST(vy AS DOUBLE)"
    " - 2.0 * (CAST(theta_micro AS DOUBLE) / 1000000.0) * CAST(cxy AS DOUBLE)"
    " + (CAST(theta_micro AS DOUBLE) / 1000000.0)"
    "   * (CAST(theta_micro AS DOUBLE) / 1000000.0) * CAST(vx AS DOUBLE))"
    " / CAST(vy AS DOUBLE)) * 100.0, 4) END"
)




@register(
    "cuped_adjusted_lift",
    oracle=f"""
    WITH b AS (
      SELECT CAST(MIN(ts) AS DATE)
             + CAST((CAST(MAX(ts) AS DATE) - CAST(MIN(ts) AS DATE)) // 2
                    AS INTEGER) AS split_d
      FROM events
    ),
    u AS (
      SELECT user_id % 2 AS variant,
             SUM(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) < split_d
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x_c,
             SUM(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) >= split_d
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y_c
      FROM events, b GROUP BY user_id
    ),
    arm AS (
      SELECT variant,
             CAST(COUNT(*) AS HUGEINT) AS n_u,
             CAST(SUM(x_c) AS HUGEINT) AS sx,
             CAST(SUM(y_c) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x_c AS HUGEINT) * x_c) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y_c AS HUGEINT) * y_c) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x_c AS HUGEINT) * y_c) AS HUGEINT) AS sxy
      FROM u GROUP BY variant
    ),
    pooled AS (
      SELECT SUM(n_u) AS p_n, SUM(sx) AS p_sx, SUM(sy) AS p_sy,
             SUM(sxx) AS p_sxx, SUM(sxy) AS p_sxy
      FROM arm
    ),
    theta AS (
      SELECT p_n, p_sx,
             CAST((p_sxy - (p_sx * p_sy // p_n)) * 1000000
                  // GREATEST(p_sxx - (p_sx * p_sx // p_n), 1) AS BIGINT)
               AS theta_micro
      FROM pooled
    ),
    scored AS (
      SELECT variant,
             CAST(n_u AS BIGINT) AS n_users,
             CAST(sy * 1000000 // n_u AS BIGINT) AS mean_y_micro,
             CAST(sy * 1000000 // n_u
                  - (CAST(theta_micro AS HUGEINT)
                     * ((sx * p_n - p_sx * n_u) * 1000000 // (n_u * p_n))
                     // 1000000) AS BIGINT) AS mean_yadj_micro,
             theta_micro,
             n_u * syy - sy * sy AS vy,
             n_u * sxx - sx * sx AS vx,
             n_u * sxy - sx * sy AS cxy
      FROM arm, theta
    )
    SELECT variant, n_users, mean_y_micro, mean_yadj_micro, theta_micro,
           {_CUPED_VR_EXPR} AS var_reduction_pct
    FROM scored
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013 —
    the pre-experiment-covariate adjustment every experimentation
    platform runs): per deterministic arm (user_id mod 2, the
    ``ab_test_proportion_z`` split), the raw post-period revenue mean
    next to the CUPED-adjusted mean Y − θ·(X − E[X]) with X = the
    user's PRE-period revenue, plus the achieved variance-reduction
    percentage — the number that says how much experiment runtime the
    covariate buys. Pre/post split at the corpus midpoint date; θ is
    the pooled cov(X,Y)/var(X).

    Scale posture: everything reduces per USER first (a combinable
    conditional-sum aggregate over the raw stream — the dominant
    cardinality collapses in the map stage); arm moments are a 2-row
    aggregate; θ and the pooled terms ride a crossJoin of 1-row
    aggregates; nothing after the per-user rollup scales with data.
    Cross-engine determinism: money in BIGINT cents, all moments as
    exact integer sums in DECIMAL(38,0)/HUGEINT, θ as integer
    micro-units via floor division (both engines truncate toward
    zero, verified), adjusted means as pure integer expressions; the
    variance-reduction ratio is the single final double expression
    rendered from one shared string; n·Σxx−(Σx)² stays ≤~1e32 at
    100 TB scale — inside DECIMAL(38,0)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    b = ev.agg(
        F.expr(
            "date_add(CAST(MIN(ts) AS DATE),"
            " CAST(datediff(CAST(MAX(ts) AS DATE), CAST(MIN(ts) AS DATE))"
            " div 2 AS INT))"
        ).alias("split_d")
    )
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    is_p = F.col("event_type") == "purchase"
    d = F.to_date("ts")
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(is_p & (d < F.col("split_d")), cents).otherwise(0)
            ).alias("x_c"),
            F.sum(
                F.when(is_p & (d >= F.col("split_d")), cents).otherwise(0)
            ).alias("y_c"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "x_c", "y_c")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    arm = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_u"),
        F.sum("x_c").cast("decimal(38,0)").alias("sx"),
        F.sum("y_c").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x_c") * F.col("x_c")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("y_c") * F.col("y_c")).cast("decimal(38,0)").alias("syy"),
        F.sum(dec("x_c") * F.col("y_c")).cast("decimal(38,0)").alias("sxy"),
    )
    pooled = arm.agg(
        F.sum("n_u").cast("decimal(38,0)").alias("p_n"),
        F.sum("sx").cast("decimal(38,0)").alias("p_sx"),
        F.sum("sy").cast("decimal(38,0)").alias("p_sy"),
        F.sum("sxx").cast("decimal(38,0)").alias("p_sxx"),
        F.sum("sxy").cast("decimal(38,0)").alias("p_sxy"),
    )
    theta = pooled.select(
        "p_n",
        "p_sx",
        F.expr(
            "CAST((p_sxy - (p_sx * p_sy div p_n)) * 1000000"
            " div GREATEST(p_sxx - (p_sx * p_sx div p_n), 1) AS BIGINT)"
        ).alias("theta_micro"),
    )
    scored = arm.crossJoin(F.broadcast(theta)).select(
        "variant",
        F.col("n_u").cast("bigint").alias("n_users"),
        F.expr("CAST(sy * 1000000 div n_u AS BIGINT)").alias("mean_y_micro"),
        F.expr(
            "CAST(sy * 1000000 div n_u"
            " - (CAST(theta_micro AS DECIMAL(38,0))"
            "    * ((sx * p_n - p_sx * n_u) * 1000000 div (n_u * p_n))"
            "    div 1000000) AS BIGINT)"
        ).alias("mean_yadj_micro"),
        "theta_micro",
        F.expr("n_u * syy - sy * sy").alias("vy"),
        F.expr("n_u * sxx - sx * sx").alias("vx"),
        F.expr("n_u * sxy - sx * sy").alias("cxy"),
    )
    return scored.select(
        "variant",
        "n_users",
        "mean_y_micro",
        "mean_yadj_micro",
        "theta_micro",
        F.expr(_CUPED_VR_EXPR).alias("var_reduction_pct"),
    )




# ---------------------------------------------------------------------------
# Median / MAD robust outlier detection (two histogram-index passes)
# ---------------------------------------------------------------------------

_MAD_K_X10K = 44478  # 3 · 1.4826 (the normal-consistency constant) · 10^4




@register(
    "robust_mad_outliers",
    oracle=f"""
    WITH hist AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v_c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ),
    med AS (
      SELECT event_type,
             CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v_c END) AS BIGINT)
               AS median_cents,
             CAST(MIN(n) AS BIGINT) AS n
      FROM cum GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, ABS(h.v_c - m.median_cents) AS d,
             CAST(SUM(h.cnt) AS BIGINT) AS cnt,
             MIN(m.median_cents) AS median_cents, MIN(m.n) AS n
      FROM hist h JOIN med m ON m.event_type = h.event_type
      GROUP BY 1, 2
    ),
    dcum AS (
      SELECT event_type, d, cnt, median_cents, n,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS BIGINT)
               AS mad_cents,
             MIN(median_cents) AS median_cents, MIN(n) AS n
      FROM dcum GROUP BY event_type
    )
    SELECT v.event_type, m.n, m.median_cents, m.mad_cents,
           CAST(SUM(CASE WHEN v.d * 10000 > {_MAD_K_X10K} * m.mad_cents
                         THEN v.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(CAST(SUM(CASE WHEN v.d * 10000 > {_MAD_K_X10K} * m.mad_cents
                              THEN v.cnt ELSE 0 END) AS HUGEINT) * 1000000
                // m.n AS BIGINT) AS outlier_ppm
    FROM dev v JOIN mad m ON m.event_type = v.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection per event type: the exact
    median, the exact median-absolute-deviation, and the count of
    values beyond the classic 3·1.4826·MAD fence — the
    outlier-flagging rule telemetry pipelines prefer over z-scores
    because one corrupt 1e12 reading moves a mean/σ fence but not a
    median/MAD fence. (Complements ``events_value_winsorized``, which
    CLAMPS tails; this one COUNTS them against a robust fence.)

    Scale posture: two passes of the ``percentile_disc_by_segment``
    histogram-index machinery — raw rows collapse to a (type, cents)
    value histogram FIRST (bounded by the value RANGE, not row
    count), the median index is located in the cumulative histogram,
    and the deviation histogram derives from the VALUE histogram (a
    ≤5-row broadcast of medians onto histogram rows — never a second
    raw-row pass); windows order histogram cardinality only. The
    fence test also runs on the histogram. Cross-engine determinism:
    pure integer — BIGINT cents, the lower-median index (n+1) div 2
    exactly as in the percentile family, the 1.4826 consistency
    constant as the exact rational {_MAD_K_X10K}/10⁴ cross-multiplied
    (d·10⁴ > {_MAD_K_X10K}·MAD), ppm via HUGEINT floor division."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    hist = ev.groupBy(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v_c"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v_c",
        "cnt",
        F.sum("cnt")
        .over(wt.orderBy("v_c").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(wt).cast("bigint").alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v_c")))
        .cast("bigint")
        .alias("median_cents"),
        F.min("n").cast("bigint").alias("n"),
    )
    dev = (
        hist.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("v_c") - F.col("median_cents")).alias("d"))
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.min("median_cents").alias("median_cents"),
            F.min("n").alias("n"),
        )
    )
    dcum = dev.select(
        "event_type",
        "d",
        "cnt",
        "median_cents",
        "n",
        F.sum("cnt")
        .over(wt.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    mad = dcum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("d")))
        .cast("bigint")
        .alias("mad_cents"),
        F.min("median_cents").alias("median_cents"),
        F.min("n").alias("n"),
    )
    flagged = F.when(
        F.col("d") * 10000 > _MAD_K_X10K * F.col("mad_cents"), F.col("cnt")
    ).otherwise(0)
    return (
        dev.select("event_type", "d", "cnt")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "median_cents", "mad_cents")
        .agg(
            F.sum(flagged).cast("bigint").alias("n_outliers"),
            F.expr(
                f"CAST(CAST(SUM(CASE WHEN d * 10000 > {_MAD_K_X10K} * mad_cents"
                f" THEN cnt ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                f" div n AS BIGINT)"
            ).alias("outlier_ppm"),
        )
    )




# ---------------------------------------------------------------------------
# Weight-of-evidence / information-value feature screening
# ---------------------------------------------------------------------------

# Laplace-smoothed odds ratio, doubled through so every operand is an
# integer: (n_pos+0.5)/(P+0.5k) over (n_neg+0.5)/(N+0.5k)
#   = ((2·n_pos+1)·(2N+k)) / ((2·n_neg+1)·(2P+k)).
# ONE shared expression string renders both engines so the LN argument
# is built with identical operand order.
_WOE_EXPR = (
    "ROUND(LN((CAST(2 * n_pos + 1 AS DOUBLE) * (2 * tot_neg + k))"
    " / (CAST(2 * n_neg + 1 AS DOUBLE) * (2 * tot_pos + k))), 6)"
)


_IV_TERM_EXPR = (
    "CAST(ROUND((CAST(2 * n_pos + 1 AS DOUBLE) / (2 * tot_pos + k)"
    " - CAST(2 * n_neg + 1 AS DOUBLE) / (2 * tot_neg + k))"
    f" * {_WOE_EXPR} * 1000000000) AS BIGINT)"
)




@register(
    "woe_iv_feature_screen",
    oracle=f"""
    WITH cell AS (
      SELECT o_orderpriority AS feature_value,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos
      FROM orders GROUP BY 1
    ),
    wide AS (
      SELECT feature_value, n, n_pos, n - n_pos AS n_neg,
             CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
             CAST(SUM(n - n_pos) OVER () AS BIGINT) AS tot_neg,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM cell
    ),
    t AS (
      SELECT feature_value, n, n_pos,
             {_WOE_EXPR} AS woe,
             {_IV_TERM_EXPR} AS iv_term_nano
      FROM wide
    )
    SELECT feature_value, n, n_pos, woe, iv_term_nano,
           CAST(SUM(iv_term_nano) OVER () AS BIGINT) AS iv_total_nano
    FROM t
    """,
)
def woe_iv_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screening of a
    categorical feature (o_orderpriority) against a binary label
    (o_orderstatus = 'F') — the credit-scoring-standard feature
    usefulness screen (IV < 0.02 → drop the feature before training).
    Per category: the Laplace-smoothed WOE = ln(pos-share/neg-share)
    and its IV contribution; iv_total is the feature's score.

    Scale posture: the raw table collapses to a per-category
    (n, n_pos) combinable aggregate FIRST; totals, k, WOE, IV, and the
    IV sum are windows/projections over the BOUNDED category table
    (≤ distinct feature values — the domain_mix precedent for global
    windows over reduced aggregates). Cross-engine determinism: the
    0.5 smoothing is doubled through so every LN/division operand is
    an exact integer; ONE shared expression string renders both
    engines (identical operand order — {{_WOE_EXPR}}); WOE rounds to
    6dp; IV terms round to integer NANO-units before the cross-row
    sum, so partial-order double addition can never move the total
    (the nano_mean policy)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cell = orders.groupBy(F.col("o_orderpriority").alias("feature_value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    w = Window.partitionBy()
    wide = cell.select(
        "feature_value",
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        F.sum("n_pos").over(w).cast("bigint").alias("tot_pos"),
        F.sum(F.col("n") - F.col("n_pos")).over(w).cast("bigint").alias("tot_neg"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    )
    t = wide.select(
        "feature_value",
        "n",
        "n_pos",
        F.expr(_WOE_EXPR).alias("woe"),
        F.expr(_IV_TERM_EXPR).alias("iv_term_nano"),
    )
    return t.select(
        "feature_value",
        "n",
        "n_pos",
        "woe",
        "iv_term_nano",
        F.sum("iv_term_nano").over(w).cast("bigint").alias("iv_total_nano"),
    )




# ---------------------------------------------------------------------------
# Markov-chain removal-effect attribution (absorbing-chain conversion model)
# ---------------------------------------------------------------------------

_MKV_ITERS = 12  # fixed value-iteration count (spec'd, not "until converged")




def _mkv_trans_sql() -> str:
    """Shared journey→transition CTE block (DuckDB): journeys are
    (user, day); ordering (ts, event_id); events strictly before the
    first purchase are the path; the path ends in CONV if the journey
    purchased, else NULL; purchase-first journeys are START→CONV."""
    return """
    ev AS (
      SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events
    ),
    j1 AS MATERIALIZED (
      SELECT user_id, d,
             MIN(CASE WHEN is_p = 1 THEN ts END) AS fpt,
             MAX(is_p) AS has_p
      FROM ev GROUP BY 1, 2
    ),
    j2 AS (
      SELECT e.user_id, e.d, MIN(e.event_id) AS fpe
      FROM ev e JOIN j1 ON j1.user_id = e.user_id AND j1.d = e.d
      WHERE e.is_p = 1 AND e.ts = j1.fpt
      GROUP BY 1, 2
    ),
    kept AS MATERIALIZED (
      SELECT e.user_id, e.d, e.ts, e.event_id, e.event_type, j1.has_p
      FROM ev e
      JOIN j1 ON j1.user_id = e.user_id AND j1.d = e.d
      LEFT JOIN j2 ON j2.user_id = e.user_id AND j2.d = e.d
      WHERE e.is_p = 0
        AND (j1.has_p = 0 OR e.ts < j1.fpt
             OR (e.ts = j1.fpt AND e.event_id < j2.fpe))
    ),
    seq AS (
      SELECT user_id, d, event_type, has_p,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER (PARTITION BY user_id, d
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM kept
      WINDOW w AS (PARTITION BY user_id, d ORDER BY ts, event_id)
    ),
    raw_edges AS (
      SELECT COALESCE(prev, 'START') AS src, event_type AS dst FROM seq
      UNION ALL
      SELECT event_type AS src,
             CASE WHEN has_p = 1 THEN 'CONV' ELSE 'NULL' END AS dst
      FROM seq WHERE rn_last = 1
      UNION ALL
      SELECT 'START', 'CONV'
      FROM j1 LEFT JOIN (SELECT DISTINCT user_id, d FROM kept) kk
        ON kk.user_id = j1.user_id AND kk.d = j1.d
      WHERE j1.has_p = 1 AND kk.user_id IS NULL
    ),
    tr AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM raw_edges GROUP BY 1, 2
    ),
    outd AS MATERIALIZED (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out FROM tr GROUP BY 1),
    variants AS MATERIALIZED (
      SELECT '' AS removed
      UNION ALL
      SELECT DISTINCT src FROM tr WHERE src <> 'START'
    ),
    it0 AS MATERIALIZED (
      SELECT v.removed, o.src AS state, CAST(0 AS HUGEINT) AS p
      FROM variants v CROSS JOIN outd o
    )"""




def _mkv_iter_sql(k: int) -> str:
    """One unrolled value-iteration step: p_{k}(v, s) =
    Σ_dst n·val(dst) // n_out(s), where val is 1e6 at CONV, 0 at NULL
    and at the variant's removed state, else the previous iterate."""
    return f"""
    it{k} AS MATERIALIZED (
      SELECT v.removed, o.src AS state,
             SUM(CAST(tr.n AS HUGEINT) *
                 CASE WHEN tr.dst = 'CONV' THEN 1000000
                      WHEN tr.dst = 'NULL' THEN 0
                      WHEN tr.dst = v.removed THEN 0
                      ELSE COALESCE(pp.p, 0) END) // MAX(o.n_out) AS p
      FROM variants v
      CROSS JOIN outd o
      JOIN tr ON tr.src = o.src
      LEFT JOIN it{k - 1} pp
        ON pp.removed = v.removed AND pp.state = tr.dst
      GROUP BY 1, 2
    )"""




def _mkv_oracle() -> str:
    iters = "".join("," + _mkv_iter_sql(k) for k in range(1, _MKV_ITERS + 1))
    last = f"it{_MKV_ITERS}"
    return f"""
    WITH {_mkv_trans_sql()}{iters},
    base AS (
      SELECT CAST(p AS BIGINT) AS p_base_ppm FROM {last}
      WHERE removed = '' AND state = 'START'
    ),
    rem AS (
      SELECT removed AS channel, CAST(p AS BIGINT) AS p_removed_ppm
      FROM {last} WHERE removed <> '' AND state = 'START'
    ),
    eff AS (
      SELECT channel, p_base_ppm, p_removed_ppm,
             GREATEST(p_base_ppm - p_removed_ppm, 0) AS removal_effect_ppm
      FROM rem CROSS JOIN base
    )
    SELECT channel, p_base_ppm, p_removed_ppm, removal_effect_ppm,
           CAST(CAST(removal_effect_ppm AS HUGEINT) * 1000000
                // GREATEST(SUM(removal_effect_ppm) OVER (), 1) AS BIGINT)
             AS attribution_ppm
    FROM eff
    """




@register("markov_attribution_removal", oracle=_mkv_oracle())
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016 —
    the data-driven alternative to last-touch/linear rules): user-day
    journeys become an absorbing Markov chain (channel states +
    START/CONV/NULL, path truncated at the first purchase), and each
    channel's credit is its REMOVAL EFFECT — how much the chain's
    START→CONV absorption probability drops when every visit to that
    channel is redirected to NULL — normalized into attribution
    shares. Removal is implemented as pinning the removed state's
    value to zero inside the value iteration, which is exactly the
    redirect-to-NULL semantics.

    Scale posture: ALL data-sized work is the distributed transition
    count (two combinable (user, day) aggregates + one lag window per
    journey partition — the sessionize shape); the chain itself is
    BOUNDED at ≤(channels+3)² cells at any corpus size, so the
    absorption solve collects that ≤36-cell matrix and runs
    {_MKV_ITERS} fixed value iterations in exact Python integers (the
    similarity family's 64-row codebook-collect precedent — the only
    .collect() is the bounded matrix). Cross-engine determinism: the
    oracle unrolls the SAME {_MKV_ITERS} iterations as chained CTEs in
    HUGEINT with identical floor divisions per step (all operands
    non-negative, so // and div agree), probabilities are ppm
    integers, and the journey/truncation/tiebreak rules are written
    identically on both sides."""
    tr = _mkv_transitions(spark, sf_dir)
    schema = (
        "channel string, p_base_ppm bigint, p_removed_ppm bigint,"
        " removal_effect_ppm bigint, attribution_ppm bigint"
    )
    # the chain is bounded at (channels+3)^2 cells at ANY corpus size —
    # the only collect, same class as the 64-row PQ codebook
    cells = [(r["src"], r["dst"], r["n"]) for r in tr.collect()]
    if not cells:  # no journeys at all — match the oracle's empty result
        return spark.range(0).selectExpr(
            "CAST(NULL AS STRING) AS channel",
            "CAST(NULL AS BIGINT) AS p_base_ppm",
            "CAST(NULL AS BIGINT) AS p_removed_ppm",
            "CAST(NULL AS BIGINT) AS removal_effect_ppm",
            "CAST(NULL AS BIGINT) AS attribution_ppm",
        )
    n_out: dict[str, int] = {}
    for src_s, _, n in cells:
        n_out[src_s] = n_out.get(src_s, 0) + n
    channels = sorted(s for s in n_out if s != "START")

    def solve(removed: str) -> int:
        p = {s: 0 for s in n_out}
        for _ in range(_MKV_ITERS):
            new = {}
            for s in n_out:
                acc = 0
                for src, dst, n in cells:
                    if src != s:
                        continue
                    if dst == "CONV":
                        val = 1_000_000
                    elif dst == "NULL" or dst == removed:
                        val = 0
                    else:
                        val = p.get(dst, 0)
                    acc += n * val
                new[s] = acc // n_out[s]
            p = new
        return p["START"]

    p_base = solve("")
    removed = {c: solve(c) for c in channels}
    # removal is monotone (pinning a state to 0 only lowers iterates),
    # so the clamp is belt-and-braces against per-step flooring
    effects = {c: max(p_base - removed[c], 0) for c in channels}
    total = max(sum(effects.values()), 1)
    rows = [
        (c, p_base, removed[c], effects[c], effects[c] * 1_000_000 // total)
        for c in channels
    ]
    return spark.createDataFrame(rows, schema)




def _mkv_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed half of the Markov attribution: journey
    construction + transition counting (the sessionize shape — all
    windows partitioned per (user, day)), returning the bounded
    (src, dst, n) matrix."""
    ev = (
        _S._t(spark, sf_dir, "events")["events"]
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            "ts",
            "event_id",
            "event_type",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
        )
    )
    j1 = ev.groupBy("user_id", "d").agg(
        F.min(F.when(F.col("is_p") == 1, F.col("ts"))).alias("fpt"),
        F.max("is_p").alias("has_p"),
    )
    j2 = (
        ev.join(j1, ["user_id", "d"])
        .filter((F.col("is_p") == 1) & (F.col("ts") == F.col("fpt")))
        .groupBy("user_id", "d")
        .agg(F.min("event_id").alias("fpe"))
    )
    kept = (
        ev.join(j1, ["user_id", "d"])
        .join(j2, ["user_id", "d"], "left")
        .filter(
            (F.col("is_p") == 0)
            & (
                (F.col("has_p") == 0)
                | (F.col("ts") < F.col("fpt"))
                | ((F.col("ts") == F.col("fpt")) & (F.col("event_id") < F.col("fpe")))
            )
        )
        .select("user_id", "d", "ts", "event_id", "event_type", "has_p")
    )
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = kept.select(
        "event_type",
        "has_p",
        F.lag("event_type").over(w).alias("prev"),
        F.row_number().over(wl).alias("rn_last"),
        "user_id",
        "d",
    )
    steps = seq.select(
        F.coalesce(F.col("prev"), F.lit("START")).alias("src"),
        F.col("event_type").alias("dst"),
    )
    ends = seq.filter(F.col("rn_last") == 1).select(
        F.col("event_type").alias("src"),
        F.when(F.col("has_p") == 1, F.lit("CONV")).otherwise(F.lit("NULL")).alias("dst"),
    )
    pfirst = (
        j1.filter(F.col("has_p") == 1)
        .join(kept.select("user_id", "d").distinct(), ["user_id", "d"], "left_anti")
        .select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    )
    return (
        steps.unionByName(ends)
        .unionByName(pfirst)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )




# ---------------------------------------------------------------------------
# CUSUM drift / changepoint monitor over the daily revenue series
# ---------------------------------------------------------------------------

_CUSUM_K_DIV = 20  # slack k = mu/20 (tolerate ±5% day noise)


_CUSUM_H_DIV = 2  # alarm threshold h = mu/2 (cumulative half-day excess)




@register(
    "cusum_drift_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ),
    mu AS (
      SELECT CAST(SUM(rev_c) // COUNT(*) AS BIGINT) AS mu_c FROM daily
    ),
    pref AS (
      SELECT day, rev_c, mu_c,
             SUM(rev_c - mu_c - mu_c // {_CUSUM_K_DIV})
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
             SUM(rev_c - mu_c + mu_c // {_CUSUM_K_DIV})
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS q
      FROM daily, mu
    ),
    ext AS (
      SELECT day, rev_c, mu_c, p, q,
             LEAST(MIN(p) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0)
               AS pmin,
             GREATEST(MAX(q) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0)
               AS qmax
      FROM pref
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day, rev_c,
           CAST(p - pmin AS BIGINT) AS s_pos,
           CAST(qmax - q AS BIGINT) AS s_neg,
           (p - pmin > mu_c // {_CUSUM_H_DIV}) AS alarm_up,
           (qmax - q > mu_c // {_CUSUM_H_DIV}) AS alarm_down
    FROM ext
    """,
)
def cusum_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift monitor over the daily revenue series
    (Page 1954 — the changepoint detector behind most metric-
    monitoring systems): S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − μ − k) accumulates
    sustained upward excess and alarms when it crosses h; S⁻ mirrors
    downward. Slack k = μ/{_CUSUM_K_DIV} (±5% day noise tolerated),
    threshold h = μ/{_CUSUM_H_DIV}. On the steady synthetic corpus the
    alarm branches stay false — a constructed level-shift corpus pins
    both firing in tests/test_statistics_sanity.py.

    Scale posture: the raw table collapses to the DAILY grid first (a
    combinable sum keyed by the calendar — bounded rows at any corpus
    size); the CUSUM recursion is rewritten as windows — the classic
    identity S⁺ₜ = Pₜ − min(min_{{j≤t}} Pⱼ, 0) over the prefix sums Pₜ
    of (xₜ−μ−k) — so the only ordered pass runs over the bounded grid
    (the rolling_median precedent for global windows on reduced
    aggregates). Cross-engine determinism: money in BIGINT cents, μ
    and the slack/threshold as exact floor divisions, alarms as
    integer comparisons — no float anywhere."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("rev_c")
    )
    # mu as a global window over the bounded DAILY grid — not a second
    # scan of orders (the lang_rebalance_sample precedent)
    wg = Window.partitionBy()
    with_mu = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(wg).alias("tot"),
        F.count(F.lit(1)).over(wg).alias("nd"),
    ).select(
        "day",
        "rev_c",
        # integer floor division — SUM/COUNT would be double division,
        # which diverges from the oracle's exact // on 100 TB-scale sums
        F.expr("CAST(tot div nd AS BIGINT)").alias("mu_c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = with_mu.select(
        "day",
        "rev_c",
        "mu_c",
        F.sum(F.expr(f"rev_c - mu_c - mu_c div {_CUSUM_K_DIV}")).over(w).alias("p"),
        F.sum(F.expr(f"rev_c - mu_c + mu_c div {_CUSUM_K_DIV}")).over(w).alias("q"),
    )
    ext = pref.select(
        "day",
        "rev_c",
        "mu_c",
        "p",
        "q",
        F.least(F.min("p").over(w), F.lit(0)).alias("pmin"),
        F.greatest(F.max("q").over(w), F.lit(0)).alias("qmax"),
    )
    h = F.expr(f"mu_c div {_CUSUM_H_DIV}")
    return ext.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev_c",
        (F.col("p") - F.col("pmin")).cast("bigint").alias("s_pos"),
        (F.col("qmax") - F.col("q")).cast("bigint").alias("s_neg"),
        (F.col("p") - F.col("pmin") > h).alias("alarm_up"),
        (F.col("qmax") - F.col("q") > h).alias("alarm_down"),
    )




# ---------------------------------------------------------------------------
# UCB1 arm ranking (adaptive-experimentation readout)
# ---------------------------------------------------------------------------

# the one transcendental, rendered from a single shared string so both
# engines evaluate identical operand order: mean + sqrt(2 ln N / n)
_UCB_EXPR = (
    "ROUND(CAST(n_conv AS DOUBLE) / n_pulls"
    " + SQRT(2.0 * LN(CAST(n_total AS DOUBLE)) / n_pulls), 6)"
)




@register(
    "ucb_arm_ranking",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    arm AS (
      SELECT event_type AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_pulls,
             CAST(SUM(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_conv
      FROM seq WHERE event_type <> 'purchase' GROUP BY 1
    ),
    tot AS (
      SELECT arm, n_pulls, n_conv,
             CAST(SUM(n_pulls) OVER () AS BIGINT) AS n_total
      FROM arm
    )
    SELECT arm, n_pulls, n_conv, n_total,
           {_UCB_EXPR} AS ucb_score,
           CAST(ROW_NUMBER() OVER (
             ORDER BY {_UCB_EXPR} DESC, arm) AS INTEGER) AS ucb_rank
    FROM tot
    """,
)
def ucb_arm_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 arm ranking (Auer et al. 2002 — the exploration policy
    behind adaptive experiments and recommender slates): each
    non-purchase event type is an arm, a pull converts when the
    user's NEXT event that day is a purchase, and the score is the
    optimistic bound p̂ + √(2·ln N / n) — low-traffic arms rank above
    their raw conversion rate (the exploration bonus), which is
    exactly what the readout is for.

    Scale posture: the per-event LEAD runs inside the (user, day)
    journey partition (the sessionize shape — no global window over
    raw rows); arms reduce to a ≤#event-types aggregate and
    everything after is bounded. Cross-engine determinism: pulls and
    conversions are exact integers; the single transcendental bound
    is rendered from ONE shared expression string (identical operand
    order both engines), rounded to 6dp, with ranking ties broken on
    the arm name."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("event_type") != "purchase")
    arm = seq.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pulls"),
        F.sum(F.when(F.col("nxt") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_conv"),
    )
    tot = arm.select(
        "arm",
        "n_pulls",
        "n_conv",
        F.sum("n_pulls").over(Window.partitionBy()).cast("bigint").alias("n_total"),
    )
    return tot.select(
        "arm",
        "n_pulls",
        "n_conv",
        "n_total",
        F.expr(_UCB_EXPR).alias("ucb_score"),
        F.row_number()
        .over(Window.orderBy(F.expr(_UCB_EXPR).desc(), "arm"))
        .cast("int")
        .alias("ucb_rank"),
    )



_SPRT_P0 = 0.35  # pre-registered null conversion rate (user-day units)


_SPRT_P1 = 0.45  # pre-registered alternative (the effect worth shipping)


# frozen shared literals (the per-rank-constants policy): both engines
# multiply integer counts by the SAME nano-unit constants, so the LLR
# path is pure integer arithmetic end to end
_SPRT_C1_NANO = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1e9)  # per conversion


_SPRT_C0_NANO = round(_math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e9)  # per miss


_SPRT_A_NANO = round(_math.log(19.0) * 1e9)  # ln((1-β)/α), α=β=0.05


_SPRT_B_NANO = -_SPRT_A_NANO  # ln(β/(1-α)) — symmetric at α=β




@register(
    "ab_sprt_stopping_audit",
    oracle=f"""
    WITH u AS (
      SELECT CAST(ts AS DATE) AS day,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events WHERE user_id % 2 = 1
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(conv) AS BIGINT) AS x_conv
      FROM u GROUP BY day
    ),
    llr AS (
      SELECT day, n_units, x_conv,
             CAST(x_conv * {_SPRT_C1_NANO}
                  + (n_units - x_conv) * {_SPRT_C0_NANO} AS BIGINT)
               AS llr_term_nano
      FROM daily
    ),
    cum AS (
      SELECT day, n_units, x_conv, llr_term_nano,
             CAST(SUM(llr_term_nano)
                  OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_llr_nano
      FROM llr
    ),
    flagged AS (
      SELECT *,
             MAX(CASE WHEN cum_llr_nano >= {_SPRT_A_NANO} THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS crossed_up,
             MAX(CASE WHEN cum_llr_nano <= {_SPRT_B_NANO} THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS crossed_down
      FROM cum
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day, n_units, x_conv,
           llr_term_nano, cum_llr_nano,
           CASE WHEN crossed_up = 1 AND crossed_down = 0 THEN 'accept_h1'
                WHEN crossed_down = 1 AND crossed_up = 0 THEN 'accept_h0'
                WHEN crossed_up = 1 AND crossed_down = 1 THEN 'both_crossed'
                ELSE 'continue' END AS verdict
    FROM flagged
    """,
)
def ab_sprt_stopping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential-stopping audit of the treatment arm (Wald
    1945 — the "when could we have stopped this experiment" readout):
    daily user-day conversions accumulate the binomial log-likelihood
    ratio between the pre-registered H1 (p={_SPRT_P1}) and H0
    (p={_SPRT_P0}); the verdict turns sticky once the cumulative LLR
    crosses ln((1−β)/α) (accept H1) or its negative (accept H0) at
    α=β=0.05. Complements ``ab_test_proportion_z`` (a fixed-horizon
    test this audit tells you when you could have ended early).

    Scale posture: raw events collapse to user-day conversions, then
    to the bounded DAILY grid (two combinable aggregates); cumulative
    LLR and the sticky crossing flags are windows over that grid only.
    Cross-engine determinism: THE classic frozen-shared-literal shape
    — both engines multiply integer (conversion, miss) counts by the
    same precomputed nano-unit LN constants ({_SPRT_C1_NANO} /
    {_SPRT_C0_NANO}), so no transcendental is ever evaluated inside
    either engine; boundaries are frozen nano literals; verdicts are
    integer comparisons."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    u = (
        ev.filter(F.col("user_id") % 2 == 1)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    daily = u.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("conv").cast("bigint").alias("x_conv"),
    )
    llr = daily.select(
        "day",
        "n_units",
        "x_conv",
        F.expr(
            f"CAST(x_conv * {_SPRT_C1_NANO}"
            f" + (n_units - x_conv) * {_SPRT_C0_NANO} AS BIGINT)"
        ).alias("llr_term_nano"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = llr.withColumn(
        "cum_llr_nano", F.sum("llr_term_nano").over(w).cast("bigint")
    )
    flagged = cum.select(
        "*",
        F.max(
            F.when(F.col("cum_llr_nano") >= _SPRT_A_NANO, 1).otherwise(0)
        ).over(w).alias("crossed_up"),
        F.max(
            F.when(F.col("cum_llr_nano") <= _SPRT_B_NANO, 1).otherwise(0)
        ).over(w).alias("crossed_down"),
    )
    verdict = (
        F.when((F.col("crossed_up") == 1) & (F.col("crossed_down") == 0), "accept_h1")
        .when((F.col("crossed_down") == 1) & (F.col("crossed_up") == 0), "accept_h0")
        .when((F.col("crossed_up") == 1) & (F.col("crossed_down") == 1), "both_crossed")
        .otherwise("continue")
    )
    return flagged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_units",
        "x_conv",
        "llr_term_nano",
        "cum_llr_nano",
        verdict.alias("verdict"),
    )




# ---------------------------------------------------------------------------
# Mergeable equi-width histogram sketch, quantile-audited
# ---------------------------------------------------------------------------

_EWH_BINS = 64


_EWH_QS = ((1, 2, "p50"), (19, 20, "p95"))




@register(
    "equiwidth_hist_quantile_audit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    b AS (
      SELECT CAST(MIN(c) AS BIGINT) AS lo, CAST(MAX(c) AS BIGINT) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v
    ),
    hist AS (
      SELECT (c - lo) * {_EWH_BINS} // (hi - lo + 1) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v, b GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    qs AS (
      SELECT * FROM (VALUES
        {", ".join(f"({num}, {den}, '{lbl}')" for num, den, lbl in _EWH_QS)}
      ) AS t(q_num, q_den, q_label)
    ),
    est AS (
      SELECT q.q_label, b.n,
             CAST(MIN(b.lo + (c.bin * (b.hi - b.lo + 1) + {_EWH_BINS - 1}) // {_EWH_BINS}
                  + (((b.hi - b.lo + 1) + {_EWH_BINS - 1}) // {_EWH_BINS})
                    * ((b.n * q.q_num + q.q_den - 1) // q.q_den
                       - (c.cum - c.cnt))
                    // c.cnt) AS BIGINT) AS est_cents,
             CAST(MIN(((b.hi - b.lo + 1) + {_EWH_BINS - 1}) // {_EWH_BINS}) AS BIGINT)
               AS bin_width_cents
      FROM cum c CROSS JOIN b JOIN qs q
        ON c.cum >= (b.n * q.q_num + q.q_den - 1) // q.q_den
       AND c.cum - c.cnt < (b.n * q.q_num + q.q_den - 1) // q.q_den
      GROUP BY 1, 2
    ),
    vh AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY c),
    vcum AS (
      SELECT c, cnt, SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
      FROM vh
    ),
    exact AS (
      SELECT q.q_label, CAST(MIN(vc.c) AS BIGINT) AS exact_cents
      FROM vcum vc CROSS JOIN b JOIN qs q
        ON vc.cum >= (b.n * q.q_num + q.q_den - 1) // q.q_den
       AND vc.cum - vc.cnt < (b.n * q.q_num + q.q_den - 1) // q.q_den
      GROUP BY 1
    )
    SELECT e.q_label, e.n, e.est_cents, x.exact_cents,
           ABS(e.est_cents - x.exact_cents) AS abs_err_cents,
           e.bin_width_cents,
           (ABS(e.est_cents - x.exact_cents) <= e.bin_width_cents)
             AS within_guarantee
    FROM est e JOIN exact x ON x.q_label = e.q_label
    """,
)
def equiwidth_hist_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch with its accuracy audit:
    a fixed {_EWH_BINS}-bin count histogram over order totals — the
    simplest MERGEABLE quantile sketch; Spark's partial aggregation IS
    the distributed sketch merge, since per-partition bin counts add —
    answers p50/p95 by integer interpolation inside the located bin,
    and the audit compares against the EXACT percentile (the
    ``percentile_disc`` value-histogram machinery), asserting the
    sketch's theoretical guarantee |est − exact| ≤ bin width. The
    every-sketch-ships-its-own-audit pattern (bloom_filter_fpr,
    heavy_hitters_cms, distinct_hll_manual) applied to quantiles.

    Scale posture: TWO combinable aggregates over the scan (the 64-bin
    sketch and the value-range-bounded exact histogram) plus windows
    over those bounded tables; bounds ride a 1-row broadcast.
    The reported bin edge is the CEILING lo + ceil(bin·W/{bins}) (the
    true smallest value the bin can hold) and the reported width is
    ceil(W/{bins}) (an upper bound on every actual bin width), so
    |est − exact| ≤ bin_width is PROVABLE: exact lies in [edge,
    edge+width−1] and the interpolated estimate in (edge, edge+width]
    — a floor-edge convention could report a spurious violation on
    duplicate-heavy bins. Cross-engine determinism: everything is
    BIGINT cents with floor division — bin assignment, the ceil(q·n)
    index arithmetic of the percentile family, and the in-bin linear
    interpolation are all exact integer expressions identical on both
    engines."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    v = orders.select(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"))
    b = v.agg(
        F.min("c").cast("bigint").alias("lo"),
        F.max("c").cast("bigint").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    hist = (
        v.crossJoin(F.broadcast(b))
        .groupBy(F.expr(f"(c - lo) * {_EWH_BINS} div (hi - lo + 1)").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qs = spark.createDataFrame(
        [(num, den, lbl) for num, den, lbl in _EWH_QS],
        "q_num bigint, q_den bigint, q_label string",
    )
    idx = F.expr("(n * q_num + q_den - 1) div q_den")
    est = (
        cum.crossJoin(F.broadcast(b))
        .join(
            F.broadcast(qs),
            (F.col("cum") >= idx) & (F.col("cum") - F.col("cnt") < idx),
        )
        .groupBy("q_label", "n")
        .agg(
            F.min(
                F.expr(
                    f"lo + (bin * (hi - lo + 1) + {_EWH_BINS - 1}) div {_EWH_BINS}"
                    f" + (((hi - lo + 1) + {_EWH_BINS - 1}) div {_EWH_BINS})"
                    f" * ((n * q_num + q_den - 1) div q_den - (cum - cnt))"
                    f" div cnt"
                )
            )
            .cast("bigint")
            .alias("est_cents"),
            F.min(F.expr(f"((hi - lo + 1) + {_EWH_BINS - 1}) div {_EWH_BINS}"))
            .cast("bigint")
            .alias("bin_width_cents"),
        )
    )
    vh = v.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wv = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vh.withColumn("cum", F.sum("cnt").over(wv))
    exact = (
        vcum.crossJoin(F.broadcast(b))
        .join(
            F.broadcast(qs),
            (F.col("cum") >= idx) & (F.col("cum") - F.col("cnt") < idx),
        )
        .groupBy("q_label")
        .agg(F.min("c").cast("bigint").alias("exact_cents"))
    )
    return (
        est.join(exact, "q_label")
        .select(
            "q_label",
            "n",
            "est_cents",
            "exact_cents",
            F.abs(F.col("est_cents") - F.col("exact_cents"))
            .cast("bigint")
            .alias("abs_err_cents"),
            "bin_width_cents",
            (
                F.abs(F.col("est_cents") - F.col("exact_cents"))
                <= F.col("bin_width_cents")
            ).alias("within_guarantee"),
        )
    )




# ---------------------------------------------------------------------------
# Split-conformal prediction interval coverage audit
# ---------------------------------------------------------------------------

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1 -> 90% intervals




@register(
    "conformal_interval_coverage",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS priority,
             o_orderkey % 2 = 0 AS is_cal,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    pred AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(SUM(cents) // COUNT(*) AS BIGINT) AS yhat_cents
      FROM base WHERE is_cal GROUP BY priority
    ),
    cal_resid AS (
      SELECT b.priority, ABS(b.cents - p.yhat_cents) AS r
      FROM base b JOIN pred p ON p.priority = b.priority
      WHERE b.is_cal
    ),
    hist AS (
      SELECT priority, r, COUNT(*) AS cnt FROM cal_resid GROUP BY 1, 2
    ),
    cum AS (
      SELECT priority, r, SUM(cnt) OVER (
               PARTITION BY priority ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM hist
    ),
    q AS (
      SELECT c.priority, CAST(MIN(c.r) AS BIGINT) AS q_cents
      FROM cum c JOIN pred p ON p.priority = c.priority
      WHERE c.c >= ((p.n_cal + 1) * ({_CONF_ALPHA_DEN} - {_CONF_ALPHA_NUM})
                    + {_CONF_ALPHA_DEN} - 1) // {_CONF_ALPHA_DEN}
      GROUP BY c.priority
    )
    SELECT b.priority,
           MIN(p.n_cal) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           MIN(p.yhat_cents) AS yhat_cents,
           MIN(q.q_cents) AS q_cents,
           CAST(SUM(CASE WHEN ABS(b.cents - p.yhat_cents) <= q.q_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered,
           CAST(CAST(SUM(CASE WHEN ABS(b.cents - p.yhat_cents) <= q.q_cents
                              THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
    FROM base b
    JOIN pred p ON p.priority = b.priority
    JOIN q ON q.priority = b.priority
    WHERE NOT b.is_cal
    GROUP BY b.priority
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction audit (Vovk et al.; the
    distribution-free interval recipe production ML monitors use):
    calibrate a per-priority constant predictor (mean total price in
    exact integer cents) on the even-key half of orders, take the
    conformal quantile q = the ceil((n_cal+1)·(1−α))-th smallest
    calibration residual, and measure on the odd-key half what
    fraction of residuals fall within q. Split conformal guarantees
    coverage ≥ 1−α = 90% in expectation REGARDLESS of the model or the
    data distribution — the audit's coverage_ppm column is the
    empirical check of that guarantee per group.

    Scale posture: the conformal quantile uses the value-histogram
    pattern (see ``percentile_disc_by_segment``) — calibration rows
    collapse to a (priority, residual) histogram FIRST, the cumulative
    window orders the histogram (cardinality = distinct residuals per
    group, not rows), and the rank probe is exact integer arithmetic.
    No row-level sort anywhere; the test pass is one shuffle-free
    aggregate after two broadcast joins of 5-row tables.

    Cross-engine determinism: money in BIGINT cents, the predictor is
    an integer floor-division, the rank index
    ((n+1)·(den−num)+den−1) // den is exact on both engines, and
    coverage is a HUGEINT/DECIMAL ppm floor-division.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_orderkey") % 2 == 0).alias("is_cal"),
        cents.alias("cents"),
        # consumed three times (predictor, calibration residuals, test
        # coverage) — checkpoint the 3-column projection once
    ).localCheckpoint()
    pred = (
        base.filter("is_cal")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cal"),
            F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias(
                "yhat_cents"
            ),
        )
    )
    cal_resid = (
        base.filter("is_cal")
        .join(F.broadcast(pred), "priority")
        .select("priority", F.abs(F.col("cents") - F.col("yhat_cents")).alias("r"))
    )
    hist = cal_resid.groupBy("priority", "r").agg(F.count(F.lit(1)).alias("cnt"))
    wp = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "r",
        F.sum("cnt")
        .over(wp.orderBy("r").rowsBetween(Window.unboundedPreceding, 0))
        .alias("c"),
    )
    k = F.expr(
        f"((n_cal + 1) * ({_CONF_ALPHA_DEN} - {_CONF_ALPHA_NUM})"
        f" + {_CONF_ALPHA_DEN} - 1) div {_CONF_ALPHA_DEN}"
    )
    q = (
        cum.join(F.broadcast(pred), "priority")
        .filter(F.col("c") >= k)
        .groupBy("priority")
        .agg(F.min("r").cast("bigint").alias("q_cents"))
    )
    return (
        base.filter(~F.col("is_cal"))
        .join(F.broadcast(pred), "priority")
        .join(F.broadcast(q), "priority")
        .groupBy("priority")
        .agg(
            F.min("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.min("yhat_cents").alias("yhat_cents"),
            F.min("q_cents").alias("q_cents"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("yhat_cents"))
                    <= F.col("q_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
            F.expr(
                "CAST(CAST(SUM(CASE WHEN ABS(cents - yhat_cents) <= q_cents"
                " THEN 1 ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                " div COUNT(*) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )




# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution (observed-coalition variant)
# ---------------------------------------------------------------------------

_SHAP_CONV = "purchase"  # the conversion event; all other types are channels


_SHAP_MAX_BITS = 8  # popcount/factorial expressions generated to this width


_SHAP_FACT = [1, 1, 2, 6, 24, 120, 720, 5040, 40320]




def _fact_case(expr: str) -> str:
    """Factorial lookup as a generated CASE (shared text, both engines
    parse it identically — no engine factorial built-in involved)."""
    whens = " ".join(
        f"WHEN {i} THEN {_SHAP_FACT[i]}" for i in range(_SHAP_MAX_BITS + 1)
    )
    return f"(CASE {expr} {whens} END)"




def _popcount_sql(expr: str) -> str:
    """Generated popcount over {_SHAP_MAX_BITS} bits — identical text
    both engines (DuckDB's bit_count and Spark's differ in argument
    typing; the generated sum does not)."""
    return "(" + " + ".join(
        f"(({expr} >> {i}) & 1)" for i in range(_SHAP_MAX_BITS)
    ) + ")"




@register(
    "shapley_attribution",
    oracle=f"""
    WITH chan AS (
      SELECT event_type AS channel,
             1 << CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INTEGER)
               AS bit
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type <> '{_SHAP_CONV}')
    ),
    nchan AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM chan),
    users AS (
      SELECT e.user_id,
             COALESCE(SUM(DISTINCT c.bit), 0) AS mask,
             MAX(CASE WHEN e.event_type = '{_SHAP_CONV}' THEN 1 ELSE 0 END)
               AS converted
      FROM events e LEFT JOIN chan c ON c.channel = e.event_type
      GROUP BY e.user_id
    ),
    v AS (
      SELECT mask, CAST(SUM(converted) AS BIGINT) AS conv
      FROM users GROUP BY mask
    ),
    -- ALL 2^n - 1 nonempty coalitions, not just observed masks
    -- (ADVICE r11): an unobserved S (v(S)=0) whose subset S\\c IS
    -- observed still contributes -v(S\\c)*w; enumerating <=255 masks
    -- makes the sum the exact Shapley value of the declared game.
    masks AS (
      SELECT UNNEST(RANGE(1, 1 << CAST(LEAST(n, {_SHAP_MAX_BITS})
                                       AS INTEGER))) AS mask
      FROM nchan
    ),
    terms AS (
      SELECT ch.channel, n.n, m.mask,
             (COALESCE(v.conv, 0) - COALESCE(v2.conv, 0))
               * {_fact_case(_popcount_sql('m.mask') + ' - 1')}
               * {_fact_case('n.n - ' + _popcount_sql('m.mask'))}
             -- guard: >{_SHAP_MAX_BITS} channels would make the generated
             -- popcount/factorial CASEs yield NULLs that SUM silently
             -- skips — fail loudly instead of answering wrong
             + COALESCE(CASE WHEN n.n > {_SHAP_MAX_BITS}
                             THEN error('shapley_attribution: more than'
                                        ' {_SHAP_MAX_BITS} channels') END,
                        0) AS t
      FROM chan ch
      CROSS JOIN nchan n
      JOIN masks m ON (m.mask & ch.bit) <> 0
      LEFT JOIN v ON v.mask = m.mask
      LEFT JOIN v v2 ON v2.mask = m.mask - ch.bit
    )
    SELECT channel,
           MIN(n) AS n_channels,
           CAST(COUNT(*) AS BIGINT) AS n_sets,
           CAST(SUM(t) AS BIGINT) AS phi_scaled,
           CAST(CAST(SUM(t) AS HUGEINT) * 1000000000
                // {_fact_case('MIN(n)')} AS BIGINT) AS phi_nano
    FROM terms GROUP BY channel
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value marketing attribution (Zhao, Mahboobi &
    Maldonado 2018): the coalition value v(S) is the number of
    converting users whose pre-conversion channel set is exactly S
    (v(S)=0 for unobserved sets), and each channel's Shapley value is
    Σ_{{S∋c}} (v(S)−v(S∖c))·(|S|−1)!(n−|S|)!/n! summed over ALL 2ⁿ−1
    nonempty coalitions — enumerated explicitly (n ≤ 8 gated, ≤255
    masks), so unobserved S whose subset S∖c IS observed contribute
    their −v(S∖c) terms and efficiency/symmetry/dummy genuinely hold
    (ADVICE r11 closed the observed-masks-only truncation). Sits next
    to ``markov_attribution_removal``'s removal-effect variant.

    Scale posture: the corpus collapses to one row per user (one
    shuffle), then to the ≤2ⁿ-mask coalition table — every join after
    that is over BOUNDED tables (n = channel count; 2ⁿ masks), the
    bounded-matrix pattern (Markov-chain precedent). Cross-engine
    determinism: channel bits from an alphabetical DENSE rank; masks
    are exact integer bit sums (SUM(DISTINCT bit) ≡ OR for unique
    powers of two); factorials and popcounts are GENERATED shared CASE
    text so no engine built-in is trusted; the one division is a
    HUGEINT/DECIMAL nano floor-division by n! at the very end.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    chan = (
        ev.filter(F.col("event_type") != _SHAP_CONV)
        .select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("channel"),
            F.expr(
                "shiftleft(1, CAST(ROW_NUMBER() OVER"
                " (ORDER BY event_type) - 1 AS INT))"
            ).alias("bit"),
        )
    )
    nchan = chan.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    users = (
        ev.join(F.broadcast(chan), ev.event_type == chan.channel, "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum_distinct("bit"), F.lit(0)).alias("mask"),
            F.max(
                F.when(F.col("event_type") == _SHAP_CONV, 1).otherwise(0)
            ).alias("converted"),
        )
    )
    v = users.groupBy("mask").agg(
        F.sum("converted").cast("bigint").alias("conv")
    )
    # ALL 2^n - 1 nonempty coalitions (ADVICE r11): unobserved S with an
    # observed subset S\c still contributes -v(S\c)*w — enumerating the
    # bounded <=255-mask universe makes this the exact Shapley value.
    masks = nchan.select(
        F.explode(
            F.expr(
                "sequence(1, shiftleft(1,"
                f" CAST(LEAST(n, {_SHAP_MAX_BITS}) AS INT)) - 1)"
            )
        ).alias("mask")
    )
    vS = v.select(F.col("mask").alias("maskS"), F.col("conv").alias("convS"))
    v2 = v.select(F.col("mask").alias("mask2"), F.col("conv").alias("conv2"))
    terms = (
        chan.crossJoin(F.broadcast(nchan))
        .join(F.broadcast(masks), F.expr("(mask & bit) <> 0"))
        .join(F.broadcast(vS), F.expr("maskS = mask"), "left")
        .join(
            F.broadcast(v2),
            F.expr("mask2 = mask - bit"),
            "left",
        )
        .select(
            "channel",
            "n",
            F.expr(
                f"(COALESCE(convS, 0) - COALESCE(conv2, 0))"
                f" * {_fact_case(_popcount_sql('mask') + ' - 1')}"
                f" * {_fact_case('n - ' + _popcount_sql('mask'))}"
                # guard: >MAX_BITS channels would make the generated
                # popcount/factorial CASEs yield NULLs that SUM silently
                # skips — raise instead of answering wrong
                f" + COALESCE(CAST(assert_true(n <= {_SHAP_MAX_BITS},"
                f" 'shapley_attribution: more than {_SHAP_MAX_BITS}"
                f" channels') AS BIGINT), 0)"
            ).alias("t"),
        )
    )
    return terms.groupBy("channel").agg(
        F.min("n").alias("n_channels"),
        F.count(F.lit(1)).cast("bigint").alias("n_sets"),
        F.sum("t").cast("bigint").alias("phi_scaled"),
        F.expr(
            "CAST(CAST(SUM(t) AS DECIMAL(38,0)) * 1000000000"
            f" div {_fact_case('MIN(n)')} AS BIGINT)"
        ).alias("phi_nano"),
    )




# ---------------------------------------------------------------------------
# A/B test power analysis: minimum detectable effect per segment
# ---------------------------------------------------------------------------

# frozen two-sided alpha=0.05 / power=0.80 normal quantiles (shared
# literals — per-rank-constant rule, never an engine's inverse normal)
_MDE_Z_ALPHA = "1.959963985"


_MDE_Z_BETA = "0.8416212336"




def _mde_oracle() -> str:
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs_sql,
        nano_mu_sql,
        nano_sigma_samp_sql,
    )

    return f"""
    WITH mom AS (
      SELECT o_orderpriority AS priority, {nano_moment_aggs_sql('o_totalprice')}
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT priority, CAST(n AS BIGINT) AS n,
             {nano_mu_sql()} AS mu,
             {nano_sigma_samp_sql()} AS sigma
      FROM mom
    )
    SELECT priority, n,
           ROUND(mu, 6) AS mean_price,
           ROUND(sigma, 6) AS sigma_price,
           -- CAST each z literal to DOUBLE before adding: DuckDB sums
           -- bare decimal literals EXACTLY, Spark adds doubles — a
           -- measured 1-ulp divergence on this very pair
           ROUND((CAST({_MDE_Z_ALPHA} AS DOUBLE)
                  + CAST({_MDE_Z_BETA} AS DOUBLE)) * sigma
                 * SQRT(2.0 / (n / 2)), 6) AS mde_abs,
           CAST(ROUND((CAST({_MDE_Z_ALPHA} AS DOUBLE)
                       + CAST({_MDE_Z_BETA} AS DOUBLE)) * sigma
                      * SQRT(2.0 / (n / 2)) / mu * 1000000) AS BIGINT)
             AS mde_rel_ppm
    FROM stats WHERE n > 1
    """




@register("power_analysis_mde", oracle=_mde_oracle())
def power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment power analysis per segment: the minimum
    detectable effect on mean order value at α=0.05 (two-sided) and
    80% power if the segment's traffic were split 50/50 —
    MDE = (z_{{α/2}}+z_β)·σ·√(2/(n/2)) — the "is this experiment even
    worth running here" table next to the post-hoc tests
    (``welch_t_click_view``, ``ab_test_proportion_z``). Segments whose
    MDE exceeds plausible lifts need pooling or longer runs; that
    decision is exactly what this output ranks.

    Scale posture: one combinable moments aggregate per segment
    (bounded output = segment count); no joins, no windows.
    Cross-engine determinism: exact integer nano-moments
    (functions/moments.py policy), z constants are frozen shared
    literals (never an engine's inverse-normal), n/2 is DOUBLE
    division in BOTH engines (Spark ``/`` and DuckDB ``/`` both
    promote — deliberately NOT ``div``/``//``, which would truncate
    odd n differently from the formula), and every double op has
    identical operand order.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs,
        nano_mu,
        nano_sigma_samp,
    )

    orders = _S._t(spark, sf_dir, "orders")["orders"]
    mom = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        *nano_moment_aggs("o_totalprice")
    )
    z_sum = F.lit(float(_MDE_Z_ALPHA)) + F.lit(float(_MDE_Z_BETA))
    stats = mom.select(
        "priority",
        F.col("n").cast("bigint").alias("n"),
        nano_mu().alias("mu"),
        nano_sigma_samp().alias("sigma"),
    )
    mde = z_sum * F.col("sigma") * F.sqrt(2.0 / (F.col("n") / 2).cast("double"))
    return stats.filter(F.col("n") > 1).select(
        "priority",
        "n",
        F.round("mu", 6).alias("mean_price"),
        F.round("sigma", 6).alias("sigma_price"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("mu") * 1000000)
        .cast("bigint")
        .alias("mde_rel_ppm"),
    )




# ---------------------------------------------------------------------------
# Simpson's paradox detector (stratified vs pooled association sign)
# ---------------------------------------------------------------------------


@register(
    "simpson_paradox_detector",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST(ROUND(l_discount * 1000000) AS BIGINT)
                      AS HUGEINT)) AS sa,
             SUM(CAST(CAST(ROUND(l_quantity * 1000000) AS BIGINT)
                      AS HUGEINT)) AS sb,
             SUM(CAST(CAST(ROUND(l_discount * 1000000) AS BIGINT)
                      AS HUGEINT)
                 * CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS sab
      FROM lineitem GROUP BY 1
    ),
    pooled AS (
      SELECT SUM(n) AS n, SUM(sa) AS sa, SUM(sb) AS sb, SUM(sab) AS sab
      FROM m
    ),
    signs AS (
      SELECT m.stratum, m.n,
             CAST(SIGN(m.n * m.sab - m.sa * m.sb) AS INTEGER)
               AS stratum_sign,
             CAST(SIGN(p.n * p.sab - p.sa * p.sb) AS INTEGER)
               AS pooled_sign
      FROM m CROSS JOIN pooled p
    )
    SELECT stratum, n, stratum_sign, pooled_sign,
           stratum_sign <> 0 AND pooled_sign <> 0
             AND stratum_sign <> pooled_sign AS simpson_flip
    FROM signs
    """,
)
def simpson_paradox_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the SIGN of the discount↔quantity
    association within each return-flag stratum vs the pooled sign — a
    stratum whose association points the other way from the aggregate
    is the textbook aggregation trap (the pooled trend is a weighted
    mix of within-stratum trends plus a between-stratum confound), and
    this table is the screen an analyst runs before trusting any
    corpus-level correlation. The sign of the OLS slope / Pearson
    numerator n·Σab − Σa·Σb carries the association direction without
    any division or square root.

    Scale posture: one combinable moments aggregate per stratum
    (bounded output = return flags), pooled moments derived by SUMMING
    the per-stratum moments (no second scan), one broadcast of a 1-row
    table. Cross-engine determinism: values scale to exact integer
    MICRO-units (discount has 2dp, quantity is integral — micro keeps
    the n·Σab product within DECIMAL(38)/HUGEINT headroom at 1e11
    rows, where nano would overflow), the sign is computed on exact
    integers, and there is no floating-point operation anywhere.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    li = _S._t(spark, sf_dir, "lineitem")["lineitem"]
    a = F.round(F.col("l_discount") * 1000000).cast("bigint")
    b = F.round(F.col("l_quantity") * 1000000).cast("bigint")
    m = li.groupBy(F.col("l_returnflag").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(a.cast("decimal(38,0)")).alias("sa"),
        F.sum(b.cast("decimal(38,0)")).alias("sb"),
        F.sum(a.cast("decimal(38,0)") * b).alias("sab"),
    )
    pooled = m.agg(
        F.sum("n").alias("pn"),
        F.sum("sa").alias("psa"),
        F.sum("sb").alias("psb"),
        F.sum("sab").alias("psab"),
    )
    out = m.crossJoin(F.broadcast(pooled)).select(
        "stratum",
        "n",
        F.expr("CAST(SIGN(n * sab - sa * sb) AS INT)").alias("stratum_sign"),
        F.expr("CAST(SIGN(pn * psab - psa * psb) AS INT)").alias("pooled_sign"),
    )
    return out.select(
        "stratum",
        "n",
        "stratum_sign",
        "pooled_sign",
        (
            (F.col("stratum_sign") != 0)
            & (F.col("pooled_sign") != 0)
            & (F.col("stratum_sign") != F.col("pooled_sign"))
        ).alias("simpson_flip"),
    )




# ---------------------------------------------------------------------------
# O'Brien-Fleming group-sequential monitoring (K=5 looks)
# ---------------------------------------------------------------------------

# classic O'Brien-Fleming two-sided alpha=0.05, K=5 boundary:
# z_k = C * sqrt(K/k) with C = 2.0401 (Jennison & Turnbull table) —
# FROZEN per-look literals, never an engine's sqrt at query time
_OBF_BOUNDS = ((1, "4.5618"), (2, "3.2257"), (3, "2.6338"),
               (4, "2.2809"), (5, "2.0401"))


_OBF_K = len(_OBF_BOUNDS)




def _obf_oracle() -> str:
    bounds = " UNION ALL ".join(
        f"SELECT {k} AS look, CAST({b} AS DOUBLE) AS z_bound"
        for k, b in _OBF_BOUNDS
    )
    return f"""
    WITH ud AS (
      SELECT user_id % 2 AS variant, CAST(ts AS DATE) AS d,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    daily AS (
      SELECT d, variant, COUNT(*) AS n, SUM(converted) AS conv
      FROM ud GROUP BY d, variant
    ),
    days AS (
      SELECT d, DENSE_RANK() OVER (ORDER BY d) AS r,
             COUNT(*) OVER () AS n_days
      FROM (SELECT DISTINCT d FROM daily)
    ),
    bounds AS ({bounds}),
    cum AS (
      SELECT b.look, b.z_bound,
        MAX(dy.r) AS days_included,
        CAST(SUM(CASE WHEN da.variant = 0 THEN da.n ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN da.variant = 0 THEN da.conv ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN da.variant = 1 THEN da.n ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN da.variant = 1 THEN da.conv ELSE 0 END) AS BIGINT) AS conv_b
      FROM bounds b
      JOIN days dy ON dy.r <= (b.look * dy.n_days + {_OBF_K} - 1) // {_OBF_K}
      JOIN daily da ON da.d = dy.d
      GROUP BY b.look, b.z_bound
    ),
    looks AS (
      SELECT look, z_bound, days_included, n_a, conv_a, n_b, conv_b,
        ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
              / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b)), 6) AS z
      FROM cum
    )
    SELECT look, CAST(days_included AS BIGINT) AS days_included,
           n_a, conv_a, n_b, conv_b, z, z_bound,
           ABS(z) >= z_bound AS crossed,
           CAST(MAX(CASE WHEN ABS(z) >= z_bound THEN 1 ELSE 0 END)
                OVER (ORDER BY look
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INTEGER) = 1 AS stopped
    FROM looks
    """




@register("obrien_fleming_sequential", oracle=_obf_oracle())
def obrien_fleming_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential monitoring of the A/B split
    (K={_OBF_K} equally-spaced calendar looks, two-sided α=0.05): the
    cumulative two-proportion z at each look against the classic OBF
    boundary C·√(K/k) — conservative early (z₁ bound 4.56), nominal at
    the final look — with a STICKY stopped flag from the first
    crossing. Next to ``ab_sprt_stopping_audit`` (fully-sequential
    SPRT) this is the scheduled-interim-analysis discipline most
    experimentation platforms actually run.

    Scale posture: conversions collapse to per-(day, variant) counts
    first (combinable), every subsequent structure is bounded — the
    day list, the {_OBF_K}-row boundary table, the look×day fan — and
    the sticky flag windows over {_OBF_K} rows. Cross-engine
    determinism: boundary values are FROZEN published literals (never
    an engine sqrt of 5/k), the z formula is the shared
    ab_test_proportion_z operand order rounded at 6dp, the look cutoff
    ceil(k·D/K) is exact integer arithmetic, and the crossing compares
    a 6dp-rounded z to a 4dp literal (an exact tie is impossible on
    the 1e-6 grid vs 1e-4 grid unless z needs >4dp — the measured z
    values here are far from the bounds).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    ud = ev.groupBy(
        (F.col("user_id") % 2).alias("variant"), F.to_date("ts").alias("d")
    , F.col("user_id")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    daily = ud.groupBy("d", "variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wd = Window.orderBy("d")
    days = (
        daily.select("d")
        .distinct()
        .select(
            "d",
            F.dense_rank().over(wd).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_days"),
        )
    )
    bounds = ev.sparkSession.createDataFrame(
        [(k, float(b)) for k, b in _OBF_BOUNDS], "look INT, z_bound DOUBLE"
    )
    cutoff = F.expr(f"(look * n_days + {_OBF_K} - 1) div {_OBF_K}")
    cum = (
        F.broadcast(bounds)
        .join(F.broadcast(days), F.col("r") <= cutoff)
        .join(daily, "d")
        .groupBy("look", "z_bound")
        .agg(
            F.max("r").alias("days_included"),
            F.sum(F.when(F.col("variant") == 0, F.col("n")).otherwise(0))
            .cast("bigint").alias("n_a"),
            F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
            .cast("bigint").alias("conv_a"),
            F.sum(F.when(F.col("variant") == 1, F.col("n")).otherwise(0))
            .cast("bigint").alias("n_b"),
            F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
            .cast("bigint").alias("conv_b"),
        )
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = F.round(
        (p_a - p_b)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
        6,
    )
    looks = cum.withColumn("z", z)
    wl = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    return looks.select(
        "look",
        F.col("days_included").cast("bigint").alias("days_included"),
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        "z",
        "z_bound",
        (F.abs(F.col("z")) >= F.col("z_bound")).alias("crossed"),
        (
            F.max(
                F.when(F.abs(F.col("z")) >= F.col("z_bound"), 1).otherwise(0)
            ).over(wl)
            == 1
        ).alias("stopped"),
    )




# ---------------------------------------------------------------------------
# Holt-Winters triple exponential smoothing (additive, weekly season)
# ---------------------------------------------------------------------------

_HW_A, _HW_B, _HW_G = 300000, 100000, 200000  # alpha/beta/gamma in ppm


_HW_M = 7   # season length (weekly)


_HW_H = 7   # forecast horizon


_HW_E6 = 1_000_000




def _hw_tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — BOTH engines' integer
    division semantics (Spark div, DuckDB //); Python's ``//`` floors
    on negatives and would silently diverge on the first negative
    trend."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q




def _hw_oracle() -> str:
    A, B, G, M, H, E6 = _HW_A, _HW_B, _HW_G, _HW_M, _HW_H, _HW_E6
    return f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, rev * {E6} AS ymc FROM daily
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seq),
    init AS (
      SELECT
        (SELECT SUM(ymc) FROM seq WHERE i <= {M}) // {M} AS lvl0,
        ((SELECT SUM(ymc) FROM seq WHERE i > {M} AND i <= {2 * M}) // {M}
         - (SELECT SUM(ymc) FROM seq WHERE i <= {M}) // {M}) // {M} AS tr0,
        (SELECT LIST(ymc - (SELECT SUM(ymc) FROM seq WHERE i <= {M}) // {M}
                     ORDER BY i) FROM seq WHERE i <= {M}) AS s0
    ),
    hw AS (
      SELECT CAST({M} AS BIGINT) AS t, lvl0 AS lvl, tr0 AS tr, s0 AS s,
             CAST(0 AS HUGEINT) AS abs_err
      FROM init
      UNION ALL
      SELECT hw.t + 1,
        (({A} * (q.ymc - hw.s[1]) + {E6 - A} * (hw.lvl + hw.tr)) // {E6}),
        ({B} * ((({A} * (q.ymc - hw.s[1]) + {E6 - A} * (hw.lvl + hw.tr))
                 // {E6}) - hw.lvl) + {E6 - B} * hw.tr) // {E6},
        list_append(hw.s[2:],
          ({G} * (q.ymc - (({A} * (q.ymc - hw.s[1])
                            + {E6 - A} * (hw.lvl + hw.tr)) // {E6}))
           + {E6 - G} * hw.s[1]) // {E6}),
        hw.abs_err + ABS(q.ymc - (hw.lvl + hw.tr + hw.s[1]))
      FROM hw JOIN seq q ON q.i = hw.t + 1
    ),
    fin AS (SELECT * FROM hw ORDER BY t DESC LIMIT 1)
    SELECT CAST(h.h AS BIGINT) AS horizon,
           CAST((fin.lvl + h.h * fin.tr
                 + fin.s[CAST((h.h - 1) % {M} + 1 AS INTEGER)]) // {E6}
                AS BIGINT) AS forecast_cents,
           CAST((fin.abs_err // (nn.n - {M})) // {E6} AS BIGINT)
             AS insample_mae_cents
    FROM fin CROSS JOIN nn
    CROSS JOIN (SELECT UNNEST(RANGE(1, {H + 1})) AS h) h
    """




@register("holt_winters_forecast", oracle=_hw_oracle())
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple exponential smoothing over daily
    revenue (level + trend + weekly seasonal, α=0.3 β=0.1 γ=0.2):
    {_HW_H}-day-ahead forecasts plus the in-sample one-step MAE — the
    production forecasting baseline one notch above
    ``ses_forecast_daily`` (level-only). Seasonal-naive init: level =
    week-1 mean, trend = (week-2 mean − week-1 mean)/{_HW_M}, seasonal
    = week-1 deviations.

    Scale posture: the 100 TB part — daily revenue aggregation — is a
    distributed combinable groupBy; the smoothing recursion is
    INHERENTLY sequential (state t needs state t−1), so it runs as a
    bounded driver solve over the collected daily series — bounded by
    the CALENDAR, not the corpus (the Markov-chain ≤36-cell collect
    precedent, stats.py markov_attribution_removal). Cross-engine
    determinism: the whole recursion is integer micro-cent arithmetic
    with ppm smoothing weights and truncate-toward-zero division
    (Python's ``//`` FLOORS on negatives — ``_hw_tdiv`` matches both
    engines' truncation; verified exactly over 2392 iterations with
    negative trends) — the oracle replays the identical recursion as a
    DuckDB recursive CTE carrying the {_HW_M}-slot seasonal list.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    A, B, G, M, H, E6 = _HW_A, _HW_B, _HW_G, _HW_M, _HW_H, _HW_E6
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
        .orderBy("d")
    )
    # bounded driver collect: one row per calendar day
    y = [r["rev"] for r in daily.collect()]
    n = len(y)
    ymc = [v * E6 for v in y]
    lvl = _hw_tdiv(sum(ymc[:M]), M)
    tr = _hw_tdiv(_hw_tdiv(sum(ymc[M : 2 * M]), M) - lvl, M)
    s = [ymc[j] - lvl for j in range(M)]
    abs_err = 0
    for t in range(M, n):
        s_old, prev_lvl = s[0], lvl
        abs_err += abs(ymc[t] - (prev_lvl + tr + s_old))
        lvl = _hw_tdiv(A * (ymc[t] - s_old) + (E6 - A) * (prev_lvl + tr), E6)
        tr = _hw_tdiv(B * (lvl - prev_lvl) + (E6 - B) * tr, E6)
        s = s[1:] + [_hw_tdiv(G * (ymc[t] - lvl) + (E6 - G) * s_old, E6)]
    mae = _hw_tdiv(_hw_tdiv(abs_err, n - M), E6)
    rows = [
        (h, _hw_tdiv(lvl + h * tr + s[(h - 1) % M], E6), mae)
        for h in range(1, H + 1)
    ]
    return spark.createDataFrame(
        rows, "horizon BIGINT, forecast_cents BIGINT, insample_mae_cents BIGINT"
    )




# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval for group means
# ---------------------------------------------------------------------------

_PB_B = 32  # bootstrap replicates


_PB_HEX = 4  # md5 hex chars -> deterministic uniform in [0, 65536)




def _pb_thresholds() -> list[int]:
    """Cumulative Poisson(1) thresholds scaled to 65536, frozen at
    module import by the ONE Python process that renders both engine
    texts — the per-rank-constant rule (never an engine's exp)."""
    import math as m

    acc, out, fact = 0.0, [], 1
    for k in range(8):
        if k > 0:
            fact *= k
        acc += m.exp(-1.0) / fact
        out.append(int(acc * 65536))
    return out




_PB_T = _pb_thresholds()




def _pb_w_case(u: str) -> str:
    """Poisson(1) weight from a uniform in [0, 65536) — identical
    generated CASE text for both engines."""
    whens = " ".join(f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_PB_T))
    return f"(CASE {whens} ELSE {len(_PB_T)} END)"




def _pb_hexwalk_sql() -> str:
    """STRPOS walk over a 4-hex WINDOW of the pre-hoisted md5 column
    ``h``: one md5 per (row, replicate-GROUP) yields eight uniforms
    (window w covers hex chars w*4+1 .. w*4+4) — an 8x md5 saving over
    hashing every (row, replicate) pair."""
    expr = "0"
    for i in range(1, _PB_HEX + 1):
        expr = (
            f"({expr} * 16 + STRPOS('0123456789abcdef',"
            f" SUBSTR(h, w * 4 + {i}, 1)) - 1)"
        )
    return expr




# Spark twin of the window walk: conv() over the same 4-hex slice.
_PB_SPARK_U = (
    f"CAST(conv(substring(h, w * 4 + 1, {_PB_HEX}), 16, 10) AS BIGINT)"
)




@register(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    wg AS (
      SELECT priority, cents, g,
             MD5('pb' || CAST(g AS VARCHAR) || '|'
                 || CAST(o_orderkey AS VARCHAR)) AS h
      FROM base CROSS JOIN (SELECT UNNEST(RANGE(0, {_PB_B // 8})) AS g)
    ),
    wu AS (
      SELECT priority, cents, g * 8 + w AS b, h, w
      FROM wg CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS w)
    ),
    rep AS (
      SELECT priority, b,
             CAST(SUM({_pb_w_case(f'({_pb_hexwalk_sql()})')} * cents)
                  AS HUGEINT) AS swx,
             CAST(SUM({_pb_w_case(f'({_pb_hexwalk_sql()})')}) AS BIGINT)
               AS sw
      FROM wu
      GROUP BY priority, b
    ),
    means AS (
      SELECT priority, b,
             CAST(swx * 1000000 // sw AS BIGINT) AS mean_micro
      FROM rep WHERE sw > 0
    ),
    ranked AS (
      SELECT priority, b, mean_micro,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY mean_micro, b) AS rn_lo,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY mean_micro DESC, b DESC) AS rn_hi,
             COUNT(*) OVER (PARTITION BY priority) AS n_reps
      FROM means
    ),
    point AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(cents) AS HUGEINT) * 1000000 // COUNT(*)
                  AS BIGINT) AS mean_micro
      FROM base GROUP BY priority
    )
    SELECT p.priority, p.n_orders, p.mean_micro,
           CAST(MIN(CASE WHEN r.rn_lo = 2 THEN r.mean_micro END)
                AS BIGINT) AS ci_lo_micro,
           CAST(MIN(CASE WHEN r.rn_hi = 2 THEN r.mean_micro END)
                AS BIGINT) AS ci_hi_micro,
           CAST(MIN(r.n_reps) AS BIGINT) AS n_replicates
    FROM point p JOIN ranked r ON r.priority = p.priority
    GROUP BY p.priority, p.n_orders, p.mean_micro
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap CI for the mean order value per priority
    via the POISSON bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", Google 2012): instead of resampling n
    rows with replacement (impossible without global coordination),
    each row enters replicate b with weight ~ Poisson(1) drawn from a
    deterministic per-(row, replicate) hash — one map-side pass
    produces all {_PB_B} replicate means, and the rank-2 / rank-31
    replicate means bound a ~90% CI. THE way to put error bars on
    100 TB aggregates: no second pass, no driver state, reproducible
    from the hash seed.

    Scale posture: a {_PB_B}× row explode feeding ONE partial
    aggregation (map-side combine collapses to groups × replicates
    before the shuffle); the window runs over ≤ groups×{_PB_B} rows;
    the point-estimate join is group-count-sized. Cross-engine
    determinism: Poisson weights from frozen integer thresholds over a
    4-hex md5 walk (per-rank-constant rule — never an engine's exp or
    random()); replicate means are exact HUGEINT/DECIMAL(38)
    micro-unit floor divisions; rank selection is pinned with (mean, b)
    tiebreaks; every aggregate casts to BIGINT (dtype-kind rule).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # one md5 per (row, replicate-GROUP): each hash feeds 8 replicates
    # via disjoint 4-hex windows; the uniform is hoisted so the weight
    # CASE never re-evaluates it
    w = _pb_w_case("u")
    rep = (
        base.withColumn(
            "g", F.explode(F.expr(f"sequence(0, {_PB_B // 8 - 1})"))
        )
        .withColumn(
            "h",
            F.expr(
                "md5(concat('pb', CAST(g AS STRING), '|',"
                " CAST(o_orderkey AS STRING)))"
            ),
        )
        .withColumn("w", F.explode(F.expr("sequence(0, 7)")))
        .withColumn("b", F.expr("g * 8 + w"))
        .withColumn("u", F.expr(_PB_SPARK_U))
        .withColumn("pw", F.expr(w))
        .groupBy("priority", "b")
        .agg(
            F.expr(
                "CAST(SUM(CAST(pw AS DECIMAL(38,0)) * cents)"
                " AS DECIMAL(38,0))"
            ).alias("swx"),
            F.expr("CAST(SUM(pw) AS BIGINT)").alias("sw"),
        )
    )
    means = rep.where(F.col("sw") > 0).select(
        "priority",
        "b",
        F.expr("CAST(swx * 1000000 div sw AS BIGINT)").alias("mean_micro"),
    )
    ranked = means.select(
        "priority",
        "b",
        F.col("mean_micro").alias("rep_mean_micro"),
        F.row_number()
        .over(Window.partitionBy("priority").orderBy("mean_micro", "b"))
        .alias("rn_lo"),
        F.row_number()
        .over(
            Window.partitionBy("priority").orderBy(
                F.col("mean_micro").desc(), F.col("b").desc()
            )
        )
        .alias("rn_hi"),
        F.count(F.lit(1))
        .over(Window.partitionBy("priority"))
        .alias("n_reps"),
    )
    point = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr(
            "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("mean_micro"),
    )
    return (
        point.join(F.broadcast(ranked), "priority")
        .groupBy("priority", "n_orders", "mean_micro")
        .agg(
            F.min(F.when(F.col("rn_lo") == 2, F.col("rep_mean_micro")))
            .cast("bigint")
            .alias("ci_lo_micro"),
            F.min(F.when(F.col("rn_hi") == 2, F.col("rep_mean_micro")))
            .cast("bigint")
            .alias("ci_hi_micro"),
            F.min("n_reps").cast("bigint").alias("n_replicates"),
        )
    )


