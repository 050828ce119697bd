"""stats subject module (r14 additions — binary/categorical
association, scale tests, agreement, collinearity); see the package
__init__ for the family docstring and determinism rules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_streamloader_spark.operators.registry import register
import rs_streamloader_spark.operators.stats as _S

_D38 = "DECIMAL(38,0)"


# ---------------------------------------------------------------------------
# phi / Yule's Q — 2x2 binary association
# ---------------------------------------------------------------------------


@register(
    "phi_yule_binary_association",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS x,
             CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    t AS (
      SELECT CAST(SUM(CASE WHEN x = 1 AND y = 1 THEN n END) AS HUGEINT) AS n11,
             CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN n END) AS HUGEINT) AS n10,
             CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN n END) AS HUGEINT) AS n01,
             CAST(SUM(CASE WHEN x = 0 AND y = 0 THEN n END) AS HUGEINT) AS n00
      FROM c
    )
    SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           ROUND(CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                 / SQRT(CAST((n11 + n10) * (n01 + n00)
                             * (n11 + n01) * (n10 + n00) AS DOUBLE)), 6)
             AS phi,
           ROUND(CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                 / CAST(n11 * n00 + n10 * n01 AS DOUBLE), 6) AS yule_q
    FROM t
    """,
)
def phi_yule_binary_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phi coefficient and Yule's Q over the 2x2 contingency of two
    binary lineitem facts — returned (l_returnflag = 'R', marginal
    ~33%) x deep-discounted (l_discount >= 0.05, marginal ~55%), so
    all four cells are live on real data. Phi is the Pearson
    correlation of the two indicators (chi2 = n*phi2); Yule's Q is
    the odds-ratio transform (OR-1)/(OR+1) — the margin-insensitive
    companion. Both derive from the SAME exact HUGEINT cell counts in
    one fixed double expression.

    Scale posture: ONE combinable 4-cell aggregate — map-side
    combine collapses any corpus to 4 rows before the single
    exchange; the coefficients are a 1-row reduction.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "lineitem")["lineitem"]
    cells = t.groupBy(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("x"),
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    agg = cells.agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN x = {xv} AND y = {yv} THEN n END)"
                f" AS {_D38})"
            ).alias(f"n{xv}{yv}")
            for xv in (1, 0)
            for yv in (1, 0)
        ]
    )
    return agg.select(
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.expr(
            "ROUND(CAST(n11 * n00 - n10 * n01 AS DOUBLE)"
            " / SQRT(CAST((n11 + n10) * (n01 + n00)"
            " * (n11 + n01) * (n10 + n00) AS DOUBLE)), 6)"
        ).alias("phi"),
        F.expr(
            "ROUND(CAST(n11 * n00 - n10 * n01 AS DOUBLE)"
            " / CAST(n11 * n00 + n10 * n01 AS DOUBLE), 6)"
        ).alias("yule_q"),
    )


# ---------------------------------------------------------------------------
# relative risk (cohort) with log CI
# ---------------------------------------------------------------------------

# user-level splits sit BETWEEN the per-user p50 (13) and p75 (15-16)
# of the error / purchase counts, so all four cohort cells are live on
# real data (measured at sf0.01 and sf0.1; the "has any event" split
# is degenerate — every user has every type)
_RR_ERR_MIN = 14
_RR_PUR_MIN = 14


@register(
    "relative_risk_cohort",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  >= {_RR_ERR_MIN} THEN 1 ELSE 0 END AS e,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  >= {_RR_PUR_MIN} THEN 1 ELSE 0 END AS o
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(e * o) AS BIGINT) AS a,
             CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
             CAST(SUM((1 - e) * o) AS BIGINT) AS c,
             CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS d
      FROM u
    )
    SELECT a, b, c, d,
           ROUND((CAST(a AS DOUBLE) / (a + b))
                 / (CAST(c AS DOUBLE) / (c + d)), 6) AS rr,
           ROUND(EXP(LN((CAST(a AS DOUBLE) / (a + b))
                        / (CAST(c AS DOUBLE) / (c + d)))
                     - 1.96 * SQRT(1.0 / a - 1.0 / (a + b)
                                   + 1.0 / c - 1.0 / (c + d))), 6) AS rr_lo,
           ROUND(EXP(LN((CAST(a AS DOUBLE) / (a + b))
                        / (CAST(c AS DOUBLE) / (c + d)))
                     + 1.96 * SQRT(1.0 / a - 1.0 / (a + b)
                                   + 1.0 / c - 1.0 / (c + d))), 6) AS rr_hi
    FROM t WHERE a > 0 AND c > 0
    """,
)
def relative_risk_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative risk of the error-prone cohort: do users with >=
    {_RR_ERR_MIN} error events "convert" to heavy purchasers (>=
    {_RR_PUR_MIN} purchases) at a different RATE than the rest — the
    epidemiological cohort effect size (risk ratio, not odds ratio:
    directly interpretable as "x times as likely") with the standard
    Katz log-normal 95% CI exp(ln RR ± 1.96·sqrt(1/a − 1/(a+b) + 1/c
    − 1/(c+d))). A CI excluding 1 is the verdict.

    Scale posture: one user-keyed combinable aggregate (the cohort
    assignment), one 4-cell reduction; ln/exp/sqrt appear only in the
    final 1-row expression with identical operand order in both
    engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            >= _RR_ERR_MIN,
            1,
        )
        .otherwise(0)
        .alias("e"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= _RR_PUR_MIN,
            1,
        )
        .otherwise(0)
        .alias("o"),
    )
    t = u.agg(
        F.sum(F.expr("e * o")).cast("bigint").alias("a"),
        F.sum(F.expr("e * (1 - o)")).cast("bigint").alias("b"),
        F.sum(F.expr("(1 - e) * o")).cast("bigint").alias("c"),
        F.sum(F.expr("(1 - e) * (1 - o)")).cast("bigint").alias("d"),
    )
    rr = (
        "(CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d))"
    )
    se = (
        "SQRT(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + d))"
    )
    return t.where("a > 0 AND c > 0").select(
        "a",
        "b",
        "c",
        "d",
        F.expr(f"ROUND({rr}, 6)").alias("rr"),
        F.expr(f"ROUND(EXP(LN({rr}) - 1.96 * {se}), 6)").alias("rr_lo"),
        F.expr(f"ROUND(EXP(LN({rr}) + 1.96 * {se}), 6)").alias("rr_hi"),
    )


# ---------------------------------------------------------------------------
# Ansari-Bradley scale test (click vs view value dispersion)
# ---------------------------------------------------------------------------


@register(
    "ansari_bradley_scale_test",
    oracle="""
    WITH h AS (
      SELECT CAST(ROUND("value" * 100) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events WHERE event_type IN ('click', 'view')
        AND "value" IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT v, ca, cb, ca + cb AS ct,
             SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               - (ca + cb) AS lo0,
             SUM(ca + cb) OVER () AS nn
      FROM h
    ),
    blocks AS (
      -- exact averaged Ansari scores per tied block [lo0+1 .. lo0+ct]:
      -- S(x) = sum_{i<=x} min(i, N+1-i) has the closed form below
      -- (scores rise to the centre then fall), so the block sum is
      -- S(hi) - S(lo) — all integer arithmetic
      SELECT ca, cb, ct, nn,
             (CASE WHEN lo0 + ct <= (nn + 1) // 2
                   THEN (lo0 + ct) * (lo0 + ct + 1) // 2
                   ELSE ((nn + 1) // 2) * ((nn + 1) // 2 + 1) // 2
                        + (lo0 + ct - (nn + 1) // 2) * (nn + 1)
                        - ((lo0 + ct) * (lo0 + ct + 1) // 2
                           - ((nn + 1) // 2) * ((nn + 1) // 2 + 1) // 2)
              END
              -
              CASE WHEN lo0 <= (nn + 1) // 2
                   THEN lo0 * (lo0 + 1) // 2
                   ELSE ((nn + 1) // 2) * ((nn + 1) // 2 + 1) // 2
                        + (lo0 - (nn + 1) // 2) * (nn + 1)
                        - (lo0 * (lo0 + 1) // 2
                           - ((nn + 1) // 2) * ((nn + 1) // 2 + 1) // 2)
              END) AS bsum
      FROM cum
    ),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n1,
             CAST(SUM(cb) AS BIGINT) AS n2,
             MIN(nn) AS nn,
             SUM(CAST(ca AS DOUBLE) * bsum / ct) AS t1,
             SUM(CAST(ct AS DOUBLE) * (CAST(bsum AS DOUBLE) / ct)
                 * (CAST(bsum AS DOUBLE) / ct)) AS ss2,
             SUM(CAST(bsum AS DOUBLE)) AS stot
      FROM blocks
    )
    SELECT n1, n2,
           ROUND(t1, 6) AS ab_t,
           ROUND((t1 - n1 * stot / nn)
                 / SQRT(CAST(n1 AS DOUBLE) * n2
                        * (nn * ss2 - stot * stot)
                        / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6)
             AS z_approx
    FROM agg
    """,
)
def ansari_bradley_scale_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley rank test for a SCALE (dispersion) difference
    between the click and view value distributions — the spread
    companion to ``mann_whitney_u`` (location) and
    ``ks_test_click_view_value`` (shape): scores rise toward the
    pooled median and fall symmetrically (min(rank, N+1−rank)), so a
    sample concentrated at the extremes scores LOW. Ties get exact
    averaged-score handling: per tied block the score sum has a
    closed integer form (the prefix S(x) = Σ min(i, N+1−i) is
    quadratic on each side of the centre), and the tie-robust normal
    approximation z = (T − n1·S̄)/sqrt(n1 n2 (N Σa² − (Σa)²)/(N²(N−1)))
    uses the realized score moments — no lookup tables, no untied
    shortcut formulas.

    Scale posture: the value histogram (bounded distinct cents) is
    one combinable aggregate; the prefix sum is a window over
    histogram rows; everything after is a 1-row reduction. The one
    double division (bsum/ct, the averaged block score) happens on
    bounded-histogram rows with a fixed expression and the final
    stats round at 6dp.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    h = (
        ev.where(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
        )
        .groupBy(
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v")
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("cb"),
        )
    )
    from pyspark.sql.window import Window

    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("ct"),
        (F.sum(F.col("ca") + F.col("cb")).over(wcum) - (F.col("ca") + F.col("cb"))).alias("lo0"),
        F.sum(F.col("ca") + F.col("cb")).over(
            Window.partitionBy()
        ).alias("nn"),
    )

    def _prefix(x: str) -> str:
        # S(x) = sum_{i<=x} min(i, N+1-i), h = floor((N+1)/2)
        return (
            f"(CASE WHEN {x} <= (nn + 1) div 2"
            f" THEN {x} * ({x} + 1) div 2"
            f" ELSE ((nn + 1) div 2) * ((nn + 1) div 2 + 1) div 2"
            f" + ({x} - (nn + 1) div 2) * (nn + 1)"
            f" - ({x} * ({x} + 1) div 2"
            f" - ((nn + 1) div 2) * ((nn + 1) div 2 + 1) div 2)"
            f" END)"
        )

    blocks = cum.select(
        "ca",
        "cb",
        "ct",
        "nn",
        F.expr(f"{_prefix('(lo0 + ct)')} - {_prefix('lo0')}").alias("bsum"),
    )
    agg = blocks.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.min("nn").alias("nn"),
        F.sum(F.expr("CAST(ca AS DOUBLE) * bsum / ct")).alias("t1"),
        F.sum(
            F.expr(
                "CAST(ct AS DOUBLE) * (CAST(bsum AS DOUBLE) / ct)"
                " * (CAST(bsum AS DOUBLE) / ct)"
            )
        ).alias("ss2"),
        F.sum(F.expr("CAST(bsum AS DOUBLE)")).alias("stot"),
    )
    return agg.select(
        "n1",
        "n2",
        F.expr("ROUND(t1, 6)").alias("ab_t"),
        F.expr(
            "ROUND((t1 - n1 * stot / nn)"
            " / SQRT(CAST(n1 AS DOUBLE) * n2"
            " * (nn * ss2 - stot * stot)"
            " / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6)"
        ).alias("z_approx"),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal, 3 deterministic "raters")
# ---------------------------------------------------------------------------

# rater thresholds sit INSIDE the measured metric distributions at
# sf0.01/sf0.1 (vacuity rule): n_chars p25/p50/p75 = 176/300/419;
# vowels-per-1000-chars = 278/285/293; spaces-per-1000 = 174/178/182
# — each split lands near its median, so raters genuinely disagree
_KR_CHARS_MIN = 300
_KR_VOWEL_PPK_MIN = 285
_KR_SPACE_PPK_MIN = 178


@register(
    "krippendorff_alpha_nominal",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             (CASE WHEN LENGTH(text) >= {_KR_CHARS_MIN} THEN 1 ELSE 0 END
              + CASE WHEN 1000 * LENGTH(REGEXP_REPLACE(LOWER(text),
                       '[^aeiou]', '', 'g')) // LENGTH(text)
                       >= {_KR_VOWEL_PPK_MIN} THEN 1 ELSE 0 END
              + CASE WHEN 1000 * (LENGTH(text) - LENGTH(REGEXP_REPLACE(
                       text, ' ', '', 'g'))) // LENGTH(text)
                       >= {_KR_SPACE_PPK_MIN} THEN 1 ELSE 0 END) AS n1
      FROM documents WHERE LENGTH(text) > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(n1) AS BIGINT) AS tot1,
             CAST(SUM(2 * n1 * (3 - n1)) AS BIGINT) AS dis
      FROM r
    )
    SELECT n_units, tot1,
           ROUND(CAST(dis AS DOUBLE) / (n_units * 3 * 2), 6) AS d_o,
           ROUND(2.0 * tot1 * (3 * n_units - tot1)
                 / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)), 6)
             AS d_e,
           ROUND(1 - (CAST(dis AS DOUBLE) / (n_units * 3 * 2))
                     / (2.0 * tot1 * (3 * n_units - tot1)
                        / (CAST(3 * n_units AS DOUBLE)
                           * (3 * n_units - 1))), 6) AS alpha
    FROM agg
    """,
)
def krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary) over three deterministic
    heuristic "raters" per document — length, vowel density, and
    word-boundary density screens, each thresholded at its corpus
    median — the reliability coefficient annotation pipelines report
    when raters are heuristics rather than humans (alpha ~ 0 means
    the screens agree no better than chance, so a voting ensemble of
    them adds nothing). D_o is the observed within-unit disagreement
    Σ_c n_uc(m − n_uc)/(N·m·(m−1)) — for binary categories the cell
    sum is 2·n_u1·n_u0 (BOTH categories' terms; the numpy pairwise
    pin caught a draft that summed only the c=1 term, an
    oracle-invisible factor-2 slip); D_e the chance disagreement
    2·n_1(n − n_1)/(n(n−1)) over the pooled n = 3N values; alpha =
    1 − D_o/D_e. Every mass is an exact integer; the three ratios are
    fixed final expressions.

    Scale posture: one map-only pass computes all three raters per
    doc (regexp counts, no explode), then a single 3-integer
    combinable reduction.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    docs = _S._t(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    n1 = (
        F.when(F.length("text") >= _KR_CHARS_MIN, 1).otherwise(0)
        + F.when(
            1000
            * F.length(F.regexp_replace(F.lower("text"), "[^aeiou]", ""))
            / F.length("text")
            >= _KR_VOWEL_PPK_MIN,
            1,
        ).otherwise(0)
        + F.when(
            1000
            * (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            )
            / F.length("text")
            >= _KR_SPACE_PPK_MIN,
            1,
        ).otherwise(0)
    )
    agg = docs.select(n1.alias("n1")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("n1").cast("bigint").alias("tot1"),
        F.sum(F.expr("2 * n1 * (3 - n1)")).cast("bigint").alias("dis"),
    )
    return agg.select(
        "n_units",
        "tot1",
        F.expr(
            "ROUND(CAST(dis AS DOUBLE) / (n_units * 3 * 2), 6)"
        ).alias("d_o"),
        F.expr(
            "ROUND(2.0 * tot1 * (3 * n_units - tot1)"
            " / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)), 6)"
        ).alias("d_e"),
        F.expr(
            "ROUND(1 - (CAST(dis AS DOUBLE) / (n_units * 3 * 2))"
            " / (2.0 * tot1 * (3 * n_units - tot1)"
            " / (CAST(3 * n_units AS DOUBLE)"
            " * (3 * n_units - 1))), 6)"
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# VIF collinearity audit (3-predictor closed form)
# ---------------------------------------------------------------------------


def _vif_oracle() -> str:
    corr = {
        (a, b): (
            f"(CAST(n AS DOUBLE) * s_{a}{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
            f" / SQRT((CAST(n AS DOUBLE) * s_{a}{a}"
            f" - CAST(s_{a} AS DOUBLE) * s_{a})"
            f" * (CAST(n AS DOUBLE) * s_{b}{b}"
            f" - CAST(s_{b} AS DOUBLE) * s_{b}))"
        )
        for a, b in [("q", "d"), ("q", "t"), ("d", "t")]
    }
    r12, r13, r23 = corr[("q", "d")], corr[("q", "t")], corr[("d", "t")]

    def r2(ra: str, rb: str, rc: str) -> str:
        # R^2 of one predictor on the other two from pairwise corrs:
        # R^2 = (ra^2 + rb^2 - 2 ra rb rc) / (1 - rc^2)
        return (
            f"(({ra}) * ({ra}) + ({rb}) * ({rb})"
            f" - 2 * ({ra}) * ({rb}) * ({rc}))"
            f" / (1 - ({rc}) * ({rc}))"
        )

    rows = [
        ("quantity", r2(r12, r13, r23)),
        ("discount", r2(r12, r23, r13)),
        ("tax", r2(r13, r23, r12)),
    ]
    selects = "\n      UNION ALL\n".join(
        f"      SELECT '{name}' AS predictor,"
        f" ROUND({expr}, 6) AS r_squared,"
        f" ROUND(1 / (1 - ({expr})), 6) AS vif FROM m"
        for name, expr in rows
    )
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS s_q,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s_d,
             CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) AS HUGEINT) AS s_t,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS s_qq,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s_dd,
             CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)
                      * CAST(ROUND(l_tax * 100) AS BIGINT)) AS HUGEINT) AS s_tt,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s_qd,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(l_tax * 100) AS BIGINT)) AS HUGEINT) AS s_qt,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l_tax * 100) AS BIGINT)) AS HUGEINT) AS s_dt
      FROM lineitem
    )
{selects}
    """


@register("vif_collinearity_audit", oracle=_vif_oracle())
def vif_collinearity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation-factor screen over the three lineitem
    numeric predictors (quantity, discount, tax) — the standard
    pre-regression collinearity audit: VIF_i = 1/(1 − R²_i) where
    R²_i regresses predictor i on the other two; with three
    predictors R² has the closed pairwise-correlation form
    (r_ab² + r_ac² − 2 r_ab r_ac r_bc)/(1 − r_bc²), so the whole
    audit reduces to the 9 exact integer moment sums (values held as
    integer units/cents, products in HUGEINT/DECIMAL(38)) and three
    fixed double expressions. VIF > 5-10 is the classic drop/combine
    signal.

    Scale posture: ONE combinable moment aggregate over the fact
    table (9 integer sums — the map-side-combine shape), then a
    3-row constant fan-out; no second scan, no join.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "lineitem")["lineitem"]
    q = "CAST(ROUND(l_quantity) AS BIGINT)"
    d = "CAST(ROUND(l_discount * 100) AS BIGINT)"
    x = "CAST(ROUND(l_tax * 100) AS BIGINT)"
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM({q}) AS {_D38})").alias("s_q"),
        F.expr(f"CAST(SUM({d}) AS {_D38})").alias("s_d"),
        F.expr(f"CAST(SUM({x}) AS {_D38})").alias("s_t"),
        F.expr(f"CAST(SUM({q} * {q}) AS {_D38})").alias("s_qq"),
        F.expr(f"CAST(SUM({d} * {d}) AS {_D38})").alias("s_dd"),
        F.expr(f"CAST(SUM({x} * {x}) AS {_D38})").alias("s_tt"),
        F.expr(f"CAST(SUM({q} * {d}) AS {_D38})").alias("s_qd"),
        F.expr(f"CAST(SUM({q} * {x}) AS {_D38})").alias("s_qt"),
        F.expr(f"CAST(SUM({d} * {x}) AS {_D38})").alias("s_dt"),
    )

    def corr(a: str, b: str) -> str:
        return (
            f"(CAST(n AS DOUBLE) * s_{a}{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
            f" / SQRT((CAST(n AS DOUBLE) * s_{a}{a}"
            f" - CAST(s_{a} AS DOUBLE) * s_{a})"
            f" * (CAST(n AS DOUBLE) * s_{b}{b}"
            f" - CAST(s_{b} AS DOUBLE) * s_{b}))"
        )

    r12, r13, r23 = corr("q", "d"), corr("q", "t"), corr("d", "t")

    def r2(ra: str, rb: str, rc: str) -> str:
        return (
            f"(({ra}) * ({ra}) + ({rb}) * ({rb})"
            f" - 2 * ({ra}) * ({rb}) * ({rc}))"
            f" / (1 - ({rc}) * ({rc}))"
        )

    rows = [
        ("quantity", r2(r12, r13, r23)),
        ("discount", r2(r12, r23, r13)),
        ("tax", r2(r13, r23, r12)),
    ]
    out = None
    for name, expr in rows:
        sel = m.select(
            F.lit(name).alias("predictor"),
            F.expr(f"ROUND({expr}, 6)").alias("r_squared"),
            F.expr(f"ROUND(1 / (1 - ({expr})), 6)").alias("vif"),
        )
        out = sel if out is None else out.unionByName(sel)
    return out


# ---------------------------------------------------------------------------
# t-closeness — the third leg of the privacy-audit trio
# ---------------------------------------------------------------------------

# threshold sits INSIDE the measured per-class TV distribution at BOTH
# test scales (sf0.01 range 0.165-0.667, sf0.1 range 0.064-0.200), so
# the close and not-close branches are live on real data at either
_TCLOSE_T_PPM = 180_000  # t = 0.18 as integer ppm


@register(
    "t_closeness_audit",
    oracle=f"""
    WITH cb AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3
    ),
    cls AS (SELECT nk, seg, SUM(c) AS sz FROM cb GROUP BY 1, 2),
    g AS (SELECT v, SUM(c) AS gc FROM cb GROUP BY v),
    n AS (SELECT SUM(c) AS nn FROM cb)
    SELECT cb.nk AS c_nationkey, cb.seg AS c_mktsegment,
           CAST(MIN(cls.sz) AS BIGINT) AS class_size,
           ROUND((SUM(ABS(cb.c * n.nn - g.gc * cls.sz) - g.gc * cls.sz)
                  + MIN(cls.sz) * MIN(n.nn))
                 / (2.0 * MIN(cls.sz) * MIN(n.nn)), 6) AS t_tv,
           (SUM(ABS(cb.c * n.nn - g.gc * cls.sz) - g.gc * cls.sz)
            + MIN(cls.sz) * MIN(n.nn)) * 1000000
             > {2 * _TCLOSE_T_PPM} * MIN(cls.sz) * MIN(n.nn) AS above_t
    FROM cb
    JOIN g USING (v)
    JOIN cls ON cls.nk = cb.nk AND cls.seg = cb.seg
    CROSS JOIN n
    GROUP BY cb.nk, cb.seg
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the third leg of the release-privacy trio next to
    ``k_anonymity_audit``'s k and l (same quasi-identifiers: nation x
    market segment; same sensitive attribute: $1k balance bands): per
    equivalence class, the total-variation distance ½Σ|p_class −
    p_global| between the class's sensitive-value distribution and
    the corpus-wide one. k and l bound RE-IDENTIFICATION; t bounds
    ATTRIBUTE disclosure — a class can be large and diverse yet still
    leak ("this class skews rich") if its distribution sits far from
    global, which is exactly what TV measures. Classes with
    t > {{t}} (threshold inside the measured TV range at both test
    scales) are flagged.

    Exactness: TV needs only the bands PRESENT in the class —
    Σ_all |…| = Σ_present(|c_v·N − g_v·sz| − g_v·sz) + sz·N, so no
    densifying join; every mass is an exact integer cross-product and
    the flag is an exact integer ppm inequality; the one double is
    the final rounded ratio.

    Scale posture: one (QI, band) combinable aggregate, the global
    band marginal broadcast back onto it, a bounded ≤|QI| output.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "customer")["customer"]
    cb = t.groupBy(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cls = cb.groupBy("nk", "seg").agg(F.sum("c").alias("sz"))
    g = cb.groupBy("v").agg(F.sum("c").alias("gc"))
    n = cb.agg(F.sum("c").alias("nn"))
    joined = (
        cb.join(F.broadcast(g), "v")
        .join(F.broadcast(cls), ["nk", "seg"])
        .crossJoin(F.broadcast(n))
    )
    agg = joined.groupBy("nk", "seg").agg(
        F.min("sz").alias("sz"),
        F.min("nn").alias("nn"),
        F.sum(
            F.expr("ABS(c * nn - gc * sz) - gc * sz")
        ).alias("dev"),
    )
    return agg.select(
        F.col("nk").alias("c_nationkey"),
        F.col("seg").alias("c_mktsegment"),
        F.col("sz").cast("bigint").alias("class_size"),
        F.expr(
            "ROUND(CAST(dev + sz * nn AS DOUBLE)"
            " / (2e0 * sz * nn), 6)"
        ).alias("t_tv"),
        F.expr(
            f"(dev + sz * nn) * 1000000 > {2 * _TCLOSE_T_PPM} * sz * nn"
        ).alias("above_t"),
    )


t_closeness_audit.__doc__ = t_closeness_audit.__doc__.format(
    t=_TCLOSE_T_PPM / 1_000_000
)


# ---------------------------------------------------------------------------
# dp_histogram_release — Laplace-noised count release (completes the
# k-anonymity / l-diversity / t-closeness privacy battery with the
# DP release mechanism itself)
# ---------------------------------------------------------------------------


def _dp_hexwalk_sql(n_hex: int = 4) -> str:
    """STRPOS walk over the first hex chars of the seeded source key —
    same-constant twin of the Spark conv() (weighted_sample_gumbel's
    cross-engine uniform idiom, seeded 'dp|')."""
    expr = "0"
    for i in range(1, n_hex + 1):
        expr = (
            f"({expr} * 16 + STRPOS('0123456789abcdef',"
            f" SUBSTR(MD5('dp|' || source), {i}, 1)) - 1)"
        )
    return expr


@register(
    "dp_histogram_release",
    oracle=f"""
    WITH h AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    u AS (
      SELECT source, n_docs,
             CAST({_dp_hexwalk_sql()} + 1 AS DOUBLE) / 65537.0 AS uni
      FROM h
    )
    SELECT source, n_docs,
           CAST(ROUND(
             -SIGN(uni - 0.5) * LN(1.0 - 2.0 * ABS(uni - 0.5))
             * 1000000000) AS BIGINT) AS noise_nano,
           n_docs * 1000000000 + CAST(ROUND(
             -SIGN(uni - 0.5) * LN(1.0 - 2.0 * ABS(uni - 0.5))
             * 1000000000) AS BIGINT) AS released_nano
    FROM u
    """,
)
def dp_histogram_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release (ε=1, sensitivity 1
    → Laplace(b=1)): the per-source doc-count histogram plus Laplace
    noise drawn by inverse-CDF from a DETERMINISTIC md5-hash uniform
    — noise = −sign(u−½)·ln(1−2|u−½|)·b — so the release is exactly
    reproducible cross-engine (the audit property: a DP pipeline must
    be able to replay its own noise from the seed). u = (hash16+1)/
    65537 from 4 seeded hex chars is strictly inside (0,1) and never
    exactly ½ (the numerator is an integer, 65537 odd), so the ln is
    always finite; nano-unit rounding is the established double-
    parity contract. n_docs sensitivity is 1 per doc (each doc has
    one source), the textbook histogram-release setting.

    Scale posture: one hash-aggregate over the fixed source set, then
    per-group codegen arithmetic — the noise costs nothing at any
    corpus size.

    Reference surface: none (novel §2.5 privacy extension alongside
    k_anonymity_audit / t_closeness_audit)."""
    t = _S.load_tables(spark, sf_dir, "documents")["documents"]
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp|"), F.col("source"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    uni = (h16 + 1).cast("double") / 65537.0
    noise = F.round(
        -F.signum(uni - 0.5)
        * F.log(1.0 - 2.0 * F.abs(uni - 0.5))
        * 1000000000
    ).cast("bigint")
    return (
        t.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "source",
            "n_docs",
            noise.alias("noise_nano"),
            (F.col("n_docs") * 1000000000 + noise).alias("released_nano"),
        )
    )


# ---------------------------------------------------------------------------
# benford_first_digit_audit — synthetic/fabricated-data screen
# ---------------------------------------------------------------------------


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH v AS (
      SELECT SUBSTR(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS d
      FROM lineitem WHERE l_extendedprice > 0
    ),
    obs AS MATERIALIZED (
      SELECT CAST(d AS BIGINT) AS digit, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM obs),
    g AS (
      SELECT CAST(UNNEST(RANGE(1, 10)) AS BIGINT) AS digit
    )
    SELECT g.digit,
           CAST(COALESCE(obs.n, 0) AS BIGINT) AS n,
           CAST(ROUND((LN(1e0 + 1e0 / g.digit) / LN(1e1))
                      * 1000000000) AS BIGINT) AS benford_p_nano,
           CAST(ROUND(
             (CAST(COALESCE(obs.n, 0) AS DOUBLE)
              - (SELECT t FROM tot) * (LN(1e0 + 1e0 / g.digit) / LN(1e1)))
             * (CAST(COALESCE(obs.n, 0) AS DOUBLE)
              - (SELECT t FROM tot) * (LN(1e0 + 1e0 / g.digit) / LN(1e1)))
             / ((SELECT t FROM tot) * (LN(1e0 + 1e0 / g.digit) / LN(1e1)))
             * 1000000) AS BIGINT) AS chi2_term_micro
    FROM g LEFT JOIN obs ON obs.digit = g.digit
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over line-item prices — the
    classic fabricated/synthetic-data screen (naturally-occurring
    multiplicative amounts follow P(d) = log10(1 + 1/d); generated or
    tampered columns don't, and THIS corpus's uniform synthetic
    prices rightly light the audit up). First digits are extracted
    arithmetically-exactly (integer cents → decimal string → first
    char, identical cross-engine — never float log10 on the value),
    and the per-digit χ² terms against the Benford expectation are
    micro-unit integers over the shared double expression
    LN(1+1/d)/LN(10).

    Scale posture: one map-side-combined 9-group aggregate; the
    Benford grid is a fixed 9-row densify.

    Reference surface: none (novel §2.5 data-quality extension)."""
    li = _S.load_tables(spark, sf_dir, "lineitem")["lineitem"]
    obs = (
        li.where(F.col("l_extendedprice") > 0)
        .select(
            F.substring(
                F.round(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql.window import Window as W

    grid = spark.range(1, 10).select(F.col("id").alias("digit"))
    p = F.log(1e0 + 1e0 / F.col("digit")) / F.log(F.lit(1e1))
    n_d = F.coalesce(F.col("n"), F.lit(0)).cast("double")
    # the grand total comes from an unpartitioned window over the
    # 9-row densified grid — ONE lineitem scan; a second obs.agg()
    # branch made Spark re-aggregate the fact table and the k=100
    # stress flipped a shuffle on it (AQE stopped reusing the
    # exchange at scale)
    t = F.sum(n_d).over(W.partitionBy())
    exp = t * p
    # obs is structurally <= 9 rows (grouped by first digit) but its
    # pre-AQE size ESTIMATE scales with the fact scan, so the planner
    # dropped the broadcast at the k=100 stress — pin it explicitly
    return (
        grid.join(F.broadcast(obs), "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.round(p * 1000000000).cast("bigint").alias("benford_p_nano"),
            F.round((n_d - exp) * (n_d - exp) / exp * 1000000)
            .cast("bigint")
            .alias("chi2_term_micro"),
        )
    )
