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
    _GINI_BUCKET_CENTS,
    dau_mau_stickiness,
    gini_revenue_concentration,
    rolling_forecast_error,
)
from rs_streamloader_spark.operators.stats.inference import (
    _KS_A,
    _KS_B,
    cusum_drift_daily,
    daily_acf_curve,
    ks_test_click_view_value,
)
from rs_streamloader_spark.operators.stats.hypothesis import (
    _CA_SCORE_CASE,
    _DW_A,
    _DW_B,
    _JB_MU,
    _JB_SIG,
    _JB_SKEW,
    _JB_XKURT,
    _KW_CRIT,
    _MK_Z975,
    anova_oneway_f,
    changepoint_binseg,
    cochran_armitage_trend,
    durbin_watson_ols,
    event_count_overdispersion,
    gumbel_return_level,
    jarque_bera_normality,
    kruskal_wallis_h,
    levene_brown_forsythe,
    lorenz_curve_points,
    mann_kendall_trend,
    mann_whitney_u,
    mcnemar_weekday_weekend,
    ratio_metric_delta_method,
    theil_index_revenue,
)




# ---------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 2) of customer revenue
# ---------------------------------------------------------------------------


@register(
    "atkinson_index_2",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT rev,
             CAST(ROUND(1e18 / rev) AS BIGINT) AS inv_atto
      FROM cust WHERE rev > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS s,
             CAST(SUM(inv_atto) AS HUGEINT) AS sinv
      FROM terms
    )
    SELECT n AS n_customers,
           CAST(s AS BIGINT) AS total_cents,
           ROUND(CAST(n AS DOUBLE) * 1e18 / CAST(sinv AS DOUBLE), 4)
             AS harmonic_mean_cents,
           ROUND(1e0 - (CAST(n AS DOUBLE) * 1e18 / CAST(sinv AS DOUBLE))
                 / (CAST(s AS DOUBLE) / n), 6) AS atkinson_2
    FROM agg WHERE n > 0 AND sinv > 0
    """,
)
def atkinson_index_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at inequality-aversion ε = 2 over
    per-customer revenue: A₂ = 1 − harmonic_mean/arithmetic_mean —
    the welfare-theoretic member of the inequality family
    (``gini_revenue_concentration`` is rank-based,
    ``theil_index_revenue`` entropy-based; Atkinson answers "what
    fraction of total revenue could be given up if it were spread
    evenly, at aversion ε"). ε = 2 is the closed-form case needing NO
    transcendental: only a reciprocal per customer.

    Scale posture: one per-customer collapse then a single combinable
    aggregate; each 1/x term is rounded at atto precision (1e18/x on
    cents keeps ~9 significant digits even for million-dollar
    customers) and summed exactly; the two means and A₂ are one fixed
    double expression. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    d38 = "DECIMAL(38,0)"
    terms = cust.where("rev > 0").select(
        "rev",
        F.expr("CAST(ROUND(1e18 / rev) AS BIGINT)").alias("inv_atto"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(rev) AS {d38})").alias("s"),
        F.expr(f"CAST(SUM(inv_atto) AS {d38})").alias("sinv"),
    )
    return agg.where("n > 0 AND sinv > 0").select(
        F.col("n").alias("n_customers"),
        F.col("s").cast("bigint").alias("total_cents"),
        F.expr(
            "ROUND(CAST(n AS DOUBLE) * 1e18 / CAST(sinv AS DOUBLE), 4)"
        ).alias("harmonic_mean_cents"),
        F.expr(
            "ROUND(1e0 - (CAST(n AS DOUBLE) * 1e18 / CAST(sinv AS DOUBLE))"
            " / (CAST(s AS DOUBLE) / n), 6)"
        ).alias("atkinson_2"),
    )




# ---------------------------------------------------------------------------
# Palma ratio of customer revenue (top-10% share / bottom-40% share)
# ---------------------------------------------------------------------------


@register(
    "palma_ratio",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk,
             SUM(rev) OVER (ORDER BY rev, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM cust
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS total
      FROM cust
    ),
    cuts AS (
      SELECT
        CAST(MAX(CASE WHEN rnk = n * 4 // 10 THEN cum END) AS HUGEINT)
          AS bottom40,
        CAST(MAX(CASE WHEN rnk = n * 9 // 10 THEN cum END) AS HUGEINT)
          AS upto90
      FROM ranked CROSS JOIN tot
    )
    SELECT t.n AS n_customers,
           CAST(c.bottom40 AS BIGINT) AS bottom40_cents,
           CAST(t.total - c.upto90 AS BIGINT) AS top10_cents,
           ROUND(CAST(t.total - c.upto90 AS DOUBLE)
                 / CAST(c.bottom40 AS DOUBLE), 6) AS palma_ratio
    FROM cuts c CROSS JOIN tot t
    WHERE c.bottom40 > 0
    """,
)
def palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer revenue: (top-10% customers' revenue) /
    (bottom-40% customers' revenue) — the inequality one-number policy
    analysts quote because the middle 50% share is empirically stable;
    it reads directly off the same Lorenz geometry as
    ``lorenz_curve_points`` (= (1−L(0.9))/L(0.4)). Population cuts are
    the exact rank boundaries ⌊0.4n⌋ and ⌊0.9n⌋ with the pinned
    (rev, custkey) tie-break.

    Scale posture: per-customer collapse, then the banded two-pass
    rank + revenue prefix (the ``lorenz_curve_points`` machinery on
    the Spark side — no input-cardinality global window), and a
    2-boundary broadcast pick. All accounting in exact BIGINT cents /
    DECIMAL(38); the final ratio is one double division. One row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cust = t.groupBy("o_custkey").agg(F.sum(cents).alias("rev"))
    cust = cust.withColumn(
        "bucket",
        F.floor(F.col("rev") / F.lit(_GINI_BUCKET_CENTS)).cast("bigint"),
    )
    w_in = Window.partitionBy("bucket").orderBy("rev", "o_custkey")
    w_in_sum = w_in.rowsBetween(Window.unboundedPreceding, 0)
    within = cust.withColumn("rn", F.row_number().over(w_in)).withColumn(
        "csum", F.sum(F.col("rev").cast("decimal(38,0)")).over(w_in_sum)
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        cust.groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.expr("CAST(SUM(rev) AS DECIMAL(38,0))").alias("bsum"),
        )
        .select(
            "bucket",
            F.coalesce(F.sum("cnt").over(w_b), F.lit(0)).alias("offset"),
            F.coalesce(
                F.sum("bsum").over(w_b), F.lit(0).cast("decimal(38,0)")
            ).alias("rev_offset"),
        )
    )
    ranked = within.join(F.broadcast(offsets), "bucket").select(
        (F.col("offset") + F.col("rn")).cast("bigint").alias("rnk"),
        (F.col("rev_offset") + F.col("csum")).alias("cum"),
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(rev) AS DECIMAL(38,0))").alias("total"),
    )
    cuts = ranked.join(F.broadcast(tot)).agg(
        F.expr(
            "CAST(MAX(CASE WHEN rnk = n * 4 div 10 THEN cum END)"
            " AS DECIMAL(38,0))"
        ).alias("bottom40"),
        F.expr(
            "CAST(MAX(CASE WHEN rnk = n * 9 div 10 THEN cum END)"
            " AS DECIMAL(38,0))"
        ).alias("upto90"),
    )
    return cuts.join(F.broadcast(tot)).where("bottom40 > 0").select(
        F.col("n").alias("n_customers"),
        F.col("bottom40").cast("bigint").alias("bottom40_cents"),
        F.expr("CAST(total - upto90 AS BIGINT)").alias("top10_cents"),
        F.expr(
            "ROUND(CAST(total - upto90 AS DOUBLE)"
            " / CAST(bottom40 AS DOUBLE), 6)"
        ).alias("palma_ratio"),
    )




# ---------------------------------------------------------------------------
# Entropy rate of the per-user event-type Markov chain
# ---------------------------------------------------------------------------


@register(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events
    ),
    trans AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ),
    marg AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM trans GROUP BY a),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM trans),
    terms AS (
      SELECT CAST(ROUND(c * LN(CAST(c AS DOUBLE) / ra) * 1000000000)
                  AS BIGINT) AS t_nano
      FROM trans JOIN marg USING (a)
      WHERE c > 0
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           ROUND(-SUM(t_nano) / ((SELECT n FROM tot) * 1e9), 6)
             AS entropy_rate_nats,
           ROUND(-SUM(t_nano) / ((SELECT n FROM tot) * 1e9)
                 / LN(2e0), 6) AS entropy_rate_bits
    FROM terms
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the empirical per-user event-type Markov chain:
    H = −Σ_{ij} (c_ij/N)·ln(c_ij/r_i) — the per-step unpredictability
    of the NEXT action given the current one, i.e. how much the
    ``event_transition_matrix`` actually constrains behaviour (H equal
    to the unconditional type entropy = memoryless users; H near 0 =
    deterministic journeys). Weighting by empirical transition counts
    makes this the maximum-likelihood plug-in estimate with the
    visit distribution as the stationary weight.

    Scale posture: one user-partitioned LEAD (the sessionize shuffle),
    a ≤(types)² bounded transition aggregate, broadcast row marginals,
    per-cell nano-rounded LN terms summed exactly (the
    ``source_token_entropy`` policy). One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("b"),
    )
    trans = (
        seq.where(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    marg = trans.groupBy("a").agg(F.sum("c").cast("bigint").alias("ra"))
    tot = trans.agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        trans.join(F.broadcast(marg), "a")
        .where("c > 0")
        .select(
            F.expr(
                "CAST(ROUND(c * LN(CAST(c AS DOUBLE) / ra) * 1000000000)"
                " AS BIGINT)"
            ).alias("t_nano")
        )
    )
    agg = terms.agg(
        F.expr("CAST(SUM(CAST(t_nano AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "snl"
        )
    )
    return agg.join(F.broadcast(tot)).select(
        F.col("n").alias("n_transitions"),
        F.expr("ROUND(-CAST(snl AS DOUBLE) / (n * 1e9), 6)").alias(
            "entropy_rate_nats"
        ),
        F.expr(
            "ROUND(-CAST(snl AS DOUBLE) / (n * 1e9) / LN(2e0), 6)"
        ).alias("entropy_rate_bits"),
    )




# ---------------------------------------------------------------------------
# Jackknife standard error for the per-variant ratio metric
# ---------------------------------------------------------------------------


@register(
    "jackknife_ratio_se",
    oracle=f"""
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE "value" IS NOT NULL
      GROUP BY user_id
    ),
    tot AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy
      FROM u GROUP BY variant
    ),
    loo AS (
      SELECT u.variant, t.n, t.sx, t.sy,
             CAST(ROUND(CAST(t.sx - u.x AS DOUBLE) / (t.sy - u.y)
                        * 1000000000) AS BIGINT) AS r_nano
      FROM u JOIN tot t ON t.variant = u.variant
      WHERE t.sy - u.y > 0 AND t.n > 1
    ),
    mom AS (
      SELECT variant, n, sx, sy,
             CAST(COUNT(*) AS BIGINT) AS nl,
             CAST(SUM(r_nano) AS HUGEINT) AS sr,
             CAST(SUM(CAST(r_nano AS HUGEINT) * r_nano) AS HUGEINT) AS srr
      FROM loo GROUP BY 1, 2, 3, 4
    )
    SELECT variant, n AS n_users,
           ROUND(CAST(sx AS DOUBLE) / sy, 6) AS ratio_cents_per_event,
           ROUND(SQRT(GREATEST(
                   (CAST(nl AS DOUBLE) - 1) / nl
                   * (CAST(srr AS DOUBLE) / 1e18
                      - (CAST(sr AS DOUBLE) / 1e9)
                        * (CAST(sr AS DOUBLE) / 1e9) / nl), 0e0)), 6)
             AS se_jackknife
    FROM mom WHERE nl = n
    ORDER BY variant
    """,
)
def jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-user-out jackknife standard error for the per-variant
    ratio metric (cents per event) — the RESAMPLING cross-check of
    ``ratio_metric_delta_method``'s analytic SE: SE_jack² =
    (n−1)/n · Σ(R₍ᵢ₎ − R̄₍·₎)². When the two disagree, the delta
    linearization is breaking (heavy-tailed per-user denominators) and
    the jackknife is the one to trust. Deleted-ratio R₍ᵢ₎ =
    (Σx − xᵢ)/(Σy − yᵢ) needs only the broadcast totals — the whole
    jackknife is ONE pass, not n reruns.

    Scale posture: per-user collapse (combinable), 2-row totals
    broadcast back, each deleted ratio nano-rounded to an integer
    before the (n, Σr, Σr²) moment reduction (sum-order immunity);
    SE is one fixed double expression. The nl = n guard drops a
    variant where any leave-one-out denominator hit zero (identical
    both engines). Two output rows.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    u = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("variant"), "x", "y")
    )
    d38 = "DECIMAL(38,0)"
    tot = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
    )
    loo = (
        u.join(F.broadcast(tot), "variant")
        .where("sy - y > 0 AND n > 1")
        .select(
            "variant",
            "n",
            "sx",
            "sy",
            F.expr(
                "CAST(ROUND(CAST(sx - x AS DOUBLE) / (sy - y)"
                " * 1000000000) AS BIGINT)"
            ).alias("r_nano"),
        )
    )
    mom = loo.groupBy("variant", "n", "sx", "sy").agg(
        F.count(F.lit(1)).cast("bigint").alias("nl"),
        F.expr(f"CAST(SUM(r_nano) AS {d38})").alias("sr"),
        F.expr(f"CAST(SUM(CAST(r_nano AS {d38}) * r_nano) AS {d38})").alias(
            "srr"
        ),
    )
    return (
        mom.where("nl = n")
        .select(
            "variant",
            F.col("n").alias("n_users"),
            F.expr("ROUND(CAST(sx AS DOUBLE) / sy, 6)").alias(
                "ratio_cents_per_event"
            ),
            F.expr(
                "ROUND(SQRT(GREATEST((CAST(nl AS DOUBLE) - 1) / nl"
                " * (CAST(srr AS DOUBLE) / 1e18"
                " - (CAST(sr AS DOUBLE) / 1e9)"
                " * (CAST(sr AS DOUBLE) / 1e9) / nl), 0e0)), 6)"
            ).alias("se_jackknife"),
        )
        .orderBy("variant")
    )




# ---------------------------------------------------------------------------
# Page-Hinkley drift statistic on daily revenue
# ---------------------------------------------------------------------------


@register(
    "page_hinkley_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM daily_src GROUP BY 1
    ),
    pre AS (
      SELECT d, x,
             SUM(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS st,
             ROW_NUMBER() OVER (ORDER BY d) AS t
      FROM daily
    ),
    terms AS (
      SELECT d,
             CAST(ROUND((x - CAST(st AS DOUBLE) / t) * 1000000000)
                  AS BIGINT) AS dev_nano
      FROM pre
    ),
    walk AS (
      SELECT d,
             SUM(dev_nano) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS m
      FROM terms
    ),
    drawup AS (
      SELECT d, m - MIN(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS du
      FROM walk
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM daily
    ),
    peak AS (
      SELECT CAST(MAX(du) AS BIGINT) AS ph_nano,
             MIN(CASE WHEN du = (SELECT MAX(du) FROM drawup) THEN d END)
               AS peak_day
      FROM drawup
    )
    SELECT m.n AS n_days,
           ROUND(p.ph_nano / 1e9, 4) AS ph_statistic_cents,
           STRFTIME(p.peak_day, '%Y-%m-%d') AS peak_day,
           ROUND(p.ph_nano / 1e9
                 / (SQRT(GREATEST((CAST(m.sxx AS DOUBLE)
                                   - (CAST(m.sx AS DOUBLE) / m.n) * m.sx)
                                  / (m.n - 1), 1e0)) * SQRT(CAST(m.n AS DOUBLE))),
                 6) AS ph_normalized,
           (p.ph_nano / 1e9
            / (SQRT(GREATEST((CAST(m.sxx AS DOUBLE)
                              - (CAST(m.sx AS DOUBLE) / m.n) * m.sx)
                             / (m.n - 1), 1e0))
               * SQRT(CAST(m.n AS DOUBLE)))) > 3e0 AS drift_detected
    FROM peak p CROSS JOIN mom m WHERE m.n > 2
    """.replace("daily_src", "orders"),
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift statistic (δ = 0 variant) on daily revenue:
    the cumulative deviation from the RUNNING mean, m_T = Σ(x_t −
    x̄_{1..t}), and its maximum drawup max_T(m_T − min_{s≤T} m_s) —
    large when the level SHIFTS mid-series (the running mean lags the
    new level, deviations accumulate). Self-adapting where
    ``cusum_drift_daily`` needs a fixed reference window; the
    alarm normalizes the drawup by σ·√n (a stationary series' drawup
    is a random-walk functional growing ~σ√n — empirically p95 ≈ 2.0
    over 200 stationary seeds — so the frozen threshold 3.0 separates
    real level shifts, which score ≳ 6). peak_day says WHERE the drawup peaked —
    the change's end, a human-auditable anchor.

    Scale posture: one combinable daily aggregate; every window (the
    revenue prefix, the deviation walk, the running min) orders the
    calendar-bounded series only; per-day deviations are nano-rounded
    BEFORE the exact integer walk, the final ratio is one fixed
    double. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "d",
        "x",
        F.sum("x").over(wcum).alias("st"),
        F.row_number().over(wd).alias("t"),
    )
    terms = pre.select(
        "d",
        F.expr(
            "CAST(ROUND((x - CAST(st AS DOUBLE) / t) * 1000000000)"
            " AS BIGINT)"
        ).alias("dev_nano"),
    )
    # DECIMAL(38) walk: per-day nano deviations reach ~1e18 at large
    # daily volumes, so a BIGINT prefix overflows (caught by the 10x
    # stress; DuckDB auto-widens SUM(BIGINT) to HUGEINT)
    walk = terms.select(
        "d",
        F.sum(F.col("dev_nano").cast("decimal(38,0)")).over(wcum).alias("m"),
    )
    drawup = walk.select(
        "d", (F.col("m") - F.min("m").over(wcum)).alias("du")
    )
    d38 = "DECIMAL(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
    )
    mx = drawup.agg(F.max("du").alias("ph_nano"))
    peak = (
        drawup.join(F.broadcast(mx), drawup["du"] == mx["ph_nano"])
        .agg(F.min("d").alias("peak_day"))
    )
    sig = (
        "SQRT(GREATEST((CAST(sxx AS DOUBLE)"
        " - (CAST(sx AS DOUBLE) / n) * sx) / (n - 1), 1e0))"
    )
    return (
        mx.join(F.broadcast(peak))
        .join(F.broadcast(mom))
        .where("n > 2")
        .select(
            F.col("n").alias("n_days"),
            F.expr("ROUND(ph_nano / 1e9, 4)").alias("ph_statistic_cents"),
            F.date_format("peak_day", "yyyy-MM-dd").alias("peak_day"),
            F.expr(
                f"ROUND(ph_nano / 1e9"
                f" / ({sig} * SQRT(CAST(n AS DOUBLE))), 6)"
            ).alias("ph_normalized"),
            F.expr(
                f"(ph_nano / 1e9 / ({sig} * SQRT(CAST(n AS DOUBLE))))"
                " > 3e0"
            ).alias("drift_detected"),
        )
    )




# ---------------------------------------------------------------------------
# Granger causality (lag 1): do clicks predict next-day purchases?
# ---------------------------------------------------------------------------

_GRANGER_F_CRIT = 3.841459  # F(1, inf) 95% = chi^2_1 (frozen; see doc)



# Cramer's-rule solution of the 3x3 normal equations for
# y ~ 1 + y1 + x1, as fixed-operand-order double expressions over the
# nine exact integer sums (n, sy1, sx1, sy1y1, sx1x1, sy1x1, sy, syy1,
# syx1, syy). One shared rendering for both engines.
_G_DET = (
    "(CAST(n AS DOUBLE) * (CAST(sy1y1 AS DOUBLE) * sx1x1"
    " - CAST(sy1x1 AS DOUBLE) * sy1x1)"
    " - CAST(sy1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sx1x1"
    " - CAST(sy1x1 AS DOUBLE) * sx1)"
    " + CAST(sx1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sy1x1"
    " - CAST(sy1y1 AS DOUBLE) * sx1))"
)


_G_B0 = (
    "((CAST(sy AS DOUBLE) * (CAST(sy1y1 AS DOUBLE) * sx1x1"
    " - CAST(sy1x1 AS DOUBLE) * sy1x1)"
    " - CAST(sy1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) * sx1x1"
    " - CAST(sy1x1 AS DOUBLE) * syx1)"
    " + CAST(sx1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) * sy1x1"
    " - CAST(sy1y1 AS DOUBLE) * syx1)) / " + _G_DET + ")"
)


_G_B1 = (
    "((CAST(n AS DOUBLE) * (CAST(syy1 AS DOUBLE) * sx1x1"
    " - CAST(syx1 AS DOUBLE) * sy1x1)"
    " - CAST(sy AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sx1x1"
    " - CAST(sy1x1 AS DOUBLE) * sx1)"
    " + CAST(sx1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * syx1"
    " - CAST(syy1 AS DOUBLE) * sx1)) / " + _G_DET + ")"
)


_G_B2 = (
    "((CAST(n AS DOUBLE) * (CAST(sy1y1 AS DOUBLE) * syx1"
    " - CAST(sy1x1 AS DOUBLE) * syy1)"
    " - CAST(sy1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * syx1"
    " - CAST(syy1 AS DOUBLE) * sx1)"
    " + CAST(sy AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sy1x1"
    " - CAST(sy1y1 AS DOUBLE) * sx1)) / " + _G_DET + ")"
)


_G_SSR_U = (
    "(CAST(syy AS DOUBLE) - (" + _G_B0 + " * sy + " + _G_B1
    + " * syy1 + " + _G_B2 + " * syx1))"
)


# restricted model y ~ 1 + y1
_G_BR = (
    "((CAST(n AS DOUBLE) * syy1 - CAST(sy1 AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sy1y1 - CAST(sy1 AS DOUBLE) * sy1))"
)


_G_AR = "((CAST(sy AS DOUBLE) - " + _G_BR + " * sy1) / n)"


_G_SSR_R = (
    "(CAST(syy AS DOUBLE) - " + _G_AR + " * sy - " + _G_BR + " * syy1)"
)


_G_F = (
    "((" + _G_SSR_R + " - " + _G_SSR_U + ") * (n - 3) / " + _G_SSR_U + ")"
)




@register(
    "granger_causality_lag1",
    oracle=f"""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    counts AS (
      SELECT dy.d,
             CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                    THEN 1 END), 0) AS BIGINT) AS y,
             CAST(COALESCE(SUM(CASE WHEN e.event_type = 'click'
                                    THEN 1 END), 0) AS BIGINT) AS x
      FROM days dy LEFT JOIN events e ON CAST(e.ts AS DATE) = dy.d
      GROUP BY dy.d
    ),
    lagged AS (
      SELECT y,
             LAG(y) OVER (ORDER BY d) AS y1,
             LAG(x) OVER (ORDER BY d) AS x1
      FROM counts
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y1) AS HUGEINT) AS sy1,
             CAST(SUM(x1) AS HUGEINT) AS sx1,
             CAST(SUM(CAST(y1 AS HUGEINT) * y1) AS HUGEINT) AS sy1y1,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx1x1,
             CAST(SUM(CAST(y1 AS HUGEINT) * x1) AS HUGEINT) AS sy1x1,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(y AS HUGEINT) * y1) AS HUGEINT) AS syy1,
             CAST(SUM(CAST(y AS HUGEINT) * x1) AS HUGEINT) AS syx1,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM lagged WHERE y1 IS NOT NULL
    )
    SELECT n AS n_days,
           ROUND({_G_B2}, 6) AS click_coef,
           ROUND({_G_SSR_R}, 4) AS ssr_restricted,
           ROUND({_G_SSR_U}, 4) AS ssr_unrestricted,
           ROUND({_G_F}, 6) AS f_statistic,
           ({_G_F}) > {_GRANGER_F_CRIT} AS granger_causal
    FROM sums
    WHERE n > 3 AND {_G_DET} <> 0e0 AND ({_G_SSR_U}) > 0e0
    """,
)
def granger_causality_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1: does yesterday's CLICK volume
    predict today's PURCHASE volume beyond what yesterday's purchases
    already predict? F compares the restricted AR(1) against the
    unrestricted y ~ 1 + y₋₁ + x₋₁ fit (both solved in closed form —
    Cramer's rule on the 3×3 normal equations over nine EXACT integer
    sums). The causal reading is the usual Granger caveat (predictive,
    not interventional); verdict vs the frozen F(1, ∞) = χ²₁ 95%
    value (conservative at finite n, the ANOVA-op convention).

    Scale posture: events collapse to the densified calendar-bounded
    daily (purchase, click) table; one LAG walk over it; ONE
    combinable 10-sum aggregate; every coefficient/SSR/F is a fixed-
    operand-order double expression over the exact sums. One output
    row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    counts = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'"
            " THEN 1 END), 0) AS BIGINT)"
        ).alias("y"),
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN event_type = 'click'"
            " THEN 1 END), 0) AS BIGINT)"
        ).alias("x"),
    )
    wd = Window.orderBy("d")
    lagged = counts.select(
        "y",
        F.lag("y").over(wd).alias("y1"),
        F.lag("x").over(wd).alias("x1"),
    )
    d38 = "DECIMAL(38,0)"
    sums = lagged.where("y1 IS NOT NULL").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(y1) AS {d38})").alias("sy1"),
        F.expr(f"CAST(SUM(x1) AS {d38})").alias("sx1"),
        F.expr(f"CAST(SUM(CAST(y1 AS {d38}) * y1) AS {d38})").alias("sy1y1"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d38}) * x1) AS {d38})").alias("sx1x1"),
        F.expr(f"CAST(SUM(CAST(y1 AS {d38}) * x1) AS {d38})").alias("sy1x1"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(y AS {d38}) * y1) AS {d38})").alias("syy1"),
        F.expr(f"CAST(SUM(CAST(y AS {d38}) * x1) AS {d38})").alias("syx1"),
        F.expr(f"CAST(SUM(CAST(y AS {d38}) * y) AS {d38})").alias("syy"),
    )
    return sums.where(
        f"n > 3 AND {_G_DET} <> 0e0 AND ({_G_SSR_U}) > 0e0"
    ).select(
        F.col("n").alias("n_days"),
        F.expr(f"ROUND({_G_B2}, 6)").alias("click_coef"),
        F.expr(f"ROUND({_G_SSR_R}, 4)").alias("ssr_restricted"),
        F.expr(f"ROUND({_G_SSR_U}, 4)").alias("ssr_unrestricted"),
        F.expr(f"ROUND({_G_F}, 6)").alias("f_statistic"),
        F.expr(f"({_G_F}) > {_GRANGER_F_CRIT}").alias("granger_causal"),
    )




# ---------------------------------------------------------------------------
# Odds ratio: weekend activity vs purchase conversion (per user)
# ---------------------------------------------------------------------------


@register(
    "odds_ratio_weekend_purchase",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MAX(CASE WHEN CAST(EXTRACT(dow FROM ts) AS INT) IN (0, 6)
                      THEN 1 ELSE 0 END) AS exposed,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS outcome
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN exposed = 1 AND outcome = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed = 1 AND outcome = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exposed = 0 AND outcome = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN exposed = 0 AND outcome = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM u
    )
    SELECT a, b, c, d,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
             AS odds_ratio,
           ROUND(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.959964e0 * SQRT(1e0 / a + 1e0 / b + 1e0 / c
                                     + 1e0 / d), 6) AS log_or_ci_lo,
           ROUND(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.959964e0 * SQRT(1e0 / a + 1e0 / b + 1e0 / c
                                     + 1e0 / d), 6) AS log_or_ci_hi,
           (LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
            - 1.959964e0 * SQRT(1e0 / a + 1e0 / b + 1e0 / c + 1e0 / d)
            > 0e0
            OR LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
               + 1.959964e0 * SQRT(1e0 / a + 1e0 / b + 1e0 / c + 1e0 / d)
               < 0e0) AS significant
    FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    """,
)
def odds_ratio_weekend_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of the per-USER-DAY 2×2 (the active day falls on a
    weekend × the user purchased that day) with the Woolf log-OR 95% CI — the epidemiology-
    standard effect size the χ²/z tests in this family do NOT report:
    OR = ad/bc, SE(ln OR) = √(1/a+1/b+1/c+1/d), significant iff the
    CI excludes 0 in log space. Complements
    ``mcnemar_weekday_weekend`` (paired within-user change) with the
    day-level association strength; the user-day unit keeps all four
    cells populated on an active corpus where every USER eventually
    purchases (the degenerate ever-purchased margin found by the
    vacuity scan).

    Scale posture: one per-(user, day) collapse (combinable MAX
    flags), one 4-cell reduction, one output row; the only transcendental is a
    single shared LN with identical operands, all cells exact
    integers.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    u = ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.max(
            F.when(
                ((F.dayofweek("ts") - 1) % 7).isin(0, 6), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("exposed"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("outcome"),
    )
    cells = u.agg(
        F.expr(
            "CAST(SUM(CASE WHEN exposed = 1 AND outcome = 1 THEN 1"
            " ELSE 0 END) AS BIGINT)"
        ).alias("a"),
        F.expr(
            "CAST(SUM(CASE WHEN exposed = 1 AND outcome = 0 THEN 1"
            " ELSE 0 END) AS BIGINT)"
        ).alias("b"),
        F.expr(
            "CAST(SUM(CASE WHEN exposed = 0 AND outcome = 1 THEN 1"
            " ELSE 0 END) AS BIGINT)"
        ).alias("c"),
        F.expr(
            "CAST(SUM(CASE WHEN exposed = 0 AND outcome = 0 THEN 1"
            " ELSE 0 END) AS BIGINT)"
        ).alias("d"),
    )
    lor = "LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
    se = "SQRT(1e0 / a + 1e0 / b + 1e0 / c + 1e0 / d)"
    return cells.where("a > 0 AND b > 0 AND c > 0 AND d > 0").select(
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)"
        ).alias("odds_ratio"),
        F.expr(f"ROUND({lor} - 1.959964e0 * {se}, 6)").alias(
            "log_or_ci_lo"
        ),
        F.expr(f"ROUND({lor} + 1.959964e0 * {se}, 6)").alias(
            "log_or_ci_hi"
        ),
        F.expr(
            f"({lor} - 1.959964e0 * {se} > 0e0"
            f" OR {lor} + 1.959964e0 * {se} < 0e0)"
        ).alias("significant"),
    )




# ---------------------------------------------------------------------------
# Capture-recapture (Chapman) estimate of the active-user population
# ---------------------------------------------------------------------------


@register(
    "capture_recapture_users",
    oracle="""
    WITH hz AS (
      SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events
    ),
    flags AS (
      SELECT user_id,
             MAX(CASE WHEN CAST(ts AS DATE) > maxd - 14
                       AND CAST(ts AS DATE) <= maxd - 7
                      THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN CAST(ts AS DATE) > maxd - 7
                      THEN 1 ELSE 0 END) AS c2
      FROM events CROSS JOIN hz
      GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * c2) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS observed_ever
      FROM flags
    )
    SELECT n1 AS week1_users, n2 AS week2_users, m AS recaptured,
           observed_ever,
           CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1
                AS BIGINT) AS chapman_estimate,
           ROUND(SQRT(CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1)
                           * (n1 - m) * (n2 - m) AS DOUBLE)
                      / (CAST(CAST(m + 1 AS HUGEINT) * (m + 1)
                              * (m + 2) AS DOUBLE))), 4) AS chapman_se
    FROM cells WHERE m > 0
    """,
)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the ACTIVE user
    population from the last two weeks of events: treat week₁ and
    week₂ activity as two "captures"; N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    with its standard SE. When N̂ far exceeds ``observed_ever`` the
    corpus is sampling a much larger population than it sees — the
    ecology-borrowed answer to "how many users are there REALLY"
    that DAU/MAU (``dau_mau_stickiness``) cannot give. Assumes
    capture independence (documented; correlated activity biases N̂
    low — it is the closed-population lower-bound reading).

    Scale posture: one per-user collapse with two window flags
    (combinable MAXes, the 1-row horizon broadcast), a 4-integer
    reduction, one output row. The Chapman point estimate is an exact
    truncating integer division; only the SE is a (single, shared)
    double expression.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    hz = ev.agg(F.max(F.col("ts").cast("date")).alias("maxd"))
    flags = (
        ev.join(F.broadcast(hz))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("ts").cast("date") > F.date_sub("maxd", 14))
                    & (F.col("ts").cast("date") <= F.date_sub("maxd", 7)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("c1"),
            F.max(
                F.when(
                    F.col("ts").cast("date") > F.date_sub("maxd", 7),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("c2"),
        )
    )
    d38 = "DECIMAL(38,0)"
    cells = flags.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("observed_ever"),
    )
    return cells.where("m > 0").select(
        F.col("n1").alias("week1_users"),
        F.col("n2").alias("week2_users"),
        F.col("m").alias("recaptured"),
        "observed_ever",
        F.expr(
            f"CAST(CAST(n1 + 1 AS {d38}) * (n2 + 1) div (m + 1) - 1"
            " AS BIGINT)"
        ).alias("chapman_estimate"),
        F.expr(
            f"ROUND(SQRT(CAST(CAST(n1 + 1 AS {d38}) * (n2 + 1)"
            " * (n1 - m) * (n2 - m) AS DOUBLE)"
            f" / (CAST(CAST(m + 1 AS {d38}) * (m + 1) * (m + 2)"
            " AS DOUBLE))), 4)"
        ).alias("chapman_se"),
    )




# ---------------------------------------------------------------------------
# Historical VaR / CVaR of daily revenue changes
# ---------------------------------------------------------------------------


@register(
    "value_at_risk_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    diffs AS (
      SELECT CAST(x - LAG(x) OVER (ORDER BY d) AS BIGINT) AS dx
      FROM daily
    ),
    h AS (
      SELECT dx, CAST(COUNT(*) AS BIGINT) AS c
      FROM diffs WHERE dx IS NOT NULL GROUP BY dx
    ),
    cum AS (
      SELECT dx, c,
             SUM(c) OVER (ORDER BY dx ROWS UNBOUNDED PRECEDING) AS cc
      FROM h
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    var_ AS (
      -- exact lower 5th-percentile change (PERCENTILE_DISC convention:
      -- smallest dx with cumulative count >= ceil(0.05 n))
      SELECT MIN(dx) AS var95
      FROM cum CROSS JOIN tot
      WHERE cc >= (n + 19) // 20
    ),
    tail AS (
      SELECT CAST(SUM(CAST(c.dx AS HUGEINT) * c.c) AS HUGEINT) AS ts,
             CAST(SUM(c.c) AS BIGINT) AS tc
      FROM cum c CROSS JOIN var_ v
      WHERE c.dx <= v.var95
    )
    SELECT t.n AS n_changes,
           v.var95 AS var95_cents,
           CAST(ta.ts * 1000000 // ta.tc AS BIGINT) AS cvar95_micro,
           CAST(ta.tc AS BIGINT) AS n_tail_days
    FROM var_ v CROSS JOIN tail ta CROSS JOIN tot t
    WHERE t.n >= 20
    """,
)
def value_at_risk_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% Value-at-Risk and CVaR (expected shortfall) of
    DAY-OVER-DAY revenue changes: the exact empirical 5th-percentile
    change (PERCENTILE_DISC convention over the integer-cents
    histogram) and the exact mean of the tail at or below it — "how
    bad is a bad day, and how bad are the bad days on average". The
    risk-family companion to ``max_drawdown_revenue`` (worst
    cumulative run) and ``gumbel_return_level`` (parametric extreme):
    CVaR is the coherent one of the three.

    Scale posture: one combinable daily aggregate; the diff walk
    orders the calendar-bounded series; the quantile pick is the
    histogram-prefix index (no row sort of raw data); VaR is an exact
    integer, CVaR an exact truncating micro division. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    diffs = daily.select(
        (F.col("x") - F.lag("x").over(wd)).cast("bigint").alias("dx")
    ).where(F.col("dx").isNotNull())
    h = diffs.groupBy("dx").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wv = Window.orderBy("dx").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("dx", "c", F.sum("c").over(wv).alias("cc"))
    tot = h.agg(F.sum("c").cast("bigint").alias("n"))
    var_ = (
        cum.join(F.broadcast(tot))
        .where("cc >= (n + 19) div 20")
        .agg(F.min("dx").alias("var95"))
    )
    d38 = "DECIMAL(38,0)"
    tail = (
        cum.join(F.broadcast(var_))
        .where("dx <= var95")
        .agg(
            F.expr(f"CAST(SUM(CAST(dx AS {d38}) * c) AS {d38})").alias("ts"),
            F.sum("c").cast("bigint").alias("tc"),
        )
    )
    return (
        var_.join(F.broadcast(tail))
        .join(F.broadcast(tot))
        .where("n >= 20")
        .select(
            F.col("n").alias("n_changes"),
            F.col("var95").alias("var95_cents"),
            F.expr("CAST(ts * 1000000 div tc AS BIGINT)").alias(
                "cvar95_micro"
            ),
            F.col("tc").cast("bigint").alias("n_tail_days"),
        )
    )




# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis of daily revenue
# ---------------------------------------------------------------------------

_HURST_SIZES = (16, 32, 64, 128)



# 4-point OLS slope in ln-ln space over (ln size, ln mean R/S),
# nano-integer sums (the heaps_law_fit policy; the shared 1e9 scale
# cancels in the slope ratio)
_HURST_SLOPE = (
    "(4e0 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
    " / (4e0 * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"
)




@register(
    "hurst_rs_exponent",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM daily
    ),
    blocks AS (
      SELECT s.s, CAST(i.t // s.s AS BIGINT) AS b, i.t, i.x
      FROM idx i CROSS JOIN (SELECT UNNEST(ARRAY{list(_HURST_SIZES)}) AS s) s
    ),
    stats AS (
      SELECT s, b, COUNT(*) AS cnt,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM blocks GROUP BY 1, 2
    ),
    devwalk AS (
      SELECT bl.s, bl.b,
             SUM(CAST(ROUND((bl.x - CAST(st.sx AS DOUBLE) / st.cnt)
                            * 1000) AS BIGINT))
               OVER (PARTITION BY bl.s, bl.b ORDER BY bl.t
                     ROWS UNBOUNDED PRECEDING) AS cum_milli
      FROM blocks bl JOIN stats st ON st.s = bl.s AND st.b = bl.b
      WHERE st.cnt = bl.s
    ),
    rng AS (
      SELECT s, b,
             CAST(MAX(cum_milli) - MIN(cum_milli) AS BIGINT) AS r_milli
      FROM devwalk GROUP BY 1, 2
    ),
    rs AS (
      SELECT r.s,
             CAST(ROUND(r.r_milli / 1e3
                        / SQRT((CAST(st.sxx AS DOUBLE)
                                - (CAST(st.sx AS DOUBLE) / st.cnt) * st.sx)
                               / st.cnt)
                        * 1000000000) AS BIGINT) AS rs_nano
      FROM rng r JOIN stats st ON st.s = r.s AND st.b = r.b
      WHERE st.cnt = r.s
        AND (CAST(st.sxx AS DOUBLE)
             - (CAST(st.sx AS DOUBLE) / st.cnt) * st.sx) > 0e0
    ),
    per_size AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(rs_nano) AS HUGEINT) AS srs
      FROM rs GROUP BY s
    ),
    pts AS (
      SELECT s, n_blocks,
             CAST(ROUND(LN(CAST(s AS DOUBLE)) * 1000000000) AS BIGINT)
               AS lx,
             CAST(ROUND(LN(CAST(srs AS DOUBLE) / n_blocks / 1e9)
                        * 1000000000) AS BIGINT) AS ly,
             ROUND(CAST(srs AS DOUBLE) / n_blocks / 1e9, 6) AS mean_rs
      FROM per_size WHERE srs > 0
    ),
    fit AS (
      SELECT CAST(SUM(lx) AS HUGEINT) AS sx, CAST(SUM(ly) AS HUGEINT) AS sy,
             CAST(SUM(CAST(lx AS HUGEINT) * lx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(lx AS HUGEINT) * ly) AS HUGEINT) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS npts
      FROM pts
    )
    SELECT p.s AS block_size, p.n_blocks, p.mean_rs,
           ROUND({_HURST_SLOPE}, 6) AS hurst_exponent
    FROM pts p CROSS JOIN fit
    WHERE fit.npts = 4
    ORDER BY p.s
    """,
)
def hurst_rs_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical rescaled-range analysis: for block
    sizes 16/32/64/128 days, E[R/S] per block (range of cumulative
    mean-deviations over the block's population std), and H = the
    ln-ln OLS slope. H ≈ 0.5 is a memoryless walk; H > 0.5 means
    long-range persistence (trends compound — ``daily_acf_curve``
    sees short lags, Hurst sees the scaling law); H < 0.5 means
    mean-reversion. Partial trailing blocks are dropped (cnt = s
    guard, both engines).

    Scale posture: one combinable daily aggregate; the global
    ROW_NUMBER orders the CALENDAR-BOUNDED series (reduced-aggregate
    rule); the 4× block fan-out windows within (size, block)
    partitions; deviations are milli-cent-rounded before the exact
    cumulative walk, each block's R/S nano-rounded before the
    per-size mean, and the 4-point fit uses exact nano ln sums.
    Output: 4 rows, bounded forever.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("d")) - 1).alias("t")
    )
    sizes = spark.createDataFrame(
        [(s,) for s in _HURST_SIZES], "s long"
    )
    blocks = idx.join(F.broadcast(sizes)).select(
        "s", F.expr("CAST(t div s AS BIGINT)").alias("b"), "t", "x"
    )
    d38 = "DECIMAL(38,0)"
    stats = blocks.groupBy("s", "b").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
    )
    joined = blocks.join(F.broadcast(stats), ["s", "b"]).where("cnt = s")
    wblk = (
        Window.partitionBy("s", "b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    devwalk = joined.select(
        "s",
        "b",
        F.sum(
            F.expr(
                "CAST(ROUND((x - CAST(sx AS DOUBLE) / cnt) * 1000)"
                " AS BIGINT)"
            )
        )
        .over(wblk)
        .alias("cum_milli"),
    )
    rng = devwalk.groupBy("s", "b").agg(
        (F.max("cum_milli") - F.min("cum_milli"))
        .cast("bigint")
        .alias("r_milli")
    )
    var_expr = (
        "(CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / cnt) * sx)"
    )
    rs = (
        rng.join(F.broadcast(stats), ["s", "b"])
        .where(f"cnt = s AND {var_expr} > 0e0")
        .select(
            "s",
            F.expr(
                f"CAST(ROUND(r_milli / 1e3 / SQRT({var_expr} / cnt)"
                " * 1000000000) AS BIGINT)"
            ).alias("rs_nano"),
        )
    )
    per_size = rs.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.expr(f"CAST(SUM(rs_nano) AS {d38})").alias("srs"),
    )
    pts = per_size.where("srs > 0").select(
        "s",
        "n_blocks",
        F.expr(
            "CAST(ROUND(LN(CAST(s AS DOUBLE)) * 1000000000) AS BIGINT)"
        ).alias("lx"),
        F.expr(
            "CAST(ROUND(LN(CAST(srs AS DOUBLE) / n_blocks / 1e9)"
            " * 1000000000) AS BIGINT)"
        ).alias("ly"),
        F.expr("ROUND(CAST(srs AS DOUBLE) / n_blocks / 1e9, 6)").alias(
            "mean_rs"
        ),
    )
    fit = pts.agg(
        F.expr(f"CAST(SUM(lx) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(ly) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(lx AS {d38}) * lx) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(lx AS {d38}) * ly) AS {d38})").alias("sxy"),
        F.count(F.lit(1)).cast("bigint").alias("npts"),
    )
    return (
        pts.join(F.broadcast(fit))
        .where("npts = 4")
        .select(
            F.col("s").alias("block_size"),
            "n_blocks",
            "mean_rs",
            F.expr(f"ROUND({_HURST_SLOPE}, 6)").alias("hurst_exponent"),
        )
        .orderBy("block_size")
    )




# ---------------------------------------------------------------------------
# Breusch-Pagan heteroscedasticity test on the daily-revenue OLS
# ---------------------------------------------------------------------------

_BP_CHI2_1 = 3.841459  # chi^2_1 95% (frozen)




@register(
    "breusch_pagan_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT d, y, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                        AS BIGINT) AS x
      FROM daily
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM xy
    ),
    resid AS (
      SELECT x, CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT) AS e
      FROM xy CROSS JOIN sums
    ),
    scale_ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS see
      FROM resid
    ),
    u AS (
      -- standardized squared residuals u = e^2 / (SSR/n), nano-rounded
      SELECT r.x,
             CAST(ROUND(CAST(r.e AS DOUBLE) * r.e
                        / (CAST(s.see AS DOUBLE) / s.n)
                        * 1000000000) AS BIGINT) AS un
      FROM resid r CROSS JOIN scale_ s
    ),
    bp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(un) AS HUGEINT) AS su,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * un) AS HUGEINT) AS sxu,
             CAST(SUM(CAST(un AS HUGEINT) * un) AS HUGEINT) AS suu
      FROM u
    )
    SELECT n AS n_days,
           ROUND(CAST(n AS DOUBLE)
                 * POW(CAST(n AS DOUBLE) * sxu
                       - CAST(sx AS DOUBLE) * su, 2)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * suu
                       - CAST(su AS DOUBLE) * su)), 6) AS bp_statistic,
           (CAST(n AS DOUBLE)
            * POW(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2)
            / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)))
             > {_BP_CHI2_1} AS heteroscedastic
    FROM bp
    WHERE n > 3 AND (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su) > 0e0
    """,
)
def breusch_pagan_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized form) heteroscedasticity
    test on the daily-revenue OLS residuals: BP = n·R² of the
    standardized squared residuals regressed on the day index —
    completing the regression-diagnostics trio with
    ``durbin_watson_ols`` (independence) and
    ``jarque_bera_normality`` (normality): if the error VARIANCE
    drifts over time, the trend line's CI is wrong even when the fit
    looks clean. Verdict vs the frozen χ²₁ 95% value (one auxiliary
    regressor).

    Scale posture: one combinable daily aggregate; residuals from the
    broadcast OLS sums; u = e²/(SSR/n) is nano-rounded PER DAY before
    the exact second-pass sums (order immunity; standardizing keeps u
    O(1), so no integer-overflow cliff at any revenue scale); BP is
    one fixed double expression. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    xy = daily.join(F.broadcast(mind)).select(
        "d", "y", F.datediff("d", "d0").cast("bigint").alias("x")
    )
    d38 = "DECIMAL(38,0)"
    sums = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * y) AS {d38})").alias("sxy"),
    )
    resid = xy.join(F.broadcast(sums)).select(
        "x",
        F.expr(
            f"CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT)"
        ).alias("e"),
    )
    scale_ = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.expr(f"CAST(SUM(CAST(e AS {d38}) * e) AS {d38})").alias("see"),
    )
    u = resid.join(F.broadcast(scale_)).select(
        "x",
        F.expr(
            "CAST(ROUND(CAST(e AS DOUBLE) * e"
            " / (CAST(see AS DOUBLE) / ns) * 1000000000) AS BIGINT)"
        ).alias("un"),
    )
    bp = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(un) AS {d38})").alias("su"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * un) AS {d38})").alias("sxu"),
        F.expr(f"CAST(SUM(CAST(un AS {d38}) * un) AS {d38})").alias("suu"),
    )
    bp_expr = (
        "CAST(n AS DOUBLE)"
        " * POW(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2)"
        " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " * (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su))"
    )
    return bp.where(
        "n > 3 AND (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)"
        " > 0e0"
    ).select(
        F.col("n").alias("n_days"),
        F.expr(f"ROUND({bp_expr}, 6)").alias("bp_statistic"),
        F.expr(f"({bp_expr}) > {_BP_CHI2_1}").alias("heteroscedastic"),
    )




# ---------------------------------------------------------------------------
# Chow test: structural break in the revenue trend at the midpoint
# ---------------------------------------------------------------------------

_CHOW_F_CRIT = 2.9957325  # F(2, inf) 95% = chi^2_2 / 2 (frozen)




def _chow_ssr(prefix: str) -> str:
    """SSR of a simple OLS fit from (n, sx, sy, sxx, sxy, syy) sums
    with column prefix ``prefix`` — one shared fixed expression."""
    p = prefix
    b = (
        f"((CAST(n{p} AS DOUBLE) * sxy{p}"
        f" - CAST(sx{p} AS DOUBLE) * sy{p})"
        f" / (CAST(n{p} AS DOUBLE) * sxx{p}"
        f" - CAST(sx{p} AS DOUBLE) * sx{p}))"
    )
    a = f"((CAST(sy{p} AS DOUBLE) - {b} * sx{p}) / n{p})"
    return (
        f"(CAST(syy{p} AS DOUBLE) - {a} * sy{p} - {b} * sxy{p})"
    )




_CHOW_F = (
    "((" + _chow_ssr("p") + " - " + _chow_ssr("1") + " - "
    + _chow_ssr("2") + ") / 2e0)"
    " / ((" + _chow_ssr("1") + " + " + _chow_ssr("2") + ")"
    " / (CAST(np AS DOUBLE) - 4e0))"
)




@register(
    "chow_test_midpoint",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT y, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                     AS BIGINT) AS x,
             ROW_NUMBER() OVER (ORDER BY d) AS rn,
             COUNT(*) OVER () AS nd
      FROM daily
    ),
    halves AS (
      SELECT x, y, CASE WHEN rn * 2 <= nd THEN 1 ELSE 2 END AS h FROM xy
    ),
    g AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM halves GROUP BY h
    ),
    wide AS (
      SELECT
        CAST(SUM(n) AS BIGINT) AS np,
        CAST(SUM(sx) AS HUGEINT) AS sxp, CAST(SUM(sy) AS HUGEINT) AS syp,
        CAST(SUM(sxx) AS HUGEINT) AS sxxp,
        CAST(SUM(sxy) AS HUGEINT) AS sxyp,
        CAST(SUM(syy) AS HUGEINT) AS syyp,
        MAX(CASE WHEN h = 1 THEN n END) AS n1,
        MAX(CASE WHEN h = 1 THEN sx END) AS sx1,
        MAX(CASE WHEN h = 1 THEN sy END) AS sy1,
        MAX(CASE WHEN h = 1 THEN sxx END) AS sxx1,
        MAX(CASE WHEN h = 1 THEN sxy END) AS sxy1,
        MAX(CASE WHEN h = 1 THEN syy END) AS syy1,
        MAX(CASE WHEN h = 2 THEN n END) AS n2,
        MAX(CASE WHEN h = 2 THEN sx END) AS sx2,
        MAX(CASE WHEN h = 2 THEN sy END) AS sy2,
        MAX(CASE WHEN h = 2 THEN sxx END) AS sxx2,
        MAX(CASE WHEN h = 2 THEN sxy END) AS sxy2,
        MAX(CASE WHEN h = 2 THEN syy END) AS syy2
      FROM g
    )
    SELECT np AS n_days,
           ROUND({_chow_ssr("p")}, 4) AS ssr_pooled,
           ROUND({_chow_ssr("1")} + {_chow_ssr("2")}, 4) AS ssr_split,
           ROUND({_CHOW_F}, 6) AS f_statistic,
           ({_CHOW_F}) > {_CHOW_F_CRIT} AS structural_break
    FROM wide
    WHERE n1 > 2 AND n2 > 2 AND ({_chow_ssr("1")} + {_chow_ssr("2")}) > 0e0
    """,
)
def chow_test_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test for a structural break in the daily-revenue trend at
    the series MIDPOINT: fit the line pooled and per half, F =
    ((SSR_p − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4)) — the TEST for a
    hypothesized break that ``changepoint_binseg`` locates by search
    (binseg finds the best cut; Chow says whether a GIVEN cut's
    improvement is beyond chance). Both halves' OLS derive from the
    same six exact integer sums via one shared SSR rendering. Verdict vs frozen F(2, ∞) = χ²₂/2
    (conservative at finite n, the family convention).

    Scale posture: one combinable daily aggregate; the midpoint split
    uses the calendar-bounded ROW_NUMBER; a 2-row group pivot; every
    SSR/F is a fixed-operand-order double over exact DECIMAL(38)
    sums. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    wd = Window.orderBy("d")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    xy = daily.join(F.broadcast(mind)).select(
        "y",
        F.datediff("d", "d0").cast("bigint").alias("x"),
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nd"),
    )
    halves = xy.select(
        "x",
        "y",
        F.expr("CASE WHEN rn * 2 <= nd THEN 1 ELSE 2 END").alias("h"),
    )
    d38 = "DECIMAL(38,0)"
    g = halves.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * y) AS {d38})").alias("sxy"),
        F.expr(f"CAST(SUM(CAST(y AS {d38}) * y) AS {d38})").alias("syy"),
    )
    pivot_exprs = [
        F.expr("CAST(SUM(n) AS BIGINT)").alias("np"),
        F.expr(f"CAST(SUM(sx) AS {d38})").alias("sxp"),
        F.expr(f"CAST(SUM(sy) AS {d38})").alias("syp"),
        F.expr(f"CAST(SUM(sxx) AS {d38})").alias("sxxp"),
        F.expr(f"CAST(SUM(sxy) AS {d38})").alias("sxyp"),
        F.expr(f"CAST(SUM(syy) AS {d38})").alias("syyp"),
    ]
    for hh in (1, 2):
        for c in ("n", "sx", "sy", "sxx", "sxy", "syy"):
            pivot_exprs.append(
                F.expr(f"MAX(CASE WHEN h = {hh} THEN {c} END)").alias(
                    f"{c}{hh}"
                )
            )
    wide = g.agg(*pivot_exprs)
    return wide.where(
        f"n1 > 2 AND n2 > 2 AND ({_chow_ssr('1')} + {_chow_ssr('2')}) > 0e0"
    ).select(
        F.col("np").alias("n_days"),
        F.expr(f"ROUND({_chow_ssr('p')}, 4)").alias("ssr_pooled"),
        F.expr(
            f"ROUND({_chow_ssr('1')} + {_chow_ssr('2')}, 4)"
        ).alias("ssr_split"),
        F.expr(f"ROUND({_CHOW_F}, 6)").alias("f_statistic"),
        F.expr(f"({_CHOW_F}) > {_CHOW_F_CRIT}").alias("structural_break"),
    )




# ---------------------------------------------------------------------------
# Cook's distance: the most influential days for the revenue trend
# ---------------------------------------------------------------------------


@register(
    "cooks_distance_top_days",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT d, y, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                        AS BIGINT) AS x
      FROM daily
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM xy
    ),
    resid AS (
      SELECT d, x,
             CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT) AS e,
             n, sx, sxx
      FROM xy CROSS JOIN sums
    ),
    s2 AS (
      SELECT CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS see,
             CAST(COUNT(*) AS BIGINT) AS nn
      FROM resid
    ),
    dcook AS (
      SELECT r.d, r.e,
             (1e0 / r.n
              + POW(r.x - CAST(r.sx AS DOUBLE) / r.n, 2)
                / (CAST(r.sxx AS DOUBLE)
                   - (CAST(r.sx AS DOUBLE) / r.n) * r.sx)) AS h
      FROM resid r
    )
    SELECT STRFTIME(dc.d, '%Y-%m-%d') AS day,
           dc.e AS residual_cents,
           ROUND(dc.h, 6) AS leverage,
           ROUND(CAST(dc.e AS DOUBLE) * dc.e * dc.h
                 / (2e0 * (CAST(s.see AS DOUBLE) / (s.nn - 2))
                    * POW(1e0 - dc.h, 2)), 6) AS cooks_d
    FROM dcook dc CROSS JOIN s2 s
    ORDER BY CAST(dc.e AS DOUBLE) * dc.e * dc.h
             / (2e0 * (CAST(s.see AS DOUBLE) / (s.nn - 2))
                * POW(1e0 - dc.h, 2)) DESC, dc.d ASC
    LIMIT 5
    """,
)
def cooks_distance_top_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the daily-revenue trend: the five days
    whose removal would move the fitted line the most, D_i =
    e_i²·h_ii/(p·s²·(1−h_ii)²) with the simple-regression leverage
    h_ii = 1/n + (x_i−x̄)²/Sxx and p = 2 — the influence diagnostic
    completing the OLS audit set (DW/JB/BP test assumptions; Cook's D
    names the OFFENDING days for a human to inspect). A single
    outlier day at the series edge (high leverage AND high residual)
    dominates; the top-5 cut is deterministic (D desc, day asc).

    Scale posture: one combinable daily aggregate, broadcast OLS
    sums, per-day closed-form leverage — and the cut compiles to
    TakeOrderedAndProject over the calendar-bounded table (never a
    global sort of anything input-sized). Five output rows.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    xy = daily.join(F.broadcast(mind)).select(
        "d", "y", F.datediff("d", "d0").cast("bigint").alias("x")
    )
    d38 = "DECIMAL(38,0)"
    sums = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * y) AS {d38})").alias("sxy"),
    )
    resid = xy.join(F.broadcast(sums)).select(
        "d",
        "x",
        F.expr(
            f"CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT)"
        ).alias("e"),
        "n",
        "sx",
        "sxx",
    )
    s2 = resid.agg(
        F.expr(f"CAST(SUM(CAST(e AS {d38}) * e) AS {d38})").alias("see"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    h_expr = (
        "(1e0 / n + POW(x - CAST(sx AS DOUBLE) / n, 2)"
        " / (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * sx))"
    )
    d_expr = (
        f"CAST(e AS DOUBLE) * e * {h_expr}"
        " / (2e0 * (CAST(see AS DOUBLE) / (nn - 2))"
        f" * POW(1e0 - {h_expr}, 2))"
    )
    return (
        resid.join(F.broadcast(s2))
        .orderBy(F.expr(d_expr).desc(), F.col("d").asc())
        .limit(5)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("e").alias("residual_cents"),
            F.expr(f"ROUND({h_expr}, 6)").alias("leverage"),
            F.expr(f"ROUND({d_expr}, 6)").alias("cooks_d"),
        )
    )




# ---------------------------------------------------------------------------
# Pettitt changepoint test on daily revenue (rank-based)
# ---------------------------------------------------------------------------

# ln(2/0.05) = ln(40) x 1e7 (frozen): p = 2 exp(-6K^2/(n^3+n^2)) < .05
# <=> 6 K^2 > ln(40) (n^3+n^2), cleared by 1e7 into exact integers
# (the pin caught BOTH an identity-scale and a clearing error here)
_PETTITT_LN40_X1E7 = 36_888_795




@register(
    "pettitt_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM orders GROUP BY 1
    ),
    vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ct FROM daily GROUP BY v),
    cum AS (
      SELECT v, ct,
             SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ct
               AS before_t
      FROM vt
    ),
    r2 AS (
      SELECT dy.d, 2 * c.before_t + c.ct + 1 AS r2v
      FROM daily dy JOIN cum c ON c.v = dy.v
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    walk AS (
      SELECT d,
             SUM(r2v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               - ROW_NUMBER() OVER (ORDER BY d) * (n + 1) AS w
      FROM r2 CROSS JOIN tot
    ),
    k AS (
      SELECT CAST(MAX(ABS(w)) AS BIGINT) AS k2 FROM walk
    ),
    peak AS (
      SELECT MIN(w.d) AS change_day
      FROM walk w CROSS JOIN k
      WHERE ABS(w.w) = k.k2
    )
    SELECT t.n AS n_days,
           k.k2 AS k_statistic,
           STRFTIME(p.change_day, '%Y-%m-%d') AS change_day,
           -- 6*K^2 > ln40*(n^3+n^2), cleared by 1e7 on both sides
           (60000000 * CAST(k.k2 AS HUGEINT) * k.k2
            > {_PETTITT_LN40_X1E7}
              * (CAST(t.n AS HUGEINT) * t.n * t.n
                 + CAST(t.n AS HUGEINT) * t.n)) AS significant
    FROM k CROSS JOIN peak p CROSS JOIN tot t
    WHERE t.n > 2
    """,
)
def pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric changepoint test on daily revenue:
    K = max_t |U_t| where U_t is the Mann-Whitney statistic of the
    before/after-t split, computed WITHOUT the O(n²) pair enumeration
    via the rank identity |U_t| = |Σ_{{i≤t}}(2r_i) − t(n+1)| (average
    ranks from the value histogram keep 2r exact, tie pairs cancel —
    verified against the O(n²) definition in the pin). The rank-based complement to
    ``changepoint_binseg`` (mean-shift in value space) and the TEST
    ``page_hinkley_drift`` does not provide; change_day is the
    deterministic (earliest) argmax. Verdict via the exact cross-
    multiplied integer form of p = 2·exp(−6K²/(n³+n²)) < 0.05 with
    the frozen ln 40 literal — no EXP at runtime.

    Scale posture: one combinable daily aggregate; average ranks from
    a banded histogram prefix; the W walk and argmax run over the
    calendar-bounded series; all quantities exact integers. One
    output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    vt = daily.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vt.select(
        "v", "ct", (F.sum("ct").over(wv) - F.col("ct")).alias("before_t")
    )
    r2 = daily.join(cum, "v").select(
        "d", (2 * F.col("before_t") + F.col("ct") + 1).alias("r2v")
    )
    tot = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wd = Window.orderBy("d")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    walk = r2.join(F.broadcast(tot)).select(
        "d",
        (
            F.sum("r2v").over(wcum)
            - F.row_number().over(wd) * (F.col("n") + 1)
        ).alias("w"),
    )
    k = walk.agg(F.max(F.abs(F.col("w"))).cast("bigint").alias("k2"))
    peak = (
        walk.join(F.broadcast(k), F.abs(F.col("w")) == F.col("k2"))
        .agg(F.min("d").alias("change_day"))
    )
    d38 = "DECIMAL(38,0)"
    return (
        k.join(F.broadcast(peak))
        .join(F.broadcast(tot))
        .where("n > 2")
        .select(
            F.col("n").alias("n_days"),
            F.col("k2").alias("k_statistic"),
            F.date_format("change_day", "yyyy-MM-dd").alias("change_day"),
            F.expr(
                f"60000000 * CAST(k2 AS {d38}) * k2"
                f" > {_PETTITT_LN40_X1E7}"
                f" * (CAST(n AS {d38}) * n * n + CAST(n AS {d38}) * n)"
            ).alias("significant"),
        )
    )




# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test: weekend vs weekday value per user
# ---------------------------------------------------------------------------


@register(
    "wilcoxon_signed_rank",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             AVG(CASE WHEN CAST(EXTRACT(dow FROM ts) AS INT) IN (0, 6)
                      THEN "value" END) AS we,
             AVG(CASE WHEN CAST(EXTRACT(dow FROM ts) AS INT) NOT IN (0, 6)
                      THEN "value" END) AS wd
      FROM events WHERE "value" IS NOT NULL
      GROUP BY user_id
    ),
    diffs AS (
      SELECT CAST(ROUND((we - wd) * 1000000) AS BIGINT) AS dm
      FROM per_user WHERE we IS NOT NULL AND wd IS NOT NULL
    ),
    h AS (
      SELECT ABS(dm) AS ad,
             CAST(SUM(CASE WHEN dm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             CAST(SUM(CASE WHEN dm < 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM diffs WHERE dm <> 0 GROUP BY ABS(dm)
    ),
    cum AS (
      SELECT ad, cp, cn, cp + cn AS ct,
             SUM(cp + cn) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING)
               - (cp + cn) AS before_t
      FROM h
    ),
    agg AS (
      SELECT CAST(SUM(cp + cn) AS BIGINT) AS n,
             CAST(SUM(cp) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(cp AS HUGEINT) * (2 * before_t + ct + 1))
                  AS HUGEINT) AS w2p,
             CAST(SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS HUGEINT)
               AS tsum
      FROM cum
    )
    SELECT n AS n_users, n_pos,
           ROUND(CAST(w2p AS DOUBLE) / 2e0, 1) AS w_plus,
           ROUND((CAST(w2p AS DOUBLE) / 2e0
                  - CAST(n AS DOUBLE) * (n + 1) / 4e0)
                 / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2e0 * n + 1) / 24e0
                        - CAST(tsum AS DOUBLE) / 48e0), 6) AS z_score,
           ABS((CAST(w2p AS DOUBLE) / 2e0
                - CAST(n AS DOUBLE) * (n + 1) / 4e0)
               / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2e0 * n + 1) / 24e0
                      - CAST(tsum AS DOUBLE) / 48e0)) > {_MK_Z975}
             AS significant
    FROM agg WHERE n > 1
      AND (CAST(n AS DOUBLE) * (n + 1) * (2e0 * n + 1) / 24e0
           - CAST(tsum AS DOUBLE) / 48e0) > 0e0
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on each user's weekend-vs-weekday
    mean event value — the PAIRED continuous test completing the
    family (``mann_whitney_u`` is unpaired, ``mcnemar_weekday_weekend``
    is paired-binary): each user is their own control, so
    between-user level differences cancel. Zero diffs drop (standard
    convention), |d| average-ranks come EXACTLY from the micro-unit
    diff histogram (2·W⁺ = Σ cp(2·before + t + 1) stays integer), the
    normal approximation carries the full Σ(t³−t)/48 tie correction;
    verdict vs the frozen two-sided 95% normal quantile.

    Scale posture: one per-user collapse; diffs micro-rounded through
    ONE shared double expression then histogram-collapsed; the rank
    walk is a banded prefix over the bounded histogram (the MWU
    policy); one output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    dow = (F.dayofweek("ts") - 1).cast("int")
    per_user = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.avg(F.when(dow.isin(0, 6), F.col("value"))).alias("we"),
            F.avg(F.when(~dow.isin(0, 6), F.col("value"))).alias("wd"),
        )
    )
    diffs = per_user.where(
        "we IS NOT NULL AND wd IS NOT NULL"
    ).select(
        F.expr("CAST(ROUND((we - wd) * 1000000) AS BIGINT)").alias("dm")
    )
    h = (
        diffs.where("dm <> 0")
        .groupBy(F.abs("dm").alias("ad"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN dm > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("cp"),
            F.expr(
                "CAST(SUM(CASE WHEN dm < 0 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("cn"),
        )
    )
    wv = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "cp",
        "cn",
        (F.col("cp") + F.col("cn")).alias("ct"),
        (
            F.sum(F.col("cp") + F.col("cn")).over(wv)
            - (F.col("cp") + F.col("cn"))
        ).alias("before_t"),
    )
    d38 = "DECIMAL(38,0)"
    agg = cum.agg(
        F.expr("CAST(SUM(cp + cn) AS BIGINT)").alias("n"),
        F.sum("cp").cast("bigint").alias("n_pos"),
        F.expr(
            f"CAST(SUM(CAST(cp AS {d38}) * (2 * before_t + ct + 1))"
            f" AS {d38})"
        ).alias("w2p"),
        F.expr(
            f"CAST(SUM(CAST(ct AS {d38}) * ct * ct - ct) AS {d38})"
        ).alias("tsum"),
    )
    z = (
        "(CAST(w2p AS DOUBLE) / 2e0"
        " - CAST(n AS DOUBLE) * (n + 1) / 4e0)"
        " / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2e0 * n + 1) / 24e0"
        " - CAST(tsum AS DOUBLE) / 48e0)"
    )
    var = (
        "(CAST(n AS DOUBLE) * (n + 1) * (2e0 * n + 1) / 24e0"
        " - CAST(tsum AS DOUBLE) / 48e0)"
    )
    return agg.where(f"n > 1 AND {var} > 0e0").select(
        F.col("n").alias("n_users"),
        "n_pos",
        F.expr("ROUND(CAST(w2p AS DOUBLE) / 2e0, 1)").alias("w_plus"),
        F.expr(f"ROUND({z}, 6)").alias("z_score"),
        F.expr(f"ABS({z}) > {_MK_Z975}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# AR(1) mean-reversion half-life of daily revenue
# ---------------------------------------------------------------------------


@register(
    "mean_reversion_half_life",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT x AS y, LAG(x) OVER (ORDER BY d) AS x1 FROM daily
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM lagged WHERE x1 IS NOT NULL
    ),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS phi
      FROM sums
      WHERE (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0e0
    )
    SELECT n AS n_days,
           ROUND(phi, 6) AS ar1_phi,
           CASE WHEN phi > 0e0 AND phi < 1e0
                THEN ROUND(-0.6931471805599453e0 / LN(phi), 4) END
             AS half_life_days,
           (phi > 0e0 AND phi < 1e0) AS mean_reverting
    FROM fit WHERE n > 2
    """,
)
def mean_reversion_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) mean-reversion half-life of daily revenue: fit
    x_t = α + φ·x_{{t−1}}, and for 0 < φ < 1 report ln(½)/ln(φ) — "a
    shock decays to half in H days", the continuous-time reading of
    the same persistence ``daily_acf_curve`` shows discretely and
    ``hurst_rs_exponent`` shows as a scaling law. φ ≥ 1 (random-walk
    or explosive) yields NULL half-life with the flag false —
    identical in both engines. The ln 2 numerator is a frozen
    literal; LN(φ) is one shared-operand transcendental.

    Scale posture: one combinable daily aggregate, one LAG walk over
    the calendar-bounded series, one 5-sum reduction, fixed double
    expressions. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    lagged = daily.select(
        F.col("x").alias("y"), F.lag("x").over(wd).alias("x1")
    ).where("x1 IS NOT NULL")
    d38 = "DECIMAL(38,0)"
    sums = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x1) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d38}) * x1) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d38}) * y) AS {d38})").alias("sxy"),
    )
    phi = (
        "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
    )
    return sums.where(
        "n > 2 AND (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " > 0e0"
    ).select(
        F.col("n").alias("n_days"),
        F.expr(f"ROUND({phi}, 6)").alias("ar1_phi"),
        F.expr(
            f"CASE WHEN {phi} > 0e0 AND {phi} < 1e0"
            f" THEN ROUND(-0.6931471805599453e0 / LN({phi}), 4) END"
        ).alias("half_life_days"),
        F.expr(f"({phi} > 0e0 AND {phi} < 1e0)").alias("mean_reverting"),
    )




# ---------------------------------------------------------------------------
# Diebold-Mariano: naive-1 vs seasonal-naive-7 forecast comparison
# ---------------------------------------------------------------------------


@register(
    "diebold_mariano_forecasts",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT x,
             LAG(x, 1) OVER (ORDER BY d) AS p1,
             LAG(x, 7) OVER (ORDER BY d) AS p7
      FROM daily
    ),
    dt AS (
      -- loss differential in squared-error, scaled to dollar^2 units
      -- and rounded to integers (cents^2 would overflow the square)
      SELECT CAST(ROUND((CAST(x - p1 AS DOUBLE) * (x - p1)
                         - CAST(x - p7 AS DOUBLE) * (x - p7)) / 1e4)
                  AS BIGINT) AS dd
      FROM lagged WHERE p1 IS NOT NULL AND p7 IS NOT NULL
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dd) AS HUGEINT) AS sd,
             CAST(SUM(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sdd
      FROM dt
    )
    SELECT n AS n_days,
           ROUND(CAST(sd AS DOUBLE) / n, 4) AS mean_loss_diff_usd2,
           ROUND((CAST(sd AS DOUBLE) / n)
                 / SQRT(GREATEST((CAST(sdd AS DOUBLE)
                                  - (CAST(sd AS DOUBLE) / n) * sd)
                                 / (n - 1), 1e0) / n), 6) AS dm_statistic,
           ABS((CAST(sd AS DOUBLE) / n)
               / SQRT(GREATEST((CAST(sdd AS DOUBLE)
                                - (CAST(sd AS DOUBLE) / n) * sd)
                               / (n - 1), 1e0) / n)) > {_MK_Z975}
             AS significant
    FROM mom WHERE n > 2
    """,
)
def diebold_mariano_forecasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano test (lag-0 variance variant, documented)
    comparing the naive-1 forecast (yesterday) against the
    seasonal-naive-7 (same weekday last week) for daily revenue:
    d_t = e₁² − e₇², DM = d̄/√(Var(d)/n). DM significantly NEGATIVE
    means yesterday beats last-week-same-day (weak weekly
    seasonality); positive means the weekly anchor wins — the formal
    verdict on the comparison ``rolling_forecast_error`` only
    tabulates. Squared-error losses scale to integer dollar² units
    before the exact sums.

    Scale posture: one combinable daily aggregate, two LAGs over the
    calendar-bounded series, one 3-sum reduction, fixed double
    expressions. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(wd).alias("p1"),
        F.lag("x", 7).over(wd).alias("p7"),
    )
    dt = lagged.where("p1 IS NOT NULL AND p7 IS NOT NULL").select(
        F.expr(
            "CAST(ROUND((CAST(x - p1 AS DOUBLE) * (x - p1)"
            " - CAST(x - p7 AS DOUBLE) * (x - p7)) / 1e4) AS BIGINT)"
        ).alias("dd")
    )
    d38 = "DECIMAL(38,0)"
    mom = dt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(dd) AS {d38})").alias("sd"),
        F.expr(f"CAST(SUM(CAST(dd AS {d38}) * dd) AS {d38})").alias("sdd"),
    )
    dm = (
        "(CAST(sd AS DOUBLE) / n)"
        " / SQRT(GREATEST((CAST(sdd AS DOUBLE)"
        " - (CAST(sd AS DOUBLE) / n) * sd) / (n - 1), 1e0) / n)"
    )
    return mom.where("n > 2").select(
        F.col("n").alias("n_days"),
        F.expr("ROUND(CAST(sd AS DOUBLE) / n, 4)").alias(
            "mean_loss_diff_usd2"
        ),
        F.expr(f"ROUND({dm}, 6)").alias("dm_statistic"),
        F.expr(f"ABS({dm}) > {_MK_Z975}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# Cramér-von Mises and Kuiper two-sample statistics (click vs view)
# ---------------------------------------------------------------------------


@register(
    "cvm_kuiper_two_sample",
    oracle=f"""
    WITH h AS (
      SELECT CAST(ROUND("value" * 100) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
        AND "value" IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT v, ca + cb AS l,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ma,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS mb
      FROM h
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM h
    ),
    terms AS (
      SELECT c.l,
             CAST(c.ma AS HUGEINT) * t.nb - CAST(c.mb AS HUGEINT) * t.na
               AS dnum
      FROM cum c CROSS JOIN tot t
    ),
    agg AS (
      SELECT CAST(SUM(CAST(l AS HUGEINT) * dnum * dnum) AS HUGEINT)
               AS w2num,
             CAST(MAX(dnum) AS BIGINT) AS dplus_num,
             CAST(-MIN(dnum) AS BIGINT) AS dminus_num
      FROM terms
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           -- T = (nm/N^2) sum l (F1-F2)^2 = sum l dnum^2 / (nm N^2)
           -- with F1-F2 = dnum/(na nb)
           ROUND(CAST(a.w2num AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * t.nb
                    * (CAST(t.na AS DOUBLE) + t.nb)
                    * (CAST(t.na AS DOUBLE) + t.nb)), 6) AS cvm_t,
           ROUND((CAST(a.dplus_num AS DOUBLE)
                  + CAST(a.dminus_num AS DOUBLE))
                 / (CAST(t.na AS DOUBLE) * t.nb), 6) AS kuiper_v,
           (CAST(a.w2num AS DOUBLE)
            / (CAST(t.na AS DOUBLE) * t.nb
               * (CAST(t.na AS DOUBLE) + t.nb)
               * (CAST(t.na AS DOUBLE) + t.nb)) > 0.461)
             AS cvm_significant
    FROM agg a CROSS JOIN tot t
    WHERE t.na > 0 AND t.nb > 0
    """,
)
def cvm_kuiper_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises T and Kuiper V two-sample statistics between
    the click and view value distributions — T integrates the SQUARED
    ECDF gap over the pooled sample (between KS's sup and AD's
    tail-weighted integral; frozen asymptotic 5% point 0.461), V =
    D⁺ + D⁻ catches shifts in OPPOSITE directions at different
    quantiles that cancel in KS's single sup. Both ride the exact
    integer CDF cross-products of the ``ks_test_click_view_value``
    histogram — the full two-sample family (KS/AD/CvM/Kuiper/MWU) now
    reads off one shared stage shape.

    Scale posture: cents histogram collapse, banded prefix, exact
    HUGEINT/DECIMAL(38) cross-products; T's weighted sum and V's
    max/min reduce in one aggregate; one output row. The CvM
    normalization T = Σl·Δnum²/(n_a n_b N²) (with Δnum = m_a·n_b −
    m_b·n_a) is one fixed double expression — the pin recomputes T
    from explicit ECDFs, which caught a ×N collapse error in the
    first draft of this very expression.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    from rs_streamloader_spark.operators.quality import _banded_prefix

    ev = _S._t(spark, sf_dir, "events")["events"].filter(
        F.col("event_type").isin(_KS_A, _KS_B)
        & F.col("value").isNotNull()
    )
    h = ev.groupBy(
        F.round(F.col("value") * 100).cast("bigint").alias("v")
    ).agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    h = h.withColumn("l", F.col("ca") + F.col("cb"))
    cum = _banded_prefix(h, "v", "ca", "sum", "ca_below")
    cum = _banded_prefix(cum, "v", "cb", "sum", "cb_below")
    cum = cum.select(
        "l",
        (F.coalesce(F.col("ca_below"), F.lit(0)) + F.col("ca")).alias("ma"),
        (F.coalesce(F.col("cb_below"), F.lit(0)) + F.col("cb")).alias("mb"),
    )
    tot = h.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    d38 = "DECIMAL(38,0)"
    terms = cum.join(F.broadcast(tot)).select(
        "na",
        "nb",
        "l",
        F.expr(
            f"CAST(ma AS {d38}) * nb - CAST(mb AS {d38}) * na"
        ).alias("dnum"),
    )
    agg = terms.groupBy("na", "nb").agg(
        F.expr(
            f"CAST(SUM(CAST(l AS {d38}) * dnum * dnum) AS {d38})"
        ).alias("w2num"),
        F.expr("CAST(MAX(dnum) AS BIGINT)").alias("dplus_num"),
        F.expr("CAST(-MIN(dnum) AS BIGINT)").alias("dminus_num"),
    )
    cvm = (
        "CAST(w2num AS DOUBLE)"
        " / (CAST(na AS DOUBLE) * nb"
        " * (CAST(na AS DOUBLE) + nb) * (CAST(na AS DOUBLE) + nb))"
    )
    return agg.where("na > 0 AND nb > 0").select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr(f"ROUND({cvm}, 6)").alias("cvm_t"),
        F.expr(
            "ROUND((CAST(dplus_num AS DOUBLE) + CAST(dminus_num AS DOUBLE))"
            " / (CAST(na AS DOUBLE) * nb), 6)"
        ).alias("kuiper_v"),
        F.expr(f"({cvm}) > 0.461").alias("cvm_significant"),
    )




# ---------------------------------------------------------------------------
# Bartlett's test of variance homogeneity across priorities
# ---------------------------------------------------------------------------


@register(
    "bartlett_test",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS p,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS s_g,
             CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT)
                      * CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS ss_g
      FROM orders GROUP BY 1
    ),
    pieces AS (
      SELECT n_g,
             (CAST(ss_g AS DOUBLE)
              - (CAST(s_g AS DOUBLE) / n_g) * s_g) / (n_g - 1) AS var_g
      FROM g WHERE n_g > 1
    ),
    terms AS (
      SELECT n_g, var_g,
             CAST(ROUND((n_g - 1) * LN(var_g) * 1000000) AS BIGINT)
               AS lnvar_micro
      FROM pieces WHERE var_g > 0e0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND((n_g - 1) * var_g) AS HUGEINT))
                  AS HUGEINT) AS pooled_num,
             CAST(SUM(lnvar_micro) AS HUGEINT) AS slm,
             CAST(ROUND(SUM(1e0 / (n_g - 1)) * 1000000000) AS BIGINT)
               AS sinv_nano
      FROM terms
    )
    SELECT n AS n_orders, k AS n_groups,
           ROUND(((CAST(n AS DOUBLE) - k)
                  * LN(CAST(pooled_num AS DOUBLE) / (n - k))
                  - CAST(slm AS DOUBLE) / 1e6)
                 / (1e0 + (CAST(sinv_nano AS DOUBLE) / 1e9
                           - 1e0 / (n - k)) / (3e0 * (k - 1))), 6)
             AS bartlett_chi2,
           (((CAST(n AS DOUBLE) - k)
             * LN(CAST(pooled_num AS DOUBLE) / (n - k))
             - CAST(slm AS DOUBLE) / 1e6)
            / (1e0 + (CAST(sinv_nano AS DOUBLE) / 1e9
                      - 1e0 / (n - k)) / (3e0 * (k - 1))))
             > {_KW_CRIT} AS significant
    FROM agg WHERE k > 1 AND n > k
    """,
)
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of equal variances across the five order
    priorities — the PARAMETRIC (normality-sensitive) counterpart to
    ``levene_brown_forsythe``: more powerful under normality, and the
    DISAGREEMENT between the two is itself diagnostic (Bartlett fires
    on kurtosis that Brown-Forsythe ignores). χ² = [(N−k)ln s_p² −
    Σ(n_i−1)ln s_i²]/C with the standard correction C; verdict vs the
    frozen χ²₄ 95% value. Per-group (n_i−1)ln s_i² terms are
    micro-rounded before the cross-group exact sum; pooled-variance
    numerator rounds to integer cents² per group.

    Scale posture: one combinable 5-row aggregate of exact integer
    cents moments; the rest is bounded-row arithmetic with the only
    transcendental (LN) evaluated on shared-operand doubles. One
    output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    d38 = "DECIMAL(38,0)"
    g = orders.groupBy(F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.expr(
            f"CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS {d38})"
        ).alias("s_g"),
        F.expr(
            "CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            f" AS {d38}) * CAST(ROUND(o_totalprice * 100) AS BIGINT))"
            f" AS {d38})"
        ).alias("ss_g"),
    )
    pieces = g.where("n_g > 1").select(
        "n_g",
        F.expr(
            "(CAST(ss_g AS DOUBLE) - (CAST(s_g AS DOUBLE) / n_g) * s_g)"
            " / (n_g - 1)"
        ).alias("var_g"),
    )
    terms = pieces.where("var_g > 0e0").select(
        "n_g",
        "var_g",
        F.expr(
            "CAST(ROUND((n_g - 1) * LN(var_g) * 1000000) AS BIGINT)"
        ).alias("lnvar_micro"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.expr(
            f"CAST(SUM(CAST(ROUND((n_g - 1) * var_g) AS {d38}))"
            f" AS {d38})"
        ).alias("pooled_num"),
        F.expr(f"CAST(SUM(lnvar_micro) AS {d38})").alias("slm"),
        F.expr(
            "CAST(ROUND(SUM(1e0 / (n_g - 1)) * 1000000000) AS BIGINT)"
        ).alias("sinv_nano"),
    )
    chi2 = (
        "((CAST(n AS DOUBLE) - k)"
        " * LN(CAST(pooled_num AS DOUBLE) / (n - k))"
        " - CAST(slm AS DOUBLE) / 1e6)"
        " / (1e0 + (CAST(sinv_nano AS DOUBLE) / 1e9 - 1e0 / (n - k))"
        " / (3e0 * (k - 1)))"
    )
    return agg.where("k > 1 AND n > k").select(
        F.col("n").alias("n_orders"),
        F.col("k").alias("n_groups"),
        F.expr(f"ROUND({chi2}, 6)").alias("bartlett_chi2"),
        F.expr(f"({chi2}) > {_KW_CRIT}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# KPSS level-stationarity statistic (iid short-run variance variant)
# ---------------------------------------------------------------------------

_KPSS_CRIT_LEVEL = 0.463  # asymptotic 5% point, level case (frozen)




@register(
    "kpss_level_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM daily
    ),
    dev AS (
      SELECT d,
             CAST(ROUND((x - CAST(sx AS DOUBLE) / n) * 1000) AS BIGINT)
               AS dm
      FROM daily CROSS JOIN mom
    ),
    walk AS (
      SELECT SUM(CAST(dm AS HUGEINT))
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS st
      FROM dev
    ),
    s2 AS (
      SELECT CAST(SUM(st * st) AS HUGEINT) AS ss2 FROM walk
    )
    SELECT m.n AS n_days,
           ROUND(CAST(s.ss2 AS DOUBLE) / 1e6
                 / (CAST(m.n AS DOUBLE) * m.n
                    * ((CAST(m.sxx AS DOUBLE)
                        - (CAST(m.sx AS DOUBLE) / m.n) * m.sx) / m.n)),
                 6) AS kpss_statistic,
           (CAST(s.ss2 AS DOUBLE) / 1e6
            / (CAST(m.n AS DOUBLE) * m.n
               * ((CAST(m.sxx AS DOUBLE)
                   - (CAST(m.sx AS DOUBLE) / m.n) * m.sx) / m.n))
            > {_KPSS_CRIT_LEVEL}) AS nonstationary
    FROM s2 s CROSS JOIN mom m
    WHERE m.n > 2
      AND (CAST(m.sxx AS DOUBLE) - (CAST(m.sx AS DOUBLE) / m.n) * m.sx)
          > 0e0
    """,
)
def kpss_level_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS test of LEVEL stationarity for daily revenue (the
    short-run-iid variance variant, lag 0 — documented): η =
    ΣS_t²/(n²σ̂²) with S_t the cumulative mean-deviation. KPSS flips
    the null relative to the trend/changepoint family: here the NULL
    is stationarity and large η rejects it — run next to
    ``mann_kendall_trend`` (null: no trend) the two-test combination
    distinguishes trend-stationary from unit-root behaviour. Verdict
    vs the frozen asymptotic 5% level point 0.463.

    Scale posture: one combinable daily aggregate; deviations
    milli-cent-rounded before the exact DECIMAL(38) cumulative walk
    (the page_hinkley policy — BIGINT would overflow at large daily
    volumes); ΣS² exact; η one fixed double expression. One output
    row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    d38 = "DECIMAL(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
    )
    dev = daily.join(F.broadcast(mom)).select(
        "d",
        F.expr(
            "CAST(ROUND((x - CAST(sx AS DOUBLE) / n) * 1000) AS BIGINT)"
        ).alias("dm"),
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    walk = dev.select(
        F.sum(F.col("dm").cast("decimal(38,0)")).over(wd).alias("st")
    )
    s2 = walk.agg(F.expr(f"CAST(SUM(st * st) AS {d38})").alias("ss2"))
    eta = (
        "CAST(ss2 AS DOUBLE) / 1e6"
        " / (CAST(n AS DOUBLE) * n"
        " * ((CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * sx) / n))"
    )
    return (
        s2.join(F.broadcast(mom))
        .where(
            "n > 2 AND (CAST(sxx AS DOUBLE)"
            " - (CAST(sx AS DOUBLE) / n) * sx) > 0e0"
        )
        .select(
            F.col("n").alias("n_days"),
            F.expr(f"ROUND({eta}, 6)").alias("kpss_statistic"),
            F.expr(f"({eta}) > {_KPSS_CRIT_LEVEL}").alias("nonstationary"),
        )
    )




# ---------------------------------------------------------------------------
# Mood's median test across order priorities
# ---------------------------------------------------------------------------


@register(
    "moods_median_test",
    oracle=f"""
    WITH vals AS (
      SELECT o_orderpriority AS p,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ct FROM vals GROUP BY v),
    cum AS (
      SELECT v, SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
      FROM vt
    ),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM vt),
    med AS (
      SELECT MIN(v) AS m FROM cum CROSS JOIN tot
      WHERE cc >= (n + 1) // 2
    ),
    counts AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CASE WHEN v > (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS a_g
      FROM vals GROUP BY p
    ),
    marg AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(a_g) AS BIGINT) AS a
      FROM counts
    ),
    terms AS (
      SELECT CAST(ROUND((
               POW(c.a_g - CAST(m.a AS DOUBLE) * c.n_g / m.n, 2)
               / (CAST(m.a AS DOUBLE) * c.n_g / m.n)
               + POW((c.n_g - c.a_g)
                     - CAST(m.n - m.a AS DOUBLE) * c.n_g / m.n, 2)
                 / (CAST(m.n - m.a AS DOUBLE) * c.n_g / m.n)
               ) * 1000000000) AS BIGINT) AS t_nano
      FROM counts c CROSS JOIN marg m
      WHERE m.a > 0 AND m.a < m.n
    )
    SELECT (SELECT n FROM marg) AS n_orders,
           CAST(4 AS BIGINT) AS df,
           ROUND(SUM(t_nano) / 1e9, 6) AS chi2_statistic,
           (SUM(t_nano) > {_KW_CRIT} * 1000000000) AS significant
    FROM terms
    """,
)
def moods_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: does each priority put the same fraction of
    orders above the GRAND median price? The bluntest (and most
    outlier-immune) of the k-sample location tests — only the
    above/below-median indicator enters, so a single corrupt extreme
    value cannot move it at all, where ``kruskal_wallis_h`` shifts
    with every rank and ``anova_oneway_f`` with every cent. χ² over
    the 5×2 contingency vs expected proportional counts; verdict vs
    the frozen χ²₄ value on the exact nano term sum.

    Scale posture: the grand median is the exact histogram-prefix
    pick (the runs-test convention); per-group above/at-or-below
    counts are one combinable aggregate; per-group χ² terms
    nano-round before the exact cross-group sum. One output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    vals = orders.select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    vt = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vt.select("v", F.sum("ct").over(wv).alias("cc"))
    tot = vt.agg(F.sum("ct").cast("bigint").alias("n"))
    med = (
        cum.join(F.broadcast(tot))
        .where("cc >= (n + 1) div 2")
        .agg(F.min("v").alias("m"))
    )
    counts = (
        vals.join(F.broadcast(med))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.expr(
                "CAST(SUM(CASE WHEN v > m THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("a_g"),
        )
    )
    marg = counts.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("a_g").cast("bigint").alias("a"),
    )
    terms = (
        counts.join(F.broadcast(marg))
        .where("a > 0 AND a < n")
        .select(
            F.expr(
                "CAST(ROUND(("
                "POW(a_g - CAST(a AS DOUBLE) * n_g / n, 2)"
                " / (CAST(a AS DOUBLE) * n_g / n)"
                " + POW((n_g - a_g) - CAST(n - a AS DOUBLE) * n_g / n, 2)"
                " / (CAST(n - a AS DOUBLE) * n_g / n)"
                ") * 1000000000) AS BIGINT)"
            ).alias("t_nano"),
            "n",
        )
    )
    return terms.groupBy("n").agg(
        F.expr("ROUND(SUM(t_nano) / 1e9, 6)").alias("chi2_statistic"),
        F.expr(f"SUM(t_nano) > {_KW_CRIT} * 1000000000").alias(
            "significant"
        ),
    ).select(
        F.col("n").alias("n_orders"),
        F.lit(4).cast("bigint").alias("df"),
        "chi2_statistic",
        "significant",
    )




# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative test across priorities
# ---------------------------------------------------------------------------


@register(
    "jonckheere_terpstra",
    oracle=f"""
    WITH vals AS (
      SELECT {_CA_SCORE_CASE} AS s,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    h AS (
      SELECT v,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN s = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN s = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(SUM(CASE WHEN s = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
      FROM vals GROUP BY v
    ),
    -- per-value exclusive prefixes per group over the merged value
    -- order: 2*U_ij summed over all i<j collapses to one fixed
    -- 5-column expression per value (the MWU banded-prefix pattern,
    -- never a histogram pair join)
    cum AS (
      SELECT c1, c2, c3, c4, c5,
             SUM(c1) OVER w - c1 AS p1, SUM(c2) OVER w - c2 AS p2,
             SUM(c3) OVER w - c3 AS p3, SUM(c4) OVER w - c4 AS p4
      FROM h
      WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    pairs AS (
      SELECT CAST(SUM(
               CAST(c2 AS HUGEINT) * (2 * p1 + c1)
               + CAST(c3 AS HUGEINT) * (2 * (p1 + p2) + c1 + c2)
               + CAST(c4 AS HUGEINT) * (2 * (p1 + p2 + p3)
                                        + c1 + c2 + c3)
               + CAST(c5 AS HUGEINT) * (2 * (p1 + p2 + p3 + p4)
                                        + c1 + c2 + c3 + c4)
             ) AS HUGEINT) AS j2
      FROM cum
    ),
    gsz2 AS (
      SELECT 1 AS s, CAST(SUM(c1) AS BIGINT) AS sn FROM h
      UNION ALL SELECT 2, CAST(SUM(c2) AS BIGINT) FROM h
      UNION ALL SELECT 3, CAST(SUM(c3) AS BIGINT) FROM h
      UNION ALL SELECT 4, CAST(SUM(c4) AS BIGINT) FROM h
      UNION ALL SELECT 5, CAST(SUM(c5) AS BIGINT) FROM h
    ),
    sizes AS (
      SELECT CAST(SUM(sn) AS BIGINT) AS n,
             CAST(SUM(CAST(sn AS HUGEINT) * sn * (2 * sn + 3))
                  AS HUGEINT) AS s_term,
             CAST(SUM(CAST(sn AS HUGEINT) * sn) AS DOUBLE) AS sq2
      FROM gsz2
    )
    SELECT n AS n_orders,
           ROUND(CAST(j2 AS DOUBLE) / 2e0, 1) AS j_statistic,
           ROUND((CAST(j2 AS DOUBLE) / 2e0
                  - (CAST(n AS DOUBLE) * n - sq2) / 4e0)
                 / SQRT((CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)
                         - CAST(s_term AS DOUBLE)) / 72e0), 6) AS z_score,
           ABS((CAST(j2 AS DOUBLE) / 2e0
                - (CAST(n AS DOUBLE) * n - sq2) / 4e0)
               / SQRT((CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)
                       - CAST(s_term AS DOUBLE)) / 72e0)) > {_MK_Z975}
             AS significant
    FROM pairs CROSS JOIN sizes
    WHERE (CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)
           - CAST(s_term AS DOUBLE)) > 0e0
    """,
)
def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED location alternative
    across the five priorities (scores 1..5): J = Σ_{{i<j}} U_ij sums
    the pairwise Mann-Whitney masses in the hypothesized direction —
    strictly more powerful than ``kruskal_wallis_h`` when the
    alternative is monotone (the continuous cousin of
    ``cochran_armitage_trend``'s binary trend). Tie pairs count ½
    (2J stays an exact integer from the per-group value histograms);
    the normal approximation uses the standard no-tie variance
    [n²(2n+3) − Σnᵢ²(2nᵢ+3)]/72 (documented: price ties are ~0 of
    pair mass at cents granularity on this data).

    Scale posture: values collapse to ONE merged cents histogram with
    per-group count columns; all ten pairwise U masses come from one
    banded-prefix walk via a fixed 5-column expression per value (the
    MWU pattern — never a histogram pair join, which is quadratic in
    distinct prices); a 1-row reduction out. 2J and all counts are exact integers; z is one
    fixed double expression.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    vals = orders.select(
        F.expr(_CA_SCORE_CASE).alias("s"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    h = vals.groupBy("v").agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN s = {i} THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"c{i}")
            for i in range(1, 6)
        ]
    )
    d38 = "DECIMAL(38,0)"
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        *[F.col(f"c{i}") for i in range(1, 6)],
        *[
            (F.sum(f"c{i}").over(wv) - F.col(f"c{i}")).alias(f"p{i}")
            for i in range(1, 5)
        ],
    )
    pairs = cum.agg(
        F.expr(
            f"CAST(SUM(CAST(c2 AS {d38}) * (2 * p1 + c1)"
            f" + CAST(c3 AS {d38}) * (2 * (p1 + p2) + c1 + c2)"
            f" + CAST(c4 AS {d38}) * (2 * (p1 + p2 + p3) + c1 + c2 + c3)"
            f" + CAST(c5 AS {d38}) * (2 * (p1 + p2 + p3 + p4)"
            f" + c1 + c2 + c3 + c4)) AS {d38})"
        ).alias("j2")
    )
    gsz = vals.groupBy("s").agg(F.count(F.lit(1)).alias("sn"))
    sizes = gsz.agg(
        F.sum("sn").cast("bigint").alias("n"),
        F.expr(
            f"CAST(SUM(CAST(sn AS {d38}) * sn * (2 * sn + 3)) AS {d38})"
        ).alias("s_term"),
        F.expr(f"CAST(SUM(CAST(sn AS {d38}) * sn) AS DOUBLE)").alias("sq2"),
    )
    z = (
        "(CAST(j2 AS DOUBLE) / 2e0"
        " - (CAST(n AS DOUBLE) * n - sq2) / 4e0)"
        " / SQRT((CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)"
        " - CAST(s_term AS DOUBLE)) / 72e0)"
    )
    var = (
        "(CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)"
        " - CAST(s_term AS DOUBLE))"
    )
    return (
        pairs.join(F.broadcast(sizes))
        .where(f"{var} > 0e0")
        .select(
            F.col("n").alias("n_orders"),
            F.expr("ROUND(CAST(j2 AS DOUBLE) / 2e0, 1)").alias(
                "j_statistic"
            ),
            F.expr(f"ROUND({z}, 6)").alias("z_score"),
            F.expr(f"ABS({z}) > {_MK_Z975}").alias("significant"),
        )
    )




# ---------------------------------------------------------------------------
# Negative-binomial method-of-moments fit of daily counts per type
# ---------------------------------------------------------------------------


@register(
    "negative_binomial_fit",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT t.event_type, dy.d,
             CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM days dy CROSS JOIN types t
      LEFT JOIN (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
      ) c ON c.event_type = t.event_type AND c.d = dy.d
    ),
    mom AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS HUGEINT) AS sx,
             CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS sxx
      FROM counts GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / n AS mu,
             (CAST(sxx AS DOUBLE)
              - (CAST(sx AS DOUBLE) / n) * sx) / (n - 1) AS v
      FROM mom WHERE n > 1
    )
    SELECT event_type, n AS n_days,
           ROUND(mu, 6) AS mean_daily,
           ROUND(v, 6) AS var_daily,
           CASE WHEN v > mu THEN ROUND(mu * mu / (v - mu), 6) END
             AS nb_r,
           CASE WHEN v > mu THEN ROUND(mu / v, 6) END AS nb_p,
           (v > mu) AS overdispersed
    FROM fit
    ORDER BY event_type
    """,
)
def negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of the DAILY count
    distribution per event type: r = μ²/(σ²−μ), p = μ/σ² — the
    PARAMETERS behind the yes/no ``event_count_overdispersion``
    verdict (capacity planning needs the fitted tail, not just the
    flag: a small r means a heavy burst tail that a Poisson model
    underestimates). Zero-event days are densified in (absent days
    are real observations of 0). Under-dispersed types report NULL
    parameters with the flag false — identical both engines.

    Scale posture: one combinable (type, day) aggregate densified
    over the bounded type×calendar grid, exact integer moments, one
    bounded row per type; fixed double expressions.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    types = ev.select("event_type").distinct()
    raw = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    counts = (
        days.crossJoin(F.broadcast(types))
        .join(raw, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        )
    )
    d38 = "DECIMAL(38,0)"
    mom = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(cnt) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(cnt AS {d38}) * cnt) AS {d38})").alias(
            "sxx"
        ),
    )
    mu = "(CAST(sx AS DOUBLE) / n)"
    v = f"((CAST(sxx AS DOUBLE) - {mu} * sx) / (n - 1))"
    return (
        mom.where("n > 1")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.expr(f"ROUND({mu}, 6)").alias("mean_daily"),
            F.expr(f"ROUND({v}, 6)").alias("var_daily"),
            F.expr(
                f"CASE WHEN {v} > {mu} THEN"
                f" ROUND({mu} * {mu} / ({v} - {mu}), 6) END"
            ).alias("nb_r"),
            F.expr(
                f"CASE WHEN {v} > {mu} THEN ROUND({mu} / {v}, 6) END"
            ).alias("nb_p"),
            F.expr(f"({v} > {mu})").alias("overdispersed"),
        )
        .orderBy("event_type")
    )




# ---------------------------------------------------------------------------
# Sarle's bimodality coefficient of the event-value distribution
# ---------------------------------------------------------------------------

_BC_UNIFORM = 0.555556  # 5/9, the uniform-distribution benchmark (frozen)




@register(
    "bimodality_coefficient",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(ROUND("value" * 1000000000) AS BIGINT) AS vn
      FROM events WHERE "value" IS NOT NULL
    ),
    mom AS (
      SELECT COUNT(*) AS n, SUM(vn) AS sx,
             SUM(CAST(vn AS HUGEINT) * vn) AS sxx
      FROM vals
    ),
    z AS (
      SELECT n,
             CAST(ROUND(POW((vn / 1e9 - {_JB_MU}) / ({_JB_SIG}), 3)
                        * 1000000000) AS BIGINT) AS t3,
             CAST(ROUND(POW((vn / 1e9 - {_JB_MU}) / ({_JB_SIG}), 4)
                        * 1000000000) AS BIGINT) AS t4
      FROM vals CROSS JOIN mom
    ),
    agg AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(SUM(t3) AS HUGEINT) AS s3,
             CAST(SUM(t4) AS HUGEINT) AS s4
      FROM z GROUP BY n
    )
    SELECT n AS n_events,
           ROUND({_JB_SKEW}, 6) AS skewness,
           ROUND({_JB_XKURT} + 3e0, 6) AS kurtosis,
           ROUND((({_JB_SKEW}) * ({_JB_SKEW}) + 1e0)
                 / ({_JB_XKURT} + 3e0), 6) AS bimodality_coef,
           ((({_JB_SKEW}) * ({_JB_SKEW}) + 1e0) / ({_JB_XKURT} + 3e0))
             > {_BC_UNIFORM} AS bimodal_suspect
    FROM agg WHERE n > 1
    """,
)
def bimodality_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sarle's bimodality coefficient of the event-value distribution:
    BC = (S² + 1)/K — above the uniform benchmark 5/9 suggests two
    modes (a mixed population: e.g. organic values + bot values),
    which every single-mode summary in this family silently averages
    over. Rides the same standardized-moment machinery as
    ``jarque_bera_normality`` (there the moments test normality; here
    they screen for mixture structure — different question, different
    frozen threshold).

    Scale posture: two combinable passes (exact nano moments, then
    nano-rounded z³/z⁴ term sums — the JB policy); one output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    vals = ev.where(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 1_000_000_000).cast("bigint").alias("vn")
    )
    mom = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vn").alias("sx"),
        F.expr("SUM(CAST(vn AS DECIMAL(38,0)) * vn)").alias("sxx"),
    )
    z = vals.join(F.broadcast(mom)).select(
        "n",
        F.expr(
            f"CAST(ROUND(POW((vn / 1e9 - {_JB_MU}) / ({_JB_SIG}), 3)"
            " * 1000000000) AS BIGINT)"
        ).alias("t3"),
        F.expr(
            f"CAST(ROUND(POW((vn / 1e9 - {_JB_MU}) / ({_JB_SIG}), 4)"
            " * 1000000000) AS BIGINT)"
        ).alias("t4"),
    )
    agg = z.groupBy("n").agg(
        F.expr(
            "CAST(SUM(CAST(t3 AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("s3"),
        F.expr(
            "CAST(SUM(CAST(t4 AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("s4"),
    )
    bc = f"((({_JB_SKEW}) * ({_JB_SKEW}) + 1e0) / ({_JB_XKURT} + 3e0))"
    return agg.where("n > 1").select(
        F.col("n").cast("bigint").alias("n_events"),
        F.expr(f"ROUND({_JB_SKEW}, 6)").alias("skewness"),
        F.expr(f"ROUND({_JB_XKURT} + 3e0, 6)").alias("kurtosis"),
        F.expr(f"ROUND({bc}, 6)").alias("bimodality_coef"),
        F.expr(f"{bc} > {_BC_UNIFORM}").alias("bimodal_suspect"),
    )




# ---------------------------------------------------------------------------
# Hoover (Robin Hood) index of customer revenue
# ---------------------------------------------------------------------------


@register(
    "hoover_index",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS t
      FROM cust
    ),
    terms AS (
      SELECT CAST(ABS(CAST(rev AS HUGEINT) * n - t) AS HUGEINT) AS dev
      FROM cust CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n_customers,
           CAST((SELECT t FROM tot) AS BIGINT) AS total_cents,
           ROUND(CAST(SUM(dev) AS DOUBLE)
                 / (2e0 * (SELECT n FROM tot)
                    * CAST((SELECT t FROM tot) AS DOUBLE)), 6)
             AS hoover_index
    FROM terms
    """,
)
def hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of customer revenue: ½Σ|xᵢ/T − 1/n| —
    the FRACTION OF TOTAL REVENUE that would have to move between
    customers to equalize them, which is also the maximum vertical
    gap of the Lorenz curve (``lorenz_curve_points``). The most
    operationally interpretable member of the inequality family
    (gini/theil/atkinson/palma): "12% of revenue sits with the wrong
    customers relative to uniform". Every deviation |x·n − T| is an
    EXACT integer; one double division at the end.

    Scale posture: per-customer collapse, 1-row totals broadcast,
    one combinable absolute-deviation sum; no sort, no window, one
    output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    d38 = "DECIMAL(38,0)"
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(rev) AS {d38})").alias("t"),
    )
    terms = cust.join(F.broadcast(tot)).select(
        "n",
        "t",
        F.expr(f"CAST(ABS(CAST(rev AS {d38}) * n - t) AS {d38})").alias(
            "dev"
        ),
    )
    return terms.groupBy("n", "t").agg(
        F.expr(
            "ROUND(CAST(SUM(dev) AS DOUBLE)"
            " / (2e0 * n * CAST(t AS DOUBLE)), 6)"
        ).alias("hoover_index")
    ).select(
        F.col("n").alias("n_customers"),
        F.col("t").cast("bigint").alias("total_cents"),
        "hoover_index",
    )




# ---------------------------------------------------------------------------
# Bowley quartile skewness of order totals
# ---------------------------------------------------------------------------


@register(
    "bowley_quartile_skew",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ct FROM vals GROUP BY v),
    cum AS (
      SELECT v, SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
      FROM vt
    ),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM vt),
    q AS (
      SELECT
        (SELECT MIN(v) FROM cum CROSS JOIN tot
         WHERE cc >= (n + 3) // 4) AS q1,
        (SELECT MIN(v) FROM cum CROSS JOIN tot
         WHERE cc >= (n + 1) // 2) AS q2,
        (SELECT MIN(v) FROM cum CROSS JOIN tot
         WHERE cc >= (3 * n + 3) // 4) AS q3
    )
    SELECT (SELECT n FROM tot) AS n_orders,
           q1 AS q1_cents, q2 AS q2_cents, q3 AS q3_cents,
           CASE WHEN q3 > q1 THEN
             ROUND(CAST(q1 + q3 - 2 * q2 AS DOUBLE) / (q3 - q1), 6)
           END AS bowley_skew
    FROM q
    """,
)
def bowley_quartile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness of order totals: (Q₁+Q₃−2·Q₂)/
    (Q₃−Q₁) — the ROBUST skewness that ignores everything outside the
    quartiles, next to the moment skewness in
    ``jarque_bera_normality`` (one corrupt extreme value moves the
    moment version arbitrarily; Bowley not at all). Quartiles are
    exact PERCENTILE_DISC-convention histogram-index picks (ranks
    ⌈n/4⌉/⌈n/2⌉/⌈3n/4⌉, same machinery as the median tests); the
    statistic is one ratio of exact integers. Degenerate IQR = 0
    reports NULL identically in both engines.

    Scale posture: one cents-histogram collapse, a banded prefix,
    three broadcast rank picks, one output row; no raw-row sort.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    vt = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vt.select("v", F.sum("ct").over(wv).alias("cc"))
    tot = vt.agg(F.sum("ct").cast("bigint").alias("n"))
    j = cum.join(F.broadcast(tot))
    q1 = j.where("cc >= (n + 3) div 4").agg(F.min("v").alias("q1"))
    q2 = j.where("cc >= (n + 1) div 2").agg(F.min("v").alias("q2"))
    q3 = j.where("cc >= (3 * n + 3) div 4").agg(F.min("v").alias("q3"))
    return (
        q1.join(F.broadcast(q2))
        .join(F.broadcast(q3))
        .join(F.broadcast(tot))
        .select(
            F.col("n").alias("n_orders"),
            F.col("q1").alias("q1_cents"),
            F.col("q2").alias("q2_cents"),
            F.col("q3").alias("q3_cents"),
            F.expr(
                "CASE WHEN q3 > q1 THEN"
                " ROUND(CAST(q1 + q3 - 2 * q2 AS DOUBLE) / (q3 - q1), 6)"
                " END"
            ).alias("bowley_skew"),
        )
    )


