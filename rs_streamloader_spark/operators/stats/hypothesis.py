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
    anomaly_mad_days,
    chi2_event_type_dow,
    events_burstiness,
    gini_revenue_concentration,
    ols_daily_revenue_trend,
    seasonality_dow_index,
    weekly_seasonality_strength,
)
from rs_streamloader_spark.operators.stats.inference import (
    _KS_A,
    _KS_B,
    cusum_drift_daily,
    daily_acf_curve,
    kendall_tau_quantity_discount,
    ks_test_click_view_value,
    obrien_fleming_sequential,
    rolling_sum_range_frame,
    welch_t_click_view,
)




# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test with exact tie handling
# ---------------------------------------------------------------------------


@register(
    "mann_whitney_u",
    oracle=f"""
    WITH h AS (
      SELECT CAST(ROUND("value" * 100) AS BIGINT) AS v,
             SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
        AND "value" IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT v, ca, cb, ca + cb AS ct,
             SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               - (ca + cb) AS before_t
      FROM h
    ),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * (2 * before_t + ct + 1)) AS HUGEINT) AS r2a,
             CAST(SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS HUGEINT) AS tsum
      FROM cum
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
           ROUND(CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
                      - CAST(na AS HUGEINT) * nb AS DOUBLE)
                 / (CAST(na AS DOUBLE) * nb), 6) AS rank_biserial_r,
           ROUND(CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
                      - CAST(na AS HUGEINT) * nb AS DOUBLE)
                 / (2.0 * SQRT(
                     CAST(CAST(na AS HUGEINT) * nb
                          * (CAST(na + nb + 1 AS HUGEINT) * (na + nb)
                             * (na + nb - 1) - tsum) AS DOUBLE)
                     / CAST(12 * CAST(na + nb AS HUGEINT)
                            * (na + nb - 1) AS DOUBLE))), 6) AS z_approx
    FROM agg WHERE na > 1 AND nb > 1
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) test between the click
    and view value distributions — the nonparametric complement to
    ``welch_t_click_view`` (mean shift) and
    ``ks_test_click_view_value`` (sup-distance): U detects stochastic
    dominance without normality assumptions. Average-rank ties are
    handled EXACTLY via the merged value histogram (2·R_A = Σ
    ca·(2·before + t + 1) keeps rank sums integer), the normal
    approximation carries the full tie correction Σ(t³−t), and the
    rank-biserial r = 2U/(n_a·n_b) − 1 is the effect size.

    Scale posture: values collapse to a cents-keyed histogram (one
    aggregation), the rank walk is a single banded prefix over the
    bounded histogram, and the output is one row. Cross-engine
    determinism: every rank/tie quantity is an exact HUGEINT/
    DECIMAL(38) integer; the ONLY doubles are the final z and r with
    identical operand order and IEEE SQRT (correctly rounded in both
    engines), rounded to 6dp.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    h = (
        # NULL values dropped explicitly: the rank walk ORDER BY v
        # would otherwise diverge (Spark sorts NULLS FIRST, DuckDB
        # NULLS LAST) — latent on this corpus (zero NULLs), guarded
        ev.where(F.col("event_type").isin(_KS_A, _KS_B))
        .where(F.col("value").isNotNull())
        .groupBy(F.round(F.col("value") * 100).cast("bigint").alias("v"))
        .agg(
            F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias("cb"),
        )
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("ct"),
        (F.sum(F.col("ca") + F.col("cb")).over(wv) - (F.col("ca") + F.col("cb"))).alias(
            "before_t"
        ),
    )
    agg = cum.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.expr(
            "CAST(SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before_t + ct + 1))"
            " AS DECIMAL(38,0))"
        ).alias("r2a"),
        F.expr(
            "CAST(SUM(CAST(ct AS DECIMAL(38,0)) * ct * ct - ct)"
            " AS DECIMAL(38,0))"
        ).alias("tsum"),
    )
    d38 = "DECIMAL(38,0)"
    # 2*U_A with U_A = R_A - na(na+1)/2 (the click-sample U; the
    # common scipy convention). U_B = na*nb - U_A.
    u2 = f"r2a - CAST(na AS {d38}) * (na + 1)"
    delta = f"({u2}) - CAST(na AS {d38}) * nb"
    var_num = (
        f"CAST(na AS {d38}) * nb * (CAST(na + nb + 1 AS {d38}) * (na + nb)"
        f" * (na + nb - 1) - tsum)"
    )
    var_den = f"12 * CAST(na + nb AS {d38}) * (na + nb - 1)"
    return agg.where("na > 1 AND nb > 1").select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr(f"CAST({u2} AS BIGINT)").alias("u2"),
        F.expr(
            f"ROUND(CAST({delta} AS DOUBLE)"
            " / (CAST(na AS DOUBLE) * nb), 6)"
        ).alias("rank_biserial_r"),
        F.expr(
            f"ROUND(CAST({delta} AS DOUBLE)"
            f" / (2.0 * SQRT(CAST({var_num} AS DOUBLE)"
            f" / CAST({var_den} AS DOUBLE))), 6)"
        ).alias("z_approx"),
    )




# ---------------------------------------------------------------------------
# Standardized effect size (Cohen's d / Hedges' g)
# ---------------------------------------------------------------------------


def _cohens_d_oracle() -> str:
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
           ROUND(mu_a - mu_b, 6) AS mean_diff,
           ROUND(SQRT(((n_a - 1) * s_a * s_a + (n_b - 1) * s_b * s_b)
                      / (n_a + n_b - 2)), 6) AS pooled_sd,
           ROUND((mu_a - mu_b)
                 / SQRT(((n_a - 1) * s_a * s_a + (n_b - 1) * s_b * s_b)
                        / (n_a + n_b - 2)), 6) AS cohens_d,
           ROUND((mu_a - mu_b)
                 / SQRT(((n_a - 1) * s_a * s_a + (n_b - 1) * s_b * s_b)
                        / (n_a + n_b - 2))
                 * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)), 6) AS hedges_g
    FROM sides
    WHERE s_a > 0 AND s_b > 0
    """




@register("effect_size_cohens_d", oracle=_cohens_d_oracle())
def effect_size_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) and the
    small-sample-corrected Hedges' g between click and view values —
    the EFFECT SIZE that belongs next to every significance test in
    this family (``welch_t_click_view`` says whether the shift is
    real; d says whether it is big enough to matter — the number
    experiment reviews actually gate on).

    Scale posture: the same two combinable moment aggregates as
    Welch (functions/moments.py nano-unit policy — another consumer),
    then 1-row arithmetic. Cross-engine determinism: exact integer
    moments; fixed double expression order; the Hedges correction
    factor uses shared double literals; zero-variance sides drop the
    row (ANSI-safe).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
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
    pooled = F.sqrt(
        (
            (F.col("n_a") - 1) * F.col("s_a") * F.col("s_a")
            + (F.col("n_b") - 1) * F.col("s_b") * F.col("s_b")
        )
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    d = (F.col("mu_a") - F.col("mu_b")) / pooled
    return sides.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.col("mu_a") - F.col("mu_b"), 6).alias("mean_diff"),
        F.round(pooled, 6).alias("pooled_sd"),
        F.round(d, 6).alias("cohens_d"),
        F.round(
            d * (F.lit(1.0) - F.lit(3.0) / (4.0 * (F.col("n_a") + F.col("n_b")) - 9.0)),
            6,
        ).alias("hedges_g"),
    )




# ---------------------------------------------------------------------------
# Kaplan-Meier return-time survival (product-limit with censoring)
# ---------------------------------------------------------------------------


@register(
    "kaplan_meier_return_time",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS DATE) AS d FROM events
    ),
    hz AS (SELECT MAX(d) AS horizon FROM ev),
    spells AS (
      SELECT CASE WHEN nxt IS NULL THEN horizon - d ELSE nxt - d END AS t,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
      FROM (
        SELECT d, LEAD(d) OVER (PARTITION BY user_id
                                ORDER BY d, event_id) AS nxt
        FROM ev
      ) CROSS JOIN hz
    ),
    life AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d_t,
             CAST(SUM(1 - ev) AS BIGINT) AS c_t
      FROM spells GROUP BY t
    ),
    risk AS (
      SELECT t, d_t, c_t,
             CAST((SELECT COUNT(*) FROM spells)
                  - (SUM(d_t + c_t) OVER (ORDER BY t
                                          ROWS UNBOUNDED PRECEDING)
                     - (d_t + c_t)) AS BIGINT) AS n_t
      FROM life
    ),
    km AS (
      SELECT t, n_t, d_t, c_t,
             CASE WHEN d_t < n_t
                  THEN CAST(ROUND(LN(1.0 - CAST(d_t AS DOUBLE) / n_t)
                                  * 1000000000) AS BIGINT)
             END AS term
      FROM risk WHERE d_t > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days, n_t AS n_risk, d_t AS n_events,
           c_t AS n_censored_here,
           -- S(t) hits exact 0 where d = n (term NULL = ln 0): report
           -- NULL, not a partial sum that silently skips -inf
           CAST(CASE WHEN term IS NULL THEN NULL
                ELSE SUM(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                END AS BIGINT) AS log_surv_nano
    FROM km
    """,
)
def kaplan_meier_return_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator of the RETURN-TIME
    distribution: each event opens a spell that "dies" when the user's
    next event arrives (t = days until return) and is right-CENSORED
    at the corpus horizon when no next event exists — the censoring-
    aware answer to "how long until users come back" that a naive gap
    histogram gets wrong (dropping open spells biases return times
    short). Output: one row per observed death time with the risk set,
    deaths, same-day censorings, and the cumulative log-survival
    ln S(t) = Σ ln(1 − d/n) — reported in LOG space (nano units)
    because a final exp() is the one operation the cross-engine
    determinism policy cannot pin to the ulp.

    Scale posture: one LEAD window partitioned by user (the sessionize
    shuffle), a life-table aggregation to ≤ max-gap rows, and windows
    over that bounded frame; no joins beyond the 1-row horizon.
    Cross-engine determinism: spell times are exact integer day
    diffs; the LEAD order is pinned (date, event_id); each ln term is
    nano-rounded BEFORE the cumulative sum (transcendental-sum
    policy); the d = n final row reports NULL log-survival (ln 0)
    identically on both sides.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", F.col("ts").cast("date").alias("d")
    )
    hz = ev.agg(F.max("d").alias("horizon"))
    nxt = ev.select(
        "d",
        F.lead("d")
        .over(Window.partitionBy("user_id").orderBy("d", "event_id"))
        .alias("nxt"),
    )
    spells = nxt.crossJoin(F.broadcast(hz)).select(
        F.when(F.col("nxt").isNull(), F.datediff("horizon", "d"))
        .otherwise(F.datediff("nxt", "d"))
        .alias("t"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("ev"),
    )
    life = spells.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_t"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c_t"),
    )
    total = spells.agg(F.count(F.lit(1)).cast("bigint").alias("n_spells"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = life.crossJoin(F.broadcast(total)).select(
        "t",
        "d_t",
        "c_t",
        (
            F.col("n_spells")
            - (F.sum(F.col("d_t") + F.col("c_t")).over(wt) - (F.col("d_t") + F.col("c_t")))
        )
        .cast("bigint")
        .alias("n_t"),
    )
    km = risk.where(F.col("d_t") > 0).select(
        "t",
        "n_t",
        "d_t",
        "c_t",
        F.when(
            F.col("d_t") < F.col("n_t"),
            F.round(
                F.log(F.lit(1.0) - F.col("d_t").cast("double") / F.col("n_t"))
                * 1000000000
            ).cast("bigint"),
        ).alias("term"),
    )
    return km.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_t").alias("n_risk"),
        F.col("d_t").alias("n_events"),
        F.col("c_t").alias("n_censored_here"),
        F.when(F.col("term").isNotNull(), F.sum("term").over(wt))
        .cast("bigint")
        .alias("log_surv_nano"),
    )




# ---------------------------------------------------------------------------
# Fisher dispersion index of daily event counts (overdispersion audit)
# ---------------------------------------------------------------------------


@register(
    "event_count_overdispersion",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT t.event_type, dy.d,
             CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM types t CROSS JOIN days dy
      LEFT JOIN (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
      ) c ON c.event_type = t.event_type AND c.d = dy.d
    ),
    mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS sx,
             CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS sxx
      FROM counts GROUP BY event_type
    )
    SELECT event_type, n AS n_days, sx AS total_events,
           CAST(CAST(sx AS HUGEINT) * 1000000 // n AS BIGINT)
             AS mean_per_day_micro,
           ROUND(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                 / CAST((n - 1) * CAST(sx AS HUGEINT) AS DOUBLE), 6)
             AS dispersion_index,
           -- ratio > 1.5 decided on the EXACT rational (2*num > 3*den)
           2 * (n * sxx - CAST(sx AS HUGEINT) * sx)
             > 3 * ((n - 1) * CAST(sx AS HUGEINT)) AS overdispersed
    FROM mom WHERE n > 1 AND sx > 0
    """,
)
def event_count_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher dispersion index (variance-to-mean ratio) of DAILY event
    counts per event type, on the densified type×day grid (zero-count
    days included — dropping them understates variance): a Poisson
    arrival process has index ≈ 1, bursty/clumped traffic ≫ 1 — the
    standard screen for whether count models (and alert thresholds)
    can assume Poisson, next to the anomaly/CUSUM detectors. Index
    computed from exact integer moments as (n·Σx² − (Σx)²)/((n−1)·Σx);
    the >1.5 overdispersion flag is decided on the exact rational
    (2·num > 3·den), never on the rounded double.

    Scale posture: one (type, day) count aggregation (map-side
    combine), densified by a bounded types×days cross join, then one
    bounded moment aggregation per type. Cross-engine determinism:
    all-integer moments in HUGEINT/DECIMAL(38); the one double is the
    final 6dp display ratio; the flag is integer-exact.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    days = ev.select(F.col("ts").cast("date").alias("d")).distinct()
    types = ev.select("event_type").distinct()
    raw = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    counts = (
        types.crossJoin(days)
        .join(F.broadcast(raw), ["event_type", "d"], "left")
        .select(
            "event_type",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        )
    )
    mom = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("sx"),
        F.expr("CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0))")
        .alias("sxx"),
    )
    num = "n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
    den = "(n - 1) * CAST(sx AS DECIMAL(38,0))"
    return mom.where("n > 1 AND sx > 0").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sx").alias("total_events"),
        F.expr(
            "CAST(CAST(sx AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("mean_per_day_micro"),
        F.expr(
            f"ROUND(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE), 6)"
        ).alias("dispersion_index"),
        F.expr(f"2 * ({num}) > 3 * ({den})").alias("overdispersed"),
    )




# ---------------------------------------------------------------------------
# Neyman-optimal stratified sample allocation (largest-remainder exact)
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000  # total sample budget to allocate (frozen)




def _neyman_oracle() -> str:
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs_sql,
        nano_sigma_samp_sql,
    )

    return f"""
    WITH mom AS (
      SELECT o_orderpriority AS priority, {nano_moment_aggs_sql('o_totalprice')}
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT priority, CAST(n AS BIGINT) AS n,
             CAST(ROUND({nano_sigma_samp_sql()} * 1000000) AS BIGINT)
               AS sigma_micro
      FROM mom WHERE n > 1
    ),
    w AS (
      SELECT priority, n, sigma_micro,
             CAST(n AS HUGEINT) * sigma_micro AS wt,
             SUM(CAST(n AS HUGEINT) * sigma_micro) OVER () AS tot
      FROM s WHERE sigma_micro > 0
    ),
    fl AS (
      SELECT priority, n, sigma_micro,
             CAST({_NEY_BUDGET} * wt // tot AS BIGINT) AS base,
             {_NEY_BUDGET} * wt - ({_NEY_BUDGET} * wt // tot) * tot AS rem,
             CAST({_NEY_BUDGET} AS BIGINT)
               - SUM(CAST({_NEY_BUDGET} * wt // tot AS BIGINT)) OVER ()
               AS leftover
      FROM w
    )
    SELECT priority, n AS n_rows, sigma_micro, base,
           CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC,
                                                    priority) <= leftover
                            THEN 1 ELSE 0 END AS BIGINT) AS allocation
    FROM fl
    """




@register("neyman_allocation", oracle=_neyman_oracle())
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: split a fixed
    budget of {_NEY_BUDGET} samples across order-priority strata
    proportionally to N_h·σ_h — the allocation that minimizes the
    variance of the stratified mean estimator (Neyman 1934), i.e. how
    an eval/labeling budget SHOULD be spread over heterogeneous
    segments instead of proportional-to-size. Integer allocations come
    from the largest-remainder method, so they sum to the budget
    EXACTLY (floors + ranked remainders; no engine float rounding
    decides a seat).

    Scale posture: one combinable moment aggregate per stratum, then
    pure arithmetic over the bounded strata frame. Cross-engine
    determinism: σ quantized to exact micro units BEFORE weighting;
    weights/floors/remainders are HUGEINT/DECIMAL(38) integers; the
    remainder rank is pinned (rem DESC, priority); zero-variance or
    single-row strata drop out (documented — they need no sample).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    from rs_streamloader_spark.functions.moments import (
        nano_moment_aggs,
        nano_sigma_samp,
    )

    orders = _S._t(spark, sf_dir, "orders")["orders"]
    mom = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        *nano_moment_aggs("o_totalprice")
    )
    s = (
        mom.where("n > 1")
        .select(
            "priority",
            F.col("n").cast("bigint").alias("n"),
            F.round(nano_sigma_samp() * 1000000).cast("bigint").alias("sigma_micro"),
        )
        .where(F.col("sigma_micro") > 0)
    )
    wall = Window.partitionBy()
    w = s.select(
        "priority",
        "n",
        "sigma_micro",
        F.expr("CAST(n AS DECIMAL(38,0)) * sigma_micro").alias("wt"),
    ).withColumn("tot", F.sum("wt").over(wall))
    fl = w.select(
        "priority",
        "n",
        "sigma_micro",
        F.expr(f"CAST({_NEY_BUDGET} * wt div tot AS BIGINT)").alias("base"),
        F.expr(
            f"{_NEY_BUDGET} * wt - ({_NEY_BUDGET} * wt div tot) * tot"
        ).alias("rem"),
    ).withColumn(
        "leftover",
        F.lit(_NEY_BUDGET).cast("bigint") - F.sum("base").over(wall),
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), "priority")
    )
    return fl.select(
        "priority",
        F.col("n").alias("n_rows"),
        "sigma_micro",
        "base",
        (F.col("base") + F.when(rn <= F.col("leftover"), 1).otherwise(0))
        .cast("bigint")
        .alias("allocation"),
    )




# ---------------------------------------------------------------------------
# Exact trimmed mean via histogram prefix walk (robust location)
# ---------------------------------------------------------------------------

_TRIM_PCT = 5  # percent trimmed from EACH tail




@register(
    "trimmed_mean_robust",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    c AS (
      SELECT priority, v, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY v DESC
                            ROWS UNBOUNDED PRECEDING) AS rcum,
             SUM(cnt) OVER (PARTITION BY priority) AS n,
             SUM(CAST(v AS HUGEINT) * cnt) OVER (PARTITION BY priority)
               AS total
      FROM h
    )
    SELECT priority, CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(n) * {_TRIM_PCT} // 100 AS BIGINT) AS k_each_side,
           CAST((MIN(total)
             - SUM(CASE WHEN cum <= n * {_TRIM_PCT} // 100
                        THEN CAST(v AS HUGEINT) * cnt
                        WHEN cum - cnt < n * {_TRIM_PCT} // 100
                        THEN CAST(v AS HUGEINT)
                             * (n * {_TRIM_PCT} // 100 - (cum - cnt))
                        ELSE 0 END)
             - SUM(CASE WHEN rcum <= n * {_TRIM_PCT} // 100
                        THEN CAST(v AS HUGEINT) * cnt
                        WHEN rcum - cnt < n * {_TRIM_PCT} // 100
                        THEN CAST(v AS HUGEINT)
                             * (n * {_TRIM_PCT} // 100 - (rcum - cnt))
                        ELSE 0 END))
             * 1000000
             // (MIN(n) - 2 * (MIN(n) * {_TRIM_PCT} // 100)) AS BIGINT)
             AS trimmed_mean_micro,
           CAST(MIN(total) * 1000000 // MIN(n) AS BIGINT) AS raw_mean_micro
    FROM c
    GROUP BY priority
    """,
)
def trimmed_mean_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {_TRIM_PCT}%-each-side trimmed mean of order value per
    priority — the robust location estimate that survives the heavy
    tails plain AVG drowns in, computed EXACTLY from the cents value
    histogram: the bottom/top k = ⌊n·{_TRIM_PCT}/100⌋ observations are
    removed by a cumulative prefix walk with PARTIAL inclusion at the
    boundary bin (a duplicate-heavy boundary value is split, not
    dropped whole — the subtlety binned approximations get wrong).
    Reported next to the raw mean so the trim's effect is visible.

    Scale posture: values collapse to a per-group cents histogram
    (one aggregation, map-side combined); both tail walks are windows
    over the bounded histogram; no sort of raw rows anywhere.
    Cross-engine determinism: all sums/cuts are HUGEINT/DECIMAL(38)
    integers; micro-unit floor divisions; no doubles at all.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    h = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wp = Window.partitionBy("priority")
    c = h.select(
        "priority",
        "v",
        "cnt",
        F.sum("cnt")
        .over(wp.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt")
        .over(
            wp.orderBy(F.col("v").desc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("rcum"),
        F.sum("cnt").over(wp).alias("n"),
        F.expr(
            "SUM(CAST(v AS DECIMAL(38,0)) * cnt)"
            " OVER (PARTITION BY priority)"
        ).alias("total"),
    )
    k = f"n * {_TRIM_PCT} div 100"
    lo = (
        f"SUM(CASE WHEN cum <= {k} THEN CAST(v AS DECIMAL(38,0)) * cnt"
        f" WHEN cum - cnt < {k} THEN CAST(v AS DECIMAL(38,0))"
        f" * ({k} - (cum - cnt)) ELSE 0 END)"
    )
    hi = (
        f"SUM(CASE WHEN rcum <= {k} THEN CAST(v AS DECIMAL(38,0)) * cnt"
        f" WHEN rcum - cnt < {k} THEN CAST(v AS DECIMAL(38,0))"
        f" * ({k} - (rcum - cnt)) ELSE 0 END)"
    )
    return c.groupBy("priority").agg(
        F.min("n").cast("bigint").alias("n"),
        F.expr(f"CAST(MIN(n) * {_TRIM_PCT} div 100 AS BIGINT)").alias(
            "k_each_side"
        ),
        F.expr(
            f"CAST((MIN(total) - {lo} - {hi}) * 1000000"
            f" div (MIN(n) - 2 * (MIN(n) * {_TRIM_PCT} div 100)) AS BIGINT)"
        ).alias("trimmed_mean_micro"),
        F.expr(
            "CAST(MIN(total) * 1000000 div MIN(n) AS BIGINT)"
        ).alias("raw_mean_micro"),
    )




# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of supplier revenue per nation
# ---------------------------------------------------------------------------


@register(
    "herfindahl_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(r.cents) AS BIGINT) AS total_cents,
           ROUND(CAST(SUM(r.cents * r.cents) AS DOUBLE)
                 / (CAST(SUM(r.cents) AS DOUBLE) * CAST(SUM(r.cents)
                                                        AS DOUBLE)), 6)
             AS hhi,
           CAST(SUM(r.cents * r.cents) * 10000
                // (SUM(r.cents) * SUM(r.cents)) AS BIGINT)
             AS hhi_x10000
    FROM rev r JOIN nation n ON n.n_nationkey = r.s_nationkey
    GROUP BY n.n_name
    HAVING SUM(r.cents) > 0
    """,
)
def herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue
    within each nation: HHI = Σ share² over suppliers — the standard
    market-concentration number (10000·HHI > 2500 is the "highly
    concentrated" antitrust line) and, for data pipelines, the
    skew-risk audit for any partition-by-supplier layout
    (high HHI ⇒ one hot key dominates the nation's volume). Companion
    to ``gini``-style inequality: HHI weights the LARGEST shares
    hardest.

    Scale posture: one (nation, supplier) revenue aggregation
    (map-side combined), then a bounded per-nation reduction; the
    nation dim broadcasts. Cross-engine determinism: revenue in exact
    BIGINT cents; Σc² in HUGEINT/DECIMAL(38); hhi_x10000 is an exact
    integer floor division (the gate-worthy column), the 6dp double is
    display only with pinned operand order.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "lineitem", "supplier", "nation")
    rev = (
        t["lineitem"]
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)"
                " * 100) AS BIGINT)) AS DECIMAL(38,0))"
            ).alias("cents")
        )
    )
    return (
        rev.join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.expr(
                "ROUND(CAST(SUM(cents * cents) AS DOUBLE)"
                " / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents)"
                " AS DOUBLE)), 6)"
            ).alias("hhi"),
            F.expr(
                "CAST(SUM(cents * cents) * 10000"
                " div (SUM(cents) * SUM(cents)) AS BIGINT)"
            ).alias("hhi_x10000"),
        )
        .where(F.col("total_cents") > 0)
    )




# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR correction over per-segment proportion tests
# ---------------------------------------------------------------------------

# The five event types are the FIXED test family (m=5 by contract, the
# frozen-literal posture of obrien_fleming_sequential): BH critical
# z-values for ranks k=1..5 at q=0.05 are the published two-sided
# normal quantiles z_{alpha_k/2} with alpha_k = k*q/m.
_BH_TYPES = ("click", "error", "purchase", "signup", "view")


_BH_CRIT = (2.575829, 2.326348, 2.170090, 2.053749, 1.959964)


_BH_THRESHOLD = 50.0  # success = value > 50




def _bh_crit_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {k + 1} THEN CAST({z} AS DOUBLE)" for k, z in enumerate(_BH_CRIT)
    )
    return f"CASE {rank_col} {whens} END"




_BH_Z_SQL = (
    "ROUND((CAST(s AS DOUBLE) / n - CAST(ss - s AS DOUBLE) / (nn - n))"
    " / SQRT((CAST(ss AS DOUBLE) / nn) * (1.0 - CAST(ss AS DOUBLE) / nn)"
    " * (1.0 / n + 1.0 / (nn - n))), 6)"
)




@register(
    "bh_fdr_correction",
    oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN "value" > {_BH_THRESHOLD} THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM events
      WHERE event_type IN {_BH_TYPES} AND "value" IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nn, SUM(s) AS ss FROM e),
    z AS (
      SELECT event_type, n, s, {_BH_Z_SQL} AS z
      FROM e, tot WHERE n > 0 AND nn - n > 0
    ),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, event_type)
                     AS BIGINT) AS p_rank
      FROM z
    ),
    c AS (SELECT *, {_bh_crit_case('p_rank')} AS crit_z FROM r),
    kmax AS (
      SELECT COALESCE(MAX(CASE WHEN ABS(z) >= crit_z THEN p_rank END), 0) AS km
      FROM c
    )
    SELECT event_type, n, s AS n_success,
           CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT) AS prop_ppm,
           z, p_rank, crit_z,
           (p_rank <= km) AS rejected
    FROM c, kmax
    """,
)
def bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the family of five
    per-event-type two-proportion tests (share of events with value >
    {thr}, each type vs the pooled rest): the multiple-testing layer
    every metrics platform needs once it tests more than one segment
    per release — without it, 5 tests at alpha=0.05 fire a false
    positive ~23% of the time.

    The BH comparison p_(k) <= k*q/m is performed in Z-SPACE against
    FROZEN published two-sided normal quantiles (m=5 fixed by
    contract, q=0.05): |z|_(k) >= z_crit(k) is the identical
    inequality, and no CDF/transcendental is ever evaluated in either
    engine — the same frozen-literal posture as
    ``obrien_fleming_sequential``. z itself uses one IEEE SQRT with
    identical operand order, rounded to 6dp BEFORE ranking so the
    cross-engine sort order is decided on identical doubles
    (event_type breaks ties).

    On the homogeneous synthetic corpus every test accepts (the
    `rejected` branch is a detector; its positive branch is pinned
    cross-engine on a constructed corpus with a planted effect in
    tests/test_nonvacuity.py).

    Scale posture: one combinable 5-row aggregate, a broadcast 1-row
    total, and windows over the bounded 5-row family — nothing after
    the first aggregate scales with data.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    e = (
        ev.where(F.col("event_type").isin(*_BH_TYPES))
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("value") > _BH_THRESHOLD, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("s"),
        )
        # the 5-row family feeds both the totals and the z rows —
        # cache it so events is scanned once, not twice
        .cache()
    )
    tot = e.agg(F.sum("n").alias("nn"), F.sum("s").alias("ss"))
    z = (
        e.join(F.broadcast(tot))
        .where("n > 0 AND nn - n > 0")
        .select("event_type", "n", "s", F.expr(_BH_Z_SQL).alias("z"))
    )
    w = Window.orderBy(F.abs(F.col("z")).desc(), "event_type")
    r = z.select(
        "*", F.row_number().over(w).cast("bigint").alias("p_rank")
    ).select("*", F.expr(_bh_crit_case("p_rank")).alias("crit_z"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    km = F.coalesce(
        F.max(
            F.when(F.abs(F.col("z")) >= F.col("crit_z"), F.col("p_rank"))
        ).over(wall),
        F.lit(0),
    )
    return r.select(
        "event_type",
        "n",
        F.col("s").alias("n_success"),
        F.expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("prop_ppm"),
        "z",
        "p_rank",
        "crit_z",
        (F.col("p_rank") <= km).alias("rejected"),
    )




bh_fdr_correction.__doc__ = bh_fdr_correction.__doc__.format(
    thr=int(_BH_THRESHOLD)
)




# ---------------------------------------------------------------------------
# Ratio-metric variance via the delta method (value per event, per variant)
# ---------------------------------------------------------------------------

_Z975 = 1.959964  # frozen two-sided 95% normal quantile (same as power/CI ops)




def _ratio_dm_exprs() -> dict[str, str]:
    """Delta-method double expressions over the per-variant moment
    columns (n, sx, sy, sxx, syy, sxy) — ONE shared rendering consumed
    verbatim by both engines so operand order is identical."""
    r = "(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    my = "(CAST(sy AS DOUBLE) / n)"
    vxx = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))"
    vyy = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1))"
    vxy = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1))"
    se_delta = (
        f"(SQRT(({vxx} - 2.0 * {r} * {vxy} + {r} * {r} * {vyy}) / n) / {my})"
    )
    se_naive = f"(SQRT({vxx} / n) / {my})"
    return {
        "ratio": r,
        "se_naive": se_naive,
        "se_delta": se_delta,
        "ci_lo": f"({r} - {_Z975} * {se_delta})",
        "ci_hi": f"({r} + {_Z975} * {se_delta})",
    }




def _ratio_dm_select() -> str:
    x = _ratio_dm_exprs()
    return (
        f"ROUND({x['ratio']}, 6) AS ratio_cents_per_event,"
        f" ROUND({x['se_naive']}, 6) AS se_naive,"
        f" ROUND({x['se_delta']}, 6) AS se_delta,"
        f" ROUND({x['ci_lo']}, 6) AS ci_lo,"
        f" ROUND({x['ci_hi']}, 6) AS ci_hi"
    )




@register(
    "ratio_metric_delta_method",
    oracle=f"""
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS x,
             COUNT(*) AS y
      FROM events WHERE "value" IS NOT NULL
      GROUP BY user_id
    ),
    m AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM u GROUP BY 1
    )
    SELECT variant, n AS n_users,
           CAST(sx AS BIGINT) AS sum_value_cents,
           CAST(sy AS BIGINT) AS n_events,
           {_ratio_dm_select()}
    FROM m WHERE n > 1
    """,
)
def ratio_metric_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (value cents per
    event, per 50/50 user split): when the denominator is itself
    random (events per user), the naive SE that conditions on it is
    wrong — the delta method carries Var(X), Var(Y), AND Cov(X,Y)
    through Var(X̄/Ȳ) ≈ (σx² − 2R·σxy + R²σy²)/(n·ȳ²). Both SEs are
    reported so the correction is visible; the 95% CI uses the frozen
    z=1.959964 literal (no CDF evaluated anywhere).

    Scale posture: per-user totals are ONE combinable aggregate keyed
    by user (the experiment-unit collapse every CUPED/ratio pipeline
    does first), then a 2-row moment aggregate in HUGEINT/DECIMAL(38);
    every double expression is rendered from ONE shared string
    (functions-style single-sourcing) so operand order is identical
    cross-engine, rounded once at 6dp.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    u = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("variant"), "x", "y")
    )
    d38 = "DECIMAL(38,0)"
    m = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(y AS {d38}) * y) AS {d38})").alias("syy"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * y) AS {d38})").alias("sxy"),
    )
    x = _ratio_dm_exprs()
    return m.where("n > 1").select(
        "variant",
        F.col("n").alias("n_users"),
        F.col("sx").cast("bigint").alias("sum_value_cents"),
        F.col("sy").cast("bigint").alias("n_events"),
        F.expr(f"ROUND({x['ratio']}, 6)").alias("ratio_cents_per_event"),
        F.expr(f"ROUND({x['se_naive']}, 6)").alias("se_naive"),
        F.expr(f"ROUND({x['se_delta']}, 6)").alias("se_delta"),
        F.expr(f"ROUND({x['ci_lo']}, 6)").alias("ci_lo"),
        F.expr(f"ROUND({x['ci_hi']}, 6)").alias("ci_hi"),
    )




# ---------------------------------------------------------------------------
# Additive seasonal decomposition (STL-lite: trend / DOW seasonal / residual)
# ---------------------------------------------------------------------------


@register(
    "seasonal_decompose_additive",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT d, rev_c,
             CAST(strftime(d, '%w') AS INT) AS dow,
             CASE WHEN LAG(d, 3) OVER (ORDER BY d) IS NOT NULL
                   AND LEAD(d, 3) OVER (ORDER BY d) IS NOT NULL
                   AND LEAD(d, 3) OVER (ORDER BY d)
                       - LAG(d, 3) OVER (ORDER BY d) = 6
                  THEN SUM(rev_c) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                                        AND 3 FOLLOWING) * 1000 // 7
             END AS trend_mc
      FROM daily
    ),
    det AS (SELECT *, rev_c * 1000 - trend_mc AS det_mc FROM w),
    season AS (
      SELECT dow,
             CAST(CAST(SUM(det_mc) AS HUGEINT) // COUNT(det_mc) AS BIGINT)
               AS s_raw_mc
      FROM det WHERE det_mc IS NOT NULL GROUP BY 1
    ),
    adj AS (SELECT CAST(SUM(s_raw_mc) // COUNT(*) AS BIGINT) AS a_mc FROM season)
    SELECT STRFTIME(det.d, '%Y-%m-%d') AS day, det.dow, det.rev_c,
           det.trend_mc,
           season.s_raw_mc - adj.a_mc AS seasonal_mc,
           det.det_mc - (season.s_raw_mc - adj.a_mc) AS residual_mc
    FROM det JOIN season ON season.dow = det.dow CROSS JOIN adj
    """,
)
def seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue (STL-lite):
    trend = centered 7-day moving average (defined ONLY where the ROW
    window spans exactly 7 CONTIGUOUS calendar days — on a gapped
    series the naive ROWS frame silently reaches across the gap, the
    same failure ``rolling_sum_range_frame`` makes visible), seasonal
    = per-day-of-week mean of the detrended series re-centered to sum
    ~zero, residual = the remainder. rev·1000 = trend + seasonal +
    residual holds EXACTLY by construction (the identity is the
    sanity pin).

    Scale posture: one combinable daily aggregate, then every window
    orders the ~2.4k-row calendar-bounded series (the repo's "global
    windows only over already-reduced aggregates" rule); the DOW
    seasonal is a broadcast 7-row join back. Cross-engine
    determinism: everything in integer MILLI-cents via truncating
    division (both engines truncate toward zero); dow via
    dayofweek-1 == strftime('%w') (0=Sunday); dates out as strings.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    wd = Window.orderBy("d")
    w7 = wd.rowsBetween(-3, 3)
    full = (
        F.lag("d", 3).over(wd).isNotNull()
        & F.lead("d", 3).over(wd).isNotNull()
        & (F.datediff(F.lead("d", 3).over(wd), F.lag("d", 3).over(wd)) == 6)
    )
    w = daily.select(
        "d",
        "rev_c",
        (F.dayofweek("d") - 1).cast("int").alias("dow"),
        F.when(full, F.expr("1")).alias("is_full"),
        F.sum("rev_c").over(w7).alias("win_sum"),
    ).select(
        "d",
        "rev_c",
        "dow",
        F.when(
            F.col("is_full") == 1, F.expr("win_sum * 1000 div 7")
        ).alias("trend_mc"),
    )
    # det feeds three consumers (seasonal means, the adjustment, and
    # the final projection) — cache the bounded (~calendar-length)
    # daily table so the orders scan + windows run once, not 3x
    det = w.select(
        "*", (F.col("rev_c") * 1000 - F.col("trend_mc")).alias("det_mc")
    ).cache()
    season = (
        det.where(F.col("det_mc").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                "CAST(CAST(SUM(det_mc) AS DECIMAL(38,0)) div COUNT(det_mc)"
                " AS BIGINT)"
            ).alias("s_raw_mc")
        )
    )
    adj = season.agg(
        F.expr("CAST(SUM(s_raw_mc) div COUNT(*) AS BIGINT)").alias("a_mc")
    )
    return (
        det.join(F.broadcast(season), "dow")
        .join(F.broadcast(adj))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dow",
            "rev_c",
            "trend_mc",
            (F.col("s_raw_mc") - F.col("a_mc")).alias("seasonal_mc"),
            (
                F.col("det_mc") - (F.col("s_raw_mc") - F.col("a_mc"))
            ).alias("residual_mc"),
        )
    )




# ---------------------------------------------------------------------------
# Binary-segmentation changepoint (single best mean shift, exact integers)
# ---------------------------------------------------------------------------


def _ddiv38(a: str, b: str) -> str:
    """Truncating division of two nonnegative DECIMAL(38,0) expressions
    that stays DECIMAL (Spark's `div` coerces the quotient to LONG and
    overflows past ~9.2e18): subtract the remainder, then the exact
    decimal division has no fraction to round. Caller guarantees a >= 0
    and b > 0."""
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS DECIMAL(38,0))"




@register(
    "changepoint_binseg",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100
               AS BIGINT) AS rev_d
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT d,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i,
             CAST(SUM(CAST(rev_c AS HUGEINT))
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS c1,
             CAST(SUM(CAST(rev_d AS HUGEINT))
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS c1d
      FROM daily
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev_c) AS HUGEINT) AS s,
             CAST(SUM(rev_d) AS HUGEINT) AS sd,
             CAST(SUM(CAST(rev_d AS HUGEINT) * rev_d) AS HUGEINT) AS s2d
      FROM daily
    ),
    obj AS (
      SELECT d, i, c1, n, s, sd, s2d,
             (n * c1d - i * sd) * (n * c1d - i * sd) // (i * (n - i))
               AS objective
      FROM seq, tot WHERE i < n
    ),
    best AS (
      SELECT * FROM obj
      WHERE s2d - sd * sd // n > 0
      ORDER BY objective DESC, d LIMIT 1
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS split_day,
           i AS n_left, n - i AS n_right,
           CAST(c1 * 1000 // i AS BIGINT) AS mean_left_mc,
           CAST((s - c1) * 1000 // (n - i) AS BIGINT) AS mean_right_mc,
           CAST((s - c1) * 1000 // (n - i) - c1 * 1000 // i AS BIGINT)
             AS delta_mc,
           CAST(objective * 1000000
                // (n * (s2d - sd * sd // n)) AS BIGINT) AS gain_ppm
    FROM best
    """,
)
def changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily revenue by binary
    segmentation: the split τ maximizing the between-segment
    sum-of-squares gain, via the identity gain(τ) ∝ (n·C(τ) − τ·S)²
    / (τ·(n−τ)) over prefix sums — the first step of the classic
    BinSeg/PELT family and the offline counterpart to
    ``cusum_drift_daily``'s online monitor. gain_ppm normalizes the
    SSE reduction by total variance (an R²-of-the-split in ppm); on
    the steady synthetic series it is small — the PLANTED-shift
    behavior (split lands exactly on the injected break) is pinned by
    a constructed-corpus test.

    Scale posture: one combinable daily aggregate; the prefix sum and
    argmax order the calendar-bounded series only; the argmax is a
    deterministic top-1 cut (objective DESC, day ASC). Cross-engine
    determinism: the RANKING objective is an exact truncating-division
    integer computed in whole-DOLLAR units so (n·C − τ·S)² stays
    inside DECIMAL(38)/HUGEINT even at 100 TB daily revenue (cents
    would square past 1e38); Spark's LONG-quotient `div` is avoided
    where the quotient exceeds int64 via the remainder-subtraction
    decimal division (``_ddiv38``). Output means/deltas in integer
    milli-CENTS from the full-precision cent prefix sums.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    d38 = "DECIMAL(38,0)"
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    ).select("d", "rev_c", F.expr("rev_c div 100").alias("rev_d"))
    wd = Window.orderBy("d")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    seq = daily.select(
        "d",
        F.row_number().over(wd).cast("bigint").alias("i"),
        F.sum(F.col("rev_c").cast(d38)).over(wcum).cast(d38).alias("c1"),
        F.sum(F.col("rev_d").cast(d38)).over(wcum).cast(d38).alias("c1d"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(rev_c) AS {d38})").alias("s"),
        F.expr(f"CAST(SUM(rev_d) AS {d38})").alias("sd"),
        F.expr(f"CAST(SUM(CAST(rev_d AS {d38}) * rev_d) AS {d38})").alias(
            "s2d"
        ),
    )
    objective = _ddiv38(
        "(n * c1d - i * sd) * (n * c1d - i * sd)", "CAST(i * (n - i) AS DECIMAL(38,0))"
    )
    obj = (
        seq.join(F.broadcast(tot))
        .where("i < n")
        .select(
            "d",
            "i",
            "c1",
            "n",
            "s",
            "sd",
            "s2d",
            F.expr(objective).alias("objective"),
        )
    )
    tssd = f"(s2d - {_ddiv38('sd * sd', 'CAST(n AS DECIMAL(38,0))')})"
    best = (
        obj.where(F.expr(f"{tssd} > 0"))
        .orderBy(F.desc("objective"), "d")
        .limit(1)
    )
    return best.select(
        F.date_format("d", "yyyy-MM-dd").alias("split_day"),
        F.col("i").alias("n_left"),
        (F.col("n") - F.col("i")).alias("n_right"),
        F.expr("CAST(c1 * 1000 div i AS BIGINT)").alias("mean_left_mc"),
        F.expr("CAST((s - c1) * 1000 div (n - i) AS BIGINT)").alias(
            "mean_right_mc"
        ),
        F.expr(
            "CAST((s - c1) * 1000 div (n - i) - c1 * 1000 div i AS BIGINT)"
        ).alias("delta_mc"),
        F.expr(
            f"CAST(objective * 1000000 div (n * {tssd}) AS BIGINT)"
        ).alias("gain_ppm"),
    )




# ---------------------------------------------------------------------------
# Theil inequality indices of customer revenue (T and L, nano-unit exact)
# ---------------------------------------------------------------------------

_THEIL_RATIO = "((CAST(x AS DOUBLE) * n) / CAST(s AS DOUBLE))"


_THEIL_T_TERM = (
    f"CAST(ROUND({_THEIL_RATIO} * LN({_THEIL_RATIO}) * 1000000000)"
    " AS BIGINT)"
)


_THEIL_LN_TERM = f"CAST(ROUND(LN({_THEIL_RATIO}) * 1000000000) AS BIGINT)"




@register(
    "theil_index_revenue",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s
      FROM cust WHERE x > 0
    ),
    terms AS (
      SELECT {_THEIL_T_TERM} AS t_nano, {_THEIL_LN_TERM} AS ln_nano
      FROM cust, tot WHERE x > 0
    )
    SELECT (SELECT n FROM tot) AS n_customers,
           (SELECT CAST(s AS BIGINT) FROM tot) AS total_cents,
           CAST(SUM(t_nano) // (SELECT n FROM tot) AS BIGINT) AS theil_t_nano,
           CAST(-SUM(ln_nano) // (SELECT n FROM tot) AS BIGINT)
             AS theil_l_nano,
           ROUND(SUM(t_nano) / ((SELECT n FROM tot) * 1000000000.0), 6)
             AS theil_t,
           ROUND(-SUM(ln_nano) / ((SELECT n FROM tot) * 1000000000.0), 6)
             AS theil_l
    FROM terms
    """,
)
def theil_index_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality indices of per-customer revenue: T =
    (1/n)Σ(x/μ)ln(x/μ) (top-sensitive) and the mean log deviation L =
    (1/n)Σln(μ/x) (bottom-sensitive) — the information-theoretic
    complements to ``gini_revenue_concentration`` (reading T vs L says
    WHERE the concentration lives, and unlike Gini, Theil decomposes
    additively across subgroups).

    Scale posture: one combinable per-customer aggregate, a broadcast
    1-row total, then one map-side term per customer folding into a
    1-row sum — no sort, no window. Cross-engine determinism: the one
    LN per row is a single shared expression string with identical
    operand order, nano-rounded PER TERM before the sum (the
    ``source_token_entropy`` policy, immune to float sum-order
    divergence); index division truncates identically.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
    ).where("x > 0")
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(x) AS DECIMAL(38,0))").alias("s"),
    )
    terms = cust.join(F.broadcast(tot)).select(
        F.expr(_THEIL_T_TERM).alias("t_nano"),
        F.expr(_THEIL_LN_TERM).alias("ln_nano"),
        "n",
        "s",
    )
    return terms.groupBy("n", "s").agg(
        F.expr(
            "CAST(SUM(CAST(t_nano AS DECIMAL(38,0))) div n AS BIGINT)"
        ).alias("theil_t_nano"),
        F.expr(
            "CAST(-SUM(CAST(ln_nano AS DECIMAL(38,0))) div n AS BIGINT)"
        ).alias("theil_l_nano"),
        F.expr(
            "ROUND(CAST(SUM(CAST(t_nano AS DECIMAL(38,0))) AS DOUBLE)"
            " / (n * 1e9), 6)"
        ).alias("theil_t"),
        F.expr(
            "ROUND(CAST(-SUM(CAST(ln_nano AS DECIMAL(38,0))) AS DOUBLE)"
            " / (n * 1e9), 6)"
        ).alias("theil_l"),
    ).select(
        F.col("n").alias("n_customers"),
        F.col("s").cast("bigint").alias("total_cents"),
        "theil_t_nano",
        "theil_l_nano",
        "theil_t",
        "theil_l",
    )




# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-nation proportions (MoM Beta prior)
# ---------------------------------------------------------------------------

_EB_MU = "(CAST(sp AS DOUBLE) / (g * 1000000.0))"


_EB_V = (
    "((CAST(spp AS DOUBLE) / 1e12 - CAST(sp AS DOUBLE) * sp / (g * 1e12))"
    " / (g - 1))"
)


_EB_K = f"({_EB_MU} * (1.0 - {_EB_MU}) / {_EB_V} - 1.0)"




@register(
    "empirical_bayes_shrinkage",
    oracle=f"""
    WITH grp AS (
      SELECT n.n_name AS nation,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_f
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    p AS (
      SELECT *, CAST(CAST(n_f AS HUGEINT) * 1000000 // n_orders AS BIGINT)
        AS p_raw_ppm
      FROM grp
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(p_raw_ppm) AS HUGEINT) AS sp,
             CAST(SUM(CAST(p_raw_ppm AS HUGEINT) * p_raw_ppm) AS HUGEINT)
               AS spp
      FROM p
    )
    SELECT nation, n_orders, n_f, p_raw_ppm,
           ROUND({_EB_MU}, 6) AS prior_mean,
           CASE WHEN g > 1 AND {_EB_V} > 0 AND {_EB_K} > 0
                THEN ROUND({_EB_K}, 4) END AS prior_strength_k,
           CASE WHEN g > 1 AND {_EB_V} > 0 AND {_EB_K} > 0
                THEN ROUND(({_EB_MU} * {_EB_K} + n_f)
                           / ({_EB_K} + n_orders), 6) END AS p_shrunk
    FROM p, mom
    """,
)
def empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation finished-order shares
    toward a method-of-moments Beta prior: small nations with extreme
    raw shares get pulled toward the grand mean in proportion to the
    prior strength K = μ(1−μ)/v − 1 (the James-Stein-style estimator
    every leaderboard/segment report should use instead of raw
    proportions — a 10-order nation at 100% would otherwise outrank
    every large nation).

    Scale posture: one fact aggregation keyed by nation (dims
    broadcast), then the prior is fitted on the BOUNDED ~25-row group
    table (exact ppm-integer moments) and applied row-wise — nothing
    after the first aggregate scales with data. Cross-engine
    determinism: group shares as exact ppm integers; μ, v, K, and the
    posterior mean are single shared double expression strings with
    identical operand order, rounded once; degenerate priors (v ≤ 0 or
    K ≤ 0) yield NULL shrinkage in both engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "orders", "customer", "nation")
    grp = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_f"),
        )
    )
    p = grp.select(
        "*", F.expr(
            "CAST(CAST(n_f AS DECIMAL(38,0)) * 1000000 div n_orders"
            " AS BIGINT)"
        ).alias("p_raw_ppm")
    )
    d38 = "DECIMAL(38,0)"
    mom = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.expr(f"CAST(SUM(p_raw_ppm) AS {d38})").alias("sp"),
        F.expr(
            f"CAST(SUM(CAST(p_raw_ppm AS {d38}) * p_raw_ppm) AS {d38})"
        ).alias("spp"),
    )
    guard = f"g > 1 AND {_EB_V} > 0 AND {_EB_K} > 0"
    return p.join(F.broadcast(mom)).select(
        "nation",
        "n_orders",
        "n_f",
        "p_raw_ppm",
        F.expr(f"ROUND({_EB_MU}, 6)").alias("prior_mean"),
        F.expr(f"CASE WHEN {guard} THEN ROUND({_EB_K}, 4) END").alias(
            "prior_strength_k"
        ),
        F.expr(
            f"CASE WHEN {guard} THEN ROUND(({_EB_MU} * {_EB_K} + n_f)"
            f" / ({_EB_K} + n_orders), 6) END"
        ).alias("p_shrunk"),
    )




# ---------------------------------------------------------------------------
# Lorenz curve decile points (exact distributed rank + revenue prefix)
# ---------------------------------------------------------------------------


@register(
    "lorenz_curve_points",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk,
             SUM(CAST(rev AS HUGEINT)) OVER (
               ORDER BY rev, o_custkey ROWS UNBOUNDED PRECEDING
             ) AS cumrev
      FROM cust
    ),
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(rev) AS HUGEINT) AS total FROM cust
    )
    SELECT CAST(d.d AS BIGINT) AS decile,
           CAST(r.rnk AS BIGINT) AS rank,
           CAST(r.cumrev AS BIGINT) AS cum_revenue_cents,
           CAST(r.cumrev * 1000000 // t.total AS BIGINT) AS cum_share_ppm
    FROM (SELECT UNNEST(RANGE(1, 11)) AS d) d
    CROSS JOIN tot t
    JOIN ranked r ON r.rnk = d.d * t.n // 10
    WHERE t.total > 0
    """,
)
def lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at the customer-revenue deciles: for each d/10
    population cut (poorest-first), the exact cumulative revenue share
    — the curve whose area deficit IS ``gini_revenue_concentration``
    and whose top point IS ``pareto_customer_share``; these ten points
    are what the inequality one-numbers summarize.

    Scale posture: the oracle's single global ROW_NUMBER + running sum
    is the serial formulation; this side computes BOTH the rank and
    the revenue prefix with the two-pass banded pattern (row_number /
    sum within a fixed $10k revenue bucket + broadcast per-bucket
    offsets), then keeps only the ten boundary ranks via a broadcast
    10-row join — no input-cardinality global window anywhere.
    Cross-engine determinism: ranks tie-broken by (rev, custkey)
    identically; all accounting in BIGINT cents / DECIMAL(38);
    shares as ppm truncating division.

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
        (F.col("rev_offset") + F.col("csum")).alias("cumrev"),
    )
    tot = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(rev) AS DECIMAL(38,0))").alias("total"),
    )
    deciles = spark.range(1, 11).select(F.col("id").cast("bigint").alias("d"))
    bounds = (
        F.broadcast(deciles)
        .join(F.broadcast(tot))
        .where("total > 0")
        .select("d", F.expr("CAST(d * n div 10 AS BIGINT)").alias("rnk"), "total")
    )
    return ranked.join(F.broadcast(bounds), "rnk").select(
        F.col("d").alias("decile"),
        F.col("rnk").alias("rank"),
        F.col("cumrev").cast("bigint").alias("cum_revenue_cents"),
        F.expr("CAST(cumrev * 1000000 div total AS BIGINT)").alias(
            "cum_share_ppm"
        ),
    )




# ---------------------------------------------------------------------------
# McNemar paired test: weekday vs weekend conversion per user
# ---------------------------------------------------------------------------

_MCNEMAR_CRIT_X1E6 = 3_841_459  # chi^2_1 95% critical value x 1e6 (frozen)




@register(
    "mcnemar_weekday_weekend",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(EXTRACT(dow FROM ts) AS INT) NOT IN (0, 6)
                      THEN 1 ELSE 0 END) AS x,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(EXTRACT(dow FROM ts) AS INT) IN (0, 6)
                      THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    cm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x * y) AS BIGINT) AS both_conv,
             CAST(SUM(x * (1 - y)) AS BIGINT) AS weekday_only,
             CAST(SUM((1 - x) * y) AS BIGINT) AS weekend_only,
             CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS neither
      FROM u
    )
    SELECT n_users, both_conv, weekday_only, weekend_only, neither,
           CASE WHEN weekday_only + weekend_only > 0 THEN
             ROUND(CAST((ABS(weekday_only - weekend_only) - 1)
                        * (ABS(weekday_only - weekend_only) - 1) AS DOUBLE)
                   / (weekday_only + weekend_only), 6) END AS chi2_cc,
           (weekday_only + weekend_only > 0 AND
            (ABS(weekday_only - weekend_only) - 1)
            * (ABS(weekday_only - weekend_only) - 1) * 1000000
            > {_MCNEMAR_CRIT_X1E6} * (weekday_only + weekend_only))
             AS significant
    FROM cm
    """,
)
def mcnemar_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes: does the same user
    convert on weekdays but not weekends (or vice versa)? Unlike the
    two-proportion z-test (independent samples), McNemar conditions on
    the discordant pairs only — the correct test when both exposures
    are measured on the SAME subject. Continuity-corrected χ² =
    (|b−c|−1)²/(b+c); the significance verdict is decided on the EXACT
    cross-multiplied integer inequality against the frozen published
    χ²₁ 95% critical value (3.841459), never on the rounded double.

    On the uniform synthetic corpus the discordant counts are
    symmetric (verdict false) — the positive branch is pinned on a
    constructed corpus with a planted weekday-only cohort.

    Scale posture: one combinable per-user MAX aggregate, then a 1-row
    reduction — the experiment-unit collapse shape. Weekend via
    dayofweek conventions proven equal in both engines (Spark
    dayofweek()∈{{1,7}} ⟺ DuckDB dow∈{{0,6}}).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    is_purchase = F.col("event_type") == "purchase"
    wknd = F.dayofweek("ts").isin(1, 7)
    u = ev.groupBy("user_id").agg(
        F.max(F.when(is_purchase & ~wknd, 1).otherwise(0)).alias("x"),
        F.max(F.when(is_purchase & wknd, 1).otherwise(0)).alias("y"),
    )
    cm = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("both_conv"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("bigint").alias(
            "weekday_only"
        ),
        F.sum((1 - F.col("x")) * F.col("y")).cast("bigint").alias(
            "weekend_only"
        ),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("bigint").alias(
            "neither"
        ),
    )
    b, c = F.col("weekday_only"), F.col("weekend_only")
    diff1 = F.abs(b - c) - 1
    return cm.select(
        "n_users",
        "both_conv",
        "weekday_only",
        "weekend_only",
        "neither",
        F.when(
            b + c > 0, F.round(diff1.cast("double") * diff1 / (b + c), 6)
        ).alias("chi2_cc"),
        (
            (b + c > 0)
            & (diff1 * diff1 * 1_000_000 > _MCNEMAR_CRIT_X1E6 * (b + c))
        ).alias("significant"),
    )




# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) of event_type x day-of-week independence
# ---------------------------------------------------------------------------

# chi^2 95% critical value for df=(5-1)(7-1)=24, in nano units (frozen
# published literal; the verdict compares exact nano-integer sums)
_GTEST_CRIT_NANO = 36_415_028_000




@register(
    "g_test_independence",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
    cols_ AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT CAST(ROUND(o * LN(CAST(o AS DOUBLE) * n
                               / (CAST(r AS DOUBLE) * c))
                        * 1000000000) AS BIGINT) AS t_nano
      FROM obs
      JOIN rows_ USING (event_type) JOIN cols_ USING (dow) CROSS JOIN tot
      WHERE o > 0
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_events,
           CAST(2 * SUM(t_nano) AS BIGINT) AS g_nano,
           ROUND(2 * SUM(t_nano) / 1e9, 6) AS g_statistic,
           CAST(24 AS BIGINT) AS df,
           (2 * SUM(t_nano) > {_GTEST_CRIT_NANO}) AS significant
    FROM terms
    """,
)
def g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of event_type × day-of-week
    independence: G = 2·Σ O·ln(O·N/(R·C)) — the information-theoretic
    twin of ``chi2_event_type_dow`` (G is additive across partitions
    of the table and is what a mutual-information reading of the same
    grid measures, G = 2N·MI). The verdict compares the EXACT
    nano-integer term sum against the frozen published χ²₂₄ 95%
    critical value — no rounded double enters the decision.

    Scale posture: one combinable (type, dow) count aggregate (35-cell
    bounded grid), broadcast marginals, per-cell nano-rounded LN terms
    summed as exact integers (sum-order immunity; the
    ``source_token_entropy`` policy). Zero-observed cells contribute
    exactly 0 (standard G-test convention, identical in both
    engines via the O > 0 filter).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    terms = (
        obs.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow")
        .join(F.broadcast(tot))
        .where("o > 0")
        .select(
            "n",
            F.expr(
                "CAST(ROUND(o * LN(CAST(o AS DOUBLE) * n"
                " / (CAST(r AS DOUBLE) * c)) * 1000000000) AS BIGINT)"
            ).alias("t_nano"),
        )
    )
    return terms.groupBy("n").agg(
        F.expr("CAST(2 * SUM(t_nano) AS BIGINT)").alias("g_nano"),
        F.expr("ROUND(2 * SUM(t_nano) / 1e9, 6)").alias("g_statistic"),
        F.expr("CAST(24 AS BIGINT)").alias("df"),
        F.expr(f"2 * SUM(t_nano) > {_GTEST_CRIT_NANO}").alias("significant"),
    ).select(
        F.col("n").cast("bigint").alias("n_events"),
        "g_nano",
        "g_statistic",
        "df",
        "significant",
    )




# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue vs its median
# ---------------------------------------------------------------------------


@register(
    "runs_test_randomness",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT rev_c AS m FROM (
        SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c, d) AS rnk,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE rnk = (n + 1) // 2
    ),
    signed AS (
      SELECT d, (rev_c > (SELECT m FROM med)) AS hi
      FROM daily WHERE rev_c <> (SELECT m FROM med)
    ),
    runs AS (
      SELECT COUNT(*) AS nn,
             CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             CAST(1 + SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
               AS r
      FROM (
        SELECT hi, hi <> LAG(hi) OVER (ORDER BY d)
                   AND LAG(hi) OVER (ORDER BY d) IS NOT NULL AS changed
        FROM signed
      )
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
           ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (CAST((n1 + n2) AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z_score
    FROM runs WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series vs its
    (lower) median: too FEW runs means positive autocorrelation
    (trending/regime days — the thing ``daily_acf_curve`` measures
    parametrically), too MANY means oscillation; |z| ≲ 2 is consistent
    with randomness. Median-equal days are excluded (the standard
    convention, identical both engines via the exact integer
    comparison).

    Scale posture: one combinable daily aggregate; the rank pick and
    the run count order the calendar-bounded series only (the
    reduced-aggregate global-window rule); the z formula is one shared
    double expression over four exact integers. Cross-engine
    determinism: the median is the exact lower-median cents value
    (rank (n+1)/2, ties broken by day), run boundaries are integer
    comparisons.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    w = Window.orderBy("rev_c", "d")
    ranked = daily.select(
        "rev_c",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    med = ranked.where("rnk = (n + 1) div 2").select(
        F.col("rev_c").alias("m")
    )
    signed = (
        daily.join(F.broadcast(med))
        .where("rev_c <> m")
        .select("d", (F.col("rev_c") > F.col("m")).alias("hi"))
    )
    wd = Window.orderBy("d")
    marked = signed.select(
        "hi",
        (
            (F.col("hi") != F.lag("hi").over(wd))
            & F.lag("hi").over(wd).isNotNull()
        ).alias("changed"),
    )
    runs = marked.agg(
        F.sum(F.when(F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("hi"), 0).otherwise(1)).cast("bigint").alias("n2"),
        (1 + F.sum(F.when(F.col("changed"), 1).otherwise(0)))
        .cast("bigint")
        .alias("r"),
    )
    # 2e0 not 2.0: Spark parses plain decimal literals as DECIMAL,
    # which would drag the whole expression out of double arithmetic
    mu = "1e0 + 2e0 * n1 * n2 / (n1 + n2)"
    var = (
        "2e0 * n1 * n2 * (2e0 * n1 * n2 - n1 - n2)"
        " / (CAST((n1 + n2) AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))"
    )
    return runs.where("n1 > 0 AND n2 > 0 AND n1 + n2 > 1").select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.expr(f"ROUND({mu}, 6)").alias("expected_runs"),
        F.expr(f"ROUND((r - ({mu})) / SQRT({var}), 6)").alias("z_score"),
    )




# ---------------------------------------------------------------------------
# Kruskal-Wallis H test of o_totalprice across order priorities
# ---------------------------------------------------------------------------

# the five TPC-H order priorities, pinned in canonical order so the
# pivoted 5-column expression has a FIXED operand order in both
# engines (sum-order immunity for the double H expression)
_KW_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


_KW_CRIT = 9.487729  # chi^2_4 95% critical value (frozen published)




def _kw_pivot_cols(sql: bool) -> str:
    """The 5x(n_g, r2_g) MAX(CASE) pivot — textually identical in
    Spark SQL and DuckDB."""
    cols = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        cols.append(
            f"MAX(CASE WHEN p = '{p}' THEN n_g END) AS n{i},"
            f" MAX(CASE WHEN p = '{p}' THEN r2_g END) AS r2{i}"
        )
    return ", ".join(cols)




def _kw_h_exprs() -> tuple[str, str, str]:
    """(sum_term, h, c) double expressions over the pivoted columns —
    one fixed operand order shared by both engines."""
    terms = " + ".join(
        f"CAST(r2{i} AS DOUBLE) * CAST(r2{i} AS DOUBLE) / n{i}"
        for i in range(1, 6)
    )
    # H = 12/(N(N+1)) * SUM(R_g^2/n_g) - 3(N+1) with R_g = r2_g/2,
    # so SUM(R^2/n) = sum_term/4 and the 12/4 collapses to 3
    h = f"3e0 * ({terms}) / (CAST(n AS DOUBLE) * (n + 1)) - 3e0 * (n + 1)"
    c = "1e0 - CAST(tsum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)"
    return terms, h, c




_KW_H_EXPR, _KW_C_EXPR = _kw_h_exprs()[1], _kw_h_exprs()[2]




@register(
    "kruskal_wallis_h",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority AS p,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    vt AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM h GROUP BY v),
    cum AS (
      SELECT v, ct,
             SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ct
               AS before_t
      FROM vt
    ),
    g AS (
      SELECT p, CAST(SUM(c) AS BIGINT) AS n_g,
             CAST(SUM(CAST(c AS HUGEINT) * (2 * before_t + ct + 1))
                  AS HUGEINT) AS r2_g
      FROM h JOIN cum USING (v) GROUP BY p
    ),
    ties AS (
      SELECT CAST(SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS HUGEINT)
               AS tsum
      FROM vt
    ),
    wide AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, {_kw_pivot_cols(True)}
      FROM g
    )
    SELECT n AS n_orders,
           CAST(4 AS BIGINT) AS df,
           ROUND(({_KW_H_EXPR}) / ({_KW_C_EXPR}), 6) AS h_statistic,
           ROUND({_KW_C_EXPR}, 6) AS tie_correction,
           (({_KW_H_EXPR}) / ({_KW_C_EXPR})) > {_KW_CRIT} AS significant
    FROM wide CROSS JOIN ties
    WHERE n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 AND n5 > 0
    """,
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: do the five order-priority groups share
    one o_totalprice distribution? The k-group generalization of
    ``mann_whitney_u`` — rank-based, normality-free, with EXACT
    average-rank tie handling via the shared cents-value histogram
    (2·R_g = Σ c·(2·before + t + 1) keeps every rank sum integer) and
    the tie correction C = 1 − Σ(t³−t)/(N³−N). Verdict vs the frozen
    published χ²₄ 95% critical value.

    Scale posture: values collapse to a cents histogram (one
    combinable aggregation); the rank walk is a single banded prefix
    over the histogram (the ``mann_whitney_u`` policy); the five
    groups pivot to ONE row via MAX(CASE) in pinned priority order, so
    the only double expression has a fixed operand order in both
    engines (sum-order immunity without nano-term scaffolding).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    h = orders.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    vt = h.groupBy("v").agg(F.sum("c").cast("bigint").alias("ct"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vt.select(
        "v", "ct", (F.sum("ct").over(wv) - F.col("ct")).alias("before_t")
    )
    g = (
        h.join(cum, "v")
        .groupBy("p")
        .agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.expr(
                "CAST(SUM(CAST(c AS DECIMAL(38,0))"
                " * (2 * before_t + ct + 1)) AS DECIMAL(38,0))"
            ).alias("r2_g"),
        )
    )
    ties = vt.agg(
        F.expr(
            "CAST(SUM(CAST(ct AS DECIMAL(38,0)) * ct * ct - ct)"
            " AS DECIMAL(38,0))"
        ).alias("tsum")
    )
    wide = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        *[F.expr(e).alias(a) for e, a in _kw_spark_pivot()],
    )
    return (
        wide.join(F.broadcast(ties))
        .where("n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 AND n5 > 0")
        .select(
            F.col("n").alias("n_orders"),
            F.lit(4).cast("bigint").alias("df"),
            F.expr(
                f"ROUND(({_KW_H_EXPR}) / ({_KW_C_EXPR}), 6)"
            ).alias("h_statistic"),
            F.expr(f"ROUND({_KW_C_EXPR}, 6)").alias("tie_correction"),
            F.expr(
                f"(({_KW_H_EXPR}) / ({_KW_C_EXPR})) > {_KW_CRIT}"
            ).alias("significant"),
        )
    )




def _kw_spark_pivot() -> list[tuple[str, str]]:
    """(expr, alias) pairs for the Spark-side MAX(CASE) pivot."""
    out = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        out.append((f"MAX(CASE WHEN p = '{p}' THEN n_g END)", f"n{i}"))
        out.append((f"MAX(CASE WHEN p = '{p}' THEN r2_g END)", f"r2{i}"))
    return out




# ---------------------------------------------------------------------------
# Jarque-Bera normality test on ln(o_totalprice)
# ---------------------------------------------------------------------------

_JB_CRIT = 5.991465  # chi^2_2 95% critical value (frozen published)



# population mu/sigma from the exact (n, sx, sxx) nano moments — one
# fixed double expression shared by both engines (JB uses POPULATION
# moments, unlike the sample-sigma policy in functions/moments.py)
_JB_MU = "CAST(sx AS DOUBLE) / 1e9 / n"


_JB_SIG = (
    "SQRT(GREATEST((CAST(sxx AS DOUBLE) / 1e18"
    " - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) / n)"
    " / n, 0e0))"
)


_JB_SKEW = "CAST(s3 AS DOUBLE) / n / 1e9"


_JB_XKURT = "CAST(s4 AS DOUBLE) / n / 1e9 - 3e0"


_JB_STAT = (
    f"CAST(n AS DOUBLE) / 6e0 * (({_JB_SKEW}) * ({_JB_SKEW})"
    f" + ({_JB_XKURT}) * ({_JB_XKURT}) / 4e0)"
)




@register(
    "jarque_bera_normality",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(ROUND(LN(o_totalprice) * 1000000000) AS BIGINT) AS vn
      FROM orders WHERE o_totalprice > 0
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
    SELECT n AS n_orders,
           ROUND({_JB_SKEW}, 6) AS skewness,
           ROUND({_JB_XKURT}, 6) AS excess_kurtosis,
           ROUND({_JB_STAT}, 6) AS jb_statistic,
           ({_JB_STAT}) > {_JB_CRIT} AS significant
    FROM agg WHERE n > 1
    """,
)
def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on ln(o_totalprice): JB =
    n/6·(S² + (K−3)²/4) from the standardized third and fourth
    moments, verdict vs the frozen published χ²₂ 95% critical value —
    the moment-based screen that tells a lognormal-ish revenue column
    apart from an actually-lognormal one before anyone fits a model
    that assumes it.

    Scale posture: two combinable passes — exact integer (n, Σx, Σx²)
    nano moments first (μ and population σ derive through ONE fixed
    double expression, the functions/moments.py policy), then per-row
    standardized z³/z⁴ terms nano-rounded to integers and summed
    exactly (DECIMAL(38)/HUGEINT), so partial-aggregation order can
    never move the statistic. The 1-row moments broadcast to the
    second pass; output is one row. POW(x, 3) on a finite double is
    correctly-rounded-identical in both engines for integer exponents
    (verified by the shared nano rounding).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    vals = orders.where("o_totalprice > 0").select(
        F.round(F.log(F.col("o_totalprice")) * 1_000_000_000)
        .cast("bigint")
        .alias("vn")
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
        F.expr("CAST(SUM(CAST(t3 AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "s3"
        ),
        F.expr("CAST(SUM(CAST(t4 AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "s4"
        ),
    )
    return agg.where("n > 1").select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr(f"ROUND({_JB_SKEW}, 6)").alias("skewness"),
        F.expr(f"ROUND({_JB_XKURT}, 6)").alias("excess_kurtosis"),
        F.expr(f"ROUND({_JB_STAT}, 6)").alias("jb_statistic"),
        F.expr(f"({_JB_STAT}) > {_JB_CRIT}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# Mann-Kendall trend test on daily revenue
# ---------------------------------------------------------------------------

_MK_Z975 = 1.959964  # frozen two-sided 95% normal quantile



# continuity-corrected z from the exact integers (s, var18 = 18*Var(S))
_MK_Z = (
    "CASE WHEN s > 0 THEN (s - 1) / SQRT(CAST(var18 AS DOUBLE) / 18e0)"
    " WHEN s < 0 THEN (s + 1) / SQRT(CAST(var18 AS DOUBLE) / 18e0)"
    " ELSE 0e0 END"
)




@register(
    "mann_kendall_trend",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    ties AS (
      SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                  AS HUGEINT) AS tt,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(t) AS BIGINT) AS n
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev)
    ),
    stat AS (
      SELECT n, s,
             CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tt
                  AS HUGEINT) AS var18
      FROM pairs CROSS JOIN ties
    )
    SELECT n AS n_days, s AS s_statistic,
           CAST(var18 AS BIGINT) AS var_s_x18,
           ROUND({_MK_Z}, 6) AS z_score,
           ABS({_MK_Z}) > {_MK_Z975} AS significant
    FROM stat WHERE n > 2 AND var18 > 0
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the daily revenue series:
    S = Σ_{{i<j}} sign(x_j − x_i) over all day pairs, tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18, and the
    continuity-corrected z — the nonparametric TEST that pairs with
    ``theil_sen_trend`` (the nonparametric slope ESTIMATE) and
    ``runs_test_randomness`` (which detects autocorrelation, not
    monotone direction). var_s_x18 stays the exact 18·Var(S) integer
    so no division enters the cross-engine surface.

    Scale posture: the pair stage is a self-join of the CALENDAR-
    BOUNDED daily aggregate (~2.4k rows at any scale factor — the
    reduced-aggregate rule). Day-pairs grow QUADRATICALLY in the
    calendar span: real corpora span a fixed few-year calendar at any
    volume, but the year-shifted k=100 stress dilates it to ~650
    years and measures 314× elapsed (SCALE_STRESS_r12_k100) — a
    century-scale series should switch to the Pettitt-style rank
    identity (S is computable from time-ordered rank prefixes)
    instead of the pair join.
    S and the tie terms are exact integers; z is one fixed double
    expression.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)"
                " * (2 * t + 5)) AS DECIMAL(38,0))"
            ).alias("tt"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("t").cast("bigint").alias("n"),
        )
    )
    stat = pairs.join(F.broadcast(ties)).select(
        "n",
        "s",
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - tt"
            " AS DECIMAL(38,0))"
        ).alias("var18"),
    )
    return stat.where("n > 2 AND var18 > 0").select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_statistic"),
        F.col("var18").cast("bigint").alias("var_s_x18"),
        F.expr(f"ROUND({_MK_Z}, 6)").alias("z_score"),
        F.expr(f"ABS({_MK_Z}) > {_MK_Z975}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation test on OLS daily-revenue residuals
# ---------------------------------------------------------------------------

# OLS slope/intercept from the exact integer sums — shared fixed
# double expressions (the ols_daily_revenue_trend policy)
_DW_B = (
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
)


_DW_A = f"(CAST(sy AS DOUBLE) - ({_DW_B}) * sx) / n"




@register(
    "durbin_watson_ols",
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
      SELECT d, CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT) AS e
      FROM xy CROSS JOIN sums
    ),
    lagged AS (
      SELECT e, LAG(e) OVER (ORDER BY d) AS ep FROM resid
    ),
    dw AS (
      SELECT CAST(SUM(CASE WHEN ep IS NOT NULL
                           THEN CAST(e - ep AS HUGEINT) * (e - ep)
                           ELSE 0 END) AS HUGEINT) AS num,
             CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS den,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lagged
    )
    SELECT n AS n_days,
           ROUND(CAST(num AS DOUBLE) / den, 6) AS dw_statistic,
           ROUND(1e0 - CAST(num AS DOUBLE) / den / 2e0, 6) AS rho1_approx,
           (CAST(num AS DOUBLE) / den) < 1.5 AS positive_autocorr
    FROM dw WHERE n > 2 AND den > 0
    """,
)
def durbin_watson_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the daily-revenue OLS
    trend line: DW = Σ(e_t − e_{{t−1}})² / Σe_t² ≈ 2(1 − ρ₁). DW near
    2 means the trend line's errors are serially independent; DW below
    the conventional 1.5 rule-of-thumb (frozen here — the exact
    Durbin-Watson critical tables depend on (n, k) and are not
    published as one number) flags positive autocorrelation, i.e. the
    i.i.d. error assumption behind ``ols_daily_revenue_trend``'s CI
    is violated. rho1_approx = 1 − DW/2 is the implied lag-1
    residual autocorrelation.

    Scale posture: one combinable daily aggregate; the OLS sums are
    exact integers (cents × day-index products in DECIMAL(38)); slope/
    intercept derive through ONE fixed double expression broadcast
    back; residuals round to integer cents so the DW numerator and
    denominator are EXACT integer sums (sum-order immune); the lag
    walk orders the calendar-bounded series only (the reduced-
    aggregate global-window rule).

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
        F.expr(
            f"CAST(ROUND(y - (({_DW_A}) + ({_DW_B}) * x)) AS BIGINT)"
        ).alias("e"),
    )
    wd = Window.orderBy("d")
    lagged = resid.select("e", F.lag("e").over(wd).alias("ep"))
    dw = lagged.agg(
        F.expr(
            f"CAST(SUM(CASE WHEN ep IS NOT NULL"
            f" THEN CAST(e - ep AS {d38}) * (e - ep)"
            f" ELSE 0 END) AS {d38})"
        ).alias("num"),
        F.expr(f"CAST(SUM(CAST(e AS {d38}) * e) AS {d38})").alias("den"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return dw.where("n > 2 AND den > 0").select(
        F.col("n").alias("n_days"),
        F.expr("ROUND(CAST(num AS DOUBLE) / den, 6)").alias("dw_statistic"),
        F.expr(
            "ROUND(1e0 - CAST(num AS DOUBLE) / den / 2e0, 6)"
        ).alias("rho1_approx"),
        F.expr("(CAST(num AS DOUBLE) / den) < 1.5").alias(
            "positive_autocorr"
        ),
    )




# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance-homogeneity test
# ---------------------------------------------------------------------------

_BF_CRIT = 2.371932  # F(4, inf) 95% = chi^2_4/4 (frozen; see docstring)




def _bf_pivot_cols() -> str:
    cols = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        cols.append(
            f"MAX(CASE WHEN p = '{p}' THEN n_g END) AS n{i},"
            f" MAX(CASE WHEN p = '{p}' THEN sz END) AS sz{i},"
            f" MAX(CASE WHEN p = '{p}' THEN szz END) AS szz{i}"
        )
    return ", ".join(cols)




def _bf_w_expr() -> str:
    """The Brown-Forsythe W statistic as ONE fixed-operand-order
    double expression over the pivoted (n_g, Σz, Σz²) columns."""
    n_tot = " + ".join(f"n{i}" for i in range(1, 6))
    sz_tot = " + ".join(f"CAST(sz{i} AS DOUBLE)" for i in range(1, 6))
    # between-group SS = SUM(sz_g^2/n_g) - (SUM sz)^2/N
    between = (
        " + ".join(
            f"CAST(sz{i} AS DOUBLE) * CAST(sz{i} AS DOUBLE) / n{i}"
            for i in range(1, 6)
        )
        + f" - ({sz_tot}) * ({sz_tot}) / ({n_tot})"
    )
    # within-group SS = SUM(szz_g - sz_g^2/n_g)
    within = " + ".join(
        f"(CAST(szz{i} AS DOUBLE)"
        f" - CAST(sz{i} AS DOUBLE) * CAST(sz{i} AS DOUBLE) / n{i})"
        for i in range(1, 6)
    )
    return (
        f"(CAST(({n_tot}) - 5 AS DOUBLE) / 4e0)"
        f" * ({between}) / ({within})"
    )




_BF_W = _bf_w_expr()




@register(
    "levene_brown_forsythe",
    oracle=f"""
    WITH hist AS (
      SELECT o_orderpriority AS p,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT p, v, c,
             SUM(c) OVER (PARTITION BY p ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cc,
             SUM(c) OVER (PARTITION BY p) AS n_g
      FROM hist
    ),
    med AS (
      SELECT p, MIN(v) AS m FROM cum
      WHERE cc >= (n_g + 1) // 2 GROUP BY p
    ),
    z AS (
      SELECT o.o_orderpriority AS p,
             ABS(CAST(ROUND(o.o_totalprice * 100) AS BIGINT) - med.m) AS z
      FROM orders o JOIN med ON o.o_orderpriority = med.p
    ),
    g AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(z) AS HUGEINT) AS sz,
             CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz
      FROM z GROUP BY p
    ),
    wide AS (SELECT {_bf_pivot_cols()} FROM g)
    SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS n_orders,
           CAST(4 AS BIGINT) AS df1,
           ROUND({_BF_W}, 6) AS w_statistic,
           ({_BF_W}) > {_BF_CRIT} AS significant
    FROM wide
    WHERE n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1 AND n5 > 1
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (median-based Levene) of variance
    homogeneity across the five order priorities: a one-way ANOVA F on
    z = |x − median_g|. The robust companion to ``kruskal_wallis_h``
    (which tests LOCATION; this tests SPREAD — Welch-vs-pooled
    decisions hinge on it). The verdict compares W against the frozen
    F(4, ∞) 95% critical value = χ²₄/4; the finite-sample F(4, N−5)
    critical value is strictly larger, so at the N where this engine
    runs the ∞-df approximation is conservative by < 0.1% and exact in
    the limit (documented trade; there is no closed-form F quantile to
    freeze per-N).

    Scale posture: per-group medians come from a banded prefix over
    the bounded cents histogram (exact lower median, the
    ``runs_test_randomness`` convention); |deviation| is integer cents
    so every group's (n, Σz, Σz²) is an EXACT integer triple; the five
    groups pivot to one row in pinned priority order and W is one
    fixed-operand-order double expression (sum-order immunity). Two
    combinable scans of orders, a 5-row broadcast join, one output
    row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    hist = orders.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wp = Window.partitionBy("p").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wg = Window.partitionBy("p")
    cum = hist.select(
        "p",
        "v",
        F.sum("c").over(wp).alias("cc"),
        F.sum("c").over(wg).alias("n_g"),
    )
    med = (
        cum.where("cc >= (n_g + 1) div 2")
        .groupBy("p")
        .agg(F.min("v").alias("m"))
    )
    z = orders.join(
        F.broadcast(med), orders["o_orderpriority"] == med["p"]
    ).select(
        "p",
        F.abs(
            F.round(F.col("o_totalprice") * 100).cast("bigint") - F.col("m")
        ).alias("z"),
    )
    d38 = "DECIMAL(38,0)"
    g = z.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.expr(f"CAST(SUM(z) AS {d38})").alias("sz"),
        F.expr(f"CAST(SUM(CAST(z AS {d38}) * z) AS {d38})").alias("szz"),
    )
    wide = g.agg(*[F.expr(e).alias(a) for e, a in _bf_spark_pivot()])
    return wide.where(
        "n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1 AND n5 > 1"
    ).select(
        F.expr("CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT)").alias("n_orders"),
        F.lit(4).cast("bigint").alias("df1"),
        F.expr(f"ROUND({_BF_W}, 6)").alias("w_statistic"),
        F.expr(f"({_BF_W}) > {_BF_CRIT}").alias("significant"),
    )




def _bf_spark_pivot() -> list[tuple[str, str]]:
    out = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        out.append((f"MAX(CASE WHEN p = '{p}' THEN n_g END)", f"n{i}"))
        out.append((f"MAX(CASE WHEN p = '{p}' THEN sz END)", f"sz{i}"))
        out.append((f"MAX(CASE WHEN p = '{p}' THEN szz END)", f"szz{i}"))
    return out




# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard of the return-time distribution
# ---------------------------------------------------------------------------


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS DATE) AS d FROM events
    ),
    hz AS (SELECT MAX(d) AS horizon FROM ev),
    spells AS (
      SELECT CASE WHEN nxt IS NULL THEN horizon - d ELSE nxt - d END AS t,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
      FROM (
        SELECT d, LEAD(d) OVER (PARTITION BY user_id
                                ORDER BY d, event_id) AS nxt
        FROM ev
      ) CROSS JOIN hz
    ),
    life AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d_t,
             CAST(SUM(1 - ev) AS BIGINT) AS c_t
      FROM spells GROUP BY t
    ),
    risk AS (
      SELECT t, d_t, c_t,
             CAST((SELECT COUNT(*) FROM spells)
                  - (SUM(d_t + c_t) OVER (ORDER BY t
                                          ROWS UNBOUNDED PRECEDING)
                     - (d_t + c_t)) AS BIGINT) AS n_t
      FROM life
    ),
    na AS (
      SELECT t, n_t, d_t,
             CAST(ROUND(CAST(d_t AS DOUBLE) / n_t * 1000000000) AS BIGINT)
               AS h_term,
             CAST(ROUND(CAST(d_t AS DOUBLE) * (n_t - d_t)
                        / (CAST(n_t AS DOUBLE) * n_t * n_t)
                        * 1000000000) AS BIGINT) AS v_term
      FROM risk WHERE d_t > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days, n_t AS n_risk, d_t AS n_events,
           CAST(SUM(h_term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_hazard_nano,
           CAST(SUM(v_term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS var_hazard_nano
    FROM na
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same right-
    censored return-time spells as ``kaplan_meier_return_time``:
    H(t) = Σ_{{t_i ≤ t}} d_i/n_i with the standard variance estimate
    Σ d(n−d)/n³. Where KM reports survival in log space (its d = n
    terminal row is ln 0), the hazard sum is FINITE everywhere — the
    two views cross-check via S(t) ≈ exp(−H(t)), and H's increments
    are what a proportional-hazards reading consumes.

    Scale posture: identical to KM — one LEAD window partitioned by
    user, a life-table aggregation bounded by the max gap in days,
    windows over that bounded frame only. Cross-engine determinism:
    each d/n hazard term and d(n−d)/n³ variance term is one fixed
    double expression nano-rounded BEFORE the cumulative sum
    (transcendental-sum policy, here applied to rationals so the
    prefix is an exact integer walk).

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", F.col("ts").cast("date").alias("d")
    )
    hz = ev.agg(F.max("d").alias("horizon"))
    nxt = ev.select(
        "d",
        F.lead("d")
        .over(Window.partitionBy("user_id").orderBy("d", "event_id"))
        .alias("nxt"),
    )
    spells = nxt.crossJoin(F.broadcast(hz)).select(
        F.when(F.col("nxt").isNull(), F.datediff("horizon", "d"))
        .otherwise(F.datediff("nxt", "d"))
        .alias("t"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("ev"),
    )
    life = spells.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_t"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c_t"),
    )
    total = spells.agg(F.count(F.lit(1)).cast("bigint").alias("n_spells"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = life.crossJoin(F.broadcast(total)).select(
        "t",
        "d_t",
        (
            F.col("n_spells")
            - (
                F.sum(F.col("d_t") + F.col("c_t")).over(wt)
                - (F.col("d_t") + F.col("c_t"))
            )
        )
        .cast("bigint")
        .alias("n_t"),
    )
    na = risk.where(F.col("d_t") > 0).select(
        "t",
        "n_t",
        "d_t",
        F.expr(
            "CAST(ROUND(CAST(d_t AS DOUBLE) / n_t * 1000000000) AS BIGINT)"
        ).alias("h_term"),
        F.expr(
            "CAST(ROUND(CAST(d_t AS DOUBLE) * (n_t - d_t)"
            " / (CAST(n_t AS DOUBLE) * n_t * n_t) * 1000000000) AS BIGINT)"
        ).alias("v_term"),
    )
    return na.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_t").alias("n_risk"),
        F.col("d_t").alias("n_events"),
        F.sum("h_term").over(wt).cast("bigint").alias("cum_hazard_nano"),
        F.sum("v_term").over(wt).cast("bigint").alias("var_hazard_nano"),
    )




# ---------------------------------------------------------------------------
# Log-rank test: return-time survival after a click vs after a view
# ---------------------------------------------------------------------------

_LOGRANK_CHI2_1 = 3.841459  # chi^2_1 95% critical value (frozen)



_LOGRANK_CHI2 = (
    "(CAST(o1 AS DOUBLE) - CAST(e1n AS DOUBLE) / 1e9)"
    " * (CAST(o1 AS DOUBLE) - CAST(e1n AS DOUBLE) / 1e9)"
    " / (CAST(vn AS DOUBLE) / 1e9)"
)




@register(
    "logrank_test_return_time",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, CAST(ts AS DATE) AS d
      FROM events
    ),
    hz AS (SELECT MAX(d) AS horizon FROM ev),
    spells AS (
      SELECT grp,
             CASE WHEN nxt IS NULL THEN horizon - d ELSE nxt - d END AS t,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS e
      FROM (
        SELECT event_type AS grp, d,
               LEAD(d) OVER (PARTITION BY user_id
                             ORDER BY d, event_id) AS nxt
        FROM ev
      ) CROSS JOIN hz
      WHERE grp IN ('{_KS_A}', '{_KS_B}')
    ),
    life AS (
      SELECT t,
             CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN e ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN 1 - e ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN e ELSE 0 END)
                  AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN 1 - e ELSE 0 END)
                  AS BIGINT) AS c2
      FROM spells GROUP BY t
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS na,
             CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb
      FROM spells
    ),
    risk AS (
      SELECT t, d1, d2,
             na - (SUM(d1 + c1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   - (d1 + c1)) AS n1,
             nb - (SUM(d2 + c2) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   - (d2 + c2)) AS n2
      FROM life CROSS JOIN tot
    ),
    terms AS (
      SELECT d1,
             CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2)
                        * 1000000000) AS BIGINT) AS e1_nano,
             CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * n1 * n2
                        * (n1 + n2 - d1 - d2)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))
                        * 1000000000) AS BIGINT) AS v_nano
      FROM risk WHERE d1 + d2 > 0 AND n1 + n2 > 1
    ),
    agg AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(e1_nano) AS HUGEINT) AS e1n,
             CAST(SUM(v_nano) AS HUGEINT) AS vn
      FROM terms
    )
    SELECT (SELECT na FROM tot) AS n_spells_a,
           (SELECT nb FROM tot) AS n_spells_b,
           o1 AS observed_a,
           ROUND(CAST(e1n AS DOUBLE) / 1e9, 6) AS expected_a,
           ROUND({_LOGRANK_CHI2}, 6) AS chi2_statistic,
           ({_LOGRANK_CHI2}) > {_LOGRANK_CHI2_1} AS significant
    FROM agg WHERE vn > 0
    """,
)
def logrank_test_return_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the return-time survival
    curves of spells opened by a CLICK vs spells opened by a VIEW —
    the censoring-aware answer to "do users come back faster after
    clicking than after viewing?" that a naive mean-gap comparison
    gets wrong (open spells are right-censored at the horizon, and
    dropping them biases both means). At every death time the observed
    click-group deaths are compared against the hypergeometric
    expectation d·n₁/n; the χ² verdict uses the frozen published χ²₁
    95% critical value.

    Scale posture: the spell stage is the ``kaplan_meier_return_time``
    LEAD window (one sessionize-shaped shuffle); the two-group life
    table is bounded by the max gap in days; the risk-set walk and the
    O−E/V terms run over that bounded frame only. Cross-engine
    determinism: observed counts are exact integers; each E and V term
    is one fixed-operand-order double nano-rounded BEFORE summation;
    the final χ² is one shared expression over three exact integers.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", "event_type", F.col("ts").cast("date").alias("d")
    )
    hz = ev.agg(F.max("d").alias("horizon"))
    nxt = ev.select(
        F.col("event_type").alias("grp"),
        "d",
        F.lead("d")
        .over(Window.partitionBy("user_id").orderBy("d", "event_id"))
        .alias("nxt"),
    )
    spells = (
        nxt.crossJoin(F.broadcast(hz))
        .where(F.col("grp").isin(_KS_A, _KS_B))
        .select(
            "grp",
            F.when(F.col("nxt").isNull(), F.datediff("horizon", "d"))
            .otherwise(F.datediff("nxt", "d"))
            .alias("t"),
            F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("e"),
        )
    )
    life = spells.groupBy("t").agg(
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN e ELSE 0 END)"
            " AS BIGINT)"
        ).alias("d1"),
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN 1 - e ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c1"),
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN e ELSE 0 END)"
            " AS BIGINT)"
        ).alias("d2"),
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN 1 - e ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c2"),
    )
    tot = spells.agg(
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_A}' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("na"),
        F.expr(
            f"CAST(SUM(CASE WHEN grp = '{_KS_B}' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("nb"),
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = life.crossJoin(F.broadcast(tot)).select(
        "t",
        "d1",
        "d2",
        "na",
        "nb",
        (
            F.col("na")
            - (
                F.sum(F.col("d1") + F.col("c1")).over(wt)
                - (F.col("d1") + F.col("c1"))
            )
        ).alias("n1"),
        (
            F.col("nb")
            - (
                F.sum(F.col("d2") + F.col("c2")).over(wt)
                - (F.col("d2") + F.col("c2"))
            )
        ).alias("n2"),
    )
    terms = risk.where("d1 + d2 > 0 AND n1 + n2 > 1").select(
        "na",
        "nb",
        "d1",
        F.expr(
            "CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2)"
            " * 1000000000) AS BIGINT)"
        ).alias("e1_nano"),
        F.expr(
            "CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * n1 * n2"
            " * (n1 + n2 - d1 - d2)"
            " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))"
            " * 1000000000) AS BIGINT)"
        ).alias("v_nano"),
    )
    agg = terms.groupBy("na", "nb").agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.expr("CAST(SUM(CAST(e1_nano AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "e1n"
        ),
        F.expr("CAST(SUM(CAST(v_nano AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "vn"
        ),
    )
    return agg.where("vn > 0").select(
        F.col("na").alias("n_spells_a"),
        F.col("nb").alias("n_spells_b"),
        F.col("o1").alias("observed_a"),
        F.expr("ROUND(CAST(e1n AS DOUBLE) / 1e9, 6)").alias("expected_a"),
        F.expr(f"ROUND({_LOGRANK_CHI2}, 6)").alias("chi2_statistic"),
        F.expr(f"({_LOGRANK_CHI2}) > {_LOGRANK_CHI2_1}").alias("significant"),
    )




# ---------------------------------------------------------------------------
# Individuals / moving-range (I-MR) control chart on daily revenue
# ---------------------------------------------------------------------------

# the published SPC constant for individuals charts: 3/d2 with
# d2 = 1.128 rounded to the conventional 2.66 (frozen); the violation
# verdict cross-multiplies so only INTEGERS are compared:
#   x > xbar + 2.66 * MRbar  <=>  100*(n-1)*(n*x - sx) > 266*n*smr


@register(
    "individuals_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    mr AS (
      SELECT d, x, ABS(x - LAG(x) OVER (ORDER BY d)) AS mrv FROM daily
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(mrv) AS HUGEINT) AS smr
      FROM mr
    ),
    flags AS (
      SELECT CAST(SUM(CASE WHEN 100 * (n - 1) * (CAST(n AS HUGEINT) * x - sx)
                           > 266 * n * smr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high,
             CAST(SUM(CASE WHEN 100 * (n - 1) * (CAST(n AS HUGEINT) * x - sx)
                           < -266 * n * smr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low
      FROM mr CROSS JOIN sums
    )
    SELECT n AS n_days,
           CAST(sx * 1000000 // n AS BIGINT) AS mean_cents_micro,
           CAST(smr * 1000000 // (n - 1) AS BIGINT) AS mrbar_cents_micro,
           ROUND(CAST(sx AS DOUBLE) / n
                 + 2.66e0 * CAST(smr AS DOUBLE) / (n - 1), 4) AS ucl_cents,
           ROUND(CAST(sx AS DOUBLE) / n
                 - 2.66e0 * CAST(smr AS DOUBLE) / (n - 1), 4) AS lcl_cents,
           f.n_high AS n_violations_high,
           f.n_low AS n_violations_low
    FROM sums CROSS JOIN flags f WHERE n > 1
    """,
)
def individuals_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals control chart (I-MR) on daily revenue:
    center line = the series mean, process sigma estimated from the
    mean moving range (MRbar/d₂), limits = x̄ ± 2.66·MRbar with the
    published SPC constant 2.66 = 3/d₂ frozen. Days outside the
    limits are special-cause signals — the monitoring complement to
    ``cusum_drift_daily`` (small persistent shifts) and
    ``anomaly_mad_days`` (robust fences). The violation VERDICTS are
    decided by exact cross-multiplied integer inequalities (100·(n−1)·
    (n·x − Σx) vs 266·n·ΣMR), so no double enters any flag.

    Scale posture: one combinable daily aggregate; the moving-range
    lag orders the calendar-bounded series only; sums broadcast back
    for the per-day flag pass; one output row. DECIMAL(38) holds the
    cross-products to ~1e12 daily-cents × 1e5 days.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    mr = daily.select(
        "d", "x", F.abs(F.col("x") - F.lag("x").over(wd)).alias("mrv")
    )
    d38 = "DECIMAL(38,0)"
    sums = mr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(mrv) AS {d38})").alias("smr"),
    )
    flags = mr.join(F.broadcast(sums)).agg(
        F.expr(
            f"CAST(SUM(CASE WHEN 100 * (n - 1) * (CAST(n AS {d38}) * x - sx)"
            " > 266 * n * smr THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_high"),
        F.expr(
            f"CAST(SUM(CASE WHEN 100 * (n - 1) * (CAST(n AS {d38}) * x - sx)"
            " < -266 * n * smr THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_low"),
    )
    return (
        sums.join(F.broadcast(flags))
        .where("n > 1")
        .select(
            F.col("n").alias("n_days"),
            F.expr("CAST(sx * 1000000 div n AS BIGINT)").alias(
                "mean_cents_micro"
            ),
            F.expr("CAST(smr * 1000000 div (n - 1) AS BIGINT)").alias(
                "mrbar_cents_micro"
            ),
            F.expr(
                "ROUND(CAST(sx AS DOUBLE) / n"
                " + 2.66e0 * CAST(smr AS DOUBLE) / (n - 1), 4)"
            ).alias("ucl_cents"),
            F.expr(
                "ROUND(CAST(sx AS DOUBLE) / n"
                " - 2.66e0 * CAST(smr AS DOUBLE) / (n - 1), 4)"
            ).alias("lcl_cents"),
            F.col("n_high").alias("n_violations_high"),
            F.col("n_low").alias("n_violations_low"),
        )
    )




# ---------------------------------------------------------------------------
# Cochran's Q test: paired user activity across Mon/Wed/Fri
# ---------------------------------------------------------------------------

_COCHRAN_Q_CRIT_X1E6 = 5_991_465  # chi^2_2 95% x 1e6 (frozen)




@register(
    "cochran_q_dow",
    oracle=f"""
    WITH marks AS (
      SELECT user_id, CAST(EXTRACT(dow FROM ts) AS INT) AS dow
      FROM events
      WHERE CAST(EXTRACT(dow FROM ts) AS INT) IN (1, 3, 5)
      GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    r AS (
      SELECT u.user_id, CAST(COALESCE(m.cnt, 0) AS BIGINT) AS ri
      FROM users u LEFT JOIN (
        SELECT user_id, COUNT(*) AS cnt FROM marks GROUP BY 1
      ) m ON m.user_id = u.user_id
    ),
    rsums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(ri) AS HUGEINT) AS sr,
             CAST(SUM(ri * ri) AS HUGEINT) AS srr
      FROM r
    ),
    csums AS (
      SELECT CAST(SUM(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS scc
      FROM (SELECT dow, COUNT(*) AS cj FROM marks GROUP BY dow)
    )
    SELECT n_users,
           CAST(sr AS BIGINT) AS total_marks,
           ROUND(2e0 * (3e0 * CAST(scc AS DOUBLE)
                        - CAST(sr AS DOUBLE) * sr)
                 / (3e0 * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE)), 6)
             AS q_statistic,
           CAST(2 AS BIGINT) AS df,
           (2000000 * (3 * scc - sr * sr)
            > {_COCHRAN_Q_CRIT_X1E6} * (3 * sr - srr)) AS significant
    FROM rsums CROSS JOIN csums
    WHERE 3 * sr - srr > 0
    """,
)
def cochran_q_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: is a user's propensity to be active the same
    on Monday, Wednesday and Friday? The k=3 within-subject
    generalization of ``mcnemar_weekday_weekend`` — each user is their
    own control (between-user activity differences cancel), so it
    detects DOW structure a pooled per-day count comparison would
    confound with heavy-user composition. Q = (k−1)(kΣC_j² − T²) /
    (kΣR_i − ΣR_i²), df = k−1; the verdict is an exact cross-
    multiplied integer inequality against the frozen χ²₂ literal —
    no double enters the decision.

    Scale posture: one (user, dow) distinct aggregate (the mark
    matrix never materializes beyond its nonzeros), per-user row sums
    and a 3-row column-sum reduction, one output row. All-zero and
    all-three users contribute 0 to the denominator by construction —
    the formula needs no row filtering.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    dow = (F.dayofweek("ts") - 1).cast("int")
    marks = (
        ev.select("user_id", dow.alias("dow"))
        .where(F.col("dow").isin(1, 3, 5))
        .distinct()
    )
    users = ev.select("user_id").distinct()
    per_user = marks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    r = users.join(per_user, "user_id", "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("ri")
    )
    d38 = "DECIMAL(38,0)"
    rsums = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr(f"CAST(SUM(ri) AS {d38})").alias("sr"),
        F.expr(f"CAST(SUM(ri * ri) AS {d38})").alias("srr"),
    )
    csums = (
        marks.groupBy("dow")
        .agg(F.count(F.lit(1)).alias("cj"))
        .agg(
            F.expr(f"CAST(SUM(CAST(cj AS {d38}) * cj) AS {d38})").alias(
                "scc"
            )
        )
    )
    return (
        rsums.join(F.broadcast(csums))
        .where("3 * sr - srr > 0")
        .select(
            "n_users",
            F.col("sr").cast("bigint").alias("total_marks"),
            F.expr(
                "ROUND(2e0 * (3e0 * CAST(scc AS DOUBLE)"
                " - CAST(sr AS DOUBLE) * sr)"
                " / (3e0 * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE)), 6)"
            ).alias("q_statistic"),
            F.lit(2).cast("bigint").alias("df"),
            F.expr(
                f"2000000 * (3 * scc - sr * sr)"
                f" > {_COCHRAN_Q_CRIT_X1E6} * (3 * sr - srr)"
            ).alias("significant"),
        )
    )




# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: order-status F rate across priorities
# ---------------------------------------------------------------------------

_CA_CHI2_1_X1E6 = 3_841_459  # chi^2_1 95% x 1e6 (frozen)



# priority -> trend score 1..5 in canonical urgency order, rendered as
# an identical CASE ladder in both engines
_CA_SCORE_CASE = "CASE " + " ".join(
    f"WHEN o_orderpriority = '{p}' THEN {i}"
    for i, p in enumerate(
        ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        start=1,
    )
) + " END"




@register(
    "cochran_armitage_trend",
    oracle=f"""
    WITH g AS (
      SELECT {_CA_SCORE_CASE} AS s,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_i
      FROM orders GROUP BY 1
    ),
    sums AS (
      SELECT CAST(SUM(n_i) AS HUGEINT) AS n,
             CAST(SUM(r_i) AS HUGEINT) AS r,
             CAST(SUM(s * n_i) AS HUGEINT) AS sn,
             CAST(SUM(s * r_i) AS HUGEINT) AS sr,
             CAST(SUM(s * s * n_i) AS HUGEINT) AS ssn
      FROM g
    ),
    stat AS (
      SELECT CAST(n AS BIGINT) AS n_orders, CAST(r AS BIGINT) AS n_f,
             CAST(n * sr - r * sn AS HUGEINT) AS tn,
             CAST(r * (n - r) * (n * ssn - sn * sn) AS HUGEINT) AS varn
      FROM sums
    )
    SELECT n_orders, n_f,
           ROUND(CASE WHEN tn >= 0 THEN 1e0 ELSE -1e0 END
                 * SQRT(CAST(tn AS DOUBLE) * tn * n_orders
                        / CAST(varn AS DOUBLE)), 6) AS z_score,
           (1000000 * tn * tn * n_orders
            > {_CA_CHI2_1_X1E6} * varn) AS significant
    FROM stat WHERE varn > 0
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in the finished-order
    ('F') proportion across the five ordered priorities (scores 1..5):
    where ``chi2_event_type_dow``-style omnibus tests ask "any
    difference?", this asks the sharper ordered question "does the
    rate climb or fall with urgency?" — one df, more power against
    monotone alternatives. z² = T²N/(R(N−R)(NΣs²n − (Σsn)²)) with
    T = NΣsr − RΣsn; the verdict is an exact cross-multiplied
    DECIMAL(38) inequality against the frozen χ²₁ literal (exact to
    ~1e8 orders before the cross-product nears the 38-digit cap —
    documented bound, same policy as the MWU variance product).

    Scale posture: ONE combinable 5-row aggregate over orders, then
    literal arithmetic — no joins, no windows, one output row. The
    score CASE ladder is shared text in both engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    g = orders.groupBy(F.expr(_CA_SCORE_CASE).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("r_i"),
    )
    d38 = "DECIMAL(38,0)"
    sums = g.agg(
        F.expr(f"CAST(SUM(n_i) AS {d38})").alias("n"),
        F.expr(f"CAST(SUM(r_i) AS {d38})").alias("r"),
        F.expr(f"CAST(SUM(s * n_i) AS {d38})").alias("sn"),
        F.expr(f"CAST(SUM(s * r_i) AS {d38})").alias("sr"),
        F.expr(f"CAST(SUM(s * s * n_i) AS {d38})").alias("ssn"),
    )
    stat = sums.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("r").cast("bigint").alias("n_f"),
        F.expr(f"CAST(n * sr - r * sn AS {d38})").alias("tn"),
        F.expr(
            f"CAST(r * (n - r) * (n * ssn - sn * sn) AS {d38})"
        ).alias("varn"),
    )
    return stat.where("varn > 0").select(
        "n_orders",
        "n_f",
        F.expr(
            "ROUND(CASE WHEN tn >= 0 THEN 1e0 ELSE -1e0 END"
            " * SQRT(CAST(tn AS DOUBLE) * tn * n_orders"
            " / CAST(varn AS DOUBLE)), 6)"
        ).alias("z_score"),
        F.expr(
            f"1000000 * tn * tn * n_orders > {_CA_CHI2_1_X1E6} * varn"
        ).alias("significant"),
    )




# ---------------------------------------------------------------------------
# Somers' D and Goodman-Kruskal gamma (ordinal association, asymmetric)
# ---------------------------------------------------------------------------


@register(
    "somers_d_gamma_ordinal",
    oracle="""
    WITH grid AS (
      SELECT l_quantity AS x, l_discount AS y, COUNT(*) AS nij
      FROM lineitem GROUP BY 1, 2
    ),
    conc AS (
      SELECT
        CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                 THEN CAST(a.nij AS HUGEINT) * b.nij ELSE 0 END)
             AS HUGEINT) AS c,
        CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                 THEN CAST(a.nij AS HUGEINT) * b.nij ELSE 0 END)
             AS HUGEINT) AS d
      FROM grid a JOIN grid b ON b.x > a.x
    ),
    ties AS (
      SELECT
        (SELECT CAST(SUM(CAST(rx AS HUGEINT) * (rx - 1)) AS HUGEINT)
         FROM (SELECT SUM(nij) AS rx FROM grid GROUP BY x)) AS tx2,
        (SELECT CAST(SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS HUGEINT)
         FROM (SELECT SUM(nij) AS cy FROM grid GROUP BY y)) AS ty2,
        (SELECT CAST(SUM(nij) AS HUGEINT) FROM grid) AS n
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(c.c AS BIGINT) AS concordant,
           CAST(c.d AS BIGINT) AS discordant,
           CASE WHEN t.n * (t.n - 1) - t.tx2 > 0 THEN
             ROUND(2e0 * (CAST(c.c AS DOUBLE) - CAST(c.d AS DOUBLE))
                   / (CAST(t.n AS DOUBLE) * (t.n - 1)
                      - CAST(t.tx2 AS DOUBLE)), 6) END AS somers_d_yx,
           CASE WHEN t.n * (t.n - 1) - t.ty2 > 0 THEN
             ROUND(2e0 * (CAST(c.c AS DOUBLE) - CAST(c.d AS DOUBLE))
                   / (CAST(t.n AS DOUBLE) * (t.n - 1)
                      - CAST(t.ty2 AS DOUBLE)), 6) END AS somers_d_xy,
           CASE WHEN c.c + c.d > 0 THEN
             ROUND((CAST(c.c AS DOUBLE) - CAST(c.d AS DOUBLE))
                   / (CAST(c.c AS DOUBLE) + CAST(c.d AS DOUBLE)), 6)
           END AS gk_gamma
    FROM conc c CROSS JOIN ties t
    """,
)
def somers_d_gamma_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D (both directions) and Goodman-Kruskal gamma between
    quantity and discount — the ASYMMETRIC ordinal-association family
    next to the symmetric ``kendall_tau_quantity_discount``: D(Y|X)
    conditions out pairs tied on the predictor (the right effect size
    when X predicts Y, e.g. a model score vs an outcome), gamma drops
    ALL ties (the upper bound of the three). All derive from the SAME
    concordant/discordant pair masses: D(Y|X) = 2(C−D)/(n(n−1)−Σtx²),
    gamma = (C−D)/(C+D).

    Scale posture: identical to Kendall — one combinable (x, y)
    contingency aggregate, a cell-pair join over the bounded ≤550²
    grid, bounded tie marginals, a 1-row reduction. Every mass is an
    exact HUGEINT/DECIMAL(38) integer; each coefficient is one fixed
    double expression; zero-denominator constant columns emit NULL
    identically on both engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S.load_tables(spark, sf_dir, "lineitem")["lineitem"]
    grid = t.groupBy(
        F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
    ).agg(F.count(F.lit(1)).alias("nij"))
    a = grid.alias("a")
    b = grid.alias("b")
    d38 = "DECIMAL(38,0)"
    conc = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).agg(
        F.expr(
            f"CAST(SUM(CASE WHEN b.y > a.y THEN CAST(a.nij AS {d38})"
            f" * b.nij ELSE 0 END) AS {d38})"
        ).alias("c"),
        F.expr(
            f"CAST(SUM(CASE WHEN b.y < a.y THEN CAST(a.nij AS {d38})"
            f" * b.nij ELSE 0 END) AS {d38})"
        ).alias("d"),
    )
    tx = grid.groupBy("x").agg(F.sum("nij").alias("rx")).agg(
        F.expr(f"CAST(SUM(CAST(rx AS {d38}) * (rx - 1)) AS {d38})").alias(
            "tx2"
        )
    )
    ty = grid.groupBy("y").agg(F.sum("nij").alias("cy")).agg(
        F.expr(f"CAST(SUM(CAST(cy AS {d38}) * (cy - 1)) AS {d38})").alias(
            "ty2"
        )
    )
    nn = grid.agg(F.expr(f"CAST(SUM(nij) AS {d38})").alias("n"))
    return (
        conc.join(F.broadcast(tx))
        .join(F.broadcast(ty))
        .join(F.broadcast(nn))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("c").cast("bigint").alias("concordant"),
            F.col("d").cast("bigint").alias("discordant"),
            F.expr(
                "CASE WHEN n * (n - 1) - tx2 > 0 THEN"
                " ROUND(2e0 * (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * (n - 1)"
                " - CAST(tx2 AS DOUBLE)), 6) END"
            ).alias("somers_d_yx"),
            F.expr(
                "CASE WHEN n * (n - 1) - ty2 > 0 THEN"
                " ROUND(2e0 * (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * (n - 1)"
                " - CAST(ty2 AS DOUBLE)), 6) END"
            ).alias("somers_d_xy"),
            F.expr(
                "CASE WHEN c + d > 0 THEN"
                " ROUND((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
                " / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)), 6) END"
            ).alias("gk_gamma"),
        )
    )




# ---------------------------------------------------------------------------
# Gumbel return levels for daily revenue (method-of-moments EVT)
# ---------------------------------------------------------------------------

# frozen published constants: sqrt(6)/pi, the Euler-Mascheroni gamma,
# and the Gumbel reduced variates k_T = -ln(-ln(1 - 1/T)) for the
# three conventional return periods — all literals shared verbatim by
# both engines (no transcendental is evaluated at runtime)
_GUMBEL_SQRT6_PI = 0.7796968


_GUMBEL_EULER = 0.5772157


_GUMBEL_KT = {30: 3.3842945, 100: 4.6001492, 365: 5.8985259}



_GUMBEL_MU = (
    f"(CAST(sx AS DOUBLE) / n"
    f" - {_GUMBEL_EULER} * ({_GUMBEL_SQRT6_PI} * sig))"
)


_GUMBEL_SIG = (
    "SQRT(GREATEST((CAST(sxx AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / n) * sx) / (n - 1), 0e0))"
)




def _gumbel_rows_sql() -> str:
    rows = ", ".join(f"({t}, {k})" for t, k in _GUMBEL_KT.items())
    return f"(VALUES {rows}) AS rp(return_period, kt)"




@register(
    "gumbel_return_level",
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
    params AS (
      SELECT n, sig, {_GUMBEL_MU} AS mu,
             {_GUMBEL_SQRT6_PI} * sig AS beta
      FROM (SELECT n, sx, {_GUMBEL_SIG} AS sig FROM mom)
    )
    SELECT CAST(rp.return_period AS BIGINT) AS return_period,
           CAST(p.n AS BIGINT) AS n_days,
           ROUND(p.mu, 4) AS mu_cents,
           ROUND(p.beta, 4) AS beta_cents,
           ROUND(p.mu + p.beta * rp.kt, 4) AS return_level_cents
    FROM params p CROSS JOIN {_gumbel_rows_sql()}
    WHERE p.n > 1
    ORDER BY return_period
    """,
)
def gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) return levels for daily revenue by method-of-
    moments: β = s·√6/π, μ = x̄ − γ·β, and the T-period return level
    RL(T) = μ + β·k_T with k_T = −ln(−ln(1−1/T)) — "the daily revenue
    exceeded on average once every T days". The capacity-planning
    complement to ``max_drawdown_revenue`` (worst realized) and
    ``doclen_tail_hill`` (tail heaviness): EVT turns two moments into
    calibrated extreme quantiles. All transcendental constants are
    FROZEN literals (√6/π, Euler γ, the three k_T) — no LN/EXP runs in
    either engine at runtime.

    Scale posture: one combinable daily aggregate to exact integer
    (n, Σx, Σx²) cents moments; μ/β/RL are fixed double expressions
    over those integers; the 3-row return-period table cross-joins the
    1-row fit. Output: 3 rows, bounded forever.

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
    params = mom.select(
        "n",
        "sx",
        F.expr(_GUMBEL_SIG).alias("sig"),
    ).select(
        "n",
        F.col("sig"),
        F.expr(_GUMBEL_MU).alias("mu"),
        F.expr(f"{_GUMBEL_SQRT6_PI} * sig").alias("beta"),
    )
    rp = spark.createDataFrame(
        [(t, k) for t, k in _GUMBEL_KT.items()], "return_period long, kt double"
    )
    return (
        params.join(F.broadcast(rp))
        .where("n > 1")
        .select(
            F.col("return_period").cast("bigint"),
            F.col("n").cast("bigint").alias("n_days"),
            F.expr("ROUND(mu, 4)").alias("mu_cents"),
            F.expr("ROUND(beta, 4)").alias("beta_cents"),
            F.expr("ROUND(mu + beta * kt, 4)").alias("return_level_cents"),
        )
        .orderBy("return_period")
    )




# ---------------------------------------------------------------------------
# One-way ANOVA F across order priorities (location on means)
# ---------------------------------------------------------------------------


def _anova_pivot_cols() -> str:
    cols = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        cols.append(
            f"MAX(CASE WHEN p = '{p}' THEN n_g END) AS n{i},"
            f" MAX(CASE WHEN p = '{p}' THEN s_g END) AS s{i},"
            f" MAX(CASE WHEN p = '{p}' THEN ss_g END) AS ss{i}"
        )
    return ", ".join(cols)




def _anova_exprs() -> tuple[str, str, str]:
    """(ssb, ssw, n_tot) fixed-operand-order double expressions."""
    n_tot = " + ".join(f"n{i}" for i in range(1, 6))
    s_tot = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(1, 6))
    sum_sq_over_n = " + ".join(
        f"CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / n{i}"
        for i in range(1, 6)
    )
    ss_tot = " + ".join(f"CAST(ss{i} AS DOUBLE)" for i in range(1, 6))
    ssb = f"(({sum_sq_over_n}) - ({s_tot}) * ({s_tot}) / ({n_tot}))"
    ssw = f"(({ss_tot}) - ({sum_sq_over_n}))"
    return ssb, ssw, n_tot




_ANOVA_SSB, _ANOVA_SSW, _ANOVA_N = _anova_exprs()


_ANOVA_F = (
    f"(({_ANOVA_SSB}) / 4e0)"
    f" / (({_ANOVA_SSW}) / (CAST(({_ANOVA_N}) - 5 AS DOUBLE)))"
)




@register(
    "anova_oneway_f",
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
    wide AS (SELECT {_anova_pivot_cols()} FROM g)
    SELECT CAST({_ANOVA_N} AS BIGINT) AS n_orders,
           CAST(4 AS BIGINT) AS df1,
           ROUND({_ANOVA_F}, 6) AS f_statistic,
           ROUND(({_ANOVA_SSB}) / (({_ANOVA_SSB}) + ({_ANOVA_SSW})), 6)
             AS eta_squared,
           ({_ANOVA_F}) > {_BF_CRIT} AS significant
    FROM wide
    WHERE n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1 AND n5 > 1
    """,
)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of mean o_totalprice across the five order
    priorities — the parametric LOCATION test completing the triad
    with ``kruskal_wallis_h`` (rank location) and
    ``levene_brown_forsythe`` (spread; also the homogeneity
    precondition this F assumes). η² = SSB/SST is the variance-
    explained effect size. Verdict vs the frozen F(4, ∞) 95% value =
    χ²₄/4 (conservative at finite N; same documented trade as the
    Brown-Forsythe op).

    Scale posture: ONE combinable 5-row aggregate of exact integer
    cents (n, Σx, Σx²) per group; the five groups pivot to one row in
    pinned priority order and SSB/SSW/F/η² are fixed-operand-order
    double expressions over the exact integers (sum-order immunity);
    no joins, one output row.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d38 = "DECIMAL(38,0)"
    g = orders.groupBy(F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(cents.cast("decimal(38,0)")).alias("s_g"),
        F.expr(
            "CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            f" AS {d38}) * CAST(ROUND(o_totalprice * 100) AS BIGINT))"
            f" AS {d38})"
        ).alias("ss_g"),
    )
    wide = g.agg(*[F.expr(e).alias(a) for e, a in _anova_spark_pivot()])
    return wide.where(
        "n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1 AND n5 > 1"
    ).select(
        F.expr(f"CAST({_ANOVA_N} AS BIGINT)").alias("n_orders"),
        F.lit(4).cast("bigint").alias("df1"),
        F.expr(f"ROUND({_ANOVA_F}, 6)").alias("f_statistic"),
        F.expr(
            f"ROUND(({_ANOVA_SSB}) / (({_ANOVA_SSB}) + ({_ANOVA_SSW})), 6)"
        ).alias("eta_squared"),
        F.expr(f"({_ANOVA_F}) > {_BF_CRIT}").alias("significant"),
    )




def _anova_spark_pivot() -> list[tuple[str, str]]:
    out = []
    for i, p in enumerate(_KW_PRIORITIES, start=1):
        out.append((f"MAX(CASE WHEN p = '{p}' THEN n_g END)", f"n{i}"))
        out.append((f"MAX(CASE WHEN p = '{p}' THEN s_g END)", f"s{i}"))
        out.append((f"MAX(CASE WHEN p = '{p}' THEN ss_g END)", f"ss{i}"))
    return out




# ---------------------------------------------------------------------------
# Anderson-Darling two-sample test (click vs view value distributions)
# ---------------------------------------------------------------------------

# asymptotic 5% point of the two-sample A^2 statistic (Pettitt 1976,
# frozen published literal)
_AD_CRIT = 2.492




@register(
    "anderson_darling_two_sample",
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
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS m,
             SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS b
      FROM h
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(ca + cb) AS BIGINT) AS n
      FROM h
    ),
    terms AS (
      SELECT CAST(ROUND(CAST(l AS DOUBLE)
                        * POW(CAST(t.n AS DOUBLE) * c.m
                              - CAST(t.n_a AS DOUBLE) * c.b, 2)
                        / (CAST(c.b AS DOUBLE) * (t.n - c.b))
                        * 1000000000) AS BIGINT) AS t_nano
      FROM cum c CROSS JOIN tot t
      WHERE c.b < t.n
    )
    SELECT t.n_a, CAST(t.n - t.n_a AS BIGINT) AS n_b,
           ROUND(SUM(tr.t_nano)
                 / (CAST(t.n_a AS DOUBLE) * (t.n - t.n_a) * 1e9), 6)
             AS a2_statistic,
           (SUM(tr.t_nano)
            > {_AD_CRIT} * CAST(t.n_a AS HUGEINT) * (t.n - t.n_a)
              * 1000000000) AS significant
    FROM terms tr CROSS JOIN tot t
    GROUP BY t.n_a, t.n
    HAVING t.n_a > 0 AND t.n - t.n_a > 0
    """,
)
def anderson_darling_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic between the click and
    view value distributions — the third member of the two-sample
    trio: KS weights the center (sup-distance), MWU tests location,
    A² = (1/(nm))Σ l·(N·M − n·B)²/(B(N−B)) up-weights the TAILS,
    catching distributional drift KS misses when only the extremes
    move. Discrete (tie-aware) right-ECDF formulation over the pooled
    cents histogram; verdict vs Pettitt's frozen asymptotic 5% point.

    Scale posture: the ``ks_test_click_view_value`` machinery — values
    collapse to a cents histogram (combinable), the two inclusive
    CDFs ride the banded two-pass prefix, each term is one fixed
    double expression over exact integers nano-rounded BEFORE the sum
    (sum-order immunity), and the significance compare cross-
    multiplies into exact integers. One output row.

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
    cum = _banded_prefix(cum, "v", "l", "sum", "l_below")
    cum = cum.select(
        "l",
        (F.coalesce(F.col("ca_below"), F.lit(0)) + F.col("ca")).alias("m"),
        (F.coalesce(F.col("l_below"), F.lit(0)) + F.col("l")).alias("b"),
    )
    tot = h.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("l").cast("bigint").alias("n"),
    )
    terms = cum.join(F.broadcast(tot)).where("b < n").select(
        "n_a",
        "n",
        F.expr(
            "CAST(ROUND(CAST(l AS DOUBLE)"
            " * POW(CAST(n AS DOUBLE) * m - CAST(n_a AS DOUBLE) * b, 2)"
            " / (CAST(b AS DOUBLE) * (n - b)) * 1000000000) AS BIGINT)"
        ).alias("t_nano"),
    )
    agg = terms.groupBy("n_a", "n").agg(
        F.expr(
            "CAST(SUM(CAST(t_nano AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("ts")
    )
    return agg.where("n_a > 0 AND n - n_a > 0").select(
        "n_a",
        F.expr("CAST(n - n_a AS BIGINT)").alias("n_b"),
        F.expr(
            "ROUND(CAST(ts AS DOUBLE)"
            " / (CAST(n_a AS DOUBLE) * (n - n_a) * 1e9), 6)"
        ).alias("a2_statistic"),
        F.expr(
            f"ts > {_AD_CRIT} * CAST(n_a AS DECIMAL(38,0)) * (n - n_a)"
            " * 1000000000"
        ).alias("significant"),
    )




# ---------------------------------------------------------------------------
# Periodogram power of daily revenue at candidate seasonal periods
# ---------------------------------------------------------------------------

# frozen angular frequencies 2*pi/p — full-precision literals shared
# verbatim by both engines (the literal IS the definition; truncation
# is identical on both sides)
_PERIODOGRAM_W = {
    7: "0.8975979010256552",
    14: "0.4487989505128276",
    30: "0.20943951023931953",
}




def _periodogram_vals_sql() -> str:
    rows = ", ".join(f"({p}, {w})" for p, w in _PERIODOGRAM_W.items())
    return f"(VALUES {rows}) AS pp(period, w)"




@register(
    "periodogram_power",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT x, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                     AS BIGINT) AS t
      FROM daily
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM idx
    ),
    terms AS (
      SELECT pp.period, m.n, m.sx, m.sxx,
             CAST(ROUND((i.x - CAST(m.sx AS DOUBLE) / m.n)
                        * COS(pp.w * i.t)) AS BIGINT) AS tc,
             CAST(ROUND((i.x - CAST(m.sx AS DOUBLE) / m.n)
                        * SIN(pp.w * i.t)) AS BIGINT) AS ts
      FROM idx i CROSS JOIN mom m CROSS JOIN {_periodogram_vals_sql()}
    ),
    agg AS (
      SELECT period, n, sx, sxx,
             CAST(SUM(tc) AS HUGEINT) AS c, CAST(SUM(ts) AS HUGEINT) AS s
      FROM terms GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(period AS BIGINT) AS period,
           CAST(c AS BIGINT) AS cos_sum_cents,
           CAST(s AS BIGINT) AS sin_sum_cents,
           ROUND(2e0 * SQRT(CAST(c AS DOUBLE) * c + CAST(s AS DOUBLE) * s)
                 / n, 4) AS amplitude_cents,
           ROUND((2e0 / n) * (CAST(c AS DOUBLE) * c + CAST(s AS DOUBLE) * s)
                 / (CAST(sxx AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / n) * sx), 6) AS power_share
    FROM agg WHERE n > 2
    ORDER BY period
    """,
)
def periodogram_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram power of the daily-revenue series at the three
    candidate seasonal periods (7/14/30 days): C = Σ(x−x̄)cos(ωt),
    S = Σ(x−x̄)sin(ωt), fitted-cosine amplitude 2√(C²+S²)/n, and the
    orthogonality-approximate variance share (2/n)(C²+S²)/SST — the
    SPECTRAL reading of weekly seasonality next to
    ``seasonality_dow_index`` (calendar buckets) and
    ``weekly_seasonality_strength`` (decomposition). A dominant
    power_share at 7 confirms the week; power at 30 would flag a
    billing cycle the DOW index cannot see.

    Scale posture: one combinable daily aggregate; the per-day
    cos/sin terms round to INTEGER CENTS before summation (libm's
    sub-ulp cos/sin differences are ~1e-7 cents at any revenue scale —
    ten orders of magnitude under the 0.5-cent rounding threshold —
    so the exact integer sums are engine-identical); ω literals are
    frozen. 3 bounded output rows.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    idx = daily.join(F.broadcast(mind)).select(
        "x", F.datediff("d", "d0").cast("bigint").alias("t")
    )
    d38 = "DECIMAL(38,0)"
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * x) AS {d38})").alias("sxx"),
    )
    pp = spark.createDataFrame(
        [(p, float(w)) for p, w in _PERIODOGRAM_W.items()],
        "period long, w double",
    )
    terms = (
        idx.join(F.broadcast(mom))
        .join(F.broadcast(pp))
        .select(
            "period",
            "n",
            "sx",
            "sxx",
            F.expr(
                "CAST(ROUND((x - CAST(sx AS DOUBLE) / n) * COS(w * t))"
                " AS BIGINT)"
            ).alias("tc"),
            F.expr(
                "CAST(ROUND((x - CAST(sx AS DOUBLE) / n) * SIN(w * t))"
                " AS BIGINT)"
            ).alias("ts"),
        )
    )
    agg = terms.groupBy("period", "n", "sx", "sxx").agg(
        F.expr(f"CAST(SUM(CAST(tc AS {d38})) AS {d38})").alias("c"),
        F.expr(f"CAST(SUM(CAST(ts AS {d38})) AS {d38})").alias("s"),
    )
    return (
        agg.where("n > 2")
        .select(
            F.col("period").cast("bigint"),
            F.col("c").cast("bigint").alias("cos_sum_cents"),
            F.col("s").cast("bigint").alias("sin_sum_cents"),
            F.expr(
                "ROUND(2e0 * SQRT(CAST(c AS DOUBLE) * c"
                " + CAST(s AS DOUBLE) * s) / n, 4)"
            ).alias("amplitude_cents"),
            F.expr(
                "ROUND((2e0 / n) * (CAST(c AS DOUBLE) * c"
                " + CAST(s AS DOUBLE) * s)"
                " / (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * sx),"
                " 6)"
            ).alias("power_share"),
        )
        .orderBy("period")
    )




# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test on daily event counts (lags 1..14)
# ---------------------------------------------------------------------------

_LB_CHI2_14_NANO = 23_684_791_000  # chi^2_14 95% critical x 1e9 (frozen)



# Box-Jenkins fixed-mean autocorrelation at lag k from the pair sums
# and the full-series moments — one shared double expression
_LB_RK = (
    "(CAST(sp AS DOUBLE) - (CAST(sx AS DOUBLE) / n)"
    " * (CAST(sxl AS DOUBLE) + syl)"
    " + cnt * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
    " / (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * sx)"
)




@register(
    "ljung_box_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS sx,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sxx
      FROM daily
    ),
    pairs AS (
      SELECT g.lag, a.c AS x, b.c AS y
      FROM daily a
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 14)) AS lag) g
      JOIN daily b ON b.d = a.d + CAST(g.lag AS INT)
    ),
    lagagg AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(x) AS HUGEINT) AS sxl,
             CAST(SUM(y) AS HUGEINT) AS syl,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sp
      FROM pairs GROUP BY lag
    ),
    terms AS (
      SELECT m.n, lag,
             CAST(ROUND(({_LB_RK}) * ({_LB_RK}) / (m.n - lag)
                        * 1000000000) AS BIGINT) AS t_nano
      FROM lagagg CROSS JOIN mom m
      WHERE m.n > lag AND sxx * m.n > sx * sx
    )
    SELECT n AS n_days, CAST(14 AS BIGINT) AS df,
           ROUND(CAST(n AS DOUBLE) * (n + 2) * SUM(t_nano) / 1e9, 6)
             AS q_statistic,
           (CAST(n AS HUGEINT) * (n + 2) * SUM(t_nano)
            > {_LB_CHI2_14_NANO}) AS significant
    FROM terms GROUP BY n
    """,
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test over lags 1..14 of daily event
    volume: Q = n(n+2)Σr_k²/(n−k) vs the frozen χ²₁₄ 95% critical
    value — the one-number verdict for the ``daily_acf_curve`` it
    rides beside ("is there ANY autocorrelation structure?"), with
    the standard fixed-mean Box-Jenkins r_k (full-series mean and
    variance), not the per-lag-pair Pearson the curve op reports —
    both conventions documented where they differ. Missing calendar
    days simply contribute no pair (the ACF op's convention).

    Scale posture: events collapse to the calendar-bounded daily
    aggregate first; the 14× lag fan-out and self-join run over that
    bounded series; per-lag sums are exact integers; each r_k² term is
    nano-rounded BEFORE the cross-lag sum (order immunity over 14
    rows) and the verdict cross-multiplies into exact integers.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    ev = _S._t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    d38 = "DECIMAL(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(c) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(CAST(c AS {d38}) * c) AS {d38})").alias("sxx"),
    )
    lags = daily.select(
        "d",
        F.col("c").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("lag"),
    ).select(F.expr("date_add(d, lag)").alias("d2"), "x", "lag")
    other = daily.select(F.col("d").alias("d2"), F.col("c").alias("y"))
    pairs = lags.join(F.broadcast(other), "d2")
    lagagg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.expr(f"CAST(SUM(x) AS {d38})").alias("sxl"),
        F.expr(f"CAST(SUM(y) AS {d38})").alias("syl"),
        F.expr(f"CAST(SUM(CAST(x AS {d38}) * y) AS {d38})").alias("sp"),
    )
    terms = (
        lagagg.join(F.broadcast(mom))
        .where("n > lag AND sxx * n > sx * sx")
        .select(
            "n",
            F.expr(
                f"CAST(ROUND(({_LB_RK}) * ({_LB_RK}) / (n - lag)"
                " * 1000000000) AS BIGINT)"
            ).alias("t_nano"),
        )
    )
    return terms.groupBy("n").agg(
        F.expr(
            "ROUND(CAST(n AS DOUBLE) * (n + 2) * SUM(t_nano) / 1e9, 6)"
        ).alias("q_statistic"),
        F.expr(
            f"CAST(n AS DECIMAL(38,0)) * (n + 2) * SUM(t_nano)"
            f" > {_LB_CHI2_14_NANO}"
        ).alias("significant"),
    ).select(
        F.col("n").alias("n_days"),
        F.lit(14).cast("bigint").alias("df"),
        "q_statistic",
        "significant",
    )




# ---------------------------------------------------------------------------
# Kendall's W: concordance of yearly nation-revenue rankings
# ---------------------------------------------------------------------------

_KW_CONC_CHI2_24_X1E6 = 36_415_028  # chi^2_24 95% x 1e6 (frozen)




@register(
    "kendall_w_nation_years",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
             c.c_nationkey AS nk,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT y.yr, n.n_nationkey AS nk, COALESCE(r.cents, 0) AS cents
      FROM (SELECT DISTINCT yr FROM rev) y
      CROSS JOIN nation n
      LEFT JOIN rev r ON r.yr = y.yr AND r.nk = n.n_nationkey
    ),
    ranked AS (
      SELECT yr, nk,
             ROW_NUMBER() OVER (PARTITION BY yr ORDER BY cents, nk)
               AS rnk
      FROM grid
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) AS m,
             CAST(COUNT(DISTINCT nk) AS BIGINT) AS n
      FROM ranked
    ),
    rsums AS (
      SELECT nk, CAST(SUM(rnk) AS BIGINT) AS ri FROM ranked GROUP BY nk
    ),
    s AS (
      SELECT CAST(SUM(CAST(2 * ri - m * (n + 1) AS HUGEINT)
                      * (2 * ri - m * (n + 1))) AS HUGEINT) AS t2
      FROM rsums CROSS JOIN dims
    )
    SELECT d.m AS n_years, d.n AS n_nations,
           ROUND(3e0 * CAST(s.t2 AS DOUBLE)
                 / (CAST(d.m AS DOUBLE) * d.m
                    * (CAST(d.n AS DOUBLE) * d.n * d.n - d.n)), 6) AS w,
           ROUND(3e0 * CAST(s.t2 AS DOUBLE) * (d.n - 1)
                 / (CAST(d.m AS DOUBLE)
                    * (CAST(d.n AS DOUBLE) * d.n * d.n - d.n)), 6)
             AS friedman_chi2,
           (3000000 * s.t2 * (d.n - 1)
            > {_KW_CONC_CHI2_24_X1E6} * d.m
              * (CAST(d.n AS HUGEINT) * d.n * d.n - d.n)) AS significant
    FROM s CROSS JOIN dims d
    WHERE d.m > 1 AND d.n > 1
    """,
)
def kendall_w_nation_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across the order years:
    do the yearly nation-revenue RANKINGS agree? W = 1 means the
    market ordering is frozen year over year; W near 0 means yearly
    reshuffles. Friedman's χ² = m(n−1)W gives the significance verdict
    against the frozen χ²₂₄ literal (n = 25 nations → df = 24). Ranks
    are ROW_NUMBER with the pinned (cents, nationkey) tie-break — ties
    are broken identically in both engines, so the untied W formula is
    exact (documented convention; zero-revenue nations rank lowest via
    the densified grid).

    Scale posture: orders⋈customer collapses to the bounded
    (year, nation) grid FIRST (one combinable aggregate + a broadcast
    customer-dim join); ranking windows partition by year over ≤25
    rows; sums are exact integers (2R−m(n+1) keeps everything
    integral); the verdict cross-multiplies exactly.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    t = _S._t(spark, sf_dir, "orders", "customer", "nation")
    orders, customer, nation = t["orders"], t["customer"], t["nation"]
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.col("c_nationkey").alias("nk"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    years = rev.select("yr").distinct()
    grid = (
        years.crossJoin(
            F.broadcast(nation.select(F.col("n_nationkey").alias("nk")))
        )
        .join(rev, ["yr", "nk"], "left")
        .select("yr", "nk", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    ranked = grid.select(
        "yr",
        "nk",
        F.row_number()
        .over(Window.partitionBy("yr").orderBy("cents", "nk"))
        .alias("rnk"),
    )
    dims = ranked.agg(
        F.countDistinct("yr").cast("bigint").alias("m"),
        F.countDistinct("nk").cast("bigint").alias("n"),
    )
    rsums = ranked.groupBy("nk").agg(F.sum("rnk").cast("bigint").alias("ri"))
    d38 = "DECIMAL(38,0)"
    s = rsums.join(F.broadcast(dims)).agg(
        F.expr(
            f"CAST(SUM(CAST(2 * ri - m * (n + 1) AS {d38})"
            f" * (2 * ri - m * (n + 1))) AS {d38})"
        ).alias("t2")
    )
    return (
        s.join(F.broadcast(dims))
        .where("m > 1 AND n > 1")
        .select(
            F.col("m").alias("n_years"),
            F.col("n").alias("n_nations"),
            F.expr(
                "ROUND(3e0 * CAST(t2 AS DOUBLE)"
                " / (CAST(m AS DOUBLE) * m"
                " * (CAST(n AS DOUBLE) * n * n - n)), 6)"
            ).alias("w"),
            F.expr(
                "ROUND(3e0 * CAST(t2 AS DOUBLE) * (n - 1)"
                " / (CAST(m AS DOUBLE)"
                " * (CAST(n AS DOUBLE) * n * n - n)), 6)"
            ).alias("friedman_chi2"),
            F.expr(
                f"3000000 * t2 * (n - 1) > {_KW_CONC_CHI2_24_X1E6} * m"
                f" * (CAST(n AS {d38}) * n * n - n)"
            ).alias("significant"),
        )
    )




# ---------------------------------------------------------------------------
# Permutation entropy (order 3) of the daily revenue series
# ---------------------------------------------------------------------------

_PE_LN6 = 1.791759469228055  # ln(6), frozen normalizer



# ordinal pattern of (x1, x2, x3) with the standard tie convention
# "earlier index is smaller" (so >= compares later against earlier) —
# identical CASE text in both engines; the digits are each value's
# rank (1 = smallest) in position order
_PE_PATTERN_CASE = (
    "CASE WHEN x2 >= x1 AND x3 >= x1 AND x3 >= x2 THEN '123'"
    " WHEN x2 >= x1 AND x3 >= x1 THEN '132'"
    " WHEN x2 < x1 AND x3 >= x1 THEN '213'"
    " WHEN x2 >= x1 THEN '231'"
    " WHEN x3 >= x2 THEN '312'"
    " ELSE '321' END"
)




@register(
    "permutation_entropy_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    triples AS (
      SELECT x AS x1,
             LEAD(x, 1) OVER (ORDER BY d) AS x2,
             LEAD(x, 2) OVER (ORDER BY d) AS x3
      FROM daily
    ),
    pat AS (
      SELECT {_PE_PATTERN_CASE} AS pattern, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM triples WHERE x3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(cnt * LN(CAST(cnt AS DOUBLE))
                                 * 1000000000) AS BIGINT)) AS HUGEINT)
               AS snl
      FROM pat
    )
    SELECT p.pattern, p.cnt,
           CAST(CAST(p.cnt AS HUGEINT) * 1000000 // t.n AS BIGINT)
             AS share_ppm,
           ROUND(LN(CAST(t.n AS DOUBLE))
                 - CAST(t.snl AS DOUBLE) / (t.n * 1e9), 6) AS perm_entropy,
           ROUND((LN(CAST(t.n AS DOUBLE))
                  - CAST(t.snl AS DOUBLE) / (t.n * 1e9)) / {_PE_LN6}, 6)
             AS pe_normalized
    FROM pat p CROSS JOIN tot t
    WHERE t.n > 0
    ORDER BY p.pattern
    """,
)
def permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (order 3, Bandt-Pompe) of the daily revenue
    series: the Shannon entropy of the six ordinal patterns of
    consecutive day triples, normalized by ln 6. Near 1 = the series'
    local up/down structure is maximally unpredictable (noise-like);
    low values mean repeating motifs — a complexity one-number that is
    blind to amplitude (pure ORDER), complementing ``daily_acf_curve``
    (linear memory) and ``events_burstiness``. The tie convention
    (earlier index smaller) is pinned into the shared CASE text.

    Scale posture: one combinable daily aggregate; the two LEADs
    order the calendar-bounded series only; six bounded pattern rows;
    H uses the ln N − (1/N)Σc·ln c identity with each c·ln c term
    nano-rounded before the exact integer sum. Output ≤ 6 rows.

    Reference surface: none (novel extension, SURVEY.md §2.5 stats
    family)."""
    orders = _S._t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("d")
    triples = daily.select(
        F.col("x").alias("x1"),
        F.lead("x", 1).over(wd).alias("x2"),
        F.lead("x", 2).over(wd).alias("x3"),
    )
    pat = (
        triples.where(F.col("x3").isNotNull())
        .groupBy(F.expr(_PE_PATTERN_CASE).alias("pattern"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    d38 = "DECIMAL(38,0)"
    tot = pat.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr(
            "CAST(SUM(CAST(ROUND(cnt * LN(CAST(cnt AS DOUBLE))"
            f" * 1000000000) AS BIGINT)) AS {d38})"
        ).alias("snl"),
    )
    return (
        pat.join(F.broadcast(tot))
        .where("n > 0")
        .select(
            "pattern",
            "cnt",
            F.expr(
                f"CAST(CAST(cnt AS {d38}) * 1000000 div n AS BIGINT)"
            ).alias("share_ppm"),
            F.expr(
                "ROUND(LN(CAST(n AS DOUBLE))"
                " - CAST(snl AS DOUBLE) / (n * 1e9), 6)"
            ).alias("perm_entropy"),
            F.expr(
                "ROUND((LN(CAST(n AS DOUBLE))"
                f" - CAST(snl AS DOUBLE) / (n * 1e9)) / {_PE_LN6}, 6)"
            ).alias("pe_normalized"),
        )
        .orderBy("pattern")
    )


