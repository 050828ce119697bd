"""Statistical / experimentation / audit operators (SURVEY.md §2.5
north-star extensions; no reference analogue — the reference's
relational surface is SQL shipped to Redshift, see
lib/RedshiftLoader.ts:337-393).

The family covers the measurement side of a large-scale data
platform: rolling-window distinct reach, inequality and concentration
metrics (Gini), contingency-table independence tests (chi-square),
A/B two-proportion z-tests, Kaplan-Meier retention/survival curves,
naive rolling forecasts with exact integer error terms, and join-key
skew audits (the thing you run BEFORE picking a 100 TB join
strategy).

Cross-engine determinism rules (same as the rest of the catalog):
integer arithmetic wherever sums feed comparisons (money in BIGINT
cents, error terms as exact integer multiples), transcendentals
(sqrt/ln/exp) only as the final scored expression with identical
operand order in both engines, global windows only over
already-reduced aggregates, and two-pass distributed prefix sums in
place of any global-sort running total over input-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables

def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# Trailing-window distinct reach (sliding COUNT(DISTINCT) — the window
# frame Spark/SQL cannot express directly)
# ---------------------------------------------------------------------------

_REACH_DAYS = 7


@register(
    "sliding_distinct_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT STRFTIME(days.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT ud.user_id) AS users_7d
    FROM days JOIN ud
      ON ud.d BETWEEN days.d - {_REACH_DAYS - 1} AND days.d
    GROUP BY days.d
    """,
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{n}-day distinct active users per day (rolling reach /
    WAU). ``COUNT(DISTINCT)`` over a sliding frame is not a legal
    window aggregate in Spark or ANSI SQL, so the standard rewrite is
    contribution expansion: each (user, active-day) pair contributes
    to the {n} calendar days it falls inside.

    Scale posture: the expansion runs AFTER the (user, day) dedup — a
    combinable aggregate that collapses the raw event stream (the
    dominant cardinality) down to at most |users|×|days| pairs — so
    the {n}× explode multiplies the reduced table, not the input. The
    emitted day is then semi-joined against the broadcast distinct-day
    set (bounded by the calendar), and the final distinct count
    shuffles (day, user) pairs once. No global window anywhere."""
    ev = _t(spark, sf_dir, "events")["events"]
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct().withColumnRenamed("d", "day")
    contrib = ud.select(
        "user_id",
        F.explode(F.expr(f"sequence(d, date_add(d, {_REACH_DAYS - 1}))")).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "users_7d")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue (two-pass distributed rank)
# ---------------------------------------------------------------------------

_GINI_BUCKET_CENTS = 1_000_000  # $10k revenue bands, same as pareto


@register(
    "gini_revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk
      FROM cust
    ),
    s AS (
      SELECT SUM(CAST(rnk AS HUGEINT) * rev) AS weighted,
             SUM(CAST(rev AS HUGEINT)) AS total,
             COUNT(*) AS n
      FROM ranked
    )
    SELECT n AS n_customers,
           ROUND(CAST(total AS DOUBLE) / 100.0, 2) AS total_revenue,
           ROUND(CAST(2 * weighted - (n + 1) * total AS DOUBLE)
                 / CAST(n * total AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the standard
    inequality audit next to the Pareto cut (``pareto_customer_share``,
    mining.py): G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) with x ascending.

    Scale posture: the oracle's single global ROW_NUMBER is a serial
    one-partition sort; this is the TWO-PASS distributed rank
    (``pareto_customer_share``'s prefix-sum pattern): customers band
    into fixed $10k revenue buckets, ranks are row_numbers WITHIN a
    bucket plus a broadcast per-bucket count offset (the per-bucket
    counts — a bounded-cardinality aggregate — prefix-sum on one tiny
    partition). The rank·revenue dot product accumulates in
    DECIMAL(38,0)/HUGEINT, so the 10¹⁸-magnitude sum cannot overflow
    int64 at real scale, and the final division is the only floating
    step."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cust = t.groupBy("o_custkey").agg(F.sum(cents).alias("rev"))
    cust = cust.withColumn(
        "bucket", F.floor(F.col("rev") / F.lit(_GINI_BUCKET_CENTS)).cast("bigint")
    )
    w_in = Window.partitionBy("bucket").orderBy("rev", "o_custkey")
    within = cust.withColumn("rn", F.row_number().over(w_in))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        cust.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(w_b), F.lit(0)))
        .select("bucket", "offset")
    )
    ranked = within.join(F.broadcast(offsets), "bucket").withColumn(
        "rnk", F.col("offset") + F.col("rn")
    )
    s = ranked.agg(
        F.sum(F.col("rnk").cast("decimal(19,0)") * F.col("rev").cast("decimal(19,0)")).alias(
            "weighted"
        ),
        F.sum(F.col("rev").cast("decimal(19,0)")).alias("total"),
        F.count("*").alias("n"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("total").cast("double") / 100.0, 2).alias("total_revenue"),
        F.round(
            (2 * F.col("weighted") - (F.col("n") + 1) * F.col("total")).cast("double")
            / (F.col("n") * F.col("total")).cast("double"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence: event type × day-of-week contingency table
# ---------------------------------------------------------------------------


@register(
    "chi2_event_type_dow",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    cells AS (
      SELECT event_type, dow, n,
             SUM(n) OVER (PARTITION BY event_type) AS row_tot,
             SUM(n) OVER (PARTITION BY dow) AS col_tot,
             SUM(n) OVER () AS grand
      FROM obs
    ),
    scored AS (
      SELECT event_type, dow, n,
             ROUND(CAST(row_tot * col_tot AS DOUBLE) / grand, 6) AS expected,
             ROUND(POW(n - CAST(row_tot * col_tot AS DOUBLE) / grand, 2)
                   / (CAST(row_tot * col_tot AS DOUBLE) / grand), 6) AS chi2_term
      FROM cells
    )
    SELECT event_type, dow, n AS observed, expected, chi2_term,
           ROUND(SUM(chi2_term) OVER (), 4) AS chi2_total
    FROM scored
    """,
)
def chi2_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    day-of-week: the full contingency table with per-cell expected
    counts and χ² contributions, plus the table-wide χ² statistic —
    the seasonality-vs-behavior audit every event pipeline runs.

    Scale posture: one combinable (type, dow) aggregate collapses the
    stream to ≤ |types|·7 cells; every window (row totals, column
    totals, grand total, final χ² sum) runs over that already-tiny
    cell table, never over input rows. Per-cell χ² terms are rounded
    to 6dp BEFORE the final sum and the total to 4dp, so the two
    engines' different ~35-term summation orders stay inside the
    rounding tolerance."""
    ev = _t(spark, sf_dir, "events")["events"]
    obs = (
        ev.select("event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )
    cells = (
        obs.withColumn("row_tot", F.sum("n").over(Window.partitionBy("event_type")))
        .withColumn("col_tot", F.sum("n").over(Window.partitionBy("dow")))
        .withColumn("grand", F.sum("n").over(Window.partitionBy()))
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("grand")
    scored = cells.select(
        "event_type",
        "dow",
        F.col("n").alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(F.col("n") - expected, 2) / expected, 6).alias("chi2_term"),
    )
    return scored.withColumn(
        "chi2_total", F.round(F.sum("chi2_term").over(Window.partitionBy()), 4)
    )


# ---------------------------------------------------------------------------
# A/B two-proportion z-test (deterministic hash split)
# ---------------------------------------------------------------------------


@register(
    "ab_test_proportion_z",
    oracle="""
    WITH u AS (
      SELECT user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    v AS (
      SELECT variant, COUNT(*) AS n_users, SUM(converted) AS n_converted
      FROM u GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
        CAST(MAX(CASE WHEN variant = 0 THEN n_converted END) AS BIGINT) AS conv_a,
        MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
        CAST(MAX(CASE WHEN variant = 1 THEN n_converted END) AS BIGINT) AS conv_b
      FROM v
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
    FROM wide
    """,
)
def ab_test_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between a deterministic 50/50 user split
    (variant = user_id mod 2), with the user-DAY as the experiment
    unit (did that user's day include a purchase?): per-variant
    conversion rates and the pooled-variance z statistic — the A/B
    readout every experimentation platform computes. (Per-user
    lifetime conversion saturates at 1.0 on this corpus — every user
    eventually purchases — which is exactly the degenerate-pool case
    the day-grain unit avoids.)

    Scale posture: conversion collapses per user-day first (a
    combinable MAX aggregate over the raw stream), the variant rollup is a 2-row
    aggregate, and the z formula is a single driver-free projection
    over that 2-row table pivoted wide. The one irrational (sqrt) is
    the final expression with identical operand order in both
    engines, rounded to 4dp."""
    ev = _t(spark, sf_dir, "events")["events"]
    u = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "converted"
            )
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    v = u.groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("converted").alias("n_converted")
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 4).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival / retention curve over customer lifetimes
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 90  # still-active horizon: last order within 90d of corpus end


@register(
    "survival_retention_curve",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(FLOOR(DATE_DIFF('day', MIN(o_orderdate), MAX(o_orderdate))
                        / 30.0) AS BIGINT) AS lifetime_m,
             CASE WHEN MAX(o_orderdate) >=
                    (SELECT MAX(o_orderdate) FROM orders)
                      - INTERVAL {_KM_CENSOR_DAYS} DAY
                  THEN 1 ELSE 0 END AS censored
      FROM orders GROUP BY o_custkey
    ),
    per_m AS (
      SELECT lifetime_m AS m,
             CAST(SUM(1 - censored) AS BIGINT) AS deaths,
             COUNT(*) AS leaving
      FROM cust GROUP BY lifetime_m
    ),
    risk AS (
      SELECT m, deaths,
             CAST(SUM(leaving) OVER (ORDER BY m DESC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
      FROM per_m
    ),
    fac AS (
      SELECT m, deaths, n_at_risk,
             CAST(n_at_risk - deaths AS DOUBLE) / n_at_risk AS factor
      FROM risk
    )
    SELECT m AS lifetime_month, n_at_risk, deaths,
           CASE WHEN MIN(factor) OVER (ORDER BY m
                                       ROWS UNBOUNDED PRECEDING) = 0
                THEN 0.0
                ELSE ROUND(EXP(SUM(LN(factor)) OVER (ORDER BY m
                                     ROWS UNBOUNDED PRECEDING)), 6)
           END AS survival
    FROM fac
    """,
)
def survival_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over customer lifetimes (months
    from first to last order, 30-day months in exact integer-day
    arithmetic), right-censoring customers still active within
    {censor}d of the corpus end: S(m) = Π_{{k≤m}} (1 − d_k/n_k) —
    the churn/retention curve in its standard estimator form.

    Scale posture: lifetimes collapse per customer first (combinable
    MIN/MAX aggregate), the month rollup is a ≤|months| row table,
    and every window (reverse-cumulative at-risk counts, the
    cumulative product) runs over that tiny aggregate. The product is
    EXP(SUM(LN(factor))) with IDENTICAL per-factor operands in both
    engines (each factor a single division), guarded by a prefix-MIN
    so a zero factor short-circuits to exact 0 instead of LN(0) —
    Spark's LN(0) is NULL, DuckDB's is -inf; the guard makes the
    difference unobservable."""
    t = _t(spark, sf_dir, "orders")["orders"]
    horizon = t.agg(F.max("o_orderdate").alias("end_d"))
    cust = (
        t.groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_d"), F.max("o_orderdate").alias("last_d"))
        .join(F.broadcast(horizon))
        .select(
            F.floor(F.datediff("last_d", "first_d") / 30).cast("bigint").alias(
                "lifetime_m"
            ),
            F.when(
                F.col("last_d") >= F.date_sub(F.col("end_d"), _KM_CENSOR_DAYS), 1
            )
            .otherwise(0)
            .alias("censored"),
        )
    )
    per_m = cust.groupBy(F.col("lifetime_m").alias("m")).agg(
        F.sum(1 - F.col("censored")).alias("deaths"), F.count("*").alias("leaving")
    )
    w_desc = Window.orderBy(F.col("m").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_m.withColumn("n_at_risk", F.sum("leaving").over(w_desc)).drop("leaving")
    factor = (F.col("n_at_risk") - F.col("deaths")).cast("double") / F.col("n_at_risk")
    fac = risk.withColumn("factor", factor)
    w_asc = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return fac.select(
        F.col("m").alias("lifetime_month"),
        "n_at_risk",
        "deaths",
        F.when(F.min("factor").over(w_asc) == 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(F.log("factor")).over(w_asc)), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day naive forecast with exact integer error terms
# ---------------------------------------------------------------------------

_FC_WINDOW = 7


@register(
    "rolling_forecast_error",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    wins AS (
      SELECT d, rev,
             SUM(rev) OVER (ORDER BY d
                            ROWS BETWEEN {_FC_WINDOW} PRECEDING AND 1 PRECEDING)
               AS sum_prev,
             COUNT(*) OVER (ORDER BY d
                            ROWS BETWEEN {_FC_WINDOW} PRECEDING AND 1 PRECEDING)
               AS cnt_prev
      FROM daily
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           ROUND(rev / 100.0, 2) AS revenue,
           ROUND(sum_prev / {_FC_WINDOW}.0 / 100.0, 4) AS forecast,
           CAST(ABS({_FC_WINDOW} * rev - sum_prev) AS BIGINT) AS abs_err_x7_cents
    FROM wins WHERE cnt_prev = {_FC_WINDOW}
    """,
)
def rolling_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive rolling forecast: predict each day's revenue as the mean
    of the previous {w} observed days and report the absolute error —
    the backtest primitive under every demand-forecast dashboard. The
    error column is ``|{w}·actual − Σprev|`` in BIGINT cents: an
    EXACT integer multiple of the true error, so the comparison
    carries no floating-point at all.

    Scale posture: the only global-order window runs over the DAILY
    aggregate (calendar-bounded, ~2.4k rows for 7 years — never input
    rows), which first collapses via a combinable date-keyed sum in
    BIGINT cents. The forecast itself divides the exact window sum
    once, at projection time."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = t.groupBy(F.col("o_orderdate").alias("d")).agg(F.sum(cents).alias("rev"))
    w = Window.orderBy("d").rowsBetween(-_FC_WINDOW, -1)
    wins = daily.withColumn("sum_prev", F.sum("rev").over(w)).withColumn(
        "cnt_prev", F.count("*").over(w)
    )
    return wins.filter(F.col("cnt_prev") == _FC_WINDOW).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rev") / 100.0, 2).alias("revenue"),
        F.round(F.col("sum_prev") / float(_FC_WINDOW) / 100.0, 4).alias("forecast"),
        F.abs(_FC_WINDOW * F.col("rev") - F.col("sum_prev")).alias("abs_err_x7_cents"),
    )


# ---------------------------------------------------------------------------
# Join-key skew audit (run this BEFORE picking a join strategy)
# ---------------------------------------------------------------------------


@register(
    "key_skew_report",
    oracle="""
    WITH k AS (
      SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ),
    top AS (
      SELECT l_suppkey AS top_key, cnt AS top_key_rows
      FROM k ORDER BY cnt DESC, l_suppkey LIMIT 1
    )
    SELECT CAST(SUM(k.cnt) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           MAX(top.top_key) AS top_key,
           MAX(top.top_key_rows) AS max_key_rows,
           ROUND(CAST(SUM(k.cnt) AS DOUBLE) / COUNT(*), 4) AS avg_key_rows,
           ROUND(QUANTILE_CONT(k.cnt, 0.50), 1) AS p50_key_rows,
           ROUND(QUANTILE_CONT(k.cnt, 0.99), 1) AS p99_key_rows,
           ROUND(CAST(MAX(top.top_key_rows) AS DOUBLE)
                 / (CAST(SUM(k.cnt) AS DOUBLE) / COUNT(*)), 4) AS skew_ratio
    FROM k CROSS JOIN top
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for ``lineitem.l_suppkey``: row count, key
    cardinality, the heaviest key and its share vs the mean, and
    exact p50/p99 per-key frequencies — the diagnostic that decides
    between a plain shuffle join, AQE skew splitting, and salting
    (``join_skew_salted``, analytic.py) at 100 TB.

    Scale posture: the per-key histogram is one combinable aggregate;
    everything downstream (max/argmax/percentiles) reduces the
    |keys|-row histogram, not the input. The argmax is a min_by over
    (−cnt, key) — deterministic smallest-key tiebreak matching the
    oracle's ORDER BY LIMIT 1. Exact percentiles sort only the
    histogram; at extreme key cardinality swap ``percentile`` for
    ``percentile_approx`` (same call shape)."""
    t = _t(spark, sf_dir, "lineitem")["lineitem"]
    k = t.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    return k.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.expr("min_by(l_suppkey, struct(-cnt, l_suppkey))").alias("top_key"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.sum("cnt").cast("double") / F.count("*"), 4).alias("avg_key_rows"),
        F.round(F.expr("percentile(cnt, 0.50)"), 1).alias("p50_key_rows"),
        F.round(F.expr("percentile(cnt, 0.99)"), 1).alias("p99_key_rows"),
        F.round(
            F.max("cnt").cast("double") / (F.sum("cnt").cast("double") / F.count("*")),
            4,
        ).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------


@register(
    "fk_integrity_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem' AS child_table, 'l_orderkey' AS fk_col,
             (SELECT COUNT(*) FROM lineitem) AS n_rows,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
      UNION ALL
      SELECT 'lineitem', 'l_partkey',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'lineitem', 'l_suppkey',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'orders', 'o_custkey',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer', 'c_nationkey',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
    )
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's five FK
    edges: row count and orphan count per relationship — the load
    gate every warehouse runs after ingest (an orphan count > 0 means
    a partial load or out-of-order commit upstream).

    Scale posture: each relationship is one LEFT ANTI join on the key
    (Catalyst turns NOT EXISTS into the same anti join — see
    ``subquery_exists``) feeding a count aggregate; dimension key
    sides (nation) broadcast, fact-fact edges (lineitem→orders)
    shuffle on the join key once. The five per-edge 1-row results
    union — no data moves twice."""
    t = _t(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer", "nation"
    )

    def edge(child: DataFrame, child_name: str, fk: str, parent: DataFrame, pk: str):
        total = child.agg(F.count("*").alias("n_rows"))
        orphans = (
            child.select(F.col(fk).alias("k"))
            .join(parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        return (
            total.join(orphans)
            .select(
                F.lit(child_name).alias("child_table"),
                F.lit(fk).alias("fk_col"),
                "n_rows",
                "n_orphans",
            )
        )

    edges = [
        edge(t["lineitem"], "lineitem", "l_orderkey", t["orders"], "o_orderkey"),
        edge(t["lineitem"], "lineitem", "l_partkey", t["part"], "p_partkey"),
        edge(t["lineitem"], "lineitem", "l_suppkey", t["supplier"], "s_suppkey"),
        edge(t["orders"], "orders", "o_custkey", t["customer"], "c_custkey"),
        edge(t["customer"], "customer", "c_nationkey", t["nation"], "n_nationkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


# ---------------------------------------------------------------------------
# Signup-to-purchase conversion lag
# ---------------------------------------------------------------------------


@register(
    "conversion_lag_stats",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT DATE_DIFF('microsecond', first_signup, first_purchase) AS lag_us
      FROM u
      WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_signup
    ),
    tot AS (SELECT COUNT(*) AS n_users FROM u)
    SELECT tot.n_users,
           COUNT(*) AS n_converted,
           ROUND(QUANTILE_CONT(lag_us, 0.5) / 1000000.0, 6) AS p50_lag_s,
           ROUND(QUANTILE_CONT(lag_us, 0.9) / 1000000.0, 6) AS p90_lag_s,
           ROUND(MIN(lag_us) / 1000000.0, 6) AS min_lag_s,
           ROUND(MAX(lag_us) / 1000000.0, 6) AS max_lag_s
    FROM conv CROSS JOIN tot GROUP BY tot.n_users
    """,
)
def conversion_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel metric: per user, the lag between first
    signup and first subsequent purchase, reduced to conversion count
    + exact lag percentiles — the activation-latency readout next to
    ``funnel_stages``' ordered-step counts.

    Scale posture: one combinable conditional-MIN aggregate collapses
    the event stream per user; lags are integer microseconds
    (timestampdiff — no float time math), so the percentile aggregate
    interpolates identical integers in both engines; the user total
    rides a broadcast 1-row aggregate."""
    ev = _t(spark, sf_dir, "events")["events"]
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = u.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        F.expr("timestampdiff(MICROSECOND, first_signup, first_purchase)").alias(
            "lag_us"
        )
    )
    tot = u.agg(F.count("*").alias("n_users"))
    return (
        conv.join(F.broadcast(tot))
        .groupBy("n_users")
        .agg(
            F.count("*").alias("n_converted"),
            F.round(F.percentile("lag_us", F.lit(0.5)) / 1_000_000.0, 6).alias(
                "p50_lag_s"
            ),
            F.round(F.percentile("lag_us", F.lit(0.9)) / 1_000_000.0, 6).alias(
                "p90_lag_s"
            ),
            F.round(F.min("lag_us") / 1_000_000.0, 6).alias("min_lag_s"),
            F.round(F.max("lag_us") / 1_000_000.0, 6).alias("max_lag_s"),
        )
        .select(
            "n_users", "n_converted", "p50_lag_s", "p90_lag_s", "min_lag_s", "max_lag_s"
        )
    )


# ---------------------------------------------------------------------------
# Exact weighted median (quantity-weighted price)
# ---------------------------------------------------------------------------


@register(
    "weighted_median_price",
    oracle="""
    WITH li AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (SELECT cents, SUM(w) AS w FROM li GROUP BY cents),
    c AS (
      SELECT cents, w,
             SUM(w) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM g
    ),
    t AS (SELECT SUM(w) AS tot FROM g)
    SELECT ROUND(MIN(c.cents) / 100.0, 2) AS weighted_median_price,
           CAST(MAX(t.tot) AS BIGINT) AS total_weight
    FROM c CROSS JOIN t
    WHERE 2 * c.cw >= t.tot
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median line price: the smallest price
    whose inclusive cumulative weight reaches half the total weight
    (2·cum ≥ total keeps the half exact in integers). The exact
    counterpart to approximate percentile sketches — the answer a
    t-digest would approximate, computed distributed.

    Scale posture: weights collapse to one combinable row per distinct
    price (one shuffle on the price key); the cumulative weight uses
    the banded two-pass prefix sum (broadcast band offsets — the
    oracle's single ORDER BY window is the serial formulation). The
    1-row total broadcasts back; no input-sized sort anywhere."""
    t = _t(spark, sf_dir, "lineitem")["lineitem"]
    li = t.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.round(F.col("l_quantity")).cast("bigint").alias("w"),
    )
    return weighted_median_of(li).select(
        F.round(F.col("median_value") / 100.0, 2).alias("weighted_median_price"),
        F.col("total_weight"),
    )


def weighted_median_of(vw: DataFrame) -> DataFrame:
    """Weighted-median core (see ``weighted_median_price``): one row
    (median_value, total_weight) for a (cents, w) DataFrame — the
    smallest value whose inclusive cumulative weight reaches half the
    total. Property-tested against the sorted-list model in
    tests/test_properties.py."""
    from rs_streamloader_spark.operators.quality import _banded_prefix

    g = vw.groupBy("cents").agg(F.sum("w").alias("w"))
    c = _banded_prefix(g, "cents", "w", "sum", "cum_excl")
    tot = g.agg(F.sum("w").alias("tot"))
    return (
        c.crossJoin(F.broadcast(tot))
        .where(2 * (F.col("cum_excl") + F.col("w")) >= F.col("tot"))
        .agg(
            F.min("cents").alias("median_value"),
            F.max("tot").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (bounded-memory frequency estimation)
# ---------------------------------------------------------------------------

_CMS_ROWS = 4
_CMS_WIDTH = 64
_CMS_TOPK = 10

_HEXPOS = "STRPOS('0123456789abcdef', SUBSTR({h}, {i}, 1)) - 1"


def _cms_cell_sql() -> str:
    """DuckDB: CMS cell from the first 2 hex digits of
    md5('cms{r}|' || user_id) — the same integer Spark's conv()
    computes — mod the sketch width."""
    h = "MD5('cms' || CAST(r AS VARCHAR) || '|' || CAST(user_id AS VARCHAR))"
    return (
        f"(({_HEXPOS.format(h=h, i=1)}) * 16 + ({_HEXPOS.format(h=h, i=2)}))"
        f" % {_CMS_WIDTH}"
    )


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH ru AS (
      SELECT user_id, r
      FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS r) rows
    ),
    hc AS (SELECT user_id, r, {_cms_cell_sql()} AS cell FROM ru),
    sketch AS (SELECT r, cell, COUNT(*) AS c FROM hc GROUP BY r, cell),
    exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
    ucell AS (SELECT DISTINCT user_id, r, cell FROM hc),
    est AS (
      SELECT u.user_id, MIN(s.c) AS cms_est
      FROM ucell u JOIN sketch s ON u.r = s.r AND u.cell = s.cell
      GROUP BY u.user_id
    )
    SELECT e.user_id, e.exact_n, est.cms_est,
           est.cms_est - e.exact_n AS overcount
    FROM exact e JOIN est ON e.user_id = est.user_id
    ORDER BY e.exact_n DESC, e.user_id
    LIMIT {_CMS_TOPK}
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation audited against exact
    counts: a {rows}×{width} sketch (seeded-md5 cells, identical in
    both engines) estimates per-user event counts; the top-{k} users
    by exact count report their CMS estimate and its one-sided
    overcount — the measurement you run before trusting a sketch at a
    width/traffic ratio.

    Scale posture: the sketch build is the whole point — each event
    folds into {rows}·{width} = {cells} counters via a combinable
    aggregate (map-side partials absorb the 4× explode; zero per-key
    state). The {cells}-row sketch broadcasts back against the
    per-user cell table derived from the exact aggregate. At 100 TB
    the sketch stays {cells} rows no matter the key cardinality —
    that bounded-memory invariant is what the overcount column
    prices. Exact join keyed on user_id; top-{k} is
    TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")["events"]

    def cell(r_col):
        hx = F.md5(
            F.concat(
                F.lit("cms"),
                r_col.cast("string"),
                F.lit("|"),
                F.col("user_id").cast("string"),
            )
        )
        return F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") % _CMS_WIDTH

    hc = ev.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_ROWS)])).alias("r"),
    ).select("user_id", "r", cell(F.col("r")).alias("cell"))
    sketch = hc.groupBy("r", "cell").agg(F.count("*").alias("c"))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    ucell = exact.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_ROWS)])).alias("r"),
    ).select("user_id", "r", cell(F.col("r")).alias("cell"))
    est = (
        ucell.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(_CMS_TOPK)
    )


# ---------------------------------------------------------------------------
# K-minimum-values distinct-count sketch, audited against exact
# ---------------------------------------------------------------------------

_KMV_K = 32


def _kmv_hv_sql() -> str:
    """DuckDB: uniform in [0,1) from the first 8 hex digits of
    md5('kmv|' || user_id) — the same 32-bit integer Spark's conv()
    computes, divided by 2^32."""
    h = "MD5('kmv|' || CAST(user_id AS VARCHAR))"
    terms = " + ".join(
        f"({_HEXPOS.format(h=h, i=i + 1)}) * {16 ** (7 - i)}" for i in range(8)
    )
    return f"(({terms}) / 4294967296.0)"


@register(
    "distinct_kmv_estimate",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    h AS (SELECT user_id, {_kmv_hv_sql()} AS hv FROM u),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    s AS (SELECT COUNT(*) AS kn, MAX(hv) AS uk FROM k),
    t AS (SELECT COUNT(*) AS exact_n FROM u),
    est AS (
      SELECT t.exact_n,
             CASE WHEN s.kn < {_KMV_K} THEN CAST(s.kn AS DOUBLE)
                  ELSE ({_KMV_K} - 1) / s.uk END AS raw_est
      FROM s CROSS JOIN t
    )
    SELECT exact_n,
           ROUND(raw_est, 2) AS kmv_est,
           ROUND((raw_est - exact_n) / exact_n, 4) AS rel_err
    FROM est
    """,
)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values cardinality sketch audited against the exact
    distinct count: keep the k={k} smallest normalized hashes of the
    key; estimate = (k−1)/h₍ₖ₎ (falling back to the observed count
    when fewer than k keys exist — exercised at the smallest SF). The
    md5-seeded hash is identical in both engines, so the estimate is
    bit-deterministic, and the rel_err column prices the sketch like
    ``heavy_hitters_cms`` prices CMS overcounts.

    Scale posture: KMV state is k scalars regardless of cardinality —
    the distributed form is "k smallest per partition, merge, k
    smallest again", which is exactly what Spark's
    TakeOrderedAndProject compiles the ORDER BY hv LIMIT {k} into. The
    exact count (for the audit column) is the only full-cardinality
    aggregate."""
    ev = _t(spark, sf_dir, "events")["events"]
    u = ev.select("user_id").distinct()
    hv = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    ).alias("hv")
    k = u.select(hv).orderBy("hv").limit(_KMV_K)
    s = k.agg(F.count("*").alias("kn"), F.max("hv").alias("uk"))
    t = u.agg(F.count("*").alias("exact_n"))
    raw = F.when(
        F.col("kn") < _KMV_K, F.col("kn").cast("double")
    ).otherwise((_KMV_K - 1) / F.col("uk"))
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "exact_n",
            F.round(raw, 2).alias("kmv_est"),
            F.round((raw - F.col("exact_n")) / F.col("exact_n"), 4).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Exact interpolated quantile bands per segment
# ---------------------------------------------------------------------------


@register(
    "quantiles_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
           ROUND(QUANTILE_CONT(o_totalprice, 0.50), 4) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75,
           ROUND(QUANTILE_CONT(o_totalprice, 0.90), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated order-value quartile bands (p25/p50/p75/p90)
    per order priority — the per-segment spread profile next to the
    global equi-depth histogram (``numeric_histogram_equidepth``).

    Scale posture: one aggregate keyed by the 5 priority classes.
    Spark's ``percentile`` is an exact linear-interpolation aggregate
    (same definition as DuckDB's QUANTILE_CONT); it buffers per-group
    values, which is why the group key must be low-cardinality — for
    high-cardinality keys the approx_percentile sketch or the banded
    prefix-sum scan (``weighted_median_price``) is the scale path.
    Rounded at 4dp: interpolation is a single arithmetic expression on
    two adjacent sorted values, identical operand order both engines."""
    t = _t(spark, sf_dir, "orders")["orders"]
    return t.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Sequence continuity audit (distributed gaps-and-islands)
# ---------------------------------------------------------------------------

_GAP_BAND = 1024
_GAP_TOPK = 20


@register(
    "sequence_gap_audit",
    oracle=f"""
    WITH ids AS (
      SELECT DISTINCT event_id AS id FROM events WHERE event_type = 'click'
    ),
    l AS (SELECT id, LAG(id) OVER (ORDER BY id) AS prev FROM ids)
    SELECT prev + 1 AS gap_start, id - 1 AS gap_end, id - prev - 1 AS n_missing
    FROM l
    WHERE prev IS NOT NULL AND id - prev > 1
    ORDER BY n_missing DESC, gap_start
    LIMIT {_GAP_TOPK}
    """,
)
def sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit: the largest gaps in an id stream
    that should be continuous — the check for dropped messages in a
    sequenced ingest. (Run here against the click-event id
    subsequence, which is guaranteed sparse in the synthetic corpus.)

    Scale posture: the oracle's global LAG is the serial formulation;
    distributed, ids band into fixed {band}-id ranges so gap detection
    is (1) a per-band LAG window — one shuffle on the band key, sorts
    only within bands — plus (2) a band-boundary LAG over the per-band
    min/max aggregate (input/{band} rows, the bucket-offset pattern).
    Empty bands need no special case: the boundary lag skips them and
    the gap spans automatically. Top-{k} is TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")["events"]
    ids = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("id"))
        .distinct()
    )
    return (
        gap_rows(ids, _GAP_BAND)
        .orderBy(F.col("n_missing").desc(), "gap_start")
        .limit(_GAP_TOPK)
    )


def gap_rows(ids: DataFrame, band: int) -> DataFrame:
    """Distributed gap detection core (see ``sequence_gap_audit``):
    one (gap_start, gap_end, n_missing) row per maximal run of ids
    absent from the distinct ``id`` column. Property-tested against
    the sorted-list model in tests/test_properties.py."""
    banded = ids.withColumn("band", F.floor(F.col("id") / band).cast("bigint"))
    w_in = Window.partitionBy("band").orderBy("id")
    intra = (
        banded.withColumn("prev", F.lag("id").over(w_in))
        .where(F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
            (F.col("id") - F.col("prev") - 1).alias("n_missing"),
        )
    )
    bands = banded.groupBy("band").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    w_b = Window.orderBy("band")
    inter = (
        bands.withColumn("prev_mx", F.lag("mx").over(w_b))
        .where(F.col("prev_mx").isNotNull() & (F.col("mn") - F.col("prev_mx") > 1))
        .select(
            (F.col("prev_mx") + 1).alias("gap_start"),
            (F.col("mn") - 1).alias("gap_end"),
            (F.col("mn") - F.col("prev_mx") - 1).alias("n_missing"),
        )
    )
    return intra.unionByName(inter)


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (product-analytics engagement ratio)
# ---------------------------------------------------------------------------


@register(
    "dau_mau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    daily AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    davg AS (
      SELECT STRFTIME(d, '%Y-%m') AS month,
             AVG(CAST(dau AS DOUBLE)) AS avg_dau
      FROM daily GROUP BY 1
    ),
    mau AS (
      SELECT STRFTIME(d, '%Y-%m') AS month,
             COUNT(DISTINCT user_id) AS mau
      FROM ud GROUP BY 1
    )
    SELECT davg.month, ROUND(davg.avg_dau, 6) AS avg_dau, mau.mau,
           ROUND(davg.avg_dau / mau.mau, 6) AS stickiness
    FROM davg JOIN mau ON mau.month = davg.month
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — mean daily active users over
    monthly active users, the standard engagement-depth ratio.

    Scale posture: everything reduces through the (user, day) dedup
    first (combinable; collapses the raw event stream), then three
    stacked bounded aggregates: per-day counts (calendar-bounded),
    per-month averages, per-month distinct users. The month join is
    between two calendar-bounded aggregates. Averages are exact
    integer sums divided once — deterministic across engines."""
    ev = _t(spark, sf_dir, "events")["events"]
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    daily = ud.groupBy("d").agg(F.count("*").alias("dau"))
    davg = daily.groupBy(F.date_format("d", "yyyy-MM").alias("month")).agg(
        F.avg(F.col("dau").cast("double")).alias("avg_dau")
    )
    mau = ud.groupBy(F.date_format("d", "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return davg.join(mau, "month").select(
        "month",
        F.round("avg_dau", 6).alias("avg_dau"),
        "mau",
        F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Manual HyperLogLog (m=64), audited against the exact distinct count
# ---------------------------------------------------------------------------

_HLL_M = 64


def _hll_fields_sql() -> tuple[str, str]:
    """DuckDB: (bucket, rho) from md5('hll|' || user_id) — bucket from
    the first 2 hex digits mod 64, rho = leading-zeros+1 of the next
    32 hash bits via the binary-string length identity."""
    h = "MD5('hll|' || CAST(user_id AS VARCHAR))"
    b = (
        f"(({_HEXPOS.format(h=h, i=1)}) * 16 + ({_HEXPOS.format(h=h, i=2)}))"
        f" % {_HLL_M}"
    )
    terms = " + ".join(
        f"({_HEXPOS.format(h=h, i=i + 3)}) * {16 ** (7 - i)}" for i in range(8)
    )
    rho = f"CASE WHEN ({terms}) = 0 THEN 33 ELSE 33 - LENGTH(BIN({terms})) END"
    return b, rho


def _hll_cols():
    """Spark-side twin of ``_hll_fields_sql``: the (bucket, rho)
    column pair from the same salted md5 — ONE definition shared by
    the batch estimator, the union merge, the streaming register
    replay, and its multibatch test, so the hash recipe cannot drift
    between faces."""
    h = F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % _HLL_M
    v = F.conv(F.substring(h, 3, 8), 16, 10).cast("bigint")
    rho = F.when(v == 0, 33).otherwise(33 - F.length(F.bin(v)))
    return bucket, rho


@register(
    "distinct_hll_manual",
    oracle=f"""
    WITH hr AS (
      SELECT {_hll_fields_sql()[0]} AS bucket, {_hll_fields_sql()[1]} AS rho
      FROM events
    ),
    regs AS (SELECT bucket, MAX(rho) AS m FROM hr GROUP BY bucket),
    s AS (
      SELECT SUM(POW(2.0, -m)) AS z_part, COUNT(*) AS nonempty FROM regs
    ),
    t AS (SELECT COUNT(DISTINCT user_id) AS exact_n FROM events),
    est AS (
      SELECT t.exact_n,
             {_HLL_M} - s.nonempty AS zeros,
             (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
               / (s.z_part + ({_HLL_M} - s.nonempty)) AS raw
      FROM s CROSS JOIN t
    )
    SELECT exact_n,
           ROUND(CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                      THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / zeros)
                      ELSE raw END, 2) AS hll_est,
           ROUND((CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                       THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / zeros)
                       ELSE raw END - exact_n) / exact_n, 4) AS rel_err
    FROM est
    """,
)
def distinct_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from first principles (m={m} registers), audited
    against the exact distinct count — the exact-auditable twin of the
    engine-native ``agg_approx_distinct`` (whose HLL sketch is
    implementation-defined and therefore rows-only). Register index =
    6 md5 bits, rho = leading-zeros+1 of the next 32 bits via the
    binary-string-length identity (no float log in the register path);
    harmonic-mean estimate with the standard small-range linear
    count ing correction.

    Scale posture: the register build is one combinable MAX aggregate
    into {m} keys — constant state at any cardinality, the same
    bounded-memory invariant ``heavy_hitters_cms`` demonstrates for
    frequency. Σ2^(−M) sums EXACT DYADIC doubles (each a power of two
    ≥ 2⁻³³), so the reduction is order-independent — no float-sum
    trap. The exact count exists only for the audit column."""
    ev = _t(spark, sf_dir, "events")["events"]
    bucket, rho = _hll_cols()
    regs = (
        ev.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_part"),
        F.count("*").alias("nonempty"),
    )
    t = ev.agg(F.countDistinct("user_id").alias("exact_n"))
    zeros = F.lit(_HLL_M) - F.col("nonempty")
    raw = (
        F.lit(0.7213 / (1 + 1.079 / _HLL_M))
        * _HLL_M
        * _HLL_M
        / (F.col("z_part") + zeros)
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (zeros > 0),
        _HLL_M * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(raw)
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "exact_n",
            F.round(est, 2).alias("hll_est"),
            F.round((est - F.col("exact_n")) / F.col("exact_n"), 4).alias(
                "rel_err"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson-ish bootstrap CI for mean order value
# ---------------------------------------------------------------------------

_BOOT_B = 32


def _boot_w_sql(b: int) -> str:
    """DuckDB: resample b's 0/1/2 weight from 2 bits of ONE md5 per
    order — hex digit b//2, low nibble half for even b, high for odd."""
    h = "MD5('bs|' || CAST(o_orderkey AS VARCHAR))"
    d = f"({_HEXPOS.format(h=h, i=b // 2 + 1)})"
    if b % 2 == 0:
        return f"({d} % 2 + ({d} // 2) % 2)"
    return f"(({d} // 4) % 2 + ({d} // 8) % 2)"


@register(
    "bootstrap_ci_revenue",
    oracle=f"""
    WITH ob AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, b
      FROM orders
      CROSS JOIN (SELECT UNNEST(RANGE(0, {_BOOT_B})) AS b) bs
    ),
    w AS (
      SELECT b, cents,
             CASE {" ".join(f"WHEN b = {b} THEN {_boot_w_sql(b)}" for b in range(_BOOT_B))}
             END AS w
      FROM ob
    ),
    means AS (
      SELECT b,
             CAST(SUM(w * cents) AS DOUBLE) / (100.0 * SUM(w)) AS mean_val
      FROM w GROUP BY b
    )
    SELECT COUNT(*) AS n_resamples,
           ROUND(AVG(mean_val), 4) AS boot_mean,
           ROUND(QUANTILE_CONT(mean_val, 0.025), 4) AS ci_lo,
           ROUND(QUANTILE_CONT(mean_val, 0.975), 4) AS ci_hi
    FROM means
    """,
)
def bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order value with
    DETERMINISTIC resampling: each of B={b} resamples weights every
    order 0/1/2× (prob ¼/½/¼ — a two-bit "double-or-nothing" Poisson
    bootstrap, mean weight 1), all {b} weights drawn from ONE md5 per
    order ({b}·2 = 64 hash bits), so both engines draw the IDENTICAL
    resamples and the CI is bit-reproducible — the audit-grade variant
    of an estimator usually left nondeterministic.

    Scale posture: ZERO row expansion — the {b} weighted partial sums
    are 2·{b} aggregate columns of ONE single-scan aggregate (weighted
    sums in exact BIGINT cents), computed map-side and merged in one
    constant-width reduction; the 1-row result unpivots to the
    {b}-row means table for the quantile interpolation. One md5 per
    order (the first rewrite hashed per (order, resample): 32× the
    hash work and a 32× explode — measured 5.6s → this shape at
    sf0.1). This is the pattern for CI-at-scale: resample-id as an
    aggregate COLUMN, never materialized copies of the data."""
    t = _t(spark, sf_dir, "orders")["orders"]
    h = F.md5(F.concat(F.lit("bs|"), F.col("o_orderkey").cast("string")))
    base = t.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        # two 32-bit halves: values < 2^32 are exact in the double
        # divisions below (2^32 ≪ 2^53), so every bit extraction is
        # exact — a single 64-bit decimal would round at the decimal
        # division's result scale before floor()
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("lo"),
    )

    def w(b: int):
        # hex digit b//2 of the hash = 4 bits; even b takes the low
        # bit pair, odd b the high pair — the same bits as the
        # oracle's STRPOS digit walk
        half = F.col("hi") if b // 2 < 8 else F.col("lo")
        pos = b // 2 if b // 2 < 8 else b // 2 - 8
        shift = 4 * (7 - pos) + (0 if b % 2 == 0 else 2)
        fld = F.floor(half / F.lit(float(2 ** shift))).cast("bigint")
        return (fld % 2) + (F.floor(fld / 2).cast("bigint") % 2)

    aggs = []
    for b in range(_BOOT_B):
        wb = w(b)
        aggs.append(F.sum(wb * F.col("cents")).alias(f"sw{b}"))
        aggs.append(F.sum(wb).alias(f"n{b}"))
    one = base.agg(*aggs)
    means = one.select(
        F.explode(
            F.array(
                *[
                    (F.col(f"sw{b}").cast("double") / (100.0 * F.col(f"n{b}"))).alias(
                        f"m{b}"
                    )
                    for b in range(_BOOT_B)
                ]
            )
        ).alias("mean_val")
    )
    return means.agg(
        F.count("*").alias("n_resamples"),
        F.round(F.avg("mean_val"), 4).alias("boot_mean"),
        F.round(F.percentile("mean_val", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("mean_val", F.lit(0.975)), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Lag-1 / lag-7 autocorrelation of the daily event-count series
# ---------------------------------------------------------------------------


def _autocorr_sql(lag: int) -> str:
    return f"""
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM (
        SELECT CAST(cnt AS HUGEINT) AS x,
               CAST(LEAD(cnt, {lag}) OVER (ORDER BY d) AS HUGEINT) AS y
        FROM daily
      ) WHERE y IS NOT NULL
    """


@register(
    "daily_counts_autocorr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    l1 AS ({_autocorr_sql(1)}),
    l7 AS ({_autocorr_sql(7)})
    SELECT l1.n AS n_pairs_lag1,
           ROUND((l1.n * l1.sxy - l1.sx * l1.sy)
                 / SQRT(CAST((l1.n * l1.sxx - l1.sx * l1.sx)
                        * (l1.n * l1.syy - l1.sy * l1.sy) AS DOUBLE)), 6)
             AS r_lag1,
           l7.n AS n_pairs_lag7,
           ROUND((l7.n * l7.sxy - l7.sx * l7.sy)
                 / SQRT(CAST((l7.n * l7.sxx - l7.sx * l7.sx)
                        * (l7.n * l7.syy - l7.sy * l7.sy) AS DOUBLE)), 6)
             AS r_lag7
    FROM l1 CROSS JOIN l7
    """,
)
def daily_counts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 Pearson autocorrelation of the daily event
    count series — the seasonality screen that says whether a weekly
    cycle exists before fitting anything (pairs with
    ``events_hourly_seasonality``'s profile view).

    Scale posture: events reduce to the calendar-bounded daily
    aggregate first; LEAD windows and the five moment sums run over
    that tiny series. Moments accumulate in DECIMAL(38,0)/HUGEINT
    (counts² sums overflow int64 at real traffic), and the one
    floating step is the final normalized ratio, identical operand
    order in both engines."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("d")

    def moments(lag: int, suffix: str) -> DataFrame:
        x = F.col("cnt").cast("decimal(19,0)")
        y = F.lead("cnt", lag).over(w).cast("decimal(19,0)")
        pairs = daily.select(x.alias("x"), y.alias("y")).where(F.col("y").isNotNull())
        return pairs.agg(
            F.count("*").alias(f"n{suffix}"),
            F.sum("x").alias(f"sx{suffix}"),
            F.sum("y").alias(f"sy{suffix}"),
            F.sum(F.col("x") * F.col("y")).alias(f"sxy{suffix}"),
            F.sum(F.col("x") * F.col("x")).alias(f"sxx{suffix}"),
            F.sum(F.col("y") * F.col("y")).alias(f"syy{suffix}"),
        )

    def r(s: str):
        n = F.col(f"n{s}")
        num = n * F.col(f"sxy{s}") - F.col(f"sx{s}") * F.col(f"sy{s}")
        den = F.sqrt(
            (
                (n * F.col(f"sxx{s}") - F.col(f"sx{s}") * F.col(f"sx{s}"))
                * (n * F.col(f"syy{s}") - F.col(f"sy{s}") * F.col(f"sy{s}"))
            ).cast("double")
        )
        return F.round(num.cast("double") / den, 6)

    return (
        moments(1, "1")
        .crossJoin(F.broadcast(moments(7, "7")))
        .select(
            F.col("n1").alias("n_pairs_lag1"),
            r("1").alias("r_lag1"),
            F.col("n7").alias("n_pairs_lag7"),
            r("7").alias("r_lag7"),
        )
    )


# ---------------------------------------------------------------------------
# Weekly seasonality strength (variance decomposition by day-of-week)
# ---------------------------------------------------------------------------


@register(
    "weekly_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    keyed AS (
      SELECT CAST(EXTRACT(dow FROM d) AS INT) AS dow,
             CAST(cnt AS HUGEINT) AS x
      FROM daily
    ),
    g AS (
      SELECT dow, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx FROM keyed
      GROUP BY dow
    ),
    s AS (
      SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sxx) AS sxx,
             SUM(CAST(ROUND((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                             * 1000000, 0) AS BIGINT)) AS ssw_micro
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n, 4)
             AS var_total,
           ROUND(ssw_micro / 1000000.0 / n, 4) AS var_within_dow,
           ROUND(1 - (ssw_micro / 1000000.0)
                     / (sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n), 6)
             AS seasonality_strength
    FROM s
    """,
)
def weekly_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength of the weekly cycle in daily event volume: the
    fraction of day-to-day variance explained by day-of-week (1 −
    SS_within/SS_total — the one-way ANOVA R² with dow as the
    factor). The scalar decision companion to
    ``daily_counts_autocorr``'s r_lag7 and
    ``events_hourly_seasonality``'s full profile.

    Scale posture: events collapse to the calendar-bounded daily
    aggregate, then to 7 dow groups; moments (Σx, Σx²) stay exact
    HUGEINT/DECIMAL until the final variance ratios. The per-group
    sx²/n float terms are rounded to integer micro-units BEFORE the
    7-row SS_within sum (exact, order-independent integer adds — the
    source_token_entropy accumulation policy), so no cross-engine
    float-summation-order exposure remains."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("cnt"))
    keyed = daily.select(
        F.dayofweek("d").alias("dow_raw"),
        F.col("cnt").cast("decimal(19,0)").alias("x"),
    ).select((F.col("dow_raw") - 1).alias("dow"), "x")
    g = keyed.groupBy("dow").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # each per-dow within-group term is rounded to integer MICRO-units
    # before the 7-row sum — 7 exact integer adds instead of a float
    # accumulation whose operand order is engine/partition dependent
    # (the oracle applies the identical per-term round)
    # square AFTER the double cast: a decimal sx*sx product overflows
    # (ANSI error) once sx exceeds ~3e18, while double(sx) is exact for
    # any realistic count (< 2^53) and both engines then round the
    # product identically (review r7 finding)
    term = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
    )
    s = g.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sxx").alias("sxx"),
        F.sum(F.round(term * 1000000, 0).cast("bigint")).alias("ssw_micro"),
    )
    ss_total = F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double") / F.col("n")
    ss_within = F.col("ssw_micro") / 1000000.0
    return s.select(
        F.col("n").alias("n_days"),
        F.round(ss_total / F.col("n"), 4).alias("var_total"),
        F.round(ss_within / F.col("n"), 4).alias("var_within_dow"),
        F.round(1 - ss_within / ss_total, 6).alias(
            "seasonality_strength"
        ),
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS sz,
             COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS l_div
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT COUNT(*) AS n_classes,
           MIN(sz) AS k_anonymity,
           MIN(l_div) AS l_diversity,
           CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
           CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT) AS n_risky_individuals
    FROM cls
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before releasing a dataset keyed on
    quasi-identifiers: k-anonymity (smallest equivalence class over
    (nation, segment)) and l-diversity (fewest distinct sensitive
    values — $1k balance bands — within any class), plus how many
    classes and individuals sit below k={k}.

    Scale posture: one combinable aggregate on the QI tuple (the
    distinct-sensitive count is a per-class aggregate on the same
    shuffle), then a 1-row rollup over the bounded class table. Pure
    integers end to end."""
    t = _t(spark, sf_dir, "customer")["customer"]
    cls = t.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("sz"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        ).alias("l_div"),
    )
    risky = F.when(F.col("sz") < _KANON_K, 1).otherwise(0)
    return cls.agg(
        F.count("*").alias("n_classes"),
        F.min("sz").alias("k_anonymity"),
        F.min("l_div").alias("l_diversity"),
        F.sum(risky).alias("n_risky_classes"),
        F.sum(F.when(F.col("sz") < _KANON_K, F.col("sz")).otherwise(0)).alias(
            "n_risky_individuals"
        ),
    )


# ---------------------------------------------------------------------------
# MAD-based robust daily anomaly detection
# ---------------------------------------------------------------------------

_MAD_MULT = 3


@register(
    "anomaly_mad_days",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    med AS (SELECT QUANTILE_CONT(cnt, 0.5) AS m FROM daily),
    mad AS (
      SELECT QUANTILE_CONT(ABS(daily.cnt - med.m), 0.5) AS mad
      FROM daily CROSS JOIN med
    )
    SELECT STRFTIME(daily.d, '%Y-%m-%d') AS day, daily.cnt,
           ROUND(ABS(daily.cnt - med.m), 2) AS deviation
    FROM daily CROSS JOIN med CROSS JOIN mad
    WHERE ABS(daily.cnt - med.m) > {_MAD_MULT} * mad.mad
    """,
)
def anomaly_mad_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on daily event volume: flag days more
    than {mult}×MAD from the median — the outlier screen that, unlike
    ``anomaly_zscore``'s mean/stddev, is not itself dragged by the
    outliers it hunts (median/MAD have a 50% breakdown point).

    Scale posture: events reduce to the calendar-bounded daily
    aggregate; median and MAD are two exact percentile aggregates over
    it, broadcast back as 1-row tables. Identical interpolation
    (percentile ≡ QUANTILE_CONT) and identical comparison expressions
    keep the flag set bit-deterministic."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("cnt"))
    med = daily.agg(F.percentile("cnt", F.lit(0.5)).alias("m"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "adev", F.abs(F.col("cnt") - F.col("m"))
    )
    mad = dev.agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .where(F.col("adev") > _MAD_MULT * F.col("mad"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "cnt",
            F.round("adev", 2).alias("deviation"),
        )
    )


# ---------------------------------------------------------------------------
# Uplift readout by segment (A/B split × day-of-week)
# ---------------------------------------------------------------------------


@register(
    "uplift_by_segment",
    oracle="""
    WITH u AS (
      SELECT user_id % 2 AS variant,
             CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1, 2, user_id, CAST(ts AS DATE)
    ),
    v AS (
      SELECT dow, variant, COUNT(*) AS n, SUM(converted) AS conv
      FROM u GROUP BY dow, variant
    ),
    wide AS (
      SELECT dow,
             MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
             MAX(CASE WHEN variant = 0 THEN conv END) AS conv_a,
             MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
             MAX(CASE WHEN variant = 1 THEN conv END) AS conv_b
      FROM v GROUP BY dow
    )
    SELECT dow, n_a, n_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
           ROUND(CAST(conv_b AS DOUBLE) / n_b
                 - CAST(conv_a AS DOUBLE) / n_a, 6) AS uplift
    FROM wide
    """,
)
def uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift readout: the A/B split of
    ``ab_test_proportion_z`` (variant = user_id mod 2, user-day
    units) broken out by day-of-week — the heterogeneous-treatment
    view that tells an experimenter WHERE an effect concentrates
    before averaging it away globally.

    Scale posture: conversion collapses per (user, day, variant)
    first (combinable MAX over the raw stream), the segment×variant
    rollup is a 14-row aggregate pivoted wide per segment, and the
    rate arithmetic is single-expression doubles over exact
    integers."""
    ev = _t(spark, sf_dir, "events")["events"]
    u = (
        ev.groupBy(
            (F.col("user_id") % 2).alias("variant"),
            F.to_date("ts").alias("d"),
            (F.dayofweek("ts") - 1).alias("dow"),
            "user_id",
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    v = u.groupBy("dow", "variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = v.groupBy("dow").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    return wide.select(
        "dow",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(p_b - p_a, 6).alias("uplift"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per signup cohort by age)
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             MIN(EXTRACT(year FROM o_orderdate) * 12
                 + EXTRACT(month FROM o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    ),
    sz AS (SELECT cohort_m, COUNT(*) AS cohort_size FROM fo GROUP BY cohort_m),
    rev AS MATERIALIZED (
      SELECT fo.cohort_m,
             EXTRACT(year FROM o.o_orderdate) * 12
               + EXTRACT(month FROM o.o_orderdate) - fo.cohort_m AS age_m,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_m, age_m,
             SUM(rev_c) OVER (PARTITION BY cohort_m ORDER BY age_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      FROM rev
    )
    SELECT CAST(cum.cohort_m AS BIGINT) AS cohort_m,
           CAST(cum.age_m AS BIGINT) AS age_m,
           sz.cohort_size,
           ROUND(CAST(cum.cum_c // sz.cohort_size AS BIGINT) / 100.0, 2)
             AS ltv_per_user
    FROM cum JOIN sz ON sz.cohort_m = cum.cohort_m
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    month; cumulative revenue per cohort member at each month of age —
    the payback/LTV table that prices acquisition spend
    (``retention_cohorts``'s revenue sibling).

    Scale posture: first-order month is one combinable MIN per
    customer; the cohort join keys on custkey (co-partitioned with
    the orders shuffle); monthly revenue collapses to the bounded
    (cohort × age) grid BEFORE the cumulative window runs over it;
    cohort sizes broadcast back. Money stays BIGINT cents until the
    final display division."""
    t = _t(spark, sf_dir, "orders")["orders"]
    month = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    fo = t.groupBy("o_custkey").agg(F.min(month).alias("cohort_m"))
    sz = fo.groupBy("cohort_m").agg(F.count("*").alias("cohort_size"))
    rev = (
        t.join(fo, "o_custkey")
        .groupBy(
            "cohort_m", (month - F.col("cohort_m")).alias("age_m")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_c"
            )
        )
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_c", F.sum("rev_c").over(w))
    # integer cents-per-user FIRST (exact `div` in both engines), so
    # the 2dp display round sees an exactly-2-decimal value — dividing
    # doubles before rounding put cum/size on half boundaries and
    # flipped the last digit between engines
    per_user_cents = F.expr("cum_c div cohort_size")
    return cum.join(F.broadcast(sz), "cohort_m").select(
        F.col("cohort_m").cast("bigint").alias("cohort_m"),
        F.col("age_m").cast("bigint").alias("age_m"),
        "cohort_size",
        F.round(per_user_cents / 100.0, 2).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# New vs returning users per month
# ---------------------------------------------------------------------------


@register(
    "new_vs_returning_users",
    oracle="""
    WITH um AS (
      SELECT DISTINCT user_id,
             EXTRACT(year FROM ts) * 12 + EXTRACT(month FROM ts) AS m
      FROM events
    ),
    first AS (SELECT user_id, MIN(m) AS first_m FROM um GROUP BY user_id),
    active AS (SELECT m, COUNT(*) AS active_users FROM um GROUP BY m),
    new_u AS (SELECT first_m AS m, COUNT(*) AS new_users FROM first GROUP BY 1)
    SELECT CAST(active.m AS BIGINT) AS month_idx,
           active.active_users,
           COALESCE(new_u.new_users, 0) AS new_users,
           active.active_users - COALESCE(new_u.new_users, 0)
             AS returning_users,
           ROUND(CAST(COALESCE(new_u.new_users, 0) AS DOUBLE)
                 / active.active_users, 6) AS new_share
    FROM active LEFT JOIN new_u ON new_u.m = active.m
    """,
)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning monthly split: a month's actives decompose
    into first-ever-seen users and returners — the top-of-dashboard
    growth decomposition next to ``dau_mau_stickiness`` and
    ``orders_monthly_growth``.

    Scale posture: the (user, month) dedup collapses the raw stream
    once; first-seen is a per-user MIN on the same key layout; both
    monthly rollups are calendar-bounded and join broadcast-small."""
    ev = _t(spark, sf_dir, "events")["events"]
    um = ev.select(
        "user_id", (F.year("ts") * 12 + F.month("ts")).alias("m")
    ).distinct()
    first = um.groupBy("user_id").agg(F.min("m").alias("first_m"))
    active = um.groupBy("m").agg(F.count("*").alias("active_users"))
    new_u = first.groupBy(F.col("first_m").alias("m")).agg(
        F.count("*").alias("new_users")
    )
    nu = F.coalesce(F.col("new_users"), F.lit(0))
    return active.join(F.broadcast(new_u), "m", "left").select(
        F.col("m").cast("bigint").alias("month_idx"),
        "active_users",
        nu.alias("new_users"),
        (F.col("active_users") - nu).alias("returning_users"),
        F.round(nu.cast("double") / F.col("active_users"), 6).alias("new_share"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase time distribution (repeat-purchase cadence)
# ---------------------------------------------------------------------------


@register(
    "interpurchase_time_stats",
    oracle="""
    WITH seq AS MATERIALIZED (
      SELECT o_custkey,
             DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS gap_d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    g AS (SELECT CAST(gap_d AS BIGINT) AS gap_d FROM seq WHERE gap_d IS NOT NULL)
    SELECT COUNT(*) AS n_gaps,
           ROUND(QUANTILE_CONT(gap_d, 0.25), 2) AS p25_days,
           ROUND(QUANTILE_CONT(gap_d, 0.50), 2) AS p50_days,
           ROUND(QUANTILE_CONT(gap_d, 0.75), 2) AS p75_days,
           ROUND(AVG(CAST(gap_d AS DOUBLE)), 4) AS mean_days
    FROM g
    """,
)
def interpurchase_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders — the number that calibrates churn
    windows and re-engagement timing (a 30-day "inactive" flag is
    meaningless if the p75 gap is 45 days).

    Scale posture: one LAG window per customer partition (single
    shuffle on the natural key, ties broken by orderkey), gaps as
    exact integer days, then one global percentile/mean aggregate.
    The mean is an exact-integer sum divided once."""
    t = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t.select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("bigint").alias("gap_d")
        )
        .where(F.col("gap_d").isNotNull())
    )
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.round(F.percentile("gap_d", F.lit(0.25)), 2).alias("p25_days"),
        F.round(F.percentile("gap_d", F.lit(0.50)), 2).alias("p50_days"),
        F.round(F.percentile("gap_d", F.lit(0.75)), 2).alias("p75_days"),
        F.round(F.avg(F.col("gap_d").cast("double")), 4).alias("mean_days"),
    )


# ---------------------------------------------------------------------------
# Burstiness of hourly event traffic (Fano factor + burstiness index)
# ---------------------------------------------------------------------------


@register(
    "events_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT DATE_TRUNC('hour', ts) AS h, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(cnt AS HUGEINT)) AS sx,
             SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx
      FROM hourly
    ),
    m AS (
      SELECT n, CAST(sx AS DOUBLE) / n AS mu,
             CAST(sxx AS DOUBLE) / n
               - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS var
      FROM s
    )
    SELECT n AS n_hours,
           ROUND(mu, 4) AS mean_per_hour,
           ROUND(var / mu, 4) AS fano_factor,
           ROUND((SQRT(var) - mu) / (SQRT(var) + mu), 6) AS burstiness
    FROM m
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness of the hourly event series: the Fano factor
    (variance/mean — 1 for a Poisson process, >1 overdispersed) and
    the Goh–Barabási burstiness index (σ−μ)/(σ+μ) ∈ (−1, 1) — the
    two scalars that decide whether capacity planning can assume
    Poisson arrivals.

    Scale posture: events collapse to the calendar-bounded hourly
    aggregate; moments stay HUGEINT/DECIMAL-exact; the three final
    expressions are identical-operand-order doubles."""
    ev = _t(spark, sf_dir, "events")["events"]
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("cnt")
    )
    x = F.col("cnt").cast("decimal(19,0)")
    s = hourly.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * F.col("cnt")).alias("sxx"),
    )
    mu = F.col("sx").cast("double") / F.col("n")
    var = F.col("sxx").cast("double") / F.col("n") - mu * mu
    return s.select(
        F.col("n").alias("n_hours"),
        F.round(mu, 4).alias("mean_per_hour"),
        F.round(var / mu, 4).alias("fano_factor"),
        F.round((F.sqrt(var) - mu) / (F.sqrt(var) + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal index (ratio-to-moving-average decomposition)
# ---------------------------------------------------------------------------


@register(
    "seasonality_dow_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    ma AS (
      SELECT d, cnt,
             SUM(cnt) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS s7,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS n7
      FROM daily
    ),
    det AS (
      SELECT CAST(EXTRACT(dow FROM d) AS INT) AS dow,
             CAST(ROUND(CAST(cnt AS DOUBLE) * n7 * 1000000000 / s7)
                  AS BIGINT) AS r_nano
      FROM ma WHERE n7 = 7
    )
    SELECT dow, COUNT(*) AS n_days,
           ROUND(CAST(SUM(r_nano) AS DOUBLE) / COUNT(*) / 1000000000, 6)
             AS seasonal_index
    FROM det GROUP BY dow
    """,
)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ratio-to-moving-average seasonal indices by
    day-of-week: each day's count over its centered 7-day moving
    average, averaged per weekday — index >1 means that weekday runs
    above trend (the decomposition table behind
    ``weekly_seasonality_strength``'s single R² scalar). Edge days
    without a full 7-day window are excluded (n7 = 7), so no partial-
    window bias.

    Scale posture: the moving-average window orders the
    calendar-bounded daily aggregate. Cross-engine determinism: each
    day's detrended ratio is ONE double expression (cnt·7·1e9/s7 over
    exact integers) rounded to integer NANO-units, so the per-weekday
    mean is an exact integer sum divided once."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("cnt"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(w7).alias("s7"),
        F.count("*").over(w7).alias("n7"),
    )
    det = ma.where(F.col("n7") == 7).select(
        (F.dayofweek("d") - 1).alias("dow"),
        F.round(
            F.col("cnt").cast("double") * F.col("n7") * 1_000_000_000 / F.col("s7")
        )
        .cast("bigint")
        .alias("r_nano"),
    )
    return det.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.round(
            F.sum("r_nano").cast("double") / F.count("*") / 1_000_000_000, 6
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue movers per nation
# ---------------------------------------------------------------------------

_MOVERS_TOPK = 10


@register(
    "revenue_movers_mom",
    oracle=f"""
    WITH nm AS (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM o.o_orderdate) * 12
               + EXTRACT(month FROM o.o_orderdate) AS m,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    ch AS (
      SELECT nation, m, rev_c,
             LAG(rev_c) OVER (PARTITION BY nation ORDER BY m) AS prev_c
      FROM nm
    )
    SELECT nation, CAST(m AS BIGINT) AS month_idx,
           ROUND(rev_c / 100.0, 2) AS revenue,
           ROUND(prev_c / 100.0, 2) AS prev_revenue,
           ROUND((rev_c - prev_c) / 100.0, 2) AS delta
    FROM ch WHERE prev_c IS NOT NULL
    ORDER BY ABS(rev_c - prev_c) DESC, nation, m
    LIMIT {_MOVERS_TOPK}
    """,
)
def revenue_movers_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top month-over-month revenue movers by nation: the {k} largest
    absolute swings between consecutive months — the "what changed"
    screen a revenue dashboard opens with (global twin:
    ``orders_monthly_growth``).

    Scale posture: nation broadcasts (25 rows); customer grows O(SF),
    so the orders⋈customer edge is left to AQE (shuffle at scale,
    broadcast only while customer is actually small) — force-hinting
    it would OOM a 100 TB run. Revenue collapses to the bounded
    (nation, month) grid BEFORE the per-nation LAG; the top-{k}
    compiles to TakeOrderedAndProject. Money stays BIGINT cents;
    consecutive-month deltas are exact integers."""
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    nm = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c"))
    )
    w = Window.partitionBy("nation").orderBy("m")
    ch = nm.withColumn("prev_c", F.lag("rev_c").over(w)).where(
        F.col("prev_c").isNotNull()
    )
    return (
        ch.select(
            "nation",
            F.col("m").cast("bigint").alias("month_idx"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("prev_c") / 100.0, 2).alias("prev_revenue"),
            F.round((F.col("rev_c") - F.col("prev_c")) / 100.0, 2).alias("delta"),
            F.abs(F.col("rev_c") - F.col("prev_c")).alias("_absd"),
        )
        .orderBy(F.col("_absd").desc(), "nation", "month_idx")
        .limit(_MOVERS_TOPK)
        .drop("_absd")
    )


# ---------------------------------------------------------------------------
# Discount elasticity screen (quantity response by discount band)
# ---------------------------------------------------------------------------


@register(
    "discount_elasticity",
    oracle="""
    WITH li AS (
      SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS net_c
      FROM lineitem
    ),
    bands AS (
      SELECT disc_pct, COUNT(*) AS n,
             SUM(qty) AS sq, SUM(net_c) AS snet
      FROM li GROUP BY disc_pct
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(disc_pct AS HUGEINT)) AS sx,
             SUM(CAST(qty AS HUGEINT)) AS sy,
             SUM(CAST(disc_pct AS HUGEINT) * qty) AS sxy,
             SUM(CAST(disc_pct AS HUGEINT) * disc_pct) AS sxx,
             SUM(CAST(qty AS HUGEINT) * qty) AS syy
      FROM li
    )
    SELECT b.disc_pct, b.n,
           ROUND(CAST(b.sq AS DOUBLE) / b.n, 4) AS avg_qty,
           ROUND(b.snet / 100.0, 2) AS net_revenue,
           ROUND((mom.n * mom.sxy - mom.sx * mom.sy)
                 / SQRT(CAST((mom.n * mom.sxx - mom.sx * mom.sx)
                        * (mom.n * mom.syy - mom.sy * mom.sy) AS DOUBLE)), 6)
             AS qty_discount_corr
    FROM bands b CROSS JOIN mom
    """,
)
def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-effectiveness screen: per discount band, volume and
    net revenue, plus the global quantity↔discount Pearson
    correlation — the first-look answer to "do discounts move volume
    or just give margin away" (q19's pricing cousin, measurement-side).

    Scale posture: two combinable aggregates over one lineitem scan
    pattern (the ~11-band rollup and the 1-row moment set, which
    broadcasts back). Moments accumulate HUGEINT/DECIMAL-exact; the
    correlation is one final double expression."""
    t = _t(spark, sf_dir, "lineitem")["lineitem"]
    li = t.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("net_c"),
    )
    bands = li.groupBy("disc_pct").agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("sq"),
        F.sum("net_c").alias("snet"),
    )
    x = F.col("disc_pct").cast("decimal(19,0)")
    y = F.col("qty").cast("decimal(19,0)")
    mom = li.agg(
        F.count("*").alias("mn"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * F.col("qty")).alias("sxy"),
        F.sum(x * F.col("disc_pct")).alias("sxx"),
        F.sum(y * F.col("qty")).alias("syy"),
    )
    num = F.col("mn") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (
            (F.col("mn") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("mn") * F.col("syy") - F.col("sy") * F.col("sy"))
        ).cast("double")
    )
    return bands.crossJoin(F.broadcast(mom)).select(
        "disc_pct",
        "n",
        F.round(F.col("sq").cast("double") / F.col("n"), 4).alias("avg_qty"),
        F.round(F.col("snet") / 100.0, 2).alias("net_revenue"),
        F.round(num.cast("double") / den, 6).alias("qty_discount_corr"),
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) proportional allocation
# ---------------------------------------------------------------------------

_ALLOC_BUDGET = 10_000


@register(
    "allocation_largest_remainder",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    q AS (
      SELECT nation, rev_c,
             CAST(rev_c AS HUGEINT) * {_ALLOC_BUDGET} AS num,
             SUM(rev_c) OVER () AS tot
      FROM rev
    ),
    fl AS (
      SELECT nation, rev_c,
             CAST(num // tot AS BIGINT) AS floor_alloc,
             CAST(num % tot AS BIGINT) AS rem
      FROM q
    ),
    rk AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, nation) AS INT) AS rem_rank,
             {_ALLOC_BUDGET} - SUM(floor_alloc) OVER () AS leftover
      FROM fl
    )
    SELECT nation, CAST(rev_c AS BIGINT) AS rev_c, floor_alloc,
           CAST(floor_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rk
    """,
)
def allocation_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional allocation of a fixed budget (quota of
    {budget} units) across nations by revenue, using the
    largest-remainder (Hamilton) method: every nation gets
    floor(budget·share), and the unallocated remainder units go to the
    largest fractional remainders — the exact-sum apportionment used
    for quota sampling, budget splits, and seat allocation.

    Scale posture: the input collapses to a 25-row nation aggregate
    before any window runs (global windows only over bounded
    aggregates); the orders⋈customer join shuffles on the natural key
    while nation broadcasts. Cross-engine determinism: everything is
    integer — the quota numerator is DECIMAL(38)/HUGEINT (rev_c ·
    budget overflows int64 at ~1e15 cents), floor and remainder come
    from integer div/mod, and remainder ties break by nation name."""
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
        )
    )
    wall = Window.partitionBy()
    q = rev.select(
        "nation",
        "rev_c",
        F.expr(f"CAST(rev_c AS DECIMAL(38,0)) * {_ALLOC_BUDGET}").alias("num"),
        F.sum("rev_c").over(wall).alias("tot"),
    )
    fl = q.select(
        "nation",
        "rev_c",
        F.expr("CAST(num div tot AS BIGINT)").alias("floor_alloc"),
        F.expr("CAST(num % tot AS BIGINT)").alias("rem"),
    )
    rk = fl.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("rem").desc(), "nation"))
        .alias("rem_rank"),
        (F.lit(_ALLOC_BUDGET) - F.sum("floor_alloc").over(wall)).alias("leftover"),
    )
    return rk.select(
        "nation",
        "rev_c",
        "floor_alloc",
        (
            F.col("floor_alloc")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Exponential-smoothing forecast over the trailing revenue window
# ---------------------------------------------------------------------------

_SES_DAYS = 16


@register(
    "ses_forecast_daily",
    oracle=f"""
    WITH bounds AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders
    ),
    daily AS (
      SELECT o.o_orderpriority AS priority,
             CAST(o.o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o CROSS JOIN bounds b
      WHERE CAST(o.o_orderdate AS DATE) > b.maxd - {_SES_DAYS}
      GROUP BY 1, 2
    ),
    weighted AS (
      SELECT d2.priority,
             COUNT(*) AS n_days,
             SUM(CAST(d2.rev_c AS HUGEINT)
                 * CAST(POWER(2, {_SES_DAYS - 1} - DATEDIFF('day', d2.d, b.maxd))
                        AS BIGINT)) AS ws
      FROM daily d2 CROSS JOIN bounds b
      GROUP BY 1
    )
    SELECT priority, n_days,
           CAST(ws // {2 ** _SES_DAYS} AS BIGINT) AS forecast_cents
    FROM weighted
    """,
)
def ses_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing (alpha = 1/2) revenue forecast per
    order priority over the trailing {days}-day window: forecast =
    sum over the window of 2^-(age+1) * revenue(day), the dyadic SES
    truncation. Days with no orders contribute zero weight mass
    — no gap-fill join is needed because 0 revenue adds 0.

    Scale posture: the trailing-window predicate is pushed to the scan
    (dynamic via a 1-row broadcast of max date), so 100 TB of history
    prunes to {days} days of partitions; everything after is a 5-row
    priority aggregate. Cross-engine determinism: weights are exact
    powers of two applied to integer cents, summed as
    DECIMAL(38)/HUGEINT (cents · 2^15 · window overflows int64 at
    ~1e14 daily cents), and the final smoothing divide is a single
    integer floor-division — no float appears anywhere."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    bounds = orders.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    daily = (
        orders.join(F.broadcast(bounds))
        .where(F.to_date("o_orderdate") > F.date_sub(F.col("maxd"), _SES_DAYS))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
        )
    )
    weighted = (
        daily.join(F.broadcast(bounds))
        .groupBy("priority")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(
                F.expr(
                    f"CAST(rev_c AS DECIMAL(38,0)) * CAST(POWER(2, "
                    f"{_SES_DAYS - 1} - DATEDIFF(maxd, d)) AS BIGINT)"
                )
            ).alias("ws"),
        )
    )
    return weighted.select(
        "priority",
        "n_days",
        F.expr(f"CAST(ws div {2 ** _SES_DAYS} AS BIGINT)").alias("forecast_cents"),
    )


# ---------------------------------------------------------------------------
# Calendar gap-fill of the daily event series
# ---------------------------------------------------------------------------


@register(
    "calendar_fill_daily",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
      FROM events
    ),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, UNNEST(generate_series(b.dmin, b.dmax,
             INTERVAL 1 DAY))::DATE AS d
      FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN bounds b
    )
    SELECT g.event_type,
           STRFTIME(g.d, '%Y-%m-%d') AS day,
           COALESCE(daily.cnt, 0) AS cnt,
           CASE WHEN daily.cnt IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g
    LEFT JOIN daily ON daily.event_type = g.event_type AND daily.d = g.d
    """,
)
def calendar_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts: the (event_type × calendar day)
    grid over the observed date span, zero-filling days with no
    events — the densification step every charting/forecast consumer
    needs before a time-series model sees the data.

    Scale posture: events collapse to the calendar-bounded (type, day)
    aggregate FIRST; the grid is generated from a broadcast 1-row
    bounds aggregate crossed with the distinct type list (5 rows), so
    both fill-join sides are days·types — calendar-bounded, never
    data-sized — and the (type, day) aggregate broadcasts into the
    preserved grid. Dates leave as formatted strings (TZ
    invariance)."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"), F.max(F.to_date("ts")).alias("dmax")
    )
    types = ev.select("event_type").distinct()
    grid = types.join(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(dmin, dmax, interval 1 day)")).alias("d"),
    )
    return (
        grid.join(F.broadcast(daily), ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.when(F.col("cnt").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (batch)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7


@register(
    "attribution_linear_batch",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_type AS touch_type, ts AS tts FROM events
      WHERE event_type IN ('click', 'view')
    ),
    attributed AS (
      SELECT p.pid, t.touch_type,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touches
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.tts < p.pts
       AND t.tts >= p.pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
    )
    SELECT touch_type,
           COUNT(*) AS n_touches,
           COUNT(DISTINCT pid) AS n_purchases,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_micro
    FROM attributed
    GROUP BY touch_type
    """,
)
def attribution_linear_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits one unit
    of credit equally across the user's click/view touches in the
    {days}-day lookback window; credit rolls up per touch channel —
    the batch twin of the streaming ``attribution_join_outer``
    (first-touch) operator, completing the attribution family.

    Scale posture: the purchase⋈touch join shuffles both sides on
    user_id once; fanout is bounded by per-user activity in a 7-day
    window, and the per-purchase touch count is a window partitioned
    by purchase id (bounded the same way) — no global window, no
    driver loop. Cross-engine determinism: credit is integer
    floor-division micro-units (1e6 // n), so no float division ever
    disagrees; output is a per-channel integer rollup."""
    ev = _t(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_type").alias("touch_type"), F.col("ts").alias("tts")
    )
    attributed = (
        purchases.join(touches, "user_id")
        .where(
            (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAY"))
        )
        .select(
            "pid",
            "touch_type",
            F.count("*").over(Window.partitionBy("pid")).alias("n_touches"),
        )
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_touches"),
        F.countDistinct("pid").alias("n_purchases"),
        F.sum(F.expr("1000000 div n_touches")).alias("credit_micro"),
    )


# ---------------------------------------------------------------------------
# Exact distributed PERCENTILE_DISC per segment (histogram index math)
# ---------------------------------------------------------------------------

_PDISC_QS = ((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (19, 20, "p95"))


@register(
    "percentile_disc_by_segment",
    oracle=f"""
    WITH hist AS (
      SELECT c_mktsegment AS segment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
             COUNT(*) AS cnt
      FROM customer GROUP BY 1, 2
    ),
    cum AS (
      SELECT segment, bal_c, cnt,
             SUM(cnt) OVER (PARTITION BY segment ORDER BY bal_c
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n
      FROM hist
    ),
    qs AS (
      SELECT * FROM (VALUES
        {", ".join(f"({num}, {den}, '{lbl}')" for num, den, lbl in _PDISC_QS)}
      ) AS v(q_num, q_den, q_label)
    )
    SELECT c.segment, q.q_label, c.bal_c AS value_cents, c.n
    FROM cum c JOIN qs q
      ON c.cum >= (c.n * q.q_num + q.q_den - 1) // q.q_den
     AND c.cum - c.cnt < (c.n * q.q_num + q.q_den - 1) // q.q_den
    """,
)
def percentile_disc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed PERCENTILE_DISC (p25/p50/p75/p95 of customer
    account balance per market segment) via the value-histogram
    pattern: the quantile index is located in the cumulative histogram
    instead of sorting rows — the way exact quantiles survive 100 TB.

    Scale posture: raw rows collapse to a (segment, value) histogram
    FIRST (map-side combinable); the cumulative window orders the
    histogram — cardinality = distinct values per segment, not rows —
    and the quantile probe is a broadcast join of a 4-row literal
    table. Cross-engine determinism: PERCENTILE_DISC's index
    ceil(q·n) is computed as exact integer arithmetic
    (n·num + den − 1) // den on both engines, and the selected value
    is an actual data element (BIGINT cents) — no interpolation, no
    float, no reliance on either engine's quantile built-in."""
    cust = _t(spark, sf_dir, "customer")["customer"]
    hist = cust.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    ).agg(F.count("*").alias("cnt"))
    wseg = Window.partitionBy("segment")
    cum = hist.select(
        "segment",
        "bal_c",
        "cnt",
        F.sum("cnt").over(wseg.orderBy("bal_c").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(wseg).alias("n"),
    )
    qs = cust.sparkSession.createDataFrame(
        [(num, den, lbl) for num, den, lbl in _PDISC_QS],
        "q_num bigint, q_den bigint, q_label string",
    )
    idx = F.expr("(n * q_num + q_den - 1) div q_den")
    return (
        cum.join(
            F.broadcast(qs),
            (F.col("cum") >= idx) & (F.col("cum") - F.col("cnt") < idx),
        )
        .select("segment", "q_label", F.col("bal_c").alias("value_cents"), "n")
    )


# ---------------------------------------------------------------------------
# Winsorized robust stats per event type (histogram-percentile clamp)
# ---------------------------------------------------------------------------


@register(
    "events_value_winsorized",
    oracle="""
    WITH hist AS (
      SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS v_milli,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v_milli, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_milli
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ),
    bounds AS (
      SELECT event_type,
             MIN(CASE WHEN cum >= (n * 1 + 19) // 20 THEN v_milli END) AS p05,
             MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN v_milli END) AS p95,
             CAST(MIN(n) AS BIGINT) AS n
      FROM cum GROUP BY event_type
    )
    SELECT h.event_type, b.n, b.p05 AS p05_milli, b.p95 AS p95_milli,
           CAST(SUM(CAST(LEAST(GREATEST(h.v_milli, b.p05), b.p95) AS HUGEINT)
                    * h.cnt) * 1000
                // b.n AS BIGINT) AS winsorized_mean_micro
    FROM hist h JOIN bounds b ON b.event_type = h.event_type
    GROUP BY h.event_type, b.n, b.p05, b.p95
    """,
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event values per type: values are clamped to
    the exact [p5, p95] range before averaging — the outlier-robust
    metric aggregation a telemetry pipeline applies before dashboards
    (a single corrupt 1e12 reading cannot move the mean).

    Scale posture: raw values quantize to a milli-unit histogram FIRST
    (bounded by the value range, not row count — map-side combinable);
    percentile bounds come from the cumulative histogram with exact
    integer index math (the ``percentile_disc_by_segment`` pattern);
    the clamp+mean is a second pass over the HISTOGRAM joined to the
    broadcast 5-row bounds. Cross-engine determinism: quantization,
    index arithmetic, clamping, and the final mean are all integer
    (micro-units out, floor-division by n)."""
    ev = _t(spark, sf_dir, "events")["events"]
    hist = ev.groupBy(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    ).agg(F.count("*").alias("cnt"))
    wtype = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v_milli",
        "cnt",
        F.sum("cnt")
        .over(wtype.orderBy("v_milli").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(wtype).alias("n"),
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 1 + 19) div 20"), F.col("v_milli"))
        ).alias("p05"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 19 + 19) div 20"), F.col("v_milli"))
        ).alias("p95"),
        F.min("n").alias("n"),
    )
    return (
        hist.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", F.col("p05").alias("p05_milli"), F.col("p95").alias("p95_milli"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(LEAST(GREATEST(v_milli, p05), p95)"
                " AS DECIMAL(38,0)) * cnt) * 1000"
                " div MIN(n) AS BIGINT)"
            ).alias("winsorized_mean_micro")
        )
        .select("event_type", "n", "p05_milli", "p95_milli", "winsorized_mean_micro")
    )


# ---------------------------------------------------------------------------
# Catalog growth: parts first sold per month + cumulative distinct
# ---------------------------------------------------------------------------


@register(
    "new_parts_monthly",
    oracle="""
    WITH first_sold AS (
      SELECT l_partkey,
             MIN(STRFTIME(l_shipdate, '%Y-%m')) AS first_month
      FROM lineitem GROUP BY 1
    ),
    monthly AS (
      SELECT first_month AS month, COUNT(*) AS new_parts
      FROM first_sold GROUP BY 1
    )
    SELECT month, new_parts,
           CAST(SUM(new_parts) OVER (ORDER BY month
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_parts
    FROM monthly
    """,
)
def new_parts_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-growth series: parts first sold in each month plus the
    cumulative distinct catalog size — the assortment-expansion view
    (``new_vs_returning_users`` for items instead of users).

    Scale posture: first-sale month is a part-keyed MIN aggregate
    (map-side combinable — never a distinct over (part, month) rows);
    the cumulative window orders the calendar-bounded monthly
    aggregate (≤ a few hundred rows at any scale). All integers and
    formatted month strings — nothing to round."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    first_sold = li.groupBy("l_partkey").agg(
        F.min(F.date_format("l_shipdate", "yyyy-MM")).alias("first_month")
    )
    monthly = first_sold.groupBy(F.col("first_month").alias("month")).agg(
        F.count("*").alias("new_parts")
    )
    return monthly.select(
        "month",
        "new_parts",
        F.sum("new_parts")
        .over(
            Window.partitionBy()
            .orderBy("month")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cumulative_parts"),
    )


# ---------------------------------------------------------------------------
# Rolling exact median of daily revenue (bounded-window quantile)
# ---------------------------------------------------------------------------


@register(
    "rolling_median_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    ),
    win AS (
      SELECT d, rev_c,
             LIST(rev_c) OVER (ORDER BY d
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
      FROM daily
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, CAST(rev_c AS BIGINT) AS rev_c,
           CAST(LEN(l) AS INT) AS n_window,
           CAST(LIST_SORT(l)[(LEN(l) + 1) // 2] AS BIGINT) AS rolling_median_cents
    FROM win
    """,
)
def rolling_median_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day exact median of daily revenue — the robust trend
    line dashboards draw instead of the outlier-sensitive rolling
    mean. The window quantile is computed by sorting the ≤7 collected
    window values and indexing PERCENTILE_DISC's ceil(n/2) — exact,
    and O(w log w) per output row with w fixed at 7.

    Scale posture: the rolling window orders the calendar-bounded
    DAILY aggregate (never input rows), so the collected list is ≤7
    BIGINTs per day — bounded state regardless of order volume.
    Cross-engine determinism: integer cents in, identical 1-based
    sorted-list index both sides, dates out as formatted strings."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d", "rev_c", F.sort_array(F.collect_list("rev_c").over(w7)).alias("l")
    )
    return win.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "rev_c",
        F.size("l").alias("n_window"),
        F.expr("element_at(l, CAST((size(l) + 1) div 2 AS INT))").alias(
            "rolling_median_cents"
        ),
    )


# ---------------------------------------------------------------------------
# HLL register MERGE across sources (the mergeable-sketch property)
# ---------------------------------------------------------------------------


@register(
    "hll_union_sources",
    oracle=f"""
    WITH hr AS (
      SELECT event_type, {_hll_fields_sql()[0]} AS bucket,
             {_hll_fields_sql()[1]} AS rho
      FROM events
    ),
    per_type AS (
      SELECT event_type, bucket, MAX(rho) AS m FROM hr GROUP BY 1, 2
    ),
    merged AS (SELECT bucket, MAX(m) AS m FROM per_type GROUP BY bucket),
    s AS (
      SELECT SUM(POW(2.0, -m)) AS z_part, COUNT(*) AS nonempty FROM merged
    ),
    est AS (
      SELECT e.n_sources,
             (SELECT CAST(SUM(du) AS BIGINT) FROM (
               SELECT COUNT(DISTINCT user_id) AS du FROM events
               GROUP BY event_type)) AS sum_exact_per_source,
             e.exact_union,
             {_HLL_M} - s.nonempty AS zeros,
             (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
               / (s.z_part + ({_HLL_M} - s.nonempty)) AS raw
      FROM s CROSS JOIN
           (SELECT COUNT(DISTINCT event_type) AS n_sources,
                   COUNT(DISTINCT user_id) AS exact_union FROM events) e
    )
    SELECT n_sources, sum_exact_per_source, exact_union,
           ROUND(CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                      THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / zeros)
                      ELSE raw END, 2) AS hll_union_est,
           ROUND((CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                       THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / zeros)
                       ELSE raw END - exact_union) / exact_union, 4)
             AS rel_err
    FROM est
    """,
)
def hll_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register MERGE: per-event-type HLL sketches unioned by
    taking the register-wise MAX, vs the exact union distinct and the
    (overcounting) sum of per-source exacts — the mergeability
    demonstration that makes sketches viable at 100 TB: per-partition/
    per-day/per-source sketches combine without re-reading data, which
    COUNT(DISTINCT) cannot do.

    Scale posture: register build is a (source, bucket)-keyed MAX
    aggregate (≤ sources × {m} rows), merge is a second {m}-key MAX —
    constant state at any cardinality. Σ2^(−M) sums exact dyadic
    doubles (order-independent); the one transcendental (LN in the
    small-range correction) is a final scored expression with
    identical operand order in both engines."""
    ev = _t(spark, sf_dir, "events")["events"]
    bucket, rho = _hll_cols()
    per_type = (
        ev.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    merged = per_type.groupBy("bucket").agg(F.max("m").alias("m"))
    s = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_part"),
        F.count("*").alias("nonempty"),
    )
    per_source = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("du")
    )
    sums = per_source.agg(
        F.count("*").alias("n_sources"),
        F.sum("du").alias("sum_exact_per_source"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_union"))
    zeros = F.lit(_HLL_M) - F.col("nonempty")
    raw = (
        F.lit(0.7213 / (1 + 1.079 / _HLL_M))
        * _HLL_M
        * _HLL_M
        / (F.col("z_part") + zeros)
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (zeros > 0),
        _HLL_M * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(raw)
    return (
        s.join(F.broadcast(sums))
        .join(F.broadcast(exact))
        .select(
            "n_sources",
            "sum_exact_per_source",
            "exact_union",
            F.round(est, 2).alias("hll_union_est"),
            F.round((est - F.col("exact_union")) / F.col("exact_union"), 4).alias(
                "rel_err"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Engine-native approx_percentile audited against its rank contract
# ---------------------------------------------------------------------------

_APPROX_B = 10_000  # accuracy parameter → rank error <= n / B


@register(
    "approx_percentile_contract",
    oracle="""
    WITH hist AS (
      SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS v_milli,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v_milli, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_milli
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    )
    SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= (n + 1) // 2 THEN v_milli END)
             AS exact_p50_milli,
           TRUE AS within_contract
    FROM cum GROUP BY event_type
    """,
)
def approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native ``percentile_approx`` audited against its
    mathematical contract: the GK-sketch median's RANK must sit within
    n/{b} of the true median rank. The approximate value itself is
    engine- (and merge-order-) specific, so what leaves the query is
    the EXACT median plus the boolean contract verdict — deterministic
    output wrapped around a nondeterministic sketch, the same pattern
    a platform uses to monitor its approximate operators in
    production.

    Scale posture: the exact side is the cumulative milli-unit
    histogram (bounded by value range); the approx side is Spark's
    mergeable GK sketch — constant state per partition; the audit
    joins the sketch's output value back into the histogram to read
    off its exact rank interval. Oracle: exact median + literal TRUE
    (the contract is a theorem; a FALSE here is an engine bug and
    SHOULD fail the driver compare)."""
    ev = _t(spark, sf_dir, "events")["events"]
    q = ev.select("event_type", F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"))
    hist = q.groupBy("event_type", "v_milli").agg(F.count("*").alias("cnt"))
    wtype = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v_milli",
        "cnt",
        F.sum("cnt")
        .over(wtype.orderBy("v_milli").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(wtype).alias("n"),
    )
    approx = q.groupBy("event_type").agg(
        F.percentile_approx("v_milli", 0.5, _APPROX_B).alias("approx_v")
    )
    # rank interval of the approx value: (cum_below, cum_incl]
    probe = (
        cum.join(F.broadcast(approx), "event_type")
        .where(F.col("v_milli") == F.col("approx_v"))
        .select(
            "event_type",
            (F.col("cum") - F.col("cnt")).alias("rank_lo_excl"),
            F.col("cum").alias("rank_hi"),
        )
    )
    exact = cum.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v_milli"))
        ).alias("exact_p50_milli"),
    )
    t = F.expr("(n + 1) div 2")
    tol = F.expr(f"n div {_APPROX_B}") + 1
    return (
        exact.join(F.broadcast(probe), "event_type")
        .select(
            "event_type",
            "n",
            "exact_p50_milli",
            (
                (F.col("rank_lo_excl") + 1 <= t + tol)
                & (F.col("rank_hi") >= t - tol)
            ).alias("within_contract"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter built from first principles, FPR measured exactly
# ---------------------------------------------------------------------------

_BLOOM_M = 16_384  # bits (2^14)
_BLOOM_K = 4  # hash functions (4 hex chars of one md5 each)
# probes are the NEGATED member keys: every key space in play (base
# testdata and the scale-stress replicas at i*50M offsets) is strictly
# positive, so -k-1 is structurally never a member at any scale


def _bloom_pos_sql(key: str, j: int) -> str:
    """DuckDB: hash position j — 4 md5 hex digits walked via STRPOS,
    mod m (mirrors Spark's conv(substr(h, 4j+1, 4), 16, 10) % m)."""
    h = f"MD5('bloom|' || CAST({key} AS VARCHAR))"
    digits = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({h}, {4 * j + 1 + i}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) % {_BLOOM_M})"


@register(
    "bloom_filter_fpr",
    oracle=f"""
    WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('k', j)} AS pos FROM members" for j in range(_BLOOM_K))}
      )
    ),
    probes AS (SELECT -k - 1 AS pk FROM members),
    probe_pos AS (
      {" UNION ALL ".join(f"SELECT pk, {_bloom_pos_sql('pk', j)} AS pos FROM probes" for j in range(_BLOOM_K))}
    ),
    hits AS (
      SELECT pp.pk, COUNT(b.pos) AS n_hit
      FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.pk
    )
    SELECT COUNT(*) AS n_members,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN n_hit = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(CAST(SUM(CASE WHEN n_hit = {_BLOOM_K} THEN 1 ELSE 0 END)
                     AS HUGEINT) * 1000000
                // GREATEST(COUNT(*), 1) AS BIGINT) AS fpr_ppm
    FROM hits
    """,
)
def bloom_filter_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter from first principles ({m} bits, k={k} salted-md5
    positions per key), built over the distinct order-customer keys
    and probed with the negated (structurally non-member) key set to measure the
    FALSE-POSITIVE rate exactly — completing the exactly-audited
    sketch family (CMS frequency, KMV/HLL cardinality, minhash
    similarity) with the membership sketch every shuffle-avoiding
    join prefilter uses.

    Scale posture: the bit set is a distinct-aggregate bounded at {m}
    rows regardless of member count and BROADCASTS into the probe
    join; probes fan out k rows each (constant). Cross-engine
    determinism: bit positions are pure md5 hex arithmetic (conv here,
    the STRPOS digit walk there); verdicts and the PPM rate are
    integers."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    members = orders.select(F.col("o_custkey").alias("k")).distinct()

    def pos(key_col: str, j: int):
        h = F.md5(F.concat(F.lit("bloom|"), F.col(key_col).cast("string")))
        return (
            F.conv(F.substring(h, 4 * j + 1, 4), 16, 10).cast("int") % _BLOOM_M
        )

    bits = (
        members.select(
            F.explode(F.array(*[pos("k", j) for j in range(_BLOOM_K)])).alias("pos")
        )
        .distinct()
    )
    probes = members.select((-F.col("k") - 1).alias("pk"))
    probe_pos = probes.select(
        "pk",
        F.explode(F.array(*[pos("pk", j) for j in range(_BLOOM_K)])).alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("pk")
        .agg(F.count("hit").alias("n_hit"))
    )
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    fp = F.when(F.col("n_hit") == _BLOOM_K, 1).otherwise(0)
    return (
        hits.agg(
            # probes are a 1:1 map of members, so one count serves both
            F.count("*").alias("n_members"),
            F.count("*").alias("n_probes"),
            F.sum(fp).alias("n_false_positives"),
            F.expr(
                f"CAST(CAST(SUM(CASE WHEN n_hit = {_BLOOM_K} THEN 1 ELSE 0 END)"
                " AS DECIMAL(38,0)) * 1000000"
                " div GREATEST(COUNT(*), 1) AS BIGINT)"
            ).alias("fpr_ppm"),
        )
        .join(F.broadcast(n_bits))
        .select("n_members", "n_bits_set", "n_probes", "n_false_positives", "fpr_ppm")
    )


# ---------------------------------------------------------------------------
# Observability: exact hourly p95 of event values
# ---------------------------------------------------------------------------


@register(
    "hourly_p95_value",
    oracle="""
    WITH hist AS (
      SELECT DATE_TRUNC('hour', ts) AS h,
             CAST(ROUND(value * 1000) AS BIGINT) AS v_milli,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT h, v_milli, cnt,
             SUM(cnt) OVER (PARTITION BY h ORDER BY v_milli
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY h) AS BIGINT) AS n
      FROM hist
    )
    SELECT STRFTIME(h, '%Y-%m-%d %H:00') AS hour, CAST(MIN(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN v_milli END)
             AS p95_milli
    FROM cum GROUP BY h
    """,
)
def hourly_p95_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE observability query: exact p95 of event values per hour —
    the latency-dashboard staple, computed exactly at any scale via
    the per-hour value histogram instead of a sort (approx_percentile
    is the usual compromise; ``approx_percentile_contract`` shows why
    it can't be oracle-compared — this one can).

    Scale posture: the histogram is keyed (hour, value) — map-side
    combinable, bounded by hours × value range; the cumulative window
    partitions per hour so no global sort exists; output is one row
    per hour. Cross-engine determinism: integer index arithmetic
    (ceil(0.95·n)), milli-unit values, hour as a formatted string."""
    ev = _t(spark, sf_dir, "events")["events"]
    hist = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    ).agg(F.count("*").alias("cnt"))
    wh = Window.partitionBy("h")
    cum = hist.select(
        "h",
        "v_milli",
        "cnt",
        F.sum("cnt")
        .over(wh.orderBy("v_milli").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(wh).alias("n"),
    )
    return cum.groupBy(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour")
    ).agg(
        F.min("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 19 + 19) div 20"), F.col("v_milli"))
        ).alias("p95_milli"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index: early-vs-late value distribution drift
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_BIN_MILLI = 50_000  # 10 bins of $50 over the ~[0, 500] value range
_PSI_SPLIT_DAYS = 15


@register(
    "drift_psi_daily",
    oracle=f"""
    WITH bounds AS (SELECT MIN(ts) AS t0 FROM events),
    binned AS (
      SELECT event_type,
             CASE WHEN e.ts < b.t0 + INTERVAL {_PSI_SPLIT_DAYS} DAY
                  THEN 'a' ELSE 'b' END AS era,
             LEAST(CAST(ROUND(value * 1000) AS BIGINT) // {_PSI_BIN_MILLI},
                   {_PSI_BINS - 1}) AS bin
      FROM events e CROSS JOIN bounds b
    ),
    sparse AS (
      SELECT event_type, bin,
             SUM(CASE WHEN era = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN era = 'b' THEN 1 ELSE 0 END) AS cb
      FROM binned GROUP BY 1, 2
    ),
    cnts AS (
      -- densify to the FULL type x bin grid: Laplace smoothing
      -- assumes every one of the {_PSI_BINS} bins contributes a term,
      -- including bins empty in both eras
      SELECT g.event_type, g.bin,
             COALESCE(s.ca, 0) AS ca, COALESCE(s.cb, 0) AS cb
      FROM (SELECT t.event_type, b.bin
            FROM (SELECT DISTINCT event_type FROM binned) t
            CROSS JOIN (SELECT UNNEST(RANGE(0, {_PSI_BINS})) AS bin) b) g
      LEFT JOIN sparse s
        ON s.event_type = g.event_type AND s.bin = g.bin
    ),
    tots AS (
      SELECT event_type, SUM(ca) AS ta, SUM(cb) AS tb
      FROM cnts GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type,
             CAST(ROUND((CAST(c.ca + 1 AS DOUBLE) / (t.ta + {_PSI_BINS})
                         - CAST(c.cb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS}))
                        * LN((CAST(c.ca + 1 AS DOUBLE) / (t.ta + {_PSI_BINS}))
                             / (CAST(c.cb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS})))
                        * 1000000000) AS BIGINT) AS term_nano
      FROM cnts c JOIN tots t ON t.event_type = c.event_type
    )
    SELECT event_type,
           ROUND(SUM(term_nano) / 1000000000.0, 6) AS psi
    FROM terms GROUP BY event_type
    """,
)
def drift_psi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type: the value
    distribution of the first {d} days against the rest, over {b}
    fixed $50 bins with +1 Laplace smoothing — THE production drift
    monitor (PSI < 0.1 stable, > 0.25 retrain), here exactly
    reproducible instead of notebook-dependent.

    Scale posture: binning is row-local codegen into a (type, bin)
    aggregate (bounded at types × {b} cells); the era split predicate
    derives from a broadcast 1-row MIN(ts); everything after runs on
    the cell grid. Cross-engine determinism: smoothed p/q are exact
    rationals evaluated in ONE double expression with identical
    operand order, each bin term rounded to integer nano-units before
    the sum (the ``source_token_entropy`` transcendental rule)."""
    ev = _t(spark, sf_dir, "events")["events"]
    bounds = ev.agg(F.min("ts").alias("t0"))
    binned = ev.join(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("ts") < F.expr(f"t0 + INTERVAL {_PSI_SPLIT_DAYS} DAY"), "a"
        )
        .otherwise("b")
        .alias("era"),
        F.least(
            F.expr(f"CAST(ROUND(value * 1000) AS BIGINT) div {_PSI_BIN_MILLI}"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    sparse = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("era") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("era") == "b", 1).otherwise(0)).alias("cb"),
    )
    # densify: jointly-empty bins still carry a smoothed PSI term
    grid = (
        sparse.select("event_type")
        .distinct()
        .crossJoin(
            sparse.sparkSession.range(_PSI_BINS).select(
                F.col("id").alias("bin")
            )
        )
    )
    cnts = grid.join(F.broadcast(sparse), ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    tots = cnts.groupBy("event_type").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    terms = cnts.join(F.broadcast(tots), "event_type").select(
        "event_type",
        F.round(
            (
                (F.col("ca") + 1).cast("double") / (F.col("ta") + _PSI_BINS)
                - (F.col("cb") + 1).cast("double") / (F.col("tb") + _PSI_BINS)
            )
            * F.log(
                ((F.col("ca") + 1).cast("double") / (F.col("ta") + _PSI_BINS))
                / ((F.col("cb") + 1).cast("double") / (F.col("tb") + _PSI_BINS))
            )
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("term_nano"),
    )
    return terms.groupBy("event_type").agg(
        F.round(F.sum("term_nano") / 1_000_000_000.0, 6).alias("psi")
    )


# ---------------------------------------------------------------------------
# Price-volume-mix decomposition of month-over-month revenue change
# ---------------------------------------------------------------------------


@register(
    "price_volume_mix_decomposition",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             EXTRACT(year FROM o_orderdate) * 12
               + EXTRACT(month FROM o_orderdate) AS mth,
             COUNT(*) AS vol,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT priority, mth, vol, rev_c,
             LAG(vol) OVER w AS pvol,
             LAG(rev_c) OVER w AS prev_c
      FROM m WINDOW w AS (PARTITION BY priority ORDER BY mth)
    )
    SELECT priority, CAST(mth AS BIGINT) AS mth,
           CAST(rev_c - prev_c AS BIGINT) AS delta_c,
           CAST((CAST(vol - pvol AS HUGEINT) * prev_c) // pvol AS BIGINT)
             AS volume_effect_c,
           CAST(rev_c - prev_c
             - CAST((CAST(vol - pvol AS HUGEINT) * prev_c) // pvol AS BIGINT)
             AS BIGINT) AS price_mix_effect_c
    FROM paired
    WHERE pvol IS NOT NULL AND pvol > 0
    """,
)
def price_volume_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge: each priority's month-over-month
    revenue change split into the volume effect (order-count change at
    last month's average price) and the residual price/mix effect —
    the FP&A waterfall behind every "why did revenue move" review.

    Scale posture: orders collapse to the (priority, month) aggregate
    before the LAG window runs (grid-bounded); output is one row per
    transition. Cross-engine determinism: the volume effect is ONE
    HUGEINT/DECIMAL(38) floor-division ((Δvol·prev_rev) // prev_vol
    overflows int64 at ~9e18 cent-orders), and the price/mix residual
    is exact integer subtraction — the bridge reconciles to the penny
    by construction."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mth"),
    ).agg(
        F.count("*").alias("vol"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c"),
    )
    w = Window.partitionBy("priority").orderBy("mth")
    paired = m.select(
        "priority",
        "mth",
        "vol",
        "rev_c",
        F.lag("vol").over(w).alias("pvol"),
        F.lag("rev_c").over(w).alias("prev_c"),
    ).where(F.col("pvol").isNotNull() & (F.col("pvol") > 0))
    vol_eff = F.expr(
        "CAST((CAST(vol - pvol AS DECIMAL(38,0)) * prev_c) div pvol AS BIGINT)"
    )
    return paired.select(
        "priority",
        F.col("mth").cast("bigint").alias("mth"),
        (F.col("rev_c") - F.col("prev_c")).alias("delta_c"),
        vol_eff.alias("volume_effect_c"),
        (F.col("rev_c") - F.col("prev_c") - vol_eff).alias("price_mix_effect_c"),
    )


# ---------------------------------------------------------------------------
# Multi-aggregate pivot (sum + count per pivoted cell)
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "pivot_multi_agg",
    oracle=f"""
    SELECT user_id % 10 AS cohort,
           {", ".join(
             f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS {t}_cents, "
             f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}_n"
             for t in _PIVOT_TYPES)}
    FROM events GROUP BY 1
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (value sum AND event
    count per type, per user cohort) — the wide-report shape BI tools
    emit, where Spark's ``pivot`` composes with several agg exprs at
    once and the column explosion stays bounded by the declared pivot
    value list.

    Scale posture: one combinable aggregate over the cohort key; the
    pivot list is DECLARED ({n} types), so no extra distinct-values
    job runs and the schema is static. Cross-engine determinism:
    cents and counts are integers; the oracle is the equivalent
    conditional-aggregation spelling."""
    ev = _t(spark, sf_dir, "events")["events"]
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # Spark names pivoted columns "<type>_<alias>"; zero-fill empty
    # cells to match the oracle's SUM(CASE...) = 0 convention
    cols = [F.col("cohort")]
    for t in _PIVOT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_cents"), F.lit(0)).alias(f"{t}_cents"))
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"))
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Daily bounce rate (single-event sessions / sessions)
# ---------------------------------------------------------------------------

_BOUNCE_GAP_S = 1800


@register(
    "bounce_rate_daily",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {_BOUNCE_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sid, MIN(CAST(ts AS DATE)) AS d, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM per_sess GROUP BY d
    """,
)
def bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, attributed to the session's start day — the
    engagement-quality headline next to DAU (``dau_mau_stickiness``)
    and session length (``session_duration_stats``).

    Scale posture: gap-based sessionization is the single user-key
    shuffle (LAG + running sum + session rollup on one partitioning);
    the daily rollup is a second combinable aggregate over sessions.
    Cross-engine determinism: session order pinned by (ts, event_id),
    integer PPM out, day as a formatted string."""
    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    flagged = lagged.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                > _BOUNCE_GAP_S * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.min(F.to_date("ts")).alias("d"), F.count("*").alias("n_events")
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per_sess.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


# ---------------------------------------------------------------------------
# Audience-overlap (Jaccard) matrix between event types
# ---------------------------------------------------------------------------


@register(
    "audience_overlap_matrix",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
      SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(CAST(p.n_both AS HUGEINT) * 1000000
                // (sa.n + sb.n - p.n_both) AS BIGINT) AS jaccard_ppm
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER SETS
    behind every pair of event types — the growth-analytics view that
    answers "are purchasers the same people who click" before any
    cross-sell targeting.

    Scale posture: users collapse to per-user type arrays on one
    user-key shuffle and pairs explode within each (≤5-type) array —
    the basket-array pattern, so candidate volume is O(users · types²)
    with a bounded type set; per-type sizes come from the same
    aggregate. Cross-engine determinism: intersection and union are
    exact integer counts; Jaccard leaves as integer PPM."""
    from rs_streamloader_spark.session import stage_cached

    # one cached pass builds the per-user type arrays; sizes and the
    # pair matrix both read it (uncached, each branch re-scans events)
    baskets = stage_cached(
        spark,
        sf_dir,
        "audience_baskets",
        lambda: _t(spark, sf_dir, "events")["events"]
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("ts")),
    )
    sizes = baskets.select(F.explode("ts").alias("event_type")).groupBy(
        "event_type"
    ).agg(F.count("*").alias("n"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (x, i) ->"
                    " transform(slice(ts, i + 2, size(ts)),"
                    " y -> struct(x AS type_a, y AS type_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(n_both AS DECIMAL(38,0)) * 1000000"
                " div (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Activation + day-N retention per signup cohort week
# ---------------------------------------------------------------------------


@register(
    "activation_retention_cohorts",
    oracle="""
    WITH signups AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    flags AS (
      SELECT s.user_id, s.signup_ts,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND e.ts > s.signup_ts
                       AND e.ts <= s.signup_ts + INTERVAL 7 DAY
                      THEN 1 ELSE 0 END) AS activated_7d,
             MAX(CASE WHEN e.ts > s.signup_ts
                       AND e.ts <= s.signup_ts + INTERVAL 1 DAY
                      THEN 1 ELSE 0 END) AS retained_d1,
             MAX(CASE WHEN e.ts > s.signup_ts + INTERVAL 6 DAY
                       AND e.ts <= s.signup_ts + INTERVAL 7 DAY
                      THEN 1 ELSE 0 END) AS returned_d7
      FROM signups s JOIN events e ON e.user_id = s.user_id
      GROUP BY s.user_id, s.signup_ts
    )
    SELECT STRFTIME(DATE_TRUNC('week', signup_ts), '%Y-%m-%d') AS cohort_week,
           COUNT(*) AS n_signups,
           CAST(CAST(SUM(activated_7d) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS activation_ppm,
           CAST(CAST(SUM(retained_d1) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS retained_d1_ppm,
           CAST(CAST(SUM(returned_d7) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS returned_d7_ppm
    FROM flags GROUP BY 1
    """,
)
def activation_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation and day-N retention per signup cohort week: share of
    each week's signups who purchase within 7 days (activation), act
    at all on day 1, and come back in the day-7 window — the PM
    growth dashboard next to the monthly cohort revenue triangle
    (``retention_cohorts``/``cohort_ltv_curve``).

    Scale posture: first-signup is a user-keyed MIN aggregate; the
    flag computation joins events back on the user key ONCE (both
    sides partition by user_id — one shuffle each) and reduces to one
    row per user before the weekly rollup. Cross-engine determinism:
    window membership uses exact timestamp interval comparisons;
    shares are integer PPM; weeks leave as formatted strings."""
    ev = _t(spark, sf_dir, "events")["events"]
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    joined = signups.join(ev, "user_id")
    flags = joined.groupBy("user_id", "signup_ts").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("signup_ts"))
                & (F.col("ts") <= F.expr("signup_ts + INTERVAL 7 DAY")),
                1,
            ).otherwise(0)
        ).alias("activated_7d"),
        F.max(
            F.when(
                (F.col("ts") > F.col("signup_ts"))
                & (F.col("ts") <= F.expr("signup_ts + INTERVAL 1 DAY")),
                1,
            ).otherwise(0)
        ).alias("retained_d1"),
        F.max(
            F.when(
                (F.col("ts") > F.expr("signup_ts + INTERVAL 6 DAY"))
                & (F.col("ts") <= F.expr("signup_ts + INTERVAL 7 DAY")),
                1,
            ).otherwise(0)
        ).alias("returned_d7"),
    )
    return flags.groupBy(
        F.date_format(F.date_trunc("week", "signup_ts"), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    ).agg(
        F.count("*").alias("n_signups"),
        F.expr(
            "CAST(CAST(SUM(activated_7d) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("activation_ppm"),
        F.expr(
            "CAST(CAST(SUM(retained_d1) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("retained_d1_ppm"),
        F.expr(
            "CAST(CAST(SUM(returned_d7) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("returned_d7_ppm"),
    )


# ---------------------------------------------------------------------------
# Wilson score interval for per-cohort click-through rate
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96


@register(
    "ctr_wilson_interval",
    oracle=f"""
    WITH c AS (
      SELECT user_id % 10 AS cohort,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             CAST(SUM(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END) AS BIGINT) AS impressions
      FROM events GROUP BY 1
    )
    SELECT cohort, clicks, impressions,
           CAST(CAST(clicks AS HUGEINT) * 1000000 // impressions AS BIGINT)
             AS ctr_ppm,
           ROUND((CAST(clicks AS DOUBLE) / impressions
                  + {_WILSON_Z} * {_WILSON_Z} / (2.0 * impressions)
                  - {_WILSON_Z} * SQRT((CAST(clicks AS DOUBLE) / impressions)
                        * (1.0 - CAST(clicks AS DOUBLE) / impressions)
                        / impressions
                        + {_WILSON_Z} * {_WILSON_Z}
                          / (4.0 * impressions * impressions)))
                 / (1.0 + {_WILSON_Z} * {_WILSON_Z} / impressions), 6)
             AS wilson_low,
           ROUND((CAST(clicks AS DOUBLE) / impressions
                  + {_WILSON_Z} * {_WILSON_Z} / (2.0 * impressions)
                  + {_WILSON_Z} * SQRT((CAST(clicks AS DOUBLE) / impressions)
                        * (1.0 - CAST(clicks AS DOUBLE) / impressions)
                        / impressions
                        + {_WILSON_Z} * {_WILSON_Z}
                          / (4.0 * impressions * impressions)))
                 / (1.0 + {_WILSON_Z} * {_WILSON_Z} / impressions), 6)
             AS wilson_high
    FROM c
    """,
)
def ctr_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for click-through rate per user cohort —
    the ranking-safe CTR bound (sorting by raw CTR promotes 1/1 over
    980/1000; Wilson's lower bound is how ranked lists, review
    scores, and experiment readouts handle small n).

    Scale posture: one combinable cohort aggregate; the interval is
    row-local arithmetic on the 10-row result. Cross-engine
    determinism: counts and the CTR are exact integers/PPM; each
    Wilson bound is ONE double expression with identical operand
    order on both engines, rounded once at the end (the
    ``events_burstiness`` transcendental rule)."""
    ev = _t(spark, sf_dir, "events")["events"]
    c = ev.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "clicks"
        ),
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("impressions"),
    )
    z = _WILSON_Z
    p = F.col("clicks").cast("double") / F.col("impressions")
    nn = F.col("impressions")
    center = p + z * z / (2.0 * nn)
    margin = z * F.sqrt(p * (1.0 - p) / nn + z * z / (4.0 * nn * nn))
    denom = 1.0 + z * z / nn
    return c.select(
        "cohort",
        "clicks",
        "impressions",
        F.expr(
            "CAST(CAST(clicks AS DECIMAL(38,0)) * 1000000 div impressions"
            " AS BIGINT)"
        ).alias("ctr_ppm"),
        F.round((center - margin) / denom, 6).alias("wilson_low"),
        F.round((center + margin) / denom, 6).alias("wilson_high"),
    )


# ---------------------------------------------------------------------------
# Classical OLS trend over the trailing year (Theil-Sen's textbook twin)
# ---------------------------------------------------------------------------


@register(
    "ols_daily_revenue_trend",
    oracle="""
    WITH bounds AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    daily AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o CROSS JOIN bounds b
      WHERE CAST(o.o_orderdate AS DATE) > b.maxd - 365
      GROUP BY 1
    ),
    idx AS (
      SELECT rev_c, CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS t
      FROM daily
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(t) AS st, SUM(CAST(rev_c AS HUGEINT)) AS sy,
             SUM(t * t) AS stt,
             SUM(CAST(t AS HUGEINT) * rev_c) AS sty,
             SUM(CAST(rev_c AS HUGEINT) * rev_c) AS syy
      FROM idx
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st), 4)
             AS ols_slope_cents_per_day,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st))
                    * st) / n, 2) AS ols_intercept_cents,
           ROUND(POW(CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy, 2)
                 / ((CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS r_squared
    FROM m
    """,
)
def ols_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical OLS trend of the trailing year's daily revenue —
    slope, intercept, and R² from exact integer moments, the textbook
    twin to ``theil_sen_trend``'s robust median slope (read together:
    a large gap between the two slopes IS the outlier diagnosis).

    Scale posture: the same trailing-365-day broadcast predicate
    bounds the series; the five moments are ONE combinable aggregate
    in HUGEINT/DECIMAL(38) (rev² sums overflow int64 past ~3e9 daily
    cents); slope/intercept/R² are final double expressions with
    identical operand order on both engines, rounded once."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    bounds = orders.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    daily = (
        orders.join(F.broadcast(bounds))
        .where(F.to_date("o_orderdate") > F.date_sub(F.col("maxd"), 365))
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_c"
            )
        )
    )
    t0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.join(F.broadcast(t0)).select(
        "rev_c", F.datediff("d", "d0").cast("bigint").alias("t")
    )
    y = F.col("rev_c").cast("decimal(38,0)")
    m = idx.agg(
        F.count("*").alias("n"),
        F.sum("t").alias("st"),
        F.sum(y).alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("rev_c")).alias("sty"),
        F.sum(y * F.col("rev_c")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    std = F.col("st").cast("double")
    syd = F.col("sy").cast("double")
    sttd = F.col("stt").cast("double")
    styd = F.col("sty").cast("double")
    syyd = F.col("syy").cast("double")
    slope = (nd * styd - std * syd) / (nd * sttd - std * std)
    return m.select(
        "n",
        F.round(slope, 4).alias("ols_slope_cents_per_day"),
        F.round((syd - slope * std) / F.col("n"), 2).alias("ols_intercept_cents"),
        F.round(
            F.pow(nd * styd - std * syd, 2)
            / ((nd * sttd - std * std) * (nd * syyd - syd * syd)),
            6,
        ).alias("r_squared"),
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
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
    t = load_tables(spark, sf_dir, "lineitem")["lineitem"]

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
    t = load_tables(spark, sf_dir, "lineitem")["lineitem"]
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
    t = load_tables(spark, sf_dir, "orders")["orders"]
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
    t = load_tables(spark, sf_dir, "lineitem")["lineitem"]
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

    ev = _t(spark, sf_dir, "events")["events"].filter(
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

    ev = _t(spark, sf_dir, "events")["events"].filter(
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

    ev = _t(spark, sf_dir, "events")["events"]
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
    t = _t(spark, sf_dir, "customer", "orders")
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
        _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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


# ---------------------------------------------------------------------------
# SPRT sequential-stopping audit for the A/B split
# ---------------------------------------------------------------------------

import math as _math

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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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

    orders = _t(spark, sf_dir, "orders")["orders"]
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
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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

    ev = _t(spark, sf_dir, "events")["events"].filter(
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
    ev = _t(spark, sf_dir, "events")["events"].select(
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
    ev = _t(spark, sf_dir, "events")["events"]
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

    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation")
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    t = _t(spark, sf_dir, "orders", "customer", "nation")
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
    t = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"].select(
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
    ev = _t(spark, sf_dir, "events")["events"].select(
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    t = load_tables(spark, sf_dir, "lineitem")["lineitem"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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

    ev = _t(spark, sf_dir, "events")["events"].filter(
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    t = _t(spark, sf_dir, "orders", "customer", "nation")
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    t = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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

    ev = _t(spark, sf_dir, "events")["events"].filter(
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    ev = _t(spark, sf_dir, "events")["events"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
    orders = _t(spark, sf_dir, "orders")["orders"]
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
