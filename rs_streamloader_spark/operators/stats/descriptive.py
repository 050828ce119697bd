"""stats subject module (split from the former stats.py, r13);
see the package __init__ for the family docstring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
import rs_streamloader_spark.operators.stats as _S
import math as _math  # noqa: F401  (shared across subject modules)



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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    t = _S._t(spark, sf_dir, "lineitem")["lineitem"]
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
    t = _S._t(
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "lineitem")["lineitem"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]

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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "customer")["customer"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    t = _S._t(spark, sf_dir, "orders", "customer", "nation")
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
    t = _S._t(spark, sf_dir, "lineitem")["lineitem"]
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
    t = _S._t(spark, sf_dir, "orders", "customer", "nation")
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
    orders = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    cust = _S._t(spark, sf_dir, "customer")["customer"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    li = _S._t(spark, sf_dir, "lineitem")["lineitem"]
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
    orders = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    orders = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    orders = _S._t(spark, sf_dir, "orders")["orders"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
        lambda: _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    ev = _S._t(spark, sf_dir, "events")["events"]
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
    orders = _S._t(spark, sf_dir, "orders")["orders"]
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


