"""Analytic operator surface beyond the core relational set:
sessionization, exact percentiles, correlated subqueries, lateral
explode, ordered aggregation, ntile bucketing, unpivot.

None of these exist in the reference (it emits only COPY / DELETE /
INSERT SQL — /root/reference/lib/RedshiftLoader.ts:337-386); they are
part of the §2.4 native surface this engine provides through Catalyst.

Scale posture: sessionization uses ``session_window`` (one shuffle on
the user key, state merged per partition — no self-join); the
correlated subquery is decorrelated by Catalyst into a broadcast-able
aggregate join; explode fans out before the aggregation so the
count shuffle operates on (token, 1) pairs — the classic map-side
combinable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.functions.moments import (
    nano_moment_aggs,
    nano_moment_aggs_sql,
    nano_mu,
    nano_mu_sql,
    nano_sigma_samp,
    nano_sigma_samp_sql,
)
from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables, spread


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# HAVING-gated semi join — TPC-H Q18 style
# ---------------------------------------------------------------------------

@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(total_qty, 2)    AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    ) big ON big.l_orderkey = o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): aggregate-with-HAVING
    derived table joined back to the fact — the HAVING filter runs
    post-aggregation, shrinking the join input to the qualifying keys
    before any wide row is assembled."""
    t = _t(spark, sf_dir, "orders", "customer", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE window frame (value-based, not row-based)
# ---------------------------------------------------------------------------

@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS BIGINT) AS n_similar_priced
    FROM orders
    WHERE o_custkey % 50 = 0
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: for each order, how many of the same
    customer's orders are within ±1000 in price — rows enter the frame
    by ORDER-BY value distance, not row position (ties all share one
    frame, unlike a ROWS frame)."""
    t = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.count("*").over(w).alias("n_similar_priced"),
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregate family
# ---------------------------------------------------------------------------

@register(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6)      AS qty_disc_covar,
           ROUND(STDDEV_SAMP(l_extendedprice), 2)            AS price_stddev,
           ROUND(VAR_SAMP(l_quantity), 4)                    AS qty_var,
           ARG_MIN(l_orderkey, l_extendedprice)              AS cheapest_order,
           ARG_MAX(l_orderkey, l_extendedprice)              AS priciest_order,
           BOOL_AND(l_quantity > 0)                          AS all_positive_qty,
           BOOL_OR(l_discount > 0.09)                        AS any_deep_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, covariance, stddev,
    variance, argmin/argmax (min_by/max_by), boolean aggregates — one
    partial+final hash aggregation, rounded identically on both sides
    because parallel summation order perturbs last bits.

    min_by/max_by tie-break note: l_extendedprice ties would be
    nondeterministic; the testdata's continuous prices make ties
    measure-zero, and the oracle uses DuckDB's arg_min/arg_max on the
    same data."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
            F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        )
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection (two-pass: population stats → outliers)
# ---------------------------------------------------------------------------

@register(
    "anomaly_zscore",
    oracle=f"""
    WITH mom AS (
      -- exact integer nano-unit moments (functions/moments.py — the
      -- single-sourced policy shared with embedding_dim_stats):
      -- mu/sigma derive from (sx, sxx, n) in one fixed double
      -- expression on both engines, so the HARD |z|>3 membership test
      -- cannot flip on float partial-sum order
      SELECT event_type, {nano_moment_aggs_sql('"value"')}
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type,
             {nano_mu_sql()} AS mu,
             {nano_sigma_samp_sql()} AS sigma
      FROM mom
    ),
    -- zero-variance / single-row groups are DROPPED: a z-score is
    -- undefined there, and leaving the division in would be an ANSI
    -- divide-by-zero on the Spark side while DuckDB silently NULLs it
    usable AS (SELECT * FROM stats WHERE sigma > 0)
    SELECT e.event_id, e.event_type,
           ROUND(e."value", 2) AS "value",
           ROUND((e."value" - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN usable s ON e.event_type = s.event_type
    WHERE ABS((e."value" - s.mu) / s.sigma) > 3
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3): the aggregate side is a
    tiny per-type stats table broadcast back against the event scan —
    two passes over the data but only one shuffle (the stats agg),
    which is the scalable shape vs. a window over every row. mu/sigma
    derive from exact integer nano-unit moments (order-independent
    sums) so the hard |z|>3 membership cannot flip on partial-sum
    order across engines or partitionings. Single-row and
    zero-variance event types are dropped before scoring (z is
    undefined there; an unguarded divide would crash under ANSI on
    the Spark side while DuckDB silently NULLs it)."""
    t = _t(spark, sf_dir, "events")
    ev = t["events"]
    mom = ev.groupBy("event_type").agg(*nano_moment_aggs("value"))
    stats = mom.select(
        "event_type",
        nano_mu().alias("mu"),
        nano_sigma_samp().alias("sigma"),
    ).filter(F.col("sigma") > 0)
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Regular-expression scalar family
# ---------------------------------------------------------------------------

@register(
    "scalar_regexp",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '[a-z]+', 0)                     AS first_word,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS INTEGER) AS n_numbers,
           REGEXP_REPLACE(text, 'spark', 'SPARK', 'g')           AS shouted,
           REGEXP_MATCHES(text, 'join|merge')                    AS mentions_join
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar family: extract / extract-all count / global
    replace / boolean match — patterns from the RE2∩Java-compatible
    subset so both engines agree."""
    t = _t(spark, sf_dir, "documents")
    return (
        t["documents"]
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
            # idx=0 (full match) is REQUIRED: the default idx=1 refers to
            # capture group 1, which "[0-9]+" does not have — Spark raises
            # INVALID_PARAMETER_VALUE.REGEX_GROUP_INDEX on the first
            # digit-bearing document (surfaced by SCALE_STRESS_r09 at 10×).
            F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias(
                "n_numbers"
            ),
            F.regexp_replace("text", "spark", "SPARK").alias("shouted"),
            F.col("text").rlike("join|merge").alias("mentions_join"),
        )
    )


# ---------------------------------------------------------------------------
# EXISTS / NOT EXISTS correlated subqueries
# ---------------------------------------------------------------------------

_EXISTS_SQL = """
SELECT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey
)
AND NOT EXISTS (
    SELECT 1 FROM customer c2
    WHERE c2.c_nationkey = s.s_nationkey AND c2.c_acctbal < 0
)
"""


@register("subquery_exists", oracle=_EXISTS_SQL)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS, decorrelated by Catalyst into a
    semi-join and an anti-join on the correlation key (suppliers from
    nations that have customers, none of them overdrawn)."""
    t = _t(spark, sf_dir, "supplier", "customer")
    for name, df in t.items():
        df.createOrReplaceTempView(name)
    return spark.sql(_EXISTS_SQL)


# ---------------------------------------------------------------------------
# Outer explode (rows preserved when the array is empty)
# ---------------------------------------------------------------------------

@register(
    "explode_outer_props",
    oracle="""
    SELECT event_id, word
    FROM (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN STRING_SPLIT(event_type, '|')
                  ELSE [] END AS words
      FROM events WHERE event_id % 100 = 0
    ) LEFT JOIN LATERAL UNNEST(words) AS u(word) ON TRUE
    """,
)
def explode_outer_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with an empty array survive with a NULL
    element (plain explode silently drops them — the classic data-loss
    bug this operator exists to avoid)."""
    t = _t(spark, sf_dir, "events")
    words = F.when(
        F.col("event_type") == "error", F.split("event_type", r"\|")
    ).otherwise(F.array())
    return (
        t["events"]
        .filter(F.col("event_id") % 100 == 0)
        .select("event_id", F.explode_outer(words).alias("word"))
    )


# ---------------------------------------------------------------------------
# UNION (distinct) + pagination
# ---------------------------------------------------------------------------

@register(
    "set_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics (union + distinct in Spark —
    planned as one hash aggregate over the concatenation)."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (page 3 of 20): ORDER BY ... LIMIT k
    OFFSET n. Spark plans offset+limit as a single top-(n+k) with the
    first n dropped — fine for shallow pages; deep pagination at scale
    should switch to keyset predicates instead."""
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )


PAGE_KEY_PRICE = 300000.0
PAGE_KEY_ORDER = 5000


@register(
    "page_after_key",
    oracle=f"""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice <= {PAGE_KEY_PRICE}
      AND (o_totalprice < {PAGE_KEY_PRICE} OR o_orderkey > {PAGE_KEY_ORDER})
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def page_after_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination: the page AFTER anchor row
    (o_totalprice, o_orderkey) = ({PAGE_KEY_PRICE}, {PAGE_KEY_ORDER})
    in (price DESC, key ASC) order — the scale-safe replacement for
    deep OFFSET (which plans as top-(n+k) and re-ranks every earlier
    page's rows on every request).

    The composite keyset predicate is written with the redundant
    conjunct ``o_totalprice <= anchor`` so Catalyst pushes a simple
    range filter into the parquet scan (min/max row-group pruning at
    scale); the tiebreak disjunct evaluates post-scan. The result
    plans as TakeOrderedAndProject over the pruned scan — per-page
    cost is O(rows below the anchor in the touched row groups), not
    O(pages seen so far)."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        t.filter(
            (F.col("o_totalprice") <= PAGE_KEY_PRICE)
            & (
                (F.col("o_totalprice") < PAGE_KEY_PRICE)
                | (F.col("o_orderkey") > PAGE_KEY_ORDER)
            )
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
    )


# ---------------------------------------------------------------------------
# Higher-order array functions (filter / exists / reduce)
# ---------------------------------------------------------------------------

@register(
    "array_higher_order",
    oracle="""
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(ws, w -> LENGTH(w) > 4)) AS INTEGER)   AS n_long_words,
           LIST_REDUCE(LIST_PREPEND(0, LIST_TRANSFORM(ws, w -> LENGTH(w))),
                       (acc, x) -> acc + x)                            AS total_chars,
           CAST(EXISTS (SELECT 1 FROM UNNEST(ws) AS t(w) WHERE w = 'spark')
                AS BOOLEAN)                                            AS mentions_spark
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents)
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas on arrays: filter, aggregate (reduce), and
    exists — per-row collection processing without explode+reshuffle."""
    t = _t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return t["documents"].select(
        "doc_id",
        F.size(F.filter(ws, lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(ws, lambda w: w == "spark").alias("mentions_spark"),
    )


# ---------------------------------------------------------------------------
# Sessionization — batch session_window vs gaps-and-islands oracle
# ---------------------------------------------------------------------------

@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, "value",
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, "value",
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*)                               AS n_events,
           ROUND(SUM("value"), 2)                 AS session_value
    FROM sess GROUP BY user_id, sess_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap over the events
    table (batch form of the streaming ``session_window`` operator).
    Spark merges an event into the current session iff it lands
    STRICTLY before prev_ts + gap, so the oracle's new-session flag is
    ``diff >= gap``. One shuffle on user_id; session state merges
    per-partition — no self-join, which is what survives 100 TB."""
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "session_value",
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median (sort-based agg)
# ---------------------------------------------------------------------------

@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25), 2) AS p25,
           ROUND(MEDIAN(o_totalprice), 2)              AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75), 2) AS p75,
           ROUND(QUANTILE_CONT(o_totalprice, 0.95), 2) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group. Exact
    percentile is a sort-based aggregate; at 100 TB the approximate
    sketch (``agg_approx_distinct``'s cousin ``percentile_approx``) is
    the scale path — this query is the exactness proof."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
            F.round(F.median("o_totalprice"), 2).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
            F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (Catalyst decorrelates into an agg join)
# ---------------------------------------------------------------------------

# One SQL text runs on BOTH engines (the Spark side is spark.sql of
# this string). The correlated mean accumulates integer NANO-units in
# DECIMAL(38,0) — portable to both dialects, order-independent — so
# the hard `price > mean` membership cannot flip on float partial-sum
# order (a type whose prices are all equal puts every row exactly ON
# the boundary, where a 1-ulp AVG difference flips the whole group).
# The exact sum is CAST TO DOUBLE before the division and divided by
# the DOUBLE literal 1e9: `x / 1000000000.0` is decimal division
# rounded at scale 6 in Spark but double division in DuckDB — the
# all-equal boundary case then flips on the representation (measured:
# 900.070000 decimal vs 900.0699999999999 double). Identical double
# arithmetic on both engines is the fix.
_ABOVE_TYPE_AVG_SQL = """
SELECT p.p_partkey, p.p_name, p.p_type,
       ROUND(p.p_retailprice, 2) AS p_retailprice
FROM part p
WHERE p.p_retailprice > (
    SELECT CAST(SUM(CAST(ROUND(p2.p_retailprice * 1000000000)
                         AS DECIMAL(38,0))) AS DOUBLE)
           / 1e9 / COUNT(*)
    FROM part p2 WHERE p2.p_type = p.p_type
)
"""


@register("subquery_above_type_avg", oracle=_ABOVE_TYPE_AVG_SQL)
def subquery_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, given to Catalyst as SQL so the
    decorrelation rewrite (subquery → aggregate + join on p_type) is
    exercised — the physical plan is a broadcast hash join against the
    per-type averages, not a per-row re-scan."""
    t = _t(spark, sf_dir, "part")
    t["part"].createOrReplaceTempView("part")
    return spark.sql(_ABOVE_TYPE_AVG_SQL)


# ---------------------------------------------------------------------------
# Lateral explode + agg (UNNEST)
# ---------------------------------------------------------------------------

@register(
    "explode_word_counts",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (lateral unnest) + count + top-k: the word-count shape.
    The explode fans out BEFORE the shuffle so the aggregation gets
    map-side partial combines; top-k is TakeOrderedAndProject."""
    t = _t(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / STRING_AGG)
# ---------------------------------------------------------------------------

@register(
    "string_agg_ordered",
    oracle="""
    SELECT s_nationkey AS nationkey,
           COUNT(*) AS n_suppliers,
           STRING_AGG(s_name, ',' ORDER BY s_name) AS supplier_names
    FROM supplier GROUP BY s_nationkey
    """,
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-deterministic string aggregation: collect_list is
    unordered across partitions, so sort the array after collection —
    the only way to get stable LISTAGG semantics distributed."""
    t = _t(spark, sf_dir, "supplier")
    return (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_names"
            ),
        )
    )


# ---------------------------------------------------------------------------
# NTILE bucketing
# ---------------------------------------------------------------------------

@register(
    "ntile_price_quartiles",
    oracle="""
    SELECT o_orderpriority, quartile,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM (
      SELECT o_orderpriority, o_totalprice,
             CAST(NTILE(4) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
             ) AS INTEGER) AS quartile
      FROM orders
    )
    GROUP BY o_orderpriority, quartile
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) bucketing per priority class, then per-bucket min/max —
    quartile boundary discovery without a global sort."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Salted skew join (explicit hot-key mitigation; result == plain join)
# ---------------------------------------------------------------------------

N_SALTS = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(e."value"), 2) AS total_value,
           MAX(u.n_user_events) AS n_user_events
    FROM events e
    JOIN (SELECT user_id, COUNT(*) AS n_user_events FROM events GROUP BY user_id) u
      ON e.user_id = u.user_id
    GROUP BY e.user_id
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: the fact side appends a random-free
    deterministic salt (event_id % N_SALTS) and the dimension side
    explodes each key into all N_SALTS variants, so one hot user_id
    spreads over N_SALTS reducers instead of one straggler task.

    AQE's skew-join split handles this automatically for sort-merge
    joins; the manual salt is the portable form (works under any join
    strategy, and for aggregations too). Result is provably identical
    to the unsalted join — which is exactly what the oracle checks."""
    t = _t(spark, sf_dir, "events")
    ev = t["events"]
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n_user_events"))
    fact_salted = ev.withColumn("salt", (F.col("event_id") % N_SALTS).cast("int"))
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    return (
        fact_salted.join(dim_salted, ["user_id", "salt"])
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("n_user_events").alias("n_user_events"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-grain time rollup (hypertable-style continuous aggregate, one pass)
# ---------------------------------------------------------------------------

@register(
    "rollup_time_multigrain",
    oracle="""
    SELECT grain, bucket, event_type, n_events, total_value FROM (
      SELECT 'hour' AS grain,
             STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00') AS bucket,
             event_type, COUNT(*) AS n_events, ROUND(SUM("value"), 2) AS total_value
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'day', STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d 00:00'),
             event_type, COUNT(*), ROUND(SUM("value"), 2)
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'week', STRFTIME(DATE_TRUNC('week', ts), '%Y-%m-%d 00:00'),
             event_type, COUNT(*), ROUND(SUM("value"), 2)
      FROM events GROUP BY 2, 3
    )
    """,
)
def rollup_time_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/week rollups in ONE scan via grouping-sets expansion
    over pre-computed grain buckets (the hypertable continuous-
    aggregate shape). One Expand + one shuffle instead of three
    scans+shuffles — at 100 TB the scan dominates, so this is ~3×
    cheaper than the UNION ALL form the oracle uses."""
    t = _t(spark, sf_dir, "events")
    bucketed = t["events"].select(
        "event_type",
        "value",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("b_hour"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd 00:00").alias("b_day"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd 00:00").alias("b_week"),
    )
    bucketed.createOrReplaceTempView("_multigrain_src")
    return spark.sql(
        """
        SELECT CASE WHEN b_hour IS NOT NULL THEN 'hour'
                    WHEN b_day  IS NOT NULL THEN 'day'
                    ELSE 'week' END                         AS grain,
               COALESCE(b_hour, b_day, b_week)              AS bucket,
               event_type,
               COUNT(*)                                     AS n_events,
               ROUND(SUM(value), 2)                         AS total_value
        FROM _multigrain_src
        GROUP BY GROUPING SETS ((b_hour, event_type), (b_day, event_type),
                                (b_week, event_type))
        """
    )


# ---------------------------------------------------------------------------
# Array / collection scalar functions
# ---------------------------------------------------------------------------

@register(
    "scalar_array_ops",
    oracle="""
    SELECT p_partkey,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INTEGER)            AS n_words,
           ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(p_name, ' ')), '|') AS sorted_words,
           ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
                                          w -> UPPER(w)), ' ')        AS upper_name,
           LIST_CONTAINS(STRING_SPLIT(p_name, ' '), 'widget')         AS is_widget,
           STRING_SPLIT(p_name, ' ')[1]                               AS first_word
    FROM part
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed scalar functions — split / size / sort / lambda
    transform / contains / element access, all JVM-side built-ins
    (SURVEY.md §2.4 scalar-functions row, array segment)."""
    t = _t(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return t["part"].select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
        F.array_join(F.transform(words, lambda w: F.upper(w)), " ").alias("upper_name"),
        F.array_contains(words, "widget").alias("is_widget"),
        F.element_at(words, 1).alias("first_word"),
    )


# ---------------------------------------------------------------------------
# Deterministic dataset split (hash-sharded train/val/test)
# ---------------------------------------------------------------------------

# ONE definition of the deterministic 80/10/10 content-hash split,
# shared by ``dataset_split`` and the leakage audit
# (dedup.split_leakage_audit) so the audited split can never drift
# from the training split.
SPLIT_BUCKET_SQL = (
    "((STRPOS('0123456789abcdef', SUBSTR(MD5(CAST({id} AS VARCHAR)), 1, 1)) - 1)"
    " * 16"
    " + STRPOS('0123456789abcdef', SUBSTR(MD5(CAST({id} AS VARCHAR)), 2, 1)) - 1)"
    " % 100"
)


def split_case_sql(id_expr: str) -> str:
    """DuckDB CASE expression assigning train/val/test from ``id``."""
    b = SPLIT_BUCKET_SQL.format(id=id_expr)
    return (
        f"CASE WHEN {b} < 80 THEN 'train'"
        f" WHEN {b} < 90 THEN 'val' ELSE 'test' END"
    )


def split_col(id_col):
    """Spark column twin of :func:`split_case_sql`."""
    h = F.md5(id_col.cast("string"))
    byte0 = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1) * 16
        + F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1))
        - 1
    )
    bucket = byte0 % 100
    return (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )


@register(
    "dataset_split",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM (
      SELECT doc_id, {split_case_sql("doc_id")} AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-key
    hash (first md5 byte of the id, mod 100) — the split survives
    re-runs, repartitioning, and incremental appends, unlike
    ``df.sample``/``randomSplit`` whose seeds are engine- and
    partitioning-dependent. This is how a 100 TB corpus is split:
    stateless per row, no global coordination."""
    t = _t(spark, sf_dir, "documents")["documents"]
    return (
        t.select("doc_id", split_col(F.col("doc_id")).alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified sampling (deterministic per-group cap)
# ---------------------------------------------------------------------------

@register(
    "sample_stratified",
    oracle="""
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: at most 20 docs per language, chosen by
    hash order (deterministic pseudo-random, stable under
    repartitioning) — the per-class balancing step of a training-data
    pipeline. One shuffle on the stratum key."""
    t = _t(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Conditional expressions
# ---------------------------------------------------------------------------

@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END            AS status_label,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS pri_or_default,
           GREATEST(o_totalprice, 1000.0)                 AS price_floor,
           LEAST(o_totalprice, 500000.0)                  AS price_cap,
           o_totalprice BETWEEN 1000 AND 2000             AS in_band
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: CASE, NULLIF/COALESCE, GREATEST/
    LEAST, BETWEEN — all codegen built-ins."""
    t = _t(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("default")
        ).alias("pri_or_default"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("price_floor"),
        F.least("o_totalprice", F.lit(500000.0)).alias("price_cap"),
        F.col("o_totalprice").between(1000, 2000).alias("in_band"),
    )


# ---------------------------------------------------------------------------
# Date/interval arithmetic scalar family
# ---------------------------------------------------------------------------

@register(
    "scalar_date_arith",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')  AS plus_3m,
           STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d')           AS month_end,
           CAST(DATE_DIFF('day', o_orderdate,
                TIMESTAMP '1998-12-31 00:00:00') AS INTEGER)     AS days_to_eoy,
           CAST(DATE_PART('quarter', o_orderdate) AS INTEGER)    AS qtr,
           CAST(DATE_PART('dow', o_orderdate) AS INTEGER)        AS dow,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: add_months, last_day, datediff,
    quarter/day-of-week extraction, month truncation — all codegen
    built-ins (SURVEY.md §2.4 scalar row, date segment). DuckDB's
    dow is 0=Sunday; Spark's dayofweek is 1=Sunday, aligned with -1."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
                "plus_3m"
            ),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(
                F.lit("1998-12-31").cast("date"), F.col("o_orderdate")
            ).alias("days_to_eoy"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Value-navigation window functions (first/last/nth)
# ---------------------------------------------------------------------------

@register(
    "window_first_last",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS latest_type,
           NTH_VALUE(event_type, 2) OVER w AS second_type
    FROM events
    WHERE user_id % 25 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value navigation over a running frame: each event sees the
    user's first, latest, and second event types so far."""
    t = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["events"]
        .filter(F.col("user_id") % 25 == 0)
        .select(
            "user_id",
            "event_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("latest_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered funnel (sequential conversion stages)
# ---------------------------------------------------------------------------

@register(
    "funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, COUNT(*) AS n_users FROM (
      SELECT v.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
    ) GROUP BY stage
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → later click → later purchase):
    users counted at their furthest strictly-ordered stage.

    Single-pass formulation: ONE shuffle on user_id collects each
    user's (ts, type) events, and a codegen ``aggregate`` fold over the
    time-sorted array walks the stage machine (first view, then first
    click strictly after it, then first purchase strictly after that).
    The greedy walk over sorted events equals the oracle's
    min-timestamp chain exactly. vs the 3-aggregation join version:
    one events scan instead of three and 2 shuffles instead of 6.
    Per-user memory is the user's event list — bounded for real user
    activity; a pathological hot key would be salted upstream."""
    ev = _t(spark, sf_dir, "events")["events"]
    return _funnel_stage_counts(ev, window=None)


def _funnel_stage_counts(ev: DataFrame, window) -> DataFrame:
    """Shared funnel stage machine (``funnel_stages`` /
    ``funnel_time_constrained``): greedy fold over each user's
    time-sorted events through view → later click → later purchase;
    ``window`` (a Column interval or None) additionally bounds each
    step to land within that interval of the previous one."""
    evs = F.array_sort(F.collect_list(F.struct("ts", "event_type")))

    def mk(stage: int, ts):
        return F.struct(F.lit(stage).alias("stage"), ts.alias("sts"))

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp_ntz").alias("sts")
    )

    def in_window(e, acc):
        cond = e["ts"] > acc["sts"]
        if window is not None:
            cond = cond & (e["ts"] <= acc["sts"] + window)
        return cond

    def step(acc, e):
        return (
            F.when(
                (acc["stage"] == 0) & (e["event_type"] == "view"),
                mk(1, e["ts"]),
            )
            .when(
                (acc["stage"] == 1)
                & (e["event_type"] == "click")
                & in_window(e, acc),
                mk(2, e["ts"]),
            )
            .when(
                (acc["stage"] == 2)
                & (e["event_type"] == "purchase")
                & in_window(e, acc),
                mk(3, e["ts"]),
            )
            .otherwise(acc)
        )

    return (
        ev.groupBy("user_id")
        .agg(F.aggregate(evs, init, step)["stage"].alias("stage"))
        .filter(F.col("stage") >= 1)
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Curation pipeline (language + quality + exact-dup keeper, per source)
# ---------------------------------------------------------------------------

@register(
    "curation_pipeline",
    oracle="""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)
    ), scored AS (
      SELECT d.source,
             d.lang IN ('en', 'es', 'de') AS lang_ok,
             (CASE WHEN LENGTH(d.text) >= 200 THEN 1 ELSE 0 END
              + CASE WHEN LENGTH(d.text) - LENGTH(REPLACE(d.text, ' ', '')) + 1 >= 40
                     THEN 1 ELSE 0 END
              + CASE WHEN CAST(LENGTH(REPLACE(d.text, ' ', '')) AS DOUBLE)
                          / (LENGTH(d.text) - LENGTH(REPLACE(d.text, ' ', '')) + 1)
                          BETWEEN 3 AND 8 THEN 1 ELSE 0 END) >= 2 AS quality_ok,
             k.doc_id IS NOT NULL AS is_keeper
      FROM documents d LEFT JOIN keepers k ON d.doc_id = k.doc_id
    )
    SELECT source,
           COUNT(*) AS docs_in,
           CAST(COUNT(*) FILTER (WHERE lang_ok AND quality_ok AND is_keeper)
                AS BIGINT) AS docs_kept,
           ROUND(COUNT(*) FILTER (WHERE lang_ok AND quality_ok AND is_keeper)
                 * 100.0 / COUNT(*), 2) AS pct_kept
    FROM scored GROUP BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation funnel per source: language allowlist +
    quality-score gate (functions.quality_score) + exact-dup keeper,
    reported as kept/in ratios. The composition story: the same column
    builders used by the standalone text queries chain into one
    declarative pipeline — one scan, one dedup shuffle, one agg."""
    from rs_streamloader_spark.functions import quality_score

    d = _t(spark, sf_dir, "documents")["documents"]
    keepers = (
        d.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    kept = (
        F.col("lang").isin("en", "es", "de")
        & (quality_score("text") >= 2)
        & F.col("is_keeper")
    )
    return (
        d.join(
            keepers.withColumn("is_keeper", F.lit(True)), "doc_id", "left"
        )
        .na.fill({"is_keeper": False})
        .select("source", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_in"),
            F.count_if("kept").alias("docs_kept"),
            F.round(F.count_if("kept") * 100.0 / F.count("*"), 2).alias("pct_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Map-typed scalar functions (JSON → typed map → map ops)
# ---------------------------------------------------------------------------

@register(
    "scalar_map_ops",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(LIST_SORT(JSON_KEYS(props)), ',') AS prop_keys,
           CAST(LEN(JSON_KEYS(props)) AS INTEGER)            AS n_props,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    WHERE event_id % 50 = 0
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: parse the JSON props string into a
    typed ``map<string,string>`` (schema_of-free — open key set), then
    map_keys / size / element access, all JVM-side."""
    t = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        t["events"]
        .filter(F.col("event_id") % 50 == 0)
        .select(
            "event_id",
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
            F.size(m).alias("n_props"),
            F.element_at(m, "k").cast("int").alias("k_value"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution-rank window functions
# ---------------------------------------------------------------------------

@register(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family (percent_rank / cume_dist /
    rank / dense_rank) in one pass over a single window definition."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("dense_rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (melt)
# ---------------------------------------------------------------------------

@register(
    "unpivot_status_counts",
    oracle="""
    WITH wide AS (
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
      FROM orders GROUP BY 1
    )
    SELECT order_year, order_status, n_orders FROM wide
    UNPIVOT (n_orders FOR order_status IN (status_f, status_o, status_p))
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-then-unpivot round trip: wide conditional counts melted
    back to long form with ``DataFrame.unpivot`` (no shuffle — melt is
    a per-row generator)."""
    t = _t(spark, sf_dir, "orders")
    wide = (
        t["orders"]
        .withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("status_f"),
            F.count_if(F.col("o_orderstatus") == "O").alias("status_o"),
            F.count_if(F.col("o_orderstatus") == "P").alias("status_p"),
        )
    )
    return wide.unpivot(
        ids=["order_year"],
        values=["status_f", "status_o", "status_p"],
        variableColumnName="order_status",
        valueColumnName="n_orders",
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    a AS (SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS week FROM events)
    SELECT STRFTIME(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(DATE_DIFF('day', f.cohort_week, a.week) // 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    counted once per week they return — the classic product-analytics
    triangle (cohort_week × week_offset → active users).

    Single-pass plan: the per-user first-event week rides a window
    MIN over the one user_id shuffle, the (user, week, cohort)
    DISTINCT reuses that partitioning (same-user rows are already
    co-located, so Catalyst plans no extra exchange), and only the
    tiny cohort×offset aggregate shuffles again — no self-join of
    events against a firsts table, which is the formulation that
    shuffles the fact table twice at 100 TB. Both engines truncate
    weeks to ISO Monday and count day deltas / 7."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    weeks = (
        t["events"]
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("week"),
            F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
        )
        .distinct()
    )
    return (
        weeks.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# CDC: slowly-changing-dimension type 2 from an event log
# ---------------------------------------------------------------------------

@register(
    "cdc_scd2_users",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(STRFTIME(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def cdc_scd2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from the event log: each
    change of a user's event_type opens a new version row with
    [valid_from, valid_to) bounds and an is_current flag. This is the
    history-preserving sibling of the reference's upsert dedupe
    ('last' keeps only the newest row per key —
    /root/reference/lib/RedshiftLoader.ts:361-374); SCD2 is what a
    warehouse keeps when it cannot afford to lose the old versions.
    Both windows share the user_id partitioning and (ts, event_id)
    sort, so Catalyst plans ONE exchange + sort reused by the lag,
    lead, and row_number — change detection never self-joins the log.
    Timestamps leave as formatted strings (TZ-invariant compare)."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t["events"]
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Domain-mixture rebalanced sampling (training-data mixing)
# ---------------------------------------------------------------------------

def _mix_u_sql() -> str:
    """DuckDB: deterministic uniform in [0,1) from the first 4 hex
    digits of md5(doc_id || '_mix') — the same integer Spark computes
    via conv(), divided by 65536."""
    h = "MD5(CAST(doc_id AS VARCHAR) || '_mix')"
    terms = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) / 65536.0)"


@register(
    "domain_mix_sample",
    oracle=f"""
    WITH w AS (
      SELECT source, COUNT(*) AS n,
             (CAST(SUBSTR(source, 4) AS INT) % 4) + 1 AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(w) AS w_tot FROM w),
    t AS (SELECT MIN((CAST(n AS DOUBLE) * w_tot) / w) AS t FROM w, tot),
    rates AS (
      SELECT source, n, ((w * t) / w_tot) / n AS rate FROM w, tot, t
    ),
    u AS (
      SELECT doc_id, source, {_mix_u_sql()} AS u FROM documents
    )
    SELECT r.source, CAST(r.n AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN u.u < r.rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(r.rate, 6) AS rate
    FROM u JOIN rates r USING (source)
    GROUP BY r.source, r.n, r.rate
    """,
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample each source so the kept
    corpus matches target mixture weights (w = source_num % 4 + 1,
    standing in for a configured mixture like Pile/Dolma domain
    weights), taking the largest feasible total — T = min_s(n_s·W/w_s)
    — so no source is oversampled. Acceptance is a deterministic
    per-document hash threshold (first 4 md5 hex digits of the doc id
    → uniform u ∈ [0,1); keep iff u < rate_s), so the sample is stable
    across re-runs, repartitioning, and incremental appends — the same
    stateless-per-row property as ``dataset_split``, which is what
    makes it valid at 100 TB: the only coordination is one tiny
    per-source aggregate broadcast back to the scan.

    Output is the per-source audit: total docs, kept docs, applied
    rate. Reference surface: none (novel extension operator,
    SURVEY.md §2.5 curation family)."""
    t = _t(spark, sf_dir, "documents")["documents"]
    w_col = (F.expr("CAST(substring(source, 4) AS INT)") % 4 + 1).alias("w")
    per_source = t.groupBy("source").agg(F.count("*").alias("n")).withColumn(
        "w", w_col
    )
    # w_tot and T derive from per_source via global windows over the
    # ~20-row aggregate — one scan feeds everything (the crossJoin
    # formulation re-derived per_source from scratch for each scalar,
    # 5 full table scans in the executed plan)
    wg = Window.partitionBy()
    rates = (
        per_source.withColumn("w_tot", F.sum("w").over(wg))
        .withColumn(
            "t",
            F.min(
                (F.col("n").cast("double") * F.col("w_tot")) / F.col("w")
            ).over(wg),
        )
        .select(
            "source",
            "n",
            (((F.col("w") * F.col("t")) / F.col("w_tot")) / F.col("n")).alias("rate"),
        )
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_mix")))
    u = (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") / F.lit(65536.0)).alias("u")
    return (
        t.select("doc_id", "source", u)
        .join(F.broadcast(rates), "source")
        .groupBy("source", "n", "rate")
        .agg(
            F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0)).alias("n_kept")
        )
        .select(
            "source",
            F.col("n").alias("n_total"),
            F.col("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width numeric histogram (binning)
# ---------------------------------------------------------------------------

@register(
    "numeric_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
           CAST(FLOOR(o_totalprice / 25000) AS BIGINT) * 25000.0 AS bin_lo,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (25k-wide bins).

    Scale posture: a single map-side-combinable aggregate on a derived
    integer key — one scan, one shuffle of ~40 partial rows per task
    regardless of input size. Bin width is a constant so the bin id is
    a codegen'd arithmetic expression, never a UDF or a join against a
    bin table."""
    t = _t(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 25000).cast("bigint")
    return (
        t["orders"]
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            "bin",
            (F.col("bin") * 25000.0).alias("bin_lo"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Cumulative distribution / dense rank window
# ---------------------------------------------------------------------------

@register(
    "window_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(CUME_DIST() OVER w, 6) AS price_cume_dist,
           DENSE_RANK() OVER w AS price_dense_rank
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST + DENSE_RANK over a value ordering per group —
    completes the ranking-window family (rank/percent_rank/ntile are
    separate catalog entries). cume_dist is a pure count ratio so the
    6dp rounding matches DuckDB bit-exactly."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        t["orders"]
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
            F.dense_rank().over(w).alias("price_dense_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Interval concurrency (sweep-line over session intervals)
# ---------------------------------------------------------------------------

_CONCURRENCY_GAP_S = 1800


@register(
    "interval_concurrency",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {_CONCURRENCY_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, MIN(ts) AS s, MAX(ts) AS e
      FROM (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM flagged
      ) GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s AS ts, 1 AS d FROM sessions
      UNION ALL
      SELECT e AS ts, -1 AS d FROM sessions
    ),
    swept AS (
      SELECT ts,
             SUM(d) OVER (ORDER BY ts, d DESC ROWS UNBOUNDED PRECEDING)
               AS concurrency
      FROM deltas
    )
    SELECT DATE_TRUNC('hour', ts) AS hour,
           CAST(MAX(concurrency) AS BIGINT) AS max_concurrent_sessions
    FROM swept GROUP BY 1
    """,
)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent sessions per hour — sweep-line over session
    intervals (sessionize -> +1/-1 deltas -> running sum -> max/hour).
    Sessions are closed intervals: at a shared timestamp the +1 sorts
    before the -1, so a session ending exactly when another starts
    counts both.

    Scale posture: the oracle's single global running sum is a
    one-partition window — fine for DuckDB, a serial bottleneck on a
    cluster. This implementation is the classic TWO-PASS distributed
    prefix sum: (1) within each hour partition, a running sum ordered
    by (ts, d DESC); (2) per-hour net totals — a few hundred rows —
    aggregated, prefix-summed on a single tiny partition, and
    broadcast back as each hour's starting offset. Concurrency =
    hour offset + within-hour prefix; the wide window never sees more
    than one hour of deltas per partition."""
    t = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts")
    ev = t["events"].select("user_id", "ts")
    # timestampdiff is timezone-independent on TIMESTAMP_NTZ inputs
    # (unix_timestamp would route through the session zone)
    # MICROSECOND, not SECOND: timestampdiff truncates toward zero, so
    # a SECOND-unit diff collapses gaps in (1800s, 1801s) to exactly
    # 1800 and merges sessions the oracle's exact interval compare
    # splits (a 1800.886s gap exists at sf0.01)
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(wu)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                > F.lit(_CONCURRENCY_GAP_S * 1_000_000)
            ),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn(
            "sid",
            F.sum("new_sess").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    deltas = sessions.select(F.col("s").alias("ts"), F.lit(1).alias("d")).unionAll(
        sessions.select(F.col("e").alias("ts"), F.lit(-1).alias("d"))
    )
    deltas = deltas.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    w_in = (
        Window.partitionBy("hour")
        .orderBy(F.col("ts"), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = deltas.withColumn("run_in", F.sum("d").over(w_in))
    # pass 2: per-hour net totals are tiny (one row per hour) — the
    # global ordering window runs on that reduced set only
    w_hours = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        deltas.groupBy("hour")
        .agg(F.sum("d").alias("net"))
        .withColumn("offset", F.coalesce(F.sum("net").over(w_hours), F.lit(0)))
        .select("hour", "offset")
    )
    return (
        within.join(F.broadcast(offsets), "hour")
        .groupBy("hour")
        .agg(F.max(F.col("offset") + F.col("run_in")).alias("max_concurrent_sessions"))
        .select("hour", "max_concurrent_sessions")
    )


# ---------------------------------------------------------------------------
# SCD2 as-of enrichment (carry-forward join, no range probe)
# ---------------------------------------------------------------------------

@register(
    "scd2_asof_enrich",
    oracle="""
    WITH dim AS (
      -- the SCD2 dimension is the NON-purchase event stream: with
      -- purchases included, every purchase opened (or inherited) a
      -- 'purchase' version and state_type was constant by
      -- construction (r10 vacuity scan) — the enrichment enriched
      -- nothing
      SELECT * FROM events WHERE event_type <> 'purchase'
    ),
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM dim
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS BIGINT) AS version
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    tagged AS (
      SELECT user_id, ts, event_id, 0 AS tag, version,
             event_type AS state_type, NULL AS "value"
      FROM changes
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS tag, NULL, NULL, "value"
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT user_id, ts, event_id, tag, "value",
             LAST_VALUE(version IGNORE NULLS) OVER w AS version,
             LAST_VALUE(state_type IGNORE NULLS) OVER w AS state_type
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS purchase_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           version, state_type,
           ROUND("value", 2) AS purchase_value
    FROM filled WHERE tag = 1
    """,
)
def scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich purchase events with the SCD2 dimension version valid at
    purchase time (the ``cdc_scd2_users`` history, joined as-of).

    Scale posture: the naive plan is a range join on
    valid_from <= ts < valid_to — an interval probe that Spark can only
    express as a broadcast-nested-loop or a banded equi-join. This
    implementation uses the warehouse carry-forward idiom instead:
    UNION the version-open rows with the purchases, sort per user by
    (ts, event_id, tag), and LAST(... ignorenulls) carries each open
    version forward onto the purchases that follow it — two shuffles
    on the SAME user_id key (derive the change log, then window the
    union), no interval probe, no join at all. The dimension is the
    NON-purchase event stream (a purchase never opens its own
    version — until r10 it did, which made ``state_type`` constant
    'purchase' by construction, an enrichment that enriched nothing);
    a purchase with no preceding dimension state reports NULLs, the
    honest as-of answer."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t["events"]
        .filter(F.col("event_type") != "purchase")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("tag"),
            F.row_number().over(w).cast("bigint").alias("version"),
            F.col("event_type").alias("state_type"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(1).alias("tag"),
            F.lit(None).cast("bigint").alias("version"),
            F.lit(None).cast("string").alias("state_type"),
            "value",
        )
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = changes.unionByName(purchases).select(
        "user_id",
        "ts",
        "event_id",
        "tag",
        "value",
        F.last("version", ignorenulls=True).over(wf).alias("version_f"),
        F.last("state_type", ignorenulls=True).over(wf).alias("state_type_f"),
    )
    return filled.filter(F.col("tag") == 1).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("version_f").alias("version"),
        F.col("state_type_f").alias("state_type"),
        F.round("value", 2).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Per-group bounded sampling (hash-ordered top-k per group)
# ---------------------------------------------------------------------------

_GROUP_SAMPLE_K = 8


@register(
    "group_sample_topk_hash",
    oracle=f"""
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR) || '_smp'), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_GROUP_SAMPLE_K}
    """,
)
def group_sample_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group downsampling: keep at most
    {_GROUP_SAMPLE_K} documents per source, chosen by md5-hash order —
    the bounded-per-domain sample a curation pipeline takes before
    expensive per-document processing. Hash order is a seeded uniform
    shuffle both engines compute identically, unlike rand().

    Scale posture: one shuffle on the group key + a rank filter. On a
    real cluster the rank-k filter is pushed into the sort as a
    per-partition top-k (WindowGroupLimit pushes k into the shuffle's
    map side in Spark 3.5+), so no group ever materializes fully."""
    t = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_smp"))), "doc_id"
    )
    return (
        t["documents"]
        .select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _GROUP_SAMPLE_K)
        .select("source", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Share-of-total (ratio_to_report window over an aggregate)
# ---------------------------------------------------------------------------

@register(
    "agg_share_of_total",
    oracle="""
    WITH per_nation AS (
      SELECT n.n_name,
             SUM(o.o_totalprice) AS revenue
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS revenue_share
    FROM per_nation
    """,
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of global revenue. The
    share window runs over the AGGREGATED 25-row result, so the
    single-partition window that computes the global total sees one
    row per nation — never the fact table. Dims broadcast; the only
    full-size shuffle is the revenue aggregation."""
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    per_nation = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy()
    return per_nation.select(
        "n_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (trapezoidal, per entity)
# ---------------------------------------------------------------------------

@register(
    "time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, "value",
             LAG("value") OVER w AS prev_value,
             CAST(DATE_DIFF('microseconds', LAG(ts) OVER w, ts) AS BIGINT)
               AS dt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           ROUND(SUM((prev_value + "value") / 2.0 * dt_us)
                 / SUM(dt_us), 4) AS twa_value,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM seg
    WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's event value (trapezoidal
    rule over consecutive-event segments) — the hypertable-rollup
    aggregate for irregularly sampled series, where a plain AVG
    over-weights bursts. Segment weights are exact integer
    microseconds (identical in both engines); zero-length segments
    (same-timestamp events) drop out, matching the integral's measure.

    Scale posture: one shuffle on user_id shared by the lag window and
    the final aggregate (same partitioning key, no second exchange);
    per-row work is codegen arithmetic. At 100 TB this is the
    segment-then-reduce shape a timeseries rollup needs — never a
    self-join on adjacency."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = t["events"].select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lag("ts").over(w).alias("prev_ts"),
        "ts",
    ).withColumn(
        "dt_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").cast("bigint")
    )
    return (
        seg.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum((F.col("prev_value") + F.col("value")) / 2.0 * F.col("dt_us"))
                / F.sum("dt_us"),
                4,
            ).alias("twa_value"),
            F.count("*").cast("bigint").alias("n_segments"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mode per group (most frequent value, explicit tiebreak)
# ---------------------------------------------------------------------------

@register(
    "agg_mode_per_group",
    oracle="""
    SELECT o_orderpriority, event_mode, mode_count FROM (
      SELECT o.o_orderpriority AS o_orderpriority,
             e.event_type AS event_mode,
             COUNT(*) AS mode_count,
             ROW_NUMBER() OVER (
               PARTITION BY o.o_orderpriority
               ORDER BY COUNT(*) DESC, e.event_type
             ) AS rn
      FROM events e JOIN orders o ON e.user_id = o.o_custkey
      GROUP BY 1, 2
    ) WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with an EXPLICIT tiebreak
    (count DESC, value ASC) — both engines ship a ``mode()`` aggregate,
    but neither defines tie order, so the deterministic form is
    count + rank, which also survives a cross-engine compare.

    Scale posture: the (group, value) count is map-side combinable;
    the rank-1 filter is a WindowGroupLimit over the counted pairs —
    group cardinality × value cardinality rows, not input rows."""
    t = _t(spark, sf_dir, "events", "orders")
    counted = (
        t["events"]
        .join(
            t["orders"].select("o_custkey", "o_orderpriority"),
            F.col("user_id") == F.col("o_custkey"),
        )
        .groupBy("o_orderpriority", F.col("event_type").alias("event_mode"))
        .agg(F.count("*").alias("mode_count"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("mode_count").desc(), "event_mode"
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", "event_mode", "mode_count")
    )


# ---------------------------------------------------------------------------
# Median absolute deviation (robust dispersion, two sort-aggregates)
# ---------------------------------------------------------------------------

@register(
    "agg_median_abs_deviation",
    oracle="""
    WITH med AS (
      SELECT event_type, MEDIAN("value") AS m
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(MAX(med.m), 4) AS median_value,
           ROUND(MEDIAN(ABS(e."value" - med.m)), 4) AS mad
    FROM events e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type
    """,
)
def agg_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust
    dispersion statistic z-score filtering (``anomaly_zscore``) is
    sensitive to: MAD ignores the outliers themselves. Built from two
    exact median aggregates (per-group median, broadcast back, median
    of absolute residuals) rather than either engine's MAD built-in,
    so the formula is identical on both sides.

    Scale posture: exact medians are sort-based aggregates — two
    shuffles on the same group key with a broadcast of the ~5-row
    median table between them; the classic exact-robust-stats cost.
    An approx_percentile single-pass variant is the scale dial when
    exactness can be traded."""
    t = _t(spark, sf_dir, "events")
    med = (
        t["events"]
        .groupBy("event_type")
        .agg(F.median("value").alias("m"))
    )
    return (
        t["events"]
        .join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("m"), 4).alias("median_value"),
            F.round(F.median(F.abs(F.col("value") - F.col("m"))), 4).alias("mad"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram (global quantile binning without a global sort)
# ---------------------------------------------------------------------------

_EQUIDEPTH_BINS = 10


@register(
    "numeric_histogram_equidepth",
    oracle=f"""
    WITH b AS (
      SELECT QUANTILE_CONT(o_totalprice,
               [{", ".join(str((i + 1) / _EQUIDEPTH_BINS) for i in range(_EQUIDEPTH_BINS - 1))}])
             AS bs
      FROM orders
    )
    SELECT CAST(1 + LIST_SUM(LIST_TRANSFORM(b.bs,
             x -> CASE WHEN o.o_totalprice > x THEN 1 ELSE 0 END))
           AS BIGINT) AS bin,
           COUNT(*) AS n_orders,
           ROUND(MIN(o.o_totalprice), 2) AS bin_min,
           ROUND(MAX(o.o_totalprice), 2) AS bin_max
    FROM orders o CROSS JOIN b
    GROUP BY 1
    """,
)
def numeric_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals. The naive plan
    is NTILE over a global window — a single-partition sort of the
    whole table. This is the scalable two-pass form: exact decile
    boundaries from one sort-based percentile AGGREGATE (parallel,
    combinable), broadcast as a 1-row array, bin assignment as a pure
    fold over the 9 boundaries — no global window, no single-partition
    sort of input rows. Both engines interpolate quantiles with the
    same (n-1)p definition over identical doubles, and a boundary that
    lands exactly on a data value reproduces it exactly (interpolation
    weight 0), so bin edges agree."""
    t = _t(spark, sf_dir, "orders")
    ps = [(i + 1) / _EQUIDEPTH_BINS for i in range(_EQUIDEPTH_BINS - 1)]
    bounds = t["orders"].agg(
        F.percentile("o_totalprice", F.array(*[F.lit(p) for p in ps])).alias("bs")
    )
    bin_ = F.expr(
        "1 + aggregate(bs, 0, (acc, x) ->"
        " acc + IF(o_totalprice > x, 1, 0))"
    ).cast("bigint")
    return (
        t["orders"]
        .join(F.broadcast(bounds))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


# ---------------------------------------------------------------------------
# Column profiling (data-quality audit)
# ---------------------------------------------------------------------------

@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(o_custkey) AS n_nonnull,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           ROUND(MIN(o_custkey), 2) AS min_num,
           ROUND(MAX(o_custkey), 2) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', COUNT(*), COUNT(o_orderkey),
           COUNT(DISTINCT o_orderkey),
           ROUND(MIN(o_orderkey), 2), ROUND(MAX(o_orderkey), 2)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile (row/non-null/distinct counts
    + numeric range) for a set of columns — the audit a pipeline runs
    before trusting a new drop of data.

    Scale posture: ONE scan computes every per-column statistic as a
    single multi-aggregate row (Spark plans count-distincts via
    expand, still one pass over the data), then a stack() unpivots the
    1-row result into the per-column report — vs the oracle's
    three scans, one per column. The profile column list is static;
    at 100 TB you'd drive it from the schema the same way."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(F.col(c).cast("double")), 2).alias(f"{c}__min"),
            F.round(F.max(F.col(c).cast("double")), 2).alias(f"{c}__max"),
        ]
    one = t.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nonnull, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS"
        " (column_name, n_rows, n_nonnull, n_distinct, min_num, max_num)"
    )


# ---------------------------------------------------------------------------
# Time-constrained conversion funnel (step timeout)
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_H = 24


@register(
    "funnel_time_constrained",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
       AND e.ts > v.t_view
       AND e.ts <= v.t_view + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.ts > c.t_click
       AND e.ts <= c.t_click + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, COUNT(*) AS n_users FROM (
      SELECT v.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
    ) GROUP BY stage
    """,
)
def funnel_time_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with a {h}-hour step timeout: each stage must
    follow the previous within the window (view → click ≤{h}h later →
    purchase ≤{h}h after the click) — the attribution-window variant
    of ``funnel_stages`` every product funnel actually ships with.

    Same single-pass shape as the unconstrained twin: ONE shuffle on
    user_id, a codegen ``aggregate`` fold over the time-sorted event
    array. The greedy walk with the window guard equals the oracle's
    bounded min-timestamp chain: events arrive sorted, so the first
    in-window candidate IS the min, and any candidate past the window
    can never be followed by an earlier one."""
    ev = _t(spark, sf_dir, "events")["events"]
    return _funnel_stage_counts(
        ev, window=F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build from a change-event stream
# ---------------------------------------------------------------------------


@register(
    "scd2_build_from_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM ordered
    ),
    versions AS (
      SELECT user_id, island, MIN(event_type) AS state,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             IS NULL AS is_current,
           n_events
    FROM versions
    """,
)
def scd2_build_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension BUILD from a change-event stream: consecutive
    same-state runs per user collapse into validity intervals
    [valid_from, valid_to) with an open-ended current version — the
    construction side of slowly-changing-dimension handling
    (``scd2_asof_enrich`` consumes such a table; this produces one
    from raw events, the standard CDC-to-dimension pipeline step).

    Scale posture: both windows and the island aggregate partition by
    user_id — one shuffle on the user key serves change detection,
    island numbering, version rollup, and the valid_to LEAD; nothing
    is global. Cross-engine determinism: row order within a user is
    pinned by (ts, event_id); interval bounds leave as TIMESTAMP_NTZ;
    state within an island is constant (MIN is a formality)."""
    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    islands = ordered.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    versions = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("island")
    return versions.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Interval union: merge overlapping activity intervals per user
# ---------------------------------------------------------------------------

_ACT_INTERVAL_S = 1800  # each event opens a 30-min activity interval


@register(
    "merge_user_intervals",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {_ACT_INTERVAL_S} SECOND AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS new_iv
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_iv) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(DATE_DIFF('microsecond', ms, me) // 1000000) AS BIGINT) AS busy_s,
           MAX(DATE_DIFF('microsecond', ms, me) // 1000000) AS longest_s
    FROM merged GROUP BY user_id
    """,
)
def merge_user_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION per user: every event opens a 30-minute activity
    interval, overlapping intervals merge, and the per-user summary
    reports merged-interval count, total busy time, and the longest
    stretch — the range-consolidation primitive behind billing
    windows, on-call coverage, and machine-utilization reports
    (``interval_concurrency`` asks how many overlap; this asks how
    much the union covers).

    Scale posture: the sweep is the classic running-max-of-end
    detection — one shuffle on user_id carries the cumulative-max
    window, island numbering, the merge aggregate, and the final
    rollup. Cross-engine determinism: interval bounds order by
    (start, end); durations are exact integer microseconds floored to
    seconds once."""
    ev = _t(spark, sf_dir, "events")["events"]
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr(f"ts + INTERVAL {_ACT_INTERVAL_S} SECOND").alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
            >= F.col("s"),
            0,
        )
        .otherwise(1)
        .alias("new_iv"),
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_iv")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    dur_s = F.expr("timestampdiff(MICROSECOND, ms, me) div 1000000")
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(dur_s).alias("busy_s"),
        F.max(dur_s).alias("longest_s"),
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (per-source folds, hash-ordered)
# ---------------------------------------------------------------------------

_KFOLDS = 5


@register(
    "stratified_kfold",
    oracle=f"""
    WITH ranked AS (
      SELECT source, lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5('fold|' || CAST(doc_id AS VARCHAR))
             ) - 1 AS rk
      FROM documents
    )
    SELECT source, CAST(rk % {_KFOLDS} AS INT) AS fold,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM ranked GROUP BY source, rk % {_KFOLDS}
    """,
)
def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified {k}-fold assignment: within every source stratum,
    docs order by a salted hash and deal round-robin into {k} folds —
    each fold gets an equal share of EVERY source (plain hash-mod
    folds only balance in expectation; stratified dealing balances by
    construction, the difference that matters for small strata).
    Emits the fold × stratum occupancy plus a language-balance probe.

    Scale posture: the dealing window partitions per source (bounded
    strata, rank order row-local hash); the occupancy rollup is
    combinable. Cross-engine determinism: md5 hex ordering and
    round-robin arithmetic are identical everywhere."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    key = F.md5(F.concat(F.lit("fold|"), F.col("doc_id").cast("string")))
    ranked = docs.select(
        "source",
        "lang",
        (
            F.row_number().over(Window.partitionBy("source").orderBy(key)) - 1
        ).alias("rk"),
    )
    return ranked.groupBy(
        "source", (F.col("rk") % _KFOLDS).cast("int").alias("fold")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend estimator over the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "theil_sen_trend",
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
      SELECT d, rev_c,
             CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS t
      FROM daily
    ),
    slopes AS (
      SELECT CAST((CAST(b.rev_c - a.rev_c AS HUGEINT) * 1000000)
                  // (b.t - a.t) AS BIGINT) AS slope_micro
      FROM idx a JOIN idx b ON b.t > a.t
    ),
    ranked AS (
      SELECT slope_micro,
             ROW_NUMBER() OVER (ORDER BY slope_micro) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    )
    SELECT n AS n_pairs,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN slope_micro END)
             AS theil_sen_slope_micro
    FROM ranked GROUP BY n
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the trailing year's daily revenue:
    the median of all pairwise slopes (Δrevenue/Δdays) over the daily
    series — the outlier-immune answer to "is revenue trending up",
    unmoved by the single holiday spike that drags an OLS fit.

    Scale posture: the trailing-365-day predicate (broadcast max
    date) bounds the series at ANY data scale, so the pairwise loop
    is ≤ ~66k pairs regardless of history length; the median comes
    from the banded two-pass cumulative histogram, never a
    single-partition ranking sort. Cross-engine determinism: slopes are
    exact integer micro-units via HUGEINT/DECIMAL(38) floor-division
    (Δcents·1e6 overflows int64 at ~9e12 daily cents), and the median
    picks PERCENTILE_DISC's exact element."""
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
    # spread the stream side: the daily aggregate collapses to one
    # partition, which would serialize the O(days^2) pair loop
    a = spread(idx, 1).alias("a")
    b = idx.alias("b")
    # greatest(…, 1) guards codegen evaluating the projection fused
    # into the nested-loop consume before the t-ordering condition
    # drops the diagonal; kept rows always have Δt >= 1
    slopes = a.join(b, F.col("b.t") > F.col("a.t")).select(
        F.expr(
            "CAST((CAST(b.rev_c - a.rev_c AS DECIMAL(38,0)) * 1000000)"
            " div greatest(b.t - a.t, 1) AS BIGINT)"
        ).alias("slope_micro")
    )
    from rs_streamloader_spark.operators.quality import _banded_prefix

    # median via the banded two-pass cumulative histogram — a global
    # ranking window would sort every pair in ONE partition
    hist = slopes.groupBy("slope_micro").agg(F.count("*").alias("cnt"))
    cum = _banded_prefix(hist, "slope_micro", "cnt", "sum", "cum_below")
    tot = hist.agg(F.sum("cnt").alias("n"))
    idx = F.expr("(n + 1) div 2")
    return (
        cum.join(F.broadcast(tot))
        .where(
            (F.col("cum_below") < idx)
            & (F.col("cum_below") + F.col("cnt") >= idx)
        )
        .select(
            F.col("n").alias("n_pairs"),
            F.col("slope_micro").alias("theil_sen_slope_micro"),
        )
    )
