"""Relational operator surface (SURVEY.md §2.4).

The reference (OTooleMichael/rs-streamloader) performs none of these
itself — every relational capability lives in the SQL it emits to
Redshift (/root/reference/lib/RedshiftLoader.ts:337-386). This engine
provides them natively through Catalyst. Each query here doubles as a
coverage proof for one operator category: expressed declaratively with
the DataFrame API so predicate pushdown, column pruning, partial
aggregation, and broadcast-join selection are applied by the
optimizer.

Scale posture (100 TB): no driver-side collects; dimension tables
(region/nation/part/supplier/customer) are broadcast-hinted where they
are the small side; fact-fact joins shuffle on their join keys and
rely on AQE for skew handling. Double-typed aggregates are rounded to
2 decimals on BOTH engine and oracle sides so the value-hash compare
is stable under parallel summation order.
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
# Aggregation (hash agg, partial+final) — TPC-H Q1 style pricing summary
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan group-aggregate with filter pushdown; Catalyst plans
    partial (map-side) + final aggregation automatically."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + agg + top-k — TPC-H Q3 style
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with selective dimension filter;
    the segment-filtered customer side is broadcast-hinted — correct
    while that 1/5 slice fits the executor broadcast budget (true at
    every benchmarked SF); past that, drop the hint and AQE keeps the
    filtered side as the shuffle-hash build side. orders⋈lineitem
    shuffles on orderkey. Top-k plans as TakeOrderedAndProject (no
    full sort)."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Snowflake join chain — TPC-H Q5 style (5-way)
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake chain: fact tables shuffle-join on keys; the
    dimension tables are broadcast-hinted. nation/region are bounded;
    customer/supplier grow O(SF), so those two hints assume the
    benchmark budget — past it, drop them and AQE picks shuffle-hash
    with the dim as build side. Catalyst collapses the broadcast
    chain into one stage over the lineitem scan."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Broadcast equi-join
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand,
           COUNT(*)                      AS n_items,
           ROUND(SUM(l_quantity), 2)     AS total_qty,
           ROUND(AVG(l_extendedprice),2) AS avg_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small-dim with an explicit broadcast hint — at 100 TB the
    part dim stays far under the broadcast threshold per brand rollup,
    so no shuffle of the fact side is needed."""
    t = _t(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Outer / semi / anti joins (the upsert DELETE..WHERE id IN is a semi join —
# reference lib/RedshiftLoader.ts:377-378)
# ---------------------------------------------------------------------------

@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the relational core of the reference's upsert
    DELETE (RedshiftLoader.ts:377-378)."""
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the keep-unmatched half of a pure-Spark upsert
    (SURVEY.md §2 M3 fallback strategy)."""
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Join with disjunctive cross-dimension predicate — TPC-H Q7 style
# ---------------------------------------------------------------------------

@register(
    "q7_nation_pairs",
    oracle="""
    SELECT supp_nation, cust_nation,
           COUNT(*) AS n_items,
           ROUND(SUM(volume), 2) AS total_volume
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation
    """,
)
def q7_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional trade volume between two nations (TPC-H Q7
    shape). The disjunctive cross-dimension predicate — (A→B) OR
    (B→A) — cannot be pushed into either scan as-is, but it IMPLIES
    the single-side conjuncts ``supp_nation ∈ {{A,B}}`` and
    ``cust_nation ∈ {{A,B}}``; Catalyst does not factor disjunctions,
    so both are stated explicitly. Each fact side is then reduced by a
    selective broadcast join (lineitem×qualifying-suppliers,
    orders×qualifying-customers) BEFORE the orders⋈lineitem shuffle —
    the big exchange moves ~2/25ths of the rows instead of all of
    them — and only the residual (A→B)|(B→A) pairing evaluates
    post-join. The qualifying-supplier/customer broadcasts are 2/25
    slices of O(SF) tables: correct at benchmark SFs, to be replaced
    by shuffle-hash (filtered side as build) past the broadcast
    budget."""
    t = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    nations = ("NATION_1", "NATION_2")
    n12 = t["nation"].filter(F.col("n_name").isin(*nations))
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                n12.select(
                    F.col("n_nationkey").alias("n1_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("n1_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(
                n12.select(
                    F.col("n_nationkey").alias("n2_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("n2_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = t["lineitem"].join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    ords = t["orders"].join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    pair = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | (
        (F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0])
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_volume"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution of counts (double aggregation) — TPC-H Q13 style
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (TPC-H Q13 shape):
    two stacked aggregations — the second groups on the first's
    aggregate output, a shape Catalyst plans as two exchanges with the
    second one tiny (cardinality = distinct counts)."""
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# Distinct / count-distinct
# ---------------------------------------------------------------------------

@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under AQE)."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------

@register(
    "agg_rollup",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (CAST(YEAR(o_orderdate) AS INTEGER), o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (year → priority → grand total)."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two low-cardinality dimensions."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions: ranking, frames, lag/lead
# ---------------------------------------------------------------------------

@register(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window; one shuffle on the
    partition key, sorted within partitions (no global sort)."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT) — the
    incremental sum is order-deterministic given the unique tiebreak."""
    t = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag: days between consecutive orders per customer."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# Global sort / top-k
# ---------------------------------------------------------------------------

@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full shuffle sort."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderdate",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations (multi-body loads to one table are an implicit UNION ALL —
# reference lib/RedshiftLoader.ts:194-197)
# ---------------------------------------------------------------------------

@register(
    "set_union_all",
    oracle="""
    SELECT 'customer' AS party_kind, c_name AS name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS party_kind, s_name AS name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name — the Spark analogue of the reference's
    multiple bodies loading into one table."""
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(
        F.lit("customer").alias("party_kind"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    s = t["supplier"].select(
        F.lit("supplier").alias("party_kind"),
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct INTERSECT (nations having both customers and suppliers)."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct EXCEPT (nations with customers but no suppliers)."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math (SURVEY.md §2.4 scalar row)
# ---------------------------------------------------------------------------

@register(
    "scalar_string_date",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority)                          AS priority_uc,
           SUBSTR(o_orderstatus, 1, 1)                     AS status_c,
           CONCAT(o_orderstatus, '-', o_orderpriority)     AS status_pri,
           CAST(LENGTH(o_orderpriority) AS INTEGER)        AS pri_len,
           CAST(YEAR(o_orderdate) AS INTEGER)              AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER)             AS order_month,
           STRFTIME(o_orderdate, '%Y-%m-%d')               AS order_day
    FROM orders
    """,
)
def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row string/date scalar functions — all JVM-side built-ins
    inside whole-stage codegen, no Python in the hot path."""
    t = _t(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("priority_uc"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_pri"),
        F.length("o_orderpriority").alias("pri_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           ABS(l_discount - 0.05)                           AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT)                AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT)     AS price_k
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic — IEEE-754 double ops evaluate bit-identically
    in any engine given the same expression tree, so no rounding is
    needed for the oracle compare."""
    t = _t(spark, sf_dir, "lineitem")
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
    )


# ---------------------------------------------------------------------------
# Semi-structured: JSON extraction (events.props)
# ---------------------------------------------------------------------------

@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column + aggregation."""
    t = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Time bucketing (batch analogue of a tumbling window)
# ---------------------------------------------------------------------------

@register(
    "time_bucket_agg",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM("value"), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour bucket aggregation over the events stream table
    (batch form; the streaming form with watermarks lives in
    rs_streamloader_spark.streaming)."""
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id %% 10 AS user_bucket,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY 1
    """.replace("%%", "%"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values avoid the extra
    distinct-collection job and keep the schema stable at scale)."""
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 / Q14 / Q19 — scan-heavy aggregates over selective predicates
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure predicate-pushdown benchmark — every filter
    (date range, discount band, quantity cap) reaches the parquet
    scan as a pushed filter + row-group min/max prune, and the single
    global aggregate is one partial+final pair with no shuffle of
    data rows (only the per-partition partials)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-05-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregate ratio over a fact×dim join.
    The date filter prunes the lineitem scan BEFORE the join, the
    part side broadcasts (dim ≪ fact), and both CASE branches ride
    one aggregation pass — never two joins or two scans."""
    t = _t(spark, sf_dir, "lineitem", "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-05-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 45)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning BOTH join
    sides (brand/size from part, quantity from lineitem). Catalyst
    CNF-converts the disjunction and pushes the derivable
    single-side conjuncts below the join (p_brand IN (…) prunes the
    broadcast build side; the l_quantity envelope prunes the fact
    scan), leaving only the cross-side residual above the join — the
    classic disjunctive-pushdown test."""
    t = _t(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# GROUPING() / GROUPING_ID provenance over a rollup
# ---------------------------------------------------------------------------


@register(
    "grouping_id_report",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS revenue
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def grouping_id_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP report with GROUPING()/GROUPING_ID provenance — the
    column that tells a BI consumer whether a NULL group key means
    "subtotal row" or "null data" (completes the grouping-sets family
    next to ``agg_rollup``/``agg_cube``, which emit the keys only).
    Spark's ``grouping_id()`` bit order (first rollup column = MSB)
    matches GROUPING(p)·2 + GROUPING(s) exactly.

    Scale posture: one rollup aggregate — Spark expands grouping sets
    map-side and combines partials per set, one shuffle; revenue in
    BIGINT cents until the display division."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        t.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Hierarchy revenue shares (ratio-to-parent over the snowflake)
# ---------------------------------------------------------------------------


@register(
    "revenue_share_hierarchy",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ),
    reg AS (
      SELECT region, rev_c, nation,
             SUM(rev_c) OVER (PARTITION BY region) AS region_c,
             SUM(rev_c) OVER () AS total_c
      FROM nat
    )
    SELECT region, nation,
           ROUND(rev_c / 100.0, 2) AS revenue,
           ROUND(CAST(rev_c AS DOUBLE) / region_c, 6) AS share_of_region,
           ROUND(CAST(region_c AS DOUBLE) / total_c, 6) AS region_share_total
    FROM reg
    """,
)
def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent report over the region→nation hierarchy: each
    nation's revenue, its share of its region, and the region's share
    of the grand total — the drill-down table a BI layer derives from
    one snowflake pass.

    Scale posture: nation/region broadcast (dimension-sized); customer
    grows O(SF), so the orders⋈customer edge is left to AQE (shuffle
    at scale, broadcast only while customer is actually small) —
    force-hinting it would OOM a 100 TB run. Revenue collapses to the
    25-row (region, nation) grid BEFORE the two share windows run over
    it. Money in BIGINT cents; shares are single double ratios at
    6dp."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    nat = (
        t["orders"]
        .join(
            t["customer"],
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey")
        )
        .join(
            F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey")
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("rev_c"))
    )
    w_reg = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(
            F.col("rev_c").cast("double") / F.sum("rev_c").over(w_reg), 6
        ).alias("share_of_region"),
        F.round(
            F.sum("rev_c").over(w_reg).cast("double")
            / F.sum("rev_c").over(w_all),
            6,
        ).alias("region_share_total"),
    )


# ---------------------------------------------------------------------------
# Broadcast non-equi dimension join (literal tier table)
# ---------------------------------------------------------------------------

_PRICE_TIERS = [
    ("T1_under_50k", 0, 5_000_000),
    ("T2_50k_100k", 5_000_000, 10_000_000),
    ("T3_100k_200k", 10_000_000, 20_000_000),
    ("T4_200k_350k", 20_000_000, 35_000_000),
    ("T5_over_350k", 35_000_000, None),
]


def _tiers_values_sql() -> str:
    rows = ", ".join(
        f"('{n}', {lo}, {'NULL' if hi is None else hi})" for n, lo, hi in _PRICE_TIERS
    )
    return f"(VALUES {rows}) AS t(tier, lo, hi)"


@register(
    "price_tier_assignment",
    oracle=f"""
    WITH o AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    j AS (
      SELECT t.tier FROM o
      JOIN {_tiers_values_sql()}
        ON o.cents >= t.lo AND (t.hi IS NULL OR o.cents < t.hi)
    ),
    c AS (SELECT tier, COUNT(*) AS n FROM j GROUP BY tier),
    s AS (SELECT SUM(n) AS tot FROM c)
    SELECT c.tier, c.n,
           ROUND(CAST(c.n AS DOUBLE) / s.tot, 6) AS share
    FROM c CROSS JOIN s
    """,
)
def price_tier_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-dimension assignment via a BROADCAST NON-EQUI join: a
    literal tier table joins on half-open range conditions — the shape
    every rating/pricing/banding dimension takes when the bands live
    in a table (maintainable) rather than a CASE expression
    (hardcoded).

    Scale posture: a range-predicate join has no equi key, so Spark
    plans BroadcastNestedLoopJoin — which is exactly RIGHT here: the
    inner side is 5 rows, so the "nested loop" is 5 comparisons per
    fact row, all codegen, fact side never shuffles. The same
    predicate against a non-broadcastable band table is the interval-
    bucketing rewrite (``join_range``). Tier counts then collapse to
    a 5-row aggregate with a broadcast total."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    tiers = spark.createDataFrame(_PRICE_TIERS, "tier: string, lo: long, hi: long")
    o = t.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    j = o.join(
        F.broadcast(tiers),
        (F.col("cents") >= F.col("lo"))
        & (F.col("hi").isNull() | (F.col("cents") < F.col("hi"))),
    )
    c = j.groupBy("tier").agg(F.count("*").alias("n"))
    # share via a global window over the 5-row aggregate — a
    # crossJoin(total) would re-derive the whole join branch for the
    # 1-row total (two scans instead of one)
    tot = F.sum("n").over(Window.partitionBy())
    return c.select(
        "tier",
        "n",
        F.round(F.col("n").cast("double") / tot, 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Order-insensitive table checksum (replication / migration audit)
# ---------------------------------------------------------------------------


@register(
    "table_checksum_orders",
    oracle="""
    WITH rows_n AS (
      SELECT COALESCE(CAST(o_orderkey AS VARCHAR), CHR(1)) || '|'
             || COALESCE(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), CHR(1))
             || '|' || COALESCE(STRFTIME(o_orderdate, '%Y-%m-%d'), CHR(1))
             || '|' || COALESCE(o_orderstatus, CHR(1))
             || '|' || COALESCE(o_orderpriority, CHR(1)) AS key
      FROM orders
    ),
    h AS (
      SELECT
        (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 1, 1)) - 1) * 16777216
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 2, 1)) - 1) * 1048576
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 3, 1)) - 1) * 65536
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 4, 1)) - 1) * 4096
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 5, 1)) - 1) * 256
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 6, 1)) - 1) * 16
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 7, 1)) - 1) AS hv
      FROM rows_n
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(hv AS HUGEINT)) AS VARCHAR) AS checksum
    FROM h
    """,
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum of the orders table: each
    row canonicalizes (cents, formatted date, exact strings) into a
    key whose md5 prefix folds into an exact integer sum — the
    replication/migration audit that answers "are these two copies
    byte-identical" with one number per side, without sorting or
    moving the data. The 28-bit per-row term keeps any realistic
    table's sum far inside exact integer range.

    Scale posture: the canonical-key hash is row-local codegen; the
    checksum is ONE combinable SUM (exact integer, order-independent
    by construction — this is why the rows fold to integers rather
    than summing doubles). Verifying a 100 TB replica costs one scan
    per side and ships 16 bytes."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    # explicit \x01 sentinel per NULL field — concat_ws would silently
    # SKIP nulls (shortened key: ('F', NULL) collides with (NULL, 'F')
    # and disagrees with the oracle's ||, which nulls the whole key)
    nul = F.lit("\x01")

    def fld(c):
        return F.coalesce(c, nul)

    key = F.concat(
        fld(F.col("o_orderkey").cast("string")),
        F.lit("|"),
        fld(F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string")),
        F.lit("|"),
        fld(F.date_format("o_orderdate", "yyyy-MM-dd")),
        F.lit("|"),
        fld(F.col("o_orderstatus")),
        F.lit("|"),
        fld(F.col("o_orderpriority")),
    )
    hv = F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("decimal(19,0)")
    return t.select(hv.alias("hv")).agg(
        F.count("*").alias("n_rows"),
        F.sum("hv").cast("decimal(38,0)").cast("string").alias("checksum"),
    )


_CKSUM_BUCKETS = 16


@register(
    "table_checksum_buckets",
    oracle=f"""
    WITH rows_n AS (
      SELECT COALESCE(CAST(o_orderkey AS VARCHAR), CHR(1)) || '|'
             || COALESCE(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), CHR(1))
             || '|' || COALESCE(STRFTIME(o_orderdate, '%Y-%m-%d'), CHR(1))
             || '|' || COALESCE(o_orderstatus, CHR(1))
             || '|' || COALESCE(o_orderpriority, CHR(1)) AS key,
             o_orderkey % {_CKSUM_BUCKETS} AS bucket
      FROM orders
    ),
    h AS (
      SELECT bucket,
        (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 1, 1)) - 1) * 16777216
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 2, 1)) - 1) * 1048576
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 3, 1)) - 1) * 65536
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 4, 1)) - 1) * 4096
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 5, 1)) - 1) * 256
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 6, 1)) - 1) * 16
        + (STRPOS('0123456789abcdef', SUBSTR(MD5(key), 7, 1)) - 1) AS hv
      FROM rows_n
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
           CAST(SUM(CAST(hv AS HUGEINT)) AS VARCHAR) AS checksum
    FROM h GROUP BY bucket
    """,
)
def table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket table checksums: ``table_checksum_orders`` split
    into {n} key-hash buckets, so a replica mismatch localizes to the
    divergent bucket(s) and only 1/{n} of the table needs re-sync or
    re-scan — the incremental-diff protocol every large-table
    replication/backfill audit runs instead of one all-or-nothing
    number.

    Scale posture: identical row-local canonical-key hashing, one
    combinable {n}-group SUM instead of a global one — same single
    scan, same shuffle volume ({n} tiny rows). Bucket = key mod {n},
    matching the native sink's bucket layout discipline so a bucketed
    table can be checksummed bucket-by-bucket in place."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    nul = F.lit("\x01")

    def fld(c):
        return F.coalesce(c, nul)

    key = F.concat(
        fld(F.col("o_orderkey").cast("string")),
        F.lit("|"),
        fld(F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string")),
        F.lit("|"),
        fld(F.date_format("o_orderdate", "yyyy-MM-dd")),
        F.lit("|"),
        fld(F.col("o_orderstatus")),
        F.lit("|"),
        fld(F.col("o_orderpriority")),
    )
    hv = F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("decimal(19,0)")
    return (
        t.select((F.col("o_orderkey") % _CKSUM_BUCKETS).alias("bucket"), hv.alias("hv"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("hv").cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each nation key kept
    min(customer-count, supplier-count) times), the bag-semantics
    sibling the DISTINCT variant cannot express. Spark plans this as
    a count-matching aggregate join, not a distinct + join — no row
    explosion, one shuffle per side on the key."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each nation key kept
    customer-count − supplier-count times when positive): the bag
    semantics audit queries need when row multiplicity IS the signal
    (e.g. replica drift counts), completing the set-operator family
    alongside the DISTINCT variants."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "join_null_safe",
    oracle="""
    WITH ek AS (
      SELECT NULLIF(event_type, 'error') AS k, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    dim AS (
      SELECT NULLIF(t, 'error') AS k, lbl FROM (VALUES
        ('click', 'engagement'), ('view', 'engagement'),
        ('purchase', 'revenue'), ('signup', 'growth'),
        ('error', 'ops')
      ) AS v(t, lbl)
    )
    SELECT dim.lbl,
           CAST(SUM(CASE WHEN ek.k IS NOT DISTINCT FROM dim.k
                    THEN ek.n_events ELSE 0 END) AS BIGINT) AS n_null_safe,
           CAST(SUM(CASE WHEN ek.k = dim.k THEN ek.n_events ELSE 0 END) AS BIGINT) AS n_plain_eq
    FROM ek CROSS JOIN dim
    GROUP BY dim.lbl
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join semantics (``<=>`` / IS NOT DISTINCT
    FROM): a nullable key (error events nulled out) joined to a dim
    whose 'ops' row also carries the NULL key — the null-safe count
    matches NULL↔NULL while plain equality drops those rows, shown
    side by side per label. NULL join keys are the classic silent
    row-loss bug in warehouse migrations; this pins the engine's
    null-matching contract.

    Scale posture: the fact side collapses to a per-key aggregate
    before the (broadcast, 5-row) dim comparison; both match counts
    come from ONE pass over the key aggregate. Cross-engine
    determinism: pure integer counts."""
    ev = _t(spark, sf_dir, "events")["events"]
    ek = ev.groupBy(
        F.expr("NULLIF(event_type, 'error')").alias("ek_k")
    ).agg(F.count("*").alias("n_events"))
    dim = ev.sparkSession.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "revenue"),
            ("signup", "growth"),
            ("error", "ops"),
        ],
        "t string, lbl string",
    ).select(F.expr("NULLIF(t, 'error')").alias("dim_k"), "lbl")
    return (
        ek.crossJoin(F.broadcast(dim))
        .groupBy("lbl")
        .agg(
            F.sum(
                F.when(
                    F.col("ek_k").eqNullSafe(F.col("dim_k")), F.col("n_events")
                ).otherwise(0)
            ).alias("n_null_safe"),
            F.sum(
                F.when(F.col("ek_k") == F.col("dim_k"), F.col("n_events")).otherwise(0)
            ).alias("n_plain_eq"),
        )
    )


# ---------------------------------------------------------------------------
# Exact per-group mode with deterministic tiebreak
# ---------------------------------------------------------------------------


@register(
    "mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT o.o_orderpriority AS priority, l.l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT priority, flag, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY priority) AS BIGINT)
               AS total,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY cnt DESC, flag) AS rn
      FROM counts
    )
    SELECT priority, flag AS modal_flag, cnt AS modal_cnt, total,
           CAST(CAST(cnt AS HUGEINT) * 1000000 // total AS BIGINT)
             AS modal_share_ppm
    FROM ranked WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE: the most frequent return flag within each
    order priority, with the (count DESC, value ASC) tiebreak pinned —
    SQL has no deterministic MODE() aggregate (engines break ties
    arbitrarily), so the portable form is count → rank → rn=1, which
    is also the shape that scales (two shuffles, no global sort).

    Scale posture: the fact join shuffles on orderkey (AQE broadcasts
    orders' projected columns when small), the count collapses to
    |groups × modes| rows map-side, and the ranking window runs over
    that bounded frame. Cross-engine determinism: the tiebreak pins
    the winner; counts are exact BIGINTs; the share is a HUGEINT/
    DECIMAL(38) ppm floor division.

    Reference surface: none (novel extension, SURVEY.md §2.4
    aggregation family)."""
    t = _t(spark, sf_dir, "lineitem", "orders")
    counts = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wp = Window.partitionBy("priority")
    ranked = counts.select(
        "priority",
        "flag",
        "cnt",
        F.sum("cnt").over(wp).cast("bigint").alias("total"),
        F.row_number()
        .over(wp.orderBy(F.col("cnt").desc(), "flag"))
        .alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "priority",
        F.col("flag").alias("modal_flag"),
        F.col("cnt").alias("modal_cnt"),
        "total",
        F.expr(
            "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"
        ).alias("modal_share_ppm"),
    )
