"""TPC-H query-shape completion (SURVEY.md §2.4).

relational.py carries Q1/Q3/Q5/Q6/Q7/Q13/Q14/Q18/Q19; this module adds
the remaining thirteen shapes — Q2/Q4/Q8/Q9/Q10/Q11/Q12/Q15/Q16/Q17/
Q20/Q21/Q22 — adapted to the synthetic schema (TESTDATA.md), which has
no partsupp table and no l_commitdate / l_receiptdate / l_shipmode /
c_phone columns:

- partsupp-derived quantities (Q2 supply cost, Q11 stock value, Q16
  supplier counts, Q20 availqty) are derived from lineitem, the only
  part×supplier bridge in the schema (unit cost = min sale price,
  value/availqty = shipped totals).
- commit/receipt-date lateness (Q4, Q12, Q21) becomes shipping lag:
  l_shipdate vs o_orderdate + N days.
- Q22's phone country code becomes c_nationkey.

The reference (OTooleMichael/rs-streamloader) executes none of this
itself — its relational surface is the SQL it ships to Redshift
(/root/reference/lib/RedshiftLoader.ts:337-386); these queries are the
native-engine coverage proof for the same surface.

Scale posture (100 TB): dimensions broadcast, fact-fact joins shuffle
on join keys once and reuse that partitioning for the follow-on
aggregate where Catalyst can (Q21's per-order profile), EXISTS/NOT
EXISTS become semi/anti joins or single-pass conditional aggregates —
never per-row re-scans, never driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery)
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT ps.*, s_name, s_acctbal, n_name
      FROM ps JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), best AS (
      SELECT eu.*, p_partkey, p_name,
             MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM eu JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'ECONOMY' AND p_size <= 10
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(unit_cost, 4) AS unit_cost
    FROM best WHERE unit_cost = min_cost
    ORDER BY ROUND(s_acctbal, 2) DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European
    supplier(s) offering it at the region-wide minimum cost — a
    correlated scalar-MIN subquery, decorrelated here into a window
    MIN over the part key (one shuffle; the per-row re-scan a naive
    translation would do never happens). Unit cost is derived from
    lineitem (no partsupp in the synthetic schema). The part filter is
    applied BEFORE the window: p_size/p_type are functions of the
    partition key, so dropping whole partitions early cannot change
    any partition's minimum. The window equality compares unrounded
    doubles — both engines build them with the identical
    division-then-MIN expression tree over the same rows, so the
    comparison is bit-exact cross-engine."""
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region", "part")
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
    best = (
        ps.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey")))
        .filter(F.col("unit_cost") == F.col("min_cost"))
    )
    return (
        best.select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS → semi join with non-equi condition)
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority having at least one
    late line item (EXISTS with a correlated non-equi condition —
    shipped >60 days after order; the schema has no commitdate, so
    lateness is shipping lag). Planned as a LEFT SEMI join on the
    order key with the date comparison as a residual — one shuffle,
    and the semi join stops probing an order at its first match
    instead of materializing the multiplicity."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= _TS("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-10-01 00:00:00"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        ords.join(t["lineitem"], late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional-aggregate ratio over a 7-table join)
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle="""
    WITH hits AS (
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM hits GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of STANDARD-part revenue sold into
    AMERICA, by year. The widest join in the suite (7 tables); the
    only shuffle is lineitem⋈orders on the order key — customer,
    supplier, both nation roles, region, and part all ride one
    broadcast chain over that output, and the share is a single
    conditional-aggregate pass (never two scans for numerator and
    denominator)."""
    t = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region", "part"
    )
    cust_am = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1998-01-01 00:00:00"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_am), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (multi-fact join, expression aggregate)
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle="""
    SELECT supp_nation, o_year,
           ROUND(SUM(FLOOR(profit * 100 + 0.5) / 100.0), 2) AS total_profit
    FROM (
      SELECT n_name AS supp_nation,
             CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS profit
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY supp_nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on widget parts by supplier nation and year.
    Supply cost is proxied as 10% of p_retailprice×quantity (the
    synthetic schema has no partsupp/ps_supplycost). The selective
    part LIKE filter broadcasts and prunes the lineitem side BEFORE
    the lineitem⋈orders shuffle — the one big exchange moves only
    widget rows. Profit terms are penny-ish quantized, so group sums
    land ON the 2dp rounding boundary and summation order (parallel
    vs sequential) or engine ROUND semantics (Spark's exact-decimal
    HALF_UP vs DuckDB's multiply-then-round) flip the last cent —
    both observed at sf0.001/sf0.01. Each term is therefore
    quantized with pure double arithmetic, floor(x*100 + 0.5)/100,
    which is bit-identical in any IEEE-754 engine; the quantized
    group sum then sits ~1e-9 from a cent multiple, far from any
    boundary, and the final 2dp round is stable everywhere."""
    t = _t(spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("supp_nation", "o_year")
        .agg(
            F.round(
                F.sum(F.floor(profit * 100 + 0.5).cast("double") / 100.0), 2
            ).alias("total_profit")
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (join + agg + top-k)
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a
    quarter. Both fact filters (order-date quarter, returnflag) push
    to their scans before the orderkey shuffle; customer+nation
    broadcast; top-20 plans as TakeOrderedAndProject with c_custkey
    as the unique tiebreak."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    cust = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _TS("1996-10-01 00:00:00"))
                & (F.col("o_orderdate") < _TS("1997-01-01 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (HAVING against a global scalar aggregate)
# ---------------------------------------------------------------------------

@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey, SUM(l_extendedprice) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, ROUND(part_value, 2) AS part_value
    FROM val
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_5 shipped value exceeds a
    fraction of the nation-wide total — a HAVING clause against a
    global scalar subquery over the same aggregate. Stock value is
    derived from lineitem (no partsupp). The scalar total is a
    1-row re-aggregate of the per-part values joined back as a
    broadcast nested-loop (cross) join — the base join+aggregate
    runs once, not twice, and nothing is collected to the driver."""
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    n5_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(n5_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_value"))
    )
    total = val.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("part_value", 2).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-lag priority counts (two-way conditional aggregation)
# ---------------------------------------------------------------------------

@register(
    "q12_shipping_lag",
    oracle="""
    SELECT ship_speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 90
                  THEN 'LATE' ELSE 'ONTIME' END AS ship_speed
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY ship_speed
    """,
)
def q12_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape with l_shipmode replaced by a derived
    shipping-lag bucket (LATE = shipped >90 days after ordering):
    urgent-vs-other order counts per bucket, both CASE branches in
    one aggregation pass over the single orderkey shuffle."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "ship_speed",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "LATE"
            ).otherwise("ONTIME"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate view + scalar MAX equality)
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    revenue "view" is computed once and reused for both the MAX
    scalar and the equality filter (broadcast of a 1-row aggregate,
    no second scan). The equality compares 2dp-ROUNDED revenues on
    both engines so parallel-vs-sequential summation order cannot
    flip the match."""
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier-count by part attributes (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) combination, excluding complained-about
    suppliers (proxied as negative account balance; the supplier
    link is lineitem — no partsupp). The NOT IN is a broadcast
    LEFT ANTI join against the tiny excluded set; the distinct
    count is Spark's two-phase partial-distinct aggregate."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG, decorrelated to window)
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH joined AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
    ), with_avg AS (
      SELECT l_extendedprice, l_quantity,
             AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM joined
    )
    SELECT ROUND(COALESCE(SUM(l_extendedprice), 0) / 7.0, 2) AS avg_yearly
    FROM with_avg WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of
    Brand#3/SMALL parts — the classic correlated AVG subquery,
    decorrelated into a window AVG over the part key (the SQL-form
    decorrelation twin is subquery_above_type_avg). The part filter
    runs before the window: the per-part average is over that part's
    own line items, so removing whole partitions is exact. The
    0.2×avg comparison uses unrounded doubles — identical input sets
    and expression trees on both engines."""
    t = _t(spark, sf_dir, "lineitem", "part")
    parts = t["part"].filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    joined = t["lineitem"].join(
        F.broadcast(parts.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    with_avg = joined.withColumn(
        "avg_qty", F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    )
    return with_avg.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias(
            "avg_yearly"
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain over an aggregate)
# ---------------------------------------------------------------------------

@register(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
      HAVING SUM(l_quantity) > 50
    )
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_7', 'NATION_17')
      AND s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in two nations who moved >50 units
    of any red part in 1996 (availqty proxied by shipped quantity —
    no partsupp). The inner aggregate-with-HAVING reduces to a
    supplier-key set that semi-joins the 100-row supplier dim; the
    red-part filter broadcasts and prunes the lineitem scan before
    its only shuffle (the partkey/suppkey group-by)."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name").isin("NATION_7", "NATION_17"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS, rewritten)
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_orders",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp,
             MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      FROM li GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (lateness = shipped >100 days
    after ordering; no receipt/commit dates in the schema). The
    textbook EXISTS + NOT EXISTS double self-join of lineitem is
    rewritten as one per-order profile — distinct-supplier count,
    distinct-late-supplier count, and the (unique when n_late=1)
    late supplier — so lineitem is scanned once and shuffled on the
    order key once; the join output is already partitioned by
    orderkey, letting Catalyst plan the group-by without a second
    exchange. At 100 TB this removes two full self-join shuffles."""
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    li = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")).cast("int"),
        )
    )
    late_supp = F.when(F.col("is_late") == 1, F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late_supp"),
        F.max(late_supp).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(t["supplier"]), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar AVG + anti join)
# ---------------------------------------------------------------------------

@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND c_custkey NOT IN (SELECT o_custkey FROM orders)
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM eligible GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers who never ordered, grouped by
    country code (c_nationkey stands in for the phone prefix). Two
    classic sub-plans: a global scalar AVG broadcast back over the
    same table (one scan feeds both), and NOT IN planned as a LEFT
    ANTI join on the customer key."""
    t = _t(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
