"""Model-evaluation and data-audit operators (SURVEY.md §2.5
north-star extensions; no reference analogue — the reference's
relational surface is SQL shipped to Redshift, see
lib/RedshiftLoader.ts:337-393).

The family covers the evaluation side of a training-data platform:
rank-based ROC AUC, score-calibration tables with Brier decomposition,
Benford first-digit fraud/corruption audits, peak-drawdown telemetry
alerts, and skyline (Pareto-frontier) queries.

Cross-engine determinism rules (same as the rest of the catalog):
money in BIGINT cents, rank statistics accumulated in exact integer /
DECIMAL(38,0) arithmetic with the single floating division last,
transcendentals (log10) only as final scored expressions with
identical operand order in both engines, and banded TWO-PASS prefix
sums/maxes in place of any global-sort window over
input-cardinality rows (the ``gini_revenue_concentration`` /
``pareto_customer_share`` pattern, stats.py / mining.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


_PRICE_BAND_CENTS = 1_000_000  # $10k score bands → bounded band count


def _banded_prefix(
    per_key: DataFrame, key: str, agg_col: str, how: str, out: str
) -> DataFrame:
    """Two-pass distributed prefix aggregate over a per-key table
    whose cardinality is input-sized: band the key into bounded
    ``_PRICE_BAND_CENTS`` ranges, window WITHIN a band, and add a
    broadcast per-band offset (the band-level aggregate — bounded
    cardinality — prefix-scans on one tiny partition). ``how`` is
    ``sum`` or ``max``; the exclusive prefix lands in column ``out``.
    """
    banded = per_key.withColumn(
        "band", F.floor(F.col(key) / F.lit(_PRICE_BAND_CENTS)).cast("bigint")
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    agg_fn = F.sum if how == "sum" else F.max
    within = banded.withColumn("_within", agg_fn(agg_col).over(w_in))
    band_tot = banded.groupBy("band").agg(agg_fn(agg_col).alias("_btot"))
    w_b = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = band_tot.withColumn("_offset", agg_fn("_btot").over(w_b)).select(
        "band", "_offset"
    )
    joined = within.join(F.broadcast(offsets), "band")
    if how == "sum":
        expr = F.coalesce(F.col("_offset"), F.lit(0)) + F.coalesce(
            F.col("_within"), F.lit(0)
        )
    else:
        # greatest() skips nulls (null only when both are), which is
        # exactly the semantics an exclusive prefix max needs at the
        # first row of a band / of the whole series.
        expr = F.greatest(F.col("_offset"), F.col("_within"))
    return joined.withColumn(out, expr).drop("band", "_within", "_offset")


# ---------------------------------------------------------------------------
# ROC AUC (rank-based Mann-Whitney, exact tie handling)
# ---------------------------------------------------------------------------


@register(
    "ml_roc_auc",
    oracle="""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT score, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score, pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM g
    ),
    t AS (
      SELECT SUM(CAST(pos AS HUGEINT) * (2 * neg_below + neg)) AS num2,
             SUM(pos) AS npos, SUM(neg) AS nneg
      FROM c
    )
    SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           ROUND(CAST(num2 AS DOUBLE)
                 / CAST(2 * npos * nneg AS DOUBLE), 6) AS auc
    FROM t
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of "order value predicts urgent priority":
    score = o_totalprice in cents, positive = priority 1/2. The
    Mann-Whitney identity with exact tie handling — group rows by
    distinct score, then AUC = Σ_s pos(s)·(neg_below(s) + neg(s)/2)
    / (P·N); the half-credit tie term stays integer by accumulating
    2·numerator.

    Scale posture: the only input-sized stage is the per-score
    aggregate (combinable; one shuffle on the score key). Its prefix
    sum of negatives uses the banded two-pass scan (broadcast band
    offsets; no input-cardinality global window — the oracle's single
    ORDER BY window is the serial formulation of the same quantity).
    Products accumulate in DECIMAL(38,0)/HUGEINT so P·N rank sums
    cannot overflow int64 at real scale; the one floating division is
    last, rounded to 6dp in both engines."""
    t = _t(spark, sf_dir, "orders")["orders"]
    s = t.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").alias("pos"), (F.count("*") - F.sum("y")).alias("neg")
    )
    c = _banded_prefix(g, "score", "neg", "sum", "neg_below")
    agg = c.agg(
        F.sum(
            F.col("pos").cast("decimal(19,0)")
            * (2 * F.col("neg_below") + F.col("neg")).cast("decimal(19,0)")
        ).alias("num2"),
        F.sum("pos").alias("npos"),
        F.sum("neg").alias("nneg"),
    )
    return agg.select(
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        F.round(
            # denominator in double BEFORE multiplying: 2·P·N overflows
            # int64 at ~1e11 orders (the numerator is decimal for the
            # same reason); the double product is exact to 53 bits,
            # and the oracle's HUGEINT path rounds identically at 6dp
            F.col("num2").cast("double")
            / (
                2
                * F.col("npos").cast("double")
                * F.col("nneg").cast("double")
            ),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Calibration table + Brier score over a deterministic pseudo-model
# ---------------------------------------------------------------------------

_CAL_HASH_MULT = 2654435761  # Knuth multiplicative hash (fits int64 here)
_CAL_HASH_MOD = 1_048_576  # 2^20 → p is an exact dyadic rational


@register(
    "ml_calibration_brier",
    oracle=f"""
    WITH s AS (
      SELECT ((o_orderkey % {_CAL_HASH_MOD}) * {_CAL_HASH_MULT})
               % {_CAL_HASH_MOD} AS h,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    p AS (
      SELECT CAST(h AS DOUBLE) / {_CAL_HASH_MOD} AS p, y FROM s
    )
    SELECT CAST(FLOOR(p * 10) AS INT) AS bin,
           COUNT(*) AS n,
           ROUND(AVG(p), 6) AS mean_pred,
           ROUND(AVG(CAST(y AS DOUBLE)), 6) AS pos_rate,
           ROUND(AVG((p - y) * (p - y)), 6) AS brier
    FROM p
    GROUP BY bin
    """,
)
def ml_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration-by-decile table + per-bin Brier score for a
    deterministic pseudo-model: p = Knuth-hash(o_orderkey) / 2^20 (an
    exact dyadic rational — bit-identical in both engines), outcome =
    urgent/high priority. Each bin reports mean predicted probability
    vs empirical positive rate (the reliability diagram's points) and
    the mean squared error contribution.

    Scale posture: single combinable aggregate keyed by 10 bins —
    map-side partials reduce everything before one constant-width
    shuffle. The key is reduced mod 2^20 BEFORE the multiply —
    congruence-equivalent ((k mod m)·c mod m = k·c mod m), but the
    raw product overflows int64 for keys above ~3.5e9 (TPC-H sf≳600:
    silent wrap in Spark, range error in DuckDB) while the masked
    product caps at 2^20·c < 2^62. p and (p−y)² are exact-dyadic
    doubles averaged identically in both engines, rounded at 6dp."""
    t = _t(spark, sf_dir, "orders")["orders"]
    p = t.select(
        (
            ((F.col("o_orderkey") % _CAL_HASH_MOD) * _CAL_HASH_MULT)
            % _CAL_HASH_MOD
        ).cast("double").alias("h"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    ).select((F.col("h") / _CAL_HASH_MOD).alias("p"), "y")
    return (
        p.groupBy(F.floor(F.col("p") * 10).cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_pred"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("pos_rate"),
            F.round(
                F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 6
            ).alias("brier"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


@register(
    "benford_first_digit",
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(LEFT(CAST(cents AS VARCHAR), 1) AS INT) AS digit FROM c
    ),
    o AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM o)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND(
             POW(n - total * LOG10(1.0 + 1.0 / digit), 2)
             / (total * LOG10(1.0 + 1.0 / digit)), 4) AS chi2_term
    FROM o CROSS JOIN t
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the standard screen for fabricated or corrupted monetary columns.
    The digit is taken from the decimal string of the BIGINT cents
    value (no floating log in the bucketing path), then each digit's
    observed share is compared against log10(1+1/d) with a chi-square
    contribution term.

    Scale posture: one combinable aggregate keyed by 9 digits; the
    1-row total broadcasts back over the 9-row result. log10/pow
    appear only in the final scored expressions, with identical
    operand order in both engines (documented transcendental caveat,
    same policy as bm25_topk); shares round at 6dp, chi² at 4dp."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = (
        t.where(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    o = cents.groupBy(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit")
    ).agg(F.count("*").alias("n"))
    total = o.agg(F.sum("n").alias("total"))
    bshare = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        o.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "obs_share"
            ),
            F.round(bshare, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n") - F.col("total") * bshare, F.lit(2))
                / (F.col("total") * bshare),
                4,
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Max drawdown of the daily-revenue series
# ---------------------------------------------------------------------------


@register(
    "max_drawdown_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    run AS (
      SELECT d, rev,
             MAX(rev) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS trough_day,
           ROUND(peak / 100.0, 2) AS peak_revenue,
           ROUND(rev / 100.0, 2) AS trough_revenue,
           ROUND((peak - rev) / 100.0, 2) AS max_drawdown
    FROM run
    ORDER BY peak - rev DESC, d ASC
    LIMIT 1
    """,
)
def max_drawdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest peak-to-trough drop of the daily-revenue series — the
    telemetry alert "how far below its historical peak did daily
    revenue ever fall, and when". Running peak via an ordered window,
    drawdown = peak − value, answer = argmax (earliest day breaking
    ties).

    Scale posture: the raw scan reduces FIRST to one combinable row
    per calendar day (bounded: ~2.4k rows over the TPC-H date range,
    and calendar-bounded at any data scale), so the ordered running-
    max window and the top-1 sort both run over the tiny aggregate —
    the same bounded-global-window policy as
    ``events_hourly_seasonality``. Money stays in BIGINT cents until
    the final /100 display division."""
    t = _t(spark, sf_dir, "orders")["orders"]
    daily = t.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.withColumn("peak", F.max("rev").over(w))
    return (
        run.orderBy((F.col("peak") - F.col("rev")).desc(), F.col("d").asc())
        .limit(1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("trough_day"),
            F.round(F.col("peak") / 100.0, 2).alias("peak_revenue"),
            F.round(F.col("rev") / 100.0, 2).alias("trough_revenue"),
            F.round((F.col("peak") - F.col("rev")) / 100.0, 2).alias(
                "max_drawdown"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (price ↑, recency ↑)
# ---------------------------------------------------------------------------


@register(
    "skyline_price_recency",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    g AS (SELECT cents, MAX(d) AS gd FROM o GROUP BY cents),
    p AS (
      SELECT cents, gd,
             MAX(gd) OVER (ORDER BY cents DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_above
      FROM g
    )
    SELECT o.o_orderkey,
           ROUND(o.cents / 100.0, 2) AS price,
           STRFTIME(o.d, '%Y-%m-%d') AS order_date
    FROM o JOIN p ON o.cents = p.cents
    WHERE o.d = p.gd AND (p.best_above IS NULL OR o.d > p.best_above)
    """,
)
def skyline_price_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: orders not dominated on
    (totalprice ↑, orderdate ↑) — no other order is at least as
    expensive AND at least as recent with one strict. The classic
    sort-scan formulation: group by price, keep rows matching their
    price group's max date whose date strictly beats the running max
    date over all strictly-higher prices.

    Scale posture: the per-price max-date table is a combinable
    aggregate (one shuffle on the price key); its descending prefix
    max uses the banded two-pass scan with broadcast band offsets —
    the oracle's single ORDER BY DESC window is the serial
    formulation of the same running max. The frontier filter is one
    equi-join back on the price key (co-partitioned with the
    aggregate's shuffle). No O(n²) dominance join anywhere."""
    t = _t(spark, sf_dir, "orders")["orders"]
    o = t.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    return skyline_rows(o).select(
        F.col("id").alias("o_orderkey"),
        F.round(F.col("cents") / 100.0, 2).alias("price"),
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
    )


def skyline_rows(o: DataFrame) -> DataFrame:
    """Skyline core (see ``skyline_price_recency``): rows of
    (id, cents, d) not dominated on (cents ↑, d ↑). Property-tested
    against the brute-force dominance model in
    tests/test_properties.py."""
    g = o.groupBy("cents").agg(F.max("d").alias("gd"))
    # descending prefix max == ascending prefix max over negated key
    g_neg = g.withColumn("nkey", -F.col("cents"))
    p = _banded_prefix(g_neg, "nkey", "gd", "max", "best_above").drop("nkey")
    return (
        o.join(p, "cents")
        .where(
            (F.col("d") == F.col("gd"))
            & (F.col("best_above").isNull() | (F.col("d") > F.col("best_above")))
        )
        .select("id", "cents", "d")
    )


# ---------------------------------------------------------------------------
# Smoothed target encoding (m-estimate) per segment
# ---------------------------------------------------------------------------

_TENC_M = 100


@register(
    "target_encode_segments",
    oracle=f"""
    WITH seg AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c
      FROM customer GROUP BY c_mktsegment
    ),
    g AS (SELECT SUM(n) AS tot_n, SUM(sum_c) AS tot_c FROM seg)
    SELECT seg.c_mktsegment, seg.n,
           ROUND(CAST(seg.sum_c AS DOUBLE) / seg.n / 100.0, 4) AS raw_mean,
           ROUND((seg.sum_c + {_TENC_M} * (CAST(g.tot_c AS DOUBLE) / g.tot_n))
                 / (seg.n + {_TENC_M}) / 100.0, 4) AS encoded
    FROM seg CROSS JOIN g
    """,
)
def target_encode_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed (m-estimate) target encoding of the market segment
    against account balance: enc = (Σy + m·prior)/(n + m) with the
    global mean as prior — the leakage-safe categorical encoding a
    feature pipeline materializes before training, shrunk toward the
    prior for thin categories.

    Scale posture: per-category sums collapse in one combinable
    aggregate (BIGINT cents); the global prior is a 1-row broadcast.
    The encode is a single double expression with identical operand
    order in both engines, rounded at 4dp."""
    t = _t(spark, sf_dir, "customer")["customer"]
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    seg = t.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.sum(cents).alias("sum_c")
    )
    g = seg.agg(F.sum("n").alias("tot_n"), F.sum("sum_c").alias("tot_c"))
    prior = F.col("tot_c").cast("double") / F.col("tot_n")
    return seg.crossJoin(F.broadcast(g)).select(
        "c_mktsegment",
        "n",
        F.round(F.col("sum_c").cast("double") / F.col("n") / 100.0, 4).alias(
            "raw_mean"
        ),
        F.round(
            (F.col("sum_c") + _TENC_M * prior) / (F.col("n") + _TENC_M) / 100.0,
            4,
        ).alias("encoded"),
    )


# ---------------------------------------------------------------------------
# Hashed feature-cross collision audit
# ---------------------------------------------------------------------------

_CROSS_BUCKETS = 64


@register(
    "hashed_feature_cross",
    oracle=f"""
    WITH x AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             ((STRPOS('0123456789abcdef',
                      SUBSTR(MD5(CAST(c_nationkey AS VARCHAR) || 'x'
                                 || c_mktsegment), 1, 1)) - 1) * 16
              + (STRPOS('0123456789abcdef',
                        SUBSTR(MD5(CAST(c_nationkey AS VARCHAR) || 'x'
                                   || c_mktsegment), 2, 1)) - 1))
               % {_CROSS_BUCKETS} AS bucket
      FROM customer
    )
    SELECT bucket,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT CAST(c_nationkey AS VARCHAR) || 'x' || c_mktsegment)
             AS n_crosses,
           CASE WHEN COUNT(DISTINCT CAST(c_nationkey AS VARCHAR) || 'x'
                           || c_mktsegment) > 1
                THEN 1 ELSE 0 END AS collided
    FROM x
    GROUP BY bucket
    """,
)
def hashed_feature_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing audit for the nation×segment cross: bucket the
    cross into {b} hash slots (the hashing-trick embedding a trainer
    would consume) and report, per slot, the row mass and how many
    DISTINCT crosses collided into it — the measurement that decides
    whether {b} buckets is too small before a model silently merges
    features.

    Scale posture: the md5 bucket is row-local codegen; one combinable
    aggregate on the bucket key ({b} groups) carries both the row
    count and the distinct-cross count. Same seeded-md5-mod idiom as
    the sketch family, identical in both engines."""
    t = _t(spark, sf_dir, "customer")["customer"]
    cross = F.concat(
        F.col("c_nationkey").cast("string"), F.lit("x"), F.col("c_mktsegment")
    )
    bucket = (
        F.conv(F.substring(F.md5(cross), 1, 2), 16, 10).cast("int")
        % _CROSS_BUCKETS
    )
    x = t.select(cross.alias("cross"), bucket.alias("bucket"))
    return x.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("cross").alias("n_crosses"),
        F.when(F.countDistinct("cross") > 1, 1).otherwise(0).alias("collided"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule battery (per-rule failure report)
# ---------------------------------------------------------------------------

from rs_streamloader_spark.functions.text_functions import (
    GOPHER_STOPWORDS as _GOPHER_STOPWORDS,
)


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_words,
             SUM(LENGTH(tok)) AS n_chars,
             COUNT(DISTINCT tok) AS n_types,
             MAX(cnt_per_tok) AS top_tok_cnt,
             SUM(CASE WHEN tok IN {_GOPHER_STOPWORDS} THEN 1 ELSE 0 END)
               AS n_stop
      FROM (
        SELECT doc_id, tok,
               COUNT(*) OVER (PARTITION BY doc_id, tok) AS cnt_per_tok
        FROM toks
      )
      GROUP BY doc_id
    ),
    flags AS (
      SELECT doc_id,
             CASE WHEN n_words < 10 OR n_words > 1000 THEN 1 ELSE 0 END
               AS word_count_out_of_range,
             CASE WHEN n_chars * 10 < n_words * 30
                    OR n_chars * 10 > n_words * 100 THEN 1 ELSE 0 END
               AS mean_word_length_out_of_range,
             CASE WHEN n_types * 5 < n_words THEN 1 ELSE 0 END
               AS low_type_token_ratio,
             CASE WHEN top_tok_cnt * 5 > n_words THEN 1 ELSE 0 END
               AS top_token_dominance,
             CASE WHEN n_stop = 0 THEN 1 ELSE 0 END
               AS no_stopwords
      FROM per_doc
    ),
    unp AS (
      SELECT 'word_count_out_of_range' AS rule,
             CAST(SUM(word_count_out_of_range) AS BIGINT) AS n_failed, COUNT(*) AS n_docs
      FROM flags
      UNION ALL
      SELECT 'mean_word_length_out_of_range',
             SUM(mean_word_length_out_of_range), COUNT(*) FROM flags
      UNION ALL
      SELECT 'low_type_token_ratio',
             SUM(low_type_token_ratio), COUNT(*) FROM flags
      UNION ALL
      SELECT 'top_token_dominance',
             SUM(top_token_dominance), COUNT(*) FROM flags
      UNION ALL
      SELECT 'no_stopwords', SUM(no_stopwords), COUNT(*) FROM flags
    )
    SELECT rule, CAST(n_failed AS BIGINT) AS n_failed,
           CAST(CAST(n_failed AS HUGEINT) * 1000000 // n_docs AS BIGINT)
             AS fail_ppm
    FROM unp
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery as a per-rule failure report:
    word-count bounds, mean-word-length bounds, type/token ratio,
    top-token dominance, and stopword presence — the rule-level
    breakdown a corpus curator reads to decide WHICH filter is
    removing documents (``text_quality_score`` gives the combined
    verdict; this gives the diagnosis).

    Scale posture: one explode over documents feeding one per-doc
    aggregate (the per-token count rides a (doc, tok)-partitioned
    window with basket-bounded fanout); rule flags are codegen CASE
    expressions; the final report is a 5-row unpivot of one
    map-side-combinable rollup. Cross-engine determinism: every rule
    threshold is integer cross-multiplication (n_chars·10 < n_words·30
    instead of mean < 3.0) — no float division anywhere."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    wtok = Window.partitionBy("doc_id", "tok")
    per_doc = (
        toks.withColumn("cnt_per_tok", F.count("*").over(wtok))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("tok")).alias("n_chars"),
            F.countDistinct("tok").alias("n_types"),
            F.max("cnt_per_tok").alias("top_tok_cnt"),
            F.sum(
                F.when(F.col("tok").isin(*_GOPHER_STOPWORDS), 1).otherwise(0)
            ).alias("n_stop"),
        )
    )
    flags = per_doc.select(
        F.when((F.col("n_words") < 10) | (F.col("n_words") > 1000), 1)
        .otherwise(0)
        .alias("word_count_out_of_range"),
        F.when(
            (F.col("n_chars") * 10 < F.col("n_words") * 30)
            | (F.col("n_chars") * 10 > F.col("n_words") * 100),
            1,
        )
        .otherwise(0)
        .alias("mean_word_length_out_of_range"),
        F.when(F.col("n_types") * 5 < F.col("n_words"), 1)
        .otherwise(0)
        .alias("low_type_token_ratio"),
        F.when(F.col("top_tok_cnt") * 5 > F.col("n_words"), 1)
        .otherwise(0)
        .alias("top_token_dominance"),
        F.when(F.col("n_stop") == 0, 1).otherwise(0).alias("no_stopwords"),
    )
    rollup = flags.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(c).alias(c)
            for c in (
                "word_count_out_of_range",
                "mean_word_length_out_of_range",
                "low_type_token_ratio",
                "top_token_dominance",
                "no_stopwords",
            )
        ],
    )
    unp = rollup.selectExpr(
        "stack(5, "
        "'word_count_out_of_range', word_count_out_of_range, "
        "'mean_word_length_out_of_range', mean_word_length_out_of_range, "
        "'low_type_token_ratio', low_type_token_ratio, "
        "'top_token_dominance', top_token_dominance, "
        "'no_stopwords', no_stopwords) AS (rule, n_failed)",
        "n_docs",
    )
    return unp.select(
        "rule",
        "n_failed",
        F.expr(
            "CAST(CAST(n_failed AS DECIMAL(38,0)) * 1000000 div n_docs AS BIGINT)"
        ).alias("fail_ppm"),
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) inventory classification of parts by revenue
# ---------------------------------------------------------------------------


@register(
    "abc_classification_parts",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY 1
    ),
    hist AS (
      SELECT rev_c, SUM(rev_c) AS grp_rev FROM pr GROUP BY rev_c
    ),
    cum AS (
      SELECT rev_c,
             SUM(grp_rev) OVER (ORDER BY rev_c
                                ROWS UNBOUNDED PRECEDING) - grp_rev
               AS cum_below
      FROM hist
    ),
    tot AS (SELECT SUM(rev_c) AS total FROM pr)
    SELECT p.l_partkey, CAST(p.rev_c AS BIGINT) AS rev_c,
           CASE WHEN (t.total - c.cum_below) * 5 <= t.total * 4 THEN 'A'
                WHEN (t.total - c.cum_below) * 20 <= t.total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM pr p JOIN cum c ON c.rev_c = p.rev_c CROSS JOIN tot t
    """,
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of every part by revenue: parts in
    the top 80% of cumulative revenue (accumulated from the largest)
    are class A, the next 15% B, the tail C — the inventory-priority
    banding behind stocking and curation decisions, emitted PER ITEM
    (``pareto_customer_share`` reports the thresholds; this labels the
    catalog).

    Scale posture: per-part revenue is a combinable aggregate; the
    descending cumulative comes from the banded TWO-PASS prefix over
    the (distinct revenue value) HISTOGRAM — never a global-sort
    window over parts — and the classification joins parts back on
    the revenue value with the 1-row total broadcast. Revenue ties
    share a histogram cell, so tied parts get the same class
    deterministically. Cross-engine determinism: all thresholds are
    integer cross-multiplications of BIGINT cents."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("rev_c")
    )
    hist = pr.groupBy("rev_c").agg(F.sum("rev_c").alias("grp_rev"))
    # _banded_prefix's "sum" path is never NULL (both prefix terms
    # coalesce to 0 inside the helper)
    cum = _banded_prefix(hist, "rev_c", "grp_rev", "sum", "cum_below").select(
        "rev_c", "cum_below"
    )
    tot = pr.agg(F.sum("rev_c").alias("total"))
    above = F.col("total") - F.col("cum_below")
    return (
        pr.join(cum, "rev_c")
        .join(F.broadcast(tot))
        .select(
            "l_partkey",
            "rev_c",
            F.when(above * 5 <= F.col("total") * 4, "A")
            .when(above * 20 <= F.col("total") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )

# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) audit of the dataset split
# ---------------------------------------------------------------------------

from rs_streamloader_spark.operators.analytic import split_case_sql, split_col

# chi-square 0.95 critical value, df=2, in exact micro-units
_SRM_CRIT_MICRO = 5_991_465

def _srm_exp_pct_sql(col: str) -> str:
    """Expected split percentages (80/10/10) as a CASE over ``col`` —
    the single source for both the oracle SQL and the Spark twin."""
    return f"CASE {col} WHEN 'train' THEN 80 WHEN 'val' THEN 10 ELSE 10 END"


@register(
    "ab_srm_check",
    oracle=f"""
    WITH sp AS (
      SELECT {split_case_sql("doc_id")} AS split FROM documents
    ),
    counted AS (
      SELECT split, COUNT(*) AS o FROM sp GROUP BY split
    ),
    obs AS (
      -- densify: a split with ZERO observed docs must still contribute
      -- its full expected-count term (that is when SRM is worst)
      SELECT g.split, COALESCE(c.o, 0) AS o,
             {_srm_exp_pct_sql("g.split")} AS exp_pct
      FROM (VALUES ('train'), ('val'), ('test')) AS g(split)
      LEFT JOIN counted c ON c.split = g.split
    ),
    tot AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT obs.split, obs.o, obs.exp_pct,
             CAST(CAST(100 * obs.o - obs.exp_pct * t.n AS HUGEINT)
                  * (100 * obs.o - obs.exp_pct * t.n) * 1000000
                  // (CAST(100 AS HUGEINT) * obs.exp_pct * t.n)
               AS BIGINT) AS chi2_micro
      FROM obs CROSS JOIN tot t
    )
    SELECT split, o AS observed, CAST(exp_pct AS INT) AS exp_pct, chi2_micro,
           SUM(chi2_micro) OVER () > {_SRM_CRIT_MICRO} AS srm_detected
    FROM terms
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit of the 80/10/10 hash split: the χ²
    statistic of observed split counts against their expected ratios,
    with the df=2 0.95 critical-value verdict — the first sanity gate
    every experimentation platform runs before reading a test (an SRM
    means the assignment itself is broken; results are void).

    Scale posture: assignment is the shared stateless split
    expression; everything reduces to a 3-row observed table plus a
    1-row total (the verdict window runs over those 3 rows).
    Cross-engine determinism: each χ² term is kept as an exact
    rational ((100·o − pct·n)² · 1e6) / (100·pct·n) in
    HUGEINT/DECIMAL(38) floor-division; the verdict compares the
    exact micro-unit sum to the critical value as integers."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    exp_pct = F.expr(_srm_exp_pct_sql("split"))
    counted = (
        docs.select(split_col(F.col("doc_id")).alias("split"))
        .groupBy("split")
        .agg(F.count("*").alias("o"))
    )
    # densify: zero-count splits still carry their expected-count term
    grid = docs.sparkSession.createDataFrame(
        [("train",), ("val",), ("test",)], "split string"
    )
    obs = (
        grid.join(F.broadcast(counted), "split", "left")
        .select("split", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
        .withColumn("exp_pct", exp_pct)
    )
    tot = obs.agg(F.sum("o").alias("n"))
    terms = obs.join(F.broadcast(tot)).select(
        "split",
        "o",
        "exp_pct",
        F.expr(
            "CAST(CAST(100 * o - exp_pct * n AS DECIMAL(38,0))"
            " * (100 * o - exp_pct * n) * 1000000"
            " div (CAST(100 AS DECIMAL(38,0)) * exp_pct * n) AS BIGINT)"
        ).alias("chi2_micro"),
    )
    return terms.select(
        "split",
        F.col("o").alias("observed"),
        F.col("exp_pct").cast("int").alias("exp_pct"),
        "chi2_micro",
        (
            F.sum("chi2_micro").over(Window.partitionBy())
            > _SRM_CRIT_MICRO
        ).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture weights (multilingual sampling standard)
# ---------------------------------------------------------------------------

_MIX_TAU = 0.7  # the mBERT/XLM-R exponent


@register(
    "temperature_mix_weights",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      -- each pow term rounds to integer NANO-units before the sum
      -- (exact integer adds in any order — the source_token_entropy
      -- transcendental-sum policy)
      SELECT SUM(n_tokens) AS total,
             SUM(CAST(ROUND(POWER(n_tokens, {_MIX_TAU}) * 1000000000)
                      AS HUGEINT)) AS ztemp_nano
      FROM src
    )
    SELECT s.source, s.n_tokens,
           CAST(CAST(s.n_tokens AS HUGEINT) * 1000000 // t.total AS BIGINT)
             AS raw_ppm,
           CAST(ROUND(CAST(ROUND(POWER(s.n_tokens, {_MIX_TAU}) * 1000000000)
                           AS BIGINT)
                      / CAST(t.ztemp_nano AS DOUBLE) * 1000000)
                AS BIGINT) AS temp_ppm
    FROM src s CROSS JOIN tot t
    """,
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source (w_s ∝
    tokens_s^τ, τ = 0.7) next to the raw proportional share — the
    multilingual/multi-domain mixing rule (mBERT, XLM-R, Gopher) that
    up-samples small sources so they are seen at all; the table a
    mixing planner feeds the sampler (``domain_mix_sample`` applies a
    target mix; this DERIVES one).

    Scale posture: one combinable per-source token aggregate (bounded
    source set) plus a broadcast 1-row normalizer. Cross-engine
    determinism: token counts are exact integers; raw share is exact
    HUGEINT floor-division PPM; the τ-power is ONE transcendental per
    source evaluated on an exact integer with identical operand order
    both engines (the ctr_wilson single-expression policy), each term
    rounds to integer NANO-units before the z-sum (exact integer adds
    in any order — the source_token_entropy policy), and the
    normalized share rounds once to integer PPM."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("n_tokens")
    )
    pw_nano = F.round(
        F.pow(F.col("n_tokens").cast("double"), _MIX_TAU) * 1_000_000_000
    ).cast("decimal(38,0)")
    tot = src.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(pw_nano).alias("ztemp_nano"),
    )
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(
            "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"
        ).alias("raw_ppm"),
        F.round(
            pw_nano.cast("double")
            / F.col("ztemp_nano").cast("double")
            * 1_000_000
        )
        .cast("bigint")
        .alias("temp_ppm"),
    )


# ---------------------------------------------------------------------------
# Rate-based language rebalancing (map-only hash-threshold sampler)
# ---------------------------------------------------------------------------

_BAL_HEX = 7  # md5 hex digits -> uniform integer in [0, 16^7)
_BAL_SCALE = 16 ** _BAL_HEX  # 268_435_456


def _bal_hash_sql(key: str) -> str:
    """DuckDB: integer in [0, 16^7) from the first 7 md5 hex digits of
    the salted key — STRPOS digit walk mirroring Spark's
    conv(substring(md5, 1, 7), 16, 10)."""
    h = f"MD5('bal|' || CAST({key} AS VARCHAR))"
    digits = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (_BAL_HEX - 1 - i)}"
        for i in range(_BAL_HEX)
    )
    return f"({digits})"


@register(
    "lang_rebalance_sample",
    oracle=f"""
    WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    mn AS (SELECT MIN(n) AS m FROM cnt),
    th AS (
      SELECT lang,
             CAST(CAST(m AS HUGEINT) * {_BAL_SCALE} // n AS BIGINT) AS thresh
      FROM cnt, mn
    )
    SELECT d.lang, d.doc_id, d.n_chars
    FROM documents d JOIN th ON th.lang = d.lang
    WHERE {_bal_hash_sql('d.doc_id')} < th.thresh
    """,
)
def lang_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based language rebalancing: downsample every language to
    the minority language's EXPECTED count via a per-lang acceptance
    threshold over a deterministic md5 hash of doc_id — the standard
    class-rebalancing step of a multilingual training-data pipeline
    (no reference analogue; the reference has no relational surface).

    Contrast with ``sample_stratified`` (fixed k per group via a
    per-group ROW_NUMBER window — an O(n log n) sort per stratum):
    this is the shape that survives 100 TB. The per-lang thresholds
    come from a map-side-combinable count aggregate (rows = #langs),
    broadcast back onto the corpus scan, and acceptance is a MAP-ONLY
    filter — no window, no per-group sort, one corpus-wide shuffle
    total (the count agg). The sample is stable under repartitioning
    and incremental ingest: membership depends only on (doc_id, lang
    rates), not on row order or partition layout.

    Cross-engine determinism: acceptance integer = first 7 md5 hex
    digits (conv here, STRPOS walk in the oracle); thresholds are
    exact integer floor-division with the count product accumulated in
    DECIMAL(38,0)/HUGEINT (a 16^7 scale times a 100 TB-scale count
    overflows int64); strict `<` on both sides. The minority language
    gets thresh == 16^7 exactly (kept whole)."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # min over the #langs-row aggregate as a global window (NOT a
    # second corpus scan — the domain_mix_sample precedent)
    th = cnt.withColumn(
        "m", F.min("n").over(Window.partitionBy())
    ).select(
        "lang",
        F.expr(
            f"CAST(CAST(m AS DECIMAL(38,0)) * {_BAL_SCALE} div n AS BIGINT)"
        ).alias("thresh"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bal|"), F.col("doc_id").cast("string"))),
            1,
            _BAL_HEX,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.join(F.broadcast(th), "lang")
        .filter(h < F.col("thresh"))
        .select("lang", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Average precision (area under the precision-recall curve), exact ties
# ---------------------------------------------------------------------------


@register(
    "pr_auc_average_precision",
    oracle="""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score, pos, neg,
             SUM(pos) OVER (ORDER BY score DESC
                            ROWS UNBOUNDED PRECEDING) AS cum_p,
             SUM(pos + neg) OVER (ORDER BY score DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum_t
      FROM g
    ),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS npos,
                   CAST(SUM(neg) AS BIGINT) AS nneg FROM g)
    SELECT t.npos AS n_pos, t.nneg AS n_neg,
           CAST(SUM(CASE WHEN c.pos > 0 THEN
             CAST(ROUND(CAST(c.pos * c.cum_p AS DOUBLE) * 1000000000
                        / CAST(t.npos * c.cum_t AS DOUBLE)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS avg_precision_nano,
           CAST(CAST(t.npos AS HUGEINT) * 1000000 // (t.npos + t.nneg)
                AS BIGINT) AS prevalence_ppm
    FROM c CROSS JOIN tot t
    GROUP BY t.npos, t.nneg
    """,
)
def pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated area under the
    precision-recall curve, the sklearn ``average_precision_score``
    definition) for "order value predicts urgent priority" — the
    imbalanced-classes companion to ``ml_roc_auc``: ROC AUC stays
    rosy when positives are rare, AP collapses toward the prevalence
    baseline (reported alongside). Ties handled at distinct-score
    granularity: AP = Σ_s (pos_s/P)·(cum_p_s/cum_t_s) over score
    groups in descending order, each term nano-rounded BEFORE the sum
    (the transcendental-sum policy applied to rationals whose exact
    integers exceed 53-bit doubles).

    Scale posture: one per-score aggregate (combinable), the
    descending prefix via the banded two-pass scan (no input-sized
    global window on the Spark side; the oracle's single window is
    the serial formulation), and a 1-row reduction. Cross-engine
    determinism: counts exact; each term's double division has pinned
    operand order; prevalence is a HUGEINT ppm floor division.

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = _t(spark, sf_dir, "orders")["orders"]
    s = t.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("score"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
    )
    gd = g.withColumn("nscore", -F.col("score")).withColumn(
        "tot_g", F.col("pos") + F.col("neg")
    )
    c1 = _banded_prefix(gd, "nscore", "pos", "sum", "p_before")
    c2 = _banded_prefix(c1, "nscore", "tot_g", "sum", "t_before")
    c = c2.select(
        "pos",
        "neg",
        (F.coalesce("p_before", F.lit(0)) + F.col("pos")).alias("cum_p"),
        (F.coalesce("t_before", F.lit(0)) + F.col("tot_g")).alias("cum_t"),
    )
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("npos"),
        F.sum("neg").cast("bigint").alias("nneg"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("npos", "nneg")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN pos > 0 THEN"
                " CAST(ROUND(CAST(pos * cum_p AS DOUBLE) * 1000000000"
                " / CAST(npos * cum_t AS DOUBLE)) AS BIGINT)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("avg_precision_nano"),
        )
        .select(
            F.col("npos").alias("n_pos"),
            F.col("nneg").alias("n_neg"),
            "avg_precision_nano",
            F.expr(
                "CAST(CAST(npos AS DECIMAL(38,0)) * 1000000"
                " div (npos + nneg) AS BIGINT)"
            ).alias("prevalence_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Gains/lift table at decile cutoffs (tie-safe thresholds)
# ---------------------------------------------------------------------------

_LIFT_DECILES = 10


@register(
    "lift_gain_table",
    oracle=f"""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score,
             SUM(pos) OVER (ORDER BY score DESC
                            ROWS UNBOUNDED PRECEDING) AS cum_pos,
             SUM(cnt) OVER (ORDER BY score DESC
                            ROWS UNBOUNDED PRECEDING) AS cum_rows
      FROM g
    ),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS npos,
                   CAST(SUM(cnt) AS BIGINT) AS n FROM g),
    grid AS (SELECT UNNEST(RANGE(1, {_LIFT_DECILES + 1})) AS d),
    hit AS (
      SELECT d, score, cum_pos, cum_rows, npos, n,
             ROW_NUMBER() OVER (PARTITION BY d
                                ORDER BY cum_rows DESC) AS rn
      FROM grid JOIN c ON c.cum_rows <= (SELECT n FROM tot) * d
                                         // {_LIFT_DECILES}
      CROSS JOIN tot
    )
    SELECT CAST(d AS BIGINT) AS decile, score AS threshold_score,
           CAST(cum_rows AS BIGINT) AS n_selected,
           CAST(cum_pos AS BIGINT) AS n_pos_selected,
           CAST(CAST(cum_pos AS HUGEINT) * 1000000 // cum_rows AS BIGINT)
             AS precision_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * 1000000 // npos AS BIGINT)
             AS recall_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * n * 1000000
                // (CAST(cum_rows AS HUGEINT) * npos) AS BIGINT)
             AS lift_ppm
    FROM hit WHERE rn = 1
    """,
)
def lift_gain_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table at decile CUTOFFS: for each top-d/10 budget,
    the largest score threshold whose selection fits the budget, with
    precision, recall (gain), and lift over prevalence — the
    targeting table behind "call the top 20%" decisions and, in data
    curation, "keep the top-X% by quality score" sweeps
    (``quality_score_topk``'s whole-curve companion). Cuts land on
    DISTINCT-SCORE boundaries (never splitting a tie group), so the
    table is deterministic under ties by construction; a decile whose
    budget is smaller than the first tie group emits no row
    (documented, identical both engines).

    Scale posture: per-score aggregate (combinable), the descending
    cumulative via the banded two-pass scan, then a 10-way bounded
    rank over candidate boundary rows. Cross-engine determinism:
    all counts exact BIGINTs; every ppm is a HUGEINT/DECIMAL(38)
    floor division; the per-decile argmax is pinned by cum_rows
    (strictly increasing, no tiebreak needed).

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = _t(spark, sf_dir, "orders")["orders"]
    s = t.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("score"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    gd = g.withColumn("nscore", -F.col("score"))
    c1 = _banded_prefix(gd, "nscore", "pos", "sum", "p_before")
    c2 = _banded_prefix(c1, "nscore", "cnt", "sum", "r_before")
    c = c2.select(
        "score",
        (F.coalesce("p_before", F.lit(0)) + F.col("pos")).alias("cum_pos"),
        (F.coalesce("r_before", F.lit(0)) + F.col("cnt")).alias("cum_rows"),
    )
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("npos"),
        F.sum("cnt").cast("bigint").alias("n"),
    )
    grid = spark.range(1, _LIFT_DECILES + 1).select(F.col("id").alias("d"))
    hit = (
        grid.crossJoin(F.broadcast(tot))
        .join(
            c,
            F.col("cum_rows")
            <= F.expr(f"n * d div {_LIFT_DECILES}"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("d").orderBy(F.col("cum_rows").desc())
            ),
        )
        .where(F.col("rn") == 1)
    )
    return hit.select(
        F.col("d").cast("bigint").alias("decile"),
        F.col("score").alias("threshold_score"),
        F.col("cum_rows").cast("bigint").alias("n_selected"),
        F.col("cum_pos").cast("bigint").alias("n_pos_selected"),
        F.expr(
            "CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div cum_rows"
            " AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div npos"
            " AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(CAST(cum_pos AS DECIMAL(38,0)) * n * 1000000"
            " div (CAST(cum_rows AS DECIMAL(38,0)) * npos) AS BIGINT)"
        ).alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration via the exact minimax (PAVA) closed form
# ---------------------------------------------------------------------------

_ISO_BINS = 10


@register(
    "isotonic_calibration_pava",
    oracle=f"""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    ext AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM s),
    b AS (
      SELECT LEAST((v - lo) * {_ISO_BINS} // (hi - lo + 1),
                   {_ISO_BINS - 1}) AS bin, y
      FROM s CROSS JOIN ext
    ),
    binagg AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM b GROUP BY bin
    ),
    cum AS (
      SELECT bin, n, pos,
             SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp
      FROM binagg
    ),
    mins AS (
      SELECT i.bin AS bin, k.bin AS k,
             MIN(CAST((j.cp - k.cp + k.pos) AS HUGEINT) * 1000000000
                 // (j.cn - k.cn + k.n)) AS minv
      FROM cum i
      JOIN cum k ON k.bin <= i.bin
      JOIN cum j ON j.bin >= i.bin
      GROUP BY i.bin, k.bin
    )
    SELECT m.bin AS bin, a.n, a.pos,
           CAST(CAST(a.pos AS HUGEINT) * 1000000 // a.n AS BIGINT)
             AS raw_rate_ppm,
           CAST(MAX(m.minv) AS BIGINT) AS fitted_rate_nano
    FROM mins m JOIN binagg a ON a.bin = m.bin
    GROUP BY m.bin, a.n, a.pos
    """,
)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the
    bin-level positive rate of "order value predicts urgent priority"
    — exact PAVA, computed NOT by the sequential pool-adjacent-
    violators loop but by its minimax closed form fitted_i =
    max_{{k≤i}} min_{{j≥i}} avg(pos over bins k..j) (Robertson/Wright/
    Dykstra, Thm 1.4.4): with {_ISO_BINS} bins that is a bounded
    {_ISO_BINS}³ interval enumeration BOTH engines evaluate
    identically — no driver solve, no recursion, no engine isotonic
    built-in. The fitted step function is what you'd deploy to map
    raw score deciles to calibrated probabilities
    (``ml_calibration_brier``'s reliability diagram, repaired).

    Scale posture: the only input-sized stage is the per-bin count
    (combinable, {_ISO_BINS}-key shuffle); everything after runs on a
    {_ISO_BINS}-row frame. Cross-engine determinism: interval
    averages are quantized to nano by HUGEINT/DECIMAL(38) floor
    division BEFORE min/max (exact-integer minimax — no double
    compare anywhere); equal-width binning uses integer div on cents.

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = _t(spark, sf_dir, "orders")["orders"]
    s = t.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    ext = s.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    b = s.crossJoin(F.broadcast(ext)).select(
        F.expr(
            f"LEAST((v - lo) * {_ISO_BINS} div (hi - lo + 1),"
            f" {_ISO_BINS - 1})"
        ).alias("bin"),
        "y",
    )
    binagg = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binagg.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cn"),
        F.sum("pos").over(wc).alias("cp"),
    )
    ci = cum.select(F.col("bin").alias("i_bin"))
    ck = cum.select(
        F.col("bin").alias("k_bin"),
        F.col("n").alias("k_n"),
        F.col("pos").alias("k_pos"),
        F.col("cn").alias("k_cn"),
        F.col("cp").alias("k_cp"),
    )
    cj = cum.select(
        F.col("bin").alias("j_bin"),
        F.col("cn").alias("j_cn"),
        F.col("cp").alias("j_cp"),
    )
    mins = (
        ci.join(F.broadcast(ck), F.col("k_bin") <= F.col("i_bin"))
        .join(F.broadcast(cj), F.col("j_bin") >= F.col("i_bin"))
        .groupBy("i_bin", "k_bin")
        .agg(
            F.expr(
                "MIN(CAST(j_cp - k_cp + k_pos AS DECIMAL(38,0))"
                " * 1000000000 div (j_cn - k_cn + k_n))"
            ).alias("minv")
        )
    )
    fit = mins.groupBy("i_bin").agg(
        F.max("minv").cast("bigint").alias("fitted_rate_nano")
    )
    return (
        binagg.join(fit, binagg.bin == fit.i_bin)
        .select(
            "bin",
            "n",
            "pos",
            F.expr(
                "CAST(CAST(pos AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
            ).alias("raw_rate_ppm"),
            "fitted_rate_nano",
        )
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the binned Brier score (REL - RES + UNC)
# ---------------------------------------------------------------------------


@register(
    "brier_murphy_decomposition",
    oracle=f"""
    WITH s AS (
      SELECT ((o_orderkey % {_CAL_HASH_MOD}) * {_CAL_HASH_MULT})
               % {_CAL_HASH_MOD} AS h,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    b AS (
      SELECT CAST(h * 10 // {_CAL_HASH_MOD} AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(h) AS HUGEINT) AS sh,
             CAST(SUM(y) AS BIGINT) AS ok
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(ok) AS BIGINT) AS o
      FROM b
    ),
    terms AS (
      SELECT nk, ok,
             CAST(ROUND(nk * POW(CAST(sh AS DOUBLE) / (nk * {_CAL_HASH_MOD}.0)
                                 - CAST(ok AS DOUBLE) / nk, 2)
                        * 1000000000) AS BIGINT) AS rel_nano,
             CAST(ROUND(nk * POW(CAST(ok AS DOUBLE) / nk
                                 - CAST(o AS DOUBLE) / n, 2)
                        * 1000000000) AS BIGINT) AS res_nano,
             CAST(ROUND((nk * POW(CAST(sh AS DOUBLE)
                                  / (nk * {_CAL_HASH_MOD}.0), 2)
                         - 2 * (CAST(sh AS DOUBLE)
                                / (nk * {_CAL_HASH_MOD}.0)) * ok + ok)
                        * 1000000000) AS BIGINT) AS brier_nano
      FROM b, tot
    )
    SELECT (SELECT n FROM tot) AS n_orders,
           ROUND(SUM(rel_nano) / ((SELECT n FROM tot) * 1e9), 6)
             AS reliability,
           ROUND(SUM(res_nano) / ((SELECT n FROM tot) * 1e9), 6)
             AS resolution,
           ROUND((SELECT CAST(o AS DOUBLE) / n * (1.0 - CAST(o AS DOUBLE) / n)
                  FROM tot), 6) AS uncertainty,
           ROUND(SUM(brier_nano) / ((SELECT n FROM tot) * 1e9), 6)
             AS brier_binned
    FROM terms
    """,
)
def brier_murphy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the decile-binned Brier score:
    Brier = RELIABILITY − RESOLUTION + UNCERTAINTY — reliability is
    the calibration error you can fix by recalibrating, resolution is
    the discrimination you cannot recover once lost, uncertainty is
    the outcome's intrinsic variance. The table ``ml_calibration_brier``
    draws is summarized here into the three numbers that say WHY the
    Brier score is what it is; the identity is exact for the binned
    forecast (constant within bin by construction) and pinned against
    numpy in the sanity suite.

    Scale posture: everything reduces to the bounded 10-bin aggregate
    (exact integer N_k, Σh, O_k per bin) before any double math; the
    decomposition terms are nano-rounded PER BIN and summed as exact
    integers (float sum-order immunity over the bin rows), one
    broadcast of the 1-row totals. The pseudo-model hash is the same
    masked Knuth multiply as the calibration table (exact dyadic p).

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    s = t.select(
        (
            ((F.col("o_orderkey") % _CAL_HASH_MOD) * _CAL_HASH_MULT)
            % _CAL_HASH_MOD
        ).alias("h"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    b = s.groupBy(
        F.expr(f"CAST(h * 10 div {_CAL_HASH_MOD} AS INT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.expr("CAST(SUM(h) AS DECIMAL(38,0))").alias("sh"),
        F.sum("y").cast("bigint").alias("ok"),
    )
    tot = b.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("o"),
    )
    fk = f"(CAST(sh AS DOUBLE) / (nk * {_CAL_HASH_MOD}.0))"
    obar_k = "(CAST(ok AS DOUBLE) / nk)"
    obar = "(CAST(o AS DOUBLE) / n)"
    terms = b.join(F.broadcast(tot)).select(
        "n",
        "o",
        F.expr(
            f"CAST(ROUND(nk * POW({fk} - {obar_k}, 2) * 1000000000)"
            " AS BIGINT)"
        ).alias("rel_nano"),
        F.expr(
            f"CAST(ROUND(nk * POW({obar_k} - {obar}, 2) * 1000000000)"
            " AS BIGINT)"
        ).alias("res_nano"),
        F.expr(
            f"CAST(ROUND((nk * POW({fk}, 2) - 2 * {fk} * ok + ok)"
            " * 1000000000) AS BIGINT)"
        ).alias("brier_nano"),
    )
    return terms.groupBy("n", "o").agg(
        F.expr("ROUND(SUM(rel_nano) / (n * 1e9), 6)").alias("reliability"),
        F.expr("ROUND(SUM(res_nano) / (n * 1e9), 6)").alias("resolution"),
        F.expr(
            "ROUND(CAST(o AS DOUBLE) / n * (1.0 - CAST(o AS DOUBLE) / n), 6)"
        ).alias("uncertainty"),
        F.expr("ROUND(SUM(brier_nano) / (n * 1e9), 6)").alias("brier_binned"),
    ).select(
        F.col("n").alias("n_orders"),
        "reliability",
        "resolution",
        "uncertainty",
        "brier_binned",
    )


# ---------------------------------------------------------------------------
# Expected / maximum calibration error (ECE / MCE) of the pseudo-model
# ---------------------------------------------------------------------------


@register(
    "calibration_ece",
    oracle=f"""
    WITH s AS (
      SELECT ((o_orderkey % {_CAL_HASH_MOD}) * {_CAL_HASH_MULT})
               % {_CAL_HASH_MOD} AS h,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    b AS (
      SELECT CAST(h * 10 // {_CAL_HASH_MOD} AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(h) AS HUGEINT) AS sh,
             CAST(SUM(y) AS BIGINT) AS ok
      FROM s GROUP BY 1
    ),
    terms AS (
      SELECT bin, nk,
             CAST(ROUND(ABS(CAST(sh AS DOUBLE) / (nk * {_CAL_HASH_MOD}.0)
                            - CAST(ok AS DOUBLE) / nk) * 1000000000)
                  AS BIGINT) AS gap_nano
      FROM b
    ),
    tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n FROM b),
    mx AS (
      SELECT bin AS worst_bin, gap_nano AS mce_nano
      FROM terms ORDER BY gap_nano DESC, bin ASC LIMIT 1
    )
    SELECT (SELECT n FROM tot) AS n_orders,
           ROUND(SUM(CAST(nk AS HUGEINT) * gap_nano)
                 / ((SELECT n FROM tot) * 1e9), 6) AS ece,
           ROUND((SELECT mce_nano FROM mx) / 1e9, 6) AS mce,
           (SELECT CAST(worst_bin AS BIGINT) FROM mx) AS worst_bin
    FROM terms
    """,
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error of the decile-binned
    pseudo-model: ECE = Σ (n_k/N)·|p̄_k − ō_k| (the reported-number
    standard for "is this model calibrated"), MCE the worst bin's gap
    and which bin it is. Reads the SAME hash pseudo-model and decile
    binning as ``ml_calibration_brier`` / ``brier_murphy_decomposition``
    — reliability is the L2 view of the same table; ECE is the L1
    number dashboards quote.

    Scale posture: one combinable 10-bin aggregate of exact integers;
    per-bin |gap| is one fixed double expression nano-rounded before
    the weighted integer sum (sum-order immunity); MCE/worst-bin is a
    deterministic (gap DESC, bin ASC) top-1 over ten rows. One output
    row.

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    s = t.select(
        (
            ((F.col("o_orderkey") % _CAL_HASH_MOD) * _CAL_HASH_MULT)
            % _CAL_HASH_MOD
        ).alias("h"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    b = s.groupBy(
        F.expr(f"CAST(h * 10 div {_CAL_HASH_MOD} AS INT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.expr("CAST(SUM(h) AS DECIMAL(38,0))").alias("sh"),
        F.sum("y").cast("bigint").alias("ok"),
    )
    terms = b.select(
        "bin",
        "nk",
        F.expr(
            f"CAST(ROUND(ABS(CAST(sh AS DOUBLE) / (nk * {_CAL_HASH_MOD}e0)"
            " - CAST(ok AS DOUBLE) / nk) * 1000000000) AS BIGINT)"
        ).alias("gap_nano"),
    )
    tot = terms.agg(F.sum("nk").cast("bigint").alias("n"))
    mx = terms.orderBy(F.col("gap_nano").desc(), F.col("bin").asc()).limit(
        1
    ).select(
        F.col("bin").cast("bigint").alias("worst_bin"),
        F.col("gap_nano").alias("mce_nano"),
    )
    agg = terms.agg(
        F.expr(
            "CAST(SUM(CAST(nk AS DECIMAL(38,0)) * gap_nano)"
            " AS DECIMAL(38,0))"
        ).alias("wsum")
    )
    return (
        agg.join(F.broadcast(tot))
        .join(F.broadcast(mx))
        .select(
            F.col("n").alias("n_orders"),
            F.expr("ROUND(CAST(wsum AS DOUBLE) / (n * 1e9), 6)").alias(
                "ece"
            ),
            F.expr("ROUND(mce_nano / 1e9, 6)").alias("mce"),
            "worst_bin",
        )
    )


# ---------------------------------------------------------------------------
# Spiegelhalter's Z calibration test (exact integer formulation)
# ---------------------------------------------------------------------------

_SPIEGEL_Z975 = 1.959964  # frozen two-sided 95% normal quantile


@register(
    "spiegelhalter_z_calibration",
    oracle=f"""
    WITH s AS (
      SELECT ((o_orderkey % {_CAL_HASH_MOD}) * {_CAL_HASH_MULT})
               % {_CAL_HASH_MOD} AS h,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    terms AS (
      SELECT CAST((CAST(y AS HUGEINT) * {_CAL_HASH_MOD} - h)
                  * ({_CAL_HASH_MOD} - 2 * h) AS HUGEINT) AS num_i,
             CAST(CAST(({_CAL_HASH_MOD} - 2 * h) AS HUGEINT)
                  * ({_CAL_HASH_MOD} - 2 * h) * h
                  * ({_CAL_HASH_MOD} - h) AS HUGEINT) AS den_i
      FROM s
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(num_i) AS HUGEINT) AS sn,
             CAST(SUM(den_i) AS HUGEINT) AS sd
      FROM terms
    )
    SELECT n AS n_orders,
           ROUND(CAST(sn AS DOUBLE) / SQRT(CAST(sd AS DOUBLE)), 6)
             AS z_score,
           ABS(CAST(sn AS DOUBLE) / SQRT(CAST(sd AS DOUBLE)))
             > {_SPIEGEL_Z975} AS miscalibrated
    FROM agg WHERE sd > 0
    """,
)
def spiegelhalter_z_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's Z test of calibration for the hash
    pseudo-model: Z = Σ(y−p)(1−2p) / √Σ(1−2p)²p(1−p) — unlike
    ``calibration_ece`` (binned, magnitude) this is the UNBINNED
    significance test ("is the observed miscalibration beyond
    chance"), sensitive to p-dependent bias that binning averages
    away. Because p = h/2²⁰ is an exact dyadic rational, BOTH sums are
    EXACT integers after clearing denominators (num·M² = (yM−h)(M−2h),
    den·M⁴ = (M−2h)²h(M−h)) — zero doubles until the final ratio;
    the M²/√M⁴ scale factors cancel exactly.

    Scale posture: one pass, one combinable aggregate, one output
    row; DECIMAL(38) holds the den sum to ~1e12 rows.

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = load_tables(spark, sf_dir, "orders")["orders"]
    M = _CAL_HASH_MOD
    s = t.select(
        (
            ((F.col("o_orderkey") % M) * _CAL_HASH_MULT) % M
        ).alias("h"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    d38 = "DECIMAL(38,0)"
    terms = s.select(
        F.expr(
            f"CAST((CAST(y AS {d38}) * {M} - h) * ({M} - 2 * h) AS {d38})"
        ).alias("num_i"),
        F.expr(
            f"CAST(CAST(({M} - 2 * h) AS {d38}) * ({M} - 2 * h) * h"
            f" * ({M} - h) AS {d38})"
        ).alias("den_i"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(num_i) AS {d38})").alias("sn"),
        F.expr(f"CAST(SUM(den_i) AS {d38})").alias("sd"),
    )
    return agg.where("sd > 0").select(
        F.col("n").alias("n_orders"),
        F.expr(
            "ROUND(CAST(sn AS DOUBLE) / SQRT(CAST(sd AS DOUBLE)), 6)"
        ).alias("z_score"),
        F.expr(
            "ABS(CAST(sn AS DOUBLE) / SQRT(CAST(sd AS DOUBLE)))"
            f" > {_SPIEGEL_Z975}"
        ).alias("miscalibrated"),
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa across three deterministic quality raters
# ---------------------------------------------------------------------------

# the three frozen binary "raters" (heuristic quality signals): long
# enough / wordy enough / short-word prose — shared CASE text
_FLEISS_R1 = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"
_FLEISS_R2 = (
    "CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 >= 50"
    " THEN 1 ELSE 0 END"
)
_FLEISS_R3 = (
    "CASE WHEN (LENGTH(REPLACE(text, ' ', '')) * 10)"
    " <= (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) * 60"
    " THEN 1 ELSE 0 END"
)


@register(
    "fleiss_kappa_quality_raters",
    oracle=f"""
    WITH votes AS (
      SELECT CAST({_FLEISS_R1} + {_FLEISS_R2} + {_FLEISS_R3} AS BIGINT)
               AS g
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS HUGEINT) AS sg,
             -- 6*P_i = g^2 + (3-g)^2 - 3 (exact integers)
             CAST(SUM(CAST(g AS HUGEINT) * g + (3 - g) * (3 - g) - 3)
                  AS HUGEINT) AS sp6
      FROM votes
    )
    SELECT n AS n_docs,
           CAST(sg AS BIGINT) AS n_good_votes,
           ROUND(CAST(sp6 AS DOUBLE) / (6e0 * n), 6) AS p_bar,
           ROUND((CAST(sg AS DOUBLE) / (3e0 * n))
                 * (CAST(sg AS DOUBLE) / (3e0 * n))
                 + (1e0 - CAST(sg AS DOUBLE) / (3e0 * n))
                   * (1e0 - CAST(sg AS DOUBLE) / (3e0 * n)), 6) AS p_e,
           ROUND((CAST(sp6 AS DOUBLE) / (6e0 * n)
                  - ((CAST(sg AS DOUBLE) / (3e0 * n))
                     * (CAST(sg AS DOUBLE) / (3e0 * n))
                     + (1e0 - CAST(sg AS DOUBLE) / (3e0 * n))
                       * (1e0 - CAST(sg AS DOUBLE) / (3e0 * n))))
                 / (1e0 - ((CAST(sg AS DOUBLE) / (3e0 * n))
                           * (CAST(sg AS DOUBLE) / (3e0 * n))
                           + (1e0 - CAST(sg AS DOUBLE) / (3e0 * n))
                             * (1e0 - CAST(sg AS DOUBLE) / (3e0 * n)))),
                 6) AS fleiss_kappa
    FROM agg
    WHERE n > 0
      AND (CAST(sg AS DOUBLE) / (3e0 * n))
          * (CAST(sg AS DOUBLE) / (3e0 * n))
          + (1e0 - CAST(sg AS DOUBLE) / (3e0 * n))
            * (1e0 - CAST(sg AS DOUBLE) / (3e0 * n)) < 1e0
    """,
)
def fleiss_kappa_quality_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa agreement among three deterministic quality
    "raters" (length ≥ 300 chars; ≥ 50 words; mean word length ≤ 6) on
    the good/bad verdict per document — the multi-rater
    generalization of ``cohens_kappa_langid``: high κ means the cheap
    signals are redundant (one suffices for curation), κ near 0 means
    they disagree beyond chance and a learned combiner
    (``text_quality_logistic``) has real signal to add. 6·P_i =
    g² + (3−g)² − 3 keeps the per-doc agreement an exact integer, so
    both sums are exact; κ is one fixed double expression.

    Scale posture: one pass over documents (JVM string expressions,
    no UDF), one combinable aggregate, one output row. The degenerate
    all-same-vote corpus (P_e = 1) drops the row identically in both
    engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 quality
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    votes = t.select(
        F.expr(
            f"CAST({_FLEISS_R1} + {_FLEISS_R2} + {_FLEISS_R3} AS BIGINT)"
        ).alias("g")
    )
    d38 = "DECIMAL(38,0)"
    agg = votes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"CAST(SUM(g) AS {d38})").alias("sg"),
        F.expr(
            f"CAST(SUM(CAST(g AS {d38}) * g + (3 - g) * (3 - g) - 3)"
            f" AS {d38})"
        ).alias("sp6"),
    )
    pg = "(CAST(sg AS DOUBLE) / (3e0 * n))"
    pe = f"({pg} * {pg} + (1e0 - {pg}) * (1e0 - {pg}))"
    pbar = "(CAST(sp6 AS DOUBLE) / (6e0 * n))"
    return agg.where(f"n > 0 AND {pe} < 1e0").select(
        F.col("n").alias("n_docs"),
        F.col("sg").cast("bigint").alias("n_good_votes"),
        F.expr(f"ROUND({pbar}, 6)").alias("p_bar"),
        F.expr(f"ROUND({pe}, 6)").alias("p_e"),
        F.expr(
            f"ROUND(({pbar} - {pe}) / (1e0 - {pe}), 6)"
        ).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# Character-class composition audit (script/encoding screen)
# ---------------------------------------------------------------------------


@register(
    "char_class_mix_audit",
    oracle="""
    WITH d AS (
      SELECT source, LENGTH(text) AS n,
             LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Za-z]', '', 'g'))
               AS n_letter,
             LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))
               AS n_digit,
             LENGTH(text) - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g'))
               AS n_space
      FROM documents WHERE LENGTH(text) > 0
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           CAST(SUM(n_letter) * 1000000 // SUM(n) AS BIGINT) AS letter_ppm,
           CAST(SUM(n_digit) * 1000000 // SUM(n) AS BIGINT) AS digit_ppm,
           CAST(SUM(n_space) * 1000000 // SUM(n) AS BIGINT) AS space_ppm,
           CAST((SUM(n) - SUM(n_letter) - SUM(n_digit) - SUM(n_space))
                * 1000000 // SUM(n) AS BIGINT) AS other_ppm
    FROM d GROUP BY source
    """,
)
def char_class_mix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source — the cheap script /
    encoding screen a curation pipeline runs before any tokenizer
    touches the data: per-million rates of ASCII letters, digits,
    spaces, and everything else (the 'other' bucket is where mojibake,
    markup soup, and non-Latin scripts land; a feed whose other_ppm
    jumps is the classic silent-encoding-regression signal). Counts
    come from length-after-strip deltas — three regexp_replace per
    doc, all JVM codegen, no explode, no UDF.

    Scale posture: one map-only pass over documents collapsing into a
    per-source combinable 4-integer aggregate; output is
    O(sources). Exact integer ppm both engines.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    t = _t(spark, sf_dir, "documents")["documents"]
    d = t.where(F.length("text") > 0).select(
        "source",
        F.length("text").alias("n"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
        ).alias("n_letter"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digit"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        ).alias("n_space"),
    )
    return d.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_chars"),
        F.expr("SUM(n_letter) * 1000000 div SUM(n)")
        .cast("bigint")
        .alias("letter_ppm"),
        F.expr("SUM(n_digit) * 1000000 div SUM(n)")
        .cast("bigint")
        .alias("digit_ppm"),
        F.expr("SUM(n_space) * 1000000 div SUM(n)")
        .cast("bigint")
        .alias("space_ppm"),
        F.expr(
            "(SUM(n) - SUM(n_letter) - SUM(n_digit) - SUM(n_space))"
            " * 1000000 div SUM(n)"
        )
        .cast("bigint")
        .alias("other_ppm"),
    )
