"""Corpus/behavior mining operators (SURVEY.md §2.5 north-star
extensions; no reference analogue — the reference's relational surface
is SQL shipped to Redshift, see lib/RedshiftLoader.ts:337-393).

The family covers the classic training-data-pipeline analyses that sit
next to dedup/similarity: TF-IDF term extraction, token co-occurrence
PMI, bigram language-model counts, shingle containment (subset
near-dup), plus the behavioral staples (RFM segmentation, activity
streaks, Markov transitions, Pareto revenue concentration).

Cross-engine determinism rules (same as the rest of the catalog):
integer arithmetic wherever sums feed comparisons (money in BIGINT
cents — float partial-sum order differs between engines), natural log
only as the final scored expression with identical operand order,
rounded scores as the ordering key for any top-k cut, and global
windows only over already-reduced aggregates (buckets / labels /
event types), never over input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables, spread, stage_cached


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# Token stage (non-distinct tokens — TF needs multiplicity, unlike the
# dedup family's distinct shingles)
# ---------------------------------------------------------------------------

_TOKENS_SQL = """
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
      FROM documents
"""


def _tokens(t: DataFrame) -> DataFrame:
    """All tokens per doc with multiplicity (whitespace split). The
    split/explode runs above ``spread`` so the generate parallelizes
    over the cluster, mirroring the shingle stage (dedup.py)."""
    return (
        spread(t)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document
# ---------------------------------------------------------------------------

_TFIDF_TOPK = 3


@register(
    "tfidf_topk_terms",
    oracle=f"""
    WITH toks AS ({_TOKENS_SQL}),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok AS term, tf.tf,
             ROUND(tf.tf * (LN((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rn AS term_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS INT) AS rn
      FROM scored
    ) WHERE rn <= {_TFIDF_TOPK}
    """,
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by smoothed TF-IDF
    (sklearn-style ``ln((1+N)/(1+df)) + 1``, always positive).

    Scale posture: TF is a (doc, term)-keyed aggregate, DF a
    term-keyed aggregate over TF's (already reduced) output, both
    map-side combinable; the TF⋈DF join shuffles on the term key only.
    N travels as a broadcast 1-row aggregate (the bm25_topk pattern,
    text.py). The per-doc top-k is a doc-partitioned ranking window —
    WindowGroupLimit pushes the k-cut map-side. The one transcendental
    (natural log) is the final scored expression with identical
    operand order in both engines, and the ROUNDED score is the
    ordering key, so the cut is cross-engine stable (ties broken by
    term)."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    tf = (
        _tokens(docs)
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select("doc_id", "term", "tf", F.round(F.col("tf") * idf, 6).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= _TFIDF_TOPK)
        .select("doc_id", "term", "tf", "tfidf", "term_rank")
    )


# ---------------------------------------------------------------------------
# Shingle containment (subset near-dup: small doc inside a bigger one)
# ---------------------------------------------------------------------------

_CONTAINMENT_THRESHOLD = 0.8

_CONTAIN_SHINGLE_SQL = """
      SELECT doc_id, UNNEST(LIST_DISTINCT(
               LIST_TRANSFORM(RANGE(1, LEN(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
             )) AS sh
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents)
"""


@register(
    "dedup_containment",
    oracle=f"""
    WITH s AS ({_CONTAIN_SHINGLE_SQL}),
    n AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, i AS n_shared,
           ROUND(CAST(i AS DOUBLE) / na.n, 6) AS containment_a,
           ROUND(CAST(i AS DOUBLE) / nb.n, 6) AS containment_b
    FROM inter
    JOIN n na ON na.doc_id = doc_a
    JOIN n nb ON nb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / na.n >= {_CONTAINMENT_THRESHOLD}
       OR CAST(i AS DOUBLE) / nb.n >= {_CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment |A∩B| / |A| — catches a short
    document embedded in a longer one, which symmetric Jaccard misses
    (a 100-token doc fully inside a 10k-token doc has Jaccard ≈ 0.01
    but containment 1.0). The standard complement to Jaccard dedup in
    training-data pipelines (same trigram shingles as the dedup
    family, dedup.py).

    Scale posture: rides the cached shared co-shingle pair-count
    stage (dedup._coshingle_counts) — basket-array pair generation
    from df-capped posting lists (no self-join, bounded hot-shingle
    fan-out), with per-doc shingle counts denormalized so no post-agg
    count lookups are needed."""
    from rs_streamloader_spark.operators.dedup import _coshingle_counts

    inter = _coshingle_counts(spark, sf_dir).withColumnRenamed("i", "n_shared")
    cont_a = F.col("n_shared").cast("double") / F.col("na")
    cont_b = F.col("n_shared").cast("double") / F.col("nb")
    return (
        inter.filter((cont_a >= _CONTAINMENT_THRESHOLD) | (cont_b >= _CONTAINMENT_THRESHOLD))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(cont_a, 6).alias("containment_a"),
            F.round(cont_b, 6).alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# Token co-occurrence PMI (word2vec-era association mining)
# ---------------------------------------------------------------------------

_PMI_VOCAB = 50
_PMI_MIN_PAIRS = 5


@register(
    "cooccurrence_pmi",
    oracle=f"""
    WITH toks AS ({_TOKENS_SQL}),
    dt AS (SELECT DISTINCT doc_id, tok FROM toks),
    vocab AS (
      SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok
      ORDER BY df DESC, tok LIMIT {_PMI_VOCAB}
    ),
    vt AS (
      SELECT dt.doc_id, dt.tok, v.df FROM dt JOIN vocab v ON dt.tok = v.tok
    ),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             MIN(a.df) AS na, MIN(b.df) AS nb, COUNT(*) AS n_ab
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tok_a, tok_b, n_ab,
           ROUND(LN((CAST(n_ab AS DOUBLE) / na) * (CAST(n_docs AS DOUBLE) / nb)), 6)
             AS pmi
    FROM pairs CROSS JOIN n
    WHERE n_ab >= {_PMI_MIN_PAIRS}
    """,
)
def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in the
    same document, restricted to the top-{vocab} document-frequency
    vocabulary — the classic association-mining pass (collocations,
    embedding co-occurrence matrices).

    Scale posture: the vocabulary cut is ``ORDER BY df DESC LIMIT k``
    — Spark plans TakeOrderedAndProject (distributed top-k, no
    single-partition window over the vocabulary), and the tiny vocab
    broadcasts into the document-token semi-join. The doc-keyed
    self-join fans out at most C(vocab, 2) pairs per document, so the
    candidate volume is bounded by construction, not by data luck.
    PMI's log operand is phrased as a product of two bounded double
    ratios — identical operand order in both engines, and no bigint
    product that could overflow at corpus scale."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    dt = _tokens(docs).select("doc_id", "tok").distinct()
    df = dt.groupBy("tok").agg(F.count("*").alias("df"))
    vocab = df.orderBy(F.col("df").desc(), "tok").limit(_PMI_VOCAB)
    vt = dt.join(F.broadcast(vocab), "tok")
    a = vt.alias("a")
    b = vt.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.min("a.df").alias("na"), F.min("b.df").alias("nb"), F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_PAIRS)
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.col("na"))
        * (F.col("n_docs").cast("double") / F.col("nb"))
    )
    return (
        pairs.join(F.broadcast(n))
        .select("tok_a", "tok_b", "n_ab", F.round(pmi, 6).alias("pmi"))
    )


# ---------------------------------------------------------------------------
# Bigram language-model counts (conditional next-token probabilities)
# ---------------------------------------------------------------------------

_BIGRAM_MIN_COUNT = 10


@register(
    "bigram_lm_counts",
    oracle=f"""
    WITH bigrams AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
                                   i -> [ws[i], ws[i+1]])) AS bg
      FROM (SELECT STRING_SPLIT(text, ' ') AS ws FROM documents)
    ),
    bc AS (
      SELECT bg[1] AS w1, bg[2] AS w2, COUNT(*) AS n_bigram
      FROM bigrams GROUP BY 1, 2
    )
    SELECT w1, w2, n_bigram, n_w1,
           ROUND(CAST(n_bigram AS DOUBLE) / n_w1, 6) AS cond_prob
    FROM (
      SELECT w1, w2, n_bigram,
             CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_w1
      FROM bc
    )
    WHERE n_bigram >= {_BIGRAM_MIN_COUNT}
    """,
)
def bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language model: P(w2 | w1) = count(w1 w2) /
    count(w1 in first position) for every bigram seen ≥ {min} times —
    the n-gram-LM building block (KenLM-style count collection).

    Scale posture: one explode of per-doc adjacent pairs → a
    (w1, w2)-keyed combinable aggregate; the denominator is a window
    over the ALREADY-AGGREGATED bigram table partitioned by w1
    (distributed across first-words, never over input rows). The
    ≥{min} support filter applies after the denominator so
    probabilities stay true conditional mass, not renormalized over
    survivors."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    ws = F.split(F.col("text"), " ")
    grams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN"
        " transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
        " ELSE array() END"
    )
    bc = (
        spread(docs)
        .select(ws.alias("ws"))
        .select(F.explode(grams).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").alias("n_bigram"))
    )
    w = Window.partitionBy("w1")
    return (
        bc.withColumn("n_w1", F.sum("n_bigram").over(w))
        .filter(F.col("n_bigram") >= _BIGRAM_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_w1",
            F.round(F.col("n_bigram").cast("double") / F.col("n_w1"), 6).alias("cond_prob"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (quantile-banded, no global-sort NTILE)
# ---------------------------------------------------------------------------


@register(
    "rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             DATEDIFF('day', MAX(o_orderdate),
                      (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT QUANTILE_CONT(recency_days, [0.25, 0.5, 0.75]) AS rb,
             QUANTILE_CONT(frequency, [0.25, 0.5, 0.75]) AS fb,
             QUANTILE_CONT(monetary_cents, [0.25, 0.5, 0.75]) AS mb
      FROM cust
    )
    SELECT CAST(1 + LIST_SUM(LIST_TRANSFORM(b.rb,
             x -> CASE WHEN c.recency_days > x THEN 1 ELSE 0 END)) AS INT)
             AS recency_band,
           CAST(1 + LIST_SUM(LIST_TRANSFORM(b.fb,
             x -> CASE WHEN c.frequency > x THEN 1 ELSE 0 END)) AS INT)
             AS frequency_band,
           CAST(1 + LIST_SUM(LIST_TRANSFORM(b.mb,
             x -> CASE WHEN c.monetary_cents > x THEN 1 ELSE 0 END)) AS INT)
             AS monetary_band,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.monetary_cents) / COUNT(*) / 100.0, 2) AS avg_monetary
    FROM cust c CROSS JOIN b
    GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation into quartile
    bands — the workhorse customer-analytics rollup.

    Scale posture: per-customer metrics are one combinable aggregate;
    the quartile boundaries come from one percentile AGGREGATE over
    the reduced customer table, broadcast as a 1-row array, and band
    assignment is a pure fold over 3 boundaries — the
    ``numeric_histogram_equidepth`` pattern (analytic.py), NOT a
    global-sort NTILE window. Money is summed in BIGINT cents (float
    partial-sum order differs between engines; integer sums are
    exact), so boundary comparisons can never flip on a 1-ulp
    disagreement. Both engines interpolate quantiles with the same
    (n-1)p definition."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cust = t.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    maxd = t.agg(F.max("o_orderdate").alias("max_date"))
    cust = cust.join(F.broadcast(maxd)).select(
        F.datediff("max_date", "last_order").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    bounds = cust.agg(
        F.percentile("recency_days", qs).alias("rb"),
        F.percentile("frequency", qs).alias("fb"),
        F.percentile("monetary_cents", qs).alias("mb"),
    )

    def band(col: str, bs: str):
        return F.expr(
            f"1 + aggregate({bs}, 0, (acc, x) -> acc + IF({col} > x, 1, 0))"
        ).cast("int")

    return (
        cust.join(F.broadcast(bounds))
        .groupBy(
            band("recency_days", "rb").alias("recency_band"),
            band("frequency", "fb").alias("frequency_band"),
            band("monetary_cents", "mb").alias("monetary_band"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("monetary_cents") / F.count("*") / 100.0, 2).alias("avg_monetary"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks
# ---------------------------------------------------------------------------

@register(
    "activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
      SELECT user_id,
             DATEDIFF('day', DATE '1970-01-01', day)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           MAX(len) AS max_streak_days
    FROM streaks GROUP BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — the canonical
    gaps-and-islands pattern (island key = epoch_day − row_number,
    constant within a run of consecutive days).

    Scale posture: the only window is partitioned by user_id over
    DISTINCT activity days (already reduced from raw events by the
    first aggregate); the island key uses pure integer epoch-day
    arithmetic, so no interval/timezone semantics can diverge between
    engines. Two keyed aggregates, both combinable."""
    t = _t(spark, sf_dir, "events")["events"]
    days = t.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        (F.datediff("day", F.lit("1970-01-01")).cast("bigint") - F.row_number().over(w)).alias(
            "island"
        ),
    )
    streaks = islands.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("max_streak_days"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event types
# ---------------------------------------------------------------------------

@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type, COUNT(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY prev_type), 6)
             AS transition_prob
    FROM counts
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — session-modeling /
    next-action-prediction feature.

    Scale posture: the lag window is partitioned by user (ordered by
    the total (ts, event_id) key, so ties can't reorder between
    engines); transition counts are a combinable aggregate over the
    event-type cross product (|types|² rows), and the row-normalizing
    window runs over THAT tiny aggregate, not over events."""
    t = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        t.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wp), 6
        ).alias("transition_prob"),
    )


# ---------------------------------------------------------------------------
# Pareto revenue concentration (distributed prefix sum, integer cents)
# ---------------------------------------------------------------------------

_PARETO_BUCKET_CENTS = 1_000_000  # $10k revenue bands → bounded bucket count


@register(
    "pareto_customer_share",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) - rev AS cum_before
      FROM cust
    ),
    tot AS (SELECT SUM(rev) AS total, COUNT(*) AS n FROM cust)
    SELECT n AS n_customers,
           ROUND(total / 100.0, 2) AS total_revenue,
           CAST(SUM(CASE WHEN cum_before * 2 < total THEN 1 ELSE 0 END) AS BIGINT) AS customers_to_50pct,
           CAST(SUM(CASE WHEN cum_before * 5 < total * 4 THEN 1 ELSE 0 END) AS BIGINT) AS customers_to_80pct,
           CAST(SUM(CASE WHEN cum_before * 10 < total * 9 THEN 1 ELSE 0 END) AS BIGINT) AS customers_to_90pct
    FROM ranked CROSS JOIN tot
    GROUP BY n, total
    """,
)
def pareto_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: how many top customers cover 50 / 80 /
    90% of total revenue (ABC / Pareto analysis).

    Scale posture: the oracle's single global running sum is a serial
    one-partition window; this is the TWO-PASS distributed prefix sum
    (the ``interval_concurrency`` pattern, analytic.py): customers
    band into fixed $10k revenue buckets, the running sum partitions
    by bucket, and per-bucket net totals — a bounded-count aggregate —
    prefix-sum on one tiny partition and broadcast back as bucket
    offsets. All revenue is BIGINT cents and the threshold tests are
    pure integer cross-multiplications, so the two engines' different
    summation orders cannot produce a 1-ulp disagreement at a
    threshold boundary."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cust = t.groupBy("o_custkey").agg(F.sum(cents).alias("rev"))
    cust = cust.withColumn(
        "bucket", F.floor(F.col("rev") / F.lit(_PARETO_BUCKET_CENTS)).cast("bigint")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = cust.withColumn("run_in", F.sum("rev").over(w_in))
    # buckets descend with revenue: offsets accumulate over HIGHER buckets
    w_b = Window.orderBy(F.col("bucket").desc()).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        cust.groupBy("bucket")
        .agg(F.sum("rev").alias("net"))
        .withColumn("offset", F.coalesce(F.sum("net").over(w_b), F.lit(0)))
        .select("bucket", "offset")
    )
    tot = cust.agg(F.sum("rev").alias("total"), F.count("*").alias("n"))
    cum_before = F.col("offset") + F.col("run_in") - F.col("rev")
    return (
        within.join(F.broadcast(offsets), "bucket")
        .join(F.broadcast(tot))
        .groupBy(F.col("n").alias("n_customers"), F.round(F.col("total") / 100.0, 2).alias("total_revenue"))
        .agg(
            F.sum(F.when(cum_before * 2 < F.col("total"), 1).otherwise(0)).alias(
                "customers_to_50pct"
            ),
            F.sum(F.when(cum_before * 5 < F.col("total") * 4, 1).otherwise(0)).alias(
                "customers_to_80pct"
            ),
            F.sum(F.when(cum_before * 10 < F.col("total") * 9, 1).otherwise(0)).alias(
                "customers_to_90pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Class-balance weights (inverse-frequency sampling weights)
# ---------------------------------------------------------------------------

@register(
    "label_balance_weights",
    oracle="""
    WITH c AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label)
    SELECT label, n_vectors,
           ROUND(CAST((SELECT SUM(n_vectors) FROM c) AS DOUBLE)
                 / ((SELECT COUNT(*) FROM c) * n_vectors), 6) AS class_weight
    FROM c
    """,
)
def label_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights ``N / (K · n_label)`` over the
    embedding labels — the standard balanced-sampling / loss-weighting
    input for training on skewed class distributions.

    Scale posture: one combinable label aggregate; N and K come from
    windows over that already-tiny aggregate (|labels| rows), so
    nothing global touches input rows."""
    t = _t(spark, sf_dir, "embeddings")["embeddings"]
    c = t.groupBy("label").agg(F.count("*").alias("n_vectors"))
    w = Window.partitionBy()
    return c.select(
        "label",
        "n_vectors",
        F.round(
            F.sum("n_vectors").over(w).cast("double")
            / (F.count("*").over(w) * F.col("n_vectors")),
            6,
        ).alias("class_weight"),
    )


# ---------------------------------------------------------------------------
# Session duration statistics (companion to interval_concurrency)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800


@register(
    "session_duration_stats",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {_SESSION_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             DATE_DIFF('microsecond', MIN(ts), MAX(ts)) AS dur_us
      FROM (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM flagged
      ) GROUP BY user_id, sid
    )
    SELECT COUNT(*) AS n_sessions,
           ROUND(SUM(n_events) / COUNT(*), 6) AS avg_events,
           ROUND(QUANTILE_CONT(dur_us, 0.5) / 1000000.0, 6) AS p50_duration_s,
           ROUND(QUANTILE_CONT(dur_us, 0.9) / 1000000.0, 6) AS p90_duration_s,
           ROUND(MAX(dur_us) / 1000000.0, 6) AS max_duration_s
    FROM sessions
    """,
)
def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution (30-min-gap sessionization →
    event-count mean + duration percentiles) — the dwell-time rollup
    next to ``interval_concurrency``'s concurrency sweep.

    Scale posture: sessionization windows partition by user; durations
    are integer microseconds (timestampdiff, no float time math), so
    the percentile AGGREGATE interpolates over identical integers in
    both engines — one combinable reduction, no global window over
    events."""
    t = _t(spark, sf_dir, "events")["events"]
    wu = Window.partitionBy("user_id").orderBy("ts")
    flagged = (
        t.select("user_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(wu))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                    > F.lit(_SESSION_GAP_S * 1_000_000)
                ),
                1,
            ).otherwise(0),
        )
    )
    sessions = (
        flagged.withColumn(
            "sid", F.sum("new_sess").over(wu.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("dur_us"),
        )
    )
    return sessions.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.sum("n_events") / F.count("*"), 6).alias("avg_events"),
        F.round(F.percentile("dur_us", F.lit(0.5)) / 1_000_000.0, 6).alias("p50_duration_s"),
        F.round(F.percentile("dur_us", F.lit(0.9)) / 1_000_000.0, 6).alias("p90_duration_s"),
        F.round(F.max("dur_us") / 1_000_000.0, 6).alias("max_duration_s"),
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue growth
# ---------------------------------------------------------------------------

@register(
    "orders_monthly_growth",
    oracle="""
    WITH m AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month,
             COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           ROUND(rev_cents / 100.0, 2) AS revenue,
           ROUND((rev_cents - LAG(rev_cents) OVER (ORDER BY month))
                 / CAST(LAG(rev_cents) OVER (ORDER BY month) AS DOUBLE), 6)
             AS growth_pct
    FROM m
    """,
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting staple (monthly
    rollup + lag ratio; first month's growth is NULL, not zero).

    Scale posture: the lag window is global but runs over the MONTHLY
    aggregate (one row per month — bounded by the calendar, not the
    data), matching the catalog rule that global windows only ever see
    already-reduced aggregates. Revenue sums in BIGINT cents so the
    growth ratio's operands are exact on both engines."""
    t = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # formatted string, not DATE — the catalog's TZ-invariant date
    # output convention (see rollup_time_multigrain)
    m = t.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(
        F.count("*").alias("n_orders"), F.sum(cents).alias("rev_cents")
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month",
        "n_orders",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round((F.col("rev_cents") - prev) / prev.cast("double"), 6).alias("growth_pct"),
    )


# ---------------------------------------------------------------------------
# Market-basket association (support / confidence / lift)
# ---------------------------------------------------------------------------

_BASKET_MIN_PAIRS = 3


@register(
    "basket_lift_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pc AS MATERIALIZED (SELECT l_partkey, COUNT(*) AS n_part FROM items GROUP BY l_partkey),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_ab,
           ROUND(CAST(n_ab AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(n_ab AS DOUBLE) / pa.n_part, 6) AS confidence,
           ROUND((CAST(n_ab AS DOUBLE) / pa.n_part)
                 * (CAST(n.n_orders AS DOUBLE) / pb.n_part), 6) AS lift
    FROM pairs
    JOIN pc pa ON pa.l_partkey = part_a
    JOIN pc pb ON pb.l_partkey = part_b
    CROSS JOIN n
    WHERE n_ab >= {_BASKET_MIN_PAIRS}
    """,
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items:
    support / confidence / lift for part pairs bought together ≥
    {min} times — the recommendation/affinity staple.

    Scale posture: baskets collapse to sorted distinct-part arrays on
    one order-key shuffle and pairs explode within each array — the
    fan-out per order is C(items-per-order, 2) —
    bounded by basket size (≤7 in TPC-H-shaped data), never by corpus
    size. Part counts join on the part key (keyed shuffle, combinable
    partials); the order count is a broadcast 1-row aggregate; lift is
    a product of two bounded double ratios (no bigint product to
    overflow at scale)."""
    t = _t(spark, sf_dir, "lineitem")["lineitem"]
    # baskets as sorted distinct-part arrays: one order-key shuffle
    # serves the pair explode, the part counts, and the basket count
    # (the item_item_cosine_topk pattern)
    baskets = t.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pc = baskets.select(F.explode("ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n_part"))
    n = baskets.agg(F.count("*").alias("n_orders"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_PAIRS)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na"))
    pb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb"))
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias("confidence"),
            F.round(
                (F.col("n_ab").cast("double") / F.col("na"))
                * (F.col("n_orders").cast("double") / F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Hour-of-day / day-of-week seasonality profile
# ---------------------------------------------------------------------------

@register(
    "events_hourly_seasonality",
    oracle="""
    SELECT DAYOFWEEK(ts) + 1 AS dow,
           CAST(HOUR(ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / COUNT(*) / 100.0, 6)
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic/value seasonality by (day-of-week, hour-of-day) — the
    168-cell profile behind load forecasting and anomaly baselines.

    Scale posture: one combinable aggregate to a fixed 168-row output.
    Cross-engine notes: ``ts`` is TIMESTAMP_NTZ so hour/dow extraction
    is timezone-free; Spark's dayofweek is 1=Sunday while DuckDB's is
    0=Sunday, so the oracle shifts by one; the value mean is summed in
    BIGINT hundredths (the column carries 2 decimals) and divided
    once, so engine summation order cannot differ."""
    t = _t(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        t.groupBy(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(cents) / F.count("*") / 100.0, 6).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Binary-classifier evaluation: confusion matrix + precision/recall/F1
# ---------------------------------------------------------------------------

def _langid_pred_sql() -> str:
    from rs_streamloader_spark.operators.text import _marker_count_sql

    return (
        f"CASE WHEN ({_marker_count_sql('the')} + {_marker_count_sql('a')}) * 20"
        " >= (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"
        " THEN 1 ELSE 0 END"
    )


def _confusion_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS actual,
             {_langid_pred_sql()} AS predicted
      FROM documents
    ),
    cm AS (
      SELECT CAST(SUM(actual * predicted) AS BIGINT) AS tp,
             CAST(SUM((1 - actual) * predicted) AS BIGINT) AS fp,
             CAST(SUM(actual * (1 - predicted)) AS BIGINT) AS fn,
             CAST(SUM((1 - actual) * (1 - predicted)) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_en,
           ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_en,
           ROUND(2.0 * (CAST(tp AS DOUBLE) / (tp + fp))
                     * (CAST(tp AS DOUBLE) / (tp + fn))
                 / ((CAST(tp AS DOUBLE) / (tp + fp))
                    + (CAST(tp AS DOUBLE) / (tp + fn))), 6) AS f1_en,
           ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM cm
    """


@register("confusion_matrix_metrics", oracle=_confusion_oracle())
def confusion_matrix_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation rollup for the marker-word language-ID
    heuristic vs the labelled ``lang`` column: confusion counts plus
    precision / recall / F1 / accuracy — the audit every
    model-filtered data pipeline publishes next to its filter.

    Scale posture: a single combinable aggregate (four conditional
    sums) to one row; the derived metrics are ratios of exact BIGINT
    counts with identical operand order in both engines."""
    from rs_streamloader_spark.functions import marker_word_count, n_tokens

    t = _t(spark, sf_dir, "documents")["documents"]
    en_markers = marker_word_count("the") + marker_word_count("a")
    pred = F.when(en_markers * 20 >= n_tokens(), 1).otherwise(0)
    actual = F.when(F.col("lang") == "en", 1).otherwise(0)
    cm = t.select(actual.alias("a"), pred.alias("p")).agg(
        F.sum(F.col("a") * F.col("p")).alias("tp"),
        F.sum((1 - F.col("a")) * F.col("p")).alias("fp"),
        F.sum(F.col("a") * (1 - F.col("p"))).alias("fn"),
        F.sum((1 - F.col("a")) * (1 - F.col("p"))).alias("tn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision_en"),
        F.round(rec, 6).alias("recall_en"),
        F.round(2.0 * prec * rec / (prec + rec), 6).alias("f1_en"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Decile lift/gains table for the quality classifier
# ---------------------------------------------------------------------------

_LIFT_BINS = 10


def _lift_oracle() -> str:
    from rs_streamloader_spark.operators.text import _QL_W, _marker_count_sql

    ps = ", ".join(str((i + 1) / _LIFT_BINS) for i in range(_LIFT_BINS - 1))
    return f"""
    WITH f AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             ((({_QL_W[0]} + {_QL_W[1]} *
                 CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE))
               + {_QL_W[2]} * (CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                  / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)))
              + {_QL_W[3]} * (CAST({_marker_count_sql('the')} + {_marker_count_sql('a')} AS DOUBLE)
                  / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1))) AS score
      FROM documents
    ),
    b AS (SELECT QUANTILE_CONT(score, [{ps}]) AS bs FROM f),
    binned AS (
      SELECT CAST(1 + LIST_SUM(LIST_TRANSFORM(b.bs,
               x -> CASE WHEN f.score > x THEN 1 ELSE 0 END)) AS INT) AS decile,
             pos
      FROM f CROSS JOIN b
    ),
    g AS (
      SELECT decile, COUNT(*) AS n_docs, CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM binned GROUP BY decile
    ),
    tot AS (SELECT SUM(n_docs) AS nd, SUM(n_pos) AS np FROM g)
    SELECT decile, n_docs, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / n_docs, 6) AS pos_rate,
           ROUND((CAST(n_pos AS DOUBLE) / n_docs)
                 / (CAST(np AS DOUBLE) / nd), 6) AS lift,
           ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile DESC
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) / np, 6)
             AS cum_capture
    FROM g CROSS JOIN tot
    """


@register("decile_lift_table", oracle=_lift_oracle())
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table for the fixed-weight quality classifier
    (``text_quality_logistic``'s logit) against the en-label: per
    score decile, the positive rate, lift over the base rate, and the
    cumulative capture reading from the best decile down — the
    standard model-quality report before using a classifier to filter
    training data.

    Scale posture: the logit is pure arithmetic (bit-identical across
    engines), decile boundaries come from one percentile AGGREGATE
    broadcast back (the equidepth pattern — no global-sort NTILE), and
    the lift/capture windows run over the 10-row decile aggregate."""
    from rs_streamloader_spark.functions import marker_word_count, n_tokens
    from rs_streamloader_spark.operators.text import _QL_W

    t = _t(spark, sf_dir, "documents")["documents"]
    ntok = n_tokens()
    nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    atl = nonspace.cast("double") / ntok
    md = (marker_word_count("the") + marker_word_count("a")).cast("double") / ntok
    w0, w1, w2, w3 = _QL_W
    score = ((F.lit(w0) + F.lit(w1) * ntok.cast("double")) + F.lit(w2) * atl) + F.lit(w3) * md
    f = t.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"), score.alias("score")
    )
    ps = [(i + 1) / _LIFT_BINS for i in range(_LIFT_BINS - 1)]
    bounds = f.agg(F.percentile("score", F.array(*[F.lit(p) for p in ps])).alias("bs"))
    decile = F.expr("1 + aggregate(bs, 0, (acc, x) -> acc + IF(score > x, 1, 0))").cast("int")
    g = (
        f.join(F.broadcast(bounds))
        .groupBy(decile.alias("decile"))
        .agg(F.count("*").alias("n_docs"), F.sum("pos").alias("n_pos"))
    )
    # totals as windows over the 10-row decile aggregate — a separate
    # g.agg() would re-derive the whole scan chain (4 scans, not 2)
    w_all = Window.partitionBy()
    g = g.withColumn("nd", F.sum("n_docs").over(w_all)).withColumn(
        "np", F.sum("n_pos").over(w_all)
    )
    w_cum = Window.orderBy(F.col("decile").desc()).rowsBetween(Window.unboundedPreceding, 0)
    return (
        g.select(
            "decile",
            "n_docs",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n_docs"), 6).alias("pos_rate"),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_docs"))
                / (F.col("np").cast("double") / F.col("nd")),
                6,
            ).alias("lift"),
            F.round(
                F.sum("n_pos").over(w_cum).cast("double") / F.col("np"), 6
            ).alias("cum_capture"),
        )
    )


# ---------------------------------------------------------------------------
# Arrival-lateness histogram (watermark sizing input)
# ---------------------------------------------------------------------------

@register(
    "arrival_lateness_histogram",
    oracle="""
    WITH lat AS (
      SELECT GREATEST(COALESCE(DATE_DIFF('microsecond', ts,
               MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             ), 0), 0) AS late_us
      FROM events
    )
    SELECT LEAST(late_us // 60000000, 60) AS lateness_minutes,
           COUNT(*) AS n_events
    FROM lat GROUP BY 1
    """,
)
def arrival_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness distribution: how far each event's
    timestamp sits behind the latest event-time already arrived for
    that user (arrival order = event_id) — the empirical input for
    choosing a Structured Streaming watermark delay (see
    streaming/windows.py). Bucketed by minute, capped at 60.

    Scale posture: one window partitioned by user over arrival order,
    integer-microsecond arithmetic end to end, then a combinable
    histogram aggregate with a fixed 61-row output."""
    t = _t(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(
        F.coalesce(
            F.expr("timestampdiff(MICROSECOND, ts, prior_max)"), F.lit(0).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
    )
    return (
        t.select("user_id", "event_id", "ts")
        .withColumn("prior_max", F.max("ts").over(w))
        .select(late_us.alias("late_us"))
        .groupBy(
            F.least(F.expr("late_us div 60000000"), F.lit(60).cast("bigint")).alias(
                "lateness_minutes"
            )
        )
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Dataset-card summary statistics per source
# ---------------------------------------------------------------------------

@register(
    "dataset_card_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           ROUND(SUM(CAST(n_chars AS BIGINT)) / CAST(COUNT(*) AS DOUBLE), 6)
             AS avg_chars,
           ROUND(SUM(CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_tokens,
           ROUND(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pct_en,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents GROUP BY source
    """,
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card summary (doc counts, size, token mean,
    language mix) — the table a training-data release publishes per
    subset.

    Scale posture: one combinable aggregate keyed by source; all means
    are exact integer sums divided once, so engine summation order
    cannot differ. Output is bounded by the source count."""
    from rs_streamloader_spark.functions import n_tokens

    t = _t(spark, sf_dir, "documents")["documents"]
    return t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        F.round(
            F.sum(F.col("n_chars").cast("bigint")) / F.count("*").cast("double"), 6
        ).alias("avg_chars"),
        F.round(F.sum(n_tokens()) / F.count("*").cast("double"), 6).alias("avg_tokens"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("pct_en"),
        F.countDistinct("lang").alias("n_langs"),
    )


# ---------------------------------------------------------------------------
# Per-document bigram-LM negative log-likelihood (perplexity-proxy
# quality scoring — the LM-filtering primitive next to the heuristic
# text_quality_score)
# ---------------------------------------------------------------------------


def _doc_bigrams_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc, w1, w2, multiplicity) stage: one bigram explode
    pass over documents feeds both the per-doc scoring and the corpus
    LM counts (see text_perplexity_bigram). Pre-materialized by
    bench.py like the shingle/embedding stages."""

    def build() -> DataFrame:
        docs = _t(spark, sf_dir, "documents")["documents"]
        ws = F.split(F.col("text"), " ")
        grams = F.expr(
            "CASE WHEN size(ws) >= 2 THEN"
            " transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
            " ELSE array() END"
        )
        bigrams = (
            spread(docs)
            .select("doc_id", ws.alias("ws"))
            .select("doc_id", F.explode(grams).alias("bg"))
            .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        )
        return bigrams.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n"))

    return stage_cached(spark, sf_dir, "perplexity_doc_bigrams", build)


# the bigram-LM scoring CTE chain, single-sourced between the per-doc
# perplexity oracle and the CCNet bucket oracle (byte-identical render
# keeps the committed fingerprint)
_PPX_TERMS_CTE = """
    WITH bigrams AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
                                   i -> [ws[i], ws[i+1]])) AS bg
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents)
    ),
    db AS (
      SELECT doc_id, bg[1] AS w1, bg[2] AS w2, COUNT(*) AS n
      FROM bigrams GROUP BY 1, 2, 3
    ),
    bc AS (
      SELECT w1, w2, COUNT(*) AS c_bigram
      FROM (SELECT bg[1] AS w1, bg[2] AS w2 FROM bigrams)
      GROUP BY 1, 2
    ),
    wc AS MATERIALIZED (
      SELECT w1, SUM(c_bigram) AS c_w1 FROM bc GROUP BY w1
    ),
    v AS (
      SELECT COUNT(DISTINCT tok) AS vocab
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
    ),
    terms AS (
      SELECT db.doc_id, db.n,
             ROUND(-LN((bc.c_bigram + 1.0) / (wc.c_w1 + v.vocab)), 6) AS nll
      FROM db
      JOIN bc ON bc.w1 = db.w1 AND bc.w2 = db.w2
      JOIN wc ON wc.w1 = db.w1
      CROSS JOIN v
    )"""


@register(
    "text_perplexity_bigram",
    oracle=_PPX_TERMS_CTE
    + """
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           ROUND(SUM(n * nll), 6) AS total_nll,
           ROUND(ROUND(SUM(n * nll), 6) / SUM(n), 6) AS avg_nll
    FROM terms GROUP BY doc_id
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document negative log-likelihood under the corpus's own
    add-one-smoothed bigram LM: -ln((c(w1 w2)+1)/(c(w1·)+|V|)),
    summed and averaged per doc — the KenLM-style perplexity filter
    that ranks fluent text above boilerplate/noise, next to the
    heuristic ``text_quality_score`` (text.py).

    Scale posture: one bigram explode feeds BOTH the corpus LM counts
    and the per-doc bigram multiplicities as combinable aggregates;
    the scoring join shuffles on the (w1, w2) key — PINNED with a
    shuffle-hash hint, because the LM table is O(bigram vocabulary)
    and must NOT be broadcast at 100 TB (AQE broadcast it at sf0.1
    but not at 10×, the r9 stress drift: the tested base shape was
    not the scale shape) — and the first-word totals ride the
    already-aggregated LM table. The one transcendental (ln) is computed once
    per DISTINCT (doc, bigram) with identical operand order in both
    engines, rounded to 6dp before the per-doc sum (exact
    integer-multiplicity products). The per-doc totals therefore sit
    ON the 1e-6 grid (never halfway), so re-rounding them to 6dp is
    summation-order-proof, and the average derives from the
    ALREADY-ROUNDED total — both engines divide bit-identical
    doubles. (Rounding the sum to 4dp instead puts grid values on
    exact half-boundaries and flips the last digit — measured, not
    hypothetical.)"""
    return _doc_nll(spark, sf_dir)


def _doc_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (n_bigrams, total_nll, avg_nll) under the corpus
    add-one bigram LM — the scoring core shared by
    ``text_perplexity_bigram`` and ``ccnet_perplexity_buckets``."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    # cached: ONE explode pass feeds both the per-doc multiplicities
    # and (via re-aggregation) the corpus LM counts — Catalyst does
    # not common-subexpression two aggregates over the same Generate
    db = _doc_bigrams_cached(spark, sf_dir)
    bc = db.groupBy("w1", "w2").agg(F.sum("n").alias("c_bigram"))
    wc_w = Window.partitionBy("w1")
    lm = bc.withColumn("c_w1", F.sum("c_bigram").over(wc_w))
    vocab = (
        _tokens(docs)
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    terms = (
        db.join(lm.hint("shuffle_hash"), ["w1", "w2"])
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "n",
            F.round(
                -F.log((F.col("c_bigram") + 1.0) / (F.col("c_w1") + F.col("vocab"))),
                6,
            ).alias("nll"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(F.sum(F.col("n") * F.col("nll")), 6).alias("total_nll"),
        F.round(
            F.round(F.sum(F.col("n") * F.col("nll")), 6) / F.sum("n"), 6
        ).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------

_CCNET_HEAD = 3.375  # corpus ~p33 of avg_nll (measured at sf0.01)
_CCNET_MIDDLE = 3.40  # corpus ~p66


@register(
    "ccnet_perplexity_buckets",
    oracle=_PPX_TERMS_CTE
    + f"""
    , perdoc AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_bigrams,
             ROUND(ROUND(SUM(n * nll), 6) / SUM(n), 6) AS avg_nll
      FROM terms GROUP BY doc_id
    ),
    lab AS (
      SELECT d.source,
             CASE WHEN p.avg_nll < {_CCNET_HEAD} THEN 'head'
                  WHEN p.avg_nll < {_CCNET_MIDDLE} THEN 'middle'
                  ELSE 'tail' END AS bucket,
             p.n_bigrams
      FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
    )
    SELECT source, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS bigram_mass,
           CAST((1000000 * COUNT(*))
                // SUM(COUNT(*)) OVER (PARTITION BY source)
                AS BIGINT) AS share_ppm
    FROM lab GROUP BY source, bucket
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): every
    document scores under the corpus's own bigram LM and lands in the
    head / middle / tail bucket by fixed cutoffs ({_CCNET_HEAD} /
    {_CCNET_MIDDLE} avg-NLL — the measured corpus tertiles, so all
    three buckets are live at every sf), rolled up per source with
    bucket shares in exact integer ppm. The CCNet recipe trains on
    head+middle and drops tail; the per-source share table is the
    mixing decision input. Cutoffs compare the ALREADY-ROUNDED 6dp
    avg_nll (bit-identical cross-engine per the perplexity
    operator's determinism argument), so the bucket assignment is
    exact — no percentile machinery runs at query time.

    Scale posture: identical to ``text_perplexity_bigram`` (shared
    scoring core + cached bigram stage, shuffle-hash-pinned LM join)
    plus one doc_id join to recover the source column and a
    60-group rollup; the share window runs over the bounded
    (source × bucket) grid."""
    perdoc = _doc_nll(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source"
    )
    lab = perdoc.join(docs, "doc_id").select(
        "source",
        F.when(F.col("avg_nll") < _CCNET_HEAD, "head")
        .when(F.col("avg_nll") < _CCNET_MIDDLE, "middle")
        .otherwise("tail")
        .alias("bucket"),
        "n_bigrams",
    )
    agg = lab.groupBy("source", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("bigram_mass"),
    )
    return agg.select(
        "source",
        "bucket",
        "n_docs",
        "bigram_mass",
        F.expr(
            "CAST((1000000 * n_docs) DIV sum(n_docs)"
            " OVER (PARTITION BY source) AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Top event-type trigrams (sequential pattern mining)
# ---------------------------------------------------------------------------

_TRIGRAM_TOPK = 20


@register(
    "event_trigram_topk",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT {_TRIGRAM_TOPK}
    """,
)
def event_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavioural sequences: per-user event
    streams (ordered by ts, event_id tiebreak) slide a trigram window
    via LEAD, then global trigram counts rank top-{k}. The sequence
    half of the Markov view ``event_transition_matrix`` gives in
    pairs.

    Scale posture: the LEAD window partitions by user_id — one shuffle
    on the natural key, no global ordering. The trigram count is a
    combinable aggregate over a ≤|event_types|³ key space, and the
    final top-k compiles to TakeOrderedAndProject (no full sort).
    Deterministic ties: count desc then lexicographic trigram."""
    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(_TRIGRAM_TOPK)
    )


# ---------------------------------------------------------------------------
# Inverted index build (term -> document-frequency + capped postings)
# ---------------------------------------------------------------------------

_POSTINGS_CAP = 16
_POSTINGS_TOPK = 100


@register(
    "inverted_postings",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    g AS (
      SELECT term, COUNT(*) AS df,
             ARRAY_TO_STRING(LIST(doc_id ORDER BY doc_id)[1:{_POSTINGS_CAP}],
                             ',') AS postings
      FROM tok WHERE term <> '' GROUP BY term
    )
    SELECT term, df, postings
    FROM g
    ORDER BY df DESC, term
    LIMIT {_POSTINGS_TOPK}
    """,
)
def inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: for the {topk} highest-document-frequency
    terms, the df and the first {cap} doc ids of the posting list
    (ascending — the on-disk layout a search shard would store).

    Scale posture: the (doc, term) distinct is the only input-sized
    shuffle (keyed by term+doc). The posting cap is enforced BEFORE
    collect_list via a per-term row_number window that shares the
    term-keyed shuffle, so no unbounded array ever materializes — the
    per-term state is ≤{cap} ids regardless of how hot a term is
    (collect_list without the cap is the classic skew OOM). Top-{topk}
    compiles to TakeOrderedAndProject."""
    t = _t(spark, sf_dir, "documents")["documents"]
    tok = (
        spread(t)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = tok.withColumn("rn", F.row_number().over(w))
    g = (
        capped.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("rn") <= _POSTINGS_CAP, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )
    return g.orderBy(F.col("df").desc(), "term").limit(_POSTINGS_TOPK)


# ---------------------------------------------------------------------------
# Chi-square discriminative terms (feature selection, en vs rest)
# ---------------------------------------------------------------------------

_CHI2_TOPK = 20


@register(
    "chi2_discriminative_terms",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    cls AS (
      SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
             SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS n_ot
      FROM documents
    ),
    tc AS (
      SELECT term,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS b
      FROM tok WHERE term <> '' GROUP BY term
    )
    SELECT term, CAST(a AS BIGINT) AS df_en, CAST(b AS BIGINT) AS df_other,
           ROUND(
             CAST(n_en + n_ot AS DOUBLE)
             * POW(CAST(a AS DOUBLE) * (n_ot - b)
                   - CAST(b AS DOUBLE) * (n_en - a), 2)
             / (CAST(a + b AS DOUBLE) * (n_en + n_ot - a - b)
                * n_en * n_ot), 4) AS chi2
    FROM tc CROSS JOIN cls
    WHERE a + b > 0 AND n_en + n_ot - a - b > 0
    ORDER BY chi2 DESC, term
    LIMIT {_CHI2_TOPK}
    """,
)
def chi2_discriminative_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection: the terms whose document
    frequency most separates English from non-English docs — the
    2×2 contingency test (term presence × class) ranked by statistic,
    the classic pre-embedding vocabulary screen.

    Scale posture: per-(doc, term) presence dedups inside one
    combinable distinct, term-class counts collapse on the term key,
    and the 1-row class totals broadcast. Counts stay integer; the
    chi-square is a final scored expression with operands cast to
    double in identical order in both engines (overflow-proof at any
    corpus size, same policy as ``chi2_event_type_dow``). Top-{k}
    compiles to TakeOrderedAndProject."""
    t = _t(spark, sf_dir, "documents")["documents"]
    tok = (
        spread(t)
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    is_en = F.when(F.col("lang") == "en", 1).otherwise(0)
    cls = t.select(
        F.sum(is_en).alias("n_en"),
        F.sum(1 - is_en).alias("n_ot"),
    )
    tc = tok.groupBy("term").agg(
        F.sum(is_en).alias("a"), F.sum(1 - is_en).alias("b")
    )
    n = F.col("n_en") + F.col("n_ot")
    delta = F.col("a").cast("double") * (F.col("n_ot") - F.col("b")) - F.col(
        "b"
    ).cast("double") * (F.col("n_en") - F.col("a"))
    chi2 = (
        n.cast("double")
        * F.pow(delta, F.lit(2))
        / (
            (F.col("a") + F.col("b")).cast("double")
            * (n - F.col("a") - F.col("b"))
            * F.col("n_en")
            * F.col("n_ot")
        )
    )
    return (
        tc.crossJoin(F.broadcast(cls))
        .where(
            ((F.col("a") + F.col("b")) > 0)
            & ((n - F.col("a") - F.col("b")) > 0)
        )
        .select(
            "term",
            F.col("a").alias("df_en"),
            F.col("b").alias("df_other"),
            F.round(chi2, 4).alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), "term")
        .limit(_CHI2_TOPK)
    )


# ---------------------------------------------------------------------------
# Daily journey entry→exit paths
# ---------------------------------------------------------------------------

_PATH_TOPK = 10


@register(
    "session_entry_exit_paths",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
    ),
    paths AS (
      SELECT f.user_id, f.d, f.event_type AS entry_type,
             l.event_type AS exit_type
      FROM (SELECT * FROM ranked WHERE rn_first = 1) f
      JOIN (SELECT * FROM ranked WHERE rn_last = 1) l
        ON l.user_id = f.user_id AND l.d = f.d
    )
    SELECT entry_type, exit_type, COUNT(*) AS n_journeys
    FROM paths
    GROUP BY entry_type, exit_type
    ORDER BY n_journeys DESC, entry_type, exit_type
    LIMIT {_PATH_TOPK}
    """,
)
def session_entry_exit_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top daily-journey paths: which event type users START and END
    the day with — the entry/exit half of the path-flow (Sankey) view
    next to ``event_transition_matrix``'s step-pair half.

    Scale posture: one window pass per (user, day) partition computes
    BOTH endpoint ranks (same shuffle key, ascending + descending
    orderings share the exchange), endpoints pair row-locally, and
    path counts collapse to a ≤|event_types|² aggregate.
    Deterministic endpoints: (ts, event_id) total order. Top-{k}
    compiles to TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")["events"]
    keyed = ev.select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id", "event_type"
    )
    w_f = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    w_l = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = keyed.select(
        "user_id",
        "d",
        "event_type",
        F.row_number().over(w_f).alias("rn_first"),
        F.row_number().over(w_l).alias("rn_last"),
    )
    f = ranked.where(F.col("rn_first") == 1).select(
        "user_id", "d", F.col("event_type").alias("entry_type")
    )
    l = ranked.where(F.col("rn_last") == 1).select(
        "user_id", "d", F.col("event_type").alias("exit_type")
    )
    return (
        f.join(l, ["user_id", "d"])
        .groupBy("entry_type", "exit_type")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.col("n_journeys").desc(), "entry_type", "exit_type")
        .limit(_PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (log-log OLS in integer nano-units)
# ---------------------------------------------------------------------------

_ZIPF_TOPN = 50


@register(
    "zipf_slope_fit",
    oracle=f"""
    WITH tc AS (
      SELECT tok, COUNT(*) AS freq FROM (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
      ORDER BY freq DESC, tok LIMIT {_ZIPF_TOPN}
    ),
    xy AS (
      SELECT CAST(ROUND(LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
                               AS DOUBLE)) * 1000000000) AS HUGEINT) AS x,
             CAST(ROUND(LN(CAST(freq AS DOUBLE)) * 1000000000) AS HUGEINT) AS y
      FROM tc
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM xy
    )
    SELECT n AS n_terms,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope,
           ROUND(POW(CAST(n * sxy - sx * sy AS DOUBLE), 2)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS r2
    FROM s
    """,
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope (and R²) of log-frequency vs log-rank
    over the top-{n} corpus terms — natural corpora slope ≈ −1;
    template/synthetic text flattens or steepens it. Pairs with
    ``source_token_entropy`` as a corpus-naturalness screen.

    Scale posture: term counts are one combinable shuffle; the top-{n}
    cut is TakeOrderedAndProject; ranks and the five OLS moments then
    live on {n} rows. Cross-engine determinism: each log scales to
    integer NANO-units before summation (the ``source_token_entropy``
    policy), moments accumulate in DECIMAL/HUGEINT, and the two final
    ratios are single double expressions."""
    t = _t(spark, sf_dir, "documents")["documents"]
    tc = (
        _tokens(t)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(_ZIPF_TOPN)
    )
    w = Window.orderBy(F.col("freq").desc(), "tok")
    nano = 1_000_000_000
    xy = tc.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * nano)
        .cast("decimal(19,0)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * nano)
        .cast("decimal(19,0)")
        .alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        n.alias("n_terms"),
        F.round(num / denx, 4).alias("zipf_slope"),
        F.round(F.pow(num, F.lit(2)) / (denx * deny), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Item-item co-purchase similarity (collaborative-filtering neighbors)
# ---------------------------------------------------------------------------

_ITEM_TOPK = 3


@register(
    "item_item_cosine_topk",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    cnt AS (
      SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS co_cnt
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT pa AS item, pb AS neighbor, co_cnt FROM pairs
      UNION ALL
      SELECT pb AS item, pa AS neighbor, co_cnt FROM pairs
    ),
    scored AS (
      SELECT s.item, s.neighbor, s.co_cnt,
             CAST(CAST(s.co_cnt AS HUGEINT) * s.co_cnt * 1000000
                  // (ca.n * cb.n) AS BIGINT) AS cos2_ppm
      FROM sym s
      JOIN cnt ca ON ca.l_partkey = s.item
      JOIN cnt cb ON cb.l_partkey = s.neighbor
    )
    SELECT item, neighbor, co_cnt, cos2_ppm, rn AS sim_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY item ORDER BY cos2_ppm DESC, neighbor
             ) AS INT) AS rn
      FROM scored
    ) WHERE rn <= {_ITEM_TOPK}
    """,
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering neighbors from co-purchase
    baskets: for every part, the top-{k} parts most often bought in
    the same order, ranked by squared cosine similarity
    co² / (n_a·n_b) — the classic Amazon-style item-to-item
    recommender built purely from order co-occurrence.

    Scale posture: baskets collapse to sorted distinct-part arrays on
    ONE order-key shuffle, and pairs explode within each array —
    fanout is bounded by basket size (≤ ~13 lines per order, quadratic
    only within a basket, never across), so candidate volume is
    O(orders·basket²), not O(parts²), with no self-join. The
    (item, neighbor) aggregate is map-side combinable; per-item
    top-k is a ranking window the optimizer cuts map-side
    (WindowGroupLimit). Cross-engine determinism: the score is squared
    cosine in integer PPM via DECIMAL(38)/HUGEINT floor-division
    (co² · 1e6 overflows int64 once co ≳ 3e6), ties broken by
    neighbor key — no float, no sqrt."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # baskets as sorted distinct-part arrays: ONE shuffle on the order
    # key replaces the distinct + self-join formulation (the sorted
    # array makes pa < pb structural, and within-basket pair fanout is
    # the same bounded basket-squared)
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    cnt = baskets.select(F.explode("ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").alias("co_cnt"))
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "co_cnt"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "co_cnt"
        )
    )
    ca = cnt.select(F.col("l_partkey").alias("item"), F.col("n").alias("na"))
    cb = cnt.select(F.col("l_partkey").alias("neighbor"), F.col("n").alias("nb"))
    scored = (
        # shuffle-hash pinned, build = the per-part count table: it is
        # O(parts) and grows with the catalog, so the base-scale AQE
        # broadcast is not the plan that runs at 100 TB (it flipped at
        # the k=100 rehearsal, SCALE_STRESS_r10_k100); the pair side is
        # O(orders·basket²) ≫ counts, so counts stay the build side
        sym.join(ca.hint("shuffle_hash"), "item")
        .join(cb.hint("shuffle_hash"), "neighbor")
        .select(
            "item",
            "neighbor",
            "co_cnt",
            F.expr(
                "CAST(CAST(co_cnt AS DECIMAL(38,0)) * co_cnt * 1000000"
                " div (na * nb) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cos2_ppm").desc(), "neighbor")
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= _ITEM_TOPK)
        .select("item", "neighbor", "co_cnt", "cos2_ppm", "sim_rank")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (top-k vocab vs corpus token mass)
# ---------------------------------------------------------------------------

_COVERAGE_KS = (10, 100, 1000)


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH toks AS ({_TOKENS_SQL}),
    vocab AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ),
    tot AS (SELECT SUM(cnt) AS total_tokens FROM vocab),
    top AS (
      SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
               AS rk
      FROM vocab ORDER BY cnt DESC, tok LIMIT {max(_COVERAGE_KS)}
    ),
    ks AS (SELECT UNNEST(ARRAY{list(_COVERAGE_KS)}) AS k)
    SELECT ks.k,
           CAST(COALESCE(SUM(top.cnt), 0) AS BIGINT) AS covered_tokens,
           CAST(MIN(tot.total_tokens) AS BIGINT) AS total_tokens,
           CAST(COALESCE(SUM(CAST(top.cnt AS HUGEINT)), 0) * 1000000
                // MIN(tot.total_tokens) AS BIGINT) AS coverage_ppm
    FROM ks CROSS JOIN tot
    LEFT JOIN top ON top.rk <= ks.k
    GROUP BY ks.k
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of the corpus's total
    token mass the top-k most frequent terms cover, at k ∈ {ks} — the
    tokenizer-budget question (how big must a vocab be before OOV mass
    is negligible) answered before training one.

    Scale posture: term counts are a map-side-combinable aggregate;
    the top-k cut is an ORDER BY + LIMIT over it, which Spark compiles
    to TakeOrderedAndProject (no global sort materializes — only
    max(k) rows cross the wire); the ranking window then runs on that
    bounded 1000-row set. Total token mass is a 1-row broadcast.
    Cross-engine determinism: counts are integers, coverage leaves as
    integer PPM via HUGEINT/DECIMAL floor-division (covered · 1e6
    overflows int64 past ~9e12 tokens), rank ties break by term."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    vocab = _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total_tokens"))
    top = (
        vocab.orderBy(F.col("cnt").desc(), "tok")
        .limit(max(_COVERAGE_KS))
        .select(
            "cnt",
            F.row_number()
            .over(Window.partitionBy().orderBy(F.col("cnt").desc(), "tok"))
            .cast("bigint")
            .alias("rk"),
        )
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _COVERAGE_KS], "k bigint"
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(F.broadcast(top), F.col("rk") <= F.col("k"), "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("covered_tokens"),
            F.min("total_tokens").alias("total_tokens"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(cnt AS DECIMAL(38,0))), 0) * 1000000"
                " div MIN(total_tokens) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM (exact rational arithmetic, D = 3/4)
# ---------------------------------------------------------------------------


@register(
    "bigram_kneser_ney",
    oracle=f"""
    WITH bigrams AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
                                   i -> [ws[i], ws[i+1]])) AS bg
      FROM (SELECT STRING_SPLIT(text, ' ') AS ws FROM documents)
    ),
    bc AS (
      SELECT bg[1] AS w1, bg[2] AS w2, COUNT(*) AS c
      FROM bigrams GROUP BY 1, 2
    ),
    wincols AS (
      SELECT w1, w2, c,
             SUM(c) OVER (PARTITION BY w1) AS c1,
             COUNT(*) OVER (PARTITION BY w1) AS fw,
             COUNT(*) OVER (PARTITION BY w2) AS bw
      FROM bc
    ),
    t AS (SELECT COUNT(*) AS tt FROM bc)
    SELECT w1, w2, c,
           CAST(CAST(c AS HUGEINT) * 1000000000 // c1 AS BIGINT) AS p_mle_nano,
           CAST(((CAST(4 * c - 3 AS HUGEINT) * tt + 3 * fw * bw)
                 * 1000000000) // (CAST(4 AS HUGEINT) * c1 * tt) AS BIGINT)
             AS p_kn_nano
    FROM wincols CROSS JOIN t
    WHERE c >= {_BIGRAM_MIN_COUNT}
    """,
)
def bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM (absolute discount D = 3/4):
    P_KN(w2|w1) = (c−D)/c(w1) + D·N1+(w1,·)/c(w1) · N1+(·,w2)/T —
    the smoothing every serious n-gram LM uses (continuation counts
    give unseen-context words mass proportional to how many contexts
    they complete, not raw frequency). Emitted next to the MLE
    probability for the same bigrams (support ≥ {min}).

    Scale posture: same single explode + combinable (w1,w2) aggregate
    as ``bigram_lm_counts``; the three count functions are windows
    over the ALREADY-AGGREGATED bigram table (partitioned by w1 / w2 —
    distributed across words); the bigram-type total is a broadcast
    1-row aggregate. Cross-engine determinism: D = 3/4 keeps every
    term rational, so both probabilities are single HUGEINT/DECIMAL(38)
    integer floor-divisions to nano-units — the smoothed sum
    ((4c−3)·T + 3·N1+fw·N1+bw) / (4·c1·T) never touches a float."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    ws = F.split(F.col("text"), " ")
    grams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN"
        " transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
        " ELSE array() END"
    )
    bc = (
        spread(docs)
        .select(ws.alias("ws"))
        .select(F.explode(grams).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").alias("c"))
    )
    wincols = bc.select(
        "w1",
        "w2",
        "c",
        F.sum("c").over(Window.partitionBy("w1")).alias("c1"),
        F.count("*").over(Window.partitionBy("w1")).alias("fw"),
        F.count("*").over(Window.partitionBy("w2")).alias("bw"),
    )
    t = bc.agg(F.count("*").alias("tt"))
    return (
        wincols.join(F.broadcast(t))
        .filter(F.col("c") >= _BIGRAM_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "c",
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * 1000000000 div c1 AS BIGINT)"
            ).alias("p_mle_nano"),
            F.expr(
                "CAST((CAST(4 * c - 3 AS DECIMAL(38,0)) * tt + 3 * fw * bw)"
                " * 1000000000 div (CAST(4 AS DECIMAL(38,0)) * c1 * tt)"
                " AS BIGINT)"
            ).alias("p_kn_nano"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence-pattern matching over per-day user journeys
# ---------------------------------------------------------------------------

_SEQ_PATTERN = "v[^e]*c[^e]*p"  # view → click → purchase, no error between


@register(
    "sequence_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY 1, 2
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           COUNT(*) AS n_journeys,
           CAST(SUM(CASE WHEN REGEXP_MATCHES(seq, '{_SEQ_PATTERN}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(CAST(SUM(CASE WHEN REGEXP_MATCHES(seq, '{_SEQ_PATTERN}')
                              THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                // COUNT(*) AS BIGINT) AS match_ppm
    FROM seqs GROUP BY d
    """,
)
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-style) over per-day
    user journeys: each user-day's events collapse to an ordered
    initial-letter string, and the pattern ``view → click → purchase
    with no error in between`` is matched as the regex
    ``{pattern}`` — regular-expression-over-event-sequences is the
    funnel generalization (optional steps, exclusions, repetitions)
    that fixed step-lists cannot express.

    Scale posture: one (user, day)-keyed aggregate builds the
    journey strings — partitioned by user, bounded by per-user-day
    activity, no self-join, no window; the daily rollup is a second
    combinable aggregate over journeys. Cross-engine determinism:
    journey order is pinned by (ts, event_id) on both sides (struct
    sort here, ORDER BY inside STRING_AGG there); the five event
    types have distinct initials; match share is integer PPM."""
    ev = _t(spark, sf_dir, "events")["events"]
    seqs = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id,"
            " substring(event_type, 1, 1) AS i))), x -> x.i), '')"
        ).alias("seq")
    )
    matched = F.when(F.col("seq").rlike(_SEQ_PATTERN), 1).otherwise(0)
    return seqs.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_journeys"),
        F.sum(matched).alias("n_matched"),
        F.expr(
            f"CAST(CAST(SUM(CASE WHEN seq RLIKE '{_SEQ_PATTERN}' THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("match_ppm"),
    )


# ---------------------------------------------------------------------------
# BPE trainer step: weighted adjacent-symbol-pair merge candidates
# ---------------------------------------------------------------------------

_BPE_TOPN = 8


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH wc AS MATERIALIZED (
      SELECT tok, COUNT(*) AS cnt FROM ({_TOKENS_SQL}) GROUP BY tok
    ),
    pairs AS (
      SELECT SUBSTR(tok, i, 1) AS left_sym, SUBSTR(tok, i + 1, 1) AS right_sym,
             cnt
      FROM wc, UNNEST(RANGE(1, LEN(tok))) AS t(i)
      WHERE LEN(tok) >= 2
    ),
    pc AS MATERIALIZED (
      SELECT left_sym, right_sym, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM pairs GROUP BY 1, 2
    )
    SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY pair_count DESC, left_sym, right_sym
           ) AS INT) AS merge_rank,
           left_sym, right_sym, left_sym || right_sym AS merged, pair_count
    FROM pc
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT {_BPE_TOPN}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-trainer step: the top-{n} adjacent character-pair merge
    candidates by corpus-weighted frequency — the inner loop of
    byte-pair-encoding tokenizer training (each training iteration
    merges the top pair and recounts; this emits the ranked candidate
    table that step reads).

    Scale posture: pair extraction runs over the WORD-FREQUENCY
    aggregate (vocab-sized, not corpus-sized — a 100 TB corpus has a
    bounded distinct-word set), weighted by word counts, so the
    explode fanout is word length over vocab rows; pair counts are
    map-side combinable and the top-{n} cut is
    TakeOrderedAndProject. Cross-engine determinism: counts are
    integers; rank ties break by the pair itself."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    pairs = (
        wc.where(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(tok) - 1),"
                    " i -> struct(substring(tok, i, 1) AS left_sym,"
                    " substring(tok, i + 1, 1) AS right_sym))"
                )
            ).alias("p"),
            "cnt",
        )
        .select("p.left_sym", "p.right_sym", "cnt")
    )
    pc = pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("cnt").alias("pair_count")
    )
    top = pc.orderBy(
        F.col("pair_count").desc(), "left_sym", "right_sym"
    ).limit(_BPE_TOPN)
    return top.select(
        F.row_number()
        .over(
            Window.partitionBy().orderBy(
                F.col("pair_count").desc(), "left_sym", "right_sym"
            )
        )
        .alias("merge_rank"),
        "left_sym",
        "right_sym",
        F.concat("left_sym", "right_sym").alias("merged"),
        "pair_count",
    )


# ---------------------------------------------------------------------------
# BPE trainer LOOP: K merges to a fixed point (not just one step)
# ---------------------------------------------------------------------------

_BPE_TRAIN_STEPS = 8
_BPE_SEP = "\x1f"  # symbol delimiter: tokens are whitespace-split, so
# the unit-separator control char can never occur inside a symbol


def _bpe_trained_oracle() -> str:
    """Unrolled K-step trainer as a CTE chain (the holt_winters
    bounded-recursion precedent, unrolled because each step needs an
    argmax over the whole working vocabulary, which a recursive CTE
    term cannot aggregate): step i extracts weighted adjacent-symbol
    pairs from representation w{{i-1}}, picks the single best pair
    (count DESC, then lexicographic), and applies it via REPLACE over
    the ␟-wrapped symbol string — '␟A␟␟B␟' → '␟AB␟' is exactly the
    greedy leftmost non-overlapping merge of BPE training, because
    REPLACE resumes scanning after each replacement."""
    sep = "CHR(31)"
    sql = [
        f"""
    WITH wc AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({_TOKENS_SQL}) GROUP BY tok
    ),
    w0 AS (
      SELECT REGEXP_REPLACE(tok, '(.)', {sep} || '\\1' || {sep}, 'g') AS w,
             cnt
      FROM wc
    )"""
    ]
    for i in range(1, _BPE_TRAIN_STEPS + 1):
        sql.append(
            f""",
    p{i} AS (
      SELECT list_extract(syms, j) AS left_sym,
             list_extract(syms, j + 1) AS right_sym,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT STR_SPLIT(TRIM(w, {sep}), {sep} || {sep}) AS syms, cnt
            FROM w{i - 1}),
           UNNEST(RANGE(1, LEN(syms))) AS t(j)
      GROUP BY 1, 2
    ),
    b{i} AS (
      SELECT left_sym, right_sym, left_sym || right_sym AS merged,
             pair_count
      FROM p{i} ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
    ),
    w{i} AS (
      SELECT REPLACE(w, {sep} || b.left_sym || {sep} || {sep}
                        || b.right_sym || {sep},
                     {sep} || b.merged || {sep}) AS w, cnt
      FROM w{i - 1}, b{i} b
    )"""
        )
    union = "\n      UNION ALL\n".join(
        f"      SELECT CAST({i} AS INTEGER) AS step, left_sym, right_sym,"
        f" merged, pair_count FROM b{i}"
        for i in range(1, _BPE_TRAIN_STEPS + 1)
    )
    sql.append(f"\n{union}")
    return "".join(sql)


@register("bpe_trained_merges", oracle=_bpe_trained_oracle())
def bpe_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINING LOOP (VERDICT r13 next-round #5) — K =
    {_BPE_TRAIN_STEPS} merge iterations to a fixed point, not just the
    one candidate step ``bpe_merge_candidates`` emits: every
    iteration counts corpus-weighted adjacent-symbol pairs over the
    current vocabulary representation, merges THE top pair (ties
    break lexicographically) into a new symbol everywhere it occurs
    (greedy leftmost non-overlapping — the BPE application rule), and
    recounts. The output is the ordered merge table a tokenizer ships:
    (step, left, right, merged, pair_count) — the missing first stage
    of the tokenizer pipeline every fertility/coverage query
    downstream assumes frozen.

    Representation trick shared with the oracle: each word's symbol
    sequence is a ␟-wrapped string (``␟h␟␟e␟…``); applying merge
    (A, B) is the literal string REPLACE of ``␟A␟␟B␟`` with
    ``␟AB␟`` — byte-identical greedy semantics in Spark and DuckDB,
    JVM-codegen string ops, no UDF.

    Scale posture: the loop is a BOUNDED driver recursion (the
    holt_winters precedent) — K jobs, each O(vocab): pair explode
    over the word-frequency aggregate (vocab-sized, never
    corpus-sized), map-side-combinable pair counts, and a ONE-ROW
    collect per step (the argmax pair; the only driver-side data).
    The wrapped vocab is cached once; iteration i replays i-1 cheap
    string replaces over it. At 100 TB the corpus-sized work happens
    exactly once (the word count); all K iterations ride the
    vocab-bounded aggregate.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    return spark.createDataFrame(
        _bpe_merges_cached(spark, sf_dir),
        "step int, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )


_BPE_CACHE: dict = {}

from rs_streamloader_spark.session import register_stage_cache as _rsc_bpe  # noqa: E402

_rsc_bpe(_BPE_CACHE)  # clear_stage_cache() must reset the trainer memo too


def _bpe_merges_cached(spark: SparkSession, sf_dir: str) -> list:
    """Memoized trainer run per (application, sf_dir): both registered
    BPE queries consume the same merge table, so a catalog sweep
    trains once instead of once per consumer (the _WP_CACHE /
    _UNI_CACHE precedent — the unit is a driver-side list, not a
    cacheable DataFrame). r15 opt: bpe_trained_fertility previously
    re-ran the full K-step loop (K corpus-independent jobs + the
    corpus-sized word count) that bpe_trained_merges had just run.

    Staleness contract (ADVICE r15): the key is (applicationId,
    sf_dir) — NOT a data fingerprint — so regenerating the data under
    the same sf_dir within one session serves the pre-regeneration
    merges, exactly like _WP_CACHE/_UNI_CACHE and the stage cache.
    In-session regeneration must call ``clear_stage_cache()`` (as
    tools/scale_stress.py does), which resets this memo too."""
    k = (spark.sparkContext.applicationId, sf_dir)
    if k not in _BPE_CACHE:
        _BPE_CACHE[k] = _bpe_train_merges(spark, sf_dir)
    return _BPE_CACHE[k]


def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> list:
    """Run the K-step trainer loop and return the merge rows
    (step, left, right, merged, pair_count) — shared by
    ``bpe_trained_merges`` (the table itself) and
    ``bpe_trained_fertility`` (which re-applies them)."""
    sep = _BPE_SEP
    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    wrapped = wc.select(
        F.regexp_replace("tok", "(.)", f"{sep}$1{sep}").alias("w"), "cnt"
    ).cache()
    try:
        merges: list[tuple] = []
        cur = wrapped
        for step in range(1, _BPE_TRAIN_STEPS + 1):
            top = (
                _bpe_pair_counts(cur, sep)
                .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
                .limit(1)
                .collect()
            )
            if not top:  # vocabulary ran out of pairs before step K
                break
            left, right, cnt = (
                top[0]["left_sym"],
                top[0]["right_sym"],
                top[0]["pair_count"],
            )
            merges.append((step, left, right, left + right, cnt))
            cur = cur.select(
                F.replace(
                    F.col("w"),
                    F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
                    F.lit(f"{sep}{left}{right}{sep}"),
                ).alias("w"),
                "cnt",
            )
        return merges
    finally:
        wrapped.unpersist()


def _bpe_fertility_oracle() -> str:
    """The trainer chain extended with tok carried through every
    representation step, ending in per-source fertility under the
    trained vocab (symbols per word occurrence)."""
    sep = "CHR(31)"
    sql = [
        f"""
    WITH wc AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({_TOKENS_SQL}) GROUP BY tok
    ),
    w0 AS (
      SELECT tok,
             REGEXP_REPLACE(tok, '(.)', {sep} || '\\1' || {sep}, 'g') AS w,
             cnt
      FROM wc
    )"""
    ]
    for i in range(1, _BPE_TRAIN_STEPS + 1):
        sql.append(
            f""",
    p{i} AS (
      SELECT list_extract(syms, j) AS left_sym,
             list_extract(syms, j + 1) AS right_sym,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT STR_SPLIT(TRIM(w, {sep}), {sep} || {sep}) AS syms, cnt
            FROM w{i - 1}),
           UNNEST(RANGE(1, LEN(syms))) AS t(j)
      GROUP BY 1, 2
    ),
    b{i} AS (
      SELECT left_sym, right_sym, left_sym || right_sym AS merged
      FROM p{i} ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
    ),
    w{i} AS (
      SELECT tok,
             REPLACE(w, {sep} || b.left_sym || {sep} || {sep}
                        || b.right_sym || {sep},
                     {sep} || b.merged || {sep}) AS w, cnt
      FROM w{i - 1}, b{i} b
    )"""
        )
    k = _BPE_TRAIN_STEPS
    sql.append(
        f""",
    syms AS (
      SELECT tok,
             LEN(STR_SPLIT(TRIM(w, {sep}), {sep} || {sep})) AS ns
      FROM w{k}
    ),
    st AS (
      SELECT source, tok, COUNT(*) AS cnt FROM (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY 1, 2
    )
    SELECT st.source,
           CAST(SUM(st.cnt) AS BIGINT) AS n_words,
           CAST(SUM(st.cnt * syms.ns) AS BIGINT) AS n_symbols,
           ROUND(CAST(SUM(st.cnt * syms.ns) AS DOUBLE) / SUM(st.cnt), 6)
             AS fertility
    FROM st JOIN syms ON syms.tok = st.tok
    GROUP BY st.source"""
    )
    return "".join(sql)


@register("bpe_trained_fertility", oracle=_bpe_fertility_oracle())
def bpe_trained_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility (symbols per word occurrence) of each SOURCE under
    the trained K-merge vocabulary — the number the tokenizer loop
    exists to drive down, now measured per provenance feed: a source
    whose fertility stays near raw character count is one the trained
    merges don't cover (out-of-domain spelling, markup, another
    language) and will cost proportionally more sequence length at
    training time. Composes the two pipeline stages end-to-end:
    ``bpe_trained_merges``'s loop produces the merge list, this
    operator re-applies all K merges to the vocabulary (chained
    literal REPLACEs over the wrapped representation — same greedy
    semantics) and joins symbol counts back to per-source word
    occurrences.

    Scale posture: the training loop's K vocab-bounded jobs plus ONE
    (source, token) aggregate joined to the vocab-sized symbol-count
    table — the corpus is scanned twice total (global word counts,
    per-source word counts), everything else is vocab-bounded.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    sep = _BPE_SEP
    merges = _bpe_merges_cached(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    w = F.regexp_replace("tok", "(.)", f"{sep}$1{sep}")
    for _step, left, right, _merged, _cnt in merges:
        w = F.replace(
            w,
            F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
            F.lit(f"{sep}{left}{right}{sep}"),
        )
    # size of the trained symbol sequence per vocab word
    syms = wc.select(
        "tok",
        F.size(
            F.split(F.trim(w, F.lit(sep)), sep + sep)
        ).alias("ns"),
    )
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    return st.join(syms, "tok").groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.sum(F.expr("cnt * ns")).cast("bigint").alias("n_symbols"),
        F.round(
            F.sum(F.expr("cnt * ns")).cast("double") / F.sum("cnt"), 6
        ).alias("fertility"),
    )


def _bpe_pair_counts(wdf: DataFrame, sep: str) -> DataFrame:
    """Weighted adjacent-symbol pair counts over a wrapped-string
    vocabulary representation — one explode over vocab rows collapsing
    straight into a combinable (left, right) aggregate."""
    syms = F.split(F.expr("trim(BOTH '\x1f' FROM w)"), sep + sep)
    return (
        wdf.select(syms.alias("syms"), "cnt")
        .where(F.size("syms") >= 2)  # sequence(1, 0) would descend
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " j -> struct(element_at(syms, j) AS left_sym,"
                    " element_at(syms, j + 1) AS right_sym))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("cnt").alias("pair_count"))
    )


# ---------------------------------------------------------------------------
# WordPiece trainer LOOP: likelihood-scored merges with ## continuation
# prefixes — the third tokenizer-trainer family (BPE picks max pair
# COUNT; WordPiece picks max count(ab)/(count(a)*count(b)))
# ---------------------------------------------------------------------------

_WP_TRAIN_STEPS = 6
# 12-digit fixed-point likelihood score: the argmax compares
#   floor(pair_count * 10^12 / (left_count * right_count))
# as an EXACT integer on both engines (DECIMAL(38,0) in Spark,
# HUGEINT in DuckDB) — no float enters the training loop, so the
# selection is bit-deterministic cross-engine; ties break
# lexicographically on (left, right).
_WP_SCORE_SCALE = 1_000_000_000_000


def _wp_wrap() -> Column:
    """Initial WordPiece representation of a vocab word: first char
    plain, every subsequent char as a ``##``-prefixed continuation
    symbol, each symbol ␟-wrapped (the BPE REPLACE-merge trick)."""
    sep = _BPE_SEP
    return F.concat(
        F.lit(sep),
        F.substring("tok", 1, 1),
        F.lit(sep),
        F.regexp_replace(
            F.expr("substring(tok, 2)"), "(.)", f"{sep}##$1{sep}"
        ),
    )


def _wp_merge_symbol(left: str, right: str) -> str:
    """WordPiece merged symbol: the right side is never word-initial,
    so it always carries the ``##`` prefix, which the merge absorbs
    into the left side's prefix (a + ##b = ab, ##a + ##b = ##ab)."""
    assert right.startswith("##"), right
    return left + right[2:]


def _wp_train_merges(spark: SparkSession, sf_dir: str) -> list:
    """Run the K-step WordPiece trainer and return the merge rows
    (step, left, right, merged, pair_count, score_scaled) — shared by
    ``wordpiece_trained_merges`` and ``wordpiece_trained_fertility``
    through the trainer memo."""
    sep = _BPE_SEP
    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = (
        _tokens(docs)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    wrapped = wc.select(_wp_wrap().alias("w"), "cnt").cache()
    try:
        merges: list[tuple] = []
        cur = wrapped
        # per step, ONE tagged aggregate job replaces the previous
        # four (symbol agg + two broadcast builds + join/sort/collect):
        # symbol counts (tag 0) and adjacent-pair counts (tag 1) come
        # out of a single explode + map-side-combinable SUM, and the
        # argmax runs driver-side over the collected aggregate. The
        # collect stays BOUNDED BY CONSTRUCTION, corpus-independent:
        # rows <= |symbol alphabet| + |distinct adjacent symbol
        # pairs| <= A + A^2 with A <= initial charset + K merges —
        # the same boundedness the previous 1-row argmax relied on
        # (the sorted pair aggregate it collected from was this very
        # table). The likelihood score is the identical exact integer
        # floor-division (Python int // == Spark DECIMAL DIV on
        # positives) and the (score DESC, left, right) tiebreak is the
        # identical binary string order (UTF-8 byte order == code
        # point order), so the emitted merge list is byte-equal.
        for step in range(1, _WP_TRAIN_STEPS + 1):
            syms = cur.select(
                F.split(F.trim(F.col("w"), F.lit(sep)), sep + sep).alias(
                    "syms"
                ),
                "cnt",
            )
            tagged = syms.select(
                F.explode(
                    F.expr(
                        "concat("
                        " transform(syms, s ->"
                        "   struct(0 AS tag, s AS l, '' AS r)),"
                        " CASE WHEN size(syms) >= 2 THEN"
                        "   transform(sequence(1, size(syms) - 1), j ->"
                        "     struct(1 AS tag, element_at(syms, j) AS l,"
                        "            element_at(syms, j + 1) AS r))"
                        " ELSE slice(transform(syms, s ->"
                        "   struct(1 AS tag, s AS l, s AS r)), 1, 0)"
                        " END)"
                    )
                ).alias("e"),
                "cnt",
            )
            rows = (
                tagged.groupBy("e.tag", "e.l", "e.r")
                .agg(F.sum("cnt").alias("c"))
                .collect()
            )
            ucnt = {r["l"]: r["c"] for r in rows if r["tag"] == 0}
            cands = [r for r in rows if r["tag"] == 1]
            if not cands:  # vocabulary ran out of pairs before step K
                break
            best_key = None
            best = None
            for r in cands:
                score = (r["c"] * _WP_SCORE_SCALE) // (
                    ucnt[r["l"]] * ucnt[r["r"]]
                )
                key = (-score, r["l"], r["r"])
                if best_key is None or key < best_key:
                    best_key = key
                    best = (r["l"], r["r"], r["c"], score)
            left, right, pair_count, score_scaled = best
            merged = _wp_merge_symbol(left, right)
            merges.append(
                (step, left, right, merged, pair_count, score_scaled)
            )
            cur = cur.select(
                F.replace(
                    F.col("w"),
                    F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
                    F.lit(f"{sep}{merged}{sep}"),
                ).alias("w"),
                "cnt",
            )
        return merges
    finally:
        wrapped.unpersist()


_WP_CACHE: dict = {}

from rs_streamloader_spark.session import register_stage_cache as _rsc_wp  # noqa: E402

_rsc_wp(_WP_CACHE)  # clear_stage_cache() must reset the trainer memo too


def _wp_merges_cached(spark: SparkSession, sf_dir: str) -> list:
    """Memoized merge list per (application, sf_dir): both registered
    queries replay the same trained table, so a catalog sweep trains
    once (the _UNI_CACHE precedent — the unit is a driver-side list,
    not a cacheable plan)."""
    k = (spark.sparkContext.applicationId, sf_dir, "wp")
    if k not in _WP_CACHE:
        _WP_CACHE[k] = _wp_train_merges(spark, sf_dir)
    return _WP_CACHE[k]


def _wp_oracle_chain(carry_tok: bool) -> str:
    """Unrolled K-step trainer CTE chain (the bpe_trained precedent —
    unrolled because each step's argmax aggregates the whole working
    vocabulary): step i splits representation w{i-1}, counts weighted
    unigram symbols AND adjacent pairs, scores every pair with the
    exact fixed-point likelihood, picks one (score DESC, then
    lexicographic), and applies it via the ␟-REPLACE. MATERIALIZED
    per-step frames keep DuckDB from re-deriving the chain per
    reference (the unigram-trainer lesson)."""
    sep = "CHR(31)"
    tok_col = "tok, " if carry_tok else ""
    sql = [
        f"""
    WITH wc AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({_TOKENS_SQL}) WHERE tok <> '' GROUP BY tok
    ),
    w0 AS (
      SELECT {tok_col}{sep} || SUBSTR(tok, 1, 1) || {sep} ||
             REGEXP_REPLACE(SUBSTR(tok, 2), '(.)',
                            {sep} || '##\\1' || {sep}, 'g') AS w,
             cnt
      FROM wc
    )"""
    ]
    for i in range(1, _WP_TRAIN_STEPS + 1):
        sql.append(
            f""",
    s{i} AS MATERIALIZED (
      SELECT STR_SPLIT(TRIM(w, {sep}), {sep} || {sep}) AS syms, cnt
      FROM w{i - 1}
    ),
    u{i} AS MATERIALIZED (
      SELECT s, CAST(SUM(cnt) AS BIGINT) AS ucnt
      FROM (SELECT UNNEST(syms) AS s, cnt FROM s{i}) GROUP BY s
    ),
    p{i} AS (
      SELECT list_extract(syms, j) AS left_sym,
             list_extract(syms, j + 1) AS right_sym,
             CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM s{i}, UNNEST(RANGE(1, LEN(syms))) AS t(j)
      GROUP BY 1, 2
    ),
    b{i} AS (
      SELECT left_sym, right_sym,
             left_sym || SUBSTR(right_sym, 3) AS merged,
             pair_count,
             CAST(CAST(pair_count AS HUGEINT) * {_WP_SCORE_SCALE}
                  // (CAST(ul.ucnt AS HUGEINT) * ur.ucnt)
                  AS BIGINT) AS score_scaled
      FROM p{i}
      JOIN u{i} ul ON ul.s = p{i}.left_sym
      JOIN u{i} ur ON ur.s = p{i}.right_sym
      ORDER BY score_scaled DESC, left_sym, right_sym LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT {tok_col}REPLACE(w, {sep} || b.left_sym || {sep} || {sep}
                        || b.right_sym || {sep},
                     {sep} || b.merged || {sep}) AS w, cnt
      FROM w{i - 1}, b{i} b
    )"""
        )
    return "".join(sql)


def _wp_trained_oracle() -> str:
    union = "\n      UNION ALL\n".join(
        f"      SELECT CAST({i} AS INTEGER) AS step, left_sym, right_sym,"
        f" merged, pair_count, score_scaled FROM b{i}"
        for i in range(1, _WP_TRAIN_STEPS + 1)
    )
    return _wp_oracle_chain(carry_tok=False) + "\n" + union


@register("wordpiece_trained_merges", oracle=_wp_trained_oracle())
def wordpiece_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece TRAINING LOOP — K = {_WP_TRAIN_STEPS} merge
    iterations with the LIKELIHOOD selection rule that distinguishes
    WordPiece (Schuster & Nakajima 2012 / BERT) from BPE: each step
    scores every adjacent symbol pair by count(ab) / (count(a) ·
    count(b)) — the language-model likelihood gain of the merge — and
    merges the top-scoring pair, carrying real ``##`` continuation
    prefixes (a + ##b = ab, ##a + ##b = ##ab). Rare-but-exclusive
    pairs beat frequent-but-promiscuous ones, which is exactly the
    behavioral difference from ``bpe_trained_merges`` on the same
    corpus (asserted in tests/test_statistics_sanity.py).

    No float enters the loop: the score is the exact integer
    floor(pair·10^12 / (left·right)) — DECIMAL(38,0) in Spark,
    HUGEINT in DuckDB — so the argmax is bit-deterministic
    cross-engine; ties break lexicographically.

    Scale posture: the bpe_trained posture — K bounded driver
    iterations, each O(vocab): ONE tagged explode + map-side
    combinable SUM produces the symbol (tag 0) and adjacent-pair
    (tag 1) aggregates together, and the driver argmax runs over that
    collected aggregate — bounded by construction at
    |alphabet| + |alphabet|² rows with alphabet <= initial charset +
    K merges, corpus-independent. The corpus-sized work (word count)
    happens exactly once.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    return spark.createDataFrame(
        _wp_merges_cached(spark, sf_dir),
        "step int, left_sym string, right_sym string, merged string,"
        " pair_count bigint, score_scaled bigint",
    )


def _wp_fertility_oracle() -> str:
    k = _WP_TRAIN_STEPS
    return (
        _wp_oracle_chain(carry_tok=True)
        + f""",
    syms_f AS (
      SELECT tok,
             LEN(STR_SPLIT(TRIM(w, CHR(31)), CHR(31) || CHR(31))) AS ns
      FROM w{k}
    ),
    st AS (
      SELECT source, tok, COUNT(*) AS cnt FROM (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY 1, 2
    )
    SELECT st.source,
           CAST(SUM(st.cnt) AS BIGINT) AS n_words,
           CAST(SUM(st.cnt * syms_f.ns) AS BIGINT) AS n_symbols,
           ROUND(CAST(SUM(st.cnt * syms_f.ns) AS DOUBLE) / SUM(st.cnt), 6)
             AS fertility
    FROM st JOIN syms_f ON syms_f.tok = st.tok
    GROUP BY st.source"""
    )


@register("wordpiece_trained_fertility", oracle=_wp_fertility_oracle())
def wordpiece_trained_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source fertility under the trained WordPiece vocabulary —
    the same readout as ``bpe_trained_fertility`` but under the
    likelihood-selected merges, so the two tables side-by-side show
    what the selection rule buys per provenance feed (WordPiece
    spends its merge budget on exclusive pairs; BPE on frequent
    ones). Re-applies all K trained merges to the wrapped vocabulary
    (chained literal REPLACEs — same greedy semantics) and joins
    symbol counts back to per-source word occurrences.

    Scale posture: the trainer memo means a catalog sweep trains
    once; this query then adds ONE (source, token) corpus aggregate
    joined to the vocab-sized symbol-count table."""
    sep = _BPE_SEP
    merges = _wp_merges_cached(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = (
        _tokens(docs)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = _wp_wrap()
    for _step, left, right, merged, _cnt, _score in merges:
        w = F.replace(
            w,
            F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
            F.lit(f"{sep}{merged}{sep}"),
        )
    syms = wc.select(
        "tok",
        F.size(F.split(F.trim(w, F.lit(sep)), sep + sep)).alias("ns"),
    )
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    return st.join(syms, "tok").groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.sum(F.expr("cnt * ns")).cast("bigint").alias("n_symbols"),
        F.round(
            F.sum(F.expr("cnt * ns")).cast("double") / F.sum("cnt"), 6
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Co-purchase graph connected components (category discovery)
# ---------------------------------------------------------------------------

_COPURCHASE_MIN_CO = 3


@register(
    "copurchase_components",
    oracle=f"""
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_COPURCHASE_MIN_CO}
    ),
    edges AS (
      SELECT pa AS u, pb AS v FROM pairs
      UNION ALL
      SELECT pb, pa FROM pairs
    ),
    reach(u, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
    ),
    labeled AS (
      SELECT u AS part_id, MIN(label) AS component_id FROM reach GROUP BY u
    )
    SELECT part_id, component_id,
           COUNT(*) OVER (PARTITION BY component_id) AS component_size
    FROM labeled
    """,
)
def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category discovery: connected components over the co-purchase
    graph (parts bought together in ≥ {k} orders) — the unsupervised
    product-grouping a recommender bootstraps from, sharing the
    ``dedup_cluster`` propagation machinery on a completely different
    graph (basket co-occurrence instead of text similarity).

    Scale posture: edge generation explodes pairs within sorted
    basket arrays on one order-key shuffle (the
    ``item_item_cosine_topk`` pattern) with a support threshold
    that keeps the graph sparse; components come from fused 2-hop
    min-label propagation with one tiny driver sync per step and a
    loud failure on non-convergence; the size column is a window over
    the component-keyed LABEL table, not input rows. The oracle
    recomputes the same components with a recursive CTE."""
    from rs_streamloader_spark.operators.dedup import propagate_min_labels

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= _COPURCHASE_MIN_CO)
        .select("pa", "pb")
    )
    edges = (
        pairs.select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .unionByName(pairs.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
        .cache()
    )
    labels = propagate_min_labels(edges)
    w = Window.partitionBy("component_id")
    return (
        labels.select(
            F.col("u").alias("part_id"), F.col("label").alias("component_id")
        )
        .withColumn("component_size", F.count("*").over(w))
    )


# ---------------------------------------------------------------------------
# Token-budget source selection (greedy quality-first curation plan)
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 20_000


@register(
    "token_budget_selection",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
             -- mean doc length in milli-tokens as the quality proxy
             CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS HUGEINT) * 1000)
                  // COUNT(*) AS BIGINT) AS mean_len_milli
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT *,
             CAST(SUM(n_tokens) OVER (ORDER BY mean_len_milli DESC, source
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM per_source
    )
    SELECT source, n_tokens, mean_len_milli, cum_tokens,
           cum_tokens <= {_TOKEN_BUDGET} AS selected
    FROM ranked
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation plan: sources rank by a quality proxy
    (mean document length) and are greedily admitted until the
    cumulative token budget ({b} tokens) is spent — the "which domains
    make the cut for this training run" planning table every
    data-mixing decision starts from.

    Scale posture: the corpus collapses to one row per source before
    any ordering (the cumulative window runs over the bounded source
    list). Cross-engine determinism: token counts are integers, the
    quality proxy is an integer floor-division in milli-units, rank
    ties break by source name, and selection is an integer cumulative
    threshold."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.expr(
            "CAST(SUM(CAST(size(split(text, ' ')) AS DECIMAL(38,0))"
            " * 1000) div COUNT(*) AS BIGINT)"
        ).alias("mean_len_milli"),
    )
    w = (
        Window.partitionBy()
        .orderBy(F.col("mean_len_milli").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = per_source.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return ranked.select(
        "source",
        "n_tokens",
        "mean_len_milli",
        "cum_tokens",
        (F.col("cum_tokens") <= _TOKEN_BUDGET).alias("selected"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-bigram importance resampling)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256  # hashed-feature dimensionality (DSIR uses 10k at web scale)
_DSIR_TARGET = "src0"  # the "target distribution" corpus slice


def _dsir_hexwalk_sql(col: str, n_hex: int = 4) -> str:
    """DuckDB STRPOS walk over the first ``n_hex`` md5 hex chars of
    ``col`` — generated from the same constant as the Spark
    ``conv(substring(md5, 1, 4), 16, 10)`` so the engines cannot
    desynchronize (the fuzzy_name_match lesson)."""
    expr = "0"
    for i in range(1, n_hex + 1):
        expr = (
            f"({expr} * 16 + STRPOS('0123456789abcdef',"
            f" SUBSTR({col}, {i}, 1)) - 1)"
        )
    return expr


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH bigrams AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
                                   i -> [ws[i], ws[i+1]])) AS bg
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents)
    ),
    fx AS (
      SELECT doc_id, MD5(bg[1] || ' ' || bg[2]) AS h FROM bigrams
    ),
    feats AS (
      SELECT doc_id, {_dsir_hexwalk_sql('h')} % {_DSIR_BUCKETS} AS bkt,
             COUNT(*) AS cnt
      FROM fx GROUP BY 1, 2
    ),
    fsrc AS (
      SELECT f.doc_id, d.source, f.bkt, f.cnt
      FROM feats f JOIN documents d ON d.doc_id = f.doc_id
    ),
    buckets AS (
      SELECT bkt,
             CAST(SUM(cnt) AS BIGINT) AS c_r,
             CAST(SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN cnt
                           ELSE 0 END) AS BIGINT) AS c_t
      FROM fsrc GROUP BY bkt
    ),
    tots AS (
      SELECT CAST(SUM(c_r) AS BIGINT) AS r_tot,
             CAST(SUM(c_t) AS BIGINT) AS t_tot
      FROM buckets
    ),
    lm AS (
      SELECT bkt,
             CAST(ROUND(LN((CAST(c_t + 1 AS DOUBLE)
                            * CAST(r_tot + {_DSIR_BUCKETS} AS DOUBLE))
                           / (CAST(t_tot + {_DSIR_BUCKETS} AS DOUBLE)
                              * CAST(c_r + 1 AS DOUBLE)))
                        * 1000000000) AS BIGINT) AS lam_nano
      FROM buckets CROSS JOIN tots
    )
    SELECT f.doc_id, f.source,
           CAST(SUM(f.cnt) AS BIGINT) AS n_feats,
           CAST(SUM(f.cnt * lm.lam_nano) AS BIGINT) AS logw_nano,
           CAST(SUM(f.cnt * lm.lam_nano) AS BIGINT) > 0 AS selected
    FROM fsrc f JOIN lm ON lm.bkt = f.bkt
    GROUP BY 1, 2
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): per-document importance weight
    log(p_target/p_raw) under two add-one-smoothed multinomials over
    {_DSIR_BUCKETS} HASHED BIGRAM buckets — the published recipe for
    selecting web-scale pretraining data that "looks like" a small
    high-quality target corpus (here the '{_DSIR_TARGET}' slice), with
    ``selected = logw > 0`` as the threshold rule (more target-like
    than raw-like). The hashing is what makes the method 100 TB-shaped:
    the LM state is a FIXED {_DSIR_BUCKETS}-row table regardless of
    corpus size, so scoring is one broadcast join — no vocabulary-sized
    shuffle, and no global sort anywhere (a top-k selection would need
    one; the threshold rule is the scale-honest variant).

    Scale posture: rides the SAME cached bigram stage as
    ``text_perplexity_bigram`` (one explode pass for the family); the
    doc→source join is pinned shuffle_hash (documents is O(corpus) —
    AQE would broadcast it at bench scale only, the r10-k100 flip
    class); per-(doc, bucket) counts are consumed twice (bucket LM +
    scoring) so the stage is localCheckpointed. Cross-engine
    determinism: bucket = conv(md5 hex, 16, 10) == the oracle's
    generated STRPOS walk; ONE transcendental per bucket with
    identical all-double operand order, rounded to integer nano-units
    BEFORE the per-doc sum (exact BIGINT products; |λ| ≤ ~21 nats ×
    1e9 × doc bigram count ≪ 2^63).

    Reference surface: none (novel extension, SURVEY.md §2.5 curation
    family)."""
    db = _doc_bigrams_cached(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")["documents"].select("doc_id", "source")
    bkt = (
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", "w1", "w2")), 1, 4), 16, 10
        ).cast("bigint")
        % _DSIR_BUCKETS
    )
    feats = (
        db.withColumn("bkt", bkt)
        .groupBy("doc_id", "bkt")
        .agg(F.sum("n").alias("cnt"))
        .join(docs.hint("shuffle_hash"), "doc_id")
        # consumed twice (bucket LM + scoring join) — checkpoint so the
        # bigram re-aggregation and the doc join run once
        .localCheckpoint()
    )
    buckets = feats.groupBy("bkt").agg(
        F.sum("cnt").alias("c_r"),
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET, F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("c_t"),
    )
    tots = buckets.agg(
        F.sum("c_r").alias("r_tot"), F.sum("c_t").alias("t_tot")
    )
    lam = F.round(
        F.log(
            ((F.col("c_t") + 1).cast("double")
             * (F.col("r_tot") + _DSIR_BUCKETS).cast("double"))
            / ((F.col("t_tot") + _DSIR_BUCKETS).cast("double")
               * (F.col("c_r") + 1).cast("double"))
        )
        * 1000000000
    ).cast("bigint")
    lm = buckets.crossJoin(F.broadcast(tots)).select(
        "bkt", lam.alias("lam_nano")
    )
    logw = F.sum(F.col("cnt") * F.col("lam_nano")).cast("bigint")
    return (
        feats.join(F.broadcast(lm), "bkt")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_feats"),
            logw.alias("logw_nano"),
            (logw > 0).alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa for the language-ID heuristic (chance-corrected accuracy)
# ---------------------------------------------------------------------------


def _kappa_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS actual,
             {_langid_pred_sql()} AS predicted
      FROM documents
    ),
    cm AS (
      SELECT CAST(SUM(actual * predicted) AS BIGINT) AS tp,
             CAST(SUM((1 - actual) * predicted) AS BIGINT) AS fp,
             CAST(SUM(actual * (1 - predicted)) AS BIGINT) AS fn,
             CAST(SUM((1 - actual) * (1 - predicted)) AS BIGINT) AS tn
      FROM cm_src
    ),
    cm_src AS (SELECT * FROM scored)
    SELECT tp + fp + fn + tn AS n_docs,
           ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS po,
           ROUND((CAST(tp + fp AS DOUBLE) * (tp + fn)
                  + CAST(fn + tn AS DOUBLE) * (fp + tn))
                 / (CAST(tp + fp + fn + tn AS DOUBLE)
                    * (tp + fp + fn + tn)), 6) AS pe,
           CASE WHEN (CAST(tp + fp AS DOUBLE) * (tp + fn)
                      + CAST(fn + tn AS DOUBLE) * (fp + tn))
                     < CAST(tp + fp + fn + tn AS DOUBLE)
                       * (tp + fp + fn + tn)
                THEN ROUND((CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn)
                            - (CAST(tp + fp AS DOUBLE) * (tp + fn)
                               + CAST(fn + tn AS DOUBLE) * (fp + tn))
                              / (CAST(tp + fp + fn + tn AS DOUBLE)
                                 * (tp + fp + fn + tn)))
                           / (1.0 - (CAST(tp + fp AS DOUBLE) * (tp + fn)
                                     + CAST(fn + tn AS DOUBLE) * (fp + tn))
                                    / (CAST(tp + fp + fn + tn AS DOUBLE)
                                       * (tp + fp + fn + tn))), 6) END
             AS kappa
    FROM cm
    """


@register("cohens_kappa_langid", oracle=_kappa_oracle())
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the marker-word language-ID heuristic vs the
    labelled lang column: chance-corrected agreement κ = (p_o − p_e)
    / (1 − p_e) — the honest version of ``confusion_matrix_metrics``'s
    accuracy when the classes are imbalanced (a predict-majority
    heuristic scores high accuracy but κ ≈ 0). NULL when p_e = 1
    (single-class degenerate, both engines).

    Scale posture: the same single combinable confusion reduction as
    the confusion-matrix audit (shared predictor SQL —
    ``_langid_pred_sql`` — so the two readouts can never disagree on
    what the classifier said); κ is one double expression over the
    4 exact counts, identical operand order, rounded once.

    Reference surface: none (novel extension, SURVEY.md §2.5 text/eval
    family)."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("actual"),
        F.expr(_langid_pred_sql()).alias("predicted"),
    )
    cm = scored.agg(
        F.sum(F.col("actual") * F.col("predicted")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("actual")) * F.col("predicted"))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.col("actual") * (1 - F.col("predicted")))
        .cast("bigint")
        .alias("fn"),
        F.sum((1 - F.col("actual")) * (1 - F.col("predicted")))
        .cast("bigint")
        .alias("tn"),
    )
    n = "(tp + fp + fn + tn)"
    pe_num = (
        "(CAST(tp + fp AS DOUBLE) * (tp + fn)"
        " + CAST(fn + tn AS DOUBLE) * (fp + tn))"
    )
    pe_den = f"(CAST({n} AS DOUBLE) * {n})"
    po = f"(CAST(tp + tn AS DOUBLE) / {n})"
    pe = f"({pe_num} / {pe_den})"
    return cm.select(
        F.expr(f"{n}").cast("bigint").alias("n_docs"),
        F.expr(f"ROUND({po}, 6)").alias("po"),
        F.expr(f"ROUND({pe}, 6)").alias("pe"),
        F.expr(
            f"CASE WHEN {pe_num} < {pe_den}"
            f" THEN ROUND(({po} - {pe}) / (1.0 - {pe}), 6) END"
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training (Viterbi hard-EM) — the SentencePiece
# counterpart to the BPE training loop above
# ---------------------------------------------------------------------------

_UNI_MAX_WLEN = 8  # corpus max word length (checked by the complete-seg rule)
_UNI_MAX_PLEN = 4  # candidate piece length cap
_UNI_TOPK_MULTI = 24  # multi-char seed pieces kept (by freq, then lex)
_UNI_EM_STEPS = 3  # Viterbi-EM iterations


def _uni_compositions():
    """Every composition of n ∈ 1..{W} into parts ≤ {P}, as flat rows
    (wlen, seg_id, idx, start, l) — the STATIC segmentation universe
    (data-independent pure combinatorics, ≤ 108 segmentations for
    n=8, ~1.6k rows total). Both engines consume the SAME literal
    table, so best-segmentation selection reduces to exact integer
    aggregation + one deterministic ordering — no DP, no float
    comparisons, no recursion."""
    def comps(n):
        if n == 0:
            return [()]
        out = []
        for l in range(1, min(_UNI_MAX_PLEN, n) + 1):
            for rest in comps(n - l):
                out.append((l,) + rest)
        return out

    rows = []
    for wlen in range(1, _UNI_MAX_WLEN + 1):
        for seg_id, comp in enumerate(sorted(comps(wlen))):
            start = 1
            for idx, l in enumerate(comp):
                rows.append((wlen, seg_id, idx, start, l))
                start += l
    return rows


_UNI_CACHE: dict = {}

from rs_streamloader_spark.session import register_stage_cache as _rsc  # noqa: E402

_rsc(_UNI_CACHE)  # clear_stage_cache() must reset the trainer memo too


def _unigram_cached(spark: SparkSession, sf_dir: str):
    """Memoized training run per (application, sf_dir): both
    registered queries read the same pair of localCheckpoint-ed
    result tables, so a catalog sweep trains once (the stage_cached
    posture; a custom memo because the unit here is a PAIR of
    materialized frames, not one cacheable plan)."""
    k = (spark.sparkContext.applicationId, sf_dir)
    if k not in _UNI_CACHE:
        _UNI_CACHE[k] = _unigram_em_tables(spark, sf_dir)
    return _UNI_CACHE[k]


def _unigram_em_tables(spark: SparkSession, sf_dir: str):
    """Run the {T}-step Viterbi hard-EM trainer and return
    ``(vocab_df, fertility_df)`` — shared by the two registered
    queries. The ONLY corpus-sized work is the word count, exactly
    once (the BPE-trainer posture); every EM iteration then operates
    on the vocab-bounded word table (31 distinct words on this
    corpus) crossed with the static composition universe.

    Determinism contract (mirrored verbatim by the oracle):
    - seed vocab = every single char + the top-K substrings of
      length 2..4 by (corpus-weighted occurrence count DESC, piece
      ASC)
    - piece score = ROUND(LN((cnt+1)/Σ(cnt+1)) · 1e6) as BIGINT —
      add-one smoothing keeps every vocab piece finite, and
      micro-unit integer scores make every segmentation comparison
      exact integer math
    - the best segmentation of a word maximizes the score sum over
      COMPLETE segmentations (every piece in vocab; the all-singles
      segmentation is always complete), ties by fewer pieces, then
      by the lexicographically smallest piece string
    - E-step counts pieces along each word's best segmentation,
      weighted by corpus word count; M-step rescores THE SAME vocab
      (no pruning — smoothing keeps dead pieces at the floor;
      documented simplification vs SentencePiece's EM+prune)

    Execution shape (the WordPiece-trainer posture): the vocab is
    |alphabet| + K rows BY CONSTRUCTION, so its counts live
    driver-side; each EM step runs ONE Spark job — segment-select +
    piece recount as a single aggregate over the word×composition
    frame with the current scores folded in as a literal map — whose
    bounded (≤ vocab-sized) piece-count result is collected, then
    rescored driver-side with Spark-identical HALF_UP micro-log
    rounding. Words and candidates stay distributed (the word vocab
    is NOT bounded at scale); only vocab-bounded aggregates cross
    to the driver.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")["documents"]
    wc = (
        _tokens(docs)
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            F.col("tok").alias("word"),
            "cnt",
            F.length("tok").cast("int").alias("wlen"),
        )
        .localCheckpoint()  # vocab-bounded; cut the corpus lineage here
    )
    parts = spark.createDataFrame(
        _uni_compositions(), "wlen int, seg_id int, idx int, start int, l int"
    )

    def _score_py(cnt: int, tot: float) -> int:
        # Spark's ROUND on a double: BigDecimal of the shortest
        # decimal repr (== Python repr), HALF_UP at scale 0 — same
        # idiom as the MMR driver-side recursion
        x = math.log((cnt + 1) / tot) * 1000000.0
        return int(
            Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    def rescore(counts: list[tuple[str, int, int]]) -> dict[str, int]:
        tot = float(sum(c + 1 for _, _, c in counts))
        return {p: _score_py(c, tot) for p, _, c in counts}

    # seed: every substring occurrence of length 1..P, corpus-weighted
    subs = wc.select(
        "cnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, wlen), p ->"
                f" transform(sequence(1, least({_UNI_MAX_PLEN}, wlen - p + 1)),"
                f" l -> substring(word, p, l))))"
            )
        ).alias("piece"),
    )
    pc = (
        subs.groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withColumn("plen", F.length("piece").cast("int"))
    )
    singles = pc.filter(F.col("plen") == 1)
    multis = (
        pc.filter(F.col("plen") >= 2)
        .withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.col("cnt").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("rn") <= _UNI_TOPK_MULTI)
        .drop("rn")
    )
    # ONE bounded collect: |alphabet| singles + K multis by contract
    vocab0 = sorted(
        (r["piece"], r["plen"], r["cnt"])
        for r in singles.unionByName(multis).collect()
    )

    # every candidate (word, seg_id, idx) piece — static per corpus,
    # reused by all iterations (only the score map changes)
    cand = (
        wc.join(parts, "wlen")
        .select(
            "word",
            "cnt",
            "seg_id",
            "idx",
            F.expr("substring(word, start, l)").alias("piece"),
        )
        .localCheckpoint()
    )

    counts = vocab0
    scores = rescore(counts)
    best_seg = None
    for _t_iter in range(1, _UNI_EM_STEPS + 1):
        # current scores as a literal map: a missing piece scores
        # NULL, so n_ok == n_pieces ⟺ complete segmentation (the
        # former inner-join + n_need check, without either join)
        smap = F.create_map(
            *[F.lit(x) for kv in sorted(scores.items()) for x in kv]
        ).cast("map<string,bigint>")
        seg_tot = (
            cand.withColumn("s", F.element_at(smap, F.col("piece")))
            .groupBy("word", "cnt", "seg_id")
            .agg(
                F.sum("s").alias("total"),
                F.count(F.lit(1)).alias("n_pieces"),
                F.count("s").alias("n_ok"),
                F.expr(
                    "transform(array_sort(collect_list(struct(idx,"
                    " piece))), x -> x.piece)"
                ).alias("ps"),
            )
            .filter(F.col("n_ok") == F.col("n_pieces"))  # complete only
            .withColumn("seg", F.array_join("ps", "|"))
        )
        w_best = W.partitionBy("word").orderBy(
            F.col("total").desc(), F.col("n_pieces").asc(), F.col("seg").asc()
        )
        best_seg = (
            seg_tot.withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select("word", "cnt", "seg_id", "n_pieces", "ps", "seg")
        )
        if _t_iter == _UNI_EM_STEPS:
            # the final E-step doubles as the fertility table; pin it
            # so the recount below and the query read share one run
            best_seg = best_seg.localCheckpoint()
        # M-step: recount pieces along best segmentations (vocab-
        # bounded by construction: pieces ⊆ vocab), rescore driver-side
        used = {
            r["piece"]: r["used"]
            for r in best_seg.select("cnt", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("used"))
            .collect()
        }
        counts = [(p, pl, used.get(p, 0)) for p, pl, _ in vocab0]
        scores = rescore(counts)

    pieces = spark.createDataFrame(
        [(p, pl, c, scores[p]) for p, pl, c in counts],
        "piece string, plen int, cnt bigint, score bigint",
    )
    fert = best_seg.select(
        "word",
        F.col("cnt").alias("word_cnt"),
        F.col("n_pieces").cast("bigint").alias("n_pieces"),
        "seg",
    )
    return pieces, fert


def _uni_comp_values() -> str:
    """The composition universe as a SQL VALUES literal — the same
    rows ``_uni_compositions()`` feeds Spark, so both engines select
    best segmentations from an identical static table."""
    return ", ".join(
        f"({w},{s},{i},{st},{l})" for w, s, i, st, l in _uni_compositions()
    )


def _uni_seed_sql() -> str:
    """Seed CTEs: word counts, substring occurrences (per-length
    UNION blocks with correlated RANGE unnests), the top-K+singles
    vocab, and score_0."""
    subs = "\n      UNION ALL\n      ".join(
        f"SELECT word, cnt, SUBSTR(word, CAST(p AS INTEGER), {l}) AS piece"
        f" FROM (SELECT word, cnt, UNNEST(RANGE(1, wlen - {l} + 2)) AS p"
        f" FROM wc)"
        for l in range(1, _UNI_MAX_PLEN + 1)
    )
    return f"""
    wc AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(LENGTH(word) AS INTEGER) AS wlen
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word
            FROM documents WHERE LENGTH(text) > 0)
      GROUP BY word
    ),
    subs AS (
      {subs}
    ),
    pc AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt,
             CAST(LENGTH(piece) AS INTEGER) AS plen
      FROM subs GROUP BY piece
    ),
    vocab0 AS MATERIALIZED (
      SELECT piece, plen, cnt FROM pc WHERE plen = 1
      UNION ALL
      SELECT piece, plen, cnt FROM (
        SELECT piece, plen, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
        FROM pc WHERE plen >= 2
      ) WHERE rn <= {_UNI_TOPK_MULTI}
    ),
    score_0 AS MATERIALIZED (
      SELECT piece, plen, cnt,
             CAST(ROUND(LN(CAST(cnt + 1 AS DOUBLE)
                           / (SELECT CAST(SUM(cnt + 1) AS DOUBLE)
                              FROM vocab0)) * 1000000) AS BIGINT) AS score
      FROM vocab0
    ),
    comp(wlen, seg_id, idx, strt, l) AS (VALUES {_uni_comp_values()}),
    cand AS MATERIALIZED (
      SELECT w.word, w.cnt, p.seg_id, p.idx,
             SUBSTR(w.word, p.strt, p.l) AS piece
      FROM wc w JOIN comp p ON p.wlen = w.wlen
    ),
    need AS MATERIALIZED (
      SELECT w.word, p.seg_id, CAST(COUNT(*) AS BIGINT) AS n_need
      FROM wc w JOIN comp p ON p.wlen = w.wlen
      GROUP BY w.word, p.seg_id
    )"""


def _uni_iter_sql(t: int) -> str:
    """One EM iteration's CTEs: best segmentation under score_{t-1},
    then recount + rescore as score_t."""
    return f"""
    segtot_{t} AS MATERIALIZED (
      SELECT c.word, c.cnt, c.seg_id,
             CAST(SUM(s.score) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_pieces,
             STRING_AGG(c.piece, '|' ORDER BY c.idx) AS seg
      FROM cand c JOIN score_{t - 1} s ON s.piece = c.piece
      GROUP BY c.word, c.cnt, c.seg_id
    ),
    best_{t} AS MATERIALIZED (
      SELECT word, cnt, seg_id, n_pieces, seg FROM (
        SELECT st.*, ROW_NUMBER() OVER (
          PARTITION BY st.word
          ORDER BY st.total DESC, st.n_pieces ASC, st.seg ASC) AS rn
        FROM segtot_{t} st
        JOIN need n ON n.word = st.word AND n.seg_id = st.seg_id
        WHERE st.n_pieces = n.n_need
      ) WHERE rn = 1
    ),
    counts_{t} AS MATERIALIZED (
      SELECT v.piece, v.plen,
             CAST(COALESCE(u.used, 0) AS BIGINT) AS cnt
      FROM vocab0 v LEFT JOIN (
        SELECT c.piece, CAST(SUM(c.cnt) AS BIGINT) AS used
        FROM best_{t} b JOIN cand c
          ON c.word = b.word AND c.seg_id = b.seg_id
        GROUP BY c.piece
      ) u ON u.piece = v.piece
    ),
    score_{t} AS MATERIALIZED (
      SELECT piece, plen, cnt,
             CAST(ROUND(LN(CAST(cnt + 1 AS DOUBLE)
                           / (SELECT CAST(SUM(cnt + 1) AS DOUBLE)
                              FROM counts_{t})) * 1000000) AS BIGINT) AS score
      FROM counts_{t}
    )"""


def _uni_oracle_prefix() -> str:
    return (
        "\n    WITH "
        + _uni_seed_sql().strip()
        + ","
        + ",".join(_uni_iter_sql(t) for t in range(1, _UNI_EM_STEPS + 1))
    )


@register(
    "unigram_lm_em_vocab",
    oracle=_uni_oracle_prefix()
    + f"""
    SELECT piece, CAST(plen AS BIGINT) AS plen, cnt AS final_cnt,
           score AS score_micro
    FROM score_{_UNI_EM_STEPS}
    """,
)
def unigram_lm_em_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM tokenizer TRAINING LOOP (SentencePiece's model
    family; Kudo 2018), as Viterbi hard-EM — the second trainable
    tokenizer next to ``bpe_trained_merges``: seed a substring vocab,
    then iterate 3× (segment every word optimally under the current
    piece scores → recount pieces on the winning segmentations →
    rescore). Emits the final piece table (piece, length, count,
    micro-log score).

    The segmentation argmax is NOT a runtime DP: with words ≤ 8
    chars and pieces ≤ 4, the segmentation universe is a STATIC
    composition table (≤ 108 per length, pure combinatorics) shared
    literally with the oracle, so "Viterbi" reduces to exact integer
    aggregation over micro-log scores + one deterministic window —
    no float comparison, no recursion, byte-identical cross-engine.
    Ties break by (fewer pieces, lexicographic segmentation).

    Scale posture: the corpus-sized work is ONE word count; every EM
    iteration is ONE job over the word-vocab × composition frame with
    the (|alphabet|+K)-bounded score table folded in as a literal
    map, collecting only the vocab-bounded piece counts. At 100 TB
    the iterations cost the same as at 1 GB — the BPE-trainer
    posture.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    vocab, _fert = _unigram_cached(spark, sf_dir)
    return vocab.select(
        "piece",
        F.col("plen").cast("bigint").alias("plen"),
        F.col("cnt").alias("final_cnt"),
        F.col("score").alias("score_micro"),
    )


@register(
    "unigram_lm_fertility",
    oracle=_uni_oracle_prefix()
    + f"""
    SELECT word, cnt AS word_cnt, n_pieces, seg
    FROM best_{_UNI_EM_STEPS}
    """,
)
def unigram_lm_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-word fertility under the TRAINED unigram LM (final EM
    iteration's winning segmentations): word, corpus count, piece
    count, and the '|'-joined segmentation itself — the table a
    tokenizer review reads to see WHAT the trainer learned (shared
    training run with ``unigram_lm_em_vocab``; same determinism
    contract)."""
    _vocab, fert = _unigram_cached(spark, sf_dir)
    return fert
