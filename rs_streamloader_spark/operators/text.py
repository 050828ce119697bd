"""Text-analysis operators over the ``documents`` table (SURVEY.md
§2.5 — north-star extensions; no reference analogue).

All hot-path expressions are JVM-side built-ins (length/replace/md5)
inside whole-stage codegen — no Python UDFs. Every formula is chosen
to be bit-deterministic and expressible identically in DuckDB so the
oracle compare is exact:

- token counts via the length/replace identity (single-space text),
- language-ID via non-overlapping marker-word occurrence counting
  (leftmost non-overlapping ``replace`` semantics match across
  engines),
- fingerprints via ``md5`` (identical lowercase-hex output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rs_streamloader_spark.functions.vector import cosine_expr
from rs_streamloader_spark.functions.wasserstein import (
    w1_pair_cte_sql,
    w1_pair_micro,
)
from rs_streamloader_spark.functions import (
    marker_word_count,
    n_tokens,
    quality_score,
)
from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer expressed arithmetically —
    stays in codegen, no explode)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    ntok = n_tokens()
    return t.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        (nonspace.cast("double") / ntok).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CASE WHEN LENGTH(text) >= 200 THEN 1 ELSE 0 END
             + CASE WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) >= 40
                    THEN 1 ELSE 0 END
             + CASE WHEN LENGTH(REPLACE(text, ' ', '')) * 1.0
                         / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                         BETWEEN 3 AND 8 THEN 1 ELSE 0 END AS quality_score
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, token count, and mean token
    length band — integer-valued so the compare is exact."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    return t.select(
        "doc_id",
        n_tokens().alias("n_tokens"),
        quality_score().alias("quality_score"),
    )


def _marker_count_sql(marker: str) -> str:
    """DuckDB: non-overlapping occurrences of ``marker`` as a word."""
    pad = f"' ' || text || ' '"
    return (
        f"CAST((LENGTH({pad}) - LENGTH(REPLACE({pad}, ' {marker} ', ' ')))"
        f" / {len(marker) + 1} AS BIGINT)"
    )


@register(
    "text_langid",
    oracle=f"""
    SELECT lang,
           CASE WHEN ({_marker_count_sql('the')} + {_marker_count_sql('a')}) * 20
                     >= (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                THEN 'en' ELSE 'other' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (stopword-density n-gram
    family): predict 'en' when ≥5% of tokens are English function
    words; confusion matrix against the labelled ``lang`` column.

    The replace-based counter is non-overlapping leftmost-first in
    both engines, so counts agree exactly."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    ntok = n_tokens()
    en_markers = marker_word_count("the") + marker_word_count("a")
    predicted = F.when(en_markers * 20 >= ntok, "en").otherwise("other")
    return (
        t.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "text_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INTEGER) AS n_pieces,
           CAST(LEN(LIST_DISTINCT(
                regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))
                AS INTEGER) AS n_unique_pieces
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word token counting with a BPE-ish regex (letter runs,
    digit runs, single punctuation glyphs) — regexes chosen from the
    RE2∩Java-compatible subset so both engines tokenize identically."""
    from rs_streamloader_spark.functions import bpe_ish_tokens

    t = load_tables(spark, sf_dir, "documents")["documents"]
    pieces = bpe_ish_tokens("text")
    return t.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        F.size(F.array_distinct(pieces)).alias("n_unique_pieces"),
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
             CAST(LEN(regexp_extract_all(
                    text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                  AS BIGINT) AS n_pieces
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           CAST(CAST(SUM(n_pieces) AS HUGEINT) * 1000
                // GREATEST(SUM(n_words), 1) AS BIGINT) AS fertility_milli
    FROM per_doc GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (sub-word pieces per whitespace word, in
    exact integer MILLI-units) per language — the budget multiplier a
    pipeline applies when a token quota is set in tokenizer pieces but
    the corpus is measured in words, and the per-language skew audit
    (high-fertility languages burn quota faster; the number that
    drives per-language sampling corrections in multilingual mixes).
    Uses the same BPE-ish regex as ``text_bpe_tokens`` so the two
    reports share one tokenizer definition.

    Scale posture: a single combinable (lang)-keyed aggregate over
    per-row integer counts — the shuffle carries |langs| keys of four
    BIGINTs. Cross-engine determinism: all integers; the ratio leaves
    as milli-units via HUGEINT/DECIMAL floor-division (never a
    rounded float divide)."""
    from rs_streamloader_spark.functions import bpe_ish_tokens

    t = load_tables(spark, sf_dir, "documents")["documents"]
    per_doc = t.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_words"),
        F.size(bpe_ish_tokens("text")).cast("bigint").alias("n_pieces"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_pieces").alias("n_pieces"),
        F.expr(
            "CAST(CAST(sum(n_pieces) AS DECIMAL(38,0)) * 1000"
            " div GREATEST(sum(n_words), 1) AS BIGINT)"
        ).alias("fertility_milli"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, MD5(text) AS fingerprint,
           SUBSTR(MD5(text), 1, 8) AS fp_prefix
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting via md5 (identical lowercase hex in both
    engines); the prefix doubles as a shard/bucket key at scale."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    return t.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.substring(F.md5("text"), 1, 8).alias("fp_prefix"),
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' '
                         || string_split(text, ' ')[i+1])) AS gram
      FROM documents
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(MAX(cnt) AS BIGINT) AS top_bigram_count,
           ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_bigram_frac,
           ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / SUM(cnt), 6)
             AS dup_bigram_frac
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: per-document top-bigram
    coverage and duplicate-bigram fraction — the classic signals for
    boilerplate/template text that length and token-ratio heuristics
    miss (Rae et al. 2021 use the same family: fraction of characters
    in the most frequent n-gram / in duplicated n-grams).

    Bigrams come from ``zip_with`` over two shifted slices of the
    token array (empty for <2-token docs, matching DuckDB's empty
    ``range``) — all JVM codegen until the one explode, then two
    hash aggregations that combine map-side. Ratios are bigint/bigint
    → double on both engines; denominators are per-doc bigram counts
    (≪1e6), so 6dp rounding cannot sit on a half boundary except at
    exactly-representable powers of two, where both engines round
    half-away alike."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    toks = t.select("doc_id", F.split("text", " ").alias("toks"))
    # explode_outer + null filter: plain explode makes Catalyst infer a
    # size/isnotnull pre-filter that re-evaluates the zip_with/slice
    # bigram build twice per row in interpreted mode (see dedup._shingles)
    grams = toks.select(
        "doc_id",
        F.explode_outer(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1), (x, y) -> concat(x, ' ', y))"
            )
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.max("cnt").cast("bigint").alias("top_bigram_count"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_bigram_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("dup_bigram_frac"),
    )


RARE_MAX_FREQ = 2  # a token is "rare" if the whole corpus has ≤ this many


@register(
    "text_corpus_rarity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    f AS (SELECT w, COUNT(*) AS cf FROM t GROUP BY w)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(cf) * 1.0 / COUNT(*), 6) AS mean_token_corpus_freq,
           ROUND(SUM(CASE WHEN cf <= {RARE_MAX_FREQ} THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS rare_token_frac
    FROM t JOIN f USING (w) GROUP BY t.doc_id
    """,
)
def text_corpus_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality scoring: per-document mean corpus
    frequency of its tokens and the fraction of rare tokens (corpus
    frequency ≤ {RARE_MAX_FREQ}) — the two-pass signal family (corpus
    stats pass → per-doc scoring pass) that single-document heuristics
    like ``text_quality_score`` cannot express; high rare fraction
    flags OCR noise/gibberish, low flags boilerplate.

    Scale shape: the frequency table aggregates with map-side combine
    (skew-safe — hot words partial-aggregate before the shuffle), then
    BROADCASTS into the scoring join, so token rows are shuffled once
    (the per-doc groupBy). The tempting window formulation
    (``count(*) over (partition by w)``) is NOT skew-safe: every
    occurrence of a stopword would land on one partition. Vocabulary
    grows ~Heaps' law (≪ corpus), so the broadcast holds far past this
    scale; past that, fall back to a shuffle join on ``w`` for scoring
    only. Integer-ratio outputs keep the cross-engine compare exact
    (no transcendental functions: a log-prob variant would inherit
    libm last-ulp differences between engines)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    toks = t.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
    ).filter(F.col("w").isNotNull())
    freq = toks.groupBy("w").agg(F.count("*").alias("cf"))
    return (
        toks.join(F.broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum("cf") / F.count("*"), 6).alias("mean_token_corpus_freq"),
            F.round(
                F.sum(F.when(F.col("cf") <= RARE_MAX_FREQ, 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("rare_token_frac"),
        )
    )


PACK_TOKEN_BUDGET = 512
PACK_N_SHARDS = 16


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {PACK_N_SHARDS} AS shard,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS ntok
      FROM documents
    ),
    c AS (
      SELECT shard, ntok,
             COALESCE(SUM(ntok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM toks
    )
    SELECT shard,
           CAST(FLOOR(cum_before / {PACK_TOKEN_BUDGET}) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS bin_tokens
    FROM c
    GROUP BY 1, 2
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are packed
    into fixed token-budget bins ({PACK_TOKEN_BUDGET} tokens) in
    deterministic doc_id order, sharded {PACK_N_SHARDS} ways so the
    running-total window parallelizes — a GLOBAL running sum would
    serialize onto one partition, the classic packing scale trap. Bin
    assignment is floor(tokens-before-me / budget) within the shard
    (first-fit in arrival order); the emitted per-bin stats are what a
    batch builder consumes. At 100 TB the shard count scales with the
    cluster and each shard's window is one partition of bounded size."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    from pyspark.sql.window import Window

    toks = t.select(
        "doc_id",
        (F.col("doc_id") % PACK_N_SHARDS).alias("shard"),
        n_tokens().alias("ntok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = toks.select(
        "shard",
        "ntok",
        F.coalesce(F.sum("ntok").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        c.groupBy(
            "shard",
            F.floor(F.col("cum_before") / PACK_TOKEN_BUDGET)
            .cast("bigint")
            .alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction — training-data compliance pass)
# ---------------------------------------------------------------------------

@register(
    "text_pii_scrub",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call 555-'
                  || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(LENGTH(REGEXP_EXTRACT_ALL(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT) AS n_emails,
           CAST(LENGTH(REGEXP_EXTRACT_ALL(raw, '[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]')) AS BIGINT) AS n_phones,
           MD5(REGEXP_REPLACE(
             REGEXP_REPLACE(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
             '[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g')) AS scrub_hash
    FROM seeded
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace email addresses and phone-shaped
    digit runs with typed placeholders and count redactions per doc —
    the compliance scrub every training-data pipeline runs before
    tokenization. The synthetic corpus contains no organic PII, so a
    deterministic email+phone is first seeded into each document from
    its doc_id (same concatenation on both engines); the scrub then
    provably removes it. Patterns use explicit character classes only
    (no \\d / lookaround) so Java-regex and RE2 semantics agree; the
    scrubbed text is compared by md5. Pure JVM codegen
    (regexp_replace / regexp_count), no Python, no shuffle — a
    map-only stage that pipelines into whatever follows at 100 TB."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
    phone = r"[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    seeded = t.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("raw"), email, "<EMAIL>"), phone, "<PHONE>"
    )
    return seeded.select(
        "doc_id",
        F.regexp_count("raw", F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count("raw", F.lit(phone)).cast("bigint").alias("n_phones"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering (fixed-weight linear classifier)
# ---------------------------------------------------------------------------

# fixed "trained" weights: bias, n_tokens, avg_token_len, marker density
_QL_W = (-4.5, 0.04, 0.4, 6.0)


@register(
    "text_quality_logistic",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE)
               AS ntok,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS atl,
             CAST({_marker_count_sql('the')} + {_marker_count_sql('a')} AS DOUBLE)
               / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS md
      FROM documents
    )
    SELECT doc_id,
           ROUND(((({_QL_W[0]} + {_QL_W[1]} * ntok) + {_QL_W[2]} * atl)
                  + {_QL_W[3]} * md), 6) AS quality_logit,
           CAST(CASE WHEN ((({_QL_W[0]} + {_QL_W[1]} * ntok) + {_QL_W[2]} * atl)
                           + {_QL_W[3]} * md) > 0
                THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM f
    """,
)
def text_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a fixed-weight linear classifier
    over cheap JVM-computable features (token count, mean token
    length, function-word density) — the classifier-filter stage of a
    training-data pipeline (fastText/logreg quality models) with the
    model weights frozen for determinism. The published score is the
    LOGIT (pure arithmetic, bit-identical across engines); the keep
    decision thresholds it at 0 — equivalent to sigmoid(logit) > 0.5
    without evaluating a transcendental whose last-ulp behaviour
    differs between engines.

    Whole-stage codegen end to end: length/replace arithmetic, no
    Python, no explode — per-row cost is O(len(text)) regardless of
    corpus size. Reference surface: none (novel extension operator,
    SURVEY.md §2.5 text-analysis family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    ntok = n_tokens()
    nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    atl = nonspace.cast("double") / ntok
    md = (
        (marker_word_count("the") + marker_word_count("a")).cast("double") / ntok
    )
    w0, w1, w2, w3 = _QL_W
    logit = (
        (F.lit(w0) + F.lit(w1) * ntok.cast("double")) + F.lit(w2) * atl
    ) + F.lit(w3) * md
    return t.select(
        "doc_id",
        F.round(logit, 6).alias("quality_logit"),
        F.when(logit > 0, 1).otherwise(0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (fixed query, corpus-statistics join)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 25


def _bm25_tf_sql(term: str) -> str:
    return _marker_count_sql(term)


def _bm25_cte_sql() -> str:
    """Shared tf/corpus/scored CTE block — the single oracle-side
    source of the BM25 formula (bm25_topk + rrf_rank_fusion), the twin
    of the Spark-side ``_bm25_scored``."""
    return f"""
    tf AS (
      SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE) AS dl,
             {", ".join(f"CAST({_bm25_tf_sql(t)} AS DOUBLE) AS tf_{t}" for t in _BM25_TERMS)}
      FROM documents
    ),
    corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
             {", ".join(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
      FROM tf
    ),
    scored AS (
      SELECT tf.doc_id,
             {" + ".join(
                 f"LN((corpus.n_docs - corpus.df_{t} + 0.5) / (corpus.df_{t} + 0.5) + 1.0)"
                 f" * tf_{t} * ({_BM25_K1} + 1.0)"
                 f" / (tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * tf.dl / corpus.avgdl))"
                 for t in _BM25_TERMS
             )} AS score
      FROM tf CROSS JOIN corpus
    )"""


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_bm25_cte_sql()}
    SELECT doc_id, ROUND(score, 6) AS bm25_score
    FROM scored
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring of a fixed 3-term query against the
    corpus, top-k by score (k1=1.2, b=0.75). Term frequency is the
    codegen'd padded-replace occurrence count (identical
    non-overlapping semantics in both engines, see module docstring);
    document frequency, N, and avgdl come from ONE corpus aggregate.

    Scale posture: the per-document pass is pure whole-stage-codegen
    arithmetic (no explode, no UDF); the corpus statistics reduce to a
    single row cross-joined back (Catalyst broadcasts the 1-row side),
    so the whole query is two scans of documents, one 1-row shuffle,
    and a TakeOrderedAndProject for the top-k — no global sort. At
    100 TB the stats row is still one row; only the scan parallelism
    grows. Ordering ties break on doc_id; the ORDER BY uses the
    6dp-ROUNDED score on both sides so the top-k cut is cross-engine
    stable.

    Determinism caveat: the idf term uses the natural log (it IS the
    BM25 formula), the one transcendental in the catalog's oracle
    surface — Spark's Math.log and DuckDB's LN are each correctly
    rounded to <=1 ulp but not guaranteed bit-identical across libm
    builds. The 6dp rounding + rounded-score ordering absorbs a
    last-ulp disagreement everywhere except a score sitting exactly on
    a .5e-6 boundary (not present in this corpus; same accepted
    boundary class as _block_pair_scores' cosine rounding)."""
    return (
        _bm25_scored(load_tables(spark, sf_dir, "documents")["documents"])
        .orderBy(F.col("bm25_score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


def _bm25_scored(t: DataFrame) -> DataFrame:
    """Shared BM25 scorer (bm25_topk + rrf_rank_fusion): the fixed
    {_BM25_TERMS} query scored per document, 6dp-rounded."""
    dl = n_tokens().cast("double")
    tf_cols = [
        marker_word_count(term).cast("double").alias(f"tf_{term}")
        for term in _BM25_TERMS
    ]
    tf = t.select("doc_id", dl.alias("dl"), *tf_cols)
    corpus = tf.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{term}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{term}")
            for term in _BM25_TERMS
        ],
    )
    score = None
    for term in _BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{term}") + 0.5)
            / (F.col(f"df_{term}") + 0.5)
            + 1.0
        )
        part = (
            idf
            * F.col(f"tf_{term}")
            * (_BM25_K1 + 1.0)
            / (
                F.col(f"tf_{term}")
                + _BM25_K1
                * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return tf.join(F.broadcast(corpus)).select(
        "doc_id", F.round(score, 6).alias("bm25_score")
    )


# ---------------------------------------------------------------------------
# Context-window chunking (token-window splitter for training pipelines)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48


@register(
    "text_chunk_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STR_SPLIT(text, ' ') AS tokens,
             LEN(STR_SPLIT(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n, UNNEST(GENERATE_SERIES(1, n, {_CHUNK_STRIDE})) AS s
      FROM toks
    )
    SELECT c.doc_id,
           CAST((c.s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(LEAST(c.s + {_CHUNK_TOKENS - 1}, c.n) - c.s + 1 AS BIGINT)
             AS n_chunk_tokens,
           MD5(ARRAY_TO_STRING(
             LIST_SLICE(t.tokens, c.s, LEAST(c.s + {_CHUNK_TOKENS - 1}, c.n)), ' '
           )) AS chunk_hash
    FROM chunks c JOIN toks t USING (doc_id)
    """,
)
def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into
    64-token windows on a 48-token stride (16-token overlap) — the
    sample-preparation step between cleaned text and sequence packing
    in a training pipeline. Emits one row per (doc, window) with the
    window's token count and an md5 fingerprint of its joined text.

    Scale posture: tokens and start offsets are computed ONCE per row
    into materialized columns, then explode_outer fans out the start
    list — the explode_outer + null-filter shape (not plain explode)
    keeps Catalyst from inferring a size()>0 pre-filter that would
    re-execute the interpreted sequence() below the exchange (measured
    17x on the shingle stage, see dedup.py). Per-chunk work is a
    slice + hash over an already-split array; nothing re-tokenizes.
    No shuffle at all: scan -> project -> generate -> project."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    toks = t.select(
        "doc_id",
        F.split("text", " ").alias("tokens"),
        F.size(F.split("text", " ")).alias("n"),
    )
    exploded = toks.select(
        "doc_id",
        "tokens",
        "n",
        F.explode_outer(
            F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_STRIDE))
        ).alias("s"),
    ).filter(F.col("s").isNotNull())
    chunk_end = F.least(F.col("s") + (_CHUNK_TOKENS - 1), F.col("n"))
    return exploded.select(
        "doc_id",
        ((F.col("s") - 1) / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        (chunk_end - F.col("s") + 1).cast("bigint").alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("tokens"), F.col("s"), chunk_end - F.col("s") + 1),
            )
        ).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Vocabulary building (top-N terms with stable ids)
# ---------------------------------------------------------------------------

_VOCAB_N = 100


@register(
    "vocab_topk_ids",
    oracle=f"""
    WITH counts AS (
      SELECT term, COUNT(*) AS term_count
      FROM (SELECT UNNEST(STR_SPLIT(text, ' ')) AS term FROM documents)
      WHERE term <> ''
      GROUP BY term
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY term_count DESC, term) AS BIGINT)
             AS vocab_id,
           term, term_count
    FROM counts
    ORDER BY term_count DESC, term
    LIMIT {_VOCAB_N}
    """,
)
def vocab_topk_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style vocabulary build: global term counts, top
    {_VOCAB_N} by frequency, each term assigned a stable id in
    (count DESC, term) order — the id table a training pipeline
    broadcasts back to encode documents.

    Scale posture: explode fans out to (term, 1) pairs — the classic
    map-side-combinable shape, one shuffle on the term key; the top-N
    cut is TakeOrderedAndProject (no global sort of the vocabulary);
    id assignment windows over the N retained rows only, so the
    single-partition window touches {_VOCAB_N} rows regardless of
    corpus size."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    counts = (
        t.select(
            F.explode_outer(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
        .groupBy("term")
        .agg(F.count("*").alias("term_count"))
        .orderBy(F.col("term_count").desc(), "term")
        .limit(_VOCAB_N)
    )
    w = Window.orderBy(F.col("term_count").desc(), "term")
    return counts.select(
        F.row_number().over(w).cast("bigint").alias("vocab_id"),
        "term",
        "term_count",
    )


# ---------------------------------------------------------------------------
# Vocabulary richness per source (type/token + hapax audit)
# ---------------------------------------------------------------------------


@register(
    "text_vocab_richness",
    oracle="""
    WITH tok AS (
      SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    tc AS (
      SELECT source, term, COUNT(*) AS cnt
      FROM tok WHERE term <> '' GROUP BY source, term
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS type_token_ratio,
           ROUND(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM tc
    GROUP BY source
    """,
)
def text_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary-richness audit per source: token count,
    distinct-type count, hapax legomena (terms seen exactly once),
    type/token ratio and hapax share — the screens for synthetic /
    template-generated text (low TTR) and OCR noise (high hapax).

    Scale posture: two stacked combinable aggregates — (source, term)
    counts shuffle once on the composite key, then collapse to one
    row per source. No windows, no distinct-on-raw-tokens (the count
    IS the distinct), all-JVM codegen."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    tc = (
        t.select("source", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    one = F.when(F.col("cnt") == 1, 1).otherwise(0)
    return tc.groupBy("source").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(one).alias("n_hapax"),
        F.round(F.count("*").cast("double") / F.sum("cnt"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.sum(one).cast("double") / F.count("*"), 6).alias("hapax_share"),
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram detection (per-source high-document-frequency bigrams)
# ---------------------------------------------------------------------------

_BOILER_MIN_SHARE = 0.05
_BOILER_TOPK = 50


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH g AS (
      SELECT source, doc_id,
             UNNEST(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' '
                         || string_split(text, ' ')[i+1])) AS ngram
      FROM documents
    ),
    bg AS (SELECT DISTINCT source, doc_id, ngram FROM g),
    df AS (
      SELECT source, ngram, COUNT(*) AS df
      FROM bg GROUP BY source, ngram
    ),
    nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT df.source, df.ngram, df.df, nd.n_docs,
           ROUND(CAST(df.df AS DOUBLE) / nd.n_docs, 6) AS doc_share
    FROM df JOIN nd ON nd.source = df.source
    WHERE CAST(df.df AS DOUBLE) / nd.n_docs >= {_BOILER_MIN_SHARE}
    ORDER BY doc_share DESC, df.source, df.ngram
    LIMIT {_BOILER_TOPK}
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: word bigrams appearing in ≥{share} of a
    source's documents (C4-style repeated-template screen — the
    n-grams a cleaning pass would strip before training). Reports
    document frequency and share per (source, bigram), highest share
    first.

    Scale posture: per-doc distinct bigrams come from an array
    pipeline (split → slide → array_distinct) with NO window over raw
    tokens — the oracle's per-doc LEAD window is the serial
    formulation; Spark stays inside one generate + combinable
    (source, ngram) count. The per-source doc count is a tiny
    broadcast. Top-{k} compiles to TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    ws = F.split(F.col("text"), " ")
    grams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN"
        " transform(sequence(0, size(ws) - 2),"
        "           i -> concat_ws(' ', ws[i], ws[i+1]))"
        " ELSE array() END"
    )
    bg = (
        t.select("source", ws.alias("ws"))
        .select("source", F.array_distinct(grams).alias("gs"))
        .select("source", F.explode_outer("gs").alias("ngram"))
        .where(F.col("ngram").isNotNull())
    )
    df = bg.groupBy("source", "ngram").agg(F.count("*").alias("df"))
    nd = t.groupBy("source").agg(F.count("*").alias("n_docs"))
    share = F.col("df").cast("double") / F.col("n_docs")
    return (
        df.join(F.broadcast(nd), "source")
        .where(share >= _BOILER_MIN_SHARE)
        .select(
            "source", "ngram", "df", "n_docs",
            F.round(share, 6).alias("doc_share"),
        )
        .orderBy(F.col("doc_share").desc(), "source", "ngram")
        .limit(_BOILER_TOPK)
    )


# ---------------------------------------------------------------------------
# Token-distribution entropy per source (integer-scaled exact sum)
# ---------------------------------------------------------------------------


# ONE definition of the (source, token, count) stage — the tokenization
# contract shared by source_token_entropy and text_js_divergence_sources
# (and mirrored in their oracles via _SOURCE_TOK_SQL), so "what is a
# token" cannot drift between the entropy and divergence views.
_SOURCE_TOK_SQL = """
      SELECT source, tok, COUNT(*) AS cnt FROM (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY source, tok
"""


def _source_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        t.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "source_token_entropy",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    tot AS (SELECT source, SUM(cnt) AS total FROM tc GROUP BY source),
    e AS (
      SELECT tc.source,
             CAST(ROUND((CAST(tc.cnt AS DOUBLE) / tot.total)
                        * LOG2(CAST(tc.cnt AS DOUBLE) / tot.total)
                        * 1000000000) AS BIGINT) AS e_nano
      FROM tc JOIN tot ON tot.source = tc.source
    )
    SELECT e.source,
           CAST(MAX(tot.total) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(-SUM(e.e_nano) / 1000000000.0, 6) AS entropy_bits,
           ROUND(POW(2, -SUM(e.e_nano) / 1000000000.0), 4) AS perplexity
    FROM e JOIN tot ON tot.source = e.source
    GROUP BY e.source
    """,
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and 2^H perplexity) of each source's word
    distribution — the diversity audit that separates template spam
    (low entropy) from natural corpora, next to
    ``text_vocab_richness``'s count-based ratios.

    Scale posture: (source, term) counts shuffle once (combinable);
    per-source totals are a tiny broadcast. Cross-engine determinism
    for a transcendental SUM: each term's p·log2(p) rounds to integer
    NANO-entropy units BEFORE summing, so the reduction is exact
    integer addition in any order — the floating-point-sum-order trap
    (engines fold in different orders) cannot fire. The final /1e9
    and pow(2, ·) are single expressions on the exact sum."""
    tc = _source_token_counts(spark, sf_dir)
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total")
    e = tc.join(F.broadcast(tot), "source").select(
        "source",
        "total",
        F.round(p * F.log2(p) * 1_000_000_000).cast("bigint").alias("e_nano"),
    )
    h = -F.sum("e_nano") / 1_000_000_000.0
    return e.groupBy("source").agg(
        F.max("total").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(F.pow(F.lit(2), h), 4).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source unigram distributions
# ---------------------------------------------------------------------------


@register(
    "text_js_divergence_sources",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    tot AS (SELECT source, SUM(cnt) AS total FROM tc GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(ROUND((
               (CAST(a.cnt AS DOUBLE) / ta.total)
               * LN(2.0 * (CAST(a.cnt AS DOUBLE) / ta.total)
                    / (CAST(a.cnt AS DOUBLE) / ta.total
                       + CAST(b.cnt AS DOUBLE) / tb.total))
               + (CAST(b.cnt AS DOUBLE) / tb.total)
               * LN(2.0 * (CAST(b.cnt AS DOUBLE) / tb.total)
                    / (CAST(a.cnt AS DOUBLE) / ta.total
                       + CAST(b.cnt AS DOUBLE) / tb.total))
             ) * 1000000000) AS BIGINT) AS term_nano,
             a.cnt AS ca, b.cnt AS cb
      FROM tc a
      JOIN tc b ON b.tok = a.tok AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
    ),
    agg AS (
      SELECT source_a, source_b,
             SUM(term_nano) AS shared_nano,
             SUM(ca) AS shared_ca, SUM(cb) AS shared_cb
      FROM shared GROUP BY 1, 2
    )
    SELECT g.source_a, g.source_b,
           ROUND((g.shared_nano / 1000000000.0
                  + LN(2.0) * (1.0 - CAST(g.shared_ca AS DOUBLE) / ta.total)
                  + LN(2.0) * (1.0 - CAST(g.shared_cb AS DOUBLE) / tb.total)
                 ) / (2.0 * LN(2.0)), 6) AS jsd_bits
    FROM agg g
    JOIN tot ta ON ta.source = g.source_a
    JOIN tot tb ON tb.source = g.source_b
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits, symmetric, bounded [0,1])
    between every pair of sources' unigram distributions — the
    corpus-drift / source-similarity matrix a data-mixing pipeline
    consults before reweighting domains.

    Scale posture: the (source, token) aggregate is vocab-bounded;
    the pair join fans each token out to at most sources² rows
    (sources are a bounded set), and tokens appearing in only one
    source contribute the closed-form ln2·(unshared mass) correction
    — computed from exact integer masses, so NO full-outer join is
    needed. Cross-engine determinism: each shared-token term is one
    double expression with identical operand order rounded to integer
    nano-units before summation; the correction is a final expression
    over exact integer counts."""
    tc = _source_token_counts(spark, sf_dir)
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    a = tc.alias("a")
    b = tc.alias("b")
    ta = tot.select(F.col("source").alias("source_a"), F.col("total").alias("ta"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("total").alias("tb"))
    shared = (
        a.join(
            b,
            (F.col("b.tok") == F.col("a.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.cnt").alias("ca"),
            F.col("b.cnt").alias("cb"),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select("source_a", "source_b", "ta", "tb", "ca", "cb")
    )
    pa2 = F.col("ca").cast("double") / F.col("ta")
    pb2 = F.col("cb").cast("double") / F.col("tb")
    term2 = F.round(
        (
            pa2 * F.log(2.0 * pa2 / (pa2 + pb2))
            + pb2 * F.log(2.0 * pb2 / (pa2 + pb2))
        )
        * 1_000_000_000
    ).cast("bigint")
    agg = shared.groupBy("source_a", "source_b").agg(
        F.sum(term2).alias("shared_nano"),
        F.sum("ca").alias("shared_ca"),
        F.sum("cb").alias("shared_cb"),
    )
    import math

    ln2 = math.log(2.0)
    return (
        agg.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(
                (
                    F.col("shared_nano") / 1_000_000_000.0
                    + ln2 * (1.0 - F.col("shared_ca").cast("double") / F.col("ta"))
                    + ln2 * (1.0 - F.col("shared_cb").cast("double") / F.col("tb"))
                )
                / (2.0 * ln2),
                6,
            ).alias("jsd_bits"),
        )
    )


# ---------------------------------------------------------------------------
# Padding-waste audit for length-bucketed batching
# ---------------------------------------------------------------------------

_PAD_BUCKET_TOKENS = 64
_PAD_BATCH_SIZE = 8


@register(
    "padding_waste_audit",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tok,
             CAST((n_tok - 1) // {_PAD_BUCKET_TOKENS} AS BIGINT) AS bucket,
             CAST((ROW_NUMBER() OVER (
               PARTITION BY CAST((n_tok - 1) // {_PAD_BUCKET_TOKENS} AS BIGINT)
               ORDER BY n_tok, doc_id) - 1) // {_PAD_BATCH_SIZE} AS BIGINT)
               AS batch_id
      FROM lens
    ),
    per_batch AS (
      SELECT bucket, batch_id, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
             CAST(MAX(n_tok) * COUNT(*) AS BIGINT) AS padded_tokens
      FROM bucketed GROUP BY 1, 2
    )
    SELECT bucket,
           COUNT(*) AS n_batches,
           CAST(SUM(real_tokens) AS BIGINT) AS real_tokens,
           CAST(SUM(padded_tokens) AS BIGINT) AS padded_tokens,
           CAST(CAST(SUM(padded_tokens) - SUM(real_tokens) AS HUGEINT)
                * 1000000 // SUM(padded_tokens) AS BIGINT) AS waste_ppm
    FROM per_batch GROUP BY bucket
    """,
)
def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed training batches: docs
    sort into {w}-token length buckets, fill batches of {b} in length
    order, and each bucket reports how many pad tokens the batching
    would burn (batch cost = max-length × batch-size) — the
    measurement behind bucketed-batching throughput wins.

    Scale posture: doc lengths are row-local; the batch assignment is
    a ranking window PARTITIONED BY BUCKET (each partition holds one
    length band, so no global sort — the skew-bounded variant of
    sequence packing, cf. ``pack_sequences``); batch and bucket
    rollups are combinable aggregates. Cross-engine determinism:
    batch fill order is pinned by (length, doc_id); waste is integer
    PPM."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    bucket = F.expr(f"CAST((n_tok - 1) div {_PAD_BUCKET_TOKENS} AS BIGINT)")
    bucketed = lens.select(
        "doc_id",
        "n_tok",
        bucket.alias("bucket"),
        F.expr(
            f"CAST((ROW_NUMBER() OVER (PARTITION BY"
            f" CAST((n_tok - 1) div {_PAD_BUCKET_TOKENS} AS BIGINT)"
            f" ORDER BY n_tok, doc_id) - 1) div {_PAD_BATCH_SIZE} AS BIGINT)"
        ).alias("batch_id"),
    )
    per_batch = bucketed.groupBy("bucket", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("real_tokens"),
        (F.max("n_tok") * F.count("*")).alias("padded_tokens"),
    )
    return per_batch.groupBy("bucket").agg(
        F.count("*").alias("n_batches"),
        F.sum("real_tokens").alias("real_tokens"),
        F.sum("padded_tokens").alias("padded_tokens"),
        F.expr(
            "CAST(CAST(SUM(padded_tokens) - SUM(real_tokens) AS DECIMAL(38,0))"
            " * 1000000 div SUM(padded_tokens) AS BIGINT)"
        ).alias("waste_ppm"),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffling (reproducible data order)
# ---------------------------------------------------------------------------

_EPOCHS = 3
_EPOCH_HEAD = 5


@register(
    "epoch_shuffle_order",
    oracle=f"""
    WITH epochs AS (SELECT UNNEST(RANGE(0, {_EPOCHS})) AS epoch),
    ranked AS (
      SELECT e.epoch, d.doc_id,
             MD5(CAST(e.epoch AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR))
               AS shuffle_key,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY e.epoch
               ORDER BY MD5(CAST(e.epoch AS VARCHAR) || '|'
                            || CAST(d.doc_id AS VARCHAR))
             ) AS INT) AS pos
      FROM documents d CROSS JOIN epochs e
    )
    SELECT epoch, pos, doc_id FROM ranked WHERE pos <= {_EPOCH_HEAD}
    """,
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffling: each epoch orders the
    corpus by md5(epoch | doc_id) — a different but REPRODUCIBLE
    permutation per epoch (emitting each epoch's first {h} docs as the
    auditable witness). This is how a 100 TB training run gets
    shuffled data order that survives restarts, stragglers, and
    re-runs, where ``rand()``-based shuffles silently differ per
    attempt.

    Scale posture: the shuffle key is row-local codegen; the head cut
    per epoch is a bounded ranking window (WindowGroupLimit pushes
    the cut map-side); epochs fan out via a {n}-row broadcast range.
    Cross-engine determinism: md5 hex strings order identically
    everywhere."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    epochs = docs.sparkSession.range(_EPOCHS).select(
        F.col("id").cast("int").alias("epoch")
    )
    key = F.md5(
        F.concat(
            F.col("epoch").cast("string"), F.lit("|"), F.col("doc_id").cast("string")
        )
    )
    ranked = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .select("epoch", "doc_id", key.alias("shuffle_key"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("epoch").orderBy("shuffle_key")
            ),
        )
        .filter(F.col("pos") <= _EPOCH_HEAD)
    )
    return ranked.select("epoch", "pos", "doc_id")


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of lexical (BM25) and semantic (cosine) retrieval
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al., SIGIR'09)
_RRF_LIST = 20  # depth of each input ranking
_RRF_TOPK = 10

_RRF_DUCK_COS = (
    "LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))"
    " / (SQRT(LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]),"
    " CAST(b.embedding AS DOUBLE[])))"
    " * SQRT(LIST_DOT_PRODUCT(CAST(q.embedding AS DOUBLE[]),"
    " CAST(q.embedding AS DOUBLE[]))))"
)


@register(
    "rrf_rank_fusion",
    oracle=f"""
    WITH {_bm25_cte_sql()}
    ,
    lex AS (
      SELECT doc_id, CAST(rn AS INTEGER) AS lex_rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY ROUND(score, 6) DESC, doc_id) AS rn
        FROM scored
      ) WHERE rn <= {_RRF_LIST}
    ),
    sem AS (
      SELECT doc_id, CAST(rn AS INTEGER) AS sem_rank FROM (
        SELECT b.vec_id AS doc_id, ROW_NUMBER() OVER (
          ORDER BY ROUND({_RRF_DUCK_COS}, 6) DESC, b.vec_id) AS rn
        FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE b.vec_id <> 0
      ) WHERE rn <= {_RRF_LIST}
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE(1000000 // ({_RRF_K} + l.lex_rank), 0)
                + COALESCE(1000000 // ({_RRF_K} + s.sem_rank), 0) AS BIGINT)
             AS rrf_micro,
           l.lex_rank, s.sem_rank
    FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
    ORDER BY rrf_micro DESC, doc_id
    LIMIT {_RRF_TOPK}
    """,
)
def rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic retrieval
    ranking (Cormack et al., SIGIR 2009 — the default hybrid-search
    combiner in Elasticsearch/Vespa/OpenSearch): the fixed BM25 query
    ranking ({_RRF_LIST} deep, the shared ``_bm25_scored`` scorer) is
    fused with the cosine ranking against the vec_id=0 query embedding
    via score = Σ 1/({_RRF_K}+rank), and the top-{_RRF_TOPK} fused
    documents are returned with their per-list ranks (NULL where a
    list didn't retrieve the doc — RRF's whole point is graceful
    single-list membership).

    Scale posture: each input ranking is a TakeOrderedAndProject cut
    (no global sort); the rank windows then run over the ≤{_RRF_LIST}
    retained rows only — bounded single-partition windows over reduced
    data, the catalog's standard top-k shape. The fusion join and
    final cut touch ≤2·{_RRF_LIST} rows. Cross-engine determinism: the
    fused score is INTEGER micro-units via floor division (1e6 div
    ({_RRF_K}+rank)) — float 1/61+1/85 style sums never compare —
    ranks tie-break on doc_id, cosine/BM25 are 6dp-rounded before
    ordering (the bm25_topk libm caveat applies)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]

    lex_top = (
        _bm25_scored(docs)
        .orderBy(F.col("bm25_score").desc(), "doc_id")
        .limit(_RRF_LIST)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), "doc_id"))
        .cast("int")
        .alias("lex_rank"),
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    cos = F.round(cosine_expr("embedding", "q_emb"), 6)
    sem_top = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_RRF_LIST)
    )
    sem = sem_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), "doc_id"))
        .cast("int")
        .alias("sem_rank"),
    )
    return (
        lex.join(sem, "doc_id", "full")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + lex_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + sem_rank)"), F.lit(0)
                )
            )
            .cast("bigint")
            .alias("rrf_micro"),
            "lex_rank",
            "sem_rank",
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )


# ---------------------------------------------------------------------------
# Negative-sampling distribution (word2vec unigram^0.75 table)
# ---------------------------------------------------------------------------

_NEG_TOPK = 50


@register(
    "negative_sampling_table",
    oracle=f"""
    WITH counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(STR_SPLIT(text, ' ')) AS term FROM documents)
      WHERE term <> ''
      GROUP BY term
    ),
    weighted AS (
      SELECT term, freq,
             CAST(ROUND(SQRT(SQRT(CAST(freq AS DOUBLE) * freq * freq))
                        * 1000000000) AS BIGINT) AS w_nano
      FROM counts
    ),
    tot AS (SELECT SUM(w_nano) AS z FROM weighted)
    SELECT term, freq, w_nano,
           CAST(CAST(w_nano AS HUGEINT) * 1000000 // tot.z AS BIGINT)
             AS p_ppm
    FROM weighted CROSS JOIN tot
    ORDER BY freq DESC, term
    LIMIT {_NEG_TOPK}
    """,
)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling distribution: unigram counts
    raised to the 3/4 power and normalized (Mikolov et al. 2013 — the
    exponent that up-weights rare words enough to make negatives
    informative), emitted as the top-{_NEG_TOPK} head of the sampling
    table with each term's probability in ppm. This is the table a
    training pipeline materializes once and broadcasts to every
    negative-sampling worker; the normalizer uses the FULL vocabulary
    even though only the head is emitted.

    Scale posture: map-side-combinable term counts (one shuffle), a
    1-row normalizer broadcast, and a TakeOrderedAndProject top-K cut
    — no global sort of the vocabulary. Cross-engine determinism:
    freq^0.75 is computed as SQRT(SQRT(freq³)) — two IEEE
    correctly-rounded sqrts over an identically-ordered double product
    — NEVER POW(x, 0.75), whose exp/ln implementation differs by ulps
    between engines; each weight rounds to integer nano-units BEFORE
    the normalizer sum; probabilities are HUGEINT/DECIMAL ppm
    floor-divisions.

    Reference surface: none (novel extension, SURVEY.md §2.5 curation
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    counts = (
        t.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    fd = F.col("freq").cast("double")
    weighted = counts.select(
        "term",
        "freq",
        F.round(F.sqrt(F.sqrt(fd * F.col("freq") * F.col("freq"))) * 1000000000)
        .cast("bigint")
        .alias("w_nano"),
    )
    # DECIMAL(38) accumulator: at web scale Σ freq^0.75·1e9 exceeds
    # int64 (the oracle's SUM already promotes to HUGEINT)
    tot = weighted.agg(F.sum(F.col("w_nano").cast("decimal(38,0)")).alias("z"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "freq",
            "w_nano",
            F.expr(
                "CAST(CAST(w_nano AS DECIMAL(38,0)) * 1000000"
                " div z AS BIGINT)"
            ).alias("p_ppm"),
        )
        .orderBy(F.col("freq").desc(), "term")
        .limit(_NEG_TOPK)
    )


# ---------------------------------------------------------------------------
# Quantile normalization of doc length across sources
# ---------------------------------------------------------------------------


@register(
    "quantile_normalize_doclen",
    oracle="""
    WITH hist AS (
      SELECT source, n_chars, COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    hs AS (
      SELECT source, n_chars, cnt,
             SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS n_s
      FROM hist
    ),
    pp AS (
      SELECT n_chars,
             SUM(pcnt) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcum
      FROM (SELECT n_chars, SUM(cnt) AS pcnt FROM hist GROUP BY 1)
    ),
    nn AS (SELECT SUM(cnt) AS n FROM hist)
    SELECT h.source, h.n_chars,
           CAST(h.cnt AS BIGINT) AS n_docs,
           CAST(h.cum AS BIGINT) AS src_cum,
           CAST((CAST(h.cum AS HUGEINT) * nn.n + h.n_s - 1) // h.n_s
                AS BIGINT) AS target_idx,
           CAST(MIN(CASE WHEN p.pcum >=
                           (CAST(h.cum AS HUGEINT) * nn.n + h.n_s - 1)
                             // h.n_s
                         THEN p.n_chars END) AS BIGINT) AS pooled_equiv
    FROM hs h CROSS JOIN nn JOIN pp p ON TRUE
    GROUP BY h.source, h.n_chars, h.cnt, h.cum, h.n_s, nn.n
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources (the
    microarray batch-correction recipe applied to corpus curation):
    each (source, length) maps to the POOLED length at the same
    within-source percentile — PERCENTILE_DISC convention, target
    index ceil(rank·N/n_s) — so per-source length distributions become
    comparable before length-based filtering. The output is the
    normalization TABLE (one row per source×distinct-length), which a
    pipeline broadcast-joins back to documents; emitting it at
    histogram grain keeps the result bounded by value cardinality,
    not corpus size.

    Scale posture: the value-histogram pattern end-to-end — raw rows
    collapse to (source, length) counts first; every window runs over
    histogram cardinality (the pooled cumulative window is global but
    over the BOUNDED distinct-length list, the percentile_disc
    precedent); the index lookup is a bounded-histogram × bounded
    -histogram band join (cardinality², independent of row count).
    Cross-engine determinism: pure integer ranks, a DECIMAL(38)/
    HUGEINT ceil-division for the target index, and the selected
    pooled value is an actual data element — no interpolation.

    Reference surface: none (novel extension, SURVEY.md §2.5 curation
    family)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    hist = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ws = Window.partitionBy("source")
    hs = hist.select(
        "source",
        "n_chars",
        "cnt",
        F.sum("cnt")
        .over(ws.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(ws).alias("n_s"),
    )
    pooled = hist.groupBy("n_chars").agg(F.sum("cnt").alias("pcnt"))
    wp = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    pp = pooled.select(
        F.col("n_chars").alias("p_chars"), F.sum("pcnt").over(wp).alias("pcum")
    )
    nn = hist.agg(F.sum("cnt").alias("n"))
    idx = F.expr("CAST((CAST(cum AS DECIMAL(38,0)) * n + n_s - 1) div n_s AS BIGINT)")
    joined = (
        hs.crossJoin(F.broadcast(nn))
        .withColumn("target_idx", idx)
        .join(
            F.broadcast(pp),
            F.col("pcum") >= F.col("target_idx"),
        )
    )
    return joined.groupBy("source", "n_chars", "cnt", "cum", "target_idx").agg(
        F.min("p_chars").cast("bigint").alias("pooled_equiv")
    ).select(
        "source",
        "n_chars",
        F.col("cnt").cast("bigint").alias("n_docs"),
        F.col("cum").cast("bigint").alias("src_cum"),
        "target_idx",
        "pooled_equiv",
    )


# ---------------------------------------------------------------------------
# Per-document character entropy (compression-proxy quality filter)
# ---------------------------------------------------------------------------


@register(
    "doc_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, SUBSTR(text, CAST(i AS INTEGER), 1) AS c
      FROM documents, (SELECT UNNEST(RANGE(1, 10001)) AS i)
      WHERE i <= LENGTH(text)
    ),
    hist AS (
      SELECT doc_id, c, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS len
      FROM chars GROUP BY doc_id, c
    )
    SELECT doc_id,
           CAST(MIN(len) AS BIGINT) AS n_chars_used,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           CAST(-SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / len)
                                * LN(CAST(cnt AS DOUBLE) / len)
                                * 1000000000) AS BIGINT)) AS BIGINT)
             AS entropy_nano
    FROM hist GROUP BY doc_id
    """,
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats, nano-units)
    — the compression-proxy quality filter (low entropy ⇒ repetitive
    boilerplate, near-uniform entropy ⇒ encrypted/binary junk) that
    complements the token-level repetition stats; production corpus
    filters (e.g. CCNet-style) bucket documents on exactly this
    number. Capped at the first 10k characters per doc (a frozen cap
    shared by both engines) so per-row fan-out is bounded.

    Scale posture: one bounded per-char explode collapses immediately
    to a (doc, char) histogram (≤ alphabet size per doc); the per-doc
    window runs over that histogram, not characters. Cross-engine
    determinism: each −p·ln(p) term computes on the identical double
    division and rounds to integer nano-units BEFORE the per-doc sum
    (the transcendental-sum policy).

    Reference surface: none (novel extension, SURVEY.md §2.5
    text-analysis family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    # Empty-text guard (ADVICE r11): sequence(1, 0) DESCENDS in Spark
    # (default step -1), which would fabricate two empty-char rows for
    # a zero-length doc while the oracle's WHERE i <= LENGTH(text)
    # drops the doc entirely. Filter matches the oracle's implicit
    # row-drop; current corpora have min length 44, so this is a
    # latent-divergence guard, not a behavior change on shipped data.
    # split('') yields the per-codepoint char array in ONE O(n) pass;
    # the previous transform(sequence(...), i -> substring(text, i, 1))
    # re-walked the UTF-8 prefix for every position (substring(_, i, 1)
    # is O(i) on UTF8String), i.e. O(n²) per doc — measured 2.6s → 0.8s
    # on the sf0.1 histogram core, rows verified identical (guide §1.2
    # per-task work; same explode→histogram shape, same results).
    chars = (
        t.where(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.expr("slice(split(text, ''), 1, 10000)")).alias("c"),
        )
    )
    wd = Window.partitionBy("doc_id")
    hist = (
        chars.groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.sum("cnt").over(wd))
    )
    p = F.col("cnt").cast("double") / F.col("len")
    term = F.round(p * F.log(p) * 1000000000).cast("bigint")
    return hist.groupBy("doc_id").agg(
        F.min("len").cast("bigint").alias("n_chars_used"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        (-F.sum(term)).cast("bigint").alias("entropy_nano"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement via Gumbel keys
# ---------------------------------------------------------------------------

_GUMBEL_K = 100  # sample size (fixed top-k cut)


def _gumbel_hexwalk_sql(n_hex: int = 4) -> str:
    """Generated STRPOS walk over the first ``n_hex`` md5 hex chars of
    the seeded doc key — same-constant twin of the Spark conv()."""
    expr = "0"
    for i in range(1, n_hex + 1):
        expr = (
            f"({expr} * 16 + STRPOS('0123456789abcdef',"
            f" SUBSTR(MD5('g|' || CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        )
    return expr


@register(
    "weighted_sample_gumbel",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
             ROUND(LN(CAST(n_chars AS DOUBLE))
                   - LN(-LN(CAST({_gumbel_hexwalk_sql()} + 1 AS DOUBLE)
                            / 65537.0)), 6) AS gumbel_key
      FROM documents WHERE n_chars > 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, source, weight, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id
    LIMIT {_GUMBEL_K}
    """,
)
def weighted_sample_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Gumbel-top-k
    trick (Efraimidis-Spirakis / Vieira): each doc gets key
    ln(w) + Gumbel(0,1) with the Gumbel drawn from a deterministic
    md5-hash uniform, and the top-{_GUMBEL_K} keys are a length-biased
    sample without replacement — the one-pass distributed way to draw
    a weighted sample at 100 TB (rejection/sequential methods need
    coordination; top-k by key needs none, and reproducibility comes
    free from the hash seed).

    Scale posture: pure per-row codegen arithmetic + a
    TakeOrderedAndProject top-k — no shuffle beyond the cut, no state.
    Cross-engine determinism: the uniform is (hash16+1)/65537 from 4
    md5 hex chars (conv == the oracle's generated STRPOS walk,
    seeded 'g|'), u ∈ (0,1) strictly so both LNs are finite; the key
    is one identically-ordered double expression rounded to 6dp, and
    the ordering uses the ROUNDED key with a doc_id tiebreak (the
    bm25_topk boundary policy).

    Reference surface: none (novel extension, SURVEY.md §2.5 curation
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("g|"), F.col("doc_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    u = (h16 + 1).cast("double") / 65537.0
    key = F.round(
        F.log(F.col("n_chars").cast("double")) - F.log(-F.log(u)), 6
    )
    keyed = (
        t.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(_GUMBEL_K)
    )
    w = Window.orderBy(F.col("gumbel_key").desc(), "doc_id")
    return keyed.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "source",
        "weight",
        "gumbel_key",
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage curve
# ---------------------------------------------------------------------------

_VC_KS = (1, 2, 4, 8, 16, 32)  # top-K type cuts (frozen curve grid)
_VC_MAX_K = max(_VC_KS)


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS HUGEINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM counts
    ),
    top AS (
      SELECT * FROM (
        SELECT w, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rn,
               SUM(cnt) OVER (ORDER BY cnt DESC, w
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
      ) WHERE rn <= {_VC_MAX_K}
    ),
    ks AS (SELECT UNNEST([{', '.join(map(str, _VC_KS))}]) AS k)
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(LEAST(k.k, t.vocab) AS BIGINT) AS top_types,
           CAST(MAX(CASE WHEN p.rn <= k.k THEN p.cum END) AS BIGINT)
             AS covered_tokens,
           CAST(t.total AS BIGINT) AS total_tokens,
           CAST(MAX(CASE WHEN p.rn <= k.k THEN p.cum END)
                * CAST(1000000 AS HUGEINT) // t.total AS BIGINT)
             AS coverage_ppm
    FROM ks k CROSS JOIN tot t JOIN top p ON p.rn <= k.k
    GROUP BY k.k, t.vocab, t.total
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all token OCCURRENCES
    covered by the top-K token TYPES, for K on a fixed grid — the
    first question of tokenizer/vocab design (how big must the vocab
    be before OOV mass is negligible?) and the Zipf-concentration
    audit next to ``token_rarity``/``negative_sampling_table``. The
    grid tops out at {_VC_MAX_K} to stay non-degenerate on the test
    corpus's bounded vocabulary; at production scale the same curve
    runs with larger K.

    Scale posture: ONE token-count aggregation (map-side combined,
    vocab-sized output), a TakeOrderedAndProject top-{_VC_MAX_K} cut,
    and windows/joins only over that fixed-size frame — the global
    rank is never materialized beyond K. Cross-engine determinism:
    (cnt DESC, w) pins every rank and the cumulative sum; counts are
    exact BIGINTs; coverage_ppm is a HUGEINT/DECIMAL(38) floor
    division.

    Reference surface: none (novel extension, SURVEY.md §2.5
    text-analysis family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    counts = (
        t.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = counts.agg(
        F.expr("CAST(SUM(cnt) AS DECIMAL(38,0))").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    wtop = Window.orderBy(F.col("cnt").desc(), "w")
    top = (
        counts.orderBy(F.col("cnt").desc(), "w")
        .limit(_VC_MAX_K)
        .select(
            "w",
            "cnt",
            F.row_number().over(wtop).alias("rn"),
            F.sum("cnt")
            .over(wtop.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        )
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _VC_KS])).alias("k")
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(F.broadcast(top), F.col("rn") <= F.col("k"))
        .groupBy("k", "vocab", "total")
        .agg(
            F.max(F.when(F.col("rn") <= F.col("k"), F.col("cum")))
            .cast("bigint")
            .alias("covered_tokens"),
        )
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.least("k", "vocab").cast("bigint").alias("top_types"),
            "covered_tokens",
            F.col("total").cast("bigint").alias("total_tokens"),
            F.expr(
                "CAST(CAST(covered_tokens AS DECIMAL(38,0)) * 1000000"
                " div total AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Character bigram conditional entropy per source
# ---------------------------------------------------------------------------

_BGE_CAP = 2000  # chars per doc entering the bigram histogram (frozen)


@register(
    "bigram_cond_entropy_by_source",
    oracle=f"""
    WITH grams AS (
      SELECT source, SUBSTR(text, CAST(i AS INTEGER), 1) AS c1,
             SUBSTR(text, CAST(i + 1 AS INTEGER), 1) AS c2
      FROM documents, (SELECT UNNEST(RANGE(1, {_BGE_CAP})) AS i)
      WHERE i <= LENGTH(text) - 1
    ),
    big AS (
      SELECT source, c1, c2, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (PARTITION BY source) AS tot
      FROM grams GROUP BY source, c1, c2
    ),
    h2 AS (
      SELECT source, CAST(MIN(tot) AS BIGINT) AS n_bigrams,
             CAST(-SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / tot)
                                  * LN(CAST(cnt AS DOUBLE) / tot)
                                  * 1000000000) AS BIGINT)) AS BIGINT)
               AS h_bigram_nano
      FROM big GROUP BY source
    ),
    uni AS (
      SELECT source, c1, CAST(SUM(cnt) AS BIGINT) AS cnt,
             CAST(MIN(tot) AS BIGINT) AS tot
      FROM big GROUP BY source, c1
    ),
    h1 AS (
      SELECT source,
             CAST(-SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / tot)
                                  * LN(CAST(cnt AS DOUBLE) / tot)
                                  * 1000000000) AS BIGINT)) AS BIGINT)
               AS h_unigram_nano
      FROM uni GROUP BY source
    )
    SELECT h2.source, h2.n_bigrams, h2.h_bigram_nano, h1.h_unigram_nano,
           CAST(h2.h_bigram_nano - h1.h_unigram_nano AS BIGINT)
             AS h_cond_nano
    FROM h2 JOIN h1 ON h1.source = h2.source
    """,
)
def bigram_cond_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level conditional entropy H(c₂|c₁) = H(c₁,c₂) − H(c₁)
    per source — the sequential-structure complement of per-document
    ``doc_char_entropy``: low conditional entropy means characters are
    highly predictable from their predecessor (templated/boilerplate
    text, the compression-proxy signal n-gram LMs exploit), and
    per-source deltas flag sources whose text is structurally
    different even when their unigram mix matches. First {_BGE_CAP}
    chars per doc (frozen cap, both engines).

    Scale posture: the bounded per-char explode collapses immediately
    to a (source, c1, c2) histogram (≤ alphabet² per source) with
    map-side combine; the unigram histogram derives from the bigram
    one (no second scan); windows run over the bounded histogram.
    Cross-engine determinism: each −p·ln p term nano-rounds BEFORE its
    sum (transcendental-sum policy); n_bigrams ties the two entropies
    to one shared denominator.

    Reference surface: none (novel extension, SURVEY.md §2.5
    text-analysis family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    # char array via one O(n) split('') instead of the O(n²)
    # per-position substring walk (see doc_char_entropy); adjacent
    # pairs are O(1) array indexing over it. Identical (c1, c2) rows:
    # pair i covers chars i, i+1 for i ≤ min(len, CAP) − 1.
    grams = (
        t.where(F.length("text") > 1)
        .select(
            "source",
            F.expr(f"slice(split(text, ''), 1, {_BGE_CAP})").alias("cs"),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(cs) - 2),"
                    " i -> struct(cs[i] AS c1, cs[i + 1] AS c2))"
                )
            ).alias("g"),
        )
        .select("source", "g.c1", "g.c2")
    )
    ws = Window.partitionBy("source")
    big = (
        grams.groupBy("source", "c1", "c2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("tot", F.sum("cnt").over(ws))
    )
    term = lambda: F.round(  # noqa: E731 - tiny shared expression
        (F.col("cnt").cast("double") / F.col("tot"))
        * F.log(F.col("cnt").cast("double") / F.col("tot"))
        * 1000000000
    ).cast("bigint")
    h2 = big.groupBy("source").agg(
        F.min("tot").cast("bigint").alias("n_bigrams"),
        (-F.sum(term())).cast("bigint").alias("h_bigram_nano"),
    )
    uni = big.groupBy("source", "c1").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.min("tot").cast("bigint").alias("tot"),
    )
    h1 = uni.groupBy("source").agg(
        (-F.sum(term())).cast("bigint").alias("h_unigram_nano")
    )
    return (
        h2.join(h1, "source")
        .select(
            "source",
            "n_bigrams",
            "h_bigram_nano",
            "h_unigram_nano",
            (F.col("h_bigram_nano") - F.col("h_unigram_nano"))
            .cast("bigint")
            .alias("h_cond_nano"),
        )
    )


# ---------------------------------------------------------------------------
# Hill estimator of the document-length tail exponent, per source
# ---------------------------------------------------------------------------

_HILL_K = 50  # tail order statistics per source (frozen)


@register(
    "doclen_tail_hill",
    oracle=f"""
    WITH ranked AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents WHERE n_chars > 0
    ),
    tail AS (SELECT * FROM ranked WHERE rn <= {_HILL_K}),
    xk AS (
      SELECT source, CAST(MIN(x) AS BIGINT) AS x_k,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM tail GROUP BY source
    )
    SELECT t.source, x.k, x.x_k,
           CAST(SUM(CAST(ROUND(LN(CAST(t.x AS DOUBLE) / x.x_k)
                                * 1000000000) AS BIGINT)) AS BIGINT)
             AS sum_log_ratio_nano,
           CAST(CASE WHEN SUM(CAST(ROUND(LN(CAST(t.x AS DOUBLE) / x.x_k)
                                         * 1000000000) AS BIGINT)) > 0
                THEN CAST(x.k - 1 AS HUGEINT) * 1000000000 * 1000000
                     // SUM(CAST(ROUND(LN(CAST(t.x AS DOUBLE) / x.x_k)
                                       * 1000000000) AS BIGINT))
                END AS BIGINT) AS hill_alpha_micro
    FROM tail t JOIN xk x ON x.source = t.source
    WHERE t.rn < x.k
    GROUP BY t.source, x.k, x.x_k
    """,
)
def doclen_tail_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail exponent per source:
    α̂ = (k−1) / Σ_{{i<k}} ln(x_(i)/x_(k)) over the top-{_HILL_K}
    order statistics — the standard check on whether a corpus's long
    documents follow the power law that sizing decisions assume
    (chunk budgets, ``pack_greedy_bins`` bin sizes, shuffle partition
    caps are all set against this tail; α ≤ 2 means the tail has
    infinite variance and mean-based capacity planning lies). α
    reported per source so a heavy-tailed source stands out.

    Scale posture: the per-source top-k is a bounded rank cut (window
    over the per-source partition; k·sources rows thereafter), never
    a global sort of the corpus. Cross-engine determinism: the rank
    is pinned (n_chars DESC, doc_id); each ln ratio nano-rounds
    BEFORE the sum (transcendental-sum policy); α̂ is one exact
    HUGEINT/DECIMAL(38) micro floor-division; a degenerate all-equal
    tail (Σ = 0) reports NULL α identically.

    Reference surface: none (novel extension, SURVEY.md §2.5
    text-analysis family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    ranked = (
        t.where(F.col("n_chars") > 0)
        .select(
            "source",
            F.col("n_chars").cast("bigint").alias("x"),
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.col("n_chars").desc(), "doc_id"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= _HILL_K)
    )
    xk = ranked.groupBy("source").agg(
        F.min("x").cast("bigint").alias("x_k"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    term = (
        F.round(
            F.log(F.col("x").cast("double") / F.col("x_k")) * 1000000000
        ).cast("bigint")
    )
    return (
        ranked.join(F.broadcast(xk), "source")
        .where(F.col("rn") < F.col("k"))
        .groupBy("source", "k", "x_k")
        .agg(F.sum(term).cast("bigint").alias("sum_log_ratio_nano"))
        .select(
            "source",
            "k",
            "x_k",
            "sum_log_ratio_nano",
            F.expr(
                "CAST(CASE WHEN sum_log_ratio_nano > 0 THEN"
                " CAST(k - 1 AS DECIMAL(38,0)) * 1000000000 * 1000000"
                " div sum_log_ratio_nano END AS BIGINT)"
            ).alias("hill_alpha_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Hellinger / total-variation distance between source unigram dists
# ---------------------------------------------------------------------------


@register(
    "hellinger_tv_sources",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    tot AS (SELECT source, SUM(cnt) AS total FROM tc GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(ROUND(SQRT((CAST(a.cnt AS DOUBLE) / ta.total)
                             * (CAST(b.cnt AS DOUBLE) / tb.total))
                        * 1000000000) AS BIGINT) AS bc_nano,
             CAST(ROUND(ABS(CAST(a.cnt AS DOUBLE) / ta.total
                            - CAST(b.cnt AS DOUBLE) / tb.total)
                        * 1000000000) AS BIGINT) AS tv_nano,
             a.cnt AS ca, b.cnt AS cb
      FROM tc a
      JOIN tc b ON b.tok = a.tok AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
    ),
    agg AS (
      SELECT source_a, source_b,
             SUM(bc_nano) AS bc_sum, SUM(tv_nano) AS tv_sum,
             SUM(ca) AS shared_ca, SUM(cb) AS shared_cb
      FROM shared GROUP BY 1, 2
    ),
    -- the full bounded pair grid: disjoint-vocabulary pairs must
    -- surface as H=1/TV=1, not silently vanish from the inner join
    grid AS (
      SELECT ta.source AS source_a, ta.total AS ta,
             tb.source AS source_b, tb.total AS tb
      FROM tot ta JOIN tot tb ON ta.source < tb.source
    )
    SELECT p.source_a, p.source_b,
           ROUND(COALESCE(g.bc_sum, 0) / 1e9, 6) AS bc_coefficient,
           ROUND(SQRT(GREATEST(1e0 - COALESCE(g.bc_sum, 0) / 1e9, 0e0)), 6)
             AS hellinger,
           ROUND((COALESCE(g.tv_sum, 0) / 1e9
                  + (1e0 - CAST(COALESCE(g.shared_ca, 0) AS DOUBLE) / p.ta)
                  + (1e0 - CAST(COALESCE(g.shared_cb, 0) AS DOUBLE) / p.tb))
                 / 2e0, 6) AS tv_distance
    FROM grid p
    LEFT JOIN agg g
      ON g.source_a = p.source_a AND g.source_b = p.source_b
    """,
)
def hellinger_tv_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance, Bhattacharyya coefficient, and total-
    variation distance between every pair of sources' unigram
    distributions — the three bounded-metric complements to
    ``text_js_divergence_sources`` (JS is entropy-shaped; Hellinger is
    the geometric sqrt metric, TV the worst-case-event bound via
    TV = sup|P(A)−Q(A)|). A domain-mixing pipeline reads TV as "the
    largest probability gap any token event can see between these two
    sources".

    Scale posture: identical to the JS operator — the (source, token)
    aggregate is vocab-bounded, the pair join fans each token to at
    most sources² rows, and tokens present in only one source
    contribute closed-form corrections from exact integer masses
    (|p−0| sums to the unshared mass; sqrt(p·0) contributes 0 to BC),
    so no full-outer join. Cross-engine determinism: each shared-token
    term is one fixed-operand-order double rounded to nano integers
    BEFORE summation; the corrections are final expressions over exact
    integer counts.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    tc = _source_token_counts(spark, sf_dir)
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    a = tc.alias("a")
    b = tc.alias("b")
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("total").alias("ta")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("total").alias("tb")
    )
    shared = (
        a.join(
            b,
            (F.col("b.tok") == F.col("a.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.cnt").alias("ca"),
            F.col("b.cnt").alias("cb"),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "ca",
            "cb",
            F.expr(
                "CAST(ROUND(SQRT((CAST(ca AS DOUBLE) / ta)"
                " * (CAST(cb AS DOUBLE) / tb)) * 1000000000) AS BIGINT)"
            ).alias("bc_nano"),
            F.expr(
                "CAST(ROUND(ABS(CAST(ca AS DOUBLE) / ta"
                " - CAST(cb AS DOUBLE) / tb) * 1000000000) AS BIGINT)"
            ).alias("tv_nano"),
        )
    )
    agg = shared.groupBy("source_a", "source_b").agg(
        F.sum("bc_nano").alias("bc_sum"),
        F.sum("tv_nano").alias("tv_sum"),
        F.sum("ca").alias("shared_ca"),
        F.sum("cb").alias("shared_cb"),
    )
    # full bounded pair grid: disjoint-vocabulary pairs must surface
    # as H=1/TV=1, not silently vanish from the inner pair join
    grid = ta.join(tb, F.col("source_a") < F.col("source_b"))
    return (
        F.broadcast(grid)
        .join(agg, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.expr("ROUND(COALESCE(bc_sum, 0) / 1e9, 6)").alias(
                "bc_coefficient"
            ),
            F.expr(
                "ROUND(SQRT(GREATEST(1e0 - COALESCE(bc_sum, 0) / 1e9,"
                " 0e0)), 6)"
            ).alias("hellinger"),
            F.expr(
                "ROUND((COALESCE(tv_sum, 0) / 1e9"
                " + (1e0 - CAST(COALESCE(shared_ca, 0) AS DOUBLE) / ta)"
                " + (1e0 - CAST(COALESCE(shared_cb, 0) AS DOUBLE) / tb))"
                " / 2e0, 6)"
            ).alias("tv_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Good-Turing unseen-mass estimate per source
# ---------------------------------------------------------------------------


@register(
    "good_turing_mass",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    fof AS (
      SELECT source, cnt AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM tc GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(n_r) AS BIGINT) AS vocab,
             CAST(MAX(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
               AS n_hapax,
             CAST(MAX(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT)
               AS n_dis
      FROM fof GROUP BY source
    )
    SELECT source, n_tokens, vocab, n_hapax, n_dis,
           CAST(CAST(n_hapax AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
             AS p0_ppm,
           CASE WHEN n_hapax > 0
                THEN CAST(CAST(n_dis AS HUGEINT) * 2000000 // n_hapax
                          AS BIGINT) END AS r1_star_micro
    FROM agg WHERE n_tokens > 0
    ORDER BY source
    """,
)
def good_turing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate per source: p₀ = N₁/N (the
    probability the NEXT token drawn from this source is a never-seen
    type — the quantity Kneser-Ney discounts exist to cover, cf.
    ``bigram_kneser_ney``) and the Turing-smoothed count for hapaxes
    r₁* = 2·N₂/N₁. High p0_ppm means the source's vocabulary is still
    growing fast (cf. ``heaps_law_fit``) and rare-token estimates are
    unreliable.

    Scale posture: the (source, token) aggregate is vocab-bounded, the
    frequency-of-frequencies table collapses it to ≤ distinct-count
    rows per source, and the readout is one bounded row per source.
    All outputs are exact integers (truncating ppm/micro divisions in
    DECIMAL(38)/HUGEINT) — zero doubles anywhere.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    tc = _source_token_counts(spark, sf_dir)
    fof = tc.groupBy("source", F.col("cnt").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    agg = fof.groupBy("source").agg(
        F.expr("CAST(SUM(r * n_r) AS BIGINT)").alias("n_tokens"),
        F.sum("n_r").cast("bigint").alias("vocab"),
        F.expr(
            "CAST(MAX(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)"
        ).alias("n_hapax"),
        F.expr(
            "CAST(MAX(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT)"
        ).alias("n_dis"),
    )
    return (
        agg.where("n_tokens > 0")
        .select(
            "source",
            "n_tokens",
            "vocab",
            "n_hapax",
            "n_dis",
            F.expr(
                "CAST(CAST(n_hapax AS DECIMAL(38,0)) * 1000000"
                " div n_tokens AS BIGINT)"
            ).alias("p0_ppm"),
            F.expr(
                "CASE WHEN n_hapax > 0 THEN"
                " CAST(CAST(n_dis AS DECIMAL(38,0)) * 2000000"
                " div n_hapax AS BIGINT) END"
            ).alias("r1_star_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Heaps' law fit: vocabulary growth V(T) ~ K * T^beta
# ---------------------------------------------------------------------------

# OLS slope in ln-ln space over the 10 decile points, from the exact
# nano-rounded ln sums (n = 10 fixed). Both axes carry the same 1e9
# nano scale, which CANCELS in the slope ratio — the numpy pin test
# caught an erroneous /1e9 here that both engines had agreed on
# (the single-sourced-formula trap the pins exist for).
_HEAPS_BETA = (
    "(10e0 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
    " / (10e0 * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"
)


@register(
    "heaps_law_fit",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), x -> x <> ''))
                  AS BIGINT) AS tok_cnt
      FROM documents
    ),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk,
             SUM(tok_cnt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               AS cum_tok
      FROM docs
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
    bounds AS (
      SELECT d, r.doc_id AS b_id, r.cum_tok
      FROM (SELECT CAST(UNNEST(GENERATE_SERIES(1, 10)) AS BIGINT) AS d)
      CROSS JOIN tot
      JOIN ranked r ON r.rnk = n * d // 10
    ),
    firsts AS (
      SELECT tok, MIN(doc_id) AS fo FROM (
        SELECT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ),
    curve AS (
      SELECT b.d, b.cum_tok AS tokens_prefix,
             CAST(COUNT(*) AS BIGINT) AS vocab_prefix
      FROM firsts f JOIN bounds b ON f.fo <= b.b_id
      GROUP BY 1, 2
    ),
    lnpts AS (
      SELECT d, tokens_prefix, vocab_prefix,
             CAST(ROUND(LN(CAST(tokens_prefix AS DOUBLE)) * 1000000000)
                  AS BIGINT) AS lx,
             CAST(ROUND(LN(CAST(vocab_prefix AS DOUBLE)) * 1000000000)
                  AS BIGINT) AS ly
      FROM curve
    ),
    fit AS (
      SELECT CAST(SUM(lx) AS HUGEINT) AS sx, CAST(SUM(ly) AS HUGEINT) AS sy,
             CAST(SUM(CAST(lx AS HUGEINT) * lx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(lx AS HUGEINT) * ly) AS HUGEINT) AS sxy
      FROM lnpts
    )
    SELECT p.d AS decile, CAST(p.tokens_prefix AS BIGINT) AS tokens_prefix,
           p.vocab_prefix,
           ROUND({_HEAPS_BETA}, 6) AS beta_fit
    FROM lnpts p CROSS JOIN fit
    ORDER BY p.d
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit V(T) ≈ K·T^β: the vocabulary-growth exponent of
    the corpus, measured at the ten doc-order decile prefixes and
    fitted by OLS in ln-ln space. β near 1 means vocabulary still
    grows linearly with tokens (dedup/normalization headroom); β
    around 0.4-0.6 is typical settled natural text. The doc-prefix
    curve complements ``good_turing_mass`` (instantaneous unseen
    probability) and ``vocab_coverage_curve`` (top-K share).

    Scale posture: the doc rank AND the cumulative token prefix come
    from the two-pass banded pattern (row_number / running sum within
    a doc_id band + broadcast per-band offsets — the
    ``lorenz_curve_points`` machinery), so no input-cardinality global
    window; first-occurrence per token is one combinable MIN; the
    decile readout joins tokens' first-occurrence doc against a
    broadcast 10-row boundary table (≤10× vocab fan-in, map-side
    combinable count). The ln-ln fit runs over TEN bounded points with
    nano-rounded ln terms summed exactly (sum-order immunity).

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    docs = t.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)"
        ).alias("tok_cnt"),
    )
    docs = docs.withColumn(
        "bucket", F.floor(F.col("doc_id") / F.lit(1024)).cast("bigint")
    )
    w_in = Window.partitionBy("bucket").orderBy("doc_id")
    w_in_sum = w_in.rowsBetween(Window.unboundedPreceding, 0)
    within = docs.withColumn("rn", F.row_number().over(w_in)).withColumn(
        "csum", F.sum(F.col("tok_cnt").cast("decimal(38,0)")).over(w_in_sum)
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        docs.groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.expr("CAST(SUM(tok_cnt) AS DECIMAL(38,0))").alias("bsum"),
        )
        .select(
            "bucket",
            F.coalesce(F.sum("cnt").over(w_b), F.lit(0)).alias("offset"),
            F.coalesce(
                F.sum("bsum").over(w_b), F.lit(0).cast("decimal(38,0)")
            ).alias("tok_offset"),
        )
    )
    ranked = within.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        (F.col("offset") + F.col("rn")).cast("bigint").alias("rnk"),
        (F.col("tok_offset") + F.col("csum"))
        .cast("bigint")
        .alias("cum_tok"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    deciles = spark.range(1, 11).select(F.col("id").cast("bigint").alias("d"))
    bounds = (
        F.broadcast(deciles)
        .join(F.broadcast(tot))
        .select("d", F.expr("CAST(n * d div 10 AS BIGINT)").alias("rnk"))
        .join(ranked, "rnk")
        .select("d", F.col("doc_id").alias("b_id"), "cum_tok")
    )
    firsts = (
        t.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fo"))
    )
    curve = (
        firsts.join(F.broadcast(bounds), F.col("fo") <= F.col("b_id"))
        .groupBy("d", F.col("cum_tok").alias("tokens_prefix"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_prefix"))
    )
    lnpts = curve.select(
        "d",
        "tokens_prefix",
        "vocab_prefix",
        F.expr(
            "CAST(ROUND(LN(CAST(tokens_prefix AS DOUBLE)) * 1000000000)"
            " AS BIGINT)"
        ).alias("lx"),
        F.expr(
            "CAST(ROUND(LN(CAST(vocab_prefix AS DOUBLE)) * 1000000000)"
            " AS BIGINT)"
        ).alias("ly"),
    )
    d38 = "DECIMAL(38,0)"
    fit = lnpts.agg(
        F.expr(f"CAST(SUM(lx) AS {d38})").alias("sx"),
        F.expr(f"CAST(SUM(ly) AS {d38})").alias("sy"),
        F.expr(f"CAST(SUM(CAST(lx AS {d38}) * lx) AS {d38})").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(lx AS {d38}) * ly) AS {d38})").alias("sxy"),
    )
    return (
        lnpts.join(F.broadcast(fit))
        .select(
            F.col("d").alias("decile"),
            F.col("tokens_prefix").cast("bigint").alias("tokens_prefix"),
            "vocab_prefix",
            F.expr(f"ROUND({_HEAPS_BETA}, 6)").alias("beta_fit"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Flesch readability scores per source
# ---------------------------------------------------------------------------


@register(
    "readability_flesch",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), x -> x <> ''))
                  AS BIGINT) AS words,
             CAST(GREATEST(LEN(regexp_extract_all(text, '[.!?]')), 1)
                  AS BIGINT) AS sentences,
             CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+'))
                  AS BIGINT) AS syllables
      FROM documents
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS words,
             CAST(SUM(sentences) AS BIGINT) AS sentences,
             CAST(SUM(syllables) AS BIGINT) AS syllables
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, words, sentences, syllables,
           ROUND(206.835e0 - 1.015e0 * (CAST(words AS DOUBLE) / sentences)
                 - 84.6e0 * (CAST(syllables AS DOUBLE) / words), 4)
             AS flesch_reading_ease,
           ROUND(0.39e0 * (CAST(words AS DOUBLE) / sentences)
                 + 11.8e0 * (CAST(syllables AS DOUBLE) / words)
                 - 15.59e0, 4) AS fk_grade_level
    FROM agg WHERE words > 0 AND sentences > 0
    ORDER BY source
    """,
)
def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease and Flesch-Kincaid grade level per source,
    with the standard published coefficients frozen (206.835/1.015/
    84.6 and 0.39/11.8/15.59). Syllables are approximated by vowel
    GROUPS ([aeiouy]+ runs, the classic cheap estimator) and sentences
    by terminal-punctuation marks clamped to ≥1 per doc — both exact
    integer counts, so the only doubles are the two final formulas.
    The readability axis complements ``text_quality_score`` (length/
    punct ratios) and ``quality_gopher_rules`` for mix curation:
    a source whose grade level collapses is boilerplate; one that
    explodes is OCR noise.

    Scale posture: one pass over documents computing three integer
    regexp counts per doc (JVM-side regexp, no UDF), a combinable
    per-source aggregate, bounded output rows. Cross-engine
    determinism: the regex classes are engine-trivial ([.!?], vowel
    runs), counts are exact integers, the formulas are fixed-operand-
    order doubles rounded at 4dp.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    per_doc = t.select(
        "source",
        F.expr(
            "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)"
        ).alias("words"),
        F.expr(
            "CAST(GREATEST(regexp_count(text, '[.!?]'), 1) AS BIGINT)"
        ).alias("sentences"),
        F.expr(
            "CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)"
        ).alias("syllables"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sentences").cast("bigint").alias("sentences"),
        F.sum("syllables").cast("bigint").alias("syllables"),
    )
    return (
        agg.where("words > 0 AND sentences > 0")
        .select(
            "source",
            "n_docs",
            "words",
            "sentences",
            "syllables",
            F.expr(
                "ROUND(206.835e0 - 1.015e0 * (CAST(words AS DOUBLE)"
                " / sentences) - 84.6e0 * (CAST(syllables AS DOUBLE)"
                " / words), 4)"
            ).alias("flesch_reading_ease"),
            F.expr(
                "ROUND(0.39e0 * (CAST(words AS DOUBLE) / sentences)"
                " + 11.8e0 * (CAST(syllables AS DOUBLE) / words)"
                " - 15.59e0, 4)"
            ).alias("fk_grade_level"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Chao1 species-richness estimate per source
# ---------------------------------------------------------------------------


@register(
    "chao1_richness",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    fof AS (
      SELECT source, cnt AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM tc GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(n_r) AS BIGINT) AS vocab,
             CAST(MAX(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(MAX(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT)
               AS n2
      FROM fof GROUP BY source
    )
    SELECT source, n_tokens, vocab, n1 AS n_hapax, n2 AS n_dis,
           CAST(vocab * 1000000
                + CAST(n1 AS HUGEINT) * (n1 - 1) * 1000000
                  // (2 * (n2 + 1)) AS BIGINT) AS chao1_micro,
           CAST(1000000 - CAST(n1 AS HUGEINT) * 1000000 // n_tokens
                AS BIGINT) AS coverage_ppm
    FROM agg WHERE n_tokens > 0
    ORDER BY source
    """,
)
def chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimator per source: the lower-bound
    extrapolation of TRUE vocabulary size from the observed frequency
    spectrum, Chao1 = V + N₁(N₁−1)/(2(N₂+1)) (bias-corrected form,
    defined even when no doubletons exist), plus the Good coverage
    estimate C = 1 − N₁/N. Where ``good_turing_mass`` answers "what
    mass will the next draw put on unseen types", Chao1 answers "how
    many types exist that we have not seen" — the pair brackets a
    source's vocabulary from both sides for crawl-budget decisions.

    Scale posture: identical to Good-Turing — vocab-bounded (source,
    token) aggregate, frequency-of-frequencies collapse, one bounded
    row per source; all outputs exact integers (truncating micro/ppm
    divisions in HUGEINT/DECIMAL(38)) — zero doubles.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    tc = _source_token_counts(spark, sf_dir)
    fof = tc.groupBy("source", F.col("cnt").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    agg = fof.groupBy("source").agg(
        F.expr("CAST(SUM(r * n_r) AS BIGINT)").alias("n_tokens"),
        F.sum("n_r").cast("bigint").alias("vocab"),
        F.expr(
            "CAST(MAX(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "CAST(MAX(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT)"
        ).alias("n2"),
    )
    d38 = "DECIMAL(38,0)"
    return (
        agg.where("n_tokens > 0")
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.col("n1").alias("n_hapax"),
            F.col("n2").alias("n_dis"),
            F.expr(
                f"CAST(vocab * 1000000 + CAST(n1 AS {d38}) * (n1 - 1)"
                " * 1000000 div (2 * (n2 + 1)) AS BIGINT)"
            ).alias("chao1_micro"),
            F.expr(
                f"CAST(1000000 - CAST(n1 AS {d38}) * 1000000 div n_tokens"
                " AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# KL divergence: each source's unigram mix vs the corpus mix
# ---------------------------------------------------------------------------


@register(
    "kl_divergence_sources",
    oracle=f"""
    WITH tc AS ({_SOURCE_TOK_SQL}),
    ct AS (SELECT tok, SUM(cnt) AS ctot FROM tc GROUP BY tok),
    tot AS (SELECT source, SUM(cnt) AS total FROM tc GROUP BY source),
    n AS (SELECT SUM(cnt) AS grand FROM tc),
    terms AS (
      SELECT tc.source,
             CAST(ROUND((CAST(tc.cnt AS DOUBLE) / tot.total)
                        * LN((CAST(tc.cnt AS DOUBLE) / tot.total)
                             / (CAST(ct.ctot AS DOUBLE) / n.grand))
                        * 1000000000) AS BIGINT) AS t_nano
      FROM tc
      JOIN ct ON ct.tok = tc.tok
      JOIN tot ON tot.source = tc.source
      CROSS JOIN n
    )
    SELECT terms.source,
           CAST(MAX(tot.total) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(SUM(t_nano) / 1000000000.0, 6) AS kl_nats
    FROM terms JOIN tot ON tot.source = terms.source
    GROUP BY terms.source
    """,
)
def kl_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence KL(P_source ‖ P_corpus) of each source's unigram
    distribution from the corpus-wide mix — the ASYMMETRIC
    domain-shift number (how many extra nats a corpus-trained code
    pays on this source) that complements the symmetric pairwise
    ``text_js_divergence_sources``; it is also exactly each source's
    per-token contribution to the mixture's information radius, the
    quantity DSIR-style domain reweighting trades against. Every
    source token exists in the corpus by construction, so q > 0 and
    no smoothing is needed.

    Scale posture: the (source, token) aggregate is vocab-bounded;
    the corpus marginal joins back on the token key (vocab-sized
    both sides); per-term p·ln(p/q) rounds to integer nano-nats
    BEFORE summing (the source_token_entropy determinism pattern),
    so the reduction is exact integer addition in any order.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    tc = _source_token_counts(spark, sf_dir)
    ct = tc.groupBy("tok").agg(F.sum("cnt").alias("ctot"))
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    grand = tc.agg(F.sum("cnt").alias("grand"))
    p = F.col("cnt").cast("double") / F.col("total")
    q = F.col("ctot").cast("double") / F.col("grand")
    terms = (
        tc.join(ct, "tok")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "total",
            F.round(p * F.log(p / q) * 1_000_000_000)
            .cast("bigint")
            .alias("t_nano"),
        )
    )
    return terms.groupBy("source").agg(
        F.max("total").cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(F.sum("t_nano") / 1_000_000_000.0, 6).alias("kl_nats"),
    )


# ---------------------------------------------------------------------------
# Word burstiness (Church-Gale cf/df) — topical-term screen
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 5  # hapax/near-hapax noise floor (df p50 is far above)
_BURST_TOPN = 20


@register(
    "word_burstiness_topk",
    oracle=f"""
    WITH tc AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS cf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    )
    SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY CAST(cf AS DOUBLE) / df DESC, tok) AS INTEGER) AS rank,
           tok, cf, df,
           ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness
    FROM tc WHERE df >= {_BURST_MIN_DF}
    ORDER BY CAST(cf AS DOUBLE) / df DESC, tok
    LIMIT {_BURST_TOPN}
    """,
)
def word_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale word burstiness — collection frequency over
    document frequency, the mean occurrences per CONTAINING document:
    function words hover near cf/df ≈ 1 while topical/template terms
    repeat heavily within the documents they appear in, which is why
    burstiness is the classic screen for boilerplate phrases and
    topical keywords that raw frequency ranks identically. Top-20
    bursty terms above a df >= 5 noise floor (near-hapax terms
    have meaninglessly small denominators).

    Scale posture: one token explode collapsing into a combinable
    (cf, df) vocab aggregate — COUNT + COUNT(DISTINCT doc_id) share
    the exchange — then a TakeOrderedAndProject head; the ratio is
    exact-integer-over-integer rounded once, ties broken by the term.

    Reference surface: none (novel extension, SURVEY.md §2.5 text
    family)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    tc = (
        t.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(
            F.count("*").cast("bigint").alias("cf"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .where(F.col("df") >= _BURST_MIN_DF)
    )
    top = tc.orderBy(
        (F.col("cf").cast("double") / F.col("df")).desc(), "tok"
    ).limit(_BURST_TOPN)
    return top.select(
        F.row_number()
        .over(
            Window.partitionBy().orderBy(
                (F.col("cf").cast("double") / F.col("df")).desc(), "tok"
            )
        )
        .cast("int")
        .alias("rank"),
        "tok",
        "cf",
        "df",
        F.round(F.col("cf").cast("double") / F.col("df"), 6).alias(
            "burstiness"
        ),
    )


# ---------------------------------------------------------------------------
# exact 1-D Wasserstein (earth mover's) distance between source
# doc-length distributions
# ---------------------------------------------------------------------------


@register(
    "wasserstein_doclen_sources",
    oracle="""
    WITH d AS (
      SELECT source, CAST(LENGTH(text) AS BIGINT) AS v
      FROM documents WHERE LENGTH(text) > 0
    ),
    h AS (SELECT source, v, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
    n AS (SELECT source, SUM(cnt) AS n_s FROM h GROUP BY 1),
"""
    + w1_pair_cte_sql([]),
)
def wasserstein_doclen_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT 1-D Wasserstein-1 (earth mover's) distance between every
    source pair's document-length distributions — the transport-cost
    complement to the Hellinger/TV/JS family: W1 = ∫|F_a − F_b| dv is
    the minimum characters-per-document of probability mass movement
    to turn one length profile into the other, so it SEES how far
    apart two distributions are (a source shifted +200 chars scores
    200), where TV only sees that they differ. The curation read: W1
    between a source's snapshot and its trailing profile is the drift
    alarm that ranks sources by how much re-mixing they need.

    Exactness and the pair machinery live in
    functions/wasserstein.py (single-sourced with the sliced-W
    embedding operator on BOTH engine sides): every term is an exact
    integer — DECIMAL(38)/HUGEINT cross-products over the merged step
    grid, one floor division to micro-units per pair. No float enters
    either engine.

    Scale posture: one map-side-combinable (source, length) histogram
    is the only corpus-sized pass; everything after runs on the
    distinct-length grid × sources frame (bounded by the length
    domain, ~500 rows here, ~1e5 at any real corpus) — the pair join
    fans to grid × sources² bounded rows and the global LEAD window
    sits above a tiny aggregate. Cross-check: w1_micro is symmetric,
    zero on the diagonal by construction, and bounded by the length
    range × 1e6 (numpy CDF-area pin in
    tests/test_statistics_sanity.py)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    h = (
        docs.select(
            "source", F.length("text").cast("bigint").alias("v")
        )
        .groupBy("source", "v")
        .agg(F.count("*").alias("cnt"))
    )
    n = h.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    return w1_pair_micro(h, n, part_cols=[])


# ---------------------------------------------------------------------------
# RAKE keyword extraction (gaps-and-islands phrases, degree/frequency
# word scores) — fully relational in both engines
# ---------------------------------------------------------------------------

from rs_streamloader_spark.functions.text_functions import (
    GOPHER_STOPWORDS as _RAKE_STOPWORDS,
)
_RAKE_MAX_PHRASE = 6
_RAKE_TOPK = 15


@register(
    "rake_keyword_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             UNNEST(list_transform(
               range(1, len(string_split(text, ' ')) + 1),
               i -> {{'pos': i, 'tok': string_split(text, ' ')[i]}})) AS u
      FROM documents WHERE LENGTH(text) > 0
    ),
    toks AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM t),
    ns AS (
      SELECT doc_id, pos, tok FROM toks
      WHERE tok NOT IN {_RAKE_STOPWORDS}
    ),
    isl AS (
      SELECT doc_id, pos, tok,
             pos - ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY pos) AS island
      FROM ns
    ),
    ph AS (
      SELECT doc_id, island,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM isl GROUP BY 1, 2
    ),
    mem AS (
      SELECT isl.doc_id, isl.island, isl.tok, ph.phrase, ph.plen
      FROM isl JOIN ph USING (doc_id, island)
      WHERE ph.plen <= {_RAKE_MAX_PHRASE}
    ),
    ws AS (
      SELECT tok, COUNT(*) AS freq, SUM(plen) AS deg
      FROM mem GROUP BY tok
    ),
    psc AS (
      SELECT mem.doc_id, mem.island, mem.phrase, mem.plen,
             SUM((1000000 * ws.deg) // ws.freq) AS s
      FROM mem JOIN ws USING (tok)
      GROUP BY 1, 2, 3, 4
    ),
    agg AS (
      SELECT phrase,
             CAST(MAX(plen) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_occur,
             CAST(MAX(s) AS BIGINT) AS score_micro
      FROM psc GROUP BY phrase
    )
    SELECT phrase, n_words, n_occur, score_micro
    FROM agg
    QUALIFY ROW_NUMBER() OVER (ORDER BY score_micro DESC, phrase)
            <= {_RAKE_TOPK}
    """,
)
def rake_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), fully relational:
    candidate phrases are maximal stopword-delimited token runs
    (gaps-and-islands: pos − ROW_NUMBER per doc), each word scores
    deg/freq (deg = Σ phrase-length over its occurrences, freq = its
    occurrence count), and a phrase scores the sum of its member-word
    scores — the corpus's top-{_RAKE_TOPK} multi-word keyphrases with
    occurrence counts. The classic lightweight keyphrase extractor a
    curation pipeline runs per source to label what a corpus is
    ABOUT; phrases longer than {_RAKE_MAX_PHRASE} tokens are dropped
    (the standard RAKE candidate cap). Determinism: each per-word
    term is (10⁶·deg) DIV freq — integer division before summation,
    identical in both engines; the top-k cut orders by (score DESC,
    phrase).

    Scale posture: one explode feeds one per-doc window (doc-bounded
    partitions), phrase assembly is a (doc, island) aggregate, word
    stats collapse to the vocabulary grid with map-side combine, and
    the member↔stats join is hinted shuffle-hash (the build side
    grows with vocabulary — the r10 broadcast-flip class); the final
    cut is TakeOrderedAndProject over the bounded phrase table."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    ns = toks.where(~F.col("tok").isin(*_RAKE_STOPWORDS))
    isl = ns.withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    ph = isl.groupBy("doc_id", "island").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("pos", "tok"))
            ).getField("tok"),
            " ",
        ).alias("phrase"),
        F.count("*").alias("plen"),
    )
    mem = isl.join(ph, ["doc_id", "island"]).where(
        F.col("plen") <= _RAKE_MAX_PHRASE
    )
    ws = mem.groupBy("tok").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    psc = (
        mem.join(ws.hint("shuffle_hash"), "tok")
        .groupBy("doc_id", "island", "phrase", "plen")
        .agg(
            F.sum(F.expr("(1000000 * deg) DIV freq")).alias("s")
        )
    )
    agg = psc.groupBy("phrase").agg(
        F.max("plen").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_occur"),
        F.max("s").cast("bigint").alias("score_micro"),
    )
    return agg.orderBy(
        F.col("score_micro").desc(), F.col("phrase")
    ).limit(_RAKE_TOPK)


# ---------------------------------------------------------------------------
# curriculum phase audit — difficulty-ordered corpus phases WITHOUT a
# global sort (banded histogram-index rank, the repo's exact-quantile
# pattern), vs the oracle's naive NTILE
# ---------------------------------------------------------------------------

_CURRICULUM_PHASES = 5


@register(
    "curriculum_phase_audit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(LENGTH(text) AS BIGINT) AS v,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                  AS BIGINT) AS n_words
      FROM documents WHERE LENGTH(text) > 0
    ),
    p AS (
      SELECT *,
             NTILE({_CURRICULUM_PHASES}) OVER (ORDER BY v, doc_id)
               AS phase
      FROM d
    ),
    a AS (
      SELECT phase,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS tokens,
             CAST(MIN(v) AS BIGINT) AS len_min,
             CAST(MAX(v) AS BIGINT) AS len_max,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM p GROUP BY phase
    )
    SELECT phase, n_docs, tokens, len_min, len_max, n_sources,
           CAST(SUM(tokens) OVER (ORDER BY phase) AS BIGINT)
             AS cum_tokens
    FROM a
    """,
)
def curriculum_phase_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: the corpus sequenced easy→hard by a
    difficulty score (document length here — the canonical proxy; any
    per-doc score plugs into the same rank machinery) and cut into
    {_CURRICULUM_PHASES} NTILE phases, with the per-phase composition
    a curriculum-training run schedules against: doc/token mass,
    difficulty range, source diversity, cumulative token budget.

    The scale story IS the operator: the oracle computes the naive
    global NTILE (one total sort), while the Spark side derives the
    identical global rank with NO global sort — a bounded
    (length, count) histogram gives each length its cumulative offset
    (window over the ~500-row grid), each doc adds its within-length
    row_number (partitions bounded by ties), and NTILE's
    ceil/floor bucket split is applied as a closed-form expression on
    the rank. Exactly the banded-prefix pattern the percentile family
    uses; a rank slip of one anywhere in the corpus moves a boundary
    doc across phases and breaks the hash.

    Scale posture: one map-side-combinable histogram + one
    tie-bounded per-length window; the grid window and the 5-row
    phase rollup are driver-scale; no corpus-wide single-partition
    stretch anywhere (plan-guarded)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    d = docs.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("v"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        )
        .cast("bigint")
        .alias("n_words"),
    )
    h = d.groupBy("v").agg(F.count("*").alias("cnt"))
    grid = h.select(
        "v",
        (
            F.sum("cnt").over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            - F.col("cnt")
        ).alias("cum_prev"),
    )
    total = d.agg(F.count("*").alias("n_total"))
    ranked = (
        d.withColumn(
            "rn_in_v",
            F.row_number().over(
                Window.partitionBy("v").orderBy("doc_id")
            ),
        )
        .join(F.broadcast(grid), "v")
        .crossJoin(F.broadcast(total))
        .withColumn("rnk", F.col("cum_prev") + F.col("rn_in_v"))
        .withColumn(
            # NTILE(k): first (N mod k) buckets take ceil(N/k) rows
            "phase",
            F.expr(
                f"CASE WHEN rnk <= (n_total DIV {_CURRICULUM_PHASES} + 1)"
                f" * (n_total % {_CURRICULUM_PHASES})"
                f" THEN (rnk - 1) DIV (n_total DIV {_CURRICULUM_PHASES} + 1) + 1"
                f" ELSE n_total % {_CURRICULUM_PHASES}"
                f" + (rnk - (n_total DIV {_CURRICULUM_PHASES} + 1)"
                f" * (n_total % {_CURRICULUM_PHASES}) - 1)"
                f" DIV (n_total DIV {_CURRICULUM_PHASES}) + 1 END"
            ).cast("int"),
        )
    )
    a = ranked.groupBy("phase").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("tokens"),
        F.min("v").cast("bigint").alias("len_min"),
        F.max("v").cast("bigint").alias("len_max"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return a.select(
        "phase",
        "n_docs",
        "tokens",
        "len_min",
        "len_max",
        "n_sources",
        F.sum("tokens")
        .over(
            Window.orderBy("phase").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("cum_tokens"),
    )
