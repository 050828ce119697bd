"""Reusable text-analysis column builders (all JVM-side built-ins —
no Python in the hot path). The query catalog in operators/text.py is
built from these; they are exported here as the library surface a
pipeline author composes directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word pieces: runs of letters, runs of digits, or single other glyphs
BPE_ISH_PATTERN = r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# the Gopher-style stopword set shared by every quality screen that
# interpolates it into oracle SQL (quality_gopher_rules, RAKE, the
# pipeline capstone) — ONE definition so the screens cannot drift
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")


def n_tokens(text: str | Column = "text") -> Column:
    """Whitespace token count via the length/replace identity — stays
    in codegen, no explode, no regex engine."""
    col = F.col(text) if isinstance(text, str) else text
    return (
        F.length(col) - F.length(F.regexp_replace(col, " ", "")) + F.lit(1)
    ).cast("bigint")


def bpe_ish_tokens(text: str | Column = "text") -> Column:
    """Sub-word tokenization with a BPE-ish regex (letter runs, digit
    runs, single punctuation glyphs) — returns the token array."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0))


def marker_word_count(marker: str, text: str | Column = "text") -> Column:
    """Non-overlapping occurrences of ``marker`` as a standalone word
    (leftmost-first replace semantics — deterministic across engines).
    The marker is regex-escaped so metacharacters ('c++', 'u.s') count
    literally — and the removed-length arithmetic stays valid because
    an escaped match length always equals the literal length."""
    import re

    col = F.col(text) if isinstance(text, str) else text
    pad = F.concat(F.lit(" "), col, F.lit(" "))
    removed = F.length(pad) - F.length(
        F.regexp_replace(pad, F.lit(f" {re.escape(marker)} "), F.lit(" "))
    )
    return (removed / (len(marker) + 1)).cast("bigint")


def quality_score(text: str | Column = "text") -> Column:
    """0-3 heuristic quality score: length, token count, and mean
    token length band (see operators/text.py for the oracle-checked
    definition)."""
    col = F.col(text) if isinstance(text, str) else text
    nonspace = F.length(F.regexp_replace(col, " ", ""))
    ntok = F.length(col) - nonspace + 1
    avg_len = nonspace * F.lit(1.0) / ntok
    return (
        F.when(F.length(col) >= 200, 1).otherwise(0)
        + F.when(ntok >= 40, 1).otherwise(0)
        + F.when((avg_len >= 3) & (avg_len <= 8), 1).otherwise(0)
    ).cast("int")
