"""From-spec HTML synthesis + extraction (VERDICT r14 next-round #1).

Every real pretraining corpus enters as markup; this module gives the
engine an honest HTML→text path using the same pattern as
functions/media.py: payloads are synthesized DETERMINISTICALLY from
the documents table executor-side, parsed back with a from-spec
stdlib-``html.parser`` walk, and every extracted metric is
recomputable by the DuckDB oracle in closed form from ``LENGTH(text)``
and ``doc_id`` alone — so a tag-handling bug, an entity-decode bug, a
skipped-content leak (``<style>``/``<title>`` text bleeding into the
extraction), or a depth-tracking bug each breaks a cross-engine hash.

Synthesis contract (the "web page" for document ``(doc_id, text)``;
text is single-space-joined words, the corpus guarantee):

- ``words = text.split(' ')``, ``n = len(words)``
- ``P = 4 + doc_id % 5`` words per paragraph; ``n_paras = ceil(n/P)``
- paragraph ``k`` uses tag ``h2`` when ``k % 7 == 0`` else ``p``, and
  is wrapped in ``k % 3`` nested ``<div>`` layers
- word ``i`` is wrapped ``<a href="#">word</a>`` when ``i % L == 0``
  with ``L = 3 + doc_id % 4``
- the separator after word ``i`` (for ``i < n-1``) is the charref
  ``&#32;`` when ``i % 4 == 3``, else a literal space; it lives INSIDE
  word ``i``'s paragraph (before the closing tag), so concatenating
  the text nodes of the body reconstructs ``text`` byte-exactly
- header: ``<html><head><title>doc {id}</title><style>.s{id%7}
  {color:#ddd}</style></head><body>`` with ``d = id % 10`` — the
  title and style text exist precisely so extraction must SKIP them
  to stay byte-exact; footer ``</body></html>``

Byte-accounting (pinned by tests/test_html_extract.py goldens and
used verbatim by the boilerplate-density oracle)::

    html_bytes = 88 + len(str(doc_id)) + len(text)
               + 7*n_paras + 2*n_h2 + 11*n_div + 16*n_links + 4*n_ent

    n_h2    = (n_paras - 1) // 7 + 1
    n_div   = 3 * (n_paras // 3) + (1 if n_paras % 3 == 2 else 0)
    n_links = (n - 1) // L + 1
    n_ent   = (n - 1) // 4

Extraction walks the stream with ``html.parser.HTMLParser``
(``convert_charrefs=False`` so charref decoding is explicit spec
code, not interpreter courtesy): text nodes outside
``title``/``style``/``script`` accumulate; ``&#NNN;``/``&#xHH;``
decode via ``chr``; named entities via the stdlib table. Depth is
tracked over BLOCK tags (html, body, div, p, h1-h6) — the standard
DOM-block-nesting readability signal — giving
``max_block_depth = 3 + min(n_paras - 1, 2)`` under the contract.

Reference surface: none (novel §2.5 extension; the reference repo has
no markup handling — BASELINE.json:6 lists text analysis only).
"""

from __future__ import annotations

from html.entities import name2codepoint
from html.parser import HTMLParser
from typing import Dict, List, Tuple

__all__ = ["synth_html", "extract_html", "ExtractResult"]

_BLOCK_TAGS = frozenset(
    {"html", "body", "div", "p", "h1", "h2", "h3", "h4", "h5", "h6"}
)
_SKIP_TEXT = frozenset({"title", "style", "script"})


def synth_html(doc_id: int, text: str) -> str:
    """Deterministic HTML payload for a document (contract above)."""
    words = text.split(" ")
    n = len(words)
    p = 4 + doc_id % 5
    link = 3 + doc_id % 4
    d = doc_id % 10
    parts: List[str] = [
        f"<html><head><title>doc {doc_id}</title>"
        f"<style>.s{doc_id % 7}{{color:#{d}{d}{d}}}</style></head><body>"
    ]
    n_paras = (n + p - 1) // p
    for k in range(n_paras):
        tag = "h2" if k % 7 == 0 else "p"
        depth = k % 3
        parts.append("<div>" * depth)
        parts.append(f"<{tag}>")
        for i in range(k * p, min((k + 1) * p, n)):
            w = words[i]
            parts.append(f'<a href="#">{w}</a>' if i % link == 0 else w)
            if i < n - 1:
                parts.append("&#32;" if i % 4 == 3 else " ")
        parts.append(f"</{tag}>")
        parts.append("</div>" * depth)
    parts.append("</body></html>")
    return "".join(parts)


class ExtractResult:
    """Parse outcome: extracted body text + structural counters."""

    __slots__ = (
        "text",
        "tag_counts",
        "n_tags",
        "n_charrefs",
        "max_block_depth",
    )

    def __init__(
        self,
        text: str,
        tag_counts: Dict[str, int],
        n_charrefs: int,
        max_block_depth: int,
    ):
        self.text = text
        self.tag_counts = tag_counts
        self.n_tags = sum(tag_counts.values())
        self.n_charrefs = n_charrefs
        self.max_block_depth = max_block_depth


class _Extractor(HTMLParser):
    """From-spec extraction walk. ``convert_charrefs=False`` so the
    charref decode below is explicit, testable spec code (and so
    charrefs can be COUNTED — convert_charrefs folds them into data
    invisibly)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.chunks: List[str] = []
        self.tag_counts: Dict[str, int] = {}
        self.n_charrefs = 0
        self._depth = 0
        self.max_depth = 0
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        self.tag_counts[tag] = self.tag_counts.get(tag, 0) + 1
        if tag in _SKIP_TEXT:
            self._skip += 1
        if tag in _BLOCK_TAGS:
            self._depth += 1
            if self._depth > self.max_depth:
                self.max_depth = self._depth

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT and self._skip:
            self._skip -= 1
        if tag in _BLOCK_TAGS and self._depth:
            self._depth -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.chunks.append(data)

    def handle_charref(self, ref: str) -> None:
        # &#NNN; / &#xHH; — numeric character reference per the spec
        if self._skip:
            return
        self.n_charrefs += 1
        cp = int(ref[1:], 16) if ref[:1] in ("x", "X") else int(ref)
        self.chunks.append(chr(cp))

    def handle_entityref(self, name: str) -> None:
        # named entity (&amp; &lt; ...) via the stdlib table; unknown
        # names are kept literally, the browser error-recovery rule
        if self._skip:
            return
        self.n_charrefs += 1
        cp = name2codepoint.get(name)
        self.chunks.append(chr(cp) if cp is not None else f"&{name};")


def extract_html(payload: str) -> ExtractResult:
    """Extract body text + structure from an HTML string. Tolerant of
    malformed input the way the stdlib tokenizer is (unclosed tags,
    stray end tags, bare ``&``); never raises on text input."""
    ex = _Extractor()
    ex.feed(payload)
    ex.close()
    return ExtractResult(
        "".join(ex.chunks), ex.tag_counts, ex.n_charrefs, ex.max_depth
    )
