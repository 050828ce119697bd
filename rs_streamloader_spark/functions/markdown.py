"""From-spec Markdown synthesis + extraction — the second raw-markup
ingestion format (companion to functions/markup.py's HTML path; a
real pretraining crawl is markup + markdown READMEs/docs/wikis).

Synthesis contract (the "document source" for ``(doc_id, text)``;
text is single-space-joined words, the corpus guarantee):

- ``words = text.split(' ')``, ``n = len(words)``
- ``P = 5 + doc_id % 4`` words per block; ``n_blocks = ceil(n/P)``
- block ``k`` (over ``words[kP:(k+1)P]``):
  - ``k % 8 == 6`` → FENCED CODE BLOCK: ``````` fence
    lines around the raw words (inline markers NEVER apply inside a
    fence — the classic extractor trap)
  - else ``k % 5 == 0`` → ATX heading, level ``(k // 5) % 3 + 1``
    (``#``·lvl + space prefix)
  - else ``k % 5 == 3`` → blockquote (``> `` prefix)
  - else → paragraph
- inline markers in NON-fence blocks, by global word index ``i``
  (first match wins): ``i % 7 == 0`` → code span ```w```;
  ``i % 5 == 2`` → emphasis ``*w*``; ``i % 9 == 4`` → link
  ``[w](#)``
- words within a block join with single spaces; blocks join with a
  blank line (``\n\n``)

Extraction contract: strip every marker, recover the word sequence,
join ALL blocks' words with single spaces → byte-equal to the source
``text``. The parser is a from-spec two-level walk (the CommonMark
subset above): a line-based block state machine (fence tracking →
blank-line block splits → heading/blockquote prefixes), then an
inline scanner (backtick spans first — inline code suppresses other
markers — then emphasis pairs, then ``[text](target)`` links).
Handles input the synthesizer never emits: unterminated fences,
unmatched ``*``/backticks, links without targets, CRLF lines.
"""

from __future__ import annotations

from typing import Dict, List

__all__ = ["synth_md", "extract_md", "MdResult"]


def synth_md(doc_id: int, text: str) -> str:
    words = text.split(" ")
    n = len(words)
    p = 5 + doc_id % 4
    n_blocks = (n + p - 1) // p
    blocks: List[str] = []
    for k in range(n_blocks):
        chunk = words[k * p : (k + 1) * p]
        if k % 8 == 6:
            blocks.append("```\n" + " ".join(chunk) + "\n```")
            continue
        marked = []
        for j, w in enumerate(chunk):
            i = k * p + j
            if i % 7 == 0:
                marked.append(f"`{w}`")
            elif i % 5 == 2:
                marked.append(f"*{w}*")
            elif i % 9 == 4:
                marked.append(f"[{w}](#)")
            else:
                marked.append(w)
        content = " ".join(marked)
        if k % 5 == 0:
            lvl = (k // 5) % 3 + 1
            blocks.append("#" * lvl + " " + content)
        elif k % 5 == 3:
            blocks.append("> " + content)
        else:
            blocks.append(content)
    return "\n\n".join(blocks)


class MdResult:
    """Parse outcome: recovered text + block/inline counters."""

    __slots__ = (
        "text",
        "n_blocks",
        "heading_counts",
        "n_blockquotes",
        "n_code_blocks",
        "n_code_words",
        "n_code_spans",
        "n_em",
        "n_links",
    )

    def __init__(self) -> None:
        self.text = ""
        self.n_blocks = 0
        self.heading_counts: Dict[int, int] = {}
        self.n_blockquotes = 0
        self.n_code_blocks = 0
        self.n_code_words = 0
        self.n_code_spans = 0
        self.n_em = 0
        self.n_links = 0


def _inline_strip(s: str, res: MdResult) -> str:
    """Inline pass: code spans (scanned first — a backtick span's
    content is literal, suppressing other markers), then ``*em*``
    pairs, then ``[text](target)`` links. Unmatched openers fall
    through as literal text, the CommonMark error-recovery rule."""
    out: List[str] = []
    i = 0
    ln = len(s)
    while i < ln:
        ch = s[i]
        if ch == "`":
            end = s.find("`", i + 1)
            if end != -1:
                res.n_code_spans += 1
                out.append(s[i + 1 : end])
                i = end + 1
                continue
        elif ch == "*":
            end = s.find("*", i + 1)
            if end != -1:
                res.n_em += 1
                out.append(s[i + 1 : end])
                i = end + 1
                continue
        elif ch == "[":
            close = s.find("](", i + 1)
            if close != -1:
                tail = s.find(")", close + 2)
                if tail != -1:
                    res.n_links += 1
                    out.append(s[i + 1 : close])
                    i = tail + 1
                    continue
        out.append(ch)
        i += 1
    return "".join(out)


def extract_md(payload: str) -> MdResult:
    """Two-level from-spec walk (module docstring). Never raises on
    text input; an unterminated fence consumes to end-of-input as
    code (the CommonMark rule)."""
    res = MdResult()
    chunks: List[str] = []
    block_lines: List[str] = []
    in_fence = False
    fence_lines: List[str] = []

    def close_block() -> None:
        if not block_lines:
            return
        res.n_blocks += 1
        first = block_lines[0]
        stripped: List[str] = []
        h = 0
        while h < len(first) and h < 6 and first[h] == "#":
            h += 1
        if h and h < len(first) and first[h] == " ":
            res.heading_counts[h] = res.heading_counts.get(h, 0) + 1
            stripped.append(_inline_strip(first[h + 1 :], res))
            stripped.extend(
                _inline_strip(ln, res) for ln in block_lines[1:]
            )
        elif first.startswith("> "):
            res.n_blockquotes += 1
            stripped.append(_inline_strip(first[2:], res))
            stripped.extend(
                _inline_strip(ln[2:] if ln.startswith("> ") else ln, res)
                for ln in block_lines[1:]
            )
        else:
            stripped.extend(_inline_strip(ln, res) for ln in block_lines)
        chunks.append(" ".join(stripped))
        block_lines.clear()

    for raw in payload.split("\n"):
        line = raw[:-1] if raw.endswith("\r") else raw
        if in_fence:
            if line.strip() == "```":
                in_fence = False
                res.n_blocks += 1
                res.n_code_blocks += 1
                content = " ".join(fence_lines)
                res.n_code_words += len(content.split(" ")) if content else 0
                chunks.append(content)
                fence_lines.clear()
            else:
                fence_lines.append(line)
            continue
        if line.strip() == "```":
            close_block()
            in_fence = True
            continue
        if line == "":
            close_block()
            continue
        block_lines.append(line)
    if in_fence and fence_lines:
        # unterminated fence: content is code to end-of-input
        res.n_blocks += 1
        res.n_code_blocks += 1
        content = " ".join(fence_lines)
        res.n_code_words += len(content.split(" ")) if content else 0
        chunks.append(content)
    close_block()
    res.text = " ".join(c for c in chunks if c != "")
    return res
