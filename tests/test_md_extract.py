"""Spec-pinned tests for the from-spec Markdown synthesis + extraction
(functions/markdown.py) — same posture as test_html_extract.py: the
synthesized source is pinned against hand-written goldens, and the
parser is driven with constructed input the synthesizer never emits
(unterminated fences, unmatched markers, multi-line blocks, CRLF,
links without targets, markers inside fences)."""

from __future__ import annotations

import pytest

from rs_streamloader_spark.functions.markdown import extract_md, synth_md


# ---------------------------------------------------------------------------
# synthesis goldens
# ---------------------------------------------------------------------------


def test_synth_golden_small_doc():
    # doc_id=2: P = 5+2%4 = 7 → one block, k=0 → heading level 1.
    # inline by global i: i%7==0 → `w` (i=0); i%5==2 → *w* (i=2);
    # i%9==4 → [w](#) (i=4)
    md = synth_md(2, "a b c d e f")
    assert md == "# `a` b *c* d [e](#) f"


def test_synth_golden_block_cycle():
    # doc_id=0: P=5; 35 words → 7 blocks: k=0 h1, k=1 p, k=2 p,
    # k=3 bq, k=4 p, k=5 h2, k=6 FENCE (raw words, no inline markers)
    words = " ".join(f"w{i}" for i in range(35))
    md = synth_md(0, words)
    blocks = md.split("\n\n")
    assert len(blocks) == 7
    assert blocks[0].startswith("# ")
    assert blocks[3].startswith("> ")
    assert blocks[5].startswith("## ")
    assert blocks[6] == "```\nw30 w31 w32 w33 w34\n```"
    # i=30 has 30%7>0,30%5=0... and sits in the fence: raw
    assert "`w30`" not in md and "*w32*" not in md


def test_round_trip_byte_exact_shapes():
    for doc_id in (0, 1, 2, 3, 5, 8, 13, 4567):
        for n in (1, 2, 5, 6, 7, 8, 34, 35, 36, 55, 56, 57, 100):
            text = " ".join(f"t{i}k" for i in range(n))
            res = extract_md(synth_md(doc_id, text))
            assert res.text == text, (doc_id, n)


# ---------------------------------------------------------------------------
# parser on constructed input
# ---------------------------------------------------------------------------


def test_inline_precedence_code_suppresses_markers():
    res = extract_md("a `*not em*` b *em* c")
    assert res.text == "a *not em* b em c"
    assert res.n_code_spans == 1 and res.n_em == 1


def test_unmatched_markers_are_literal():
    res = extract_md("a * b ` c [link](no-close")
    assert res.text == "a * b ` c [link](no-close"
    assert res.n_em == 0 and res.n_code_spans == 0 and res.n_links == 0


def test_link_without_target_is_literal():
    res = extract_md("[text] (separated)")
    assert res.text == "[text] (separated)"
    assert res.n_links == 0


def test_unterminated_fence_consumes_to_eof():
    res = extract_md("para\n\n```\ncode here\nmore code")
    assert res.text == "para code here more code"
    assert res.n_code_blocks == 1
    assert res.n_code_words == 4


def test_markers_inside_fence_are_literal():
    res = extract_md("```\n`x` *y* [z](#)\n```")
    assert res.text == "`x` *y* [z](#)"
    assert res.n_code_spans == 0 and res.n_em == 0 and res.n_links == 0


def test_multiline_blockquote_and_paragraph():
    res = extract_md("> q one\n> q two\n\npara one\npara two")
    assert res.text == "q one q two para one para two"
    assert res.n_blockquotes == 1 and res.n_blocks == 2


def test_crlf_lines_and_heading_levels():
    res = extract_md("# h1\r\n\r\n## h2\r\n\r\n### h3\r\n\r\n####### not")
    assert res.heading_counts == {1: 1, 2: 1, 3: 1}
    # 7 hashes is not a heading (ATX caps at 6): literal text
    assert "####### not" in res.text


def test_hash_without_space_is_not_heading():
    res = extract_md("#nospace")
    assert res.heading_counts == {}
    assert res.text == "#nospace"


def test_empty_fence_counts_block_not_words():
    res = extract_md("```\n```")
    assert res.n_code_blocks == 1 and res.n_code_words == 0
    assert res.text == ""


# ---------------------------------------------------------------------------
# property-based round-trip + crash-safety (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    _words = st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=9),
        min_size=1,
        max_size=60,
    )

    @settings(max_examples=150, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10**9), words=_words)
    def test_md_round_trip_property(doc_id, words):
        """Byte-exact recovery for ARBITRARY word lists/doc_ids —
        every block-kind/inline-marker/fence cadence combination."""
        text = " ".join(words)
        assert extract_md(synth_md(doc_id, text)).text == text

    @settings(max_examples=150, deadline=None)
    @given(payload=st.text(max_size=300))
    def test_md_extractor_never_raises_on_garbage(payload):
        extract_md(payload)
