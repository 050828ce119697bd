"""Spec-pinned tests for the from-spec HTML synthesis + extraction
(functions/markup.py) — the media-codec testing posture: the
synthesizer/extractor pair could round-trip a SHARED misreading of
the contract, so the synthesized page is pinned against a
hand-written golden string, the byte-accounting closed forms are
checked against real lengths, and the extractor is driven with
hand-constructed malformed/nested/entity cases it never sees from
the synthesizer (unclosed tags, stray end tags, hex charrefs, named
entities, unknown entities, script/style/title skipping, bare
ampersands) — browsers tolerate all of these, so the ingest path
must too.
"""

from __future__ import annotations

import pytest

from rs_streamloader_spark.functions.markup import extract_html, synth_html


# ---------------------------------------------------------------------------
# synthesis goldens (the contract, written out by hand)
# ---------------------------------------------------------------------------


def test_synth_golden_small_doc():
    # doc_id=3: P = 4+3%5 = 7, L = 3+3%4 = 6, style digit d = 3
    # words: a bb ccc dd e  (n=5, one paragraph, k=0 -> h2, 0 divs)
    # links: i%6==0 -> word 0 only; separators after i=0..3, i%4==3 ->
    # the separator after word 3 ("dd") is &#32;
    html = synth_html(3, "a bb ccc dd e")
    assert html == (
        '<html><head><title>doc 3</title>'
        '<style>.s3{color:#333}</style></head><body>'
        '<h2><a href="#">a</a> bb ccc dd&#32;e</h2>'
        "</body></html>"
    )


def test_synth_golden_multi_paragraph_divs_and_h2_cycle():
    # doc_id=0: P=4, L=3, d=0; 9 words -> paragraphs of 4/4/1,
    # k=0 h2 (0 divs), k=1 p (1 div), k=2 p (2 divs)
    words = "w0 w1 w2 w3 w4 w5 w6 w7 w8"
    html = synth_html(0, words)
    assert html == (
        "<html><head><title>doc 0</title>"
        "<style>.s0{color:#000}</style></head><body>"
        '<h2><a href="#">w0</a> w1 w2 <a href="#">w3</a>&#32;</h2>'
        '<div><p>w4 w5 <a href="#">w6</a> w7&#32;</p></div>'
        '<div><div><p>w8</p></div></div>'
        "</body></html>"
    )


def _forms(doc_id: int, text: str):
    n = text.count(" ") + 1
    p = 4 + doc_id % 5
    link = 3 + doc_id % 4
    n_paras = (n + p - 1) // p
    n_h2 = (n_paras - 1) // 7 + 1
    n_div = 3 * (n_paras // 3) + (1 if n_paras % 3 == 2 else 0)
    n_links = (n - 1) // link + 1
    n_ent = (n - 1) // 4
    html_bytes = (
        88
        + len(str(doc_id))
        + len(text)
        + 7 * n_paras
        + 2 * n_h2
        + 11 * n_div
        + 16 * n_links
        + 4 * n_ent
    )
    return html_bytes, 5 + n_paras + n_div + n_links, n_ent


@pytest.mark.parametrize("doc_id", [0, 1, 5, 12, 123, 4567])
@pytest.mark.parametrize(
    "text",
    [
        "one",
        "a b",
        "alpha beta gamma delta epsilon zeta eta theta",
        " ".join(f"w{i}" for i in range(95)),  # many paragraphs
    ],
)
def test_byte_accounting_closed_forms(doc_id, text):
    """The density oracle's byte formula must equal the real payload
    length for every (doc_id, text) shape — words/paragraph, link
    stride, heading cycle, div cycle, and entity cadence all vary."""
    html = synth_html(doc_id, text)
    html_bytes, n_tags, n_ent = _forms(doc_id, text)
    ex = extract_html(html)
    assert len(html) == html_bytes
    assert ex.n_tags == n_tags
    assert ex.n_charrefs == n_ent
    assert ex.text == text  # byte-exact text recovery


# ---------------------------------------------------------------------------
# extractor semantics on constructed input (never produced by synth)
# ---------------------------------------------------------------------------


def test_skips_title_style_script_content():
    ex = extract_html(
        "<html><head><title>NOT THIS</title>"
        "<style>p{color:red}</style></head>"
        "<body>yes<script>var x = '<p>nope</p>';</script> indeed</body>"
    )
    # CPython's tokenizer ends a <script> CDATA block at the first
    # </script>; the quoted '<p>' inside is script text and stays out
    assert ex.text == "yes indeed"
    assert ex.tag_counts["script"] == 1


def test_charref_decimal_and_hex_decode():
    ex = extract_html("<p>A&#32;B&#x43;D</p>")
    assert ex.text == "A BCD"
    assert ex.n_charrefs == 2


def test_named_entities_known_and_unknown():
    ex = extract_html("<p>fish &amp; chips &lt;3 &zzz; ok</p>")
    # known names decode via the stdlib table; unknown names are kept
    # literally (browser error-recovery), bare text flows through
    assert ex.text == "fish & chips <3 &zzz; ok"
    assert ex.n_charrefs == 3


def test_bare_ampersand_is_data():
    ex = extract_html("<p>a & b &c d</p>")
    assert "a & b" in ex.text and "d" in ex.text


def test_unclosed_and_stray_tags_do_not_raise():
    ex = extract_html("<body><div><p>open forever</body></p></div></zz>")
    assert ex.text == "open forever"
    assert ex.tag_counts == {"body": 1, "div": 1, "p": 1}


def test_block_depth_tracking():
    # html>body>div>div>p = depth 5; inline <a> does not count
    ex = extract_html(
        "<html><body><div><div><p><a href='#'>x</a></p></div></div>"
        "<p>y</p></body></html>"
    )
    assert ex.max_block_depth == 5
    # headings h1..h6 are block tags too
    ex2 = extract_html("<body><h3>t</h3></body>")
    assert ex2.max_block_depth == 2


def test_stray_end_tags_never_go_negative():
    ex = extract_html("</div></p><p>still works</p>")
    assert ex.text == "still works"
    assert ex.max_block_depth == 1


def test_nested_style_skip_is_balanced():
    ex = extract_html("<body>a<style>x</style>b<style>y</style>c</body>")
    assert ex.text == "abc"


def test_charref_inside_style_not_counted_or_emitted():
    ex = extract_html("<body><style>q&#32;r</style>t</body>")
    assert ex.text == "t"
    assert ex.n_charrefs == 0


def test_round_trip_random_shapes():
    """Property-style sweep: word counts crossing every paragraph/
    link/entity boundary recover byte-exactly across doc_id shapes."""
    for doc_id in (0, 3, 7, 11, 19, 10007):
        for n in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 28, 29, 60, 61):
            text = " ".join(f"w{i}x" for i in range(n))
            ex = extract_html(synth_html(doc_id, text))
            assert ex.text == text, (doc_id, n)


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
    def test_html_round_trip_property(doc_id, words):
        """Byte-exact recovery for ARBITRARY word lists and doc_ids —
        every paragraph/link/entity/heading cadence combination, not
        just the shipped corpus."""
        text = " ".join(words)
        assert extract_html(synth_html(doc_id, text)).text == text

    @settings(max_examples=150, deadline=None)
    @given(payload=st.text(max_size=300))
    def test_extractor_never_raises_on_garbage(payload):
        """The tokenizer walk must survive arbitrary text input (the
        browser error-recovery posture) — no exception, ever."""
        extract_html(payload)
