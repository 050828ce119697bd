"""Spec-pinned tests for the from-spec WARC/1.0 synthesis + record
walker (functions/warc.py) — the media-codec posture: the synth/parse
pair could round-trip a SHARED misreading of ISO 28500, so a full
capture is pinned against a hand-written golden string, the framing
byte-accounting closed forms are checked against real lengths, and
the parser is driven with hand-constructed damage it never sees from
the synthesizer (bad magic, missing/garbled Content-Length, header
truncation, mid-payload truncation at every depth) — real crawl
archives contain every one of these.
"""

from __future__ import annotations

import hashlib

import pytest

from rs_streamloader_spark.functions.markup import extract_html, synth_html
from rs_streamloader_spark.functions.warc import (
    WarcFormatError,
    parse_warc,
    synth_warc,
)

CRLF = "\r\n"


# ---------------------------------------------------------------------------
# synthesis golden (the contract, written out by hand)
# ---------------------------------------------------------------------------


def test_synth_golden_full_capture():
    # doc_id=3, source='src3', text='a bb ccc dd e' — the HTML entity
    # body is the test_html_extract golden; everything around it is
    # written out by hand from the module-docstring contract.
    html = (
        "<html><head><title>doc 3</title>"
        "<style>.s3{color:#333}</style></head><body>"
        '<h2><a href="#">a</a> bb ccc dd&#32;e</h2>'
        "</body></html>"
    )
    rid0 = hashlib.md5(b"3:0").hexdigest()
    rid1 = hashlib.md5(b"3:1").hexdigest()
    rid2 = hashlib.md5(b"3:2").hexdigest()
    info_payload = (
        "software: rs-streamloader-spark/1.0" + CRLF
        + "format: WARC/1.0" + CRLF
    )
    req_payload = (
        "GET /doc/3 HTTP/1.1" + CRLF
        + "Host: src3.example" + CRLF
        + "User-Agent: sl-crawler/2.0" + CRLF
        + CRLF
    )
    resp_payload = (
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: text/html; charset=utf-8" + CRLF
        + f"Content-Length: {len(html)}" + CRLF
        + CRLF
        + html
    )
    expected = (
        "WARC/1.0" + CRLF
        + "WARC-Type: warcinfo" + CRLF
        + f"WARC-Record-ID: <urn:uuid:{rid0}>" + CRLF
        + "WARC-Date: 2026-01-01T00:00:00Z" + CRLF
        + "Content-Type: application/warc-fields" + CRLF
        + f"Content-Length: {len(info_payload)}" + CRLF
        + CRLF
        + info_payload + CRLF + CRLF
        + "WARC/1.0" + CRLF
        + "WARC-Type: request" + CRLF
        + f"WARC-Record-ID: <urn:uuid:{rid1}>" + CRLF
        + "WARC-Date: 2026-01-01T00:00:00Z" + CRLF
        + "WARC-Target-URI: http://src3.example/doc/3" + CRLF
        + "Content-Type: application/http;msgtype=request" + CRLF
        + f"Content-Length: {len(req_payload)}" + CRLF
        + CRLF
        + req_payload + CRLF + CRLF
        + "WARC/1.0" + CRLF
        + "WARC-Type: response" + CRLF
        + f"WARC-Record-ID: <urn:uuid:{rid2}>" + CRLF
        + "WARC-Date: 2026-01-01T00:00:00Z" + CRLF
        + "WARC-Target-URI: http://src3.example/doc/3" + CRLF
        + "Content-Type: application/http;msgtype=response" + CRLF
        + f"Content-Length: {len(resp_payload)}" + CRLF
        + CRLF
        + resp_payload + CRLF + CRLF
    )
    assert synth_warc(3, "src3", "a bb ccc dd e") == expected


# ---------------------------------------------------------------------------
# framing byte-accounting closed forms vs real lengths
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "doc_id,source,text",
    [
        (0, "src0", "a"),
        (3, "src3", "a bb ccc dd e"),
        (19, "src19", " ".join(f"w{i}" for i in range(40))),
        (123456, "src16", " ".join("word" for _ in range(95))),
        (7, "src7", " ".join(chr(97 + i % 26) * (1 + i % 5) for i in range(61))),
    ],
)
def test_framing_closed_forms(doc_id, source, text):
    cap = synth_warc(doc_id, source, text)
    l_id, l_src = len(str(doc_id)), len(source)
    hb = len(synth_html(doc_id, text))
    uri_len = 20 + l_src + l_id
    req_pl = 66 + l_id + l_src
    resp_pl = 77 + len(str(hb)) + hb
    rec2 = 211 + uri_len + len(str(req_pl)) + req_pl + 4
    rec3 = 213 + uri_len + len(str(resp_pl)) + resp_pl + 4
    assert len(cap) == 245 + rec2 + rec3
    recs = parse_warc(cap)
    assert [r.rec_type for r in recs] == ["warcinfo", "request", "response"]
    assert int(recs[1].headers["content-length"]) == req_pl
    assert int(recs[2].headers["content-length"]) == resp_pl
    assert recs[2].headers["warc-target-uri"] == (
        f"http://{source}.example/doc/{doc_id}"
    )
    assert len(recs[2].headers["warc-target-uri"]) == uri_len


def test_three_layer_text_recovery():
    text = " ".join(chr(97 + i % 26) for i in range(57))
    cap = synth_warc(41, "src1", text)
    resp = parse_warc(cap)[2]
    html = resp.payload[resp.payload.find(CRLF + CRLF) + 4 :]
    assert extract_html(html).text == text


# ---------------------------------------------------------------------------
# parser damage handling (cases the synthesizer never produces)
# ---------------------------------------------------------------------------


def _one_record(payload: str, cl: int | None = None) -> str:
    cl = len(payload) if cl is None else cl
    return (
        "WARC/1.0" + CRLF
        + "WARC-Type: resource" + CRLF
        + f"Content-Length: {cl}" + CRLF
        + CRLF
        + payload + CRLF + CRLF
    )


def test_bad_magic_raises():
    with pytest.raises(WarcFormatError, match="magic"):
        parse_warc("WARX/1.0" + CRLF + CRLF + CRLF)


def test_garbage_between_records_raises():
    cap = _one_record("abc") + "garbage bytes" + _one_record("def")
    with pytest.raises(WarcFormatError, match="magic"):
        parse_warc(cap)


def test_missing_content_length_raises():
    cap = "WARC/1.0" + CRLF + "WARC-Type: resource" + CRLF + CRLF + "x"
    with pytest.raises(WarcFormatError, match="Content-Length"):
        parse_warc(cap)


def test_non_integer_content_length_raises():
    cap = (
        "WARC/1.0" + CRLF + "Content-Length: ten" + CRLF + CRLF + "x"
    )
    with pytest.raises(WarcFormatError, match="non-integer"):
        parse_warc(cap)


def test_unparseable_header_line_raises():
    cap = (
        "WARC/1.0" + CRLF + "NoColonHere" + CRLF
        + "Content-Length: 1" + CRLF + CRLF + "x"
    )
    with pytest.raises(WarcFormatError, match="header line"):
        parse_warc(cap)


def test_short_final_payload_flagged_not_raised():
    cap = _one_record("abcdefgh")
    recs = parse_warc(cap[:-7])  # cuts trailing sep (4) + 3 payload chars
    assert len(recs) == 1
    assert recs[0].truncated
    assert recs[0].payload == "abcde"


def test_truncation_inside_header_block():
    cap = _one_record("abcdefgh")
    # cut inside the Content-Length header line itself
    cut = cap.find("Content-Length: ") + 5
    recs = parse_warc(cap[:cut])
    assert len(recs) == 1
    assert recs[0].truncated
    assert recs[0].payload == ""


def test_truncation_exactly_at_separator_is_clean():
    # losing ONLY the trailing \r\n\r\n leaves a complete record —
    # declared length fully present, nothing to flag
    cap = _one_record("abcdefgh")
    recs = parse_warc(cap[:-4])
    assert len(recs) == 1
    assert not recs[0].truncated
    assert recs[0].payload == "abcdefgh"


def test_payload_containing_record_magic_is_not_resynced_into():
    # a WARC capture EMBEDDED in a payload must stay payload — the
    # walker advances by declared lengths, never by scanning
    inner = _one_record("xyz")
    cap = _one_record(inner) + _one_record("tail")
    recs = parse_warc(cap)
    assert len(recs) == 2
    assert recs[0].payload == inner
    assert recs[1].payload == "tail"


def test_empty_payload_record():
    recs = parse_warc(_one_record(""))
    assert len(recs) == 1
    assert recs[0].payload == ""
    assert not recs[0].truncated


def test_multi_record_short_middle_read_consumes_tail():
    # an UNDER-declared middle record (content-length smaller than the
    # real payload) leaves the walker inside the payload; the spec
    # behavior is deterministic garbage-follows → framing error on the
    # residue, never silent resync
    cap = _one_record("abcdef", cl=3) + _one_record("tail")
    with pytest.raises(WarcFormatError, match="magic"):
        parse_warc(cap)


def test_fault_slice_truncation_matches_contract():
    # the operator's fault rule: truncate_tail = 5 + (doc_id%7)*3 on
    # the doc_id%17==3 slice must flag EXACTLY the response record
    for doc_id in (3, 20, 37, 54, 71, 88):
        assert doc_id % 17 == 3
        tail = 5 + (doc_id % 7) * 3
        cap = synth_warc(doc_id, "srcX", "aa bb cc dd ee ff gg", tail)
        recs = parse_warc(cap)
        assert len(recs) == 3
        assert [r.truncated for r in recs] == [False, False, True]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=10**9),
        words=st.lists(
            st.text(alphabet="abcdefghij", min_size=1, max_size=8),
            min_size=1,
            max_size=40,
        ),
        tail=st.integers(min_value=0, max_value=60),
    )
    def test_warc_round_trip_property(doc_id, words, tail):
        text = " ".join(words)
        cap = synth_warc(doc_id, f"src{doc_id % 20}", text, tail)
        recs = parse_warc(cap)
        assert 1 <= len(recs) <= 3
        if tail == 0:
            assert [r.rec_type for r in recs] == [
                "warcinfo", "request", "response",
            ]
            assert not any(r.truncated for r in recs)
            resp = recs[2]
            html = resp.payload[resp.payload.find(CRLF + CRLF) + 4 :]
            assert extract_html(html).text == text

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_truncation_into_final_magic_is_flagged_not_raised():
    """A tail cut landing INSIDE the final record's 'WARC/1.0'
    version line is still tail truncation (the module contract:
    flagged, never raised) — only mid-capture framing damage raises."""
    cap = _one_record("abcdefgh") + _one_record("tail")
    # cut so only 'WAR' of record 2's magic survives
    cut = cap.find("WARC/1.0", 1) + 3
    recs = parse_warc(cap[:cut])
    assert len(recs) == 2
    assert not recs[0].truncated and recs[0].payload == "abcdefgh"
    assert recs[1].truncated and recs[1].payload == ""


def test_every_tail_cut_depth_parses_without_raising():
    """Exhaustive contract check: EVERY possible tail-truncation depth
    of a full 3-record capture either parses clean or yields
    truncated records — never a WarcFormatError."""
    cap = synth_warc(7, "src7", "aa bb cc dd ee ff gg hh")
    for cut in range(len(cap)):
        recs = parse_warc(cap[:cut])  # must not raise
        assert len(recs) <= 3
