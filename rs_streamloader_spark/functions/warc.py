"""From-spec WARC/1.0 synthesis + record parsing (seventh raw format,
capping the round-15 ingestion wave).

WARC (ISO 28500 / the Common Crawl container) is THE format a real
pretraining corpus physically arrives in: concatenated records, each a
``WARC/1.0`` version line, a header block of ``Name: value`` lines, a
blank line, ``Content-Length`` payload octets, and a ``\\r\\n\\r\\n``
separator. This module follows the repo's media.py/markup.py pattern:
payloads are synthesized DETERMINISTICALLY from ``(doc_id, source,
text)`` executor-side, parsed back with a from-spec record walker, and
every extracted metric is recomputable by the DuckDB oracle in closed
form from ``LENGTH(text)``, ``LENGTH(source)`` and ``doc_id`` alone.

Synthesis contract — each document becomes a 3-record capture
(lengths are characters; the corpus is pure ASCII so chars == octets,
the same convention the HTML family pins):

- record 1 ``warcinfo``: fixed 55-char ``application/warc-fields``
  payload (``software:``/``format:`` lines).
- record 2 ``request``: the HTTP/1.1 GET for
  ``uri = http://{source}.example/doc/{doc_id}`` —
  payload length ``66 + len(str(doc_id)) + len(source)``.
- record 3 ``response``: an HTTP/1.1 200 message whose entity body is
  ``synth_html(doc_id, text)`` from functions/markup.py — so full
  text recovery must traverse WARC framing → HTTP headers → HTML
  markup, and one slipped byte at ANY layer breaks the md5 gate.
  HTTP header block is ``77 + len(str(html_bytes))`` chars; payload
  length adds ``html_bytes`` (the markup.py pinned formula).

Record framing overhead (validated off-Spark over every sf0.1 doc and
pinned by tests/test_warc.py goldens)::

    version line            10
    WARC-Type line          13 + len(type)
    WARC-Record-ID line     61   (urn:uuid + 32-hex md5 id)
    WARC-Date line          33   (fixed 2026-01-01T00:00:00Z)
    WARC-Target-URI line    19 + len(uri)     [request/response only]
    Content-Type line       16 + len(ct)
    Content-Length line     18 + len(str(content_length))
    blank line               2
    trailing separator       4   (after the payload)

    uri_len = 20 + len(source) + len(str(doc_id))

Truncation faults (``truncate_tail > 0``) drop the final N chars of
the capture — the classic interrupted-crawl artifact. The parser never
guesses: a record whose remaining octets fall short of its declared
``Content-Length`` is returned with ``truncated=True`` and the partial
payload, matching how real WARC readers surface short reads. Framing
damage (bad magic, missing Content-Length) raises
:class:`WarcFormatError` — a container whose frames are broken cannot
be safely resynchronized, unlike a short final payload.

Reference surface: none (novel §2.5 extension; the reference repo at
/root/reference ingests pre-cleaned rows — BASELINE.json:6 lists text
analysis only, no raw-capture handling).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

from rs_streamloader_spark.functions.markup import synth_html

__all__ = ["synth_warc", "parse_warc", "WarcRecord", "WarcFormatError"]

_CRLF = "\r\n"
_WARC_DATE = "2026-01-01T00:00:00Z"


class WarcFormatError(ValueError):
    """Unrecoverable framing damage (bad magic / unparseable header
    block / missing Content-Length)."""


class WarcRecord:
    """One parsed record: type, lowercased header map, payload text,
    and whether the payload fell short of its declared length."""

    __slots__ = ("rec_type", "headers", "payload", "truncated")

    def __init__(
        self,
        rec_type: str,
        headers: Dict[str, str],
        payload: str,
        truncated: bool,
    ) -> None:
        self.rec_type = rec_type
        self.headers = headers
        self.payload = payload
        self.truncated = truncated


def _record(
    rec_type: str,
    rid_seed: str,
    content_type: str,
    payload: str,
    target_uri: str | None = None,
) -> str:
    rid = hashlib.md5(rid_seed.encode("utf-8")).hexdigest()
    lines = [
        "WARC/1.0",
        f"WARC-Type: {rec_type}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"WARC-Date: {_WARC_DATE}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(payload)}")
    return _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def synth_warc(
    doc_id: int, source: str, text: str, truncate_tail: int = 0
) -> str:
    """Deterministic 3-record WARC capture for a document (contract in
    the module docstring). ``truncate_tail`` drops that many chars off
    the end of the full capture (the interrupted-crawl fault)."""
    uri = f"http://{source}.example/doc/{doc_id}"
    info_payload = (
        "software: rs-streamloader-spark/1.0" + _CRLF
        + "format: WARC/1.0" + _CRLF
    )
    req_payload = (
        f"GET /doc/{doc_id} HTTP/1.1" + _CRLF
        + f"Host: {source}.example" + _CRLF
        + "User-Agent: sl-crawler/2.0" + _CRLF
        + _CRLF
    )
    html = synth_html(doc_id, text)
    resp_payload = (
        "HTTP/1.1 200 OK" + _CRLF
        + "Content-Type: text/html; charset=utf-8" + _CRLF
        + f"Content-Length: {len(html)}" + _CRLF
        + _CRLF
        + html
    )
    capture = (
        _record("warcinfo", f"{doc_id}:0", "application/warc-fields",
                info_payload)
        + _record("request", f"{doc_id}:1",
                  "application/http;msgtype=request", req_payload,
                  target_uri=uri)
        + _record("response", f"{doc_id}:2",
                  "application/http;msgtype=response", resp_payload,
                  target_uri=uri)
    )
    if truncate_tail > 0:
        capture = capture[: max(0, len(capture) - truncate_tail)]
    return capture


def parse_warc(capture: str) -> List[WarcRecord]:
    """Walk a WARC capture record-by-record per the spec framing.

    Short final payloads → ``truncated=True`` record (partial payload
    kept); broken framing → :class:`WarcFormatError`. Never scans for
    content — positions advance only by declared lengths and literal
    separators, exactly how a spec reader stays O(n) single-pass."""
    records: List[WarcRecord] = []
    pos = 0
    n = len(capture)
    while pos < n:
        if capture.startswith(_CRLF, pos):
            # inter-record separator remnants (or a trailing fragment
            # of one left by tail truncation)
            pos += 2
            continue
        if all(c in "\r\n" for c in capture[pos:]):
            # a tail cut through the inter-record separator leaves a
            # bare CR/LF residue — end of capture, not a frame
            break
        hdr_end = capture.find(_CRLF + _CRLF, pos)
        truncated_header = hdr_end < 0
        block = capture[pos:] if truncated_header else capture[pos:hdr_end]
        lines = block.split(_CRLF)
        if truncated_header and len(lines) > 1:
            # the capture ended mid-header-block: the final fragment is
            # a partial line (possibly mid-name) — drop it rather than
            # reject framing that was valid until the cut
            lines = lines[:-1]
        if not lines[0].startswith("WARC/"):
            if truncated_header and "WARC/1.0".startswith(lines[0]):
                # the capture ended inside the version line itself —
                # tail truncation per the module contract (flagged,
                # never raised), not framing damage: a walker that
                # got here advanced only by declared lengths
                records.append(WarcRecord("", {}, "", True))
                break
            raise WarcFormatError(
                f"bad record magic at offset {pos}: {lines[0][:40]!r}"
            )
        headers: Dict[str, str] = {}
        for line in lines[1:]:
            if not line:
                continue
            if ": " not in line:
                raise WarcFormatError(
                    f"unparseable header line at offset {pos}: {line[:60]!r}"
                )
            name, value = line.split(": ", 1)
            headers[name.lower()] = value
        rec_type = headers.get("warc-type", "")
        if truncated_header:
            # capture ended inside the header block — framing survives
            # (we parsed what exists) but the payload is wholly absent
            records.append(WarcRecord(rec_type, headers, "", True))
            break
        if "content-length" not in headers:
            raise WarcFormatError(
                f"record at offset {pos} carries no Content-Length"
            )
        try:
            cl = int(headers["content-length"])
        except ValueError as exc:
            raise WarcFormatError(
                f"non-integer Content-Length at offset {pos}"
            ) from exc
        body_start = hdr_end + 4
        avail = n - body_start
        truncated = avail < cl
        payload = capture[body_start : body_start + min(cl, avail)]
        records.append(WarcRecord(rec_type, headers, payload, truncated))
        pos = body_start + min(cl, avail)
    return records
