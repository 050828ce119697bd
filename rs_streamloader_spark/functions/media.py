"""From-spec stdlib media codecs (BMP / WAV / Y4M).

The container ships no media libraries (no PIL / soundfile / pyav), so
— exactly like ``sources/avro_reader.py`` did for AVRO OCF — the three
formats the multimodal operators exercise are implemented here from
their PUBLIC specifications with nothing but ``struct`` and bytes:

- **BMP** (Windows device-independent bitmap): BITMAPFILEHEADER +
  BITMAPINFOHEADER, 24 bits/pixel, uncompressed (BI_RGB). Spec
  semantics the decoder must honor and the tests pin: little-endian
  multi-byte fields, pixel rows stored BOTTOM-UP for positive heights
  (top-down when biHeight < 0), BGR channel order on disk, each row
  padded to a 4-byte boundary, and the pixel array starting at the
  OFFSET named in the file header (not "right after the headers" —
  files may carry palettes/ICC gaps).
- **WAV** (RIFF/WAVE, PCM): a RIFF container whose chunks must be
  WALKED — readers that assume the canonical 44-byte layout break on
  files with LIST/INFO chunks before ``data``. Chunks are word-aligned
  (odd-sized chunks carry one pad byte, counted in the walk but not in
  the chunk size). PCM 16-bit samples are little-endian signed.
- **Y4M** (YUV4MPEG2): the plain-text-headered uncompressed video
  stream used by ffmpeg/x264: ``YUV4MPEG2`` + space-separated tagged
  parameters, then per frame a ``FRAME`` line followed by the raw
  planes. ``Cmono`` keeps a single Y plane of W*H bytes per frame.

Encoders and decoders are written as INDEPENDENT walks of each spec
(the decoder never reuses the encoder's layout constants beyond what
the spec itself dictates), and tests/test_media_codecs.py pins the
decoders against hand-constructed golden bytes, including the
published 2x2 BMP example — an encoder/decoder pair that merely
round-trips could share a wrong reading of the spec; golden bytes
cannot.

Everything here runs executor-side inside Arrow-batched
``mapInPandas`` stages (see operators/multimodal.py); nothing touches
the driver.

Reference surface: none (novel extension, SURVEY.md §2.5 multimodal
family; the reference repo has no media handling).
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

# ---------------------------------------------------------------------------
# BMP — Windows bitmap, 24bpp uncompressed
# ---------------------------------------------------------------------------

_BMP_FILE_HEADER = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)


def bmp_row_size(width: int) -> int:
    """On-disk bytes per 24bpp row: 3*W rounded UP to a 4-byte
    boundary (the spec's row padding)."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(width: int, height: int, pixels: Sequence[Sequence[Tuple[int, int, int]]]) -> bytes:
    """Encode a top-down row-major grid of (R, G, B) pixels as a
    24bpp BI_RGB BMP (positive height → rows written bottom-up, BGR
    on disk, rows padded to 4 bytes)."""
    row_size = bmp_row_size(width)
    image_size = row_size * height
    offset = 14 + 40
    out = bytearray()
    out += struct.pack(_BMP_FILE_HEADER, b"BM", offset + image_size, 0, 0, offset)
    out += struct.pack(
        _BMP_INFO_HEADER, 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - 3 * width)
    for r in range(height - 1, -1, -1):  # bottom-up storage
        row = pixels[r]
        for c in range(width):
            red, green, blue = row[c]
            out += bytes((blue, green, red))  # BGR on disk
        out += pad
    return bytes(out)


def decode_bmp(data: bytes) -> Tuple[int, int, List[List[Tuple[int, int, int]]]]:
    """Decode a 24bpp BI_RGB BMP to (width, height, top-down row-major
    (R, G, B) grid). Honors the header's pixel-array offset, bottom-up
    vs top-down (sign of biHeight), BGR order and row padding."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    _, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, data, 0)
    (
        hdr_size,
        width,
        raw_height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = struct.unpack_from(_BMP_INFO_HEADER, data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} "
            f"compression={compression}"
        )
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    row_size = bmp_row_size(width)
    if offset + row_size * height > len(data):
        raise ValueError("truncated BMP pixel array")
    grid: List[List[Tuple[int, int, int]]] = []
    for r in range(height):
        # storage row index for output (top-down) row r
        sr = r if top_down else height - 1 - r
        base = offset + sr * row_size
        row = []
        for c in range(width):
            b = base + 3 * c
            row.append((data[b + 2], data[b + 1], data[b]))  # BGR → RGB
        grid.append(row)
    return width, height, grid


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM 16-bit
# ---------------------------------------------------------------------------


def encode_wav(samples: Sequence[int], rate: int = 8000) -> bytes:
    """Encode mono 16-bit signed PCM samples as a canonical RIFF/WAVE
    file (fmt + data chunks)."""
    n = len(samples)
    data_size = 2 * n
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 4 + 24 + 8 + data_size, b"WAVE")
    # fmt chunk: PCM(1), mono, rate, byte rate, block align, 16 bits
    out += struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    out += struct.pack("<4sI", b"data", data_size)
    out += struct.pack(f"<{n}h", *samples)
    return bytes(out)


def decode_wav(data: bytes) -> Tuple[int, int, List[int]]:
    """Decode a RIFF/WAVE file to (sample_rate, n_channels, samples),
    walking the chunk list (LIST/fact/etc. chunks are skipped, odd
    chunk sizes consume their spec-mandated pad byte). Only
    PCM (format tag 1) 16-bit is supported — anything else raises."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if pos + 8 + size > len(data):
            raise ValueError("truncated WAV chunk")  # same class as BMP/Y4M
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # word alignment pad
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    n = len(raw) // 2
    samples = list(struct.unpack(f"<{n}h", raw[: 2 * n]))
    return rate, n_channels, samples


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2 uncompressed video stream
# ---------------------------------------------------------------------------


def encode_y4m(frames: Sequence[bytes], width: int, height: int) -> bytes:
    """Encode raw mono (Cmono: single Y plane of W*H bytes) frames as
    a YUV4MPEG2 stream."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode("ascii")
    out = bytearray(head)
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("frame plane size mismatch")
        out += b"FRAME\n"
        out += fr
    return bytes(out)


def decode_y4m(data: bytes) -> Tuple[int, int, List[bytes]]:
    """Decode a YUV4MPEG2 stream to (width, height, [Y planes]).
    Parses the tagged parameter list (order-independent, unknown
    X-tags ignored), requires Cmono (or absent C-tag is rejected —
    the default would be C420 with chroma planes this decoder does
    not model), and accepts per-frame parameter lines after FRAME."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M: bad stream header")
    width = height = None
    colorspace = None
    for tag in data[9:nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            colorspace = val.decode("ascii")
    if width is None or height is None:
        raise ValueError("Y4M header missing W or H")
    if colorspace != "mono":
        raise ValueError(f"unsupported Y4M colorspace: {colorspace!r}")
    plane = width * height
    frames: List[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1
        if pos + plane > len(data):
            raise ValueError("truncated Y4M frame plane")
        frames.append(data[pos : pos + plane])
        pos += plane
    return width, height, frames
