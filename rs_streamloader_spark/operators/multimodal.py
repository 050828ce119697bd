"""Multimodal operators over REAL media payloads (SURVEY.md §2.5).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The container has no media libraries, so the codecs are implemented
FROM THEIR PUBLIC SPECS in ``functions/media.py`` (BMP / WAV / Y4M —
the avro_reader.py precedent: stdlib-only, executor-side, pinned by
golden-byte tests), and every operator here does real pixel / PCM
math over genuinely decoded payloads.

Because the testdata ships no media files, each query SYNTHESIZES its
payloads deterministically from the documents table first — the
payload content is a fixed integer function of (doc_id, text), stated
once per modality below — then runs the real pipeline:

    text ──encode (spec A)──▶ BMP/WAV/Y4M bytes
         ──decode (independent spec walk)──▶ pixels / samples / frames
         ──integer feature math──▶ typed rows

while the DuckDB oracle recomputes the same integer features straight
from ``text`` — so an encoder/decoder disagreement OR a feature-math
bug breaks the hash compare, and a SHARED encoder+decoder misreading
of the spec is caught by the golden-byte decoder tests
(tests/test_media_codecs.py).

Synthesis contract (n = LENGTH(text); rows with n = 0 are skipped):

- image (BMP 24bpp): W = 8 + doc_id % 9, H = 8 + n % 9; the pixel at
  top-down (row r, col c) has v = ascii(text[(r*W + c) % n]) and
  channels R = v, G = (v + c) % 256, B = (v + r) % 256.
- audio (WAV PCM16 mono 8 kHz): n samples, s_i = (ascii(text[i]) - 96) * 256.
- video (Y4M Cmono 8x8): min(4, ceil(n/64)) frames; frame k pixel j
  has Y = ascii(text[(k*64 + j) % n]).

All decode stages are Arrow-batched ``mapInPandas`` with explicit
output schemas and zero shuffles — at 100 TB the payload bytes flow
executor → Python worker via Arrow with no driver involvement, and
output width is bounded by construction (features/resize emit O(1)
per payload, frames ≤ MAX_FRAMES rows per payload).

Reference surface: none (novel extension; the reference repo has no
media handling).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_streamloader_spark.functions.media import (
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
)
from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables

MAX_FRAMES = 4
FRAME_W = 8
FRAME_H = 8
THUMB_DIM = 4  # resize target: THUMB_DIM x THUMB_DIM
WAV_RATE = 8000

# Y4M stream header the Cmono encoder emits for 8x8 frames — its
# length feeds the meta oracle's file-size formula.
_Y4M_HEADER_LEN = len(f"YUV4MPEG2 W{FRAME_W} H{FRAME_H} F25:1 Ip A1:1 Cmono\n")


# ---------------------------------------------------------------------------
# deterministic payload synthesis (encoder side of the contract)
# ---------------------------------------------------------------------------


def _image_grid(doc_id: int, text: str) -> Tuple[int, int, List[List[Tuple[int, int, int]]]]:
    n = len(text)
    w = 8 + doc_id % 9
    h = 8 + n % 9
    grid = []
    for r in range(h):
        row = []
        for c in range(w):
            v = ord(text[(r * w + c) % n])
            row.append((v, (v + c) % 256, (v + r) % 256))
        grid.append(row)
    return w, h, grid


def _audio_samples(text: str) -> List[int]:
    return [(ord(ch) - 96) * 256 for ch in text]


def _video_frames(text: str) -> List[bytes]:
    n = len(text)
    n_frames = min(MAX_FRAMES, (n + FRAME_W * FRAME_H - 1) // (FRAME_W * FRAME_H))
    plane = FRAME_W * FRAME_H
    return [
        bytes(ord(text[(k * plane + j) % n]) for j in range(plane))
        for k in range(n_frames)
    ]


def _encode_payload(doc_id: int, text: str) -> bytes:
    """Modality by doc_id % 3: 0 → BMP image, 1 → WAV audio, 2 → Y4M
    video (the mixed-manifest input for multimodal_meta)."""
    m = doc_id % 3
    if m == 0:
        w, h, grid = _image_grid(doc_id, text)
        return encode_bmp(w, h, grid)
    if m == 1:
        return encode_wav(_audio_samples(text), WAV_RATE)
    return encode_y4m(_video_frames(text), FRAME_W, FRAME_H)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")["documents"]
    return t.select("doc_id", "text").where(F.length("text") > 0)


# ---------------------------------------------------------------------------
# multimodal_meta — mixed-manifest header bookkeeping, JVM-side parse
# ---------------------------------------------------------------------------


def _synth_mixed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [
                    _encode_payload(int(d), t)
                    for d, t in zip(pdf["doc_id"], pdf["text"])
                ],
            }
        )


def _le_int(start: int, nbytes: int) -> Column:
    """Little-endian unsigned int read from ``payload`` at 1-based
    byte offset ``start`` — pure JVM codegen (hex per byte, reversed,
    base-16 conv)."""
    parts = [
        F.hex(F.expr(f"substring(payload, {start + i}, 1)"))
        for i in reversed(range(nbytes))
    ]
    return F.conv(F.concat(*parts), 16, 10).cast("int")


@register(
    "multimodal_meta",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, LENGTH(text) AS n, CAST(doc_id % 3 AS INTEGER) AS mod3
      FROM documents WHERE LENGTH(text) > 0
    )
    SELECT doc_id,
           CASE mod3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/x-wav'
                ELSE 'video/x-yuv4mpeg' END AS mime,
           CAST(CASE mod3 WHEN 0 THEN 8 + doc_id % 9
                WHEN 1 THEN n ELSE {FRAME_W} END AS INTEGER) AS width,
           CAST(CASE mod3 WHEN 0 THEN 8 + n % 9
                WHEN 1 THEN 1 ELSE {FRAME_H} END AS INTEGER) AS height,
           CAST(CASE mod3
                WHEN 0 THEN 54 + (8 + n % 9) * (((8 + doc_id % 9) * 3 + 3) // 4 * 4)
                WHEN 1 THEN 44 + 2 * n
                ELSE {_Y4M_HEADER_LEN} + LEAST(4, (n + 63) // 64)
                     * (6 + {FRAME_W * FRAME_H})
                END AS INTEGER) AS n_bytes
    FROM m
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level bookkeeping over a MIXED media manifest (BMP /
    WAV / Y4M payloads): mime sniffed from magic bytes and container
    dimensions parsed straight out of the binary headers — all in JVM
    codegen (hex/conv little-endian reads, regexp over the Y4M text
    header), no Python in the parse. That is the 100 TB pattern for
    media-lake bookkeeping: size/dimension accounting without ever
    decoding a pixel.

    The WAV arm reads the canonical fmt+data layout this repo's
    encoder writes (offset 41); the full chunk-walking reader lives in
    the Python decode path (functions/media.decode_wav) where
    non-canonical files are actually decoded.

    The oracle recomputes every header field from the synthesis
    contract — so a wrong header WRITE (encoder) and a wrong header
    READ (JVM parse) both break the compare independently."""
    media = _docs(spark, sf_dir).mapInPandas(
        _synth_mixed, schema="doc_id bigint, payload binary"
    )
    s4 = "CAST(substring(payload, 1, 4) AS STRING)"
    is_bmp = F.expr("CAST(substring(payload, 1, 2) AS STRING) = 'BM'")
    is_wav = F.expr(f"{s4} = 'RIFF' AND CAST(substring(payload, 9, 4) AS STRING) = 'WAVE'")
    is_y4m = F.expr("CAST(substring(payload, 1, 9) AS STRING) = 'YUV4MPEG2'")
    header_str = F.expr("CAST(payload AS STRING)")
    return media.select(
        "doc_id",
        F.when(is_bmp, F.lit("image/bmp"))
        .when(is_wav, F.lit("audio/x-wav"))
        .when(is_y4m, F.lit("video/x-yuv4mpeg"))
        .alias("mime"),
        F.when(is_bmp, _le_int(19, 4))
        .when(is_wav, (_le_int(41, 4) / 2).cast("int"))
        .when(is_y4m, F.regexp_extract(header_str, r"W(\d+)", 1).cast("int"))
        .alias("width"),
        F.when(is_bmp, _le_int(23, 4))
        .when(is_wav, F.lit(1))
        .when(is_y4m, F.regexp_extract(header_str, r"H(\d+)", 1).cast("int"))
        .alias("height"),
        F.octet_length("payload").cast("int").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# multimodal_features — WAV decode → PCM feature math
# ---------------------------------------------------------------------------


def _wav_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode → REAL RIFF decode → PCM features (peak, energy,
    zero-crossings). The decoder is the independent chunk-walking
    parser; the features are exact integer math over its samples."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "n_samples": [],
            "peak_abs": [],
            "energy": [],
            "zero_cross": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            payload = encode_wav(_audio_samples(text), WAV_RATE)
            _rate, _ch, s = decode_wav(payload)
            zc = sum(
                1 for i in range(1, len(s)) if (s[i] >= 0) != (s[i - 1] >= 0)
            )
            out["doc_id"].append(doc_id)
            out["n_samples"].append(len(s))
            out["peak_abs"].append(max(abs(x) for x in s))
            out["energy"].append(sum(x * x for x in s))
            out["zero_cross"].append(zc)
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64",
                "n_samples": "int32",
                "peak_abs": "int32",
                "energy": "int64",
                "zero_cross": "int32",
            }
        )


@register(
    "multimodal_features",
    oracle="""
    WITH s AS (
      SELECT doc_id, i,
             (ASCII(SUBSTR(text, CAST(i + 1 AS INTEGER), 1)) - 96) * 256 AS v
      FROM documents,
           (SELECT UNNEST(RANGE(0, (SELECT MAX(LENGTH(text)) FROM documents))) AS i)
      WHERE i < LENGTH(text)
    ),
    lagd AS (
      SELECT doc_id, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v >= 0) != (pv >= 0))
                    THEN 1 ELSE 0 END) AS INTEGER) AS zero_cross
    FROM lagd GROUP BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over REAL WAV payloads: the Arrow
    batch carries the RIFF bytes into the Python worker, the
    chunk-walking PCM decoder (functions/media.decode_wav) recovers
    the int16 samples, and the features — peak amplitude, total
    energy, zero-crossing count (the classic voiced/unvoiced
    discriminator) — are exact integer math over the decoded
    waveform. One map-only pass, O(1) output per payload, zero
    shuffles; the oracle recomputes the identical integers from the
    synthesis contract."""
    return _docs(spark, sf_dir).mapInPandas(
        _wav_features,
        schema=(
            "doc_id bigint, n_samples int, peak_abs int,"
            " energy bigint, zero_cross int"
        ),
    )


# ---------------------------------------------------------------------------
# multimodal_frames — Y4M decode → per-frame luma statistics
# ---------------------------------------------------------------------------


def _y4m_frame_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "doc_id": [],
            "frame_idx": [],
            "y_sum": [],
            "y_min": [],
            "y_max": [],
            "frame_hash": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            payload = encode_y4m(_video_frames(text), FRAME_W, FRAME_H)
            _w, _h, frames = decode_y4m(payload)
            for k, plane in enumerate(frames):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(k)
                out["y_sum"].append(sum(plane))
                out["y_min"].append(min(plane))
                out["y_max"].append(max(plane))
                out["frame_hash"].append(hashlib.md5(plane).hexdigest())
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64",
                "frame_idx": "int32",
                "y_sum": "int64",
                "y_min": "int32",
                "y_max": "int32",
            }
        )


@register(
    "multimodal_frames",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, LENGTH(text) AS n,
             LEAST({MAX_FRAMES}, (LENGTH(text) + 63) // 64) AS nf
      FROM documents WHERE LENGTH(text) > 0
    ),
    px AS (
      SELECT doc_id, k, j,
             ASCII(SUBSTR(text, CAST((k * 64 + j) % n + 1 AS INTEGER), 1)) AS y
      FROM d,
           (SELECT UNNEST(RANGE(0, {MAX_FRAMES})) AS k),
           (SELECT UNNEST(RANGE(0, 64)) AS j)
      WHERE k < nf
    )
    SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
           CAST(SUM(y) AS BIGINT) AS y_sum,
           CAST(MIN(y) AS INTEGER) AS y_min,
           CAST(MAX(y) AS INTEGER) AS y_max,
           MD5(STRING_AGG(CHR(y), '' ORDER BY j)) AS frame_hash
    FROM px GROUP BY doc_id, k
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over REAL Y4M video streams: the YUV4MPEG2
    decoder (functions/media.decode_y4m) parses the tagged stream
    header and walks the FRAME markers, and each decoded 8x8 Y plane
    emits one typed row — luma sum/min/max plus an md5 plane digest
    as the byte-exact witness. One input row fans out to at most
    MAX_FRAMES output rows (bounded by construction), Arrow both
    directions, zero shuffles. The oracle rebuilds every plane
    character-by-character from the synthesis contract — CHR(y)
    string-aggregated in pixel order — and must reproduce the digest
    of the bytes the decoder actually returned."""
    return _docs(spark, sf_dir).mapInPandas(
        _y4m_frame_stats,
        schema=(
            "doc_id bigint, frame_idx int, y_sum bigint, y_min int,"
            " y_max int, frame_hash string"
        ),
    )


# ---------------------------------------------------------------------------
# multimodal_resize — BMP decode → real 2-D nearest-neighbor thumbnail
# ---------------------------------------------------------------------------


def _resize_thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode → REAL BMP decode (bottom-up storage, BGR, row padding
    — all honored by functions/media.decode_bmp) → nearest-neighbor
    resample on the 2-D pixel grid to THUMB_DIM x THUMB_DIM."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "width": [],
            "height": [],
            "thumb_lum_sum": [],
            "thumb_hash": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            w0, h0, grid0 = _image_grid(int(doc_id), text)
            payload = encode_bmp(w0, h0, grid0)
            w, h, grid = decode_bmp(payload)
            parts = []
            lum = 0
            for rp in range(THUMB_DIM):
                for cp in range(THUMB_DIM):
                    r, g, b = grid[(rp * h) // THUMB_DIM][(cp * w) // THUMB_DIM]
                    parts.append(f"{r},{g},{b};")
                    lum += 2126 * r + 7152 * g + 722 * b
            canon = "".join(parts)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["thumb_lum_sum"].append(lum)
            out["thumb_hash"].append(
                hashlib.md5(canon.encode("ascii")).hexdigest()
            )
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64",
                "width": "int32",
                "height": "int32",
                "thumb_lum_sum": "int64",
            }
        )


@register(
    "multimodal_resize",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, LENGTH(text) AS n,
             8 + doc_id % 9 AS w, 8 + LENGTH(text) % 9 AS h
      FROM documents WHERE LENGTH(text) > 0
    ),
    px AS (
      SELECT doc_id, w, h, rp, cp,
             (rp * h) // {THUMB_DIM} AS r, (cp * w) // {THUMB_DIM} AS c
      FROM d,
           (SELECT UNNEST(RANGE(0, {THUMB_DIM})) AS rp),
           (SELECT UNNEST(RANGE(0, {THUMB_DIM})) AS cp)
    ),
    rgb AS (
      SELECT px.doc_id, px.w, px.h, px.rp, px.cp,
             ASCII(SUBSTR(d.text, CAST((px.r * px.w + px.c) % d.n + 1
                                       AS INTEGER), 1)) AS v,
             px.r, px.c
      FROM px JOIN d ON px.doc_id = d.doc_id
    )
    SELECT doc_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(SUM(2126 * v + 7152 * ((v + c) % 256)
                    + 722 * ((v + r) % 256)) AS BIGINT) AS thumb_lum_sum,
           MD5(STRING_AGG(
                 v || ',' || (v + c) % 256 || ',' || (v + r) % 256 || ';',
                 '' ORDER BY rp, cp)) AS thumb_hash
    FROM rgb GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over REAL BMP payloads: decode the 24bpp bitmap
    (bottom-up row order, BGR channels, 4-byte row padding — the spec
    semantics functions/media.decode_bmp implements and the golden
    tests pin), then nearest-neighbor resample the 2-D pixel grid to
    a fixed 4x4 thumbnail: out(r',c') = in((r'*H)//4, (c'*W)//4).
    Emits the exact
    BT.709-integer luminance sum of the sampled pixels plus an md5
    over the canonical "R,G,B;" thumbnail string — the oracle rebuilds
    both from the synthesis contract, so a resize index bug, a channel
    swap, or a row-order bug each breaks the digest.

    Scale posture: constant output bytes per row by construction —
    resize is the operator that caps downstream width; one narrow
    map-only pass, zero shuffles."""
    return _docs(spark, sf_dir).mapInPandas(
        _resize_thumbs,
        schema=(
            "doc_id bigint, width int, height int, thumb_lum_sum bigint,"
            " thumb_hash string"
        ),
    )


# ---------------------------------------------------------------------------
# audio_haar_band_energy — subband DSP over decoded PCM
# ---------------------------------------------------------------------------


def _haar_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "doc_id": [],
            "n_pairs": [],
            "e_low": [],
            "e_high": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            payload = encode_wav(_audio_samples(text), WAV_RATE)
            _rate, _ch, s = decode_wav(payload)
            m = len(s) // 2
            e_low = 0
            e_high = 0
            for i in range(m):
                a = s[2 * i] + s[2 * i + 1]
                d = s[2 * i] - s[2 * i + 1]
                e_low += a * a
                e_high += d * d
            out["doc_id"].append(doc_id)
            out["n_pairs"].append(m)
            out["e_low"].append(e_low)
            out["e_high"].append(e_high)
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64",
                "n_pairs": "int32",
                "e_low": "int64",
                "e_high": "int64",
            }
        )


@register(
    "audio_haar_band_energy",
    oracle="""
    WITH s AS (
      SELECT doc_id, i,
             (ASCII(SUBSTR(text, CAST(2 * i + 1 AS INTEGER), 1)) - 96) * 256 AS s0,
             (ASCII(SUBSTR(text, CAST(2 * i + 2 AS INTEGER), 1)) - 96) * 256 AS s1
      FROM documents,
           (SELECT UNNEST(RANGE(0, (SELECT MAX(LENGTH(text)) FROM documents))) AS i)
      WHERE 2 * i + 1 < LENGTH(text)
    ),
    e AS (
      SELECT doc_id,
             CAST(COUNT(*) AS INTEGER) AS n_pairs,
             CAST(SUM(CAST(s0 + s1 AS BIGINT) * (s0 + s1)) AS BIGINT) AS e_low,
             CAST(SUM(CAST(s0 - s1 AS BIGINT) * (s0 - s1)) AS BIGINT) AS e_high
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, n_pairs, e_low, e_high,
           CASE WHEN e_low + e_high > 0 THEN
             ROUND(CAST(e_high AS DOUBLE) / (e_low + e_high), 6)
           END AS high_ratio
    FROM e
    """,
)
def audio_haar_band_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-level Haar subband analysis over decoded PCM — real DSP
    on real WAV payloads: adjacent-sample sums/differences split the
    waveform into a low band (local average ≈ below Nyquist/2) and a
    high band (local difference ≈ above it); the per-band energies
    Σ(s₂ᵢ+s₂ᵢ₊₁)² and Σ(s₂ᵢ−s₂ᵢ₊₁)² are exact integers, and
    high_ratio = E_high/(E_low+E_high) is the classic spectral-tilt
    feature (text-seeded waveforms are noise-like, so the ratio sits
    near 0.5 with real per-doc variation). The whole analysis runs on
    the OUTPUT of the chunk-walking RIFF decoder, one map-only pass,
    O(1) output per payload, zero shuffles.

    Reference surface: none (novel extension, SURVEY.md §2.5
    multimodal family)."""
    raw = _docs(spark, sf_dir).mapInPandas(
        _haar_bands,
        schema="doc_id bigint, n_pairs int, e_low bigint, e_high bigint",
    )
    return raw.select(
        "doc_id",
        "n_pairs",
        "e_low",
        "e_high",
        F.expr(
            "CASE WHEN e_low + e_high > 0 THEN"
            " ROUND(CAST(e_high AS DOUBLE) / (e_low + e_high), 6) END"
        ).alias("high_ratio"),
    )
