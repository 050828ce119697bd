"""Multimodal column plumbing (SURVEY.md §2.5).

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata alongside. The container has no media libraries, so the
actual decode is stubbed (deterministic fake features derived from the
bytes, clearly marked) — but the Spark-side plumbing is real: binary
columns, typed metadata extraction in codegen, and an Arrow-batched
``mapInPandas`` feature-extraction stage with an explicit output
schema, partitioned so each batch stays memory-bounded at scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_streamloader_spark.operators.registry import register
from rs_streamloader_spark.session import load_tables


def synth_media(t: DataFrame) -> DataFrame:
    """Synthesize an opaque media payload per document (the testdata
    ships no real media; payload = utf-8 bytes of the text, standing in
    for e.g. a JPEG buffer) plus typed metadata."""
    return t.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.lit("application/x-fake").alias("mime"),
        ).alias("media_meta"),
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           MD5(text) AS content_hash,
           CAST(ASCII(SUBSTR(text, 1, 1)) AS INTEGER) AS first_byte
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary media columns — stays entirely in
    JVM codegen (no Python), which is the pattern for manifest-level
    media bookkeeping at 100 TB (size accounting, content-addressed
    dedup by payload hash)."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    m = synth_media(t)
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        F.expr("CAST(ascii(substring(CAST(payload AS STRING), 1, 1)) AS INT)").alias(
            "first_byte"
        ),
    )


# output schema of the fake feature extractor
_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, byte_sum bigint, byte_min int, byte_max int"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB media decoder (mapInPandas body).

    A real deployment would decode the payload here (PIL / torchaudio /
    pyav) and emit embeddings, dimensions, frame samples, etc. Those
    libraries are not in this container, so this emits deterministic
    byte-level statistics instead — exercising the real plumbing
    (Arrow batches in, typed rows out, bounded memory per batch).
    """
    for pdf in batches:
        # empty payloads carry no byte statistics: skip the row
        # (matches the oracle, whose per-character explode emits no
        # rows for empty text) instead of crashing min()/max()
        mask = pdf["payload"].map(len) > 0
        pdf = pdf[mask]
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                "byte_min": payloads.map(lambda b: int(min(b))).astype("int32"),
                "byte_max": payloads.map(lambda b: int(max(b))).astype("int32"),
            }
        )


FRAME_BYTES = 64
MAX_FRAMES = 4


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler (mapInPandas body): a real deployment would
    demux/decode video here (pyav) and emit sampled frames; this slices
    the opaque payload into fixed-size pseudo-frames instead — same
    plumbing (one input row → up to MAX_FRAMES typed rows, Arrow both
    ways, bounded memory per batch)."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_hash": [], "frame_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            for i in range(MAX_FRAMES):
                chunk = data[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                if not chunk:
                    break
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
                out["frame_bytes"].append(len(chunk))
        yield pd.DataFrame(out).astype(
            {"doc_id": "int64", "frame_idx": "int32", "frame_bytes": "int32"}
        )


@register(
    "multimodal_frames",
    oracle=f"""
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           MD5(SUBSTR(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}))
             AS frame_hash,
           CAST(LEAST({FRAME_BYTES}, LENGTH(text) - i * {FRAME_BYTES}) AS INTEGER)
             AS frame_bytes
    FROM documents, (SELECT UNNEST(RANGE(0, {MAX_FRAMES})) AS i)
    WHERE i * {FRAME_BYTES} < LENGTH(text)
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads via ``mapInPandas`` —
    the video/audio decode slot. The stub slices deterministic
    pseudo-frames, so the full pipeline (binary column → Python worker
    → typed frame rows) IS oracle-checked: the documents corpus is
    ASCII, making the byte-slice digests reproducible in SQL."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    media = synth_media(t).repartition("doc_id")
    return media.mapInPandas(
        _sample_frames,
        schema="doc_id bigint, frame_idx int, frame_hash string, frame_bytes int",
    )


@register(
    "multimodal_features",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text) + 1),
                    i -> ASCII(SUBSTR(text, CAST(i AS INTEGER), 1)))) AS b
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_bytes,
           CAST(SUM(b) AS BIGINT) AS byte_sum,
           CAST(MIN(b) AS INTEGER) AS byte_min,
           CAST(MAX(b) AS INTEGER) AS byte_max
    FROM chars GROUP BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the decode/resize/frame-sample slot. Repartitions
    by doc_id so batches are balanced; at scale, payload bytes flow
    executor→Python worker via Arrow without driver involvement.

    The decode is the documented deterministic STUB (no media libs in
    the container), but since it emits byte-level statistics and the
    documents corpus is ASCII (bytes == characters), the WHOLE
    pipeline — binary column → Arrow → Python worker → typed rows —
    is now oracle-checked against a per-character SQL twin, upgrading
    this from the driver's rows-only check."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    media = synth_media(t).repartition("doc_id")
    return media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize / downsample (the image-thumbnail slot)
# ---------------------------------------------------------------------------

THUMB_BYTES = 32  # fixed output size — the point of a resize


def _resize_thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resizer (mapInPandas body): a real deployment would decode
    the image and bilinear-resample to a fixed thumbnail (PIL) — no
    media libs here, so this nearest-neighbor downsamples the raw BYTE
    stream to THUMB_BYTES samples instead. The plumbing under audit is
    identical: variable-size binary in → fixed-size binary out, Arrow
    both directions, constant memory per row regardless of payload
    size (the property that makes resize safe at 100 TB)."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "n_bytes": [], "thumb": [], "thumb_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n = len(data)
            # nearest-neighbor sample grid: position i -> byte at
            # floor(i*n/THUMB_BYTES); short payloads keep every byte
            if n >= THUMB_BYTES:
                thumb = bytes(
                    data[(i * n) // THUMB_BYTES] for i in range(THUMB_BYTES)
                )
            else:
                thumb = data
            out["doc_id"].append(doc_id)
            out["n_bytes"].append(n)
            out["thumb"].append(thumb)
            out["thumb_hash"].append(hashlib.md5(thumb).hexdigest())
        yield pd.DataFrame(out).astype({"doc_id": "int64", "n_bytes": "int32"})


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_bytes,
           MD5(CASE WHEN LENGTH(text) >= {THUMB_BYTES} THEN
                 LIST_AGGREGATE(LIST_TRANSFORM(RANGE(0, {THUMB_BYTES}),
                   i -> SUBSTR(text,
                          CAST((i * LENGTH(text)) // {THUMB_BYTES} + 1
                               AS INTEGER), 1)), 'string_agg', '')
               ELSE text END) AS thumb_hash
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample over opaque media payloads via ``mapInPandas``
    — the image-thumbnail slot next to ``multimodal_frames``
    (frame-sample) and ``multimodal_features`` (feature-extract). The
    stub nearest-neighbor samples the byte stream to a fixed
    {THUMB_BYTES}-byte thumbnail; because the documents corpus is
    ASCII, the sampled thumbnail digest is reproducible in SQL, so the
    whole variable-in/fixed-out Arrow pipeline is oracle-checked (the
    binary ``thumb`` column itself is exercised by the Python side and
    hashed — the hash is the cross-engine witness).

    Scale posture: constant output bytes per row by construction —
    resize is the operator that caps downstream width; one narrow
    mapInPandas pass, no shuffle at all."""
    t = load_tables(spark, sf_dir, "documents")["documents"]
    media = synth_media(t).repartition("doc_id")
    return media.mapInPandas(
        _resize_thumbs,
        schema="doc_id bigint, n_bytes int, thumb binary, thumb_hash string",
    ).drop("thumb")
