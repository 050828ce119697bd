"""Edge-contract pins for the multimodal family (ADVICE r13 items):

1. ``audio_haar_band_energy`` must SKIP docs shorter than one sample
   pair — the oracle's ``2*i+1 < LENGTH(text)`` pair CTE emits no row
   for a 1-char doc, so the Spark path emitting a degenerate
   (n_pairs=0) row broke exact cross-engine parity on valid input.
2. ``_audio_samples`` clamps to int16 — one non-ASCII character
   (ord >= 224 → sample > 32767) must degrade gracefully instead of
   aborting the whole query executor-side. The clamp is mirrored in
   the audio oracles (GREATEST/LEAST), a no-op on ASCII corpora.
3. ``multimodal_meta``'s fixed-offset WAV width read must misreport
   LOUDLY (NULL) on a spec-valid WAV whose chunk at offset 37 is not
   'data' (e.g. a LIST chunk before it) — never silently wrong.
4. The vectorized array encoders keep the scalar fail-loud contract:
   out-of-byte-range pixels / out-of-int16-range samples raise.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from rs_streamloader_spark.functions.media import (
    decode_wav_array,
    encode_bmp_array,
    encode_wav_array,
    encode_y4m_array,
)


def test_haar_skips_docs_shorter_than_one_pair(spark, monkeypatch):
    import rs_streamloader_spark.operators.multimodal as M

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["x", "xy", "xyz"]}
    )
    sdf = spark.createDataFrame(pdf)
    monkeypatch.setattr(
        M, "load_tables", lambda _s, _d, *names: {"documents": sdf}
    )
    rows = {r["doc_id"]: r for r in
            M.audio_haar_band_energy(spark, "x").collect()}
    # the 1-char doc is ABSENT (matching the oracle's pair CTE), the
    # 2- and 3-char docs each carry exactly one pair
    assert set(rows) == {2, 3}
    assert rows[2]["n_pairs"] == 1 and rows[3]["n_pairs"] == 1


def test_audio_samples_clamped_to_int16():
    from rs_streamloader_spark.operators.multimodal import (
        _audio_samples,
        _audio_samples_arr,
    )

    # chr(224): (224-96)*256 = 32768 — one past int16 max; chr(1000)
    # far outside; both must clamp, not overflow the PCM encode
    s = _audio_samples("a" + chr(224) + chr(1000))
    assert s == [(ord("a") - 96) * 256, 32767, 32767]
    # the clamped vector survives the real encode → decode round trip
    rate, ch, back = decode_wav_array(
        encode_wav_array(_audio_samples_arr("a" + chr(224)))
    )
    assert back.tolist() == [(ord("a") - 96) * 256, 32767]


def test_meta_wav_width_null_when_data_chunk_not_at_canonical_offset(spark):
    from rs_streamloader_spark.operators.multimodal import _meta_select

    # spec-valid WAV with a LIST chunk BEFORE data — decode_wav walks
    # it fine, but the fixed-offset-41 width read would land inside
    # the LIST body: the meta parse must report NULL, not garbage
    extra = b"LIST" + struct.pack("<I", 10) + b"INFOIART\x00\x00"
    noncanon = (
        b"RIFF" + struct.pack("<I", 36 + 18 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + extra
        + b"data" + struct.pack("<I", 4)
        + struct.pack("<2h", 7, -7)
    )
    canon = bytes(encode_wav_array(np.array([7, -7], dtype=np.int64)))
    df = spark.createDataFrame(
        [(1, bytearray(noncanon)), (2, bytearray(canon))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in _meta_select(df).collect()}
    assert rows[1]["mime"] == "audio/x-wav"
    assert rows[1]["width"] is None          # loud, not silently wrong
    assert rows[2]["width"] == 2             # canonical layout still parses
    assert rows[2]["height"] == 1


def test_array_encoders_keep_fail_loud_range_contract():
    with pytest.raises(ValueError, match="range"):
        encode_bmp_array(np.full((2, 2, 3), 300, dtype=np.int64))
    with pytest.raises(ValueError, match="-32768"):
        encode_wav_array(np.array([40000], dtype=np.int64))
    with pytest.raises(ValueError, match="range"):
        encode_y4m_array(np.full((1, 64), 256, dtype=np.int64), 8, 8)
