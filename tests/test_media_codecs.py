"""Spec-pinned tests for the from-spec stdlib media codecs
(functions/media.py) — the avro_reader testing posture: the
encoder/decoder pair could round-trip a SHARED misreading of a spec,
so the decoders are pinned against hand-constructed golden bytes
written straight from the published format specs (including the
classic 2x2 24bpp BMP example), and format-semantics corners (row
padding, bottom-up vs top-down, pixel-array offset, RIFF chunk
walking, word-alignment pads, Y4M tag parsing) each get their own
constructed case.
"""

from __future__ import annotations

import struct

import pytest

from rs_streamloader_spark.functions.media import (
    bmp_row_size,
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
)

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

# The published 2x2 24bpp example (e.g. the BMP file format article):
# 70-byte file, pixel array at 54, rows stored bottom-up in BGR with
# 2 pad bytes per row. Top-down content: blue green / red white.
_BMP_2X2_GOLDEN = bytes.fromhex(
    "424d46000000000000003600000028000000020000000200000001001800"
    "0000000010000000130b0000130b00000000000000000000"
    "0000ff" "ffffff" "0000"  # stored row 0 = BOTTOM row: red, white
    "ff0000" "00ff00" "0000"  # stored row 1 = TOP row: blue, green
)


def test_bmp_golden_2x2_decodes_bottom_up_bgr_padded():
    w, h, grid = decode_bmp(_BMP_2X2_GOLDEN)
    assert (w, h) == (2, 2)
    # top-down output: blue, green on top; red, white below
    assert grid[0] == [(0, 0, 255), (0, 255, 0)]
    assert grid[1] == [(255, 0, 0), (255, 255, 255)]


def test_bmp_top_down_negative_height():
    """biHeight < 0 means rows are stored TOP-DOWN — the same pixel
    bytes must come back flipped relative to the bottom-up golden."""
    buf = bytearray(_BMP_2X2_GOLDEN)
    struct.pack_into("<i", buf, 14 + 8, -2)
    w, h, grid = decode_bmp(bytes(buf))
    assert (w, h) == (2, 2)
    assert grid[0] == [(255, 0, 0), (255, 255, 255)]
    assert grid[1] == [(0, 0, 255), (0, 255, 0)]


def test_bmp_honors_pixel_array_offset():
    """The pixel array starts at the offset NAMED IN THE HEADER, not
    'right after the headers' — insert a 4-byte gap and bump the
    offset; the decode must be unchanged."""
    head, pixels = _BMP_2X2_GOLDEN[:54], _BMP_2X2_GOLDEN[54:]
    buf = bytearray(head + b"\xde\xad\xbe\xef" + pixels)
    struct.pack_into("<I", buf, 10, 58)
    assert decode_bmp(bytes(buf)) == decode_bmp(_BMP_2X2_GOLDEN)


def test_bmp_row_padding_math():
    # 3W rounded up to 4 bytes: the spec's padding table
    assert [bmp_row_size(w) for w in (1, 2, 3, 4, 5)] == [4, 8, 12, 12, 16]


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 10])
def test_bmp_round_trip_every_padding_class(w):
    """Round-trip at every W mod 4 class (pad 0..3 bytes) with
    asymmetric pixels so a row-order or channel-order bug flips the
    result."""
    h = 3
    grid = [
        [((r * 7 + c * 13) % 256, (r + 200) % 256, (c + 50) % 256) for c in range(w)]
        for r in range(h)
    ]
    data = encode_bmp(w, h, grid)
    assert len(data) == 54 + h * bmp_row_size(w)
    assert decode_bmp(data) == (w, h, grid)


def test_bmp_rejects_bad_magic_and_unsupported_variants():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG" + _BMP_2X2_GOLDEN[3:])
    buf = bytearray(_BMP_2X2_GOLDEN)
    struct.pack_into("<H", buf, 14 + 14, 8)  # 8 bpp
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(buf))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(_BMP_2X2_GOLDEN[:60])


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

# Canonical 44-byte-header mono PCM16 file, 4 samples, written by hand
# from the RIFF/WAVE spec: RIFF size = 36 + data size.
_WAV_GOLDEN = (
    b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data" + struct.pack("<I", 8)
    + struct.pack("<4h", 100, -200, 32767, -32768)
)


def test_wav_golden_canonical_decode():
    rate, ch, samples = decode_wav(_WAV_GOLDEN)
    assert (rate, ch) == (8000, 1)
    assert samples == [100, -200, 32767, -32768]


def test_wav_chunk_walk_skips_list_chunk():
    """A LIST chunk between fmt and data must be walked over — readers
    that assume the canonical 44-byte layout break here."""
    extra = b"LIST" + struct.pack("<I", 10) + b"INFOIART\x00\x00"
    data = (
        b"RIFF" + struct.pack("<I", 36 + 18 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
        + extra
        + b"data" + struct.pack("<I", 4)
        + struct.pack("<2h", 7, -7)
    )
    rate, ch, samples = decode_wav(data)
    assert (rate, samples) == (44100, [7, -7])


def test_wav_odd_chunk_consumes_word_alignment_pad():
    """Odd-sized chunks carry one pad byte NOT counted in the chunk
    size — a walker that forgets it lands mid-chunk and dies."""
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 + pad
    data = (
        b"RIFF" + struct.pack("<I", 36 + 12 + 6) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + odd
        + b"data" + struct.pack("<I", 2)
        + struct.pack("<h", 1234)
    )
    assert decode_wav(data)[2] == [1234]


def test_wav_rejects_truncated_chunk():
    """A chunk whose declared size overruns the file must raise (the
    silent-clamp alternative yields quietly wrong features) — same
    corruption class the BMP/Y4M decoders already reject."""
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(_WAV_GOLDEN[:-3])  # data chunk loses its tail


def test_wav_rejects_bad_magic_and_non_pcm():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFX" + _WAV_GOLDEN[4:])
    buf = bytearray(_WAV_GOLDEN)
    struct.pack_into("<H", buf, 20, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError, match="missing"):
        decode_wav(_WAV_GOLDEN[:12])


def test_wav_round_trip_extremes():
    samples = [0, 1, -1, 32767, -32768, 0, 0, 12345]
    rate, ch, back = decode_wav(encode_wav(samples, 16000))
    assert (rate, ch, back) == (16000, 1, samples)


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------

_Y4M_GOLDEN = (
    b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono\n"
    + b"FRAME\n" + bytes([10, 20, 30, 40])
    + b"FRAME\n" + bytes([50, 60, 70, 80])
)


def test_y4m_golden_two_frames():
    w, h, frames = decode_y4m(_Y4M_GOLDEN)
    assert (w, h) == (2, 2)
    assert frames == [bytes([10, 20, 30, 40]), bytes([50, 60, 70, 80])]


def test_y4m_tag_order_independent_and_x_tags_ignored():
    data = (
        b"YUV4MPEG2 Cmono H3 XNONSTANDARD W1 F30:1\n"
        + b"FRAME\n" + bytes([1, 2, 3])
    )
    assert decode_y4m(data) == (1, 3, [bytes([1, 2, 3])])


def test_y4m_per_frame_parameter_line_accepted():
    data = (
        b"YUV4MPEG2 W1 H1 Cmono\n"
        + b"FRAME Ip\n" + bytes([9])
    )
    assert decode_y4m(data) == (1, 1, [bytes([9])])


def test_y4m_rejects_chroma_colorspaces_and_bad_streams():
    # absent C tag defaults to C420 (chroma planes we don't model)
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(4))
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + bytes(6))
    with pytest.raises(ValueError, match="magic|header"):
        decode_y4m(b"JPEG4MPEG2 W2 H2 Cmono\n")
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(b"YUV4MPEG2 W2 H2 Cmono\nBLAME\n" + bytes(4))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + bytes(3))


def test_y4m_round_trip():
    frames = [bytes(range(64)), bytes(range(64, 128))]
    assert decode_y4m(encode_y4m(frames, 8, 8)) == (8, 8, frames)
    with pytest.raises(ValueError, match="plane"):
        encode_y4m([bytes(63)], 8, 8)


# ---------------------------------------------------------------------------
# synthesis-contract encoders survive the real decoders
# ---------------------------------------------------------------------------


def test_synth_image_survives_decode_at_every_width():
    """The operator-side synthesis (variable W in 8..16 crosses every
    padding class) must decode back to the exact grid it encoded."""
    from rs_streamloader_spark.operators.multimodal import _image_grid

    text = "The quick brown fox jumps over the lazy dog 0123456789"
    for doc_id in range(9):
        w, h, grid = _image_grid(doc_id, text)
        assert decode_bmp(encode_bmp(w, h, grid)) == (w, h, grid)
