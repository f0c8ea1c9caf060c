"""L8 media codec tests: the REAL decode path on genuine bytes.

These pin the codec layer below the oracle-checked queries: exact
pixel arrays through encode→decode round trips, known-answer resamples,
header parses of handcrafted (non-engine-generated) containers, and
loud failure on garbage. The distributed pipeline on top is checked by
the r143/r127/q47 oracle rows."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigdataproj_spark.operators.multimodal import (
    _synth_one,
    decode_image_pixels,
    decode_media,
    encode_bmp,
    encode_png,
    encode_wav,
)


def test_bmp_roundtrip_exact_pixels():
    rng = np.random.default_rng(42)
    pix = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    blob = encode_bmp(pix)
    meta = decode_media(blob)
    assert (meta["mime"], meta["width"], meta["height"]) == ("image/bmp", 7, 13)
    assert meta["n_frames"] == 1
    np.testing.assert_array_equal(decode_image_pixels(blob), pix)
    # real container: row stride is 4-byte aligned
    assert len(blob) == 54 + ((3 * 7 + 3) // 4) * 4 * 13


def test_png_roundtrip_exact_pixels():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(9, 21), dtype=np.uint8)
    blob = encode_png(gray)
    meta = decode_media(blob)
    assert (meta["mime"], meta["width"], meta["height"]) == ("image/png", 21, 9)
    np.testing.assert_array_equal(decode_image_pixels(blob)[:, :, 0], gray)
    # IHDR CRC is genuine (any external PNG reader would verify it)
    ihdr = blob[12:16] + blob[16:29]
    assert struct.unpack(">I", blob[29:33])[0] == zlib.crc32(ihdr)
    assert len(blob) == 9 * 22 + 68


def test_png_unfilter_handles_sub_up_avg_paeth():
    """A PNG using filters our encoder never emits (handcrafted
    scanlines with types 1, 2, 3, 4) must still decode — the parser is
    a real unfilterer, not an inverse of our own encoder."""
    w = 4
    truth = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [17, 27, 37, 47], [20, 30, 40, 50]],
        dtype=np.uint8,
    )
    lines = []
    # row0: Sub (type 1): raw[x] = cur[x] - cur[x-1]
    r = truth[0].astype(int)
    lines.append(bytes([1]) + bytes([(r[x] - (r[x - 1] if x else 0)) & 0xFF for x in range(w)]))
    # row1: Up (type 2): raw = cur - prev
    lines.append(bytes([2]) + bytes([(int(truth[1][x]) - int(truth[0][x])) & 0xFF for x in range(w)]))
    # row2: Average (type 3): raw = cur - (left + up)//2
    cur, prev, out = truth[2].astype(int), truth[1].astype(int), []
    for x in range(w):
        left = cur[x - 1] if x else 0
        out.append((cur[x] - (left + prev[x]) // 2) & 0xFF)
    lines.append(bytes([3]) + bytes(out))
    # row3: Paeth (type 4)
    cur, prev, out = truth[3].astype(int), truth[2].astype(int), []
    for x in range(w):
        a = cur[x - 1] if x else 0
        b = prev[x]
        c = prev[x - 1] if x else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((cur[x] - pred) & 0xFF)
    lines.append(bytes([4]) + bytes(out))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))  # real deflate too
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_image_pixels(blob)[:, :, 0], truth)


def test_wav_parse_and_duration():
    data = bytes(range(200)) * 2  # 400 bytes -> 200 samples of 16-bit mono
    blob = encode_wav(data, rate=8000)
    meta = decode_media(blob)
    assert meta["mime"] == "audio/wav"
    assert meta["n_frames"] == 200
    assert meta["duration_ms"] == 200 * 1000 // 8000
    assert len(blob) == 44 + 400


def test_wav_chunk_walk_tolerates_extra_chunks():
    """A real-world WAV with a LIST metadata chunk between fmt and data
    (and an odd-sized chunk needing word alignment) still parses —
    the decoder walks chunks, it doesn't assume the canonical layout."""
    data = b"\x01\x02" * 50
    blob = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 16000, 32000, 2, 16)
        + struct.pack("<4sI", b"LIST", 5)
        + b"INFOx\x00"  # 5 payload bytes + 1 pad (word alignment)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )
    meta = decode_media(blob)
    assert meta["n_frames"] == 50
    assert meta["duration_ms"] == 50 * 1000 // 16000


def test_bmp_top_down_height():
    pix = np.zeros((3, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(pix))
    blob[22:26] = struct.pack("<i", -3)  # top-down variant
    meta = decode_media(bytes(blob))
    assert meta["height"] == 3


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="unrecognized media container"):
        decode_media(b"\x00\x01\x02\x03\x04\x05\x06\x07rubbish")


def test_nearest_neighbor_known_answer():
    """4x4 → 2x2 nearest-neighbor with the query's index map picks
    rows/cols 0 and 2 — checked at exact pixel values through the
    encode→decode→resample→encode→decode chain."""
    base = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    blob = encode_bmp(base)
    pix = decode_image_pixels(blob)
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(2) * 4) // 2
    thumb = decode_image_pixels(encode_bmp(pix[ys][:, xs]))
    np.testing.assert_array_equal(thumb, base[[0, 2]][:, [0, 2]])


def test_synth_one_emits_all_three_containers():
    for doc_id, mime in [(0, "image/png"), (1, "image/bmp"), (2, "audio/wav")]:
        blob, m = _synth_one(doc_id, "hello media world")
        assert m == mime
        assert decode_media(blob)["mime"] == mime


def test_bmp_top_down_pixels_not_flipped():
    """A top-down BMP (negative height) stores rows first-to-last; the
    decoder must NOT apply the bottom-up flip. Constructed by negating
    the height of a bottom-up encode, whose stored rows are the
    reverse of the logical image."""
    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(encode_bmp(pix))
    blob[22:26] = struct.pack("<i", -2)
    np.testing.assert_array_equal(decode_image_pixels(bytes(blob)), pix[::-1])


def test_bmp_unsupported_depth_raises():
    pix = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(pix))
    blob[28:30] = struct.pack("<H", 8)  # claim 8bpp palette
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_image_pixels(bytes(blob))


def test_truncated_wav_data_raises():
    blob = encode_wav(b"\x00\x01" * 100)
    with pytest.raises(ValueError, match="more bytes than present"):
        decode_media(blob[:60])  # header intact, payload cut


def test_zero_bits_wav_raises():
    blob = bytearray(encode_wav(b"\x00\x01" * 4))
    blob[34:36] = struct.pack("<H", 0)  # fmt bits = 0
    with pytest.raises(ValueError, match="corrupt WAV fmt"):
        decode_media(bytes(blob))


def test_truncated_headers_raise_value_error():
    """A blob matching a container magic but shorter than its header
    must fail the documented ValueError contract — not leak a raw
    struct.error (the round-5 gap: PNG/BMP unpacked fixed offsets
    unguarded while WAV wrapped its chunk walk)."""
    truncated_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8  # magic, no IHDR dims
    with pytest.raises(ValueError, match="truncated IHDR"):
        decode_media(truncated_png)
    truncated_bmp = b"BM" + b"\x00" * 10  # magic, no DIB dims
    with pytest.raises(ValueError, match="truncated DIB"):
        decode_media(truncated_bmp)
    # decode_image_pixels reads deeper than decode_media proves: a BMP
    # whose header stops right after the dims must also raise cleanly.
    import struct as _struct

    bmp_26 = b"BM" + b"\x00" * 16 + _struct.pack("<ii", 4, 4)
    with pytest.raises(ValueError, match="truncated BITMAPINFOHEADER"):
        decode_image_pixels(bmp_26)
