"""Multimodal / binary-column operators (SURVEY.md §2.3 row L8).

Image/audio/video payloads are opaque ``BinaryType`` columns with typed
metadata structs. Round 5 replaced the earlier decode stub with a REAL
stdlib decoder: :func:`decode_media` parses genuine BMP / PNG / WAV
container headers with ``struct`` (magic sniff, chunk walks), and
:func:`decode_image_pixels` decodes actual pixel arrays (BMP row
de-padding + bottom-up flip; PNG zlib inflate + scanline unfiltering,
filter types 0-4). The resize operator resamples those real pixels
(vectorized nearest-neighbor) and re-encodes a genuine BMP.

The fixture tables carry no media column, so the registry queries
synthesize genuine media FILES deterministically from (doc_id, text)
— :func:`synthesize_media` emits real BMP/PNG/WAV bytes any external
tool can open — and then run the real decode path on them. Because
the generators are exact arithmetic (stored-deflate PNG, fixed-header
BMP/WAV), the DuckDB oracle replays byte counts, dimensions and frame
hashes without parsing, which makes generation → real-parse → output
an end-to-end checked round trip.

At scale the blobs stream through Arrow-batched ``mapInPandas``; each
batch holds a bounded number of rows so Python memory stays flat, and
every stage is a map — no shuffle anywhere in the modality pipeline.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# L8 binary expression ops (JVM-side, oracle-checked).
# ---------------------------------------------------------------------------

_Q23_ORACLE = """
WITH b AS (SELECT doc_id, text, encode(text) AS blob FROM documents)
SELECT
  doc_id,
  octet_length(blob) AS n_bytes,
  sha256(text) AS sha,
  md5(text) AS md5_hex,
  decode(blob) = text AS roundtrip_ok,
  'text/plain' AS mime
FROM b
ORDER BY doc_id
"""


@query("r129_binary_ops", oracle=_Q23_ORACLE, tags=("L8", "multimodal"))
def r129_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column fundamentals: byte length, content hashes,
    encode/decode round-trip, mime tag. Blob compare happens via
    hashes, never raw bytes (SURVEY.md §2.3 L8)."""
    d = table(spark, sf_dir, "documents")
    b = d.select("doc_id", "text", F.encode("text", "UTF-8").alias("blob"))
    return b.select(
        "doc_id",
        F.octet_length("blob").alias("n_bytes"),
        F.sha2("blob", 256).alias("sha"),
        F.md5("blob").alias("md5_hex"),
        (F.decode("blob", "UTF-8") == F.col("text")).alias("roundtrip_ok"),
        F.lit("text/plain").alias("mime"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Real media encoders (stdlib-only, deterministic byte layout).
# ---------------------------------------------------------------------------

_WAV_RATE = 8000
# PNG IDAT uses stored-deflate (level 0) so the byte count is exact
# arithmetic: 2-byte zlib header + one 5-byte stored block + payload +
# 4-byte adler for payloads <= _PNG_MAX_RAW (the one-block regime; the
# encoder asserts the bound).
_PNG_MAX_RAW = 65534


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as a real 24-bit BMP
    (BITMAPINFOHEADER, 4-byte-padded rows, bottom-up)."""
    h, w, _ = pixels.shape
    rowsize = (3 * w + 3) & ~3
    img_size = rowsize * h
    rows = np.zeros((h, rowsize), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1].reshape(h, 3 * w)  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + dib + rows.tobytes()


def encode_png(gray: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale array as a real PNG (8-bit,
    color type 0, filter 0 scanlines, stored-deflate IDAT)."""
    h, w = gray.shape
    raw = np.zeros((h, w + 1), dtype=np.uint8)
    raw[:, 1:] = gray  # filter byte 0 per scanline
    raw_b = raw.tobytes()
    assert len(raw_b) <= _PNG_MAX_RAW, "single stored-block regime only"

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw_b, 0))
        + chunk(b"IEND", b"")
    )


def encode_wav(data: bytes, rate: int = _WAV_RATE) -> bytes:
    """Wrap little-endian 16-bit mono PCM bytes in a real RIFF/WAVE
    container (canonical 44-byte header)."""
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


# ---------------------------------------------------------------------------
# Real media decoder (stdlib struct; the function the stub used to be).
# ---------------------------------------------------------------------------


def decode_media(blob: bytes) -> dict:
    """Parse a real media container's header: magic sniff, then the
    format's own layout. Returns {mime, width, height, n_frames,
    duration_ms}; images report n_frames=1, audio reports the PCM
    sample count and millisecond duration. Raises ValueError on an
    unrecognized container — corrupt blobs fail loudly, not as zeros.
    """
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        # A magic match does not prove a whole header: a truncated blob
        # must fail the documented ValueError contract, not struct.error
        # (the WAV branch already guards its chunk walk the same way).
        if len(blob) < 24:
            raise ValueError("corrupt PNG: truncated IHDR header")
        w, h = struct.unpack(">II", blob[16:24])
        return {
            "mime": "image/png",
            "width": w,
            "height": h,
            "n_frames": 1,
            "duration_ms": 0,
        }
    if blob[:2] == b"BM":
        if len(blob) < 26:
            raise ValueError("corrupt BMP: truncated DIB header")
        w, h = struct.unpack("<ii", blob[18:26])
        return {
            "mime": "image/bmp",
            "width": w,
            "height": abs(h),  # negative height = top-down rows
            "n_frames": 1,
            "duration_ms": 0,
        }
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        try:
            pos, rate, channels, bits, data_size, data_pos = 12, 0, 1, 16, 0, 0
            while pos + 8 <= len(blob):
                ctype, size = struct.unpack("<4sI", blob[pos : pos + 8])
                if ctype == b"fmt ":
                    _, channels, rate, _, _, bits = struct.unpack(
                        "<HHIIHH", blob[pos + 8 : pos + 24]
                    )
                elif ctype == b"data":
                    data_size, data_pos = size, pos + 8
                pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        except struct.error as e:  # truncated chunk: corrupt, not a crash
            raise ValueError(f"corrupt WAV container: {e}") from e
        if not rate:
            raise ValueError("WAV without fmt chunk")
        if channels <= 0 or bits < 8:
            raise ValueError(f"corrupt WAV fmt (channels={channels}, bits={bits})")
        if data_size and data_pos + data_size > len(blob):
            raise ValueError("corrupt WAV: data chunk declares more bytes than present")
        n_samples = data_size // (channels * bits // 8)
        return {
            "mime": "audio/wav",
            "width": 0,
            "height": 0,
            "n_frames": n_samples,
            "duration_ms": n_samples * 1000 // rate,
        }
    raise ValueError(f"unrecognized media container (magic {blob[:8]!r})")


def wav_data_bytes(blob: bytes) -> bytes:
    """The PCM payload of a WAV blob, located by the real chunk walk
    (not a fixed 44-byte offset — metadata chunks before 'data' are
    legal RIFF)."""
    pos = 12
    while pos + 8 <= len(blob):
        ctype, size = struct.unpack("<4sI", blob[pos : pos + 8])
        if ctype == b"data":
            return blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("WAV without data chunk")


def _png_unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4) for 8-bit grayscale.
    Vectorized per scanline; Paeth's per-pixel recurrence runs in a
    short Python loop only on rows that actually use type 3/4."""
    out = np.zeros((h, w), dtype=np.uint8)
    rows = raw.reshape(h, w + 1)
    for y in range(h):
        ftype, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-recurrent
            cur = np.zeros(w, dtype=np.int32)
            a = 0
            for x in range(w):
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                a = (int(line[x]) + pred) & 0xFF
                cur[x] = a
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_image_pixels(blob: bytes) -> np.ndarray:
    """Decode a BMP or PNG blob to an (h, w, 3) uint8 BGR pixel array —
    a real decode: BMP de-pads and flips its bottom-up rows; PNG
    inflates IDAT and unfilters scanlines (grayscale replicated to 3
    channels)."""
    meta = decode_media(blob)
    if meta["mime"] == "image/bmp":
        w, h = meta["width"], meta["height"]
        if len(blob) < 34:  # decode_media only proved the first 26 bytes
            raise ValueError("corrupt BMP: truncated BITMAPINFOHEADER")
        raw_h = struct.unpack("<i", blob[22:26])[0]  # sign = row order
        bpp = struct.unpack("<H", blob[28:30])[0]
        compression = struct.unpack("<I", blob[30:34])[0]
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP (bpp={bpp}, compression={compression}); "
                "only 24-bit uncompressed supported"
            )
        (offset,) = struct.unpack("<I", blob[10:14])
        rowsize = (3 * w + 3) & ~3
        if len(blob) < offset + rowsize * h:
            raise ValueError("corrupt BMP: truncated pixel data")
        rows = np.frombuffer(
            blob[offset : offset + rowsize * h], dtype=np.uint8
        ).reshape(h, rowsize)
        if raw_h > 0:  # bottom-up (canonical); negative = top-down
            rows = rows[::-1]
        return rows[:, : 3 * w].reshape(h, w, 3).copy()
    if meta["mime"] == "image/png":
        w, h = meta["width"], meta["height"]
        if len(blob) < 26:  # depth/ctype live past the IHDR dims
            raise ValueError("corrupt PNG: truncated IHDR header")
        depth, ctype = blob[24], blob[25]
        if (depth, ctype) != (8, 0):
            raise ValueError("only 8-bit grayscale PNG supported")
        idat, pos = b"", 8
        while pos + 8 <= len(blob):
            (size,) = struct.unpack(">I", blob[pos : pos + 4])
            if blob[pos + 4 : pos + 8] == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + size]
            pos += 12 + size
        gray = _png_unfilter(
            np.frombuffer(zlib.decompress(idat), dtype=np.uint8), h, w
        )
        return np.repeat(gray[:, :, None], 3, axis=2)
    raise ValueError(f"not an image: {meta['mime']}")


# ---------------------------------------------------------------------------
# Deterministic genuine-media synthesis (the fixture stand-in).
# ---------------------------------------------------------------------------


def _synth_one(doc_id: int, text: str) -> tuple[bytes, str]:
    """One genuine media file from (doc_id, text): doc_id selects the
    modality (0=PNG, 1=BMP, 2=WAV mod 3), dimensions are exact
    arithmetic on doc_id, payload bytes tile the document's UTF-8
    text. Every formula here has a 1:1 SQL twin in the oracles below.
    """
    tb = text.encode("utf-8") or b"\x00"
    kind = doc_id % 3
    if kind == 2:
        n_samples = len(text.encode("utf-8"))
        data = np.resize(np.frombuffer(tb, dtype=np.uint8), 2 * n_samples)
        return encode_wav(data.tobytes()), "audio/wav"
    w = doc_id % 100 + 8
    h = (doc_id * 7) % 100 + 8
    if kind == 0:
        gray = np.resize(np.frombuffer(tb, dtype=np.uint8), (h, w))
        return encode_png(gray), "image/png"
    pix = np.resize(np.frombuffer(tb, dtype=np.uint8), (h, w, 3))
    return encode_bmp(pix), "image/bmp"


def synthesize_media(df: DataFrame) -> DataFrame:
    """Attach a genuine media blob column to (doc_id, text) rows via
    mapInPandas — the engine's stand-in for a fixture binary column.
    Output rows carry real, externally-openable BMP/PNG/WAV bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                _synth_one(int(i), t) for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": pdf["text"],
                    "blob": [b for b, _ in blobs],
                    "mime": [m for _, m in blobs],
                }
            )

    return df.mapInPandas(run, "doc_id long, text string, blob binary, mime string")


# ---------------------------------------------------------------------------
# Metadata extraction: the real parser over Arrow-batched blobs.
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "n_frames long, duration_ms long"
)


def extract_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """mapInPandas metadata extraction over binary columns: each Arrow
    batch's blobs go through :func:`decode_media` (the REAL header
    parser). At scale the input is repartitioned so each batch holds a
    bounded number of blobs, keeping Python memory flat."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_media(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in metas],
                    "n_bytes": [len(b) for b in pdf[blob_col]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                }
            )

    return df.mapInPandas(run, MEDIA_META_SCHEMA)


# The oracle replays the generators' arithmetic (dimensions, exact
# container byte counts, PCM sample math) — the Spark side must parse
# the same numbers back out of the real bytes.
_Q24_ORACLE = """
WITH m AS (
  SELECT doc_id,
    octet_length(encode(text)) AS nt,
    CAST(doc_id % 100 + 8 AS INTEGER) AS w,
    CAST((doc_id * 7) % 100 + 8 AS INTEGER) AS h,
    doc_id % 3 AS kind
  FROM documents
)
SELECT doc_id,
  CASE kind WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
            ELSE 'audio/wav' END AS mime,
  CAST(CASE kind
    WHEN 0 THEN h * (w + 1) + 68
    WHEN 1 THEN 54 + ((3 * w + 3) // 4) * 4 * h
    ELSE 44 + 2 * nt END AS BIGINT) AS n_bytes,
  CAST(CASE WHEN kind = 2 THEN 0 ELSE w END AS INTEGER) AS width,
  CAST(CASE WHEN kind = 2 THEN 0 ELSE h END AS INTEGER) AS height,
  CAST(CASE WHEN kind = 2 THEN nt ELSE 1 END AS BIGINT) AS n_frames,
  CAST(CASE WHEN kind = 2 THEN nt * 1000 // 8000 ELSE 0 END AS BIGINT)
    AS duration_ms
FROM m
ORDER BY doc_id
"""


@query("r143_media_meta_extract", oracle=_Q24_ORACLE, tags=("L8", "U3", "multimodal"))
def r143_media_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine-media metadata extraction: synthesize real BMP/PNG/WAV
    files from the documents table, then parse their actual container
    headers back with :func:`decode_media`. The oracle recomputes
    every output from the generator arithmetic, so a parser that
    misreads a single header field (or an encoder that emits one byte
    off) hash-fails."""
    d = table(spark, sf_dir, "documents")
    media = synthesize_media(d.select("doc_id", "text"))
    return extract_media_meta(media.select("doc_id", "blob")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling: one output row per sampled audio frame (media → frame
# fan-out is the canonical 1-to-N multimodal op). Runs on genuine WAV
# blobs; frames are real 64-sample PCM blocks and the hash is over the
# actual block bytes.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"
_FRAME_STRIDE = 2
_FRAME_SAMPLES = 64  # samples per frame block (128 bytes of 16-bit PCM)
# Per-document frame cap, enforced on BOTH engine and oracle: a media
# pipeline samples at most this many blocks per item (unbounded
# per-item fan-out is a skew bug at scale), and the oracle's
# range(0, cap) is exact rather than an assumption about input sizes.
_MAX_FRAME_BLOCKS = 512


def sample_frames(df: DataFrame, stride: int = _FRAME_STRIDE) -> DataFrame:
    """Sample every ``stride``-th 64-sample block of each WAV blob via
    mapInPandas: parse the real container (data offset from the chunk
    walk), slice actual PCM bytes, hash them. Each input row fans out
    to n_frames/stride output rows; memory stays proportional to the
    Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        block = 2 * _FRAME_SAMPLES  # bytes per frame block
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta = decode_media(blob)
                if meta["mime"] != "audio/wav":
                    continue
                data = wav_data_bytes(blob)  # chunk-walk, not offset 44
                n_blocks = min(
                    meta["n_frames"] // _FRAME_SAMPLES, _MAX_FRAME_BLOCKS
                )
                for i in range(0, n_blocks, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(
                        hashlib.md5(data[i * block : (i + 1) * block]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


# The WAV payload tiles the text bytes to 2*nt, i.e. exactly text||text
# in UTF-8; the fixture text is ASCII by construction, so VARCHAR
# substr/md5 replay the byte slices exactly.
_Q98_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nt
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
    md5(substr(text || text, i * {2 * _FRAME_SAMPLES} + 1,
               {2 * _FRAME_SAMPLES})) AS frame_md5
  FROM b, (SELECT unnest(range(0, {_MAX_FRAME_BLOCKS}, {_FRAME_STRIDE})) AS i) idx
  WHERE i < nt // {_FRAME_SAMPLES}
)
SELECT doc_id, frame_idx, frame_md5
FROM frames
ORDER BY doc_id, frame_idx
"""


@query("r127_frame_sample", oracle=_Q98_ORACLE, tags=("L8", "multimodal"))
def r127_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling over genuine WAV blobs: the 1-to-N
    Arrow-batched fan-out hashes REAL PCM block bytes sliced at
    parser-derived offsets; the oracle replays the same bytes through
    the generator's text-tiling identity (data == text||text)."""
    d = table(spark, sf_dir, "documents")
    media = synthesize_media(d.select("doc_id", "text"))
    return sample_frames(media.select("doc_id", "blob")).orderBy(
        "doc_id", "frame_idx"
    )


# ---------------------------------------------------------------------------
# Resize: REAL nearest-neighbor resampling of decoded pixels, re-encoded
# as a genuine BMP, over the same mapInPandas plumbing.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, out_bytes long"
_TARGET_BOX = 64


def resize_media(df: DataFrame, target: int = _TARGET_BOX) -> DataFrame:
    """Fit each image into a target×target box (dimension clamp, no
    upscale) by actually resampling the decoded pixel array
    (vectorized nearest-neighbor index map) and re-encoding a genuine
    BMP thumbnail; outputs the real thumbnail's dimensions and byte
    count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "out_w": [], "out_h": [], "out_bytes": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                pix = decode_image_pixels(blob)
                h, w, _ = pix.shape
                ow, oh = min(w, target), min(h, target)
                ys = (np.arange(oh) * h) // oh
                xs = (np.arange(ow) * w) // ow
                thumb = encode_bmp(pix[ys][:, xs])
                out["doc_id"].append(doc_id)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["out_bytes"].append(len(thumb))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZE_SCHEMA)


# out_bytes is the REAL re-encoded BMP's length — which, BMP being a
# fixed-layout container, the oracle computes exactly.
_Q99_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
    CAST(doc_id % 100 + 8 AS INTEGER) AS w,
    CAST((doc_id * 7) % 100 + 8 AS INTEGER) AS h
  FROM documents WHERE doc_id % 3 < 2
)
SELECT doc_id,
  CAST(least(w, {_TARGET_BOX}) AS INTEGER) AS out_w,
  CAST(least(h, {_TARGET_BOX}) AS INTEGER) AS out_h,
  CAST(54 + ((3 * least(w, {_TARGET_BOX}) + 3) // 4) * 4
         * least(h, {_TARGET_BOX}) AS BIGINT) AS out_bytes
FROM m
ORDER BY doc_id
"""


@query("q47_media_resize", oracle=_Q99_ORACLE, tags=("L8", "multimodal"))
def q47_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pipeline on genuine images: decode real BMP/PNG pixel
    arrays, nearest-neighbor them into a 64-box, re-encode a real BMP,
    report its actual size. Pixel-level correctness is pinned by
    tests/test_media.py (known 4x4 → 2x2 resample); the oracle pins
    the distributed pipeline's dimensions and exact byte counts."""
    d = table(spark, sf_dir, "documents")
    media = synthesize_media(
        d.select("doc_id", "text").filter(F.col("doc_id") % 3 < 2)
    )
    return resize_media(media.select("doc_id", "blob")).orderBy("doc_id")
