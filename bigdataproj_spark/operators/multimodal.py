"""Multimodal / binary-column operators (SURVEY.md §2.3 row L8).

Image/audio/video payloads are opaque ``BinaryType`` columns with typed
metadata structs. The decode step is stubbed (no media libs in this
container — see ``decode_media``) but the Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signature, partitioning — is real
and oracle-checked via a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

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


@query("q73_binary_ops", oracle=_Q23_ORACLE, tags=("L8", "multimodal"))
def q73_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# Decode / feature-extract plumbing over mapInPandas (Arrow batches).
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = "doc_id long, n_bytes long, width int, height int, n_frames int"


def decode_media(blob: bytes, mime: str) -> dict:
    """Real media decode — requires image/audio libs absent from this
    container. STUB: the engine's contract is the surrounding Spark
    plumbing; swap this single function for a PIL/ffmpeg call in a
    full deployment."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; use fake_media_meta for tests"
    )


def fake_media_meta(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode_media: derives fake
    width/height/frame-count from byte length (pure arithmetic, so an
    SQL oracle can replicate it)."""
    n = len(blob)
    return n % 640, (n * 7) % 480, n % 16


def extract_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """mapInPandas feature extraction over binary columns.

    Arrow ships (doc_id, blob) batches to Python; each batch returns a
    metadata frame. At scale the input is repartitioned so each Arrow
    batch holds a bounded number of blobs, keeping Python memory flat.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_media_meta(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf[blob_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(run, MEDIA_META_SCHEMA)


_Q24_ORACLE = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT
  doc_id,
  n AS n_bytes,
  CAST(n % 640 AS INTEGER) AS width,
  CAST((n * 7) % 480 AS INTEGER) AS height,
  CAST(n % 16 AS INTEGER) AS n_frames
FROM b
ORDER BY doc_id
"""


@query("q74_media_meta_extract", oracle=_Q24_ORACLE, tags=("L8", "U3", "multimodal"))
def q74_media_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched metadata extraction over binary blobs (the decode
    step is the deterministic fake, making the full mapInPandas
    pipeline oracle-checkable)."""
    d = table(spark, sf_dir, "documents")
    b = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return extract_media_meta(b).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling: one output row per sampled frame (video → frames is
# the canonical 1-to-N multimodal op). Decode is the deterministic
# fake (frame i = a text slice); the mapInPandas fan-out, schema, and
# batch shape are the real contract.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"
_FRAME_STRIDE = 2


def sample_frames(df: DataFrame, stride: int = _FRAME_STRIDE) -> DataFrame:
    """Sample every ``stride``-th frame of each blob via mapInPandas.

    Arrow ships (doc_id, text, blob) batches in; each input row fans
    out to n_frames/stride output rows — the Python side yields one
    frame table per batch, keeping memory proportional to batch size
    (at scale, repartition bounds rows per batch).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, text, blob in zip(pdf["doc_id"], pdf["text"], pdf["blob"]):
                n_frames = fake_media_meta(blob)[2]
                for i in range(0, n_frames, stride):
                    frame = text[i * 17 : i * 17 + 32]  # fake decode: slice
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


_Q98_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) % 16 AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
    md5(substr(text, i * 17 + 1, 32)) AS frame_md5
  FROM b, (SELECT unnest(range(0, 16, {_FRAME_STRIDE})) AS i) idx
  WHERE i < n_frames
)
SELECT doc_id, frame_idx, frame_md5
FROM frames
ORDER BY doc_id, frame_idx
"""


@query("q30_frame_sample", oracle=_Q98_ORACLE, tags=("L8", "multimodal"))
def q30_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling over binary media blobs: a 1-to-N
    Arrow-batched fan-out whose Python slice stands in for a real
    frame decoder (swap the slice for ffmpeg in deployment — the
    Spark plumbing is identical)."""
    d = table(spark, sf_dir, "documents")
    b = d.select("doc_id", "text", F.encode("text", "UTF-8").alias("blob"))
    return sample_frames(b).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# Resize: deterministic dimension/byte arithmetic standing in for a
# pixel resampler, over the same mapInPandas plumbing.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, out_bytes long"
_TARGET_BOX = 64


def resize_media(df: DataFrame, target: int = _TARGET_BOX) -> DataFrame:
    """Fit each media item into a target×target box (aspect-free fake:
    clamp each dimension; output byte count scales by the area ratio
    in exact integer arithmetic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "out_w": [], "out_h": [], "out_bytes": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, _ = fake_media_meta(blob)
                ow, oh = min(w, target), min(h, target)
                area, oarea = max(w * h, 1), ow * oh
                out["doc_id"].append(doc_id)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["out_bytes"].append(len(blob) * oarea // area)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZE_SCHEMA)


_Q99_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
    octet_length(encode(text)) AS n,
    octet_length(encode(text)) % 640 AS w,
    (octet_length(encode(text)) * 7) % 480 AS h
  FROM documents
)
SELECT doc_id,
  CAST(least(w, {_TARGET_BOX}) AS INTEGER) AS out_w,
  CAST(least(h, {_TARGET_BOX}) AS INTEGER) AS out_h,
  CAST(n * (least(w, {_TARGET_BOX}) * least(h, {_TARGET_BOX}))
         // greatest(w * h, 1) AS BIGINT) AS out_bytes
FROM m
ORDER BY doc_id
"""


@query("q40_media_resize", oracle=_Q99_ORACLE, tags=("L8", "multimodal"))
def q40_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-box over binary media with exact integer byte-count
    arithmetic (the pixel resampler is the stub; the distributed
    plumbing and the metadata math are the tested contract)."""
    d = table(spark, sf_dir, "documents")
    b = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return resize_media(b).orderBy("doc_id")
