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

_Q70_ORACLE = """
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


@query("q70_binary_ops", oracle=_Q70_ORACLE, tags=("L8", "multimodal"))
def q70_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
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


_Q71_ORACLE = """
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


@query("q71_media_meta_extract", oracle=_Q71_ORACLE, tags=("L8", "U3", "multimodal"))
def q71_media_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched metadata extraction over binary blobs (the decode
    step is the deterministic fake, making the full mapInPandas
    pipeline oracle-checkable)."""
    d = table(spark, sf_dir, "documents")
    b = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return extract_media_meta(b).orderBy("doc_id")
