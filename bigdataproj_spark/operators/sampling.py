"""Deterministic sampling for training-data pipelines.

The reference has no sampling surface (its corpus fits one
Elasticsearch index; reference README.md:102-104) — but any 100 TB
training-data pipeline needs reproducible splits and samples, so the
engine provides them as first-class operators:

- **Hash split** (q60): assign every document to train/val/test by a
  content-independent hash of its key. Membership is a pure function
  of the key — stable under re-partitioning, re-ordering, incremental
  appends, and cluster size, which `df.sample()`/`TABLESAMPLE` are
  not. This is the industry-standard split recipe (e.g. the
  `hash(id) % N < k` splits used by large-corpus LM pipelines).
- **Stratified sample** (q61): fixed-size per-stratum sample chosen
  by hash order — deterministic "random" without a seed dependency on
  partitioning. One shuffle on the stratum key.

Both use the engine-portable 60-bit md5 hash (same construction as
SimHash/MinHash in ``dedup.py``) so DuckDB can replay the exact
assignment — the split itself is oracle-checked row-by-row, not just
its sizes.

At 100 TB: both operators are embarrassingly parallel scans (the
split adds zero shuffles; the stratified sample shuffles once on the
stratum key, and per-stratum top-k uses partial ORDER BY + LIMIT
inside the window, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# Deterministic hash split (train/val/test).
# ---------------------------------------------------------------------------

N_BUCKETS = 100
TRAIN_LT = 80  # buckets [0, 80)  → train
VAL_LT = 90    # buckets [80, 90) → val; [90, 100) → test
_SALT = "split-v1:"  # version the split: changing the salt re-rolls it


def hash60(key: Column, salt: str) -> Column:
    """Engine-portable 60-bit hash: int64 of the first 15 hex digits of
    md5(salt || key). The single definition every deterministic
    membership/order operator shares (splits, samples, mixing,
    training order); the SQL twin is ``hash60_sql``."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 15), 16, 10).cast(
        "long"
    )


def hash60_sql(key_sql: str, salt: str) -> str:
    """DuckDB twin of :func:`hash60`, bit-identical."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || {key_sql}), 1, 15)) AS BIGINT)"
    )


def _split_bucket(key: Column) -> Column:
    """Key → bucket in [0, N_BUCKETS): md5-prefix hash, engine-portable."""
    return (hash60(key, _SALT) % N_BUCKETS).cast("int")


def hash_split(df: DataFrame, key: Column) -> DataFrame:
    """Add ``bucket`` and ``split`` columns; pure map, no shuffle."""
    b = _split_bucket(key)
    split = (
        F.when(b < TRAIN_LT, "train").when(b < VAL_LT, "val").otherwise("test")
    )
    return df.withColumn("bucket", b).withColumn("split", split)


_Q10_ORACLE = f"""
SELECT
  doc_id,
  CAST(CAST(('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % {N_BUCKETS} AS INTEGER) AS bucket,
  CASE
    WHEN CAST(('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {N_BUCKETS} < {TRAIN_LT} THEN 'train'
    WHEN CAST(('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {N_BUCKETS} < {VAL_LT} THEN 'val'
    ELSE 'test'
  END AS split
FROM documents
ORDER BY doc_id
"""


@query("q60_hash_split", oracle=_Q10_ORACLE, tags=("L9", "sampling"))
def q60_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment for every document.

    Oracle-checked per row: DuckDB replays the identical md5-bucket
    arithmetic, so the check pins the exact membership function, not
    just the 80/10/10 proportions.
    """
    d = table(spark, sf_dir, "documents")
    return (
        hash_split(d, F.col("doc_id").cast("string"))
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Stratified fixed-size sample per stratum.
# ---------------------------------------------------------------------------

SAMPLE_PER_STRATUM = 20


_Q11_ORACLE = f"""
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY CAST(('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT), doc_id
    ) AS rn
  FROM documents
)
WHERE rn <= {SAMPLE_PER_STRATUM}
ORDER BY lang, doc_id
"""


@query("q61_stratified_sample", oracle=_Q11_ORACLE, tags=("L9", "sampling", "O3"))
def q61_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-language sample, chosen by hash order.

    Hash order is uniform pseudo-random yet fully deterministic, so
    the "random" sample is reproducible across runs, partitionings,
    and engines (the DuckDB oracle draws the identical rows). Plan:
    one shuffle on the stratum key; rank + filter prune to k rows per
    stratum before the final order.
    """
    d = table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"), _SALT)
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )
