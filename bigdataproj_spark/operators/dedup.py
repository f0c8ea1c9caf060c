"""Deduplication operators for training-data pipelines.

SURVEY.md §2.3 rows L1 (exact content-hash dedup), L2 (MinHash-LSH
near-dup), plus n-gram Jaccard pair mining. The documents fixture is
the target corpus.

Scale design: exact dedup is one shuffle on the fingerprint; Jaccard
pair mining and MinHash-LSH both shuffle on the shingle/bucket key so
no pairwise comparison ever leaves a bounded candidate bucket (the
brute-force all-pairs form is never materialized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query
from .text import FINGERPRINT_SQL, TOKENS_SQL, fingerprint, tokens

# ---------------------------------------------------------------------------
# L1 exact dedup: canonical-id assignment by content fingerprint.
# ---------------------------------------------------------------------------

_Q60_ORACLE = f"""
WITH fp AS (SELECT doc_id, {FINGERPRINT_SQL} AS f FROM documents)
SELECT
  doc_id,
  MIN(doc_id) OVER (PARTITION BY f) AS canonical_id,
  doc_id <> MIN(doc_id) OVER (PARTITION BY f) AS is_duplicate
FROM fp
ORDER BY doc_id
"""


@query("q60_exact_dedup", oracle=_Q60_ORACLE, tags=("L1", "dedup", "bench"))
def q60_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: every document mapped to the smallest doc_id
    sharing its content fingerprint (survivor), flagged if duplicate.

    One shuffle on the 128-bit fingerprint; group sizes are tiny by
    construction, so no skew risk at 100 TB.
    """
    d = table(spark, sf_dir, "documents")
    fp = d.select("doc_id", fingerprint("text").alias("f"))
    w = Window.partitionBy("f")
    return fp.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Word-shingle helpers (shared by Jaccard + MinHash).
# ---------------------------------------------------------------------------

SHINGLE_SIZE = 3


def shingles(toks: Column | str, k: int = SHINGLE_SIZE) -> Column:
    """Distinct word k-gram shingles from a token array."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


SHINGLES_SQL = (
    f"list_distinct(list_transform(range(0, len(toks) - {SHINGLE_SIZE - 1}),"
    f" i -> array_to_string(toks[i + 1 : i + {SHINGLE_SIZE}], ' ')))"
)

# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pair mining (oracle-checkable form of L2).
# ---------------------------------------------------------------------------

_JACCARD_THRESHOLD = 0.2

_Q61_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
           WHERE len({TOKENS_SQL}) >= {SHINGLE_SIZE}),
sh AS (SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM t),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
  CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jaccard
FROM pairs
JOIN counts ca ON doc_a = ca.doc_id
JOIN counts cb ON doc_b = cb.doc_id
WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= {_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


@query("q61_ngram_jaccard", oracle=_Q61_ORACLE, tags=("L2", "dedup"))
def q61_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard similarity ≥ 0.2.

    The pair generation is an equi-join on the shingle key (inverted
    index), NOT an all-pairs comparison — pairs only materialize for
    documents that share at least one shingle. At 100 TB the one extra
    guard is dropping ultra-frequent shingles (stop-shingles) before
    the self-join; the fixture corpus doesn't need it.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= SHINGLE_SIZE
    )
    sh = t.select("doc_id", F.explode(shingles("toks")).alias("shingle"))
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jaccard = F.col("shared").cast("double") / (
        F.col("ca.n") + F.col("cb.n") - F.col("shared")
    )
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jaccard >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "shared", jaccard.alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# L2 MinHash + LSH banding. Signature hash is xxhash64 (native, fast,
# no DuckDB twin) → rows-only driver check; the semantics are pinned by
# tests/test_dedup.py: every pair found by q61 with jaccard ≥ 0.5 must
# surface as an LSH candidate, and estimates must track true Jaccard.
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """doc_id → fixed-length MinHash signature array.

    Input: (doc_id, shingle) exploded pairs. ONE shuffle: the N_HASHES
    per-seed minima are independent literal-seeded ``min(xxhash64(...))``
    aggregates in a single groupBy — no 16× row explosion, no second
    shuffle, fully inside whole-stage codegen with map-side partial
    aggregation (an earlier explode+double-groupBy formulation was ~40×
    slower at sf0.1).
    """
    mins = [
        F.min(F.xxhash64("shingle", F.lit(s))).alias(f"mh{s}")
        for s in range(N_HASHES)
    ]
    per_doc = sh.groupBy("doc_id").agg(*mins)
    return per_doc.select(
        "doc_id", F.array(*[f"mh{s}" for s in range(N_HASHES)]).alias("sig")
    )


@query("q62_minhash_lsh", oracle=None, tags=("L2", "dedup", "bench"))
def q62_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates with signature-estimated Jaccard.

    16 hashes, 4 bands × 4 rows (candidate threshold ≈ 0.5 Jaccard).
    Candidates come from an equi-join on (band, band_hash) — documents
    only ever meet inside an LSH bucket, which is the property that
    scales this to 100 TB corpora.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= SHINGLE_SIZE
    )
    sh = t.select("doc_id", F.explode(shingles("toks")).alias("shingle"))
    sigs = minhash_signatures(sh)

    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        b,
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / N_HASHES
    )
    return (
        cand.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )
