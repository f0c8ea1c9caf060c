"""S4 partitioned parquet sink + R13 query layer.

The reference indexes enriched tweets into Elasticsearch and queries
them "by hashtags, sentiment, or user information" (reference
README.md:102-104). The engine's stand-in at 100 TB scale is a parquet
table PARTITIONED BY the hot query key: partition pruning turns a
query-by-sentiment into a scan of one directory, the same access-path
win the ES index provided (SURVEY.md §2.2 S4, R13→Q-group mapping).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import pid_scratch, scratch_tag, table
from ..registry import query
from ..operators.text import LEX_SQL, TOKENS_SQL, sentiment_scores

_SINK_ROOT = os.path.join(tempfile.gettempdir(), "bigdataproj_sink")


def partitioned_sink(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """S4: write a DataFrame as parquet partitioned by query keys."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def query_index(spark: SparkSession, path: str) -> DataFrame:
    """R13: open the partitioned index for predicate queries; filters
    on partition columns prune directories before any IO."""
    return spark.read.parquet(path)


def _enriched_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents + sentiment label (the L6 lexicon scorer, shared
    with r139 via text.sentiment_scores) — the engine's analog of the
    reference's enriched-tweet record."""
    d = table(spark, sf_dir, "documents")
    scores = sentiment_scores(d)
    return d.join(scores, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.when(F.coalesce("s", F.lit(0)) > 0, "positive")
        .when(F.coalesce("s", F.lit(0)) < 0, "negative")
        .otherwise("neutral")
        .alias("sentiment"),
    )


_ENRICHED_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
),
lex(token, weight) AS (VALUES {{lex}}),
scores AS (
  SELECT t.doc_id, CAST(SUM(l.weight) AS BIGINT) AS s
  FROM toks t JOIN lex l ON t.token = l.token GROUP BY t.doc_id
),
enriched AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars,
    CASE WHEN COALESCE(s.s, 0) > 0 THEN 'positive'
         WHEN COALESCE(s.s, 0) < 0 THEN 'negative'
         ELSE 'neutral' END AS sentiment
  FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
)
"""



_Q43_ORACLE = (
    _ENRICHED_SQL.format(lex=LEX_SQL)
    + """
SELECT sentiment, lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM enriched
GROUP BY sentiment, lang
ORDER BY sentiment, lang
"""
)


@query("r79_partitioned_sink", oracle=_Q43_ORACLE, tags=("S4", "sources"))
def r79_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 round-trip: enriched documents → parquet partitioned by
    (sentiment, lang) → re-open → aggregate per partition key.

    Matching the oracle proves partition-column values survive the
    directory encoding (hive-style key=value paths) and that the
    re-opened index returns exactly the written rows.
    """
    # per-process + per-query scratch: r79 and r80 each write their own
    # index (a shared dir is clobbered at plan-BUILD time by whichever
    # query builds second, invalidating the first's captured file list)
    out = os.path.join(pid_scratch(_SINK_ROOT), scratch_tag(sf_dir), "doc_index_q93")
    partitioned_sink(_enriched_documents(spark, sf_dir), out, ["sentiment", "lang"])
    idx = query_index(spark, out)
    return (
        idx.groupBy("sentiment", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("sentiment", "lang")
    )


_Q44_ORACLE = (
    _ENRICHED_SQL.format(lex=LEX_SQL)
    + """
SELECT doc_id, lang, source, n_chars
FROM enriched
WHERE sentiment = 'negative' AND lang = 'en'
ORDER BY doc_id
"""
)


@query("r80_query_index", oracle=_Q44_ORACLE, tags=("R13", "sources"))
def r80_query_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 predicate query against the partitioned index: fetch all
    negative-sentiment English documents.

    Both predicates hit partition columns, so the physical plan prunes
    to the single ``sentiment=negative/lang=en`` directory — verified
    in tests/test_plans.py (PartitionFilters, no full scan) — the
    ES-query capability of the reference re-expressed as partition
    pruning.
    """
    out = os.path.join(pid_scratch(_SINK_ROOT), scratch_tag(sf_dir), "doc_index_q94")
    partitioned_sink(_enriched_documents(spark, sf_dir), out, ["sentiment", "lang"])
    idx = query_index(spark, out)
    return (
        idx.filter((F.col("sentiment") == "negative") & (F.col("lang") == "en"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# S9 (engine extension): small-file compaction — snapshot rewrite to a
# target file size, the standing maintenance job of any parquet lake.
# ---------------------------------------------------------------------------

_COMPACT_TARGET_BYTES = 128 * 1024 * 1024  # the classic 128 MiB target


def compact_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = _COMPACT_TARGET_BYTES,
) -> int:
    """Rewrite a parquet directory into ceil(total_bytes/target) files.

    Streaming ingest (one file per micro-batch — see ST9's upsert
    sink) and fine-grained partitioning both accrete small files; at
    scale every query then pays per-file open/footer costs and the
    scheduler drowns in tasks. Compaction is the fix: one scan, a
    coalesce to the target file count (coalesce, not repartition — no
    shuffle, it only merges read splits), one write of the next
    snapshot. Returns the file count written.

    The rewrite preserves rows exactly (asserted in
    tests/test_engine.py); at 100 TB this runs per-partition-directory
    so each compaction task set is bounded.
    """
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files
