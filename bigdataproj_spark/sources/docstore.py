"""Round 7 (S15, closing r6-VERDICT item 3): clustered at-rest layout
for DOCUMENTS row-level scans.

`route_corpus_scan` gave the events table the S14 treatment (day
directories); documents scans still read the raw fixture parquet. The
canonical row-level document queries are corpus slices — "the English
docs from these sources", "the short docs of one language" — so the
at-rest answer is the same two-level clustering the lineitem layouts
use, instantiated on the documents key hierarchy:

- hive-partition by ``lang``: the coarse, low-cardinality axis
  (|langs| directories at any corpus scale). ``lang`` is a REAL
  partition column here, so Catalyst prunes directories from the row
  predicate itself — no derived superset filter needed (unlike the
  dated layouts, whose partition key is a truncation of the filter
  column).
- within each language, range-sort files by (``source``,
  ``n_chars``): parquet file/row-group min-max stats then skip
  non-matching sources and length bands inside the kept directories.

At 100 TB the text column dominates the bytes; a scan that opens one
language directory and skips to two sources reads megabytes instead of
the corpus. Appends land as new files in their language directories
(pruning keeps working; in-file sort stays tight over the batch);
:func:`..maintenance.optimize_warehouse` re-clusters on a schedule —
the same append/optimize posture as every other row-level layout.

Cited behavior: reference README.md:102-104 (query the indexed store —
the engine, not the user, picks the layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from .bucketed import _layout_paths


def write_clustered_docs(
    df: DataFrame,
    path: str,
    n_files: int = 16,
    row_group_bytes: int | None = None,
) -> None:
    """Write a documents frame hive-partitioned by language and
    range-sorted by (source, n_chars) within each partition.
    ``row_group_bytes`` forces small row groups for scale-independent
    skip assertions in tests; production keeps the 128 MB default."""
    w = (
        df.repartitionByRange(n_files, "lang", "source", "n_chars")
        .sortWithinPartitions("lang", "source", "n_chars")
        .write.mode("overwrite")
        .partitionBy("lang")
    )
    if row_group_bytes:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def append_clustered_docs(
    df: DataFrame,
    path: str,
    n_files: int = 4,
    row_group_bytes: int | None = None,
) -> None:
    """Append an ingest batch: rows land in their language directories
    as NEW (source, n_chars)-sorted files — directory pruning stays
    exactly as effective; within-directory skipping degrades only for
    the batch's own files, which are themselves sorted. The scheduled
    OPTIMIZE rewrite re-merges (maintenance.optimize_warehouse)."""
    w = (
        df.repartitionByRange(n_files, "lang", "source", "n_chars")
        .sortWithinPartitions("lang", "source", "n_chars")
        .write.mode("append")
        .partitionBy("lang")
    )
    if row_group_bytes:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def clustered_documents(spark: SparkSession, sf_dir: str) -> str:
    """Deploy (memoized per session+fixture) the clustered documents
    layout and return its path."""
    tag, wh = _layout_paths(sf_dir)
    memo: dict = spark.__dict__.setdefault("_bdp_docstore_memo", {})
    if sf_dir in memo:
        return memo[sf_dir]
    path = os.path.join(wh, f"documents_clustered_{tag}")
    if spark.__dict__.get("_bdp_as_of_active"):
        # S22: a lazy deploy INSIDE a snapshot read must never write
        # the live layout path — overwrite mode would destroy the live
        # layout's appended batches (found by direct probe: an
        # as_of(0) scan wiped a post-ingest Z-order row). The twin
        # path lands in the SWAPPED memo (discarded at exit; files are
        # VACUUM orphans). Content is epoch-correct: a missing memo
        # means this table was never ingested by that epoch, so the
        # fixture IS the epoch's relation.
        path += "_asof"
    write_clustered_docs(table(spark, sf_dir, "documents"), path)
    memo[sf_dir] = path
    return path
