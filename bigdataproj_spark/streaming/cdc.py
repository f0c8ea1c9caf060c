"""ST11 (round 11, r10-VERDICT item 3): streaming consumption of the
change data feed — the standard CDC → derived-table pattern.

S23 gave the warehouse a batch read verb (``table_changes``); this
module is its CONSUMER side: a micro-batch tail that reads each new
commit's change rows and incrementally maintains a downstream derived
table from the INCREMENTS alone — never rescanning the base table.
This is the shape every changelog consumer takes (Delta CDF → silver
aggregate, Debezium → materialized view): the derived table's owner
polls the feed, folds ``insert``/``delete``/``update_*`` rows into
signed deltas, and merges them into the stored aggregate.

Composition with S23b: each poll reads the commits' STORED deltas
(O(|changes|) — sources/snapshots.py stage_changes), so a consumer
polling after every batch pays change-sized work per poll, exactly the
posture a 100 TB deployment needs. The consumer itself is exactly-once
by construction: it tracks the last consumed version and the feed's
``(v1, v2]`` window semantics make re-polls disjoint; re-consuming
after a crash restarts from the recorded watermark version.

The golden contract (tests/test_streaming.py): k-batch CDC replay ==
one-shot recompute from the final state, through inserts, deletes,
updates, and a MERGE's mixed commit — and a consumer that skipped
polls (catching up over several commits at once) lands on the same
table.

Scale posture: one change-sized groupBy per poll (the increment
aggregate), one derived-table-sized merge join per poll (the derived
table is a grouped aggregate — scale-invariant small, like the
engine's cubes). The no-in-place-writes contract applies: each apply
publishes a NEW version directory and swings the consumer's pointer,
so a reader planned against the previous version never loses files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the derived table maintained here: the per-language corpus profile
# (the docs cube's own shape — chosen so the golden test can compare
# against a one-shot recompute with no modeling gap)
_PROFILE_COLS = ("lang", "total_chars", "n")


def profile_from_state(docs: DataFrame) -> DataFrame:
    """The one-shot build of the derived table from a documents
    relation — the golden test's 'recompute from the final state'."""
    return docs.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count(F.lit(1)).alias("n"),
    )


def _increment(changes: DataFrame) -> DataFrame:
    """One feed window's change rows folded into signed per-language
    deltas: inserts and update postimages add, deletes and update
    preimages subtract — so an update that moved a doc between
    languages (or changed its length) nets out exactly."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy("lang").agg(
        F.sum(sign * F.col("n_chars")).cast("long").alias("d_chars"),
        F.sum(sign).cast("long").alias("d_n"),
    )


def _latest_version_dir(table_dir: str) -> tuple[int, str | None]:
    if not os.path.isdir(table_dir):
        return 0, None
    best = 0
    for entry in os.listdir(table_dir):
        if entry.startswith("v") and entry[1:].isdigit():
            best = max(best, int(entry[1:]))
    return best, (os.path.join(table_dir, f"v{best}") if best else None)


def read_derived(spark: SparkSession, table_dir: str) -> DataFrame:
    """The derived table's CURRENT version (empty before the first
    apply)."""
    _v, path = _latest_version_dir(table_dir)
    if path is None:
        return spark.createDataFrame(
            [], "lang string, total_chars long, n long"
        )
    return spark.read.parquet(path).select(*_PROFILE_COLS)


def apply_increment(
    spark: SparkSession, table_dir: str, changes: DataFrame
) -> str:
    """Merge one feed window's increments into the derived table:
    full-outer join of the stored aggregate with the signed deltas,
    coalesced sums, groups whose count reaches zero DROPPED (matching
    a from-scratch build, where a dead group simply has no row).
    Publishes a new version dir and returns its path."""
    inc = _increment(changes)
    stored = read_derived(spark, table_dir)
    merged = (
        stored.join(inc, "lang", "full_outer")
        .select(
            "lang",
            (
                F.coalesce(F.col("total_chars"), F.lit(0))
                + F.coalesce(F.col("d_chars"), F.lit(0))
            ).cast("long").alias("total_chars"),
            (
                F.coalesce(F.col("n"), F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    v, _path = _latest_version_dir(table_dir)
    new_path = os.path.join(table_dir, f"v{v + 1}")
    merged.write.parquet(new_path)
    return new_path


def bootstrap(spark: SparkSession, table_dir: str, docs: DataFrame) -> str:
    """Seed the derived table from the initial snapshot — the standard
    CDC bootstrap (snapshot once, then tail the feed from the version
    that snapshot saw). Publishes the profile as the first version."""
    v, _path = _latest_version_dir(table_dir)
    new_path = os.path.join(table_dir, f"v{v + 1}")
    profile_from_state(docs).select(*_PROFILE_COLS).write.parquet(new_path)
    return new_path


class CdcConsumer:
    """A change-feed tail maintaining the per-language profile of one
    warehouse table (documents by default) in ``table_dir``.

    ``poll()`` is the micro-batch: read the feed from the last
    consumed version to the current head (the S23b stored deltas make
    this O(|changes since last poll|)), apply the increment, advance
    the watermark. Safe to call when nothing changed (no new commits
    → no read, no write). A consumer created over an already-mutated
    warehouse starts at the CURRENT head by default (from_version=None)
    — maintaining history it never saw is the one-shot build's job —
    or at an explicit version for replay-from-scratch."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        table_dir: str,
        table: str = "documents",
        from_version: int | None = 0,
    ):
        from ..sources.snapshots import _ledger

        self.spark = spark
        self.sf_dir = sf_dir
        self.table_dir = table_dir
        self.table = table
        if from_version is None:
            led = _ledger(spark, sf_dir)
            from_version = led[-1]["version"] if led else 0
        self.consumed = from_version

    def _head(self) -> int | None:
        from ..sources.snapshots import _ledger

        led = _ledger(self.spark, self.sf_dir)
        return led[-1]["version"] if led else None

    def poll(self) -> int:
        """Consume every commit since the last poll; returns how many
        feed rows were applied (0 when already caught up)."""
        from ..sources.snapshots import table_changes

        head = self._head()
        if head is None or head <= self.consumed:
            return 0
        changes = table_changes(
            self.spark, self.sf_dir, self.table, self.consumed, head
        ).localCheckpoint(eager=True)
        n = changes.count()
        if n:
            apply_increment(self.spark, self.table_dir, changes)
        self.consumed = head
        return n

    def derived(self) -> DataFrame:
        return read_derived(self.spark, self.table_dir)
