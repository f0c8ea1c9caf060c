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

# The derived table maintained here is a grouped (SUM, COUNT)
# aggregate — the shape of every cube in this engine — parameterized
# by group/measure column so any fact table's feed can drive one
# (documents per-language profile is the default and the golden
# test's instance). Output schema: (<group_col>, total long, n long).
# The measure must be INTEGRAL: the incremental fold is exact only
# under exact arithmetic (the engine's standing determinism rule —
# docs/DETERMINISM.md); a double measure (events.value) would need a
# DECIMAL-cast fold to keep replay == one-shot bit-identical.


def profile_from_state(
    df: DataFrame, group_col: str = "lang", sum_col: str = "n_chars"
) -> DataFrame:
    """The one-shot build of the derived table from a base relation —
    the golden test's 'recompute from the final state'."""
    return df.groupBy(group_col).agg(
        F.sum(sum_col).cast("long").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


def _increment(
    changes: DataFrame, group_col: str, sum_col: str
) -> DataFrame:
    """One feed window's change rows folded into signed per-group
    deltas: inserts and update postimages add, deletes and update
    preimages subtract — so an update that moved a row between groups
    (or changed its measure) nets out exactly."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy(group_col).agg(
        F.sum(sign * F.col(sum_col)).cast("long").alias("d_total"),
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


def read_derived(
    spark: SparkSession, table_dir: str, group_col: str = "lang"
) -> DataFrame | None:
    """The derived table's CURRENT version, or None before the first
    bootstrap/apply (the group column's type is whatever the bootstrap
    wrote — no schema is assumed here)."""
    _v, path = _latest_version_dir(table_dir)
    if path is None:
        return None
    return spark.read.parquet(path).select(group_col, "total", "n")


def apply_increment(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    group_col: str = "lang",
    sum_col: str = "n_chars",
) -> str:
    """Merge one feed window's increments into the derived table:
    full-outer join of the stored aggregate with the signed deltas,
    coalesced sums, groups whose count reaches zero DROPPED (matching
    a from-scratch build, where a dead group simply has no row).
    Publishes a new version dir and returns its path."""
    inc = _increment(changes, group_col, sum_col)
    stored = read_derived(spark, table_dir, group_col)
    if stored is None:
        merged = inc.select(
            group_col,
            F.col("d_total").alias("total"),
            F.col("d_n").alias("n"),
        )
    else:
        # eqNullSafe, not a USING join: a NULL group value is one
        # group to groupBy (profile_from_state folds it into one row),
        # so the merge must match it too — a plain full_outer never
        # matches NULL keys and would split the NULL group into
        # duplicate stored/increment rows (round-11 self-review,
        # confirmed by live experiment)
        s, i = stored.alias("s"), inc.alias("i")
        merged = s.join(
            i,
            F.col(f"s.{group_col}").eqNullSafe(F.col(f"i.{group_col}")),
            "full_outer",
        ).select(
            F.coalesce(
                F.col(f"s.{group_col}"), F.col(f"i.{group_col}")
            ).alias(group_col),
            (
                F.coalesce(F.col("s.total"), F.lit(0))
                + F.coalesce(F.col("i.d_total"), F.lit(0))
            ).cast("long").alias("total"),
            (
                F.coalesce(F.col("s.n"), F.lit(0))
                + F.coalesce(F.col("i.d_n"), F.lit(0))
            ).cast("long").alias("n"),
        )
    merged = merged.filter(F.col("n") > 0)
    v, _path = _latest_version_dir(table_dir)
    new_path = os.path.join(table_dir, f"v{v + 1}")
    merged.write.parquet(new_path)
    return new_path


def bootstrap(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    group_col: str = "lang",
    sum_col: str = "n_chars",
) -> str:
    """Seed the derived table from the initial snapshot — the standard
    CDC bootstrap (snapshot once, then tail the feed from the version
    that snapshot saw). Publishes the profile as the first version."""
    v, _path = _latest_version_dir(table_dir)
    new_path = os.path.join(table_dir, f"v{v + 1}")
    profile_from_state(df, group_col, sum_col).write.parquet(new_path)
    return new_path


class CdcConsumer:
    """A change-feed tail maintaining the per-language profile of one
    warehouse table (documents by default) in ``table_dir``.

    ``poll()`` is the micro-batch: read the feed from the last
    consumed version to the current head (the S23b stored deltas make
    this O(|changes since last poll|)), apply the increment, advance
    the watermark. Safe to call when nothing changed (no new commits
    → no read, no write). The DEFAULT start is the current head
    (``from_version=None``): a consumer created over an
    already-mutated warehouse must bootstrap from the CURRENT
    snapshot, and replaying commits that snapshot already contains
    would double-count every group — pass an explicit version only
    when bootstrapping from that version's state
    (replay-from-scratch)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        table_dir: str,
        table: str = "documents",
        from_version: int | None = None,
        group_col: str = "lang",
        sum_col: str = "n_chars",
    ):
        from ..sources.snapshots import _ledger

        self.spark = spark
        self.sf_dir = sf_dir
        self.table_dir = table_dir
        self.table = table
        self.group_col = group_col
        self.sum_col = sum_col
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
            apply_increment(
                self.spark, self.table_dir, changes,
                self.group_col, self.sum_col,
            )
        self.consumed = head
        return n

    def derived(self) -> DataFrame:
        df = read_derived(self.spark, self.table_dir, self.group_col)
        if df is None:
            raise ValueError(
                "the derived table has no version yet — bootstrap() it "
                "from the initial snapshot (or poll() past a commit)"
            )
        return df


# ---------------------------------------------------------------------------
# Driver query: the consumer's maintained table vs DuckDB recomputing
# the FINAL state read-only — "the increments fold to exactly what a
# from-scratch build of the post-mutation corpus says".
# ---------------------------------------------------------------------------

from ..registry import query  # noqa: E402

_CDC_CONSUMER_ORACLE = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total, COUNT(*) AS n
FROM (
  SELECT lang, n_chars FROM documents WHERE doc_id > 40
  UNION ALL SELECT 'en', 7
)
GROUP BY lang ORDER BY lang
"""


@query(
    "r178_cdc_consumer_profile",
    oracle=_CDC_CONSUMER_ORACLE,
    tags=("ST11", "S23", "S19", "A1"),
)
def r178_cdc_consumer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST11 end to end (round 11, r10-VERDICT item 3): a CDC consumer
    bootstraps the per-language profile from the pristine corpus, then
    polls the change feed after each of three commits — an INSERT
    (including a brand-new 'zz' language group), a bulk predicate
    DELETE, and a whole-group DELETE that kills 'zz' again — folding
    each increment into the maintained table. The returned DERIVED
    table (never rebuilt from the base) matches DuckDB recomputing the
    final state read-only: base docs above the deleted id range plus
    the surviving insert."""
    import os

    from ..catalog import TABLES
    from ..engine import Engine
    from ..plans.corpus_routing import current_documents
    from ..sources.retention import _demo_corpus

    demo = _demo_corpus(spark, sf_dir, TABLES, demo="cdc_consumer")
    eng = Engine(spark, demo)
    consumer = CdcConsumer(
        spark, demo, os.path.join(demo, "cdc_derived")
    )
    bootstrap(spark, consumer.table_dir, current_documents(spark, demo))
    for stmt in (
        "INSERT INTO documents VALUES "
        "(900000501, 'sieben7', 'en', 'src97', 7), "
        "(900000502, 'vier', 'zz', 'src97', 4)",
        "DELETE FROM documents WHERE doc_id <= 40",
        "DELETE FROM documents WHERE lang = 'zz'",
    ):
        eng.sql(stmt)
        consumer.poll()
    return consumer.derived().orderBy("lang")
