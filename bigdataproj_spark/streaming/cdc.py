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
posture a 100 TB deployment needs. The consumer is exactly-once
end to end (round 12, r11-ADVICE item 1): each publish is
staged-then-swing — the new version parquet AND the consumed
watermark version are written to a temp dir and ``os.rename``d into
place as ONE atomic commit point (the engine's no-in-place-writes
contract, sources/txn.py) — so a crash anywhere leaves either the old
version (old watermark) or the new version (new watermark), never a
partial dir and never an applied-but-unrecorded poll. A reconstructed
consumer with the default ``from_version=None`` resumes from the
RECORDED watermark, and the feed's ``(v1, v2]`` window semantics make
the resumed poll disjoint from everything already folded in.

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
    """Highest published ``v{n}`` dir. A ``v{n}`` dir is COMPLETE by
    construction: :func:`_publish` writes to ``_tmp_v{n}`` (which this
    scan never matches) and renames into place atomically, so a crash
    mid-write can only ever leave tmp leftovers, never a partial
    serveable version (round 12, r11-ADVICE item 3)."""
    if not os.path.isdir(table_dir):
        return 0, None
    best = 0
    for entry in os.listdir(table_dir):
        if entry.startswith("v") and entry[1:].isdigit():
            best = max(best, int(entry[1:]))
    return best, (os.path.join(table_dir, f"v{best}") if best else None)


_WATERMARK_FILE = "_consumed_version"


def _publish(
    df: DataFrame, table_dir: str, consumed: int | None = None
) -> str:
    """Atomically publish ``df`` as the derived table's next version:
    write parquet (plus the consumed-watermark sidecar) into
    ``_tmp_v{n}``, then ``os.rename`` to ``v{n}`` — the rename is the
    single commit point, covering data and watermark together. A
    leftover tmp dir from a crashed earlier attempt is removed first,
    so a retried poll never fails on 'path already exists'."""
    import shutil

    v, _path = _latest_version_dir(table_dir)
    tmp = os.path.join(table_dir, f"_tmp_v{v + 1}")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    df.write.parquet(tmp)
    if consumed is not None:
        with open(os.path.join(tmp, _WATERMARK_FILE), "w") as fh:
            fh.write(str(consumed))
    new_path = os.path.join(table_dir, f"v{v + 1}")
    os.rename(tmp, new_path)
    return new_path


def recorded_watermark(table_dir: str) -> int | None:
    """The ledger version the CURRENT derived version has consumed
    through (the sidecar the atomic publish carries), or None when no
    version exists yet / the version predates watermark recording."""
    _v, path = _latest_version_dir(table_dir)
    if path is None:
        return None
    try:
        with open(os.path.join(path, _WATERMARK_FILE)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


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
    consumed: int | None = None,
) -> str:
    """Merge one feed window's increments into the derived table:
    full-outer join of the stored aggregate with the signed deltas,
    coalesced sums, groups whose count reaches zero DROPPED (matching
    a from-scratch build, where a dead group simply has no row).
    Atomically publishes a new version dir (with ``consumed`` as its
    watermark sidecar when given) and returns its path."""
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
    return _publish(merged, table_dir, consumed)


def bootstrap(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    group_col: str = "lang",
    sum_col: str = "n_chars",
    consumed: int | None = None,
) -> str:
    """Seed the derived table from the initial snapshot — the standard
    CDC bootstrap (snapshot once, then tail the feed from the version
    that snapshot saw). Atomically publishes the profile as the first
    version, with ``consumed`` (the ledger version the snapshot
    reflects) as its watermark sidecar when given."""
    return _publish(
        profile_from_state(df, group_col, sum_col), table_dir, consumed
    )


class CdcConsumer:
    """A change-feed tail maintaining the per-language profile of one
    warehouse table (documents by default) in ``table_dir``.

    ``poll()`` is the micro-batch: read the feed from the last
    consumed version to the current head (the S23b stored deltas make
    this O(|changes since last poll|)), apply the increment, advance
    the watermark. Safe to call when nothing changed (no new commits
    → no read, no write). The DEFAULT start (``from_version=None``)
    resolves in order (round 12, r11-ADVICE item 1): (a) the derived
    table's RECORDED watermark when one exists — a reconstructed
    consumer resumes exactly where the last atomic publish left off,
    commits in between are replayed by the first poll, never skipped;
    (b) refuse when version dirs exist WITHOUT a watermark (a
    pre-watermark table — nothing records what it has folded in, so
    resuming at any guessed version could double- or under-count);
    (c) the current ledger head for a FRESH table — the consumer must
    bootstrap from the CURRENT snapshot, and replaying commits that
    snapshot already contains would double-count every group. Pass an
    explicit version only when bootstrapping from that version's
    state (replay-from-scratch)."""

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
            from_version = recorded_watermark(table_dir)
        if from_version is None:
            if _latest_version_dir(table_dir)[1] is not None:
                raise ValueError(
                    f"derived table {table_dir!r} has versions but no "
                    "recorded watermark (it predates watermark "
                    "sidecars) — nothing records which commits it has "
                    "folded in, so a default resume could double- or "
                    "under-count; pass from_version explicitly or "
                    "re-bootstrap into a fresh table_dir"
                )
            led = _ledger(spark, sf_dir)
            from_version = led[-1]["version"] if led else 0
        self.consumed = from_version

    def _head(self) -> int | None:
        from ..sources.snapshots import _ledger

        led = _ledger(self.spark, self.sf_dir)
        return led[-1]["version"] if led else None

    def bootstrap(self, df: DataFrame | None = None) -> str:
        """Seed the derived table from the CURRENT snapshot (or an
        explicit ``df`` of it) and record this consumer's watermark in
        the published version — the resume point a reconstructed
        consumer picks up."""
        if df is None:
            from ..plans.corpus_routing import current_corpus_table

            df = current_corpus_table(self.spark, self.sf_dir, self.table)
        return bootstrap(
            self.spark, self.table_dir, df,
            self.group_col, self.sum_col, consumed=self.consumed,
        )

    def poll(self) -> int:
        """Consume every commit since the last poll; returns how many
        feed rows were applied (0 when already caught up). The
        increment's publish atomically records ``head`` as the new
        watermark, so a crash between poll and the next never loses or
        double-applies a commit on resume."""
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
                self.group_col, self.sum_col, consumed=head,
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
    consumer.bootstrap(current_documents(spark, demo))
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
