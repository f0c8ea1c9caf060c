"""Deterministic micro-batch replay of the ``events`` fixture through
REAL Structured Streaming operators (SURVEY.md §2.3 ST4-ST6, §5.2
item 2).

The reference's stream is a Kafka topic of JSON tweets (reference
README.md:48-49, 100-101); no broker exists in tests, so the harness
replays the bounded ``events`` table as a sequence of parquet files in
event-time order — the same micro-batch boundaries every run — and
drives ``readStream`` with watermarks, windowed aggregation, stateful
dedup, and arbitrary state. Results are golden-checked (streaming
semantics have no DuckDB twin).

Kafka wiring at deployment is one-line swaps:
``spark.readStream.format("kafka")…`` for the file source and
``writeStream.format("kafka")`` for the sink — the transformation
graph in between is exactly what runs here.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def stage_microbatches(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_batches: int = 8,
    shuffle_within_batch: bool = True,
) -> list[str]:
    """Split events into n deterministic micro-batch parquet files.

    Batches are event-time-ordered *between* batches but (optionally)
    scrambled *within* a batch by a hash of event_id — so watermark
    tests see genuinely out-of-order data inside each micro-batch,
    deterministically.
    """
    e = table(spark, sf_dir, "events").withColumn(
        "_b", F.ntile(n_batches).over(Window.orderBy("ts", "event_id"))
    )
    pdf = e.toPandas()
    paths = []
    for b in range(1, n_batches + 1):
        part = pdf[pdf["_b"] == b].drop(columns=["_b"])
        if shuffle_within_batch:
            part = part.sort_values(
                by="event_id", key=lambda s: (s * 2654435761) % 97
            )
        path = os.path.join(out_dir, f"batch_{b:03d}.parquet")
        # µs timestamps: pandas defaults to TIMESTAMP(NANOS), which the
        # streaming reader's explicit schema won't coerce.
        part.to_parquet(
            path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        paths.append(path)
    return paths


DOCUMENTS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def stage_document_batches(
    spark: SparkSession, sf_dir: str, out_dir: str, n_batches: int = 4
) -> list[str]:
    """Split documents into n deterministic doc_id-ordered micro-batch
    parquet files (the corpus-as-a-stream replay for stateless text
    operators)."""
    pdf = table(spark, sf_dir, "documents").toPandas().sort_values("doc_id")
    size = (len(pdf) + n_batches - 1) // n_batches
    paths = []
    for b in range(n_batches):
        part = pdf.iloc[b * size : (b + 1) * size]
        path = os.path.join(out_dir, f"docs_{b:03d}.parquet")
        part.to_parquet(path, index=False)
        paths.append(path)
    return paths


def _stage_batch(path: str, src_dir: str) -> None:
    """Place one staged batch file into the WATCHED source dir
    atomically: copy to a dot-prefixed temp name (hidden from Hadoop
    listings) and rename into place. A plain shutil.copy races the
    running query — the file source can list a half-copied parquet
    file mid-trigger and kill the stream."""
    tmp = os.path.join(src_dir, "." + os.path.basename(path) + ".tmp")
    shutil.copy(path, tmp)
    os.rename(tmp, os.path.join(src_dir, os.path.basename(path)))


def _drive_stream(
    spark: SparkSession,
    batch_paths: list[str],
    schema: str,
    attach_sink,
):
    """The shared micro-batch driver scaffold: fresh source +
    checkpoint dirs, one staged file per processAllAvailable (so
    micro-batch boundaries are exactly the staged ones), stop, clean
    up. ``attach_sink(stream_df, ckpt_dir)`` builds and starts the
    query; returns ``attach_sink``'s second return (a finalizer run
    after the stream stops, e.g. reading the sink)."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q, finalize = attach_sink(stream, ckpt)
        try:
            for p in batch_paths:
                _stage_batch(p, src)
                q.processAllAvailable()
        finally:
            q.stop()
        return finalize()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def run_file_stream(
    spark: SparkSession,
    batch_paths: list[str],
    transform,
    output_mode: str = "append",
    schema: str = EVENTS_DDL,
) -> pd.DataFrame:
    """Drive a Structured Streaming query over staged micro-batches.

    ``transform`` maps the streaming DataFrame to its result; output
    accumulates through a memory sink and the final table is returned.
    The sink name is per-call unique — a content-derived name collides
    when two calls drive the same staged batches concurrently."""
    import uuid as _uuid

    sink_name = f"sink_{_uuid.uuid4().hex[:12]}"

    def attach(stream, ckpt):
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .start()
        )
        return q, lambda: spark.table(sink_name).toPandas()

    try:
        return _drive_stream(spark, batch_paths, schema, attach)
    finally:
        # Drop the per-call uuid view on EVERY path — a stream failure
        # mid-run would otherwise retain the materialized sink for the
        # session (dropTempView is a no-op-safe bool, not a raiser).
        spark.catalog.dropTempView(sink_name)


# ---------------------------------------------------------------------------
# ST4: watermarked tumbling aggregation (late data dropped).
# ---------------------------------------------------------------------------


def tumbling_stream(delay: str = "2 hours"):
    """Watermarked 1-hour tumbling counts — the streaming twin of
    batch r72. Windows finalize once the watermark (max event time -
    delay) passes their end; later-arriving rows for a finalized
    window are dropped (ST4)."""

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", delay)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss").alias("w_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    return transform


# ---------------------------------------------------------------------------
# ST5: stateful stream dedup within watermark.
# ---------------------------------------------------------------------------


def dedup_stream(delay: str = "2 hours"):
    """Drop duplicate (user_id, event_type) pairs arriving within the
    watermark horizon (ST5) — the streaming form of exact dedup where
    state for old keys is reclaimed as the watermark advances (bounded
    state at 100 TB/day input)."""

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", delay)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("event_id", "user_id", "event_type")
        )

    return transform


# ---------------------------------------------------------------------------
# ST6: arbitrary stateful operator via applyInPandasWithState —
# running per-user event counter + cumulative value.
# ---------------------------------------------------------------------------

STATE_DDL = "n long, cents long"
OUT_DDL = "user_id long, n long, total double"


def running_totals_stream(delay: str = "2 hours"):
    """Per-user running (count, exact-cents total) maintained as
    explicit state across micro-batches (ST6). State is keyed by
    user_id — partitioned, no global coordination — and emits one
    updated row per user per micro-batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, cents = state.get if state.exists else (0, 0)
        # A key's state can surface as existing-but-null fields; treat
        # null as zero.
        n, cents = n or 0, cents or 0
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
        )

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=OUT_DDL,
                stateStructType=STATE_DDL,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    return transform


# ---------------------------------------------------------------------------
# ST7: stream-static enrichment join (streaming twin of batch r75).
# ---------------------------------------------------------------------------


def enriched_stream(spark: SparkSession, sf_dir: str):
    """Join the event stream against static customer/nation dims —
    broadcast per micro-batch, so the unbounded side never shuffles."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", "c_name", F.col("n_name").alias("nation")
        )
    )

    def transform(stream: DataFrame) -> DataFrame:
        return stream.join(dim, stream.user_id == dim.c_custkey).select(
            "event_id", "event_type", "c_name", "nation"
        )

    return transform


# ---------------------------------------------------------------------------
# ST8: stream-stream interval join (click→purchase attribution).
# ---------------------------------------------------------------------------


def attribution_stream(delay: str = "2 hours"):
    """readStream twin of r76_stream_stream_join: both join sides are
    the same watched file stream (a supported streaming self-join),
    each with its own watermark; the two-sided time bound on ts lets
    Spark expire click state once the purchase-side watermark passes
    click.ts + 1 hour — bounded state on unbounded input (ST8)."""

    def transform(stream: DataFrame) -> DataFrame:
        p = (
            stream.filter(F.col("event_type") == "purchase")
            .withWatermark("ts", delay)
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id"),
                F.col("ts").alias("p_ts"),
            )
        )
        c = (
            stream.filter(F.col("event_type") == "click")
            .withWatermark("ts", delay)
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
        )
        return p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).select(
            "purchase_id",
            "click_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("purchase_ts"),
            F.date_format("c_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("click_ts"),
        )

    return transform


# ---------------------------------------------------------------------------
# ST6 on the Spark-4-native API: transformWithStateInPandas.
# Same semantics as running_totals_stream (per-user count + exact-cents
# total), expressed as a StatefulProcessor — the current-generation
# stateful surface (typed ValueState, RocksDB-backed on a cluster,
# supports state TTL and schema evolution where the legacy
# applyInPandasWithState does not).
# ---------------------------------------------------------------------------


def running_totals_tws_stream():
    """transformWithStateInPandas twin of running_totals_stream."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType()),
                    StructField("cents", LongType()),
                ]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
            n, cents = n or 0, cents or 0
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    def transform(stream: DataFrame) -> DataFrame:
        return stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotals(),
            outputStructType=OUT_DDL,
            outputMode="append",
            timeMode="none",
        )

    return transform


# ---------------------------------------------------------------------------
# ST9 (engine extension): foreachBatch idempotent upsert sink —
# exactly-once table maintenance from an at-least-once stream.
# ---------------------------------------------------------------------------


def foreach_batch_upsert(
    spark: SparkSession, table_dir: str, lineage: str = "default"
):
    """Build the per-micro-batch MERGE function for a streaming
    upsert sink over plain parquet.

    The returned ``apply(batch_df, batch_id)`` implements the standard
    exactly-once foreachBatch recipe:

    1. **Idempotence ledger**: applied batch_ids live in a parquet
       ledger INSIDE each snapshot version; a redelivered batch
       (Structured Streaming guarantees at-least-once to foreachBatch
       after a failure) is detected and skipped, so the merge is
       effectively exactly-once.
    2. **Merge**: per-key aggregates of the batch full-outer-join the
       current snapshot; change-side-wins coalesce plus additive
       fold of the counters (the M1 upsert shape, r82).
    3. **Atomic publish**: each snapshot is a versioned directory
       ``v{batch_id}/`` holding BOTH the data and the
       carried-forward ledger; a ``current`` symlink is swapped with
       one atomic ``os.replace``. Because the ledger row travels
       inside the snapshot, data and idempotence marker publish in
       the SAME atomic step: a crash anywhere before the swap leaves
       the previous snapshot (and its ledger) fully intact, so the
       redelivered batch recomputes the version from scratch; a
       crash after the swap means the ledger already records the
       batch and redelivery is a no-op. There is no window in which
       the data is applied but unrecorded (or vice versa), and
       readers always see a complete snapshot — the earlier
       two-rename design had both gaps (round-3 advisor finding).

    At scale the snapshot would be bucketed on the key so the merge
    join is shuffle-free (tests/test_bucketing.py demonstrates the
    layout); the ledger stays tiny (one row per micro-batch). On a
    real deployment the ``current`` pointer would live in an atomic
    metastore (a Delta/Iceberg commit, a HDFS rename); the local
    symlink stands in for that single atomic pointer swap.

    ``lineage`` scopes the idempotence ledger to ONE streaming
    query's checkpoint lineage: Structured Streaming batch ids
    restart at 0 under a fresh checkpoint, so a ledger keyed on
    batch_id alone would make a SECOND stream over the same table
    silently skip every batch (its ids collide with the first run's).
    Exactly-once holds within a lineage — re-feeding the same source
    data under a NEW lineage is (correctly) applied again, exactly as
    real foreachBatch + a new checkpoint would.
    """
    current = os.path.join(table_dir, "current")
    data_dir = os.path.join(table_dir, "data")  # stable alias -> current/data

    def _migrate_legacy_layout() -> None:
        """A table_dir written by the pre-versioning code has a REAL
        data/ directory and a _ledger/ beside it. Without migration
        the new layout would ignore both (re-applying every batch and
        dropping prior aggregates) and then crash symlinking over the
        real data dir. Move them into v_legacy/ and publish it.

        Crash-safe via an explicit RESUME branch: if a previous
        migration moved the data but crashed before publishing (no
        ``current`` pointer yet, v_legacy/data present), finish the
        ledger move and publish — without this, redelivery would see
        neither layout, re-apply from scratch, and the publish GC
        would delete the orphaned legacy aggregates."""
        snap = os.path.join(table_dir, "v_legacy")
        old_ledger = os.path.join(table_dir, "_ledger")
        if not os.path.islink(current) and os.path.isdir(
            os.path.join(snap, "data")
        ):
            if os.path.isdir(old_ledger):  # resume: finish the move
                os.rename(old_ledger, os.path.join(snap, "_ledger"))
            _publish("v_legacy")
            return
        if os.path.islink(data_dir) or not os.path.isdir(data_dir):
            return
        os.makedirs(snap, exist_ok=True)
        os.rename(data_dir, os.path.join(snap, "data"))
        if os.path.isdir(old_ledger):
            os.rename(old_ledger, os.path.join(snap, "_ledger"))
        _publish("v_legacy")

    def _ledger_rows() -> list[tuple[int, str]]:
        ledger = os.path.join(current, "_ledger")
        if not os.path.isdir(ledger):
            return []
        pdf = spark.read.parquet(ledger).toPandas()
        if "lineage" in pdf.columns:
            return [(int(b), str(ln)) for b, ln in zip(pdf["batch_id"], pdf["lineage"])]
        # Pre-lineage ledgers: tag rows with the LITERAL default
        # lineage, not the caller's — tagging them with a fresh uuid
        # lineage would make a new stream over a legacy table skip
        # every colliding batch id (the bug lineage scoping fixes).
        # A resumed legacy caller uses lineage="default" and still
        # sees them as applied.
        return [(int(b), "default") for b in pdf["batch_id"]]

    def _publish(version_name: str) -> None:
        os.makedirs(table_dir, exist_ok=True)
        tmp = os.path.join(table_dir, f".current_tmp_{version_name}")
        if os.path.islink(tmp) or os.path.isfile(tmp):
            os.remove(tmp)
        os.symlink(version_name, tmp)
        os.replace(tmp, current)  # THE atomic publish step
        if not os.path.islink(data_dir):
            os.symlink(os.path.join("current", "data"), data_dir)
        # GC superseded versions (readers of the published snapshot
        # are unaffected; only pre-swap versions are removed). A
        # production deployment would retain the last N versions
        # instead: a reader that resolved ``current`` just before the
        # swap may still be scanning the prior version's files.
        for name in os.listdir(table_dir):
            if (
                name.startswith("v")
                and name != version_name
                and os.path.isdir(os.path.join(table_dir, name))
                and not os.path.islink(os.path.join(table_dir, name))
            ):
                shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_layout()
        rows = _ledger_rows()  # one read per batch; reused for the rewrite
        if any(b == int(batch_id) and ln == lineage for b, ln in rows):
            return
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        if os.path.isdir(os.path.join(current, "data")):
            base = spark.read.parquet(os.path.join(current, "data"))
            d = delta.select(
                F.col("user_id").alias("k"),
                F.col("n_events").alias("d_n"),
                F.col("cents").alias("d_c"),
                F.col("last_ts").alias("d_ts"),
            )
            merged = (
                base.join(d, base.user_id == d.k, "full_outer")
                .select(
                    F.coalesce("user_id", "k").alias("user_id"),
                    (
                        F.coalesce("n_events", F.lit(0))
                        + F.coalesce("d_n", F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce("cents", F.lit(0)) + F.coalesce("d_c", F.lit(0))
                    ).alias("cents"),
                    F.greatest(
                        F.coalesce("last_ts", "d_ts"), F.coalesce("d_ts", "last_ts")
                    ).alias("last_ts"),
                )
            )
        else:
            merged = delta
        # Version names carry the lineage so two sequential lineages
        # never overwrite each other's snapshot dirs. True CONCURRENT
        # writers on one table still need external coordination (a
        # commit service / table-format lock): the publish swap is
        # atomic, but last-swap-wins and the GC below assume a single
        # active writer — same contract as any lockless parquet lake.
        lineage_tag = re.sub(r"[^A-Za-z0-9_.-]", "_", lineage)
        version_name = f"v_{lineage_tag}_{batch_id}"
        snap = os.path.join(table_dir, version_name)
        # Data first, then the carried-forward ledger (ALL lineages'
        # rows, plus this batch) — both land inside the unpublished
        # version directory.
        merged.write.mode("overwrite").parquet(os.path.join(snap, "data"))
        ledger_rows = sorted(set(rows) | {(int(batch_id), lineage)})
        spark.createDataFrame(
            ledger_rows, "batch_id long, lineage string"
        ).write.mode("overwrite").parquet(os.path.join(snap, "_ledger"))
        _publish(version_name)

    return apply


def run_foreach_batch_stream(
    spark: SparkSession, batch_paths: list[str], table_dir: str
) -> pd.DataFrame:
    """Drive the events micro-batches through a foreachBatch upsert
    sink and return the final snapshot (sorted by user_id)."""

    import uuid as _uuid

    lineage = f"run_{_uuid.uuid4().hex[:12]}"

    def attach(stream, ckpt):
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_upsert(spark, table_dir, lineage=lineage)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        return q, lambda: (
            spark.read.parquet(os.path.join(table_dir, "data"))
            .orderBy("user_id")
            .toPandas()
        )

    return _drive_stream(spark, batch_paths, EVENTS_DDL, attach)


# ---------------------------------------------------------------------------
# ST10 (engine extension): the continuous corpus-ingest loop —
# gate → fingerprint → dedup against the stored index → append —
# as ONE foreachBatch stream over replayed document micro-batches.
# ---------------------------------------------------------------------------


def corpus_ingest_batch_fn(spark: SparkSession, lake_dir: str):
    """Per-micro-batch body of the corpus builder:

    1. quality gate (map-only, operators.quality.gate_filter);
    2. prefix fingerprint (the r119 incremental-dedup key);
    3. within-batch first-occurrence + anti-join against the stored
       fingerprint index (never re-fingerprints the lake);
    4. append survivors to the corpus, their fingerprints to the index.

    This is the production corpus-building loop: each increment costs
    one map pass over the batch plus one fingerprint-keyed join
    against a slim index table.
    """
    from pyspark.sql.window import Window as W

    from ..operators.dedup import _INCR_PREFIX
    from ..operators.quality import gate_filter
    from ..operators.text import tokens

    corpus_dir = os.path.join(lake_dir, "corpus")
    index_dir = os.path.join(lake_dir, "fingerprints")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        gated = gate_filter(batch_df)
        fp = gated.select(
            "doc_id",
            "text",
            F.md5(
                F.concat_ws(" ", F.slice(tokens("text"), 1, _INCR_PREFIX))
            ).alias("fingerprint"),
        )
        w = W.partitionBy("fingerprint").orderBy("doc_id")
        firsts = fp.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        if os.path.isdir(index_dir):
            idx = spark.read.parquet(index_dir)
            firsts = firsts.join(idx, "fingerprint", "left_anti")
        # Materialize ONCE before the two appends: without the
        # checkpoint the survivors plan would execute twice (gate +
        # fingerprint + anti-join re-run), and the second execution
        # would read index_dir while appending to it (round-3 advisor
        # finding). NOTE a crash between the two appends still leaves
        # corpus and index inconsistent for one batch (a redelivery
        # would re-append those documents); production would write
        # both under a single atomic commit (Delta/Iceberg txn, or the
        # versioned-snapshot publish used by foreach_batch_upsert).
        survivors = firsts.select(
            "doc_id", "text", "fingerprint"
        ).localCheckpoint()  # one-shot dual-read inside a micro-batch
        survivors.write.mode("append").parquet(corpus_dir)
        survivors.select("fingerprint").write.mode("append").parquet(index_dir)

    return apply


def run_corpus_ingest_stream(
    spark: SparkSession, batch_paths: list[str], lake_dir: str
) -> pd.DataFrame:
    """Drive document micro-batches through the corpus-ingest loop;
    returns the final corpus (doc_id-sorted)."""

    def attach(stream, ckpt):
        q = (
            stream.writeStream.foreachBatch(corpus_ingest_batch_fn(spark, lake_dir))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        return q, lambda: (
            spark.read.parquet(os.path.join(lake_dir, "corpus"))
            .orderBy("doc_id")
            .toPandas()
        )

    return _drive_stream(spark, batch_paths, DOCUMENTS_DDL, attach)
