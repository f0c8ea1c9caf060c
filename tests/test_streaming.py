"""Golden replay tests for the real Structured Streaming operators
(SURVEY.md §5.2 item 2: ST4-ST7 have no DuckDB twin — semantics are
asserted against batch twins and invariants instead).

Runs at sf0.001 (events ≈1k rows) for speed; the replay harness stages
8 deterministic micro-batches, so every run sees the same batch
boundaries and the same late-data pattern.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from bigdataproj_spark.catalog import table
from bigdataproj_spark.streaming import replay


@pytest.fixture(scope="module")
def batches(spark, sf_dir):
    with tempfile.TemporaryDirectory(prefix="stage_") as d:
        yield replay.stage_microbatches(spark, sf_dir, d, n_batches=8)


def test_tumbling_watermark_matches_batch(spark, sf_dir, batches):
    """ST4: with in-order batches (late data only *within* each
    micro-batch, far under the 2h watermark), the streamed windowed
    counts must equal the batch twin exactly."""
    got = replay.run_file_stream(
        spark, batches, replay.tumbling_stream("2 hours"), output_mode="append"
    )
    e = table(spark, sf_dir, "events")
    want = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss").alias("w_start"),
            "event_type",
            "n_events",
        )
        .toPandas()
    )
    # Append mode only emits windows finalized by the watermark; the
    # last windows (within 2h+1h of max ts) are still open when the
    # stream ends. Every emitted window must match batch exactly.
    got_idx = got.set_index(["w_start", "event_type"])["n_events"].sort_index()
    want_idx = want.set_index(["w_start", "event_type"])["n_events"].sort_index()
    assert len(got_idx) > 0
    joined = got_idx.to_frame("got").join(want_idx.to_frame("want"))
    assert (joined["got"] == joined["want"]).all(), joined[
        joined["got"] != joined["want"]
    ]
    # and the stream must have finalized (nearly) all windows
    assert len(got_idx) >= len(want_idx) * 0.8


def test_watermark_drops_late_rows(spark, sf_dir, batches):
    """ST4 negative: replaying the batches with one very-late batch
    (the chronologically-first batch delivered LAST) under a short
    watermark must drop those rows from finalized windows."""
    reordered = batches[1:] + batches[:1]
    got = replay.run_file_stream(
        spark, reordered, replay.tumbling_stream("30 minutes"), output_mode="append"
    )
    e = table(spark, sf_dir, "events")
    full = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss").alias("w_start"), "n")
        .toPandas()
        .set_index("w_start")["n"]
    )
    got_by_w = got.groupby("w_start")["n_events"].sum()
    # The earliest windows were finalized before their data arrived →
    # either absent from the stream output or undercounted.
    first_w = full.index.min()
    assert first_w not in got_by_w.index or got_by_w[first_w] < full[first_w]


def test_stream_dedup_within_watermark(spark, sf_dir, batches):
    """ST5: dropDuplicatesWithinWatermark keeps at most one row per
    (user_id, event_type) key within the watermark horizon, and never
    fewer keys than the batch distinct."""
    got = replay.run_file_stream(
        spark, batches, replay.dedup_stream("2 hours"), output_mode="append"
    )
    e = table(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    n_rows = e.count()
    # All distinct keys survive; total kept rows in [n_keys, n_rows).
    assert got[["user_id", "event_type"]].drop_duplicates().shape[0] == n_keys
    assert n_keys <= len(got) < n_rows
    # Within any 1-hour span no duplicate key should appear twice
    # (fixture spans 30 days ≫ watermark, duplicates in one batch are
    # always deduped): spot-check global per-key multiplicity is small.
    per_key = got.groupby(["user_id", "event_type"]).size()
    assert per_key.max() <= len(batches)


def test_stateful_running_totals(spark, sf_dir, batches):
    """ST6: applyInPandasWithState running totals — the LAST emitted
    row per user must equal the batch count/sum exactly (exact-cents
    arithmetic, so equality is bitwise)."""
    got = replay.run_file_stream(
        spark, batches, replay.running_totals_stream("2 hours"), output_mode="append"
    )
    last = got.groupby("user_id").last()
    e = table(spark, sf_dir, "events")
    want = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("total"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (last["n"].sort_index() == want["n"]).all()
    pd.testing.assert_series_equal(
        last["total"].sort_index(), want["total"], check_names=False
    )


def test_stream_static_join(spark, sf_dir, batches):
    """ST7: per-micro-batch stream-static enrichment equals the batch
    join row-for-row."""
    got = replay.run_file_stream(
        spark, batches, replay.enriched_stream(spark, sf_dir), output_mode="append"
    )
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    want = (
        e.join(c, e.user_id == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("event_id", "event_type", "c_name", F.col("n_name").alias("nation"))
        .toPandas()
    )
    got_s = got.sort_values("event_id").reset_index(drop=True)
    want_s = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_session_window_stream_matches_batch(spark, sf_dir, batches):
    """ST3 streamed: watermarked session windows replayed through the
    real streaming path must equal the batch twin for every finalized
    session (sessions still open at stream end are absent from append
    output)."""
    from pyspark.sql import functions as F

    def transform(stream):
        return (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss").alias("s_start"),
                "n_events",
            )
        )

    got = replay.run_file_stream(spark, batches, transform, output_mode="append")
    e = table(spark, sf_dir, "events")
    want = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss").alias("s_start"),
            "n_events",
        )
        .toPandas()
    )
    got_idx = got.set_index(["user_id", "s_start"])["n_events"].sort_index()
    want_idx = want.set_index(["user_id", "s_start"])["n_events"].sort_index()
    assert len(got_idx) > 0
    joined = got_idx.to_frame("got").join(want_idx.to_frame("want"))
    assert (joined["got"] == joined["want"]).all(), joined[
        joined["got"] != joined["want"]
    ]
    # nearly all sessions finalize (30-day fixture ≫ 2h watermark)
    assert len(got_idx) >= len(want_idx) * 0.9


def test_stream_stream_join_matches_batch(spark, sf_dir, batches):
    """ST8: the streamed attribution self-join (watermarks both sides,
    two-sided time bound) must emit exactly the batch twin's pairs —
    inner stream-stream joins emit matches as they arrive, and with
    in-order batches no pair falls past the watermark."""
    from bigdataproj_spark.registry import load_all

    got = replay.run_file_stream(
        spark, batches, replay.attribution_stream("2 hours"), output_mode="append"
    )
    want = load_all()["r76_stream_stream_join"].build(spark, sf_dir).toPandas()
    assert len(want) > 0, "fixture should contain click->purchase pairs"
    key = ["purchase_id", "click_id"]
    got_s = got.sort_values(key).reset_index(drop=True)[want.columns]
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_checkpoint_recovery_exactly_once(spark, sf_dir, batches):
    """Kill the stream mid-corpus and restart from the same checkpoint:
    the union of outputs across the two runs must contain every
    finalized window exactly once (offsets + state recover; nothing is
    re-emitted, nothing is lost) and equal a single uninterrupted run."""
    import os
    import shutil

    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_ckpt_")
    transform = replay.tumbling_stream("2 hours")
    emitted = []

    def sink(batch_df, batch_id):
        emitted.append(batch_df.toPandas())

    def run_phase(paths):
        stream = (
            spark.readStream.schema(replay.EVENTS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            transform(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            for p in paths:
                shutil.copy(p, src)
                q.processAllAvailable()
        finally:
            q.stop()

    try:
        run_phase(batches[:4])   # crash point: stop after 4 of 8 batches
        run_phase(batches[4:])   # restart from the same checkpoint
        got = pd.concat([e for e in emitted if len(e)], ignore_index=True)
        # exactly-once: every finalized (window, type) key appears once
        keys = got[["w_start", "event_type"]]
        assert not keys.duplicated().any(), got[keys.duplicated(keep=False)]
        # completeness: equals one uninterrupted run over all batches
        want = replay.run_file_stream(
            spark, batches, transform, output_mode="append"
        )
        got_s = got.sort_values(["w_start", "event_type"]).reset_index(drop=True)
        want_s = want.sort_values(["w_start", "event_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got_s[want.columns], want_s, check_dtype=False)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas' Python worker needs google.protobuf, "
    "not present in this container (no network installs); the operator is "
    "implemented in replay.running_totals_tws_stream and this test runs "
    "wherever protobuf exists. Vendoring was attempted and rejected: the "
    "only on-disk pure-Python protobuf is 4.23.2 namespaced under a bundled "
    "SDK's third_party tree, while pyspark's StateMessage_pb2 is "
    "protobuf-6.33 gencode whose runtime_version.ValidateProtobufRuntimeVersion "
    "requires a >=6.33 runtime (the module does not even exist in 4.x) — "
    "stubbing the validation to force the old runtime under a sys.modules "
    "shim would fake-verify a state-serialization path, worse than skipping",
)
def test_stateful_running_totals_tws(spark, sf_dir, batches):
    """ST6 on the Spark-4-native transformWithStateInPandas API: same
    contract as the applyInPandasWithState test — the last emitted row
    per user equals the batch count/sum bitwise."""
    # transformWithState requires the RocksDB state store provider.
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = replay.run_file_stream(
            spark, batches, replay.running_totals_tws_stream(), output_mode="append"
        )
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    last = got.groupby("user_id").last()
    e = table(spark, sf_dir, "events")
    want = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("total"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (last["n"].sort_index() == want["n"]).all()
    pd.testing.assert_series_equal(
        last["total"].sort_index(), want["total"], check_names=False
    )


def test_quality_gate_streams_unchanged(spark, sf_dir, tmp_path):
    """The corpus quality gate (a pure map transformation) must run
    VERBATIM as a Structured Streaming query: replaying the documents
    table in micro-batches through quality_flags() yields exactly the
    batch result — the composability claim of the map-only operators
    (any stateless cleaning/gate/scrub stage streams for free)."""
    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.quality import quality_flags
    from bigdataproj_spark.streaming.replay import (
        DOCUMENTS_DDL,
        run_file_stream,
        stage_document_batches,
    )

    batch = (
        quality_flags(table(spark, sf_dir, "documents"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    paths = stage_document_batches(spark, sf_dir, str(tmp_path), n_batches=4)
    streamed = (
        run_file_stream(spark, paths, quality_flags, schema=DOCUMENTS_DDL)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert batch.equals(streamed)


def test_foreach_batch_upsert_exactly_once(spark, sf_dir, tmp_path):
    """ST9: the foreachBatch upsert sink over 4 replayed micro-batches
    must converge to the same per-user aggregate a single batch pass
    computes — and re-delivering an already-applied batch (the
    at-least-once failure mode foreachBatch must tolerate) must leave
    the snapshot byte-identical (the ledger makes the merge
    exactly-once)."""
    from bigdataproj_spark.catalog import table as load_table
    from bigdataproj_spark.streaming.replay import (
        foreach_batch_upsert,
        run_foreach_batch_stream,
        stage_microbatches,
    )

    stage_dir = str(tmp_path / "batches")
    os.makedirs(stage_dir, exist_ok=True)
    paths = stage_microbatches(spark, sf_dir, stage_dir, n_batches=4)
    table_dir = str(tmp_path / "upsert_table")

    snap = run_foreach_batch_stream(spark, paths, table_dir)

    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    assert snap.reset_index(drop=True).equals(expected.reset_index(drop=True))

    # Redeliver batch 0 WITHIN the run's checkpoint lineage (read the
    # lineage token back from the published ledger): must be a no-op.
    ledger = spark.read.parquet(os.path.join(table_dir, "current", "_ledger"))
    lineage = ledger.select("lineage").first()["lineage"]
    apply = foreach_batch_upsert(spark, table_dir, lineage=lineage)
    replay_df = spark.read.schema(replay.EVENTS_DDL).parquet(paths[0])
    apply(replay_df, 0)
    snap2 = (
        spark.read.parquet(os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )
    assert snap2.reset_index(drop=True).equals(snap.reset_index(drop=True))

    # A NEW lineage (fresh checkpoint) re-feeding batch id 0 with NEW
    # data must APPLY — batch ids restart per checkpoint, so a ledger
    # keyed on batch_id alone would silently drop every batch of a
    # second stream over the same table (round-4 review finding).
    apply2 = foreach_batch_upsert(spark, table_dir, lineage="second-run")
    apply2(replay_df, 0)
    snap3 = (
        spark.read.parquet(os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )
    assert snap3["n_events"].sum() == snap["n_events"].sum() + replay_df.count()


def test_dsir_batch_train_stream_score(spark, sf_dir, tmp_path):
    """The DSIR deployment split: lambda trains in batch (bounded
    model, collected like the IVF centroids), scoring is a map-only
    plan-literal expression — so (a) the map-only score equals the
    explode-aggregate score of the registry query for every document,
    and (b) the identical transform streams verbatim over replayed
    micro-batches."""
    from bigdataproj_spark.operators.mixing import (
        dsir_lambda_rows,
        dsir_scorer,
        r53_dsir_resample,
    )
    from bigdataproj_spark.catalog import table as load_table
    from bigdataproj_spark.streaming.replay import (
        DOCUMENTS_DDL,
        run_file_stream,
        stage_document_batches,
    )

    model = dsir_lambda_rows(spark, sf_dir)
    score = dsir_scorer(model)

    batch = (
        score(load_table(spark, sf_dir, "documents"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # (a) agreement with the registry query's aggregate-path log-ratio
    # on the resampled subset it returns.
    top = r53_dsir_resample(spark, sf_dir).toPandas()
    merged = top.merge(batch, on="doc_id", suffixes=("_agg", "_map"))
    assert len(merged) == len(top)
    assert (merged["log_ratio_agg"] == merged["log_ratio_map"]).all()

    # (b) the same transform streams verbatim.
    paths = stage_document_batches(spark, sf_dir, str(tmp_path), n_batches=4)
    streamed = (
        run_file_stream(spark, paths, score, schema=DOCUMENTS_DDL)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert batch.equals(streamed)


def test_corpus_ingest_stream_equals_batch_build(spark, sf_dir, tmp_path):
    """ST10: streaming the documents table through the full ingest
    loop (gate -> fingerprint -> dedup-vs-index -> append) over 4
    micro-batches must produce exactly the corpus a one-shot batch
    build produces: gate survivors, first doc_id per fingerprint."""
    from pyspark.sql.window import Window as W

    from bigdataproj_spark.catalog import table as load_table
    from bigdataproj_spark.operators.dedup import _INCR_PREFIX
    from bigdataproj_spark.operators.quality import gate_filter
    from bigdataproj_spark.operators.text import tokens as toks_fn
    from bigdataproj_spark.streaming.replay import (
        run_corpus_ingest_stream,
        stage_document_batches,
    )

    bdir = tmp_path / "b"
    bdir.mkdir()
    paths = stage_document_batches(spark, sf_dir, str(bdir), n_batches=4)
    streamed = run_corpus_ingest_stream(
        spark, paths, str(tmp_path / "lake")
    ).reset_index(drop=True)

    gated = gate_filter(load_table(spark, sf_dir, "documents"))
    fp = gated.select(
        "doc_id",
        "text",
        F.md5(F.concat_ws(" ", F.slice(toks_fn("text"), 1, _INCR_PREFIX))).alias(
            "fingerprint"
        ),
    )
    w = W.partitionBy("fingerprint").orderBy("doc_id")
    batch = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "fingerprint")
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(streamed) > 0
    assert streamed.equals(batch)


def test_foreach_batch_upsert_migrates_legacy_layout(spark, sf_dir, tmp_path):
    """A table_dir written by the pre-versioning flat layout (real
    data/ dir + _ledger/ beside it) must be migrated, not clobbered:
    prior aggregates carry into the next merge and already-applied
    batch ids stay idempotent."""
    from bigdataproj_spark.catalog import table as load_table
    from bigdataproj_spark.streaming.replay import (
        EVENTS_DDL,
        foreach_batch_upsert,
        stage_microbatches,
    )

    stage_dir = tmp_path / "batches"
    stage_dir.mkdir()
    paths = stage_microbatches(spark, sf_dir, str(stage_dir), n_batches=2)
    table_dir = str(tmp_path / "legacy_table")

    # Build the LEGACY layout by hand from batch 0.
    b0 = spark.read.schema(EVENTS_DDL).parquet(paths[0])
    legacy = b0.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        F.max("ts").alias("last_ts"),
    )
    legacy.write.parquet(os.path.join(table_dir, "data"))
    spark.createDataFrame([(0,)], "batch_id long").write.parquet(
        os.path.join(table_dir, "_ledger")
    )

    apply = foreach_batch_upsert(spark, table_dir)
    # Redelivery of batch 0 must be a no-op (legacy ledger honored)...
    apply(b0, 0)
    # ...and batch 1 must merge ON TOP of the legacy aggregates.
    apply(spark.read.schema(EVENTS_DDL).parquet(paths[1]), 1)

    got = (
        spark.read.parquet(os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )
    expected = (
        spark.read.schema(EVENTS_DDL)
        .parquet(paths[0], paths[1])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(expected.reset_index(drop=True))


def test_foreach_batch_upsert_crash_before_publish_preserves_old_snapshot(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r6-VERDICT item 6, ST9 side: inject a crash at THE atomic
    publish step (the os.replace pointer swap) after the new version's
    data and ledger are fully staged. Readers must still see the OLD
    snapshot (data AND ledger consistent — the batch is unrecorded),
    and redelivering the same batch after recovery must converge to
    exactly the once-applied state."""
    import os as _os

    from bigdataproj_spark.catalog import table as load_table
    from bigdataproj_spark.streaming import replay
    from bigdataproj_spark.streaming.replay import (
        foreach_batch_upsert,
        stage_microbatches,
    )

    stage_dir = str(tmp_path / "batches")
    _os.makedirs(stage_dir, exist_ok=True)
    paths = stage_microbatches(spark, sf_dir, stage_dir, n_batches=2)
    table_dir = str(tmp_path / "upsert_table")
    apply = foreach_batch_upsert(spark, table_dir, lineage="crashtest")

    b0 = spark.read.schema(replay.EVENTS_DDL).parquet(paths[0])
    b1 = spark.read.schema(replay.EVENTS_DDL).parquet(paths[1])
    apply(b0, 0)
    snap_v0 = (
        spark.read.parquet(_os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )

    current = _os.path.join(table_dir, "current")
    real_replace = _os.replace

    def exploding_replace(src, dst, *a, **kw):
        if str(dst) == current:
            raise OSError("injected crash at the atomic publish swap")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(_os, "replace", exploding_replace)
    with pytest.raises(OSError, match="injected crash"):
        apply(b1, 1)
    monkeypatch.setattr(_os, "replace", real_replace)

    # old snapshot still serves, data and ledger consistent: batch 1
    # staged but UNRECORDED — no window where data applied w/o marker
    assert _os.readlink(current) == "v_crashtest_0"
    after_crash = (
        spark.read.parquet(_os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )
    assert after_crash.equals(snap_v0)
    ledger = spark.read.parquet(_os.path.join(current, "_ledger")).toPandas()
    assert sorted(ledger["batch_id"]) == [0]

    # recovery: foreachBatch redelivers batch 1; the sink recomputes
    # the version from scratch and converges to the exactly-once state
    apply(b1, 1)
    assert _os.readlink(current) == "v_crashtest_1"
    got = (
        spark.read.parquet(_os.path.join(table_dir, "data"))
        .orderBy("user_id")
        .toPandas()
    )
    expected = (
        b0.unionByName(b1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    assert got.equals(expected)
    # and a second redelivery of batch 1 is a pure no-op
    apply(b1, 1)
    assert _os.readlink(current) == "v_crashtest_1"


def test_streamed_warehouse_ingest_respects_retention_watermark(
    spark, sf_dir, tmp_path
):
    """ST10 ∘ S19b (round-9, r8-VERDICT item 9): the streamed proof of
    the batch-side watermark drop. A continuous warehouse-ingest loop
    (foreachBatch → refresh_warehouse, one micro-batch per trigger)
    runs AFTER a retention watermark was committed; micro-batches —
    and individual rows — arriving below the watermark are dropped
    INSIDE foreachBatch, so the hourly cube and every row-level read
    describe exactly the surviving events: streamed replay == one-shot
    build over the post-TTL corpus."""
    from bigdataproj_spark.plans.corpus_routing import (
        AggCall,
        TableAggQuery,
        current_events,
        route_corpus,
    )
    from bigdataproj_spark.sources.corpus_cubes import events_hourly_cube_table
    from bigdataproj_spark.sources.maintenance import refresh_warehouse
    from bigdataproj_spark.sources.retention import expire_events
    from bigdataproj_spark.streaming.replay import EVENTS_DDL, _drive_stream

    base_dir = tmp_path / "base"
    base_dir.mkdir()
    events = table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 2 == 0)
    delta = events.filter(F.col("event_id") % 2 == 1)
    base.write.parquet(str(base_dir / "events.parquet"))
    for t in ("documents",):
        table(spark, sf_dir, t).write.parquet(str(base_dir / f"{t}.parquet"))
    sf_base = str(base_dir)

    events_hourly_cube_table(spark, sf_base)
    cutoff = "2024-01-10"
    expire_events(spark, sf_base, cutoff)

    # stage the delta as 4 ts-ordered micro-batches: the earliest ones
    # sit (partly or wholly) below the committed watermark
    pdf = delta.toPandas().sort_values(["ts", "event_id"])
    size = (len(pdf) + 3) // 4
    paths = []
    for b in range(4):
        part = pdf.iloc[b * size : (b + 1) * size]
        p = str(tmp_path / f"ev_{b:03d}.parquet")
        part.to_parquet(
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        paths.append(p)

    def attach(stream, ckpt):
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, _id: refresh_warehouse(
                    spark, sf_base, events=batch_df
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        return q, lambda: None

    _drive_stream(spark, paths, EVENTS_DDL, attach)

    # expected: (base ∪ delta) with ts >= watermark — late rows never
    # entered any layout
    wm = F.lit(f"{cutoff} 00:00:00").cast("timestamp")
    want_rows = events.filter(F.col("ts") >= wm)
    assert current_events(spark, sf_base).count() == want_rows.count()
    spec = TableAggQuery(
        table="events", filters=(), group_by=("event_type",),
        aggs=(AggCall("count_star", None, "n"),),
    )
    df, chosen = route_corpus(spark, sf_base, spec)
    assert chosen == "events_hourly_cube", chosen
    got = {r["event_type"]: r["n"] for r in df.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in want_rows.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streamed_erasure_requests_equal_one_shot_delete(
    spark, sf_dir, tmp_path
):
    """The GDPR-feed composition: opt-out requests arriving as a
    STREAM of id batches (foreachBatch → delete_documents per
    micro-batch) must leave the warehouse identical to one batch
    delete of the union — tombstone sets, cube groups, and routed
    answers all converge, and redelivered id batches no-op (the
    tombstone set already covers them)."""
    from bigdataproj_spark.plans.corpus_routing import current_documents
    from bigdataproj_spark.sources.corpus_cubes import docs_stats_cube_table
    from bigdataproj_spark.sources.retention import delete_documents
    from bigdataproj_spark.streaming.replay import _drive_stream

    # two sandbox corpora over the same base: one takes the stream,
    # one the one-shot batch
    dirs = {}
    for name in ("streamed", "oneshot"):
        d = tmp_path / name
        d.mkdir()
        table(spark, sf_dir, "documents").write.parquet(
            str(d / "documents.parquet")
        )
        docs_stats_cube_table(spark, str(d))
        dirs[name] = str(d)

    all_ids = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 4)
        .select("doc_id")
        .toPandas()
        .sort_values("doc_id")
    )
    # three request batches, the middle one redelivered
    thirds = [all_ids.iloc[i::3] for i in range(3)]
    paths = []
    for i, part in enumerate([thirds[0], thirds[1], thirds[1], thirds[2]]):
        p = str(tmp_path / f"optout_{i}.parquet")
        part.to_parquet(p, index=False)
        paths.append(p)

    def attach(stream, ckpt):
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, _id: delete_documents(
                    spark, dirs["streamed"], batch_df
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        return q, lambda: None

    _drive_stream(spark, paths, "doc_id long", attach)
    delete_documents(
        spark, dirs["oneshot"],
        spark.createDataFrame(all_ids, "doc_id long"),
    )

    from bigdataproj_spark.plans.corpus_routing import (
        AggCall,
        TableAggQuery,
        route_corpus,
    )

    spec = TableAggQuery(
        table="documents", filters=(), group_by=("lang", "source"),
        aggs=(AggCall("sum", "chars", "total_chars"),
              AggCall("count_star", None, "n")),
    )
    frames = {}
    for name, d in dirs.items():
        df, chosen = route_corpus(spark, d, spec)
        assert chosen == "docs_stats_cube", (name, chosen)
        frames[name] = df.orderBy("lang", "source").toPandas()
        assert current_documents(spark, d).count() == (
            table(spark, sf_dir, "documents").count() - len(all_ids)
        )
    assert frames["streamed"].equals(frames["oneshot"])


def test_cdc_consumer_replay_equals_one_shot(spark, sf_dir, tmp_path):
    """ST11 (round 11, r10-VERDICT item 3): the CDC → derived-table
    pattern. A consumer bootstraps from the initial snapshot, then
    tails table_changes after every commit, folding each increment
    into a per-language profile — through inserts (new groups),
    predicate deletes (bulk subtraction), a whole-group death, and a
    MERGE prune-to-source. Golden: k-batch replay == one catch-up poll
    over all commits == one-shot recompute from the final state, and a
    caught-up consumer's re-poll is a no-op."""
    from bigdataproj_spark.catalog import TABLES
    from bigdataproj_spark.engine import Engine
    from bigdataproj_spark.plans.corpus_routing import current_documents
    from bigdataproj_spark.streaming.cdc import (
        CdcConsumer,
        bootstrap,
        profile_from_state,
    )

    work = tmp_path / "w"
    work.mkdir()
    for t in TABLES:
        table(spark, sf_dir, t).write.parquet(str(work / f"{t}.parquet"))
    e = Engine(spark, str(work))
    base_docs = current_documents(spark, str(work))
    per = CdcConsumer(spark, str(work), str(tmp_path / "per_batch"))
    lazy = CdcConsumer(spark, str(work), str(tmp_path / "lazy"))
    for c in (per, lazy):
        bootstrap(spark, c.table_dir, base_docs)

    steps = (
        # new docs incl. a NEW language group
        "INSERT INTO documents VALUES "
        "(900000301, 'aaa', 'en', 'src1', 3), "
        "(900000302, 'bbbb', 'zz', 'src1', 4)",
        # bulk predicate delete
        "DELETE FROM documents WHERE doc_id <= 50",
        # the zz group dies entirely (derived row must DROP)
        "DELETE FROM documents WHERE lang = 'zz'",
        # MERGE prune-to-source: one 'merge documents' commit
        "MERGE INTO documents USING ("
        "  SELECT doc_id, text, lang, source, n_chars FROM documents"
        "  WHERE doc_id % 11 <> 0"
        ") s ON doc_id = s.doc_id "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        "INSERT INTO documents VALUES "
        "(900000303, 'ccccc', 'en', 'src2', 5)",
    )
    for stmt in steps:
        e.sql(stmt)
        assert per.poll() > 0  # every step fed the consumer
    assert per.poll() == 0  # caught up: re-poll is a no-op
    assert lazy.poll() > 0  # ONE catch-up poll over all five commits

    def norm(pdf):
        return (
            pdf.sort_values("lang").reset_index(drop=True)[
                ["lang", "total", "n"]
            ]
        )

    want = norm(
        profile_from_state(
            current_documents(spark, str(work))
        ).toPandas()
    )
    assert norm(per.derived().toPandas()).equals(want)
    assert norm(lazy.derived().toPandas()).equals(want)
    # the dead group really dropped (matching the from-scratch build)
    assert "zz" not in set(want["lang"])


def test_cdc_watermark_resume_atomic_publish_and_stale_dir(
    spark, sf_dir, tmp_path
):
    """Round 12 (r11-ADVICE items 1-3): the CDC consumer's durability
    contract. (a) A stale ``cdf_*`` dir left by a prior session's
    crash (the session counter restarts at c1) is removed on first
    staging, so the feed reports only THIS commit's rows. (b) Each
    publish is staged-then-swing with the consumed watermark inside
    the renamed dir: junk tmp leftovers are never served and are
    cleaned by the next publish. (c) A RECONSTRUCTED consumer with
    the default from_version resumes from the recorded watermark —
    commits between the last poll and reconstruction are replayed,
    never skipped."""
    import os

    from bigdataproj_spark.catalog import TABLES
    from bigdataproj_spark.engine import Engine
    from bigdataproj_spark.plans.corpus_routing import current_documents
    from bigdataproj_spark.sources.bucketed import _layout_paths
    from bigdataproj_spark.streaming.cdc import (
        CdcConsumer,
        _latest_version_dir,
        profile_from_state,
        read_derived,
        recorded_watermark,
    )

    work = tmp_path / "w"
    work.mkdir()
    for t in TABLES:
        table(spark, sf_dir, t).write.parquet(str(work / f"{t}.parquet"))
    e = Engine(spark, str(work))

    # (a) stale delta dir at the path the FIRST staging will use
    tag, wh = _layout_paths(str(work))
    os.makedirs(wh, exist_ok=True)
    c_next = spark.__dict__.get("_bdp_cdf_seq", {}).get(str(work), 0) + 1
    stale = os.path.join(wh, f"cdf_documents_{tag}_c{c_next}")
    spark.createDataFrame(
        [(123456789, "junk from prior session", "xx", "src0", 23, "insert")],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _change_type string",
    ).write.parquet(stale)

    tdir = str(tmp_path / "derived")
    con = CdcConsumer(spark, str(work), tdir)
    con.bootstrap()
    assert recorded_watermark(tdir) == con.consumed
    e.sql(
        "INSERT INTO documents VALUES (900000701, 'abc', 'en', 'src1', 3)"
    )
    head1 = e.history().collect()[-1].version
    feed = e.table_changes("documents", 0, head1).collect()
    assert [(r.doc_id, r._change_type) for r in feed] == [
        (900000701, "insert")
    ]  # the stale dir's junk row is gone
    assert con.poll() == 1
    assert recorded_watermark(tdir) == head1

    # (b) a crashed publish's tmp leftovers are never served
    v, cur = _latest_version_dir(tdir)
    junk_tmp = os.path.join(tdir, f"_tmp_v{v + 1}")
    os.makedirs(junk_tmp)
    with open(os.path.join(junk_tmp, "part-junk.parquet"), "w") as fh:
        fh.write("not parquet")
    assert _latest_version_dir(tdir) == (v, cur)
    assert read_derived(spark, tdir) is not None

    # (c) reconstruction resumes from the recorded watermark
    e.sql("DELETE FROM documents WHERE doc_id = 900000701")
    head2 = e.history().collect()[-1].version
    con2 = CdcConsumer(spark, str(work), tdir)
    assert con2.consumed == head1
    assert con2.poll() == 1  # exactly the one commit since the watermark
    assert recorded_watermark(tdir) == head2
    assert not os.path.isdir(junk_tmp)  # retried publish cleaned it

    def norm(pdf):
        return (
            pdf.sort_values("lang").reset_index(drop=True)[
                ["lang", "total", "n"]
            ]
        )

    want = norm(
        profile_from_state(current_documents(spark, str(work))).toPandas()
    )
    assert norm(con2.derived().toPandas()).equals(want)


def test_cdc_consumer_refuses_unwatermarked_table(spark, sf_dir, tmp_path):
    """A derived table with versions but NO recorded watermark (it
    predates sidecars) must refuse the default resume: nothing records
    what it has folded in, and a guessed start could double-count."""
    import pytest

    from bigdataproj_spark.streaming.cdc import CdcConsumer, bootstrap

    tdir = str(tmp_path / "legacy")
    bootstrap(
        spark, tdir,
        spark.createDataFrame([("en", 3)], "lang string, n_chars long"),
    )  # no consumed= → no sidecar, the pre-round-12 shape
    with pytest.raises(ValueError, match="no recorded watermark"):
        CdcConsumer(spark, sf_dir, tdir)


def test_cdc_projection_consumer_replay_equals_one_shot(
    spark, sf_dir, tmp_path
):
    """ST11b golden (round 12, r11-VERDICT items 1+3): the
    projection-grade consumer's full partial contract — exact sums,
    counts, AND the non-invertible min/max — replays to exactly the
    one-shot build, through an insert that raises a group's max
    (monoid path), a predicate delete that kills group MAX rows
    (affected-group recompute path), a whole-group death, and a MERGE
    prune. Per-batch polling == one catch-up poll == one-shot, on a
    (lang, source) documents profile. Also pins the first-class-object
    contract: the catalog entry is served only while FRESH, and the
    synchronous mutation hooks leave the CDC-maintained view alone
    (its path moves only when the consumer polls)."""
    from bigdataproj_spark.catalog import TABLES
    from bigdataproj_spark.engine import Engine
    from bigdataproj_spark.plans.corpus_routing import current_documents
    from bigdataproj_spark.sources.corpus_user_projections import (
        _catalog,
        corpus_user_projections,
    )
    from bigdataproj_spark.streaming.cdc import CdcProjectionConsumer

    work = tmp_path / "w"
    work.mkdir()
    for t in TABLES:
        table(spark, sf_dir, t).write.parquet(str(work / f"{t}.parquet"))
    e = Engine(spark, str(work))
    per = CdcProjectionConsumer(
        spark, str(work), str(tmp_path / "per"), name="doc_profile",
        keys=("lang", "source"), measures=("chars",),
    )
    lazy = CdcProjectionConsumer(
        spark, str(work), str(tmp_path / "lazy"), name="doc_profile_lazy",
        keys=("lang", "source"), measures=("chars",),
    )
    per.bootstrap()
    lazy.bootstrap()

    def served():
        return {
            p.name for p in corpus_user_projections(spark, str(work))
        }

    assert {"user:doc_profile", "user:doc_profile_lazy"} <= served()

    steps = (
        # a new max for (en, src1) + a brand-new zz group: monoid fold
        "INSERT INTO documents VALUES "
        "(900000401, 'x' , 'en', 'src1', 9999), "
        "(900000402, 'bbbb', 'zz', 'src1', 4)",
        # kills every group's largest rows: min/max must RECOMPUTE
        "DELETE FROM documents WHERE n_chars >= 300",
        # the zz group dies entirely (derived row must DROP)
        "DELETE FROM documents WHERE lang = 'zz'",
        # MERGE prune-to-source: a mixed 'merge documents' commit
        "MERGE INTO documents USING ("
        "  SELECT doc_id, text, lang, source, n_chars FROM documents"
        "  WHERE doc_id % 11 <> 0"
        ") s ON doc_id = s.doc_id "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    cat = _catalog(spark, str(work))
    for stmt in steps:
        path_before = cat["doc_profile"].path
        e.sql(stmt)
        # the synchronous hooks (refresh/delete/merge) skipped the
        # CDC-maintained entry, and the router stops serving it until
        # the consumer catches up
        assert cat["doc_profile"].path == path_before
        assert "user:doc_profile" not in served()
        assert per.poll() > 0
        assert cat["doc_profile"].path != path_before
        assert "user:doc_profile" in served()
    assert per.poll() == 0
    assert lazy.poll() > 0  # one catch-up poll over all four commits

    one_shot = per._partials(current_documents(spark, str(work)))

    def norm(df):
        pdf = df.toPandas()
        cols = sorted(pdf.columns)
        return (
            pdf[cols]
            .sort_values(["lang", "source"])
            .reset_index(drop=True)
        )

    want = norm(one_shot)
    assert norm(per.derived()).equals(want)
    assert norm(lazy.derived()).equals(want)
    # the killed maxes really shrank and the dead group really dropped
    assert want["max_chars_i"].max() < 9999
    assert "zz" not in set(want["lang"])


def test_cdc_projection_consumer_refusals(spark, sf_dir, tmp_path):
    """Declaration guards: dim-attribute keys, unknown measures, and
    unknown tables refuse with worded reasons (a dim key needs the
    registry join at fold time — that is deploy_corpus_projection's
    territory)."""
    import pytest

    from bigdataproj_spark.streaming.cdc import CdcProjectionConsumer

    with pytest.raises(ValueError, match="fact table's own columns"):
        CdcProjectionConsumer(
            spark, sf_dir, str(tmp_path / "a"), name="x",
            keys=("source_category",),
        )
    with pytest.raises(ValueError, match="unknown measure"):
        CdcProjectionConsumer(
            spark, sf_dir, str(tmp_path / "b"), name="x",
            keys=("lang",), measures=("no_such",),
        )
    with pytest.raises(ValueError, match="unknown corpus table"):
        CdcProjectionConsumer(
            spark, sf_dir, str(tmp_path / "c"), name="x", table="orders",
        )


def test_cdc_fold_null_group_merges_into_one_row(spark, tmp_path):
    """Round-11 self-review regression: the increment merge must be
    NULL-safe on the group key — groupBy folds NULL group values into
    ONE group, so the stored/increment join must pair them too (a
    plain full_outer never matches NULL keys and would split the NULL
    group into duplicate rows, compounding every poll)."""
    from bigdataproj_spark.streaming.cdc import apply_increment, read_derived

    tdir = str(tmp_path / "d")
    ddl = "lang string, n_chars long, _change_type string"
    apply_increment(
        spark, tdir,
        spark.createDataFrame(
            [(None, 5, "insert"), ("en", 3, "insert")], ddl
        ),
    )
    apply_increment(
        spark, tdir,
        spark.createDataFrame([(None, 2, "insert")], ddl),
    )
    rows = {
        r.lang: (r.total, r.n)
        for r in read_derived(spark, tdir).collect()
    }
    assert rows == {None: (7, 2), "en": (3, 1)}
