"""R11 broker stand-in: an embedded, file-backed topic log that speaks
the Kafka SOURCE CONTRACT to Structured Streaming.

The reference ships enriched tweets to a Kafka topic and consumes them
downstream (reference README.md:47-49). This container has neither a
broker nor the spark-sql-kafka connector JAR (tests/test_kafka.py
documents the real-path spark-submit line and self-skips), so this
module provides the strongest offline equivalent: a durable,
append-only, partitioned log on the filesystem whose STREAMING READ
presents exactly the schema the Kafka source presents —

    key binary, value binary, topic string,
    partition int, offset long, timestamp timestamp,
    timestampType int

— so every transformation downstream of ``.load()`` is byte-identical
between this stand-in and a real ``readStream.format("kafka")``. The
deployment delta is ONE builder swap, and the delta list vs a real
broker is documented on :class:`FileTopic`.

Broker semantics implemented (the ones Structured Streaming relies on):
- records are assigned to a partition by key hash (null key →
  round-robin spread), like Kafka's default partitioner;
- offsets are per-partition, monotone, and dense absent producer
  crashes (a produce that crashes mid-flush leaves a reserved gap —
  never a duplicate or an overwrite); a record is immutable once
  written;
- producers append SEGMENTS (one file per topic-partition per
  ``produce`` flush — the micro-batch boundary, like a producer batch
  flush); readers see a segment atomically (file rename) or not at all;
- concurrent producers (same or different process) are safe: offset /
  segment-number reservation happens under an exclusive lock file and
  re-reads the on-disk meta, so two producers interleave without
  duplicate offsets or overwritten segments;
- consumer progress is tracked by the reader's checkpoint (Spark's
  file-source log — the consumer-group offset store), giving the same
  at-least-once delivery into ``foreachBatch`` and exactly-once into
  stateful sinks that real Kafka gives.

NOT implemented (the honest delta): broker replication / ISR
failover, log compaction & retention, transactions/EOS producers,
consumer rebalancing across processes, and SASL/TLS. None of these
change the DataFrame-level contract the engine is tested against.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The 7-column schema of readStream.format("kafka"): timestampType is
# Kafka's timestamp provenance enum (0 = CreateTime, 1 = LogAppendTime);
# this log stamps at append, but real Kafka reports producer-batch
# CreateTime by default, so the stand-in reports the same constant.
KAFKA_SOURCE_DDL = (
    "key binary, value binary, topic string, "
    "partition int, offset long, timestamp timestamp, timestampType int"
)
_TS_CREATE_TIME = 0



class FileTopic:
    """One topic of the embedded file-backed log.

    Multi-producer contract: the authoritative offset/segment state is
    the on-disk ``_meta.json``, re-read under ``_meta.lock`` on every
    produce — instances hold no cached counters, so any number of
    producer instances (across processes) interleave safely. On a
    cluster the topic directory lives on shared storage (HDFS/NFS);
    the lock is a kernel ``flock`` on a per-topic lock file (NFSv4
    supports flock; a deployment on a filesystem without advisory
    locks must serialize producers externally).
    """

    def __init__(self, root: str, name: str, partitions: int = 4):
        self.name = name
        self.partitions = partitions
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self._meta_path = os.path.join(self.dir, "_meta.json")
        self._lock_path = os.path.join(self.dir, "_meta.lock")
        if os.path.exists(self._meta_path):
            self.partitions = self._load_meta()["partitions"]
        else:
            with self._lock():
                if not os.path.exists(self._meta_path):  # lost init race
                    self._save_meta(
                        {
                            "partitions": partitions,
                            "next_offset": {p: 0 for p in range(partitions)},
                            "next_segment": 0,
                        }
                    )
            self.partitions = self._load_meta()["partitions"]

    # -- metadata under lock ------------------------------------------

    def _load_meta(self) -> dict:
        with open(self._meta_path) as f:
            meta = json.load(f)
        meta["next_offset"] = {int(k): v for k, v in meta["next_offset"].items()}
        return meta

    def _save_meta(self, meta: dict) -> None:
        tmp = self._meta_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def _lock(self):
        """Exclusive advisory lock on ``_meta.lock`` via ``flock``.

        The kernel owns the lock lifetime: a crashed producer's lock
        releases automatically when its fd closes, so there is no
        staleness heuristic and no steal path — earlier drafts that
        unlinked "stale" lock FILES had an unavoidable window where a
        waiter could delete a LIVE holder's lock and break mutual
        exclusion. The lock file itself is never removed; only the
        flock on it is held/released.
        """
        import fcntl

        topic = self

        class _Lock:
            def __enter__(self):
                self._fd = os.open(topic._lock_path, os.O_CREAT | os.O_WRONLY)
                fcntl.flock(self._fd, fcntl.LOCK_EX)  # blocks until free
                return self

            def __exit__(self, *exc):
                fcntl.flock(self._fd, fcntl.LOCK_UN)
                os.close(self._fd)

        return _Lock()

    def _reserve(self, counts: dict[int, int]) -> tuple[dict[int, int], dict[int, int]]:
        """Under the lock: reserve offset ranges and one segment number
        per partition (EVERY partition — empty ones get a 0-row segment
        so each flush is exactly ``partitions`` files; see
        ``read_stream``); returns ({p: base_offset}, {p: seg_no}).
        Reservation precedes publish (see ``produce``): a crash after
        reserving leaves a benign gap, never a duplicate/overwrite."""
        with self._lock():
            meta = self._load_meta()
            bases, segs = {}, {}
            for p in range(self.partitions):
                n = counts.get(p, 0)
                bases[p] = meta["next_offset"][p]
                meta["next_offset"][p] += n
                segs[p] = meta["next_segment"]
                meta["next_segment"] += 1
            self._save_meta(meta)
        return bases, segs

    def _partition_of(self, key: bytes | None, i: int) -> int:
        if key is None:
            return i % self.partitions  # sticky/round-robin stand-in
        # deterministic key partitioner (Kafka uses murmur2; any fixed
        # hash preserves the per-key ordering guarantee that matters)
        return zlib.crc32(key) % self.partitions

    def produce(
        self, spark: SparkSession, records: list[tuple[bytes | None, bytes]]
    ) -> int:
        """Append one producer flush (one segment parquet file per
        non-empty topic partition) and return the number of records
        written. Per-key ordering is preserved: a key always lands in
        the same partition, and offsets within a partition are assigned
        in list order. Segments are written under _tmp then atomically
        renamed into the watched dir (the file-stream source does not
        recurse into directory segments) — readers see a whole segment
        or nothing.

        Crash-safety order: the meta (segment numbers + offsets) is
        RESERVED before any segment publishes. A producer crash
        between the reserve and the publish leaves a gap — skipped
        segment numbers and unreferenced offsets — which is benign
        (like an aborted Kafka transaction). The reverse order would
        be a corruption: a restart would reuse a published segment's
        number and OVERWRITE immutable records with duplicate offsets.
        """
        by_part: dict[int, list[tuple[bytes | None, bytes]]] = {
            p: [] for p in range(self.partitions)
        }
        for i, (key, value) in enumerate(records):
            by_part[self._partition_of(key, i)].append((key, value))
        bases, segs = self._reserve({p: len(rs) for p, rs in by_part.items()})
        for p, rs in sorted(by_part.items()):
            _write_segment(
                self.dir,
                self.name,
                p,
                segs[p],
                [k for k, _ in rs],
                [v for _, v in rs],
                list(range(bases[p], bases[p] + len(rs))),
            )
        return len(records)

    def produce_df(self, df: DataFrame, key_col: str, value_col: str) -> int:
        """The distributed producer: append one flush of ``df`` without
        materializing rows on the driver. Executors write one segment
        per topic partition directly (applyInPandas group = one topic
        partition of this flush — bounded by the flush size, exactly a
        real Kafka producer's in-flight batch buffer); the only
        driver-side data is the per-partition record COUNT (``P`` rows,
        needed to reserve dense offset ranges before publish).

        Offset order within a flush is (key, value) byte order — a
        DataFrame has no row order to preserve, so the producer defines
        a deterministic one. The per-key ordering guarantee (all
        records of a key in one partition, offsets monotone) is what
        downstream consumers rely on and is unchanged.

        On a cluster the topic dir must be shared storage (it is the
        broker's log dir); in local mode executors share the local FS.
        """
        n_parts = self.partitions

        def as_binary(col: str) -> F.Column:
            # ANSI mode only casts STRING/BINARY to BINARY; serialize
            # other key/value types through their string form (what a
            # Kafka StringSerializer would do).
            if dict(df.dtypes)[col] == "binary":
                return F.col(col)
            return F.col(col).cast("string").cast("binary")

        staged = df.select(
            as_binary(key_col).alias("key"), as_binary(value_col).alias("value")
        )
        # Null-key records round-robin via monotonically_increasing_id,
        # so WHICH partition a null-key record lands in is plan-
        # dependent — not replay-stable run to run (real Kafka's
        # sticky/round-robin null-key partitioner is equally
        # placement-unstable). localCheckpoint pins ONE materialization
        # so counts and the write agree within a flush. Keyed records
        # ARE replay-stable end-to-end (same key → same partition,
        # same sort order → same offsets; asserted in
        # tests/test_kafka.py::test_keyed_produce_df_is_replay_stable).
        staged = staged.withColumn(
            "p",
            F.when(
                F.col("key").isNull(),
                F.pmod(F.monotonically_increasing_id(), F.lit(n_parts)),
            )
            .otherwise(F.crc32(F.col("key")) % n_parts)
            .cast("int"),
        ).localCheckpoint()  # counts and the write must see one materialization
        counts = {p: 0 for p in range(n_parts)}
        counts.update(
            {
                r["p"]: r["n"]
                for r in staged.groupBy("p").agg(F.count("*").alias("n")).collect()
            }
        )
        bases, segs = self._reserve(counts)
        topic_dir, topic_name = self.dir, self.name

        def write_group(pdf):
            import pandas as pd

            p = int(pdf["p"].iloc[0])
            pdf = pdf.sort_values(
                ["key", "value"], key=lambda s: s.map(lambda b: b or b"")
            )
            offs = list(range(bases[p], bases[p] + len(pdf)))
            _write_segment(
                topic_dir,
                topic_name,
                p,
                segs[p],
                list(pdf["key"]),
                list(pdf["value"]),
                offs,
                publish=False,  # stage under _tmp; driver publishes the flush
            )
            return pd.DataFrame({"p": [p], "n": [len(pdf)]})

        written = (
            staged.groupBy("p")
            .applyInPandas(write_group, "p int, n long")
            .agg(F.sum("n").alias("n"))
            .collect()[0]["n"]
        )
        staged.unpersist()
        # Flush atomicity: executors STAGE their segments under _tmp
        # (a task retry just re-replaces its own staged file — nothing
        # is visible to consumers mid-job), empty partitions stage a
        # 0-row segment the same way, and only after the whole Spark
        # job has succeeded does the driver publish all `partitions`
        # files in one tight rename loop. A job failure publishes
        # NOTHING (staged files + the reserved offsets are a benign
        # abort, like an aborted Kafka transaction); a consumer can
        # therefore never observe a flush torn by a stage retry.
        for p, n in counts.items():
            if n == 0:
                _write_segment(
                    self.dir, self.name, p, segs[p], [], [], [], publish=False
                )
        _publish_staged(self.dir, sorted(segs.values()))
        return int(written or 0)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """The consumer: a streaming DataFrame with the exact Kafka
        source schema. One producer FLUSH per micro-batch — a flush is
        exactly ``partitions`` segment files (empty partitions publish
        0-row segments), so ``maxFilesPerTrigger=partitions`` makes the
        trigger boundary the flush boundary, matching how a caught-up
        Kafka consumer sees each producer batch as one offset range.
        Offsets resume from the query's checkpoint exactly like a
        consumer group's committed offsets.

        Alignment caveat: a flush's segments publish in one driver-side
        rename pass after the producing job succeeds (never torn by a
        stage retry), but the pass is ``partitions`` sequential renames
        — a trigger racing into that microsecond window can split one
        flush across two micro-batches. Drift only moves batch
        boundaries; delivery stays lossless and duplicate-free."""
        return (
            spark.readStream.schema(KAFKA_SOURCE_DDL)
            .option("maxFilesPerTrigger", self.partitions)
            .parquet(self.dir)
        )

    def read_batch(self, spark: SparkSession) -> DataFrame:
        """Batch read of the whole log (``startingOffsets=earliest``)."""
        return spark.read.schema(KAFKA_SOURCE_DDL).parquet(self.dir)


def _staged_path(topic_dir: str, segment_no: int) -> tuple[str, str]:
    """(staged path under _tmp, published path) for a segment number —
    deterministic because segment numbers are topic-global unique."""
    name = f"segment_{segment_no:08d}.parquet"
    return os.path.join(topic_dir, "_tmp", f"staged_{name}"), os.path.join(
        topic_dir, name
    )


def _publish_staged(topic_dir: str, segment_nos: list[int]) -> None:
    """Publish one flush's staged segments: a single driver-side pass
    of atomic renames, run only after the producing Spark job has
    succeeded. Each rename is individually atomic; the pass is a tight
    loop, so the window in which a concurrently-triggering consumer
    could observe a partial flush is microseconds — and even then the
    drift is benign (micro-batch boundaries shift; no record is lost
    or duplicated, offsets stay dense and immutable)."""
    for seg_no in segment_nos:
        staged, final = _staged_path(topic_dir, seg_no)
        os.replace(staged, final)


def _write_segment(
    topic_dir: str,
    topic_name: str,
    partition: int,
    segment_no: int,
    keys: list,
    values: list,
    offsets: list[int],
    publish: bool = True,
) -> None:
    """Write one segment file atomically (tmp + rename). Runs on the
    driver (list producer) or an executor (produce_df) — pure function
    of its arguments, no topic state. With ``publish=False`` the
    rename target is the segment's STAGED path under ``_tmp`` (still
    write-then-replace, so a speculative or retried task never exposes
    a partial file to the later publish pass); the caller publishes the
    whole flush via :func:`_publish_staged` after the job succeeds."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    # UTC-adjusted timestamps (isAdjustedToUTC=true), matching real
    # Kafka's epoch timestamps: a consumer in any session timezone
    # reads the same instant. A tz-naive write would shift by the
    # reader's session zone.
    now = _dt.datetime.now(_dt.timezone.utc)
    n = len(keys)
    tbl = pa.table(
        {
            "key": pa.array([bytes(k) if k is not None else None for k in keys], pa.binary()),
            "value": pa.array([bytes(v) for v in values], pa.binary()),
            "topic": pa.array([topic_name] * n, pa.string()),
            "partition": pa.array([partition] * n, pa.int32()),
            "offset": pa.array(offsets, pa.int64()),
            "timestamp": pa.array([now] * n, pa.timestamp("us", tz="UTC")),
            "timestampType": pa.array([_TS_CREATE_TIME] * n, pa.int32()),
        }
    )
    staged, final = _staged_path(topic_dir, segment_no)
    seg = final if publish else staged
    tmp_dir = os.path.join(topic_dir, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    tmp = os.path.join(tmp_dir, f"{os.getpid()}_{os.path.basename(seg)}")
    pq.write_table(tbl, tmp)
    os.replace(tmp, seg)


def produce_json(
    topic: FileTopic, spark: SparkSession, df: DataFrame, key_col: str
) -> int:
    """R10+R11 producer: serialize each row as one JSON record keyed by
    ``key_col`` — the reference's tweet-to-topic shape — and append as
    one flush via the distributed producer (no driver-side rows)."""
    staged = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.to_json(F.struct(*df.columns)).alias("v"),
    )
    return topic.produce_df(staged, "k", "v")
