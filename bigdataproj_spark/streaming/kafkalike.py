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
    partition int, offset long, timestamp timestamp

— so every transformation downstream of ``.load()`` is byte-identical
between this stand-in and a real ``readStream.format("kafka")``. The
deployment delta is ONE builder swap, and the delta list vs a real
broker is documented on :class:`FileTopic`.

Broker semantics implemented (the ones Structured Streaming relies on):
- records are assigned to a partition by key hash (null key →
  round-robin over producer batches), like Kafka's default partitioner;
- offsets are per-partition, monotone, and dense absent producer
  crashes (a produce that crashes mid-flush leaves a reserved gap —
  never a duplicate or an overwrite); a record is immutable once
  written;
- producers append SEGMENTS (one file per produce() flush — the
  micro-batch boundary, like a producer batch flush); readers see a
  segment atomically (file rename) or not at all;
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

KAFKA_SOURCE_DDL = (
    "key binary, value binary, topic string, "
    "partition int, offset long, timestamp timestamp"
)


class FileTopic:
    """One topic of the embedded file-backed log."""

    def __init__(self, root: str, name: str, partitions: int = 4):
        self.name = name
        self.partitions = partitions
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self._meta_path = os.path.join(self.dir, "_meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self._next_offset = {int(k): v for k, v in meta["next_offset"].items()}
            self._next_segment = meta["next_segment"]
            self.partitions = meta["partitions"]
        else:
            self._next_offset = {p: 0 for p in range(partitions)}
            self._next_segment = 0
            self._save_meta()

    def _save_meta(self) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "partitions": self.partitions,
                    "next_offset": self._next_offset,
                    "next_segment": self._next_segment,
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    def _partition_of(self, key: bytes | None, i: int) -> int:
        if key is None:
            return i % self.partitions  # sticky/round-robin stand-in
        # deterministic key partitioner (Kafka uses murmur2; any fixed
        # hash preserves the per-key ordering guarantee that matters)
        return zlib.crc32(key) % self.partitions

    def produce(
        self, spark: SparkSession, records: list[tuple[bytes | None, bytes]]
    ) -> int:
        """Append one producer flush (ONE segment parquet file) and
        return the number of records written. Per-key ordering is
        preserved: a key always lands in the same partition, and
        offsets within a partition are assigned in list order. The
        segment is written via pyarrow as a single plain file (the
        file-stream source does not recurse into directory segments)
        under _tmp, then atomically renamed into the watched dir —
        readers see a whole segment or nothing.

        Crash-safety order: the meta (segment number + offsets) is
        RESERVED before the segment publishes. A producer crash
        between the reserve and the publish leaves a gap — a skipped
        segment number and unreferenced offsets — which is benign
        (like an aborted Kafka transaction). The reverse order would
        be a corruption: a restart would reuse the published
        segment's number and OVERWRITE immutable records with
        duplicate offsets.
        """
        import datetime as _dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        keys, values, parts, offs = [], [], [], []
        for i, (key, value) in enumerate(records):
            p = self._partition_of(key, i)
            keys.append(key)
            values.append(value)
            parts.append(p)
            offs.append(self._next_offset[p])
            self._next_offset[p] += 1
        # UTC-adjusted timestamps (isAdjustedToUTC=true), matching real
        # Kafka's epoch timestamps: a consumer in any session timezone
        # reads the same instant. A tz-naive write would shift by the
        # reader's session zone.
        now = _dt.datetime.now(_dt.timezone.utc)
        tbl = pa.table(
            {
                "key": pa.array(keys, pa.binary()),
                "value": pa.array(values, pa.binary()),
                "topic": pa.array([self.name] * len(keys), pa.string()),
                "partition": pa.array(parts, pa.int32()),
                "offset": pa.array(offs, pa.int64()),
                "timestamp": pa.array(
                    [now] * len(keys), pa.timestamp("us", tz="UTC")
                ),
            }
        )
        seg = os.path.join(self.dir, f"segment_{self._next_segment:08d}.parquet")
        self._next_segment += 1
        self._save_meta()  # reserve BEFORE publish (see docstring)
        tmp_dir = os.path.join(self.dir, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, os.path.basename(seg))
        pq.write_table(tbl, tmp)
        os.replace(tmp, seg)
        return len(records)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """The consumer: a streaming DataFrame with the exact Kafka
        source schema. One segment per micro-batch (the producer-flush
        boundary), offsets resume from the query's checkpoint exactly
        like a consumer group's committed offsets."""
        return (
            spark.readStream.schema(KAFKA_SOURCE_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.dir)
        )

    def read_batch(self, spark: SparkSession) -> DataFrame:
        """Batch read of the whole log (``startingOffsets=earliest``)."""
        return spark.read.schema(KAFKA_SOURCE_DDL).parquet(self.dir)


def produce_json(
    topic: FileTopic, spark: SparkSession, df: DataFrame, key_col: str
) -> int:
    """R10+R11 producer: serialize each row as one JSON record keyed by
    ``key_col`` — the reference's tweet-to-topic shape — and append as
    one segment."""
    recs = [
        (
            str(r["k"]).encode() if r["k"] is not None else None,
            r["v"].encode(),
        )
        for r in df.select(
            F.col(key_col).cast("string").alias("k"),
            F.to_json(F.struct(*df.columns)).alias("v"),
        ).collect()
    ]
    return topic.produce(spark, recs)
