"""SparkSession factory tuned for the engine.

100 TB posture (SURVEY.md §4): rely on Catalyst + AQE, configure rather
than hand-schedule.

- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast-join conversion.
- UTC session timezone: determinism contract (SURVEY.md §2.4 rule 3).
- Arrow enabled: the only JVM<->Python data boundary is vectorized.
- ``spark.sql.shuffle.partitions`` is a *starting* width; AQE coalesces
  down after each exchange. On a real cluster this would be set to
  2-3x total cores and AQE handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "bigdataproj-spark",
    master: str | None = None,
    **extra: str,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession."""
    resolved_master = master or default_master()
    builder = SparkSession.builder.appName(app_name).master(resolved_master)
    # Scan-split sizing: target 2-3 tasks per core. On a cluster reading
    # 100 TB the 128m default already yields millions of splits — keep it.
    # In local mode the fixtures are single ~1-20 MB files, which the
    # default turns into 1-3 scan tasks on 32 cores; 1m splits restore
    # scan/partial-agg parallelism (measured: q01 0.89s -> 0.62s at sf0.1).
    local = resolved_master.startswith("local")
    conf: dict[str, str] = {
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_MAX_PARTITION_BYTES", "1m" if local else "128m"
        ),
        "spark.sql.files.openCostInBytes": "131072" if local else "4194304",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Dimension tables (region/nation/customer/supplier/part at test
        # scale; anything < threshold at cluster scale) broadcast.
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        # Structured Streaming micro-batch state stores are small in
        # tests; RocksDB would be the cluster choice.
        "spark.sql.streaming.stateStore.stateSchemaCheck": "false",
        # Fixture parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects; read as INT64 nanos and convert in the catalog
        # (DuckDB truncates ns→µs the same way).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
