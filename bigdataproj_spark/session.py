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
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    # Scan-split sizing: the 128m default is right at every scale. The
    # fixture files are single parquet row groups, and a row group is
    # the unsplittable read unit — smaller split sizes only add empty
    # tasks (measured: q01 0.70s @128m vs 0.84s @1m at sf0.1). Narrow
    # scans that feed CPU-heavy work are rebalanced explicitly instead
    # (operators.skew.fan_out).
    conf: dict[str, str] = {
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
