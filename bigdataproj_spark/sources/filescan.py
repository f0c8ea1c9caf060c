"""S2 JSON scan and S3 CSV scan — schema-on-read file sources.

The reference's batch path reads tweets from a JSON-lines file
(reference README.md:105-107: "Tweets can also be read from a JSON
file … processed in batches"). The engine's contract: every file scan
declares an explicit schema (``spark.read.schema(s)``) — inference is
never on a production path (SURVEY.md §1.2).

The oracle strategy: the query builder first EXPORTS a fixture table
to JSONL/CSV with the engine's own (distributed) writer, then reads it
back through the schema-on-read scan and aggregates; the oracle runs
the same aggregate on the original parquet. A hash match therefore
proves the full write→scan round-trip is lossless, covering both the
source and the serialization.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import pid_scratch, scratch_tag, table
from ..registry import query
from ..schemas import CUSTOMER, ORDERS

_EXPORT_ROOT = os.path.join(tempfile.gettempdir(), "bigdataproj_exports")


def _export_dir(sf_dir: str, kind: str) -> str:
    return os.path.join(pid_scratch(_EXPORT_ROOT), scratch_tag(sf_dir), kind)


def write_json_copy(df: DataFrame, path: str) -> None:
    """Export a DataFrame as JSON-lines (R10 serialization surface,
    one JSON object per line, ISO-8601 timestamps — Spark's default
    JSON timestamp format round-trips losslessly with the default
    reader; a custom pattern on one side only would not)."""
    df.write.mode("overwrite").json(path)


def write_csv_copy(df: DataFrame, path: str) -> None:
    """Export a DataFrame as headered CSV (quoted strings)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def json_scan(spark: SparkSession, path: str, schema) -> DataFrame:
    """S2: JSONL scan with explicit schema (never inferred)."""
    return spark.read.schema(schema).json(path)


def csv_scan(spark: SparkSession, path: str, schema) -> DataFrame:
    """S3: headered CSV scan with explicit schema."""
    return spark.read.schema(schema).option("header", True).csv(path)


_Q41_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
    AS total_price,
  strftime(MIN(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS first_order
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("r77_json_scan", oracle=_Q41_ORACLE, tags=("S2", "sources"))
def r77_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip: orders → distributed JSON export → schema-on-
    read scan (S2) → aggregate. Matching the parquet-side oracle proves
    the JSON boundary preserves longs, doubles, strings, timestamps."""
    out = _export_dir(sf_dir, "orders_json")
    write_json_copy(table(spark, sf_dir, "orders"), out)
    o = json_scan(spark, out, ORDERS)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("total_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").alias(
                "first_order"
            ),
        )
        .orderBy("o_orderpriority")
    )


_Q42_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
    AS total_acctbal,
  MIN(c_name) AS first_name
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("r78_csv_scan", oracle=_Q42_ORACLE, tags=("S3", "sources"))
def r78_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: customer → headered CSV export → schema-on-read
    scan (S3) → aggregate (covers quoting, null round-trip, numeric
    parsing)."""
    out = _export_dir(sf_dir, "customer_csv")
    write_csv_copy(table(spark, sf_dir, "customer"), out)
    c = csv_scan(spark, out, CUSTOMER)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("total_acctbal"),
            F.min("c_name").alias("first_name"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# S7 (engine extension): ORC round-trip — the second columnar format
# every warehouse-adjacent engine is expected to read and write.
# ---------------------------------------------------------------------------


def write_orc_copy(df: DataFrame, path: str) -> None:
    """Export a DataFrame as ORC (built-in Spark format, zlib default)."""
    df.write.mode("overwrite").orc(path)


def orc_scan(spark: SparkSession, path: str) -> DataFrame:
    """S7: ORC scan. ORC files carry their own schema (self-describing
    like parquet), so unlike JSON/CSV no explicit schema is required —
    but predicate pushdown and column pruning still apply."""
    return spark.read.orc(path)


_Q_ORC_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n_items,
  SUM(l_quantity) AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_price
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("r44_orc_roundtrip", oracle=_Q_ORC_ORACLE, tags=("S7", "sources"))
def r44_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: lineitem → distributed ORC export → ORC scan →
    filtered aggregate. Matching the parquet-side oracle proves the
    ORC boundary preserves longs, decimals-as-doubles, dates, strings;
    the filter on the scan side also exercises ORC predicate pushdown
    (the plan shows PushedFilters on the OrcScan exactly as on
    parquet — asserted in tests/test_plans.py).
    """
    out = _export_dir(sf_dir, "lineitem_orc")
    write_orc_copy(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
        ),
        out,
    )
    li = orc_scan(spark, out).filter(F.col("l_shipdate") >= "1995-01-01")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# S8 (engine extension): schema evolution — mergeSchema read across
# batches written with different column sets.
# ---------------------------------------------------------------------------

_Q_EVO_ORACLE = """
SELECT
  pri,
  COUNT(*) AS n_orders,
  CAST(COUNT(total_price) AS BIGINT) AS n_with_price,
  CAST(SUM(CAST(round(COALESCE(total_price, 0) * 100) AS BIGINT)) AS DOUBLE)
    / 100.0 AS sum_price
FROM (
  SELECT
    CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS pri,
    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS total_price
  FROM orders
)
GROUP BY pri
ORDER BY pri NULLS FIRST
"""


@query("r48_schema_evolution", oracle=_Q_EVO_ORACLE, tags=("S8", "sources"))
def r48_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across write batches: an early batch carries
    (o_orderkey, o_totalprice), a later batch adds o_orderpriority and
    drops o_totalprice — the mergeSchema read unifies both, null-
    filling each batch's missing columns. The oracle replays the same
    column availability on the base table, so a hash match proves the
    merged read neither drops rows nor mis-aligns evolved columns.

    At scale this is how a years-old parquet lake with accreted
    columns stays queryable in place: schema union at the footer
    level, per-file column projection, no rewrite of old data.
    """
    out = _export_dir(sf_dir, "orders_evolved")
    o = table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(out, "v1"))
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(out, "v2"))
    evolved = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "v1"), os.path.join(out, "v2")
    )
    return (
        evolved.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_totalprice").alias("n_with_price"),
            (
                F.sum(
                    F.round(F.coalesce(F.col("o_totalprice"), F.lit(0.0)) * 100).cast(
                        "long"
                    )
                ).cast("double")
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy(F.col("pri").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# S10 (engine extension): corrupt-record-tolerant ingestion —
# PERMISSIVE JSON parsing with a _corrupt_record audit column.
# ---------------------------------------------------------------------------

_CORRUPT_EVERY = 10  # deterministic corruption: every 10th record


_Q_CORRUPT_ORACLE = f"""
SELECT
  CASE WHEN o_orderkey % {_CORRUPT_EVERY} = 0 THEN 'corrupt' ELSE 'valid' END
    AS record_class,
  COUNT(*) AS n_records,
  CAST(SUM(CASE WHEN o_orderkey % {_CORRUPT_EVERY} <> 0
       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE)
    / 100.0 AS parsed_price
FROM orders
GROUP BY record_class
ORDER BY record_class
"""


@query("r46_corrupt_records", oracle=_Q_CORRUPT_ORACLE, tags=("S10", "sources"))
def r46_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record-tolerant ingestion: a JSONL export with every
    10th line deterministically truncated mid-object is read back in
    PERMISSIVE mode with a ``_corrupt_record`` column; the query
    audits valid vs corrupt counts and the price total parsed from
    the surviving rows. The oracle replays the corruption rule on the
    base table, so a hash match proves (a) bad lines never abort the
    scan, (b) bad lines never leak values into typed columns, and (c)
    every good line survives.

    At 100 TB this is the difference between an ingest job that dies
    at hour 9 on one bad record and one that lands with an audit
    trail. PERMISSIVE is a per-record map-side classification — no
    extra pass, no shuffle.
    """
    out = _export_dir(sf_dir, "orders_corrupt_jsonl")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # Deterministic corruption at export: truncate every 10th line.
    corrupted = o.select(
        F.when(
            F.col("o_orderkey") % _CORRUPT_EVERY == 0,
            F.substring(F.to_json(F.struct("o_orderkey", "o_totalprice")), 1, 9),
        )
        .otherwise(F.to_json(F.struct("o_orderkey", "o_totalprice", "o_orderpriority")))
        .alias("value")
    )
    corrupted.write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema(
            "o_orderkey long, o_totalprice double, o_orderpriority string, "
            "_corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        parsed.select(
            F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
            .otherwise("valid")
            .alias("record_class"),
            F.coalesce(
                F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(0)
            ).alias("cents"),
        )
        .groupBy("record_class")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            (F.sum("cents").cast("double") / 100.0).alias("parsed_price"),
        )
        .orderBy("record_class")
    )
