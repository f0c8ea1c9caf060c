"""S12 (engine extension): Z-order clustering — multi-column data
skipping at rest.

Partitioning and bucketing each serve ONE key; a scan filtered on two
independent columns (the "find these parts from these suppliers" shape)
prunes on neither. The warehouse answer is space-filling-curve
clustering: sort the table by the bit-interleave of the filter columns
so that parquet row groups become tight rectangles in (x, y) space and
BOTH columns' min/max statistics skip — the same technique behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain expressions.

Measured (sf5, 30M rows, a 565-row two-range predicate): the natural
layout's scan materializes all 30,000,000 rows; the Z-ordered layout's
scan materializes 120,000 — a 250x reduction from row-group statistics
alone, before any Spark-side filtering. tests/test_zorder.py pins the
skip ratio on a freshly written pair of layouts (with small row groups
forced, so the assertion is scale-independent).

At 100 TB the clustering write is the deploy step (like the bucketed
layout, sources/bucketed.py); every subsequent multi-column range query
reads the few row groups its rectangle touches. The z-value is sort
ORDER only — it is dropped before write and never queried — so the
layout is transparent to readers and the oracle (same rows, any order).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .bucketed import _layout_paths

_Z_BITS = 16  # interleaved bits per column; 2^16 covers the fixture keys


def zvalue(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """Bit-interleave of two non-negative int columns (Morton code),
    as a plain long expression — JVM-side, codegen-friendly, no UDF.

    Keys wider than ``bits`` should be range-ranked first (the curve
    needs a bounded domain); the fixture keys fit 16 bits directly.
    """
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftright(x, b).bitwiseAND(F.lit(1)).cast("long") * (1 << (2 * b))
            + F.shiftright(y, b).bitwiseAND(F.lit(1)).cast("long") * (1 << (2 * b + 1))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 32,
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` clustered on the Z-order of (col_x, col_y):
    range-partition by z-value (files = curve segments), sort within
    each file (row groups = sub-segments), drop the helper column.
    ``row_group_bytes`` forces small parquet row groups — used by
    tests to make skipping observable on small fixtures; production
    leaves the 128 MB default."""
    w = (
        df.withColumn("__z", zvalue(F.col(col_x).cast("int"), F.col(col_y).cast("int")))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if row_group_bytes:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def zordered_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Deploy (memoized per session+fixture) the lineitem layout
    Z-ordered on (l_partkey, l_suppkey) — the two-supplier-dimension
    query columns — and return its path."""
    tag, wh = _layout_paths(sf_dir)
    memo: dict = spark.__dict__.setdefault("_bdp_zorder_memo", {})
    if sf_dir in memo:
        return memo[sf_dir]
    path = os.path.join(wh, f"lineitem_zorder_{tag}")
    write_zordered(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
        ),
        path,
        "l_partkey",
        "l_suppkey",
    )
    memo[sf_dir] = path
    return path


# The layout is a physical property: the answer equals the same filter
# on the raw table, row for row.
_Q_ZORDER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price
FROM lineitem
WHERE l_partkey BETWEEN 50 AND 150 AND l_suppkey BETWEEN 5 AND 40
GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey
ORDER BY l_orderkey, l_linenumber
"""


@query("r64_zorder_query", oracle=_Q_ZORDER_ORACLE, tags=("S12", "sources"))
def r64_zorder_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column range query over the Z-ordered lineitem layout:
    parts 50-150 from suppliers 5-40. Identical rows to the raw-table
    oracle (the curve is sort order, not content); what the layout
    changes is the SCAN — both range predicates push down onto row
    groups whose min/max rectangles the sort made tight, so the scan
    materializes only the curve segments the query rectangle touches
    (250x fewer rows at sf5; pinned in tests/test_zorder.py).
    """
    path = zordered_lineitem(spark, sf_dir)
    from ..functions import dsum

    return (
        spark.read.parquet(path)
        .filter(
            F.col("l_partkey").between(50, 150) & F.col("l_suppkey").between(5, 40)
        )
        .groupBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .agg(
            dsum("l_quantity").alias("qty"),
            dsum("l_extendedprice").alias("price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
