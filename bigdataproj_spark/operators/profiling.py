"""Single-pass column profiling (data-quality summary).

Any pipeline feeding a 100 TB corpus needs cheap dataset profiling —
per-column null rates, cardinalities, ranges — before and after every
transform. The reference gets this for free from Kibana over its
Elasticsearch index (reference README.md:102-104); the engine
provides it natively as ONE scan:

every per-column statistic is an independent aggregate expression in
a single global ``agg`` (Catalyst fuses them into one partial+final
hash aggregate → one job, one pass over the data, no per-column
scans), and the wide 1-row result is reshaped to the conventional
one-row-per-column layout with a zero-shuffle ``unpivot`` on the
driver-sized frame.

Numeric min/max are serialized through DECIMAL(12,2) and timestamps
through ISO strftime so the VARCHAR rendering is bit-identical across
engines (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# (column, kind) — kind picks the min/max serialization.
_PROFILE_COLS = (
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_shipdate", "ts"),
)


def _render(c: Column, kind: str) -> Column:
    if kind == "num":
        return c.cast("decimal(12,2)").cast("string")
    if kind == "ts":
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
    return c.cast("string")


def profile(df: DataFrame, cols=_PROFILE_COLS) -> DataFrame:
    """Two-pass profile → (column, n_rows, n_nulls, n_distinct, min, max).

    Two single-pass aggregates on purpose (round 12, guide §1.2):
    mixing N countDistinct with non-distinct aggregates in ONE agg
    makes Catalyst's RewriteDistinctAggregates EXPAND every input row
    (N+1) ways and drag all the plain aggregates through the widened
    stream — measured 5.9 s at sf0.1 where the split costs 1.0 s
    (distinct pass) + 0.5 s (plain pass). The two 1-row results
    recombine with a broadcast join; values are identical by
    construction (same expressions, same scan)."""
    nd_aggs, d_aggs = [], []
    for name, kind in cols:
        c = F.col(name)
        nd_aggs += [
            F.count(F.lit(1)).alias(f"{name}__rows"),
            F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"),
            _render(F.min(c), kind).alias(f"{name}__min"),
            _render(F.max(c), kind).alias(f"{name}__max"),
        ]
        d_aggs.append(F.countDistinct(c).alias(f"{name}__distinct"))
    wide = df.agg(*nd_aggs).crossJoin(F.broadcast(df.agg(*d_aggs)))
    per_col = [
        F.struct(
            F.lit(name).alias("col_name"),
            F.col(f"{name}__rows").alias("n_rows"),
            F.col(f"{name}__nulls").alias("n_nulls"),
            F.col(f"{name}__distinct").alias("n_distinct"),
            F.col(f"{name}__min").alias("min_value"),
            F.col(f"{name}__max").alias("max_value"),
        )
        for name, _ in cols
    ]
    long = wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
    return long


def _oracle_block(name: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(CAST(MIN({name}) AS DECIMAL(12,2)) AS VARCHAR)"
        mx = f"CAST(CAST(MAX({name}) AS DECIMAL(12,2)) AS VARCHAR)"
    elif kind == "ts":
        mn = f"strftime(MIN({name}), '%Y-%m-%dT%H:%M:%S')"
        mx = f"strftime(MAX({name}), '%Y-%m-%dT%H:%M:%S')"
    else:
        mn = f"CAST(MIN({name}) AS VARCHAR)"
        mx = f"CAST(MAX({name}) AS VARCHAR)"
    return f"""
  SELECT
    '{name}' AS col_name,
    COUNT(*) AS n_rows,
    CAST(SUM(CAST({name} IS NULL AS BIGINT)) AS BIGINT) AS n_nulls,
    COUNT(DISTINCT {name}) AS n_distinct,
    {mn} AS min_value,
    {mx} AS max_value
  FROM lineitem"""


_Q46_ORACLE = (
    "\nUNION ALL BY NAME\n".join(_oracle_block(n, k) for n, k in _PROFILE_COLS)
    + "\nORDER BY col_name"
)


@query("r145_column_profile", oracle=_Q46_ORACLE, tags=("L10", "profiling"))
def r145_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass lineitem profile: rows/nulls/distincts/min/max per column.

    The DuckDB oracle is written as per-column UNION ALL for clarity;
    the engine side is the single fused aggregate — same answer, one
    scan instead of five.
    """
    return profile(table(spark, sf_dir, "lineitem")).orderBy("col_name")
