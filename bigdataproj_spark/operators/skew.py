"""Data-distribution helpers (SURVEY.md §7 "100 TB posture"): salting
for hot keys, fan-out for narrow scans.

Salting: AQE's OptimizeSkewedJoin is the first line of defense; the
salting pattern is for when a single key exceeds what one task can
hold even after AQE splits.

Fan-out: a parquet row group is the unsplittable read unit, so a
small file (or a handful of giant row groups) yields fewer scan tasks
than cores and serializes everything above it. ``fan_out`` pays one
tiny shuffle to restore parallelism — and is a structural no-op when
the scan is already wide (the 100 TB case: thousands of row groups).

Both helpers are pure DataFrame compositions; the salted aggregation
is oracle-checked against the plain aggregation (same result by
construction — salting is a physical rewrite, not a semantic one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import dsum
from ..registry import query

DEFAULT_SALT_BUCKETS = 16


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Rebalance a narrow scan before CPU-heavy per-row work.

    Worth an exchange only when per-row compute dominates row width
    (hashing/shingling/regex over short text rows — measured 2x on the
    MinHash shingle stage at sf0.1); for wide rows feeding an
    aggregation, map-side partial aggregation beats the full-row
    shuffle, so don't fan out those. When the scan is already wide
    (``inputFiles() >= cores * multiple`` — the 100 TB case, thousands
    of row groups) this returns the input unchanged, so no exchange
    enters the plan at cluster scale.

    The width probe is ``df.inputFiles()`` (a file-index listing), NOT
    ``df.rdd.getNumPartitions()``: the RDD conversion forces full
    physical planning on the driver for every query build (~100 ms per
    call measured at round 1 — pure plan-time overhead). File count is
    a conservative proxy — a scan of many tiny files can still coalesce
    to fewer partitions than files, but tiny files mean little data, so
    skipping the rebalance there costs nothing material.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


def salted(df: DataFrame, n: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Add a salt column spreading each partition's rows uniformly
    over n buckets. ``monotonically_increasing_id`` already encodes
    the partition id in its high bits (pid << 33), so its low bits
    alone rotate through the buckets within every partition — no
    second partition-id term needed."""
    return df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then (keys).

    Stage 1 shuffles on (key, salt) — a hot key's rows spread over n
    reducers; stage 2 combines the n partials per key. Only works for
    algebraic aggregates (sum/count/min/max); the caller passes stage-1
    aggregate expressions and the helper re-aggregates them with the
    matching combiner.
    """
    stage1 = salted(df, n).groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    combiners = []
    for name, c in aggs.items():
        # sum/count partials re-combine with SUM; min/max with
        # themselves. Anything else (countDistinct, avg, ...) is NOT
        # algebraic over salt buckets — raise instead of silently
        # summing wrong partials.
        op = str(c).lower()
        if op.startswith(("column<'min", "min")):
            combiners.append(F.min(f"_p_{name}").alias(name))
        elif op.startswith(("column<'max", "max")):
            combiners.append(F.max(f"_p_{name}").alias(name))
        elif op.startswith(("column<'sum", "sum", "column<'count(1)", "count(1)")):
            combiners.append(F.sum(f"_p_{name}").alias(name))
        else:
            raise ValueError(
                f"salted_agg only supports algebraic sum/count(1)/min/max "
                f"aggregates; got {c} for {name!r} — a countDistinct/avg "
                f"partial cannot be recombined across salt buckets"
            )
    return stage1.groupBy(*keys).agg(*combiners)


_Q64_ORACLE = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  MIN(l_orderkey) AS min_key,
  MAX(l_orderkey) AS max_key
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("r47_salted_agg", oracle=_Q64_ORACLE, tags=("A1", "skew"))
def r47_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation on a 3-value key (l_returnflag — maximal
    skew: every row is one of three keys).

    The salted two-stage plan must produce EXACTLY the plain groupBy
    answer — the oracle is the plain SQL aggregate, so the hash match
    proves salting is semantics-preserving. The decimal partial sums
    re-combine exactly (decimal addition is associative, unlike
    double).
    """
    li = table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": F.count(F.lit(1)),
            "sum_qty_dec": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
            "min_key": F.min("l_orderkey"),
            "max_key": F.max("l_orderkey"),
        },
    )
    return out.select(
        "l_returnflag",
        "n",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        "min_key",
        "max_key",
    ).orderBy("l_returnflag")
