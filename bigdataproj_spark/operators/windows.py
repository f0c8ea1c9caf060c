"""Window functions (SURVEY.md §2.2 rows W1-W4, O3).

Scale notes: every window spec here partitions by a bounded key
(priority, user_id) so state per task stays small; ordering keys always
extend to a unique total order (…, event_id) wherever a function's
result depends on intra-peer order (row_number, ntile, lag/lead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import cents, fmt_ts
from ..registry import query

# ---------------------------------------------------------------------------
# W1 ranking functions.
# ---------------------------------------------------------------------------

_Q87_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS orderdate_iso,
  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey) AS rn,
  RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS rk,
  DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS drk,
  NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey) AS quartile
FROM orders
ORDER BY o_orderkey
"""


@query("r33_rank_functions", oracle=_Q87_ORACLE, tags=("W1",))
def r33_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per order priority.

    rank/dense_rank order by the tie-ful date only (their semantics
    absorb ties); row_number/ntile extend the order with the key.
    """
    o = table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        fmt_ts("o_orderdate").alias("orderdate_iso"),
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rk"),
        F.dense_rank().over(w_ties).alias("drk"),
        F.ntile(4).over(w_unique).alias("quartile"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# W2 analytic functions: lag / lead / first / last.
# ---------------------------------------------------------------------------

_Q88_ORACLE = """
SELECT
  event_id,
  user_id,
  value,
  lag(value)  OVER w AS prev_value,
  lead(value) OVER w AS next_value,
  first_value(value) OVER w AS first_value_seen,
  last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    AS last_value_seen
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


@query("r28_lag_lead", oracle=_Q88_ORACLE, tags=("W2",))
def r28_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over each user's event timeline."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w_full).alias("last_value_seen"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# W3/W4 frames: running totals + moving averages (ROWS frames).
# ---------------------------------------------------------------------------

_Q89_ORACLE = """
SELECT
  event_id,
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
  / COUNT(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg4
FROM events
ORDER BY event_id
"""


@query("q38_running_agg", oracle=_Q89_ORACLE, tags=("W3", "W4", "bench"))
def q38_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 4-row moving average per user (ROWS frames),
    decimal-exact so frame summation order cannot matter."""
    e = table(spark, sf_dir, "events")
    ob = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = ob.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = ob.rowsBetween(-3, Window.currentRow)
    # Frame sums on the int64 fixed-point kernel (functions.isum): the
    # per-frame sum is an exact integer, so /100 reproduces the DECIMAL
    # oracle's double bit-for-bit at a fraction of the BigDecimal cost.
    v100 = cents("value")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(v100).over(w_run).cast("double") / 100).alias("running_sum"),
        (
            F.sum(v100).over(w_mov).cast("double") / 100
            / F.count("value").over(w_mov)
        ).alias("moving_avg4"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# W3 RANGE frame over a numeric (epoch-µs) ordering key.
# ---------------------------------------------------------------------------

_Q90_ORACLE = """
SELECT
  event_id,
  user_id,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS n_last_5min
FROM events
ORDER BY event_id
"""


@query("r34_range_frame", oracle=_Q90_ORACLE, tags=("W3",))
def r34_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events in the trailing 5 minutes per user via a RANGE frame on
    epoch microseconds (exact integer arithmetic; ties are peers, so
    the count is order-independent)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_5min"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# O3 top-k per group (window + filter; Spark optimizes the pattern).
# ---------------------------------------------------------------------------

_Q91_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_orderpriority, rn
"""


@query("r07_topk_per_group", oracle=_Q91_ORACLE, tags=("O3",))
def r07_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority.

    Spark rewrites row_number+filter into per-partition top-k
    (WindowGroupLimit) — no full sort of each group at scale.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


# ---------------------------------------------------------------------------
# W1 distribution functions: percent_rank / cume_dist.
# ---------------------------------------------------------------------------

_Q86_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  round(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
    AS pct_rank,
  round(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
    AS cume,
FROM orders
ORDER BY o_orderkey
"""


@query("r04_distribution_functions", oracle=_Q86_ORACLE, tags=("W1",))
def r04_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist per priority by price.

    Both are rank-based ((rank-1)/(n-1), peers_≤/n): integer-derived
    IEEE divisions, so round-6 is bit-stable across engines. Ties
    share values by definition — no unique-order extension needed.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderkey")
