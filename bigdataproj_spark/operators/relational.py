"""Relational core: scan → filter → project → aggregate → sort → limit.

Covers SURVEY.md §2.2 rows S1, P1-P3, A1-A8, O1-O3, Q1. The reference
delegates all of its analytics to Elasticsearch (reference
README.md:102-104); this module provides that query layer natively on
Catalyst. Every query follows the determinism contract (§2.4): exact
DECIMAL arithmetic for double aggregates, total-order ORDER BY,
identical aliases in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import register_views, table
from ..functions import cents, dec, dsum, fmt_ts, isum_expr
from ..registry import query

# ---------------------------------------------------------------------------
# A1 hash aggregate / P2 filter / S1 scan / O1 sort — the flagship query.
# ---------------------------------------------------------------------------

_Q51_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice)
    AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q51_ORACLE, tags=("bench", "A1", "P2", "S1", "O1"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (SURVEY.md §7 M1).

    Plan shape at scale: parquet scan with pushed timestamp filter →
    partial hash aggregate (map-side combine) → single shuffle on the
    2-value group key → final aggregate. No other exchange.

    Money arithmetic on the int64 fixed-point kernel (functions.isum):
    price*(1-disc) in cents x hundredths = exact 4-decimal int,
    *(1+tax) = exact 6-decimal int; every per-row product < 2^34 and
    the fixture-scale sums < 2^53, so each final /10^k division is
    correctly rounded to the same double the DECIMAL oracle produces —
    while the whole aggregate stays in codegen'd primitive longs (~3x
    faster than the BigDecimal path it replaced, proven bit-equal).

    The four cents() quantizations and two products are FUSED into one
    pre-aggregation projection, so each source column is floor'd once
    per row and the eight aggregates consume plain long columns —
    inlining the expressions into the agg list instead makes the
    partial-aggregate evaluator re-derive them per aggregate (measured
    0.92 s → 0.72 s at sf5, bit-equal).
    """
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
    )
    q_i, p_i = cents("l_quantity"), cents("l_extendedprice")
    d_i, t_i = cents("l_discount"), cents("l_tax")
    dp_i = p_i * (100 - d_i)
    pre = l.select(
        "l_returnflag",
        "l_linestatus",
        q_i.alias("q_i"),
        p_i.alias("p_i"),
        d_i.alias("d_i"),
        dp_i.alias("dp_i"),
        (dp_i * (100 + t_i)).alias("ch_i"),
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            isum_expr(F.col("q_i"), 100).alias("sum_qty"),
            isum_expr(F.col("p_i"), 100).alias("sum_base_price"),
            isum_expr(F.col("dp_i"), 10_000).alias("sum_disc_price"),
            isum_expr(F.col("ch_i"), 1_000_000).alias("sum_charge"),
            (isum_expr(F.col("q_i"), 100) / F.count("q_i")).alias("avg_qty"),
            (isum_expr(F.col("p_i"), 100) / F.count("p_i")).alias("avg_price"),
            (isum_expr(F.col("d_i"), 100) / F.count("d_i")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A3 global aggregate (no grouping keys).
# ---------------------------------------------------------------------------

_Q52_ORACLE = """
SELECT
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
  MIN(o_totalprice) AS min_total,
  MAX(o_totalprice) AS max_total,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
"""


@query("r08_global_agg", oracle=_Q52_ORACLE, tags=("A3",))
def r08_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (grouping-key-free) aggregate; partial+final automatic."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# A2 distinct aggregates.
# ---------------------------------------------------------------------------

_Q53_ORACLE = """
SELECT
  o_orderstatus,
  COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_total,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("r16_distinct_agg", oracle=_Q53_ORACLE, tags=("A2",))
def r16_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) and SUM(DISTINCT) per group (Expand-based plan)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum_distinct(dec("o_totalprice")).cast("double").alias("sum_distinct_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# A4 grouping sets: rollup & cube.
# ---------------------------------------------------------------------------

_Q54_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


@query("r17_rollup_agg", oracle=_Q54_ORACLE, tags=("A4",))
def r17_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with explicit null ordering."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_Q55_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


@query("r09_cube_agg", oracle=_Q55_ORACLE, tags=("A4",))
def r09_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# A5 dedup: distinct projection + deterministic keyed dedup.
# ---------------------------------------------------------------------------

_Q56_ORACLE = """
SELECT DISTINCT c_nationkey, c_mktsegment
FROM customer
ORDER BY c_nationkey, c_mktsegment
"""


@query("r01_distinct_dedup", oracle=_Q56_ORACLE, tags=("A5",))
def r01_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a full projection (dropDuplicates == DISTINCT)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
        .orderBy("c_nationkey", "c_mktsegment")
    )


_Q57_ORACLE = """
SELECT event_id, user_id, event_type, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


@query("r42_first_per_key", oracle=_Q57_ORACLE, tags=("A5", "O3"))
def r42_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed dedup: first event per (user, type).

    ``dropDuplicates(keys)`` keeps an *arbitrary* row; the engine's
    deterministic form is row_number over a total order = 1. At scale
    this is one shuffle on the partition keys.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", fmt_ts("ts").alias("ts_iso"))
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# A7 percentiles (exact; approx is bounds-checked in pytest, never hashed).
# ---------------------------------------------------------------------------

_Q01_ORACLE = """
SELECT
  l_returnflag,
  round(quantile_cont(l_quantity, 0.25), 6) AS qty_q25,
  round(quantile_cont(l_quantity, 0.50), 6) AS qty_q50,
  round(quantile_cont(l_quantity, 0.75), 6) AS qty_q75,
  round(median(l_quantity), 6) AS qty_median
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q52_percentiles", oracle=_Q01_ORACLE, tags=("A7",))
def q52_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) + median, round-6 guarded.

    Quartiles are emitted as three scalar columns (not an array) so the
    result survives the driver's pandas-based canonicalizer, which cannot
    sort rows containing numpy arrays (VERDICT.md round 1, item 1).
    """
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_q25"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("qty_q50"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_q75"),
            F.round(F.median("l_quantity"), 6).alias("qty_median"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A8 collect_list / collect_set (order-normalized per §2.4 rule 4).
# ---------------------------------------------------------------------------

_Q02_ORACLE = """
SELECT
  c_nationkey,
  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
  COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("q53_collect_list_set", oracle=_Q02_ORACLE, tags=("A8",))
def q53_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list with array_sort normalization.

    The sorted arrays are serialized with ``array_join`` (Spark) /
    ``array_to_string`` (DuckDB) in the final projection — the driver's
    canonicalizer sorts rows via pandas and cannot hash numpy arrays
    (VERDICT.md round 1, item 1). Semantics unchanged: §2.4 rule 4
    (order-normalize collections) still applies before serialization.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("custkeys"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# O1/O2 global sort + limit/offset.
# ---------------------------------------------------------------------------

_Q58_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 100
"""


@query("q51_limit_offset", oracle=_Q58_ORACLE, tags=("O1", "O2"))
def q51_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with LIMIT/OFFSET pagination.

    Plan: Spark turns global sort+limit into TakeOrderedAndProject —
    per-partition top-(offset+limit), then a single-driver merge of k
    rows, never a full global sort.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# P1/P2 projection, computed/renamed columns, null-safe predicates.
# ---------------------------------------------------------------------------

_Q59_ORACLE = """
SELECT
  c_custkey,
  upper(c_name) AS name_upper,
  c_acctbal + 100.0 AS bal_plus,
  (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS is_building
FROM customer
WHERE (c_acctbal > 5000.0 OR c_mktsegment = 'MACHINERY') AND c_nationkey IS NOT NULL
ORDER BY c_custkey
"""


@query("r23_proj_filter", oracle=_Q59_ORACLE, tags=("P1", "P2"))
def r23_proj_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection/rename/computed columns + disjunctive & null-safe filter."""
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(
            ((F.col("c_acctbal") > 5000.0) | (F.col("c_mktsegment") == "MACHINERY"))
            & F.col("c_nationkey").isNotNull()
        )
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            (F.col("c_acctbal") + F.lit(100.0)).alias("bal_plus"),
            F.col("c_mktsegment").eqNullSafe("BUILDING").alias("is_building"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# P3 struct build + nested access (reference `Space` object surface,
# README.md:84-86 — plain structs, no custom type; SURVEY.md §1.2).
# ---------------------------------------------------------------------------

_Q60_ORACLE = """
WITH s AS (
  SELECT struct_pack(name := c_name, bal := c_acctbal, seg := c_mktsegment) AS info,
         c_custkey
  FROM customer
)
SELECT
  c_custkey,
  struct_extract(info, 'name') AS info_name,
  struct_extract(info, 'bal') AS info_bal,
  struct_extract(info, 'seg') AS info_seg
FROM s
ORDER BY c_custkey
"""


@query("r22_struct_nested", oracle=_Q60_ORACLE, tags=("P3",))
def r22_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct column, then project nested fields back out."""
    c = table(spark, sf_dir, "customer")
    s = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        ).alias("info"),
    )
    return s.select(
        "c_custkey",
        F.col("info.name").alias("info_name"),
        F.col("info.bal").alias("info_bal"),
        F.col("info.seg").alias("info_seg"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Q1 subqueries (scalar + correlated EXISTS) through the SQL entry point.
# ---------------------------------------------------------------------------

_Q61_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer
)
ORDER BY c_custkey
"""


@query("r18_scalar_subquery", oracle=_Q61_ORACLE, tags=("Q1",))
def r18_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (above-average account balance); E1 SQL entry point."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM customer
        )
        ORDER BY c_custkey
        """
    )


_Q62_ORACLE = """
SELECT o.o_orderkey, o.o_orderpriority
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0
)
AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
ORDER BY o.o_orderkey
"""


@query("r10_exists_subquery", oracle=_Q62_ORACLE, tags=("Q1",))
def r10_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + IN list; Catalyst decorrelates to a semi join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_orderpriority
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0
        )
        AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        ORDER BY o.o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# A6 approx_count_distinct — never hash-compared (different sketch impls);
# driver records rows-only, pytest bounds-checks vs the exact count.
# ---------------------------------------------------------------------------


@query("r25_approx_percentiles", oracle=None, tags=("A7", "approx"))
def r25_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped approximate percentiles via the QuantileSummaries
    sketch (Greenwald-Khanna variant) — the mergeable-sketch path for
    quantiles at 100 TB, where the exact sort-based percentile is a
    full shuffle of the column. Rank error is bounded by
    count/accuracy; tests/test_approx.py pins the estimate between
    the neighboring exact percentiles (rows-only driver check by
    design — no cross-engine sketch twin exists)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
            F.percentile_approx("l_extendedprice", 0.95, 1000).alias("approx_p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query("r26_approx_count_distinct", oracle=None, tags=("A6", "approx"))
def r26_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct count per event_type."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A9 pivot / unpivot (wide ↔ long reshaping). The reference's dashboard
# layer renders per-sentiment counts in wide form (reference
# README.md:102-104, Kibana); pivot is the engine-native equivalent.
# ---------------------------------------------------------------------------

_Q65_ORACLE = """
SELECT
  l_returnflag,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (l_linestatus = 'F') AS DOUBLE)
    AS qty_F,
  COUNT(*) FILTER (l_linestatus = 'F') AS n_F,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (l_linestatus = 'O') AS DOUBLE)
    AS qty_O,
  COUNT(*) FILTER (l_linestatus = 'O') AS n_O
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("r24_pivot", oracle=_Q65_ORACLE, tags=("A9",))
def r24_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (wide form), two measures per value.

    The pivot value list is explicit — at scale this skips the extra
    distinct-values job AND keeps the output schema static; the plan
    is a single hash aggregate on l_returnflag (no Expand, no second
    shuffle).
    """
    l = table(spark, sf_dir, "lineitem")
    wide = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dsum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # Coalesce to the oracle's COUNT(*) FILTER semantics: Spark's
    # pivot yields NULL for an absent (flag, status) combination where
    # a filtered count yields 0 (the fixture populates all six combos,
    # but TPC-H-faithful data does not — A/R never pair with O).
    return wide.select(
        "l_returnflag",
        F.coalesce("F_qty", F.lit(0.0)).alias("qty_F"),
        F.coalesce("F_n", F.lit(0)).alias("n_F"),
        F.coalesce("O_qty", F.lit(0.0)).alias("qty_O"),
        F.coalesce("O_n", F.lit(0)).alias("n_O"),
    ).orderBy("l_returnflag")


_Q66_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_linestatus IN ('F', 'O')
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("r02_unpivot", oracle=_Q66_ORACLE, tags=("A9",))
def r02_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the wide pivot back to long form.

    Round-trips r48's wide frame through ``DataFrame.unpivot``; the
    oracle is the direct two-key GROUP BY the round-trip must equal.
    Unpivot is a zero-shuffle Expand over the (tiny) aggregated frame.
    """
    l = table(spark, sf_dir, "lineitem")
    wide = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity").alias("qty"))
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["F", "O"],
            variableColumnName="l_linestatus",
            valueColumnName="sum_qty",
        )
        .filter(F.col("sum_qty").isNotNull())
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A4 arbitrary grouping sets (beyond rollup/cube) + GROUPING() markers.
# ---------------------------------------------------------------------------

_Q67_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) AS g_rf,
  GROUPING(l_linestatus) AS g_ls,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


@query("r49_grouping_sets", oracle=_Q67_ORACLE, tags=("A4",))
def r49_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS with GROUPING() null-vs-group markers —
    the grouping-set shapes rollup/cube can't express (two disjoint
    single-column sets + grand total, one Expand pass, one shuffle)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          GROUPING(l_returnflag) AS g_rf,
          GROUPING(l_linestatus) AS g_ls,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )
