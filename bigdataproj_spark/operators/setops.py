"""Set operations (SURVEY.md §2.2 rows T1-T3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_Q92_ORACLE = """
WITH u AS (
  SELECT c_nationkey AS k FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
)
SELECT k, COUNT(*) AS n
FROM u
GROUP BY k
ORDER BY k
"""


@query("r35_union_all", oracle=_Q92_ORACLE, tags=("T1",))
def r35_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two keyed projections, then re-aggregated."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (
        c.unionByName(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


_Q93_ORACLE = """
SELECT 'both' AS op, k FROM (
  SELECT c_nationkey AS k FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'cust_only' AS op, k FROM (
  SELECT c_nationkey AS k FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
ORDER BY op, k
"""


@query("r60_intersect_except", oracle=_Q93_ORACLE, tags=("T2", "T3"))
def r60_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct semantics) over nation keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).withColumn("op", F.lit("both"))
    cust_only = c.subtract(s).withColumn("op", F.lit("cust_only"))
    return both.unionByName(cust_only).select("op", "k").orderBy("op", "k")


_Q94_ORACLE = """
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O')
SELECT 'intersect_all' AS op, p, COUNT(*) AS n
FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
GROUP BY p
UNION ALL
SELECT 'except_all' AS op, p, COUNT(*) AS n
FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
GROUP BY p
ORDER BY op, p
"""


@query("r05_multiset_ops", oracle=_Q94_ORACLE, tags=("T2", "T3"))
def r05_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL multiset semantics, re-aggregated so
    the (duplicated) result rows stay order-insensitive."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("p"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("p"))
    inter = (
        a.intersectAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    exc = (
        a.exceptAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return inter.unionByName(exc).select("op", "p", "n").orderBy("op", "p")
