"""Join operators (SURVEY.md §2.2 rows J1-J7).

The reference declares no joins of its own — its query layer was
delegated to Elasticsearch (reference README.md:102-104). This module
provides the native join surface, with the scale rules of SURVEY.md §4:
dimension tables broadcast explicitly (J4), fact-fact joins shuffle on
their keys and lean on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cents, dec, isum_expr
from ..registry import query

# ---------------------------------------------------------------------------
# J1 inner equi-join + J4 broadcast — star-schema revenue rollup.
# ---------------------------------------------------------------------------

_Q77_ORACLE = """
SELECT
  r_name,
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@query("q26_star_join_revenue", oracle=_Q77_ORACLE, tags=("bench", "J1", "J4", "A1"))
def q26_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region/nation across the full star schema.

    Plan shape at scale: the partial aggregation is pushed BELOW the
    fact-fact join — lineitem pre-aggregates to one slim
    (orderkey, revenue, count) row per order (map-side combine
    collapses the ~4 items/order before the network), while the star
    arm resolves map-only on the orders side (customer/nation/region
    broadcast). The only shuffle join is then slim-agg ⋈ slim-dims on
    orderkey, and both sides shuffle a fraction of the raw fact bytes.
    Catalyst doesn't do this rewrite itself; measured 1.23 s → 0.85 s
    at sf1, bit-equal.

    The dims side carries an explicit SHUFFLE_HASH hint: a fact table
    must never broadcast (at cluster scale it can't; at fixture scale
    orders sneaks under autoBroadcastJoinThreshold and the driver-side
    hash build of the whole table costs more than the shuffle it saves).
    Hash beats sort-merge here because the build side's per-partition
    slice fits executor memory at any scale once partitioned on
    orderkey, and it skips both sorts.
    """
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    # int64 fixed-point revenue (see functions.isum): exact 4-decimal
    # integer per row, codegen'd primitive arithmetic, bit-equal to the
    # DECIMAL-formulated oracle (partial int sums re-sum exactly).
    revenue = cents("l_extendedprice") * (100 - cents("l_discount"))
    agg_l = l.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev_i"), F.count(F.lit(1)).alias("cnt")
    )
    dims = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "r_name", "n_name")
    )
    return (
        agg_l.join(dims.hint("shuffle_hash"), agg_l.l_orderkey == dims.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            isum_expr(F.col("rev_i"), 10_000).alias("revenue"),
            F.sum("cnt").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# J2 left outer join — customers with (possibly zero) orders.
# ---------------------------------------------------------------------------

_Q78_ORACLE = """
SELECT
  c.c_custkey,
  COUNT(o.o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS sum_total
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""


@query("r30_left_outer_join", oracle=_Q78_ORACLE, tags=("J2", "A1"))
def r30_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J2 full outer join — nation coverage of customers vs suppliers.
# ---------------------------------------------------------------------------

_Q79_ORACLE = """
WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT
  COALESCE(cn.k, sn.k) AS nationkey,
  COALESCE(n_cust, 0) AS n_cust,
  COALESCE(n_supp, 0) AS n_supp
FROM cn
FULL OUTER JOIN sn ON cn.k = sn.k
ORDER BY nationkey
"""


@query("r03_full_outer_join", oracle=_Q79_ORACLE, tags=("J2",))
def r03_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cn.join(sn, "k", "full")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# J3 left semi / left anti joins.
# ---------------------------------------------------------------------------

_Q80_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
SEMI JOIN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON c_custkey = o.o_custkey
ORDER BY c_custkey
"""


@query("r31_semi_join", oracle=_Q80_ORACLE, tags=("J3",))
def r31_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one urgent order (left semi)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_Q81_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
ANTI JOIN orders ON c_custkey = o_custkey
ORDER BY c_custkey
"""


@query("r06_anti_join", oracle=_Q81_ORACLE, tags=("J3",))
def r06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (left anti)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J5 theta join (equi key + non-equi predicate).
# ---------------------------------------------------------------------------

_Q82_ORACLE = """
SELECT s.s_suppkey, COUNT(*) AS n_richer
FROM supplier s
JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
GROUP BY s.s_suppkey
ORDER BY s.s_suppkey
"""


@query("r27_theta_join", oracle=_Q82_ORACLE, tags=("J5",))
def r27_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: same-nation customers with a smaller balance.

    The equi key keeps this a hash join; the inequality rides along as
    a post-join predicate (Catalyst extracts it automatically).
    """
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# J6 cross join.
# ---------------------------------------------------------------------------

_Q83_ORACLE = """
SELECT r_name, seg
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
ORDER BY r_name, seg
"""


@query("r19_cross_join", oracle=_Q83_ORACLE, tags=("J6",))
def r19_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dimension projections."""
    r = table(spark, sf_dir, "region")
    segs = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return r.crossJoin(segs).select("r_name", "seg").orderBy("r_name", "seg")


# ---------------------------------------------------------------------------
# J7 range / interval join.
# ---------------------------------------------------------------------------

_Q84_ORACLE = """
SELECT e1.user_id, COUNT(*) AS n_pairs
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
GROUP BY e1.user_id
ORDER BY e1.user_id
"""


@query("r32_range_join", oracle=_Q84_ORACLE, tags=("J7",))
def r32_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs within a 5-minute forward window per user.

    Equi key (user_id) bounds the blow-up; at 100 TB this would add a
    coarse time-bucket equi key to keep per-task pair counts bounded.
    """
    e1 = table(spark, sf_dir, "events").alias("e1")
    e2 = table(spark, sf_dir, "events").alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# J9 / Q1 LATERAL correlated subquery join (per-row top-k lookup).
# ---------------------------------------------------------------------------

_Q85_ORACLE = """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
ORDER BY n.n_name, t.o_totalprice DESC, t.o_orderkey
"""


@query("r57_lateral_topk", oracle=_Q85_ORACLE, tags=("Q1", "J9", "O3"))
def r57_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per nation via a LATERAL correlated subquery —
    the per-row-subquery surface (Spark 3.4+ SQL). Catalyst
    decorrelates it into the same window-rank plan as q47; the SQL
    form is what users port from warehouse dialects.
    """
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM nation n,
        LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
        ORDER BY n.n_name, t.o_totalprice DESC, t.o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# M1 upsert / merge (SCD-1): base ⟗ changes → new snapshot.
# ---------------------------------------------------------------------------

_Q49_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice, 'updated' AS op
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'inserted' AS op
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT
  COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
  COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
  COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
  COALESCE(c.op, 'unchanged') AS op
FROM orders b
FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
ORDER BY o_orderkey
"""


@query("r82_upsert_merge", oracle=_Q49_ORACLE, tags=("M1", "J2"))
def r82_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on plain parquet (SCD type 1): a change
    set (updates to existing keys + inserts of new keys) merged into
    the base by full outer join + change-side-wins coalesce.

    This is the table-format-free form of ``MERGE INTO``: at scale
    both sides shuffle once on the merge key (or zero times if the
    base is bucketed on it — tests/test_bucketing.py), and the output
    is the next immutable snapshot. The change set here is derived
    deterministically from the base itself so the oracle can replay
    it.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.lit("updated").alias("op"),
    )
    inserts = o.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("inserted").alias("op"),
    )
    changes = updates.unionByName(inserts)
    b = o.alias("b")
    c = changes.alias("c")
    return (
        b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .select(
            F.coalesce("c.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
            F.coalesce("c.o_custkey", "b.o_custkey").alias("o_custkey"),
            F.coalesce("c.o_totalprice", "b.o_totalprice").alias("o_totalprice"),
            F.coalesce("c.op", F.lit("unchanged")).alias("op"),
        )
        .orderBy("o_orderkey")
    )
