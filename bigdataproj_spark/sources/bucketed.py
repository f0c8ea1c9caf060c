"""S11 (engine extension): bucketed table layout — ``bucketBy/sortBy``
plus derived fixed-point columns at write time, shuffle-free and
decode-free star queries at read time.

The reference's README promises a query layer over pre-indexed data
(reference README.md:102-104 — Elasticsearch holds the enriched
records so queries never re-shard); the Spark-native equivalent for
JOIN-heavy workloads is bucketing: the shuffle a fact-fact join would
pay on every query is paid ONCE, at rest. Two tables bucketed on the
join key with the same bucket count co-locate matching keys in
matching files, so the join (and any aggregation on the bucket key)
runs with ZERO Exchange nodes — asserted on real saved tables in
tests/test_bucketing.py and tests/test_plans.py, not claimed in prose.

The second at-rest lever (round 5): the layout write also MATERIALIZES
the engine's int64 fixed-point money columns (functions.cents — qty,
price, disc, tax in hundredths, plus the price*(1-disc) and
*(1+tax) products). The per-tuple quantize/multiply work that
dominates the residual q01/q39 cost (docs/BENCHMARKS.md decomposition:
bare scan+count ≈ DuckDB's whole query) moves to the one-time deploy
write; queries over the layout read plain long columns and aggregate.
Bit-exactness is free — it is the SAME arithmetic, executed at write
instead of per query — so the oracle contract is unchanged.

At 100 TB this is the difference between re-shuffling ~40 TB of
lineitem per star query and reading co-located buckets: the layout
write is the deploy-time cost, every subsequent query is exchange-free
on the spine. Bucket count rule of thumb: total_bytes / target
(e.g. 256 MiB) rounded to a multiple of the executor-core count; the
fixture layout uses 32 (= the local[32] lane count).

Layout builds are memoized per (session, sf_dir, n_buckets): the write
happens once (the "deploy" step), every query against the layout
reuses the registered tables — mirroring production, where the layout
exists before the query arrives. Table names and warehouse paths
encode BOTH the fixture-dir tag and the bucket count (two layouts of
the same data coexist), and the warehouse root is process-scoped via
``catalog.pid_scratch`` so concurrent pytest/bench drivers never race
one directory.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import pid_scratch, scratch_tag, table
from ..functions import cents, isum_expr
from ..registry import query

_N_BUCKETS = 32
_WH_ROOT = os.path.join(tempfile.gettempdir(), "bigdataproj_bucketed_wh")


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_key: str,
    n_buckets: int = _N_BUCKETS,
) -> None:
    """Write ``df`` as an external bucketed+sorted table.

    ``sortBy`` on the bucket key makes every bucket file
    internally sorted, so a downstream sort-merge join needs neither
    an exchange nor a sort. Spark records the bucket spec in the
    session catalog; readers must go through ``spark.table(name)``
    (a plain ``read.parquet`` of the directory would lose the spec).
    """
    (
        df.write.bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def _lineitem_with_derived(li: DataFrame) -> DataFrame:
    """The lineitem projection the layout stores: every source column
    plus the int64 fixed-point money columns (and their products) the
    engine's aggregates consume. Same arithmetic as functions.cents /
    q01's fused projection — moved from query time to write time."""
    q_i, p_i = cents("l_quantity"), cents("l_extendedprice")
    d_i, t_i = cents("l_discount"), cents("l_tax")
    rev_i = p_i * (100 - d_i)
    return li.select(
        "*",
        q_i.alias("l_qty_i"),
        p_i.alias("l_price_i"),
        d_i.alias("l_disc_i"),
        t_i.alias("l_tax_i"),
        rev_i.alias("l_rev_i"),
        (rev_i * (100 + t_i)).alias("l_charge_i"),
    )


def bucketed_fact_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = _N_BUCKETS
) -> tuple[str, str]:
    """Deploy the bucketed layout for the lineitem/orders join spine
    (once per session+sf_dir+bucket-count; memoized) and return the
    table names.

    Both facts bucket on the order key — the key every TPC-H-shaped
    star query joins on — so the spine join is exchange-free. The
    lineitem table carries the derived fixed-point columns (see
    :func:`_lineitem_with_derived`).

    The warehouse path is scoped per process (``pid_scratch``: cleaned
    at interpreter exit, so concurrent pytest and bench drivers each
    own their tree) and per bucket count (two layouts coexist); a
    cluster deployment runs the layout write once as a deploy step
    into the shared warehouse, not per session.
    """
    tag = re.sub(r"[^A-Za-z0-9_]", "_", scratch_tag(sf_dir))
    li_name = f"lineitem_bkt_{tag}_{n_buckets}"
    od_name = f"orders_bkt_{tag}_{n_buckets}"
    memo: dict[tuple[str, int], tuple[str, str]] = spark.__dict__.setdefault(
        "_bdp_bucketed_memo", {}
    )
    key = (sf_dir, n_buckets)
    if key in memo:
        return memo[key]
    wh = os.path.join(pid_scratch(_WH_ROOT), tag)
    write_bucketed(
        _lineitem_with_derived(table(spark, sf_dir, "lineitem")),
        li_name,
        os.path.join(wh, li_name),
        "l_orderkey",
        n_buckets,
    )
    write_bucketed(
        table(spark, sf_dir, "orders"),
        od_name,
        os.path.join(wh, od_name),
        "o_orderkey",
        n_buckets,
    )
    memo[key] = (li_name, od_name)
    return memo[key]


# Same result contract as q26_star_join_revenue (operators/joins.py) —
# bucketing is a physical property, the answer is bit-identical.
_BUCKETED_STAR_ORACLE = """
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


@query(
    "q39_bucketed_star_join",
    oracle=_BUCKETED_STAR_ORACLE,
    tags=("bench", "S11", "J1", "J4", "A1"),
)
def q39_bucketed_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q26 star-schema revenue rollup over the BUCKETED layout:
    bit-identical answer, zero exchanges on the fact spine, and the
    revenue term read as a stored int64 column (``l_rev_i``,
    materialized by the layout write) instead of decoded per tuple.

    Plan shape: orders resolves its star arm map-only (dims
    broadcast, bucketing preserved through the broadcast joins); the
    fact-fact join is a ShuffledHashJoin whose "shuffle" is satisfied
    by the two matching bucket specs — NO exchange, no sorts — and
    the lineitem rows flow straight into a 25-group partial
    aggregate, so the only exchange in the whole plan is 25 rows per
    task for the final rollup. Compare q26_star_join_revenue, whose
    identical logical plan pays two orderkey shuffles plus the
    per-tuple quantize/multiply this layout precomputes.

    Two consequences of the layout, both A/B-measured at sf5
    (docs/BENCHMARKS.md): (a) q26's pre-aggregation-below-the-join
    rewrite is NOT used here — that rewrite exists to slim shuffle
    bytes, and with no shuffle it only adds a 7.5M-group hash
    aggregate (1.75 s vs 1.62 s); (b) the shuffle_hash hint wins over
    sort-merge because the aggregate side loses its sort order anyway
    (1.62 s vs 1.85 s, SMJ re-sorts both sides). Asserted
    exchange-free in tests/test_plans.py.
    """
    li_name, od_name = bucketed_fact_tables(spark, sf_dir)
    l = spark.table(li_name).select("l_orderkey", "l_rev_i")
    o = spark.table(od_name)
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    dims = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "r_name", "n_name")
    )
    return (
        l.join(dims.hint("shuffle_hash"), l.l_orderkey == dims.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            isum_expr(F.col("l_rev_i"), 10_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


# Same result contract as q01_pricing_summary (operators/relational.py)
# — the derived columns hold the same arithmetic, computed at write.
_BUCKETED_PRICING_ORACLE = """
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


@query(
    "r36_bucketed_pricing",
    oracle=_BUCKETED_PRICING_ORACLE,
    tags=("bench", "S11", "A1", "P2", "O1"),
)
def r36_bucketed_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q01's pricing summary over the layout's STORED fixed-point
    columns: the scan reads six long columns + two group keys, the
    filter still pushes down, and the whole per-row quantize/multiply
    pipeline q01 fuses at query time (docstring there) is simply
    absent — it ran once, at the layout write. Bit-identical to the
    q01 oracle by construction (same arithmetic, earlier).

    This is the at-rest answer to q01's residual gap vs an in-cache
    SIMD engine (docs/BENCHMARKS.md decomposition): once scan+count
    is the floor, the only lever left is storing the query's terms.
    Standard warehouse practice (materialized derived columns), and
    on a cluster the same one deploy write serves every subsequent
    pricing query.
    """
    li_name, _ = bucketed_fact_tables(spark, sf_dir)
    pre = (
        spark.table(li_name)
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_qty_i",
            "l_price_i",
            "l_disc_i",
            "l_rev_i",
            "l_charge_i",
        )
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            isum_expr(F.col("l_qty_i"), 100).alias("sum_qty"),
            isum_expr(F.col("l_price_i"), 100).alias("sum_base_price"),
            isum_expr(F.col("l_rev_i"), 10_000).alias("sum_disc_price"),
            isum_expr(F.col("l_charge_i"), 1_000_000).alias("sum_charge"),
            (isum_expr(F.col("l_qty_i"), 100) / F.count("l_qty_i")).alias("avg_qty"),
            (isum_expr(F.col("l_price_i"), 100) / F.count("l_price_i")).alias(
                "avg_price"
            ),
            (isum_expr(F.col("l_disc_i"), 100) / F.count("l_disc_i")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
