"""S11 (engine extension): bucketed table layout — ``bucketBy/sortBy``
at write time, shuffle-free fact-fact joins at read time.

The reference's README promises a query layer over pre-indexed data
(reference README.md:102-104 — Elasticsearch holds the enriched
records so queries never re-shard); the Spark-native equivalent for
JOIN-heavy workloads is bucketing: the shuffle a fact-fact join would
pay on every query is paid ONCE, at rest. Two tables bucketed on the
join key with the same bucket count co-locate matching keys in
matching files, so the join (and any aggregation on the bucket key)
runs with ZERO Exchange nodes — asserted on real saved tables in
tests/test_bucketing.py and tests/test_plans.py, not claimed in prose.

At 100 TB this is the difference between re-shuffling ~40 TB of
lineitem per star query and reading co-located buckets: the layout
write is the deploy-time cost, every subsequent query is exchange-free
on the spine. Bucket count rule of thumb: total_bytes / target
(e.g. 256 MiB) rounded to a multiple of the executor-core count; the
fixture layout uses 32 (= the local[32] lane count).

Layout builds are memoized per (session, sf_dir): the write happens
once (the "deploy" step), every query against the layout reuses the
registered tables — mirroring production, where the layout exists
before the query arrives.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import scratch_tag, table
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


def bucketed_fact_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = _N_BUCKETS
) -> tuple[str, str]:
    """Deploy the bucketed layout for the lineitem/orders join spine
    (once per session+sf_dir; memoized) and return the table names.

    Both facts bucket on the order key — the key every TPC-H-shaped
    star query joins on — so the spine join is exchange-free.

    The warehouse path is shared across sessions of one machine
    (mode=overwrite makes rebuilds idempotent); concurrent FIRST
    builds from two processes would race, which is fine for the
    sequential test/driver flows here — a cluster deployment runs
    the layout write once as a deploy step, not per session.
    """
    tag = re.sub(r"[^A-Za-z0-9_]", "_", scratch_tag(sf_dir))
    li_name = f"lineitem_bkt_{tag}"
    od_name = f"orders_bkt_{tag}"
    memo: dict[tuple[str, int], tuple[str, str]] = spark.__dict__.setdefault(
        "_bdp_bucketed_memo", {}
    )
    key = (sf_dir, n_buckets)
    if key in memo:
        return memo[key]
    wh = os.path.join(_WH_ROOT, tag)
    write_bucketed(
        table(spark, sf_dir, "lineitem"),
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
    bit-identical answer, zero exchanges on the fact spine.

    Plan shape: orders resolves its star arm map-only (dims
    broadcast, bucketing preserved through the broadcast joins); the
    fact-fact join is a ShuffledHashJoin whose "shuffle" is satisfied
    by the two matching bucket specs — NO exchange, no sorts — and
    the lineitem rows flow straight into a 25-group partial
    aggregate, so the only exchange in the whole plan is 25 rows per
    task for the final rollup. Compare q26_star_join_revenue, whose
    identical logical plan pays two orderkey shuffles.

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
    l = spark.table(li_name).select("l_orderkey", "l_extendedprice", "l_discount")
    o = spark.table(od_name)
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = cents("l_extendedprice") * (100 - cents("l_discount"))
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
            isum_expr(revenue, 10_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )
