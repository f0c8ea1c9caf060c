"""Measure the round-9 verb costs: MERGE (E1f), the S22 commit
ledger, AS OF reads, and RESTORE — at a given fixture scale.

Usage: python scripts/bench_s22.py [sf_dir]   (default /root/testdata/sf0.1)

Prints one JSON line:
  {"sf_dir": ..., "n_orders": N, "timings": {...}}

What each timing means (all seconds, wall):
- deploy_warehouse: one-time layout deploy (context for the rest)
- insert_batch:     INSERT of 1000 orders through Engine.sql
                    (includes every layout refresh + the commit)
- commit_capture:   the S22 ledger capture alone (state deepcopy +
                    warehouse file walk) — the ONLY cost snapshots
                    add to a committed batch
- merge_upsert:     MERGE matching ~1% of orders (SET *) + 100 new
                    rows, through Engine.sql
- live_profile:     the segment-cube-routed chain-4 profile, live
- asof_profile:     the same profile FOR SYSTEM_VERSION AS OF the
                    pre-merge version (context swap + pinned scans)
- asof_swap:        entering+exiting the as_of context with no query
- restore:          RESTORE TO VERSION AS OF the pre-merge version
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil
    import tempfile

    from bigdataproj_spark.catalog import TABLES, table
    from bigdataproj_spark.engine import Engine
    from bigdataproj_spark.session import get_spark
    from bigdataproj_spark.sources.snapshots import _capture, as_of

    spark = get_spark("bench-s22")
    work = tempfile.mkdtemp(prefix="bench_s22_")
    for t in TABLES:
        table(spark, sf_src, t).write.parquet(os.path.join(work, f"{t}.parquet"))
    eng = Engine(spark, work)
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> object:
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    from bigdataproj_spark.sources.bucketed import (
        bucketed_fact_tables,
        segment_cube_table,
    )
    from bigdataproj_spark.sources.corpus_cubes import docs_stats_cube_table

    timed("deploy_warehouse", lambda: (
        bucketed_fact_tables(spark, work),
        segment_cube_table(spark, work),
        docs_stats_cube_table(spark, work),
    ))
    n_orders = eng.sql(
        "SELECT COUNT(*) AS n FROM orders", routed=False
    ).collect()[0].n

    rows = ", ".join(
        f"({9900000000 + i}, 1, 'O', 99.0, TIMESTAMP '1996-01-01 00:00:00', "
        "'1-URGENT')"
        for i in range(1000)
    )
    timed("insert_batch", lambda: eng.sql(
        f"INSERT INTO orders VALUES {rows}"
    ).collect())
    timed("commit_capture", lambda: _capture(spark, work))
    v_pre_merge = eng.history().collect()[-1].version

    merge = (
        "MERGE INTO orders AS t USING ("
        "  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        "    o_orderdate, '9-MRG' AS o_orderpriority"
        "  FROM orders WHERE o_orderkey % 97 = 0"
        "  UNION ALL"
        "  SELECT CAST(9905000001 AS BIGINT), CAST(1 AS BIGINT), 'O',"
        "    CAST(55.0 AS DOUBLE), TIMESTAMP '1996-01-02 00:00:00', '9-MRG'"
        ") AS s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    timed("merge_upsert", lambda: eng.sql(merge).collect())

    profile = (
        "SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY c_mktsegment, o_orderpriority "
        "ORDER BY c_mktsegment, o_orderpriority"
    )
    timed("live_profile", lambda: eng.sql(profile).collect())
    timed("asof_profile", lambda: eng.sql(
        f"{profile} FOR SYSTEM_VERSION AS OF {v_pre_merge}"
    ).collect())

    def swap_only():
        with as_of(spark, work, v_pre_merge):
            pass

    timed("asof_swap", swap_only)
    # S23 (round 10): the change feed over the insert+merge commits —
    # two pinned-state diffs (exceptAll both ways per commit), the
    # audit-verb price of CDF-from-snapshots
    v_latest = eng.history().collect()[-1].version
    timed("cdf_orders", lambda: eng.table_changes(
        "orders", 0, v_latest
    ).count())
    timed("restore", lambda: eng.sql(
        f"RESTORE TO VERSION AS OF {v_pre_merge}"
    ).collect())
    print(json.dumps({
        "sf_dir": sf_src, "n_orders": n_orders, "timings": timings,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
