"""Attribute the as_of swap cost (r9-VERDICT item 6): where do the
seconds go when entering+exiting a snapshot-read block with no query?

Usage: python scripts/bench_asof_attrib.py [sf_dir]

Components timed per swap (seconds, wall, summed over enter+exit):
- state_copy:   deepcopy of the serving-state dicts both directions
- relation:     building each fact view's relation (current_* —
                file listing and/or pinned file set + parquet footer
                schema reads)
- register:     createOrReplaceTempView
- semantic_hash plan analysis for the ownership identity record
- dims:         corpus dim view re-points

Prints one JSON line with the total and the attribution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil
    import tempfile

    import bigdataproj_spark.sources.snapshots as snap
    from bigdataproj_spark.catalog import TABLES, table
    from bigdataproj_spark.engine import Engine
    from bigdataproj_spark.session import get_spark

    spark = get_spark("bench-asof-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bench_asof_")
    for t in TABLES:
        table(spark, sf_src, t).write.parquet(os.path.join(work, f"{t}.parquet"))
    eng = Engine(spark, work)

    from bigdataproj_spark.sources.bucketed import (
        bucketed_fact_tables,
        segment_cube_table,
    )
    from bigdataproj_spark.sources.corpus_cubes import docs_stats_cube_table

    bucketed_fact_tables(spark, work)
    segment_cube_table(spark, work)
    docs_stats_cube_table(spark, work)
    rows = ", ".join(
        f"({9900000000 + i}, 1, 'O', 99.0, "
        "TIMESTAMP '1996-01-01 00:00:00', '1-URGENT')"
        for i in range(1000)
    )
    eng.sql(f"INSERT INTO orders VALUES {rows}")
    eng.sql(
        "INSERT INTO documents VALUES "
        "(9900000001, 'attrib doc', 'en', 'src1', 10)"
    )
    v = eng.history().collect()[-1].version

    comp: dict[str, float] = defaultdict(float)

    real_repoint = snap._repoint_views

    def instrumented_repoint(sp, sfd, fact_names):
        from bigdataproj_spark.catalog import table as _table
        from bigdataproj_spark.plans.corpus_routing import (
            CORPUS_DIMS,
            current_documents,
            current_events,
        )
        from bigdataproj_spark.plans.routing import (
            current_lineitem,
            current_orders,
        )
        from bigdataproj_spark.schemas import FIXTURE_SCHEMAS

        sd = sp.__dict__
        ingested = sd.get("_bdp_ingested") or set()
        li_cols = tuple(FIXTURE_SCHEMAS["lineitem"].fieldNames())
        sources = {
            "lineitem": lambda: current_lineitem(sp, sfd).select(*li_cols),
            "orders": lambda: current_orders(sp, sfd),
            "documents": lambda: current_documents(sp, sfd),
            "events": lambda: current_events(sp, sfd),
        }
        ids = sd.setdefault("_bdp_fact_view_ids", {})
        seen = sd.setdefault("_bdp_fact_view_epoch", {})
        epochs = sd.get("_bdp_mutation_epoch") or {}
        for name in fact_names:
            t0 = time.perf_counter()
            df = (
                sources[name]()
                if (sfd, name) in ingested
                else _table(sp, sfd, name)
            )
            comp[f"relation_{name}"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            df.createOrReplaceTempView(name)
            comp["register"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            ids[name] = sp.table(name).semanticHash()
            comp["semantic_hash"] += time.perf_counter() - t0
            seen[name] = (sfd, epochs.get((sfd, name), 0))
        t0 = time.perf_counter()
        for name, owner_dir in (sd.get("_bdp_dim_views") or {}).items():
            d = CORPUS_DIMS.get(name)
            if d is not None:
                try:
                    d.open(sp, owner_dir).createOrReplaceTempView(name)
                except Exception:
                    pass
        comp["dims"] += time.perf_counter() - t0

    snap._repoint_views = instrumented_repoint
    try:
        # the COLD swap (first touch of this version: pays the
        # O(#files) pinned-scan stat pass), then three warm ones
        t0 = time.perf_counter()
        with snap.as_of(spark, work, v):
            pass
        cold = time.perf_counter() - t0
        comp.clear()
        n_swaps = 3
        t0 = time.perf_counter()
        for _ in range(n_swaps):
            with snap.as_of(spark, work, v):
                pass
        total = time.perf_counter() - t0
    finally:
        snap._repoint_views = real_repoint

    attributed = sum(comp.values())
    out = {
        "sf_dir": sf_src,
        "n_swaps": n_swaps,
        "cold_swap": round(cold, 3),
        "total_per_swap": round(total / n_swaps, 3),
        "per_swap": {
            k: round(vv / n_swaps, 3) for k, vv in sorted(comp.items())
        },
        "unattributed_per_swap": round((total - attributed) / n_swaps, 3),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
