"""Side-by-side bench: engine (Spark) vs DuckDB oracle at sf0.1.

The BASELINE.md bench gate is 'engine wall-clock <= 2x baseline per
query at the same scale factor'; the only executable baseline is the
DuckDB oracle SQL of each bench-tagged query. This script times both
sides warm and prints the per-query ratio so regressions are visible
before the driver's per-round run.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0

spark = get_spark("bench-baseline")
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
# Out-of-core for the baseline: an in-memory DuckDB has no temp
# directory, so it cannot spill and OOMs on the q27 band self-join at
# sf20 (~100 GB working set); with only the spill dir it STILL dies,
# because the default memory_limit (80% of RAM) exceeds what the host
# can give it next to the Spark JVM — the kernel OOM-kills it at
# 121 GB RSS before DuckDB ever spills. Both settings together are
# strictly FAIR to the baseline: without them the comparison point
# does not finish at sf20.
con.execute("SET temp_directory='/tmp/duckdb_bench_spill'")
con.execute("SET memory_limit='48GB'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # Tables are either one parquet file (the sf0.x fixtures) or a
    # directory of them (make_scaled_data.py's multi-file layout);
    # Spark's reader handles both shapes natively, DuckDB needs a glob.
    path = f"{SF_DIR}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

bench = {n: q for n, q in load_all().items() if "bench" in q.tags and q.oracle}
only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
if only:  # resume/subset knob: comma-separated query names
    wanted = set(only.split(","))
    bench = {n: q for n, q in bench.items() if n in wanted}

REPS = 3

out = {}
for name, q in sorted(bench.items()):
    # warm both sides once, then take min of REPS timed runs
    q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    con.execute(q.oracle).fetchall()

    t_spark = min(
        _timed(lambda: q.build(spark, SF_DIR).write.format("noop")
               .mode("overwrite").save())
        for _ in range(REPS)
    )
    t_duck = min(_timed(lambda: con.execute(q.oracle).fetchall()) for _ in range(REPS))

    out[name] = {
        "spark_s": round(t_spark, 3),
        "duckdb_s": round(t_duck, 3),
        "ratio": round(t_spark / t_duck, 2) if t_duck > 0 else None,
    }
    print(f"{name:28s} spark={t_spark:7.3f}s duckdb={t_duck:7.3f}s "
          f"ratio={out[name]['ratio']}", flush=True)

print(json.dumps({"sf_dir": SF_DIR, "results": out}))
