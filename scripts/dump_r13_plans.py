"""Dump full .explain('formatted') output for the round-13-touched
queries into plans/r13/<query>_<tag>.txt.

Usage: python scripts/dump_r13_plans.py <tree> <tag> [q1,q2,...]
  <tree>  repo tree to import the engine from (/root/repo for after,
          a pre-round worktree for before)
  <tag>   before | after

Captured AFTER a noop-sink execution so AQE's final plan is shown,
per the optimization guide §1.4/§7.2.
"""

import contextlib
import io
import os
import sys
import time

TREE = sys.argv[1]
TAG = sys.argv[2]
sys.path.insert(0, TREE)

from bigdataproj_spark.registry import load_all  # noqa: E402
from bigdataproj_spark.session import get_spark  # noqa: E402

DEFAULT = (
    "q67_dedup_clusters,r43_graph_pagerank,q50_semantic_dedup,"
    "r173_semantic_dedup_ivf,r178_cdc_consumer_profile,"
    "r179_cdc_view_routed"
)
ONLY = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT).split(",")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r13"

spark = get_spark("plandump-r13")
spark.sparkContext.setLogLevel("ERROR")

os.makedirs(OUT, exist_ok=True)
reg = load_all()
for name in ONLY:
    q = reg[name]
    spark.sparkContext.setJobDescription(f"r13-plandump:{name}")
    df = q.build(spark, SF_DIR)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{OUT}/{name}_{TAG}.txt", "w") as f:
        f.write(
            f"== {name} ({TAG}, tree={TREE}, sf_dir={SF_DIR}, "
            f"warm exec {dt:.3f}s) ==\n"
        )
        f.write(buf.getvalue())
    print(f"{name}: {dt:.3f}s -> {OUT}/{name}_{TAG}.txt")
print("done")
