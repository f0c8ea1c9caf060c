"""Dump full .explain('formatted') output for the bench-tagged queries
into plans/r12/<query>_<tag>.txt (tag = before/after, argv[1]).

Captured AFTER a noop-sink execution so AQE's final plan is shown,
per the optimization guide §1.4/§7.2.
"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r12"

spark = get_spark("plandump-r12")
spark.sparkContext.setLogLevel("ERROR")

os.makedirs(OUT, exist_ok=True)
for name, q in sorted(load_all().items()):
    if "bench" not in q.tags:
        continue
    if ONLY and name not in ONLY:
        continue
    spark.sparkContext.setJobDescription(f"r12-plandump:{name}")
    df = q.build(spark, SF_DIR)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{OUT}/{name}_{TAG}.txt", "w") as f:
        f.write(f"== {name} ({TAG}, sf_dir={SF_DIR}, warm exec {dt:.3f}s) ==\n")
        f.write(buf.getvalue())
    print(f"{name}: {dt:.3f}s -> {OUT}/{name}_{TAG}.txt")
print("done")
