"""Round-12 optimization sweep: time EVERY registry query at
$SPARK_GRAFT_SF_DIR (default sf0.1), noop-sinked, one warm JVM.

Output: plans/r13/sweep_<tag>.json  {name: {"sec": s, "tags": [...]}}
sorted by cost — the triage list OPTIMIZATION_r13.md's checklist is
built from. Single timed pass per query (triage, not the bench
protocol); the bench's min2-warm numbers stay authoritative for the
headline set.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "sf01"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("sweep-r13")
spark.sparkContext.setLogLevel("ERROR")

# one untimed warm-up so JVM/codegen startup isn't billed to the first query
spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite"
).save()

out = {}
for name, q in sorted(load_all().items()):
    spark.sparkContext.setJobDescription(f"r13-sweep:{name}")
    t0 = time.perf_counter()
    try:
        q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        out[name] = {"sec": dt, "tags": list(q.tags)}
        print(f"{dt:8.3f}  {name}")
    except Exception as e:  # record, keep sweeping
        out[name] = {"sec": None, "err": str(e)[:200], "tags": list(q.tags)}
        print(f"   ERROR  {name}: {str(e)[:120]}")

path = f"/root/repo/plans/r13/sweep_{TAG}.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
timed = {k: v["sec"] for k, v in out.items() if v.get("sec") is not None}
print(f"\ntotal {sum(timed.values()):.1f}s over {len(timed)} queries -> {path}")
for k in sorted(timed, key=timed.get, reverse=True)[:25]:
    print(f"{timed[k]:8.3f}  {k}")
