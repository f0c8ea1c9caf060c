"""Drive the driver contract exactly as the round driver would:
vanilla SparkSession (no engine configs), import __spark_entry__,
run entry() + every queries() entry at sf0.01, compare each against
its oracle_sql() via DuckDB."""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as ep

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry()
df = ep.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2. contract consistency
qs = ep.queries()
osql = ep.oracle_sql()
extra = set(osql) - set(qs)
print(f"queries={len(qs)} oracle_sql={len(osql)} extra_oracle_keys={extra}")
assert not extra

# 3. differential at sf0.01 (the driver's correctness SF)
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

from bigdataproj_spark.testing import compare_frames

# optional subset: DRIVE_ONLY=q34_table_changes,r178_... (iteration aid;
# the round gate is always the full run)
import os

only = {s for s in os.environ.get("DRIVE_ONLY", "").split(",") if s}
if only:
    missing = only - set(qs)
    assert not missing, f"DRIVE_ONLY names not in registry: {missing}"

fails = []
for name in sorted(only or qs):
    t0 = time.time()
    try:
        spd = qs[name](spark, SF).toPandas()
        if name in osql:
            opd = con.execute(osql[name]).fetchdf()
            compare_frames(spd, opd, name)
            status = f"MATCH ({len(spd)} rows)"
        else:
            status = f"rows-only ({len(spd)} rows)"
    except Exception as e:
        status = f"FAIL: {str(e)[:200]}"
        fails.append(name)
    print(f"  {name}: {status} [{time.time()-t0:.1f}s]")

print("RESULT:", "FAIL " + str(fails) if fails else "ALL OK")
spark.stop()
sys.exit(1 if fails else 0)
