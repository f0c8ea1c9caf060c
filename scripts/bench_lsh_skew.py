"""LSH-under-skew stress bench (round-5 VERDICT item 10).

Builds a synthetic corpus with the SAME document cardinality as the
sf5 fixture (250k docs) but an adversarial shape: 40% of the corpus is
one boilerplate blob replicated 100k times (every band bucket of the
blob is ~100x past MAX_BUCKET_MEMBERS — without the guard that single
bucket contributes ~5e9 candidate pairs and the job dies), the rest
are unique documents with planted near-dup pairs. Runs the exact q27
pipeline on (a) the sf5 fixture and (b) the skewed corpus and prints
both wall times: bounded bucket work means the skewed run must stay in
the same regime as the fixture run, not blow up quadratically.

Usage: python scripts/bench_lsh_skew.py [sf_dir]  (default .benchdata/sf5)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf5"

spark = get_spark("bench-lsh-skew")
spark.sparkContext.setLogLevel("ERROR")

n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
n_boiler = int(n_docs * 0.4)

skew_dir = tempfile.mkdtemp(prefix="lsh_skew_")
boiler = spark.range(0, n_boiler).select(
    F.col("id").alias("doc_id"),
    F.lit(
        "terms of service all rights reserved contact us privacy policy "
        "cookie notice subscribe to our newsletter follow us on social "
        "media copyright notice do not reproduce without permission"
    ).alias("text"),
)
normal = spark.range(0, n_docs - n_boiler).select(
    (F.col("id") + 10_000_000).alias("doc_id"),
    F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.sha2(
                F.concat(
                    (F.col("id") / 2).cast("int").cast("string"), i.cast("string")
                ),
                256,
            ).substr(1, 8),
        ),
    ).alias("text"),
)
boiler.unionByName(normal).repartition(32).write.mode("overwrite").parquet(
    f"{skew_dir}/documents.parquet"
)

q = load_all()["q27_minhash_lsh"]


def run(sf_dir: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = q.build(spark, sf_dir).count()
    return time.perf_counter() - t0, n


# warm both
run(SF_DIR)
run(skew_dir)
t_fix, n_fix = run(SF_DIR)
t_skew, n_skew = run(skew_dir)
print(
    f"fixture ({SF_DIR}, {n_docs} docs): {t_fix:.2f}s, {n_fix} pairs\n"
    f"skewed (40% boilerplate x{n_boiler}): {t_skew:.2f}s, {n_skew} pairs\n"
    f"ratio skew/fixture: {t_skew / t_fix:.2f}x "
    f"(guard holds iff this stays O(1), not O(bucket))"
)
shutil.rmtree(skew_dir, ignore_errors=True)
