"""Regenerate docs/PLANS.md: AQE-final physical plans of the
bench-tagged queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

The plans are captured AFTER execution so AQE's final plan is shown;
per-node detail is trimmed to the scale-relevant lines (scan
pushdown/pruning and exchange arguments).
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("plandump")
spark.sparkContext.setLogLevel("ERROR")

HEADER = [
    "# Physical plans — headline queries (sf0.1, AQE final plans)",
    "",
    "Captured by `scripts/dump_plans.py` after execution (so AQE's final",
    "plan is shown). The properties the engine is designed around are",
    "visible directly: `PushedFilters` at the scan, `ReadSchema` pruning,",
    "`BroadcastHashJoin` on dimension arms, single `Exchange` per",
    "aggregation, `WholeStageCodegen` spans, no `CartesianProduct`.",
    "",
]

# bench-tagged queries plus the flagship LLM-pipeline operators whose
# plan shape the docs argue from (mixing window, span-dedup shuffles,
# packing prefix sum, decontamination broadcast semi-join).
EXTRA = {
    "r131_sql_pricing",
    "r37_domain_mixing",
    "r40_training_order",
    "r119_incremental_dedup",
    "r126_chunk_dedup",
    "r144_sequence_packing",
    "r130_decontamination",
    "r156_training_mix_pipeline",
    "r53_dsir_resample",
    "r120_bigram_lm",
    "q08_skipgram_pairs",
    "r43_graph_pagerank",
    "r123_kmeans_embeddings",
}

out = list(HEADER)
for name, q in sorted(load_all().items()):
    if "bench" not in q.tags and name not in EXTRA:
        continue
    df = q.build(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().splitlines()
    tree_end = next((i for i, l in enumerate(lines) if l.startswith("(1)")), len(lines))
    details = [
        l
        for l in lines[tree_end:]
        if any(
            k in l
            for k in ("PushedFilters", "ReadSchema", "Location:", "(1) Scan", "Arguments: ")
        )
    ]
    out.append(
        f"## {name}\n\n```\n"
        + "\n".join(lines[:tree_end]).rstrip()
        + "\n\n"
        + "\n".join(details[:14])
        + "\n```\n"
    )

with open("/root/repo/docs/PLANS.md", "w") as f:
    f.write("\n".join(out))
print(f"docs/PLANS.md written ({len(out) - len(HEADER)} queries)")
