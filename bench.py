"""Benchmark harness (driver contract).

Runs the headline queries (registry tag ``bench``) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = logical-plan build + full execution drained through the noop
sink (no driver-side materialization — the 100 TB-honest measurement);
one untimed warm-up run first so JVM/codegen startup isn't billed to
the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataproj_spark.registry import load_all  # noqa: E402
from bigdataproj_spark.session import get_spark  # noqa: E402


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


# min-of-2 warm (plus one untimed warm-up): the round-9 driver run
# read 54% slow vs two same-day clean runs — a shared-host burst over
# the whole driver window. Min-of-N can't defeat window-long
# contention, but the explicit protocol tag in the JSON makes every
# round's number self-describing, and 2 reps keeps the driver's wall
# budget: the timed work is 3 executions per query total.
REPS = 2
PROTOCOL = f"min{REPS}-warm"


def run_canary(spark) -> float:
    """Fixed-work host-contention canary (round 12, r11-VERDICT item
    5): a single-task, data-independent job (20M xxhash64 folds in one
    partition) timed with the same min-of-REPS-after-warmup protocol.
    Its clean value is committed in docs/BENCHMARKS.md (~0.12 s on
    this container); a driver artifact whose canary reads ≥3x that
    marks the WHOLE window as host-contended — the r10/r11 bench
    inflations (12.4 s / 22.9 s vs ~7 s clean) become readable off the
    JSON line itself. One partition on purpose: the value must not
    change with $SPARK_GRAFT_CPUS, only with contention."""
    from pyspark.sql import functions as F

    def one() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 1)
            # modulo before the sum: 2e7 * 1e6 stays far inside int64
            # (a raw xxhash64 sum overflows under ANSI mode)
            .select((F.xxhash64("id") % 1_000_003).alias("h"))
            .agg(F.sum("h"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    one()  # warm-up, untimed (codegen compile)
    return min(one() for _ in range(REPS))


def run_canary_parallel(spark) -> float:
    """ALL-CORES contention canary: the same fixed fold, 20M rows PER
    CORE in one partition per core — so the clean value is
    core-count-invariant (constant work per lane) while hypervisor
    steal shows up directly. Added after observing a window where the
    host's load average read idle, the single-task canary read near
    clean (0.15 s), and the 32-core bench still inflated ~40%: steal
    throttles many-lane throughput first. Read the pair together —
    canary_s high ⇒ even single-lane contention; canary_par_s high
    with canary_s clean ⇒ multi-lane steal."""
    from pyspark.sql import functions as F

    lanes = spark.sparkContext.defaultParallelism

    def one() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000 * lanes, 1, lanes)
            .select((F.xxhash64("id") % 1_000_003).alias("h"))
            .agg(F.sum("h"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    one()
    return min(one() for _ in range(REPS))


def run_query(q, spark, sf_dir: str) -> float:
    """Min of REPS full plan-build + execution passes — the standard
    warm-steady-state measurement (each pass still plans and executes
    the query end-to-end; min discards scheduler/GC noise)."""
    spark.sparkContext.setJobDescription(f"bench:{q.name}")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return min(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bigdataproj-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = {n: q for n, q in load_all().items() if "bench" in q.tags}

    # Warm-up pass: run every headline query once untimed so JVM/codegen
    # compilation and file-index caching aren't billed to the measured
    # run (standard warm measurement; plan + execution still run in full
    # on the timed pass).
    for q in bench.values():
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name, q in bench.items():
        times[name] = round(run_query(q, spark, sf_dir), 3)

    canary = round(run_canary(spark), 3)
    canary_par = round(run_canary_parallel(spark), 3)

    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "protocol": PROTOCOL,
                "canary_s": canary,
                "canary_par_s": canary_par,
                "queries": times,
                "sf": sf_of(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
