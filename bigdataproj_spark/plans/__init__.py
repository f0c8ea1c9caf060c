"""Physical-plan inspection utilities (SURVEY.md §4).

The engine adds no custom Catalyst rules — its optimizer story is
configuration plus *plan-shape assertions*: these helpers let tests
(and operators' own docs) pin the properties that matter at 100 TB —
pushdown reached the scan, the dimension side broadcast, partitions
pruned, codegen fused — so a regression in plan quality fails CI, not
a production run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The (possibly not-yet-finalized) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The optimized logical plan as a string."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Execute the DataFrame (collect) so AQE finalizes, then return
    the final physical plan — the one that actually ran."""
    df.collect()
    return physical_plan(df)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan received ``fragment`` as a pushed
    filter (row-group skipping at the source)."""
    plan = physical_plan(df)
    scan = plan[plan.find("PushedFilters: [") :]
    return fragment in scan[: scan.find("]")]


def read_schema_of(df: DataFrame) -> str:
    """The ReadSchema struct string of the first scan (column-pruning
    witness)."""
    plan = physical_plan(df)
    i = plan.find("ReadSchema: ")
    return plan[i + len("ReadSchema: ") :].split("\n", 1)[0].split(",  ")[0]


def join_kinds(df: DataFrame) -> list[str]:
    """All join operator names appearing in the physical plan, in
    plan order (e.g. ['BroadcastHashJoin'])."""
    kinds = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    plan = physical_plan(df)
    found = []
    for line in plan.splitlines():
        for k in kinds:
            if k in line:
                found.append(k)
    return found


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan — the
    first-order scale cost of a query."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line and "BroadcastExchange" not in line
    )
