"""Query registry — the single source of truth for the correctness gate.

Every operator from SURVEY.md §2 registers at least one concrete query
here via the ``@query`` decorator. The registry drives three consumers:

- ``__spark_entry__.py`` (driver contract: ``queries()`` / ``oracle_sql()``)
- ``tests/test_oracle.py`` (local DuckDB differential harness)
- ``bench.py`` (headline timing queries, tag ``bench``)

Contract per entry (SURVEY.md §2.4 determinism rules):
- result ends with ORDER BY over a unique total key;
- DOUBLE aggregates go through exact DECIMAL arithmetic, cast to DOUBLE
  at the very end (bit-identical between Spark and DuckDB);
- timestamps are serialized as UTC ISO strings;
- every computed column is aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: BuildFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# Modules whose import populates the registry.
_QUERY_MODULES = (
    "bigdataproj_spark.operators.relational",
    "bigdataproj_spark.operators.joins",
    "bigdataproj_spark.operators.windows",
    "bigdataproj_spark.operators.setops",
    "bigdataproj_spark.operators.asof",
    "bigdataproj_spark.operators.text",
    "bigdataproj_spark.operators.dedup",
    "bigdataproj_spark.operators.similarity",
    "bigdataproj_spark.operators.multimodal",
    "bigdataproj_spark.operators.scalar_functions",
    "bigdataproj_spark.operators.pipeline",
    "bigdataproj_spark.operators.udx",
    "bigdataproj_spark.operators.skew",
    "bigdataproj_spark.operators.sampling",
    "bigdataproj_spark.operators.profiling",
    "bigdataproj_spark.operators.cleaning",
    "bigdataproj_spark.operators.quality",
    "bigdataproj_spark.operators.mixing",
    "bigdataproj_spark.operators.graph",
    "bigdataproj_spark.operators.analytics",
    "bigdataproj_spark.streaming.batch_twins",
    "bigdataproj_spark.sources.filescan",
    "bigdataproj_spark.sources.sink",
    "bigdataproj_spark.sources.bucketed",
    "bigdataproj_spark.sources.zorder",
    "bigdataproj_spark.plans.routing",
    "bigdataproj_spark.plans.sqlfront",
    "bigdataproj_spark.plans.ddl",
    "bigdataproj_spark.sources.retention",
    "bigdataproj_spark.sources.snapshots",
    "bigdataproj_spark.streaming.cdc",
)


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[BuildFn], BuildFn]:
    """Register an oracle-checked query. ``oracle=None`` → rows-only check."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all operator modules and return the full registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, don't fail.
            if e.name is None or not mod.startswith(e.name.rsplit(".", 1)[0]):
                raise
    return dict(sorted(_REGISTRY.items()))
