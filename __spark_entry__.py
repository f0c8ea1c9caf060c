"""Driver contract for the spark-graft builder (PySpark target).

All queries live in the ``bigdataproj_spark`` package's registry
(``bigdataproj_spark/registry.py``); this module only adapts it to the
driver's ``entry`` / ``queries`` / ``oracle_sql`` contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataproj_spark.registry import load_all  # noqa: E402

FLAGSHIP = "q25_corpus_pipeline"  # the north-star pipeline; q01 remains in the bench set


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return load_all()[FLAGSHIP].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
