"""The local differential gate: every registered oracle query must
hash-match DuckDB; rows-only queries must at least run and be stable."""

import pytest

from bigdataproj_spark.registry import load_all
from bigdataproj_spark.testing import assert_query_matches

QUERIES = load_all()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(name, spark, oracle, sf_dir):
    assert_query_matches(spark, oracle, QUERIES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name].build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
