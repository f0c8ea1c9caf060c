"""Differential query fuzzing (SURVEY.md §5: the oracle strategy,
generalized).

The registry checks a FIXED set of queries against DuckDB; this module
checks a RANDOM one — hypothesis draws a small relational plan
(filter → group → aggregate → sort) from a restricted algebra, the
same AST is lowered to BOTH a Spark DataFrame expression and an ANSI
SQL string, and the two engines must agree bit-for-bit. Any semantic
drift between the engine's expression lowering and plain SQL — null
ordering, numeric typing, filter edge cases — surfaces here without
anyone having to anticipate the query.

The algebra obeys the §2.4 determinism rules by construction: integer
fixed-point money sums, total-order sort keys, no float aggregation.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdataproj_spark.catalog import table
from bigdataproj_spark.testing import compare_frames

# --- the algebra ------------------------------------------------------------

_NUM_COLS = ["o_orderkey", "o_custkey"]
_CAT_COLS = ["o_orderpriority", "o_orderstatus"]
_CMP = ["<", ">=", "="]

plans = st.fixed_dictionaries(
    {
        "filter_col": st.sampled_from(_NUM_COLS),
        "cmp": st.sampled_from(_CMP),
        "mod": st.integers(min_value=2, max_value=7),
        "rhs": st.integers(min_value=0, max_value=6),
        "group_col": st.sampled_from(_CAT_COLS),
        "second_filter": st.booleans(),
        "price_floor": st.integers(min_value=0, max_value=300_000),
        "join_customer": st.booleans(),
        "having_min": st.integers(min_value=0, max_value=50),
    }
)


def _spark_frame(spark, sf_dir, p):
    o = table(spark, sf_dir, "orders")
    lhs = F.col(p["filter_col"]) % p["mod"]
    cond = {
        "<": lhs < p["rhs"],
        ">=": lhs >= p["rhs"],
        "=": lhs == p["rhs"],
    }[p["cmp"]]
    df = o.filter(cond)
    if p["second_filter"]:
        df = df.filter(F.col("o_totalprice") >= float(p["price_floor"]))
    if p["join_customer"]:
        c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        df = df.join(F.broadcast(c), df.o_custkey == c.c_custkey).filter(
            F.col("c_mktsegment") != "BUILDING"
        )
    return (
        df.groupBy(p["group_col"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .filter(F.col("n") >= p["having_min"])
        .orderBy(p["group_col"])
    )


def _oracle_sql(p) -> str:
    cond = f"o.{p['filter_col']} % {p['mod']} {p['cmp']} {p['rhs']}"
    if p["second_filter"]:
        cond += f" AND o.o_totalprice >= {p['price_floor']}"
    join = ""
    if p["join_customer"]:
        join = (
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "AND c.c_mktsegment <> 'BUILDING'"
        )
    return f"""
    SELECT o.{p['group_col']},
      COUNT(*) AS n,
      CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      MIN(o.o_orderkey) AS min_key,
      MAX(o.o_orderkey) AS max_key
    FROM orders o {join}
    WHERE {cond}
    GROUP BY o.{p['group_col']}
    HAVING COUNT(*) >= {p['having_min']}
    ORDER BY o.{p['group_col']}
    """


@pytest.fixture(scope="module")
def _ora(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    return con


@given(p=plans)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_plan_matches_duckdb(spark, sf_dir, _ora, p):
    """Any plan drawn from the algebra must hash-match DuckDB."""
    spd = _spark_frame(spark, sf_dir, p).toPandas()
    opd = _ora.execute(_oracle_sql(p)).fetchdf()
    if spd.empty and opd.empty:
        return
    compare_frames(spd, opd, f"fuzz:{p}")
