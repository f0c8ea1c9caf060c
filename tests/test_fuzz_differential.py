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

# Stress knob: FUZZ_SCALE=N multiplies every family's draw count
# (default 1 = the per-suite budget; the per-round stress runs use
# FUZZ_SCALE=5 for ~450 fresh plans).
import os as _os
_FUZZ_SCALE = int(_os.environ.get("FUZZ_SCALE", "1"))
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
    max_examples=25 * _FUZZ_SCALE,
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


# --- window-function algebra ------------------------------------------------

_WFN = ["row_number", "rank", "lag_price", "sum_cents_frame"]

wplans = st.fixed_dictionaries(
    {
        "part_col": st.sampled_from(_CAT_COLS),
        "fn": st.sampled_from(_WFN),
        "keep_top": st.integers(min_value=1, max_value=8),
        "mod": st.integers(min_value=2, max_value=9),
        "rhs": st.integers(min_value=0, max_value=8),
    }
)


def _spark_window_frame(spark, sf_dir, p):
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % p["mod"] == p["rhs"]
    )
    w = Window.partitionBy(p["part_col"]).orderBy("o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    fn = {
        "row_number": F.row_number().over(w).cast("long"),
        "rank": F.rank().over(w).cast("long"),
        "lag_price": F.coalesce(F.lag(cents).over(w), F.lit(-1)),
        "sum_cents_frame": F.sum(cents).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    }[p["fn"]]
    rn = F.row_number().over(w)
    return (
        o.select(
            p["part_col"],
            "o_orderkey",
            fn.alias("v"),
            rn.alias("rn"),
        )
        .filter(F.col("rn") <= p["keep_top"])
        .drop("rn")
        .orderBy(p["part_col"], "o_orderkey")
    )


def _oracle_window_sql(p) -> str:
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    fn = {
        "row_number": "CAST(ROW_NUMBER() OVER w AS BIGINT)",
        "rank": "CAST(RANK() OVER w AS BIGINT)",
        "lag_price": f"COALESCE(LAG({cents}) OVER w, -1)",
        "sum_cents_frame": (
            f"CAST(SUM({cents}) OVER "
            f"(PARTITION BY {p['part_col']} ORDER BY o_orderkey "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ),
    }[p["fn"]]
    return f"""
    SELECT {p['part_col']}, o_orderkey, v FROM (
      SELECT {p['part_col']}, o_orderkey,
        {fn} AS v,
        ROW_NUMBER() OVER w AS rn
      FROM orders
      WHERE o_orderkey % {p['mod']} = {p['rhs']}
      WINDOW w AS (PARTITION BY {p['part_col']} ORDER BY o_orderkey)
    )
    WHERE rn <= {p['keep_top']}
    ORDER BY {p['part_col']}, o_orderkey
    """


@given(p=wplans)
@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_plan_matches_duckdb(spark, sf_dir, _ora, p):
    """Window-function plans from the algebra must hash-match DuckDB —
    ranking, offset, and running-frame semantics over a total order."""
    spd = _spark_window_frame(spark, sf_dir, p).toPandas()
    opd = _ora.execute(_oracle_window_sql(p)).fetchdf()
    if spd.empty and opd.empty:
        return
    compare_frames(spd, opd, f"wfuzz:{p}")


# --- set-operation algebra --------------------------------------------------

_SETOPS = [
    "union_all",
    "union_distinct",
    "intersect",
    "intersect_all",
    "except",
    "except_all",
]

splans = st.fixed_dictionaries(
    {
        "op": st.sampled_from(_SETOPS),
        "mod_a": st.integers(min_value=2, max_value=5),
        "rhs_a": st.integers(min_value=0, max_value=4),
        "mod_b": st.integers(min_value=2, max_value=5),
        "rhs_b": st.integers(min_value=0, max_value=4),
        "proj_mod": st.integers(min_value=2, max_value=6),
    }
)


def _setop_branch(spark, sf_dir, mod, rhs, proj_mod):
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % mod == rhs).select(
        "o_orderpriority",
        (F.col("o_custkey") % proj_mod).alias("grp"),
    )


def _spark_setop_frame(spark, sf_dir, p):
    a = _setop_branch(spark, sf_dir, p["mod_a"], p["rhs_a"], p["proj_mod"])
    b = _setop_branch(spark, sf_dir, p["mod_b"], p["rhs_b"], p["proj_mod"])
    combined = {
        "union_all": a.unionAll(b),
        "union_distinct": a.union(b).distinct(),
        "intersect": a.intersect(b),
        "intersect_all": a.intersectAll(b),
        "except": a.subtract(b),
        "except_all": a.exceptAll(b),
    }[p["op"]]
    return (
        combined.groupBy("o_orderpriority", "grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority", "grp")
    )


def _oracle_setop_sql(p) -> str:
    sql_op = {
        "union_all": "UNION ALL",
        "union_distinct": "UNION",
        "intersect": "INTERSECT",
        "intersect_all": "INTERSECT ALL",
        "except": "EXCEPT",
        "except_all": "EXCEPT ALL",
    }[p["op"]]

    def branch(mod, rhs):
        return (
            f"SELECT o_orderpriority, o_custkey % {p['proj_mod']} AS grp "
            f"FROM orders WHERE o_orderkey % {mod} = {rhs}"
        )

    return f"""
    SELECT o_orderpriority, grp, COUNT(*) AS n FROM (
      {branch(p['mod_a'], p['rhs_a'])}
      {sql_op}
      {branch(p['mod_b'], p['rhs_b'])}
    )
    GROUP BY o_orderpriority, grp
    ORDER BY o_orderpriority, grp
    """


@given(p=splans)
@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_setop_plan_matches_duckdb(spark, sf_dir, _ora, p):
    """Multiset set-operation plans must hash-match DuckDB — UNION
    [ALL] / INTERSECT [ALL] / EXCEPT [ALL] bag semantics are where
    engines most often drift."""
    spd = _spark_setop_frame(spark, sf_dir, p).toPandas()
    opd = _ora.execute(_oracle_setop_sql(p)).fetchdf()
    if spd.empty and opd.empty:
        return
    compare_frames(spd, opd, f"sfuzz:{p}")


# --- join algebra (inner/left/semi/anti with null-key injection) ------------
#
# Joins are where engines drift silently: null keys never equi-match,
# LEFT keeps them with a null right side, SEMI drops them, ANTI KEEPS
# them (the NOT IN trap). The generator plants NULLs into both join
# keys on a drawn modulus so every draw exercises the null paths, then
# aggregates to a stable compare surface. Semi/anti lower to
# EXISTS / NOT EXISTS on the SQL side — the ANSI forms with identical
# null semantics to Spark's left_semi / left_anti.

_JOIN_TYPES = ["inner", "left", "semi", "anti"]

jplans = st.fixed_dictionaries(
    {
        "jt": st.sampled_from(_JOIN_TYPES),
        "filter_mod": st.integers(min_value=2, max_value=5),
        "filter_rhs": st.integers(min_value=0, max_value=4),
        "null_mod": st.integers(min_value=2, max_value=6),
        "null_rhs": st.integers(min_value=0, max_value=5),
        "cnull_mod": st.integers(min_value=2, max_value=6),
        "cnull_rhs": st.integers(min_value=0, max_value=5),
        "right_mod": st.integers(min_value=1, max_value=3),
        "right_rhs": st.integers(min_value=0, max_value=2),
    }
)


def _join_sides(spark, sf_dir, p):
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % p["filter_mod"] == p["filter_rhs"]
    )
    k = F.when(
        F.col("o_custkey") % p["null_mod"] == p["null_rhs"], F.lit(None)
    ).otherwise(F.col("o_custkey"))
    o = o.select(
        "o_orderpriority",
        k.alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") % p["right_mod"] == p["right_rhs"]
    )
    ck = F.when(
        F.col("c_custkey") % p["cnull_mod"] == p["cnull_rhs"], F.lit(None)
    ).otherwise(F.col("c_custkey"))
    return o, c.select(ck.alias("ck"))


def _spark_join_frame(spark, sf_dir, p):
    o, c = _join_sides(spark, sf_dir, p)
    jt = p["jt"]
    if jt == "inner":
        j = o.join(c, o.k == c.ck)
    elif jt == "left":
        j = o.join(c, o.k == c.ck, "left")
    elif jt == "semi":
        j = o.join(c, o.k == c.ck, "left_semi")
    else:
        j = o.join(c, o.k == c.ck, "left_anti")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    ]
    if jt in ("inner", "left"):
        aggs.append(F.count("ck").alias("matched"))
    return j.groupBy("o_orderpriority").agg(*aggs).orderBy("o_orderpriority")


def _oracle_join_sql(p) -> str:
    jt = p["jt"]
    o_cte = (
        f"SELECT o_orderpriority, "
        f"CASE WHEN o_custkey % {p['null_mod']} = {p['null_rhs']} THEN NULL "
        f"ELSE o_custkey END AS k, "
        f"CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
        f"FROM orders WHERE o_orderkey % {p['filter_mod']} = {p['filter_rhs']}"
    )
    c_cte = (
        f"SELECT CASE WHEN c_custkey % {p['cnull_mod']} = {p['cnull_rhs']} "
        f"THEN NULL ELSE c_custkey END AS ck "
        f"FROM customer "
        f"WHERE c_nationkey % {p['right_mod']} = {p['right_rhs']}"
    )
    if jt == "inner":
        body = "SELECT o.*, c.ck FROM o JOIN c ON o.k = c.ck"
        matched = ", CAST(COUNT(ck) AS BIGINT) AS matched"
    elif jt == "left":
        body = "SELECT o.*, c.ck FROM o LEFT JOIN c ON o.k = c.ck"
        matched = ", CAST(COUNT(ck) AS BIGINT) AS matched"
    elif jt == "semi":
        body = "SELECT o.* FROM o WHERE EXISTS (SELECT 1 FROM c WHERE c.ck = o.k)"
        matched = ""
    else:
        body = (
            "SELECT o.* FROM o WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.ck = o.k)"
        )
        matched = ""
    return f"""
    WITH o AS ({o_cte}), c AS ({c_cte}), j AS ({body})
    SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(cents) AS BIGINT) AS sum_cents{matched}
    FROM j
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@given(p=jplans)
@settings(
    max_examples=25 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_plan_matches_duckdb(spark, sf_dir, _ora, p):
    """Join-algebra plans (with planted null keys on both sides) must
    hash-match DuckDB across inner/left/semi/anti."""
    spd = _spark_join_frame(spark, sf_dir, p).toPandas()
    opd = _ora.execute(_oracle_join_sql(p)).fetchdf()
    if spd.empty and opd.empty:
        return
    compare_frames(spd, opd, f"jfuzz:{p}")


def test_join_fuzz_harness_rejects_wrong_results(spark, sf_dir, _ora):
    """Meta-test: the join family must actually FAIL on a wrong
    lowering. NOT IN semantics (drop null-key left rows before the
    anti join) differs from left_anti whenever the null injection
    fires — the harness must catch it."""
    p = {
        "jt": "anti",
        "filter_mod": 2,
        "filter_rhs": 0,
        "null_mod": 2,
        "null_rhs": 1,
        "cnull_mod": 3,
        "cnull_rhs": 1,
        "right_mod": 1,
        "right_rhs": 0,
    }
    o, c = _join_sides(spark, sf_dir, p)
    wrong = (
        o.filter(F.col("k").isNotNull())  # the NOT IN mistake
        .join(c, o.k == c.ck, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
        .orderBy("o_orderpriority")
    )
    opd = _ora.execute(_oracle_join_sql(p)).fetchdf()
    with pytest.raises(AssertionError):
        compare_frames(wrong.toPandas(), opd, "meta")
