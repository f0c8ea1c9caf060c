"""Differential fuzzing for the S13 projection router.

The router's fixed queries prove three shapes; this module proves the
SUBSUMPTION LOGIC: hypothesis draws a random AggQuery spec (grouping
attributes, group-key/non-key filters, aggregate subset), the spec is
lowered THREE ways — route() (projection or raw, the router decides),
the raw plan directly, and a generated ANSI SQL string — and all three
must agree bit-for-bit. A fold bug (e.g. a filter wrongly folded onto
a projection whose groups mix the filtered value) cannot hide: the
DuckDB twin always computes from the raw tables.

Draws deliberately cross the routing boundary: some specs hit the
pricing cube, some the rollup pair, some the star-date cube, and the
non-key discount filter forces the raw fallback — whichever side the
router picks, the answer must be the same.
"""

from __future__ import annotations

import os as _os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdataproj_spark.plans.routing import AggCall, AggQuery, Pred, _raw_plan, route
from bigdataproj_spark.plans.sqlfront import parse_sql, route_sql
from bigdataproj_spark.testing import compare_frames

_FUZZ_SCALE = int(_os.environ.get("FUZZ_SCALE", "1"))

# SQL twins of the routing MEASURES — imported from the SQL front door
# so this generator and sqlfront's structural matcher can never drift:
# every SQL string produced here must parse back to the identical spec
# (asserted below), which co-fuzzes the parser with the router.
from bigdataproj_spark.plans.sqlfront import CNT_SRC as _CNT_SRC  # noqa: E402
from bigdataproj_spark.plans.sqlfront import SUM_SQL as _SUM_SQL  # noqa: E402

_PRICING_AGGS = [
    AggCall("sum", "quantity", "a_sum_qty"),
    AggCall("sum", "base_price", "a_sum_price"),
    AggCall("sum", "discount", "a_sum_disc"),
    AggCall("sum", "revenue", "a_sum_rev"),
    AggCall("sum", "charge", "a_sum_charge"),
    AggCall("avg", "quantity", "a_avg_qty"),
    AggCall("avg", "base_price", "a_avg_price"),
    AggCall("count", "quantity", "a_cnt_qty"),
    AggCall("count_star", None, "a_cnt"),
]
_STAR_AGGS = [
    AggCall("sum", "revenue", "a_sum_rev"),
    AggCall("count_star", None, "a_cnt"),
]
_DATES = ["1998-06-01", "2000-01-01", "2001-03-15", "2001-09-02"]

pricing_specs = st.fixed_dictionaries(
    {
        "family": st.just("pricing"),
        "group": st.sampled_from(
            [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
        ),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_op": st.sampled_from(["<=", ">="]),
        "flag_filter": st.sampled_from([None, "A", "N", "R"]),
        "nonkey_filter": st.booleans(),  # discount filter -> raw fallback
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_PRICING_AGGS)) - 1),
    }
)
star_specs = st.fixed_dictionaries(
    {
        "family": st.just("star"),
        "group": st.sampled_from([("r_name",), ("n_name",), ("r_name", "n_name")]),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_op": st.sampled_from(["<=", ">="]),
        "region_filter": st.sampled_from([None, "ASIA", "EUROPE", "AMERICA"]),
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_STAR_AGGS)) - 1),
    }
)


def _to_spec(p) -> AggQuery:
    filters = []
    if p["date_filter"] is not None:
        filters.append(
            Pred(
                "l_shipdate",
                p["date_op"],
                f"{_DATES[p['date_filter']]} 00:00:00",
                cast="timestamp",
            )
        )
    if p["family"] == "pricing":
        if p["flag_filter"]:
            filters.append(Pred("l_returnflag", "=", p["flag_filter"]))
        if p["nonkey_filter"]:
            filters.append(Pred("l_discount", "<=", 0.05))
        pool = _PRICING_AGGS
    else:
        if p["region_filter"]:
            filters.append(Pred("r_name", "=", p["region_filter"]))
        pool = _STAR_AGGS
    aggs = tuple(a for i, a in enumerate(pool) if p["agg_mask"] >> i & 1)
    return AggQuery(tuple(filters), p["group"], aggs)


def _to_sql(spec: AggQuery, star: bool) -> str:
    sel = list(spec.group_by)
    for a in spec.aggs:
        if a.fn == "count_star":
            sel.append(f"COUNT(*) AS {a.alias}")
        elif a.fn == "sum":
            sel.append(f"{_SUM_SQL[a.measure]} AS {a.alias}")
        elif a.fn == "avg":
            sel.append(
                f"{_SUM_SQL[a.measure]} / COUNT({_CNT_SRC[a.measure]}) AS {a.alias}"
            )
        elif a.fn == "count":
            sel.append(f"COUNT({_CNT_SRC[a.measure]}) AS {a.alias}")
    frm = "lineitem"
    if star:
        frm = (
            "lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        )
    conds = []
    for pr in spec.filters:
        if pr.cast == "timestamp":
            conds.append(f"{pr.col} {pr.op} TIMESTAMP '{pr.value}'")
        elif isinstance(pr.value, str):
            conds.append(f"{pr.col} {pr.op} '{pr.value}'")
        else:
            conds.append(f"{pr.col} {pr.op} {pr.value}")
    where = f"WHERE {' AND '.join(conds)}" if conds else ""
    keys = ", ".join(spec.group_by)
    return f"SELECT {', '.join(sel)} FROM {frm} {where} GROUP BY {keys} ORDER BY {keys}"


@pytest.fixture(scope="module")
def _ora(sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@given(p=st.one_of(pricing_specs, star_specs))
@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_spec_routes_and_matches_duckdb(spark, sf_dir, _ora, p):
    """route(), the raw plan, and generated ANSI SQL must agree on any
    drawn spec, whichever projection (or none) the router picks."""
    spec = _to_spec(p)
    star = p["family"] == "star"
    sql = _to_sql(spec, star)
    # The SQL front door must lower the generated text back to the
    # IDENTICAL spec object (parser<->generator round-trip) …
    assert parse_sql(sql).spec == spec, sql
    routed, chosen = route(spark, sf_dir, spec)
    got = routed.toPandas()
    want = _ora.execute(sql).fetchdf()
    compare_frames(got, want, f"routing-fuzz[{chosen}] {spec}")
    # … and routing the TEXT must agree with routing the spec: same
    # layout choice, same cells (column order is the SQL select order).
    sql_df, sql_chosen = route_sql(spark, sf_dir, sql)
    assert sql_chosen == chosen, (sql_chosen, chosen, sql)
    assert got.equals(sql_df.toPandas()[got.columns.tolist()]), (chosen, sql)
    # and the raw plan agrees with the routed plan cell-for-cell
    if chosen != "raw":
        raw = _raw_plan(spark, sf_dir, spec).toPandas()
        assert got.equals(raw), (chosen, spec)
