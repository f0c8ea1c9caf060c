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

from bigdataproj_spark.plans.routing import (
    PART_ATTRS,
    SUPP_ATTRS,
    AggCall,
    AggQuery,
    BoolPred,
    Pred,
    _raw_plan,
    _used_cols,
    minimal_chain,
    route,
)
from bigdataproj_spark.plans.sqlfront import parse_sql, route_sql
from bigdataproj_spark.testing import compare_frames

_FUZZ_SCALE = int(_os.environ.get("FUZZ_SCALE", "1"))

# SQL twins of the routing MEASURES — imported from the SQL front door
# so this generator and sqlfront's structural matcher can never drift:
# every SQL string produced here must parse back to the identical spec
# (asserted below), which co-fuzzes the parser with the router.
from bigdataproj_spark.plans.sqlfront import CNT_SRC as _CNT_SRC  # noqa: E402
from bigdataproj_spark.plans.sqlfront import MAX_SQL as _MAX_SQL  # noqa: E402
from bigdataproj_spark.plans.sqlfront import MIN_SQL as _MIN_SQL  # noqa: E402
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
    AggCall("min", "quantity", "a_min_qty"),
    AggCall("max", "revenue", "a_max_rev"),
    AggCall("min", "charge", "a_min_charge"),
    AggCall("max", "discount", "a_max_disc"),
    # COUNT(DISTINCT): a cube-key target (folds on the cube) and a
    # non-key one (forces the raw path to carry it)
    AggCall("count_distinct", "l_shipdate", "a_cd_ship"),
    AggCall("count_distinct", "l_suppkey", "a_cd_supp"),
]
_STAR_AGGS = [
    AggCall("sum", "revenue", "a_sum_rev"),
    AggCall("count_star", None, "a_cnt"),
    # no projection stores line-level min partials for the star shape:
    # drawing this forces the raw star plan (per-order partial min
    # below the join), exercising the subsumption refusal
    AggCall("min", "revenue", "a_min_rev"),
    # dimension-side and fact-side distinct targets: the fact-side one
    # rides the partial KEY on prefix-chain raw plans
    AggCall("count_distinct", "n_name", "a_cd_nat"),
    AggCall("count_distinct", "l_suppkey", "a_cd_supp"),
    # order-home measure: forces the row-level plan (computed after
    # the dimension join; lineitem-multiplicity semantics)
    AggCall("sum", "order_total", "a_sum_otot"),
]
_PART_AGGS = [
    AggCall("sum", "revenue", "a_sum_rev"),
    AggCall("count_star", None, "a_cnt"),
    AggCall("min", "quantity", "a_min_qty"),
    AggCall("count_distinct", "p_brand", "a_cd_brand"),
    AggCall("count_distinct", "l_suppkey", "a_cd_supp"),
    # arm-home measures: each forces its arm on (and the row-level plan)
    AggCall("sum", "part_retail", "a_sum_retail"),
    AggCall("avg", "supp_acctbal", "a_avg_bal"),
    AggCall("max", "order_total", "a_max_otot"),
]
_DATES = ["1998-06-01", "2000-01-01", "2001-03-15", "2001-09-02"]

# r7-VERDICT item 7: literal HOSTILITY. The round-6 date-literal bug
# (dated.py under-read non-padded literals when deriving partition
# bounds) survived fuzzing because the generator only ever drew
# zero-padded midnight forms. Every date literal now draws a FORM as
# well as a value: zero-padded, non-padded, bare date (no time part),
# and sub-hour/sub-second times — all forms both engines parse
# identically (verified), so the differential compare stays exact
# while the derivation code sees the shapes real SQL authors type.
_DATE_FORMS = ("padded", "nonpad", "date_only", "subhour", "nonpad_subhour")


def _render_ts(date: str, form: str) -> str:
    y, m, d = date.split("-")
    if form == "nonpad":
        return f"{int(y)}-{int(m)}-{int(d)} 0:00:00"
    if form == "date_only":
        return date
    if form == "subhour":
        return f"{date} 07:30:15.250000"
    if form == "nonpad_subhour":
        return f"{int(y)}-{int(m)}-{int(d)} 7:30:15"
    return f"{date} 00:00:00"


# SQL-only clauses the front door supports beyond the spec language:
# GLOBAL aggregates (group_by=()), HAVING on a selected aggregate,
# descending ORDER BY, LIMIT. Drawn alongside every spec; applied in
# _to_sql and checked through route_sql (the spec-level three-way
# check runs when no extras are drawn).
_EXTRAS = {
    "global": st.sampled_from([False, False, False, True]),
    "having": st.sampled_from([None, None, 1, 2000]),
    "order_desc": st.sampled_from([False, False, True]),
    "limit": st.sampled_from([None, None, 1, 2]),
}

pricing_specs = st.fixed_dictionaries(
    {
        "family": st.just("pricing"),
        "group": st.sampled_from(
            [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
        ),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_form": st.sampled_from(_DATE_FORMS),
        "date_op": st.sampled_from(["<=", ">=", "between"]),
        "flag_filter": st.sampled_from([None, "A", "N", "R"]),
        "nonkey_filter": st.booleans(),  # discount filter -> raw fallback
        # boolean-tree / IN-list filters over group-key columns: any
        # boolean function of group keys folds (constant per group)
        "bool_filter": st.sampled_from([None, None, None, "or", "not_in", "in"]),
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_PRICING_AGGS)) - 1),
        # derived time-grain key: month/year/quarter rollups must fold
        # exactly onto the day-grained cube (or the raw plan)
        "trunc": st.sampled_from([None, None, "month", "year", "quarter"]),
        # DISTINCT shape: no aggregates, just the key combinations
        "distinct": st.sampled_from([False, False, False, True]),
        **_EXTRAS,
    }
)
star_specs = st.fixed_dictionaries(
    {
        "family": st.just("star"),
        "group": st.sampled_from(
            [
                ("r_name",),
                ("n_name",),
                ("r_name", "n_name"),
                # widened denorm attributes (order/customer level)
                ("c_mktsegment",),
                ("o_orderstatus", "r_name"),
                # NO star attribute at all: the declared full chain is
                # still semantically meaningful (orphan-dropping), so
                # this routes — it must NOT collapse to the chain-0 plan
                (),
                # mixed local+star: generalized partial key below join
                ("l_returnflag", "r_name"),
                ("l_linestatus", "c_mktsegment"),
            ]
        ),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_form": st.sampled_from(_DATE_FORMS),
        "date_op": st.sampled_from(["<=", ">=", "between"]),
        "region_filter": st.sampled_from([None, "ASIA", "EUROPE", "AMERICA"]),
        "bool_filter": st.just(None),
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_STAR_AGGS)) - 1),
        "distinct": st.sampled_from([False, False, False, True]),
        **_EXTRAS,
    }
)
# The part arm (lineitem ⋈ part on l_partkey), alone and composed
# with order-chain prefixes — always the raw two-arm plan (no
# projection stores the part-join semantics).
part_specs = st.fixed_dictionaries(
    {
        "family": st.just("part"),
        "chain_group": st.sampled_from(
            [
                (0, ("p_brand",)),
                (0, ("p_type",)),
                (0, ("l_returnflag", "p_brand")),
                (0, ("p_size",)),
                (1, ("o_orderstatus", "p_brand")),
                (4, ("r_name", "p_type")),
                (0, ()),  # part joined, no part attr: orphan-dropping
                # the supplier arm, alone and in the TRIPLE-arm form
                (0, ("s_name",)),
                (0, ("l_linestatus", "s_name")),
                (1, ("o_orderstatus", "p_brand", "s_name")),
            ]
        ),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_form": st.sampled_from(_DATE_FORMS),
        "date_op": st.sampled_from(["<=", ">=", "between"]),
        "psize_filter": st.sampled_from([None, 10, 25, 40]),
        "region_filter": st.just(None),
        "bool_filter": st.just(None),
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_PART_AGGS)) - 1),
        "distinct": st.sampled_from([False, False, False, True]),
        **_EXTRAS,
    }
)
# PREFIX chains (lineitem ⋈ first k dimension tables): no projection
# stores chain 1–3, so these all exercise the generalized raw star
# plan at every join depth, incl. order-date truncs above the join.
chain_specs = st.fixed_dictionaries(
    {
        "family": st.just("chain"),
        "chain_group": st.sampled_from(
            [
                (1, ("o_orderstatus",)),
                (1, ("o_orderpriority", "o_orderstatus")),
                (1, ("l_returnflag", "o_orderstatus")),
                (2, ("c_mktsegment",)),
                (2, ("o_orderstatus", "c_mktsegment")),
                (3, ("n_name",)),
                (3, ("l_linestatus", "n_name")),
                (2, ()),  # chain-2 global/distinct: joins matter, no attrs
            ]
        ),
        "date_filter": st.sampled_from([None, *range(len(_DATES))]),
        "date_form": st.sampled_from(_DATE_FORMS),
        "date_op": st.sampled_from(["<=", ">=", "between"]),
        "region_filter": st.just(None),
        "bool_filter": st.just(None),
        "agg_mask": st.integers(min_value=1, max_value=(1 << len(_STAR_AGGS)) - 1),
        # o_orderdate month rollup: an order-side trunc key that only
        # exists ABOVE the dimension join
        "otrunc": st.sampled_from([None, None, "month", "year"]),
        "distinct": st.sampled_from([False, False, False, True]),
        **_EXTRAS,
    }
)


def _to_spec(p) -> AggQuery:
    import dataclasses as _dc

    family = p["family"]
    if family in ("chain", "part"):
        declared, group = p["chain_group"]
    else:
        declared = 4 if family == "star" else 0
        group = p["group"]
    # DISTINCT needs at least one key; GLOBAL clears the keys — the two
    # are mutually exclusive, distinct wins when both are drawable.
    distinct = p.get("distinct") and bool(group)
    if p.get("global") and not distinct:
        group = ()

    filters = []
    if p["date_filter"] is not None:
        i = p["date_filter"]
        form = p.get("date_form", "padded")
        if p["date_op"] == "between":
            # a range predicate still folds exactly on the day-grained
            # cube key (keeps/drops whole groups)
            hi = _DATES[min(i + 2, len(_DATES) - 1)]
            filters.append(
                Pred(
                    "l_shipdate",
                    "between",
                    (_render_ts(_DATES[i], form), _render_ts(hi, form)),
                    cast="timestamp",
                )
            )
        else:
            filters.append(
                Pred(
                    "l_shipdate",
                    p["date_op"],
                    _render_ts(_DATES[i], form),
                    cast="timestamp",
                )
            )
    if family == "pricing":
        if p["flag_filter"]:
            filters.append(Pred("l_returnflag", "=", p["flag_filter"]))
        if p["nonkey_filter"]:
            filters.append(Pred("l_discount", "<=", 0.05))
        pool = _PRICING_AGGS
    elif family == "part":
        # a drawn p_size filter forces the part arm on (even for a
        # supplier-group draw — the two arms compose)
        if p["psize_filter"] is not None:
            filters.append(Pred("p_size", ">=", p["psize_filter"]))
        pool = _PART_AGGS
    else:
        if p["region_filter"]:
            filters.append(Pred("r_name", "=", p["region_filter"]))
        pool = _STAR_AGGS
    bf = p.get("bool_filter")
    if bf == "or":
        filters.append(
            BoolPred(
                "or",
                (Pred("l_returnflag", "=", "R"), Pred("l_linestatus", "=", "O")),
            )
        )
    elif bf == "not_in":
        filters.append(BoolPred("not", (Pred("l_returnflag", "in", ("A", "N")),)))
    elif bf == "in":
        filters.append(Pred("l_linestatus", "in", ("F", "O")))

    aggs = () if distinct else tuple(
        a for i, a in enumerate(pool) if p["agg_mask"] >> i & 1
    )
    truncs = ()
    if group and family == "pricing" and p.get("trunc"):
        truncs = (("a_tr", p["trunc"], "l_shipdate"),)
        group = group + ("a_tr",)
    if group and family == "chain" and p.get("otrunc"):
        truncs = (("a_otr", p["otrunc"], "o_orderdate"),)
        group = group + ("a_otr",)
    spec = AggQuery(tuple(filters), group, aggs, truncs)
    if declared > minimal_chain(spec):
        # the declared join depth exceeds what the attributes imply:
        # semantically load-bearing (orphan dropping), rides on chain
        spec = _dc.replace(spec, chain=declared)
    if family == "part":
        used = _used_cols(spec)
        # arms follow from what the draw actually references: part-
        # or supplier-side attributes/measure sources switch their arm
        # on; a draw touching neither keeps the part arm (the family's
        # no-attr orphan case). An order-home measure raises the
        # minimal chain through _used_cols, so declared-chain
        # normalization (above) already accounted for it.
        need_part = bool(used & PART_ATTRS) or not (used & SUPP_ATTRS)
        spec = _dc.replace(
            spec, part=need_part, supp=bool(used & SUPP_ATTRS)
        )
    return spec


_CHAIN_JOINS = (
    "JOIN orders ON l_orderkey = o_orderkey",
    "JOIN customer ON o_custkey = c_custkey",
    "JOIN nation ON c_nationkey = n_nationkey",
    "JOIN region ON n_regionkey = r_regionkey",
)


def _cond_sql(pr) -> str:
    if isinstance(pr, BoolPred):
        if pr.op == "not":
            (inner,) = pr.children
            if isinstance(inner, Pred) and inner.op == "in":
                vals = ", ".join(_lit_sql(v, inner.cast) for v in inner.value)
                return f"{inner.col} NOT IN ({vals})"
            return f"NOT ({_cond_sql(inner)})"
        joiner = " OR " if pr.op == "or" else " AND "
        return "(" + joiner.join(_cond_sql(c) for c in pr.children) + ")"
    if pr.op == "in":
        vals = ", ".join(_lit_sql(v, pr.cast) for v in pr.value)
        return f"{pr.col} IN ({vals})"
    if pr.op == "between":
        lo, hi = pr.value
        return f"{pr.col} BETWEEN {_lit_sql(lo, pr.cast)} AND {_lit_sql(hi, pr.cast)}"
    return f"{pr.col} {pr.op} {_lit_sql(pr.value, pr.cast)}"


def _lit_sql(v, cast) -> str:
    if cast == "timestamp":
        return f"TIMESTAMP '{v}'"
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


def _to_sql(
    spec: AggQuery,
    chain: int,
    order_desc: bool = False,
    having: int | None = None,
    limit: int | None = None,
) -> str:
    part, supp = spec.part, spec.supp
    tm = {a: (u, c) for a, u, c in spec.truncs}
    sel = [
        f"date_trunc('{tm[g][0]}', {tm[g][1]}) AS {g}" if g in tm else g
        for g in spec.group_by
    ]
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
        elif a.fn == "min":
            sel.append(f"{_MIN_SQL[a.measure]} AS {a.alias}")
        elif a.fn == "max":
            sel.append(f"{_MAX_SQL[a.measure]} AS {a.alias}")
        elif a.fn == "count_distinct":
            sel.append(f"COUNT(DISTINCT {a.measure}) AS {a.alias}")
    frm = " ".join(
        ["lineitem", *_CHAIN_JOINS[:chain]]
        + (["JOIN part ON l_partkey = p_partkey"] if part else [])
        + (["JOIN supplier ON l_suppkey = s_suppkey"] if supp else [])
    )
    conds = [_cond_sql(pr) for pr in spec.filters]
    parts = [f"SELECT {', '.join(sel)} FROM {frm}"]
    if conds:
        parts.append("WHERE " + " AND ".join(conds))
    if spec.group_by:
        parts.append("GROUP BY " + ", ".join(spec.group_by))
    if having is not None:
        parts.append(f"HAVING COUNT(*) > {having}")
    if spec.group_by:
        parts.append(
            "ORDER BY "
            + ", ".join(f"{k} DESC" if order_desc else k for k in spec.group_by)
        )
    if limit is not None:
        parts.append(f"LIMIT {limit}")
    return " ".join(parts)


@pytest.fixture(scope="module")
def _ora(sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders", "lineitem", "part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@given(p=st.one_of(pricing_specs, star_specs, chain_specs, part_specs))
@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_spec_routes_and_matches_duckdb(spark, sf_dir, _ora, p):
    """route(), the raw plan, and generated ANSI SQL must agree on any
    drawn spec, whichever projection (or none) the router picks."""
    spec = _to_spec(p)
    chain = spec.chain if spec.chain is not None else minimal_chain(spec)
    # SQL-only extras: HAVING needs COUNT(*) in the select list to
    # reference; LIMIT without a total ORDER BY would make the row SET
    # nondeterministic (ties at the boundary), so it rides only on the
    # grouped form (keys are a total order there) or the 1-row global.
    has_cnt = any(a.fn == "count_star" for a in spec.aggs)
    extras = {
        "order_desc": bool(p["order_desc"] and spec.group_by),
        "having": p["having"] if has_cnt else None,
        "limit": p["limit"],
    }
    sql = _to_sql(spec, chain, **extras)
    # The SQL front door must lower the generated text back to the
    # IDENTICAL spec object (parser<->generator round-trip) …
    parsed = parse_sql(sql)
    assert parsed.spec == spec, sql
    assert parsed.limit == extras["limit"], sql
    assert bool(parsed.having) == (extras["having"] is not None), sql
    # … and routing the TEXT must match DuckDB running the same text.
    sql_df, sql_chosen = route_sql(spark, sf_dir, sql)
    want = _ora.execute(sql).fetchdf()
    compare_frames(sql_df.toPandas(), want, f"routing-fuzz[{sql_chosen}] {sql}")
    if any(v for v in extras.values()):
        return  # spec-level plans don't model HAVING/DESC/LIMIT
    # No extras: the spec-level route must agree with the SQL-level
    # answer cell-for-cell, and with the raw plan when rewritten.
    routed, chosen = route(spark, sf_dir, spec)
    got = routed.toPandas()
    assert chosen == sql_chosen, (chosen, sql_chosen, sql)
    compare_frames(got, want, f"routing-fuzz[{chosen}] {spec}")
    if chosen != "raw":
        raw = _raw_plan(spark, sf_dir, spec).toPandas()
        assert got.equals(raw), (chosen, spec)


# ---------------------------------------------------------------------------
# Scan-shape fuzz: layout selection (Z-order / dated / raw) must be
# invisible. Particularly the DERIVED month pruning (sources/dated.py)
# — hand-written bound logic, exactly what differential fuzz protects.
# ---------------------------------------------------------------------------

from bigdataproj_spark.plans.routing import ScanQuery, route_scan  # noqa: E402

_SCAN_COL_SETS = [
    # covered by the Z-order layout's stored set
    ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
    # outside it (returnflag / shipdate / discount) → dated or raw
    ("l_orderkey", "l_returnflag", "l_shipdate"),
    ("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
    ("l_orderkey", "l_discount", "l_returnflag"),
]

scan_specs = st.fixed_dictionaries(
    {
        "cols": st.sampled_from(_SCAN_COL_SETS),
        "part_range": st.sampled_from([None, (20, 80), (50, 150)]),
        "supp_low": st.sampled_from([None, 3, 10]),
        "date_pred": st.sampled_from(
            [
                None,
                ("between", ("2000-03-01 00:00:00", "2000-06-30 00:00:00")),
                ("<=", "1999-06-01 00:00:00"),
                (">=", "2001-01-01 00:00:00"),
                ("<", "2000-02-01 00:00:00"),  # exact month boundary
                ("=", "2000-05-17 00:00:00"),
                # r7-VERDICT item 7: hostile literal forms — the
                # derived month-bound parser must not under-read these
                # (the round-6 bug class); both engines parse them
                # identically, so the differential stays exact
                ("<=", "1999-6-1 0:00:00"),  # non-padded
                (">=", "2001-1-1"),  # bare date, no time part
                ("between", ("2000-3-1 7:30:15", "2000-6-30 18:05:00")),
                ("<", "2000-02-01 00:00:00.250000"),  # sub-second
            ]
        ),
        "qty_max": st.sampled_from([None, 10.0, 30.0]),
        "flag": st.sampled_from([None, "A", "R"]),
    }
)


def _to_scan_spec(p) -> ScanQuery:
    filters = []
    if p["part_range"]:
        filters.append(Pred("l_partkey", "between", p["part_range"]))
    if p["supp_low"] is not None:
        filters.append(Pred("l_suppkey", ">=", p["supp_low"]))
    if p["date_pred"]:
        op, v = p["date_pred"]
        filters.append(Pred("l_shipdate", op, v, cast="timestamp"))
    if p["qty_max"] is not None:
        filters.append(Pred("l_quantity", "<=", p["qty_max"]))
    if p["flag"]:
        filters.append(Pred("l_returnflag", "=", p["flag"]))
    cols = p["cols"]
    # the spec language requires filter columns within the lineitem
    # schema; columns need not be selected to be filtered on
    return ScanQuery(tuple(cols), tuple(filters))


def _scan_sql(q: ScanQuery) -> str:
    conds = [_cond_sql(p) for p in q.filters]
    parts = [f"SELECT {', '.join(q.columns)} FROM lineitem"]
    if conds:
        parts.append("WHERE " + " AND ".join(conds))
    parts.append("ORDER BY " + ", ".join(q.columns))
    return " ".join(parts)


@given(p=scan_specs)
@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_scan_routes_and_matches_duckdb(spark, sf_dir, _ora, p):
    """route_scan's layout choice (Z-order / dated / raw) must return
    exactly DuckDB's rows for the same predicate set, through both the
    spec-level and the SQL front-door entry, with the same choice."""
    spec = _to_scan_spec(p)
    sql = _scan_sql(spec)
    parsed = parse_sql(sql)
    assert parsed.spec == spec, sql
    sql_df, sql_chosen = route_sql(spark, sf_dir, sql)
    want = _ora.execute(sql).fetchdf()
    compare_frames(sql_df.toPandas(), want, f"scan-fuzz[{sql_chosen}] {sql}")
    df, chosen = route_scan(spark, sf_dir, spec)
    assert chosen == sql_chosen, (chosen, sql_chosen, sql)
    compare_frames(df.toPandas(), want, f"scan-fuzz[{chosen}] {spec}")
