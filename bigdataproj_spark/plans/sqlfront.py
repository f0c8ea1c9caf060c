"""E1 x S13: the SQL front door — projection auto-routing for SQL TEXT.

``plans/routing.py`` answers logical :class:`AggQuery` / :class:`ScanQuery`
specs from the cheapest deployed projection; until now the caller had to
build the spec object. This module closes the remaining distance to the
reference's query posture (queries arrive as text against the indexed
store, reference README.md:102-104): :func:`parse_sql` lowers a SQL
string onto the router's spec language, and :func:`route_sql` routes it.
``Engine.sql`` tries this first and falls back to ``spark.sql`` verbatim
for anything outside the recognized family — a missed rewrite is never a
wrong answer, because the rewrite itself is bit-identical by construction
(same fixed-point arithmetic at deploy time, proven by the same DuckDB
oracles) and the fallback is Spark's own SQL engine.

Parsing uses DuckDB's public ``json_serialize_sql`` AST (a stable,
documented JSON rendering of its PostgreSQL-style parser) — driver-side,
milliseconds, zero cluster work. Matching is STRUCTURAL, never textual:
each canonical measure formulation (the exact-DECIMAL arithmetic every
registry oracle uses, e.g. ``SUM(CAST(l_extendedprice AS DECIMAL(12,2))
* (1 - l_discount))``) is itself parsed once, both ASTs are normalized
(locations/aliases stripped, column refs unqualified), and compared —
so whitespace, case, table-qualification, and alias spelling cannot
produce a false positive, and an expression that LOOKS like revenue but
isn't (say, a different cast width) simply doesn't match and falls back.

Recognized family (everything else → ``UnsupportedSQL`` → spark.sql):

- grouped aggregates over ``lineitem`` alone, any PREFIX of the
  canonical order chain (lineitem⋈orders⋈customer⋈nation⋈region on
  the TPC-H keys, validated structurally as the set of join
  equalities — join DEPTH is semantically load-bearing, see
  routing.AggQuery.chain), and/or the part and supplier arms
  (⋈part on l_partkey, ⋈supplier on l_suppkey), all composable;
- aggregates: the canonical DECIMAL sum/avg/min/max formulations of
  the five routing measures, plus plain ``SUM/AVG/COUNT/MIN/MAX(col)``
  over the raw measure columns, ``COUNT(*)``, and ``COUNT(DISTINCT
  col)`` over any reachable attribute. MIN/MAX re-derive from the
  cubes' stored int64 min/max partials (fixed-point scaling is
  monotone, so it commutes with MIN/MAX — the partials are monoids
  like the sums, and double as per-group zone maps). Plain double
  forms are answered with the engine's exact fixed-point arithmetic —
  deterministic and order-independent where a naive double sum is not
  (documented semantics: the engine's SQL dialect computes
  decimal-exact money);
- SELECT DISTINCT / GROUP BY without aggregates (the DISTINCT shape:
  key combinations are a projection of stored group keys);
- WHERE: a conjunction of ``col <op> literal`` / ``BETWEEN`` / ``IN``
  / ``!=`` predicates and arbitrary AND/OR/NOT trees of them
  (TIMESTAMP/DATE literal casts preserved; a boolean tree folds on a
  projection exactly when every referenced column is a stored group
  key — the tree is then constant within each stored group);
- derived time-grain grouping: ``GROUP BY date_trunc('hour'|'day'|
  'month'|'quarter'|'year', <timestamp col>)`` (by expression or select
  alias) — a coarser grain folds exactly onto any cube storing the
  source at finer (or full) resolution because coarse groups are
  unions of whole stored groups and every measure is a monoid; 'week'
  is excluded (Spark/DuckDB truncation conventions differ);
- GLOBAL aggregates (no GROUP BY) — the cube's best case: COUNT(*) or
  SUM over the entire fact table re-aggregates a scale-invariant
  projection down to one row;
- HAVING over select-list aggregates: matched structurally to the
  output column and applied as a post-aggregation filter — fold-safe
  on every path because it compares FINAL re-aggregated values;
- ORDER BY any output columns (asc or desc) and LIMIT, applied on top
  of the routed plan — so ``ORDER BY revenue DESC LIMIT 10`` (the
  top-k warehouse shape) routes onto the cube too;
- projection+filter scans over lineitem (no aggregates): routed through
  :func:`route_scan` so a range predicate on a Z-order curve key is
  answered from the clustered layout and a shipdate range from the
  ship-month-partitioned layout (derived partition pruning), with any
  ORDER BY applied on top.

At 100 TB this is the difference between "the 15k-row cube answer
exists" and "SELECT ... FROM lineitem GROUP BY ... gets it": the user
ships the same SQL they would run anywhere, and the engine reads the
scale-invariant projection instead of the full fact scan
(docs/BENCHMARKS.md: raw q01 3.1x DuckDB at sf5 vs cube 1.05x/0.55x).

Differentially fuzzed in tests/test_fuzz_routing.py: every generated
spec's SQL rendering must parse back to the IDENTICAL spec object, and
the routed answer must match DuckDB running the same SQL on raw tables.
"""

from __future__ import annotations

import dataclasses as _dc
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .corpus_routing import (
    CORPUS_DIMS,
    CORPUS_TABLES,
    TableAggQuery,
    TableScanQuery,
    route_corpus,
    route_corpus_scan,
)
from .routing import (
    DIM_ATTRS,
    PART_ATTRS,
    SUPP_ATTRS,
    LINEITEM_COLS as _LINEITEM_COLS,
    MEASURES,
    AggCall,
    AggQuery,
    BoolPred,
    Pred,
    ScanQuery,
    minimal_chain,
    route,
    route_scan,
)


class UnsupportedSQL(Exception):
    """The statement is outside the routable family; run it verbatim
    through spark.sql instead (Engine.sql does exactly that)."""


# ---------------------------------------------------------------------------
# Canonical SQL formulations of the routing measures — the single
# source of truth shared with the fuzzer's SQL generator
# (tests/test_fuzz_routing.py imports these, so the generator and the
# parser can never drift apart).
# ---------------------------------------------------------------------------

_DECIMAL_EXPR: dict[str, str] = {
    "quantity": "CAST(l_quantity AS DECIMAL(12,2))",
    "base_price": "CAST(l_extendedprice AS DECIMAL(12,2))",
    "discount": "CAST(l_discount AS DECIMAL(12,2))",
    "revenue": (
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    ),
    "charge": (
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
        " * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
    ),
    # arm-home money measures (late round 6): computed AFTER their
    # join on the row-level raw plan; SQL semantics are the join's
    # (order-level sums weight by lineitem multiplicity — exactly
    # what the statement says, and what DuckDB computes)
    "order_total": "CAST(o_totalprice AS DECIMAL(12,2))",
    "cust_acctbal": "CAST(c_acctbal AS DECIMAL(12,2))",
    "part_retail": "CAST(p_retailprice AS DECIMAL(12,2))",
    "supp_acctbal": "CAST(s_acctbal AS DECIMAL(12,2))",
}
SUM_SQL = {m: f"CAST(SUM({e}) AS DOUBLE)" for m, e in _DECIMAL_EXPR.items()}
# MIN/MAX partials are stored by the cube too (fixed-point scaling is
# monotone, so it commutes with MIN/MAX — monoid-mergeable like SUM).
MIN_SQL = {m: f"CAST(MIN({e}) AS DOUBLE)" for m, e in _DECIMAL_EXPR.items()}
MAX_SQL = {m: f"CAST(MAX({e}) AS DOUBLE)" for m, e in _DECIMAL_EXPR.items()}

# Plain-column measure spellings (SUM(l_quantity), AVG(l_discount), …).
COL_MEASURE: dict[str, str] = {
    "l_quantity": "quantity",
    "l_extendedprice": "base_price",
    "l_discount": "discount",
    "o_totalprice": "order_total",
    "c_acctbal": "cust_acctbal",
    "p_retailprice": "part_retail",
    "s_acctbal": "supp_acctbal",
}
CNT_SRC: dict[str, str] = {m: c for c, m in COL_MEASURE.items()}

# ---------------------------------------------------------------------------
# Corpus-table measure spellings (S15): the canonical SQL forms of the
# documents/events measures, shared with the corpus fuzzer. Integer
# measures (divisor 1) spell their SUM as CAST(... AS BIGINT) — exact
# int64 on both engines (DuckDB's bare SUM(BIGINT) widens to HUGEINT,
# which pandas renders as float; the cast pins the common exact type).
# The tokens measure's canonical form embeds the engine's tokenizer
# twin (operators/text.py TOKENS_SQL) — the whole point of the docs
# cube: that full-corpus regex pass runs at deploy time, and a SQL
# statement spelling it is answered from stored partials.
# ---------------------------------------------------------------------------

# Derived from the engine's single tokenizer/stopword source of truth
# (operators/text.py TOKENS_SQL + STOPWORDS) — a tokenizer change
# updates the canonical SQL spellings here automatically, so the front
# door can never keep matching a stale twin.
from ..operators.text import STOPWORDS as _STOPWORDS  # noqa: E402
from ..operators.text import TOKENS_SQL as _TOKENS_SQL  # noqa: E402

_TOK_LEN_SQL = f"len({_TOKENS_SQL})"
_STOPWORDS_SQL = "'" + "','".join(_STOPWORDS) + "'"
_STOP_LEN_SQL = f"len(list_filter({_TOKENS_SQL}, t -> t IN ({_STOPWORDS_SQL})))"
_EVENT_VAL_SQL = "CAST(value AS DECIMAL(18,2))"

CORPUS_SUM_SQL: dict[str, dict[str, str]] = {
    "documents": {
        "chars": "CAST(SUM(n_chars) AS BIGINT)",
        "tokens": f"CAST(SUM({_TOK_LEN_SQL}) AS BIGINT)",
        "stopwords": f"CAST(SUM({_STOP_LEN_SQL}) AS BIGINT)",
    },
    "events": {"value": f"CAST(SUM({_EVENT_VAL_SQL}) AS DOUBLE)"},
}
CORPUS_MIN_SQL: dict[str, dict[str, str]] = {
    "documents": {
        "chars": "MIN(n_chars)",
        "tokens": f"MIN({_TOK_LEN_SQL})",
        "stopwords": f"MIN({_STOP_LEN_SQL})",
    },
    "events": {"value": f"CAST(MIN({_EVENT_VAL_SQL}) AS DOUBLE)"},
}
CORPUS_MAX_SQL: dict[str, dict[str, str]] = {
    "documents": {
        "chars": "MAX(n_chars)",
        "tokens": f"MAX({_TOK_LEN_SQL})",
        "stopwords": f"MAX({_STOP_LEN_SQL})",
    },
    "events": {"value": f"CAST(MAX({_EVENT_VAL_SQL}) AS DOUBLE)"},
}
CORPUS_AVG_SQL: dict[str, dict[str, str]] = {
    "documents": {
        "chars": "CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars)",
        "tokens": f"CAST(SUM({_TOK_LEN_SQL}) AS DOUBLE) / COUNT({_TOK_LEN_SQL})",
        "stopwords": f"CAST(SUM({_STOP_LEN_SQL}) AS DOUBLE) / COUNT({_STOP_LEN_SQL})",
    },
    "events": {
        "value": f"CAST(SUM({_EVENT_VAL_SQL}) AS DOUBLE) / COUNT(value)"
    },
}
# Plain one-column spellings (SUM(n_chars), AVG(value), COUNT(value) …);
# answered with the engine's exact arithmetic, like the lineitem forms.
CORPUS_COL_MEASURE: dict[str, dict[str, str]] = {
    "documents": {"n_chars": "chars"},
    "events": {"value": "value"},
}

# The dimension chain in join order; a statement's FROM clause must be
# lineitem alone or a PREFIX of this chain joined on exactly these
# keys (any paren/ordering DuckDB normalizes away — matching is on the
# table SET and edge SET, never on text).
_CHAIN_TABLES = ("orders", "customer", "nation", "region")
_CHAIN_EDGES = (
    frozenset({"l_orderkey", "o_orderkey"}),
    frozenset({"o_custkey", "c_custkey"}),
    frozenset({"c_nationkey", "n_nationkey"}),
    frozenset({"n_regionkey", "r_regionkey"}),
)

_CMP_OPS = {
    "COMPARE_LESSTHANOREQUALTO": "<=",
    "COMPARE_LESSTHAN": "<",
    "COMPARE_GREATERTHANOREQUALTO": ">=",
    "COMPARE_GREATERTHAN": ">",
    "COMPARE_EQUAL": "=",
    "COMPARE_NOTEQUAL": "!=",
}


# ---------------------------------------------------------------------------
# AST plumbing.
# ---------------------------------------------------------------------------


_PARSER_LOCK = __import__("threading").Lock()
_PARSER_CON = None  # one cached in-memory connection: parse is ~0.5 ms
# warm vs ~8 ms with a fresh connection per statement — both far below
# the ~80 ms scheduler floor of any Spark query, but the cache keeps
# the front door free for interactive callers.


def _ast(sql: str) -> dict:
    """Parse ``sql`` with DuckDB's serializer; UnsupportedSQL on any
    parse failure (the caller falls back to spark.sql, which will
    produce the real error message if the SQL is genuinely broken).
    Driver-side only; the connection holds no data and never executes
    the statement."""
    global _PARSER_CON
    try:
        import duckdb
    except ImportError as e:  # pragma: no cover - duckdb is baked in
        raise UnsupportedSQL(f"no duckdb parser available: {e}") from e
    try:
        with _PARSER_LOCK:
            if _PARSER_CON is None:
                _PARSER_CON = duckdb.connect(":memory:")
            raw = _PARSER_CON.execute(
                "SELECT json_serialize_sql(?::VARCHAR)", [sql]
            ).fetchone()[0]
        doc = json.loads(raw)
    except Exception as e:
        raise UnsupportedSQL(f"unparseable SQL: {e}") from e
    if doc.get("error"):
        raise UnsupportedSQL(str(doc.get("error_message", "parse error")))
    stmts = doc.get("statements", [])
    if len(stmts) != 1:
        raise UnsupportedSQL(f"expected one statement, got {len(stmts)}")
    node = stmts[0]["node"]
    if node.get("type") != "SELECT_NODE":
        raise UnsupportedSQL(f"not a SELECT: {node.get('type')}")
    return node


def mentioned_tables(sql: str) -> frozenset[str] | None:
    """The set of base-table names a statement actually REFERENCES
    (from DuckDB's parse tree — every BASE_TABLE node anywhere in the
    statement, including joins and subqueries), or None when the
    statement does not parse as a single SELECT. Engine._ensure_dim_views
    uses this so a string literal or column alias that merely CONTAINS
    a dim's name never triggers a dim deploy (round-7 ADVICE); the
    regex fallback only applies to statements DuckDB cannot parse."""
    try:
        node = _ast(sql)
    except UnsupportedSQL:
        return None
    names: set[str] = set()

    def _walk(n) -> None:
        if isinstance(n, dict):
            if n.get("type") == "BASE_TABLE" and n.get("table_name"):
                names.add(str(n["table_name"]).lower())
            for v in n.values():
                _walk(v)
        elif isinstance(n, list):
            for v in n:
                _walk(v)

    _walk(node)
    return frozenset(names)


def _norm(node):
    """Comparison form of an expression subtree: locations and aliases
    stripped, column refs reduced to their unqualified name (every
    fixture column name is globally unique, so qualification carries
    no information)."""
    if isinstance(node, dict):
        if node.get("class") == "COLUMN_REF":
            return {
                "class": "COLUMN_REF",
                "column_names": [node["column_names"][-1].lower()],
            }
        return {
            k: _norm(v)
            for k, v in node.items()
            if k not in ("query_location", "alias")
        }
    if isinstance(node, list):
        return [_norm(v) for v in node]
    return node


def _key(node) -> str:
    return json.dumps(_norm(node), sort_keys=True)


_CANON_AGG: dict[str, tuple[str, str]] = {}  # AST key -> (fn, measure)


def _canon_aggs() -> dict[str, tuple[str, str]]:
    """Normalized ASTs of the canonical aggregate formulations (parsed
    once; parsing our own snippet through the same parser makes the
    match immune to serializer details)."""
    if not _CANON_AGG:
        for fn, table in (("sum", SUM_SQL), ("min", MIN_SQL), ("max", MAX_SQL)):
            for measure, sql in table.items():
                item = _ast(f"SELECT {sql} FROM lineitem")["select_list"][0]
                _CANON_AGG[_key(item)] = (fn, measure)
    return _CANON_AGG


def _colref(node) -> str | None:
    if isinstance(node, dict) and node.get("class") == "COLUMN_REF":
        return node["column_names"][-1].lower()
    return None


def _plain_fn(node) -> tuple[str, str] | None:
    """(function_name, column) for a vanilla one-column aggregate call
    with no DISTINCT/FILTER/ORDER decoration, else None."""
    if not (isinstance(node, dict) and node.get("class") == "FUNCTION"):
        return None
    if node.get("distinct") or node.get("filter") is not None:
        return None
    if node.get("order_bys", {}).get("orders"):
        return None
    ch = node.get("children", [])
    if len(ch) != 1:
        return None
    col = _colref(ch[0])
    return (node["function_name"].lower(), col) if col else None


# hour included (the standard streaming rollup grain): Spark and
# DuckDB truncate hours identically; 'week' stays excluded (ISO vs
# locale conventions differ). Folding safety is per-layout: cubes
# storing the SOURCE at full resolution (l_shipdate, o_orderdate) fold
# any grain; the hour-grained events cube refuses sub-hour grains
# (corpus_routing.CorpusProjection.subsumes) and the raw plan computes
# them exactly.
_TRUNC_UNITS = frozenset({"year", "quarter", "month", "day", "hour"})
# columns date_trunc may legally apply to (timestamp-typed); the
# order-side o_orderdate is gated by the statement's join chain via
# the caller's `allowed` set like every other dimension attribute
_TS_COLS = frozenset({"l_shipdate", "o_orderdate"})


def _match_trunc(node, ts_cols: frozenset[str] = _TS_COLS) -> tuple[str, str] | None:
    """(unit, source_col) for a ``date_trunc('unit', col)`` call over a
    supported unit and timestamp column, else None. Units are those
    whose truncation semantics are identical between Spark and DuckDB
    (week differs: ISO vs locale conventions — excluded). ``ts_cols``
    is the caller's table-specific legal source set (the lineitem-star
    set by default; corpus tables pass their own)."""
    if not (isinstance(node, dict) and node.get("class") == "FUNCTION"):
        return None
    if node.get("function_name", "").lower() != "date_trunc":
        return None
    ch = node.get("children", [])
    if len(ch) != 2:
        return None
    c0 = ch[0]
    if not (
        isinstance(c0, dict)
        and c0.get("class") == "CONSTANT"
        and c0.get("value", {}).get("type", {}).get("id") == "VARCHAR"
    ):
        return None
    unit = str(c0["value"]["value"]).lower()
    col = _colref(ch[1])
    if unit not in _TRUNC_UNITS or col not in ts_cols:
        return None
    return unit, col


def _is_count_star(node) -> bool:
    return (
        isinstance(node, dict)
        and node.get("class") == "FUNCTION"
        and node.get("function_name", "").lower() == "count_star"
        and not node.get("children")
        and not node.get("distinct")
        and node.get("filter") is None
    )


def _match_sum(node) -> str | None:
    """Measure computed by ``node`` as a SUM, canonical or plain (the
    AVG numerator check needs specifically a sum)."""
    hit = _canon_aggs().get(_key(node))
    if hit and hit[0] == "sum":
        return hit[1]
    pf = _plain_fn(node)
    if pf and pf[0] == "sum" and pf[1] in COL_MEASURE:
        return COL_MEASURE[pf[1]]
    return None


def _match_agg(item: dict) -> AggCall | None:
    """Lower one select-list item to an AggCall (alias required), or
    None if it is not an aggregate expression at all (the caller then
    checks whether it is a grouping column)."""
    alias = item.get("alias", "")
    hit = _canon_aggs().get(_key(item))
    if hit:
        return AggCall(hit[0], hit[1], alias) if alias else None
    if _is_count_star(item):
        return AggCall("count_star", None, alias) if alias else None
    # COUNT(DISTINCT col): the target is a raw COLUMN, not a measure —
    # it folds on any projection that stores the column as a group key
    # (the distinct value set over stored groups equals the set over
    # raw rows). Target-column validation against the statement's
    # allowed set happens in parse_sql (needs the join chain).
    if (
        isinstance(item, dict)
        and item.get("class") == "FUNCTION"
        and item.get("function_name", "").lower() == "count"
        and item.get("distinct")
        and item.get("filter") is None
        and not item.get("order_bys", {}).get("orders")
        and len(item.get("children", [])) == 1
    ):
        col = _colref(item["children"][0])
        if col:
            return AggCall("count_distinct", col, alias) if alias else None
    pf = _plain_fn(item)
    if pf:
        fn, col = pf
        if fn in ("count", "avg", "sum", "min", "max") and col in COL_MEASURE:
            return AggCall(fn, COL_MEASURE[col], alias) if alias else None
    # canonical avg: <sum form> / COUNT(source_col)
    if (
        isinstance(item, dict)
        and item.get("class") == "FUNCTION"
        and item.get("function_name") == "/"
        and len(item.get("children", [])) == 2
    ):
        num, den = item["children"]
        m = _match_sum(num)
        pf = _plain_fn(den)
        if (
            m is not None
            and pf is not None
            and pf[0] == "count"
            and MEASURES[m].source_col == pf[1]
        ):
            return AggCall("avg", m, alias) if alias else None
    return None


def _parse_constant(node) -> tuple[object, str | None]:
    """(python value, cast) for a literal, where cast is "timestamp" /
    "date" when the literal was written as TIMESTAMP '…' / DATE '…'."""
    cast = None
    if isinstance(node, dict) and node.get("class") == "CAST":
        tid = node.get("cast_type", {}).get("id")
        if tid not in ("TIMESTAMP", "DATE"):
            raise UnsupportedSQL(f"unsupported literal cast {tid}")
        cast = tid.lower()
        node = node["child"]
    if not (isinstance(node, dict) and node.get("class") == "CONSTANT"):
        raise UnsupportedSQL("non-literal comparison operand")
    val = node["value"]
    if val.get("is_null"):
        raise UnsupportedSQL("NULL literal")
    tid = val["type"]["id"]
    v = val["value"]
    if tid == "DECIMAL":
        scale = val["type"]["type_info"]["scale"]
        return int(v) / 10**scale, cast
    if tid in ("INTEGER", "BIGINT", "SMALLINT", "TINYINT", "UINTEGER", "UBIGINT"):
        return int(v), cast
    if tid in ("DOUBLE", "FLOAT"):
        return float(v), cast
    if tid == "VARCHAR":
        return str(v), cast
    raise UnsupportedSQL(f"unsupported literal type {tid}")


def _parse_filter(node: dict):
    """Lower one predicate expression to a Pred or BoolPred tree.
    DuckDB's parser already normalizes ``NOT (x > 5)`` to ``x <= 5``
    and ``NOT … IN`` to COMPARE_NOT_IN; whatever boolean structure
    survives (AND/OR conjunctions, OPERATOR_NOT over a compound,
    IN-lists) maps 1:1 onto the router's tree language."""
    cls = node.get("class")
    typ = node.get("type")
    if cls == "CONJUNCTION" and typ in ("CONJUNCTION_AND", "CONJUNCTION_OR"):
        kids = tuple(_parse_filter(c) for c in node["children"])
        return BoolPred("and" if typ == "CONJUNCTION_AND" else "or", kids)
    if cls == "OPERATOR" and typ == "OPERATOR_NOT":
        ch = node.get("children", [])
        if len(ch) != 1:
            raise UnsupportedSQL("malformed NOT")
        return BoolPred("not", (_parse_filter(ch[0]),))
    if cls == "OPERATOR" and typ in ("COMPARE_IN", "COMPARE_NOT_IN"):
        ch = node.get("children", [])
        if len(ch) < 2:
            raise UnsupportedSQL("empty IN list")
        col = _colref(ch[0])
        if col is None:
            raise UnsupportedSQL("IN input is not a column")
        vals, casts = [], set()
        for c in ch[1:]:
            v, cast = _parse_constant(c)
            vals.append(v)
            casts.add(cast)
        if len(casts) != 1:
            raise UnsupportedSQL("mixed literal casts in IN list")
        p = Pred(col, "in", tuple(vals), cast=casts.pop())
        return BoolPred("not", (p,)) if typ == "COMPARE_NOT_IN" else p
    if cls == "COMPARISON" and typ in _CMP_OPS:
        col = _colref(node["left"])
        if col is None:
            raise UnsupportedSQL("left side of comparison is not a column")
        value, cast = _parse_constant(node["right"])
        return Pred(col, _CMP_OPS[typ], value, cast=cast)
    if cls == "BETWEEN":
        col = _colref(node["input"])
        if col is None:
            raise UnsupportedSQL("BETWEEN input is not a column")
        lo, cast_lo = _parse_constant(node["lower"])
        hi, cast_hi = _parse_constant(node["upper"])
        if cast_lo != cast_hi:
            raise UnsupportedSQL("mismatched BETWEEN bound casts")
        return Pred(col, "between", (lo, hi), cast=cast_lo)
    raise UnsupportedSQL(f"unsupported predicate {cls}/{typ}")


def _parse_where(node) -> tuple:
    """Top-level conjuncts of the WHERE clause, each a Pred/BoolPred.
    The top AND is flattened (the router treats the filter tuple as a
    conjunction); any nested boolean structure is preserved."""
    if node is None:
        return ()
    preds: list = []

    def walk(n):
        if isinstance(n, dict) and n.get("type") == "CONJUNCTION_AND":
            for c in n["children"]:
                walk(c)
        else:
            preds.append(_parse_filter(n))

    walk(node)
    return tuple(preds)


_PART_EDGE = frozenset({"l_partkey", "p_partkey"})
_SUPP_EDGE = frozenset({"l_suppkey", "s_suppkey"})


def _parse_from(node: dict) -> tuple[int, bool, bool]:
    """(chain depth, part joined, supplier joined) for the FROM
    clause: bare lineitem, a prefix of the canonical order chain, the
    part arm (``JOIN part ON l_partkey = p_partkey``), the supplier
    arm (``JOIN supplier ON l_suppkey = s_suppkey``), or any
    combination; UnsupportedSQL for any other shape."""
    if node.get("type") == "BASE_TABLE":
        if node.get("table_name", "").lower() != "lineitem":
            raise UnsupportedSQL(f"unroutable table {node.get('table_name')}")
        return 0, False, False
    tables: set[str] = set()
    edges: set[frozenset[str]] = set()

    def walk(n):
        t = n.get("type")
        if t == "BASE_TABLE":
            tables.add(n.get("table_name", "").lower())
            return
        if t != "JOIN":
            raise UnsupportedSQL(f"unsupported FROM node {t}")
        if n.get("join_type") != "INNER" or n.get("using_columns"):
            raise UnsupportedSQL("only canonical INNER ... ON chain joins route")
        cond = n.get("condition")
        if not (
            isinstance(cond, dict)
            and cond.get("type") == "COMPARE_EQUAL"
            and _colref(cond.get("left"))
            and _colref(cond.get("right"))
        ):
            raise UnsupportedSQL("non-equi join condition")
        edges.add(frozenset({_colref(cond["left"]), _colref(cond["right"])}))
        walk(n["left"])
        walk(n["right"])

    walk(node)
    part = "part" in tables and _PART_EDGE in edges
    if part:
        tables = tables - {"part"}
        edges = edges - {_PART_EDGE}
    supp = "supplier" in tables and _SUPP_EDGE in edges
    if supp:
        tables = tables - {"supplier"}
        edges = edges - {_SUPP_EDGE}
    for depth in range(0, len(_CHAIN_TABLES) + 1):
        want_tables = {"lineitem", *_CHAIN_TABLES[:depth]}
        want_edges = set(_CHAIN_EDGES[:depth])
        if tables == want_tables and edges == want_edges:
            if depth == 0 and not part and not supp:
                break  # a bare JOIN node with no edges cannot occur
            return depth, part, supp
    raise UnsupportedSQL(
        f"join graph is not a prefix of the canonical chain "
        f"(tables={sorted(tables)})"
    )


def _modifiers(
    node: dict,
) -> tuple[tuple[tuple[str, bool], ...], int | None, bool]:
    """((col, ascending), …) ORDER BY terms, the LIMIT, and whether
    the statement is SELECT DISTINCT."""
    orders: list[tuple[str, bool]] = []
    limit: int | None = None
    distinct = False
    for mod in node.get("modifiers", []):
        t = mod.get("type")
        if t == "DISTINCT_MODIFIER":
            if mod.get("distinct_on_targets"):
                raise UnsupportedSQL("DISTINCT ON is not routable")
            distinct = True
        elif t == "ORDER_MODIFIER":
            for o in mod.get("orders", []):
                ot = o.get("type")
                if ot in ("ORDER_DEFAULT", "ASCENDING", "ORDER_ASCENDING"):
                    asc = True
                elif ot in ("DESCENDING", "ORDER_DESCENDING"):
                    asc = False
                else:
                    raise UnsupportedSQL(f"unsupported sort direction {ot}")
                col = _colref(o.get("expression"))
                if col is None:
                    raise UnsupportedSQL("ORDER BY over a non-column expression")
                orders.append((col, asc))
        elif t == "LIMIT_MODIFIER":
            if mod.get("offset") is not None:
                raise UnsupportedSQL("OFFSET is not routable")
            v, cast = _parse_constant(mod.get("limit"))
            if cast is not None or not isinstance(v, int) or v < 0:
                raise UnsupportedSQL("non-integer LIMIT")
            limit = v
        else:
            raise UnsupportedSQL(f"unsupported modifier {t}")
    return tuple(orders), limit, distinct


def _parse_having(node, agg_alias_by_key: dict[str, str]) -> tuple[Pred, ...]:
    """HAVING folds trivially on every path — it filters FINAL
    aggregate values, after re-aggregation — provided each compared
    aggregate is one the query already outputs: the predicate becomes
    a plain filter on that output column (identified structurally, so
    ``HAVING COUNT(*) > 5`` finds the select list's ``COUNT(*) AS c``
    whatever it was aliased)."""
    if node is None:
        return ()
    preds: list[Pred] = []

    def walk(n):
        if isinstance(n, dict) and n.get("type") == "CONJUNCTION_AND":
            for c in n["children"]:
                walk(c)
            return
        if not (isinstance(n, dict) and n.get("type") in _CMP_OPS):
            raise UnsupportedSQL("unsupported HAVING predicate")
        alias = agg_alias_by_key.get(_key(n.get("left")))
        if alias is None:
            raise UnsupportedSQL(
                "HAVING must compare an aggregate from the select list"
            )
        value, cast = _parse_constant(n["right"])
        preds.append(Pred(alias, _CMP_OPS[n["type"]], value, cast=cast))

    walk(node)
    return tuple(preds)


_CORPUS_CANON: dict[str, dict[str, tuple[str, str]]] = {}


def _corpus_canon(tname: str) -> dict[str, tuple[str, str]]:
    """Normalized ASTs of the corpus tables' canonical aggregate
    formulations (parsed once per table, like :func:`_canon_aggs`)."""
    if tname not in _CORPUS_CANON:
        canon: dict[str, tuple[str, str]] = {}
        for fn, tbl in (
            ("sum", CORPUS_SUM_SQL),
            ("min", CORPUS_MIN_SQL),
            ("max", CORPUS_MAX_SQL),
            ("avg", CORPUS_AVG_SQL),
        ):
            for measure, sql in tbl[tname].items():
                item = _ast(f"SELECT {sql} FROM {tname}")["select_list"][0]
                canon[_key(item)] = (fn, measure)
        _CORPUS_CANON[tname] = canon
    return _CORPUS_CANON[tname]


def _match_corpus_agg(item: dict, tname: str) -> AggCall | None:
    """Corpus twin of :func:`_match_agg`: canonical forms (incl. the
    full AVG quotient as one snippet), COUNT(*), COUNT(DISTINCT col),
    and plain one-column spellings over the table's measure columns."""
    alias = item.get("alias", "")
    hit = _corpus_canon(tname).get(_key(item))
    if hit:
        return AggCall(hit[0], hit[1], alias) if alias else None
    if _is_count_star(item):
        return AggCall("count_star", None, alias) if alias else None
    if (
        isinstance(item, dict)
        and item.get("class") == "FUNCTION"
        and item.get("function_name", "").lower() == "count"
        and item.get("distinct")
        and item.get("filter") is None
        and not item.get("order_bys", {}).get("orders")
        and len(item.get("children", [])) == 1
    ):
        col = _colref(item["children"][0])
        if col:
            return AggCall("count_distinct", col, alias) if alias else None
    pf = _plain_fn(item)
    if pf:
        fn, col = pf
        col_measure = CORPUS_COL_MEASURE[tname]
        if fn in ("count", "avg", "sum", "min", "max") and col in col_measure:
            return AggCall(fn, col_measure[col], alias) if alias else None
    return None


def _corpus_base_tables(n: dict, acc: set[str]) -> set[str]:
    """All BASE_TABLE names under a FROM node (tolerant walk: used to
    DECIDE corpus-vs-lineitem dispatch, never to validate shape)."""
    t = n.get("type")
    if t == "BASE_TABLE":
        acc.add(n.get("table_name", "").lower())
    elif t == "JOIN":
        _corpus_base_tables(n.get("left", {}), acc)
        _corpus_base_tables(n.get("right", {}), acc)
    return acc


def _parse_corpus_dims(from_node: dict, tname: str) -> tuple[str, ...]:
    """Validate a corpus FROM clause: the bare fact table, or the fact
    INNER-joined to declared dims on their canonical edges (``JOIN
    sources ON source = src_id``) — the corpus twin of
    :func:`_parse_from`'s chain/arm recognition. Returns the declared
    dim names; raises UnsupportedSQL on any other join shape."""
    if from_node.get("type") == "BASE_TABLE":
        return ()
    tables: set[str] = set()
    edges: set[frozenset[str]] = set()

    def walk(n):
        t = n.get("type")
        if t == "BASE_TABLE":
            tables.add(n.get("table_name", "").lower())
            return
        if t != "JOIN":
            raise UnsupportedSQL(f"unsupported FROM node {t}")
        if n.get("join_type") != "INNER" or n.get("using_columns"):
            raise UnsupportedSQL("only INNER ... ON dim joins route")
        cond = n.get("condition")
        if not (
            isinstance(cond, dict)
            and cond.get("type") == "COMPARE_EQUAL"
            and _colref(cond.get("left"))
            and _colref(cond.get("right"))
        ):
            raise UnsupportedSQL("non-equi dim join condition")
        edges.add(frozenset({_colref(cond["left"]), _colref(cond["right"])}))
        walk(n["left"])
        walk(n["right"])

    walk(from_node)
    if tname not in tables:
        raise UnsupportedSQL("corpus join without the fact table")
    tables.discard(tname)
    dims: list[str] = []
    for name in sorted(tables):
        d = CORPUS_DIMS.get(name)
        if d is None or tname not in d.fact_tables:
            raise UnsupportedSQL(f"unroutable join table {name}")
        edge = frozenset({d.fact_key, d.dim_key})
        if edge not in edges:
            raise UnsupportedSQL(f"dim {name} joined off its canonical edge")
        edges.discard(edge)
        dims.append(name)
    if edges:
        raise UnsupportedSQL("unexpected join edges")
    return tuple(dims)


def _parse_corpus(node: dict, tname: str) -> "ParsedSQL":
    """Lower a corpus-table SELECT onto :class:`TableAggQuery`.
    The same clause grammar as the lineitem path (WHERE trees, HAVING,
    ORDER BY/LIMIT, SELECT DISTINCT, date_trunc grouping) plus the
    corpus star's declared DIM joins (round-7: ``JOIN sources ON
    source = src_id`` widens the referencable columns by the dim's
    attrs). Scans (no grouping, no aggregates) lower onto
    :class:`TableScanQuery` so an events time-range scan is answered
    from the day-partitioned layout with derived directory pruning."""
    model = CORPUS_TABLES[tname]
    dims = _parse_corpus_dims(node["from_table"], tname)
    order, limit, distinct = _modifiers(node)
    filters = _parse_where(node.get("where_clause"))
    allowed = model.columns
    for name in dims:
        allowed = allowed | CORPUS_DIMS[name].attrs
    for p in filters:
        bad = p.cols() - allowed
        if bad:
            raise UnsupportedSQL(f"filter on unknown column {sorted(bad)[0]}")

    group_nodes = node.get("group_expressions", [])
    sets = node.get("group_sets", [])
    if group_nodes and sets != [list(range(len(group_nodes)))]:
        raise UnsupportedSQL("GROUPING SETS/ROLLUP/CUBE are not routable")

    out: list[str] = []
    aggs: list[AggCall] = []
    seen_groups: list[str] = []
    truncs: dict[str, tuple[str, str]] = {}
    agg_alias_by_key: dict[str, str] = {}
    for item in node["select_list"]:
        if isinstance(item, dict) and item.get("class") == "WINDOW":
            raise UnsupportedSQL(
                "window functions (OVER clause) are not routable"
            )
        call = _match_corpus_agg(item, tname)
        if call is not None:
            if not call.alias:
                raise UnsupportedSQL("aggregate without an alias")
            aggs.append(call)
            out.append(call.alias)
            agg_alias_by_key[_key(item)] = call.alias
            continue
        tr = _match_trunc(item, model.ts_cols)
        if tr is not None:
            alias = item.get("alias", "")
            if not alias:
                raise UnsupportedSQL("date_trunc key without an alias")
            truncs[alias] = tr
            out.append(alias)
            seen_groups.append(alias)
            continue
        col = _colref(item)
        if col is None:
            raise UnsupportedSQL("select item is neither group column nor aggregate")
        if item.get("alias"):
            raise UnsupportedSQL("aliased group columns are not routable")
        if col not in allowed:
            raise UnsupportedSQL(f"unknown column {col} on {tname}")
        out.append(col)
        seen_groups.append(col)
    if len(set(out)) != len(out):
        raise UnsupportedSQL("duplicate output column names")
    for a in aggs:
        if a.fn == "count_distinct" and a.measure not in allowed:
            raise UnsupportedSQL(f"COUNT(DISTINCT) over unknown column {a.measure}")

    groups: list[str] = []
    if distinct:
        if aggs:
            raise UnsupportedSQL("DISTINCT over aggregates is not routable")
        if group_nodes:
            raise UnsupportedSQL("DISTINCT combined with GROUP BY is not routable")
        groups = list(seen_groups)
    for g in group_nodes:
        col = _colref(g)
        if col is not None:
            if col in truncs or col in allowed:
                groups.append(col)
                continue
            raise UnsupportedSQL(f"GROUP BY over unknown column {col}")
        tr = _match_trunc(g, model.ts_cols)
        if tr is not None:
            alias = next((a for a, t in truncs.items() if t == tr), None)
            if alias is None:
                raise UnsupportedSQL("grouped date_trunc key is not selected")
            groups.append(alias)
            continue
        raise UnsupportedSQL("GROUP BY over a non-routable expression")

    if not groups and not aggs:
        # Row-level corpus scan: routed through route_corpus_scan so an
        # events ts-range opens only the day directories it touches.
        # HAVING without grouping/aggregates is invalid SQL — refuse
        # BEFORE the scan branch returns (round-6 ADVICE, low: it was
        # silently discarded here while the lineitem path raised), so
        # the verbatim fallback surfaces spark.sql's own error.
        if node.get("having") is not None:
            raise UnsupportedSQL("HAVING on a row-level scan")
        if dims:
            # row-level dim-join scans have no clustered layout story
            # yet; refuse → Engine.sql answers verbatim (correct)
            raise UnsupportedSQL("row-level scan over a dim join")
        if truncs:
            raise UnsupportedSQL("scan over derived time-grain columns")
        if not ({c for c, _ in order} <= set(out)):
            raise UnsupportedSQL("scan ORDER BY must use selected columns")
        return ParsedSQL(
            TableScanQuery(tname, tuple(out), filters), tuple(out), order, (), limit
        )
    for col in seen_groups:
        if col not in groups:
            raise UnsupportedSQL(f"bare column {col} is not a grouping key")
    if sorted(seen_groups) != sorted(groups):
        raise UnsupportedSQL("every grouping key must be selected exactly once")
    having = _parse_having(node.get("having"), agg_alias_by_key)
    if not ({c for c, _ in order} <= set(out)):
        raise UnsupportedSQL("ORDER BY must use output columns")
    spec = TableAggQuery(
        tname,
        filters,
        tuple(groups),
        tuple(aggs),
        tuple((a, u, c) for a, (u, c) in truncs.items()),
        dims,
    )
    return ParsedSQL(spec, tuple(out), order, having, limit)


# ---------------------------------------------------------------------------
# The public surface.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParsedSQL:
    """A routable statement: the router spec; the SQL's output column
    order (group keys and aggregate aliases as written); and the
    post-aggregation clauses applied on top of whichever layout
    answers — HAVING (as filters over output aggregate columns),
    ORDER BY ((col, ascending) terms over output columns), LIMIT."""

    spec: AggQuery | ScanQuery | TableAggQuery | TableScanQuery
    columns: tuple[str, ...]
    order: tuple[tuple[str, bool], ...]
    having: tuple[Pred, ...] = ()
    limit: int | None = None


def parse_sql(sql: str) -> ParsedSQL:
    """Lower a SQL string to the router's spec language, or raise
    :class:`UnsupportedSQL`. Pure driver-side analysis — no Spark."""
    node = _ast(sql)
    if node.get("qualify") or node.get("sample"):
        raise UnsupportedSQL("QUALIFY/SAMPLE are not routable")
    if node.get("cte_map", {}).get("map"):
        raise UnsupportedSQL("CTEs are not routable")
    if node.get("aggregate_handling") != "STANDARD_HANDLING":
        raise UnsupportedSQL("non-standard aggregate handling")
    from_node = node["from_table"]
    corpus_in_from = _corpus_base_tables(from_node, set()) & set(CORPUS_TABLES)
    if corpus_in_from:
        # S15: corpus families (documents/events, optionally joined to
        # declared dims) lower onto TableAggQuery and route through
        # the corpus catalog.
        if len(corpus_in_from) != 1:
            raise UnsupportedSQL("more than one corpus fact table")
        return _parse_corpus(node, next(iter(corpus_in_from)))
    order, limit, distinct = _modifiers(node)

    chain, part, supp = _parse_from(node["from_table"])
    filters = _parse_where(node.get("where_clause"))
    allowed = _LINEITEM_COLS | {a for a, d in DIM_ATTRS.items() if d <= chain}
    if part:
        allowed = allowed | PART_ATTRS
    if supp:
        allowed = allowed | SUPP_ATTRS
    for p in filters:
        bad = p.cols() - allowed
        if bad:
            raise UnsupportedSQL(f"filter on unknown column {sorted(bad)[0]}")

    group_nodes = node.get("group_expressions", [])
    sets = node.get("group_sets", [])
    if group_nodes and sets != [list(range(len(group_nodes)))]:
        raise UnsupportedSQL("GROUPING SETS/ROLLUP/CUBE are not routable")

    out: list[str] = []
    aggs: list[AggCall] = []
    seen_groups: list[str] = []
    truncs: dict[str, tuple[str, str]] = {}  # alias -> (unit, source col)
    agg_alias_by_key: dict[str, str] = {}
    for item in node["select_list"]:
        if isinstance(item, dict) and item.get("class") == "WINDOW":
            raise UnsupportedSQL(
                "window functions (OVER clause) are not routable"
            )
        call = _match_agg(item)
        if call is not None:
            if not call.alias:
                raise UnsupportedSQL("aggregate without an alias")
            aggs.append(call)
            out.append(call.alias)
            # HAVING matches the aggregate EXPRESSION; map its
            # normalized form (alias stripped by _norm) to the alias.
            agg_alias_by_key[_key(item)] = call.alias
            continue
        tr = _match_trunc(item)
        if tr is not None:
            alias = item.get("alias", "")
            if not alias:
                raise UnsupportedSQL("date_trunc key without an alias")
            if tr[1] not in allowed:
                raise UnsupportedSQL(f"date_trunc over unknown column {tr[1]}")
            truncs[alias] = tr
            out.append(alias)
            seen_groups.append(alias)
            continue
        col = _colref(item)
        if col is None:
            raise UnsupportedSQL("select item is neither group column nor aggregate")
        if item.get("alias"):
            raise UnsupportedSQL("aliased group columns are not routable")
        out.append(col)
        seen_groups.append(col)
    if len(set(out)) != len(out):
        raise UnsupportedSQL("duplicate output column names")
    for a in aggs:
        if a.fn == "count_distinct" and a.measure not in allowed:
            raise UnsupportedSQL(
                f"COUNT(DISTINCT) over unknown column {a.measure}"
            )
        if a.fn != "count_star" and a.measure in MEASURES:
            m = MEASURES[a.measure]
            # an arm-home measure is only reachable when its table is
            # actually joined (same scoping rule as plain columns)
            if m.home != "lineitem" and m.source_col not in allowed:
                raise UnsupportedSQL(
                    f"measure column {m.source_col} is not reachable "
                    "from the statement's joins"
                )

    # Resolve GROUP BY terms: a plain column, a select-list trunc alias,
    # or the full date_trunc expression repeated (matched structurally
    # back to its select alias). SELECT DISTINCT over bare keys is the
    # same logical shape with every selected item as a key.
    groups: list[str] = []
    if distinct:
        if aggs:
            raise UnsupportedSQL("DISTINCT over aggregates is not routable")
        if group_nodes:
            raise UnsupportedSQL("DISTINCT combined with GROUP BY is not routable")
        groups = list(seen_groups)
    for g in group_nodes:
        col = _colref(g)
        if col is not None:
            if col in truncs or col in allowed:
                groups.append(col)
                continue
            raise UnsupportedSQL(f"GROUP BY over unknown column {col}")
        tr = _match_trunc(g)
        if tr is not None:
            alias = next((a for a, t in truncs.items() if t == tr), None)
            if alias is None:
                raise UnsupportedSQL("grouped date_trunc key is not selected")
            groups.append(alias)
            continue
        raise UnsupportedSQL("GROUP BY over a non-routable expression")

    if groups or aggs:
        # Aggregating/DISTINCT form: every bare select column must be a
        # grouping key (in the scan form below, bare columns are the
        # projection).
        for col in seen_groups:
            if col not in groups:
                raise UnsupportedSQL(f"bare column {col} is not a grouping key")
    having = _parse_having(node.get("having"), agg_alias_by_key)

    if not groups and not aggs:
        # Pure projection+filter scan over lineitem.
        if chain or part or supp:
            raise UnsupportedSQL("row-level scans over joins are not routable")
        if not (set(out) <= _LINEITEM_COLS):
            raise UnsupportedSQL("scan selects columns outside lineitem")
        if not ({c for c, _ in order} <= set(out)):
            raise UnsupportedSQL("scan ORDER BY must use selected columns")
        return ParsedSQL(
            ScanQuery(tuple(out), filters), tuple(out), order, (), limit
        )

    # Grouped — or, with no GROUP BY, a GLOBAL — aggregate; aggs may
    # be empty (the DISTINCT / GROUP-BY-without-aggregates shape). The
    # global form is the cube's best case: COUNT(*)/SUM over the whole
    # fact re-aggregates a scale-invariant projection to ONE row.
    if sorted(seen_groups) != sorted(groups):
        raise UnsupportedSQL("every grouping key must be selected exactly once")
    if not ({c for c, _ in order} <= set(out)):
        raise UnsupportedSQL("ORDER BY must use output columns")
    spec = AggQuery(
        filters,
        tuple(groups),
        tuple(aggs),
        tuple((a, u, c) for a, (u, c) in truncs.items()),
    )
    if minimal_chain(spec) != chain:
        # The statement joins DEEPER than its attributes require —
        # semantically meaningful (inner joins may drop orphan fact
        # rows; FK integrity is never assumed), so the declared depth
        # rides along. When minimal, chain stays None so specs compare
        # structurally wherever they came from.
        spec = _dc.replace(spec, chain=chain)
    if part:
        # the part join is declared, attributes or not (same
        # orphan-dropping argument as the chain)
        spec = _dc.replace(spec, part=True)
    if supp:
        spec = _dc.replace(spec, supp=True)
    return ParsedSQL(spec, tuple(out), order, having, limit)


def route_sql(
    spark: SparkSession, sf_dir: str, sql: str
) -> tuple[DataFrame, str]:
    """Parse ``sql`` and answer it via the projection router. Returns
    (result, chosen) with ``chosen`` the layout name or "raw". Output
    columns follow the SQL's select order; HAVING/ORDER BY/LIMIT are
    applied on top of the routed plan (all three operate on FINAL
    output values, so they fold on every path — and Catalyst's
    EliminateSorts drops the router's default group-key sort when the
    SQL asks for a different one). Raises :class:`UnsupportedSQL` for
    anything outside the routable family — Engine.sql catches that and
    runs spark.sql."""
    from pyspark.sql import functions as F

    parsed = parse_sql(sql)
    if isinstance(parsed.spec, ScanQuery):
        df, chosen = route_scan(spark, sf_dir, parsed.spec)
    elif isinstance(parsed.spec, TableScanQuery):
        try:
            df, chosen = route_corpus_scan(spark, sf_dir, parsed.spec)
        except ValueError as e:
            raise UnsupportedSQL(str(e)) from e
    elif isinstance(parsed.spec, TableAggQuery):
        try:
            df, chosen = route_corpus(spark, sf_dir, parsed.spec)
        except ValueError as e:
            raise UnsupportedSQL(str(e)) from e
    else:
        try:
            df, chosen = route(spark, sf_dir, parsed.spec)
        except ValueError as e:
            # shapes the spec language parses but no plan expresses:
            # a predicate mixing lineitem and dimension columns, an
            # unknown grouping attribute, a contradictory chain depth
            raise UnsupportedSQL(str(e)) from e
    df = df.select(*parsed.columns)
    for p in parsed.having:
        df = df.filter(p.column())
    if parsed.order:
        df = df.orderBy(
            *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in parsed.order]
        )
    if parsed.limit is not None:
        df = df.limit(parsed.limit)
    return df, chosen


# ---------------------------------------------------------------------------
# Driver queries: SQL TEXT in, projection answer out. The oracle for
# each is the VERY SAME SQL string — DuckDB computes it from the raw
# tables while the engine answers from a projection, so the check is
# precisely "the rewrite is invisible".
# ---------------------------------------------------------------------------

from ..registry import query  # noqa: E402  (import cycle-safe: registry has no plans dep)

_SQL_PRICING = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {SUM_SQL['quantity']} AS sum_qty,
  {SUM_SQL['discount']} AS sum_disc,
  {SUM_SQL['charge']} AS sum_charge,
  {SUM_SQL['quantity']} / COUNT(l_quantity) AS avg_qty,
  COUNT(l_extendedprice) AS count_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("r131_sql_pricing", oracle=_SQL_PRICING, tags=("S13", "E1", "A1", "O1"))
def r131_sql_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door end-to-end: the pricing-summary family as a
    plain SQL STRING (a cutoff and aggregate set distinct from
    q05_routed_pricing's spec-object form), parsed via the DuckDB AST,
    lowered to an AggQuery, and routed onto the ~15k-row pricing cube —
    while the driver's oracle runs the IDENTICAL string on the raw
    lineitem table. A user of the reference pastes their SQL unchanged;
    the engine picks the layout (reference README.md:102-104)."""
    df, chosen = route_sql(spark, sf_dir, _SQL_PRICING)
    assert chosen == "pricing_cube", chosen  # routing regression guard
    return df


_SQL_ZSCAN = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
FROM lineitem
WHERE l_partkey BETWEEN 20 AND 80 AND l_suppkey >= 3
ORDER BY l_orderkey, l_linenumber
"""


@query("r88_sql_zorder_scan", oracle=_SQL_ZSCAN, tags=("S12", "S13", "E1", "P2"))
def r88_sql_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-shaped SQL through the front door: the two-key range
    predicate is recognized as Z-order-curve-acceleratable, so
    route_scan answers from the clustered layout (row-group skipping on
    BOTH keys, metric-asserted in tests/test_zorder.py) and the ORDER
    BY is applied on top; the oracle runs the same string on the raw
    table — identical rows, different physical layout."""
    df, chosen = route_sql(spark, sf_dir, _SQL_ZSCAN)
    assert chosen == "zorder_lineitem", chosen
    return df


_SQL_DATE_SCAN = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '2000-03-01 00:00:00' AND TIMESTAMP '2000-04-30 23:59:59'
ORDER BY l_orderkey, l_linenumber
"""


@query("q28_sql_date_scan", oracle=_SQL_DATE_SCAN, tags=("S14", "S13", "E1", "P2"))
def q28_sql_date_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-slice scan through the front door: the shipdate range
    selects the ship-month-partitioned layout (sources/dated.py), the
    router derives the month bounds from the predicate — a SUPERSET
    constraint, so a derivation bug could only read more, never answer
    wrong — and the scan prunes to the two month directories the range
    touches before opening a file; the oracle runs the same string on
    the raw table. The projected l_returnflag is outside the Z-order
    layout's stored set, so this shape exercises the scan router's
    SECOND layout preference."""
    df, chosen = route_sql(spark, sf_dir, _SQL_DATE_SCAN)
    assert chosen == "dated_lineitem", chosen
    return df


_SQL_COUNT_DISTINCT = """
SELECT
  r_name,
  COUNT(DISTINCT n_name) AS nations,
  COUNT(DISTINCT l_suppkey) AS suppliers,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@query(
    "r176_sql_count_distinct", oracle=_SQL_COUNT_DISTINCT, tags=("S13", "E1", "A2")
)
def r176_sql_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) through the front door, mixing a dimension-side
    target (n_name) with a fact-side one (l_suppkey) over the full
    chain. No cube stores the supplier-key value set, so the router
    lowers onto the bucketed spine: the zero-exchange row-level join
    carries both targets to a single distinct-aggregate — Spark plans
    COUNT(DISTINCT) via its expand-based rewrite, and the bucket
    layout still feeds it without a join exchange."""
    df, chosen = route_sql(spark, sf_dir, _SQL_COUNT_DISTINCT)
    assert chosen == "bucketed_spine", chosen
    return df


_SQL_PART_ARM = f"""
SELECT
  p_type,
  l_returnflag,
  {SUM_SQL['revenue']} AS rev,
  COUNT(*) AS n
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size >= 25
GROUP BY p_type, l_returnflag
ORDER BY p_type, l_returnflag
"""


@query("q14_sql_part_revenue", oracle=_SQL_PART_ARM, tags=("S13", "E1", "J1", "A1"))
def q14_sql_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND dimension arm through the front door: revenue by
    part type and return flag with a part-side size filter. The raw
    two-arm plan partial-aggregates the fact below the join keyed by
    (l_partkey, l_returnflag) — the TPC-H lineitem:part fan-in (~30
    rows per part) makes the partial rows that cross the shuffle ~30x
    slimmer than the fact — then joins the part arm projected to just
    (p_partkey, p_type, p_size) and re-aggregates. The part join is
    declared semantics (drops lineitems with no matching part; FK
    integrity never assumed), exactly like the order chain."""
    df, chosen = route_sql(spark, sf_dir, _SQL_PART_ARM)
    assert chosen == "raw", chosen
    return df


_SQL_TRIPLE_ARM = f"""
SELECT
  o_orderstatus,
  p_brand,
  COUNT(DISTINCT s_name) AS suppliers,
  {SUM_SQL['revenue']} AS rev,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size >= 20
GROUP BY o_orderstatus, p_brand
ORDER BY o_orderstatus, p_brand
"""


@query("r163_sql_triple_arm", oracle=_SQL_TRIPLE_ARM, tags=("S13", "E1", "J1", "A1"))
def r163_sql_triple_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three dimension arms in one statement: the order chain
    (depth 1), the part arm with a part-side filter, and the supplier
    arm feeding a COUNT(DISTINCT). The raw plan partial-aggregates the
    fact below the joins keyed by (l_orderkey, l_partkey, l_suppkey) —
    at that key the partial is near row-level, which is exactly the
    honest plan: each arm then joins independently on its own key and
    only the slim projected attribute columns cross the shuffles."""
    df, chosen = route_sql(spark, sf_dir, _SQL_TRIPLE_ARM)
    assert chosen == "raw", chosen
    return df


_SQL_ARM_MEASURES = f"""
SELECT
  c_mktsegment,
  {SUM_SQL['order_total']} AS line_weighted_order_value,
  {SUM_SQL['revenue']} AS rev,
  {MIN_SQL['cust_acctbal']} AS min_bal,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("r157_sql_arm_measures", oracle=_SQL_ARM_MEASURES, tags=("S13", "E1", "A1", "J1"))
def r157_sql_arm_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arm-home MEASURES through the front door: order- and customer-
    level money columns aggregated over the declared chain-2 join,
    alongside a lineitem measure. The sums weight by lineitem
    multiplicity — exactly what the SQL says — and compute in the
    engine's fixed-point arithmetic AFTER the join on the row-level
    plan (an arm measure has no value below its join, so the planner
    switches off the partial-aggregation form for the statement)."""
    df, chosen = route_sql(spark, sf_dir, _SQL_ARM_MEASURES)
    assert chosen == "raw", chosen
    return df


_SQL_MONTHLY = f"""
SELECT
  date_trunc('month', l_shipdate) AS ship_month,
  l_returnflag,
  {SUM_SQL['revenue']} AS rev,
  {MIN_SQL['quantity']} AS min_qty,
  {MAX_SQL['base_price']} AS max_price,
  COUNT(*) AS n
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1999-01-01 00:00:00' AND TIMESTAMP '2001-06-30 00:00:00'
GROUP BY ship_month, l_returnflag
ORDER BY ship_month, l_returnflag
"""


@query("r89_sql_monthly_pricing", oracle=_SQL_MONTHLY, tags=("S13", "E1", "A1"))
def r89_sql_monthly_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grain rollup through the front door: a monthly revenue/
    min/max summary with a date-range predicate, as plain SQL. The
    month key is a pure function of the cube's day-grained group key,
    so coarse groups are unions of whole stored groups and every
    measure (sums, counts, min/max partials) re-aggregates exactly —
    the query reads the ~15k-row cube while the oracle runs the
    identical string over raw lineitem."""
    df, chosen = route_sql(spark, sf_dir, _SQL_MONTHLY)
    assert chosen == "pricing_cube", chosen
    return df


_SQL_CHAIN_SEGMENT = f"""
SELECT
  c_mktsegment,
  date_trunc('month', o_orderdate) AS order_month,
  {SUM_SQL['revenue']} AS rev,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE', 'AMERICA')
GROUP BY c_mktsegment, order_month
ORDER BY c_mktsegment, order_month
"""


@query("q04_sql_chain_segment", oracle=_SQL_CHAIN_SEGMENT, tags=("S13", "E1", "J1", "A1"))
def q04_sql_chain_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-chain SQL through the front door: revenue by market
    segment and ORDER month with an IN-list region predicate, over the
    declared 5-table join. The widened denorm stores the order- and
    customer-level attributes (c_mktsegment, o_orderdate at full
    per-order resolution) alongside the region/nation names, so the
    whole statement folds onto the exchange-free rollup⋈denorm spine —
    the IN list is constant within each stored group — while the
    oracle runs the identical string as the raw 5-table join."""
    df, chosen = route_sql(spark, sf_dir, _SQL_CHAIN_SEGMENT)
    assert chosen == "order_revenue_star", chosen
    return df


_SQL_DISTINCT = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
WHERE l_returnflag = 'R' OR l_linestatus = 'O'
ORDER BY l_returnflag, l_linestatus
"""


@query("r152_sql_distinct_keys", oracle=_SQL_DISTINCT, tags=("S13", "E1", "A2"))
def r152_sql_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT through the front door, with a disjunctive
    predicate. The distinct key combinations of the raw fact are a
    projection of the cube's stored group keys (every raw row maps to
    exactly one stored group), and ANY boolean function of group-key
    columns is constant within a group — so the engine answers from
    the ~15k-row cube without touching the fact table."""
    df, chosen = route_sql(spark, sf_dir, _SQL_DISTINCT)
    assert chosen == "pricing_cube", chosen
    return df


_SQL_MIXED_STAR = f"""
SELECT
  l_returnflag,
  r_name,
  {SUM_SQL['revenue']} AS rev,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY l_returnflag, r_name
ORDER BY l_returnflag, r_name
"""


@query("r122_sql_mixed_star_group", oracle=_SQL_MIXED_STAR, tags=("bench", "S13", "E1", "J1", "A1"))
def r122_sql_mixed_star_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed fact+dimension grouping through the front door: the
    rollup pair stores no lineitem attributes, but the widened star
    cube keys (region, nation, returnflag, linestatus, shipdate) —
    ~375k rows at any corpus scale — so revenue by returnflag x region
    folds onto stored partials instead of scanning the fact table."""
    df, chosen = route_sql(spark, sf_dir, _SQL_MIXED_STAR)
    assert chosen == "star_date_cube", chosen
    return df


_SQL_SPINE_SEGMENT = f"""
SELECT
  c_mktsegment,
  l_returnflag,
  {SUM_SQL['revenue']} AS rev,
  {MIN_SQL['quantity']} AS min_qty,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY c_mktsegment, l_returnflag
ORDER BY c_mktsegment, l_returnflag
"""


@query("q10_sql_segment_group", oracle=_SQL_SPINE_SEGMENT, tags=("bench", "S13", "E1", "J1", "A1"))
def q10_sql_segment_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7 closed the q10 gap (r6-VERDICT item 5, decided SHIP —
    with a better key set than proposed): this per-order-segment x
    lineitem-flag grouping was the last routed >2x shape, served by
    the zero-exchange spine but fact-scan-bound. Every per-order
    attribute the family groups has a FIXED domain (|segments|=5,
    |priorities|=5, |statuses|=3), so the segment cube stores all
    pricing partials keyed by those x the lineitem flags — 450 rows
    at EVERY corpus scale — and this statement now reads stored
    partials instead of scanning the fact. The round-6 premise
    ("cubing per-order attributes grows toward the order count")
    holds only for o_orderdate, which stays out of the cube's keys:
    DATED segment shapes still lower onto the spine (the family's
    spine fallback keeps its own coverage in tests/test_routing.py)."""
    df, chosen = route_sql(spark, sf_dir, _SQL_SPINE_SEGMENT)
    assert chosen == "segment_cube", chosen
    return df


_SQL_DOCS_PROFILE = f"""
SELECT
  lang,
  source,
  {CORPUS_SUM_SQL['documents']['tokens']} AS total_tokens,
  {CORPUS_SUM_SQL['documents']['chars']} AS total_chars,
  {CORPUS_AVG_SQL['documents']['chars']} AS avg_chars,
  {CORPUS_MIN_SQL['documents']['tokens']} AS min_tokens,
  COUNT(*) AS n_docs
FROM documents
WHERE lang IN ('en', 'de', 'fr')
GROUP BY lang, source
ORDER BY lang, source
"""


@query("r164_sql_docs_profile", oracle=_SQL_DOCS_PROFILE, tags=("S15", "E1", "A1", "text"))
def r164_sql_docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus router's flagship (S15): a text-profile statement
    whose token-count aggregates spell out the engine's whitespace
    tokenizer — a full-corpus regex pass if run raw — answered from
    the (lang, source) doc-stats cube, where that pass already ran
    once at deploy time. The language filter folds (group-key IN), the
    integer sums stay exact BIGINT, and the oracle runs the identical
    string over the raw documents table: the value of the rewrite is
    precisely that the regex work is not repeated per query."""
    df, chosen = route_sql(spark, sf_dir, _SQL_DOCS_PROFILE)
    assert chosen == "docs_stats_cube", chosen
    return df


_SQL_EVENTS_ROLLUP = f"""
SELECT
  date_trunc('day', ts) AS event_day,
  event_type,
  {CORPUS_SUM_SQL['events']['value']} AS total_value,
  {CORPUS_MAX_SQL['events']['value']} AS max_value,
  COUNT(*) AS n_events
FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' AND event_type != 'error'
GROUP BY event_day, event_type
ORDER BY event_day, event_type
"""


@query("r165_sql_events_rollup", oracle=_SQL_EVENTS_ROLLUP, tags=("S15", "E1", "A1", "ST1"))
def r165_sql_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series SQL through the corpus router (S15): a per-day
    per-type event rollup with a GRAIN-BOUNDARY time-range predicate,
    answered from the (event_type, hour) cube — the day grouping
    re-aggregates stored hour groups exactly, and ``ts >= midnight``
    (an hour boundary) is a row-set equivalence on the stored key
    (corpus_routing module docstring spells out why >=/< fold and
    <=/=/BETWEEN must not). The type filter folds on the other group
    key, and the value partials re-aggregate in the same int64
    fixed-point arithmetic the DECIMAL(18,2) oracle form computes.
    The sub-hour twin of this statement routes raw — pinned in
    tests/test_corpus_routing.py."""
    df, chosen = route_sql(spark, sf_dir, _SQL_EVENTS_ROLLUP)
    assert chosen == "events_hourly_cube", chosen
    return df


_SQL_EVENTS_SCAN = """
SELECT event_id, ts, event_type, value
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-14 23:59:59'
  AND value >= 250.0
ORDER BY event_id
"""


@query("r154_sql_events_scan", oracle=_SQL_EVENTS_SCAN, tags=("S15", "S14", "E1", "P2"))
def r154_sql_events_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level time-slice scan over the event log through the front
    door: the ts range selects the day-partitioned events layout
    (sources/dated.py dated_events), the router derives the day bounds
    from the predicate — a SUPERSET constraint, over-read-only by
    construction — and the scan opens five day directories out of the
    corpus's thirty before any file is read; the value filter and
    exact ts bounds apply row-level after. The oracle runs the same
    string on the raw table: identical rows, different layout."""
    df, chosen = route_sql(spark, sf_dir, _SQL_EVENTS_SCAN)
    assert chosen == "dated_events", chosen
    return df


_SQL_STOPWORDS = f"""
SELECT
  lang,
  {CORPUS_SUM_SQL['documents']['stopwords']} AS total_stopwords,
  {CORPUS_SUM_SQL['documents']['tokens']} AS total_tokens,
  {CORPUS_AVG_SQL['documents']['stopwords']} AS avg_stopwords,
  COUNT(*) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query(
    "r162_sql_stopword_profile", oracle=_SQL_STOPWORDS, tags=("S15", "E1", "L5", "text")
)
def r162_sql_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stopword ratios per language from the doc-stats cube: the
    per-doc stopword-token counts (a second deploy-time regex+filter
    pass, like the token counts) are stored as exact integer partials,
    so corpus-level ratios (SUM(stop)/SUM(tokens), one IEEE division
    over exact integers) are bit-stable on both engines, and the query
    reads ~80 stored rows instead of re-tokenizing the corpus. The quality-gate recipe (operators/quality.py) at corpus
    grain, answered from the warehouse."""
    df, chosen = route_sql(spark, sf_dir, _SQL_STOPWORDS)
    assert chosen == "docs_stats_cube", chosen
    return df


_SQL_USER_PROJ = f"""
SELECT
  o_orderpriority,
  l_returnflag,
  {SUM_SQL['revenue']} AS rev,
  {MAX_SQL['quantity']} AS max_qty,
  COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_returnflag
ORDER BY o_orderpriority, l_returnflag
"""


@query(
    "r155_user_projection_sql", oracle=_SQL_USER_PROJ, tags=("S16", "S13", "E1", "A1")
)
def r155_user_projection_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 end-to-end: the user DECLARES a projection — keys
    (o_orderpriority, l_returnflag), a chain-1 mixed grouping no
    built-in stores (the star cube is chain-4; per-order priorities
    against fact attributes is exactly the shape a team would
    materialize for its own mix) — and from that moment the identical
    SQL statement routes onto it instead of the raw chain-1 join,
    while the oracle runs the same string over the raw tables. The
    deploy is idempotent (ensure_projection), so the query models the
    steady state: the view exists, the statement arrives, the caller
    never names it."""
    from ..sources.user_projections import ensure_projection

    ensure_projection(
        spark, sf_dir, "prio_flag", ("o_orderpriority", "l_returnflag")
    )
    df, chosen = route_sql(spark, sf_dir, _SQL_USER_PROJ)
    assert chosen == "user:prio_flag", chosen
    return df


# ---------------------------------------------------------------------------
# Round 7: the corpus star's declared DIM join (sources registry).
# The engine knows `sources` as a deployed dim table; DuckDB has no
# such view, so the oracles prepend the dim's derivation CTE
# (SOURCES_DIM_SQL — the same deterministic spelling the deploy uses),
# making the whole dim arm differentially checkable.
# ---------------------------------------------------------------------------

from ..sources.corpus_cubes import SOURCES_DIM_SQL as _SOURCES_DIM_SQL  # noqa: E402

_SQL_SOURCES_KIND = f"""
SELECT
  s_kind,
  lang,
  {CORPUS_SUM_SQL['documents']['tokens']} AS total_tokens,
  {CORPUS_AVG_SQL['documents']['chars']} AS avg_chars,
  COUNT(*) AS n_docs
FROM documents
JOIN sources ON source = src_id
WHERE s_tier = 'curated'
GROUP BY s_kind, lang
ORDER BY s_kind, lang
"""


@query(
    "r170_sql_sources_dim_cube",
    oracle=f"WITH sources AS (\n{_SOURCES_DIM_SQL}\n)\n{_SQL_SOURCES_KIND}",
    tags=("S15", "E1", "J4", "L5"),
)
def r170_sql_sources_dim_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus star through the front door: documents joined to the
    SOURCES registry dim, grouped by a dim attribute, filtered on
    another. The statement folds onto the doc-stats cube — the cube
    stores the fact-side join key (source), and dim attributes are
    per-source constants, so joining the cube's |langs|x|sources|
    groups to the broadcast registry equals joining the rows then
    grouping — and the full-corpus tokenizer pass stays at deploy
    time. The oracle derives the identical dim as a CTE and runs the
    raw join on DuckDB."""
    df, chosen = route_sql(spark, sf_dir, _SQL_SOURCES_KIND)
    assert chosen == "docs_stats_cube", chosen
    return df


_SQL_SOURCES_TIER_RAW = f"""
SELECT
  s_tier,
  {CORPUS_SUM_SQL['documents']['chars']} AS total_chars,
  COUNT(*) AS n_docs
FROM documents
JOIN sources ON source = src_id
WHERE n_chars >= 120
GROUP BY s_tier
ORDER BY s_tier
"""


@query(
    "r171_sql_sources_dim_raw",
    oracle=f"WITH sources AS (\n{_SOURCES_DIM_SQL}\n)\n{_SQL_SOURCES_TIER_RAW}",
    tags=("S15", "E1", "J4", "A1"),
)
def r171_sql_sources_dim_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dim arm's REFUSE side: the row-level n_chars filter is no
    cube group key, so the cube correctly declines and the router
    answers with the raw plan — documents broadcast-joined to the
    registry, fused pre-projection, one shuffle. Same statement
    family as q24; what changed is one predicate, and what must NOT
    change is the answer's agreement with DuckDB."""
    df, chosen = route_sql(spark, sf_dir, _SQL_SOURCES_TIER_RAW)
    assert chosen == "raw", chosen
    return df


_SQL_DOCS_SCAN = """
SELECT doc_id, source, n_chars
FROM documents
WHERE lang = 'en' AND n_chars >= 150
ORDER BY doc_id
"""


@query("q36_sql_docs_scan", oracle=_SQL_DOCS_SCAN, tags=("S15", "S12", "E1", "P2"))
def q36_sql_docs_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level corpus slice through the front door: the lang
    predicate selects the CLUSTERED documents layout
    (sources/docstore.py — hive-partitioned by language, range-sorted
    by (source, n_chars) within), where lang is a real partition
    column, so Catalyst prunes to one language directory from the row
    predicate itself and the n_chars bound skips row groups inside it.
    At 100 TB the text column dominates the bytes; this is the layout
    that makes "the long English docs" open one directory instead of
    the corpus. The oracle runs the same string on the raw table:
    identical rows, different layout."""
    df, chosen = route_sql(spark, sf_dir, _SQL_DOCS_SCAN)
    assert chosen == "clustered_documents", chosen
    return df


_SQL_USER_ARM_PROJ = f"""
SELECT
  p_brand,
  l_returnflag,
  {SUM_SQL['revenue']} AS rev,
  {SUM_SQL['part_retail']} AS retail_weighted,
  COUNT(*) AS n
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, l_returnflag
ORDER BY p_brand, l_returnflag
"""


@query(
    "r172_user_arm_projection_sql",
    oracle=_SQL_USER_ARM_PROJ,
    tags=("S16", "S13", "E1", "J1", "A1"),
)
def r172_user_arm_projection_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 v2 end-to-end: the user declares a projection over the PART
    ARM — keys (p_brand, l_returnflag), measures including the
    arm-home p_retailprice sum — and the identical part-join SQL
    statement routes onto it. The view records that its build joined
    the part arm and claims exactly the statements declaring that
    join (inner-join orphan-drop semantics are part of the query's
    meaning, so arm sets must match exactly — never a superset). The
    oracle runs the same string over the raw tables."""
    from ..sources.user_projections import ensure_projection

    ensure_projection(
        spark, sf_dir, "brand_flag",
        ("p_brand", "l_returnflag"),
        ("revenue", "quantity", "part_retail"),
    )
    df, chosen = route_sql(spark, sf_dir, _SQL_USER_ARM_PROJ)
    assert chosen == "user:brand_flag", chosen
    return df


from ..sources.corpus_cubes import EVENT_TYPES_DIM_SQL as _EVENT_TYPES_DIM_SQL  # noqa: E402

_SQL_EVENTS_CATEGORY = f"""
SELECT
  e_category,
  date_trunc('day', ts) AS day,
  {CORPUS_SUM_SQL['events']['value']} AS total_value,
  COUNT(*) AS n
FROM events
JOIN event_types ON event_type = et_id
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
GROUP BY e_category, day
ORDER BY e_category, day
"""


@query(
    "q03_sql_events_category_rollup",
    oracle=f"WITH event_types AS (\n{_EVENT_TYPES_DIM_SQL}\n)\n{_SQL_EVENTS_CATEGORY}",
    tags=("S15", "E1", "J4", "ST1"),
)
def q03_sql_events_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVENTS star's registry arm — the second CORPUS_DIMS
    instance, proving the dim machinery is table-generic: daily value
    by event CATEGORY (an engine-maintained taxonomy over event_type)
    folds onto the hourly cube, because the cube stores the fact-side
    join key and taxonomy attributes are per-type constants; the
    hour-boundary ts filter folds by the grain rule, and the day
    grouping re-aggregates stored hours exactly. The oracle derives
    the identical taxonomy as a CTE on DuckDB."""
    df, chosen = route_sql(spark, sf_dir, _SQL_EVENTS_CATEGORY)
    assert chosen == "events_hourly_cube", chosen
    return df
