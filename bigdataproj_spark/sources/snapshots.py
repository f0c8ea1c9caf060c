"""S22: snapshot reads (time travel) — the reader-side counterpart of
the warehouse's write-side discipline.

Every layout in this engine publishes NEW versioned files and swings a
session-scoped serving memo (the no-in-place-writes contract
:mod:`~.txn` pins), and :func:`~.maintenance.gc_warehouse` got a
Delta-style retention window in round 9 so superseded versions
survive a configurable grace period. Those two facts together mean a
PAST warehouse state is fully reconstructible from (a) the serving
memos as they stood at that commit and (b) the files they referenced
— which the GC window is keeping anyway. S22 just writes that down:

- a **commit ledger**: after every committed warehouse mutation
  (ingest / MERGE / UPDATE / DELETE / TTL expiry / OPTIMIZE),
  :class:`~.txn.WarehouseTxn` appends a numbered snapshot of the
  serving state — the SAME capture its rollback machinery already
  takes on entry, so a "commit" here is one more O(#layouts)
  deepcopy, no file I/O and no data-path cost;
- an **``as_of`` read context**: swaps the session's serving state to
  a ledger entry, re-points the engine-owned temp views, and restores
  everything on exit — every read issued inside (routed, scan,
  verbatim SQL) answers from the warehouse AS OF that commit;
- the **SQL spelling** ``... FOR SYSTEM_VERSION AS OF <n>`` and
  ``DESCRIBE HISTORY`` on the front door (engine.py), following the
  Delta/Iceberg convention users already know — with one deliberate
  strengthening: this engine's snapshots are WAREHOUSE-WIDE, so a
  multi-table statement reads ONE consistent commit across all its
  tables (per-table ``AS OF`` versions that disagree are refused).

Time travel reaches exactly as far back as VACUUM retention allows —
Delta's documented contract. ``gc_warehouse(retain_seconds=w)`` prunes
ledger entries older than the window FIRST and then keeps every file a
surviving entry references, so a reachable version can never lose its
files; with the default ``retain_seconds=0`` the ledger is cleared and
superseded files go, exactly today's eager-GC behavior.

Scale posture: a ledger entry is a few dozen dict entries of
paths/names — O(#layouts), independent of data size. ``as_of`` itself
moves no data; the reads inside it run the same routed/pruned plans
they always run, just through older memo pointers. The SQL spelling
pins its result eagerly (``localCheckpoint``) because the restore on
exit would invalidate a lazy VERBATIM plan over re-pointed temp
views; for large row-level historical scans, use the ``as_of``
context manager directly and consume the DataFrame inside it — the
routed/scan relations resolve their file paths at plan time, so those
handles stay valid after exit.

Mutations inside a snapshot read are refused (the warehouse is
read-only as-of the past): WarehouseTxn's entry guard covers every
DML/ingest path, and OPTIMIZE/VACUUM check the same flag.
"""

from __future__ import annotations

import copy
import time
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LEDGER_KEY = "_bdp_snapshots"
_ACTIVE_KEY = "_bdp_as_of_active"

# the serving-state dicts a commit snapshots — shared with WarehouseTxn
# (one definition of "the serving state", two consumers)
from .txn import _STATE_KEYS  # noqa: E402

_USER_PROJ_ROOTS = ("_bdp_user_projections", "_bdp_corpus_user_projections")


def _ledger(spark: SparkSession, sf_dir: str) -> list[dict[str, Any]]:
    root: dict = spark.__dict__.setdefault(_LEDGER_KEY, {})
    return root.setdefault(sf_dir, [])


def _capture(spark: SparkSession, sf_dir: str) -> dict[str, Any]:
    """One commit's serving-state snapshot. ``state`` is a deepcopy of
    the plain memo/ledger dicts; ``user_proj`` keeps the catalog
    ENTRY OBJECTS by reference plus their current path — the router's
    open() closures capture the per-fixture catalog dict by identity,
    so as_of must splice the original objects back into that SAME
    dict (txn rollback's discipline), not install copies."""
    sd = spark.__dict__
    state = {k: copy.deepcopy(sd.get(k)) for k in _STATE_KEYS}
    user_proj: dict[str, dict[str, tuple[Any, str]]] = {}
    for root_key in _USER_PROJ_ROOTS:
        cat = (sd.get(root_key) or {}).get(sf_dir, {})
        user_proj[root_key] = {n: (u, u.path) for n, u in cat.items()}
    return {"state": state, "user_proj": user_proj}


def ensure_base(spark: SparkSession, sf_dir: str) -> None:
    """Record version 0 — the pre-any-mutation base state — the first
    time a mutation is about to touch this warehouse."""
    led = _ledger(spark, sf_dir)
    if not led:
        led.append(
            {
                "version": 0,
                "note": "base",
                "wall": time.time(),
                **_capture(spark, sf_dir),
            }
        )


def record_commit(spark: SparkSession, sf_dir: str, note: str) -> None:
    """Append the post-commit serving state to the ledger. Called by
    WarehouseTxn on successful OUTER exit (and by optimize, which
    swings memos without a txn) — never on rollback, so a failed
    batch leaves no version."""
    led = _ledger(spark, sf_dir)
    led.append(
        {
            "version": (led[-1]["version"] + 1) if led else 0,
            "note": note,
            "wall": time.time(),
            **_capture(spark, sf_dir),
        }
    )


def history(spark: SparkSession, sf_dir: str) -> list[dict[str, Any]]:
    """The reachable commits, oldest first: [{version, note, wall}]."""
    return [
        {"version": e["version"], "note": e["note"], "wall": e["wall"]}
        for e in _ledger(spark, sf_dir)
    ]


def history_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY's result set."""
    rows = [(e["version"], e["note"]) for e in _ledger(spark, sf_dir)]
    return spark.createDataFrame(rows, "version int, note string")


def prune_ledger(spark: SparkSession, sf_dir: str, retain_seconds: float) -> int:
    """Drop ledger entries older than the retention window (VACUUM's
    first step); returns how many were dropped. retain_seconds=0
    clears the ledger — time travel reaches exactly as far back as
    VACUUM retention allows."""
    led = _ledger(spark, sf_dir)
    now = time.time()
    kept = [
        e for e in led
        if retain_seconds > 0 and now - e["wall"] < retain_seconds
    ]
    dropped = len(led) - len(kept)
    led[:] = kept
    return dropped


def snapshot_live_entries(spark: SparkSession, sf_dir: str):
    """Every path / table-name string a surviving ledger entry
    references for THIS fixture — VACUUM's snapshot half of the live
    set (the same memo walk gc_warehouse does over the serving
    state, applied to each retained version's state)."""
    out: list = []
    for e in _ledger(spark, sf_dir):
        state = e["state"]
        for memo_key in (
            "_bdp_projection_memo",
            "_bdp_zorder_memo",
            "_bdp_dated_memo",
            "_bdp_dated_events_memo",
            "_bdp_docstore_memo",
        ):
            for k, v in (state.get(memo_key) or {}).items():
                key_dir = k[1] if isinstance(k, tuple) else k
                if key_dir == sf_dir:
                    out.append(v)
        for (d, _n), names in (state.get("_bdp_bucketed_memo") or {}).items():
            if d == sf_dir:
                out.append(names)
        for (d, _t), path in (state.get("_bdp_tombstones") or {}).items():
            if d == sf_dir:
                out.append(path)
        for root_key in _USER_PROJ_ROOTS:
            for _name, (_obj, path) in e["user_proj"][root_key].items():
                out.append(path)
    return out


def _fact_view_names(spark: SparkSession, sf_dir: str) -> list[str]:
    """The fact views the ENGINE currently owns and still controls —
    computed against the LIVE ledgers before any swap, so a name the
    user took over after the snapshot is never clobbered."""
    sd = spark.__dict__
    ours: dict = sd.get("_bdp_fact_views") or {}
    ids: dict = sd.get("_bdp_fact_view_ids") or {}
    names = []
    for name in ("lineitem", "orders", "documents", "events"):
        if ours.get(name) != sf_dir:
            continue
        try:
            if not spark.catalog.tableExists(name):
                continue
            rec = ids.get(name)
            if rec is not None and spark.table(name).semanticHash() != rec:
                continue  # taken over: theirs wins
        except Exception:
            continue
        names.append(name)
    return names


def _repoint_views(
    spark: SparkSession, sf_dir: str, fact_names: list[str]
) -> None:
    """Re-register the given engine-owned fact views (and every
    engine-owned dim view) from the CURRENTLY ACTIVE serving state —
    called after each state swap, both directions. Mirrors
    Engine._ensure_current_views' relation choices and WarehouseTxn's
    dim re-pointing, minus the takeover checks (the caller resolved
    ownership against the live ledgers already)."""
    from pyspark.sql import functions as F  # noqa: F401

    from ..catalog import table
    from ..plans.corpus_routing import (
        CORPUS_DIMS,
        current_documents,
        current_events,
    )
    from ..plans.routing import current_lineitem, current_orders
    from ..schemas import FIXTURE_SCHEMAS

    sd = spark.__dict__
    ingested: set = sd.get("_bdp_ingested") or set()
    li_cols = tuple(FIXTURE_SCHEMAS["lineitem"].fieldNames())
    sources = {
        "lineitem": lambda: current_lineitem(spark, sf_dir).select(*li_cols),
        "orders": lambda: current_orders(spark, sf_dir),
        "documents": lambda: current_documents(spark, sf_dir),
        "events": lambda: current_events(spark, sf_dir),
    }
    ids: dict = sd.setdefault("_bdp_fact_view_ids", {})
    seen: dict = sd.setdefault("_bdp_fact_view_epoch", {})
    epochs: dict = sd.get("_bdp_mutation_epoch") or {}
    for name in fact_names:
        df = (
            sources[name]()
            if (sf_dir, name) in ingested
            else table(spark, sf_dir, name)
        )
        df.createOrReplaceTempView(name)
        ids[name] = spark.table(name).semanticHash()
        seen[name] = (sf_dir, epochs.get((sf_dir, name), 0))
    for name, owner_dir in (sd.get("_bdp_dim_views") or {}).items():
        d = CORPUS_DIMS.get(name)
        if d is not None:
            try:
                d.open(spark, owner_dir).createOrReplaceTempView(name)
            except Exception:
                pass


@contextmanager
def as_of(spark: SparkSession, sf_dir: str, version: int):
    """Read the warehouse as of a committed version. Every read built
    AND consumed inside the block — routed, scan, or verbatim SQL —
    answers from that commit; the live state is restored on exit.

    The swapped-in state is a DEEPCOPY of the ledger entry, so a read
    that lazily deploys a missing layout inside the block (writing a
    new versioned dir and memoizing it) computes correctly FROM THE
    SNAPSHOT STATE and its memo entry is discarded on exit; the files
    it wrote become ordinary superseded-version orphans for VACUUM.

    The whole SESSION's serving state is pinned while the block runs
    (the memos are session dicts keyed by fixture) — the engine's
    single-session execution model, same as WarehouseTxn's batches."""
    sd = spark.__dict__
    if sd.get("_bdp_txn_active"):
        raise ValueError(
            "cannot open a snapshot read inside a warehouse transaction"
        )
    if sd.get(_ACTIVE_KEY):
        raise ValueError(
            "snapshot reads do not nest — one AS OF version at a time "
            "(the engine's snapshots are warehouse-wide)"
        )
    led = _ledger(spark, sf_dir)
    entry = next((e for e in led if e["version"] == version), None)
    if entry is None:
        have = [e["version"] for e in led]
        raise ValueError(
            f"no reachable snapshot version {version} "
            f"(reachable: {have or 'none'}; versions are recorded per "
            "committed mutation and expire with VACUUM retention — "
            "gc_warehouse(retain_seconds=...) controls how far back "
            "time travel reaches)"
        )
    fact_names = _fact_view_names(spark, sf_dir)
    live_state = {k: sd.get(k) for k in _STATE_KEYS}
    # if the engine's view registration first happens INSIDE the
    # block, its ownership records land in the swapped (discarded)
    # ledgers while the temp views themselves survive — restoring
    # this marker forces a clean re-registration on the next
    # statement instead of serving stale snapshot views forever
    live_views_for = sd.get("_bdp_views_for")
    live_proj: dict[str, dict[str, tuple[Any, str]]] = {}
    for root_key in _USER_PROJ_ROOTS:
        cat = (sd.get(root_key) or {}).get(sf_dir, {})
        live_proj[root_key] = {n: (u, u.path) for n, u in cat.items()}
    sd[_ACTIVE_KEY] = True
    try:
        for k in _STATE_KEYS:
            snap = entry["state"].get(k)
            if snap is None:
                sd.pop(k, None)
            else:
                sd[k] = copy.deepcopy(snap)
        for root_key in _USER_PROJ_ROOTS:
            cat = sd.setdefault(root_key, {}).setdefault(sf_dir, {})
            cat.clear()
            for name, (obj, path) in entry["user_proj"][root_key].items():
                obj.path = path
                cat[name] = obj
        _repoint_views(spark, sf_dir, fact_names)
        yield
    finally:
        for k in _STATE_KEYS:
            if live_state.get(k) is None:
                sd.pop(k, None)
            else:
                sd[k] = live_state[k]
        for root_key in _USER_PROJ_ROOTS:
            cat = sd.setdefault(root_key, {}).setdefault(sf_dir, {})
            cat.clear()
            for name, (obj, path) in live_proj[root_key].items():
                obj.path = path
                cat[name] = obj
        _repoint_views(spark, sf_dir, fact_names)
        if live_views_for is None:
            sd.pop("_bdp_views_for", None)
        else:
            sd["_bdp_views_for"] = live_views_for
        sd[_ACTIVE_KEY] = False

# ---------------------------------------------------------------------------
# Driver query: time travel in, the pre-delete state out. The oracle
# computes the SAME historical state read-only (base + the insert,
# ignoring the later delete) — "the snapshot read answers exactly what
# the warehouse answered at that commit".
# ---------------------------------------------------------------------------

from ..registry import query  # noqa: E402

_TIME_TRAVEL_ORACLE = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n
FROM (
  SELECT lang, n_chars FROM documents
  UNION ALL SELECT 'en', 11
  UNION ALL SELECT 'fr', 7
)
GROUP BY lang
ORDER BY lang
"""

_TT_PROFILE = (
    "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
    "COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang"
)


@query(
    "r160_sql_time_travel",
    oracle=_TIME_TRAVEL_ORACLE,
    tags=("S22", "S19", "S15", "A1"),
)
def r160_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22 end to end (round 9): on a sandbox corpus with the docs
    cube deployed, an INSERT commits version v, a predicate DELETE
    commits v+1 — and ``FOR SYSTEM_VERSION AS OF v`` answers the
    language profile as the warehouse answered it BETWEEN the two
    mutations (base + insert, delete invisible), still FROM THE CUBE
    (the snapshot's memo resolves the cube version of that commit).
    The oracle recomputes that historical state read-only from the
    immutable fixture."""
    from ..catalog import TABLES
    from ..engine import Engine
    from ..plans.sqlfront import route_sql
    from .corpus_cubes import docs_stats_cube_table
    from .retention import _demo_corpus

    demo = _demo_corpus(spark, sf_dir, TABLES, demo="time_travel")
    docs_stats_cube_table(spark, demo)
    eng = Engine(spark, demo)
    eng.sql(
        "INSERT INTO documents VALUES "
        "(900000001, 'hello world', 'en', 'src97', 11), "
        "(900000002, 'bonjour', 'fr', 'src98', 7)"
    )
    v = eng.history().collect()[-1].version
    eng.sql("DELETE FROM documents WHERE doc_id <= 100")
    with as_of(spark, demo, v):
        _df, chosen = route_sql(spark, demo, _TT_PROFILE)
        assert chosen == "docs_stats_cube", chosen
    return eng.sql(f"{_TT_PROFILE} FOR SYSTEM_VERSION AS OF {v}")
