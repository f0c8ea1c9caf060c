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
  takes on entry, plus the warehouse file LISTING (the metadata walk
  the txn already pays once per batch) — O(#layouts + #files)
  bookkeeping, no data I/O and no data-path cost;
- an **``as_of`` read context**: swaps the session's serving state to
  a ledger entry, re-points the engine-owned temp views, and restores
  everything on exit — every read issued inside (routed, scan,
  verbatim SQL) answers from the warehouse AS OF that commit. The
  APPEND-style row stores (bucketed facts, clustered documents,
  dated events/lineitem, Z-order) share directories across commits,
  so their scans inside the block are restricted to the commit's
  pinned file listing (:func:`pinned_parquet` / :func:`pinned_table`
  — found as a real leak by direct probe: a row-level ``AS OF 1``
  read served batch 2's appended rows while the cube-routed twin was
  correct); the versioned layouts (cubes, rollup/denorm, user views,
  tombstone sets) resolve through their memo paths alone;
- the **SQL spellings** ``... FOR SYSTEM_VERSION AS OF <n>``,
  ``DESCRIBE HISTORY``, and ``RESTORE TO VERSION AS OF <n>`` on the
  front door (engine.py / plans/ddl.py), following the Delta/Iceberg
  convention users already know — with one deliberate strengthening:
  this engine's snapshots are WAREHOUSE-WIDE, so a multi-table
  statement reads ONE consistent commit across all its tables
  (per-table ``AS OF`` versions that disagree are refused) — and one
  deliberate divergence: RESTORE is the ROLLBACK verb (undone
  commits' files are removed, history truncates in the original
  numbering), because Delta's keep-forward restore would need a
  file-granular manifest on every live scan (docs/DECISIONS.md).

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
    dict (txn rollback's discipline), not install copies.

    ``files`` is the warehouse's file listing at the commit: the
    APPEND-style row stores (bucketed facts, clustered documents,
    day-partitioned events/lineitem, Z-order) share their directories
    across commits, so the memos alone do not pin their CONTENT — a
    snapshot read restricts those scans to exactly this listing
    (:func:`pinned_parquet`). The versioned layouts (cubes, rollup/
    denorm, user views, tombstone sets) never need it — their memo
    paths are immutable once written. At 100 TB the listing is the
    batch's manifest, enumerable from version-/batch-suffixed write
    paths without a tree walk — the same note as WarehouseTxn's
    rollback listing."""
    import os

    from .bucketed import _layout_paths

    sd = spark.__dict__
    state = {k: copy.deepcopy(sd.get(k)) for k in _STATE_KEYS}
    user_proj: dict[str, dict[str, tuple[Any, str]]] = {}
    for root_key in _USER_PROJ_ROOTS:
        cat = (sd.get(root_key) or {}).get(sf_dir, {})
        user_proj[root_key] = {n: (u, u.path) for n, u in cat.items()}
    from .txn import _walk_files

    _tag, wh = _layout_paths(sf_dir)
    files = frozenset(_walk_files(wh)) if os.path.isdir(wh) else frozenset()
    return {"state": state, "user_proj": user_proj, "files": files}


def pinned_files(spark: SparkSession) -> frozenset[str] | None:
    """The active snapshot read's warehouse file listing, or None
    outside an as_of block — ONE dict probe on the hot path."""
    return spark.__dict__.get("_bdp_as_of_files")


def pinned_parquet(
    spark: SparkSession, path: str, schema=None
) -> DataFrame | None:
    """Inside a snapshot read, a scan of ``path`` restricted to the
    files that existed at the pinned commit (``basePath`` preserves
    hive partition columns); None outside an as_of block, or when the
    pinned listing has no files under ``path`` (a layout the block
    itself lazily deployed reads its own fresh directory normally).
    Callers write ``pinned_parquet(spark, p) or spark.read.parquet(p)``.

    The built scan is MEMOIZED per (path, pinned file set) — round 10,
    r9-VERDICT item 6: attribution showed ~80-90% of an as_of swap was
    this DataFrameReader construction, which is driver-side per-file
    status at ~1.6 ms/file (passing an explicit schema does NOT help —
    it is not footer reads). A pinned file set is immutable by
    construction (the commit is frozen, and a version whose files
    VACUUM could remove is no longer reachable, so its key is never
    probed again), which makes the memo safe forever; repeat swaps to
    the same version — the table_changes loop, repeated audit reads —
    pay one dict probe instead of the O(#files) stat pass. The FIRST
    swap per (version, layout) keeps the attributed O(#files) bound."""
    import os

    fs = pinned_files(spark)
    if fs is None:
        return None
    memo: dict = spark.__dict__.setdefault("_bdp_pinned_scan_memo", {})
    key = (path, fs)
    hit = memo.get(key)
    if hit is not None:
        return hit
    root = os.path.normpath(path) + os.sep
    under = [f for f in fs if f.startswith(root)]
    files = sorted(f for f in under if not
                   os.path.basename(f).startswith(("_", ".")))
    if not files:
        if under:
            # the path EXISTED at the pinned commit but held no data
            # files (marker-only, e.g. after an empty rewrite): the
            # snapshot's answer is an EMPTY relation — falling back to
            # the live scan would serve post-commit rows (round-9
            # ADVICE item 3). Schema preference (round-10 ADVICE item
            # 3): the caller's DECLARED schema if given; else inferred
            # from the live directory (layout schemas are
            # append-stable by contract) — which can itself be
            # marker-only when the emptying rewrite is still the
            # latest state, so that infer failure gets a worded error
            # instead of Spark's "unable to infer schema".
            if callable(schema):
                # resolved ONLY here: the common (files-exist) path
                # must stay one memo probe, not a catalog lookup per
                # pinned read (round-11 self-review)
                schema = schema()
            if schema is not None:
                df = spark.createDataFrame([], schema)
            else:
                try:
                    df = (
                        spark.read.option("basePath", path)
                        .parquet(path).limit(0)
                    )
                except Exception as exc:
                    raise ValueError(
                        f"snapshot read of {path!r}: the pinned commit "
                        "holds no data files (an empty rewrite) and the "
                        "live directory has none to infer a schema from "
                        "either — pass the layout's declared schema to "
                        "pinned_parquet(schema=...)"
                    ) from exc
            memo[key] = df
            return df
        return None
    df = spark.read.option("basePath", path).parquet(*files)
    memo[key] = df
    return df


def versioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """LIVE scan of an immutable VERSIONED layout path (cubes, dims,
    rollup/denorm, user projections, tombstone sets), memoized per
    (session, path) — round 12, guide §6 (file listing) + §1.2: every
    refresh of these layouts publishes a NEW ``_v{n}`` directory and
    swings the projection memo, so a given path's contents never
    change once written; yet each plan build re-ran file listing +
    parquet schema inference (30–80 ms per layout through Py4J) to
    re-derive a constant. Routed/SQL queries read 1–3 such layouts
    per build, so this was the dominant fixed cost of sub-second
    queries. Staleness cannot occur: a superseded or VACUUM-pruned
    path is never probed again (path resolution goes through the
    projection memos, which WarehouseTxn rolls back as a unit), and
    append-style row stores (shared directories) must NOT use this —
    they take :func:`layout_parquet`, which memoizes only the schema."""
    memo: dict = spark.__dict__.setdefault("_bdp_versioned_scan_memo", {})
    hit = memo.get(path)
    if hit is None:
        hit = spark.read.parquet(path)
        memo[path] = hit
    return hit


def evict_versioned_scan(spark: SparkSession, path: str) -> None:
    """Drop one :func:`versioned_parquet` memo entry. Needed exactly
    where a BASE path is legitimately overwritten in-session: a user
    projection redeploy (``deploy_projection`` with an existing name
    writes the same ``user_proj_<name>_<tag>`` base path). WarehouseTxn
    rollback clears the whole memo instead (txn.py)."""
    (spark.__dict__.get("_bdp_versioned_scan_memo") or {}).pop(path, None)


def layout_parquet(spark: SparkSession, path: str) -> DataFrame:
    """LIVE scan of an APPEND-STYLE layout directory (day-partitioned
    events/lineitem, Z-order, clustered documents, bucketed dirs) with
    the SCHEMA memoized per (session, path). Layout schemas are
    append-stable by contract (the same contract pinned_parquet's
    empty-dir fallback relies on), so per-build schema inference
    (parquet footer reads — measured 58 of the 77 ms a 124-file dated
    layout read cost) re-derives a constant. The FILE LISTING is still
    taken fresh on every build: appends, OPTIMIZE rewrites and RESTORE
    change the file set, and memoizing the DataFrame here would serve
    stale (or deleted) files — that is exactly why these directories
    are excluded from :func:`versioned_parquet`."""
    memo: dict = spark.__dict__.setdefault("_bdp_layout_schema_memo", {})
    s = memo.get(path)
    if s is None:
        s = spark.read.parquet(path).schema
        memo[path] = s
    return spark.read.schema(s).parquet(path)


def evict_pinned_memo(spark: SparkSession) -> int:
    """Drop pinned-scan memo entries whose file set no longer matches
    any reachable ledger entry — called after VACUUM prunes and after
    RESTORE truncates (round-10 ADVICE item 5 / VERDICT item 6: the
    memo grew O(#versions × #layouts) for the session's lifetime,
    holding plans for versions that could never be probed again). The
    memo is session-global, so reachability is checked across ALL
    fixtures' ledgers. Returns how many entries were evicted."""
    memo: dict = spark.__dict__.get("_bdp_pinned_scan_memo") or {}
    if not memo:
        return 0
    reachable: set[frozenset] = set()
    for led in (spark.__dict__.get(_LEDGER_KEY) or {}).values():
        for e in led:
            reachable.add(e["files"])
    dead = [k for k in memo if k[1] not in reachable]
    for k in dead:
        del memo[k]
    return len(dead)


def pinned_table(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame | None:
    """The catalog-table twin of :func:`pinned_parquet` for the
    bucketed facts (external location = <warehouse>/<name> by the
    write_bucketed construction). The pinned scan is a plain parquet
    read — bucket co-location metadata is lost INSIDE a snapshot
    read (correctness over join locality for historical queries);
    live reads keep the bucketed table untouched. The CATALOG carries
    the table's declared schema independent of what files exist, so a
    marker-only pinned state reads empty with the right columns
    (round-10 ADVICE item 3)."""
    import os

    if pinned_files(spark) is None:
        return None
    from .bucketed import _layout_paths

    def _declared():
        try:
            return spark.table(name).schema
        except Exception:
            return None

    _tag, wh = _layout_paths(sf_dir)
    return pinned_parquet(spark, os.path.join(wh, name), schema=_declared)


def _next_seq(spark: SparkSession, sf_dir: str) -> int:
    """Version numbers are drawn from a per-warehouse MONOTONE
    sequence that survives ledger pruning: after a VACUUM clears the
    ledger, new commits must NOT reuse old numbers — a remembered
    "version 3" must either resolve to the state it always meant or
    error, never silently mean a different state. Gaps in DESCRIBE
    HISTORY therefore read as "undone by RESTORE or vacuumed" —
    renumbering would read as nothing. (The counter is deliberately
    NOT in WarehouseTxn's rollback set; rolled-back batches never
    reach record_commit, so rollback needs nothing restored here.)"""
    d: dict = spark.__dict__.setdefault("_bdp_snapshot_seq", {})
    v = d.get(sf_dir, 0)
    d[sf_dir] = v + 1
    return v


def ensure_base(spark: SparkSession, sf_dir: str) -> None:
    """Record the pre-batch state the first time a mutation is about
    to touch this warehouse (version 0 = the pristine base) — and
    again after a VACUUM emptied the ledger (a "checkpoint": the
    state accumulated so far, under a FRESH number)."""
    led = _ledger(spark, sf_dir)
    if not led:
        v = _next_seq(spark, sf_dir)
        led.append(
            {
                "version": v,
                "note": "base" if v == 0 else "checkpoint",
                "wall": time.time(),
                **_capture(spark, sf_dir),
            }
        )


def record_commit(spark: SparkSession, sf_dir: str, note: str) -> None:
    """Append the post-commit serving state to the ledger. Called by
    WarehouseTxn on successful OUTER exit (and by optimize, which
    swings memos without a txn) — never on rollback, so a failed
    batch leaves no version.

    S23b (round 11): if the committing mutation STAGED its change
    rows (:func:`stage_changes`), the entry carries ``cdf``:
    {table: stored-delta path} — the commit's complete change set,
    and ``table_changes`` reads it instead of diffing pinned states.
    An entry WITHOUT the key (pre-existing commits, any path that
    does not stage) falls back to the state diff — the
    conservative-correct posture. RESTORE commits stage the EMPTY
    set since round 12 — correct by construction under truncating
    restore (see restore_warehouse)."""
    led = _ledger(spark, sf_dir)
    pending = (spark.__dict__.get(_CDF_PENDING_KEY) or {}).pop(sf_dir, None)
    entry = {
        "version": _next_seq(spark, sf_dir),
        "note": note,
        "wall": time.time(),
        **_capture(spark, sf_dir),
    }
    if pending is not None:
        entry["cdf"] = pending
    led.append(entry)


def resolve_timestamp(spark: SparkSession, sf_dir: str, ts: str) -> int:
    """S22b (round 12, r11-VERDICT item 2): resolve a wall-clock
    timestamp to the committed version that was CURRENT at that
    moment — the latest reachable commit with ``wall <= ts`` (Delta's
    ``TIMESTAMP AS OF`` rule), against the per-commit wall clocks the
    ledger has recorded since round 9. A timestamp BEFORE the earliest
    reachable commit refuses with the earliest-reachable hint (there
    is no state to serve — reachability is VACUUM-retention-bounded,
    same contract as version numbers); a timestamp after the newest
    commit answers the newest (the warehouse simply has not changed
    since). Accepts ISO-8601 (``YYYY-MM-DD [HH:MM:SS[.ffffff]]``,
    ``T`` separator and timezone offsets included); a NAIVE timestamp
    is the session's local clock — the same clock ``time.time()``
    stamps commits with."""
    from datetime import datetime

    try:
        epoch = datetime.fromisoformat(ts.strip()).timestamp()
    except ValueError:
        raise ValueError(
            f"unparseable timestamp {ts!r} — expected ISO-8601, e.g. "
            "'2026-08-17 12:00:00' (fractional seconds and timezone "
            "offsets accepted)"
        ) from None
    led = _ledger(spark, sf_dir)
    if not led:
        raise ValueError(
            "no reachable snapshot versions (versions are recorded per "
            "committed mutation and expire with VACUUM retention)"
        )
    best: int | None = None
    for e in led:
        if e["wall"] <= epoch:
            best = e["version"]
    if best is None:
        first = led[0]
        earliest = datetime.fromtimestamp(first["wall"]).isoformat(
            sep=" ", timespec="microseconds"
        )
        raise ValueError(
            f"timestamp {ts!r} predates the earliest reachable commit "
            f"(version {first['version']}, committed {earliest}) — "
            "earlier state is unreachable (expired with VACUUM "
            "retention, or the warehouse did not exist yet); use "
            f"'{earliest}' or later, or AS OF version "
            f"{first['version']}"
        )
    return best


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
        # S23b: a reachable commit's stored change deltas are live —
        # once the entry leaves the ledger, its delta dirs are garbage
        for p in (e.get("cdf") or {}).values():
            out.append(p)
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
    # repoint only the views whose relation actually DIFFERS between
    # the two states: a table ingested in NEITHER state reads the
    # immutable fixture on both sides, and rebuilding its relation +
    # plan identity twice per block is the dominant as_of cost at
    # scale (measured 7.9 s/block at sf5 before this skip)
    live_ing = live_state.get("_bdp_ingested") or set()
    snap_ing = entry["state"].get("_bdp_ingested") or set()
    fact_names = [
        n for n in fact_names
        if (sf_dir, n) in live_ing or (sf_dir, n) in snap_ing
    ]
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
    sd["_bdp_as_of_files"] = entry["files"]
    # the pinned version NUMBER rides along for consumers that need
    # "head as of this read" (the CDC-view freshness gate checks
    # whether any commit up to the pinned version is unconsumed —
    # streaming/cdc.py cdc_view_fresh)
    sd["_bdp_as_of_version"] = version
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
        # the unpin + active-flag reset MUST survive any failure in
        # the exit restore (round-9 ADVICE item 1): if the view
        # re-point raises, a still-True flag would make every future
        # mutation in the session refuse as "read-only inside an
        # AS OF snapshot read" — the session would be stuck forever
        try:
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
            # unpin BEFORE the exit re-point: the restored live views
            # must scan the full directories, not the snapshot listing
            sd.pop("_bdp_as_of_files", None)
            sd.pop("_bdp_as_of_version", None)
            _repoint_views(spark, sf_dir, fact_names)
            if live_views_for is None:
                sd.pop("_bdp_views_for", None)
            else:
                sd["_bdp_views_for"] = live_views_for
        finally:
            sd.pop("_bdp_as_of_files", None)
            sd.pop("_bdp_as_of_version", None)
            sd[_ACTIVE_KEY] = False

def restore_warehouse(spark: SparkSession, sf_dir: str, version: int) -> None:
    """RESTORE — roll the LIVE warehouse back to a past committed
    version (the statement spelling is ``RESTORE TO VERSION AS OF
    n``). The serving memos, tombstone sets, watermarks, ingest
    ledger, and user-projection catalogs all return to that commit,
    the engine-owned temp views re-point, every file the undone
    commits wrote is removed, and history TRUNCATES to the restored
    version plus one new commit recording the restore.

    DELIBERATE divergence from Delta's RESTORE (which keeps the
    undone versions restorable-forward): this engine's append-style
    row stores share directories across commits, so keeping undone
    appends on disk would require a file-granular manifest on every
    LIVE read path. Inside the bounded ``as_of`` context that cost is
    paid willingly (pinned listings); paying it on every live scan
    forever is the wrong trade — so RESTORE here is the transactional
    rollback verb (git reset --hard), with the file cleanup of
    WarehouseTxn applied at commit granularity. Version numbers stay
    monotone across restores (the restore commit continues the old
    sequence), so a gap in DESCRIBE HISTORY reads as "undone or
    vacuumed", never as renumbering.

    Erasure interplay (docs/DECISIONS.md): restoring to a pre-delete
    version brings deleted rows back — the verb's purpose is undoing
    an erroneous mutation. An erasure becomes FINAL once the
    pre-delete versions are gone — run VACUUM past the window (or
    with the default eager window) after a compliance delete."""
    import os

    from .bucketed import _layout_paths
    from .txn import _walk_files

    sd = spark.__dict__
    if sd.get("_bdp_txn_active"):
        raise ValueError("cannot RESTORE inside a warehouse transaction")
    if sd.get(_ACTIVE_KEY):
        raise ValueError(
            "the warehouse is read-only inside an AS OF snapshot read"
        )
    led = _ledger(spark, sf_dir)
    entry = next((e for e in led if e["version"] == version), None)
    if entry is None:
        have = [e["version"] for e in led]
        raise ValueError(
            f"no reachable snapshot version {version} to restore "
            f"(reachable: {have or 'none'}; versions expire with "
            "VACUUM retention)"
        )
    next_version = _next_seq(spark, sf_dir)
    fact_names = _fact_view_names(spark, sf_dir)
    live_ing = sd.get("_bdp_ingested") or set()
    snap_ing = entry["state"].get("_bdp_ingested") or set()
    fact_names = [
        n for n in fact_names
        if (sf_dir, n) in live_ing or (sf_dir, n) in snap_ing
    ]
    # 1. serving state back to the commit
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
    # 2. remove every file the undone commits wrote (appends into
    #    shared row-store dirs AND newer versioned dirs alike), then
    #    drop now-empty dirs — WarehouseTxn._rollback's cleanup at
    #    commit granularity
    _tag, wh = _layout_paths(sf_dir)
    if os.path.isdir(wh):
        for f in _walk_files(wh) - set(entry["files"]):
            try:
                os.remove(f)
            except OSError:
                pass
        for dirpath, dirs, files in os.walk(wh, topdown=False):
            if not dirs and not files and dirpath != wh:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
    # 3. invalidate cached file listings of the restored bucketed
    #    tables so reads re-list post-cleanup
    for names in (sd.get("_bdp_bucketed_memo") or {}).values():
        for name in names:
            try:
                spark.catalog.refreshTable(name)
            except Exception:
                pass
    _repoint_views(spark, sf_dir, fact_names)
    # 4. history truncates to the restored version; the restore itself
    #    is the next commit in the ORIGINAL numbering
    led[:] = [e for e in led if e["version"] <= version]
    led.append(
        {
            "version": next_version,
            "note": f"restore to {version}",
            "wall": time.time(),
            # S23c (round 12, r11-VERDICT item 4 — resolved by
            # analysis, not by the suggested mechanism): under this
            # engine's TRUNCATING restore, the restore commit's state
            # is byte-identical to its reachable predecessor's (the
            # restore target — the undone versions leave the ledger),
            # so per the feed's adjacent-reachable-version semantics
            # its change set is EMPTY by construction. The suggested
            # sign-flipped inverse deltas describe Delta's
            # KEEP-FORWARD restore (pre-restore state still
            # reachable); staging them here was implemented, and the
            # fallback-equivalence gate correctly rejected it (the
            # state diff vs the reachable predecessor is ∅; the
            # versioned-DuckDB fuzzer model pins the same). Staging
            # the empty set IS the change-sized read: O(1) per
            # restore commit, replacing a full O(|state|) diff that
            # always produced zero rows. docs/DECISIONS.md records
            # the reasoning.
            "cdf": {},
            **_capture(spark, sf_dir),
        }
    )
    # the undone commits' pinned-scan plans can never be probed again
    evict_pinned_memo(spark)
    # Round 12: RESTORE rolls _bdp_projection_versions back with the
    # rest of the serving state, so a LATER mutation can re-publish a
    # version PATH whose undone files the restore just removed — a
    # live versioned-scan memo entry for that path would serve the
    # dead listing (caught by TestRestore during this round's memo
    # work). Same hazard class as WarehouseTxn rollback; same fix.
    spark.__dict__.pop("_bdp_versioned_scan_memo", None)
    # Round 13 (r12-ADVICE low): drop the append-layout SCHEMA memo
    # too — cheap insurance in case a restore ever reverts to a
    # differently-shaped layout (a contract violation today, but the
    # un-memoized read would fail loudly where a stale schema would
    # silently project).
    spark.__dict__.pop("_bdp_layout_schema_memo", None)


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
    "q40_sql_time_travel",
    oracle=_TIME_TRAVEL_ORACLE,
    tags=("S22", "S19", "S15", "A1"),
)
def q40_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
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


_TT_TS_ORACLE = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n
FROM (
  SELECT lang, n_chars FROM documents
  UNION ALL SELECT 'en', 9
  UNION ALL SELECT 'de', 6
)
GROUP BY lang
ORDER BY lang
"""


@query(
    "r180_sql_time_travel_ts",
    oracle=_TT_TS_ORACLE,
    tags=("S22", "S19", "S15", "A1"),
)
def r180_sql_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22b end to end (round 12, r11-VERDICT item 2): TIMESTAMP-based
    time travel. An INSERT commits at wall w1, a predicate DELETE at
    wall w2; ``FOR SYSTEM_TIMESTAMP AS OF`` a moment BETWEEN the two
    resolves — against the ledger's per-commit wall clocks — to the
    insert's version, and answers the profile as the warehouse
    answered it then (delete invisible), still from the cube. The
    oracle recomputes that historical state read-only."""
    from datetime import datetime

    from ..catalog import TABLES
    from ..engine import Engine
    from .corpus_cubes import docs_stats_cube_table
    from .retention import _demo_corpus

    demo = _demo_corpus(spark, sf_dir, TABLES, demo="time_travel_ts")
    docs_stats_cube_table(spark, demo)
    eng = Engine(spark, demo)
    eng.sql(
        "INSERT INTO documents VALUES "
        "(900000011, 'neun char!', 'en', 'src97', 9), "
        "(900000012, 'sechse', 'de', 'src98', 6)"
    )
    led = _ledger(spark, demo)
    w1 = led[-1]["wall"]
    eng.sql("DELETE FROM documents WHERE doc_id <= 100")
    w2 = led[-1]["wall"]
    between = datetime.fromtimestamp((w1 + w2) / 2).isoformat(
        sep=" ", timespec="microseconds"
    )
    return eng.sql(
        f"{_TT_PROFILE} FOR SYSTEM_TIMESTAMP AS OF '{between}'"
    )


_RESTORE_ORACLE = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n
FROM (
  SELECT lang, n_chars FROM documents
  UNION ALL SELECT 'de', 13
)
GROUP BY lang
ORDER BY lang
"""


@query(
    "q43_sql_restore",
    oracle=_RESTORE_ORACLE,
    tags=("S22", "S19", "S15", "A1"),
)
def q43_sql_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22's rollback verb end to end (round 9): INSERT commits v,
    an (erroneous) predicate DELETE commits v+1, and ``RESTORE TO
    VERSION AS OF v`` rolls the LIVE warehouse back — deleted rows
    return, the undone commit's files are removed, history truncates.
    The post-restore profile — answered from the restored cube state
    by the normal LIVE read path, no as_of context — matches DuckDB
    computing base + the insert, as if the delete never happened."""
    from ..catalog import TABLES
    from ..engine import Engine
    from ..plans.sqlfront import route_sql
    from .corpus_cubes import docs_stats_cube_table
    from .retention import _demo_corpus

    demo = _demo_corpus(spark, sf_dir, TABLES, demo="restore")
    docs_stats_cube_table(spark, demo)
    eng = Engine(spark, demo)
    eng.sql(
        "INSERT INTO documents VALUES "
        "(900000003, 'dreizehn char', 'de', 'src97', 13)"
    )
    v = eng.history().collect()[-1].version
    eng.sql("DELETE FROM documents WHERE doc_id <= 200")
    eng.sql(f"RESTORE TO VERSION AS OF {v}")
    df, chosen = route_sql(spark, demo, _TT_PROFILE)
    assert chosen == "docs_stats_cube", chosen
    return df


# ---------------------------------------------------------------------------
# S23 (round 10, r9-VERDICT item 2): change data feed — the ledger's
# missing READ verb. DESCRIBE HISTORY lists the commits; table_changes
# says what each one DID, as rows.
#
# S23b (round 11, r10-VERDICT item 1): stored per-commit deltas. The
# mutation bodies already hold their change rows in hand (the ingest
# delta post-filters, the S21 conflict pre/post images, the captured
# delete/expiry rows) — staging persists them beside the commit, so
# table_changes reads O(|changes|) instead of paying one O(|state|)
# count-join per commit (measured 30.4/41.3/70.7 s for a 3-commit
# orders feed at sf5/10/20; the stored-delta read is change-sized and
# scale-flat). The state diff remains the fallback for entries without
# staged deltas (pre-existing commits, RESTORE) — same API, same
# oracle, a storage swap exactly as the round-10 docstring promised.
# ---------------------------------------------------------------------------

_CDF_PENDING_KEY = "_bdp_cdf_pending"
_CDF_NOOP_NOTES = ("base", "checkpoint", "optimize", "vacuum")


def mark_cdf_staged(spark: SparkSession, sf_dir: str) -> None:
    """Declare that the in-flight commit's mutation body stages its
    COMPLETE change set (zero staged tables = the commit changed no
    rows). record_commit attaches the pending dict to the ledger
    entry; its PRESENCE is the completeness contract table_changes
    trusts — a mutation path that cannot guarantee it simply never
    calls this, and its commits keep the state-diff fallback."""
    spark.__dict__.setdefault(_CDF_PENDING_KEY, {}).setdefault(sf_dir, {})


def stage_changes(
    spark: SparkSession,
    sf_dir: str,
    table_name: str,
    df: DataFrame,
    change_type: str | None = None,
) -> str:
    """Persist one change frame for the in-flight commit (S23b);
    returns the stored-delta directory (the ingest path reads the
    materialized delta back from it, so a lazy delta plan evaluates
    ONCE instead of once per consuming layout refresh).
    ``df`` carries the table's fixture columns (realigned/cast here);
    ``change_type`` tags the whole frame (``insert`` / ``delete`` /
    ``update_preimage`` / ``update_postimage``) — pass None if ``df``
    already carries a ``_change_type`` column. Multiple stagings for
    one (commit, table) append into the same stored-delta directory.

    The write is an EAGER action inside the caller's WarehouseTxn, so
    it sees the mutation body's pre-swing relations exactly as the
    caller built them; on rollback the txn's file cleanup removes the
    staged files and the pending dict is cleared. The delta dirs are
    TOP-LEVEL warehouse entries (``cdf_<table>_<tag>_c<n>``) like
    every versioned layout, so VACUUM's basename-keyed live set
    governs them: reachable commits keep theirs via
    snapshot_live_entries, pruned commits' become ordinary garbage.

    Scale posture: one change-sized parquet write per (commit,
    table) — the documented O(|changes|) CDF storage cost, paid at
    WRITE time exactly where Delta's CDF pays it; commits that stage
    nothing for a table cost nothing for it."""
    import os

    from pyspark.sql import functions as F

    from ..schemas import FIXTURE_SCHEMAS
    from .bucketed import _layout_paths

    mark_cdf_staged(spark, sf_dir)
    pend: dict = spark.__dict__[_CDF_PENDING_KEY][sf_dir]
    schema = FIXTURE_SCHEMAS[table_name]
    if change_type is not None:
        df = df.withColumn("_change_type", F.lit(change_type))
    df = df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ],
        F.col("_change_type").cast("string").alias("_change_type"),
    )
    path = pend.get(table_name)
    if path is None:
        tag, wh = _layout_paths(sf_dir)
        seqs: dict = spark.__dict__.setdefault("_bdp_cdf_seq", {})
        c = seqs.get(sf_dir, 0) + 1
        seqs[sf_dir] = c
        path = os.path.join(wh, f"cdf_{table_name}_{tag}_c{c}")
        # the counter is SESSION-scoped: a new session over the same
        # warehouse (crash before VACUUM collected the old session's
        # dirs) restarts at c1, and appending into a stale dir would
        # report the old session's rows as this commit's change set
        # (round 12, r11-ADVICE item 2) — the first staging of a
        # (commit, table) owns its dir outright
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        pend[table_name] = path
    df.write.mode("append").parquet(path)
    return path


def _commit_touches(note: str, table_name: str) -> bool:
    """Whether a ledger note can have changed ``table_name``'s logical
    content. OPTIMIZE/VACUUM rewrite or remove FILES but are
    row-identical by contract; ingest/delete/merge notes name their
    table(s); TTL expiry touches events; RESTORE (and any unknown
    verb) is conservative — diff it.

    Two traps fixed in round 11 (both round-10 ADVICE highs): a MIXED
    ingest batch writes a comma-joined note (``ingest
    lineitem,orders`` — refresh_warehouse's construction), so the
    name match must split; and ``delete orders`` CASCADES — it also
    removes the deleted orders' lineitem rows — so the lineitem feed
    must treat it as touching lineitem too."""
    if note in _CDF_NOOP_NOTES:
        return False
    for verb in ("ingest ", "delete ", "merge "):
        if note.startswith(verb):
            named = note[len(verb):].split(",")
            if table_name in named:
                return True
            # order DELETIONS cascade to lineitems: a deleted order
            # takes its lineitems with it (sources/retention.py
            # delete_orders), and a MERGE may carry a DELETE clause;
            # a plain orders INGEST/UPDATE never changes lineitem rows
            return (
                verb in ("delete ", "merge ")
                and table_name == "lineitem"
                and "orders" in named
            )
    if note.startswith("expire"):
        return table_name == "events"
    return True


def table_changes(
    spark: SparkSession,
    sf_dir: str,
    table_name: str,
    v1: int | str,
    v2: int | str,
) -> DataFrame:
    """Delta-CDF-shaped change rows for a maintained fact table
    between two reachable committed versions: every row the table
    gained or lost in each commit of ``(v1, v2]``, tagged with
    ``_change_type`` (``insert`` / ``delete`` — and for the keyed
    mutable tables, ``update_preimage`` / ``update_postimage`` when a
    commit replaced a key's row), ``_commit_version``, and
    ``_commit_note``. Per-commit granularity: a row inserted at one
    commit and deleted at a later one appears twice, exactly Delta's
    ``table_changes`` semantics. SQL spelling:
    ``SELECT * FROM table_changes('orders', 1, 3)``.

    S22b (round 12): either bound may be a TIMESTAMP string instead
    of a version — resolved by :func:`resolve_timestamp` (the version
    current at that wall-clock moment), so the window reads "every
    change committed in ``(ts1, ts2]``". SQL spelling:
    ``table_changes('orders', '2026-08-17 12:00:00', '2026-08-18
    12:00:00')`` (bounds may mix forms).

    Lowering: the commit ledger already holds everything needed — the
    serving state and pinned file listing of every reachable version —
    so each side of a commit's diff is the table AS OF that version
    (the same pinned read the ``as_of`` context serves, lazy: the
    explicit file lists resolve at plan time, so two versions' plans
    coexist in one diff). The diff itself is ONE full-row count join
    per commit (bag semantics, identical to ``exceptAll`` both ways —
    duplicate rows count, NULLs compare equal); only the CHANGE-sized
    frame materializes, and the insert/delete/update classification
    derives from it without touching the states again. Commits whose
    note cannot have touched the table (the other tables'
    ingests/deletes, OPTIMIZE, VACUUM) are skipped without a scan;
    each version's relation is reused as the next diff's left side.

    Scale posture (S23b, round 11 — r10-VERDICT item 1): every
    mutation body now STAGES its change rows beside the commit
    (:func:`stage_changes` — the rows were already in hand: ingest
    delta post-filters, S21 conflict pre/post images, captured
    delete/expiry rows), so a commit with a stored delta reads
    O(|changes|), no state scan at all — change-sized parquet reads,
    scale-flat in |state|. RESTORE commits carry the EMPTY staged
    set (round 12, S23c): a truncating restore's state is
    byte-identical to its reachable predecessor's, so its per-commit
    change set is ∅ by construction — O(1), replacing a full-state
    diff that always produced zero rows (restore_warehouse documents
    the analysis). The state diff below remains the FALLBACK for
    entries without staged deltas (commits predating S23b, any
    unknown verb): one full-row count join per such commit,
    O(|state|) — the audit-verb price of
    CDF-from-snapshots (measured 30 s for a 3-commit orders feed over
    7.5M orders at sf5; the first cut's two exceptAlls + an intersect
    cost 50 s). Live reads and commits pay nothing for the feed
    existing beyond the change-sized write at commit time."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StringType, StructField

    from ..plans.corpus_routing import current_documents, current_events
    from ..plans.routing import current_lineitem, current_orders
    from ..schemas import FIXTURE_SCHEMAS
    from .retention import TOMBSTONE_KEYS

    openers = {
        "documents": current_documents,
        "orders": current_orders,
        "events": current_events,
        "lineitem": current_lineitem,
    }
    if table_name not in openers:
        raise ValueError(
            "table_changes covers the maintained fact tables "
            f"{sorted(openers)}; got {table_name!r} (dimension/fixture "
            "tables are immutable — they have no changes to feed)"
        )
    if spark.__dict__.get(_ACTIVE_KEY):
        raise ValueError(
            "table_changes cannot run inside an AS OF snapshot read "
            "(it pins versions itself)"
        )
    if isinstance(v1, str):
        v1 = resolve_timestamp(spark, sf_dir, v1)
    if isinstance(v2, str):
        v2 = resolve_timestamp(spark, sf_dir, v2)
    if v2 < v1:
        raise ValueError(f"table_changes wants v1 <= v2; got ({v1}, {v2})")
    led = _ledger(spark, sf_dir)
    have = [e["version"] for e in led]
    for v in (v1, v2):
        if v not in have:
            raise ValueError(
                f"no reachable snapshot version {v} (reachable: "
                f"{have or 'none'}; versions expire with VACUUM "
                "retention — gc_warehouse(retain_seconds=...) controls "
                "how far back the change feed reaches)"
            )
    schema = FIXTURE_SCHEMAS[table_name]
    cols = schema.fieldNames()
    key = TOMBSTONE_KEYS.get(table_name)

    def state_at(v: int) -> DataFrame:
        # the relation is built INSIDE the pin but returned LAZY: the
        # pinned scans resolve their explicit file lists and the
        # tombstone sets' immutable paths at PLAN time, so the handle
        # stays valid outside the block (the as_of contract for
        # scan-shaped relations) — two versions' plans coexist in one
        # diff without materializing O(|state|) rows per version
        # (eager localCheckpoint here measured 51 s for a 3-commit
        # feed over 7.5M orders at sf5; lazy plans cut it to the two
        # exceptAll shuffles the diff actually needs)
        with as_of(spark, sf_dir, v):
            return openers[table_name](spark, sf_dir).select(*cols)

    staged_schema = type(schema)(
        list(schema.fields) + [StructField("_change_type", StringType())]
    )
    out_schema = type(schema)(
        list(staged_schema.fields)
        + [
            StructField("_commit_version", IntegerType()),
            StructField("_commit_note", StringType()),
        ]
    )
    parts: list[DataFrame] = []
    prev: DataFrame | None = None
    for e in led:
        v = e["version"]
        if v <= v1 or v > v2:
            continue
        if not _commit_touches(e["note"], table_name):
            continue  # state unchanged for this table: prev stays valid
        cdf = e.get("cdf")
        if cdf is not None:
            # S23b fast path: the commit staged its complete change
            # set — read the stored delta (change-sized, no state
            # scan). An absent table key means the commit verifiably
            # changed nothing for this table. The chained-diff left
            # side is invalidated either way: a later fallback commit
            # must diff against the state right before IT, not the
            # state before this staged commit.
            prev = None
            path = cdf.get(table_name)
            if path is None:
                continue
            step = (
                spark.read.schema(staged_schema).parquet(path)
                .withColumns(
                    {
                        "_commit_version": F.lit(v).cast("int"),
                        "_commit_note": F.lit(e["note"]),
                    }
                )
            )
            parts.append(step)
            continue
        if prev is None:
            # left side of the FIRST relevant diff: the table as of
            # the newest reachable version at or before this commit —
            # by construction the state this commit changed
            before = max(x["version"] for x in led if x["version"] < v)
            prev = state_at(before)
        cur = state_at(v)
        # ONE pass per commit: a full-row count diff (bag semantics —
        # exactly exceptAll's, including NULL-equals and -0.0
        # normalization in the group keys) materializes just the
        # CHANGE-sized frame; both exceptAll directions, the
        # update-key intersection, and the classification joins then
        # derive from that small frame without touching the states
        # again. The first cut ran two exceptAlls plus an intersect
        # over the full states — each state scanned ~6× per commit;
        # measured 50 s for a 3-commit feed over 7.5M orders at sf5.
        a_cnt = prev.groupBy(*cols).agg(F.count(F.lit(1)).alias("_a"))
        b_cnt = cur.groupBy(*cols).agg(F.count(F.lit(1)).alias("_b"))
        # eqNullSafe per column, not a USING join: groupBy folds NULL
        # values into ONE group on each side, so the join must pair
        # those groups too — a plain full_outer never matches NULL
        # keys and would report an unchanged NULL-bearing row as a
        # phantom delete+insert pair at every diffed commit (round-11
        # self-review, confirmed by live experiment; this is what the
        # 'NULLs compare equal' bag semantics in the docstring MEANS)
        a, b = a_cnt.alias("a"), b_cnt.alias("b")
        cond = None
        for c in cols:
            eq = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
            cond = eq if cond is None else (cond & eq)
        changed = (
            a.join(b, cond, "full_outer")
            .select(
                *[
                    F.coalesce(F.col(f"a.{c}"), F.col(f"b.{c}")).alias(c)
                    for c in cols
                ],
                F.coalesce(F.col("a._a"), F.lit(0)).alias("_a"),
                F.coalesce(F.col("b._b"), F.lit(0)).alias("_b"),
            )
            .filter(F.col("_a") != F.col("_b"))
            .localCheckpoint(eager=True)
        )
        rep = F.explode(
            F.sequence(F.lit(1), (F.col("_b") - F.col("_a")))
        ).alias("_i")
        ins = (
            changed.filter(F.col("_b") > F.col("_a"))
            .select(*cols, rep)
            .drop("_i")
        )
        rep_d = F.explode(
            F.sequence(F.lit(1), (F.col("_a") - F.col("_b")))
        ).alias("_i")
        dels = (
            changed.filter(F.col("_a") > F.col("_b"))
            .select(*cols, rep_d)
            .drop("_i")
        )
        if key is not None:
            upd = (
                ins.select(key).intersect(dels.select(key))
                .withColumn("_upd", F.lit(True))
            )
            ins = (
                ins.join(upd, key, "left")
                .withColumn(
                    "_change_type",
                    F.when(F.col("_upd"), F.lit("update_postimage"))
                    .otherwise(F.lit("insert")),
                )
                .drop("_upd")
            )
            dels = (
                dels.join(upd, key, "left")
                .withColumn(
                    "_change_type",
                    F.when(F.col("_upd"), F.lit("update_preimage"))
                    .otherwise(F.lit("delete")),
                )
                .drop("_upd")
            )
        else:
            ins = ins.withColumn("_change_type", F.lit("insert"))
            dels = dels.withColumn("_change_type", F.lit("delete"))
        step = ins.unionByName(dels).withColumns(
            {
                "_commit_version": F.lit(v).cast("int"),
                "_commit_note": F.lit(e["note"]),
            }
        )
        parts.append(step)
        prev = cur
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    order_keys = [key] if key is not None else cols
    return out.select(*[f.name for f in out_schema.fields]).orderBy(
        "_commit_version", "_change_type", *order_keys
    )


_CDF_ORACLE = """
SELECT doc_id, text, lang, source, n_chars,
  _change_type, _commit_version, _commit_note
FROM (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
    CAST(n_chars AS BIGINT) AS n_chars,
    'insert' AS _change_type, CAST(1 AS INTEGER) AS _commit_version,
    'ingest documents' AS _commit_note
  FROM (VALUES (900000001, 'neu doc eins', 'de', 'src97', 12),
               (900000002, 'neu doc zwei', 'de', 'src97', 12))
       v(doc_id, text, lang, source, n_chars)
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars,
    'delete', CAST(2 AS INTEGER), 'delete documents'
  FROM documents WHERE doc_id < 8
)
ORDER BY _commit_version, _change_type, doc_id
"""


@query(
    "q34_table_changes",
    oracle=_CDF_ORACLE,
    tags=("S23", "S22", "S19", "E1"),
)
def q34_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23 end to end (round 10, r9-VERDICT item 2): the change data
    feed. On a sandbox corpus, an INSERT commits v1 and a predicate
    DELETE commits v2; ``SELECT * FROM table_changes('documents', 0,
    2)`` returns exactly the two inserted rows tagged (insert, 1) and
    the deleted rows tagged (delete, 2) — recomputable in DuckDB as
    the inserted literals UNION the rows the predicate removed."""
    from ..catalog import TABLES
    from ..engine import Engine
    from .retention import _demo_corpus

    demo = _demo_corpus(spark, sf_dir, TABLES, demo="cdf")
    eng = Engine(spark, demo)
    eng.sql(
        "INSERT INTO documents VALUES "
        "(900000001, 'neu doc eins', 'de', 'src97', 12), "
        "(900000002, 'neu doc zwei', 'de', 'src97', 12)"
    )
    eng.sql("DELETE FROM documents WHERE doc_id < 8")
    return eng.sql("SELECT * FROM table_changes('documents', 0, 2)")
