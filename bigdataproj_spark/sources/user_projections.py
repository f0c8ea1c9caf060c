"""S16 (engine extension): USER-DECLARED projections — the router's
catalog becomes data.

Every projection the router serves so far (pricing cube, rollup pair,
star-date cube, the corpus cubes) is a built-in: its group keys and
stored partials were chosen by the engine's authors and registered in
code. A warehouse team's actual workflow is the other way around —
they look at THEIR query mix, declare the aggregate view it needs, and
expect the optimizer to start using it (CREATE MATERIALIZED VIEW +
automatic rewrite; same Goldstein-Larson matching the built-ins use,
see plans/routing.py). :func:`deploy_projection` is that surface:

    deploy_projection(spark, sf_dir, "prio_flag",
                      keys=("o_orderpriority", "l_returnflag"))

materializes the cube (int64 fixed-point sums, non-null counts,
min/max partials — the SAME stored-state contract as every built-in,
so answers are bit-identical by construction), registers it in a
session catalog that :func:`plans.routing.route` consults after the
built-ins, and from that moment every matching spec AND every matching
SQL statement through the front door is answered from it — the caller
of those queries never learns a projection exists.
:func:`refresh_projection` delta-merges ingest batches into it
(commutative-monoid merge, rebuild-equal), and
:func:`sources.maintenance.refresh_warehouse` refreshes every deployed
user projection alongside the built-ins.

Scope (v1, enforced at deploy): group keys from the lineitem fact
and/or the order dimension chain (the part/supplier arms and arm-home
measures stay on their measured row-level plans — a user projection
storing an arm join would need the arm's orphan-drop semantics
declared, which AggQuery.part/supp already routes honestly); measures
from the five lineitem money measures. Cardinality is the deployer's
responsibility exactly as in every warehouse (a cube keyed by a
near-unique column is a bad view, not a wrong one — the stored row
count is one ``spark.read.parquet(path).count()`` away).

At 100 TB: the deploy is one pass over the bucketed fact (derived
fixed-point columns already materialized at rest) plus the broadcast
dimension arm; the stored cube is |key-combination|-bounded and the
refresh is O(|delta| + |cube|).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.routing import (
    DIM_ATTRS,
    LINEITEM_COLS,
    MEASURES,
    Projection,
    _StoredMeasure,
)
from ..catalog import table
from .bucketed import _layout_paths, _lineitem_with_derived, bucketed_fact_tables
from .corpus_cubes import merge_partial_frames

# The bucketed fact's stored derived columns, per routable measure
# (the same write-time contract _SPINE_INT_COLS documents).
_DERIVED = {
    "quantity": "l_qty_i",
    "base_price": "l_price_i",
    "discount": "l_disc_i",
    "revenue": "l_rev_i",
    "charge": "l_charge_i",
}
_ALL_MEASURES = tuple(_DERIVED)


@dataclass
class _UserProjection:
    """Catalog entry: the router-facing Projection plus the refresh
    metadata (keys/measures/chain and the current stored path, swung
    atomically on refresh)."""

    name: str
    keys: tuple[str, ...]
    measures: tuple[str, ...]
    chain: int
    path: str  # current stored version (swung atomically on refresh)
    base_path: str  # immutable deploy path; refresh versions derive from it
    projection: Projection


def _catalog(spark: SparkSession, sf_dir: str) -> dict[str, _UserProjection]:
    root: dict = spark.__dict__.setdefault("_bdp_user_projections", {})
    return root.setdefault(sf_dir, {})


def user_projections(spark: SparkSession, sf_dir: str) -> list[Projection]:
    """The session's deployed user projections, in deployment order —
    consulted by plans.routing.route() after the built-in catalog."""
    return [u.projection for u in _catalog(spark, sf_dir).values()]


def _partial_aggs(measures: tuple[str, ...]) -> list:
    aggs = [F.sum(_DERIVED[m]).alias(f"{m}_i") for m in measures]
    aggs += [
        F.count(MEASURES[m].source_col).alias(f"cnt_{m}")
        for m in measures
        if MEASURES[m].source_col
    ]
    aggs.append(F.count(F.lit(1)).alias("cnt"))
    aggs += [F.min(_DERIVED[m]).alias(f"min_{m}_i") for m in measures]
    aggs += [F.max(_DERIVED[m]).alias(f"max_{m}_i") for m in measures]
    return aggs


def _merge_cols(measures: tuple[str, ...]):
    add = tuple(f"{m}_i" for m in measures) + tuple(
        f"cnt_{m}" for m in measures if MEASURES[m].source_col
    ) + ("cnt",)
    mins = tuple(f"min_{m}_i" for m in measures)
    maxs = tuple(f"max_{m}_i" for m in measures)
    return add, mins, maxs


def _dim_side(
    spark: SparkSession, sf_dir: str, chain: int, attrs: list[str]
) -> DataFrame:
    """The dimension side of a user projection's build/refresh: the
    MAINTAINED bucketed orders table (refresh_warehouse appends ingest
    batches to it — the raw fixture parquet is immutable, so reading
    it here would silently drop newly ingested orders' lineitems from
    every chain>=1 user projection on refresh), joined to the
    broadcast customer/nation/region base dims exactly like the denorm
    refresh does."""
    _, od_name = bucketed_fact_tables(spark, sf_dir)
    dims = spark.table(od_name)
    if chain >= 2:
        c = table(spark, sf_dir, "customer")
        dims = dims.join(F.broadcast(c), dims.o_custkey == c.c_custkey)
    if chain >= 3:
        n = table(spark, sf_dir, "nation")
        dims = dims.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    if chain >= 4:
        r = table(spark, sf_dir, "region")
        dims = dims.join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    return dims.select("o_orderkey", *attrs)


def _build_cube(
    spark: SparkSession,
    sf_dir: str,
    li: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...],
    chain: int,
) -> DataFrame:
    dim_keys = sorted(k for k in keys if k in DIM_ATTRS)
    if chain:
        dims = _dim_side(spark, sf_dir, chain, dim_keys)
        li = li.join(dims.hint("shuffle_hash"), li.l_orderkey == dims.o_orderkey)
    return li.groupBy(*keys).agg(*_partial_aggs(measures))


def deploy_projection(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    keys: tuple[str, ...],
    measures: tuple[str, ...] = _ALL_MEASURES,
) -> Projection:
    """Materialize a user-declared aggregate projection and register
    it with the router. Group keys may mix lineitem attributes and
    order-chain dimension attributes (the chain depth is the minimal
    one reaching every dimension key — the same inner-join semantics
    the built-ins and the raw plans share); re-deploying a name
    replaces it. Returns the router-facing Projection."""
    if not keys:
        raise ValueError("a projection needs at least one group key")
    for k in keys:
        if k not in LINEITEM_COLS and k not in DIM_ATTRS:
            raise ValueError(f"unknown projection key {k!r}")
    for m in measures:
        if m not in _DERIVED:
            raise ValueError(
                f"unknown or non-lineitem measure {m!r} "
                f"(deployable: {sorted(_DERIVED)})"
            )
    chain = max((DIM_ATTRS.get(k, 0) for k in keys), default=0)
    tag, wh = _layout_paths(sf_dir)
    li_name, _ = bucketed_fact_tables(spark, sf_dir)
    cube = _build_cube(spark, sf_dir, spark.table(li_name), keys, measures, chain)
    path = os.path.join(wh, f"user_proj_{name}_{tag}")
    cube.write.mode("overwrite").parquet(path)

    cat = _catalog(spark, sf_dir)

    def _open(s: SparkSession, d: str) -> DataFrame:
        return s.read.parquet(cat[name].path)  # current version

    proj = Projection(
        name=f"user:{name}",
        attrs=frozenset(keys),
        measures={
            m: _StoredMeasure(
                f"{m}_i",
                f"cnt_{m}" if MEASURES[m].source_col else None,
                f"min_{m}_i",
                f"max_{m}_i",
            )
            for m in measures
        },
        count_star_col="cnt",
        open=_open,
        chain=chain,
    )
    cat[name] = _UserProjection(
        name, tuple(keys), tuple(measures), chain, path, path, proj
    )
    return proj


def ensure_projection(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    keys: tuple[str, ...],
    measures: tuple[str, ...] = _ALL_MEASURES,
) -> Projection:
    """Idempotent deploy: reuse the registered projection when its
    declaration matches, else (re)deploy."""
    u = _catalog(spark, sf_dir).get(name)
    if u and u.keys == tuple(keys) and u.measures == tuple(measures):
        return u.projection
    return deploy_projection(spark, sf_dir, name, tuple(keys), tuple(measures))


def refresh_projection(
    spark: SparkSession, sf_dir: str, name: str, delta_lineitem: DataFrame
) -> str:
    """Delta-merge one ingested lineitem batch into a deployed user
    projection. Dimension keys resolve through the MAINTAINED bucketed
    orders table (plus the broadcast base dims), so a batch shipping
    new orders WITH their lineitems is handled correctly as long as
    the orders land first — exactly the ordering refresh_warehouse
    encodes (orders append + denorm upsert before every
    lineitem-driven refresh). Additive monoid merge == rebuild, same
    argument as every built-in cube; publishes a new VERSION the
    catalog swings to atomically."""
    cat = _catalog(spark, sf_dir)
    if name not in cat:
        raise KeyError(f"no deployed projection {name!r}")
    u = cat[name]
    delta_cube = _build_cube(
        spark, sf_dir, _lineitem_with_derived(delta_lineitem),
        u.keys, u.measures, u.chain,
    )
    add, mins, maxs = _merge_cols(u.measures)
    merged = merge_partial_frames(
        spark.read.parquet(u.path), delta_cube, u.keys, add, mins, maxs
    )
    versions: dict = spark.__dict__.setdefault("_bdp_projection_versions", {})
    v = versions.get(u.base_path, 0) + 1
    versions[u.base_path] = v
    new_path = f"{u.base_path}_v{v}"
    merged.write.mode("overwrite").parquet(new_path)
    u.path = new_path
    return new_path


def refresh_all_projections(
    spark: SparkSession, sf_dir: str, delta_lineitem: DataFrame
) -> dict[str, str]:
    """Refresh every deployed user projection for ``sf_dir`` — the
    hook refresh_warehouse calls after the built-ins."""
    return {
        name: refresh_projection(spark, sf_dir, name, delta_lineitem)
        for name in list(_catalog(spark, sf_dir))
    }
