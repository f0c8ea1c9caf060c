"""S12 Z-order clustering: the skip ratio is asserted, not narrated.

Writes the same rows in natural order and in Z-order with small row
groups forced (so multi-row-group statistics exist even on the test
fixture), runs one two-column range query against both, and requires
the Z-ordered scan to materialize a small fraction of the rows the
natural scan does — the actual data-skipping win, read from the scan
node's own metrics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataproj_spark.catalog import table
from bigdataproj_spark.registry import load_all
from bigdataproj_spark.sources.zorder import write_zordered, zvalue


def _scan_rows(spark, path, pred) -> tuple[int, int]:
    """(rows materialized by the scan, rows matching the predicate)."""
    df = spark.read.parquet(path).filter(pred)
    matched = df.count()
    df2 = spark.read.parquet(path).filter(pred)
    df2.collect()
    leaf = df2._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    scanned = leaf.metrics().apply("numOutputRows").value()
    return int(scanned), matched


def test_zvalue_orders_like_morton_curve(spark):
    """Spot-check the interleave against hand-computed Morton codes."""
    rows = spark.range(1).select(
        zvalue(F.lit(0), F.lit(0)).alias("a"),
        zvalue(F.lit(1), F.lit(0)).alias("b"),
        zvalue(F.lit(0), F.lit(1)).alias("c"),
        zvalue(F.lit(3), F.lit(5)).alias("d"),
    ).first()
    assert (rows["a"], rows["b"], rows["c"]) == (0, 1, 2)
    # interleave(3=0b011, 5=0b101) = 0b100111 = 39
    assert rows["d"] == 39


def test_zvalue_covers_wide_key_domains(spark):
    """Keys past 2^16 (l_partkey reaches ~1M at sf5, ~2M at sf10) must
    keep distinct curve positions — the round-5 16-bit interleave
    silently dropped their high bits, aliasing distant keys onto the
    same position. The 31-bit spread must match a reference Python
    interleave bit-for-bit across the widened domain."""

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(31):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    samples = [(0, 0), (1 << 16, 0), (0, 1 << 16), (1_000_000, 37),
               (2_000_000, 1_999_999), ((1 << 31) - 1, (1 << 31) - 1)]
    got = (
        spark.createDataFrame(samples, "x long, y long")
        .select(zvalue(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )
    assert [r["z"] for r in got] == [morton(x, y) for x, y in samples]
    assert len({r["z"] for r in got}) == len(samples)  # no aliasing


def test_zorder_layout_skips_row_groups(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # ~60 row groups at sf0.001 — enough statistics granularity for
    # skipping to show on a 6000-row fixture
    write_zordered(
        li, str(tmp_path / "zorder"), "l_partkey", "l_suppkey",
        n_files=8, row_group_bytes=4096,
    )
    (
        li.repartition(8)
        .write.mode("overwrite")
        .option("parquet.block.size", "4096")
        .parquet(str(tmp_path / "natural"))
    )
    # a genuinely selective rectangle in BOTH fixture domains
    # (partkey 0-199, suppkey 0-9 at sf0.001): ~4.5% of the space
    pred = F.col("l_partkey").between(50, 80) & F.col("l_suppkey").between(2, 4)
    z_scanned, z_match = _scan_rows(spark, str(tmp_path / "zorder"), pred)
    n_scanned, n_match = _scan_rows(spark, str(tmp_path / "natural"), pred)
    assert z_match == n_match  # same answer, different physics
    total = li.count()
    # natural order: the predicate columns are uncorrelated with row
    # position, so (nearly) nothing skips; z-order: most row-group
    # rectangles miss the query rectangle entirely
    assert n_scanned > 0.5 * total, (n_scanned, total)
    assert z_scanned < 0.5 * n_scanned, (z_scanned, n_scanned)


def test_zorder_query_matches_plain_filter(spark, sf_dir):
    got = load_all()["r116_zorder_query"].build(spark, sf_dir).toPandas()
    want = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").between(50, 150) & F.col("l_suppkey").between(5, 40))
        .count()
    )
    assert len(got) == want


def test_zorder_append_then_recluster_preserves_rows(spark, sf_dir, tmp_path):
    """The append-only maintenance story: a delta batch appends as its
    own clustered files (row content = base ∪ delta exactly), queries
    over the appended layout still skip via per-file statistics, and
    the OPTIMIZE-style recluster rewrite is row-identical while
    restoring the single global curve."""
    from bigdataproj_spark.sources.zorder import (
        append_zordered,
        recluster_zordered,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    base = li.filter(F.col("l_orderkey") % 7 != 0)
    delta = li.filter(F.col("l_orderkey") % 7 == 0)
    path = str(tmp_path / "layout")
    write_zordered(base, path, "l_partkey", "l_suppkey",
                   n_files=8, row_group_bytes=4096)
    append_zordered(delta, path, "l_partkey", "l_suppkey",
                    n_files=2, row_group_bytes=4096)

    key = ["l_orderkey", "l_partkey", "l_suppkey"]
    want = li.orderBy(*key, "l_quantity").toPandas()
    got = spark.read.parquet(path).orderBy(*key, "l_quantity").toPandas()
    assert got.equals(want[got.columns.tolist()])

    out = recluster_zordered(spark, path, "l_partkey", "l_suppkey",
                             n_files=8, row_group_bytes=4096)
    re_got = spark.read.parquet(out).orderBy(*key, "l_quantity").toPandas()
    assert re_got.equals(want[re_got.columns.tolist()])
