"""Error-bound tests for approximate operators (SURVEY.md §2.4 rule 5:
sketches are never hash-compared — they're bounds-checked against
exact counterparts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproj_spark.catalog import table


def test_hll_within_published_error(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) with rsd=0.05 must land
    within 3x the requested relative error of the exact count (A6)."""
    o = table(spark, sf_dir, "orders")
    r = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).first()
    assert abs(r["approx"] - r["exact"]) <= 0.15 * r["exact"], r


def test_approx_percentile_within_accuracy(spark, sf_dir):
    """percentile_approx with accuracy N guarantees rank error
    ≤ count/N; check the value lands between nearby exact percentiles
    (A7-approx)."""
    li = table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_med"),
        F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
    ).first()
    assert r["p45"] <= r["approx_med"] <= r["p55"], r


def test_hll_merge_across_groups(spark, sf_dir):
    """Sketch composability: per-group HLL counts must each stay in
    bounds (the map-side partial merge path)."""
    o = table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.15 * max(r["exact"], 1), r
