"""S14 ship-month-partitioned layout: pruning asserted, not narrated.

Same discipline as tests/test_zorder.py: write the fixture's rows in
the dated layout with small row groups forced, run a two-month range
query, and require the pruned scan to materialize a small fraction of
the rows the full layout holds — read from the scan node's own
metrics. Correctness is the usual layout contract: identical rows to
the raw-table filter, any physical layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproj_spark.catalog import table
from bigdataproj_spark.plans.routing import Pred, ScanQuery, route_scan
from bigdataproj_spark.sources.dated import month_bounds_filter, write_dated


def _scan_rows(spark, df) -> int:
    """Rows materialized by the (single) scan leaf of ``df``."""
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(leaf.metrics().apply("numOutputRows").value())


def test_month_bounds_are_supersets(spark):
    """The derived partition predicate must keep every month a
    matching row can live in, for each supported op."""
    df = spark.createDataFrame(
        [("2000-01", ), ("2000-02", ), ("2000-03", ), ("2001-01", )],
        "ship_month string",
    )

    def months(preds):
        cond = month_bounds_filter(preds)
        return sorted(r[0] for r in df.filter(cond).collect())

    assert months([Pred("l_shipdate", "<=", "2000-02-15 00:00:00", cast="timestamp")]) == [
        "2000-01", "2000-02",
    ]
    # '<' at an exact month boundary keeps the boundary month — a
    # superset is correct; the row filter makes it exact
    assert months([Pred("l_shipdate", "<", "2000-02-01 00:00:00", cast="timestamp")]) == [
        "2000-01", "2000-02",
    ]
    assert months([Pred("l_shipdate", ">=", "2000-03-01 00:00:00", cast="timestamp")]) == [
        "2000-03", "2001-01",
    ]
    assert months(
        [Pred("l_shipdate", "between",
              ("2000-02-01 00:00:00", "2000-03-31 00:00:00"), cast="timestamp")]
    ) == ["2000-02", "2000-03"]
    assert months([Pred("l_shipdate", "=", "2001-01-07 00:00:00", cast="timestamp")]) == [
        "2001-01",
    ]
    # non-date conjuncts contribute nothing (and don't break the AND)
    assert months(
        [
            Pred("l_shipdate", ">=", "2001-01-01 00:00:00", cast="timestamp"),
            Pred("l_quantity", "<=", 10),
        ]
    ) == ["2001-01"]


def test_non_padded_literals_never_under_read(spark):
    """ADVICE r6 (high): '2000-3-15' is a VALID literal to Spark's cast
    and DuckDB's parser, but a raw text slice would derive the key
    '2000-3-' and lexicographically exclude '2000-04'..'2000-12' — a
    silent under-read. The derivation must parse-and-reformat (keeping
    those months) or decline to prune; it must never drop a month a
    matching row can live in."""
    df = spark.createDataFrame(
        [("2000-01",), ("2000-02",), ("2000-03",), ("2000-04",), ("2000-12",)],
        "ship_month string",
    )

    def months(preds):
        cond = month_bounds_filter(preds)
        if cond is None:  # no pruning derived — trivially a superset
            return ["2000-01", "2000-02", "2000-03", "2000-04", "2000-12"]
        return sorted(r[0] for r in df.filter(cond).collect())

    # non-padded month AND day
    assert months([Pred("l_shipdate", ">=", "2000-3-15", cast="timestamp")]) == [
        "2000-03", "2000-04", "2000-12",
    ]
    # non-padded day only
    assert months([Pred("l_shipdate", "<=", "2000-04-5", cast="timestamp")]) == [
        "2000-01", "2000-02", "2000-03", "2000-04",
    ]
    # non-padded between
    assert months(
        [Pred("l_shipdate", "between", ("2000-2-1", "2000-3-31"), cast="timestamp")]
    ) == ["2000-02", "2000-03"]
    # garbage / out-of-range literals decline to prune rather than guess
    for bad in ("not-a-date", "2000-13-01", "2000-02-99", "20000301"):
        assert month_bounds_filter(
            [Pred("l_shipdate", ">=", bad, cast="timestamp")]
        ) is None, bad


def test_dated_layout_prunes_partitions(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "dated")
    write_dated(li, path, n_files=8, row_group_bytes=4096)
    total = li.count()

    lo, hi = "2000-03-01 00:00:00", "2000-04-30 23:59:59"
    pred = F.col("l_shipdate").between(
        F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
    )
    matched = li.filter(pred).count()
    assert 0 < matched < total

    # unpruned read of the layout (no month filter): the scan
    # materializes rows from every month the filter can't skip via
    # row-group stats alone
    full = spark.read.parquet(path).filter(pred)
    # pruned read: month bounds derived from the same predicate
    months = month_bounds_filter(
        [Pred("l_shipdate", "between", (lo, hi), cast="timestamp")]
    )
    pruned = spark.read.parquet(path).filter(months).filter(pred)

    assert sorted(r["l_orderkey"] for r in pruned.collect()) == sorted(
        r["l_orderkey"] for r in li.filter(pred).collect()
    )
    scanned = _scan_rows(spark, pruned)
    # a ~2-month slice of a ~84-month corpus: the pruned scan must
    # touch a small fraction of the table
    assert scanned <= max(matched * 2, total // 10), (scanned, matched, total)
    # and the partition filter must actually reach the scan node
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ship_month" in plan, plan


def test_route_scan_picks_dated_layout_and_matches(spark, sf_dir):
    """A date-range scan projecting a column OUTSIDE the Z-order set
    must choose the dated layout and return exactly the raw rows."""
    q = ScanQuery(
        columns=("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"),
        filters=(
            Pred(
                "l_shipdate",
                "between",
                ("2000-03-01 00:00:00", "2000-06-30 00:00:00"),
                cast="timestamp",
            ),
        ),
    )
    df, chosen = route_scan(spark, sf_dir, q)
    assert chosen == "dated_lineitem"
    # sort by ALL columns: (orderkey, linenumber) is not unique in the
    # fixture, and layout choice must not leak through tie order
    order = list(q.columns)
    got = df.orderBy(*order).toPandas()
    want = (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit("2000-03-01 00:00:00").cast("timestamp"),
                F.lit("2000-06-30 00:00:00").cast("timestamp"),
            )
        )
        .select(*q.columns)
        .orderBy(*order)
        .toPandas()
    )
    assert got.equals(want)


def test_zorder_still_wins_when_both_ranges_present(spark, sf_dir):
    """A scan with BOTH a curve-key range and a date range, covered by
    the Z-order column set, keeps the Z-order layout (first
    preference); the dated layout serves only what Z-order can't."""
    q = ScanQuery(
        columns=("l_orderkey", "l_partkey"),
        filters=(
            Pred("l_partkey", "between", (50, 150)),
        ),
    )
    _, chosen = route_scan(spark, sf_dir, q)
    assert chosen == "zorder_lineitem"


def test_append_dated_keeps_pruning_and_rows(spark, sf_dir, tmp_path):
    """Appending a batch must leave the layout readable with identical
    total rows, keep directory pruning effective, and place new months
    in new directories."""
    import os

    li = table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 3 != 0)
    delta = li.filter(F.col("l_orderkey") % 3 == 0)
    # shift half the delta 500 days forward: genuinely NEW months
    delta = delta.withColumn(
        "l_shipdate",
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_shipdate")).otherwise(
            F.col("l_shipdate") + F.expr("INTERVAL 500 DAYS")
        ),
    )
    path = str(tmp_path / "dated")
    from bigdataproj_spark.sources.dated import append_dated

    write_dated(base, path, n_files=8)
    months_before = {d for d in os.listdir(path) if d.startswith("ship_month=")}
    append_dated(delta, path)
    months_after = {d for d in os.listdir(path) if d.startswith("ship_month=")}
    assert months_before < months_after  # new months appeared as new dirs

    both = base.unionByName(delta)
    got = spark.read.parquet(path)
    assert got.count() == both.count()

    # pruning still works across old+new files
    lo, hi = "2000-03-01 00:00:00", "2000-04-30 23:59:59"
    months = month_bounds_filter(
        [Pred("l_shipdate", "between", (lo, hi), cast="timestamp")]
    )
    pred = F.col("l_shipdate").between(
        F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
    )
    pruned = got.filter(months).filter(pred)
    assert pruned.count() == both.filter(pred).count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ship_month" in plan, plan
