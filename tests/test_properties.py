"""Property-based tests (hypothesis) for the deterministic kernels.

These pin the *claims* the engine's determinism contract rests on,
over randomized inputs rather than the fixtures:

- the int64 fixed-point money kernel produces bit-identical doubles
  to the DECIMAL path and to DuckDB, for any 2-decimal money values;
- the hash-split membership function is a pure function of the key
  (re-derivable anywhere) and lands within binomial bounds of 80/10/10.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# 2-decimal money values as exact doubles: scale cents down.
money = st.integers(min_value=0, max_value=10_000_000).map(lambda c: c / 100)


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_isum_bit_equals_decimal_path_and_duckdb(values):
    """double(sum(round(x*100)))/100 == double(sum(Decimal(x))) ==
    DuckDB's CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE), element order
    irrelevant — the exact claim behind functions.isum."""
    int_path = float(sum(round(v * 100) for v in values)) / 100
    dec_path = float(sum(Decimal(str(v)) for v in values))
    assert int_path == dec_path
    con = duckdb.connect()
    duck = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) FROM "
        "(SELECT unnest(?::DOUBLE[]) AS x)",
        [values],
    ).fetchone()[0]
    assert int_path == duck
    # order independence
    assert int_path == float(sum(round(v * 100) for v in reversed(values))) / 100


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-100.0, max_value=100.0, allow_nan=False))
def test_q20_quantization_is_exact_ieee(v):
    """floor(v * 2^20) in Python == the same op in DuckDB (both IEEE
    double): the Q20 embedding kernel's portability claim.

    The value is parameter-BOUND, matching how the engine's values
    arrive (parquet float64) — a bare SQL float literal would parse as
    DECIMAL, whose DECIMAL→DOUBLE conversion is not correctly rounded
    (found by this very test: 90.99999999999999 → 91.0)."""
    py = math.floor(v * (1 << 20))
    duck = duckdb.sql(
        "SELECT CAST(floor(CAST(? AS DOUBLE) * 1048576) AS BIGINT)", params=[v]
    ).fetchone()[0]
    assert py == duck


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_hash_split_is_pure_and_stable(doc_id):
    """Split membership depends only on the key: recomputing the
    md5-bucket in plain Python gives the same bucket DuckDB computes —
    the function is engine-free, so appends/repartitions can't move a
    document across splits."""
    import hashlib

    from bigdataproj_spark.operators.sampling import N_BUCKETS, _SALT

    h = int(hashlib.md5(f"{_SALT}{doc_id}".encode()).hexdigest()[:15], 16)
    py_bucket = h % N_BUCKETS
    duck = duckdb.sql(
        f"SELECT CAST(('0x' || substr(md5('{_SALT}' || CAST({doc_id} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {N_BUCKETS}"
    ).fetchone()[0]
    assert py_bucket == duck


def test_hash_split_proportions(spark, sf_dir):
    """The 80/10/10 split over the fixture corpus must sit within
    loose binomial bounds (the hash behaves uniformly)."""
    from bigdataproj_spark.registry import load_all

    pdf = load_all()["q60_hash_split"].build(spark, sf_dir).toPandas()
    n = len(pdf)
    frac = pdf["split"].value_counts(normalize=True)
    # 4-sigma binomial bounds at n=500: train ±0.072, val/test ±0.054
    assert abs(frac.get("train", 0) - 0.80) < 0.08, frac
    assert abs(frac.get("val", 0) - 0.10) < 0.06, frac
    assert abs(frac.get("test", 0) - 0.10) < 0.06, frac


def test_cents_matches_half_up_rounding_on_fixture_domain(spark, sf_dir):
    """cents() uses floor(x*s + 0.5), which equals round-half-up only
    for non-negative inputs. Pin (a) the fixture money/value columns
    really are non-negative — the precondition — and (b) cents agrees
    with Spark's Round on every fixture value, so a fixture regen that
    introduces negatives trips this test before it corrupts a sum."""
    from pyspark.sql import functions as F

    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.functions import cents

    for tbl, col in [
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_tax"),
        ("lineitem", "l_quantity"),
        ("events", "value"),
    ]:
        df = table(spark, sf_dir, tbl).select(F.col(col).alias("x"))
        bad = df.filter(
            (F.col("x") < 0)
            | (cents("x") != F.round(F.col("x") * 100).cast("long"))
        ).count()
        assert bad == 0, f"{tbl}.{col}: cents() precondition violated"


@given(
    st.floats(
        min_value=1e-6,
        max_value=1e7,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.sampled_from([6, 9, 12]),
)
@settings(max_examples=300, deadline=None)
def test_round_fp_matches_duckdb(v, digits):
    """functions.round_fp must equal DuckDB's round(v, d) exactly —
    including on values adversarially close to the .5 boundary, where
    Spark's BigDecimal F.round diverges (see round_fp docstring)."""
    import duckdb
    import math

    # Documented domain: scaled magnitude <= ~1e13.
    if abs(v) * 10**digits > 1e13:
        return

    # Also probe the nearest boundary double for this magnitude.
    k = math.floor(abs(v) * 10**digits) + 0.5
    for probe in (v, k / 10**digits):
        expected = duckdb.sql(
            f"SELECT round(CAST({probe!r} AS DOUBLE), {digits})"
        ).fetchone()[0]
        got = math.copysign(
            math.floor(abs(probe) * 10**digits + 0.5), probe
        ) / 10**digits
        assert got == expected, (probe, digits, got, expected)
