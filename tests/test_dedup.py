"""Semantic tests for near-dup dedup (L2): MinHash-LSH candidate
recall against exact n-gram Jaccard, and estimator quality.

The LSH path (q15) has no SQL oracle (xxhash64 signatures); these
tests pin its semantics instead (SURVEY.md §2.3 L2 oracle note).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataproj_spark.registry import load_all

# 4 bands × 4 rows → P(candidate) = 1-(1-s^4)^4. At s=0.93 that's
# ≈ 0.997; below ~0.9 a few-percent miss rate is *correct* LSH
# behavior (and deterministic here — fixed hash constants), so the
# recall gate only covers the near-certain regime.
HIGH_SIM = 0.93


@pytest.fixture(scope="module")
def jaccard_pairs(spark, sf_dir):
    df = load_all()["q14_ngram_jaccard"].build(spark, sf_dir)
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}


@pytest.fixture(scope="module")
def lsh_pairs(spark, sf_dir):
    df = load_all()["q15_minhash_lsh"].build(spark, sf_dir)
    return {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in df.collect()}


def test_lsh_recall_on_high_similarity(jaccard_pairs, lsh_pairs):
    """Every pair with true Jaccard ≥ 0.5 must surface as an LSH
    candidate (the fixture's duplicates are near-identical, so banding
    probability is ≈1 there; a miss indicates broken signatures)."""
    high = {p for p, j in jaccard_pairs.items() if j >= HIGH_SIM}
    assert high, "fixture should contain near-duplicate pairs"
    missed = high - set(lsh_pairs)
    assert not missed, f"LSH missed high-sim pairs: {missed}"


def test_lsh_estimates_track_truth(jaccard_pairs, lsh_pairs):
    """For shared pairs, |estimate - truth| ≤ 0.35 (16 hashes →
    σ ≈ 0.125; 0.35 ≈ 2.8σ)."""
    shared = set(jaccard_pairs) & set(lsh_pairs)
    assert shared
    for p in shared:
        assert abs(jaccard_pairs[p] - lsh_pairs[p]) <= 0.35, (
            p,
            jaccard_pairs[p],
            lsh_pairs[p],
        )


def test_exact_dedup_groups_are_consistent(spark, sf_dir):
    """q13: canonical_id is the min doc_id of each fingerprint group;
    survivors are exactly the non-duplicates."""
    df = load_all()["q13_exact_dedup"].build(spark, sf_dir)
    rows = df.collect()
    survivors = {r["doc_id"] for r in rows if not r["is_duplicate"]}
    canon = {r["canonical_id"] for r in rows}
    assert canon <= survivors  # every canonical row survives
    dupes = [r for r in rows if r["is_duplicate"]]
    for r in dupes:
        assert r["canonical_id"] < r["doc_id"]
