"""Semantic tests for near-dup dedup (L2): MinHash-LSH candidate
recall against exact n-gram Jaccard, and estimator quality.

The LSH path (q27) has no SQL oracle (xxhash64 signatures); these
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
    df = load_all()["q64_ngram_jaccard"].build(spark, sf_dir)
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}


@pytest.fixture(scope="module")
def lsh_pairs(spark, sf_dir):
    df = load_all()["q27_minhash_lsh"].build(spark, sf_dir)
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
    """q18: canonical_id is the min doc_id of each fingerprint group;
    survivors are exactly the non-duplicates."""
    df = load_all()["q18_exact_dedup"].build(spark, sf_dir)
    rows = df.collect()
    survivors = {r["doc_id"] for r in rows if not r["is_duplicate"]}
    canon = {r["canonical_id"] for r in rows}
    assert canon <= survivors  # every canonical row survives
    dupes = [r for r in rows if r["is_duplicate"]]
    for r in dupes:
        assert r["canonical_id"] < r["doc_id"]


# ---------------------------------------------------------------------------
# Scale guards: hot-bucket cap in bucket_pairs, stop-shingle drop in q64.
# ---------------------------------------------------------------------------


def test_bucket_pairs_drops_pathological_bucket(spark):
    """A bucket above MAX_BUCKET_MEMBERS contributes ZERO pairs (the
    hot-bucket guard drops it before collect_list); normal buckets are
    unaffected. 60-member bucket with cap=50 → only the 5-member
    bucket's C(5,2)=10 pairs survive."""
    from bigdataproj_spark.operators.dedup import bucket_pairs

    rows = [("hot", i) for i in range(60)] + [("ok", 100 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "bh string, doc_id int")
    out = bucket_pairs(df, ["bh"], "doc_id", max_bucket=50).collect()
    assert len(out) == 10
    ids = {(r["a"]["doc_id"], r["b"]["doc_id"]) for r in out}
    assert all(100 <= a < b for a, b in ids)
    # With the cap lifted, the hot bucket's C(60,2) pairs come back.
    out_all = bucket_pairs(df, ["bh"], "doc_id", max_bucket=10_000).count()
    assert out_all == 60 * 59 // 2 + 10


def test_stop_shingle_guard_drops_hot_shingles(spark):
    """Documents that only share an ultra-frequent (stop) shingle must
    not pair up once the guard threshold is crossed. Built directly on
    the operator internals with a tiny synthetic corpus."""
    from pyspark.sql import functions as SF

    from bigdataproj_spark.operators.dedup import shingles
    from bigdataproj_spark.operators.text import tokens

    # 30 docs all containing the same boilerplate 3-gram; doc 0/1 also
    # share a genuine rare 3-gram.
    boiler = "all rights reserved"
    docs = [(0, f"{boiler} alpha beta gamma"), (1, f"{boiler} alpha beta gamma")]
    docs += [(i, f"{boiler} unique{i} x{i} y{i}") for i in range(2, 30)]
    d = spark.createDataFrame(docs, "doc_id int, text string")
    sh = d.select(
        "doc_id", SF.explode(shingles(tokens("text"))).alias("shingle")
    )
    hot = (
        sh.groupBy("shingle")
        .agg(SF.count(SF.lit(1)).alias("df"))
        .filter(SF.col("df") > 20)
        .select("shingle")
    )
    kept = sh.join(SF.broadcast(hot), "shingle", "left_anti")
    # The boilerplate shingle (df=30 > 20) is gone; rare shingles stay.
    kept_shingles = {r["shingle"] for r in kept.select("shingle").distinct().collect()}
    assert boiler not in kept_shingles
    assert any("alpha beta gamma" in s for s in kept_shingles)


def test_minhash_array_form_equals_explode_form(spark, sf_dir):
    """The round-3 map-only signature rewrite must stay bit-identical
    to the explode + groupBy-of-mins formulation it replaced (same
    universal hash family, same md5 per shingle — only the plan shape
    differs)."""
    from pyspark.sql import functions as F

    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        N_HASHES,
        SHINGLE_SIZE,
        _MH_P,
        minhash_signatures,
        shingles,
    )
    from bigdataproj_spark.operators.text import tokens

    t = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= SHINGLE_SIZE)
    )
    fast = minhash_signatures(t).orderBy("doc_id").collect()

    sh = t.select("doc_id", F.explode(shingles("toks")).alias("shingle"))
    h = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long") % _MH_P
    hashed = sh.select("doc_id", h.alias("h"))
    mins = [
        F.min((MINHASH_A[s] * F.col("h") + MINHASH_B[s]) % _MH_P).alias(f"mh{s}")
        for s in range(N_HASHES)
    ]
    slow = (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select("doc_id", F.array(*[f"mh{s}" for s in range(N_HASHES)]).alias("sig"))
        .orderBy("doc_id")
        .collect()
    )
    assert len(fast) == len(slow) > 0
    for a, b in zip(fast, slow):
        assert a.doc_id == b.doc_id and a.sig == b.sig


def test_incremental_dedup_status_partition(spark, sf_dir):
    """r10's three statuses must partition the batch consistently:
    dup_index fingerprints exist in the index side, new/dup_batch ones
    don't, and the min-doc_id member of every non-indexed fingerprint
    group is the one labeled new."""
    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.dedup import (
        _INCR_PREFIX,
        _INCR_SPLIT,
        r119_incremental_dedup,
    )
    from bigdataproj_spark.operators.text import tokens

    pdf = r119_incremental_dedup(spark, sf_dir).toPandas()
    assert (pdf["doc_id"] >= _INCR_SPLIT).all()
    idx = set(
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _INCR_SPLIT)
        .select(
            F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, _INCR_PREFIX))).alias("f")
        )
        .toPandas()["f"]
    )
    in_idx = pdf["fingerprint"].isin(idx)
    assert (pdf.loc[in_idx, "status"] == "dup_index").all()
    rest = pdf[~in_idx]
    assert set(rest["status"]) <= {"new", "dup_batch"}
    for _, g in rest.groupby("fingerprint"):
        g = g.sort_values("doc_id")
        assert g["status"].iloc[0] == "new"
        assert (g["status"].iloc[1:] == "dup_batch").all()


def test_chunk_dedup_conservation(spark, sf_dir):
    """r11: per-doc chunk counts are consistent, and the corpus-wide
    number of surviving chunks equals the number of distinct span
    fingerprints (each fingerprint survives exactly once)."""
    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.dedup import (
        _CHUNK_DEDUP_K,
        r126_chunk_dedup,
    )
    from bigdataproj_spark.operators.text import tokens

    pdf = r126_chunk_dedup(spark, sf_dir).toPandas()
    assert (pdf["n_dup_chunks"] <= pdf["n_chunks"]).all()
    assert (pdf["n_tokens_kept"] >= 0).all()
    t = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
    )
    st = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_CHUNK_DEDUP_K))
        ).alias("s"),
        "toks",
    )
    n_distinct = (
        st.select(
            F.md5(
                F.concat_ws(" ", F.slice("toks", F.col("s") + 1, _CHUNK_DEDUP_K))
            ).alias("f")
        )
        .distinct()
        .count()
    )
    assert int((pdf["n_chunks"] - pdf["n_dup_chunks"]).sum()) == n_distinct


def test_lsh_pipeline_bounded_under_adversarial_boilerplate(spark, tmp_path):
    """End-to-end q27 pipeline on an adversarially skewed corpus: a
    boilerplate blob replicated past MAX_BUCKET_MEMBERS makes every
    band bucket of that blob hot. The guard must (a) emit ZERO pairs
    from the boilerplate mass — its ~3M would-be pairs are quadratic
    noise — while (b) planted near-dup pairs among the normal docs
    still surface. This is the full operator under skew, not the
    bucket_pairs unit in isolation."""
    from bigdataproj_spark.operators.dedup import MAX_BUCKET_MEMBERS
    from bigdataproj_spark.registry import load_all

    n_boiler = MAX_BUCKET_MEMBERS + 500
    boiler = spark.range(0, n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "terms of service all rights reserved contact us privacy "
            "policy cookie notice subscribe newsletter follow social"
        ).alias("text"),
    )
    # 40 normal docs in 20 planted near-identical pairs (ids 10000+),
    # texts unique per pair via hashed tokens.
    normal = spark.range(0, 40).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda i: F.sha2(
                    F.concat((F.col("id") / 2).cast("int").cast("string"),
                             i.cast("string")),
                    256,
                ).substr(1, 8),
            ),
        ).alias("text"),
    )
    corpus = boiler.unionByName(normal)
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")

    pairs = load_all()["q27_minhash_lsh"].build(spark, sf_dir).toPandas()
    boiler_pairs = pairs[(pairs.doc_a < 10_000) & (pairs.doc_b < 10_000)]
    planted = pairs[(pairs.doc_a >= 10_000) & (pairs.doc_b >= 10_000)]
    assert len(boiler_pairs) == 0, len(boiler_pairs)
    # every planted pair (2k, 2k+1) has identical text -> must surface
    want = {(10_000 + 2 * k, 10_000 + 2 * k + 1) for k in range(20)}
    got = {(int(a), int(b)) for a, b in zip(planted.doc_a, planted.doc_b)}
    assert want <= got, want - got


def test_incremental_lsh_replay_equals_one_shot(spark, sf_dir, tmp_path):
    """Three-batch ingest replay: the union of each batch's NEW pairs
    must equal the one-shot q27 pair set exactly (no bucket crosses
    the cap on the fixture, so batch timing cannot change guard
    outcomes). This is the near-dup twin of r119's exact-dedup
    incremental contract."""
    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.dedup import incremental_minhash_lsh
    from bigdataproj_spark.registry import load_all

    d = table(spark, sf_dir, "documents")
    idx = str(tmp_path / "bands_idx")
    emitted = []
    for i in range(3):
        out = incremental_minhash_lsh(
            spark, idx, d.filter(F.col("doc_id") % 3 == i)
        ).toPandas()
        emitted.append(out)

    import pandas as pd

    got = (
        pd.concat(emitted)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = (
        load_all()["q27_minhash_lsh"].build(spark, sf_dir).toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # batches partition the pair set: no pair emitted twice
    assert not got.duplicated(["doc_a", "doc_b"]).any()


def test_incremental_lsh_guard_engages_when_bucket_crosses_cap(spark, tmp_path):
    """A bucket that crosses max_bucket as the corpus grows must stop
    emitting: batch 1 (under cap) pairs its members; batch 2 pushes
    the same bucket past the cap, so the combined bucket is dropped
    and batch 2 contributes ZERO new boilerplate pairs — bounded work
    under ingest-time skew."""
    from bigdataproj_spark.operators.dedup import incremental_minhash_lsh

    text = "terms of service all rights reserved contact privacy policy notice"
    def boiler(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"), F.lit(text).alias("text")
        )

    idx = str(tmp_path / "idx")
    first = incremental_minhash_lsh(spark, idx, boiler(0, 10), max_bucket=15)
    assert first.count() == 10 * 9 // 2  # under cap: all pairs
    second = incremental_minhash_lsh(spark, idx, boiler(10, 20), max_bucket=15)
    assert second.count() == 0  # combined bucket (20 > 15) dropped
