"""Semantic tests for similarity search (L3): ANN-vs-exact recall and
the numeric kernel.

q45 (LSH-bucketed ANN) has no SQL oracle; its contract is recall
against q29's exact brute-force answer (SURVEY.md §2.3 L3).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from bigdataproj_spark.operators.similarity import dot_exact, sq_norm_exact
from bigdataproj_spark.registry import load_all


def test_dot_and_norm_kernel(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a array<float>, b array<float>",
    )
    r = df.select(
        dot_exact("a", "b").alias("dot"), sq_norm_exact("a").alias("na")
    ).first()
    assert r["dot"] == pytest.approx(32.0)
    assert r["na"] == pytest.approx(14.0)


def test_ann_results_are_subset_of_exact_topk(spark, sf_dir):
    """Every ANN hit must be a genuinely-similar pair: its cosine is
    exact (re-ranked), so it must appear in the exact top-20 of its
    probe (ANN searches a subset of candidates)."""
    exact = load_all()["q29_cosine_topk"].build(spark, sf_dir).collect()
    ann = load_all()["r177_ann_lsh"].build(spark, sf_dir).collect()
    assert ann, "ANN should return candidates on the fixture"
    exact_cos = {
        (r["probe_id"], r["cand_id"]): r["cos_sim"] for r in exact
    }
    for r in ann:
        key = (r["probe_id"], r["cand_id"])
        if key in exact_cos:
            # shared pair → identical exact cosine after re-rank
            assert r["cos_sim"] == pytest.approx(exact_cos[key], abs=1e-6)


def test_identical_vectors_share_bucket(spark):
    """The sign-LSH collision guarantee: identical (and near-identical)
    vectors hash to the same bucket — the property that makes bucketed
    ANN find true near-duplicates at 100 TB. Random unrelated vectors
    (the fixture's cos≈0.4 pairs) carry NO such guarantee, by design."""
    from bigdataproj_spark.operators.similarity import _bucket, quantize_q20

    base = [0.1 * (i % 7) - 0.3 for i in range(64)]
    near = list(base)
    near[0] += 1e-6  # tiny perturbation: same side of every hyperplane
    flipped = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, flipped)], "vec_id long, v array<float>"
    ).select("vec_id", quantize_q20("v").alias("q"))
    rows = {r["vec_id"]: r["b"] for r in df.select("vec_id", _bucket("q").alias("b")).collect()}
    assert rows[1] == rows[2]
    # A sign-flipped vector flips every plane: all 8 bits invert.
    assert rows[1] == 255 - rows[3]


def test_ivf_hits_have_exact_cosines(spark, sf_dir):
    """Same contract as the LSH path: every IVF hit is exactly
    re-ranked, so wherever it overlaps q29's exact top-k the cosine
    must be identical; and every probe must surface candidates."""
    exact = load_all()["q29_cosine_topk"].build(spark, sf_dir).collect()
    ivf = load_all()["r128_ann_ivf"].build(spark, sf_dir).collect()
    assert ivf, "IVF ANN should return candidates on the fixture"
    assert len({r["probe_id"] for r in ivf}) == 5
    exact_cos = {(r["probe_id"], r["cand_id"]): r["cos_sim"] for r in exact}
    for r in ivf:
        key = (r["probe_id"], r["cand_id"])
        if key in exact_cos:
            assert r["cos_sim"] == pytest.approx(exact_cos[key], abs=1e-6)


def test_ivf_cell_assignment_is_nearest_centroid(spark, sf_dir):
    """A centroid vector's own cell must be itself (cos=1 to itself)."""
    from bigdataproj_spark.operators.similarity import (
        _IVF_CENT_LO,
        _IVF_K,
        _cell_struct_array,
        _ivf_centroids,
        dot_q20,
        quantize_q20,
    )

    cents = _ivf_centroids(spark, sf_dir)
    e = load_all()  # noqa: F841  (registry warm; table read below)
    from bigdataproj_spark.catalog import table

    q = (
        table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") >= _IVF_CENT_LO)
            & (F.col("vec_id") < _IVF_CENT_LO + _IVF_K)
        )
        .select("vec_id", quantize_q20("embedding").alias("qe"))
        .select("vec_id", "qe", F.sqrt(dot_q20("qe", "qe").cast("double")).alias("norm"))
        .withColumn("cells", F.sort_array(_cell_struct_array(cents), asc=False))
        .select("vec_id", (-F.col("cells")[0]["nj"]).alias("cell"))
    )
    for r in q.collect():
        assert r["cell"] == r["vec_id"]


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    """k-means invariants: every vector lands in exactly one cluster
    (sizes sum to the corpus), all K clusters are non-empty on the
    fixture, and a re-run is bit-identical (checkpointed loop, no
    RNG)."""
    from bigdataproj_spark.operators.similarity import (
        _KM_K,
        r123_kmeans_embeddings,
    )

    a = r123_kmeans_embeddings(spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert a["n_members"].sum() == n
    assert len(a) == _KM_K
    assert (a["n_members"] > 0).all()
    b = r123_kmeans_embeddings(spark, sf_dir).toPandas()
    assert a.equals(b)


def test_ivf_semantic_edges_recall_and_precision(spark, sf_dir):
    """The IVF-gated SemDeDup edge miner vs ground truth (exact
    all-pairs cosine, computed here in numpy with the same Q20
    arithmetic): every emitted edge must be a true tau-edge with the
    exact cosine (precision 1.0 — scoring inside a cell is exact),
    and the 2-probe cell assignment must recover a healthy majority
    of the exact edge set (measured 0.68 on the fixture; floor 0.55
    allows fixture drift, and the cross-cell misses are the
    documented approximation of the prefilter)."""
    import numpy as np

    from bigdataproj_spark.operators.similarity import (
        _Q,
        _SEMDEDUP_COS,
        ivf_semantic_edges,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb["vec_id"].to_numpy()
    Q = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * _Q
                 ).astype(np.int64)
    nrm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    cos = (Q @ Q.T).astype(np.float64) / (nrm[:, None] * nrm[None, :])
    iu = np.triu_indices(len(ids), 1)
    mask = cos[iu] >= _SEMDEDUP_COS
    exact = {
        (int(a), int(b)): c
        for a, b, c in zip(ids[iu[0][mask]], ids[iu[1][mask]], cos[iu][mask])
    }

    got = ivf_semantic_edges(spark, sf_dir).toPandas()
    assert len(got) == len(set(zip(got["src"], got["dst"])))  # deduped
    for src, dst, c in zip(got["src"], got["dst"], got["cos"]):
        assert (src, dst) in exact, (src, dst)
        assert c == exact[(src, dst)]  # bit-exact scoring
    recall = len(got) / len(exact)
    assert recall >= 0.55, recall


def test_bounded_collect_guard_fires_on_oversized_fixture(spark, tmp_path):
    """The documented-bound contract on driver-side collects is
    ENFORCED, not prose: an embeddings fixture whose sub-_NEAR_DUP_MAX_ID
    slice exceeds the bound (duplicate vec_ids) must fail loudly at the
    collect site instead of shipping an oversized model to the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 400  # == similarity._NEAR_DUP_MAX_ID; duplicated below -> 2x bound
    ids = list(range(n)) * 2
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [np.full(8, 0.1, dtype=np.float32) for _ in ids],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    with pytest.raises(AssertionError, match="documented bound is 400"):
        load_all()["q50_semantic_dedup"].build(spark, str(tmp_path))


def test_pq_adc_rerank_recall_vs_exact(spark, sf_dir):
    """r137's two-stage PQ (ADC shortlist -> exact re-rank) must keep
    most of the true top-3 (recall pinned at each fixture scale:
    measured 0.73-0.87; threshold leaves host-variance margin). The
    exact ground truth replays the engine's own Q20 squared-L2."""
    import numpy as np

    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.similarity import _Q

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    ids = e["vec_id"].to_numpy()
    Q = np.floor(
        np.stack(e["embedding"].to_numpy()).astype(np.float64) * _Q
    ).astype(np.int64)
    got = load_all()["r137_ann_pq"].build(spark, sf_dir).toPandas()
    rec = []
    for pid in range(5):
        p = Q[ids == pid][0]
        d = ((Q - p) ** 2).sum(axis=1)
        order = sorted(zip(d.tolist(), ids.tolist()))
        exact = [int(i) for _, i in order if i != pid][:3]
        approx = got[got["probe_id"] == pid]["cand_id"].tolist()
        # re-ranked distances are the exact ones for the returned rows
        for _, row in got[got["probe_id"] == pid].iterrows():
            assert row["dist"] == int(d[ids == row["cand_id"]][0])
        rec.append(len(set(exact) & set(approx)) / 3)
    assert sum(rec) / len(rec) >= 0.6, rec


def test_rrf_fuse_semantics(spark):
    """L25 unit: a doc in both legs sums both reciprocal ranks; a doc
    in one leg scores only that leg's term with rank 0 (never NULL)
    recorded for the missing one; the fused order ties on doc_id."""
    from bigdataproj_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, lex_rank int"
    )
    dense = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, dense_rank int"
    )
    rows = {r.doc_id: r for r in rrf_fuse(lex, dense, k=60).collect()}
    assert rows[20].rrf == 1.0 / 62 + 1.0 / 61
    assert rows[10].rrf == 1.0 / 61 and rows[10].dense_rank == 0
    assert rows[40].rrf == 1.0 / 62 and rows[40].lex_rank == 0
    # both-legs doc outranks either single-leg doc
    assert [r.doc_id for r in sorted(rows.values(), key=lambda r: r.fused_rank)][0] == 20
