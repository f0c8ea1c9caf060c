"""Similarity search & embedding operators (SURVEY.md §2.3 L3/L4).

Serves the reference's embedding surface (GloVe vectors, reference
README.md:59,92) generalized to the training-pipeline ANN use case:
brute-force cosine top-k as the exact baseline, sign-random-projection
LSH as the scale path.

Determinism: the hot-path cosine kernel quantizes floats to Q20 binary
fixed-point (floor(v * 2^20) — an exact IEEE op) and folds int64
multiply-adds, so sums are order-independent exact integers and the
final sqrt/divide happens in IEEE double — bit-identical to the DuckDB
oracle's unnest+SUM formulation and ~10x cheaper than a per-element
DECIMAL fold. The DECIMAL kernel (dot_exact/sq_norm_exact) remains for
full-float-precision use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import assert_bounded_model, round_fp
from ..session import iter_checkpoint
from ..registry import query

_DEC = "decimal(30,15)"


def _dec_fold(products: Column) -> Column:
    """Order-independent sum of an array of doubles via DECIMAL casts."""
    zero = F.lit(0).cast(_DEC)
    return F.aggregate(
        products,
        zero,
        lambda acc, x: (acc + x.cast(_DEC)).cast(_DEC),
    ).cast("double")


def dot_exact(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _dec_fold(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def sq_norm_exact(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return _dec_fold(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


# Hot-path kernel: Q20 binary fixed-point. floor(v * 2^20) is an EXACT
# IEEE op on float inputs; int64 multiply-add replaces the BigDecimal
# fold (~10x cheaper per element, still bit-identical to the DuckDB
# twin). |q| ≤ ~2^21 for unit-scale embeddings → a 64-dim dot stays
# under 2^48, far inside both int64 and double-exact range.
_Q = 1 << 20


def quantize_q20(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: F.floor(x.cast("double") * _Q).cast("long"))


def _int_fold(products: Column) -> Column:
    return F.aggregate(products, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dot_q20(qa: Column | str, qb: Column | str) -> Column:
    """Exact int64 dot product of two pre-quantized Q20 vectors."""
    qa = F.col(qa) if isinstance(qa, str) else qa
    qb = F.col(qb) if isinstance(qb, str) else qb
    return _int_fold(F.zip_with(qa, qb, lambda x, y: x * y))


# ---------------------------------------------------------------------------
# L3 brute-force cosine top-k (exact baseline).
# ---------------------------------------------------------------------------

_N_PROBES = 5
_TOP_K = 5

_Q18_ORACLE = f"""
WITH el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS vq
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(vq * vq) AS BIGINT) AS nsq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
         CAST(SUM(a.vq * b.vq) AS BIGINT) AS dot
  FROM el a
  JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {_N_PROBES}
  GROUP BY 1, 2
),
scored AS (
  SELECT probe_id, cand_id,
    CAST(d.dot AS DOUBLE)
      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
  FROM dots d
  JOIN norms na ON d.probe_id = na.vec_id
  JOIN norms nb ON d.cand_id = nb.vec_id
)
SELECT probe_id, cand_id, rank, round(cos, 6) AS cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
WHERE rank <= {_TOP_K}
ORDER BY probe_id, rank
"""


@query("q29_cosine_topk", oracle=_Q18_ORACLE, tags=("L3", "bench", "similarity"))
def q29_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 5 probe vectors (brute force).

    The scoring kernel is an Arrow-batched numpy matmul over
    ``mapInPandas`` — the one hot loop in the engine where a
    vectorized Python kernel beats the JVM expression tree (zip_with/
    aggregate lambdas evaluate per element; int64 matmul does the
    whole probe x candidate block at once; measured 1.06 s → 0.34 s at
    sf1, bit-equal). Exactness is preserved because every step is the
    same IEEE/integer arithmetic as the oracle: floor(double*2^20)
    int64 quantization, exact int64 matmul, double divide by the norm
    product. Each Arrow batch emits only its per-probe top-k (global
    top-k == top-k of per-batch top-ks, same (cos desc, cand_id)
    tie-break), so the full pair matrix is never materialized and the
    shuffle into the final re-rank carries batches x P x K rows. The
    probe fetch is a P-row collect (the "query vectors", like the IVF
    centroid train step); q45 is the LSH-bucketed scale path.
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    probe_rows = sorted(
        e.filter(F.col("vec_id") < _N_PROBES).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    assert_bounded_model(probe_rows, _N_PROBES, "cosine top-k probe fetch")
    P = np.floor(
        np.array([r.embedding for r in probe_rows], dtype=np.float64) * _Q
    ).astype(np.int64)
    p_ids = np.array([r.vec_id for r in probe_rows], dtype=np.int64)
    p_norm = np.sqrt((P * P).sum(axis=1).astype(np.float64))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            C = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _Q
            ).astype(np.int64)
            c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            cos = (C @ P.T).astype(np.float64) / (c_norm[:, None] * p_norm[None, :])
            out = []
            for j in range(len(p_ids)):
                mask = ids != p_ids[j]
                cj, ij = cos[mask, j], ids[mask]
                order = np.lexsort((ij, -cj))[:_TOP_K]
                out.append(
                    pd.DataFrame(
                        {"probe_id": p_ids[j], "cand_id": ij[order], "cos": cj[order]}
                    )
                )
            yield pd.concat(out)

    scored = e.select("vec_id", "embedding").mapInPandas(
        score, "probe_id long, cand_id long, cos double"
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "cand_id", "rank", F.round("cos", 6).alias("cos_sim"))
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# L4 embedding pooling: element-wise mean vector per label.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT
  label,
  pos - 1 AS pos,
  CAST(SUM(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
    / 1048576 / COUNT(*) AS avg_val
FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) idx
GROUP BY label, pos
ORDER BY label, pos
"""


@query("q69_embedding_pool", oracle=_Q19_ORACLE, tags=("L4", "similarity"))
def q69_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled embedding per label, emitted as (label, pos, value)
    rows (the reference's GloVe average-pooling surface, README.md:92).

    posexplode → partial+final agg on the bounded (label, pos) key.
    Floats are quantized to Q20 binary fixed-point (floor(v * 2^20) —
    an EXACT IEEE op, unlike decimal rounding whose tie-breaks differ
    between engines), summed as exact int64, divided back in double.
    """
    e = table(spark, sf_dir, "embeddings")
    r138 = F.floor(F.col("v").cast("double") * 1048576).cast("long")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(r138).cast("double") / 1048576 / F.count(F.lit(1))).alias("avg_val")
        )
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------------------
# ANN scale path: sign-random-projection LSH buckets + exact re-rank.
# Hyperplane components are md5-derived integer CONSTANTS computed at
# import (deterministic, no stored model, no runtime hashing): plane
# j's component i is hex60(md5('p|j|i')) % 2001 - 1000 ∈ [-1000,1000].
# Buckets run over the Q20-quantized vector in exact int64 arithmetic,
# so the full ANN pipeline has a bit-identical DuckDB twin.
# ---------------------------------------------------------------------------

_N_PLANES = 8
_DIMS = 64


def _plane_component(j: int, i: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"p|{j}|{i}".encode()).hexdigest()[:15], 16)
    return h % 2001 - 1000


PLANES: tuple[tuple[int, ...], ...] = tuple(
    tuple(_plane_component(j, i) for i in range(_DIMS)) for j in range(_N_PLANES)
)


def _bucket(qvec: Column | str) -> Column:
    """LSH bucket id of a Q20-quantized vector: sign bit of the exact
    int64 dot <q, plane_j> for each of the 8 constant planes, packed
    little-endian. |q| ≤ 2^21, |c| ≤ 1000, 64 terms → |dot| < 2^37."""
    qvec = F.col(qvec) if isinstance(qvec, str) else qvec
    bucket: Column = F.lit(0)
    for j, plane in enumerate(PLANES):
        dot = _int_fold(
            F.zip_with(
                qvec,
                F.lit([int(c) for c in plane]),  # one array literal, not 64
                lambda x, c: x * c,
            )
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _planes_values_sql() -> str:
    """(j, i, c) VALUES rows for the oracle's plane table."""
    return ", ".join(
        f"({j}, {i}, {c})"
        for j, plane in enumerate(PLANES)
        for i, c in enumerate(plane)
    )


_Q20_ORACLE = f"""
WITH planes(j, i, c) AS (VALUES {_planes_values_sql()}),
el AS (
  SELECT vec_id, i - 1 AS i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
dots AS (
  SELECT e.vec_id, p.j, CAST(SUM(e.q * p.c) AS BIGINT) AS dot
  FROM el e JOIN planes p ON e.i = p.i
  GROUP BY e.vec_id, p.j
),
buckets AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
),
norms AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nsq FROM el GROUP BY vec_id
),
pair_dots AS (
  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM el a
  JOIN buckets ba ON a.vec_id = ba.vec_id
  JOIN buckets bb ON ba.bucket = bb.bucket
  JOIN el b ON b.vec_id = bb.vec_id AND a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {_N_PROBES}
  GROUP BY 1, 2
),
scored AS (
  SELECT probe_id, cand_id,
    CAST(d.dot AS DOUBLE)
      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
  FROM pair_dots d
  JOIN norms na ON d.probe_id = na.vec_id
  JOIN norms nb ON d.cand_id = nb.vec_id
)
SELECT probe_id, cand_id, rank, round(cos, 6) AS cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
WHERE rank <= 3
ORDER BY probe_id, rank
"""


@query("r177_ann_lsh", oracle=_Q20_ORACLE, tags=("L3", "similarity"))
def r177_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via LSH bucket prefilter + exact
    cosine re-rank inside the bucket.

    At 100 TB: candidates only meet probes sharing their 8-bit bucket
    (a 256-way partition of the corpus), so the crossJoin of q29
    becomes an equi-join on the bucket key — shuffle-partitionable,
    no quadratic blow-up. Recall is tested against q29 in pytest.
    """
    e = table(spark, sf_dir, "embeddings")
    withb = e.select("vec_id", quantize_q20("embedding").alias("qe")).select(
        "vec_id",
        "qe",
        _bucket("qe").alias("bucket"),
        F.sqrt(dot_q20("qe", "qe").cast("double")).alias("norm"),
    )
    probes = F.broadcast(
        withb.filter(F.col("vec_id") < _N_PROBES).select(
            F.col("vec_id").alias("probe_id"),
            F.col("qe").alias("pe"),
            F.col("bucket").alias("pb"),
            F.col("norm").alias("pnorm"),
        )
    )
    cands = withb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("qe").alias("ce"),
        F.col("bucket").alias("cb"),
        F.col("norm").alias("cnorm"),
    )
    pairs = probes.join(cands, F.col("pb") == F.col("cb")).filter(
        F.col("probe_id") != F.col("cand_id")
    )
    scored = pairs.select(
        "probe_id",
        "cand_id",
        (dot_q20("pe", "ce").cast("double") / (F.col("pnorm") * F.col("cnorm"))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "cand_id", "rank", F.round("cos", 6).alias("cos_sim"))
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# L2/L3 embedding-cosine near-duplicate pairs (oracle-checked).
# ---------------------------------------------------------------------------

_NEAR_DUP_COS = 0.5
_NEAR_DUP_MAX_ID = 400

_Q21_ORACLE = f"""
WITH sub AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_NEAR_DUP_MAX_ID}
),
el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS vq
  FROM sub, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(vq * vq) AS BIGINT) AS nsq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM(a.vq * b.vq) AS BIGINT) AS dot
  FROM el a
  JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT vec_a, vec_b,
    CAST(d.dot AS DOUBLE)
      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
  FROM dots d
  JOIN norms na ON d.vec_a = na.vec_id
  JOIN norms nb ON d.vec_b = nb.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS cos_sim
FROM scored
WHERE cos >= {_NEAR_DUP_COS}
ORDER BY vec_a, vec_b
"""


@query("q71_embedding_near_dup", oracle=_Q21_ORACLE, tags=("L2", "L3", "similarity"))
def q71_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.5) over a
    bounded id range — the exact reference semantics for semantic
    dedup of a training corpus.

    This is the oracle-checked exact form; the 100 TB path is the
    same computation gated by the q45 LSH bucket join (candidates
    only meet inside a bucket) — exact re-rank inside buckets means
    the two paths agree wherever the bucket recall allows.
    """
    e = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _NEAR_DUP_MAX_ID
    )
    withn = e.select("vec_id", quantize_q20("embedding").alias("qe")).select(
        "vec_id", "qe", F.sqrt(dot_q20("qe", "qe").cast("double")).alias("norm")
    )
    a = withn.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qe").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = withn.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qe").alias("eb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = dot_q20("ea", "eb").cast("double") / (F.col("na") * F.col("nb"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= _NEAR_DUP_COS)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# ANN scale path #2: IVF (inverted-file) cells + exact re-rank.
# The coarse quantizer is K deterministic seed vectors (vec_ids
# [_IVF_CENT_LO, _IVF_CENT_LO + K) — sample-init without Lloyd
# iterations, so both engines derive identical centroids straight from
# the table). The quantizer is a driver-held MODEL (like any IVF
# index): assignment folds the K collected centroids into literal
# expressions → a map-only pass, NO shuffle, no N×K join. Probes scan
# the _IVF_NPROBE nearest cells; candidates live in exactly one cell.
# ---------------------------------------------------------------------------

_IVF_CENT_LO = 100
_IVF_K = 8
_IVF_NPROBE = 2


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[int], float]]:
    """Collect the K Q20-quantized seed centroids: (cid, qvec, norm).

    The ONLY collect in the module — K rows, the IVF 'train' step; the
    result ships to executors as plan literals (model broadcast).
    """
    import math

    e = table(spark, sf_dir, "embeddings")
    rows = (
        e.filter(
            (F.col("vec_id") >= _IVF_CENT_LO)
            & (F.col("vec_id") < _IVF_CENT_LO + _IVF_K)
        )
        .select("vec_id", quantize_q20("embedding").alias("qe"))
        .collect()
    )
    assert_bounded_model(rows, _IVF_K, "IVF centroid train collect")
    return [
        (r["vec_id"], list(r["qe"]), math.sqrt(sum(q * q for q in r["qe"])))
        for r in sorted(rows, key=lambda r: r["vec_id"])
    ]


def _cell_struct_array(cents) -> Column:
    """Per-row array<struct<c: cos-to-centroid, nj: -cid>>; array_max /
    sort_array over it realize argmax with the (cos DESC, cid ASC)
    tie-break, matching the oracle's ROW_NUMBER order exactly."""
    elems = []
    for cid, qvec, cnorm in cents:
        dot = _int_fold(
            F.zip_with(
                F.col("qe"),
                F.lit([int(q) for q in qvec]),  # one array literal, not 64
                lambda x, c: x * c,
            )
        )
        cos = dot.cast("double") / (F.col("norm") * F.lit(cnorm))
        elems.append(F.struct(cos.alias("c"), F.lit(-cid).cast("int").alias("nj")))
    return F.array(*elems)


_Q22_ORACLE = f"""
WITH el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nsq FROM el GROUP BY vec_id
),
cel AS (
  SELECT vec_id AS cid, i, q AS cq FROM el
  WHERE vec_id >= {_IVF_CENT_LO} AND vec_id < {_IVF_CENT_LO + _IVF_K}
),
cnorms AS (
  SELECT cid, CAST(SUM(cq * cq) AS BIGINT) AS cnsq FROM cel GROUP BY cid
),
cdot AS (
  SELECT e.vec_id, c.cid, CAST(SUM(e.q * c.cq) AS BIGINT) AS dot
  FROM el e JOIN cel c ON e.i = c.i
  GROUP BY 1, 2
),
assign AS (
  SELECT d.vec_id, d.cid,
    ROW_NUMBER() OVER (
      PARTITION BY d.vec_id
      ORDER BY CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(n.nsq AS DOUBLE)) * sqrt(CAST(cn.cnsq AS DOUBLE))) DESC,
               d.cid
    ) AS rn
  FROM cdot d
  JOIN norms n ON d.vec_id = n.vec_id
  JOIN cnorms cn ON d.cid = cn.cid
),
cand AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
probes AS (SELECT vec_id, cid FROM assign WHERE vec_id < {_N_PROBES} AND rn <= {_IVF_NPROBE}),
pair_dots AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM probes p
  JOIN cand c ON p.cid = c.cid AND c.vec_id <> p.vec_id
  JOIN el a ON a.vec_id = p.vec_id
  JOIN el b ON b.vec_id = c.vec_id AND a.i = b.i
  GROUP BY 1, 2
),
scored AS (
  SELECT probe_id, cand_id,
    CAST(d.dot AS DOUBLE)
      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
  FROM pair_dots d
  JOIN norms na ON d.probe_id = na.vec_id
  JOIN norms nb ON d.cand_id = nb.vec_id
)
SELECT probe_id, cand_id, rank, round(cos, 6) AS cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
WHERE rank <= 3
ORDER BY probe_id, rank
"""


@query("r128_ann_ivf", oracle=_Q22_ORACLE, tags=("L3", "similarity"))
def r128_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via IVF cells + exact cosine re-rank.

    Complements q45's LSH path with the other standard ANN index
    shape: a coarse quantizer partitions the corpus into K cells;
    probes search their _IVF_NPROBE nearest cells only. At 100 TB the
    assignment is a map-only scan (centroids are plan literals — no
    join, no shuffle), the corpus shuffles once on its cell id, and
    per-cell work is corpus/K — the crossJoin of q29 never happens.
    Recall vs exact q29 is pinned in tests/test_similarity.py.
    """
    cents = _ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.select("vec_id", quantize_q20("embedding").alias("qe"))
        .select("vec_id", "qe", F.sqrt(dot_q20("qe", "qe").cast("double")).alias("norm"))
        .withColumn("cells", F.sort_array(_cell_struct_array(cents), asc=False))
    )
    cands = q.select(
        F.col("vec_id").alias("cand_id"),
        F.col("qe").alias("ce"),
        F.col("norm").alias("cnorm"),
        (-F.col("cells")[0]["nj"]).alias("cell"),
    )
    probes = F.broadcast(
        q.filter(F.col("vec_id") < _N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("qe").alias("pe"),
            F.col("norm").alias("pnorm"),
            F.explode(
                F.transform(F.slice("cells", 1, _IVF_NPROBE), lambda s: -s["nj"])
            ).alias("cell"),
        )
    )
    pairs = probes.join(cands, "cell").filter(F.col("probe_id") != F.col("cand_id"))
    scored = pairs.select(
        "probe_id",
        "cand_id",
        (dot_q20("pe", "ce").cast("double") / (F.col("pnorm") * F.col("cnorm"))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "cand_id", "rank", F.round("cos", 6).alias("cos_sim"))
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# r05: semantic dedup (SemDeDup-style) — embedding-cosine clusters with
# survivor selection. Pairs at cos >= threshold become edges; connected
# components label every vector with its cluster; the min-id member
# survives, the rest are the semantic duplicates a corpus pipeline
# drops. Exact-pair form over the bounded id range (the 100 TB path
# gates pair generation with the r70-style LSH/IVF bucket join, exact
# re-rank inside buckets — same downstream clustering).
# ---------------------------------------------------------------------------

_SEMDEDUP_COS = 0.3

_Q_R05_ORACLE = f"""
WITH RECURSIVE sub AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_NEAR_DUP_MAX_ID}
),
el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS vq
  FROM sub, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(vq * vq) AS BIGINT) AS nsq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM(a.vq * b.vq) AS BIGINT) AS dot
  FROM el a
  JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
edges AS (
  SELECT vec_a AS src, vec_b AS dst
  FROM dots
  JOIN norms na ON vec_a = na.vec_id
  JOIN norms nb ON vec_b = nb.vec_id
  WHERE CAST(dot AS DOUBLE) / (sqrt(na.nsq) * sqrt(nb.nsq)) >= {_SEMDEDUP_COS}
),
und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach AS (
  SELECT src AS vec_id, src AS r FROM und
  UNION
  SELECT r.vec_id, u.dst AS r
  FROM reach r JOIN und u ON r.r = u.src
),
lbl AS (
  SELECT vec_id, MIN(r) AS cluster_id FROM reach GROUP BY vec_id
)
SELECT s.vec_id,
       COALESCE(l.cluster_id, s.vec_id) AS cluster_id,
       (COALESCE(l.cluster_id, s.vec_id) = s.vec_id) AS is_survivor
FROM sub s LEFT JOIN lbl l USING (vec_id)
ORDER BY vec_id
"""


@query("q50_semantic_dedup", oracle=_Q_R05_ORACLE, tags=("L2", "L3", "similarity"))
def q50_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-duplicate clusters over embedding cosine >= 0.3 with
    min-id survivor selection — the SemDeDup recipe: embed, find
    near-neighbors, keep one representative per semantic cluster.

    Spark side: exact Q20-integer pair scoring via the same Arrow
    numpy-matmul kernel as q29 (the bounded comparison set rides in
    the UDF closure; each batch emits only its above-threshold edges —
    no BNLJ pair materialization, same floor/int64/IEEE arithmetic as
    the oracle), iterative min-label propagation for the transitive
    closure, then a left join back to the full vector set so
    singletons survive as their own cluster. Oracle side: the same
    pairs fed to a recursive-CTE transitive closure — two different
    algorithms, identical labels required.
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _NEAR_DUP_MAX_ID)
    ref_rows = sorted(
        e.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    assert_bounded_model(ref_rows, _NEAR_DUP_MAX_ID, "SemDeDup reference slice")
    R = np.floor(
        np.array([r.embedding for r in ref_rows], dtype=np.float64) * _Q
    ).astype(np.int64)
    r_ids = np.array([r.vec_id for r in ref_rows], dtype=np.int64)
    r_norm = np.sqrt((R * R).sum(axis=1).astype(np.float64))

    def edge_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            C = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _Q
            ).astype(np.int64)
            c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            cos = (C @ R.T).astype(np.float64) / (c_norm[:, None] * r_norm[None, :])
            # upper triangle only (src < dst) at/above threshold
            src, dst = np.where((cos >= _SEMDEDUP_COS) & (ids[:, None] < r_ids[None, :]))
            yield pd.DataFrame({"src": ids[src], "dst": r_ids[dst]})

    edges = e.select("vec_id", "embedding").mapInPandas(edge_kernel, "src long, dst long")
    from .dedup import connected_components

    labels = connected_components(edges).withColumnRenamed("doc_id", "vec_id")
    return (
        e.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id")).alias(
                "is_survivor"
            ),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# L18 at scale: SemDeDup routed through the IVF prefilter — the FULL
# embedding corpus, no id bound. Pair generation is gated by the r128
# coarse quantizer: every vector maps to one of K cells (map-only,
# centroids are plan literals), exact Q20 cosine scoring runs only
# WITHIN a cell, and per-cell work is (N/K)² instead of N². This is
# the 100 TB form the bounded q50 documents as its scale path: K grows
# with the corpus so a cell stays worker-sized, and cross-cell
# near-duplicates are the (recall-tested) approximation the prefilter
# trades for tractability.
# ---------------------------------------------------------------------------

_SD_NPROBE = 2  # cells per vector: recall/cost dial (see docstring)

_Q_SD_IVF_ORACLE = f"""
WITH RECURSIVE el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nsq FROM el GROUP BY vec_id
),
cel AS (
  SELECT vec_id AS cid, i, q AS cq FROM el
  WHERE vec_id >= {_IVF_CENT_LO} AND vec_id < {_IVF_CENT_LO + _IVF_K}
),
cnorms AS (
  SELECT cid, CAST(SUM(cq * cq) AS BIGINT) AS cnsq FROM cel GROUP BY cid
),
cdot AS (
  SELECT e.vec_id, c.cid, CAST(SUM(e.q * c.cq) AS BIGINT) AS dot
  FROM el e JOIN cel c ON e.i = c.i
  GROUP BY 1, 2
),
assign AS (
  SELECT d.vec_id, d.cid,
    ROW_NUMBER() OVER (
      PARTITION BY d.vec_id
      ORDER BY CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(n.nsq AS DOUBLE)) * sqrt(CAST(cn.cnsq AS DOUBLE))) DESC,
               d.cid
    ) AS rn
  FROM cdot d
  JOIN norms n ON d.vec_id = n.vec_id
  JOIN cnorms cn ON d.cid = cn.cid
),
cand AS (SELECT vec_id, cid FROM assign WHERE rn <= {_SD_NPROBE}),
pairs AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM cand a JOIN cand b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
pair_dots AS (
  SELECT p.va, p.vb, CAST(SUM(ea.q * eb.q) AS BIGINT) AS dot
  FROM pairs p
  JOIN el ea ON ea.vec_id = p.va
  JOIN el eb ON eb.vec_id = p.vb AND ea.i = eb.i
  GROUP BY 1, 2
),
edges AS (
  SELECT va AS src, vb AS dst FROM pair_dots
  JOIN norms na ON va = na.vec_id
  JOIN norms nb ON vb = nb.vec_id
  WHERE CAST(dot AS DOUBLE)
        / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
        >= {_SEMDEDUP_COS}
),
und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach AS (
  SELECT src AS vec_id, src AS r FROM und
  UNION
  SELECT r.vec_id, u.dst AS r
  FROM reach r JOIN und u ON r.r = u.src
),
lbl AS (
  SELECT vec_id, MIN(r) AS cluster_id FROM reach GROUP BY vec_id
)
SELECT e0.vec_id,
       COALESCE(l.cluster_id, e0.vec_id) AS cluster_id,
       (COALESCE(l.cluster_id, e0.vec_id) = e0.vec_id) AS is_survivor
FROM embeddings e0 LEFT JOIN lbl l USING (vec_id)
ORDER BY vec_id
"""


@query(
    "r173_semantic_dedup_ivf",
    oracle=_Q_SD_IVF_ORACLE,
    tags=("L18", "L3", "similarity"),
)
def r173_semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the FULL embedding corpus, pair generation gated
    by the IVF coarse quantizer (no ``_NEAR_DUP_MAX_ID`` bound).

    Stages: (1) map-only cell assignment — the K collected centroids
    fold into literal expressions, same quantizer as r128, each vector
    assigned to its _SD_NPROBE nearest cells (the recall/cost dial:
    0.25/0.68/0.93 of the exact tau=0.3 edge set at m=1/2/3 on the
    fixture, for m^2/K of the brute-force work); (2) per-cell
    exact edge mining via ``applyInPandas``: the Arrow kernel scores a
    cell's Q20-quantized vectors against each other in row-blocked
    int64 matmuls (the temporary block is B×|cell|, never |cell|²
    materialized at once), emitting only (src<dst, cos≥τ) edges;
    (3) pointer-doubling connected components; (4) left join back to
    the corpus so singletons survive as their own cluster. The only
    corpus-wide exchange is the repartition onto the cell key. The
    oracle replays the identical quantizer + within-cell pairs and a
    recursive-CTE closure — different algorithm, identical labels.

    Recall vs the exact all-pairs q71 edges is pinned in
    tests/test_similarity.py; precision is 1.0 by construction (exact
    scoring inside cells).
    """
    e = table(spark, sf_dir, "embeddings")
    edges = ivf_semantic_edges(spark, sf_dir).select("src", "dst")
    from .dedup import connected_components

    labels = connected_components(edges).withColumnRenamed("doc_id", "vec_id")
    return (
        e.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id")).alias(
                "is_survivor"
            ),
        )
        .orderBy("vec_id")
    )


def ivf_semantic_edges(
    spark: SparkSession, sf_dir: str, threshold: float = _SEMDEDUP_COS
) -> DataFrame:
    """(src < dst, cos) edges at ``cos >= threshold``, mined per IVF
    cell (see r173_semantic_dedup_ivf). Exposed separately so the
    recall test can compare against the exact all-pairs q71 edges."""
    import numpy as np
    import pandas as pd

    cents = _ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.select("vec_id", "embedding", quantize_q20("embedding").alias("qe"))
        .select(
            "vec_id",
            "embedding",
            "qe",
            F.sqrt(dot_q20("qe", "qe").cast("double")).alias("norm"),
        )
        .withColumn(
            "cells", F.sort_array(_cell_struct_array(cents), asc=False)
        )
        .select(
            "vec_id",
            "embedding",
            # multi-probe assignment: each vector lands in its
            # _SD_NPROBE nearest cells, so a near-dup pair is found
            # whenever the two SHARE any cell — measured recall at the
            # fixture: 0.25 (1 cell) -> 0.68 (2 cells) -> 0.93
            # (3 cells) of the exact all-pairs tau=0.3 edges, at m^2/K
            # of the brute-force pair work.
            F.explode(
                F.transform(
                    F.slice("cells", 1, _SD_NPROBE), lambda s: -s["nj"]
                )
            ).alias("cell"),
        )
    )

    def cell_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        Qm = np.floor(
            np.stack(pdf["embedding"].to_numpy())[order].astype(np.float64) * _Q
        ).astype(np.int64)
        nrm = np.sqrt((Qm * Qm).sum(axis=1).astype(np.float64))
        frames: list[pd.DataFrame] = []
        block = 2048
        for i0 in range(0, len(ids), block):
            i1 = min(i0 + block, len(ids))
            cos = (Qm[i0:i1] @ Qm.T).astype(np.float64) / (
                nrm[i0:i1, None] * nrm[None, :]
            )
            # strict upper triangle in id order: src < dst
            ii, jj = np.where(
                (cos >= threshold) & (ids[i0:i1, None] < ids[None, :])
            )
            frames.append(
                pd.DataFrame(
                    {"src": ids[i0:i1][ii], "dst": ids[jj], "cos": cos[ii, jj]}
                )
            )
        if not frames:
            return pd.DataFrame({"src": [], "dst": [], "cos": []}).astype(
                {"src": "int64", "dst": "int64", "cos": "float64"}
            )
        return pd.concat(frames, ignore_index=True)

    return (
        q.groupBy("cell")
        .applyInPandas(cell_edges, "src long, dst long, cos double")
        # a pair sharing both probe cells is emitted twice (identical
        # cos both times) — keep one, matching the oracle's DISTINCT.
        .dropDuplicates(["src", "dst"])
    )


# ---------------------------------------------------------------------------
# C1 (engine extension): distributed k-means over the embedding corpus
# — the diversity-clustering primitive (cluster-balanced sampling,
# SemDeDup's first stage, topic bucketing) as a fixed-iteration
# Lloyd's loop.
# ---------------------------------------------------------------------------

_KM_K = 4        # clusters
_KM_ITERS = 3    # Lloyd iterations (fixed — determinism over convergence)


def _km_iter_sql(k: int) -> str:
    """One Lloyd iteration as SQL: assign each vector to the nearest
    centroid (round-12 DECIMAL-summed squared L2, ties to the lowest
    cluster id), then recompute per-(cluster, dim) means."""
    return f"""
a{k} AS (
  SELECT t.vec_id, t.dim, t.x, am.cid
  FROM ex t JOIN (
    SELECT vec_id, cid FROM (
      SELECT vec_id, cid,
        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM (
        SELECT t.vec_id, c.cid,
          SUM(CAST(round((t.x - c.c) * (t.x - c.c), 12) AS DECIMAL(28,14))) AS d
        FROM ex t JOIN c{k - 1} c ON t.dim = c.dim
        GROUP BY t.vec_id, c.cid
      )
    ) WHERE rn = 1
  ) am ON t.vec_id = am.vec_id
),
c{k} AS (
  SELECT cid, dim,
    CAST(SUM(CAST(round(x * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*)
      AS c
  FROM a{k} GROUP BY cid, dim
),
"""


_Q_KM_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
         CAST(embedding[i] AS DOUBLE) AS x
  FROM (
    SELECT vec_id, embedding,
           unnest(range(1, len(embedding) + 1)) AS i
    FROM embeddings
  )
),
c0 AS (
  SELECT CAST(vec_id AS INTEGER) AS cid, dim, x AS c
  FROM ex WHERE vec_id < {_KM_K}
),
{"".join(_km_iter_sql(k) for k in range(1, _KM_ITERS + 1))}
final_assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM (
      SELECT t.vec_id, c.cid,
        SUM(CAST(round((t.x - c.c) * (t.x - c.c), 12) AS DECIMAL(28,14))) AS d
      FROM ex t JOIN c{_KM_ITERS} c ON t.dim = c.dim
      GROUP BY t.vec_id, c.cid
    )
  ) WHERE rn = 1
)
SELECT
  CAST(a.cid AS INTEGER) AS cluster_id,
  COUNT(*) AS n_members,
  MIN(a.vec_id) AS min_vec_id,
  round(MAX(cn.norm), 6) AS centroid_norm
FROM final_assign a
JOIN (
  SELECT cid, CAST(SUM(CAST(round(c * c, 12) AS DECIMAL(28,14))) AS DOUBLE)
    AS norm
  FROM c{_KM_ITERS} GROUP BY cid
) cn ON a.cid = cn.cid
GROUP BY a.cid
ORDER BY cluster_id
"""


@query("r123_kmeans_embeddings", oracle=_Q_KM_ORACLE, tags=("C1", "similarity"))
def r123_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's algorithm, K={k}, {it} fixed
    iterations) over the embedding corpus; returns per-cluster size,
    smallest member id, and centroid squared-norm.

    Deterministic end-to-end: init centroids are the first K vectors
    by vec_id; every distance is a round-12 quantized DECIMAL sum over
    dims (order-independent, bit-equal cross-engine); argmin ties
    break to the lowest cluster id; centroid updates are exact
    DECIMAL sums divided by exact counts in IEEE double. The oracle
    replays all {it} iterations as chained CTEs.

    Plan shape at scale: the long-format corpus (vec_id, dim, x) is
    materialized ONCE and reused each iteration (at 100 TB: a
    persisted/bucketed projection — the loop re-reads it, never the
    raw table). Centroids are K×D rows — broadcast to every
    assignment join; each iteration is one corpus-keyed aggregation
    (assign) and one (cluster, dim)-keyed aggregation (update), the
    canonical two-shuffle Lloyd step. The driver loop is
    control-plane only, like r43_graph_pagerank.
    """
    e = table(spark, sf_dir, "embeddings")
    # ex is re-derived from the columnar scan by each consumer (a
    # cheap narrow projection); at 100 TB this would be a persisted
    # long-format projection instead of an RDD checkpoint, whose
    # serialization costs more than the re-scan here.
    ex = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "xf"),
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))

    centroids = iter_checkpoint(
        ex.filter(F.col("vec_id") < _KM_K).select(
            F.col("vec_id").cast("int").alias("cid"),
            "dim",
            F.col("x").alias("c"),
        )
    )

    def _assign(cents: DataFrame) -> DataFrame:
        # One-shuffle wide assignment: centroids pivot to (dim, c_0..c_K)
        # — 64 broadcast rows — so each ex row computes all K distance
        # terms in place and a single groupBy(vec_id) sums K columns at
        # once (vs a K-fold row blowup + two shuffles in the naive
        # long-format join). Terms are int64 units of 1e-12: the exact
        # BigDecimal round-12 first (the same rational as the oracle's
        # DECIMAL cast), then *1e12 + half-up floor, which recovers that
        # exact integer (FP error ~1e-3 << 0.5 at term <= 4) — the long
        # sums represent the same exact rationals as the oracle's
        # DECIMAL sums, so the argmin ordering is identical while the
        # arithmetic stays in whole-stage codegen primitives.
        cw = cents.groupBy("dim").pivot("cid", list(range(_KM_K))).agg(
            F.first("c")
        )

        def _units(k: int):
            # floor(v*1e12 + 0.5) is EXACTLY DuckDB's round(v,12) for the
            # non-negative squared terms (DuckDB rounds via FP scaling;
            # v*1e12 <= 4e12 < 2^52 so +0.5 is exact) — and it stays in
            # primitive double/long codegen, unlike Spark's Round which
            # routes every value through a BigDecimal (measured 4.7 s ->
            # 1.1 s per assignment pass at sf1). Verified against DuckDB
            # on 300k adversarial boundary values (0 diffs; the exact-
            # BigDecimal path diffs on 2.4% of those).
            diff = F.col("x") - F.col(str(k))
            return F.floor(
                diff * diff * 1_000_000_000_000 + F.lit(0.5)
            ).cast("long")

        sums = (
            ex.join(F.broadcast(cw), "dim")
            .select(
                "vec_id", *[_units(k).alias(f"t{k}") for k in range(_KM_K)]
            )
            .groupBy("vec_id")
            .agg(*[F.sum(f"t{k}").alias(f"d{k}") for k in range(_KM_K)])
        )
        m = F.least(*[F.col(f"d{k}") for k in range(_KM_K)])
        cid = F.coalesce(
            *[
                F.when(F.col(f"d{k}") == m, F.lit(k))
                for k in range(_KM_K)
            ]
        )
        return sums.select("vec_id", cid.alias("cid"))

    for _ in range(_KM_ITERS):
        assign = _assign(centroids)
        # Coordinate units of 1e-10 as int64, half-away-from-zero —
        # exactly DuckDB's round(x*1e10) evaluated on the identical
        # IEEE product; the long sum replaces a per-row BigDecimal
        # decimal(20,10) cast.
        xu = F.signum("x") * F.floor(F.abs(F.col("x")) * 1e10 + F.lit(0.5))
        centroids = iter_checkpoint(
            # assign is corpus-row-sized but slim (two ints); at fixture
            # and mid scales it broadcasts — at true 100 TB scale this
            # join runs co-partitioned on vec_id instead (both sides
            # already hash on it).
            ex.join(F.broadcast(assign), "vec_id")
            .groupBy("cid", "dim")
            .agg(
                (
                    F.sum(xu.cast("long")).cast("double")
                    / 1e10
                    / F.count(F.lit(1))
                ).alias("c")
            )
        )

    final_assign = _assign(centroids)
    norms = (
        centroids.groupBy("cid")
        .agg(
            F.sum(
                # round_fp, not F.round: c*c*1e12 can reach ~1e12, past
                # the ~1e9 threshold where BigDecimal HALF_UP diverges
                # from the oracle's FP-scaled round — same contract as
                # the assignment path above (docs/DETERMINISM.md).
                round_fp(F.col("c") * F.col("c"), 12).cast("decimal(28,14)")
            )
            .cast("double")
            .alias("norm")
        )
    )
    return (
        final_assign.join(norms, "cid")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec_id"),
            F.round(F.max("norm"), 6).alias("centroid_norm"),
        )
        .select(
            F.col("cid").cast("int").alias("cluster_id"),
            "n_members",
            "min_vec_id",
            "centroid_norm",
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# ANN scale path #3: product quantization + asymmetric distance (ADC).
# The memory-bounded index shape for 100 TB embedding stores (Jégou et
# al. 2011, "Product Quantization for Nearest Neighbor Search"): each
# vector is ENCODED as M small code ids (here 4 bytes replaces 64
# floats, a 64x compression), and a query scores candidates through a
# per-probe lookup table without touching raw vectors. The codebook is
# deterministic sample-init (subvectors of reserved vec_ids — the same
# legitimation as the IVF coarse quantizer above: a K-row model-fit
# collect, shipped as plan literals), and ALL arithmetic is exact Q20
# int64 squared-L2, so encode, LUT, and ADC scores replay bit-for-bit
# in the SQL oracle — the output distance is an integer, hash-compared
# with no float rounding anywhere.
# ---------------------------------------------------------------------------

_PQ_CODE_LO = 200   # codebook vec_ids: [_PQ_CODE_LO, _PQ_CODE_LO + _PQ_K)
_PQ_K = 32          # codes per subspace
_PQ_M = 8           # subspaces
_PQ_SUB = 8         # dims per subspace (8 x 8 = the 64-dim fixture)
_PQ_TOPK = 3
_PQ_SHORTLIST = 64  # ADC candidates kept per probe for the exact re-rank


def _pq_codebook(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[int]]]:
    """Collect the K Q20-quantized codebook vectors: (code_id, qvec).
    K rows (assert-bounded), split into per-subspace slices by the
    encoder; the 'train' step of the PQ model."""
    e = table(spark, sf_dir, "embeddings")
    rows = (
        e.filter(
            (F.col("vec_id") >= _PQ_CODE_LO) & (F.col("vec_id") < _PQ_CODE_LO + _PQ_K)
        )
        .select("vec_id", quantize_q20("embedding").alias("qe"))
        .collect()
    )
    assert_bounded_model(rows, _PQ_K, "PQ codebook train collect")
    return [(r["vec_id"], list(r["qe"])) for r in sorted(rows, key=lambda r: r.vec_id)]


def pq_encode(df: DataFrame, codebook) -> DataFrame:
    """(vec_id, qe) → (vec_id, c0..c{M-1}) PQ codes, map-only Arrow
    numpy kernel (round 12). Still no join, no shuffle — the kernel
    inherits the scan's partitioning like the IVF assignment above.

    Formulation history: the round-8 form selected each subspace's
    nearest code with M×K nested ``zip_with``/``array_min`` LITERAL
    expressions — higher-order array lambdas run in the JVM expression
    INTERPRETER (no codegen), and the 8×32 tree measured ~8 ms/row
    (the encode pass was 16 s of r137's 17.9 s at sf0.1). The kernel
    does the same arithmetic as one (N,1,SUB)−(1,K,SUB) int64
    broadcast per subspace — bit-identical because every step is
    exact: Q20 values are ≤ ~2^21, squared diffs ≤ 2^44, the SUB-dim
    sum ≤ 2^47, all inside int64; and ``np.argmin`` returns the FIRST
    minimum, which over code-id-ascending codebook rows (sorted in
    :func:`_pq_codebook`) realizes exactly the oracle's
    (d ASC, k ASC) ROW_NUMBER tie-break."""
    import numpy as np
    import pandas as pd

    code_ids = np.array([k for k, _ in codebook], dtype=np.int32)
    cb = np.array([qvec for _, qvec in codebook], dtype=np.int64)  # (K, dims)

    def encode_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["qe"].to_numpy()).astype(np.int64)  # (N, dims)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for m in range(_PQ_M):
                lo, hi = m * _PQ_SUB, (m + 1) * _PQ_SUB
                d = ((q[:, None, lo:hi] - cb[None, :, lo:hi]) ** 2).sum(axis=2)
                out[f"c{m}"] = code_ids[np.argmin(d, axis=1)]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"c{m} int" for m in range(_PQ_M))
    return df.select("vec_id", "qe").mapInPandas(encode_kernel, schema)


_Q_PQ_ORACLE = f"""
WITH el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
sub AS (
  SELECT vec_id, CAST((i - 1) // {_PQ_SUB} AS INTEGER) AS m, i, q FROM el
),
codes AS (
  SELECT vec_id AS k, m, i, q AS cq FROM sub
  WHERE vec_id >= {_PQ_CODE_LO} AND vec_id < {_PQ_CODE_LO + _PQ_K}
),
cdist AS (
  SELECT s.vec_id, s.m, c.k, CAST(SUM((s.q - c.cq) * (s.q - c.cq)) AS BIGINT) AS d
  FROM sub s JOIN codes c ON s.m = c.m AND s.i = c.i
  GROUP BY 1, 2, 3
),
assign AS (
  SELECT vec_id, m, k FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
    FROM cdist
  ) WHERE rn = 1
),
plut AS (
  SELECT vec_id AS probe_id, m, k, d FROM cdist WHERE vec_id < {_N_PROBES}
),
adist AS (
  SELECT p.probe_id, a.vec_id AS cand_id, CAST(SUM(p.d) AS BIGINT) AS adist
  FROM assign a
  JOIN plut p ON a.m = p.m AND a.k = p.k
  WHERE a.vec_id <> p.probe_id
  GROUP BY 1, 2
),
short AS (
  SELECT probe_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS srn
    FROM adist
  ) WHERE srn <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT s.probe_id, s.cand_id,
         CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS dist
  FROM short s
  JOIN el a ON a.vec_id = s.probe_id
  JOIN el b ON b.vec_id = s.cand_id AND a.i = b.i
  GROUP BY 1, 2
)
SELECT probe_id, cand_id, rank, dist
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist, cand_id) AS rank
  FROM exact
)
WHERE rank <= {_PQ_TOPK}
ORDER BY probe_id, rank
"""


@query("r137_ann_pq", oracle=_Q_PQ_ORACLE, tags=("L3", "similarity"))
def r137_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors via PQ-ADC shortlist + exact re-rank.

    The third ANN shape next to LSH (q45) and IVF (r128), and the one
    that changes the MEMORY story at 100 TB: after the map-only encode
    each vector is 8 small code ids (64 floats → 8 codes, a 32x
    compression), and the SHORTLIST stage never reads the raw
    embedding column — a probe ships an 8x32-entry integer lookup
    table (plan literals from the 5 collected probe vectors) and each
    candidate costs 8 lookups and an add. The standard two-stage
    deployment shape follows: ADC keeps the best 64 candidates per
    probe, and only that shortlist pays the exact 64-dim distance —
    so the expensive arithmetic touches P x 64 rows, not the corpus.
    Plan: scan → encode (literal expressions, no join) → LUT
    fold → shortlist window → broadcast-sized exact re-rank. ADC-only
    ranking was measured and rejected as the final ranker (recall@3
    0.0-0.27 on the fixture embeddings — sample-init codebooks can't
    fine-rank; the re-rank lifts it to the pinned threshold in
    tests/test_similarity.py). All arithmetic is exact Q20 int64, so
    the driver hash-check has no float tolerance anywhere.
    """
    cb = _pq_codebook(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize_q20("embedding").alias("qe")
    )
    probes = (
        e.filter(F.col("vec_id") < _N_PROBES).select("vec_id", "qe").collect()
    )
    assert_bounded_model(probes, _N_PROBES, "PQ probe fetch")
    # per-probe LUT: exact python-int arithmetic, identical formula to
    # the encoder/oracle (sum of squared Q20 diffs per subspace)
    lut: dict[int, list[list[int]]] = {}
    for r in probes:
        pq = list(r["qe"])
        lut[r["vec_id"]] = [
            [
                sum(
                    (pq[m * _PQ_SUB + j] - qvec[m * _PQ_SUB + j]) ** 2
                    for j in range(_PQ_SUB)
                )
                for _, qvec in cb
            ]
            for m in range(_PQ_M)
        ]
    encoded = pq_encode(e, cb)
    # One F.lit per (probe, subspace) ARRAY (round 12): the element-
    # wise form built P×M×K literal Columns — ~1,280 Py4J round trips
    # per plan build, which made BUILD (4.6 s) dwarf execution
    # (1.2 s). A list passed to F.lit is a single array<bigint>
    # literal; the folded expression is unchanged.
    per_probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(pid).cast("long").alias("probe_id"),
                    sum(
                        F.element_at(
                            F.lit([int(d) for d in lut[pid][m]]),
                            F.col(f"c{m}") - _PQ_CODE_LO + 1,
                        )
                        for m in range(_PQ_M)
                    ).alias("adist"),
                )
                for pid in sorted(lut)
            ]
        )
    ).alias("pa")
    scored = (
        encoded.select("vec_id", per_probe)
        .select(
            F.col("pa.probe_id").alias("probe_id"),
            F.col("vec_id").alias("cand_id"),
            F.col("pa.adist").alias("adist"),
        )
        .filter(F.col("cand_id") != F.col("probe_id"))
    )
    w = Window.partitionBy("probe_id").orderBy("adist", "cand_id")
    short = scored.select("*", F.row_number().over(w).alias("srn")).filter(
        F.col("srn") <= _PQ_SHORTLIST
    )
    # exact re-rank: P x 64 rows rejoin their raw Q20 vectors; the
    # probe side stays plan literals (a when-chain over the P probes),
    # so the re-rank adds no second table to the join
    probe_q = {r["vec_id"]: list(r["qe"]) for r in probes}
    exact_dist = None
    for pid in sorted(probe_q):
        d = _int_fold(
            F.zip_with(
                F.col("qe"),
                F.lit([int(v) for v in probe_q[pid]]),  # one array literal
                lambda x, p: (x - p) * (x - p),
            )
        )
        branch_cond = F.col("probe_id") == pid
        exact_dist = (
            F.when(branch_cond, d)
            if exact_dist is None
            else exact_dist.when(branch_cond, d)
        )
    reranked = (
        short.join(e, short["cand_id"] == e["vec_id"])
        .select("probe_id", "cand_id", exact_dist.alias("dist"))
    )
    w2 = Window.partitionBy("probe_id").orderBy("dist", "cand_id")
    return (
        reranked.select("*", F.row_number().over(w2).alias("rank"))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select("probe_id", "cand_id", F.col("rank").cast("long").alias("rank"), "dist")
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# L25 (round 10, r9-VERDICT item 7): hybrid retrieval fusion — the
# standard RAG/retrieval stage that combines a LEXICAL ranking (q48's
# BM25) with a DENSE ranking (q29's exact cosine) by reciprocal-rank
# fusion: rrf(d) = sum over rankings r of 1/(K + rank_r(d)), K = 60
# (Cormack/Clarke/Buettcher's constant). Two bounded top-k legs + one
# k-row join — the fusion itself is O(k), whatever the corpus size.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 20       # per-leg depth
_RRF_PROBE = 0      # the dense leg's query vector: embeddings.vec_id 0


def rrf_fuse(
    lex: DataFrame, dense: DataFrame, k: int = _RRF_K
) -> DataFrame:
    """Reciprocal-rank fusion of two (doc_id, <leg>_rank) rankings.
    A document missing from one leg contributes 0 from it (rank 0 =
    absent in the output, never NULL — keeps the column integer on
    both engines). The fused score is two scalar IEEE divisions and
    one add per row — bit-identical in any engine given identical
    integer ranks, so the fusion is exactly oracle-expressible."""
    fused = lex.join(dense, "doc_id", "full_outer")
    lex_r = F.coalesce(F.col("lex_rank"), F.lit(0)).cast("long")
    den_r = F.coalesce(F.col("dense_rank"), F.lit(0)).cast("long")
    rrf = (
        F.when(lex_r == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) / (F.lit(float(k)) + lex_r.cast("double")))
        + F.when(den_r == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) / (F.lit(float(k)) + den_r.cast("double")))
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.select(
            "doc_id",
            lex_r.alias("lex_rank"),
            den_r.alias("dense_rank"),
            rrf.alias("rrf"),
        )
        .withColumn("fused_rank", F.row_number().over(w))
        .orderBy("fused_rank")
    )


_Q_RRF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs, COUNT(*) AS sumdl
  FROM toks
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {TERMS}
  GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
bm AS (
  SELECT t.doc_id,
    CAST(floor(
      CAST(CAST(floor(
        ln(CAST(2*s.n_docs + 2 AS DOUBLE) / CAST(2*d.df + 1 AS DOUBLE))
        * 1048576) AS BIGINT) AS DOUBLE)
      * (CAST(CAST(22 AS HUGEINT)*s.sumdl*t.tf AS DOUBLE)
         / CAST(CAST(10 AS HUGEINT)*s.sumdl*t.tf + CAST(3 AS HUGEINT)*s.sumdl
                + CAST(9 AS HUGEINT)*l.dl*s.n_docs AS DOUBLE))
    ) AS BIGINT) AS term_score_q20
  FROM tf t
  JOIN dl l USING (doc_id)
  JOIN df d USING (term)
  CROSS JOIN stats s
),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sq DESC, doc_id) AS lex_rank
  FROM (
    SELECT doc_id, CAST(SUM(term_score_q20) AS BIGINT) AS sq
    FROM bm GROUP BY doc_id
  )
  QUALIFY lex_rank <= {TOP}
),
el AS (
  SELECT vec_id, i,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS vq
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
),
norms AS (
  SELECT vec_id, CAST(SUM(vq * vq) AS BIGINT) AS nsq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT b.vec_id AS cand_id, CAST(SUM(a.vq * b.vq) AS BIGINT) AS dot
  FROM el a
  JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id = {PROBE}
  GROUP BY 1
),
dense AS (
  SELECT cand_id AS doc_id,
    ROW_NUMBER() OVER (ORDER BY cos DESC, cand_id) AS dense_rank
  FROM (
    SELECT d.cand_id,
      CAST(d.dot AS DOUBLE)
        / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
    FROM dots d
    JOIN norms na ON na.vec_id = {PROBE}
    JOIN norms nb ON d.cand_id = nb.vec_id
  )
  QUALIFY dense_rank <= {TOP}
)
SELECT doc_id, lex_rank, dense_rank, rrf,
  ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
FROM (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
    COALESCE(l.lex_rank, 0) AS lex_rank,
    COALESCE(d.dense_rank, 0) AS dense_rank,
    (CASE WHEN l.lex_rank IS NULL THEN 0.0
          ELSE 1.0 / ({K} + CAST(l.lex_rank AS DOUBLE)) END
     + CASE WHEN d.dense_rank IS NULL THEN 0.0
            ELSE 1.0 / ({K} + CAST(d.dense_rank AS DOUBLE)) END) AS rrf
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
ORDER BY fused_rank
"""


def _rrf_oracle() -> str:
    from .text import _FT_TERMS, TOKENS_SQL

    return _Q_RRF_ORACLE.format(
        TOKENS_SQL=TOKENS_SQL, TERMS=repr(_FT_TERMS), TOP=_RRF_TOP,
        PROBE=_RRF_PROBE, K=_RRF_K,
    )


@query(
    "q41_hybrid_rrf",
    oracle=_rrf_oracle(),
    tags=("L25", "L3", "R13", "similarity", "text"),
)
def q41_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L25 end to end: hybrid retrieval — BM25 top-20 for the 3-term
    lexical query fused with exact-cosine top-20 for probe vector 0
    (embeddings.vec_id = doc_id by the corpus construction) by
    reciprocal-rank fusion with K=60.

    Plan shape: the lexical leg is q48's scoring pipeline
    (one (doc, term) shuffle + broadcast stats) cut to top-20 via
    TakeOrderedAndProject; the dense leg is one Arrow-batched numpy
    matmul pass emitting per-batch top-20s (the q29 kernel with a
    single probe row); the fusion is a 40-row full-outer join + two
    scalar IEEE divisions per row — O(k) whatever the corpus size.
    Both legs' ranks are exact integers, so the fused scores are
    bit-identical to DuckDB recomputing the same two rankings."""
    import numpy as np
    import pandas as pd

    from .text import _FT_TERMS, bm25_doc_scores

    lex = (
        bm25_doc_scores(spark, sf_dir, _FT_TERMS)
        .orderBy(F.col("sq").desc(), "doc_id")
        .limit(_RRF_TOP)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.col("sq").desc(), "doc_id")),
        )
        .select("doc_id", "lex_rank")
    )

    e = table(spark, sf_dir, "embeddings")
    probe_rows = e.filter(F.col("vec_id") == _RRF_PROBE).select(
        "vec_id", "embedding"
    ).collect()
    assert_bounded_model(probe_rows, 1, "RRF dense-leg probe fetch")
    p = np.floor(
        np.array(probe_rows[0].embedding, dtype=np.float64) * _Q
    ).astype(np.int64)
    p_norm = float(np.sqrt((p * p).sum()))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            C = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _Q
            ).astype(np.int64)
            c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            cos = (C @ p).astype(np.float64) / (c_norm * p_norm)
            mask = ids != _RRF_PROBE
            cj, ij = cos[mask], ids[mask]
            order = np.lexsort((ij, -cj))[:_RRF_TOP]
            yield pd.DataFrame({"cand_id": ij[order], "cos": cj[order]})

    dense = (
        e.select("vec_id", "embedding")
        .mapInPandas(score, "cand_id long, cos double")
        .orderBy(F.col("cos").desc(), "cand_id")
        .limit(_RRF_TOP)
        .withColumn(
            "dense_rank",
            F.row_number().over(
                Window.orderBy(F.col("cos").desc(), "cand_id")
            ),
        )
        .select(F.col("cand_id").alias("doc_id"), "dense_rank")
    )
    return rrf_fuse(lex, dense, _RRF_K)
