"""Domain mixing and training-order shuffle for pretraining pipelines.

The reference has no mixing surface (one corpus, one index; reference
README.md:102-104) — but striking a pretraining data mix IS the job of
a 100 TB corpus engine, so the engine provides the two order-of-batch
operators every LM data pipeline runs after cleaning/dedup:

- **Domain mixing** (r08): each source domain gets a target weight;
  the operator takes documents per domain in deterministic hash order
  until the domain's token budget (weight x base budget) is filled.
  This is the standard weighted-mix recipe (Pile/LLaMA-style domain
  weights struck in tokens, not documents), made reproducible: the
  take-set is a pure function of (salt, doc_id), never of partitioning
  or arrival order.
- **Training order** (r09): an epoch-stable global shuffle. Documents
  hash to a shard and sort by hash within the shard — the distributed
  way to shuffle a corpus that does not fit one machine: one narrow
  shuffle on the shard key and an in-shard sort, instead of a global
  ORDER BY rand() (a single range sort whose sampling pass alone reads
  the corpus twice, keyed by a non-reproducible RNG). A new epoch is a
  new salt, not a new plan.

Both use the engine-portable 60-bit md5 prefix hash established in
``sampling.py``, so DuckDB replays the exact membership/order and the
oracle check pins per-row assignments, not just aggregate sizes.

At 100 TB: mixing is one window over the domain key (a skewed giant
domain range-partitions on the hash prefix within the domain — the
same two-level prefix-sum used by r144_sequence_packing — since only
the running token total, not a total order, is needed); the training
order is one hash shuffle + per-shard sort, the minimum possible data
movement for a global permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import assert_bounded_model
from ..registry import query
from .sampling import hash60, hash60_sql
from .text import TOKENS_SQL, tokens

# ---------------------------------------------------------------------------
# r08: weighted domain mixing to per-domain token budgets.
# ---------------------------------------------------------------------------

_MIX_BASE_BUDGET = 300  # tokens per unit of domain weight
_N_WEIGHTS = 4          # srcN weight = N % 4 + 1 (deterministic fixture mix)
_MIX_SALT = "mix-v1:"   # own salt: re-versioning the train/val/test split
                        # must not silently re-roll the domain-mix take-set

_MIX_HASH_SQL = hash60_sql("CAST(doc_id AS VARCHAR)", _MIX_SALT)

_Q_R08_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
    CAST(substr(source, 4) AS INTEGER) % {_N_WEIGHTS} + 1 AS weight,
    len({TOKENS_SQL}) AS n_tokens,
    {_MIX_HASH_SQL} AS h
  FROM documents
  WHERE len({TOKENS_SQL}) > 0
),
c AS (
  SELECT doc_id, source, weight, n_tokens,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS take_rank,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, source, weight, n_tokens,
  CAST(take_rank AS BIGINT) AS take_rank,
  CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
FROM c
WHERE cum_before < weight * {_MIX_BASE_BUDGET}
ORDER BY source, take_rank
"""


@query("r37_domain_mixing", oracle=_Q_R08_ORACLE, tags=("L9", "mixing"))
def r37_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strike a weighted pretraining mix: per source domain, take
    documents in deterministic hash order until the domain's token
    budget (weight x {base} tokens) is crossed; the crossing document
    is kept so every budget is met.

    Plan shape: one scan computing (weight, n_tokens, hash) per row,
    one shuffle on the domain key for the running-total window, then a
    row-local filter — no joins, no second pass. The take-set is a
    pure function of (salt, doc_id): stable under repartitioning,
    appends, and cluster size.
    """
    d = table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"), _MIX_SALT)
    t = d.select(
        "doc_id",
        "source",
        (F.expr("substring(source, 4)").cast("int") % _N_WEIGHTS + 1).alias("weight"),
        F.size(tokens("text")).alias("n_tokens"),
        h.alias("h"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        t.select(
            "doc_id",
            "source",
            "weight",
            "n_tokens",
            F.row_number().over(w).cast("long").alias("take_rank"),
            cum_before.alias("cum_before"),
        )
        .filter(F.col("cum_before") < F.col("weight") * _MIX_BASE_BUDGET)
        .select(
            "doc_id",
            "source",
            "weight",
            "n_tokens",
            "take_rank",
            (F.col("cum_before") + F.col("n_tokens")).alias("cum_tokens"),
        )
        .orderBy("source", "take_rank")
    )


# ---------------------------------------------------------------------------
# r09: epoch-stable training order (global shuffle without a global sort).
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_ORDER_SALT = "order-v1:epoch0:"

_ORDER_HASH_SQL = hash60_sql("CAST(doc_id AS VARCHAR)", _ORDER_SALT)

_Q_R09_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_ORDER_HASH_SQL} AS h FROM documents
)
SELECT doc_id,
  CAST(h % {_N_SHARDS} AS INTEGER) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id)
       AS BIGINT) AS pos
FROM t
ORDER BY shard, pos
"""


@query("r40_training_order", oracle=_Q_R09_ORACLE, tags=("L9", "mixing"))
def r40_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document an epoch-stable (shard, pos) training
    position: hash to one of {shards} shards, sort by hash within the
    shard.

    This is the scale-correct global permutation: one hash shuffle +
    per-shard sort. A reader streams shard files in pos order and the
    corpus arrives in a reproducible pseudorandom order; the next
    epoch changes the salt, nothing else. No ORDER BY rand() (RNG tied
    to partitioning), no single-partition ROW_NUMBER over the corpus.
    """
    d = table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"), _ORDER_SALT)
    t = d.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.col("h") % _N_SHARDS).orderBy("h", "doc_id")
    return (
        t.select(
            "doc_id",
            (F.col("h") % _N_SHARDS).cast("int").alias("shard"),
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling: select raw documents whose hashed-ngram
# profile matches a target distribution (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling").
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 128          # hashed-feature buckets
_DSIR_TOPK = 100             # resampled documents to keep
_DSIR_SALT = "dsir-v1:"      # feature-hash salt
_DSIR_GUMBEL_SALT = "dsir-gumbel-v1:"
_DSIR_TWO60 = float(1 << 60)

_DSIR_HASH_SQL = hash60_sql("token", _DSIR_SALT)
_DSIR_GUM_SQL = hash60_sql("CAST(doc_id AS VARCHAR)", _DSIR_GUMBEL_SALT)

_Q_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({TOKENS_SQL}) AS token FROM documents
),
tb AS (
  SELECT doc_id, lang,
    CAST({_DSIR_HASH_SQL} % {_DSIR_BUCKETS} AS INTEGER) AS b
  FROM tok
),
prof AS (
  SELECT b, COUNT(*) AS cnt_r,
    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_t
  FROM tb GROUP BY b
),
tot AS (SELECT SUM(cnt_r) AS tot_r, SUM(cnt_t) AS tot_t FROM prof),
lam AS (
  SELECT b,
    CAST(round(ln(
      ((cnt_t + 1.0) / (tot_t + {_DSIR_BUCKETS}.0))
      / ((cnt_r + 1.0) / (tot_r + {_DSIR_BUCKETS}.0))
    ), 6) AS DECIMAL(18,6)) AS lam
  FROM prof, tot
),
dw AS (
  SELECT t.doc_id, SUM(l.lam) AS lr_dec, COUNT(*) AS n_toks
  FROM tb t JOIN lam l USING (b) GROUP BY t.doc_id
),
scored AS (
  SELECT d.doc_id, d.lang, dw.n_toks, dw.lr_dec,
    dw.lr_dec + CAST(round(
      -ln(-ln(({_DSIR_GUM_SQL} + 0.5) / {_DSIR_TWO60!r})), 6)
      AS DECIMAL(18,6)) AS score_dec
  FROM documents d JOIN dw USING (doc_id)
)
SELECT * FROM (
  SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY score_dec DESC, doc_id) AS BIGINT)
      AS rank,
    doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
    CAST(lr_dec AS DOUBLE) AS log_ratio,
    CAST(score_dec AS DOUBLE) AS score
  FROM scored
)
WHERE rank <= {_DSIR_TOPK}
ORDER BY rank
"""


@query("r53_dsir_resample", oracle=_Q_DSIR_ORACLE, tags=("L9", "mixing"))
def r53_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: score every raw document by how
    much its hashed-unigram profile looks like the target corpus (here
    lang='en'), then draw a Gumbel-top-k sample of the highest-scoring
    documents (Xie et al. 2023; Gumbel trick = Efraimidis-Spirakis
    weighted sampling without replacement, made deterministic by
    seeding the uniform draw with the engine-portable md5 hash).

    Per bucket b: lambda_b = ln(p_target(b) / p_raw(b)), Laplace-
    smoothed; per document: log-ratio = sum of lambda over its tokens
    (round-6 quantized, DECIMAL-accumulated, so the fold is
    order-independent and bit-equal cross-engine); resampling key =
    log-ratio + Gumbel(doc hash). No RNG state anywhere — re-running
    at any parallelism reproduces the same sample.

    Plan shape at scale: the corpus tokenizes ONCE into the per-doc
    hashed-feature matrix (doc_id, bucket, n) — corpus-linear but two
    orders of magnitude smaller than the token stream (<=128 rows per
    doc); the matrix is materialized (the paper materializes it too)
    and both the bucket profile (a bounded {b}-row rollup of it,
    broadcast back as the lambda table) and the per-document scores
    derive from it without re-reading text. The top-k is TakeOrdered
    (per-partition heaps, no global sort).
    """
    tbc = _dsir_feature_matrix(spark, sf_dir)
    lam = _dsir_lambda_table(tbc)
    dw = (
        tbc.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("lam") * F.col("n")).alias("lr_dec"),
            F.sum("n").alias("n_toks"),
        )
    )
    gum = (
        F.round(
            -F.log(
                -F.log(
                    (hash60(F.col("doc_id").cast("string"), _DSIR_GUMBEL_SALT) + 0.5)
                    / F.lit(_DSIR_TWO60)
                )
            ),
            6,
        )
    ).cast("decimal(18,6)")
    scored = dw.select(
        "doc_id",
        "lang",
        "n_toks",
        "lr_dec",
        (F.col("lr_dec") + gum).alias("score_dec"),
    )
    top = scored.orderBy(F.col("score_dec").desc(), "doc_id").limit(_DSIR_TOPK)
    w = Window.orderBy(F.col("score_dec").desc(), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "doc_id",
            "lang",
            F.col("n_toks").cast("long").alias("n_toks"),
            F.col("lr_dec").cast("double").alias("log_ratio"),
            F.col("score_dec").cast("double").alias("score"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# DSIR deployment shape: train the lambda model in batch, score
# anywhere — including a Structured Streaming ingest — as a pure map.
# ---------------------------------------------------------------------------


def _dsir_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashed-feature matrix (doc_id, lang, b, n) — one tokenize
    pass, materialized once (localCheckpoint, not iter_checkpoint: a
    one-shot multi-consumer table; durability buys nothing here).
    (lang rides along — it is constant per doc.)"""
    d = table(spark, sf_dir, "documents")
    tb = d.select(
        "doc_id",
        "lang",
        F.explode(tokens("text")).alias("token"),
    ).select(
        "doc_id",
        "lang",
        (hash60(F.col("token"), _DSIR_SALT) % _DSIR_BUCKETS)
        .cast("int")
        .alias("b"),
    )
    return (
        tb.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )


def _dsir_lambda_table(tbc: DataFrame) -> DataFrame:
    """The model fit: Laplace-smoothed per-bucket target-vs-raw
    log-likelihood ratios, round-6/decimal-quantized. ONE definition —
    shared by the oracle-checked r53 and the batch-train/stream-score
    deployment path, so the two can never drift."""
    prof = tbc.groupBy("b").agg(
        F.sum("n").alias("cnt_r"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0)).alias(
            "cnt_t"
        ),
    )
    tot = prof.agg(F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t"))
    nb = float(_DSIR_BUCKETS)
    return prof.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("cnt_t") + 1.0) / (F.col("tot_t") + nb))
                / ((F.col("cnt_r") + 1.0) / (F.col("tot_r") + nb))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lam"),
    )


def dsir_lambda_rows(spark: SparkSession, sf_dir: str) -> list[tuple[int, object]]:
    """The trained DSIR model: (bucket, lambda) rows, collected. The
    model is hashed-feature-bounded (at most {b} rows regardless of
    corpus size) — collecting it is the legitimate 'model fit' step,
    exactly like the IVF centroid train (similarity.py). Same helper
    pipeline as r53_dsir_resample by construction."""
    lam = _dsir_lambda_table(_dsir_feature_matrix(spark, sf_dir))
    rows = lam.collect()
    assert_bounded_model(rows, _DSIR_BUCKETS, "DSIR lambda-table collect")
    return [(r["b"], r["lam"]) for r in rows]


def dsir_scorer(lam_rows: list[tuple[int, object]]):
    """Build the map-only scoring transform from a trained model.

    The lambda table embeds as a plan-literal map, so scoring is a
    pure per-row expression — no join, no shuffle, no state. That is
    what makes the same transform run verbatim over a batch frame OR
    a Structured Streaming source (tests/test_streaming.py): the
    batch-train / stream-score deployment split of every production
    quality-filter model.
    """
    lam_map = F.create_map(
        *[x for b, v in lam_rows for x in (F.lit(b), F.lit(v))]
    )

    def transform(df: DataFrame) -> DataFrame:
        bucket_of = lambda t: (hash60(t, _DSIR_SALT) % _DSIR_BUCKETS).cast("int")  # noqa: E731
        score = F.aggregate(
            tokens("text"),
            F.lit(0).cast("decimal(28,6)"),
            lambda acc, t: (
                acc + F.coalesce(lam_map[bucket_of(t)], F.lit(0).cast("decimal(18,6)"))
            ).cast("decimal(28,6)"),
        )
        return df.select(
            "doc_id",
            "lang",
            score.cast("double").alias("log_ratio"),
        )

    return transform
