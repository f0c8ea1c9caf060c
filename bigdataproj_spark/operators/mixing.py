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
same two-level prefix-sum used by q47_sequence_packing — since only
the running token total, not a total order, is needed); the training
order is one hash shuffle + per-shard sort, the minimum possible data
movement for a global permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
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


@query("q02_domain_mixing", oracle=_Q_R08_ORACLE, tags=("L9", "mixing"))
def q02_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@query("q05_training_order", oracle=_Q_R09_ORACLE, tags=("L9", "mixing"))
def q05_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
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
