"""Corpus-quality operators for training-data pipelines (SURVEY.md §2.3
L5/L11 extensions): Gopher-style repetition filters, a composite
quality gate, and PII scrubbing.

These are the filters a 100 TB text-corpus pipeline runs between
ingest and dedup (Rae et al. 2021 "Scaling Language Models" §A1.1
repetition rules; the C4/RefinedWeb cleaning recipes). The reference
declares only coarse text analytics (reference README.md:58-63); these
extend the same surface with the filters any corpus consumer needs.

Registered inside the driver's 50-query correctness window (r41/q15/
q42/r58 plus packing r144 and decontamination r130) since the round-3
window swap — see docs/QUERY_ROTATION.md for the mapping.

Scale shapes:
- repetition stats shuffle once on (doc_id, gram) with map-side
  partial aggregation — the only way to count per-doc gram modes
  without holding a doc's gram multiset in one buffer;
- the quality gate is 100% map-only (array expressions over the token
  array; no shuffle at any corpus size);
- PII scrub is map-only regexp work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query
from .mixing import (
    _MIX_BASE_BUDGET,
    _MIX_HASH_SQL,
    _MIX_SALT,
    _N_WEIGHTS,
    _ORDER_HASH_SQL,
    _ORDER_SALT,
)
from .sampling import hash60, hash60_sql
from .text import (
    _ALNUM_SPACE,
    FINGERPRINT_SQL,
    STOPWORDS,
    TOKENS_SQL,
    fingerprint,
    tokens,
)

# ---------------------------------------------------------------------------
# r01: repetition statistics (Gopher §A1.1-style).
# ---------------------------------------------------------------------------

_Q_R01_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
  WHERE len({TOKENS_SQL}) >= 2
),
uni AS (SELECT doc_id, unnest(toks) AS g FROM t),
uni_counts AS (
  SELECT doc_id, g, COUNT(*) AS n FROM uni GROUP BY doc_id, g
),
uni_stats AS (
  SELECT doc_id,
         CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_token_frac,
         CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n) AS dup_token_frac
  FROM uni_counts GROUP BY doc_id
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM t
),
bi_counts AS (
  SELECT doc_id, g, COUNT(*) AS n FROM bi GROUP BY doc_id, g
),
bi_stats AS (
  SELECT doc_id,
         CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_bigram_frac,
         CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n) AS dup_bigram_frac
  FROM bi_counts GROUP BY doc_id
)
SELECT u.doc_id, u.top_token_frac, u.dup_token_frac,
       b.top_bigram_frac, b.dup_bigram_frac
FROM uni_stats u JOIN bi_stats b USING (doc_id)
ORDER BY doc_id
"""


def _gram_stats(grams: DataFrame, top_name: str, dup_name: str) -> DataFrame:
    """(doc_id, g) exploded grams → per-doc top-gram and dup-gram
    fractions. One shuffle on (doc_id, g) with map-side combine, then a
    doc-local rollup that reuses the same hash partitioning (doc_id is
    a prefix of the first stage's key, so Catalyst plans the second
    aggregate without a new exchange width problem; both fractions are
    exact int/int divisions in IEEE double."""
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("doc_id").agg(
        (F.max("n").cast("double") / F.sum("n")).alias(top_name),
        ((F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n")).alias(dup_name),
    )


@query("r41_repetition_stats", oracle=_Q_R01_ORACLE, tags=("L5", "quality"))
def r41_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile: most-frequent-token fraction,
    duplicate-token fraction, and the same two over word bigrams.

    The Gopher repetition rules (top 2-gram fraction > 0.2 → drop,
    etc.) read directly off this output. Mode-of-multiset per doc
    cannot be computed map-only without a per-doc hash of every gram,
    so this is the one quality operator that shuffles — once per gram
    width, counted partial-aggregate style.
    """
    d = table(spark, sf_dir, "documents")
    # Materialize the tokenized table once: the unigram and bigram
    # arms would otherwise each re-run the scan+tokenize.
    t = (
        d.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 2)
        .localCheckpoint()
    )
    uni = t.select("doc_id", F.explode("toks").alias("g"))
    bi = t.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("g"),
    )
    uni_stats = _gram_stats(uni, "top_token_frac", "dup_token_frac")
    bi_stats = _gram_stats(bi, "top_bigram_frac", "dup_bigram_frac")
    return (
        uni_stats.join(bi_stats, "doc_id")
        .select(
            "doc_id",
            "top_token_frac",
            "dup_token_frac",
            "top_bigram_frac",
            "dup_bigram_frac",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r02: composite quality gate (map-only).
# ---------------------------------------------------------------------------

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

_Q_R02_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {TOKENS_SQL} AS toks FROM documents
),
s AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
      / len(toks) AS mean_token_len,
    len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stopwords,
    CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
      / len(toks) AS dup_token_frac,
    CAST(len(translate(text, 'abcdefghijklmnopqrstuvwxyz0123456789 ', ''))
         AS DOUBLE) / len(text) AS symbol_frac
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
  (n_tokens BETWEEN 20 AND 1000) AS len_ok,
  (mean_token_len BETWEEN 2 AND 10) AS token_len_ok,
  (n_stopwords >= 2) AS stopwords_ok,
  (dup_token_frac <= 0.8) AS repetition_ok,
  (symbol_frac <= 0.1) AS symbols_ok,
  ((n_tokens BETWEEN 20 AND 1000) AND (mean_token_len BETWEEN 2 AND 10)
   AND (n_stopwords >= 2) AND (dup_token_frac <= 0.8)
   AND (symbol_frac <= 0.1)) AS keep
FROM s
ORDER BY doc_id
"""


def _gate_flags() -> list[tuple[str, "F.Column"]]:
    """The five gate predicates as named Columns over (text, toks).
    Single definition shared by the flag projection (quality_flags)
    and the map-only keep filter (gate_filter)."""
    n_toks = F.size("toks")
    mean_len = (
        F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x)).cast("double")
        / n_toks
    )
    n_stop = F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS)))
    dup_frac = (n_toks - F.size(F.array_distinct("toks"))).cast("double") / n_toks
    sym_frac = (
        F.length(F.translate("text", _ALNUM_SPACE, "")).cast("double")
        / F.length("text")
    )
    return [
        ("len_ok", n_toks.between(20, 1000)),
        ("token_len_ok", mean_len.between(2.0, 10.0)),
        ("stopwords_ok", n_stop >= 2),
        ("repetition_ok", dup_frac <= 0.8),
        ("symbols_ok", sym_frac <= 0.1),
    ]


def _gate_keep() -> "F.Column":
    """The combined keep predicate — the one fold over _gate_flags,
    shared by quality_flags and gate_filter so the flag output and the
    capstone's filter can never drift."""
    from functools import reduce

    return reduce(lambda a, b: a & b, (c for _, c in _gate_flags()))


def quality_flags(d: DataFrame) -> DataFrame:
    """The gate itself: any (doc_id, text)-shaped frame → per-doc flag
    columns. Pure map expressions, so the SAME transformation runs on
    a static frame and verbatim on a ``readStream`` frame (proven in
    tests/test_streaming.py::test_quality_gate_streams_unchanged)."""
    t = d.select("doc_id", "text", tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    flags = _gate_flags()
    return t.select(
        "doc_id",
        *[c.alias(n) for n, c in flags],
        _gate_keep().alias("keep"),
    )


def gate_filter(d: DataFrame) -> DataFrame:
    """Map-only keep filter: the input frame (must carry doc_id, text)
    plus a ``toks`` column, restricted to gate survivors — NO join
    back to the source, so composing pipelines keep the gate on the
    scan's map side at any corpus size."""
    t = d.withColumn("toks", tokens("text")).filter(F.size("toks") > 0)
    return t.filter(_gate_keep())


@query("r153_quality_gate", oracle=_Q_R02_ORACLE, tags=("L5", "L11", "quality"))
def r153_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style keep/drop gate, entirely map-only.

    Every predicate reads off the token array with higher-order
    functions — token count band, mean token length band, minimum
    stopword evidence (a natural-language check), duplicate-token
    ceiling, symbol-character ceiling — so the operator adds ZERO
    shuffles at any corpus size and composes with the capstone
    pipeline's quality gate. ORDER BY runs on the raw scan before the
    projection (the range sampler then re-executes only the scan, and
    the exchange width is pinned to defaultParallelism because it sets
    the compute parallelism of the whole stats stage — see q19's shape
    note).
    """
    d = table(spark, sf_dir, "documents")
    d = d.repartitionByRange(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).sortWithinPartitions("doc_id")
    return quality_flags(d)


# ---------------------------------------------------------------------------
# r03: PII scrub (map-only regexp redaction + counts).
# ---------------------------------------------------------------------------

# The fixture corpus contains no PII by construction, so the query
# first builds a deterministic PII-bearing contact line from customer
# fixture fields (name + synthetic email + synthetic phone), then
# scrubs it — the operator under test is the scrubber, and every match
# count is non-trivial and fixture-derived. Patterns are shared
# Java/RE2 syntax (no lookaround), so Spark and DuckDB compile them
# identically.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

_Q_R03_ORACLE = f"""
WITH c AS (
  SELECT c_custkey,
    lower(c_name) || ' reach me at user' || CAST(c_custkey AS VARCHAR)
      || '@example.com or ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
      || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      || ' (segment ' || c_mktsegment || ')' AS contact
  FROM customer
)
SELECT c_custkey,
  len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(contact, '{_PHONE_RE}')) AS n_phones,
  regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{_PHONE_RE}', '[PHONE]', 'g') AS scrubbed
FROM c
ORDER BY c_custkey
"""


@query("q42_pii_scrub", oracle=_Q_R03_ORACLE, tags=("L11", "quality", "cleaning"))
def q42_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with per-row match counts (map-only).

    The redaction regexes run in one projection; at corpus scale this
    is a pure map stage pipelined into whatever sink follows. The
    count columns make the scrub auditable (corpus-level PII rates
    fall out of a trivial aggregate over them).
    """
    c = table(spark, sf_dir, "customer").orderBy("c_custkey")
    contact = F.concat(
        F.lower("c_name"),
        F.lit(" reach me at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or "),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" (segment "),
        F.col("c_mktsegment"),
        F.lit(")"),
    )
    t = c.select("c_custkey", contact.alias("contact"))
    return t.select(
        "c_custkey",
        F.size(F.regexp_extract_all("contact", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("contact", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("contact", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# r04: unigram perplexity proxy (the L5 "perplexity-proxy n-gram score"
# declared in SURVEY.md §2.3).
# ---------------------------------------------------------------------------

# Determinism (SURVEY.md §2.4 rule 2): ln() is libm-dependent, so each
# per-token log-probability is rounded to 6 decimals FIRST and carried
# as an exact int64 micro-log (lp6 = round(ln p, 6) * 1e6). Per-doc
# totals are then integer sums — identical in any summation order on
# any engine — and only the final exp() passes through round-6 again.
_Q_R04_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
),
vocab AS (
  SELECT token,
    CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
                  / (SELECT COUNT(*) FROM toks)), 6) * 1000000 AS BIGINT) AS lp6
  FROM toks GROUP BY token
),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(v.lp6) AS sum_lp6
  FROM toks t JOIN vocab v USING (token)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
  round(CAST(sum_lp6 AS DOUBLE) / 1000000 / n_tokens, 6) AS mean_logprob,
  round(exp(-(CAST(sum_lp6 AS DOUBLE) / 1000000 / n_tokens)), 6) AS ppl_proxy
FROM per_doc
ORDER BY doc_id
"""


@query("r58_unigram_perplexity", oracle=_Q_R04_ORACLE, tags=("L5", "quality"))
def r58_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram perplexity proxy per document (L5's declared
    "perplexity-proxy n-gram score", SURVEY.md §2.3).

    Train = score corpus (the standard quality-filter setup scores
    against a reference LM; a unigram self-model keeps the operator
    closed over the fixtures). Plan shape: one explode → token-count
    aggregate (the "model"), re-joined to the token stream on the
    token key — at 100 TB the model table is vocabulary-sized and the
    join shuffles on token with AQE free to broadcast small vocabs —
    then one per-doc aggregate. Per-token log-probs are rounded to
    int64 micro-logs before summing, so per-doc totals are exact and
    order-free (§2.4 rule 2); only ln/exp pass through the round-6
    libm guard.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    # Vocabulary-bounded count table, materialized once: the total-
    # token scalar and the scoring join both read it (previously the
    # scalar was a third full corpus pass).
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("n").alias("t"))
    lnp = F.log(F.col("n").cast("double") / F.col("t"))
    vocab = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "token",
            # Exact-integer form of the oracle's
            # CAST(round(ln p, 6)*1e6 AS BIGINT): DuckDB's FP round is
            # s·floor(|x|·1e6+0.5)/1e6 and its double→BIGINT cast
            # rounds to nearest, so the composition recovers exactly
            # this integer. The earlier F.round(...)·1e6.cast('long')
            # TRUNCATED the ±ulp product toward zero — off by one for
            # ~1.5% of arbitrary probabilities (latent on the current
            # fixture vocabulary, a correctness-gate time bomb).
            (F.signum(lnp) * F.floor(F.abs(lnp) * 1_000_000 + F.lit(0.5)))
            .cast("long")
            .alias("lp6"),
        )
    )
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lp6").alias("sum_lp6"))
    )
    mean_lp = F.col("sum_lp6").cast("double") / 1_000_000 / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(mean_lp, 6).alias("mean_logprob"),
        F.round(F.exp(-mean_lp), 6).alias("ppl_proxy"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r06: training-sequence packing (GPT-style concat-and-chunk).
# ---------------------------------------------------------------------------

_SEQ_BUDGET = 512  # tokens per packed training sequence

_Q_R06_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len({TOKENS_SQL}) AS n_tokens FROM documents
  WHERE len({TOKENS_SQL}) > 0
),
c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS start_offset_raw
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(COALESCE(start_offset_raw, 0) AS BIGINT) AS start_offset,
  CAST(COALESCE(start_offset_raw, 0) // {_SEQ_BUDGET} AS BIGINT) AS seq_first,
  CAST((COALESCE(start_offset_raw, 0) + n_tokens - 1) // {_SEQ_BUDGET} AS BIGINT)
    AS seq_last
FROM c
ORDER BY doc_id
"""


def tape_offsets(spark: SparkSession, df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Global running-sum offsets of ``n_tokens`` over a total order,
    computed the DISTRIBUTED way: range-repartition on the order key,
    per-partition running sum via a window on the partition id, then
    add each partition's base offset (the sum of earlier partitions'
    totals, a partition-count-sized broadcast). Identical totals at
    any partition count; one narrow shuffle + one broadcast join at
    100 TB — never a single-partition corpus window. Shared by
    r144_sequence_packing (doc_id order) and the r15 capstone
    (training-hash order); adds ``start_offset`` to df's columns.
    """
    parts = df.repartitionByRange(
        spark.sparkContext.defaultParallelism, *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        parts.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("ptotal"))
        .withColumn("base", F.coalesce(F.sum("ptotal").over(w_base), F.lit(0)))
        .select("_pid", "base")
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn("start_offset", F.col("local_off") + F.col("base"))
        .drop("_pid", "local_off", "base")
    )


@query("r144_sequence_packing", oracle=_Q_R06_ORACLE, tags=("L9", "quality"))
def r144_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out in doc_id
    order on a global token tape and cut into fixed-budget training
    sequences; each document reports its tape offset and first/last
    sequence index.

    The global prefix sum is computed the DISTRIBUTED way — not a
    single-partition global window (which funnels the corpus into one
    task): range-repartition on doc_id, within-partition running sum
    via a window keyed on the partition id, then add each partition's
    base offset (the sum of all earlier partitions' totals, a
    partition-count-sized table joined back by pid). Identical totals
    at any partition count; one narrow shuffle + one broadcast join at
    100 TB.
    """
    d = table(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.size("toks").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    start = F.col("start_offset")
    return (
        tape_offsets(spark, t, ["doc_id"])
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.floor(start / _SEQ_BUDGET).alias("seq_first"),
            F.floor((start + F.col("n_tokens") - 1) / _SEQ_BUDGET).alias("seq_last"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r07: decontamination — n-gram overlap of corpus docs vs a held-out set.
# ---------------------------------------------------------------------------

_DECON_HELD_OUT_MAX = 50  # doc_id < 50 plays the benchmark/test split
_DECON_NGRAM = 5

_Q_R07_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
  WHERE len({TOKENS_SQL}) >= {_DECON_NGRAM}
),
grams AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(toks) - {_DECON_NGRAM} + 2),
      i -> array_to_string(toks[i : i + {_DECON_NGRAM} - 1], ' '))) AS g
  FROM t
),
held AS (
  SELECT DISTINCT g FROM grams WHERE doc_id < {_DECON_HELD_OUT_MAX}
),
corpus AS (
  SELECT doc_id, g FROM grams WHERE doc_id >= {_DECON_HELD_OUT_MAX}
),
per_doc AS (
  SELECT doc_id, COUNT(DISTINCT g) AS n_grams FROM corpus GROUP BY doc_id
),
hits AS (
  SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_contaminated
  FROM (SELECT DISTINCT doc_id, g FROM corpus) c
  JOIN held h ON c.g = h.g
  GROUP BY c.doc_id
)
SELECT p.doc_id, p.n_grams,
  COALESCE(h.n_contaminated, 0) AS n_contaminated,
  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / p.n_grams
    AS contamination_frac
FROM per_doc p LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


@query("r130_decontamination", oracle=_Q_R07_ORACLE, tags=("L2", "L5", "quality"))
def r130_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing 5-gram
    spans with a held-out set (doc_id < 50 plays the eval split).

    Plan shape at scale: the held-out side's distinct grams are tiny
    relative to the corpus (an eval suite, not a second corpus), so
    the overlap test is a broadcast semi-join of corpus grams against
    them — the corpus is never shuffled on the gram key; per-doc
    distinct counting shuffles on (doc_id, gram) once.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= _DECON_NGRAM
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - _DECON_NGRAM + 1),
                lambda i: F.array_join(
                    F.slice("toks", i, _DECON_NGRAM), " "
                ),
            )
        ).alias("g"),
    )
    held = (
        grams.filter(F.col("doc_id") < _DECON_HELD_OUT_MAX).select("g").distinct()
    )
    # Materialize the distinct corpus-gram table ONCE: two consumers
    # (per-doc totals, contamination hits) would otherwise each re-run
    # the corpus tokenize+explode+distinct. held's own pass stays
    # cheap — its doc_id < 50 filter pushes to the parquet scan.
    corpus = (
        grams.filter(F.col("doc_id") >= _DECON_HELD_OUT_MAX)
        .distinct()
        .localCheckpoint()
    )
    per_doc = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus.join(F.broadcast(held), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams")
            ).alias("contamination_frac"),
        )
        .orderBy("doc_id")
    )



# ---------------------------------------------------------------------------
# r15: the full training-mix capstone — gate → dedup → weighted mix →
# training order → sequence packing, composed end-to-end.
# ---------------------------------------------------------------------------

_Q_R15_ORACLE = f"""
WITH t0 AS (
  SELECT doc_id, source, text, {TOKENS_SQL} AS toks FROM documents
),
gated AS (
  SELECT doc_id, source, text, toks, len(toks) AS n_tokens FROM t0
  WHERE len(toks) BETWEEN 20 AND 1000
    AND CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        / len(toks) BETWEEN 2 AND 10
    AND len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) >= 2
    AND CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) <= 0.8
    AND CAST(len(translate(text, '{_ALNUM_SPACE}', '')) AS DOUBLE)
        / len(text) <= 0.1
),
fp AS (
  SELECT *, {FINGERPRINT_SQL} AS f
  FROM gated
),
surv AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY f) AS canon FROM fp
  ) WHERE doc_id = canon
),
mix AS (
  SELECT * FROM (
    SELECT doc_id, source, n_tokens,
      CAST(substr(source, 4) AS INTEGER) % {_N_WEIGHTS} + 1 AS weight,
      COALESCE(SUM(n_tokens) OVER (
        PARTITION BY source
        ORDER BY {_MIX_HASH_SQL}, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM surv
  ) WHERE cum_before < weight * {_MIX_BASE_BUDGET}
),
ordered AS (
  SELECT doc_id, source, n_tokens, {_ORDER_HASH_SQL} AS h FROM mix
),
packed AS (
  SELECT doc_id, source, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM ordered
)
SELECT doc_id, source, n_tokens,
  CAST(start_offset AS BIGINT) AS start_offset,
  CAST(start_offset // {_SEQ_BUDGET} AS BIGINT) AS seq_first,
  CAST((start_offset + n_tokens - 1) // {_SEQ_BUDGET} AS BIGINT) AS seq_last
FROM packed
ORDER BY doc_id
"""


@query("r156_training_mix_pipeline", oracle=_Q_R15_ORACLE, tags=("L9", "quality", "capstone"))
def r156_training_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete modern pretraining-data build, composed from the
    round's operators and oracle-checked as ONE query: quality gate
    (the q15 predicates) → exact dedup survivors (q18's min-doc_id
    rule) → weighted domain mix (r37's budgeted hash-order take) →
    epoch-stable training order (r40's hash) → sequence packing
    (r144's tape offsets, laid out in TRAINING order rather than
    doc_id order).

    Plan shape at scale: the gate is map-only (``gate_filter`` — an
    inline predicate on the scan, no join back to the source); dedup
    is one shuffle on the fingerprint; the mix is one window over the
    domain key; the packing prefix-sum is the shared ``tape_offsets``
    two-level distributed form (range partition on the order hash,
    per-partition running sum, broadcast base offsets) — never a
    single-partition corpus window.
    """
    d = table(spark, sf_dir, "documents")
    gated = gate_filter(d.select("doc_id", "source", "text"))
    fp = gated.select(
        "doc_id", "source", F.size("toks").alias("n_tokens"),
        fingerprint("text").alias("f"),
    )
    w_fp = Window.partitionBy("f")
    surv = (
        fp.withColumn("canon", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("canon"))
        .drop("f", "canon")
    )
    mix_h = hash60(F.col("doc_id").cast("string"), _MIX_SALT)
    weight = F.expr("substring(source, 4)").cast("int") % _N_WEIGHTS + 1
    w_mix = Window.partitionBy("source").orderBy(mix_h, "doc_id")
    mix = (
        surv.withColumn("weight", weight)
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tokens").over(
                    w_mix.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .filter(F.col("cum_before") < F.col("weight") * _MIX_BASE_BUDGET)
        .select("doc_id", "source", "n_tokens")
    )
    ordered = mix.withColumn(
        "h", hash60(F.col("doc_id").cast("string"), _ORDER_SALT)
    )
    start = F.col("start_offset")
    return (
        tape_offsets(spark, ordered, ["h", "doc_id"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "start_offset",
            F.floor(start / _SEQ_BUDGET).alias("seq_first"),
            F.floor((start + F.col("n_tokens") - 1) / _SEQ_BUDGET).alias("seq_last"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L23 (engine extension): corpus drift monitor — KL divergence between
# two corpus snapshots' unigram distributions, with the top driving
# tokens. The continuous-ingest health check: a crawler config change
# or a poisoned source shifts the token distribution before any
# human reads a document.
# ---------------------------------------------------------------------------

_DRIFT_SALT = "drift-v1:"
_DRIFT_MIN_N = 5     # ignore tokens rarer than this across both halves
_DRIFT_TOPK = 50

_DRIFT_HASH_SQL = hash60_sql("CAST(doc_id AS VARCHAR)", _DRIFT_SALT)

_Q_DRIFT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
    CAST({_DRIFT_HASH_SQL} % 2 AS INTEGER) AS half,
    unnest({TOKENS_SQL}) AS token
  FROM documents
),
c AS (
  SELECT token,
    SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
    SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM tok GROUP BY token
  HAVING COUNT(*) >= {_DRIFT_MIN_N}
),
tot AS (
  SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur, COUNT(*) AS v FROM c
),
contrib AS (
  SELECT token, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
    CAST(round(
      ((n_cur + 1.0) / (t_cur + v))
      * ln(((n_cur + 1.0) / (t_cur + v)) / ((n_ref + 1.0) / (t_ref + v))),
      9) AS DECIMAL(20,9)) AS contrib_dec
  FROM c, tot
),
kl AS (SELECT SUM(contrib_dec) AS kl_dec FROM contrib)
SELECT * FROM (
  SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY abs(contrib_dec) DESC, token) AS BIGINT)
      AS rank,
    token, n_ref, n_cur,
    CAST(contrib_dec AS DOUBLE) AS contrib,
    CAST((SELECT kl_dec FROM kl) AS DOUBLE) AS kl_total
  FROM contrib
)
WHERE rank <= {_DRIFT_TOPK}
ORDER BY rank
"""


@query("r59_drift_monitor", oracle=_Q_DRIFT_ORACLE, tags=("L23", "quality"))
def r59_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two corpus snapshots (here:
    deterministic hash halves standing in for consecutive crawls):
    smoothed KL(current || reference) plus the top-{k} tokens driving
    it. Per-token contributions are round-9 quantized and DECIMAL-
    summed, so the divergence is bit-equal cross-engine.

    Plan shape at scale: one tokenize pass, ONE (token)-keyed count
    aggregate with map-side combine (the half splits via conditional
    sums, not a second pass), scalar totals broadcast back, TakeOrdered
    top-k. Vocabulary-bounded intermediate, corpus-linear work.
    """
    d = table(spark, sf_dir, "documents")
    half = (hash60(F.col("doc_id").cast("string"), _DRIFT_SALT) % 2).cast("int")
    tok = d.select(half.alias("half"), F.explode(tokens("text")).alias("token"))
    # Materialize the vocabulary-bounded count table ONCE: three
    # consumers (the totals scalar, the KL sum, the top-k) would
    # otherwise each re-run the corpus tokenize+aggregate (the
    # r120_bigram_lm precedent).
    c = (
        tok.groupBy("token")
        .agg(
            F.sum((F.col("half") == 0).cast("long")).alias("n_ref"),
            F.sum((F.col("half") == 1).cast("long")).alias("n_cur"),
        )
        .filter((F.col("n_ref") + F.col("n_cur")) >= _DRIFT_MIN_N)
        .localCheckpoint()
    )
    tot = c.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("v"),
    )
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + F.col("v"))
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + F.col("v"))
    contrib = c.crossJoin(F.broadcast(tot)).select(
        "token",
        "n_ref",
        "n_cur",
        F.round(p_cur * F.log(p_cur / p_ref), 9)
        .cast("decimal(20,9)")
        .alias("contrib_dec"),
    )
    kl = contrib.agg(F.sum("contrib_dec").alias("kl_dec"))
    top = contrib.orderBy(F.abs(F.col("contrib_dec")).desc(), "token").limit(
        _DRIFT_TOPK
    )
    w = Window.orderBy(F.abs(F.col("contrib_dec")).desc(), "token")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(kl))
        .select(
            "rank",
            "token",
            "n_ref",
            "n_cur",
            F.col("contrib_dec").cast("double").alias("contrib"),
            F.col("kl_dec").cast("double").alias("kl_total"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# L24 (round 9, r8-VERDICT item 8): deterministic LINEAR quality
# classifier — the CCNet/fastText-style hashed bag-of-words scorer,
# the one standard corpus-pipeline stage L13's rule gates don't
# cover. Pipeline shape is the real thing: tokens → salted md5 bucket
# into a fixed hashed feature space → per-doc feature counts → one
# broadcast weight-table join → DECIMAL-accumulated dot product →
# logistic threshold. The WEIGHTS are a fixed deterministic table (a
# pretrained model's weights arrive as exactly such a table; this
# container has no labeled data to fit one, so a seeded formula stands
# in — the same stand-in policy as the multimodal codecs), which is
# what keeps the whole stage oracle-expressible: DuckDB derives the
# identical table from range({buckets}).
#
# At 100 TB: one tokenize pass (corpus-linear), the feature matrix is
# ≤{buckets} rows per doc, the weight table is {buckets} rows
# (broadcast forever), scoring is map-side after one (doc_id, b)
# partial-agg shuffle — and the trained-model deployment twin is a
# pure map (weights embed as a plan literal, the dsir_scorer pattern).
# ---------------------------------------------------------------------------

_CLF_BUCKETS = 64
_CLF_SALT = "qclf-v1:"          # version the feature space with the model
_CLF_BIAS = 0.0
_CLF_HASH_SQL = hash60_sql("token", _CLF_SALT)
# fixed "pretrained" weight for bucket b, in [-1, 1], quantized to
# decimal(18,6) so the per-doc fold is order-independent cross-engine
_CLF_WEIGHT_SQL = (
    "CAST(round(((b * 37 + 11) % 21 - 10) / 10.0, 6) AS DECIMAL(18,6))"
)


def classifier_weights(spark: SparkSession) -> DataFrame:
    """The L24 weight table: (b, w) for b in [0, buckets) — THE
    definition both the Spark plan and the DuckDB oracle derive
    (kept in lockstep with _CLF_WEIGHT_SQL)."""
    b = F.col("id").cast("int")
    return spark.range(_CLF_BUCKETS).select(
        b.alias("b"),
        F.round(((b * 37 + 11) % 21 - 10) / 10.0, 6)
        .cast("decimal(18,6)")
        .alias("w"),
    )


def classify_quality(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Score documents with the linear classifier: per-doc hashed-BoW
    features ⋈ broadcast weights → mean bucket weight + bias →
    logistic probability, keep at p >= 0.5. Returns (doc_id, n_toks,
    prob, keep), empty-token documents dropped (no features to score —
    the upstream L13 length gate owns those)."""
    tb = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).select(
        "doc_id",
        (hash60(F.col("token"), _CLF_SALT) % _CLF_BUCKETS)
        .cast("int")
        .alias("b"),
    )
    tbc = tb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n"))
    dw = tbc.join(F.broadcast(classifier_weights(spark)), "b").groupBy(
        "doc_id"
    ).agg(
        F.sum(F.col("w") * F.col("n")).alias("z_dec"),
        F.sum("n").alias("n_toks"),
    )
    z = F.lit(_CLF_BIAS) + F.col("z_dec").cast("double") / F.col("n_toks")
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return dw.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        prob.alias("prob"),
        (prob >= 0.5).alias("keep"),
    ).orderBy("doc_id")


_Q_CLF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
),
tb AS (
  SELECT doc_id,
    CAST({_CLF_HASH_SQL} % {_CLF_BUCKETS} AS INTEGER) AS b
  FROM tok
),
tbc AS (SELECT doc_id, b, COUNT(*) AS n FROM tb GROUP BY doc_id, b),
w AS (SELECT CAST(b AS INTEGER) AS b, {_CLF_WEIGHT_SQL} AS w
      FROM range({_CLF_BUCKETS}) t(b)),
dw AS (
  SELECT doc_id, SUM(w * n) AS z_dec, SUM(n) AS n_toks
  FROM tbc JOIN w USING (b) GROUP BY doc_id
),
scored AS (
  SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
    round(1.0 / (1.0 + exp(-({_CLF_BIAS} + CAST(z_dec AS DOUBLE) / n_toks))), 6)
      AS prob
  FROM dw
)
SELECT doc_id, n_toks, prob, prob >= 0.5 AS keep
FROM scored
ORDER BY doc_id
"""


@query("q35_quality_classifier", oracle=_Q_CLF_ORACLE, tags=("L24", "quality"))
def q35_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24 end to end over the documents fixture — hashed-BoW linear
    quality scoring with a logistic threshold, differentially checked
    against DuckDB deriving the same weight table, buckets, and
    decimal fold."""
    return classify_quality(spark, table(spark, sf_dir, "documents"))
