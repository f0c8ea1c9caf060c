"""UDx surface (SURVEY.md §2.3 rows U1-U5): scalar Python UDF,
Arrow-vectorized pandas UDF, grouped-map applyInPandas, grouped-agg
pandas UDF, and Python UDTF.

All UDx bodies stick to exact-integer arithmetic followed by a fixed
sequence of IEEE double ops, so each has a bit-exact SQL oracle twin —
the differential gate covers the Arrow boundary itself.

UDF objects are constructed lazily inside each query builder: decorating
at module scope with a DDL return-type string would force a SparkSession
to exist at import time (the driver imports ``__spark_entry__`` before
creating one).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# U2 vectorized scalar pandas UDF: quality score from exact-int hash.
# ---------------------------------------------------------------------------


def _quality_score(n_chars: pd.Series, doc_id: pd.Series) -> pd.Series:
    """Deterministic quality proxy: exact int64 mixing, one double
    division at the end."""
    mixed = (n_chars * 31 + doc_id * 7 + 13) % 997
    return mixed.astype("float64") / 997.0


_Q26_ORACLE = """
SELECT
  doc_id,
  CAST((n_chars * 31 + doc_id * 7 + 13) % 997 AS DOUBLE) / 997.0 AS score
FROM documents
ORDER BY doc_id
"""


@query("r83_pandas_scalar_udf", oracle=_Q26_ORACLE, tags=("U2", "udx"))
def r83_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF (the engine's preferred UDF form;
    row-at-a-time U1 exists only for API parity)."""
    quality_score = pandas_udf(_quality_score, "double")
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", quality_score("n_chars", "doc_id").alias("score")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# U3 grouped-map applyInPandas: per-language z-score of n_chars.
# ---------------------------------------------------------------------------

_ZSCORE_SCHEMA = "doc_id long, lang string, z double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact int sums, then the oracle's double-op sequence mirrored
    # OP FOR OP: float(s)/c and float(s*s)/c round the integer to a
    # double FIRST like the SQL's CAST(... AS DOUBLE)/c — Python's
    # bare s/c single-rounds the exact rational, which differs by an
    # ulp once s*s exceeds 2^53 (any real corpus).
    x = pdf["n_chars"].astype("int64")
    c = len(x)
    if c < 2:
        # var's (c-1) divisor is 0: the oracle emits NULL (0/0) —
        # mirror that instead of raising ZeroDivisionError.
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z": [None] * c}
        )
    s = int(x.sum())
    sq = int((x * x).sum())
    mean = float(s) / c
    var = (sq - float(s * s) / c) / (c - 1)
    sd = var**0.5
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z": (x - mean) / sd}
    )


_Q27_ORACLE = """
WITH stats AS (
  SELECT doc_id, lang, n_chars,
    COUNT(*) OVER w AS c,
    SUM(n_chars) OVER w AS s,
    SUM(n_chars * n_chars) OVER w AS sq
  FROM documents
  WINDOW w AS (PARTITION BY lang)
)
SELECT doc_id, lang,
  (n_chars - CAST(s AS DOUBLE) / c)
    / sqrt((sq - CAST(s * s AS DOUBLE) / c) / (c - 1)) AS z
FROM stats
ORDER BY doc_id
"""


@query("r84_grouped_map_udf", oracle=_Q27_ORACLE, tags=("U3", "udx"))
def r84_grouped_map_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score normalize document lengths
    within each language group (one shuffle on the group key; each
    group becomes one Arrow batch)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# U4 grouped-agg pandas UDF: weighted average order price.
# ---------------------------------------------------------------------------


def _weighted_avg_price(totalprice: pd.Series, orderkey: pd.Series) -> float:
    import numpy as np

    # floor(x*100 + 0.5), NOT Series.round(): pandas rounds half to
    # even while the oracle's DuckDB round() is half away from zero —
    # the same pitfall functions.cents() documents (exact only while
    # inputs are 2-decimal money; a .xx5 value would diverge).
    cents = np.floor(totalprice * 100 + 0.5).astype("int64")
    w = (orderkey % 10 + 1).astype("int64")
    return float(int((cents * w).sum()) / int(w.sum()) / 100.0)


_Q28_ORACLE = """
SELECT
  o_orderpriority,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) * (o_orderkey % 10 + 1)) AS DOUBLE)
    / SUM(o_orderkey % 10 + 1) / 100.0 AS wavg_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q49_grouped_agg_udf", oracle=_Q28_ORACLE, tags=("U4", "udx"))
def q49_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas GROUPED_AGG UDAF: weight-by-key average in exact cents."""
    weighted_avg_price = pandas_udf(_weighted_avg_price, "double")
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(weighted_avg_price("o_totalprice", "o_orderkey").alias("wavg_price"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# U1 row-at-a-time Python UDF (API parity only — discouraged hot-path).
# ---------------------------------------------------------------------------


def _reverse_chars(s: str) -> str:
    return s[::-1] if s is not None else None


_Q29_ORACLE = """
SELECT p_partkey, reverse(p_name) AS name_rev
FROM part
ORDER BY p_partkey
"""


@query("r141_scalar_udf", oracle=_Q29_ORACLE, tags=("U1", "udx"))
def r141_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar UDF (U1). Kept off hot paths by design —
    see r83 for the Arrow-vectorized form."""
    reverse_chars = udf(_reverse_chars, "string")
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", reverse_chars("p_name").alias("name_rev")).orderBy(
        "p_partkey"
    )


# ---------------------------------------------------------------------------
# U5 Python UDTF: one output row per word with its position.
# ---------------------------------------------------------------------------


class SplitWords:
    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            yield i, w


_Q30_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20
)
SELECT doc_id, unnest(range(0, len(toks))) AS idx, unnest(toks) AS word
FROM t
ORDER BY doc_id, idx
"""


@query("r142_udtf", oracle=_Q30_ORACLE, tags=("U5", "udx"))
def r142_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding text into positional word rows via a
    LATERAL join."""
    split_words = udtf(SplitWords, returnType="idx int, word string")
    spark.udtf.register("split_words", split_words)
    # NOT "documents": the maintained fact-view names are reserved for
    # the engine's serving layer (engine.py's ownership ledger) — a
    # package-internal demo squatting one would read as a user takeover
    # to the plan-identity test and permanently cede the engine's view
    # (round-9 review finding)
    table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.word
        FROM udtf_docs d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 20
        ORDER BY d.doc_id, s.idx
        """
    )
