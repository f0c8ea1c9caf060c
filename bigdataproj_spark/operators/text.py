"""Text analysis operators (reference rows R3/R5/R8, engine rows L5-L7,
plus training-pipeline text ops: language-ID, quality scoring, token
counting, document fingerprinting).

The reference declares these as Spark-NLP model stages (reference
README.md:58-63); per SURVEY.md §7 the engine implements deterministic
lexicon/rule versions as the oracle-checked contract. Everything here is
native Spark SQL expressions — no UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# R5 tokenization + R3 hashtag extraction as reusable expressions.
# ---------------------------------------------------------------------------


def tokens(text: Column | str) -> Column:
    """Whitespace tokenizer (R5): lower → trim → split → drop empties.

    Oracle twin: ``list_filter(string_split_regex(lower(trim(t)), '\\s+'),
    t -> t <> '')``.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(F.lower(F.trim(text)), r"\s+"), "")


def hashtags(text: Column | str) -> Column:
    """Hashtag extraction (R3): regex `#\\w+` per reference README.md:63,
    validated against its worked example "Happy #New Year" → ["#New"]
    (README.md:83) in tests/test_text.py.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(r"#\w+"), 0)


TOKENS_SQL = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
)

# ---------------------------------------------------------------------------
# Token counting (explode P4 + A1) — word-frequency top-k.
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS token FROM documents
)
SELECT token, COUNT(*) AS n
FROM toks
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""


@query("q20_token_counts", oracle=_Q20_ORACLE, tags=("R5", "P4", "A1", "O3", "text"))
def q20_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token frequency over the documents corpus.

    Scale: explode happens map-side; the single shuffle is on the token
    key with partial aggregation (map-side combine), so skewed tokens
    ("the") only ship one partial count per task.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# R3 hashtag counts (documents corpus carries no literal hashtags, so the
# oracle-checked form degenerates to empty-on-empty; the semantics are
# pinned by tests/test_text.py on the inline tweets fixture).
# ---------------------------------------------------------------------------

_Q21_ORACLE = r"""
WITH tags AS (
  SELECT lower(unnest(regexp_extract_all(text, '#\w+'))) AS tag FROM documents
)
SELECT tag, COUNT(*) AS n
FROM tags
GROUP BY tag
ORDER BY n DESC, tag
"""


@query("q21_hashtag_counts", oracle=_Q21_ORACLE, tags=("R3", "F-S2", "text"))
def q21_hashtag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashtag frequency (reference's signature op, README.md:81-83)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(hashtags("text")).alias("raw_tag"))
        .select(F.lower("raw_tag").alias("tag"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tag")
    )
