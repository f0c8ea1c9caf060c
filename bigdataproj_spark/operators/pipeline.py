"""The reference's end-to-end tweet pipeline (SURVEY.md §3.1, M3),
rebuilt as composable DataFrame stages:

    ingest (R1/S6) → hashtag/geo extraction (R3/R4) → tokenize (R5)
    → sentiment (R8/L6) → standardize (R9) → to_json (R10)

The reference never implemented any of it (its SparkProcessor is an
empty stub, src/main/scala/App/ApiController/SparkProcessor/Scala.scala:1-5);
the stage semantics follow its README: tweet shape README.md:79, hashtag
example README.md:81-83 ("Happy #New Year" → #New), geo README.md:84-86,
standardized output README.md:95-97.

The inline 20-tweet fixture doubles as the oracle's VALUES clause, so
the whole pipeline is differential-tested end-to-end, including the
in-memory ingest path (S6).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..schemas import TWEET
from .text import SENTIMENT_LEXICON, hashtags, tokens

# (tweet_id, created_at, text, user_id, user_name, followers, lat, lon, lang)
TWEETS: tuple = (
    (1, "2013-09-10 12:00:00", "Happy #New Year", 11, "alice", 120, 40.0, -105.3, "en"),
    (2, "2013-09-10 12:05:00", "the flood was fast #boulder #colorado", 12, "bob", 3400, 40.015, -105.27, "en"),
    (3, "2013-09-10 12:06:30", "roads closed again #boulder", 12, "bob", 3400, None, None, "en"),
    (4, "2013-09-10 13:00:00", "stay safe everyone", 13, "carol", 98, 40.02, -105.25, "en"),
    (5, "2013-09-10 13:10:00", "water rising slow but steady", 14, "dan", 12, None, None, "en"),
    (6, "2013-09-10 13:12:00", "big storm incoming #weather", 15, "eve", 560, 39.99, -105.28, "en"),
    (7, "2013-09-10 14:00:00", "#Boulder creek at flood stage", 11, "alice", 120, 40.013, -105.281, "en"),
    (8, "2013-09-10 14:05:00", "such a slow day at work", 16, "frank", 45, None, None, "en"),
    (9, "2013-09-10 14:30:00", "emergency crews are fast and brave", 13, "carol", 98, None, None, "en"),
    (10, "2013-09-10 15:00:00", "small leaks in the basement #flood", 14, "dan", 12, 40.001, -105.29, "en"),
    (11, "2013-09-10 15:20:00", "value your neighbors help them out", 15, "eve", 560, None, None, "en"),
    (12, "2013-09-10 15:45:00", "das wasser ist schnell #flut", 17, "greta", 780, 48.13, 11.57, "de"),
    (13, "2013-09-10 16:00:00", "la lluvia es fuerte #tormenta", 18, "hugo", 230, 40.41, -3.70, "es"),
    (14, "2013-09-10 16:10:00", "cafe #Üben open late tonight", 19, "ines", 77, None, None, "de"),
    (15, "2013-09-10 16:30:00", "#NEW shelter opened on 5th", 13, "carol", 98, 40.018, -105.276, "en"),
    (16, "2013-09-10 17:00:00", "roads are big rivers now #Flood #Boulder", 12, "bob", 3400, 40.016, -105.272, "en"),
    (17, "2013-09-10 17:30:00", "power is back what a fast fix", 16, "frank", 45, None, None, "en"),
    (18, "2013-09-10 18:00:00", "slow cleanup ahead", 14, "dan", 12, 40.004, -105.288, "en"),
    (19, "2013-09-10 18:30:00", "#new normal for this small town", 15, "eve", 560, None, None, "en"),
    (20, "2013-09-10 19:00:00", "thanks to the fast responders #grateful", 11, "alice", 120, 40.0, -105.3, "en"),
)


def ingest_tweets(spark: SparkSession, rows: tuple = TWEETS) -> DataFrame:
    """R1/S6 in-memory ingest: JSON-shaped records → typed DataFrame.

    The reference accepts one tweet per HTTP POST (README.md:52-54);
    the engine's equivalent boundary is rows → explicit TWEET schema.
    """
    data = [
        (
            tid,
            # UTC-aware: PySpark converts NAIVE datetimes through the
            # process-local timezone (time.mktime), so a non-UTC host
            # would shift every created_at against the oracle's
            # TIMESTAMP literals (§2.4 rule 3).
            datetime.fromisoformat(ts).replace(tzinfo=timezone.utc),
            text,
            (uid, name, followers),
            (lat, lon) if lat is not None else None,
            lang,
        )
        for tid, ts, text, uid, name, followers, lat, lon, lang in rows
    ]
    return spark.createDataFrame(data, TWEET)


def extract_metadata(df: DataFrame) -> DataFrame:
    """R3 hashtags + R4 geo + R5 tokens as added columns."""
    return (
        df.withColumn(
            "hashtags",
            F.array_sort(F.transform(hashtags("text"), lambda t: F.lower(t))),
        )
        .withColumn("lat", F.col("geo.lat"))
        .withColumn("lon", F.col("geo.lon"))
        .withColumn("is_geotagged", F.col("geo").isNotNull())
        .withColumn("toks", tokens("text"))
    )


def _sentiment_case(t: Column) -> Column:
    expr: Column = F.lit(0)
    for word, weight in SENTIMENT_LEXICON:
        expr = F.when(t == word, weight).otherwise(expr)
    return expr


def add_sentiment(df: DataFrame) -> DataFrame:
    """R8/L6 sentiment as a pure-expression fold over tokens (the
    join-based form lives in text.r139; both are deterministic)."""
    score = F.aggregate(
        "toks", F.lit(0), lambda acc, t: acc + _sentiment_case(t)
    ).cast("long")
    return df.withColumn("sentiment_score", score).withColumn(
        "sentiment",
        F.when(F.col("sentiment_score") > 0, "positive")
        .when(F.col("sentiment_score") < 0, "negative")
        .otherwise("neutral"),
    )


def standardize(df: DataFrame) -> DataFrame:
    """R9: reshape into the fixed output structure declared by
    README.md:95-97 (sentiment, hashtags, geo, user)."""
    return df.select(
        "tweet_id",
        "created_at",
        F.struct("sentiment_score", "sentiment").alias("sentiment_info"),
        "hashtags",
        F.struct("lat", "lon", "is_geotagged").alias("geo_info"),
        "user",
        F.size("toks").alias("n_tokens"),
    )


def to_json_records(df: DataFrame) -> DataFrame:
    """R10: serialize the standardized record to a JSON string column
    (what the reference publishes to Kafka, README.md:100)."""
    return df.withColumn("json", F.to_json(F.struct(*df.columns)))


def _values_sql() -> str:
    rows = []
    for tid, ts, text, _uid, name, followers, lat, lon, _lang in TWEETS:
        lat_s = "CAST(NULL AS DOUBLE)" if lat is None else repr(lat)
        lon_s = "CAST(NULL AS DOUBLE)" if lon is None else repr(lon)
        text_q = text.replace("'", "''")
        name_q = name.replace("'", "''")
        rows.append(
            f"({tid}, TIMESTAMP '{ts}', '{text_q}', '{name_q}', "
            f"{followers}, {lat_s}, {lon_s})"
        )
    return ",\n    ".join(rows)


_LEX_CASE = " ".join(
    f"WHEN '{w}' THEN {s}" for w, s in SENTIMENT_LEXICON
)

_Q31_ORACLE = f"""
WITH tweets(tweet_id, created_at, text, user_name, followers, lat, lon) AS (
  VALUES
    {_values_sql()}
),
t AS (
  SELECT *,
    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM tweets
)
SELECT
  tweet_id,
  strftime(created_at, '%Y-%m-%dT%H:%M:%S') AS created_iso,
  user_name,
  followers,
  lat,
  lon,
  lat IS NOT NULL AS is_geotagged,
  COALESCE(array_to_string(
    list_sort(list_transform(regexp_extract_all(text, '#\\w+'), x -> lower(x))), ','
  ), '') AS tags,
  len(toks) AS n_tokens,
  CAST(list_sum(list_transform(toks, x -> CASE x {_LEX_CASE} ELSE 0 END)) AS BIGINT)
    AS sentiment_score,
  CASE WHEN list_sum(list_transform(toks, x -> CASE x {_LEX_CASE} ELSE 0 END)) > 0
         THEN 'positive'
       WHEN list_sum(list_transform(toks, x -> CASE x {_LEX_CASE} ELSE 0 END)) < 0
         THEN 'negative'
       ELSE 'neutral' END AS sentiment,
  json_extract_string(
    CAST(to_json(struct_pack(user := struct_pack(name := user_name))) AS VARCHAR),
    '$.user.name') AS name_roundtrip
FROM t
ORDER BY tweet_id
"""


@query("q02_tweet_pipeline", oracle=_Q31_ORACLE, tags=("R1", "R3", "R4", "R5", "R8", "R9", "R10", "S6", "pipeline"))
def q02_tweet_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference pipeline R1→R10 on the inline tweet fixture,
    flattened for the differential compare (structs are projected back
    to scalars; JSON is compared via extracted fields per §2.4)."""
    df = add_sentiment(extract_metadata(ingest_tweets(spark)))
    std = to_json_records(standardize(df))
    return std.select(
        "tweet_id",
        F.date_format("created_at", "yyyy-MM-dd'T'HH:mm:ss").alias("created_iso"),
        F.col("user.name").alias("user_name"),
        F.col("user.followers").alias("followers"),
        F.col("geo_info.lat").alias("lat"),
        F.col("geo_info.lon").alias("lon"),
        F.col("geo_info.is_geotagged").alias("is_geotagged"),
        F.array_join("hashtags", ",").alias("tags"),
        "n_tokens",
        F.col("sentiment_info.sentiment_score").alias("sentiment_score"),
        F.col("sentiment_info.sentiment").alias("sentiment"),
        F.get_json_object(
            F.to_json(F.struct(F.struct(F.col("user.name").alias("name")).alias("user"))),
            "$.user.name",
        ).alias("name_roundtrip"),
    ).orderBy("tweet_id")


# ---------------------------------------------------------------------------
# Capstone: the full corpus-curation pipeline as ONE composed query —
# quality gate → exact dedup → train split → context-window chunking.
# The stages are the registered operators (q19/q18/q60/q62) composed
# end-to-end; the oracle replays the entire chain in a single CTE
# pipeline, so the *composition* is oracle-checked, not just the parts.
# ---------------------------------------------------------------------------

from ..catalog import table as _table
from .dedup import SHINGLE_SIZE as _SS  # noqa: F401  (doc: same corpus ops)
from .sampling import _SALT as _SPLIT_SALT
from .sampling import N_BUCKETS as _NB
from .sampling import TRAIN_LT as _TRAIN_LT
from .sampling import hash60 as _hash60
from .text import CHUNK_STRIDE as _PIPE_STRIDE
from .text import CHUNK_TOKENS as _PIPE_CHUNK
from .text import FINGERPRINT_SQL as _FP_SQL
from .text import STOPWORDS as _STOP
from .text import TOKENS_SQL as _TOK_SQL
from .text import fingerprint as _fingerprint

_MIN_TOKENS = 20
_MIN_STOP_RATIO = 0.05
# Chunk geometry is the q62 operator's (text.CHUNK_TOKENS/STRIDE,
# imported above): the capstone COMPOSES the registered operators, so
# re-versioning the chunk window there must reach this pipeline too.

_STOP_LIST_SQL = "'" + "','".join(_STOP) + "'"

_Q50_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_TOK_SQL} AS toks FROM documents
),
gate AS (
  SELECT doc_id, text, toks
  FROM t
  WHERE len(toks) >= {_MIN_TOKENS}
    AND CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
        / len(toks) >= {_MIN_STOP_RATIO}
),
fp AS (
  SELECT doc_id, toks, {_FP_SQL} AS f FROM gate
),
dedup AS (
  SELECT doc_id, toks
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY f) AS canonical FROM fp)
  WHERE doc_id = canonical
),
split AS (
  SELECT doc_id, toks
  FROM dedup
  WHERE CAST(('0x' || substr(md5('{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % {_NB} < {_TRAIN_LT}
),
st AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), {_PIPE_STRIDE})) AS s
  FROM split
)
SELECT
  doc_id,
  CAST(s / {_PIPE_STRIDE} AS BIGINT) AS chunk_idx,
  len(toks[s + 1 : s + {_PIPE_CHUNK}]) AS n_tokens,
  array_to_string(toks[s + 1 : s + {_PIPE_CHUNK}], ' ') AS chunk_text
FROM st
ORDER BY doc_id, chunk_idx
"""


@query("q25_corpus_pipeline", oracle=_Q50_ORACLE, tags=("L1", "L5", "L9", "pipeline", "bench"))
def q25_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → training chunks, end to end: quality gate (token
    count + stopword ratio), exact dedup (min-id survivor per content
    fingerprint), deterministic train-split membership, overlapping
    context-window chunking.

    Plan at scale: one map-only pass to the gate, ONE shuffle for the
    fingerprint dedup window, then map-only split + chunk explode —
    the whole curation pipeline costs a single exchange. This is the
    engine's answer to the reference's ingest→standardize→serialize
    chain (reference README.md:48-76), aimed at LM corpus prep.
    """
    from pyspark.sql.window import Window as _W

    d = _table(spark, sf_dir, "documents")
    t = d.select("doc_id", "text", tokens("text").alias("toks"))
    gate = t.filter(
        (F.size("toks") >= _MIN_TOKENS)
        & (
            F.size(F.filter("toks", lambda x: x.isin(*_STOP))).cast("double")
            / F.size("toks")
            >= _MIN_STOP_RATIO
        )
    )
    fp = gate.select("doc_id", "toks", _fingerprint("text").alias("f"))
    dedup = (
        fp.withColumn("canonical", F.min("doc_id").over(_W.partitionBy("f")))
        .filter(F.col("doc_id") == F.col("canonical"))
        .select("doc_id", "toks")
    )
    bucket = _hash60(F.col("doc_id").cast("string"), _SPLIT_SALT) % _NB
    split = dedup.filter(bucket < _TRAIN_LT)
    st = split.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_PIPE_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice("toks", F.col("s") + 1, _PIPE_CHUNK)
    return st.select(
        "doc_id",
        (F.col("s") / _PIPE_STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# R4/R13 geo grid aggregation — the Elasticsearch geohash_grid
# analytics the reference's ES index would serve (reference
# README.md:84-86 geo extraction, README.md:102-104 ES analytics),
# as a plain bounded-key aggregate: cell = floor(coord * 100)
# (0.01° ≈ 1.1 km grid), centroids in exact Q20 fixed point.
# ---------------------------------------------------------------------------

_Q25_ORACLE = f"""
WITH tweets(tweet_id, created_at, text, user_name, followers, lat, lon) AS (
  VALUES
    {_values_sql()}
)
SELECT
  CAST(floor(lat * 100) AS BIGINT) AS cell_lat,
  CAST(floor(lon * 100) AS BIGINT) AS cell_lon,
  COUNT(*) AS n_tweets,
  COUNT(DISTINCT user_name) AS n_users,
  round(CAST(SUM(CAST(floor(lat * 1048576) AS BIGINT)) AS DOUBLE)
        / 1048576 / COUNT(*), 6) AS centroid_lat,
  round(CAST(SUM(CAST(floor(lon * 1048576) AS BIGINT)) AS DOUBLE)
        / 1048576 / COUNT(*), 6) AS centroid_lon
FROM tweets
WHERE lat IS NOT NULL
GROUP BY 1, 2
ORDER BY cell_lat, cell_lon
"""


@query("q75_geo_grid", oracle=_Q25_ORACLE, tags=("R4", "R13", "pipeline"))
def q75_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo grid-cell rollup of geotagged tweets: tweet/user counts and
    the cell centroid per 0.01° cell.

    The ES geohash_grid aggregation as a native groupBy: the cell id
    is a pure per-row function (no spatial index needed for gridding),
    so at 100 TB this is one shuffle on a bounded key with map-side
    partial aggregation — and a spatial *join* against cells is an
    equi-join on the same key. Centroids sum Q20-quantized int64s, so
    they are order-independent and bit-identical to the oracle.
    """
    g = ingest_tweets(spark).filter(F.col("geo").isNotNull())
    r138 = 1048576
    cnt = F.count(F.lit(1))
    return (
        g.select(
            F.floor(F.col("geo.lat") * 100).alias("cell_lat"),
            F.floor(F.col("geo.lon") * 100).alias("cell_lon"),
            F.col("user.name").alias("user_name"),
            F.floor(F.col("geo.lat") * r138).cast("long").alias("qlat"),
            F.floor(F.col("geo.lon") * r138).cast("long").alias("qlon"),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            cnt.alias("n_tweets"),
            F.countDistinct("user_name").alias("n_users"),
            F.round(F.sum("qlat").cast("double") / r138 / cnt, 6).alias("centroid_lat"),
            F.round(F.sum("qlon").cast("double") / r138 / cnt, 6).alias("centroid_lon"),
        )
        .orderBy("cell_lat", "cell_lon")
    )
