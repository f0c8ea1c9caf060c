"""Batch twins of the streaming window operators (ST1-ST3, ST7).

Each query uses the exact expression the streaming path uses
(``F.window`` / ``F.session_window`` work identically over bounded
DataFrames), so hash-matching these against DuckDB pins the windowing
math; the streaming-only semantics (watermarks, state) are covered by
``replay`` + tests/test_streaming.py.

Reference surface: the Kafka tweet-stream (reference README.md:48-49,
100-101) — the engine generalizes "a stream of JSON events" to the
``events`` fixture (event_id, ts, user_id, event_type, value, props).

Determinism: ``value`` has 2-decimal precision; sums run as
DECIMAL(18,2) and only the final output casts to DOUBLE (SURVEY.md
§2.4 rule 2). Window bounds serialize as UTC ISO strings (rule 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%dT%H:%M:%S"


def _iso(c: Column | str, alias: str) -> Column:
    return F.date_format(c, _TS_FMT).alias(alias)


# ---------------------------------------------------------------------------
# ST1 tumbling window aggregate.
# ---------------------------------------------------------------------------

_Q36_ORACLE = f"""
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}') AS w_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY w_start, event_type
"""


@query("r72_tumbling_window", oracle=_Q36_ORACLE, tags=("ST1", "streaming"))
def r72_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event type (ST1).

    The identical ``F.window`` expression runs incrementally under
    ``readStream`` + watermark (see replay.tumbling_stream); on a
    cluster the shuffle key (window, event_type) is bounded and dense.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            _iso("w.start", "w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("w_start", "event_type")
    )


# ---------------------------------------------------------------------------
# ST2 sliding window aggregate (2-hour window, 1-hour slide).
# ---------------------------------------------------------------------------

_Q37_ORACLE = f"""
WITH buckets AS (
  SELECT
    time_bucket(INTERVAL '1 hour', ts) - INTERVAL (k) HOUR AS w_start,
    value
  FROM events, (SELECT unnest([0, 1]) AS k) offs
)
SELECT
  strftime(w_start, '{_TS_FMT_DUCK}') AS w_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM buckets
GROUP BY 1
ORDER BY w_start
"""


@query("r73_sliding_window", oracle=_Q37_ORACLE, tags=("ST2", "streaming"))
def r73_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window totals: 2-hour windows advancing by 1 hour (ST2).

    Spark's ``window(ts, '2 hours', '1 hour')`` assigns each event to
    window_size/slide = 2 windows map-side (the oracle unnests the same
    two bucket offsets); the shuffle key stays the bounded window start.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(_iso("w.start", "w_start"), "n_events", "sum_value")
        .orderBy("w_start")
    )


# ---------------------------------------------------------------------------
# ST3 session window (30-minute inactivity gap) per user.
# ---------------------------------------------------------------------------

_Q38_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
           OR lag(ts) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT
  user_id,
  strftime(MIN(ts), '{_TS_FMT_DUCK}') AS s_start,
  strftime(MAX(ts) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS s_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, s_start
"""


@query("r74_session_window", oracle=_Q38_ORACLE, tags=("ST3", "streaming"))
def r74_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (ST3).

    ``F.session_window`` merges overlapping [ts, ts+gap) intervals;
    the oracle reproduces it with the classic lag-gap → cumulative-sum
    session assignment (SURVEY.md §2.3 ST3). Session end = last event
    + gap, matching Spark's definition.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            _iso("w.start", "s_start"),
            _iso("w.end", "s_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "s_start")
    )


# ---------------------------------------------------------------------------
# ST7 stream-static join: enrich events with a dimension table.
# ---------------------------------------------------------------------------

_Q39_ORACLE = f"""
SELECT
  e.event_id,
  strftime(e.ts, '{_TS_FMT_DUCK}') AS ts,
  e.event_type,
  c.c_name,
  n.n_name AS nation
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY e.event_id
"""


@query("r75_stream_static_join", oracle=_Q39_ORACLE, tags=("ST7", "streaming"))
def r75_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (ST7): events joined to customer
    and nation dimensions.

    The identical join runs per micro-batch under readStream (see
    replay.enriched_stream); the static side is broadcast so the
    stream side never shuffles — the property that makes this scale to
    unbounded input.
    """
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", "c_name", F.col("n_name").alias("nation")
        )
    )
    return (
        e.join(dim, e.user_id == dim.c_custkey)
        .select(
            "event_id",
            _iso("ts", "ts"),
            "event_type",
            "c_name",
            "nation",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# ST8 stream-stream join: click→purchase attribution within 1 hour.
# ---------------------------------------------------------------------------

_Q40_ORACLE = f"""
SELECT
  p.event_id AS purchase_id,
  c.event_id AS click_id,
  p.user_id,
  strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
  strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL '1 hour'
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
"""


@query("r76_stream_stream_join", oracle=_Q40_ORACLE, tags=("ST8", "streaming"))
def r76_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch twin (ST8): every purchase
    matched to the same user's clicks in the preceding hour — the
    classic attribution join.

    The identical join graph runs under readStream on BOTH sides (see
    replay.attribution_stream): watermarks on each side plus the
    two-sided time bound let Spark reclaim join state — the condition
    that makes an unbounded stream-stream join feasible. Plan at
    scale: one shuffle per side on user_id; state per key is bounded
    by the 1-hour window + watermark delay.
    """
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        _iso("p_ts", "purchase_ts"),
        _iso("c_ts", "click_ts"),
    ).orderBy("purchase_id", "click_id")
