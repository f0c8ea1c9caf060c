"""Product-analytics operators over the event stream: cohort
retention, funnel conversion, SCD-2 interval builds.

These are the aggregate-analytics queries the reference delegates to
Elasticsearch/Kibana (reference README.md:20,102-104 — "queried …
for analytics") re-expressed natively. All three are window/agg
compositions over the ``events`` fixture — no UDF, one bounded-key
shuffle chain each, oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query

# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-active day; how many of each
# cohort return on day offset k.
# ---------------------------------------------------------------------------

_Q33_ORACLE = """
WITH acts AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
firsts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM acts GROUP BY user_id
)
SELECT
  strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
  a.day - f.cohort_day AS day_offset,
  COUNT(*) AS active_users
FROM acts a JOIN firsts f USING (user_id)
GROUP BY f.cohort_day, a.day - f.cohort_day
ORDER BY cohort_day, day_offset
"""


@query("r69_cohort_retention", oracle=_Q33_ORACLE, tags=("A1", "J1", "analytics"))
def r69_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix: (cohort first-active day, day
    offset) → distinct active users.

    Shuffle chain is bounded by the user dimension: distinct
    (user, day) pairs, per-user MIN, then a user-keyed join — all
    three exchanges hash on user_id, so Spark reuses one
    partitioning; the final (cohort, offset) agg is at most
    days² keys. The (user, day) distinct is the only data-sized
    shuffle, with map-side partial dedup.
    """
    e = table(spark, sf_dir, "events")
    acts = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        acts.join(firsts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Funnel conversion: view → click → purchase, strictly ordered in time
# per user; count users surviving each step.
# ---------------------------------------------------------------------------

_Q34_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 12 HOUR
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
    AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 12 HOUR
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS users FROM s1
  UNION ALL
  SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FROM s3
)
ORDER BY step
"""


@query("r70_funnel_conversion", oracle=_Q34_ORACLE, tags=("A1", "J1", "analytics"))
def r70_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: first view → click within 12h →
    purchase within 12h of that click; survivor count per step.

    Each step is a per-user MIN over a type-filtered scan joined to
    the previous step's frontier — every exchange hashes on user_id,
    so the whole funnel runs in one partitioning (no re-shuffle
    between steps), and the frontier shrinks monotonically. The
    event_type filter pushes down to the parquet scan.
    """
    e = table(spark, sf_dir, "events")

    window = F.expr("INTERVAL 12 HOURS")

    def step(prev: DataFrame | None, etype: str, tcol: str, prev_t: str) -> DataFrame:
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(
                (F.col("ts") > F.col(prev_t)) & (F.col("ts") <= F.col(prev_t) + window)
            )
        return s.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = step(None, "view", "t1", "")
    s2 = step(s1, "click", "t2", "t1")
    s3 = step(s2, "purchase", "t3", "t2")

    def count_row(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).alias("users"),
        )

    return (
        count_row(s1, 1, "view")
        .unionAll(count_row(s2, 2, "click"))
        .unionAll(count_row(s3, 3, "purchase"))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# SCD-2 interval build: turn a per-key changelog into validity
# intervals [valid_from, valid_to) with a current-row flag — the
# history-preserving counterpart of r82's SCD-1 merge.
# ---------------------------------------------------------------------------

_SCD2_OPEN_END = "9999-12-31T00:00:00"

_Q35_ORACLE = f"""
SELECT
  user_id,
  event_id,
  value,
  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS valid_from,
  COALESCE(
    strftime(
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      '%Y-%m-%dT%H:%M:%S'),
    '{_SCD2_OPEN_END}') AS valid_to,
  CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       AS BOOLEAN) AS is_current
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


@query("r71_scd2_intervals", oracle=_Q35_ORACLE, tags=("W2", "M1", "analytics"))
def r71_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 (type-2 slowly-changing dimension) history from a
    changelog: each purchase sets the user's value; LEAD closes the
    previous version's validity interval, the open row is flagged
    current.

    One shuffle (window partition on user_id), sort within partition
    on (ts, event_id) — the deterministic tiebreak for equal
    timestamps. At 100 TB this is the standard log-to-dimension
    compaction: shuffle by key once, no join, interval columns are
    pure window functions.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.select(
            "user_id",
            "event_id",
            "value",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, "yyyy-MM-dd'T'HH:mm:ss"),
                F.lit(_SCD2_OPEN_END),
            ).alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "event_id")
    )
