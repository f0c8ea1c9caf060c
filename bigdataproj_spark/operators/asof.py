"""As-of join (SURVEY.md §2.2 row J8).

Spark has no native as-of join; the engine composes one from a tagged
union + `last(..., ignorenulls=True)` window (SURVEY.md §4: "compose
from window functions"). DuckDB's native ASOF JOIN is the oracle.

Scale: one shuffle on the partition key (user), then a single ordered
window pass — the same cost profile as a sort-merge join, with no
per-row probe. Ties break deterministically: at equal timestamps the
left-side (click) row sorts before the right-side (purchase) row, so
an equal-timestamp click IS matched (ASOF `>=` semantics), and among
equal-timestamp clicks the largest event_id wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import cents, fmt_ts
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` sharing the ``on`` key.

    right_cols maps right column → output alias. Returns all left
    columns + the aliased right columns (NULL when no match).
    """
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # The whole right payload travels as ONE struct filled by ONE
    # last(ignorenulls): per-column fills would each skip back to the
    # most recent right row where THAT column was non-null, stitching
    # values from different right rows into one match (torn as-of
    # semantics whenever any payload column is NULL).
    payload = F.struct(*[F.col(c).alias(a) for c, a in right_cols.items()])
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tie"),
        payload.alias("__payload"),
    )
    aliases = list(right_cols.values())
    lhs_full = lhs.withColumn("__tie", F.lit(None).cast("long")).withColumn(
        "__payload", F.lit(None).cast(rhs.schema["__payload"].dataType)
    )
    unioned = lhs_full.unionByName(rhs, allowMissingColumns=True)
    w = Window.partitionBy(on).orderBy("__ts", "__side", "__tie")
    filled = unioned.select(
        "*", F.last("__payload", ignorenulls=True).over(w).alias("__filled")
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col("__filled")[a].alias(a) for a in aliases]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


_Q95_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  strftime(p.ts, '%Y-%m-%dT%H:%M:%S') AS purchase_ts,
  c.event_id AS click_id,
  c.value AS click_value,
  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS secs_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@query("q44_asof_join", oracle=_Q95_ORACLE, tags=("J8", "bench"))
def q44_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase joined to the user's latest prior
    (or simultaneous) click; oracle is DuckDB's native ASOF JOIN.

    Both as-of sides come from the SAME table, so the generic
    tagged-union plan (``asof_join``) collapses to a single scan: one
    pushed ``event_type IN`` filter, one shuffle on the window key,
    one ordered pass. At equal timestamps the click row sorts before
    the purchase (ASOF ``>=`` semantics), and among equal-timestamp
    clicks the largest event_id wins — identical tiebreaks to the
    generic composition, minus a scan and a union.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_click, F.lit(0)).otherwise(F.lit(1)).alias("__side"),
        # one struct per click row — a single last(ignorenulls) then
        # fills ALL payload columns from the SAME click (see
        # asof_join: per-column fills tear when a column is NULL,
        # e.g. a click with NULL value).
        F.when(
            is_click,
            F.struct(
                F.col("event_id").alias("click_id"),
                F.col("value").alias("click_value"),
                F.col("ts").alias("click_ts"),
            ),
        ).alias("__click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "__side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "__side",
        F.last("__click", ignorenulls=True).over(w).alias("__c"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "__side",
        F.col("__c.click_id").alias("click_id"),
        F.col("__c.click_value").alias("click_value"),
        F.col("__c.click_ts").alias("click_ts"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            "event_id",
            "user_id",
            fmt_ts("ts").alias("purchase_ts"),
            "click_id",
            "click_value",
            F.expr("(unix_micros(ts) - unix_micros(click_ts)) div 1000000").alias(
                "secs_since_click"
            ),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill: densify to a daily grid per key, carry the last
# observation forward (LOCF). The standard resample step before any
# window/trend computation on irregular event data.
# ---------------------------------------------------------------------------

_Q32_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS day_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS gmin, date_trunc('day', MAX(ts)) AS gmax
  FROM events
),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(gmin, gmax, INTERVAL 1 DAY)) AS day
              FROM bounds) g
),
joined AS (
  SELECT grid.user_id, grid.day, daily.day_value
  FROM grid LEFT JOIN daily USING (user_id, day)
)
SELECT
  user_id,
  strftime(day, '%Y-%m-%dT%H:%M:%S') AS day_iso,
  COALESCE(
    last_value(day_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    0.0) AS filled_value,
  (day_value IS NULL) AS is_filled
FROM joined
ORDER BY user_id, day
"""


@query("r68_gap_fill", oracle=_Q32_ORACLE, tags=("TS1", "asof"))
def r68_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample per user with LOCF (last observation carried
    forward) and zero-fill before the first observation, flagging
    synthesized rows.

    Scale shape: the daily aggregate is one shuffle on (user, day);
    the dense grid is users × explode(global day range) — the range
    is a broadcast 1-row bound, so densification is map-only; LOCF is
    one window over the (bounded) per-user day span. Grid size is
    keys × days, independent of event volume.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (F.sum(cents("value")).cast("double") / 100).alias(
            "day_value"
        )
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("gmin"),
        F.date_trunc("day", F.max("ts")).alias("gmax"),
    )
    users = e.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence("gmin", "gmax", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd'T'HH:mm:ss").alias("day_iso"),
        F.coalesce(
            F.last("day_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
        F.col("day_value").isNull().alias("is_filled"),
    ).orderBy("user_id", "day")
