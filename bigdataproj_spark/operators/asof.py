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
from ..functions import fmt_ts
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
    rhs_payload = [F.col(c).alias(a) for c, a in right_cols.items()]
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tie"),
        *rhs_payload,
    )
    aliases = list(right_cols.values())
    lhs_full = lhs.withColumn("__tie", F.lit(None).cast("long"))
    for a in aliases:
        lhs_full = lhs_full.withColumn(a, F.lit(None).cast(rhs.schema[a].dataType))
    unioned = lhs_full.unionByName(rhs, allowMissingColumns=True)
    w = Window.partitionBy(on).orderBy("__ts", "__side", "__tie")
    filled = unioned.select(
        "*",
        *[F.last(a, ignorenulls=True).over(w).alias(f"__filled_{a}") for a in aliases],
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"__filled_{a}").alias(a) for a in aliases]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


_Q48_ORACLE = """
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


@query("q48_asof_join", oracle=_Q48_ORACLE, tags=("J8", "bench"))
def q48_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase joined to the user's latest prior
    (or simultaneous) click; oracle is DuckDB's native ASOF JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "click_id", "value": "click_value", "ts": "click_ts"},
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("purchase_ts"),
        "click_id",
        "click_value",
        F.expr("(unix_micros(ts) - unix_micros(click_ts)) div 1000000").alias(
            "secs_since_click"
        ),
    ).orderBy("event_id")
