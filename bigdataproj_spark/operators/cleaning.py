"""Data-cleaning operators: null handling and imputation.

Every real ingestion pipeline cleans before it aggregates; the
reference's standardization step ("transformed into a standardized
structure", reference README.md:96) is this in miniature. The fixtures are null-free by construction, so the
query first *synthesizes* missingness deterministically (event_id
modulo masks — identical in both engines), then applies the standard
cleaning battery:

- drop rows whose key field is missing (``na.drop`` semantics),
- mean-impute a missing numeric (global mean of the surviving
  non-null values, computed exactly on the int64 fixed-point kernel),
- flag imputed rows,
- categorical fill with a sentinel (``na.fill`` semantics).

At 100 TB: the mean is one global aggregate (broadcast back as a
1-row frame); everything else is a map-only pass — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import iavg
from ..registry import query

# Deterministic missingness masks (same arithmetic in the oracle).
_DROP_MOD = 11   # event_id % 11 == 0 → event_type "missing" → row dropped
_NULL_MOD = 7    # event_id % 7 == 0  → value missing → mean-imputed
_FILL_MOD = 5    # event_id % 5 == 0  → props missing → sentinel-filled

_Q47_ORACLE = f"""
WITH masked AS (
  SELECT
    event_id,
    CASE WHEN event_id % {_DROP_MOD} = 0 THEN NULL ELSE event_type END AS event_type,
    CASE WHEN event_id % {_NULL_MOD} = 0 THEN NULL ELSE value END AS value,
    CASE WHEN event_id % {_FILL_MOD} = 0 THEN NULL ELSE props END AS props
  FROM events
),
kept AS (SELECT * FROM masked WHERE event_type IS NOT NULL),
m AS (
  SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(value)
    AS mean_value
  FROM kept
)
SELECT
  event_id,
  event_type,
  round(COALESCE(value, m.mean_value), 6) AS value_clean,
  (value IS NULL) AS value_imputed,
  COALESCE(props, '{{}}') AS props_clean
FROM kept CROSS JOIN m
ORDER BY event_id
"""


@query("r81_null_clean", oracle=_Q47_ORACLE, tags=("L11", "cleaning"))
def r81_null_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery: drop on missing key, exact-mean
    imputation with an imputed flag, sentinel fill for categoricals.

    The imputation mean runs on the int64 fixed-point kernel
    (functions.isum reasoning) so Spark and DuckDB agree bit-for-bit;
    the 1-row mean frame broadcasts and the fill is a map-only
    coalesce.
    """
    e = table(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        F.when(F.col("event_id") % _DROP_MOD == 0, None)
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % _NULL_MOD == 0, None)
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % _FILL_MOD == 0, None)
        .otherwise(F.col("props"))
        .alias("props"),
    )
    kept = masked.na.drop(subset=["event_type"])
    mean = kept.agg(iavg("value").alias("mean_value"))
    return (
        kept.crossJoin(F.broadcast(mean))
        .select(
            "event_id",
            "event_type",
            F.round(F.coalesce(F.col("value"), F.col("mean_value")), 6).alias(
                "value_clean"
            ),
            F.col("value").isNull().alias("value_imputed"),
            F.coalesce(F.col("props"), F.lit("{}")).alias("props_clean"),
        )
        .orderBy("event_id")
    )
