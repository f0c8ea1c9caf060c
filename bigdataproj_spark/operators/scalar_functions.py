"""Scalar function families (SURVEY.md §2.3 rows F-S/F-D/F-M/F-A/F-P/F-J).

One wide oracle-checked query per family. Cross-engine notes captured
per column (e.g. DuckDB ``regexp_replace`` needs the 'g' flag to match
Spark's replace-all; DuckDB ``log`` is log10, Spark's is ln).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ..functions import round_fp

# ---------------------------------------------------------------------------
# F-S1/F-S3/F-S4 string functions.
# ---------------------------------------------------------------------------

_Q97_ORACLE = """
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  trim(p_name) AS name_trim,
  substr(p_name, 1, 8) AS name_prefix,
  concat_ws('-', p_brand, p_type) AS brand_type,
  length(p_name) AS name_len,
  replace(p_type, ' ', '_') AS type_snake,
  levenshtein(p_brand, 'Brand#13') AS brand_dist,
  (p_name LIKE '%ol%') AS has_ol,
  starts_with(p_type, 'STANDARD') AS is_standard,
  ends_with(p_type, 'TIN') AS is_tin,
  contains(p_name, 'red') AS has_red
FROM part
ORDER BY p_partkey
"""


@query("q31_string_functions", oracle=_Q97_ORACLE, tags=("F-S1", "F-S3", "F-S4"))
def q31_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over the part dimension."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.levenshtein("p_brand", F.lit("Brand#13")).alias("brand_dist"),
        F.col("p_name").like("%ol%").alias("has_ol"),
        F.startswith("p_type", F.lit("STANDARD")).alias("is_standard"),
        F.endswith("p_type", F.lit("TIN")).alias("is_tin"),
        F.contains("p_name", F.lit("red")).alias("has_red"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# F-S2 regex functions (serve hashtag surface R3, README.md:63).
# ---------------------------------------------------------------------------

_Q04_ORACLE = r"""
SELECT
  doc_id,
  regexp_extract(text, '([a-z]{4,})', 1) AS first_long_word,
  len(regexp_extract_all(text, '\b[a-z]{5}\b')) AS n_five_letter,
  substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_prefix,
  regexp_matches(text, 'spark') AS mentions_spark
FROM documents
ORDER BY doc_id
"""


@query("q55_regex_functions", oracle=_Q04_ORACLE, tags=("F-S2",))
def q55_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / extract_all / replace / rlike.

    DuckDB quirk: its regexp_replace replaces only the first match
    unless passed the 'g' flag; Spark always replaces all.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{4,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b[a-z]{5}\b"), 0)).alias(
            "n_five_letter"
        ),
        F.substring(F.regexp_replace("text", r"[aeiou]", "_"), 1, 40).alias(
            "devoweled_prefix"
        ),
        F.col("text").rlike("spark").alias("mentions_spark"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# F-D1 date/time functions.
# ---------------------------------------------------------------------------

_Q05_ORACLE = """
SELECT
  o_orderkey,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mo,
  day(o_orderdate) AS dy,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%dT%H:%M:%S') AS month_start,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
  CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS epoch_sec,
  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d
FROM orders
ORDER BY o_orderkey
"""


@query("q56_datetime_functions", oracle=_Q05_ORACLE, tags=("F-D1",))
def q56_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day, date_trunc, datediff, unix seconds, date_add."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# F-M1 math functions (libm-sensitive outputs round-6 guarded).
# ---------------------------------------------------------------------------

_Q06_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
  abs(l_discount - 0.05) AS disc_dev,
  sqrt(l_quantity) AS qty_sqrt,
  round(exp(l_discount), 6) AS disc_exp,
  round(ln(l_extendedprice), 6) AS price_ln,
  l_quantity * l_quantity AS qty_sq,
  l_orderkey % 7 AS key_mod7,
  round(l_extendedprice / 7.0, 6) AS price_div7
FROM lineitem
WHERE l_orderkey % 100 = 0
ORDER BY l_orderkey, l_linenumber
"""


@query("r87_math_functions", oracle=_Q06_ORACLE, tags=("F-M1",))
def r87_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor/ceil/abs/sqrt/exp/log/pow/mod.

    sqrt is IEEE-exact cross-engine; exp/ln are libm-dependent, so
    they pass through round-6. DuckDB's log() is log10 — ln() is the
    twin of Spark's F.log.
    """
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        round_fp(F.exp("l_discount"), 6).alias("disc_exp"),
        round_fp(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        # price/7 scales to ~1.4e10 at 6 digits — large enough that
        # F.round's BigDecimal can disagree with the oracle's FP-scaled
        # round on boundary values; round_fp is DuckDB-identical by
        # construction (functions.round_fp).
        round_fp(F.col("l_extendedprice") / 7.0, 6).alias("price_div7"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# F-A1/F-A2 array functions + higher-order functions.
# ---------------------------------------------------------------------------

_Q07_ORACLE = """
SELECT
  vec_id,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS head1,
  round(CAST(embedding[2] AS DOUBLE), 6) AS head2,
  round(CAST(embedding[3] AS DOUBLE), 6) AS head3,
  len(list_filter(embedding, x -> x > 0)) AS n_positive,
  (SELECT CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(24,12))) AS DOUBLE)
     FROM unnest(embedding) AS t(x)) AS sq_norm,
  array_to_string(list_sort(list_distinct([label, label % 2, 0])), ',') AS label_set,
  array_to_string(flatten([[vec_id], [vec_id + 1]]), ',') AS flat_pair,
  array_to_string(list_transform(range(1, 4), i -> CAST(i * vec_id AS BIGINT)), ',')
    AS scaled_seq
FROM embeddings
ORDER BY vec_id
"""


@query("q57_array_functions", oracle=_Q07_ORACLE, tags=("F-A1", "F-A2"))
def q57_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/slice/filter/transform/aggregate/flatten/distinct/sort.

    The squared-norm accumulates per-element DECIMAL(24,12) casts of
    double products, so the fold is order-independent and the DuckDB
    twin can use an unnest+SUM instead of mirroring the fold.

    All array-typed intermediates are reduced to scalars (head slice →
    three double columns; int arrays → array_join strings) in the final
    projection: the driver canonicalizer cannot sort numpy arrays
    (VERDICT.md round 1, item 1).
    """
    e = table(spark, sf_dir, "embeddings")
    zero = F.lit(0).cast("decimal(24,12)")
    sq_norm = F.aggregate(
        "embedding",
        zero,
        lambda acc, x: (
            acc + (x.cast("double") * x.cast("double")).cast("decimal(24,12)")
        ).cast("decimal(24,12)"),
    ).cast("double")

    def _joined(col: F.Column) -> F.Column:
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("head1"),
        F.round(F.element_at("embedding", 2).cast("double"), 6).alias("head2"),
        F.round(F.element_at("embedding", 3).cast("double"), 6).alias("head3"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        sq_norm.alias("sq_norm"),
        _joined(
            F.array_sort(
                F.array_distinct(F.array("label", F.col("label") % 2, F.lit(0)))
            )
        ).alias("label_set"),
        _joined(
            F.flatten(F.array(F.array("vec_id"), F.array(F.col("vec_id") + 1)))
        ).alias("flat_pair"),
        _joined(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: (i.cast("long") * F.col("vec_id")),
            )
        ).alias("scaled_seq"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# F-P1 map functions.
# ---------------------------------------------------------------------------

_Q08_ORACLE = """
WITH m AS (
  SELECT p_partkey, MAP(['brand', 'type'], [p_brand, p_type]) AS meta FROM part
)
SELECT
  p_partkey,
  map_extract(meta, 'brand')[1] AS meta_brand,
  map_extract(meta, 'type')[1] AS meta_type,
  array_to_string(list_sort(map_keys(meta)), ',') AS meta_keys,
  len(map_values(meta)) AS n_values
FROM m
ORDER BY p_partkey
"""


@query("q58_map_functions", oracle=_Q08_ORACLE, tags=("F-P1",))
def q58_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map, element access, map_keys (sort-normalized), map_values."""
    p = table(spark, sf_dir, "part")
    m = p.select(
        "p_partkey",
        F.create_map(
            F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
        ).alias("meta"),
    )
    return m.select(
        "p_partkey",
        F.element_at("meta", F.lit("brand")).alias("meta_brand"),
        F.element_at("meta", F.lit("type")).alias("meta_type"),
        F.array_join(F.array_sort(F.map_keys("meta")), ",").alias("meta_keys"),
        F.size(F.map_values("meta")).alias("n_values"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# F-J1 JSON functions (serve R1/R2/R10; props is the events JSON column).
# JSON strings are never compared raw (§2.4 rule 4) — fields are
# extracted on both sides, including from the engine's own to_json.
# ---------------------------------------------------------------------------

_Q09_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field,
  CAST(json_extract_string(
    CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR),
    '$.event_type') AS VARCHAR) AS type_roundtrip
FROM events
ORDER BY event_id
"""


@query("q59_json_functions", oracle=_Q09_ORACLE, tags=("F-J1",))
def q59_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json / to_json round-trip on events.props."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.get_json_object(
            F.to_json(F.struct("event_id", "event_type")), "$.event_type"
        ).alias("type_roundtrip"),
    ).orderBy("event_id")
