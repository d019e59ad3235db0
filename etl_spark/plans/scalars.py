"""Scalar function library (SURVEY.md §2.2 "Scalar function library").

String / date / conditional expressions, all built-in `pyspark.sql.
functions` (JVM whole-stage codegen — no Python in the row path).
The reference's only scalar ops are strftime and JSON (I4/I5,
reference main.py:97,108,125,129,157); the rest of the surface is the
standard ANSI library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.plans.registry import register


@register(
    "scalar_string_part",
    oracle="""
    SELECT
      p_partkey,
      upper(p_name)                              AS name_upper,
      CAST(length(p_name) AS INTEGER)            AS name_len,
      substr(p_name, 1, 10)                      AS name_prefix,
      concat(p_brand, '#', p_type)               AS brand_type,
      regexp_extract(p_name, '^(\\w+)', 1)       AS first_word,
      CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
      replace(p_type, ' ', '_')                  AS type_snake
    FROM part
    """,
    doc="String functions: case, length, substring, concat, regex "
        "extract, split, replace.",
    tags=("scalar", "string"),
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "scalar_date_orders_by_month",
    oracle="""
    SELECT
      CAST(year(o_orderdate) AS INTEGER)   AS order_year,
      CAST(month(o_orderdate) AS INTEGER)  AS order_month,
      COUNT(*)                             AS n_orders,
      COUNT(DISTINCT o_custkey)            AS n_customers
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Date part extraction + grouped counts per calendar month.",
    tags=("scalar", "date", "aggregation"),
)
def scalar_date_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "scalar_math_lineitem",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      abs(l_quantity - 25.0)                 AS qty_dev,
      CAST(floor(l_quantity / 10.0) AS BIGINT)       AS qty_decile,
      CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
      round(l_extendedprice / 7.0, 2)   AS price_seventh,
      sqrt(l_quantity)                  AS qty_sqrt,
      l_quantity * l_quantity           AS qty_sq
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Math functions: abs/floor/ceil/round/sqrt (all correctly-"
        "rounded IEEE or exact on these inputs; pow/ln are excluded "
        "from hashed outputs by policy — not correctly rounded).",
    tags=("scalar", "math"),
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.round(F.col("l_extendedprice") / 7.0, 2).alias("price_seventh"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@register(
    "scalar_case_quantity_bucket",
    oracle="""
    SELECT
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 25 THEN 'mid'
           ELSE 'high' END      AS qty_bucket,
      COUNT(*)                  AS n_rows,
      SUM(l_quantity)           AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
    doc="CASE WHEN bucketing + grouped aggregate (constant-folded, "
        "codegen'd conditional).",
    tags=("scalar", "conditional"),
)
def scalar_case_quantity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("high")
        .alias("qty_bucket")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


_STOP = ("the", "a", "of", "and", "to", "in")


@register(
    "scalar_array_ops",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           array_to_string(toks[1:3], ' ')                     AS first3,
           toks[-1]                                            AS last_token,
           COALESCE(list_contains(toks, 'spark'), FALSE)       AS mentions_spark,
           CAST(len(list_intersect(list_distinct(toks),
                                   {list(_STOP)!r})) AS INTEGER)
                                                               AS n_stop_kinds,
           list_sort(list_distinct(toks))[1]                   AS first_sorted,
           CAST(NULLIF(list_position(toks, 'spark'), 0) AS INTEGER)
                                                               AS spark_pos
    FROM t
    ORDER BY doc_id
    """,
    doc="Array scalar library over the token array (SURVEY.md §2.2 "
        "scalar library, array row): slice/join, negative indexing, "
        "membership, set intersection, sort-then-index, position — all "
        "in-row built-ins in both engines (Spark slice/element_at/"
        "array_contains/array_intersect/array_sort/array_position vs "
        "DuckDB list_*). Zero shuffles beyond the presentation sort; "
        "the whole query is a narrow map at any scale.",
    tags=("scalar", "array", "text"),
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    # array_position returns 0 when absent (matches DuckDB NULL? no —
    # DuckDB list_position yields NULL when absent; align via nullif).
    pos = F.array_position(toks, "spark")
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
            F.element_at(toks, -1).alias("last_token"),
            F.coalesce(F.array_contains(toks, "spark"), F.lit(False)).alias(
                "mentions_spark"
            ),
            F.size(
                F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOP]))
            ).alias("n_stop_kinds"),
            F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias(
                "first_sorted"
            ),
            F.nullif(pos, F.lit(0)).cast("int").alias("spark_pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "scalar_try_safe_ops",
    oracle="""
    WITH q AS (
      SELECT event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CAST(event_id AS VARCHAR) AS id_str
      FROM events
    )
    SELECT event_id,
           TRY_CAST(id_str AS BIGINT)               AS parsed_id,
           TRY_CAST(concat('x', id_str) AS BIGINT)  AS parsed_junk,
           CAST(cents / k AS DOUBLE)                AS cents_per_k,
           cents % NULLIF(k, 0)                     AS cents_mod_k,
           TRY_CAST('not a time' AS TIMESTAMP) IS NULL AS bad_ts_is_null
    FROM q
    ORDER BY event_id
    """,
    doc="Error-safe scalar surface (ANSI mode without the blast "
        "radius): try_cast on clean and junk strings, division and "
        "modulo by a sometimes-zero divisor yielding NULL instead of "
        "aborting the job — Spark try_divide/try_mod paired with "
        "DuckDB's NULL-on-zero division. At 100 TB one malformed row "
        "must never kill a stage; this is the pattern every ingest "
        "projection uses. Pure narrow map.",
    tags=("scalar", "null-handling"),
)
def scalar_try_safe_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.col("event_id").cast("string").alias("id_str"),
    )
    return q.select(
        "event_id",
        F.try_to_number(F.col("id_str"), F.lit("999999999999")).cast(
            "bigint"
        ).alias("parsed_id"),
        F.expr("try_cast(concat('x', id_str) AS BIGINT)").alias("parsed_junk"),
        F.try_divide(F.col("cents"), F.col("k")).cast("double").alias(
            "cents_per_k"
        ),
        F.expr("try_mod(cents, nullif(k, 0))").alias("cents_mod_k"),
        F.expr("try_cast('not a time' AS TIMESTAMP)").isNull().alias(
            "bad_ts_is_null"
        ),
    ).orderBy("event_id")
