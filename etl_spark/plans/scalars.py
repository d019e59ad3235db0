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
