"""Set operations (SURVEY.md §2.2 "Set ops").

The reference's only set op is union-as-chain (itertools.chain,
reference main.py:140, S15); intersect/except come from the ANSI
surface. All three use DISTINCT semantics to match SQL defaults
(Spark's df.union is UNION ALL, so distinct() is applied explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.plans.registry import register


def _custkeys_by_status(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "setop_union_active_or_finished",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="UNION (distinct) of two filtered key sets — the relational form "
        "of the reference's chain-union across repos (S15, main.py:140).",
    tags=("setop",),
)
def setop_union_active_or_finished(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _custkeys_by_status(spark, sf_dir, "O")
    f = _custkeys_by_status(spark, sf_dir, "F")
    return o.union(f).distinct()


@register(
    "setop_intersect_both_statuses",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT: customers with both an open and a finished order.",
    tags=("setop",),
)
def setop_intersect_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _custkeys_by_status(spark, sf_dir, "O")
    f = _custkeys_by_status(spark, sf_dir, "F")
    return o.intersect(f)


@register(
    "setop_except_only_open",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT: customers with open orders but no finished ones.",
    tags=("setop",),
)
def setop_except_only_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _custkeys_by_status(spark, sf_dir, "O")
    f = _custkeys_by_status(spark, sf_dir, "F")
    return o.subtract(f)  # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity)


@register(
    "setop_intersect_all_orders",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL (multiset): keeps min(multiplicity) copies per "
        "key — the bag-semantics counterpart of setop_intersect.",
    tags=("setop",),
)
def setop_intersect_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _custkeys_by_status(spark, sf_dir, "O")
    f = _custkeys_by_status(spark, sf_dir, "F")
    return o.intersectAll(f)


@register(
    "setop_union_by_name",
    oracle="""
    SELECT o_custkey AS custkey, o_orderstatus AS status, o_totalprice AS price
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey, o_orderstatus, CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="unionByName with allowMissingColumns: the schema-drift-safe "
        "union for long-lived pipelines — the second input arrives with "
        "reordered columns and without `price`, and is aligned by NAME "
        "(positional union would silently cross-wire custkey/status). "
        "Missing columns null-fill, matching the SQL NULL projection.",
    tags=("setop", "schema-drift"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    # Simulated drifted producer: columns reordered, `price` absent.
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("custkey"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "setop_except_all_orders",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (multiset): subtracts multiplicities instead of "
        "removing keys outright.",
    tags=("setop",),
)
def setop_except_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _custkeys_by_status(spark, sf_dir, "O")
    f = _custkeys_by_status(spark, sf_dir, "F")
    return o.exceptAll(f)
