"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real code lives in ``etl_spark``; this module only adapts the
registry (etl_spark/plans/registry.py) to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.io import SMOKE_SF_DIR
from etl_spark.plans import REGISTRY
from etl_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1 pricing summary) on /root/testdata/sf0.001."""
    tune_session(spark)
    return REGISTRY["q1_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return builder(spark, sf_dir)

        return run

    return {name: wrap(q.builder) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
