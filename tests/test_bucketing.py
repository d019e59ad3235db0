"""Bucketed co-located join: same-key bucketed tables must join with
NO exchange in the physical plan (the pre-shuffled layout is the
point), and results must match the plain join."""

from __future__ import annotations

import pytest

from etl_spark.io import load
from etl_spark.operators.bucketing import read_table, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture
def bucketed_tables(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    customer = load(spark, SF_DIR, "customer")
    write_bucketed(orders, "b_orders", str(tmp_path / "b_orders"), "o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        str(tmp_path / "b_customer"),
        "o_custkey",
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, t_orders).join(
            read_table(spark, t_customer), "o_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # Same answer as the unbucketed join.
        plain = load(spark, SF_DIR, "orders").join(
            load(spark, SF_DIR, "customer").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
