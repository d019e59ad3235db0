"""AQE must re-plan a sort-merge join into a broadcast join at runtime
when a filtered side turns out small — the mechanism that saves the
fact-fact joins at 100 TB where static size estimates are useless
(the optimizer can't know a predicate's selectivity up front)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from tests.conftest import SF_DIR


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    confs = {
        # Static planner must NOT broadcast (estimates unavailable)...
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # ...but AQE may, from true runtime sizes.
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10485760",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load(spark, SF_DIR, "orders")
        lineitem = load(spark, SF_DIR, "lineitem")
        # The filter keeps a handful of orders — tiny at runtime, but
        # the static planner can't see that with estimates disabled.
        small = orders.filter(F.col("o_totalprice") > 400000)
        joined = lineitem.join(small, lineitem.l_orderkey == small.o_orderkey)

        # Pre-execution: no broadcast planned.
        initial = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in initial and "BroadcastHashJoin" not in initial

        n = len(joined.collect())  # same QueryExecution -> final adaptive plan inspectable
        assert n > 0  # the scenario must actually exercise the join

        # Post-execution: AQE's final plan switched to broadcast.
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in final, final[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
