"""Engine-wide plan invariant: NO CartesianProduct in any registered
query, ever — and BroadcastNestedLoopJoin only where the nested-loop
side is config-sized (documented per query below). A data x data
nested loop is the one plan shape that cannot survive scale; this test
is the regression fence around every future query addition."""

from __future__ import annotations

import pytest

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR

# BNLJ is legitimate ONLY when one side is bounded by configuration,
# not by data volume. Every entry documents its bounded side.
BNLJ_ALLOWED = {
    "range_join_value_buckets":          "broadcast band dim (fixed bucket list)",
    "events_hourly_gapfill":             "hour x type spine (calendar-bounded)",
    "events_hourly_locf":                "hour x type spine (calendar-bounded)",
    "events_hourly_interp":              "hour x type spine (calendar-bounded)",
    "events_rolling_7d_active_users":    "broadcast day dim (calendar-bounded)",
    "events_rolling_7d_active_users_approx": "broadcast day dim (calendar-bounded)",
    "q11_part_value_share":              "1-row global-threshold scalar",
    "q22_idle_rich_customers":           "1-row average-threshold scalar",
    "sample_mixture_weights":            "1-row corpus total + k-language weights",
    "sample_domain_reweight_step":       "1-row corpus scalars + k-language weights",
    "curation_epoch_expand":             "1-row global-max scalar + k-language epoch factors",
    "pipeline_build_training_mix":       "1-row global-max scalar + k-language epoch factors",
    "curation_train_val_split":          "1-row exact-dup leak-counter scalar",
    "emb_label_centroid_sim":            "k x k label-centroid pairs (k = #labels)",
    "ml_cluster_separation":             "broadcast k-row centroid table",
    "graph_dup_triangles":               "crossJoin of two 1-row aggregates",
    "text_vocab_growth":                 "1-row corpus-bounds scalar",
    "text_bm25_rank":                    "1-row corpus-stats scalar",
    "dq_freshness_by_source":            "1-row global-freshness scalar",
    "pipeline_incremental_refresh":      "1-row global-day scalar",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unbounded_nested_loops(spark, name):
    plan = (
        REGISTRY[name]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, (
            f"{name}: BroadcastNestedLoopJoin outside the documented "
            "allowlist — if the nested-loop side is config-sized, add "
            "it with a justification; if it is data-sized, fix the plan"
        )


# An unpartitioned window (WindowExec with an empty partitionSpec)
# requires AllTuples — Spark moves EVERY row to one task ("WindowExec:
# No Partition Defined ... Moving all data to a single partition").
# That is the second plan shape that cannot survive scale; it is
# legitimate ONLY over a config-bounded input. Every entry documents
# why its windowed input cannot grow with the data.
GLOBAL_WINDOW_ALLOWED = {
    "text_zipf_fit":                 "top-100 terms (fixed K) ranked globally",
    "text_vocab_growth":             "10 corpus-fraction buckets (fixed)",
    "orders_monthly_revenue_growth": "one row per month (calendar-bounded)",
    "text_bm25_rank":                "rank over the TakeOrdered top-20 only",
    "orders_open_backlog_daily":     "cumsum over the day-grain deltas (calendar-bounded)",
}

_WINDOW_NODE_CLASSES = {
    "WindowExec",
    "WindowInPandasExec",
    "WindowGroupLimitExec",
}


def _iter_physical_nodes(jnode):
    """Walk a physical plan tree via py4j, descending through the AQE
    wrapper and into subquery plans."""
    yield jnode
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_physical_nodes(jnode.initialPlan())
        return
    subq = jnode.subqueries().iterator()
    while subq.hasNext():
        yield from _iter_physical_nodes(subq.next())
    it = jnode.children().iterator()
    while it.hasNext():
        yield from _iter_physical_nodes(it.next())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_single_partition_windows(spark, name):
    plan = (
        REGISTRY[name]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
    )
    offenders = [
        node.getClass().getSimpleName()
        for node in _iter_physical_nodes(plan)
        if node.getClass().getSimpleName() in _WINDOW_NODE_CLASSES
        and node.partitionSpec().isEmpty()
    ]
    if offenders:
        assert name in GLOBAL_WINDOW_ALLOWED, (
            f"{name}: unpartitioned {offenders} moves all rows to one "
            "task — use operators/ranking.py (two-phase prefix rank) "
            "for data-sized input, or add a justification here if the "
            "input is genuinely config-bounded"
        )
