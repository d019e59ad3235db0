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
    "events_rolling_7d_active_users":    "broadcast day dim (calendar-bounded)",
    "events_rolling_7d_active_users_approx": "broadcast day dim (calendar-bounded)",
    "q11_part_value_share":              "1-row global-threshold scalar",
    "q22_idle_rich_customers":           "1-row average-threshold scalar",
    "sample_mixture_weights":            "1-row corpus total + k-language weights",
    "emb_label_centroid_sim":            "k x k label-centroid pairs (k = #labels)",
    "ml_cluster_separation":             "broadcast k-row centroid table",
    "graph_dup_triangles":               "crossJoin of two 1-row aggregates",
    "text_vocab_growth":                 "1-row corpus-bounds scalar",
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
