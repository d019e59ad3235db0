"""Sketch-accuracy bound: approx_count_distinct must stay within its
configured relative error of the exact distinct counts."""

from __future__ import annotations

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in REGISTRY["agg_approx_distinct"].builder(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n_customers"]
        for r in REGISTRY["agg_distinct_priority"].builder(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for prio, n in exact.items():
        # rsd=0.02 → allow 5 sigma plus integer slack.
        assert abs(approx[prio] - n) <= max(3, 0.1 * n), (prio, approx[prio], n)
