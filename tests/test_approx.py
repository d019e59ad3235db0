"""Sketch-accuracy bound: approx_count_distinct must stay within its
configured relative error of the exact distinct counts."""

from __future__ import annotations

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_approx_percentiles_within_rank_error(spark):
    # percentile_approx(accuracy=10000) guarantees a value whose rank
    # is within n/accuracy of the target rank; verify against the rank
    # range implied by the per-status sorted values.
    rows = REGISTRY["agg_approx_percentiles"].builder(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    by_status = {
        r["o_orderstatus"]: r
        for r in rows
    }
    for status, r in by_status.items():
        vals = sorted(
            x["o_totalprice"]
            for x in orders.filter(orders.o_orderstatus == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        assert r["n_orders"] == n
        for pct, col in ((0.5, "approx_p50_price"), (0.9, "approx_p90_price")):
            target = int(pct * (n - 1))
            slack = max(2, n // 10_000 + 1)
            lo = vals[max(0, target - slack)]
            hi = vals[min(n - 1, target + slack)]
            assert lo <= r[col] <= hi, (status, col, r[col], lo, hi)


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


def test_approx_rolling_dau_within_rsd(spark):
    approx = {
        r["day"]: r["active_users_7d_approx"]
        for r in REGISTRY["events_rolling_7d_active_users_approx"]
        .builder(spark, SF_DIR)
        .collect()
    }
    exact = {
        r["day"]: r["active_users_7d"]
        for r in REGISTRY["events_rolling_7d_active_users"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        # rsd=0.02 → allow 5 sigma plus integer slack.
        assert abs(approx[day] - n) <= max(3, 0.1 * n), (day, approx[day], n)
