"""Sketch-accuracy bounds: the raw sketch forms must stay within
their configured error of the exact values, and the REGISTERED
bounded-verdict twins (which hash-check that contract against the
DuckDB oracle) must come back all-TRUE."""

from __future__ import annotations

from etl_spark.plans import REGISTRY
from etl_spark.plans.analytics import events_rolling_7d_active_users_approx_raw
from etl_spark.plans.frames import agg_approx_percentiles_raw
from etl_spark.plans.relational import agg_approx_distinct_raw
from tests.conftest import SF_DIR


def test_approx_percentiles_within_rank_error(spark):
    # percentile_approx(accuracy=10000) guarantees a value whose rank
    # is within n/accuracy of the target rank; verify against the rank
    # range implied by the per-status sorted values.
    rows = agg_approx_percentiles_raw(spark, SF_DIR).collect()
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
        for r in agg_approx_distinct_raw(spark, SF_DIR).collect()
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
        for r in events_rolling_7d_active_users_approx_raw(
            spark, SF_DIR
        ).collect()
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


def test_verdict_forms_all_within_bound(spark):
    """The registered bounded-verdict twins: every group's in-plan
    verdict must be TRUE (the oracle hash-compare requires exactly
    this, but pin it in pytest too so a red shows up with the failing
    group, not as a value-hash mismatch)."""
    for name, exact_col in (
        ("agg_approx_distinct", "n_customers"),
        ("agg_approx_percentiles", "p50_disc"),
        ("events_rolling_7d_active_users_approx", "active_users_7d"),
    ):
        rows = REGISTRY[name].builder(spark, SF_DIR).collect()
        assert rows, name
        for r in rows:
            assert r["within_bound"] is True, (name, r)
            assert r[exact_col] is not None, (name, r)
