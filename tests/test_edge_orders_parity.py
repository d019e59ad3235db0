"""Adversarial orders-table parity: exact price TIES (arg-max and
NTILE tiebreaks), single-row groups (degenerate percentiles), a zero
and a negative price, same-day multi-orders, and a Dec→Jan year
boundary (monthly growth LAG) — every orders-only oracle-paired query
must agree with DuckDB on them. The tie and single-row cases are the
ones generated fixture data essentially never produces."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from etl_spark.plans import REGISTRY


def _d(s: str) -> datetime:
    return datetime.fromisoformat(s)


EDGE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    # -- P1: three-way EXACT price tie; arg-max must take highest key,
    #    arg-min the lowest; NTILE ordering falls back to orderkey.
    (1, 10, "O", 1000.00, _d("2023-12-30 00:00:00"), "1-URGENT"),
    (2, 10, "O", 1000.00, _d("2023-12-30 00:00:00"), "1-URGENT"),
    (3, 11, "F", 1000.00, _d("2023-12-31 00:00:00"), "1-URGENT"),
    # -- P2: singleton group, zero price (degenerate percentile/ntile)
    (4, 12, "F", 0.00, _d("2024-01-01 00:00:00"), "2-HIGH"),
    # -- P3: negative price (refund-shaped) + a normal one
    (5, 13, "P", -50.25, _d("2024-01-15 00:00:00"), "3-MEDIUM"),
    (6, 13, "O", 250.75, _d("2024-01-15 00:00:00"), "3-MEDIUM"),
    # -- customer 10: many orders, some same-day (gap-days tiebreak)
    (7, 10, "F", 10.10, _d("2024-01-31 00:00:00"), "4-NOT SPECIFIED"),
    (8, 10, "O", 20.20, _d("2024-02-29 00:00:00"), "5-LOW"),  # leap day
    (9, 14, "O", 30.30, _d("2024-02-29 00:00:00"), "5-LOW"),
]

ORDERS_QUERIES = [
    "stats_minmax_by_priority",
    "agg_equidepth_deciles",
    "agg_percentile_disc",
    "agg_percentiles",
    "top_k_orders",
    "orders_monthly_revenue_growth",
    "customer_revenue_pareto",
    "scalar_date_orders_by_month",
    "agg_rollup_orders",
    "agg_grouping_sets_status_priority",
    "agg_distinct_priority",
    "window_running_spend",
    "window_order_gap_days",
    "window_lead_next_order",
    "window_rolling_30d_spend",
    "window_rank_family_orders",
    "customer_rfm_segments",
]


@pytest.fixture(scope="module")
def edge_ord_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_orders")
    spark.createDataFrame(
        EDGE_ORDERS,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_ord_duck(edge_ord_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{edge_ord_dir}/orders.parquet/*.parquet'"
    )
    yield con
    con.close()


def _normalize(df):
    df = df[sorted(df.columns)]

    def key(row):
        return tuple((v is None or v != v, str(v)) for v in row)

    return sorted(
        (tuple(r) for r in df.itertuples(index=False, name=None)), key=key
    )


@pytest.mark.parametrize("name", ORDERS_QUERIES)
def test_edge_orders_match_oracle(spark, edge_ord_dir, edge_ord_duck, name):
    q = REGISTRY[name]
    got = _normalize(q.builder(spark, edge_ord_dir).toPandas())
    want = _normalize(edge_ord_duck.execute(q.oracle).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    mismatches = [
        (i, g, w)
        for i, (g, w) in enumerate(zip(got, want))
        if tuple(map(str, g)) != tuple(map(str, w))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
