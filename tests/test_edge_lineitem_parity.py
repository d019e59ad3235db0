"""Adversarial lineitem parity: decimal boundary values (discount 0
and 0.99, a deliberate x.5-cent rounding TIE from an exactly-
representable 3-decimal tax), quantities exactly on CASE-bucket edges
(10, 25), zero quantity (sqrt(0), division paths), and a ship date on
the year boundary. Every lineitem-only oracle-paired query must agree
with DuckDB — especially the money pipeline's decimal widening and the
HALF_UP-vs-away-from-zero rounding conventions, which coincide on
these inputs and must be SHOWN to."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from etl_spark.plans import REGISTRY


def _d(s: str) -> datetime:
    return datetime.fromisoformat(s)


EDGE_LINEITEM = [
    # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax, rflag, lstatus, shipdate)
    # x.5-cent tie: 0.125 is exactly representable (1/8), *100 = 12.5
    (100, 1, 1, 1, 10.0, 1000.00, 0.00, 0.125, "A", "F", _d("2023-12-31 00:00:00")),
    # discount 0.99 (extreme but legal), bucket edge qty 25
    (100, 2, 1, 2, 25.0, 999.99, 0.99, 0.00, "A", "F", _d("2024-01-01 00:00:00")),
    # zero quantity: sqrt(0), qty_sq 0, 'low' bucket
    (100, 3, 2, 3, 0.0, 0.01, 0.05, 0.05, "N", "O", _d("2024-06-15 00:00:00")),
    # boundary qty just below/above CASE edges
    (200, 4, 2, 1, 9.99, 50.00, 0.10, 0.02, "R", "F", _d("2024-02-29 00:00:00")),
    (200, 5, 3, 2, 24.99, 50.00, 0.10, 0.02, "R", "F", _d("2024-02-29 00:00:00")),
    # duplicate (flag, tax) mass for the deterministic mode tiebreak
    (300, 6, 3, 1, 30.0, 10.00, 0.00, 0.05, "N", "O", _d("2024-03-01 00:00:00")),
    (300, 7, 4, 2, 30.0, 10.00, 0.00, 0.06, "N", "O", _d("2024-03-01 00:00:00")),
    (300, 8, 4, 3, 30.0, 10.00, 0.00, 0.06, "N", "O", _d("2024-03-01 00:00:00")),
    (300, 9, 5, 4, 30.0, 10.00, 0.00, 0.05, "N", "O", _d("2024-03-01 00:00:00")),
]

LINEITEM_QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "scalar_math_lineitem",
    "scalar_case_quantity_bucket",
    "stats_mode_tax",
    "agg_cube_lineitem",
    "unpivot_returnflag_measures",
]


@pytest.fixture(scope="module")
def edge_li_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_lineitem")
    spark.createDataFrame(
        EDGE_LINEITEM,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_li_duck(edge_li_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{edge_li_dir}/lineitem.parquet/*.parquet'"
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


@pytest.mark.parametrize("name", LINEITEM_QUERIES)
def test_edge_lineitem_matches_oracle(spark, edge_li_dir, edge_li_duck, name):
    q = REGISTRY[name]
    got = _normalize(q.builder(spark, edge_li_dir).toPandas())
    want = _normalize(edge_li_duck.execute(q.oracle).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    mismatches = [
        (i, g, w)
        for i, (g, w) in enumerate(zip(got, want))
        if tuple(map(str, g)) != tuple(map(str, w))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
