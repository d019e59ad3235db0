"""Adversarial events-table parity: identical timestamps (window
tiebreaks), events exactly on hour/day/session-gap boundaries, NULL
value/props, negative and out-of-bucket values — every oracle-paired
events query must agree with DuckDB on them.

Deliberately excluded: malformed JSON in props. Spark's
get_json_object returns NULL for it (the behavior the engine wants at
100 TB — bad rows degrade, PERMISSIVE-style) while DuckDB's
json_extract_string raises InvalidInputException outright, so no
oracle can pair it; tests/test_robustness.py covers the degrade path.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from etl_spark.plans import REGISTRY

D = "2024-03-01"


def _ts(t: str, day: str = D) -> datetime:
    return datetime.fromisoformat(f"{day} {t}")


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # -- user 1: boundary + tiebreak battery
    (50, _ts("10:00:00"), 1, "click", 1.5, '{"k": 3}'),
    (100, _ts("09:59:59.999999"), 1, "click", 2.5, '{"k": 4}'),
    # same ts as event 50, higher id → latest/asof must tiebreak on id
    (150, _ts("10:00:00"), 1, "click", 0.5, "{}"),
    # 9:59.999999 after the 10:00 pair → inside the 10-min session gap
    (200, _ts("10:09:59.999999"), 1, "view", None, None),
    # EXACTLY the 10-min gap after event 200: session_window's merge
    # test is inclusive (start <= previous end), so BOTH session forms
    # keep it in-session — the boundary that exposed round 3's oracle
    # bug (it assumed >= splits here; Spark merges)
    (250, _ts("10:19:59.999999"), 1, "view", 1.0, None),
    # one microsecond PAST the gap after event 250 → splits in both
    (275, _ts("10:30:00"), 1, "view", 2.0, None),
    # -- user 2: day boundary + negative values (below every bucket)
    (300, _ts("10:00:00"), 2, "purchase", -3.75, '{"k": -7}'),
    (350, _ts("23:59:59.999999"), 2, "error", 0.0, '{"k": 0}'),
    (400, _ts("00:00:00", "2024-03-02"), 2, "error", 99.999999, '{"k": 9}'),
    # -- user 3: singleton; props present but key $.k absent
    (450, _ts("12:30:00"), 3, "signup", 0.000001, '{"j": 2}'),
    # an error with no preceding click: asof must null-extend
    (500, _ts("08:00:00"), 4, "error", 5.0, '{"k": 1}'),
]

EVENT_QUERIES = [
    "events_json_props",
    "events_props_map_funcs",
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_sessionize",
    "events_session_window_native",
    "events_latest_per_user_type",
    "events_asof_click_before_error",
    "pivot_user_event_counts",
    "agg_collect_events",
    "agg_salted_event_counts",
    "range_join_value_buckets",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "agg_value_histogram",
    "udaf_weighted_value_mean",
    "events_ewma_hourly",
    "events_rolling_zscore",
    "events_error_click_followup",
    "events_user_lifecycle",
    "stats_linfit_value_on_k",
    "stats_bool_bit_events",
    "scalar_try_safe_ops",
    "events_activity_heatmap",
    "events_signup_to_purchase",
    "events_stickiness_monthly",
    "events_error_rate_hourly",
]


@pytest.fixture(scope="module")
def edge_ev_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    spark.createDataFrame(
        EDGE_EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_ev_duck(edge_ev_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{edge_ev_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(spark, edge_ev_dir, edge_ev_duck, name):
    q = REGISTRY[name]
    spdf = q.builder(spark, edge_ev_dir).toPandas()
    ddf = edge_ev_duck.execute(q.oracle).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} vs {len(ddf)} rows"
    cols = sorted(spdf.columns)
    a = sorted(map(tuple, spdf[cols].astype(str).values.tolist()))
    b = sorted(map(tuple, ddf[cols].astype(str).values.tolist()))
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches " + "; ".join(
        f"spark={a[i]} duck={b[i]}" for i in mism
    )


def test_session_gap_boundary_semantics(spark, edge_ev_dir):
    # An event EXACTLY gap after its predecessor merges (session
    # window intervals are closed at the gap boundary); one
    # microsecond past the gap splits. Both session formulations must
    # agree on this.
    sess = [
        r["n_events"]
        for r in REGISTRY["events_sessionize"].builder(spark, edge_ev_dir).collect()
        if r["user_id"] == 1
    ]
    native = [
        r["n_events"]
        for r in REGISTRY["events_session_window_native"]
        .builder(spark, edge_ev_dir)
        .collect()
        if r["user_id"] == 1
    ]
    assert sorted(sess) == sorted(native) == [1, 5]
