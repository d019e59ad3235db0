"""Fences for stats_winsorized_value (plans/stats.py): the invariants
winsorizing must hold, which row-hash parity with the oracle cannot
distinguish from a lucky clamp."""

from __future__ import annotations

from etl_spark.plans.stats import WINSOR_HI, WINSOR_LO, stats_winsorized_value
from tests.conftest import SF_DIR


def test_winsorized_invariants(spark, duck):
    rows = {r["event_type"]: r for r in stats_winsorized_value(spark, SF_DIR).collect()}
    raw = {
        t: (lo, hi, n)
        for t, lo, hi, n in duck.execute(
            "SELECT event_type, MIN(value), MAX(value), COUNT(*) "
            "FROM events GROUP BY 1"
        ).fetchall()
    }
    assert rows.keys() == raw.keys()
    for t, r in rows.items():
        vmin, vmax, n = raw[t]
        assert r["n"] == n
        # cuts sit inside the data range, in order
        assert vmin <= r["p_lo"] <= r["p_hi"] <= vmax
        # the winsorized mean lies within the clamp interval
        assert r["p_lo"] <= r["winsorized_mean"] <= r["p_hi"]
        # clamp fractions approximate the tail masses (interpolated
        # cut => strictly-below count is at most the tail, and within
        # one rank of it)
        assert r["n_clamped_lo"] <= WINSOR_LO * n + 1
        assert r["n_clamped_hi"] <= (1 - WINSOR_HI) * n + 1
        assert r["n_clamped_lo"] >= WINSOR_LO * n - 1
        assert r["n_clamped_hi"] >= (1 - WINSOR_HI) * n - 1
        # fixture must actually exercise both clamps
        assert r["n_clamped_lo"] > 0 and r["n_clamped_hi"] > 0


def test_winsorizing_is_idempotent(spark, duck):
    """Clamping already-clamped data is a no-op: the winsorized mean of
    the clamped column equals itself when re-clamped at the same cuts."""
    rows = stats_winsorized_value(spark, SF_DIR).collect()
    for r in rows:
        got = duck.execute(
            f"""
            SELECT SUM(CAST(LEAST(GREATEST(
                     LEAST(GREATEST(value, {r['p_lo']!r}), {r['p_hi']!r}),
                   {r['p_lo']!r}), {r['p_hi']!r}) AS DECIMAL(18,6)))
                   / COUNT(*)
            FROM events WHERE event_type = '{r['event_type']}'
            """
        ).fetchone()[0]
        assert abs(float(got) - r["winsorized_mean"]) < 1e-9
