"""Edge fences for the round-7 late additions, beyond oracle parity.

events_hourly_interp: hand-built gaps with known straight-line
answers, exact floor semantics, and the no-extrapolation contract
(hours outside a type's own observed range stay NULL even though the
global spine covers them).

pipeline_curate_multimodal: the same image stored as a BMP and as a
PNG must collapse into ONE canonical row (cross-container dedup on
the decoded pixel grid — the thing payload-byte hashing cannot do),
and the quality gates must actually drop what they claim to drop."""

from __future__ import annotations

import datetime

from etl_spark.operators.media import BMP_WIDTH
from etl_spark.plans import REGISTRY
from etl_spark.plans.multimodal import (
    MM_CURATE_LUMA_HI,
    MM_CURATE_MIN_PIXELS,
)


def _ts(h: int) -> datetime.datetime:
    return datetime.datetime(2025, 3, 1, h, 30, 0)


def test_interp_straight_line_floor_and_no_extrapolation(spark, tmp_path):
    # type "a": observed h0 (cnt 2) and h3 (cnt 8) -> gap hours h1, h2
    # interpolate to floor(2 + (8-2)*k/3) = 4, 6.
    # type "b": observed h2 only -> every other spine hour is outside
    # its range and must stay NULL (no extrapolation).
    rows = []
    eid = 0
    for h, n in ((0, 2), (3, 8)):
        for _ in range(n):
            rows.append((eid, 1, "a", _ts(h), 1.0))
            eid += 1
    rows.append((eid, 1, "b", _ts(2), 1.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        (r["event_type"], r["hour_start"][11:13]): (
            r["observed"], r["interp_cnt"],
        )
        for r in REGISTRY["events_hourly_interp"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert out[("a", "00")] == (1, 2)
    assert out[("a", "01")] == (0, 4)
    assert out[("a", "02")] == (0, 6)
    assert out[("a", "03")] == (1, 8)
    assert out[("b", "02")] == (1, 1)
    for h in ("00", "01", "03"):
        assert out[("b", h)] == (0, None), h  # outside b's range


def test_interp_floor_is_exact_not_rounded(spark, tmp_path):
    # 1 -> 2 over a 3-hour gap: true line hits 1.33 and 1.67; floor
    # semantics must give 1 and 1 (a float round would give 1 and 2).
    rows = [(0, 1, "a", _ts(0), 1.0)]
    rows += [(i + 1, 1, "a", _ts(3), 1.0) for i in range(2)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r["hour_start"][11:13]: r["interp_cnt"]
        for r in REGISTRY["events_hourly_interp"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert (out["01"], out["02"]) == (1, 1)


def test_mm_curate_cross_container_dedup_and_gates(spark, tmp_path):
    # doc 2 (even -> BMP) and doc 3 (odd -> PNG) carry the SAME text:
    # identical decoded pixels, one canonical row with n_copies=2.
    # doc 4 is below the resolution floor; doc 6 is all-0xFF-like
    # (mean luma above the band) — both must be dropped.
    good = "the same image in two containers " * 12  # >= MIN_PIXELS
    assert len(good) // BMP_WIDTH * BMP_WIDTH >= MM_CURATE_MIN_PIXELS
    tiny = "x" * BMP_WIDTH  # one row: below the resolution floor
    bright = chr(MM_CURATE_LUMA_HI + 1) * (MM_CURATE_MIN_PIXELS + BMP_WIDTH)
    rows = [
        (2, good, "en", "s", len(good)),
        (3, good, "en", "s", len(good)),
        (4, tiny, "en", "s", len(tiny)),
        (6, bright, "en", "s", len(bright)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = REGISTRY["pipeline_curate_multimodal"].builder(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["canonical_id"] == 2 and r["n_copies"] == 2
    n = len(good) // BMP_WIDTH * BMP_WIDTH
    assert r["n_pixels"] == n
    assert r["luma_sum"] == sum(good.encode()[:n])
