"""thumbnail_features fences beyond oracle parity: exact 2x2 floor-
mean block math against a pure-python reference, odd row/column crop,
container-blindness (same image as BMP and PNG downsamples
identically), the order-sensitivity of the weighted checksum, and
too-small grids emitting nothing."""

from __future__ import annotations

from etl_spark.operators.media import (
    BMP_WIDTH,
    build_bmp,
    build_png,
    thumbnail_features,
)


def _reference(gray: bytes) -> tuple:
    w = BMP_WIDTH
    h = len(gray) // w
    g = [list(gray[y * w : (y + 1) * w]) for y in range(h)]
    h2, w2 = h // 2, w // 2
    flat = [
        (g[2 * r][2 * c] + g[2 * r][2 * c + 1]
         + g[2 * r + 1][2 * c] + g[2 * r + 1][2 * c + 1]) // 4
        for r in range(h2)
        for c in range(w2)
    ]
    return (
        w2, h2, sum(flat), sum((i + 1) * v for i, v in enumerate(flat)),
    )


def test_box_downsample_matches_reference_and_containers_agree(spark):
    texts = [
        ("the quick brown fox jumps over the lazy dog " * 6).encode(),
        bytes(range(32, 127)) * 3,          # ramp: every block distinct
        b"\x20" * (BMP_WIDTH * 5),          # constant + odd row cropped
    ]
    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, build_bmp(t)))      # same image, two
        rows.append((2 * i + 1, build_png(t)))  # containers
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: (r["out_w"], r["out_h"], r["luma_sum"], r["luma_wsum"])
           for r in thumbnail_features(df).collect()}
    for i, t in enumerate(texts):
        n = (len(t) // BMP_WIDTH) * BMP_WIDTH
        want = _reference(t[:n])
        assert got[2 * i] == want, ("bmp", i)
        assert got[2 * i + 1] == want, ("png", i)


def test_weighted_checksum_is_order_sensitive():
    # Two grids with identical pixel MULTISETS but different layouts
    # must produce different weighted checksums — the property that
    # makes a mis-strided downsample detectable.
    a = bytes([10] * BMP_WIDTH * 2 + [20] * BMP_WIDTH * 2)
    b = bytes([20] * BMP_WIDTH * 2 + [10] * BMP_WIDTH * 2)
    ra, rb = _reference(a), _reference(b)
    assert ra[2] == rb[2]      # same luma_sum
    assert ra[3] != rb[3]      # different weighted sum


def test_single_row_image_emits_nothing(spark):
    # h = 1 -> h2 = 0: no downsampled rows exist; the stage must skip
    # the doc, not emit a zero-geometry row.
    df = spark.createDataFrame(
        [(1, build_bmp(b"z" * BMP_WIDTH)), (2, build_bmp(b"y" * BMP_WIDTH * 2))],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"] for r in thumbnail_features(df).collect()}
    assert got == {2}


def test_non_raster_payload_fails_loudly(spark):
    # thumbnail_features must not blindly struct-parse arbitrary bytes
    # as a BMP header — unknown magic raises, garbage never decodes.
    import pytest
    from pyspark.errors import PythonException

    df = spark.createDataFrame(
        [(1, b"\x00" * 200)], "doc_id bigint, payload binary"
    )
    with pytest.raises(PythonException, match="expects a BMP or PNG"):
        thumbnail_features(df).collect()
