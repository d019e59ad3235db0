"""Z-order layout: multi-column zone-map pruning, measured.

A layout sorted on column A alone gives perfect file zones on A and
useless zones on B; the Z-curve interleave must yield usable zones on
BOTH, so a B-only (or A+B box) predicate skips files the single-sort
layout cannot. Counts are measured from the real parquet footers via
the same zone arithmetic a skipping reader applies."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.operators.layout import (
    file_zones,
    write_sorted_layout,
    write_zorder_layout,
    zones_overlapping,
)
from tests.conftest import SF_DIR

N_FILES = 16


def _box_files(path: str, preds: dict[str, tuple[float, float]]) -> set:
    """Files a conjunctive range scan must read: the intersection of
    each per-column zone overlap — exactly how a stats-consulting
    reader evaluates an AND of range predicates."""
    needed = None
    for col, (lo, hi) in preds.items():
        zones = file_zones(path, col)
        assert zones, f"no stats for {col}"
        hit = set(zones_overlapping(zones, lo, hi))
        needed = hit if needed is None else needed & hit
    return needed


def test_zorder_prunes_both_columns_sorted_prunes_one(spark, tmp_path):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_price")
    write_zorder_layout(li, zpath, ["l_extendedprice", "l_partkey"], N_FILES)
    write_sorted_layout(li, spath, "l_extendedprice", N_FILES)

    # A window inside one partkey quartile: with 16 files ~ a 4x4
    # quartile grid on the z-curve, an in-quartile window touches one
    # grid row (4 files) plus range-partitioner boundary spill —
    # measured 7 of 16 here; a quartile-straddling window reads ~11.
    pk_lo, pk_hi = li.stat.approxQuantile("l_partkey", [0.3, 0.35], 0.0)
    price_lo, price_hi = li.stat.approxQuantile(
        "l_extendedprice", [0.3, 0.35], 0.0
    )

    # B-only predicate: the single-sort layout can skip nothing.
    b_only = {"l_partkey": (pk_lo, pk_hi)}
    sorted_b = _box_files(spath, b_only)
    zorder_b = _box_files(zpath, b_only)
    assert len(sorted_b) == N_FILES, "price-sorted files should all overlap"
    assert len(zorder_b) <= N_FILES // 2, (
        f"z-order skipped only {N_FILES - len(zorder_b)} files on the "
        "second column"
    )

    # A-only predicate: z-order still prunes (looser than pure sort).
    a_only = {"l_extendedprice": (price_lo, price_hi)}
    assert len(_box_files(spath, a_only)) <= 3
    assert len(_box_files(zpath, a_only)) <= N_FILES // 2

    # 2-D box: the AND of both range predicates can only shrink each
    # one-column hit set; with both windows narrow the z-layout reads
    # a small corner of the grid. (A single-sort layout can still win
    # the box outright when the predicate on ITS column is this tight
    # — z-order's value is the B-only/most-boxes case, not every box.)
    box = {**a_only, **b_only}
    zorder_box = _box_files(zpath, box)
    assert zorder_box <= _box_files(zpath, a_only)
    assert zorder_box <= zorder_b
    assert len(zorder_box) <= N_FILES // 4


def test_zorder_layout_preserves_data_exactly(spark, tmp_path):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )
    zpath = str(tmp_path / "zorder_rt")
    write_zorder_layout(li, zpath, ["l_extendedprice", "l_partkey"], N_FILES)
    back = spark.read.parquet(zpath)
    assert sorted(back.columns) == sorted(li.columns)
    assert back.count() == li.count()
    # Content-identical: symmetric difference on full rows is empty.
    assert back.exceptAll(li).count() == 0
    assert li.exceptAll(back).count() == 0


def test_zorder_pushdown_row_count_matches(spark, tmp_path):
    # The skipping path must not change results: a filtered read over
    # the z-ordered files equals the same filter over the original.
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    zpath = str(tmp_path / "zorder_q")
    write_zorder_layout(li, zpath, ["l_extendedprice", "l_partkey"], N_FILES)
    pk_lo, pk_hi = li.stat.approxQuantile("l_partkey", [0.4, 0.5], 0.0)
    cond = (F.col("l_partkey") >= pk_lo) & (F.col("l_partkey") <= pk_hi)
    assert (
        spark.read.parquet(zpath).filter(cond).count()
        == li.filter(cond).count()
    )


def test_zorder_bits_ceiling_guard(spark):
    # The bucket lookup is O(2^bits) per row via the literal-boundary
    # aggregate; the guard keeps a casual bits bump from silently
    # exploding per-row cost.
    import pytest

    from etl_spark.operators.layout import zorder_column

    df = spark.range(10).selectExpr("id AS a", "id * 2 AS b")
    with pytest.raises(ValueError, match="ceiling"):
        zorder_column(df, ["a", "b"], bits=13)
