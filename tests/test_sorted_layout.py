"""Zone-map data skipping: range-clustered parquet layout must yield
disjoint per-file min/max stats so selective range scans skip most
files, while a randomly-partitioned layout forces every file to be
read. The footer statistics checked here are exactly what Spark's
parquet reader consults before decompressing a row group — tight
zones ARE the skipping receipt."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.operators.layout import (
    file_zones,
    read_with_skipping,
    write_sorted_layout,
    zones_overlapping,
)
from tests.conftest import SF_DIR

N_FILES = 8


def test_sorted_layout_skips_files_random_layout_cannot(spark, tmp_path):
    events = load(spark, SF_DIR, "events").filter(F.col("value").isNotNull())

    random_path = str(tmp_path / "events_random")
    events.repartition(N_FILES).write.mode("overwrite").parquet(random_path)
    sorted_path = str(tmp_path / "events_sorted")
    write_sorted_layout(events, sorted_path, "value", N_FILES)

    rz = file_zones(random_path, "value")
    sz = file_zones(sorted_path, "value")
    assert len(rz) == len(sz) == N_FILES and rz and sz

    # Clustered zones are pairwise disjoint (range partitioning hands
    # each file its own slice of the domain).
    ordered = sorted(sz, key=lambda z: z[1])
    for (_, _, prev_hi), (_, nxt_lo, _) in zip(ordered, ordered[1:]):
        assert prev_hi <= nxt_lo

    # A selective band (middle ~12% of one clustered file's zone)
    # touches at most 2 clustered files but every random file.
    _, zlo, zhi = ordered[len(ordered) // 2]
    span = zhi - zlo
    lo, hi = zlo + 0.44 * span, zlo + 0.56 * span
    assert len(zones_overlapping(sz, lo, hi)) <= 2
    assert len(zones_overlapping(rz, lo, hi)) == N_FILES

    # Both layouts answer the scan identically, and the predicate
    # reaches the parquet reader (PushedFilters) so the stats above
    # are actually consulted.
    band = (F.col("value") >= lo) & (F.col("value") <= hi)
    got_sorted = read_with_skipping(spark, sorted_path).filter(band)
    got_random = read_with_skipping(spark, random_path).filter(band)
    want = events.filter(band).count()
    assert got_sorted.count() == got_random.count() == want > 0
    plan = got_sorted._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "value" in plan.split("PushedFilters")[1][:250]

    # The scan proves the file skip end-to-end: only the overlapping
    # clustered files contribute rows.
    touched = {
        r["f"]
        for r in got_sorted.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert len(touched) <= 2
