"""Small-file compaction: the at-scale maintenance op. A raw zone that
accretes per-batch files (the reference's file-per-run S9 shape,
reference main.py:123-125) degrades scan parallelism bookkeeping;
compaction rewrites it into a bounded file count with identical
contents."""

from __future__ import annotations

import glob

from etl_spark.io import load
from tests.conftest import SF_DIR


def _files(path: str) -> list[str]:
    return glob.glob(f"{path}/*.parquet")


def test_compaction_bounds_files_and_preserves_rows(spark, tmp_path):
    events = load(spark, SF_DIR, "events")
    scattered = str(tmp_path / "scattered")
    # Simulate per-batch accretion: many tiny files.
    events.repartition(50).write.mode("overwrite").parquet(scattered)
    assert len(_files(scattered)) == 50

    compacted = str(tmp_path / "compacted")
    # Compact: one explicit shuffle to the target file count. At scale
    # the count comes from target_size / bytes-per-row estimates; the
    # mechanism (repartition + rewrite) is identical.
    spark.read.parquet(scattered).repartition(4).write.mode(
        "overwrite"
    ).parquet(compacted)
    assert len(_files(compacted)) == 4

    before = spark.read.parquet(scattered)
    after = spark.read.parquet(compacted)
    assert after.schema == before.schema
    assert after.count() == before.count() == events.count()
    # Content parity, not just counts.
    assert (
        after.exceptAll(before).count() == 0
        and before.exceptAll(after).count() == 0
    )
