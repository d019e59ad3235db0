"""Hive-partitioned layout: writing partitionBy(key) and filtering on
the key must prune partitions at the scan (PartitionFilters in the
plan, and only the matching directory is read) — the layout discipline
the 100 TB raw zone depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from tests.conftest import SF_DIR


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    events = load(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(path)

    clicks = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]

    # Count parity with the unpartitioned source.
    want = events.filter(F.col("event_type") == "click").count()
    assert clicks.count() == want

    # The scan must touch only the matching partition directory.
    files = [
        r["file"]
        for r in clicks.select(F.input_file_name().alias("file")).distinct().collect()
    ]
    assert files and all("event_type=click" in f for f in files)
