"""Idempotent backfill: dynamic partition overwrite must replace ONLY
the partitions present in the incoming batch — the mechanism behind
re-running one day of a partitioned pipeline without touching the
rest (the batch analog of the streaming sink's per-batch overwrite in
streaming/sinks.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from tests.conftest import SF_DIR


def test_dynamic_partition_overwrite_replaces_only_touched_day(spark, tmp_path):
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        events = load(spark, SF_DIR, "events").withColumn(
            "day", F.to_date("ts")
        )
        path = str(tmp_path / "events_by_day")
        events.write.partitionBy("day").parquet(path)
        before = spark.read.parquet(path)
        n_total = before.count()
        some_day = before.select("day").orderBy("day").first()["day"]
        n_day = before.filter(F.col("day") == some_day).count()

        # Backfill that day with a corrected (halved) batch.
        corrected = (
            events.filter(F.col("day") == some_day)
            .filter(F.col("event_id") % 2 == 0)
        )
        n_corrected = corrected.count()
        assert 0 < n_corrected < n_day
        corrected.write.mode("overwrite").partitionBy("day").parquet(path)

        after = spark.read.parquet(path)
        # Only the touched day changed; every other partition intact.
        assert after.filter(F.col("day") == some_day).count() == n_corrected
        assert after.count() == n_total - n_day + n_corrected
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
