"""Live-source demo: the rate-micro-batch stream must produce the same
windowed aggregate as a batch recomputation over the identical
deterministic input — the batch/stream parity contract, but with a
source that PRODUCES data (the broker stand-in) instead of replaying
files.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_spark.streaming.rate_source import (
    rate_hourly_counts,
    read_rate_events,
    synthesize_events,
)

ROWS_PER_BATCH = 100
ADVANCE_MS = 60_000
START_MS = 1_704_103_200_000
N_BATCHES = 5


def _batch_oracle(spark, n_rows):
    """Recompute the first n_rows of the rate stream as a plain batch
    frame: value i belongs to micro-batch i // ROWS_PER_BATCH, whose
    rows all carry that batch's timestamp."""
    src = spark.range(n_rows).select(
        F.timestamp_millis(
            F.lit(START_MS) + (F.col("id") / ROWS_PER_BATCH).cast("long") * ADVANCE_MS
        ).alias("timestamp"),
        F.col("id").alias("value"),
    )
    return rate_hourly_counts(synthesize_events(src))


def test_rate_stream_matches_batch_oracle(spark, tmp_path):
    events = read_rate_events(
        spark,
        rows_per_batch=ROWS_PER_BATCH,
        num_partitions=2,
        start_ts_ms=START_MS,
        advance_ms_per_batch=ADVANCE_MS,
    )
    q = (
        rate_hourly_counts(events)
        .writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # The source is UNBOUNDED (the point of the demo) — run until at
        # least N_BATCHES micro-batches committed, then stop. Don't use
        # processAllAvailable(): rate-micro-batch always has a next
        # batch, so it would never return.
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(b.numInputRows for b in q.recentProgress) >= (
                N_BATCHES * ROWS_PER_BATCH
            ):
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()
        # Post-stop, recentProgress holds exactly the committed batches
        # and the complete-mode sink holds the aggregate over them.
        rows_seen = sum(b.numInputRows for b in q.recentProgress)
        assert rows_seen >= N_BATCHES * ROWS_PER_BATCH
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.table("rate_sink").collect()
        }
    finally:
        if q.isActive:
            q.stop()

    def oracle(n):
        return {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in _batch_oracle(spark, n).collect()
        }

    # stop() can land between a batch's sink commit and its progress
    # post, leaving the sink exactly one batch ahead of recentProgress —
    # accept either consistent snapshot.
    want = oracle(rows_seen)
    if got != want:
        want = oracle(rows_seen + ROWS_PER_BATCH)
    assert got == want
    # Several 1-minute windows actually closed (ts advances 1 min/batch).
    n_windows = len({k[0] for k in got})
    assert n_windows >= 3
