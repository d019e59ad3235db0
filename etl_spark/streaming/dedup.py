"""Streaming deduplication — the S14 latest/first-wins semantics under
a continuous source.

The batch engine's snapshot dedup (etl.pipeline.snapshot_latest)
recomputes over all history; a streaming deployment instead suppresses
duplicates as they arrive. ``dropDuplicatesWithinWatermark`` keeps
first-seen-wins state per key and lets the watermark garbage-collect
it — the property that makes streaming dedup viable at 100 TB: state
is bounded by (keys seen within the watermark horizon), not by
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEDUP_WATERMARK = "30 minutes"


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """First-occurrence-wins per event_id within the watermark horizon.

    Re-deliveries (at-least-once sources re-emitting an event) inside
    the horizon are dropped; state for ids older than the watermark is
    reclaimed automatically.
    """
    return events.withWatermark("ts", DEDUP_WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
