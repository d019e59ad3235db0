"""The streaming error-rate monitor must converge to the batch
events_error_rate_hourly result when the stream drains."""

from __future__ import annotations

import json

from etl_spark.plans import REGISTRY
from etl_spark.streaming.windows import error_rate_stream, read_event_stream
from tests.conftest import SF_DIR


def test_streaming_error_rate_matches_batch(spark, tmp_path):
    from etl_spark.io import load

    events = load(spark, SF_DIR, "events")
    pdf = events.toPandas()
    src = tmp_path / "src"
    src.mkdir()
    for i, chunk in enumerate(range(0, len(pdf), 200)):
        rows = pdf.iloc[chunk : chunk + 200]
        with open(src / f"b{i:04d}.json", "w") as f:
            for _, r in rows.iterrows():
                f.write(
                    json.dumps(
                        {
                            "event_id": int(r.event_id),
                            "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                            "user_id": int(r.user_id),
                            "event_type": r.event_type,
                            "value": float(r.value),
                            "props": r.props,
                        }
                    )
                    + "\n"
                )

    q = (
        error_rate_stream(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("stream_error_rate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        got = {
            r["hour"]: (r["n_events"], r["n_errors"], r["error_rate"], r["alert"])
            for r in spark.sql("SELECT * FROM stream_error_rate").collect()
        }
    finally:
        q.stop()

    want = {
        r["hour"]: (r["n_events"], r["n_errors"], r["error_rate"], r["alert"])
        for r in REGISTRY["events_error_rate_hourly"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert got == want
