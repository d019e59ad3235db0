#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>}

Timing = full action per query (plan + execute + count-style drain);
each query drains via a count over its result so the bytes never hit
the driver (collect would measure serialization, not the engine).
"""

from __future__ import annotations

import json
import sys
import time

from etl_spark.io import SMOKE_SF_DIR, default_sf_dir
from etl_spark.plans import REGISTRY
from etl_spark.session import get_spark, tune_session

# Headline set: every family, weighted toward the scale-relevant ops.
HEADLINE = (
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "scan_filter_project",
    "join_inner_orders_customer",
    "join_left_customer_orders",
    "join_broadcast_geo_rollup",
    "agg_distinct_priority",
    "agg_rollup_orders",
    "top_k_orders",
    "window_latest_order_per_customer",
    "window_running_spend",
    "events_tumbling_hourly",
    "events_sessionize",
    "text_top_terms",
    "text_token_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "sim_topk_cosine",
    "sim_nn_within_label",
    "events_asof_click_before_error",
    "pivot_user_event_counts",
    "sql_q3_shipping_priority",
    "window_rolling_30d_spend",
    "text_langid_ngram",
)


def main() -> None:
    sf_dir = default_sf_dir()
    spark = tune_session(get_spark("etl-spark-bench"))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: exercise the same code paths (parquet reader, codegen,
    # shuffle machinery) on the SMOKE scale factor so the first timed
    # query isn't charged for one-time JVM/JIT initialization. This
    # warms code, not the benchmark data — sf0.001 is a different
    # directory than the timed sf.
    spark.range(1000).selectExpr("sum(id)").collect()
    for warm in (
        "q1_pricing_summary",  # parquet scan + hash agg + sort
        "window_latest_order_per_customer",  # window exchange
        "sim_nn_within_label",  # Python worker + Arrow path
        "dedup_minhash_lsh",  # higher-order functions + self-join
    ):
        REGISTRY[warm].builder(spark, SMOKE_SF_DIR).count()
    spark.catalog.clearCache()  # drop smoke-SF persisted intermediates

    # min of REPS runs per query: damps scheduler/GC noise on a shared
    # host (observed 3-4x swings from co-tenant load); the min is the
    # engine's achievable time for the plan.
    REPS = 3
    times: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        best, rows = None, 0
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = q.builder(spark, sf_dir).count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)
        print(f"# {name}: {rows} rows in {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
