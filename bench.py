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

from etl_spark.io import default_sf_dir
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
)


def main() -> None:
    sf_dir = default_sf_dir()
    spark = tune_session(get_spark("etl-spark-bench"))
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on a trivial action so query 1 isn't charged
    # for session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {times[name]}s", file=sys.stderr)

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
