#!/usr/bin/env python
"""Full-registry timing sweep (round artifact BENCH_FULL_r{N}.json):
one timed run of EVERY registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).

Complements bench.py: the frozen 25-query HEADLINE set stays the
cross-round comparable; this sweep makes regressions in the other
~140 queries visible round-over-round. Single rep per query (the
sweep is a regression tripwire, not a precision benchmark — compare
round files with ~2x tolerance before investigating).

Usage: python tools/bench_full.py > BENCH_FULL_r04.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.io import SMOKE_SF_DIR, default_sf_dir
from etl_spark.plans import REGISTRY
from etl_spark.session import get_spark, tune_session


def main() -> None:
    sf_dir = default_sf_dir()
    spark = tune_session(get_spark("etl-spark-bench-full"))
    spark.sparkContext.setLogLevel("ERROR")

    # Same warm-up as bench.py: pay JVM/JIT/Arrow init once, off-clock.
    spark.range(1000).selectExpr("sum(id)").collect()
    for warm in (
        "q1_pricing_summary",
        "window_latest_order_per_customer",
        "sim_nn_within_label",
        "dedup_minhash_lsh",
    ):
        REGISTRY[warm].builder(spark, SMOKE_SF_DIR).count()
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(REGISTRY):
        t0 = time.perf_counter()
        try:
            rows = REGISTRY[name].builder(spark, sf_dir).count()
        except Exception as ex:  # record, keep sweeping
            failures[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {rows} rows in {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    # Shared host: co-tenant load swings wall times 2-3x, so record the
    # load average alongside — a sweep at load 15 is not comparable to
    # one at load 2.
    print(
        json.dumps(
            {
                "metric": "full_registry_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(times),
                "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
                "queries": times,
                "failures": failures,
                "sf": sf_dir,
            }
        )
    )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
