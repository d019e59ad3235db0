"""Memory-pressure receipt: do the heaviest corpus queries SPILL
(gracefully) under constrained executor memory, instead of OOMing or
silently switching to a broadcast that would pin the build side?

The 100 TB argument everywhere else in this repo is structural (plan
shapes, decade ladders); this probe is the missing BEHAVIORAL half:
at a fixed data size, shrink the execution-memory pool hard and
verify each query (a) completes, (b) returns the same row count as
the unconstrained run, (c) reports sort/shuffle spill in the stage
metrics (proof the operators degrade to disk, the cluster-sized
failure mode being OOM), and (d) keeps its corpus-derived joins
SMJ/shuffle — no emergency broadcast appears in the executed plan.

Constraint levers (all session-creatable, no JVM restart games):
  * spark.memory.fraction=0.1  — execution+storage pool cut to 10%
    of heap (the spec-compliant way to simulate a small executor;
    driver.memory itself cannot change after JVM launch, and a
    fraction cut pressures exactly the pool sorts/aggregates use)
  * spark.sql.shuffle.partitions=4 — partitions ~8x bench size, so
    per-task working sets exceed the shrunken pool
  * AQE left ON (the production posture — this also receipts that
    AQE's coalescing does not defeat the spill path)

Usage: python tools/spill_probe.py [sf_dir] [fraction] [partitions] [q ...]
       (defaults /tmp/sf1 0.1 4 and the five heaviest queries)
Writes one line per query: rows, wall, spill bytes (memory/disk),
and the join operators seen in the executed plan.

Measured finding (sf1, fraction=0.1, partitions=4): the failure mode
under EXTREME starvation is not the sort — it is the spill MERGE:
UnsafeExternalSorter.getSortedIterator opens every spill segment's
reader at once, each with a >=1 MiB unmanaged heap buffer (the conf
floor of spark.unsafe.sorter.spill.reader.buffer.size), so hundreds
of segments x 8 concurrent tasks exhaust the heap OUTSIDE the managed
pool. The operative lever under AQE is
spark.sql.adaptive.advisoryPartitionSizeInBytes, NOT the raw
partition count — raising partitions to 32 alone still OOMs because
AQE coalesces the shuffle back to its 64 MiB advisory; advisory=8m
(sized to the starved pool) completes with plain disk spill and
identical output. See SCALING.md 'Memory-pressure receipts'.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

QUERIES = [
    "dedup_prefix_filter_pairs",
    "sim_knn_join",
    "ml_kmeans_lloyd",
    "dedup_clusters",
    "pipeline_ingest_triad",
]


def stage_spill_totals(spark) -> tuple[int, int]:
    """Cumulative (memoryBytesSpilled, diskBytesSpilled) across all
    stages, via the UI's REST API (the stable public surface for
    stage metrics; AppStatusStore's py4j signature is not callable
    from Python)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages", timeout=30
    ) as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    fraction = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    partitions = sys.argv[3] if len(sys.argv) > 3 else "4"
    queries = sys.argv[4:] or QUERIES
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", partitions)
        .config("spark.memory.fraction", fraction)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST API = metric source
        .config("spark.ui.port", "4059")
        .appName("spill-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_spark.plans import REGISTRY
    from etl_spark.session import tune_session

    tune_session(spark)
    # tune_session may raise shuffle partitions back to bench size —
    # re-floor AFTER it so the constraint actually holds
    spark.conf.set("spark.sql.shuffle.partitions", partitions)

    results = {}
    for name in queries:
        m0, d0 = stage_spill_totals(spark)
        t0 = time.time()
        df = REGISTRY[name].builder(spark, sf)
        rows = df.count()
        wall = time.time() - t0
        m1, d1 = stage_spill_totals(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = sorted(
            {
                op
                for op in (
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if op in plan
            }
        )
        results[name] = {
            "rows": rows,
            "wall_sec": round(wall, 2),
            "memory_spill_bytes": m1 - m0,
            "disk_spill_bytes": d1 - d0,
            "joins": joins,
        }
        print(
            f"{name}: rows={rows} wall={wall:.1f}s "
            f"mem_spill={(m1 - m0) / 1e6:.1f}MB "
            f"disk_spill={(d1 - d0) / 1e6:.1f}MB joins={joins}",
            flush=True,
        )
    total_mem = sum(r["memory_spill_bytes"] for r in results.values())
    total_disk = sum(r["disk_spill_bytes"] for r in results.values())
    print(
        json.dumps(
            {
                "sf": sf,
                "memory_fraction": float(fraction),
                "shuffle_partitions": int(partitions),
                "total_memory_spill_bytes": total_mem,
                "total_disk_spill_bytes": total_disk,
                "queries": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
