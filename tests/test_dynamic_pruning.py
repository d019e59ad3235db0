"""Dynamic partition pruning (DPP): joining a partitioned fact to a
FILTERED dim must prune fact partitions at runtime from the dim-side
join keys — the star-schema scan killer at 100 TB, where the static
filter lives on the dim and the fact's partition column is only
constrained through the join.

Complements test_partition_pruning.py (static pruning from a literal
predicate on the partition key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from tests.conftest import SF_DIR


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, tmp_path):
    # Fact partitioned by event_type; dim maps event_type -> bucket.
    events = load(spark, SF_DIR, "events")
    fact_path = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "acquisition"),
         ("error", "quality")],
        ["event_type", "bucket"],
    )

    # Force the DPP decision path that matters at scale: a broadcast
    # of the filtered dim feeding an in-subquery filter on the fact's
    # partition column. The filter is on the DIM attribute, not the
    # partition key.
    joined = fact.join(
        F.broadcast(dim.filter(F.col("bucket") == "engagement")),
        "event_type",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan, plan[:2000]

    # Execute: only click/view partitions may be touched.
    files = [
        r["file"]
        for r in joined.select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    ]
    assert files
    assert all(
        "event_type=click" in f or "event_type=view" in f for f in files
    )

    # Value parity with the unpartitioned plan.
    want = events.join(
        dim.filter(F.col("bucket") == "engagement"), "event_type"
    ).count()
    assert joined.count() == want
