"""AQE skew-join conversion receipt — the other half of the skew
story: operators/skew.py salts when a plan must be skew-safe
STATICALLY; this fence proves Spark's own runtime skew splitting
(OptimizeSkewedJoin -> AQEShuffleRead skewed) actually fires on this
build, so an unsalted keyed join with a hot key degrades gracefully
instead of serializing on one reducer. If an upgrade or a conf change
ever silently disables it, this test is the alarm."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrink the thresholds so a test-sized hot key counts as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # keep the join a shuffle join: no static or adaptive broadcast
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        # one hot key (0) carrying ~95% of the rows, plus a tail
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 97)
            .cast("bigint")
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id")).alias("d"),
        )
        joined = big.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution (count()
        # would build a separate one), finalizing the adaptive plan
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "skewed" in plan, (
            "OptimizeSkewedJoin did not fire on a hot-key join:\n"
            + plan[:3000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
