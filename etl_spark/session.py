"""SparkSession factory.

Scale posture (tested on local[32], designed for a 1000-executor
cluster):

* AQE on — runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned partition counts.
* ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster AQE's coalescing makes a high initial value cheap,
  so deployments should raise it (2-3x total cores) rather than lower it.
* Arrow enabled for the few Pandas-UDF code paths (vector math fallback,
  multimodal decode) — everything else stays JVM-side.
* Session timezone pinned to UTC: the reference's raw zone used naive
  local timestamps formatted with a 'Z' suffix (reference main.py:129),
  which SURVEY.md §1.2 flags as a bug; this engine is genuinely UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "test-etl-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = default_parallelism()
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # No-timezone parquet micros read as classic TIMESTAMP (UTC
        # session) rather than TIMESTAMP_NTZ; io.load also normalizes
        # any NTZ column for sessions built without this conf.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-provided session.

    The correctness driver hands us its own SparkSession; these are the
    confs that are safe (and necessary) to set at runtime. UTC keeps
    timestamp semantics identical to the DuckDB oracle, which reads the
    parquet timestamps as naive values.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # events.parquet carries TIMESTAMP(NANOS); read as long + explicit
    # micros truncation (see io.load) — vectorized reader rejects nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Static confs (driver memory, master) cannot be changed on a live
    # session; everything above is runtime-settable.
    return spark
