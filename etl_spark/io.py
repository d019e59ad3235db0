"""Table IO for the driver's testdata layout.

One parquet file per table under ``<sf_dir>/<name>.parquet``
(TESTDATA.md). Reads go through ``spark.read.parquet`` so Catalyst gets
a pruning/pushdown-capable scan; never collect-to-driver here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def default_sf_dir() -> str:
    """Resolve the bench scale-factor dir at call time (env may change)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
    DuckDB truncates nanos → micros on read; to keep both engines on
    identical values we read nanos as raw longs
    (spark.sql.legacy.parquet.nanosAsLong, set in session.tune_session)
    and truncate to microseconds explicitly (integer div — same
    truncation DuckDB applies).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register testdata tables as temp views (for spark.sql plans).

    Pass ``names`` to register only the tables a query touches —
    registering all ten re-reads every parquet footer per call, which
    dominated sql_q3's bench time in round 2.
    """
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
