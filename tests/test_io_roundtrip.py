"""File-format connectors: parquet / JSON / CSV write→read roundtrips
must preserve values (CSV through an explicit schema, since CSV is
untyped)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from tests.conftest import SF_DIR


def sample(spark):
    return (
        load(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
        )
        .limit(200)
    )


def as_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, tmp_path):
    df = sample(spark)
    path = str(tmp_path / "pq")
    df.write.mode("overwrite").parquet(path)
    assert as_rows(spark.read.parquet(path)) == as_rows(df)


def test_json_roundtrip(spark, tmp_path):
    df = sample(spark)
    path = str(tmp_path / "js")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    assert as_rows(back) == as_rows(df)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = sample(spark)
    path = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(df.schema).option("header", True).csv(path)
    assert as_rows(back) == as_rows(df)
