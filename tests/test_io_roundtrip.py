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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Long-lived datasets gain columns over time; readers must see the
    union schema with nulls for files written before a column existed
    (mergeSchema opt-in — by default Spark takes one footer's schema)."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    v1.write.parquet(f"{path}/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 1.5)], "id bigint, name string, score double"
    )
    v2.write.parquet(f"{path}/batch=2")

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert {f.name for f in merged.schema.fields} == {"id", "name", "score", "batch"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows[1] == ("a", None)  # pre-evolution file null-extends
    assert rows[3] == ("c", 0.5)
    assert len(rows) == 4


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other columnar format Spark ships natively; the
    engine's IO layer must roundtrip it with types intact (a warehouse
    migrating from Hive/ORC reads through the same DataFrame surface)."""
    df = sample(spark)
    path = str(tmp_path / "orders_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert as_rows(back) == as_rows(df)


def test_orc_predicate_pushdown(spark, tmp_path):
    """ORC scans must receive pushed filters just like parquet — the
    format choice must not cost the pushdown optimization."""
    df = sample(spark)
    path = str(tmp_path / "orders_orc_pd")
    df.write.mode("overwrite").orc(path)
    scan = spark.read.orc(path).filter(F.col("o_orderkey") < 100)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]
