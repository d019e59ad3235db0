"""Spark-vs-DuckDB parity for every oracle-paired registered query.

Mirrors the driver's CORRECTNESS compare: row count, column names,
and order-insensitive value equality (columns sorted by name, rows
sorted by all columns). Exact equality — the engine's decimal/integer
hash-stability design means no tolerance should ever be needed.
"""

from __future__ import annotations

import math

import pytest

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


def normalize(df):
    """pandas DataFrame → sorted-rows, sorted-columns list of tuples."""
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]

    def key(row):
        return tuple((v is None or v != v, str(v)) for v in row)

    return sorted(rows, key=key)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the whole point of the decimal/int design
    return a == b


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(q.oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    # dtype-kind parity (int vs float vs object) — a DuckDB HUGEINT
    # surfacing as float64 would silently pass a value-only compare but
    # fail the driver's schema/hash check.
    for c in sorted(spark_pdf.columns):
        sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        assert sk == dk, f"{name}.{c}: dtype kind spark={sk} duck={dk}"
    s_rows = normalize(spark_pdf)
    d_rows = normalize(duck_pdf)
    mismatches = [
        (i, sr, dr)
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows))
        if not all(values_equal(a, b) for a, b in zip(sr, dr))
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first 3: {mismatches[:3]}"
    )


def test_no_rows_only_queries_remain():
    """As of round 9 EVERY registered query is oracle-paired (the
    former rows-only sketches are bounded-verdict forms). This pins
    that property: a new oracle=None registration must be a conscious
    decision that reopens the rows-only drive path, not an accident."""
    assert ROWS_ONLY_QUERIES == [], (
        "unexpected rows-only queries (oracle=None): "
        f"{ROWS_ONLY_QUERIES}"
    )
