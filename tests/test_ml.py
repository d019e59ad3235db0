"""k-means: the iterative Lloyd loop against its oracle-paired first step.

ml_kmeans_step is hash-verified against DuckDB by test_oracle_parity;
these tests pin the properties of the iterative path that SQL cannot
express: the loop's first pass IS the verified step, and Lloyd descent
never increases inertia.
"""

from __future__ import annotations

import pytest

from etl_spark.plans.ml import (
    K_CLUSTERS,
    _assign,
    _cluster_stats,
    _quantized,
    ml_kmeans_lloyd,
    ml_kmeans_step,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lloyd_rows(spark):
    return ml_kmeans_lloyd(spark, SF_DIR).collect()


def test_lloyd_covers_all_vectors(spark, lloyd_rows):
    n_vecs = _quantized(spark, SF_DIR).count()
    assert sum(r["n_members"] for r in lloyd_rows) == n_vecs
    assert {r["cluster"] for r in lloyd_rows} <= set(range(K_CLUSTERS))


def test_lloyd_improves_on_seed_step(spark, lloyd_rows):
    # Lloyd descent: total inertia after convergence must be <= the
    # seed assignment's (equality only if seeds were already optimal).
    seed_inertia = sum(
        r["inertia"] for r in ml_kmeans_step(spark, SF_DIR).collect()
    )
    final_inertia = sum(r["inertia"] for r in lloyd_rows)
    assert final_inertia <= seed_inertia
    assert lloyd_rows[0]["n_iter"] >= 1


def test_lloyd_inertia_monotone_per_iteration(spark):
    # Replay the loop's centroid updates by hand and check each
    # assignment pass never increases total inertia.
    from pyspark.sql import functions as F

    emb = _quantized(spark, SF_DIR)
    seed_rows = sorted(
        emb.filter(F.col("vec_id") < K_CLUSTERS).collect(),
        key=lambda r: r["vec_id"],
    )
    centroids = [[float(x) for x in r["q"]] for r in seed_rows]
    prev = None
    for _ in range(3):
        assigned = _assign(emb, centroids)
        inertia = assigned.agg(F.sum("d2").alias("i")).collect()[0]["i"]
        if prev is not None:
            assert inertia <= prev * (1 + 1e-12)
        prev = inertia
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster = {}
        for row in sums:
            vec = by_cluster.setdefault(row["cluster"], [0.0] * len(centroids[0]))
            vec[row["pos"]] = row["sx"] / row["n"]
        centroids = [by_cluster.get(c, centroids[c]) for c in range(K_CLUSTERS)]


def test_step_stats_match_assignment(spark):
    # _cluster_stats is a plain count/sum over the assignment — cross-check
    # against a driver-side recompute on the collected assignment.
    from pyspark.sql import functions as F

    emb = _quantized(spark, SF_DIR)
    seed_rows = sorted(
        emb.filter(F.col("vec_id") < K_CLUSTERS).collect(),
        key=lambda r: r["vec_id"],
    )
    assigned = _assign(emb, [r["q"] for r in seed_rows]).collect()
    stats = {
        r["cluster"]: (r["n_members"], r["inertia"])
        for r in ml_kmeans_step(spark, SF_DIR).collect()
    }
    recomputed = {}
    for row in assigned:
        n, i = recomputed.get(row["cluster"], (0, 0))
        recomputed[row["cluster"]] = (n + 1, i + int(row["d2"]))
    assert stats == recomputed
