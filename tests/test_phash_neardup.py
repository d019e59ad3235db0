"""Perceptual-hash near-dup fences: the 60-bit aHash-style fingerprint
must (a) survive the deterministic re-encode noise (every 17th byte +1)
within the Hamming <= 4 confirm bar, (b) keep unrelated documents far
away (measured separation, not assumed), and (c) the query must recover
every base<->variant pair — the pairs exact md5 dedup cannot see."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.operators.media import (
    PHASH_VARIANT_OFFSET,
    perceptual_hash,
)
from etl_spark.plans.multimodal import PHASH_HAM_MAX
from tests.conftest import SF_DIR


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _rep_payloads(spark, limit=400):
    """Exact-dup-collapsed (doc_id, utf-8 payload) rows, the same
    representative set the query fingerprints (including its ASCII
    slice — a non-ASCII fixture doc must not desync test and query)."""
    from etl_spark.plans.multimodal import _ASCII_DOCS

    rows = (
        load(spark, SF_DIR, "documents")
        .where(F.col("text").isNotNull() & (F.length("text") >= 60))
        .where(_ASCII_DOCS)
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .limit(limit)
        .collect()
    )
    return [(r.doc_id, r.text.encode("utf-8")) for r in rows]


def _local_phash(payload: bytes, noisy: bool = False) -> int:
    # Independent pure-Python recompute of the fingerprint contract.
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    if noisy:
        arr = arr.copy()
        arr[::17] += 1
    n = len(arr)
    total = int(arr.sum())
    h = 0
    for s in range(60):
        lo, hi = (s * n) // 60, ((s + 1) * n) // 60
        if int(arr[lo:hi].sum()) * n >= total * (hi - lo):
            h |= 1 << s
    return h


def test_variant_stays_within_confirm_bar_and_strangers_stay_far(spark):
    pays = _rep_payloads(spark)
    assert len(pays) >= 100
    hashes = {d: _local_phash(p) for d, p in pays}
    # (a) the re-encode variant never drifts past the confirm bar
    worst = max(
        _hamming(hashes[d], _local_phash(p, noisy=True)) for d, p in pays
    )
    assert worst <= PHASH_HAM_MAX, f"variant drifted to Hamming {worst}"
    # (b) unrelated representatives sit far outside it (exact dups were
    # collapsed above, so every sampled pair is genuinely different)
    rng = random.Random(0)
    ids = list(hashes)
    dists = sorted(
        _hamming(hashes[a], hashes[b])
        for a, b in (rng.sample(ids, 2) for _ in range(2000))
    )
    assert dists[0] > PHASH_HAM_MAX, f"stranger pair at Hamming {dists[0]}"
    assert dists[len(dists) // 2] >= 15, "separation margin collapsed"


def test_spark_phash_matches_local_recompute(spark):
    pays = _rep_payloads(spark, limit=50)
    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in pays], "doc_id bigint, payload binary"
    )
    got = {r.doc_id: r.phash for r in perceptual_hash(df).collect()}
    for d, p in pays:
        assert got[d] == _local_phash(p)


def test_noisy_variant_rows_ride_the_same_stage(spark):
    pays = _rep_payloads(spark, limit=20)
    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in pays], "doc_id bigint, payload binary"
    )
    out = perceptual_hash(df, noisy_variant=True).collect()
    assert len(out) == 2 * len(pays)
    got = {r.doc_id: r.phash for r in out}
    for d, p in pays:
        assert got[d + PHASH_VARIANT_OFFSET] == _local_phash(p, noisy=True)


def test_query_recovers_every_base_variant_pair(spark):
    import etl_spark.plans  # noqa: F401 — registration side effects
    from etl_spark.plans.registry import REGISTRY

    res = REGISTRY["mm_phash_neardup"].builder(spark, SF_DIR).collect()
    pairs = {(r.doc_a, r.doc_b) for r in res}
    reps = {d for d, _ in _rep_payloads(spark, limit=10_000)}
    missing = [d for d in reps if (d, d + PHASH_VARIANT_OFFSET) not in pairs]
    assert not missing, f"{len(missing)} base<->variant pairs missed"
    for r in res:
        assert r.hamming <= PHASH_HAM_MAX


def test_clusters_are_linear_output_and_consistent_with_pairs(spark):
    """mm_phash_clusters is the linear-output report of the SAME
    confirmed-pair graph: one row per qualifying document (never a
    synthetic variant id), cluster_id = the component's minimum
    doc_id, and every mm_phash_neardup pair lands in one cluster
    after its endpoints project back to base representatives."""
    import etl_spark.plans  # noqa: F401 — registration side effects
    from etl_spark.plans.registry import REGISTRY

    labels = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["mm_phash_clusters"].builder(spark, SF_DIR).collect()
    }
    qualifying = (
        load(spark, SF_DIR, "documents")
        .where(F.col("text").rlike(r"^[\x20-\x7e]*$"))
        .where(F.length("text") >= 60)
        .select("doc_id")
        .collect()
    )
    # linear output over exactly the fingerprinted universe
    assert set(labels) == {r.doc_id for r in qualifying}
    assert all(d < PHASH_VARIANT_OFFSET for d in labels)
    # canonical ids are real members and each cluster's minimum
    by_cluster: dict[int, list[int]] = {}
    for d, c in labels.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)
    # pair graph refinement: confirmed pairs co-cluster after the
    # variant->rep projection
    for r in REGISTRY["mm_phash_neardup"].builder(spark, SF_DIR).collect():
        a = r.doc_a % PHASH_VARIANT_OFFSET
        b = r.doc_b % PHASH_VARIANT_OFFSET
        assert labels[a] == labels[b], (r.doc_a, r.doc_b)
