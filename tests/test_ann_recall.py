"""ANN quality bound: the LSH multiprobe nearest neighbor must achieve
reasonable recall@1 against the exact brute-force baseline, and every
neighbor it returns must be a genuine candidate (cosine computed
exactly)."""

from __future__ import annotations

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_lsh_probe_recall_vs_brute_force(spark):
    approx = {
        r["query_id"]: (r["nn_id"], r["cos_sim"])
        for r in REGISTRY["sim_ann_lsh_probe"].builder(spark, SF_DIR).collect()
    }
    # Exact global top-1 for every vector, recomputed independently.
    from etl_spark.io import load
    from etl_spark.plans.llm_similarity import quantize
    import numpy as np
    from pyspark.sql import functions as F

    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    Q = np.array([r["q"] for r in rows], dtype=np.float64)
    G = Q @ Q.T
    norms = np.diag(G).copy()
    cos = G / np.sqrt(np.outer(norms, norms))
    np.fill_diagonal(cos, -np.inf)
    order = np.argsort(ids)
    # ensure ids sorted ascending for deterministic argmax tiebreak
    ids, cos = ids[order], cos[np.ix_(order, order)]
    nn_idx = np.argmax(cos, axis=1)
    exact = {int(ids[i]): int(ids[nn_idx[i]]) for i in range(len(ids))}

    assert set(approx) == set(exact)
    n = len(exact)
    hits = sum(1 for qid, (nn, _) in approx.items() if exact[qid] == nn)
    recall = hits / n

    # Uniform-random vectors are LSH's WORST case (true NNs are nearly
    # orthogonal, so sign bits decorrelate); absolute recall is low by
    # the math, and what must hold is (a) strong enrichment over the
    # fraction of the corpus scanned and (b) found neighbors close in
    # cosine to the true NN. Real near-dup corpora (cos > 0.9 pairs)
    # collide with probability ~(1-θ/π)^planes ≈ 0.9^8 ≈ 0.43/bucket.
    from etl_spark.plans.llm_similarity import corpus_planes

    planes = corpus_planes(spark, SF_DIR)
    # planes+1 probes over 2^planes buckets (uniform corpus).
    scanned_fraction = (planes + 1) / (2 ** planes)
    enrichment = recall / scanned_fraction
    assert enrichment >= 2.0, (
        f"recall {recall:.3f} not enriched over scan fraction "
        f"{scanned_fraction:.3f} (enrichment {enrichment:.1f}x)"
    )

    id_pos = {int(v): i for i, v in enumerate(ids)}
    # Quality: found neighbor's cosine averages close to the true NN's.
    ratios = []
    for qid, (nn, c) in approx.items():
        true_best = cos[id_pos[qid]].max()
        ratios.append(c / true_best if true_best > 0 else 1.0)
    assert sum(ratios) / len(ratios) >= 0.5, "found neighbors far from true NN"

    # Exactness: reported cosines must match the exact matrix bitwise.
    for qid, (nn, c) in list(approx.items())[:50]:
        assert abs(cos[id_pos[qid], id_pos[nn]] - c) < 1e-12


def test_lsh_probe_scaled_planes_at_sf01(spark):
    # At sf0.1 the corpus (2000 vectors) derives 10 planes instead of
    # the minimum 8; the probe must still enrich over its scan
    # fraction and report exact cosines.
    sf_dir = "/root/testdata/sf0.1"
    from etl_spark.io import load
    from etl_spark.plans.llm_similarity import corpus_planes, quantize
    import numpy as np
    from pyspark.sql import functions as F

    planes = corpus_planes(spark, sf_dir)
    assert planes == 10  # floor(log2(2000))

    approx = {
        r["query_id"]: (r["nn_id"], r["cos_sim"])
        for r in REGISTRY["sim_ann_lsh_probe"].builder(spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .collect()
    )
    ids = np.array(sorted(r["vec_id"] for r in rows))
    by_id = {r["vec_id"]: r["q"] for r in rows}
    Q = np.array([by_id[i] for i in ids], dtype=np.float64)
    G = Q @ Q.T
    norms = np.diag(G).copy()
    cos = G / np.sqrt(np.outer(norms, norms))
    np.fill_diagonal(cos, -np.inf)

    assert set(approx) == set(int(i) for i in ids)
    id_pos = {int(v): i for i, v in enumerate(ids)}
    hits = sum(
        1
        for qid, (nn, _) in approx.items()
        if int(ids[np.argmax(cos[id_pos[qid]])]) == nn
    )
    recall = hits / len(ids)
    scanned_fraction = (planes + 1) / (2 ** planes)
    assert recall / scanned_fraction >= 2.0
    for qid, (nn, c) in list(approx.items())[:50]:
        assert abs(cos[id_pos[qid], id_pos[nn]] - c) < 1e-12


def test_jl_distortion_concentrates(spark):
    """The JL receipt must show real concentration: at 4x compression
    the [1/2, 2] band holds the overwhelming majority of pairs for
    EVERY query (measured 0.84-0.99 at sf0.001), and the observed
    ratios bracket 1 (an unbiased estimator that never crossed 1
    would mean a scaling bug, not concentration)."""
    from etl_spark.plans.llm_similarity import emb_jl_distortion

    rows = emb_jl_distortion(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["within_rate"] >= 0.8, (r["query_id"], r["within_rate"])
        assert 0 < r["min_ratio"] < 1 < r["max_ratio"], r
