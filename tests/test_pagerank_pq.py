"""Integer PageRank vs a pure-Python reference; PQ-ADC invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.graph import PR_DAMP, PR_SCALE, pagerank_integer
from etl_spark.plans import REGISTRY
from etl_spark.plans.llm_similarity import (
    PQ_KS,
    PQ_M,
    PQ_QUERY_HI,
    PQ_QUERY_LO,
    PQ_SUBDIM,
    PQ_TOPK,
    quantize,
)
from tests.conftest import SF_DIR


def _pagerank_reference(pairs: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    """Same fixed-point arithmetic as the operator, in plain Python."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    base = (100 - PR_DAMP) * PR_SCALE // 100
    pr = {v: PR_SCALE for v in adj}
    for _ in range(iterations):
        s: dict[int, int] = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            c = pr[u] // len(nbrs)
            for v in nbrs:
                s[v] += c
        pr = {v: base + (PR_DAMP * s[v]) // 100 for v in adj}
    return pr


@pytest.mark.parametrize(
    "pairs",
    [
        # path 1-2-3 plus a detached edge
        [(1, 2), (2, 3), (10, 11)],
        # star: hub 0 with 5 leaves (hub rank must exceed leaf rank)
        [(0, i) for i in range(1, 6)],
        # clique of 4 (all ranks equal by symmetry)
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
    ],
)
def test_pagerank_integer_matches_reference(spark, pairs):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r["id"]: r["pr"] for r in pagerank_integer(edges, 3).collect()}
    assert got == _pagerank_reference(pairs, 3)


def test_pagerank_star_hub_dominates(spark):
    pairs = [(0, i) for i in range(1, 6)]
    got = {r["id"]: r["pr"] for r in pagerank_integer(spark.createDataFrame(pairs, ["src", "dst"]), 3).collect()}
    assert got[0] > got[1]
    assert len({got[i] for i in range(1, 6)}) == 1  # leaves symmetric


def test_pagerank_hot_hub_does_not_overflow(spark):
    # Regression: the damped update must never form the naive 85*s
    # intermediate. A 120k-spoke star gives the hub a neighbor sum of
    # 1.2e17 in iteration 1, so 85*s = 1.02e19 > 2^63 wraps negative
    # under non-ANSI BIGINT multiply; the decomposed form
    # 85*(s div 100) + (85*(s mod 100)) div 100 stays exact. Python's
    # arbitrary-precision reference is ground truth.
    n = 120_000
    pairs = [(0, i) for i in range(1, n + 1)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r["id"]: r["pr"] for r in pagerank_integer(edges, 2).collect()}
    ref = _pagerank_reference(pairs, 2)
    assert got[0] == ref[0] > 0
    assert got[1] == ref[1] > 0
    assert min(got.values()) > 0  # a wrap would go negative


def test_pagerank_rejects_nonpositive_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank_integer(edges, 0)


def test_registered_pagerank_covers_nonsingleton_docs(spark):
    pr = REGISTRY["graph_dup_pagerank"].builder(spark, SF_DIR).collect()
    pairs = REGISTRY["dedup_minhash_lsh"].builder(spark, SF_DIR).collect()
    in_graph = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert {r["doc_id"] for r in pr} == in_graph
    assert all(r["pagerank"] > 0 for r in pr)


# ----------------------------- PQ / ADC -----------------------------


def test_pq_constants_partition_the_dimension():
    assert PQ_M * PQ_SUBDIM == 64
    assert PQ_QUERY_LO >= PQ_KS  # queries disjoint from codebook seeds


def test_pq_adc_shape_and_selfexclusion(spark):
    rows = REGISTRY["sim_pq_adc"].builder(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(PQ_QUERY_LO, PQ_QUERY_HI))
    for qid, rs in by_q.items():
        assert len(rs) == PQ_TOPK
        assert all(r["vec_id"] != qid for r in rs)
        assert all(r["adc_d2"] >= 0 for r in rs)
        ordered = sorted(rs, key=lambda r: (r["adc_d2"], r["vec_id"]))
        assert [r["rnk"] for r in ordered] == list(range(1, PQ_TOPK + 1))


def test_pq_adc_matches_python_reference(spark):
    """Re-derive encode + ADC in plain numpy from the raw vectors."""
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["q"], dtype=np.int64) for r in emb}
    CB = np.stack([vecs[i] for i in range(PQ_KS)]).reshape(PQ_KS, PQ_M, PQ_SUBDIM)
    want: dict[int, list[tuple[int, int]]] = {}
    codes = {
        v: [
            int(((vec.reshape(PQ_M, PQ_SUBDIM)[m] - CB[:, m, :]) ** 2).sum(1).argmin())
            for m in range(PQ_M)
        ]
        for v, vec in vecs.items()
    }
    for qid in range(PQ_QUERY_LO, PQ_QUERY_HI):
        q = vecs[qid].reshape(PQ_M, PQ_SUBDIM)
        lut = ((q[:, None, :] - CB.transpose(1, 0, 2)) ** 2).sum(2)  # (M, KS)
        dists = [
            (sum(int(lut[m, codes[v][m]]) for m in range(PQ_M)), v)
            for v in vecs
            if v != qid
        ]
        want[qid] = sorted(dists)[:PQ_TOPK]
    got = REGISTRY["sim_pq_adc"].builder(spark, SF_DIR).collect()
    got_by_q: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(got, key=lambda r: r["rnk"]):
        got_by_q.setdefault(r["query_id"], []).append((r["adc_d2"], r["vec_id"]))
    assert got_by_q == want


def test_pq_adc_empty_corpus_yields_empty(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src.limit(0).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = REGISTRY["sim_pq_adc"].builder(spark, str(tmp_path))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "adc_d2", "rnk"]


def _rank_order(pr: dict[int, int]) -> list[int]:
    return [v for v, _ in sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))]


def test_pagerank_rank_order_stable_at_shipped_iterations(spark):
    """PR_ITERS=3 as EVIDENCE, not assumption: on the registered dup
    graph (the LSH pair edges the query actually ranks) the full rank
    ORDER — not just top-k — is already identical across iterations
    2->3->4, so the shipped constant sits past the point where another
    iteration could change any downstream keep/drop decision. The
    pure-Python sweep is the operator (pinned bit-equal by
    test_pagerank_integer_matches_reference), and the registered
    Spark query's values are re-pinned against it here at PR_ITERS."""
    from etl_spark.plans.llm_dedup import PR_ITERS

    pair_rows = REGISTRY["dedup_minhash_lsh"].builder(spark, SF_DIR).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in pair_rows]
    assert pairs, "fixture graph vanished — stability claim untestable"
    orders = {
        it: _rank_order(_pagerank_reference(pairs, it))
        for it in (PR_ITERS - 1, PR_ITERS, PR_ITERS + 1)
    }
    assert orders[PR_ITERS - 1] == orders[PR_ITERS] == orders[PR_ITERS + 1]
    got = {
        r["doc_id"]: r["pagerank"]
        for r in REGISTRY["graph_dup_pagerank"].builder(spark, SF_DIR).collect()
    }
    assert got == _pagerank_reference(pairs, PR_ITERS)


def test_pagerank_order_oscillation_caveat_is_real():
    """The documented limitation, kept falsifiable: fixed-iteration
    power iteration on an UNDIRECTED graph can oscillate rank order
    with period 2 on path-like structures (the adjacency operator's
    negative eigenvalues don't decay under symmetric propagation).
    A lollipop (K4 + 4-node tail) exhibits it: consecutive iterates
    keep swapping two tail nodes. Dup-cluster graphs are near-cliques
    — the class where the previous test shows order settles at once —
    which is WHY a fixed small PR_ITERS is sound for dedup ranking
    and why this operator's docstring scopes its stability claim to
    that graph class rather than claiming universal convergence."""
    lollipop = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [
        (3, 4), (4, 5), (5, 6), (6, 7)
    ]
    o4 = _rank_order(_pagerank_reference(lollipop, 4))
    o5 = _rank_order(_pagerank_reference(lollipop, 5))
    o6 = _rank_order(_pagerank_reference(lollipop, 6))
    assert o4 != o5, "oscillation gone — caveat may be deletable"
    assert o4 == o6, "period-2 oscillation, not chaos"
