"""Adversarial embeddings parity: a ZERO vector (cosine undefined —
the zero-norm exclusion contract must hold in both engines), exact
duplicate vectors (cos = 1.0 exactly under integer quantization),
negative components, and a tiny single-member label cell. Every
embeddings-only oracle-paired query must agree with DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from etl_spark.plans import REGISTRY

DIM = 64


def _vec(seed: float) -> list[float]:
    # Deterministic pseudo-vector with negative components.
    return [((i * 37 + 11) % 13 - 6) * 0.125 * seed for i in range(1, DIM + 1)]


EDGE_EMBEDDINGS = [
    # (vec_id, embedding, label)
    (0, _vec(1.0), 0),
    (1, _vec(1.0), 0),            # exact duplicate of 0 → cos 1.0
    (2, _vec(-0.5), 0),           # anti-correlated direction
    (3, [0.0] * DIM, 1),          # ZERO vector: excluded from cosine
    (4, _vec(2.0), 1),
    (5, _vec(0.25), 2),           # singleton-after-exclusions cell mate
    (6, _vec(-1.0), 2),
    (7, _vec(3.0), 3),            # single-member label cell
]

EMB_QUERIES = [
    "sim_topk_cosine",
    "sim_nn_within_label",
    "sim_lsh_bucket_stats",
    "dedup_embedding_cosine",
    "emb_label_centroid_sim",
    "emb_norm_stats",
    "emb_dedup_exact",
    # 8 vectors < PQ_KS seeds and < PQ_QUERY_LO: both engines must agree
    # on the degenerate EMPTY result, not crash.
    "sim_pq_adc",
    "ml_kmeans_step",
    "ml_cluster_separation",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_embeddings")
    spark.createDataFrame(
        EDGE_EMBEDDINGS, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_duck(edge_emb_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{edge_emb_dir}/embeddings.parquet/*.parquet'"
    )
    yield con
    con.close()


def _normalize(df):
    df = df[sorted(df.columns)]

    def key(row):
        return tuple((v is None or v != v, str(v)) for v in row)

    return sorted(
        (tuple(r) for r in df.itertuples(index=False, name=None)), key=key
    )


def test_nn_within_label_multichunk_path(
    spark, edge_emb_dir, edge_emb_duck, monkeypatch
):
    """Force the candidate-side chunk split (the 100 TB path) and require
    the same exact oracle parity: with NN_CELL_CHUNK=2 every 3-member
    cell runs as 2 cogroup tasks, so the cross-chunk struct-max merge and
    the self-only-chunk drop (-inf row) are both exercised."""
    from etl_spark.plans import llm_similarity as sim

    monkeypatch.setattr(sim, "NN_CELL_CHUNK", 2)
    q = REGISTRY["sim_nn_within_label"]
    got = _normalize(q.builder(spark, edge_emb_dir).toPandas())
    want = _normalize(edge_emb_duck.execute(q.oracle).df())
    assert got == want


def test_nn_within_label_chunked_equals_default(spark, monkeypatch):
    """On real data (sf0.001), the chunked plan must return byte-equal
    results to the single-chunk plan — argmax associativity + identical
    float64 cos values make chunking invisible."""
    from etl_spark.plans import llm_similarity as sim

    sf = "/root/testdata/sf0.001"
    q = REGISTRY["sim_nn_within_label"]
    base = _normalize(q.builder(spark, sf).toPandas())
    monkeypatch.setattr(sim, "NN_CELL_CHUNK", 3)
    chunked = _normalize(q.builder(spark, sf).toPandas())
    assert chunked == base
    assert len(base) > 0


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_edge_embeddings_match_oracle(spark, edge_emb_dir, edge_emb_duck, name):
    q = REGISTRY[name]
    got = _normalize(q.builder(spark, edge_emb_dir).toPandas())
    want = _normalize(edge_emb_duck.execute(q.oracle).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    mismatches = [
        (i, g, w)
        for i, (g, w) in enumerate(zip(got, want))
        if tuple(map(str, g)) != tuple(map(str, w))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
