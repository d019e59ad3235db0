"""Connected components verified against a Python union-find on the
same edge set."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.operators.graph import connected_components
from etl_spark.plans import REGISTRY
from etl_spark.plans.llm_dedup import dedup_minhash_lsh
from tests.conftest import SF_DIR


class UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def test_connected_components_on_synthetic_graph(spark):
    # Two components {1,2,3} (path) and {10,11}; 99 is a singleton.
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    got = {r["id"]: r["component"] for r in connected_components(vertices, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_matches_union_find(spark):
    pairs = [(r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, SF_DIR).collect()]
    uf = UnionFind()
    all_docs = [
        r["doc_id"]
        for r in REGISTRY["dedup_exact"].builder(spark, SF_DIR).select("doc_id").collect()
    ]
    for d in all_docs:
        uf.find(d)
    for a, b in pairs:
        uf.union(a, b)
    want = {d: uf.find(d) for d in all_docs}

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["dedup_clusters"].builder(spark, SF_DIR).collect()
    }
    # Canonical representative: min id of the component in both cases.
    # Union-find roots are already minimal because union parents max→min.
    assert got == want


# --- property-based: random graphs vs union-find ---------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vertex = st.integers(min_value=0, max_value=25)


@settings(
    max_examples=8,  # each example runs an iterative Spark job
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_list=st.lists(st.tuples(_vertex, _vertex), max_size=40))
def test_connected_components_matches_union_find_on_random_graphs(
    spark, edge_list
):
    """Star-contraction CC must agree with a sequential union-find on
    arbitrary graphs — self-loops, duplicate and reversed edges, chains
    whose diameter approaches the iteration cap, isolated vertices."""
    vertex_ids = sorted({v for e in edge_list for v in e} | {77})  # 77 isolated
    vertices = spark.createDataFrame([(v,) for v in vertex_ids], ["id"])
    edges_rows = [(a, b) for a, b in edge_list] or [(77, 77)]
    edges = spark.createDataFrame(edges_rows, ["src", "dst"])

    uf = UnionFind()
    for v in vertex_ids:
        uf.find(v)
    for a, b in edge_list:
        uf.union(a, b)
    want = {v: uf.find(v) for v in vertex_ids}

    got = {
        r["id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert got == want


def _brute_triangles(pairs):
    from itertools import combinations

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_triangle_count_matches_brute_force(spark):
    from etl_spark.operators.graph import triangle_count

    import random

    rng = random.Random(7)
    cases = [
        [],                                           # empty graph
        [(1, 2)],                                     # single edge
        [(1, 2), (2, 3), (1, 3)],                     # one triangle
        [(a, b) for a in range(10) for b in range(a + 1, 10)],  # K10 clique
    ]
    for _ in range(4):  # random sparse + dense graphs
        n = rng.randint(5, 40)
        p = rng.choice([0.1, 0.5])
        cases.append(
            [
                (a, b)
                for a in range(n)
                for b in range(a + 1, n)
                if rng.random() < p
            ]
        )
    for pairs in cases:
        expected = _brute_triangles(pairs)
        df = spark.createDataFrame(
            pairs or [(0, 0)], ["src", "dst"]
        )
        if not pairs:
            df = df.filter(F.lit(False))
        got = triangle_count(df).collect()[0]["n_triangles"]
        assert got == expected, (len(pairs), got, expected)
