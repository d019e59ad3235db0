"""Iterative graph algorithms on DataFrames: connected components.

Deduplication pipelines need this step: near-dup PAIRS (from LSH or
Jaccard) must become canonical GROUPS (every doc labeled with its
cluster's minimum id) before a keep-one policy can run. Components are
computed by minimum-label propagation:

    label(v) ← min(label(v), min over neighbors label(u))

iterated to fixpoint. Convergence takes O(diameter) rounds — near-dup
graphs are unions of small cliques, so 2-4 rounds in practice.

Scale notes:
* Each round is one join + one groupBy — fully distributed; the
  driver-side loop only checks the (scalar) convergence count.
* ``localCheckpoint`` after every round truncates the lineage;
  without it the plan doubles per iteration and Catalyst analysis
  time explodes — the classic iterative-algorithm trap on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 20


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """Label every vertex with its component's minimum vertex id.

    vertices: one column ``id``; edges: columns ``src``, ``dst``
    (undirected — both directions are derived internally).
    Returns (id, component).
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    both_ways = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = vertices.select("id", F.col("id").alias("component")).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            both_ways.join(labels, both_ways.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_component"))
        )
        # Checkpoint ONCE with both columns, then derive the changed
        # count and the next labels from the checkpointed result —
        # counting first and checkpointing after would execute the
        # join+groupBy twice per round.
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("new_component"),
                "component",
            )
            .localCheckpoint()
        )
        changed = updated.filter(
            F.col("new_component") != F.col("component")
        ).count()
        labels = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    else:
        # The loop exhausted max_iterations with labels still moving:
        # returning would silently mislabel components (a vertex on a
        # long chain keeps a non-minimum id). Fail loudly — the caller
        # should raise max_iterations (diameter bound) instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); the graph "
            "diameter exceeds max_iterations — raise it"
        )
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count by degree-ordered adjacency intersection
    (node-iterator++).

    ``edges``: columns ``src``, ``dst``, one row per undirected edge,
    no self-loops, no duplicate edges in either direction. Returns a
    1-row DataFrame ``(n_triangles: bigint)``.

    Orient every edge from its (degree, id)-smaller endpoint to the
    larger — a total order, so orientation is well-defined and
    acyclic — then each triangle {a < b < c} in that order is counted
    exactly once, at edge (a, b), as membership of c in
    N+(a) INTERSECT N+(b).

    Scale shape: out-degree under degree orientation is O(sqrt(m)),
    so the collected out-neighbor arrays stay KB-sized regardless of
    clique size, and the count is one edge-cardinality join plus an
    in-row ``array_intersect`` — the THETA(n_triangles) wedge set
    that a join-enumeration plan (e1 JOIN e2 JOIN e3) materializes
    and sorts is never built. On a corpus where exact-dup cliques
    grow linearly with replication, wedges grow cubically; this form
    grows linearly in m^1.5 and spills gracefully (SMJ everywhere,
    nothing broadcast, no per-task hash builds).
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ds = deg.select(F.col("node").alias("src"), F.col("deg").alias("deg_s"))
    dd = deg.select(F.col("node").alias("dst"), F.col("deg").alias("deg_d"))
    src_first = (F.col("deg_s") < F.col("deg_d")) | (
        (F.col("deg_s") == F.col("deg_d")) & (F.col("src") < F.col("dst"))
    )
    # Every join side is edge- or node-cardinality (corpus-derived):
    # merge hints pin spill-safe SMJ — AQE's auto-broadcast and a
    # shuffled-hash build both OOM'd the plain-driver 10x contract
    # drive on exactly this operator's predecessors.
    oriented = (
        edges.join(ds.hint("merge"), "src")
        .join(dd.hint("merge"), "dst")
        .select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
        .localCheckpoint()
    )
    adj = oriented.groupBy(F.col("u").alias("node")).agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    )
    au = adj.select(F.col("node").alias("u"), F.col("nbrs").alias("nbrs_u"))
    av = adj.select(F.col("node").alias("v"), F.col("nbrs").alias("nbrs_v"))
    v_type = oriented.schema["v"].dataType.simpleString()
    empty = F.array().cast(f"array<{v_type}>")
    return (
        oriented.join(au.hint("merge"), "u")
        .join(av.hint("merge"), "v", "left")
        .select(
            F.size(
                F.array_intersect(
                    F.col("nbrs_u"), F.coalesce(F.col("nbrs_v"), empty)
                )
            ).alias("n_tri")
        )
        .agg(F.coalesce(F.sum("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )
