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
