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
from pyspark.storagelevel import StorageLevel

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
    """Exact triangle count by degree-ordered wedge counting
    (node-iterator++ with map-side combine).

    ``edges``: columns ``src``, ``dst``, one row per undirected edge,
    no self-loops, no duplicate edges in either direction. Returns a
    1-row DataFrame ``(n_triangles: bigint)``.

    Orient every edge from its (degree, id)-smaller endpoint to the
    larger — a total order, so orientation is well-defined and
    acyclic. For a triangle {a < b < c} in that order, its three
    edges orient a→b, a→c, b→c, so it is counted exactly once: as
    the wedge (b, c) generated at a, closed by the oriented edge
    (b, c).

    Scale shape, in order of what goes wrong on dense near-dup
    graphs (every alternative below was MEASURED to OOM a plain-1g
    driver on the 10x-replicated corpus, m = 4.9M edges,
    sum(outdeg^2) = 6e8):

    * Join-enumeration (e1 JOIN e2 JOIN e3) sorts the THETA(sum
      outdeg^2) wedge set for its second SMJ — died in the spill
      merger.
    * Attaching full out-neighbor arrays to every edge and
      ``array_intersect``-ing ships the same THETA(sum outdeg^2)
      entries, just packaged as per-edge array copies — died the
      same way.
    * This form never materializes raw wedges across a shuffle:
      wedges stream out of a per-adjacency-row generator (posexplode
      + tail-slice explode, every in-flight array bounded by the
      O(sqrt(m)) degree-ordered out-degree) straight into a partial
      hash aggregate, so the shuffle carries only DISTINCT wedge
      endpoints with counts. On clique-heavy graphs (the near-dup
      case) that is a ~100x map-side compression: distinct wedges
      are O(m) while raw wedges are O(m^1.5). The close step is one
      skinny-row SMJ against the oriented edges — nothing
      broadcast, no per-task hash build, every sort spillable.
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
    # DISK_ONLY: the oriented edge table is data-sized, and holding
    # its deserialized blocks in heap storage while 8 concurrent sort
    # tasks need execution memory is what OOM'd the plain-1g sf1
    # drive — checkpoint blocks must not compete with sorts for heap.
    oriented = (
        edges.join(ds.hint("merge"), "src")
        .join(dd.hint("merge"), "dst")
        .select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    adj = oriented.groupBy(F.col("u").alias("node")).agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    )
    # Wedge generator: for each sorted adjacency row, emit every
    # ordered pair (nbrs[i], nbrs[j]) with i < j — as two chained
    # generators so no intermediate array ever exceeds the adjacency
    # row itself. Immediately grouped: the partial (map-side) hash
    # aggregate collapses repeated wedges BEFORE the shuffle.
    wedge_counts = (
        adj.select(F.posexplode("nbrs").alias("i", "lo"), F.col("nbrs"))
        .select(
            "lo",
            F.explode(
                F.slice(
                    F.col("nbrs"), F.col("i") + 2, F.greatest(F.size("nbrs"), F.lit(1))
                )
            ).alias("hi"),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_wedges"))
    )
    # Wedge pairs come out id-ordered (the adjacency array is sorted
    # by id), while oriented edges run (degree, id)-low to high — so
    # normalize the closing edge to id order for the equi-join. The
    # once-per-triangle guarantee lives in WHERE the wedge is
    # generated (only at the (degree, id)-minimum vertex), not in
    # the close key's ordering.
    closing = oriented.select(
        F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
    )
    return (
        wedge_counts.join(closing.hint("merge"), ["lo", "hi"])
        .agg(
            F.coalesce(F.sum("n_wedges"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )


PR_SCALE = 10**12     # fixed-point rank scale (1.0 == 10^12)
PR_DAMP = 85          # damping factor, percent


def pagerank_integer(edges: DataFrame, iterations: int) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge set, in exact
    fixed-point integer arithmetic.

    edges: columns ``src``, ``dst`` (undirected; both directions are
    derived internally). Vertices are the edge endpoints — callers
    wanting isolated vertices ranked must handle them separately (an
    isolated vertex's rank is the constant teleport term anyway).
    Returns (id, pr) with pr a BIGINT on the 10^12 fixed-point scale.

    Why integers: float PageRank sums are order-sensitive, so a
    distributed reduce is not bit-reproducible run-to-run, let alone
    engine-to-engine. On the fixed-point lattice every contribution is
    rank div degree (integer division, positive operands), the
    neighbor sum is an associative BIGINT sum, and the damping step is
    (85 * s) div 100 — deterministic everywhere, same answer in the
    unrolled-CTE SQL oracle. Overflow headroom: the damping multiply
    is evaluated as 85*(s div 100) + (85*(s mod 100)) div 100 —
    algebraically identical for s >= 0 but never forming the 85x
    intermediate (a naive 85*s wraps int64 once a hub's neighbor sum
    passes ~1.1e17, i.e. ~1e5 star neighbors at this SCALE, and Spark
    multiplies BIGINTs silently in non-ANSI mode while the oracle's
    HUGEINT stays exact). With the decomposition the binding bound is
    the neighbor sum itself, <= SCALE * n_vertices: 2^63 accommodates
    ~9e6 vertices per component at this scale; drop SCALE one decade
    per decade above that.

    Scale notes: each iteration is one key join + one groupBy — the
    same shuffle shape as connected_components; the rank vector is the
    only state that moves. The iteration count is a fixed constant,
    so the lineage stays O(iterations) deep and needs no
    checkpointing.

    Iterations-vs-stability: the fixed count is EVIDENCE-backed for
    the graph class this ranks — on the registered dup-pair graph the
    full rank order is identical across iterations PR_ITERS-1 ..
    PR_ITERS+1 (tests/test_pagerank_pq.py::
    test_pagerank_rank_order_stable_at_shipped_iterations), so more
    rounds cannot change a keep/drop decision. The claim is scoped,
    not universal: undirected power iteration oscillates rank order
    with period 2 on path-like graphs (negative adjacency
    eigenvalues; demonstrated by the lollipop fixture in
    test_pagerank_order_oscillation_caveat_is_real). Dup clusters
    are near-cliques, the non-oscillating class; rank a path-heavy
    graph and you must average consecutive iterates or check parity.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    both_ways = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both_ways.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ids = deg.select(F.col("src").alias("id"))
    base = (100 - PR_DAMP) * PR_SCALE // 100
    ranks = ids.select("id", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for _ in range(iterations):
        contribs = (
            both_ways.join(deg, "src")
            .join(ranks, F.col("src") == F.col("id"))
            .select(F.col("dst"), F.expr("pr div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            ids.join(contribs, ids.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit(base)
                    # == (DAMP * s) div 100 for s >= 0, without the
                    # DAMP-x intermediate (see overflow headroom above)
                    + F.expr(
                        f"{PR_DAMP} * (coalesce(s, CAST(0 AS BIGINT))"
                        f" div 100) + ({PR_DAMP} *"
                        " (coalesce(s, CAST(0 AS BIGINT)) % 100)) div 100"
                    )
                )
                .cast("bigint")
                .alias("pr"),
            )
        )
    return ranks
