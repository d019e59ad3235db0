"""Similarity search over the `embeddings` table (SURVEY.md §2.3).

Approximate-nearest-neighbor building blocks on an array<float>
column. The cross-engine-exactness trick: embeddings are quantized to
integers (round(x * 1000) — exact, because a float32 times 1000 is
exactly representable in a double and can never land on a .5 tie, see
proof in ``quantize``), so dot products and norms are exact BIGINT
arithmetic in both engines, and cosine = dot / sqrt(na*nb) uses only
IEEE-correctly-rounded ops (*, /, sqrt) → bit-identical doubles.

Scale design (100 TB / billions of vectors):
* brute-force top-k (sim_topk_cosine) is the per-query baseline: the
  query set is broadcast, each executor scores its partition of the
  corpus and emits per-partition top-k; only k rows per query cross
  the final shuffle.
* IVF-style pruning (sim_nn_within_label): restrict scoring to the
  query's cell — here the label column stands in for a learned
  coarse quantizer; the join is on the cell key, so candidates
  co-locate and the cross-cell pair explosion never happens.
* sign-LSH (sim_lsh_bucket_stats): md5-derived random hyperplanes →
  bucket code; near-identical vectors collide. The plane count scales
  with floor(log2(corpus)) (clamped to [8, 24]) so expected bucket
  occupancy stays ~1 at any scale. Bucketing is one narrow map,
  candidates join per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.io import adaptive_partitions, load
from etl_spark.operators.caching import session_cached
from etl_spark.plans.registry import register

QUANT = 1000
DIM = 64


def _sim_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Size-derived partition count for the embedding scoring kernels
    (guide §2.2): ceil(corpus rows / 16384), floor 1 — the flat
    repartition(defaultParallelism) this replaces paid 32 task
    launches per pass to score a few thousand vectors at the local
    scales, while a constant tuned local would serialize a real
    corpus. Same target as plans/ml.py's EMB_ROWS_PER_PARTITION: the
    kernels are skinny numpy matmuls, so 16k rows ≈ 8 MB and
    milliseconds per task."""
    return adaptive_partitions(spark, sf_dir, "embeddings", 16384)


def quantize(col) -> Column:
    """array<float> → array<bigint> via round(double(x) * QUANT).

    Exactness: float32 has a 24-bit mantissa, so double(x) * 1000 is
    exact (24+10 < 53 bits); an exact product of a dyadic rational and
    1000 can never be exactly k + 0.5 (k + 0.5 = (2k+1)/2 would force
    x = (2k+1)/2000, which is not dyadic) → round() has no ties and
    both engines return the same integer.
    """
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("bigint"))


def dot(a, b) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine(dot_ab, norm_a, norm_b) -> Column:
    """dot/sqrt(na*nb) in doubles — correctly-rounded ops only."""
    return dot_ab.cast("double") / F.sqrt(
        norm_a.cast("double") * norm_b.cast("double")
    )


_QUANT_SQL = f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"


def _vec_cte() -> str:
    return f"""
      SELECT vec_id, label, {_QUANT_SQL} AS q,
             CAST(list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS BIGINT) AS norm
      FROM embeddings
    """


N_QUERIES = 10
TOP_K = 5

# Candidate-side chunk size for the within-cell exact NN scan: bounds
# per-task memory (BLOCK x NN_CELL_CHUNK score doubles) and sets the
# parallelism of a cell to ceil(cell_n / NN_CELL_CHUNK) tasks. Tests
# shrink it to force the multi-chunk path on the small fixtures.
NN_CELL_CHUNK = 8192


@register(
    "sim_topk_cosine",
    oracle=f"""
    WITH vec AS ({_vec_cte()}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.q, c.q) AS DOUBLE)
               / sqrt(CAST(q.norm AS DOUBLE) * CAST(c.norm AS DOUBLE)) AS cos_sim
      FROM vec q JOIN vec c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
       AND q.norm > 0 AND c.norm > 0
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
    doc=f"Brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors: "
        "the exact-scoring baseline every ANN variant is measured "
        "against. Query side broadcast; corpus scanned once.",
    tags=("similarity", "llm", "ann"),
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The query set is config-sized (N_QUERIES vectors): collect it once
    # and ship it inside the scoring closure as a numpy constant — the
    # "broadcast the queries, scan the corpus once" ANN baseline. Each
    # corpus partition scores against all queries with one matmul
    # (Arrow in, vectorized, no per-pair interpreted lambdas).
    # Exactness: quantized integer products/sums stay < 2^53, so
    # float64 matmul is exact in any summation order, and dot/sqrt(na*nb)
    # is correctly-rounded IEEE — bit-identical to the DuckDB oracle.
    # Zero-norm vectors are excluded from cosine scoring on BOTH
    # sides (cos is undefined for them; Spark would emit IEEE NaN/Inf
    # where DuckDB nulls the division) — emb_norm_stats is the audit
    # that surfaces such vectors to the pipeline owner.
    emb = (
        load(spark, sf_dir, "embeddings")
        .repartition(_sim_partitions(spark, sf_dir))
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .filter(dot(F.col("q"), F.col("q")) > 0)
    )
    q_rows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    query_ids = [r["vec_id"] for r in q_rows]
    query_vecs = [r["q"] for r in q_rows]

    def score_batches(it):
        import numpy as np
        import pandas as pd

        QM = np.array(query_vecs, dtype=np.float64)  # (nq, dim), exact ints
        q_norms = (QM * QM).sum(axis=1)
        qids = np.array(query_ids, dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            C = np.array(pdf["q"].tolist(), dtype=np.float64)
            c_norms = (C * C).sum(axis=1)
            cos = (C @ QM.T) / np.sqrt(np.outer(c_norms, q_norms))
            cids = pdf["vec_id"].values
            # Batch-local top-k under the SAME total order the final
            # window applies (cos desc, neighbor asc; self excluded):
            # only k rows per query per batch cross the exchange
            # instead of the full n x nq score matrix — the
            # "per-partition top-k" the module contract promises
            # (argmax-prefix associativity: the global top-k is a
            # subset of the union of batch top-ks, bit-identically,
            # because cos values are the same float64s in every
            # batch and lexsort applies the same tiebreak).
            for j, qid in enumerate(qids):
                col = cos[:, j]
                keep = cids != qid
                col, ids = col[keep], cids[keep]
                if not len(ids):
                    continue
                order = np.lexsort((ids, -col))[:TOP_K]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qid, dtype=np.int64),
                        "neighbor_id": ids[order],
                        "cos_sim": col[order],
                    }
                )

    scored = emb.mapInPandas(
        score_batches, schema="query_id bigint, neighbor_id bigint, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "sim_nn_within_label",
    oracle=f"""
    WITH vec AS ({_vec_cte()}),
    scored AS (
      SELECT a.vec_id, a.label,
             b.vec_id AS nn_id,
             CAST(list_dot_product(a.q, b.q) AS DOUBLE)
               / sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) AS cos_sim
      FROM vec a JOIN vec b ON a.label = b.label AND a.vec_id <> b.vec_id
       AND a.norm > 0 AND b.norm > 0
    )
    SELECT vec_id, label, nn_id, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cos_sim DESC, nn_id ASC) AS rn
      FROM scored
    )
    WHERE rn = 1
    """,
    doc="IVF-style pruned nearest neighbor: score only within the "
        "vector's coarse cell (label = stand-in quantizer cell). The "
        "equi-join on the cell key co-locates candidates — the Spark "
        "shape of an IVF index probe.",
    tags=("similarity", "llm", "ann", "ivf"),
)
def sim_nn_within_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chunked exact scan per IVF cell. The naive shape (one applyInPandas
    # group per cell) ships the WHOLE cell to one task and builds an m x m
    # score matrix — at a 100x-scale probe (20k vectors/cell) that was a
    # 3.2 GB matrix on a single task and the worst timing in the sweep.
    # Instead: split each cell's CANDIDATE side into hash chunks of
    # <= CHUNK vectors, replicate the cell's queries to every chunk, and
    # compute a local argmax per (cell, chunk) with a blocked matmul.
    # A global max over (cos_sim, nn_id asc) then recovers the exact
    # per-vector nearest neighbor — argmax is associative, cos values are
    # bit-identical float64s in every chunk, and the struct max applies
    # the same tiebreak, so the result is byte-equal to the single-matrix
    # form (and to the DuckDB oracle).
    #
    # Scale accounting per cell of m vectors: parallelism = ceil(m/CHUNK)
    # tasks instead of 1; per-task memory = BLOCK x CHUNK doubles (~0.5 GB
    # worst case, independent of m); shuffle = m * n_chunks = m^2/CHUNK
    # single-vector rows instead of one m-row group (and ~CHUNK x fewer
    # bytes than the m^2 pair rows a self-join would emit).
    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", quantize(F.col("embedding")).alias("q"))
        # Zero-norm vectors excluded from cosine scoring (both sides;
        # see sim_topk_cosine).
        .filter(dot(F.col("q"), F.col("q")) > 0)
    )

    # Cells are the IVF coarse-quantizer's nlist — config-sized (10 here,
    # a few thousand in a real index), so the per-cell count table is a
    # legitimate broadcast at any data scale.
    cells = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cell_n"))
        .withColumn(
            "n_chunks",
            F.greatest(F.lit(1), F.ceil(F.col("cell_n") / NN_CELL_CHUNK)).cast("int"),
        )
        .select("label", "n_chunks")
    )
    # The corpus side carries c_-prefixed names: cogroup on two frames
    # cut from the same lineage trips Spark's ambiguous-self-join check
    # unless every non-key attribute resolves uniquely. Keys match by
    # position in cogroup, so the rename is free.
    corpus = emb.join(F.broadcast(cells), "label").select(
        F.col("label").alias("c_label"),
        F.pmod(F.xxhash64("vec_id"), F.col("n_chunks")).cast("int").alias("c_chunk_id"),
        F.col("vec_id").alias("c_vec_id"),
        F.col("q").alias("c_q"),
    )
    queries = emb.join(F.broadcast(cells), "label").select(
        "label",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        "vec_id",
        "q",
    )

    def nn_per_chunk(qpdf, cpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            columns=["vec_id", "label", "nn_id", "cos_sim"]
        ).astype(
            {"vec_id": "int64", "label": "int32", "nn_id": "int64", "cos_sim": "float64"}
        )
        if len(qpdf) == 0 or len(cpdf) == 0:
            return empty
        # Candidates sorted by vec_id so np.argmax's first-max rule
        # implements the nn_id-ascending tiebreak.
        cpdf = cpdf.sort_values("c_vec_id").reset_index(drop=True)
        # vstack over the Arrow-delivered ndarray elements is C-speed;
        # .tolist() would round-trip through Python ints.
        C = np.vstack(cpdf["c_q"].to_numpy()).astype(np.float64)
        c_ids = cpdf["c_vec_id"].to_numpy()
        c_norm = np.einsum("ij,ij->i", C, C)  # exact: integers < 2^53
        out = []
        BLOCK = 2048
        for lo in range(0, len(qpdf), BLOCK):
            blk = qpdf.iloc[lo : lo + BLOCK]
            Q = np.vstack(blk["q"].to_numpy()).astype(np.float64)
            q_ids = blk["vec_id"].to_numpy()
            G = Q @ C.T  # exact integer-valued float64 products
            cos = G / np.sqrt(np.outer(np.einsum("ij,ij->i", Q, Q), c_norm))
            cos[q_ids[:, None] == c_ids[None, :]] = -np.inf  # mask self
            nn_idx = np.argmax(cos, axis=1)
            best = cos[np.arange(len(blk)), nn_idx]
            keep = np.isfinite(best)  # chunk held only the query itself
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": q_ids[keep],
                        "label": blk["label"].to_numpy()[keep],
                        "nn_id": c_ids[nn_idx[keep]],
                        "cos_sim": best[keep],
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    local = (
        queries.groupBy("label", "chunk_id")
        .cogroup(corpus.groupBy("c_label", "c_chunk_id"))
        .applyInPandas(
            nn_per_chunk,
            schema="vec_id bigint, label int, nn_id bigint, cos_sim double",
        )
    )
    # Associative global argmax with the (cos_sim desc, nn_id asc)
    # tiebreak encoded as a struct max; exact because equal float64 cos
    # values compare equal across chunks.
    best = (
        local.groupBy("vec_id", "label")
        .agg(F.max(F.struct(F.col("cos_sim"), (-F.col("nn_id")).alias("neg_nn"))).alias("b"))
        .select(
            "vec_id",
            "label",
            (-F.col("b.neg_nn")).alias("nn_id"),
            F.col("b.cos_sim").alias("cos_sim"),
        )
    )
    return best


# Sign-LSH plane count scales with corpus size: expected bucket
# occupancy is n / 2^planes, so planes must grow with log2(n) or
# per-bucket candidate joins go quadratic at billions of vectors
# (8 fixed planes = 256 buckets forever was the round-2 flaw).
# floor(log2(n)) keeps mean occupancy around 1-2; clamped to [8, 24]
# so tiny corpora keep enough buckets to be meaningful and the bucket
# id stays a cheap int. The plane family is a fixed md5-derived
# sequence, so plane p is the SAME hyperplane at every scale — scaling
# up only appends planes (bucket_new % 2^old_planes == bucket_old).
N_PLANES_MIN = 8
N_PLANES_MAX = 24


def eff_planes(n_vectors: int) -> int:
    """Plane count for a corpus of ``n_vectors``: clamp(floor(log2 n))."""
    import math

    if n_vectors < 2:
        return N_PLANES_MIN
    return max(N_PLANES_MIN, min(N_PLANES_MAX, int(math.log2(n_vectors))))


# SQL twin of eff_planes — evaluated by DuckDB against the same table,
# so both engines derive the identical plane count from the data.
_EFF_PLANES_SQL = (
    f"LEAST({N_PLANES_MAX}, GREATEST({N_PLANES_MIN}, "
    "CAST(floor(log2((SELECT COUNT(*) FROM embeddings))) AS INTEGER)))"
)


def _plane_sign_sql(p: int, i: str) -> str:
    # +1/-1 pseudo-random sign for plane p, dimension i, from md5 parity.
    return (
        f"CASE WHEN (strpos('0123456789abcdef', "
        f"substr(md5('{p}|' || CAST({i} AS VARCHAR)), 1, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END"
    )


def _bucket_sql(n_planes: int = N_PLANES_MAX) -> str:
    """Full ``n_planes``-bit bucket; callers modulo down to the
    effective plane count (bit p is worth 2^p, so ``bucket % 2^k``
    IS the k-plane bucket)."""
    bits = []
    for p in range(n_planes):
        proj = (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> q[i] * ({_plane_sign_sql(p, 'i')})))"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN {2 ** p} ELSE 0 END")
    return " + ".join(bits)


# Effective bucket for the data-derived plane count: the static SQL
# computes all N_PLANES_MAX projections, then keeps the low eff bits.
_EFF_BUCKET_SQL = (
    f"CAST({{bucket}} AS BIGINT) % CAST(pow(2, {_EFF_PLANES_SQL}) AS BIGINT)"
)


def _bucket_column(n_planes: int):
    """Sign-LSH bucket expression over the quantized column q,
    using the first ``n_planes`` hyperplanes of the fixed family."""
    import hashlib

    signs = [
        [
            1 if int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[0], 16) % 2 == 1 else -1
            for i in range(1, DIM + 1)
        ]
        for p in range(n_planes)
    ]
    bucket = None
    for p in range(n_planes):
        sign_arr = F.array(*[F.lit(s) for s in signs[p]])
        proj = F.aggregate(
            F.zip_with(F.col("q"), sign_arr, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("bigint")


def corpus_planes(spark: SparkSession, sf_dir: str) -> int:
    """Plane count from the corpus cardinality WITHOUT a per-build
    count job over the data: config override first (the cluster
    deployment path — table statistics / catalog row counts supply
    this), then the parquet footer row count (metadata-only, no row
    scan), then a count() as the last-resort fallback."""
    n = spark.conf.get("etl_spark.ann.n_vectors", None)
    if n is not None:
        return eff_planes(int(n))
    try:
        import os

        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "embeddings.parquet")
        return eff_planes(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return eff_planes(load(spark, sf_dir, "embeddings").count())


def lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached sign-LSH-bucketed embeddings (vec_id, q, norm,
    bucket; zero-norm rows excluded) — r10 opt, guide §2.4: both
    sim_ann_lsh_probe and dedup_embedding_cosine consume this frame on
    BOTH sides of their bucket join, and the executed plans showed no
    exchange reuse across the aliased copies, so the quantize + exact
    integer dot + md5-plane projections (the expensive interpreted
    expressions here) ran once per side. One materialization serves
    both sides of both queries; a bench clearCache() unpersists it and
    the next consumer rebuilds from parquet."""
    planes = corpus_planes(spark, sf_dir)

    def build() -> DataFrame:
        return (
            load(spark, sf_dir, "embeddings")
            .repartition(_sim_partitions(spark, sf_dir))
            .select("vec_id", quantize(F.col("embedding")).alias("q"))
            .withColumn("norm", dot(F.col("q"), F.col("q")))
            # Zero-norm vectors excluded from cosine scoring (see
            # sim_topk_cosine).
            .filter(F.col("norm") > 0)
            .withColumn("bucket", _bucket_column(planes))
        )

    return session_cached("lsh_bucketed", spark, sf_dir, build)


@register(
    "sim_ann_lsh_probe",
    # Approximate ≠ non-deterministic: the probe is an exact integer/
    # correctly-rounded-double function of the data (md5 planes,
    # BIGINT projections, exact cosine), so DuckDB replays the entire
    # ANN pipeline — data-derived plane count, bucketing, Hamming-1
    # probe fan-out, candidate scoring, top-1 — bit-for-bit. RECALL vs
    # the brute-force baseline stays bounded in tests/test_ann_recall.py.
    oracle=f"""
    WITH vec AS MATERIALIZED ({_vec_cte()}),
    np AS (SELECT {_EFF_PLANES_SQL} AS n),
    b AS MATERIALIZED (
      SELECT vec_id, q, norm,
             {_EFF_BUCKET_SQL.format(bucket=_bucket_sql())} AS bucket
      FROM vec WHERE norm > 0
    ),
    probes AS (
      SELECT b.vec_id AS query_id, b.q AS q_q, b.norm AS norm_q,
             CASE WHEN g.p = 0 THEN b.bucket
                  ELSE xor(b.bucket, CAST(pow(2, g.p - 1) AS BIGINT))
             END AS bucket
      FROM b CROSS JOIN (
        SELECT unnest(generate_series(0, (SELECT n FROM np))) AS p) g
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS nn_id,
             CAST(list_dot_product(p.q_q, c.q) AS DOUBLE)
               / sqrt(CAST(p.norm_q AS DOUBLE) * CAST(c.norm AS DOUBLE))
               AS cos_sim
      FROM probes p JOIN b c USING (bucket)
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, nn_id, cos_sim FROM (
      SELECT query_id, nn_id, cos_sim, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, nn_id ASC) AS rn
      FROM scored) WHERE rn = 1
    """,
    doc="End-to-end ANN query: sign-LSH bucketing (log2(corpus)-scaled "
        "plane count) with Hamming-1 multiprobe — each vector probes "
        "its own bucket plus the single-bit-flip neighbors, scores only "
        "those candidates exactly, and keeps the top-1. The 100 TB "
        "shape: candidate generation is an equi-join on the bucket id "
        "(planes+1 probe rows per query), never an all-pairs scan, and "
        "bucket occupancy stays ~constant as the corpus grows.",
    tags=("similarity", "llm", "ann", "lsh"),
)
def sim_ann_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    planes = corpus_planes(spark, sf_dir)
    emb = lsh_bucketed(spark, sf_dir)
    # Probe set: own bucket + Hamming-1 neighbors (bit flips).
    probes = F.array(
        F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(2 ** p)) for p in range(planes)
        ]
    )
    queries = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("q_q"),
        F.col("norm").alias("norm_q"),
        F.explode(probes).alias("bucket"),
    )
    cand = queries.join(emb, "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("nn_id"),
        cosine(dot(F.col("q_q"), F.col("q")), F.col("norm_q"), F.col("norm")).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("nn_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "nn_id", "cos_sim")
    )


@register(
    "sim_lsh_bucket_stats",
    oracle=f"""
    WITH vec AS (
      SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, label,
             {_EFF_BUCKET_SQL.format(bucket=_bucket_sql())} AS bucket
      FROM vec
    )
    SELECT bucket, COUNT(*) AS n_vectors, COUNT(DISTINCT label) AS n_labels
    FROM bucketed
    GROUP BY bucket
    """,
    doc="Sign-LSH bucketing: md5-derived ±1 hyperplanes → bucket code "
        "per vector (integer projections, engine-exact), with the plane "
        "count scaled to floor(log2(corpus)) so occupancy stays bounded "
        "as the corpus grows. The oracle derives the identical count "
        "from COUNT(*) and masks a full-width bucket down to it. Bucket "
        "histogram validates the partitioning the scale-path candidate "
        "join (sim_ann_lsh_probe) runs on.",
    tags=("similarity", "llm", "ann", "lsh"),
)
def sim_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    planes = corpus_planes(spark, sf_dir)
    emb = (
        load(spark, sf_dir, "embeddings")
        .repartition(_sim_partitions(spark, sf_dir))
        .select("vec_id", "label", quantize(F.col("embedding")).alias("q"))
    )
    # Deterministic ±1 planes via the shared md5-parity derivation.
    return (
        emb.withColumn("bucket", _bucket_column(planes))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count_distinct("label").alias("n_labels"),
        )
    )


COSINE_DUP_THRESHOLD = 0.4


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH vec AS ({_vec_cte()}),
    bucketed AS (
      SELECT vec_id, q, norm,
             {_EFF_BUCKET_SQL.format(bucket=_bucket_sql())} AS bucket
      FROM vec
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_dot_product(a.q, b.q) AS DOUBLE)
             / sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.vec_id < b.vec_id
     AND bit_count(xor(a.bucket, b.bucket)) <= 1
     AND a.norm > 0 AND b.norm > 0
    WHERE CAST(list_dot_product(a.q, b.q) AS DOUBLE)
            / sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE))
          >= {COSINE_DUP_THRESHOLD}
    """,
    doc=f"Embedding-cosine near-duplicate pairs (cos ≥ "
        f"{COSINE_DUP_THRESHOLD}) among sign-LSH candidates: only pairs "
        "whose bucket codes are within Hamming distance 1 are scored "
        "exactly. The Spark plan is a bucket equi-join after a "
        "Hamming-1 multiprobe explode — NEVER a cartesian all-pairs "
        "scan (that was the round-2 flaw); the oracle applies the "
        "identical gate, so the pair is exact at every scale. Plane "
        "count scales with log2(corpus).",
    tags=("similarity", "llm", "dedup", "neardup", "lsh"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    planes = corpus_planes(spark, sf_dir)
    # Session-cached bucketed frame (see lsh_bucketed): the probe
    # explode and the candidate side below both read it.
    emb = lsh_bucketed(spark, sf_dir)
    # Multiprobe from the left side only: the identity probe catches
    # same-bucket pairs, the flip-p probe catches pairs differing in
    # exactly bit p — mutually exclusive, so each unordered pair with
    # Hamming(bucket) <= 1 is generated exactly once.
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2 ** p)) for p in range(planes)],
    )
    left = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("q_a"),
        F.col("norm").alias("norm_a"),
        F.explode(probes).alias("bucket"),
    )
    cand = left.join(emb, "bucket").filter(F.col("vec_a") < F.col("vec_id"))
    cos = cosine(dot(F.col("q_a"), F.col("q")), F.col("norm_a"), F.col("norm"))
    return (
        cand.select(
            "vec_a",
            F.col("vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
    )


@register(
    "emb_label_centroid_sim",
    oracle=f"""
    WITH vec AS (
      SELECT label, {_QUANT_SQL} AS q FROM embeddings
    ),
    dims AS (
      SELECT label, i, q[i] AS v
      FROM vec CROSS JOIN UNNEST(range(1, {DIM + 1})) AS t(i)
    ),
    sums AS (
      SELECT label, i, CAST(SUM(v) AS BIGINT) AS s
      FROM dims GROUP BY label, i
    ),
    cent AS (
      SELECT label, list(s ORDER BY i) AS sv,
             CAST(MIN(cnt) AS BIGINT) AS n_vecs
      FROM (SELECT s.*,
                   (SELECT COUNT(*) FROM vec v WHERE v.label = s.label) AS cnt
            FROM sums s)
      GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           a.n_vecs AS n_a, b.n_vecs AS n_b,
           CAST(CAST(list_dot_product(a.sv, b.sv) AS DOUBLE)
                / NULLIF(sqrt(CAST(list_dot_product(a.sv, a.sv) AS DOUBLE)
                              * CAST(list_dot_product(b.sv, b.sv) AS DOUBLE)), 0)
                AS DOUBLE) AS centroid_cos
    FROM cent a JOIN cent b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
    doc="Pairwise cosine similarity between per-label mean embeddings "
        "(cluster separation report). Key identity: cos(S_a/n_a, "
        "S_b/n_b) = cos(S_a, S_b) — the counts cancel — so centroids "
        "are kept as exact integer SUM-vectors and never divided, "
        "making the result bit-identical to the oracle. Plan: "
        "posexplode to (label, dim) — a 64x row map-side multiplier — "
        "one combinable groupBy, re-assemble k x 64 sum-vectors, then "
        "a trivial k^2 self-join (k = #labels, config-sized).",
    tags=("similarity", "llm", "statistics"),
)
def emb_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "label", quantize(F.col("embedding")).alias("q")
    )
    dims = emb.select(
        "label", F.posexplode("q").alias("pos", "v")
    )
    sums = dims.groupBy("label", "pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    cent = sums.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda x: x.s,
        ).alias("sv"),
        F.min("cnt").alias("n_vecs"),
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("sv").alias("sv_a"),
        F.col("n_vecs").alias("n_a"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("sv").alias("sv_b"),
        F.col("n_vecs").alias("n_b"),
    )
    pair = a.join(b, F.col("label_a") < F.col("label_b"))
    cos = cosine(
        dot(F.col("sv_a"), F.col("sv_b")),
        dot(F.col("sv_a"), F.col("sv_a")),
        dot(F.col("sv_b"), F.col("sv_b")),
    )
    return pair.select(
        "label_a", "label_b", "n_a", "n_b", cos.alias("centroid_cos")
    ).orderBy("label_a", "label_b")


@register(
    "emb_norm_stats",
    oracle=f"""
    WITH vec AS (
      SELECT label,
             CAST(list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS BIGINT)
               AS norm2
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)   AS n_vecs,
           CAST(MIN(norm2) AS BIGINT) AS min_norm2,
           CAST(MAX(norm2) AS BIGINT) AS max_norm2,
           CAST(CAST(SUM(norm2) AS DOUBLE) / COUNT(*) AS DOUBLE)
             AS avg_norm2
    FROM vec
    GROUP BY label
    ORDER BY label
    """,
    doc="Per-label distribution of squared embedding L2 norms "
        "(quantized-integer units): the standard sanity audit before "
        "any cosine pipeline — un-normalized or degenerate vectors "
        "show up as norm outliers. Per-row integer dot product, one "
        "map-combinable aggregate; nothing but (label, bigint) ever "
        "shuffles.",
    tags=("similarity", "llm", "statistics", "aggregation"),
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        dot(
            quantize(F.col("embedding")), quantize(F.col("embedding"))
        ).alias("norm2"),
    )
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm2").alias("min_norm2"),
            F.max("norm2").alias("max_norm2"),
            (F.sum("norm2").cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_norm2"),
        )
        .orderBy("label")
    )


@register(
    "emb_dedup_exact",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, label,
             md5(array_to_string(
               list_transform({_QUANT_SQL}, x -> CAST(x AS VARCHAR)), ','))
               AS vec_hash
      FROM embeddings
    )
    SELECT vec_id, label, vec_hash,
           CAST(MIN(vec_id) OVER (PARTITION BY vec_hash) AS BIGINT)
             AS canonical_id,
           CAST(CASE WHEN vec_id <> MIN(vec_id) OVER (PARTITION BY vec_hash)
                THEN 1 ELSE 0 END AS INTEGER) AS is_duplicate
    FROM sig
    ORDER BY vec_id
    """,
    doc="Exact embedding dedup: md5 over the canonical string of the "
        "QUANTIZED vector (quantization absorbs sub-1e-3 float jitter, "
        "so re-encoded copies of the same content collide) — run "
        "before any ANN index build, since duplicate vectors waste "
        "index space and skew neighbor lists. Same canonical-window "
        "shape as dedup_exact: only the 32-byte hash shuffles, never "
        "the vector.",
    tags=("similarity", "llm", "dedup"),
)
def emb_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.md5(
            F.array_join(
                F.transform(
                    quantize(F.col("embedding")), lambda x: x.cast("string")
                ),
                ",",
            )
        ).alias("vec_hash"),
    )
    w = Window.partitionBy("vec_hash")
    return (
        emb.withColumn("canonical_id", F.min("vec_id").over(w))
        .withColumn(
            "is_duplicate",
            F.when(F.col("vec_id") != F.col("canonical_id"), 1)
            .otherwise(0)
            .cast("int"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation (ADC).
# --------------------------------------------------------------------------

PQ_M = 8                      # subspaces
PQ_SUBDIM = DIM // PQ_M       # dims per subspace
PQ_KS = 16                    # codewords per subspace (codebook = first PQ_KS vectors)
PQ_TOPK = 10
# ADC shortlist width for the exact-rerank refine step; 5x the answer
# size is the conventional refine ratio (recall receipt in SCALING.md:
# 0.200 -> 0.425 at this width on the uniform fixture).
PQ_RERANK = 5 * PQ_TOPK
PQ_QUERY_LO, PQ_QUERY_HI = 16, 20  # query vec_ids, disjoint from the codebook seeds


def _pq_d2_sql(a: str, b: str) -> str:
    """Exact integer squared-L2 between two quantized sub-vector lists."""
    return (
        f"CAST(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}) AS BIGINT)"
    )


@register(
    "sim_pq_adc",
    oracle=f"""
    WITH vec AS ({_vec_cte()}),
    sub AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    cb AS (
      SELECT sub.m, v.vec_id AS c,
             list_slice(v.q, sub.m * {PQ_SUBDIM} + 1, sub.m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cvec
      FROM vec v CROSS JOIN sub
      WHERE v.vec_id < {PQ_KS}
    ),
    encd AS (
      SELECT v.vec_id, cb.m, cb.c,
             {_pq_d2_sql(f"list_slice(v.q, cb.m * {PQ_SUBDIM} + 1, cb.m * {PQ_SUBDIM} + {PQ_SUBDIM})", "cb.cvec")} AS d2
      FROM vec v JOIN cb ON TRUE
    ),
    enc AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        FROM encd
      ) WHERE rn = 1
    ),
    queries AS (
      SELECT vec_id AS query_id, q FROM vec
      WHERE vec_id >= {PQ_QUERY_LO} AND vec_id < {PQ_QUERY_HI}
    ),
    adc AS (
      SELECT qq.query_id, e.vec_id,
             SUM({_pq_d2_sql(f"list_slice(qq.q, e.m * {PQ_SUBDIM} + 1, e.m * {PQ_SUBDIM} + {PQ_SUBDIM})", "cb.cvec")}) AS adc_d2
      FROM enc e
      JOIN cb ON cb.m = e.m AND cb.c = e.code
      CROSS JOIN queries qq
      WHERE e.vec_id <> qq.query_id
      GROUP BY qq.query_id, e.vec_id
    )
    SELECT query_id, vec_id, CAST(adc_d2 AS BIGINT) AS adc_d2,
           CAST(rn AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_d2, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {PQ_TOPK}
    """,
    doc=f"Product-quantization ANN with asymmetric distance computation: "
        f"the {DIM}-dim quantized vector is split into {PQ_M} subspaces of "
        f"{PQ_SUBDIM} dims; each subspace has a {PQ_KS}-codeword codebook "
        f"(deterministically the first {PQ_KS} vectors' sub-vectors, the "
        "same seeding discipline as ml_kmeans_step), and every corpus "
        f"vector is encoded as {PQ_M} small codes. Query-time ADC builds a "
        f"per-query {PQ_M}x{PQ_KS} lookup table of exact integer "
        "query-sub-to-codeword distances, so scoring a corpus vector is "
        f"{PQ_M} table lookups over its CODES — the scan never touches "
        "the raw vectors again. This is the genuine 100 TB memory story "
        f"for billion-vector search: {PQ_M} byte-sized codes (~{PQ_M} B) "
        f"replace {DIM} floats (~{DIM * 4} B) per vector, a "
        f"{DIM * 4 // PQ_M}x compression of the scan set. One corpus "
        "scan encodes AND scores in the same Arrow batch pass; each "
        f"batch pre-prunes to its local top-{PQ_TOPK} per query, so the "
        "only shuffle carries O(batches * queries * k) rows, never the "
        "corpus. All distances are exact BIGINTs on the quantization "
        "lattice (llm_similarity.py:40-46), so ADC replays bit-identically "
        "in the oracle's unrolled SQL.",
    tags=("similarity", "llm", "ann", "pq", "pandas-udf"),
)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("q")
    )
    # The repartition exists for the scoring pass's parallelism; the
    # driver collect below reads the un-shuffled source directly.
    emb = base.repartition(_sim_partitions(spark, sf_dir))
    out_schema = "query_id bigint, vec_id bigint, adc_d2 bigint"
    # ONE config-sized driver collect (<= PQ_KS + 4 rows; vec_id
    # pushdown reaches the scan), split driver-side — same discipline
    # as sim_topk_cosine's query set: codebook and queries ride in the
    # mapInPandas closure; the corpus is never collected.
    picked = sorted(
        base.filter(
            (F.col("vec_id") < PQ_KS)
            | (
                (F.col("vec_id") >= PQ_QUERY_LO)
                & (F.col("vec_id") < PQ_QUERY_HI)
            )
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    seed_rows = [r for r in picked if r["vec_id"] < PQ_KS]
    query_rows = [r for r in picked if r["vec_id"] >= PQ_QUERY_LO]
    if not seed_rows or not query_rows:
        # Degenerate corpus (fewer than PQ_QUERY_HI vectors): no codebook
        # or no queries -> empty result, matching the oracle's empty CTEs.
        return spark.createDataFrame(
            [], out_schema + ", rnk int"
        )
    import numpy as np

    # CB[c, m, :] = codeword c's sub-vector in subspace m.
    CB = np.array([r["q"] for r in seed_rows], dtype=np.int64).reshape(
        len(seed_rows), PQ_M, PQ_SUBDIM
    )
    Q = np.array([r["q"] for r in query_rows], dtype=np.int64).reshape(
        len(query_rows), PQ_M, PQ_SUBDIM
    )
    # LUT[qi, m, c] = exact ||query_sub - codeword||^2 (int64; bounded by
    # PQ_SUBDIM * (2*QUANT)^2 ~ 3e7, no overflow anywhere near 2^63).
    LUT = ((Q[:, None, :, :] - CB[None, :, :, :]) ** 2).sum(axis=3).transpose(0, 2, 1)
    qids = np.array([r["vec_id"] for r in query_rows], dtype=np.int64)

    def encode_score(it):
        import pandas as pd

        nq = len(qids)
        for pdf in it:
            if not len(pdf):
                continue
            C = np.array(pdf["q"].tolist(), dtype=np.int64).reshape(
                -1, PQ_M, PQ_SUBDIM
            )
            n = C.shape[0]
            vids = pdf["vec_id"].values.astype(np.int64)
            adc = np.zeros((n, nq), dtype=np.int64)
            for m in range(PQ_M):
                # (n, KS) exact distances to subspace-m codewords
                d = ((C[:, None, m, :] - CB[None, :, m, :]) ** 2).sum(axis=2)
                codes = d.argmin(axis=1)  # first minimum = lowest c on ties
                adc += LUT[:, m, codes].T
            frames = []
            for qi in range(nq):
                keep = vids != qids[qi]
                dv, vv = adc[keep, qi], vids[keep]
                # Batch-local top-k (ties -> lowest vec_id): the map-side
                # prune that keeps the shuffle O(batches * nq * k).
                top = np.lexsort((vv, dv))[:PQ_TOPK]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "vec_id": vv[top],
                            "adc_d2": dv[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = emb.mapInPandas(encode_score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOPK)
        .select("query_id", "vec_id", "adc_d2", "rnk")
    )


# --- Johnson-Lindenstrauss random projection: the dimensionality-
# reduction step in front of exact ANN scans. The sign matrix is a
# COMPILE-TIME config constant (md5-derived ±1 per (out_dim, in_dim)
# cell — Achlioptas' database-friendly JL variant), so both engines and
# the oracle share the identical projection by construction.
import hashlib as _hashlib  # noqa: E402

JL_DIM = 16
#: distortion band tested by exact integer cross-multiply:
#: ratio = d2p / (JL_DIM * d2) within [1/2, 2]
_JL_BAND_LO_NUM, _JL_BAND_HI_NUM = 1, 2
_JL_SIGNS = [
    [
        1
        if int(_hashlib.md5(f"jl_{j}_{d}".encode()).hexdigest()[:4], 16) % 2
        == 0
        else -1
        for d in range(DIM)
    ]
    for j in range(JL_DIM)
]


def _jl_oracle_sql() -> str:
    p_exprs = ", ".join(
        f"CAST(list_dot_product(q, {signs}) AS BIGINT)"
        for signs in _JL_SIGNS
    )
    return f"""
    WITH vec AS ({_vec_cte()}),
    proj AS (
      SELECT vec_id, norm, q, p,
             CAST(list_dot_product(p, p) AS BIGINT) AS pn
      FROM (SELECT vec_id, norm, q, [{p_exprs}] AS p FROM vec)
    ),
    pairs AS (
      SELECT a.vec_id AS query_id,
             CAST(a.norm + b.norm
                  - 2 * list_dot_product(a.q, b.q) AS BIGINT) AS d2,
             CAST(a.pn + b.pn
                  - 2 * list_dot_product(a.p, b.p) AS BIGINT) AS d2p
      FROM proj a JOIN proj b
        ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN 2 * d2p >= {JL_DIM} * d2
                          AND d2p <= 2 * {JL_DIM} * d2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
           CAST(SUM(CASE WHEN 2 * d2p >= {JL_DIM} * d2
                          AND d2p <= 2 * {JL_DIM} * d2
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS within_rate,
           MIN(CAST(d2p AS DOUBLE) / CAST({JL_DIM} * d2 AS DOUBLE))
             AS min_ratio,
           MAX(CAST(d2p AS DOUBLE) / CAST({JL_DIM} * d2 AS DOUBLE))
             AS max_ratio
    FROM pairs
    WHERE d2 > 0
    GROUP BY query_id
    ORDER BY query_id
    """


@register(
    "emb_jl_distortion",
    oracle=_jl_oracle_sql(),
    doc=f"Johnson-Lindenstrauss distance-distortion receipt: every "
        f"vector is projected {DIM} -> {JL_DIM} dims with a "
        "compile-time ±1 sign matrix (Achlioptas' sparse JL), and for "
        f"each of the {N_QUERIES} query vectors the squared-L2 "
        "distance to every other vector is compared against its "
        "projected estimate d2p/JL_DIM — the JL lemma's actual "
        "guarantee (E[d2p] = JL_DIM * d2, concentration ~ "
        "sqrt(2/JL_DIM)). Emits per query the fraction of pairs whose "
        "ratio stays within [1/2, 2] (tested by exact INTEGER "
        "cross-multiply — no float compare decides a count) plus the "
        "observed min/max ratio. This is the number that sizes a "
        "projection prefilter: a high in-band rate at 4x compression "
        "means a d2p scan with a 2x-slack threshold loses almost "
        "nothing. (Neighbor-rank recall is deliberately NOT the "
        "metric here: on this isotropic synthetic corpus pairwise "
        "distances concentrate and nearest-neighbor identity is "
        "statistically meaningless — distance distortion is the "
        "honest, data-independent JL contract.) Exact: integer "
        "inputs keep projections, distances and matmuls < 2^53; "
        "ratios are single identical IEEE divisions. Plan: one "
        "corpus scan; the closure aggregates PARTIALS per (query, "
        "batch) — count/in-band/min/max are all associative — so the "
        f"shuffle is {N_QUERIES} x n_batches rows, never pair-sized.",
    tags=("similarity", "llm", "ann", "projection"),
)
def emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load(spark, sf_dir, "embeddings")
        .repartition(_sim_partitions(spark, sf_dir))
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
    )
    q_rows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    query_ids = [r["vec_id"] for r in q_rows]
    query_vecs = [list(r["q"]) for r in q_rows]
    signs = [list(row) for row in _JL_SIGNS]
    jl = JL_DIM

    def partials(it):
        import numpy as np
        import pandas as pd

        S = np.array(signs, dtype=np.float64)
        QM = np.array(query_vecs, dtype=np.float64)
        PQ = QM @ S.T
        q_norms = (QM * QM).sum(axis=1)
        pq_norms = (PQ * PQ).sum(axis=1)
        qids = np.array(query_ids, dtype=np.int64)

        for pdf in it:
            if not len(pdf):
                continue
            C = np.array(pdf["q"].tolist(), dtype=np.float64)
            PC = C @ S.T
            cids = pdf["vec_id"].values.astype(np.int64)
            d2 = (
                (C * C).sum(axis=1)[:, None]
                + q_norms[None, :]
                - 2.0 * (C @ QM.T)
            )
            d2p = (
                (PC * PC).sum(axis=1)[:, None]
                + pq_norms[None, :]
                - 2.0 * (PC @ PQ.T)
            )
            rows = []
            for qi in range(len(qids)):
                mask = (cids != qids[qi]) & (d2[:, qi] > 0)
                if not mask.any():
                    continue
                de, dp = d2[mask, qi], d2p[mask, qi]
                within = (2.0 * dp >= jl * de) & (dp <= 2.0 * jl * de)
                ratio = dp / (jl * de)
                rows.append(
                    (
                        int(qids[qi]),
                        int(mask.sum()),
                        int(within.sum()),
                        float(ratio.min()),
                        float(ratio.max()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["query_id", "n", "nw", "rmin", "rmax"],
                )

    part = emb.mapInPandas(
        partials,
        schema="query_id bigint, n bigint, nw bigint,"
        " rmin double, rmax double",
    )
    return (
        part.groupBy("query_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_pairs"),
            F.sum("nw").cast("bigint").alias("n_within"),
            (F.sum("nw").cast("double") / F.sum("n")).alias("within_rate"),
            F.min("rmin").alias("min_ratio"),
            F.max("rmax").alias("max_ratio"),
        )
        .orderBy("query_id")
    )
