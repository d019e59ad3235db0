"""Materialize a larger FK-consistent dataset by key-shifted
replication of an existing scale factor, for local slope probes
beyond the driver's sf0.1.

Each copy i shifts every surrogate key by i*OFFSET, so joins stay
consistent (an orders copy joins its own customer copy), dims
(region/nation) are shared, and per-key cardinalities scale like a
real bigger corpus rather than like hot-key skew. Document text is
NOT perturbed, so the dedup family sees a corpus whose duplicate
rate grows with the copy count — which only makes the dedup probes
harder (more pairs), never easier.

Usage: python tools/make_sfbig.py [n_copies] [out_dir] [--tables a,b,c]
         (defaults: 10 copies of /root/testdata/sf0.1 -> /tmp/sf1)
       --tables restricts replication to the named tables; the rest
         land as single unreplicated copies so every load() still
         resolves. This is the sf10 mode: replicating only the
         data-superlinear families' tables (documents, embeddings,
         events) keeps the build minutes-cheap while the probe
         measures exactly the queries whose cost is data-proportional.
         python tools/make_sfbig.py 100 /tmp/sf10 \
             --tables documents,embeddings,events
       --perturb mutates documents.text per copy so the corpus grows
         CONTENT DIVERSITY, not copy multiplicity: copy i > 0 appends
         a copy-unique marker to every 3rd token (stride == the
         shingle NGRAM, so EVERY 3-gram window spans a mutated token
         and sibling copies share ZERO shingles — all cross-copy
         near-dup similarity is destroyed by construction), while two
         organically similar docs inside the same copy receive
         identical position-keyed mutations and so keep their
         within-copy similarity. Exact-dup collapse then yields
         n_copies x the representative set, which is what makes the
         rep-proportional phases (shingle explode, posting lists,
         band joins, pair confirm) measurable directly instead of
         argued from the df-cap/banding math. Deterministic: the
         mutation is a pure function of (token position, copy index).
         Note n_chars is NOT rewritten — it describes the unperturbed
         text; probe corpora only, never a correctness fixture for
         n_chars-vs-length queries.
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_spark.io import load  # noqa: E402
from etl_spark.operators.media import PHASH_VARIANT_OFFSET  # noqa: E402
from etl_spark.session import get_spark, tune_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000
# --perturb mutation stride. MUST equal llm_dedup.NGRAM: with one
# mutated position in every NGRAM consecutive tokens, no shingle
# window survives unmutated, so distinct copies share zero shingles.
PERTURB_STRIDE = 3


def perturbed_text(copy_col: str = "_copy") -> "F.Column":
    """text column with every PERTURB_STRIDE-th token made copy-unique.

    Copy 0 is the unperturbed original. For copy i > 0, token at
    position p gets 'q<i>' appended when p % PERTURB_STRIDE == 0 —
    deterministic in (p, i), so the same source text always perturbs
    identically and organically-similar docs in the same copy stay
    similar (their shared tokens mutate to the same shared values).
    """
    mutated = F.expr(
        f"array_join(transform(split(text, ' '), (t, p) -> "
        f"IF(p % {PERTURB_STRIDE} = 0, concat(t, 'q', {copy_col}), t)"
        f"), ' ')"
    )
    return F.when(F.col(copy_col) == 0, F.col("text")).otherwise(mutated)

# table -> columns to shift by i*OFFSET per copy. Dims are shared.
SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    global OFFSET
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    n_copies = int(args[0]) if args else 10
    out = args[1] if len(args) > 1 else "/tmp/sf1"
    only: set[str] | None = None
    perturb = False
    for f in flags:
        if f.startswith("--tables="):
            only = set(f.split("=", 1)[1].split(","))
        elif f == "--tables":
            raise SystemExit("use --tables=a,b,c")
        elif f == "--perturb":
            perturb = True
        elif f.startswith("--offset="):
            # Smaller per-copy key shift for DEEP replication ladders
            # (e.g. 1000 copies needs offset <= 1M to stay below the
            # phash variant band). Every safety check below still
            # runs against the chosen value — base keys must sit
            # below it, and the shifted top must clear the band.
            OFFSET = int(f.split("=", 1)[1])
        else:
            raise SystemExit(f"unknown flag {f}")
    if only is not None and (unknown := only - set(SHIFTS)):
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    # The phash noisy-variant ids live at doc_id + PHASH_VARIANT_OFFSET
    # (operators/media.py); shifted real ids must stay below that or
    # variants collide with genuine documents. This pre-check is the
    # coarse bound (max shifted id < n_copies*OFFSET GIVEN base ids <
    # OFFSET — the per-table key check below enforces that premise);
    # the exact per-table check on max(doc_id) runs after maxes are
    # read.
    if n_copies * OFFSET > PHASH_VARIANT_OFFSET:
        raise SystemExit(
            f"{n_copies} copies x OFFSET {OFFSET} crosses the "
            f"{PHASH_VARIANT_OFFSET} phash variant-id band; lower "
            "copies or rescale both."
        )
    spark = tune_session(get_spark("make-sfbig"))
    spark.sparkContext.setLogLevel("ERROR")
    for table, keys in SHIFTS.items():
        table_copies = n_copies if only is None or table in only else 1
        src = load(spark, SRC, table)
        if not keys or table_copies == 1:
            big = src
        else:
            # Shifted keys from copy i must not collide with copy i+1:
            # every source key has to sit below OFFSET or the replicas
            # silently interleave, corrupting FK consistency and dedup
            # cardinalities. Fail loudly instead.
            maxes = src.select(
                *[F.max(F.col(k)).alias(k) for k in keys]
            ).first()
            for k in keys:
                if maxes[k] is not None and maxes[k] >= OFFSET:
                    raise SystemExit(
                        f"{table}.{k} max={maxes[k]} >= OFFSET={OFFSET}: "
                        "key-shifted copies would collide. Raise OFFSET "
                        "above the largest source key."
                    )
            # Exact phash-band check: the largest SHIFTED doc_id must
            # stay below the variant band, not just the coarse
            # n_copies*OFFSET bound from the pre-check.
            if table == "documents" and maxes["doc_id"] is not None:
                top = maxes["doc_id"] + (table_copies - 1) * OFFSET
                if top >= PHASH_VARIANT_OFFSET:
                    raise SystemExit(
                        f"documents.doc_id max shifted id {top} >= "
                        f"PHASH_VARIANT_OFFSET={PHASH_VARIANT_OFFSET}: "
                        "variants would collide with real documents."
                    )
            # One explode per source row instead of a union chain:
            # n_copies stays a plan constant, not a plan depth.
            copies = F.explode(
                F.array(*[F.lit(i) for i in range(table_copies)])
            ).alias("_copy")
            big = src.select("*", copies)
            for k in keys:
                big = big.withColumn(
                    k, (F.col(k) + F.col("_copy") * F.lit(OFFSET)).cast("bigint")
                )
            if perturb and table == "documents":
                big = big.withColumn("text", perturbed_text())
            big = big.drop("_copy")
        dest = f"{out}/{table}.parquet"
        big.repartition(
            max(4, min(table_copies * 2, 64))
        ).write.mode("overwrite").parquet(dest)
        print(f"{table}: {spark.read.parquet(dest).count()} rows -> {dest}")
    # Written LAST, so its existence proves every table landed — the
    # Makefile's skip-if-built sentinel tests this, not a table dir
    # that an interrupted build may have left behind.
    with open(f"{out}/_DONE", "w") as fh:
        fh.write(
            f"{n_copies} copies of {SRC}"
            + (f" (tables {sorted(only)}; rest 1 copy)" if only else "")
            + (" (documents text perturbed per copy)" if perturb else "")
            + "\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
