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

Usage: python tools/make_sfbig.py [n_copies] [out_dir]
         (defaults: 10 copies of /root/testdata/sf0.1 -> /tmp/sf1)
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_spark.io import load  # noqa: E402
from etl_spark.session import get_spark, tune_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

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
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = tune_session(get_spark("make-sfbig"))
    spark.sparkContext.setLogLevel("ERROR")
    for table, keys in SHIFTS.items():
        src = load(spark, SRC, table)
        if not keys:
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
            # One explode per source row instead of a union chain:
            # n_copies stays a plan constant, not a plan depth.
            copies = F.explode(
                F.array(*[F.lit(i) for i in range(n_copies)])
            ).alias("_copy")
            big = src.select("*", copies)
            for k in keys:
                big = big.withColumn(
                    k, (F.col(k) + F.col("_copy") * F.lit(OFFSET)).cast("bigint")
                )
            big = big.drop("_copy")
        dest = f"{out}/{table}.parquet"
        big.repartition(max(4, n_copies * 2)).write.mode("overwrite").parquet(dest)
        print(f"{table}: {spark.read.parquet(dest).count()} rows -> {dest}")
    # Written LAST, so its existence proves every table landed — the
    # Makefile's skip-if-built sentinel tests this, not a table dir
    # that an interrupted build may have left behind.
    with open(f"{out}/_DONE", "w") as fh:
        fh.write(f"{n_copies} copies of {SRC}\n")
    spark.stop()


if __name__ == "__main__":
    main()
