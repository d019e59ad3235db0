"""PQ codebook sizing probe: how recall and encode cost move together
as PQ_KS grows from the fixture setting (16) to production sizing
(64, 256) — the measurement behind the "spend memory on a finer
codebook, not more probes" claim in SCALING.md / tests/test_ivfpq.py.

Reuses the numpy replay from tests/test_ivfpq.py, which
test_spark_matches_python_replay_exactly pins bit-equal to the
shipped Spark pipeline AT the shipped constants — so the KS=16 row
below is the registered query's own number, and the KS=64/256 rows
run the identical algebra with only the codebook size rebound. The
encode kernel timed here is the same numpy expression the Spark
mapInPandas stage executes per Arrow batch, so its scaling IS the
pipeline's encode-cost scaling (O(N * KS) distance evaluations per
subspace).

Corpus: sf0.1 embeddings (2,000 uniform-random vectors — PQ's worst
case; KS=256 needs >= 256 seed vectors, which sf0.001's 500 provide
only thinly, so the bench-scale table is used).

Usage: python tools/pq_sizing_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPEC = importlib.util.spec_from_file_location(
    "test_ivfpq",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "test_ivfpq.py",
    ),
)
tiv = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(tiv)

from etl_spark.io import load  # noqa: E402
from etl_spark.plans.llm_similarity import DIM, PQ_M, quantize  # noqa: E402
from etl_spark.session import get_spark, tune_session  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")
KS_SWEEP = (16, 64, 256)
ENCODE_REPS = 3


def main() -> None:
    spark = tune_session(get_spark("pq-sizing-probe"))
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([r["q"] for r in rows], dtype=np.int64)
    spark.stop()

    print(f"corpus: {len(ids)} vectors ({SF_DIR}), PQ_M={PQ_M}, "
          f"queries {tiv.PQ_QUERY_LO}..{tiv.PQ_QUERY_HI - 1}, "
          f"recall@{tiv.PQ_TOPK} vs global brute force, "
          f"nprobe={tiv.N_PROBE}\n")
    print("| PQ_KS | recall@10 (ADC) | +exact rerank(50) | encode s "
          f"(min of {ENCODE_REPS}) | code bits/vec | codebook ints |")
    print("|---|---|---|---|---|---|")
    for ks in KS_SWEEP:
        tiv.PQ_KS = ks  # _replay reads the module global
        best = None
        for _ in range(ENCODE_REPS):
            t0 = time.perf_counter()
            cls, cents, CB, codes = tiv._replay(ids, V)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        raw, _ = tiv._recall_curve(
            ids, V, cls, cents, CB, codes, tiv.N_PROBE
        )
        rer, _ = tiv._recall_curve(
            ids, V, cls, cents, CB, codes, tiv.N_PROBE,
            rerank=5 * tiv.PQ_TOPK,
        )
        bits = PQ_M * int(np.ceil(np.log2(ks)))
        print(
            f"| {ks} | {raw:.3f} | {rer:.3f} | {best:.2f} s "
            f"| {bits} (vs {DIM * 32} raw) | {ks * DIM} |"
        )


if __name__ == "__main__":
    main()
