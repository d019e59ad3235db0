"""Properties of make_sfbig --perturb (the content-diversity mode).

The decade probes' replicated corpora grow copy MULTIPLICITY; after
the round-6 rep-space collapse the near-dup family is provably
multiplicity-invariant, so measuring its rep-proportional phases
needs a corpus whose REPRESENTATIVE set grows with the copy count.
--perturb delivers that via a deterministic per-copy token mutation.
These tests pin the three properties the probe's interpretation
rests on:

1. determinism — same (text, copy) always perturbs identically;
2. zero shared shingles across copies — every NGRAM window spans a
   mutated position (stride == NGRAM), so the exact-dup collapse
   yields n_copies distinct representatives per source text and NO
   cross-copy near-dup pairs muddy the slope;
3. within-copy similarity preserved — two docs that differ by one
   substituted token keep exactly that difference after perturbation
   (mutations are position-keyed, shared positions mutate equally).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "make_sfbig",
    os.path.join(os.path.dirname(__file__), "..", "tools", "make_sfbig.py"),
)
make_sfbig = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(make_sfbig)

from etl_spark.plans.llm_dedup import NGRAM  # noqa: E402


def _perturb(spark, rows):
    df = spark.createDataFrame(rows, "text string, _copy int")
    return [
        r.out
        for r in df.select(
            make_sfbig.perturbed_text().alias("out")
        ).collect()
    ]


def test_stride_matches_shingle_ngram():
    # The zero-shared-shingles guarantee is pigeonhole on the stride:
    # one mutated position in every NGRAM consecutive tokens. A wider
    # stride would let unmutated windows leak identical shingles
    # between copies and quietly reintroduce cross-copy pairs.
    assert make_sfbig.PERTURB_STRIDE <= NGRAM


def test_copy_zero_is_unperturbed_and_mutation_is_deterministic(spark):
    text = "alpha beta gamma delta epsilon zeta eta"
    out1 = _perturb(spark, [(text, 0), (text, 3), (text, 3)])
    assert out1[0] == text
    assert out1[1] == out1[2]  # same (text, copy) -> same output
    assert out1[1] == "alphaq3 beta gamma deltaq3 epsilon zeta etaq3"


def test_distinct_copies_share_zero_shingles(spark):
    text = " ".join(f"tok{i}" for i in range(20))
    outs = _perturb(spark, [(text, c) for c in range(4)])
    assert len(set(outs)) == 4  # all copies are distinct representatives

    def shingles(s: str) -> set[tuple[str, ...]]:
        toks = s.split(" ")
        return {
            tuple(toks[i : i + NGRAM]) for i in range(len(toks) - NGRAM + 1)
        }

    for a in range(4):
        for b in range(a + 1, 4):
            assert not (shingles(outs[a]) & shingles(outs[b])), (a, b)


def test_within_copy_similarity_is_preserved(spark):
    base = "the quick brown fox jumps over the lazy dog today ok fine"
    near = base.replace("jumps", "leaps")  # 1-token substitution
    out_base, out_near = _perturb(spark, [(base, 7), (near, 7)])
    db, dn = out_base.split(" "), out_near.split(" ")
    assert len(db) == len(dn)
    diff = [i for i, (x, y) in enumerate(zip(db, dn)) if x != y]
    assert diff == [4]  # still exactly one differing position


def test_null_and_empty_text_pass_through(spark):
    df = spark.createDataFrame(
        [(None, 2), ("", 2)], "text string, _copy int"
    )
    out = df.select(make_sfbig.perturbed_text().alias("out")).collect()
    assert out[0].out is None
    assert out[1].out == "q2"  # split('') -> [''], position 0 mutated


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
