"""Properties of the leakage-safe train/val split and the segment
stripper that the DuckDB oracle verifies only as equal-output — these
pin the SEMANTIC guarantees a user relies on:

* the split is a pure function of content, so byte-identical documents
  can never straddle the split (zero exact-dup leakage, by test on a
  corpus that CONTAINS exact duplicates);
* segment stripping preserves exactly one copy of every distinct
  segment corpus-wide and never invents tokens.
"""

from __future__ import annotations

import pytest

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def split_rows(spark):
    return REGISTRY["curation_train_val_split"].builder(spark, SF_DIR).collect()


def test_split_partitions_all_docs(spark, split_rows):
    from etl_spark.io import load
    from pyspark.sql import functions as F

    n_docs = (
        load(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull())
        .count()
    )
    assert sum(r["n_docs"] for r in split_rows) == n_docs
    assert {r["split"] for r in split_rows} == {"train", "val"}


def test_split_has_zero_exact_dup_leakage(split_rows):
    # The sf0.001 documents table contains exact duplicates (that's
    # what dedup_exact finds), so this asserts the co-assignment
    # guarantee against data where it could actually fail.
    assert all(r["n_exact_dup_leaks"] == 0 for r in split_rows)


def test_split_shared_shingles_symmetric(split_rows):
    by = {r["split"]: r for r in split_rows}
    assert (
        by["train"]["n_shared_shingles"] == by["val"]["n_shared_shingles"]
    )
    for r in split_rows:
        assert r["n_shared_shingles"] <= r["n_shingles"]


def test_strip_dup_segments_keeps_each_segment_once(spark):
    from pyspark.sql import functions as F

    from etl_spark.plans.curation import SEG_TOKENS

    rows = (
        REGISTRY["curation_strip_dup_segments"]
        .builder(spark, SF_DIR)
        .collect()
    )
    # Survivor totals: the kept-segment count across the corpus equals
    # the number of DISTINCT segments (each kept exactly once).
    from etl_spark.io import load

    docs = load(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())
    segs = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')), {SEG_TOKENS}),"
                f" s -> array_join(slice(split(text, ' '), s, {SEG_TOKENS}), ' '))"
            )
        ).alias("seg")
    )
    n_distinct = segs.distinct().count()
    assert sum(r["n_kept"] for r in rows) == n_distinct
    # Reassembly never invents content: each cleaned doc's tokens are a
    # subsequence of the original's (check a sample driver-side).
    # Fetch originals for exactly the sampled doc_ids — a limit(2000)
    # here would be an arbitrary unordered subset that can miss sampled
    # ids on larger fixtures and KeyError nondeterministically.
    sample_ids = [r["doc_id"] for r in rows[:200]]
    originals = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    for r in rows[:200]:
        if not r["clean_text"]:
            continue
        orig = originals[r["doc_id"]].split(" ")
        it = iter(orig)
        assert all(
            tok in it for tok in r["clean_text"].split(" ")
        ), f"doc {r['doc_id']}: cleaned text is not a subsequence"
