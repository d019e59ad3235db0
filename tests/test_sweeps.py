"""Property tests for the decision-sweep queries: the cross-engine
hash check (contract + edge-corpus parity) proves the numbers match
DuckDB; these prove the numbers mean what the docstrings claim —
the accounting identities and monotonicities a pipeline owner relies
on when reading the sweep tables."""

from __future__ import annotations

from etl_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_context_sweep_accounting_and_monotonicity(spark):
    rows = sorted(
        REGISTRY["curation_context_length_sweep"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["ctx_len"],
    )
    assert len(rows) == 4
    for r in rows:
        # One-doc-per-sample accounting: every slot of every sample is
        # either a kept token or padding, and kept = total - truncated.
        assert (
            r["pad_tokens"] + r["total_tokens"] - r["trunc_tokens_lost"]
            == r["n_docs"] * r["ctx_len"]
        )
        # Packing covers the corpus: windows * ctx_len >= tokens, with
        # less than one window of per-stream tail slack.
        assert r["pack_windows"] * r["ctx_len"] >= r["total_tokens"]
        assert r["pack_straddle_docs"] <= r["n_docs"]
    for a, b in zip(rows, rows[1:]):
        # Corpus-level columns are ctx-independent.
        assert (a["n_docs"], a["total_tokens"]) == (b["n_docs"], b["total_tokens"])
        # Longer contexts: fewer truncated docs / lost tokens / pack
        # windows, more padding.
        assert b["trunc_docs"] <= a["trunc_docs"]
        assert b["trunc_tokens_lost"] <= a["trunc_tokens_lost"]
        assert b["pack_windows"] <= a["pack_windows"]
        assert b["pad_tokens"] >= a["pad_tokens"]


def test_dedup_threshold_sweep_monotone_and_consistent(spark):
    rows = sorted(
        REGISTRY["dedup_threshold_sweep"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["t_pct"],
    )
    assert rows, "sf0.01 corpus has near-dup pairs above the base threshold"
    for r in rows:
        assert r["docs_removed"] <= r["docs_affected"] <= 2 * r["n_pairs"]
    for a, b in zip(rows, rows[1:]):
        # Raising the bar only ever shrinks the dedup's blast radius.
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["docs_affected"] <= a["docs_affected"]
        assert b["docs_removed"] <= a["docs_removed"]
    # The base threshold row restates dedup_jaccard_pairs exactly.
    base = next(r for r in rows if r["t_pct"] == 5)
    n_base_pairs = REGISTRY["dedup_jaccard_pairs"].builder(spark, SF_DIR).count()
    assert base["n_pairs"] == n_base_pairs
