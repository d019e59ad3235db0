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


def test_quality_lift_deciles_follow_ntile_rule(spark, duck):
    """Lift-table fences: decile sizes follow the exact NTILE split,
    every doc lands in exactly one decile, and total flagged dups
    equal the corpus's near-dup pair membership count."""
    from etl_spark.plans.curation import LIFT_DECILES, curation_quality_lift

    rows = sorted(
        curation_quality_lift(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, LIFT_DECILES + 1))
    n = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    q, r = divmod(n, LIFT_DECILES)
    assert [x["n_docs"] for x in rows] == [
        q + 1 if i < r else q for i in range(LIFT_DECILES)
    ]
    from etl_spark.plans.llm_dedup import dedup_prefix_filter_pairs

    pairs = dedup_prefix_filter_pairs(spark, "/root/testdata/sf0.001").collect()
    n_dup_docs = len(
        {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    )
    assert sum(x["n_dups"] for x in rows) == n_dup_docs
    assert n_dup_docs > 0  # fixture exercises the signal
    # score bounds are non-decreasing across deciles (rank order real)
    for a, b in zip(rows, rows[1:]):
        assert a["score_hi"] <= b["score_lo"] or abs(
            a["score_hi"] - b["score_lo"]
        ) < 1e-12
