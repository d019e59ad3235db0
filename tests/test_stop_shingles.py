"""Stop-shingle skew guard: a shingle shared by k documents must not
emit O(k²) candidate pairs into the Jaccard self-join (the classic
inverted-index skew blowup at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_spark.plans.llm_dedup as dd
from etl_spark.operators.caching import evict


def _per_doc(spark, rows):
    """rows: (doc_id, [shingles]) — the kept_shingle_arrays input."""
    return spark.createDataFrame(rows, "doc_id bigint, arr array<string>")


def _exploded(out):
    return {
        (r.doc_id, s)
        for r in out.collect()
        for s in r.arr
    }


def test_hot_shingle_dropped_cold_kept(spark):
    # 1 shingle in 10 docs, 1 shingle in 2 docs, cap of 5.
    rows = [(i, ["the quick fox"]) for i in range(2, 10)]
    rows += [
        (0, ["the quick fox", "rare trigram one"]),
        (1, ["the quick fox", "rare trigram one"]),
    ]
    out = dd.kept_shingle_arrays(_per_doc(spark, rows), max_df=5)
    assert _exploded(out) == {
        (0, "rare trigram one"),
        (1, "rare trigram one"),
    }


def test_cap_boundary_is_exclusive(spark):
    # df == max_df survives; only df > max_df is a stop-shingle.
    rows = [(i, ["at the cap"]) for i in range(4)]
    out = dd.kept_shingle_arrays(_per_doc(spark, rows), max_df=4)
    assert len(_exploded(out)) == 4


def test_hot_shingle_does_not_explode_candidates(spark, tmp_path):
    # 200 docs sharing one hot 3-token prefix, otherwise unique text.
    # df=200 exceeds the default STOP_SHINGLE_MAX_DF=64 cap (the cap
    # is bound at import time, so patching the module attribute would
    # be inert — size the fixture over the default instead).
    # Unfiltered, the shared shingle alone would emit 200*199/2 ≈ 20k
    # candidate pairs; with the guard the corpus has no near-dup pairs.
    docs = [
        (i, f"common shared prefix unique{i}a unique{i}b unique{i}c")
        for i in range(200)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    evict()
    try:
        sh = dd.shingles_df(spark, sf_dir)
        # The hot shingle ("common shared prefix") is gone from the index…
        assert sh.filter(F.col("shingle") == "common shared prefix").count() == 0
        # …so the candidate stage produces zero pairs instead of ~20k.
        assert dd.dedup_jaccard_pairs(spark, sf_dir).count() == 0
    finally:
        evict()


def test_rep_space_shingle_index_matches_raw_sql_at_fixture_scale(spark, duck):
    # BOTH premises of this equality are rep-space (post round-6
    # collapse): Spark's index and _RAW_SHINGLES_SQL each shingle one
    # representative per distinct text, and at fixture scale no
    # rep-space shingle's df exceeds the cap (max ~25 at sf0.1), so
    # the cap filter is additionally a no-op. If this ever fails with
    # a small count gap, suspect the cap premise (a >cap-df shingle
    # entered the fixture) BEFORE suspecting the index plumbing — the
    # cap no-op is a property of the fixture data, not of the code.
    from tests.conftest import SF_DIR

    evict()
    try:
        n_spark = dd.shingles_df(spark, SF_DIR).count()
        n_raw = duck.execute(
            f"SELECT COUNT(*) FROM ({dd._RAW_SHINGLES_SQL})"
        ).fetchone()[0]
        assert n_spark == n_raw
    finally:
        evict()


def test_stop_filter_is_single_eval_and_hot_key_safe(spark):
    # r11 shape: the per-doc arrays are localCheckpointed ONCE
    # (single tokenization at RDD level — the df aggregate and the
    # output projection read the same checkpoint), df comes from a
    # map-combining count aggregate (one row per map task per key —
    # no giant-key task), and hot shingles are removed IN-ROW via
    # array_except against the collected over-cap literal — so the
    # output plan has no window buffering a whole key group (the r10
    # shape's straggler), no join of any strategy, and its leaf is
    # the checkpoint scan, not a recomputation of the input.
    rows = [(i % 7, [f"s{i % 13}", f"t{i % 3}"]) for i in range(100)]
    out = dd.kept_shingle_arrays(_per_doc(spark, rows), max_df=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan
    assert "array_except" in plan
    assert "Scan ExistingRDD" in plan  # the checkpoint leaf


def test_posting_build_single_explode_bounded_exchanges(spark, tmp_path):
    # r11 shape: tokenization runs ONCE, below the stop filter's
    # localCheckpoint, and the posting build above the checkpoint is
    # scan → array_except → explode → ONE shingle exchange for the
    # collect_list groupBy. No join (the hot list is a collected
    # literal), no window, no doc-keyed exchange (n_sh = size(arr)
    # rides the projection), exactly one Generate (the pair-emission
    # explode) and one full-index exchange.
    docs = [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    evict()
    try:
        build = dd.posting_lists(spark, sf_dir)
        plan = build._jdf.queryExecution().executedPlan().toString()
    finally:
        evict()
    # AQE prints "== Final Plan ==" plus "== Initial Plan ==" — count
    # operators in the final section only.
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Generate") == 1, plan
    assert plan.count("Exchange hashpartitioning(shingle") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "array_except" in plan, plan


def test_incremental_batch_equals_restricted_full_pairs(spark):
    """dedup_incremental_batch must be EXACTLY the full Jaccard pair
    set restricted to pairs touching >= 1 batch doc, re-oriented so
    the batch doc leads — the invariant that makes incremental dedup
    trustworthy (no pair invented, none missed, old x old excluded)."""
    from tests.conftest import SF_DIR

    MOD = dd.INCREMENTAL_BATCH_MOD
    full = dd.dedup_jaccard_pairs(spark, SF_DIR).collect()
    expected = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        a_new, b_new = a % MOD == 0, b % MOD == 0
        if a_new:  # covers both-new too: a < b already holds
            expected[(a, b)] = (r["n_common"], r["jaccard"], not b_new)
        elif b_new:
            expected[(b, a)] = (r["n_common"], r["jaccard"], True)
    got = {
        (r["new_doc"], r["match_doc"]): (
            r["n_common"], r["jaccard"], r["vs_existing"]
        )
        for r in dd.dedup_incremental_batch(spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0


def test_exact_dup_multiplicity_cannot_blank_or_bloat_near_dup(spark, tmp_path):
    """The sf10-probe cliff, fenced: a corpus where every text has
    more exact copies than STOP_SHINGLE_MAX_DF must still find its
    near-dup pairs (pre-collapse, per-copy df pushed every shingle
    over the cap and the whole near-dup surface silently emptied) —
    and must find exactly ONE pair per near-dup text pair, not a
    C(copies,2) clique (pre-collapse, 10x replication measured a
    590 -> 4.9M pair blowup). Copies rejoin their representative's
    group through dedup_clusters' exact edges."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tokX")  # one-token perturbation
    docs = [(i, base) for i in range(100)]          # 100 exact copies
    docs += [(100 + i, near) for i in range(100)]   # 100 copies of near-dup
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    evict()
    try:
        pairs = dd.dedup_jaccard_pairs(spark, sf_dir).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 100)]
        assert pairs[0]["jaccard"] > 0.5
        # And the cluster view puts all 200 copies in ONE group.
        clusters = dd.dedup_clusters(spark, sf_dir).collect()
        assert {r["cluster_id"] for r in clusters} == {0}
        assert len(clusters) == 200
    finally:
        evict()


def test_arriving_exact_copy_invisible_to_incremental_visible_to_gate(
    spark, tmp_path
):
    """SCOPE fence for dedup_incremental_batch (documented in its
    register doc): the batch slice is taken on exact-dup REP ids, so
    an arriving doc (doc_id % MOD == 0) that is an exact copy of
    historical text whose rep id is NOT in the slice emits no row —
    exact re-ingests are the hash-equality tier's job. The per-doc
    gate (dedup_history_gate) and dedup_exact must both still surface
    it, or the scope split would drop the doc entirely."""
    from tests.conftest import SF_DIR as _  # noqa: F401  (fixture import path)

    MOD = dd.INCREMENTAL_BATCH_MOD
    text = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(12))
    docs = [
        (1, text),        # historical original (rep of the exact group)
        (MOD, text),      # arriving EXACT copy — rep 1 not in slice
        (MOD + 1, other), # historical filler (unrelated content)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    evict()
    try:
        inc = dd.dedup_incremental_batch(spark, sf_dir).collect()
        assert inc == []  # the exact re-ingest is intentionally absent
        gate = {
            r["doc_id"]: (r["containment"], r["likely_dup"])
            for r in dd.dedup_history_gate(spark, sf_dir).collect()
        }
        assert gate[MOD] == (1.0, True)  # per-doc gate DOES see it
        exact = {r["doc_id"]: r["is_duplicate"] for r in
                 dd.dedup_exact(spark, sf_dir).collect()}
        assert exact[MOD] == 1  # and the hash tier flags the re-ingest
    finally:
        evict()
