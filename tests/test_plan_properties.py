"""Physical-plan regression tests: the scale-critical plan shapes
(pushdown, pruning, broadcast, top-k heap, single-shuffle windows)
must not silently regress. These assert on the optimized/executed plan
text the same way the bench explain-audit inspects it."""

from __future__ import annotations

import pytest

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    # Default spark.sql.maxMetadataStringLength (100) truncates
    # PushedFilters/ReadSchema mid-list, which would make the
    # assertions below vacuously green; raise it for the inspection.
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        df = REGISTRY[name].builder(spark, SF_DIR)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


def test_scan_pushes_all_predicates(spark):
    plan = plan_of(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # The actual comparison predicates (not just IsNotNull) must reach
    # the parquet reader.
    for token in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert token in pushed, f"{token} not pushed: {pushed}"


def test_scan_prunes_columns(spark):
    plan = plan_of(spark, "scan_filter_project")
    schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    # The full schema string is visible (no '...' truncation), so the
    # absence assertions are meaningful: 11-column table pruned to the
    # 6 referenced columns.
    assert "..." not in schema
    assert "l_returnflag" not in schema
    assert "l_tax" not in schema
    assert "l_orderkey" in schema


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_geo_rollup")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_top_k_uses_heap_not_global_sort(spark):
    plan = plan_of(spark, "top_k_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no full-sort shuffle for a k-row result


def test_window_dedup_single_shuffle(spark):
    plan = plan_of(spark, "window_latest_order_per_customer")
    assert plan.count("Exchange") == 1  # one hash partition on the window key


def test_semi_join_carries_no_right_payload(spark):
    plan = plan_of(spark, "join_semi_big_spenders")
    assert "LeftSemi" in plan


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q6_forecast_revenue"])
def test_agg_has_partial_and_final(spark, name):
    # Two-phase (map-side partial) aggregation: HashAggregate appears
    # at least twice around the exchange.
    plan = plan_of(spark, name)
    assert plan.count("HashAggregate") >= 2


def test_embedding_cosine_dedup_has_no_cartesian(spark):
    # The round-2 form joined on vec_id < vec_id only, which Spark
    # executes as a cartesian/BNL join — quadratic at scale. The gated
    # form must be an equi-join on the LSH bucket.
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_pairs_have_no_cartesian(spark):
    plan = plan_of(spark, "dedup_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Pair generation is map-side from posting lists; the data joins
    # are the size-attachment joins, pinned to spill-safe SMJ (see
    # test_corpus_pair_joins_pinned_to_sort_merge). The only broadcast
    # allowed is the stop-shingle anti-join (df-capped list). A
    # shingle self-join or a hash build on a pair-sized side must not
    # reappear — the latter was the sf1 per-task OOM.
    assert "ShuffledHashJoin" not in plan


def test_correlated_exists_decorrelates_to_semi_join(spark):
    plan = plan_of(spark, "sql_q4_priority_with_returns")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_correlated_scalar_agg_decorrelates(spark):
    # q17's per-part AVG subquery must become aggregate-then-join, not
    # a per-outer-row rescan (which Spark would surface as a nested
    # loop over the inner table).
    plan = plan_of(spark, "q17_small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # The decorrelated per-part average shows up as an extra aggregate.
    assert plan.count("HashAggregate") >= 4


def test_in_over_having_decorrelates_to_semi_join(spark):
    plan = plan_of(spark, "q18_large_volume_customers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_not_exists_decorrelates_to_anti_join(spark):
    plan = plan_of(spark, "q22_idle_rich_customers")
    assert "LeftAnti" in plan
    # The one-row threshold broadcast is the ONLY nested-loop join
    # allowed (build side is a single aggregated row, not data).
    assert "CartesianProduct" not in plan


def test_q8_dims_all_broadcast(spark):
    # Every dimension in the 8-way join must broadcast; the only
    # shuffle joins are fact-fact (lineitem-orders, orders-customer).
    plan = plan_of(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q19_disjunction_prunes_scans(spark):
    # Catalyst must extract the common-column hull of the OR bands and
    # push brand membership down to the part scan.
    plan = plan_of(spark, "q19_disjunctive_revenue")
    assert "PushedFilters: [" in plan
    # The brand disjunction reaches the part scan (as an Or tree of
    # EqualTo or an In, depending on Spark's normalization).
    assert "EqualTo(p_brand" in plan or "In(p_brand" in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """At 100 TB, a selective filter on one fact table should prune the
    other fact's scan via Spark's runtime bloom filter. The feature
    gates on thresholds sized for clusters (application-side scan ≥
    10 GB, broadcast-sized build sides excluded because a broadcast
    join already prunes) — at test scale we simulate the at-scale
    conditions and assert the bloom filter is actually injected."""
    from etl_spark.io import load
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None  # unset → restore via unset
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        o = load(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load(spark, SF_DIR, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan  # bloom filter reached the probe side
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_curation_pipeline_single_data_shuffle(spark):
    # Dedup window (hash exchange) + presentation sort (range
    # exchange) only — quality gate, hash sample, and chunk explode
    # must all stay narrow.
    plan = plan_of(spark, "pipeline_curate_corpus")
    assert plan.count("Exchange") == 2


def test_stratified_sample_is_narrow_map(spark):
    # Hash-gated sampling must not shuffle: no Exchange in the plan.
    plan = plan_of(spark, "sample_stratified_docs")
    assert "Exchange" not in plan


def test_q21_double_exists_decorrelates(spark):
    # EXISTS -> left-semi, NOT EXISTS -> left-anti; the naive form is a
    # per-late-row rescan of lineitem (quadratic at scale).
    plan = plan_of(spark, "q21_sole_late_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_decorrelates(spark):
    # The per-part scalar MIN must run as aggregate-then-join, never a
    # per-outer-row rescan of the unit-price CTE.
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_q16_not_in_is_null_aware_anti_join(spark):
    # NOT IN over the excluded-supplier subquery: Spark plans a
    # null-aware anti join with the (tiny) exclusion set broadcast.
    plan = plan_of(spark, "q16_supplier_variety")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_triple_nesting_decorrelates(spark):
    # IN( ... IN(...) AND correlated-scalar-SUM ... ): all three
    # nesting levels must land as joins+aggregates — a rescan of
    # lineitem per (part, supplier) would be quadratic at scale.
    plan = plan_of(spark, "q20_excess_stock_suppliers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontam_eval_side_broadcasts(spark):
    # The benchmark split is the small side by construction; the
    # training corpus must stream through a broadcast join, not
    # shuffle on shingle.
    plan = plan_of(spark, "text_decontam_pairs")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_edge_is_shuffle_hash(spark):
    # Salting is a no-op under broadcast; the pattern must keep the
    # salted edge as a shuffle join (that's the case it exists for).
    plan = plan_of(spark, "join_salted_event_geo")
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_corpus_pair_joins_pinned_to_sort_merge(spark):
    """The sf1 (10x) contract drive proved AQE's auto-broadcast and a
    shuffled-hash build both OOM on corpus-derived pair/size tables;
    the merge hints that fix it must not silently fall off the plans.
    SMJ on those joins is the spill-safe shape at every scale."""
    for name, min_smj in [
        # r10: jaccard/containment/incremental size joins are GONE —
        # per-doc set sizes ride the posting lists and pairs aggregate
        # (n_common, na, nb) map-side (commit 4bd937d); the join-free
        # invariant for them is pinned by
        # test_pair_consumers_are_join_free below.
        ("dedup_minhash_error", 3),     # cand ⋈ sig(a) ⋈ sig(b) + common
        # wedge_counts ⋈ closing edges; the degree-orientation SMJs
        # execute behind the localCheckpoint lineage cut and don't
        # appear in the final plan.
        ("graph_dup_triangles", 1),
        ("mm_phash_neardup", 1),        # band self-join, both sides corpus
        ("mm_phash_history_gate", 1),   # arriving slice ⋈ history index
    ]:
        plan = plan_of(spark, name)
        assert plan.count("SortMergeJoin") >= min_smj, (
            f"{name}: expected >= {min_smj} SortMergeJoin, plan:\n"
            + plan[:2000]
        )


def test_pair_consumers_are_join_free(spark):
    """r10 invariant, STRONGER than the SMJ pinning it replaces: the
    posting-list pair consumers emit (doc_a, doc_b, na, nb) map-side
    from the zipped (docs, sizes) arrays and aggregate directly — no
    size-attachment joins remain, so no join strategy can regress
    (commit 4bd937d; before/after receipts in plans/r10/). The r11
    stop filter keeps the invariant intact: hot shingles are removed
    in-row via array_except against a collected literal, so even the
    posting BUILD lineage printed at cache-consumer sites contains no
    join operator."""
    for name in (
        "dedup_jaccard_pairs",
        "dedup_containment_pairs",
        "dedup_incremental_batch",
    ):
        plan = plan_of(spark, name)
        for op in (
            "SortMergeJoin",
            "BroadcastHashJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        ):
            assert op not in plan, (
                f"{name}: expected a join-free plan, found {op}:\n"
                + plan[:2000]
            )
