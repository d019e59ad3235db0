"""Runtime-filter join patterns: manual bloom pre-filter shape and
Spark's native runtime bloom-filter injection (plans/runtime_filters.py).

Value parity for both registered queries is carried by
test_oracle_parity.py; these tests pin the PLAN claims — the part an
oracle can't see. The NATIVE runtime bloom filter (the optimizer-
injected twin of the manual pattern) is fenced separately in
test_plan_properties.py::test_runtime_bloom_filter_prunes_fact_side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.plans import REGISTRY
from etl_spark.plans.runtime_filters import BLOOM_M, bloom_prefilter
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prefilter_plan_shape(spark):
    """The fact side passes through TWO broadcast LeftSemi joins keyed
    on pmod(xxhash64(...)) positions before the exact join — the
    pre-shuffle pruning the family exists for."""
    df = REGISTRY["join_bloom_prefilter_revenue"].builder(spark, SF_DIR)
    plan = _executed_plan(df)
    assert plan.count("LeftSemi") >= 2
    assert "pmod(xxhash64" in plan
    # the prune is broadcast-side, never a shuffled semi join
    assert plan.count("BroadcastHashJoin") >= 2


def test_bloom_prefilter_no_false_negatives(spark):
    """Survivors are a superset of true matches and a subset of the
    fact table; with a selective dim, strictly smaller than the fact."""
    fact = load(spark, SF_DIR, "lineitem").select("l_suppkey")
    dim = (
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    n_fact = fact.count()
    survivors = bloom_prefilter(fact, "l_suppkey", dim)
    n_surv = survivors.count()
    n_true = fact.join(dim, fact.l_suppkey == dim.s_suppkey, "left_semi").count()
    assert n_true <= n_surv <= n_fact
    assert n_surv < n_fact  # the filter actually prunes on this dim


def test_bloom_position_sets_bounded(spark):
    """The broadcast side is bounded by BLOOM_M positions regardless of
    dim cardinality — the property that keeps the fingerprint
    broadcastable when the dim itself is not."""
    from etl_spark.plans.runtime_filters import bloom_position

    dim = load(spark, SF_DIR, "orders").select("o_orderkey")  # big-ish key set
    n_pos = dim.select(
        bloom_position(F.col("o_orderkey"), 1).alias("p")
    ).distinct().count()
    assert n_pos <= BLOOM_M


def test_split_leakage_invariants(spark):
    """Candidate pairs cross the boundary in one direction only and the
    leak flag is a pure function of the agreement level."""
    rows = (
        REGISTRY["curation_split_leakage_pairs"].builder(spark, SF_DIR).collect()
    )
    from etl_spark.plans.curation import SIG_AGREE_MIN

    for r in rows:
        assert 0 <= r.sig_agree <= 16
        assert r.is_leak == (1 if r.sig_agree >= SIG_AGREE_MIN else 0)
        assert 1 <= r.n_val_docs <= r.n_pairs
