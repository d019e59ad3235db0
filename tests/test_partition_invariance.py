"""Partitioning invariance: results must be BIT-IDENTICAL regardless
of shuffle partition count — the property the engine's decimal/
integer/sorted-fold design exists to guarantee. Floating-point
aggregation order changes with partitioning; these queries produce
floats, so any order-dependent accumulation would show up here as a
flipped last bit. 3 partitions vs 32 exercises genuinely different
merge trees."""

from __future__ import annotations

import pytest

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR

# Float-emitting queries across the determinism techniques:
PROBES = [
    "part_price_zscore_by_type",   # DECIMAL-exact moments
    "text_word_entropy",           # sorted-fold float sum + rounding
    "events_ewma_hourly",          # rational integer weights
    "stats_linfit_value_on_k",     # exact sufficient statistics
    "sim_topk_cosine",             # integer-quantized vector math
    "udaf_weighted_value_mean",    # pandas UDAF w/ integer accumulation
    "events_rolling_zscore",       # windowed integer moments
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PROBES)
def test_results_invariant_under_partitioning(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = _rows(REGISTRY[name].builder(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = _rows(REGISTRY[name].builder(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert few == many  # exact equality, floats included
