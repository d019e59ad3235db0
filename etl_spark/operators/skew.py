"""Skew mitigation: salted two-phase aggregation.

A skewed grouping key (one key holding most rows) makes one reducer
the straggler for the whole stage. Salting splits each key into
``n_salts`` sub-keys for the first (heavy) aggregation, then merges
the per-salt partials in a second (tiny) aggregation. The pattern is
only valid for aggregates with a decomposition into partial + merge
(count→sum, sum→sum, min/max→min/max, ...).

Spark's AQE skew-join splitting covers joins; salting is the
aggregation-side counterpart when a single group must not land on a
single task.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Callable[[], Sequence[Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase grouped aggregation over ``keys``.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs()`` combine the
    partials per keys. The salt is a uniform hash of a per-row random-
    free expression (monotonically_increasing_id) so the split is
    deterministic within a run and needs no data knowledge.
    """
    salted = df.withColumn(
        SALT_COL, (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs())
