"""Runtime-filter join patterns: bloom-style pre-filtering ahead of a
shuffle join, and the cross-split LSH leakage audit built on it.

Why this family exists: at 100 TB the dominant join cost is shuffling
the FACT side. When the dim side is selective, most shuffled fact rows
are dropped by the join anyway — the classic fix is to broadcast a
compact fingerprint of the dim keys (a bloom filter) and drop
non-matching fact rows BEFORE the exchange. Spark's optimizer can
inject this itself (``spark.sql.optimizer.runtime.bloomFilter.*`` —
fenced in tests/test_plan_properties.py); the registered query builds
the same structure manually from public primitives so the shape is
explicit, engine-portable, and oracle-checkable:

* two hash positions per key via ``xxhash64(key, seed) mod M`` —
  a 2-hash bloom filter over an M-bucket space;
* the dim's DISTINCT position sets are bounded by M (=2^16) rows
  REGARDLESS of dim row count or width, so they broadcast even when
  the dim itself cannot (wide rows, 10^8 keys);
* fact rows survive only if BOTH their positions appear in the
  corresponding set (two broadcast LEFT SEMI joins — false positives
  possible, false negatives impossible);
* the exact equi-join then runs on survivors only, so the result is
  EXACT and the DuckDB oracle is the plain join — the bloom stage
  changes the plan, never the answer.

The reference has no joins at all (/root/reference/main.py); this is
part of the §2.2 extension surface's join family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.functions.money import dec, one_minus
from etl_spark.io import load
from etl_spark.plans.registry import register

#: Bloom bucket space: 2^16 positions per hash. The position sets are
#: therefore at most 65 536 rows each (a few hundred KB broadcast),
#: independent of dim cardinality; with k=2 hashes and n dim keys the
#: false-positive rate is ~(n/M)^2 — at n=10^4, ~2.3%.
BLOOM_M = 1 << 16
_BLOOM_SEEDS = (1, 2)


def bloom_position(key, seed: int):
    """Bucket position of ``key`` under hash ``seed``: xxhash64 folded
    into [0, BLOOM_M). xxhash64 is seeded per-column-list, so a
    distinct literal second column yields an independent hash."""
    return F.pmod(F.xxhash64(key.cast("bigint"), F.lit(seed)), F.lit(BLOOM_M))


def bloom_prefilter(fact: DataFrame, fact_key: str, dim_keys: DataFrame) -> DataFrame:
    """Drop ``fact`` rows whose ``fact_key`` cannot match any key in
    ``dim_keys`` (single-column DataFrame), via two broadcast semi
    joins on bloom positions. Exact-join the survivors afterwards."""
    out = fact
    key_col = dim_keys.columns[0]
    for seed in _BLOOM_SEEDS:
        positions = dim_keys.select(
            bloom_position(F.col(key_col), seed).alias("_bloom_p")
        ).distinct()
        out = out.join(
            F.broadcast(positions),
            bloom_position(F.col(fact_key), seed) == positions["_bloom_p"],
            "left_semi",
        )
    return out


@register(
    "join_bloom_prefilter_revenue",
    oracle="""
    SELECT
      s.s_nationkey                               AS nation_key,
      COUNT(DISTINCT s.s_suppkey)                 AS n_suppliers,
      COUNT(*)                                    AS n_lineitems,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
           AS DOUBLE)                             AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal < 0
    GROUP BY s.s_nationkey
    """,
    doc="Bloom-prefiltered selective join: revenue routed through "
        "suppliers in arrears (s_acctbal < 0, ~6% of suppliers). The "
        "dim keys' two xxhash64-mod-2^16 position sets (bounded by "
        "BLOOM_M rows each, never by dim size) broadcast to prune "
        "lineitem BEFORE its shuffle — the manual twin of Spark's "
        "runtime bloom-filter injection, kept explicit so the 100 TB "
        "shape (fact exchange carries only might-match rows) is "
        "plan-visible. The exact equi-join on survivors makes the "
        "result independent of bloom false positives, so the oracle "
        "is the plain join.",
    tags=("join", "bloom", "runtime-filter", "aggregation"),
)
def join_bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    fact = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    survivors = bloom_prefilter(fact, "l_suppkey", supplier.select("s_suppkey"))
    return (
        survivors.join(
            supplier.select("s_suppkey", "s_nationkey"),
            survivors.l_suppkey == supplier.s_suppkey,
        )
        .groupBy(F.col("s_nationkey").alias("nation_key"))
        .agg(
            F.count_distinct("s_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(dec("l_extendedprice") * one_minus("l_discount"))
            .cast("double")
            .alias("revenue"),
        )
    )
