"""Range frames, percentiles, null semantics, and range joins —
the remaining ANSI-surface corners (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.functions.money import dec
from etl_spark.io import load
from etl_spark.plans.registry import register


@register(
    "window_rolling_30d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d
    FROM orders
    """,
    doc="RANGE frame: rolling 30-day spend per customer. The order key "
        "is integer days-since-epoch so the range bound is engine-"
        "independent; peers at the same day aggregate together (RANGE, "
        "not ROWS, semantics).",
    tags=("window", "range-frame"),
)
def window_rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_price,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (median, p90) per status. Both "
        "engines use the same linear interpolation a+(b-a)*frac over "
        "sorted values; the inputs are 2-decimal doubles so the "
        "arithmetic is correctly-rounded-identical. At 100 TB the "
        "sketch form (approx_percentile) replaces this — exact "
        "percentile requires a global sort per group.",
    tags=("aggregation", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "agg_grouping_sets_status_priority",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INTEGER)   AS g_status,
      CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_totalprice
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS — an arbitrary set list ((status), "
        "(priority), ()) that neither ROLLUP nor CUBE produces, with "
        "GROUPING() flags disambiguating aggregated-away keys from "
        "genuine NULLs. One shuffle; Spark's Expand handles the set "
        "expansion map-side.",
    tags=("aggregation", "grouping-sets"),
)
def agg_grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_totalprice"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "sum_totalprice",
        )
    )


def agg_approx_percentiles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw approx_percentile (GK/KLL-style sketch) per status — the
    form that replaces exact percentiles at 100 TB: mergeable partial
    sketches, fixed memory, no global per-group sort. Returns an
    actual data value within n/accuracy rank error of the target
    rank. Unregistered (sketch cut points are engine-specific); the
    REGISTERED form is the bounded-verdict twin below, and pytest
    (tests/test_approx.py) drives this raw form directly."""
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9], 10_000)
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(pcts.alias("pcts"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderstatus",
            F.element_at("pcts", 1).alias("approx_p50_price"),
            F.element_at("pcts", 2).alias("approx_p90_price"),
            "n_orders",
        )
    )


@register(
    "agg_approx_percentiles",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus,
             CAST(o_totalprice AS DECIMAL(14,2)) AS price,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN price END) AS DOUBLE) AS p50_disc,
           CAST(MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN price END) AS DOUBLE) AS p90_disc,
           TRUE AS within_bound
    FROM ranked
    GROUP BY o_orderstatus
    """,
    doc="Bounded-verdict form of the percentile sketch: the plan "
        "computes approx_percentile(accuracy=10000) per status AND "
        "the per-group sorted ranks, then checks IN-PLAN that each "
        "sketch value's position lands within the sketch's guaranteed "
        "rank window (target rank ceil(p*n), slack max(2, n/10000+1) "
        "— GK's deterministic n/accuracy bound plus integer slack). "
        "Emits the exact discrete percentiles (agg_percentile_disc's "
        "explicit rank formula, engine-agreed tie rule) and the "
        "within_bound verdict; the oracle replays the exact side and "
        "asserts the verdict TRUE, so the sketch's rank-error "
        "CONTRACT is hash-checked even though its cut points are "
        "engine-specific. The raw sketch twin "
        "(agg_approx_percentiles_raw, unregistered) is the 100 TB "
        "form; this is the certification query for its config.",
    tags=("aggregation", "percentile", "approx"),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9], 10_000)
    approx = (
        orders.groupBy("o_orderstatus")
        .agg(pcts.alias("pcts"))
        .select(
            "o_orderstatus",
            F.element_at("pcts", 1).alias("a50"),
            F.element_at("pcts", 2).alias("a90"),
        )
    )
    wo = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        F.col("o_totalprice").alias("raw_price"),
        dec("o_totalprice").alias("price"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # broadcast: 3-row per-status sketch frame (status-bounded)
    j = ranked.join(F.broadcast(approx), "o_orderstatus")
    slack = F.greatest(
        F.lit(2).cast("bigint"), (F.col("n") / 10_000).cast("bigint") + 1
    )

    def at_rank(rank_expr, col="price"):
        return F.min(F.when(F.col("rn") == rank_expr, F.col(col)))

    def verdict(p: float, a_col: str):
        t = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        lo = at_rank(F.greatest(F.lit(1).cast("bigint"), t - slack), "raw_price")
        hi = at_rank(F.least(F.col("n"), t + slack), "raw_price")
        a = F.first(a_col)
        return (a >= lo) & (a <= hi)

    def disc(p: float):
        at = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        return at_rank(at).cast("double")

    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        disc(0.5).alias("p50_disc"),
        disc(0.9).alias("p90_disc"),
        F.coalesce(
            verdict(0.5, "a50") & verdict(0.9, "a90"), F.lit(False)
        ).alias("within_bound"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      NULLIF(l_discount, 0.0)                         AS discount_or_null,
      COALESCE(NULLIF(l_discount, 0.0), -1.0)         AS discount_filled,
      CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END AS is_zero_discount,
      CAST(NULL AS VARCHAR)                           AS always_null
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Null semantics: NULLIF/COALESCE/IS NULL round-trips — ANSI "
        "three-valued logic parity between engines.",
    tags=("scalar", "null"),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    disc_or_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_or_null.alias("discount_or_null"),
        F.coalesce(disc_or_null, F.lit(-1.0)).alias("discount_filled"),
        F.when(disc_or_null.isNull(), 1).otherwise(0).alias("is_zero_discount"),
        F.lit(None).cast("string").alias("always_null"),
    )


# Static decile boundaries for events.value (values are uniform-ish in
# [0, 100); the dim is a constant table — the broadcast side).
VALUE_BUCKETS = [(i, float(i * 10), float((i + 1) * 10)) for i in range(10)]


@register(
    "audit_rate_precision",
    oracle="""
    SELECT
      COUNT(*)                                                    AS n_rows,
      CAST(COUNT(*) FILTER (WHERE l_discount <> round(l_discount, 2)) AS BIGINT)
                                                                  AS bad_discounts,
      CAST(COUNT(*) FILTER (WHERE l_tax <> round(l_tax, 2)) AS BIGINT)
                                                                  AS bad_taxes,
      CAST(COUNT(*) FILTER (WHERE l_extendedprice <> round(l_extendedprice, 2)) AS BIGINT)
                                                                  AS bad_prices
    FROM lineitem
    """,
    doc="Data audit backing the engine's decimal-money design "
        "(functions/money.py): every rate/price must be at most "
        "2-decimal or the DECIMAL(4,2) casts would silently round. "
        "All bad_* columns must be 0 — run this when onboarding a new "
        "dataset.",
    tags=("audit", "aggregation"),
)
def audit_rate_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def bad(col: str) -> F.Column:
        return F.sum(
            F.when(F.col(col) != F.round(F.col(col), 2), 1).otherwise(0)
        ).cast("bigint")

    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        bad("l_discount").alias("bad_discounts"),
        bad("l_tax").alias("bad_taxes"),
        bad("l_extendedprice").alias("bad_prices"),
    )


@register(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INTEGER)   AS g_status,
      CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="GROUPING() indicators on a ROLLUP — distinguishes 'NULL key "
        "value' rows from 'aggregated over this key' rows, which raw "
        "NULLs cannot.",
    tags=("aggregation", "rollup"),
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders"
        )
    )


@register(
    "window_lead_next_order",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w                         AS next_orderkey,
           strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d')  AS next_order_date,
           FIRST_VALUE(o_orderkey) OVER w                  AS first_orderkey,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                                           AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="LEAD / FIRST_VALUE / NTH_VALUE — the forward-looking window "
        "complements of the lag query.",
    tags=("window", "lead"),
)
def window_lead_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias(
            "next_order_date"
        ),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_orderkey"),
    )


@register(
    "range_join_value_buckets",
    oracle=f"""
    WITH buckets AS (
      SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
             CAST(lo AS DOUBLE)        AS lo,
             CAST(hi AS DOUBLE)        AS hi
      FROM (VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BUCKETS)})
           AS t(bucket_id, lo, hi)
    )
    SELECT b.bucket_id, b.lo, b.hi,
           COUNT(e.event_id)                                 AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM buckets b
    LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bucket_id, b.lo, b.hi
    """,
    doc="Range (theta) join: events banded into a tiny boundary dim via "
        "lo <= value < hi. The dim side is broadcast, so the non-equi "
        "condition evaluates map-side (BroadcastNestedLoopJoin) — the "
        "only sane physical shape for a range join against a constant "
        "band table; a fact-fact range join would need interval "
        "bucketing first.",
    tags=("join", "range-join"),
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = spark.createDataFrame(VALUE_BUCKETS, ["bucket_id", "lo", "hi"])
    ev = load(spark, sf_dir, "events")
    return (
        F.broadcast(buckets)
        .join(ev, (ev.value >= buckets.lo) & (ev.value < buckets.hi), "left")
        .groupBy("bucket_id", "lo", "hi")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
