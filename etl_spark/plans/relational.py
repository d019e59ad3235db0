"""Relational core: scans, aggregations, joins, top-k.

The reference has no relational algebra at all (SURVEY.md §2.2 — its
only "query" is a generator chain, reference main.py:160-176), so the
semantics here are ANSI/Spark SQL as mandated by the north star. Every
query is a (DataFrame builder, DuckDB oracle SQL) pair registered under
the same name; aggregate columns go through the decimal-exact helpers
in functions/money.py so the value hash is engine-stable.

Scale notes (100 TB posture):
* Constant dims (nation/region) are broadcast explicitly — no shuffle
  on the fact side. SF-scaling tables (customer/supplier/part) are
  never force-broadcast: AQE chooses broadcast while they fit and
  shuffled joins beyond (policy fenced by tests/test_broadcast_policy.py).
* Fact-fact joins rely on AQE (skew splitting + coalescing) and carry
  their join keys through the shuffle only once.
* All filters are plain column predicates on the scan → parquet
  pushdown + column pruning happen for free (verified via .explain in
  bench audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.functions.money import davg, dec, dsum, one_minus, one_plus
from etl_spark.io import load
from etl_spark.plans.registry import register

# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7 Stage 0).
# --------------------------------------------------------------------------

Q1_CUTOFF = "2000-12-01"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      SUM(l_quantity)                                        AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                                                             AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                                                             AS sum_charge,
      SUM(l_quantity) / COUNT(*)                             AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
                                                             AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
                                                             AS avg_disc,
      COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: grouped sums/averages over lineitem "
        "with decimal-exact money math (flagship, SURVEY.md §7 Stage 0).",
    tags=("aggregation", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec("l_discount", 4, 2), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Row-level scan: filter + project + computed column (predicate pushdown).
# --------------------------------------------------------------------------


@register(
    "scan_filter_project",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity,
      CAST(CAST(l_extendedprice AS DECIMAL(14,2))
           * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS discount_amount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6-style selective scan: every predicate is pushed to the "
        "parquet reader; projection prunes to 4 of 11 columns.",
    tags=("scan", "filter"),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (dec("l_extendedprice") * dec("l_discount", 4, 2))
            .cast("double")
            .alias("discount_amount"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: single-row global aggregate over a selective scan "
        "(map-side partial agg, no wide shuffle).",
    tags=("aggregation",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_filter_project(spark, sf_dir).agg(
        dsum(
            F.col("discount_amount").cast("decimal(16,4)"),
            "revenue",
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Joins (SURVEY.md §2.2 "Joins": inner/left/semi/anti/broadcast).
# --------------------------------------------------------------------------


@register(
    "join_inner_orders_customer",
    oracle="""
    SELECT
      o.o_orderkey,
      c.c_custkey,
      c.c_name,
      c.c_mktsegment,
      o.o_totalprice,
      strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
    doc="Inner equi-join orders⋈customer. customer SCALES WITH SF "
        "(15 B rows at the 100 TB point), so no forced broadcast — AQE "
        "picks broadcast at small scale and shuffled hash/SMJ once the "
        "build side outgrows the threshold. Forced broadcasts are "
        "reserved for genuinely bounded tables (policy fenced by "
        "tests/test_broadcast_policy.py).",
    tags=("join",),
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@register(
    "join_left_customer_orders",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_name,
      COUNT(o.o_orderkey)                                   AS n_orders,
      CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE)
                                                            AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join preserving customers with zero orders, then "
        "per-customer count + decimal-exact spend.",
    tags=("join", "aggregation"),
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(14,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


SEMI_THRESHOLD = 50_000


@register(
    "join_semi_big_spenders",
    oracle=f"""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {SEMI_THRESHOLD}
    )
    """,
    doc="Left-semi join: customers having at least one order over the "
        "threshold. Semi joins never duplicate the left side and carry "
        "no payload from the right → cheapest existence check at scale.",
    tags=("join",),
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > SEMI_THRESHOLD)
    return cust.join(big, big.o_custkey == cust.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_no_f_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
    doc="Left-anti join: customers with no finished orders.",
    tags=("join",),
)
def join_anti_no_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    f_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(f_orders, f_orders.o_custkey == cust.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer_status_counts",
    oracle="""
    WITH o AS (
      SELECT o_custkey, COUNT(*) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ),
    f AS (
      SELECT o_custkey, COUNT(*) AS n_finished
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT
      COALESCE(o.o_custkey, f.o_custkey)                 AS custkey,
      COALESCE(o.n_open, 0)                              AS n_open,
      COALESCE(f.n_finished, 0)                          AS n_finished,
      CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END    AS only_finished,
      CASE WHEN f.o_custkey IS NULL THEN 1 ELSE 0 END    AS only_open
    FROM o FULL JOIN f ON o.o_custkey = f.o_custkey
    """,
    doc="Full outer join: per-customer open-order counts ⟗ finished-"
        "order counts — both sides null-extend (customers with only "
        "open or only finished orders survive), which no other join "
        "type expresses. Same-source aggregates keep each side "
        "pre-shuffled on the join key.",
    tags=("join", "outer"),
)
def join_full_outer_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def per_cust(status: str, out: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(out))
        )

    o = per_cust("O", "n_open").alias("o")
    f = per_cust("F", "n_finished").alias("f")
    return o.join(f, F.col("o.o_custkey") == F.col("f.o_custkey"), "full").select(
        F.coalesce(F.col("o.o_custkey"), F.col("f.o_custkey")).alias("custkey"),
        F.coalesce(F.col("n_open"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("n_finished"), F.lit(0)).alias("n_finished"),
        F.when(F.col("o.o_custkey").isNull(), 1).otherwise(0).alias("only_finished"),
        F.when(F.col("f.o_custkey").isNull(), 1).otherwise(0).alias("only_open"),
    )


@register(
    "join_right_urgent_orders_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Right outer join: every customer survives, urgent orders "
        "attach where they exist (null-extended otherwise). Semantically "
        "the mirror of join_left_customer_orders, registered so the "
        "right-join code path is covered explicitly.",
    tags=("join", "outer"),
)
def join_right_urgent_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = load(spark, sf_dir, "customer")
    return urgent.join(cust, urgent.o_custkey == cust.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_broadcast_geo_rollup",
    oracle="""
    SELECT
      r.r_name                                   AS region_name,
      n.n_name                                   AS nation_name,
      COUNT(*)                                   AS n_customers,
      MIN(c.c_acctbal)                           AS min_acctbal,
      MAX(c.c_acctbal)                           AS max_acctbal,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Star-schema dim join: nation (25 rows) and region (5 rows) are "
        "broadcast — the customer fact never shuffles for the join, only "
        "for the final (tiny) aggregation.",
    tags=("join", "broadcast", "aggregation"),
)
def join_broadcast_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
            F.sum(dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation variants: distinct counts, rollup, cube.
# --------------------------------------------------------------------------


@register(
    "agg_distinct_priority",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*)                     AS n_orders,
      COUNT(DISTINCT o_custkey)    AS n_customers,
      COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Grouped exact distinct counts (expand + two-phase agg in Spark).",
    tags=("aggregation",),
)
def agg_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct("o_orderstatus").alias("n_statuses"),
        )
    )


def agg_approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL sketch per priority — the form that actually runs at
    100 TB (no expand, mergeable partial aggregates, fixed memory).
    Unregistered: sketch values are engine-specific, so the REGISTERED
    form is the bounded-verdict twin below, which makes the sketch's
    error contract itself hash-checkable against DuckDB. pytest
    (tests/test_approx.py) still drives this raw form directly."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           TRUE AS within_bound
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Bounded-verdict form of the HyperLogLog++ sketch: ONE pass "
        "computes both approx_count_distinct(rsd=0.02) and the exact "
        "distinct count per priority, and emits within_bound = "
        "|approx - exact| <= max(3, 0.1*exact) (5-sigma of the "
        "configured rsd plus integer slack) computed IN-PLAN. The "
        "oracle recomputes the exact side and asserts the verdict "
        "TRUE, so the sketch's error CONTRACT is hash-checked even "
        "though its value is engine-specific. The raw sketch twin "
        "(agg_approx_distinct_raw, unregistered) is what runs at "
        "100 TB — this form is the verification query you run on a "
        "sample to certify the sketch config before trusting it.",
    tags=("aggregation", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = F.count_distinct("o_custkey").cast("bigint")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    bound = F.greatest(F.lit(3.0), F.lit(0.1) * exact.cast("double"))
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact.alias("n_customers"),
            F.coalesce(
                F.abs(approx.cast("double") - exact.cast("double")) <= bound,
                F.lit(False),
            ).alias("within_bound"),
        )
    )


@register(
    "agg_rollup_orders",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_totalprice
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy: (status, priority) → (status) → grand total; "
        "one shuffle, grouping-set expansion handled by Spark.",
    tags=("aggregation", "rollup"),
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_totalprice"),
        )
    )


@register(
    "agg_cube_lineitem",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*)        AS n_rows,
      SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two low-cardinality dims (all 2^2 grouping sets).",
    tags=("aggregation", "cube"),
)
def agg_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT
      n.n_name AS nation_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
           AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q5_DATE_HI} 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H-Q5-style local supplier volume: 5-way join where customer "
        "and supplier must share a nation. supplier (10 rows) and nation "
        "(25) broadcast; the fact chain customer⋈orders⋈lineitem is left "
        "to Catalyst/AQE to order. Exercises join reordering + a "
        "two-table join condition.",
    tags=("join", "aggregation"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_DATE_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation),
            (cust.c_nationkey == nation.n_nationkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(revenue, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_priority_by_qty_band",
    oracle="""
    SELECT
      CASE WHEN l.l_quantity >= 30 THEN 'bulk' ELSE 'small' END AS qty_band,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT)  AS high_priority_lines,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT)  AS low_priority_lines
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="TPC-H-Q12-style conditional counting over a fact-fact join: "
        "CASE-based pivoted tallies computed in one aggregation pass.",
    tags=("join", "aggregation", "conditional"),
)
def q12_priority_by_qty_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.when(F.col("l_quantity") >= 30, "bulk").otherwise("small").alias("qty_band")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_priority_lines"),
        )
    )


# --------------------------------------------------------------------------
# Top-k (SURVEY.md §2.2 "Limits / top-k").
# --------------------------------------------------------------------------


@register(
    "top_k_orders",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      o_totalprice,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject — per-partition "
        "heaps of size k, then a k-row merge on the driver; no full sort "
        "at any scale. Tiebreak on o_orderkey keeps the row set total-"
        "ordered and engine-independent.",
    tags=("topk", "sort"),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


# --------------------------------------------------------------------------
# Additional TPC-H-style shapes (breadth of the SQL surface).
# --------------------------------------------------------------------------


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS DOUBLE)                                        AS promo_revenue_pct,
      COUNT(*)                                               AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    doc="TPC-H-Q14-style promo revenue share: conditional decimal-exact "
        "sums over a fact-dim join (part broadcasts), one final double "
        "division. The CASE keeps both branches in the same decimal "
        "type so the sums stay engine-exact.",
    tags=("join", "aggregation", "conditional"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    promo = F.when(
        F.col("p_type") == "PROMO", disc_price
    ).otherwise(F.lit(0).cast("decimal(16,4)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            ).cast("double").alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_revenue_top20",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H-Q10-style returned-item revenue: 4-way join (nation "
        "broadcast), per-customer revenue over returned lines, global "
        "top-20 via TakeOrderedAndProject (no full sort).",
    tags=("join", "aggregation", "topk"),
)
def q10_returned_revenue_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "unpivot_returnflag_measures",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)      AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
             CAST(COUNT(*) AS DOUBLE)                                    AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_base_price', sum_base_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_items', n_items FROM wide
    )
    """,
    doc="Wide-to-long reshaping with DataFrame.unpivot (melt): one "
        "aggregate row per return flag becomes one row per (flag, "
        "measure). Catalyst's Expand node emits all measure rows in "
        "the same pass — a narrow map after the aggregate, no second "
        "shuffle and no 3x self-read the UNION ALL oracle implies. "
        "The inverse of pivot_user_event_counts; measures are cast to "
        "one common type (double) as unpivot requires.",
    tags=("reshape", "unpivot", "aggregation"),
)
def unpivot_returnflag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            F.count(F.lit(1)).cast("double").alias("n_items"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_base_price", "n_items"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "supplier_balance_rollup",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(14,2))) AS DOUBLE)
             AS total_balance,
           CAST(CAST(SUM(CAST(s.s_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_balance,
           CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_debt
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Supplier account-balance rollup per nation (decimal-exact "
        "sums, negative-balance count): the remaining base-table "
        "surface — supplier joins its broadcast nation dim and "
        "aggregates on the dim attribute. Map-combinable; dim "
        "broadcast.",
    tags=("aggregation", "join"),
)
def supplier_balance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_spark.functions.money import dec

    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec("s_acctbal")).cast("double").alias("total_balance"),
            (F.sum(dec("s_acctbal")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_balance"),
            F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_debt"),
        )
        .orderBy("n_name")
    )
