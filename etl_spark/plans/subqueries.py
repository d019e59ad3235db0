"""Subquery decorrelation surface: the TPC-H shapes that exercise
Catalyst's subquery rewrites (reference has no queries at all —
SURVEY.md §2.2 "Joins/Aggregations" planned surface).

Why these shapes matter at 100 TB: a correlated subquery executed
naively is a per-outer-row scan of the inner table — O(n·m). Catalyst
rewrites every shape here into a join + aggregate the shuffle planner
can optimize:

* scalar-aggregate correlated subquery (q17) → aggregate inner on the
  correlation key, then equi-join;
* IN over a grouped HAVING (q18) → left-semi join against the
  aggregated subquery;
* uncorrelated scalar subquery (q15, q22) → one-row subquery result
  broadcast as a literal/build side — never a cartesian over data;
* NOT EXISTS (q22) → left-anti join.

``tests/test_plan_properties.py`` asserts the decorrelated plans
(no CartesianProduct; semi/anti joins present), because a regression
here is silent at sf0.01 and fatal at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.functions.money import dec, dsum, one_minus
from etl_spark.io import load, register_views
from etl_spark.plans.registry import register

# Shared oracle fragment: the decimal-exact discounted price
# (functions/money.py convention — keeps SUMs engine-exact).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "sql_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    doc="TPC-H-Q7-style bilateral trade volume: 6-way join with the "
        "same dim (nation) joined twice under different roles, a "
        "disjunctive cross-dim predicate, and a year rollup. Both "
        "nation joins broadcast; the disjunction prunes AFTER the "
        "joins (it spans two tables, so it cannot push to either scan "
        "— the filtered-dim alternative is applied on the supplier/"
        "customer side by Catalyst's infer-filters rule).",
    tags=("sql-api", "join", "aggregation"),
)
def sql_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(
        f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(l.l_shipdate) AS ship_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, ship_year
        ORDER BY supp_nation, cust_nation, ship_year
        """
    )


Q8_REGION = "ASIA"
Q8_NATION = "NATION_5"
Q8_TYPE = "ECONOMY"


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(CAST(SUM(CASE WHEN n1.n_name = '{Q8_NATION}'
                              THEN {_REV_SQL}
                              ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    WHERE r.r_name = '{Q8_REGION}'
      AND p.p_type = '{Q8_TYPE}'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY order_year
    ORDER BY order_year
    """,
    doc=f"TPC-H-Q8-style market share: {Q8_NATION}'s slice of "
        f"{Q8_REGION}'s {Q8_TYPE}-part market per year. 8-way join — "
        "nation/region dims broadcast; part and supplier scale with SF so "
        "AQE picks their join strategy; the share is a conditional decimal "
        "sum divided in double (identical operands both engines).",
    tags=("join", "aggregation", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    nation_rev = F.when(F.col("n1.n_name") == Q8_NATION, revenue).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .join(F.broadcast(region), F.col("n2.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(nation_rev).cast("double") / F.sum(revenue).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("order_year")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H-Q13-style order-count distribution: left outer join "
        "with the filter INSIDE the join condition (an ON-clause "
        "predicate on the right side — semantically different from a "
        "WHERE, which would turn the join inner), COUNT over the "
        "nullable side so no-match customers count 0, then a second "
        "aggregation over the first's output. Two shuffles total; the "
        "second input is one row per customer, already tiny.",
    tags=("join", "outer", "aggregation"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority == "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


@register(
    "q15_top_revenue_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_START} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q15_END} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H-Q15-style top supplier: revenue-per-supplier CTE used "
        "twice — once as the join input, once inside an uncorrelated "
        "scalar MAX subquery. The equality is on the exact DECIMAL sum "
        "(double equality on an aggregate would be engine-fragile). "
        "Catalyst executes the scalar subquery once and broadcasts the "
        "single value; the CTE is small (one row per supplier) so the "
        "double computation is cheap — at 100 TB you'd persist it.",
    tags=("sql-api", "subquery", "aggregation"),
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        f"""
        WITH revenue0 AS (
          SELECT l_suppkey AS supplier_no,
                 SUM({_REV_SQL}) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{Q15_START} 00:00:00'
            AND l_shipdate <  TIMESTAMP '{Q15_END} 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN revenue0 r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
        ORDER BY s.s_suppkey
        """
    )


Q17_BRAND = "Brand#4"


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H-Q17-style small-quantity revenue: a CORRELATED scalar "
        "aggregate subquery (per-part average quantity). Catalyst "
        "de-correlates it into aggregate-then-join — one extra shuffle "
        "on partkey instead of a per-row rescan of lineitem; the plan "
        "test asserts no CartesianProduct/BNLJ survives. The quantity "
        "average is exact (integer-valued doubles), so the threshold "
        "comparison is engine-identical.",
    tags=("sql-api", "subquery", "join"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        f"""
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{Q17_BRAND}'
          AND l.l_quantity < (
            SELECT 0.5 * AVG(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


Q18_MIN_QTY = 300


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {Q18_MIN_QTY}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, order_date, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    """,
    doc="TPC-H-Q18-style large-volume customers: IN over a grouped "
        "HAVING subquery. Catalyst turns the IN into a left-semi join "
        "against the aggregated orderkey set — the semi join and the "
        "outer aggregation share the orderkey shuffle. Quantities are "
        "integer-valued doubles, so SUM is exact in both engines.",
    tags=("sql-api", "subquery", "join", "aggregation"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date,
               o.o_totalprice,
               SUM(l.l_quantity) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(l_quantity) > {Q18_MIN_QTY}
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, order_date, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        """
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT)        AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H-Q19-style disjunctive predicate join: three OR'd "
        "brand/size/quantity bands spanning both tables. Catalyst "
        "extracts the common-column disjunctions (brand IN (...), "
        "size/quantity range hulls) and pushes them to each scan, so "
        "the join sees pre-filtered inputs; the full disjunction is "
        "evaluated as the join residual.",
    tags=("join", "aggregation", "predicate"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#16")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    return joined.filter(band).agg(
        dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p.p_retailprice AS DECIMAL(14,2))
                      * CAST(l.l_quantity AS DECIMAL(9,2)) * 0.08)
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY nation, order_year
    ORDER BY nation, order_year DESC
    """,
    doc="TPC-H-Q9-shaped profit rollup (the testdata has no partsupp, "
        "so supply cost is proxied as 8% of retail price — the plan "
        "shape, a 5-way join with a two-table computed measure grouped "
        "by nation×year, is what's exercised): nation broadcasts, the "
        "SF-scaling part/supplier sides go through AQE, profit arithmetic "
        "stays in exact decimals until the final double.",
    tags=("join", "aggregation"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = dec("l_extendedprice") * one_minus("l_discount") - (
        dec("p_retailprice")
        * F.col("l_quantity").cast("decimal(9,2)")
        * F.lit("0.08").cast("decimal(3,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy(F.col("nation").asc(), F.col("order_year").desc())
    )


Q22_CUTOFF = "2000-01-01"


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH thresh AS (
      SELECT CAST(COUNT(*) AS BIGINT)                        AS n_pos,
             SUM(CAST(c_acctbal AS DECIMAL(12,2)))           AS tot_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer c, thresh t
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * t.n_pos > t.tot_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="TPC-H-Q22-style idle rich customers: above-average balance "
        "(uncorrelated scalar threshold) with no recent orders (NOT "
        "EXISTS → left-anti join). The above-average test is phrased "
        "multiplicatively — bal·count > total in exact DECIMAL — so no "
        "engine ever divides (avg-of-doubles is order-dependent and "
        "would flip borderline rows between engines). The one-row "
        "threshold cross-joins as a broadcast literal.",
    tags=("sql-api", "subquery", "anti-join", "aggregation"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        f"""
        WITH thresh AS (
          SELECT COUNT(*)                              AS n_pos,
                 SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot_pos
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer c, thresh t
        WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * t.n_pos > t.tot_pos
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00'
          )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


LATE_DAYS = 365  # ship >1y after order date = "late" (no receipt/commit dates in the testdata)


@register(
    "q21_sole_late_supplier",
    oracle=f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H-Q21-style 'suppliers who kept orders waiting': the "
        "double-correlated EXISTS + NOT EXISTS shape (lateness adapted "
        "to shipdate >1y after orderdate; the testdata has no commit/"
        "receipt dates — reference has no joins at all, SURVEY.md:186). "
        "Catalyst decorrelates both subqueries into a left-semi and a "
        "left-anti join on l_orderkey, so the whole query is three "
        "hash joins sharing one orderkey shuffle — the naive form is a "
        "per-row rescan of lineitem, O(n^2) at 100 TB. Plan-asserted "
        "cartesian-free in tests/test_plan_properties.py.",
    tags=("sql-api", "subquery", "semi-join", "anti-join", "aggregation"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "orders", "supplier"))
    return spark.sql(
        f"""
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        """
    )


Q11_NATION = "NATION_3"


@register(
    "q11_part_value_share",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, SUM({_REV_SQL}) AS value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{Q11_NATION}'
      GROUP BY l.l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(value_dec * 10000 AS BIGINT)) AS BIGINT) AS total_u,
             CAST(COUNT(*) AS BIGINT) AS nparts
      FROM val
    )
    SELECT v.l_partkey AS partkey,
           CAST(v.value_dec AS DOUBLE) AS part_value
    FROM val v, tot t
    WHERE CAST(v.value_dec * 10000 AS BIGINT) * 2 * t.nparts > t.total_u * 3
    ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H-Q11-style 'important stock' share: per-part value from "
        "one nation's suppliers, kept only where the part's share "
        "exceeds 1.5x the AVERAGE part share (value_units * 2 * nparts "
        "> total_units * 3 — pure BIGINT arithmetic on scale-4 decimal "
        "units, no engine ever divides, so borderline parts cannot "
        "flip between engines, and the count-scaled threshold stays "
        "non-trivial at every scale factor, unlike TPC-H's "
        "SF-hardcoded fraction). The global total is a one-row "
        "aggregate cross-joined as a broadcast literal — the same plan "
        "Catalyst builds for a scalar subquery in HAVING, made "
        "explicit. At scale the val aggregation is the only data "
        "shuffle; tot reuses it.",
    tags=("sql-api", "subquery", "aggregation"),
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(
        f"""
        WITH val AS (
          SELECT l.l_partkey, SUM({_REV_SQL}) AS value_dec
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n   ON n.n_nationkey = s.s_nationkey
          WHERE n.n_name = '{Q11_NATION}'
          GROUP BY l.l_partkey
        ),
        tot AS (
          SELECT CAST(SUM(CAST(value_dec * 10000 AS BIGINT)) AS BIGINT) AS total_u,
                 CAST(COUNT(*) AS BIGINT) AS nparts
          FROM val
        )
        SELECT v.l_partkey AS partkey,
               CAST(v.value_dec AS DOUBLE) AS part_value
        FROM val v, tot t
        WHERE CAST(v.value_dec * 10000 AS BIGINT) * 2 * t.nparts > t.total_u * 3
        ORDER BY part_value DESC, partkey
        """
    )


Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


@register(
    "q16_supplier_variety",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN {Q16_SIZES}
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H-Q16-style supplier variety per part attribute (partsupp "
        "proxied by the lineitem part-supplier association): COUNT "
        "DISTINCT over a NOT IN exclusion subquery. Spark executes the "
        "NOT IN as a null-aware anti join against the (tiny, "
        "broadcast) excluded-supplier set; the distinct count is the "
        "usual two-phase partial/final aggregate. The part predicates "
        "all push to the parquet scan.",
    tags=("sql-api", "subquery", "anti-join", "aggregation"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql(
        f"""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN {Q16_SIZES}
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / NULLIF(l_quantity, 0) AS unit_price
      FROM lineitem
    )
    SELECT DISTINCT
           s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_brand,
           u.unit_price AS min_unit_price
    FROM part p
    JOIN unit u     ON u.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'ECONOMY' AND p.p_size <= 5
      AND u.unit_price = (
        SELECT MIN(u2.unit_price) FROM unit u2
        WHERE u2.l_partkey = p.p_partkey
      )
    ORDER BY nation, s.s_name, p.p_partkey
    """,
    doc="TPC-H-Q2-style min-cost supplier per part (supply cost "
        "proxied by the observed lineitem unit price — the testdata "
        "has no partsupp): the classic correlated scalar-MIN subquery. "
        "Catalyst decorrelates it into a per-partkey MIN aggregate "
        "joined back on (partkey, unit_price) — one aggregation plus "
        "one equi-join instead of a per-row rescan. unit_price is a "
        "single IEEE division (correctly rounded, engine-identical; "
        "NULLIF guards zero-quantity lines — ANSI Spark would abort the "
        "whole job on one bad row where DuckDB yields inf, so both map "
        "it to NULL and MIN skips it) "
        "and MIN never accumulates, so the double column is "
        "hash-stable. DISTINCT guards against a supplier hitting the "
        "same minimum twice in two lineitems.",
    tags=("sql-api", "subquery", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem", "supplier", "nation"))
    return spark.sql(
        """
        WITH unit AS (
          SELECT l_partkey, l_suppkey,
                 l_extendedprice / NULLIF(l_quantity, 0) AS unit_price
          FROM lineitem
        )
        SELECT DISTINCT
               s.s_name, n.n_name AS nation,
               p.p_partkey, p.p_brand,
               u.unit_price AS min_unit_price
        FROM part p
        JOIN unit u     ON u.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = u.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'ECONOMY' AND p.p_size <= 5
          AND u.unit_price = (
            SELECT MIN(u2.unit_price) FROM unit u2
            WHERE u2.l_partkey = p.p_partkey
          )
        ORDER BY nation, s.s_name, p.p_partkey
        """
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion / excess stock. Completes the 22-query
# TPC-H shape family.
# --------------------------------------------------------------------------

_Q20_SQL = """
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey FROM partsupp ps
      WHERE ps.ps_partkey IN
            (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        AND ps.ps_availqty > 2 * (
          SELECT SUM(CAST(l.l_quantity AS BIGINT))
          FROM lineitem l
          WHERE l.l_partkey = ps.ps_partkey
            AND l.l_suppkey = ps.ps_suppkey
            AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
    )
    ORDER BY nation, s.s_name
"""


@register(
    "q20_excess_stock_suppliers",
    oracle=_Q20_SQL,
    doc="TPC-H-Q20-style excess-stock suppliers (available quantity "
        "proxied by all-time shipped quantity per (part, supplier) — "
        "the testdata has no partsupp): the deepest nesting in the "
        "family — IN over a subquery that itself contains an IN plus "
        "a CORRELATED scalar aggregate. Catalyst decorrelates all "
        "three levels: part filter -> semi join, the correlated "
        "1997-window SUM -> aggregate-then-join on (partkey, "
        "suppkey), the outer IN -> semi join against the qualifying "
        "supplier set; the executed plan is joins+aggregates only "
        "(plan-asserted cartesian-free). Quantities are "
        "integer-valued doubles, so every SUM and the doubled "
        "threshold compare in exact BIGINT arithmetic — no "
        "borderline supplier can flip between engines. The empty "
        "1997 window yields a NULL scalar (authentic TPC-H "
        "three-valued logic) and fails the > in both engines "
        "identically.",
    tags=("sql-api", "subquery", "join", "aggregation"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    return spark.sql(_Q20_SQL)
