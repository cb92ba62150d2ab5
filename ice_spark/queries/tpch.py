"""TPC-H-style relational queries adapted to the driver's schema.

The testdata is a simplified TPC-H (no partsupp, no
commit/receipt dates, no comments), so classic queries are adapted to
the available columns; names keep the TPC-H numbers for
recognizability.

Scale notes (100 TB design point):
- lineitem/orders are the fact tables — every join against
  region/nation/customer/supplier/part is explicitly broadcast
  (they are bounded dimensions), so the only shuffles left are the
  fact-side aggregations.
- Aggregations are expressed so the partial (map-side) aggregate
  does the heavy reduction before the shuffle.
- Filters are plain column predicates → Parquet pushdown + pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.helpers import (
    MONEY,
    SQL_REV_DEC,
    SQL_REV_U,
    SQL_SUM_REV,
    SQL_SUM_REV_FAST,
    cavg,
    cents,
    csum,
    davg,
    dsum,
    rev_dec,
    rev_u,
    sql_cavg,
    sql_cents,
    sql_csum,
    sql_davg,
    sql_dsum,
    sum_rev_fast,
)
from ice_spark.queries.registry import register
from ice_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV_TYPE = "decimal(25,6)"


@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_csum('l_quantity')} AS sum_qty,
           {sql_csum('l_extendedprice')} AS sum_base_price,
           {SQL_SUM_REV_FAST} AS sum_disc_price,
           ROUND(CAST(SUM(CAST({SQL_REV_U} * (10000 + {sql_cents('l_tax', 10000)})
                 AS DECIMAL(20,0))) AS DOUBLE) / 1e10, 2) AS sum_charge,
           {sql_cavg('l_quantity')} AS avg_qty,
           {sql_cavg('l_extendedprice')} AS avg_price,
           {sql_cavg('l_discount', 10000)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary report (ref has no agg engine; "
    "Spark-native). Money math on the exact integer-cents fast path "
    "(helpers.py) — 1.8x over decimal aggregation.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # charge per-row fits a long (<= 2e15); only the sum needs decimal.
    charge_row = (rev_u() * (10000 + cents("l_tax", 10000))).cast("decimal(20,0)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity").alias("sum_qty"),
            csum("l_extendedprice").alias("sum_base_price"),
            sum_rev_fast().alias("sum_disc_price"),
            F.round(F.sum(charge_row).cast("double") / 1e10, 2).alias("sum_charge"),
            cavg("l_quantity").alias("avg_qty"),
            cavg("l_extendedprice").alias("avg_price"),
            cavg("l_discount", 10000).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           {SQL_SUM_REV_FAST} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '1999-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority (broadcast dim join + top-k).",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1999-06-30"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1999-06-30"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum_rev_fast().alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 order priority checking (left-semi join).",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, {SQL_SUM_REV_FAST} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 local supplier volume (star join, all dims broadcast).",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(sum_rev_fast().alias("revenue"))
    )


@register(
    "q06_forecast_revenue",
    f"""
    SELECT CAST(SUM({sql_cents('l_extendedprice')} * {sql_cents('l_discount', 10000)}) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting revenue change (pure scan+filter, full pushdown).",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount", 10000))
             .cast("double") / 1e6).alias("revenue")
        )
    )


@register(
    "q07_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {SQL_REV_DEC} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping between two nations.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1997-12-31"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            rev_dec().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "q08_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_dec ELSE 0 END) AS DOUBLE)
                / CAST(SUM(volume_dec) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_REV_DEC} AS volume_dec,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 national market share within a region.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_dec().alias("volume_dec"),
            "nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume_dec")).otherwise(F.lit(0).cast(_REV_TYPE)))
            .cast("double")
            / F.sum("volume_dec").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "q09_product_type_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) / 1e6 AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_REV_U} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 product type profit (adapted: no partsupp cost).",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_dec().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {SQL_SUM_REV} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned item reporting (top 20 by lost revenue).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev_dec()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 (adapted: linestatus instead of shipmode).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer order-count distribution (outer join).",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_effect",
    f"""
    SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN {SQL_REV_DEC} ELSE 0 END) AS DOUBLE)
           / CAST(SUM({SQL_REV_DEC}) AS DOUBLE) AS DOUBLE)
           AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 promotion effect.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    promo = F.when(F.col("p_type") == "PROMO", rev_dec()).otherwise(F.lit(0).cast(_REV_TYPE))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (100.0 * F.sum(promo).cast("double") / F.sum(rev_dec()).cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {SQL_SUM_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 top supplier by quarterly revenue.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_dec()).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 small-quantity-order revenue (correlated avg → broadcast join).",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    # Correlated scalar subquery = per-part average, computed once —
    # not a re-scan per row. No broadcast hint: the aggregate has
    # |part| rows, so it grows with the data; AQE broadcasts it where
    # it measures small and keys the shuffle join otherwise.
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (davg("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) > 15000
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large volume customers (group-having semi join).",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # Every output group key is functionally dependent on the order
    # key, so the HAVING subquery and the outer aggregation are ONE
    # per-order aggregate: a single lineitem scan + one shuffle,
    # instead of scanning/aggregating lineitem twice and re-grouping
    # after the join. Orders/customer attach post-agg by broadcast.
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("q"))
        .where(F.col("q") > 15000)
    )
    # The HAVING filter leaves few orders → broadcast the aggregate,
    # not the orders fact table (which wouldn't fit at 100 TB).
    return (
        orders.join(F.broadcast(per_order), per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            (F.col("q").cast("double") / 100.0).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT {SQL_SUM_REV} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="TPC-H Q19 disjunctive predicate pushdown test.",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(F.sum(rev_dec()).cast("double").alias("revenue"))
    )


@register(
    "q20_promo_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    """,
    doc="TPC-H Q20 (adapted): suppliers with large promo-part volume.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("q"))
        .where(F.col("q") > 100)
    )
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")


@register(
    "q21_multi_supplier_orders",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    """,
    doc="TPC-H Q21 (adapted): lines in finished multi-supplier orders.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_linenumber")
    l2 = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    multi = l1.join(
        l2,
        (l1.l_orderkey == F.col("l2_orderkey")) & (l1.l_suppkey != F.col("l2_suppkey")),
        "left_semi",
    )
    return (
        multi.join(orders, multi.l_orderkey == orders.o_orderkey)
        .join(supp, multi.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (adapted): rich customers with no orders, by nation.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q02_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT l_partkey, unit_cost, s_acctbal, s_name, n_name
      FROM supply
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM (
      SELECT eu.*, p_partkey, p_name,
             MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM eu JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 15 AND p_type = 'STANDARD'
    )
    WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost supplier, adapted: no partsupp table in "
    "the testdata, so supply cost per (part, supplier) is derived from "
    "lineitem (min observed unit price). Correlated-min subquery "
    "expressed as a window MIN — one shuffle on l_partkey instead of a "
    "self-join. Dims (supplier/nation/region/part) broadcast.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    from pyspark.sql import Window

    # Fact-side agg first: one shuffle on (partkey, suppkey); every
    # later join is broadcast, and the window re-uses the partkey
    # clustering from the preceding groupBy.
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu_dims = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # eu_dims is a supplier-scaled subset — no broadcast hint (AQE
    # broadcasts at SFs where it measures small; keyed join at scale).
    eu = supply.join(eu_dims, supply.l_suppkey == eu_dims.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        eu.join(part, eu.l_partkey == part.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    f"""
    WITH national AS (
      SELECT l_partkey, {SQL_REV_U} AS rev_u
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey, CAST(SUM(rev_u) AS DOUBLE) / 1e6 AS part_value
    FROM national
    GROUP BY l_partkey
    HAVING CAST(SUM(rev_u) AS DECIMAL(38,0)) * 1000 >
           (SELECT CAST(SUM(rev_u) AS DECIMAL(38,0)) FROM national)
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 important stock, adapted: part value per supplier "
    "nation derived from lineitem revenue (no partsupp). The global "
    "threshold is a broadcast scalar; the fraction compare runs in "
    "exact integer/decimal math so both engines agree bit-for-bit. "
    "Two aggregates over one shuffled dataset; dims broadcast.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    dims = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    # dims is 1/|nations| of supplier — still supplier-scaled, so the
    # broadcast decision belongs to AQE, not a hint.
    national = li.join(dims, li.l_suppkey == dims.s_suppkey).select(
        "l_partkey", rev_u().alias("rev_u")
    )
    per_part = national.groupBy("l_partkey").agg(F.sum("rev_u").alias("v_u"))
    total = per_part.agg(
        F.sum(F.col("v_u").cast("decimal(38,0)")).alias("total_u")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("v_u").cast("decimal(38,0)") * 1000 > F.col("total_u"))
        .select(
            "l_partkey",
            (F.col("v_u").cast("double") / 1e6).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )
