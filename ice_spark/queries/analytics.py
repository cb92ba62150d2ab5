"""Window functions, set operations, grouping sets, percentiles.

The reference has none of these (SURVEY.md §2.8) — they come from
Spark SQL itself; these queries prove the engine exposes them and
that plans stay shuffle-minimal (window partitions reuse the
aggregation partitioning where possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ice_spark.queries.helpers import (
    SQL_REV_U,
    SQL_REV_DEC,
    cents,
    dsum,
    rev_dec,
    rev_u,
    sql_cents,
    sum_rev_fast,
)
from ice_spark.queries.registry import register
from ice_spark.tables import load_table



@register(
    "w01_top_customers_per_nation",
    f"""
    SELECT n_name, c_custkey, revenue, rk
    FROM (
      SELECT n_name, c_custkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY revenue DESC, c_custkey) AS rk
      FROM (
        SELECT n_name, c_custkey,
               CAST(SUM({SQL_REV_U}) AS DOUBLE) / 1e6 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, c_custkey
      ) rev
    ) ranked
    WHERE rk <= 3
    """,
    doc="Top-3 customers by revenue per nation (window over agg).",
)
def w01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    # Aggregate per customer key FIRST (the shuffle moves only
    # (custkey, partial-sum) longs), then attach nation names to the
    # ~|customer| aggregate — the fact-table rows never carry
    # dimension strings. No broadcast hint on the customer-scaled
    # sides: AQE broadcasts them at SFs where they measure small and
    # keys the join at scale.
    # No forced broadcast on orders: it is a fact table (AQE
    # broadcasts it at small SF; at 100 TB this is a co-partitioned
    # shuffle join on orderkey).
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(sum_rev_fast().alias("revenue"))
    )
    dims = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "n_name"
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.join(dims, rev.o_custkey == dims.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "revenue", "rk")
    )


@register(
    "w02_monthly_revenue_running_total",
    f"""
    SELECT month,
           CAST(mrev_dec AS DOUBLE) AS monthly_revenue,
           CAST(SUM(mrev_dec) OVER (ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue
    FROM (
      SELECT STRFTIME(DATE_TRUNC('month', l_shipdate), '%Y-%m-%d') AS month,
             SUM({SQL_REV_DEC}) AS mrev_dec
      FROM lineitem
      GROUP BY 1
    ) m
    """,
    doc="Monthly revenue + running total (global window; single-partition "
    "window is fine because the month cardinality is tiny after agg).",
)
def w02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # timestamp key through the lineitem agg, string rendered after
    # (e01 pattern — narrower map-side hash key than the 10-char month)
    monthly = (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("__m"))
        .agg(F.sum(rev_dec()).alias("mrev_dec"))
        .select(F.date_format("__m", "yyyy-MM-dd").alias("month"), "mrev_dec")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Running total stays in decimal through the window (double window
    # sums aren't associativity-stable across engines).
    return monthly.select(
        "month",
        F.col("mrev_dec").cast("double").alias("monthly_revenue"),
        F.sum("mrev_dec").over(w).cast("double").alias("running_revenue"),
    )


@register(
    "w03_top_parts_per_brand",
    f"""
    SELECT p_brand, p_partkey, revenue
    FROM (
      SELECT p_brand, p_partkey, revenue,
             DENSE_RANK() OVER (PARTITION BY p_brand
                                ORDER BY revenue DESC, p_partkey) AS rk
      FROM (
        SELECT p_brand, p_partkey,
               CAST(SUM({SQL_REV_DEC}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      ) rev
    ) ranked
    WHERE rk <= 2
    """,
    doc="Top-2 parts by revenue per brand (dense_rank).",
)
def w03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(rev_dec()).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("rk", F.dense_rank().over(w))
        .where(F.col("rk") <= 2)
        .select("p_brand", "p_partkey", "revenue")
    )


@register(
    "s01_nation_key_set_ops",
    """
    SELECT 'both' AS tag, k FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
    ) i
    UNION ALL
    SELECT 'customer_only' AS tag, k FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT
      SELECT s_nationkey AS k FROM supplier
    ) e
    """,
    doc="Set operations: INTERSECT / EXCEPT / UNION ALL.",
)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "k")
    only = cust.subtract(supp).select(F.lit("customer_only").alias("tag"), "k")
    return both.unionAll(only)


@register(
    "s02_revenue_rollup",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(SUM({SQL_REV_DEC}) AS DOUBLE) AS revenue,
           GROUPING(r_name) + GROUPING(n_name) AS lvl
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP region→nation revenue with grouping level.",
)
def s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.sum(rev_dec()).cast("double").alias("revenue"),
            (F.grouping("r_name") + F.grouping("n_name")).alias("lvl"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue",
            "lvl",
        )
    )


@register(
    "s03_returnflag_cube",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over returnflag × linestatus.",
)
def s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@register(
    "a01_distinct_counts",
    """
    SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
    doc="Multi count-distinct (expand + partial agg in Spark).",
)
def a01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a02_price_percentiles",
    """
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (rounded: interpolation "
    "arithmetic differs in last ulps across engines). Spark side "
    "routes through operators/median.exact_group_percentiles — "
    "value-counts + per-group running sum + rank bracketing, bounded "
    "memory at any scale — instead of F.percentile, whose buffering "
    "aggregate OOM'd an 8g heap at the sf10 probe once the r11 "
    "honest evaluator stopped count() from pruning it (bit-identical "
    "to F.percentile by construction; oracle string unchanged, the "
    "e21-style Spark-side rerouting).",
)
def a02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.median import exact_group_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    pct = exact_group_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)],
    )
    return pct.select(
        "l_returnflag",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
    )


@register(
    "a03_order_value_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
    doc="Value histogram via bucketed floor division.",
)
def a03(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "a04_pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot (orderstatus columns per priority) via Spark pivot().",
)
def a04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


@register(
    "s04_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (finer control than rollup/cube).",
)
def s04(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25, 30)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted: supplier relationships from lineitem, no "
    "partsupp): distinct supplier counts per part attribute group.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "w04_customer_order_gaps",
    """
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    )
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           COUNT(gap) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS total_gap_days,
           CAST(SUM(gap) AS DOUBLE) / NULLIF(COUNT(gap), 0) AS avg_gap_days
    FROM g
    GROUP BY o_custkey
    """,
    doc="LAG window + date arithmetic: per-customer inter-order gaps. "
    "Deterministic lag via (date, orderkey) tie-break; exact integer "
    "day sums; NULL average for single-order customers in both "
    "engines.",
)
def w04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
    )
    return g.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("gap").alias("n_gaps"),
        F.sum("gap").cast("long").alias("total_gap_days"),
        (F.sum("gap").cast("double") / F.nullif(F.count("gap"), F.lit(0))).alias(
            "avg_gap_days"
        ),
    )


@register(
    "a05_order_value_deciles",
    """
    WITH d AS (
      SELECT o_orderstatus,
             CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
               AS decile,
             o_totalprice
      FROM orders
    )
    SELECT decile,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
    FROM d
    GROUP BY decile
    """,
    doc="NTILE decile distribution of order values. The ORDER BY "
    "carries an o_orderkey tie-break so tile boundaries are a total "
    "order — identical in both engines. Round 6: the global NTILE no "
    "longer serializes one window task — operators/ranking.global_ntile "
    "computes the same tile assignment as a range-partitioned "
    "distributed sort with broadcast offsets (the e20 fix, reused).",
)
def a05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    d = global_ntile(
        orders.select("o_orderstatus", "o_totalprice", "o_orderkey"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        10,
        "__dec",
    ).select(
        "o_orderstatus",
        F.col("__dec").cast("int").alias("decile"),
        "o_totalprice",
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_value"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
    )


@register(
    "s07_bag_set_ops",
    """
    SELECT 'intersect_all' AS tag, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS k FROM supplier
    ) a
    UNION ALL
    SELECT 'except_all' AS tag, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS k FROM supplier
    ) b
    """,
    doc="Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): "
    "multiplicity-preserving variants of s01.",
)
def s07(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    ia = cust.intersectAll(supp).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("tag"), "n"
    )
    ea = cust.exceptAll(supp).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("tag"), "n"
    )
    return ia.unionByName(ea)


@register(
    "w05_sliding_7day_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER (ORDER BY d
                RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rev_7d
    FROM daily
    """,
    doc="RANGE-frame sliding window: 7-day revenue over pre-aggregated "
    "daily totals (the window runs over days, not raw orders — tiny "
    "state at any scale). Decimal sums inside the frame keep both "
    "engines exact.",
)
def w05(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    days = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(days).rangeBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
    )


@register(
    "e12_event_value_percentile",
    """
    WITH d AS (
      SELECT event_type, value,
             CUME_DIST() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS cd
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN cd <= 0.5 THEN CAST(value AS DECIMAL(18,2))
                    ELSE 0 END) AS DOUBLE) AS bottom_half_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM d
    GROUP BY event_type
    """,
    doc="CUME_DIST semantics (bottom-half value mass per event type) "
    "computed WITHOUT sorting raw events: cd <= 0.5 with a total "
    "order selects the n div 2 smallest values, and equal values are "
    "interchangeable inside a SUM, so bottom-half mass = sum(values "
    "< v*) + (k - count(< v*)) * v* where v* is the k-th smallest "
    "value. v* comes from the same two-pass bucket narrowing as "
    "operators/median.py, per type: (1) histogram cents into 4096-"
    "cent buckets (one map-combinable shuffle, output bounded by "
    "types x buckets), (2) running-sum the tiny bucket relation to "
    "find each type's threshold bucket, (3) rescan only that "
    "bucket's rows to locate v* and the exact below-v* count/sum. "
    "The old form's Window.partitionBy(type).orderBy(value) sorted "
    "EVERY raw event into one task per type — billions of rows per "
    "partition at 100 TB; this shape's biggest shuffle is the "
    "bounded bucket histogram. The oracle keeps the CUME_DIST "
    "formulation (driver-validated in round 5).",
)
def e12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.tables import load_table as _lt

    bucket_w = 4096
    ev = _lt(spark, sf_dir, "events")
    c = ev.select("event_type", cents(F.col("value")).alias("cents"))
    b = (
        c.groupBy("event_type", F.expr(f"cents div {bucket_w}").alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("scents"))
        .cache()
    )
    t = b.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.expr("sum(cnt) div 2").alias("k"),
        F.sum("scents").alias("total_cents"),
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.select(
        "event_type",
        "bkt",
        "cnt",
        "scents",
        F.sum("cnt").over(wb).alias("cum_cnt"),
        F.sum("scents").over(wb).alias("cum_s"),
    )
    sel = (
        cum.join(F.broadcast(t.select("event_type", "k")), "event_type")
        .where(F.col("cum_cnt") >= F.col("k"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("bkt"))
        )
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "bkt",
            "k",
            (F.col("cum_cnt") - F.col("cnt")).alias("below_cnt"),
            (F.col("cum_s") - F.col("scents")).alias("below_sum"),
        )
    )
    within = (
        c.join(F.broadcast(sel), ["event_type"])
        .where(F.expr(f"cents div {bucket_w}") == F.col("bkt"))
        .groupBy("event_type", "cents", "k", "below_cnt", "below_sum")
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vcum = within.select(
        "event_type",
        "cents",
        "k",
        "below_cnt",
        "below_sum",
        "vcnt",
        F.sum("vcnt").over(wv).alias("vcum_cnt"),
        # decimal(38,0): cents*vcnt and k*cents multiply a value by a
        # corpus-scaled count — int64-risky at 100x (lint_overflow's
        # class). Integer-exact; bottom_cents casts to double at the
        # end, same value from either integer type.
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("vcnt"))
        .over(wv)
        .alias("vcum_s"),
    )
    vstar = (
        vcum.where(F.col("below_cnt") + F.col("vcum_cnt") >= F.col("k"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("cents"))
        )
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            (
                F.col("below_sum").cast("decimal(38,0)")
                + F.col("vcum_s")
                - F.col("cents").cast("decimal(38,0)") * F.col("vcnt")
                + (
                    F.col("k")
                    - (F.col("below_cnt") + F.col("vcum_cnt") - F.col("vcnt"))
                ).cast("decimal(38,0)")
                * F.col("cents")
            ).alias("bottom_cents"),
        )
    )
    return (
        t.join(F.broadcast(vstar), "event_type")
        .select(
            "event_type",
            "n",
            (F.col("bottom_cents").cast("double") / 100.0).alias("bottom_half_value"),
            (F.col("total_cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "e13_hourly_gap_fill_locf",
    f"""
    WITH hourly AS (
      SELECT event_type,
             DATE_TRUNC('hour', ts) AS h,
             COUNT(*) AS n_events,
             CAST(SUM({sql_cents('value')}) AS BIGINT) AS cents
      FROM events
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans
    ),
    j AS (
      SELECT g.event_type, g.h, hy.n_events, hy.cents,
             COUNT(hy.cents) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS grp
      FROM grid g LEFT JOIN hourly hy
        ON g.event_type = hy.event_type AND g.h = hy.h
    )
    SELECT event_type,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(n_events, 0) AS n_events,
           MAX(cents) OVER (PARTITION BY event_type, grp) AS filled_cents
    FROM j
    ORDER BY event_type, hour
    """,
    doc="Time-series gap fill + LOCF resample: per event type, a dense "
    "hourly grid between that type's first and last hour, missing "
    "hours filled with zero counts and last-observation-carried-"
    "forward value sums (exact integer cents via decimal input "
    "casts). LOCF is expressed as a running COUNT of observed rows "
    "(each fill group starts at an observed hour) + a per-group MAX — "
    "plain aggregate windows, no IGNORE-NULLS navigation functions "
    "(those hash-diverged on the round-5 driver engines). Spark-first "
    "shape: the grid is generated from the PRE-AGGREGATED per-type "
    "span relation (sequence+explode — rows = types x hours, never "
    "events x hours), the fill join and both windows run on the "
    "pre-aggregated hourly relation, so window state is bounded by "
    "grid size, not event count, at any scale.",
)
def e13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("cents"),
    )
    spans = hourly.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("h"),
    )
    wg = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        "n_events",
        "cents",
        F.count("cents").over(wg).alias("grp"),
    )
    return j.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.max("cents").over(Window.partitionBy("event_type", "grp")).alias(
            "filled_cents"
        ),
    ).orderBy("event_type", "hour")


@register(
    "w06_value_window_functions",
    f"""
    WITH m AS (
      SELECT o_orderpriority AS pri,
             STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS mon,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS rev_cents
      FROM orders
      GROUP BY 1, 2
    ),
    r AS (
      SELECT pri, mon, rev_cents,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mon) AS rn,
             RANK() OVER (PARTITION BY pri ORDER BY rev_cents) AS rk,
             COUNT(*) OVER (PARTITION BY pri) AS cnt
      FROM m
    )
    SELECT pri, mon, rev_cents,
           MAX(CASE WHEN rn = 1 THEN rev_cents END)
             OVER (PARTITION BY pri) AS first_rev_cents,
           CASE WHEN rn >= 2
                THEN MAX(CASE WHEN rn = 2 THEN rev_cents END)
                       OVER (PARTITION BY pri)
           END AS second_rev_cents,
           CASE WHEN cnt = 1 THEN 0
                ELSE (rk - 1) * 10000 // (cnt - 1) END AS rev_rank_bp
    FROM r
    ORDER BY pri, mon
    """,
    doc="Value-window family over pre-aggregated monthly revenue per "
    "order priority: first month's revenue, second month's revenue "
    "(visible from the second month on, i.e. NTH_VALUE(2) over a "
    "running frame), and the revenue percent-rank in integer basis "
    "points. Expressed with ROW_NUMBER/RANK + conditional window MAX "
    "instead of NTH_VALUE/PERCENT_RANK — the navigation forms "
    "hash-diverged on the round-5 driver engines; rank arithmetic on "
    "BIGINTs is engine-version-proof. Window state is months x "
    "priorities, never raw orders, so the sort inside each window "
    "partition is tiny at any scale. Exact integer cents end to end "
    "(decimal input casts).",
)
def w06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon"),
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    wp = Window.partitionBy("pri")
    r = m.select(
        "pri",
        "mon",
        "rev_cents",
        F.row_number().over(wp.orderBy("mon")).alias("rn"),
        F.rank().over(wp.orderBy("rev_cents")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    first_rev = F.max(F.when(F.col("rn") == 1, F.col("rev_cents"))).over(wp)
    second_all = F.max(F.when(F.col("rn") == 2, F.col("rev_cents"))).over(wp)
    return r.select(
        "pri",
        "mon",
        "rev_cents",
        first_rev.alias("first_rev_cents"),
        F.when(F.col("rn") >= 2, second_all).alias("second_rev_cents"),
        F.when(F.col("cnt") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr("(rk - 1) * 10000 div (cnt - 1)"))
        .alias("rev_rank_bp"),
    ).orderBy("pri", "mon")


@register(
    "e16_hourly_linear_interp",
    f"""
    WITH hourly AS (
      SELECT event_type,
             DATE_TRUNC('hour', ts) AS h,
             CAST(SUM({sql_cents('value')}) AS BIGINT) AS cents
      FROM events
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans
    ),
    joined AS (
      SELECT g.event_type, g.h,
             CAST(epoch_ms(g.h) // 3600000 AS BIGINT) AS idx,
             hy.cents
      FROM grid g LEFT JOIN hourly hy
        ON g.event_type = hy.event_type AND g.h = hy.h
    ),
    grped AS (
      SELECT event_type, h, idx, cents,
             COUNT(cents) OVER (PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gf,
             COUNT(cents) OVER (PARTITION BY event_type ORDER BY idx DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gb
      FROM joined
    ),
    ctx AS (
      SELECT event_type, h, idx, cents,
             MAX(cents) OVER (PARTITION BY event_type, gf) AS prev_c,
             MAX(CASE WHEN cents IS NOT NULL THEN idx END)
               OVER (PARTITION BY event_type, gf) AS prev_i,
             MAX(cents) OVER (PARTITION BY event_type, gb) AS next_c,
             MAX(CASE WHEN cents IS NOT NULL THEN idx END)
               OVER (PARTITION BY event_type, gb) AS next_i
      FROM grped
    )
    SELECT event_type,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           cents IS NOT NULL AS observed,
           CASE WHEN cents IS NOT NULL THEN cents
                ELSE (prev_c * (next_i - idx) + next_c * (idx - prev_i))
                     // (next_i - prev_i)
           END AS filled_cents
    FROM ctx
    ORDER BY event_type, hour
    """,
    doc="Linear-interpolation resample (e13's LOCF upgraded): missing "
    "hours get the time-weighted average of the surrounding observed "
    "values, computed as (prev*(gap-step) + next*step) div gap in "
    "exact integer cents — values are non-negative so truncating and "
    "flooring division agree and both engines match bit-for-bit. "
    "Neighbor lookup uses the same fill-group trick as e13 (running "
    "COUNT of observed rows, forward and backward) instead of "
    "IGNORE-NULLS navigation, and the hour index is integer "
    "epoch-millis arithmetic — both chosen because the alternatives "
    "hash-diverged on the round-5 driver engines. Same bounded-state "
    "shape as e13: the grid and all windows run on the pre-aggregated "
    "types x hours relation, never raw events. Grid endpoints are "
    "observed hours, so every interior gap has both neighbors (no "
    "divide-by-zero edge).",
)
def e16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(cents(F.col("value"))).alias("cents")
    )
    spans = hourly.groupBy("event_type").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = spans.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))).alias("h"),
    )
    joined = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.expr("CAST(unix_timestamp(h) div 3600 AS BIGINT)").alias("idx"),
        "cents",
    )
    wfwd = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wbwd = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grped = joined.select(
        "event_type",
        "h",
        "idx",
        "cents",
        F.count("cents").over(wfwd).alias("gf"),
        F.count("cents").over(wbwd).alias("gb"),
    )
    obs_idx = F.when(F.col("cents").isNotNull(), F.col("idx"))
    pf = Window.partitionBy("event_type", "gf")
    pb = Window.partitionBy("event_type", "gb")
    ctx = grped.select(
        "event_type",
        "h",
        "idx",
        "cents",
        F.max("cents").over(pf).alias("prev_c"),
        F.max(obs_idx).over(pf).alias("prev_i"),
        F.max("cents").over(pb).alias("next_c"),
        F.max(obs_idx).over(pb).alias("next_i"),
    )
    # decimal(38,0): hourly cent sums x the gap width can clear int64
    # once hourly volume is 100x (lint_overflow's class); the div is
    # integer-exact either way and filled_cents stays BIGINT.
    interp = F.expr(
        "(CAST(prev_c AS DECIMAL(38,0)) * (next_i - idx)"
        " + CAST(next_c AS DECIMAL(38,0)) * (idx - prev_i))"
        " div (next_i - prev_i)"
    )
    return ctx.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("cents").isNotNull().alias("observed"),
        F.when(F.col("cents").isNotNull(), F.col("cents")).otherwise(interp).alias(
            "filled_cents"
        ),
    ).orderBy("event_type", "hour")


@register(
    "w07_mom_revenue_growth",
    f"""
    WITH m AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS mon,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS rev_cents
      FROM orders
      GROUP BY 1
    )
    SELECT mon, rev_cents,
           LAG(rev_cents) OVER (ORDER BY mon) AS prev_cents,
           CASE WHEN LAG(rev_cents) OVER (ORDER BY mon) IS NULL THEN NULL
                WHEN rev_cents >= LAG(rev_cents) OVER (ORDER BY mon)
                THEN (rev_cents - LAG(rev_cents) OVER (ORDER BY mon)) * 10000
                     // LAG(rev_cents) OVER (ORDER BY mon)
                ELSE -((LAG(rev_cents) OVER (ORDER BY mon) - rev_cents) * 10000
                       // LAG(rev_cents) OVER (ORDER BY mon))
           END AS growth_bp
    FROM m
    ORDER BY mon
    """,
    doc="Month-over-month revenue growth in integer basis points "
    "(LAG over the pre-aggregated monthly relation). The numerator "
    "can be negative and Spark's `div` truncates toward zero while "
    "DuckDB's `//` floors — the oracle splits on sign and divides "
    "magnitudes so both engines agree exactly. Window state is one "
    "row per month.",
)
def w07(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon")
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    w = Window.orderBy("mon")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "mon",
        "rev_cents",
        prev.alias("prev_cents"),
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr("(rev_cents - lag(rev_cents) OVER (ORDER BY mon)) * 10000")
                   .cast("long"))
        .alias("__tmp"),
    ).select(
        "mon",
        "rev_cents",
        "prev_cents",
        F.expr("CAST(__tmp div prev_cents AS BIGINT)").alias("growth_bp"),
    ).orderBy("mon")


@register(
    "a07_association_rules",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_ord AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY 1
    ),
    pair AS (
      SELECT a.l_partkey AS ante, b.l_partkey AS cons,
             CAST(COUNT(*) AS BIGINT) AS both_cnt
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    )
    SELECT ante, cons, both_cnt,
           both_cnt * 1000000 // (SELECT n FROM n_ord) AS support_micro,
           both_cnt * 1000000 // ia.cnt AS confidence_micro,
           both_cnt * (SELECT n FROM n_ord) * 1000000 // (ia.cnt * ic.cnt)
             AS lift_micro
    FROM pair
    JOIN item ia ON ia.l_partkey = ante
    JOIN item ic ON ic.l_partkey = cons
    WHERE both_cnt >= 3
    ORDER BY lift_micro DESC, ante, cons
    LIMIT 50
    """,
    doc="Association rules over order baskets (market-basket support / "
    "confidence / lift, all integer micro-units — lift is "
    "both*N*1e6 div (cnt_a*cnt_b), one floor division on identical "
    "integers in both engines). The pair relation is the same "
    "self-join-per-basket shape as g02's co-purchase edges: work "
    "scales with sum of basket-size squared, bounded by the basket "
    "cap, never by catalog size; marginals join back key-only. "
    "both_cnt >= 3 prunes the long noise tail before ranking.",
)
def a07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .cache()
    )
    # Basket count rides the plan as a broadcast 1-row relation — the
    # query stays fully lazy (no driver-side action at construction).
    n_ord = li.agg(F.countDistinct("l_orderkey").alias("n"))
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("ante"), F.col("b.l_partkey").alias("cons"))
        .agg(F.count(F.lit(1)).alias("both_cnt"))
        .where(F.col("both_cnt") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("ia_key"), F.col("cnt").alias("cnt_a"))
    ic = item.select(F.col("l_partkey").alias("ic_key"), F.col("cnt").alias("cnt_c"))
    return (
        pair.join(ia, F.col("ante") == F.col("ia_key"))
        .join(ic, F.col("cons") == F.col("ic_key"))
        .crossJoin(F.broadcast(n_ord))
        .select(
            "ante",
            "cons",
            "both_cnt",
            F.expr("both_cnt * 1000000 div n").alias("support_micro"),
            F.expr("both_cnt * 1000000 div cnt_a").alias("confidence_micro"),
            # decimal(38,0) cross terms: both_cnt*n and cnt_a*cnt_c are
            # count-times-count products (int64-risky at 100x counts —
            # lint_overflow's class); div is integer-exact either way
            F.expr(
                "CAST(both_cnt AS DECIMAL(38,0)) * n * 1000000 "
                "div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_c)"
            ).alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "ante", "cons")
        .limit(50)
    )


@register(
    "e20_rfm_segmentation",
    """
    WITH mx AS (
      SELECT CAST(epoch(DATE_TRUNC('day', MAX(o_orderdate))) // 86400 AS BIGINT)
        AS max_day FROM orders
    ),
    per_cust AS (
      SELECT o_custkey,
             (SELECT max_day FROM mx)
               - CAST(epoch(DATE_TRUNC('day', MAX(o_orderdate))) // 86400 AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary_cents,
             NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m
      FROM per_cust
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) // COUNT(*) AS avg_monetary_cents,
           CAST(MIN(o_custkey) AS BIGINT) AS sample_custkey
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
    doc="RFM customer segmentation: recency (days since last order), "
    "frequency, and monetary value quartiled with NTILE into the "
    "classic 64-cell marketing grid, rolled up to per-segment counts "
    "and exact average spend (integer cents, floor division). "
    "Determinism: every NTILE ordering carries the customer key as "
    "tiebreak, so quartile boundaries are identical across engines "
    "and partitionings. The quartiles are global by nature but are "
    "NOT computed with an unpartitioned window: each metric goes "
    "through operators/ranking.global_ntile — range-repartition + "
    "per-partition local ranks + broadcast offsets — so the sort is "
    "a real distributed sort (the plan has no single-task WindowExec "
    "over the per-customer relation, which is hundreds of millions "
    "of rows at 100 TB). The oracle keeps the NTILE formulation "
    "(driver-validated in round 5).",
)
def e20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(date_trunc('day', o_orderdate)) div 86400 AS BIGINT)")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents(F.col("o_totalprice"))).alias("monetary_cents"),
    )
    mx = per_cust.agg(F.max("last_day").alias("max_day"))
    pc = per_cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        (F.col("max_day") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    r_t = global_ntile(
        pc.select("o_custkey", "recency_days"),
        [F.asc("recency_days"), F.asc("o_custkey")],
        4,
        "r",
    ).select("o_custkey", "r")
    f_t = global_ntile(
        pc.select("o_custkey", "frequency"),
        [F.desc("frequency"), F.asc("o_custkey")],
        4,
        "f",
    ).select("o_custkey", "f")
    m_t = global_ntile(
        pc.select("o_custkey", "monetary_cents"),
        [F.desc("monetary_cents"), F.asc("o_custkey")],
        4,
        "m",
    ).select("o_custkey", "m")
    scored = (
        pc.select("o_custkey", "monetary_cents")
        .join(r_t, "o_custkey")
        .join(f_t, "o_custkey")
        .join(m_t, "o_custkey")
    )
    return (
        scored.groupBy(
            F.col("r").cast("long").alias("r"),
            F.col("f").cast("long").alias("f"),
            F.col("m").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("CAST(sum(monetary_cents) AS BIGINT) div count(*)").alias(
                "avg_monetary_cents"
            ),
            F.min("o_custkey").alias("sample_custkey"),
        )
        .orderBy("r", "f", "m")
    )


@register(
    "w08_yoy_same_month",
    f"""
    WITH m AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mo, cur.rev_cents,
           prev.rev_cents AS prev_year_cents,
           CASE WHEN cur.rev_cents >= prev.rev_cents
                THEN (cur.rev_cents - prev.rev_cents) * 10000 // prev.rev_cents
                ELSE -((prev.rev_cents - cur.rev_cents) * 10000 // prev.rev_cents)
           END AS yoy_bp
    FROM m cur JOIN m prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    ORDER BY cur.yr, cur.mo
    """,
    doc="Year-over-year same-month revenue comparison: the monthly "
    "rollup self-joined on (year-1, month) — seasonality-aware "
    "growth, unlike w07's sequential month-over-month. Growth in "
    "integer basis points with the sign-split division so truncating "
    "(Spark div) and flooring (DuckDB //) agree on declines. The "
    "self-join runs on the months x years relation — dozens of rows "
    "at any data volume.",
)
def w08(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    cur, prev = m.alias("cur"), m.alias("prev")
    j = cur.join(
        prev,
        (F.col("prev.yr") == F.col("cur.yr") - 1) & (F.col("prev.mo") == F.col("cur.mo")),
    )
    return j.select(
        F.col("cur.yr").alias("yr"),
        F.col("cur.mo").alias("mo"),
        F.col("cur.rev_cents").alias("rev_cents"),
        F.col("prev.rev_cents").alias("prev_year_cents"),
        F.expr(
            "CASE WHEN cur.rev_cents >= prev.rev_cents "
            "THEN (cur.rev_cents - prev.rev_cents) * 10000 div prev.rev_cents "
            "ELSE -((prev.rev_cents - cur.rev_cents) * 10000 div prev.rev_cents) END"
        ).alias("yoy_bp"),
    ).orderBy("yr", "mo")


@register(
    "w09_mom_contribution",
    f"""
    WITH m AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS mon,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 12
               + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mix,
             o_orderpriority AS pri,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2, 3
    ),
    d AS (
      SELECT cur.mon, cur.pri,
             cur.rev_cents - prev.rev_cents AS delta_cents
      FROM m cur JOIN m prev
        ON prev.pri = cur.pri AND prev.mix = cur.mix - 1
    ),
    t AS (
      SELECT mon, CAST(SUM(delta_cents) AS BIGINT) AS total_delta,
             CAST(SUM(ABS(delta_cents)) AS BIGINT) AS total_abs
      FROM d GROUP BY mon
    )
    SELECT d.mon, d.pri, d.delta_cents, t.total_delta,
           CASE WHEN t.total_abs = 0 THEN 0
                WHEN d.delta_cents >= 0
                THEN ABS(d.delta_cents) * 10000 // t.total_abs
                ELSE -(ABS(d.delta_cents) * 10000 // t.total_abs)
           END AS contribution_bp
    FROM d JOIN t ON t.mon = d.mon
    ORDER BY d.mon, d.pri
    """,
    doc="Month-over-month contribution decomposition: each order "
    "priority's signed share of the month's total revenue movement, "
    "in basis points of the total absolute change (sign-split "
    "integer division; segment deltas sum exactly to the reported "
    "total because everything is integer cents). The 'what drove the "
    "change' question BI teams ask after w07 flags a swing — "
    "computed on the months x priorities rollup, a bounded relation "
    "regardless of order volume.",
)
def w09(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon"),
        (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate").cast("long")).alias(
            "mix"
        ),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    cur, prev = m.alias("cur"), m.alias("prev")
    d = cur.join(
        prev,
        (F.col("prev.pri") == F.col("cur.pri"))
        & (F.col("prev.mix") == F.col("cur.mix") - 1),
    ).select(
        F.col("cur.mon").alias("mon"),
        F.col("cur.pri").alias("pri"),
        (F.col("cur.rev_cents") - F.col("prev.rev_cents")).alias("delta_cents"),
    )
    t = d.groupBy("mon").agg(
        F.sum("delta_cents").alias("total_delta"),
        F.sum(F.abs("delta_cents")).alias("total_abs"),
    )
    return (
        d.join(t, "mon")
        .select(
            "mon",
            "pri",
            "delta_cents",
            "total_delta",
            F.expr(
                "CASE WHEN total_abs = 0 THEN 0 "
                "WHEN delta_cents >= 0 THEN abs(delta_cents) * 10000 div total_abs "
                "ELSE -(abs(delta_cents) * 10000 div total_abs) END"
            ).alias("contribution_bp"),
        )
        .orderBy("mon", "pri")
    )


@register(
    "w10_lorenz_gini_deciles",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS spend_cents
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT spend_cents,
             CAST(NTILE(10) OVER (ORDER BY spend_cents, o_custkey) AS BIGINT)
               AS decile
      FROM per_cust
    ),
    d AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(spend_cents) AS BIGINT) AS decile_cents
      FROM tiled GROUP BY decile
    ),
    c AS (
      SELECT decile, n_customers, decile_cents,
             CAST(SUM(decile_cents) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cents,
             CAST(SUM(decile_cents) OVER () AS BIGINT) AS total_cents
      FROM d
    )
    SELECT decile, n_customers, decile_cents, cum_cents,
           cum_cents * 10000 // NULLIF(total_cents, 0) AS cum_share_bp,
           CAST((2 * SUM(decile * decile_cents) OVER () * 10
                 - 11 * total_cents * 10) // NULLIF(total_cents, 0) AS BIGINT)
             AS gini_millis
    FROM c
    ORDER BY decile
    """,
    doc="Lorenz curve + Gini coefficient of customer spend, by decile: "
    "the revenue-concentration question behind every 'top-X% of "
    "customers drive Y%' slide. Spend is exact integer cents; deciles "
    "come from operators/ranking.global_ntile (range-partitioned "
    "distributed sort — no single-task window over the per-customer "
    "relation, the e20/a05 pattern); the cumulative shares and the "
    "decile-level Gini (G = 2*sum(i*s_i)/10 - 11/10 in mills, exact "
    "integer arithmetic over the 10-row decile rollup) match DuckDB "
    "bit-for-bit; the i*s_i cross terms ride DECIMAL(38,0) on the "
    "Spark side (INT128 in DuckDB), so there is no sf ceiling.",
)
def w10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("spend_cents")
    )
    tiled = global_ntile(
        per_cust,
        [F.asc("spend_cents"), F.asc("o_custkey")],
        10,
        "decile",
    ).select(F.col("decile").cast("long").alias("decile"), "spend_cents")
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend_cents").alias("decile_cents"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = d.select(
        "decile",
        "n_customers",
        "decile_cents",
        F.sum("decile_cents").over(wc).alias("cum_cents"),
        F.sum("decile_cents").over(wall).alias("total_cents"),
        # decimal(38,0): decile*decile_cents (and the x10000/x10-scaled
        # Gini terms below) multiply corpus-scaled cent sums past int64
        # at 100x (lint_overflow's class). Integer-exact either way;
        # DuckDB rides INT128. Output types unchanged (div -> BIGINT).
        F.sum(F.col("decile").cast("decimal(38,0)") * F.col("decile_cents"))
        .over(wall)
        .alias("weighted"),
    )
    return c.select(
        "decile",
        "n_customers",
        "decile_cents",
        "cum_cents",
        F.expr(
            "CAST(cum_cents AS DECIMAL(38,0)) * 10000"
            " div nullif(total_cents, 0)"
        ).alias("cum_share_bp"),
        F.expr(
            "CAST((2 * weighted * 10"
            "      - 11 * CAST(total_cents AS DECIMAL(38,0)) * 10)"
            " div nullif(total_cents, 0) AS BIGINT)"
        ).alias("gini_millis"),
    ).orderBy("decile")
