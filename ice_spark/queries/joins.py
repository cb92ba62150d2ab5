"""Join-strategy queries: shapes where HOW the join executes is the
point (the result is an ordinary equi-join, pinned by the oracle).

The reference has no query engine (SURVEY.md §2.8); these prove the
engine's scale-path join machinery — Bloom semi-join pruning here,
as-of/range/skew joins under queries/events.py — produces exactly the
declarative join's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.operators.bloomjoin import bloom_filter_join
from ice_spark.queries.helpers import SQL_REV_U, rev_u
from ice_spark.queries.registry import register
from ice_spark.tables import load_table


@register(
    "j01_bloom_semijoin_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM({SQL_REV_U}) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey
          FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate >= DATE '1996-01-01'
            AND o_orderdate < DATE '1996-07-01') o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Bloom-filter semi-join pruning (operators/bloomjoin.py): the "
    "fact side (lineitem) is pre-filtered against a Bloom bitmap of "
    "the selective dimension's keys BEFORE the join shuffle, so at "
    "scale the shuffle carries ~selectivity of the fact table instead "
    "of all of it; the real join then removes Bloom false positives, "
    "making the result exactly the plain join (the oracle). The "
    "bitmap build is a map-side-combined bit_or aggregation; only the "
    "bitmap words (num_bits/64 longs) reach the driver.",
)
def j01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    joined = bloom_filter_join(li, keys, "l_orderkey", num_bits=1 << 17)
    return joined.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(rev_u()).cast("double") / 1e6).alias("revenue"),
    )


@register(
    "j02_salted_hot_key_join",
    """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
      FROM events GROUP BY user_id
    )
    SELECT e.user_id % 10 AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(date_diff('day', f.d0, CAST(e.ts AS DATE))) AS BIGINT)
             AS sum_days_since_first
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Skew-mitigated fact-to-profile join (operators/skew."
    "salted_join_hot_keys): keys holding >1% of fact rows take a "
    "salted route — the fact side gets a deterministic salt in "
    "[0,16), the profile side is replicated per salt, so one hot user "
    "(a bot, a test account) spreads over 16 shuffle partitions "
    "instead of serializing one executor at 100 TB — while the long "
    "tail joins normally and the union is EXACTLY the plain join the "
    "oracle declares. Day-offset sums are exact integers (datediff), "
    "so the equivalence is hash-checked, not eyeballed.",
)
def j02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.skew import salted_join_hot_keys

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    joined = salted_join_hot_keys(ev, first_day, "user_id", n_salts=16, threshold_ratio=0.01)
    return (
        joined.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.datediff("d", "d0")).cast("long").alias("sum_days_since_first"),
        )
        .orderBy("user_bucket")
    )
