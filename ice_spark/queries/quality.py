"""Data-quality constraint suite (deequ/Great-Expectations shape).

A 100 TB ingest pipeline needs a verification pass that answers
"is this batch safe to train on / join against" without a human
eyeballing it. This is the batch audit: declarative constraints —
completeness, uniqueness, referential integrity, value ranges, set
membership — evaluated in as few passes as the constraint classes
allow, emitted as one row per constraint with the violation count
and a pass/fail verdict.

Scale design:
- All single-table constraints for a table are computed in ONE
  conditional-aggregate scan (a single 1-row agg per table, unpivoted
  with `stack`) — adding a constraint adds a column to the agg, not a
  scan. This is the deequ trick: N checks, one pass.
- Uniqueness rides the same scan as a COUNT DISTINCT (two-stage
  partial agg under the hood, no row explosion).
- Referential integrity is a LEFT ANTI join per FK edge — key-only
  projection on both sides, AQE broadcasts the dim when it fits, and
  the violation count is all that leaves the join.
- The verdict table itself is O(#constraints) rows — KBs at any data
  scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.registry import register
from ice_spark.tables import load_table

_ORACLE = """
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS qty_viol,
         CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT) AS disc_viol,
         CAST(COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')
                               OR l_returnflag IS NULL) AS BIGINT) AS rf_viol,
         CAST(COUNT(*) FILTER (WHERE l_extendedprice IS NULL
                               OR l_extendedprice <= 0) AS BIGINT) AS price_viol
  FROM lineitem
),
ord AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_viol,
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_cust_viol,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')
                               OR o_orderstatus IS NULL) AS BIGINT) AS status_viol,
         CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS null_date_viol
  FROM orders
),
ri_li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS viol
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
),
ri_ord AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS viol
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT * FROM (
  SELECT 'lineitem.l_quantity.range[1,50]' AS check_name, qty_viol AS violations,
         total, qty_viol = 0 AS passed FROM li
  UNION ALL
  SELECT 'lineitem.l_discount.range[0,0.1]', disc_viol, total, disc_viol = 0 FROM li
  UNION ALL
  SELECT 'lineitem.l_returnflag.in[A,N,R]', rf_viol, total, rf_viol = 0 FROM li
  UNION ALL
  SELECT 'lineitem.l_extendedprice.positive', price_viol, total, price_viol = 0 FROM li
  UNION ALL
  SELECT 'orders.o_orderkey.unique', dup_viol, total, dup_viol = 0 FROM ord
  UNION ALL
  SELECT 'orders.o_custkey.complete', null_cust_viol, total, null_cust_viol = 0 FROM ord
  UNION ALL
  SELECT 'orders.o_orderstatus.in[F,O,P]', status_viol, total, status_viol = 0 FROM ord
  UNION ALL
  SELECT 'orders.o_orderdate.complete', null_date_viol, total, null_date_viol = 0 FROM ord
  UNION ALL
  SELECT 'lineitem.l_orderkey.fk(orders)', r.viol, li.total, r.viol = 0
  FROM ri_li r, li
  UNION ALL
  SELECT 'orders.o_custkey.fk(customer)', r.viol, ord.total, r.viol = 0
  FROM ri_ord r, ord
)
ORDER BY check_name
"""


def _viol(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


@register(
    "dq01_constraint_suite",
    _ORACLE,
    doc="Declarative data-quality audit over orders/lineitem/customer: "
    "value ranges, set membership, completeness, key uniqueness, and "
    "FK referential integrity, one verdict row per constraint. All "
    "per-table checks share a single conditional-aggregate scan "
    "(deequ-style: N checks, one pass); RI checks are key-projected "
    "LEFT ANTI joins. Output is O(#constraints) rows at any scale.",
)
def dq01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    li_m = li.agg(
        F.count(F.lit(1)).alias("total"),
        _viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("qty_viol"),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("disc_viol"),
        _viol(~F.col("l_returnflag").isin("A", "N", "R") | F.col("l_returnflag").isNull()).alias(
            "rf_viol"
        ),
        _viol(F.col("l_extendedprice").isNull() | (F.col("l_extendedprice") <= 0)).alias(
            "price_viol"
        ),
    )
    li_m = li_m.cache()  # 1-row metric tuples, each consumed twice
    ord_m = orders.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_viol"),
        _viol(F.col("o_custkey").isNull()).alias("null_cust_viol"),
        _viol(
            ~F.col("o_orderstatus").isin("F", "O", "P") | F.col("o_orderstatus").isNull()
        ).alias("status_viol"),
        _viol(F.col("o_orderdate").isNull()).alias("null_date_viol"),
    ).cache()
    ri_li = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("viol"))
    )
    ri_ord = (
        orders.select("o_custkey")
        .join(customer.select("c_custkey"), orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("viol"))
    )

    li_rows = li_m.selectExpr(
        "stack(4, "
        "'lineitem.l_quantity.range[1,50]', qty_viol, "
        "'lineitem.l_discount.range[0,0.1]', disc_viol, "
        "'lineitem.l_returnflag.in[A,N,R]', rf_viol, "
        "'lineitem.l_extendedprice.positive', price_viol"
        ") AS (check_name, violations)",
        "total",
    )
    ord_rows = ord_m.selectExpr(
        "stack(4, "
        "'orders.o_orderkey.unique', dup_viol, "
        "'orders.o_custkey.complete', null_cust_viol, "
        "'orders.o_orderstatus.in[F,O,P]', status_viol, "
        "'orders.o_orderdate.complete', null_date_viol"
        ") AS (check_name, violations)",
        "total",
    )
    ri_li_rows = ri_li.crossJoin(li_m.select("total")).select(
        F.lit("lineitem.l_orderkey.fk(orders)").alias("check_name"),
        F.col("viol").alias("violations"),
        "total",
    )
    ri_ord_rows = ri_ord.crossJoin(ord_m.select("total")).select(
        F.lit("orders.o_custkey.fk(customer)").alias("check_name"),
        F.col("viol").alias("violations"),
        "total",
    )
    out = li_rows.unionAll(ord_rows).unionAll(ri_li_rows).unionAll(ri_ord_rows)
    return out.select(
        "check_name", "violations", "total", (F.col("violations") == 0).alias("passed")
    ).orderBy("check_name")


# Benford expectations in basis points, precomputed once in Python and
# embedded as literals in BOTH engines' queries — computing log10 at
# query time would trust two libm implementations to round identically.
_BENFORD_BP = {d: round(math.log10(1 + 1 / d) * 10000) for d in range(1, 10)}
_BENFORD_VALUES = ", ".join(f"({d}, {bp})" for d, bp in _BENFORD_BP.items())


@register(
    "dq02_benford_digit_audit",
    f"""
    WITH expected(digit, benford_bp) AS (VALUES {_BENFORD_VALUES}),
    obs AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_d
      FROM orders
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM obs)
    SELECT e.digit,
           COALESCE(o.n_d, 0) AS n_d,
           COALESCE(o.n_d, 0) * 10000 // (SELECT n FROM tot) AS share_bp,
           CAST(e.benford_bp AS BIGINT) AS benford_bp,
           ABS(COALESCE(o.n_d, 0) * 10000 // (SELECT n FROM tot)
               - e.benford_bp) AS dev_bp
    FROM expected e LEFT JOIN obs o ON o.digit = e.digit
    ORDER BY e.digit
    """,
    doc="Benford's-law audit on order totals: observed leading-digit "
    "shares vs the Benford expectation, both in integer basis points "
    "(the expectation table is precomputed in Python and embedded as "
    "literals in both engines — never trust two libm log10s to round "
    "alike). The classic screen for fabricated or truncated numeric "
    "columns in an incoming batch; one map-side digit extraction via "
    "integer-string slicing plus a 9-row aggregate. Large dev_bp on "
    "synthetic TPC-H prices is EXPECTED (uniform-ish generation) — "
    "the query reports, thresholds are policy.",
)
def dq02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.select(
            F.substring(F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    ).cache()
    tot = obs.agg(F.sum("n_d").cast("long").alias("n"))
    expected = spark.createDataFrame(
        [(d, bp) for d, bp in _BENFORD_BP.items()], ["digit", "benford_bp"]
    )
    return (
        expected.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_d"), F.lit(0)).alias("n_d"),
            F.expr("coalesce(n_d, 0) * 10000 div n").alias("share_bp"),
            F.col("benford_bp").cast("long").alias("benford_bp"),
            F.expr("abs(coalesce(n_d, 0) * 10000 div n - benford_bp)").alias("dev_bp"),
        )
        .orderBy("digit")
    )


@register(
    "dq03_composition_drift",
    """
    WITH daily AS (
      SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n_dt
      FROM events GROUP BY 1, 2
    ),
    day_tot AS (
      SELECT day, CAST(SUM(n_dt) AS BIGINT) AS n_day FROM daily GROUP BY day
    ),
    overall AS (
      SELECT event_type, CAST(SUM(n_dt) AS BIGINT) AS n_type FROM daily GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(n_dt) AS BIGINT) AS n_all FROM daily),
    dev AS (
      SELECT d.day,
             SUM(ABS(d.n_dt * (SELECT n_all FROM n) - o.n_type * t.n_day))
               AS l1_num,
             MAX(t.n_day * (SELECT n_all FROM n)) AS denom,
             MAX(t.n_day) AS n_day
      FROM daily d
      JOIN day_tot t ON t.day = d.day
      JOIN overall o ON o.event_type = d.event_type
      GROUP BY d.day
    )
    SELECT day, n_day,
           CAST(l1_num * 10000 // denom AS BIGINT) AS l1_drift_bp
    FROM dev
    ORDER BY l1_drift_bp DESC, day
    LIMIT 10
    """,
    doc="Data-drift monitor: per-day event-type composition compared "
    "to the corpus-wide mix by L1 distance, computed entirely in "
    "cross-multiplied integers (|n_dt*N - n_type*n_day| summed, "
    "scaled to basis points by one floor division) — no per-share "
    "rounding to accumulate error. The pipeline-monitoring question "
    "('did today's batch change shape?') as two bounded keyed "
    "aggregations over the daily rollup; top-10 drifting days "
    "surface for inspection. The Spark side stages every "
    "count-times-count product through DECIMAL(38,0) (daily volume "
    "x total volume clears int64 at 100x counts — lint_overflow's "
    "class); DuckDB's side rides INT128. Integer-exact either way.",
)
def dq03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_dt")).cache()
    day_tot = daily.groupBy("day").agg(F.sum("n_dt").cast("long").alias("n_day"))
    overall = daily.groupBy("event_type").agg(F.sum("n_dt").cast("long").alias("n_type"))
    n_all = daily.agg(F.sum("n_dt").cast("long").alias("n_all"))
    dev = (
        daily.join(day_tot, "day")
        .join(F.broadcast(overall), "event_type")
        .crossJoin(F.broadcast(n_all))
        .groupBy("day")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_dt").cast("decimal(38,0)") * F.col("n_all")
                    - F.col("n_type").cast("decimal(38,0)") * F.col("n_day")
                )
            ).alias("l1_num"),
            F.max(F.col("n_day").cast("decimal(38,0)") * F.col("n_all")).alias(
                "denom"
            ),
            F.max("n_day").alias("n_day"),
        )
    )
    return (
        dev.select(
            "day",
            "n_day",
            F.expr("CAST(l1_num * 10000 div denom AS BIGINT)").alias("l1_drift_bp"),
        )
        .orderBy(F.desc("l1_drift_bp"), "day")
        .limit(10)
    )
