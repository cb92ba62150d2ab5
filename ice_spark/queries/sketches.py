"""Bounded-memory sketch operators: KMV distinct, count-min, profiling.

At 100 TB the questions these answer — "how many distinct users per
event type?", "which keys are heavy hitters?", "what does this table
look like column by column?" — cannot be answered with unbounded
hash tables per group. Each query here keeps per-group state bounded
by a constant (k hashes, d*w counters, one stats tuple per column)
regardless of input cardinality, which is exactly why engines like
the reference expose sketch-backed aggregates.

Determinism: all sketches use the portable modular hash
``h(key) = ((key % P) * A + B) % P`` with P = 2^31 - 1 and LARGE
multipliers A (~0.5-0.85 * 2^31, classic LCG constants). A must be
comparable to P: with a small A, consecutive integer keys (exactly
what synthetic user_id/custkey columns are) map to an arithmetic
progression that never wraps mod P, so the k smallest hashes all come
from the smallest keys and KMV over-estimates by orders of magnitude.
A large A makes successive keys wrap every ~1.3 steps — a Weyl-spread,
near-uniform sequence. Products stay below 2^62, so both Spark
(wrapping) and DuckDB (overflow-checked) evaluate the hash identically
in 64-bit integer arithmetic. Every output column is integer or
string — no floats anywhere — so the driver's value-hash comparison is
format-stable across engines.

Scale notes per query are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ice_spark.queries.registry import register
from ice_spark.tables import load_table

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime; MINSTD modulus)
KMV_K = 64

# (row_index, multiplier, offset) for the count-min rows. Multipliers
# are classic large LCG constants (glibc, MT-seed, Borland) — each is
# invertible mod the prime P, so each row permutes [0, P)
# independently.
CM_ROWS = [(0, 1686629717, 11), (1, 1103515245, 23), (2, 1566083941, 37), (3, 1812433253, 53)]
CM_WIDTH = 512
CM_TOPK = 10


def _hash_col(key, a: int, b: int):
    return ((key % P) * a + b) % P


def _hash_sql(key_sql: str, a: int, b: int) -> str:
    return f"((({key_sql}) % {P}) * {a} + {b}) % {P}"


@register(
    "k01_kmv_distinct_users",
    f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             {_hash_sql('user_id', 1686629717, 11)} AS h
      FROM events
    ), ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hv
    ), sk AS (
      SELECT event_type,
             COUNT(*) AS n_kept,
             MAX(h) AS kth
      FROM ranked WHERE rn <= {KMV_K}
      GROUP BY event_type
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT sk.event_type,
           CASE WHEN n_kept < {KMV_K} THEN n_kept
                ELSE {(KMV_K - 1) * P} // kth END AS kmv_estimate,
           exact_distinct,
           ABS(CASE WHEN n_kept < {KMV_K} THEN n_kept
                    ELSE {(KMV_K - 1) * P} // kth END - exact_distinct)
             * 10000 // exact_distinct AS err_bp
    FROM sk JOIN exact ON sk.event_type = exact.event_type
    ORDER BY sk.event_type
    """,
    doc="KMV (k-minimum-values) distinct-count sketch per event type, "
    "k=64, audited against the exact count. At 100 TB the sketch state "
    "is 64 longs per group (mergeable by keeping the k smallest of the "
    "union), vs an unbounded hash set for COUNT(DISTINCT); the window "
    "rank-filter compiles to Spark's WindowGroupLimit so each partition "
    "ships at most k rows per group to the shuffle.",
)
def k01(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hv = (
        events.select(
            "event_type", _hash_col(F.col("user_id"), 1686629717, 11).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth"))
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    # `div` (exact integer division) on both sides — floats would risk
    # one-ulp disagreement with DuckDB's `//` at exactly-divisible
    # boundaries.
    est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"CAST({(KMV_K - 1) * P} AS BIGINT) div kth")
    )
    return (
        sk.join(exact, "event_type")
        .withColumn("kmv_estimate", est.cast("long"))
        .select(
            "event_type",
            "kmv_estimate",
            "exact_distinct",
            F.expr("(abs(kmv_estimate - exact_distinct) * 10000) div exact_distinct")
            .cast("long")
            .alias("err_bp"),
        )
        .orderBy("event_type")
    )


_CM_VALUES = ", ".join(f"({i}, {a}, {b})" for i, a, b in CM_ROWS)


@register(
    "k02_countmin_heavy_hitters",
    f"""
    WITH params(row_i, a, b) AS (VALUES {_CM_VALUES}),
    cells AS (
      SELECT p.row_i,
             ((o.o_custkey % {P}) * p.a + p.b) % {P} % {CM_WIDTH} AS cell,
             COUNT(*) AS cnt
      FROM orders o CROSS JOIN params p
      GROUP BY p.row_i, cell
    ), exact AS (
      SELECT o_custkey, COUNT(*) AS exact_cnt
      FROM orders GROUP BY o_custkey
      ORDER BY exact_cnt DESC, o_custkey LIMIT {CM_TOPK}
    ), est AS (
      SELECT e.o_custkey, e.exact_cnt, MIN(c.cnt) AS cms_estimate
      FROM exact e CROSS JOIN params p
      JOIN cells c
        ON c.row_i = p.row_i
       AND c.cell = ((e.o_custkey % {P}) * p.a + p.b) % {P} % {CM_WIDTH}
      GROUP BY e.o_custkey, e.exact_cnt
    )
    SELECT o_custkey, exact_cnt, cms_estimate,
           cms_estimate - exact_cnt AS overcount
    FROM est ORDER BY exact_cnt DESC, o_custkey
    """,
    doc="Count-min sketch (d=4, w=512) over the order→customer stream; "
    "the 10 heaviest customers' exact counts audited against the sketch "
    "estimate (CMS never undercounts). The sketch build is a map-side- "
    "combinable groupBy over at most d*w = 2048 cells — constant memory "
    "and a 2048-row shuffle no matter how many distinct keys exist, "
    "which is the whole point at 100 TB. The probe side joins a 10-row "
    "candidate set against the 2048-row sketch: broadcast territory.",
)
def k02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, a, b in CM_ROWS
        ]
    )
    key_mod = F.col("o_custkey") % P
    cells = (
        orders.select("o_custkey", F.explode(params).alias("p"))
        .select(
            F.col("p.row_i").alias("row_i"),
            ((key_mod * F.col("p.a") + F.col("p.b")) % P % CM_WIDTH).alias("cell"),
        )
        .groupBy("row_i", "cell")
        .agg(F.count("*").alias("cnt"))
    )
    exact = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "o_custkey")
        .limit(CM_TOPK)
    )
    probe = exact.select(
        "o_custkey", "exact_cnt", F.explode(params).alias("p")
    ).select(
        "o_custkey",
        "exact_cnt",
        F.col("p.row_i").alias("row_i"),
        ((F.col("o_custkey") % P * F.col("p.a") + F.col("p.b")) % P % CM_WIDTH).alias(
            "cell"
        ),
    )
    est = (
        probe.join(F.broadcast(cells), ["row_i", "cell"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "o_custkey",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.desc("exact_cnt"), "o_custkey")


@register(
    "k03_column_profile",
    """
    SELECT * FROM (
      SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_orderkey) AS n_nulls,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
      FROM orders
      UNION ALL
      SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
             COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
             COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))),
             CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
             COUNT(DISTINCT o_orderdate),
             CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
             CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             MIN(o_orderpriority), MAX(o_orderpriority)
      FROM orders
    ) ORDER BY column_name
    """,
    doc="Single-pass table profiler for the orders table: one row per "
    "column with row/null/distinct counts and min/max rendered as "
    "strings (numeric columns via DECIMAL(18,2) so both engines format "
    "identically). The Spark plan is ONE aggregate over the table — "
    "multi-column distinct counts share a single Expand-based pass — "
    "then a 6-row unpivot; at 100 TB that is one scan, not one scan "
    "per column, which is what a naive per-column profiler costs.",
)
def k03(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    date_d = F.col("o_orderdate").cast("date")
    agg = orders.agg(
        F.count("*").alias("n_rows"),
        # per-column: nulls, distinct, min/max (string-rendered)
        F.count("o_orderkey").alias("nn_orderkey"),
        F.countDistinct("o_orderkey").alias("nd_orderkey"),
        F.min("o_orderkey").cast("string").alias("mn_orderkey"),
        F.max("o_orderkey").cast("string").alias("mx_orderkey"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("mn_custkey"),
        F.max("o_custkey").cast("string").alias("mx_custkey"),
        F.count("o_orderstatus").alias("nn_orderstatus"),
        F.countDistinct("o_orderstatus").alias("nd_orderstatus"),
        F.min("o_orderstatus").alias("mn_orderstatus"),
        F.max("o_orderstatus").alias("mx_orderstatus"),
        F.count("o_totalprice").alias("nn_totalprice"),
        F.countDistinct(price_dec).alias("nd_totalprice"),
        F.min(price_dec).cast("string").alias("mn_totalprice"),
        F.max(price_dec).cast("string").alias("mx_totalprice"),
        F.count("o_orderdate").alias("nn_orderdate"),
        F.countDistinct("o_orderdate").alias("nd_orderdate"),
        F.min(date_d).cast("string").alias("mn_orderdate"),
        F.max(date_d).cast("string").alias("mx_orderdate"),
        F.count("o_orderpriority").alias("nn_orderpriority"),
        F.countDistinct("o_orderpriority").alias("nd_orderpriority"),
        F.min("o_orderpriority").alias("mn_orderpriority"),
        F.max("o_orderpriority").alias("mx_orderpriority"),
    )
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
        "o_totalprice",
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c[2:]}")).alias("n_nulls"),
                F.col(f"nd_{c[2:]}").alias("n_distinct"),
                F.col(f"mn_{c[2:]}").alias("min_value"),
                F.col(f"mx_{c[2:]}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("column_name")
    )


@register(
    "k04_kmv_audience_overlap",
    f"""
    WITH hv AS (
      SELECT DISTINCT event_type, ((user_id % {P}) * 1686629717 + 11) % {P} AS h
      FROM events
    ), ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hv
    ), sk AS (
      SELECT event_type, h FROM ranked WHERE rn <= {KMV_K}
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type
    ), contrib AS (
      SELECT p.ta, p.tb, s.h,
             CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END AS in_a,
             CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END AS in_b
      FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
    ), mh AS (
      SELECT ta, tb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
      FROM contrib GROUP BY ta, tb, h
    ), mr AS (
      SELECT ta, tb, in_a, in_b,
             ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
      FROM mh
    ), sketch_j AS (
      SELECT ta, tb, COUNT(*) AS kk,
             SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS matches
      FROM mr WHERE rn <= {KMV_K} GROUP BY ta, tb
    ), du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), cnt AS (
      SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS ni
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    ), exact AS (
      SELECT i.ta, i.tb, ni, ca.n + cb.n - ni AS nu
      FROM inter i
      JOIN cnt ca ON ca.event_type = i.ta
      JOIN cnt cb ON cb.event_type = i.tb
    )
    SELECT s.ta AS type_a, s.tb AS type_b,
           CAST((matches * 10000) // kk AS BIGINT) AS kmv_jaccard_bp,
           (ni * 10000) // nu AS exact_jaccard_bp,
           CAST(ABS((matches * 10000) // kk - (ni * 10000) // nu) AS BIGINT) AS err_bp
    FROM sketch_j s JOIN exact e ON s.ta = e.ta AND s.tb = e.tb
    ORDER BY type_a, type_b
    """,
    doc="Audience-overlap (Jaccard) between every pair of event types, "
    "estimated from merged KMV sketches and audited against the exact "
    "pairwise overlap. The sketch path is the 100 TB product: per-type "
    "state is 64 longs, pairs are compared by merging 64-hash sketches "
    "(KBs moved, no pairwise distinct-user join); the exact audit side "
    "IS the quadratic cost the sketch avoids — co-partitioned on "
    "user_id so even the audit is a single-key-shuffle join, never a "
    "cross product.",
)
def k04(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # One distinct over (type, user) feeds everything: the KMV sketch,
    # the per-type counts, and both sides of the exact-audit join.
    # Identical subtrees let Spark reuse the shuffle (ReusedExchange),
    # so events is scanned and deduped once, not four times.
    du = events.select("event_type", "user_id").distinct()
    hv = (
        du.select("event_type", _hash_col(F.col("user_id"), 1686629717, 11).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    cnt = du.groupBy("event_type").agg(F.count("*").alias("n"))
    types = cnt.select("event_type")
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(
            types.select(F.col("event_type").alias("tb")),
            F.col("ta") < F.col("tb"),
        )
    )
    # Two hash joins + union instead of an IN-disjunction join (which
    # Spark would plan as a nested loop): sketches are tiny (k rows per
    # type) so both joins broadcast.
    side_a = pairs.join(F.broadcast(sk), F.col("event_type") == F.col("ta")).select(
        "ta", "tb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = pairs.join(F.broadcast(sk), F.col("event_type") == F.col("tb")).select(
        "ta", "tb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    mh = (
        side_a.unionByName(side_b)
        .groupBy("ta", "tb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("ta", "tb").orderBy("h")
    sketch_j = (
        mh.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= KMV_K)
        .groupBy("ta", "tb")
        .agg(
            F.count("*").alias("kk"),
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            ).alias("matches"),
        )
    )
    a = du.select(F.col("event_type").alias("ta"), "user_id")
    b = du.select(F.col("event_type").alias("tb"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("ni"))
    )
    exact = (
        inter.join(
            F.broadcast(cnt.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))),
            "ta",
        )
        .join(
            F.broadcast(cnt.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))),
            "tb",
        )
        .select("ta", "tb", "ni", (F.col("na") + F.col("nb") - F.col("ni")).alias("nu"))
    )
    return (
        sketch_j.join(exact, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.expr("(matches * 10000) div kk").alias("kmv_jaccard_bp"),
            F.expr("(ni * 10000) div nu").alias("exact_jaccard_bp"),
            F.expr(
                "abs((matches * 10000) div kk - (ni * 10000) div nu)"
            ).alias("err_bp"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "k05_kmv_mergeable_rollup",
    f"""
    WITH hv AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, event_type,
             ((user_id % {P}) * 1686629717 + 11) % {P} AS h
      FROM events
    ), daily AS (
      SELECT day, event_type, h,
             ROW_NUMBER() OVER (PARTITION BY day, event_type ORDER BY h) AS rn
      FROM hv
    ), daily_sk AS (
      SELECT day, event_type, h FROM daily WHERE rn <= {KMV_K}
    ), merged AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM (SELECT DISTINCT event_type, h FROM daily_sk)
    ), merged_sk AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth
      FROM merged WHERE rn <= {KMV_K} GROUP BY event_type
    ), direct AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM (SELECT DISTINCT event_type, h FROM hv)
    ), direct_sk AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth
      FROM direct WHERE rn <= {KMV_K} GROUP BY event_type
    ), days AS (
      SELECT event_type, COUNT(DISTINCT day) AS n_days FROM hv GROUP BY event_type
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT m.event_type, d2.n_days,
           CASE WHEN m.n_kept < {KMV_K} THEN m.n_kept
                ELSE {(KMV_K - 1) * P} // m.kth END AS merged_estimate,
           CASE WHEN d.n_kept < {KMV_K} THEN d.n_kept
                ELSE {(KMV_K - 1) * P} // d.kth END AS direct_estimate,
           CASE WHEN m.kth = d.kth AND m.n_kept = d.n_kept
                THEN 1 ELSE 0 END AS merge_lossless,
           e.exact_distinct
    FROM merged_sk m
    JOIN direct_sk d ON d.event_type = m.event_type
    JOIN days d2 ON d2.event_type = m.event_type
    JOIN exact e ON e.event_type = m.event_type
    ORDER BY m.event_type
    """,
    doc="Two-level KMV rollup: per-day sketches (bounded k-longs per "
    "(day, type) cell) merged into a monthly distinct-count estimate, "
    "proven IDENTICAL to the estimate computed directly from raw data "
    "(merge_lossless = 1): every global k-minimum hash is a k-minimum "
    "of its own day, so merging partials loses nothing. This algebra is "
    "what makes 100 TB rollups cheap — daily jobs persist 64 longs per "
    "cell, and any time-range distinct count re-aggregates sketches "
    "(KBs) instead of rescanning raw events.",
)
def k05(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hv = events.select(
        F.to_date("ts").alias("day"),
        "event_type",
        _hash_col(F.col("user_id"), 1686629717, 11).alias("h"),
    ).distinct()

    def kmv(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w = Window.partitionBy(*part_cols).orderBy("h")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= KMV_K)
            .groupBy(*part_cols)
            .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth"))
        )

    daily_w = Window.partitionBy("day", "event_type").orderBy("h")
    daily_sk = (
        hv.withColumn("rn", F.row_number().over(daily_w))
        .where(F.col("rn") <= KMV_K)
        .select("day", "event_type", "h")
    )
    merged_sk = kmv(daily_sk.select("event_type", "h").distinct(), ["event_type"])
    direct_sk = kmv(hv.select("event_type", "h").distinct(), ["event_type"])
    days = hv.groupBy("event_type").agg(F.countDistinct("day").alias("n_days"))
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )

    def est(prefix: str) -> F.Column:
        return F.when(F.col(f"{prefix}_n_kept") < KMV_K, F.col(f"{prefix}_n_kept")).otherwise(
            F.expr(f"CAST({(KMV_K - 1) * P} AS BIGINT) div {prefix}_kth")
        )

    m = merged_sk.select(
        "event_type",
        F.col("n_kept").alias("m_n_kept"),
        F.col("kth").alias("m_kth"),
    )
    d = direct_sk.select(
        "event_type",
        F.col("n_kept").alias("d_n_kept"),
        F.col("kth").alias("d_kth"),
    )
    return (
        m.join(d, "event_type")
        .join(days, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            est("m").cast("long").alias("merged_estimate"),
            est("d").cast("long").alias("direct_estimate"),
            F.when(
                (F.col("m_kth") == F.col("d_kth"))
                & (F.col("m_n_kept") == F.col("d_n_kept")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("merge_lossless"),
            "exact_distinct",
        )
        .orderBy("event_type")
    )


HIST_WIDTH_CENTS = 500_000  # $5,000 buckets over o_totalprice


@register(
    "k06_histogram_median",
    f"""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ), n AS (
      SELECT COUNT(*) AS n_rows FROM c
    ), buckets AS (
      SELECT cents // {HIST_WIDTH_CENTS} AS b, COUNT(*) AS cnt
      FROM c GROUP BY b
    ), cum AS (
      SELECT b, cnt,
             SUM(cnt) OVER (ORDER BY b) AS cum,
             SUM(cnt) OVER (ORDER BY b) - cnt AS cum_before
      FROM buckets
    ), med_bucket AS (
      SELECT cum.*, n.n_rows FROM cum, n
      WHERE cum >= (n.n_rows + 1) // 2
      ORDER BY b LIMIT 1
    ), est AS (
      SELECT n_rows,
             CAST(b * {HIST_WIDTH_CENTS}
               + ((n_rows + 1) // 2 - cum_before) * {HIST_WIDTH_CENTS} // cnt
               AS BIGINT) AS est_median_cents
      FROM med_bucket
    ), exact AS (
      SELECT cents AS exact_median_cents FROM (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c
      ) WHERE rn = (SELECT (n_rows + 1) // 2 FROM n)
    )
    SELECT est.n_rows, est.est_median_cents, exact.exact_median_cents,
           CAST(ABS(est.est_median_cents - exact.exact_median_cents) * 10000
             // exact.exact_median_cents AS BIGINT) AS err_bp
    FROM est, exact
    """,
    doc="Median of order value from a fixed-width histogram sketch "
    "($5,000 buckets, linear interpolation inside the median bucket), "
    "audited against the exact lower-median. The histogram is bounded "
    "state (one counter per occupied bucket, map-side combinable) and "
    "mergeable across partitions/days; the exact side requires a full "
    "sort (the window rank over all rows) — precisely the cost the "
    "sketch avoids at 100 TB. All arithmetic is integer cents so both "
    "engines agree bit-for-bit.",
)
def k06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    n = c.agg(F.count("*").alias("n_rows"))
    buckets = (
        c.select(F.expr(f"cents div {HIST_WIDTH_CENTS}").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    med_bucket = (
        cum.crossJoin(F.broadcast(n))
        .where(F.col("cum") >= F.expr("(n_rows + 1) div 2"))
        .orderBy("b")
        .limit(1)
    )
    est = med_bucket.select(
        "n_rows",
        F.expr(
            f"b * {HIST_WIDTH_CENTS} + "
            f"((n_rows + 1) div 2 - cum_before) * {HIST_WIDTH_CENTS} div cnt"
        ).alias("est_median_cents"),
    )
    wr = Window.orderBy("cents")
    ranked = c.withColumn("rn", F.row_number().over(wr))
    exact = (
        ranked.crossJoin(F.broadcast(n))
        .where(F.col("rn") == F.expr("(n_rows + 1) div 2"))
        .select(F.col("cents").alias("exact_median_cents"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        "est_median_cents",
        "exact_median_cents",
        F.expr(
            "abs(est_median_cents - exact_median_cents) * 10000 "
            "div exact_median_cents"
        ).alias("err_bp"),
    )


# ---------------------------------------------------------------- k07
HLL_M = 64  # registers (2^6)
HLL_W = 25  # value bit-width: h < 2^31, h div 64 < 2^25
HLL_A, HLL_B = 1812433253, 101  # fresh large-multiplier pair
# HLL needs more than the affine hash: its statistic is the leading-
# zero count of the HIGH bits, and an affine-mod-P map of structured
# keys (sequential ids) is equidistributed, not independent — maxima
# per register bias high (measured 1.7x at n=500). Two xor-shift +
# multiply rounds give avalanche while every product stays < 2^62
# (Spark wraps, DuckDB overflow-checks — both must stay exact).
HLL_A2, HLL_B2 = 1103515245, 12345
HLL_A3 = 1566083941


def _hll_mix_col(df, key_col: str):
    """Append portable avalanche hash column `h` of an integral key."""
    return (
        df.withColumn("__h1", _hash_col(F.col(key_col).cast("long"), HLL_A, HLL_B))
        .withColumn("__h2", F.expr("__h1 ^ shiftright(__h1, 15)"))
        .withColumn("__h3", (F.col("__h2") * HLL_A2 + HLL_B2) % P)
        .withColumn("__h4", F.expr("__h3 ^ shiftright(__h3, 13)"))
        .withColumn("h", (F.col("__h4") * HLL_A3) % P)
        .drop("__h1", "__h2", "__h3", "__h4")
    )


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """(group..., reg, m_j) HLL register rows — THE shared definition
    of the sketch (mixer → register addressing → rho → per-register
    max), used by the batch k07 query, the streaming sketch
    (streaming/sketch.hll_stream — a streaming groupBy+MAX over the
    same expression), and the estimator-contract tests. Keeping one
    copy is what makes the stream == batch equality a property of the
    code rather than of five transcriptions staying in sync."""
    d = _hll_mix_col(df, key_col)
    d = d.select(
        *group_cols,
        (F.col("h") % HLL_M).alias("reg"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select(
        *group_cols,
        "reg",
        F.when(F.col("w") == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W) - (F.length(F.bin("w")) - 1))
        .alias("rho"),
    )
    return d.groupBy(*group_cols, "reg").agg(F.max("rho").alias("m_j"))


def _hll_mix_sql(key_sql: str, source: str, extra_cols: str = "") -> str:
    """DuckDB CTE chain computing the same avalanche hash as
    _hll_mix_col; yields a relation (named `hmix`) with `h` plus
    extra_cols."""
    ec = (extra_cols + ", ") if extra_cols else ""
    return f"""
    __m1 AS (SELECT {ec}{_hash_sql(key_sql, HLL_A, HLL_B)} AS h FROM {source}),
    __m2 AS (SELECT {ec}xor(h, h >> 15) AS h FROM __m1),
    __m3 AS (SELECT {ec}(h * {HLL_A2} + {HLL_B2}) % {P} AS h FROM __m2),
    __m4 AS (SELECT {ec}xor(h, h >> 13) AS h FROM __m3),
    hmix AS (SELECT {ec}(h * {HLL_A3}) % {P} AS h FROM __m4)"""


@register(
    "k07_hll_distinct_users",
    f"""
    WITH {_hll_mix_sql('user_id', 'events', 'event_type')},
    rr AS (
      SELECT event_type,
             h % {HLL_M} AS reg,
             h // {HLL_M} AS w
      FROM hmix
    ), rho AS (
      SELECT event_type, reg,
             CASE WHEN w = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W} - (LENGTH(bin(w)) - 1) END AS rho
      FROM rr
    ), regs AS (
      SELECT event_type, reg, MAX(rho) AS m_j
      FROM rho GROUP BY event_type, reg
    ), sums AS (
      SELECT event_type,
             COUNT(*) AS registers_hit,
             SUM((CAST(1 AS BIGINT) << ({HLL_W + 1} - m_j))) AS s_present
      FROM regs GROUP BY event_type
    ), hll AS (
      SELECT event_type, registers_hit,
             CAST(s_present + ({HLL_M} - registers_hit)
               * (CAST(1 AS BIGINT) << {HLL_W + 1}) AS BIGINT) AS harmonic_sum,
             CAST(FLOOR(CAST(0.709 AS DOUBLE) * {HLL_M} * {HLL_M}
               * (CAST(1 AS BIGINT) << {HLL_W + 1})
               / (s_present + ({HLL_M} - registers_hit)
                  * (CAST(1 AS BIGINT) << {HLL_W + 1}))) AS BIGINT)
               AS hll_estimate
      FROM sums
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT hll.event_type, hll.registers_hit, hll.harmonic_sum,
           hll.hll_estimate, exact.exact_distinct,
           ABS(hll.hll_estimate - exact.exact_distinct) * 100
             // exact.exact_distinct AS err_pct
    FROM hll JOIN exact ON hll.event_type = exact.event_type
    ORDER BY hll.event_type
    """,
    doc="HyperLogLog distinct-user estimate per event type, audited "
    "against the exact count. State is 64 one-byte registers per "
    "group — mergeable by register-wise max, map-side combinable — "
    "vs an unbounded hash set for COUNT(DISTINCT): at 100 TB the "
    "sketch shuffles 64 longs per group, the exact side shuffles "
    "every distinct key. Cross-engine determinism: rho comes from "
    "LENGTH(bin(w)) (integer-string op, no log2 float), and the "
    "harmonic sum is computed EXACTLY as a BIGINT by scaling 2^-M_j "
    "to 2^(26-M_j) — the one division happens once on identical "
    "integers, so FLOOR agrees bit-for-bit.",
)
def k07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(
        ev.select("event_type", "user_id"), "user_id", ["event_type"]
    )
    sums = regs.groupBy("event_type").agg(
        F.count("*").alias("registers_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - m_j)")).alias(
            "s_present"
        ),
    )
    top = 1 << (HLL_W + 1)
    hll = sums.select(
        "event_type",
        "registers_hit",
        (F.col("s_present") + (HLL_M - F.col("registers_hit")) * F.lit(top)).alias(
            "harmonic_sum"
        ),
    ).withColumn(
        "hll_estimate",
        F.floor(F.lit(0.709 * HLL_M * HLL_M * top) / F.col("harmonic_sum")).cast(
            "long"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        hll.join(exact, "event_type")
        .select(
            "event_type",
            "registers_hit",
            "harmonic_sum",
            "hll_estimate",
            "exact_distinct",
            F.expr(
                "abs(hll_estimate - exact_distinct) * 100 div exact_distinct"
            ).alias("err_pct"),
        )
        .orderBy("event_type")
    )


@register(
    "k08_hll_sliding_distinct",
    f"""
    WITH {_hll_mix_sql(
        'user_id',
        "(SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d, user_id FROM events)",
        'd',
    )},
    rr AS (
      SELECT d, h % {HLL_M} AS reg, h // {HLL_M} AS w FROM hmix
    ), rho AS (
      SELECT d, reg,
             CASE WHEN w = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W} - (LENGTH(bin(w)) - 1) END AS rho
      FROM rr
    ), partials AS (
      SELECT d, reg, MAX(rho) AS m_j FROM rho GROUP BY d, reg
    ), days AS (SELECT DISTINCT d FROM partials),
    merged AS (
      SELECT t.d AS d, p.reg, MAX(p.m_j) AS m_j
      FROM days t JOIN partials p
        ON p.d BETWEEN t.d - INTERVAL 6 DAY AND t.d
      GROUP BY t.d, p.reg
    ), sums AS (
      SELECT d, COUNT(*) AS registers_hit,
             SUM((CAST(1 AS BIGINT) << ({HLL_W + 1} - m_j))) AS s_present
      FROM merged GROUP BY d
    ), hll AS (
      SELECT d, registers_hit,
             CAST(FLOOR(CAST(0.709 AS DOUBLE) * {HLL_M} * {HLL_M}
               * (CAST(1 AS BIGINT) << {HLL_W + 1})
               / (s_present + ({HLL_M} - registers_hit)
                  * (CAST(1 AS BIGINT) << {HLL_W + 1}))) AS BIGINT)
               AS hll_estimate
      FROM sums
    ), ex AS (
      SELECT t.d AS d, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_distinct
      FROM days t JOIN (SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
                               user_id FROM events) e
        ON e.d BETWEEN t.d - INTERVAL 6 DAY AND t.d
      GROUP BY t.d
    )
    SELECT STRFTIME(hll.d, '%Y-%m-%d') AS day, hll.registers_hit,
           hll.hll_estimate, ex.exact_distinct,
           ABS(hll.hll_estimate - ex.exact_distinct) * 100
             // ex.exact_distinct AS err_pct
    FROM hll JOIN ex ON hll.d = ex.d
    ORDER BY day
    """,
    doc="Trailing-7-day distinct users per day from MERGED daily HLL "
    "partials — the sketch-mergeability pattern that makes sliding "
    "distinct counts affordable: raw events are scanned ONCE to build "
    "per-day register partials (<= 64 rows per day forever), and every "
    "window estimate is a register-wise MAX over 7 tiny partials, so "
    "adding a day costs O(64) merges instead of a 7-day rescan. The "
    "audit side recomputes each window exactly (COUNT DISTINCT over a "
    "7-day range join) — precisely the 7x-rescan cost the sketch "
    "eliminates at 100 TB. Same register/mixer/estimator spec as k07 "
    "(shared hll_registers), integer-exact harmonic sums, one float "
    "division per window.",
)
def k08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    )
    # partials is bounded (days x 64 rows) and consumed by the day
    # grid, the window merge, and nothing else — cache it so the raw
    # event scan happens once for the sketch side.
    partials = hll_registers(ev, "user_id", ["d"]).cache()
    days = partials.select("d").distinct().select(F.col("d").alias("t_d"))
    merged = (
        days.join(
            partials,
            (F.col("d") >= F.date_sub(F.col("t_d"), 6)) & (F.col("d") <= F.col("t_d")),
        )
        .groupBy("t_d", "reg")
        .agg(F.max("m_j").alias("m_j"))
    )
    top = 1 << (HLL_W + 1)
    sums = merged.groupBy("t_d").agg(
        F.count("*").alias("registers_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - m_j)")).alias("s_present"),
    )
    hll = sums.select(
        "t_d",
        "registers_hit",
        F.floor(
            F.lit(0.709 * HLL_M * HLL_M * top)
            / (F.col("s_present") + (HLL_M - F.col("registers_hit")) * F.lit(top))
        )
        .cast("long")
        .alias("hll_estimate"),
    )
    # Distinct (d, user_id) BEFORE the 7-day range join: the join
    # replicates every matching row up to 7x, so deduplicating first
    # shrinks the replicated stream from raw events to distinct
    # user-days (events per user-day >> 1 at scale) while the
    # countDistinct result is unchanged.
    exact = (
        days.join(
            ev.distinct(),
            (F.col("d") >= F.date_sub(F.col("t_d"), 6)) & (F.col("d") <= F.col("t_d")),
        )
        .groupBy("t_d")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return (
        hll.join(exact, "t_d")
        .select(
            F.date_format("t_d", "yyyy-MM-dd").alias("day"),
            "registers_hit",
            "hll_estimate",
            "exact_distinct",
            F.expr("abs(hll_estimate - exact_distinct) * 100 div exact_distinct").alias(
                "err_pct"
            ),
        )
        .orderBy("day")
    )


BLOOM_M = 4096  # bits
_BLOOM_HASHES = [(131, 7), (1_000_003, 17), (999_983, 29)]  # (mult, add) mod P
_BLOOM_P = 1_000_000_007


def _bloom_pos_sql(fp: str, a: int, b: int) -> str:
    return f"(({fp} * {a} + {b}) % {_BLOOM_P}) % {BLOOM_M}"


@register(
    "k09_bloom_membership_audit",
    f"""
    WITH fps AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) AS fp,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket
      FROM documents
    ),
    held AS (SELECT fp FROM fps WHERE bucket < 1000),
    train AS (SELECT doc_id, fp FROM fps WHERE bucket >= 1000),
    bits AS (
      SELECT DISTINCT pos FROM held, UNNEST([
        {", ".join(_bloom_pos_sql("fp", a, b) for a, b in _BLOOM_HASHES)}
      ]) AS u(pos)
    ),
    probe AS (
      SELECT DISTINCT doc_id, pos FROM train, UNNEST([
        {", ".join(_bloom_pos_sql("fp", a, b) for a, b in _BLOOM_HASHES)}
      ]) AS u(pos)
    ),
    need AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_need FROM probe GROUP BY doc_id
    ),
    hitcnt AS (
      SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM probe p JOIN bits b ON p.pos = b.pos
      GROUP BY p.doc_id
    ),
    verdict AS (
      SELECT t.doc_id,
             COALESCE(h.n_hit, 0) = n.n_need AS claimed,
             t.fp IN (SELECT fp FROM held) AS actual
      FROM train t
      JOIN need n ON n.doc_id = t.doc_id
      LEFT JOIN hitcnt h ON h.doc_id = t.doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM held) AS n_heldout,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(*) FILTER (WHERE claimed) AS BIGINT) AS n_claimed,
           CAST(COUNT(*) FILTER (WHERE claimed AND NOT actual) AS BIGINT)
             AS n_false_pos,
           CAST(COUNT(*) FILTER (WHERE actual AND NOT claimed) AS BIGINT)
             AS n_false_neg,
           CAST(COUNT(*) FILTER (WHERE claimed AND NOT actual) AS BIGINT)
             * 1000000
             // CAST(COUNT(*) FILTER (WHERE NOT actual) AS BIGINT) AS fpr_micro
    FROM verdict
    """,
    doc="Bloom-filter membership audit: build a 4096-bit / 3-hash Bloom "
    "filter of the heldout docs' content fingerprints, probe every "
    "train doc, and measure the claimed-member rate against exact "
    "membership — false-negative count MUST be 0 (Bloom's contract), "
    "false-positive rate reported in integer micro-units. The filter "
    "is represented portably as the relation of set bit positions "
    "(<= 4096 rows regardless of corpus size), which is exactly how a "
    "Bloom side-filter ships to executors at 100 TB: broadcast KBs, "
    "prune the big side before the expensive join (same machinery as "
    "operators/bloomjoin.py and the manifest Bloom index, here "
    "audited end to end). Integer polynomial hashes throughout — no "
    "engine-specific hash functions.",
)
def k09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import char_hash_arrow
    from ice_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id",
        char_hash_arrow(F.col("text")).alias("fp"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    )
    held = fps.where(F.col("bucket") < 1000).select("fp")
    train = fps.where(F.col("bucket") >= 1000).select("doc_id", "fp")

    def positions(df):
        pos = F.array(
            *[
                ((F.col("fp") * a + b) % _BLOOM_P) % BLOOM_M
                for a, b in _BLOOM_HASHES
            ]
        )
        return df.select(*df.columns, F.explode(pos).alias("pos"))

    bits = positions(held).select("pos").distinct()
    probe = positions(train).select("doc_id", "pos").distinct()
    need = probe.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_need"))
    hitcnt = (
        probe.join(F.broadcast(bits), "pos").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    )
    verdict = (
        train.join(need, "doc_id")
        .join(hitcnt, "doc_id", "left")
        .join(
            F.broadcast(held.select(F.col("fp").alias("h_fp")).distinct()),
            F.col("fp") == F.col("h_fp"),
            "left",
        )
        .select(
            "doc_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_need")).alias("claimed"),
            F.col("h_fp").isNotNull().alias("actual"),
        )
    )
    n_held = held.agg(F.count(F.lit(1)).alias("n_heldout"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    agg = verdict.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.when(F.col("claimed"), 1).otherwise(0)).cast("long").alias("n_claimed"),
        F.sum(F.when(F.col("claimed") & ~F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("actual") & ~F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
        F.sum(F.when(~F.col("actual"), 1).otherwise(0)).cast("long").alias("n_non_members"),
    )
    return (
        n_held.crossJoin(n_bits)
        .crossJoin(agg)
        .select(
            "n_heldout",
            "n_bits_set",
            "n_train",
            "n_claimed",
            "n_false_pos",
            "n_false_neg",
            F.expr("n_false_pos * 1000000 div n_non_members").alias("fpr_micro"),
        )
    )


MEDIAN_BUCKET_W = 65536  # cents per pass-1 bucket


@register(
    "k10_exact_median_two_pass",
    f"""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             (COUNT(*) + 1) // 2 AS k
      FROM c
    ),
    b AS (
      SELECT cents // {MEDIAN_BUCKET_W} AS bkt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1
    ),
    cum AS (
      SELECT bkt, cnt,
             SUM(cnt) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM b
    ),
    sel AS (
      SELECT bkt, CAST(cum - cnt AS BIGINT) AS below, cnt AS bucket_count
      FROM cum, st WHERE cum >= k ORDER BY bkt LIMIT 1
    ),
    within AS (
      SELECT c.cents, CAST(COUNT(*) AS BIGINT) AS vcnt
      FROM c, sel WHERE c.cents // {MEDIAN_BUCKET_W} = sel.bkt
      GROUP BY c.cents
    ),
    wcum AS (
      SELECT cents,
             SUM(vcnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wc
      FROM within
    ),
    med AS (
      SELECT cents AS median_cents
      FROM wcum, st, sel WHERE wc >= k - sel.below ORDER BY cents LIMIT 1
    ),
    audit AS (
      SELECT CAST(COUNT(*) FILTER (WHERE c.cents <= m.median_cents) AS BIGINT)
               AS n_le,
             CAST(COUNT(*) FILTER (WHERE c.cents < m.median_cents) AS BIGINT)
               AS n_lt
      FROM c, med m
    )
    SELECT st.n, st.k AS target_rank, sel.bkt AS median_bucket,
           sel.bucket_count, med.median_cents, audit.n_le, audit.n_lt,
           audit.n_le >= st.k AND audit.n_lt < st.k AS rank_certified
    FROM st, sel, med, audit
    """,
    doc="EXACT distributed median without a global sort: pass 1 "
    "histograms order values into fixed 65536-cent buckets (bounded "
    "relation, one keyed shuffle, map-side combinable) and locates "
    "the bucket containing the target rank; pass 2 re-scans ONLY that "
    "bucket's rows (a selective predicate a sorted/partitioned layout "
    "prunes at the file level) and walks the exact value. A third "
    "conditional aggregate certifies the rank inequalities in-query "
    "(n_le >= k > n_lt), so the output carries its own proof. The "
    "running-sum windows order the BUCKET relation (<= domain/65536 "
    "rows), never data rows — this is the iterative-narrowing median "
    "every shared-nothing engine uses where a total order would be a "
    "single-node sort.",
)
def k10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.median import exact_median

    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return exact_median(c, "cents", bucket_w=MEDIAN_BUCKET_W)


# AMS sign hashes: portable affine-mod-P bit extraction. Sign_j(key) =
# +1 if ((key*Aj + Bj) mod P) is even else -1. Affine is fine here:
# AMS needs pairwise-independent signs for the expectation, and the
# audit column reports the actual error honestly.
AMS_ESTIMATORS = [
    (1686629717, 11), (1103515245, 23), (1566083941, 37), (1812433253, 53),
    (48271, 7), (69621, 13), (630360016, 19), (397204094, 29),
]


@register(
    "k11_ams_selfjoin_size",
    f"""
    WITH cnt AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    est AS (
      SELECT j,
             SUM(CASE WHEN ((user_id % {P}) * a + b) % {P} % 2 = 0
                      THEN c ELSE -c END) AS z
      FROM cnt, (VALUES {", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(AMS_ESTIMATORS))}) p(j, a, b)
      GROUP BY j
    ),
    f2e AS (SELECT CAST(SUM(z * z) AS BIGINT) // {len(AMS_ESTIMATORS)} AS f2_est FROM est),
    f2x AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM cnt)
    SELECT f2_est, f2_exact,
           ABS(f2_est - f2_exact) * 100 // f2_exact AS err_pct
    FROM f2e, f2x
    """,
    doc="AMS sketch for the second frequency moment (= self-join size "
    "of events on user_id — the cardinality a join optimizer needs "
    "before picking a strategy): 8 sign-hash estimators, each a "
    "single +/-count sum, averaged as sum(z^2)/8. State is 8 longs "
    "TOTAL regardless of key cardinality, mergeable by addition — "
    "the sketch an AQE-style planner could maintain per partition "
    "for KBs. The exact F2 audit (sum of squared counts) is the "
    "full groupBy the sketch avoids; err_pct reports the real "
    "estimator error. Integer end to end (sign sums and squares are "
    "BIGINT; one floor division by 8).",
)
def k11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).cache()
    ests = []
    for a, b in AMS_ESTIMATORS:
        sign = F.when(((F.col("user_id") % P) * a + b) % P % 2 == 0, F.col("c")).otherwise(
            -F.col("c")
        )
        ests.append(F.sum(sign))
    zrow = cnt.agg(*[e.alias(f"z{j}") for j, e in enumerate(ests)])
    # decimal(38,0) for every squared term (lint_overflow's class):
    # z^2 and c^2 square corpus-scaled counts, and sum(z^2) can clear
    # int64 even when the reported f2_est fits. The BIGINT outputs
    # overflow (loudly, ANSI) only if the reported values themselves
    # exceed int64 — the oracle's own ceiling.
    f2e = zrow.select(
        (
            sum(
                F.col(f"z{j}").cast("decimal(38,0)") * F.col(f"z{j}")
                for j in range(len(AMS_ESTIMATORS))
            )
        ).alias("ss")
    ).select(F.expr(f"ss div {len(AMS_ESTIMATORS)}").cast("long").alias("f2_est"))
    f2x = cnt.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("long")
        .alias("f2_exact")
    )
    return (
        f2e.crossJoin(F.broadcast(f2x))
        .select(
            "f2_est",
            "f2_exact",
            F.expr(
                "abs(CAST(f2_est AS DECIMAL(38,0)) - f2_exact) * 100 "
                "div f2_exact"
            ).alias("err_pct"),
        )
    )


def _k12_pct_sql(p_num: int, p_den: int) -> str:
    """Rank of percentile p in a group of n (lower-rank convention):
    ceil(n * p) with integer arithmetic."""
    return f"(n * {p_num} + {p_den} - 1) // {p_den}"


@register(
    "k12_log_histogram_percentiles",
    f"""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b AS (
      SELECT event_type,
             CASE WHEN cents <= 0 THEN 0
                  ELSE LENGTH(bin(cents)) END AS bkt,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, bkt, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM b
    ),
    pct AS (
      SELECT event_type, p_num, p_den,
             MIN(CASE WHEN cum >= {_k12_pct_sql('p_num', 'p_den')}
                      THEN bkt END) AS p_bkt
      FROM st, (VALUES (1, 2), (9, 10), (99, 100)) p(p_num, p_den)
      GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(p_num * 100 // p_den AS BIGINT) AS pct,
           CAST(p_bkt AS BIGINT) AS bucket_log2,
           CAST((CAST(1 AS BIGINT) << GREATEST(p_bkt - 1, 0)) AS BIGINT)
             AS bucket_lo_cents,
           CAST((CAST(1 AS BIGINT) << p_bkt) - 1 AS BIGINT) AS bucket_hi_cents
    FROM pct
    ORDER BY event_type, pct
    """,
    doc="Per-type p50/p90/p99 located in log2 value buckets — the "
    "tail-percentile dashboard shape (latency/value distributions) "
    "with state bounded at 64 buckets per group forever. Bucket id "
    "is LENGTH(bin(cents)) (the portable floor_log2+1, no float "
    "log); percentile ranks use ceil(n*p) in cleared-fraction "
    "integers; output brackets each percentile in [2^(b-1), 2^b). "
    "Mergeable across partitions and time (bucket counts add), the "
    "same property k05/k08 prove for KMV/HLL — this is the "
    "histogram member of the mergeable-sketch family.",
)
def k12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    b = c.select(
        "event_type",
        F.when(F.col("cents") <= 0, 0).otherwise(F.length(F.bin("cents"))).alias("bkt"),
    ).groupBy("event_type", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    st = b.select(
        "event_type",
        "bkt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    ps = spark.createDataFrame([(1, 2), (9, 10), (99, 100)], ["p_num", "p_den"])
    pct = (
        st.crossJoin(F.broadcast(ps))
        .groupBy("event_type", "p_num", "p_den")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n * p_num + p_den - 1) div p_den"),
                    F.col("bkt"),
                )
            ).alias("p_bkt")
        )
    )
    return pct.select(
        "event_type",
        F.expr("CAST(p_num * 100 div p_den AS BIGINT)").alias("pct"),
        F.col("p_bkt").cast("long").alias("bucket_log2"),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(greatest(p_bkt - 1, 0) AS INT)) AS BIGINT)").alias(
            "bucket_lo_cents"
        ),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(p_bkt AS INT)) - 1 AS BIGINT)").alias(
            "bucket_hi_cents"
        ),
    ).orderBy("event_type", "pct")


K13_A, K13_B = 1566083941, 97  # large-multiplier pair (Waterman LCG)
K13_K = 256


@register(
    "k13_hash_sample_quantiles",
    f"""
    WITH c AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ((event_id % {P}) * {K13_A} + {K13_B}) % {P} AS h
      FROM events
    ),
    samp AS (
      SELECT cents, event_id FROM c ORDER BY h, event_id LIMIT {K13_K}
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER () AS k
      FROM samp
    ),
    ests AS (
      SELECT p_num, p_den,
             MIN(CASE WHEN rn >= (k * p_num + p_den - 1) // p_den
                      THEN cents END) AS est
      FROM ranked, (VALUES (1, 2), (9, 10), (99, 100)) p(p_num, p_den)
      GROUP BY 1, 2
    ),
    audit AS (
      SELECT e.p_num, e.p_den, e.est,
             CAST(COUNT(*) FILTER (WHERE c.cents <= e.est) AS BIGINT) AS n_le,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c, ests e
      GROUP BY 1, 2, 3
    )
    SELECT CAST(p_num * 100 // p_den AS BIGINT) AS pct,
           est AS est_cents,
           CAST(n_le * 10000 // n AS BIGINT) AS exact_le_bp,
           CAST(n_le * 10000 // n - p_num * 10000 // p_den AS BIGINT) AS err_bp
    FROM audit
    ORDER BY pct
    """,
    doc="Quantile estimation from a deterministic bottom-k-by-hash "
    "sample, with the estimate's EXACT rank error as part of the "
    "output: the 256 rows whose keyed hash is smallest form a "
    "uniform (hash-order) sample, p50/p90/p99 come from sample "
    "order statistics, and a second exact pass reports each "
    "estimate's true cumulative fraction in integer basis points "
    "(err_bp = achieved - target). The bottom-k-by-hash sample is "
    "MERGEABLE exactly like KMV (k05): union two shards' samples, "
    "keep the 256 smallest hashes — a quantile sketch the sketch "
    "family lacked. Determinism: the portable modular hash over "
    "unique event_id with (h, event_id) tiebreak gives one total "
    "order; every output column is an integer. Shape at 100 TB: "
    "bottom-k is per-partition top-k + one 256-row merge "
    "(TakeOrderedAndProject, never a global sort); the two "
    "partitionless windows run over the 256-row sample only; the "
    "audit pass is one scan against 3 broadcast estimate rows.",
)
def k13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr(f"((event_id % {P}) * {K13_A} + {K13_B}) % {P}").alias("h"),
    )
    samp = c.orderBy("h", "event_id").limit(K13_K).select("cents", "event_id")
    ranked = samp.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    ps = spark.createDataFrame([(1, 2), (9, 10), (99, 100)], ["p_num", "p_den"])
    ests = (
        ranked.crossJoin(F.broadcast(ps))
        .groupBy("p_num", "p_den")
        .agg(
            F.min(
                F.when(
                    F.col("rn") >= F.expr("(k * p_num + p_den - 1) div p_den"),
                    F.col("cents"),
                )
            ).alias("est")
        )
    )
    audit = (
        c.crossJoin(F.broadcast(ests))
        .groupBy("p_num", "p_den", "est")
        .agg(
            F.sum(F.when(F.col("cents") <= F.col("est"), 1).otherwise(0))
            .cast("long")
            .alias("n_le"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return audit.select(
        F.expr("CAST(p_num * 100 div p_den AS BIGINT)").alias("pct"),
        F.col("est").alias("est_cents"),
        F.expr("CAST(n_le * 10000 div n AS BIGINT)").alias("exact_le_bp"),
        F.expr(
            "CAST(n_le * 10000 div n - p_num * 10000 div p_den AS BIGINT)"
        ).alias("err_bp"),
    ).orderBy("pct")
