"""Event-stream analytics over the `events` table.

The reference's only streaming surface is SQS-triggered file ingest
(SURVEY.md §2.9) — event-time analytics is new capability. These are
the batch forms; ice_spark.streaming holds the readStream versions.

Timestamps: events.ts arrives as a timestamp regardless of the parquet
encoding (TIMESTAMP(MICROS) passes through; TIMESTAMP(NANOS) is
normalized by tables.load_table) — outputs are formatted
strings/bigints so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ice_spark.operators.asof import asof_join
from ice_spark.queries.helpers import MONEY, dsum
from ice_spark.queries.registry import register
from ice_spark.tables import load_table


@register(
    "e01_hourly_event_stats",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly event counts / distinct users / value by type.",
)
def e01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Group by the TRUNCATED TIMESTAMP and render the string after the
    # aggregate: the distinct-agg Expand triples every input row, so
    # the shuffle key rides 3x — an 8-byte timestamp instead of a
    # 19-char string (guide §2.3, narrower shuffle keys). Same string
    # per group either way.
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("__h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


@register(
    "e02_tumbling_window_6h",
    """
    SELECT STRFTIME(CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="6-hour tumbling window aggregation (Spark window(); oracle via "
    "epoch bucketing). Streaming twin in ice_spark.streaming.",
)
def e02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "e03_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id,
           COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
    doc="Gap-based sessionization (30 min): lag + running sum. At scale "
    "this is one shuffle by user_id; skewed users need salting only if "
    "a single user exceeds a partition.",
)
def e03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gaps = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                > 1800.0
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = gaps.select(
        "user_id", F.sum("new_session").over(run).alias("session_id")
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "e04_signup_purchase_funnel",
    """
    SELECT COUNT(*) AS n_converted
    FROM (
      SELECT user_id
      FROM events
      GROUP BY user_id
      HAVING MIN(CASE WHEN event_type = 'signup' THEN ts END)
             < MAX(CASE WHEN event_type = 'purchase' THEN ts END)
    ) converted
    """,
    doc="Funnel: users whose first signup precedes their last purchase.",
)
def e04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
    )
    return per_user.where(
        F.col("first_signup") < F.col("last_purchase")
    ).agg(F.count(F.lit(1)).alias("n_converted"))


@register(
    "e05_json_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="JSON extraction from the props column (get_json_object).",
)
def e05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "e06_asof_click_before_purchase",
    """
    SELECT purchase_id, click_id FROM (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ) x WHERE rn = 1
    """,
    doc="As-of join: latest click at-or-before each purchase, per user. "
    "Spark side uses the scalable union+window asof operator "
    "(ice_spark.operators.asof) — one shuffle, no quadratic join.",
)
def e06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["click_id"],
        tie_breaker="click_id",
    )
    return joined.where(F.col("click_id").isNotNull()).select("purchase_id", "click_id")


@register(
    "e07_user_daily_activity",
    """
    SELECT user_id,
           COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
           STRFTIME(MIN(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day,
           STRFTIME(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user activity span and distinct active days.",
)
def e07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.date_format(F.min(F.col("ts").cast("date")), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max(F.col("ts").cast("date")), "yyyy-MM-dd").alias("last_day"),
    )


@register(
    "e08_skew_safe_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
    FROM events
    GROUP BY event_type
    """,
    doc="Distinct users per event type via the skew-safe two-stage "
    "plan (operators/skew.skew_safe_count_distinct): distinct on "
    "(type, user) spreads hot event types across partitions before "
    "the per-type count — a plain COUNT(DISTINCT) serializes each "
    "hot key on one executor at 100 TB. Oracle is the plain form; "
    "results are identical by construction.",
)
def e08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.skew import skew_safe_count_distinct

    ev = load_table(spark, sf_dir, "events")
    return skew_safe_count_distinct(ev, "event_type", "user_id")


@register(
    "e09_error_recovery_windows",
    """
    SELECT w.event_id AS wid,
           w.user_id AS user_id,
           STRFTIME(w.ts, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.event_type) AS n_types
    FROM events w
    JOIN events e
      ON e.user_id = w.user_id
     AND e.ts >= w.ts
     AND e.ts < w.ts + INTERVAL 30 MINUTE
     AND e.event_id <> w.event_id
    WHERE w.event_type = 'error'
    GROUP BY 1, 2, 3
    """,
    doc="Per-error 30-minute recovery window: same-user events inside "
    "each window, via the bucketized range join "
    "(operators/rangejoin.bucketed_range_join) — an equi-join on "
    "(user, time bucket) + exact filter instead of the cartesian "
    "BETWEEN join the oracle runs. Identical results, linear cost.",
)
def e09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("wid"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    others = ev.select("event_id", "user_id", "ts", "event_type")
    j = bucketed_range_join(
        others, windows, ["user_id"], "ts", "w_start", "w_end", bucket_seconds=1800
    ).where(F.col("event_id") != F.col("wid"))
    return j.groupBy(
        "wid",
        "user_id",
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "e10_daily_top_event_types",
    """
    SELECT day, event_type, n, rnk FROM (
      SELECT day, event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY day
                                     ORDER BY n DESC, event_type) AS INT) AS rnk
      FROM (
        SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               event_type, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
      ) c
    ) r WHERE rnk <= 3
    """,
    doc="Top-3 event types per day: pre-aggregate then rank — the "
    "window runs over (days x types) rows, never raw events, so the "
    "window state is tiny at any scale. Total order via (count desc, "
    "type) tie-break.",
)
def e10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Group by the DATE, render the string after the aggregate — the
    # map-side hash agg over raw events keys on 4 bytes instead of a
    # 10-char string (guide §2.3); same string per group (e01 pattern).
    c = (
        ev.groupBy(F.col("ts").cast("date").alias("__d"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("__d", "yyyy-MM-dd").alias("day"), "event_type", "n"
        )
    )
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("day", "event_type", "n", "rnk")
    )


@register(
    "e11_cohort_retention",
    """
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
             f.d0,
             date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS week_off
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT STRFTIME(d0, '%Y-%m-%d') AS cohort_day,
           week_off,
           COUNT(*) AS n_users
    FROM act
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users grouped by first-seen day, counted "
    "per week offset of later activity. Two aggregations + one "
    "equi-join on user_id; the first-seen side is a pre-aggregated "
    "(one row per user) relation, broadcastable when users fit and "
    "shuffled by AQE when they don't.",
)
def e11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "d0",
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7)
            .cast("long")
            .alias("week_off"),
        )
        .distinct()
    )
    # date key through the agg, string rendered after (e01 pattern)
    return (
        act.groupBy("d0", "week_off")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            "week_off",
            "n_users",
        )
    )


@register(
    "e14_windowed_dedup",
    """
    WITH k AS (
      SELECT event_type, user_id,
             epoch_ms(ts) // 1000 // 300 AS w,
             MIN(event_id) AS keeper,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(*) AS n_kept,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dropped,
           MIN(keeper) AS min_keeper_id
    FROM k
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Windowed event deduplication (batch form of "
    "streaming/dedupe.dedup_stream): collapse repeats of the same "
    "(user, type) within a 5-minute bucket to the earliest event id. "
    "Bucketing is integer epoch-millis floor division on both sides "
    "(epoch_ms // 1000 == unix_timestamp truncation for post-1970 "
    "data) — fractional epoch() seconds hash-diverged on the round-5 "
    "driver engines. One keyed aggregation with map-side partials, "
    "then a tiny per-type rollup — dedup state is bounded by active "
    "keys per window at any scale, the same bound the watermarked "
    "streaming version relies on.",
)
def e14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy(
        "event_type",
        "user_id",
        F.expr("unix_timestamp(ts) div 300").alias("w"),
    ).agg(
        F.min("event_id").alias("keeper"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_kept"),
            (F.sum("n") - F.count(F.lit(1))).alias("n_dropped"),
            F.min("keeper").alias("min_keeper_id"),
        )
        .orderBy("event_type")
    )


@register(
    "e15_anomalous_hours",
    """
    WITH hourly AS (
      SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    ),
    st AS (
      SELECT hour, event_type, n_events,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours,
             CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
             CAST(SUM(n_events * n_events) OVER (PARTITION BY event_type) AS BIGINT) AS type_sumsq
      FROM hourly
    )
    SELECT event_type, hour, n_events, n_hours, type_total
    FROM st
    WHERE (n_hours * n_events - type_total) * (n_hours * n_events - type_total)
          > 9 * (n_hours * type_sumsq - type_total * type_total)
    """,
    doc="Anomaly detection on hourly event volume: flag hours whose "
    "count deviates more than 3 sigma from the type's mean. The "
    "3-sigma test is done entirely in integers — (n*x - s)^2 > "
    "9*(n*q - s^2) is the z-score condition cleared of divisions — "
    "so both engines agree bit-for-bit with no float epsilon. "
    "Plan: one keyed aggregation (hour, type) with map-side "
    "partials, then a per-type window over the tiny hourly rollup; "
    "the window input is |types| x |hours| rows regardless of raw "
    "volume, so the second shuffle is negligible at any scale. "
    "BIGINT squares hold while a type's total event count < ~3e9 "
    "per stats partition; past that, widen to DECIMAL(38,0).",
)
def e15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # timestamp key through the raw-event agg, string rendered after
    # (e01 pattern — 8-byte map-side hash key instead of 19 chars)
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("__h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
        )
    )
    w = Window.partitionBy("event_type")
    # decimal(38,0) for every count-times-count term: n_events^2 and
    # the z-score cross terms square corpus-scaled counts, which
    # clears int64 long before 100x (tools/lint_overflow.py's class —
    # the e24 lesson applied here). Exact integer arithmetic either
    # way, so gate values are unchanged; output columns stay BIGINT.
    d38 = "decimal(38,0)"
    st = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_hours"),
        F.sum("n_events").over(w).alias("type_total"),
        F.sum(F.col("n_events").cast(d38) * F.col("n_events"))
        .over(w)
        .alias("type_sumsq"),
    )
    dev = F.col("n_hours").cast(d38) * F.col("n_events") - F.col("type_total")
    var_n2 = (
        F.col("n_hours").cast(d38) * F.col("type_sumsq")
        - F.col("type_total").cast(d38) * F.col("type_total")
    )
    return st.where(dev * dev > F.lit(9) * var_n2).select(
        "event_type", "hour", "n_events", "n_hours", "type_total"
    )


@register(
    "e17_multitouch_attribution",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    cl AS (
      SELECT event_id AS cid, user_id, ts AS cts,
             'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
                          AS VARCHAR) AS channel
      FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.pid, p.v, cl.cid, cl.channel,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY cl.cts, cl.cid) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n
      FROM p JOIN cl
        ON p.user_id = cl.user_id
       AND cl.cts < p.pts
       AND cl.cts >= p.pts - INTERVAL 72 HOUR
    ),
    attr AS (
      SELECT channel, pid,
             v // n + CASE WHEN rn <= v % n THEN 1 ELSE 0 END AS cents
      FROM m
    ),
    un AS (
      SELECT 'unattributed' AS channel,
             CAST(0 AS BIGINT) AS n_touches,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(COALESCE(SUM(p.v), 0) AS BIGINT) AS attributed_cents
      FROM p LEFT JOIN (SELECT DISTINCT pid FROM m) t ON p.pid = t.pid
      WHERE t.pid IS NULL
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM attr GROUP BY channel
    UNION ALL
    SELECT * FROM un
    ORDER BY channel
    """,
    doc="Multi-touch revenue attribution: each purchase's value is "
    "split EQUALLY across the user's clicks in the prior 72 hours, in "
    "exact integer cents — every click gets v div n and the v mod n "
    "remainder cents go to the earliest touches, so per-purchase "
    "attribution sums to the purchase value EXACTLY (no float drift, "
    "auditable conservation: sum of attributed_cents over all rows "
    "equals total purchase cents). Touchless purchases land in an "
    "explicit 'unattributed' row rather than vanishing. Plan: one "
    "user-keyed join with a time-range predicate (bucketize via "
    "operators/rangejoin.py when user histories are long), per-"
    "purchase windows over the matched touches only.",
)
def e17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cl = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("cts"),
        F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").cast("long") % 4).cast("string"),
        ).alias("channel"),
    )
    # LEFT join so touchless purchases flow through the same pass with
    # cid NULL instead of being recomputed by a second evaluation of
    # the join subtree (the old anti-join branch re-ran the whole
    # purchase x click join to find unmatched pids). count('cid') over
    # the pid window is 0 for those rows, so the equal-split arithmetic
    # is guarded by cid IS NOT NULL and they land in 'unattributed'
    # with their full value. A constant seed row keeps the
    # 'unattributed' output row present even when every purchase is
    # touched (the old branch emitted it unconditionally).
    m = p.join(
        cl,
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 72 HOURS")),
        "left",
    ).select(
        "pid",
        "v",
        "cid",
        "channel",
        F.row_number().over(Window.partitionBy("pid").orderBy("cts", "cid")).alias("rn"),
        F.count("cid").over(Window.partitionBy("pid")).alias("n"),
    )
    attr = m.select(
        # keyed on cid (not coalesce(channel)): a MATCHED click with a
        # null props channel must stay a NULL-channel group, exactly as
        # the two-pass form grouped it.
        F.when(F.col("cid").isNull(), F.lit("unattributed"))
        .otherwise(F.col("channel"))
        .alias("channel"),
        "pid",
        F.col("cid").isNotNull().alias("touched"),
        F.when(
            F.col("cid").isNotNull(),
            F.expr("v div n")
            + F.when(F.col("rn") <= F.col("v") % F.col("n"), 1).otherwise(0),
        )
        .otherwise(F.col("v"))
        .alias("cents"),
    )
    grouped = attr.groupBy("channel").agg(
        F.sum(F.when(F.col("touched"), 1).otherwise(0)).cast("long").alias("n_touches"),
        F.countDistinct("pid").alias("n_purchases"),
        F.sum("cents").cast("long").alias("attributed_cents"),
    )
    seed = spark.range(1).select(
        F.lit("unattributed").alias("channel"),
        F.lit(0).cast("long").alias("n_touches"),
        F.lit(0).cast("long").alias("n_purchases"),
        F.lit(0).cast("long").alias("attributed_cents"),
    )
    return (
        grouped.unionAll(seed)
        .groupBy("channel")
        .agg(
            F.sum("n_touches").cast("long").alias("n_touches"),
            F.sum("n_purchases").cast("long").alias("n_purchases"),
            F.sum("attributed_cents").cast("long").alias("attributed_cents"),
        )
        .orderBy("channel")
    )


@register(
    "e18_active_day_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch(DATE_TRUNC('day', ts)) // 86400 AS BIGINT) AS day_num
      FROM events
    ),
    isl AS (
      SELECT user_id, day_num,
             day_num - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day_num) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, MAX(len) AS longest_streak,
             CAST(COUNT(*) AS BIGINT) AS n_streaks,
             CAST(SUM(len) AS BIGINT) AS active_days
      FROM streaks GROUP BY user_id
    )
    SELECT longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(active_days) AS BIGINT) AS total_active_days,
           CAST(SUM(n_streaks) AS BIGINT) AS total_streaks
    FROM best
    GROUP BY longest_streak
    ORDER BY longest_streak
    """,
    doc="Longest consecutive-active-day streak per user, rolled up into "
    "a streak-length histogram — the gaps-and-islands pattern: "
    "day_num minus the per-user ROW_NUMBER is constant within a "
    "consecutive run, so one window + one groupBy finds every island "
    "without self-joins or iteration. All windows run on the "
    "deduplicated (user, day) relation — bounded by users x days, "
    "not raw events — and day arithmetic is integer epoch-days, "
    "identical in both engines.",
)
def e18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr("CAST(unix_timestamp(date_trunc('day', ts)) div 86400 AS BIGINT)").alias(
            "day_num"
        ),
    ).distinct()
    isl = days.select(
        "user_id",
        "day_num",
        (
            F.col("day_num")
            - F.row_number().over(Window.partitionBy("user_id").orderBy("day_num"))
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    best = streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )
    return (
        best.groupBy("longest_streak")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("active_days").cast("long").alias("total_active_days"),
            F.sum("n_streaks").cast("long").alias("total_streaks"),
        )
        .orderBy("longest_streak")
    )


@register(
    "e19_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) * 1000000
             // CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS BIGINT)
             AS p_micro
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY from_type, to_type
    """,
    doc="First-order event transition matrix (the Markov counts behind "
    "next-action prediction and funnel modeling): LEAD per user over "
    "event time, pair counts, and the per-source transition "
    "probability in integer micro-units (count scaled by the row "
    "marginal, floor division — no float ratios). One user-keyed "
    "window shuffle plus one pair aggregation; the output is "
    "|types|^2 rows at any volume.",
)
def e19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000").alias("__num"),
        F.sum("n").over(marg).alias("__den"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("__num div __den").alias("p_micro"),
    ).orderBy("from_type", "to_type")


@register(
    "e21_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    ),
    delay AS (
      SELECT s.user_id,
             CAST(epoch_ms(p.first_purchase_ts) // 1000 - epoch_ms(s.signup_ts) // 1000 AS BIGINT)
               AS delay_sec
      FROM s JOIN p ON p.user_id = s.user_id
    ),
    dec AS (
      SELECT user_id, delay_sec,
             NTILE(10) OVER (ORDER BY delay_sec, user_id) AS decile
      FROM delay
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(delay_sec) AS BIGINT) AS min_delay_sec,
           CAST(MAX(delay_sec) AS BIGINT) AS max_delay_sec,
           CAST(SUM(delay_sec) AS BIGINT) // COUNT(*) AS avg_delay_sec
    FROM dec GROUP BY decile ORDER BY decile
    """,
    doc="Signup-to-first-purchase conversion-delay distribution in "
    "deciles: per-user first signup, first subsequent purchase, "
    "integer-second delay, tiebroken NTILE(10). The per-user "
    "conversion relation GROWS with the corpus, so the decile "
    "assignment goes through operators/ranking.global_ntile "
    "(range-repartition + per-partition row numbers + broadcast "
    "offsets) exactly like a05/e20/w10/s14 — never a partitionless "
    "NTILE window, which serializes every converting user into one "
    "task. Result is hash-identical to the oracle's NTILE by the "
    "total order (delay_sec, user_id). Delays and averages are "
    "exact integers.",
)
def e21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ranking import global_ntile

    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    delay = s.join(p, "user_id").select(
        "user_id",
        (
            F.unix_timestamp("first_purchase_ts") - F.unix_timestamp("signup_ts")
        ).cast("long").alias("delay_sec"),
    )
    dec = global_ntile(
        delay,
        [F.asc("delay_sec"), F.asc("user_id")],
        10,
        "decile",
    ).select("delay_sec", "decile")
    return (
        dec.groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("delay_sec").alias("min_delay_sec"),
            F.max("delay_sec").alias("max_delay_sec"),
            F.expr("CAST(sum(delay_sec) AS BIGINT) div count(*)").alias("avg_delay_sec"),
        )
        .orderBy("decile")
    )


@register(
    "e22_bot_rate_detection",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(epoch_ms(MAX(ts)) // 1000 - epoch_ms(MIN(ts)) // 1000 AS BIGINT) AS span_sec
      FROM events GROUP BY user_id
    ),
    gaps AS (
      SELECT user_id, g FROM (
        SELECT user_id,
               CAST(epoch_ms(ts) // 1000
                    - epoch_ms(LAG(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id)) // 1000 AS BIGINT) AS g
        FROM events
      ) WHERE g IS NOT NULL
    ),
    reg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(g) AS BIGINT) AS s,
             CAST(SUM(g * g) AS BIGINT) AS q
      FROM gaps GROUP BY user_id
    )
    SELECT p.user_id, p.n_events, p.span_sec,
           p.n_events * 3600000 // GREATEST(p.span_sec, 1) AS rate_milli_per_hour,
           r.m >= 5 AND 100 * (r.m * r.q - r.s * r.s) < r.s * r.s AS metronomic
    FROM per_user p JOIN reg r ON r.user_id = p.user_id
    WHERE p.n_events >= 20
    ORDER BY rate_milli_per_hour DESC, p.user_id
    LIMIT 20
    """,
    doc="Bot / abuse screen: per-user event rate (events per hour in "
    "integer milli-units) and a metronomic-regularity flag — "
    "coefficient of variation of inter-event gaps under 10%, tested "
    "as 100*(m*q - s^2) < s^2 with the divisions cleared (same "
    "integer-variance idiom as e15, exact in both engines). One "
    "user-keyed window for gaps plus two keyed aggregations; "
    "humans are bursty, schedulers are metronomic, and the flag "
    "costs three BIGINTs of state per user.",
)
def e22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("span_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            .cast("long")
            .alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    # decimal(38,0) for the variance cross terms: q sums squared gaps
    # and m*q / s*s square per-user sums — all clear int64 once a hot
    # user's event count is large enough (lint_overflow's class).
    # Integer-exact either way; output columns keep their types.
    d38 = "decimal(38,0)"
    reg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("g").cast("long").alias("s"),
        F.sum(F.col("g").cast(d38) * F.col("g")).alias("q"),
    )
    s2 = F.col("s").cast(d38) * F.col("s")
    return (
        per_user.where(F.col("n_events") >= 20)
        .join(reg, "user_id")
        .select(
            "user_id",
            "n_events",
            "span_sec",
            F.expr("n_events * 3600000 div greatest(span_sec, 1)").alias(
                "rate_milli_per_hour"
            ),
            (
                (F.col("m") >= 5)
                & (
                    F.lit(100).cast(d38)
                    * (F.col("m").cast(d38) * F.col("q") - s2)
                    < s2
                )
            ).alias("metronomic"),
        )
        .orderBy(F.desc("rate_milli_per_hour"), "user_id")
        .limit(20)
    )


@register(
    "e23_dau_wau_stickiness",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d
      FROM events
    ),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM days GROUP BY d
    ),
    wau AS (
      SELECT t.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT d FROM days) t
      JOIN days u ON u.d BETWEEN t.d - INTERVAL 6 DAY AND t.d
      GROUP BY t.d
    )
    SELECT STRFTIME(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           dau.dau * 10000 // wau.wau AS stickiness_bp
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day
    """,
    doc="DAU / trailing-7-day WAU stickiness per day in integer basis "
    "points — the engagement ratio growth teams track daily. Built "
    "on the deduplicated user-day relation (bounded by users x days, "
    "never raw events); the WAU range join is day-grid x user-days, "
    "the same bounded-window shape as k08's sliding sketch merge — "
    "and k08 IS the sketch version of this query when exact WAU "
    "distinct-counting gets expensive.",
)
def e23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct().cache()
    dau = days.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    grid = days.select("d").distinct().select(F.col("d").alias("t_d"))
    wau = (
        grid.join(
            days,
            (F.col("d") >= F.date_sub(F.col("t_d"), 6)) & (F.col("d") <= F.col("t_d")),
        )
        .groupBy("t_d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.t_d)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 10000 div wau").alias("stickiness_bp"),
        )
        .orderBy("day")
    )


@register(
    "e24_volume_correlation",
    """
    WITH hourly AS (
      SELECT DATE_TRUNC('hour', ts) AS h,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM hourly
    )
    SELECT n AS n_hours,
           CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                     WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS corr_sign,
           CAST(((n * sxy - sx * sy) * 100) * ((n * sxy - sx * sy) * 100)
                // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)
             AS r2_bp
    FROM s
    """,
    doc="Correlation between click and purchase hourly volumes, "
    "computed EXACTLY in integers: Pearson's r^2 in basis points as "
    "(100*(n*Sxy - Sx*Sy))^2 div ((n*Sxx - Sx^2)(n*Syy - Sy^2)) — "
    "every division cleared until one final floor division, the sign "
    "reported separately (r^2 is sign-blind). No sqrt, no float "
    "accumulation, so both engines agree to the last basis point. "
    "One conditional-aggregate scan builds the paired hourly series; "
    "the correlation itself reads six BIGINTs. Intermediates ride "
    "int64 here and DuckDB's int128; on Spark at much larger n, "
    "stage the products through DECIMAL(38,0).",
)
def e24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    # decimal(38,0) end-to-end for the correlation cross terms (the
    # r11 fix widened only r2_bp; the sum-of-squares accumulators and
    # corr_sign's numerator still rode int64 and square per-hour
    # counts — lint_overflow's class). Integer-exact either way.
    d38 = "decimal(38,0)"
    s = hourly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    num = (
        F.col("n").cast(d38) * F.col("sxy")
        - F.col("sx").cast(d38) * F.col("sy")
    )
    return s.select(
        F.col("n").alias("n_hours"),
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).cast("long").alias("corr_sign"),
        # decimal(38,0), not BIGINT, for the cross-multiplied square:
        # (num*100)^2 overflows int64 at the sf10 probe (the honest
        # evaluator surfaced it; count() had pruned this column for
        # two rounds). Exact integer arithmetic either way — identical
        # gate values — with ~10^38 headroom; DuckDB's side is HUGEINT.
        F.expr(
            "CAST(((CAST(n AS DECIMAL(38,0)) * sxy "
            "  - CAST(sx AS DECIMAL(38,0)) * sy) * 100) "
            " * ((CAST(n AS DECIMAL(38,0)) * sxy "
            "  - CAST(sx AS DECIMAL(38,0)) * sy) * 100) "
            "div ((CAST(n AS DECIMAL(38,0)) * sxx "
            "  - CAST(sx AS DECIMAL(38,0)) * sx) "
            " * (CAST(n AS DECIMAL(38,0)) * syy "
            "  - CAST(sy AS DECIMAL(38,0)) * sy)) AS BIGINT)"
        ).alias("r2_bp"),
    )


@register(
    "e25_session_path_trigrams",
    """
    WITH lagged AS (
      SELECT user_id, ts, event_id, event_type,
             epoch_ms(ts) // 1000
               - epoch_ms(LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) // 1000 AS gap
      FROM events
    ),
    seq AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM lagged
    ),
    tri AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER w AS b,
             LEAD(event_type, 2) OVER w AS c
      FROM seq
      WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT a || '>' || b || '>' || c AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tri
    WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc="Session path mining: the 10 most common within-session "
    "event-type trigrams (gap-sessionized at 30 minutes, e03 "
    "semantics; LEADs are windowed by (user, session) so paths never "
    "cross a session boundary). The sequence-pattern question behind "
    "funnel discovery — which 3-step behaviors actually happen — as "
    "two user-keyed windows and one path aggregation; path "
    "cardinality is bounded by |types|^3 regardless of volume.",
)
def e25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wu))).alias("gap"),
    )
    seq = lagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0))
        .over(wu)
        .alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = seq.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(ws).alias("b"),
        F.lead("event_type", 2).over(ws).alias("c"),
    )
    return (
        tri.where(F.col("b").isNotNull() & F.col("c").isNotNull())
        .select(F.concat_ws(">", "a", "b", "c").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "e26_user_lifespan_survival",
    """
    WITH per_user AS (
      SELECT user_id,
             date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               AS lifespan
      FROM events GROUP BY user_id
    ),
    lc AS (
      SELECT lifespan, CAST(COUNT(*) AS BIGINT) AS cnt FROM per_user GROUP BY lifespan
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_users FROM lc),
    grid AS (SELECT CAST(UNNEST(generate_series(0, 13)) AS BIGINT) AS k)
    SELECT g.k,
           CAST(COALESCE(SUM(CASE WHEN lc.lifespan >= g.k THEN lc.cnt END), 0)
                AS BIGINT) AS survivors,
           CAST(COALESCE(SUM(CASE WHEN lc.lifespan >= g.k THEN lc.cnt END), 0)
                * 10000 // (SELECT NULLIF(n_users, 0) FROM tot) AS BIGINT)
             AS survival_bp
    FROM grid g LEFT JOIN lc ON TRUE
    GROUP BY g.k
    ORDER BY g.k
    """,
    doc="User lifespan survival curve S(k) = share of users still "
    "active k or more days after their first event, for k in 0..13 — "
    "the churn statistic behind retention dashboards (e11's cohort "
    "grid answers WHO returns each week; this answers HOW LONG users "
    "stay, as a single monotone curve). Exact integer arithmetic: "
    "lifespans come from one per-user min/max aggregation, the curve "
    "is computed on the bounded lifespan histogram (days-domain rows, "
    "never users) crossed with a 14-row grid, shares in basis points "
    "by floor division. Scale: one user-keyed shuffle; everything "
    "after is KB-sized.",
)
def e26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date")))
        .cast("long")
        .alias("lifespan")
    )
    lc = per_user.groupBy("lifespan").agg(F.count(F.lit(1)).alias("cnt"))
    tot = lc.agg(F.sum("cnt").alias("n_users"))
    grid = spark.range(0, 14).select(F.col("id").alias("k"))
    joined = grid.join(F.broadcast(lc), F.lit(True), "left")
    return (
        joined.groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("lifespan") >= F.col("k"), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("survivors")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "survivors",
            F.expr("CAST(survivors * 10000 div nullif(n_users, 0) AS BIGINT)").alias(
                "survival_bp"
            ),
        )
        .orderBy("k")
    )


@register(
    "e27_three_step_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT s.user_id, s.t_signup, MIN(e.ts) AS t_click
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'click'
       AND e.ts >= s.t_signup
       AND e.ts <= s.t_signup + INTERVAL 72 HOUR
      GROUP BY s.user_id, s.t_signup
    ),
    p AS (
      SELECT c.user_id, MIN(e.ts) AS t_purchase
      FROM c JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= c.t_click
       AND e.ts <= c.t_click + INTERVAL 72 HOUR
      GROUP BY c.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_72h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_72h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) * 10000
             // NULLIF((SELECT CAST(COUNT(*) AS BIGINT) FROM s), 0)
             AS full_funnel_bp
    """,
    doc="Three-step windowed funnel: signup -> first click within 72h "
    "-> first purchase within 72h of that click, counted per step "
    "with the end-to-end conversion in basis points (floor division, "
    "exact). e04's two-step funnel checks ordering only; this one "
    "enforces per-step time WINDOWS anchored at the previous step's "
    "first qualifying event — the standard product-analytics funnel "
    "definition. Plan: each step is a user-keyed join against the "
    "events relation restricted to one type (time predicates ride "
    "the join), so the shuffles carry step-qualified users, never "
    "event x event pairs; step relations shrink monotonically.",
)
def e27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    c = (
        s.join(
            clicks,
            (F.col("user_id") == F.col("c_uid"))
            & (F.col("c_ts") >= F.col("t_signup"))
            & (F.col("c_ts") <= F.col("t_signup") + F.expr("INTERVAL 72 HOURS")),
        )
        .groupBy("user_id", "t_signup")
        .agg(F.min("c_ts").alias("t_click"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    p = (
        c.join(
            purchases,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("p_ts") >= F.col("t_click"))
            & (F.col("p_ts") <= F.col("t_click") + F.expr("INTERVAL 72 HOURS")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("t_purchase"))
    )
    ns = s.agg(F.count(F.lit(1)).alias("n_signup"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_72h"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_72h"))
    return (
        ns.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_signup",
            "n_click_72h",
            "n_purchase_72h",
            F.expr("n_purchase_72h * 10000 div nullif(n_signup, 0)").alias(
                "full_funnel_bp"
            ),
        )
    )
