"""Scalar-function library coverage: strings, dates, arrays, maps,
JSON, conditionals, statistics, join shapes.

The reference has no scalar function surface at all (SURVEY.md §2.8)
— in the rebuild these come from Spark SQL; each query here pins one
family's semantics against the DuckDB oracle so the library is
demonstrably complete, not just available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.helpers import cents, dsum
from ice_spark.queries.registry import register
from ice_spark.tables import load_table


@register(
    "f01_string_functions",
    """
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTRING(c_name, 10, 9) AS cust_num,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           CASE WHEN c_name LIKE '%000001%' THEN 1 ELSE 0 END AS has_1k_pattern,
           regexp_extract(c_name, '[0-9]+', 0) AS digits,
           LTRIM(RTRIM(CONCAT(' ', c_mktsegment, ' '))) AS trimmed
    FROM customer
    WHERE c_custkey < 50
    """,
    doc="String functions: upper/lower/substring/length/concat/replace/"
    "like/regexp_extract/trim.",
)
def f01(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.when(F.col("c_name").like("%000001%"), 1).otherwise(0).alias("has_1k_pattern"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" ")))).alias(
            "trimmed"
        ),
    )


@register(
    "f02_date_functions",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mon,
           EXTRACT(day FROM o_orderdate) AS dom,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow_sunday0,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_date,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    WHERE o_orderkey < 40
    """,
    doc="Date/time functions: extract, format, interval arithmetic, "
    "datediff, quarter truncation.",
)
def f02(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 40)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sunday0"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


@register(
    "f03_array_functions",
    """
    SELECT label,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
           len(list_filter(embedding, v -> v > 0)) AS n_positive,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(list_slice(embedding, 1, 4), v -> CAST(v AS DOUBLE))),
                 (a, b) -> a + b), 6) AS head_sum
    FROM embeddings
    WHERE vec_id < 30
    """,
    doc="Array functions: size, index, min/max, filter, slice, fold.",
)
def f03(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 30)
    return e.select(
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.size(F.filter("embedding", lambda v: v > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 4),
                F.lit(0.0),
                lambda a, v: a + v.cast("double"),
            ),
            6,
        ).alias("head_sum"),
    )


@register(
    "f04_stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(CAST(stddev_samp(l_quantity) AS DOUBLE), 6) AS qty_stddev,
           ROUND(CAST(var_samp(l_quantity) AS DOUBLE), 4) AS qty_var,
           ROUND(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 6) AS qty_price_corr,
           ROUND(CAST(covar_samp(l_quantity, l_discount) AS DOUBLE), 6) AS qty_disc_covar,
           ROUND(CAST(skewness(l_extendedprice) * (COUNT(*) - 2)
                      / sqrt(COUNT(*) * (COUNT(*) - 1.0)) AS DOUBLE), 4) AS price_skew
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/corr/covar/skewness "
    "(rounded: variance accumulation differs in last ulps across engines); "
    "the oracle rescales DuckDB's sample-adjusted skewness to Spark's "
    "population skewness ((n-2)/sqrt(n(n-1)))).",
)
def f04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
        F.round(F.skewness("l_extendedprice"), 4).alias("price_skew"),
    )


@register(
    "f05_join_shapes",
    """
    WITH with_orders AS (
      SELECT n_name, COUNT(o_orderkey) AS n_orders
      FROM nation
      LEFT OUTER JOIN customer ON n_nationkey = c_nationkey
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY n_name
    ),
    no_supplier AS (
      SELECT n_nationkey FROM nation
      WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
    )
    SELECT w.n_name, w.n_orders,
           CASE WHEN ns.n_nationkey IS NOT NULL THEN 1 ELSE 0 END AS lacks_supplier
    FROM with_orders w
    JOIN nation n ON w.n_name = n.n_name
    LEFT OUTER JOIN no_supplier ns ON n.n_nationkey = ns.n_nationkey
    """,
    doc="Join shapes: left outer chain, anti-join (NOT EXISTS), "
    "null-producing outer join flags.",
)
def f05(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    with_orders = (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_outer")
        .join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("n_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    no_supplier = nation.join(
        supp, nation.n_nationkey == supp.s_nationkey, "left_anti"
    ).select(F.col("n_nationkey").alias("ns_key"))
    nation2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("n2_name"), F.col("n_nationkey").alias("n2_key")
    )
    return (
        with_orders.join(nation2, with_orders.n_name == F.col("n2_name"))
        .join(F.broadcast(no_supplier), F.col("n2_key") == F.col("ns_key"), "left_outer")
        .select(
            "n_name",
            "n_orders",
            F.when(F.col("ns_key").isNotNull(), 1).otherwise(0).alias("lacks_supplier"),
        )
    )


@register(
    "f06_conditional_null_handling",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           CAST(SUM(GREATEST(CAST(ROUND(o_totalprice * 100) AS BIGINT) - 25000000,
                             CAST(0 AS BIGINT))) AS BIGINT)
             AS excess_over_250k_cents,
           CAST(SUM(LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT),
                          CAST(10000000 AS BIGINT))) AS BIGINT)
             AS capped_at_100k_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Conditionals/null handling: CASE, COALESCE, NULLIF, "
    "GREATEST/LEAST. Money paths are exact BIGINT cents end-to-end "
    "(quantize once, clamp and sum in BIGINT, never convert back to "
    "DOUBLE) so neither engine emits a float anywhere: after three "
    "rounds of driver-vs-local hash flake on the DOUBLE/decimal output "
    "forms, the output itself is integer and format-stable.",
)
def f06(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tp_cents = cents(F.col("o_totalprice"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias("n_big"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
        F.sum(F.greatest(tp_cents - F.lit(25000000), F.lit(0).cast("long"))).alias(
            "excess_over_250k_cents"
        ),
        F.sum(F.least(tp_cents, F.lit(10000000).cast("long"))).alias(
            "capped_at_100k_cents"
        ),
    )


@register(
    "f07_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           ROUND(POWER(l_quantity, 2), 2) AS qty_sq,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           ABS(l_discount - 0.05) AS disc_dist,
           MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7
    FROM lineitem
    WHERE l_orderkey < 10
    """,
    doc="Math functions: sqrt/ln/log10/power/ceil/floor/abs/mod "
    "(IEEE-deterministic per row in both engines).",
)
def f07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 10)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@register(
    "f08_in_subqueries",
    """
    SELECT p_type, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
      )
      AND p_size NOT IN (1, 2, 3)
    GROUP BY p_type
    """,
    doc="IN / NOT IN subqueries (semi join + literal exclusion).",
)
def f08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    heavy = li.select(F.col("l_partkey")).distinct()
    return (
        part.join(heavy, part.p_partkey == heavy.l_partkey, "left_semi")
        .where(~F.col("p_size").isin(1, 2, 3))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
    )


@register(
    "f09_regexp_functions",
    """
    SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           COUNT(*) AS n_parts,
           COUNT(*) FILTER (WHERE regexp_matches(p_name, 'red|blue'))
             AS n_colored,
           CAST(SUM(length(regexp_replace(p_name, '[aeiou]', '', 'g')))
                AS BIGINT) AS consonant_chars
    FROM part
    GROUP BY 1
    """,
    doc="Regexp scalar family: extract (capture group), boolean match, "
    "global replace - all JVM-side codegen expressions, no UDFs.",
)
def f09(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.groupBy(
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(
            F.when(F.col("p_name").rlike("red|blue"), 1).otherwise(0)
        ).alias("n_colored"),
        F.sum(F.length(F.regexp_replace("p_name", "[aeiou]", "")))
        .cast("long")
        .alias("consonant_chars"),
    )


@register(
    "f10_string_shaping",
    """
    SELECT p_brand,
           COUNT(*) AS n,
           MIN(lpad(CAST(p_partkey AS VARCHAR), 10, '0')) AS min_padded_key,
           MAX(reverse(p_name)) AS max_reversed,
           CAST(SUM(length(translate(p_name, 'aeiou', '.....'))) AS BIGINT)
             AS total_translated_len,
           MAX(repeat(substring(p_type, 1, 3), 2)) AS max_type_echo
    FROM part
    GROUP BY p_brand
    """,
    doc="String shaping family: lpad (zero-padded sortable keys), "
    "reverse, translate, repeat, substring — all JVM codegen "
    "expressions with identical semantics in DuckDB.",
)
def f10(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.lpad(F.col("p_partkey").cast("string"), 10, "0")).alias("min_padded_key"),
        F.max(F.reverse("p_name")).alias("max_reversed"),
        F.sum(F.length(F.translate("p_name", "aeiou", ".....")))
        .cast("long")
        .alias("total_translated_len"),
        F.max(F.repeat(F.substring("p_type", 1, 3), 2)).alias("max_type_echo"),
    )


@register(
    "f11_bitwise_functions",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS k_and,
           o_orderkey | 4096 AS k_or,
           xor(o_orderkey, 1023) AS k_xor,
           (o_orderkey << 3) & 1048575 AS k_shl_masked,
           o_orderkey >> 2 AS k_shr,
           CAST(bit_count(o_orderkey) AS INT) AS k_popcount
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc="Bitwise operators: AND/OR/XOR, shifts, population count — "
    "exact integer semantics in both engines.",
)
def f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(1023)).alias("k_xor"),
        F.shiftleft(k, 3).bitwiseAND(F.lit(1048575)).alias("k_shl_masked"),
        F.shiftright(k, 2).alias("k_shr"),
        F.bit_count(k).alias("k_popcount"),
    ).orderBy("o_orderkey")


@register(
    "f12_filtered_aggregates",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents,
           CAST(COALESCE(MIN(o_orderkey) FILTER (WHERE o_orderdate >= DATE '1997-01-01'), -1)
                AS BIGINT) AS min_key_recent,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
                AS BIGINT) AS big_spenders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="FILTER-clause aggregates (conditional count/sum/min/distinct "
    "in one pass over the fact table — one shuffle for all five).",
)
def f12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents_expr = cents(F.col("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", cents_expr))
        .cast("long")
        .alias("open_cents"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"),
                    F.col("o_orderkey"),
                )
            ),
            F.lit(-1).cast("long"),
        )
        .cast("long")
        .alias("min_key_recent"),
        F.count_distinct(
            F.when(F.col("o_totalprice") > 100000, F.col("o_custkey"))
        )
        .cast("long")
        .alias("big_spenders"),
    )


@register(
    "f13_array_ordinality",
    """
    WITH arr AS (
      SELECT l_orderkey,
             array_agg(l_linenumber
                       ORDER BY l_linenumber,
                                CAST(ROUND(l_quantity) AS BIGINT)) AS lns,
             array_agg(CAST(ROUND(l_quantity) AS BIGINT)
                       ORDER BY l_linenumber,
                                CAST(ROUND(l_quantity) AS BIGINT)) AS qtys
      FROM lineitem
      WHERE l_orderkey <= 2000
      GROUP BY 1
    )
    SELECT l_orderkey,
           t.i AS pos,
           lns[t.i] AS linenumber,
           qtys[t.i] AS qty,
           CAST(t.i AS BIGINT) * qtys[t.i] AS pos_weighted_qty
    FROM arr, UNNEST(generate_series(1, len(lns))) AS t(i)
    """,
    doc="Ordered array aggregation round trip: per-order arrays built "
    "with an explicit ORDER BY inside the aggregate (sort_array over "
    "structs in Spark — collect_list alone has no ordering "
    "guarantee), then re-flattened WITH ORDINALITY (posexplode). "
    "(l_linenumber is not unique per order in this data, so the sort "
    "key is the full (linenumber, qty) pair — a total order in both "
    "engines.) Covers the lateral-unnest shape training pipelines use for "
    "token/array columns; map-only after one keyed aggregation.",
)
def f13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.round("l_quantity").cast("long").alias("qty"),
                )
            )
        ).alias("pairs")
    )
    ex = arr.select(
        "l_orderkey", F.posexplode("pairs").alias("pos0", "pair")
    )
    return ex.select(
        "l_orderkey",
        (F.col("pos0") + 1).alias("pos"),
        F.col("pair.ln").alias("linenumber"),
        F.col("pair.qty").alias("qty"),
        ((F.col("pos0") + 1).cast("long") * F.col("pair.qty")).alias(
            "pos_weighted_qty"
        ),
    )


@register(
    "a06_grouping_id_rollup",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    doc="GROUPING() indicator functions over ROLLUP: distinguishes "
    "'aggregated-away' from a genuine NULL group value — the standard "
    "way BI layers label subtotal rows. One shuffle (rollup expands "
    "map-side).",
)
def a06(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


@register(
    "f14_try_functions",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(*) FILTER (
             WHERE CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   / NULLIF(CAST(ROUND(l_quantity) AS BIGINT) - 30, 0) IS NULL
           ) AS n_div_by_zero,
           COUNT(*) FILTER (
             WHERE TRY_CAST(l_linestatus AS INTEGER) IS NULL
           ) AS n_unparsed,
           CAST(SUM(COALESCE(TRY_CAST(SUBSTRING(l_returnflag, 1, 1) AS INTEGER), 0))
                AS BIGINT) AS parsed_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Null-safe 'try' function family: try_divide (divide-by-zero "
    "-> NULL, counted via the qty=30 rows), try_cast on unparseable "
    "strings. Spark's try_* maps to DuckDB's NULLIF-division and "
    "TRY_CAST — same null semantics, pinned by the oracle. Map-only "
    "plus one aggregation. The try_casts run AFTER a "
    "(returnflag, linestatus) pre-aggregate: a failing try_cast "
    "throws and catches a JVM exception per evaluation, and both "
    "cast inputs here never parse ('A'/'N'/'R', 'O'/'F'), so the "
    "per-row form paid exception unwinding on every row — 15x at "
    "sf0.1 (11.7s -> 0.7s), identical output since every try-family "
    "column is a function of the two group keys alone.",
)
def f14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    div = F.try_divide(
        cents(F.col("l_extendedprice")),
        F.round("l_quantity").cast("long") - F.lit(30),
    )
    # Stage 1: per-row work keyed on the tiny (flag, status) domain —
    # try_divide stays per-row (its null-ness depends on l_quantity).
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.when(div.isNull(), 1)).alias("dz"),
    )
    # Stage 2: the string try_casts evaluate once per group (~6 rows),
    # not once per lineitem row; counts recombine exactly.
    return pre.groupBy("l_returnflag").agg(
        F.sum("cnt").alias("n"),
        F.sum("dz").alias("n_div_by_zero"),
        F.sum(
            F.when(
                F.expr("try_cast(l_linestatus AS INT)").isNull(), F.col("cnt")
            ).otherwise(F.lit(0))
        ).alias("n_unparsed"),
        F.sum(
            F.col("cnt")
            * F.coalesce(
                F.expr("try_cast(substring(l_returnflag, 1, 1) AS INT)"),
                F.lit(0),
            )
        ).alias("parsed_sum"),
    )


@register(
    "f15_map_functions",
    """
    WITH per_status AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses_csv,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'O' THEN cnt END), 0)
             AS open_cnt,
           CAST(COUNT(*) FILTER (WHERE cnt > 100) AS BIGINT) AS n_big_statuses,
           CAST(SUM(cnt * 2) AS BIGINT) AS doubled_total
    FROM per_status
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Map-function family over a status->count map per priority: "
    "map_from_entries(collect set), map_keys + array_sort + "
    "array_join, element_at lookup, map_filter by value, "
    "transform_values, and aggregate over map_values. The oracle "
    "computes the same facts relationally — pinning that Spark's map "
    "ops preserve the underlying multiset exactly. Map-only plus two "
    "aggregations; maps stay bounded (statuses per priority), never "
    "keyed by high-cardinality values.",
)
def f15(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_status.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("status_map")
    )
    return (
        m.select(
            "o_orderpriority",
            F.array_join(F.array_sort(F.map_keys("status_map")), ",").alias(
                "statuses_csv"
            ),
            F.coalesce(F.element_at("status_map", "O"), F.lit(0)).alias("open_cnt"),
            F.expr(
                "CAST(size(map_filter(status_map, (k, v) -> v > 100)) AS BIGINT)"
            ).alias("n_big_statuses"),
            F.expr(
                "aggregate(map_values(transform_values(status_map, (k, v) -> v * 2)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("doubled_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "f16_higher_order_arrays",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           len(t) AS n_toks,
           len(list_distinct(t)) AS n_unique,
           len(list_filter(t, x -> length(x) > 5)) > 0 AS has_long,
           len(list_filter(t, x -> length(x) >= 10)) = 0 AS all_short,
           list_sort(list_distinct(t))[1:3] AS head_sorted,
           list_sort(list_intersect(list_distinct(t),
                                    ['data', 'join', 'the'])) AS common_ops,
           list_transform(generate_series(1, least(3, len(t))),
                          i -> CAST(i AS VARCHAR) || ':' || t[i]) AS indexed_head
    FROM toks
    """,
    doc="Higher-order array-function family over tokenized documents: "
    "exists / forall (as filtered-length predicates so both engines "
    "share semantics), distinct + sort + slice, set intersection "
    "against a literal array (sorted — list_intersect order is "
    "engine-defined), and index-aware transform building 'i:token' "
    "pairs. All map-only JVM expressions on Spark (no shuffle, no "
    "Python); complements f03's filter/slice/fold coverage.",
)
def f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    t = tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t"))
    return d.select(
        "doc_id",
        F.size("t").alias("n_toks"),
        F.size(F.array_distinct("t")).alias("n_unique"),
        F.exists("t", lambda x: F.length(x) > 5).alias("has_long"),
        F.forall("t", lambda x: F.length(x) < 10).alias("all_short"),
        F.slice(F.array_sort(F.array_distinct("t")), 1, 3).alias("head_sorted"),
        F.array_sort(
            F.array_intersect(F.array_distinct("t"), F.array(F.lit("data"), F.lit("join"), F.lit("the")))
        ).alias("common_ops"),
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(3), F.size("t"))),
            lambda i: F.concat(i.cast("string"), F.lit(":"), F.element_at("t", i)),
        ).alias("indexed_head"),
    )


_F17_SQL = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM {o} o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
            ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_urgent,
       CAST(SUM(CASE WHEN NOT EXISTS (
              SELECT 1 FROM {o} o WHERE o.o_custkey = c.c_custkey
            ) THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
       CAST(MAX((SELECT MAX(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 FROM {o} o WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
         AS max_single_order_cents
FROM {c} c JOIN {n} n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register(
    "f17_correlated_subqueries",
    _F17_SQL.format(c="customer", o="orders", n="nation"),
    doc="Correlated-subquery surface, deliberately written as SQL and "
    "run through spark.sql(): EXISTS, NOT EXISTS, and a correlated "
    "scalar MAX per customer, rolled up per nation. Catalyst "
    "decorrelates all three into joins (semi, anti, and an "
    "aggregate-then-join) — the same physical shapes the DataFrame "
    "queries pin — so the 'subquery per row' a user writes never "
    "executes as N scans. The oracle is the IDENTICAL SQL text on "
    "DuckDB modulo view names; exact integer cents via ROUND*100.",
)
def f17(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"f17_{t}")
    return spark.sql(_F17_SQL.format(c="f17_customer", o="f17_orders", n="f17_nation"))
