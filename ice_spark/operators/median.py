"""Exact distributed median via two-pass bucket narrowing.

The scale problem with an exact median is the global sort: a total
order of 100 TB funnels through a single range-partitioned sort. The
classic shared-nothing answer (used here) narrows instead:

1. histogram the values into fixed-width buckets — a keyed, map-side-
   combinable aggregation whose output is bounded by domain/width
   rows, not data rows;
2. locate the bucket containing the target rank from the running sum
   of the (tiny) bucket relation;
3. re-scan only that bucket's rows (a selective range predicate that
   file-level min/max stats prune when the layout is sorted or
   z-ordered on the column) and walk the exact value.

The returned row also certifies itself: conditional aggregates prove
count(<= median) >= k and count(< median) < k in the same query.

Non-negative integer inputs only (integer `div` and `//` agree there;
quantize doubles to cents/micro-units first — see queries/helpers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET_W = 65536


def exact_median(df: DataFrame, col: str, bucket_w: int = DEFAULT_BUCKET_W) -> DataFrame:
    """One-row DataFrame: (n, target_rank, median_bucket, bucket_count,
    median_cents, n_le, n_lt, rank_certified) for the lower median of
    the non-negative integer column `col`."""
    c = df.select(F.col(col).cast("long").alias("cents")).cache()
    st = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("(count(*) + 1) div 2").alias("k"),
    )
    b = c.groupBy(F.expr(f"cents div {bucket_w}").alias("bkt")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = b.select("bkt", "cnt", F.sum("cnt").over(wb).alias("cum"))
    sel = (
        cum.crossJoin(F.broadcast(st))
        .where(F.col("cum") >= F.col("k"))
        .orderBy("bkt")
        .limit(1)
        .select(
            "bkt",
            (F.col("cum") - F.col("cnt")).alias("below"),
            F.col("cnt").alias("bucket_count"),
        )
    )
    within = (
        c.join(F.broadcast(sel), F.expr(f"cents div {bucket_w}") == F.col("bkt"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wcum = within.select("cents", F.sum("vcnt").over(wc).alias("wc"))
    med = (
        wcum.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(sel.select(F.col("below").alias("s_below"))))
        .where(F.col("wc") >= F.col("k") - F.col("s_below"))
        .orderBy("cents")
        .limit(1)
        .select(F.col("cents").alias("median_cents"))
    )
    audit = c.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(F.col("cents") <= F.col("median_cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_le"),
        F.sum(F.when(F.col("cents") < F.col("median_cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_lt"),
    )
    return (
        st.crossJoin(sel)
        .crossJoin(med)
        .crossJoin(audit)
        .select(
            "n",
            F.col("k").alias("target_rank"),
            F.col("bkt").alias("median_bucket"),
            "bucket_count",
            "median_cents",
            "n_le",
            "n_lt",
            ((F.col("n_le") >= F.col("k")) & (F.col("n_lt") < F.col("k"))).alias(
                "rank_certified"
            ),
        )
    )


def exact_group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: list[tuple[str, float]],
) -> DataFrame:
    """Exact interpolated percentiles per group WITHOUT a buffering
    aggregate — the scale-safe replacement for `F.percentile`, whose
    implementation holds a per-group value-count map in executor
    memory (the r11 honest probe OOM'd an 8g heap computing three
    percentiles over sf10's 60M-row lineitem that count()-probing had
    silently pruned for two rounds).

    Shape: one (group, value) keyed aggregation (map-side combinable;
    output bounded by the DISTINCT value domain, not data rows), one
    per-group running sum over that bounded relation, then rank
    bracketing + linear interpolation — `lower*(1-frac) + upper*frac`,
    the exact arithmetic Spark's Percentile.getPercentile applies
    (verified bit-for-bit vs F.percentile; the algebraically-equal
    `lower + frac*(upper-lower)` differs in the last ulp). Per-group parallelism of the running sum is one task
    per group over distinct values only; memory is bounded (window
    sort spills).

    percentiles: [(output_alias, p)] with 0 <= p <= 1.
    """
    # F.percentile SKIPS null values: count only non-null (F.count(col)
    # ignores nulls) and exclude null rows from the value-count
    # relation. Groups whose values are ALL null still appear in the
    # output with a null percentile (right join below), matching
    # F.percentile exactly on nullable columns.
    vc = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    n = df.groupBy(group_col).agg(F.count(value_col).alias("__n"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.select(
        group_col, value_col, "__c", F.sum("__c").over(w).alias("__cum")
    )
    # group-keyed join: the group relation grows with the corpus, so
    # no broadcast hint (AQE still broadcasts it while it's small).
    # Right join keeps all-null groups (absent from vc/cum) so they
    # emit a null percentile instead of vanishing. eqNullSafe so a
    # NULL group KEY (a real group to both groupBy and F.percentile)
    # matches its own cum rows instead of falling out of the join.
    cum_a, n_a = cum.alias("__pct_cum"), n.alias("__pct_n")
    j = cum_a.join(
        n_a,
        F.col(f"__pct_cum.{group_col}").eqNullSafe(
            F.col(f"__pct_n.{group_col}")
        ),
        "right",
    ).select(
        F.col(f"__pct_n.{group_col}").alias(group_col),
        F.col(f"__pct_cum.{value_col}").alias(value_col),
        "__c",
        "__cum",
        "__n",
    )
    v = F.col(value_col).cast("double")
    aggs = []
    for alias, p in percentiles:
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        lo = F.floor(pos).cast("long")
        hi = F.ceiling(pos).cast("long")
        prev = F.col("__cum") - F.col("__c")
        v_lo = F.max(F.when((prev <= lo) & (lo < F.col("__cum")), v))
        v_hi = F.max(F.when((prev <= hi) & (hi < F.col("__cum")), v))
        frac = F.max(pos - F.floor(pos))
        aggs.append(
            (v_lo * (F.lit(1.0) - frac) + v_hi * frac).alias(alias)
        )
    return j.groupBy(group_col).agg(*aggs)
