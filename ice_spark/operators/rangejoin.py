"""Bucketized range (interval-containment) join.

`left.ts BETWEEN right.start AND right.end` is not an equi-join, so
Catalyst plans it as a broadcast-nested-loop or cartesian product —
O(|L|·|R|) and a non-starter at 100 TB. The scale path is the classic
time-bucket decomposition used by range-join optimizers (Databricks'
range-join hints, Flink's interval join):

1. pick a bucket width ~= the typical interval length;
2. explode each interval over the buckets it covers (an interval of
   length ≤ W covers ≤ 2 buckets of width W);
3. equi-join on (keys…, bucket) — a plain shuffled/broadcast hash
   join, partitioned and parallel;
4. re-apply the exact `ts ∈ [start, end)` predicate.

Each event matches an interval in exactly one bucket (the event's
own), so no dedup pass is needed. Cost is |L| + Σ⌈len/W⌉ join rows —
linear, shuffled on (keys, bucket), skew handled by AQE.

The reference has no join surface at all (SURVEY.md §2.8); this is
beyond-reference capability for event-window attribution pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join `left` rows to `intervals` rows on equal `keys` and
    `left[ts_col]` in the half-open range `[start_col, end_col)`.

    `bucket_seconds` should be on the order of the typical interval
    length: too small explodes long intervals over many buckets, too
    large puts unrelated rows in one bucket and shifts work to the
    post-join filter.
    """
    if how != "inner":
        raise ValueError("only inner range joins are supported")
    us = int(bucket_seconds) * 1_000_000

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / us)

    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                bucket_of(F.col(start_col)),
                # end is exclusive: the bucket of (end - 1µs)
                F.floor((F.unix_micros(F.col(end_col)) - 1) / us),
            )
        ),
    )
    lt = left.withColumn("__bucket", bucket_of(F.col(ts_col)))
    joined = lt.join(iv, on=[*keys, "__bucket"], how="inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
