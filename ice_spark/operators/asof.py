"""As-of (point-in-time) join, expressed as a union + window.

Spark has no native ASOF JOIN. The naive formulation — inequality
join then pick the max — is quadratic in matches per key. The
scalable pattern is:

1. union the left (probe) and right (reference) rows, tagged;
2. single shuffle: partition by key, order by (time, tag,
   tie-breaker) — reference rows sort before probe rows at equal
   times so `ts_right <= ts_left` semantics hold;
3. `last(value, ignorenulls=True)` over the running window carries
   the most recent reference value forward;
4. keep the probe rows.

One shuffle, linear work, no skew beyond key skew (salt the key
upstream if a single key dominates). This is the same plan shape
Flink's temporal join and DuckDB's ASOF JOIN produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_breaker: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_time] <= left[left_time]`` and equal key ``on``.

    ``value_cols`` are the right columns carried over (returned with
    the same names). Rows with no match get nulls (left-outer
    semantics). ``tie_breaker``: right column ordering ties at equal
    time (max wins).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.struct(*lcols).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        (F.lit(None).cast(right.schema[tie_breaker].dataType) if tie_breaker else F.lit(0)).alias("__tb"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(tagged_left.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        (F.col(tie_breaker) if tie_breaker else F.lit(0)).alias("__tb"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__is_probe"), F.asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_probe",
        "__left",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__o_{c}")
            for c in value_cols
        ],
    )
    probe = carried.where(F.col("__is_probe") == 1)
    out_cols: list[Column] = [F.col(f"__left.{c}").alias(c) for c in lcols]
    out_cols += [F.col(f"__o_{c}").alias(c) for c in value_cols]
    return probe.select(*out_cols)
