"""Stream-stream event-time interval join.

The last flagship Structured Streaming shape the engine exposes (the
reference has no event-time processing at all, SURVEY.md §2.9):
joining two live streams — e.g. every purchase to the clicks that
preceded it within an attribution window — with BOTH sides
watermarked so the state store provably evicts: a click older than
(watermark - window) can never match a future purchase and is
dropped, keeping state bounded at any stream rate. This is the
streaming dual of the batch bucketized range join
(operators/rangejoin.py); the batch form is the correctness oracle in
tests.

Spark executes this as a streaming symmetric hash join on the equi
key with the time bound as a state-eviction condition — the time
predicate MUST be a direct range on the two event-time columns for
Spark to derive state TTLs (a wrapped/UDF'd condition silently makes
state grow forever; this module keeps the canonical form in one
place so callers can't get it wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join right-side rows to left-side rows of the same `key`
    with left_ts in (right_ts - window, right_ts]. Both inputs must be
    streaming DataFrames; columns other than the join key must be
    disjoint (rename upstream)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, f"__r_{key}"
    )
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(left_ts) > F.col(right_ts) - F.expr(f"interval {window}"))
        & (F.col(left_ts) <= F.col(right_ts))
    )
    return lw.join(rw, cond, "inner").drop(f"__r_{key}")


def click_purchase_attribution(
    stream: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribution over a single event stream (events-table schema):
    each purchase joined to the clicks of the same user within the
    preceding `window`."""
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cw = clicks.withWatermark("click_ts", watermark)
    pw = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr(f"interval {window}"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return cw.join(pw, cond, "inner").select(
        "user_id", "click_ts", "purchase_ts", "purchase_value"
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a live stream against a batch
    dimension table. Spark plans the static side as a broadcast per
    micro-batch (re-read each trigger, so slowly-changing dims pick
    up updates without restarting the query) and the stream side
    needs NO watermark — there is no streaming state at all, which
    is why this is the default way to attach dimensions at any
    stream rate. Left join keeps events whose key is missing from
    the dim (they carry nulls, not silently drop)."""
    return stream.join(F.broadcast(dim), on=key, how=how)
