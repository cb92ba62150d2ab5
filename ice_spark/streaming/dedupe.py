"""Streaming deduplication — online exact dedup for ingest pipelines.

At 100 TB/day you dedup AT INGEST, not in nightly batches. Two modes:

- dedup_stream: Spark's built-in stateful dropDuplicates on a
  fingerprint column, optionally bounded by a watermark
  (dropDuplicatesWithinWatermark) so state doesn't grow unboundedly —
  the right default when near-duplicates arrive close in time.
- The fingerprint is the portable polynomial hash
  (functions.text.char_hash) so the same identity is used by the
  batch dedup operators — a doc deduped online won't reappear in the
  batch pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ice_spark.functions.text import char_hash


def with_fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    return df.withColumn(out_col, char_hash(F.col(text_col)))


def dedup_stream(
    stream: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate documents from a stream by content fingerprint.

    With ts_col, state is bounded by the watermark (duplicates farther
    apart than the watermark may both pass — the batch pass catches
    them). Without, state grows with distinct fingerprints (exact, for
    bounded streams/tests).
    """
    fp = with_fingerprint(stream, text_col)
    if ts_col is not None:
        return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return fp.dropDuplicates(["fingerprint"])
