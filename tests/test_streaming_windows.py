"""Streaming event-time operators: watermarked windows and stateful
sessionization, driven through real readStream file sources. Batch
equivalents (e02/e03) are the correctness oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    """events table rewritten as a stream-source directory with proper
    timestamps (stream source needs a fixed schema; ts arrives as
    TIMESTAMP after the nanos conversion in load_table)."""
    from ice_spark.tables import load_table

    d = str(tmp_path / "stream_in")
    load_table(spark, sf_dir, "events").write.parquet(d)
    schema = spark.read.parquet(d).schema
    return d, schema


def _run_fire_once(stream_df, tmp_path, name):
    out = str(tmp_path / f"out_{name}")
    ckpt = str(tmp_path / f"ckpt_{name}")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_windowed_counts_match_batch(spark, sf_dir, events_stream_dir, tmp_path):
    from ice_spark.queries.registry import load_all
    from ice_spark.streaming.windows import windowed_event_counts

    d, schema = events_stream_dir
    stream = spark.readStream.schema(schema).parquet(d)
    windowed = windowed_event_counts(stream, window_duration="6 hours", watermark="1 hour")
    out = _run_fire_once(windowed, tmp_path, "win")
    got = (
        spark.read.parquet(out)
        .groupBy("window_start")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    batch = load_all()["e02_tumbling_window_6h"].spark_fn(spark, sf_dir).collect()
    batch_by_win = {r.window_start: r.n_events for r in batch}
    got_by_win = {r.window_start: r.n for r in got}
    # append mode emits a window only after the watermark passes its
    # end — the final window stays open, everything else must match
    missing = set(batch_by_win) - set(got_by_win)
    assert missing == {max(batch_by_win)}
    for k, v in got_by_win.items():
        assert v == batch_by_win[k]


def test_stateful_sessionization_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    from ice_spark.queries.registry import load_all
    from ice_spark.streaming.windows import sessionize_stream

    d, schema = events_stream_dir
    stream = spark.readStream.schema(schema).parquet(d)
    sessions = sessionize_stream(stream, gap="30 minutes")
    out_dir = str(tmp_path / "out_sess")
    ckpt = str(tmp_path / "ckpt_sess")

    # update-mode stateful stream → collect final per-user state via
    # foreachBatch (last emission per user wins)
    final: dict[int, tuple] = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            final[r.user_id] = (r.n_sessions, r.n_events)

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = load_all()["e03_sessionization"].spark_fn(spark, sf_dir).collect()
    expected = {r.user_id: (r.n_sessions, r.n_events) for r in batch}
    assert final == expected
