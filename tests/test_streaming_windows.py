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


def test_session_window_builtin_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    """The built-in session_window streaming aggregation produces the
    same sessions as (a) the identical batch aggregation and (b) the
    lag-based batch sessionization (e03 semantics): session count and
    event totals per user agree."""
    from ice_spark.streaming.windows import session_window_stats
    from ice_spark.tables import load_table

    # Single part-file => one micro-batch => no cross-batch late drops
    # (multi-batch straggler dropping is covered by the windowed-counts
    # test). Append mode emits a session once the watermark passes its
    # end, so the expected set is the batch sessions minus the tail
    # still open at the final watermark (max_ts - watermark).
    batch = load_table(spark, sf_dir, "events")
    d1 = str(tmp_path / "stream_in_1f")
    batch.coalesce(1).write.parquet(d1)
    schema = spark.read.parquet(d1).schema
    stream = spark.readStream.schema(schema).parquet(d1)
    out = _run_fire_once(
        session_window_stats(stream, gap="30 minutes", watermark="1 hour"), tmp_path, "sess"
    )
    got = spark.read.parquet(out)

    want_all = (
        batch.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            F.col("sw.end").alias("end_ts"),
        )
    )
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(hours=1)
    finalized = want_all.where(F.col("end_ts") <= F.lit(wm)).drop("end_ts")
    withheld = want_all.where(F.col("end_ts") > F.lit(wm)).drop("end_ts")
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == sorted(map(tuple, finalized.collect()))
    # Emitted + withheld partitions the full batch session set.
    assert len(got_rows) + withheld.count() == want_all.count()

    # Cross-check the finalized sessions against lag-gap
    # sessionization (e03 semantics): identical (user, start, size)
    # triples for every session that closed before the watermark.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = batch.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "new_sess",
        (F.col("prev").isNull() | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800))
        .cast("long"),
    )
    sess_id = F.sum("new_sess").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    lag_sessions = (
        lagged.withColumn("sid", sess_id)
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .where(F.col("last_ts") + F.expr("INTERVAL 30 MINUTES") <= F.lit(wm))
        .select("user_id", "session_start", "n_events")
    )
    got_triples = sorted((r[0], r[1], r[3]) for r in got_rows)
    assert got_triples == sorted(map(tuple, lag_sessions.collect()))
