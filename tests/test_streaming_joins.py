"""Stream-stream interval join vs its batch equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    from ice_spark.tables import load_table

    d = str(tmp_path / "stream_in")
    load_table(spark, sf_dir, "events").write.parquet(d)
    schema = spark.read.parquet(d).schema
    return d, schema


def _batch_expected(spark, d):
    ev = spark.read.parquet(d)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("click_ts") > F.col("purchase_ts") - F.expr("interval 30 minutes"))
            & (F.col("click_ts") <= F.col("purchase_ts")),
        )
        .select("user_id", "click_ts", "purchase_ts")
        .collect()
    )


def test_interval_join_matches_batch(spark, events_stream_dir, tmp_path):
    from ice_spark.streaming.joins import click_purchase_attribution

    d, schema = events_stream_dir
    stream = spark.readStream.schema(schema).parquet(d)
    joined = click_purchase_attribution(stream, window="30 minutes", watermark="2 hours")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.click_ts, r.purchase_ts)
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r.user_id, r.click_ts, r.purchase_ts)
        for r in _batch_expected(spark, d)
    }
    # inner stream-stream join with availableNow emits every match
    # whose state was still live; with a watermark generously past the
    # data span, ALL matches must appear exactly once
    assert got == expected
    assert len(got) > 0


def test_interval_join_plan_is_streaming_symmetric_hash(spark, events_stream_dir):
    from ice_spark.streaming.joins import click_purchase_attribution

    d, schema = events_stream_dir
    stream = spark.readStream.schema(schema).parquet(d)
    joined = click_purchase_attribution(stream)
    # analyzed plan must be a streaming join with watermarks on both sides
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    assert joined.isStreaming


def test_enrich_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment == the same batch join, including
    events whose key has no dim row (left-join nulls)."""
    from ice_spark.streaming.joins import enrich_stream
    from ice_spark.tables import load_table

    batch = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "ev_stream")
    batch.coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema

    # Dim: event_type -> weight; one type deliberately missing.
    types = [r[0] for r in batch.select("event_type").distinct().collect()]
    dim = spark.createDataFrame(
        [(t, i * 10) for i, t in enumerate(sorted(types)[:-1])],
        ["event_type", "weight"],
    )

    stream = spark.readStream.schema(schema).parquet(d)
    out = str(tmp_path / "enriched")
    q = (
        enrich_stream(stream, dim, key="event_type")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.read.parquet(out)
        .groupBy("event_type", "weight")
        .count()
        .collect()
    )
    want = (
        batch.join(dim, "event_type", "left")
        .groupBy("event_type", "weight")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # The missing-dim type survived with a null weight.
    assert any(w is None for _, w, _ in map(tuple, got))
