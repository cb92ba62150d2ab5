"""Streaming dedup: duplicates across micro-batches are dropped."""

from __future__ import annotations


def test_stream_dedup_across_batches(spark, tmp_path):
    from ice_spark.streaming.dedupe import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two docs; batch 2 re-sends doc A plus one new doc
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = str(tmp_path / "out")
    q = (
        dedup_stream(stream, "text")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    # same fingerprint identity as the batch dedup operators
    from ice_spark.functions.text import char_hash
    from pyspark.sql import functions as F

    batch_fp = {
        r.fp
        for r in spark.createDataFrame([("alpha beta",)], "text string")
        .select(char_hash(F.col("text")).alias("fp"))
        .collect()
    }
    stream_fp = {r.fingerprint for r in rows if r.text == "alpha beta"}
    assert stream_fp == batch_fp
