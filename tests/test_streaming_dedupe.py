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


def test_span_admission_stream_grows_index(spark, tmp_path):
    """The streaming gate admits against seed + previously-admitted
    spans: a batch-2 doc duplicating a batch-1 ADMITTED doc is
    rejected even though it never appeared in the seed corpus."""
    from ice_spark.streaming.dedupe import span_admission_stream

    seed = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    fresh_y = "one two three four five six seven eight nine ten"
    fresh_w = "red orange yellow green blue indigo violet ultra infra deep"
    b1 = [
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # = seed: reject
        (11, fresh_y),  # admit
    ]
    b2 = [
        (20, fresh_y),  # = admitted 11: reject (index GREW)
        (21, fresh_w),  # admit
    ]
    src = tmp_path / "src"
    src.mkdir()
    dest = str(tmp_path / "dest")
    idxd = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = span_admission_stream(
            stream, dest, idxd, ckpt, seed_corpus=seed
        )
        q.awaitTermination()

    spark.createDataFrame(b1, ["doc_id", "text"]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    run_once()
    spark.createDataFrame(b2, ["doc_id", "text"]).coalesce(1).write.parquet(
        str(src / "b2")
    )
    run_once()

    admitted = {r.doc_id for r in spark.read.parquet(dest + "/*").collect()}
    assert admitted == {11, 21}

    # exactly-once: replaying the epochs overwrites, never duplicates
    # — a fresh checkpoint with per-file triggers re-delivers the same
    # epoch boundaries (files discovered in mtime order), so both
    # epochs replay INTO the same epoch-keyed dirs
    import shutil

    shutil.rmtree(ckpt)
    run_once()
    again = sorted(r.doc_id for r in spark.read.parquet(dest + "/*").collect())
    assert again == [11, 21]
