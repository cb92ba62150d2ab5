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


def test_span_admission_stream_equals_batch(spark, tmp_path):
    """stream==batch parity for the span index (the k13 discipline):
    after N epochs — including a replayed epoch — the persisted index
    equals span_index(seed + every admitted doc) exactly, and the
    admission decisions equal running span_admission_against_index
    batch-wise against a manually-grown index. This is the 'computed
    once at ingest and stored' production claim as a test."""
    from ice_spark.operators.dedup import (
        span_admission_against_index,
        span_index,
    )
    from ice_spark.streaming.dedupe import span_admission_stream

    seed = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    fresh_y = "one two three four five six seven eight nine ten"
    fresh_w = "red orange yellow green blue indigo violet ultra infra deep"
    # partial overlap: first half of fresh_y + a fresh tail — admitted
    # or rejected depending on reject_bp; exercises spans-already-in-
    # index landing in a LATER epoch (duplicate hashes across epochs)
    half_y = "one two three four five plum pear fig date lime"
    batches = [
        [(10, fresh_y), (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        [(20, half_y), (21, fresh_w)],
        [(30, fresh_w), (31, half_y)],
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
        q = span_admission_stream(stream, dest, idxd, ckpt, seed_corpus=seed)
        q.awaitTermination()

    for i, b in enumerate(batches):
        spark.createDataFrame(b, ["doc_id", "text"]).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        run_once()
    # replay every epoch from a fresh checkpoint (same file order) —
    # parity must hold across the replay too
    import shutil

    shutil.rmtree(ckpt)
    run_once()

    stream_admitted = sorted(
        r.doc_id for r in spark.read.parquet(dest + "/*").collect()
    )

    # batch replay: grow an index DataFrame epoch by epoch
    idx = span_index(seed)
    batch_admitted = []
    for b in batches:
        bdf = spark.createDataFrame(b, ["doc_id", "text"])
        dec = span_admission_against_index(idx, bdf)
        adm = bdf.join(
            dec.where(dec.admitted).select("doc_id"), "doc_id", "semi"
        )
        batch_admitted += [r.doc_id for r in adm.select("doc_id").collect()]
        idx = idx.unionByName(span_index(adm)).distinct()
    assert stream_admitted == sorted(batch_admitted)

    # persisted index == span_index(seed + all admitted), as sets
    persisted = {
        r["__h"] for r in spark.read.parquet(idxd + "/*").distinct().collect()
    }
    all_docs = seed.unionByName(
        spark.read.parquet(dest + "/*").select("doc_id", "text")
    )
    recomputed = {r["__h"] for r in span_index(all_docs).collect()}
    assert persisted == recomputed


def test_span_admission_stream_corrupt_index_fails_batch(spark, tmp_path):
    """A corrupt/unreadable index shard must FAIL the micro-batch (the
    checkpoint retries it), not be swallowed as 'no index yet' — that
    would silently disable the gate and admit duplicates forever."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from ice_spark.streaming.dedupe import span_admission_stream

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(10, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    ).coalesce(1).write.parquet(str(src / "b1"))

    idxd = tmp_path / "idx"
    bad = idxd / "epoch=seed"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = span_admission_stream(
        stream, str(tmp_path / "dest"), str(idxd), str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()


def test_epoch_enumeration_uses_hadoop_fs(spark, tmp_path):
    """Epoch enumeration must go through the Hadoop FileSystem API,
    not os.listdir (r11 ADVICE): for a non-local index_dir scheme the
    old os.path.isdir returned False, prior=[] and every micro-batch
    was gated against an EMPTY index — the gate silently disabled.
    A file:// URI is exactly such a scheme path (os.path.isdir on it
    is False) that Hadoop FS resolves."""
    import os

    from ice_spark.streaming.dedupe import _list_epoch_dirs

    idx = tmp_path / "idx"
    (idx / "epoch=seed").mkdir(parents=True)
    (idx / "epoch=0").mkdir()
    (idx / "epoch=1").mkdir()
    (idx / "_other").mkdir()
    uri = "file://" + str(idx)
    assert not os.path.isdir(uri)  # the old enumeration saw nothing here

    got = _list_epoch_dirs(spark, uri, exclude="epoch=1")
    names = sorted(p.rsplit("/", 1)[-1] for p in got)
    assert names == ["epoch=0", "epoch=seed"]
    # bare local path resolves identically
    got_bare = _list_epoch_dirs(spark, str(idx), exclude="epoch=1")
    assert sorted(p.rsplit("/", 1)[-1] for p in got_bare) == ["epoch=0", "epoch=seed"]
    # missing dir => no index yet (empty), not an error
    assert _list_epoch_dirs(spark, str(tmp_path / "nope")) == []


def test_epoch_listing_io_error_fails_batch(spark, tmp_path, monkeypatch):
    """A FAILING index LISTING (not just a corrupt shard) must fail
    the micro-batch so the checkpoint retries it (r12 verdict #5).
    If the listing error were swallowed as 'no index yet', the batch
    would be gated against an EMPTY index and admit duplicates
    permanently. Injected at the enumeration seam: the process()
    closure resolves _list_epoch_dirs from module globals at call
    time, so the monkeypatch is exactly a listStatus failure as the
    gate sees one."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from ice_spark.streaming import dedupe as sd

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(10, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    ).coalesce(1).write.parquet(str(src / "b1"))

    def boom(sess, index_dir, exclude=None):
        raise IOError("injected listStatus failure")

    monkeypatch.setattr(sd, "_list_epoch_dirs", boom)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    dest = tmp_path / "dest"
    q = sd.span_admission_stream(
        stream, str(dest), str(tmp_path / "idx"), str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException, match="listStatus"):
        q.awaitTermination()
    # nothing was admitted on the failed batch
    assert not list(dest.glob("epoch=*/part-*.parquet"))


def test_epoch_listing_unresolvable_scheme_raises(spark, tmp_path):
    """_list_epoch_dirs must RAISE on a real FS-level error (here: an
    unregistered scheme — the same surface a dead NN / bad creds
    reaches the caller through), never return [] as if no index
    existed."""
    import pytest

    from ice_spark.streaming.dedupe import _list_epoch_dirs

    with pytest.raises(Exception, match="(?i)no filesystem|unsupported|scheme"):
        _list_epoch_dirs(spark, "no-such-scheme://bucket/idx")
