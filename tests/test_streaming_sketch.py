"""Streaming KMV: bounded state, and stream == batch on any prefix."""

from __future__ import annotations

from ice_spark.streaming.sketch import P, kmv_distinct_stream, kmv_estimate


def _batch_kmv(keys, k=64):
    kmin = sorted({((key % P) * 1686629717 + 11) % P for key in keys})[:k]
    return kmv_estimate(kmin, k)


def test_stream_matches_batch_kmv(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # 200 users across two micro-batches, overlapping membership
    b1 = [(i % 120, "view") for i in range(300)]
    b2 = [(60 + (i % 140), "view") for i in range(300)]
    spark.createDataFrame(b1, "user_id long, event_type string").coalesce(
        1
    ).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, "user_id long, event_type string").coalesce(
        1
    ).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = str(tmp_path / "out")
    q = (
        kmv_distinct_stream(stream, "user_id", "event_type", k=64)
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM kmv_stream").collect()
    # last emitted estimate per group == batch estimate over ALL data
    final = {}
    for r in rows:
        final[r.group_key] = r  # memory sink appends in batch order
    all_users = [u for u, _ in b1] + [u for u, _ in b2]
    expected = _batch_kmv(all_users)
    got = final["view"]
    assert got.kmv_estimate == expected
    # bounded state: never more than k hashes retained
    assert got.n_kept <= 64
    # 200 true distinct users; k=64 KMV should land within ±60%
    assert 80 <= got.kmv_estimate <= 320


def test_estimate_exact_below_k():
    assert kmv_estimate([5, 9, 100], 64) == 3
    assert kmv_estimate([], 64) == 0


def test_streaming_countmin_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from ice_spark.queries.sketches import CM_ROWS, CM_WIDTH
    from ice_spark.streaming.sketch import countmin_stream

    src = tmp_path / "cm_src"
    src.mkdir()
    b1 = [(i % 40,) for i in range(200)]
    b2 = [(20 + (i % 50),) for i in range(200)]
    spark.createDataFrame(b1, "key long").coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, "key long").coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        countmin_stream(stream, "key")
        .writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_cells = {
        (r.row_i, r.cell): r["count"]
        for r in spark.sql("SELECT * FROM cm_stream").collect()
    }
    # batch sketch over the same union must be identical cell-for-cell
    from ice_spark.streaming.sketch import P

    batch = {}
    for (k,) in b1 + b2:
        for i, a, b in CM_ROWS:
            cell = ((k % P) * a + b) % P % CM_WIDTH
            batch[(i, cell)] = batch.get((i, cell), 0) + 1
    assert stream_cells == batch
    # bounded state: never more than d*w cells
    assert len(stream_cells) <= len(CM_ROWS) * CM_WIDTH


def test_streaming_kmv_state_survives_restart(spark, tmp_path):
    # Run over batch 1 with a checkpoint, STOP the query (simulated
    # process death), add batch 2, start a NEW query on the same
    # checkpoint: the restored k-min state must make the final
    # estimate cover batch-1 keys it never re-read.
    src = tmp_path / "r_src"
    src.mkdir()
    ckpt = str(tmp_path / "r_ckpt")
    b1 = [(i, "t") for i in range(100)]
    b2 = [(1000 + i, "t") for i in range(100)]
    spark.createDataFrame(b1, "user_id long, event_type string").coalesce(
        1
    ).write.parquet(str(src / "b1"))

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can
        emitted: list = []
        stream = (
            spark.readStream.schema("user_id long, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            kmv_distinct_stream(stream, "user_id", "event_type", k=64)
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    first_rows = run()
    assert first_rows and first_rows[-1].n_kept == 64  # 100 distinct, k=64 kept

    spark.createDataFrame(b2, "user_id long, event_type string").coalesce(
        1
    ).write.parquet(str(src / "b2"))
    rows = run()
    assert rows, "restarted query emitted nothing"
    final = rows[-1]
    # merged over BOTH batches (200 distinct keys): estimate must match
    # the batch KMV over the union, which differs from batch-2-only
    all_keys = [u for u, _ in b1] + [u for u, _ in b2]
    assert final.kmv_estimate == _batch_kmv(all_keys)
    assert final.kmv_estimate != _batch_kmv([u for u, _ in b2])


def test_stream_matches_batch_hll(spark, tmp_path):
    """Stream-built HLL registers == batch k07 registers over the
    same data, and the finalized estimate matches the batch estimate
    exactly (register max is the lossless HLL merge)."""
    from ice_spark.streaming.sketch import hll_finalize, hll_stream

    src = tmp_path / "hll_src"
    src.mkdir()
    b1 = [(i % 150, "click") for i in range(400)]
    b2 = [(100 + (i % 200), "click") for i in range(400)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, "user_id long, event_type string").coalesce(
            1
        ).write.parquet(str(src / name))

    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        hll_stream(stream, "user_id", "event_type")
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    regs = spark.sql(
        "SELECT group_key, reg, m_j FROM hll_stream"
    )
    est = hll_finalize(regs).collect()[0]

    # batch reference over the union of both files
    batch = spark.createDataFrame(
        b1 + b2, "user_id long, event_type string"
    )
    from ice_spark.queries.sketches import hll_registers
    from pyspark.sql import functions as F

    batch_regs = hll_registers(
        batch.select(F.lit("click").alias("group_key"), "user_id"), "user_id", ["group_key"]
    )
    batch_est = hll_finalize(batch_regs).collect()[0]
    assert est.harmonic_sum == batch_est.harmonic_sum
    assert est.hll_estimate == batch_est.hll_estimate
    # 250 true distinct; m=64 HLL should land within ±40%
    assert 150 <= est.hll_estimate <= 350
    # bounded state: at most 64 register rows
    assert regs.count() <= 64


def test_windowed_hll_with_watermark(spark, tmp_path):
    """Watermarked tumbling-window HLL: per-window registers finalize
    to per-window estimates; an event belonging to an old window that
    arrives within the watermark still lands in ITS window (register
    max is idempotent/order-free)."""
    from ice_spark.streaming.sketch import hll_finalize, hll_windowed_stream

    src = tmp_path / "whll_src"
    src.mkdir()
    # window = 1 hour; batch 1 fills hour 0 and hour 1, batch 2 adds
    # LATE hour-0 events (new users) + more hour-1 events
    from datetime import datetime

    def rows(pairs):
        return [(datetime(2024, 1, 1, h, 10, 0), u, "view") for h, u in pairs]

    b1 = rows([(0, u) for u in range(100)] + [(1, u) for u in range(50)])
    b2 = rows([(0, u) for u in range(100, 140)] + [(1, u) for u in range(50, 80)])
    schema = "ts timestamp, user_id long, event_type string"
    for name, rws in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rws, schema).coalesce(1).write.parquet(str(src / name))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        hll_windowed_stream(
            stream, "ts", "user_id", "event_type", window="1 hour", watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName("whll")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    regs = spark.sql("SELECT win, group_key, reg, m_j FROM whll")
    est = {
        (r.win.start.hour, r.group_key): r.hll_estimate
        for r in hll_finalize(regs, group_cols=("win", "group_key")).collect()
    }
    # hour 0 saw 140 distinct users (100 on time + 40 late-but-inside-
    # watermark), hour 1 saw 80
    assert 84 <= est[(0, "view")] <= 196  # 140 ± 40%
    assert 48 <= est[(1, "view")] <= 112  # 80 ± 40%
    # bounded state: ≤ 64 registers per (window, group)
    counts = regs.groupBy("win", "group_key").count().collect()
    assert all(r["count"] <= 64 for r in counts)


def test_stream_matches_batch_bottomk_quantiles(spark, tmp_path):
    """bottomk_quantile_stream's final estimates equal the batch k13
    order statistics over the union of all micro-batches — the
    mergeable-sample property, stream == batch on any prefix."""
    from ice_spark.streaming.sketch import (
        BK_A,
        BK_B,
        bottomk_quantile_stream,
        bottomk_quantiles,
    )

    src = tmp_path / "src"
    src.mkdir()
    b1 = [(i, (i * 37) % 1000, "pay") for i in range(400)]
    b2 = [(1000 + i, (i * 91) % 2000, "pay") for i in range(400)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            rows, "event_id long, cents long, event_type string"
        ).coalesce(1).write.parquet(str(src / name))

    stream = (
        spark.readStream.schema("event_id long, cents long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        bottomk_quantile_stream(stream, "event_id", "cents", "event_type")
        .writeStream.format("memory")
        .queryName("bk_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM bk_stream").collect()
    final = {}
    for r in rows:
        final[(r.group_key, r.pct)] = r  # appends in batch order

    # batch replica of k13's sample: 256 smallest (h, id) of the union
    entries = sorted(
        (((eid % P) * BK_A + BK_B) % P, eid, cents)
        for eid, cents, _ in b1 + b2
    )[:256]
    expected = dict(bottomk_quantiles([e[2] for e in entries]))
    for pct in (50, 90, 99):
        got = final[("pay", pct)]
        assert got.est == expected[pct], pct
        assert got.n_kept == 256
