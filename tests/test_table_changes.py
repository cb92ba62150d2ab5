"""Change-feed consumption of catalog tables (streaming/table_changes.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.ingest.insert import append_dataframe
from ice_spark.streaming.table_changes import TableChangeFeed, stream_table_appends

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_feed_delivers_each_append_once(spark, cat, tmp_path):
    t = cat.create_table("ns.t", schema=SCHEMA)
    feed = TableChangeFeed(t, str(tmp_path / "cp.json"))
    append_dataframe(t, _mk(spark, [(1, "a")]))
    append_dataframe(t.refresh(), _mk(spark, [(2, "b")]))

    seen: list[set] = []
    n = feed.process_available(lambda df, sid: seen.append({r.id for r in df.collect()}))
    assert n == 1  # both appends drained as one catch-up batch
    assert seen == [{1, 2}]
    assert feed.pending() is None  # caught up

    append_dataframe(t.refresh(), _mk(spark, [(3, "c")]))
    n = feed.process_available(lambda df, sid: seen.append({r.id for r in df.collect()}))
    assert n == 1 and seen[-1] == {3}


def test_crash_before_commit_replays_batch(spark, cat, tmp_path):
    """At-least-once: a handler failure leaves the checkpoint put, so
    the batch is redelivered — the queue-watch delivery contract."""
    t = cat.create_table("ns.t2", schema=SCHEMA)
    feed = TableChangeFeed(t, str(tmp_path / "cp2.json"))
    append_dataframe(t, _mk(spark, [(1, "a")]))

    with pytest.raises(RuntimeError):
        feed.process_available(lambda df, sid: (_ for _ in ()).throw(RuntimeError("boom")))
    # replay delivers the same rows
    df, sid = feed.pending()
    assert {r.id for r in df.collect()} == {1}
    feed.commit(sid)
    assert feed.pending() is None


def test_non_append_range_raises_then_reset(spark, cat, tmp_path):
    t = cat.create_table(
        "ns.t3",
        schema=SCHEMA,
        partition_spec=[{"column": "v", "transform": "identity"}],
    )
    feed = TableChangeFeed(t, str(tmp_path / "cp3.json"))
    append_dataframe(t, _mk(spark, [(1, "a"), (2, "b")]))
    feed.process_available(lambda df, sid: None)

    from ice_spark.catalog.delete import delete

    delete(
        t.refresh(),
        [{"name": "v", "op": "equals", "values": ["b"]}],
        dry_run=False,
    )
    with pytest.raises(ValueError, match="not\\s+append-only|append"):
        feed.pending()
    feed.reset()  # deliberate reprocess from scratch
    df, sid = feed.pending()
    assert {r.id for r in df.collect()} == {1}


def test_cli_feed(spark, cat, tmp_path, capsys, monkeypatch):
    import json as _json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    t = cat.create_table("ns.tf", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a"), (2, "b")]))
    cp = str(tmp_path / "cli_cp.json")
    assert main(["--warehouse", cat.warehouse, "feed", "ns.tf", "--checkpoint", cp]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["batches"] == 1 and out["detail"][0]["rows"] == 2
    # caught up: second invocation drains nothing
    assert main(["--warehouse", cat.warehouse, "feed", "ns.tf", "--checkpoint", cp]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["batches"] == 0


def test_stream_source_appends_only(spark, cat, tmp_path):
    t = cat.create_table("ns.t4", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a"), (2, "b")]))
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp4")
    q = (
        stream_table_appends(spark, t.refresh())
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.id, r.v) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_stream_source_rejects_partitioned_and_rewritten(spark, cat):
    t = cat.create_table(
        "ns.t5",
        schema=SCHEMA,
        partition_spec=[{"column": "v", "transform": "identity"}],
    )
    with pytest.raises(ValueError, match="partition"):
        stream_table_appends(spark, t)

    t2 = cat.create_table("ns.t6", schema=SCHEMA)
    append_dataframe(t2, _mk(spark, [(1, "a")]))
    files = t2.refresh().files()
    t2.append_snapshot(files, "overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        stream_table_appends(spark, t2.refresh())
