"""SQS-shaped watch transport tests (InsertWatch.java:71-238 parity).

The transport contract: at-least-once delivery + table-level dedup =
exactly-once table contents; messages acked only after the commit.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.streaming.queue_watch import (
    FakeQueue,
    parse_s3_events,
    s3_event_body,
    watch_queue,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def setup(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table("ns.watched", schema=SCHEMA)
    landing = tmp_path / "landing"
    landing.mkdir()

    def make_file(name: str, lo: int, n: int) -> str:
        df = spark.range(lo, lo + n).selectExpr("id", "cast(id * 0.5 as double) as v")
        out = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(out)
        src = glob.glob(out + "/*.parquet")[0]
        dst = landing / name
        import shutil

        shutil.copy(src, dst)
        return name

    def path_for(bucket: str, key: str) -> str:
        return str(landing / key)

    return t, make_file, path_for


class TestEventParsing:
    def test_object_created_with_url_encoding(self):
        body = s3_event_body("b", ["dir/file with space.parquet"])
        assert parse_s3_events(body) == [("b", "dir/file with space.parquet")]

    def test_test_event_ignored(self):
        assert parse_s3_events('{"Event": "s3:TestEvent"}') == []

    def test_non_created_events_ignored(self):
        import json

        body = json.dumps(
            {
                "Records": [
                    {
                        "eventName": "ObjectRemoved:Delete",
                        "s3": {"bucket": {"name": "b"}, "object": {"key": "x"}},
                    }
                ]
            }
        )
        assert parse_s3_events(body) == []

    def test_garbage_ignored(self):
        assert parse_s3_events("not json") == []
        assert parse_s3_events("[1,2]") == []


class TestWatchQueue:
    def test_basic_ingest_and_ack(self, setup):
        t, make_file, path_for = setup
        q = FakeQueue()
        q.send(s3_event_body("b", [make_file("a.parquet", 0, 10)]))
        q.send(s3_event_body("b", [make_file("b.parquet", 10, 5)]))
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        assert stats["files_added"] == 2
        assert stats["messages_deleted"] == 2
        assert q.pending() == 0
        assert t.read().count() == 15

    def test_at_least_once_idempotent(self, setup):
        """Redelivered messages (ack lost / crash before delete) must
        not duplicate rows: skip-duplicates absorbs the replay and the
        replayed message is acked."""
        t, make_file, path_for = setup
        q = FakeQueue()
        body = s3_event_body("b", [make_file("a.parquet", 0, 10)])
        q.send(body)
        watch_queue(t, q, path_for=path_for, fire_once=True)
        assert t.read().count() == 10
        # simulate redelivery of the SAME notification
        q.send(body)
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        assert stats["files_added"] == 0
        assert stats["files_skipped"] == 1
        assert stats["messages_deleted"] == 1
        assert t.read().count() == 10  # exactly once in the table
        assert q.pending() == 0

    def test_ack_only_after_commit(self, setup, tmp_path):
        """If ingest fails, messages stay in flight and are
        redelivered on the next cycle."""
        t, make_file, path_for = setup
        q = FakeQueue()
        q.send(s3_event_body("b", ["missing.parquet"]))  # file doesn't exist
        with pytest.raises(Exception):
            watch_queue(t, q, path_for=path_for, fire_once=True)
        assert q.pending() == 1  # NOT acked
        # file arrives late; visibility timeout expires -> redelivery
        make_file("missing.parquet", 0, 3)
        q.expire_visibility()
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        assert stats["files_added"] == 1
        assert q.pending() == 0
        assert t.read().count() == 3

    def test_matcher_filters_keys(self, setup):
        t, make_file, path_for = setup
        q = FakeQueue()
        q.send(
            s3_event_body(
                "b",
                [make_file("keep.parquet", 0, 4), "skip.tmp"],
            )
        )
        stats = watch_queue(
            t, q, patterns=["*.parquet", "!skip*"], path_for=path_for, fire_once=True
        )
        assert stats["files_added"] == 1
        assert t.read().count() == 4
        assert q.pending() == 0

    def test_handshake_acked_without_ingest(self, setup):
        t, make_file, path_for = setup
        q = FakeQueue()
        q.send('{"Event": "s3:TestEvent"}')
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        assert stats["messages_ignored"] == 1
        assert stats["messages_deleted"] == 1
        assert q.pending() == 0

    def test_drain_cap_single_commit(self, setup):
        """A drain cycle ingests up to max_drain messages in ONE
        snapshot commit (bounded commit rate, InsertWatch drain<=100)."""
        t, make_file, path_for = setup
        q = FakeQueue()
        for i in range(7):
            q.send(s3_event_body("b", [make_file(f"f{i}.parquet", i * 10, 10)]))
        snaps_before = len(t.refresh().snapshots())
        stats = watch_queue(t, q, path_for=path_for, fire_once=True, max_drain=100)
        snaps_after = len(t.refresh().snapshots())
        assert stats["files_added"] == 7
        assert snaps_after == snaps_before + 1  # one commit for the drain
        assert t.read().count() == 70

    def test_create_table_on_first_file(self, setup, spark, tmp_path):
        """InsertWatch -p parity: no table until the first matched
        notification; schema inferred from that file."""
        from ice_spark.catalog import Catalog

        _t, make_file, path_for = setup
        cat = Catalog(spark, str(tmp_path / "wh2"))
        cat.create_namespace("auto")
        q = FakeQueue()
        stats = watch_queue(
            None, q, path_for=path_for, fire_once=True, catalog=cat, ident="auto.t"
        )
        assert not cat.table_exists("auto.t")  # nothing arrived -> no table
        q.send(s3_event_body("b", [make_file("first.parquet", 0, 6)]))
        stats = watch_queue(
            None, q, path_for=path_for, fire_once=True, catalog=cat, ident="auto.t"
        )
        assert stats["files_added"] == 1
        t = cat.load_table("auto.t")
        assert t.read().count() == 6
        assert [f.name for f in t.schema.fields] == ["id", "v"]


class TestCrashRecovery:
    def test_crash_between_commit_and_delete_is_exactly_once(self, setup):
        """The reference's confirmProcessed contract
        (InsertWatch.java:317-342): messages are acked only AFTER the
        commit, so a crash in the commit->ack window redelivers an
        already-committed message; skip-duplicates must absorb the
        replay with zero duplicate rows and no new snapshot."""
        t, make_file, path_for = setup

        class CrashOnDelete(FakeQueue):
            armed = True

            def delete(self, receipt_handles):
                if self.armed:
                    self.armed = False
                    raise RuntimeError("simulated crash before ack")
                super().delete(receipt_handles)

        q = CrashOnDelete()
        q.send(s3_event_body("b", [make_file("once.parquet", 0, 8)]))
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            watch_queue(t, q, path_for=path_for, fire_once=True)
        # the commit landed, the ack did not
        t.refresh()
        assert t.read().count() == 8
        snaps_after_commit = len(t.snapshots())
        assert q.pending() == 1  # message still in flight

        # visibility timeout elapses -> redelivery -> replay
        q.expire_visibility()
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        t.refresh()
        assert stats["files_added"] == 0 and stats["files_skipped"] == 1
        assert t.read().count() == 8  # no duplicate rows
        assert len(t.snapshots()) == snaps_after_commit  # no extra commit
        assert q.pending() == 0  # replayed message acked this time

    def test_crash_before_commit_loses_nothing(self, setup, monkeypatch):
        """Crash BEFORE the commit (insert raises): message stays
        queued, a healthy restart ingests it exactly once."""
        import ice_spark.streaming.queue_watch as qw

        t, make_file, path_for = setup
        q = FakeQueue()
        q.send(s3_event_body("b", [make_file("late.parquet", 0, 5)]))

        real_insert = qw.insert
        calls = {"n": 0}

        def flaky_insert(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated crash mid-ingest")
            return real_insert(*a, **k)

        monkeypatch.setattr(qw, "insert", flaky_insert)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="mid-ingest"):
            watch_queue(t, q, path_for=path_for, fire_once=True)
        t.refresh()
        assert t.read().count() == 0  # nothing committed
        q.expire_visibility()
        stats = watch_queue(t, q, path_for=path_for, fire_once=True)
        assert stats["files_added"] == 1
        assert t.read().count() == 5
        assert q.pending() == 0
