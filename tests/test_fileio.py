"""FileIO seam tests.

The commit protocol in catalog/table.py must depend ONLY on the
FileIO interface (VERDICT r2 #5 / SchemeFileIO.java:61-197 parity):
an in-memory FileIO passes the same concurrency guarantees as the
POSIX one, proving an S3 conditional-PUT impl would too.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as SPT

from ice_spark.catalog.fileio import InMemoryFileIO, LocalFileIO
from ice_spark.catalog.table import CommitConflictError, Table

SCHEMA = SPT.StructType(
    [
        SPT.StructField("id", SPT.LongType()),
        SPT.StructField("day", SPT.IntegerType()),
    ]
)


def entry(i: int, day: int = 0) -> dict:
    return {
        "path": f"data/day={day}/f{i}.parquet",
        "partition": {"day": day},
        "records": 10,
        "size_bytes": 100,
        "schema_version": 1,
    }


class TestInMemoryFileIO:
    def test_create_exclusive_single_winner(self):
        io = InMemoryFileIO()
        winners = []
        barrier = threading.Barrier(16)

        def race(i):
            barrier.wait()
            try:
                io.create_exclusive("/t/x", f"writer-{i}")
                winners.append(i)
            except FileExistsError:
                pass

        threads = [threading.Thread(target=race, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(winners) == 1
        assert io.read_text("/t/x") == f"writer-{winners[0]}"

    def test_atomic_write_and_delete(self):
        io = InMemoryFileIO()
        io.write_atomic("/a/b/c.json", "one")
        io.write_atomic("/a/b/c.json", "two")
        assert io.read_text("/a/b/c.json") == "two"
        assert io.list_dir("/a") == ["b"]
        assert io.walk_files("/a") == ["/a/b/c.json"]
        io.delete("/a/b/c.json")
        assert not io.exists("/a/b/c.json")
        with pytest.raises(FileNotFoundError):
            io.read_text("/a/b/c.json")

    def test_mtime_monotonic(self):
        io = InMemoryFileIO()
        io.write_atomic("/x", "1")
        t1 = io.mtime("/x")
        io.write_atomic("/y", "2")
        assert io.mtime("/y") > t1


class TestLocalFileIO:
    def test_create_exclusive(self, tmp_path):
        io = LocalFileIO()
        p = str(tmp_path / "v1.json")
        io.create_exclusive(p, "a")
        with pytest.raises(FileExistsError):
            io.create_exclusive(p, "b")
        assert io.read_text(p) == "a"

    def test_write_atomic_replaces(self, tmp_path):
        io = LocalFileIO()
        p = str(tmp_path / "hint")
        io.write_atomic(p, "1")
        io.write_atomic(p, "2")
        assert io.read_text(p) == "2"
        assert io.size(p) == 1


class TestCommitProtocolOnInMemoryIO:
    """The concurrency guarantees hold against ANY FileIO — run the
    same concurrent-writers scenario as tests/test_concurrency.py but
    entirely in memory (no Spark, no disk)."""

    def test_concurrent_appends_all_land(self):
        io = InMemoryFileIO()
        Table.create(None, "/wh/ns/t", SCHEMA, io=io)
        n_writers, per_writer = 8, 5
        errors = []

        def writer(w: int):
            t = Table(None, "/wh/ns/t", io=io)
            for k in range(per_writer):
                try:
                    t.append_snapshot([entry(w * 1000 + k, day=w)])
                except Exception as exc:  # pragma: no cover
                    errors.append(exc)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        t = Table(None, "/wh/ns/t", io=io).refresh()
        assert len(t.files()) == n_writers * per_writer
        assert len(t.snapshots()) == n_writers * per_writer
        # every commit's parent chain is consistent
        sids = [s["snapshot_id"] for s in t.snapshots()]
        parents = [s["parent_snapshot_id"] for s in t.snapshots()]
        assert parents[0] is None
        assert parents[1:] == sids[:-1]

    def test_conflict_surfaces_without_retries(self):
        io = InMemoryFileIO()
        Table.create(None, "/wh/ns/t", SCHEMA, io=io)
        t1 = Table(None, "/wh/ns/t", io=io).refresh()
        t2 = Table(None, "/wh/ns/t", io=io).refresh()
        t1.append_snapshot([entry(1)])
        meta = dict(t2.meta)
        with pytest.raises(CommitConflictError):
            t2._write_metadata(dict(meta), expected_version=t2._version)
