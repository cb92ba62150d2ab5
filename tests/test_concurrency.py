"""Optimistic-commit contention: concurrent writers against one table
must never lose an update — the CAS + retry protocol the reference
implements over etcd (EtcdCatalog.doCommit, Insert.java:937-1026),
here over the filesystem version hint."""

from __future__ import annotations

import threading

import pytest

from ice_spark.catalog import Catalog
from ice_spark.catalog.table import Table


@pytest.fixture()
def table(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    import pyspark.sql.types as T

    return c.create_table(
        "ns.c",
        schema=T.StructType([T.StructField("id", T.LongType())]),
    )


def test_concurrent_appends_lose_nothing(spark, table):
    n_threads, per_thread = 8, 3
    errors: list[Exception] = []

    def worker(wid: int) -> None:
        # each writer uses its OWN Table handle (fresh metadata cache),
        # like independent client processes
        t = Table(spark, table.location, table.identifier)
        try:
            for i in range(per_thread):
                entry = {
                    "path": f"data/w{wid}_{i}.parquet",
                    "partition": {},
                    "records": 1,
                    "size_bytes": 10,
                    "schema_version": 1,
                }
                t.append_snapshot([entry], "append")
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors
    table.refresh()
    # every commit landed: one snapshot per append, every file present
    assert len(table.snapshots()) == n_threads * per_thread
    paths = {e["path"] for e in table.files()}
    assert len(paths) == n_threads * per_thread
    # version history is a contiguous chain
    assert table.current_version() == 1 + n_threads * per_thread


def test_conflicting_commit_raises_after_retries(spark, table):
    from ice_spark.catalog.table import CommitConflictError

    t1 = Table(spark, table.location, table.identifier)

    def always_stale(meta: dict) -> dict:
        # simulate a competing writer winning every race: bump the
        # version behind this commit's back before it lands
        other = Table(spark, table.location, table.identifier)
        other.commit(lambda m: m)
        return meta

    with pytest.raises(CommitConflictError):
        t1.commit(always_stale, retries=2, backoff_ms=1)


def test_concurrent_stage_publish_exactly_one_wins(spark, table):
    """N writers each stage a branch against the SAME base and race to
    publish: exactly ONE fast-forward may land; every loser gets the
    non-fast-forward refusal, and the table ends with exactly the
    winner's file."""
    n = 6
    base_entry = {
        "path": "data/base.parquet",
        "partition": {},
        "records": 1,
        "size_bytes": 10,
        "schema_version": 1,
    }
    table.append_snapshot([base_entry], "append")

    # all stages happen against the same base snapshot
    handles = [Table(spark, table.location, table.identifier) for _ in range(n)]
    for w, t in enumerate(handles):
        t.append_snapshot(
            [
                {
                    "path": f"data/stage_{w}.parquet",
                    "partition": {},
                    "records": 1,
                    "size_bytes": 10,
                    "schema_version": 1,
                }
            ],
            "append",
            branch=f"b{w}",
        )

    results: list[tuple[int, bool]] = []
    lock = threading.Lock()

    def racer(w: int) -> None:
        t = Table(spark, table.location, table.identifier)
        try:
            t.publish_branch(f"b{w}")
            ok = True
        except Exception:
            ok = False
        with lock:
            results.append((w, ok))

    threads = [threading.Thread(target=racer, args=(w,)) for w in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    winners = [w for w, ok in results if ok]
    assert len(winners) == 1, f"expected one winner, got {winners}"
    t = Table(spark, table.location, table.identifier).refresh()
    paths = {e["path"] for e in t.files()}
    assert paths == {"data/base.parquet", f"data/stage_{winners[0]}.parquet"}
    # losers' branches survive for re-staging
    assert len(t.refs()) == n - 1
