"""Maintenance jobs + streaming watch + CLI end-to-end."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import pytest

from ice_spark.catalog import Catalog
from ice_spark.catalog.maintenance import (
    compact_data,
    compact_manifests,
    expire_snapshots,
    remove_orphans,
)
from ice_spark.ingest import insert

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _aged(path: str, hours: float) -> None:
    t = time.time() - hours * 3600
    os.utime(path, (t, t))


def test_compaction_binpack(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.m", schema_from_parquet=f"{SF}/nation.parquet")
    for _ in range(6):
        insert(t, [f"{SF}/nation.parquet"], force_duplicates=True)
    assert len(t.files()) >= 6
    # age the files past the 24h candidate threshold
    for e in t.files():
        _aged(os.path.join(t.location, e["path"]), hours=25)
    plan = compact_data(t, dry_run=True)
    assert plan["groups"] and plan["dry_run"]
    res = compact_data(t, dry_run=False)
    assert res["rewritten"] >= 1
    t.refresh()
    assert len(t.files()) < 6
    assert t.read().count() == 6 * 25  # no rows lost
    # too-young files are not candidates
    t2 = cat.create_table("ns.m2", schema_from_parquet=f"{SF}/nation.parquet")
    for _ in range(6):
        insert(t2, [f"{SF}/nation.parquet"], force_duplicates=True)
    assert compact_data(t2, dry_run=True)["groups"] == []


def test_snapshot_expiry_and_manifest_gc(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.s", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    insert(t, [f"{SF}/region.parquet"], force_duplicates=True)
    insert(t, [f"{SF}/region.parquet"], force_duplicates=True)
    # backdate the first two snapshots past 120h
    def mutate(meta):
        for s in meta["snapshots"][:2]:
            s["timestamp_ms"] -= int(200 * 3600 * 1000)
        return meta

    t.commit(mutate)
    plan = expire_snapshots(t, dry_run=True)
    assert len(plan["expired"]) == 2
    res = expire_snapshots(t, dry_run=False)
    assert len(res["expired"]) == 2
    t.refresh()
    assert len(t.snapshots()) == 1
    assert t.read().count() == 15  # current snapshot intact
    gc = compact_manifests(t, dry_run=False)
    assert gc["removed_manifests"] == []  # expiry already removed them


def test_expiry_commit_failure_deletes_nothing(cat, monkeypatch):
    """Expire order parity with Iceberg: the snapshot-list commit
    happens BEFORE any file deletion, so a commit that fails after
    retries leaves every referenced file on disk (the old order —
    delete first, commit after — left live metadata pointing at
    deleted data)."""
    from ice_spark.catalog.table import CommitConflictError

    cat.create_namespace("ns")
    t = cat.create_table("ns.cf", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    insert(t, [f"{SF}/region.parquet"], force_duplicates=True)

    def backdate(meta):
        meta["snapshots"][0]["timestamp_ms"] -= int(200 * 3600 * 1000)
        return meta

    t.commit(backdate)
    all_paths = [
        os.path.join(t.location, e["path"])
        for s in t.snapshots()
        for e in t.snapshot_files(s)
    ]

    def always_conflict(meta, expected_version):
        raise CommitConflictError("simulated permanent CAS failure")

    monkeypatch.setattr(t, "_write_metadata", always_conflict)
    with pytest.raises(CommitConflictError):
        expire_snapshots(t, max_age_hours=120, min_to_keep=1)
    for p in all_paths:
        assert os.path.exists(p), f"file deleted before commit: {p}"


def test_expiry_concurrent_rollback_keeps_refs(cat):
    """A rollback committed between expiry planning and the expiry
    commit re-references the expiree's files via a new snapshot.
    Reachability is recomputed from the COMMITTED metadata, so those
    files survive and the rolled-back table stays readable."""
    cat.create_namespace("ns")
    t = cat.create_table("ns.rr", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    insert(t, [f"{SF}/region.parquet"], force_duplicates=True)
    first_sid = t.snapshots()[0]["snapshot_id"]

    def backdate(meta):
        meta["snapshots"][0]["timestamp_ms"] -= int(200 * 3600 * 1000)
        return meta

    t.commit(backdate)

    other = cat.load_table("ns.rr")
    orig_commit = t.commit
    raced = {"done": False}

    def commit_with_race(mutate, **kw):
        if not raced["done"]:
            raced["done"] = True
            other.rollback(first_sid)
        return orig_commit(mutate, **kw)

    t.commit = commit_with_race
    try:
        expire_snapshots(t, max_age_hours=120, min_to_keep=1)
    finally:
        t.commit = orig_commit
    t.refresh()
    # rollback snapshot is current and its (shared) files survived
    assert t.read().count() == 5
    for e in t.files():
        assert os.path.exists(os.path.join(t.location, e["path"]))


def test_orphan_cleanup(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.o", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    orphan = os.path.join(t.data_dir, "stray.parquet")
    shutil.copyfile(f"{SF}/region.parquet", orphan)
    _aged(orphan, hours=100)
    fresh = os.path.join(t.data_dir, "fresh.parquet")
    shutil.copyfile(f"{SF}/region.parquet", fresh)
    plan = remove_orphans(t, dry_run=True)
    assert orphan in plan["orphans"] and fresh not in plan["orphans"]
    res = remove_orphans(t, dry_run=False)
    assert res["deleted"] == 1
    assert not os.path.exists(orphan) and os.path.exists(fresh)
    assert t.read().count() == 5


def test_streaming_watch_fire_once(cat, tmp_path):
    from ice_spark.streaming.watch import watch

    cat.create_namespace("ns")
    t = cat.create_table("ns.w", schema_from_parquet=f"{SF}/region.parquet")
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    shutil.copyfile(f"{SF}/region.parquet", incoming / "r1.parquet")
    ckpt = str(tmp_path / "ckpt")
    res = watch(t, str(incoming), fire_once=True, checkpoint=ckpt)
    assert res["batches"] == 1
    assert t.read().count() == 5
    # idempotent replay: second fire-once with same checkpoint adds nothing
    res2 = watch(t, str(incoming), fire_once=True, checkpoint=ckpt)
    assert res2["batches"] == 0
    assert t.read().count() == 5
    # new file appears -> next trigger picks only it
    shutil.copyfile(f"{SF}/region.parquet", incoming / "r2.parquet")
    watch(t, str(incoming), fire_once=True, checkpoint=ckpt)
    assert t.read().count() == 10


def test_cli_end_to_end(tmp_path):
    wh = str(tmp_path / "wh")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "ice_spark.cli", "--warehouse", wh, *args],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout)

    assert run("check")["ok"] is True
    run("create-namespace", "ns")
    assert run("list-namespaces") == ["ns"]
    run(
        "create-table", "ns.orders",
        "--schema-from-parquet", f"{SF}/orders.parquet",
        "--partition", '[{"column": "o_orderdate", "transform": "year", "name": "Year"}]',
    )
    assert run("list-tables", "ns") == ["orders"]
    res = run("insert", "ns.orders", f"{SF}/orders.parquet")
    assert res["added"] >= 1
    rows = run("scan", "ns.orders", "--limit", "3")
    assert len(rows) == 3
    d = run("describe", "ns.orders", "-s")
    assert d["current_snapshot"]["summary"]["total-records"] == 1500
    parts = run("list-partitions", "ns.orders")
    assert parts["partitions"]
    snaps = run("list-snapshots", "ns.orders")
    assert len(snaps) == 1
    files = run("files", "ns.orders")
    assert files["files"]
    plan = run("delete", "ns.orders", '[{"name": "Year", "op": "equals", "values": [1995]}]')
    assert plan["candidates"]
    pq_meta = run("describe-parquet", f"{SF}/region.parquet")
    assert pq_meta["num_rows"] == 5
    maint = run("perform-maintenance", "ns.orders")
    assert "data_compaction" in maint["ns.orders"]
    run("delete-table", "ns.orders", "--purge")
    assert run("list-tables", "ns") == []


def test_streaming_upsert_watch(cat, tmp_path):
    from pyspark.sql import types as T

    from ice_spark.streaming.upsert import upsert_watch

    spark = cat.spark
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    cat.create_namespace("up", parents=True)
    t = cat.create_table("up.t", schema=schema)
    incoming = tmp_path / "incoming_upsert"
    incoming.mkdir()
    ckpt = str(tmp_path / "ckpt_upsert")

    def drop_file(df, name: str) -> None:
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(incoming / name))

    drop_file(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], schema), "b1.parquet")
    res = upsert_watch(t, str(incoming), ["id"], order_col="seq", fire_once=True, checkpoint=ckpt)
    assert res["batches"] == 1
    assert {(r.id, r.v) for r in t.read().collect()} == {(1, "a"), (2, "b")}

    # second drop: update id=2 (two versions in one batch; seq wins) + insert id=3
    drop_file(
        spark.createDataFrame([(2, 2, "stale"), (2, 3, "B"), (3, 1, "c")], schema),
        "b2.parquet",
    )
    upsert_watch(t, str(incoming), ["id"], order_col="seq", fire_once=True, checkpoint=ckpt)
    assert {(r.id, r.v) for r in t.read().collect()} == {(1, "a"), (2, "B"), (3, "c")}

    # idempotent restart: nothing new, nothing changes
    v = t.current_version()
    upsert_watch(t, str(incoming), ["id"], order_col="seq", fire_once=True, checkpoint=ckpt)
    assert t.current_version() == v


def test_streaming_upsert_replay_is_idempotent(cat, tmp_path):
    """Crash between the merge commit and the checkpoint advance:
    restart re-applies the same micro-batch. Merge-by-key is
    idempotent, so re-application converges to the identical table
    state (simulated by replaying the whole stream against the
    already-merged table with a FRESH checkpoint)."""
    from pyspark.sql import types as T

    from ice_spark.streaming.upsert import upsert_watch

    spark = cat.spark
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    cat.create_namespace("rp", parents=True)
    t = cat.create_table("rp.t", schema=schema)
    incoming = tmp_path / "incoming_replay"
    incoming.mkdir()

    def drop_file(df, name: str) -> None:
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(incoming / name))

    drop_file(spark.createDataFrame([(1, 1, "a"), (2, 2, "b")], schema), "r1.parquet")
    drop_file(spark.createDataFrame([(2, 3, "B"), (3, 1, "c")], schema), "r2.parquet")
    upsert_watch(t, str(incoming), ["id"], order_col="seq", fire_once=True,
                 checkpoint=str(tmp_path / "ck1"))
    want = {(1, "a"), (2, "B"), (3, "c")}
    assert {(r.id, r.v) for r in t.read().collect()} == want

    # lost checkpoint = worst-case replay of every already-merged file
    upsert_watch(t, str(incoming), ["id"], order_col="seq", fire_once=True,
                 checkpoint=str(tmp_path / "ck2"))
    assert {(r.id, r.v) for r in t.read().collect()} == want
    assert t.read().count() == 3  # no duplicate keys materialized


def test_maintenance_prometheus_counters(cat):
    """perform_maintenance emits the reference's maintenance metric
    names (MaintenanceMetrics.java / METRICS.md) into the default
    registry: run counters, duration histogram, in-progress gauge."""
    from ice_spark.catalog.maintenance import perform_maintenance
    from ice_spark.metrics import default_registry

    cat.create_namespace("ns")
    t = cat.create_table("ns.mm", schema_from_parquet=f"{SF}/nation.parquet")
    insert(t, [f"{SF}/nation.parquet"])
    perform_maintenance(t, dry_run=True)
    text = default_registry().render()
    assert 'ice_maintenance_runs_total{status="success"}' in text
    assert "ice_maintenance_duration_seconds_count" in text
    assert "ice_maintenance_in_progress 0" in text
    assert "ice_maintenance_last_run_timestamp" in text
