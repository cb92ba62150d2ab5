"""Sharded metadata-plane scale tests (VERDICT r2 #4).

The design point: snapshot -> manifest list -> immutable manifest
shards (Iceberg's own layout, SURVEY §1.1; pruned like
ice/.../cmd/Delete.java:87-97). These tests build a 100k-entry table
from pure metadata commits (no Spark, no parquet) and assert the two
scale properties the monolithic r2 design lacked:

1. a commit touches O(delta + shard_count) metadata files, not
   O(table) — measured with InMemoryFileIO op counters;
2. a partition-pruned plan opens O(1) shards, not the full file list.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as SPT

from ice_spark.catalog.fileio import InMemoryFileIO
from ice_spark.catalog.table import Table

SCHEMA = SPT.StructType(
    [
        SPT.StructField("id", SPT.LongType()),
        SPT.StructField("day", SPT.IntegerType()),
    ]
)


def entries_for_day(day: int, n: int) -> list[dict]:
    return [
        {
            "path": f"data/day={day}/f{day}-{i}.parquet",
            "partition": {"day": day},
            "records": 100,
            "size_bytes": 10_000,
            "schema_version": 1,
            "column_metrics": {
                "id": {
                    "min": day * 100_000 + i * 10,
                    "max": day * 100_000 + i * 10 + 9,
                }
            },
        }
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def big_table():
    """100 days x 1000 files = 100k manifest entries, one append per
    day (the shape of a daily ingest at 100 TB)."""
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/events", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/events", io=io)
    for day in range(100):
        t.append_snapshot(entries_for_day(day, 1000))
    return io, t


def test_append_commit_is_o_delta(big_table):
    io, t = big_table
    assert len(t.files()) == 100_000
    io.reset_counts()
    t.append_snapshot(entries_for_day(100, 1000))
    # One refresh (hint + metadata), one manifest-list read, then:
    # 1 new shard + 1 new manifest list + 1 hint write, 1 CAS.
    # Crucially: ZERO shard reads — the 100 existing shards with
    # 100k entries are referenced by name, never opened.
    assert io.counts["cas"] == 1
    assert io.counts["writes"] == 3  # shard, manifest list, hint
    assert io.counts["reads"] <= 6
    assert len(t.files()) == 101_000


def test_pruned_plan_opens_one_shard(big_table):
    io, t = big_table
    # fresh Table = cold shard cache, so plan stats reflect real IO
    cold = Table(None, "/wh/ns/events", io=io).refresh()
    planned = cold.plan_files([{"name": "day", "op": "equals", "values": [42]}])
    stats = cold.last_plan_stats
    assert stats["shards_total"] >= 100
    assert stats["shards_opened"] == 1
    assert stats["entries_scanned"] == 1000
    assert len(planned) == 1000
    assert all(e["partition"]["day"] == 42 for e in planned)


def test_pruned_plan_on_column_bounds(big_table):
    io, t = big_table
    cold = Table(None, "/wh/ns/events", io=io).refresh()
    # id range 5_500_000..5_509_999 lives entirely in day 55's shard
    planned = cold.plan_files(
        [{"name": "id", "op": "equals", "values": [5_500_123]}]
    )
    assert cold.last_plan_stats["shards_opened"] == 1
    assert all(e["partition"]["day"] == 55 for e in planned)


def test_range_plan_opens_matching_shards(big_table):
    io, t = big_table
    cold = Table(None, "/wh/ns/events", io=io).refresh()
    planned = cold.plan_files(
        [{"name": "day", "op": "greater_than_or_equal", "values": [97]}]
    )
    opened = cold.last_plan_stats["shards_opened"]
    assert opened <= 5  # days 97,98,99 (+100 if the o_delta test ran first)
    assert len(planned) >= 3000
    assert all(e["partition"]["day"] >= 97 for e in planned)


def test_bounded_delete_rewrites_o_changed_shards():
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/t", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/t", io=io)
    for day in range(50):
        t.append_snapshot(entries_for_day(day, 100))
    all_entries = t.files()
    assert len(all_entries) == 5000

    # whole-partition delete: day 7's shard is dropped entirely,
    # the other 49 shards are reused by reference — nothing rewritten
    keep = [e for e in all_entries if e["partition"]["day"] != 7]
    io.reset_counts()
    t.append_snapshot(keep, operation="delete")
    assert io.counts["writes"] == 2  # manifest list + hint; NO new shard
    snap = t.snapshot()
    assert len(t.manifest_list_entries(snap)) == 49
    assert len(t.files()) == 4900

    # partial delete within one partition: exactly one shard rewritten
    remaining = t.files()
    drop = {e["path"] for e in remaining if e["partition"]["day"] == 9}
    drop = set(sorted(drop)[:50])
    keep2 = [e for e in remaining if e["path"] not in drop]
    io.reset_counts()
    t.append_snapshot(keep2, operation="delete")
    assert io.counts["writes"] == 3  # ONE new shard + manifest list + hint
    assert len(t.files()) == 4850


def test_rewrite_manifests_merges_small_shards():
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/t", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/t", io=io)
    for day in range(40):
        t.append_snapshot(entries_for_day(day, 10))
    before_files = {e["path"] for e in t.files()}
    assert len(t.manifest_list_entries(t.snapshot())) == 40

    result = t.rewrite_manifests(target_entries_per_shard=400)
    assert result["shards_before"] == 40
    assert result["shards_after"] == 1
    assert {e["path"] for e in t.files()} == before_files
    # the rewrite snapshot is op=replace: incremental readers skip it
    assert t.snapshot()["operation"] == "replace"

    # merged shard still carries usable summaries
    cold = Table(None, "/wh/ns/t", io=io).refresh()
    cold.plan_files([{"name": "day", "op": "equals", "values": [3]}])
    assert cold.last_plan_stats["shards_total"] == 1


def test_legacy_full_manifest_migrates_on_append():
    """Tables written by the pre-sharding format (snapshot carries
    `manifest` = one full-list JSON) stay readable, and the first new
    commit migrates them to shards."""
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/old", SCHEMA, io=io)
    t = Table(None, "/wh/ns/old", io=io).refresh()
    old_entries = entries_for_day(1, 5)
    io.write_atomic(
        "/wh/ns/old/metadata/manifest-111.json", json.dumps({"files": old_entries})
    )

    def mutate(meta):
        meta["snapshots"].append(
            {
                "snapshot_id": 111,
                "parent_snapshot_id": None,
                "timestamp_ms": 1,
                "operation": "append",
                "manifest": "manifest-111.json",
                "summary": {},
            }
        )
        meta["current_snapshot_id"] = 111
        return meta

    t.commit(mutate)
    assert {e["path"] for e in t.files()} == {e["path"] for e in old_entries}

    t.append_snapshot(entries_for_day(2, 5))
    snap = t.snapshot()
    assert "manifest_list" in snap
    assert len(t.files()) == 10
    descs = t.manifest_list_entries(snap)
    assert not any(d.get("legacy") for d in descs)


def test_rollback_reuses_shards():
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/t", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/t", io=io)
    for day in range(10):
        t.append_snapshot(entries_for_day(day, 100))
    target = t.snapshots()[4]["snapshot_id"]
    io.reset_counts()
    t.rollback(target)
    # 5 shards reused by reference; no shard writes
    assert io.counts["writes"] == 2  # manifest list + hint
    assert len(t.files()) == 500


def test_expiry_refcounts_shared_shards(tmp_path, spark):
    """Snapshot expiry must NOT delete a manifest shard still
    referenced by a retained snapshot (shards are shared by
    reference across snapshots)."""
    import os

    from ice_spark.catalog.maintenance import expire_snapshots
    from ice_spark.catalog.table import Table as DiskTable

    loc = str(tmp_path / "t")
    DiskTable.create(spark, loc, SCHEMA, partition_spec=[{"column": "day"}])
    t = DiskTable(spark, loc)
    t.append_snapshot(entries_for_day(0, 10))   # snap1: shard A
    t.append_snapshot(entries_for_day(1, 10))   # snap2: shards A+B
    snaps = t.snapshots()
    # age snap1 beyond the retention window
    import json as _json

    meta_path = t.metadata_path(t.current_version())
    meta = _json.loads(t.io.read_text(meta_path))
    meta["snapshots"][0]["timestamp_ms"] = 1
    t.io.write_atomic(meta_path, _json.dumps(meta))
    t.refresh()

    shard_a = t.manifest_list_entries(snaps[0])[0]["path"]
    result = expire_snapshots(t, max_age_hours=1, min_to_keep=1)
    assert result["expired"] == [snaps[0]["snapshot_id"]]
    # shard A is still referenced by snap2 -> must survive
    assert t.io.exists(os.path.join(t.metadata_dir, shard_a))
    assert len(t.files()) == 20
    # snap1's manifest LIST (unshared) is gone
    assert not t.io.exists(
        os.path.join(t.metadata_dir, snaps[0]["manifest_list"])
    )


def test_rewrite_manifests_honors_target_chunk():
    """Merged output chunks at the CALLER's target (not the module
    constant), and full output shards are not re-selected by a
    subsequent rewrite (no no-op churn)."""
    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/t", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/t", io=io)
    for day in range(10):
        t.append_snapshot(entries_for_day(day, 100))  # 1000 entries
    result = t.rewrite_manifests(target_entries_per_shard=300)
    # 1000 entries at <=300/shard => 4 shards (300,300,300,100)
    assert result["shards_after"] == 4
    counts = sorted(
        d["file_count"] for d in t.manifest_list_entries(t.snapshot())
    )
    assert counts == [100, 300, 300, 300]
    snaps_before = len(t.snapshots())
    again = t.rewrite_manifests(target_entries_per_shard=300)
    # only the one partial shard is below target => nothing to merge
    assert again["shards_before"] == again["shards_after"] == 4
    assert len(t.snapshots()) == snaps_before  # no no-op commit


def test_manifest_gc_spares_inflight_commits():
    """compact_manifests must not delete a freshly written
    unreferenced shard — it may be a concurrent commit between its
    file writes and its metadata CAS. Old unreferenced files ARE
    collected."""
    import time as _time

    from ice_spark.catalog.maintenance import compact_manifests

    io = InMemoryFileIO()
    Table.create(None, "/wh/ns/t", SCHEMA, partition_spec=[{"column": "day"}], io=io)
    t = Table(None, "/wh/ns/t", io=io)
    t.append_snapshot(entries_for_day(0, 10))

    # a commit in flight: shard + manifest list written, CAS not yet done
    inflight = "/wh/ns/t/metadata/manifest-deadbeef00000001.json"
    io.write_atomic(inflight, json.dumps({"files": entries_for_day(1, 2)}))
    res = compact_manifests(t, dry_run=False)
    assert res["removed_manifests"] == []  # too young to judge
    assert io.exists(inflight)

    # the same file, aged past the guard, is garbage
    io._mtimes[io._norm(inflight)] = _time.time() - 7200
    res = compact_manifests(t, dry_run=False)
    assert res["removed_manifests"] == ["manifest-deadbeef00000001.json"]
    assert not io.exists(inflight)
    assert len(t.files()) == 10  # live data untouched


def test_commit_bytes_stay_o_delta(big_table):
    """Bytes written per commit (r12 probe regression,
    tools/probe_metadata.py at 250k entries): a late append may
    exceed an early one ONLY by the manifest list's one-line-per-
    shard growth (~640 B/shard measured) — any O(table) component
    beyond the list (e.g. rewriting shards) blows the 2 KiB/shard
    envelope immediately."""
    io, t = big_table
    day = len(t.manifest_list_entries(t.snapshot()))
    io.reset_counts()
    t.append_snapshot(entries_for_day(day, 1000))
    early_like = io.bytes_written  # at ~100 shards
    shards_before = day + 1
    for d in range(day + 1, day + 21):
        t.append_snapshot(entries_for_day(d, 1000))
    io.reset_counts()
    t.append_snapshot(entries_for_day(day + 21, 1000))
    late = io.bytes_written
    growth_per_shard = (late - early_like) / (day + 21 - day)
    assert growth_per_shard < 2048, (
        f"manifest-list growth {growth_per_shard:.0f} B/shard; "
        f"early={early_like} late={late} shards={shards_before}"
    )
    assert io.counts["writes"] == 3  # shard + manifest list + hint
