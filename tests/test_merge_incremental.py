"""Copy-on-write MERGE upsert + incremental (CDC-style) snapshot
reads. Beyond-reference surface: the reference's only mutation is
whole-file partition delete (SURVEY.md §2.4); upsert + incremental
consumption are what a training-data pipeline needs on top."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.merge import merge_upsert
from ice_spark.ingest.insert import append_dataframe

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


def test_merge_updates_and_inserts(spark, cat):
    t = cat.create_table("ns.t", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    res = merge_upsert(t, _mk(spark, [(2, "B"), (4, "d")]), ["id"])
    assert res["rows_replaced"] == 1
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    snap = t.snapshot()
    assert snap["operation"] == "overwrite"


def test_merge_prunes_disjoint_files(spark, cat):
    t = cat.create_table("ns.t2", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a"), (2, "b")]))
    append_dataframe(t, _mk(spark, [(100, "x"), (200, "y")]))
    before = {e["path"] for e in t.files()}
    res = merge_upsert(t, _mk(spark, [(100, "X"), (150, "z")]), ["id"])
    # the low-id file's bounds [1,2] are disjoint from source [100,150]
    assert res["files_kept"] >= 1 and res["files_rewritten"] >= 1
    kept_paths = {e["path"] for e in t.files()} & before
    assert kept_paths, "expected at least one untouched data file"
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b"), (100, "X"), (150, "z"), (200, "y")}


def test_merge_empty_source_noop(spark, cat):
    t = cat.create_table("ns.t3", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    v = t.current_version()
    res = merge_upsert(t, _mk(spark, []), ["id"])
    assert res["files_rewritten"] == 0
    assert t.current_version() == v  # no commit


def test_incremental_read_appends(spark, cat):
    t = cat.create_table("ns.t4", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    s1 = t.snapshot()["snapshot_id"]
    append_dataframe(t, _mk(spark, [(2, "b")]))
    append_dataframe(t, _mk(spark, [(3, "c")]))
    s3 = t.snapshot()["snapshot_id"]
    inc = t.read_incremental(s1)
    assert {r.id for r in inc.collect()} == {2, 3}
    # bounded range [s1, s2]
    s2 = t.snapshots()[-2]["snapshot_id"]
    assert {r.id for r in t.read_incremental(s1, s2).collect()} == {2}
    # since-creation = full content
    assert t.read_incremental(None, s3).count() == 3
    diff = t.changed_files(s1, s3)
    assert len(diff["added"]) >= 2 and not diff["removed"]


def test_incremental_skips_replace_rejects_overwrite(spark, cat):
    t = cat.create_table("ns.t5", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    s1 = t.snapshot()["snapshot_id"]
    # a compaction-style replace snapshot: same logical content
    t.append_snapshot(t.files(), "replace")
    append_dataframe(t, _mk(spark, [(2, "b")]))
    assert {r.id for r in t.read_incremental(s1).collect()} == {2}
    # an overwrite makes the range non-append-only
    merge_upsert(t, _mk(spark, [(1, "A")]), ["id"])
    with pytest.raises(ValueError, match="not.*append-only|overwrite"):
        t.read_incremental(s1)


def test_timestamp_time_travel(spark, cat):
    t = cat.create_table("ns.tt", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    ts1 = t.snapshot()["timestamp_ms"]
    append_dataframe(t, _mk(spark, [(2, "b")]))
    assert t.read(as_of_ms=ts1).count() == 1
    assert t.read(as_of_ms=ts1 - 1).count() == 0  # before first commit
    assert t.read(as_of_ms=t.snapshot()["timestamp_ms"]).count() == 2
    with pytest.raises(ValueError, match="not both"):
        t.read(snapshot_id=1, as_of_ms=ts1)


def test_manifest_pruned_filtered_read(spark, cat):
    t = cat.create_table("ns.pf", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a"), (5, "b")]).coalesce(1))
    append_dataframe(t, _mk(spark, [(100, "x"), (200, "y")]).coalesce(1))
    assert len(t.files()) == 2

    # bounds-based pruning: only the low file can contain id=5
    planned = t.plan_files([{"name": "id", "op": "equals", "values": [5]}])
    assert len(planned) == 1

    got = {(r.id, r.v) for r in t.read_filtered(
        [{"name": "id", "op": "equals", "values": [5]}]
    ).collect()}
    assert got == {(5, "b")}

    # range op + OR values across files
    planned = t.plan_files(
        [{"name": "id", "op": "greater_than", "values": [150]}]
    )
    assert len(planned) == 1
    got = {r.id for r in t.read_filtered(
        [{"name": "id", "op": "equals", "values": [1, 200]}]
    ).collect()}
    assert got == {1, 200}

    # no stats for unknown column -> no pruning, filter still applies
    got = {r.id for r in t.read_filtered(
        [{"name": "v", "op": "equals", "values": ["x"]}]
    ).collect()}
    assert got == {100}


def test_rollback_preserves_history(spark, cat):
    t = cat.create_table("ns.rb", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    s1 = t.snapshot()["snapshot_id"]
    append_dataframe(t, _mk(spark, [(2, "b")]))
    s2 = t.snapshot()["snapshot_id"]
    t.rollback(s1)
    assert {r.id for r in t.read().collect()} == {1}
    # rolled-over snapshot still time-travelable
    assert {r.id for r in t.read(snapshot_id=s2).collect()} == {1, 2}
    assert t.snapshot()["operation"] == "rollback"
    assert len(t.snapshots()) == 3
    # incremental range across a rollback is not append-only
    with pytest.raises(ValueError, match="rollback"):
        t.read_incremental(s1)
    with pytest.raises(ValueError, match="no snapshot"):
        t.rollback(123456)


def test_snapshot_tags(spark, cat):
    t = cat.create_table("ns.tag", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [(1, "a")]))
    sid1 = t.snapshot()["snapshot_id"]
    t.set_ref("train-v1")  # defaults to current
    append_dataframe(t, _mk(spark, [(2, "b")]))
    assert t.resolve_ref("train-v1") == sid1
    assert t.read(snapshot_id=t.resolve_ref("train-v1")).count() == 1
    assert t.read().count() == 2
    t.set_ref("latest", t.snapshot()["snapshot_id"])
    assert set(t.refs()) == {"train-v1", "latest"}
    t.drop_ref("train-v1")
    assert set(t.refs()) == {"latest"}
    with pytest.raises(ValueError, match="no such ref"):
        t.resolve_ref("train-v1")
