"""Write-audit-publish: branch staging, fast-forward publish, abort."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.table import CommitConflictError
from ice_spark.ingest.insert import append_dataframe, insert

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


def _src(spark, tmp_path, rows, name):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(d)
    return sorted(glob.glob(d + "/*.parquet"))


def test_stage_audit_publish(spark, cat, tmp_path):
    t = cat.create_table("ns.t", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    base_sid = t.refresh().meta["current_snapshot_id"]

    insert(t, _src(spark, tmp_path, [(2, "b")], "s1"), stage_branch="audit")
    t.refresh()
    # main unchanged; staged snapshot readable via the ref
    assert t.meta["current_snapshot_id"] == base_sid
    assert {r.id for r in t.read().collect()} == {1}
    staged_sid = t.refs()["audit"]
    assert {r.id for r in t.read(snapshot_id=staged_sid).collect()} == {1, 2}

    # audit passed -> publish fast-forwards main
    sid = t.publish_branch("audit")
    assert sid == staged_sid
    assert {r.id for r in t.read().collect()} == {1, 2}
    assert "audit" not in t.refs()


def test_publish_refuses_non_fast_forward(spark, cat, tmp_path):
    t = cat.create_table("ns.t2", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    insert(t.refresh(), _src(spark, tmp_path, [(2, "b")], "s2"), stage_branch="audit")
    # main advances AFTER the stage
    append_dataframe(t.refresh(), spark.createDataFrame([(3, "c")], SCHEMA))
    with pytest.raises(CommitConflictError, match="fast-forward"):
        t.refresh().publish_branch("audit")
    # table state untouched by the failed publish
    assert {r.id for r in t.refresh().read().collect()} == {1, 3}


def test_abort_branch(spark, cat, tmp_path):
    t = cat.create_table("ns.t3", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    insert(t.refresh(), _src(spark, tmp_path, [(9, "x")], "s3"), stage_branch="audit")
    t.refresh().abort_branch("audit")
    t.refresh()
    assert "audit" not in t.refs()
    assert {r.id for r in t.read().collect()} == {1}


def test_cli_wap_roundtrip(spark, cat, tmp_path, capsys, monkeypatch):
    import json as _json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    t = cat.create_table("ns.t4", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    files = _src(spark, tmp_path, [(2, "b")], "s4")
    wh = cat.warehouse
    assert main(["--warehouse", wh, "insert", "ns.t4", *files, "--stage", "audit"]) == 0
    capsys.readouterr()
    assert main(["--warehouse", wh, "publish", "ns.t4", "audit"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["published"] == "audit"
    assert {r.id for r in cat.load_table("ns.t4").read().collect()} == {1, 2}


def test_unpublished_stage_invisible_to_incremental_scan(spark, cat, tmp_path):
    """An abandoned staged snapshot must never leak into the change
    feed / incremental scan of main (parent-chain walk, not list
    order)."""
    t = cat.create_table("ns.t5", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    base = t.refresh().meta["current_snapshot_id"]
    insert(t, _src(spark, tmp_path, [(99, "staged")], "s5"), stage_branch="audit")
    append_dataframe(t.refresh(), spark.createDataFrame([(2, "b")], SCHEMA))
    got = {r.id for r in t.refresh().read_incremental(base).collect()}
    assert got == {2}  # staged row absent


def test_expire_keeps_ref_pinned_snapshots(spark, cat, tmp_path):
    from ice_spark.catalog.maintenance import expire_snapshots

    t = cat.create_table("ns.t6", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(1, "a")], SCHEMA))
    insert(t.refresh(), _src(spark, tmp_path, [(2, "b")], "s6"), stage_branch="audit")
    append_dataframe(t.refresh(), spark.createDataFrame([(3, "c")], SCHEMA))
    t.refresh()
    staged_sid = t.refs()["audit"]
    res = expire_snapshots(t, max_age_hours=0, min_to_keep=1)
    assert staged_sid not in res["expired"]  # branch-pinned
    # branch is still publishable? main moved -> not fast-forward, but
    # the snapshot and its files still exist
    assert {r.id for r in t.refresh().read(snapshot_id=staged_sid).collect()} == {1, 2}
