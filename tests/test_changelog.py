"""Row-level changelog reads (Table.read_changelog): inserts AND
file-level deletes as change events."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.delete import delete
from ice_spark.ingest.insert import append_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("x", T.LongType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def test_changelog_inserts_and_deletes(spark, cat):
    t = cat.create_table(
        "ns.t",
        schema=SCHEMA,
        partition_spec=[{"column": "k", "transform": "identity"}],
    )
    append_dataframe(t, spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    base = t.refresh().meta["current_snapshot_id"]
    append_dataframe(t, spark.createDataFrame([("c", 3)], SCHEMA))
    delete(
        t.refresh(),
        [{"name": "k", "op": "equals", "values": ["b"]}],
        dry_run=False,
    )
    events = {
        (r.k, r.x, r._change_type)
        for r in t.refresh().read_changelog(base).collect()
    }
    assert events == {("c", 3, "insert"), ("b", 2, "delete")}


def test_changelog_empty_range(spark, cat):
    t = cat.create_table("ns.t2", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([("a", 1)], SCHEMA))
    t.refresh()
    sid = t.meta["current_snapshot_id"]
    df = t.read_changelog(sid)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_changelog_rejects_overwrite(spark, cat):
    from ice_spark.catalog.merge import merge_upsert

    t = cat.create_table("ns.t3", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([("a", 1)], SCHEMA))
    base = t.refresh().meta["current_snapshot_id"]
    merge_upsert(t, spark.createDataFrame([("a", 9)], SCHEMA), ["k"])
    with pytest.raises(ValueError, match="changelog"):
        t.refresh().read_changelog(base)


def test_delete_rows_copy_on_write(spark, cat):
    from ice_spark.catalog.delete import delete_rows

    t = cat.create_table("ns.dr", schema=SCHEMA)
    append_dataframe(
        t, spark.createDataFrame([("a", 1), ("b", 2), ("c", None)], SCHEMA).coalesce(1)
    )
    append_dataframe(
        t.refresh(),
        spark.createDataFrame([("d", 100), ("e", 200)], SCHEMA).coalesce(1),
    )
    t.refresh()
    # predicate x > 1: bounds prune the second file? no — [100,200] matches;
    # first file [1,2] matches too. Delete x >= 100: first file pruned.
    before = {e["path"] for e in t.files()}
    res = delete_rows(
        t, [{"name": "x", "op": "greater_than_or_equal", "values": [100]}]
    )
    assert res["rows_deleted"] == 2
    assert res["files_kept"] == 1 and res["files_rewritten"] == 1
    t.refresh()
    # pruned file untouched on disk (same path kept)
    assert len({e["path"] for e in t.files()} & before) == 1
    got = {(r.k, r.x) for r in t.read().collect()}
    # NULL predicate keeps the row (SQL DELETE semantics)
    assert got == {("a", 1), ("b", 2), ("c", None)}


def test_delete_rows_dry_run_and_validation(spark, cat):
    from ice_spark.catalog.delete import delete_rows

    t = cat.create_table("ns.dr2", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([("a", 1)], SCHEMA))
    t.refresh()
    res = delete_rows(t, [{"name": "x", "op": "equals", "values": [1]}], dry_run=True)
    assert res["dry_run"] and res["rows_deleted"] == 0
    assert t.refresh().read().count() == 1
    with pytest.raises(ValueError, match="unknown column"):
        delete_rows(t, [{"name": "nope", "op": "equals", "values": [1]}])


def test_catalog_views(spark, cat, capsys, monkeypatch):
    import json as _json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    t = cat.create_table("ns.v_base", schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], SCHEMA))
    wh = cat.warehouse
    assert (
        main(
            [
                "--warehouse", wh, "create-view", "ns.totals",
                "SELECT k, SUM(x) AS total FROM ns_v_base GROUP BY k",
            ]
        )
        == 0
    )
    capsys.readouterr()
    # view-on-view: register order is creation order
    assert (
        main(
            [
                "--warehouse", wh, "create-view", "ns.big_totals",
                "SELECT * FROM ns_totals WHERE total > 2",
            ]
        )
        == 0
    )
    capsys.readouterr()
    assert main(["--warehouse", wh, "sql", "SELECT * FROM ns_big_totals ORDER BY k"]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert rows == [{"k": "a", "total": 3}, {"k": "b", "total": 5}]
    assert main(["--warehouse", wh, "list-views", "ns"]) == 0
    assert _json.loads(capsys.readouterr().out) == ["big_totals", "totals"]
    assert main(["--warehouse", wh, "drop-view", "ns.big_totals"]) == 0
    capsys.readouterr()
    assert cat.list_views("ns") == ["totals"]
    # a view file must never be mistaken for a table
    assert "totals" not in cat.list_tables("ns")
