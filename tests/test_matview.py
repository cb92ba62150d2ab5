"""Incrementally-maintained materialized views (operators/matview.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.delete import delete
from ice_spark.ingest.insert import append_dataframe
from ice_spark.operators.matview import create_matview, refresh_matview

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("x", T.LongType()),
    ]
)

AGGS = [
    {"op": "sum", "col": "x", "alias": "sum_x"},
    {"op": "count", "col": "x", "alias": "n"},
    {"op": "min", "col": "x", "alias": "min_x"},
    {"op": "max", "col": "x", "alias": "max_x"},
]


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(mv):
    return {
        r.k: (r.sum_x, r.n, r.min_x, r.max_x) for r in mv.read().collect()
    }


def test_create_then_incremental_refresh(spark, cat):
    t = cat.create_table("ns.base", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [("a", 1), ("a", 2), ("b", 10)]))
    mv = create_matview(cat, "ns.mv", "ns.base", ["k"], AGGS)
    assert _state(mv) == {"a": (3, 2, 1, 2), "b": (10, 1, 10, 10)}

    append_dataframe(t.refresh(), _mk(spark, [("a", 4), ("c", 7)]))
    res = refresh_matview(cat, "ns.mv")
    assert res["mode"] == "incremental"
    assert _state(cat.load_table("ns.mv")) == {
        "a": (7, 3, 1, 4),
        "b": (10, 1, 10, 10),
        "c": (7, 1, 7, 7),
    }


def test_refresh_noop_when_base_unchanged(spark, cat):
    t = cat.create_table("ns.base2", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [("a", 1)]))
    create_matview(cat, "ns.mv2", "ns.base2", ["k"], AGGS)
    assert refresh_matview(cat, "ns.mv2")["mode"] == "noop"


def test_refresh_falls_back_to_full_on_delete(spark, cat):
    t = cat.create_table(
        "ns.base3",
        schema=SCHEMA,
        partition_spec=[{"column": "k", "transform": "identity"}],
    )
    append_dataframe(t, _mk(spark, [("a", 1), ("b", 10)]))
    create_matview(cat, "ns.mv3", "ns.base3", ["k"], AGGS)
    # partition delete makes the range non-append-only
    delete(
        t.refresh(),
        [{"name": "k", "op": "equals", "values": ["b"]}],
        dry_run=False,
    )
    res = refresh_matview(cat, "ns.mv3")
    assert res["mode"] == "full"
    assert _state(cat.load_table("ns.mv3")) == {"a": (1, 1, 1, 1)}


def test_holistic_aggregate_rejected(spark, cat):
    t = cat.create_table("ns.base4", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="mergeable"):
        create_matview(
            cat,
            "ns.mv4",
            "ns.base4",
            ["k"],
            [{"op": "median", "col": "x", "alias": "med"}],
        )


def test_cli_matview(spark, cat, capsys, monkeypatch):
    import json as _json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    wh = cat.warehouse
    t = cat.create_table("ns.base6", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [("a", 1), ("b", 2)]))
    assert (
        main(
            [
                "--warehouse",
                wh,
                "create-matview",
                "ns.mv6",
                "ns.base6",
                "--group-by",
                "k",
                "--agg",
                "sum:x:sum_x",
            ]
        )
        == 0
    )
    out = _json.loads(capsys.readouterr().out)
    assert out["created"] == "ns.mv6"
    append_dataframe(t.refresh(), _mk(spark, [("a", 5)]))
    assert main(["--warehouse", wh, "refresh-matview", "ns.mv6"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["mode"] == "incremental"
    assert {r.k: r.sum_x for r in cat.load_table("ns.mv6").read().collect()} == {
        "a": 6,
        "b": 2,
    }


def test_mv_is_ordinary_table_with_time_travel(spark, cat):
    t = cat.create_table("ns.base5", schema=SCHEMA)
    append_dataframe(t, _mk(spark, [("a", 1)]))
    mv = create_matview(cat, "ns.mv5", "ns.base5", ["k"], AGGS)
    first_sid = mv.meta["current_snapshot_id"]
    append_dataframe(t.refresh(), _mk(spark, [("a", 2)]))
    refresh_matview(cat, "ns.mv5")
    mv = cat.load_table("ns.mv5")
    assert _state(mv)["a"] == (3, 2, 1, 2)
    old = {r.k: r.sum_x for r in mv.read(snapshot_id=first_sid).collect()}
    assert old == {"a": 1}
