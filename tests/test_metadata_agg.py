"""Metadata-only aggregates (catalog/metadata_agg.py): exact answers
from manifests, honest None when unprovable."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.metadata_agg import aggregate_from_metadata
from ice_spark.ingest.insert import append_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("cat", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("s", T.StringType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _table(spark, cat, name="ns.m"):
    t = cat.create_table(
        name,
        schema=SCHEMA,
        partition_spec=[{"column": "cat", "transform": "identity"}],
    )
    append_dataframe(
        t, spark.createDataFrame([("a", 5, "ee"), ("a", 9, "bb")], SCHEMA)
    )
    append_dataframe(
        t.refresh(), spark.createDataFrame([("b", -3, "zz"), ("b", 70, "aa")], SCHEMA)
    )
    return t.refresh()


def test_count_min_max_match_scan(spark, cat):
    t = _table(spark, cat)
    got = aggregate_from_metadata(
        t,
        [
            {"op": "count"},
            {"op": "min", "col": "x"},
            {"op": "max", "col": "x"},
            {"op": "min", "col": "s"},
            {"op": "max", "col": "s"},
        ],
    )
    row = t.read().agg(
        {"x": "max"}
    ).collect()  # sanity anchor for one of them
    assert got == {
        "count": 4,
        "min_x": -3,
        "max_x": 70,
        "min_s": "aa",
        "max_s": "zz",
    }
    assert row[0][0] == got["max_x"]


def test_partition_filter_is_exact(spark, cat):
    t = _table(spark, cat, "ns.m2")
    got = aggregate_from_metadata(
        t,
        [{"op": "count"}, {"op": "max", "col": "x"}],
        filters=[{"name": "cat", "op": "equals", "values": ["a"]}],
    )
    assert got == {"count": 2, "max_x": 9}


def test_column_filter_refused(spark, cat):
    t = _table(spark, cat, "ns.m3")
    assert (
        aggregate_from_metadata(
            t,
            [{"op": "count"}],
            filters=[{"name": "x", "op": "greater_than", "values": [0]}],
        )
        is None
    )


def test_missing_bounds_refused_not_guessed(spark, cat):
    t = _table(spark, cat, "ns.m4")
    # simulate a foreign/imported entry without column metrics
    files = t.files()
    files[0] = {k: v for k, v in files[0].items() if k != "column_metrics"}
    t.append_snapshot(files, "overwrite")
    t = t.refresh()
    got = aggregate_from_metadata(t, [{"op": "count"}, {"op": "min", "col": "x"}])
    assert got is None  # min unprovable poisons the request
    # count alone is still exact
    assert aggregate_from_metadata(t, [{"op": "count"}]) == {"count": 4}


def test_cli_agg_metadata(spark, cat, capsys, monkeypatch):
    import json as _json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    _table(spark, cat, "ns.m6")
    assert (
        main(
            [
                "--warehouse",
                cat.warehouse,
                "agg-metadata",
                "ns.m6",
                "--agg",
                "count",
                "--agg",
                "max:x",
            ]
        )
        == 0
    )
    out = _json.loads(capsys.readouterr().out)
    assert out == {"count": 4, "max_x": 70}


def test_all_null_file_is_skipped_exactly(spark, cat):
    t = cat.create_table("ns.m5", schema=SCHEMA)
    append_dataframe(
        t, spark.createDataFrame([("a", 4, "x")], SCHEMA)
    )
    append_dataframe(
        t.refresh(),
        spark.createDataFrame([("b", None, None)], SCHEMA),
    )
    got = aggregate_from_metadata(
        t.refresh(), [{"op": "min", "col": "x"}, {"op": "max", "col": "x"}]
    )
    assert got == {"min_x": 4, "max_x": 4}
