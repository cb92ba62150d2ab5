"""CSV/JSON ingestion (beyond-reference: the reference hardcodes
Parquet, Insert.java:658-665). Data always lands as Parquet; the
schema gate still applies to inferred input schemas."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.ingest import insert

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def test_csv_ingest(cat, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    t = cat.create_table("ns.c", schema=SCHEMA)
    res = insert(t, [str(p)], input_format="csv")
    assert res["added"] >= 1
    rows = {(r.id, r.name, r.score) for r in t.read().collect()}
    assert rows == {(1, "alpha", 0.5), (2, "beta", 1.5)}
    # table data files are parquet regardless of input format
    assert all(e["path"].endswith(".parquet") for e in t.files())


def test_json_ingest_and_gate(cat, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(json.dumps(d) for d in [{"id": 3, "name": "c", "score": 2.0}]) + "\n"
    )
    t = cat.create_table("ns.j", schema=SCHEMA)
    insert(t, [str(p)], input_format="json")
    assert t.read().count() == 1
    # extra field not in the table schema must be rejected by the gate
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"id": 4, "name": "d", "score": 0.0, "extra": 1}) + "\n")
    with pytest.raises(Exception, match="extra|not in table|incompatible"):
        insert(t, [str(bad)], input_format="json")


def test_no_copy_rejects_non_parquet(cat, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("id,name,score\n1,a,0.0\n")
    t = cat.create_table("ns.n", schema=SCHEMA)
    with pytest.raises(ValueError, match="no_copy requires parquet"):
        insert(t, [str(p)], input_format="csv", no_copy=True, force_no_copy=True)
